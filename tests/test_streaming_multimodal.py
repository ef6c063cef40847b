"""Structured Streaming pipeline + multimodal plumbing tests."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from driftmind_spark.operators.multimodal import media_metadata, sample_frames
from driftmind_spark.streaming.stream import (
    read_pages_stream,
    stream_chunks,
    stream_host_counts,
)


@pytest.fixture(scope="module")
def stream_corpus(tmp_path_factory):
    """Pages corpus split over several files so maxFilesPerTrigger yields
    multiple micro-batches."""
    from driftmind_spark.synth import generate_pages
    import pyarrow.parquet as pq

    d = str(tmp_path_factory.mktemp("stream_pages"))
    for part in range(4):
        pages, _ = generate_pages(50, start=part * 50)
        pq.write_table(pages, f"{d}/part-{part}.parquet")
    return d


def test_stream_chunks_matches_batch(spark, stream_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("stream_chunks_out"))
    ckpt = str(tmp_path_factory.mktemp("ckpt1"))
    q = stream_chunks(
        read_pages_stream(spark, stream_corpus, max_files_per_trigger=1),
        out, ckpt,
    )
    q.awaitTermination(300)
    streamed = spark.read.parquet(out)
    # multiple micro-batches actually happened
    assert streamed.select("batch_id").distinct().count() > 1

    from driftmind_spark.operators.chunking import build_chunks

    batch = build_chunks(
        spark.read.parquet(stream_corpus), with_embeddings=False
    )
    s_fp = streamed.select("url", "chunk_index", "content")
    b_fp = batch.select("url", "chunk_index", "content")
    assert s_fp.count() == b_fp.count()
    assert s_fp.exceptAll(b_fp).count() == 0


def test_stream_host_counts_watermarked(spark, stream_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("stream_counts_out"))
    ckpt = str(tmp_path_factory.mktemp("ckpt2"))
    q = stream_host_counts(
        read_pages_stream(spark, stream_corpus, max_files_per_trigger=1),
        out, ckpt,
    )
    q.awaitTermination(300)
    files = glob.glob(os.path.join(out, "*.parquet"))
    assert files, "windowed aggregation produced no output"
    res = spark.read.parquet(out)
    assert {"window_start", "window_end", "host", "n_pages"}.issubset(res.columns)
    assert res.agg(F.sum("n_pages")).first()[0] > 0
    # windows are exactly 1 hour
    one_hour = res.select(
        (F.col("window_end").cast("long") - F.col("window_start").cast("long"))
        .alias("dur")
    ).distinct().collect()
    assert all(r["dur"] == 3600 for r in one_hour)


def test_stream_resume_from_checkpoint(spark, stream_corpus, tmp_path_factory):
    """availableNow + same checkpoint: a second start() with no new files
    writes nothing new (offsets persisted)."""
    out = str(tmp_path_factory.mktemp("stream_resume_out"))
    ckpt = str(tmp_path_factory.mktemp("ckpt3"))
    q1 = stream_chunks(read_pages_stream(spark, stream_corpus), out, ckpt)
    q1.awaitTermination(300)
    n1 = spark.read.parquet(out).count()
    q2 = stream_chunks(read_pages_stream(spark, stream_corpus), out, ckpt)
    q2.awaitTermination(300)
    n2 = spark.read.parquet(out).count()
    assert n1 == n2


def test_stream_dedupe_pages(spark, stream_corpus, tmp_path_factory):
    """Stateful idempotent-ingest: duplicated input files produce each url
    exactly once downstream."""
    import shutil

    from driftmind_spark.streaming.stream import stream_dedupe_pages

    dup_dir = str(tmp_path_factory.mktemp("dup_pages"))
    for i, f in enumerate(sorted(__import__("glob").glob(f"{stream_corpus}/*.parquet"))):
        shutil.copy(f, f"{dup_dir}/part-{i}a.parquet")
        shutil.copy(f, f"{dup_dir}/part-{i}b.parquet")  # exact duplicates
    out = str(tmp_path_factory.mktemp("dedupe_out"))
    ckpt = str(tmp_path_factory.mktemp("ckpt_dd"))
    # wide watermark: micro-batch arrival order (mtime) is arbitrary for
    # copied files, so a narrow watermark would legitimately drop late
    # originals — here we test the dedup semantics, not lateness
    q = stream_dedupe_pages(read_pages_stream(spark, dup_dir, 2), out, ckpt,
                            watermark="2 days")
    q.awaitTermination(300)
    res = spark.read.parquet(out)
    n_unique = spark.read.parquet(dup_dir).select("url").distinct().count()
    assert res.count() == n_unique  # every url emitted exactly once
    assert res.groupBy("url").count().filter(F.col("count") > 1).count() == 0


# ---- multimodal ----------------------------------------------------------------

@pytest.fixture(scope="module")
def media_df(spark):
    import struct

    png = (b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR"
           + struct.pack(">II", 640, 480) + b"\x00" * 100)
    jpg = b"\xff\xd8\xff\xe0" + b"j" * 3000
    raw = b"\x01\x02" * 2500
    return spark.createDataFrame(
        [("m1", bytearray(png)), ("m2", bytearray(jpg)), ("m3", bytearray(raw))],
        "media_id string, blob binary",
    )


def test_media_metadata(spark, media_df):
    meta = {r["media_id"]: r for r in media_metadata(media_df).collect()}
    assert meta["m1"]["format"] == "png"
    assert meta["m1"]["width"] == 640 and meta["m1"]["height"] == 480
    assert meta["m2"]["format"] == "jpeg"
    assert meta["m2"]["width"] is None  # decode stubbed -> NULL, not crash
    assert meta["m3"]["format"] is None
    assert all(len(r["sha"]) == 64 for r in meta.values())


def test_sample_frames_shape(spark, media_df):
    frames = sample_frames(media_df, every_n_bytes=1024, max_frames=3)
    pdf = frames.toPandas()
    # one input row -> up to K frame rows
    assert set(pdf["media_id"]) == {"m1", "m2", "m3"}
    m2 = pdf[pdf.media_id == "m2"]
    assert list(m2["frame_index"]) == [0, 1]  # 3004 bytes -> 2 frames
    assert len(bytes(m2.iloc[0]["frame"])) == 1024
