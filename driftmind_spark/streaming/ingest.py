"""Composed incremental ingest: near-dup gate -> chunks in ONE streaming
pipeline (round 6 — the streaming analog of the batch pipeline's
``dedup=True`` + chunks stages).

Why not chain ``stream_near_dups`` directly in front of ``stream_chunks``
in a single query: Structured Streaming does not support another
operator AFTER ``applyInPandasWithState`` (arbitrary stateful ops must
be terminal), and the gate's verdicts are per-band while "kept" is a
per-url ALL-bands decision — a second stateful aggregation.  The
supported composition shape is ``foreachBatch``: per micro-batch we run
the SAME ``_fold_bucket`` state machine the stateful operator runs, with
the representative state persisted as a BATCH-ID-VERSIONED parquet table
instead of the state store.

Exactly-once across retries (the property the state store gives the
single-operator gate) is preserved by versioning: batch N reads the
newest state version < N and (re)writes version N.  foreachBatch
batch_ids are stable across retries, and the fold is deterministic given
(base state, batch rows), so a retried batch rewrites byte-identical
state and output partitions — the same dynamic-partition-overwrite
recipe as ``stream_chunks``.  Old versions are pruned to the last two
(N's retry only ever needs N-1).

Scale shape: state is (band_idx, band_hash, url, sig[num_perm],
rep_order) — bounded by ``max_reps`` per bucket and TTL-evicted by event
time, exactly like the state-store variant; the per-batch work is one
cogroup shuffle on (band_idx, band_hash) plus the chunks kernel over
kept rows only.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .stateful import _fold_bucket, _sig_banded
from .stream import _write_batch_idempotent

STATE_SCHEMA = (
    "band_idx int, band_hash bigint, url string, warc_ts timestamp, "
    "sig array<bigint>, rep_order int, bucket_latest timestamp"
)
GATE_OUT_SCHEMA = (
    "kind string, band_idx int, band_hash bigint, url string, "
    "warc_ts timestamp, dup_of string, agreement int, saturated boolean, "
    "sig array<bigint>, rep_order int, bucket_latest timestamp"
)


def _gate_cogroup_fn(min_slots: int, max_reps: int):
    """Per-bucket cogrouped fold: (batch rows, persisted reps) ->
    flag rows (kind='flag') + the bucket's post-fold representative set
    (kind='rep').  Buckets with no batch rows pass their reps through
    unchanged (state must survive quiet batches)."""

    def fn(key, rows_pdf, reps_pdf):
        import pandas as pd

        band_idx, band_hash = int(key[0]), int(key[1])
        reps_pdf = reps_pdf.sort_values("rep_order")
        reps = [(u, list(s)) for u, s in zip(reps_pdf["url"], reps_pdf["sig"])]
        rep_ts = dict(zip(reps_pdf["url"], reps_pdf["warc_ts"]))
        rows = [(u, t, list(s)) for u, t, s in
                zip(rows_pdf["url"], rows_pdf["warc_ts"], rows_pdf["sig"])]
        # one global event order per batch (the stateful operator's rule)
        rows.sort(key=lambda r: (r[1], r[0]))
        row_ts: dict = {}
        for u, t, _ in rows:
            # first-wins: a rep's timestamp is the event that elected it
            row_ts.setdefault(u, t)
        # bucket activity clock = the stateful gate's `latest`: refreshed
        # by EVERY arriving row (including duplicates), so an actively
        # matching bucket never TTL-expires — eviction keys on this, not
        # on each rep's election time
        latest = max(
            [t for t in reps_pdf["bucket_latest"] if pd.notna(t)]
            + [t for _, t, _ in rows],
            default=None,
        )
        flags, reps_after = _fold_bucket(rows, reps, min_slots, max_reps)
        out = [
            (
                "flag", band_idx, band_hash, u, t, d, a, s, None, None, None,
            )
            for (u, t, d, a, s) in flags
        ] + [
            (
                "rep", band_idx, band_hash, u,
                rep_ts.get(u, row_ts.get(u)), None, None, None, sig, i,
                latest,
            )
            for i, (u, sig) in enumerate(reps_after)
        ]
        return pd.DataFrame(
            out,
            columns=["kind", "band_idx", "band_hash", "url", "warc_ts",
                     "dup_of", "agreement", "saturated", "sig", "rep_order",
                     "bucket_latest"],
        )

    return fn


def _latest_state_version(spark: SparkSession, state_dir: str,
                          below: int) -> int | None:
    """Newest committed state version strictly below ``below`` (retry
    safety: a replayed batch must fold from its ORIGINAL base state,
    never from its own partial output).  Listing goes through the Hadoop
    FS API so the same code runs on HDFS/object stores."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(state_dir)
    fs = path.getFileSystem(conf)
    if not fs.exists(path):
        return None
    versions = []
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if name.startswith("state_v="):
            v = int(name.split("=", 1)[1])
            if v < below and fs.exists(
                jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")
            ):
                versions.append(v)
    return max(versions) if versions else None


def _prune_state(spark: SparkSession, state_dir: str, keep_from: int) -> None:
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(state_dir)
    fs = path.getFileSystem(conf)
    if not fs.exists(path):
        return
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if name.startswith("state_v=") and int(name.split("=", 1)[1]) < keep_from:
            fs.delete(st.getPath(), True)


def stream_ingest(
    pages_stream: DataFrame,
    out_dir: str,
    checkpoint_path: str,
    num_perm: int = 64,
    bands: int = 8,
    shingle_k: int = 3,
    min_agreement: float = 0.9,
    max_reps: int = 8,
    ttl_seconds: int = 7 * 24 * 3600,
    chunk_size: int = 300,
    overlap: int = 20,
    quality: bool = False,
    quality_opts: dict | None = None,
):
    """pages stream -> ``{out_dir}/dup_flags`` (per-band verdicts, incl.
    saturation signals) + ``{out_dir}/chunks`` (chunk rows for KEPT
    pages only), both partitioned by batch_id and idempotent under
    micro-batch replay.  A page is kept iff NO band flags it with a
    non-null ``dup_of`` — the same decision rule documented on
    ``stream_near_dups``, applied inside the batch so chunking never
    sees a near-duplicate.

    ``quality=True`` prepends the batch pipeline's quality gate
    (operators/quality.py, same thresholds via ``quality_opts``):
    rejected pages land in ``{out_dir}/quality_audit`` (batch_id
    partitioned, idempotent) and never reach the dedup gate or
    chunking — the streaming ingest then mirrors the batch stage order
    quality → dedup → chunks exactly.  The gate is stateless per row,
    so it adds no streaming state."""
    from ..operators.chunking import build_chunks

    min_slots = int(-(-min_agreement * num_perm // 1))
    state_dir = posixpath.join(out_dir, "dedup_state")
    flags_dir = posixpath.join(out_dir, "dup_flags")
    chunks_dir = posixpath.join(out_dir, "chunks")
    qaudit_dir = posixpath.join(out_dir, "quality_audit")

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if quality:
            from ..operators.quality import quality_filter

            in_cols = batch_df.columns
            judged = quality_filter(batch_df, **(quality_opts or {}))
            audit = judged.filter(~F.col("keep")).select(
                "url", "warc_ts", "n_chars", "n_tokens", "punct_ratio",
                "stop_ratio", "chars_per_token", "lang_guess",
                "reject_reasons",
            )
            _write_batch_idempotent(audit, qaudit_dir, batch_id)
            batch_df = judged.filter(F.col("keep")).select(*in_cols)
        batch_df = batch_df.persist()
        banded = _sig_banded(
            batch_df.select("url", "warc_ts", "text"),
            num_perm, bands, shingle_k,
        )
        base_v = _latest_state_version(spark, state_dir, below=batch_id)
        if base_v is None:
            reps = spark.createDataFrame([], STATE_SCHEMA)
        else:
            reps = spark.read.parquet(
                posixpath.join(state_dir, f"state_v={base_v}")
            )
        folded = (
            banded.groupby("band_idx", "band_hash")
            .cogroup(reps.groupby("band_idx", "band_hash"))
            .applyInPandas(
                _gate_cogroup_fn(min_slots, max_reps), GATE_OUT_SCHEMA
            )
            .persist()
        )
        flags = folded.filter(F.col("kind") == "flag").select(
            "url", "warc_ts", "band_idx", "dup_of", "agreement", "saturated"
        )
        _write_batch_idempotent(flags, flags_dir, batch_id)

        # event-time TTL on the persisted reps (state stays bounded even
        # without the state store's timeout machinery).  Eviction keys on
        # the BUCKET's activity clock — a bucket still catching dups
        # keeps its reps alive, exactly like the stateful gate's
        # setTimeoutTimestamp(latest + ttl)
        new_state = folded.filter(F.col("kind") == "rep").select(
            "band_idx", "band_hash", "url", "warc_ts", "sig", "rep_order",
            "bucket_latest",
        )
        horizon = batch_df.agg(F.max("warc_ts")).first()[0]
        if horizon is not None:
            new_state = new_state.filter(
                F.col("bucket_latest")
                >= F.lit(horizon) - F.expr(f"INTERVAL {ttl_seconds} SECONDS")
            )
        new_state.write.mode("overwrite").parquet(
            posixpath.join(state_dir, f"state_v={batch_id}")
        )

        dup_urls = (
            flags.filter(F.col("dup_of").isNotNull()).select("url").distinct()
        )
        kept = batch_df.join(dup_urls, "url", "left_anti")
        chunks = build_chunks(kept, chunk_size, overlap, with_embeddings=False)
        _write_batch_idempotent(chunks, chunks_dir, batch_id)
        folded.unpersist()
        batch_df.unpersist()
        _prune_state(spark, state_dir, keep_from=batch_id - 1)

    return (
        pages_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
