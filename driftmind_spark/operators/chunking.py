"""The ingestion pipeline: pages -> extract -> chunk -> dedupe-embed ->
chunks DataFrame.

Spark rewrite of the reference's per-request upload path
(``Services/DocumentProcessingService.cs:40-412``, see SURVEY.md §3.1):
one declarative DAG instead of 5-6 network round-trips per document.

Scale notes (10^12 rows):
- extraction + chunking are stateless per-url -> narrow, no shuffle;
- ``posexplode`` assigns chunk indices at explode time (W4) — no window;
- the embed stage dedupes on the normalized chunk text first
  (``dropDuplicates``), which *is* the reference's embedding cache
  (EmbeddingService.cs:37-58) in batch form: one shuffle keyed by
  ``norm_text``, embeddings computed once per distinct text, then joined
  back (Catalyst picks SMJ; at high duplication the distinct side is
  small and AQE converts to broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.udfs import (
    extract_text_udf,
    make_chunk_udf,
    make_embed_udf,
    normalize_for_caching_udf,
)

MAX_PAGE_BYTES = 3 * 1024 * 1024  # appsettings.json:26 (3 MB upload cap)


def validated_pages(pages: DataFrame, langs: tuple[str, ...] | None = None) -> DataFrame:
    """S1/S2: row-level filters replacing the reference's per-file
    validation (FileProcessingService.cs:28-37) — pushed to the scan."""
    out = pages.filter(F.length("html") <= MAX_PAGE_BYTES)
    if langs:
        out = out.filter(F.col("lang").isin(*langs))
    return out


def extract_pages(pages: DataFrame, use_text_column: bool = False) -> DataFrame:
    """S3-S5: boilerplate-stripped main text per url.

    ``use_text_column=True`` trusts the pre-extracted ``text`` column (for
    corpora that ship one); default recomputes from ``html`` via the
    byte-parity kernel.
    """
    if use_text_column:
        return pages.withColumn("extracted", F.col("text"))
    return pages.withColumn("extracted", extract_text_udf("html"))


def build_chunks(
    pages: DataFrame,
    chunk_size: int = 300,
    overlap: int = 20,
    embedding_dim: int = 256,
    with_embeddings: bool = True,
    use_text_column: bool = False,
) -> DataFrame:
    """pages -> chunks(url, warc_ts, lang, chunk_index, content, chunk_id
    [, norm_text, embedding]).

    chunk_id is the reference's "{docId}_{index}" key
    (DocumentProcessingService.cs:394) — deterministic, so re-runs are
    idempotent (F14 note in SURVEY.md: no GUIDs).
    """
    chunk_udf = make_chunk_udf(chunk_size, overlap)
    extracted = extract_pages(validated_pages(pages), use_text_column)
    chunks = (
        extracted
        .filter(F.trim(F.col("extracted")) != "")  # P7 empty guard
        .select(
            "url",
            "warc_ts",
            "lang",
            F.posexplode(chunk_udf("extracted")).alias("chunk_index", "content"),
        )
        .withColumn("chunk_id", F.concat_ws("_", "url", "chunk_index"))
    )
    if not with_embeddings:
        return chunks

    embed = make_embed_udf(embedding_dim)
    chunks = chunks.withColumn("norm_text", normalize_for_caching_udf("content"))
    distinct_texts = chunks.select("norm_text").dropDuplicates()
    embedded = distinct_texts.withColumn("embedding", embed("norm_text"))
    return chunks.join(embedded, "norm_text")


def docs_meta(chunks: DataFrame) -> DataFrame:
    """The normalized replacement for the chunk-0 metadata convention
    (SURVEY.md §1.2): one row per url with catalog aggregates — the
    one-pass rewrite of GET /documents (SURVEY.md §3.3)."""
    return chunks.groupBy("url").agg(
        F.count("*").alias("chunk_count"),
        F.max("warc_ts").alias("last_updated"),
        F.first("lang").alias("lang"),
        F.sum(F.length("content")).alias("total_chars"),
    )
