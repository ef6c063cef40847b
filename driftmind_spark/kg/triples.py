"""K1 — OpenIE triple extraction as a DataFrame stage.

One vectorized pandas UDF emits ``array<struct>`` per page; ``explode``
flattens — the UDTF-shaped pattern from SURVEY.md §2.10.  Stateless
per-url: narrow, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.udfs import triples_udf
from ..operators.chunking import extract_pages, validated_pages


def extract_triples_df(pages: DataFrame, use_text_column: bool = False) -> DataFrame:
    """pages -> triples(url, warc_ts, lang, subj, pred, obj, conf)."""
    extracted = extract_pages(validated_pages(pages), use_text_column)
    return (
        extracted
        .select(
            "url",
            "warc_ts",
            "lang",
            F.explode(triples_udf("extracted", "lang")).alias("t"),
        )
        .select(
            "url",
            "warc_ts",
            "lang",
            F.col("t.subj").alias("subj"),
            F.col("t.pred").alias("pred"),
            F.col("t.obj").alias("obj"),
            F.col("t.conf").alias("conf"),
        )
    )


def dedup_triples(triples: DataFrame) -> DataFrame:
    """A8 — canonical triple table: one row per (subj, pred, obj) with
    support count and first-seen timestamp.  Catalyst plans this as
    partial (map-side) + final hash aggregation; no skew issue because the
    full triple key is high-cardinality even when subjects are Zipfian."""
    return triples.groupBy("subj", "pred", "obj").agg(
        F.count("*").alias("support"),
        F.min("warc_ts").alias("first_seen"),
        F.max("conf").alias("conf"),
    )
