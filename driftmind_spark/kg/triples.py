"""K1 — OpenIE triple extraction as a DataFrame stage.

One vectorized pandas UDF emits ``array<struct>`` per page; ``explode``
flattens — the UDTF-shaped pattern from SURVEY.md §2.10.  Stateless
per-url: narrow, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.chunking import validated_pages


def _fused_triple_batches(use_text_column: bool):
    """Flat-column mapInArrow kernel: one Python crossing, plain string
    columns out.  The earlier pandas_udf + explode variant materialized
    millions of per-triple Python dicts inside nested Arrow arrays —
    allocator pressure that anti-scaled beyond ~8 workers; flat columnar
    lists sidestep it entirely.  Arrow-native I/O (r1 follow-up): the
    per-doc metadata (url/warc_ts/lang) is repeated via ``Array.take``
    instead of one Python list append per triple — at ~23 triples/page
    those appends were the kernel's dominant allocation source."""
    import pyarrow as pa

    from ..kernels.extract import extract_any
    from ..kernels.openie import extract_triples

    def kernel(batches):
        for rb in batches:
            cols = {n: rb.column(i) for i, n in enumerate(rb.schema.names)}
            if use_text_column:
                texts = cols["text"].to_pylist()
            else:
                texts = [
                    extract_any(u, h)
                    for u, h in zip(
                        cols["url"].to_pylist(), cols["html"].to_pylist()
                    )
                ]
            langs = cols["lang"].to_pylist()
            src_row: list[int] = []
            subjs: list[str] = []
            preds: list[str] = []
            objs: list[str] = []
            confs: list[float] = []
            for r, text in enumerate(texts):
                trs = extract_triples(text, langs[r] or "en")
                for (s, p, o, c) in trs:
                    subjs.append(s)
                    preds.append(p)
                    objs.append(o)
                    confs.append(c)
                src_row.extend([r] * len(trs))
            take = pa.array(src_row, type=pa.int64())
            yield pa.RecordBatch.from_arrays(
                [
                    cols["url"].take(take),
                    cols["warc_ts"].take(take),
                    cols["lang"].take(take),
                    pa.array(subjs, pa.string()),
                    pa.array(preds, pa.string()),
                    pa.array(objs, pa.string()),
                    pa.array(confs, pa.float32()),
                ],
                ["url", "warc_ts", "lang", "subj", "pred", "obj", "conf"],
            )

    return kernel


def extract_triples_df(pages: DataFrame, use_text_column: bool = False) -> DataFrame:
    """pages -> triples(url, warc_ts, lang, subj, pred, obj, conf)."""
    ts_type = dict(pages.dtypes).get("warc_ts", "timestamp_ntz")
    schema = (
        f"url string, warc_ts {ts_type}, lang string, "
        "subj string, pred string, obj string, conf float"
    )
    return validated_pages(pages).mapInArrow(
        _fused_triple_batches(use_text_column), schema
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
