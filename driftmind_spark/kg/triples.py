"""K1 — OpenIE triple extraction as a DataFrame stage.

One vectorized pandas UDF emits ``array<struct>`` per page; ``explode``
flattens — the UDTF-shaped pattern from SURVEY.md §2.10.  Stateless
per-url: narrow, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.chunking import validated_pages


def _fused_triple_rows(use_text_column: bool):
    """Flat-column mapInPandas kernel: one Python crossing, plain string
    columns out.  The earlier pandas_udf + explode variant materialized
    millions of per-triple Python dicts inside nested Arrow arrays —
    allocator pressure that anti-scaled beyond ~8 workers; flat columnar
    lists sidestep it entirely."""
    import pandas as pd

    from ..kernels.extract import extract_main_text
    from ..kernels.openie import extract_triples

    def kernel(batches):
        for pdf in batches:
            out = {
                "url": [], "warc_ts": [], "lang": [],
                "subj": [], "pred": [], "obj": [], "conf": [],
            }
            texts = pdf["text"] if use_text_column else pdf["html"].map(extract_main_text)
            for url, ts, lang, text in zip(
                pdf["url"], pdf["warc_ts"], pdf["lang"], texts
            ):
                for (s, p, o, c) in extract_triples(text, lang or "en"):
                    out["url"].append(url)
                    out["warc_ts"].append(ts)
                    out["lang"].append(lang)
                    out["subj"].append(s)
                    out["pred"].append(p)
                    out["obj"].append(o)
                    out["conf"].append(c)
            pdf_out = pd.DataFrame(out)
            if pdf_out.empty:
                # empty python lists default to float64; Arrow cannot cast
                # that to timestamp — pin the dtype explicitly
                pdf_out["warc_ts"] = pdf_out["warc_ts"].astype("datetime64[us]")
            yield pdf_out

    return kernel


def extract_triples_df(pages: DataFrame, use_text_column: bool = False) -> DataFrame:
    """pages -> triples(url, warc_ts, lang, subj, pred, obj, conf)."""
    ts_type = dict(pages.dtypes).get("warc_ts", "timestamp_ntz")
    schema = (
        f"url string, warc_ts {ts_type}, lang string, "
        "subj string, pred string, obj string, conf float"
    )
    return validated_pages(pages).mapInPandas(
        _fused_triple_rows(use_text_column), schema
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
