"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.9 / task brief: the escape hatch for semantics the
built-in streaming operators cannot express).

``stream_new_versions`` — the incremental re-crawl gate: a page row is
emitted iff its ``warc_ts`` is STRICTLY newer than the newest version
ever seen for that url, and carries a monotonically increasing
``version`` number.  No built-in gets this:

- ``dropDuplicates(WithinWatermark)`` dedups on equality — it cannot
  compare ordering against persistent per-key state, and it cannot
  number versions;
- ``flatMapGroupsWithState`` is JVM-only; this is the Arrow-batched
  Python equivalent with explicit per-group state (latest_ts, version).

State is bounded two ways (crawl-scale requirement): the stream is
watermarked, and each url's state carries an EVENT-TIME TIMEOUT at
``watermark + ttl`` past its newest version — a url not re-crawled
within the horizon has its state evicted (a later re-appearance starts
again at version 1; the trade-off is documented and bounded, unlike
unbounded url state).

Batch analog for tests/backfills: :func:`new_versions_batch` computes
the same (url, warc_ts, version) assignment over a static DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OUT_SCHEMA = "url string, warc_ts timestamp, lang string, version int"
STATE_SCHEMA = "latest long, version int"


def _gate_fn(ttl_seconds: int):
    """Per-url state function: emit strictly-newer rows with version
    numbers; state = (latest_ts_epoch_us, version)."""

    def fn(key, pdf_iter, state):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        (url,) = key
        latest_us, version = state.get if state.exists else (-1, 0)
        out = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values("warc_ts")
            for ts, lang in zip(pdf["warc_ts"], pdf["lang"]):
                ts_us = int(pd.Timestamp(ts).value // 1000)
                if ts_us > latest_us:
                    latest_us = ts_us
                    version += 1
                    out.append((url, ts, lang, version))
        state.update((latest_us, version))
        if latest_us >= 0:
            # event-time TTL: evict when the watermark passes newest+ttl
            state.setTimeoutTimestamp(latest_us // 1000 + ttl_seconds * 1000)
        if out:
            yield pd.DataFrame(out, columns=["url", "warc_ts", "lang", "version"])

    return fn


def stream_new_versions(
    pages_stream: DataFrame,
    out_path: str,
    checkpoint_path: str,
    watermark: str = "1 hour",
    ttl_seconds: int = 7 * 24 * 3600,
):
    """pages stream -> only strictly-newer page versions, numbered."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gated = (
        pages_stream.select("url", "warc_ts", "lang")
        .withWatermark("warc_ts", watermark)
        .groupBy("url")
        .applyInPandasWithState(
            _gate_fn(ttl_seconds),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    return (
        gated.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def new_versions_batch(pages: DataFrame) -> DataFrame:
    """Batch analog (differential oracle for the stateful operator):
    distinct (url, warc_ts) ordered by time -> version numbers."""
    w = Window.partitionBy("url").orderBy("warc_ts")
    return (
        pages.select("url", "warc_ts", "lang")
        .dropDuplicates(["url", "warc_ts"])
        .withColumn("version", F.row_number().over(w).cast("int"))
    )
