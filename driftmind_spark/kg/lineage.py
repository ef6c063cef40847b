"""K8 — per-partition lineage/metrics checkpointing and resumability.

Every pipeline stage commits one lineage row per url-range bucket
``(run_id, stage, bucket, row_count, max_warc_ts, status)``; a restarted
run anti-joins completed buckets and processes only the remainder
(SURVEY.md §4.3).  This replaces the reference's 120+ lines of
compensating-delete sagas (``Services/DocumentProcessingService.cs:
183-296,330-347,490-520``) with idempotent partition overwrite + commit:

- stage outputs are written with ``partitionOverwriteMode=dynamic``, so a
  bucket partition that was half-written when the job died is cleanly
  replaced on re-run (its lineage row was never committed);
- the lineage append happens strictly AFTER the stage write returns, so a
  lineage row implies its bucket's data is durable;
- ``max_warc_ts`` per bucket is the event-time watermark analog of the
  reference's ``CreatedAt`` stamps (Models/DocumentChunk.cs:24-25).

On Iceberg deployments both writes fold into one transactional commit;
the parquet layout here keeps the same protocol with directory-level
atomicity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = (
    "run_id string, stage string, bucket int, row_count long, "
    "max_warc_ts timestamp, status string"
)


def bucket_col(url_col: str = "url", n_buckets: int = 32):
    """Deterministic url-range bucketing: pmod(xxhash64(url), n)."""
    return F.pmod(F.xxhash64(url_col), F.lit(n_buckets)).cast("int")


def lineage_path(out_dir: str) -> str:
    return os.path.join(out_dir, "lineage")


def read_lineage(spark: SparkSession, out_dir: str) -> DataFrame:
    path = lineage_path(out_dir)
    try:
        return spark.read.schema(LINEAGE_SCHEMA).parquet(path)
    except Exception:
        return spark.createDataFrame([], LINEAGE_SCHEMA)


def completed_buckets(
    spark: SparkSession, out_dir: str, run_id: str, stage: str
) -> DataFrame:
    """Buckets already committed for (run_id, stage) — one small column,
    always broadcastable."""
    return (
        read_lineage(spark, out_dir)
        .filter(
            (F.col("run_id") == run_id)
            & (F.col("stage") == stage)
            & (F.col("status") == "done")
        )
        .select("bucket")
        .distinct()
    )


def commit_stage(
    spark: SparkSession,
    out_dir: str,
    run_id: str,
    stage: str,
    written: DataFrame,
    ts_col: str = "warc_ts",
) -> None:
    """Append per-bucket lineage rows for data that is already durable.
    ``written`` must carry a ``bucket`` column."""
    agg_ts = (
        F.max(ts_col).alias("max_warc_ts")
        if ts_col in written.columns
        else F.lit(None).cast("timestamp").alias("max_warc_ts")
    )
    rows = (
        written.groupBy("bucket")
        .agg(F.count("*").alias("row_count"), agg_ts)
        .withColumn("run_id", F.lit(run_id))
        .withColumn("stage", F.lit(stage))
        .withColumn("status", F.lit("done"))
        .select("run_id", "stage", "bucket", "row_count", "max_warc_ts", "status")
    )
    rows.write.mode("append").parquet(lineage_path(out_dir))


def stage_marker_done(spark: SparkSession, out_dir: str, run_id: str, stage: str) -> bool:
    """For global (non-bucketed) stages: any committed lineage row."""
    return (
        read_lineage(spark, out_dir)
        .filter(
            (F.col("run_id") == run_id)
            & (F.col("stage") == stage)
            & (F.col("status") == "done")
        )
        .limit(1)
        .count()
        > 0
    )


def commit_global_stage(
    spark: SparkSession, out_dir: str, run_id: str, stage: str, row_count: int
) -> None:
    rows = spark.createDataFrame(
        [(run_id, stage, -1, row_count, None, "done")], LINEAGE_SCHEMA
    )
    rows.write.mode("append").parquet(lineage_path(out_dir))
