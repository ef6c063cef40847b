#!/usr/bin/env python
"""spark-submit entry point for the KG pipeline (north_star: "ships as
spark-submit --py-files modules").

Usage::

    python scripts/make_pyfiles_zip.py /tmp/driftmind_spark.zip
    spark-submit --master local[32] \
        --py-files /tmp/driftmind_spark.zip \
        scripts/run_pipeline.py <corpus_dir> <out_dir> [run_id] \
            [--quality] [--dedup] [--chunk-dedup]

On a cluster, the same command with ``--master yarn``/``k8s`` and the
executor sizing of your fleet; every config the pipeline relies on
(AQE, Arrow, dynamic partition overwrite) is set programmatically in
``driftmind_spark.session`` so nothing depends on cluster defaults.
"""

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    flags = {"--dedup", "--quality", "--chunk-dedup"}
    args = [a for a in sys.argv[1:] if a not in flags]
    dedup = "--dedup" in sys.argv[1:]
    quality = "--quality" in sys.argv[1:]
    chunk_dedup = "--chunk-dedup" in sys.argv[1:]
    corpus_dir = args[0]
    out_dir = args[1]
    run_id = args[2] if len(args) > 2 else "run-1"

    # spark-submit owns the session; apply our confs onto the builder
    spark = (
        SparkSession.builder.appName("driftmind-kg-pipeline")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .getOrCreate()
    )
    # size shuffles to the actual cluster, not the 200-partition default:
    # the linking/CC stages run several small shuffles, and 200 mostly
    # empty tasks per shuffle cost ~6x wall on small cores (measured
    # 17s -> 102s for the nodes stage at local[4]); runtime-settable, so
    # deployments can still override via --conf
    if not spark.sparkContext.getConf().contains("spark.sql.shuffle.partitions"):
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(4 * spark.sparkContext.defaultParallelism),
        )
    from driftmind_spark.kg.pipeline import run

    metrics = run(spark, corpus_dir, out_dir, run_id=run_id,
                  quality=quality, dedup=dedup, chunk_dedup=chunk_dedup)
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
