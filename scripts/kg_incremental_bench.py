"""Cost curve: full vs incremental KG snapshot rebuild as the
accumulated corpus grows (round-8 verdict item 2's "Done" evidence).

Simulates the streaming triples store directly: the bench corpus is
extracted once, sliced into B equal batches, and appended to a
batch_id-partitioned triples table one slice at a time.  After each
append, the snapshot is rebuilt both ways on separate stores:

  * FULL  — streaming/ingest.py::rebuild_kg_snapshot: re-runs mention
    aggregation + banding + pair scoring + CC over the WHOLE store and
    rewrites the materialized edges table — O(accumulated corpus).
  * INCR  — rebuild_kg_snapshot_incremental: delta-linking + contracted
    CC over the new slice only, edges as a read-time view —
    O(delta + dictionary).

Published: wall per rebuild at 1x..Bx accumulation, the growth ratios
wall(Bx)/wall(1x) for both modes, an identity check (nodes + edges of
the final snapshots must match exactly), and the read-time cost of the
incremental edges VIEW vs the materialized table (the trade the design
makes explicitly).

Scale note (measured, kept in the artifact): at 100k synth pages the
surface dictionary is tiny (~74 surfaces) and the full rebuild is
already fixed-cost-bound (~3.5 s), so the incremental path's extra
orchestration (state read, crossing check, band union, state writes)
makes it SLOWER there — the crossover needs the O(corpus) terms
(mention agg + materialized edge rewrite) to dominate, which the 1M run
shows.  Deploy guidance follows from the curve: run incremental when
the accumulated store is large relative to a micro-batch — exactly the
crawl regime it exists for.

Usage: PYTHONPATH=. python scripts/kg_incremental_bench.py \
           [n_pages] [n_batches] [out_suffix] [pages_parquet_dir]
``pages_parquet_dir`` overrides the bench synth corpus (e.g. the 1M
full-stack corpus /tmp/dm6_corpus_1m_full/pages.parquet); n_pages is
then informational only.
Never run concurrently with pytest or bench.py (host-capacity drift).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    suffix = sys.argv[3] if len(sys.argv) > 3 else ""

    from pyspark.sql import functions as F

    from bench import _corpus_dir, SCALING_SENT
    from driftmind_spark.kg.lineage import bucket_col
    from driftmind_spark.kg.triples import extract_triples_df
    from driftmind_spark.session import get_spark
    from driftmind_spark.streaming.ingest import (
        read_kg_snapshot,
        rebuild_kg_snapshot,
        rebuild_kg_snapshot_incremental,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=2 * cpus)
    if len(sys.argv) > 4:
        pages_path = sys.argv[4]
    else:
        pages_path = f"{_corpus_dir(n, *SCALING_SENT)}/pages.parquet"

    out_full = f"/tmp/dm8_kginc_full_{n}{suffix}"
    out_inc = f"/tmp/dm8_kginc_inc_{n}{suffix}"
    for d in (out_full, out_inc):
        shutil.rmtree(d, ignore_errors=True)

    pages = spark.read.parquet(pages_path)
    # deterministic equal slices by url hash — the same pages reach the
    # same batch on every run
    sliced = pages.withColumn(
        "batch_id", F.pmod(F.xxhash64("url"), F.lit(n_batches)).cast("int")
    )
    result = {"n_pages": pages.count(), "n_batches": n_batches,
              "cpus": cpus, "pages_path": pages_path,
              "full": [], "incremental": []}
    for b in range(n_batches):
        tri = extract_triples_df(
            sliced.filter(F.col("batch_id") == b).drop("batch_id"),
            use_text_column=True,
        ).withColumn("bucket", bucket_col("url", 8))
        for out in (out_full, out_inc):
            tri.withColumn("batch_id", F.lit(b)).write.mode(
                "overwrite"
            ).option("partitionOverwriteMode", "dynamic").partitionBy(
                "batch_id"
            ).parquet(f"{out}/triples")

        t0 = time.monotonic()
        assert rebuild_kg_snapshot(spark, out_full, b)
        w_full = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        assert rebuild_kg_snapshot_incremental(spark, out_inc, b)
        w_inc = round(time.monotonic() - t0, 2)
        meta = spark.read.parquet(
            f"{out_inc}/kg/snap_v={b}/meta").first()
        result["full"].append({"accum_batches": b + 1, "wall_sec": w_full})
        result["incremental"].append(
            {"accum_batches": b + 1, "wall_sec": w_inc,
             "mode": meta["mode"]})
        print(f"batch {b}: full={w_full}s incr={w_inc}s "
              f"(mode={meta['mode']})")

    # identity check on the FINAL snapshots (order-insensitive)
    ident = {}
    for table in ("nodes", "edges"):
        a = read_kg_snapshot(spark, out_inc, table)
        t0 = time.monotonic()
        ca = a.count()
        read_inc = round(time.monotonic() - t0, 2)
        b_ = read_kg_snapshot(spark, out_full, table)
        t0 = time.monotonic()
        cb = b_.count()
        read_full = round(time.monotonic() - t0, 2)
        cols = sorted(set(a.columns) & set(b_.columns))
        extra = a.select(*cols).exceptAll(b_.select(*cols)).count()
        missing = b_.select(*cols).exceptAll(a.select(*cols)).count()
        ident[table] = {"rows": ca, "rows_full": cb, "extra": extra,
                        "missing": missing,
                        "read_sec_incremental": read_inc,
                        "read_sec_full_materialized": read_full}
        assert ca == cb and extra == 0 and missing == 0, (table, ident)
    result["identity"] = ident
    fw = [r["wall_sec"] for r in result["full"]]
    iw = [r["wall_sec"] for r in result["incremental"]]
    result["summary"] = {
        "full_growth_last_over_first": round(fw[-1] / fw[0], 2),
        "incremental_growth_last_over_first": round(iw[-1] / iw[0], 2),
        "incremental_speedup_at_max_accum": round(fw[-1] / iw[-1], 2),
    }
    out_path = os.path.join(REPO, "BENCH",
                            f"kg_incremental_curve_r8{suffix}.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result["summary"]))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
