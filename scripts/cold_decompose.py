#!/usr/bin/env python
"""Cold-cost decomposition for headline queries (optimization guide §1):
in a fresh process with bench.py's exact env + warm passes, split each
query's single cold execution into (a) DataFrame build (py4j expression
construction + eager analysis), (b) optimization + physical planning
(forced via executedPlan), (c) execution (count).  NOT part of the
driver contract."""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", str(2 * 1024 * 1024))
    os.environ.setdefault("SPARK_GRAFT_OPEN_COST_BYTES", str(128 * 1024))
    from driftmind_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(master=f"local[{CPUS}]", app_name="driftmind-cold-decompose")
    qmap = entry_mod.queries()
    qmap["distinct_counts"](spark, SF_DIR).collect()
    qmap["chunk_documents"](spark, SF_DIR).count()
    names = sys.argv[1:] or [
        "minhash_lsh", "ngram_jaccard", "terms", "range_join_context",
        "ann_bruteforce",
    ]
    for name in names:
        t0 = time.perf_counter()
        df = qmap[name](spark, SF_DIR)
        t1 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()
        t2 = time.perf_counter()
        df.count()
        t3 = time.perf_counter()
        print(f"{name:22s} build {t1-t0:6.3f}  plan {t2-t1:6.3f}  "
              f"exec {t3-t2:6.3f}  total {t3-t0:6.3f}", flush=True)
        # second pass = the warm steady state for reference
        t0 = time.perf_counter()
        df2 = qmap[name](spark, SF_DIR)
        t1 = time.perf_counter()
        df2._jdf.queryExecution().executedPlan()
        t2 = time.perf_counter()
        df2.count()
        t3 = time.perf_counter()
        print(f"{'':22s} build {t1-t0:6.3f}  plan {t2-t1:6.3f}  "
              f"exec {t3-t2:6.3f}  total {t3-t0:6.3f}  (warm)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
