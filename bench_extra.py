#!/usr/bin/env python
"""Per-query measurement harness for the optimization rounds (guide §1).

NOT part of the driver contract — ``bench.py`` stays frozen.  This tool
times individual ``queries()`` entries with a warm pass + N repetitions
(same ``df.count()`` action the driver times), prints per-query
min/median/reps, and optionally writes the POST-EXECUTION (AQE-final)
plan to ``plans/<tag>/<name>_<suffix>.txt``.

Usage:
    python bench_extra.py [-n REPS] [--plans TAG] [--suffix SUF] [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("-n", type=int, default=5)
    ap.add_argument("--plans", default=None, help="plans/<TAG> dir for AQE-final plans")
    ap.add_argument("--suffix", default="after")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", str(2 * 1024 * 1024))
    os.environ.setdefault("SPARK_GRAFT_OPEN_COST_BYTES", str(128 * 1024))
    from driftmind_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(master=f"local[{CPUS}]", app_name="driftmind-bench-extra")
    qmap = entry_mod.queries()
    names = args.queries or [
        "pricing_summary", "join_customer_orders", "argmax_per_user",
        "sessionize", "range_join_context", "grouped_topk", "terms",
        "quality_scores", "exact_dedup", "minhash_lsh", "ngram_jaccard",
        "ann_bruteforce", "chunk_documents",
    ]
    # same warm discipline as bench.py
    qmap["distinct_counts"](spark, SF_DIR).collect()
    qmap["chunk_documents"](spark, SF_DIR).count()
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        reps = []
        for r in range(args.n + 1):  # +1 warm pass, dropped
            t0 = time.perf_counter()
            df = qmap[name](spark, SF_DIR)
            df.count()
            dt = round(time.perf_counter() - t0, 3)
            if r > 0:
                reps.append(dt)
        s = sorted(reps)
        med = s[len(s) // 2] if len(s) % 2 else (s[len(s)//2 - 1] + s[len(s)//2]) / 2
        out[name] = {"median": round(med, 3), "min": s[0], "reps": reps}
        print(f"{name:24s} med {med:7.3f}  min {s[0]:7.3f}  reps {reps}")
        if args.plans:
            d = os.path.join(REPO, "plans", args.plans)
            os.makedirs(d, exist_ok=True)
            plan = df._jdf.queryExecution().executedPlan().toString()
            with open(os.path.join(d, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
    print(json.dumps({k: v["median"] for k, v in out.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
