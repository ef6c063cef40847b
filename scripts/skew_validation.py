#!/usr/bin/env python
"""Skewed-corpus scale validation (round 6).

The uniform bench corpus never stresses the salted edges key or the
dedup hot-bucket caps; this script runs the pipeline on a HARD-skewed
corpus (Zipf exponent 2.5 over subject entities — the head entity takes
~74% of all triples) and reports the two skew-mitigation proofs:

1. **Edges write**: rows per output bucket and per-task runtimes for the
   edges stage, at salt=8 (the mitigation) vs salt=1 (what a naive
   subject-hash partitioning degenerates to).  The claim to verify: with
   salt=1 the head subject concentrates its rows into few buckets
   (max/median blows up); with salt=8 the same corpus spreads.
2. **Dedup band join**: the shared-params hot-band observability
   (``minhash_hot_band_stats(**corpus_dedup_params())``) over the same
   corpus — bucket caps must keep the candidate join bounded.

Task-level metrics come from the Spark UI REST API, grouped by the
pipeline's per-stage job descriptions (``dm:<run_id>:<stage>``).  Run on
an idle host (host CPU overcommit distorts single-task times; the
rows-per-bucket ratios are deterministic and are the structural claim).

Usage::

    PYTHONPATH=/root/repo python scripts/skew_validation.py [n_pages]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import urllib.request
from multiprocessing import Pool

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ZIPF_S = 2.5
N_DEFAULT = 100_000


def _gen_shard(args):
    start, cnt, out_path = args
    import pyarrow.parquet as pq

    from driftmind_spark.synth import generate_pages

    pages, _ = generate_pages(cnt, start=start, min_sent=20, max_sent=60,
                              dup_rate=0.1, zipf_s=ZIPF_S)
    pq.write_table(pages, out_path)
    return cnt


def build_corpus(n: int, out_dir: str, workers: int = 24) -> str:
    """Zipf-2.5 skewed corpus, generated in parallel (cached)."""
    pages_dir = os.path.join(out_dir, "pages.parquet")
    if os.path.exists(os.path.join(out_dir, "_DONE")):
        return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(pages_dir)
    shard = max(2_000, n // (workers * 2))
    jobs = [
        (s, min(shard, n - s), os.path.join(pages_dir, f"part-{s:09d}.parquet"))
        for s in range(0, n, shard)
    ]
    with Pool(workers) as pool:
        done = sum(pool.map(_gen_shard, jobs))
    assert done == n
    import pyarrow as pa
    import pyarrow.parquet as pq

    from driftmind_spark.kernels.vocab import ALIASES

    pq.write_table(
        pa.table({"alias": list(ALIASES.keys()),
                  "entity": list(ALIASES.values())}),
        os.path.join(out_dir, "aliases.parquet"),
    )
    open(os.path.join(out_dir, "_DONE"), "w").close()
    return out_dir


def _rest(url):
    return json.load(urllib.request.urlopen(url))


def stage_task_skew(spark, run_ids: list[str]) -> dict:
    """Per pipeline-stage task-time skew from the UI REST API: for every
    Spark stage tagged ``dm:<run_id>:<stage>``, the max/median task
    executorRunTime of its heaviest stages."""
    base = spark.sparkContext.uiWebUrl
    app = _rest(f"{base}/api/v1/applications")[0]["id"]
    stages = _rest(f"{base}/api/v1/applications/{app}/stages?status=complete")
    out: dict = {}
    for st in stages:
        desc = st.get("description") or ""
        if not desc.startswith("dm:"):
            continue
        _, run_id, pstage = desc.split(":", 2)
        # >= 4: AQE coalesces write stages to few fat tasks — exactly the
        # stages where the straggler lives; only skip 1-2-task trivia
        if run_id not in run_ids or st["numCompleteTasks"] < 4:
            continue
        try:
            q = _rest(
                f"{base}/api/v1/applications/{app}/stages/"
                f"{st['stageId']}/{st['attemptId']}/taskSummary"
                "?quantiles=0.0,0.5,1.0"
            )
        except Exception:
            continue
        lo, med, hi = q["executorRunTime"]
        key = f"{run_id}/{pstage}"
        cur = out.setdefault(
            key, {"stages": 0, "heaviest": None, "most_skewed": None}
        )
        cur["stages"] += 1
        entry = {
            "spark_stage": st["stageId"],
            "tasks": st["numCompleteTasks"],
            "task_ms_median": med,
            "task_ms_max": hi,
            "max_over_median": round(hi / max(med, 1.0), 2),
            "stage_sec": round(st["executorRunTime"] / 1000, 1),
        }
        if (cur["heaviest"] is None
                or entry["stage_sec"] > cur["heaviest"]["stage_sec"]):
            cur["heaviest"] = entry
        # straggler view: ignore trivial stages, then keep the worst
        # max/median task ratio — this is where the hot bucket shows up
        if entry["stage_sec"] >= 1.0 and (
                cur["most_skewed"] is None
                or entry["max_over_median"] > cur["most_skewed"]["max_over_median"]):
            cur["most_skewed"] = entry
    return out


def bucket_distribution(spark, path: str) -> dict:
    from pyspark.sql import functions as F

    per = (
        spark.read.parquet(path).groupBy("bucket")
        .agg(F.count("*").alias("n")).toPandas()
    )
    n = per["n"]
    return {
        "buckets": int(len(n)),
        "rows": int(n.sum()),
        "max": int(n.max()),
        "median": float(n.median()),
        "max_over_median": round(float(n.max()) / max(float(n.median()), 1.0), 2),
        # share of all rows in the hottest bucket; the uniform ideal is
        # 1/n_buckets — this is the straggler-task bound a real cluster
        # sees, robust to tiny medians
        "max_share": round(float(n.max()) / max(float(n.sum()), 1.0), 4),
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else N_DEFAULT
    corpus = build_corpus(n, f"/tmp/dm6_skew_corpus_{n}")
    os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES",
                          str(8 * 1024 * 1024))

    from driftmind_spark.operators.dedup import (
        corpus_dedup_params,
        minhash_hot_band_stats,
    )
    from driftmind_spark.session import get_spark
    from driftmind_spark.kg import pipeline
    from pyspark.sql import functions as F

    spark = get_spark(master="local[32]", app_name="skew-validation",
                      shuffle_partitions=128,
                      extra_conf={"spark.ui.enabled": "true"})

    report: dict = {"n_pages": n, "zipf_s": ZIPF_S}
    for salt in (32, 8, 1):
        run_id = f"skew-salt{salt}"
        out = f"/tmp/dm6_skew_out_salt{salt}"
        shutil.rmtree(out, ignore_errors=True)
        m = pipeline.run(spark, corpus, out, run_id=run_id, n_buckets=64,
                         embedding_dim=64, dedup=True, salt=salt)
        report[f"salt{salt}"] = {
            "metrics": {k: v for k, v in m.items() if k != "run_id"},
            "edges_bucket_dist": bucket_distribution(spark, f"{out}/edges"),
        }

    # head-entity concentration (ground truth for the skew severity)
    edges = spark.read.parquet("/tmp/dm6_skew_out_salt8/edges")
    head = (
        edges.groupBy("subj_canonical").agg(F.count("*").alias("n"))
        .orderBy(F.desc("n")).limit(1).collect()[0]
    )
    report["head_subject_share"] = round(
        head["n"] / report["salt8"]["edges_bucket_dist"]["rows"], 3
    )
    report["head_subject"] = head["subj_canonical"]

    # dedup band-join hot buckets under skew, SAME params as production;
    # corpus_dedup runs MinHash over md5-unique texts, so mirror that
    params = corpus_dedup_params()
    docs = (
        spark.read.parquet("/tmp/dm6_skew_out_salt8/extracted")
        .select(F.col("url").alias("doc_id"), "text")
        .dropDuplicates(["text"])
    )
    hot = minhash_hot_band_stats(docs, **params).toPandas()
    report["dedup_hot_bands"] = {
        "cap": params["max_bucket_size"],
        "buckets_over_cap": int(len(hot)),
        "max_bucket": int(hot["bucket_size"].max()) if len(hot) else 0,
    }

    report["task_skew"] = stage_task_skew(
        spark, [f"skew-salt{s}" for s in (32, 8, 1)]
    )

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "skew_validation_r6.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("SKEW " + json.dumps({
        "n": n,
        "head_share": report["head_subject_share"],
        "edges_max_share": {
            s: report[f"salt{s}"]["edges_bucket_dist"]["max_share"]
            for s in (1, 8, 32)
        },
        "hot_bands_over_cap": report["dedup_hot_bands"]["buckets_over_cap"],
    }))


if __name__ == "__main__":
    main()
