"""Interleaved A/B: r6 tree vs r7/r8 tree on the thread-scaling leg
(round-8 verdict item 1 — the `weak` flag on the halved local[32]
kg_docs_per_sec, 13,212 -> 6,448).

Static evidence first: ``git diff <r6> <r7> -- <measured modules>``
shows the ONLY change on the measured path (operators/chunking.py,
kg/triples.py, kernels/, session.py, synth.py, bench.py,
scripts/hw_control.py) is the addition of the MINHASH_KERNEL_VERSION
constant in kernels/hashing.py — a module-level assignment with no
runtime effect on extract/chunk/triples.  The halving therefore cannot
be a code regression; this script demonstrates it dynamically with the
round-5 methodology: both trees checked out as git worktrees, the SAME
local[32] scaling leg run alternately (A-B-B-A-A-B order) in one
session over one corpus, each round bracketed by a bare-multiprocessing
hardware control.  If the two trees' distributions overlap and the
per-round spread rivals the r6-vs-r7 artifact gap, the halving is host
weather; a consistent tree-separated gap would indicate a real
regression.

Usage: PYTHONPATH=. python scripts/thread_scaling_ab.py [rounds]
Never run concurrently with pytest or bench.py.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

R6_COMMIT = "1271223"   # "round 6: verdict/advice/correctness/bench"
R7_COMMIT = "7ae6c5b"   # "round 7: verdict/advice/correctness/bench"
CORES = 32
N_DOCS = 100_000

# the EXACT leg bench.py::_SCALING_SNIPPET runs at local[32]
_SNIPPET = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from driftmind_spark.session import get_spark
from driftmind_spark.operators.chunking import build_chunks, extract_text_table
from driftmind_spark.kg.triples import extract_triples_df

spark = get_spark(master="local[{cores}]", app_name="dm-ab",
                  shuffle_partitions={parts})
pages = spark.read.parquet({corpus!r} + "/pages.parquet").repartition({parts})
pages = pages.localCheckpoint()
n_docs = pages.count()
build_chunks(extract_text_table(pages), embedding_dim=64,
             use_text_column=True).count()
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
print(json.dumps({{"sec": round(best, 3), "docs": n_docs,
                   "docs_per_sec": round(n_docs / best, 1)}}))
"""


def _worktree(commit: str, path: str) -> str:
    if not os.path.exists(os.path.join(path, "bench.py")):
        subprocess.run(["git", "-C", REPO, "worktree", "add", "--detach",
                        path, commit], check=True, capture_output=True)
    return path


def _leg(repo: str, corpus: str) -> float:
    code = _SNIPPET.format(repo=repo, cores=CORES, parts=4 * CORES,
                           corpus=corpus)
    res = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=1800)
    line = [l for l in res.stdout.strip().splitlines()
            if l.startswith("{")][-1]
    return json.loads(line)["docs_per_sec"]


def _ctrl(corpus: str) -> float:
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "hw_control.py"),
         os.path.join(corpus, "pages.parquet"), "24000", str(CORES)],
        capture_output=True, text=True, timeout=1800)
    line = [l for l in res.stdout.strip().splitlines()
            if l.startswith("{")][-1]
    return json.loads(line)["workers"][str(CORES)]


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from bench import _corpus_dir, SCALING_SENT

    corpus = _corpus_dir(N_DOCS, *SCALING_SENT)
    r6 = _worktree(R6_COMMIT, "/tmp/dm_ab_r6")
    r7 = _worktree(R7_COMMIT, "/tmp/dm_ab_r7")

    result = {"cores": CORES, "n_docs": N_DOCS, "rounds": [],
              "r6_commit": R6_COMMIT, "r7_commit": R7_COMMIT}
    for r in range(rounds):
        ctrl = _ctrl(corpus)
        legs = [("r6", r6), ("r7", r7)]
        if r % 2 == 1:
            legs.reverse()
        row = {"order": "->".join(k for k, _ in legs),
               "control_docs_per_sec": ctrl}
        for key, repo in legs:
            row[key] = _leg(repo, corpus)
        result["rounds"].append(row)
        print(json.dumps(row))
    r6s = [r["r6"] for r in result["rounds"]]
    r7s = [r["r7"] for r in result["rounds"]]
    result["summary"] = {
        "r6_docs_per_sec": r6s, "r7_docs_per_sec": r7s,
        "r6_median": _median(r6s), "r7_median": _median(r7s),
        "r7_over_r6": round(_median(r7s) / _median(r6s), 3),
        "spread_r6": round(max(r6s) / min(r6s), 3),
        "spread_r7": round(max(r7s) / min(r7s), 3),
    }
    out = os.path.join(REPO, "BENCH", "thread_scaling_ab_r8.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result["summary"]))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
