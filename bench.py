#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "total_sec", "value": N, "unit": "sec",
     "queries": {...}, "sf": ...,
     "kg_docs_per_sec": ..., "scaling": {...}}

The ``scaling`` block is the sandbox substitute for the north-rule's
N-vs-4N-executor requirement (BASELINE.md): the same KG job (extract ->
chunk -> embed -> triples over a deterministic synthetic pages corpus)
is run in two fresh subprocesses at ``local[8]`` and ``local[32]`` on
identical input; efficiency = (docs_per_sec_32 / docs_per_sec_8) / 4.
Disable with ``SPARK_GRAFT_BENCH_SCALING=0`` for quick iteration.
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
SCALING_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_SCALING_DOCS", "40000"))

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


def _corpus_dir(n_docs: int) -> str:
    """Deterministic synthetic pages corpus, cached across runs."""
    d = f"/tmp/driftmind_bench_corpus_{n_docs}"
    marker = os.path.join(d, "pages.parquet")
    if not os.path.exists(marker):
        from driftmind_spark.synth import write_corpus

        write_corpus(d, n=n_docs)
    return d


def _run_headline() -> tuple[dict, float]:
    from driftmind_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(master=f"local[{CPUS}]", app_name="driftmind-bench")
    qmap = entry_mod.queries()
    times: dict[str, float] = {}
    # warm the JVM/Arrow path once on a cheap query so q1 isn't charged
    # with session startup
    qmap["distinct_counts"](spark, SF_DIR).collect()
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
from driftmind_spark.operators.chunking import build_chunks
from driftmind_spark.kg.triples import extract_triples_df

spark = get_spark(master="local[{cores}]", app_name="driftmind-scaling",
                  shuffle_partitions={parts})
pages = spark.read.parquet({corpus!r} + "/pages.parquet")
n_docs = pages.count()
# warm-up: tiny slice through the full UDF path (JIT + Arrow init)
build_chunks(pages.limit(64), embedding_dim=64).count()
t0 = time.perf_counter()
chunks = build_chunks(pages, embedding_dim=64)
n_chunks = chunks.count()
triples = extract_triples_df(pages)
n_triples = triples.count()
dt = time.perf_counter() - t0
print(json.dumps({{"cores": {cores}, "sec": round(dt, 3),
                   "docs": n_docs, "docs_per_sec": round(n_docs / dt, 1),
                   "chunks": n_chunks, "triples": n_triples}}))
"""


def _run_scaling(n_docs: int) -> dict:
    corpus = _corpus_dir(n_docs)
    out = {}
    for cores in (8, 32):
        code = _SCALING_SNIPPET.format(
            repo=REPO, cores=cores, parts=2 * cores, corpus=corpus
        )
        res = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=1800,
        )
        line = [l for l in res.stdout.strip().splitlines() if l.startswith("{")][-1]
        out[f"local[{cores}]"] = json.loads(line)
    eff = (
        out["local[32]"]["docs_per_sec"] / out["local[8]"]["docs_per_sec"]
    ) / 4.0
    out["scaling_efficiency"] = round(eff, 3)
    return out


def main() -> None:
    result: dict = {"metric": "total_sec", "unit": "sec", "sf": SF_DIR}
    times, total = _run_headline()
    result["queries"] = times
    result["value"] = total
    if SCALING:
        scaling = _run_scaling(SCALING_DOCS)
        result["scaling"] = scaling
        result["kg_docs_per_sec"] = scaling["local[32]"]["docs_per_sec"]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
