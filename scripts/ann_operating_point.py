"""ANN operating-point evidence at 1M x 256-d (round-8 verdict item 5).

Question on record since round 5: does the engine need an HNSW-class
index (the reference delegates to Azure AI Search's HNSW,
`Services/SearchService.cs:86-94`), or do the two Spark-native
structures — IVF (coarse-quantizer inverted lists) and hyperplane LSH —
reach the HNSW-comparable recall band (~0.95 @ k=10) at a useful
fraction of brute-force cost?

Method: synthetic clustered corpus (2,000 unit-sphere cluster centers,
sigma-noised members, l2-normalized — the shape real embedding corpora
have; pure-noise corpora make top-k ill-conditioned for EVERY index
family including HNSW), 64 held-out queries, exact brute-force truth,
then a parameter sweep of ivf_topk (n_probe) and lsh_topk
(n_planes x n_tables).  Published per config: recall@10 against truth,
wall seconds (including index build/training — the honest number for a
batch engine where the index is rebuilt per run), and candidate
fraction where cheap to derive.

Usage: PYTHONPATH=. python scripts/ann_operating_point.py [n] [out_suffix]
Never run concurrently with pytest or bench.py (host-capacity drift).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from multiprocessing import Pool

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DIM = 256
K = 10
NQ = 64
CLUSTERS = 2_000
# Per-coordinate noise.  The TOTAL noise norm is sigma*sqrt(dim) ~= 1.0
# against unit centers: member-center cosine ~0.72, member-member
# ~0.5 — clusters that overlap enough for the probe-depth/recall trade
# to be visible while true neighbors remain same-cluster.  Calibration
# history (kept for honesty, all three runs measured): 0.35 gave noise
# norm 5.6 — near-uniform vectors, every index family <0.12 recall
# (correctly: the ill-conditioned regime the header warns about); 0.04
# gave cleanly separated clusters — IVF 0.997 at n_probe=1, no trade
# visible; 0.095 overshot the other way — IVF 0.74 at n_probe=32,
# the 0.95 band unreachable at sane cost.
SIGMA = 0.0625
SHARD = 50_000
# the cache dir encodes every generative parameter: a _DONE-marked
# corpus built under OLD parameters must never be silently reused for
# an artifact that records the new ones (round-8 review finding)
CORPUS_TMPL = "/tmp/dm8_ann_corpus_{n}_d{dim}_c{clusters}_s{sigma}"


def _centers():
    import numpy as np

    rng = np.random.RandomState(42)
    c = rng.randn(CLUSTERS, DIM)
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def _gen_shard(args):
    shard_idx, count, out_path = args
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    centers = _centers()
    rng = np.random.RandomState(1_000 + shard_idx)
    idx = rng.randint(0, CLUSTERS, count)
    vecs = centers[idx] + SIGMA * rng.randn(count, DIM)
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(
        np.float32)
    vec_id = np.arange(count, dtype=np.int64) + shard_idx * SHARD
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(vecs.reshape(-1)), DIM).cast(pa.list_(pa.float32()))
    pq.write_table(pa.table({"vec_id": vec_id, "embedding": emb}), out_path)
    return count


def build_corpus(n: int, out_dir: str) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(os.path.join(out_dir, "_DONE")):
        return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    vec_dir = os.path.join(out_dir, "vectors.parquet")
    os.makedirs(vec_dir)
    jobs = [
        (i, min(SHARD, n - s), os.path.join(vec_dir, f"part-{i:05d}.parquet"))
        for i, s in enumerate(range(0, n, SHARD))
    ]
    with Pool(min(24, len(jobs))) as pool:
        assert sum(pool.map(_gen_shard, jobs)) == n
    # held-out queries, same generative recipe, disjoint ids
    centers = _centers()
    rng = np.random.RandomState(999)
    idx = rng.randint(0, CLUSTERS, NQ)
    q = centers[idx] + SIGMA * rng.randn(NQ, DIM)
    q = (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(q.reshape(-1)), DIM).cast(pa.list_(pa.float32()))
    pq.write_table(
        pa.table({"vec_id": np.arange(NQ, dtype=np.int64) + 10_000_000_000,
                  "embedding": emb}),
        os.path.join(out_dir, "queries.parquet"),
    )
    open(os.path.join(out_dir, "_DONE"), "w").close()
    return out_dir


def _recall(got_rows, truth: dict) -> float:
    got: dict[int, set] = {}
    for r in got_rows:
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    hit = sum(len(got.get(q, set()) & t) for q, t in truth.items())
    return hit / sum(len(t) for t in truth.values())


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    suffix = sys.argv[2] if len(sys.argv) > 2 else ""

    from driftmind_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        lsh_topk,
    )
    from driftmind_spark.session import get_spark

    corpus = build_corpus(
        n, CORPUS_TMPL.format(n=n, dim=DIM, clusters=CLUSTERS, sigma=SIGMA)
    )
    print(f"corpus ready: {corpus}")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=2 * cpus)
    vectors = spark.read.parquet(
        os.path.join(corpus, "vectors.parquet")).cache()
    vectors.count()  # pin the scan; every config reads the same cache
    queries = spark.read.parquet(os.path.join(corpus, "queries.parquet"))

    result = {"n_vectors": n, "dim": DIM, "k": K, "n_queries": NQ,
              "clusters": CLUSTERS, "sigma": SIGMA, "cpus": cpus,
              "configs": []}

    t0 = time.monotonic()
    truth_rows = brute_force_topk(queries, vectors, k=K).collect()
    bf_wall = round(time.monotonic() - t0, 1)
    truth: dict[int, set] = {}
    for r in truth_rows:
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])
    result["bruteforce_wall_sec"] = bf_wall
    print(f"brute-force truth: {bf_wall}s")

    def run(name, fn, **params):
        t0 = time.monotonic()
        rows = fn(queries, vectors, k=K, **params).collect()
        wall = round(time.monotonic() - t0, 1)
        rec = round(_recall(rows, truth), 4)
        cfg = {"index": name, **params, "wall_sec": wall,
               "recall_at_10": rec,
               "speedup_vs_bruteforce": round(bf_wall / wall, 2)}
        result["configs"].append(cfg)
        print(json.dumps(cfg))

    for n_probe in (1, 2, 4, 8, 16, 32):
        run("ivf", ivf_topk, n_centroids=256, n_probe=n_probe,
            max_sample_rows=50_000)
    # (6, 16) is deliberately absent: 64 buckets/table x 16 tables at 1M
    # rows yields ~16M candidate pairs carrying two 256-d vectors each
    # (~65 GB through the dedup exchange) — it filled the sandbox disk,
    # and a candidate set that large is a worse brute force, not an
    # operating point.
    for n_planes, n_tables in ((12, 8), (10, 8), (8, 8), (8, 16)):
        run("lsh", lsh_topk, dim=DIM, n_planes=n_planes, n_tables=n_tables)

    # headline: cheapest config per family at the HNSW-comparable band
    for fam in ("ivf", "lsh"):
        good = [c for c in result["configs"]
                if c["index"] == fam and c["recall_at_10"] >= 0.95]
        result[f"best_{fam}_at_0.95"] = (
            min(good, key=lambda c: c["wall_sec"]) if good else None
        )
    out_path = os.path.join(REPO, "BENCH",
                            f"ann_operating_point_r8{suffix}.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
