"""Dictionary-scale rebuild cost: full vs incremental when the SURFACE
DICTIONARY is large (round 8 follow-up to kg_incremental_curve).

The page-corpus curves (BENCH/kg_incremental_curve_r8*.json) hold the
entity vocabulary tiny (~100 surfaces — the synth generator's pool), so
the full rebuild's O(dictionary) linking term (banding + LSH pair
scoring + CC over every distinct surface, EVERY rebuild) is invisible
there; its growth is pure scan cost.  A real crawl's dictionary follows
Heaps' law into the millions, and that term is exactly what the
incremental path avoids.  This harness measures it directly by
synthesizing the TRIPLES STORE itself (the rebuild input — no page
text needed): per batch, a fixed number of triples whose subject/object
surfaces are drawn Zipf-style from a vocabulary PREFIX that grows by
``new_per_batch`` each batch (Heaps-like: most mentions re-use old
surfaces, a bounded set is new).  ~15% of surfaces are near-dup
variants ("<base> corp" / "<base> corporation") so pair scoring and CC
do real linking work, and surfaces are long enough (3 words) that
banding cost is realistic.

Published: wall per rebuild for both modes as the dictionary grows,
plus the final-snapshot identity check (nodes + edges-as-view vs the
materialized full tables).

Usage: PYTHONPATH=. python scripts/kg_incremental_dictionary_bench.py \
           [vocab_start] [new_per_batch] [n_batches] [triples_per_batch]
Defaults: 60k start, 20k new/batch, 4 batches, 300k triples/batch —
the final full rebuild links a 120k-surface dictionary while the
incremental one links 20k new surfaces against it.
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

# Three pools of 4096 pseudo-random 6-letter words (deterministic).
# Random-letter words keep the BACKGROUND char-shingle jaccard between
# unrelated surfaces near zero — structured pools ("alpha07 beta21 …")
# would share so many shingles that LSH banding floods with junk
# candidates and band buckets blow past the hot cap on every batch
# (which would force the incremental path into its full-rebuild
# fallback and measure nothing).
def _pools():
    import numpy as np

    rng = np.random.RandomState(7)
    return [
        ["".join(chr(97 + c) for c in rng.randint(0, 26, 6))
         for _ in range(4096)]
        for _ in range(3)
    ]


_POOLS = _pools()


def _surface(idx: int) -> str:
    # splitmix-style bit mixing, then 12 disjoint bits per slot: the
    # three pool indices vary independently (a per-slot multiplicative
    # `idx*k % 4096` collapses the TRIPLE to a 4096-cycle — measured
    # 12k distinct surfaces out of 50k ids and a 0.2 background jaccard
    # from shared words)
    # int() first: a numpy int64 times a 64-bit constant silently
    # promotes to float64 instead of arbitrary-precision int
    h = ((int(idx) + 1) * 0x9E3779B97F4A7C15) % (1 << 64)
    base = " ".join(
        _POOLS[s][(h >> (12 * s)) & 4095] for s in range(3)
    )
    # every ~7th surface is a near-dup VARIANT of the previous one:
    # same base words, 'corp' vs 'corporation' — high char-shingle
    # jaccard, so LSH banding + pair scoring + CC have real linking work
    if idx % 7 == 3:
        return base + " corporation"
    if idx % 7 == 4:
        return _surface(idx - 1).replace(" corporation", "") + " corp"
    return base


def _gen_batch(args):
    b, n_triples, vocab_hi, out_path = args
    import numpy as np
    import pyarrow as pa

    rng = np.random.RandomState(500 + b)
    # Zipf-ish draw over the CURRENT vocabulary prefix: rank r picked
    # with weight 1/(r+10), so head surfaces recur heavily (re-mentions)
    # while the tail — including every newly added surface — still
    # appears at least a few times
    ranks = np.arange(vocab_hi)
    w = 1.0 / (ranks + 10.0)
    w /= w.sum()
    subj = rng.choice(vocab_hi, n_triples, p=w)
    obj = rng.choice(vocab_hi, n_triples, p=w)
    # guarantee every new surface of this batch is mentioned: overwrite
    # the first slots round-robin (keeps the draw deterministic)
    lo = max(0, vocab_hi - (vocab_hi // 4))
    fresh = np.arange(lo, vocab_hi)
    subj[: len(fresh)] = fresh
    ts = pa.array(
        (1_700_000_000_000_000 + rng.randint(0, 10**6, n_triples))
        .astype("datetime64[us]")
    )
    tbl = pa.table({
        "url": pa.array([f"https://ex.org/b{b}/p{i % 50_000}"
                         for i in range(n_triples)]),
        "warc_ts": ts,
        "lang": pa.array(["en"] * n_triples),
        "subj": pa.array([_surface(s) for s in subj]),
        "pred": pa.array(["mentions"] * n_triples),
        "obj": pa.array([_surface(o) for o in obj]),
        "conf": pa.array(np.full(n_triples, 0.9, dtype=np.float32)),
        "bucket": pa.array((subj % 8).astype(np.int32)),
    })
    import pyarrow.parquet as pq

    os.makedirs(out_path, exist_ok=True)
    pq.write_table(tbl, os.path.join(out_path, "part-0.parquet"))
    return n_triples


def main() -> None:
    vocab_start = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    new_per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    per_batch = int(sys.argv[4]) if len(sys.argv) > 4 else 300_000

    from driftmind_spark.session import get_spark
    from driftmind_spark.streaming.ingest import (
        read_kg_snapshot,
        rebuild_kg_snapshot,
        rebuild_kg_snapshot_incremental,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=2 * cpus)

    out_full = "/tmp/dm8_kgdict_full"
    out_inc = "/tmp/dm8_kgdict_inc"
    for d in (out_full, out_inc):
        shutil.rmtree(d, ignore_errors=True)

    result = {"vocab_start": vocab_start, "new_per_batch": new_per_batch,
              "n_batches": n_batches, "triples_per_batch": per_batch,
              "cpus": cpus, "full": [], "incremental": []}
    for b in range(n_batches):
        vocab_hi = vocab_start + b * new_per_batch
        for out in (out_full, out_inc):
            _gen_batch((b, per_batch, vocab_hi,
                        f"{out}/triples/batch_id={b}"))
        t0 = time.monotonic()
        assert rebuild_kg_snapshot(spark, out_full, b)
        w_full = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        assert rebuild_kg_snapshot_incremental(spark, out_inc, b)
        w_inc = round(time.monotonic() - t0, 2)
        meta = spark.read.parquet(f"{out_inc}/kg/snap_v={b}/meta").first()
        result["full"].append(
            {"vocab": vocab_hi, "wall_sec": w_full})
        result["incremental"].append(
            {"vocab": vocab_hi, "wall_sec": w_inc, "mode": meta["mode"]})
        print(f"batch {b} (vocab {vocab_hi}): full={w_full}s "
              f"incr={w_inc}s (mode={meta['mode']})")

    ident = {}
    for table in ("nodes", "edges"):
        a = read_kg_snapshot(spark, out_inc, table)
        b_ = read_kg_snapshot(spark, out_full, table)
        cols = sorted(set(a.columns) & set(b_.columns))
        extra = a.select(*cols).exceptAll(b_.select(*cols)).count()
        missing = b_.select(*cols).exceptAll(a.select(*cols)).count()
        ident[table] = {"rows": a.count(), "rows_full": b_.count(),
                        "extra": extra, "missing": missing}
        assert extra == 0 and missing == 0, (table, ident)
    result["identity"] = ident
    fw = [r["wall_sec"] for r in result["full"]]
    iw = [r["wall_sec"] for r in result["incremental"]]
    result["summary"] = {
        "full_growth_last_over_second": round(fw[-1] / fw[1], 2),
        "incremental_growth_last_over_second": round(iw[-1] / iw[1], 2),
        "incremental_speedup_at_max_vocab": round(fw[-1] / iw[-1], 2),
    }
    out_path = os.path.join(REPO, "BENCH", "kg_incremental_dict_r8.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result["summary"]))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
