"""Streaming-ingest throughput at benchmark scale (round-7 item 4).

Runs the composed incremental ingest (streaming/ingest.py::stream_ingest)
over a 100k-page corpus with planted junk (10%) and near-dup clones
(10%) — the full-stack synth mix — under ``availableNow`` with realistic
trigger sizing (``maxFilesPerTrigger`` over ~2k-page shard files, so a
micro-batch is ~16k pages: the shape a crawl consumer with
maxBytesPerTrigger tuning would see).

Two legs:
  A. quality -> dedup gate -> chunks      (the composed ingest gate)
  B. + triples per batch, nodes/edges rebuilt every 3rd batch
     (the full incremental KG path, round-7)

Published numbers (BENCH/stream_ingest_r7.json + BENCH/BASELINE.md):
wall, docs/s, per-micro-batch input rows + duration from the query's
progress events, and the dedup state table's per-version size (rows +
bytes, sampled live while the stream runs — versions are pruned to the
last two, so sizes are collected as they appear).  State stays bounded
by construction (max_reps per active band bucket + event-time TTL); the
numbers here make that visible.

Usage: PYTHONPATH=. python scripts/stream_ingest_bench.py \
           [n_pages] [legs] [out_suffix]
``legs`` is a subset of "ABC" (default all three); any partial-leg run
MUST pass a non-empty ``out_suffix`` (e.g. ``A _n8``) — the suffix is
appended to the JSON name so scaling/variant runs never clobber the
headline artifact BENCH/stream_ingest_r7.json.
Never run concurrently with pytest or bench.py (host-capacity drift).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time
from multiprocessing import Pool

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DEFAULT = 100_000
CORPUS_TMPL = "/tmp/dm7_stream_corpus_{n}"
# ~2k pages per shard file -> 8 files/trigger = ~16.6k-page batches.
# Override to demonstrate the trigger-size/throughput trade (per-batch
# fixed orchestration amortizes with bigger triggers).
FILES_PER_TRIGGER = int(os.environ.get("DM_FILES_PER_TRIGGER", "8"))
# Progress-event retention for the session (spark.sql.streaming.
# numRecentProgressUpdates); per-batch rows in the artifact come from
# q.recentProgress, which keeps only this many newest entries.
PROGRESS_RETENTION = 10_000


def _gen_shard(args):
    start, cnt, out_path = args
    import pyarrow.parquet as pq

    from driftmind_spark.synth import generate_pages

    pages, _ = generate_pages(cnt, start=start, min_sent=20, max_sent=60,
                              dup_rate=0.1, junk_rate=0.1)
    pq.write_table(pages, out_path)
    return cnt


def build_corpus(n: int, out_dir: str, workers: int = 24) -> str:
    pages_dir = os.path.join(out_dir, "pages.parquet")
    if os.path.exists(os.path.join(out_dir, "_DONE")):
        return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(pages_dir)
    shard = max(2_000, n // 48)
    jobs = [
        (s, min(shard, n - s),
         os.path.join(pages_dir, f"part-{s:09d}.parquet"))
        for s in range(0, n, shard)
    ]
    with Pool(workers) as pool:
        done = sum(pool.map(_gen_shard, jobs))
    assert done == n
    # strictly increasing mtimes -> deterministic file-stream batch order
    for i, (_, _, p) in enumerate(jobs):
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
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


def _dir_size(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _run_leg(spark, corpus: str, out: str, ckpt: str, n: int,
             **ingest_opts) -> dict:
    from driftmind_spark.streaming.ingest import stream_ingest
    from driftmind_spark.streaming.stream import read_pages_stream

    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    state_glob = os.path.join(out, "dedup_state", "state_v=*")
    state_sizes: dict[int, int] = {}
    t0 = time.monotonic()
    q = stream_ingest(
        read_pages_stream(spark, os.path.join(corpus, "pages.parquet"),
                          max_files_per_trigger=FILES_PER_TRIGGER),
        out, ckpt, quality=True, **ingest_opts,
    )
    # live-sample state versions (pruned to the last two after each
    # batch, so post-hoc listing would only see the final ones)
    while q.isActive:
        for d in glob.glob(state_glob):
            if os.path.exists(os.path.join(d, "_SUCCESS")):
                v = int(d.rsplit("=", 1)[1])
                state_sizes[v] = _dir_size(d)
        time.sleep(0.25)
    q.awaitTermination(10)
    wall = time.monotonic() - t0

    import pyarrow.parquet as pq_

    progress = [
        {
            "batch_id": p["batchId"],
            "input_rows": p["numInputRows"],
            "duration_ms": p["durationMs"].get("triggerExecution"),
        }
        for p in (json.loads(j) if isinstance(j, str) else j
                  for j in q.recentProgress)
        if p["numInputRows"] > 0
    ]
    final_state = max(glob.glob(state_glob),
                      key=lambda d: int(d.rsplit("=", 1)[1]))
    leg = {
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n / wall, 1),
        "n_batches": len(progress),
        # True would mean recentProgress hit the session's retention cap
        # and n_batches/batches undercount (the newest entries survive,
        # so last_batch below stays correct) — cap is set to 10k in
        # main(), far above any run here, and the flag makes a silent
        # undercount impossible anyway
        "progress_truncated": len(q.recentProgress) >= PROGRESS_RETENTION,
        "batches": progress,
        "state_rows_final": pq_.read_table(final_state).num_rows,
        "state_bytes_by_version": {
            str(v): state_sizes[v] for v in sorted(state_sizes)
        },
        "quality_rejected": spark.read.parquet(
            os.path.join(out, "quality_audit")).count(),
        "dup_events": spark.read.parquet(os.path.join(out, "dup_flags"))
        .filter("dup_of is not null").select("url", "warc_ts")
        .distinct().count(),
        "chunks_rows": spark.read.parquet(
            os.path.join(out, "chunks")).count(),
    }
    if ingest_opts.get("triples"):
        leg["triples_rows"] = spark.read.parquet(
            os.path.join(out, "triples")).count()
        from driftmind_spark.streaming.ingest import (
            latest_kg_snapshot_version,
            read_kg_snapshot,
            rebuild_kg_snapshot,
            rebuild_kg_snapshot_incremental,
        )

        # Finalize the snapshot tail (round-7 self-review): with
        # kg_every=3, an availableNow run whose batch count is not a
        # multiple of 3 leaves the last snapshot missing the trailing
        # batches' triples — the published nodes/edges counts would
        # silently understate the corpus vs triples_rows.  One explicit
        # final rebuild folds the remainder in; its wall time is
        # reported separately (it is post-stream work, not part of the
        # streaming throughput number).
        last_batch = max(p["batch_id"] for p in progress)
        snap_v = latest_kg_snapshot_version(spark, out)
        leg["final_rebuild"] = None
        if snap_v is None or snap_v < last_batch:
            print(f"  finalizing KG snapshot: v={snap_v} < last batch "
                  f"{last_batch}, rebuilding tail")
            t1 = time.monotonic()
            # forward the SAME KG knobs the stream's in-line rebuilds
            # used — a finalize with different n_buckets/salt would
            # publish a snapshot incomparable with the stream's own;
            # likewise the finalize must use the SAME rebuild variant
            # (a full finalize over an incremental out_dir would still
            # be exact but would not measure the incremental path)
            rebuild = (rebuild_kg_snapshot_incremental
                       if ingest_opts.get("kg_incremental")
                       else rebuild_kg_snapshot)
            ok = rebuild(
                spark, out, last_batch,
                aliases=ingest_opts.get("aliases"),
                n_buckets=ingest_opts.get("n_buckets", 8),
                embedding_dim=ingest_opts.get("embedding_dim", 64),
                salt=ingest_opts.get("salt", 8),
            )
            assert ok, ("finalize rebuild was a no-op (unreadable/empty "
                        "triples) — published nodes/edges would be stale")
            leg["final_rebuild"] = {
                "from_version": snap_v, "to_version": last_batch,
                "wall_sec": round(time.monotonic() - t1, 2),
            }
        nodes = read_kg_snapshot(spark, out, "nodes")
        edges = read_kg_snapshot(spark, out, "edges")
        leg["nodes_rows"] = nodes.count() if nodes is not None else None
        leg["edges_rows"] = edges.count() if edges is not None else None
    return leg


def main() -> None:
    # Usage: stream_ingest_bench.py [n_pages] [legs] [out_suffix]
    #   legs: subset of "ABC" (default all) — A gate->chunks, B full KG
    #   path, C wordgram comparison.  out_suffix: appended to the JSON
    #   name, so a scaling run (SPARK_GRAFT_CPUS=8 ... A _n8) does not
    #   clobber the headline artifact.
    n = int(sys.argv[1]) if len(sys.argv) > 1 else N_DEFAULT
    legs = sys.argv[2].upper() if len(sys.argv) > 2 else "ABC"
    suffix = sys.argv[3] if len(sys.argv) > 3 else ""
    if not legs or not set(legs) <= set("ABCD"):
        raise SystemExit(f"legs must be a non-empty subset of 'ABCD', "
                         f"got {sys.argv[2]!r}")
    if set(legs) != set("ABC") and not suffix:
        raise SystemExit(
            "partial-leg runs must pass an out_suffix — writing them to "
            "the headline BENCH/stream_ingest_r7.json would silently "
            "drop the other legs' published results"
        )
    corpus = build_corpus(n, CORPUS_TMPL.format(n=n))
    print(f"corpus ready: {corpus}")

    from driftmind_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # recentProgress retains only the newest numRecentProgressUpdates
    # entries (default 100): with small triggers / large n the per-batch
    # rows in the artifact would silently undercount (round-7 advice).
    # 10k batches is far above any configuration this script runs.
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus,
                      extra_conf={
                          "spark.sql.streaming.numRecentProgressUpdates":
                              str(PROGRESS_RETENTION),
                      })
    aliases = spark.read.parquet(os.path.join(corpus, "aliases.parquet"))

    result = {"n_pages": n, "cpus": cpus,
              "files_per_trigger": FILES_PER_TRIGGER}
    if "A" in legs:
        result["gate_to_chunks"] = _run_leg(
            spark, corpus, f"/tmp/dm7_stream_out_a_{n}",
            f"/tmp/dm7_stream_ckpt_a_{n}", n)
        print("leg A (quality->dedup->chunks, kernel sig):",
              json.dumps({k: v for k, v in result["gate_to_chunks"].items()
                          if k != "batches"}))
    if "B" in legs:
        result["full_kg_path"] = _run_leg(
            spark, corpus, f"/tmp/dm7_stream_out_b_{n}",
            f"/tmp/dm7_stream_ckpt_b_{n}", n,
            triples=True, kg_every=3, aliases=aliases)
        print("leg B (+triples, kg_every=3, kernel sig):",
              json.dumps({k: v for k, v in result["full_kg_path"].items()
                          if k != "batches"}))
    if "C" in legs:
        # comparison leg: the JVM-side wordgram construction
        # (foreachBatch is free to aggregate, so it is AVAILABLE here —
        # but measured slower and lower-recall at this gate's default
        # band/agreement params; this leg keeps that negative result
        # pinned with numbers, see BENCH/BASELINE.md)
        result["gate_to_chunks_wordgram_sig"] = _run_leg(
            spark, corpus, f"/tmp/dm7_stream_out_w_{n}",
            f"/tmp/dm7_stream_ckpt_w_{n}", n, signatures="wordgram")
        print("leg C (quality->dedup->chunks, wordgram sig):",
              json.dumps({k: v for k, v in
                          result["gate_to_chunks_wordgram_sig"].items()
                          if k != "batches"}))

    if "D" in legs:
        # round-8 leg: the full KG path with the INCREMENTAL rebuild —
        # same stages as leg B, rebuilds via delta-linking + contracted
        # CC with edges as a read-time view (kg/incremental.py)
        result["full_kg_path_incremental"] = _run_leg(
            spark, corpus, f"/tmp/dm8_stream_out_d_{n}",
            f"/tmp/dm8_stream_ckpt_d_{n}", n,
            triples=True, kg_every=3, kg_incremental=True, aliases=aliases)
        print("leg D (+triples, kg_every=3, INCREMENTAL rebuilds):",
              json.dumps({k: v for k, v in
                          result["full_kg_path_incremental"].items()
                          if k != "batches"}))
    out_path = os.path.join(REPO, "BENCH", f"stream_ingest_r7{suffix}.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
