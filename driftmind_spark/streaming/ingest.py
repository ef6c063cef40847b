"""Composed incremental ingest: quality gate -> near-dup gate -> chunks
-> triples -> (periodic) nodes/edges in ONE streaming pipeline — the
streaming mirror of the batch pipeline's full stage order
(kg/pipeline.py: quality, dedup, chunks, triples, nodes, edges).

Why not chain ``stream_near_dups`` directly in front of ``stream_chunks``
in a single query: Structured Streaming does not support another
operator AFTER ``applyInPandasWithState`` (arbitrary stateful ops must
be terminal), and the gate's verdicts are per-band while "kept" is a
per-url ALL-bands decision — a second stateful aggregation.  The
supported composition shape is ``foreachBatch``: per micro-batch we run
the SAME ``_fold_bucket`` state machine the stateful operator runs, with
the representative state persisted as a BATCH-ID-VERSIONED parquet table
instead of the state store.

Exactly-once across retries (the property the state store gives the
single-operator gate) is preserved by versioning: batch N reads the
newest state version < N and (re)writes version N.  foreachBatch
batch_ids are stable across retries, and the fold is deterministic given
(base state, batch rows), so a retried batch rewrites byte-identical
state and output partitions — the same dynamic-partition-overwrite
recipe as ``stream_chunks``.  Old versions are pruned to the last two
(N's retry only ever needs N-1).

Scale shape: state is (band_idx, band_hash, url, sig[num_perm],
rep_order) — bounded by ``max_reps`` per bucket and TTL-evicted by event
time, exactly like the state-store variant; the per-batch work is one
cogroup shuffle on (band_idx, band_hash) plus the chunks/triples kernels
over kept rows only.  The periodic nodes/edges rebuild is the documented
"batch linking stages run periodically over the growing triples table"
pattern (stream.py::stream_triples) executed in-line: O(total distinct
surfaces) per rebuild, so cadence (``kg_every``) trades snapshot
freshness against rebuild cost — at crawl scale run it every N batches,
not every batch.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from .stateful import _fold_bucket, _sig_banded
from .stream import _write_batch_idempotent

# Version of the signature construction persisted in the rep state (the
# gate's signatures come from the numpy kernel via make_minhash_sig_udf,
# NOT from operators/dedup.py's Spark-SQL construction — each carries
# its own version constant).  Signatures from different versions are
# mutually incomparable — agreement between a v1 rep and a v2 arrival
# is noise, so a resume across a version bump must fail loudly instead
# of silently losing recall.
from ..kernels.hashing import MINHASH_KERNEL_VERSION

STATE_SCHEMA = (
    "band_idx int, band_hash bigint, url string, warc_ts timestamp, "
    "sig array<bigint>, rep_order int, bucket_latest timestamp, "
    "sig_version int"
)
GATE_OUT_SCHEMA = (
    "kind string, band_idx int, band_hash bigint, url string, "
    "warc_ts timestamp, dup_of string, agreement int, saturated boolean, "
    "sig array<bigint>, rep_order int, bucket_latest timestamp"
)


def _gate_cogroup_fn(min_slots: int, max_reps: int):
    """Per-bucket cogrouped fold: (batch rows, persisted reps) ->
    flag rows (kind='flag') + the bucket's post-fold representative set
    (kind='rep').  Buckets with no batch rows pass their reps through
    unchanged (state must survive quiet batches)."""

    def fn(key, rows_pdf, reps_pdf):
        import pandas as pd

        band_idx, band_hash = int(key[0]), int(key[1])
        reps_pdf = reps_pdf.sort_values("rep_order")
        reps = [(u, list(s)) for u, s in zip(reps_pdf["url"], reps_pdf["sig"])]
        rep_ts = dict(zip(reps_pdf["url"], reps_pdf["warc_ts"]))
        rows = [(u, t, list(s)) for u, t, s in
                zip(rows_pdf["url"], rows_pdf["warc_ts"], rows_pdf["sig"])]
        # one global event order per batch (the stateful operator's rule)
        rows.sort(key=lambda r: (r[1], r[0]))
        row_ts: dict = {}
        for u, t, _ in rows:
            # first-wins: a rep's timestamp is the event that elected it
            row_ts.setdefault(u, t)
        # bucket activity clock = the stateful gate's `latest`: refreshed
        # by EVERY arriving row (including duplicates), so an actively
        # matching bucket never TTL-expires — eviction keys on this, not
        # on each rep's election time
        latest = max(
            [t for t in reps_pdf["bucket_latest"] if pd.notna(t)]
            + [t for _, t, _ in rows],
            default=None,
        )
        flags, reps_after = _fold_bucket(rows, reps, min_slots, max_reps)
        out = [
            (
                "flag", band_idx, band_hash, u, t, d, a, s, None, None, None,
            )
            for (u, t, d, a, s) in flags
        ] + [
            (
                "rep", band_idx, band_hash, u,
                rep_ts.get(u, row_ts.get(u)), None, None, None, sig, i,
                latest,
            )
            for i, (u, sig) in enumerate(reps_after)
        ]
        return pd.DataFrame(
            out,
            columns=["kind", "band_idx", "band_hash", "url", "warc_ts",
                     "dup_of", "agreement", "saturated", "sig", "rep_order",
                     "bucket_latest"],
        )

    return fn


def _latest_version(spark: SparkSession, base_dir: str,
                    below: int | None = None,
                    prefix: str = "state_v=") -> int | None:
    """Newest committed (``_SUCCESS``-gated) version under ``base_dir``,
    optionally strictly below ``below`` (retry safety: a replayed batch
    must fold from its ORIGINAL base state, never from its own partial
    output).  Listing goes through the Hadoop FS API so the same code
    runs on HDFS/object stores."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(base_dir)
    fs = path.getFileSystem(conf)
    if not fs.exists(path):
        return None
    versions = []
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if name.startswith(prefix):
            v = int(name.split("=", 1)[1])
            if (below is None or v < below) and fs.exists(
                jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")
            ):
                versions.append(v)
    return max(versions) if versions else None


def _prune_versions(spark: SparkSession, base_dir: str, keep_from: int,
                    prefix: str = "state_v=") -> None:
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(base_dir)
    fs = path.getFileSystem(conf)
    if not fs.exists(path):
        return
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if name.startswith(prefix) and int(name.split("=", 1)[1]) < keep_from:
            fs.delete(st.getPath(), True)


# Backward-compatible aliases (round-6 names; scripts may import them).
def _latest_state_version(spark, state_dir, below):
    return _latest_version(spark, state_dir, below=below)


def _prune_state(spark, state_dir, keep_from):
    _prune_versions(spark, state_dir, keep_from)


def read_kg_snapshot(
    spark: SparkSession, out_dir: str, table: str
) -> DataFrame | None:
    """Newest committed nodes/edges snapshot written by
    :func:`stream_ingest` (``table`` in {'nodes', 'edges'}), or None if
    no rebuild has completed yet.  Snapshots are versioned directories
    (``snap_v=<batch_id>``) gated on ``_SUCCESS`` so a reader never
    observes a half-written rebuild."""
    base = posixpath.join(out_dir, table)
    v = _latest_version(spark, base, prefix="snap_v=")
    if v is None:
        return None
    return spark.read.parquet(posixpath.join(base, f"snap_v={v}"))


def stream_ingest(
    pages_stream: DataFrame,
    out_dir: str,
    checkpoint_path: str,
    num_perm: int = 64,
    bands: int = 8,
    shingle_k: int = 3,
    min_agreement: float = 0.9,
    max_reps: int = 8,
    ttl_seconds: int = 7 * 24 * 3600,
    chunk_size: int = 300,
    overlap: int = 20,
    quality: bool = False,
    quality_opts: dict | None = None,
    triples: bool = False,
    kg_every: int | None = None,
    aliases: DataFrame | None = None,
    n_buckets: int = 8,
    embedding_dim: int = 64,
    salt: int = 8,
):
    """pages stream -> ``{out_dir}/dup_flags`` (per-band verdicts, incl.
    saturation signals) + ``{out_dir}/chunks`` (chunk rows for KEPT
    pages only), both partitioned by batch_id and idempotent under
    micro-batch replay.  An EVENT (url, warc_ts) is kept iff NO band
    flags it with a non-null ``dup_of``.  The drop set is per-event, not
    per-url: a url recrawled within one micro-batch has its second,
    near-duplicate occurrence flagged ``dup_of=<itself>`` by the fold —
    dropping by url would lose the keeper occurrence too (its content
    would never be chunked in any batch, since its rep stays in state
    and flags every future arrival).  Duplicate deliveries of the SAME
    event (identical url + warc_ts, an at-least-once source replay)
    collapse to one row before the gate; conflicting texts under one
    event identity are undefined, as everywhere in this package.

    ``quality=True`` prepends the batch pipeline's quality gate
    (operators/quality.py, same thresholds via ``quality_opts``):
    rejected pages land in ``{out_dir}/quality_audit`` (batch_id
    partitioned, idempotent) and never reach the dedup gate or
    chunking — the streaming ingest then mirrors the batch stage order
    quality → dedup → chunks exactly.  The gate is stateless per row,
    so it adds no streaming state.

    ``triples=True`` extends the kept set through OpenIE triple
    extraction (``{out_dir}/triples``, batch_id partitioned, idempotent,
    same bucket column as the batch triples table), and ``kg_every=k``
    additionally rebuilds the nodes/edges tables every k-th batch from
    the FULL accumulated triples table — the batch pipeline's linking /
    CC / canonicalization stages (kg/pipeline.py:387-482) run in-line,
    writing ``_SUCCESS``-gated versioned snapshots
    (``{out_dir}/nodes/snap_v=<batch_id>``, read via
    :func:`read_kg_snapshot`) so readers never see a half-built graph
    and a replayed batch rewrites its own snapshot deterministically.
    The rebuild is global by nature (entity linking spans the whole
    corpus, exactly like the batch nodes stage); its cost grows with
    the distinct-surface dictionary, so pick ``kg_every`` by snapshot
    freshness needs — tests use 1, a crawl would use tens-to-hundreds.
    """
    from ..kg.lineage import bucket_col
    from ..operators.chunking import build_chunks

    if kg_every is not None and not triples:
        raise ValueError("kg_every requires triples=True")
    min_slots = int(-(-min_agreement * num_perm // 1))
    state_dir = posixpath.join(out_dir, "dedup_state")
    flags_dir = posixpath.join(out_dir, "dup_flags")
    chunks_dir = posixpath.join(out_dir, "chunks")
    qaudit_dir = posixpath.join(out_dir, "quality_audit")
    triples_dir = posixpath.join(out_dir, "triples")

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # Event identity is (url, warc_ts): at-least-once sources can
        # deliver one event twice in a batch; folding both would
        # self-flag the second at the SAME identity and the event-level
        # anti-join below would then drop the keeper with it.
        batch_df = batch_df.dropDuplicates(["url", "warc_ts"])
        # TTL horizon from ALL arriving events, BEFORE the quality gate
        # (round-6 advice): the stateful gate's clock is refreshed by
        # every arriving row; computing it post-filter made eviction lag
        # when junk dominated a batch (and skip entirely on an all-junk
        # batch).  Cheap: a column-pruned max over warc_ts only.
        horizon = batch_df.agg(F.max("warc_ts")).first()[0]
        if quality:
            from ..operators.quality import quality_filter

            in_cols = batch_df.columns
            judged = quality_filter(batch_df, **(quality_opts or {}))
            audit = judged.filter(~F.col("keep")).select(
                "url", "warc_ts", "n_chars", "n_tokens", "punct_ratio",
                "stop_ratio", "chars_per_token", "lang_guess",
                "reject_reasons",
            )
            _write_batch_idempotent(audit, qaudit_dir, batch_id)
            batch_df = judged.filter(F.col("keep")).select(*in_cols)
        # Cache the micro-batch across the (banded, kept->chunks/triples)
        # actions.  This is the ONE place the pipeline caches a
        # text-bearing frame: unlike the batch stages (where a corpus
        # cache failed at 1M and cannot exist at 100 TB — see
        # kg/pipeline.py), the cached unit here is a single micro-batch
        # whose size the CALLER bounds via trigger sizing
        # (maxFilesPerTrigger / maxBytesPerTrigger — an availableNow run
        # over a large backlog still arrives in trigger-sized batches).
        # MEMORY_AND_DISK (explicit) degrades to disk instead of
        # evicting under an oversized trigger.
        batch_df = batch_df.persist(StorageLevel.MEMORY_AND_DISK)
        banded = _sig_banded(
            batch_df.select("url", "warc_ts", "text"),
            num_perm, bands, shingle_k,
        )
        base_v = _latest_version(spark, state_dir, below=batch_id)
        if base_v is None:
            reps = spark.createDataFrame([], STATE_SCHEMA)
        else:
            reps = spark.read.parquet(
                posixpath.join(state_dir, f"state_v={base_v}")
            )
            # Mixed-signature-version resume detection (round-6 advice):
            # rep signatures from an older construction never agree with
            # current arrivals, so recall would silently collapse — fail
            # loudly instead.  The state table is bounded (max_reps per
            # active bucket), so the probe is cheap.
            if "sig_version" not in reps.columns:
                raise RuntimeError(
                    f"dedup state {state_dir}/state_v={base_v} predates "
                    "signature versioning; it was built by an older "
                    "signature construction and cannot be resumed — "
                    "restart the ingest with a fresh out_dir/checkpoint"
                )
            stale = reps.filter(
                F.col("sig_version") != MINHASH_KERNEL_VERSION
            ).select("sig_version").first()
            if stale is not None:
                raise RuntimeError(
                    f"dedup state {state_dir}/state_v={base_v} holds "
                    f"signature version {stale[0]}, current code builds "
                    f"version {MINHASH_KERNEL_VERSION}; mixed-version "
                    "near-dup comparison silently loses recall — "
                    "restart the ingest with a fresh out_dir/checkpoint"
                )
        folded = (
            banded.groupby("band_idx", "band_hash")
            .cogroup(reps.groupby("band_idx", "band_hash"))
            .applyInPandas(
                _gate_cogroup_fn(min_slots, max_reps), GATE_OUT_SCHEMA
            )
            .persist()
        )
        flags = folded.filter(F.col("kind") == "flag").select(
            "url", "warc_ts", "band_idx", "dup_of", "agreement", "saturated"
        )
        _write_batch_idempotent(flags, flags_dir, batch_id)

        # event-time TTL on the persisted reps (state stays bounded even
        # without the state store's timeout machinery).  Eviction keys on
        # the BUCKET's activity clock — a bucket still catching dups
        # keeps its reps alive, exactly like the stateful gate's
        # setTimeoutTimestamp(latest + ttl)
        new_state = folded.filter(F.col("kind") == "rep").select(
            "band_idx", "band_hash", "url", "warc_ts", "sig", "rep_order",
            "bucket_latest",
        ).withColumn("sig_version", F.lit(MINHASH_KERNEL_VERSION))
        if horizon is not None:
            new_state = new_state.filter(
                F.col("bucket_latest")
                >= F.lit(horizon) - F.expr(f"INTERVAL {ttl_seconds} SECONDS")
            )
        new_state.write.mode("overwrite").parquet(
            posixpath.join(state_dir, f"state_v={batch_id}")
        )

        # Per-EVENT drop set (round-6 advice fix): each flag row carries
        # the flagged occurrence's warc_ts, and a url's keeper occurrence
        # is never flagged — so anti-joining on (url, warc_ts) drops
        # exactly the non-keeper occurrences, for both self-flags
        # (in-batch recrawl) and cross-url dups.
        dup_events = (
            flags.filter(F.col("dup_of").isNotNull())
            .select("url", "warc_ts").distinct()
        )
        kept = batch_df.join(dup_events, ["url", "warc_ts"], "left_anti")
        chunks = build_chunks(kept, chunk_size, overlap, with_embeddings=False)
        _write_batch_idempotent(chunks, chunks_dir, batch_id)

        if triples:
            from ..kg.triples import extract_triples_df

            tri = extract_triples_df(kept).withColumn(
                "bucket", bucket_col("url", n_buckets)
            )
            _write_batch_idempotent(tri, triples_dir, batch_id)

        folded.unpersist()
        batch_df.unpersist()
        _prune_state(spark, state_dir, keep_from=batch_id - 1)

        if kg_every is not None and (batch_id + 1) % kg_every == 0:
            _rebuild_kg_snapshot(spark, out_dir, triples_dir, batch_id)

    def _rebuild_kg_snapshot(spark: SparkSession, out: str,
                             tri_dir: str, batch_id: int) -> None:
        """The batch pipeline's nodes + edges stages (kg/pipeline.py:
        387-482; parity is pinned by the streamed-==-batch test, not by
        shared code — the batch stages interleave lineage commits that
        have no streaming analog) over the FULL accumulated triples
        table, written as _SUCCESS-gated versioned snapshots.  A
        replayed batch rewrites the same deterministic snapshot into the
        same version directory."""
        from ..kg.blocking import candidate_pairs, mentions_from_triples
        from ..kg.cc import canonical_mapping, connected_components
        from ..kg.linking import all_link_edges

        triples_all = spark.read.parquet(tri_dir)
        mentions = mentions_from_triples(triples_all).cache()
        pairs = candidate_pairs(mentions)
        link_edges = all_link_edges(
            mentions, aliases, pairs, embedding_dim=embedding_dim
        ).cache()
        components = connected_components(
            mentions.select("mention_id"), link_edges
        )
        nodes = canonical_mapping(mentions, components).withColumn(
            "bucket",
            F.pmod(F.xxhash64("canonical_id"), F.lit(n_buckets)).cast("int"),
        )
        nodes_v = posixpath.join(out, "nodes", f"snap_v={batch_id}")
        nodes.write.mode("overwrite").parquet(nodes_v)
        link_edges.unpersist()
        mentions.unpersist()

        # edges from the MATERIALIZED nodes snapshot (the batch stage's
        # read-back shape: re-deriving nodes per join side would re-run
        # the whole linking lineage twice)
        nodes_t = spark.read.parquet(nodes_v)
        canon = nodes_t.select("surface", "canonical_id", "canonical_surface")
        b_canon = F.broadcast(canon)
        edges = (
            triples_all
            .join(
                b_canon.withColumnRenamed("canonical_id", "subj_id")
                .withColumnRenamed("canonical_surface", "subj_canonical"),
                triples_all.subj == F.col("surface"),
            )
            .drop("surface")
            .join(
                b_canon.withColumnRenamed("canonical_id", "obj_id")
                .withColumnRenamed("canonical_surface", "obj_canonical"),
                triples_all.obj == F.col("surface"),
            )
            .drop("surface")
            .select(
                "subj_id", "subj_canonical", "pred", "obj_id",
                "obj_canonical", "url", "warc_ts", "conf",
            )
            # same SALTED key as the batch edges stage (hot head subject
            # spreads over `salt` pseudo-random buckets)
            .withColumn(
                "bucket",
                F.pmod(
                    F.xxhash64(
                        "subj_id", F.pmod(F.xxhash64("obj_id"), F.lit(salt))
                    ),
                    F.lit(n_buckets),
                ).cast("int"),
            )
        )
        edges.write.mode("overwrite").parquet(
            posixpath.join(out, "edges", f"snap_v={batch_id}")
        )
        for table in ("nodes", "edges"):
            _prune_versions(
                spark, posixpath.join(out, table),
                keep_from=batch_id - 1, prefix="snap_v=",
            )

    return (
        pages_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
