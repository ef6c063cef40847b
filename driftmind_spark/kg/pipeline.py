"""End-to-end KG construction pipeline (north_rule):

  pages ──> extracted (boilerplate-strip once)    [stage: extract, bucketed]
        └─> extracted_dedup (optional near-dup    [stage: dedup,   global]
            MinHash-LSH corpus dedup + audit)
        └─> chunks (extract/chunk/embed)          [stage: chunks,  bucketed]
        └─> triples (OpenIE)                      [stage: triples, bucketed]
              └─> mentions ─> LSH pairs ─> links ─> components
                    └─> nodes (canonical map)     [stage: nodes,   global]
              └─> edges = triples ⨝ canonical map [stage: edges,   bucketed]

Each bucketed stage writes ``partitionBy("bucket")`` with dynamic
partition overwrite and commits per-bucket lineage (kg/lineage.py);
re-running the same ``run_id`` skips committed buckets — kill the job
between any two stages and the re-run completes with identical tables
(tests/test_resumability.py).

Skew (north_rule): Zipf head entities concentrate edges on few
``subj_canonical_id``s.  The edges table is therefore written partitioned
by a SALTED key — ``pmod(hash(subj_canonical_id) + hash(obj) % SALT, P)``
spreads one hot subject over SALT partitions; readers aggregating by
subject do a two-phase agg (partial per salted partition, final merge),
which ``dedup_triples``-style queries get for free from Catalyst partial
aggregation.  AQE skew-join splitting is on globally (session.py).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.chunking import build_chunks, extract_text_table
from . import lineage as ln
from .graph import build_edges, build_nodes
from .triples import extract_triples_df


class StageKill(RuntimeError):
    """Raised by the fail-injection hook (resumability tests)."""


def _write_bucketed(df: DataFrame, path: str, pre_clustered: bool = False) -> None:
    """Bucket-partitioned stage write through the shared TableIO layer
    (sources/tables.py): dynamic partition overwrite so resumed runs
    replace only their buckets, empty results keep a readable schema,
    and the same call targets Iceberg when a catalog is configured.

    ``pre_clustered``: stages that map 1:1 over the bucket-partitioned
    extracted table (chunks, triples) keep their input's physical bucket
    grouping, so the write skips the defensive repartition shuffle.
    Measured A/B at 100k pages, local[32]: chunks stage 37.2s -> 12.9s
    (the shuffle moved every chunk's content + embedding a second time),
    e2e 103-109s -> 65.3s, with identical row counts and exactly one
    output file per (task, bucket)."""
    from ..sources.tables import TableIO

    TableIO(df.sparkSession).write(
        df, path, partition_by=("bucket",), mode="overwrite_partitions",
        pre_clustered=pre_clustered,
    )


def _not_done_pages(spark, pages, out_dir, run_id, stage, n_buckets):
    done = ln.completed_buckets(spark, out_dir, run_id, stage)
    with_bucket = pages.withColumn("bucket", ln.bucket_col("url", n_buckets))
    return with_bucket.join(F.broadcast(done), "bucket", "left_anti")


def _todo_buckets(todo: DataFrame) -> list[int]:
    """The bucket ids this run will attempt — bounded by n_buckets (a
    config constant, not data), so collecting it is driver-safe.  Used
    for three things: the did-anything-survive check, static partition
    pruning of the read-back (only touched partitions are re-read for
    lineage counting), and the attempted-bucket lineage commit."""
    return sorted(r[0] for r in todo.select("bucket").distinct().collect())


def run(
    spark: SparkSession,
    corpus_dir: str,
    out_dir: str,
    run_id: str = "run-1",
    n_buckets: int = 32,
    embedding_dim: int = 64,
    chunk_size: int = 300,
    overlap: int = 20,
    use_text_column: bool = False,
    fail_after_stage: str | None = None,
    salt: int = 8,
    quality: bool = False,
    quality_opts: dict | None = None,
    dedup: bool = False,
    dedup_opts: dict | None = None,
    chunk_dedup: bool = False,
    chunk_dedup_opts: dict | None = None,
) -> dict:
    """Execute (or resume) the full pipeline; returns stage metrics.

    ``quality=True`` inserts a quality/language gate between extract and
    dedup — the step a crawl pipeline runs BEFORE spending dedup/embed
    compute (operators/quality.py): pure column-expression thresholds
    over the oracle-checked ``quality_scores``/``lang_id`` features.
    Kept docs land in ``extracted_quality`` (bucketed; the filter is
    row-narrow so the write keeps the aligned shuffle-free path);
    rejected docs with their features and ``reject_reasons`` become the
    ``quality_audit`` table.  ``quality_opts`` passes through to
    ``quality_filter`` (min_chars/min_tokens/langs/...).

    ``chunk_dedup=True`` adds passage-level dedup AFTER the chunks
    stage (operators/passages.py — the Lee-et-al intra-document layer):
    chunk rows whose normalized content repeats corpus-wide keep only
    their first occurrence.  Kept rows land in ``chunks_dedup``;
    dropped rows (narrow: ids + fingerprint + keeper) become
    ``chunk_dedup_audit``.  Chunk boundaries stay byte-exact — dedup
    only FILTERS rows, so the parity contract is untouched.

    ``dedup=True`` inserts a corpus-level near-duplicate dedup stage
    between extract and chunk — the step a training-data pipeline runs
    before it embeds/extracts anything: ``operators.dedup.corpus_dedup``
    (exact md5 grouping first, MinHash-LSH with signature-agreement
    VERIFICATION on unique texts only, transitive closure, deterministic
    min-url keeper election), then an anti-join that drops the
    non-keepers.  Keepers land in ``extracted_dedup`` (bucketed like
    ``extracted``, so chunks/triples keep their aligned 1:1 writes); the
    full cluster assignment for every clustered doc is kept as the
    ``dedup_audit`` table (the non-keeper frame IS the audit trail).
    ``dedup_opts`` passes through to ``corpus_dedup``
    (num_perm/bands/shingle_k/max_bucket_size/min_agreement)."""
    pages = spark.read.parquet(os.path.join(corpus_dir, "pages.parquet"))
    aliases_path = os.path.join(corpus_dir, "aliases.parquet")
    aliases = None
    if os.path.exists(aliases_path):
        aliases = spark.read.parquet(aliases_path)

    metrics: dict = {"run_id": run_id}
    _t0 = time.perf_counter()

    def _mark(stage: str) -> None:
        nonlocal _t0
        metrics[f"sec_{stage}"] = round(time.perf_counter() - _t0, 1)
        _t0 = time.perf_counter()

    def _desc(stage: str) -> None:
        # Tag every job of this pipeline stage in the Spark UI / REST API
        # (description survives into /api/v1/.../stages), so task-level
        # skew metrics attribute to pipeline stages by name.
        spark.sparkContext.setJobDescription(f"dm:{run_id}:{stage}")

    # ---- stage 0: extract once (bucketed, resumable) ------------------------
    # The extracted-text table is the Spark analog of the reference's
    # extracted-text twin blob (BlobStorageService.cs:174-234); chunking
    # and triple extraction both consume it, so the html column — the
    # bulk of the bytes at 100 TB — is read and boilerplate-stripped once.
    extracted_path = os.path.join(out_dir, "extracted")
    _desc("extract")
    todo = _not_done_pages(spark, pages, out_dir, run_id, "extract", n_buckets)
    buckets = _todo_buckets(todo)
    if buckets:
        extracted = (
            (todo.select("url", "warc_ts", "lang", F.col("text"), "bucket")
             if use_text_column else
             extract_text_table(todo).withColumn(
                 "bucket", ln.bucket_col("url", n_buckets)))
        )
        _write_bucketed(extracted, extracted_path)
        written = spark.read.parquet(extracted_path).filter(
            F.col("bucket").isin(buckets)
        )
        ln.commit_stage(spark, out_dir, run_id, "extract", written,
                        attempted_buckets=buckets)
    extracted = spark.read.parquet(extracted_path)
    metrics["extracted"] = ln.committed_row_count(spark, out_dir, run_id, "extract")
    _mark("extract")
    if fail_after_stage == "extract":
        raise StageKill("injected failure after stage: extract")

    # ---- stage 0.3 (optional): quality/language gate (global) ---------------
    # Before dedup: the gate is a pure column-expression filter (no UDF, no
    # shuffle on the verdict), so running it first prunes the dedup stage's
    # signature work too.  The kept write is pre_clustered — a row-narrow
    # filter of the bucket-partitioned extracted table keeps its physical
    # grouping (a parquet split never crosses partition dirs), so no shuffle.
    if quality:
        _desc("quality")
        quality_path = os.path.join(out_dir, "extracted_quality")
        qaudit_path = os.path.join(out_dir, "quality_audit")
        if not ln.stage_marker_done(spark, out_dir, run_id, "quality"):
            from ..operators.quality import quality_filter

            # The audit and kept writes are two actions over the same
            # filter, i.e. two scans of the extracted parquet.  That is
            # DELIBERATE: caching `judged` would pin the corpus text —
            # the bulk of the bytes — in executor memory, and at 1M
            # pages the columnar cache build already thrashes the block
            # manager (measured: the persist variant failed mid-cache
            # at 1M while the two-scan variant completes); at 100 TB a
            # text-bearing cache is impossible by construction, while a
            # second columnar scan + whole-stage-codegen features is
            # cheap and embarrassingly parallel.
            judged = quality_filter(extracted, **(quality_opts or {}))
            audit = judged.filter(~F.col("keep")).select(
                "url", "bucket", "n_chars", "n_tokens", "punct_ratio",
                "stop_ratio", "chars_per_token", "lang_guess",
                "reject_reasons",
            )
            _write_bucketed(audit, qaudit_path, pre_clustered=True)
            kept = judged.filter(F.col("keep")).select(*extracted.columns)
            _write_bucketed(kept, quality_path, pre_clustered=True)
            n_kept, n_dropped = (
                spark.read.parquet(quality_path).count(),
                spark.read.parquet(qaudit_path).count(),
            )
            # dropped first: the 'quality' row is the stage-done marker and
            # must be the LAST commit (same ordering rule as nodes/dedup)
            ln.commit_global_stage(
                spark, out_dir, run_id, "quality_dropped", n_dropped
            )
            ln.commit_global_stage(spark, out_dir, run_id, "quality", n_kept)
        extracted = spark.read.parquet(quality_path)
        metrics["quality_kept"] = ln.committed_row_count(
            spark, out_dir, run_id, "quality"
        )
        metrics["quality_dropped"] = ln.committed_row_count(
            spark, out_dir, run_id, "quality_dropped"
        )
        _mark("quality")
        if fail_after_stage == "quality":
            raise StageKill("injected failure after stage: quality")

    # ---- stage 0.5 (optional): corpus-level near-dup dedup (global) ---------
    # Global like the nodes stage: LSH candidate pairs span url buckets, so
    # bucket-level resume can't apply; the whole stage is deterministic
    # (seeded minhash params, CC, min-id keeper), so a killed run re-derives
    # byte-identical tables under dynamic partition overwrite.  The keeper
    # filter is a left_anti equi-join against the (smaller) non-keeper set —
    # broadcast at dictionary scale, SMJ beyond the threshold; the rewrite
    # re-clusters by bucket so every downstream stage keeps the aligned
    # shuffle-free write path.
    if dedup:
        from ..operators.dedup import MINHASH_SIG_VERSION

        _desc("dedup")
        dedup_path = os.path.join(out_dir, "extracted_dedup")
        audit_path = os.path.join(out_dir, "dedup_audit")
        if ln.stage_marker_done(spark, out_dir, run_id, "dedup"):
            # Mixed-signature-version resume guard (round-6 advice): the
            # committed tables' near-dup lineage came from the signature
            # construction recorded at commit time; comparing or
            # extending them under a bumped construction silently loses
            # recall, so fail loudly instead.  (Version history:
            # operators/dedup.py::MINHASH_SIG_VERSION.)
            committed_v = ln.committed_row_count(
                spark, out_dir, run_id, "dedup_sig_version"
            )
            if committed_v != MINHASH_SIG_VERSION:
                raise RuntimeError(
                    f"dedup tables under {out_dir} were committed with "
                    f"signature version {committed_v or 'pre-versioning'}, "
                    f"current code builds version {MINHASH_SIG_VERSION}; "
                    "re-run dedup from scratch (fresh out_dir or run_id) "
                    "instead of resuming across a signature break"
                )
        else:
            from ..operators.dedup import corpus_dedup

            docs = extracted.select(F.col("url").alias("doc_id"), "text")
            resolution = corpus_dedup(
                docs, **(dedup_opts or {})
            ).cache()  # audit write probes isEmpty then writes: one lineage
            clusters = resolution.filter(F.col("cluster_size") > 1).withColumn(
                "bucket", ln.bucket_col("doc_id", n_buckets)
            )
            _write_bucketed(clusters, audit_path)
            resolution.unpersist()
            # non-keepers come from the durable audit table, not the live
            # lineage — the pairs/CC work is never recomputed past here
            non_keepers = (
                spark.read.parquet(audit_path)
                .filter(~F.col("is_keeper"))
                .select(F.col("doc_id").alias("url"))
            )
            deduped = extracted.join(non_keepers, "url", "left_anti")
            _write_bucketed(deduped, dedup_path)
            n_kept, n_dropped = (
                spark.read.parquet(dedup_path).count(),
                spark.read.parquet(audit_path).filter(~F.col("is_keeper")).count(),
            )
            # dropped + sig-version first: the 'dedup' row is the
            # stage-done marker and must be the LAST commit (same
            # ordering rule as nodes)
            ln.commit_global_stage(
                spark, out_dir, run_id, "dedup_sig_version",
                MINHASH_SIG_VERSION,
            )
            ln.commit_global_stage(spark, out_dir, run_id, "dedup_dropped", n_dropped)
            ln.commit_global_stage(spark, out_dir, run_id, "dedup", n_kept)
        extracted = spark.read.parquet(dedup_path)
        metrics["dedup_kept"] = ln.committed_row_count(spark, out_dir, run_id, "dedup")
        metrics["dedup_dropped"] = ln.committed_row_count(
            spark, out_dir, run_id, "dedup_dropped"
        )
        _mark("dedup")
        if fail_after_stage == "dedup":
            raise StageKill("injected failure after stage: dedup")

    # ---- stage 1: chunks (bucketed, resumable) -----------------------------
    _desc("chunks")
    todo = _not_done_pages(spark, extracted, out_dir, run_id, "chunks", n_buckets)
    chunks_path = os.path.join(out_dir, "chunks")
    buckets = _todo_buckets(todo)
    if buckets:
        chunks = build_chunks(
            todo, chunk_size, overlap, embedding_dim,
            use_text_column=True,
        ).drop(
            # norm_text is an intra-kernel column (embed-dedupe join key);
            # nothing reads it from the durable table and it nearly
            # duplicates `content` — dropping it cuts the written chunks
            # table ~30% (measured 1.4 GB -> 1.0 GB at 1M pages, wall
            # time unchanged; at 100 TB that is real storage).
            "norm_text"
        ).withColumn("bucket", ln.bucket_col("url", n_buckets))
        # input is the bucket-partitioned extracted table mapped 1:1 ->
        # rows arrive clustered; skip the write-side shuffle
        _write_bucketed(chunks, chunks_path, pre_clustered=True)
        written = spark.read.parquet(chunks_path).filter(
            F.col("bucket").isin(buckets)
        )
        ln.commit_stage(spark, out_dir, run_id, "chunks", written,
                        attempted_buckets=buckets)
    metrics["chunks"] = ln.committed_row_count(spark, out_dir, run_id, "chunks")
    _mark("chunks")
    if fail_after_stage == "chunks":
        raise StageKill("injected failure after stage: chunks")

    # ---- stage 1.5 (optional): passage-level chunk dedup (global) -----------
    # Global like the dedup stage: fingerprints repeat ACROSS url buckets, so
    # bucket-level resume can't apply; the keeper election is deterministic
    # (md5 fingerprint, min-(url,chunk_index) keeper), so a killed run
    # re-derives identical tables under dynamic partition overwrite.
    if chunk_dedup:
        _desc("chunk_dedup")
        cdedup_path = os.path.join(out_dir, "chunks_dedup")
        cdaudit_path = os.path.join(out_dir, "chunk_dedup_audit")
        if not ln.stage_marker_done(spark, out_dir, run_id, "chunk_dedup"):
            from ..operators.passages import chunk_dedup as _chunk_dedup

            chunks_all = spark.read.parquet(chunks_path)
            # two actions over the fingerprint join = two scans of the
            # chunks parquet — deliberate, same rationale as the quality
            # stage: `res` carries chunk content + embeddings, and
            # caching that at corpus scale costs more than the re-scan
            res = _chunk_dedup(chunks_all, **(chunk_dedup_opts or {}))
            # audit is NARROW (ids + fingerprint + keeper): the dropped
            # text is recoverable via the keeper row, so at 100 TB the
            # audit table costs ids, not content
            audit = res.filter(~F.col("is_kept")).select(
                "url", "chunk_index", "bucket", "fingerprint",
                "n_occurrences", "keeper_doc", "keeper_idx",
            )
            _write_bucketed(audit, cdaudit_path)
            # the keeper join shuffled rows by fingerprint, so the kept
            # write re-clusters by bucket (no pre_clustered shortcut here)
            kept = res.filter(F.col("is_kept")).select(*chunks_all.columns)
            _write_bucketed(kept, cdedup_path)
            n_kept, n_dropped = (
                spark.read.parquet(cdedup_path).count(),
                spark.read.parquet(cdaudit_path).count(),
            )
            ln.commit_global_stage(
                spark, out_dir, run_id, "chunk_dedup_dropped", n_dropped
            )
            ln.commit_global_stage(
                spark, out_dir, run_id, "chunk_dedup", n_kept
            )
        metrics["chunk_dedup_kept"] = ln.committed_row_count(
            spark, out_dir, run_id, "chunk_dedup"
        )
        metrics["chunk_dedup_dropped"] = ln.committed_row_count(
            spark, out_dir, run_id, "chunk_dedup_dropped"
        )
        _mark("chunk_dedup")
        if fail_after_stage == "chunk_dedup":
            raise StageKill("injected failure after stage: chunk_dedup")

    # ---- stage 2: triples (bucketed, resumable) -----------------------------
    _desc("triples")
    todo = _not_done_pages(spark, extracted, out_dir, run_id, "triples", n_buckets)
    triples_path = os.path.join(out_dir, "triples")
    buckets = _todo_buckets(todo)
    if buckets:
        triples = extract_triples_df(todo, use_text_column=True).withColumn(
            "bucket", ln.bucket_col("url", n_buckets)
        )
        _write_bucketed(triples, triples_path, pre_clustered=True)
        written = spark.read.parquet(triples_path).filter(
            F.col("bucket").isin(buckets)
        )
        ln.commit_stage(spark, out_dir, run_id, "triples", written,
                        attempted_buckets=buckets)
    triples = spark.read.parquet(triples_path)
    metrics["triples"] = ln.committed_row_count(spark, out_dir, run_id, "triples")
    _mark("triples")
    if fail_after_stage == "triples":
        raise StageKill("injected failure after stage: triples")

    # ---- stage 3: linking + canonicalization (global) -----------------------
    _desc("nodes")
    nodes_path = os.path.join(out_dir, "nodes")
    if not ln.stage_marker_done(spark, out_dir, run_id, "nodes"):
        # dataflow lives in kg/graph.py — shared with the streaming
        # rebuild (streaming/ingest.py), so the two paths cannot drift
        nodes, caches = build_nodes(
            triples, aliases, embedding_dim=embedding_dim,
            n_buckets=n_buckets,
        )
        _write_bucketed(nodes, nodes_path)
        # one read-back pass computes BOTH lineage metrics (row count and
        # distinct components); committing the component count as its own
        # global stage row means resumed runs report it from lineage
        # metadata instead of re-scanning the nodes table
        n_nodes, n_components = (
            spark.read.parquet(nodes_path)
            .agg(F.count("*"), F.count_distinct("canonical_id"))
            .collect()[0]
        )
        # components first: the 'nodes' row is the stage-done marker, so
        # it must be the LAST commit (a crash between the two appends must
        # not leave a done-marked stage with missing metadata)
        ln.commit_global_stage(
            spark, out_dir, run_id, "nodes_components", n_components
        )
        ln.commit_global_stage(spark, out_dir, run_id, "nodes", n_nodes)
        for c in caches:
            c.unpersist()
    nodes = spark.read.parquet(nodes_path)
    metrics["nodes"] = ln.committed_row_count(spark, out_dir, run_id, "nodes")
    metrics["components"] = ln.committed_row_count(
        spark, out_dir, run_id, "nodes_components"
    )
    _mark("nodes")
    if fail_after_stage == "nodes":
        raise StageKill("injected failure after stage: nodes")

    # ---- stage 4: edges = triples resolved to canonical ids (bucketed) ------
    _desc("edges")
    edges_path = os.path.join(out_dir, "edges")
    if not ln.stage_marker_done(spark, out_dir, run_id, "edges"):
        # broadcast canonical-map join + salted bucket key — shared core
        # in kg/graph.py (see there for the skew-mitigation rationale)
        edges = build_edges(triples, nodes, salt=salt, n_buckets=n_buckets)
        _write_bucketed(edges, edges_path)
        ln.commit_global_stage(
            spark, out_dir, run_id, "edges",
            spark.read.parquet(edges_path).count(),
        )
    metrics["edges"] = ln.committed_row_count(spark, out_dir, run_id, "edges")
    _mark("edges")
    spark.sparkContext.setJobDescription(None)
    return metrics
