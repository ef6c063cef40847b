"""The POST /search pipeline (SURVEY.md §3.2) as one DataFrame
expression over a chunks table.

Reference flow (SearchOrchestrationService.cs:39-312) — follow-up
classification, query expansion, dual hybrid search, merge-dedup,
chunk-0 metadata join, 0.7/0.3 re-scoring, history boosts, threshold,
per-document diversification, top-k, adjacent-context assembly — with
the per-request network hops replaced by one declarative plan:

  chunks -> vector score (cosine vs broadcast query vec)
         -> union(original, expanded) -> max-score dedup (J3)
         -> relevance blend (F5)
         -> threshold (P6) -> best-chunk-per-doc (A4) -> top-k (W1)
         [+ history] -> enhanced second leg (top-20 rescore + x1.8/x1.3
                        boosts, SearchHistoryService.cs:101-214)
                     -> reference merge: enhanced first, unseen base
                        docs fill remaining seats, final top-k
                        (SearchOrchestrationService.cs:450-483)
         -> +-k adjacent chunks window (W2/J5)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import cosine_sim
from ..functions.udfs import make_relevance_udf
from ..kernels.hashing import hashed_ngram_embedding
from ..kernels.textproc import (
    expand_query,
    extract_document_references,
    extract_history_keywords,
    is_follow_up_question,
)

# appsettings.json:31 + SearchOrchestrationService.cs:337
MIN_SCORE = 0.15
MIN_SCORE_FOLLOW_UP = 0.05
HISTORY_DOC_BOOST = 1.8   # SearchHistoryService.cs:162
HISTORY_KW_BOOST = 1.3    # SearchHistoryService.cs:169


def _query_vec_col(query: str, dim: int):
    return F.array(*[F.lit(float(x))
                     for x in hashed_ngram_embedding(query, dim).tolist()])


def _scored(chunks: DataFrame, query: str, dim: int, label: str) -> DataFrame:
    qv = F.transform(_query_vec_col(query, dim), lambda x: x.cast("double"))
    cv = F.transform("embedding", lambda x: x.cast("double"))
    return chunks.withColumn("vector_score", cosine_sim(cv, qv)).withColumn(
        "search_leg", F.lit(label)
    )


def _history_boosts(df: DataFrame, refs: list[str], kws: list[str]) -> DataFrame:
    """SearchHistoryService.cs:155-171: x1.8 when the document id matches
    a mined reference, else x1.3 on keyword overlap — applied to the
    ``score`` column."""
    if not refs and not kws:
        return df
    ref_hit = F.lit(False)
    for r in refs:
        # match on the filename stem: the reference compares document
        # ids against mined FILE names both ways (ChatHistoryAnalyzer
        # .cs:188-193); our document ids are urls, so the extension
        # mined from prose ('.pdf') need not equal the url's ('.html')
        stem = r.rsplit(".", 1)[0].lower()
        ref_hit = ref_hit | F.lower("url").contains(stem)
    kw_hit = F.lit(False)
    for k in kws:
        kw_hit = kw_hit | F.lower("content").contains(k.lower())
    return df.withColumn(
        "score",
        F.when(ref_hit, F.col("score") * HISTORY_DOC_BOOST)
        .when(kw_hit, F.col("score") * HISTORY_KW_BOOST)
        .otherwise(F.col("score")),
    )


def enhanced_history_leg(
    chunks: DataFrame,
    query: str,
    history: list[str],
    embedding_dim: int = 256,
    top: int = 20,
    out_k: int = 15,
) -> DataFrame:
    """The history-driven SECOND search leg
    (SearchHistoryService.RunEnhancedSearchAsync, SearchHistoryService.cs:
    101-214): hybrid top-``top`` chunks for the same query, relevance
    re-score, x1.8 boost for history-referenced documents / x1.3 for
    history-keyword content, then the top ``out_k`` by boosted score.
    No threshold and no per-document diversification — the merge step
    dedups per document."""
    refs = extract_document_references(history)
    kws = extract_history_keywords(history)
    scored = _scored(chunks, query, embedding_dim, "hist")
    top_chunks = scored.orderBy(
        F.desc("vector_score"), F.asc("url"), F.asc("chunk_index")
    ).limit(top)
    rel = make_relevance_udf(query)
    rescored = top_chunks.withColumn("score", rel("content", "vector_score"))
    boosted = _history_boosts(rescored, refs, kws)
    return boosted.orderBy(
        F.desc("score"), F.asc("url"), F.asc("chunk_index")
    ).limit(out_k)


_RESULT_COLS = ("url", "chunk_index", "content", "score", "vector_score")


def _merge_enhanced(
    base: DataFrame, enhanced: DataFrame, max_results: int
) -> DataFrame:
    """MergeSearchResults (SearchOrchestrationService.cs:450-483):
    enhanced results enter first (deduped to their best chunk per
    document), base documents not already included fill the remaining
    seats in score order, and the final list is the top ``max_results``
    by score.  The enhanced side is <= 15 rows, so the seat count is a
    driver-side scalar, not a data-dependent collect."""
    w_doc = Window.partitionBy("url").orderBy(F.desc("score"), F.asc("chunk_index"))
    enh_best = (
        enhanced.withColumn("_rn", F.row_number().over(w_doc))
        .filter(F.col("_rn") == 1)
        .select(*_RESULT_COLS)
    )
    n_enh = enh_best.count()  # bounded by out_k=15
    seats = max(0, max_results - n_enh)
    base_kept = (
        base.select(*_RESULT_COLS)
        .join(enh_best.select("url"), "url", "left_anti")
        .orderBy(F.desc("score"), F.asc("url"))
        .limit(seats)
    )
    return (
        enh_best.unionByName(base_kept.select(*_RESULT_COLS))
        .orderBy(F.desc("score"), F.asc("url"))
        .limit(max_results)
    )


def search(
    chunks: DataFrame,
    query: str,
    max_results: int = 10,
    history: list[str] | None = None,
    embedding_dim: int = 256,
    adjacent: int = 2,
    use_expansion: bool = True,
) -> DataFrame:
    """Returns the top ``max_results`` best-chunk-per-document rows with
    scores and an adjacent-context column."""
    history = history or []
    follow_up = is_follow_up_question(query)
    min_score = MIN_SCORE_FOLLOW_UP if follow_up else MIN_SCORE

    # oversample factor (SearchOrchestrationService.cs:107-110, T5)
    oversample = 4 if len(query) < 20 else 3
    cand_k = min(max_results * oversample, 100)

    legs = _scored(chunks, query, embedding_dim, "orig")
    expanded = expand_query(query) if use_expansion else query
    if expanded != query:
        legs = legs.unionByName(_scored(chunks, expanded, embedding_dim, "exp"))

    # J3 merge-dedup: keep the higher-scoring leg per (url, chunk_index)
    w_dedup = Window.partitionBy("url", "chunk_index").orderBy(
        F.desc("vector_score"), F.asc("search_leg")
    )
    merged = (
        legs.withColumn("_rn", F.row_number().over(w_dedup))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "search_leg")
    )

    # candidate cut before the (python) re-scorer — T5 oversampling.
    # (url, chunk_index) tie-break: equal-scored chunks at the cut
    # boundary must survive deterministically across partitionings.
    candidates = merged.orderBy(
        F.desc("vector_score"), F.asc("url"), F.asc("chunk_index")
    ).limit(cand_k)

    # F5 exact-port re-scoring 0.7*vector + 0.3*text.  The BASE leg is
    # boost-free — the reference applies history boosts only inside the
    # enhanced second leg (SearchOrchestrationService.cs:137-175 computes
    # plain relevance; boosts live in SearchHistoryService.cs:155-171).
    rel = make_relevance_udf(query)
    rescored = candidates.withColumn("score", rel("content", "vector_score"))

    # P6 threshold -> A4 best chunk per document -> W1 global top-k
    filtered = rescored.filter(F.col("score") >= min_score)
    w_doc = Window.partitionBy("url").orderBy(F.desc("score"), F.asc("chunk_index"))
    best = (
        filtered.withColumn("_rn", F.row_number().over(w_doc))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .orderBy(F.desc("score"), F.asc("url"))
        .limit(max_results)
    ).select(*_RESULT_COLS)

    # history-enhanced SECOND leg + reference merge (the r1 gap): the
    # enhanced leg re-searches with the same (expanded) query, boosts by
    # history evidence, and its results take priority over the base leg
    if history:
        enh = enhanced_history_leg(
            chunks, expanded if use_expansion else query, history,
            embedding_dim,
        )
        best = _merge_enhanced(best, enh, max_results)

    # W2/J5 adjacent context: the +-k chunks around each hit, in order
    # (ChatService.cs:324-419's context assembly as a range join)
    ctx = chunks.select(
        F.col("url").alias("c_url"),
        F.col("chunk_index").alias("c_idx"),
        F.col("content").alias("c_content"),
    )
    with_ctx = (
        best.join(
            ctx,
            (F.col("c_url") == best.url)
            & F.col("c_idx").between(
                best.chunk_index - adjacent, best.chunk_index + adjacent
            ),
        )
        .groupBy("url", "chunk_index", "content", "score", "vector_score")
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("c_idx", "c_content"))
                    ),
                    lambda s: s.c_content,
                ),
            ).alias("context")
        )
    )
    return with_ctx.orderBy(F.desc("score"), F.asc("url"))
