"""Quantitative skew-mitigation evidence (north_rule: partitioning /
shuffle / skew handled explicitly).

The synthetic corpus plants Zipf-distributed subject entities (synth.py
``_ZIPF_WEIGHTS``), so the head entity dominates edges.  These tests
measure that (a) the skew is real, and (b) the salted edge-partitioning
key actually flattens it.
"""

import pytest
from pyspark.sql import functions as F

from driftmind_spark.kg.triples import extract_triples_df


@pytest.fixture(scope="module")
def triples(spark, pages_dir):
    """Triples with subjects/objects resolved to canonical entities —
    the key the edges table is actually partitioned by (pipeline stage 4
    salts subj_id, i.e. the post-canonicalization id)."""
    from driftmind_spark.kernels.vocab import ALIASES

    pages = spark.read.parquet(f"{pages_dir}/pages.parquet")
    alias_map = F.create_map(*[F.lit(x) for kv in ALIASES.items() for x in kv])
    return (
        extract_triples_df(pages)
        .withColumn("subj", F.coalesce(alias_map[F.col("subj")], F.col("subj")))
        .withColumn("obj", F.coalesce(alias_map[F.col("obj")], F.col("obj")))
        .cache()
    )


def _max_share(df, key_col):
    counts = df.groupBy(key_col).count()
    total = df.count()
    return counts.agg(F.max("count")).first()[0] / total


def test_head_entity_skew_is_planted(spark, triples):
    """The hottest subject must dominate (Zipf) — otherwise the salting
    test below proves nothing."""
    share = _max_share(triples, "subj")
    assert share > 0.10, f"expected Zipf head subject, got max share {share:.3f}"


def test_salted_bucketing_flattens_skew(spark, triples):
    n_buckets, salt = 16, 8
    unsalted = triples.withColumn(
        "bucket", F.pmod(F.xxhash64("subj"), F.lit(n_buckets)).cast("int")
    )
    salted = triples.withColumn(
        "bucket",
        F.pmod(
            F.xxhash64("subj", F.pmod(F.xxhash64("obj"), F.lit(salt))),
            F.lit(n_buckets),
        ).cast("int"),
    )
    share_unsalted = _max_share(unsalted, "bucket")
    share_salted = _max_share(salted, "bucket")
    # perfectly uniform would be 1/16 = 0.0625; the salted layout must be
    # materially flatter than the subject-hash layout
    assert share_salted < share_unsalted, (
        f"salting did not help: {share_salted:.3f} vs {share_unsalted:.3f}"
    )
    # the head entity alone holds ~30% of triples; salting must spread it
    # so no bucket holds more than ~2/3 of that mass (small-sample noise
    # on the 400-page fixture keeps this above the 1/16 uniform ideal)
    assert share_salted < 0.2, f"salted max bucket share {share_salted:.3f}"


def test_partial_aggregation_absorbs_mention_skew(spark, triples):
    """mentions_from_triples aggregates the Zipf surface stream; the plan
    must show map-side partial aggregation before the exchange."""
    from driftmind_spark.kg.blocking import mentions_from_triples

    plan = (
        mentions_from_triples(triples)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_count" in plan or "partial_" in plan


def test_ngram_jaccard_gram_df_cap_bounds_hot_gram(spark):
    """One ubiquitous boilerplate gram must not turn a block into O(n^2)
    pairs (r1 verdict item): with the df cap it contributes no postings
    pairs, while genuinely similar docs still match through their rare
    grams; the dropped gram is observable via hot_gram_stats."""
    from driftmind_spark.operators.dedup import hot_gram_stats, ngram_jaccard_pairs

    n = 120
    hot = "all rights reserved worldwide"  # 4 tokens -> shared 3-grams
    rows = [(i, f"{hot} unique token{i} filler{i} extra{i}", "blk")
            for i in range(n)]
    # two planted near-duplicates sharing rare grams
    rows.append((900, "alpha beta gamma delta epsilon zeta", "blk"))
    rows.append((901, "alpha beta gamma delta epsilon eta", "blk"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")

    pairs = ngram_jaccard_pairs(docs, threshold=0.2, max_gram_df=50)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    # the 120 boilerplate docs share ONLY capped grams -> no pairs
    assert got == {(900, 901)}
    # observability: the hot grams are reported, not silently dropped
    hot_grams = hot_gram_stats(docs, max_gram_df=50).collect()
    assert any(r["gram_df"] >= 120 for r in hot_grams)

    # uncapped for comparison: the shared boilerplate alone reaches the
    # threshold, so the exact variant emits all C(120,2)=7140 pairs —
    # exactly the O(n^2) blowup the cap exists to stop
    exact = ngram_jaccard_pairs(docs, threshold=0.2, max_gram_df=None)
    assert exact.count() == 120 * 119 // 2 + 1
