"""Search-orchestration pipeline (§3.2 rewrite) + expansion/reference
kernels."""

import pytest
from pyspark.sql import functions as F

from driftmind_spark.kernels.textproc import (
    contains_any_keyword,
    document_referenced,
    expand_query,
    extract_document_references,
)
from driftmind_spark.operators.chunking import build_chunks
from driftmind_spark.operators.search import search


# ---- kernels -------------------------------------------------------------------

def test_expand_query_adds_synonyms():
    out = expand_query("database setup")
    assert out.startswith("database setup ")
    # first two synonyms of each term from the reference's table
    assert "datenbank" in out and "konfigurieren" in out


def test_expand_query_no_terms_unchanged():
    assert expand_query("the and or") == "the and or"
    assert expand_query("") == ""


def test_extract_document_references():
    msgs = [
        "see report_v2.pdf and notes.md for details",
        "irrelevant chatter",
        "also NOTES.md again plus guide.docx",
    ]
    refs = extract_document_references(msgs)
    assert refs == ["report_v2.pdf", "notes.md", "guide.docx"]


def test_document_referenced_containment_both_ways():
    assert document_referenced("https://x/report_v2.pdf", ["report_v2.pdf"])
    assert not document_referenced("https://x/other.pdf", ["report_v2.pdf"])
    assert not document_referenced("", ["a.pdf"])


def test_contains_any_keyword():
    assert contains_any_keyword("Spark SHUFFLE internals", ["shuffle"])
    assert not contains_any_keyword("nothing here", ["shuffle"])


# ---- pipeline ------------------------------------------------------------------

@pytest.fixture(scope="module")
def chunks(spark, pages_dir):
    pages = spark.read.parquet(f"{pages_dir}/pages.parquet")
    return build_chunks(pages, embedding_dim=64).cache()


def test_search_returns_ranked_diverse_results(spark, chunks):
    res = search(chunks, "Acme Corp acquired Beta Systems",
                 max_results=5, embedding_dim=64).collect()
    assert 0 < len(res) <= 5
    scores = [r["score"] for r in res]
    assert scores == sorted(scores, reverse=True)
    # diversification: one row per document
    assert len({r["url"] for r in res}) == len(res)
    # context assembled and contains the hit chunk itself
    for r in res:
        assert r["content"] in r["context"]


def test_search_threshold_filters(spark, chunks):
    # gibberish query -> no text match; vector scores low -> empty or few
    res = search(chunks, "zzz qqq xxyzzy unmatched", max_results=5,
                 embedding_dim=64).collect()
    assert all(r["score"] >= 0.05 for r in res)


def test_search_history_boost_promotes_referenced_doc(spark, chunks):
    base = search(chunks, "Kappa Software invested", max_results=8,
                  embedding_dim=64).collect()
    assert base, "need non-empty baseline"
    target = base[-1]["url"]  # lowest-ranked result
    fname = target.rsplit("/", 1)[-1].replace(".html", ".pdf")
    history = [f"Earlier we discussed {fname} in depth."]
    boosted = search(chunks, "Kappa Software invested", max_results=8,
                     embedding_dim=64, history=history).collect()
    b_scores = {r["url"]: r["score"] for r in boosted}
    a_scores = {r["url"]: r["score"] for r in base}
    if target in b_scores:
        assert b_scores[target] > a_scores[target] * 1.7


def test_search_expansion_changes_candidates(spark, chunks):
    # "database" expands with datenbank/db synonyms -> legs merged by max
    with_exp = search(chunks, "database storage", max_results=5,
                      embedding_dim=64, use_expansion=True)
    without = search(chunks, "database storage", max_results=5,
                     embedding_dim=64, use_expansion=False)
    assert with_exp.count() >= 0 and without.count() >= 0


def test_enhanced_second_leg_merge_matches_reference_loop(spark, chunks):
    """The history-enhanced second leg + merge (SearchOrchestrationService
    .cs:450-483): Spark's merged output must equal a pure-Python port of
    the C# merge loop applied to the two legs' rows."""
    from driftmind_spark.kernels.textproc import expand_query
    from driftmind_spark.operators.search import enhanced_history_leg

    query = "Acme Corp acquired Beta Systems"
    history = ["Earlier we looked at doc-42.pdf and shuffle performance."]
    max_results = 6

    base = search(chunks, query, max_results=max_results,
                  embedding_dim=64).collect()
    enh = enhanced_history_leg(
        chunks, expand_query(query), history, embedding_dim=64
    ).collect()

    # pure-Python port of MergeSearchResults: enhanced first (dedup per
    # document), unseen base docs fill seats, final top max_results
    seen, combined = set(), []
    for r in sorted(enh, key=lambda r: (-r["score"], r["url"], r["chunk_index"])):
        if r["url"] not in seen:
            combined.append(r)
            seen.add(r["url"])
    for r in sorted(base, key=lambda r: (-r["score"], r["url"])):
        if r["url"] not in seen and len(combined) < max_results:
            combined.append(r)
            seen.add(r["url"])
    expected = sorted(combined, key=lambda r: (-r["score"], r["url"]))[:max_results]

    got = search(chunks, query, max_results=max_results, embedding_dim=64,
                 history=history).collect()
    got_keys = [(r["url"], r["chunk_index"], round(r["score"], 6)) for r in got]
    exp_keys = [(r["url"], r["chunk_index"], round(r["score"], 6))
                for r in expected]
    assert got_keys == exp_keys
