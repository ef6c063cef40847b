"""sources/pages.py: validated reads, delete-as-anti-join, one-pass
catalog, existence probe."""

import pytest
from pyspark.sql import functions as F

from driftmind_spark.operators.chunking import build_chunks
from driftmind_spark.sources.pages import (
    delete_documents,
    document_catalog,
    document_exists,
    read_pages,
)


@pytest.fixture(scope="module")
def chunks(spark, pages_dir):
    pages = read_pages(spark, f"{pages_dir}/pages.parquet")
    return build_chunks(pages, with_embeddings=False).cache()


def test_read_pages_validated(spark, pages_dir):
    df = read_pages(spark, f"{pages_dir}/pages.parquet")
    assert df.filter(F.length("html") > 3 * 1024 * 1024).count() == 0


def test_delete_documents_anti_join(spark, chunks):
    victims = chunks.select("url").distinct().limit(5)
    survivors = delete_documents(chunks, victims)
    assert survivors.join(victims, "url", "semi").count() == 0
    assert survivors.count() == chunks.count() - chunks.join(
        victims, "url", "semi"
    ).count()


def test_document_catalog_one_pass(spark, chunks):
    cat = document_catalog(chunks)
    assert cat.count() == chunks.select("url").distinct().count()
    row = cat.first()
    assert row["chunk_count"] >= 1
    # top-3 samples (DocumentManagementService.cs:68-99): first chunks by
    # index, truncated to <= 150+3 chars, no whitespace-only entries
    assert 1 <= len(row["samples"]) <= 3
    assert all(s.strip() and len(s) <= 153 for s in row["samples"])
    some = cat.limit(3).collect()
    for r in some:
        ordered = (
            chunks.filter(F.col("url") == r["url"])
            .orderBy("chunk_index").select("content")
            .limit(3).collect()
        )
        assert len(r["samples"]) == len(ordered)
        for sample, chunk in zip(r["samples"], ordered):
            assert chunk["content"].startswith(sample.removesuffix("..."))


def test_document_exists(spark, chunks):
    url = chunks.select("url").first()["url"]
    assert document_exists(chunks, url)
    assert not document_exists(chunks, "https://nope.example/x")
