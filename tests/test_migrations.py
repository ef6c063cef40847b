"""S13/S14 runnable migration jobs (DataMigrationService.cs:28-227):
transformation semantics, fixpoint (re-applying changes nothing), and
idempotent job re-runs through the lineage marker."""

import pytest
from pyspark.sql import functions as F

from driftmind_spark.operators.migrations import (
    fix_content_types,
    migrate_metadata_to_chunk0,
    run_content_type_fix,
    run_metadata_migration,
)

SCHEMA = (
    "url string, chunk_index int, content string, "
    "original_file_name string, content_type string, file_size_bytes long"
)


@pytest.fixture()
def legacy_chunks(spark):
    rows = [
        # doc A: metadata correctly on chunk 0, duplicated on chunk 2
        ("a", 0, "c0", "report.pdf", "application/pdf", 100),
        ("a", 1, "c1", None, None, None),
        ("a", 2, "c2", "report.pdf", "application/pdf", 100),
        # doc B: chunk 0 missing metadata; donor is chunk 3 (first with it)
        ("b", 0, "c0", None, None, None),
        ("b", 1, "c1", None, None, None),
        ("b", 3, "c3", "notes.txt", "application/octet-stream", 42),
        # doc C: single chunk, no metadata anywhere -> untouched
        ("c", 0, "c0", None, None, None),
        # doc D: wrong content type on chunk 0 (S14 target)
        ("d", 0, "c0", "guide.docx", "text/plain", 9),
        # doc E: unmapped extension keeps existing type
        ("e", 0, "c0", "data.bin", "application/x-custom", 7),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_metadata_migration_semantics(spark, legacy_chunks):
    out = migrate_metadata_to_chunk0(legacy_chunks).collect()
    rows = {(r["url"], r["chunk_index"]): r for r in out}
    # doc A: chunk 0 keeps metadata, later chunks nulled
    assert rows[("a", 0)]["original_file_name"] == "report.pdf"
    for key in (("a", 1), ("a", 2), ("b", 1), ("b", 3)):
        r = rows[key]
        assert r["original_file_name"] is None
        assert r["content_type"] is None
        assert r["file_size_bytes"] is None
    # doc B: donor chunk 3's metadata promoted to the first chunk
    assert rows[("b", 0)]["original_file_name"] == "notes.txt"
    assert rows[("b", 0)]["file_size_bytes"] == 42
    # doc C untouched
    assert rows[("c", 0)]["original_file_name"] is None
    # content untouched everywhere
    assert all(r["content"].startswith("c") for r in out)


def test_metadata_migration_is_fixpoint(spark, legacy_chunks):
    once = migrate_metadata_to_chunk0(legacy_chunks)
    twice = migrate_metadata_to_chunk0(once)
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_content_type_fix_semantics(spark, legacy_chunks):
    out = {(r["url"], r["chunk_index"]): r for r in
           fix_content_types(legacy_chunks).collect()}
    # S14: wrong type corrected from the extension map
    assert out[("d", 0)]["content_type"].startswith(
        "application/vnd.openxmlformats"
    )
    # only the FIRST chunk per document is checked (chunk-0 convention):
    # doc b's first chunk has no filename, so even its metadata-bearing
    # chunk 3 stays untouched
    assert out[("b", 3)]["content_type"] == "application/octet-stream"
    # unmapped extension falls back to the existing client type
    assert out[("e", 0)]["content_type"] == "application/x-custom"
    # no-filename rows untouched
    assert out[("c", 0)]["content_type"] is None


def test_migration_jobs_idempotent_rerun(spark, legacy_chunks, tmp_path):
    src = str(tmp_path / "chunks_table")
    out = str(tmp_path / "mig_out")
    legacy_chunks.write.parquet(src)

    m1 = run_metadata_migration(spark, src, out, run_id="m")
    assert not m1["skipped"] and m1["rows"] == 9
    snapshot = sorted(
        map(tuple, spark.read.parquet(f"{out}/s13_metadata_chunk0").collect())
    )
    m2 = run_metadata_migration(spark, src, out, run_id="m")
    assert m2["skipped"] and m2["rows"] == 9
    assert snapshot == sorted(
        map(tuple, spark.read.parquet(f"{out}/s13_metadata_chunk0").collect())
    )

    f1 = run_content_type_fix(spark, src, out, run_id="m")
    f2 = run_content_type_fix(spark, src, out, run_id="m")
    assert not f1["skipped"] and f2["skipped"] and f1["rows"] == f2["rows"]
