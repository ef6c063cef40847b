"""Token-window dedup at 1M pages (round-7 item 5; precision audit
added in round 8 — stage 4 verifies sampled non-planted drops are
token-for-token identical to their keeper window and publishes
precision next to recall, BENCH/window_dedup_1m_r8.json).

The window family (operators/passages.py::window_fingerprints /
window_dedup / apply_window_dedup) had unit-scale tests only; this run
validates it at corpus scale with PLANTED repeated spans and publishes
recall + stage walls (BENCH/window_dedup_1m_r7.json + BENCH/BASELINE.md).

Corpus: the round-6 full-stack 1M corpus (10% junk + 10% near-dup
clones, 40 shard files) — pages carry the extraction-parity ``text``
column, so the run measures the window operators, not extraction.

Planting: a fixed 100-token span (= exactly 2 disjoint 50-token
windows) appended to ~10% of docs, chosen deterministically by
``crc32(url) % 10 == 0``.  Disjoint windows are doc-relative (start at
token 0, every 50), so the doc's own text is PADDED to a 50-token
boundary first — an unaligned planted span would hash differently in
every doc, which is the documented limitation of the C4-style disjoint
grain, not a recall miss.  Padding tokens are per-doc unique so they
never collide across docs.

Expected: per planted fingerprint, every occurrence beyond the keeper
drops => recall = dropped_planted / (n_planted_windows - 2).  Repeats
among non-planted windows are genuine (the corpus has planted
near-dup clone DOCS whose windows align from token 0, plus synth junk
pages drawn from a tiny template pool) and are reported separately, not
counted as false positives.

Usage: PYTHONPATH=. python scripts/window_dedup_validation.py [corpus]
Never run concurrently with pytest or bench.py (host-capacity drift).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORPUS_DEFAULT = "/tmp/dm6_corpus_1m_full"
WINDOW = 50
SPAN_TOKENS = 100  # 2 full windows

# 100 distinct tokens, deterministic
SPAN = " ".join(f"boiler{i:03d}" for i in range(SPAN_TOKENS))


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else CORPUS_DEFAULT
    from pyspark.sql import functions as F

    from driftmind_spark.operators.passages import (
        apply_window_dedup,
        window_dedup,
        window_fingerprints,
    )
    from driftmind_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=4 * cpus)

    pages = spark.read.parquet(os.path.join(corpus, "pages.parquet"))
    planted = F.crc32(F.col("url")) % 10 == 0
    toks = F.filter(F.split(F.lower(F.coalesce("text", F.lit(""))), r"\s+"),
                    lambda t: t != "")
    pad_n = (WINDOW - F.size(toks) % WINDOW) % WINDOW
    # per-doc-unique pad tokens (crc32-salted) so pads never repeat
    # across docs and the pad window itself cannot become a dup cluster.
    # NULL when no padding is needed (concat_ws skips NULLs) — a bare
    # sequence(1, 0) would DESCEND and emit two bogus tokens.
    pad = F.when(
        pad_n > 0,
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), pad_n),
                lambda i: F.concat(F.lit("pad"), F.crc32("url"),
                                   F.lit("x"), i),
            ),
            " ",
        ),
    )
    docs = pages.select(
        F.col("url").alias("doc_id"),
        F.when(
            planted,
            F.concat_ws(" ", F.col("text"), pad, F.lit(SPAN)),
        ).otherwise(F.col("text")).alias("text"),
    )

    n_docs = docs.count()
    n_planted = pages.filter(planted).count()
    result = {"corpus": corpus, "n_docs": n_docs, "cpus": cpus,
              "window_tokens": WINDOW, "n_planted_docs": n_planted}

    # stage 1: detection-only fingerprints (the narrow path)
    t0 = time.monotonic()
    n_windows = window_fingerprints(docs, window_tokens=WINDOW).count()
    result["fingerprints_wall_sec"] = round(time.monotonic() - t0, 1)
    result["n_windows"] = n_windows

    # stage 2: full keeper election
    t0 = time.monotonic()
    res = window_dedup(docs, window_tokens=WINDOW)
    planted_fp = F.col("fingerprint").isin(
        [r["fingerprint"] for r in window_fingerprints(
            spark.createDataFrame([("x", SPAN)], "doc_id string, text string"),
            window_tokens=WINDOW).select("fingerprint").collect()]
    )
    agg = res.agg(
        F.count("*").alias("rows"),
        F.sum(F.when(~F.col("is_kept"), 1).otherwise(0)).alias("dropped"),
        F.sum(F.when(planted_fp & ~F.col("is_kept"), 1).otherwise(0)).alias(
            "planted_dropped"),
        F.sum(F.when(planted_fp, 1).otherwise(0)).alias("planted_windows"),
    ).collect()[0]
    result["window_dedup_wall_sec"] = round(time.monotonic() - t0, 1)
    result["windows_dropped_total"] = agg["dropped"]
    result["planted_windows"] = agg["planted_windows"]
    result["planted_dropped"] = agg["planted_dropped"]
    # 2 windows per planted doc; keeper doc keeps both of its span windows
    expect_drop = agg["planted_windows"] - 2
    result["planted_recall"] = round(agg["planted_dropped"] / expect_drop, 4)
    result["other_dropped"] = agg["dropped"] - agg["planted_dropped"]

    # stage 3: rebuild (the apply path moves window text)
    t0 = time.monotonic()
    rebuilt = apply_window_dedup(docs, window_tokens=WINDOW)
    n_out = rebuilt.count()
    surviving = rebuilt.filter(F.col("text").contains("boiler000")).count()
    result["rebuild_wall_sec"] = round(time.monotonic() - t0, 1)
    result["rebuilt_docs"] = n_out
    result["docs_with_surviving_span"] = surviving

    # stage 4: PRECISION audit over the non-planted drops (round-8
    # item 3).  The fingerprint is exact md5 over the window tokens, so
    # every dropped window should be token-for-token identical to its
    # keeper — a mismatch would mean a normalization bug between the
    # fingerprint path and the keeper join (or an md5 collision).
    # Sampled dropped windows join their keeper's window_text by
    # fingerprint; precision = exact-equal / sampled.
    t0 = time.monotonic()
    resk = window_dedup(docs, window_tokens=WINDOW, keep_text=True)
    sample = (
        resk.filter(~F.col("is_kept") & ~planted_fp)
        .sample(fraction=0.05, seed=8)
        .limit(10_000)
    )
    keepers = resk.filter(
        F.col("is_kept") & F.col("n_occurrences").isNotNull()
    ).select("fingerprint", F.col("window_text").alias("keeper_text"))
    pagg = sample.join(keepers, "fingerprint").agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("window_text") == F.col("keeper_text"), 1)
            .otherwise(0)
        ).alias("exact"),
    ).collect()[0]
    result["precision_wall_sec"] = round(time.monotonic() - t0, 1)
    result["precision_sampled_windows"] = pagg["n"]
    result["precision_exact_matches"] = pagg["exact"]
    result["window_precision"] = (
        round(pagg["exact"] / pagg["n"], 6) if pagg["n"] else None
    )

    out_path = os.path.join(REPO, "BENCH", "window_dedup_1m_r8.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    print(f"wrote {out_path}")
    assert n_out == n_docs
    assert result["planted_recall"] >= 0.999
    assert pagg["n"] > 0 and pagg["exact"] == pagg["n"], (
        "dropped windows must equal their keeper token-for-token"
    )


if __name__ == "__main__":
    main()
