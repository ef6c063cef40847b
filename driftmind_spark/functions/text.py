"""SQL-expressible column functions (the fast path — JVM-side, inside
whole-stage codegen; each maps a ◈-flagged SURVEY.md §2.8 row).

These are the operators the DuckDB oracle validates 1:1; where the C# port
needs byte parity beyond ANSI SQL semantics (e.g. the single-pass
double-space replace), the matching pandas UDF in ``udfs.py`` is the
parity kernel and this column version is the scale path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..kernels.textproc import MIME_TYPES

# ---------------------------------------------------------------------------
# F3 — cache normalization (EmbeddingService.cs:95-104), SQL-flavored:
# trim + lower + collapse all runs of whitespace to single spaces.
# ---------------------------------------------------------------------------


def normalize_text(col: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


# ---------------------------------------------------------------------------
# F4 — meaningful terms: split on the reference's punctuation set,
# keep len>2, drop stop words (broadcast literal array), distinct + sort
# (sorted so DataFrame and SQL engines agree on array order).
# ---------------------------------------------------------------------------

_TERM_SPLIT_PATTERN = r"[ ,.!?:;\-()\[\]\n\r]+"


def terms_array(col: Column, stop_words: tuple[str, ...]) -> Column:
    # array_except is a hash-set difference (and dedupes), vs an O(|stop|)
    # array_contains scan per token inside a filter lambda.
    # sort_array, not array_sort: identical ascending order on these
    # null-free arrays (the two differ only in null placement), but
    # array_sort expands to a lambda-comparator expression — more
    # generated code to compile per cold query and a slower sort.
    stop_lit = F.array(*[F.lit(w) for w in stop_words])
    toks = F.split(F.lower(col), _TERM_SPLIT_PATTERN)
    long_enough = F.filter(toks, lambda t: F.length(t) > 2)
    return F.sort_array(F.array_except(long_enough, stop_lit))


# ---------------------------------------------------------------------------
# F9 — extension -> MIME (DocumentProcessingService.cs:576-588) as a literal
# map lookup, with the reference's octet-stream fallback.
# ---------------------------------------------------------------------------


def mime_from_name(col: Column) -> Column:
    mapping = F.create_map(
        *[F.lit(x) for kv in MIME_TYPES.items() for x in kv]
    )
    ext = F.concat(F.lit("."), F.lower(F.regexp_extract(col, r"\.([A-Za-z0-9]+)$", 1)))
    return F.coalesce(F.element_at(mapping, ext), F.lit("application/octet-stream"))


# ---------------------------------------------------------------------------
# F10 — umlaut transliteration (DocumentProcessingService.cs:641-665)
# ---------------------------------------------------------------------------


def transliterate_umlauts(col: Column) -> Column:
    out = col
    for src, dst in (("ä", "ae"), ("ö", "oe"), ("ü", "ue"),
                     ("Ä", "Ae"), ("Ö", "Oe"), ("Ü", "Ue"), ("ß", "ss")):
        out = F.replace(out, F.lit(src), F.lit(dst))
    return out


# ---------------------------------------------------------------------------
# S7 — filename sanitization (DocumentProcessingService.cs:607-686) as a
# column expression chain: umlauts transliterated, remaining non-ASCII and
# forbidden chars -> '_', runs collapsed, edges trimmed.  The pandas-UDF
# byte-parity port lives in kernels/textproc.py::sanitize_file_name.
# ---------------------------------------------------------------------------


def sanitize_filename_col(col: Column) -> Column:
    out = transliterate_umlauts(col)
    out = F.regexp_replace(out, r"[^\x00-\x7F]", "_")
    out = F.regexp_replace(out, r'[<>:"|?*/\\ ]', "_")
    out = F.regexp_replace(out, r"_{2,}", "_")
    out = F.regexp_replace(out, r"^_+|_+$", "")
    return F.when(out == "", F.lit("sanitized_file")).otherwise(out)


# ---------------------------------------------------------------------------
# T6 — word-boundary truncation (DocumentManagementService.cs:128-142):
# cut at max_length, back to last space if it lies in the final 20%.
# ---------------------------------------------------------------------------


def truncate_at_word(col: Column, max_length: int = 150) -> Column:
    cut = F.substring(col, 1, max_length)
    # last-space position via reverse+instr (1-based; 0 when no space)
    last_space = F.when(
        F.instr(F.reverse(cut), " ") > 0,
        F.length(cut) - F.instr(F.reverse(cut), " ") + 1,
    ).otherwise(F.lit(0))
    trimmed = F.when(
        last_space > F.lit(max_length * 0.8),
        F.substring(cut, 1, (last_space - 1).cast("int")),
    ).otherwise(cut)
    return F.when(F.length(col) <= max_length, F.coalesce(col, F.lit(""))).otherwise(
        F.concat(trimmed, F.lit("..."))
    )


# ---------------------------------------------------------------------------
# F6 — cosine similarity over array<float> pairs, pure built-ins
# (zip_with + aggregate; no Python in the hot path).
# ---------------------------------------------------------------------------


def l2_norm(a: Column) -> Column:
    """Euclidean norm as the exact left-fold aggregate ``cosine_sim``
    uses, split out so join operators can HOIST it to before the join:
    each side's norm is then evaluated once per vector instead of once
    per candidate pair (pure common-subexpression motion — same
    expression, same float summation order, bit-identical values)."""
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_sim_prenorm(
    a: Column, b: Column, na: Column, nb: Column
) -> Column:
    """``cosine_sim`` with the two norms supplied as precomputed columns
    (see ``l2_norm``).  Only the dot product remains per-pair work."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.when(
        (F.size(a) != F.size(b)) | (na == 0.0) | (nb == 0.0), F.lit(0.0)
    ).otherwise(dot / (na * nb))


def cosine_sim(a: Column, b: Column) -> Column:
    return cosine_sim_prenorm(a, b, l2_norm(a), l2_norm(b))


# ---------------------------------------------------------------------------
# F5 (blend part) — 0.7*vector + 0.3*text (RelevanceAnalyzer.cs:82)
# ---------------------------------------------------------------------------


def blend_score(vector_score: Column, text_relevance: Column) -> Column:
    return vector_score * F.lit(0.7) + text_relevance * F.lit(0.3)


# ---------------------------------------------------------------------------
# F11 — Base64 round-trip (DocumentProcessingService.cs:143,226)
# ---------------------------------------------------------------------------


def b64_encode(col: Column) -> Column:
    return F.base64(F.encode(col, "utf-8"))


def b64_decode(col: Column) -> Column:
    return F.decode(F.unbase64(col), "utf-8")
