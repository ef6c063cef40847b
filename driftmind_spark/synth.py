"""Deterministic synthesizer for the north-rule ``pages`` table.

Shape per ``BASELINE.json input_hint``::

    pages(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)

Guarantees (FIXTURES.md §B):
- same ``seed`` + ``n`` -> byte-identical content (per-page RNG derived
  from ``(seed, page_index)``, so generation is order- and
  batch-size-independent);
- entity-bearing sentences from the closed vocabulary -> expected
  ``(subj, pred, obj)`` triples computable exactly (written alongside as
  ``expected_triples``);
- planted near-duplicate surfaces + alias dictionary (``aliases``);
- Zipf-skewed subject entities (head-entity skew for K3/K7 salting tests);
- chunking-adversarial edge pages in a dedicated url range;
- boilerplate decoy sentences OUTSIDE the main-content block, so a naive
  extractor fails the precision gate.

Byte-parity contract: ``extract.extract_main_text(html) == text`` for every
generated page (the empty page roundtrips to "").
"""

from __future__ import annotations

import datetime as _dt
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .kernels.extract import escape_html
from .kernels.vocab import (
    ALIASES,
    CANONICAL_ENTITIES,
    DECOY_SENTENCES,
    ENTITY_SURFACES,
    FILLER_SENTENCES,
    PREDICATES,
)
from .kernels.openie import _ENTITY_RE

_BASE_TS = _dt.datetime(2025, 1, 1, tzinfo=_dt.timezone.utc)

# Surfaces usable inside generated sentences: must parse as entity-shaped
# arguments and not end in sentence punctuation (lowercase aliases like
# "beta systems" stay in the alias dictionary only).
# "." excluded entirely: initials like "A. Turing" would be split by the
# reference chunker's sentence rule (TextChunkingService.cs:63-65) and could
# never round-trip through sentence-scoped extraction.
SENTENCE_SURFACES: dict[str, list[str]] = {
    canon: [s for s in surfaces if _ENTITY_RE.match(s) and "." not in s]
    for canon, surfaces in ENTITY_SURFACES.items()
}

_PRED_IDS = sorted(PREDICATES.keys())

# Zipf-ish skew over canonical entities for sentence subjects: entity 0 is
# the hot head key (exercises salt-key mitigation measurably).  The default
# exponent 1.2 is the corpus every fixture/benchmark uses; the skew
# validation raises it (e.g. 2.5) to concentrate the head hard.
_ZIPF_WEIGHTS = np.array(
    [1.0 / (i + 1) ** 1.2 for i in range(len(CANONICAL_ENTITIES))]
)
_ZIPF_CDF = np.cumsum(_ZIPF_WEIGHTS / _ZIPF_WEIGHTS.sum())

_ZIPF_CDF_CACHE: dict = {1.2: _ZIPF_CDF}


def _zipf_cdf(s: float):
    cdf = _ZIPF_CDF_CACHE.get(s)
    if cdf is None:
        w = np.array(
            [1.0 / (i + 1) ** s for i in range(len(CANONICAL_ENTITIES))]
        )
        cdf = _ZIPF_CDF_CACHE[s] = np.cumsum(w / w.sum())
    return cdf

# Chunking-adversarial texts (FIXTURES.md §B bullet 6); url range
# doc-0 .. doc-{len-1} when n allows.
EDGE_TEXTS: list[str] = [
    "",  # empty page -> extractor must yield ""
    "Short.",  # terminator at end-of-text
    "a.b is not a sentence boundary because no space follows the dot.",
    # single sentence far above chunk_size=300, must be kept whole
    "L" + "ong token " * 45 + "ends here.",
    "Müller besaß größere Straßenzüge. Überläufer kamen später!",
    # exactly-300-char single sentence (286 'x' + padding computed below)
    ("x" * 295 + " end."),
    "One. Two! Three? Four. Five!",
    "Tab\tand newline\ncharacters stay inside a paragraph block.",
]


def _pick_zipf(rng: random.Random, zipf_s: float = 1.2) -> int:
    return int(np.searchsorted(_zipf_cdf(zipf_s), rng.random()))


def _page_sentences(
    rng: random.Random, lang: str, min_sent: int = 2, max_sent: int = 8,
    zipf_s: float = 1.2,
) -> tuple[list[str], list[tuple[str, str, str, str, str]]]:
    """Generate sentences + expected (subj, pred, obj, subj_canon, obj_canon)."""
    n_sent = rng.randint(min_sent, max_sent)
    sentences: list[str] = []
    triples: list[tuple[str, str, str, str, str]] = []
    fillers = FILLER_SENTENCES[lang]
    for _ in range(n_sent):
        if rng.random() < 0.7:
            si = _pick_zipf(rng, zipf_s)
            oi = rng.randrange(len(CANONICAL_ENTITIES) - 1)
            if oi >= si:
                oi += 1
            subj_canon = CANONICAL_ENTITIES[si]
            obj_canon = CANONICAL_ENTITIES[oi]
            subj = rng.choice(SENTENCE_SURFACES[subj_canon])
            obj = rng.choice(SENTENCE_SURFACES[obj_canon])
            pred = rng.choice(_PRED_IDS)
            phrase = PREDICATES[pred][lang]
            adjunct = ""
            if pred in ("acquired", "founded", "invested_in") and rng.random() < 0.3:
                year = rng.randint(1999, 2024)
                adjunct = f" in {year}" if lang == "en" else f" im Jahr {year}"
            terminator = rng.choice("..!?")  # '.' weighted 2x
            sentences.append(f"{subj} {phrase} {obj}{adjunct}{terminator}")
            triples.append((subj, pred, obj, subj_canon, obj_canon))
        else:
            sentences.append(rng.choice(fillers))
    return sentences, triples


def _render_html(
    rng: random.Random, url: str, lang: str, paras: list[str], page_idx: int
) -> str:
    host = url.split("/")[2]
    title = escape_html(paras[0][:60]) if paras else f"doc {page_idx}"
    nav_items = "".join(
        f'<a href="/{p}">{p.title()}</a>'
        for p in rng.sample(["news", "sports", "tech", "about", "contact", "archive"],
                            rng.randint(3, 5))
    )
    decoys = DECOY_SENTENCES[lang]
    ad = escape_html(rng.choice(decoys))
    aside = escape_html(rng.choice(decoys))
    body_paras = "\n".join(f"<p>{escape_html(p)}</p>" for p in paras)
    return (
        "<!DOCTYPE html>\n"
        f'<html lang="{lang}"><head><meta charset="utf-8"><title>{title}</title>\n'
        "<style>nav{display:flex;gap:1em}</style>"
        f"<script>var pageId={page_idx};trackView(pageId);</script></head>\n"
        f"<body>\n<nav>{nav_items}</nav>\n"
        f'<div class="ads banner"><p>{ad}</p></div>\n'
        f"<main><article>\n{body_paras}\n</article></main>\n"
        f"<aside><p>{aside}</p><a href=\"/more\">More</a></aside>\n"
        f'<footer><p>&copy; 2025 {host} — <a href="/privacy">Privacy</a></p></footer>\n'
        "</body></html>"
    )


def _is_planted_clone(page_idx: int, seed: int, dup_rate: float) -> bool:
    """Deterministic per-index clone selection (independent RNG stream so
    the normal-content draws are untouched when dup_rate == 0)."""
    # strictly above the floor: idx == _DUP_FLOOR has an empty source
    # range (randrange(floor, floor) raises)
    if dup_rate <= 0.0 or page_idx <= _DUP_FLOOR:
        return False
    drng = random.Random(((seed + 1) << 33) ^ (page_idx * 0x9E3779B97F4A7C15))
    return drng.random() < dup_rate


_DUP_FLOOR = 24  # indices below this are never clones (and never sources of
                 # clones that are themselves clones — the walk terminates)


def _is_planted_junk(page_idx: int, seed: int, junk_rate: float) -> bool:
    """Deterministic per-index junk selection (independent RNG stream so
    the normal-content draws are untouched when junk_rate == 0)."""
    if junk_rate <= 0.0 or page_idx <= _DUP_FLOOR:
        return False
    jrng = random.Random(((seed + 4) << 33) ^ (page_idx * 0x2545F4914F6CDD1D))
    return jrng.random() < junk_rate


_JUNK_FRAGMENTS = ["Ok.", "More soon.", "Under construction.", "TODO."]


def _junk_page_text(page_idx: int, seed: int) -> str:
    """Deterministic low-quality text the quality gate must reject:
    gibberish (no stopwords), a fragment (too short), or symbol noise
    (punctuation-heavy) — the junk classes a real crawl contains."""
    jrng = random.Random(((seed + 5) << 33) ^ (page_idx * 0x9E3779B97F4A7C15))
    kind = jrng.choice(["gibberish", "fragment", "symbols"])
    if kind == "fragment":
        return jrng.choice(_JUNK_FRAGMENTS)
    if kind == "symbols":
        return " ".join(
            jrng.choice(["!!!", "???", ";;;", ":::", "...", "!?!"])
            for _ in range(jrng.randint(30, 60))
        )
    words = [
        "".join(jrng.choice("bcdfghjklmnpqrstvwxz")
                for _ in range(jrng.randint(4, 9)))
        for _ in range(jrng.randint(40, 80))
    ]
    paras, i = [], 0
    while i < len(words):
        k = min(jrng.randint(10, 25), len(words) - i)
        paras.append(" ".join(words[i:i + k]) + ".")
        i += k
    return "\n\n".join(paras)


def generate_page(page_idx: int, seed: int = 42,
                  min_sent: int = 2, max_sent: int = 8,
                  mixed_formats: bool = False, dup_rate: float = 0.0,
                  junk_rate: float = 0.0, zipf_s: float = 1.2) -> dict:
    """Generate one page + its expected triples, deterministically.

    ``mixed_formats=True`` makes a deterministic share of the corpus real
    non-HTML payloads (the reference's upload formats,
    ``Services/FileProcessingService.cs:47-54``): ~10% PDF bytes (incl.
    an occasional image-only PDF exercising the metadata fallback), ~10%
    DOCX bytes (incl. tables and the " | " row rule), ~10% plain .txt.
    The ``text`` column stays the byte-exact expected extraction, so the
    parity contract becomes ``extract_any(url, payload) == text``.

    ``dup_rate`` (opt-in, default 0 keeps every existing corpus
    byte-identical) plants NEAR-DUPLICATE pages: a selected index
    republishes an earlier HTML page's main text under a new url — half
    verbatim, half with one appended filler paragraph (high-Jaccard
    near-dup) — wrapped in fresh boilerplate.  Selection and source
    choice are pure functions of (seed, page_idx), so distributed
    generation stays embarrassingly parallel; clone sources are always
    non-clone HTML indices, so every planted pair exists in the corpus.

    ``junk_rate`` (opt-in, default 0 keeps every existing corpus
    byte-identical) plants LOW-QUALITY pages — gibberish with no
    stopwords, sub-sentence fragments, punctuation noise — the classes
    the quality gate (operators/quality.py) must reject.  Junk takes
    precedence over clone selection, and clone sources skip junk
    indices, so a planted clone pair is always real content."""
    if _is_planted_junk(page_idx, seed, junk_rate):
        jrng = random.Random(((seed + 6) << 33) ^ (page_idx * 0xC2B2AE3D27D4EB4F))
        lang = "en"
        text = _junk_page_text(page_idx, seed)
        paras = text.split("\n\n")
        url = f"https://host-{page_idx % 997}.example/{lang}/doc-{page_idx}.html"
        payload = _render_html(jrng, url, lang, paras, page_idx).encode("utf-8")
        return {
            "url": url,
            "warc_ts": _BASE_TS + _dt.timedelta(seconds=137 * page_idx),
            "html": payload,
            "text": text,
            "lang": lang,
            "triples": [],
        }
    if _is_planted_clone(page_idx, seed, dup_rate):
        drng = random.Random(((seed + 2) << 33) ^ (page_idx * 0xC2B2AE3D27D4EB4F))
        src_idx = drng.randrange(_DUP_FLOOR, page_idx)
        # walk down to a non-clone HTML source (terminates: the floor
        # region never clones, and with mixed_formats 7 of 10 residues
        # are HTML)
        while (_is_planted_clone(src_idx, seed, dup_rate)
               or _is_planted_junk(src_idx, seed, junk_rate)
               or (mixed_formats and src_idx % 10 in (3, 7, 9))
               or src_idx < len(EDGE_TEXTS)):
            src_idx -= 1
            if src_idx < len(EDGE_TEXTS):
                src_idx = len(EDGE_TEXTS)
                while ((mixed_formats and src_idx % 10 in (3, 7, 9))
                       or _is_planted_junk(src_idx, seed, junk_rate)):
                    src_idx += 1
                break
        src = generate_page(src_idx, seed, min_sent, max_sent,
                            mixed_formats, dup_rate=0.0, zipf_s=zipf_s)
        lang = src["lang"]
        paras = src["text"].split("\n\n") if src["text"] else []
        if drng.random() < 0.5 and paras:
            paras = paras + [drng.choice(FILLER_SENTENCES[lang])]
        text = "\n\n".join(paras)
        url = f"https://host-{page_idx % 997}.example/{lang}/doc-{page_idx}.html"
        payload = _render_html(drng, url, lang, paras, page_idx).encode("utf-8")
        warc_ts = _BASE_TS + _dt.timedelta(seconds=137 * page_idx)
        return {
            "url": url,
            "warc_ts": warc_ts,
            "html": payload,
            "text": text,
            "lang": lang,
            "triples": src["triples"],
        }
    rng = random.Random((seed << 32) ^ page_idx)
    lang = "de" if rng.random() < 0.2 else "en"
    fmt = "html"
    if mixed_formats and page_idx >= len(EDGE_TEXTS):
        fmt = {3: "txt", 7: "pdf", 9: "docx"}.get(page_idx % 10, "html")
    url = f"https://host-{page_idx % 997}.example/{lang}/doc-{page_idx}.{fmt}"
    if page_idx < len(EDGE_TEXTS):
        text = EDGE_TEXTS[page_idx]
        triples: list[tuple[str, str, str, str, str]] = []
        paras = [text] if text else []
    else:
        sentences, triples = _page_sentences(rng, lang, min_sent, max_sent,
                                             zipf_s=zipf_s)
        paras = []
        i = 0
        while i < len(sentences):
            k = min(rng.randint(1, 3), len(sentences) - i)
            paras.append(" ".join(sentences[i:i + k]))
            i += k
        text = "\n\n".join(paras)

    if fmt == "pdf":
        from .kernels.extract import flatten_pdf
        from .kernels.fileformats import render_pdf

        if page_idx % 100 == 97:
            # image-only PDF: no text operators at all -> the extractor
            # must fall back to the /Info metadata block
            meta = {"Title": f"Scanned report {page_idx}",
                    "Producer": "synth-scanner"}
            payload = render_pdf([[]], meta, compress=page_idx % 2 == 0)
            text = flatten_pdf([""], meta)[1]
            triples = []
        else:
            meta = {"Title": f"doc {page_idx}", "Author": url.split("/")[2]}
            # split paragraphs over two pages when possible: flatten_pdf
            # joins page texts with "\n", and a paragraph break at the
            # page boundary reproduces the "\n\n"-joined text exactly
            lines = text.split("\n")
            if len(paras) >= 2:
                cut = lines.index("")  # first paragraph boundary
                page_lines = [lines[: cut + 1], lines[cut + 1:]]
            else:
                page_lines = [lines]
            payload = render_pdf(page_lines, meta, compress=page_idx % 2 == 0)
    elif fmt == "docx":
        from .kernels.fileformats import render_docx

        tables: list[list[list[str]]] = []
        if page_idx % 50 == 19:
            tables = [[["spec", f"value {page_idx}"],
                       ["status", "", "reviewed"]]]
        payload = render_docx(paras, tables)
        # flatten_docx output: paragraph lines, then " | "-joined rows
        # (empty cells dropped), blank line after each table, final trim
        lines = list(paras)
        for table in tables:
            for row in table:
                cells = [c for c in row if c.strip()]
                if cells:
                    lines.append(" | ".join(cells))
        text = "\n".join(lines)
    elif fmt == "txt":
        payload = text.encode("utf-8")
    else:
        payload = _render_html(rng, url, lang, paras, page_idx).encode("utf-8")

    warc_ts = _BASE_TS + _dt.timedelta(seconds=137 * page_idx)
    return {
        "url": url,
        "warc_ts": warc_ts,
        "html": payload,
        "text": text,
        "lang": lang,
        "triples": triples,
    }


PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string(), nullable=False),
        pa.field("warc_ts", pa.timestamp("us", tz="UTC"), nullable=False),
        pa.field("html", pa.binary(), nullable=False),
        pa.field("text", pa.string(), nullable=False),
        pa.field("lang", pa.string(), nullable=False),
    ]
)

TRIPLES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string(), nullable=False),
        pa.field("subj", pa.string(), nullable=False),
        pa.field("pred", pa.string(), nullable=False),
        pa.field("obj", pa.string(), nullable=False),
        pa.field("subj_canon", pa.string(), nullable=False),
        pa.field("obj_canon", pa.string(), nullable=False),
    ]
)


def generate_pages(
    n: int, seed: int = 42, start: int = 0,
    min_sent: int = 2, max_sent: int = 8,
    mixed_formats: bool = False, dup_rate: float = 0.0,
    junk_rate: float = 0.0, zipf_s: float = 1.2,
) -> tuple[pa.Table, pa.Table]:
    """Generate ``n`` pages -> (pages table, expected_triples table).

    ``min_sent``/``max_sent`` size the main-content block: the (2, 8)
    default keeps unit tests fast; the bench corpus uses (20, 60) so
    pages approximate real boilerplate-stripped web documents and the
    scaling measurement is compute-bound rather than overhead-bound."""
    cols: dict[str, list] = {k: [] for k in ("url", "warc_ts", "html", "text", "lang")}
    tcols: dict[str, list] = {k: [] for k in ("url", "subj", "pred", "obj",
                                              "subj_canon", "obj_canon")}
    for i in range(start, start + n):
        page = generate_page(i, seed, min_sent, max_sent, mixed_formats,
                             dup_rate=dup_rate, junk_rate=junk_rate,
                             zipf_s=zipf_s)
        for k in cols:
            cols[k].append(page[k])
        for (subj, pred, obj, sc, oc) in page["triples"]:
            tcols["url"].append(page["url"])
            tcols["subj"].append(subj)
            tcols["pred"].append(pred)
            tcols["obj"].append(obj)
            tcols["subj_canon"].append(sc)
            tcols["obj_canon"].append(oc)
    pages = pa.table(cols, schema=PAGES_SCHEMA)
    triples = pa.table(tcols, schema=TRIPLES_SCHEMA)
    return pages, triples


def write_corpus(out_dir: str, n: int, seed: int = 42,
                 batch_size: int = 100_000,
                 min_sent: int = 2, max_sent: int = 8,
                 mixed_formats: bool = False,
                 dup_rate: float = 0.0, junk_rate: float = 0.0,
                 zipf_s: float = 1.2) -> None:
    """Write ``pages.parquet``, ``expected_triples.parquet`` and
    ``aliases.parquet`` under ``out_dir`` (multi-row-group for parallel
    scan)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    pages_writer = pq.ParquetWriter(f"{out_dir}/pages.parquet", PAGES_SCHEMA)
    triples_writer = pq.ParquetWriter(f"{out_dir}/expected_triples.parquet", TRIPLES_SCHEMA)
    for start in range(0, n, batch_size):
        cnt = min(batch_size, n - start)
        pages, triples = generate_pages(cnt, seed=seed, start=start,
                                        min_sent=min_sent, max_sent=max_sent,
                                        mixed_formats=mixed_formats,
                                        dup_rate=dup_rate,
                                        junk_rate=junk_rate, zipf_s=zipf_s)
        pages_writer.write_table(pages, row_group_size=min(cnt, 20_000))
        triples_writer.write_table(triples)
    pages_writer.close()
    triples_writer.close()

    aliases = pa.table(
        {
            "alias": list(ALIASES.keys()),
            "entity": list(ALIASES.values()),
        }
    )
    pq.write_table(aliases, f"{out_dir}/aliases.parquet")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("-n", type=int, default=10_000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--dup-rate", type=float, default=0.0,
                    help="fraction of pages planted as near-duplicate clones")
    ap.add_argument("--junk-rate", type=float, default=0.0,
                    help="fraction of pages planted as low-quality junk")
    ap.add_argument("--zipf-s", type=float, default=1.2,
                    help="Zipf exponent for subject-entity skew")
    args = ap.parse_args()
    write_corpus(args.out_dir, args.n, args.seed, dup_rate=args.dup_rate,
                 junk_rate=args.junk_rate, zipf_s=args.zipf_s)
    print(f"wrote {args.n} pages to {args.out_dir}")
