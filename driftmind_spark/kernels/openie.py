"""Batched dependency-pattern OpenIE kernel (pure Python, deterministic).

The K1 operator from SURVEY.md §2.11: sentence-level verb-phrase pattern
extraction over the closed predicate lexicon (``vocab.PREDICATES``).  This
module is *also* the reference-semantics single-node extractor used by the
P/R gate (BASELINE.md): the Spark pipeline wraps exactly this kernel in a
vectorized pandas UDF, and the test harness runs the kernel standalone on
the same pages — emitted (subj, pred, obj) sets must match at P/R >= 0.95.

No external NLP dependencies (spacy/nltk unavailable in the sandbox); the
"dependency pattern" is a verb-phrase anchor with entity-shaped argument
validation, which is exact on the closed-vocabulary synthetic corpus and
conservative (precision-first) on arbitrary text.
"""

from __future__ import annotations

import re

from .textproc import _NET_WHITESPACE_STR, net_trim, split_into_sentences
from .vocab import PREDICATES

# Verb phrases sorted longest-first per language so the longest anchor wins
# (e.g. "is headquartered in" before any shorter overlap).
_PHRASES: dict[str, list[tuple[str, str]]] = {}
for _pred, _by_lang in PREDICATES.items():
    for _lang, _phrase in _by_lang.items():
        _PHRASES.setdefault(_lang, []).append((_phrase, _pred))
for _lang in _PHRASES:
    _PHRASES[_lang].sort(key=lambda t: -len(t[0]))

# Hot-loop variant of the same table, precomputed once at import: the
# padded " phrase " anchor (the per-sentence f-string concat was a
# measurable cost at ~7 phrase probes per sentence).
_ANCHORS: dict[str, list[tuple[str, str]]] = {
    lang: [(f" {phrase} ", pred) for phrase, pred in pairs]
    for lang, pairs in _PHRASES.items()
}

# An entity-shaped argument: 1..6 capitalized/acronym/initial tokens,
# allowing connectors like "&", hyphens, dots ("Quasar A.I.", "A. Turing").
_ENTITY_RE = re.compile(
    r"^[A-ZÄÖÜ0-9][\w&.\-']*(?:[ \-][A-ZÄÖÜa-zäöü0-9][\w&.\-']*){0,5}$",
    re.UNICODE,
)

# Trailing temporal/locative adjuncts stripped from the object.
_ADJUNCT_RE = re.compile(
    r"\s+(?:in|im Jahr|during|back in|early in)\s+(?:\w+\s+)?\d{4}$",
    re.IGNORECASE,
)

_TRAIL_PUNCT = ".!?,;: "


# First characters _ENTITY_RE can accept.  The cleaned argument's first
# character is the first non-whitespace character remaining after the
# trailing strips (the adjunct sub and final trim only shorten the tail
# or strip whitespace), so a cheap first-char test rejects most
# non-entity arguments before any regex runs.
_ENTITY_FIRST = frozenset("ABCDEFGHIJKLMNOPQRSTUVWXYZÄÖÜ0123456789")


def _clean_argument(arg: str) -> str | None:
    arg = net_trim(arg).strip(_TRAIL_PUNCT)
    head = arg.lstrip(_NET_WHITESPACE_STR)
    if not head or head[0] not in _ENTITY_FIRST:
        return None
    arg = _ADJUNCT_RE.sub("", arg)
    arg = net_trim(arg)
    if not arg or len(arg) > 64:
        return None
    if not _ENTITY_RE.match(arg):
        return None
    return arg


def extract_triples_from_sentence(
    sentence: str, lang: str = "en"
) -> list[tuple[str, str, str, float]]:
    """Extract ``(subj, pred, obj, conf)`` tuples from one sentence."""
    anchors = _ANCHORS.get(lang) or _ANCHORS["en"]
    for anchor, pred in anchors:
        idx = sentence.find(anchor)
        if idx <= 0:
            continue
        subj = _clean_argument(sentence[:idx])
        if subj is None:
            continue
        obj = _clean_argument(sentence[idx + len(anchor):])
        if obj is None:
            continue
        # longest-anchor-wins; one triple per sentence by construction
        return [(subj, pred, obj, 0.9)]
    return []


def extract_triples(text: str | None, lang: str = "en") -> list[tuple[str, str, str, float]]:
    """K1: triples from a whole document (sentence split shared with the
    chunker so both stages see identical sentence boundaries)."""
    if not text:
        return []
    triples: list[tuple[str, str, str, float]] = []
    for sentence in split_into_sentences(text):
        triples.extend(extract_triples_from_sentence(sentence, lang))
    return triples
