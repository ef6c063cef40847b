"""Golden tests for the pure-Python kernel ports — the
"TextChunkingServiceTests / DocumentProcessing" suite demanded by the
north_star, encoding the exact semantics of the cited reference routines.
"""

import pytest

from driftmind_spark.kernels import textproc as tp


# ---- sentence splitting (TextChunkingService.cs:52-78) ----------------------

@pytest.mark.parametrize(
    "text,expected",
    [
        ("Hello world. Second one!", ["Hello world.", "Second one!"]),
        # dot not followed by whitespace is NOT a boundary
        ("a.b is one sentence.", ["a.b is one sentence."]),
        # terminator at end-of-text closes the sentence
        ("End.", ["End."]),
        ("No terminator at all", ["No terminator at all"]),
        ("One. Two! Three? Four", ["One.", "Two!", "Three?", "Four"]),
        ("", []),
        ("   ", []),
        ("?. !", ["?.", "!"]),
        ("Tabs\tstay. Next.", ["Tabs\tstay.", "Next."]),
        # regex-splitter edge cases (round 9: the per-char loop became a
        # compiled boundary scan — these pin the exact equivalences the
        # differential fuzz relied on):
        # $ vs \Z: a '?' before a trailing newline fires via the
        # whitespace LOOKAHEAD, not the end-anchor — exactly once
        ("Really?\n", ["Really?"]),
        # run of terminators: the run stays inside the sentence until a
        # terminator is followed by whitespace/EOF
        ("Wait...done. Next.", ["Wait...done.", "Next."]),
        ("Wait... Done.", ["Wait...", "Done."]),
        # .NET-specific whitespace (NBSP, ideographic space) counts as a
        # boundary successor and is trimmed from the pieces
        ("A.\xa0B.", ["A.", "B."]),
        ("A.\u3000B", ["A.", "B"]),
        # whitespace-only piece between boundaries is dropped
        ("A. \t . B.", ["A.", ".", "B."]),
        ("!", ["!"]),
    ],
)
def test_split_into_sentences(text, expected):
    assert tp.split_into_sentences(text) == expected


# ---- chunking (TextChunkingService.cs:10-50) --------------------------------

def test_chunk_empty_and_whitespace():
    assert tp.chunk_text("") == []
    assert tp.chunk_text("   \t\n") == []
    assert tp.chunk_text(None) == []


def test_chunk_single_short_sentence():
    assert tp.chunk_text("Hello world.") == ["Hello world."]


def test_chunk_single_oversize_sentence_kept_whole():
    s = "x" * 500 + " end."
    assert tp.chunk_text(s, chunk_size=300) == [s]


def test_chunk_overlap_two_words():
    # default overlap=20 -> 20//10 = 2 seed words from the previous chunk
    text = "Alpha beta gamma delta. Epsilon zeta eta theta. Iota kappa lambda mu."
    chunks = tp.chunk_text(text, chunk_size=30, overlap=20)
    assert chunks[0] == "Alpha beta gamma delta."
    # next chunk seeded with last 2 words of previous
    assert chunks[1].startswith("gamma delta. Epsilon")


def test_chunk_overlap_zero():
    text = "Alpha beta gamma delta. Epsilon zeta eta theta."
    chunks = tp.chunk_text(text, chunk_size=25, overlap=0)
    assert chunks == ["Alpha beta gamma delta.", "Epsilon zeta eta theta."]


def test_chunk_overlap_larger_than_words():
    # overlap//10 capped at word count
    text = "Word. " + "y" * 28 + "."
    chunks = tp.chunk_text(text, chunk_size=10, overlap=100)
    assert chunks[0] == "Word."
    assert chunks[1].startswith("Word. ")  # all 1 word re-seeded


def test_chunk_exact_boundary_not_split():
    # len(current)+len(sentence) == chunk_size is NOT > chunk_size
    s1 = "a" * 10 + "."  # 11 chars -> current becomes 12 chars with space
    s2 = "b" * 7 + "."  # 8 chars; 12+8 = 20 == chunk_size -> packed together
    chunks = tp.chunk_text(f"{s1} {s2}", chunk_size=20, overlap=0)
    assert chunks == [f"{s1} {s2}"]


def test_chunk_concatenation_covers_text():
    text = ("Spark executes queries lazily. Catalyst optimizes logical plans. "
            "Tungsten generates compact bytecode. Shuffles move data between "
            "stages. Partitions bound parallelism.")
    chunks = tp.chunk_text(text, chunk_size=60, overlap=20)
    joined = " ".join(chunks)
    for sentence in tp.split_into_sentences(text):
        assert sentence in joined


# ---- normalization (EmbeddingService.cs:95-104) ------------------------------

@pytest.mark.parametrize(
    "raw,expected",
    [
        ("  Hello World  ", "hello world"),
        ("A  B", "a b"),
        ("A   B", "a  b"),  # single-pass double-space replace, ported as-is
        ("line1\nline2", "line1 line2"),
        ("tab\there", "tab here"),
        ("cr\r\nend", "cr end"),
    ],
)
def test_normalize_for_caching(raw, expected):
    assert tp.normalize_for_caching(raw) == expected


# ---- meaningful terms + relevance (RelevanceAnalyzer.cs:59-152) ---------------

def test_extract_meaningful_terms_filters_stopwords_and_short():
    terms = tp.extract_meaningful_terms("The database is on a fast disk")
    assert terms == ["database", "fast", "disk"]


def test_extract_meaningful_terms_distinct_order():
    terms = tp.extract_meaningful_terms("alpha beta alpha gamma beta")
    assert terms == ["alpha", "beta", "gamma"]


def test_relevance_no_query_terms_returns_vector():
    assert tp.calculate_relevance_score("anything", "the and or", 0.42) == 0.42
    assert tp.calculate_relevance_score("anything", "the and or") == 0.0


def test_relevance_exact_match_full_score():
    # all query terms exact -> 2*n / 2*n = 1.0 text relevance
    assert tp.calculate_relevance_score("database disk", "database disk") == 1.0


def test_relevance_blend():
    score = tp.calculate_relevance_score("database disk", "database disk", 0.5)
    assert score == pytest.approx(0.5 * 0.7 + 1.0 * 0.3)


def test_relevance_synonym_match():
    # "datenbank" <-> "database" both directions in the reference's synonym
    # table; RelevanceAnalyzer.CountSynonymMatches (:104-140) counts each
    # direction independently -> 2 matches * 1.5 / 2.0, capped at 1.0
    s = tp.calculate_relevance_score("the datenbank crashed", "database")
    assert s == pytest.approx(1.0)
    # one-directional case: "lokal" is a synonym OF "sqlite" (content side
    # only) -> single match 1.5/2.0
    s2 = tp.calculate_relevance_score("the sqlite crashed", "lokal")
    assert s2 == pytest.approx(0.75)


def test_relevance_partial_match():
    # query term is substring of content but not a whole word
    s = tp.calculate_relevance_score("the databases crashed", "database")
    # exact=0 (no whole-word "database"), partial=1, synonym: "datenbank"? no.
    # content term "databases" not in synonym dict -> 1.0/2.0
    assert s == pytest.approx(0.5)


# ---- keyword helpers (TextProcessingHelper.cs, ChatHistoryAnalyzer.cs) --------

def test_extract_keywords_filters_follow_up_words():
    kws = tp.extract_keywords("please explain more about spark partitions")
    assert "please" not in kws and "explain" not in kws
    assert "spark" in kws and "partitions" in kws


def test_extract_history_keywords_decay():
    msgs = ["spark spark shuffling", "catalyst optimizer", "tungsten codegen"]
    kws = tp.extract_history_keywords(msgs, max_keywords=8)
    # newest message weight 1.0, older 0.7, oldest 0.49
    assert kws[0] in ("tungsten", "codegen")


def test_jaccard_keyword_similarity():
    assert tp.jaccard_keyword_similarity(
        "spark shuffle partitions", "spark shuffle memory"
    ) == pytest.approx(2 / 4)
    assert tp.jaccard_keyword_similarity("", "") == 0.0


# ---- follow-up classifier (FollowUpQuestionAnalyzer.cs:35-75) -----------------

@pytest.mark.parametrize(
    "query,expected",
    [
        ("more", True),  # short
        ("tell me", True),  # <= 2 words
        ("what is the recommended storage layout for iceberg", False),
        ("give me more details about it", True),  # pattern
        ("how so", True),  # < 10 chars
        ("unrelated sentence with no trigger wording at all", False),
        ("", False),
    ],
)
def test_is_follow_up(query, expected):
    assert tp.is_follow_up_question(query) is expected


# ---- cosine (FollowUpQuestionAnalyzer.cs:80-98) -------------------------------

def test_cosine():
    assert tp.cosine_similarity([1, 0], [1, 0]) == 1.0
    assert tp.cosine_similarity([1, 0], [0, 1]) == 0.0
    assert tp.cosine_similarity([1, 0], [1, 0, 0]) == 0.0  # dim mismatch
    assert tp.cosine_similarity([0, 0], [1, 1]) == 0.0  # zero norm


# ---- truncation (DocumentManagementService.cs:128-142) ------------------------

def test_truncate_short_content_unchanged():
    assert tp.truncate_content("short", 150) == "short"


def test_truncate_at_word_boundary():
    content = "word " * 40  # 200 chars
    out = tp.truncate_content(content, 150)
    assert out.endswith("...")
    assert len(out) <= 153
    assert not out[:-3].endswith(" wor")  # cut at boundary


def test_truncate_no_space_in_last_20pct():
    content = "a" * 200
    assert tp.truncate_content(content, 150) == "a" * 150 + "..."


# ---- MIME map + sanitizers (DocumentProcessingService.cs:572-729) -------------

@pytest.mark.parametrize(
    "name,expected",
    [
        ("report.PDF", "application/pdf"),
        ("notes.md", "text/markdown"),
        ("data.unknown", "application/octet-stream"),
        ("x.docx",
         "application/vnd.openxmlformats-officedocument.wordprocessingml.document"),
        ("server.log", "text/plain"),
    ],
)
def test_mime_map(name, expected):
    assert tp.get_correct_content_type(name) == expected


def test_mime_fallback_client_type():
    assert tp.get_correct_content_type("f.bin", "application/x-foo") == "application/x-foo"


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("Über druck/report 2024?.pdf", "Ueber_druck_report_2024_.pdf"),
        ("ä ö ü Ä Ö Ü ß", "ae_oe_ue_Ae_Oe_Ue_ss"),
        ("___x___", "x"),
        ("", "unknown_file"),
        ("???", "sanitized_file"),
        ("日本語.txt", ".txt"),  # non-ASCII -> '_', collapsed, then trimmed
        ("a  b", "a_b"),
    ],
)
def test_sanitize_file_name(raw, expected):
    assert tp.sanitize_file_name(raw) == expected


def test_sanitize_metadata_value():
    assert tp.sanitize_metadata_value("Größe 10µ") == "Groesse 10"
    assert tp.sanitize_metadata_value(None) == ""
