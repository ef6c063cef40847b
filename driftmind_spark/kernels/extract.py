"""Text-extraction kernels (pure Python, executor-importable).

Behavioral ports of the reference's extractor stage
(``Services/FileProcessingService.cs:39-271``) generalized to the
north-rule input: Common-Crawl-style pages ``(url, warc_ts, html, text,
lang)``.  The contract (BASELINE.json ``input_hint``) is *byte-identical
extracted text per url*: ``extract_main_text(html) == text`` for every
synthesized page.

The HTML path is a trafilatura-equivalent boilerplate stripper: drop
``script``/``style``/``nav``/``header``/``footer``/``aside`` and ad
containers, locate the main-content region (``<main>``/``<article>``),
and emit its paragraph text with entities unescaped.
"""

from __future__ import annotations

import re

from .textproc import get_extension, is_null_or_whitespace, net_trim

# ---------------------------------------------------------------------------
# HTML boilerplate stripping (the S4-equivalent for web pages)
# ---------------------------------------------------------------------------

# Elements whose entire subtree is boilerplate (trafilatura's discard list,
# reduced to what deterministic template pages can contain).
_DISCARD_BLOCK_RE = re.compile(
    r"<(script|style|nav|header|footer|aside|form|noscript)\b.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_DISCARD_CLASS_RE = re.compile(
    r'<div\b[^>]*class="[^"]*\b(ads?|banner|cookie|sidebar|promo|related)\b[^"]*"[^>]*>.*?</div\s*>',
    re.IGNORECASE | re.DOTALL,
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_MAIN_RE = re.compile(r"<(main|article)\b[^>]*>(.*?)</\1\s*>", re.IGNORECASE | re.DOTALL)
_P_RE = re.compile(r"<(p|h[1-6]|li|blockquote)\b[^>]*>(.*?)</\1\s*>", re.IGNORECASE | re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")


def unescape_html(s: str) -> str:
    """Inverse of :func:`escape_html`; `&amp;` handled last so escaping is
    bijective."""
    return (
        s.replace("&lt;", "<")
        .replace("&gt;", ">")
        .replace("&quot;", '"')
        .replace("&#39;", "'")
        .replace("&amp;", "&")
    )


def escape_html(s: str) -> str:
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
    )


def extract_main_text(html: bytes | str | None) -> str:
    """Strip boilerplate from an HTML page and return the main content.

    Paragraph-level blocks (`p`, headings, `li`, `blockquote`) inside the
    main region are emitted in document order, joined by a blank line —
    the same joined-lines discipline as the reference's PDF page join
    (``Services/FileProcessingService.cs:113-121``) but paragraph-scoped.
    """
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray)):
        raw = bytes(html).decode("utf-8", errors="replace")
    else:
        raw = html
    raw = _COMMENT_RE.sub("", raw)
    raw = _DISCARD_BLOCK_RE.sub("", raw)
    raw = _DISCARD_CLASS_RE.sub("", raw)
    m = _MAIN_RE.search(raw)
    region = m.group(2) if m else raw
    paras: list[str] = []
    for pm in _P_RE.finditer(region):
        inner = _TAG_RE.sub("", pm.group(2))
        text = unescape_html(inner)
        if not is_null_or_whitespace(text):
            paras.append(text)
    return "\n\n".join(paras)


# ---------------------------------------------------------------------------
# Plain text / Markdown (Services/FileProcessingService.cs:63-90)
# ---------------------------------------------------------------------------


def extract_plain_text(data: bytes | None) -> tuple[bool, str, str]:
    """Port of ``ExtractTextFromPlainTextAsync``: UTF-8 read (BOM honored,
    as .NET StreamReader does), whitespace-only input is an error."""
    if data is None:
        return False, "", "The text file is empty or contains only whitespace."
    text = bytes(data).decode("utf-8-sig", errors="replace")
    if is_null_or_whitespace(text):
        return False, "", "The text file is empty or contains only whitespace."
    return True, text, ""


# ---------------------------------------------------------------------------
# DOCX behavioral kernel (Services/FileProcessingService.cs:204-271)
#
# OpenXml is not available in this environment; the kernel operates on the
# already-parsed structure (paragraph strings + table row-cell matrices) and
# reproduces the reference's flattening exactly: paragraph lines, table rows
# joined " | ", a blank line after each table, final trim.
# ---------------------------------------------------------------------------


def flatten_docx(
    paragraphs: list[str], tables: list[list[list[str]]]
) -> tuple[bool, str, str]:
    lines: list[str] = []
    for p in paragraphs:
        if not is_null_or_whitespace(p):
            lines.append(p)
    for table in tables:
        for row in table:
            row_texts = [net_trim(c) for c in row if c is not None]
            row_texts = [c for c in row_texts if not is_null_or_whitespace(c)]
            if row_texts:
                lines.append(" | ".join(row_texts))
        lines.append("")  # spacing after table
    extracted = net_trim("\n".join(lines) + ("\n" if lines else ""))
    if is_null_or_whitespace(extracted):
        return False, "", "No text could be extracted from the Word document."
    return True, extracted, ""


# ---------------------------------------------------------------------------
# PDF behavioral kernel (Services/FileProcessingService.cs:92-202)
#
# Operates on per-page text plus a metadata dict, reproducing the page-join
# and the metadata fallback for image-only documents.
# ---------------------------------------------------------------------------

_PDF_META_ORDER = (
    ("Title", "Title"),
    ("Author", "Author"),
    ("Subject", "Subject"),
    ("Keywords", "Keywords"),
    ("Creator", "Creator"),
    ("Producer", "Producer"),
    ("CreationDate", "Created"),
    ("ModifiedDate", "Modified"),
)


def flatten_pdf(pages: list[str], metadata: dict | None = None) -> tuple[bool, str, str]:
    buf: list[str] = []
    for page_text in pages:
        if not is_null_or_whitespace(page_text):
            buf.append(page_text)
    extracted = net_trim("\n".join(buf) + ("\n" if buf else ""))
    if not is_null_or_whitespace(extracted):
        return True, extracted, ""
    meta = metadata or {}
    mlines: list[str] = []
    for key, label in _PDF_META_ORDER:
        val = meta.get(key)
        if val is not None and not is_null_or_whitespace(str(val)):
            mlines.append(f"{label}: {val}")
    mlines.append(f"Pages: {len(pages)}")
    mlines.append(
        "Note: This PDF contains no extractable text. "
        "It may consist primarily of images or scanned pages."
    )
    meta_text = net_trim("\n".join(mlines))
    if not is_null_or_whitespace(meta_text):
        return True, meta_text, ""
    return False, "", (
        "This PDF contains no extractable text. It may consist primarily of "
        "images or scanned pages. To process such PDFs, OCR (Optical Character "
        "Recognition) functionality would be required, which is not currently "
        "implemented."
    )


# ---------------------------------------------------------------------------
# Dispatch (Services/FileProcessingService.cs:47-54)
# ---------------------------------------------------------------------------

SUPPORTED_EXTENSIONS = (".txt", ".md", ".pdf", ".docx")


def is_file_type_supported(file_name: str) -> bool:
    """Port of ``FileProcessingService.IsFileTypeSupported``
    (Services/FileProcessingService.cs:28-32)."""
    return get_extension(file_name) in SUPPORTED_EXTENSIONS


def is_file_size_valid(size_bytes: int, max_bytes: int = 3 * 1024 * 1024) -> bool:
    """Port of ``FileProcessingService.IsFileSizeValid``
    (Services/FileProcessingService.cs:34-37, appsettings.json:26)."""
    return 0 < size_bytes <= max_bytes


def extract_pdf_bytes(payload: bytes) -> tuple[bool, str, str]:
    """Real PDF byte-stream extraction (Services/FileProcessingService.cs:
    92-202): parse pages + /Info metadata from the bytes, then apply the
    reference's page-join and image-only metadata fallback."""
    from .fileformats import parse_pdf

    try:
        pages, metadata = parse_pdf(bytes(payload))
    except Exception as exc:  # malformed bytes -> reference-style error
        return False, "", f"Error processing PDF: {exc}"
    return flatten_pdf(pages, metadata)


def extract_docx_bytes(payload: bytes) -> tuple[bool, str, str]:
    """Real DOCX byte-stream extraction (Services/FileProcessingService.cs:
    204-271): unzip word/document.xml, read body paragraphs and tables,
    then apply the reference's flattening (" | " table rows)."""
    from .fileformats import parse_docx

    try:
        paragraphs, tables = parse_docx(bytes(payload))
    except Exception as exc:
        return False, "", f"Error processing Word document: {exc}"
    return flatten_docx(paragraphs, tables)


def extract_text(url: str, payload: bytes) -> tuple[bool, str, str]:
    """Extension-dispatched extraction, mirroring the reference's switch
    (Services/FileProcessingService.cs:47-54) with the web-page HTML path
    added for the north-rule input."""
    ext = get_extension(url)
    if ext in (".txt", ".md"):
        return extract_plain_text(payload)
    if ext == ".pdf":
        return extract_pdf_bytes(payload)
    if ext == ".docx":
        return extract_docx_bytes(payload)
    if ext in (".html", ".htm", ""):
        text = extract_main_text(payload)
        if is_null_or_whitespace(text):
            return False, "", "No main content found in page."
        return True, text, ""
    return False, "", f"Unsupported file type: {ext}"


def extract_any(url: str, payload: bytes | str | None) -> str:
    """The pipeline's extraction entry point: dispatch on the url's
    extension (real PDF/DOCX/TXT byte parsing), defaulting to the HTML
    boilerplate stripper; failures yield "" (empty pages chunk to
    nothing downstream, the P7 guard)."""
    ext = get_extension(url)
    if ext in (".txt", ".md", ".pdf", ".docx"):
        data = payload.encode("utf-8") if isinstance(payload, str) else payload
        ok, text, _err = extract_text(url, data)
        return text if ok else ""
    return extract_main_text(payload)
