r"""Byte-level PDF and DOCX codecs (pure stdlib, executor-importable).

The reference extracts text from REAL file bytes — PDF via PdfPig
(``Services/FileProcessingService.cs:92-202``) and DOCX via OpenXml
(``:204-271``).  PdfPig/OpenXml obviously don't exist here, so this
module implements the minimal byte-level subset those code paths
consume, from the public PDF 1.7 / OOXML specs:

- ``parse_pdf``: object scanner (``N 0 obj … endobj``), /Pages /Kids
  page ordering, content streams (raw or /FlateDecode via zlib), BT/ET
  text blocks with Tj / TJ / ' show operators, literal-string escapes
  (\\, \(, \), \n, octal) and UTF-16BE text strings, and the trailer
  /Info dictionary (Title/Author/… for the image-only metadata
  fallback the reference implements at :146-180).
- ``parse_docx``: zip + ``word/document.xml`` → body paragraphs and
  tables (rows × cells), the exact inputs ``flatten_docx`` consumes.
- ``render_pdf`` / ``render_docx``: deterministic generators for the
  synthesizer (fixed xref layout, stored zip entries, epoch timestamps)
  so golden byte-parity tests can assert parse(render(x)) == x.
"""

from __future__ import annotations

import io
import re
import zipfile
import zlib

# ---------------------------------------------------------------------------
# PDF string codec
# ---------------------------------------------------------------------------

_PDF_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _decode_pdf_string(body: bytes) -> str:
    """Literal string bytes (between parens, escapes unresolved) -> str.
    UTF-16BE with BOM per the PDF text-string type; else PDFDoc≈latin-1."""
    out = bytearray()
    i = 0
    while i < len(body):
        c = body[i:i + 1]
        if c == b"\\" and i + 1 < len(body):
            nxt = body[i + 1:i + 2]
            if nxt in _PDF_ESCAPES:
                out += _PDF_ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal \d{1,3}
                j = i + 1
                while j < len(body) and j < i + 4 and body[j:j + 1].isdigit():
                    j += 1
                out.append(int(body[i + 1:j], 8) & 0xFF)
                i = j
                continue
            if nxt == b"\n":  # line continuation
                i += 2
                continue
            out += nxt
            i += 2
            continue
        out += c
        i += 1
    raw = bytes(out)
    if raw.startswith(b"\xfe\xff"):
        return raw[2:].decode("utf-16-be", errors="replace")
    return raw.decode("latin-1")


def _encode_pdf_string(s: str) -> bytes:
    """str -> literal string bytes incl. parens; latin-1 when it fits,
    else UTF-16BE with BOM (the spec's text-string alternative)."""
    try:
        raw = s.encode("latin-1")
    except UnicodeEncodeError:
        raw = b"\xfe\xff" + s.encode("utf-16-be")
    raw = raw.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
    raw = raw.replace(b"\n", b"\\n").replace(b"\r", b"\\r")
    return b"(" + raw + b")"


# ---------------------------------------------------------------------------
# PDF parsing
# ---------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_REF_RE = re.compile(rb"/(\w+)\s+(\d+)\s+\d+\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[(.*?)\]", re.DOTALL)
_NUM_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_META_KEY_RE = re.compile(rb"/(\w+)\s*\(")
_SHOW_RE = re.compile(
    rb"\((?P<s>(?:\\.|[^\\()])*)\)\s*(?P<op>Tj|')"
    rb"|\[(?P<arr>(?:\\.|[^\]])*)\]\s*TJ"
    rb"|(?P<nl>T\*|Td|TD)",
    re.DOTALL,
)
_ARR_STR_RE = re.compile(rb"\((?:\\.|[^\\()])*\)", re.DOTALL)


def _content_text(stream: bytes) -> str:
    """BT/ET text content: each Tj/TJ/' emits onto the current line;
    T*/Td/TD start a new line (PdfPig's reading-order analog for the
    single-column pages this engine handles)."""
    lines: list[str] = []
    cur: list[str] = []
    for m in _SHOW_RE.finditer(stream):
        if m.group("nl") is not None:
            if cur or lines:
                lines.append("".join(cur))
                cur = []
            continue
        if m.group("op") == b"'":  # ' = newline + show
            lines.append("".join(cur))
            cur = []
        if m.group("arr") is not None:
            for sm in _ARR_STR_RE.finditer(m.group("arr")):
                cur.append(_decode_pdf_string(sm.group(0)[1:-1]))
        elif m.group("s") is not None:
            cur.append(_decode_pdf_string(m.group("s")))
    if cur:
        lines.append("".join(cur))
    # the first Td after BT positions the first line, not a break: drop a
    # leading empty line artifact
    if lines and lines[0] == "":
        lines = lines[1:]
    return "\n".join(lines)


def parse_pdf(data: bytes) -> tuple[list[str], dict]:
    """PDF bytes -> (per-page text, /Info metadata dict).

    Supports uncompressed and FlateDecode content streams; page order
    from /Pages /Kids (object order fallback)."""
    objs: dict[int, bytes] = {
        int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(data)
    }
    if not objs:
        raise ValueError("no PDF objects found")

    def stream_of(body: bytes) -> bytes | None:
        sm = _STREAM_RE.search(body)
        if sm is None:
            return None
        raw = sm.group(1)
        if b"/FlateDecode" in body[: sm.start()]:
            raw = zlib.decompress(raw)
        return raw

    # page objects in /Kids order when a /Pages node exists
    page_ids = []
    for num, body in sorted(objs.items()):
        if b"/Type" in body and b"/Pages" in body and b"/Kids" in body:
            km = _KIDS_RE.search(body)
            if km:
                page_ids = [int(m.group(1)) for m in _NUM_REF_RE.finditer(km.group(1))]
            break
    if not page_ids:
        page_ids = [
            num for num, body in sorted(objs.items())
            if b"/Type" in body and b"/Page" in body and b"/Pages" not in body
        ]

    pages: list[str] = []
    for pid in page_ids:
        body = objs.get(pid, b"")
        content = b""
        refs = dict(
            (m.group(1).decode(), int(m.group(2)))
            for m in _REF_RE.finditer(body)
        )
        if "Contents" in refs:
            content = stream_of(objs.get(refs["Contents"], b"")) or b""
        else:
            content = stream_of(body) or b""
        pages.append(_content_text(content))

    # trailer /Info
    meta: dict = {}
    tm = re.search(rb"/Info\s+(\d+)\s+\d+\s+R", data)
    if tm and int(tm.group(1)) in objs:
        info = objs[int(tm.group(1))]
        for km in _META_KEY_RE.finditer(info):
            start = km.end() - 1
            sm = re.match(rb"\((?:\\.|[^\\()])*\)", info[start:], re.DOTALL)
            if sm:
                meta[km.group(1).decode()] = _decode_pdf_string(sm.group(0)[1:-1])
    return pages, meta


def render_pdf(
    page_lines: list[list[str]], metadata: dict | None = None,
    compress: bool = False,
) -> bytes:
    """Deterministic minimal PDF: one content stream per page, Helvetica,
    one Tj per line with T* line advances.  ``parse_pdf(render_pdf(x))``
    round-trips the text exactly."""
    metadata = metadata or {}
    objs: list[bytes] = []  # bodies, object number = index + 1

    n_pages = len(page_lines)
    page_obj_base = 4  # 1=catalog, 2=pages, 3=font
    content_obj_base = page_obj_base + n_pages

    kids = " ".join(f"{page_obj_base + i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )  # 2
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")  # 3
    for i in range(n_pages):
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 3 0 R >> >> "
                f"/Contents {content_obj_base + i} 0 R >>"
            ).encode()
        )
    for lines in page_lines:
        parts = [b"BT /F1 12 Tf 14 TL 72 720 Td"]
        for j, line in enumerate(lines):
            if j > 0:
                parts.append(b"T*")
            parts.append(_encode_pdf_string(line) + b" Tj")
        parts.append(b"ET")
        content = b"\n".join(parts)
        if compress:
            content = zlib.compress(content)
            head = b"<< /Filter /FlateDecode /Length %d >>" % len(content)
        else:
            head = b"<< /Length %d >>" % len(content)
        objs.append(head + b"\nstream\n" + content + b"\nendstream")
    info_num = None
    if metadata:
        entries = b" ".join(
            b"/" + k.encode() + b" " + _encode_pdf_string(str(v))
            for k, v in metadata.items()
        )
        objs.append(b"<< " + entries + b" >>")
        info_num = len(objs)

    buf = io.BytesIO()
    buf.write(b"%PDF-1.4\n")
    offsets = []
    for num, body in enumerate(objs, start=1):
        offsets.append(buf.tell())
        buf.write(f"{num} 0 obj\n".encode() + body + b"\nendobj\n")
    xref_at = buf.tell()
    buf.write(f"xref\n0 {len(objs) + 1}\n".encode())
    buf.write(b"0000000000 65535 f \n")
    for off in offsets:
        buf.write(f"{off:010d} 00000 n \n".encode())
    trailer = f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R"
    if info_num:
        trailer += f" /Info {info_num} 0 R"
    trailer += f" >>\nstartxref\n{xref_at}\n%%EOF"
    buf.write(trailer.encode())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# DOCX parsing / rendering
# ---------------------------------------------------------------------------

_W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"


def parse_docx(data: bytes) -> tuple[list[str], list[list[list[str]]]]:
    """DOCX bytes -> (body paragraphs, tables as row×cell text) — the
    exact inputs ``extract.flatten_docx`` consumes (the reference reads
    Body paragraphs and tables separately, FileProcessingService.cs:
    214-246)."""
    import xml.etree.ElementTree as ET

    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        xml_bytes = zf.read("word/document.xml")
    root = ET.fromstring(xml_bytes)
    w = f"{{{_W_NS}}}"
    body = root.find(f"{w}body")
    paragraphs: list[str] = []
    tables: list[list[list[str]]] = []
    if body is None:
        return paragraphs, tables

    def para_text(p) -> str:
        return "".join(t.text or "" for t in p.iter(f"{w}t"))

    for el in body:
        if el.tag == f"{w}p":
            paragraphs.append(para_text(el))
        elif el.tag == f"{w}tbl":
            rows = []
            for tr in el.findall(f"{w}tr"):
                cells = []
                for tc in tr.findall(f"{w}tc"):
                    cells.append(
                        "\n".join(para_text(p) for p in tc.findall(f"{w}p"))
                    )
                rows.append(cells)
            tables.append(rows)
    return paragraphs, tables


_DOCX_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType='
    '"application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    "</Types>"
)
_DOCX_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>'
    "</Relationships>"
)


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def render_docx(
    paragraphs: list[str], tables: list[list[list[str]]] | None = None
) -> bytes:
    """Deterministic minimal DOCX (stored zip entries, epoch timestamps):
    ``parse_docx(render_docx(p, t))`` round-trips exactly."""
    tables = tables or []
    parts = [f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
             f'<w:document xmlns:w="{_W_NS}"><w:body>']
    for p in paragraphs:
        parts.append(
            f'<w:p><w:r><w:t xml:space="preserve">{_xml_escape(p)}</w:t>'
            "</w:r></w:p>"
        )
    for table in tables:
        parts.append("<w:tbl>")
        for row in table:
            parts.append("<w:tr>")
            for cell in row:
                parts.append(
                    f'<w:tc><w:p><w:r><w:t xml:space="preserve">'
                    f"{_xml_escape(cell)}</w:t></w:r></w:p></w:tc>"
                )
            parts.append("</w:tr>")
        parts.append("</w:tbl>")
    parts.append("</w:body></w:document>")
    doc_xml = "".join(parts).encode("utf-8")

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for name, payload in (
            ("[Content_Types].xml", _DOCX_CONTENT_TYPES.encode()),
            ("_rels/.rels", _DOCX_RELS.encode()),
            ("word/document.xml", doc_xml),
        ):
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zf.writestr(zi, payload)
    return buf.getvalue()
