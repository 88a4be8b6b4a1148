"""PDF text extraction — the "PDF/layout parse" leg of the north_rule.

A REAL (not stubbed) extractor for the uncompressed subset of PDF that the
paired builder emits — and that any PDF writer can emit by turning off
stream compression:

  - content streams with no /Filter (FlateDecode etc. → quarantined as
    ``unsupported_filter``: honest about the subset, never wrong);
  - text objects ``BT … ET`` with the standard positioning/showing
    operators: ``Tm`` (set matrix), ``Td``/``TD`` (line translate, TD also
    sets leading), ``T*`` (next line via leading), ``TL``, ``Tj`` (show
    string), ``TJ`` (show array with kerning numbers), ``'`` (next line +
    show), ``Tf``/``Tc``/``Tw`` (consumed, ignored);
  - PDF literal strings with escape sequences (``\\(`` ``\\)`` ``\\\\``
    ``\\n`` ``\\r`` ``\\t`` ``\\b`` ``\\f``, octal ``\\ddd``, and nested
    balanced parentheses).

Layout-aware ordering (the Tesseract-style layout ordering of
BASELINE.json:north_star, reference analog ``ocr.py:153`` batch order):
spans sort by (page, column, -y, x) where ``column = int(x // 306)`` —
half of a US-Letter page — so a two-column page reads left column
top-to-bottom, then right column. PDF's origin is bottom-left, hence the
-y (top of page first).

The analog mapping to the reference: one PDF page ≈ one image
(``OCRImage``, api.py:19-30), the content-stream walk ≈ the Tesseract
subprocess (ocr.py:201-216), and ``clean_text`` is applied to the ordered
span concat exactly like the HTML kernel does.

Like the HTML kernel: deterministic (same bytes → same text), quarantine
instead of raise, invoked only through Arrow batches (mapInPandas).
"""

from __future__ import annotations

import re
from typing import Iterator, List, Optional, Tuple

from .textclean import clean_text

#: column width for layout ordering: half a US-Letter page (612 pt).
COLUMN_PT = 306.0

#: page size emitted by the builder (US Letter).
PAGE_W, PAGE_H = 612, 792

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)

_TOKEN = re.compile(
    rb"""
      [\x00\t\n\r\f ]+                    # whitespace (skipped)
    | (?P<num>[+-]?(?:\d+\.\d*|\.\d+|\d+))
    | (?P<name>/[^\x00\t\n\r\f /<>\[\]()]*)
    | (?P<delim>[\[\]()])
    | (?P<op>[A-Za-z'"*]+)
    """,
    re.VERBOSE,
)

#: unique operand-stack marker for '[' — a literal string CONTAINING "["
#: must never be confused with the array delimiter (caught by hypothesis).
_ARRAY_MARK = object()

_ESCAPES = {
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
    ord("b"): b"\b", ord("f"): b"\f",
    ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
}


def _read_string(data: bytes, i: int) -> Tuple[bytes, int]:
    """Read a PDF literal string starting at the '(' at ``data[i]``.
    Returns (decoded bytes, index past the closing ')')."""
    assert data[i:i + 1] == b"("
    out = bytearray()
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth:
        c = data[i]
        if c == 0x5C:  # backslash
            if i + 1 >= n:
                break
            e = data[i + 1]
            if e in _ESCAPES:
                out += _ESCAPES[e]
                i += 2
            elif 0x30 <= e <= 0x37:  # octal \d, \dd, \ddd
                j = i + 1
                oct_digits = b""
                while j < n and len(oct_digits) < 3 and 0x30 <= data[j] <= 0x37:
                    oct_digits += data[j:j + 1]
                    j += 1
                out.append(int(oct_digits, 8) & 0xFF)
                i = j
            elif e in (0x0A, 0x0D):  # line continuation
                i += 2
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:  # unknown escape: backslash dropped (PDF 32000 §7.3.4.2)
                out.append(e)
                i += 2
        elif c == 0x28:  # nested (
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth:
                out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out), i


class PdfSpan(tuple):
    """(page, column, x, y, text) — plain tuple subclass for cheap Arrow transit."""

    __slots__ = ()

    def __new__(cls, page: int, x: float, y: float, text: str):
        return super().__new__(cls, (page, int(x // COLUMN_PT), x, y, text))

    page = property(lambda s: s[0])
    column = property(lambda s: s[1])
    x = property(lambda s: s[2])
    y = property(lambda s: s[3])
    text = property(lambda s: s[4])


def _walk_content(stream: bytes, page: int, spans: List[PdfSpan]) -> None:
    """Execute the text-positioning subset of one content stream."""
    i, n = 0, len(stream)
    stack: list = []
    in_text = False
    x = y = 0.0
    leading = 0.0
    while i < n:
        c = stream[i:i + 1]
        if c == b"(":
            s, i = _read_string(stream, i)
            stack.append(s)
            continue
        m = _TOKEN.match(stream, i)
        if not m:
            i += 1  # junk byte: skip (robustness over strictness)
            continue
        i = m.end()
        if m.lastgroup is None:
            continue  # whitespace
        if m.lastgroup == "num":
            stack.append(float(m.group("num")))
        elif m.lastgroup == "name":
            # wrapped so a /Name operand can never be mistaken for a
            # literal string by Tj/TJ (which check isinstance bytes)
            stack.append(("name", m.group("name")))
        elif m.lastgroup == "delim":
            d = m.group("delim")
            if d == b"[":
                stack.append(_ARRAY_MARK)
            elif d == b"]":
                # collapse array: keep strings, drop kerning numbers
                parts = []
                while stack and stack[-1] is not _ARRAY_MARK:
                    v = stack.pop()
                    if isinstance(v, bytes):
                        parts.append(v)
                if stack:
                    stack.pop()  # the array marker
                stack.append(b"".join(reversed(parts)))
        else:
            op = m.group("op")
            try:
                if op == b"BT":
                    in_text, x, y = True, 0.0, 0.0
                elif op == b"ET":
                    in_text = False
                elif op == b"Tm" and len(stack) >= 6:
                    f, e = stack.pop(), stack.pop()
                    stack = stack[:-4]
                    x, y = float(e), float(f)
                elif op in (b"Td", b"TD") and len(stack) >= 2:
                    ty, tx = stack.pop(), stack.pop()
                    x += float(tx)
                    y += float(ty)
                    if op == b"TD":
                        leading = -float(ty)
                elif op == b"TL" and stack:
                    leading = float(stack.pop())
                elif op == b"T*":
                    y -= leading
                elif op == b"Tj" and stack:
                    s = stack.pop()
                    if in_text and isinstance(s, bytes):
                        spans.append(PdfSpan(page, x, y, s.decode("latin-1")))
                elif op == b"'" and stack:
                    s = stack.pop()
                    y -= leading
                    if in_text and isinstance(s, bytes):
                        spans.append(PdfSpan(page, x, y, s.decode("latin-1")))
                elif op == b"TJ" and stack:
                    s = stack.pop()
                    if in_text and isinstance(s, bytes):
                        spans.append(PdfSpan(page, x, y, s.decode("latin-1")))
                else:
                    # unknown operator: consume nothing further; operands
                    # accumulated for it are cleared to keep the stack sane
                    stack.clear()
            except (TypeError, ValueError):
                stack.clear()


def extract_pdf_spans(pdf) -> List[PdfSpan]:
    """Parse PDF bytes into text spans in LAYOUT order
    (page, column, -y, x). Raises on unsupported compressed streams."""
    if isinstance(pdf, (bytearray, memoryview)):
        pdf = bytes(pdf)
    spans: List[PdfSpan] = []
    page = 0
    pos = 0
    while True:
        m = _STREAM_RE.search(pdf, pos)
        if not m:
            break
        # the stream's own dict lives between its "N 0 obj" header and the
        # "stream" keyword — check that slice (not earlier objects) for a
        # compression filter we cannot decode
        obj_at = pdf.rfind(b" obj", pos, m.start())
        if b"/Filter" in pdf[max(obj_at, pos):m.start()]:
            raise ValueError("unsupported_filter")
        _walk_content(m.group(1), page, spans)
        page += 1
        pos = m.end()
    spans.sort(key=lambda s: (s.page, s.column, -s.y, s.x))
    return spans


def extract_pdf_text(pdf) -> str:
    """Layout-ordered span concat → the reference's exact normalization."""
    return clean_text("\n".join(s.text for s in extract_pdf_spans(pdf)))


def pdf_record(url: Optional[str], pdf) -> dict:
    """Quarantining wrapper — same contract as kernel.extract_record."""
    if pdf is None:
        return {"url": url, "extracted_text": None, "n_spans": 0,
                "error": "null_pdf"}
    try:
        spans = extract_pdf_spans(pdf)
        return {
            "url": url,
            "extracted_text": clean_text("\n".join(s.text for s in spans)),
            "n_spans": len(spans),
            "error": None,
        }
    except Exception as exc:
        return {"url": url, "extracted_text": None, "n_spans": 0,
                "error": f"{type(exc).__name__}: {exc}"[:200]}


# ---------------------------------------------------------------------------
# Deterministic builder — real, minimal, uncompressed PDF output.
# ---------------------------------------------------------------------------

PDF_TITLE = "Synthetic Document Page"
WORDS_PER_LINE = 5
LINE_STEP = 16
TITLE_Y = 720
BODY_TOP_Y = 680
LEFT_X, RIGHT_X = 72, 320  # columns 0 and 1 (306 pt boundary)


def _esc(s: str) -> bytes:
    # STRICT latin-1 (r3 review): this builder writes the uncompressed
    # latin-1 PDF subset; errors='replace' silently corrupted any
    # non-latin-1 char to '?' — text outside the subset must RAISE so the
    # per-doc build path quarantines it honestly (the same policy as
    # compressed streams in the reader)
    return (
        s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    ).encode("latin-1")


def build_pdf(title: str, left_lines: List[str], right_lines: List[str]) -> bytes:
    """One-page, two-column, uncompressed PDF. Exercises the extractor's
    full operator set: Tm for the title, Td + TD/T* line stepping for the
    left column, TJ arrays (with kerning numbers) for the right column."""
    content = bytearray()
    content += b"BT /F1 12 Tf 1 0 0 1 %d %d Tm (%s) Tj ET\n" % (
        LEFT_X, TITLE_Y, _esc(title)
    )
    if left_lines:
        content += b"BT /F1 10 Tf %d %d Td %d TL\n" % (LEFT_X, BODY_TOP_Y, LINE_STEP)
        content += b"(%s) Tj\n" % _esc(left_lines[0])
        for line in left_lines[1:]:
            content += b"0 -%d Td (%s) Tj\n" % (LINE_STEP, _esc(line))
        content += b"ET\n"
    if right_lines:
        content += b"BT /F1 10 Tf %d %d Td\n" % (RIGHT_X, BODY_TOP_Y)
        for k, line in enumerate(right_lines):
            if k:
                content += b"0 -%d Td\n" % LINE_STEP
            content += b"[(%s) -250 ()] TJ\n" % _esc(line)
        content += b"ET\n"

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>"
        % (PAGE_W, PAGE_H),
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), bytes(content)),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


#: page-shape contract shared with the oracle's series bound: a driver-query
#: page carries at most this many body lines (r3 review: the cap was
#: oracle-only, so a >5000-word document would have produced a false
#: engine-mismatch; real deployments paginate instead of truncating)
MAX_DOC_LINES = 1000


def wrap_lines(text: str, words_per_line: int = WORDS_PER_LINE) -> List[str]:
    words = [w for w in text.split(" ") if w]
    return [
        " ".join(words[i:i + words_per_line])
        for i in range(0, len(words), words_per_line)
    ]


def build_doc_pdf(text: str) -> bytes:
    """The driver-query page shape: title + body wrapped at WORDS_PER_LINE
    words (capped at MAX_DOC_LINES), first ceil(k/2) lines in the left
    column, rest in the right — so layout-ordered extraction reproduces
    the lines in original order."""
    lines = wrap_lines(text.strip())[:MAX_DOC_LINES]
    half = (len(lines) + 1) // 2
    return build_pdf(PDF_TITLE, lines[:half], lines[half:])


# ---------------------------------------------------------------------------
# Driver query: documents.text → in-flight PDFs → extraction, with a
# closed-form oracle (layout order == original line order by construction).
# ---------------------------------------------------------------------------

PDF_SCHEMA = "url string, pdf binary"
PDF_OUT_SCHEMA = "url string, extracted_text string, n_spans int, error string"


def _build_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    def _build(t):
        try:
            return build_doc_pdf(t)
        except UnicodeEncodeError:
            return None  # non-latin-1 text: quarantined, never corrupted

    for pdf_batch in batches:
        yield pd.DataFrame({
            "url": pdf_batch["url"],
            "pdf": [_build(t) for t in pdf_batch["text"].tolist()],
        })


def _extract_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    for b in batches:
        yield pd.DataFrame.from_records(
            pdf_record(u, p) for u, p in zip(b["url"].tolist(), b["pdf"].tolist())
        )


def q_pdf_extract(spark, sf_dir: str):
    """PDF leg of the extraction engine: build real one-page two-column
    PDFs from documents.text in-flight (binary column), then run the PDF
    kernel over Arrow batches — the same two-hop shape as a crawl that
    stores raw PDFs next to raw HTML."""
    from pyspark.sql import functions as F

    from .ops import doc_url

    docs = (
        __import__("ankiocr_spark.ops", fromlist=["load"]).load(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select(doc_url(F.col("doc_id")).alias("url"), "text")
    )
    pdfs = docs.mapInPandas(_build_batches, PDF_SCHEMA)
    out = pdfs.mapInPandas(_extract_batches, PDF_OUT_SCHEMA)
    return out.select("url", "extracted_text")


def _oracle_pdf_extract() -> str:
    from .ops import URL_PREFIX

    # r3 review fixes baked into the closed form: (a) the line cap is the
    # SHARED MAX_DOC_LINES contract, not an oracle-only bound; (b) the
    # engine's clean_text collapses ':+' runs, so the oracle does too
    # (global flag — DuckDB defaults to first-match); (c) non-latin-1 text
    # (any char above U+00FF) is quarantined by the strict builder →
    # extracted_text NULL on both sides.
    return f"""
WITH w AS (
  SELECT doc_id, text,
         list_filter(str_split(trim(text), ' '), x -> x <> '') AS words
  FROM documents WHERE text IS NOT NULL),
lines AS (
  SELECT doc_id, i,
         array_to_string(
             list_slice(words, (i * {WORDS_PER_LINE} + 1)::int,
                        (i * {WORDS_PER_LINE} + {WORDS_PER_LINE})::int), ' ') AS line
  FROM w, generate_series(0, {MAX_DOC_LINES - 1}) AS g(i)
  WHERE i * {WORDS_PER_LINE} < len(words)),
body AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS body_text
  FROM lines GROUP BY doc_id)
SELECT '{URL_PREFIX}' || w.doc_id AS url,
       CASE WHEN regexp_matches(w.text, '[\\x{{100}}-\\x{{10FFFF}}]') THEN NULL
            WHEN body.body_text IS NULL
            THEN '{PDF_TITLE}'
            ELSE regexp_replace(
                '{PDF_TITLE}' || chr(10) || body.body_text, ':+', ':', 'g')
            END AS extracted_text
FROM w LEFT JOIN body USING (doc_id)
"""


QUERIES = {"pdf_extract": q_pdf_extract}
ORACLE_SQL = {"pdf_extract": _oracle_pdf_extract()}
