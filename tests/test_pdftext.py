"""PDF/layout-parse leg (north_rule): builder↔extractor round trips, the
operator subset (Tm/Td/TD/TL/T*/Tj/TJ/'), string escapes, column-major
layout ordering, filter quarantine, and never-raise robustness."""

from hypothesis import given, settings, strategies as st

from ankiocr_spark.pdftext import (
    PDF_TITLE,
    build_doc_pdf,
    build_pdf,
    extract_pdf_spans,
    extract_pdf_text,
    pdf_record,
    wrap_lines,
)


def test_round_trip_two_columns():
    pdf = build_pdf(
        "Title Here",
        ["left one line", "left two line"],
        ["right one", "right two"],
    )
    assert extract_pdf_text(pdf) == (
        "Title Here\nleft one line\nleft two line\nright one\nright two"
    )


def test_layout_order_is_column_major():
    """A right-column span ABOVE the left column's lines must still read
    after the whole left column (column-major, then top-down)."""
    spans = extract_pdf_spans(
        build_pdf("T", ["low left"], ["high right"])
    )
    assert [s.text for s in spans] == ["T", "low left", "high right"]
    assert [s.column for s in spans] == [0, 0, 1]
    # top-down within a column: y decreases
    left = [s for s in spans if s.column == 0]
    assert left[0].y > left[1].y


def test_string_escapes():
    pdf = build_pdf("Par(en) \\ back", ["a(b)c"], [])
    assert extract_pdf_text(pdf) == "Par(en) \\ back\na(b)c"


def test_doc_pdf_reproduces_line_order():
    text = " ".join(f"w{i}" for i in range(23))
    expect = PDF_TITLE + "\n" + "\n".join(wrap_lines(text))
    assert extract_pdf_text(build_doc_pdf(text)) == expect


def test_empty_body():
    assert extract_pdf_text(build_doc_pdf("   ")) == PDF_TITLE


def test_compressed_stream_quarantined():
    pdf = build_pdf("t", ["body line"], [])
    bad = pdf.replace(b"<< /Length", b"<< /Filter /FlateDecode /Length")
    rec = pdf_record("u", bad)
    assert rec["extracted_text"] is None
    assert "unsupported_filter" in rec["error"]


def test_null_pdf():
    rec = pdf_record("u", None)
    assert rec["error"] == "null_pdf"


@given(st.binary(max_size=400))
@settings(max_examples=60, deadline=None)
def test_never_raises_on_junk(payload):
    r1 = pdf_record("u", payload)
    r2 = pdf_record("u", payload)
    assert r1 == r2  # deterministic, never raises


@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=1,
            max_size=30,
        ).map(str.strip).filter(bool),
        max_size=6,
    )
)
@settings(max_examples=60, deadline=None)
def test_build_extract_round_trip_property(lines):
    """Any printable-ASCII lines survive the build→extract round trip in
    order (after the same whitespace normalization clean_text applies)."""
    from ankiocr_spark.textclean import clean_text

    half = (len(lines) + 1) // 2
    pdf = build_pdf("T", lines[:half], lines[half:])
    assert extract_pdf_text(pdf) == clean_text("\n".join(["T"] + lines))
