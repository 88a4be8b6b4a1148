"""Property-based hardening of the pure kernel (hypothesis).

The reference has no randomized testing (SURVEY.md §5); these properties
back the determinism/robustness contract the golden tests assert pointwise:
arbitrary bytes never crash the kernel, same bytes always produce the same
extract, and the cleaner is idempotent (so re-running the job over already-
clean text can never change it — the writeback-twice safety the reference
handles with its `overwrite_existing` flag, config.md).
"""

from hypothesis import given, settings, strategies as st

from ankiocr_spark.kernel import extract_main_text, extract_record, extract_spans
from ankiocr_spark.textclean import clean_text

SETTINGS = dict(max_examples=60, deadline=None)

# arbitrary bytes + html-ish fragments (tags, entities, nesting, junk)
_tagish = st.sampled_from(
    ["<p>", "</p>", "<div>", "</div>", "<a href='/x'>", "</a>", "<br/>",
     "<script>", "</script>", "<nav>", "</nav>", "&amp;", "&#65;", "<h1>",
     "</h1>", "<li>", "<", ">", "&", "\x00", "\n",
     # cdata-mode close-tag lookalikes: mismatched name / attributed close /
     # whitespace-and-case variants must stay raw data inside script/style
     "</scriptfoo>", "</script x>", "</ ScRiPt  >", "<style>", "</style>",
     "</stylesheet>"]
)
_textish = st.text(max_size=40)
_htmlish = st.lists(st.one_of(_tagish, _textish), max_size=30).map("".join)
_payload = st.one_of(
    st.binary(max_size=400),
    _htmlish.map(lambda s: s.encode("utf-8", errors="ignore")),
)


@given(_payload)
@settings(**SETTINGS)
def test_kernel_never_raises_and_is_deterministic(payload):
    r1 = extract_record("u", payload)
    r2 = extract_record("u", payload)
    assert r1 == r2
    assert r1["url"] == "u"
    assert r1["error"] is None or isinstance(r1["error"], str)
    if r1["error"] is None:
        assert r1["extracted_text"] == extract_main_text(payload)
        assert r1["n_chars"] == len(r1["extracted_text"])


@given(_payload)
@settings(**SETTINGS)
def test_spans_invariants(payload):
    blocks = extract_spans(payload)
    ids = [b.block_id for b in blocks]
    assert ids == sorted(ids) == list(range(len(blocks)))  # document order
    for b in blocks:
        assert 0.0 <= b.link_density <= 1.0
        assert b.n_chars == len(b.text)
        assert b.text == b.text.strip()
    # extract == clean(concat of kept blocks): spans and text modes agree
    kept = "\n".join(b.text for b in blocks if b.kept)
    assert extract_main_text(payload) == clean_text(kept)


@given(st.text(max_size=300))
@settings(**SETTINGS)
def test_clean_text_idempotent(s):
    once = clean_text(s)
    assert clean_text(once) == once
    # no blank lines, no leading/trailing space per line, no '::' runs
    if once:
        for line in once.split("\n"):
            assert line == line.strip() and line != ""
    assert "::" not in once


@given(_payload)
@settings(**SETTINGS)
def test_fast_tokenizer_matches_stdlib_parser(payload):
    """The fast tokenizer (kernel._fast_feed) must produce the same scored
    blocks as the stdlib-parser reference path on html-ish input. The
    stdlib parser itself CRASHES on some malformed inputs (e.g. b'<![0' →
    AssertionError in _markupbase._scan_name); the fast path must still
    succeed there, so those inputs pass the robustness half only."""
    fast = extract_spans(payload, _use_fast=True)  # must never raise
    try:
        slow = extract_spans(payload, _use_fast=False)
    except Exception:
        return  # stdlib crashed; fast path already proved more robust
    assert fast == slow


def test_cdata_close_lookalikes_stay_raw():
    """Regression (round-1 ADVICE): a close tag whose name merely starts
    with the cdata element ('</scriptfoo>') or carries junk ('</script x>')
    must NOT end script/style raw-text mode — stdlib's set_cdata_mode only
    stops at the full `</\\s*elem\\s*>`. The fast path previously fired a
    phantom handle_endtag('scriptfoo'), poisoning the prune stack and
    silently dropping all following content."""
    cases = [
        b"<script>var s = '</scriptfoo>'; var t = '<style>'; </script>"
        b"<p>real paragraph long enough to clear the keep floor easily</p>",
        b"<script>a</script x>b</script>"
        b"<p>paragraph of sufficiently long body text to keep here now</p>",
        b"<style>.x{content:'</stylesheet>'}</style>"
        b"<p>another paragraph of sufficiently long body text kept too</p>",
        b"<script>x</ ScRiPt  >"
        b"<p>case and whitespace tolerant close, long enough to keep it</p>",
        b"<script>unterminated </scri",
    ]
    for payload in cases:
        fast = extract_spans(payload, _use_fast=True)
        slow = extract_spans(payload, _use_fast=False)
        assert fast == slow, payload
    # the flagship case extracts exactly the real paragraph
    texts = [b.text for b in extract_spans(cases[0]) if b.kept]
    assert texts == ["real paragraph long enough to clear the keep floor easily"]


def test_fast_tokenizer_matches_stdlib_on_fixtures():
    from ankiocr_spark.fixtures import gen_rows

    for r in gen_rows(400, seed=11):
        if r["html"] is None:
            continue
        assert extract_spans(r["html"], _use_fast=True) == extract_spans(
            r["html"], _use_fast=False
        ), r["url"]
