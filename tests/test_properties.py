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


# --- anchor parser properties ------------------------------------------------

def _anchor_payloads():
    anchorish = st.sampled_from(
        ['<a href="/x">', '<a href="/y">', "<a>", "</a>", '<a href="#f">',
         "<b>", "</b>", "<p>", "</p>", "text ", "  ", "&amp;", "link"]
    )
    return st.lists(st.one_of(anchorish, st.text(max_size=20)), max_size=25).map(
        "".join
    )


@given(_anchor_payloads())
@settings(**SETTINGS)
def test_anchor_pairs_never_raise_and_are_deterministic(html):
    from ankiocr_spark.links import extract_anchor_pairs, extract_links

    p1 = extract_anchor_pairs("https://e.org/base/", html)
    p2 = extract_anchor_pairs("https://e.org/base/", html)
    assert p1 == p2
    # every emitted pair resolves and has normalized whitespace
    for target, anchor in p1:
        assert target.startswith("http")
        assert anchor == " ".join(anchor.split())
    # anchor pairs and href-only outlinks agree on the href multiset:
    # implicit close + EOF flush exist exactly so no <a href> is dropped
    hrefs = [t for _, __, t in extract_links("https://e.org/base/", html)]
    assert sorted(t for t, _ in p1) == sorted(hrefs)


# --- crawl delta / incremental split algebra ----------------------------------

def test_crawl_delta_statuses_partition_the_url_universe(spark):
    from ankiocr_spark.bucketing import crawl_delta

    old = spark.createDataFrame(
        [(f"u{i}", f"d{i % 4}") for i in range(20)], "url string, digest string"
    )
    # drop every 5th, change every 3rd survivor, add 5 fresh urls
    new = spark.createDataFrame(
        [
            (f"u{i}", f"X{i}" if i % 3 == 0 else f"d{i % 4}")
            for i in range(20)
            if i % 5 != 0
        ]
        + [(f"n{i}", "nd") for i in range(5)],
        "url string, digest string",
    )
    rows = crawl_delta(old, new).collect()
    by_status = {}
    for r in rows:
        by_status.setdefault(r["status"], set()).add(r["url"])
    all_urls = {r["url"] for r in rows}
    # statuses partition old ∪ new exactly
    assert all_urls == {f"u{i}" for i in range(20)} | {f"n{i}" for i in range(5)}
    assert sum(len(v) for v in by_status.values()) == len(all_urls)
    assert by_status["removed"] == {f"u{i}" for i in range(20) if i % 5 == 0}
    assert by_status["added"] == {f"n{i}" for i in range(5)}
    assert by_status["changed"] == {
        f"u{i}" for i in range(20) if i % 5 != 0 and i % 3 == 0
    }


def test_incremental_split_with_empty_delta_runs_no_kernel_input(spark):
    """All-unchanged re-crawl: to_extract is EMPTY and the carried-forward
    rows alone reproduce the snapshot (the cheapest possible re-crawl)."""
    from pyspark.sql import functions as F

    from ankiocr_spark.bucketing import split_incremental

    pages = spark.createDataFrame(
        [(f"u{i}", f"<p>body {i}</p>".encode()) for i in range(10)],
        "url string, html binary",
    )
    old = pages.select(
        "url",
        F.md5("html").alias("digest"),
        F.concat(F.lit("text "), "url").alias("extracted_text"),
    )
    reuse, to_extract = split_incremental(old, pages)
    assert to_extract.count() == 0
    got = {r["url"]: r["extracted_text"] for r in reuse.collect()}
    assert got == {f"u{i}": f"text u{i}" for i in range(10)}
