"""Deterministic synthetic web-page fixtures + per-url golden extracts.

The analog of the reference's hermetic template collection
(/root/reference/tests/testdata/test_collection_template/, copied fresh per
test at tests/test_ocr.py:20-29) and its golden annotated images
(tests/testdata/annotated_imgs/, asserted byte-equal at test_ocr.py:46-60).

Pages are composed from spec'd block kinds with KNOWN expected contributions
(FIXTURES.md §1-2): the golden ``expected_text`` is computed from the block
spec below, never by running the kernel on its own output — a kernel change
that alters behavior must fail the golden tests.

Schema is exactly BASELINE.json:input_hint:
    url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING

Seeded (default seed=42, matching /root/testdata). No external data.
"""

from __future__ import annotations

import datetime as _dt
import random
from typing import Iterator, Optional, Tuple

from .textclean import clean_text
from .kernel import MIN_TEXT_CHARS, MIN_HEADING_CHARS

_WORDS = (
    "crawl corpus token batch shard spark arrow parquet vector page extract "
    "boiler content anchor window schema column partition shuffle salt skew "
    "ledger snapshot commit density heading article pipeline cluster executor "
    "throughput lineage checksum deterministic golden fixture kernel"
).split()

_LANGS = ("eng", "deu", "fra", "spa", "zho")

EPOCH = _dt.datetime(2024, 1, 1, 0, 0, 0)

#: fixed malformed payload — undecodable lead bytes + a broken tag; the
#: kernel must not crash on it and extracts nothing (api.py:50-62 analog).
MALFORMED_HTML = b"\x80\x81\xfe<p oops <div><span"


def _sentence(rng: random.Random, min_chars: int) -> str:
    words = [rng.choice(_WORDS) for _ in range(rng.randint(6, 14))]
    s = " ".join(words)
    while len(s) < min_chars:
        s += " " + rng.choice(_WORDS)
    return s


def _nav_html(rng: random.Random) -> str:
    items = "".join(
        f'<li><a href="/{w}">{w}</a></li>' for w in rng.sample(_WORDS, 5)
    )
    return f"<nav><ul>{items}</ul></nav>"


def _linkfarm_html(rng: random.Random) -> str:
    links = " ".join(
        f'<a href="/t/{w}">{w} {rng.choice(_WORDS)}</a>' for w in rng.sample(_WORDS, 12)
    )
    return f'<div class="related">{links}</div>'


def build_page(rng: random.Random, jumbo: bool = False) -> Tuple[bytes, str, Optional[str]]:
    """Compose one page. Returns (html_bytes, expected_extract, raw_text).

    The expected extract is derived from the SPEC of each block kind:
    headings contribute iff len >= MIN_HEADING_CHARS, paragraphs iff
    len >= MIN_TEXT_CHARS; nav/footer/script/style/aside and link-farms
    contribute nothing.
    """
    title = _sentence(rng, MIN_HEADING_CHARS)
    n_paras = rng.randint(2, 6) * (80 if jumbo else 1)
    paras = [_sentence(rng, MIN_TEXT_CHARS) for _ in range(n_paras)]
    short_frag = "ok go"  # < MIN_TEXT_CHARS → dropped
    colon_para = _sentence(rng, MIN_TEXT_CHARS) + " note:: twice::: thrice"

    parts = [
        "<!DOCTYPE html><html><head><title>t</title>",
        '<style>body { color: red }</style>',
        '<script>var x = "junk &amp; noise";</script>',
        "</head><body>",
        _nav_html(rng),
        f"<header><p>site banner {rng.choice(_WORDS)}</p></header>",
        f"<h1>{title}</h1>",
    ]
    expected_blocks = [title]
    for i, p in enumerate(paras):
        parts.append(f"<p>{p}</p>")
        expected_blocks.append(p)
        if i == 0:
            parts.append(f"<p>{short_frag}</p>")  # dropped: too short
    parts.append(f"<p>{colon_para}</p>")
    expected_blocks.append(colon_para)  # clean_text collapses the colons
    parts.append(_linkfarm_html(rng))  # dropped: link density
    parts.append(f"<aside><p>{_sentence(rng, MIN_TEXT_CHARS)}</p></aside>")
    parts.append(f"<footer><p>copyright {rng.choice(_WORDS)}</p></footer>")
    parts.append("</body></html>")

    html = "\n".join(parts).encode("utf-8")
    expected = clean_text("\n".join(expected_blocks))
    raw_text = paras[0]
    return html, expected, raw_text


def gen_rows(
    n: int,
    seed: int = 42,
    jumbo_every: int = 101,
    malformed_every: int = 97,
    null_every: int = 89,
    boiler_every: int = 83,
    start: int = 0,
) -> Iterator[dict]:
    """Yield page rows + goldens. Deterministic in (n, seed, knobs, start).

    Row mix mirrors FIXTURES.md §1: ~1% jumbo (skew), malformed rows
    (error-quarantine path), null-html rows, boilerplate-only rows
    (empty-extract path, api.py:244 analog). ``start`` offsets the id space
    so sharded generators (one seed per shard) emit globally unique urls.
    """
    rng = random.Random(seed)
    for j in range(n):
        i = start + j
        url = f"https://example.org/page/{i:08d}"
        warc_ts = EPOCH + _dt.timedelta(seconds=i)
        lang = _LANGS[i % len(_LANGS)]
        if null_every and i % null_every == null_every - 1:
            yield {"url": url, "warc_ts": warc_ts, "html": None, "text": None,
                   "lang": lang, "expected_text": None}
            continue
        if malformed_every and i % malformed_every == malformed_every - 1:
            # undecodable bytes → replacement chars in a <p>; too short → ''
            yield {"url": url, "warc_ts": warc_ts, "html": MALFORMED_HTML,
                   "text": None, "lang": lang, "expected_text": ""}
            continue
        if boiler_every and i % boiler_every == boiler_every - 1:
            html = f"<html><body>{_nav_html(rng)}{_linkfarm_html(rng)}</body></html>".encode()
            yield {"url": url, "warc_ts": warc_ts, "html": html, "text": None,
                   "lang": lang, "expected_text": ""}
            continue
        jumbo = bool(jumbo_every) and i % jumbo_every == jumbo_every - 1
        html, expected, raw_text = build_page(rng, jumbo=jumbo)
        yield {"url": url, "warc_ts": warc_ts, "html": html, "text": raw_text,
               "lang": lang, "expected_text": expected}


# ONE canonical definition of the input_hint schema (sources.PAGES_SCHEMA,
# a StructType); the DDL form here is derived from it so the two cannot
# drift (r3 review fix — a schema change in sources.py previously left
# fixtures silently generating the old shape)
from .sources import PAGES_SCHEMA as _PAGES_STRUCT  # noqa: E402

PAGES_SCHEMA = ", ".join(
    f"{f.name} {f.dataType.simpleString()}" for f in _PAGES_STRUCT.fields
)
GOLDEN_SCHEMA = "url string, expected_text string"


def pages_and_goldens(spark, n: int, seed: int = 42, **knobs):
    """Build (pages_df, goldens_df) as Spark DataFrames."""
    pages, goldens = [], []
    for r in gen_rows(n, seed=seed, **knobs):
        pages.append((r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]))
        goldens.append((r["url"], r["expected_text"]))
    return (
        spark.createDataFrame(pages, schema=PAGES_SCHEMA),
        spark.createDataFrame(goldens, schema=GOLDEN_SCHEMA),
    )


def write_pages_parquet(path: str, n: int, seed: int = 42, rows_per_file: int = 5000, **knobs) -> int:
    """Write the pages table straight to parquet via pyarrow (no Spark) —
    used by bench.py to materialize large inputs quickly. Returns row count."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    os.makedirs(path, exist_ok=True)
    schema = pa.schema([
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ])
    buf = {k: [] for k in ("url", "warc_ts", "html", "text", "lang")}
    count = 0
    file_idx = 0

    def _flush():
        nonlocal file_idx
        if not buf["url"]:
            return
        table = pa.table({k: pa.array(v, type=schema.field(k).type) for k, v in buf.items()})
        pq.write_table(table, os.path.join(path, f"part-{file_idx:05d}.parquet"))
        file_idx += 1
        for v in buf.values():
            v.clear()

    for r in gen_rows(n, seed=seed, **knobs):
        for k in buf:
            buf[k].append(r[k])
        count += 1
        if count % rows_per_file == 0:
            _flush()
    _flush()
    return count
