"""Outlink extraction — the link-graph leg of the crawl pipeline.

Main-content extraction (kernel.py) deliberately never materializes tag
attributes (that's most of its speed), but the crawl side needs the link
graph: frontier expansion, host-level dedup, PageRank-style quality
priors. This module is the attribute-reading sibling: stdlib-parser walk
collecting ``<a href>`` in document order, relative hrefs resolved
against the page url (RFC 3986 via urllib.parse.urljoin), fragment-only
and empty hrefs dropped (the api.py:50-62 skip-invalid analog).

Same contracts as the kernel: deterministic, quarantine not raise,
Arrow-batched only (mapInPandas), one output row per link.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator, List, Tuple
from urllib.parse import urljoin

from pyspark.sql import DataFrame, SparkSession


class _LinkParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.hrefs: List[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag != "a":
            return
        for k, v in attrs:
            if k == "href" and v and not v.startswith("#"):
                self.hrefs.append(v)
                return


def extract_links(base_url: str, html) -> List[Tuple[int, str, str]]:
    """(pos, raw_href, absolute_url) per anchor, document order."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        from .kernel import _decode

        text = _decode(html)
    else:
        text = str(html)
    p = _LinkParser()
    p.feed(text)
    p.close()
    return [
        (i, href, urljoin(base_url, href)) for i, href in enumerate(p.hrefs)
    ]


LINKS_SCHEMA = "url string, pos int, href string, target string"


def _link_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    cols = ["url", "pos", "href", "target"]
    for pdf in batches:
        rows = []
        for url, html in zip(pdf["url"].tolist(), pdf["html"].tolist()):
            if html is None:
                continue
            try:
                for pos, href, target in extract_links(url, html):
                    rows.append((url, pos, href, target))
            except Exception:
                continue  # quarantined by the text-mode job; links skip
        yield pd.DataFrame(rows, columns=cols)


def extract_outlinks(pages: DataFrame) -> DataFrame:
    """pages(url, html, ...) → one row per anchor (url, pos, href, target)."""
    return pages.select("url", "html").mapInPandas(_link_batches, LINKS_SCHEMA)


def q_outlinks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlinks of the wrapped pages. The wrap has a CLOSED-FORM anchor
    set — nav (/, /about) then the link-farm div (/a, /b, /c) — so the
    oracle enumerates exactly 5 links per non-null page with their
    resolved absolute targets."""
    from .ops import docs_as_pages

    return extract_outlinks(docs_as_pages(spark, sf_dir))


def _oracle_outlinks() -> str:
    from .ops import URL_PREFIX

    return f"""
WITH links(pos, href, path) AS (
  VALUES (0, '/', ''), (1, '/about', 'about'),
         (2, '/a', 'a'), (3, '/b', 'b'), (4, '/c', 'c')),
d AS (SELECT doc_id FROM documents WHERE text IS NOT NULL)
SELECT '{URL_PREFIX}' || doc_id AS url, pos, href,
       'https://example.org/' || path AS target
FROM d, links
"""


QUERIES = {"outlinks": q_outlinks}
ORACLE_SQL = {"outlinks": _oracle_outlinks()}
