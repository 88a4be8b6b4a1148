"""Structured extraction (head metadata + HTML tables): values, plan shape.

Value parity vs DuckDB is covered by the full-export sweep in
test_oracle_parity.py; here we pin the properties the oracle can't see —
plan shape (scan-fused, zero Exchange) and the template-inversion
invariants (extraction is the exact inverse of the synthesis template).
"""

import duckdb
import pytest

from ankiocr_spark.metadata import (
    _CANON_GROUP,
    _LANG_NOISE,
    _LANG_NOISE_MOD,
    _TABLE_TOKENS,
    _TITLE_WORDS,
    q_canonical_collapse,
    q_html_tables,
    q_lang_mismatch,
    q_page_metadata,
)
from tests.conftest import SF_DIR


def _executed_plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_page_metadata_plan_is_shuffle_free(spark):
    """Head extraction must fuse into the scan — zero Exchange — so at
    10^12 pages the stage is scan-bound."""
    plan = _executed_plan(q_page_metadata(spark, SF_DIR))
    assert "Exchange" not in plan
    assert "MapInPandas" not in plan  # regex path, not the Python kernel


def test_html_tables_plan_is_generate_only(spark):
    """Table explode adds one Generate but still no Exchange: the row
    multiplier is rows-per-table, never a shuffle."""
    plan = _executed_plan(q_html_tables(spark, SF_DIR))
    assert "Exchange" not in plan
    assert "Generate" in plan


def test_page_metadata_inverts_the_template(spark):
    """Extraction must recover exactly what the template embedded:
    title = stripped first _TITLE_WORDS words, canonical = the fetched
    url (is_canonical always 1 for the synthesized corpus)."""
    rows = q_page_metadata(spark, SF_DIR).collect()
    docs = {
        f"https://example.org/doc/{d}": t
        for d, t in duckdb.sql(
            f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet') "
            "WHERE text IS NOT NULL"
        ).fetchall()
    }
    assert len(rows) == len(docs)
    for r in rows:
        text = docs[r["url"]]
        doc_id = int(r["url"].rsplit("/", 1)[1])
        want_title = " ".join(text.split(" ")[:_TITLE_WORDS])
        for ch in '"<>&':
            want_title = want_title.replace(ch, "")
        assert r["title"] == want_title + " | example.org"
        want_canon = r["url"].rsplit("/", 1)[0] + f"/{doc_id - doc_id % _CANON_GROUP}"
        assert r["canonical_url"] == want_canon
        assert r["is_canonical"] == int(doc_id % _CANON_GROUP == 0)
        assert r["meta_description"].startswith(want_title[:20])


def test_html_tables_rows_and_cells(spark):
    """Every non-null doc yields exactly _TABLE_TOKENS rows of 3 cells,
    row i carrying (doc_id, lang, token_i)."""
    out = q_html_tables(spark, SF_DIR).collect()
    docs = dict(
        duckdb.sql(
            f"SELECT doc_id, (lang, text) FROM read_parquet('{SF_DIR}/documents.parquet') "
            "WHERE text IS NOT NULL"
        ).fetchall()
    )
    assert len(out) == _TABLE_TOKENS * len(docs)
    for r in out:
        doc_id = int(r["url"].rsplit("/", 1)[1])
        lang, text = docs[doc_id]
        toks = text.split(" ")
        tok = toks[r["row_idx"]] if r["row_idx"] < len(toks) else ""
        assert r["n_cells"] == 3
        want = " ".join(x for x in (str(doc_id), lang, tok) if x != "")
        assert r["row_text"] == want


def test_canonical_collapse_groups_and_representatives(spark):
    """Groups follow the _CANON_GROUP id fan-in: every group's members are
    the consecutive ids mapping to the leader, n_self counts only leaders
    that were actually crawled, and rep_url is the deterministic min."""
    rows = q_canonical_collapse(spark, SF_DIR).collect()
    ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM read_parquet('{SF_DIR}/documents.parquet') "
            "WHERE text IS NOT NULL"
        ).fetchall()
    ]
    want_groups = {}
    for d in ids:
        want_groups.setdefault(d - d % _CANON_GROUP, []).append(d)
    assert len(rows) == len(want_groups)
    for r in rows:
        leader = int(r["canonical_url"].rsplit("/", 1)[1])
        members = want_groups[leader]
        assert r["n_urls"] == len(members)
        assert r["n_self"] == int(leader in members)
        assert int(r["rep_url"].rsplit("/", 1)[1]) == min(
            members, key=lambda d: str(d)
        )


def test_lang_mismatch_flags_exactly_the_noise_mod(spark):
    """Only every _LANG_NOISE_MOD-th doc declares the noise lang; all
    other pages match their corpus language."""
    rows = q_lang_mismatch(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        doc_id = int(r["url"].rsplit("/", 1)[1])
        if doc_id % _LANG_NOISE_MOD == 0:
            assert r["html_lang"] == _LANG_NOISE
            assert r["is_match"] == int(r["corpus_lang"] == _LANG_NOISE)
        else:
            assert r["html_lang"] == r["corpus_lang"]
            assert r["is_match"] == 1


def test_lang_mismatch_plan_is_shuffle_free(spark):
    plan = _executed_plan(q_lang_mismatch(spark, SF_DIR))
    assert "Exchange" not in plan


def test_canonical_collapse_plan_is_one_partial_agg_exchange(spark):
    """The collapse must be exactly one hash exchange with map-side
    partials below it (min over a string forces SortAggregate — no
    mutable hash buffer for var-length types — but the partial/final
    split still combines map-side, which is the scale invariant)."""
    plan = _executed_plan(q_canonical_collapse(spark, SF_DIR))
    assert plan.count("Exchange") - plan.count("ReusedExchange") == 1
    assert "partial_count" in plan  # map-side combine before the shuffle


def test_markup_in_text_cannot_break_the_template_inverse(spark, tmp_path):
    """Text containing markup ('<table>', '</tr>', '<td>', quotes) must
    not corrupt the extraction: every embedded fragment passes the
    _STRIP_CLASS escape-on-write strip, so the greedy table regex and the
    '</tr>' split still see exactly the synthesized table. The shipped
    fixtures happen to contain no markup characters, so only this planted
    corpus exercises the invariant (oracle parity can't — both sides
    share the template)."""
    import pandas as pd

    evil = '<table><tr><td>x</td></tr></table> "quoted" & more words here'
    p = tmp_path / "sf"
    p.mkdir()
    pd.DataFrame(
        {
            "doc_id": [9],  # 9 % _CANON_GROUP == 0 → its own canonical
            "text": [evil],
            "lang": ["eng"],
            "n_chars": [len(evil)],
        }
    ).to_parquet(p / "documents.parquet")

    meta = q_page_metadata(spark, str(p)).collect()
    assert len(meta) == 1
    stripped_words = [
        w
        for w in "".join(
            c for c in evil if c not in '"<>&'
        ).split(" ")[:_TITLE_WORDS]
    ]
    assert meta[0]["title"] == " ".join(stripped_words) + " | example.org"
    assert meta[0]["is_canonical"] == 1

    tbl = q_html_tables(spark, str(p)).collect()
    assert len(tbl) == _TABLE_TOKENS
    for r in tbl:
        assert r["n_cells"] == 3
        assert "<" not in r["row_text"] and ">" not in r["row_text"]


@pytest.mark.parametrize("q", [q_page_metadata, q_html_tables])
def test_null_text_rows_are_excluded(spark, tmp_path, q):
    """NULL-text pages (unfetched/binary docs) must not produce metadata
    or table rows — mirrored by the oracle's WHERE text IS NOT NULL."""
    import pandas as pd

    p = tmp_path / "sf"
    p.mkdir()
    pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["alpha beta gamma delta epsilon", None],
            "lang": ["eng", "deu"],
            "n_chars": [30, 0],
        }
    ).to_parquet(p / "documents.parquet")
    got = q(spark, str(p)).collect()
    assert {r["url"] for r in got} == {"https://example.org/doc/1"}


def test_charset_sniff_schedule_and_plan(spark):
    """The detector inverts the synthesis schedule byte-for-byte: BOM
    pages detect as utf-8-bom (hex-prefix check on the BINARY column,
    not on the decoded text), declared-legacy pages surface their meta
    value, bare pages fall to the unknown default. Zero Exchange."""
    from ankiocr_spark.metadata import _CS_LEGACY, q_charset_sniff

    df = q_charset_sniff(spark, SF_DIR)
    rows = df.collect()
    assert rows
    for r in rows:
        doc_id = int(r["url"].rsplit("/", 1)[1])
        v = doc_id % 3
        if v == 0:
            assert (r["has_bom"], r["declared_charset"], r["detected_charset"]) == (
                1, "utf-8", "utf-8-bom")
        elif v == 1:
            assert (r["has_bom"], r["declared_charset"], r["detected_charset"]) == (
                0, _CS_LEGACY, _CS_LEGACY)
        else:
            assert (r["has_bom"], r["declared_charset"], r["detected_charset"]) == (
                0, "", "unknown")
    assert "Exchange" not in _executed_plan(df)
