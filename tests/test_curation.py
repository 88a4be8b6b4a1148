"""Invariant tests for the curation operators and near-dup clustering —
each checked against an INDEPENDENT pure-Python reimplementation (the
oracle-parity sweep replicates the same SQL math, so these are the
checks that catch shared-math bugs)."""

import math
import re
from collections import Counter

import duckdb
from pyspark.sql import functions as F

from ankiocr_spark.datapipe.curation import (
    EMAIL_RE,
    IPV4_RE,
    MAX_TOP_BIGRAM_SHARE,
    MIN_DISTINCT_RATIO,
    PII_MOD,
    TFIDF_TOP_K,
    q_pii_redact,
    q_repetition_filter,
    q_tfidf_top_terms,
)
from ankiocr_spark.datapipe.dedup import (
    q_dedup_cc_clusters,
    q_dedup_simhash_pairs,
)


def _rows(sf_dir):
    return duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet') "
        "WHERE text IS NOT NULL ORDER BY doc_id"
    ).fetchall()


def test_cc_clusters_match_union_find(spark, sf_dir):
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in q_dedup_simhash_pairs(spark, sf_dir).collect()
    ]
    # independent union-find over the same pair graph
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {v: find(v) for v in parent}
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in q_dedup_cc_clusters(spark, sf_dir).collect()
    }
    assert got == expected
    # every pair's endpoints landed in one cluster, labels are minima
    assert all(got[a] == got[b] for a, b in pairs)
    assert all(cid <= doc for doc, cid in got.items())


def test_pii_redact_leaves_no_matches_and_counts_the_slice(spark, sf_dir):
    out = {r["doc_id"]: r for r in q_pii_redact(spark, sf_dir).collect()}
    email, ip = re.compile(EMAIL_RE), re.compile(IPV4_RE)
    for doc_id, r in out.items():
        assert not email.search(r["redacted"])
        assert not ip.search(r["redacted"])
        if doc_id % PII_MOD == 0:
            # the synthetic contact line carries exactly 1 email + 1 IP
            assert r["n_emails"] == 1 and r["n_ips"] == 1
            assert "<EMAIL>" in r["redacted"] and "<IP>" in r["redacted"]
        else:
            assert r["n_emails"] == 0 and r["n_ips"] == 0


def test_repetition_filter_matches_python(spark, sf_dir):
    got = {r["doc_id"]: r for r in q_repetition_filter(spark, sf_dir).collect()}
    kept = dropped = 0
    for doc_id, text in _rows(sf_dir):
        toks = text.split(" ")
        if len(toks) < 2:
            assert doc_id not in got
            continue
        bigrams = Counter(
            f"{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1)
        )
        share = round(max(bigrams.values()) / sum(bigrams.values()), 6)
        ratio = round(len(set(toks)) / len(toks), 6)
        r = got[doc_id]
        assert abs(r["top_bigram_share"] - share) <= 1e-9
        assert abs(r["distinct_ratio"] - ratio) <= 1e-9
        keep = share <= MAX_TOP_BIGRAM_SHARE and ratio >= MIN_DISTINCT_RATIO
        assert r["keep"] == keep
        kept += keep
        dropped += not keep
    # thresholds are calibrated to BITE: both outcomes must occur
    assert kept > 0 and dropped > 0


def test_tfidf_top_terms_matches_python(spark, sf_dir):
    rows = _rows(sf_dir)
    n_docs = len(rows)
    df = Counter()
    tfs = {}
    for doc_id, text in rows:
        tf = Counter(text.split(" "))
        tfs[doc_id] = tf
        df.update(tf.keys())
    expected = {}
    for doc_id, tf in tfs.items():
        scored = sorted(
            ((t, c * math.log(n_docs / df[t])) for t, c in tf.items()),
            key=lambda kv: (-kv[1], kv[0]),
        )[:TFIDF_TOP_K]
        expected[doc_id] = [
            (rank + 1, t, round(s, 6)) for rank, (t, s) in enumerate(scored)
        ]
    got = {}
    for r in q_tfidf_top_terms(spark, sf_dir).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["rank"], r["term"], round(r["tfidf"], 6))
        )
    for doc_id in got:
        got[doc_id].sort()
    assert got == expected


def test_blocklist_filter_rules_match_python(spark, sf_dir):
    from ankiocr_spark.datapipe.curation import (
        BLOCK_PATH_RE,
        BLOCKED_HOSTS,
        q_blocklist_filter,
    )

    got = {r["doc_id"]: r for r in q_blocklist_filter(spark, sf_dir).collect()}
    pat = re.compile(BLOCK_PATH_RE)
    by_host = by_path = kept = 0
    for doc_id, _ in _rows(sf_dir):
        r = got[doc_id]
        host = f"h{doc_id % 11}.example.org"
        url = f"https://{host}/doc/{doc_id}"
        assert (r["host"], r["url"]) == (host, url)
        assert r["blocked_host"] == (host in BLOCKED_HOSTS)
        assert r["blocked_path"] == bool(pat.search(url))
        assert r["kept"] == (not r["blocked_host"] and not r["blocked_path"])
        by_host += r["blocked_host"]
        by_path += r["blocked_path"]
        kept += r["kept"]
    # both rules bite and most of the corpus survives
    assert by_host > 0 and by_path > 0 and kept > max(by_host, by_path)


def test_domain_mix_sample_rates_cap_and_determinism(spark, sf_dir):
    from ankiocr_spark.datapipe.curation import (
        MIX_BUDGET_FRAC,
        TARGET_MIX,
        _MIX_MOD,
        _MIX_MULT,
        q_domain_mix_sample,
    )

    langs = [
        (doc_id, lang)
        for doc_id, lang in duckdb.sql(
            f"SELECT doc_id, lang FROM read_parquet('{sf_dir}/documents.parquet') "
            "WHERE text IS NOT NULL"
        ).fetchall()
    ]
    n_total = len(langs)
    n_lang = Counter(lang for _, lang in langs)
    rates = {
        lang: min(1.0, TARGET_MIX[lang] * (MIX_BUDGET_FRAC * n_total) / n)
        for lang, n in n_lang.items()
    }
    got = {r["doc_id"]: r for r in q_domain_mix_sample(spark, sf_dir).collect()}
    assert len(got) == n_total
    for doc_id, lang in langs:
        r = got[doc_id]
        assert r["lang"] == lang
        assert abs(r["rate"] - round(rates[lang], 6)) <= 1e-9
        u = ((doc_id * _MIX_MULT) % _MIX_MOD) / _MIX_MOD
        assert r["sampled"] == (u < rates[lang])
    # the oversubscribed language is capped: selection cannot mint docs
    assert max(rates.values()) == 1.0
    assert min(rates.values()) < 1.0


def test_mix_draw_is_uniform_and_overflow_safe(spark):
    """ADVICE r4: the raw Knuth product overflows signed int64 at
    doc_id ≈ 3.5e9 and (ANSI off) wraps negative, making u < rate
    vacuously true — silently sampling every doc at 10^12-doc scale.
    The reduced form must stay in [0, 1) across the id range and match
    the unreduced value for ids below the reduction modulus."""
    from ankiocr_spark.datapipe.curation import _MIX_MOD, _MIX_MULT, mix_draw

    # negative ids exercise the pmod sign-safety (plain % would yield a
    # negative draw → u < rate vacuously true)
    ids = [0, 1, 12345, 2**31 - 1, 3_500_000_000, 10**12, 2**53, 2**62,
           -1, -42, -(2**40)]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
    got = {
        r["doc_id"]: r["u"]
        for r in df.select("doc_id", mix_draw(F.col("doc_id")).alias("u")).collect()
    }
    for i in ids:
        assert 0.0 <= got[i] < 1.0, (i, got[i])
        if 0 <= i < 2**31:
            assert got[i] == ((i * _MIX_MULT) % _MIX_MOD) / _MIX_MOD
    # big ids spread across the unit interval (not all collapsed/true)
    assert len({round(got[i], 3) for i in ids}) >= 6


def test_lm_perplexity_matches_python(spark, sf_dir):
    from ankiocr_spark.datapipe.curation import LM_LOGPROB_FLOOR, q_lm_perplexity

    rows = _rows(sf_dir)
    c12, c1 = Counter(), Counter()
    vocab = set()
    doc_bigrams = {}
    for doc_id, text in rows:
        toks = text.split(" ")
        if len(toks) < 2:
            continue  # excluded BEFORE vocab: engine computes V post-gate
        vocab.update(toks)
        bgs = [f"{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1)]
        doc_bigrams[doc_id] = bgs
        for b in bgs:
            c12[b] += 1
            c1[b.split(" ")[0]] += 1
    got = {r["doc_id"]: r for r in q_lm_perplexity(spark, sf_dir).collect()}
    assert set(got) == set(doc_bigrams)
    v = len(vocab)
    kept = dropped = 0
    for doc_id, bgs in doc_bigrams.items():
        lps = [
            math.log((c12[b] + 1) / (c1[b.split(" ")[0]] + v)) for b in bgs
        ]
        avg = sum(lps) / len(lps)
        r = got[doc_id]
        assert abs(r["avg_logprob"] - round(avg, 6)) <= 1e-6
        assert r["keep"] == (avg >= LM_LOGPROB_FLOOR)
        kept += r["keep"]
        dropped += not r["keep"]
    # the floor is calibrated to BITE: both outcomes must occur
    assert kept > 0 and dropped > 0


def test_robots_policy_verdicts(spark, sf_dir):
    """Directive → verdict logic, checked per residue class: noindex
    blocks indexing only, nofollow blocks frontier expansion only, the
    combined directive blocks both, absent meta allows both."""
    from ankiocr_spark.datapipe.curation import (
        ROBOTS_CASES,
        ROBOTS_MOD,
        q_robots_policy,
    )

    rows = q_robots_policy(spark, sf_dir).collect()
    assert rows
    for r in rows:
        directive = ROBOTS_CASES.get(r["doc_id"] % ROBOTS_MOD, "")
        assert r["robots"] == directive, r
        assert r["indexable"] == ("noindex" not in directive)
        assert r["followable"] == ("nofollow" not in directive)
        assert r["url"].endswith(str(r["doc_id"]))
    # all four policy outcomes occur in the fixture slice
    seen = {(r["indexable"], r["followable"]) for r in rows}
    assert seen == {(True, True), (False, True), (True, False), (False, False)}


def test_boilerplate_strip_matches_python(spark, sf_dir):
    from collections import defaultdict

    from ankiocr_spark.datapipe.curation import (
        BOILER_DF_DEN,
        BOILER_DF_NUM,
        PROMO_MOD,
        _PROMO_LINE,
        q_boilerplate_strip,
    )

    rows = duckdb.sql(
        f"SELECT doc_id, source, text FROM "
        f"read_parquet('{sf_dir}/documents.parquet') WHERE text IS NOT NULL"
    ).fetchall()
    pages = {}
    for doc_id, source, text in rows:
        nav = f"nav {source} home about contact login"
        promo = [_PROMO_LINE] if doc_id % PROMO_MOD == 0 else []
        pages[doc_id] = (source, [nav, *promo, *text.split("\n")])
    n_docs, df = Counter(), defaultdict(Counter)
    for source, lines in pages.values():
        n_docs[source] += 1
        for line in set(lines):
            df[source][line] += 1
    boiler = {
        s: {l for l, d in df[s].items() if BOILER_DF_DEN * d >= BOILER_DF_NUM * n_docs[s]}
        for s in n_docs
    }
    out = {r["doc_id"]: r for r in q_boilerplate_strip(spark, sf_dir).collect()}
    assert set(out) == set(pages)
    for doc_id, (source, lines) in pages.items():
        kept = [l for l in lines if l not in boiler[source]]
        r = out[doc_id]
        assert r["n_lines"] == len(lines)
        assert r["n_boiler"] == len(lines) - len(kept)
        assert r["clean_text"] == "\n".join(kept)
        # the injected nav line has per-host df 1.0 — always stripped
        assert f"nav {source} " not in r["clean_text"]


def test_cluster_keeper_is_longest_member_once_per_cluster(spark, sf_dir):
    from ankiocr_spark.datapipe.dedup import q_cluster_keeper

    # the same augmented corpus the pair graph is built over: originals
    # plus the injected near-dup copies (one token longer, id + 1e6)
    n_tokens = {}
    for doc_id, text in duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet') "
        "WHERE text IS NOT NULL"
    ).fetchall():
        n_tokens[doc_id] = len(text.split(" "))
        if doc_id % 10 == 0:
            n_tokens[doc_id + 1000000] = n_tokens[doc_id] + 1
    rows = q_cluster_keeper(spark, sf_dir).collect()
    by_cluster = {}
    for r in rows:
        assert r["n_tokens"] == n_tokens[r["doc_id"]]
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        assert len(members) >= 2, "singleton clusters cannot come from a pair graph"
        keepers = [r for r in members if r["keep"]]
        assert len(keepers) == 1
        # keeper = argmax over (n_tokens, -doc_id): longest, then smallest id
        best = min(members, key=lambda r: (-r["n_tokens"], r["doc_id"]))
        assert keepers[0]["doc_id"] == best["doc_id"]


def test_boilerplate_corpus_side_never_shuffles(spark, sf_dir):
    """The corpus branch of the strip must reach its broadcast join
    straight from the scan: every Exchange in the plan belongs to the
    tiny (host, line)-stats side, and the join is broadcast, not
    sort-merge (a corpus shuffle here breaks the 100 TB shape)."""
    from ankiocr_spark.datapipe.curation import q_boilerplate_strip

    df = q_boilerplate_strip(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the probe side (scan -> project -> broadcast join) carries no
    # Exchange: walk the plan tree's left spine above the broadcast join
    left = plan.split("BroadcastExchange")[0]
    joins = left.split("BroadcastHashJoin")
    probe_spine = joins[-1]
    assert "Exchange" not in probe_spine


def test_dsir_weight_separates_target_language(spark, sf_dir):
    """The importance model must rank the target slice above the rest on
    average — the defining property of DSIR weights, invisible to the
    oracle sweep (which replicates the same bucket math)."""
    from ankiocr_spark.datapipe.curation import DSIR_TARGET_LANG, q_dsir_weight

    out = {
        r["doc_id"]: (r["n_bigrams"], r["dsir_logw"])
        for r in q_dsir_weight(spark, sf_dir).collect()
    }
    meta = dict(
        duckdb.sql(
            f"SELECT doc_id, lang FROM read_parquet('{sf_dir}/documents.parquet') "
            "WHERE text IS NOT NULL AND len(str_split(text, ' ')) >= 2"
        ).fetchall()
    )
    assert set(out) == set(meta)
    tgt = [w for d, (_, w) in out.items() if meta[d] == DSIR_TARGET_LANG]
    rest = [w for d, (_, w) in out.items() if meta[d] != DSIR_TARGET_LANG]
    assert sum(tgt) / len(tgt) > sum(rest) / len(rest)
    # n_bigrams rides the scoring aggregation: must equal n_tokens - 1
    n_toks = dict(
        duckdb.sql(
            f"SELECT doc_id, len(str_split(text, ' ')) FROM "
            f"read_parquet('{sf_dir}/documents.parquet') "
            "WHERE text IS NOT NULL AND len(str_split(text, ' ')) >= 2"
        ).fetchall()
    )
    for d, (nb, _) in out.items():
        assert nb == n_toks[d] - 1


def test_dsir_plan_scans_corpus_exactly_twice(spark, sf_dir):
    """Fit pass + score pass — never a third scan for the totals (the
    no-cross-branch-CSE trap: totals must ride the counts table as a
    window, not a separate agg branch that rebuilds the bigram stream)."""
    from ankiocr_spark.datapipe.curation import q_dsir_weight

    plan = (
        q_dsir_weight(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan parquet") == 2


def test_c4_filter_rules_match_python(spark, sf_dir):
    """Independent reimplementation of the C4 line + doc rules over the
    same injected structure."""
    from ankiocr_spark.datapipe.curation import (
        _C4_CTA,
        _C4_JS_LINE,
        C4_JS_MOD,
        C4_MIN_LINE_WORDS,
        C4_PUNCT_MOD,
        C4_TERMINALS,
        q_c4_filter,
    )

    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["clean_text"], r["doc_keep"])
        for r in q_c4_filter(spark, sf_dir).collect()
    }
    for doc_id, text in duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet') "
        "WHERE text IS NOT NULL"
    ).fetchall():
        lines = [text + "." if doc_id % C4_PUNCT_MOD == 0 else text, _C4_CTA]
        if doc_id % C4_JS_MOD == 0:
            lines.append(_C4_JS_LINE)
        kept = [
            l
            for l in lines
            if l[-1:] in C4_TERMINALS
            and len(l.split(" ")) >= C4_MIN_LINE_WORDS
            and "javascript" not in l
        ]
        keep = bool(kept) and "lorem ipsum" not in text and "{" not in text
        assert got[doc_id] == (len(lines), len(kept), "\n".join(kept), keep)


def test_c4_and_badwords_plans_are_shuffle_free(spark, sf_dir):
    """Both gates must fuse into the scan — zero Exchange — so they cost
    one pass at corpus scale."""
    from ankiocr_spark.datapipe.curation import q_badwords_filter, q_c4_filter

    for q in (q_c4_filter, q_badwords_filter):
        plan = q(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, q.__name__


def test_badwords_counts_match_python(spark, sf_dir):
    from ankiocr_spark.datapipe.curation import BAD_WORDS, q_badwords_filter

    got = {
        r["doc_id"]: (r["n_tokens"], r["n_bad"], r["keep"])
        for r in q_badwords_filter(spark, sf_dir).collect()
    }
    hits = 0
    for doc_id, text in duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet') "
        "WHERE text IS NOT NULL"
    ).fetchall():
        toks = [t for t in text.split(" ") if t]
        n_bad = sum(1 for t in toks if t in BAD_WORDS)
        hits += n_bad > 0
        assert got[doc_id] == (len(toks), n_bad, n_bad == 0)
    # the gate must actually bite on the fixture corpus
    assert 0 < hits < len(got)


def test_domain_reputation_exact_and_broadcast(spark, sf_dir):
    """Reputation is one verdict per host, recomputed exactly from integer
    totals driver-side (tolerance 1e-6 absorbs the HALF_UP-vs-banker's
    rounding edge); the gate must split the host set, and the verdict
    join back onto the corpus must be broadcast (no SortMergeJoin)."""
    from ankiocr_spark.datapipe.curation import (
        BAD_WORDS, REP_BAD_AMP, REP_CHARS_CAP, REP_TAU, q_domain_reputation,
    )

    df = q_domain_reputation(spark, sf_dir)
    rows = df.collect()
    verdicts = {(r["host"], r["reputation"], r["host_kept"]) for r in rows}
    assert len(verdicts) == len({r["host"] for r in rows})  # constant per host
    kept_hosts = {h for h, _, k in verdicts if k}
    assert kept_hosts and len(kept_hosts) < len(verdicts)  # the gate splits

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    agg = {}
    for d in docs:
        if d["text"] is None:
            continue
        host = f"h{d['doc_id'] % 11}.example.org"
        toks = [t for t in d["text"].split(" ") if t != ""]
        n, c, t, b = agg.get(host, (0, 0, 0, 0))
        agg[host] = (
            n + 1, c + d["n_chars"], t + len(toks),
            b + sum(1 for x in toks if x in BAD_WORDS),
        )
    for r in rows:
        n, c, t, b = agg[r["host"]]
        bad_rate = 0.0 if t == 0 else b / t  # same guard as the engines
        rep = 0.5 * min(1.0, (c / n) / REP_CHARS_CAP) + 0.5 * max(
            0.0, 1.0 - REP_BAD_AMP * bad_rate
        )
        assert abs(r["reputation"] - rep) <= 1e-6, (r["host"], rep)
        assert r["host_kept"] == (r["reputation"] >= REP_TAU)
        assert r["host_docs"] == n

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_robots_txt_filter_matches_python_and_never_shuffles_corpus(
    spark, sf_dir
):
    """The in-engine robots.txt parse must agree with a from-scratch
    python parse of the same bodies (including the lowercase `disallow:`
    directive and the RFC 9309 empty-Disallow allow-all), and the verdict
    join must be broadcast — the corpus side never shuffles."""
    from ankiocr_spark.datapipe.curation import (
        _robots_txt, q_robots_txt_filter,
    )

    df = q_robots_txt_filter(spark, sf_dir)
    got = {r["doc_id"]: r for r in df.collect()}

    import re

    rules = {}
    for k in range(11):
        prefixes = []
        for line in _robots_txt(k).split("\n"):
            m = re.match(r"(?i)^disallow\s*:\s*(.*)$", line)
            if m and m.group(1).strip():
                prefixes.append(m.group(1).strip())
        rules[f"h{k}.example.org"] = prefixes

    blocked_by_lowercase = 0
    for doc_id, r in got.items():
        path = f"/doc/{doc_id}"
        expect_kept = not any(
            path.startswith(p) for p in rules[r["host"]]
        )
        assert r["kept"] == expect_kept, (doc_id, r["host"])
        assert r["url"] == f"https://{r['host']}{path}"
        if not r["kept"] and (doc_id % 11) % 3 == 1:
            blocked_by_lowercase += 1
    # the case-insensitive directive parse really bites
    assert blocked_by_lowercase > 0
    # empty-Disallow hosts (k % 3 == 2) never block
    assert all(
        r["kept"] for r in got.values() if (r["doc_id"] % 11) % 3 == 2
    )

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_crawl_schedule_politeness_invariants(spark, sf_dir):
    """The frontier schedule must (a) contain exactly the robots-allowed
    urls, (b) assign each host a contiguous 0..n-1 slot sequence in
    doc_id order, (c) honor the parsed Crawl-delay as a NUMERIC
    max — the k%3==1 hosts carry two directives ('10' then '5'; a
    string max picks 5, the r5 review find) so their delay is 10 s,
    1 s default elsewhere, and (d) keep fetch_ms = slot *
    delay_ms — i.e. no two fetches on one host closer than its delay."""
    from ankiocr_spark.datapipe.curation import (
        CRAWL_DEFAULT_DELAY_MS, q_crawl_schedule, q_robots_txt_filter,
    )

    sched = q_crawl_schedule(spark, sf_dir).collect()
    allowed = {
        r["doc_id"] for r in q_robots_txt_filter(spark, sf_dir).collect()
        if r["kept"]
    }
    assert {r["doc_id"] for r in sched} == allowed

    by_host = {}
    for r in sched:
        by_host.setdefault(r["host"], []).append(r)
    assert len(by_host) == 11
    for host, rows in by_host.items():
        k = int(host.split(".")[0][1:])
        want_delay = 10000 if k % 3 == 1 else CRAWL_DEFAULT_DELAY_MS
        rows.sort(key=lambda r: r["doc_id"])
        for slot, r in enumerate(rows):
            assert r["slot"] == slot, (host, r)
            assert r["delay_ms"] == want_delay, (host, r)
            assert r["fetch_ms"] == slot * want_delay
        times = sorted(r["fetch_ms"] for r in rows)
        assert all(b - a >= want_delay for a, b in zip(times, times[1:]))


def test_domain_reputation_zero_token_host(spark, tmp_path):
    """The zero-token guard must actually fire (review find: the fixture
    corpus never exercises it): a host whose documents are all
    empty-but-non-null text has a 0 token sum — its bad_rate is defined
    as 0, so reputation = 0.5·len_part + 0.5, never NULL and never an
    engine-divergent null-vs-skip greatest()."""
    from ankiocr_spark.datapipe.curation import (
        REP_CHARS_CAP, q_domain_reputation,
    )

    rows = []
    for doc_id in range(22):
        if doc_id % 11 == 0:  # host h0: empty texts only
            rows.append((doc_id, "", "en", "web", 0))
        else:
            rows.append((doc_id, "plain words here", "en", "web", 16))
    d = str(tmp_path / "zt")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(f"{d}/documents.parquet")

    got = {r["host"]: r for r in q_domain_reputation(spark, d).collect()}
    h0 = got["h0.example.org"]
    assert h0["reputation"] is not None
    # chars sum 0 → len part 0; bad_rate defined 0 → content part 0.5
    assert abs(h0["reputation"] - 0.5) <= 1e-9
    # other hosts score above the degenerate one (len part > 0)
    assert all(
        r["reputation"] > 0.5 for h, r in got.items() if h != "h0.example.org"
    )


def test_perplexity_buckets_threshold_logic_and_monotonicity(spark, sf_dir):
    """The tercile assignment is recomputed in python FROM the engine's
    own (doc_id, lang, avg_logprob) output — same hash draw, same ceil
    positions, same tie order — so a wrong ceil, a flipped tie-break, or
    a sample/bucket drift shows up even though the DuckDB oracle (which
    replays the same math) never would. Plus the algebraic property the
    oracle can't state: buckets are MONOTONE in score within a language
    (every head score strictly above every middle, middle above tail),
    and all three buckets carry rows (calibration guard)."""
    from ankiocr_spark.datapipe.curation import (
        _MIX_MOD, _MIX_MULT, _MIX_REDUCE, PPL_SAMPLE_RATE,
        q_perplexity_buckets,
    )

    rows = q_perplexity_buckets(spark, sf_dir).collect()
    assert len(rows) > 0

    def draw(doc_id):
        return ((doc_id % _MIX_REDUCE + _MIX_REDUCE) % _MIX_REDUCE
                * _MIX_MULT % _MIX_MOD) / _MIX_MOD

    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    assert len(by_lang) >= 2

    for lang, rs in by_lang.items():
        samp = sorted(
            (r for r in rs if draw(r["doc_id"]) < PPL_SAMPLE_RATE),
            key=lambda r: (-r["avg_logprob"], r["doc_id"]),
        )
        n = len(samp)
        if n == 0:
            assert all(r["bucket"] == "unsampled" for r in rs)
            continue
        t_head = samp[(n + 2) // 3 - 1]["avg_logprob"]
        t_mid = samp[(2 * n + 2) // 3 - 1]["avg_logprob"]
        for r in rs:
            want = ("head" if r["avg_logprob"] >= t_head
                    else "middle" if r["avg_logprob"] >= t_mid
                    else "tail")
            assert r["bucket"] == want, (lang, r)
        # monotonicity: score bands are strictly ordered across buckets
        scores = {b: [r["avg_logprob"] for r in rs if r["bucket"] == b]
                  for b in ("head", "middle", "tail")}
        if scores["head"] and scores["middle"]:
            assert min(scores["head"]) > max(scores["middle"])
        if scores["middle"] and scores["tail"]:
            assert min(scores["middle"]) > max(scores["tail"])

    populated = {r["bucket"] for r in rows}
    assert {"head", "middle", "tail"} <= populated


def test_perplexity_buckets_corpus_side_is_broadcast(spark, sf_dir):
    """The threshold table joins back by BROADCAST: the executed plan
    must contain a BroadcastHashJoin and no SortMergeJoin — the scored
    corpus never shuffles for the bucket assignment (the whole point of
    fitting thresholds on a sample instead of a per-language NTILE)."""
    from ankiocr_spark.datapipe.curation import q_perplexity_buckets

    df = q_perplexity_buckets(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_mojibake_detects_exactly_the_planted_damage(spark, sf_dir):
    """The planted corruption schedule is fully recovered: every
    MOJI_DOUBLE_MOD-th doc has exactly one double-encoding pair, every
    MOJI_FFFD_MOD-th exactly one replacement char, everything else is
    clean (the fixture corpus itself contains neither signature). The
    plan must stay a scan-fused projection — zero Exchange."""
    from ankiocr_spark.datapipe.curation import (
        MOJI_DOUBLE_MOD,
        MOJI_FFFD_MOD,
        q_mojibake,
    )

    df = q_mojibake(spark, sf_dir)
    rows = df.collect()
    assert rows
    for r in rows:
        assert r["n_double_enc"] == int(r["doc_id"] % MOJI_DOUBLE_MOD == 0)
        assert r["n_fffd"] == int(r["doc_id"] % MOJI_FFFD_MOD == 0)
        assert r["is_clean"] == int(
            r["n_fffd"] == 0 and r["n_double_enc"] == 0
        )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
