"""Hand-computed semantics checks for the statistical text models
(operators/text.py: bigram_lm_score, nb_classify). The full-corpus
cross-engine check is tests/test_oracle_parity.py (txt13/txt14)."""

from __future__ import annotations

import math

import pytest

from dbt_analytics_spark.operators.text import bigram_lm_score, nb_classify


def test_bigram_lm_score_hand_computed(spark):
    # Train corpus: "a b a b" → bigrams: (a b) x2? no — "a b a b" gives
    # a-b, b-a, a-b → c2: {"a b": 2, "b a": 1}; c1: {a: 2, b: 1};
    # successor vocab V = {b, a} → 2.
    train = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    score = spark.createDataFrame(
        [(10, "a b"), (11, "a c")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in bigram_lm_score(train, score).collect()}
    # doc 10: one bigram "a b": ln((2+1)/(2+2)) = ln(0.75)
    assert rows[10].n_bigrams == 1
    assert rows[10].avg_logp == pytest.approx(round(math.log(3 / 4), 6), abs=1e-9)
    # doc 11: unseen bigram "a c", seen head a: ln((0+1)/(2+2)) = ln(0.25)
    assert rows[11].avg_logp == pytest.approx(round(math.log(1 / 4), 6), abs=1e-9)


def test_bigram_lm_single_token_docs_omitted(spark):
    train = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    score = spark.createDataFrame([(2, "solo")], "doc_id long, text string")
    assert bigram_lm_score(train, score).count() == 0


def test_nb_classify_hand_computed(spark):
    # Two labels with disjoint vocab; a test doc of pure "x" tokens must
    # classify as the label that saw "x".
    train = spark.createDataFrame(
        [(1, "x x y", "en"), (2, "u u v", "de")],
        "doc_id long, text string, lang string",
    )
    test = spark.createDataFrame(
        [(10, "x x", "en"), (11, "u v u", "de")],
        "doc_id long, text string, lang string",
    )
    out = {r.doc_id: r for r in nb_classify(train, test).collect()}
    assert out[10].predicted == "en" and out[10].correct
    assert out[11].predicted == "de" and out[11].correct
    # Hand-check doc 10's winning score: V=4 (x,y,u,v), prior ln(1/2),
    # P(x|en) = (2+1)/(3+4) → score = ln(0.5) + 2*ln(3/7).
    want = round(math.log(0.5) + 2 * math.log(3 / 7), 6)
    assert out[10].score == pytest.approx(want, abs=1e-9)


def test_nb_classify_tie_breaks_label_asc(spark):
    # Symmetric labels → identical rounded scores; argmax must break on
    # label ascending, deterministically.
    train = spark.createDataFrame(
        [(1, "x", "aa"), (2, "x", "bb")],
        "doc_id long, text string, lang string",
    )
    test = spark.createDataFrame(
        [(10, "x", "bb")], "doc_id long, text string, lang string"
    )
    row = nb_classify(train, test).collect()[0]
    assert row.predicted == "aa"
    assert not row.correct


# ---------------------------------------------------------------------------
# Property-based crosschecks against pure-Python references
# ---------------------------------------------------------------------------

from collections import Counter
from itertools import combinations

from hypothesis import given, settings
from hypothesis import strategies as st

_doc = st.lists(
    st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=12
).map(" ".join)
_corpus = st.lists(_doc, min_size=2, max_size=8)


def _py_bigrams(text):
    w = text.split()
    return [(w[i], w[i + 1]) for i in range(len(w) - 1)]


@settings(max_examples=10, deadline=None)
@given(docs=_corpus)
def test_bigram_lm_matches_python_reference(spark, docs):
    from hypothesis import assume

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    train = [t for i, t in rows if i % 2 == 0]
    # Degenerate all-singleton train halves have no bigrams → the model is
    # undefined (documented bigram_lm_score precondition).
    assume(any(len(t.split()) >= 2 for t in train))
    c2 = Counter(g for t in train for g in _py_bigrams(t))
    c1 = Counter(g[0] for t in train for g in _py_bigrams(t))
    V = len({g[1] for t in train for g in _py_bigrams(t)})
    want = {}
    for i, t in rows:
        grams = _py_bigrams(t)
        if not grams:
            continue
        lps = [
            math.log((c2.get(g, 0) + 1) / (c1.get(g[0], 0) + V)) for g in grams
        ]
        want[i] = (len(grams), round(sum(lps) / len(lps), 6))
    got = {
        r.doc_id: (r.n_bigrams, r.avg_logp)
        for r in bigram_lm_score(
            df.filter("doc_id % 2 = 0"), df
        ).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], abs=2e-6)


@settings(max_examples=10, deadline=None)
@given(docs=_corpus)
def test_exact_substring_matches_python_reference(spark, docs):
    from dbt_analytics_spark.operators.dedup import exact_substring_pairs

    K, CAP = 3, 4
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def windows(text):
        w = text.split()
        if len(w) < K:
            return {" ".join(w)}
        return {" ".join(w[i : i + K]) for i in range(len(w) - K + 1)}

    inv = {}
    for i, t in rows:
        for g in windows(t):
            inv.setdefault(g, set()).add(i)
    want = Counter()
    for g, ds in inv.items():
        if 2 <= len(ds) <= CAP:
            for a, b in combinations(sorted(ds), 2):
                want[(a, b)] += 1
    got = {
        (r.doc_a, r.doc_b): r.n_shared_windows
        for r in exact_substring_pairs(df, k=K, max_gram_docs=CAP).collect()
    }
    assert got == dict(want)


# ---------------------------------------------------------------------------
# Heavy hitters (SpaceSaving) contracts
# ---------------------------------------------------------------------------

def test_heavy_hitters_bounds_vs_exact(spark):
    from pyspark.sql import functions as F

    from dbt_analytics_spark.operators.text import heavy_hitters, tokens
    from dbt_analytics_spark.sources import load_testdata

    from .conftest import SF_DIR

    docs = load_testdata(spark, SF_DIR)["documents"]
    exact = {
        r.term: r.n
        for r in docs.select(
            F.explode(tokens(F.lower(F.col("text")))).alias("term")
        )
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = heavy_hitters(docs, k=20, capacity=512).collect()
    assert len(got) == min(20, len(exact))
    for r in got:
        true = exact[r.term]
        # SpaceSaving: est overestimates by at most err_bound.
        assert true <= r.est_count <= true + r.err_bound
    # Every term whose true count beats (k-th estimate + its error) must
    # be IN the top-k (the classic guarantee); with capacity >> vocab the
    # sketch is exact, so simply require the true top-5 present.
    top5 = sorted(exact, key=lambda t: (-exact[t], t))[:5]
    assert set(top5) <= {r.term for r in got}


def test_heavy_hitters_eviction_path(spark):
    # Force evictions with a tiny capacity: bounds must still hold.
    from dbt_analytics_spark.operators.text import heavy_hitters

    import pytest as _pytest

    rows = [(i, "alpha " * 30 + "beta " * 20 + f"rare{i}") for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.term: r for r in heavy_hitters(docs, k=5, capacity=8).collect()}
    assert got["alpha"].est_count >= 1500  # true 1500, overestimate allowed
    assert got["alpha"].est_count - got["alpha"].err_bound <= 1500
    assert got["beta"].est_count >= 1000
    assert list(got)  # non-empty
    with _pytest.raises(ValueError, match="capacity"):
        heavy_hitters(docs, k=10, capacity=4)


def test_session_window_matches_lag_formulation(spark):
    # The built-in session_window and the lag-window sessionize must agree
    # on session envelopes (no exact-boundary events in the testdata; the
    # >= / > difference is covered by the oracle-parity test instead).
    from pyspark.sql import functions as F

    from dbt_analytics_spark.operators.sessionize import (
        session_window_stats,
        sessionize,
    )
    from dbt_analytics_spark.sources import load_testdata

    from .conftest import SF_DIR

    ev = load_testdata(spark, SF_DIR)["events"]
    built_in = {
        (r.user_id, r.session_start, r.session_end_ts, r.n_events)
        for r in session_window_stats(ev, gap="30 minutes").collect()
    }
    lagged = {
        (r.user_id, r.start, r.end, r.n)
        for r in sessionize(ev, gap="30 minutes")
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("start"),
            F.max("ts").alias("end"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .collect()
    }
    assert built_in == lagged


def test_temperature_mixture_boosts_tail_sources(spark):
    # alpha = 0.5: keep RATE must be non-increasing in source size (the
    # whole point of temperature rebalancing), and the kept total must
    # land near the 30% target.
    from dbt_analytics_spark.queries.llm import smp4_temperature_mixture
    from dbt_analytics_spark.sources import load_testdata

    from .conftest import SF_DIR

    docs = load_testdata(spark, SF_DIR)["documents"]
    n_total = docs.count()
    kept = smp4_temperature_mixture(spark, SF_DIR)
    rates = {
        r.source: r.rate for r in kept.select("source", "rate").distinct().collect()
    }
    sizes = {
        r.source: r.n for r in docs.groupBy("source").count().withColumnRenamed("count", "n").collect()
    }
    pairs = sorted(sizes.items(), key=lambda kv: kv[1])
    for (s_small, n_small), (s_big, n_big) in zip(pairs, pairs[1:]):
        if n_small < n_big and s_small in rates and s_big in rates:
            assert rates[s_small] >= rates[s_big]
    # Deterministic md5 draw: expected total = sum(n_s * rate_s); binomial
    # scatter at these sizes stays well within 20%.
    expected = sum(sizes[s] * rates.get(s, 0.0) for s in sizes)
    assert abs(kept.count() - expected) < max(50, 0.2 * expected)
    assert kept.count() < n_total


def test_heavy_hitters_cross_partition_eviction_bound(spark):
    # The review scenario: a term heavy in partition A but EVICTED from
    # A's final sketch, tracked only in partition B. The naive merge
    # underestimates (50 < 150); the floor-marker accounting must restore
    # the two-sided bound.
    from dbt_analytics_spark.operators.text import heavy_hitters

    # Partition A: z appears 100 times, then 800 distinct terms flood a
    # capacity-16 sketch and evict it. Partition B: z appears 50 times.
    # RDD-level union pins exactly two partitions (DataFrame union would
    # let AQE coalesce them).
    sc = spark.sparkContext
    rows_a = [(0, "z " * 100)] + [
        (i, " ".join(f"f{i}_{j}" for j in range(40))) for i in range(1, 21)
    ]
    rows_b = [(100, "z " * 50)]
    rdd = sc.parallelize(rows_a, 1).union(sc.parallelize(rows_b, 1))
    docs = spark.createDataFrame(rdd, "doc_id long, text string")
    assert docs.rdd.getNumPartitions() == 2

    got = {r.term: r for r in heavy_hitters(docs, k=16, capacity=16).collect()}
    assert "z" in got, "z is tracked in partition B and must be returned"
    z = got["z"]
    true = 150
    assert z.est_count >= true, (z.est_count, z.err_bound)
    assert z.est_count - z.err_bound <= true, (z.est_count, z.err_bound)


@settings(max_examples=8, deadline=None)
@given(
    docs=_corpus,
    seg=st.integers(min_value=2, max_value=8),
)
def test_doc_bigrams_segmented_row_identical(spark, docs, seg):
    from dbt_analytics_spark.operators.text import _doc_bigrams

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    base = sorted(
        (r["__id"], r["gram"])
        for r in _doc_bigrams(df, "doc_id", "text").collect()
    )
    got = sorted(
        (r["__id"], r["gram"])
        for r in _doc_bigrams(df, "doc_id", "text", segment_tokens=seg).collect()
    )
    assert got == base


def test_canonicalize_url_rules(spark):
    """canonicalize_url (operators/text.py): one identity for every
    scheme/www/default-port/fragment/tracking-param/trailing-slash/
    param-order/unreserved-percent-encoding variant; path case preserved
    (URL paths are case-sensitive); non-default ports kept — including
    the OTHER scheme's default (http://x:443 is not https://x:443)."""
    from dbt_analytics_spark.operators.text import canonicalize_url

    rows = [
        "HTTPS://WWW.Site.Example.com:443/Path/3/?utm_source=x&b=2&a=1#f",
        "http://site.example.com/Path/3?a=1&b=2",
        "https://site.example.com/Path/3/?b=2&a=1&fbclid=abc",
        "https://site.example.com/P%61th/3?%61=1&b=2",  # %61 = 'a'
        "https://other.com",
        "https://other.com/?ref=tw#top",
        "https://other.com:8080/",  # non-default port is identity
        "https://site.example.com/path/3",  # path case differs -> distinct
        "http://other.com:443/",  # :443 NOT http's default -> kept
        "https://other.com:80/",  # :80 NOT https's default -> kept
        "http://other.com:80/",  # scheme's own default -> stripped
        "https://site.example.com/Path%2F3",  # reserved escape kept
        "https://other.com/%7Ehome",
        "https://other.com/%7ehome",  # hex case-insensitive
    ]
    df = spark.createDataFrame([(u,) for u in rows], ["url"])
    got = [
        r["c"]
        for r in df.select(canonicalize_url("url").alias("c")).collect()
    ]
    assert (
        got[0] == got[1] == got[2] == got[3]
        == "site.example.com/Path/3?a=1&b=2"
    )
    assert got[4] == got[5] == "other.com/"
    assert got[6] == "other.com:8080/"
    assert got[7] == "site.example.com/path/3"
    assert got[7] != got[0]
    assert got[8] == "other.com:443/"
    assert got[9] == "other.com:80/"
    assert got[10] == "other.com/"
    assert got[11] == "site.example.com/Path%2F3"  # %2F is reserved
    assert got[12] == got[13] == "other.com/~home"


def _py_canonicalize(url: str) -> str:
    """Pure-Python reference of canonicalize_url's rule, implemented
    independently (own regexes, own decode-form list built from the RFC
    3986 unreserved set — NOT imported from the operator)."""
    import re
    import string

    u = re.sub(r"#.*$", "", url.strip())
    # Sequential unreserved-escape decode: codepoint order, upper-case
    # hex form then lower-case — the operator's documented shared order.
    for ch in sorted("-._~" + string.digits + string.ascii_letters, key=ord):
        for form in dict.fromkeys((f"%{ord(ch):02X}", f"%{ord(ch):02x}")):
            u = u.replace(form, ch)
    m = re.search(r"^([A-Za-z]+)://", u)
    scheme = (m.group(1) if m else "").lower()
    m = re.search(r"^[A-Za-z]+://([^/?#]+)", u)
    host = (m.group(1) if m else "").lower()
    host = re.sub(r"^www\.", "", host)
    if scheme == "http":
        host = re.sub(r":80$", "", host)
    elif scheme == "https":
        host = re.sub(r":443$", "", host)
    m = re.search(r"^[A-Za-z]+://[^/?#]+([^?#]*)", u)
    path = re.sub(r"/+$", "", m.group(1) if m else "") or "/"
    m = re.search(r"\?([^#]*)", u)
    q = m.group(1) if m else ""
    kept = sorted(
        p
        for p in q.split("&")
        if p != ""
        and not re.match(r"^(utm_[a-z]+|gclid|fbclid|ref)=", p)
    )
    return host + path + ("?" + "&".join(kept) if kept else "")


def test_canonicalize_url_matches_python_reference(spark):
    """Property check: the Spark expression tree and the pure-Python
    reference agree on generated URL variants (host case, www, default
    and non-default ports, path depth/trailing slashes, shuffled and
    tracking params, fragments)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dbt_analytics_spark.operators.text import canonicalize_url

    # Segments mix plain chars with percent escapes: unreserved (%61,
    # %7E/%7e — decoded), reserved (%2F — kept), and the pathological
    # truncated form %4%41 (pins the documented sequential-replace
    # semantics on non-URL garbage).
    word = st.text("abcdefgzXY09", min_size=1, max_size=6).flatmap(
        lambda w: st.sampled_from(
            [w, w + "%61", "%7E" + w, "%7e" + w, w + "%2F", "%4%41" + w]
        )
    )
    param = st.sampled_from(
        ["a=1", "b=2", "z=9&", "%62=2", "utm_source=x", "utm_medium=y",
         "gclid=g1", "fbclid=f", "ref=tw", "empty="]
    )
    urls = st.builds(
        lambda scheme, www, host, port, segs, slash, params, frag: (
            scheme
            + "://"
            + ("WWW." if www else "")
            + host
            + ".example.com"
            + port
            + "/"
            + "/".join(segs)
            + ("/" if slash and segs else "")
            + ("?" + "&".join(params) if params else "")
            + ("#sec" if frag else "")
        ),
        scheme=st.sampled_from(["http", "HTTPS", "https"]),
        www=st.booleans(),
        host=word,
        port=st.sampled_from(["", ":80", ":443", ":8080"]),
        segs=st.lists(word, max_size=3),
        slash=st.booleans(),
        params=st.lists(param, max_size=4),
        frag=st.booleans(),
    )

    @settings(max_examples=8, deadline=None)
    @given(batch=st.lists(urls, min_size=1, max_size=25))
    def check(batch):
        df = spark.createDataFrame([(u,) for u in batch], ["url"])
        got = [
            r["c"]
            for r in df.select(canonicalize_url("url").alias("c")).collect()
        ]
        assert got == [_py_canonicalize(u) for u in batch]

    check()
