"""Property-based parity tests (hypothesis): the pure-Python normative
implementations in pycore and the distributed operators must agree on
RANDOM inputs, not just the golden vectors. Each example batches many
rows into one Spark job so the suite stays fast."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from searchengine_spark.pycore.tokenizer import tokenize
from searchengine_spark.pycore.urltools import xxhash64

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# text with the characters that exercise the tokenizer's edges:
# apostrophes (edge-trim), unicode, digits, separators
_text = st.text(
    alphabet=st.sampled_from(list("abz09'’ .,-_/\nÉß中")), max_size=60
)


@settings(**_SETTINGS)
@given(st.lists(_text, min_size=1, max_size=25))
def test_tokenizer_sql_matches_pycore(spark, texts):
    from searchengine_spark.functions.text import tokens_sql

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    got = {
        r.i: list(r.toks)
        for r in df.select("i", F.expr(tokens_sql("text")).alias("toks")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == tokenize(t), (i, t)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.one_of(st.text(alphabet="ab", min_size=0, max_size=12), st.binary(max_size=12)),
        min_size=1,
        max_size=25,
    )
)
def test_xxhash64_matches_spark(spark, datas):
    rows = [(i, d if isinstance(d, str) else d.decode("latin-1")) for i, d in enumerate(datas)]
    df = spark.createDataFrame(rows, "i long, s string")
    got = {r.i: r.h for r in df.select("i", F.xxhash64("s").alias("h")).collect()}
    for i, (orig_i, s) in enumerate(rows):
        assert got[orig_i] == xxhash64(s), s


def _phrase_brute(tokens: list[str], phrase: list[str]) -> int:
    n, k = len(tokens), len(phrase)
    return sum(1 for s in range(n - k + 1) if tokens[s : s + k] == phrase)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12),
        min_size=1,
        max_size=12,
    ),
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=3),
)
def test_phrase_match_matches_bruteforce(spark, docs, phrase):
    from searchengine_spark.operators.positional import phrase_match

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    from searchengine_spark.operators.positional import positional_postings

    got = {
        r.doc_id: r.n_occ
        for r in phrase_match(positional_postings(df), phrase).collect()
    }
    for i, toks in enumerate(docs):
        exp = _phrase_brute(toks, phrase)
        assert got.get(i, 0) == exp, (toks, phrase)


def _walk(mapping: dict[int, int | None], start: int, bound: int):
    cur, hops = start, 0
    while hops < bound:
        nxt = mapping.get(cur, "TERM")
        if nxt == "TERM" or nxt is None:
            return cur, hops
        cur, hops = nxt, hops + 1
    return None, None  # loop / over bound


@settings(**_SETTINGS)
@given(
    st.dictionaries(
        st.integers(0, 11),
        st.one_of(st.none(), st.integers(0, 11)),
        min_size=1,
        max_size=12,
    )
)
def test_resolve_redirects_matches_walk(spark, mapping):
    from searchengine_spark.operators.redirects import resolve_redirects

    rows = [
        (f"u{k}", None if v is None else f"u{v}") for k, v in mapping.items()
    ]
    df = spark.createDataFrame(rows, "url string, redirect_to string")
    got = {
        r.url: (r.final_url, r.n_hops, r.is_loop)
        for r in resolve_redirects(df, max_hops=16).collect()
    }
    assert set(got) == {f"u{k}" for k in mapping}
    for k, v in mapping.items():
        if v is None:
            assert got[f"u{k}"] == (f"u{k}", 0, False)
            continue
        final, hops = _walk(mapping, k, 16)
        if final is None:
            assert got[f"u{k}"] == (None, None, True), (k, mapping)
        else:
            assert got[f"u{k}"] == (f"u{final}", hops, False), (k, mapping)


def test_lm_trigram_hand_computed(spark):
    import math

    from searchengine_spark.operators.textstats import lm_score_trigram

    rows = [(0, "a b c a b c"), (1, "a b"), (2, "x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_trigrams, r.avg_logprob)
           for r in lm_score_trigram(df).collect()}
    # short docs: no trigram -> (0, 0.0)
    assert got[1] == (0, 0.0) and got[2] == (0, 0.0)
    # doc 0 trigrams: abc, bca, cab, abc; bigram stream (docs >= 2 toks):
    # doc0: ab bc ca ab bc; doc1: ab
    c3 = {("a","b","c"): 2, ("b","c","a"): 1, ("c","a","b"): 1}
    x2 = {("a","b"): 2, ("b","c"): 1, ("c","a"): 1}
    c2 = {("a","b"): 3, ("b","c"): 2, ("c","a"): 1}
    x1 = {"a": 3, "b": 2, "c": 1}
    cuni = {"a": 3, "b": 3, "c": 2, "x": 1}
    T, V = 9, 4
    def p(w1, w2, w3):
        return (0.6 * (c3[(w1,w2,w3)] / x2[(w1,w2)])
                + 0.3 * (c2[(w2,w3)] / x1[w2])
                + 0.1 * ((cuni[w3] + 1) / (T + V)))
    seq = [("a","b","c"), ("b","c","a"), ("c","a","b"), ("a","b","c")]
    exp = sum(math.log(p(*t)) for t in seq) / 4
    n, s = got[0]
    assert n == 4
    assert abs(s - exp) < 1e-9


def test_tfidf_cosine_pairs_exact_and_dfcut(spark):
    from searchengine_spark.operators.dedup import tfidf_cosine_pairs

    rows = [
        (0, "apple banana cherry"),
        (1, "apple banana cherry"),   # exact dup of 0 -> cos 1
        (2, "apple zebra yak"),
        (3, "walrus otter seal"),     # shares nothing
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.src, r.dst): r.cos
           for r in tfidf_cosine_pairs(df, threshold=0.99).collect()}
    assert set(got) == {(0, 1)}
    assert abs(got[(0, 1)] - 1.0) < 1e-12
    # ordering invariant
    assert all(s < d for s, d in got)
    # df-cut: with max_df=1 every shared token is dropped from the dot
    # -> no candidate pairs at all
    assert tfidf_cosine_pairs(df, threshold=0.0, max_df=1).count() == 0


def test_term_burstiness_hand_computed(spark):
    from searchengine_spark.operators.textstats import term_burstiness

    rows = [
        (0, "topic topic glue"),
        (1, "topic glue"),
        (2, "topic topic topic glue"),
        (3, "glue"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.token: (r.df, r.df2, r.burstiness)
           for r in term_burstiness(df, min_df=3).collect()}
    # topic: in 3 docs, twice-or-more in 2 of them; glue: never repeats
    assert got["topic"] == (3, 2, 2 / 3)
    assert got["glue"] == (4, 0, 0.0)


def test_good_turing_hand_computed(spark):
    from searchengine_spark.operators.textstats import good_turing_discounts

    # freq spectrum: 'a' x1 type with count 3; two types with count 1
    # (b, c); one type with count 2 (d d)
    rows = [(0, "a a a b c d d")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.r: (r.n_r, r.r_star)
           for r in good_turing_discounts(df, max_r=10).collect()}
    # N_1 = 2, N_2 = 1, N_3 = 1
    assert got[1][0] == 2 and abs(got[1][1] - 2 * (1 / 2)) < 1e-12
    assert got[2][0] == 1 and abs(got[2][1] - 3 * (1 / 1)) < 1e-12
    # r=3 has no N_4 -> undiscounted r* = r
    assert got[3] == (1, 3.0)
