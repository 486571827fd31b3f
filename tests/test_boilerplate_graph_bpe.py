"""Round-3 additions: boilerplate strip, triangle counting, BPE merges."""

from __future__ import annotations

from pyspark.sql import functions as F

from searchengine_spark.operators.boilerplate import (
    frequent_lines,
    strip_boilerplate,
)
from searchengine_spark.operators.bpe import bpe_train, merged_chunk
from searchengine_spark.operators.graphstats import triangle_counts


# ---------------------------------------------------------------- boilerplate
def _pages(spark):
    rows = []
    for h in ("h1", "h2"):
        for i in range(4):
            rows.append(
                (
                    f"{h}-{i}",
                    h,
                    f"unique {h} body {i}\ncopyright footer {h}\nnav home",
                )
            )
    # a one-page host: nothing can cross min_df=2
    rows.append(("h3-0", "h3", "lonely page\nits own footer"))
    return spark.createDataFrame(rows, "doc_id string, host string, text string")


def test_frequent_lines_per_host(spark):
    freq = {
        (r.host, r.line): r.df for r in frequent_lines(_pages(spark)).collect()
    }
    assert freq[("h1", "copyright footer h1")] == 4
    assert freq[("h1", "nav home")] == 4
    assert ("h2", "copyright footer h1") not in freq  # host-scoped
    assert not any(h == "h3" for h, _ in freq)  # min_df floor


def test_strip_preserves_unique_lines_and_order(spark):
    got = {
        r.doc_id: (r.clean_text, r.n_kept, r.n_dropped)
        for r in strip_boilerplate(_pages(spark)).collect()
    }
    assert got["h1-2"] == ("unique h1 body 2", 1, 2)
    assert got["h3-0"] == ("lonely page\nits own footer", 2, 0)
    assert len(got) == 9  # every input page survives as a row


def test_strip_all_boilerplate_page_becomes_empty(spark):
    rows = [(f"d{i}", "h", "same line\nsame line two") for i in range(3)]
    got = {
        r.doc_id: (r.clean_text, r.n_kept, r.n_dropped)
        for r in strip_boilerplate(spark.createDataFrame(
            rows, "doc_id string, host string, text string"
        )).collect()
    }
    assert got["d0"] == ("", 0, 2)


def test_strip_matches_on_trimmed_lines(spark):
    # indentation variants of one boilerplate line collapse at match time
    rows = [
        ("d0", "h", "body zero\n  footer line"),
        ("d1", "h", "body one\nfooter line  "),
        ("d2", "h", "body two\nfooter line"),
    ]
    got = {
        r.doc_id: r.clean_text
        for r in strip_boilerplate(spark.createDataFrame(
            rows, "doc_id string, host string, text string"
        )).collect()
    }
    assert got == {"d0": "body zero", "d1": "body one", "d2": "body two"}


# ------------------------------------------------------------------ triangles
def test_triangle_counts_two_shared_triangles(spark):
    # triangle 1-2-3 and 3-4-5; duplicate + reversed + self-loop edges
    # must not change anything
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3), (2, 1), (6, 6)],
        "src int, dst int",
    )
    got = {
        r.node: (r.degree, r.triangles, r.clustering)
        for r in triangle_counts(edges).collect()
    }
    assert got[1] == (2, 1, 1.0)
    assert got[3][:2] == (4, 2)
    assert abs(got[3][2] - 1 / 3) < 1e-12
    assert 6 not in got  # self-loop-only node has no canonical edges


def test_triangle_counts_hub_star_has_none(spark):
    # star graph: hub 0 with 6 leaves — wedges everywhere, no triangle
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 7)], "src int, dst int"
    )
    got = triangle_counts(edges)
    assert got.agg(F.sum("triangles")).collect()[0][0] == 0
    assert {r.degree for r in got.where("node = 0").collect()} == {6}


def test_triangle_counts_k4(spark):
    # complete graph on 4 nodes: 4 triangles, each node in 3, clustering 1
    edges = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a < b],
        "src int, dst int",
    )
    rows = triangle_counts(edges).collect()
    assert all(r.triangles == 3 and r.clustering == 1.0 for r in rows)


# ------------------------------------------------------------------------ bpe
def test_bpe_sennrich_example(spark):
    # the ACL'16 worked example: low x5, lower x2, newest x6, widest x3
    toks = spark.createDataFrame(
        [("low",)] * 5 + [("lower",)] * 2 + [("newest",)] * 6 + [("widest",)] * 3,
        "token string",
    )
    got = [
        (r["rank"], r["left"], r["right"], r["freq"])
        for r in bpe_train(toks, n_merges=4).collect()
    ]
    assert got == [
        (1, "e", "s", 9),
        (2, "es", "t", 9),
        (3, "l", "o", 7),
        (4, "lo", "w", 7),
    ]


def test_bpe_merge_is_greedy_left_to_right(spark):
    # 'aaa' yields TWO (a,a) pair counts but merging produces 'aa a',
    # so the second merge is (aa, a) — the published greedy semantics
    toks = spark.createDataFrame([("aaa",)] * 4, "token string")
    got = [
        (r["rank"], r["left"], r["right"], r["freq"])
        for r in bpe_train(toks, n_merges=2).collect()
    ]
    assert got == [(1, "a", "a", 8), (2, "aa", "a", 4)]


def test_bpe_stops_when_out_of_pairs(spark):
    toks = spark.createDataFrame([("ab",)] * 3, "token string")
    got = bpe_train(toks, n_merges=5).collect()
    assert len(got) == 1  # only (a, b) exists; merged token has no pairs


def test_merged_chunk():
    assert merged_chunk("|lo |w ") == "|low "


def test_bpe_piece_counts(spark):
    from searchengine_spark.operators.bpe import bpe_piece_counts

    # after 1 merge, 'es' is one piece: test -> t+es+t, best -> b+es+t
    occ = spark.createDataFrame(
        [(1, "test"), (1, "best"), (2, "ab")],
        "doc_id int, token string",
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_pieces)
        for r in bpe_piece_counts(occ, n_merges=1).collect()
    }
    # merge rank1 = most frequent pair; pairs: te1 es2 st2 be1 ab1 ->
    # tie es/st -> '|es ' < '|st ' so es merges
    assert got[1] == (2, 6)  # t,es,t + b,es,t
    assert got[2] == (1, 2)  # untouched


def test_kmv_exact_below_k(spark):
    from searchengine_spark.operators.sketches import kmv_distinct

    df = spark.createDataFrame(
        [(f"v{i % 7}",) for i in range(100)], "token string"
    )
    row = kmv_distinct(df, "token", k=64).collect()[0]
    assert row.n_kept == 7
    assert row.est_distinct == 7.0  # exact when under k


def test_kmv_estimate_within_tolerance(spark):
    from searchengine_spark.operators.sketches import kmv_distinct

    n = 5000
    df = spark.createDataFrame(
        [(f"value-{i}",) for i in range(n)], "token string"
    ).repartition(8)
    row = kmv_distinct(df, "token", k=256).collect()[0]
    assert row.n_kept == 256
    # KMV relative error ~ 1/sqrt(k) ~ 6%; allow 4 sigma
    assert abs(row.est_distinct - n) / n < 0.25


def test_kmv_deterministic_across_partitionings(spark):
    from searchengine_spark.operators.sketches import kmv_distinct

    rows = [(f"tok{i}",) for i in range(1000)]
    a = spark.createDataFrame(rows, "token string").repartition(2)
    b = spark.createDataFrame(rows, "token string").repartition(16)
    ra = kmv_distinct(a, "token", k=128).collect()[0]
    rb = kmv_distinct(b, "token", k=128).collect()[0]
    assert (ra.kth_hash, ra.est_distinct) == (rb.kth_hash, rb.est_distinct)


def test_strip_null_text_behaves_as_empty(spark):
    rows = [("d0", "h", None), ("d1", "h", "body\nbody2")]
    got = {
        r.doc_id: (r.clean_text, r.n_kept, r.n_dropped)
        for r in strip_boilerplate(spark.createDataFrame(
            rows, "doc_id string, host string, text string"
        )).collect()
    }
    assert got["d0"] == ("", 1, 0)  # the single empty line survives
    assert got["d1"] == ("body\nbody2", 2, 0)
