"""Redirect-chain resolution: chains, terminals, cycles, hop bound."""

from __future__ import annotations

from searchengine_spark.operators.redirects import resolve_redirects


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, redirect_to string")


def test_chain_terminal_and_cycle(spark):
    pages = _pages(
        spark,
        [
            ("a", "b"),
            ("b", "c"),
            ("c", None),   # terminal: a → b → c (2 hops / 1 hop)
            ("x", "y"),
            ("y", "x"),    # 2-cycle
            ("lone", None),
        ],
    )
    got = {
        r.url: (r.final_url, r.n_hops, r.is_loop)
        for r in resolve_redirects(pages, max_hops=8).collect()
    }
    assert got == {
        "a": ("c", 2, False),
        "b": ("c", 1, False),
        "c": ("c", 0, False),
        "x": (None, None, True),
        "y": (None, None, True),
        "lone": ("lone", 0, False),
    }


def test_dangling_target_is_terminal(spark):
    # a redirect to a url with no page row resolves to that url
    pages = _pages(spark, [("a", "gone")])
    got = resolve_redirects(pages, max_hops=4).collect()
    assert [(r.url, r.final_url, r.n_hops, r.is_loop) for r in got] == [
        ("a", "gone", 1, False)
    ]


def test_chain_longer_than_bound_is_flagged(spark):
    # chain of 6 hops with max_hops=4 (2 doubling rounds) → unresolved
    rows = [(f"n{i}", f"n{i+1}") for i in range(6)] + [("n6", None)]
    got = {
        r.url: r.is_loop
        for r in resolve_redirects(_pages(spark, rows), max_hops=4).collect()
    }
    assert got["n0"] is True       # 6 hops > bound
    assert got["n3"] is False      # 3 hops resolves
    assert got["n6"] is False


def test_doubling_resolves_long_chain_in_log_rounds(spark):
    # 40-hop chain under the default 64-hop bound (6 join rounds)
    rows = [(f"n{i}", f"n{i+1}") for i in range(40)] + [("n40", None)]
    got = {
        r.url: (r.final_url, r.n_hops)
        for r in resolve_redirects(_pages(spark, rows), max_hops=64).collect()
    }
    assert got["n0"] == ("n40", 40)
    assert got["n39"] == ("n40", 1)
