"""A6 HTML tag term weights: hand-checked golden case + Spark-vs-pycore
parity on the synthetic corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.tagweights import tag_term_weights
from searchengine_spark.pycore.tagweights import TAG_WEIGHTS, tag_token_weights

HTML = b"""<html><head><title>Spark Engine</title></head>
<body><h1>spark rocks</h1>
<p>plain text spark</p>
<b>engine</b> and <a href="/x">engine link</a></body></html>"""


def test_pycore_golden():
    w = tag_token_weights(HTML)
    # 'spark': title(3.0) + h1(2.0); plain <p> text contributes nothing
    assert w["spark"] == pytest.approx(3.0 + 2.0)
    assert w["engine"] == pytest.approx(3.0 + 1.25 + 1.05)  # title + b + a
    assert w["rocks"] == pytest.approx(2.0)
    assert w["link"] == pytest.approx(1.05)
    assert "plain" not in w
    assert set(TAG_WEIGHTS) == {
        "title", "h1", "h2", "h3", "b", "strong", "a", "i", "em", "h5", "h6"
    }


def test_spark_matches_pycore(spark):
    from searchengine_spark.crawler.synth import gen_corpus

    rows, _, _ = gen_corpus(60, 42)
    pages = spark.createDataFrame(
        [(u, h) for u, _, h, _, _ in rows], "url string, html binary"
    )
    got = {
        (r["url"], r["token"]): round(r["weight"], 9)
        for r in tag_term_weights(pages).collect()
    }
    expected = {}
    for u, _, h, _, _ in rows:
        for tok, w in tag_token_weights(h).items():
            expected[(u, tok)] = round(w, 9)
    assert got == expected
