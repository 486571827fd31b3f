"""Plan-shape regression tests for the round-4 third-session wave:
the zero-shuffle / broadcast / bounded-window promises in the new
operators' docstrings must appear in the physical plan."""

from __future__ import annotations

import io
import os
from contextlib import redirect_stdout

from pyspark.sql import functions as F


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def _docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def test_domain_split_zero_shuffle_projection(spark, sf_dir):
    from searchengine_spark.operators.sampling import domain_split

    d = _docs(spark, sf_dir).selectExpr(
        "doc_id", "concat('h', CAST(doc_id % 7 AS STRING), '.com') AS pld"
    )
    plan = _plan(domain_split(d, "pld"))
    assert "Exchange" not in plan  # stateless map-side assignment
    assert "Join" not in plan


def test_blocklist_gate_zero_join(spark, sf_dir):
    from searchengine_spark.functions.urls import blocklist_gate_col

    d = _docs(spark, sf_dir).selectExpr(
        "concat('www.site', CAST(doc_id % 9 AS STRING), '.co.uk') AS host"
    )
    plan = _plan(d.select(blocklist_gate_col("host", ["site3.co.uk"])))
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_mime_and_bom_sniff_zero_shuffle(spark, sf_dir):
    from searchengine_spark.operators.multimodal import (
        sniff_bom_sql,
        sniff_mime_sql,
    )

    d = _docs(spark, sf_dir).selectExpr(
        "encode(text, 'utf-8') AS payload"
    )
    plan = _plan(
        d.selectExpr(
            f"{sniff_mime_sql('payload')} AS mime",
            f"{sniff_bom_sql('payload')} AS bom",
        )
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan  # pure codegen, no UDF


def test_zorder_key_zero_shuffle_codegen(spark, sf_dir):
    from searchengine_spark.operators.layout import zorder_key

    d = _docs(spark, sf_dir).selectExpr(
        "doc_id % 1024 AS x", "doc_id % 365 AS y"
    )
    plan = _plan(zorder_key(d, "x", "y"))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_ring_assign_no_join_no_shuffle(spark, sf_dir):
    from searchengine_spark.operators.ring import ring_assign

    d = _docs(spark, sf_dir).selectExpr(
        "concat('u', CAST(doc_id AS STRING)) AS url"
    )
    plan = _plan(ring_assign(d, 8, vnodes=16))
    assert "Join" not in plan
    assert "Exchange" not in plan  # hash JVM-side + one Arrow lookup
    assert "ArrowEvalPython" in plan or "BatchEvalPython" in plan


def test_partition_balance_two_aggs_no_join(spark, sf_dir):
    from searchengine_spark.operators.sharding import partition_balance

    d = _docs(spark, sf_dir).selectExpr(
        "doc_id", "concat('h', CAST(doc_id % 5 AS STRING)) AS host"
    )
    plan = _plan(partition_balance(d, "host", 8, 16))
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_kn_bigrams_single_bigram_scan_branch(spark, sf_dir):
    from searchengine_spark.operators.textstats import kneser_ney_bigrams

    plan = _plan(kneser_ney_bigrams(_docs(spark, sf_dir), min_count=5))
    # the smoothing dims join the TYPE table; the occurrence stream
    # never self-joins and nothing cartesians
    assert "CartesianProduct" not in plan
    # arrays_zip fast path, not the interpreted per-index lambda
    assert "transform(sequence" not in plan


def test_sdm_pruned_scans_no_cartesian(spark, sf_dir):
    from searchengine_spark.operators.positional import sdm_search

    plan = _plan(
        sdm_search(_docs(spark, sf_dir), ["spark", "window"], k=10)
    )
    assert "CartesianProduct" not in plan


def test_rank_corr_bounded_pair_join(spark, sf_dir):
    from searchengine_spark.operators import ranking as RK
    from searchengine_spark.operators.rankeval import rank_correlation

    docs = _docs(spark, sf_dir)
    bm = RK.bm25_search(RK.bm25_table(docs), ["spark", "window"], k=20)
    ql = RK.qlm_search(docs, ["spark", "window"], k=20)
    out = rank_correlation(bm, ql)
    # the theta pair join exists but both inputs are top-k limited:
    # the limits compile to TakeOrderedAndProject, never a global sort
    plan = _plan(out)
    assert plan.count("TakeOrdered") >= 2
    # no global Sort operator anywhere: the only ordering allowed is
    # inside TakeOrderedAndProject nodes (a bare "Sort [" line would be
    # a corpus-wide sort regression)
    assert plan.count("Sort [") == 0, plan
    r = out.collect()[0]
    assert r["n_common"] >= 0
