"""Sources & sinks: S1/S2/P2 JSON corpus ingest, S4/T1 token-sorted
index sink, S8/J4 doc-map sink + url resolution, F3 lemma table."""

from __future__ import annotations

import glob
import json
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from searchengine_spark.functions.text import FIXTURE_LEMMAS
from searchengine_spark.operators import docmap as DM
from searchengine_spark.operators import query as Q
from searchengine_spark.operators import tfidf as TF
from searchengine_spark.sources.jsoncorpus import read_corpus


def _write(path: str, obj) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        if isinstance(obj, str):
            f.write(obj)
        else:
            json.dump(obj, f)


def test_json_corpus_recursive_skip_semantics(spark, tmp_path):
    """S1 recursive scan + P2 suffix filter + S2 decode-skip + P1
    null-skip, end-to-end into the postings DAG."""
    root = str(tmp_path / "DEV")
    _write(
        f"{root}/siteA/0.json",
        {"url": "https://a.test/x", "content": "spark window dup", "encoding": "utf-8"},
    )
    _write(
        f"{root}/siteA/deep/1.json",
        {"url": "https://a.test/y", "content": "fast the spark", "encoding": "utf-8"},
    )
    _write(f"{root}/siteB/broken.json", "{not valid json!!")  # S2: skipped
    _write(
        f"{root}/siteB/null.json",
        {"url": None, "content": "orphan content", "encoding": "utf-8"},
    )  # P1: skipped
    _write(f"{root}/siteB/readme.txt", "not a corpus file")  # P2: never read

    corpus = read_corpus(spark, root)
    rows = {r["url"]: r for r in corpus.collect()}
    assert set(rows) == {"https://a.test/x", "https://a.test/y"}
    assert rows["https://a.test/x"]["content"] == "spark window dup"
    assert all(r["src_file"].endswith(".json") for r in rows.values())

    # the ingested corpus feeds the existing index DAG unchanged
    postings = TF.build_postings(corpus, id_col="url", text_col="content")
    hit = Q.and_query(postings, ["spark", "dup"]).collect()
    assert [r["doc_id"] for r in hit] == ["https://a.test/x"]


def test_write_sorted_index_roundtrip_and_seek_property(spark, sf_dir, tmp_path):
    """S4/T1 — the sink must round-trip exactly AND give the seek
    property it claims: per-file token ranges are disjoint, so a
    token-equality scan prunes to one file on parquet min/max stats."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    postings = TF.build_postings(docs)
    path = str(tmp_path / "sorted_index")
    TF.write_sorted_index(postings, path)

    back = spark.read.parquet(path)
    orig = {tuple(r) for r in postings.collect()}
    assert {tuple(r) for r in back.collect()} == orig

    ranges = []
    for f in glob.glob(os.path.join(path, "part-*.parquet")):
        t = pq.read_table(f, columns=["token"])
        if t.num_rows:
            toks = t.column("token").to_pylist()
            assert toks == sorted(toks)  # sorted within the file
            ranges.append((min(toks), max(toks)))
    assert len(ranges) > 1  # the fixture vocabulary spans several files
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo  # disjoint (boundary token may straddle)


def test_doc_map_sink_and_resolution(spark, sf_dir, tmp_path):
    """S8 sink round-trip + J4 broadcast resolution join."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    dm = DM.build_doc_map(docs)
    path = str(tmp_path / "doc_map")
    DM.write_doc_map(dm, path)
    back = spark.read.parquet(path)
    assert back.count() == docs.count()

    postings = TF.build_postings(docs)
    topk = Q.rank_topk(Q.dnf_query(postings, [["spark", "dup"]]), 3)
    resolved = DM.resolve_urls(topk, back)
    rows = resolved.collect()
    assert len(rows) == 3
    for r in rows:
        assert r["url"] == f"https://docs.test/{r['doc_id']}"
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        resolved.explain()
    assert "BroadcastHashJoin" in buf.getvalue()  # J4 is a broadcast join


def test_lemma_map_changes_and_merges_tokens(spark):
    """F3 — the shipped lemma table rewrites surface forms and MERGES
    'sort' into the existing 'order' token (tf counts combine)."""
    df = spark.createDataFrame(
        [(0, "agg sort order big the agg")], "doc_id bigint, text string"
    )
    plain = {
        (r["doc_id"], r["token"]): r["tf"]
        for r in TF.term_frequencies(TF.doc_tokens(df)).collect()
    }
    lem = {
        (r["doc_id"], r["token"]): r["tf"]
        for r in TF.term_frequencies(
            TF.doc_tokens(df, lemma_map=FIXTURE_LEMMAS)
        ).collect()
    }
    assert (0, "agg") in plain and (0, "aggregate") in lem
    assert (0, "agg") not in lem
    assert plain[(0, "order")] == 1 / 6
    assert lem[(0, "order")] == 2 / 6  # 'sort' merged in
    assert lem[(0, "large")] == 1 / 6  # 'big' relabeled
    assert abs(sum(v for (_, _), v in lem.items()) - 1.0) < 1e-12


def test_sorted_index_token_filter_pushdown(spark, sf_dir, tmp_path):
    """T4 — a token-equality query over the sorted index must push the
    filter into the parquet scan (PushedFilters), so the token-range
    file layout prunes via min/max stats."""
    import io
    from contextlib import redirect_stdout

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    path = str(tmp_path / "sorted_index")
    TF.write_sorted_index(TF.build_postings(docs), path)
    q = (
        spark.read.parquet(path)
        .filter(F.col("token").isin(["spark", "window"]))
        .select("doc_id", "token", "tf_idf")
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        q.explain(mode="formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan
    assert "In(token" in plan.replace(" ", "")[: 10_000] or "In(token" in plan
    assert q.count() > 0
