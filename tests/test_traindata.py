"""Training-data assembly operators (operators/traindata.py):
decontamination, span dedup, PII scrub, sequence packing — hand-built
golden cases with exactly-known answers."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from searchengine_spark.operators import traindata as TD


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_decontaminate_flags_shared_ngram(spark):
    # doc 0 is the eval slice (0 % 97 == 0); doc 1 repeats one of its
    # 3-grams verbatim, doc 2 shares no 3-gram, doc 3 is too short.
    docs = _docs(
        spark,
        [
            (0, "alpha beta gamma delta"),
            (1, "zz alpha beta gamma yy"),
            (2, "alpha beta delta gamma"),
            (3, "alpha beta"),
        ],
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in TD.decontaminate(docs, n=3, eval_mod=97).collect()
    }
    assert set(out) == {1, 2, 3}  # eval doc excluded from output
    assert out[1]["n_hit"] == 1 and out[1]["contaminated"]
    assert out[2]["n_hit"] == 0 and not out[2]["contaminated"]
    assert out[3]["n_grams"] == 0 and not out[3]["contaminated"]


def test_decontaminate_counts_distinct_grams_once(spark):
    # the train doc repeats the eval 3-gram twice, but grams are
    # DISTINCT per doc → n_hit counts the gram once
    docs = _docs(
        spark,
        [(0, "a b c"), (1, "a b c x a b c")],
    )
    row = TD.decontaminate(docs, n=3, eval_mod=97).collect()[0]
    assert row["n_hit"] == 1 and row["contaminated"]


def test_span_dedup_first_occurrence_wins(spark):
    # span size 2: doc 0 = [ "a b", "c d" ]; doc 1 = [ "c d", "e f" ];
    # doc 2 = [ "a b" ]. Global first occurrence: doc 0 keeps both,
    # doc 1 keeps only "e f", doc 2 keeps nothing.
    docs = _docs(
        spark,
        [(0, "a b c d"), (1, "c d e f"), (2, "a b")],
    )
    out = {
        r["doc_id"]: (r["n_spans"], r["n_kept"])
        for r in TD.span_dedup(docs, span_tokens=2).collect()
    }
    assert out == {0: (2, 2), 1: (2, 1), 2: (1, 0)}


def test_span_dedup_within_doc_repeat(spark):
    # the same span twice inside ONE doc: only the first index kept
    docs = _docs(spark, [(5, "a b a b")])
    row = TD.span_dedup(docs, span_tokens=2).collect()[0]
    assert (row["n_spans"], row["n_kept"]) == (2, 1)


def test_pii_scrub_counts_and_redacts(spark):
    docs = _docs(
        spark,
        [
            (
                1,
                "mail me at jo.doe+x@sub.example.org or 192.168.0.1 "
                "call +1-555-0199 now",
            ),
            (2, "no pii here"),
        ],
    )
    out = {r["doc_id"]: r.asDict() for r in TD.pii_scrub(docs).collect()}
    assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_phones"]) == (
        1,
        1,
        1,
    )
    expected = hashlib.md5(
        b"mail me at <EMAIL> or <IP> call <PHONE> now"
    ).hexdigest()
    assert out[1]["clean_md5"] == expected
    assert (out[2]["n_emails"], out[2]["n_ips"], out[2]["n_phones"]) == (
        0,
        0,
        0,
    )


def test_pii_scrub_email_ip_precedence(spark):
    # the email's host contains digits-and-dots; scrubbing the email
    # FIRST must prevent the IP pass from matching inside it
    docs = _docs(spark, [(1, "u@10.0.0.1.example.com and 10.0.0.2")])
    row = TD.pii_scrub(docs).collect()[0]
    assert row["n_emails"] == 1
    assert row["n_ips"] == 1  # only the standalone IP
    expected = hashlib.md5(b"<EMAIL> and <IP>").hexdigest()
    assert row["clean_md5"] == expected


def test_pii_fixture_is_scrubbed_clean(spark, sf_dir):
    # every injected fixture row carries exactly 1 email + 1 ip + 1
    # phone, and scrubbing removes every PII match
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pii = TD.pii_table(docs)
    out = TD.pii_scrub(pii)
    bad = out.filter(
        (F.col("n_emails") != 1)
        | (F.col("n_ips") != 1)
        | (F.col("n_phones") != 1)
    ).count()
    assert bad == 0


def test_pack_sequences_offsets_and_spans(spark):
    # one shard, seq_len 4: docs of 3/4/2 tokens at offsets 0/3/7 →
    # first/last seqs (0,0), (0,1), (1,2)
    docs = spark.createDataFrame(
        [
            (1, "s", "a b c"),
            (2, "s", "d e f g"),
            (3, "s", "h i"),
        ],
        "doc_id bigint, source string, text string",
    )
    out = {
        r["doc_id"]: (r["tok_offset"], r["first_seq"], r["last_seq"])
        for r in TD.pack_sequences(docs, seq_len=4).collect()
    }
    assert out == {1: (0, 0, 0), 2: (3, 0, 1), 3: (7, 1, 2)}


def test_pack_sequences_shards_independent(spark):
    # two shards each start at offset 0 — packing is per-shard
    docs = spark.createDataFrame(
        [(1, "x", "a b"), (2, "y", "c d e")],
        "doc_id bigint, source string, text string",
    )
    out = {
        r["doc_id"]: r["tok_offset"]
        for r in TD.pack_sequences(docs, seq_len=4).collect()
    }
    assert out == {1: 0, 2: 0}


def test_pack_sequences_empty_doc(spark):
    docs = spark.createDataFrame(
        [(1, "s", "a b c d"), (2, "s", "..."), (3, "s", "e")],
        "doc_id bigint, source string, text string",
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["tok_offset"], r["first_seq"], r["last_seq"])
        for r in TD.pack_sequences(docs, seq_len=4).collect()
    }
    # "..." tokenizes to nothing: occupies no tokens, maps to the
    # sequence at its offset (4 // 4 = 1), and doc 3 starts at the
    # same offset
    assert out[2] == (0, 4, 1, 1)
    assert out[3] == (1, 4, 1, 1)


def test_weighted_sample_aes(spark):
    from pyspark.sql import functions as F

    from searchengine_spark.operators.sampling import weighted_sample

    # 100 light rows (w=1) + 100 heavy rows (w=50): heavy should
    # dominate a k=40 sample; zero-weight rows never appear
    rows = (
        [(i, 1) for i in range(100)]
        + [(i + 100, 50) for i in range(100)]
        + [(999, 0)]
    )
    df = spark.createDataFrame(rows, "doc_id long, w int")
    got = weighted_sample(df, "w", k=40, id_col="doc_id").collect()
    assert len(got) == 40
    ids = [r.doc_id for r in got]
    assert 999 not in ids
    heavy = sum(1 for i in ids if 100 <= i < 200)
    assert heavy >= 30  # E[heavy] ≈ 39; md5 keys are fixed, not flaky
    # deterministic: identical second run
    again = [r.doc_id for r in weighted_sample(df, "w", k=40, id_col="doc_id").collect()]
    assert ids == again
    # keys are ln(u)/w — all negative, sorted descending
    keys = [r.key for r in got]
    assert all(k < 0 for k in keys)
    assert keys == sorted(keys, reverse=True)


def test_export_jsonl_roundtrip_and_determinism(spark, tmp_path):
    import json
    import os

    from searchengine_spark.operators.traindata import (
        export_jsonl,
        read_jsonl_export,
    )

    df = spark.createDataFrame(
        [(i, f"text {i}") for i in range(200)], "doc_id long, text string"
    )
    out = str(tmp_path / "export")
    m1 = export_jsonl(df, out, n_shards=4)
    assert m1["total_rows"] == 200
    assert sum(m1["shard_rows"].values()) == 200
    assert os.path.exists(os.path.join(out, "manifest.json"))
    with open(os.path.join(out, "manifest.json")) as fh:
        assert json.load(fh) == m1

    back = read_jsonl_export(spark, out, "doc_id long, text string")
    got = sorted((r.doc_id, r.text) for r in back.collect())
    assert got == [(i, f"text {i}") for i in range(200)]

    # deterministic shard membership across re-runs
    m2 = export_jsonl(df, str(tmp_path / "export2"), n_shards=4)
    assert m2["shard_rows"] == m1["shard_rows"]


def test_curate_all_statuses(spark):
    # 21 tokens = 7 full stride-3 grams; appending exactly 3 tokens adds
    # ONE gram → Jaccard 7/8 ≥ 0.7 (grams are stride-n, not sliding)
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lam mu nu xi omicron pi rho sigma tau upsilon phi"
    )
    rows = [
        (0, base),                      # exact-dup keeper, loses near-dup retention to 2
        (1, base),                      # exact_dup of 0
        (2, base + " the and of"),      # near dup, stopwords boost quality → kept
        (3, "zz zz zz !!!! ???? ****"),    # unique but junk → low_quality
        (4, "the cat sat on the mat and it was good to see that it is fine"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["status"] for r in TD.curate(df).collect()}
    assert out[1] == "exact_dup"
    assert out[3] == "low_quality"
    assert out[4] == "kept"
    # cluster {0,1,2}: 1 is an exact dup; among survivors {0,2} the
    # stopword-boosted 2 has the higher quality → 0 demoted to near_dup
    assert out[2] == "kept"
    assert out[0] == "near_dup"


def test_dict_size_front_coding_golden(spark):
    """Front-coding arithmetic on a hand-computed dictionary."""
    from pyspark.sql import functions as F

    from searchengine_spark.operators.tfidf import dict_size_estimate

    # one 'a' block: abc (first: 3+1=4), abcd (2 + 4-3 = 3), axe
    # (2 + 3-1 = 4); one 'b' block: bob (first: 4)
    toks = spark.createDataFrame(
        [("abc",), ("abcd",), ("axe",), ("bob",), ("abc",)], "token string"
    )
    out = {r.bucket: r for r in dict_size_estimate(toks).collect()}
    a, b = out["a"], out["b"]
    assert (a.n_terms, a.raw_bytes, a.front_bytes) == (3, 13, 11)
    assert (b.n_terms, b.raw_bytes, b.front_bytes) == (1, 4, 4)
    assert abs(a.ratio - 11 / 13) < 1e-9  # operator rounds to 9 dp


def test_dict_size_window_is_partitioned(spark, sf_dir):
    import os

    from searchengine_spark.operators.tfidf import build_postings, dict_size_estimate

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    plan = (
        dict_size_estimate(build_postings(docs).select("token"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan  # block-partitioned lag only


def test_cdc_chunks_partition_and_resync(spark):
    from searchengine_spark.operators.traindata import cdc_chunks

    base = " ".join(f"w{i % 53}q{i % 7}" for i in range(200))
    ins = "inserted0 " + base  # head-insert
    df = spark.createDataFrame(
        [(0, base), (1, ins), (2, "tiny doc")], "doc_id long, text string"
    )
    rows = cdc_chunks(df, w=4, divisor=16).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for d, rs in by_doc.items():
        rs.sort(key=lambda r: r.chunk_ix)
        # chunks tile the doc: indices dense from 0, token counts
        # conserved
        assert [r.chunk_ix for r in rs] == list(range(len(rs)))
        assert all(r.n_tokens > 0 for r in rs)
    n0 = sum(r.n_tokens for r in by_doc[0])
    n1 = sum(r.n_tokens for r in by_doc[1])
    assert n1 == n0 + 1 and n0 == 200
    assert len(by_doc[2]) == 1  # short doc = one chunk
    # CDC resync: the head edit perturbs only a bounded prefix — the
    # overwhelming majority of chunk hashes are shared
    a = {r.chunk_md5 for r in by_doc[0]}
    b = {r.chunk_md5 for r in by_doc[1]}
    assert len(a & b) >= len(a) - 2


def test_cdc_chunks_deterministic_boundaries(spark):
    from searchengine_spark.operators.traindata import cdc_chunks

    text = " ".join(f"t{i % 31}" for i in range(100))
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    a = sorted(map(tuple, cdc_chunks(df).collect()))
    b = sorted(map(tuple, cdc_chunks(df).collect()))
    assert a == b
    # same content under a different doc_id gives identical chunk hashes
    df2 = spark.createDataFrame([(9, text)], "doc_id long, text string")
    c = [t[1:] for t in sorted(map(tuple, cdc_chunks(df2).collect()))]
    assert c == [t[1:] for t in a]


def test_novelty_scores_ownership(spark):
    from searchengine_spark.operators.traindata import novelty_scores

    a = "one two three four five six seven eight nine ten"
    rows = [
        (0, a),                       # owns all its grams
        (1, a),                       # exact dup of 0 -> novelty 0
        (2, a + " eleven twelve"),    # shares a prefix, adds a tail
        (3, "short"),                 # < n tokens -> (0, 0, 0.0)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_grams, r.n_novel, r.novelty)
           for r in novelty_scores(df, n=8).collect()}
    assert got[0] == (3, 3, 1.0)
    assert got[1] == (3, 0, 0.0)
    n2, v2, f2 = got[2]
    assert n2 == 5 and v2 == 2 and abs(f2 - 2 / 5) < 1e-12
    assert got[3] == (0, 0, 0.0)
