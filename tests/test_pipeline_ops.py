"""Training-data pipeline operators: dedup suite, ANN, text stats,
multimodal plumbing — unit semantics on crafted fixtures (the DuckDB
oracle parity at sf0.01 is the driver's CORRECTNESS gate; these tests
pin the semantics with hand-checkable cases)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators import dedup as D
from searchengine_spark.operators import multimodal as M
from searchengine_spark.operators import simsearch as S
from searchengine_spark.operators import textstats as T

BASE = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lam mu nu xi omicron pi rho sigma tau upsilon"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact dup of 0
        (2, BASE + " extra words here"),  # near dup of 0 (high jaccard)
        (3, "totally different content about spark shuffles and joins"),
        (4, ""),  # empty doc
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_exact_dedup(docs):
    got = {
        r["text_md5"]: (r["keep_id"], r["n_dups"])
        for r in D.exact_dedup(docs).collect()
    }
    assert len(got) == 4  # 0/1 merge
    assert (0, 2) in got.values()


def test_ngram_pairs_exact_and_minhash_agree(docs):
    exact = {
        (r["doc_a"], r["doc_b"]): round(r["j"], 9)
        for r in D.ngram_dup_pairs(docs, 0.5).collect()
    }
    assert (0, 1) in exact and exact[(0, 1)] == 1.0
    assert (0, 2) in exact and exact[(0, 2)] < 1.0
    mh = {
        (r["doc_a"], r["doc_b"]): round(r["j"], 9)
        for r in D.minhash_lsh_pairs(docs, 0.5).collect()
    }
    assert mh == exact  # recall 1.0 on the fixture + identical verify


def test_simhash(docs):
    sigs = {r["doc_id"]: r["simhash"] for r in D.simhash_signatures(docs).collect()}
    assert sigs[0] == sigs[1]  # identical text ⇒ identical signature
    assert sigs[0] != sigs[3]
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in D.simhash_dup_pairs(docs, 3).collect()
    }
    assert pairs[(0, 1)] == 0


def test_embedding_pairs_and_ann(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [1.0, 0.01, 0.0]),  # nearly parallel to 0
        (2, [0.0, 1.0, 0.0]),  # orthogonal
        (3, [-1.0, 0.0, 0.0]),  # opposite
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    pairs = {
        (r["doc_a"], r["doc_b"]): r["cosine"]
        for r in D.embedding_dup_pairs(emb, 0.95).collect()
    }
    assert set(pairs) == {(0, 1)}
    assert pairs[(0, 1)] == pytest.approx(1.0 / math.sqrt(1 + 0.01**2))

    top = S.brute_topk(emb, [1.0, 0.0, 0.0], 3).collect()
    assert [r["vec_id"] for r in top] == [0, 1, 2]
    assert top[0]["cosine"] == pytest.approx(1.0)

    # LSH top-k: the query's own bucket always contains the query vector
    lsh = S.lsh_topk(emb, [1.0, 0.0, 0.0], 3)
    got = [r["vec_id"] for r in lsh.collect()]
    assert 0 in got
    assert 3 not in got  # opposite vector can't share all sign bits


def test_token_stats_and_quality(spark):
    df = spark.createDataFrame(
        [(0, "The quick brown fox and the lazy dog"), (1, "")],
        "doc_id bigint, text string",
    )
    ts = {r["doc_id"]: r for r in T.token_stats(df).collect()}
    assert ts[0]["n_tokens"] == 8
    assert ts[0]["n_distinct_tokens"] == 7  # 'the' twice
    assert ts[1]["n_tokens"] == 0 and ts[1]["mean_token_len"] == 0.0

    q = {r["doc_id"]: r for r in T.quality_scores(df).collect()}
    assert 0.0 < q[0]["quality"] <= 1.0
    assert q[0]["stop_ratio"] == pytest.approx(3 / 8)  # the, and, the
    assert q[1]["quality"] == 0.0


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat and the dog of it is you that"),
            (1, "der hund und die katze ist nicht mit ein"),
            (2, "le chat et la maison les des est"),
            (3, "xyzzy plugh"),
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in T.lang_id(df).collect()}
    assert got == {0: "en", 1: "de", 2: "fr", 3: "und"}


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta"), (1, "beta alpha")], "doc_id bigint, text string"
    )
    got = {r["doc_id"]: r["fingerprint"] for r in T.doc_fingerprint(df).collect()}
    assert got[0] != got[1]  # rolling hash, not a bag hash
    # hand-computed: h = ((0*131 + 5*31+97)*131 + 4*31+98) % (1e9+7)
    expected = ((5 * 31 + ord("a")) * 131 + 4 * 31 + ord("b")) % 1_000_000_007
    assert got[0] == expected


def test_multimodal_plumbing(spark):
    docs = spark.createDataFrame(
        [(i, f"payload text {i} " * 50) for i in range(6)],
        "doc_id bigint, text string",
    )
    media = M.media_table(docs)
    feats = {r["media_id"]: r for r in M.byte_histogram_features(media).collect()}
    assert len(feats) == 6
    for r in feats.values():
        assert r["n_bytes"] > 0
        assert len(r["hist"]) == M.N_HIST_BINS
        assert sum(r["hist"]) == pytest.approx(1.0)
        assert 0.0 <= r["entropy"] <= 4.0  # ≤ log2(16) bins

    frames = M.frame_sample(media).collect()
    assert frames  # kind == 'video' rows expand to ≥1 frame each
    vid_ids = {r["media_id"] for r in frames}
    kinds = {r["media_id"]: r["kind"] for r in media.collect()}
    assert all(kinds[m] == "video" for m in vid_ids)

    if not M._HAS_PIL:
        with pytest.raises(NotImplementedError):
            M.decode_image(b"\x89PNG fake")


def test_embed_pairs_lsh_equals_allpairs_no_crossjoin(spark, sf_dir):
    """The default (LSH-banded) embed-pairs plan must contain no
    all-pairs join AND reproduce the exact pair set (recall check on the
    real fixture — seeded planes make this deterministic)."""
    import io
    import os
    from contextlib import redirect_stdout

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    lsh = D.embedding_dup_pairs(emb, 0.3)
    buf = io.StringIO()
    with redirect_stdout(buf):
        lsh.explain(mode="extended")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    got = {
        (r["doc_a"], r["doc_b"]): round(r["cosine"], 9) for r in lsh.collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"]): round(r["cosine"], 9)
        for r in D.embedding_dup_pairs(emb, 0.3, method="allpairs").collect()
    }
    assert got == exact


def test_dup_clusters_components(spark):
    """Chain 1-2-3 collapses to min-id cluster 1; pair 5-6 to 5;
    singleton 9 clusters to itself when documents are supplied."""
    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.8), (5, 6, 0.95)],
        "doc_a bigint, doc_b bigint, j double",
    )
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in (1, 2, 3, 5, 6, 9)], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in D.dup_clusters(pairs, docs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 9: 9}


def test_ivf_topk_probes_nearest_lists(spark):
    """Two well-separated clusters around the first two vectors; with
    nprobe=1 only the query's own cluster is scanned."""
    rows = [
        (0, [10.0, 0.0, 0.0]),   # centroid A (also the query)
        (1, [0.0, 10.0, 0.0]),   # centroid B
        (2, [9.0, 1.0, 0.0]),    # near A
        (3, [1.0, 9.0, 0.0]),    # near B
        (4, [8.0, 0.5, 0.0]),    # near A
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = [
        r["vec_id"]
        for r in S.ivf_topk(
            emb, [10.0, 0.0, 0.0], k=5, n_centroids=2, nprobe=1
        ).collect()
    ]
    assert got[0] == 0            # exact match first
    assert set(got) == {0, 2, 4}  # B-list rows 1,3 never scanned


def test_bpe_token_count(spark):
    df = spark.createDataFrame(
        [(0, "Hello world, 42 tokens!"), (1, "")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in T.bpe_token_count(df).collect()}
    # pieces: "Hello", " world", ",", " 42", " tokens", "!"
    assert got[0]["n_pieces"] == 6
    assert got[0]["n_distinct_pieces"] == 6
    assert got[1]["n_pieces"] == 0


def test_sample_stratified_two_phase_exact(spark):
    """Two-phase (group,salt) top-k must equal the naive single-window
    top-k; ranks are 1..k per group and deterministic across runs."""
    from pyspark.sql import Window

    from searchengine_spark.operators import sampling as SP

    rows = [(i, "en" if i % 3 else "de") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    got = SP.sample_stratified(df, "lang", k=4).collect()

    naive = (
        df.withColumn("prio", SP.h60_col("CAST(doc_id AS STRING)"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("lang").orderBy(
                    F.col("prio").asc(), F.col("doc_id").asc()
                )
            ),
        )
        .filter(F.col("rk") <= 4)
        .select("lang", "doc_id", "prio", "rk")
        .collect()
    )
    key = lambda r: (r["lang"], r["rk"])
    assert sorted(((r["lang"], r["rk"], r["doc_id"]) for r in got)) == sorted(
        (r["lang"], r["rk"], r["doc_id"]) for r in naive
    )
    per_group = {}
    for r in got:
        per_group.setdefault(r["lang"], []).append(r["rk"])
    assert all(sorted(v) == list(range(1, 5)) for v in per_group.values())


def test_mixture_sample_thresholds_and_determinism(spark):
    from searchengine_spark.operators import sampling as SP

    rows = [(i, f"src{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    w = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
    got = SP.mixture_sample(df, w).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    # weight 1.0 keeps everything, 0.0 keeps nothing
    assert by_src.get("src0", set()) == {i for i in range(300) if i % 3 == 0}
    assert "src2" not in by_src
    # 0.5 keeps a strict, deterministic subset (h60 is uniform: the
    # kept fraction lands well inside (0.2, 0.8) for n=100)
    kept = len(by_src.get("src1", set()))
    assert 20 < kept < 80
    again = {
        r["doc_id"]
        for r in SP.mixture_sample(df, w).collect()
        if r["source"] == "src1"
    }
    assert again == by_src["src1"]
    # unlisted sources are dropped entirely
    none = SP.mixture_sample(df, {"src0": 1.0}).select("source").distinct()
    assert [r["source"] for r in none.collect()] == ["src0"]


def test_repetition_stats(spark):
    df = spark.createDataFrame(
        [
            (0, "a b a b a b"),   # bigrams: ab ba ab ba ab -> 2 distinct of 5
            (1, "one two three"), # all distinct
            (2, "solo"),          # < n tokens -> zero n-grams
            (3, ""),
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in T.repetition_stats(df).collect()}
    assert got[0]["n_ngrams"] == 5 and got[0]["n_distinct_ngrams"] == 2
    assert abs(got[0]["dup_ngram_frac"] - (1 - 2 / 5)) < 1e-9
    assert got[1]["dup_ngram_frac"] == 0.0 and got[1]["n_ngrams"] == 2
    assert got[2]["n_ngrams"] == 0 and got[2]["dup_ngram_frac"] == 0.0
    assert got[3]["n_tokens"] == 0 and got[3]["dup_ngram_frac"] == 0.0


def test_probe_buckets_properties():
    planes = S._hyperplanes(8, 6, 11)
    q = [1.0, 0.2, -0.3, 0.5, 0.0, 0.1, -0.9, 0.4]
    single = S.probe_buckets(q, planes, 1)
    assert len(single) == 1  # just the query bucket
    multi = S.probe_buckets(q, planes, 7)
    assert multi[0] == single[0] and len(multi) == 7 == len(set(multi))
    # single-flip regime: every extra probe is Hamming distance 1
    assert all(bin(multi[0] ^ b).count("1") == 1 for b in multi[1:])
    deep = S.probe_buckets(q, planes, 20)
    assert len(deep) == 20 == len(set(deep))
    assert deep[0] == multi[0]  # query bucket always probed first
    # deep regime flips margin-ordered SETS of up to 3 planes
    assert all(1 <= bin(deep[0] ^ b).count("1") <= 3 for b in deep[1:])
    assert S.probe_buckets(q, planes, 20) == deep  # deterministic


def test_lsh_multiprobe_recall_dominates_single(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    qs = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter("vec_id < 5").collect()
    ]
    hits1 = hitsM = 0
    for q in qs:
        truth = {r["vec_id"] for r in S.brute_topk(emb, q, 10).collect()}
        b1 = {
            r["vec_id"]
            for r in S.lsh_topk(emb, q, 10, n_planes=6, n_probes=1).collect()
        }
        bM = {
            r["vec_id"]
            for r in S.lsh_topk(emb, q, 10, n_planes=6, n_probes=7).collect()
        }
        # a true top-k member in the candidate set always survives the
        # candidate ranking, and the multiprobe candidate set is a
        # superset — so per-query recall can only go up
        hits1 += len(truth & b1)
        hitsM += len(truth & bM)
    assert hitsM >= hits1
    emb.unpersist()


def test_lm_score_semantics(spark):
    # corpus: "a b" x2 and "a c" — add-one bigram LM over the corpus
    rows = [(0, "a b"), (1, "a b"), (2, "a c"), (3, "solo"), (4, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in T.lm_score(df).collect()
    }
    # vocabulary = {a, b, c, solo} → V=4; c(a)=3, c(a,b)=2, c(a,c)=1
    v = 4.0
    p_ab = (2 + 1) / (3 + v)
    p_ac = (1 + 1) / (3 + v)
    assert out[0] == (1, round(math.log(p_ab), 9))
    assert out[1] == out[0]
    assert out[2] == (1, round(math.log(p_ac), 9))
    # the common transition scores higher than the rare one
    assert out[0][1] > out[2][1]
    # <2-token docs are present with the zero contract
    assert out[3] == (0, 0.0)
    assert out[4] == (0, 0.0)


def test_lm_score_sum_is_position_ordered(spark):
    # multi-bigram doc: avg equals the sequential position-ordered fold
    rows = [(0, "x y x y z"), (1, "x y"), (2, "y z")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in T.lm_score(df).collect()}
    # unigrams: x:3 (2+1), y:4 (2+1+1), z:2 (1+1) → V=3
    cu = {"x": 3, "y": 4, "z": 2}
    cb = {("x", "y"): 3, ("y", "x"): 1, ("y", "z"): 2}
    v = 3.0
    def lp(a, b):
        return math.log((cb[(a, b)] + 1) / (cu[a] + v))
    s = 0.0
    for a, b in [("x", "y"), ("y", "x"), ("x", "y"), ("y", "z")]:
        s += lp(a, b)
    assert got[0]["n_bigrams"] == 4
    assert got[0]["avg_logprob"] == round(s / 4, 9)


def test_keep_best_argmax_and_ties(spark):
    clusters = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 3), (4, 4), (5, 4)],
        "doc_id long, cluster_id long",
    )
    quality = spark.createDataFrame(
        [
            (0, 0.5),
            (1, 0.9),   # best of cluster 0
            (2, 0.9 - 1e-12),  # rounds to the same 9dp value as doc 1
            (3, 0.1),
            (4, 0.7),
            (5, 0.7),   # exact tie with 4 → min doc_id wins
        ],
        "doc_id long, quality double",
    )
    out = {
        r["cluster_id"]: r for r in D.keep_best(clusters, quality).collect()
    }
    # cluster 0: docs 1 and 2 tie at round9 → lower doc_id (1) kept
    assert out[0]["kept_doc_id"] == 1 and out[0]["n_members"] == 3
    assert out[0]["best_quality"] == 0.9
    assert out[3]["kept_doc_id"] == 3 and out[3]["n_members"] == 1
    assert out[4]["kept_doc_id"] == 4 and out[4]["n_members"] == 2


def test_keyness_golden(spark):
    """Hand-computed G² on a tiny two-slice corpus."""
    import math

    from searchengine_spark.operators.textstats import keyness

    # slice A (even ids): 'x x y'; slice B (odd ids): 'x z z z'
    rows = [(0, "x x y"), (1, "x z z z")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.token: r for r in keyness(df).collect()}
    na, nb = 3, 4

    def g2(a, b):
        e = (a + b) / (na + nb)
        s = 0.0
        if a:
            s += a * math.log(a / (na * e))
        if b:
            s += b * math.log(b / (nb * e))
        return 2.0 * s

    assert abs(out["z"].g2 - g2(0, 3)) < 1e-9
    assert abs(out["x"].g2 - g2(2, 1)) < 1e-9
    assert out["z"].enriched_in == "b"
    assert out["y"].enriched_in == "a"
    # one-sided term: zero count contributes zero, not NaN
    assert out["z"].n_a == 0 and out["z"].g2 > 0


def test_freq_spectrum_golden(spark):
    from searchengine_spark.operators.textstats import freq_spectrum

    df = spark.createDataFrame(
        [(0, "a a a b b c"), (1, "c d")], "doc_id long, text string"
    )
    got = {r.freq: r.n_types for r in freq_spectrum(df).collect()}
    # a:3, b:2, c:2, d:1  ->  spectrum {1:1, 2:2, 3:1}
    assert got == {1: 1, 2: 2, 3: 1}


def test_cohort_retention_hand_built(spark):
    from searchengine_spark.operators.windows import cohort_retention

    rows = [
        # user 1: first week W0 (Mon 2024-01-01), returns W1 and W3
        (1, "2024-01-02 10:00:00"), (1, "2024-01-09 09:00:00"),
        (1, "2024-01-24 09:00:00"),
        # user 2: first week W1, never returns
        (2, "2024-01-10 00:00:00"),
        # user 3: first week W0, two events same week (dedup to one)
        (3, "2024-01-03 05:00:00"), (3, "2024-01-04 06:00:00"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts string").selectExpr(
        "user_id", "CAST(ts AS TIMESTAMP) AS ts"
    )
    got = {(str(r.cohort_week.date()), r.week_offset): r.n_users
           for r in cohort_retention(ev).collect()}
    assert got == {
        ("2024-01-01", 0): 2,   # users 1 and 3 in the W0 cohort
        ("2024-01-01", 1): 1,   # user 1 returns in W1
        ("2024-01-01", 3): 1,   # user 1 returns in W3
        ("2024-01-08", 0): 1,   # user 2's own cohort week
    }


def test_burst_windows_flags_spike(spark):
    from searchengine_spark.operators.windows import burst_windows

    # type 'a': 2 events/hour for 30 hours, then one 60-event spike
    rows = [("a", f"2024-01-0{1 + h // 24} {h % 24:02d}:{10 + i:02d}:00")
            for h in range(30) for i in range(2)]
    rows += [("a", f"2024-01-03 05:{i:02d}:30") for i in range(60)]
    # type 'b': perfectly constant -> sigma 0, z 0, never flagged
    rows += [("b", f"2024-01-01 {h:02d}:00:00") for h in range(10)]
    ev = spark.createDataFrame(rows, "event_type string, ts string").selectExpr(
        "event_type", "CAST(ts AS TIMESTAMP) AS ts"
    )
    out = burst_windows(ev).collect()
    bursts = [(r.event_type, r.ws) for r in out if r.is_burst]
    assert bursts == [("a", "2024-01-03 05:00:00")]
    bz = {r.event_type: r.z for r in out if r.event_type == "b"}
    assert bz == {"b": 0.0}
    spike = [r for r in out if r.ws == "2024-01-03 05:00:00"][0]
    assert spike.n_events == 60 and spike.z > 3.0


def test_event_transitions_hand_built(spark):
    from searchengine_spark.operators.windows import event_transitions

    rows = [
        # user 1: view -> click -> buy;  user 2: view -> view -> click
        (0, 1, "2024-01-01 00:00:00", "view"),
        (1, 1, "2024-01-01 00:01:00", "click"),
        (2, 1, "2024-01-01 00:02:00", "buy"),
        (3, 2, "2024-01-01 00:00:00", "view"),
        (4, 2, "2024-01-01 00:01:00", "view"),
        (5, 2, "2024-01-01 00:02:00", "click"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).selectExpr("event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts",
                 "event_type")
    got = {(r.prev_type, r.next_type): (r.n, r.p)
           for r in event_transitions(ev).collect()}
    assert got == {
        ("view", "click"): (2, 2 / 3),
        ("view", "view"): (1, 1 / 3),
        ("click", "buy"): (1, 1.0),
    }
    # no cross-user pair: (buy, view) must not exist
    assert ("buy", "view") not in got


def test_doc_keywords_topk(spark):
    from searchengine_spark.operators.tfidf import build_postings, doc_keywords

    df = spark.createDataFrame(
        [(0, "rare unique words here common"), (1, "common common filler")],
        "doc_id long, text string",
    )
    out = doc_keywords(build_postings(df), k=2).collect()
    per = {}
    for r in out:
        per.setdefault(r.doc_id, []).append((r.rk, r.token, r.tf_idf))
    for d, lst in per.items():
        lst.sort()
        assert [rk for rk, _, _ in lst] == list(range(1, len(lst) + 1))
        # scores non-increasing in rank
        assert all(a[2] >= b[2] for a, b in zip(lst, lst[1:]))
    # 'common' appears in both docs -> idf 0 -> never a top keyword of
    # doc 0 (which has df-1 alternatives)
    assert "common" not in [t for _, t, _ in per[0]]


def test_mixture_report_hand_computed(spark):
    import math

    from searchengine_spark.operators.sampling import mixture_report

    rows = [(i, "en" if i < 6 else "de") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = {r.bucket: r for r in
           mixture_report(df, {"en": 0.5, "de": 0.5}).collect()}
    assert got["en"].n == 6 and abs(got["en"].share - 0.6) < 1e-12
    assert abs(got["en"].kl_term - 0.6 * math.log(0.6 / 0.5)) < 1e-12
    assert abs(got["en"].ratio - 1.2) < 1e-12
    assert abs(got["de"].ratio - 0.8) < 1e-12
    # KL sum is >= 0 and 0 only at the target composition
    assert got["en"].kl_term + got["de"].kl_term > 0
    # bucket absent from targets: sentinel zeros
    got2 = {r.bucket: r for r in mixture_report(df, {"en": 1.0}).collect()}
    assert got2["de"].target_share == 0.0 and got2["de"].ratio == 0.0
    assert got2["de"].kl_term == 0.0
