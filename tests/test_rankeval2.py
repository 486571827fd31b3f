"""rank_correlation (operators/rankeval.py) golden cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from searchengine_spark.operators.rankeval import rank_correlation


def _pages(spark, sa, sb):
    a = spark.createDataFrame(
        [(i, s) for i, s in sa.items()], "doc_id long, score double"
    )
    b = spark.createDataFrame(
        [(i, s) for i, s in sb.items()], "doc_id long, score double"
    )
    return a, b


def test_identical_rankings(spark):
    a, b = _pages(spark, {1: 3.0, 2: 2.0, 3: 1.0}, {1: 9.0, 2: 8.0, 3: 7.0})
    r = rank_correlation(a, b).collect()[0]
    assert r["n_common"] == 3
    assert r["kendall_tau"] == 1.0
    assert r["spearman_rho"] == 1.0
    assert r["discordant"] == 0


def test_reversed_rankings(spark):
    a, b = _pages(spark, {1: 3.0, 2: 2.0, 3: 1.0}, {1: 1.0, 2: 2.0, 3: 3.0})
    r = rank_correlation(a, b).collect()[0]
    assert r["kendall_tau"] == -1.0
    assert r["spearman_rho"] == -1.0
    assert r["concordant"] == 0


def test_partial_overlap_and_known_tau(spark):
    # common = {1,2,3}; doc 9 / doc 8 are unique to one side each.
    # a-order: 1,2,3 ; b-order: 2,1,3 -> one discordant pair of three
    a, b = _pages(
        spark,
        {1: 3.0, 2: 2.0, 3: 1.0, 9: 0.5},
        {2: 9.0, 1: 8.0, 3: 7.0, 8: 6.0},
    )
    r = rank_correlation(a, b).collect()[0]
    assert r["n_common"] == 3
    assert (r["concordant"], r["discordant"]) == (2, 1)
    assert abs(r["kendall_tau"] - (1 / 3)) < 1e-9
    assert r["sum_d2"] == 2  # d = (-1, 1, 0)
    assert abs(r["spearman_rho"] - 0.5) < 1e-9


def test_degenerate_singleton(spark):
    a, b = _pages(spark, {1: 1.0}, {1: 1.0})
    r = rank_correlation(a, b).collect()[0]
    assert r["n_common"] == 1
    assert r["kendall_tau"] is None and r["spearman_rho"] is None


def test_kneser_ney_golden(spark):
    from searchengine_spark.operators.textstats import kneser_ney_bigrams

    # corpus: "a b a b a c" -> bigrams: ab,ba,ab,ba,ac
    docs = spark.createDataFrame(
        [(0, "a b a b a c")], "doc_id long, text string"
    )
    rows = {
        (r["w1"], r["w2"]): r
        for r in kneser_ney_bigrams(docs, min_count=1).collect()
    }
    # counts: c(ab)=2 c(ba)=2 c(ac)=1; c(a.)=3 c(b.)=2
    # N1+(a,.)=2 N1+(b,.)=1 ; N1+(.,b)=1 N1+(.,a)=1 N1+(.,c)=1 ; T=3
    D = 0.75
    p_ab = (2 - D) / 3 + D * 2 / 3 * (1 / 3)
    p_ac = (1 - D) / 3 + D * 2 / 3 * (1 / 3)
    p_ba = (2 - D) / 2 + D * 1 / 2 * (1 / 3)
    assert abs(rows[("a", "b")]["p_kn"] - p_ab) < 1e-9
    assert abs(rows[("a", "c")]["p_kn"] - p_ac) < 1e-9
    assert abs(rows[("b", "a")]["p_kn"] - p_ba) < 1e-9
    assert rows[("a", "b")]["c"] == 2
    # context 'a' emits its full support {b, c}; mass missing vs 1 is
    # exactly the continuation mass routed to unseen followers
    s = rows[("a", "b")]["p_kn"] + rows[("a", "c")]["p_kn"]
    assert s < 1.0
    assert abs(s + D * 2 / 3 * (1 / 3) - 1.0) < 1e-9  # + P_KN(a->a)


def test_lmjm_matches_reference_arithmetic(spark):
    from searchengine_spark.operators.ranking import lmjm_search

    docs = spark.createDataFrame(
        [(0, "apple banana apple"), (1, "banana cherry"), (2, "cherry date")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["score"] for r in
            lmjm_search(docs, ["apple", "banana"], k=10).collect()}
    import math

    total = 7
    cf = {"apple": 2, "banana": 2}
    lam = 0.1

    def sc(f_a, f_b, dl):
        s = 0.0
        for t, f in (("apple", f_a), ("banana", f_b)):
            s += math.log((1.0 - lam) * f / dl + lam * cf[t] / total)
        return s

    assert abs(rows[0] - sc(2, 1, 3)) < 1e-12
    assert abs(rows[1] - sc(0, 1, 2)) < 1e-12
    assert 2 not in rows  # matched no query term


def test_zipf_fit_recovers_planted_exponent(spark):
    from searchengine_spark.operators.textstats import zipf_fit

    # plant freq(rank) = round(1000 / rank) over 50 "words": the OLS
    # slope on the log-log points must be close to -1
    words = [(0, " ".join(
        f"w{r}" for r in range(1, 51) for _ in range(round(1000 / r))
    ))]
    docs = spark.createDataFrame(words, "doc_id long, text string")
    row = zipf_fit(docs, max_rank=50).collect()[0]
    assert row["n_ranks"] == 50
    assert -1.05 < row["slope"] < -0.95
    assert abs(row["intercept"] - 6.9) < 0.3  # ln(1000) ~ 6.91


def test_pl2_matches_reference_arithmetic(spark):
    import math

    from searchengine_spark.operators.ranking import pl2_search

    docs = spark.createDataFrame(
        [(0, "apple banana apple"), (1, "banana cherry"), (2, "cherry date")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["score"] for r in
            pl2_search(docs, ["apple", "banana"], k=10).collect()}
    n, total = 3, 7
    avgdl = total / n
    cf = {"apple": 2, "banana": 2}

    def gain(f, dl, t):
        if f == 0:
            return 0.0
        lam = cf[t] / n
        tfn = f * math.log2(1 + avgdl / dl)
        return (1 / (tfn + 1)) * (
            tfn * math.log2(tfn / lam)
            + (lam + 1 / (12 * tfn) - tfn) * math.log2(math.e)
            + 0.5 * math.log2(2 * math.pi * tfn)
        )

    assert abs(rows[0] - (gain(2, 3, "apple") + gain(1, 3, "banana"))) < 1e-9
    assert abs(rows[1] - gain(1, 2, "banana")) < 1e-9
    assert 2 not in rows


def test_partition_balance_skew_collapse(spark):
    from searchengine_spark.operators.sharding import partition_balance

    d = spark.range(4000).selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 2 = 0 THEN 'hot.test' ELSE "
        "concat('h', CAST(id % 16 AS STRING), '.test') END AS host",
    )
    rows = {r["scheme"]: r for r in
            partition_balance(d, "host", 8, 64, "(doc_id >> 1)").collect()}
    assert rows["keyed"]["total_keys"] == rows["salted"]["total_keys"] == 4000
    # the hot host's 2000 rows sit in one keyed partition; salting
    # spreads them, collapsing the straggler
    assert rows["keyed"]["max_load"] >= 2000
    assert rows["salted"]["max_load"] < rows["keyed"]["max_load"] // 2
    assert rows["salted"]["n_parts_used"] == 8


def test_blocklist_gate_subdomains_and_platform(spark):
    from searchengine_spark.functions.urls import blocklist_gate_col

    d = spark.createDataFrame(
        [
            ("www.evil.co.uk",), ("evil.co.uk",), ("a.b.evil.co.uk",),
            ("evilco.uk",), ("good.co.uk",),
            ("user7.github.io",), ("extra.user7.github.io",),
            ("user8.github.io",),
        ],
        "host string",
    )
    got = {
        r["host"]: r["b"]
        for r in d.select(
            "host",
            blocklist_gate_col("host", ["evil.co.uk", "user7.github.io"])
            .alias("b"),
        ).collect()
    }
    assert got["www.evil.co.uk"] and got["evil.co.uk"]
    assert got["a.b.evil.co.uk"]
    assert not got["evilco.uk"] and not got["good.co.uk"]
    assert got["user7.github.io"] and got["extra.user7.github.io"]
    assert not got["user8.github.io"]


def test_blocklist_gate_empty_list(spark):
    from searchengine_spark.functions.urls import blocklist_gate_col

    d = spark.createDataFrame([("x.com",)], "host string")
    assert d.select(
        blocklist_gate_col("host", []).alias("b")
    ).collect()[0]["b"] is False


def test_k_truss_isolates_clique(spark):
    import pytest as _pytest

    from searchengine_spark.operators.graphstats import k_truss

    # a 5-clique (0..4) + a long tail of chain edges; the 4-truss is
    # exactly the clique's 10 edges, each with support 3
    clique = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    chain = [(i, i + 1) for i in range(10, 30)]
    e = spark.createDataFrame(clique + chain, "src long, dst long")
    rows = k_truss(e, k=4).collect()
    assert len(rows) == 10
    assert all(r["support"] == 3 for r in rows)
    assert {(r["a"], r["b"]) for r in rows} == set(clique)
    # 5-truss of a 5-clique is still the clique; 6-truss is empty
    assert len(k_truss(e, k=5).collect()) == 10
    assert k_truss(e, k=6).count() == 0
    with _pytest.raises(ValueError):
        k_truss(e, k=2)


def test_edge_support_counts(spark):
    from searchengine_spark.operators.graphstats import edge_support

    # two triangles sharing edge (0,1)
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (1, 3), (0, 3), (4, 5)],
        "src long, dst long",
    )
    got = {(r["a"], r["b"]): r["support"] for r in edge_support(e).collect()}
    assert got[(0, 1)] == 2
    assert got[(0, 2)] == got[(1, 2)] == got[(0, 3)] == got[(1, 3)] == 1
    assert got[(4, 5)] == 0


def test_revisit_resolve_roundtrip(spark):
    import datetime as dt

    from searchengine_spark.operators.recrawl import revisit_resolve

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        # url 1: digest A at t0 (original), A again later (revisit),
        # B (new original), A a third time (still points at FIRST A)
        (1, t0, "A", 10),
        (1, t0 + dt.timedelta(days=1), "A", 11),
        (1, t0 + dt.timedelta(days=2), "B", 12),
        (1, t0 + dt.timedelta(days=3), "A", 13),
        # url 2: same digest A — independent namespace per url
        (2, t0, "A", 20),
        # equal timestamps: id totalises the order
        (3, t0, "C", 31),
        (3, t0, "C", 30),
    ]
    caps = spark.createDataFrame(
        rows, "url long, ts timestamp, digest string, capture_id long"
    )
    got = {r["capture_id"]: r for r in revisit_resolve(caps).collect()}
    assert not got[10]["is_revisit"] and got[10]["original_id"] == 10
    assert got[11]["is_revisit"] and got[11]["original_id"] == 10
    assert not got[12]["is_revisit"]
    assert got[13]["is_revisit"] and got[13]["original_id"] == 10
    assert not got[20]["is_revisit"]  # url 2's A is its own original
    assert not got[30]["is_revisit"]  # lower id wins the ts tie
    assert got[31]["is_revisit"] and got[31]["original_id"] == 30
    # reader-side expansion: following original_id always lands on a
    # non-revisit capture with the same digest
    digest = {r[3]: r[2] for r in rows}
    for cid, r in got.items():
        assert not got[r["original_id"]]["is_revisit"]
        assert digest[r["original_id"]] == digest[cid]


def test_late_data_census_golden_and_bucket_invariance(spark):
    import datetime as dt

    from searchengine_spark.operators.windows import late_data_census

    t0 = dt.datetime(2026, 1, 2)  # window day boundary

    def ev(oid, hours):
        return (oid, t0 + dt.timedelta(hours=hours))

    rows = [
        ev(0, 0.0),    # watermark base
        ev(1, 30.0),   # jumps watermark to t0+30h
        ev(2, 26.0),   # 4h behind max: late iff delay < 4h
        ev(3, 1.0),    # 29h behind: late at 1-day delay
        ev(4, 31.0),
    ]
    caps = spark.createDataFrame(rows, "arrival long, ts timestamp")
    got = {
        r["window_start"]: (r["n_events"], r["n_late"])
        for r in late_data_census(
            caps, delay_seconds=86400, window_seconds=86400,
            order_col="arrival",
        ).collect()
    }
    day0 = int(t0.replace(tzinfo=dt.timezone.utc).timestamp())
    # day 0 holds events at 0h and 1h; the 1h event arrived when the
    # watermark stood at 30h - 24h = 6h -> late
    assert got[day0] == (2, 1)
    # day 1 holds 26h, 30h, 31h; 26h arrived with watermark 6h -> fine
    assert got[day0 + 86400] == (3, 0)
    # explicit tiny bucket must not change the census (pure regrouping)
    got2 = {
        r["window_start"]: (r["n_events"], r["n_late"])
        for r in late_data_census(
            caps, 86400, 86400, order_col="arrival", bucket=2
        ).collect()
    }
    assert got == got2


def test_bowtie_census_golden(spark):
    from searchengine_spark.operators.linkrank import bowtie_census

    # SCC = {0,1,2} cycle (pivot: node 0 has max degree via extra
    # edges); IN = {10, 11} chain into the core; OUT = {20, 21} chain
    # out of it; OTHER = {30, 31} disconnected pair
    edges = [
        (0, 1), (1, 2), (2, 0),
        (0, 2), (2, 1),            # extra edges pin pivot = 0
        (10, 11), (11, 0),         # IN chain
        (1, 20), (20, 21),         # OUT chain
        (30, 31),                  # disconnected
    ]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["component"]: r["n_nodes"] for r in bowtie_census(e).collect()}
    assert got == {"scc": 3, "in": 2, "out": 2, "other": 2}


def test_minhash_error_identical_and_disjoint(spark):
    from searchengine_spark.operators.dedup import minhash_error

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta iota"),
            (1, "alpha beta gamma delta epsilon zeta eta theta iota"),
            (2, "one two three four five six seven eight nine"),
        ],
        "doc_id long, text string",
    )
    rows = minhash_error(docs, threshold=0.5, k=16).collect()
    assert len(rows) == 1  # only the identical pair passes 0.5
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (0, 1)
    assert r["j"] == 1.0 and r["n_match"] == 16
    assert r["j_est"] == 1.0 and r["abs_err"] == 0.0


def test_bloom_fpr_census_bounds(spark):
    from searchengine_spark.operators.sketches import bloom_fpr_census

    ins = spark.range(300).selectExpr("concat('in', id) AS url")
    prb = spark.range(300).selectExpr("concat('out', id) AS url")
    # huge filter: FPR indistinguishable from zero
    r = bloom_fpr_census(ins, prb, m_bits=1 << 20).collect()[0]
    assert r["n_insert"] == 300 and r["n_probe"] == 300
    assert r["n_false_pos"] == 0
    assert r["bits_set"] <= 4 * 300
    # deliberately loaded filter: FPs exist but aren't everything
    r2 = bloom_fpr_census(ins, prb).collect()[0]
    assert r2["m_bits"] == 32 * ((4 * 300 + 31) // 32)
    assert 0 < r2["n_false_pos"] < 300
    # probe set overlapping the insert set is anti-joined away
    r3 = bloom_fpr_census(ins, ins.unionAll(prb)).collect()[0]
    assert r3["n_probe"] == 300


def test_suffix_search_matches_like(spark):
    import pytest as _pytest

    from searchengine_spark.operators.query import suffix_search
    from searchengine_spark.operators.tfidf import (
        doc_tokens,
        term_frequencies,
        doc_frequencies,
        idf_table,
        postings_from_tf,
    )

    docs = spark.createDataFrame(
        [
            (0, "reader loader spark window"),
            (1, "loader window window"),
            (2, "spark spark"),
        ],
        "doc_id long, text string",
    )
    tf = term_frequencies(doc_tokens(docs))
    post = postings_from_tf(tf)
    got = {r["doc_id"]: r["score"] for r in
           suffix_search(post, "der", k=10).collect()}
    # docs 0 and 1 contain *der tokens; doc 2 does not
    assert set(got) == {0, 1}
    # equivalence with a LIKE-based reference on the same postings
    ref = (
        post.filter(F.expr("token LIKE '%der'"))
        .groupBy("doc_id")
        .agg(F.expr(
            "aggregate(sort_array(collect_list(struct(token, tf_idf))), "
            "0.0D, (a, s) -> a + s.tf_idf)").alias("score"))
    )
    ref_rows = {r["doc_id"]: r["score"] for r in ref.collect()}
    assert got == ref_rows
    with _pytest.raises(ValueError):
        suffix_search(post, "")


def test_domain_split_no_leakage(spark):
    import pytest as _pytest

    from searchengine_spark.operators.sampling import domain_split

    d = spark.range(2000).selectExpr(
        "concat('sub', CAST(id % 7 AS STRING), '.dom', "
        "CAST(id % 97 AS STRING), '.com') AS host",
        "concat('dom', CAST(id % 97 AS STRING), '.com') AS pld",
    )
    out = domain_split(d, "pld")
    # the leakage invariant: no pld appears in more than one split
    span = (
        out.groupBy("pld")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .count()
    )
    assert span == 0
    # all three splits get domains at 97-pld scale, and sizes order
    sizes = {r["split"]: r["n"] for r in
             out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(sizes) == {"train", "val", "test"}
    assert sizes["train"] > sizes["val"] + sizes["test"]
    # assignment is a pure function: re-run agrees
    again = {r["pld"]: r["split"] for r in
             domain_split(d, "pld").select("pld", "split").distinct().collect()}
    first = {r["pld"]: r["split"] for r in
             out.select("pld", "split").distinct().collect()}
    assert first == again
    with _pytest.raises(ValueError):
        domain_split(d, "pld", splits=[("a", 0.5), ("b", 0.4)])


def test_sdm_rewards_phrase_order(spark):
    from searchengine_spark.operators.positional import sdm_search

    # same unigram stats, different order: doc 0 has the exact phrase
    # "new york", doc 1 has the terms reversed and separated
    docs = spark.createDataFrame(
        [
            (0, "new york is a city new york"),
            (1, "york quite new is a city york new far apart"),
            (2, "unrelated words only here"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["score"] for r in
            sdm_search(docs, ["new", "york"], k=10).collect()}
    assert 2 not in rows
    assert rows[0] > rows[1]  # ordered-adjacent evidence dominates


def test_pq_topk_recall_vs_brute(spark, sf_dir):
    import os

    from searchengine_spark.operators.simsearch import brute_topk, pq_topk

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0)
        .collect()[0]["embedding"]
    ]
    exact = {r["vec_id"] for r in brute_topk(emb, qv, k=10).collect()}
    approx = {r["vec_id"] for r in pq_topk(emb, qv, k=10, m=8).collect()}
    # PQ with 8x8 codes is coarse; still must find a solid fraction of
    # the true neighbors, including the query itself
    assert 0 in approx
    assert len(exact & approx) >= 5

    # monotone: the returned approx distances are ascending
    rows = pq_topk(emb, qv, k=10, m=8).collect()
    ds = [r["approx_d2"] for r in rows]
    assert ds == sorted(ds)


def test_pq_validates_args(spark, sf_dir):
    import os

    import pytest as _pytest

    from searchengine_spark.operators.simsearch import pq_topk

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    with _pytest.raises(ValueError):
        pq_topk(emb, [0.0] * 63, m=4)  # 63 % 4 != 0


def test_spam_mass_seed_vs_unendorsed(spark):
    from searchengine_spark.operators.linkrank import (
        pagerank,
        personalized_pagerank,
    )

    # a trusted clique (0,1,2 linking each other + seeded) and a spam
    # farm (10..13 linking only among themselves): the farm's rank has
    # ~no trusted endorsement -> spam mass near 1; the clique's is low
    edges = [
        (0, 1), (1, 2), (2, 0),
        (10, 11), (11, 12), (12, 13), (13, 10),
    ]
    e = spark.createDataFrame(edges, "src long, dst long")
    ids = spark.createDataFrame([(i,) for i in [0, 1, 2, 10, 11, 12, 13]],
                                "id long")
    seeds = spark.createDataFrame([(0,)], "id long")
    pr = {r["id"]: r["rank"] for r in pagerank(e, ids, n_iters=8).collect()}
    pp = {r["id"]: r["rank"]
          for r in personalized_pagerank(e, seeds, n_iters=8).collect()}
    mass = {i: (pr[i] - pp.get(i, 0.0)) / pr[i] for i in pr}
    assert mass[1] < 0.5  # directly endorsed by the seed
    assert mass[12] > 0.95  # farm node: rank with zero trusted flow


def test_mime_sniff_golden(spark):
    from searchengine_spark.operators.multimodal import sniff_mime_sql

    cases = [
        ("89504E470D0A1A0A00", "image/png"),
        ("FFD8FFE100", "image/jpeg"),
        ("474946383761AA", "image/gif"),
        ("474946383961AA", "image/gif"),
        ("255044462D312E34", "application/pdf"),
        ("1F8B0800", "application/gzip"),
        ("504B030414", "application/zip"),
        ("52494646AAAAAAAA57454250", "image/webp"),
        ("52494646AAAAAAAA57415645", "audio/wav"),
        ("52494646AAAAAAAA41564920", "application/riff"),
        ("3C21646F63747970652068746D6C3E", "text/html"),
        ("3C68746D6C3E", "text/html"),
        ("3C3F786D6C20", "text/xml"),
        ("DEADBEEF", "application/octet-stream"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "h string")
    got = {
        r["h"]: r["m"]
        for r in df.selectExpr(
            "h", f"{sniff_mime_sql('unhex(h)')} AS m"
        ).collect()
    }
    for h, want in cases:
        assert got[h] == want, (h, got[h], want)


def test_assortativity_star_and_regular(spark):
    from searchengine_spark.operators.graphstats import assortativity

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    r = assortativity(star).collect()[0]
    assert r["m_edges"] == 5
    assert r["r"] == -1.0  # hub-leaf edges only: perfectly disassortative
    cycle = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)], "src long, dst long"
    )
    r2 = assortativity(cycle).collect()[0]
    assert r2["r"] is None  # regular graph: zero variance -> NULL


def test_yule_k_golden(spark):
    from searchengine_spark.operators.textstats import yule_k

    docs = spark.createDataFrame(
        [(0, "a a a a"), (1, "a b c d"), (2, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in yule_k(docs).collect()}
    assert got[0]["yule_k"] == 7500.0  # 1e4*(16-4)/16
    assert got[1]["yule_k"] == 0.0
    assert got[2]["n_tokens"] == 0 and got[2]["yule_k"] is None


def test_assoc_rules_golden(spark):
    from searchengine_spark.operators.funnel import assoc_rules

    # 4 baskets: {x,y} x3, {x} x1 -> conf(x->y)=3/4, conf(y->x)=1,
    # lift = (3*4)/(4*3) = 1.0
    rows = []
    for b in range(3):
        rows += [(b, "x"), (b, "y"), (b, "x")]  # dup x collapses
    rows += [(3, "x")]
    ev = spark.createDataFrame(rows, "user_id long, event_type string")
    got = {
        (r["antecedent"], r["consequent"]): r
        for r in assoc_rules(ev, min_support=2).collect()
    }
    assert got[("x", "y")]["n_both"] == 3
    assert got[("x", "y")]["confidence"] == 0.75
    assert got[("y", "x")]["confidence"] == 1.0
    assert got[("x", "y")]["lift"] == 1.0


def test_pivoted_matches_reference_arithmetic(spark):
    import math

    from searchengine_spark.operators.ranking import pivoted_search

    docs = spark.createDataFrame(
        [(0, "apple banana apple"), (1, "banana cherry"), (2, "cherry date")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["score"] for r in
            pivoted_search(docs, ["apple", "banana"], k=10).collect()}
    n, total, s = 3, 7, 0.2
    avgdl = total / n
    df = {"apple": 1, "banana": 2}

    def w(tf, dl, t):
        if tf == 0:
            return 0.0
        return (
            (1 + math.log(1 + math.log(tf)))
            / ((1 - s) + s * dl / avgdl)
            * math.log((n + 1) / df[t])
        )

    assert abs(rows[0] - (w(2, 3, "apple") + w(1, 3, "banana"))) < 1e-9
    assert abs(rows[1] - w(1, 2, "banana")) < 1e-9
    assert 2 not in rows


def test_rich_club_clique_plus_leaves(spark):
    from searchengine_spark.operators.graphstats import rich_club

    # 4-clique (degrees 3 + leaves) with a leaf hanging off each
    # member: members have degree 4, leaves degree 1
    clique = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    leaves = [(i, 10 + i) for i in range(4)]
    e = spark.createDataFrame(clique + leaves, "src long, dst long")
    got = {r["k"]: r for r in rich_club(e, ks=[0, 3]).collect()}
    # k=0 club = everyone: 8 nodes, 10 edges
    assert got[0]["n_nodes"] == 8 and got[0]["n_edges"] == 10
    # k=3 club = the 4 clique members only, fully wired: phi = 1
    assert got[3]["n_nodes"] == 4 and got[3]["n_edges"] == 6
    assert got[3]["phi"] == 1.0


def test_gini_golden(spark):
    from searchengine_spark.operators.funnel import gini_counts

    eq = spark.createDataFrame([(i, 10) for i in range(5)], "k long, n long")
    r = gini_counts(eq).collect()[0]
    assert r["gini"] == 0.0  # perfect equality
    # one entity holds everything: G -> (n-1)/n = 0.8 at n=5
    skew = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 0), (4, 100)], "k long, n long"
    )
    r2 = gini_counts(skew).collect()[0]
    assert abs(r2["gini"] - 0.8) < 1e-9


def test_cluster_dilution_chain(spark):
    from searchengine_spark.operators.dedup import dup_clusters

    # chain A-B-C: cluster size 3, 2 direct pairs of 3 possible
    pairs = spark.createDataFrame([(0, 1), (1, 2)], "doc_a long, doc_b long")
    docs = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    clus = dup_clusters(pairs, docs)
    sizes = {r["cluster_id"]: 0 for r in clus.collect()}
    for r in clus.collect():
        sizes[r["cluster_id"]] += 1
    assert sizes[0] == 3  # chain collapses under min-label
    # dilution for the chain cluster = 1 - 2/3
    assert abs((1 - 2 / 3) - 0.3333333333) < 1e-6


def test_markov_stationary_two_state(spark):
    import datetime as dt

    from searchengine_spark.operators.windows import markov_stationary

    # one user alternating A->B->A->B...: P is the swap matrix; the
    # uniform start vector is already stationary at (0.5, 0.5)
    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 1, "A" if i % 2 == 0 else "B")
        for i in range(20)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {r["event_type"]: r["p_stationary"]
           for r in markov_stationary(ev, n_iters=6).collect()}
    assert abs(got["A"] - 0.5) < 1e-9 and abs(got["B"] - 0.5) < 1e-9

    # absorbing state: A->A self loop plus B->A; mass drains to A
    rows2 = [(0, t0, 1, "B")] + [
        (i, t0 + dt.timedelta(minutes=i), 1, "A") for i in range(1, 12)
    ]
    ev2 = spark.createDataFrame(
        rows2, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got2 = {r["event_type"]: r["p_stationary"]
            for r in markov_stationary(ev2, n_iters=6).collect()}
    assert got2["A"] > 0.99 and got2["B"] == 0.0


def test_funnel_latency_golden(spark):
    import datetime as dt

    from searchengine_spark.operators.funnel import funnel_latency

    t0 = dt.datetime(2026, 1, 1)

    def ev(u, mins, typ):
        return (u, t0 + dt.timedelta(minutes=mins), typ)

    rows = [
        # user 1 converts in 120s; user 2 in 600s; user 3 never clicks
        ev(1, 0, "view"), ev(1, 1, "click"), ev(1, 2, "purchase"),
        ev(2, 0, "view"), ev(2, 5, "click"), ev(2, 10, "purchase"),
        ev(3, 0, "view"),
        # user 4: purchase BEFORE click -> not a valid progression
        ev(4, 0, "view"), ev(4, 2, "purchase"), ev(4, 3, "click"),
    ]
    evts = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    got = {r["p"]: r for r in funnel_latency(
        evts, ["view", "click", "purchase"], ps=[0.5, 1.0]
    ).collect()}
    assert got[0.5]["n_converted"] == 2
    assert got[0.5]["latency_s"] == 120.0
    assert got[1.0]["latency_s"] == 600.0


def test_active_users_golden(spark):
    import datetime as dt

    from searchengine_spark.operators.windows import active_users

    t0 = dt.datetime(2026, 1, 1)
    rows = []
    # users 0..4 active day 0; user 0 also active day 8 (outside WAU
    # of day 8? no: day 8 window [2..8] excludes day 0)
    for u in range(5):
        rows.append((u, t0))
    rows.append((0, t0 + dt.timedelta(days=8)))
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {r["day"]: r for r in active_users(ev).collect()}
    d0 = int(t0.replace(tzinfo=dt.timezone.utc).timestamp()) // 86400
    assert got[d0]["dau"] == 5 and got[d0]["wau"] == 5
    assert got[d0 + 8]["dau"] == 1
    assert got[d0 + 8]["wau"] == 1  # day-0 actives fell out of the week
    assert got[d0 + 8]["mau"] == 5  # still inside the 30-day window
    assert abs(got[d0 + 8]["stickiness"] - 0.2) < 1e-9


def test_session_paths_golden(spark):
    import datetime as dt

    from searchengine_spark.operators.funnel import session_paths

    t0 = dt.datetime(2026, 1, 1)
    rows = []
    eid = 0
    # 3 users with identical two-session behavior: A>B then (gap) C
    for u in range(3):
        for mins, typ in ((0, "A"), (5, "B"), (120, "C")):
            rows.append((eid, u, t0 + dt.timedelta(minutes=mins), typ))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {r["path"]: r["n_sessions"]
           for r in session_paths(ev, 30, min_count=2).collect()}
    assert got == {"A>B": 3, "C": 3}


def test_packing_waste_golden(spark):
    from searchengine_spark.operators.traindata import packing_waste

    docs = spark.createDataFrame(
        [(0, "s1", "a " * 300), (1, "s1", "b " * 300), (2, "s1", "c " * 100)],
        "doc_id long, source string, text string",
    )
    r = {x["shard"]: x for x in packing_waste(docs, seq_len=512).collect()}
    s = r["s1"]
    assert s["total_tokens"] == 700
    assert s["concat_seqs"] == 2  # ceil(700/512)
    assert s["padded_seqs"] == 3  # 1 + 1 + 1
    assert s["seqs_saved"] == 1


def test_lsh_curve_monotone(spark):
    from searchengine_spark.operators.dedup import lsh_capture_curve

    import pytest as _pytest

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta iota"),
            (1, "alpha beta gamma delta epsilon zeta eta theta iota"),
            (2, "alpha beta gamma delta epsilon zeta eta theta kappa"),
        ],
        "doc_id long, text string",
    )
    rows = lsh_capture_curve(docs, threshold=0.4).collect()
    by_j = sorted(rows, key=lambda r: r["j"])
    ps = [r["p_capture"] for r in by_j]
    assert ps == sorted(ps)  # s-curve is monotone in J
    exact = [r for r in rows if r["j"] == 1.0]
    assert exact and exact[0]["p_capture"] == 1.0
    with _pytest.raises(ValueError):
        lsh_capture_curve(docs, bands=33)


def test_crawl_delay_parsing(spark):
    from searchengine_spark.functions.robots import crawl_delay_census

    bodies = spark.createDataFrame(
        [
            ("a", "User-agent: *\nCrawl-delay: 7\nDisallow: /x"),
            ("b", "user-agent: *\ncrawl-DELAY:   12\n"),
            ("c", "User-agent: *\nDisallow: /"),
            ("d", "Crawl-delay: fast\n"),
            ("e", "Crawl-delay: 0\n"),
        ],
        "host string, body string",
    )
    got = {r["host"]: (r["crawl_delay_s"], r["max_qps"])
           for r in crawl_delay_census(bodies).collect()}
    assert got["a"] == (7, round(1 / 7, 9))
    assert got["b"][0] == 12  # case-insensitive, whitespace-tolerant
    assert got["c"][0] == 1  # absent -> default
    assert got["d"][0] == 1  # malformed -> default
    assert got["e"][0] == 1  # zero clamps to 1


def test_stem_collapse_conflation(spark):
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["stem_collapse"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_stem = {r["stem"]: r for r in rows}
    # the grafted packs conflate: merge/merges/merged/merging -> merg
    assert by_stem["merg"]["n_forms"] == 4
    assert by_stem["queri"]["n_forms"] == 3
    assert all(r["n_occ"] >= r["n_forms"] for r in rows)


def test_burst_mad_flags_spike_not_masked(spark):
    import datetime as dt

    from searchengine_spark.operators.windows import burst_windows_mad

    t0 = dt.datetime(2026, 1, 1)
    rows = []
    eid = 0
    # type A: steady 5/hour for 20 hours, except hour 7 with 50 events
    # and hour 13 with 40 — the second spike must ALSO flag (medians
    # don't get dragged by the first one)
    for h in range(20):
        burst = 50 if h == 7 else (40 if h == 13 else 5)
        for _ in range(burst):
            rows.append((eid, t0 + dt.timedelta(hours=h, minutes=1), "A"))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    )
    got = {r["window_start"]: r for r in burst_windows_mad(ev, k=3).collect()}
    h7 = int((t0 + dt.timedelta(hours=7)).replace(
        tzinfo=dt.timezone.utc).timestamp()) // 3600 * 3600
    h13 = h7 + 6 * 3600
    assert h7 in got and got[h7]["n_events"] == 50
    assert h13 in got and got[h13]["n_events"] == 40
    assert got[h7]["med"] == 5 and got[h7]["mad"] == 0
    assert len(got) == 2  # steady hours never flag
