"""Okapi BM25 ranked retrieval — the modern counterpart to the
reference's tf·idf-ASC ranking (retrieve_query.py:54,86,142; kept
verbatim in operators/query.py as the faithful T2 quirk).

BM25 is the public Robertson/Spärck Jones ranking function in its
Lucene-default form:

  idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))
  w(t, d)    = idf(t) * f * (k1 + 1) / (f + k1 * (1 - b + b * dl/avgdl))
  score(q,d) = Σ_{t ∈ q} w(t, d)

with k1 = 1.2, b = 0.75, f the raw in-doc term count, dl the doc token
length and avgdl the corpus mean length.

Scale notes (100 TB): the weight table needs exactly the shuffles the
tf·idf index already pays — one (doc_id, token) aggregate and one
per-token df aggregate joined back (broadcastable dictionary). N and
Σdl are a single integer-exact agg (avgdl is derived as a double from
two exact longs, so Spark and the DuckDB oracle agree bit-for-bit).
Query scoring is a token-IN pruned scan (parquet min/max pushdown on
the token-sorted index layout, T4) + ONE groupBy(doc_id) — the
per-term contributions are pivoted into fixed columns and summed in
query order, so float addition order is deterministic, not
shuffle-order dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from searchengine_spark.operators.tfidf import doc_tokens

K1 = 1.2
B = 0.75


def bm25_table(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """(doc_id, token, weight) — precomputed BM25 per-term weights.

    Same materialization shape as build_postings: build once, sink
    token-sorted (S4/write_sorted_index works unchanged), serve many
    queries off the pruned scan.
    """
    toks = doc_tokens(documents, id_col, text_col).filter(F.col("n_terms") > 0)
    # one integer-exact pass: N docs + total token count (avgdl = sum/N
    # computed as double ONCE, identically in the oracle)
    stats = toks.agg(
        F.count("*").alias("n"), F.sum("n_terms").alias("sumdl")
    ).collect()[0]
    if not stats["n"]:
        # empty/all-empty corpus: typed empty weights frame, not a
        # divide-by-zero (sumdl is NULL when no rows aggregate)
        return documents.sparkSession.createDataFrame(
            [], "doc_id long, token string, weight double"
        )
    n_docs, sumdl = int(stats["n"]), int(stats["sumdl"])
    avgdl = F.lit(float(sumdl)) / F.lit(float(n_docs))

    f_tab = (
        toks.select("doc_id", "n_terms", F.explode("tokens").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("f"), F.first("n_terms").alias("dl"))
    )
    df_tab = f_tab.groupBy("token").agg(F.count("*").alias("df"))
    idf = df_tab.select(
        "token",
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        ).alias("idf"),
    )
    fd, dl = F.col("f").cast("double"), F.col("dl").cast("double")
    return f_tab.join(idf, "token").select(
        "doc_id",
        "token",
        (
            F.col("idf")
            * (fd * F.lit(k1 + 1.0))
            / (fd + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * dl / avgdl))
        ).alias("weight"),
    )


def bm25_search(weights: DataFrame, terms: list[str], k: int = 10) -> DataFrame:
    """Top-k docs by Σ of per-term BM25 weights (any-term match).

    The per-term contributions are pivoted into one column per query
    term and added IN QUERY ORDER — a deterministic float-sum tree, so
    the score is reproducible across partitionings (and in the DuckDB
    oracle). One pruned scan + one shuffle, independent of |terms|.
    """
    uniq = list(dict.fromkeys(t.lower() for t in terms))
    if not uniq:
        return weights.select("doc_id", F.lit(0.0).alias("score")).limit(0)
    per_term = [
        F.coalesce(
            F.max(F.when(F.col("token") == t, F.col("weight"))), F.lit(0.0)
        ).alias(f"w{i}")
        for i, t in enumerate(uniq)
    ]
    pivoted = (
        weights.filter(F.col("token").isin(uniq)).groupBy("doc_id").agg(*per_term)
    )
    score = F.col("w0")
    for i in range(1, len(uniq)):
        score = score + F.col(f"w{i}")
    return (
        pivoted.select("doc_id", score.alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def champion_lists(
    weights: DataFrame, k: int = 10, n_salts: int = 16
) -> DataFrame:
    """Impact-ordered index (champion lists): the top-k docs per token
    by weight — the classic serve-time pruning structure (answer
    any-term queries from k·|terms| rows instead of full posting lists).

    (token, doc_id, weight, rk), rk = 1-based impact rank.

    Skew note: posting lists are Zipf-distributed — a stopword's list
    can be 10^6× the median, so a single per-token window would put the
    whole stopword list in one task. Two-phase exact top-k instead
    (same shape as the frontier's per-host quota): rank within
    (token, salt) keeping ≤k — the global top-k per token is necessarily
    a union of per-salt top-k's — then re-rank the ≤ k·n_salts
    survivors per token. Ties break by doc_id ASC for determinism.
    """
    w1 = Window.partitionBy("token", "salt").orderBy(
        F.col("weight").desc(), F.col("doc_id").asc()
    )
    w2 = Window.partitionBy("token").orderBy(
        F.col("weight").desc(), F.col("doc_id").asc()
    )
    return (
        weights.withColumn("salt", F.pmod(F.col("doc_id"), F.lit(n_salts)))
        .withColumn("prk", F.row_number().over(w1))
        .filter(F.col("prk") <= k)
        .withColumn("rk", F.row_number().over(w2).cast("long"))
        .filter(F.col("rk") <= k)
        .select("token", "doc_id", "weight", "rk")
    )


def _pivot_score(qw: DataFrame, uniq: list[str], docs: DataFrame) -> DataFrame:
    """(doc_id, score) exact BM25 for the docs in ``docs`` — the same
    fixed query-order column pivot as bm25_search, so float addition
    order (and hence the oracle hash) is identical on every path."""
    per_term = [
        F.coalesce(
            F.max(F.when(F.col("token") == t, F.col("weight"))), F.lit(0.0)
        ).alias(f"w{i}")
        for i, t in enumerate(uniq)
    ]
    pivoted = (
        qw.join(docs, "doc_id", "left_semi").groupBy("doc_id").agg(*per_term)
    )
    score = F.col("w0")
    for i in range(1, len(uniq)):
        score = score + F.col(f"w{i}")
    return pivoted.select("doc_id", score.alias("score"))


def _essential_terms(
    ubs: list[tuple[str, float]], theta: float
) -> list[str]:
    """MaxScore term split: drop the maximal low-upper-bound SUFFIX
    whose cumulative UB sum stays strictly below theta — a doc matching
    only those terms scores < theta and cannot enter the top-k. At
    least one term always stays essential (theta is an achieved score,
    so it never strictly exceeds the sum of all UBs)."""
    by_ub = sorted(ubs, key=lambda p: (-p[1], p[0]))
    suffix = 0.0
    non_ess: set[str] = set()
    for t, ub in reversed(by_ub):
        if suffix + ub < theta:
            suffix += ub
            non_ess.add(t)
        else:
            break
    return [t for t, _ in by_ub if t not in non_ess]


def maxscore_search(
    weights: DataFrame,
    terms: list[str],
    k: int = 10,
    return_stats: bool = False,
):
    """Exact BM25 top-k with MaxScore pruning (Turtle & Flood IPM'95)
    re-expressed as dataflow — identical output to bm25_search, but only
    docs that can possibly reach the top-k are ever scored.

    Plan: (1) per-term weight upper bounds — |query| rows to the driver;
    (2) seed theta = k-th best exact score over the champion-list union
    (<= k·|terms| docs, one more driver scalar); (3) terms whose
    UB-descending suffix sums to < theta are non-essential — a doc
    matching only those scores < theta, below k already-found docs, so
    candidates = docs matching >= 1 ESSENTIAL term (∪ the seeds, which
    close every tie edge); (4) exact-score the candidates over ALL query
    terms with the bm25_search pivot. At 100 TB this is the difference
    between scoring every doc containing a stopword and scoring the rare
    terms' posting lists: the stopword list is scanned only in the
    semi-joined final scoring, never materialized as candidates.
    Driver state is O(|query|) scalars — never data. Exactness: every
    excluded doc scores strictly below theta, and theta is a lower bound
    on the true k-th score; ties beyond that break (score DESC, doc_id
    ASC) among included docs only.

    With return_stats=True also returns {n_terms, n_essential, theta,
    n_candidates, n_matching} for tests/observability (adds two counts).
    """
    uniq = list(dict.fromkeys(t.lower() for t in terms))
    empty = weights.select(
        "doc_id", F.lit(0.0).alias("score")
    ).limit(0)
    if not uniq or k < 1:
        return (empty, {}) if return_stats else empty
    qw = weights.filter(F.col("token").isin(uniq))
    ubs = [
        (r["token"], float(r["ub"]))
        for r in qw.groupBy("token").agg(F.max("weight").alias("ub")).collect()
    ]
    if not ubs:
        return (empty, {}) if return_stats else empty
    seed_docs = champion_lists(qw, k=k).select("doc_id").distinct()
    seed_top = (
        _pivot_score(qw, uniq, seed_docs)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
        .collect()
    )
    theta = float(seed_top[-1]["score"]) if len(seed_top) == k else float("-inf")
    ess = _essential_terms(ubs, theta)
    cands = (
        qw.filter(F.col("token").isin(ess))
        .select("doc_id")
        .union(seed_docs)
        .distinct()
    )
    out = (
        _pivot_score(qw, uniq, cands)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )
    if not return_stats:
        return out
    stats = {
        "n_terms": len(uniq),
        "n_essential": len(ess),
        "theta": theta,
        "n_candidates": cands.count(),
        "n_matching": qw.select("doc_id").distinct().count(),
    }
    return out, stats


def bmw_search(
    weights: DataFrame,
    terms: list[str],
    k: int = 10,
    block_size: int = 64,
    return_stats: bool = False,
):
    """Exact BM25 top-k with Block-Max WAND pruning (Ding & Suel,
    SIGIR'11) re-expressed as dataflow — identical output to
    bm25_search / maxscore_search, but pruning along the DOC-ID axis
    instead of MaxScore's term axis.

    Posting lists are partitioned into fixed doc-id-range blocks
    (``block = floor(doc_id / block_size)``) and a per-(token, block)
    max weight is aggregated — the distributed analog of the block-max
    skip metadata BMW keeps next to each posting block (and of parquet
    row-group zone maps: at 100 TB the (token, block) frame is smaller
    than the postings by ~block_size and is the only thing the pruning
    pass scans). A block whose summed query-term block-maxes falls
    strictly below theta cannot contain a top-k doc (any doc's score is
    bounded by its own block's UB sum), so candidate generation
    LEFT-SEMI-joins postings against the surviving block ids — posting
    rows in dead blocks are never shuffled or scored.

    theta is seeded exactly like maxscore_search: the k-th exact score
    over the champion-list union (a lower bound on the true k-th
    score). Exactness: a doc scoring >= theta forces its block UB >=
    theta, so no prunable block can hold a final answer; ties at theta
    stay in (blocks are kept at ub >= theta, not >). Driver state is
    O(|query|) scalars — block metadata stays distributed.

    Reference parity: same result contract as retrieve_query.py's
    ranked top-k (SURVEY §2 T2), verified against the brute-force
    bm25 oracle bit-for-bit.

    With return_stats=True also returns {n_blocks, n_live_blocks,
    theta, n_candidates, n_matching}.
    """
    uniq = list(dict.fromkeys(t.lower() for t in terms))
    empty = weights.select("doc_id", F.lit(0.0).alias("score")).limit(0)
    if not uniq or k < 1 or block_size < 1:
        return (empty, {}) if return_stats else empty
    qw = weights.filter(F.col("token").isin(uniq))
    seed_docs = champion_lists(qw, k=k).select("doc_id").distinct()
    seed_top = (
        _pivot_score(qw, uniq, seed_docs)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
        .collect()
    )
    if not seed_top:
        return (empty, {}) if return_stats else empty
    theta = float(seed_top[-1]["score"]) if len(seed_top) == k else float("-inf")
    blocked = qw.withColumn(
        "block", F.floor(F.col("doc_id") / F.lit(block_size))
    )
    bmax = blocked.groupBy("block", "token").agg(
        F.max("weight").alias("bmax")
    )
    live = (
        bmax.groupBy("block")
        .agg(F.sum("bmax").alias("block_ub"))
        .filter(F.col("block_ub") >= F.lit(theta))
        .select("block")
    )
    cands = (
        blocked.join(live, "block", "left_semi")
        .select("doc_id")
        .union(seed_docs)
        .distinct()
    )
    out = (
        _pivot_score(qw, uniq, cands)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )
    if not return_stats:
        return out
    stats = {
        "n_blocks": bmax.select("block").distinct().count(),
        "n_live_blocks": live.count(),
        "theta": theta,
        "n_candidates": cands.count(),
        "n_matching": qw.select("doc_id").distinct().count(),
    }
    return out, stats


def diversify_mmr(
    page: DataFrame,
    postings: DataFrame,
    lam: float = 0.5,
    k: int | None = None,
) -> DataFrame:
    """(rank, doc_id, mmr_score) — Maximal Marginal Relevance
    re-ranking of a RESULT PAGE (Carbonell & Goldstein 1998): greedily
    pick argmax λ·rel − (1−λ)·max-cosine-to-selected.

    `page` is (doc_id, score) — a top-k page, ≤k rows by construction.
    `postings` supplies sparse doc vectors as (doc_id, token, tf_idf);
    only the page docs' rows are pulled (broadcast semi-join prune).

    Greedy MMR is inherently sequential over the page, so the honest
    distributed shape is ONE applyInPandas group doing the k-step loop
    over ≤k rows — the same bounded-page rationale as rankeval's
    windows. The arithmetic is pycore/mmr.py verbatim (parity-tested),
    so results are deterministic and engine-independent.
    """
    import pandas as pd

    vec = postings.join(
        F.broadcast(page.select("doc_id")), "doc_id"
    ).select("doc_id", "token", F.col("tf_idf").alias("w"))
    joined = (
        page.select("doc_id", "score")
        .join(vec, "doc_id", "left")
        .withColumn("_g", F.pmod(F.col("doc_id"), F.lit(1)))
    )

    def _run(pdf: pd.DataFrame) -> pd.DataFrame:
        from searchengine_spark.pycore.mmr import mmr as _mmr

        rel = {}
        vectors: dict[int, dict[str, float]] = {}
        for r in pdf.itertuples(index=False):
            rel[int(r.doc_id)] = float(r.score)
            if r.token is not None and not (
                isinstance(r.token, float) and pd.isna(r.token)
            ):
                vectors.setdefault(int(r.doc_id), {})[str(r.token)] = float(
                    r.w
                )
        out = _mmr(sorted(rel.items()), vectors, lam=lam, k=k)
        return pd.DataFrame(
            {
                "rank": [o[0] for o in out],
                "doc_id": [o[1] for o in out],
                "mmr_score": [o[2] for o in out],
            }
        )

    return joined.groupBy("_g").applyInPandas(
        _run, "rank long, doc_id long, mmr_score double"
    )


# ---- query-likelihood LM ranking (Dirichlet smoothing) ----------------

MU = 2000.0


def qlm_search(
    documents: DataFrame,
    terms: list[str],
    k: int = 10,
    mu: float = MU,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k docs by Dirichlet-smoothed query likelihood (Zhai &
    Lafferty 2001) — the language-model ranking family next to BM25:

      score(q, d) = Σ_{t ∈ q} ln((f_{t,d} + μ·cf_t/|C|) / (dl_d + μ))

    with cf_t the collection frequency of t and |C| the corpus token
    count. Candidate set = docs matching ≥ 1 query term (standard
    any-term evaluation; the smoothed score of a no-match doc is a
    query-constant and cannot enter the top-k of matching docs for
    ranking purposes at practical μ).

    Scale shape: identical to bm25_search — the scan is pruned to the
    query terms (token-IN pushdown on the sorted index layout), the
    per-term frequencies pivot into fixed columns in ONE
    groupBy(doc_id), and the per-term logs are added in query order so
    the float sum is deterministic. Collection stats are two exact-long
    aggregates; cf_t is |terms| longs collected once (query-time
    constants, like bm25's N/avgdl)."""
    uniq = list(dict.fromkeys(t.lower() for t in terms))
    toks = doc_tokens(documents, id_col, text_col).filter(F.col("n_terms") > 0)
    if not uniq:
        return documents.sparkSession.createDataFrame(
            [], "doc_id long, score double"
        )
    stats = toks.agg(F.sum("n_terms").alias("total")).collect()[0]
    total = int(stats["total"] or 0)
    if total == 0:
        return documents.sparkSession.createDataFrame(
            [], "doc_id long, score double"
        )
    ex = toks.select(
        "doc_id", "n_terms", F.explode("tokens").alias("token")
    ).filter(F.col("token").isin(uniq))
    cf = {
        r["token"]: int(r["cf"])
        for r in ex.groupBy("token").agg(F.count("*").alias("cf")).collect()
    }
    per_term = [
        F.coalesce(
            F.sum(F.when(F.col("token") == t, F.lit(1)).otherwise(F.lit(0))),
            F.lit(0),
        ).alias(f"f{i}")
        for i, t in enumerate(uniq)
    ]
    piv = ex.groupBy("doc_id").agg(
        F.first("n_terms").alias("dl"), *per_term
    )
    dl = F.col("dl").cast("double")
    # Zero-cf terms (absent from the whole corpus) are dropped from the
    # sum: their f_{t,d} is 0 for every candidate too, so their
    # contribution is the doc-independent ln(0) = -inf — which in Spark
    # SQL is F.log(0) = NULL and would silently null the whole score
    # (nulls sort last), diverging from a true -inf tie. Dropping them
    # leaves the ranking among candidates unchanged.
    score = None
    for i, t in enumerate(uniq):
        if cf.get(t, 0) == 0:
            continue
        prior = (mu * cf[t]) / total  # python double == SQL double
        term = F.log(
            (F.col(f"f{i}").cast("double") + F.lit(prior))
            / (dl + F.lit(mu))
        )
        score = term if score is None else score + term
    if score is None:  # every term zero-cf ⇒ no candidates exist either
        score = F.lit(0.0)
    return (
        piv.select("doc_id", score.alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def lmjm_search(
    documents: DataFrame,
    terms: list[str],
    k: int = 10,
    lam: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k docs by Jelinek-Mercer-smoothed query likelihood (Zhai &
    Lafferty 2001's other classic smoother, next to qlm_search's
    Dirichlet):

      score(q, d) = Σ_{t ∈ q} ln((1-λ)·f_{t,d}/dl_d + λ·cf_t/|C|)

    JM mixes the document MLE with the collection model at a FIXED λ
    (Dirichlet's μ adapts to document length); Zhai-Lafferty found JM
    better for verbose queries, Dirichlet for keyword queries — serving
    both is the point of having the family. Candidate set, zero-cf
    guard, and plan shape are identical to qlm_search: token-IN pruned
    scan, ONE groupBy(doc_id) pivot into fixed per-term columns,
    query-ordered log sum (deterministic doubles), collection stats as
    exact-long query constants.
    """
    uniq = list(dict.fromkeys(t.lower() for t in terms))
    toks = doc_tokens(documents, id_col, text_col).filter(F.col("n_terms") > 0)
    if not uniq:
        return documents.sparkSession.createDataFrame(
            [], "doc_id long, score double"
        )
    stats = toks.agg(F.sum("n_terms").alias("total")).collect()[0]
    total = int(stats["total"] or 0)
    if total == 0:
        return documents.sparkSession.createDataFrame(
            [], "doc_id long, score double"
        )
    ex = toks.select(
        "doc_id", "n_terms", F.explode("tokens").alias("token")
    ).filter(F.col("token").isin(uniq))
    cf = {
        r["token"]: int(r["cf"])
        for r in ex.groupBy("token").agg(F.count("*").alias("cf")).collect()
    }
    per_term = [
        F.coalesce(
            F.sum(F.when(F.col("token") == t, F.lit(1)).otherwise(F.lit(0))),
            F.lit(0),
        ).alias(f"f{i}")
        for i, t in enumerate(uniq)
    ]
    piv = ex.groupBy("doc_id").agg(F.first("n_terms").alias("dl"), *per_term)
    dl = F.col("dl").cast("double")
    score = None
    for i, t in enumerate(uniq):
        if cf.get(t, 0) == 0:  # doc-independent -inf; see qlm_search
            continue
        prior = lam * cf[t] / total  # python double == SQL double
        term = F.log(
            F.lit(1.0 - lam) * F.col(f"f{i}").cast("double") / dl
            + F.lit(prior)
        )
        score = term if score is None else score + term
    if score is None:
        score = F.lit(0.0)
    return (
        piv.select("doc_id", score.alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def pivoted_search(
    documents: DataFrame,
    terms: list[str],
    k: int = 10,
    s: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k docs by pivoted length normalization VSM (Singhal, Buckley
    & Mitra, SIGIR 1996) — the fourth ranking family beside BM25, the
    LM smoothers and DFR PL2, and the one that introduced the pivot
    idea BM25's b-normalization popularized:

      w(t, d) = (1 + ln(1 + ln(tf))) / ((1-s) + s·dl/avgdl)
                · ln((N+1)/df_t)

    summed over query terms (qtf = 1 per unique term). Same plan as
    the family: token-IN pruned scan, ONE groupBy(doc_id) pivot,
    query-ordered sum; N/avgdl/df are exact-count constants; zero-df
    terms drop (no candidate can match them).
    """
    uniq = list(dict.fromkeys(t.lower() for t in terms))
    toks = doc_tokens(documents, id_col, text_col).filter(F.col("n_terms") > 0)
    if not uniq:
        return documents.sparkSession.createDataFrame(
            [], "doc_id long, score double"
        )
    stats = toks.agg(
        F.count("*").alias("n"), F.sum("n_terms").alias("total")
    ).collect()[0]
    n_docs, total = int(stats["n"] or 0), int(stats["total"] or 0)
    if n_docs == 0:
        return documents.sparkSession.createDataFrame(
            [], "doc_id long, score double"
        )
    ex = toks.select(
        "doc_id", "n_terms", F.explode("tokens").alias("token")
    ).filter(F.col("token").isin(uniq))
    df_t = {
        r["token"]: int(r["df"])
        for r in ex.select("doc_id", "token")
        .distinct()
        .groupBy("token")
        .agg(F.count("*").alias("df"))
        .collect()
    }
    per_term = [
        F.coalesce(
            F.sum(F.when(F.col("token") == t, F.lit(1)).otherwise(F.lit(0))),
            F.lit(0),
        ).alias(f"f{i}")
        for i, t in enumerate(uniq)
    ]
    piv = ex.groupBy("doc_id").agg(F.first("n_terms").alias("dl"), *per_term)
    norm = (
        f"(({1.0 - s!r}D) + {s!r}D * CAST(dl AS DOUBLE) "
        f"/ (CAST({total} AS DOUBLE) / CAST({n_docs} AS DOUBLE)))"
    )
    parts = []
    for i, t in enumerate(uniq):
        if df_t.get(t, 0) == 0:
            continue
        idf = (
            f"ln(CAST({n_docs + 1} AS DOUBLE) "
            f"/ CAST({df_t[t]} AS DOUBLE))"
        )
        parts.append(
            f"(CASE WHEN f{i} > 0 THEN "
            f"(1.0D + ln(1.0D + ln(CAST(f{i} AS DOUBLE)))) / {norm} "
            f"* {idf} ELSE 0.0D END)"
        )
    score = " + ".join(parts) if parts else "0.0D"
    return (
        piv.selectExpr("doc_id", f"({score}) AS score")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


# ---- DFR PL2 ranking --------------------------------------------------


def pl2_term_sql(
    f_sql: str, dl_sql: str, lam: str, avgdl: str, c: float = 1.0
) -> str:
    """Engine-portable SQL for one query term's PL2 contribution
    (Amati & van Rijsbergen 2002; the Terrier PL2 formulation):

      tfn  = f · log2(1 + c·avgdl/dl)
      gain = (1/(tfn+1)) · ( tfn·log2(tfn/λ)
                             + (λ + 1/(12·tfn) − tfn)·log2(e)
                             + 0.5·log2(2π·tfn) )

    log2 is spelled ln(x)/ln(2) throughout (exp/log2 are NOT libm
    bit-parity across engines; ln is — see BENCH notes), with ln 2,
    log2(e) and 2π embedded as the same Python double literals on both
    sides. Guarded to 0 for f = 0, so no ln(0) can surface.

    The helper returns TEXT both Spark's selectExpr and DuckDB parse
    identically — one source of truth for the arithmetic, two engines.
    """
    import math

    ln2 = f"{math.log(2.0)!r}e0"  # e-suffix: DuckDB would parse a bare
    log2e = f"{1.0 / math.log(2.0)!r}e0"  # decimal literal as DECIMAL
    twopi = f"{2.0 * math.pi!r}e0"
    tfn = (
        f"(CAST({f_sql} AS DOUBLE) * "
        f"(ln(1.0e0 + {c!r}e0 * ({avgdl}) / CAST({dl_sql} AS DOUBLE)) "
        f"/ {ln2}))"
    )
    gain = (
        f"(1.0e0 / ({tfn} + 1.0e0)) * "
        f"({tfn} * (ln({tfn} / ({lam})) / {ln2}) "
        f"+ (({lam}) + 1.0e0 / (12.0e0 * {tfn}) - {tfn}) * {log2e} "
        f"+ 0.5e0 * (ln({twopi} * {tfn}) / {ln2}))"
    )
    return f"(CASE WHEN {f_sql} > 0 THEN {gain} ELSE 0.0e0 END)"


def pl2_search(
    documents: DataFrame,
    terms: list[str],
    k: int = 10,
    c: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k docs by DFR PL2 — the Divergence-From-Randomness family
    beside BM25 (probabilistic) and QLM/LMJM (language-model): Poisson
    randomness model, Laplace first normalization, length normalization
    2. Parameter-light (one constant c) and strong on short queries —
    the reason Terrier ships it as a default alternative.

    Plan shape is the family standard: token-IN pruned scan, ONE
    groupBy(doc_id) pivot, fixed query-order sum of per-term gains.
    λ_t = cf_t/N and avgdl are exact-count query constants; the term
    arithmetic text comes from pl2_term_sql, the same string the
    oracle compiles, so scores bit-match.
    """
    uniq = list(dict.fromkeys(t.lower() for t in terms))
    toks = doc_tokens(documents, id_col, text_col).filter(F.col("n_terms") > 0)
    if not uniq:
        return documents.sparkSession.createDataFrame(
            [], "doc_id long, score double"
        )
    stats = toks.agg(
        F.count("*").alias("n"), F.sum("n_terms").alias("total")
    ).collect()[0]
    n_docs, total = int(stats["n"] or 0), int(stats["total"] or 0)
    if n_docs == 0:
        return documents.sparkSession.createDataFrame(
            [], "doc_id long, score double"
        )
    avgdl = f"(CAST({total} AS DOUBLE) / CAST({n_docs} AS DOUBLE))"
    ex = toks.select(
        "doc_id", "n_terms", F.explode("tokens").alias("token")
    ).filter(F.col("token").isin(uniq))
    cf = {
        r["token"]: int(r["cf"])
        for r in ex.groupBy("token").agg(F.count("*").alias("cf")).collect()
    }
    per_term = [
        F.coalesce(
            F.sum(F.when(F.col("token") == t, F.lit(1)).otherwise(F.lit(0))),
            F.lit(0),
        ).alias(f"f{i}")
        for i, t in enumerate(uniq)
    ]
    piv = ex.groupBy("doc_id").agg(F.first("n_terms").alias("dl"), *per_term)
    gains = [
        pl2_term_sql(
            f"f{i}",
            "dl",
            f"(CAST({cf[t]} AS DOUBLE) / CAST({n_docs} AS DOUBLE))",
            avgdl,
            c,
        )
        for i, t in enumerate(uniq)
        if cf.get(t, 0) > 0  # zero-cf: no doc matches; drop (qlm guard)
    ]
    score = " + ".join(gains) if gains else "0.0e0"
    return (
        piv.selectExpr("doc_id", f"({score}) AS score")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


# ---- Rocchio pseudo-relevance feedback --------------------------------


def rocchio_expand(
    documents: DataFrame,
    terms: list[str],
    k_fb: int = 5,
    m: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(token, rocchio_weight) — the m best query-expansion terms by
    Rocchio pseudo-relevance feedback: run the query, take the top-k_fb
    documents as pseudo-relevant, average their tf·idf vectors, and
    return the highest-weight terms NOT already in the query (the
    positive-feedback β-term of the classic Rocchio update; with no
    true negative judgments the γ-term is zero and α only rescales the
    original terms, so the centroid IS the expansion signal).

    Scale shape: the feedback set is k_fb rows — it broadcasts into a
    semi-join that prunes the postings scan to k_fb documents before
    the per-token aggregation, so the centroid costs one shuffle of
    k_fb document vectors regardless of corpus size. The per-token mean
    folds the (≤ k_fb) contributions in doc_id order via
    aggregate(sort_array(...)) for bit-stable doubles."""
    from searchengine_spark.operators.tfidf import build_postings

    uniq = list(dict.fromkeys(t.lower() for t in terms))
    w = bm25_table(documents, id_col, text_col)
    fb = bm25_search(w, uniq, k=k_fb).select("doc_id")
    post = build_postings(documents, id_col, text_col)
    cent = (
        post.join(F.broadcast(fb), "doc_id")
        .groupBy("token")
        .agg(
            F.expr(
                "aggregate(sort_array(collect_list(struct(doc_id, tf_idf))),"
                " 0.0D, (acc, s) -> acc + s.tf_idf)"
            ).alias("s")
        )
        .select(
            "token",
            (F.col("s") / F.lit(float(k_fb))).alias("rocchio_weight"),
        )
    )
    return (
        cent.filter(~F.col("token").isin(uniq))
        .orderBy(F.col("rocchio_weight").desc(), F.col("token").asc())
        .limit(m)
    )


# ---- BM25F: field-weighted BM25 (simple/weighted-tf variant) ----------

# field model = the deterministic A6 html fixture split (tagweights):
# <title> = chars 1..64 (weight 3), <b> = 65..128 (weight 2), body =
# the rest (weight 1). INTEGER weights keep every aggregate exact-int
# until the final BM25 saturation, so the DuckDB oracle is bit-stable.
BM25F_FIELDS: list[tuple[str, int]] = [
    ("substring({t}, 1, 64)", 3),
    ("substring({t}, 65, 64)", 2),
    ("substring({t}, 129, greatest(length({t}) - 128, 0))", 1),
]


def bm25f_table(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """(doc_id, token, weight) — simple BM25F (Robertson & Zaragoza):
    per-field term frequencies combine BEFORE saturation,

      tf̃(t,d) = Σ_f w_f·tf_f(t,d),   dl̃(d) = Σ_f w_f·len_f(d),
      weight   = idf(t) · tf̃·(k1+1) / (tf̃ + k1·(1−b+b·dl̃/avgdl̃)),

    with Lucene idf over df = #docs where tf̃ > 0. A title hit outranks
    the same hit buried in the body — the field-aware counterpart of
    the reference's A6 tag boosts (helpers.py:31-47), composed into a
    principled ranking function instead of a post-hoc tf·idf scale.

    Scale shape: ONE explode pass emits (token, field-weight) pairs for
    all fields (no per-field scans), then the same two shuffles as
    bm25_table — (doc, token) partial-agg and a broadcastable token
    dictionary. tf̃/dl̃ are exact int64 (integer field weights); avgdl̃
    derives once from two exact longs."""
    from searchengine_spark.functions.text import tokens_sql

    pairs = " , ".join(
        f"transform({tokens_sql(expr.format(t=text_col))}, "
        f"t -> named_struct('token', t, 'w', CAST({w} AS BIGINT)))"
        for expr, w in BM25F_FIELDS
    )
    ex = documents.selectExpr(
        f"{id_col} AS doc_id", f"explode(concat({pairs})) AS s"
    ).select("doc_id", F.col("s.token").alias("token"), F.col("s.w").alias("w"))
    wtf = ex.groupBy("doc_id", "token").agg(F.sum("w").alias("wtf"))
    wdl = ex.groupBy("doc_id").agg(F.sum("w").alias("wdl"))
    stats = wdl.agg(
        F.count("*").alias("n"), F.sum("wdl").alias("sumwdl")
    ).collect()[0]
    if not stats["n"]:
        return documents.sparkSession.createDataFrame(
            [], "doc_id long, token string, weight double"
        )
    n_docs, sumwdl = int(stats["n"]), int(stats["sumwdl"])
    avgwdl = F.lit(float(sumwdl)) / F.lit(float(n_docs))
    df_tab = wtf.groupBy("token").agg(F.count("*").alias("df"))
    idf = df_tab.select(
        "token",
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        ).alias("idf"),
    )
    ft, dl = F.col("wtf").cast("double"), F.col("wdl").cast("double")
    return (
        wtf.join(wdl, "doc_id")
        .join(idf, "token")
        .select(
            "doc_id",
            "token",
            (
                F.col("idf")
                * (ft * F.lit(k1 + 1.0))
                / (
                    ft
                    + F.lit(k1)
                    * (F.lit(1.0) - F.lit(b) + F.lit(b) * dl / avgwdl)
                )
            ).alias("weight"),
        )
    )


def bm25f_search(
    documents: DataFrame,
    terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k docs by Σ of per-term BM25F weights — same fixed-order
    pivot plan as bm25_search (deterministic float-sum order)."""
    return bm25_search(bm25f_table(documents, id_col, text_col), terms, k)


# ---- Reciprocal Rank Fusion -------------------------------------------


def rrf_fuse(
    documents: DataFrame,
    terms: list[str],
    k: int = 10,
    k_rrf: int = 60,
    n_cand: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k docs by Reciprocal Rank Fusion (Cormack, Clarke &
    Buettcher, SIGIR 2009) of the BM25 and query-likelihood rankings:

      rrf(d) = Σ_{r ∈ {bm25, qlm}} 1 / (k_rrf + rank_r(d))

    with rank_r the 1-based position of d in ranking r's top-n_cand
    (docs outside a ranking contribute 0 for it). The reference serves
    one fixed tf·idf ranking (retrieve_query.py:142); RRF is the
    standard public recipe for combining heterogeneous rankings
    without score calibration — ranks, not scores, fuse.

    Determinism: both input rankings order by (score DESC, doc_id ASC)
    with bit-reproducible scores (see bm25_search / qlm_search), so the
    ranks are exact ints; the fused score is a fixed-order sum of two
    per-row doubles — no shuffle-order float dependence.

    Scale shape (100 TB): the expensive work is the two candidate
    searches, each a token-IN pruned scan + ONE groupBy pivot. The
    fusion itself touches ≤ 2·n_cand rows — the row_number windows and
    the outer join run on frames bounded by n_cand (a query-time
    constant), so the single-partition window is bounded by
    construction, never corpus-sized.
    """
    w = bm25_table(documents, id_col, text_col)
    bm = bm25_search(w, terms, k=n_cand).select(
        "doc_id",
        F.row_number()
        .over(
            # n_cand-bounded page; constant non-foldable key, see
            # rankeval.py
            Window.partitionBy(
                F.pmod(F.col("doc_id"), F.lit(1))
            ).orderBy(F.col("score").desc(), F.col("doc_id").asc())
        )
        .alias("rb"),
    )
    ql = qlm_search(documents, terms, k=n_cand, id_col=id_col,
                    text_col=text_col).select(
        "doc_id",
        F.row_number()
        .over(
            # n_cand-bounded page; constant non-foldable key, see
            # rankeval.py
            Window.partitionBy(
                F.pmod(F.col("doc_id"), F.lit(1))
            ).orderBy(F.col("score").desc(), F.col("doc_id").asc())
        )
        .alias("rq"),
    )
    kd = float(k_rrf)
    fused = bm.join(ql, "doc_id", "full_outer").select(
        "doc_id",
        (
            F.coalesce(F.lit(1.0) / (F.lit(kd) + F.col("rb")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(kd) + F.col("rq")), F.lit(0.0))
        ).alias("score"),
    )
    return fused.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)


# ---- Query clarity (query-performance prediction) ----------------------


def clarity_score(
    documents: DataFrame,
    terms: list[str],
    k_fb: int = 10,
    mu: float = MU,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """1-row (clarity,) — the Cronen-Townsend/Zhou/Croft (SIGIR 2002)
    query-clarity score, the classic pre-retrieval-quality predictor:
    the KL divergence (in bits) between the query's feedback language
    model and the collection model,

      clarity = Σ_w P(w|q) · log2( P(w|q) / P(w|C) )

    over the top-k_fb QLM feedback docs R, with the uniform-prior
    relevance model P(w|q) = (1/|R|) Σ_{d∈R} f_{w,d}/dl_d and
    P(w|C) = cf_w/|C|. Uniform feedback weights (Lavrenko RM1 with a
    uniform query-likelihood prior over R) are used DELIBERATELY: the
    weighted variant needs exp(score), and exp() is not bit-identical
    between the JVM and DuckDB libm (measured), which would break the
    oracle's 1e-9 float hash; ln() is parity-proven, so log2 is
    computed as ln(x)/ln(2) in both engines.

    Determinism: per-token numerators fold in doc_id order, the final
    KL sum folds in token order, |R| and all counts are exact ints —
    the score is reproducible across partitionings bit-for-bit.

    Scale shape (100 TB): the feedback set is ≤ k_fb rows (broadcast);
    only R's tokens shuffle (one groupBy(doc_id, token) over k_fb docs,
    then one groupBy(token) fold); the collection model reuses the
    dictionary's cf aggregate. A high-clarity query is specific
    (focused feedback vocabulary), a low-clarity one is ambiguous —
    the standard signal for selective query expansion (only expand
    when clarity is low).
    """
    top = qlm_search(documents, terms, k=k_fb, mu=mu,
                     id_col=id_col, text_col=text_col)
    fb = top.select("doc_id")
    n_fb = fb.count()
    if n_fb == 0:
        return documents.sparkSession.createDataFrame([], "clarity double")
    toks = doc_tokens(documents, id_col, text_col).filter(F.col("n_terms") > 0)
    ex = toks.select(
        "doc_id", "n_terms", F.explode("tokens").alias("token")
    )
    stats = ex.agg(F.count("*").alias("total")).collect()[0]
    total = int(stats["total"])
    cf = ex.groupBy("token").agg(F.count("*").alias("cf"))
    fr = (
        ex.join(F.broadcast(fb), "doc_id")
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("f"), F.first("n_terms").alias("dl"))
    )
    num = fr.groupBy("token").agg(
        F.expr(
            "aggregate(sort_array(collect_list(struct(doc_id, "
            "CAST(f AS DOUBLE) / CAST(dl AS DOUBLE) AS v))), 0.0D, "
            "(acc, s) -> acc + s.v)"
        ).alias("num")
    )
    pwq = F.col("num") / F.lit(float(n_fb))
    pwc = F.col("cf").cast("double") / F.lit(float(total))
    contrib = pwq * (F.log(pwq / pwc) / F.log(F.lit(2.0)))
    return (
        num.join(cf, "token")
        .select("token", contrib.alias("term"))
        .agg(
            F.expr(
                "aggregate(sort_array(collect_list(struct(token, term AS v))), "
                "0.0D, (acc, s) -> acc + s.v)"
            ).alias("clarity")
        )
    )


# ---- static-quality-prior blending ------------------------------------


def blend_with_prior(
    documents: DataFrame,
    terms: list[str],
    prior: DataFrame,
    k: int = 10,
    lam: float = 0.25,
    n_cand: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k docs by BM25 blended with a query-INDEPENDENT quality
    prior:  score = bm25 + λ·ln(prior_rank)  — the textbook
    static-score combination (IIR §7.1.4; net-quality priors like
    PageRank enter ranked retrieval exactly this way). `prior` is a
    (doc_id, rank) frame, e.g. linkrank.pagerank output.

    Standard two-stage shape: retrieve top-n_cand by text score (the
    pruned-scan bm25 plan), then re-rank the bounded candidate page by
    the blend — the prior join touches ≤ n_cand rows (broadcast the
    candidates, not the corpus-wide prior). The blend is one
    fixed-order two-term sum of deterministic doubles."""
    w = bm25_table(documents, id_col, text_col)
    cand = bm25_search(w, terms, k=n_cand)
    j = F.broadcast(cand).join(
        prior.select("doc_id", F.col("rank").alias("_pr")), "doc_id"
    )
    blended = j.select(
        "doc_id",
        (F.col("score") + F.lit(lam) * F.log(F.col("_pr"))).alias("score"),
    )
    return blended.orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    ).limit(k)


# ---- SERP site collapsing ---------------------------------------------


def site_collapse(
    ranked: DataFrame,
    hosts: DataFrame,
    k: int = 10,
    per_host: int = 2,
) -> DataFrame:
    """(doc_id, host, score) — host-diversified top-k: at most
    `per_host` results from any one host, by rank order (the universal
    SERP "site collapsing" rule — without it one mirror-heavy host
    owns the whole page). ranked: (doc_id, score) — a candidate page,
    already bounded (the search's top-n output); hosts: (doc_id, host).

    One host-partitioned row_number over the bounded candidate frame +
    the final top-k ordering — no corpus-sized window anywhere."""
    j = ranked.join(hosts, "doc_id")
    wh = Window.partitionBy("host").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        j.withColumn("_r", F.row_number().over(wh))
        .filter(F.col("_r") <= per_host)
        .drop("_r")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", "host", "score")
    )


def nqc_score(
    documents: DataFrame,
    terms: list[str],
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """1-row (n_scored, mu, nqc) — Normalized Query Commitment (Shtok,
    Kurland & Carmel 2012), the standard POST-retrieval query-
    performance predictor next to the pre-retrieval clarity_score:

      NQC = sqrt( (1/k) Σ_{d ∈ top-k} (s(d) − μ)² ) / s_total

    high variance among the top scores ⇒ the ranking "commits" to a
    few documents (an easy query); a flat score curve predicts poor
    effectiveness. s_total (the normalizer) is the corpus-wide sum of
    per-term BM25 weights for the query — a collection-level score
    magnitude, computed here as a doc_id-ordered fold.

    Determinism: the top-k scores and their μ/variance fold in doc_id
    order (a bounded ≤k list); every division is a fixed expression.
    Cost: the bm25 candidate plan + one bounded fold — nothing
    corpus-sized beyond what the search already pays."""
    w = bm25_table(documents, id_col, text_col)
    top = bm25_search(w, terms, k=k)
    uniq = list(dict.fromkeys(t.lower() for t in terms))
    stot_row = (
        w.filter(F.col("token").isin(uniq))
        .agg(
            F.expr(
                "aggregate(sort_array(collect_list(struct(doc_id, token, "
                "weight AS v))), 0.0D, (a, s) -> a + s.v)"
            ).alias("stot")
        )
        .collect()[0]
    )
    stot = float(stot_row["stot"] or 0.0)
    agg = top.agg(
        F.count("*").alias("n"),
        F.expr(
            "aggregate(sort_array(collect_list(struct(doc_id, score AS v))), "
            "0.0D, (a, s) -> a + s.v)"
        ).alias("s1"),
        F.expr(
            "aggregate(sort_array(collect_list(struct(doc_id, "
            "score * score AS v))), 0.0D, (a, s) -> a + s.v)"
        ).alias("s2"),
    )
    n = F.col("n").cast("double")
    mu = F.col("s1") / n
    var = F.col("s2") / n - mu * mu
    nqc = F.when(
        (F.col("n") > 0) & (F.lit(stot) > 0.0),
        F.sqrt(F.greatest(var, F.lit(0.0))) / F.lit(stot),
    ).otherwise(F.lit(0.0))
    return agg.select(
        F.col("n").alias("n_scored"),
        F.when(F.col("n") > 0, mu).otherwise(F.lit(0.0)).alias("mu"),
        nqc.alias("nqc"),
    )
