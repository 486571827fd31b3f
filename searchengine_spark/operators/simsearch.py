"""Approximate-nearest-neighbor search over an embedding column
(`embeddings(vec_id, embedding array<float>, label)`).

Two paths, per the training-data-pipeline contract:
  * `brute_topk` — exact cosine top-k. One scan, one local top-k per
    partition, merge of k·P rows on the driver side of the sort —
    Spark's orderBy+limit already executes as TakeOrderedAndProject.
    The dot product is zip_with/aggregate Column exprs (JVM,
    whole-stage-codegen; deterministic sequential sum).
  * `lsh_topk` — the scale path: random-hyperplane LSH (sign bits of
    h seeded deterministic hyperplanes → bucket id); only the query's
    bucket (and optionally neighboring probes) is scanned. Recall < 1
    by construction; parameters trade recall vs scan fraction. At
    10^10 rows the bucket column is the table's partition key, so a
    query touches one partition.

Hyperplanes are generated from a seeded counter hash (no wall-clock, no
numpy RNG state) so plans are reproducible run-to-run.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_COSINE = (
    "CASE WHEN na = 0.0 OR nb = 0.0 THEN CAST(0.0 AS double) "
    "ELSE dot / (sqrt(na) * sqrt(nb)) END"
)


def _as_double(vec_col: str) -> str:
    return f"transform({vec_col}, x -> CAST(x AS double))"


def with_query_cosine(
    vecs: DataFrame, query_vec: list[float], vec_col: str = "v"
) -> DataFrame:
    """Adds `cosine` of each row's vector vs the literal query vector."""
    q = [float(x) for x in query_vec]
    qlit = "array(" + ", ".join(f"CAST({x!r} AS double)" for x in q) + ")"
    nq = sum(x * x for x in q)
    return (
        vecs.withColumn(
            "dot",
            F.expr(
                f"aggregate(zip_with({vec_col}, {qlit}, (x, y) -> x * y), "
                "0.0D, (a, x) -> a + x)"
            ),
        )
        .withColumn("na", F.expr(f"aggregate({vec_col}, 0.0D, (a, x) -> a + x * x)"))
        .withColumn("nb", F.lit(float(nq)))
        .withColumn("cosine", F.expr(_COSINE))
    )


def brute_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (vec_id, cosine), cosine desc, vec_id asc
    tie-break (deterministic)."""
    vecs = embeddings.select(
        F.col(id_col).alias("vec_id"), F.expr(_as_double(vec_col)).alias("v")
    )
    scored = with_query_cosine(vecs, query_vec)
    return (
        scored.select("vec_id", "cosine")
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def _mix64(x: int) -> int:
    """Full splitmix64 finalizer — a single xorshift over a linear
    counter leaves successive outputs correlated, which measurably
    degrades LSH recall (correlated plane components ⇒ correlated sign
    bits across bands)."""
    x = (x + 0x9E3779B97F4A7C15) % (1 << 64)
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) % (1 << 64)
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) % (1 << 64)
    x ^= x >> 31
    return x


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-Gaussian hyperplanes: Box-Muller over a
    counter hash (splitmix64) — reproducible, no RNG object."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(0, dim, 2):
            z = _mix64((seed << 32) + p * dim + d)
            u1 = ((z & 0xFFFFFFFF) + 1) / (1 << 32)
            u2 = ((z >> 32) + 1) / (1 << 32)
            r = math.sqrt(-2.0 * math.log(u1))
            row.append(r * math.cos(2.0 * math.pi * u2))
            if d + 1 < dim:
                row.append(r * math.sin(2.0 * math.pi * u2))
        planes.append(row[:dim])
    return planes


def with_lsh_bucket(
    vecs: DataFrame, planes: list[list[float]], vec_col: str = "v"
) -> DataFrame:
    """Adds `bucket` = integer of sign bits of ⟨v, plane_i⟩."""
    bits = []
    for i, plane in enumerate(planes):
        plit = "array(" + ", ".join(f"CAST({x!r} AS double)" for x in plane) + ")"
        bits.append(
            f"(CASE WHEN aggregate(zip_with({vec_col}, {plit}, (x, y) -> x * y), "
            f"0.0D, (a, x) -> a + x) >= 0.0D THEN {1 << i}L ELSE 0L END)"
        )
    return vecs.withColumn("bucket", F.expr(" + ".join(bits)))


_SQ_DIST = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
    "0.0D, (acc, x) -> acc + x)"
)


def _sqdist_py(a: list[float], b: list[float]) -> float:
    """Sequential-fold squared L2 — bit-identical to the _SQ_DIST SQL
    fold (dims in order, IEEE double)."""
    d = 0.0
    for x, y in zip(a, b):
        d += (x - y) * (x - y)
    return d


def train_centroids(
    sample: list[tuple[int, list[float]]], n_centroids: int, iters: int
) -> list[tuple[int, list[float]]]:
    """Deterministic Lloyd iterations over a BOUNDED id-ordered sample.

    Seeds = the first n_centroids sample vectors (by id); each
    iteration assigns every sample vector to its nearest centroid
    (sequential-fold squared-L2, lowest-cid tie-break) and moves each
    centroid to the member mean (per-dim sum folded in vec_id order /
    count — a defined summation order, so DuckDB reproduces the exact
    doubles with an ORDER BY vec_id list fold). An empty cluster keeps
    its previous centroid. Labels stay the seed ids.

    The sample is bounded (train_sample rows), so training is O(sample ·
    K · iters) driver-side floats — the standard quantizer-training
    shape (FAISS trains IVF on a sample too); the full-table assignment
    stays distributed.
    """
    cents = [(vid, list(v)) for vid, v in sample[:n_centroids]]
    for _ in range(iters):
        members: dict[int, list[list[float]]] = {cid: [] for cid, _ in cents}
        for vid, v in sample:  # sample is vec_id-ascending
            best_cid, best_d = None, None
            for cid, cv in cents:  # cid ascending → ties keep lowest cid
                d = _sqdist_py(v, cv)
                if best_d is None or d < best_d:
                    best_cid, best_d = cid, d
            members[best_cid].append(v)
        nxt = []
        for cid, cv in cents:
            mem = members[cid]
            if not mem:
                nxt.append((cid, cv))
                continue
            dim = len(cv)
            nc = []
            for j in range(dim):
                s = 0.0
                for v in mem:  # vec_id order — defined summation order
                    s += v[j]
                nc.append(s / len(mem))
            nxt.append((cid, nc))
        cents = nxt
    return cents


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_iters: int = 2,
    train_sample: int = 256,
) -> DataFrame:
    """IVF (inverted-file) ANN: coarse-quantize every vector to its
    nearest centroid, search only the `nprobe` centroid lists nearest
    the query — the classic FAISS-style scale path (scan fraction ≈
    nprobe/n_centroids; recall trades against nprobe).

    Coarse quantizer: Lloyd-trained (train_iters deterministic
    iterations) on the first `train_sample` vectors by id, seeded from
    the first n_centroids of that sample — data-derived, reproducible,
    and engine-portable (every fold has a defined order, so the DuckDB
    oracle replays the identical arithmetic). Training on a skewed
    corpus rebalances the lists vs raw first-K medoids (tested).
    Assignment = argmin squared-L2 (sequential fold, centroid-id
    tie-break) over a BROADCAST literal centroid table — the n×K
    distance stage never shuffles the vectors. At storage scale the
    assigned centroid id is the table's partition key, so a query reads
    nprobe partitions.
    """
    q = [float(x) for x in query_vec]
    vecs = embeddings.select(
        F.col(id_col).alias("vec_id"), F.expr(_as_double(vec_col)).alias("v")
    )
    # bounded, deterministic training sample (id-ordered — works for
    # sparse/offset id spaces, unlike a `vec_id < K` predicate)
    sample_rows = vecs.orderBy("vec_id").limit(train_sample).collect()
    sample = [(r["vec_id"], [float(x) for x in r["v"]]) for r in sample_rows]
    if len(sample) < n_centroids:
        raise ValueError(
            f"ivf_topk: need ≥ {n_centroids} vectors to seed the "
            f"quantizer, table has {len(sample)}"
        )
    cents = train_centroids(sample, n_centroids, train_iters)
    # probe set: centroids and query are both driver-side literals — no
    # Spark job for probe selection
    probe_cids = [
        cid for _, cid in sorted((_sqdist_py(cv, q), cid) for cid, cv in cents)
    ][:nprobe]

    spark = embeddings.sparkSession
    cents_df = spark.createDataFrame(
        [(int(cid), [float(x) for x in cv]) for cid, cv in cents],
        "cid bigint, cv array<double>",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy("d2", "cid")
    assigned = (
        vecs.join(F.broadcast(cents_df))
        .withColumn("d2", F.expr(_SQ_DIST.format(a="v", b="cv")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "cid")
    )
    cand = assigned.filter(F.col("cid").isin([int(c) for c in probe_cids]))
    scored = with_query_cosine(cand, q)
    return (
        scored.select("vec_id", "cosine")
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def ivf_assignments(
    embeddings: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_iters: int = 2,
    train_sample: int = 256,
) -> DataFrame:
    """(vec_id, cid) full-table coarse-quantizer assignment — the list
    layout ivf_topk prunes by; exposed for list-balance inspection and
    for materializing `cid` as the storage partition key."""
    vecs = embeddings.select(
        F.col(id_col).alias("vec_id"), F.expr(_as_double(vec_col)).alias("v")
    )
    sample_rows = vecs.orderBy("vec_id").limit(train_sample).collect()
    sample = [(r["vec_id"], [float(x) for x in r["v"]]) for r in sample_rows]
    if len(sample) < n_centroids:
        raise ValueError("ivf_assignments: not enough vectors")
    cents = train_centroids(sample, n_centroids, train_iters)
    spark = embeddings.sparkSession
    cents_df = spark.createDataFrame(
        [(int(cid), [float(x) for x in cv]) for cid, cv in cents],
        "cid bigint, cv array<double>",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy("d2", "cid")
    return (
        vecs.join(F.broadcast(cents_df))
        .withColumn("d2", F.expr(_SQ_DIST.format(a="v", b="cv")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid")
    )


def probe_buckets(
    query_vec: list[float], planes: list[list[float]], n_probes: int
) -> list[int]:
    """Multi-probe bucket set: the query's own bucket plus the
    (n_probes−1) single-plane flips in order of the query's |margin| to
    the plane (smallest first — the planes the query is nearest to are
    the ones its true neighbors most likely land on the other side of).
    Deterministic: margins are sequential-fold dots over the literal
    planes, ties broken by plane index, so the identical selection is
    replayable in SQL (the ann_lsh_probe oracle)."""
    qbucket = 0
    margins = []
    for i, plane in enumerate(planes):
        d = sum(a * b for a, b in zip(query_vec, plane))
        if d >= 0.0:
            qbucket |= 1 << i
        margins.append((abs(d), i))
    margins.sort()
    if n_probes <= len(planes) + 1:
        # single-plane flips only — the SQL-replayable regime the
        # ann_lsh_probe oracle mirrors (ORDER BY abs(margin), i LIMIT)
        flips = [i for _, i in margins[: max(0, n_probes - 1)]]
        return [qbucket] + [qbucket ^ (1 << i) for i in flips]
    # deeper probing: enumerate flip SETS over the lowest-margin planes
    # by total flipped margin (standard multi-probe ordering), sizes ≤ 3
    from itertools import combinations

    t = min(len(margins), 14)
    cand = []
    for size in (1, 2, 3):
        for combo in combinations(margins[:t], size):
            cand.append((sum(m for m, _ in combo), [i for _, i in combo]))
    cand.sort(key=lambda c: (c[0], c[1]))
    out = [qbucket]
    for _, idxs in cand[: n_probes - 1]:
        b = qbucket
        for i in idxs:
            b ^= 1 << i
        out.append(b)
    return out


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 11,
    n_probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k scanning only the query's hyperplane-LSH bucket(s).
    Deterministic (seeded planes); recall trades against the
    n_probes·2^-n_planes scan fraction — n_probes > 1 adds the
    margin-ordered single-plane-flip buckets (multi-probe LSH), buying
    recall without more buckets-per-row state. Measured on the sf0.1
    fixtures (2000 vecs, recall@10 vs brute force over 20 queries):
    4 planes × 1 probe = 0.12; 6 planes × 7 probes = see BENCH. Bucket
    pruning pushes down to the scan when `bucket` is a partition column
    of the stored table."""
    q = [float(x) for x in query_vec]
    planes = _hyperplanes(len(q), n_planes, seed)
    probes = probe_buckets(q, planes, n_probes)
    vecs = embeddings.select(
        F.col(id_col).alias("vec_id"), F.expr(_as_double(vec_col)).alias("v")
    )
    bucketed = with_lsh_bucket(vecs, planes).filter(
        F.col("bucket").isin(probes)
    )
    scored = with_query_cosine(bucketed, q)
    return (
        scored.select("vec_id", "cosine")
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def more_like_this(
    postings: DataFrame, query_doc: int, k: int = 10
) -> DataFrame:
    """(doc_id, cosine) — top-k documents most similar to `query_doc`
    by SPARSE tf·idf cosine over the postings index ("more like this").

    Plan shape at corpus scale: the query vector is one token-pruned
    scan (|query doc vocabulary| rows) broadcast into a token equi-join
    — candidate docs are ONLY those sharing ≥1 token, never the corpus.
    Per-doc norms are one aggregate over the postings table and are
    query-independent (a deployment materializes them once per index
    build).

    Determinism: dot products and norms are folded in token-sorted
    order (aggregate over sort_array, a sequential left fold), so the
    cosine is bit-reproducible across partitionings — and bit-equal to
    the DuckDB oracle's list_reduce. A plain sum() would be faster but
    shuffle-order dependent in the last ulp; per-doc vocabularies are
    small (10^3-ish), so the fold cost is negligible next to the join.
    """
    fold = "aggregate(sort_array(lst), 0.0D, (acc, s) -> acc + s.p)"
    norms = (
        postings.groupBy("doc_id")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("token").alias("t"),
                    (F.col("tf_idf") * F.col("tf_idf")).alias("p"),
                )
            ).alias("lst")
        )
        .select("doc_id", F.sqrt(F.expr(fold)).alias("nrm"))
    )
    qv = postings.filter(F.col("doc_id") == query_doc).select(
        "token", F.col("tf_idf").alias("qw")
    )
    dots = (
        postings.join(F.broadcast(qv), "token")
        .filter(F.col("doc_id") != query_doc)
        .groupBy("doc_id")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("token").alias("t"),
                    (F.col("tf_idf") * F.col("qw")).alias("p"),
                )
            ).alias("lst")
        )
        .select("doc_id", F.expr(fold).alias("dot"))
    )
    qn = norms.filter(F.col("doc_id") == query_doc).select(
        F.col("nrm").alias("qnrm")
    )
    return (
        dots.join(norms, "doc_id")
        .crossJoin(F.broadcast(qn))
        .select(
            "doc_id",
            (F.col("dot") / (F.col("nrm") * F.col("qnrm"))).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def pq_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    m: int = 4,
    ksub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_iters: int = 2,
    train_sample: int = 256,
) -> DataFrame:
    """Product-quantization ANN top-k by asymmetric distance (Jégou,
    Douze & Schmid, TPAMI 2011 — the FAISS `PQ` index): split the
    D-dim space into ``m`` subspaces, Lloyd-train ``ksub`` centroids
    per subspace (the SAME deterministic train_centroids as the IVF
    coarse quantizer, run on subvector slices), encode every vector as
    m centroid ids (D doubles → m small ints — the memory step that
    makes billion-vector ANN fit), and score a query by ADC: the
    query-to-centroid distance table is computed ONCE driver-side
    (m·ksub doubles), and each stored vector's approximate distance is
    m table lookups summed in subspace order.

    Scale shape: training is bounded driver work on an id-ordered
    sample (the quantizer-training shape, as in ivf_topk); encoding is
    ONE explode(m) projection joined to a BROADCAST centroid table +
    per-(vec, subspace) argmin window (bounded: ksub rows per group);
    scoring joins the broadcast distance table and folds the m lookups
    in j order — deterministic doubles end to end, so the DuckDB
    oracle replays training, codes and ADC bit-for-bit. Returns
    (vec_id, approx_d2) ascending; recall vs brute force is a tested
    property, not an assumption.
    """
    q = [float(x) for x in query_vec]
    dim = len(q)
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    vecs = embeddings.select(
        F.col(id_col).alias("vec_id"), F.expr(_as_double(vec_col)).alias("v")
    )
    sample_rows = vecs.orderBy("vec_id").limit(train_sample).collect()
    if len(sample_rows) < ksub:
        raise ValueError(
            f"pq_topk: need >= {ksub} vectors to seed, have "
            f"{len(sample_rows)}"
        )
    sample = [(r["vec_id"], [float(x) for x in r["v"]]) for r in sample_rows]
    cents_rows = []
    dt_rows = []
    for j in range(m):
        sub_sample = [
            (vid, v[j * sub:(j + 1) * sub]) for vid, v in sample
        ]
        cents = train_centroids(sub_sample, ksub, train_iters)
        qj = q[j * sub:(j + 1) * sub]
        for cid, cv in cents:
            cents_rows.append((j, int(cid), [float(x) for x in cv]))
            dt_rows.append((j, int(cid), _sqdist_py(qj, cv)))
    spark = embeddings.sparkSession
    cents_df = spark.createDataFrame(
        cents_rows, "j int, cid bigint, cv array<double>"
    )
    dt_df = spark.createDataFrame(dt_rows, "j int, cid bigint, dq double")
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id", "j").orderBy("d2", "cid")
    codes = (
        vecs.select(
            "vec_id", "v", F.explode(F.expr(f"sequence(0, {m - 1})")).alias("j")
        )
        .withColumn(
            "vsub", F.expr(f"slice(v, j * {sub} + 1, {sub})")
        )
        .join(F.broadcast(cents_df), "j")
        .withColumn("d2", F.expr(_SQ_DIST.format(a="vsub", b="cv")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "j", "cid")
    )
    fold = (
        "aggregate(sort_array(collect_list(struct(j, dq))), "
        "0.0D, (acc, s) -> acc + s.dq)"
    )
    scored = (
        codes.join(F.broadcast(dt_df), ["j", "cid"])
        .groupBy("vec_id")
        .agg(F.expr(fold).alias("approx_d2"))
    )
    return (
        scored.select("vec_id", "approx_d2")
        .orderBy(F.col("approx_d2").asc(), F.col("vec_id").asc())
        .limit(k)
    )
