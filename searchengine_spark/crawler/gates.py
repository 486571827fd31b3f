"""Crawl-time dedup gates as bounded equi-joins (J6, J7).

J6 — URL trap gate: bucketed rebuild of the reference's candidate ×
all-seen similarity theta-join (link_similarity.py:120-163,225-230); see
pycore/trapgate.py for the normative rule. Spark side: equality join on
(scheme, host, parent_dir, n_parts) + char-set Jaccard in array exprs.

J7 — content near-dup gate: reject a fetched page whose 3-gram
fingerprint has Jaccard > 0.65 against any accepted page
(ngrams.py:80-101). The all-pairs scan becomes a shared-gram pre-join
(exact: J > 0 ⇒ ≥1 shared gram) + array-Jaccard on the surviving pairs.
Intra-batch rule (deterministic, order-free across executors): a batch
page is also a dup if Jaccard > threshold vs an EARLIER batch page
(order = score desc, canon_url asc) that is not itself a dup vs the
accepted store — the non-recursive normative narrowing of the
reference's sequential loop (SURVEY.md §2.2 P7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ------------------------------------------------------------------ J6


def with_trap_cols(df: DataFrame, url_col: str = "canon_url") -> DataFrame:
    """Adds scheme/host/n_parts/parent_dir/last_charset bucket columns
    (pycore.trapgate.trap_bucket parity) — pure Column exprs."""
    u = url_col
    parts = f"filter(split(coalesce(parse_url({u}, 'PATH'), ''), '/'), x -> x != '')"
    return (
        df.withColumn("scheme", F.expr(f"lower(parse_url({u}, 'PROTOCOL'))"))
        .withColumn("host", F.expr(f"lower(parse_url({u}, 'HOST'))"))
        .withColumn("_parts", F.expr(parts))
        .withColumn("n_parts", F.expr("size(_parts)"))
        .withColumn(
            "parent_dir",
            F.expr(
                "CASE WHEN size(_parts) <= 1 THEN '' "
                "ELSE array_join(slice(_parts, 1, size(_parts)-1), '/') END"
            ),
        )
        .withColumn(
            "last_charset",
            F.expr(
                "CASE WHEN size(_parts) = 0 THEN CAST(array() AS array<string>) "
                "ELSE array_distinct(filter(split(element_at(_parts, -1), ''), "
                "c -> c != '')) END"
            ),
        )
        .drop("_parts")
    )


_CS_JACCARD = (
    "CASE WHEN size(array_union(last_charset, seen_charset)) = 0 THEN 1.0 "
    "ELSE CAST(size(array_intersect(last_charset, seen_charset)) AS double) "
    "/ size(array_union(last_charset, seen_charset)) END"
)


def trap_reject(
    candidates: DataFrame, seen_keys: DataFrame, threshold: float = 0.85
) -> DataFrame:
    """Drop candidates trap-similar (≥ threshold) to any seen URL.

    candidates must carry the with_trap_cols columns; seen_keys is the
    url_seen table projected to (scheme, host, parent_dir, n_parts,
    last_charset). Bucketed equi-join — shuffles on the bucket key, never
    quadratic."""
    seen = seen_keys.select(
        "scheme",
        "host",
        "parent_dir",
        "n_parts",
        F.col("last_charset").alias("seen_charset"),
    )
    hits = (
        candidates.select(
            "canon_url", "scheme", "host", "parent_dir", "n_parts", "last_charset"
        )
        .join(seen, ["scheme", "host", "parent_dir", "n_parts"])
        .withColumn("j", F.expr(_CS_JACCARD))
        .filter(F.col("j") >= threshold)
        .select("canon_url")
        .distinct()
    )
    return candidates.join(hits, "canon_url", "left_anti")


# ------------------------------------------------------------------ J7


def fingerprint_sql(tokens_expr: str, n: int = 3) -> str:
    """array<bigint> of distinct hashes of NON-overlapping n-grams
    (stride = n, ragged tail kept — ngrams.py:28-46); gram hash =
    xxhash64 of the concatenated tokens (normative replacement of the
    reference's seed-randomized Python hash(), SURVEY.md §2.4 A10).
    Bit-identical to pycore.ngrams.ngram_hash_set.

    Grams are carved by ONE greedy regex over the space-joined tokens
    (each match greedily takes n words → exactly the stride-n grouping;
    tokens cannot contain spaces) instead of a slice-per-gram lambda —
    the interpreted slice/concat chain was the measured hot path on
    long documents."""
    t = tokens_expr
    return (
        f"CASE WHEN size({t}) = 0 THEN CAST(array() AS array<bigint>) "
        f"ELSE array_distinct(transform("
        f"regexp_extract_all(array_join({t}, ' '), "
        f"'[^ ]+( [^ ]+){{0,{n - 1}}}', 0), "
        f"g -> xxhash64(replace(g, ' ', '')))) END"
    )


_FP_JACCARD = (
    "CASE WHEN size(array_union(fp, fp2)) = 0 THEN CAST(0.0 AS double) "
    "ELSE CAST(size(array_intersect(fp, fp2)) AS double) "
    "/ size(array_union(fp, fp2)) END"
)


def _prefix_grams(left: DataFrame, threshold: float) -> DataFrame:
    """Prefix filter (AllPairs / Bayardo et al., exact): if
    J(A,B) ≥ t then A's ⌊(1-t)·|A|⌋+1 smallest grams under ANY fixed
    total order must intersect B — because missing all of them bounds
    |A∩B| ≤ |A|-(⌊(1-t)|A|⌋+1) < t·|A| ≤ t·|A∪B|. Ordering by global
    gram frequency (rare first) makes the probe set boilerplate-free,
    killing the hot-gram quadratic blowup (a "home home home" gram
    shared by every page must never drive the pre-join)."""
    lg = left.select("url_hash", F.size("fp").alias("sz"), F.explode("fp").alias("gram"))
    gdf = lg.groupBy("gram").agg(F.count("*").alias("gdf"))
    w = Window.partitionBy("url_hash").orderBy("gdf", "gram")
    return (
        lg.join(gdf, "gram")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.floor(F.lit(1.0 - threshold) * F.col("sz")) + 1)
        .select("url_hash", "gram")
    )


def _pair_dups(left: DataFrame, right: DataFrame, threshold: float) -> DataFrame:
    """url_hashes of `left` rows with fingerprint Jaccard > threshold
    against ≥1 `right` row. Exact: prefix-filtered gram pre-join (only
    each left page's rarest ⌊(1-t)|fp|⌋+1 grams probe the right side —
    no candidate pair with J ≥ t can be missed), then array-Jaccard on
    surviving pairs.

    At corpus scale the accepted store's exploded (gram, url_hash) side
    is not re-derived per round: it is materialized ONCE as a
    gram-postings table stored hash-bucketed by gram (Iceberg
    `bucket(N, gram)`), appended per round, so this pre-join is
    storage-partitioned and only the batch's probe grams shuffle. The
    sandbox facade re-explodes the array store per round (bounded here;
    bucketing metadata is an Iceberg capability, see tableio.py)."""
    lg = _prefix_grams(left, threshold)
    rg = right.select(
        F.col("url_hash").alias("rhs_hash"), F.explode("fp").alias("gram")
    )
    pairs = (
        lg.join(rg, "gram")
        .select("url_hash", "rhs_hash")
        .distinct()
        # size filter (exact: J ≤ min/max of set sizes) BEFORE shipping
        # the fp arrays — pairs are pruned on two ints, not two KB arrays
        .join(left.select("url_hash", F.size("fp").alias("sz")), "url_hash")
        .join(
            right.select(
                F.col("url_hash").alias("rhs_hash"), F.size("fp").alias("sz2")
            ),
            "rhs_hash",
        )
        .filter(
            F.least("sz", "sz2")
            >= F.lit(threshold) * F.greatest("sz", "sz2")
        )
        .join(left.select("url_hash", "fp"), "url_hash")
        .join(
            right.select(
                F.col("url_hash").alias("rhs_hash"), F.col("fp").alias("fp2")
            ),
            "rhs_hash",
        )
    )
    return (
        pairs.withColumn("j", F.expr(_FP_JACCARD))
        .filter(F.col("j") > threshold)
        .select("url_hash")
        .distinct()
    )


def content_dup_flags(
    batch_fp: DataFrame, accepted_fp: DataFrame | None, threshold: float = 0.65
) -> DataFrame:
    """batch_fp(url_hash, canon_url, score, fp) → + is_dup boolean.

    Rule (a): dup vs the accepted fingerprint store (previous rounds).
    Rule (b): dup vs an EARLIER batch page that passed rule (a), where
    "earlier" is the direct tuple order (score desc, canon_url asc) —
    compared pairwise, never materialized as a global rank (a global
    row_number window would single-partition the whole batch; only
    earlier-than is ever needed, not a total ranking).
    """
    left = batch_fp.select("url_hash", "fp")
    if accepted_fp is not None:
        dup_a = _pair_dups(left, accepted_fp.select("url_hash", "fp"), threshold)
    else:
        dup_a = batch_fp.select("url_hash").limit(0)
    flagged_a = batch_fp.join(
        dup_a.withColumn("_dup_a", F.lit(True)), "url_hash", "left"
    ).withColumn("_dup_a", F.coalesce("_dup_a", F.lit(False)))

    clean_a = flagged_a.filter(~F.col("_dup_a")).select(
        "url_hash", "fp", "score", "canon_url"
    )
    lg = _prefix_grams(clean_a.select("url_hash", "fp"), threshold).join(
        clean_a.select("url_hash", "score", "canon_url"), "url_hash"
    )
    rg = clean_a.select(
        F.col("url_hash").alias("rhs_hash"),
        F.col("score").alias("rhs_score"),
        F.col("canon_url").alias("rhs_canon"),
        F.explode("fp").alias("gram"),
    )
    pairs_b = (
        lg.join(rg, "gram")
        .filter(
            (F.col("rhs_score") > F.col("score"))
            | (
                (F.col("rhs_score") == F.col("score"))
                & (F.col("rhs_canon") < F.col("canon_url"))
            )
        )
        .select("url_hash", "rhs_hash")
        .distinct()
        .join(clean_a.select("url_hash", "fp"), "url_hash")
        .join(
            clean_a.select(
                F.col("url_hash").alias("rhs_hash"), F.col("fp").alias("fp2")
            ),
            "rhs_hash",
        )
    )
    dup_b = (
        pairs_b.withColumn("j", F.expr(_FP_JACCARD))
        .filter(F.col("j") > threshold)
        .select("url_hash")
        .distinct()
    )
    return (
        flagged_a.join(
            dup_b.withColumn("_dup_b", F.lit(True)), "url_hash", "left"
        )
        .withColumn(
            "is_dup", F.col("_dup_a") | F.coalesce("_dup_b", F.lit(False))
        )
        .drop("_dup_a", "_dup_b")
    )
