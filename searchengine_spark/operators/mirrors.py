"""Host mirror detection: host-level near-duplicate discovery.

A large crawl wastes budget re-fetching mirror sites (same content
under a different hostname). Mirrors are detected at the HOST level:
each host's content signature is the set of stride-3 word-gram strings
across its pages (the same gram family as the J7 page gate,
gates.fingerprint_sql / reference ngrams.py:28-46), and two hosts are
mirror candidates when the Jaccard of their gram sets crosses a
threshold.

Scale design:
  * (host, gram) is deduplicated BEFORE pairing, so a host's size is
    bounded by its vocabulary, not its page count.
  * The pair generation is a self-join on gram — the classic hot-key
    hazard: a boilerplate gram shared by H hosts yields H·(H-1)/2
    rows. The df-cut drops grams on more than `max_hosts_per_gram`
    hosts first (a gram that common carries no mirror signal; the cut
    is deterministic and part of the operator's contract — host sizes
    are measured AFTER the cut so Jaccard stays consistent).
  * Counts are exact integers; Jaccard = inter/(|A|+|B|-inter) is one
    double division — bit-equal to the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searchengine_spark.functions.text import tokens_sql


def _gram_strings_sql(tokens_expr: str, n: int = 3) -> str:
    """Distinct stride-n gram STRINGS (space-stripped concatenation) —
    the string twin of gates.fingerprint_sql's xxhash64 set (equality
    of the two representations is what the ngram_pairs oracle proves).
    """
    t = tokens_expr
    return (
        f"CASE WHEN size({t}) = 0 THEN CAST(array() AS array<string>) "
        f"ELSE array_distinct(transform("
        f"regexp_extract_all(array_join({t}, ' '), "
        f"'[^ ]+( [^ ]+){{0,{n - 1}}}', 0), "
        f"g -> replace(g, ' ', ''))) END"
    )


def host_gram_sets(
    docs: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(host, gram) distinct — each host's content-signature set."""
    grams = _gram_strings_sql(tokens_sql(text_col), n)
    return (
        docs.select(F.col(host_col).alias("host"), F.expr(grams).alias("gs"))
        .select("host", F.explode("gs").alias("gram"))
        .distinct()
    )


def mirror_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    max_hosts_per_gram: int = 16,
    host_col: str = "host",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(host_a, host_b, n_shared, jaccard) for host pairs whose gram-set
    Jaccard ≥ threshold (host_a < host_b lexicographically)."""
    hg = host_gram_sets(docs, host_col, text_col, n)
    keep = (
        hg.groupBy("gram")
        .agg(F.count("*").alias("nh"))
        .filter(F.col("nh") <= max_hosts_per_gram)
        .select("gram")
    )
    hg = hg.join(keep, "gram")
    sizes = hg.groupBy("host").agg(F.count("*").alias("sz"))
    a = hg.select(F.col("host").alias("host_a"), "gram")
    b = hg.select(F.col("host").alias("host_b"), "gram")
    inter = (
        a.join(b, "gram")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.select(F.col("host").alias("host_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("host").alias("host_b"), F.col("sz").alias("sz_b"))
    jac = F.col("n_shared").cast("double") / (
        F.col("sz_a") + F.col("sz_b") - F.col("n_shared")
    )
    return (
        inter.join(F.broadcast(sa), "host_a")
        .join(F.broadcast(sb), "host_b")
        .select("host_a", "host_b", "n_shared", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
