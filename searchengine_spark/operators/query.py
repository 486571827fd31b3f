"""Boolean OR-of-ANDs (DNF) ranked retrieval over the postings DataFrame.

Reference semantics reproduced exactly (SURVEY.md §2 J1/J2/T2):
  * AND (retrieve_query.py:82-86, the *correct* multithreaded variant —
    the single-threaded one at :46-54 always returns [] and is a
    documented reference bug): seed with the FIRST term's postings,
    intersect on doc_id (Posting.__eq__/__hash__ are doc_id-only,
    index_construction.py:50-54) — so the surviving Posting, and hence
    the ranking score, is the FIRST term's tf_idf.
  * OR (retrieve_query.py:136-140): set.union keeps the element already
    present — first conjunct (in parse order) wins per doc_id.
  * Ranking (T2): sort by tf_idf ASCENDING — faithful quirk
    (retrieve_query.py:54,86,142: sorted(..., key=tf_idf), no reverse) —
    take MAX_LINKS_SHOWN=5 (retrieve_query.py:14,186-187). doc_id is the
    deterministic tie-break (the reference inherits arbitrary set order;
    we pin it).
  * Query parse (F11, retrieve_query.py:89-111): whitespace split, 'AND'
    skipped (implicit), 'OR' flushes the conjunct, terms lowercased.

Scale notes: each conjunct is one token-pruned scan (predicate
`token IN (...)` pushes to parquet/Iceberg min-max stats thanks to the
token-sorted index layout) + one groupBy(doc_id) — no cross joins, no
collect. The k-term intersection is count-distinct==k, not k chained
joins, so it's a single shuffle regardless of term count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_LINKS_SHOWN = 5  # retrieve_query.py:14


def parse_query(query: str) -> list[list[str]]:
    """F11 — DNF list-of-conjuncts (retrieve_query.py:89-111)."""
    result: list[list[str]] = []
    cur: list[str] = []
    for w in query.split():
        if w == "AND":
            continue
        if w == "OR":
            result.append(cur)
            cur = []
        else:
            cur.append(w.lower())
    result.append(cur)
    return result


def and_query(postings: DataFrame, terms: list[str]) -> DataFrame:
    """J1 — docs containing ALL terms; score = first term's tf_idf."""
    if not terms:
        return postings.select("doc_id", "tf_idf").limit(0)
    uniq = list(dict.fromkeys(terms))
    hits = (
        postings.filter(F.col("token").isin(uniq))
        .groupBy("doc_id")
        .agg(F.count_distinct("token").alias("k"))
        .filter(F.col("k") == len(uniq))
        .select("doc_id")
    )
    first = postings.filter(F.col("token") == terms[0]).select("doc_id", "tf_idf")
    return first.join(hits, "doc_id").select("doc_id", "tf_idf")


def dnf_query(postings: DataFrame, conjuncts: list[list[str]]) -> DataFrame:
    """J2 — OR across conjuncts; first conjunct (parse order) wins on
    collision (set.union first-seen semantics, retrieve_query.py:138-140)."""
    parts = []
    for i, terms in enumerate(conjuncts):
        if terms:
            parts.append(and_query(postings, terms).withColumn("conj", F.lit(i)))
    if not parts:
        return postings.select("doc_id", "tf_idf").limit(0)
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    w = Window.partitionBy("doc_id").orderBy("conj")
    return (
        u.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "tf_idf")
    )


def not_query(
    postings: DataFrame, terms: list[str], exclude: list[str]
) -> DataFrame:
    """Boolean AND-NOT (IIR ch. 1 `x AND NOT y`, absent from the
    reference's OR-of-ANDs grammar — rebuild-only): docs containing ALL
    `terms` and NONE of `exclude`; score = first term's tf_idf
    (and_query J1 semantics).

    Scale: both sides are token-IN-pruned index scans (pushed to the
    token-sorted postings sink, S4/T4) — the exclusion side is a
    doc_id anti-join, never a corpus scan; no new shuffle class beyond
    and_query's groupBy."""
    base = and_query(postings, terms)
    ex = list(dict.fromkeys(t.lower() for t in exclude))
    if not ex:
        return base
    exdocs = postings.filter(F.col("token").isin(ex)).select("doc_id")
    return base.join(exdocs, "doc_id", "left_anti")


def rank_topk(results: DataFrame, k: int = MAX_LINKS_SHOWN) -> DataFrame:
    """T2 — tf_idf ASC (faithful quirk), doc_id tie-break, top k."""
    return results.orderBy(F.col("tf_idf").asc(), F.col("doc_id").asc()).limit(k)


def search(postings: DataFrame, query: str, k: int = MAX_LINKS_SHOWN) -> DataFrame:
    return rank_topk(dnf_query(postings, parse_query(query)), k)


def _prefix_upper(prefix: str) -> str:
    """Smallest string greater than every string with this prefix —
    the right bound of the token range scan (last char + 1)."""
    return prefix[:-1] + chr(ord(prefix[-1]) + 1)


def prefix_search(postings: DataFrame, prefix: str, k: int = 10) -> DataFrame:
    """Wildcard query `prefix*`: top-k docs by the summed tf_idf of
    their tokens matching the prefix.

    The vocabulary filter is a RANGE predicate (token >= p AND
    token < p̄) — on the token-sorted index layout (S4/T4) it pushes to
    parquet min/max stats, so only the matching token range is read;
    a LIKE would scan the dictionary. The per-doc sum folds in
    token-sorted order (deterministic float addition, oracle
    bit-parity).
    """
    p = prefix.lower()
    if not p:
        raise ValueError("prefix_search() needs a non-empty prefix")
    hits = postings.filter(
        (F.col("token") >= p) & (F.col("token") < _prefix_upper(p))
    )
    fold = "aggregate(sort_array(lst), 0.0D, (acc, s) -> acc + s.p)"
    return (
        hits.groupBy("doc_id")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("token").alias("t"), F.col("tf_idf").alias("p")
                )
            ).alias("lst")
        )
        .select("doc_id", F.expr(fold).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def facet_counts(
    postings: DataFrame,
    documents: DataFrame,
    conjuncts: list[list[str]],
    facet_cols: list[str] = ("lang", "source"),
    id_col: str = "doc_id",
) -> DataFrame:
    """(facet, value, n_docs) — faceted result counts: for each facet
    column, how many documents MATCHING the DNF query carry each value
    (the "narrow your search" sidebar every search UI renders next to
    the result list).

    Scale shape: the match set comes from the same count-distinct==k
    conjunct plan as dnf_query (token-IN pruned scan, no per-term
    joins); facet attributes LEFT-SEMI join to the match set (semi
    encodes that match membership, not match multiplicity, is what
    counts — dnf_query output is distinct, but the plan no longer
    relies on it) — at web scale the match set is the small side of
    that join. Each matched row then explodes to |facet_cols| (facet,
    value) pairs and ONE map-side-combinable count aggregate produces
    every facet's histogram — the dnf lineage is evaluated once, not
    once per facet, with no cache/persist needed. Counts are exact
    ints."""
    matched = dnf_query(postings, conjuncts).select(id_col)
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("facet"),
                    F.col(c).cast("string").alias("value"),
                )
                for c in facet_cols
            ]
        )
    )
    return (
        documents.join(matched, id_col, "left_semi")
        .select(pairs.alias("fv"))
        .groupBy(F.col("fv.facet").alias("facet"), F.col("fv.value").alias("value"))
        .agg(F.count("*").alias("n_docs"))
    )


def suffix_search(postings: DataFrame, suffix: str, k: int = 10) -> DataFrame:
    """Wildcard query `*suffix`: top-k docs by the summed tf_idf of
    their tokens ENDING with ``suffix`` — the reverse-dictionary trick
    (a special case of the permuterm index, Garfield 1976 / standard IR
    textbook treatment): index reverse(token), and a trailing wildcard
    becomes a LEADING-prefix range on the reversed form.

    Scale shape: the vocabulary filter is a RANGE predicate on
    reverse(token) — written to a reversed-token-sorted index layout
    (the S4 sink sorted by the rtoken column instead), it pushes to
    parquet min/max stats exactly like prefix_search's; expressed over
    the forward layout it is one projection + filter, never a LIKE
    '%…' dictionary scan per candidate document. The per-doc sum folds
    in token-sorted order (deterministic float addition, oracle
    bit-parity).
    """
    s = suffix.lower()
    if not s:
        raise ValueError("suffix_search() needs a non-empty suffix")
    rp = s[::-1]
    hits = postings.withColumn("rtoken", F.reverse(F.col("token"))).filter(
        (F.col("rtoken") >= rp) & (F.col("rtoken") < _prefix_upper(rp))
    )
    fold = "aggregate(sort_array(lst), 0.0D, (acc, s) -> acc + s.p)"
    return (
        hits.groupBy("doc_id")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("token").alias("t"), F.col("tf_idf").alias("p")
                )
            ).alias("lst")
        )
        .select("doc_id", F.expr(fold).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )
