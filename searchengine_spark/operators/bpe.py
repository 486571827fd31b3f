"""Corpus-scale BPE vocabulary induction (Sennrich et al., ACL 2016).

Learns byte-pair-encoding merges from the corpus itself — the vocab-
induction step of every modern tokenizer, run as a Spark job. The
classic algorithm: start from characters, repeatedly count adjacent
symbol pairs over the (token, frequency) vocabulary and merge the most
frequent pair, greedy left-to-right within each token.

Scale design:
  * ONE corpus-wide shuffle total — the initial ``groupBy(token)``
    that builds the weighted vocabulary. Every merge iteration after
    that operates on the VOCAB frame (|V| rows — hundreds of
    thousands at web scale, independent of corpus size), so an
    iteration costs one tiny aggregation plus a literal string
    replace, not a corpus pass. The vocab is cached once.
  * Per iteration the driver sees exactly ONE row (the argmax pair) —
    the same bounded-driver-traffic discipline as the dedup/linkrank
    loops. Tie-break is deterministic: count DESC, pair string ASC.
  * At production merge counts (30k+), batch variants merge the top-m
    pairwise-non-adjacent pairs per round to cut driver round-trips
    (documented deviation hook; the exact greedy loop below is the
    published reference semantics).

Engine-portable encoding (the trick that makes the DuckDB oracle
possible): a token's symbol sequence is encoded as the string
``|s1 |s2 ... |sk `` — every symbol prefixed by ``|`` and suffixed by
one space. Symbols are tokenizer output ([a-z0-9'] runs), so they
never contain ``|`` or space, which makes the encoding a prefix code:
an adjacent pair IS the literal substring ``|x |y ``, and merging it
is a plain left-to-right ``replace`` of that substring with ``|xy ``
(= the pair with every ``' |'`` removed) — identical semantics in
Spark and ANSI SQL, and exactly BPE's greedy non-overlapping merge
order. The trailing space prevents the prefix-capture bug (pair
(x, y) must not match inside (x, yz)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# regex that carves an encoded string back into its "|sym " chunks —
# the Spark-SQL variant is written with a DOUBLED backslash because
# Spark processes backslash escapes inside string literals (a single
# '\|' collapses to '|', an empty alternation); DuckDB follows standard
# SQL (backslash is literal), so its variant keeps the single backslash
CHUNK_RE = r"\\|[^ ]+ "
CHUNK_RE_DUCK = r"\|[^ ]+ "

# SQL (Spark dialect) producing the initial char-level encoding of a
# token column: every character becomes "|c "
ENCODE_SQL = "regexp_replace({tok}, '(.)', '|$1 ')"


def pairs_sql(enc_col: str) -> str:
    """Spark SQL: array of adjacent-chunk pair strings of an encoding.

    Uses indexed ``transform`` + total ``get`` (never bracket
    indexing) so no branch can throw on short arrays regardless of
    where Catalyst hoists the expression.
    """
    c = f"regexp_extract_all({enc_col}, '{CHUNK_RE}', 0)"
    return (
        f"filter(transform({c}, (x, i) -> "
        f"CASE WHEN i < size({c}) - 1 THEN concat(x, get({c}, i + 1)) END), "
        f"y -> y IS NOT NULL)"
    )


def merged_chunk(pair: str) -> str:
    """``|x |y `` -> ``|xy `` (what the winning pair is replaced with)."""
    return pair.replace(" |", "")


def _train(
    docs_tokens: DataFrame, n_merges: int, token_col: str
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Greedy merge loop; returns (merges, final vocab (tok, freq, enc)).

    The returned vocab frame is handed off via eager localCheckpoint so
    callers that keep using it (piece counting) neither re-derive the
    corpus groupBy nor leak a session-lifetime cache entry.
    """
    vocab = (
        docs_tokens.groupBy(F.col(token_col).alias("tok"))
        .agg(F.count(F.lit(1)).alias("freq"))
        .selectExpr("tok", "freq", ENCODE_SQL.format(tok="tok") + " AS enc")
        .cache()
    )
    merges: list[tuple[int, str, str, int]] = []
    cur = vocab
    for rank in range(1, n_merges + 1):
        best = (
            cur.select(
                F.explode(F.expr(pairs_sql("enc"))).alias("pair"), "freq"
            )
            .groupBy("pair")
            .agg(F.sum("freq").alias("f"))
            .orderBy(F.col("f").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        pair, f = best[0]["pair"], int(best[0]["f"])
        chunks = pair.split(" ")  # ['|x', '|y', '']
        merges.append((rank, chunks[0][1:], chunks[1][1:], f))
        cur = cur.withColumn(
            "enc", F.replace("enc", F.lit(pair), F.lit(merged_chunk(pair)))
        )
    final = cur.localCheckpoint(eager=True)
    vocab.unpersist()
    return merges, final


def bpe_train(
    docs_tokens: DataFrame,
    n_merges: int = 6,
    token_col: str = "token",
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns (rank, left, right, freq).

    ``docs_tokens`` is one row per token OCCURRENCE (the tokenizer
    explosion — duplicates carry the frequency weight). ``freq`` is
    the corpus-wide count of the winning adjacent pair at the moment
    it was merged; ``left``/``right`` are the two symbols joined.
    Stops early (shorter output) if the corpus runs out of pairs.
    """
    spark = docs_tokens.sparkSession
    merges, _ = _train(docs_tokens, n_merges, token_col)
    return spark.createDataFrame(
        merges, "rank INT, left STRING, right STRING, freq BIGINT"
    )


def bpe_piece_counts(
    docs_tokens: DataFrame,
    n_merges: int = 6,
    id_col: str = "doc_id",
    token_col: str = "token",
) -> DataFrame:
    """(doc_id, n_tokens, n_pieces) after applying learned merges.

    The tokenizer-budgeting view of the corpus: train ``n_merges``
    merges, then count how many BPE pieces each document costs under
    that vocabulary. Encoding the corpus is a JOIN against the final
    vocab's per-token piece count — the corpus itself is never
    re-encoded string-wise (the vocab already holds every distinct
    token's final segmentation), so the extra cost over bpe_train is
    one token-keyed join + a doc_id aggregation. At web scale the
    vocab side may exceed broadcast size; the join is a plain hash
    join and AQE picks broadcast when it fits.
    """
    merges, vocab = _train(docs_tokens, n_merges, token_col)
    pieces = vocab.selectExpr(
        "tok",
        f"size(regexp_extract_all(enc, '{CHUNK_RE}', 0)) AS np",
    )
    return (
        docs_tokens.select(
            F.col(id_col).alias("doc_id"), F.col(token_col).alias("tok")
        )
        .join(pieces, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("np").alias("n_pieces"),
        )
    )
