"""Text analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All pure Column expressions over the normative tokenizer (F2) — JVM-side
whole-stage codegen, no Python in the hot path — and all expressible in
ANSI SQL so each has an exact DuckDB oracle (__spark_entry__). Float
outputs are ratios of ints and fixed-order products: bit-identical
across engines, rounded to 9 decimals at the contract surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searchengine_spark.functions.text import tokens_sql

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "you", "that", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "auf"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "dans", "pour", "que"],
    "es": ["el", "los", "de", "que", "y", "en", "un", "por", "con", "para"],
}
LANG_ORDER = ["en", "de", "fr", "es"]  # deterministic tie-break order

FP_MOD = 1_000_000_007
FP_BASE = 131


def token_stats(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_tokens, n_distinct_tokens, mean_token_len) — the token
    counting surface (whitespace+regex tokenizer = the normative F2)."""
    toks = tokens_sql(text_col)
    return documents.selectExpr(
        f"{id_col} AS doc_id",
        f"size({toks}) AS n_tokens",
        f"size(array_distinct({toks})) AS n_distinct_tokens",
        f"CASE WHEN size({toks}) = 0 THEN CAST(0.0 AS double) ELSE "
        f"CAST(aggregate({toks}, 0L, (a, t) -> a + length(t)) AS double)"
        f" / size({toks}) END AS mean_token_len",
    )


# BPE-ish pre-tokenizer pieces (GPT-2-style, lookahead-free so the SAME
# pattern runs on Java regex (Spark) and RE2 (DuckDB)): a piece is an
# optional leading space + a letter run, digit run, or punctuation run;
# remaining whitespace runs count as pieces too (the lookahead-bearing
# original merely re-attaches trailing spaces — a counting no-op).
BPE_PIECE_RE = r" ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_pieces, n_distinct_pieces) — LLM-cost-style token
    counting: how many BPE pre-tokenizer pieces a document splits into
    (each piece is further split into subwords by a real BPE vocab, so
    piece count is the stable engine-side lower bound / cost proxy).
    One regexp_extract_all pass, JVM-side (Column-API pattern literal —
    no SQL-string backslash escaping)."""
    arr = F.regexp_extract_all(F.col(text_col), F.lit(BPE_PIECE_RE), F.lit(0))
    return documents.select(
        F.col(id_col).alias("doc_id"),
        F.size(arr).alias("n_pieces"),
        F.size(F.array_distinct(arr)).alias("n_distinct_pieces"),
    )


def quality_scores(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_chars, alnum_ratio, stop_ratio, quality) — web-text
    quality heuristics: alphanumeric density, stopword density, and a
    fixed linear score. Formula (identical expression order in the
    DuckDB oracle):
        quality = 0.4·alnum_ratio + 0.4·stop_hit + 0.2·len_norm
    with stop_hit = min(1, 5·stop_ratio), len_norm = min(1, n_tokens/256).
    """
    toks = tokens_sql(text_col)
    en = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    return documents.selectExpr(
        f"{id_col} AS doc_id",
        f"length({text_col}) AS n_chars",
        f"CASE WHEN length({text_col}) = 0 THEN CAST(0.0 AS double) ELSE "
        f"CAST(length(regexp_replace({text_col}, '[^a-zA-Z0-9]', '')) AS double)"
        f" / length({text_col}) END AS alnum_ratio",
        f"CASE WHEN size({toks}) = 0 THEN CAST(0.0 AS double) ELSE "
        f"CAST(size(filter({toks}, t -> t IN ({en}))) AS double)"
        f" / size({toks}) END AS stop_ratio",
        f"size({toks}) AS _n_tokens",
    ).selectExpr(
        "doc_id",
        "n_chars",
        "alnum_ratio",
        "stop_ratio",
        "0.4D * alnum_ratio + 0.4D * least(1.0D, 5.0D * stop_ratio) "
        "+ 0.2D * least(1.0D, CAST(_n_tokens AS double) / 256.0D) AS quality",
    )


def lang_id(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, lang_pred) — n-gram/stopword-hit language heuristic:
    argmax of per-language stopword hits over the token list; ties break
    in LANG_ORDER; zero hits ⇒ 'und'."""
    toks = tokens_sql(text_col)
    hit_cols = []
    for lang in LANG_ORDER:
        words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        hit_cols.append(
            f"size(filter({toks}, t -> t IN ({words}))) AS hits_{lang}"
        )
    hits = documents.selectExpr(f"{id_col} AS doc_id", *hit_cols)
    best = "greatest(" + ", ".join(f"hits_{lang}" for lang in LANG_ORDER) + ")"
    case = "CASE WHEN " + best + " = 0 THEN 'und' "
    for lang in LANG_ORDER:
        case += f"WHEN hits_{lang} = {best} THEN '{lang}' "
    case += "END AS lang_pred"
    return hits.selectExpr("doc_id", case)


def doc_fingerprint(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, fingerprint) — rolling polynomial hash over the token
    stream: h ← (h·131 + len(t)·31 + ascii(t[0])) mod 1e9+7. Order
    sensitive (a true rolling/document hash, not a bag hash); bigint
    arithmetic stays < 2^63 under ANSI mode."""
    toks = tokens_sql(text_col)
    return documents.selectExpr(
        f"{id_col} AS doc_id",
        f"aggregate({toks}, 0L, (acc, t) -> "
        f"pmod(acc * {FP_BASE}L + length(t) * 31L + ascii(substring(t, 1, 1)), "
        f"{FP_MOD}L)) AS fingerprint",
    )


def repetition_stats(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """(doc_id, n_tokens, n_ngrams, n_distinct_ngrams, dup_ngram_frac) —
    Gopher-style within-document repetition signal: the fraction of
    word n-grams (default bigrams) that are repeats of an earlier one
    (1 − distinct/total). High values flag boilerplate/SEO spam for a
    training-data quality gate. Pure Column expressions — the n-gram
    array is built with transform over an index sequence (no explode,
    no shuffle: one narrow map over the scan), so the operator is a
    per-row projection at any scale. dup_ngram_frac is NULL-free: docs
    with < n tokens have 0 n-grams and report 0.0."""
    toks = tokens_sql(text_col)
    joiner = " || ' ' || ".join(f"ts[i + {j}]" for j in range(n))
    grams = (
        f"CASE WHEN size(ts) < {n} THEN array() ELSE "
        f"transform(sequence(0, size(ts) - {n}), i -> {joiner}) END"
    )
    return (
        documents.selectExpr(f"{id_col} AS doc_id", f"{toks} AS ts")
        .selectExpr("doc_id", "size(ts) AS n_tokens", f"{grams} AS grams")
        .selectExpr(
            "doc_id",
            "n_tokens",
            "size(grams) AS n_ngrams",
            "size(array_distinct(grams)) AS n_distinct_ngrams",
            "CASE WHEN size(grams) = 0 THEN CAST(0.0 AS double) ELSE "
            "round(1.0 - CAST(size(array_distinct(grams)) AS double)"
            " / size(grams), 9) END AS dup_ngram_frac",
        )
    )
