"""Text analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All pure Column expressions over the normative tokenizer (F2) — JVM-side
whole-stage codegen, no Python in the hot path — and all expressible in
ANSI SQL so each has an exact DuckDB oracle (__spark_entry__). Float
outputs are ratios of ints and fixed-order products: bit-identical
across engines, rounded to 9 decimals at the contract surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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


def lm_score(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_bigrams, avg_logprob) — corpus-trained add-one bigram
    language-model score: the CCNet-style "LM quality filter" analog
    (Wenzek et al. 2020 score documents with a KenLM model; here the
    model is a bigram MLE with add-one smoothing trained on the corpus
    itself, so the operator is self-contained and oracle-able).

        P(w_i | w_{i-1}) = (c(w_{i-1}, w_i) + 1) / (c(w_{i-1}) + V)
        avg_logprob      = (1/n) * sum_i ln P(w_i | w_{i-1})

    Low avg_logprob ⇒ improbable token transitions (gibberish, SEO
    keyword stuffing); a curation pipeline thresholds it like a
    perplexity cut. Docs with < 2 tokens report (0, 0.0).

    Scale shape: unigram and bigram count tables are groupBy
    aggregations (map-side combined — a boilerplate bigram's millions
    of occurrences collapse before the shuffle); the score join back to
    the exploded bigram stream is co-partitioned on (w1, w2), the same
    key as the count agg, so AQE reuses that exchange; the unigram join
    keys on w1 only (skew handled by AQE skew-join). The per-doc sum is
    a sequential fold in position order — deterministic IEEE order, so
    the DuckDB oracle (list_reduce over list(logp ORDER BY pos))
    reproduces it bit-for-bit. V (vocabulary size) is a single count()
    scalar, the same driver-aggregate class as the tf-idf corpus count.
    """
    toks = tokens_sql(text_col)
    base = documents.selectExpr(f"{id_col} AS doc_id", f"{toks} AS tl")
    bi = (
        base.where("size(tl) >= 2")
        .selectExpr(
            "doc_id",
            # arrays_zip over two slices, NOT transform+get: the
            # per-index lambda falls out of codegen and measured 25x
            # slower (9.6 s vs 0.38 s for the sf0.1 bigram stream);
            # greatest(...) keeps the slice length total so CSE can
            # hoist this into the size>=2 Filter stage without ANSI
            # errors (the original trap that motivated get())
            "arrays_zip(slice(tl, 1, greatest(size(tl) - 1, 0)), "
            "slice(tl, 2, greatest(size(tl) - 1, 0))) AS bs",
        )
        .select("doc_id", F.posexplode("bs").alias("pos", "b"))
        .selectExpr("doc_id", "pos", "b['0'] AS w1", "b['1'] AS w2")
    )
    uni = (
        base.select(F.explode("tl").alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("cu"))
    )
    vocab_size = uni.count()
    big = bi.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    scored = (
        bi.join(big, ["w1", "w2"])
        .join(uni, "w1")
        .selectExpr(
            "doc_id",
            "pos",
            # cb+1 and cu+V are exact in double (ints << 2^53); the
            # division and ln are then bit-identical across engines
            f"ln((CAST(cb AS DOUBLE) + 1.0D) / "
            f"(CAST(cu AS DOUBLE) + {float(vocab_size)!r}D)) AS logp",
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.expr(
            "aggregate(sort_array(collect_list(struct(pos, logp))), "
            "CAST(0.0 AS DOUBLE), (a, s) -> a + s.logp)"
        ).alias("s"),
    )
    return (
        base.select("doc_id")
        .join(agg, "doc_id", "left")
        .selectExpr(
            "doc_id",
            "coalesce(n_bigrams, 0L) AS n_bigrams",
            "round(coalesce(s / n_bigrams, CAST(0.0 AS DOUBLE)), 9) "
            "AS avg_logprob",
        )
    )


def vocab_growth(
    documents: DataFrame,
    bucket: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, new_types, cum_tokens, cum_types) — the
    Heaps-law vocabulary-growth curve: for each document in doc_id
    order, how many tokens the corpus has seen so far and how many
    DISTINCT token types, with new_types = types whose first occurrence
    is this document. The standard corpus diagnostic for "is the crawl
    still discovering vocabulary or re-crawling the same content".

    Scale shape — a running total WITHOUT a global-order window (the
    round-1 verdict's plan killer): the corpus-order prefix sum is
    two-phase. Phase 1 groups per-doc counts into doc_id//bucket
    buckets and windows over the BUCKET table only (the classic scan
    prefix-sum upsweep). Phase 2 broadcast-joins the bucket prefixes
    back and windows WITHIN each bucket partition.

    bucket=None (default) SELF-SIZES: one column-pruned min/max over
    the id column picks bucket = ceil(sqrt(id_span)), so the upsweep's
    SinglePartition window orders ≤ sqrt(span)+1 rows and each
    within-bucket window spans ≤ sqrt(span)+1 ids — no caller can
    produce an unbounded single-partition sort (at 10^10 docs the
    upsweep is 10^5 rows, trivially one task). An explicit bucket is
    honored for callers that know their id density. The RESULT is
    bucket-invariant (pure prefix-sum regrouping; the oracle SQL has
    no bucket notion). type-first-occurrence is one min-agg shuffled
    by token; everything else is int arithmetic in whole-stage codegen.
    """
    from pyspark.sql import Window

    if bucket is None:
        import math

        lo, hi = documents.select(
            F.min(F.col(id_col)), F.max(F.col(id_col))
        ).first()
        span = max(1, int(hi) - int(lo) + 1) if hi is not None else 1
        bucket = max(1, math.isqrt(span - 1) + 1)

    d = documents.selectExpr(
        f"{id_col} AS doc_id",
        f"size({tokens_sql(text_col)}) AS n_tokens",
    ).withColumn("n_tokens", F.greatest(F.col("n_tokens"), F.lit(0)))
    toks = documents.selectExpr(
        f"{id_col} AS doc_id", f"explode({tokens_sql(text_col)}) AS token"
    )
    first = toks.groupBy("token").agg(F.min("doc_id").alias("doc_id"))
    new_types = first.groupBy("doc_id").agg(
        F.count("*").alias("new_types")
    )
    per_doc = (
        d.join(new_types, "doc_id", "left")
        .withColumn("new_types", F.coalesce("new_types", F.lit(0)))
        .withColumn("b", (F.col("doc_id") / bucket).cast("bigint"))
    )
    bucket_tot = per_doc.groupBy("b").agg(
        F.sum("n_tokens").alias("bt"), F.sum("new_types").alias("bv")
    )
    # bounded bucket table (one row per bucket); the constant
    # non-foldable key silences the partition-less WindowExec
    # warning so a REAL unbounded global window stays visible
    # in the logs
    wb = (
        Window.partitionBy(F.pmod(F.col("b"), F.lit(1)))
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bucket_pre = bucket_tot.select(
        "b",
        F.coalesce(F.sum("bt").over(wb), F.lit(0)).alias("pre_t"),
        F.coalesce(F.sum("bv").over(wb), F.lit(0)).alias("pre_v"),
    )
    wi = (
        Window.partitionBy("b")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        per_doc.join(F.broadcast(bucket_pre), "b")
        .select(
            "doc_id",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.col("new_types").cast("bigint").alias("new_types"),
            (F.col("pre_t") + F.sum("n_tokens").over(wi))
            .cast("bigint")
            .alias("cum_tokens"),
            (F.col("pre_v") + F.sum("new_types").over(wi))
            .cast("bigint")
            .alias("cum_types"),
        )
    )


def keyness(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(token, n_a, n_b, g2, enriched_in) — Dunning log-likelihood
    keyness (G², "Accurate Methods for the Statistics of Surprise and
    Coincidence", CL 1994) between two corpus slices: which terms
    DISTINGUISH slice A from slice B. The standard crawl-drift /
    contamination diagnostic — run it between yesterday's and today's
    crawl (here: the deterministic doc_id-parity split stands in for
    two snapshots) and the top-G² terms are what changed.

      G² = 2·(a·ln(a/E_a) + b·ln(b/E_b)),  E_x = N_x·(a+b)/(N_a+N_b)

    with a/b the token's occurrence counts and N the slice token
    totals; zero-count sides contribute 0 (lim x→0 of x·ln(x/E) = 0).

    Scale shape: ONE (token) shuffle with conditional map-side partial
    sums; the two totals are one exact-long aggregate collected as
    query constants. Per-token math is per-row double arithmetic from
    exact ints — no corpus-wide float sum anywhere, so output is
    bit-deterministic under any partitioning."""
    ex = documents.selectExpr(
        f"{id_col} % 2 = 0 AS in_a",
        f"explode({tokens_sql(text_col)}) AS token",
    )
    counts = ex.groupBy("token").agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(~F.col("in_a"), 1).otherwise(0)).alias("n_b"),
    )
    tot = counts.agg(
        F.sum("n_a").alias("na"), F.sum("n_b").alias("nb")
    ).collect()[0]
    na, nb = int(tot["na"] or 0), int(tot["nb"] or 0)
    if na == 0 or nb == 0:
        return counts.select(
            "token", "n_a", "n_b",
            F.lit(0.0).alias("g2"),
            F.lit(None).cast("string").alias("enriched_in"),
        ).limit(0)
    expect = (
        f"(CAST(n_a + n_b AS DOUBLE) / CAST({na + nb} AS DOUBLE))"
    )
    term = (
        "(CASE WHEN {x} = 0 THEN 0.0D ELSE CAST({x} AS DOUBLE) * "
        "ln(CAST({x} AS DOUBLE) / (CAST({n} AS DOUBLE) * {e})) END)"
    )
    g2 = (
        f"2.0D * ({term.format(x='n_a', n=na, e=expect)} + "
        f"{term.format(x='n_b', n=nb, e=expect)})"
    )
    return counts.selectExpr(
        "token", "n_a", "n_b",
        f"{g2} AS g2",
        f"CASE WHEN CAST(n_a AS DOUBLE) * {nb} >= CAST(n_b AS DOUBLE) * {na} "
        "THEN 'a' ELSE 'b' END AS enriched_in",
    )


def freq_spectrum(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(freq, n_types) — the vocabulary frequency spectrum (how many
    distinct token types occur exactly `freq` times): the Zipf/Heaps
    companion view. n_types at freq=1 is the hapax count — the standard
    "is the corpus still growing vocabulary / how noisy is the token
    stream" diagnostic. Two chained exact-count aggregates (token, then
    freq), both map-side combinable."""
    tok_freq = documents.selectExpr(
        f"explode({tokens_sql(text_col)}) AS token"
    ).groupBy("token").agg(F.count("*").alias("freq"))
    return tok_freq.groupBy("freq").agg(F.count("*").alias("n_types"))


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """(doc_id, n_words, mean_word_len, symbol_ratio, bullet_ratio,
    ellipsis_ratio, alpha_ratio, stop_hits, keep) — the published Gopher
    document-quality rules (Rae et al. 2021 §A1.1) as one pure-Column
    projection: word-count bounds, mean-word-length bounds, symbol
    (#/ellipsis)-to-word ratio, bullet-started and ellipsis-ended line
    ratios, alphabetic-word ratio, and the ≥2-of-8 stopword requirement.
    A doc keeps iff every rule passes.

    Words are whitespace runs over lower(text) (the paper's tokenizer-
    free definition — NOT the index tokenizer F2: quality gating must
    see punctuation and casing artifacts the index normalizes away);
    lines split on newline. Everything is substring/ratio arithmetic of
    ints so the DuckDB oracle reproduces each double exactly. Scale
    shape: a single narrow map over the scan — no shuffle, no UDF."""
    words = f"filter(split(lower({text_col}), '\\\\s+'), w -> w != '')"
    lines = f"filter(split({text_col}, '\\n'), l -> trim(l) != '')"
    hash_cnt = f"length({text_col}) - length(replace({text_col}, '#', ''))"
    ell_cnt = (
        f"(length({text_col}) - length(replace({text_col}, '...', ''))) / 3"
    )
    base = documents.selectExpr(
        f"{id_col} AS doc_id",
        f"size({words}) AS n_words",
        f"CASE WHEN size({words}) = 0 THEN 0.0D ELSE "
        f"CAST(aggregate({words}, 0L, (a, w) -> a + length(w)) AS DOUBLE)"
        f" / size({words}) END AS mean_word_len",
        f"CASE WHEN size({words}) = 0 THEN 0.0D ELSE "
        f"CAST({hash_cnt} + {ell_cnt} AS DOUBLE) / size({words}) END"
        " AS symbol_ratio",
        f"CASE WHEN size({lines}) = 0 THEN 0.0D ELSE "
        f"CAST(size(filter({lines}, l -> substring(ltrim(l), 1, 1) IN "
        f"('-', '*', '•'))) AS DOUBLE) / size({lines}) END AS bullet_ratio",
        f"CASE WHEN size({lines}) = 0 THEN 0.0D ELSE "
        f"CAST(size(filter({lines}, l -> length(rtrim(l)) >= 3 AND "
        f"substring(rtrim(l), length(rtrim(l)) - 2, 3) = '...')) AS DOUBLE)"
        f" / size({lines}) END AS ellipsis_ratio",
        f"CASE WHEN size({words}) = 0 THEN 0.0D ELSE "
        f"CAST(size(filter({words}, w -> w rlike '[a-z]')) AS DOUBLE)"
        f" / size({words}) END AS alpha_ratio",
        f"size(filter(array({', '.join(repr(w) for w in GOPHER_STOPWORDS)}), "
        f"sw -> array_contains({words}, sw))) AS stop_hits",
    )
    return base.selectExpr(
        "doc_id", "n_words", "mean_word_len", "symbol_ratio", "bullet_ratio",
        "ellipsis_ratio", "alpha_ratio", "stop_hits",
        f"n_words >= {min_words} AND n_words <= {max_words} "
        f"AND mean_word_len >= {min_mean_len}D "
        f"AND mean_word_len <= {max_mean_len}D "
        f"AND symbol_ratio <= {max_symbol_ratio}D "
        f"AND bullet_ratio <= {max_bullet_ratio}D "
        f"AND ellipsis_ratio <= {max_ellipsis_ratio}D "
        f"AND alpha_ratio >= {min_alpha_ratio}D "
        f"AND stop_hits >= {min_stop_hits} AS keep",
    )


def c4_filters(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_words: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """(doc_id, n_lines, kept_lines, n_sentences, has_lorem, has_brace,
    keep) — the published C4 cleaning rules (Raffel et al. 2020 §2.2)
    as one pure-Column projection. Line rule: a line survives iff it
    has ≥ min_line_words whitespace words, ends in terminal punctuation
    (. ! ? "), and does not contain 'javascript'. Page rules: ≥
    min_sentences sentences (terminal-punctuation count), no
    'lorem ipsum', no '{'. keep ⇔ every page rule passes and ≥ 1 line
    survives. (The C4 three-sentence-span dedup is the separate
    span_dedup operator.) One narrow map over the scan — no shuffle."""
    lines = f"filter(split({text_col}, '\\n'), l -> trim(l) != '')"
    lw = "filter(split(lower(l), '\\\\s+'), w -> w != '')"
    kept = (
        f"filter({lines}, l -> size({lw}) >= {min_line_words} "
        "AND substring(rtrim(l), length(rtrim(l)), 1) IN ('.', '!', '?', '\"') "
        "AND NOT contains(lower(l), 'javascript'))"
    )
    # terminal-punctuation count via length diffs (portable: char-split
    # semantics differ across engines, replace() does not)
    sent = " + ".join(
        f"(length({text_col}) - length(replace({text_col}, '{c}', '')))"
        for c in ".!?"
    )
    base = documents.selectExpr(
        f"{id_col} AS doc_id",
        f"size({lines}) AS n_lines",
        f"size({kept}) AS kept_lines",
        f"{sent} AS n_sentences",
        f"contains(lower({text_col}), 'lorem ipsum') AS has_lorem",
        f"contains({text_col}, '{{') AS has_brace",
    )
    return base.selectExpr(
        "doc_id", "n_lines", "kept_lines", "n_sentences", "has_lorem",
        "has_brace",
        f"n_sentences >= {min_sentences} AND NOT has_lorem AND NOT has_brace "
        "AND kept_lines >= 1 AS keep",
    )


def lm_score_trigram(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    l3: float = 0.6,
    l2: float = 0.3,
    l1: float = 0.1,
) -> DataFrame:
    """(doc_id, n_trigrams, avg_logprob) — Jelinek-Mercer interpolated
    trigram LM score, the higher-order sibling of lm_score's bigram
    filter (CCNet thresholds a 5-gram KenLM; interpolation is the
    public Jelinek & Mercer 1980 smoothing):

      P(w3|w1w2) = λ3·c(w1w2w3)/ctx(w1w2) + λ2·c(w2w3)/ctx(w2)
                   + λ1·(c(w3)+1)/(T+V)

    ctx(·) are continuation-context counts (the marginal of the next-
    order table, so every ratio is a true conditional ≤ 1 and the
    mixture is always > 0 via the add-one unigram floor). Docs with
    < 3 tokens report (0, 0.0).

    Scale shape: identical to lm_score one order up — three count
    tables (trigram/bigram/unigram + their context marginals) are
    map-side-combined groupBy aggregations; each joins back to the
    exploded trigram stream on exactly its own aggregation key, so the
    exchanges reuse; the per-doc sum folds in position order
    (deterministic IEEE order, mirrored by the oracle's list_reduce).
    The λ-mixture is ONE fixed-order expression — λ3·x + λ2·y + λ1·z
    left-associated identically in both engines.
    """
    toks = tokens_sql(text_col)
    base = documents.selectExpr(f"{id_col} AS doc_id", f"{toks} AS tl")
    tri = (
        base.where("size(tl) >= 3")
        .selectExpr(
            "doc_id",
            # zipped slices, not transform+get (lm_score's 25x note)
            "arrays_zip(slice(tl, 1, greatest(size(tl) - 2, 0)), "
            "slice(tl, 2, greatest(size(tl) - 2, 0)), "
            "slice(tl, 3, greatest(size(tl) - 2, 0))) AS ts",
        )
        .select("doc_id", F.posexplode("ts").alias("pos", "t"))
        .selectExpr(
            "doc_id", "pos", "t['0'] AS w1", "t['1'] AS w2", "t['2'] AS w3"
        )
    )
    bi = (
        base.where("size(tl) >= 2")
        .selectExpr(
            "doc_id",
            "arrays_zip(slice(tl, 1, greatest(size(tl) - 1, 0)), "
            "slice(tl, 2, greatest(size(tl) - 1, 0))) AS bs",
        )
        .select(F.explode("bs").alias("b"))
        .selectExpr("b['0'] AS w1", "b['1'] AS w2")
    )
    uni = (
        base.select(F.explode("tl").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cuni"))
    )
    stats = uni.agg(
        F.count("*").alias("v"), F.sum("cuni").alias("t")
    ).collect()[0]
    vocab, total = int(stats["v"]), int(stats["t"] or 0)
    if total == 0:
        return documents.sparkSession.createDataFrame(
            [], "doc_id long, n_trigrams long, avg_logprob double"
        )
    ct3 = tri.groupBy("w1", "w2", "w3").agg(F.count("*").alias("c3"))
    ctx2 = tri.groupBy("w1", "w2").agg(F.count("*").alias("x2"))
    cb = bi.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    ctx1 = bi.groupBy("w1").agg(F.count("*").alias("x1"))
    scored = (
        tri.join(ct3, ["w1", "w2", "w3"])
        .join(ctx2, ["w1", "w2"])
        .join(
            cb.select(
                F.col("w1").alias("w2"), F.col("w2").alias("w3"), "c2"
            ),
            ["w2", "w3"],
        )
        .join(ctx1.select(F.col("w1").alias("w2"), "x1"), "w2")
        .join(uni.select(F.col("w").alias("w3"), "cuni"), "w3")
        .selectExpr(
            "doc_id",
            "pos",
            f"ln({l3!r}D * (CAST(c3 AS DOUBLE) / CAST(x2 AS DOUBLE))"
            f" + {l2!r}D * (CAST(c2 AS DOUBLE) / CAST(x1 AS DOUBLE))"
            f" + {l1!r}D * ((CAST(cuni AS DOUBLE) + 1.0D)"
            f" / ({float(total)!r}D + {float(vocab)!r}D))) AS logp",
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_trigrams"),
        F.expr(
            "aggregate(sort_array(collect_list(struct(pos, logp))), "
            "CAST(0.0 AS DOUBLE), (a, s) -> a + s.logp)"
        ).alias("s"),
    )
    return (
        base.select("doc_id")
        .join(agg, "doc_id", "left")
        .selectExpr(
            "doc_id",
            "coalesce(n_trigrams, 0L) AS n_trigrams",
            "round(coalesce(s / n_trigrams, CAST(0.0 AS DOUBLE)), 9) "
            "AS avg_logprob",
        )
    )


# Soft-404 phrase cues — the published heuristic vocabulary (Bar-Yossef
# et al. WWW 2004 "Sic transit gloria telae" classify soft 404s by
# content signals; these cue phrases are the standard feature set).
SOFT404_PHRASES: tuple[str, ...] = (
    "page not found",
    "404 not found",
    "404 error",
    "no longer available",
    "does not exist",
    "page cannot be found",
    "page you requested",
    "moved permanently",
)
SOFT404_MIN_TOKENS = 20


def soft404_scores(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = SOFT404_MIN_TOKENS,
) -> DataFrame:
    """(doc_id, n_tokens, n_cues, is_soft404) — content-signal soft-404
    detection: pages that answer HTTP 200 but are really error pages
    (Bar-Yossef et al. WWW 2004 measured ~25% of dead links hide
    behind them; every production crawler gates on this or pollutes
    its index with 'Page Not Found' documents).

    A page is flagged when it carries ≥ 1 cue phrase AND is short
    (< min_tokens tokens) — the two signals the paper found dominant;
    either alone over-fires (news articles ABOUT 404s; legitimately
    short pages).

    Pure per-row Column expressions: ONE lowercased contains() per cue
    (codegen'd, no regex backtracking, no UDF) + the tokenizer's
    size() — zero shuffles; the gate composes into the fetch loop the
    same way the status-code gate (P5) does, but on content.
    """
    low = F.lower(F.col(text_col))
    n_cues = None
    for p in SOFT404_PHRASES:
        c = F.when(F.contains(low, F.lit(p)), F.lit(1)).otherwise(F.lit(0))
        n_cues = c if n_cues is None else n_cues + c
    n_tokens = F.size(F.expr(tokens_sql(text_col)))
    return documents.select(
        F.col(id_col).alias("doc_id"),
        n_tokens.cast("long").alias("n_tokens"),
        n_cues.cast("long").alias("n_cues"),
        (
            (n_cues > 0) & (n_tokens < min_tokens)
        ).alias("is_soft404"),
    )


def stopword_census(
    documents: DataFrame,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(token, cf, df, coverage) — corpus-statistical stopword
    induction: the top-k tokens by collection frequency with their
    document frequency and token-mass coverage cf/|C| (Luhn's classic
    upper-cut; IIR ch.2 builds stop lists exactly this way instead of
    shipping a fixed one — essential for non-English / domain corpora
    where a canned list misses everything).

    The ranking an engine uses to pick its MaxScore stopword tier and
    its df-cut thresholds from data. Exact ints + one ratio; ONE
    (token) aggregate the dictionary already pays + a top-k TakeOrdered
    — no global sort."""
    toks = tokens_sql(text_col)
    ex = documents.selectExpr(
        f"{id_col} AS doc_id", f"explode({toks}) AS token"
    )
    stats = ex.groupBy("token").agg(
        F.count("*").alias("cf"),
        F.count_distinct("doc_id").alias("df"),
    )
    total = ex.count()
    if total == 0:
        return documents.sparkSession.createDataFrame(
            [], "token string, cf long, df long, coverage double"
        )
    return (
        stats.select(
            "token",
            "cf",
            "df",
            (F.col("cf").cast("double") / F.lit(float(total))).alias(
                "coverage"
            ),
        )
        .orderBy(F.col("cf").desc(), F.col("token").asc())
        .limit(k)
    )


def readability_scores(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_sents, n_words, n_syllables, flesch) — Flesch
    reading-ease (Flesch 1948, the published constants):

      206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)

    with sentences = max(1, count of [.!?]+ runs) and the standard
    vowel-group syllable heuristic, max(1, count of [aeiouy]+ runs)
    per word. A curation readability gate (C4/Gopher-adjacent): SEO
    keyword soup and OCR noise score far outside the human band.

    Pure per-row expressions; the syllable sum is an integer fold
    (order-free). The float formula is ONE fixed expression shared
    with the oracle."""
    toks = tokens_sql(text_col)
    return documents.selectExpr(
        f"{id_col} AS doc_id",
        f"greatest(1L, CAST(size(regexp_extract_all({text_col}, "
        f"'[.!?]+', 0)) AS BIGINT)) AS n_sents",
        f"CAST(size({toks}) AS BIGINT) AS n_words",
        f"aggregate(transform({toks}, t -> greatest(1L, "
        f"CAST(size(regexp_extract_all(t, '[aeiouy]+', 0)) AS BIGINT))), "
        f"0L, (a, s) -> a + s) AS n_syllables",
    ).selectExpr(
        "doc_id",
        "n_sents",
        "n_words",
        "n_syllables",
        "CASE WHEN n_words = 0 THEN CAST(0.0 AS DOUBLE) ELSE "
        "206.835D - 1.015D * (CAST(n_words AS DOUBLE) / CAST(n_sents AS DOUBLE))"
        " - 84.6D * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))"
        " END AS flesch",
    )


def term_burstiness(
    documents: DataFrame,
    min_df: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(token, df, df2, burstiness) — Church & Gale / Katz term
    burstiness: of the documents containing a term, what fraction
    contain it AGAIN (P(tf ≥ 2 | tf ≥ 1))? Content words burst
    (mentioned once, mentioned often); function words spread evenly —
    the statistic separates topical vocabulary from glue better than
    raw df, and feeds stopword/keyword decisions next to
    stopword_census. Exact integer counts + one ratio; ONE
    (doc, token) aggregate the tf table already pays + one token
    rollup."""
    toks = tokens_sql(text_col)
    per = (
        documents.selectExpr(
            f"{id_col} AS doc_id", f"explode({toks}) AS token"
        )
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("f"))
    )
    return (
        per.groupBy("token")
        .agg(
            F.count("*").alias("df"),
            F.sum(F.when(F.col("f") >= 2, 1).otherwise(0)).alias("df2"),
        )
        .filter(F.col("df") >= min_df)
        .select(
            "token",
            "df",
            "df2",
            (F.col("df2").cast("double") / F.col("df").cast("double")).alias(
                "burstiness"
            ),
        )
    )


def good_turing_discounts(
    documents: DataFrame,
    max_r: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(r, n_r, r_star) — the Good-Turing discounted counts over the
    corpus unigram spectrum: r* = (r+1)·N_{r+1}/N_r for r ≤ max_r
    (Good 1953; the core table of Katz-backoff smoothing — low counts
    shrink toward the mass the hapaxes imply). Rows where N_{r+1} = 0
    report r* = r (no discount information — the standard cutoff
    convention, which is also why practical Katz only discounts small
    r; max_r defaults to the usual 10).

    Built straight off freq_spectrum's exact integer counts (two
    map-side-combinable aggregates) + ONE self-join of the tiny
    spectrum frame on r+1."""
    spec = freq_spectrum(documents, id_col, text_col)
    nxt = spec.select(
        (F.col("freq") - 1).alias("freq"), F.col("n_types").alias("n_next")
    )
    j = spec.filter(F.col("freq") <= max_r).join(nxt, "freq", "left")
    r = F.col("freq").cast("double")
    rstar = F.when(
        F.col("n_next").isNotNull() & (F.col("n_next") > 0),
        (r + F.lit(1.0))
        * (F.col("n_next").cast("double") / F.col("n_types").cast("double")),
    ).otherwise(r)
    return j.select(
        F.col("freq").alias("r"),
        F.col("n_types").alias("n_r"),
        rstar.alias("r_star"),
    )


def kneser_ney_bigrams(
    documents: DataFrame,
    min_count: int = 5,
    discount: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(w1, w2, c, p_kn) — interpolated Kneser-Ney smoothed bigram
    probabilities (Kneser & Ney 1995; Chen & Goodman 1999's standard
    formulation), the LM-smoothing family's best-practice member next
    to lm_score's add-one and lm_score_trigram's Jelinek-Mercer:

      P_KN(w2|w1) = max(c(w1,w2) - D, 0) / c(w1·)
                    + D · N1+(w1,·) / c(w1·) · N1+(·,w2) / N1+(·,·)

    The continuation probability N1+(·,w2)/N1+(·,·) — "how many
    CONTEXTS does w2 complete", not "how often does w2 occur" — is the
    part that fixes add-one's 'francisco' pathology: a word frequent
    only inside one collocation gets a small continuation weight no
    matter its raw count. Rows are emitted for bigrams with
    c ≥ min_count; the smoothing statistics are computed over ALL
    bigrams first, so the filter changes which rows ship, never their
    values.

    Determinism: every input to the probability is an exact int64
    count; D and the count differences are exact in double; the
    expression tree (two divisions, one product chain, fixed parens)
    is spelled identically in the DuckDB oracle, so p_kn bit-matches.

    Scale shape: ONE (w1,w2) groupBy over the exploded bigram stream
    (map-side combined), then the three smoothing tables derive from
    that already-aggregated bigram-type table — c(w1·) and N1+(w1,·)
    by a w1 groupBy, N1+(·,w2) by a w2 groupBy, N1+(·,·) a single
    scalar; the final joins key the filtered type table (not the
    occurrence stream) on w1 / w2. No window, no self-join, nothing
    touches occurrence rows after the first agg.
    """
    toks = tokens_sql(text_col)
    base = documents.selectExpr(f"{id_col} AS doc_id", f"{toks} AS tl")
    bi = (
        base.where("size(tl) >= 2")
        .selectExpr(
            "arrays_zip(slice(tl, 1, greatest(size(tl) - 1, 0)), "
            "slice(tl, 2, greatest(size(tl) - 1, 0))) AS bs",
        )
        .select(F.explode("bs").alias("b"))
        .selectExpr("b['0'] AS w1", "b['1'] AS w2")
    )
    # ONE materialization of the bigram-type table: four consumers
    # (left/cont marginals, the type count, the output filter) would
    # otherwise each replay the tokenize+explode+groupBy chain — the
    # measured 3x wall cost at sf0.1 (15.6 s -> ~5 s with the persist)
    big = bi.groupBy("w1", "w2").agg(F.count("*").alias("cb")).persist()
    left = big.groupBy("w1").agg(
        F.sum("cb").alias("cl"), F.count("*").alias("nf")
    )
    cont = big.groupBy("w2").agg(F.count("*").alias("np"))
    n_types = big.count()
    d = float(discount)
    return (
        big.filter(F.col("cb") >= min_count)
        .join(left, "w1")
        .join(cont, "w2")
        .selectExpr(
            "w1",
            "w2",
            "cb AS c",
            f"round(greatest(CAST(cb AS DOUBLE) - {d!r}D, 0.0D) "
            f"/ CAST(cl AS DOUBLE) "
            f"+ {d!r}D * CAST(nf AS DOUBLE) / CAST(cl AS DOUBLE) "
            f"* (CAST(np AS DOUBLE) / {float(n_types)!r}D), 9) AS p_kn",
        )
    )


def zipf_fit(
    documents: DataFrame,
    max_rank: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row (n_ranks, slope, intercept): OLS fit of ln(freq) on
    ln(rank) over the top-``max_rank`` terms — the Zipf's-law exponent
    (Zipf 1949; slope ≈ -1 for natural language). A crawl-health
    diagnostic next to vocab_growth and freq_spectrum: machine-generated
    or template-flooded corpora bend the rank-frequency line (too flat:
    keyword stuffing; too steep: boilerplate domination), and the single
    fitted exponent is the thresholdable number.

    Determinism: x = ln(rank), y = ln(count) are per-row lns of exact
    ints (ln is bit-parity across engines, measured — see BENCH notes);
    the four OLS sums fold in rank order via the lm_score
    sorted-list-fold pattern, so Σx, Σy, Σxy, Σx² and the closed-form
    slope/intercept bit-match the DuckDB oracle.

    Scale shape: the corpus-sized work is ONE map-side-combined token
    count; the top-max_rank cut is orderBy().limit() (TakeOrdered — no
    global sort/window over the vocabulary), and every window/fold
    after it runs on ≤ max_rank rows by construction.
    """
    toks = tokens_sql(text_col)
    freq = (
        documents.selectExpr(f"explode({toks}) AS token")
        .groupBy("token")
        .agg(F.count("*").alias("c"))
    )
    top = freq.orderBy(F.col("c").desc(), F.col("token").asc()).limit(
        max_rank
    )
    one = F.pmod(F.col("c"), F.lit(1))
    w = Window.partitionBy(one).orderBy(
        F.col("c").desc(), F.col("token").asc()
    )
    pts = (
        top.withColumn("rk", F.row_number().over(w).cast("long"))
        .selectExpr(
            "rk",
            "ln(CAST(rk AS DOUBLE)) AS x",
            "ln(CAST(c AS DOUBLE)) AS y",
        )
        .selectExpr("rk", "x", "y", "x * y AS xy", "x * x AS xx")
    )

    def fold(v: str) -> str:
        return (
            f"aggregate(sort_array(collect_list(struct(rk, {v} AS v))), "
            "CAST(0.0 AS DOUBLE), (a, s) -> a + s.v)"
        )

    agg = pts.agg(
        F.count("*").alias("n_ranks"),
        F.expr(fold("x")).alias("sx"),
        F.expr(fold("y")).alias("sy"),
        F.expr(fold("xy")).alias("sxy"),
        F.expr(fold("xx")).alias("sxx"),
    )
    return agg.selectExpr(
        "n_ranks",
        "CAST(n_ranks AS DOUBLE) AS n",
        "sx", "sy", "sxy", "sxx",
    ).selectExpr(
        "n_ranks",
        "round((n * sxy - sx * sy) / (n * sxx - sx * sx), 9) AS slope",
        "round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)"
        " / n, 9) AS intercept",
    )


def yule_k(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, yule_k) — Yule's characteristic K (Yule
    1944), the classic repetitiveness/lexical-diversity statistic:

      K = 10^4 · (Σ_t tf_t² − N) / N²

    (the Σ m²·V(m) form collapses to Σ tf² over types). Length-robust
    unlike type-token ratio, which is why stylometry and quality
    filtering still use it: boilerplate and keyword-stuffed pages
    score high K, diverse prose low. Complements repetition_stats
    (n-gram repeats) with a type-frequency-shape signal.

    Exactness: tf and N are int64; Σ tf² stays int64 (a doc of 10^6
    tokens of one type is 10^12 ≪ 2^63); K is one division of exact
    ints scaled by the exact 10^4. Plan: ONE (doc, token) groupBy +
    one per-doc agg — word-count shape. Empty docs report NULL K.
    """
    toks = tokens_sql(text_col)
    tf = (
        documents.selectExpr(
            f"{id_col} AS doc_id", f"explode({toks}) AS token"
        )
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("f"))
    )
    agg = tf.groupBy("doc_id").agg(
        F.sum("f").alias("n_tokens"),
        F.sum(F.col("f") * F.col("f")).alias("sf2"),
    )
    base = documents.selectExpr(f"{id_col} AS doc_id").join(
        agg, "doc_id", "left"
    )
    n = F.col("n_tokens")
    k = (
        F.lit(10000.0)
        * (F.col("sf2") - n).cast("double")
        / (n * n).cast("double")
    )
    return base.select(
        "doc_id",
        F.coalesce(n, F.lit(0)).cast("long").alias("n_tokens"),
        F.round(F.when(n > 0, k), 9).alias("yule_k"),
    )
