"""Training-data assembly operators: benchmark decontamination,
corpus-wide span dedup, PII scrubbing, and sequence packing.

Beyond-reference pipeline operators (SURVEY §2.11) — the four
operations every large-scale LLM pretraining pipeline runs between "we
have a crawl" and "we have a training set", each re-expressed as a
declarative Spark plan with an exact DuckDB oracle:

  * decontaminate — flag training documents sharing any word n-gram
    with an evaluation/benchmark set (the GPT-3/Llama "13-gram
    decontamination" shape; n is a knob). Plan: the eval gram set is
    tiny next to the corpus (benchmarks are ~1e5-1e6 grams), so it is
    BROADCAST; train grams explode map-side into a broadcast semi-join
    and only the HIT rows (a small fraction of the corpus) reach the
    per-doc count shuffle. The hit table is broadcast back for the
    final enrich, so the full corpus is never shuffled at all.
  * span_dedup — corpus-wide first-occurrence dedup of fixed-length
    token spans (the C4 "three-sentence span" dedup adapted to
    span-of-k-tokens segmentation). Winner per span = min
    (doc_id, span_idx) via groupBy + min(struct): map-side partial
    aggregation makes a hyper-common boilerplate span (the skew case
    that kills a window over PARTITION BY span) combine locally before
    the shuffle.
  * pii_scrub — redact emails / IPv4s / phone numbers with
    RE2-compatible regexes (same pattern semantics in Java regex and
    DuckDB's RE2) and count what was removed. Pure per-row projection:
    no shuffle, whole-stage codegen, scales linearly.
  * pack_sequences — the GPT-style "concatenate the corpus and chop
    into fixed-length training sequences" mapping: per shard, each
    document's token offset is the running sum of prior documents'
    token counts, and first_seq/last_seq are the training-sequence
    indices the document lands in. One window per shard (shards are
    the unit of data parallelism — a real pipeline packs per shard
    precisely so no global order is needed).

All arithmetic is int/window math and string hashing that DuckDB
reproduces bit-for-bit (md5 exists in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from searchengine_spark.functions.text import tokens_sql

# RE2-compatible (no lookarounds/backrefs): identical match semantics in
# Java regex (Spark) and RE2 (DuckDB). Order of redaction matters and is
# fixed: email → ipv4 → phone.
EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{1,2}-\d{3}-\d{4}\b"


def _sliding_grams(toks: str, n: int) -> str:
    """SQL expr: distinct sliding word n-gram strings of the token list
    `toks` (space-joined). Empty array when the doc has < n tokens."""
    return (
        f"CASE WHEN size({toks}) < {n} THEN array() ELSE array_distinct("
        f"transform(sequence(0, size({toks}) - {n}), "
        f"i -> array_join(slice({toks}, i + 1, {n}), ' '))) END"
    )


def _span_list(toks: str, k: int) -> str:
    """SQL expr: non-overlapping k-token span strings (stride k, ragged
    tail kept) — the segmentation unit for corpus-wide span dedup."""
    return (
        f"CASE WHEN size({toks}) = 0 THEN array() ELSE "
        f"transform(sequence(0, CAST(ceil(size({toks}) / {k}.0) AS INT) - 1), "
        f"i -> array_join(slice({toks}, i * {k} + 1, {k}), ' ')) END"
    )


def decontaminate(
    documents: DataFrame,
    n: int = 8,
    eval_mod: int = 97,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_grams, n_hit, contaminated) for every TRAINING doc
    (docs with id % eval_mod != 0); the eval/benchmark set is the
    deterministic id % eval_mod == 0 slice and its distinct n-grams are
    the contamination fingerprints.

    Plan shape (the 100 TB story): eval grams are broadcast (benchmark
    suites are MBs, the corpus is TBs); the corpus-side explode feeds a
    map-side broadcast semi-join, so only matching (doc, gram) rows —
    bounded by |eval grams| × dup-rate, not by corpus size — are
    shuffled for the per-doc count; the count table (≤ contaminated
    docs) broadcasts back onto the per-doc gram summary. The full
    corpus is never exchanged."""
    toks = tokens_sql(text_col)
    grams = documents.selectExpr(
        f"{id_col} AS doc_id",
        f"{id_col} % {eval_mod} = 0 AS is_eval",
        f"{_sliding_grams(toks, n)} AS grams",
    )
    eval_grams = (
        grams.filter("is_eval")
        .select(F.explode("grams").alias("gram"))
        .distinct()
    )
    train = grams.filter(~F.col("is_eval"))
    hits = (
        train.select("doc_id", F.explode("grams").alias("gram"))
        .join(F.broadcast(eval_grams), "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit"))
    )
    return (
        train.join(F.broadcast(hits), "doc_id", "left")
        .select(
            "doc_id",
            F.size("grams").alias("n_grams"),
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
            (F.coalesce(F.col("n_hit"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def span_dedup(
    documents: DataFrame,
    span_tokens: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_spans, n_kept, kept_frac) — corpus-wide
    first-occurrence span dedup: segment each doc into non-overlapping
    `span_tokens`-token spans and keep a span iff this (doc_id,
    span_idx) is the globally first occurrence of its text (min doc_id,
    then min span_idx — the C4 line-dedup rule over span segmentation).

    Skew note: the winner per span is computed with
    groupBy(span).agg(min(struct(doc_id, span_idx))) — partial
    aggregation combines a boilerplate span's millions of occurrences
    map-side, where a PARTITION BY span window would funnel them
    through one task. The join back to the exploded spans is
    co-partitioned on span (same key as the agg, so AQE reuses the
    exchange); the final per-doc rollup is one more map-side-combining
    aggregation."""
    toks = tokens_sql(text_col)
    spans = documents.selectExpr(
        f"{id_col} AS doc_id", f"{_span_list(toks, span_tokens)} AS sp"
    ).select("doc_id", F.posexplode("sp").alias("span_idx", "span"))
    winners = spans.groupBy("span").agg(
        F.min(F.struct("doc_id", "span_idx")).alias("w")
    )
    marked = spans.join(winners, "span").select(
        "doc_id",
        (
            (F.col("doc_id") == F.col("w.doc_id"))
            & (F.col("span_idx") == F.col("w.span_idx"))
        )
        .cast("long")
        .alias("kept"),
    )
    return marked.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum("kept").alias("n_kept"),
        F.round(F.sum("kept") / F.count("*"), 9).alias("kept_frac"),
    )


def exact_substr(
    documents: DataFrame,
    window_tokens: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, n_windows, n_dup_windows, n_dup_spans,
    dup_tokens, dup_frac) — exact-substring duplication census, the
    ExactSubstr shape from Lee et al. 2022 ("Deduplicating Training
    Data Makes Language Models Better"): a token window of length W
    occurring ≥ 2 times ANYWHERE in the corpus marks duplicated text;
    overlapping/touching duplicated windows in a doc merge into maximal
    duplicated spans (interval union of [i, i+W) ranges), and dup_frac
    is the fraction of the doc's tokens inside such spans. Differs from
    span_dedup (stride-k first-occurrence segmentation) exactly the way
    ExactSubstr differs from C4: stride 1 catches duplicated text at
    ANY alignment, and every occurrence (including the first) is
    counted as duplicated.

    Scale shape: windows explode to O(total tokens) rows but carry only
    (doc_id, win_idx, md5) — the md5 keeps shuffle rows fixed-width
    regardless of W. Window multiplicity is one groupBy with map-side
    partial aggregation (a boilerplate window's millions of occurrences
    combine locally — same skew argument as span_dedup); the join back
    is co-partitioned on the same key. The only per-doc window function
    (lag over win_idx) partitions by doc_id, bounded by document
    length, never by corpus size. A full Lee-et-al suffix array is a
    different cost class (global suffix sort); this census gives the
    same ≥W-token duplicated-span signal with plain shuffles, which is
    what a 100 TB curation pass needs from it."""
    w = int(window_tokens)
    toks = tokens_sql(text_col)
    base = documents.selectExpr(
        f"{id_col} AS doc_id",
        f"size({toks}) AS n_tokens",
        f"CASE WHEN size({toks}) < {w} THEN array() ELSE "
        f"transform(sequence(0, size({toks}) - {w}), "
        f"i -> md5(array_join(slice({toks}, i + 1, {w}), ' '))) END AS wh",
    ).persist()
    wins = base.select(
        "doc_id", F.posexplode("wh").alias("win_idx", "h")
    )
    dup_h = wins.groupBy("h").agg(F.count(F.lit(1)).alias("occ")).filter(
        "occ > 1"
    )
    dup_wins = wins.join(dup_h.select("h"), "h").select("doc_id", "win_idx")
    lag_w = Window.partitionBy("doc_id").orderBy("win_idx")
    runs = (
        dup_wins.withColumn("prev", F.lag("win_idx").over(lag_w))
        .withColumn(
            "new_run",
            F.when(
                F.col("prev").isNull()
                | (F.col("win_idx") - F.col("prev") > w),
                1,
            ).otherwise(0),
        )
        .withColumn("run_id", F.sum("new_run").over(lag_w))
    )
    per_run = runs.groupBy("doc_id", "run_id").agg(
        (F.max("win_idx") - F.min("win_idx") + w).alias("covered"),
        F.count(F.lit(1)).alias("n_win"),
    )
    per_doc = per_run.groupBy("doc_id").agg(
        F.sum("n_win").alias("n_dup_windows"),
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum("covered").alias("dup_tokens"),
    )
    return (
        base.select("doc_id", "n_tokens", F.size("wh").alias("n_windows"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "n_windows",
            F.coalesce("n_dup_windows", F.lit(0)).cast("long").alias(
                "n_dup_windows"
            ),
            F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias(
                "n_dup_spans"
            ),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias(
                "dup_tokens"
            ),
            F.round(
                F.when(
                    F.col("n_tokens") > 0,
                    F.coalesce("dup_tokens", F.lit(0))
                    / F.col("n_tokens"),
                ).otherwise(F.lit(0.0)),
                9,
            ).alias("dup_frac"),
        )
    )


def pii_table(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic PII fixture derived from `documents` (the synthetic
    corpus contains no PII, so — like tagweights.html_table — the
    fixture INJECTS it reproducibly in both engines): each doc's text
    gains a contact line with an email, an IPv4 and a phone number that
    are pure functions of doc_id."""
    return documents.selectExpr(
        f"{id_col} AS doc_id",
        f"{text_col} || ' contact user' || CAST({id_col} AS STRING) || "
        f"'@example.com at 10.' || CAST({id_col} % 256 AS STRING) || "
        f"'.' || CAST(({id_col} div 256) % 256 AS STRING) || "
        f"'.7 or +1-555-' || lpad(CAST({id_col} % 10000 AS STRING), 4, '0')"
        f" AS text",
    )


def pii_scrub(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_emails, n_ips, n_phones, clean_md5) — count and redact
    PII spans (email → <EMAIL>, IPv4 → <IP>, phone → <PHONE>, applied
    in that fixed order) and fingerprint the scrubbed text. Pure
    projection — no shuffle, codegen'd, linear at any scale."""
    t = F.col(text_col)
    clean = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    clean = F.regexp_replace(clean, IPV4_RE, "<IP>")
    clean = F.regexp_replace(clean, PHONE_RE, "<PHONE>")
    return documents.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0))).alias(
            "n_emails"
        ),
        F.size(
            F.regexp_extract_all(
                F.regexp_replace(t, EMAIL_RE, "<EMAIL>"),
                F.lit(IPV4_RE),
                F.lit(0),
            )
        ).alias("n_ips"),
        F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), F.lit(0))).alias(
            "n_phones"
        ),
        F.md5(clean).alias("clean_md5"),
    )


def pack_sequences(
    documents: DataFrame,
    seq_len: int = 512,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, shard, n_tokens, tok_offset, first_seq, last_seq) — the
    concat-and-chunk training-sequence mapping: within a shard,
    documents are laid end-to-end in doc_id order; tok_offset is the
    running token count before this doc, and first_seq/last_seq are the
    seq_len-sized training-sequence indices its tokens fall into
    (a doc may span several). Empty docs occupy no tokens and map to
    the sequence at their offset.

    Scale shape: ONE window per shard — shards (here the source column;
    a production corpus uses O(10·executors) shards) are the unit of
    data parallelism, which is exactly why real packers work per shard
    instead of imposing a global document order."""
    toks = tokens_sql(text_col)
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sized = documents.selectExpr(
        f"{id_col} AS doc_id",
        f"{shard_col} AS shard",
        f"size({toks}) AS n_tokens",
    )
    return (
        sized.withColumn(
            "tok_offset",
            (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long"),
        )
        .withColumn(
            "first_seq", F.floor(F.col("tok_offset") / seq_len).cast("long")
        )
        .withColumn(
            "last_seq",
            F.floor(
                (
                    F.col("tok_offset")
                    + F.greatest(F.col("n_tokens"), F.lit(1))
                    - 1
                )
                / seq_len
            ).cast("long"),
        )
        .select(
            "doc_id", "shard", "n_tokens", "tok_offset", "first_seq",
            "last_seq",
        )
    )


def chunk_text(
    documents: DataFrame,
    win: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, start_tok, n_tok, chunk_hash) — overlapping fixed-width
    token windows per document: chunk starts at 0, stride, 2·stride, …
    while a full `win`-token window fits, plus one tail window ending
    exactly at the last token when the stride doesn't align (so no text
    is dropped and every chunk except a short-doc's single chunk has
    exactly `win` tokens). The RAG/pretraining "chunk with overlap"
    primitive — distinct from pack_sequences (which packs whole docs
    into a global token stream, no overlap, no per-doc windows).

    Per-row projection + explode, no shuffle at all: scales linearly
    and stays in whole-stage codegen (the window starts are a sequence()
    over two ints; the slice/join/md5 are built-in Column exprs).
    Zero-token documents produce no chunks.

    Beyond-reference curation operator (SURVEY §2.11 family); the
    chunk_hash (md5 of the space-joined window) makes the output
    value-comparable in DuckDB and doubles as the chunk-level dedup key
    downstream."""
    if not (0 < stride <= win):
        raise ValueError("chunk_text: require 0 < stride <= win")
    toks = tokens_sql(text_col)
    starts = (
        f"array_distinct(concat(transform("
        f"sequence(0, CAST(floor(greatest(size(tl) - {win}, 0) / {stride}) AS INT)), "
        f"i -> i * {stride}), array(greatest(size(tl) - {win}, 0))))"
    )
    return (
        documents.selectExpr(f"{id_col} AS doc_id", f"{toks} AS tl")
        .filter(F.expr("size(tl) > 0"))
        .selectExpr("doc_id", "tl", f"explode({starts}) AS start_tok")
        .selectExpr(
            "doc_id",
            "CAST(start_tok AS INT) AS start_tok",
            f"CAST(least({win}, size(tl) - start_tok) AS INT) AS n_tok",
            f"md5(array_join(slice(tl, start_tok + 1, {win}), ' ')) AS chunk_hash",
        )
    )


def export_jsonl(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
) -> dict:
    """Training-data hand-off sink: write `df` as `n_shards` JSONL
    shards with DETERMINISTIC id→shard routing (pmod of the 60-bit md5
    of the id — the sampling family's h60), plus a `manifest.json`
    recording per-shard row counts and the total.

    Determinism is the point: a re-run (or a retried failed stage)
    produces byte-stable shard MEMBERSHIP, so downstream training jobs
    can cache/resume against shard identities. Within a shard, JSONL
    line order is not guaranteed (it is a parallel write); consumers
    that need order sort by id.

    Scale: one hash repartition to exactly n_shards writers, each
    streaming its partition — no driver-side data; the manifest is one
    tiny aggregate.
    """
    import json as _json
    import os as _os

    from searchengine_spark.operators.sampling import h60_col

    sharded = df.withColumn(
        "_shard", F.pmod(h60_col(f"CAST({id_col} AS STRING)"), F.lit(n_shards))
    )
    counts = {
        int(r["_shard"]): int(r["n"])
        for r in sharded.groupBy("_shard").agg(F.count("*").alias("n")).collect()
    }
    (
        sharded.repartition(n_shards, "_shard")
        .select(F.to_json(F.struct(*[c for c in df.columns])).alias("line"), "_shard")
        .write.mode("overwrite")
        .partitionBy("_shard")
        .text(path)
    )
    manifest = {
        "n_shards": n_shards,
        "total_rows": int(sum(counts.values())),
        "shard_rows": {str(k): counts.get(k, 0) for k in range(n_shards)},
        "columns": list(df.columns),
    }
    with open(_os.path.join(path, "manifest.json"), "w", encoding="utf-8") as fh:
        _json.dump(manifest, fh, indent=1, sort_keys=True)
    return manifest


def read_jsonl_export(spark, path: str, schema: str) -> DataFrame:
    """Read back an export_jsonl dataset: text scan over the shard
    directories + from_json with the caller's schema (schema-on-read,
    no inference pass)."""
    lines = spark.read.text(path + "/_shard=*/part-*")
    return lines.select(F.from_json("value", schema).alias("r")).select("r.*")


def curate(
    documents: DataFrame,
    quality_threshold: float = 0.4,
    jaccard_threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, status, quality) — the END-TO-END curation pipeline
    composed from the suite's own operators, one status per document:

        exact_dup    — not the min-doc_id representative of its
                       identical-bytes (md5) group
        near_dup     — exact-unique, but not the keep_best
                       (highest-quality, tie → min doc_id)
                       representative of its n-gram-Jaccard
                       near-duplicate cluster
        low_quality  — survived both dedups, quality < threshold
        kept         — in the final training corpus

    The stage ORDER is the standard pipeline order (dedup before
    quality: a duplicate is a duplicate regardless of score; the
    near-dup retention then picks the best-quality copy among
    exact-unique members, so a low-quality cluster's keeper can still
    fall to the quality gate). Pure composition: exact_dedup (one md5
    hash-groupBy) → dup_clusters ∘ ngram_dup_pairs (prefix-filtered,
    sub-quadratic) → keep_best (max(struct) partial agg) →
    quality_scores (pure projection); every stage keeps its own scale
    shape, and the status CASE is two broadcast-class joins over
    narrow (doc_id, flag) frames.
    """
    from searchengine_spark.operators.dedup import (
        dup_clusters,
        exact_dedup,
        keep_best,
        ngram_dup_pairs,
    )
    from searchengine_spark.operators.textstats import quality_scores

    md5s = documents.selectExpr(
        f"{id_col} AS doc_id", f"md5({text_col}) AS text_md5"
    )
    ex = exact_dedup(documents, id_col, text_col)
    flags = md5s.join(ex, "text_md5").select(
        "doc_id", (F.col("doc_id") == F.col("keep_id")).alias("exact_keeper")
    )
    clusters = dup_clusters(
        ngram_dup_pairs(documents, jaccard_threshold), documents
    )
    q = quality_scores(documents, id_col, text_col).select(
        "doc_id", F.round("quality", 9).alias("q")
    )
    surv = flags.filter("exact_keeper").select("doc_id")
    kb = keep_best(clusters.join(surv, "doc_id"), q, quality_col="q")
    keepers = kb.select(
        F.col("kept_doc_id").alias("doc_id"), F.lit(True).alias("near_keeper")
    )
    return (
        flags.join(keepers, "doc_id", "left")
        .join(q, "doc_id")
        .selectExpr(
            "doc_id",
            "CASE WHEN NOT exact_keeper THEN 'exact_dup' "
            "WHEN near_keeper IS NULL THEN 'near_dup' "
            f"WHEN q < {quality_threshold!r}D THEN 'low_quality' "
            "ELSE 'kept' END AS status",
            "q AS quality",
        )
    )


# ---- content-defined chunking ------------------------------------------


def cdc_chunks(
    documents: DataFrame,
    w: int = 4,
    divisor: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_ix, n_tokens, chunk_md5) — token-level
    content-defined chunking: a chunk boundary falls AFTER token i
    whenever the rolling w-token window hash satisfies
    h(t_{i-w+1..i}) % divisor == 0 (the Rabin/FastCDC boundary rule,
    public spec, applied at token granularity). Expected chunk length
    ≈ divisor tokens.

    This is the storage-dedup primitive fixed-size blocks can't give:
    inserting a token early in a page shifts every downstream
    fixed-size block, but CDC boundaries depend only on LOCAL window
    content, so chunk identity re-synchronizes within ~w tokens and a
    recrawl's unchanged tail deduplicates against the previous
    generation (tested: a head-insert changes O(1) chunks). Pair the
    chunk_md5 census with exact_dedup for generation-spanning storage
    dedup of WARC text.

    Scale shape (100 TB): boundary detection, chunk assignment and
    chunk hashing are ALL per-row array expressions (transform /
    filter / slice over the token list) — zero shuffle, codegen'd,
    embarrassingly parallel; only the per-chunk output rows (corpus
    tokens / divisor) ever leave the row. The rolling hash reuses the
    repo's md5-60bit idiom (winnow.py), so the DuckDB oracle is
    bit-exact."""
    toks = tokens_sql(text_col)
    # Chunk starts as ONE aggregate fold: a boundary falls after token
    # i (0-based, i >= w-1, never the last position) when the window
    # hash divides; the fold evaluates the md5 ONCE per position.
    # Catalyst's CollapseProject inlines a chained projection's alias
    # into EVERY downstream reference — the first version of this
    # operator referenced `starts` once per chunk and re-ran the whole
    # per-position hashing O(chunks) times (measured 33.9 s at sf0.1);
    # this shape references `starts` exactly twice (the zip and the
    # shifted tail), so the hashing work is bounded at 2x regardless
    # of the plan collapse (re-measured ~2 s).
    h = (
        f"CAST(conv(substring(md5(array_join(slice(ts, i - {w} + 2, {w}), "
        f"' ')), 1, 15), 16, 10) AS BIGINT)"
    )
    starts_agg = (
        f"aggregate(sequence(0, size(ts) - 1), array(0), (acc, i) -> "
        f"IF(i >= {w} - 1 AND i < size(ts) - 1 AND {h} % {divisor} = 0, "
        f"concat(acc, array(i + 1)), acc))"
    )
    return (
        documents.selectExpr(f"{id_col} AS doc_id", f"{toks} AS ts")
        .where("size(ts) > 0")
        .selectExpr("doc_id", "ts", f"{starts_agg} AS starts")
        .selectExpr(
            "doc_id",
            "ts",
            "starts",
            "concat(slice(starts, 2, size(starts) - 1), array(size(ts)))"
            " AS nexts",
        )
        .selectExpr(
            "doc_id", "ts", "arrays_zip(starts, nexts) AS bounds"
        )
        .selectExpr(
            "doc_id",
            "posexplode(transform(bounds, b -> struct("
            "CAST(b.nexts - b.starts AS BIGINT) AS n_tokens, "
            "md5(array_join(slice(ts, b.starts + 1, b.nexts - b.starts), "
            "' ')) AS chunk_md5))) AS (chunk_ix, ch)",
        )
        .selectExpr(
            "doc_id",
            "CAST(chunk_ix AS BIGINT) AS chunk_ix",
            "ch.n_tokens AS n_tokens",
            "ch.chunk_md5 AS chunk_md5",
        )
    )


def novelty_scores(
    documents: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_grams, n_novel, novelty) — corpus-order novelty: the
    fraction of a document's DISTINCT n-grams whose FIRST corpus
    appearance (minimum doc_id) is this document. The incremental-
    crawl signal behind "is this capture adding anything": recrawled
    boilerplate scores ~0, genuinely new text ~1 (the per-doc
    aggregate view of the exact_substr duplicated-span census).

    Exact integers end to end (min/count aggregates + one ratio).
    Scale shape: one gram explode → ONE min-aggregate on the gram key
    (map-side combined) → join back on the same key (exchange reuse)
    → per-doc counts. Zero-gram docs (shorter than n tokens) report
    (0, 0, 0.0)."""
    toks = tokens_sql(text_col)
    grams = (
        documents.selectExpr(
            f"{id_col} AS doc_id", f"{_sliding_grams(toks, n)} AS grams"
        )
        .select("doc_id", F.explode("grams").alias("gram"))
        .distinct()
    )
    first = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    per = (
        grams.join(first, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
    )
    return (
        documents.selectExpr(f"{id_col} AS doc_id")
        .join(per, "doc_id", "left")
        .selectExpr(
            "doc_id",
            "coalesce(n_grams, 0L) AS n_grams",
            "coalesce(n_novel, 0L) AS n_novel",
            "CASE WHEN n_grams IS NULL OR n_grams = 0 THEN CAST(0.0 AS DOUBLE)"
            " ELSE CAST(n_novel AS DOUBLE) / CAST(n_grams AS DOUBLE) END"
            " AS novelty",
        )
    )


def packing_waste(
    documents: DataFrame,
    seq_len: int = 512,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(shard, n_docs, total_tokens, concat_seqs, padded_seqs,
    seqs_saved) — WHY sequence packing exists, as exact integers: the
    concat-and-chunk layout (pack_sequences) needs
    ceil(total/seq_len) sequences per shard, while the naive
    one-doc-per-sequence-block padding layout needs
    Σ ceil(doc_len/seq_len); the difference is the training compute
    the packer saves. Pure aggregation over per-doc token counts —
    one projection + one groupBy(shard), no window (the packer itself
    needs the offsets; the WASTE census does not).
    """
    toks = tokens_sql(text_col)
    per_doc = documents.selectExpr(
        f"{shard_col} AS shard",
        f"size({toks}) AS n_tokens",
    ).withColumn("n_tokens", F.greatest(F.col("n_tokens"), F.lit(0)))
    return (
        per_doc.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum(
                F.expr(
                    f"CAST(ceil(n_tokens / {seq_len}.0) AS BIGINT)"
                )
            ).alias("padded_seqs"),
        )
        .selectExpr(
            "shard",
            "n_docs",
            "total_tokens",
            f"CAST(ceil(total_tokens / {seq_len}.0) AS BIGINT)"
            " AS concat_seqs",
            "padded_seqs",
            f"padded_seqs - CAST(ceil(total_tokens / {seq_len}.0) AS BIGINT)"
            " AS seqs_saved",
        )
    )
