"""Distributed multinomial Naive Bayes document classifier.

The "fasttext-style quality/domain classifier" slot of an LLM curation
pipeline (CCNet / GPT-3 / Llama pipelines all train a lightweight text
classifier to route documents): here the classic multinomial NB with
add-one smoothing, chosen over logistic regression deliberately —
training is PURE COUNTING (exact int64 aggregations, no float gradient
whose summation order varies with partitioning), and scoring is a
per-document sequential fold of per-row ln() terms, so the whole
operator is bit-reproducible and DuckDB-oracle-checkable (same
determinism discipline as textstats.lm_score).

    score(d, c) = ln P(c) + Σ_i ln( (count(w_i, c) + 1)
                                    / (tokens_c + V) )

Self-contained split: docs with doc_id % train_mod == 0 train the
model, every other doc is scored and argmax-classified — so the
operator doubles as its own evaluation harness (the `correct` column
feeds an accuracy rollup).

Scale shape: the (token, class) count table is ONE map-side-combined
groupBy over the exploded train split. The class dimension (priors,
per-class token totals — a handful of rows) broadcasts. Scoring
explodes test tokens ONCE, crossJoins the tiny class dim (k rows — a
broadcast nested loop over k, not a shuffle), LEFT-joins the count
table on (token, label) so unseen tokens fall to the +1 smoothing
floor, folds per (doc, class) in position order, and argmaxes with
max(struct(score, label)) — a partial-aggregable reduction, no window
over the corpus. Ties (identical float scores) resolve to the
lexicographically LARGEST label on both engines by the struct
ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searchengine_spark.functions.text import tokens_sql


def nb_classify(
    documents: DataFrame,
    label_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    train_mod: int = 2,
) -> DataFrame:
    """(doc_id, label, predicted, score, correct) for every doc with
    doc_id % train_mod != 0, scored by the NB model trained on the
    doc_id % train_mod == 0 split. `score` is the winning class's
    ln-posterior (up to the constant evidence term), rounded to 9."""
    toks = tokens_sql(text_col)
    base = documents.selectExpr(
        f"{id_col} AS doc_id", f"{label_col} AS label", f"{toks} AS tl"
    )
    train = base.filter(F.col("doc_id") % train_mod == 0)
    test = base.filter(F.col("doc_id") % train_mod != 0)

    tr_tok = train.select(
        "label", F.explode("tl").alias("token")
    )
    # (token, class) counts — the model weights; exact ints
    cwc = tr_tok.groupBy("token", "label").agg(
        F.count(F.lit(1)).alias("cwc")
    )
    # vocabulary = distinct TRAIN tokens (the +V smoothing denominator)
    vocab_size = tr_tok.select("token").distinct().count()
    n_train = train.count()
    # per-class dimension: doc prior + token total (k rows — broadcast)
    cls = (
        train.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .join(
            tr_tok.groupBy("label").agg(
                F.count(F.lit(1)).alias("tok_c")
            ),
            "label",
            "left",
        )
        .selectExpr(
            "label AS cls",
            f"ln(CAST(n_docs AS DOUBLE) / {float(n_train)!r}D) AS lnprior",
            "CAST(coalesce(tok_c, 0L) AS DOUBLE) AS tokc",
        )
    )

    tt = test.select(
        "doc_id", F.posexplode("tl").alias("pos", "token")
    )
    scored = (
        tt.crossJoin(F.broadcast(cls))
        .join(cwc, (tt["token"] == cwc["token"]) & (F.col("cls") == cwc["label"]), "left")
        .selectExpr(
            "doc_id",
            "pos",
            "cls",
            f"ln((CAST(coalesce(cwc, 0L) AS DOUBLE) + 1.0D) / "
            f"(tokc + {float(vocab_size)!r}D)) AS logp",
        )
    )
    per_class = scored.groupBy("doc_id", "cls").agg(
        F.expr(
            "aggregate(sort_array(collect_list(struct(pos, logp))), "
            "CAST(0.0 AS DOUBLE), (a, s) -> a + s.logp)"
        ).alias("s")
    )
    # empty-token test docs score prior-only for every class
    all_pairs = test.select("doc_id").crossJoin(F.broadcast(cls))
    best = (
        all_pairs.join(per_class, ["doc_id", "cls"], "left")
        .select(
            "doc_id",
            F.struct(
                (F.coalesce(F.col("s"), F.lit(0.0)) + F.col("lnprior")).alias(
                    "score"
                ),
                F.col("cls").alias("predicted"),
            ).alias("sc"),
        )
        .groupBy("doc_id")
        .agg(F.max("sc").alias("best"))
    )
    return (
        test.select("doc_id", "label")
        .join(best, "doc_id")
        .select(
            "doc_id",
            "label",
            F.col("best.predicted").alias("predicted"),
            F.round(F.col("best.score"), 9).alias("score"),
            (F.col("best.predicted") == F.col("label")).alias("correct"),
        )
    )


def nb_accuracy(classified: DataFrame) -> DataFrame:
    """(label, n, n_correct, accuracy) — per-true-class rollup of
    nb_classify output (one map-side-combined groupBy)."""
    return classified.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("correct").cast("long")).alias("n_correct"),
        F.round(
            F.sum(F.col("correct").cast("long")) / F.count(F.lit(1)), 9
        ).alias("accuracy"),
    )
