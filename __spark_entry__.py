"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship ranked boolean query over an inverted index
built end-to-end from sf0.001 documents (SURVEY.md §7 Phase 1 slice).

``queries()`` / ``oracle_sql()`` — one named query per implemented
operator of SURVEY.md §2, each with a DuckDB-equivalent ANSI-SQL oracle.
Float columns are rounded to 9 decimals on BOTH sides so the driver's
value-hash compares bit-stable doubles (all underlying arithmetic is
int-ratio division, ln, and products — identical IEEE754 in both
engines; rounding guards the last ulp).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from searchengine_spark.operators import query as Q
from searchengine_spark.operators import tfidf as TF


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TF.build_postings(_docs(spark, sf_dir))


def _r(df: DataFrame, *float_cols: str) -> DataFrame:
    out = df
    for c in float_cols:
        out = out.withColumn(c, F.round(F.col(c), 9))
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the tf-idf index on sf0.001 and answer a ranked
    DNF boolean query (reference E1+E2 lifecycles in one lazy DAG)."""
    postings = _postings(spark, "/root/testdata/sf0.001")
    return Q.search(postings, "spark AND window OR dup", k=5)


# --------------------------------------------------------------------------
# DuckDB-side normative tokenization (mirrors functions/text.py:tokens_sql —
# lowercase, split on [^a-z0-9'], trim " '", drop empty & >10000 chars) and
# tf/df/idf CTEs (SURVEY.md §2 A1-A5; reference helpers.py:21-27,
# index_construction.py:183-204).
# --------------------------------------------------------------------------

_DUCK_TOKENS = """
tok AS (
  SELECT doc_id, trim(t, ' ''') AS token
  FROM documents,
       unnest(regexp_split_to_array(lower(text), '[^a-z0-9'']+')) AS u(t)
),
tok2 AS (
  SELECT doc_id, token FROM tok WHERE token <> '' AND length(token) <= 10000
),
tf AS (
  SELECT doc_id, token,
         CAST(count(*) AS DOUBLE)
           / CAST(sum(count(*)) OVER (PARTITION BY doc_id) AS DOUBLE) AS tf
  FROM tok2 GROUP BY doc_id, token
),
ndocs AS (SELECT count(DISTINCT doc_id) AS n FROM tok2),
dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
idf AS (
  SELECT token, ln(CAST((SELECT n FROM ndocs) AS DOUBLE) / CAST(df AS DOUBLE)) AS idf
  FROM dfreq
),
postings AS (
  SELECT tf.doc_id, tf.token, tf.tf, idf.idf, tf.tf * idf.idf AS tf_idf
  FROM tf JOIN idf USING (token)
)
"""

_AND_TERMS = ["spark", "window", "dup"]
_DNF = [["spark", "dup"], ["fast", "the"]]


def _duck_and(terms: list[str]) -> str:
    uniq = sorted(set(terms))
    inlist = ", ".join(f"'{t}'" for t in uniq)
    return f"""
hits AS (
  SELECT doc_id FROM postings WHERE token IN ({inlist})
  GROUP BY doc_id HAVING count(DISTINCT token) = {len(uniq)}
),
andq AS (
  SELECT p.doc_id, p.tf_idf FROM postings p JOIN hits USING (doc_id)
  WHERE p.token = '{terms[0]}'
)
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def q_tf(spark, sf):
        return _r(
            TF.term_frequencies(TF.doc_tokens(_docs(spark, sf))), "tf"
        )

    def q_doc_freq(spark, sf):
        return TF.doc_frequencies(
            TF.term_frequencies(TF.doc_tokens(_docs(spark, sf)))
        )

    def q_idf(spark, sf):
        toks = TF.doc_tokens(_docs(spark, sf))
        tf = TF.term_frequencies(toks)
        n = toks.filter(F.col("n_terms") > 0).count()
        return _r(TF.idf_table(TF.doc_frequencies(tf), n), "idf")

    def q_postings(spark, sf):
        return _r(_postings(spark, sf), "tf", "idf", "tf_idf")

    def q_and(spark, sf):
        return _r(Q.and_query(_postings(spark, sf), _AND_TERMS), "tf_idf")

    def q_dnf(spark, sf):
        return _r(Q.dnf_query(_postings(spark, sf), _DNF), "tf_idf")

    def q_topk(spark, sf):
        return _r(
            Q.rank_topk(Q.dnf_query(_postings(spark, sf), _DNF), 5), "tf_idf"
        )

    def q_analytics(spark, sf):
        return TF.index_analytics(_postings(spark, sf))

    def q_window_quota(spark, sf):
        # T3 analog on events: per-partition ordered quota slice
        from pyspark.sql import Window

        ev = spark.read.parquet(os.path.join(sf, "events.parquet"))
        w = Window.partitionBy("event_type").orderBy(
            F.col("value").desc(), F.col("event_id").asc()
        )
        return (
            ev.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 5)
            .select(
                "event_type",
                "event_id",
                F.round(F.col("value"), 9).alias("value"),
                F.col("rk"),
            )
        )

    return {
        "tf": q_tf,
        "doc_freq": q_doc_freq,
        "idf": q_idf,
        "postings": q_postings,
        "and_query": q_and,
        "dnf_query": q_dnf,
        "topk": q_topk,
        "index_analytics": q_analytics,
        "window_quota": q_window_quota,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "tf": f"WITH {_DUCK_TOKENS} SELECT doc_id, token, round(tf, 9) AS tf FROM tf",
        "doc_freq": f"WITH {_DUCK_TOKENS} SELECT token, df FROM dfreq",
        "idf": f"WITH {_DUCK_TOKENS} SELECT token, round(idf, 9) AS idf FROM idf",
        "postings": (
            f"WITH {_DUCK_TOKENS} SELECT doc_id, token, round(tf,9) AS tf, "
            "round(idf,9) AS idf, round(tf_idf,9) AS tf_idf FROM postings"
        ),
        "and_query": (
            f"WITH {_DUCK_TOKENS}, {_duck_and(_AND_TERMS)} "
            "SELECT doc_id, round(tf_idf,9) AS tf_idf FROM andq"
        ),
        "dnf_query": (
            f"WITH {_DUCK_TOKENS}, {_duck_and(_DNF[0])}, "
            + _duck_and(_DNF[1])
            .replace("hits AS", "hits2 AS")
            .replace("andq AS", "andq2 AS")
            .replace("JOIN hits USING", "JOIN hits2 USING")
            + """,
unioned AS (
  SELECT doc_id, tf_idf, 0 AS conj FROM andq
  UNION ALL
  SELECT doc_id, tf_idf, 1 AS conj FROM andq2
),
firstwin AS (
  SELECT doc_id, tf_idf,
         row_number() OVER (PARTITION BY doc_id ORDER BY conj) AS rn
  FROM unioned
)
SELECT doc_id, round(tf_idf,9) AS tf_idf FROM firstwin WHERE rn = 1"""
        ),
        "topk": (
            f"WITH {_DUCK_TOKENS}, {_duck_and(_DNF[0])}, "
            + _duck_and(_DNF[1])
            .replace("hits AS", "hits2 AS")
            .replace("andq AS", "andq2 AS")
            .replace("JOIN hits USING", "JOIN hits2 USING")
            + """,
unioned AS (
  SELECT doc_id, tf_idf, 0 AS conj FROM andq
  UNION ALL
  SELECT doc_id, tf_idf, 1 AS conj FROM andq2
),
firstwin AS (
  SELECT doc_id, tf_idf,
         row_number() OVER (PARTITION BY doc_id ORDER BY conj) AS rn
  FROM unioned
)
SELECT doc_id, round(tf_idf,9) AS tf_idf FROM firstwin WHERE rn = 1
ORDER BY tf_idf ASC, doc_id ASC LIMIT 5"""
        ),
        "index_analytics": (
            f"WITH {_DUCK_TOKENS} SELECT count(DISTINCT doc_id) AS n_docs, "
            "count(DISTINCT token) AS n_tokens, count(*) AS n_postings FROM postings"
        ),
        "window_quota": """
WITH ranked AS (
  SELECT event_type, event_id, value,
         row_number() OVER (
           PARTITION BY event_type ORDER BY value DESC, event_id ASC
         ) AS rk
  FROM events
)
SELECT event_type, event_id, round(value, 9) AS value, rk
FROM ranked WHERE rk <= 5""",
    }
