"""Change-rate estimation for recrawl scheduling (Cho & Garcia-Molina).

Engine extension past the reference crawler (which crawls each URL
once per run; `/root/reference/crawler.py` keeps only a boolean seen
set): a production frontier must also decide *when to come back*.
This operator turns a capture history — (url, ts, fingerprint) rows,
the natural shape of a multi-capture Common-Crawl-style corpus — into
a per-URL Poisson change-rate estimate and a suggested recrawl
interval, the standard scheduler input (Cho & Garcia-Molina, "Estimating
frequency of change", ACM TOIT 2003; the bias-reduced estimator
``r = -ln((n - X + 0.5) / (n + 0.5))`` from §4.2, where n = number of
successive-capture comparisons and X = how many showed a changed
fingerprint).

Scale design:
  * one ``lag`` window partitioned BY URL (never a global window) to
    flag changed captures, then one groupBy(url) — a single shuffle
    on the natural key, map-side partial agg on the way in;
  * capture payloads never move: the caller passes a fingerprint
    column (md5/simhash of the extracted text), so shuffle rows are
    (url, ts_us, fp) triples regardless of page size;
  * output is one row per URL — the frontier joins it back on the
    url key it is already partitioned by.

Float parity: ln-of-ratio with e-notation double literals and
identical expression shape on both engines (proven recipe — see
BENCH/BASELINE.md float-parity notes); timestamps compared in integer
microseconds (``unix_micros`` / ``epoch_us``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: one hour / one year, in days — default clamp for the suggested
#: recrawl interval (a URL that never changed in-sample estimates
#: lambda = 0; the clamp keeps the scheduler total).
MIN_DAYS_EXPR = "1.0e0 / 24"
MAX_DAYS_EXPR = "365.0e0"


def change_rate(
    captures: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    fp_col: str = "fp",
    id_col: str | None = None,
) -> DataFrame:
    """Per-URL change-rate estimate from a multi-capture history.

    Input: one row per capture with a content fingerprint. ``id_col``
    (optional) totalises the capture order under equal timestamps —
    pass it whenever ts ties are possible, otherwise lag() order (and
    hence X) is nondeterministic.

    Output (urls with >= 2 captures only): ``url``, ``n_caps``,
    ``n_changed`` (successive-capture comparisons that differed),
    ``gap_days`` (mean inter-capture gap), ``lambda_day`` (estimated
    changes/day), ``recrawl_days`` (1/lambda clamped to
    [1 hour, 365 days]; the clamp ceiling when nothing ever changed
    or all captures share one timestamp).
    """
    order = [F.col(ts_col).asc()]
    if id_col is not None:
        order.append(F.col(id_col).asc())
    w = Window.partitionBy(url_col).orderBy(*order)
    prev = F.lag(F.col(fp_col)).over(w)
    flagged = captures.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("cap_ts"),
        F.when(prev.isNotNull() & (F.col(fp_col) != prev), F.lit(1))
        .otherwise(F.lit(0))
        .alias("chg"),
    )
    agg = (
        flagged.groupBy("url")
        .agg(
            F.count(F.lit(1)).alias("n_caps"),
            F.sum("chg").alias("n_changed"),
            F.min("cap_ts").alias("first_ts"),
            F.max("cap_ts").alias("last_ts"),
        )
        .where(F.col("n_caps") >= 2)
        # integer microseconds, timezone-independent (works on both
        # TIMESTAMP and TIMESTAMP_NTZ capture columns)
        .selectExpr(
            "url",
            "n_caps",
            "n_changed",
            "timestampdiff(MICROSECOND, first_ts, last_ts) AS span_us",
        )
    )
    # identical expression shape to the DuckDB oracle (ln of a ratio
    # of half-offset counts; plain IEEE division chain afterwards)
    return agg.selectExpr(
        "url",
        "n_caps",
        "n_changed",
        "CAST(span_us AS DOUBLE) / CAST(n_caps - 1 AS DOUBLE)"
        " / 86400.0e6 AS gap_days",
        "-ln((CAST(n_caps - 1 - n_changed AS DOUBLE) + 0.5e0)"
        " / (CAST(n_caps - 1 AS DOUBLE) + 0.5e0)) AS r_hat",
    ).selectExpr(
        "url",
        "n_caps",
        "n_changed",
        "gap_days",
        "CASE WHEN gap_days > 0.0e0 THEN r_hat / gap_days"
        " ELSE 0.0e0 END AS lambda_day",
    ).selectExpr(
        "url",
        "n_caps",
        "n_changed",
        "gap_days",
        "lambda_day",
        f"CASE WHEN lambda_day <= 0.0e0 THEN {MAX_DAYS_EXPR}"
        f" ELSE least({MAX_DAYS_EXPR},"
        f" greatest({MIN_DAYS_EXPR}, 1.0e0 / lambda_day))"
        " END AS recrawl_days",
    )


def crawl_delta(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    fp_col: str = "fp",
) -> DataFrame:
    """(url, status) — crawl-over-crawl diff of two capture sets by
    content fingerprint: 'added' (new only), 'removed' (old only),
    'changed' (both, fingerprint differs), 'same'. The generation
    comparison every production recrawl loop reports before deciding
    budgets (pairs with change_rate, which estimates the per-URL rate
    from many generations; this is the two-generation census).

    ONE full-outer join on the url key — both sides shuffle on url
    (the key the snapshot store already partitions by), statuses are
    pure projections."""
    o = old.select(
        F.col(url_col).alias("url"), F.col(fp_col).alias("fp_old")
    )
    n = new.select(
        F.col(url_col).alias("url"), F.col(fp_col).alias("fp_new")
    )
    return o.join(n, "url", "full_outer").select(
        "url",
        F.when(F.col("fp_old").isNull(), F.lit("added"))
        .when(F.col("fp_new").isNull(), F.lit("removed"))
        .when(F.col("fp_old") != F.col("fp_new"), F.lit("changed"))
        .otherwise(F.lit("same"))
        .alias("status"),
    )


def delta_census(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    fp_col: str = "fp",
) -> DataFrame:
    """(host, status, n_urls) — crawl_delta rolled up per host: the
    operational dashboard row ('host X churned 40% this generation').
    Host extraction is a JVM parse_url projection; one groupBy over
    the delta frame."""
    d = crawl_delta(old, new, url_col, fp_col)
    return (
        d.select(
            F.lower(F.parse_url(F.col("url"), F.lit("HOST"))).alias("host"),
            "status",
        )
        .groupBy("host", "status")
        .agg(F.count("*").alias("n_urls"))
    )


def revisit_resolve(
    captures: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    digest_col: str = "digest",
    id_col: str = "capture_id",
) -> DataFrame:
    """Per capture (url, capture_id, is_revisit, original_id): WARC
    revisit-record resolution — the Common-Crawl storage dedup where a
    re-fetch whose payload digest matches an EARLIER capture of the
    same url is stored as a pointer (WARC/1.1 'revisit' record,
    profile identical-payload-digest) instead of a second body. This
    operator computes that resolution for a capture log: the first
    capture of each (url, digest) in (ts, id) order is the original;
    every later equal-digest capture is a revisit pointing at it.

    The inverse direction (expanding revisits back to payloads when
    READING an archive) is the same join — original_id is the lookup
    key — so one operator serves both the writer and the reader side.

    Scale shape: ONE max/min(struct)-style partial aggregation per
    (url, digest) — no window, so a URL captured millions of times
    never funnels through a single task's sort — plus the join back on
    the same key the agg just shuffled (AQE reuses the exchange).
    Deterministic: (ts, id) is a total order (id totalises equal
    timestamps), so 'first' is unambiguous in every engine.
    """
    u, t, g, i = url_col, ts_col, digest_col, id_col
    firsts = captures.groupBy(u, g).agg(
        F.min(F.struct(F.col(t), F.col(i))).alias("f")
    )
    return (
        captures.join(firsts, [u, g])
        .select(
            F.col(u).alias("url"),
            F.col(i).alias("capture_id"),
            (F.struct(F.col(t), F.col(i)) != F.col("f")).alias(
                "is_revisit"
            ),
            F.col(f"f.{i}").alias("original_id"),
        )
    )
