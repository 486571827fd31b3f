"""spark-submit entry: run (or resume) a crawl against a pages table.

    spark-submit --py-files dist/searchengine_spark.zip jobs/crawl_job.py \
        --warehouse /path/wh [--pages-table /path/pages.parquet] \
        [--synth-pages 2000] [--rounds 10] [--restart]

With --pages-table the job crawls a real Common-Crawl-style table
(url, warc_ts, html, text, lang); with --warc-dir the same table is
ingested straight from .warc/.warc.gz files (sources/warc.py — the
wire format Common Crawl actually ships). Robots + seeds then come
from --robots-table / --seeds. Without it, the deterministic synthetic corpus
stands in (sandbox mode). --restart = delete the warehouse and start
from the seed list (reference README.md:122-127 restart semantics);
otherwise the job resumes from the latest committed round (ST4).
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession

from searchengine_spark.crawler import frontier as FR
from searchengine_spark.crawler.config import CrawlConfig
from searchengine_spark.crawler.synth import ALLOWED_HOST_RE, pages_df
from searchengine_spark.crawler.tableio import TableIO


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--pages-table")
    ap.add_argument("--robots-table", help="pre-parsed (host, deny_prefixes, crawl_delay)")
    ap.add_argument(
        "--robots-txt-table",
        help="RAW (host, robots_txt) table — parsed via the RFC 9309 "
        "subset parser (functions/robots.py)",
    )
    ap.add_argument("--user-agent", default="*")
    ap.add_argument(
        "--sitemap-table",
        help="table with a sitemap_xml column — parsed into distributed "
        "priority-scored seeds (functions/sitemap.py) on first run",
    )
    ap.add_argument("--seeds", nargs="*")
    ap.add_argument("--synth-pages", type=int, default=2000)
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--salts", type=int, default=8)
    ap.add_argument("--politeness", type=float, default=0.5)
    ap.add_argument("--allowed-host-re", default=None)
    ap.add_argument("--restart", action="store_true")
    ap.add_argument(
        "--track-host-graph", action="store_true",
        help="stage per-round (src_host, dst_host, n) link edges",
    )
    ap.add_argument(
        "--recrawl-age", type=int, default=0,
        help="after crawling, requeue/prune FETCHED rows older than "
        "this many rounds (0 = off)",
    )
    ap.add_argument(
        "--recrawl-mode", choices=["requeue", "prune"], default="requeue",
        help="requeue = flip stale rows back to QUEUED; prune = drop "
        "them + expire from the seen backend (cuckoo only)",
    )
    ap.add_argument(
        "--seen-backend", choices=["bloom", "cuckoo"], default="bloom",
    )
    ap.add_argument(
        "--reseed", action="store_true",
        help="after crawling, PageRank the host graph and re-score the "
        "QUEUED frontier (requires --track-host-graph on this or a "
        "previous run)",
    )
    ap.add_argument(
        "--warc-dir",
        help="directory/glob of .warc / .warc.gz files — ingested via "
        "sources/warc.py (binaryFile scan, per-file record split, "
        "cc_pages projection) instead of --pages-table",
    )
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("searchengine-crawl").getOrCreate()
    if args.pages_table or args.warc_dir:
        if args.warc_dir:
            from searchengine_spark.sources.warc import cc_pages, read_warc

            pages = cc_pages(read_warc(spark, args.warc_dir))
        else:
            pages = spark.read.parquet(args.pages_table)
        if args.robots_txt_table:
            from searchengine_spark.functions.robots import robots_table

            robots = robots_table(
                spark.read.parquet(args.robots_txt_table), agent=args.user_agent
            )
        elif args.robots_table:
            robots = spark.read.parquet(args.robots_table)
        else:
            robots = None
        seeds = args.seeds or []
        host_re = args.allowed_host_re
    else:
        pages, robots, seeds = pages_df(spark, args.synth_pages, 42)
        host_re = args.allowed_host_re or ALLOWED_HOST_RE

    cfg = CrawlConfig(
        seeds=seeds,
        allowed_host_re=host_re,
        default_crawl_delay=args.politeness,
        n_salts=args.salts,
        n_partitions=args.partitions,
        track_host_graph=args.track_host_graph,
        seen_backend=args.seen_backend,
    )
    io = TableIO(spark, args.warehouse)
    if args.restart:
        io.destroy()
    else:
        io.gc_orphans()
    seeds_df = None
    if args.sitemap_table:
        from searchengine_spark.functions.sitemap import sitemap_seeds

        seeds_df = sitemap_seeds(spark.read.parquet(args.sitemap_table))
    last = FR.crawl(
        spark, io, cfg, pages, robots, max_rounds=args.rounds,
        seeds_df=seeds_df,
    )
    for r in io.read("metrics").orderBy("round").collect():
        print(
            f"round {r['round']}: batch={r['batch_size']} ok={r['fetched_ok']} "
            f"err={r['errors']} dup={r['dup_pages']} new={r['new_urls']} "
            f"queued={r['queued_remaining']}"
        )
    print(f"done at round {last}")
    if args.reseed:
        r = FR.reseed_frontier(spark, io, cfg)
        print(f"frontier reseeded by host rank at round {r}")
    if args.recrawl_age > 0:
        r = FR.recrawl_frontier(
            spark, io, cfg, args.recrawl_age, mode=args.recrawl_mode
        )
        print(f"recrawl ({args.recrawl_mode}) committed at round {r}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
