"""Drive the crawler end-to-end: N frontier rounds on the synthetic
pages table, per-round metrics, then a kill + resume mid-crawl, and a
final parity check against the single-node oracle.

Usage: python tools/crawl_demo.py [n_pages] [max_rounds]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from searchengine_spark.crawler import frontier as FR
from searchengine_spark.crawler import oracle as O
from searchengine_spark.crawler.config import CrawlConfig
from searchengine_spark.crawler.synth import ALLOWED_HOST_RE, gen_corpus, pages_df
from searchengine_spark.crawler.tableio import TableIO
from searchengine_spark.session import get_spark


def main() -> int:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    max_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark(
        "crawl-demo",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    rows, robots_rows, seeds = gen_corpus(n_pages, 42)
    pages, robots = O.corpus_dicts(rows, robots_rows)
    cfg = CrawlConfig(seeds=seeds, allowed_host_re=ALLOWED_HOST_RE)
    pdf, rdf, _ = pages_df(spark, n_pages, 42)

    wh = tempfile.mkdtemp(prefix="crawldemo-")
    io = TableIO(spark, wh)
    # run 2 rounds, "crash", reopen and resume to the end
    FR.crawl(spark, io, cfg, pdf, rdf, max_rounds=2)
    print(f"-- killed after round {io.latest_round()}; resuming --")
    io2 = TableIO(spark, wh)
    io2.gc_orphans()
    FR.crawl(spark, io2, cfg, pdf, rdf, max_rounds=max_rounds)

    print("\nround metrics:")
    for r in io2.read("metrics").orderBy("round").collect():
        print(
            f"  r{r['round']:>2}: batch={r['batch_size']:<4} ok={r['fetched_ok']:<4}"
            f" err={r['errors']:<3} dup={r['dup_pages']:<3}"
            f" new={r['new_urls']:<4} queued={r['queued_remaining']}"
        )

    st = O.crawl_oracle(cfg, pages, robots, max_rounds=max_rounds)
    order_ok = FR.crawl_order(io2) == O.crawl_order_oracle(st)
    seen_ok = {
        r["canon_url"] for r in io2.read("url_seen").collect()
    } == st.seen
    print(f"\nparity vs oracle: crawl_order={order_ok} url_seen={seen_ok}")
    spark.stop()
    shutil.rmtree(wh, ignore_errors=True)
    return 0 if (order_ok and seen_ok) else 1


if __name__ == "__main__":
    sys.exit(main())
