"""spark-submit deploy-surface smoke for jobs/crawl_job.py — the north
rule's ship path, end to end: build the --py-files zip with
tools/package.py, launch a REAL spark-submit subprocess (so the package
is imported from the zip, not the repo checkout), crawl a few rounds,
then resume the same warehouse in a second submit and assert the round
counter advanced (ST4 resume semantics across process boundaries)."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


def _submit(zip_path: str, *job_args: str) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    # the zip must be the ONLY import path for the package — prove the
    # artifact is self-contained
    env.pop("PYTHONPATH", None)
    return subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(ROOT, "jobs", "crawl_job.py"),
            *job_args,
        ],
        cwd=tempfile.gettempdir(),  # NOT the repo root
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_submit_crawl_and_resume(tmp_path):
    sys.path.insert(0, ROOT)
    from tools.package import build

    zip_path = build(str(tmp_path / "dist" / "searchengine_spark.zip"))
    wh = str(tmp_path / "wh")

    r1 = _submit(
        zip_path, "--warehouse", wh, "--synth-pages", "300",
        "--rounds", "2", "--partitions", "8", "--salts", "4",
    )
    assert r1.returncode == 0, r1.stderr[-3000:]

    # the warehouse committed rounds 0..2
    from searchengine_spark.crawler.tableio import TableIO

    from searchengine_spark.session import get_spark

    spark = get_spark(
        "submit-check", master="local[4]", shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    io = TableIO(spark, wh)
    after_first = io.latest_round()
    assert after_first >= 1
    n_fetched_first = (
        io.read("frontier").filter("round_fetched >= 0").count()
    )
    assert n_fetched_first > 0

    # second submit on the SAME warehouse resumes (no --restart) and
    # advances the committed round counter (--rounds is the ABSOLUTE
    # round ceiling, so the resume gets a higher one)
    r2 = _submit(
        zip_path, "--warehouse", wh, "--synth-pages", "300",
        "--rounds", "4", "--partitions", "8", "--salts", "4",
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    after_second = TableIO(spark, wh).latest_round()
    assert after_second > after_first
