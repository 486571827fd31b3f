"""Build the spark-submit distribution: dist/searchengine_spark.zip.

The north rule ships the job via `spark-submit --py-files`; the zip holds
the pure-Python package (no data, no tests) and jobs/crawl_job.py is the
submit entry:

    python tools/package.py
    spark-submit --master local[32] \
        --py-files dist/searchengine_spark.zip \
        jobs/crawl_job.py --pages 2000 --rounds 4 --warehouse /tmp/crawl-wh

On a real cluster the same line with --master yarn/k8s and executor
sizing is the whole deployment — the engine has no other install step.
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out = out_path or os.path.join(ROOT, "dist", "searchengine_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(ROOT, "searchengine_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                # .dat: package data (public_suffix_list.dat) read via
                # importlib.resources, which resolves inside the zip
                if not fn.endswith((".py", ".dat")):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, ROOT)
                zf.write(full, rel)
    return out


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(path)
