"""Full-contract strict gate: every queries()/oracle_sql() pair must be
byte-exact (IEEE-754 float bits, repr ints/strings) AND Arrow-type-
compatible (DuckDB HUGEINT sums are a failure) at sf0.001.

This is the CI twin of the per-round driver's typed-value hash check:
tools/strict_audit.run_audit is reused verbatim, so any future oracle
that emits an uncast sum() (HUGEINT) or rounds only one side of a
double can never reach a driver red without failing here first.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools"),
)


def test_full_contract_strict(spark, sf_dir):
    from strict_audit import run_audit

    lines: list[str] = []
    n_checked, fails = run_audit(spark, sf_dir, log=lines.append)
    detail = "\n".join(
        ln for ln in lines if "STRICT-OK" not in ln
    )
    assert not fails, f"strict mismatches ({len(fails)}):\n{detail}"
    assert n_checked >= 200  # the whole contract ran, not a subset
