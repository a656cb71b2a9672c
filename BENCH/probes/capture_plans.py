#!/usr/bin/env python
"""Capture .explain("formatted") for contract queries into plans/<tag>/.

Usage: python BENCH/probes/capture_plans.py <tag> [query ...]
  tag: suffix for the output dir (e.g. r06 -> plans/r06/<q>_before.txt)
       and the suffix itself (before/after) via PLAN_SUFFIX env.
With no query args, captures every declared query plus the benched
operator surfaces (which are supersets of some contract queries).
Explain only — nothing is executed.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from duplicatesuricate_spark import get_spark  # noqa: E402


def fmt_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r06"
    wanted = set(sys.argv[2:])
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "..", "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entry

    spark = get_spark(app_name="plan-capture", cores=4)
    qs = entry.queries()
    for name, fn in qs.items():
        if wanted and name not in wanted:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = fmt_plan(df)
        except Exception as e:  # pragma: no cover - diagnostic path
            plan = f"ERROR building plan: {e!r}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
