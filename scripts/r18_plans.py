#!/usr/bin/env python
"""Dump before/after plans for the r18 optimization targets.

For each named query: the OLD arm (_ab_old_* modules = r17 final HEAD)
plan goes to plans/r18/<q>_before.txt, the NEW arm (current package) to
plans/r18/<q>_after.txt. Both files append the EXECUTED plan after one
collect — AQE-only nodes (ReusedExchange, AQEShuffleRead) only appear
there. SELF-MEASURED ONLY.

Usage: python scripts/r18_plans.py [query ...]   (default: all PAIRS)
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from duckdb_pgwire_spark.plans.inspect import formatted_plan  # noqa: E402
from duckdb_pgwire_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def dump(fn, spark, path: Path) -> None:
    df = fn(spark, SF_DIR)
    initial = formatted_plan(df)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    path.write_text(
        initial + "\n\n== Executed plan (after one collect; AQE final) ==\n" + executed
    )
    print(f"wrote {path}")


def main() -> None:
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    import ab_interleaved as ab

    names = sys.argv[1:] or list(ab.PAIRS)
    out = Path(__file__).resolve().parent.parent / "plans" / "r18"
    out.mkdir(parents=True, exist_ok=True)
    spark = build_session(app_name="r18_plans")
    for name in names:
        old_mod, new_mod = ab.PAIRS[name]
        dump(getattr(old_mod, name), spark, out / f"{name}_before.txt")
        dump(getattr(new_mod, name), spark, out / f"{name}_after.txt")
    spark.stop()


if __name__ == "__main__":
    main()
