#!/usr/bin/env python
"""Lean A/B measurement for the optimization rounds: warm + median-of-N
collect walls for the named queries, with CPU/JVM anchors sampled before
and after so runs under drifting ambient load stay comparable.

Usage: python scripts/ab_bench.py <tag> <query> [query ...]
Appends one JSON line to /tmp/ab_<tag>.jsonl.  SELF-MEASURED ONLY.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from duckdb_pgwire_spark import registry  # noqa: E402
from duckdb_pgwire_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("AB_RUNS", "5"))


def _cpu_anchor() -> float:
    import hashlib

    buf = bytes(range(256)) * 256
    t0 = time.perf_counter()
    d = b""
    for _ in range(6000):
        d = hashlib.sha256(buf + d).digest()
    return time.perf_counter() - t0


def _jvm_anchor(spark) -> float:
    t0 = time.perf_counter()
    spark.range(0, 50_000_000, 1, 32).selectExpr("sum(id * 3 + 7) AS s").collect()
    return time.perf_counter() - t0


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    defs = registry.load_all()
    spark = build_session(app_name=f"ab_{tag}")
    _jvm_anchor(spark)
    anchors = {"cpu0": round(_cpu_anchor(), 3), "jvm0": round(_jvm_anchor(spark), 3)}
    out: dict[str, float] = {}
    for name in names:
        fn = defs[name].fn
        fn(spark, SF_DIR).collect()  # warm-up
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            samples.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(samples), 4)
        print(f"{name:35s} med={out[name]:.3f}  runs={[round(s, 3) for s in samples]}")
    anchors["cpu1"] = round(_cpu_anchor(), 3)
    anchors["jvm1"] = round(_jvm_anchor(spark), 3)
    rec = {"tag": tag, "queries": out, "anchors": anchors,
           "total": round(sum(out.values()), 3)}
    with open(f"/tmp/ab_{tag}.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
