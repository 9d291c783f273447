#!/usr/bin/env python
"""Per-query profiling harness for the optimization rounds (guide §1).

For every headline query: time the warm-up, the collect median (bench.py
methodology), a noop-sink median (guide §1.4 — plan cost without driver
transfer), count the Spark JOBS the query schedules (scheduler-floor
evidence: each job pays fixed driver latency), and dump
``explain("formatted")`` to plans/<tag>/<name>.txt.

Usage: python scripts/profile_bench.py [tag] [query ...]
Writes profile JSON to /tmp/profile_<tag>.json and plans to plans/<tag>/.
SELF-MEASURED ONLY — the driver record stays bench.py's stdout line.
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
from duckdb_pgwire_spark.plans.inspect import formatted_plan  # noqa: E402
from duckdb_pgwire_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _job_ids(spark) -> set[int]:
    st = spark.sparkContext.statusTracker()
    return set(st.getJobIdsForGroup(None) or [])


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r17"
    only = set(sys.argv[2:])
    import bench

    defs = registry.load_all()
    spark = build_session(app_name=f"profile_{tag}")
    plans_dir = Path(__file__).resolve().parent.parent / "plans" / tag
    plans_dir.mkdir(parents=True, exist_ok=True)

    names = [n for n in bench.HEADLINE if n in defs]
    if only:
        names = [n for n in names if n in only]

    prof: dict[str, dict] = {}
    for name in names:
        fn = defs[name].fn
        spark.sparkContext.setJobDescription(f"profile:{name}")
        try:
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            build_s = time.perf_counter() - t0
            plan = formatted_plan(df)
            (plans_dir / f"{name}.txt").write_text(plan)
            t0 = time.perf_counter()
            df.collect()
            warm = time.perf_counter() - t0
            # timed runs, counting jobs on the last one
            samples = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, SF_DIR).collect()
                samples.append(time.perf_counter() - t0)
            before = _job_ids(spark)
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            samples.append(time.perf_counter() - t0)
            jobs = len(_job_ids(spark) - before)
            noops = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                noops.append(time.perf_counter() - t0)
            prof[name] = {
                "build_s": round(build_s, 4),
                "warm_s": round(warm, 4),
                "collect_med_s": round(statistics.median(samples), 4),
                "noop_med_s": round(statistics.median(noops), 4),
                "jobs": jobs,
                "exchanges": plan.count("Exchange"),
                "python_nodes": sum(
                    plan.count(k)
                    for k in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "MapInArrow", "FlatMapGroupsInPandas")
                ),
            }
            print(f"{name:35s} med={prof[name]['collect_med_s']:.3f} noop={prof[name]['noop_med_s']:.3f} jobs={jobs:3d} exch={prof[name]['exchanges']:2d} build={build_s:.3f}")
        except Exception as exc:  # noqa: BLE001
            prof[name] = {"error": str(exc)[:200]}
            print(f"{name:35s} FAILED: {exc}")
        finally:
            spark.sparkContext.setJobDescription(None)

    out = Path(f"/tmp/profile_{tag}.json")
    out.write_text(json.dumps(prof, indent=1))
    total = sum(v.get("collect_med_s", 0) for v in prof.values())
    print(f"TOTAL collect_med {total:.3f} s over {len(prof)} queries -> {out}")
    spark.stop()


if __name__ == "__main__":
    main()
