"""Decade-scale check for the OUTPUT-BOUNDED pair operators (r7 verdict
item 6): mm_phash_near_dup and dedup_containment had only 10× numbers,
and their raw walls track the genuinely multiplied near-dup OUTPUT, not
the plan. This measures the PLAN by collapsing the output to a
per-doc-distinct-partner aggregate (one row per doc with a match), so
wall growth reflects scan + banded-join + verify cost.

Replicas: documents from sf0.1, replicated 10× and 100× with doc_id
shifts AND a per-replica text salt (' r<rep>' suffix) — unsalted copies
would make every band bucket exceed its cap (100 identical docs per
bucket → everything dropped) and measure nothing; salting keeps
near-dup DENSITY roughly constant, which is what a bigger real corpus
looks like.

Usage: python scripts/measure_pairs_scale.py [--factors 10 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def make_replica(spark, factor: int) -> str:
    from pyspark.sql import functions as F

    from duckdb_pgwire_spark.session import load_table

    dst = f"/tmp/sf_docs_x{factor}"
    out = f"{dst}/documents.parquet"
    if os.path.exists(out):
        return dst
    d = load_table(spark, SRC, "documents")
    maxid = d.agg(F.max("doc_id")).first()[0] + 1
    reps = spark.range(factor).withColumnRenamed("id", "rep")
    (
        d.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * maxid)
        .withColumn(
            "text",
            F.when(F.col("rep") == 0, F.col("text")).otherwise(
                F.concat(F.col("text"), F.lit(" r"), F.col("rep"))
            ),
        )
        .withColumn("n_chars", F.length("text").cast("long"))
        .drop("rep")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(out)
    )
    return dst


def timed_deduped(op, spark, sf_dir: str) -> tuple[float, int, int]:
    """(wall, docs_with_match, distinct_pairs) of the deduped metric."""
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    agg = (
        op(spark, sf_dir)
        .groupBy("doc_a")
        .agg(F.countDistinct("doc_b").alias("n"))
        .agg(
            F.count("*").alias("docs"), F.sum("n").alias("pairs")
        )
        .first()
    )
    wall = time.perf_counter() - t0
    return wall, int(agg["docs"] or 0), int(agg["pairs"] or 0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", nargs="*", type=int, default=[10, 100])
    args = ap.parse_args()

    from duckdb_pgwire_spark.ext.dedup import dedup_containment
    from duckdb_pgwire_spark.ext.multimodal import mm_phash_near_dup
    from duckdb_pgwire_spark.session import build_session

    spark = build_session(app_name="pairs-scale")
    results: dict[str, dict] = {}
    for op_name, op in (
        ("mm_phash_near_dup", mm_phash_near_dup),
        ("dedup_containment", dedup_containment),
    ):
        rows: dict[str, dict] = {}
        for factor in [1, *args.factors]:
            sf_dir = SRC if factor == 1 else make_replica(spark, factor)
            wall, docs, pairs = timed_deduped(op, spark, sf_dir)
            # second run: steady state (plan/codegen warm)
            wall2, _, _ = timed_deduped(op, spark, sf_dir)
            rows[f"x{factor}"] = {
                "wall_warm_sec": round(min(wall, wall2), 2),
                "docs_with_match": docs,
                "distinct_pairs": pairs,
            }
            print(f"{op_name} x{factor}: {rows[f'x{factor}']}", file=sys.stderr)
        results[op_name] = rows
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
