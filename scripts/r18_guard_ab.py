#!/usr/bin/env python
"""Three-way interleaved A/B for the r18 bucket-cap skew guard:
old (post-collect size filter) vs anti (pre-count + broadcast anti-join,
shipped candidate) vs window (count over the same exchange, pre-filter).
Reports wall medians + job counts per arm. SELF-MEASURED ONLY."""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from duckdb_pgwire_spark.session import build_session  # noqa: E402
from duckdb_pgwire_spark.ext.dedup import (  # noqa: E402
    LSH_BUCKET_CAP,
    _band_rows,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def pairs_from(buckets):
    pair = F.explode(
        F.flatten(
            F.transform(
                F.col("ids"),
                lambda a, i: F.transform(
                    F.slice(F.col("ids"), i + F.lit(2), F.size(F.col("ids"))),
                    lambda b: F.struct(a.alias("doc_a"), b.alias("doc_b")),
                ),
            )
        )
    )
    return (
        buckets.select(pair.alias("p"))
        .select(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .distinct()
    )


def old_arm(spark, sf_dir):
    bands = _band_rows(spark, sf_dir)
    grouped = bands.groupBy("band_idx0", "band_val").agg(
        F.array_sort(F.collect_list("doc_id")).alias("ids")
    )
    return pairs_from(
        grouped.filter((F.size("ids") >= 2) & (F.size("ids") <= LSH_BUCKET_CAP))
    )


def anti_arm(spark, sf_dir):
    bands = _band_rows(spark, sf_dir)
    ex = bands.repartition("band_idx0", "band_val")
    hot = (
        ex.groupBy("band_idx0", "band_val")
        .count()
        .filter(F.col("count") > LSH_BUCKET_CAP)
        .drop("count")
    )
    capped = ex.join(F.broadcast(hot), ["band_idx0", "band_val"], "left_anti")
    return pairs_from(
        capped.groupBy("band_idx0", "band_val")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )


def window_arm(spark, sf_dir):
    bands = _band_rows(spark, sf_dir)
    w = Window.partitionBy("band_idx0", "band_val")
    capped = (
        bands.withColumn("__n", F.count("*").over(w))
        .filter((F.col("__n") >= 2) & (F.col("__n") <= LSH_BUCKET_CAP))
        .drop("__n")
    )
    return pairs_from(
        capped.groupBy("band_idx0", "band_val").agg(
            F.array_sort(F.collect_list("doc_id")).alias("ids")
        )
    )


def jobs_of(spark, fn):
    st = spark.sparkContext.statusTracker()
    before = set(st.getJobIdsForGroup(None) or [])
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    return len(set(st.getJobIdsForGroup(None) or []) - before)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    spark = build_session(app_name="r18_guard_ab")
    arms = {"old": old_arm, "anti": anti_arm, "window": window_arm}
    # equality check first
    base = {tuple(sorted(map(tuple, old_arm(spark, SF_DIR).collect())))}
    for name, fn in arms.items():
        got = {tuple(sorted(map(tuple, fn(spark, SF_DIR).collect())))}
        assert got == base, f"{name} rows differ"
    print("rows identical across arms")
    for name, fn in arms.items():
        print(f"{name}: jobs={jobs_of(spark, fn)}")
    samples = {k: [] for k in arms}
    for _ in range(rounds):
        for name, fn in arms.items():
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)
    for name, ss in samples.items():
        print(
            f"{name}: med={statistics.median(ss):.3f} "
            f"samples={[round(s, 3) for s in ss]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
