"""Measure k-means ASSIGNMENT cost scaling: flat vs two-level index.

The r6 verdict named SemDeDup's flat assignment the repo's one genuine
100-TB scale-killer: with k ∝ n (k = n/64), flat assignment is
O(n·k·d) — quadratic in corpus size — and the driver holds the whole
k×DIM matrix. The r7 two-level index (similarity.build_hier_index /
hier_assign) is O(n·√k·d) with O(√k·d) driver memory.

This script replicates the sf0.1 embeddings corpus (5 000 vectors) by
10× and 100× with deterministic per-replica perturbations, then runs
BOTH assignment paths at each scale with SemDeDup's own growth law and
prints per-vector wall times. Expectation: flat per-vector wall grows
~linearly with k (10× per decade); two-level grows ~√k (~3.2× per
decade) and its driver-held matrix stays √k×DIM.

Usage: python scripts/measure_hier_scale.py [--decades 2]
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def make_replica(src: str, dst: Path, factor: int) -> int:
    t = pq.read_table(src).select(["vec_id", "embedding"])
    pdf = t.to_pandas()
    n = len(pdf)
    frames = []
    for r in range(factor):
        f = pdf.copy()
        f["vec_id"] = f["vec_id"] + r * n
        if r:
            # deterministic perturbation: shift one dimension per
            # replica so replicas don't collapse into identical cells
            d = r % 64
            f["embedding"] = f["embedding"].map(
                lambda e, d=d, r=r: [
                    v + (0.01 * ((r % 7) + 1) if i == d else 0.0)
                    for i, v in enumerate(e)
                ]
            )
        frames.append(f)
    out = pd.concat(frames, ignore_index=True)
    dst.mkdir(parents=True, exist_ok=True)
    schema = pa.schema(
        [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32()))]
    )
    pq.write_table(
        pa.Table.from_pandas(out, preserve_index=False, schema=schema),
        dst / "embeddings.parquet",
    )
    return len(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--decades", type=int, default=2)
    ap.add_argument("--src", default="/root/testdata/sf0.1/embeddings.parquet")
    args = ap.parse_args()

    from duckdb_pgwire_spark.ext import similarity as sim
    from duckdb_pgwire_spark.session import build_session

    spark = build_session(app_name="hier_scale")
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for dec in range(1, args.decades + 1):
        factor = 10**dec
        dst = Path(f"/tmp/hier_scale/x{factor}")
        n = make_replica(args.src, dst, factor)
        k = max(8, n // 64)  # SemDeDup growth law
        v = (
            spark.read.parquet(str(dst / "embeddings.parquet"))
            .select("vec_id", "embedding")
            .cache()
        )
        v.count()

        # ---- two-level
        t0 = time.monotonic()
        idx = sim.build_hier_index(spark, v, n, k)
        t_build = time.monotonic() - t0
        t0 = time.monotonic()
        assigned = sim.hier_assign(v, idx)
        n_cells = assigned.select("cell").distinct().count()
        t_assign_hier = time.monotonic() - t0

        # ---- flat (the r6 path): seed + Lloyd + driver-held k×d matrix
        t0 = time.monotonic()
        seeds = (
            v.filter(v.vec_id < k).select("vec_id", "embedding").collect()
        )
        by_id = {r.vec_id: list(r.embedding) for r in seeds}
        C = np.array([by_id[i] for i in range(k)], dtype=np.float64)
        for _ in range(sim.N_LLOYD):
            C = sim._lloyd_refine(spark, v, C)
        t_build_flat = time.monotonic() - t0
        t0 = time.monotonic()
        flat_cells = (
            v.select(
                "vec_id",
                sim._make_ivf_assign_udf(C)("embedding").alias("cell"),
            )
            .select("cell")
            .distinct()
            .count()
        )
        t_assign_flat = time.monotonic() - t0

        row = {
            "n": n,
            "k": k,
            "kc_driver_rows_hier": int(idx.coarse.shape[0]),
            "driver_matrix_doubles_flat": int(C.size),
            "driver_matrix_doubles_hier": int(idx.coarse.size),
            "build_hier_s": round(t_build, 2),
            "assign_hier_s": round(t_assign_hier, 2),
            "assign_hier_us_per_vec": round(t_assign_hier / n * 1e6, 2),
            "build_flat_s": round(t_build_flat, 2),
            "assign_flat_s": round(t_assign_flat, 2),
            "assign_flat_us_per_vec": round(t_assign_flat / n * 1e6, 2),
            "cells_hier": n_cells,
            "cells_flat": flat_cells,
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
