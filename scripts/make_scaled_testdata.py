#!/usr/bin/env python
"""Build a key-offset replicated scale-up of the driver testdata for
SELF-MEASURED scale benchmarks (BASELINE.md measurement-honesty
protocol: sf1 numbers produced with this script are labeled as such —
the driver only ships sf{0.001,0.01,0.1}).

Each fact table is replicated FACTOR times; every key column gets a
per-copy offset of (max_key + 1) so join fan-outs and group
cardinalities scale linearly like real data would (plain row
duplication would instead multiply join matches quadratically).
Dimensions (region, nation) stay as-is, like TPC-H's fixed tables.

Usage: python scripts/make_scaled_testdata.py [factor] [src_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key columns to offset, per table (FK offsets mirror their PK table)
KEYS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    # user_id deliberately NOT offset: scaling should densify each
    # user's timeline (sessions merge, windows deepen) rather than mint
    # 100x sparse users whose every event is its own session — the
    # latter made session-window output size equal input size, turning
    # the scale check into a driver-collect benchmark.
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "region": [],
    "nation": [],
}

# offset base per KEY NAME: (table, column) whose max defines the key
# space, so FK offsets mirror their PK table (o_custkey uses customer's
# c_custkey base)
BASE_OF = {
    "c_custkey": ("customer", "c_custkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def main(factor: int, src: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    tables = {t: pq.read_table(f"{src}/{t}.parquet") for t in KEYS}
    base: dict[str, int] = {}
    for key, (tbl, col) in BASE_OF.items():
        base[key] = pc.max(tables[tbl][col]).as_py() + 1
    for name, keys in KEYS.items():
        t = tables[name]
        if not keys or factor == 1:
            pq.write_table(t, f"{out}/{name}.parquet")
            continue
        copies = [t]
        for i in range(1, factor):
            cols = []
            for field in t.schema:
                col = t[field.name]
                if field.name in keys:
                    off = pa.scalar(i * base[field.name], type=field.type)
                    col = pc.add(col, off)
                elif name == "documents" and field.name == "text":
                    # perturb each copy's text (r16): plain replication
                    # makes every doc a 16-way near-duplicate, so
                    # dup-verification workloads grow QUADRATICALLY in
                    # the factor (measured: 332 → 684,992 LSH candidate
                    # pairs at 16×) — a fixture artifact, not how a
                    # real corpus scales. A deterministic per-copy WORD
                    # SHUFFLE destroys the copy's 3-gram shingle
                    # overlap (duplicate DENSITY stays scale-constant
                    # like real data) while preserving the word
                    # multiset — token counts, quality ratios and
                    # language-id statistics keep their distribution.
                    import random as _random
                    import zlib

                    vals = []
                    for v in col.to_pylist():
                        if v is None:
                            vals.append(None)
                            continue
                        w = v.split(" ")
                        # seed by (copy, text) — identical texts keep
                        # shuffling identically WITHIN a copy, so the
                        # base corpus's duplicate structure replicates
                        # at constant density instead of dissolving
                        seed = (i << 32) ^ zlib.crc32(v.encode())
                        _random.Random(seed).shuffle(w)
                        vals.append(" ".join(w))
                    col = pa.array(vals, type=field.type)
                cols.append(col)
            copies.append(pa.Table.from_arrays(cols, schema=t.schema))
        pq.write_table(pa.concat_tables(copies), f"{out}/{name}.parquet")
        print(f"{name}: {len(t)} -> {len(t) * factor}")


if __name__ == "__main__":
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/scaled_sf1"
    main(factor, src, out)
