#!/usr/bin/env python
"""Interleaved A/B for the optimization rounds: time OLD and NEW builds
of the same query alternately in ONE Spark session, so ambient drift
hits both arms equally.  OLD implementations come from package-internal
checkouts of HEAD (`ext/_ab_old_*.py`).

Usage: python scripts/ab_interleaved.py <rounds> <query> [query ...]
Prints per-query paired samples + medians.  SELF-MEASURED ONLY.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from duckdb_pgwire_spark.session import build_session  # noqa: E402
from duckdb_pgwire_spark.ext import dedup as new_dedup  # noqa: E402
from duckdb_pgwire_spark.ext import multimodal as new_mm  # noqa: E402
from duckdb_pgwire_spark.ext import text as new_text  # noqa: E402
from duckdb_pgwire_spark.ext import similarity as new_sim  # noqa: E402
from duckdb_pgwire_spark.operators import tpch as new_tpch  # noqa: E402
from duckdb_pgwire_spark.operators import joins as new_joins  # noqa: E402
from duckdb_pgwire_spark.streaming import windows as new_stw  # noqa: E402

# OLD arms are gitignored scratch (duplicating committed history in the
# package would be dead weight).  Materialize one with e.g.:
#   git show <old-ref>:duckdb_pgwire_spark/ext/dedup.py \
#     | sed 's/from \.\.registry import query/def query(*_a, **_k):\n    return lambda fn: fn/' \
#     > duckdb_pgwire_spark/ext/_ab_old_dedup.py
try:  # noqa: SIM105
    from duckdb_pgwire_spark.ext import _ab_old_dedup as old_dedup  # noqa: E402
    from duckdb_pgwire_spark.ext import _ab_old_multimodal as old_mm  # noqa: E402
    from duckdb_pgwire_spark.ext import _ab_old_text as old_text  # noqa: E402
    from duckdb_pgwire_spark.ext import _ab_old_similarity as old_sim  # noqa: E402
    from duckdb_pgwire_spark.operators import _ab_old_tpch as old_tpch  # noqa: E402
    from duckdb_pgwire_spark.operators import _ab_old_joins as old_joins  # noqa: E402
    from duckdb_pgwire_spark.streaming import _ab_old_windows as old_stw  # noqa: E402
except ImportError as exc:  # pragma: no cover - harness precondition
    sys.exit(f"A/B old-arm module missing ({exc}); materialize _ab_old_* from git history first (see comment above)")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

PAIRS = {
    "dedup_cluster_components": (old_dedup, new_dedup),
    "text_dup_span_fraction": (old_text, new_text),
    "text_strip_dup_spans": (old_text, new_text),
    "mm_audio_decode": (old_mm, new_mm),
    "mm_audio_frame_energy": (old_mm, new_mm),
    "mm_audio_resample": (old_mm, new_mm),
    "mm_decode": (old_mm, new_mm),
    "mm_jpeg_decode": (old_mm, new_mm),
    "mm_resize": (old_mm, new_mm),
    "mm_phash_near_dup": (old_mm, new_mm),
    "dedup_semantic_kmeans": (old_dedup, new_dedup),
    "dedup_containment": (old_dedup, new_dedup),
    "dedup_ngram_jaccard": (old_dedup, new_dedup),
    "sim_knn_label_agreement": (old_sim, new_sim),
    "dedup_embedding_cosine": (old_dedup, new_dedup),
    "text_tfidf_top_terms": (old_text, new_text),
    "text_unigram_lm_score": (old_text, new_text),
    "dedup_embedding_cosine_lsh": (old_sim, new_sim),
    "q5_local_supplier_volume": (old_tpch, new_tpch),
    "q21_waiting_suppliers": (old_tpch, new_tpch),
    # r18 additions
    "dedup_minhash_lsh": (old_dedup, new_dedup),
    "join_asof": (old_joins, new_joins),
    "q11_important_part_share": (old_tpch, new_tpch),
    "q15_top_supplier": (old_tpch, new_tpch),
    "q2_min_cost_supplier": (old_tpch, new_tpch),
    "stream_session_window": (old_stw, new_stw),
}


def main() -> None:
    rounds = int(sys.argv[1])
    names = sys.argv[2:]
    # AB_SINK=noop times the plan via the noop sink (guide §1.4) instead
    # of collect — for queries whose collect wall is transfer-dominated
    # or whose collect early-stops a limit the full plan would compute.
    if os.environ.get("AB_SINK") == "noop":
        run = lambda df: df.write.format("noop").mode("overwrite").save()  # noqa: E731
    else:
        run = lambda df: df.collect()  # noqa: E731
    spark = build_session(app_name="ab_interleaved")
    results = {}
    for name in names:
        old_mod, new_mod = PAIRS[name]
        old_fn = getattr(old_mod, name)
        new_fn = getattr(new_mod, name)
        # warm both arms (copy builds, codegen, python worker forks)
        run(old_fn(spark, SF_DIR))
        run(new_fn(spark, SF_DIR))
        olds, news = [], []
        for _ in range(rounds):
            t0 = time.perf_counter()
            run(old_fn(spark, SF_DIR))
            olds.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            run(new_fn(spark, SF_DIR))
            news.append(time.perf_counter() - t0)
        mo, mn = statistics.median(olds), statistics.median(news)
        results[name] = {
            "old_med": round(mo, 3),
            "new_med": round(mn, 3),
            "ratio": round(mn / mo, 3),
            "old": [round(s, 3) for s in olds],
            "new": [round(s, 3) for s in news],
        }
        print(f"{name:30s} old={mo:.3f} new={mn:.3f} ratio={mn/mo:.2f}")
        sys.stdout.flush()
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
