#!/usr/bin/env python
"""Scale-parity sweep TWO TIERS ABOVE sf0.1 (the tier-3 slope point):
the ten shuffle-heaviest queries re-graded with the driver-identical
row/schema/value-hash compare against a ×16–64 augmented table set
materialized from sf0.1 —

  lineitem   ×16 (the lineitem_x4 explode generalized: 96M-row-scale
                  shape at a 6M base — row count ×16, key domain
                  unchanged, the axis a growing fact moves along)
  documents  ×64 (three composed 1:1 letter rotations — vowels ×4,
                  "rstln" ×4, "bcdgm" ×4 — so every copy is a distinct
                  non-duplicate text; 320k docs; translate() is 1:1 so
                  lang/source/n_chars replicate consistently)
  events     ×16 (+400 days per copy, non-colliding event/user ids;
                  TIMESTAMP_NTZ to match the generator's encoding)
  embeddings ×32 (vec_id offset; dim 0 perturbed by k·1e-3 per copy)
  dims copied as-is.

The point is the SLOPE: tier-2 (×4 fact / ×16 docs) passed 398/400;
this tier multiplies another ×4 on each axis, so any shape that is
secretly superlinear — in either engine or either oracle — shows up as
a wall-clock blowup before it shows up as a wrong answer. Build runs
ONCE and materializes to parquet so Spark and DuckDB read identical
bytes. Results recorded in COVERAGE.md.

Usage: python scripts/scale_parity_x64.py [--only a,b | --only @file]
(prints one JSON line with per-query seconds; delete
/tmp/dask_image_spark_scale/x64 to force regeneration).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/dask_image_spark_scale/x64"

# The round-10 core ten (VERDICT r9 item 8's list, one more tier up),
# then a widening set across the same heavy families — including
# dedup_simhash_pairs, the direct ×4-docs stress test for the round-10
# 60-bit banding rewrite (320k docs, 32768 keys/band).
SWEEP = [
    "q1_pricing_summary",
    "q3_join_topk",
    "q9_product_type_profit",
    "q21_suppliers_kept_waiting",
    "dedup_minhash_lsh",
    "tfidf_cosine_pairs",
    "dedup_exact_groups",
    "sessionize",
    "rolling_1h_user_stats",
    "window_rank",
    # --- widening batch ---
    "q4_order_priority",
    "q13_customer_distribution",
    "q18_large_orders",
    "dedup_simhash_pairs",
    "bm25_search",
    "session_stats",
    "asof_join",
    "cohort_retention",
    "max_concurrent_sessions",
    "event_transition_matrix",
    # --- second widening: graph / ANN / spatial / incremental dedup ---
    "pagerank_2iter",
    "graph_triangle_count",
    "kcore_decomposition",
    "similarity_ivf_topk",
    "ann_recall_ivf",
    "dedup_incremental_minhash",
    "spatial_radius_join",
    "dedup_ngram_jaccard",
    "quality_entropy",
    "funnel_conversion",
    # --- third widening: timeseries / embeddings / text heavies ---
    "acf_hourly",
    "rolling_corr_24h",
    "seasonal_decompose_ma",
    "cusum_changepoint",
    "asof_join_tolerance",
    "similarity_hamming_topk",
    "matryoshka_recall",
    "embedding_quantize_int8",
    "token_pmi_bigrams",
    "token_bpe_count",
    # --- fourth widening: streaming batch-equivalence on the x16
    # timeline + lakehouse + blocked-dedup heavies ---
    "streaming_ohlc",
    "streaming_dedup_watermark",
    "streaming_session_state",
    "streaming_left_outer_join",
    "session_window_batch",
    "cdc_snapshot_diff",
    "merge_three_way",
    "mv_incremental_refresh",
    "dedup_levenshtein",
    "golden_record_survivorship",
    # --- fifth widening: the round-10 fix set, one more tier up —
    # every query whose plan or contract was changed this round gets a
    # tier-3 evidence point that the fix itself scales ---
    "local_outlier_factor",       # ring equi-join (was BNLJ over all pairs)
    "facility_location_greedy",   # explicit repartition (was 1-task N2 stream)
    "psm_att_nearest",            # bounded nearest-control map (was O(n2) frame)
    "cluster_medoid",             # salted within-label pairs (was 8-task ceiling)
    "dedup_semantic",             # salted within-cluster pairs (same rule)
    "udaf_geomean",               # x>0 log-domain filter
    "boxcox_lambda_grid",         # x>0 log-domain filter
    "tree_depth_doubling",        # dense-rank heap (was sparse-id drop)
    "lsh_band_sweep",             # MATERIALIZED-CTE oracle (was 58GB spill)
    "trimmed_mean",               # EPS-rounded quantile cuts (tie-boundary)
    # --- sixth widening: the heaviest tier-2 queries not yet at tier 3
    # (blocked dedup variants, text fits, transport, retrieval eval,
    # the band_bits-knob ANN graph) ---
    "dedup_minhash_survivors",
    "dedup_substring_spans",
    "dedup_ngram_containment",
    "jaccard_prefix_filter_join",
    "udtf_ngrams",
    "bpe_merge_steps",
    "sinkhorn_2iter",
    "map_mean_avg_precision",
    "knn_graph_lsh",
    "quality_repetition",
]

# third rotation alphabet: letters present throughout the synthetic
# vocabulary (big/batch, scan/customer, data/order, agg/group,
# merge/stream) — composes with the vowel and "rstln" maps because the
# three alphabets are disjoint
X64_BROTS = ("bcdgm", "cdgmb", "dgmbc", "gmbcd")


def _write_flat(df, t: str) -> None:
    import glob
    import shutil

    stage = f"{OUT}/_stage_{t}"
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = glob.glob(f"{stage}/part-*.parquet")[0]
    shutil.move(part, f"{OUT}/{t}.parquet")
    shutil.rmtree(stage)


def build_sweep_dir(spark) -> None:
    import shutil

    from pyspark.sql import functions as F

    from dask_image_spark.queries.pipeline import (
        X4_OFFSET,
        X4_ROTS,
        X16_CROTS,
    )
    from dask_image_spark.sources.tables import load_table

    os.makedirs(OUT, exist_ok=True)

    for t in ("region", "nation", "customer", "supplier", "part", "orders"):
        shutil.copyfile(f"{BASE}/{t}.parquet", f"{OUT}/{t}.parquet")

    # lineitem x16 — the registered x4 explode generalized; zero-shuffle
    li = load_table(spark, BASE, "lineitem")
    _write_flat(
        li.withColumn(
            "_copy", F.explode(F.array(*[F.lit(i) for i in range(16)]))
        ).drop("_copy"),
        "lineitem",
    )

    # documents x64 — three composed 1:1 rotations, disjoint alphabets
    d = load_table(spark, BASE, "documents")
    out = None
    for c, rot in enumerate(X4_ROTS):
        for c2, crot in enumerate(X16_CROTS):
            for c3, brot in enumerate(X64_BROTS):
                idx = (c * 16) + (c2 * 4) + c3
                cp = d.select(
                    (F.col("doc_id") + idx * X4_OFFSET).alias("doc_id"),
                    F.translate(
                        F.translate(
                            F.translate("text", "aeiou", rot),
                            "rstln", crot,
                        ),
                        "bcdgm", brot,
                    ).alias("text"),
                    "lang",
                    "source",
                    "n_chars",
                )
                out = cp if out is None else out.unionAll(cp)
    _write_flat(out, "documents")

    # events x16 — +400 days per copy (timeline is ~30 days: copies
    # never interact through any session/window), non-colliding ids
    ev = load_table(spark, BASE, "events")
    copies = None
    for k in range(16):
        cp = ev.select(
            (F.col("event_id") + k * 100_000_000).alias("event_id"),
            (F.col("ts") + F.expr(f"INTERVAL {400 * k} DAYS")).cast(
                "timestamp_ntz"
            ).alias("ts"),
            (F.col("user_id") + k * 10_000_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        copies = cp if copies is None else copies.unionAll(cp)
    _write_flat(copies, "events")

    # embeddings x32
    emb = load_table(spark, BASE, "embeddings")
    ecopies = None
    for k in range(32):
        cp = emb.select(
            (F.col("vec_id") + k * 1_000_000).alias("vec_id"),
            F.expr(
                f"transform(embedding, (v, i) -> CASE WHEN i = 0 THEN "
                f"CAST(v + {k} * 1e-3 AS FLOAT) ELSE v END)"
            ).alias("embedding"),
            "label",
        )
        ecopies = cp if ecopies is None else ecopies.unionAll(cp)
    _write_flat(ecopies, "embeddings")


def main() -> None:
    from dask_image_spark import queries as q
    from dask_image_spark.session import get_spark
    from tests.parity import compare

    q.load_all()
    spark = get_spark(
        app_name="scale-parity-x64",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
    )
    if not os.path.isfile(f"{OUT}/lineitem.parquet"):
        t0 = time.perf_counter()
        build_sweep_dir(spark)
        print(
            f"# sweep dir built in {time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )

    only: set[str] | None = None
    if len(sys.argv) >= 3 and sys.argv[1] == "--only":
        arg = sys.argv[2]
        only = (
            set(open(arg[1:]).read().split())
            if arg.startswith("@")
            else set(arg.split(","))
        )

    results: dict[str, str] = {}
    secs: dict[str, float] = {}
    registry, oracles = q.all_queries(), q.all_oracles()
    for name in SWEEP:
        if only is not None and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            problems = compare(registry[name](spark, OUT), oracles[name], OUT)
            results[name] = "ok" if not problems else "; ".join(problems)[:300]
        except Exception as e:  # noqa: BLE001 — per-query isolation
            results[name] = f"{type(e).__name__}: {e}"[:300]
        finally:
            q.release_caches()
        secs[name] = round(time.perf_counter() - t0, 1)
        print(
            f"# {name}: {results[name][:80]} ({secs[name]}s)",
            file=sys.stderr,
        )

    n_ok = sum(1 for v in results.values() if v == "ok")
    print(
        json.dumps(
            {
                "metric": "scale_parity_x64",
                "n_ok": n_ok,
                "n_total": len(results),
                "secs": secs,
                "results": results,
            }
        )
    )


if __name__ == "__main__":
    main()
