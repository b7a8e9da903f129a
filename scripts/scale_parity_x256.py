#!/usr/bin/env python
"""Scale-parity sweep THREE TIERS ABOVE sf0.1 (the tier-4 slope point):
the core ten shuffle-heaviest queries re-graded with the driver-identical
row/schema/value-hash compare against a ×64–256 augmented table set
materialized from sf0.1 —

  lineitem   ×64  (38.4M rows at the 600k base — the growing-fact axis,
                   key domain unchanged)
  documents  ×256 (FOUR composed 1:1 letter rotations — vowels ×4,
                   "rstln" ×4, "bcdgm" ×4, "fhpwy" ×4; 1.28M docs.
                   translate() is 1:1 so copies whose text lacks a
                   rotation alphabet entirely would collide, but every
                   alphabet includes letters present throughout the
                   synthetic vocabulary, and parity is fair either way:
                   both engines read byte-identical parquet)
  events     ×64  (+400 days per copy, non-colliding ids)
  embeddings ×32  (same as tier 3 — the quadratic-by-contract embedding
                   evals are deliberately NOT in this tier's list)
  dims copied as-is.

This is the FIFTH measured size point for the core family
(sf0.001 → sf0.01 → sf0.1 → ×16 → ×64 → this), spanning four orders of
magnitude on the fact/docs axes. The point is the SLOPE: any shape
secretly superlinear in either engine shows up as a wall-clock blowup
before it shows up as a wrong answer. Build runs ONCE and materializes
to parquet so Spark and DuckDB read identical bytes. Results recorded
in COVERAGE.md.

Usage: python scripts/scale_parity_x256.py [--only a,b]
(delete /tmp/dask_image_spark_scale/x256 to force regeneration).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/dask_image_spark_scale/x256"

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
]

# Second batch (round 11): the tier-3 heavy set re-graded one tier up,
# biased to the axes that actually GROW at tier 4 (events x64, fact x64,
# docs x256) — the embedding-axis queries are excluded (embeddings stay
# x32, same as tier 3: re-running them re-measures the same point) and so
# is knn_graph_lsh (its graded band_bits=8 contract does N^2/256 work BY
# CONTRACT; at 1.28M docs that is ~36x the x64 tier's 2251 s — the knob,
# not the engine, is what scales it; re-proving the contract costs hours
# and teaches nothing new). Run with: --batch 2
SWEEP2 = [
    "q18_large_orders",
    "session_stats",
    "asof_join",
    "cohort_retention",
    "max_concurrent_sessions",
    "event_transition_matrix",
    "bm25_search",
    "bpe_merge_steps",
    "dedup_ngram_containment",
    "dedup_substring_spans",
]

# Third batch (round 12): the graph family + exploded-text queries whose
# corpus-scale frames were merge-pinned this round — never tier-proven
# before (the graph fixture becomes 1.28M nodes / 3.84M edges at x256
# docs, the first size point above sf0.1 for the whole family). The
# point: the pins hold where they matter AND the fixed-iteration shapes
# stay linear in |edges|.
SWEEP3 = [
    "pagerank_2iter",
    "lpa_communities_2iter",
    "bellman_ford_3round",
    "hits_2iter",
    "katz_centrality_2iter",
    "wl_relabel_1iter",
    "graph_triangle_count",
    "clustering_coefficient",
    "textrank_keywords",
    "dedup_lsh_salted_skew",
]

# fourth rotation alphabet, disjoint from aeiou / rstln / bcdgm
X256_FROTS = ("fhpwy", "hpwyf", "pwyfh", "wyfhp")


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

    li = load_table(spark, BASE, "lineitem")
    _write_flat(
        li.withColumn(
            "_copy", F.explode(F.array(*[F.lit(i) for i in range(64)]))
        ).drop("_copy"),
        "lineitem",
    )

    from scripts.scale_parity_x64 import X64_BROTS

    d = load_table(spark, BASE, "documents")
    out = None
    for c, rot in enumerate(X4_ROTS):
        for c2, crot in enumerate(X16_CROTS):
            for c3, brot in enumerate(X64_BROTS):
                for c4, frot in enumerate(X256_FROTS):
                    idx = (c * 64) + (c2 * 16) + (c3 * 4) + c4
                    cp = d.select(
                        (F.col("doc_id") + idx * X4_OFFSET).alias("doc_id"),
                        F.translate(
                            F.translate(
                                F.translate(
                                    F.translate("text", "aeiou", rot),
                                    "rstln", crot,
                                ),
                                "bcdgm", brot,
                            ),
                            "fhpwy", frot,
                        ).alias("text"),
                        "lang",
                        "source",
                        "n_chars",
                    )
                    out = cp if out is None else out.unionAll(cp)
    _write_flat(out, "documents")

    ev = load_table(spark, BASE, "events")
    copies = None
    for k in range(64):
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
        app_name="scale-parity-x256",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
    )
    if not os.path.isfile(f"{OUT}/lineitem.parquet"):
        t0 = time.perf_counter()
        build_sweep_dir(spark)
        print(
            f"# sweep dir built in {time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )

    sweep = SWEEP
    registry, oracles = q.all_queries(), q.all_oracles()
    if len(sys.argv) >= 3 and sys.argv[1] == "--only":
        # --only takes registry names directly (not restricted to the
        # batch lists) so a caught-and-fixed query can be re-proven at
        # the tier without re-running its whole batch; unknown names
        # fail HERE, before any query runs (ADVICE r11: a typo used to
        # surface as a KeyError mid-run, after minutes of tier work)
        sweep = [n for n in sys.argv[2].split(",") if n]
        unknown = [n for n in sweep if n not in registry]
        if unknown:
            sys.exit(f"--only names not in the registry: {unknown}")
    elif len(sys.argv) >= 3 and sys.argv[1] == "--batch" and sys.argv[2] == "2":
        sweep = SWEEP2
    elif len(sys.argv) >= 3 and sys.argv[1] == "--batch" and sys.argv[2] == "3":
        sweep = SWEEP3

    results: dict[str, str] = {}
    secs: dict[str, float] = {}
    for name in sweep:
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
                "metric": "scale_parity_x256",
                "n_ok": n_ok,
                "n_total": len(results),
                "secs": secs,
                "results": results,
            }
        )
    )


if __name__ == "__main__":
    main()
