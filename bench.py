#!/usr/bin/env python
"""Headline benchmark. Mirrors BASELINE.md methodology: local[$SPARK_GRAFT_CPUS]
(default 32), sf dir from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
each query warmed once then best-of-3 wall-clock on a full materialization.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# The 7 headline queries measured in BASELINE.md (same semantics, same data),
# in the same order. conv3x3 reproduces the baseline's workload SIZE — a 3x3
# convolution over the full events table as a 300-wide pixel grid (100k px at
# sf0.1), not the 64x64 graded fixture — so the comparison is like-for-like.
HEADLINE = [
    ("q1", "q1_pricing_summary"),
    ("q3", "q3_join_topk"),
    ("window_rank", "window_rank"),
    ("sessionize", "sessionize"),
    ("similarity_top10", "similarity_top10"),
    ("exact_dedup_docs", "dedup_exact_groups"),
    ("conv3x3", "__conv3x3_fullscale__"),
    # round-2 additions: the LLM-pipeline operators tracked round-over-round
    # (stock-PySpark equivalents measured in BASELINE.md the same way)
    ("minhash_lsh", "dedup_minhash_lsh"),
    ("ivf_topk", "similarity_ivf_topk"),
    # round-4 addition (VERDICT_r03 item 8): the flagship end-to-end curation
    # composition gets a tracked number (stock-PySpark baseline in BASELINE.md)
    ("curation_pipeline", "curation_pipeline"),
    # round-5 additions: the two new corpus-scale operators worth tracking
    # (time-interval rolling window; all-pairs sparse cosine — the latter is
    # the heaviest new shuffle shape, persist + inverted-index self-join)
    ("rolling_1h", "rolling_1h_user_stats"),
    ("tfidf_pairs", "tfidf_cosine_pairs"),
    # round-6 addition (VERDICT_r05 item 8): the R2 halo-exchange tile path
    # gets a tracked number at real image scale — 9x9 gaussian over a dense
    # 1024x1024 grid (1M px), stock twin in scripts/baseline_stock.py
    ("gauss_r2_1024", "__gauss_r2_1024__"),
    # round-7 addition (VERDICT_r06 item 7): the same tile path at 16x the
    # pixels (4096x4096 = 16M px, 256-px tiles) — two points on the size
    # axis prove the halo-exchange path's scaling SLOPE, not just a point
    ("gauss_r2_4096", "__gauss_r2_4096__"),
    # round-7 addition: the point-in-time SCD2 join — the engine's
    # union+carry window reformulation vs the stock interval range-join
    # (scripts/baseline_stock.py::pit_join), the plan-divergence story
    # for versioned-dimension lookups
    ("pit_join", "pit_join_scd2"),
    # round-8 additions (VERDICT_r07 item 4): 4x-document slope points for
    # the two shuffle-heaviest text ops, so the band join and the postings
    # self-join get measured scaling slopes like the tile path got in r7.
    # The corpus is vowel-rotation augmented (queries/pipeline.py::docs_x4)
    # so shingles/tokens replicate i.i.d. instead of colliding 4-way.
    ("minhash_lsh_4x", "__minhash_lsh_4x__"),
    ("tfidf_pairs_4x", "__tfidf_pairs_4x__"),
    # round-8 continuation: slope points for the two shuffle-heaviest
    # TPC-H queries (VERDICT_r07 item 4 named q9/q21 alongside the text
    # ops). 1x = the registered queries; 4x = the same plans over
    # lineitem_x4 (rows 4x, key domain unchanged — fact growth with
    # constant dims). Stock twins in scripts/baseline_stock.py.
    ("minhash_lsh_16x", "__minhash_lsh_16x__"),
    ("q9", "q9_product_type_profit"),
    ("q21", "q21_suppliers_kept_waiting"),
    ("q9_4x", "__q9_4x__"),
    ("q21_4x", "__q21_4x__"),
    # third round-8 continuation: the blocked-DBSCAN neighbor count on an
    # 8x-augmented point set (16k points at sf0.1) — the eps-grid 9-cell
    # equi-join vs the stock all-pairs product
    # (scripts/baseline_stock.py::dbscan_allpairs_8x)
    ("dbscan_8x", "__dbscan_8x__"),
    # round-10 addition (VERDICT_r09 item 4): the reference's hardest
    # operator gets its measured size slope — connected-component labeling
    # of a 45%-density noise mask at 1x/4x/16x pixels (512^2/1024^2/2048^2,
    # blocks proportional like the gauss tile points). These rows use the
    # REBUILD protocol (see below): label() does its work eagerly at
    # construction (block pre-label localCheckpoint + the boundary-edge
    # collect), so re-counting the returned frame would time nothing.
    # Stock twin = plain-PySpark recursive min-propagation join
    # (scripts/baseline_stock.py::label_minprop_*), O(component diameter)
    # shuffle rounds vs the engine's O(1).
    ("label_cc_1x", "__label_cc_1x__"),
    ("label_cc_4x", "__label_cc_4x__"),
    ("label_cc_16x", "__label_cc_16x__"),
    # round-11 addition (VERDICT_r10 item 4): the x64-class point that
    # completes the label slope — 4096^2 = 16.8M pixels, 7.55M foreground.
    # One engine-side point (stock recursive min-propagation needs
    # O(component-diameter) shuffle rounds and is already 196 s at 2048^2;
    # the A/B at this size is not worth the wall-clock, per the verdict).
    ("label_cc_64x", "__label_cc_64x__"),
]

# Round-14 additions (VERDICT r13 item 2 — restore the bench's evidence
# power): at sf0.1 the 27 headline rows are stage-latency bound (8-core
# total within 2% of 32-core), so round-over-round deltas below ~15% on
# sub-second rows are unfalsifiable noise. One higher-scale point per
# family optimized in the two optimization rounds puts that family's
# number well above the ~0.2 s/stage floor and makes its core-count
# scaling measurable again (measured 8-vs-32-core ratios at add time:
# minhash_lsh_64x 1.89, gauss_r2_8192 1.82, label_cc_256x 1.17 — vs ~1.0
# for most headline rows). ADDITIONS-ONLY per the driver contract: the
# original 27 labels, their methodology, and the headline `value` (their
# sum) are unchanged; these rows appear in `queries` (and in
# `value_with_scale_rows`) so per-query and scaling comparisons can use
# them without breaking the round-over-round total.
SCALE_ROWS = [
    ("minhash_lsh_64x", "__minhash_lsh_64x__"),
    ("gauss_r2_8192", "__gauss_r2_8192__"),
    ("label_cc_256x", "__label_cc_256x__"),
]

# Labels whose work happens at DataFrame CONSTRUCTION (eager internal jobs:
# localCheckpoint stages, bounded collects). The warm best-of-3 re-count
# protocol would reuse those materialized stages and time ~0; these rows
# instead rebuild the DataFrame inside every timed iteration (construction
# + full count, still warmed once, still best-of-3).
REBUILD = {
    "label_cc_1x", "label_cc_4x", "label_cc_16x", "label_cc_64x",
    "label_cc_256x",
}

BASELINE_K = [
    (-1, -1, 0.1), (-1, 0, 0.1), (-1, 1, 0.1),
    (0, -1, 0.1), (0, 0, 0.2), (0, 1, 0.1),
    (1, -1, 0.1), (1, 0, 0.1), (1, 1, 0.1),
]


def conv3x3_fullscale(spark, sf_dir):
    """BASELINE.md's conv3x3_sim at the same scale: every event becomes a
    pixel of a 300-wide grid; 3x3 kernel through the pad-then-scatter
    stencil (constant boundary)."""
    from pyspark.sql import functions as F

    from dask_image_spark.operators import ndfilters
    from dask_image_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    px = ev.select(
        F.expr("CAST(event_id % 300 AS INT)").alias("y"),
        F.expr("CAST(event_id div 300 AS INT)").alias("x"),
        "value",
    )
    w = (ev.count() + 299) // 300
    return ndfilters.correlate(px, BASELINE_K, (300, w), mode="constant")


def _gauss_r2(spark, sf_dir, side: int, block: int):
    """9x9 gaussian (sigma=1) over a dense side x side grid through the R2
    tile path (``chunked.map_overlap_tiles`` — dask's map_overlap: tile +
    halo exchange + per-tile numpy, separable two-pass inside the tile).
    The grid is data-derived: pixel (y, x) takes the value of event
    ``id % n_events`` via a broadcast modular join."""
    import numpy as np
    from pyspark.sql import functions as F

    from dask_image_spark.functions import kernels as K
    from dask_image_spark.operators import chunked
    from dask_image_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    n = ev.count()
    px = (
        spark.range(side * side)
        .select(
            (F.col("id") % side).cast("int").alias("y"),
            (F.col("id") / side).cast("int").alias("x"),
            (F.col("id") % n).alias("event_id"),
        )
        .join(F.broadcast(ev), "event_id")
        .select("y", "x", "value")
    )
    taps = K.gaussian_taps_1d(1.0)
    depth = max(abs(o) for o, _ in taps)

    def tile_fn(tile: np.ndarray) -> np.ndarray:
        nr, nc = tile.shape
        t1 = np.zeros_like(tile)
        for d, w in taps:
            t1[depth : nr - depth, :] += w * tile[depth + d : nr - depth + d, :]
        out = np.zeros_like(tile)
        for d, w in taps:
            out[depth : nr - depth, depth : nc - depth] += (
                w * t1[depth : nr - depth, depth + d : nc - depth + d]
            )
        return out

    return chunked.map_overlap_tiles(
        px, tile_fn, (side, side), depth=depth, block=block, mode="reflect"
    )


def gauss_r2_1024(spark, sf_dir):
    return _gauss_r2(spark, sf_dir, side=1024, block=128)


def global_index_full(spark, sf_dir):
    """The ``stable_global_index`` two-phase plan at 10M synthetic rows.
    NOT a headline suite row: the committed warm best-of-3 protocol
    reuses materialized shuffle stages, which hides exactly the
    single-partition exchange this pattern removes (warm re-runs:
    stock 0.2 s vs engine 0.8 s — residual stages only). The honest
    comparison is COLD, where the checksums match and the shapes
    separate: stock single-partition window 14.75 s, this plan 7.53 s
    on local[32] (recorded in SCALE.md §7d; on a real cluster the
    stock form additionally caps at one executor's memory). Kept as a
    reproducible harness for that measurement."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = spark.range(10_000_000).select(
        F.col("id").alias("event_id"),
        ((F.col("id") * 2654435761) % 2147483647).alias("ts"),
    )
    s = ev.repartitionByRange(32, "ts", "event_id")
    pid = s.withColumn("pid", F.spark_partition_id())
    wp = Window.partitionBy("pid").orderBy("ts", "event_id")
    local = pid.withColumn("rn", F.row_number().over(wp))
    counts = local.groupBy("pid").agg(F.count(F.lit(1)).alias("c"))
    wo = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "off", F.coalesce(F.sum("c").over(wo), F.lit(0))
    ).select("pid", "off")
    idx = local.join(F.broadcast(offsets), "pid").select(
        "event_id", (F.col("off") + F.col("rn") - 1).alias("idx")
    )
    # checksum aggregate: count() alone lets Catalyst PRUNE an unused
    # window entirely (the stock twin measured 0.06 s for a "10M-row
    # sort" before this — the window never ran); folding idx into a sum
    # forces both twins to actually compute every ordinal
    return idx.agg(F.sum(F.col("idx") * (F.col("event_id") % 3)).alias("chk"))


def gauss_r2_4096(spark, sf_dir):
    # 16M px in 256-px tiles: 256 tiles + 4-px halos, the shape a 16k^2
    # microscopy slab would run with proportionally larger tiles
    return _gauss_r2(spark, sf_dir, side=4096, block=256)


def minhash_lsh_4x(spark, sf_dir):
    """dedup_minhash_lsh's exact plan over the 4x vowel-rotated corpus
    (queries/pipeline.py::docs_x4): the band self-join's slope point.
    Same engine operators — the only change is the input frame."""
    from dask_image_spark.operators import textops
    from dask_image_spark.queries.pipeline import docs_x4

    sigs = textops.minhash_signatures(docs_x4(spark, sf_dir), n_hashes=8, k=3)
    return textops.lsh_band_pairs(sigs, n_hashes=8, rows_per_band=2)


def tfidf_pairs_4x(spark, sf_dir):
    """tfidf_cosine_pairs' exact plan over the 4x corpus: the df-pruned
    postings self-join's slope point."""
    from dask_image_spark.queries.curation import tfidf_pairs_impl
    from dask_image_spark.queries.pipeline import docs_x4

    return tfidf_pairs_impl(docs_x4(spark, sf_dir))


def minhash_lsh_16x(spark, sf_dir):
    """Third point on the band-join size axis (1x / 4x / 16x documents):
    with three points the linear-slope claim is measured, not fitted.
    Same engine operators over queries/pipeline.py::docs_x16."""
    from dask_image_spark.operators import textops
    from dask_image_spark.queries.pipeline import docs_x16

    sigs = textops.minhash_signatures(docs_x16(spark, sf_dir), n_hashes=8, k=3)
    return textops.lsh_band_pairs(sigs, n_hashes=8, rows_per_band=2)


def q9_4x(spark, sf_dir):
    """TPC-H q9's exact plan over the 4x-replicated fact table
    (queries/relational.py::lineitem_x4): the broadcast-dim-chain +
    orderkey-shuffle slope point."""
    from dask_image_spark.queries.relational import lineitem_x4, q9_profit_over

    return q9_profit_over(spark, sf_dir, lineitem_x4(spark, sf_dir))


def q21_4x(spark, sf_dir):
    """TPC-H q21's exact plan over the 4x fact table: the triple
    lineitem self-join (semi + anti + inner on one l_orderkey key)
    slope point — the heaviest shuffle shape in the TPC-H suite."""
    from dask_image_spark.queries.relational import (
        lineitem_x4,
        q21_waiting_over,
    )

    return q21_waiting_over(spark, sf_dir, lineitem_x4(spark, sf_dir))


def emb_x8(spark, sf_dir):
    """8x-augmented 2-D point set from embeddings: copy k shifts x by
    k*0.11 (preserves per-stripe density — stripes barely overlap at
    eps=0.08, so the blocked plan's cell histogram stays realistic).
    Used identically by the engine and stock DBSCAN twins."""
    from pyspark.sql import functions as F

    from dask_image_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        F.col("embedding").getItem(0).cast("double").alias("x"),
        F.col("embedding").getItem(1).cast("double").alias("y"),
    )
    n = base.count()
    copies = spark.range(8).select(F.col("id").cast("int").alias("k"))
    return base.crossJoin(F.broadcast(copies)).select(
        (F.col("vec_id") + F.col("k") * n).alias("vec_id"),
        (F.col("x") + F.col("k") * 0.11).alias("x"),
        "y",
    )


def dbscan_8x(spark, sf_dir):
    """The graded query's blocked plan (queries/curation.py::
    dbscan_core_counts) over the 8x point set."""
    from dask_image_spark.queries.curation import dbscan_core_counts

    return dbscan_core_counts(emb_x8(spark, sf_dir))


# 45% site density: below the square-lattice percolation threshold
# (~0.5927), so the mask shatters into MANY small components — the
# adversarial regime for labeling (maximum label count, maximum cross-block
# boundary contacts) while keeping component diameters small.
LABEL_DENSITY_PERMILLE = 450


def label_mask(spark, side: int):
    """Deterministic side x side noise mask, 45% foreground (xxhash64 of
    the ravel index — reproducible across engines/runs with no RNG).
    Imported by the stock twin (scripts/baseline_stock.py::label_minprop)
    so the A/B can never silently de-pair."""
    from pyspark.sql import functions as F

    return spark.range(side * side).select(
        (F.col("id") % side).cast("int").alias("y"),
        (F.col("id") / side).cast("int").alias("x"),
        (
            F.abs(F.xxhash64(F.col("id"))) % 1000 < LABEL_DENSITY_PERMILLE
        ).alias("m"),
    )


def _label_cc(spark, sf_dir, side: int):
    """Connected-component labeling of the noise mask through the engine's
    3-stage plan (operators/label_cc.py::label — per-block pandas
    pre-label, ONE boundary-contact self-join, driver union-find over the
    bounded cross-block edge set, broadcast-map relabel). Blocks scale
    with the image like the gauss tile points (side/8), so the slope
    measures the ALGORITHM, not a parallelism cliff. The count() forces
    the full (y, x, label) frame."""
    from dask_image_spark.operators.label_cc import label

    return label(
        label_mask(spark, side), (side, side), block=max(64, side // 8)
    )


def label_cc_1x(spark, sf_dir):
    return _label_cc(spark, sf_dir, side=512)


def label_cc_4x(spark, sf_dir):
    return _label_cc(spark, sf_dir, side=1024)


def label_cc_16x(spark, sf_dir):
    return _label_cc(spark, sf_dir, side=2048)


def label_cc_64x(spark, sf_dir):
    return _label_cc(spark, sf_dir, side=4096)


# ---- round-14 SCALE_ROWS builders (see the SCALE_ROWS comment above) ----

# Fourth size point for the band-join slope: 64 copies = the 16x corpus
# crossed with 4 rotations of a THIRD letter class ("dgmpv" — disjoint
# from the vowel and "rstln" classes, so every composed transform still
# produces a distinct token stream and shingles replicate i.i.d.).
X64_CROTS = ("dgmpv", "gmpvd", "mpvdg", "pvdgm")


def docs_x64(spark, sf_dir):
    """The 64x-augmented documents frame (fourth band-join slope point)."""
    from pyspark.sql import functions as F

    from dask_image_spark.queries.pipeline import X4_OFFSET, docs_x16

    d = docs_x16(spark, sf_dir)
    out = None
    for c, rot in enumerate(X64_CROTS):
        cp = d.select(
            (F.col("doc_id") + c * 16 * X4_OFFSET).alias("doc_id"),
            F.translate("text", "dgmpv", rot).alias("text"),
        )
        out = cp if out is None else out.unionAll(cp)
    return out


def minhash_lsh_64x(spark, sf_dir):
    """dedup_minhash_lsh's exact plan over the 64x corpus — the point
    where the signature+band pipeline is compute-bound, not latency-bound
    (8.6 s at 32 cores, 8-vs-32 ratio 1.89 at add time)."""
    from dask_image_spark.operators import textops

    sigs = textops.minhash_signatures(docs_x64(spark, sf_dir), n_hashes=8, k=3)
    return textops.lsh_band_pairs(sigs, n_hashes=8, rows_per_band=2)


def gauss_r2_8192(spark, sf_dir):
    """Third point on the R2 tile-path size axis: 8192^2 = 67M px in
    512-px tiles (5.5 s at 32 cores, 8-vs-32 ratio 1.82 at add time)."""
    return _gauss_r2(spark, sf_dir, side=8192, block=512)


def label_cc_256x(spark, sf_dir):
    """Fifth label slope point: 8192^2 = 67M px, ~30M foreground
    (REBUILD protocol like the other label rows)."""
    return _label_cc(spark, sf_dir, side=8192)


def main() -> None:
    from dask_image_spark import queries as q
    from dask_image_spark.session import get_spark

    q.load_all()
    spark = get_spark(app_name="dask-image-spark-bench", master=f"local[{CPUS}]")
    registry = q.all_queries()

    results: dict[str, float] = {}
    errors: dict[str, str] = {}
    for label, name in HEADLINE + SCALE_ROWS:
        # BASELINE.md methodology: build the DataFrame once, warm once, then
        # best-of-3 wall-clock on a full materialization of the same plan.
        # Per-query fault isolation: one broken query must never zero the
        # round's bench evidence (round-4 lesson — a single AnalysisException
        # aborted the loop and the whole round had no numbers).
        try:
            specials = {
                "__conv3x3_fullscale__": conv3x3_fullscale,
                "__gauss_r2_1024__": gauss_r2_1024,
                "__gauss_r2_4096__": gauss_r2_4096,
                "__minhash_lsh_4x__": minhash_lsh_4x,
                "__tfidf_pairs_4x__": tfidf_pairs_4x,
                "__minhash_lsh_16x__": minhash_lsh_16x,
                "__q9_4x__": q9_4x,
                "__q21_4x__": q21_4x,
                "__dbscan_8x__": dbscan_8x,
                "__label_cc_1x__": label_cc_1x,
                "__label_cc_4x__": label_cc_4x,
                "__label_cc_16x__": label_cc_16x,
                "__label_cc_64x__": label_cc_64x,
                "__minhash_lsh_64x__": minhash_lsh_64x,
                "__gauss_r2_8192__": gauss_r2_8192,
                "__label_cc_256x__": label_cc_256x,
            }
            # registry[name]: a KeyError names the missing query, instead
            # of the opaque NoneType-not-callable a .get fallback produced
            # (ADVICE r6); the try/except isolates it per query either way
            fn = specials[name] if name in specials else registry[name]
            if label in REBUILD:
                # construction does the work (eager internal jobs):
                # rebuild + count per iteration, warm once, best-of-3
                fn(spark, SF_DIR).count()  # warm-up
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    fn(spark, SF_DIR).count()
                    best = min(best, time.perf_counter() - t0)
                results[label] = round(best, 4)
                continue
            df = fn(spark, SF_DIR)
            df.count()  # warm-up (codegen + page cache)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                df.count()
                best = min(best, time.perf_counter() - t0)
            results[label] = round(best, 4)
        except Exception as e:  # noqa: BLE001 — isolate ANY per-query failure
            errors[label] = f"{type(e).__name__}: {e}"[:500]
        finally:
            # drop persisted intermediates (tfidf postings, PMI count
            # tables) so caches never accumulate across the suite
            q.release_caches()

    try:
        sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None
    # A partial total must never be mistaken for a full-suite number: when
    # any query failed, value is null and the n_ok/n_expected counts say
    # how much of the suite the per-query timings cover.
    # `value` stays the sum over the ORIGINAL 27 headline labels so the
    # round-over-round total is comparable despite the round-14 SCALE_ROWS
    # additions; `value_with_scale_rows` sums everything that ran.
    headline_labels = {label for label, _ in HEADLINE}
    out = {
        "metric": "headline_suite_total",
        "value": (
            round(sum(v for k, v in results.items() if k in headline_labels), 4)
            if not errors
            else None
        ),
        "unit": "sec",
        "queries": results,
        "value_with_scale_rows": (
            round(sum(results.values()), 4) if not errors else None
        ),
        "n_ok": len(results),
        "n_expected": len(HEADLINE) + len(SCALE_ROWS),
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
