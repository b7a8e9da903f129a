#!/usr/bin/env python
"""Stock-PySpark baseline suite (the BASELINE.md bar), committed so the
numbers can be re-measured in the SAME session as bench.py — environment
drift (round-4 A/B showed ~1.3×) otherwise makes cross-round totals lie.

Methodology mirrors BASELINE.md: plain PySpark (no engine code), the query
texts from BASELINE.md §"Query texts", warm once then best-of-3 wall-clock
on a full .count(). Stock config: shuffle.partitions=8 (the baseline's
original choice), nanosAsLong defensively (harmless when ts is µs).

Prints ONE JSON line {"metric": "stock_baseline_total", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

# repo root on sys.path: the dedup/gauss twins import the ENGINE's fixture
# constants (dup stride/offset, gaussian taps) so the A/B can never silently
# de-pair — which requires the package to be importable when this script is
# run as `python scripts/baseline_stock.py`
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_stock_spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("stock-baseline")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "4g")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def register(spark):
    from pyspark.sql import functions as F

    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        df = spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet"))
        if t == "events":
            # stock normalization, mirroring what any user must do for the
            # current physical encoding (ns-long legacy or µs NTZ)
            dt = dict(df.dtypes).get("ts")
            if dt == "bigint":
                df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
            elif dt == "timestamp_ntz":
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        df.createOrReplaceTempView(t)


def q1(spark):
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, sum(l_quantity) sq,
               sum(l_extendedprice) sp,
               sum(l_extendedprice*(1-l_discount)) disc, avg(l_quantity) aq,
               count(*) c
        FROM lineitem WHERE l_shipdate <= timestamp '1998-09-02'
        GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
        """
    )


def q3(spark):
    return spark.sql(
        """
        SELECT o.o_orderkey, sum(l.l_extendedprice*(1-l.l_discount)) rev,
               o.o_orderdate
        FROM customer c JOIN orders o ON c.c_custkey=o.o_custkey
        JOIN lineitem l ON l.l_orderkey=o.o_orderkey
        WHERE c.c_mktsegment='BUILDING'
        GROUP BY o.o_orderkey, o.o_orderdate ORDER BY rev DESC LIMIT 10
        """
    )


def window_rank(spark):
    return spark.sql(
        """
        SELECT * FROM (SELECT user_id, event_type, value, ts,
          row_number() OVER (PARTITION BY user_id ORDER BY value DESC) rn
          FROM events) WHERE rn <= 3
        """
    )


def sessionize(spark):
    return spark.sql(
        """
        WITH g AS (SELECT user_id, ts,
          CASE WHEN unix_timestamp(ts)-unix_timestamp(lag(ts) OVER w) > 1800
                 OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END brk
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts))
        SELECT user_id, sum(brk) OVER (PARTITION BY user_id ORDER BY ts) sess
        FROM g
        """
    )


def similarity_top10(spark):
    from pyspark.sql import functions as F

    emb = spark.table("embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q")
    )
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            (
                F.expr(
                    "aggregate(zip_with(embedding, q, (a,b)->a*b), 0D, (acc,x)->acc+x)"
                )
                / (
                    F.expr(
                        "sqrt(aggregate(transform(embedding, a->a*a), 0D, (acc,x)->acc+x))"
                    )
                    * F.expr(
                        "sqrt(aggregate(transform(q, a->a*a), 0D, (acc,x)->acc+x))"
                    )
                )
            ).alias("cos"),
        )
        .orderBy(F.desc("cos"))
        .limit(10)
    )


def exact_dedup_docs(spark):
    # same duplicate-augmented corpus as the engine query (round 6),
    # interpolated from the ENGINE's own constants so a contract change
    # there can never silently de-pair the A/B (ADVICE r6)
    from dask_image_spark.queries.pipeline import _DUP_OFFSET, _DUP_STRIDE

    return spark.sql(
        f"""
        WITH aug AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + {_DUP_OFFSET} AS doc_id, text FROM documents
          WHERE doc_id % {_DUP_STRIDE} = 0 AND text IS NOT NULL)
        SELECT sha2(text,256) h, count(*) c FROM aug GROUP BY h
        HAVING count(*) > 1
        """
    )


def conv3x3_sim(spark):
    return spark.sql(
        """
        WITH px AS (SELECT CAST(event_id % 300 AS INT) y,
                           CAST(event_id/300 AS INT) x, value FROM events),
        k AS (SELECT * FROM VALUES (-1,-1,0.1),(-1,0,0.1),(-1,1,0.1),
              (0,-1,0.1),(0,0,0.2),(0,1,0.1),(1,-1,0.1),(1,0,0.1),(1,1,0.1)
              t(dy,dx,w))
        SELECT p.y+k.dy yy, p.x+k.dx xx, sum(p.value*k.w) v
        FROM px p CROSS JOIN k GROUP BY p.y+k.dy, p.x+k.dx
        """
    )


def minhash_lsh(spark):
    hs = ", ".join(
        f"min(md5(concat('{s}:', sh))) h{s}" for s in range(8)
    )
    bands = " UNION ALL ".join(
        f"SELECT doc_id, {b} band_id, concat(h{2 * b}, h{2 * b + 1}) sig FROM mh"
        for b in range(4)
    )
    return spark.sql(
        f"""
        WITH toks AS (SELECT doc_id, split(text, ' ') t FROM documents
                      WHERE size(split(text, ' ')) >= 3),
        sh AS (SELECT doc_id, explode(transform(sequence(0, size(t)-3),
                   i -> concat_ws(' ', slice(t, i+1, 3)))) sh FROM toks),
        mh AS (SELECT doc_id, {hs} FROM sh GROUP BY doc_id),
        bands AS ({bands})
        SELECT DISTINCT a.doc_id doc_a, b.doc_id doc_b
        FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.sig = b.sig
        WHERE a.doc_id < b.doc_id
        """
    )


def ivf_topk(spark):
    from pyspark.sql import functions as F

    emb = spark.table("embeddings")
    dims = emb.select(
        "label", F.posexplode("embedding").alias("i", "a")
    ).groupBy("label", "i").agg(F.avg("a").alias("m"))
    cvecs = dims.groupBy("label").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(i, m))), s -> s.m)"
        ).alias("cvec")
    )
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    cos = (
        "aggregate(zip_with({a}, {b}, (x,y)->x*y), 0D, (acc,x)->acc+x) / "
        "(sqrt(aggregate(transform({a}, x->x*x), 0D, (acc,x)->acc+x)) * "
        "sqrt(aggregate(transform({b}, x->x*x), 0D, (acc,x)->acc+x)))"
    )
    probe = (
        cvecs.crossJoin(F.broadcast(qv))
        .select("label", F.expr(cos.format(a="cvec", b="qv")).alias("c"))
        .orderBy(F.desc("c"))
        .limit(1)
        .select("label")
    )
    return (
        emb.join(F.broadcast(probe), "label")
        .filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id", F.expr(cos.format(a="embedding", b="qv")).alias("cos")
        )
        .orderBy(F.desc("cos"))
        .limit(10)
    )


def curation_pipeline(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    docs = spark.table("documents")
    sampled = docs.filter(
        F.expr(
            "substr(md5(concat('strat7:', CAST(doc_id AS STRING))), 1, 2) < "
            "CASE WHEN lang = 'en' THEN '40' ELSE 'cc' END"
        )
    )
    keeper = (
        sampled.groupBy(F.sha2("text", 256).alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
    )
    dedup = sampled.withColumn("h", F.sha2("text", 256)).join(
        keeper, ["h", "doc_id"]
    )
    qual = dedup.filter(F.size(F.split(F.col("text"), " ")) >= 20).select(
        "doc_id", "lang", F.size(F.split(F.col("text"), " ")).alias("n_tok")
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        bins, cur, cur_tok = [], 0, 0
        for t in pdf["n_tok"]:
            if cur_tok + t > 512 and cur_tok > 0:
                cur += 1
                cur_tok = 0
            bins.append(cur)
            cur_tok += t
        pdf = pdf.assign(bin=bins)
        return pdf[["doc_id", "lang", "n_tok", "bin"]]

    packed = qual.groupBy("lang").applyInPandas(
        pack, schema="doc_id long, lang string, n_tok int, bin long"
    )
    return packed.groupBy("lang", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("n_tokens")
    )


def rolling_1h(spark):
    return spark.sql(
        """
        SELECT event_id, user_id,
               COUNT(*) OVER w AS n_1h, AVG(value) OVER w AS avg_1h,
               SUM(value) OVER w AS sum_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY CAST(unix_micros(ts) AS BIGINT)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        """
    )


def tfidf_pairs(spark):
    # the first-correct-thing a stock user writes: tf/df/norms as separate
    # CTE branches, norm re-joins (no persist, no window-norm) — Spark
    # re-derives each branch from the corpus
    return spark.sql(
        """
        WITH tok AS (
          SELECT doc_id, explode(split(text, ' ')) AS tok
          FROM documents WHERE text IS NOT NULL),
        tf AS (
          SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS tf
          FROM tok WHERE tok <> '' GROUP BY doc_id, tok),
        df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs
              FROM documents WHERE text IS NOT NULL),
        w AS (
          SELECT tf.doc_id, tf.tok, tf.tf * ln(n.n_docs / df.df) AS w
          FROM tf JOIN df USING (tok) CROSS JOIN n WHERE df.df <= 50),
        nrm AS (SELECT doc_id, sqrt(SUM(w * w)) AS nm FROM w GROUP BY doc_id),
        p AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, SUM(a.w * b.w) AS dot
          FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
        SELECT doc_a, doc_b, p.dot / (x.nm * y.nm) AS cos
        FROM p JOIN nrm x ON x.doc_id = p.doc_a
               JOIN nrm y ON y.doc_id = p.doc_b
        WHERE p.dot / (x.nm * y.nm) >= 0.3
        """
    )


def _gauss_r2(spark, side: int):
    """Stock twin of bench.py's gauss_r2 points: the same dense side x side
    data-derived grid, 9x9 separable gaussian expressed the way a stock
    PySpark user writes a stencil — two chained 1-D 9-tap scatter
    join-aggregates (one shuffle per axis)."""
    from dask_image_spark.functions import kernels as K

    n = spark.table("events").count()
    # the ENGINE's own taps, so the stock twin convolves the identical
    # kernel the bench query does (ADVICE r6 — no duplicated literals)
    taps = K.gaussian_taps_1d(1.0)
    tap_sql = ", ".join(f"({d}, CAST({w!r} AS DOUBLE))" for d, w in taps)
    return spark.sql(
        f"""
        WITH px AS (
          SELECT CAST(r.id % {side} AS INT) y, CAST(r.id DIV {side} AS INT) x,
                 e.value
          FROM range({side * side}) r JOIN events e ON e.event_id = r.id % {n}),
        k AS (SELECT * FROM VALUES {tap_sql} t(d, w)),
        p1 AS (SELECT p.y + k.d AS y, p.x, SUM(p.value * k.w) AS v
               FROM px p CROSS JOIN k GROUP BY p.y + k.d, p.x)
        SELECT p1.y, p1.x + k.d AS x, SUM(p1.v * k.w) AS v
        FROM p1 CROSS JOIN k GROUP BY p1.y, p1.x + k.d
        """
    )


def gauss_r2_1024(spark):
    return _gauss_r2(spark, 1024)


def gauss_r2_4096(spark):
    return _gauss_r2(spark, 4096)


def pit_join(spark):
    # stock point-in-time join: the natural SQL formulation — LEAD builds
    # validity intervals, then an interval-containment join (equi custkey
    # + date range predicate). The engine's twin reformulates this as
    # union + last-value carry over one sort (queries/relational.py
    # pit_join_scd2); same fixture, same output contract.
    return spark.sql(
        """
        WITH dim AS (
          SELECT c_custkey, TIMESTAMP '1995-01-01 00:00:00' AS eff, 5 AS disc
          FROM customer
          UNION ALL
          SELECT c_custkey, TIMESTAMP '1997-01-01 00:00:00', 7
          FROM customer WHERE c_custkey % 3 = 0
          UNION ALL
          SELECT c_custkey, TIMESTAMP '1999-01-01 00:00:00', 9
          FROM customer WHERE c_custkey % 5 = 0),
        iv AS (
          SELECT c_custkey, eff, disc,
                 LEAD(eff) OVER (PARTITION BY c_custkey ORDER BY eff) AS eff_end
          FROM dim)
        SELECT o.o_orderkey, o.o_custkey, CAST(iv.disc AS INT) AS disc,
               ROUND(o.o_totalprice * (100 - iv.disc) / 100.0, 4) AS net_price
        FROM orders o
        JOIN iv ON iv.c_custkey = o.o_custkey
               AND o.o_orderdate >= iv.eff
               AND (iv.eff_end IS NULL OR o.o_orderdate < iv.eff_end)
        WHERE o.o_orderkey % 7 = 0
        """
    )


def _register_docs4x(spark):
    # the ENGINE's augmentation constants (queries/pipeline.py::docs_x4),
    # interpolated so the 4x slope A/B can never silently de-pair
    from dask_image_spark.queries.pipeline import X4_OFFSET, X4_ROTS

    union = " UNION ALL ".join(
        f"SELECT doc_id + {c * X4_OFFSET} AS doc_id, "
        f"translate(text, 'aeiou', '{rot}') AS text FROM documents"
        for c, rot in enumerate(X4_ROTS)
    )
    spark.sql(
        f"CREATE OR REPLACE TEMP VIEW documents4 AS {union}"
    )


def minhash_lsh_4x(spark):
    # the stock minhash query text over the 4x vowel-rotated corpus —
    # the slope twin of bench.py::minhash_lsh_4x
    _register_docs4x(spark)
    hs = ", ".join(
        f"min(md5(concat('{s}:', sh))) h{s}" for s in range(8)
    )
    bands = " UNION ALL ".join(
        f"SELECT doc_id, {b} band_id, concat(h{2 * b}, h{2 * b + 1}) sig FROM mh"
        for b in range(4)
    )
    return spark.sql(
        f"""
        WITH toks AS (SELECT doc_id, split(text, ' ') t FROM documents4
                      WHERE size(split(text, ' ')) >= 3),
        sh AS (SELECT doc_id, explode(transform(sequence(0, size(t)-3),
                   i -> concat_ws(' ', slice(t, i+1, 3)))) sh FROM toks),
        mh AS (SELECT doc_id, {hs} FROM sh GROUP BY doc_id),
        bands AS ({bands})
        SELECT DISTINCT a.doc_id doc_a, b.doc_id doc_b
        FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.sig = b.sig
        WHERE a.doc_id < b.doc_id
        """
    )


def tfidf_pairs_4x(spark):
    # the stock tfidf-pairs query text over the 4x corpus (df prune kept
    # at the same absolute 50: the rotation replicates vocabulary i.i.d.,
    # so per-term df distributions are unchanged)
    _register_docs4x(spark)
    return spark.sql(
        """
        WITH tok AS (
          SELECT doc_id, explode(split(text, ' ')) AS tok
          FROM documents4 WHERE text IS NOT NULL),
        tf AS (
          SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS tf
          FROM tok WHERE tok <> '' GROUP BY doc_id, tok),
        df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs
              FROM documents4 WHERE text IS NOT NULL),
        w AS (
          SELECT tf.doc_id, tf.tok, tf.tf * ln(n.n_docs / df.df) AS w
          FROM tf JOIN df USING (tok) CROSS JOIN n WHERE df.df <= 50),
        nrm AS (SELECT doc_id, sqrt(SUM(w * w)) AS nm FROM w GROUP BY doc_id),
        p AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, SUM(a.w * b.w) AS dot
          FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
        SELECT doc_a, doc_b, p.dot / (x.nm * y.nm) AS cos
        FROM p JOIN nrm x ON x.doc_id = p.doc_a
               JOIN nrm y ON y.doc_id = p.doc_b
        WHERE p.dot / (x.nm * y.nm) >= 0.3
        """
    )


_Q9_SQL = """
SELECT n.n_name, CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
       SUM(l.l_extendedprice * (1 - l.l_discount)
           - 0.6 * p.p_retailprice * l.l_quantity) AS profit
FROM {lineitem} l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%bolt%'
GROUP BY n.n_name, YEAR(o.o_orderdate)
"""

_Q21_SQL = """
SELECT s.s_name, COUNT(*) AS numwait
FROM {lineitem} l1
JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM {lineitem} l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM {lineitem} l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 25
"""


def _register_lineitem4(spark):
    # the ENGINE's fact-growth augmentation (queries/relational.py::
    # lineitem_x4): rows 4x, key domain unchanged
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW lineitem4 AS "
        "SELECT l.* FROM lineitem l "
        "CROSS JOIN (VALUES (0), (1), (2), (3)) c(i)"
    )


def _register_docs16x(spark):
    from dask_image_spark.queries.pipeline import X4_OFFSET, X4_ROTS, X16_CROTS

    union = " UNION ALL ".join(
        f"SELECT doc_id + {(c * 4 + c2) * X4_OFFSET} AS doc_id, "
        f"translate(translate(text, 'aeiou', '{rot}'), 'rstln', '{crot}')"
        f" AS text FROM documents"
        for c, rot in enumerate(X4_ROTS)
        for c2, crot in enumerate(X16_CROTS)
    )
    spark.sql(f"CREATE OR REPLACE TEMP VIEW documents16 AS {union}")


def minhash_lsh_16x(spark):
    # the stock twin of bench.py::minhash_lsh_16x (third slope point)
    _register_docs16x(spark)
    hs = ", ".join(
        f"min(md5(concat('{s}:', sh))) h{s}" for s in range(8)
    )
    bands = " UNION ALL ".join(
        f"SELECT doc_id, {b} band_id, concat(h{2 * b}, h{2 * b + 1}) sig FROM mh"
        for b in range(4)
    )
    return spark.sql(
        f"""
        WITH toks AS (SELECT doc_id, split(text, ' ') t FROM documents16
                      WHERE size(split(text, ' ')) >= 3),
        sh AS (SELECT doc_id, explode(transform(sequence(0, size(t)-3),
                   i -> concat_ws(' ', slice(t, i+1, 3)))) sh FROM toks),
        mh AS (SELECT doc_id, {hs} FROM sh GROUP BY doc_id),
        bands AS ({bands})
        SELECT DISTINCT a.doc_id doc_a, b.doc_id doc_b
        FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.sig = b.sig
        WHERE a.doc_id < b.doc_id
        """
    )


def q9(spark):
    return spark.sql(_Q9_SQL.format(lineitem="lineitem"))


def q21(spark):
    return spark.sql(_Q21_SQL.format(lineitem="lineitem"))


def q9_4x(spark):
    _register_lineitem4(spark)
    return spark.sql(_Q9_SQL.format(lineitem="lineitem4"))


def q21_4x(spark):
    _register_lineitem4(spark)
    return spark.sql(_Q21_SQL.format(lineitem="lineitem4"))


def global_index(spark):
    # stock global ordinal: ROW_NUMBER over an unpartitioned ORDER BY —
    # every one of the 10M rows funnels through ONE partition's sort.
    # The engine's twin (bench.py::global_index_full) range-partitions
    # and prefix-sums per-partition counts instead. Same synthetic data.
    from pyspark.sql import functions as F

    ev = spark.range(10_000_000).select(
        F.col("id").alias("event_id"),
        ((F.col("id") * 2654435761) % 2147483647).alias("ts"),
    )
    ev.createOrReplaceTempView("gidx_ev")
    # same checksum aggregate as the engine twin: without it, count()
    # lets Catalyst prune the window and the sort never runs
    return spark.sql(
        """
        SELECT SUM(idx * (event_id % 3)) AS chk FROM (
          SELECT event_id,
                 ROW_NUMBER() OVER (ORDER BY ts, event_id) - 1 AS idx
          FROM gidx_ev)
        """
    )


def dbscan_allpairs_8x(spark):
    # stock DBSCAN core counting: the naive all-pairs distance product
    # (16k x 16k at sf0.1) filtered to eps — no blocking. The engine twin
    # (bench.py::dbscan_8x) runs the SAME augmented points through the
    # 9-cell eps-grid equi-join; augmentation imported from bench.py so
    # the two sides can never de-pair.
    import bench as engine_bench
    from dask_image_spark.queries.curation import _DBSCAN_EPS, _DBSCAN_MINPTS

    pts = engine_bench.emb_x8(spark, SF_DIR)
    pts.createOrReplaceTempView("dbscan_pts_8x")
    return spark.sql(
        f"""
        SELECT a.vec_id, COUNT(*) AS n_neighbors,
               CASE WHEN COUNT(*) >= {_DBSCAN_MINPTS} THEN 1 ELSE 0 END
                 AS is_core
        FROM dbscan_pts_8x a JOIN dbscan_pts_8x b
          ON (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
             <= {_DBSCAN_EPS * _DBSCAN_EPS}
        GROUP BY a.vec_id
        """
    )


def _label_minprop(spark, side: int):
    """Stock connected-component labeling: the textbook recursive
    min-label-propagation join in plain PySpark — every pixel starts as
    its own label, each round takes the min over the 4-neighbors, loop
    until a fixpoint. O(component diameter) shuffle rounds (each a 4-way
    union + groupBy + join over the full pixel set) vs the engine's
    O(1)-round block-pre-label + boundary-edge merge
    (bench.py::label_cc_*). The mask fixture is imported from bench.py
    so the A/B can never silently de-pair. localCheckpoint per round is
    REQUIRED even for the stock twin (without it the plan doubles every
    iteration and the comparison measures lineage explosion, not the
    algorithm)."""
    import bench as engine_bench
    from pyspark.sql import functions as F

    mask = engine_bench.label_mask(spark, side)
    lbl = (
        mask.filter("m")
        .select("y", "x")
        .withColumn(
            "lbl", F.col("y").cast("long") * side + F.col("x")
        )
        .localCheckpoint()
    )
    offsets = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    while True:
        nbrs = None
        for dy, dx in offsets:
            s = lbl.select(
                (F.col("y") + dy).alias("y"),
                (F.col("x") + dx).alias("x"),
                F.col("lbl").alias("nlbl"),
            )
            nbrs = s if nbrs is None else nbrs.unionByName(s)
        best = nbrs.groupBy("y", "x").agg(F.min("nlbl").alias("minn"))
        new = (
            lbl.join(best, ["y", "x"], "left")
            .select(
                "y",
                "x",
                F.least(
                    F.col("lbl"), F.coalesce("minn", F.col("lbl"))
                ).alias("lbl"),
                (F.coalesce("minn", F.col("lbl")) < F.col("lbl")).alias(
                    "chg"
                ),
            )
            .localCheckpoint()
        )
        done = new.filter("chg").limit(1).count() == 0
        lbl = new.select("y", "x", "lbl")
        if done:
            return lbl


def label_minprop_1x(spark):
    return _label_minprop(spark, 512)


def label_minprop_4x(spark):
    return _label_minprop(spark, 1024)


def label_minprop_16x(spark):
    return _label_minprop(spark, 2048)


SUITE = [
    ("q1", q1),
    ("q3", q3),
    ("window_rank", window_rank),
    ("sessionize", sessionize),
    ("similarity_top10", similarity_top10),
    ("exact_dedup_docs", exact_dedup_docs),
    ("conv3x3", conv3x3_sim),
    ("minhash_lsh", minhash_lsh),
    ("ivf_topk", ivf_topk),
    ("curation_pipeline", curation_pipeline),
    ("rolling_1h", rolling_1h),
    ("tfidf_pairs", tfidf_pairs),
    ("gauss_r2_1024", gauss_r2_1024),
    ("gauss_r2_4096", gauss_r2_4096),
    ("pit_join", pit_join),
    ("minhash_lsh_4x", minhash_lsh_4x),
    ("tfidf_pairs_4x", tfidf_pairs_4x),
    ("minhash_lsh_16x", minhash_lsh_16x),
    ("q9", q9),
    ("q21", q21),
    ("q9_4x", q9_4x),
    ("q21_4x", q21_4x),
    ("dbscan_8x", dbscan_allpairs_8x),
    # round-10: label slope twins. REBUILD protocol (the iterative loop
    # runs at construction — see bench.py::REBUILD): rebuild + count per
    # timed iteration, warm once, best-of-3.
    ("label_cc_1x", label_minprop_1x),
    ("label_cc_4x", label_minprop_4x),
    ("label_cc_16x", label_minprop_16x),
    # global_index deliberately NOT in the suite: the warm best-of-3
    # protocol reuses the materialized single-partition exchange, hiding
    # the bottleneck the comparison exists to show (see bench.py
    # global_index_full docstring; cold-run A/B recorded in SCALE.md)
]


def main() -> None:
    spark = get_stock_spark()
    register(spark)
    results: dict[str, float] = {}
    errors: dict[str, str] = {}
    import bench as engine_bench

    for label, fn in SUITE:
        try:
            if label in engine_bench.REBUILD:
                # SINGLE timed rebuild for the stock label rows: the
                # min-prop loop re-executes everything on every build
                # (54-250 s per size measured), so warm+best-of-3 would
                # add ~20 min to every paired session while run-to-run
                # variance (±10%) is far below the 6-25x engine/stock
                # separation these rows exist to show. The engine side
                # (cheap, seconds) keeps the full warm best-of-3.
                t0 = time.perf_counter()
                fn(spark).count()
                results[label] = round(time.perf_counter() - t0, 4)
                continue
            df = fn(spark)
            df.count()  # warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                df.count()
                best = min(best, time.perf_counter() - t0)
            results[label] = round(best, 4)
        except Exception as e:  # noqa: BLE001
            errors[label] = f"{type(e).__name__}: {e}"[:500]
    try:
        sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None
    out = {
        "metric": "stock_baseline_total",
        "value": round(sum(results.values()), 4),
        "unit": "sec",
        "queries": results,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
