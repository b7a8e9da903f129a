"""Training-data curation operators, part 2: the content-shaping stages a
100 TB pretraining pipeline runs between dedup and packing.

Reference parity note: the reference (upstream dask_image) has no direct
analogue for these — they are SURVEY.md §2.B "LLM-data-pipeline" mandated
extensions, designed Spark-first:

- ``pii_redact``       — regex PII scrubbing (emails / phones / IPv4),
                          pure codegen ``regexp_replace`` chain, map-only.
- ``chunk_overlap``    — overlapping context-window chunking (size 64,
                          stride 48), one generator explode, no shuffle.
- ``token_zipf``       — corpus-level Zipf fit (regr_slope over log-log
                          rank/frequency), two partial-agg shuffles.
- ``mine_hard_negatives`` — contrastive hard-negative mining: top-k
                          highest-cosine DIFFERENT-label vectors per
                          anchor, broadcast anchors, no corpus self-join.
- ``dedup_semantic``   — SemDeDup (Abbas et al. 2023): k-means cluster,
                          then near-cosine keep-first dedup WITHIN each
                          cluster only — the cluster step is what makes
                          semantic dedup sub-quadratic at scale.
- ``mix_temperature``  — temperature-weighted source mixing (the
                          multilingual-sampling rule from GPT-3/PaLM data
                          work): w_s ∝ mass_s^α, deterministic hash
                          thinning to each source's quota.

Every query pairs with a strong DuckDB oracle; float compares follow the
repo-wide EPS+round policy (queries/base.py).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dask_image_spark.operators import similarity
from dask_image_spark.queries.base import r as _eps_round, register
from dask_image_spark.sources.tables import load_table

# Synthetic PII augmentation: the test corpus is clean word soup, so both
# engine and oracle append a deterministic doc_id-derived contact line; the
# redaction regexes then have real (and countable) material to scrub. The
# construction is part of the query contract, not a fixture.
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[a-z]{2,}"
_PHONE_RE = "\\+1-555-[0-9]{4}"
_IP_RE = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"


@register(
    "pii_redact",
    f"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@mail.example.com or call +1-555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                  || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR) AS t
      FROM documents WHERE text IS NOT NULL),
    red AS (
      SELECT doc_id, t,
             regexp_replace(regexp_replace(regexp_replace(t,
               '{_EMAIL_RE}', '<EMAIL>', 'g'),
               '{_PHONE_RE}', '<PHONE>', 'g'),
               '{_IP_RE}', '<IP>', 'g') AS rt
      FROM aug)
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS INT) AS n_email,
           CAST(len(regexp_extract_all(regexp_replace(t, '{_EMAIL_RE}',
                '<EMAIL>', 'g'), '{_PHONE_RE}')) AS INT) AS n_phone,
           CAST(len(regexp_extract_all(regexp_replace(regexp_replace(t,
                '{_EMAIL_RE}', '<EMAIL>', 'g'), '{_PHONE_RE}', '<PHONE>',
                'g'), '{_IP_RE}')) AS INT) AS n_ip,
           CAST(length(t) - length(rt) AS INT) AS chars_redacted,
           md5(rt) AS redacted_hash
    FROM red
    """,
    tags=("pipeline", "curation", "pii"),
)
def pii_redact(spark, sf_dir):
    """PII scrubbing — the compliance pass every training corpus runs:
    chained ``regexp_replace`` for emails, then phone numbers, then IPv4
    addresses (order matters: the email pattern must not see digits the
    phone mask already consumed, so counts are taken on the progressively
    redacted string exactly as the replacements are applied). Pure JVM
    codegen expressions, map-only — zero shuffles, linear scan at any
    scale. Patterns use explicit character classes (no \\d / \\w
    shorthand) so Java-regex and RE2 agree byte-for-byte."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@mail.example.com or call +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" from 10."), (F.col("doc_id") % 256).cast("string"),
            F.lit(".0."), ((F.col("doc_id") * 7) % 256).cast("string"),
        ).alias("t"),
    )
    after_email = F.regexp_replace(F.col("t"), _EMAIL_RE, "<EMAIL>")
    after_phone = F.regexp_replace(after_email, _PHONE_RE, "<PHONE>")
    rt = F.regexp_replace(after_phone, _IP_RE, "<IP>")
    return aug.select(
        "doc_id",
        F.regexp_count(F.col("t"), F.lit(_EMAIL_RE)).cast("int").alias("n_email"),
        F.regexp_count(after_email, F.lit(_PHONE_RE)).cast("int").alias("n_phone"),
        F.regexp_count(after_phone, F.lit(_IP_RE)).cast("int").alias("n_ip"),
        (F.length("t") - F.length(rt)).cast("int").alias("chars_redacted"),
        F.md5(rt).alias("redacted_hash"),
    )


@register(
    "chunk_overlap",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS t
      FROM documents
      WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 1),
    s AS (SELECT doc_id, t, unnest(range(0, len(t), 48)) AS s FROM t)
    SELECT doc_id, CAST(s / 48 AS INT) AS chunk_idx,
           CAST(len(t[s + 1:s + 64]) AS INT) AS n_tok,
           t[s + 1] AS first_tok,
           md5(array_to_string(t[s + 1:s + 64], ' ')) AS chunk_hash
    FROM s
    """,
    tags=("pipeline", "curation", "chunking"),
)
def chunk_overlap(spark, sf_dir):
    """Overlapping context-window chunking — size 64 tokens, stride 48
    (16-token overlap), the standard long-document → training-sample
    split. One projected tokenization, one ``sequence``+``explode``
    generator (chunk starts 0, 48, 96, …), ``slice`` per chunk. No
    shuffle at all: a map-side explode whose output is ~1.3× the token
    mass — the plan stays a single codegen stage regardless of corpus
    size. The token array is projected BEFORE the explode (textops.py:22
    documents the Catalyst lambda-inlining trap this avoids)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    t = d.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= 1
    )
    starts = F.sequence(F.lit(0), F.size("t") - 1, F.lit(48))
    exploded = t.select("doc_id", "t", F.explode(starts).alias("s"))
    chunk = F.slice(F.col("t"), F.col("s") + 1, 64)
    return exploded.select(
        "doc_id",
        (F.col("s") / 48).cast("int").alias("chunk_idx"),
        F.size(chunk).cast("int").alias("n_tok"),
        F.element_at(chunk, 1).alias("first_tok"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )


@register(
    "token_zipf",
    """
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE text IS NOT NULL),
    freq AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
    ranked AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS rnk FROM freq)
    SELECT ROUND(1.2345e-8 + regr_slope(ln(c), ln(rnk)), 4) AS zipf_slope,
           ROUND(1.2345e-8 + regr_intercept(ln(c), ln(rnk)), 4)
             AS zipf_intercept,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(c) AS BIGINT) AS n_tokens
    FROM ranked
    """,
    tags=("pipeline", "curation", "stats"),
)
def token_zipf(spark, sf_dir):
    """Corpus Zipf fit — the distribution-health check for a tokenizer /
    corpus pair: OLS slope of ln(frequency) on ln(rank) over the type
    table (natural corpora sit near −1; synthetic or degenerate corpora
    don't). Explode → partial-agg groupBy(token) → single-partition
    ranking window over the TYPE table only (vocab-sized, thousands of
    rows even at 100 TB — the rank window is NOT over the corpus), then
    ``regr_slope``/``regr_intercept``, which partial-aggregate as sums of
    moments. Two shuffles total, both map-side combinable."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tok = d.select(F.explode(F.split("text", " ")).alias("tok"))
    freq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    ranked = freq.select(
        "c",
        F.row_number()
        .over(Window.orderBy(F.col("c").desc(), F.col("tok")))
        .alias("rnk"),
    )
    return ranked.agg(
        _eps_round(F.regr_slope(F.log("c"), F.log("rnk")), 4).alias("zipf_slope"),
        _eps_round(
            F.regr_intercept(F.log("c"), F.log("rnk")), 4
        ).alias("zipf_intercept"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum("c").alias("n_tokens"),
    )


def _cos_sql(av: str, bv: str, dim: int = 64) -> str:
    """DuckDB cosine between two DOUBLE[] expressions, same fold shape as
    ``similarity.cosine``."""
    dot = (
        f"list_aggregate(list_transform(range(1, {dim + 1}), "
        f"i -> {av}[i] * {bv}[i]), 'sum')"
    )
    na = (
        f"sqrt(list_aggregate(list_transform(range(1, {dim + 1}), "
        f"i -> {av}[i] * {av}[i]), 'sum'))"
    )
    nb = (
        f"sqrt(list_aggregate(list_transform(range(1, {dim + 1}), "
        f"i -> {bv}[i] * {bv}[i]), 'sum'))"
    )
    return f"({dot} / ({na} * {nb}))"


@register(
    "mine_hard_negatives",
    f"""
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings),
    anchors AS (SELECT vec_id AS a_id, label AS a_label, v AS av
                FROM e WHERE vec_id < 8),
    scored AS (
      SELECT a.a_id, e.vec_id,
             ROUND(1.2345e-8 + {_cos_sql("a.av", "e.v")}, 4) AS cos_sim
      FROM anchors a JOIN e ON e.label <> a.a_label)
    SELECT a_id AS anchor_id, vec_id AS neg_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY a_id
                ORDER BY cos_sim DESC, vec_id) AS INT) AS rnk,
           cos_sim
    FROM scored
    QUALIFY ROW_NUMBER() OVER (PARTITION BY a_id
            ORDER BY cos_sim DESC, vec_id) <= 5
    """,
    tags=("pipeline", "curation", "contrastive"),
)
def mine_hard_negatives(spark, sf_dir):
    """Contrastive hard-negative mining — for each anchor vector, the
    top-5 most-similar vectors carrying a DIFFERENT label (the negatives
    that actually teach a contrastive model something). The 8-row anchor
    side is broadcast; the corpus side streams through one codegen stage
    scoring cosine per (anchor, candidate) — no corpus self-join, no
    shuffle of vectors; the only Exchange is the per-anchor top-k window
    over scored ids. Ranking orders by the ROUNDED cosine (+ vec_id
    tie-break) so both engines make identical discrete choices."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    anchors = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("a_id"),
        F.col("label").alias("a_label"),
        F.col("v").alias("av"),
    )
    scored = (
        e.crossJoin(F.broadcast(anchors))
        .filter(F.col("label") != F.col("a_label"))
        .select(
            "a_id",
            "vec_id",
            _eps_round(
                similarity.cosine(F.col("av"), F.col("v")), 4
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("a_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 5)
        .select(
            F.col("a_id").alias("anchor_id"),
            F.col("vec_id").alias("neg_id"),
            "rnk",
            "cos_sim",
        )
    )


def _semantic_dedup_oracle() -> str:
    """SemDeDup oracle: replay the identical 2-iter Lloyd assignment
    (similarity.kmeans_lloyd_sql), then within-cluster rounded-cosine
    keep-first dedup."""
    kmeans = similarity.kmeans_lloyd_sql(k=8, iters=2, dim=64)
    cos = _cos_sql("x.v", "y.v")
    return f"""
    {kmeans},
    asg AS (SELECT vec_id, cid FROM a2),
    pairs AS (
      SELECT a.vec_id AS keep_id, b.vec_id AS drop_id
      FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
      JOIN e x ON x.vec_id = a.vec_id
      JOIN e y ON y.vec_id = b.vec_id
      WHERE ROUND(1.2345e-8 + {cos}, 4) >= 0.30)
    SELECT asg.vec_id, CAST(asg.cid AS INT) AS cid
    FROM asg
    WHERE asg.vec_id NOT IN (SELECT drop_id FROM pairs)
    """


@register(
    "dedup_semantic",
    _semantic_dedup_oracle(),
    tags=("pipeline", "curation", "dedup", "kmeans"),
)
def dedup_semantic(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication made sub-quadratic by clustering first — k-means the
    embeddings (the repo's deterministic 2-iter Lloyd), then compute
    pairwise cosine ONLY within each cluster and drop every vector that
    has a ≥τ neighbor with a smaller id (keep-first, same convention as
    the MinHash/LSH dedups). τ=0.30 here because the synthetic embeddings
    are near-orthogonal (measured max within-label cosine ≈0.47); real
    text embeddings would use ≈0.95.

    Scale: the within-cluster self-join shuffles on cid, so pair count is
    Σ|c|² not N² — with k chosen ~√N (SemDeDup uses 11k clusters for
    100M docs) the expected cluster is √N and total pair work ~N^1.5,
    against N² for naive semantic dedup. The k-means step itself is the
    broadcast/partial-agg design graded under `ivf_kmeans_topk`."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    asg = similarity.kmeans_lloyd(
        load_table(spark, sf_dir, "embeddings"), k=8, iters=2
    ).select("vec_id", "cid")
    withv = asg.join(e, "vec_id")
    a = withv.select(
        F.col("vec_id").alias("keep_id"), F.col("cid"), F.col("v").alias("va")
    )
    b = withv.select(
        F.col("vec_id").alias("drop_id"),
        F.col("cid").alias("cid_b"),
        F.col("v").alias("vb"),
    )
    cos = _eps_round(similarity.cosine(F.col("va"), F.col("vb")), 4)
    dropped = (
        a.join(b, (F.col("cid") == F.col("cid_b"))
               & (F.col("keep_id") < F.col("drop_id")))
        .filter(cos >= 0.30)
        .select("drop_id")
        .distinct()
    )
    return (
        asg.join(dropped, asg.vec_id == dropped.drop_id, "left_anti")
        .select("vec_id", F.col("cid").cast("int").alias("cid"))
    )


@register(
    "mix_temperature",
    """
    WITH d AS (
      SELECT source, doc_id, len(string_split(text, ' ')) AS nt
      FROM documents WHERE text IS NOT NULL),
    s AS (SELECT source, COUNT(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS m
          FROM d GROUP BY source),
    w AS (SELECT *, sqrt(m) / SUM(sqrt(m)) OVER () AS wt FROM s),
    rt AS (SELECT *, ROUND(1.2345e-8 + LEAST(1.0, wt * 200 / n_docs), 4)
                    AS rate FROM w)
    SELECT rt.source, CAST(rt.n_docs AS BIGINT) AS n_docs,
           rt.m AS token_mass,
           ROUND(1.2345e-8 + rt.wt, 4) AS weight, rt.rate,
           CAST(SUM(CASE WHEN
                ('0x' || substr(md5('mix9:' || CAST(d.doc_id AS VARCHAR)),
                                1, 4))::INT / 65536.0 < rt.rate
                THEN 1 ELSE 0 END) AS BIGINT) AS n_selected
    FROM d JOIN rt USING (source)
    GROUP BY rt.source, rt.n_docs, rt.m, rt.wt, rt.rate
    """,
    tags=("pipeline", "curation", "sampling"),
)
def mix_temperature(spark, sf_dir):
    """Temperature-weighted source mixing — the multilingual/source
    balancing rule (GPT-3 §2.2, PaLM): sampling weight w_s ∝ mass_s^α
    with α=0.5, so low-resource sources are upsampled relative to their
    token mass. Each source gets quota w_s·N (budget N=200 docs) turned
    into a per-source keep-rate, applied by deterministic md5-hash
    thinning (reproducible, engine-portable, no rand()). The selection
    rate is QUANTIZED (round 4dp) before comparison so the float never
    races the 16-bit hash grid across engines.

    Plan: one partial-agg groupBy(source) for the mass table (20 rows),
    window-sum over it for the normalizer (source-cardinality sized, not
    corpus), broadcast join back, then a second partial-agg groupBy for
    the selected counts. Two corpus-sized shuffles, both map-side
    combinable; the per-doc filter is pure codegen."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    ).select("source", "doc_id", F.size(F.split("text", " ")).alias("nt"))
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("nt").alias("m")
    )
    w = s.select(
        "*",
        (F.sqrt("m") / F.sum(F.sqrt("m")).over(
            Window.partitionBy()
        )).alias("wt"),
    )
    rt = w.select(
        "*",
        _eps_round(
            F.least(F.lit(1.0), F.col("wt") * 200 / F.col("n_docs")), 4
        ).alias("rate"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("mix9:"), F.col("doc_id").cast("string"))),
                1, 4,
            ),
            16, 10,
        ).cast("double")
        / 65536.0
    )
    joined = d.join(F.broadcast(rt), "source")
    return joined.groupBy(
        "source", "n_docs", "m", "wt", "rate"
    ).agg(
        F.sum(F.when(u < F.col("rate"), 1).otherwise(0)).alias("n_selected")
    ).select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("m").cast("long").alias("token_mass"),
        _eps_round("wt", 4).alias("weight"),
        "rate",
        F.col("n_selected").cast("long").alias("n_selected"),
    )
