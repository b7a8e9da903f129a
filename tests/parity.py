"""Local replica of the driver's DuckDB differential check: run the Spark
query and the oracle SQL on the same parquet, compare row count, sorted
column names, and canonicalized values. Tolerant float compare (the driver
hashes; we round on both sides in the queries themselves, so any mismatch
here is a real divergence, not noise)."""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb

from dask_image_spark.sources.tables import TABLE_NAMES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return f"b:{int(v)}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v:.9g}"
    if isinstance(v, (datetime, date)):
        return f"t:{v.isoformat()}"
    if isinstance(v, int):
        return f"i:{v}"
    return f"s:{v}"


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(spark_df, oracle: str, sf_dir: str) -> list[str]:
    """Returns a list of mismatch descriptions; empty == pass."""
    problems = []
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    con = duck_con(sf_dir)
    res = con.execute(oracle)
    d_cols = [d[0] for d in res.description]
    d_rows = [tuple(r) for r in res.fetchall()]

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duck={len(d_rows)}")

    s_canon = _canon_rows(s_cols, s_rows)
    d_canon = _canon_rows(d_cols, d_rows)
    if s_canon != d_canon:
        diff_s = [r for r in s_canon if r not in set(d_canon)][:5]
        diff_d = [r for r in d_canon if r not in set(s_canon)][:5]
        problems.append(
            f"values differ; spark-only sample={diff_s} duck-only sample={diff_d}"
        )
    return problems
