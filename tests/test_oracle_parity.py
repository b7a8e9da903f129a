"""The workhorse: every registered strong-oracle query must match its DuckDB
oracle at sf0.01 — the same check the driver runs, executed locally first."""

from __future__ import annotations

import pytest

from dask_image_spark import queries as q
from tests.parity import compare

q.load_all()

STRONG = sorted(q.all_oracles().keys())


@pytest.mark.parametrize("name", STRONG)
def test_oracle_parity(spark, sf_dir, name):
    fn = q.all_queries()[name]
    oracle = q.all_oracles()[name]
    problems = compare(fn(spark, sf_dir), oracle, sf_dir)
    assert not problems, f"{name}: " + "; ".join(problems)


WEAK = sorted(set(q.all_queries()) - set(STRONG))


@pytest.mark.parametrize("name", WEAK)
def test_weak_queries_run(spark, sf_dir, name):
    df = q.all_queries()[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
