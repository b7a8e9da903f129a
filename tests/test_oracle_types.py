"""Cross-engine TYPE contract for every strong oracle.

The driver's value hash is type-aware: in round 2, three queries whose
values were bit-identical still hash-failed because DuckDB promoted an
integer ``SUM`` / ``list_aggregate`` to HUGEINT while Spark emitted int64.
This test pins the full mapping so the class of bug cannot recur: for each
oracle, DuckDB's ``DESCRIBE`` types (no execution) must pair with the Spark
analyzed schema only in combinations proven hash-equal by a driver pass.

Known-safe pairs (each backed by a driver-green query from rounds 1-2):
int32/int64 hash together (``window_rank.rn`` int vs BIGINT passed), and
Spark timestamp/timestamp_ntz both hash with DuckDB TIMESTAMP
(``window_tumbling.hour_start``, ``agg_stats.first_ship``). HUGEINT — and
anything else unlisted — fails.
"""

from __future__ import annotations

import pytest

from dask_image_spark import queries as q
from tests.conftest import SF_MID, SF_SMALL
from tests.parity import duck_con

q.load_all()

# (spark simple dtype, duckdb DESCRIBE type) pairs allowed to meet.
ALLOWED: set[tuple[str, str]] = {
    ("tinyint", "TINYINT"), ("smallint", "SMALLINT"),
    ("int", "INTEGER"), ("bigint", "BIGINT"),
    # int-width promotion hashes equal driver-side (round-2 evidence).
    ("int", "BIGINT"), ("bigint", "INTEGER"),
    ("int", "SMALLINT"), ("int", "TINYINT"),
    ("float", "REAL"), ("float", "FLOAT"), ("double", "DOUBLE"),
    ("boolean", "BOOLEAN"),
    ("string", "VARCHAR"),
    ("date", "DATE"),
    ("timestamp", "TIMESTAMP"), ("timestamp_ntz", "TIMESTAMP"),
    ("binary", "BLOB"),
}

STRONG = sorted(q.all_oracles().keys())


def _spark_dtypes(spark, name: str, sf: str) -> list[tuple[str, str]]:
    """Spark-side (col, dtype) pairs. Queries tagged "io-write" execute
    jobs and write files at DataFrame-CONSTRUCTION time, so a schema-only
    test must not build them — they are required to declare a static
    ``schema=`` DDL in the registry instead (enforced here)."""
    reg = q.REGISTRY[name]
    if "io-write" in reg.tags:
        assert reg.schema is not None, (
            f"{name} is tagged io-write but declares no static schema; "
            "add schema=... to its @register so type tests stay side-effect-free"
        )
        from pyspark.sql.types import StructType

        st = StructType.fromDDL(reg.schema)
        return [(f.name, f.dataType.simpleString()) for f in st.fields]
    return q.all_queries()[name](spark, sf).dtypes


def test_io_write_static_schemas_match_reality(spark):
    """The static DDLs above must never drift from the real output schema:
    build each io-write query ONCE (side effects allowed in this one test)
    and diff against its declaration."""
    for name, reg in q.REGISTRY.items():
        if "io-write" not in reg.tags or reg.oracle is None:
            continue
        from pyspark.sql.types import StructType

        declared = [
            (f.name, f.dataType.simpleString())
            for f in StructType.fromDDL(reg.schema).fields
        ]
        actual = q.all_queries()[name](spark, SF_SMALL).dtypes
        assert declared == actual, f"{name}: static schema drifted"


@pytest.mark.parametrize("name", STRONG)
def test_oracle_types_match(spark, name):
    oracle = q.all_oracles()[name]
    # scan_binaryfile's oracle glob is pinned to sf0.01 (see its docstring);
    # everything else type-checks at sf0.001 where DF construction is cheap.
    sf = SF_MID if name == "scan_binaryfile" else SF_SMALL
    con = duck_con(sf)
    duck_types = {r[0]: r[1] for r in con.execute(f"DESCRIBE {oracle}").fetchall()}
    bad = []
    for col, stype in _spark_dtypes(spark, name, sf):
        dtype = duck_types.get(col, "<MISSING>")
        if (stype, dtype) not in ALLOWED:
            bad.append(f"{col}: spark={stype} duck={dtype}")
    assert not bad, f"{name}: unlisted type pairing (driver hash risk): {bad}"
