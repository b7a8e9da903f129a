"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API) —
the from-scratch CONNECTOR surface: a deterministic partitioned table
generator registered as ``spark.read.format("rangegen")``.

This is the template every bespoke connector follows: ``partitions()``
declares the split plan (so Spark schedules one task per partition —
the connector, not the engine, owns parallelism), and ``read(part)``
yields that partition's rows executor-side. Partition i generates the
ids congruent to i (mod parts), so the split is a pure function of the
options and the full table is their disjoint union — no driver-side
data, no shared state, arbitrary scale-out. The value column is a
deterministic quadratic-modular formula, which is what lets DuckDB
replay the whole source with generate_series (the oracle for the graded
query): a connector whose content is reproducible from its options is
also a connector whose reads are testable.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

VALUE_MOD = 1000


def gen_value(i: int) -> float:
    """The shared row formula: mirrored verbatim in the DuckDB oracle."""
    return ((i * i * 31 + 7) % VALUE_MOD) / 10.0


class RangeGenReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 8))

    def partitions(self):
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition):
        p = partition.value
        for i in range(p, self.n, self.parts):
            yield (i, p, gen_value(i))


class RangeGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rangegen"

    def schema(self) -> str:
        return "id BIGINT, part INT, value DOUBLE"

    def reader(self, schema):
        return RangeGenReader(self.options)


def register_rangegen(spark) -> None:
    """Idempotent per-session registration."""
    try:
        spark.dataSource.register(RangeGenDataSource)
    except Exception:  # already registered in this session
        pass


class RangeGenStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked streaming read of the same deterministic generator:
    each micro-batch advances the offset by ``chunk`` ids until ``n`` is
    exhausted, then reports caught-up (empty batch, unchanged offset) —
    which is what lets ``processAllAvailable()`` terminate. Exactly-once
    comes from the offset contract alone: ``readBetweenOffsets`` can
    regenerate any committed range deterministically on replay."""

    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.chunk = int(options.get("chunk", 250))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        lo = start["pos"]
        hi = min(lo + self.chunk, self.n)
        return (iter([(i, gen_value(i)) for i in range(lo, hi)]), {"pos": hi})

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([(i, gen_value(i)) for i in range(start["pos"], end["pos"])])


class RangeGenStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rangegen_stream"

    def schema(self) -> str:
        return "id BIGINT, value DOUBLE"

    def simpleStreamReader(self, schema):
        return RangeGenStreamReader(self.options)


def register_rangegen_stream(spark) -> None:
    try:
        spark.dataSource.register(RangeGenStreamDataSource)
    except Exception:
        pass


# --- custom WRITER: NDJSON sink with a manifest commit protocol -------------


@dataclass
class _NdjsonCommit(WriterCommitMessage):
    filename: str
    n_rows: int


class NdjsonManifestWriter(DataSourceWriter):
    """Executor-side ``write(iterator)`` lands one NDJSON file per task
    under a temporary name; the DRIVER-side ``commit(messages)`` writes a
    manifest listing exactly the files of SUCCESSFUL tasks. A reader that
    trusts only the manifest therefore gets exactly-once output even when
    speculative/retried tasks leave stray part files behind — the same
    two-phase contract every table format implements, reduced to its
    essence (the graded query plants a stray uncommitted file to prove
    readers skip it)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ndjson_manifest requires option path=")

    def write(self, iterator):
        import json as _json
        import os as _os
        import uuid as _uuid

        fname = f"part-{_uuid.uuid4().hex}.jsonl"
        n = 0
        with open(_os.path.join(self.path, fname), "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict()) + "\n")
                n += 1
        return _NdjsonCommit(filename=fname, n_rows=n)

    def commit(self, messages):
        import json as _json
        import os as _os

        manifest = {
            "files": sorted(m.filename for m in messages),
            "n_rows": sum(m.n_rows for m in messages),
        }
        with open(_os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            f.write(_json.dumps(manifest))

    def abort(self, messages):
        import os as _os

        for m in messages:
            try:
                _os.remove(_os.path.join(self.path, m.filename))
            except OSError:
                pass


class NdjsonManifestDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ndjson_manifest"

    def writer(self, schema, overwrite):
        return NdjsonManifestWriter(self.options)


def register_ndjson_manifest(spark) -> None:
    try:
        spark.dataSource.register(NdjsonManifestDataSource)
    except Exception:
        pass  # already registered in this session


def read_manifest_files(path: str) -> list[str]:
    import json as _json
    import os as _os

    with open(_os.path.join(path, "_MANIFEST.json")) as f:
        manifest = _json.load(f)
    return [_os.path.join(path, fn) for fn in manifest["files"]]
