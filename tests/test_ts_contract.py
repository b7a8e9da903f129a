"""Timestamp-type contract for ``events.ts`` (the round-4 regression class).

The driver's generator has shipped ``ts`` as parquet ``timestamp[ns]``
(rounds 1-3) and ``timestamp[us]`` NTZ (round 4+); a real user's parquet
may equally be µs/ms with UTC adjustment (LTZ). The engine must treat the
physical encoding as data-driven — the reference infers dtypes from the
source (upstream ``dask_image/imread/__init__.py`` reads dtype from the
file), never hard-codes them.

This test synthesizes THREE tiny events tables that differ ONLY in the
physical ts encoding (ns, µs-NTZ, µs-LTZ), then asserts that the batch
loader, the streaming reader, batch sessionization, and a streaming
windowed aggregate produce IDENTICAL schemas and values over each.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

BASE_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in µs

# 8 events, 2 users; user 1 has a >30-min gap after event 3 (2 sessions),
# user 2 has one session. Crafted so sessionize/session windows are
# non-trivial but tiny.
ROWS = [
    # (event_id, ts_us_offset, user_id, event_type, value)
    (1, 0, 1, "click", 1.0),
    (2, 5 * 60_000_000, 1, "click", 2.0),
    (3, 12 * 60_000_000, 1, "purchase", 3.0),
    (4, 55 * 60_000_000, 1, "click", 4.0),  # >30min gap -> new session
    (5, 60 * 60_000_000, 1, "error", 5.0),
    (6, 2 * 60_000_000, 2, "signup", 6.0),
    (7, 20 * 60_000_000, 2, "click", 7.0),
    (8, 130 * 60_000_000, 2, "purchase", 8.0),  # 3rd hour window
]


def _write_events(dirpath: str, ts_type: pa.DataType) -> str:
    os.makedirs(dirpath, exist_ok=True)
    ts_us = [BASE_US + off for _, off, *_ in ROWS]
    if ts_type == pa.timestamp("ns"):
        ts_arr = pa.array([t * 1000 for t in ts_us], type=pa.int64()).cast(ts_type)
    else:
        ts_arr = pa.array(ts_us, type=pa.int64()).cast(pa.timestamp("us")).cast(ts_type)
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], type=pa.int64()),
            "ts": ts_arr,
            "user_id": pa.array([r[2] for r in ROWS], type=pa.int64()),
            "event_type": pa.array([r[3] for r in ROWS], type=pa.string()),
            "value": pa.array([r[4] for r in ROWS], type=pa.float64()),
            "props": pa.array(["{}"] * len(ROWS), type=pa.string()),
        }
    )
    pq.write_table(table, os.path.join(dirpath, "events.parquet"))
    return dirpath


ENCODINGS = {
    "ns": pa.timestamp("ns"),  # -> bigint under nanosAsLong
    "us_ntz": pa.timestamp("us"),  # -> TIMESTAMP_NTZ
    "us_ltz": pa.timestamp("us", tz="UTC"),  # -> TIMESTAMP (LTZ)
}


@pytest.fixture(scope="module")
def encoded_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("ts_contract")
    return {
        name: _write_events(str(root / name), t) for name, t in ENCODINGS.items()
    }


def _batch_rows(spark, sf_dir):
    from dask_image_spark.sources.tables import load_table

    df = load_table(spark, sf_dir, "events")
    return df.dtypes, sorted(map(tuple, df.collect()))


def _sessionize_rows(spark, sf_dir):
    from dask_image_spark.queries.timeseries import session_stats, sessionize

    a = sorted(map(tuple, sessionize(spark, sf_dir).collect()))
    b = sorted(map(tuple, session_stats(spark, sf_dir).collect()))
    return a, b


def _stream_rows(spark, sf_dir):
    from dask_image_spark.streaming.ops import events_stream, tumbling_counts

    st = events_stream(spark, sf_dir)
    agg = sorted(map(tuple, tumbling_counts(spark, sf_dir).collect()))
    return st.dtypes, agg


def test_all_encodings_identical(spark, encoded_dirs):
    batch = {n: _batch_rows(spark, d) for n, d in encoded_dirs.items()}
    # every encoding normalizes to the SAME canonical schema...
    dtypes = {n: dict(b[0])["ts"] for n, b in batch.items()}
    assert set(dtypes.values()) == {"timestamp"}, dtypes
    # ...and the SAME values
    ref = batch["ns"][1]
    for n, (_, rows) in batch.items():
        assert rows == ref, f"batch values differ for encoding {n}"

    sess = {n: _sessionize_rows(spark, d) for n, d in encoded_dirs.items()}
    for n, pair in sess.items():
        assert pair == sess["ns"], f"sessionization differs for encoding {n}"
    # the gaps actually split sessions (fixture sanity: both users have a
    # >30-min gap -> 2 sessions each, 4 total)
    sess_ids = {(u, s) for _, u, s in sess["ns"][0]}
    assert len(sess_ids) == 4, sess_ids

    streams = {n: _stream_rows(spark, d) for n, d in encoded_dirs.items()}
    for n, (dt, rows) in streams.items():
        assert dt == streams["ns"][0], f"stream schema differs for {n}"
        assert rows == streams["ns"][1], f"stream values differ for {n}"
    # events span 3 distinct hours; complete-mode tumbling counts cover them
    hours = {r[0] for r in streams["ns"][1]}
    assert len(hours) == 3, hours


def test_stream_batch_schema_parity(spark, encoded_dirs):
    """The drift guard that would have caught round 4 at build time: the
    streaming reader and the batch loader must emit IDENTICAL dtypes for
    every physical encoding."""
    from dask_image_spark.sources.tables import load_table
    from dask_image_spark.streaming.ops import events_stream

    for n, d in encoded_dirs.items():
        b = load_table(spark, d, "events").dtypes
        s = events_stream(spark, d).dtypes
        assert b == s, f"batch/stream schema drift under encoding {n}: {b} vs {s}"


def test_stream_batch_schema_parity_driver_data(spark, sf_dir):
    """Same invariant against the driver's actual current testdata."""
    from dask_image_spark.sources.tables import load_table
    from dask_image_spark.streaming.ops import events_stream

    b = load_table(spark, sf_dir, "events").dtypes
    s = events_stream(spark, sf_dir).dtypes
    assert b == s, f"batch/stream schema drift on driver data: {b} vs {s}"
    assert dict(b)["ts"] == "timestamp"
