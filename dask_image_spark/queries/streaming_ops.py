"""Graded streaming queries (Structured Streaming, availableNow trigger).

Strong oracles where the availableNow run is batch-equivalent (complete
output mode materializes every group); the stateful custom operator is
weak-checked by nature.
"""

from __future__ import annotations

from dask_image_spark.queries.base import register
from dask_image_spark.streaming import ops


@register(
    "streaming_tumbling",
    """
    SELECT DATE_TRUNC('hour', ts) AS hour_start, event_type,
           COUNT(*) AS n, ROUND(1.2345e-8 + SUM(value), 4) AS total
    FROM events GROUP BY 1, 2
    """,
    tags=("streaming", "window"),
)
def streaming_tumbling(spark, sf_dir):
    return ops.tumbling_counts(spark, sf_dir)


@register(
    "streaming_stateful",
    """
    SELECT user_id, COUNT(*) AS n_events,
           ROUND(1.2345e-8 + SUM(value), 4) AS total_value,
           ROUND(1.2345e-8 + MAX(value), 4) AS max_value
    FROM events GROUP BY user_id
    """,
    tags=("streaming", "stateful"),
)
def streaming_stateful(spark, sf_dir):
    return ops.stateful_user_stats(spark, sf_dir)


@register(
    "streaming_sliding",
    """
    SELECT DATE_TRUNC('hour', ts) - (o.h * INTERVAL '1 hour') AS win_start,
           COUNT(*) AS n, ROUND(1.2345e-8 + AVG(value), 4) AS avg_value
    FROM events CROSS JOIN (VALUES (0), (1)) o(h)
    GROUP BY 1
    """,
    tags=("streaming", "window"),
)
def streaming_sliding(spark, sf_dir):
    return ops.sliding_counts(spark, sf_dir)


@register(
    "streaming_parquet_sink",
    """
    SELECT event_type, COUNT(*) AS n, MIN(event_id) AS min_id,
           ROUND(1.2345e-8 + SUM(value), 4) AS total
    FROM events GROUP BY event_type
    """,
    tags=("streaming", "sink"),
)
def streaming_parquet_sink(spark, sf_dir):
    """Streaming parquet FILE sink (checkpointed, exactly-once) + batch
    read-back; every event must survive the stream->files->scan roundtrip,
    which the direct-on-events oracle checks."""
    return ops.parquet_sink_roundtrip(spark, sf_dir)


@register(
    "streaming_json_source",
    """
    SELECT event_type, COUNT(*) AS n, MIN(event_id) AS min_id,
           ROUND(1.2345e-8 + SUM(value), 4) AS total,
           MAX(ts) AS max_ts
    FROM events WHERE event_id < 5000 GROUP BY event_type
    """,
    tags=("streaming", "source", "json"),
)
def streaming_json_source(spark, sf_dir):
    """NDJSON landing-zone streaming source (4 sharded JSON-lines files,
    integer-µs wire timestamps): every event and its timestamp must
    survive parquet -> json-lines -> file stream -> rollup against the
    direct-on-events oracle."""
    return ops.json_source_rollup(spark, sf_dir)


@register(
    "streaming_csv_source",
    """
    SELECT event_type, COUNT(*) AS n, MIN(event_id) AS min_id,
           MAX(event_id) AS max_id,
           ROUND(1.2345e-8 + SUM(value), 4) AS total,
           MAX(ts) AS max_ts
    FROM events WHERE event_id >= 5000 AND event_id < 10000
    GROUP BY event_type
    """,
    tags=("streaming", "source", "csv"),
)
def streaming_csv_source(spark, sf_dir):
    """CSV landing-zone streaming source (4 headerless pipe-delimited
    shards, integer-µs wire timestamps): every event and its timestamp
    must survive parquet -> csv -> file stream -> rollup against the
    direct-on-events oracle. Third streaming wire format after parquet
    and NDJSON."""
    return ops.csv_source_rollup(spark, sf_dir)


@register(
    "streaming_foreach_batch",
    """
    SELECT event_type, COUNT(*) AS n, MIN(event_id) AS min_id,
           ROUND(1.2345e-8 + SUM(value), 4) AS total
    FROM events GROUP BY event_type
    """,
    tags=("streaming", "sink", "foreach-batch"),
)
def streaming_foreach_batch(spark, sf_dir):
    """``foreachBatch`` custom-sink surface: the complete-mode per-type
    aggregate handed to arbitrary batch code per epoch (idempotent keyed
    overwrite into parquet), read back and checked against the batch
    GROUP BY oracle."""
    return ops.foreach_batch_sink(spark, sf_dir)


@register(
    "streaming_static_join",
    """
    SELECT CAST(DATE_TRUNC('hour', e.ts) AS TIMESTAMP) AS hour_start,
           CAST(c.c_custkey % 4 AS INT) AS segment,
           COUNT(*) AS n, ROUND(1.2345e-8 + SUM(e.value), 4) AS total
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
    tags=("streaming", "join", "enrichment"),
)
def streaming_static_join(spark, sf_dir):
    """Stream-static enrichment join (broadcast dimension into each
    micro-batch) + watermarked hourly rollup per segment."""
    return ops.stream_static_join(spark, sf_dir)


from dask_image_spark.queries.timeseries import GAP_US  # noqa: E402


@register(
    "streaming_session_window",
    f"""
    WITH g AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= {GAP_US}
                    OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    s AS (SELECT user_id, ts, value,
                 SUM(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sess
          FROM g)
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
           ROUND(1.2345e-8 + SUM(value), 4) AS total_value
    FROM s GROUP BY user_id, sess
    """,
    tags=("streaming", "window", "session"),
)
def streaming_session_window(spark, sf_dir):
    """Streaming session_window (gap-merged stateful windows) — the
    streaming counterpart of ``session_window_batch``, same oracle."""
    return ops.session_window_counts(spark, sf_dir)


@register(
    "streaming_rocksdb_agg",
    f"""
    WITH g AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= {GAP_US}
                    OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    s AS (SELECT user_id, ts, value,
                 SUM(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sess
          FROM g)
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
           ROUND(1.2345e-8 + SUM(value), 4) AS total_value
    FROM s GROUP BY user_id, sess
    """,
    tags=("streaming", "window", "session", "rocksdb"),
)
def streaming_rocksdb_agg(spark, sf_dir):
    """The SAME session-window aggregate on the ROCKSDB state store —
    the production backend for state beyond executor heap (local-SSD
    spill + changelog checkpointing). Sharing streaming_session_window's
    batch oracle is the point: a state backend must never change
    results, only capacity (see streaming/ops.py::rocksdb_session_stats
    for the 100 TB rationale)."""
    return ops.rocksdb_session_stats(spark, sf_dir)


@register(
    "streaming_dedup_watermark",
    """
    SELECT event_type, COUNT(DISTINCT user_id) AS n
    FROM events GROUP BY event_type
    """,
    tags=("streaming", "dedup", "watermark"),
)
def streaming_dedup_watermark(spark, sf_dir):
    """Bounded-state dedup (``dropDuplicatesWithinWatermark``): state for
    a key evicts once the watermark passes its event time. STRONG since
    round 6: the graded contract is the single-source availableNow run —
    ONE micro-batch, in which the watermark never advances mid-batch, so
    state eviction cannot fire and the operator provably equals a global
    per-(user, type) dedup (count distinct users per type). The
    multi-batch eviction behavior — where far-apart recurrences may
    legitimately re-emit — is bounds-tested against the provable
    [global-dedup, greedy-1h-chain] envelope in
    tests/test_streaming_multibatch.py."""
    return ops.dedup_within_watermark(spark, sf_dir)


@register(
    "streaming_dedup",
    """
    SELECT user_id, COUNT(DISTINCT event_type) AS n_types
    FROM events GROUP BY user_id
    """,
    tags=("streaming", "dedup"),
)
def streaming_dedup(spark, sf_dir):
    return ops.dedup_counts(spark, sf_dir)


@register(
    "streaming_stream_join",
    """
    SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id
    FROM events p JOIN events c
      ON c.user_id = p.user_id AND c.event_type = 'click'
     AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
    WHERE p.event_type = 'purchase'
    """,
    tags=("streaming", "join"),
)
def streaming_stream_join(spark, sf_dir):
    """Watermarked stream-stream interval join (availableNow batch
    equivalence): every purchase x same-user click within the prior hour.
    The oracle is the identical interval join in batch SQL."""
    return ops.stream_stream_join(spark, sf_dir)


@register(
    "streaming_session_state",
    """
    WITH g AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                    OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT user_id, ts, value,
             CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess
      FROM g)
    SELECT user_id, sess, COUNT(*) AS n_events,
           ROUND(1.2345e-8 + SUM(value), 4) AS total_value,
           MIN(ts) AS session_start,
           CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS duration_us
    FROM s GROUP BY user_id, sess
    """,
    tags=("streaming", "stateful", "session"),
)
def streaming_session_state(spark, sf_dir):
    """Arbitrary-state streaming sessionization: the per-user GroupState is
    an open-session walk (non-decomposable, multi-row emission), flushed
    batch-equivalently under availableNow — graded against the SAME
    session-stats oracle as the batch form, so the stateful API and the
    window-function form are proven to agree event for event."""
    return ops.session_state_walk(spark, sf_dir)


@register(
    "streaming_ohlc",
    """
    WITH b AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             event_type, value,
             CAST(epoch_us(ts) AS HUGEINT) * 10000000000 + event_id AS ord
      FROM events)
    SELECT day, event_type,
           ROUND(1.2345e-8 + arg_min(value, ord), 4) AS open,
           ROUND(1.2345e-8 + MAX(value), 4) AS high,
           ROUND(1.2345e-8 + MIN(value), 4) AS low,
           ROUND(1.2345e-8 + arg_max(value, ord), 4) AS close,
           ROUND(1.2345e-8 + SUM(value), 4) AS volume,
           CAST(COUNT(*) AS BIGINT) AS n_trades
    FROM b GROUP BY day, event_type
    """,
    tags=("streaming", "window", "ohlc"),
)
def streaming_ohlc(spark, sf_dir):
    """Order-sensitive aggregates (min_by/max_by open/close) surviving
    incremental micro-batch merge — strong because availableNow +
    complete mode equals the batch daily bars, and the multi-batch
    invariance of the min_by state merge is what the oracle actually
    certifies (a naive "first value seen per batch" implementation
    would diverge the moment the source splits into >1 trigger)."""
    return ops.ohlc_stream(spark, sf_dir)


@register(
    "streaming_static_antijoin",
    """
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_kept,
           ROUND(1.2345e-8 + SUM(value), 4) AS kept_value
    FROM events
    WHERE user_id NOT IN (SELECT c_custkey FROM customer
                          WHERE c_custkey % 7 = 0)
    GROUP BY event_type
    """,
    tags=("streaming", "join", "anti", "blocklist"),
)
def streaming_static_antijoin(spark, sf_dir):
    """Streaming denylist filtering — the LEFT ANTI member of the
    stream-static join family (`streaming_static_join` grades the inner
    enrichment form); the batch NOT IN oracle is exact because no
    watermark state is involved."""
    return ops.stream_static_antijoin(spark, sf_dir)


@register(
    "streaming_custom_source",
    """
    WITH src AS (
      SELECT i AS id, ((i * i * 31 + 7) % 1000) / 10.0 AS value
      FROM generate_series(0, 4999) t(i))
    SELECT CAST(id % 4 AS BIGINT) AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(1.2345e-8 + SUM(value), 4) AS total
    FROM src GROUP BY grp
    """,
    tags=("streaming", "source", "python-datasource"),
)
def streaming_custom_source(spark, sf_dir):
    """The custom-connector STREAMING surface: 8 offset-tracked
    micro-batches (5000 ids, chunk 700) from the from-scratch Python
    stream reader, aggregated complete-mode — grades the offset
    contract end-to-end (a reader that lost or double-read a chunk
    between offsets would break the exact totals)."""
    return ops.custom_stream_source_rollup(spark, sf_dir)


@register(
    "streaming_left_outer_join",
    """
    WITH e AS (SELECT event_id, user_id, event_type, ts FROM events
               WHERE event_id < 5000),
    p AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'purchase'),
    c AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'click')
    SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id
    FROM p LEFT JOIN c
      ON c.user_id = p.user_id
     AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
    """,
    tags=("streaming", "join", "outer", "watermark"),
)
def streaming_left_outer_join(spark, sf_dir):
    """Stream-stream LEFT OUTER interval join with watermark-driven null
    emission: purchases with no same-user click in the prior hour DO
    appear (click_id NULL) — but only once the watermark proves no match
    can still arrive, which a single availableNow batch never does. The
    op runs a real 3-micro-batch topology (data file + two later
    sentinel files advancing the watermark past all real rows, see
    ``streaming/ops.py::stream_left_outer_join``) so the state store
    provably evicts and the result equals the batch LEFT JOIN. At sf0.01
    the two row classes are both nonzero (18 matched / 981 null-flushed)
    — the flush path cannot pass vacuously."""
    return ops.stream_left_outer_join(spark, sf_dir)


# ``transformWithStateInPandas`` (Spark 4's new arbitrary-state API) is
# implemented in streaming/ops.py::tws_user_type_stats but NOT registered:
# its state protocol requires the ``protobuf`` package, which this
# container does not ship (and installs are off-limits) — the same
# optional-dependency posture as upstream's lazy ``pims`` import. The
# batch-equivalence test (tests/test_streaming_multibatch.py) runs it
# behind ``pytest.importorskip("google.protobuf")`` so the surface
# activates automatically wherever protobuf exists.
