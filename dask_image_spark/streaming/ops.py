"""Structured Streaming variants of the events-table operators.

The reference has no streaming surface; this is mandated extension work.
Pattern: ``readStream`` over the events parquet (``availableNow`` trigger —
process-everything-then-stop, the batch-equivalence mode), windowed/stateful
transforms, memory sink, return the materialized table. Real deployments
swap the source for Kafka/files and the trigger for continuous; the
transformations are unchanged.

``events.ts`` is canonicalized through the SAME normalizer as the batch
loader (``sources.tables.normalize_events_ts``), so streaming and batch
schemas can never drift whatever the file's physical ts encoding
(ns-as-long / µs-NTZ / µs-LTZ) — which is what gives these ops their
oracle story.
"""

from __future__ import annotations

import os
import uuid

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dask_image_spark.queries.base import r as _eps_round
from dask_image_spark.sources.tables import ensure_engine_confs, normalize_events_ts
from dask_image_spark.scratch import io_base


def events_stream(
    spark: SparkSession,
    sf_dir: str,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming source over the events table.

    ``glob``/``max_files_per_trigger`` let tests (and real landing-zone
    deployments) run the SAME transformations over a directory of many
    files in many micro-batches — availableNow honors the rate limit, so
    ``max_files_per_trigger=1`` with N files exercises N-batch stateful
    accumulation (see tests/test_streaming_multibatch.py).
    """
    # The file-stream source needs an explicit schema. NEVER guess it: read
    # the actual footer schema via a batch scan (metadata-only, no data jobs)
    # so the physical ts encoding is whatever the file says — the round-4
    # regression was a hard-coded `ts LONG` here silently dividing µs values
    # by 1000 when the generator switched from ns to µs.
    ensure_engine_confs(spark)
    schema = spark.read.option("pathGlobFilter", glob).parquet(sf_dir).schema
    # the file-stream source requires a directory basePath; select the
    # table file(s) via a glob filter (a real deployment points this at a
    # landing directory that accumulates files)
    reader = spark.readStream.schema(schema).option("pathGlobFilter", glob)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return normalize_events_ts(reader.parquet(sf_dir))


def run_to_memory(
    stream_df: DataFrame, output_mode: str = "complete"
) -> DataFrame:
    """Run an availableNow streaming query into a memory sink; return the
    materialized result as a DataFrame."""
    name = f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def tumbling_counts(spark: SparkSession, sf_dir: str, **stream_opts) -> DataFrame:
    """1-hour tumbling windowed aggregation with a watermark — the canonical
    late-data-tolerant streaming aggregate."""
    ev = events_stream(spark, sf_dir, **stream_opts)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), _eps_round(F.sum("value"), 4).alias("total"))
        .select(F.col("w.start").alias("hour_start"), "event_type", "n", "total")
    )
    return run_to_memory(agg, "complete")


def stateful_user_stats(spark: SparkSession, sf_dir: str, **stream_opts) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState`` — the
    arbitrary-state streaming surface (per-user running count / sum / max
    kept in explicit GroupState across micro-batches).

    The update-mode memory sink APPENDS every per-batch emission; a
    production sink (Delta/JDBC) MERGEs by key instead. The final
    per-user groupBy below keeps only the last emission (``n_events`` is
    monotonic across batches), which makes the result identical whether
    availableNow ran one micro-batch or many (tested with
    ``max_files_per_trigger=1`` in tests/test_streaming_multibatch.py)
    and equal to the batch GROUP BY — the oracle story.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = events_stream(spark, sf_dir, **stream_opts).select("user_id", "value")

    def update(key, pdfs, state: GroupState):
        n, total, mx = (
            state.get if state.exists else (0, 0.0, float("-inf"))
        )
        for pdf in pdfs:
            if not len(pdf):
                # Arrow batch splits can hand the update an empty chunk;
                # folding its NaN max would poison mx (ADVICE r5)
                continue
            n += len(pdf)
            total += float(pdf["value"].sum())
            mx = max(mx, float(pdf["value"].max()))
        state.update((n, total, mx))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total + 1.2345e-8, 4)],
                "max_value": [round(mx + 1.2345e-8, 4)],
            }
        )

    agg = ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id LONG, n_events LONG, total_value DOUBLE, max_value DOUBLE",
        stateStructType="n LONG, total DOUBLE, mx DOUBLE",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    mem = run_to_memory(agg, "update")
    # keyed-merge semantics over the append-only memory sink: last (= max,
    # counts are monotonic) emission per user wins
    return (
        mem.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "total_value", "max_value")).alias("s"))
        .select("user_id", "s.n_events", "s.total_value", "s.max_value")
    )


def dedup_counts(spark: SparkSession, sf_dir: str, **stream_opts) -> DataFrame:
    """Streaming dropDuplicates then per-user distinct-type counts."""
    ev = events_stream(spark, sf_dir, **stream_opts)
    agg = (
        ev.dropDuplicates(["user_id", "event_type"])
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_types"))
    )
    return run_to_memory(agg, "complete")


def sliding_counts(spark: SparkSession, sf_dir: str, **stream_opts) -> DataFrame:
    """2-hour windows sliding by 1 hour with a watermark — every event lands
    in two windows; complete-mode availableNow output is batch-equivalent."""
    ev = events_stream(spark, sf_dir, **stream_opts)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            _eps_round(F.avg("value"), 4).alias("avg_value"),
        )
        .select(F.col("w.start").alias("win_start"), "n", "avg_value")
    )
    return run_to_memory(agg, "complete")


def parquet_sink_roundtrip(spark: SparkSession, sf_dir: str, **stream_opts) -> DataFrame:
    """Streaming FILE sink: availableNow stream written to a parquet
    directory with a checkpoint (exactly-once via the commit log), then
    read back as a batch table and aggregated. The production landing-zone
    topology — swap the source for Kafka and this is an ingest pipeline."""
    import shutil

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    out = f"{io_base()}/stream_sink_{tag}"
    ckpt = f"{out}_ckpt"
    # clean slate: the checkpoint's commit log would otherwise skip the
    # (identical) availableNow batch on re-runs and leave stale output mixed
    # with new
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)

    ev = events_stream(spark, sf_dir, **stream_opts).select(
        "event_id", "user_id", "event_type", "value"
    )
    q = (
        ev.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = spark.read.parquet(out)
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("event_id").alias("min_id"),
            _eps_round(F.sum("value"), 4).alias("total"),
        )
    )


def foreach_batch_sink(spark: SparkSession, sf_dir: str, **stream_opts) -> DataFrame:
    """``foreachBatch`` custom sink — THE production sink surface for
    stores with no native streaming writer (JDBC upsert, Delta MERGE,
    search-index bulk load): Spark hands each micro-batch to arbitrary
    batch-DataFrame code along with its epoch id.

    Here the complete-mode per-type running aggregate is OVERWRITTEN into
    a parquet target every epoch — an idempotent keyed refresh, so the
    final table equals the last epoch's full state whether availableNow
    ran one micro-batch or many (multi-batch invariance tested in
    tests/test_streaming_multibatch.py), and equals the batch GROUP BY —
    the oracle story. A real deployment replaces the overwrite with a
    MERGE keyed on event_type; the epoch id is what makes retries
    idempotent there."""
    import shutil

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    out = f"{io_base()}/feb_sink_{tag}"
    ckpt = f"{out}_ckpt"
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)

    ev = events_stream(spark, sf_dir, **stream_opts)
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("event_id").alias("min_id"),
        _eps_round(F.sum("value"), 4).alias("total"),
    )

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(out)

    q = (
        agg.writeStream.foreachBatch(write_batch)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out).select("event_type", "n", "min_id", "total")


def json_source_rollup(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming over an NDJSON landing zone — the second file format of
    the streaming reader (parquet is the first): a deterministic events
    slice is landed as JSON-lines files (4 shards, as a log shipper
    would), then ``readStream.json`` with an explicit schema ingests the
    directory and runs a per-type rollup. Timestamps are shipped as
    integer unix-µs (the ts contract's canonical wire form — JSON
    timestamp string formats are exactly the cross-engine drift this
    avoids)."""
    import shutil

    from dask_image_spark.sources.tables import load_table

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    land = f"{io_base()}/json_land_{tag}"
    shutil.rmtree(land, ignore_errors=True)

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 5000)
    (
        ev.select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            F.unix_micros(F.col("ts")).alias("ts_us"),
        )
        .repartition(4)
        .write.mode("overwrite")
        .json(land)
    )
    schema = (
        "event_id LONG, user_id LONG, event_type STRING, value DOUBLE, "
        "ts_us LONG"
    )
    reader = spark.readStream.schema(schema).option("pathGlobFilter", "*.json")
    if max_files_per_trigger:
        # rate-limit so availableNow runs one micro-batch per shard file —
        # the multi-batch equivalence test drives this knob
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.json(land).withColumn(
        "ts", F.timestamp_micros(F.col("ts_us"))
    )
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("event_id").alias("min_id"),
        _eps_round(F.sum("value"), 4).alias("total"),
        F.max("ts").alias("max_ts"),
    )
    return run_to_memory(agg, "complete")


def csv_source_rollup(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming over a CSV landing zone — the third wire format of the
    streaming reader (parquet, NDJSON, now headerless pipe-delimited CSV,
    the classic ETL drop-zone shape). A deterministic events slice is
    landed as 4 CSV shards, then ``readStream.csv`` with an explicit
    schema + delimiter ingests the directory for a per-type rollup.
    Timestamps ship as integer unix-µs (same wire contract as the NDJSON
    source — CSV has no timestamp type at all, so the integer form is
    the only drift-free encoding)."""
    import shutil

    from dask_image_spark.sources.tables import load_table

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    land = f"{io_base()}/csv_land_{tag}"
    shutil.rmtree(land, ignore_errors=True)

    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("event_id") >= 5000) & (F.col("event_id") < 10000)
    )
    (
        ev.select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            F.unix_micros(F.col("ts")).alias("ts_us"),
        )
        .repartition(4)
        .write.mode("overwrite")
        .option("header", "false")
        .option("sep", "|")
        .csv(land)
    )
    schema = (
        "event_id LONG, user_id LONG, event_type STRING, value DOUBLE, "
        "ts_us LONG"
    )
    reader = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.csv")
        .option("header", "false")
        .option("sep", "|")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.csv(land).withColumn(
        "ts", F.timestamp_micros(F.col("ts_us"))
    )
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
        _eps_round(F.sum("value"), 4).alias("total"),
        F.max("ts").alias("max_ts"),
    )
    return run_to_memory(agg, "complete")


def stream_static_join(spark: SparkSession, sf_dir: str, **stream_opts) -> DataFrame:
    """Stream-static join: the events STREAM enriched against a static
    user-segment dimension (derived deterministically from customer), then
    a windowed aggregate per segment. The static side is broadcast into
    every micro-batch — the standard streaming-enrichment topology; no
    stream-stream state is involved, so availableNow output is
    batch-equivalent and strong-oracle-checkable.

    Static-side bound (SCALE.md §12 streaming review rule): the segment
    map is user-dimension-scale — it grows with the corpus, slower than
    the event stream but not bounded. Broadcast is correct while the
    dimension fits the executors; past that, drop the hint and let the
    stream-static join shuffle (supported for inner joins), or pre-hash
    the dimension into a keyed state store."""
    from dask_image_spark.sources.tables import load_table

    ev = events_stream(spark, sf_dir, **stream_opts)
    seg = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        (F.pmod(F.col("c_custkey"), F.lit(4))).cast("int").alias("segment"),
    )
    agg = (
        ev.join(F.broadcast(seg), on="user_id")  # inner: unmatched users drop
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "segment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _eps_round(F.sum("value"), 4).alias("total"),
        )
        .select(F.col("w.start").alias("hour_start"), "segment", "n", "total")
    )
    return run_to_memory(agg, "complete")


def session_window_counts(spark: SparkSession, sf_dir: str, **stream_opts) -> DataFrame:
    """STREAMING session windows (30-min gap, watermarked): Spark merges
    per-user events into gap-separated sessions as state, emitting them in
    complete mode under availableNow — batch-equivalent, so the batch
    sessionization SQL is a strong oracle."""
    ev = events_stream(spark, sf_dir, **stream_opts)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _eps_round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            "user_id", F.col("w.start").alias("session_start"),
            "n_events", "total_value",
        )
    )
    return run_to_memory(agg, "complete")


def dedup_within_watermark(spark: SparkSession, sf_dir: str, **stream_opts) -> DataFrame:
    """``dropDuplicatesWithinWatermark``: bounded-state dedup — state for a
    key is dropped once the watermark passes it, the production answer to
    unbounded dedup state. The events fixture spans far longer than the
    watermark, so rows per key CAN recur across distant event times; counts
    reflect per-(user, type) occurrences surviving the windowed dedup."""
    ev = events_stream(spark, sf_dir, **stream_opts)
    deduped = ev.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )
    agg = deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    return run_to_memory(agg, "complete")


def stream_stream_join(spark: SparkSession, sf_dir: str, **stream_opts) -> DataFrame:
    """Stream-stream inner join with watermarks and a time-interval
    condition — Spark's bounded-state two-stream join (each side buffers
    only rows inside its watermark): purchases matched to the same user's
    clicks in the preceding hour. The interval bound plus both watermarks
    is what lets the state store evict — an unbounded-condition join would
    grow state forever. availableNow + append gives batch equivalence."""
    clicks = (
        events_stream(spark, sf_dir, **stream_opts)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("c_ts", "2 hours")
    )
    purchases = (
        events_stream(spark, sf_dir, **stream_opts)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        "inner",
    ).select("purchase_id", F.col("p_user").alias("user_id"), "click_id")
    return run_to_memory(joined, "append")


def session_state_walk(spark: SparkSession, sf_dir: str, **stream_opts) -> DataFrame:
    """Streaming sessionization through GENUINELY arbitrary state
    (``applyInPandasWithState``): the per-user state is the one open
    session (index, start, last-seen, running count/sum) — not a
    decomposable aggregate — and each invocation emits ZERO OR MORE closed
    sessions, so neither the state shape nor the output cardinality maps
    to a groupBy. ``stateful_user_stats`` exercises the same API with
    aggregate-shaped state; this is the session walk the API exists for
    (the upstream analog of ``session_window`` semantics, but with the
    gap logic hand-carried across micro-batches).

    Each batch flushes the still-open session too (with its
    stats-so-far); under multi-batch availableNow a session spanning
    batches is therefore emitted more than once with growing counts. The
    final (user, sess) groupBy keeps only the last emission — keyed-merge
    semantics over the append-only memory sink — so the flushed sessions
    equal the batch lag/running-sum sessionization whether the stream ran
    one micro-batch or many (the multi-batch path assumes per-key
    time-ordered file arrival, the CDC-log contract; out-of-order data
    belongs to the watermarked ``session_window`` op instead). That
    batch-equivalence is what makes the query strong-oracle-checkable."""
    from dask_image_spark.queries.timeseries import GAP_US
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = events_stream(spark, sf_dir, **stream_opts).select(
        "user_id", "ts", "value", "event_id"
    )

    def update(key, pdfs, state: GroupState):
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        if state.exists:
            sess, start_us, last_us, n, total = state.get
        else:
            sess, start_us, last_us, n, total = 0, 0, None, 0, 0.0
        out: dict[str, list] = {
            "user_id": [], "sess": [], "n_events": [], "total_value": [],
            "session_start": [], "duration_us": [],
        }

        def close():
            out["user_id"].append(key[0])
            out["sess"].append(sess)
            out["n_events"].append(n)
            out["total_value"].append(round(total + 1.2345e-8, 4))
            out["session_start"].append(pd.Timestamp(start_us, unit="us"))
            out["duration_us"].append(last_us - start_us)

        for ts, val in zip(rows["ts"], rows["value"]):
            us = pd.Timestamp(ts).value // 1000
            if last_us is None or us - last_us > GAP_US:
                if last_us is not None:
                    close()
                sess += 1
                start_us, n, total = us, 0, 0.0
            n += 1
            total += float(val)
            last_us = us
        # availableNow's single final batch: flush the open session too
        # (a continuous deployment would close it on a state timeout).
        if last_us is not None:
            close()
        state.update((sess, start_us, last_us, n, total))
        yield pd.DataFrame(out)

    agg = ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id LONG, sess LONG, n_events LONG, total_value DOUBLE, "
            "session_start TIMESTAMP, duration_us LONG"
        ),
        stateStructType=(
            "sess LONG, start_us LONG, last_us LONG, n LONG, total DOUBLE"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    mem = run_to_memory(agg, "update")
    return (
        mem.groupBy("user_id", "sess")
        .agg(
            F.max(
                F.struct("n_events", "duration_us", "total_value", "session_start")
            ).alias("s")
        )
        .select(
            "user_id",
            "sess",
            "s.n_events",
            "s.total_value",
            "s.session_start",
            "s.duration_us",
        )
    )


def ohlc_stream(spark: SparkSession, sf_dir: str, **stream_opts) -> DataFrame:
    """Streaming daily OHLC bars per event_type — the batch ``ohlc_bars``
    aggregate run as a watermarked tumbling-window streaming aggregation.
    ``min_by``/``max_by`` over the decimal-packed (epoch_us, event_id)
    key are declarative aggregates with a fixed-width buffer, so they
    merge incrementally across micro-batches exactly like sum/count —
    the state store holds one (double, decimal) candidate pair per bar,
    not the events. Complete-mode memory sink under availableNow is
    batch-equivalent (the oracle story shared by every streaming op
    here)."""
    ev = events_stream(spark, sf_dir, **stream_opts)
    ordk = (
        F.unix_micros("ts").cast("decimal(28,0)") * F.lit(10_000_000_000)
        + F.col("event_id")
    )
    agg = (
        ev.withColumn("ord", ordk)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            _eps_round(F.min_by("value", "ord"), 4).alias("open"),
            _eps_round(F.max("value"), 4).alias("high"),
            _eps_round(F.min("value"), 4).alias("low"),
            _eps_round(F.max_by("value", "ord"), 4).alias("close"),
            _eps_round(F.sum("value"), 4).alias("volume"),
            F.count(F.lit(1)).alias("n_trades"),
        )
        .select(
            F.col("w.start").alias("day"), "event_type",
            "open", "high", "low", "close", "volume", "n_trades",
        )
    )
    return run_to_memory(agg, "complete")


def stream_static_antijoin(
    spark: SparkSession, sf_dir: str, **stream_opts
) -> DataFrame:
    """Stream-static LEFT ANTI join: the streaming events are filtered
    against a static BLOCKLIST (every 7th customer key) before the
    rollup — the standing-denylist topology (abuse filtering, GDPR
    delete lists, dedup against a published index). The static side is
    broadcast into every micro-batch; no state store is involved, so
    availableNow output is batch-equivalent and strong-oracle-checkable.
    At 100 TB the denylist graduates from a broadcast to a Bloom filter
    pre-filter plus an exact anti-join on the survivors
    (``bloom_membership`` is the graded sketch half of that design)."""
    from dask_image_spark.sources.tables import load_table

    ev = events_stream(spark, sf_dir, **stream_opts)
    block = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 7 == 0
    ).select(F.col("c_custkey").alias("user_id"))
    agg = (
        ev.join(F.broadcast(block), on="user_id", how="left_anti")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            _eps_round(F.sum("value"), 4).alias("kept_value"),
        )
    )
    return run_to_memory(agg, "complete")


def custom_stream_source_rollup(
    spark: SparkSession, sf_dir: str, n: int = 5000, chunk: int = 700
) -> DataFrame:
    """Rollup over the from-scratch Python STREAMING data source
    (``sources/pyds.py::RangeGenStreamDataSource``): the offset contract
    (initialOffset / read(start) -> (rows, next) / readBetweenOffsets
    replay) drives ceil(n/chunk) genuine micro-batches through a
    complete-mode aggregate; the run terminates via
    ``processAllAvailable()`` once the source reports caught-up (empty
    batch, unchanged offset) — the custom-connector analogue of the
    availableNow file-source pattern used by every other streaming op
    here. Content is the deterministic generator formula, so the batch
    oracle replays it exactly."""
    import uuid as _uuid

    from dask_image_spark.sources.pyds import register_rangegen_stream

    register_rangegen_stream(spark)
    sdf = (
        spark.readStream.format("rangegen_stream")
        .option("n", n).option("chunk", chunk).load()
    )
    agg = sdf.groupBy((F.col("id") % 4).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        _eps_round(F.sum("value"), 4).alias("total"),
    )
    name = f"mem_{_uuid.uuid4().hex[:12]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(processingTime="0 seconds")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(name)


def stream_left_outer_join(
    spark: SparkSession, sf_dir: str, cutoff: int = 5000
) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER interval join — the semantics
    the inner variant (``stream_stream_join``) cannot express: purchases
    with NO same-user click in the preceding hour must still be emitted,
    with a NULL click id, and Structured Streaming only releases those
    rows when the WATERMARK proves no future match can arrive.

    Under a single availableNow batch the watermark never advances past
    the data, so the null rows would be withheld forever — the classic
    outer-join gotcha. This op therefore runs a REAL multi-batch
    topology: the events slice lands as one parquet file in a landing
    zone, plus two strictly-later SENTINEL files (one inert click each,
    ``user_id = -1``, timestamped 10/11 days past the slice). With
    ``maxFilesPerTrigger=1`` availableNow processes three micro-batches:
    batch 1 ingests the data (inner matches emit immediately; watermark
    still at epoch, so nothing is dropped as late), batch 2 runs with
    the batch-1 watermark (max real ts − delay) and flushes the older
    unmatched purchases, and batch 3 runs with the sentinel-advanced
    watermark — past every real purchase — flushing the rest. Each
    sentinel file carries BOTH a click and a purchase row, so the
    sentinel purchases ARE eventually flushed by the watermark as
    unmatched null-click rows like any other left row — they are
    removed from the result by the final ``user_id >= 0`` filter on the
    materialized table (the multibatch test asserts no sentinel leaks
    through). The memory sink accumulates appends across batches,
    so the final table equals the batch LEFT JOIN row for row — the
    strong-oracle story, and the state store provably evicts (bounded
    state at 100 TB: each side buffers only rows inside watermark ± the
    interval bound)."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from dask_image_spark.sources.tables import load_table

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    land = f"{io_base()}/outer_land_{tag}"
    shutil.rmtree(land, ignore_errors=True)

    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("event_id") < cutoff)
        & F.col("event_type").isin("click", "purchase")
    )
    (
        ev.select(
            "event_id",
            "user_id",
            "event_type",
            F.unix_micros(F.col("ts")).alias("ts_us"),
        )
        .coalesce(1)  # ONE data file: the whole slice is batch 1, so no
        # real row can ever be late relative to another (cross-file
        # timelines overlap totally; two data batches would drop rows)
        .write.mode("overwrite")
        .parquet(land)
    )
    max_us = ev.agg(F.max(F.unix_micros("ts"))).collect()[0][0]
    # Batch ordering is by file modification time — and every mtime must be
    # IN THE PAST at query start: the file source silently never ingests a
    # future-stamped file inside an availableNow snapshot (found the hard
    # way: the sentinels were skipped and the watermark froze at the real
    # click max). So the DATA file is back-dated and the sentinels keep
    # their natural just-written stamps.
    now = __import__("time").time()
    for f in os.listdir(land):
        if f.endswith(".parquet"):
            os.utime(f"{land}/{f}", (now - 120, now - 120))
    day_us = 86_400_000_000
    for i, days in enumerate((10, 11)):
        # BOTH event types: each side's watermark column comes from its own
        # filtered stream, so a click-only sentinel would advance the click
        # watermark while the purchase side stays at max(real p_ts) − delay
        # — and the global watermark is the MIN of the two, leaving every
        # purchase in the final delay window stuck in state (caught by the
        # first run of this op: exactly one unflushed row per SF).
        sent = pa.table(
            {
                "event_id": pa.array(
                    [10_000_000 + 2 * i, 10_000_001 + 2 * i], pa.int64()
                ),
                "user_id": pa.array([-1, -1], pa.int64()),
                "event_type": pa.array(["click", "purchase"], pa.string()),
                "ts_us": pa.array(
                    [max_us + days * day_us] * 2, pa.int64()
                ),
            }
        )
        path = f"{land}/zz_sentinel_{i}.parquet"
        pq.write_table(sent, path)
        # strictly-later (but never future) mtimes: data at now−120, then
        # sentinels at now−80 / now−40
        t = now - 120 + 40 * (i + 1)
        os.utime(path, (t, t))

    schema = "event_id LONG, user_id LONG, event_type STRING, ts_us LONG"
    reader = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", "1")
    )
    stream = reader.parquet(land).withColumn(
        "ts", F.timestamp_micros(F.col("ts_us"))
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("c_ts", "30 minutes")
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("p_ts", "30 minutes")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        "leftOuter",
    ).select("purchase_id", F.col("p_user").alias("user_id"), "click_id")
    # Drop the sentinels from the MATERIALIZED table, never inside the
    # streaming plan: a `user_id >= 0` filter on the join output gets
    # constraint-propagated below BOTH watermark operators into the scans
    # (found the hard way — source numInputRows went to 0 for the sentinel
    # batches and the watermark froze at the real-data max, withholding
    # the last delay-window of unmatched purchases forever). Filtering the
    # sink table is a plain batch predicate the stream never sees.
    return run_to_memory(joined, "append").filter(F.col("user_id") >= 0)



def rocksdb_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The session-window aggregate (``session_window_counts`` — the most
    state-intensive built-in operator: arbitrary-many open sessions per
    key, merged on overlap) running on the ROCKSDB state store provider
    — the production backend for streaming state that outgrows executor
    heap (the 100 TB posture: RocksDB spills keyed state to local SSD
    with changelog checkpointing, where the default HDFS-backed store
    holds every key in memory). The provider conf is scoped to this
    query and restored after, so the rest of the streaming family keeps
    the default store; both backends must produce IDENTICAL results,
    which is exactly what sharing the batch sessionization oracle
    checks."""
    prov_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(prov_key, None)
    spark.conf.set(
        prov_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        return session_window_counts(spark, sf_dir)
    finally:
        if prev is None:
            spark.conf.unset(prov_key)
        else:
            spark.conf.set(prov_key, prev)


def tws_user_type_stats(spark: SparkSession, sf_dir: str, **stream_opts) -> DataFrame:
    """``transformWithStateInPandas`` — Spark 4's NEW arbitrary-state API
    (SPARK-49564, the successor to ``applyInPandasWithState``): an
    object-oriented ``StatefulProcessor`` with TYPED, independently
    evolvable state families instead of one monolithic state tuple.
    Exercised here with BOTH families the old API cannot express
    separately: a ValueState (running event count) and a MapState
    (distinct event types seen — per-key map entries the store
    serializes individually, so a 10^6-type key never rewrites its
    whole state on update).

    Requires the RocksDB state store provider (a transformWithState
    contract, not a choice) — scoped to this query and restored after,
    like ``rocksdb_session_stats``. Update-mode emissions are keyed-
    merged by the monotonic count, so the availableNow result equals
    the batch GROUP BY whatever the micro-batch split — the oracle
    story shared by the whole stateful family.

    DEPENDENCY GATE: the transformWithState state protocol speaks
    protobuf between the JVM and the Python driver worker; this
    container ships no ``protobuf`` package, so the operator raises a
    clear ImportError up front instead of crashing the streaming query
    mid-plan (upstream's lazy-``pims`` posture). The batch-equivalence
    test runs behind ``pytest.importorskip("google.protobuf")`` and
    activates wherever the dependency exists."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(its JVM<->Python state protocol); install protobuf to use "
            "tws_user_type_stats"
        ) from exc

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserTypeStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._cnt = handle.getValueState("cnt", "n LONG")
            self._types = handle.getMapState("types", "t STRING", "one SHORT")

        def handleInputRows(self, key, rows, timer_values):
            n = self._cnt.get()[0] if self._cnt.exists() else 0
            for pdf in rows:
                if not len(pdf):
                    continue
                n += len(pdf)
                for t in pdf["event_type"].unique():
                    self._types.updateValue((str(t),), (1,))
            self._cnt.update((n,))
            n_types = sum(1 for _ in self._types.keys())
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "n_types": [n_types],
                }
            )

        def close(self) -> None:
            pass

    ev = events_stream(spark, sf_dir, **stream_opts).select(
        "user_id", "event_type"
    )
    prov_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(prov_key, None)
    spark.conf.set(
        prov_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        agg = ev.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=UserTypeStats(),
            outputStructType="user_id LONG, n_events LONG, n_types LONG",
            outputMode="Update",
            timeMode="None",
        )
        mem = run_to_memory(agg, "update")
    finally:
        if prev is None:
            spark.conf.unset(prov_key)
        else:
            spark.conf.set(prov_key, prev)
    # keyed-merge over the append-only memory sink: the count is monotonic
    # across emissions, so max(struct) is the final state per user
    return (
        mem.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "n_types")).alias("s"))
        .select("user_id", "s.n_events", "s.n_types")
    )
