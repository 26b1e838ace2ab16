"""Structured Streaming over the events table.

The reference is batch-only (SURVEY §2.10 — its 5-second heartbeat loop is
cluster management, not data streaming). This module adds the streaming
surface a pipeline needs, with the batch/stream duality Spark makes natural:
the SAME windowed aggregation runs as a batch DataFrame (oracle-checkable
against DuckDB time_bucket) and as a ``readStream`` with watermarking
(tested with the availableNow trigger: stream result == batch result).

Sessionization is the classic "custom stateful operator" and ships in both
forms: relationally (lag + gap > threshold + running sum — batchable, with a
DuckDB oracle; what you'd backfill with) and incrementally
(``stream_sessionize``: ``applyInPandasWithState`` keyed by user, event-time
state eviction). The test proves the two produce identical session ids.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hdfs_mapreduce_spark.sources import fs as hfs
from hdfs_mapreduce_spark.sources.catalog import _nanos_timestamp_cols, load_table

SESSION_GAP_MIN = 30


def _epoch_sec(c: Column) -> Column:
    """Whole seconds since epoch, truncating sub-second parts — the same
    boundary semantics as DuckDB ``date_diff('second', a, b)`` when used in
    differences. Accepts TIMESTAMP or TIMESTAMP_NTZ (parquet `timestamp[us]`
    without tz reads as NTZ under Spark 4, and numeric casts reject NTZ);
    the NTZ→LTZ cast shifts by the session-zone offset, which is a whole
    number of seconds, so truncation commutes and differences are identical
    under any session timezone."""
    return F.floor(F.unix_micros(c.cast("timestamp")) / F.lit(1_000_000))


def _windowed_agg(events: DataFrame) -> DataFrame:
    """1-hour tumbling windows per event_type: count + sum(value)."""
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def windowed_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form (the backfill path; oracle = DuckDB time_bucket)."""
    events = load_table(spark, sf_dir, "events")
    return _windowed_agg(events).orderBy("window_start", "event_type")


def _stream_source(spark: SparkSession, sf_dir: str, src: str) -> DataFrame:
    """readStream over a directory of events parquet files with the batch
    loader's exact timestamp semantics. Mirrors ``load_table``'s unit
    detection: TIMESTAMP(NANOS) files (which Spark cannot decode natively)
    are stream-read as nanosecond longs and converted with the same exact
    DIV-1000 truncation; micro/milli files stream with the batch schema."""
    from pyspark.sql.types import LongType, StructField, StructType

    from pyspark.sql.types import TimestampNTZType

    batch_df = load_table(spark, sf_dir, "events")
    ns_cols = _nanos_timestamp_cols(os.path.join(sf_dir, "events.parquet"))
    if not ns_cols:
        stream = (
            spark.readStream.schema(batch_df.schema).format("parquet").load(src)
        )
        # Watermarks demand TIMESTAMP (LTZ); micros-without-tz parquet reads
        # as NTZ, so promote. The session zone is UTC (session.py), making
        # the promoted values identical to the batch twin's NTZ wall times.
        for f in batch_df.schema.fields:
            if isinstance(f.dataType, TimestampNTZType):
                stream = stream.withColumn(f.name, F.col(f.name).cast("timestamp"))
        return stream
    raw_schema = StructType(
        [
            StructField(f.name, LongType(), f.nullable) if f.name in ns_cols else f
            for f in batch_df.schema.fields
        ]
    )
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = spark.readStream.schema(raw_schema).format("parquet").load(src)
    for c in ns_cols:
        stream = stream.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
    return stream


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The file streaming source needs a *directory*; the test data is one
    # parquet file per table in a shared dir, so stage a symlink dir (a real
    # deployment points at a table directory and skips this).
    src = os.path.join(sf_dir, "events.parquet")
    if os.path.isfile(src):
        stage = tempfile.mkdtemp(prefix="events_stream_")
        os.symlink(src, os.path.join(stage, "events.parquet"))
        src = stage
    return _stream_source(spark, sf_dir, src)


def stream_windowed_event_stats(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str | None = None
):
    """Streaming form: parquet source → 1h watermark → tumbling window agg.

    Returns the DataStreamWriter (caller picks sink + trigger). Watermark
    means late events beyond 1 hour are dropped and window state is evicted —
    bounded state at any scale. With ``trigger(availableNow=True)`` this
    processes the existing files and stops: used by tests to prove
    stream ≡ batch.
    """
    stream = _events_stream(spark, sf_dir)
    agg = _windowed_agg(stream.withWatermark("ts", "1 hour"))
    writer = agg.writeStream.outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


# Sliding-window layout: 30-minute windows every 10 minutes — each event
# belongs to exactly SLIDE_DUR_MIN / SLIDE_STEP_MIN = 3 windows. Shared by
# the batch query, the streaming twin, and the generated DuckDB oracle.
SLIDE_DUR_MIN = 30
SLIDE_STEP_MIN = 10


def _sliding_agg(events: DataFrame) -> DataFrame:
    """Sliding windows per event_type: count + sum(value). Spark plans the
    window explode as an Expand (dur/step rows per event) feeding a
    partial+final hash aggregate — the replication happens map-side, the
    shuffle carries only (window, type) partials."""
    return (
        events.groupBy(
            F.window(
                "ts", f"{SLIDE_DUR_MIN} minutes", f"{SLIDE_STEP_MIN} minutes"
            ).alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form (backfill path; oracle enumerates the dur/step offsets of
    each event's time_bucket)."""
    events = load_table(spark, sf_dir, "events")
    return _sliding_agg(events).orderBy("window_start", "event_type")


def stream_sliding_event_stats(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str | None = None
):
    """Streaming twin: watermark bounds how many open sliding windows live
    in state (dur/step per key plus the late-data horizon), exactly as the
    tumbling form."""
    stream = _events_stream(spark, sf_dir)
    agg = _sliding_agg(stream.withWatermark("ts", "1 hour"))
    writer = agg.writeStream.outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


def sessionize(events: DataFrame, gap_min: int = SESSION_GAP_MIN) -> DataFrame:
    """Assign session ids per user: a new session starts when the gap from
    the previous event exceeds ``gap_min`` minutes. lag → gap flag → running
    sum, all windowed by user — one shuffle on user_id, codegen'd end-to-end.
    session_id is (user_id, session_seq) with session_seq 1-based."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_session = (
        prev_ts.isNull()
        | (_epoch_sec(F.col("ts")) - _epoch_sec(prev_ts) > gap_min * 60)
    ).cast("int")
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(new_session)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_seq"),
    )


def stream_sessionize(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str | None = None,
    gap_min: int = SESSION_GAP_MIN,
):
    """Incremental sessionization — the custom stateful streaming operator
    (`applyInPandasWithState`, keyed by user).

    Per-user state is two numbers: (last event time, current session seq).
    Each micro-batch sorts its rows per user, carries the gap rule across the
    batch boundary through the state, and emits every event with its session
    id. Event-time timeout evicts a user's state one gap past the watermark —
    bounded state no matter how many users accumulate over time. The batch
    twin (``sessionize``) produces identical ids on the same data; the test
    proves stream ≡ batch over the driver's events table.

    Returns the DataStreamWriter (caller picks sink + trigger).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_sec = gap_min * 60
    stream = _events_stream(spark, sf_dir).withWatermark("ts", "1 hour")

    def assign(key, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd

        if state.hasTimedOut:
            # One gap past the watermark with no new events: the session can
            # never continue — drop the state.
            state.remove()
            return
        last_ts, seq = state.get if state.exists else (None, 0)
        # A key's micro-batch rows arrive as multiple Arrow chunks (bounded
        # by maxRecordsPerBatch) in storage order, NOT time order — the gap
        # rule is only correct over the key's batch as one time-sorted run,
        # so materialize every chunk first and sort ONCE. Per-chunk sorting
        # with carried (last_ts, seq) computes gaps against the wrong
        # predecessor whenever a user's rows span chunks.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
            # datetime64[s] truncation is unit-agnostic (ns-era and us-era
            # testdata both pass through here) and matches _epoch_sec.
            ts_sec = pdf["ts"].to_numpy().astype("datetime64[s]").astype(np.int64)
            prev = np.concatenate(
                [[last_ts if last_ts is not None else np.iinfo(np.int64).min // 2], ts_sec[:-1]]
            )
            new_session = (ts_sec - prev) > gap_sec
            if last_ts is None:
                new_session[0] = True
            seqs = seq + np.cumsum(new_session.astype(np.int64))
            last_ts, seq = int(ts_sec[-1]), int(seqs[-1])
            yield pd.DataFrame(
                {
                    "event_id": pdf["event_id"],
                    "user_id": pdf["user_id"],
                    "ts": pdf["ts"],
                    "session_seq": seqs,
                }
            )
        if last_ts is not None:
            state.update((last_ts, seq))
            state.setTimeoutTimestamp((last_ts + gap_sec) * 1000)

    out = stream.groupBy("user_id").applyInPandasWithState(
        assign,
        outputStructType="event_id long, user_id long, ts timestamp, session_seq long",
        stateStructType="last_ts long, session_seq long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    writer = out.writeStream.outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


def stream_dedup_events(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str | None = None,
    extra_copies: int = 0,
):
    """Streaming exactly-once dedup on event_id:
    ``dropDuplicatesWithinWatermark`` keeps one row per id and evicts dedup
    state once the watermark passes an id's event time — bounded state, the
    streaming twin of batch ``dropDuplicates``. This is the at-least-once →
    exactly-once repair stage every event pipeline needs in front of a
    training-data sink.

    ``extra_copies`` re-stages the source directory N extra times (tests use
    it to prove duplicates actually collapse). Returns the DataStreamWriter.
    """
    stream = _events_stream(spark, sf_dir)
    if extra_copies:
        src = os.path.join(sf_dir, "events.parquet")
        stage = tempfile.mkdtemp(prefix="events_dup_")
        for i in range(extra_copies + 1):
            os.symlink(src, os.path.join(stage, f"copy{i}.parquet"))
        stream = _stream_source(spark, sf_dir, stage)
    deduped = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "ts", "event_type", "value")
    )
    writer = deduped.writeStream.outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


def _state_versions(
    spark: SparkSession, state_dir: str
) -> list[tuple[int, int | None, str]]:
    """COMMITTED versions of a directory-versioned state table, ascending
    by version number: (version, batch_id or None, dirname). Version dirs
    are ``v{N}`` or ``v{N}_b{batchId}`` (the latter records which stream
    batch produced the version, for replay detection by sinks whose merge
    is NOT idempotent). A version counts only if its parquet write
    finished (_SUCCESS marker): a crash mid-write leaves a partial
    directory, and treating it as latest would silently drop rows on
    recovery — partials are invisible here and simply overwritten by the
    retry. Listing and the marker probes go through the Hadoop FS API
    (sources/fs.py), so ``state_dir`` may be any URI the cluster's Hadoop
    conf resolves — hdfs://, s3a://, file:///, or a bare local path —
    at a cost of ONE globStatus metadata RPC regardless of version count
    (round 11 — was a listing plus one exists probe per version, each a
    full HTTP round trip on an object store)."""
    out = []
    for d in hfs.glob_parent_names(spark, state_dir, "v*", "_SUCCESS"):
        if not d.startswith("v"):
            continue
        core, _, btag = d[1:].partition("_b")
        if not core.isdigit() or (btag and not btag.isdigit()):
            continue
        out.append((int(core), int(btag) if btag else None, d))
    return sorted(out)


def stream_upsert_events(
    spark: SparkSession,
    sf_dir: str,
    state_dir: str,
    checkpoint_dir: str | None = None,
    stream: DataFrame | None = None,
):
    """Incremental upsert sink via ``foreachBatch``: each micro-batch is
    merged into a keyed parquet state table (key = event_id, new rows win).
    This is the CDC/ingest landing pattern — the stream maintains a
    queryable deduplicated table instead of an append log.

    Plain parquet has no atomic MERGE, so state versions are immutable
    directories ``v0, v1, …``: a batch reads the newest COMMITTED
    version (``_state_versions`` — partial dirs from a mid-write crash
    carry no _SUCCESS and are invisible, so the retry overwrites them),
    anti-joins it against the batch's keys, unions the batch, and writes
    the next version. A replayed batch (foreachBatch is at-least-once)
    re-merges the same rows and the anti-join makes that a content
    no-op — the upsert merge is idempotent by construction, so no replay
    bookkeeping is needed (contrast stream_cm_sketch, whose additive
    merge is not). A production deployment swaps this for an ACID table
    format's MERGE INTO (Delta/Iceberg) and keeps the identical
    dataflow. At scale the anti-join is one shuffle of state × batch
    keys — or zero, bucketed by key (write_bucketed). All state-dir
    metadata goes through the Hadoop FS API (sources/fs.py), so
    ``state_dir`` may be hdfs://, s3a://, file:/// or a bare local path.
    """
    hfs.mkdirs(spark, state_dir)

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.dropDuplicates(["event_id"])
        versions = _state_versions(spark, state_dir)
        if versions:
            latest = versions[-1]
            state = spark.read.parquet(hfs.join(hfs.glob_escape(state_dir), latest[2]))
            merged = state.join(
                batch.select("event_id"), "event_id", "left_anti"
            ).unionByName(batch)
            next_v = latest[0] + 1
        else:
            merged, next_v = batch, 0
        merged.write.mode("overwrite").parquet(
            hfs.join(state_dir, f"v{next_v}")
        )

    # ``stream`` lets a caller supply its own staged source (e.g. the
    # declared registry query feeds every event twice across two
    # micro-batches so the anti-join merge path actually runs).
    if stream is None:
        stream = _events_stream(spark, sf_dir)
    writer = stream.writeStream.foreachBatch(merge)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


def read_upsert_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Latest committed snapshot of a directory-versioned state table."""
    versions = _state_versions(spark, state_dir)
    return spark.read.parquet(hfs.join(hfs.glob_escape(state_dir), versions[-1][2]))


# --- streaming count-min sketch ---------------------------------------------------
def stream_cm_sketch(
    spark: SparkSession,
    sf_dir: str,
    state_dir: str,
    checkpoint_dir: str | None = None,
    col: str = "user_id",
    depth: int = 4,
    width: int = 1024,
):
    """Maintain a count-min sketch of a streaming column via foreachBatch:
    each micro-batch's sketch (depth x width, tiny) merges cell-wise into
    the versioned state — the exact mergeability the sketch guarantees,
    so the maintained state equals the batch sketch of everything seen
    (tested cell for cell). This is the streaming form of frequency
    monitoring (heavy-hitter users, trending tokens) whose state stays
    O(depth x width) forever while the stream is unbounded.

    Recovery: the additive merge is NOT idempotent (contrast the upsert
    sink's anti-join), so each version dir records the batch that
    produced it (``v{N}_b{batchId}``). Under foreachBatch's
    at-least-once contract a replay re-delivers the LAST batch: if the
    newest committed version already carries this batch id, the merge is
    skipped instead of double-counting; a crash mid-write leaves an
    uncommitted partial (no _SUCCESS) that ``_state_versions`` ignores
    and the retry overwrites. The state_dir is bound to one checkpoint
    lineage — restarting the stream with a FRESH checkpoint over an
    existing state_dir re-counts from batch 0 and is undefined."""
    hfs.mkdirs(spark, state_dir)

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        cm_merge_batch_into_state(
            spark, batch_df, state_dir, batch_id, col, depth, width
        )

    stream = _events_stream(spark, sf_dir)
    writer = stream.writeStream.foreachBatch(merge)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


def _merge_batch_into_versioned_state(
    spark: SparkSession,
    state_dir: str,
    batch_id: int,
    build_summary,
    merge_fn,
) -> bool:
    """The shared recovery protocol for NON-idempotent summary sinks
    (count-min, Misra-Gries): skip the batch if the newest committed
    version already carries its id (at-least-once replay), otherwise
    merge ``build_summary()`` into the previous committed version via
    ``merge_fn(prev, summary)`` and write ``v{N}_b{batchId}``; partial
    writes (no _SUCCESS) are invisible and get overwritten by the retry.
    Returns False on a skipped replay, True when a version landed.
    State-dir metadata goes through the Hadoop FS API, so ``state_dir``
    accepts any URI the cluster's Hadoop conf resolves."""
    hfs.mkdirs(spark, state_dir)
    versions = _state_versions(spark, state_dir)
    if versions and versions[-1][1] == batch_id:
        return False  # at-least-once replay of the already-committed batch
    summary = build_summary()
    if versions:
        prev = spark.read.parquet(hfs.join(hfs.glob_escape(state_dir), versions[-1][2]))
        merged, next_v = merge_fn(prev, summary), versions[-1][0] + 1
    else:
        merged, next_v = summary, 0
    merged.write.mode("overwrite").parquet(
        hfs.join(state_dir, f"v{next_v}_b{batch_id}")
    )
    return True


def cm_merge_batch_into_state(
    spark: SparkSession,
    batch_df: DataFrame,
    state_dir: str,
    batch_id: int,
    col: str = "user_id",
    depth: int = 4,
    width: int = 1024,
) -> bool:
    """One additive count-min merge under the shared versioned-state
    recovery protocol (see _merge_batch_into_versioned_state)."""
    from hdfs_mapreduce_spark.operators.sketches import cm_merge, cm_sketch

    return _merge_batch_into_versioned_state(
        spark,
        state_dir,
        batch_id,
        lambda: cm_sketch(
            batch_df.select(F.col(col).cast("string").alias("item")),
            "item",
            depth,
            width,
        ),
        cm_merge,
    )


def mg_merge_batch_into_state(
    spark: SparkSession,
    batch_df: DataFrame,
    state_dir: str,
    batch_id: int,
    col: str = "user_id",
    k: int = 64,
) -> bool:
    """One Misra-Gries merge under the shared versioned-state recovery
    protocol (see _merge_batch_into_versioned_state)."""
    from hdfs_mapreduce_spark.operators.sketches import mg_merge, mg_summary

    return _merge_batch_into_versioned_state(
        spark,
        state_dir,
        batch_id,
        lambda: mg_summary(batch_df, col, k=k),
        lambda a, b: mg_merge(a, b, k=k),
    )


def stream_heavy_hitters(
    spark: SparkSession,
    sf_dir: str,
    state_dir: str,
    checkpoint_dir: str | None = None,
    col: str = "user_id",
    k: int = 64,
):
    """Streaming Misra-Gries heavy hitters via foreachBatch: each batch's
    MG summary merges into the maintained <= k-row state with the
    PODS'12 rule, so the state's error bound telescopes to N/(k+1) over
    everything the stream has seen while staying O(k) forever. Unlike
    the count-min state, the summary depends on batch boundaries, so the
    maintained state is bound-tested, not equality-tested, against the
    batch truth. Same recovery contract as stream_cm_sketch: versions
    record the producing batch id (the subtract-merge is not
    idempotent), partial writes are invisible."""
    hfs.mkdirs(spark, state_dir)

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        mg_merge_batch_into_state(
            spark, batch_df, state_dir, batch_id, col=col, k=k
        )

    stream = _events_stream(spark, sf_dir)
    writer = stream.writeStream.foreachBatch(merge)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


# --- bucketed upsert state (the 100 TB swap, wired) -------------------------------
def _bucketed_state_versions(spark: SparkSession, state_table: str) -> list[int]:
    prefix = f"{state_table}_v"
    return sorted(
        int(t.name[len(prefix):])
        for t in spark.catalog.listTables()
        if t.name.startswith(prefix) and t.name[len(prefix):].isdigit()
    )


def upsert_batch_into_bucketed_state(
    spark: SparkSession,
    batch_df: DataFrame,
    state_table: str,
    key: str = "event_id",
    n_buckets: int = 32,
) -> int:
    """One upsert merge against a BUCKETED state table (new rows win).
    Returns the version number written.

    This is stream_upsert_events' documented 100 TB swap, actually
    wired: the state versions are managed tables bucketed on the key
    (sources/catalog.write_bucketed), so the per-batch anti-join reads
    the state side with its bucket partitioning intact — NO Exchange
    ever touches the state relation, only the micro-batch (orders of
    magnitude smaller) hashes to align with it
    (tests/test_streaming.py asserts the Exchange count). The versioned
    snapshot contract is identical to the directory variant: readers see
    v{N} or v{N+1}, never a mix, and a failed batch leaves v{N} intact."""
    from hdfs_mapreduce_spark.sources.catalog import write_bucketed

    batch = batch_df.dropDuplicates([key])
    versions = _bucketed_state_versions(spark, state_table)
    if versions:
        state = spark.table(f"{state_table}_v{versions[-1]}")
        merged = state.join(
            batch.select(key), key, "left_anti"
        ).unionByName(batch)
        next_v = versions[-1] + 1
    else:
        merged, next_v = batch, 0
    write_bucketed(
        merged, f"{state_table}_v{next_v}", [key], n_buckets=n_buckets
    )
    return next_v


def stream_upsert_events_bucketed(
    spark: SparkSession,
    sf_dir: str,
    state_table: str,
    checkpoint_dir: str | None = None,
    n_buckets: int = 32,
):
    """stream_upsert_events with bucketed managed-table state: identical
    dataflow, but the steady-state merge join is exchange-free on the
    state side (see upsert_batch_into_bucketed_state)."""

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        upsert_batch_into_bucketed_state(
            spark, batch_df, state_table, n_buckets=n_buckets
        )

    stream = _events_stream(spark, sf_dir)
    writer = stream.writeStream.foreachBatch(merge)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


def read_bucketed_upsert_state(
    spark: SparkSession, state_table: str
) -> DataFrame:
    """Latest snapshot of a bucketed upsert state table."""
    versions = _bucketed_state_versions(spark, state_table)
    return spark.table(f"{state_table}_v{versions[-1]}")


ATTRIB_WINDOW_MIN = 60


def _attribution_pairs(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """Shared join shape for batch and stream: every purchase matched to
    each click by the same user within the preceding ATTRIB_WINDOW_MIN."""
    return purchases.join(
        clicks,
        F.expr(
            f"""
            c_user = p_user
            AND click_ts <= purchase_ts
            AND click_ts > purchase_ts - INTERVAL {ATTRIB_WINDOW_MIN} MINUTES
            """
        ),
    ).select(
        F.col("p_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
    )


def _split_clicks_purchases(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return clicks, purchases


def attribution_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream attribution join (the backfill path)."""
    events = load_table(spark, sf_dir, "events")
    clicks, purchases = _split_clicks_purchases(events)
    return _attribution_pairs(clicks, purchases)


def stream_click_attribution(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str | None = None
):
    """Stream-stream inner join with an event-time range condition — the
    §2.10 operator the windowed agg and sessionizer don't cover: purchases
    join clicks of the same user within the previous ATTRIB_WINDOW_MIN.

    Both sides carry a 1-hour watermark and the join predicate bounds
    click_ts to a closed interval around purchase_ts, so Spark can evict
    buffered rows once the watermark passes the interval — state stays
    bounded on both sides no matter how long the streams run (without the
    time bound, a stream-stream join must buffer a side forever). The batch
    twin (``attribution_pairs``) shares the exact join expression; the test
    proves stream ≡ batch on the closed region.
    """
    clicks, purchases = _split_clicks_purchases(_events_stream(spark, sf_dir))
    joined = _attribution_pairs(
        clicks.withWatermark("click_ts", "1 hour"),
        purchases.withWatermark("purchase_ts", "1 hour"),
    )
    writer = joined.writeStream.outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


def _session_window_agg(events: DataFrame) -> DataFrame:
    """Native gap-merged session windows per user: count + sum(value).

    Spark's ``session_window`` merges an event into the open session iff
    its timestamp is at most ``gap`` past the previous event (verified:
    an event exactly gap after its predecessor MERGES; diff > gap starts
    a new session) — the identical rule to the lag-based batch
    ``sessionize``, so the gaps-and-islands SQL oracle uses strict
    ``> gap``. The emitted window is [first_ts, last_ts + gap)."""
    return (
        events.groupBy(
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("sw"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the session-window aggregate (the backfill path)."""
    events = load_table(spark, sf_dir, "events")
    return _session_window_agg(events).orderBy("user_id", "session_start")


def stream_session_window_stats(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str | None = None
):
    """Streaming form: parquet source → 1h watermark → session-window agg.

    Unlike tumbling/sliding windows, session windows have data-dependent
    extents: the state store keeps one open session per (user, session)
    and MERGES sessions when a new event bridges two of them — Spark's
    native stateful session operator, not the applyInPandasWithState
    custom one (``stream_sessionize``, which emits per-event ids; this
    emits per-session aggregates). Watermark closes a session once no
    event within the gap can still arrive, bounding state at any scale.

    Returns the DataStreamWriter (caller picks sink + trigger)."""
    stream = _events_stream(spark, sf_dir)
    agg = _session_window_agg(stream.withWatermark("ts", "1 hour"))
    writer = agg.writeStream.outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


def session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session stats: event count and duration seconds."""
    events = load_table(spark, sf_dir, "events")
    s = sessionize(events)
    return (
        s.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max(_epoch_sec(F.col("ts"))) - F.min(_epoch_sec(F.col("ts")))).alias(
                "duration_sec"
            ),
        )
        .orderBy("user_id", "session_seq")
    )


# --- stream-static enrichment join ----------------------------------------------
def _nation_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ nation collapsed to the (c_custkey → n_name) lookup —
    dimension tables are bounded (customers ≪ events at any SF), so the
    stream side joins them as a broadcast static relation."""
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select("c_custkey", "n_name")


def _enriched_agg(events: DataFrame, dims: DataFrame) -> DataFrame:
    """events enriched with the user's nation, then 1-hour windows per
    nation: the stream-static join shape (static side broadcast; no state,
    no watermark needed for the join itself — only the downstream window
    aggregate holds state)."""
    return (
        events.join(F.broadcast(dims), events.user_id == dims.c_custkey)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("n_name"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_name",
            "n_events",
            "sum_value",
        )
    )


def enriched_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-static enrichment (oracle-checked)."""
    events = load_table(spark, sf_dir, "events")
    return _enriched_agg(events, _nation_dims(spark, sf_dir)).orderBy(
        "window_start", "n_name"
    )


def stream_enriched_event_stats(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str | None = None
):
    """Streaming form: parquet event stream → broadcast join against the
    static customer⋈nation lookup → watermarked tumbling-window aggregate.
    Stream-static joins are stateless on the stream side (each micro-batch
    probes the broadcast hash relation); the 1-hour watermark bounds only
    the window state, exactly as in stream_windowed_event_stats."""
    stream = _events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = _enriched_agg(stream, _nation_dims(spark, sf_dir))
    writer = agg.writeStream.outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer
