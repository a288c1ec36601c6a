"""Structured Streaming surface over the stream-shaped `events` table.

Covered: file-source replay, tumbling/sliding/session windows,
watermarks, dropDuplicatesWithinWatermark, memory + parquet sinks,
and ARBITRARY custom stateful processing via
``applyInPandasWithState`` (r5: verified working in this sandbox —
its worker path does NOT import protobuf). Still NOT covered:
``transformWithStateInPandas`` (the Spark 4 successor API) — its
Python worker requires ``google.protobuf`` which is absent/broken
here (verified: the worker crashes with ImportError on protobuf
descriptors; no network to install). The stateful semantics are
fully exercised through the older API; swap-in is local to this
module once protobuf exists.

Batch parquet replayed as a file stream with Trigger.AvailableNow —
the standard backfill/replay harness: the same code path serves a
live stream by pointing readStream at the live directory. Watermarks
bound state; results land in a named memory sink and are returned as
a DataFrame so the driver contract (and the DuckDB oracle, for the
window aggregates, since availableNow over a static table must equal
the batch answer) can check them.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kg.relational import query

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

_SRC_DIRS: dict[str, str] = {}


def _scratch(prefix: str) -> str:
    # session-scoped, atexit-cleaned root shared with dedup barriers
    # and IO round-trips (kg.io.scratch_dir)
    from kg.io import scratch_dir

    return scratch_dir(prefix)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table. The fixture is a
    single parquet file but file sources need a directory, so it is
    symlinked into a session-scoped temp dir (a live pipeline would
    point this at the ingest directory and new files stream in)."""
    src = os.path.abspath(f"{sf_dir}/events.parquet")
    d = _SRC_DIRS.get(src)
    if d is None:
        d = _scratch("src_")
        os.symlink(src, os.path.join(d, "events.parquet"))
        _SRC_DIRS[src] = d
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )


def _run_available_now(result: DataFrame, name: str) -> DataFrame:
    spark = result.sparkSession
    sink = f"{name}_{uuid.uuid4().hex[:8]}"
    q = (
        result.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", _scratch(f"ck_{name}_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


def tumbling_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day window with a 1-hour watermark."""
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
            "event_type",
            "n",
        )
    )
    return _run_available_now(agg, "daily")


def sliding_hourly_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2-hour window every 1 hour: sum of event values."""
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_c"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("win_start"),
            "n",
            "value_c",
        )
    )
    return _run_available_now(agg, "sliding")


def session_counts(spark: SparkSession, sf_dir: str, gap: str = "30 minutes") -> DataFrame:
    """Stateful session windows per user: the stream emits one row per
    merged session (complete mode, exact batch equivalence for the
    replay; a live pipeline would use append mode + watermark and
    accept that in-flight sessions emit later); per-user counts are a
    batch aggregation over the sink."""
    ev = events_stream(spark, sf_dir)
    sessions = ev.groupBy(
        F.session_window("ts", gap).alias("w"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    sunk = _run_available_now(sessions, "sessions")
    return sunk.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
    )


# ------------------------------------------------------- driver queries


@query(
    "stream_tumbling_daily",
    """
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
    """,
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    # availableNow over the static table == the batch answer
    return tumbling_daily_counts(spark, sf_dir)


@query(
    "stream_session_counts",
    """
    WITH flags AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR date_diff('microsecond', LAG(ts) OVER w, ts)
                       >= 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id,
           CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM flags GROUP BY user_id
    """,
)
def q_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session_window gap semantics: an event exactly `gap` after the
    # previous one starts a NEW session (windows are half-open), hence
    # the oracle's >=; the gap compares in integer MICROSECONDS —
    # date_diff('second') truncates, so a sub-second-past-the-boundary
    # gap (first appears at sf0.1) splits in the engine but not a
    # second-granularity oracle
    return session_counts(spark, sf_dir)


@query(
    "stream_sliding_value",
    """
    SELECT strftime(date_trunc('hour', ts) - offs.o * INTERVAL 1 HOUR,
                    '%Y-%m-%d %H:%M') AS win_start,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_c
    FROM events CROSS JOIN (VALUES (0), (1)) AS offs(o)
    GROUP BY 1
    """,
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    # a 2h-wide window sliding every 1h (epoch-aligned, same as
    # date_trunc('hour')) contains an event iff the window start is
    # floor_hour(ts) or floor_hour(ts) - 1h — hence the 2-offset cross
    # join in the oracle
    return sliding_hourly_value(spark, sf_dir)


def dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup: dropDuplicatesWithinWatermark on
    (user_id, event_type) — the exactly-once upsert building block.
    State is bounded by the watermark (late duplicates beyond 1 hour
    age out)."""
    ev = events_stream(spark, sf_dir)
    deduped = (
        ev.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return _run_available_now(deduped, "dedupwm")


def stream_to_parquet_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-sink path: stream -> parquet files + checkpointLocation
    (append mode; the durable-output counterpart of the memory sink).
    Returns the sunk rows read back."""
    out = _scratch("out_")
    ck = _scratch("ck_sink_")
    ev = events_stream(spark, sf_dir)
    enriched = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    q = (
        enriched.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out)


@query(
    "stream_parquet_sink",
    "SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'",
)
def q_stream_parquet_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ts passes through unmodified; the sink must reproduce the batch
    # projection exactly
    return stream_to_parquet_sink(spark, sf_dir)


@query(
    "stream_dedup_watermark",
    """
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one surviving row per (user_id, event_type) -> the count equals
    # the batch COUNT(DISTINCT user_id) per type
    return dedup_within_watermark(spark, sf_dir)


# ----------------------------------------------- streaming KG pipeline

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)
_PAGES_STREAM_DIRS: dict[str, str] = {}


def pages_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of KG input pages. The deterministic pages
    fixture (derived from the driver's `documents` table) is written
    once per process into a scratch directory and replayed — pointing
    readStream at a live crawl-output directory serves production with
    the SAME downstream code."""
    d = _PAGES_STREAM_DIRS.get(sf_dir)
    if d is None:
        from kg.fixtures import pages_from_documents

        d = _scratch("pages_src_")
        pages_from_documents(spark, sf_dir).write.mode("overwrite").parquet(d)
        _PAGES_STREAM_DIRS[sf_dir] = d
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(d)
    )


def stream_kg_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The K1+M2-M7 stack ON A STREAM: extract -> sentence split ->
    fused NER, the exact batch stage functions applied to a streaming
    DataFrame (they are per-row Arrow/Catalyst transforms, so Spark
    accepts them unchanged), aggregated to per-ent_type mention counts
    in complete mode. Stream == batch equality is gated in
    tests/test_streaming.py; the driver row is rows-only (the NER
    stack is not SQL-expressible)."""
    from kg.pipeline import stage_extract, stage_mentions, stage_sentences

    mentions = stage_mentions(stage_sentences(stage_extract(pages_stream(spark, sf_dir))))
    agg = mentions.groupBy("ent_type").agg(
        F.count(F.lit(1)).alias("n_mentions"),
        # COUNT(DISTINCT) is not allowed on streams; bit_xor of url
        # hashes is an order-insensitive content checksum instead
        F.bit_xor(F.xxhash64("url", "sent_id", "begin")).alias("checksum"),
    )
    return _run_available_now(agg, "kgm")


@query("stream_kg_mentions", extra=True)  # rows-only: NER not in SQL
def q_stream_kg_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_kg_mentions(spark, sf_dir)


# ----------------------------------- custom stateful operator (r5)

_MULTI_SRC_DIRS: dict[str, str] = {}
STATEFUL_N_FILES = 4


def events_multifile_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events replayed as STATEFUL_N_FILES separate files with
    maxFilesPerTrigger=1, so an availableNow run processes MULTIPLE
    micro-batches and per-key state genuinely carries across batches
    (the single-file source above collapses to one batch, which would
    leave cross-batch state untested)."""
    d = _MULTI_SRC_DIRS.get(sf_dir)
    if d is None:
        d = _scratch("src_multi_")
        (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .repartition(STATEFUL_N_FILES)
            .write.mode("overwrite")
            .parquet(d)
        )
        _MULTI_SRC_DIRS[sf_dir] = d
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )


def stateful_running_totals(
    spark: SparkSession, sf_dir: str, reduce: bool = True
) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per event_type, explicit GroupState carries (count, cents-total)
    across micro-batches and every batch emits the running totals
    (update mode) — the building block for streaming feature stores /
    running counters that windowed aggregation cannot express.

    Determinism despite arbitrary batch splits: emitted counts are
    CUMULATIVE, so the final state per key — selected as max(n) +
    max_by(value_c, n) over the sink — equals the batch groupBy no
    matter how the files split into batches; cents are rounded
    JVM-side BEFORE the Arrow boundary with the same F.round as the
    batch oracle (pandas' own round is banker's — replicating HALF_UP
    in numpy is exactly the engine-vs-oracle drift this avoids), so
    Python only sums int64. State is per-key-bounded (two longs);
    production keys (url hosts, user ids) shard across executors by
    the groupBy hash — no state skew beyond key skew itself."""
    import pandas as pd  # local: worker-side import stays cheap

    from pyspark.sql.streaming.state import GroupStateTimeout

    ev = events_multifile_stream(spark, sf_dir).select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_c"),
    )

    def fn(key, pdfs, state):
        n, vc = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            vc += int(pdf["value_c"].sum())
        state.update((n, vc))
        yield pd.DataFrame(
            {"event_type": [key[0]], "n": [n], "value_c": [vc]}
        )

    out = ev.groupBy("event_type").applyInPandasWithState(
        fn,
        "event_type string, n long, value_c long",
        "n long, value_c long",
        "update",
        GroupStateTimeout.NoTimeout,
    )
    sunk = _run_available_now_update(out, "stateful")
    if not reduce:
        return sunk  # raw per-batch emissions (tests inspect these)
    return sunk.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max_by("value_c", "n").alias("value_c"),
    )


def _run_available_now_update(
    result: DataFrame, name: str, mode: str = "update"
) -> DataFrame:
    """Update/append-mode twin of _run_available_now (the memory sink
    then ACCUMULATES rows across batches — update callers reduce to
    final state; append callers read the rows as-is)."""
    spark = result.sparkSession
    sink = f"{name}_{uuid.uuid4().hex[:8]}"
    q = (
        result.writeStream.format("memory")
        .queryName(sink)
        .outputMode(mode)
        .option("checkpointLocation", _scratch(f"ck_{name}_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


@query(
    "stream_stateful_totals",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_c
    FROM events GROUP BY event_type
    """,
    extra=True,
)
def q_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    # cumulative state replayed over 4 micro-batches must land exactly
    # on the batch aggregation
    return stateful_running_totals(spark, sf_dir)


# ------------------------------------------- stream-stream / stream-static


_TIME_SRC_DIRS: dict[str, str] = {}


def events_timeordered_stream(
    spark: SparkSession, sf_dir: str, n_files: int = STATEFUL_N_FILES
) -> DataFrame:
    """Events replayed as n_files TIME-ORDERED files (contiguous ts
    ranges, file names and mtimes both ascending so FileStreamSource
    picks them up in order). Watermark semantics assume event time
    advances roughly with arrival order — the randomly-partitioned
    replay above violates that (every batch contains the full time
    range, so a 1-hour watermark after batch 1 classifies most of
    batch 2 as late and drops join state), which is correct watermark
    behavior but wrong as a replay harness. A live, approximately
    ordered stream is what this source simulates.

    The global-sort ntile below is REPLAY PREP, not a measured query:
    it runs once per (sf_dir, n_files) to slice the fixture into
    time-contiguous files and is cached/memoized — a production
    ingest directory is already time-ordered and never runs it."""
    key = f"{sf_dir}:{n_files}"
    d = _TIME_SRC_DIRS.get(key)
    if d is None:
        import glob
        import shutil

        d = _scratch("src_torder_")
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        from pyspark.sql import Window

        # cache before the per-slice loop: each write filters the same
        # DataFrame, and without the barrier every slice re-runs the
        # global-sort ntile window over the full table
        sliced = ev.withColumn(
            "_slice",
            F.ntile(n_files).over(Window.orderBy("ts", "event_id")),
        ).cache()
        try:
            for i in range(1, n_files + 1):
                tmp = _scratch(f"src_torder_tmp{i}_")
                (
                    sliced.filter(F.col("_slice") == i)
                    .drop("_slice")
                    .coalesce(1)
                    .write.mode("overwrite")
                    .parquet(tmp)
                )
                part = glob.glob(f"{tmp}/part-*.parquet")[0]
                dst = os.path.join(d, f"{i:02d}.parquet")
                shutil.move(part, dst)
                os.utime(dst, (1_000_000_000 + i, 1_000_000_000 + i))
        finally:
            sliced.unpersist()
        _TIME_SRC_DIRS[key] = d
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )


def stream_stream_purchase_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM inner join with event-time range condition: each
    purchase joins the same user's clicks in the preceding hour
    (attribution). Both sides stream from the time-ordered 4-file
    replay, so matches genuinely cross micro-batches (a purchase early
    in batch 3 finds a click buffered from batch 2); the 1-hour
    watermarks bound the buffered state exactly as on a live stream —
    without them the click buffer would grow forever. Inner-join
    append emits each match the moment both sides have arrived (only
    OUTER stream-stream joins gate emission on the watermark), so
    availableNow over the finite replay equals the batch join."""
    p = (
        events_timeordered_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_event_id"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    c = (
        events_timeordered_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("c_event_id"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    j = p.join(
        c,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "inner",
    ).select(
        "user_id",
        "p_event_id",
        "c_event_id",
        F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("p_ts_s"),
        F.date_format("c_ts", "yyyy-MM-dd HH:mm:ss").alias("c_ts_s"),
    )
    return _run_available_now_update(j, "ssjoin", mode="append")


@query(
    "stream_stream_join",
    """
    SELECT p.user_id,
           p.event_id AS p_event_id,
           c.event_id AS c_event_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS p_ts_s,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS c_ts_s
    FROM events p JOIN events c
      ON c.user_id = p.user_id
     AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    """,
    extra=True,
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_stream_purchase_clicks(spark, sf_dir)


def stream_static_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC join: the event stream enriches against the
    static customer dimension (user_id = c_custkey) — the standard
    streaming-enrichment shape; the static side broadcasts into every
    micro-batch, no state. Aggregated to per-market-segment totals in
    complete mode."""
    ev = events_multifile_stream(spark, sf_dir)
    dim = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    agg = (
        ev.join(F.broadcast(dim), "user_id")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_c"),
        )
    )
    return _run_available_now(agg, "sstatic")


@query(
    "stream_static_join",
    """
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT) AS value_c
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY c.c_mktsegment
    """,
    extra=True,
)
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_static_segment_counts(spark, sf_dir)


# ----------------------------------------- foreachBatch idempotent sink

UPSERT_KEY = ["user_id", "event_type"]


def _scd1_merge(target: DataFrame, batch: DataFrame) -> DataFrame:
    """Newest-row-per-key merge of a batch into the current target
    (SCD-1 / MERGE ... WHEN MATCHED UPDATE). The order
    (ts, value_c, event_id) DESC is a TOTAL order on rows within a
    key (event_id is unique), so merging batch-by-batch commutes with
    the one-shot batch merge — which is also why re-applying an
    already-applied batch is a no-op: the merge itself is idempotent,
    the batch-id log only skips the wasted work."""
    from pyspark.sql import Window

    allrows = target.unionByName(batch)
    w = Window.partitionBy(*UPSERT_KEY).orderBy(
        F.desc("ts"), F.desc("value_c"), F.desc("event_id")
    )
    return (
        allrows.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _batch_projection(df: DataFrame) -> DataFrame:
    return df.select(
        "user_id",
        "event_type",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("value_c"),
        "event_id",
    )


def _current_version_path(target_root: str) -> str | None:
    """The version directory the CURRENT pointer names, or None."""
    ptr = os.path.join(target_root, "CURRENT")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        name = f.read().strip()
    return os.path.join(target_root, name) if name else None


def read_upsert_target(spark: SparkSession, target_root: str) -> DataFrame:
    """Read the committed state of a versioned upsert target."""
    cur = _current_version_path(target_root)
    if cur is None:
        raise FileNotFoundError(f"no CURRENT version under {target_root}")
    return spark.read.parquet(cur)


def upsert_batch_into_parquet(
    batch: DataFrame, batch_id: int, target_root: str, log_dir: str
) -> bool:
    """One foreachBatch invocation: idempotently MERGE a micro-batch
    into a parquet target. Returns False (skipped) if this batch_id
    is already logged. Exactly-once recipe for a sink without
    transactional MERGE, crash-safe at EVERY step via versioned
    directories + an atomically replaced CURRENT pointer (the
    manifest-pointer idea table formats like Iceberg use): the new
    version is fully written BEFORE the pointer moves (os.replace is
    atomic), so a crash anywhere leaves CURRENT naming a complete
    older version — never a half-written or deleted target (a naive
    rmtree-then-rename swap has a window where the target is GONE
    and a restart would rebuild from the redelivered batch alone).
    Replays after checkpoint recovery hit (1) the batch-id log and
    are skipped, and (2) even without the log entry — the
    crash-between-pointer-move-and-log case — the merge re-applies
    as a no-op because total-order SCD-1 is idempotent. Orphan
    version dirs from crashed attempts are garbage with unique
    names, never read (CURRENT never pointed at them)."""
    import shutil

    marker = os.path.join(log_dir, f"{batch_id}.done")
    if os.path.exists(marker):
        return False
    os.makedirs(target_root, exist_ok=True)
    # r7 (ADVICE r6): the marker write below assumed the caller
    # pre-created log_dir — a missing dir turned a committed merge
    # into a FileNotFoundError after the version swap
    os.makedirs(log_dir, exist_ok=True)
    spark = batch.sparkSession
    projected = _batch_projection(batch)
    cur = _current_version_path(target_root)
    current = spark.read.parquet(cur) if cur else projected.limit(0)
    merged = _scd1_merge(current, projected)
    vname = f"v{batch_id}_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(os.path.join(target_root, vname))
    tmp_ptr = os.path.join(target_root, f"CURRENT.tmp{uuid.uuid4().hex[:8]}")
    with open(tmp_ptr, "w") as f:
        f.write(vname)
    os.replace(tmp_ptr, os.path.join(target_root, "CURRENT"))
    # the superseded version is garbage once the pointer moved; a
    # crash before this cleanup leaves only an unreferenced dir
    if cur:
        shutil.rmtree(cur, ignore_errors=True)
    with open(marker, "w") as f:
        f.write(vname)
    return True


def stream_upsert_to_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exactly-once triple-store upsert demo (SURVEY §2.C):
    foreachBatch over the time-ordered replay MERGEs each micro-batch
    newest-per-key into a parquet target — the pattern a production
    triple/feature store uses when the sink has no native MERGE.
    Returns the final target table. Scale shape: each micro-batch
    shuffles batch+target keyed on the upsert key; a 100 TB target
    would partition by a key prefix and rewrite only touched
    partitions (same code per partition)."""
    ev = events_timeordered_stream(spark, sf_dir)
    target_root = _scratch("upsert_tgt_")
    log_dir = _scratch("upsert_log_")

    q = (
        ev.writeStream.foreachBatch(
            lambda b, bid: upsert_batch_into_parquet(b, bid, target_root, log_dir)
        )
        .option("checkpointLocation", _scratch("ck_upsert_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return read_upsert_target(spark, target_root).select(
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "value_c",
        "event_id",
    )


@query(
    "stream_upsert_foreachbatch",
    """
    WITH ranked AS (
      SELECT user_id, event_type, ts,
             CAST(ROUND(value * 100) AS BIGINT) AS value_c, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC,
                                         CAST(ROUND(value * 100) AS BIGINT) DESC,
                                         event_id DESC) AS rn
      FROM events)
    SELECT user_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, value_c, event_id
    FROM ranked WHERE rn = 1
    """,
    extra=True,  # local-only: registry stays at 50
)
def q_stream_upsert_foreachbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental per-batch MERGE == the one-shot batch SCD-1 (the
    oracle): the exactness of the equality is exactly the
    total-order/commutativity argument in _scd1_merge."""
    return stream_upsert_to_parquet(spark, sf_dir)


# ------------------------------------------- streaming near-dup gate

STREAM_GATE_OFFSET = 1_000_000
GATE_N_FILES = 4
_GATE_SRC_DIRS: dict[str, str] = {}


def _incoming_docs_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic 'incoming documents' fixture the gate
    filters: every corpus doc arrives again under a shifted id —
    originals with doc_id %% 3 == 0 as EXACT copies (guaranteed
    band collisions), the rest token-reversed (reversal changes
    every word n-gram of a non-palindromic doc, so these are mostly
    novel). Which docs actually collide is data the oracle re-derives
    exactly; nothing downstream depends on a similarity threshold."""
    from kg.relational import ws_tokens

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        (F.col("doc_id") + STREAM_GATE_OFFSET).alias("doc_id"),
        F.when((F.col("doc_id") % 3) == 0, F.col("text"))
        .otherwise(F.concat_ws(" ", F.reverse(ws_tokens(F.col("text")))))
        .alias("text"),
    )


def incoming_docs_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incoming-docs fixture as a GATE_N_FILES-file stream
    (maxFilesPerTrigger=1 -> multiple micro-batches). No time
    ordering needed: the gate is stateless per document."""
    d = _GATE_SRC_DIRS.get(sf_dir)
    if d is None:
        d = _scratch("src_gate_")
        (
            _incoming_docs_batch(spark, sf_dir)
            .repartition(GATE_N_FILES)
            .write.mode("overwrite")
            .parquet(d)
        )
        _GATE_SRC_DIRS[sf_dir] = d
    return (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )


def stream_neardup_gate_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup INGEST GATE: each micro-batch of incoming documents
    is MinHash-banded and probed against the static corpus band index
    — the dedup-before-ingest pattern of a production corpus builder
    (don't let near-copies of what you already hold enter the lake).
    Emits (doc_id, n_hit_bands) for incoming docs that collide with
    the corpus in >= 1 of the 8 bands; the kept set is the anti
    complement.

    Streaming shape: the stream side computes signatures with the
    MAP-ONLY band form (kg/dedup.py minhash_band_buckets_maponly — a
    groupBy signature would be a streaming aggregation upstream of a
    join, which Spark disallows), the semi join keeps stream rows
    only (one row per colliding band, no fan-out from multiple static
    partners), and the per-doc count is the one stateful operator. At
    100 TB the corpus index does not broadcast: it is written
    bucketed by (band, bucket) once and each micro-batch co-locates
    into it (or a bloom over bucket keys prefilters, q_bloom_prune
    shape); the fixture-sized index here takes the broadcast path."""
    from kg.dedup import minhash_band_buckets_maponly
    from kg.io import materialize_barrier

    corpus = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # barrier the index: the static side of a stream-static join is
    # re-planned and re-executed EVERY micro-batch, so an unbarriered
    # index would re-hash the whole corpus once per batch (4x here)
    idx = materialize_barrier(
        minhash_band_buckets_maponly(corpus)
        .select("band", "bucket")
        .distinct(),
        "ndgate_idx_",
    )
    hits = minhash_band_buckets_maponly(
        incoming_docs_stream(spark, sf_dir)
    ).join(F.broadcast(idx), ["band", "bucket"], "left_semi")
    agg = hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hit_bands")
    )
    return _run_available_now(agg, "ndgate")


def _neardup_gate_oracle() -> str:
    from kg.dedup import _band_ctes_sql, _perms_values_sql
    from kg.relational import sql_ws_tokens

    return f"""
    WITH perms(perm, a, b) AS (VALUES
      {_perms_values_sql()}
    ),
    streamdocs AS (
      SELECT d.doc_id + {STREAM_GATE_OFFSET} AS doc_id,
             CASE WHEN d.doc_id % 3 = 0 THEN d.text
                  ELSE array_to_string(
                         list_reverse({sql_ws_tokens("d.text")}), ' ')
             END AS text
      FROM documents d),
    {_band_ctes_sql("documents", "c_")},
    {_band_ctes_sql("streamdocs", "s_")},
    idx AS (SELECT DISTINCT band, bucket FROM c_bnd)
    SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit_bands
    FROM s_bnd s JOIN idx i ON i.band = s.band AND i.bucket = s.bucket
    GROUP BY s.doc_id
    """


@query(
    "stream_neardup_gate",
    _neardup_gate_oracle(),
    extra=True,  # local-only: registry stays at 50
)
def q_stream_neardup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_neardup_gate_counts(spark, sf_dir)
