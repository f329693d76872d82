"""Structured Streaming ingestion over the ``events`` fixture table.

The reference is batch-only (no watermarks/windows/state anywhere — see
SURVEY.md §2.2 "Streaming"), so this module is the mandated extension
surface, built the way a 100 TB event pipeline would be:

- **readStream from files** with an explicit schema (streaming file sources
  never infer schemas; on a cluster this is the landing bucket the CDC/
  Kafka tailer writes to).
- **Event-time, not arrival-time**: every aggregation keys on the ``ts``
  column with a watermark, so late data is handled deterministically and
  state is bounded — the watermark is what keeps a forever-running job's
  state store from growing without bound.
- **Windowed aggs only** (tumbling + sliding). The queries are the exact
  streaming twins of the batch queries in operators/relational.py
  (events_tumbling_hourly), and the tests assert batch/stream equivalence
  under Trigger.AvailableNow — the Spark guarantee that makes the batch
  oracle meaningful for the streaming path.

Sinks: tests use the memory sink; production writes would be
``writeStream.toTable(...)`` (Iceberg) with checkpointing — the
``checkpoint_dir`` parameter is threaded through for that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])


def suggest_state_partitions(spark: SparkSession, sf_dir: str) -> int:
    """State-partition count for an AvailableNow drain of the events
    fixture. Stateful operators hash-partition their state into
    ``spark.sql.shuffle.partitions`` stores, and EVERY store pays a
    fixed open/snapshot/commit cost per micro-batch regardless of row
    count — at 32 partitions the two stream-stream join drains (4
    stores each) were the registry's two most expensive entries at
    10.8 s / 7.5 s wall for <200 k input rows, with ~96 % of summed
    task time in state-store bookkeeping, not state work; 8 partitions
    ran 3.0 s / 2.7 s with identical output (r11 profile, BASELINE.md).

    Size-derive the count like ``ld()``'s fanout heuristic in reverse:
    one state partition per ~8 MiB of source, floored at 8 (real
    parallelism once state work is nontrivial), capped at the session
    default — a 100 TB landing directory keeps the cluster's configured
    width; this helper only shrinks SMALL drains, never widens big
    ones. Every registry drain starts a fresh checkpoint, so the count
    is free to choose per run; a long-lived production query must keep
    it fixed for the checkpoint's lifetime (Spark freezes state
    partitioning at first start). Non-local storage (no os.path answer)
    keeps the session default."""
    import os

    try:
        default = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        default = 200
    path = os.path.join(sf_dir, "events.parquet")
    try:
        if os.path.isdir(path):
            size = sum(e.stat().st_size for e in os.scandir(path)
                       if e.is_file())
        else:
            size = os.path.getsize(path)
    except OSError:
        return default
    # cap OUTSIDE the floor: with a session width below 8 the old
    # max(8, min(...)) form WIDENED past the configured setting,
    # violating the never-widen contract (r11 review find)
    return min(default, max(8, -(-size // (8 << 20))))


class drain_conf:
    """Context manager: apply the size-derived state-partition count for
    one drain, restore the session setting after (the conf is read at
    query START, so setting it around ``.start()``/awaitTermination is
    exactly the per-checkpoint scope it needs)."""

    _KEY = "spark.sql.shuffle.partitions"

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark, self.sf_dir = spark, sf_dir

    def __enter__(self):
        self.old = self.spark.conf.get(self._KEY)
        self.spark.conf.set(
            self._KEY, str(suggest_state_partitions(self.spark,
                                                    self.sf_dir)))
        return self

    def __exit__(self, exc_type, exc, tb):
        self.spark.conf.set(self._KEY, self.old)
        return False

def _hadoop_is_dir(spark: SparkSession, path: str) -> bool:
    """Directory test through the path's own Hadoop FileSystem (local,
    HDFS, s3a, ... — whatever the scheme resolves to); falls back to
    os.path for plain local paths if the JVM gateway is unavailable."""
    try:
        jvm = spark.sparkContext._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(
            spark.sparkContext._jsc.hadoopConfiguration())
        return bool(fs.getFileStatus(jpath).isDirectory())
    except AttributeError:
        # No JVM gateway (mocked session) — safe for LOCAL paths only.
        # A remote URI (s3a://..., and the equally legal single-slash
        # hdfs:/path form) cannot be answered by os.path: isdir would
        # return False and silently select the pathGlobFilter branch,
        # streaming ZERO rows from a directory-layout table — the exact
        # failure this helper exists to prevent. Parse the scheme with
        # urlparse (catches both slash forms; a bare /tmp/x has no
        # scheme) and fail loudly on anything non-local (r10, ADVICE
        # item + review find).
        from urllib.parse import urlparse

        parsed = urlparse(path)
        if parsed.scheme not in ("", "file"):
            raise ValueError(
                f"cannot determine directory layout of remote path "
                f"{path!r} without a JVM gateway — refusing to guess "
                f"(os.path is blind to the {parsed.scheme} scheme)")
        # 'file://host/path' names a REMOTE host: treating it as the
        # local '/path' silently answers for the wrong filesystem —
        # same fail-loud rule as the non-local schemes (r11, ADVICE).
        if parsed.scheme == "file" and parsed.netloc not in ("",
                                                             "localhost"):
            raise ValueError(
                f"cannot determine directory layout of {path!r}: "
                f"file:// URI names remote host {parsed.netloc!r} and "
                "os.path only answers for the local filesystem")
        import os
        local = parsed.path if parsed.scheme == "file" else path
        return os.path.isdir(local)
    except Exception as exc:
        # FileNotFound → not a directory (the glob branch handles the
        # nonexistent-table case identically); any OTHER FS error must
        # propagate — swallowing it would silently select the glob
        # branch and stream ZERO rows from a directory-layout table, the
        # exact failure class this helper exists to prevent. When py4j
        # gives us the java exception, trust ONLY its class name — a
        # non-FNF error whose MESSAGE mentions FileNotFoundException
        # (e.g. an S3 access failure wrapping one in its cause chain)
        # must still propagate (r10 review find). The stringified-type
        # fallback remains only for py4j-free exception classes.
        jexc = getattr(exc, "java_exception", None)
        if jexc is not None:
            try:
                jcls = jexc.getClass().getName()
            except Exception:
                raise exc
            if jcls.endswith("FileNotFoundException"):
                return False
            raise
        if "FileNotFoundException" in str(type(exc)):
            return False
        raise


def read_events_stream(spark: SparkSession, sf_dir: str,
                       max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over the events parquet (explicit schema —
    streaming sources never infer). ``maxFilesPerTrigger`` simulates
    incremental arrival in tests; omit it for AvailableNow backfills.

    A one-off batch probe picks the physical ``ts`` layout — TIMESTAMP(NANOS)
    fixtures arrive as long (legacy flag) and are rebuilt via exact integer
    ns→µs division; TIMESTAMP(MICROS) fixtures arrive as TIMESTAMP_NTZ and
    are cast (UTC session → identical wall clock). Either way downstream
    sees the session-zoned TIMESTAMP of ``EVENT_SCHEMA``."""
    from ..operators.relational import normalize_event_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stored_ts = (spark.read.parquet(f"{sf_dir}/events.parquet")
                 .schema["ts"].dataType)
    raw_schema = StructType([
        f if f.name != "ts" else StructField("ts", stored_ts)
        for f in EVENT_SCHEMA.fields
    ])
    # File-stream sources take a directory. The driver testdata lays the
    # table out as ONE FILE (`events.parquet`), so we stream the parent
    # dir narrowed by pathGlobFilter; a pipeline-written table is a
    # DIRECTORY of part files — stream it directly (the glob filter
    # matches LEAF file names, so filtering the parent dir by
    # "events.parquet" would silently read zero part files: the r9
    # dupflood parity sweep caught exactly that as 13 empty streams).
    # The layout check goes through the Hadoop FileSystem for the path's
    # scheme — os.path.isdir is blind to s3a://hdfs:// URIs and would
    # quietly reinstate the zero-rows branch on exactly the production
    # landing directories the directory branch exists for.
    table = f"{sf_dir}/events.parquet"
    reader = spark.readStream.schema(raw_schema)
    if _hadoop_is_dir(spark, table):
        src_dir = table
    else:
        src_dir = sf_dir
        reader = reader.option("pathGlobFilter", "events.parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = normalize_event_ts(reader.parquet(src_dir), stored_ts)
    # same corrupted-shard contract as the batch loader (pure filter +
    # projection — streaming-safe): poisoned values/timestamps must not
    # abort the decimal protocol or blow up watermarked window state
    from ..operators.relational import sanitize_events

    return sanitize_events(stream)


def hourly_rollup(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Tumbling 1-hour windows per event type (streaming twin of
    events_tumbling_hourly). Watermark bounds state: windows older than
    max(event time) − watermark are finalized and evicted.

    The value sum follows the batch determinism protocol (per-row
    DECIMAL(28,6) cast → exact order-independent sum → one double cast):
    micro-batch arrival order then cannot perturb the emitted double, which
    is what lets the DRAINED stream be checked against the same DuckDB
    oracle as the batch twin (registry entry streaming_hourly_rollup)."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast("decimal(28,6)"))
                 .cast("double").alias("total_value"))
            .select(F.col("w.start").alias("hour_start"), "event_type",
                    "n_events", "total_value"))


def sliding_rollup(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Sliding 1-hour windows every 15 minutes — each event lands in 4
    windows; state is 4× the tumbling case, still watermark-bounded.
    The average follows the determinism protocol (exact decimal sum ÷
    count, both order-independent) so the drained stream is
    oracle-checkable like the tumbling rollup."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 (F.sum(F.col("value").cast("decimal(28,6)")).cast("double")
                  / F.count(F.lit(1))).alias("avg_value"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "n_events", "avg_value"))


# DuckDB twins for the DRAINED (AvailableNow) streams: draining finalizes
# every window, so the batch SQL over the same file is a fair oracle.
# WHERE ts IS NOT NULL in all three window oracles: Spark's event-time
# window operators plan an isnotnull(ts) filter (a row without event
# time belongs to no window), while a bare SQL GROUP BY would keep a
# NULL group — the oracle must follow the window semantics (r9
# self-review find; NULL-ts rows are a corrupted-shard shape that
# sanitize_events deliberately passes through).
ORACLE_STREAMING_HOURLY = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
       event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
"""

ORACLE_STREAMING_SLIDING = """
WITH hits AS (
  SELECT ts, value, UNNEST([
           date_trunc('hour', ts),
           date_trunc('hour', ts - INTERVAL 15 MINUTE) + INTERVAL 15 MINUTE,
           date_trunc('hour', ts - INTERVAL 30 MINUTE) + INTERVAL 30 MINUTE,
           date_trunc('hour', ts - INTERVAL 45 MINUTE) + INTERVAL 45 MINUTE
         ]) AS win_start
  FROM events WHERE ts IS NOT NULL)
SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS window_start,
       strftime(win_start + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S')
         AS window_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)
         AS avg_value
FROM hits
WHERE ts >= win_start AND ts < win_start + INTERVAL 1 HOUR
GROUP BY win_start
"""


def session_windows(events: DataFrame, gap: str = "30 minutes",
                    watermark: str = "10 minutes") -> DataFrame:
    """Session windows per user via the built-in session_window — the
    watermark is what lets Spark close a session (no event for ``gap``
    past the watermark) and emit it. Twin of the batch lag/cumsum
    sessionization in operators/relational.py."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast("decimal(28,6)"))
                 .cast("double").alias("total_value"))
            .select("user_id", F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "n_events", "total_value"))


# session_window(gap) semantics: a session is a maximal run of events with
# inter-arrival ≤ gap; start = first event, end = LAST EVENT + gap. The
# lag/cumsum SQL below reproduces that exactly, so the drained stream is
# oracle-checkable (decimal-protocol sum keeps values order-independent).
ORACLE_STREAMING_SESSIONS = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE OR
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events WHERE ts IS NOT NULL),
sessions AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
         AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
FROM sessions GROUP BY user_id, sid
"""


def _purchase_click_join(events: DataFrame, watermark: str,
                         lookback: str, how: str) -> DataFrame:
    """Shared body of the purchase←clicks interval joins — one place for
    the projections, watermarks, and 3-term interval condition so the
    inner and leftOuter variants can never drift (r9 self-review)."""
    purchases = (events.filter(F.col("event_type") == "purchase")
                 .select(F.col("user_id").alias("p_user"),
                         F.col("event_id").alias("purchase_id"),
                         F.col("ts").alias("p_ts"))
                 .withWatermark("p_ts", watermark))
    clicks = (events.filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user"),
                      F.col("event_id").alias("click_id"),
                      F.col("ts").alias("c_ts"))
              .withWatermark("c_ts", watermark))
    cond = ((F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") <= F.col("p_ts"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr(
                f"INTERVAL {lookback}")))
    return (purchases.join(clicks, cond, how)
            .select("purchase_id", "click_id",
                    F.col("p_user").alias("user_id"), "p_ts", "c_ts"))


def purchase_click_interval_join(events: DataFrame,
                                 watermark: str = "10 minutes",
                                 lookback: str = "30 minutes") -> DataFrame:
    """Stream-stream inner join: each purchase matched to the same user's
    clicks in the preceding ``lookback`` window.

    The hardest streaming op to get right at scale: BOTH sides buffer
    state, and only the pair of watermarks plus the time-interval condition
    lets Spark evict it — an unbounded-time equi-join would grow state
    forever. The interval condition (click ≤ purchase < click+lookback)
    gives the state store the eviction bound.
    """
    return _purchase_click_join(events, watermark, lookback, "inner")


def purchase_click_left_join(events: DataFrame,
                             watermark: str = "10 minutes",
                             lookback: str = "30 minutes") -> DataFrame:
    """Stream-stream LEFT OUTER interval join — the attribution variant
    that also emits purchases with NO qualifying click (click columns
    NULL), the rows a conversion-rate report needs.

    Outer semantics are the hard part of streaming joins: an unmatched
    purchase can only be emitted once the watermark proves no future
    click can still match it (p_ts has fallen behind the click-side
    watermark minus the interval bound), so null-padded rows trail the
    event time by watermark + lookback. On an AvailableNow drain the
    trailing no-data micro-batch advances the watermark to
    max(event time) − delay and flushes every unmatched purchase older
    than that; purchases inside the final watermark window remain in
    state when the query stops — inherent to outer streaming joins, NOT
    a bug, and exactly what resuming the query would flush next. The
    pytest pins: matched rows ≡ the batch inner join, emitted unmatched
    rows ⊆ the batch anti join, and completeness for purchases older
    than the final-watermark horizon.
    """
    return _purchase_click_join(events, watermark, lookback, "leftOuter")


def dedup_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup on event_id with watermark-bounded state
    (``dropDuplicatesWithinWatermark``): two records with the same key are
    collapsed if they arrive within the watermark delay of each other, and
    the key's state is evicted once the watermark passes it.

    This is the streaming half of the dedup suite (operators/dedup.py is
    the batch half): in a 100 TB ingest topology the at-least-once
    upstream (Kafka replays, file-tailer restarts) makes duplicate
    event_ids routine, and an unbounded ``dropDuplicates`` would hold
    every key ever seen — the watermark is what makes it runnable forever.
    """
    return (events
            .withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["event_id"]))


def user_running_stats(events: DataFrame,
                       watermark: str = "10 minutes") -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running totals that survive across micro-batches in the state store.

    This is the escape hatch for operators the built-in windowed aggs can't
    express (per-key model state, custom eviction, cross-batch counters).
    State is one tiny tuple per user — Arrow-batched in and out, no
    row-at-a-time Python. Output mode "update": each micro-batch emits the
    refreshed totals only for users it touched.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update_user(key, pdf_iter, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "total_value": [total]})

    return (events
            .withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                update_user,
                outputStructType="user_id long, n_events long, "
                                 "total_value double",
                stateStructType="n long, total double",
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


def run_available_now(result: DataFrame, query_name: str,
                      checkpoint_dir: str, mode: str = "complete"):
    """Drain everything currently in the source and stop — the backfill/
    test harness trigger. Returns the finished StreamingQuery; read results
    from the in-memory table ``query_name``."""
    q = (result.writeStream
         .format("memory")
         .queryName(query_name)
         .outputMode(mode)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q


def write_foreach_batch_idempotent(result: DataFrame, out_dir: str,
                                   checkpoint_dir: str):
    """Exactly-once file sink via ``foreachBatch``: each micro-batch lands
    in ``out_dir/batch_id=<n>`` with overwrite mode, so a batch replayed
    after a crash (Structured Streaming re-runs the last uncommitted batch
    with the SAME batch_id) overwrites its own partial output instead of
    duplicating it. This is the standard production pattern for sinks
    without native transactional support; with an Iceberg/Delta catalog the
    same hook would do a MERGE keyed on batch_id. Readers get exactly-once
    by scanning ``out_dir`` (the batch_id=… layout is also partition-pruned
    on read).

    Returns the running StreamingQuery (AvailableNow trigger — drains the
    source and stops; callers ``awaitTermination()``).
    """
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (batch_df.write.mode("overwrite")
         .parquet(f"{out_dir}/batch_id={batch_id}"))

    return (result.writeStream
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def enrich_with_customer_segment(events_stream: DataFrame,
                                 customers: DataFrame) -> DataFrame:
    """Stream-static join: attach the (static) customer market segment to
    the event stream on user_id = c_custkey.

    Stream-static joins need NO watermark and keep no join state — Spark
    re-plans the static side per micro-batch, so at 100 TB the dimension
    is broadcast to each batch (hint it explicitly; dimension tables are
    broadcast-class by definition). This is the standard enrichment step
    between ingest and windowed aggregation.
    """
    dim = F.broadcast(customers.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment")))
    return events_stream.join(dim, "user_id", "left")


def enriched_segment_rollup(events_stream: DataFrame,
                            customers: DataFrame) -> DataFrame:
    """Stream-static enrich → rollup: the canonical ingest-time pipeline
    (attach the broadcast dimension, then aggregate on the enriched key).
    Per customer segment (NULL segment = events from users outside the
    customer dimension — kept visible, an enrichment-coverage signal):
    event count and the determinism-protocol value sum, so the drained
    stream is oracle-checkable against the batch LEFT JOIN + GROUP BY.

    Stateless join + complete-mode agg: the only streaming state is the
    O(segments) aggregation — watermark-free, the dimension re-broadcast
    per micro-batch (see enrich_with_customer_segment).
    """
    enriched = enrich_with_customer_segment(events_stream, customers)
    return (enriched.groupBy("segment")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast("decimal(28,6)"))
                 .cast("double").alias("total_value")))


ORACLE_STREAMING_STATIC_ENRICH = """
SELECT c.c_mktsegment AS segment, COUNT(*) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment ORDER BY segment
"""


def supports_transform_with_state() -> bool:
    """Spark 4's transformWithStateInPandas drives its state protocol over
    protobuf; without a working ``google.protobuf`` the streaming Python
    runner crashes at init (measured in this container:
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE / ImportError
    'descriptor'). It ALSO requires the RocksDB state store provider —
    under the default HDFS-backed provider the query fails at start
    (STATE_STORE_INVALID_PROVIDER), so a protobuf-equipped runtime with
    the default provider must take the applyInPandasWithState fallback,
    not crash (r9 self-review find). Capability-gate callers the same
    way the Iceberg write path gates on the runtime jar."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        return False
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        return False
    # Canonical class comparison (r10 ADVICE; subclass case r11): the
    # old 'RocksDB' substring test misclassified any custom provider
    # that merely MENTIONS RocksDB in its name. Spark's
    # transformWithState support is keyed to the built-in provider
    # class, so the exact name passes without a JVM round-trip, and a
    # user SUBCLASS of the built-in (which inherits the capability)
    # passes via a Class.forName + isAssignableFrom check on the
    # session's JVM. A per-QUERY provider override (set in the
    # writeStream options rather than the session conf) is NOT
    # detected here — documented limitation, the fallback path is
    # functionally identical.
    provider = (spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", "") or "").strip()
    return _provider_is_rocksdb(spark, provider)


#: the built-in provider transformWithState support is keyed to
_ROCKSDB_PROVIDER = ("org.apache.spark.sql.execution.streaming.state"
                     ".RocksDBStateStoreProvider")


def _provider_is_rocksdb(spark, provider: str) -> bool:
    """True iff ``provider`` is the built-in RocksDB state-store
    provider or a JVM-loadable subclass of it (a subclass inherits the
    transformWithState capability — r11, ADVICE). Exact name short-
    circuits without a JVM round-trip; anything else is resolved with
    the three-arg ``Class.forName(name, initialize=false, loader)`` +
    ``isAssignableFrom`` on the session's JVM — initialize=false so a
    mere capability CHECK never runs the provider's static initializers
    (r12, ADVICE), with Spark's context classloader so session-jar
    providers resolve. Caveat: the check runs on the DRIVER JVM, so a
    provider jar shipped executor-only resolves as unloadable and the
    conservative applyInPandasWithState fallback is taken (silent, and
    behavior stays correct — transformWithState is an optimization, not
    a semantics change); ship the jar on the driver classpath to get
    the fast path."""
    if provider == _ROCKSDB_PROVIDER:
        return True
    if not provider:
        return False
    try:
        jvm = spark.sparkContext._jvm
        loader = (jvm.org.apache.spark.util.Utils
                  .getContextOrSparkClassLoader())
        base = jvm.java.lang.Class.forName(_ROCKSDB_PROVIDER, False,
                                           loader)
        cls = jvm.java.lang.Class.forName(provider, False, loader)
        return bool(base.isAssignableFrom(cls))
    except Exception:
        return False


def user_running_stats_v2(events: DataFrame,
                          watermark: str = "10 minutes") -> DataFrame:
    """Per-user running totals on the modern Spark 4 stateful API
    (``transformWithStateInPandas`` + ValueState) when the runtime supports
    it, else the ``applyInPandasWithState`` implementation — identical
    output contract either way (the batch-equivalence pytest runs against
    whichever path the environment takes)."""
    if not supports_transform_with_state():
        return user_running_stats(events, watermark)

    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor

    class RunningStats(StatefulProcessor):
        def init(self, handle):
            self.state = handle.getValueState(
                "totals", "n long, total double")

        def handleInputRows(self, key, rows, timer_values):
            n, total = (self.state.get() if self.state.exists()
                        else (0, 0.0))
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self.state.update((n, total))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                                "total_value": [total]})

        def close(self):
            pass

    return (events
            .withWatermark("ts", watermark)
            .groupBy("user_id")
            .transformWithStateInPandas(
                RunningStats(),
                outputStructType="user_id long, n_events long, "
                                 "total_value double",
                outputMode="Update",
                timeMode="None"))


def zscore_alerts(events: DataFrame, stats: DataFrame,
                  z_cut: float = 2.5) -> DataFrame:
    """Streaming anomaly alerts via STREAM-STATIC enrichment: each arriving
    event joins the (batch-computed, broadcast) per-type mean/std and is
    emitted iff |z| > z_cut. Stateless — no watermark or store needed; this
    is the standard "yesterday's model scores today's stream" deployment,
    with the stats table refreshed by a periodic batch job
    (operators/behavior.events_value_zscore is the batch twin that also
    derives the stats).

    Append-mode emits exactly the matched rows, so a full AvailableNow
    drain equals the batch query row-for-row — which is what makes the
    DuckDB oracle fair for a streaming entry.
    """
    # a constant-valued type has std 0 and no outliers — drop it before
    # the divide (ANSI errors on x/0.0; same contract as the batch twin)
    j = events.join(F.broadcast(stats.filter(F.col("std_v") > 0)),
                    "event_type")
    z = (F.col("value") - F.col("mean_v")) / F.col("std_v")
    return (j.withColumn("z", z)
            .filter(F.abs(F.col("z")) > z_cut)
            .select("event_id", "event_type", "value", "z"))


def event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-side per-type sufficient statistics for zscore_alerts —
    identical arithmetic to operators/behavior.events_value_zscore
    (decimal sums, single division order) so stream and batch agree
    bitwise."""
    from ..operators.relational import DEC, load_events

    e = load_events(spark, sf_dir)
    v = F.col("value")
    stats = (e.groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(v.cast(DEC)).alias("s1"),
                  F.sum((v * v).cast(DEC)).alias("s2")))
    mean = F.col("s1").cast("double") / F.col("n")
    var = F.col("s2").cast("double") / F.col("n") - mean * mean
    return stats.select("event_type", mean.alias("mean_v"),
                        F.sqrt(var).alias("std_v"))


STATE_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("last_ts", TimestampType()),
    StructField("last_event_id", LongType()),
    StructField("last_type", StringType()),
    StructField("last_value", DoubleType()),
])


def upsert_latest_state(spark: SparkSession, source_stream: DataFrame,
                        target_dir: str, checkpoint_dir: str):
    """Streaming CDC materialization: ``foreachBatch`` + seq-guarded
    ``merge_into`` maintain a keyed latest-state table from the event
    stream — the ongoing-sync half of a migration cutover (initial copy
    via sources/migrate.py, then this keeps the target current).

    The guard is the point: each batch collapses to one candidate row
    per key (max_by on the total order (ts, event_id)), and the MERGE
    only overwrites when the candidate is strictly newer than what the
    target already holds. That makes the final table provably
    independent of micro-batch boundaries — an out-of-order event
    arriving in a LATER batch can never regress a key (the pytest
    proves this by replaying the feed as many single-file batches in a
    scrambled file order). Without the guard, foreachBatch upserts are
    only correct for in-order feeds — the classic streaming-CDC bug.

    Each batch rewrites the (key-cardinality-sized) state table; with an
    Iceberg/Delta catalog the same hook is a native MERGE INTO and only
    touched files rewrite. The state is localCheckpoint-ed before the
    overwrite so the read and the write of the same path never overlap.
    """
    from ..operators.cdc import merge_into

    cols = [f.name for f in STATE_SCHEMA.fields]

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # A keyed state table cannot carry a NULL key: the MERGE's key
        # equality never matches NULL, so each batch would INSERT a
        # fresh NULL row instead of upserting (r9 self-review find).
        # Corrupted NULL-key rows drop at the sink — the oracle filters
        # identically.
        batch_df = batch_df.filter(F.col("user_id").isNotNull())
        latest = (batch_df.groupBy("user_id")
                  .agg(F.max_by(F.struct("ts", "event_id", "event_type",
                                         "value"),
                                F.struct("ts", "event_id")).alias("c"))
                  .select("user_id",
                          F.col("c.ts").alias("last_ts"),
                          F.col("c.event_id").alias("last_event_id"),
                          F.col("c.event_type").alias("last_type"),
                          F.col("c.value").alias("last_value")))
        cur = spark.read.schema(STATE_SCHEMA).parquet(target_dir)
        # NULL-safe total order, NULL ts = "unknown, oldest" — mirrors
        # the oracle's ORDER BY ts DESC (DuckDB NULLS LAST) and max_by's
        # struct comparison (NULL field smallest). The naive s.ts > t.ts
        # guard is NULL-poisoned: a key whose FIRST event carried a NULL
        # ts would block every later real event forever (r9 self-review
        # find).
        s_ts, t_ts = F.col("s.last_ts"), F.col("t.last_ts")
        s_id, t_id = F.col("s.last_event_id"), F.col("t.last_event_id")
        newer = (
            F.when(s_ts.isNotNull() & t_ts.isNull(), F.lit(True))
            .when(s_ts.isNull() & t_ts.isNotNull(), F.lit(False))
            .when(s_ts.isNull() & t_ts.isNull(), s_id > t_id)
            .otherwise((s_ts > t_ts) | ((s_ts == t_ts) & (s_id > t_id))))
        merged = merge_into(
            cur, latest, key="user_id",
            when_matched_update={
                c: F.when(newer, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}"))
                for c in cols if c != "user_id"},
            when_not_matched_insert={c: F.col(f"s.{c}") for c in cols})
        merged.localCheckpoint().write.mode("overwrite").parquet(target_dir)

    return (source_stream.writeStream
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def streaming_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: drain the whole events fixture through the
    seq-guarded upsert and emit the final per-user latest state. Unlike
    most streaming entries this IS oracle-checkable: the final state is
    by construction the per-key (ts, event_id)-latest event, which SQL
    expresses as a ROW_NUMBER pick — so the driver hash-match proves the
    guard, the per-batch collapse, and the merge in one go. Values are
    carried (never recomputed), so doubles are bitwise-portable."""
    import tempfile

    target_dir = tempfile.mkdtemp(prefix="cdc_state_")
    (spark.createDataFrame([], STATE_SCHEMA)
     .write.mode("overwrite").parquet(target_dir))
    q = upsert_latest_state(
        spark, read_events_stream(spark, sf_dir), target_dir,
        tempfile.mkdtemp(prefix="ckpt_cdc_upsert_"))
    q.awaitTermination()
    q.stop()
    return (spark.read.schema(STATE_SCHEMA).parquet(target_dir)
            .select("user_id",
                    F.date_format("last_ts", "yyyy-MM-dd HH:mm:ss")
                    .alias("last_ts"),
                    "last_event_id", "last_type", "last_value")
            .orderBy("user_id"))


ORACLE_STREAMING_CDC_UPSERT = """
SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
       event_id AS last_event_id, event_type AS last_type,
       value AS last_value
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE user_id IS NOT NULL
) WHERE rn = 1
ORDER BY user_id
"""


def cusum_drift_alerts(events: DataFrame, k_slack: float = 0.25,
                       h_threshold: float = 4.0, warmup: int = 30,
                       watermark: str = "10 minutes") -> DataFrame:
    """Streaming twin of ``operators.eventtime.events_cusum_drift``:
    two-sided CUSUM drift alarms per event type, maintained across
    micro-batches in the state store via ``applyInPandasWithState``.

    The streaming formulation standardizes ONLINE (Welford running
    mean/std carried in state, each point scored against the statistics
    of everything BEFORE it, after a ``warmup`` count) — deliberately
    different from the batch entry's retrospective whole-series
    standardization, because a stream cannot see its future; the pytest
    pins the drained output against a pure-Python replay of exactly
    these online semantics. State per key is five scalars; alarms
    RESET their side, so state stays O(1) forever — runnable on an
    unbounded stream.

    Emits one row per alarm: (event_type, ordinal, side, stat) where
    ordinal is the per-key 1-based event count at the alarm.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        (n, mean, m2, sp, sm) = state.get if state.exists \
            else (0, 0.0, 0.0, 0.0, 0.0)
        out = {"event_type": [], "ordinal": [], "side": [], "stat": []}
        frames = [pdf for pdf in pdf_iter]
        pdf = (pd.concat(frames).sort_values(["ts", "event_id"])
               if frames else None)
        if pdf is not None:
            for x in pdf["value"].astype(float):
                # NULL value arrives as NaN (sanitize_events maps
                # non-finite to NULL; aggregates skip NULL). Without the
                # skip a single NaN poisons the Welford mean/m2 forever
                # and SILENTLY disables drift detection for the key —
                # worse than the crash class (r9 self-review find; same
                # contract as the P² updater below).
                if x != x:
                    continue
                if n >= warmup and m2 > 0:
                    std = (m2 / n) ** 0.5
                    z = (x - mean) / std
                    sp = max(0.0, sp + z - k_slack)
                    sm = max(0.0, sm - z - k_slack)
                    if sp > h_threshold:
                        out["event_type"].append(key[0])
                        out["ordinal"].append(n + 1)
                        out["side"].append("high")
                        out["stat"].append(sp)
                        sp = 0.0
                    if sm > h_threshold:
                        out["event_type"].append(key[0])
                        out["ordinal"].append(n + 1)
                        out["side"].append("low")
                        out["stat"].append(sm)
                        sm = 0.0
                n += 1
                d = x - mean
                mean += d / n
                m2 += d * (x - mean)
        state.update((n, mean, m2, sp, sm))
        yield pd.DataFrame(out)

    return (events
            .withWatermark("ts", watermark)
            .groupBy("event_type")
            .applyInPandasWithState(
                update,
                outputStructType="event_type string, ordinal long, "
                                 "side string, stat double",
                stateStructType="n long, mean double, m2 double, "
                                "sp double, sm double",
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def heavy_hitter_users(events: DataFrame, k: int = 8,
                       watermark: str = "10 minutes") -> DataFrame:
    """Streaming Misra-Gries heavy hitters: per event type, the ≤ k users
    dominating the stream, maintained across micro-batches in the state
    store — the streaming twin of the batch sketch entry
    (``operators.approx.token_counts_mg`` family). A 100 TB event firehose
    cannot keep exact per-user counts per type; MG state is ≤ k (user,
    counter) pairs per key FOREVER, while guaranteeing every user with
    true frequency > n/(k+1) survives and every kept counter
    undercounts by at most the total decrement debt.

    Per-batch rows are processed in (ts, event_id) order (same
    determinism pin as ``cusum_drift_alerts``), so the drained snapshot
    is replay-stable. Each micro-batch emits the refreshed counter set
    for the keys it touched (update mode) stamped with a per-key
    snapshot ordinal ``snap``; the memory sink APPENDS every emission,
    so a multi-batch drain leaves earlier (possibly since-evicted)
    counter sets in the table — consumers must keep only the rows with
    the max ``snap`` per key (the registry entry does exactly that).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        if state.exists:
            ids, cnts, snap = state.get
            counters = dict(zip(ids, cnts))
        else:
            counters, snap = {}, 0
        frames = [pdf for pdf in pdf_iter]
        if frames:
            pdf = pd.concat(frames).sort_values(["ts", "event_id"])
            # NULL user_id arrives as NaN (Arrow → float64 column) and
            # .astype(int) would ABORT the whole stream; an unknown user
            # cannot be counted, so corrupted rows drop here (r9
            # self-review find)
            for u in pdf["user_id"].dropna().astype(int):
                if u in counters:
                    counters[u] += 1
                elif len(counters) < k:
                    counters[u] = 1
                else:           # decrement-all: the MG admission charge
                    counters = {a: c - 1 for a, c in counters.items()
                                if c > 1}
        ids = list(counters)
        snap += 1
        state.update((ids, [counters[i] for i in ids], snap))
        yield pd.DataFrame({"event_type": [key[0]] * len(ids),
                            "user_id": ids,
                            "mg_count": [counters[i] for i in ids],
                            "snap": [snap] * len(ids)})

    return (events
            .withWatermark("ts", watermark)
            .groupBy("event_type")
            .applyInPandasWithState(
                update,
                outputStructType="event_type string, user_id long, "
                                 "mg_count long, snap long",
                stateStructType="ids array<long>, cnts array<long>, "
                                "snap long",
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


def p2_quantile_estimates(events: DataFrame, q: float = 0.5,
                          watermark: str = "10 minutes") -> DataFrame:
    """Streaming quantile per event type via the P² algorithm (Jain &
    Chlamtac 1985): five markers track (min, q/2, q, (1+q)/2, max) with
    parabolic interpolation — O(1) state per key FOREVER, the shape an
    unbounded stream needs where exact percentiles would hoard every
    observation and a GK sketch would grow with log(n)/ε. This is the
    streaming twin of the batch rank-rule percentile entries: those are
    exact and replayable, this is the constant-memory online estimate
    you alarm on between checkpoints.

    Processing order within a batch is the canonical (ts, event_id)
    sort — the same contract as every stateful op here, which makes the
    marker trajectory deterministic and lets the pytest replay the
    EXACT final state in pure Python (estimator output is
    floating-recurrence → rows-only; accuracy vs the exact median is
    pinned separately with a tolerance). Emits one snapshot row per key
    per batch; readers keep the max-n row per key (the
    streaming_user_stats snapshot-dedup contract).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    d = [0.0, q / 2, q, (1 + q) / 2, 1.0]

    def update(key, pdf_iter, state: GroupState):
        if state.exists:
            (n, h1, h2, h3, h4, h5, p1, p2, p3, p4, p5) = state.get
            hs = [h1, h2, h3, h4, h5]
            ps = [p1, p2, p3, p4, p5]
            # a key saved mid-warm-up (n < 5) stores its buffered values
            # in the h1..hn slots — rebuild the buffer or the n==5
            # transition would sort fewer than five markers and the next
            # observation would index past hs[4] (multi-batch contract)
            buf = hs[:n] if n < 5 else []
        else:
            n, hs, ps, buf = 0, [], [], []
        frames = [pdf for pdf in pdf_iter]
        pdf = (pd.concat(frames).sort_values(["ts", "event_id"])
               if frames else None)
        if pdf is not None:
            for x in pdf["value"].astype(float):
                # NULL value arrives as NaN here (sanitize_events maps
                # non-finite/absurd to NULL; aggregates skip NULL — same
                # contract). Without this, NaN falls through every marker
                # comparison and the cell-locator next() StopIterations —
                # the r9 probe caught it once the directory-layout fix
                # let streams actually SEE corrupted fixtures.
                if x != x:
                    continue
                if n < 5:
                    buf.append(x)
                    n += 1
                    if n == 5:
                        hs = sorted(buf)
                        ps = [1, 2, 3, 4, 5]
                    continue
                # locate cell k: h[k] <= x < h[k+1]
                if x < hs[0]:
                    hs[0] = x
                    k = 0
                elif x >= hs[4]:
                    hs[4] = x
                    k = 3
                else:
                    k = next(i for i in range(4)
                             if hs[i] <= x < hs[i + 1])
                for i in range(k + 1, 5):
                    ps[i] += 1
                n += 1
                want = [1 + (n - 1) * di for di in d]
                for i in (1, 2, 3):
                    delta = want[i] - ps[i]
                    if ((delta >= 1 and ps[i + 1] - ps[i] > 1)
                            or (delta <= -1 and ps[i - 1] - ps[i] < -1)):
                        s = 1 if delta >= 1 else -1
                        # parabolic (P²) candidate
                        hp = hs[i] + s / (ps[i + 1] - ps[i - 1]) * (
                            (ps[i] - ps[i - 1] + s)
                            * (hs[i + 1] - hs[i])
                            / (ps[i + 1] - ps[i])
                            + (ps[i + 1] - ps[i] - s)
                            * (hs[i] - hs[i - 1])
                            / (ps[i] - ps[i - 1]))
                        if hs[i - 1] < hp < hs[i + 1]:
                            hs[i] = hp
                        else:        # linear fallback
                            hs[i] = hs[i] + s * (
                                hs[i + s] - hs[i]) / (ps[i + s] - ps[i])
                        ps[i] += s
        if n >= 5:
            est = hs[2]
            state.update((n, *hs, *ps))
        else:
            est = sorted(buf)[len(buf) // 2] if buf else 0.0
            state.update((n, *(buf + [0.0] * (5 - len(buf))),
                          1, 2, 3, 4, 5))
        yield pd.DataFrame({"event_type": [key[0]], "n_seen": [n],
                            "q_estimate": [est]})

    return (events
            .withWatermark("ts", watermark)
            .groupBy("event_type")
            .applyInPandasWithState(
                update,
                outputStructType="event_type string, n_seen long, "
                                 "q_estimate double",
                stateStructType="n long, h1 double, h2 double, h3 double,"
                                " h4 double, h5 double, p1 long, p2 long,"
                                " p3 long, p4 long, p5 long",
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
