"""Streaming/batch equivalence: every streaming query drained with
Trigger.AvailableNow must produce exactly what the equivalent batch
aggregation produces over the same files — Spark's replayability guarantee,
and the reason the DuckDB batch oracle covers the streaming path too."""

import pytest
from pyspark.sql import functions as F

from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.streaming import events as ev


@pytest.fixture()
def batch_events(spark, sf_dir):
    from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.relational import (
        load_events,
    )

    return load_events(spark, sf_dir)


def _drain(spark, stream_df, name, tmp_path, mode="complete"):
    q = ev.run_available_now(stream_df, name, str(tmp_path / name), mode=mode)
    try:
        return spark.table(name).collect()
    finally:
        q.stop()


def test_hourly_rollup_matches_batch(spark, sf_dir, batch_events, tmp_path):
    stream = ev.hourly_rollup(ev.read_events_stream(spark, sf_dir))
    got = {(r.hour_start, r.event_type): (r.n_events, r.total_value)
           for r in _drain(spark, stream, "t_hourly", tmp_path)}
    exp = {(r.hour_start, r.event_type): (r.n_events, r.total_value)
           for r in (batch_events
                     .groupBy(F.date_trunc("hour", "ts").alias("hour_start"),
                              "event_type")
                     .agg(F.count(F.lit(1)).alias("n_events"),
                          F.sum("value").alias("total_value"))).collect()}
    assert got.keys() == exp.keys()
    for k, (n, total) in exp.items():
        assert got[k][0] == n
        assert got[k][1] == pytest.approx(total, rel=1e-12)


def test_sliding_rollup_matches_batch(spark, sf_dir, batch_events, tmp_path):
    stream = ev.sliding_rollup(ev.read_events_stream(spark, sf_dir))
    got = {(r.window_start, r.window_end): r.n_events
           for r in _drain(spark, stream, "t_sliding", tmp_path)}
    exp = {(r.w.start, r.w.end): r.n_events
           for r in (batch_events
                     .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
                     .agg(F.count(F.lit(1)).alias("n_events"))).collect()}
    assert got == exp
    # each event lands in exactly 4 sliding windows
    assert sum(got.values()) == 4 * batch_events.count()


def test_session_windows_match_batch_sessionization(spark, sf_dir,
                                                    batch_events, tmp_path):
    """session_window(30 min) must find the same (user, session) partition
    as the batch lag/cumsum approach: same session count and sizes."""
    stream = ev.session_windows(ev.read_events_stream(spark, sf_dir))
    rows = _drain(spark, stream, "t_sessions", tmp_path)
    got = {}
    for r in rows:
        got.setdefault(r.user_id, []).append(r.n_events)
    from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.relational import (
        events_sessionize,
    )
    exp = {r.user_id: (r.n_sessions, r.n_events)
           for r in events_sessionize(spark, sf_dir).collect()}
    assert set(got) == set(exp)
    for uid, sizes in got.items():
        assert len(sizes) == exp[uid][0], f"session count for user {uid}"
        assert sum(sizes) == exp[uid][1], f"event count for user {uid}"


def test_stream_stream_join_matches_batch(spark, sf_dir, batch_events,
                                          tmp_path):
    """Watermarked interval join drained with AvailableNow == the same
    join run as a plain batch query (append mode: inner joins emit only
    finalized matches, which AvailableNow finalizes fully)."""
    stream = ev.purchase_click_interval_join(
        ev.read_events_stream(spark, sf_dir))
    got = {(r.purchase_id, r.click_id)
           for r in _drain(spark, stream, "t_ssj", tmp_path, mode="append")}
    p = batch_events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts"))
    c = batch_events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts"))
    exp = {(r.purchase_id, r.click_id) for r in p.join(
        c, (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 minutes"))
    ).collect()}
    assert got == exp
    assert exp, "fixture must produce at least one purchase-click match"


def test_stream_stream_left_outer_join_semantics(spark, sf_dir,
                                                 batch_events, tmp_path):
    """LEFT OUTER interval join drained with AvailableNow: (1) the
    matched rows are EXACTLY the batch inner join; (2) every null-padded
    row is a genuinely unmatched purchase (batch anti join); (3) every
    unmatched purchase older than the final-watermark horizon
    (max event time - watermark - lookback) IS emitted — only the tail
    still inside the horizon may legitimately stay in state."""
    import datetime

    stream = ev.purchase_click_left_join(ev.read_events_stream(spark, sf_dir))
    rows = _drain(spark, stream, "t_lsj", tmp_path, mode="append")
    got_matched = {(r.purchase_id, r.click_id)
                   for r in rows if r.click_id is not None}
    got_unmatched = {r.purchase_id for r in rows if r.click_id is None}

    p = batch_events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts"))
    c = batch_events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts"))
    cond = ((F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") <= F.col("p_ts"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 minutes")))
    exp_matched = {(r.purchase_id, r.click_id)
                   for r in p.join(c, cond).collect()}
    exp_unmatched = {r.purchase_id
                     for r in p.join(c, cond, "left_anti").collect()}

    assert got_matched == exp_matched
    assert got_unmatched <= exp_unmatched
    # completeness past the final-watermark horizon: the global watermark
    # is the MIN across both sides' per-source watermarks (each side's
    # max observed ts - delay), and left state is only evictable once the
    # watermark clears p_ts + the interval bound
    max_p = p.agg(F.max("p_ts")).collect()[0][0]
    max_c = c.agg(F.max("c_ts")).collect()[0][0]
    horizon = min(max_p, max_c) - datetime.timedelta(minutes=10 + 30 + 1)
    must_emit = {r.purchase_id
                 for r in p.join(c, cond, "left_anti")
                 .filter(F.col("p_ts") < F.lit(horizon)).collect()}
    assert must_emit <= got_unmatched
    assert got_unmatched, "fixture must contain unmatched purchases"


def test_streaming_dedup_matches_batch_distinct(spark, sf_dir, batch_events,
                                                tmp_path):
    """dropDuplicatesWithinWatermark over a stream that unions the source
    with itself (simulated at-least-once replay: every event arrives twice
    in the same micro-batch) must collapse back to the batch distinct-key
    count."""
    src = ev.read_events_stream(spark, sf_dir)
    doubled = src.union(ev.read_events_stream(spark, sf_dir))
    stream = ev.dedup_stream(doubled)
    rows = _drain(spark, stream, "t_dedup", tmp_path, mode="append")
    ids = [r.event_id for r in rows]
    assert len(ids) == len(set(ids)), "no duplicate event_id may survive"
    assert len(ids) == batch_events.select("event_id").distinct().count()


def test_stateful_user_stats_match_batch(spark, sf_dir, batch_events,
                                         tmp_path):
    """applyInPandasWithState totals after draining all micro-batches must
    equal the batch per-user aggregate (counts exact, sums to float
    tolerance since accumulation order differs)."""
    stream = ev.user_running_stats(
        ev.read_events_stream(spark, sf_dir, max_files_per_trigger=1))
    rows = _drain(spark, stream, "t_userstats", tmp_path, mode="update")
    # update mode: keep the latest emission per user
    got = {}
    for r in rows:
        got[r.user_id] = (r.n_events, r.total_value)
    exp = {r.user_id: (r.n, r.total)
           for r in (batch_events.groupBy("user_id")
                     .agg(F.count(F.lit(1)).alias("n"),
                          F.sum("value").alias("total"))).collect()}
    assert set(got) == set(exp)
    for uid, (n, total) in exp.items():
        assert got[uid][0] == n, f"event count for user {uid}"
        assert got[uid][1] == pytest.approx(total, rel=1e-9)


def test_incremental_trigger_same_totals(spark, sf_dir, tmp_path):
    """maxFilesPerTrigger path: incremental batches, same final answer."""
    stream = ev.hourly_rollup(
        ev.read_events_stream(spark, sf_dir, max_files_per_trigger=1))
    rows = _drain(spark, stream, "t_incr", tmp_path)
    total = sum(r.n_events for r in rows)
    from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.relational import (
        load_events,
    )

    assert total == load_events(spark, sf_dir).count()


def test_foreach_batch_sink_is_idempotent(spark, sf_dir, tmp_path):
    """The foreachBatch sink must (a) land every source row exactly once
    across batch_id partitions, and (b) overwrite — not duplicate — when
    the same batch id is written twice (the crash-replay case)."""
    out = str(tmp_path / "fb_out")
    ckpt = str(tmp_path / "fb_ckpt")
    src = ev.read_events_stream(spark, sf_dir).select("event_id", "user_id")
    q = ev.write_foreach_batch_idempotent(src, out, ckpt)
    q.awaitTermination()
    q.stop()

    written = spark.read.parquet(out)
    n_src = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert written.count() == n_src
    assert written.select("event_id").distinct().count() == n_src

    # replay batch 0 by hand: same batch_id → overwrite, still exactly once
    # (localCheckpoint materializes the rows so the overwrite doesn't
    # delete its own input files mid-read)
    batch0 = spark.read.parquet(f"{out}/batch_id=0").localCheckpoint()
    batch0.write.mode("overwrite").parquet(f"{out}/batch_id=0")
    assert spark.read.parquet(out).count() == n_src


def test_stream_static_enrichment_matches_batch(spark, sf_dir, batch_events,
                                                tmp_path):
    customers = spark.read.parquet(f"{sf_dir}/customer.parquet")
    stream = ev.enrich_with_customer_segment(
        ev.read_events_stream(spark, sf_dir), customers)
    agg = (stream.groupBy("segment")
           .agg(F.count(F.lit(1)).alias("n_events")))
    got = {r.segment: r.n_events
           for r in _drain(spark, agg, "t_enrich", tmp_path)}
    exp = {r.segment: r.n_events
           for r in (ev.enrich_with_customer_segment(batch_events, customers)
                     .groupBy("segment")
                     .agg(F.count(F.lit(1)).alias("n_events"))).collect()}
    assert got == exp and sum(got.values()) == batch_events.count()


def test_stateful_v2_capability_gate_and_equivalence(spark, sf_dir,
                                                     batch_events, tmp_path):
    """user_running_stats_v2 must produce batch-equivalent totals on
    whichever stateful API the runtime supports (transformWithStateInPandas
    needs protobuf; this container lacks it, so the gate routes to
    applyInPandasWithState — the test is path-agnostic by design)."""
    stream = ev.user_running_stats_v2(
        ev.read_events_stream(spark, sf_dir))
    rows = _drain(spark, stream, "t_ustats_v2", tmp_path, mode="update")
    got = {}
    for r in rows:
        if r.n_events >= got.get(r.user_id, (0,))[0]:
            got[r.user_id] = (r.n_events,)
    exp = {r.user_id: r.n for r in
           (batch_events.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"))).collect()}
    assert set(got) == set(exp)
    for uid, n in exp.items():
        assert got[uid][0] == n


class TestZscoreAlerts:
    def test_stream_equals_batch(self, spark, sf_dir):
        """Stream-static anomaly alerts drained AvailableNow must equal
        the batch z-score query row-for-row (stateless append join)."""
        import tempfile
        import uuid

        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            behavior,
        )
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.streaming import (
            events as ev,
        )

        stats = ev.event_type_stats(spark, sf_dir)
        name = f"s_zal_{uuid.uuid4().hex[:8]}"
        q = (ev.zscore_alerts(ev.read_events_stream(spark, sf_dir), stats)
             .writeStream.format("memory").queryName(name)
             .outputMode("append")
             .option("checkpointLocation",
                     tempfile.mkdtemp(prefix=f"ckpt_{name}_"))
             .trigger(availableNow=True).start())
        q.awaitTermination()
        q.stop()
        streamed = sorted(
            (r.event_id, r.z) for r in spark.table(name).collect())
        batch = sorted(
            (r.event_id, r.z)
            for r in behavior.events_value_zscore(spark, sf_dir).collect())
        assert streamed == batch


class TestCdcUpsertStream:
    def test_final_state_independent_of_batch_boundaries(self, spark,
                                                         sf_dir, tmp_path):
        """The seq guard's whole claim: replay the feed as MANY
        single-file micro-batches in a SCRAMBLED file order and the final
        state must equal the one-batch drain (and the batch ROW_NUMBER
        pick). Without the guard, a key whose latest event lands in an
        early batch would be regressed by later out-of-order batches."""
        import tempfile

        from pyspark.sql import functions as F

        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.streaming import (
            events as ev,
        )

        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.relational import (
            load_events,
        )

        # scramble: split events into 8 files keyed by a hash (files are
        # NOT time-ordered, so per-key event order across batches is
        # arbitrary), then stream one file per micro-batch (plain
        # readStream here — read_events_stream's pathGlobFilter targets
        # the fixture layout, and the unit under test is the upsert)
        src_dir = str(tmp_path / "scrambled")
        normalized = load_events(spark, sf_dir)
        (normalized.repartition(8, F.col("event_id") % 8)
         .write.mode("overwrite").parquet(src_dir))

        target_dir = str(tmp_path / "state")
        (spark.createDataFrame([], ev.STATE_SCHEMA)
         .write.mode("overwrite").parquet(target_dir))
        stream = (spark.readStream
                  .schema(spark.read.parquet(src_dir).schema)
                  .option("maxFilesPerTrigger", 1)
                  .parquet(src_dir))
        q = ev.upsert_latest_state(
            spark, stream, target_dir,
            tempfile.mkdtemp(prefix="ckpt_cdc_scrambled_"))
        q.awaitTermination()
        q.stop()

        got = sorted(
            tuple(r) for r in spark.read.schema(ev.STATE_SCHEMA)
            .parquet(target_dir).collect())

        from pyspark.sql import Window
        w = Window.partitionBy("user_id").orderBy(F.desc("ts"),
                                                  F.desc("event_id"))
        want = sorted(
            tuple(r) for r in
            spark.read.parquet(src_dir)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", F.col("ts").alias("last_ts"),
                    F.col("event_id").alias("last_event_id"),
                    F.col("event_type").alias("last_type"),
                    F.col("value").alias("last_value"))
            .collect())
        assert got == want
        assert len(got) > 0


class TestStreamingCusum:
    def test_alerts_match_online_python_replay(self, spark, sf_dir,
                                               tmp_path):
        """The drained CUSUM alarms must equal a pure-Python replay of
        the SAME online semantics (Welford pre-update standardization
        after a 30-event warmup, alarm resets its side) over the events
        in (ts, event_id) order. Drains the RAW stream (the registry
        entry became a partial-oracle census in r9; this test keeps the
        exact alarm values pinned)."""
        import duckdb

        raw = _drain(spark, ev.cusum_drift_alerts(
            ev.read_events_stream(spark, sf_dir)), "t_cusum_raw",
            tmp_path, mode="append")
        got = sorted((r.event_type, r.ordinal, r.side, round(r.stat, 9))
                     for r in raw)

        series: dict = {}
        for et, v in duckdb.sql(
                f"SELECT event_type, value FROM '{sf_dir}/events.parquet' "
                f"ORDER BY ts, event_id").fetchall():
            series.setdefault(et, []).append(float(v))

        k, h, warmup = 0.25, 4.0, 30
        want = []
        for et in sorted(series):
            n, mean, m2, sp, sm = 0, 0.0, 0.0, 0.0, 0.0
            for x in series[et]:
                if n >= warmup and m2 > 0:
                    std = (m2 / n) ** 0.5
                    z = (x - mean) / std
                    sp = max(0.0, sp + z - k)
                    sm = max(0.0, sm - z - k)
                    if sp > h:
                        want.append((et, n + 1, "high", round(sp, 9)))
                        sp = 0.0
                    if sm > h:
                        want.append((et, n + 1, "low", round(sm, 9)))
                        sm = 0.0
                n += 1
                d = x - mean
                mean += d / n
                m2 += d * (x - mean)
        want.sort()
        assert got == want


class TestStreamingHeavyHitters:
    def test_sketch_matches_python_mg_replay(self, spark, sf_dir,
                                             tmp_path):
        """The drained Misra-Gries snapshot must equal a pure-Python MG
        replay (k=8, decrement-all admission) over the events in
        (ts, event_id) order, and honor the n/(k+1) survival guarantee
        plus the undercount bound vs exact counts. Drains the RAW stream
        (the registry entry became a partial-oracle invariant census in
        r9; this test keeps the exact counter values pinned)."""
        import duckdb

        raw = _drain(spark, ev.heavy_hitter_users(
            ev.read_events_stream(spark, sf_dir), k=8), "t_mg_raw",
            tmp_path, mode="update")
        last_snap: dict = {}
        for r in raw:
            last_snap[r.event_type] = max(last_snap.get(r.event_type, 0),
                                          r.snap)
        got = {}
        for r in raw:
            if r.snap == last_snap[r.event_type]:
                got.setdefault(r.event_type, {})[r.user_id] = r.mg_count

        series: dict = {}
        for et, u in duckdb.sql(
                f"SELECT event_type, user_id FROM '{sf_dir}/events.parquet' "
                f"ORDER BY ts, event_id").fetchall():
            series.setdefault(et, []).append(int(u))

        k = 8
        for et, users in series.items():
            counters: dict = {}
            exact: dict = {}
            for u in users:
                exact[u] = exact.get(u, 0) + 1
                if u in counters:
                    counters[u] += 1
                elif len(counters) < k:
                    counters[u] = 1
                else:
                    counters = {a: c - 1 for a, c in counters.items()
                                if c > 1}
            assert got.get(et, {}) == counters
            n = len(users)
            for u, c in exact.items():
                # MG guarantee: frequency > n/(k+1) must survive
                if c > n / (k + 1):
                    assert u in counters
            for u, c in counters.items():
                # kept counters never overcount, undercount <= n/(k+1)
                assert c <= exact[u]
                assert exact[u] - c <= n / (k + 1)


def test_enriched_segment_rollup_drain_equals_batch(spark, sf_dir, tmp_path):
    """The registry's streaming_static_enrich drain must equal the batch
    LEFT JOIN + GROUP BY bit-for-bit (decimal-protocol sums), including
    the NULL-segment row for users outside the customer dimension."""
    import tempfile

    from pyspark.sql import functions as F

    from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.relational import ld
    from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.streaming import events as ev

    stream = ev.enriched_segment_rollup(
        ev.read_events_stream(spark, sf_dir), ld(spark, sf_dir, "customer"))
    q = ev.run_available_now(stream, "t_seg_rollup",
                             tempfile.mkdtemp(prefix="ckpt_segroll_"),
                             mode="complete")
    q.stop()
    got = {r.segment: (r.n_events, r.total_value)
           for r in spark.table("t_seg_rollup").collect()}
    batch = ev.enrich_with_customer_segment(
        spark.read.parquet(f"{sf_dir}/events.parquet"),
        ld(spark, sf_dir, "customer"))
    ref = {r.segment: (r.n_events, r.total_value) for r in
           batch.groupBy("segment")
           .agg(F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(28,6)"))
                .cast("double").alias("total_value")).collect()}
    assert got == ref and len(got) >= 1
