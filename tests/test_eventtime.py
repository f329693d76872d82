"""Property tests for the late round-3 batteries: event-time #2
(OHLC/TWAP/islands/7-day actives/EMA/session attribution), pointer-
doubling hierarchy, bigram + BPE LM counts, PII redaction, substring-span
dedup, SCD2-from-events, incremental view maintenance, the partitioned /
dynamic-overwrite / compaction sinks, schema evolution, z-order, running
distinct, and the Misra-Gries sketch. Value exactness is the oracle's job
for the oracle-backed entries; these pin semantic invariants that survive
fixture regeneration, on crafted inputs where the invariant needs a known
answer."""

import pytest
from pyspark.sql import functions as F

from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
    corpus,
    eventtime,
    graph,
    textstats,
)


def _events_df(spark, rows):
    """rows: (user_id, ts_s, event_id, event_type, value)"""
    return (spark.createDataFrame(
        rows, "user_id long, ts_s string, event_id long, "
              "event_type string, value double")
        .select("user_id", F.col("ts_s").cast("timestamp").alias("ts"),
                "event_id", "event_type", "value",
                F.lit("{}").alias("props")))


def _patched(monkeypatch, df):
    monkeypatch.setattr(eventtime, "load_events",
                        lambda spark, sf_dir: df)


class TestOHLC:
    def test_open_close_order(self, spark, monkeypatch):
        df = _events_df(spark, [
            (1, "2024-01-01 10:05:00", 1, "trade", 10.0),
            (1, "2024-01-01 10:10:00", 2, "trade", 30.0),
            (1, "2024-01-01 10:20:00", 3, "trade", 5.0),
            (1, "2024-01-01 10:40:00", 4, "trade", 20.0),
            (1, "2024-01-01 11:15:00", 5, "trade", 7.0),
        ])
        _patched(monkeypatch, df)
        rows = eventtime.events_ohlc_bars(spark, "ignored").collect()
        assert len(rows) == 2
        h10 = rows[0]
        assert h10.open_v == 10.0 and h10.close_v == 20.0
        assert h10.high_v == 30.0 and h10.low_v == 5.0
        assert h10.n_events == 4 and h10.volume == pytest.approx(65.0)
        assert rows[1].open_v == rows[1].close_v == 7.0

    def test_fixture_invariants(self, spark, sf_dir):
        out = eventtime.events_ohlc_bars(spark, sf_dir)
        bad = out.filter((F.col("high_v") < F.col("low_v"))
                         | (F.col("open_v") > F.col("high_v"))
                         | (F.col("close_v") < F.col("low_v"))).count()
        assert bad == 0


class TestTWAP:
    def test_known_weights(self, spark, monkeypatch):
        # 10 held 10s, then 20 held 20s, last obs carries no interval
        df = _events_df(spark, [
            (1, "2024-01-01 10:00:00", 1, "trade", 10.0),
            (1, "2024-01-01 10:00:10", 2, "trade", 20.0),
            (1, "2024-01-01 10:00:30", 3, "trade", 99.0),
        ])
        _patched(monkeypatch, df)
        row = eventtime.events_twap(spark, "ignored").first()
        assert row.n_spans == 2
        assert row.total_dur_us == 30_000_000
        assert row.twap == pytest.approx((10 * 10 + 20 * 20) / 30)

    def test_twap_within_value_range(self, spark, sf_dir):
        out = eventtime.events_twap(spark, sf_dir).collect()
        assert len(out) > 0
        for r in out:
            assert r.total_dur_us > 0 and r.twap > 0


class TestIntervalIslands:
    def test_merge_and_split(self, spark, monkeypatch):
        df = _events_df(spark, [
            # island 1: events 5 min apart (10-min hold overlaps)
            (1, "2024-01-01 10:00:00", 1, "a", 1.0),
            (1, "2024-01-01 10:05:00", 2, "a", 1.0),
            # island 2: 30 min later (> hold)
            (1, "2024-01-01 10:45:00", 3, "a", 1.0),
            # other user: own numbering
            (2, "2024-01-01 10:00:00", 4, "a", 1.0),
        ])
        _patched(monkeypatch, df)
        rows = eventtime.events_interval_islands(spark, "ignored").collect()
        u1 = [r for r in rows if r.user_id == 1]
        assert [r.island for r in u1] == [1, 2]
        assert u1[0].n_events == 2
        assert u1[0].covered_from == "2024-01-01 10:00:00"
        assert u1[0].covered_to == "2024-01-01 10:15:00"
        assert [r.island for r in rows if r.user_id == 2] == [1]

    def test_islands_cover_all_events(self, spark, sf_dir):
        out = eventtime.events_interval_islands(spark, sf_dir)
        total = out.agg(F.sum("n_events")).first()[0]
        n_events = eventtime.load_events(spark, sf_dir).count()
        assert total == n_events


class TestActiveUsers7d:
    def test_window_contribution(self, spark, monkeypatch):
        df = _events_df(spark, [
            (1, "2024-01-01 10:00:00", 1, "a", 1.0),
            (2, "2024-01-03 10:00:00", 2, "a", 1.0),
            (1, "2024-01-20 10:00:00", 3, "a", 1.0),
        ])
        _patched(monkeypatch, df)
        rows = {r.win_end: r.n_active_7d
                for r in eventtime.events_active_users_7d(spark, "ignored")
                .collect()}
        # days present: 01-01, 01-03, 01-20
        assert rows["2024-01-01"] == 1          # only user 1 active
        assert rows["2024-01-03"] == 2          # both within 7 days
        assert rows["2024-01-20"] == 1          # old activity aged out
        assert set(rows) == {"2024-01-01", "2024-01-03", "2024-01-20"}


class TestHierarchy:
    def test_matches_python_walk(self, spark, sf_dir):
        out = {r.c_custkey: (r.root, r.depth)
               for r in graph.graph_hierarchy_depths(spark, sf_dir)
               .collect()}

        def walk(c):
            d = 0
            while c > 0:
                c //= 2
                d += 1
            return d

        n_customers = graph.ld(spark, sf_dir, "customer",
                               fanout=False).count()
        assert len(out) == n_customers  # no node silently dropped
        assert all(root == 0 for root, _ in out.values())
        for ck in list(out):
            assert out[ck][1] == walk(ck), ck

    def test_one_based_forest_phantom_root(self, spark):
        """Keys 1..20 with parent = k div 2: node 1's parent 0 has no row
        of its own. The left-join composition must terminate each walk at
        the phantom root instead of dropping layers (an inner join
        returns an empty frame here)."""
        parents = spark.createDataFrame(
            [(k, k // 2) for k in range(1, 21)], "node long, parent long")
        out = {r.node: (r.root, r.depth)
               for r in graph.transitive_roots(parents).collect()}
        assert len(out) == 20
        assert all(root == 0 for root, _ in out.values())
        assert out[1] == (0, 1)
        assert out[20] == (0, 5)   # 20→10→5→2→1→0

    def test_pointer_doubling_deep_chain(self, spark):
        # a pure path 0←1←2←…←40: depth 40 needs the doubling (6 rounds
        # reach 64); a naive 6-join walk would stop at depth 6
        parents = spark.createDataFrame(
            [(i, max(i - 1, 0)) for i in range(41)], "node long, parent long")
        roots = {r.node: (r.root, r.depth)
                 for r in graph.transitive_roots(parents).collect()}
        assert roots[40] == (0, 40)
        assert roots[0] == (0, 0)
        assert len(roots) == 41


class TestBigrams:
    def test_counts_on_crafted_docs(self, spark, monkeypatch):
        df = spark.createDataFrame(
            [(1, "a b a b"), (2, "a b c")], "doc_id long, text string")
        monkeypatch.setattr(corpus, "ld",
                            lambda spark, sf_dir, name, **kw: df)
        rows = corpus.corpus_bigram_counts(spark, "ignored",
                                           min_count=1).collect()
        counts = {r.bigram: r.n for r in rows}
        assert counts == {"a b": 3, "b a": 1, "b c": 1}
        # ordering: count desc, then bigram asc
        assert [r.bigram for r in rows] == ["a b", "b a", "b c"]


class TestPIIRedact:
    def test_redaction_complete(self, spark, sf_dir):
        out = textstats.text_pii_redact(spark, sf_dir)
        leaked = out.filter(F.col("redacted").contains("@")
                            | F.col("redacted").rlike("555-[0-9]{4}")).count()
        assert leaked == 0
        stats = out.agg(F.min("n_emails"), F.max("n_emails"),
                        F.min("n_phones"), F.max("n_phones")).first()
        assert tuple(stats) == (1, 1, 1, 1)
        assert out.filter(~F.col("redacted").contains("[EMAIL]")).count() == 0


class TestPartitionedSink:
    def test_prune_reaches_scan(self, spark, sf_dir, tmp_path):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.sources.registry import (
            write_table,
        )

        e = eventtime.load_events(spark, sf_dir) \
            .withColumn("day", F.to_date("ts"))
        path = str(tmp_path / "events_part")
        write_table(e, path, partition_by=["day"])
        back = spark.read.parquet(path) \
            .filter(F.col("day") == "2024-01-02")
        plan = back._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        # the day predicate must be a partition filter, not a data filter
        assert "PushedFilters: []" in plan

    def test_result_shape(self, spark, sf_dir):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.sources.registry import (
            sink_partitioned_prune,
        )

        rows = sink_partitioned_prune(spark, sf_dir).collect()
        assert len(rows) > 0
        assert all(r.n_events > 0 for r in rows)


class TestSubstringSpans:
    def test_crafted_shared_span(self, spark, monkeypatch):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            dedup,
        )

        shared = "one two three four five six seven eight"
        docs = [(1, shared + " tail1 x y"),
                (2, "head2 " + shared),
                (3, "totally different words here with no overlap at all")]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        monkeypatch.setattr(dedup, "ld",
                            lambda spark, sf_dir, name, **kw: df)
        rows = {r.doc_id: r for r in
                dedup.dedup_substring_spans(spark, "ignored").collect()}
        # doc 3 shares nothing → absent; docs 1/2 share exactly the one
        # 8-gram (their other spans are offset by the unique affixes)
        assert set(rows) == {1, 2}
        assert rows[1].n_dup_spans == 1 and rows[2].n_dup_spans == 1
        assert rows[1].n_spans == 4   # 11 tokens → 4 spans
        assert rows[1].dup_fraction == pytest.approx(1 / 4)

    def test_short_doc_no_descending_sequence(self, spark, monkeypatch):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            dedup,
        )

        df = spark.createDataFrame(
            [(1, "too short"), (2, "also quite short indeed")],
            "doc_id long, text string")
        monkeypatch.setattr(dedup, "ld",
                            lambda spark, sf_dir, name, **kw: df)
        assert dedup.dedup_substring_spans(spark, "ignored").count() == 0


class TestSCD2FromEvents:
    def test_compress_and_intervals(self, spark, monkeypatch):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            cdc,
        )
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            relational,
        )

        df = _events_df(spark, [
            (1, "2024-01-01 10:00:00", 1, "view", 1.0),
            (1, "2024-01-01 11:00:00", 2, "view", 1.0),    # repeat → folded
            (1, "2024-01-01 12:00:00", 3, "click", 1.0),
            (1, "2024-01-01 13:00:00", 4, "view", 1.0),    # back again
        ])
        monkeypatch.setattr(relational, "load_events",
                            lambda spark, sf_dir: df)
        rows = cdc.scd2_history_from_events(spark, "ignored").collect()
        assert [(r.state, r.valid_from, r.valid_to, r.is_current)
                for r in rows] == [
            ("view", "2024-01-01 10:00:00", "2024-01-01 12:00:00", False),
            ("click", "2024-01-01 12:00:00", "2024-01-01 13:00:00", False),
            ("view", "2024-01-01 13:00:00", "9999-12-31 00:00:00", True),
        ]


class TestEMA:
    def test_matches_numpy_loop(self, spark, sf_dir):
        import numpy as np

        got = {r.event_type: (r.n_events, r.ema_last)
               for r in eventtime.events_ema(spark, sf_dir).collect()}
        e = eventtime.load_events(spark, sf_dir) \
            .select("event_type", "ts", "event_id", "value") \
            .orderBy("ts", "event_id").collect()
        by_type = {}
        for r in e:
            by_type.setdefault(r.event_type, []).append(r.value)
        for t, vals in by_type.items():
            ema = vals[0]
            for v in vals[1:]:
                ema = 0.2 * v + 0.8 * ema
            n, got_ema = got[t]
            assert n == len(vals)
            assert got_ema == pytest.approx(ema, rel=1e-9)

    def test_alpha_one_is_last_value(self, spark, monkeypatch):
        df = _events_df(spark, [
            (1, "2024-01-01 10:00:00", 1, "a", 5.0),
            (1, "2024-01-01 11:00:00", 2, "a", 7.0),
        ])
        _patched(monkeypatch, df)
        row = eventtime.events_ema(spark, "ignored", alpha=1.0).first()
        assert row.ema_last == 7.0 and row.n_events == 2


class TestIncrementalRefresh:
    def test_split_is_nontrivial_and_merge_equals_recompute(self, spark,
                                                           sf_dir):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            timeseries,
        )
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.relational import (
            DEC,
        )

        e = eventtime.load_events(spark, sf_dir)
        cutoff = e.agg(F.date_trunc("day", F.min("ts"))
                       + F.expr("INTERVAL 4 DAYS")).first()[0]
        n_base = e.filter(F.col("ts") < F.lit(cutoff)).count()
        n_delta = e.filter(F.col("ts") >= F.lit(cutoff)).count()
        assert n_base > 0 and n_delta > 0  # both branches carry real work

        merged = timeseries.rollup_incremental_refresh(spark, sf_dir)
        full = (e.groupBy("event_type",
                          F.date_format(F.date_trunc("hour", "ts"),
                                        "yyyy-MM-dd HH:mm:ss")
                          .alias("hour_start"))
                .agg(F.count(F.lit(1)).alias("n_events"),
                     F.sum(F.col("value").cast(DEC)).cast("double")
                     .alias("total_value")))
        assert merged.count() == full.count()
        assert merged.exceptAll(full).count() == 0


class TestDynamicPartitionOverwrite:
    def test_only_target_partition_restated(self, spark, sf_dir):
        import datetime

        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.sources.registry import (
            sink_dynamic_partition_overwrite,
        )

        e = eventtime.load_events(spark, sf_dir) \
            .withColumn("day", F.to_date("ts"))
        min_day = e.agg(F.min("day")).first()[0]
        restate = min_day + datetime.timedelta(days=1)
        raw = {r.day: (r.n, r.s) for r in
               e.groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
               .agg(F.count(F.lit(1)).alias("n"),
                    F.sum("value").alias("s")).collect()}
        out = {r.day: (r.n_events, r.total_value) for r in
               sink_dynamic_partition_overwrite(spark, sf_dir).collect()}
        assert set(out) == set(raw)  # no partition lost, none added
        for day, (n, s) in raw.items():
            factor = 2.0 if day == restate.strftime("%Y-%m-%d") else 1.0
            assert out[day][0] == n
            assert out[day][1] == pytest.approx(s * factor, rel=1e-9)


class TestBPEMergePairs:
    def test_weighted_char_pairs(self, spark, monkeypatch):
        # "ab" x3 docs-occurrences, "abc" x1 → pair 'ab' weight 4,
        # 'bc' weight 1; 1-char token 'x' contributes nothing
        df = spark.createDataFrame(
            [(1, "ab ab x"), (2, "ab abc")], "doc_id long, text string")
        monkeypatch.setattr(corpus, "ld",
                            lambda spark, sf_dir, name, **kw: df)
        rows = {r.pair: r.weight for r in
                corpus.corpus_bpe_merge_pairs(spark, "ignored").collect()}
        assert rows == {"ab": 4, "bc": 1}


class TestSessionAttribution:
    def test_inside_outside_and_bucket_crossing(self, spark, monkeypatch):
        df = _events_df(spark, [
            # view session: [10:55, 11:05) — crosses the 11:00 hour bucket
            (1, "2024-01-01 10:55:00", 1, "view", 1.0),
            (1, "2024-01-01 11:04:00", 2, "purchase", 50.0),  # inside
            (1, "2024-01-01 12:00:00", 3, "purchase", 70.0),  # outside
            # user 2 has no view session at all
            (2, "2024-01-01 11:00:00", 4, "purchase", 10.0),
        ])
        _patched(monkeypatch, df)
        rows = eventtime.events_session_attribution(spark, "ignored") \
            .collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.user_id, r.island, r.n_purchases) == (1, 1, 1)
        assert r.purchase_value == pytest.approx(50.0)

    def test_matches_naive_theta_join(self, spark, sf_dir):
        """The bucketed equi-join rewrite must equal the naive
        containment theta join row-for-row (the oracle recomputes it in
        SQL; this pins the same equivalence DataFrame-side)."""
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.relational import (
            DEC,
        )

        out = eventtime.events_session_attribution(spark, sf_dir)
        e = eventtime.load_events(spark, sf_dir)
        intervals = eventtime._user_islands(
            e.filter(F.col("event_type") == "view"), 10 * 60_000_000) \
            .select("user_id", "island", "from_us", "to_us")
        p = (e.filter(F.col("event_type") == "purchase")
             .select("user_id", "value", F.unix_micros("ts").alias("p_us")))
        naive = (p.join(intervals, "user_id")
                 .filter((F.col("p_us") >= F.col("from_us"))
                         & (F.col("p_us") < F.col("to_us")))
                 .groupBy("user_id", "island")
                 .agg(F.count(F.lit(1)).alias("n_purchases"),
                      F.sum(F.col("value").cast(DEC)).cast("double")
                      .alias("purchase_value")))
        assert out.count() > 0
        assert out.count() == naive.count()
        assert out.exceptAll(naive).count() == 0
        assert naive.exceptAll(out).count() == 0

    def test_equi_join_plan_no_bnlj(self, spark, sf_dir):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.plans.inspect import (
            plan_profile,
        )

        p = plan_profile(eventtime.events_session_attribution(spark, sf_dir))
        assert p["broadcast_nested_loop_joins"] == 0
        assert p["cartesian_products"] == 0
        assert p["python_evals"] == 0


class TestZOrder:
    def test_interleave_known_values(self, spark):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.scale import (
            zorder_value,
        )

        df = spark.createDataFrame(
            [(0, 0), (1, 0), (0, 1), (1, 1), (65535, 65535), (3, 5)],
            "x long, y long")
        got = {(r.x, r.y): r.zv for r in
               df.select("x", "y", zorder_value(F.col("x"), F.col("y"))
                         .alias("zv")).collect()}

        def morton(x, y):
            z = 0
            for i in range(16):
                z |= ((x >> i) & 1) << (2 * i)
                z |= ((y >> i) & 1) << (2 * i + 1)
            return z

        for (x, y), zv in got.items():
            assert zv == morton(x, y), (x, y)

    def test_aligned_block_locality(self, spark, sf_dir):
        """The property that makes z-order prunable on BOTH keys: inside
        any aligned block of 4^k consecutive z-values, x and y each span
        < 2^k. Checked with k=6 (block 4096) over the fixture."""
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.relational import (
            ld,
        )
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.scale import (
            zorder_value,
        )

        l = ld(spark, sf_dir, "lineitem", fanout=False)
        x = F.pmod(F.col("l_orderkey"), F.lit(65536))
        y = F.pmod(F.col("l_partkey"), F.lit(65536))
        zv = zorder_value(x, y)
        spans = (l.select(x.alias("x"), y.alias("y"), zv.alias("zv"))
                 .withColumn("block", F.expr("zv div 4096"))
                 .groupBy("block")
                 .agg((F.max("x") - F.min("x")).alias("dx"),
                      (F.max("y") - F.min("y")).alias("dy")))
        bad = spans.filter((F.col("dx") >= 64) | (F.col("dy") >= 64)).count()
        assert bad == 0


class TestWindowRunningDistinct:
    def test_monotone_and_first_is_one(self, spark, sf_dir):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            analytics,
        )
        from pyspark.sql import Window

        out = analytics.window_running_distinct(spark, sf_dir)
        # the operator's running order is (ts, event_id) — join ts back
        # so the monotonicity probe uses the SAME order (ordering by
        # event_id alone only works while the fixture assigns ids in
        # timestamp order, which a regeneration need not preserve)
        ts = (eventtime.load_events(spark, sf_dir)
              .select("event_id", "ts"))
        outts = out.join(ts, "event_id")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        viol = (outts.withColumn("prev", F.lag("n_distinct_types").over(w))
                .filter(F.col("prev").isNotNull()
                        & (F.col("n_distinct_types") < F.col("prev")))
                .count())
        assert viol == 0          # running distinct never decreases
        firsts = (outts.withColumn(
            "rn", F.row_number().over(w)).filter(F.col("rn") == 1))
        assert firsts.filter(F.col("n_distinct_types") != 1).count() == 0


class TestCompaction:
    def test_file_count_collapses_content_preserved(self, spark, sf_dir,
                                                    tmp_path):
        import os

        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.sources.registry import (
            compact_small_files,
        )

        e = eventtime.load_events(spark, sf_dir)
        frag = str(tmp_path / "frag")
        out = str(tmp_path / "out")
        e.repartition(16).write.parquet(frag)
        n_in = sum(f.endswith(".parquet")
                   for _r, _d, fs in os.walk(frag) for f in fs)
        n_out = compact_small_files(spark, frag, out)
        assert n_in == 16 and n_out == 1   # tiny table → one target file
        back = spark.read.parquet(out)
        assert back.count() == e.count()
        assert back.agg(F.sum("event_id")).first()[0] == \
            e.agg(F.sum("event_id")).first()[0]


class TestSchemaEvolution:
    def test_old_rows_get_null_new_column(self, spark, sf_dir):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.sources.registry import (
            source_schema_evolution,
        )

        rows = {r.priority: r.n_orders for r in
                source_schema_evolution(spark, sf_dir).collect()}
        assert "<pre-evolution>" in rows    # batch-1 rows surfaced as NULL
        assert len(rows) > 1                # batch-2 priorities present


class TestMisraGries:
    def test_support_guarantee(self, spark, sf_dir):
        """Any token with true frequency > N/(k+1) must be in the sketch
        output, and estimates never exceed true counts + 0 (MG only
        undercounts)."""
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            approx,
        )
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.relational import (
            ld,
        )

        k = 64
        got = {r.tok: r.est_count for r in
               approx.frequent_tokens_misra_gries(spark, sf_dir, k=k)
               .collect()}
        toks = (ld(spark, sf_dir, "documents")
                .select(F.explode(F.split("text", " ")).alias("tok")))
        exact = {r.tok: r.n for r in
                 toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
                 .collect()}
        n_total = sum(exact.values())
        threshold = n_total / (k + 1)
        for tok, freq in exact.items():
            if freq > threshold:
                assert tok in got, (tok, freq, threshold)
        for tok, est in got.items():
            assert est <= exact.get(tok, 0)   # undercount only


class TestRFMAndABC:
    def test_rfm_census_covers_all_customers(self, spark, sf_dir):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            analytics,
        )
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.relational import (
            ld,
        )

        out = analytics.customer_rfm_segments(spark, sf_dir)
        n_seg = out.agg(F.sum("n_customers")).first()[0]
        n_cust = (ld(spark, sf_dir, "orders")
                  .select("o_custkey").distinct().count())
        assert n_seg == n_cust    # every ordering customer lands in a cell

    def test_abc_pareto_shape(self, spark, sf_dir):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            analytics,
        )

        rows = {r.abc: (r.n_parts, r.class_revenue) for r in
                analytics.part_abc_analysis(spark, sf_dir).collect()}
        assert set(rows) == {"A", "B", "C"}
        total = sum(v for _n, v in rows.values())
        # class A holds ~80% of revenue with a minority of parts
        assert rows["A"][1] / total <= 0.80 + 0.01
        assert rows["A"][1] / total > 0.5
        n_total = sum(n for n, _v in rows.values())
        assert rows["A"][0] < n_total * 0.9


class TestBacklogSweepLine:
    def test_matches_containment_count_on_probe_days(self, spark, sf_dir):
        """The sweep-line running sum must equal the naive 'count orders
        whose interval contains this day' on sampled probe days."""
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            analytics,
        )
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.relational import (
            ld,
        )

        out = {r.day: r.open_orders for r in
               analytics.orders_open_backlog_daily(spark, sf_dir)
               .collect()}
        o = ld(spark, sf_dir, "orders").select(
            "o_orderkey", F.to_date("o_orderdate").alias("open_day"))
        close = (ld(spark, sf_dir, "lineitem")
                 .groupBy("l_orderkey")
                 .agg(F.max(F.to_date("l_shipdate")).alias("close_day")))
        spans = o.join(close, o.o_orderkey == close.l_orderkey) \
            .select("open_day",
                    F.greatest("close_day", "open_day").alias("close_day")) \
            .collect()
        days = sorted(out)
        for probe in (days[0], days[len(days) // 2], days[-2]):
            naive = sum(1 for r in spans
                        if r.open_day.strftime("%Y-%m-%d") <= probe
                        <= r.close_day.strftime("%Y-%m-%d"))
            assert out[probe] == naive, probe

    def test_backlog_never_negative_and_ends_at_zero(self, spark, sf_dir):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            analytics,
        )

        rows = analytics.orders_open_backlog_daily(spark, sf_dir).collect()
        assert all(r.open_orders >= 0 for r in rows)
        assert rows[-1].open_orders == 0    # every order eventually closes


class TestAudienceAndGeo:
    def test_overlap_matches_naive_self_join(self, spark, sf_dir):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            behavior,
        )
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.relational import (
            load_events,
        )

        out = {(r.seg_a, r.seg_b): r.n_shared_users for r in
               behavior.audience_overlap_matrix(spark, sf_dir).collect()}
        m = load_events(spark, sf_dir) \
            .select("event_type", "user_id").distinct()
        a, b = m.alias("a"), m.alias("b")
        naive = {(r.sa, r.sb): r.n for r in
                 (a.join(b, (F.col("a.user_id") == F.col("b.user_id"))
                         & (F.col("a.event_type") < F.col("b.event_type")))
                  .groupBy(F.col("a.event_type").alias("sa"),
                           F.col("b.event_type").alias("sb"))
                  .agg(F.count(F.lit(1)).alias("n"))).collect()}
        assert out == naive

    def test_geo_every_customer_assigned_once(self, spark, sf_dir):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            analytics,
        )
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.relational import (
            ld,
        )

        out = analytics.geo_nearest_site_assignment(spark, sf_dir)
        total = out.agg(F.sum("n_customers")).first()[0]
        assert total == ld(spark, sf_dir, "customer").count()


class TestParetoFrontier:
    def test_crafted_dominance(self, spark, monkeypatch):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            analytics,
        )

        df = spark.createDataFrame(
            [(10.0, 5), (10.0, 7),    # same price: only max size counts
             (12.0, 7),               # equal size, pricier → dominated
             (15.0, 9),               # bigger → frontier
             (20.0, 8)],              # pricier and smaller → dominated
            "p_retailprice double, p_size int")
        monkeypatch.setattr(analytics, "ld",
                            lambda spark, sf_dir, name, **kw: df)
        rows = [(r.price, r.size) for r in
                analytics.part_pareto_frontier(spark, "ignored").collect()]
        assert rows == [(10.0, 7), (15.0, 9)]


class TestActivityStreaks:
    def test_crafted_streaks(self, spark, monkeypatch):
        df = _events_df(spark, [
            # user 1: days 1,2,3 then gap then 5,6 → best streak 3
            (1, "2024-01-01 10:00:00", 1, "a", 1.0),
            (1, "2024-01-02 10:00:00", 2, "a", 1.0),
            (1, "2024-01-02 12:00:00", 3, "a", 1.0),   # same day, ignored
            (1, "2024-01-03 10:00:00", 4, "a", 1.0),
            (1, "2024-01-05 10:00:00", 5, "a", 1.0),
            (1, "2024-01-06 10:00:00", 6, "a", 1.0),
            # user 2: only 2 consecutive days → below min_streak
            (2, "2024-01-01 10:00:00", 7, "a", 1.0),
            (2, "2024-01-02 10:00:00", 8, "a", 1.0),
        ])
        _patched(monkeypatch, df)
        rows = eventtime.events_activity_streaks(spark, "ignored").collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.user_id, r.best_streak_days) == (1, 3)
        assert r.streak_from == "2024-01-01" and r.streak_to == "2024-01-03"


class TestMisraGriesNoTopKCut:
    def test_guaranteed_tokens_survive_adversarial_mix(self, spark,
                                                       tmp_path):
        """Regression for the limit(k) removal: with k=4 and a token mix
        engineered to decrement the heavy hitter's estimate while many
        near-threshold tokens retain larger estimates, the top-k cut
        could evict a token whose true frequency exceeds N/(k+1). The
        merged table (no cut) must keep every guaranteed token — and may
        legitimately exceed k rows."""
        from collections import Counter

        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            approx,
        )

        k = 4
        # heavy hitter H: 40 occurrences; 10 medium tokens x 12; noise
        # singletons to drive decrements. N = 40 + 120 + 40 = 200;
        # N/(k+1) = 40 -> only H is GUARANTEED (40 > 200/5 is false...
        # make H 50: N = 210, N/5 = 42 -> H guaranteed).
        words = ["H"] * 50
        for m in range(10):
            words += [f"med{m}"] * 12
        words += [f"noise{i}" for i in range(40)]
        # interleave deterministically so H's counter sees decrements
        import random as _random
        rng = _random.Random(7)
        rng.shuffle(words)
        docs = [(i, " ".join(words[i::10]), "en", "src0", 0)
                for i in range(10)]
        df = spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string, "
                  "n_chars long")
        sf_dir = str(tmp_path)
        df.write.parquet(f"{sf_dir}/documents.parquet")

        out = {r["tok"]: r["est_count"]
               for r in approx.frequent_tokens_misra_gries(
                   spark, sf_dir, k=k).collect()}
        true = Counter(words)
        n = sum(true.values())
        guaranteed = {t for t, f in true.items() if f > n / (k + 1)}
        assert guaranteed, "fixture must have at least one guaranteed token"
        for t in guaranteed:
            assert t in out, f"guaranteed-frequent token {t!r} evicted"
            # MG estimate never overcounts and undercounts by <= N/(k+1)
            assert out[t] <= true[t]
            assert out[t] >= true[t] - n / (k + 1)


class TestCountMin:
    def test_cm_invariants_vs_exact_counts(self, spark, sf_dir):
        """Count-Min guarantees, pinned against exact counts: every
        estimate is >= the true frequency (CM never undercounts), and
        with depth=4 the overcount stays within the 2N/width bound for
        every probed token (the per-row expectation is N/width; taking
        the min of 4 rows makes exceeding 2N/width on ALL rows
        vanishingly unlikely and deterministic here — fixed hashes,
        fixed data)."""
        from collections import Counter

        import duckdb

        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            approx,
        )

        width = 512
        got = {r["tok"]: r["est_count"]
               for r in approx.token_counts_countmin(
                   spark, sf_dir, width=width).collect()}
        assert got, "probe set must be non-empty"

        exact = Counter()
        for (text,) in duckdb.sql(
                f"SELECT text FROM '{sf_dir}/documents.parquet'").fetchall():
            exact.update(text.split(" "))
        n_total = sum(exact.values())
        for tok, est in got.items():
            assert est >= exact[tok], (tok, est, exact[tok])
            assert est - exact[tok] <= 2 * n_total / width, \
                (tok, est, exact[tok], n_total)


class TestCusumDrift:
    @staticmethod
    def _ref_cusum(values, k=0.25, h=4.0):
        import numpy as np

        x = np.asarray(values, dtype=np.float64)
        mu, sd = x.mean(), x.std()
        z = (x - mu) / sd if sd > 0 else np.zeros_like(x)
        sp = sm = 0.0
        n_hi = n_lo = 0
        peak_hi = peak_lo = 0.0
        first = -1
        for i, zi in enumerate(z):
            sp = max(0.0, sp + zi - k)
            sm = max(0.0, sm - zi - k)
            peak_hi, peak_lo = max(peak_hi, sp), max(peak_lo, sm)
            alarmed = False
            if sp > h:
                n_hi += 1; alarmed = True; sp = 0.0
            if sm > h:
                n_lo += 1; alarmed = True; sm = 0.0
            if alarmed and first < 0:
                first = i + 1
        return n_hi, n_lo, peak_hi, peak_lo, first

    def test_matches_numpy_loop_on_fixture(self, spark, sf_dir):
        import duckdb

        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            eventtime,
        )

        got = {r.event_type: r for r in
               eventtime.events_cusum_drift(spark, sf_dir).collect()}
        series: dict = {}
        for et, v in duckdb.sql(
                f"SELECT event_type, value FROM "
                f"'{sf_dir}/events.parquet' "
                f"ORDER BY ts, event_id").fetchall():
            series.setdefault(et, []).append(v)
        assert set(got) == set(series)
        for et, vals in series.items():
            n_hi, n_lo, p_hi, p_lo, first = self._ref_cusum(vals)
            r = got[et]
            assert r.n_events == len(vals)
            assert (r.n_alarms_high, r.n_alarms_low) == (n_hi, n_lo)
            assert abs(r.peak_stat_high - p_hi) < 1e-9
            assert abs(r.peak_stat_low - p_lo) < 1e-9
            assert r.first_alarm_ordinal == first

    def test_no_drift_and_step_change_identities(self):
        """A constant series never alarms (z ≡ 0). A hard step change
        alarms on BOTH sides when standardized by the global mean — the
        pre-step half sits below it (low drift), the post-step half
        above (high drift) — and the first HIGH-side excursion only
        accumulates after the step."""
        flat = self._ref_cusum([5.0] * 100)
        assert flat == (0, 0, 0.0, 0.0, -1)
        stepped = [0.0] * 50 + [10.0] * 50
        n_hi, n_lo, p_hi, p_lo, first = self._ref_cusum(stepped)
        assert n_hi >= 1 and n_lo >= 1 and first > 0
        assert p_hi > 4.0 and p_lo > 4.0
