"""Semantic + plan-shape tests for operators/analytics.py: bivariate stats,
rank-rule percentiles, deterministic hash sampling, and blocked
edit-distance pairs. The oracle parity sweep pins cross-engine equality;
these tests pin the properties parity can't see (statistical correctness
vs numpy, sampling-rate behavior, blocking completeness, plan shape)."""

import math

import pytest
from pyspark.sql import functions as F

from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import analytics
from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.plans.inspect import (
    assert_no_python_in_plan,
    plan_profile,
    read_schemas,
)


class TestCorrRegr:
    def test_matches_numpy(self, spark, sf_dir):
        import numpy as np

        rows = analytics.agg_corr_regr(spark, sf_dir).collect()
        pdf = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
               .select("l_returnflag", "l_quantity", "l_discount")
               .toPandas())
        for r in rows:
            g = pdf[pdf.l_returnflag == r.l_returnflag]
            x, y = g.l_quantity.to_numpy(), g.l_discount.to_numpy()
            assert r.n_rows == len(g)
            assert r.corr_xy == pytest.approx(np.corrcoef(x, y)[0, 1],
                                              abs=1e-9)
            assert r.covar_pop == pytest.approx(np.cov(x, y, bias=True)[0, 1],
                                                abs=1e-9)
            slope, intercept = np.polyfit(x, y, 1)
            assert r.regr_slope == pytest.approx(slope, abs=1e-9)
            assert r.regr_intercept == pytest.approx(intercept, abs=1e-9)

    def test_single_pass_no_window(self, spark, sf_dir):
        df = analytics.agg_corr_regr(spark, sf_dir)
        assert_no_python_in_plan(df)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan, "stats must come from one agg pass"
        [cols] = read_schemas(df)
        assert set(cols) == {"l_returnflag", "l_quantity", "l_discount"}


class TestPercentiles:
    def test_rank_rule_matches_sorted_index(self, spark, sf_dir):
        rows = analytics.agg_percentiles(spark, sf_dir).collect()
        pdf = (spark.read.parquet(f"{sf_dir}/orders.parquet")
               .select("o_orderpriority", "o_totalprice", "o_orderkey")
               .toPandas())
        for r in rows:
            g = pdf[pdf.o_orderpriority == r.o_orderpriority].sort_values(
                ["o_totalprice", "o_orderkey"])
            vals = g.o_totalprice.to_list()
            n = len(vals)
            assert r.n_rows == n
            for name, q in analytics._PCTS:
                assert getattr(r, name) == vals[math.ceil(q * n) - 1]

    def test_percentile_ranks_have_no_window(self, spark, sf_dir):
        """Round 7 replaced the 5-priority partitioned window (each
        priority sorted a fifth of orders in ONE task at any scale)
        with scale.grouped_ranks — the plan must carry no WindowExec
        at all now."""
        plan = (analytics.agg_percentiles(spark, sf_dir)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Window" not in plan


class TestHashSampling:
    def test_rates_and_determinism(self, spark, sf_dir):
        out = analytics.sample_hash_stratified(spark, sf_dir)
        again = analytics.sample_hash_stratified(spark, sf_dir)
        assert [r.c_custkey for r in out.collect()] == \
            [r.c_custkey for r in again.collect()]
        total = (spark.read.parquet(f"{sf_dir}/customer.parquet")
                 .groupBy("c_mktsegment").count().collect())
        totals = {r.c_mktsegment: r["count"] for r in total}
        kept = {r.c_mktsegment: r["count"]
                for r in out.groupBy("c_mktsegment").count().collect()}
        for seg, want in (("BUILDING", 0.50), ("MACHINERY", 0.25)):
            if totals.get(seg, 0) >= 100:
                got = kept.get(seg, 0) / totals[seg]
                assert abs(got - want) < 0.12, (seg, got, want)

    def test_sample_is_pushed_filter_scan(self, spark, sf_dir):
        df = analytics.sample_hash_stratified(spark, sf_dir)
        assert_no_python_in_plan(df)
        prof = plan_profile(df)
        assert prof["shuffles"] <= 1  # only the final orderBy


class TestLevenshteinBlocked:
    def test_block_summary_matches_python_brute_force(self, spark, sf_dir):
        out = analytics.dedup_levenshtein_blocked(spark, sf_dir, max_dist=4)
        got = {(r.blk, r.brand): (r.n_candidates, r.n_near, r.min_dist)
               for r in out.collect()}
        pdf = (spark.read.parquet(f"{sf_dir}/part.parquet")
               .select("p_partkey", "p_name", "p_brand").toPandas())
        pdf["blk"] = pdf.p_name.str.split(" ").str[0]
        import itertools

        def lev(a, b):
            prev = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                cur = [i]
                for j, cb in enumerate(b, 1):
                    cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                                   prev[j - 1] + (ca != cb)))
                prev = cur
            return prev[-1]

        # brute-force ONE (block, brand) cell: candidate count (after the
        # length prune), near count, and min distance must all agree
        blk = pdf[pdf.blk == pdf.blk.mode()[0]]
        brand = blk.p_brand.mode()[0]
        cell = blk[blk.p_brand == brand].sort_values("p_partkey")
        n_cand = n_near = 0
        mind = None
        for (k1, n1), (k2, n2) in itertools.combinations(
                zip(cell.p_partkey, cell.p_name), 2):
            if abs(len(n1) - len(n2)) > 4:
                continue
            n_cand += 1
            d = lev(n1, n2)
            mind = d if mind is None else min(mind, d)
            if d <= 4:
                n_near += 1
        key = (cell.blk.iloc[0], brand)
        assert got[key] == (n_cand, n_near, mind)

    def test_equi_join_not_cartesian(self, spark, sf_dir):
        prof = plan_profile(
            analytics.dedup_levenshtein_blocked(spark, sf_dir))
        assert prof["cartesian_products"] == 0
        assert_no_python_in_plan(
            analytics.dedup_levenshtein_blocked(spark, sf_dir))


class TestTimeseries:
    def test_gapfill_covers_every_hour_with_zero_fill(self, spark, sf_dir):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            timeseries,
        )

        rows = timeseries.events_gapfill_hourly(spark, sf_dir).collect()
        by_type = {}
        for r in rows:
            by_type.setdefault(r.event_type, []).append(r)
        for et, series in by_type.items():
            hours = [r.hour_start for r in series]
            assert hours == sorted(hours)
            # dense: count of rows == span in hours + 1
            import datetime as dt
            lo = dt.datetime.strptime(hours[0], "%Y-%m-%d %H:%M:%S")
            hi = dt.datetime.strptime(hours[-1], "%Y-%m-%d %H:%M:%S")
            assert len(series) == int((hi - lo).total_seconds()) // 3600 + 1
        assert any(r.n_events == 0 for r in rows) or all(
            len(s) > 0 for s in by_type.values())

    def test_timeseries_plans_stay_sane(self, spark, sf_dir):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            timeseries,
        )

        gap = plan_profile(timeseries.events_gapfill_hourly(spark, sf_dir))
        assert gap["cartesian_products"] == 0
        assert gap["python_evals"] == 0
        slid = plan_profile(timeseries.events_sliding_hourly(spark, sf_dir))
        assert slid["cartesian_products"] == 0
        assert slid["python_evals"] == 0


class TestPageRank:
    def test_matches_numpy_power_iteration(self, spark, sf_dir):
        import numpy as np

        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            graph,
        )

        edges = graph.customer_supplier_edges(spark, sf_dir)
        got = {r.node: r.rank for r in graph.pagerank(edges).collect()}
        epairs = [(r.src, r.dst) for r in edges.collect()]
        nodes = sorted({x for e in epairs for x in e})
        idx = {n: i for i, n in enumerate(nodes)}
        n = len(nodes)
        M = np.zeros((n, n))
        for s, d in epairs:
            M[idx[d], idx[s]] += 1.0
        deg = M.sum(axis=0)
        r = np.full(n, 1.0 / n)
        for _ in range(10):
            contrib = M @ np.divide(r, deg, out=np.zeros(n), where=deg > 0)
            dangling = r[deg == 0].sum()
            r = (1 - 0.85) / n + 0.85 * (contrib + dangling / n)
        assert abs(sum(got.values()) - 1.0) < 1e-9
        for node, i in idx.items():
            assert got[node] == pytest.approx(r[i], rel=1e-9), node

    def test_iteration_is_one_join_one_agg(self, spark, sf_dir):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            graph,
        )

        out = graph.graph_pagerank_top(spark, sf_dir, k=5)
        assert out.count() == 5

    def test_no_driver_collect_inside_iteration(self, spark, monkeypatch):
        """The dangling-mass fold must NOT collect a scalar per iteration
        (it rides a broadcast 1-row cross join instead) — a blocking
        driver action in the loop doubles per-iteration scheduling
        latency at scale. Pinned structurally: pagerank must never call
        DataFrame.collect at all (its only driver actions are one count
        and the eager localCheckpoints)."""
        from pyspark.sql import DataFrame

        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            graph,
        )

        calls = []
        orig = DataFrame.collect
        monkeypatch.setattr(
            DataFrame, "collect",
            lambda self: (calls.append(1), orig(self))[1])
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1)],
            "src long, dst long")
        ranks = graph.pagerank(edges, n_iters=5)
        assert calls == [], "pagerank called DataFrame.collect internally"
        got = {r.node: r.rank for r in ranks.collect()}
        assert abs(sum(got.values()) - 1.0) < 1e-9


class TestAsofTolerance:
    def test_tolerance_nulls_stale_matches(self, spark):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.asof import (
            asof_join,
        )

        left = spark.createDataFrame(
            [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 12:00:00")],
            "k long, ts string").select(
                "k", F.col("ts").cast("timestamp").alias("ts"))
        right = spark.createDataFrame(
            [(1, "2024-01-01 09:50:00", 100.0)],
            "k long, ts string, v double").select(
                "k", F.col("ts").cast("timestamp").alias("ts"), "v")
        out = {r.ts.hour: r.v_asof
               for r in asof_join(left, right, on="ts", by="k",
                                  tolerance="30 minutes").collect()}
        # 10:00 is 10 min after the right row → within tolerance
        assert out[10] == 100.0
        # 12:00 is 2h10m after → stale, nulled
        assert out[12] is None

    def test_no_tolerance_keeps_stale_matches(self, spark):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.asof import (
            asof_join,
        )

        left = spark.createDataFrame(
            [(1, "2024-01-01 12:00:00")], "k long, ts string").select(
                "k", F.col("ts").cast("timestamp").alias("ts"))
        right = spark.createDataFrame(
            [(1, "2024-01-01 09:00:00", 7.0)],
            "k long, ts string, v double").select(
                "k", F.col("ts").cast("timestamp").alias("ts"), "v")
        [r] = asof_join(left, right, on="ts", by="k").collect()
        assert r.v_asof == 7.0


class TestTfidf:
    def test_rarer_term_outranks_common_at_equal_tf(self, spark, sf_dir):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            corpus,
        )

        rows = corpus.corpus_tfidf_top_terms(spark, sf_dir).collect()
        assert rows, "tf-idf output must be non-empty"
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        for doc, terms in by_doc.items():
            assert [t.rk for t in terms] == list(range(1, len(terms) + 1))
            scores = [t.score for t in terms]
            assert scores == sorted(scores, reverse=True), doc
            for t in terms:
                # score formula is the pinned rational BM25-style weight
                n_docs = 500 if "0.01" in sf_dir else None
                if n_docs:
                    expect = t.tf * (n_docs - t.df + 0.5) / (t.df + 0.5)
                    assert t.score == pytest.approx(expect, rel=1e-12)


class TestCdcApply:
    def test_merge_semantics(self, spark):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.cdc import (
            apply_changes,
        )

        snap = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "id long, name string, bal double")
        changes = spark.createDataFrame(
            [(2, "U", 1, "b2", 21.0),   # update
             (2, "U", 2, "b3", 22.0),   # later update wins
             (3, "D", 1, None, None),   # delete
             (9, "I", 1, "i", 90.0)],   # insert
            "id long, op string, seq int, name string, bal double")
        out = {r.id: (r.name, r.bal)
               for r in apply_changes(snap, changes, key="id",
                                      seq_col="seq").collect()}
        assert out == {1: ("a", 10.0), 2: ("b3", 22.0), 9: ("i", 90.0)}

    def test_apply_plan_is_one_join(self, spark, sf_dir):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.cdc import (
            cdc_apply_customers,
        )
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.plans.inspect import (
            plan_profile,
        )

        prof = plan_profile(cdc_apply_customers(spark, sf_dir))
        assert prof["cartesian_products"] == 0
        assert prof["python_evals"] == 0

    def test_scd2_close_open_noop(self, spark):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.cdc import (
            scd2_apply,
        )

        hist = spark.createDataFrame(
            [(1, "x", "2024-01-01", None),
             (2, "y", "2024-01-01", None),
             (2, "old", "2023-01-01", "2024-01-01")],
            "id long, seg string, valid_from string, valid_to string"
        ).select("id", "seg",
                 F.col("valid_from").cast("date").alias("valid_from"),
                 F.col("valid_to").cast("date").alias("valid_to"))
        changes = spark.createDataFrame(
            [(1, "x2"),   # real change -> close + open
             (2, "y"),    # identical -> no-op
             (3, "z")],   # key unseen by the dimension -> insert
            "id long, seg string")
        out = scd2_apply(hist, changes, key="id", compare_cols=["seg"],
                         change_ts="2024-06-01")
        rows = {(r.id, r.seg): (str(r.valid_from), str(r.valid_to))
                for r in out.collect()}
        assert rows[(1, "x")] == ("2024-01-01", "2024-06-01")   # closed
        assert rows[(1, "x2")] == ("2024-06-01", "None")        # opened
        assert rows[(2, "y")] == ("2024-01-01", "None")         # no-op
        assert rows[(2, "old")] == ("2023-01-01", "2024-01-01")  # history
        assert rows[(3, "z")] == ("2024-06-01", "None")         # inserted
        assert len(rows) == 5


class TestMergeInto:
    def _base(self, spark):
        t = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "k int, name string, bal double")
        s = spark.createDataFrame(
            [(2, "b2", -1.0), (3, "c2", 99.0), (4, "d", 5.0)],
            "k int, name string, bal double")
        return t, s

    def test_clause_precedence_and_partial_set(self, spark):
        """DELETE clause wins over UPDATE for matched rows; the partial
        SET leaves unnamed target columns untouched; unmatched source
        rows insert."""
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.cdc import (
            merge_into,
        )
        from pyspark.sql import functions as F

        t, s = self._base(spark)
        out = merge_into(
            t, s, key="k",
            when_matched_delete=F.col("s.bal") < 0,
            when_matched_update={"bal": F.col("s.bal")},   # name NOT set
            when_not_matched_insert={
                "k": F.col("s.k"), "name": F.col("s.name"),
                "bal": F.col("s.bal")})
        rows = {r["k"]: (r["name"], r["bal"]) for r in out.collect()}
        assert rows == {
            1: ("a", 10.0),        # untouched
            # 2 deleted (bal < 0 tombstone)
            3: ("c", 99.0),        # updated bal, name passed through
            4: ("d", 5.0),         # inserted
        }

    def test_no_insert_clause_drops_unmatched_source(self, spark):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.cdc import (
            merge_into,
        )
        from pyspark.sql import functions as F

        t, s = self._base(spark)
        out = merge_into(t, s, key="k",
                         when_matched_update={"bal": F.col("s.bal")})
        rows = {r["k"]: r["bal"] for r in out.collect()}
        assert rows == {1: 10.0, 2: -1.0, 3: 99.0}   # no key 4, no deletes

    def test_delete_only_merge(self, spark):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.cdc import (
            merge_into,
        )
        from pyspark.sql import functions as F

        t, s = self._base(spark)
        out = merge_into(t, s, key="k",
                         when_matched_delete=F.lit(True))
        assert sorted(r["k"] for r in out.collect()) == [1]


class TestMadZeroGuard:
    def test_zero_mad_type_gets_no_flags_instead_of_nulls(self, spark,
                                                          tmp_path):
        """Regression for the MAD=0 guard: a type where >half the values
        equal the median has MAD 0 — Spark would emit NULL mad_scores
        (DuckDB: inf) for its deviant rows without the guard. Guarded,
        the degenerate type contributes NO rows; a normal type still
        flags its outlier."""
        import datetime

        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            analytics,
        )

        t0 = datetime.datetime(2024, 1, 1)
        rows = []
        # degenerate type: 5 of 7 values identical -> median=5, MAD=0,
        # two wild deviants that WOULD divide by zero
        for i, v in enumerate([5.0, 5.0, 5.0, 5.0, 5.0, 100.0, -100.0]):
            rows.append((i, t0, i, "flat", v, "{}"))
        # normal type: spread values with one clear outlier
        for i, v in enumerate([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 1000.0]):
            rows.append((100 + i, t0, i, "spread", v, "{}"))
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
                  "event_type string, value double, props string")
        sf_dir = str(tmp_path)
        df.write.parquet(f"{sf_dir}/events.parquet")

        out = analytics.events_mad_outliers(spark, sf_dir).collect()
        assert all(r["event_type"] != "flat" for r in out)
        assert any(r["event_type"] == "spread" and r["value"] == 1000.0
                   for r in out)
        assert all(r["mad_score"] is not None for r in out)
