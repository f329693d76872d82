"""Round-9 additions: partial-oracle wrappers for the remaining
rows-only entries (verdict task 2), the literal-catalog ddl_* oracles,
and the r8 ADVICE guards (kmv small-regime gate, k<=2 rail)."""

import pytest
from pyspark.sql import functions as F

from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
    approx,
    dedup,
    eventtime,
    graph,
)


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


class TestPagerankChecked:
    def test_invariants_and_census(self, spark, sf_dir):
        row = _one(graph.graph_pagerank_top_checked(spark, sf_dir))
        assert row.mass_in_band and row.min_rank_ge_floor \
            and row.topk_dominates
        # census matches an independent recomputation
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        pairs = (o.join(li, o["o_orderkey"] == li["l_orderkey"])
                 .select("o_custkey", "l_suppkey").distinct())
        n_cust = pairs.select("o_custkey").distinct().count()
        n_supp = pairs.select("l_suppkey").distinct().count()
        assert row.n_nodes == n_cust + n_supp
        assert row.n_edges == 2 * pairs.count()
        assert row.k_rows == min(25, row.n_nodes)

    def test_core_unchanged_topk_shape(self, spark, sf_dir):
        top = graph.graph_pagerank_top(spark, sf_dir, k=5)
        rows = top.collect()
        assert len(rows) == 5
        ranks = [r.rank for r in rows]
        assert ranks == sorted(ranks, reverse=True)


class TestDedupCheckedWrappers:
    def test_simhash_checked(self, spark, sf_dir):
        row = _one(dedup.dedup_simhash_checked(spark, sf_dir))
        assert row.all_exact_pairs_found and row.near_ge_exact
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n_exact = (d.groupBy("text").count()
                   .agg(F.coalesce(
                       F.sum(F.expr("count * (count - 1) / 2")
                             .cast("long")), F.lit(0)))
                   .collect()[0][0])
        assert row.n_exact_text_pairs == n_exact

    def test_incremental_minhash_checked(self, spark, sf_dir):
        row = _one(dedup.dedup_incremental_minhash_checked(spark, sf_dir))
        assert row.all_exact_dups_flagged and row.flagged_ge_exact
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        assert row.n_batch == d.filter(F.col("source") == "src19").count()


class TestApproxQuantilesChecked:
    def test_rank_band_true_and_minmax_exact(self, spark, sf_dir):
        df = approx.approx_quantiles_checked(spark, sf_dir)
        rows = df.collect()
        assert len(rows) == 5
        assert all(r.rank_in_band for r in rows)
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        mn, mx = o.agg(F.min("o_totalprice"), F.max("o_totalprice")) \
                  .collect()[0]
        assert all(r.min_price == mn and r.max_price == mx for r in rows)

    def test_band_rejects_wrong_value(self, spark, sf_dir):
        """The rank-window gate is not vacuous: the min can never pass as
        the 99th percentile of a non-degenerate column."""
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        n = o.count()
        rank_of_min = o.filter(
            F.col("o_totalprice") <= o.agg(F.min("o_totalprice"))
            .collect()[0][0]).count()
        # the gate's formula with the min's rank at q=0.99
        import math
        target = math.ceil(0.99 * n)
        slack = n * (1.0 / 10_000) + 1.0
        assert not (rank_of_min >= target - slack)


class TestEventsEmaChecked:
    def test_booleans_and_anchors(self, spark, sf_dir):
        rows = eventtime.events_ema_checked(spark, sf_dir).collect()
        assert rows
        assert all(r.ema_convex and r.ema_recurrence_band for r in rows)
        e = spark.read.parquet(f"{sf_dir}/events.parquet")
        exp = {r.event_type: r for r in e.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.max_by("value", F.struct("ts", "event_id")).alias("last"))
            .collect()}
        for r in rows:
            assert r.n_events == exp[r.event_type].n
            assert r.last_value == exp[r.event_type].last


class TestEventsHoltChecked:
    def test_booleans_and_anchors(self, spark, sf_dir):
        rows = eventtime.events_holt_linear_checked(spark, sf_dir).collect()
        assert rows
        assert all(r.forecast_identity and r.mae_nonneg and r.state_finite
                   for r in rows)
        base = {r.event_type: r.n_days
                for r in eventtime.events_holt_linear(spark, sf_dir)
                .collect()}
        for r in rows:
            assert r.n_days == base[r.event_type]


class TestKmvGuards:
    def test_vocab_kmv_checked_rejects_tiny_k(self, spark, sf_dir):
        with pytest.raises(ValueError, match="k > 2"):
            approx.vocab_kmv_distinct_checked(spark, sf_dir, k=2)

    def test_small_regime_exact_equality_gate(self, spark, sf_dir):
        """With k far above the true union cardinality the sketch IS the
        set: the checked gate switches to exact equality and still passes
        (r8 ADVICE: the docstring promised this branch — now it exists)."""
        row = _one(approx.kmv_set_ops_checked(spark, sf_dir, k=1 << 17))
        assert row.exact_union < (1 << 17)   # small regime genuinely hit
        assert row.union_in_band and row.intersect_in_band \
            and row.jaccard_in_band


class TestDdlLiteralOracles:
    def test_values_literals_match_computed_catalog(self, spark):
        """The literal-VALUES oracles pin the fixture corpus's expected
        catalog; if parser/mapper/assessor drift, this fails before the
        driver does."""
        import duckdb

        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark import (
            registry as R,
        )

        cq = R._catalog_queries()
        con = duckdb.connect()
        for name, oracle in (
                ("ddl_schema_catalog", R.ORACLE_DDL_SCHEMA_CATALOG),
                ("ddl_assess_catalog", R.ORACLE_DDL_ASSESS_CATALOG),
                ("ddl_type_distribution", R.ORACLE_DDL_TYPE_DISTRIBUTION)):
            got = [tuple(r) for r in cq[name](spark, "unused").collect()]
            exp = con.sql(oracle).fetchall()
            assert sorted(map(repr, got)) == sorted(map(repr, exp)), name
