"""Plan-asserted tests for the scale utilities: bucketing must eliminate
the join exchange, salting must preserve join results exactly, clustering
writes must produce key-tight files."""

import pytest
from pyspark.sql import functions as F

from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import scale
from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.relational import ld
from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.plans.inspect import (
    executed_plan,
    plan_profile,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # managed tables land in the session's spark-warehouse dir (static
    # config); DROP TABLE below removes the files again
    scale.write_bucketed(ld(spark, sf_dir, "lineitem"), "b_lineitem",
                         ["l_orderkey"], num_buckets=8)
    scale.write_bucketed(ld(spark, sf_dir, "orders"), "b_orders",
                         ["o_orderkey"], num_buckets=8)
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


class TestBucketedJoin:
    def test_bucketed_join_has_no_exchange(self, spark, bucketed_tables):
        lt, rt = bucketed_tables
        j = spark.table(lt).hint("merge").join(
            spark.table(rt),
            F.col("l_orderkey") == F.col("o_orderkey"))
        prof = plan_profile(j)
        assert prof["sort_merge_joins"] == 1
        assert prof["shuffles"] == 0, executed_plan(j)

    def test_unbucketed_same_join_does_shuffle(self, spark, sf_dir):
        l = ld(spark, sf_dir, "lineitem").hint("merge")
        o = ld(spark, sf_dir, "orders")
        j = l.join(o, l.l_orderkey == o.o_orderkey)
        assert plan_profile(j)["shuffles"] >= 1

    def test_bucketed_join_results_match_plain(self, spark, sf_dir,
                                               bucketed_tables):
        lt, rt = bucketed_tables
        bucketed = (spark.table(lt).hint("merge").join(
            spark.table(rt),
            F.col("l_orderkey") == F.col("o_orderkey")))
        l = ld(spark, sf_dir, "lineitem")
        o = ld(spark, sf_dir, "orders")
        plain = l.join(o, l.l_orderkey == o.o_orderkey)
        assert bucketed.count() == plain.count()

    def test_bucketed_agg_skips_exchange(self, spark, bucketed_tables):
        lt, _ = bucketed_tables
        agg = (spark.table(lt).groupBy("l_orderkey")
               .agg(F.sum("l_quantity").alias("q")))
        assert plan_profile(agg)["shuffles"] == 0


class TestSaltedJoin:
    def test_salted_equals_plain_inner(self, spark, sf_dir):
        l = ld(spark, sf_dir, "lineitem")
        n = ld(spark, sf_dir, "nation").withColumnRenamed(
            "n_nationkey", "l_suppkey")  # fake small dim keyed like the fact
        plain = l.join(n, "l_suppkey").groupBy("n_name") \
            .agg(F.count(F.lit(1)).alias("c"))
        salted = scale.salted_join(
            l, n, key="l_suppkey",
            id_cols=["l_orderkey", "l_linenumber"]).groupBy("n_name") \
            .agg(F.count(F.lit(1)).alias("c"))
        assert sorted(map(tuple, salted.collect())) == \
            sorted(map(tuple, plain.collect()))

    def test_salt_actually_fans_out(self, spark, sf_dir):
        l = ld(spark, sf_dir, "lineitem")
        n = ld(spark, sf_dir, "nation").withColumnRenamed(
            "n_nationkey", "l_suppkey")
        salt = F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(8))
        dist = (l.withColumn("s", salt).groupBy("s").count().collect())
        assert len(dist) == 8  # every salt bucket populated
        counts = [r["count"] for r in dist]
        assert max(counts) < 2 * min(counts)  # roughly uniform

    def test_salted_left_join_keeps_unmatched(self, spark, sf_dir):
        c = ld(spark, sf_dir, "customer")
        o = ld(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT") \
            .withColumnRenamed("o_custkey", "c_custkey")
        plain = c.join(o.select("c_custkey", "o_orderkey"),
                       "c_custkey", "left")
        salted = scale.salted_join(
            c, o.select("c_custkey", "o_orderkey"), key="c_custkey",
            id_cols=["c_custkey"], how="left")
        assert salted.count() == plain.count()
        assert salted.filter(F.col("o_orderkey").isNull()).count() == \
            plain.filter(F.col("o_orderkey").isNull()).count()


class TestClusteredWrite:
    def test_files_are_key_tight(self, spark, sf_dir, tmp_path):
        out = str(tmp_path / "clustered")
        df = scale.repartition_for_write(
            ld(spark, sf_dir, "lineitem"), ["l_suppkey"],
            target_partitions=8)
        df.write.mode("overwrite").parquet(out)
        back = spark.read.parquet(out)
        assert back.count() == ld(spark, sf_dir, "lineitem").count()
        # each file covers a bounded key set: suppkeys per file ≤ total/2
        per_file = (back.withColumn("f", F.input_file_name())
                    .groupBy("f")
                    .agg(F.countDistinct("l_suppkey").alias("nk"))
                    .collect())
        total_keys = ld(spark, sf_dir, "lineitem") \
            .select("l_suppkey").distinct().count()
        assert len(per_file) >= 2
        assert all(r.nk < total_keys for r in per_file)


class TestSaltedJoinSemantics:
    def test_right_and_full_outer_rejected(self, spark, sf_dir):
        c = ld(spark, sf_dir, "customer")
        o = ld(spark, sf_dir, "orders").withColumnRenamed(
            "o_custkey", "c_custkey")
        for how in ("right", "full", "full_outer", "right_outer"):
            with pytest.raises(ValueError, match="salted_join"):
                scale.salted_join(c, o, key="c_custkey",
                                  id_cols=["c_custkey"], how=how)


class TestGlobalRanks:
    def test_gap_free_permutation(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            scale,
        )
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.relational import (
            ld,
        )

        c = ld(spark, sf_dir, "customer")
        ranked, n = scale.global_ranks(
            c, [F.desc("c_acctbal"), F.asc("c_custkey")], num_partitions=8)
        assert n == c.count()
        ranks = [r.global_rn for r in ranked.select("global_rn").collect()]
        assert sorted(ranks) == list(range(1, n + 1))

    def test_matches_global_window(self, spark, sf_dir):
        """Rank order must equal the single-partition Window's order."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            scale,
        )
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.relational import (
            ld,
        )

        c = ld(spark, sf_dir, "customer")
        ranked, _n = scale.global_ranks(
            c, [F.desc("c_acctbal"), F.asc("c_custkey")], num_partitions=8)
        got = {r.c_custkey: r.global_rn
               for r in ranked.select("c_custkey", "global_rn").collect()}
        w = Window.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        want = {r.c_custkey: r.rn
                for r in c.select("c_custkey",
                                  F.row_number().over(w).alias("rn"))
                .collect()}
        assert got == want

    def test_ntile_expr_matches_sql_ntile(self, spark):
        """ntile_expr must reproduce ANSI NTILE for awkward n/k splits."""
        from pyspark.sql import functions as F

        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.scale import (
            ntile_expr,
        )

        for n, k in ((10, 4), (7, 3), (5, 5), (3, 7), (1, 4), (12, 1)):
            df = spark.range(1, n + 1).withColumnRenamed("id", "rn")
            got = {r.rn: r.t for r in df.select(
                "rn", ntile_expr(F.col("rn"), n, k).alias("t")).collect()}
            want = {r.rn: r.t for r in spark.sql(
                f"SELECT rn, NTILE({k}) OVER (ORDER BY rn) AS t "
                f"FROM (SELECT explode(sequence(1, {n})) AS rn)").collect()}
            assert got == want, (n, k)
