"""Seeded data-plane fuzz: generated predicates, aggregations, and join
shapes run on BOTH engines (Spark DataFrame ↔ DuckDB SQL) over the same
parquet, comparing counts and exact integer aggregates.

The registry's oracle gate checks a fixed query list; this sweeps a
randomized corner of the expression space every run (seeded → reproducible
failures) so a Catalyst/DuckDB semantic divergence in comparison, null
handling, or string ordering surfaces even if no hand-written query
happens to exercise it. Counts and integer sums only — float formatting
is the registry's determinism-protocol territory, not the fuzzer's.
"""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

NUM_COLS = ["o_orderkey", "o_custkey"]
STR_COLS = ["o_orderpriority", "o_orderstatus"]
OPS = ["<", "<=", ">", ">=", "=", "<>"]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'")
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM '{sf_dir}/customer.parquet'")
    yield con
    con.close()


def _rand_predicate(rng, lo, hi):
    """One conjunct as (spark_sql_expr, duckdb_sql_expr) — identical text;
    the point is running the SAME predicate through both parsers."""
    kind = rng.random()
    if kind < 0.55:
        col = rng.choice(NUM_COLS)
        op = rng.choice(OPS)
        v = rng.randint(lo, hi)
        s = f"{col} {op} {v}"
        return s, s
    if kind < 0.8:
        col = rng.choice(STR_COLS)
        # prefix comparison exercises string collation order
        ch = rng.choice("0123456789ABCMPU")
        op = rng.choice(["<", ">=", "="])
        s = f"substr({col}, 1, 1) {op} '{ch}'"
        return s, s
    col = rng.choice(NUM_COLS)
    a, b = sorted((rng.randint(lo, hi), rng.randint(lo, hi)))
    s = f"{col} BETWEEN {a} AND {b}"
    return s, s


class TestPredicateFuzz:
    def test_filter_counts_match(self, spark, sf_dir, duck):
        rng = random.Random(20260814)
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        hi = o.agg(F.max("o_orderkey")).first()[0]
        for trial in range(40):
            conjuncts = [_rand_predicate(rng, 0, hi)
                         for _ in range(rng.randint(1, 3))]
            sp = " AND ".join(c[0] for c in conjuncts)
            du = " AND ".join(c[1] for c in conjuncts)
            got = o.filter(sp).count()
            want = duck.execute(
                f"SELECT COUNT(*) FROM orders WHERE {du}").fetchone()[0]
            assert got == want, f"trial {trial}: {sp!r} → {got} vs {want}"

    def test_grouped_integer_aggs_match(self, spark, sf_dir, duck):
        rng = random.Random(99)
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        hi = o.agg(F.max("o_orderkey")).first()[0]
        for trial in range(15):
            key = rng.choice(STR_COLS)
            pred, _ = _rand_predicate(rng, 0, hi)
            got = {tuple(r) for r in
                   (o.filter(pred).groupBy(key)
                    .agg(F.count(F.lit(1)).alias("n"),
                         F.sum("o_orderkey").alias("s"))
                    .collect())}
            want = {tuple(r) for r in duck.execute(
                f"SELECT {key}, COUNT(*), CAST(SUM(o_orderkey) AS BIGINT) "
                f"FROM orders WHERE {pred} GROUP BY {key}").fetchall()}
            assert got == want, f"trial {trial}: {pred!r}"

    def test_join_cardinalities_match(self, spark, sf_dir, duck):
        rng = random.Random(7)
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        c = spark.read.parquet(f"{sf_dir}/customer.parquet")
        n_cust = c.count()
        for trial in range(10):
            cut = rng.randint(0, n_cust)
            how, sql = rng.choice([
                ("inner", "JOIN"),
                ("left", "LEFT JOIN"),
                ("left_semi", "SEMI JOIN"),
                ("left_anti", "ANTI JOIN"),
            ])
            cf = c.filter(F.col("c_custkey") < cut)
            got = o.join(cf, o.o_custkey == cf.c_custkey, how).count()
            want = duck.execute(
                f"SELECT COUNT(*) FROM orders o {sql} "
                f"(SELECT * FROM customer WHERE c_custkey < {cut}) c "
                f"ON o.o_custkey = c.c_custkey").fetchone()[0]
            assert got == want, f"trial {trial}: {how} cut={cut}"


class TestDecimalProtocolFuzz:
    def test_money_sums_bitwise_identical(self, spark, sf_dir, duck):
        """The engine's determinism protocol (per-row cast to
        DECIMAL(28,6), exact sum, one cast to double) must produce
        BITWISE-equal doubles in both engines for arbitrary filtered
        groupings — fuzzed, because the fixed registry can't cover the
        grouping×predicate space."""
        import struct

        rng = random.Random(4242)
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        hi = o.agg(F.max("o_orderkey")).first()[0]
        for trial in range(12):
            key = rng.choice(STR_COLS)
            pred, _ = _rand_predicate(rng, 0, hi)
            got = {r[0]: struct.pack("<d", r[1]) for r in
                   (o.filter(pred).groupBy(key)
                    .agg(F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
                         .cast("double").alias("s")).collect())
                   if r[1] is not None}
            want = {r[0]: struct.pack("<d", r[1]) for r in duck.execute(
                f"SELECT {key}, CAST(SUM(CAST(o_totalprice AS "
                f"DECIMAL(28,6))) AS DOUBLE) FROM orders WHERE {pred} "
                f"GROUP BY {key}").fetchall() if r[1] is not None}
            assert got == want, f"trial {trial}: {pred!r} by {key}"


class TestScd2Composition:
    """apply ∘ reconstruct = reconstruct ∘ append, on a fuzzed change log.

    ``scd2_history_from_events`` rebuilds a validity-interval history FROM
    a change log; ``scd2_apply`` merges one new change INTO a history.
    The two must compose: applying day-T changes to the history rebuilt
    from a log equals rebuilding from the log with those changes appended.
    This pins the whole interval-boundary contract at once — close date ==
    new valid_from, no-op on identical payloads, insert on unseen keys —
    the exact class of off-by-one the round-2 review found.
    """

    @staticmethod
    def _reconstruct(df):
        """History from a (k, d, v) change log: consecutive same-v repeats
        per key collapse; each surviving change spans to the next one
        (same lag-filter + lead shape as scd2_history_from_events, on
        DATE validity to match scd2_apply's convention)."""
        from pyspark.sql import Window

        w = Window.partitionBy("k").orderBy("d")
        ch = (df.withColumn("prev_v", F.lag("v").over(w))
              .filter(F.col("prev_v").isNull()
                      | (F.col("prev_v") != F.col("v"))))
        return (ch.withColumn("valid_to", F.lead("d").over(w))
                .select("k", "v", F.col("d").alias("valid_from"),
                        "valid_to"))

    def test_apply_equals_reconstruct_of_appended_log(self, spark):
        import datetime

        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.cdc import (
            scd2_apply,
        )

        rng = random.Random(20260814)
        vals = ["a", "b", "c"]
        log, appended = [], []
        for k in range(1, 41):
            n = rng.randint(1, 5)
            days = sorted(rng.sample(range(0, 300), n))
            for d in days:
                log.append((k, datetime.date(2024, 1, 1)
                            + datetime.timedelta(days=d),
                            rng.choice(vals)))
        # day-T change batch: mix of real changes, no-ops (same value as
        # current), and brand-new keys
        t_new = datetime.date(2025, 6, 1)
        current = {}
        for k, d, v in sorted(log):
            current[k] = v
        for k in range(1, 41):
            if rng.random() < 0.4:
                appended.append((k, t_new, current[k]))       # no-op
            elif rng.random() < 0.7:
                appended.append((k, t_new, rng.choice(vals))) # maybe change
        for k in range(100, 100 + rng.randint(3, 8)):
            appended.append((k, t_new, rng.choice(vals)))     # insert

        log_df = spark.createDataFrame(log, "k int, d date, v string")
        app_df = spark.createDataFrame(appended, "k int, d date, v string")

        history = self._reconstruct(log_df)
        applied = scd2_apply(
            history, app_df.select("k", "v"), key="k",
            compare_cols=["v"], change_ts=t_new.isoformat(),
            from_col="valid_from", to_col="valid_to")
        expected = self._reconstruct(log_df.union(app_df))

        got = sorted(map(tuple, applied.collect()))
        want = sorted(map(tuple, expected.collect()))
        assert got == want

    def test_apply_current_state_is_identity(self, spark):
        """Idempotence corner pinned separately: re-applying every key's
        CURRENT payload must leave the history bit-identical."""
        import datetime

        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.cdc import (
            scd2_apply,
        )

        rng = random.Random(42)
        log = []
        for k in range(1, 31):
            days = sorted(rng.sample(range(0, 200), rng.randint(1, 4)))
            for d in days:
                log.append((k, datetime.date(2024, 1, 1)
                            + datetime.timedelta(days=d),
                            rng.choice(["x", "y", "z"])))
        log_df = spark.createDataFrame(log, "k int, d date, v string")
        history = self._reconstruct(log_df)
        current = (history.filter(F.col("valid_to").isNull())
                   .select("k", "v"))
        applied = scd2_apply(history, current, key="k", compare_cols=["v"],
                             change_ts="2025-06-01",
                             from_col="valid_from", to_col="valid_to")
        got = sorted(map(tuple, applied.collect()))
        want = sorted(map(tuple, history.collect()))
        assert got == want
