"""Scale techniques as first-class utilities: bucketed co-located joins,
skew salting, and partitioning helpers.

These are the knobs the 100 TB deployment turns that small-SF correctness
tests never force (SURVEY.md §4: partitioning/shuffle). Each utility is
plan-asserted in tests/test_scale.py — the point is not that they *run*,
but that they produce the physical shape they promise (no exchange on a
bucketed join; a salted join that actually fans the hot key out).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   num_buckets: int = 32,
                   sort_cols: list[str] | None = None) -> None:
    """Persist a table bucketed (and optionally sorted) on its join key.

    Bucketing pre-shuffles the data once at write time; every subsequent
    equi-join or aggregation on ``bucket_cols`` between tables with the
    same bucket count reads co-located buckets and skips its exchange —
    the single biggest shuffle eliminator for repeatedly-joined 100 TB
    fact tables. (File-format tables only support this via the session
    catalog, hence saveAsTable.)
    """
    writer = (df.write.mode("overwrite").format("parquet")
              .bucketBy(num_buckets, *bucket_cols))
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  left_on: list[str], right_on: list[str],
                  how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket keys. The merge hint
    steers Catalyst to the sort-merge path where bucketing applies (a
    broadcast would hide the co-location proof); with matching bucket specs
    the plan carries zero Exchange nodes."""
    lt = spark.table(left_table).hint("merge")
    rt = spark.table(right_table)
    cond = None
    for lc, rc in zip(left_on, right_on):
        piece = lt[lc] == rt[rc]
        cond = piece if cond is None else (cond & piece)
    return lt.join(rt, cond, how)


def salted_join(left: DataFrame, right: DataFrame, key: str,
                id_cols: list[str], num_salts: int = 8,
                how: str = "inner") -> DataFrame:
    """Equi-join with the left side's hot keys fanned out over
    ``num_salts`` sub-keys and the (small-ish) right side replicated.

    AQE's skew-join splitting handles moderate skew automatically; salting
    is for the pathological case — one key holding a double-digit share of
    the table — where a single straggler task would otherwise pin the whole
    stage. The salt is deterministic (hash of ``id_cols``), so retries and
    re-runs land rows in the same bucket.

    Result is row-identical to ``left.join(right, key, how)`` for
    ``inner``/``left``/``left_semi`` joins only — the salted-left,
    replicated-right construction emits each unmatched RIGHT row once per
    salt, so right/full-outer (and right_semi/anti) semantics are NOT
    preserved; those raise rather than silently duplicate.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "semi"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join preserves semantics only for {sorted(allowed)}; "
            f"got how={how!r} (unmatched right rows would appear "
            f"{num_salts} times)")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in id_cols]),
                  F.lit(num_salts)).cast("int")
    salted_left = left.withColumn("__salt", salt)
    replicas = F.explode(
        F.array(*[F.lit(i) for i in range(num_salts)])).alias("__salt")
    salted_right = right.select("*", replicas)
    joined = salted_left.join(salted_right,
                              [key, "__salt"], how)
    return joined.drop("__salt")


def repartition_for_write(df: DataFrame, cluster_cols: list[str],
                          target_partitions: int | None = None) -> DataFrame:
    """DISTRIBUTE BY HASH → CLUSTER BY intent (reference parser.py:102,
    converter.py:160-163) realized physically: hash-repartition on the
    cluster key, sort within partitions so every written file covers a
    tight key range and min/max footer stats prune later scans."""
    out = (df.repartition(target_partitions, *cluster_cols)
           if target_partitions else df.repartition(*cluster_cols))
    return out.sortWithinPartitions(*cluster_cols)
