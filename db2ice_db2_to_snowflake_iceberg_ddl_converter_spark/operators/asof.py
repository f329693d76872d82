"""As-of (point-in-time) join — the time-series operator Spark lacks as a
built-in (SURVEY.md §2.2 "Joins": range/as-of via union+window).

``asof_join`` matches every left row with the most recent right row at or
before its timestamp, per key — without a range join's quadratic blowup:

1. tag and union both sides (one narrow shuffle on (key, time) only),
2. per key, a running ``last(right value, ignorenulls)`` ordered by time
   carries the latest right row forward,
3. keep left rows; their carried value IS the as-of match.

One shuffle + one window — linear in rows, independent of time-gap width.
The window frame never exceeds one partition's sort run, so a 100 TB event
table as-of-joins against a quote/dimension stream at scan speed. Ties
(equal timestamps) resolve right-row-first via the tag sort key, matching
the "at or before" contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, by: str,
              value_cols: list[str] | None = None,
              suffix: str = "_asof",
              tiebreak: list[str] | None = None,
              tolerance: str | None = None) -> DataFrame:
    """For each left row: latest right row with ``right[on] <= left[on]``,
    matched within ``by`` groups. Right columns arrive suffixed.

    ``value_cols`` defaults to every right column except ``on``/``by``.
    Left rows with no prior right row keep nulls (left-outer semantics).
    ``tiebreak`` (right-side column names) makes the winner among
    equal-timestamp right rows deterministic. ``tolerance`` (an SQL
    interval string, e.g. ``"30 minutes"``) nulls the match when the
    matched right row is older than ``left[on] − tolerance`` — pandas
    ``merge_asof(tolerance=...)`` semantics, implemented as a post-window
    projection so the plan stays one shuffle + one window.

    The carry is ROW-ATOMIC: one struct(right ts, *value_cols) travels
    through a single ``last(ignorenulls)`` window expression, so the
    recency check and every value column always describe the SAME right
    row — a newest right row with a NULL value column yields NULL for
    that column (pandas merge_asof row semantics), never a stale value
    smuggled past the tolerance check from an older row. One struct
    carry also replaces N per-column window expressions."""
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, by)]

    lt = left.withColumn("__side", F.lit(1))
    rt = right.select(
        F.col(by), F.col(on), F.lit(0).alias("__side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols])
    unioned = lt.unionByName(rt, allowMissingColumns=True)

    # right rows (side=0) sort before left rows at equal timestamps, so an
    # exactly-simultaneous right row is visible to the left row ("<=").
    # asc_nulls_last on EVERY order key pins the cross-engine total order
    # (Spark defaults NULLS FIRST, DuckDB NULLS LAST): corrupted NULL-ts
    # rows sort after all real rows on both engines, so a NULL-ts left
    # row carries the same right row everywhere; inert on NULL-free data
    # (r10, ADVICE item closed).
    order = [F.asc_nulls_last(on), F.col("__side")] + \
        [F.asc_nulls_last(f"{c}{suffix}") for c in (tiebreak or [])]
    w = (Window.partitionBy(by).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    row_struct = F.when(
        F.col("__side") == 0,
        F.struct(F.col(on).alias("__rts"),
                 *[F.col(f"{c}{suffix}").alias(c) for c in value_cols]))
    carried = unioned.select(
        "*", F.last(row_struct, ignorenulls=True).over(w).alias("__carry"))
    out_vals = []
    for c in value_cols:
        v = F.col(f"__carry.{c}")
        if tolerance is not None:
            v = F.when(F.col("__carry.__rts")
                       >= F.col(on) - F.expr(f"INTERVAL {tolerance}"), v)
        out_vals.append(v.alias(f"{c}{suffix}"))
    return (carried.filter(F.col("__side") == 1)
            .drop("__side", *[f"{c}{suffix}" for c in value_cols])
            .select("*", *out_vals)
            .drop("__carry"))


def events_asof_last_click(spark, sf_dir):
    """As-of demo on the fixture stream: for every purchase event, the
    timestamp/value of that user's most recent click at or before it."""
    from .relational import load_events

    e = load_events(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"))
    joined = asof_join(purchases, clicks, on="ts", by="user_id",
                       value_cols=["click_id", "click_value"],
                       tiebreak=["click_id"])
    from .relational import _fmt_ts

    return (joined.select("event_id", "user_id",
                          _fmt_ts("ts").alias("purchase_ts"),
                          "click_id_asof", "click_value_asof")
            .orderBy("event_id"))


ORACLE_EVENTS_ASOF = """
WITH tagged AS (
  SELECT user_id, ts, 1 AS side, event_id, value,
         NULL::BIGINT AS click_id, NULL::DOUBLE AS click_value
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts, 0 AS side, NULL, NULL, event_id, value
  FROM events WHERE event_type = 'click'
), carried AS (
  SELECT *,
         LAST_VALUE(CASE WHEN side = 0 THEN
             struct_pack(cid := click_id, cval := click_value)
           END IGNORE NULLS) OVER w AS r
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, click_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       r.cid AS click_id_asof, r.cval AS click_value_asof
FROM carried WHERE side = 1 ORDER BY event_id
"""


def events_asof_tolerance(spark, sf_dir):
    """As-of with a 30-minute tolerance: a purchase whose latest prior
    click is older than 30 minutes gets NULLs (stale quotes must not
    match — the pandas merge_asof(tolerance=...) contract)."""
    from .relational import _fmt_ts, load_events

    e = load_events(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"))
    joined = asof_join(purchases, clicks, on="ts", by="user_id",
                       value_cols=["click_id", "click_value"],
                       tiebreak=["click_id"], tolerance="30 minutes")
    return (joined.select("event_id", "user_id",
                          _fmt_ts("ts").alias("purchase_ts"),
                          "click_id_asof", "click_value_asof")
            .orderBy("event_id"))


ORACLE_EVENTS_ASOF_TOLERANCE = """
WITH tagged AS (
  SELECT user_id, ts, 1 AS side, event_id, value,
         NULL::BIGINT AS click_id, NULL::DOUBLE AS click_value,
         NULL::TIMESTAMP AS rts
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts, 0 AS side, NULL, NULL, event_id, value, ts
  FROM events WHERE event_type = 'click'
), carried AS (
  SELECT *,
         LAST_VALUE(CASE WHEN side = 0 THEN
             struct_pack(rts := rts, cid := click_id, cval := click_value)
           END IGNORE NULLS) OVER w AS r
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, click_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       CASE WHEN r.rts >= ts - INTERVAL 30 MINUTE THEN r.cid END
         AS click_id_asof,
       CASE WHEN r.rts >= ts - INTERVAL 30 MINUTE THEN r.cval END
         AS click_value_asof
FROM carried WHERE side = 1 ORDER BY event_id
"""
