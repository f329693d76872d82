"""Relational operator battery: scans, filters, joins, aggregations, windows,
sorts, set ops, and scalar functions — each query paired with an ANSI-SQL
oracle twin that DuckDB executes over the same parquet files.

These are the **EXT** operators from SURVEY.md §2.2: the reference engine is a
schema-level pipeline with no row-plane query surface, so this module supplies
the full validation-query surface a migration needs (plus it exercises every
Spark operator class the engine claims).

Determinism protocol for oracle parity (floats are the hazard):
- raw row payloads (no aggregation) can carry doubles as-is — values come
  straight from parquet;
- any SUM over doubles goes through ``CAST(expr AS DECIMAL(28,6))`` per row
  *after* plain double arithmetic: per-row IEEE math is bitwise identical in
  both engines, nearest-rounding at scale 6 recovers the true ≤6-decimal
  money value, and decimal summation is exact and order-independent.
  *Emitted* sum columns are then cast DECIMAL→DOUBLE once (`_dsumd`): the
  exact decimal is identical in both engines, so its single rounding to
  double is too — and a double survives the driver's pandas value-hash
  canonicalization, where a raw Spark Decimal (object) vs DuckDB decimal
  (float64) prints differently and hash-mismatches (round-1 lesson: q18
  passed with this cast, q1/q3/q5/q6/q10 failed without it). Comparisons
  and joins on sums stay in decimal internally; only the final select
  changes type. DuckDB SUM(int) returns HUGEINT, which its pandas path
  also mangles — integer sums are CAST(... AS BIGINT) in oracles;
- averages are expressed as exact-decimal-sum ÷ count (double division of
  identical operands);
- sorts always carry a unique tiebreaker so LIMIT is stable;
- timestamps are emitted as formatted strings to sidestep tz/precision
  representation differences between engines;
- transcendental functions (ln/exp/pow) are avoided in checked outputs —
  libm vs java.lang.Math differ in the last ulp; sqrt is IEEE-exact.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DEC = "decimal(28,6)"


# Parquet splits at row-group granularity, so a single-row-group file
# serializes every downstream map stage no matter how many cores exist
# (the fixture generator writes exactly one row group per table; measured
# ~25% on q1 at sf0.1 and worse as data grows). Below this size the map
# work is trivial and the extra exchange is pure overhead — and the gate
# also keeps every sf0.01 (test / driver-correctness) plan untouched.
_MIN_REPARTITION_BYTES = 1_500_000


def ld(spark: SparkSession, sf_dir: str, name: str,
       fanout: bool = True) -> DataFrame:
    """Load a fixture table; if the file is big enough to matter and its
    scan yields fewer partitions than ``defaultParallelism``, redistribute
    once so map stages saturate the cluster. On production layouts (many
    files / many row groups) the condition is false and this is a plain
    scan — it is NOT a blanket shuffle at 100 TB. Filters and projections
    still reach the scan: Catalyst pushes both through Repartition
    (pinned by tests/test_plans.py at sf0.1).

    ``fanout=False`` skips the redistribution. Pass it when the first
    thing downstream is a key exchange (shuffle join / keyed agg / window
    partitionBy) with only cheap row work before it: the consumer's own
    exchange already parallelizes everything after the scan, so a
    round-robin exchange ahead of it is a pure extra round-trip of the
    data (measured r02: q3 +41%, q5 +31%, q10 +29%, q18 +23% from
    exactly this). Keep the default when real per-row compute sits
    between scan and first exchange — q1's 8 decimal partial aggregates
    win 25% from the fan-out."""
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    if not fanout:
        return df
    try:
        big = os.path.getsize(path) >= _MIN_REPARTITION_BYTES
    except OSError:
        big = False  # non-local storage: trust the source layout
    if big and df.rdd.getNumPartitions() < \
            spark.sparkContext.defaultParallelism:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def ld_py(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Loader for tables about to enter a row-work-heavy map stage — an
    Arrow/Python UDF pass or a wide partial aggregate. Unlike ``ld``, the
    fan-out has NO size threshold: the stage cost scales with rows (not
    file bytes), so even a sub-MB single-row-group file serializes the
    whole stage onto one core (measured: 3-gram shingling of sf0.1
    documents 3.1 s serial → 2.2 s fanned). On production layouts with
    enough scan partitions this is a no-op.

    Measured guidance (sf0.1, local[32]): use it for per-row Python work
    that dominates the stage (shingling: pruned jaccard −22%, minhash
    −13%); do NOT use it in front of a single BLAS matmul over Arrow
    (sign-LSH signatures, IVF assign) — one big Arrow batch beats 32 tiny
    ones, +0.9 s measured each, and the same held for the 64-vote simhash
    partial agg."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if df.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def ld_docs(spark: SparkSession, sf_dir: str,
            py: bool = False) -> DataFrame:
    """Load ``documents`` for text-payload consumers (shingling, BM25,
    quality UDFs): rows whose ``text`` is NULL are dropped at the scan.

    Degenerate-input contract (round 9): a corrupted shard at 100 TB can
    carry full row counts with NULL payloads; a NULL-text document has no
    shingles/tokens and cannot participate in text-keyed work, so the
    contract is to skip it — not to crash a pandas UDF with a NoneType.
    The filter is an IsNotNull pushed into the parquet scan (free), and a
    no-op on the real fixtures (no NULL text exists), so oracle parity is
    unchanged. ``py=True`` uses the :func:`ld_py` fan-out for row-heavy
    UDF stages."""
    base = ld_py(spark, sf_dir, "documents") if py \
        else ld(spark, sf_dir, "documents")
    return base.filter(F.col("text").isNotNull())


def ld_vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load ``embeddings`` for vector-math consumers: rows whose
    ``embedding`` array is NULL are dropped at the scan. Same corrupted-
    shard contract as :func:`ld_docs` — a NULL vector cannot be scored,
    stacked, or quantized, and letting it reach ``np.array(...tolist())``
    yields an object matrix and a deep AxisError. Vectors carrying a
    NaN/±Inf or |x| > 1e6 component are equally corrupt (no real
    embedding has them; one such component poisons every BLAS dot it
    touches and overflows the exact decimal covariance sums) and drop
    too. No-op on the real fixtures; both predicates reach the scan."""
    bad = F.exists("embedding",
                   lambda x: F.isnan(x) | (F.abs(x) > F.lit(1e6)))
    return (ld(spark, sf_dir, "embeddings")
            .filter(F.col("embedding").isNotNull() & ~bad))


#: DuckDB mirror of the :func:`ld_vecs_dir` zero-norm clause — appended
#: to a cosine-scoring oracle's vector filter (alias the column as the
#: oracle's scope requires).
VEC_DIR_SQL = ("list_dot_product({e}::DOUBLE[], {e}::DOUBLE[]) > 0")


def ld_vecs_dir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional variant of :func:`ld_vecs` for COSINE-scoring
    consumers (brute-force/IVF rerank, cosine pair dedup, triplet
    margins, the unit-vector PQ convention): additionally drops
    ZERO-NORM vectors. A zero vector has no direction — cosine against
    it is 0/0, which Spark/numpy propagate as NaN (poisoning desc sorts,
    where Spark ranks NaN above every real score) while DuckDB's
    ``list_cosine_similarity`` clamps — so the corrupted-shard contract
    (r12, poisoned-fixture parity) is to exclude them from directional
    scoring, exactly as NULL/non-finite vectors are excluded from all
    vector math. L2/centroid consumers (k-means, covariance, PCA,
    int8 quantize) keep plain :func:`ld_vecs`: a zero vector is a
    legitimate point in THOSE spaces. The predicate is one Catalyst
    ``aggregate`` over the array — no UDF; DuckDB mirror:
    ``VEC_DIR_SQL``."""
    nz = F.expr(
        "aggregate(embedding, CAST(0.0 AS DOUBLE),"
        " (s, x) -> s + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) > 0")
    return ld_vecs(spark, sf_dir).filter(nz)


def _dsum(expr) -> F.Column:
    """Exact, order-independent sum of a double money expression.

    Per-row cast at scale 6 recovers the *true* decimal value (money inputs
    carry ≤6 decimal digits and row magnitudes keep double error below 1e-10,
    so nearest-rounding at scale 6 is identical in both engines), the decimal
    sum is exact and order-independent, and the result stays DECIMAL(38,6) —
    no decimal downscale (DuckDB truncates there where Spark rounds half-up)
    and no int128→double conversion (lossy in DuckDB past 2^53).
    """
    return F.sum(expr.cast(DEC))


def _dsumd(expr) -> F.Column:
    """`_dsum` emitted as a portable double: the exact decimal sum is
    identical in both engines, so the single decimal→double rounding is
    bitwise identical too. Use for every *emitted* money sum (the driver's
    pandas canonicalization hash-mismatches raw Decimal columns)."""
    return _dsum(expr).cast("double")


def _davg(expr) -> F.Column:
    """Exact-decimal-sum ÷ count as a portable double. The sum-as-double is
    exact while the scaled sum stays under 2^53 (true at the sf0.01
    correctness scale); the division operands are then bitwise identical."""
    return F.sum(expr.cast(DEC)).cast("double") / F.count(F.lit(1))


def _fmt_ts(col) -> F.Column:
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


def pair_explode(array_col: str) -> F.Column:
    """All ordered pairs (a, b) with a before b from a SORTED array
    column — the per-row pair-generation rewrite that replaces a
    self-join when co-membership sets are small (audience overlap,
    market baskets). Returns an array<struct<a,b>> to explode."""
    return F.expr(
        f"flatten(transform({array_col}, (a, i) -> "
        f"  transform(slice({array_col}, i + 2, size({array_col})), "
        f"            b -> struct(a, b))))")


ORACLE_STREAMING_INTERVAL_JOIN = """
SELECT p.event_id AS purchase_id, c.event_id AS click_id,
       p.user_id AS user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS p_ts_s,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS c_ts_s
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
"""


# Corrupted-shard bounds for the events feed (poisoned-values contract).
# A metric value that is NaN/±Inf or |v| ≥ 1e15 cannot be a real
# measurement, and the exact-sum protocol's DECIMAL(28,6) cast is
# ANSI-fatal on such doubles — one poisoned row would abort every money
# aggregation in the job. An event time outside the validity window is
# clock-reset (epoch-zero) / far-future corruption — one such row
# inflates every sequence()-densified event-time grid by decades and
# turns the linear imputation windows quadratic (measured: a single
# 1970 + 2199 pair hung events_linear_interp_daily for 25+ minutes).
EVENT_VALUE_SANE = 1e15
EVENT_TIME_VALID = ("1990-01-01", "2100-01-01")


def sanitize_events(df: DataFrame) -> DataFrame:
    """Apply the corrupted-shard contract to an events frame: non-finite
    or absurd ``value`` → NULL (SQL aggregates skip it — identical
    semantics in DuckDB), rows with out-of-validity ``ts`` drop (NULL ts
    stays; the NULL-payload contract covers it). Streaming-safe (pure
    filter + projection). No-op on the real fixtures, so oracle parity
    is unchanged; pinned by TestPoisonedValuesContract."""
    v = F.col("value")
    clean_v = (F.when(F.isnan(v) | (F.abs(v) >= F.lit(EVENT_VALUE_SANE)),
                      F.lit(None).cast("double"))
               .otherwise(v))
    ok_ts = F.col("ts").isNull() | (
        (F.col("ts") >= F.lit(EVENT_TIME_VALID[0]).cast("timestamp"))
        & (F.col("ts") < F.lit(EVENT_TIME_VALID[1]).cast("timestamp")))
    return df.filter(ok_ts).withColumn("value", clean_v)


def normalize_event_ts(df: DataFrame, stored_ts) -> DataFrame:
    """The ONE physical-ts decode rule (shared by the batch loader and
    the streaming reader — r9 self-review: the two copies could silently
    diverge): TIMESTAMP(NANOS) arrives as long under the legacy flag and
    is rebuilt via exact integer ns→µs division; TIMESTAMP(MICROS)
    arrives as TIMESTAMP_NTZ and is cast (UTC session → identical wall
    clock)."""
    from pyspark.sql.types import LongType

    if isinstance(stored_ts, LongType):
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize the fixture's event-time column to a session-zoned (UTC)
    TIMESTAMP regardless of how the parquet stores it: TIMESTAMP(NANOS)
    arrives as long under the legacy flag and is rebuilt via exact integer
    ns→µs division; TIMESTAMP(MICROS) arrives as TIMESTAMP_NTZ and is cast
    (UTC session → identical wall clock). Downstream operators see one
    type, already passed through :func:`sanitize_events`."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    return sanitize_events(
        normalize_event_ts(raw, raw.schema["ts"].dataType))


# ---------------------------------------------------------------------------
# TPC-H-style analytical queries
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1: scan-heavy groupBy with 8 aggregates; AQE coalesces the
    single shuffle. Filter and 7-column projection push into the parquet scan.
    """
    l = ld(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsumd(F.col("l_quantity")).alias("sum_qty"),
            _dsumd(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsumd(disc_price).alias("sum_disc_price"),
            _dsumd(charge).alias("sum_charge"),
            _davg(F.col("l_quantity")).alias("avg_qty"),
            _davg(F.col("l_extendedprice")).alias("avg_price"),
            _davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


ORACLE_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3: 3-way join, revenue agg, top-10. customer is small → Catalyst
    broadcasts it; only lineitem⋈orders shuffles, and AQE sizes it."""
    c = ld(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = ld(spark, sf_dir, "orders", fanout=False).filter(
        F.col("o_orderdate") < "1996-06-30")
    l = ld(spark, sf_dir, "lineitem", fanout=False).filter(
        F.col("l_shipdate") > "1996-06-30")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsumd(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("revenue"))
        .select("l_orderkey", _fmt_ts("o_orderdate").alias("o_orderdate"),
                "o_orderpriority", "revenue")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


ORACLE_Q3 = """
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
       o_orderpriority,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)))
            AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-06-30'
  AND l_shipdate > TIMESTAMP '1996-06-30'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_nation_revenue(spark, sf_dir):
    """TPC-H Q5 adapted: 6-table star join. All dims broadcast; the single
    big shuffle is lineitem⋈orders."""
    r = ld(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = ld(spark, sf_dir, "nation")
    c = ld(spark, sf_dir, "customer")
    s = ld(spark, sf_dir, "supplier")
    o = ld(spark, sf_dir, "orders", fanout=False).filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01"))
    l = ld(spark, sf_dir, "lineitem", fanout=False)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .filter(c.c_nationkey == s.s_nationkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_dsumd(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


ORACLE_Q5 = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: pure scan-filter-aggregate; everything pushes to parquet."""
    l = ld(spark, sf_dir, "lineitem")
    return (
        l.filter((F.col("l_shipdate") >= "1996-01-01")
                 & (F.col("l_shipdate") < "1997-01-01")
                 & (F.col("l_discount") >= 0.03) & (F.col("l_discount") <= 0.05)
                 & (F.col("l_quantity") < 24))
        .agg(_dsumd(F.col("l_extendedprice") * F.col("l_discount"))
             .alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


ORACLE_Q6 = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6)))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.03 AND l_discount <= 0.05 AND l_quantity < 24
"""


def q10_returned_items(spark, sf_dir):
    """TPC-H Q10: returned-item revenue per customer, top-20."""
    c = ld(spark, sf_dir, "customer")
    o = ld(spark, sf_dir, "orders", fanout=False).filter(
        (F.col("o_orderdate") >= "1996-10-01") & (F.col("o_orderdate") < "1997-01-01"))
    l = ld(spark, sf_dir, "lineitem", fanout=False).filter(
        F.col("l_returnflag") == "R")
    n = ld(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_mktsegment")
        .agg(_dsumd(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


ORACLE_Q10 = """
SELECT c_custkey, c_name, n_name, c_mktsegment,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)))
            AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, n_name, c_mktsegment
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q18_large_orders(spark, sf_dir):
    """TPC-H Q18: agg-subquery semi-join (orders whose total quantity > 300)."""
    l = ld(spark, sf_dir, "lineitem", fanout=False)
    big = (l.groupBy("l_orderkey")
           .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("total_qty"))
           .filter(F.col("total_qty") > 300))
    o = ld(spark, sf_dir, "orders", fanout=False)
    c = ld(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey",
                _fmt_ts("o_orderdate").alias("o_orderdate"),
                F.col("total_qty").cast("double").alias("total_qty"))
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(50)
    )


ORACLE_Q18 = """
WITH big AS (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(28,6))) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(28,6))) > 300
)
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
       CAST(total_qty AS DOUBLE) AS total_qty
FROM big JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey
LIMIT 50
"""


# ---------------------------------------------------------------------------
# Scans / filters / projections
# ---------------------------------------------------------------------------

def scan_filter_projection(spark, sf_dir):
    """Raw predicate + projection; both the filter and the 3-column read
    schema reach the parquet scan (verify with .explain: PushedFilters)."""
    l = ld(spark, sf_dir, "lineitem")
    return (l.filter((F.col("l_quantity") > 45) & (F.col("l_discount") < 0.02)
                     & F.col("l_returnflag").isin("A", "R"))
            .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount"))


ORACLE_SCAN = """
SELECT l_orderkey, l_linenumber, l_quantity, l_discount
FROM lineitem
WHERE l_quantity > 45 AND l_discount < 0.02 AND l_returnflag IN ('A','R')
"""


def filter_null_safe(spark, sf_dir):
    """Null-handling predicate battery: isNull / null-safe equality / between."""
    e = load_events(spark, sf_dir)
    return (e.filter(F.col("value").between(5, 10)
                     & F.col("event_type").eqNullSafe("click"))
            .select("event_id", "user_id", "value"))


ORACLE_FILTER_NULLSAFE = """
SELECT event_id, user_id, value
FROM events
WHERE value BETWEEN 5 AND 10 AND event_type IS NOT DISTINCT FROM 'click'
"""


# ---------------------------------------------------------------------------
# Joins — every type
# ---------------------------------------------------------------------------

def join_inner_broadcast(spark, sf_dir):
    """Inner equi-join, dim side explicitly broadcast."""
    o = ld(spark, sf_dir, "orders")
    c = ld(spark, sf_dir, "customer")
    return (o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "inner")
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 _dsumd(F.col("o_totalprice")).alias("total_price")))


ORACLE_JOIN_INNER = """
SELECT c_mktsegment, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def join_left_outer(spark, sf_dir):
    """Left outer join preserving customers with zero orders."""
    c = ld(spark, sf_dir, "customer")
    o = ld(spark, sf_dir, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left")
            .groupBy("c_custkey")
            .agg(F.count("o_orderkey").alias("n_orders"))
            .filter(F.col("n_orders") <= 2))


ORACLE_JOIN_LEFT = """
SELECT c_custkey, COUNT(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
HAVING COUNT(o_orderkey) <= 2
"""


def join_semi(spark, sf_dir):
    """Left semi: customers that placed at least one 1-URGENT order."""
    c = ld(spark, sf_dir, "customer")
    o = ld(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_semi")
            .select("c_custkey", "c_mktsegment"))


ORACLE_JOIN_SEMI = """
SELECT c_custkey, c_mktsegment
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
"""


def join_anti(spark, sf_dir):
    """Left anti: customers with no orders at all."""
    c = ld(spark, sf_dir, "customer")
    o = ld(spark, sf_dir, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
            .select("c_custkey", "c_name"))


ORACLE_JOIN_ANTI = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
"""


def join_full_outer(spark, sf_dir):
    """Full outer join of per-nation customer and supplier counts."""
    c = (ld(spark, sf_dir, "customer").groupBy("c_nationkey")
         .agg(F.count(F.lit(1)).alias("n_customers")))
    s = (ld(spark, sf_dir, "supplier").groupBy("s_nationkey")
         .agg(F.count(F.lit(1)).alias("n_suppliers")))
    return (c.join(s, c.c_nationkey == s.s_nationkey, "full")
            .select(F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
                    F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
                    F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers")))


ORACLE_JOIN_FULL = """
WITH c AS (SELECT c_nationkey, COUNT(*) AS n_customers FROM customer GROUP BY c_nationkey),
     s AS (SELECT s_nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY s_nationkey)
SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
       COALESCE(n_customers, 0) AS n_customers,
       COALESCE(n_suppliers, 0) AS n_suppliers
FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
"""


def join_cross(spark, sf_dir):
    """Cross join of two tiny dims (region × order statuses)."""
    r = ld(spark, sf_dir, "region").select("r_name")
    st = ld(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(st)


ORACLE_JOIN_CROSS = """
SELECT r_name, o_orderstatus
FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) AS st
"""


def join_range_nonequi(spark, sf_dir):
    """Non-equi (theta) join: classify parts into size bands. The band table
    is tiny → broadcast nested loop, which is the right plan."""
    bands = spark.createDataFrame(
        [(1, 0, 15), (2, 15, 30), (3, 30, 51)],
        "band_id int, lo int, hi int")
    p = ld(spark, sf_dir, "part")
    return (p.join(F.broadcast(bands),
                   (p.p_size > bands.lo) & (p.p_size <= bands.hi))
            .groupBy("band_id").agg(F.count(F.lit(1)).alias("n_parts")))


ORACLE_JOIN_RANGE = """
SELECT band_id, COUNT(*) AS n_parts
FROM part
JOIN (VALUES (1,0,15),(2,15,30),(3,30,51)) AS bands(band_id, lo, hi)
  ON p_size > lo AND p_size <= hi
GROUP BY band_id
"""


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------

def agg_distinct_counts(spark, sf_dir):
    """COUNT(DISTINCT) — exact distinct aggregation with a group key."""
    o = ld(spark, sf_dir, "orders")
    return (o.groupBy("o_orderpriority")
            .agg(F.countDistinct("o_custkey").alias("n_distinct_customers"),
                 F.count(F.lit(1)).alias("n_orders")))


ORACLE_AGG_DISTINCT = """
SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_distinct_customers,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_orderpriority
"""


def agg_rollup(spark, sf_dir):
    """ROLLUP over (returnflag, linestatus) with exact-decimal revenue."""
    l = ld(spark, sf_dir, "lineitem")
    return (l.rollup("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 _dsumd(F.col("l_extendedprice")).alias("total_price")))


ORACLE_AGG_ROLLUP = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def agg_cube(spark, sf_dir):
    """CUBE over (orderpriority, orderstatus)."""
    o = ld(spark, sf_dir, "orders")
    return (o.cube("o_orderpriority", "o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n")))


ORACLE_AGG_CUBE = """
SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


def agg_grouping_sets(spark, sf_dir):
    """GROUPING SETS via the SQL surface (engine exposes both APIs)."""
    ld(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql("""
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """)


ORACLE_AGG_GROUPING_SETS = """
SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
FROM orders GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
"""


def agg_stats(spark, sf_dir):
    """min/max/count battery (exact values only)."""
    l = ld(spark, sf_dir, "lineitem")
    return (l.groupBy("l_returnflag")
            .agg(F.min("l_quantity").alias("min_qty"),
                 F.max("l_quantity").alias("max_qty"),
                 F.min("l_shipdate").cast("string").alias("first_ship"),
                 F.max("l_shipdate").cast("string").alias("last_ship"),
                 F.countDistinct("l_partkey").alias("n_parts")))


ORACLE_AGG_STATS = """
SELECT l_returnflag, MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
       strftime(MIN(l_shipdate), '%Y-%m-%d %H:%M:%S') AS first_ship,
       strftime(MAX(l_shipdate), '%Y-%m-%d %H:%M:%S') AS last_ship,
       COUNT(DISTINCT l_partkey) AS n_parts
FROM lineitem GROUP BY l_returnflag
"""


def agg_pivot(spark, sf_dir):
    """Pivot order counts: priorities × status columns."""
    o = ld(spark, sf_dir, "orders")
    statuses = [r[0] for r in
                o.select("o_orderstatus").distinct().orderBy("o_orderstatus").collect()]
    piv = (o.groupBy("o_orderpriority")
           .pivot("o_orderstatus", statuses)
           .agg(F.count(F.lit(1))))
    # normalize names: status values become columns n_<status>
    for s in statuses:
        piv = piv.withColumnRenamed(s, f"n_{s.lower()}")
        piv = piv.withColumn(f"n_{s.lower()}",
                             F.coalesce(F.col(f"n_{s.lower()}"), F.lit(0)))
    return piv


ORACLE_AGG_PIVOT = """
SELECT o_orderpriority,
       COUNT(*) FILTER (o_orderstatus = 'F') AS n_f,
       COUNT(*) FILTER (o_orderstatus = 'O') AS n_o,
       COUNT(*) FILTER (o_orderstatus = 'P') AS n_p
FROM orders GROUP BY o_orderpriority
"""


def case_when_bucketing(spark, sf_dir):
    """CASE WHEN routing into balance buckets (converter-style routing logic
    applied to rows — cf. snowflake_converter.py:433-464 table router)."""
    c = ld(spark, sf_dir, "customer")
    bucket = (F.when(F.col("c_acctbal") < 0, "negative")
              .when(F.col("c_acctbal") < 5000, "low")
              .when(F.col("c_acctbal") < 8000, "mid")
              .otherwise("high"))
    return (c.select(bucket.alias("balance_bucket"))
            .groupBy("balance_bucket").agg(F.count(F.lit(1)).alias("n")))


ORACLE_CASE_WHEN = """
SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
            WHEN c_acctbal < 5000 THEN 'low'
            WHEN c_acctbal < 8000 THEN 'mid'
            ELSE 'high' END AS balance_bucket,
       COUNT(*) AS n
FROM customer GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------

def window_topk_per_group(spark, sf_dir):
    """Top-3 orders per customer by price; row_number with unique tiebreak."""
    o = ld(spark, sf_dir, "orders", fanout=False)
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"),
                                                "o_orderkey")
    return (o.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select("o_custkey", "o_orderkey", "o_totalprice", "rn"))


ORACLE_WINDOW_TOPK = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) WHERE rn <= 3
"""


def window_rank_dense(spark, sf_dir):
    """rank vs dense_rank on part price within brand (ties exercised)."""
    p = ld(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"),
                                              "p_partkey")
    return (p.select("p_brand", "p_partkey",
                     F.rank().over(w).alias("price_rank"),
                     F.dense_rank().over(w).alias("price_dense_rank"))
            .filter(F.col("price_rank") <= 5))


ORACLE_WINDOW_RANK = """
SELECT p_brand, p_partkey, price_rank, price_dense_rank FROM (
  SELECT p_brand, p_partkey,
         RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS price_rank,
         DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS price_dense_rank
  FROM part) WHERE price_rank <= 5
"""


def window_lag_lead(spark, sf_dir):
    """lag/lead over event time per user — microsecond-exact gaps."""
    e = load_events(spark, sf_dir)
    # asc_nulls_last: Spark orders NULLs FIRST by default, DuckDB LAST —
    # on a corrupted shard with NULL event-times the sequence positions
    # (hence every lag/lead value) diverge between the engines unless
    # the order is pinned explicitly (r9 corrupted-events sweep; the
    # NULL-ordering alignment recipe for the sequence entries)
    w = Window.partitionBy("user_id").orderBy(
        F.asc_nulls_last("ts"), "event_id")
    return (e.select("user_id", "event_id",
                     (F.unix_micros("ts")
                      - F.lag(F.unix_micros("ts")).over(w)).alias("gap_us"),
                     F.lead("event_type").over(w).alias("next_type"))
            .filter(F.col("user_id") < 10))


ORACLE_WINDOW_LAG = """
SELECT user_id, event_id,
       epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us,
       LEAD(event_type) OVER w AS next_type
FROM events
WHERE user_id < 10
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def window_running_sum(spark, sf_dir):
    """Cumulative per-user value: frame-ordered decimal sum (exact)."""
    e = load_events(spark, sf_dir)
    # asc_nulls_last: see window_lag_lead (NULL-ordering alignment)
    w = (Window.partitionBy("user_id")
         .orderBy(F.asc_nulls_last("ts"), "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (e.filter(F.col("user_id") < 5)
            .select("user_id", "event_id",
                    F.sum(F.col("value").cast(DEC)).over(w).cast("double")
                    .alias("running_value")))


ORACLE_WINDOW_RUNNING = """
SELECT user_id, event_id,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER
            (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
       AS running_value
FROM events WHERE user_id < 5
"""


def window_ntile_percent(spark, sf_dir):
    """ntile + exact percent_rank via the BUILT-IN un-partitioned window,
    demonstrated over a deliberately bounded slice: the ``c_custkey <=
    200`` filter is applied BEFORE the window (it reaches the parquet
    scan as a pushed filter — plan-pinned in tests/test_plans.py), so
    the one-task WindowExec only ever sees 200 rows regardless of table
    scale. The r6 verdict flagged the previous shape (filter AFTER
    NTILE → the global window serialized the whole customer table
    through one task at 100×); the full-table variant of this query is
    ``scale.window_ntile_scalable``, which rides the range-partitioned
    ``global_ranks`` prefix scan and shares no single-task stage."""
    c = ld(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    w = Window.orderBy(F.desc("c_acctbal"), "c_custkey")
    return c.select("c_custkey",
                    F.ntile(4).over(w).alias("balance_quartile"),
                    F.percent_rank().over(w).alias("pct_rank"))


ORACLE_WINDOW_NTILE_BOUNDED = """
SELECT c_custkey,
       NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS balance_quartile,
       PERCENT_RANK() OVER (ORDER BY c_acctbal DESC, c_custkey) AS pct_rank
FROM customer WHERE c_custkey <= 200
"""

ORACLE_WINDOW_NTILE = """
SELECT c_custkey, balance_quartile, pct_rank FROM (
  SELECT c_custkey,
         NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS balance_quartile,
         PERCENT_RANK() OVER (ORDER BY c_acctbal DESC, c_custkey) AS pct_rank
  FROM customer) WHERE c_custkey <= 200
"""


# ---------------------------------------------------------------------------
# Sorts / limits / set ops / dedup
# ---------------------------------------------------------------------------

def sort_limit_topk(spark, sf_dir):
    """Global top-K → Catalyst TakeOrderedAndProject (no full sort)."""
    l = ld(spark, sf_dir, "lineitem")
    return (l.orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
            .select("l_orderkey", "l_linenumber", "l_extendedprice")
            .limit(15))


ORACLE_SORT_TOPK = """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 15
"""


def set_union_all(spark, sf_dir):
    """UNION ALL + aggregation over the union."""
    c = ld(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("kind"))
    s = ld(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("kind"))
    return (c.unionByName(s).groupBy("nationkey", "kind")
            .agg(F.count(F.lit(1)).alias("n")))


ORACLE_SET_UNION = """
SELECT nationkey, kind, COUNT(*) AS n FROM (
  SELECT c_nationkey AS nationkey, 'customer' AS kind FROM customer
  UNION ALL
  SELECT s_nationkey AS nationkey, 'supplier' AS kind FROM supplier
) GROUP BY nationkey, kind
"""


def set_intersect(spark, sf_dir):
    """INTERSECT: nations having both customers and suppliers."""
    c = ld(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = ld(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


ORACLE_SET_INTERSECT = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
"""


def set_except(spark, sf_dir):
    """EXCEPT: nations with customers but no suppliers."""
    c = ld(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = ld(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s).distinct()


ORACLE_SET_EXCEPT = """
SELECT DISTINCT nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  EXCEPT ALL
  SELECT s_nationkey FROM supplier)
"""


def set_intersect_all(spark, sf_dir):
    """INTERSECT ALL (bag semantics): multiplicity = min of the two sides'
    counts — made visible by aggregating the surviving bag."""
    c = ld(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = ld(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return (c.intersectAll(s).groupBy("nationkey")
            .agg(F.count(F.lit(1)).alias("n")))


ORACLE_SET_INTERSECT_ALL = """
SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n FROM (
  SELECT c_nationkey AS nationkey FROM customer
  INTERSECT ALL
  SELECT s_nationkey FROM supplier
) GROUP BY nationkey
"""


def set_except_all(spark, sf_dir):
    """EXCEPT ALL (bag semantics): per-key surplus of customers over
    suppliers, aggregated so the multiplicities are checkable."""
    c = ld(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = ld(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return (c.exceptAll(s).groupBy("nationkey")
            .agg(F.count(F.lit(1)).alias("n")))


ORACLE_SET_EXCEPT_ALL = """
SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n FROM (
  SELECT c_nationkey AS nationkey FROM customer
  EXCEPT ALL
  SELECT s_nationkey FROM supplier
) GROUP BY nationkey
"""


def distinct_pairs(spark, sf_dir):
    """dropDuplicates as a relational operator."""
    l = ld(spark, sf_dir, "lineitem")
    return l.select("l_returnflag", "l_linestatus").dropDuplicates()


ORACLE_DISTINCT = """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
"""


# ---------------------------------------------------------------------------
# Scalar function batteries
# ---------------------------------------------------------------------------

def scalar_string_fns(spark, sf_dir):
    """upper/lower/substring/length/trim/concat/replace/regexp — the string
    surface the reference uses driver-side (converter.py:313-353), exposed
    as row-plane Catalyst expressions."""
    p = ld(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_devoweled"),
        F.regexp_extract("p_type", r"^(\w+)", 1).alias("type_first_word"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_token0"),
        F.translate("p_brand", "#", "-").alias("brand_dashed"),
    )


ORACLE_SCALAR_STRING = """
SELECT p_partkey,
       UPPER(p_name) AS name_upper,
       LOWER(p_brand) AS brand_lower,
       SUBSTRING(p_name, 1, 8) AS name_prefix,
       LENGTH(p_name) AS name_len,
       CONCAT_WS('|', p_brand, p_type) AS brand_type,
       REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS name_devoweled,
       REGEXP_EXTRACT(p_type, '^(\\w+)', 1) AS type_first_word,
       STRING_SPLIT(p_type, ' ')[1] AS type_token0,
       REPLACE(p_brand, '#', '-') AS brand_dashed
FROM part WHERE p_partkey <= 500
"""


def scalar_date_fns(spark, sf_dir):
    """year/month/day/dayofweek/date_trunc/datediff battery (all exact)."""
    o = ld(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        _fmt_ts(F.date_trunc("month", "o_orderdate")).alias("month_start"),
        F.datediff(F.lit("1998-12-31").cast("date"),
                   F.col("o_orderdate").cast("date")).alias("days_to_eoy"),
    )


ORACLE_SCALAR_DATE = """
SELECT o_orderkey,
       EXTRACT(year FROM o_orderdate) AS order_year,
       EXTRACT(month FROM o_orderdate) AS order_month,
       EXTRACT(day FROM o_orderdate) AS order_day,
       EXTRACT(quarter FROM o_orderdate) AS order_quarter,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d %H:%M:%S') AS month_start,
       date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_eoy
FROM orders WHERE o_orderkey <= 1000
"""


def scalar_math_fns(spark, sf_dir):
    """abs/round/ceil/floor/sqrt/sign/greatest/least/mod (IEEE-exact set;
    transcendentals excluded by design — see module docstring)."""
    c = ld(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 300)
    return c.select(
        "c_custkey",
        F.abs("c_acctbal").alias("abs_bal"),
        F.round("c_acctbal", 1).alias("bal_round1"),
        F.ceil("c_acctbal").alias("bal_ceil"),
        F.floor("c_acctbal").alias("bal_floor"),
        F.sqrt(F.abs("c_acctbal")).alias("bal_sqrt"),
        F.signum("c_acctbal").alias("bal_sign"),
        F.greatest("c_acctbal", F.lit(0.0)).alias("bal_or_zero"),
        (F.col("c_custkey") % 7).alias("key_mod7"),
    )


ORACLE_SCALAR_MATH = """
SELECT c_custkey,
       ABS(c_acctbal) AS abs_bal,
       ROUND(c_acctbal, 1) AS bal_round1,
       CAST(CEIL(c_acctbal) AS BIGINT) AS bal_ceil,
       CAST(FLOOR(c_acctbal) AS BIGINT) AS bal_floor,
       SQRT(ABS(c_acctbal)) AS bal_sqrt,
       CAST(SIGN(c_acctbal) AS DOUBLE) AS bal_sign,
       GREATEST(c_acctbal, 0.0) AS bal_or_zero,
       c_custkey % 7 AS key_mod7
FROM customer WHERE c_custkey <= 300
"""


def scalar_json_fns(spark, sf_dir):
    """JSON extraction from the events props column."""
    e = load_events(spark, sf_dir).filter(F.col("event_id") < 2000)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
    )


ORACLE_SCALAR_JSON = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k
FROM events WHERE event_id < 2000
"""


# ---------------------------------------------------------------------------
# Event-time (batch twin of the streaming pipeline in streaming/events.py)
# ---------------------------------------------------------------------------

def events_tumbling_hourly(spark, sf_dir):
    """Tumbling 1-hour windows per event type — the batch twin of the
    Structured Streaming aggregation (streaming/events.py)."""
    e = load_events(spark, sf_dir)
    return (e.groupBy(F.date_trunc("hour", "ts").alias("hour_start"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 _dsumd(F.col("value")).alias("total_value"))
            .select(_fmt_ts("hour_start").alias("hour_start"), "event_type",
                    "n_events", "total_value"))


ORACLE_EVENTS_HOURLY = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
       event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
"""


def events_sessionize(spark, sf_dir):
    """Sessionization: 30-minute inactivity gap → session ids per user
    (lag + cumulative flag sum), then per-user session stats."""
    e = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.asc_nulls_last("ts"), "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    new_session = F.when(gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1) \
                   .otherwise(0)
    sessions = (e.withColumn("session_seq",
                             F.sum(new_session).over(wrun)))
    return (sessions.groupBy("user_id")
            .agg(F.max("session_seq").alias("n_sessions"),
                 F.count(F.lit(1)).alias("n_events")))


ORACLE_EVENTS_SESSIONIZE = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w IS NULL
               OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 30*60*1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, event_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS session_seq
  FROM flagged
)
SELECT user_id, CAST(MAX(session_seq) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM numbered GROUP BY user_id
"""


def unpivot_nation_metrics(spark, sf_dir):
    """Wide→long reshape (melt): per-nation customer metrics computed wide
    (one agg pass), then ``DataFrame.unpivot`` — the inverse of agg_pivot
    and the other half of the reshape surface. Unpivot is a zero-shuffle
    projection (each input row explodes to one row per metric in place),
    so the only exchange is the upstream aggregation's."""
    c = ld(spark, sf_dir, "customer")
    wide = (c.groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).cast("double").alias("n_customers"),
                 _dsumd(F.col("c_acctbal")).alias("total_acctbal"),
                 F.max("c_acctbal").alias("max_acctbal")))
    return (wide.unpivot(
                ids=["c_nationkey"],
                values=["n_customers", "total_acctbal", "max_acctbal"],
                variableColumnName="metric",
                valueColumnName="value")
            .orderBy("c_nationkey", "metric"))


ORACLE_UNPIVOT = """
WITH wide AS (
  SELECT c_nationkey,
         CAST(COUNT(*) AS DOUBLE) AS n_customers,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE)
           AS total_acctbal,
         MAX(c_acctbal) AS max_acctbal
  FROM customer GROUP BY c_nationkey)
SELECT c_nationkey, metric, value FROM (
  SELECT c_nationkey, 'n_customers' AS metric, n_customers AS value FROM wide
  UNION ALL
  SELECT c_nationkey, 'total_acctbal', total_acctbal FROM wide
  UNION ALL
  SELECT c_nationkey, 'max_acctbal', max_acctbal FROM wide)
ORDER BY c_nationkey, metric
"""


def scalar_regex_fns(spark, sf_dir):
    """Regex battery over part names: extract / replace / match / count.
    Patterns stay within the character-class + quantifier subset where
    Java regex (Spark) and RE2 (DuckDB) agree — no backrefs, no
    lookaround (engine-divergent features are a documented non-goal)."""
    p = ld(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", "([a-z]+)$", 1).alias("last_word"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("no_vowels"),
        F.col("p_name").rlike("^[a-z]+ ").alias("starts_word"),
        F.size(F.split("p_name", "[aeiou]+")).alias("vowel_runs_plus1"),
    ).orderBy("p_partkey")


ORACLE_SCALAR_REGEX = """
SELECT p_partkey,
       regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
       regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels,
       regexp_matches(p_name, '^[a-z]+ ') AS starts_word,
       CAST(len(regexp_split_to_array(p_name, '[aeiou]+')) AS INT)
         AS vowel_runs_plus1
FROM part WHERE p_partkey <= 500 ORDER BY p_partkey
"""


def scalar_variant_fns(spark, sf_dir):
    """Spark 4 VARIANT battery: build a JSON document from event columns,
    parse it to a VARIANT, and extract typed scalars back out with JSON
    paths (incl. a nested field and the raw props column).

    Narrative tie-in: the reference degrades Snowflake VARIANT columns to
    STRING with a critical EWI (SURVEY.md §1.2) because Iceberg-compatible
    targets lacked the type — Spark 4's native VariantType is the
    engine-side answer, and the oracle computes the same scalars directly
    from the source columns, so a hash match proves the
    construct→parse→extract roundtrip is value-exact (doubles included)."""
    e = load_events(spark, sf_dir).filter(F.col("event_id") < 2000)
    doc = F.to_json(F.struct(
        F.col("event_type").alias("t"),
        F.col("user_id").alias("u"),
        F.struct(F.col("value").alias("v")).alias("nested")))
    v = F.parse_json(doc)
    return e.select(
        "event_id",
        F.try_variant_get(v, "$.t", "string").alias("t"),
        F.try_variant_get(v, "$.u", "long").alias("u"),
        F.try_variant_get(v, "$.nested.v", "double").alias("vv"),
        # try_parse_json: props is UNTRUSTED input — a corrupted shard's
        # empty/malformed JSON must yield NULL, not a parse abort
        # (poisoned-values contract); the constructed doc above stays on
        # strict parse_json (we built it, malformed = our bug, fail loud)
        F.try_variant_get(F.try_parse_json("props"), "$.k", "int")
        .alias("k"),
    ).orderBy("event_id")


ORACLE_SCALAR_VARIANT = """
SELECT event_id, event_type AS t, user_id AS u, value AS vv,
       CAST(json_extract(props, '$.k') AS INT) AS k
FROM events WHERE event_id < 2000 ORDER BY event_id
"""


def agg_string_concat(spark, sf_dir):
    """Ordered string aggregation (listagg WITHIN GROUP — Spark 4):
    per-nation roster of the lowest-keyed customer names. The explicit
    WITHIN GROUP ordering is what makes a concatenative aggregate
    deterministic under distributed row order — an unordered collect_list
    would be shuffle-order-dependent and unverifiable."""
    c = ld(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 60)
    c.createOrReplaceTempView("cust_la")
    return spark.sql("""
        SELECT c_nationkey,
               listagg(c_name, '|') WITHIN GROUP (ORDER BY c_custkey)
                 AS roster,
               COUNT(*) AS n
        FROM cust_la GROUP BY c_nationkey ORDER BY c_nationkey
    """)


ORACLE_AGG_STRING_CONCAT = """
SELECT c_nationkey,
       STRING_AGG(c_name, '|' ORDER BY c_custkey) AS roster,
       COUNT(*) AS n
FROM customer WHERE c_custkey <= 60
GROUP BY c_nationkey ORDER BY c_nationkey
"""


def scalar_xml_fns(spark, sf_dir):
    """XPath battery: build an XML fragment per event and extract typed
    values back out with xpath_string / xpath_long / xpath_double.

    Narrative tie-in: DB2 XML columns are UNSUPPORTED in the reference's
    mapping (critical EWI, SURVEY.md §1.2) — the engine-side answer is
    that XML *content* remains queryable in Spark via the native xpath
    expression family. The oracle computes the same scalars from the
    source columns, so a hash match proves the construct→xpath roundtrip
    is value-exact (same protocol as the VARIANT battery).

    The JSON extraction is coalesced to '' so a row whose props lacks
    ``$.k`` degrades to an empty ``<k/>`` element (xpath_int → 0, the
    oracle mirrors with COALESCE) instead of nulling the whole concat —
    and with it t and u — for that row. The user_id gets the same
    treatment (r10, corrupted-events contract): XML has no NULL scalar,
    so a corrupted NULL user serializes as an empty ``<u/>`` and reads
    back as 0 via xpath_long — one corrupted field must never erase the
    row's other extractions."""
    e = load_events(spark, sf_dir).filter(F.col("event_id") < 1500)
    xml = F.concat(F.lit("<e><t>"), F.col("event_type"),
                   F.lit("</t><u>"),
                   F.coalesce(F.col("user_id").cast("string"), F.lit("")),
                   F.lit("</u><k>"),
                   F.coalesce(F.get_json_object("props", "$.k"),
                              F.lit("")),
                   F.lit("</k></e>"))
    return e.select(
        "event_id",
        F.xpath_string(xml, F.lit("/e/t")).alias("t"),
        F.xpath_long(xml, F.lit("/e/u")).alias("u"),
        F.xpath_int(xml, F.lit("/e/k")).alias("k"),
    ).orderBy("event_id")


ORACLE_SCALAR_XML = """
SELECT event_id, event_type AS t, COALESCE(user_id, 0) AS u,
       COALESCE(CAST(json_extract(props, '$.k') AS INT), 0) AS k
FROM events WHERE event_id < 1500 ORDER BY event_id
"""
