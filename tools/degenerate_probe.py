#!/usr/bin/env python
"""Degenerate-input probe: run every registry entry against a corrupted
fixture and classify the outcome under the round-9 degenerate-input
contract (BASELINE.md "empty-input contract"): an entry must either

  * return a well-typed result (possibly empty / NULL-valued), or
  * raise a LOUD ``ValueError`` from the operator itself,

never a deep numpy AxisError / NoneType TypeError / ANSI divide-by-zero
job abort / IndexError out of a pandas UDF.

Fixture modes (all built from ``--base``, default sf0.001, into a temp
dir; keys survive, payloads are corrupted — the shape of a corrupted
shard at 100 TB):

  nullpayload  documents(text/lang/source/n_chars), embeddings
               (embedding/label), events(ts/event_type/value/props)
               all NULL, full row counts. TPC-H tables pass through
               untouched: their entries are pure Catalyst/DuckDB SQL
               whose NULL propagation is already defined; the failure
               surface this probe targets is the Python/pandas-UDF and
               fitter code over the LLM-pipeline tables.
  mixednull    same columns NULL on every other row (odd keys) — NaN-
               contaminated UDF batches rather than empty-after-dropna.
  poisoned     non-NULL but extreme payloads: NaN/±Inf/1e308/0 event
               values, empty-string event types, epoch-1970 / year-2199
               timestamps, zero / NaN-component / Inf-component / 1e30
               vectors, empty / whitespace / single-char / 8k-repeated /
               unicode texts — interleaved with original rows by key.
               The contract here: garbage-in may give NaN-out or a loud
               ValueError, but never a deep crash.
  dupflood     duplicate flood: 60 byte-identical clones of the longest
               document (+20 identical shingle-less short docs), 60
               exact copies of one embedding vector, and 3000 identical
               events under one user — the boilerplate-page / hot-shard
               shape that turns naive posting-list and LSH-bucket
               self-joins quadratic at 100 TB.
  skewed       key skew: 95% of documents under one source, 95% of
               events under one user_id, 95% of embeddings under one
               label, 95% of orders under one custkey and lineitems
               under one suppkey (payloads intact, keys remapped
               deterministically by id % 20) — the hot-key shape AQE
               skew-join and salting exist for.
  nullev       corrupted events: ts NULL on event_id %% 11, user_id NULL
               on %% 13, value NULL on %% 7, all nine other tables
               verbatim (TPC-H via the dispatcher copy loop, documents/
               embeddings in the builder) — the exact rule of
               ``TestStreamingNullContract.nullev_dir``.
               This is the fourth standing adversarial oracle gate
               (round 10): every sequence/window/sessionization entry
               must agree with DuckDB even when event timestamps,
               actors, and payloads go missing — the NULL-ordering and
               NULL-bucket divergence class.
  nulldoc      corrupted documents + embeddings (round 11, the FIFTH
               standing adversarial oracle gate): text NULL on
               doc_id %% 11, text EMPTY STRING on %% 13, source NULL on
               %% 7, lang NULL on %% 5 (n_chars kept VERBATIM — real
               corrupt shards have inconsistent metadata); embedding
               NULL on vec_id %% 9, label NULL on vec_id %% 5. Events
               and the TPC-H tables verbatim. Every corpus / dedup /
               text / ANN / training-prep entry must hash-match DuckDB
               when document text, provenance, and vectors go missing —
               the ld_docs/ld_vecs corrupted-shard contract, made
               explicit in every oracle by the r11 debut sweep's 30
               fixes (list: tests/test_round11.py NULLDOC_ENTRIES).

  nullfact     corrupted TPC-H FACTS (round 12, the SIXTH standing
               adversarial oracle gate): the one data family never
               corrupted before. orders: o_custkey NULL on
               o_orderkey %% 11 (join key), o_orderdate NULL on %% 13,
               o_totalprice NULL on %% 7, plus VERBATIM duplicate rows
               appended for o_orderkey %% 101 == 0 (PK-uniqueness
               violation; deterministic for both engines). lineitem
               (rid = l_orderkey*8 + l_linenumber, computed BEFORE
               corruption): l_orderkey NULL on rid %% 17 (fact→orders
               join key), l_suppkey NULL on rid %% 23, l_shipdate NULL
               on rid %% 13, l_extendedprice NULL on rid %% 7,
               l_quantity NULL on rid %% 19. customer: c_nationkey NULL
               on c_custkey %% 11, c_acctbal NULL on %% 7, c_mktsegment
               NULL on %% 5, plus SAME-KEY-DIFFERENT-PAYLOAD duplicates
               for c_custkey %% 37 == 0 (c_acctbal+1000, '#dup' name —
               the nondeterministic-survivor hazard for any keep-one
               logic that lacks a total tie-break). region/nation/
               supplier/part and the three LLM tables verbatim. Every
               TPC-H-shape / CDC / SCD2 / as-of / analytics entry must
               hash-match DuckDB when join keys, dates, and amounts go
               missing and PKs stop being unique.

The strongest check for the two adversarial modes is ORACLE PARITY, not
mere completion: build the fixture with ``build`` and point the parity
gate at it — every oracle-backed entry must hash-match DuckDB on the
adversarial corpus too:

    python tools/degenerate_probe.py build dupflood /tmp/fx_flood
    python tools/check_oracle_parity.py --sf-dir /tmp/fx_flood

Usage:
    python tools/degenerate_probe.py nullpayload
    python tools/degenerate_probe.py mixednull dedup text   # name filter
    python tools/degenerate_probe.py poisoned
    python tools/degenerate_probe.py dupflood
    python tools/degenerate_probe.py build <mode> <outdir>  # fixture only
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TPCH = ("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem")

# column -> Spark cast type for the NULLed payloads
PAYLOADS = {
    "documents": {"text": "string", "lang": "string", "source": "string",
                  "n_chars": "bigint"},
    "embeddings": {"embedding": "array<float>", "label": "int"},
    "events": {"ts": "timestamp", "event_type": "string",
               "value": "double", "props": "string"},
}
KEYS = {"documents": ["doc_id"], "embeddings": ["vec_id"],
        "events": ["event_id", "user_id"]}


def build_fixture(spark, base: str, out: str, mode: str) -> None:
    from pyspark.sql import functions as F

    if mode == "skewed":
        _build_skewed(spark, base, out)
        return
    for t in TPCH:
        (spark.read.parquet(f"{base}/{t}.parquet")
         .write.mode("overwrite").parquet(f"{out}/{t}.parquet"))
    if mode == "poisoned":
        _build_poisoned(spark, base, out)
        return
    if mode == "dupflood":
        _build_dupflood(spark, base, out)
        return
    if mode == "nullev":
        _build_nullev(spark, base, out)
        return
    if mode == "nulldoc":
        _build_nulldoc(spark, base, out)
        return
    if mode == "nullfact":
        _build_nullfact(spark, base, out)
        return
    for t, cols in PAYLOADS.items():
        df = spark.read.parquet(f"{base}/{t}.parquet")
        key = KEYS[t][0]
        for c, typ in cols.items():
            null = F.lit(None).cast(typ)
            if mode == "nullpayload":
                df = df.withColumn(c, null)
            else:  # mixednull: odd keys lose the payload
                df = df.withColumn(
                    c, F.when(F.col(key) % 2 == 1, null)
                        .otherwise(F.col(c).cast(typ)))
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")


def _build_poisoned(spark, base: str, out: str) -> None:
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{base}/documents.parquet")
    big = " ".join(["tok"] * 2000)
    text = (F.when(F.col("doc_id") % 6 == 0, F.lit(""))
            .when(F.col("doc_id") % 6 == 1, F.lit(" \t\n "))
            .when(F.col("doc_id") % 6 == 2, F.lit("x"))
            .when(F.col("doc_id") % 6 == 3, F.lit(big))
            .when(F.col("doc_id") % 6 == 4, F.lit("émoji 😀 漢字 ñ — « » 🜚"))
            .otherwise(F.col("text")))
    (d.withColumn("text", text)
     .withColumn("n_chars", F.length(text).cast("bigint"))
     .write.mode("overwrite").parquet(f"{out}/documents.parquet"))

    e = spark.read.parquet(f"{base}/embeddings.parquet")
    dim = e.selectExpr("size(embedding) d").first()["d"]
    emb = (F.when(F.col("vec_id") % 5 == 0,
                  F.expr(f"array_repeat(CAST(0.0 AS FLOAT), {dim})"))
           .when(F.col("vec_id") % 5 == 1, F.expr(
               "transform(embedding, (x, i) -> CASE WHEN i = 0 "
               "THEN CAST('NaN' AS FLOAT) ELSE x END)"))
           .when(F.col("vec_id") % 5 == 2, F.expr(
               "transform(embedding, (x, i) -> CASE WHEN i = 0 "
               "THEN CAST('Infinity' AS FLOAT) ELSE x END)"))
           .when(F.col("vec_id") % 5 == 3,
                 F.expr(f"array_repeat(CAST(1e30 AS FLOAT), {dim})"))
           .otherwise(F.col("embedding")))
    (e.withColumn("embedding", emb)
     .write.mode("overwrite").parquet(f"{out}/embeddings.parquet"))

    ev = spark.read.parquet(f"{base}/events.parquet")
    val = (F.when(F.col("event_id") % 6 == 0, F.expr("CAST('NaN' AS DOUBLE)"))
           .when(F.col("event_id") % 6 == 1,
                 F.expr("CAST('Infinity' AS DOUBLE)"))
           .when(F.col("event_id") % 6 == 2,
                 F.expr("CAST('-Infinity' AS DOUBLE)"))
           .when(F.col("event_id") % 6 == 3, F.lit(1e308))
           .when(F.col("event_id") % 6 == 4, F.lit(0.0))
           .otherwise(F.col("value")))
    et = F.when(F.col("event_id") % 7 == 0, F.lit("")) \
        .otherwise(F.col("event_type"))
    ts = (F.when(F.col("event_id") % 11 == 0,
                 F.expr("TIMESTAMP'1970-01-01 00:00:00'"))
          .when(F.col("event_id") % 13 == 0,
                F.expr("TIMESTAMP'2199-12-31 23:59:59'"))
          .otherwise(F.col("ts")))
    props = F.when(F.col("event_id") % 5 == 0, F.lit("")) \
        .otherwise(F.col("props"))
    (ev.withColumn("value", val).withColumn("event_type", et)
       .withColumn("ts", ts).withColumn("props", props)
       .write.mode("overwrite").parquet(f"{out}/events.parquet"))


def _build_dupflood(spark, base: str, out: str) -> None:
    """Append exact duplicates: the boilerplate-page shape. IDs extend
    past the base key space so original rows survive untouched."""
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{base}/documents.parquet")
    donor = (d.filter(F.col("text").isNotNull())
             .orderBy(F.length("text").desc(), "doc_id").limit(1))
    clones = (spark.range(10_000, 10_060)
              .crossJoin(F.broadcast(donor.select("text", "lang", "n_chars")))
              .selectExpr("id AS doc_id", "text", "lang",
                          "'flood' AS source", "n_chars"))
    shorts = spark.range(20_000, 20_020).selectExpr(
        "id AS doc_id", "'tiny doc' AS text", "'en' AS lang",
        "'flood' AS source", "CAST(8 AS BIGINT) AS n_chars")
    (d.unionByName(clones).unionByName(shorts).coalesce(4)
     .write.mode("overwrite").parquet(f"{out}/documents.parquet"))

    e = spark.read.parquet(f"{base}/embeddings.parquet")
    vmax = e.agg(F.max("vec_id")).first()[0]
    vdonor = e.orderBy("vec_id").limit(1)
    others = [c for c in e.columns if c != "vec_id"]
    vclones = (spark.range(vmax + 1, vmax + 61)
               .crossJoin(F.broadcast(vdonor.select(*others)))
               .selectExpr("id AS vec_id", *others))
    (e.unionByName(vclones.select(*e.columns)).coalesce(4)
     .write.mode("overwrite").parquet(f"{out}/embeddings.parquet"))

    ev = spark.read.parquet(f"{base}/events.parquet")
    emax = ev.agg(F.max("event_id")).first()[0]
    edonor = ev.orderBy("event_id").limit(1)
    ecols = [c for c in ev.columns if c != "event_id"]
    # 3000 events identical in every payload column INCLUDING ts — the
    # hot-shard replay shape (sessionizers, dedup, watermarking all see it)
    eclones = (spark.range(emax + 1, emax + 3001)
               .crossJoin(F.broadcast(edonor.select(*ecols)))
               .selectExpr("id AS event_id", *ecols))
    (ev.unionByName(eclones.select(*ev.columns)).coalesce(8)
     .write.mode("overwrite").parquet(f"{out}/events.parquet"))


def _build_nullev(spark, base: str, out: str) -> None:
    """Corrupted events (the ``TestStreamingNullContract.nullev_dir``
    rule): ts NULL on event_id % 11, user_id NULL on % 13, value NULL on
    % 7; documents/embeddings verbatim HERE, and the seven TPC-H tables
    verbatim via the ``build_fixture`` dispatcher's copy loop before
    this helper runs — the finished fixture carries ALL ten tables, so
    a full-registry sweep can point at it (r11, ADVICE clarification).
    Keys deliberately overlap (77, 91, 143-multiples lose two fields;
    1001-multiples all three)."""
    from pyspark.sql import functions as F

    for t in ("documents", "embeddings"):
        (spark.read.parquet(f"{base}/{t}.parquet")
         .write.mode("overwrite").parquet(f"{out}/{t}.parquet"))
    ev = spark.read.parquet(f"{base}/events.parquet")
    (ev.withColumn("ts", F.when(F.col("event_id") % 11 == 0,
                                F.lit(None).cast("timestamp"))
                          .otherwise(F.col("ts")))
       .withColumn("user_id", F.when(F.col("event_id") % 13 == 0,
                                     F.lit(None).cast("bigint"))
                               .otherwise(F.col("user_id")))
       .withColumn("value", F.when(F.col("event_id") % 7 == 0,
                                   F.lit(None).cast("double"))
                             .otherwise(F.col("value")))
       .coalesce(2).write.mode("overwrite")
       .parquet(f"{out}/events.parquet"))


def _build_nulldoc(spark, base: str, out: str) -> None:
    """Corrupted documents + embeddings (r11, the fifth standing gate):
    text NULL on doc_id % 11, text '' on % 13, source NULL on % 7, lang
    NULL on % 5 — n_chars VERBATIM (inconsistent metadata is exactly
    what corrupt shards carry); embedding NULL on vec_id % 9, label
    NULL on % 5. Moduli overlap deliberately (143-multiples lose text
    twice over, 77-multiples lose text AND source, 385-multiples lose
    source, lang and the vector label). Events verbatim HERE and the
    seven TPC-H tables verbatim via the ``build_fixture`` dispatcher's
    copy loop — the finished fixture carries ALL ten tables."""
    from pyspark.sql import functions as F

    (spark.read.parquet(f"{base}/events.parquet")
     .write.mode("overwrite").parquet(f"{out}/events.parquet"))
    d = spark.read.parquet(f"{base}/documents.parquet")
    (d.withColumn("text", F.when(d.doc_id % 11 == 0,
                                 F.lit(None).cast("string"))
                           .when(d.doc_id % 13 == 0, F.lit(""))
                           .otherwise(d.text))
       .withColumn("source", F.when(d.doc_id % 7 == 0,
                                    F.lit(None).cast("string"))
                              .otherwise(d.source))
       .withColumn("lang", F.when(d.doc_id % 5 == 0,
                                  F.lit(None).cast("string"))
                            .otherwise(d.lang))
       .coalesce(2).write.mode("overwrite")
       .parquet(f"{out}/documents.parquet"))
    e = spark.read.parquet(f"{base}/embeddings.parquet")
    etype = e.schema["embedding"].dataType.simpleString()
    (e.withColumn("embedding", F.when(e.vec_id % 9 == 0,
                                      F.lit(None).cast(etype))
                                .otherwise(e.embedding))
       .withColumn("label", F.when(e.vec_id % 5 == 0,
                                   F.lit(None).cast("int"))
                             .otherwise(e.label))
       .coalesce(2).write.mode("overwrite")
       .parquet(f"{out}/embeddings.parquet"))


def _build_nullfact(spark, base: str, out: str) -> None:
    """Corrupted TPC-H facts (r12, the sixth standing gate): NULL join
    keys / dates / amounts plus duplicate primary keys in orders,
    lineitem and customer — the corrupted-warehouse-shard shape the
    TPC-H battery, CDC/SCD2/MERGE, as-of joins and the analytics family
    had never seen (their only prior adversarial exposure was via the
    nullev/nulldoc SIDE tables). Moduli overlap deliberately
    (1001-multiples lose custkey, date AND price; 91-multiples date and
    price). region/nation/supplier/part verbatim via the dispatcher's
    copy loop; events/documents/embeddings verbatim HERE — the finished
    fixture carries ALL ten tables for a full-registry sweep."""
    from pyspark.sql import functions as F

    for t in ("events", "documents", "embeddings"):
        (spark.read.parquet(f"{base}/{t}.parquet")
         .write.mode("overwrite").parquet(f"{out}/{t}.parquet"))

    o = spark.read.parquet(f"{base}/orders.parquet")
    corrupted = (
        o.withColumn("o_custkey", F.when(o.o_orderkey % 11 == 0,
                                         F.lit(None).cast("bigint"))
                                   .otherwise(o.o_custkey))
         .withColumn("o_orderdate", F.when(o.o_orderkey % 13 == 0,
                                           F.lit(None).cast("timestamp"))
                                     .otherwise(o.o_orderdate))
         .withColumn("o_totalprice", F.when(o.o_orderkey % 7 == 0,
                                            F.lit(None).cast("double"))
                                      .otherwise(o.o_totalprice)))
    # verbatim PK duplicates: deterministic for both engines (every
    # column equal), but o_orderkey stops being unique
    dupes = corrupted.filter(F.col("o_orderkey") % 101 == 0)
    (corrupted.unionByName(dupes).coalesce(2)
     .write.mode("overwrite").parquet(f"{out}/orders.parquet"))

    li = spark.read.parquet(f"{base}/lineitem.parquet")
    # l_linenumber is not unique — fold the orderkey in (the skewed
    # fixture's rule) so corruption stays row-deterministic; pinned as a
    # real column BEFORE l_orderkey itself is nulled (a bare expression
    # would dangle once withColumn replaces the attribute it references)
    rid = F.col("__rid")
    (li.withColumn("__rid", li.l_orderkey * 8 + li.l_linenumber)
       .withColumn("l_orderkey", F.when(rid % 17 == 0,
                                        F.lit(None).cast("bigint"))
                                  .otherwise(F.col("l_orderkey")))
       .withColumn("l_suppkey", F.when(rid % 23 == 0,
                                       F.lit(None).cast("bigint"))
                                 .otherwise(F.col("l_suppkey")))
       .withColumn("l_shipdate", F.when(rid % 13 == 0,
                                        F.lit(None).cast("timestamp"))
                                  .otherwise(F.col("l_shipdate")))
       .withColumn("l_extendedprice", F.when(rid % 7 == 0,
                                             F.lit(None).cast("double"))
                                       .otherwise(F.col("l_extendedprice")))
       .withColumn("l_quantity", F.when(rid % 19 == 0,
                                        F.lit(None).cast("double"))
                                  .otherwise(F.col("l_quantity")))
       .drop("__rid")
       .coalesce(4).write.mode("overwrite")
       .parquet(f"{out}/lineitem.parquet"))

    c = spark.read.parquet(f"{base}/customer.parquet")
    ccor = (
        c.withColumn("c_nationkey", F.when(c.c_custkey % 11 == 0,
                                           F.lit(None).cast("int"))
                                     .otherwise(c.c_nationkey))
         .withColumn("c_acctbal", F.when(c.c_custkey % 7 == 0,
                                         F.lit(None).cast("double"))
                                   .otherwise(c.c_acctbal))
         .withColumn("c_mktsegment", F.when(c.c_custkey % 5 == 0,
                                            F.lit(None).cast("string"))
                                      .otherwise(c.c_mktsegment)))
    # same-key-DIFFERENT-payload duplicates: any keep-one/dropDuplicates
    # logic without a total deterministic tie-break diverges here
    cdup = (ccor.filter(F.col("c_custkey") % 37 == 0)
            .withColumn("c_acctbal", F.col("c_acctbal") + F.lit(1000.0))
            .withColumn("c_name", F.concat_ws("", F.col("c_name"),
                                              F.lit("#dup"))))
    (ccor.unionByName(cdup).coalesce(1)
     .write.mode("overwrite").parquet(f"{out}/customer.parquet"))


def _build_skewed(spark, base: str, out: str) -> None:
    """Remap grouping/join keys so one value holds ~95% of rows
    (id % 20 != 0), payloads untouched. Hot values are real existing
    keys, so referential integrity survives."""
    from pyspark.sql import functions as F

    plans = {
        # table -> (row-id col for the deterministic 95% rule,
        #           [skew cols — grouping AND join keys: o_custkey is the
        #            orders→customer probe key, l_suppkey/l_orderkey the
        #            lineitem→supplier/orders keys — the classic
        #            AQE-skew-join pathologies])
        "documents": ("doc_id", ["source"]),
        "events": ("event_id", ["user_id"]),
        "embeddings": ("vec_id", ["label"]),
        "orders": ("o_orderkey", ["o_custkey"]),
        "lineitem": ("l_linenumber", ["l_suppkey", "l_orderkey"]),
    }
    for t in TPCH + ("events", "documents", "embeddings"):
        df = spark.read.parquet(f"{base}/{t}.parquet")
        if t in plans:
            idc, cols = plans[t]
            # l_linenumber is not unique — fold the orderkey in so the
            # 95% rule stays row-deterministic for lineitem too
            rid = (F.col(idc) if t != "lineitem"
                   else F.col("l_orderkey") * 8 + F.col("l_linenumber"))
            for kc in cols:
                hot = df.orderBy(kc).limit(1).select(kc).first()[0]
                lit = (F.lit(hot) if not isinstance(hot, str)
                       else F.lit(str(hot)))
                df = df.withColumn(
                    kc, F.when(rid % 20 != 0,
                               lit.cast(df.schema[kc].dataType))
                          .otherwise(F.col(kc)))
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")


def classify(exc: BaseException) -> str:
    """'contract' for a loud operator-raised ValueError, else 'DEEP'."""
    if isinstance(exc, ValueError):
        return "contract"
    return "DEEP"


MODES = ("nullpayload", "mixednull", "poisoned", "dupflood", "skewed",
         "nullev", "nulldoc", "nullfact")


def main() -> int:
    args = sys.argv[1:]
    if args and args[0] == "build":
        if len(args) != 3 or args[1] not in MODES:
            print(__doc__)
            return 2
        base = os.environ.get("PROBE_BASE", "/root/testdata/sf0.001")
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.session import (
            get_spark,
        )

        spark = get_spark(f"probe-build-{args[1]}")
        build_fixture(spark, base, args[2], args[1])
        print(f"fixture [{args[1]}] at {args[2]} from {base}")
        spark.stop()
        return 0
    if not args or args[0] not in MODES:
        print(__doc__)
        return 2
    mode, filters = args[0], args[1:]
    base = os.environ.get("PROBE_BASE", "/root/testdata/sf0.001")

    from __spark_entry__ import queries
    from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.session import (
        get_spark,
    )

    spark = get_spark(f"degenerate-probe-{mode}")
    out = tempfile.mkdtemp(prefix=f"probe_{mode}_")
    build_fixture(spark, base, out, mode)
    print(f"fixture [{mode}] at {out} from {base}\n")

    qs = queries()
    names = [n for n in qs if not filters or any(f in n for f in filters)]
    violations, contract_errs = [], []
    for name in names:
        t0 = time.time()
        try:
            rows = qs[name](spark, out).collect()
            print(f"ok        {name}: {len(rows)} rows "
                  f"({time.time()-t0:.1f}s)")
        except Exception as exc:
            kind = classify(exc)
            first = str(exc).splitlines()[0] if str(exc) else type(exc).__name__
            if kind == "contract":
                contract_errs.append(name)
                print(f"contract  {name}: ValueError: {first[:140]}")
            else:
                violations.append(name)
                print(f"DEEP      {name}: {type(exc).__name__}: "
                      f"{first[:200]}")
                if "-v" in filters:
                    traceback.print_exc()

    print(f"\n{len(names) - len(violations)}/{len(names)} within contract "
          f"({len(contract_errs)} loud ValueErrors); "
          f"{len(violations)} DEEP violations")
    if violations:
        print("violators:", " ".join(sorted(violations)))
    spark.stop()
    return 1 if violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
