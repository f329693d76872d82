#!/usr/bin/env python
"""10× scale smoke: run the most expensive headline entries once against a
synthetically 10×'d copy of the data-plane tables and assert the scale
invariants the sf0.1 bench cannot see breaking.

What a 10× pass proves that sf0.1 cannot: no OOM/driver blow-up as the
dedup/graph candidate sets grow quadratically-shaped inputs, no
single-partition window sneaking in past AQE's re-planning at the larger
volume, and wall-clock growth that stays roughly linear for the
linear-shaped entries (a super-linear blow-up here is the early warning
for the 100 TB cliff).

The 10× tables are built by unioning the source with id-shifted copies
(deterministic — no RNG): documents get doc_id + k·N and a per-copy token
prefix so near-dup semantics stay realistic (identical copies would make
every doc an exact dup, which tests dedup's worst case but nothing else —
the prefix keeps copies near- rather than exact-duplicates); events get
event_id/user shifts plus a per-copy timestamp offset; embeddings get
vec_id shifts. TPC-H tables are linked as-is (the expensive entries are
document/event/embedding-bound; TPC-H queries have their own bench).

Usage:
    python tools/scale_smoke.py [--factor 10] [--top 10]
Writes one JSON line per query plus a summary; exits non-zero on any
invariant breach. Timings are recorded in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: The entries worth smoking at 10×: the most expensive data-plane ops from
#: the round-5/6 bench, spanning the dedup index joins, the components
#: stack, BPE encode, the source-similarity self-join, packing's prefix
#: scan, and the curation mega-pipeline.
DEFAULT_TOP = [
    "split_leakage_safe",
    "dedup_substring_spans",
    "dedup_incremental_minhash",
    "dedup_minhash_lsh",
    "bpe_encode_stats",
    "corpus_source_similarity",
    "corpus_build_pipeline",
    "dedup_ngram_jaccard_pruned",
    "corpus_pack_global_stream",
    "events_sessionize",
    # late round-6 heavies: centroid drift (one corpus pass + catalog
    # pairwise), the global-prefix percentiles, the double-ranked
    # zone-map census, and the sweep-line concurrency census
    "embedding_source_drift",
    "agg_weighted_percentiles",
    "diag_layout_zonemap",
    "events_peak_concurrency",
    # round-7: the rank-sum test pools the event values through
    # scale.global_ranks + a distinct-values tie rollup — the two stages
    # whose growth the 10× run must show linear
    "stat_mann_whitney_u",
    # round-7 window purge representatives: lag-as-adjacency-join over
    # the 10× event stream, and the double grouped_ranks/global_ranks
    # calibration over the 10× corpus — the shapes that replaced the
    # low-cardinality partitioned windows must grow linearly
    "events_twap",
    "quality_quantile_calibrate",
]

TENX_TABLES = ("documents", "events", "embeddings")
LINK_TABLES = ("region", "nation", "customer", "supplier", "part",
               "orders", "lineitem")


#: The verdict-r7 "heavies" list for the one-off 30-50x linearity run:
#: the five most expensive entries by intrinsic cost. graph_triangle_stats
#: is lineitem-bound, so this mode also scales lineitem (disjoint shifted
#: part/supplier copies -> K identical subgraphs; edges/triangles must
#: grow exactly linearly because the relative threshold is scale-free).
HEAVIES = [
    "graph_triangle_stats",
    "diag_curve_locality",
    "embedding_source_drift",
    "dedup_minhash_lsh",
    "dedup_incremental_minhash",
]


def build_scaled_dir(spark, src_dir: str, dest_dir: str, factor: int,
                     scale_lineitem: bool = False) -> None:
    from pyspark.sql import functions as F

    os.makedirs(dest_dir, exist_ok=True)
    link = [t for t in LINK_TABLES
            if not (scale_lineitem and t == "lineitem")]
    for t in link:
        src = f"{src_dir}/{t}.parquet"
        dst = f"{dest_dir}/{t}.parquet"
        if not os.path.exists(dst):
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                shutil.copy(src, dst)

    if scale_lineitem:
        li = spark.read.parquet(f"{src_dir}/lineitem.parquet")
        mx = li.agg(F.max("l_orderkey").alias("o"),
                    F.max("l_partkey").alias("p"),
                    F.max("l_suppkey").alias("s")).first()
        copies = []
        for k in range(factor):
            copies.append(
                li.withColumn("l_orderkey",
                              F.col("l_orderkey") + F.lit(k * (mx.o + 1)))
                .withColumn("l_partkey",
                            F.col("l_partkey") + F.lit(k * (mx.p + 1)))
                .withColumn("l_suppkey",
                            F.col("l_suppkey") + F.lit(k * (mx.s + 1))))
        _union_all(copies).write.mode("overwrite").parquet(
            f"{dest_dir}/lineitem.parquet")

    d = spark.read.parquet(f"{src_dir}/documents.parquet")
    n_docs = d.count()
    copies = []
    for k in range(factor):
        c = (d.withColumn("doc_id", F.col("doc_id") + F.lit(k * n_docs))
             .withColumn("text",
                         F.concat(F.lit(f"copy{k} "), F.col("text"))
                         if k else F.col("text"))
             .withColumn("n_chars", F.length("text")))
        copies.append(c)
    _union_all(copies).write.mode("overwrite").parquet(
        f"{dest_dir}/documents.parquet")

    e = spark.read.parquet(f"{src_dir}/events.parquet")
    n_ev = e.count()
    n_users = e.agg(F.max("user_id")).first()[0] + 1
    copies = []
    for k in range(factor):
        copies.append(
            e.withColumn("event_id", F.col("event_id") + F.lit(k * n_ev))
            .withColumn("user_id", F.col("user_id") + F.lit(k * n_users))
            .withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {k} SECOND")))
    _union_all(copies).write.mode("overwrite").parquet(
        f"{dest_dir}/events.parquet")

    v = spark.read.parquet(f"{src_dir}/embeddings.parquet")
    n_vec = v.count()
    copies = [v.withColumn("vec_id", F.col("vec_id") + F.lit(k * n_vec))
              for k in range(factor)]
    _union_all(copies).write.mode("overwrite").parquet(
        f"{dest_dir}/embeddings.parquet")


def _union_all(frames):
    from functools import reduce

    return reduce(lambda a, b: a.unionByName(b), frames)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--top", type=int, default=len(DEFAULT_TOP))
    ap.add_argument("--base", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--scratch", default="/tmp/spark_graft_scale_smoke")
    ap.add_argument("--heavies", action="store_true",
                    help="run the verdict-r7 top-5 heavies (scales "
                         "lineitem too); use with --factor 30..50")
    ap.add_argument("--entries", nargs="*", default=None,
                    help="explicit entry list override")
    args = ap.parse_args()

    from __spark_entry__ import queries
    from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.plans.inspect import (
        single_partition_windows,
    )
    from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.session import get_spark

    spark = get_spark("scale-smoke")
    suffix = "_li" if args.heavies else ""
    scaled = os.path.join(
        args.scratch,
        f"{os.path.basename(args.base.rstrip('/'))}_x{args.factor}{suffix}")
    marker = os.path.join(scaled, "_BUILT")
    if not os.path.exists(marker):
        t0 = time.perf_counter()
        build_scaled_dir(spark, args.base, scaled, args.factor,
                         scale_lineitem=args.heavies)
        open(marker, "w").write("ok")
        print(json.dumps({"built": scaled,
                          "sec": round(time.perf_counter() - t0, 1)}))

    qs = queries()
    failures = []
    results = {}
    run_list = (args.entries if args.entries
                else HEAVIES if args.heavies
                else DEFAULT_TOP[:args.top])
    unknown = [name for name in run_list if name not in qs]
    if unknown:
        raise SystemExit(
            f"unknown entries (not in registry queries()): {unknown}")
    for name in run_list:
        # time construction + count TOGETHER: several heavies do eager
        # work at build time (localCheckpoint pins), which the old
        # count-only timing silently excluded (r8 fix — BASELINE notes
        # the semantics change; pre-r8 smoke rows undercount those)
        t0 = time.perf_counter()
        df = qs[name](spark, scaled)
        n = df.count()
        secs = round(time.perf_counter() - t0, 2)
        spw = single_partition_windows(df)
        ok = spw == 0
        results[name] = {"sec": secs, "rows": n,
                         "single_partition_windows": spw}
        if not ok:
            failures.append(name)
        print(json.dumps({"query": name, **results[name], "ok": ok}))

    print(json.dumps({"metric": "scale_smoke_total",
                      "factor": args.factor,
                      "value": round(sum(r["sec"]
                                         for r in results.values()), 2),
                      "unit": "sec",
                      "failures": failures}))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
