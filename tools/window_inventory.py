#!/usr/bin/env python
"""Closed-set inventory of unpartitioned-Window plans (r8 verdict task 6).

Exactly the entries in ALLOWED_SINGLE_PARTITION_WINDOWS may plan a
``Window`` over an ``Exchange SinglePartition`` — each runs it on a
BOUNDED frame (calendar/decile/k/sources-sized), audited in the r8
verdict. Any other entry planning one fails the sweep: the 100×-scale
window discipline is a regression gate, not a per-round audit.

Usage:
    python tools/window_inventory.py             # sf0.001, all entries
    SPARK_GRAFT_SF_DIR=... python tools/window_inventory.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: Entries allowed to plan Window-over-SinglePartition, with the bounded
#: frame that makes each safe (r8 verdict "What's wrong" audit).
ALLOWED_SINGLE_PARTITION_WINDOWS = {
    "window_ntile_percent":      "200 rows by design (c_custkey <= 200)",
    "corpus_token_budget_cut":   "sources-sized (catalog of sources)",
    "orders_open_backlog_daily": "calendar-sized daily grid",
    "orders_monthly_growth":     "calendar-sized monthly grid",
    "customers_adoption_curve":  "calendar-sized grid",
    "revenue_gini_lorenz":       "decile-sized Lorenz points",
    "corpus_heaps_law":          "decile-sized growth curve",
    # kmv_set_ops' k-sized ladder-top window (≤ 2k rows) executes at
    # construction behind the core's localCheckpoint, so it may not
    # appear in the RETURNED frame's plan — listed for when it does.
    "kmv_set_ops":               "k-sized ladder top (<= 2k rows)",
    "orders_theilsen_trend":     "months^2-sized slope grid",
}

#: Families whose registry callables EXECUTE work at construction time
#: (streaming drains, sink writes) and whose returned frames are plain
#: post-hoc scans — no batch Window can hide there; excluded to keep the
#: sweep plan-only and fast.
SKIP_PREFIXES = ("streaming_",)


def sweep(sf_dir: str, names: list[str] | None = None) -> dict:
    from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.plans.inspect import (
        single_partition_windows,
    )
    from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.registry import (
        build_queries,
    )
    from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.session import (
        get_spark,
    )

    spark = get_spark("window-inventory")
    qs = build_queries()
    run = names if names is not None else [
        k for k in qs if not k.startswith(SKIP_PREFIXES)]
    unknown = [n for n in run if n not in qs]
    if unknown:
        raise SystemExit(f"unknown entries: {unknown}")
    hits, errors = {}, {}
    for name in run:
        t0 = time.perf_counter()
        try:
            df = qs[name](spark, sf_dir)
            n = single_partition_windows(df)
        except Exception as exc:          # surface, don't hide
            errors[name] = f"{type(exc).__name__}: {exc}"
            continue
        if n:
            hits[name] = n
        secs = time.perf_counter() - t0
        if secs > 5:
            print(json.dumps({"slow_construct": name,
                              "sec": round(secs, 1)}))
    return {"hits": hits, "errors": errors, "n_swept": len(run)}


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    res = sweep(sf_dir, sys.argv[1:] or None)
    unexpected = sorted(set(res["hits"]) -
                        set(ALLOWED_SINGLE_PARTITION_WINDOWS))
    vanished = sorted(set(ALLOWED_SINGLE_PARTITION_WINDOWS) -
                      set(res["hits"]))
    print(json.dumps({"swept": res["n_swept"], "hits": res["hits"],
                      "unexpected": unexpected, "vanished": vanished,
                      "errors": res["errors"]}, indent=2))
    return 1 if (unexpected or res["errors"]) else 0


if __name__ == "__main__":
    raise SystemExit(main())
