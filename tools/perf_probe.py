#!/usr/bin/env python
"""Round-12 optimization probe: isolated per-entry timing + plan capture.

Usage:
    python tools/perf_probe.py time q1_pricing_summary ann_lsh_topk   # min-of-N collect timing
    python tools/perf_probe.py plan graph_triangle_stats              # explain('formatted') to stdout
    python tools/perf_probe.py plan graph_triangle_stats plans/r12/graph_triangle_stats_before.txt

Env:
    SPARK_GRAFT_SF_DIR   data dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS     core count (default machine)
    PROBE_REPS           timing repetitions (default 3)
    PROBE_NOOP=1         time with the noop sink instead of collect()

Timing methodology matches bench.py (collect, min-of-N, clearCache
between reps) so numbers are comparable with BENCH_local.json; the noop
mode follows the optimization guide §1.4 for isolating computation from
result fetch (results here are small aggregates, so the two agree).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    mode = sys.argv[1]
    names = [a for a in sys.argv[2:] if not a.endswith(".txt")]
    out_path = next((a for a in sys.argv[2:] if a.endswith(".txt")), None)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from __spark_entry__ import queries
    from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.session import (
        get_spark,
    )

    spark = get_spark("perf-probe")
    qs = queries()

    # same warmup as bench.py
    import pandas as pd  # noqa: F401
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).collect()
    spark.range(32).mapInPandas(lambda it: it, schema="id long").collect()

    if mode == "plan":
        for name in names:
            df = qs[name](spark, sf_dir)
            text = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
            header = f"== {name} @ {sf_dir} ==\n"
            if out_path:
                with open(out_path, "w") as fh:
                    fh.write(header + text)
                print(f"wrote {out_path} ({len(text)} chars)")
            else:
                print(header + text)
            spark.catalog.clearCache()
    elif mode == "time":
        reps = int(os.environ.get("PROBE_REPS", "3"))
        noop = os.environ.get("PROBE_NOOP") == "1"
        for name in names:
            best, runs = float("inf"), []
            for _ in range(reps):
                spark.sparkContext.setJobDescription(f"probe: {name}")
                t0 = time.perf_counter()
                df = qs[name](spark, sf_dir)
                if noop:
                    df.write.format("noop").mode("overwrite").save()
                else:
                    df.collect()
                dt = time.perf_counter() - t0
                runs.append(round(dt, 3))
                best = min(best, dt)
                spark.catalog.clearCache()
            print(f"{name}: min={best:.3f}  runs={runs}")
    else:
        raise SystemExit(f"unknown mode {mode!r}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
