#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints the full JSON result first, then — as the LAST line — a JSON line
guaranteed to fit the driver's captured-stdout tail (~2000 chars):
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
BENCH_r05 came back ``"parsed": null`` because the 69-query headline line
outgrew that tail; the last line now carries the scalars + subtotals + as
many of the most expensive per-query timings as fit, with the complete
per-query map always written to ``BENCH_local.json`` beside this script
(and printed as the FIRST line for the human log).

The headline set covers every subsystem with real data volume at scale:
TPC-H-style joins/aggs, window top-k, event sessionization, the dedup
pipelines (exact, MinHash-LSH, SimHash, embedding-cosine), ANN top-k, and
the text-analysis battery. Each query is forced with ``collect()`` (result
sets are small aggregates — the work is in the scan/shuffle, not the fetch).

A warmup query runs first so JVM/codegen startup isn't billed to q1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The first 20 entries are the round-1 suite, the first 41 the round-3
# suite, and the first 49 the round-4 suite — each accreted battery's
# subtotal is emitted separately (r01/r03/r04_suite_total) so
# round-over-round totals compare at CONSTANT membership as the headline
# grows. (Round 2 ran the same 20 queries as round 1, so it needs no
# separate constant.)
N_R01_SUITE = 20
N_R03_SUITE = 41
N_R04_SUITE = 49
N_R05_SUITE = 69
N_R06_SUITE = 116

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q18_large_orders",
    "q9_product_profit",
    "q13_customer_distribution",
    "window_topk_per_group",
    "agg_rollup",
    "events_tumbling_hourly",
    "events_sessionize",
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "ann_brute_force_topk",
    "ann_lsh_topk",
    "text_token_stats",
    "text_quality_score",
    # round-2 operators, tracked from round 3 on so their perf is known
    # before anyone scales them
    "cdc_apply_customers",
    "scd2_point_in_time_join",
    "dedup_ngram_jaccard_pruned",
    "corpus_curate",
    "window_ntile_scalable",
    "ann_ivf_topk",
    # round-3 operators
    "ann_pq_topk",
    "contamination_ngram_overlap",
    "text_repetition_metrics",
    "events_retention_cohorts",
    "join_salted_hot_key",
    "snapshot_diff_customers",
    # late round-3 batteries (event-time #2, substring dedup, hierarchy,
    # LM counts, incremental view maintenance)
    "events_ohlc_bars",
    "events_active_users_7d",
    "dedup_substring_spans",
    "rollup_incremental_refresh",
    "graph_hierarchy_depths",
    "corpus_bigram_counts",
    "events_session_attribution",
    "scale_zorder_zvalues",
    "corpus_bpe_merge_pairs",
    # round-4 operators
    "rerank_ann_shortlist",
    "corpus_curation_report",
    "merge_into_customers",
    "export_training_shards",
    "corpus_chunk_overlap",
    "corpus_doc_lm_coverage",
    "dedup_semdedup",
    "bpe_encode_stats",
    # round-5 operators
    "corpus_build_pipeline",
    "corpus_decontaminate",
    "corpus_gopher_rules",
    "ann_pq_encode",
    "corpus_pack_global_stream",
    "validate_star_expectations",
    "source_bloom_runtime_filter",
    "agg_histogram_equi_depth",
    "events_cusum_drift",
    "dedup_incremental_minhash",
    "streaming_cusum_alerts",
    "gdpr_delete_cascade",
    "corpus_lang_drift_chi2",
    "classifier_quality_linear",
    "classifier_gains_deciles",
    "corpus_source_ks_drift",
    "split_leakage_safe",
    "corpus_source_similarity",
    "embedding_pca_project",
    "streaming_heavy_hitters",
    # round-6 operators
    "orders_cohort_retention",
    "events_user_lifecycle",
    "graph_triangle_stats",
    "text_readability_scores",
    "corpus_doc_commonness",
    "ann_ivf_pq_topk",
    "dedup_containment",
    "corpus_dsir_importance",
    "corpus_curriculum_phases",
    "privacy_k_anonymity",
    "embedding_kmeans_clusters",
    "multimodal_audio_energy",
    "corpus_temperature_mixture",
    "vocab_kmv_distinct",
    "corpus_ngram_novelty",
    "udaf_trimmed_sum",
    "streaming_static_enrich",
    "multimodal_image_stats",
    "graph_kcore",
    "sql_recursive_hierarchy",
    "sink_pydatasource_roundtrip",
    "retrieval_bm25_topk",
    "diag_join_key_skew",
    "events_acf_daily",
    "events_interarrival_stats",
    "diag_blocking_pair_census",
    "corpus_token_cooccurrence",
    "forecast_seasonal_naive_eval",
    "quality_quantile_calibrate",
    "events_trigram_journeys",
    "diag_layout_zonemap",
    "assoc_cramers_v",
    "events_holt_linear",
    "revenue_gini_lorenz",
    "corpus_heaps_law",
    "events_peak_concurrency",
    "agg_weighted_percentiles",
    "benford_price_audit",
    "events_user_predictability",
    "graph_degree_distribution",
    "corpus_distinctive_terms",
    "embedding_source_drift",
    "migrate_type_fit_audit",
    "orders_fulfillment_latency",
    "orders_mom_contribution",
    "sql_scalar_udf_battery",
    "streaming_p2_quantile",
    "privacy_l_diversity",
    "scalar_null_semantics",
    "events_markov_stationary",
    "events_id_gap_audit",
    "multimodal_phash_neardup",
    "ivm_join_view_delta",
    "diag_curve_locality",
    "kmv_set_ops",
    "agg_median_ci",
    "events_error_conversion",
    "embedding_triplet_margin",
    "orders_theilsen_trend",
    "events_weekly_seasonality_strength",
    "orders_cohort_ltv",
    "events_multitouch_attribution",
    "dedup_bloom_prefilter",
    "diag_join_size_forecast",
    "udtf_table_arg_sessionize",
    "diag_parquet_rowgroup_stats",
    # ---- round-7 additions (constant-membership boundary: the first
    # 135 entries are the frozen round-6 closing battery) ----
    "stat_mann_whitney_u",
    "stat_spearman_corr",
    "stat_mann_kendall_trend",
    "stat_kendall_tau",
    "sql_pipe_syntax_battery",
]
N_R07_BASE = 135        # the r6 closing battery, frozen for comparisons

#: Fixed-membership anchor for the truncated tail line (r13, the r12
#: verdict's task 2): the tail line only fits ~13 per-query timings, and
#: ranking them by THIS run's cost made the visible set self-evicting —
#: any query that improved enough dropped off, so the driver's
#: round-over-round geomean structurally retained regressions and
#: discarded wins (r12: visible geomean 0.882 vs 1.12 over all
#: comparable queries), while evicted entries were mislabeled
#: "dropped_from_bench". These 13 names are the r12 driver run's visible
#: set, FROZEN: they always ride the tail line first (so consecutive
#: rounds compare identical membership), and any remaining budget fills
#: with this run's most expensive non-anchor entries as before. The
#: complete map still lands in BENCH_local.json.
TAIL_ANCHOR = [
    "graph_triangle_stats", "stat_spearman_corr", "graph_kcore",
    "graph_degree_distribution", "diag_curve_locality",
    "orders_fulfillment_latency", "dedup_simhash",
    "agg_weighted_percentiles", "udtf_table_arg_sessionize",
    "embedding_kmeans_clusters", "dedup_minhash_lsh",
    "dedup_incremental_minhash", "bpe_encode_stats",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    from __spark_entry__ import queries
    from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.session import get_spark

    spark = get_spark("bench")
    qs = queries()

    # Warmup: JVM + codegen + parquet footers + the Python worker pool
    # (one tiny Arrow round trip), so fixed session costs aren't billed
    # to whichever query happens to run first.
    import pandas as pd  # noqa: F401

    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).collect()
    spark.range(32).mapInPandas(
        lambda it: it, schema="id long").collect()

    # Drift sentinel (round 9, r8 verdict task 7): a fixed data- and
    # code-independent workload — pure whole-stage-codegen sum over
    # spark.range — timed min-of-3 like every query. Its nominal floor is
    # recorded in BASELINE.md; a run whose sentinel drifts 1.3× above
    # nominal is flagged machine-noisy, which calibrates the closing
    # band per run instead of guessing from query spread.
    sentinel = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(200_000_000).agg(
            {"id": "sum"}).collect()
        sentinel = min(sentinel, time.perf_counter() - t0)
    sentinel = round(sentinel, 3)

    # Collapse-rail memo seam (r11, the r10 verdict's task 5): the four
    # collapse consumers (split_leakage_safe, dedup_clusters,
    # dedup_keep_representatives, corpus_neardup_report) share one
    # corpus collapse + pair graph + component-label pass inside this
    # scope, mirroring how a curation pipeline runs these reports
    # back-to-back over one corpus snapshot. Entry OUTPUTS are
    # unchanged (seam-parity pytest); only the repeated subplans go.
    # The scope spans headline + tail and is closed manually before the
    # payload write — a mid-bench crash kills the process anyway.
    from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.dedup import (
        collapse_memo_scope,
    )

    memo_scope = collapse_memo_scope()
    memo_scope.__enter__()

    # The seam makes the shared collapse/pair-graph/CC build invisible
    # to every per-query min (the first consumer pays it only on its
    # first rep, which min-of-3 discards) — time the build EXPLICITLY
    # so a regression in exactly the deduplicated subplans still moves
    # a recorded number (r11 review find). Compared against the prior
    # record below like the full-registry alarms.
    from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.dedup import (
        _collapsed_component_labels,
    )

    t0 = time.perf_counter()
    _collapsed_component_labels(spark, sf_dir).count()
    seam_build_sec = round(time.perf_counter() - t0, 3)

    # min-of-3: single-JVM local mode has multi-second GC/JIT noise; the
    # min is the steady-state number a warmed executor fleet would see
    # (observed run-to-run spread at sf0.1 is ±0.3 s per query — two
    # samples were not enough to pin the floor).
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        # The dedup/corpus ops pin frames with persist(DISK_ONLY); unlike
        # the localCheckpoint they replaced, persist registers the plan in
        # CacheManager, which is never dropped and is matched against
        # EVERY later query's plan — ~50 accumulated entries measurably
        # tax analysis and block-manager state by query #30 (observed:
        # events_ohlc_bars 0.9 s isolated vs 4.6 s late-session). Clear
        # between queries so each is measured cold-cache, exactly the
        # regime of the recorded baselines.
        spark.catalog.clearCache()

    # Fresh (pre-merge) headline mins: the full-registry alarm check
    # below must compare THIS run's measurements against the prior
    # record — comparing post-merge values is provably alarm-free
    # (min(new, prior) can never exceed 1.5× prior) and would erase a
    # real regression from the record (r10 review find).
    fresh_timings = dict(timings)

    # Merge mode (round 9): SPARK_GRAFT_BENCH_MERGE=1 folds this run's
    # per-query mins with the existing BENCH_local.json (same membership
    # required) — the closing protocol runs bench 3× with merge on for
    # runs 2..3, recording an effective min-of-9 per query so a wide
    # same-day noise band can't mask a real single-query regression.
    runs_merged = 1
    fresh_seam_build = seam_build_sec   # alarms compare FRESH, never merged
    fresh_sentinel = sentinel           # ditto: the run's own floor
    if os.environ.get("SPARK_GRAFT_BENCH_MERGE") == "1":
        prev_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_local.json")
        if os.path.exists(prev_path):
            with open(prev_path) as fh:
                prev = json.load(fh)
            if set(prev.get("queries", {})) == set(timings):
                timings = {k: min(timings[k], prev["queries"][k])
                           for k in timings}
                runs_merged = prev.get("runs_merged", 1) + 1
                sentinel = min(sentinel, prev.get("sentinel_sec", sentinel))
                seam_build_sec = min(
                    seam_build_sec,
                    prev.get("collapse_seam_build_sec", seam_build_sec))

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "r01_suite_total":
            round(sum(timings[n] for n in HEADLINE[:N_R01_SUITE]), 3),
        "r03_suite_total":
            round(sum(timings[n] for n in HEADLINE[:N_R03_SUITE]), 3),
        "r04_suite_total":
            round(sum(timings[n] for n in HEADLINE[:N_R04_SUITE]), 3),
        "r05_suite_total":
            round(sum(timings[n] for n in HEADLINE[:N_R05_SUITE]), 3),
        "r06_suite_total":
            round(sum(timings[n] for n in HEADLINE[:N_R06_SUITE]), 3),
        "r07_base_total":
            round(sum(timings[n] for n in HEADLINE[:N_R07_BASE]), 3),
        "n_queries": len(HEADLINE),
        "sentinel_sec": sentinel,
        "runs_merged": runs_merged,
        "collapse_seam_build_sec": seam_build_sec,
        # constant-membership scalar for the frozen anchor set (r13):
        # trends round over round regardless of tail-line truncation
        "anchor13_total":
            round(sum(timings[n] for n in TAIL_ANCHOR if n in timings),
                  3),
    }
    local = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_local.json")
    prev = {}
    if os.path.exists(local):
        try:
            with open(local) as fh:
                prev = json.load(fh)
        except (OSError, json.JSONDecodeError):
            prev = {}

    # Full-registry tail record (round 10, r9 verdict task 3): the
    # headline suite times 140 of 292 entries — a 10× regression in any
    # of the 152 cheap-tail entries was invisible to the bench gate.
    # SPARK_GRAFT_BENCH_FULL=1 runs every non-headline entry ONCE
    # (single-run, sentinel-calibrated; min-of-3 would triple a
    # multi-minute pass for entries whose job is regression visibility,
    # not headline precision) and records a per-entry map plus a
    # ≥1.5×-AND-≥0.3s-vs-prior alarm list. Runs WITHOUT the flag carry
    # the prior record forward so the driver's plain bench run never
    # drops the section.
    if os.environ.get("SPARK_GRAFT_BENCH_FULL") == "1":
        tail: dict[str, float] = {}
        for name in qs:
            if name in timings:
                continue
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).collect()
            tail[name] = round(time.perf_counter() - t0, 3)
            spark.catalog.clearCache()
        # Alarms compare the FRESH measurements against the prior
        # record — BEFORE any min-merge (a merged value is bounded by
        # the prior, so post-merge alarms are structurally empty and a
        # 10× tail regression would vanish; r10 review find) — and the
        # threshold is SENTINEL-NORMALIZED (r11): the record ratchets
        # down with every merge while a fresh pass rides the machine of
        # the day, so a globally hot run fired 53 simultaneous alarms
        # on untouched codegen-only entries. The sentinel is re-timed
        # right after the tail pass (machine state drifts over a
        # 15-minute run) and the worse of the two floors scales both
        # the ratio and the absolute band; a genuine single-entry
        # regression still fires because it moves one entry, not the
        # sentinel.
        tail_sentinel = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            spark.range(200_000_000).agg({"id": "sum"}).collect()
            tail_sentinel = min(tail_sentinel, time.perf_counter() - t0)
        prior_sent = prev.get("full_registry_sentinel_sec") \
            or prev.get("sentinel_sec")
        noise = max(1.0, max(fresh_sentinel, tail_sentinel) / prior_sent) \
            if prior_sent else 1.0
        fresh_full = {**fresh_timings, **tail}
        prior_full = prev.get("full_registry", {})
        alarms = sorted(
            k for k in fresh_full if k in prior_full
            and fresh_full[k] >= 1.5 * noise * prior_full[k]
            and fresh_full[k] - prior_full[k] >= 0.3 * noise)
        # seam-build regression rides the same alarm rule (fresh vs the
        # prior record's scalar — merged values never mask it)
        prior_seam = prev.get("collapse_seam_build_sec")
        if (prior_seam and fresh_seam_build >= 1.5 * noise * prior_seam
                and fresh_seam_build - prior_seam >= 0.3 * noise):
            alarms.append("collapse_seam_build")
        payload["full_registry_noise_factor"] = round(noise, 3)
        full = {**timings, **tail}
        if os.environ.get("SPARK_GRAFT_BENCH_MERGE") == "1" and \
                set(prior_full) == set(full):
            full = {k: min(full[k], prior_full[k]) for k in full}
        payload["full_registry"] = full
        payload["full_registry_total"] = round(sum(full.values()), 3)
        payload["full_registry_alarms"] = alarms
        # the FRESH floor of the run that produced this tail (the
        # worse of headline-time and tail-time) — the next run's noise
        # normalization divides by this, so a merged min here would
        # inflate every future noise factor
        payload["full_registry_sentinel_sec"] = round(
            max(fresh_sentinel, tail_sentinel), 3)
        payload["full_registry_from_prior_run"] = False
    elif "full_registry" in prev:
        # carry the prior record forward so a plain run never drops the
        # section — flagged STALE so a reader can't mistake the copied
        # alarm list for this run's output (r10 review find)
        for k in ("full_registry", "full_registry_total",
                  "full_registry_alarms", "full_registry_sentinel_sec",
                  "full_registry_noise_factor"):
            if k in prev:
                payload[k] = prev[k]
        payload["full_registry_from_prior_run"] = True

    memo_scope.__exit__(None, None, None)

    # Complete record: file beside the script + first stdout line.
    with open(local, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps(payload))
    # LAST line: must survive a ~2000-char captured tail. Keep every
    # scalar; fill "queries" with the most expensive entries that fit.
    # The full-registry map never rides the tail line (file-only).
    tail_payload = {k: v for k, v in payload.items()
                    if k not in ("full_registry",)}
    if "full_registry" in payload:
        tail_payload["full_registry_n"] = len(payload["full_registry"])
    line = json.dumps(tail_payload)
    if len(line) > _TAIL_BUDGET:
        line = _slim_tail_line(tail_payload, timings)
    print(line)
    spark.stop()
    return 0


def _slim_tail_line(tail_payload: dict, timings: dict) -> str:
    """Shrink the final stdout line under ``_TAIL_BUDGET`` while keeping
    the comparison signal stable (r13, the r12 verdict's task 2):

    - A wide alarm sweep (a noisy host fires dozens of simultaneous
      alarms — 95 in the r13 baseline) must not crowd the per-query
      timings off the line entirely: the full list always lands in
      BENCH_local.json, the line keeps the count plus as many names as
      fit AFTER reserving room for the anchor queries.
    - Frozen-anchor membership first: consecutive driver runs compare
      the same 13 queries instead of a cost-ranked set that self-evicts
      every improvement; leftover budget then fills with this run's most
      expensive non-anchor entries as before."""
    slim = {**tail_payload, "queries": {}, "queries_truncated": True,
            "queries_full": "BENCH_local.json"}
    alarms = slim.get("full_registry_alarms")
    if alarms:
        slim["full_registry_alarms_n"] = len(alarms)
        while alarms and \
                len(json.dumps(slim)) > _TAIL_BUDGET - _ANCHOR_RESERVE:
            alarms = alarms[:-1]
            slim["full_registry_alarms"] = alarms
            slim["full_registry_alarms_truncated"] = True
    ordered = [n for n in TAIL_ANCHOR if n in timings] + \
        [n for n, _ in sorted(timings.items(), key=lambda kv: -kv[1])
         if n not in TAIL_ANCHOR]
    for name in ordered:
        slim["queries"][name] = timings[name]
        if len(json.dumps(slim)) > _TAIL_BUDGET:
            del slim["queries"][name]
            break
    return json.dumps(slim)


#: Max length of the final stdout line: the driver keeps a ~2000-char
#: stdout tail and json-parses it; BENCH_r05's 2.6 KB line came back
#: "parsed": null. Margin for a trailing newline / stray warning.
_TAIL_BUDGET = 1800

#: Line budget reserved for the 13 frozen TAIL_ANCHOR timings before the
#: alarm-name list may use the rest (~35 chars per "name": secs entry).
_ANCHOR_RESERVE = 600


if __name__ == "__main__":
    raise SystemExit(main())
