"""Box-speed canary: ONE fixed synthetic job shared by every timing
consumer (bench.py's retry ladder and sidecar normalization, the
floor-gate in tests/test_bench_floor.py), so their recorded numbers
normalize against the SAME yardstick.

Why it exists: this machine oscillates on multi-minute hypervisor
windows — identical code has recorded 94-205 s full-catalog totals.
Raw wall-clock is therefore meaningless across rounds; every consumer
divides its measurement by (live canary / its pinned calibration
canary) before comparing against a floor or a past recording
(`SCALE.md` "cross-round comparability").

The job: shuffle + hash aggregate over 20M generated rows — pure JVM
CPU through the same whole-stage-codegen path the catalog's hot
aggregates take, no file I/O (bench.py carries separate io/arrow
diagnostic canaries for the other axes).
"""

from __future__ import annotations

import time


def shuffle_canary_sec(spark) -> float:
    """One canary sample (seconds). Callers take min-of-N when they
    want the warm floor rather than the instantaneous box state."""
    t0 = time.perf_counter()
    (
        spark.range(20_000_000)
        .selectExpr("id % 997 AS k", "id * 2654435761 % 1000003 AS v")
        .groupBy("k")
        .agg({"v": "sum", "*": "count"})
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    return time.perf_counter() - t0


def _grouped_kernel(pdf):
    """Fixed synthetic grouped-map kernel: sort + diff + rolling median
    + reduce — the same pandas op mix the W1/W2/W7 kernels run, scaled
    to a ~0.5 s job."""
    import pandas as pd

    s = pdf.sort_values("t")
    v = s["v"]
    r = v.diff().abs().fillna(0.0).rolling(20, min_periods=1).median()
    return pd.DataFrame(
        {"g": [int(s["g"].iat[0])], "x": [float((v - r).sum())]}
    )


def arrow_canary_sec(spark) -> float:
    """One sample of the SECOND box axis: a grouped-map applyInPandas
    job through the Python worker pool. The shuffle canary has been
    observed reading FASTER than calibration in the same window where
    every applyInPandas entry sat ~1.5x its floor (r10) and +10% while
    their kernels were untouched (r12) — whatever stalls this box hits
    the Python-worker/Arrow axis independently of the JVM-shuffle axis,
    so entries whose hot path is a grouped-map/pandas_udf kernel must
    normalize by THIS job, not the shuffle one.

    r14→r15 revision: the job was an identity mapInPandas round-trip,
    and the r14 driver window proved it tracks a DIFFERENT axis than
    the grouped-map entries — the identity canary read equal-or-FASTER
    than calibration while w1/w2/w7/r2 raws ran 2-3x their floors, and
    a same-session worktree A/B against the r13-end commit showed no
    code regression (SCALE.md round-15 entry). The canary now runs the
    actual hot shape (group-hash exchange, per-group pandas kernel
    invocations, real pandas compute), so grouped-map stalls move it."""
    t0 = time.perf_counter()
    (
        spark.range(500_000)
        .selectExpr(
            "id % 1000 AS g",
            "id AS t",
            "CAST(id * 2654435761 % 9973 AS DOUBLE) / 100.0 AS v",
        )
        .groupBy("g")
        .applyInPandas(_grouped_kernel, "g long, x double")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    return time.perf_counter() - t0
