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


def arrow_canary_sec(spark) -> float:
    """One sample of the SECOND box axis: an Arrow round-trip through
    the Python worker pool (identity mapInPandas over 2M generated
    rows). The shuffle canary has been observed reading FASTER than
    calibration in the same window where every applyInPandas entry sat
    ~1.5x its floor (r10) and +10% while their kernels were untouched
    (r12) — whatever stalls this box hits the Python-worker/Arrow axis
    independently of the JVM-shuffle axis, so entries whose hot path is
    a grouped-map/pandas_udf kernel must normalize by THIS job, not the
    shuffle one."""
    t0 = time.perf_counter()
    (
        spark.range(2_000_000)
        .repartition(8)
        .mapInPandas(lambda it: it, "id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    return time.perf_counter() - t0
