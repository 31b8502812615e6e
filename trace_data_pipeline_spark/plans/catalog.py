"""Query catalog — the driver contract's backing registry.

Each entry pairs a Spark plan builder (spark, sf_dir) -> DataFrame with
an equivalent ANSI-SQL oracle string for DuckDB — every current entry
has one (even the W2 grouped-map state machine, folded as a recursive
CTE); None would fall back to a rows-only check.

Design rules for oracle parity (floating point):
- every computed float column is ROUNDed identically on both sides;
  quotients/means round fine because their *relative* error is ~1e-15,
  while raw sums of large magnitudes may not — so plans round ratios,
  not intermediate sums;
- rankings over floats always rank the ROUNDED value with an id
  tiebreak so ulp-level engine differences can't reorder rows;
- timestamps are grouped via formatted strings (yyyy-MM etc.), never
  raw date_trunc results, to avoid dtype mismatches between engines;
- NEVER float-ROUND a value that is an exact short decimal one digit
  past the rounding scale — it lands exactly on the half and the
  engines split (Spark rounds the shortest decimal repr HALF_UP,
  DuckDB rounds the binary value). p8's ES (an exact 10dp rational
  over k∈{1,2}) hit this live at sf0.001; such quotients must use the
  integer half-up formulation (round_ratio_half_up[_wide]). Rounds of
  full-mantissa doubles (returns, interpolations, float means) and
  no-op rounds of values already exact at the target scale (a8's
  quantiles: 2dp values × 2dp fracs = exact 4dp) are safe — audited
  round 9 across the catalog.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name, fn, oracle, doc or (fn.__doc__ or "").strip())
        return fn

    return deco


def get_catalog() -> dict[str, Query]:
    # import for side effect: modules register their queries
    from trace_data_pipeline_spark.plans import (  # noqa: F401
        bond_plan,
        datapipe,
        distressed_plan,
        enrichment,
        errorcorrection,
        relational,
        stage1,
        stage2,
        streaming_parity,
    )

    return dict(_REGISTRY)
