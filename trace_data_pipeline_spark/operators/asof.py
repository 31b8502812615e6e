"""As-of (backward/forward) join (SURVEY.md §2.3 J11/J12).

The reference uses pandas ``merge_asof(direction='backward',
by=cusip)`` for amount-outstanding and rating histories
(`stage1/stage1_pipeline.py:714-759, 877-902`). Spark has no native
as-of join; the scalable pattern is union-the-two-sides + a
last-non-null window:

    left rows tagged 1, right rows tagged 0 (exact matches visible)
    window: partitionBy(by) orderBy(on, tag) rows(-inf, 0)
    payload := last(payload, ignorenulls=True) over window

One shuffle on `by`, no join explosion, no per-group pandas — it scales
to arbitrarily large right sides (rating histories at 100 TB), unlike
the `applyInPandas`+merge_asof alternative which would require both
sides of a group to fit in one task's memory.

Tie semantics match merge_asof's default ``allow_exact_matches=True``:
a right row AT the left timestamp is taken (right sorts before left at
equal keys). Pass allow_exact=False for strict '<'.

WHOLE-ROW semantics (merge_asof parity, round-12 review): the value
columns ride ONE struct payload through the fill, so every attached
value comes from the SAME right row — per-column last-non-null would
mix vintages (col A from one row, col B from an older one) and skip a
genuine null in the matched row. With duplicate right timestamps per
key, pass `tiebreak_cols` for a deterministic pick; without one the
choice among equal-timestamp right rows is partition-order-dependent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TAG = "__asof_side"
_PAYLOAD = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str],
    value_cols: Sequence[str],
    direction: str = "backward",
    allow_exact: bool = True,
    tiebreak_cols: Sequence[str] | None = None,
) -> DataFrame:
    """For each left row, attach `value_cols` from the latest right row
    with right.on <= left.on (backward) or earliest >= (forward),
    matching within `by` groups. All values come from one right row
    (whole-row semantics). Among right rows tied on `on`,
    `tiebreak_cols` picks deterministically: the GREATEST tiebreak for
    backward, the LEAST for forward — the row merge_asof would take
    when the tiebreak mirrors input position."""
    by = [by] if isinstance(by, str) else list(by)
    value_cols = list(value_cols)
    tiebreak_cols = list(tiebreak_cols or [])
    for v in value_cols:
        if v in left.columns:
            raise ValueError(f"value column {v!r} already exists on left")

    left_tag, right_tag = (1, 0) if allow_exact else (0, 1)
    payload_type = T.StructType([right.schema[v] for v in value_cols])
    tb_names = [f"__asof_tb{i}" for i in range(len(tiebreak_cols))]

    l_tagged = left.withColumn(_TAG, F.lit(left_tag)).withColumn(
        _PAYLOAD, F.lit(None).cast(payload_type)
    )
    r_tagged = right.select(
        *[F.col(c) for c in by],
        F.col(on),
        F.lit(right_tag).alias(_TAG),
        F.struct(*[F.col(v) for v in value_cols]).alias(_PAYLOAD),
        *[F.col(tb).alias(nm) for tb, nm in zip(tiebreak_cols, tb_names)],
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    if direction == "backward":
        order = [F.col(on).asc(), F.col(_TAG).asc()] + [
            F.col(nm).asc_nulls_first() for nm in tb_names
        ]
    elif direction == "forward":
        order = [F.col(on).desc(), F.col(_TAG).asc()] + [
            F.col(nm).desc_nulls_first() for nm in tb_names
        ]
    else:
        raise ValueError(f"unknown direction {direction!r}")
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    filled = unioned.withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)
    )
    return filled.filter(F.col(_TAG) == left_tag).select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"{_PAYLOAD}.{v}").alias(v) for v in value_cols],
    )
