"""Order-sensitive first/last aggregation.

The reference relies on pandas ``first``/``last`` after a stable 6-key
mergesort (`stage0/create_daily_enhanced_trace.py:488-489,538`). Spark's
``first()``/``last()`` aggregate is non-deterministic under shuffle, so
the engine never uses it on a data path; instead ``min_by``/``max_by``
over a struct of the *full* tiebreak key gives deterministic
order-sensitive selection with a single hash aggregate (no window, no
extra shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def order_key(*order_cols: Column | str) -> Column:
    """A lexicographically ordered struct usable as a min_by/max_by key."""
    return F.struct(*[_as_col(c) for c in order_cols])


def first_by(value: Column | str, *order_cols: Column | str) -> Column:
    """Value of `value` on the row that sorts first by `order_cols`."""
    return F.min_by(_as_col(value), order_key(*order_cols))


def last_by(value: Column | str, *order_cols: Column | str) -> Column:
    """Value of `value` on the row that sorts last by `order_cols`."""
    return F.max_by(_as_col(value), order_key(*order_cols))
