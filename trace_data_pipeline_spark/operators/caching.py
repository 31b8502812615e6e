"""Tracked persist: cache reused subframes without leaking them.

Spark has no cross-branch common-subplan reuse, so a frame feeding
several consumers (a shingle index, a hot-key diagnostic) must be
`.persist()`-ed — but a catalog entry returns a *lazy* DataFrame, so
the entry itself has no "after the action" point to unpersist at. In a
long-lived session those caches accumulate.

`tracked_persist` registers every cache it creates; the driver of the
session (bench.py between queries, run.py at pipeline end, a notebook
user at will) calls `release_caches()` once the consuming actions are
done. Weak references keep the registry from pinning frames the caller
already dropped.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame

_TRACKED: list[weakref.ref] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """`df.persist()` + registration for later `release_caches()`."""
    df = df.persist()
    _TRACKED.append(weakref.ref(df))
    return df


def release_caches() -> int:
    """Unpersist every still-alive tracked frame; returns how many."""
    released = 0
    while _TRACKED:
        ref = _TRACKED.pop()
        df = ref()
        if df is not None:
            try:
                df.unpersist()
                released += 1
            except Exception:  # session already stopped — nothing to free
                pass
    return released
