"""Dick-Nielsen style cleaning joins (SURVEY.md §2.3 J1–J7).

The reference removes cancelled/corrected/reversed trade reports with
composite-key anti-joins built from concatenated strings
(`stage0/create_daily_enhanced_trace.py:1661-1741`) and SAS-style
sequence matching (`:1912-2057`). Spark expresses all of them as
first-class multi-column left_anti / left_semi joins — no string
concatenation (which would defeat column statistics and waste memory)
— plus row_number windows for the sequence matches.

Scale notes: the removal side (cancels/corrections/reversals) is a few
percent of trades; Catalyst/AQE broadcasts it when small. The keys all
contain the entity id, so pre-partitioning by id co-locates every
cleaning join in one shuffle.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def anti_join_keys(
    df: DataFrame,
    removals: DataFrame,
    keys: Sequence[str] | Mapping[str, str],
    null_safe: bool = True,
) -> DataFrame:
    """J1/J3: drop rows of `df` whose composite key appears in
    `removals`. `keys` may be a mapping {df_col: removals_col} for the
    asymmetric variants (J2: survivors' msg_seq_nb = reversals'
    orig_msg_seq_nb). Null-safe equality mirrors the reference's
    string-concat keys, where NaN became the literal 'nan' and thus
    *did* match.

    The removal side is renamed into reserved columns before the join,
    so self-derived frames (cancels filtered from the same scan) don't
    trip ambiguous-attribute resolution."""
    key_map = {k: k for k in keys} if not isinstance(keys, Mapping) else dict(keys)
    rhs = removals.select(
        *[F.col(rk).alias(f"__rm_{lk}") for lk, rk in key_map.items()]
    ).dropDuplicates()
    op = "eqNullSafe" if null_safe else "__eq__"
    cond = None
    for lk in key_map:
        c = getattr(F.col(lk), op)(F.col(f"__rm_{lk}"))
        cond = c if cond is None else (cond & c)
    return df.join(rhs, cond, "left_anti")


def add_seq(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
    seq_col: str = "seq",
) -> DataFrame:
    """W5: SAS BY-group sequence number — cumcount+1 per key group
    (`create_daily_standard_trace.py:109-117`). A total `order_by` makes
    it deterministic under shuffle."""
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        *[F.col(c) if isinstance(c, str) else c for c in order_by]
    )
    return df.withColumn(seq_col, F.row_number().over(w))


def sequence_match_removal(
    trades: DataFrame,
    reversals: DataFrame,
    keys: Sequence[str],
    trade_order: Sequence[Column | str],
    reversal_order: Sequence[Column | str],
) -> DataFrame:
    """J5/J6: pair the i-th reversal with the i-th matching trade under
    the composite key, and remove exactly the paired trades
    (`create_daily_enhanced_trace.py:1912-2057`). Both sides get a
    within-group sequence; matched (keys, seq) pairs are removed with a
    left_anti join."""
    t_seq = add_seq(trades, keys, trade_order, "__seq")
    r_seq = add_seq(reversals, keys, reversal_order, "__seq").select(
        *[F.col(k) for k in keys], F.col("__seq")
    )
    survivors = t_seq.join(r_seq, [*keys, "__seq"], "left_anti")
    return survivors.drop("__seq")


def agency_dedup(
    trades: DataFrame,
    customer_pred: Column,
    sell_pred: Column,
    buy_pred: Column,
    match_keys: Sequence[str],
    aggressive: bool = False,
) -> DataFrame:
    """J7: inter-dealer double-count removal
    (`create_daily_enhanced_trace.py:2061-2229`). Keep customer trades
    and dealer-sells; drop dealer-buys that match a sell on the key set
    (time deliberately excluded from keys). Aggressive mode drops all
    dealer-buys.

    NOT null-safe: the reference matches via pd.merge (`:2203-2209`),
    where a NaN key never equals a NaN key, so a dealer-buy with a null
    price/volume is always kept — and nulls ARE reachable here, because
    agency cleaning runs before the price screens (`:523` vs `:608`).
    Contrast J1/J3, whose reference builds string-concat keys where NaN
    becomes the literal 'nan' and does match (anti_join_keys default)."""
    customer = trades.filter(customer_pred)
    sells = trades.filter(sell_pred)
    buys = trades.filter(buy_pred)
    if aggressive:
        return customer.unionByName(sells)
    unmatched_buys = anti_join_keys(buys, sells, list(match_keys), null_safe=False)
    return customer.unionByName(sells).unionByName(unmatched_buys)


def correction_chain_resolution(
    trades: DataFrame,
    corrections: DataFrame,
    keys: Sequence[str],
    msg_col: str = "msg_seq_nb",
    orig_col: str = "orig_msg_seq_nb",
) -> DataFrame:
    """J4 (pre-2012 'W' records): resolve chains of corrections where a
    W record may correct another W (`create_daily_enhanced_trace.py:
    1827-1907`). A W whose msg_seq_nb is referenced by another W's
    orig_msg_seq_nb is itself superseded; chain heads are the W rows
    never referenced. Heads replace the T rows (and intermediate Ws)
    they transitively point at.

    Implementation: within (keys) — unpivot each W into its (msg) and
    (orig) roles, count appearances per sequence number; numbers that
    appear only as 'orig' belong to replaced records, numbers that
    appear only as 'msg' are chain heads. Matched T rows are removed
    with an anti-join on (keys, msg == head.orig-chain target) and the
    head W rows are substituted in.

    Note: this resolves one level of chaining per pass over single-link
    chains the way the reference's appearance-count heuristic does —
    semantics follow the reference's napp/ntype logic, not full
    transitive closure.
    """
    k = [F.col(c) for c in keys]
    msg_side = corrections.select(*k, F.col(msg_col).alias("nb"), F.lit("msg").alias("role"))
    orig_side = corrections.select(*k, F.col(orig_col).alias("nb"), F.lit("omsg").alias("role"))
    roles = msg_side.unionByName(orig_side).filter(F.col("nb").isNotNull())
    counts = roles.groupBy(*k, F.col("nb")).agg(
        F.count(F.lit(1)).alias("napp"),
        F.countDistinct("role").alias("ntype"),
    )
    # chain heads: W rows whose msg_seq_nb never appears as another W's orig
    referenced = counts.filter((F.col("ntype") == 2) | (F.col("napp") > 1)).select(
        *k, F.col("nb").alias(msg_col)
    )
    heads = anti_join_keys(corrections, referenced, [*keys, msg_col])
    # remove T rows targeted by any correction in the chain
    targets = corrections.select(*k, F.col(orig_col).alias(msg_col)).dropDuplicates()
    survivors = anti_join_keys(trades, targets, [*keys, msg_col])
    return survivors.unionByName(heads.select(*trades.columns))
