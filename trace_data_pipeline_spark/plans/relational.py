"""Relational query catalog: SURVEY.md §2 operators on the driver tables.

Mapping convention (FIXTURES.md): lineitem plays the intraday trade
table — l_suppkey ≈ cusip_id, l_shipdate ≈ trd_exctn_dt,
l_extendedprice ≈ rptd_pr, l_quantity ≈ entrd_vol_qt, and
(l_orderkey, l_linenumber) the report-sequence tiebreak; events plays a
per-entity ordered series (user_id ≈ cusip_id, ts ≈ execution time,
value ≈ price).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from trace_data_pipeline_spark.functions.ordered import first_by, last_by, packed_order_key

from trace_data_pipeline_spark.functions.scalars import (
    round_ratio_half_up,
    seconds_after_midnight,
)
from trace_data_pipeline_spark.operators.analytics import (
    concentration_metrics,
    map_via_case,
    piecewise_linear,
    piecewise_linear_cols,
    pooled_stats,
    trade_counts_by_month,
    winsorize_by_group,
)
from trace_data_pipeline_spark.operators.asof import asof_join
from trace_data_pipeline_spark.operators.cleaning import (
    agency_dedup,
    anti_join_keys,
    sequence_match_removal,
    standard_reversal_removal,
)
from trace_data_pipeline_spark.operators.daily_agg import bid_ask_panel
from trace_data_pipeline_spark.operators.dedup import keep_first, prefer_sources
from trace_data_pipeline_spark.operators.filters import (
    isin_keep_null,
    null_keeping_neq,
    time_window_filter,
    volume_filter,
)
from trace_data_pipeline_spark.operators.interval import range_join
from trace_data_pipeline_spark.operators.windows import (
    consecutive_log_return_filter,
    group_diff,
    initial_price_error_filter,
    price_flags,
)
from trace_data_pipeline_spark.plans.catalog import register
from trace_data_pipeline_spark.sources import load_table


def _li_tiebreak(cents):
    """Report-sequence tiebreak for the lineitem panels, packed into one
    decimal(38,0) so the panel stays a codegen'd HashAggregate (struct
    keys demote min_by aggregates to SortAggregate). Budgets: okey spans
    the full bigint domain, line < 1e4, price cents < 1e12 — property-
    tested at the bounds in tests/test_properties.py."""
    return packed_order_key(
        (F.col("l_orderkey"), 19),
        (F.col("l_linenumber").cast("long"), 4),
        (cents, 12),
    )


def _packed_price(agg_key):
    """Price cents are the LOW 12 digits of the packed tiebreak key, so
    the order-sensitive first/last price is min/max of the KEY with an
    arithmetic unpack — no min_by/max_by at all (their agg buffer
    carries value + ordering and costs ~2× a plain decimal min in the
    a1 ablation). Exact reconstruction: cents < 1e12 < 2^53, and
    double(cents)/100 rounds to the identical double as the source
    2-decimal price.

    DOMAIN CONTRACT (ADVICE r4, relational.py:75): reconstruction is
    bit-exact ONLY for prices that are exactly-2-decimal doubles — the
    round-trip through `round(p*100)` half-up-rounds a >2dp price, so
    the unpacked first/last would silently differ from the true row
    value where a min_by-based selection would not. Both call sites
    (a1/a2 lineitem panel, p3 standard composite) read
    `l_extendedprice`, which TPC-H defines as an exact 2-decimal
    amount; pinned by tests/test_properties.py::
    test_packed_price_requires_2dp_domain. Columns WITHOUT that
    guarantee must keep `first_by`/`last_by` on the value instead."""
    pow12 = F.lit(str(10**12)).cast("decimal(20,0)")
    return (agg_key % pow12).cast("double") / F.lit(100.0)


# ---------------------------------------------------------------- A1/A2


@register(
    "a1_daily_panel",
    oracle="""
    SELECT l_suppkey,
           strftime(l_shipdate, '%Y-%m') AS month,
           CAST((2 * SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) * 10000
                 + 100 * COUNT(*)) // (200 * COUNT(*)) AS DOUBLE) / 10000 AS prc_ew,
           ROUND(SUM(l_extendedprice * (l_extendedprice * l_quantity / 100))
                 / SUM(l_extendedprice * l_quantity / 100), 4) AS prc_vw,
           CAST((2 * SUM(CAST(round(l_extendedprice * l_quantity * 100, 0) AS BIGINT)) * 10000
                 + 100 * SUM(CAST(l_quantity AS BIGINT)))
                // (200 * SUM(CAST(l_quantity AS BIGINT))) AS DOUBLE) / 10000 AS prc_vw_par,
           MIN_BY(l_extendedprice, (CAST(l_orderkey AS HUGEINT) * 10 + l_linenumber)
                  * 100000000
                  + CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS prc_first,
           MAX_BY(l_extendedprice, (CAST(l_orderkey AS HUGEINT) * 10 + l_linenumber)
                  * 100000000
                  + CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS prc_last,
           MAX(l_extendedprice) AS prc_hi,
           MIN(l_extendedprice) AS prc_lo,
           COUNT(*) AS trade_count,
           ROUND(SUM(l_quantity), 2) AS qvolume,
           CAST(ROUND(SUM(CAST(l_extendedprice * l_quantity / 100
                               AS DECIMAL(28,6))), 2) AS DOUBLE) AS dvolume
    FROM lineitem
    GROUP BY 1, 2
    """,
)
def a1_daily_panel(spark, sf_dir):
    """A1+A2 daily panel (flagship): per (entity, period) equal-/value-/
    par-weighted prices, deterministic order-sensitive first/last via
    min_by/max_by over the full tiebreak key, hi/lo/count/volumes.
    One hash aggregate — the reference's per-chunk partials+concat
    (A4) collapse into Spark's partial/final aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    p, q = F.col("l_extendedprice"), F.col("l_quantity")
    dv = p * q / F.lit(100)
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic data, so
    # the report-sequence key alone isn't total — append the price cents
    # to make first/last deterministic (ties on the full key carry equal
    # values, so the selection is then well-defined). The tiebreak packs
    # into ONE decimal(38,0) (okey over the FULL bigint domain — the
    # dimension that grows with data scale — then line < 1e4, cents <
    # 1e12): a struct key would be totally ordered too, but min_by over
    # a struct demotes the whole panel to SortAggregate (measured 3×);
    # the packed decimal keeps the single codegen'd HashAggregate. The
    # DuckDB oracle packs into HUGEINT, order-identical on the shared
    # domain (tests/test_properties.py::test_a1_packed_tiebreak).
    # exact fixed-point sums: prices are 2-decimal, quantities integer, so
    # the equal-/par-weighted means have true decimal ties at 4dp (e.g.
    # sum/8) — round_ratio_half_up keeps them reproducible across engines
    cents = F.round(p * 100, 0).cast("long")
    pq_cents = F.round(p * q * 100, 0).cast("long")
    n = F.count(F.lit(1))
    # group on the TRUNCATED month and render the "yyyy-MM" string AFTER
    # aggregation: the Java date formatter costs ~0.5 s over the 600k-row
    # fact scan but microseconds over the aggregated panel
    panel = li.groupBy(
        F.col("l_suppkey"), F.date_trunc("month", F.col("l_shipdate")).alias("__m")
    ).agg(
        round_ratio_half_up(F.sum(cents), n * 100, 4).alias("prc_ew"),
        F.round(F.sum(p * dv) / F.sum(dv), 4).alias("prc_vw"),
        round_ratio_half_up(
            F.sum(pq_cents), F.sum(q.cast("long")) * 100, 4
        ).alias("prc_vw_par"),
        _packed_price(F.min(_li_tiebreak(cents))).alias("prc_first"),
        _packed_price(F.max(_li_tiebreak(cents))).alias("prc_last"),
        F.max(p).alias("prc_hi"),
        F.min(p).alias("prc_lo"),
        F.count(F.lit(1)).alias("trade_count"),
        F.round(F.sum(q), 2).alias("qvolume"),
        # exact-decimal accumulation: float sums are order-dependent across
        # engines/partitionings, so ROUND(float_sum, 2) can flip the last
        # digit; decimal(28,6) makes the sum associative and reproducible
        F.round(F.sum(dv.cast("decimal(28,6)")), 2).cast("double").alias("dvolume"),
    )
    return panel.select(
        "l_suppkey",
        F.date_format("__m", "yyyy-MM").alias("month"),
        "prc_ew", "prc_vw", "prc_vw_par", "prc_first", "prc_last",
        "prc_hi", "prc_lo", "trade_count", "qvolume", "dvolume",
    )


@register(
    "a3_bid_ask",
    oracle="""
    WITH bid AS (
      SELECT l_suppkey, strftime(l_shipdate, '%Y-%m') AS month,
             ROUND(SUM(l_extendedprice * (l_extendedprice * l_quantity / 100))
                   / SUM(l_extendedprice * l_quantity / 100), 4) AS prc_bid,
             COUNT(*) AS bid_count
      FROM lineitem WHERE l_returnflag = 'A' GROUP BY 1, 2
    ), ask AS (
      SELECT l_suppkey, strftime(l_shipdate, '%Y-%m') AS month,
             ROUND(SUM(l_extendedprice * (l_extendedprice * l_quantity / 100))
                   / SUM(l_extendedprice * l_quantity / 100), 4) AS prc_ask,
             COUNT(*) AS ask_count
      FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1, 2
    )
    SELECT COALESCE(bid.l_suppkey, ask.l_suppkey) AS l_suppkey,
           COALESCE(bid.month, ask.month) AS month,
           prc_bid, bid_count, prc_ask, ask_count
    FROM bid FULL OUTER JOIN ask
      ON bid.l_suppkey = ask.l_suppkey AND bid.month = ask.month
    """,
)
def a3_bid_ask(spark, sf_dir):
    """A3+J9: value-weighted bid/ask side panels, full-outer merged on
    the panel key. Two filtered aggregates over one scan; the algebraic
    Σ(p·dv)/Σ(dv) replaces the reference's transform('sum') weights."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "month", F.date_format("l_shipdate", "yyyy-MM")
    )
    panel = bid_ask_panel(
        li,
        bid_pred=F.col("l_returnflag") == "A",
        ask_pred=F.col("l_returnflag") == "R",
        id_col="l_suppkey",
        date_col="month",
        price_col="l_extendedprice",
        qty_col="l_quantity",
    )
    return panel.select(
        "l_suppkey",
        "month",
        F.round("prc_bid", 4).alias("prc_bid"),
        "bid_count",
        F.round("prc_ask", 4).alias("prc_ask"),
        "ask_count",
    )


# ---------------------------------------------------------------- filters


@register(
    "f1_f4_price_volume_screens",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity,
           ROUND(l_extendedprice * l_quantity / 100, 4) AS dollar_vol
    FROM lineitem
    WHERE l_extendedprice > 0 AND l_extendedprice <= 100000
      AND l_extendedprice * l_quantity / 100 >= 5000
    """,
)
def f1_f4_price_volume_screens(spark, sf_dir):
    """F1–F4: positive-price / large-price screens + derived dollar
    volume + config-driven volume threshold. Predicates push to the
    parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    out = li.filter((F.col("l_extendedprice") > 0) & (F.col("l_extendedprice") <= 100000))
    out = volume_filter(out, "l_extendedprice", "l_quantity", kind="dollar", threshold=5000)
    return out.select(
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        "l_quantity",
        F.round("dollar_vol", 4).alias("dollar_vol"),
    )


@register(
    "f5_null_keep_neq",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_discount,
           CASE WHEN l_tax < 0.02 THEN NULL ELSE l_tax END AS tax_n
    FROM lineitem
    WHERE l_discount != (CASE WHEN l_tax < 0.02 THEN NULL ELSE l_tax END)
       OR (CASE WHEN l_tax < 0.02 THEN NULL ELSE l_tax END) IS NULL
    """,
)
def f5_null_keep_neq(spark, sf_dir):
    """F5: `a != b OR b IS NULL` — the reference's explicit null-keep
    under SQL three-valued logic (yld≠price screen)."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "tax_n", F.when(F.col("l_tax") < 0.02, F.lit(None)).otherwise(F.col("l_tax"))
    )
    return li.filter(null_keeping_neq("l_discount", "tax_n")).select(
        "l_orderkey", "l_linenumber", "l_discount", "tax_n"
    )


@register(
    "f8_time_window_wrap",
    oracle="""
    SELECT event_id FROM events
    WHERE (hour(ts) * 3600 + minute(ts) * 60 + second(ts)) >= 79200
       OR (hour(ts) * 3600 + minute(ts) * 60 + second(ts)) <= 9000
    """,
)
def f8_time_window_wrap(spark, sf_dir):
    """F8: inclusive intraday time window with wrap-around (22:00:00 →
    02:30:00 crosses midnight ⇒ t>=start OR t<=end)."""
    ev = load_table(spark, sf_dir, "events")
    secs = seconds_after_midnight(F.col("ts"))
    return time_window_filter(ev, secs, "22:00:00", "02:30:00").select("event_id")


@register(
    "f9_calendar_semi_join",
    oracle="""
    SELECT l_orderkey, l_linenumber FROM lineitem
    WHERE CAST(l_shipdate AS DATE) IN
          (SELECT DISTINCT CAST(o_orderdate AS DATE) FROM orders)
    """,
)
def f9_calendar_semi_join(spark, sf_dir):
    """F9: trading-calendar screen as a broadcast left-semi join against
    a small calendar of valid sessions (order dates stand in)."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "ship_date", F.to_date("l_shipdate")
    )
    cal = (
        load_table(spark, sf_dir, "orders")
        .select(F.to_date("o_orderdate").alias("ship_date"))
        .distinct()
    )
    return li.join(F.broadcast(cal), ["ship_date"], "left_semi").select(
        "l_orderkey", "l_linenumber"
    )


@register(
    "f10_universe_screens",
    oracle="""
    SELECT p_partkey FROM part
    WHERE p_size >= 1 AND p_size <= 40
      AND p_type != 'ECONOMY'
      AND p_brand NOT IN ('Brand#1', 'Brand#2')
      AND NOT COALESCE(regexp_matches(p_name, '(?i)(ring|bolt)'), FALSE)
      AND p_retailprice IS NOT NULL
    """,
)
def f10_universe_screens(spark, sf_dir):
    """F10: chained universe screens — range, not-equal, not-in set,
    negated case-insensitive regex with the reference's na=False null
    branch (null name ⇒ keep), non-null."""
    part = load_table(spark, sf_dir, "part")
    name_match = F.coalesce(F.col("p_name").rlike("(?i)(ring|bolt)"), F.lit(False))
    return part.filter(
        (F.col("p_size") >= 1)
        & (F.col("p_size") <= 40)
        & (F.col("p_type") != "ECONOMY")
        & (~F.col("p_brand").isin("Brand#1", "Brand#2"))
        & (~name_match)
        & F.col("p_retailprice").isNotNull()
    ).select("p_partkey")


@register(
    "f11_membership_null_keep",
    oracle="""
    SELECT event_id FROM events
    WHERE event_type IN ('click', 'view', 'purchase') OR event_type IS NULL
    """,
)
def f11_membership_null_keep(spark, sf_dir):
    """F11: set membership with an explicit null-keep disjunct (the
    pre-2012 record screens coerce NaN before isin)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        isin_keep_null("event_type", ["click", "view", "purchase"], keep_null=True)
    ).select("event_id")


@register(
    "f15_price_flags",
    oracle="""
    WITH seq AS (
      SELECT event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS d
      FROM events
    )
    SELECT event_id,
           CAST(CASE WHEN value > 300 THEN 1 ELSE 0 END AS BIGINT) AS prc_high,
           CAST(CASE WHEN rn = 2 AND abs(d) > 150 THEN 1 ELSE 0 END AS BIGINT) AS prc_dip
    FROM seq
    """,
)
def f15_price_flags(spark, sf_dir):
    """F15: prc_high threshold flag + prc_dip (second observation
    flagged when the first change is a big jump) via lag/row_number."""
    ev = load_table(spark, sf_dir, "events")
    flagged = price_flags(
        ev, "value", ["user_id"], ["ts", "event_id"], high_threshold=300.0, dip_jump=150.0
    )
    return flagged.select(
        "event_id",
        F.col("prc_high").cast("long").alias("prc_high"),
        F.col("prc_dip").cast("long").alias("prc_dip"),
    )


# ---------------------------------------------------------------- joins


@register(
    "j1_cancel_anti_join",
    oracle="""
    SELECT t.l_orderkey, t.l_linenumber FROM lineitem t
    WHERE t.l_returnflag IN ('N', 'A')
      AND NOT EXISTS (
        SELECT 1 FROM lineitem c
        WHERE c.l_returnflag = 'R'
          AND c.l_orderkey = t.l_orderkey AND c.l_partkey = t.l_partkey
          AND c.l_suppkey = t.l_suppkey AND c.l_quantity = t.l_quantity
      )
    """,
)
def j1_cancel_anti_join(spark, sf_dir):
    """J1/J3: cancel/correction removal — multi-column left_anti join on
    the composite trade key (no string-concat keys)."""
    li = load_table(spark, sf_dir, "lineitem")
    trades = li.filter(F.col("l_returnflag").isin("N", "A"))
    cancels = li.filter(F.col("l_returnflag") == "R")
    keys = ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity"]
    return anti_join_keys(trades, cancels, keys).select("l_orderkey", "l_linenumber")


@register(
    "j2_reversal_anti_join_asym",
    oracle="""
    SELECT t.l_orderkey, t.l_linenumber FROM lineitem t
    WHERE t.l_returnflag IN ('N', 'A')
      AND NOT EXISTS (
        SELECT 1 FROM lineitem r
        WHERE r.l_returnflag = 'R'
          AND r.l_orderkey = t.l_orderkey
          AND r.l_linenumber - 1 = t.l_linenumber
      )
    """,
)
def j2_reversal_anti_join_asym(spark, sf_dir):
    """J2: asymmetric anti-join — survivors matched on the removal
    side's *derived* key (reversals point at originals via
    orig_msg_seq_nb; here linenumber-1)."""
    li = load_table(spark, sf_dir, "lineitem")
    trades = li.filter(F.col("l_returnflag").isin("N", "A"))
    reversals = li.filter(F.col("l_returnflag") == "R").withColumn(
        "orig_linenumber", F.col("l_linenumber") - 1
    )
    return anti_join_keys(
        trades,
        reversals,
        {"l_orderkey": "l_orderkey", "l_linenumber": "orig_linenumber"},
    ).select("l_orderkey", "l_linenumber")


@register(
    "j5_sequence_match",
    oracle="""
    WITH trades AS (
      SELECT l_orderkey, l_linenumber,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY l_shipdate, l_linenumber) AS seq
      FROM lineitem WHERE l_returnflag IN ('N', 'A')
    ), reversals AS (
      SELECT l_orderkey,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY l_shipdate, l_linenumber) AS seq
      FROM lineitem WHERE l_returnflag = 'R'
    )
    SELECT t.l_orderkey, t.l_linenumber FROM trades t
    WHERE NOT EXISTS (
      SELECT 1 FROM reversals r
      WHERE r.l_orderkey = t.l_orderkey AND r.seq = t.seq
    )
    """,
)
def j5_sequence_match(spark, sf_dir):
    """J5/J6: SAS-style sequence-matched removal — i-th reversal knocks
    out the i-th matching trade under the group key (row_number on both
    sides + anti-join on keys+seq)."""
    li = load_table(spark, sf_dir, "lineitem")
    trades = li.filter(F.col("l_returnflag").isin("N", "A"))
    reversals = li.filter(F.col("l_returnflag") == "R")
    out = sequence_match_removal(
        trades,
        reversals,
        keys=["l_orderkey"],
        trade_order=["l_shipdate", "l_linenumber"],
        reversal_order=["l_shipdate", "l_linenumber"],
    )
    return out.select("l_orderkey", "l_linenumber")


@register(
    "j7_agency_dedup",
    oracle="""
    SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_returnflag = 'N'
    UNION ALL
    SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_returnflag = 'A'
    UNION ALL
    SELECT b.l_orderkey, b.l_linenumber FROM lineitem b
    WHERE b.l_returnflag = 'R'
      AND NOT EXISTS (
        SELECT 1 FROM lineitem s
        WHERE s.l_returnflag = 'A'
          AND s.l_partkey = b.l_partkey AND s.l_quantity = b.l_quantity
      )
    """,
)
def j7_agency_dedup(spark, sf_dir):
    """J7: inter-dealer de-dup — keep customer legs and dealer-sells,
    drop dealer-buys matching a sell on the match keys (time excluded
    by design)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = agency_dedup(
        li,
        customer_pred=F.col("l_returnflag") == "N",
        sell_pred=F.col("l_returnflag") == "A",
        buy_pred=F.col("l_returnflag") == "R",
        match_keys=["l_partkey", "l_quantity"],
    )
    return out.select("l_orderkey", "l_linenumber")


@register(
    "j10_enrichment_join",
    oracle="""
    SELECT o.o_orderkey, c.c_name, c.c_mktsegment,
           ROUND(date_diff('day', CAST(o.o_orderdate AS DATE), DATE '2002-01-01')
                 / 365.25, 6) AS order_age_years
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def j10_enrichment_join(spark, sf_dir):
    """J10: reference-table enrichment left join + tenor derivation in
    years (/365.25). Dimension side broadcasts."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    joined = orders.join(
        F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"], "left"
    )
    age = F.datediff(F.lit("2002-01-01").cast("date"), F.to_date("o_orderdate")) / 365.25
    return joined.select(
        "o_orderkey", "c_name", "c_mktsegment", F.round(age, 6).alias("order_age_years")
    )


@register(
    "j11_asof_backward",
    oracle="""
    SELECT l.event_id, r.value AS last_purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def j11_asof_backward(spark, sf_dir):
    """J11/J12: backward as-of join (merge_asof semantics, exact matches
    allowed) via the union + last-non-null window pattern — one shuffle
    on the by-key, no join explosion, scales to unbounded history."""
    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    right = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id", "ts", F.col("value").alias("last_purchase_value"), "event_id"
        )
    )
    # event_id is monotone in input position, so the greatest-tiebreak
    # pick reproduces merge_asof's last-positioned-row among duplicate
    # right timestamps regardless of partitioning (testdata has unique
    # (user_id, ts) purchases, but determinism must not rest on that).
    out = asof_join(
        left,
        right,
        on="ts",
        by="user_id",
        value_cols=["last_purchase_value"],
        tiebreak_cols=["event_id"],
    )
    return out.select("event_id", "last_purchase_value")


@register(
    "j15_range_join",
    oracle="""
    SELECT p.p_partkey, COALESCE(r.size_class, 'other') AS size_class
    FROM part p
    LEFT JOIN (VALUES (1, 10, 'small'), (11, 25, 'medium'), (26, 40, 'large'))
         AS r(lo, hi, size_class)
      ON p.p_size >= r.lo AND p.p_size <= r.hi
    """,
)
def j15_range_join(spark, sf_dir):
    """J15: interval join against a broadcast range table with an
    'Other' fallback (SIC → Fama-French industries). Physical plan:
    BroadcastNestedLoopJoin — no shuffle of the fact side."""
    part = load_table(spark, sf_dir, "part")
    ranges = spark.createDataFrame(
        [(1, 10, "small"), (11, 25, "medium"), (26, 40, "large")],
        ["lo", "hi", "size_class"],
    )
    out = range_join(
        part, "p_size", ranges, "lo", "hi", ["size_class"], defaults={"size_class": "other"}
    )
    return out.select("p_partkey", "size_class")


@register(
    "j17_source_preference",
    oracle="""
    WITH tagged AS (
      SELECT l_orderkey, l_partkey, l_linenumber,
             CASE l_returnflag WHEN 'A' THEN 1 WHEN 'N' THEN 2 ELSE 3 END AS db_type
      FROM lineitem
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY l_orderkey, l_partkey
                                   ORDER BY db_type, l_linenumber) AS rn
      FROM tagged
    )
    SELECT l_orderkey, l_partkey, l_linenumber, db_type FROM ranked WHERE rn = 1
    """,
)
def j17_source_preference(spark, sf_dir):
    """J17: source-preference dedup (Enhanced ≻ Standard ≻ 144A) —
    union the tagged sources and keep the highest-priority row per key
    via a row_number window with a total tiebreak."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_linenumber", "l_returnflag"
    )
    sources = [
        (li.filter(F.col("l_returnflag") == "A").drop("l_returnflag"), 1),
        (li.filter(F.col("l_returnflag") == "N").drop("l_returnflag"), 2),
        (li.filter(F.col("l_returnflag") == "R").drop("l_returnflag"), 3),
    ]
    out = prefer_sources(
        sources, keys=["l_orderkey", "l_partkey"], tiebreak=["l_linenumber"]
    )
    return out.select("l_orderkey", "l_partkey", "l_linenumber", "db_type")


# ---------------------------------------------------------------- windows


@register(
    "w3_initial_price_errors",
    oracle="""
    WITH seq AS (
      SELECT event_id, user_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             abs(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS d
      FROM events
    ), fj AS (
      SELECT *, min(CASE WHEN rn <= 3 AND d > 200 THEN rn END)
                  OVER (PARTITION BY user_id) AS first_jump
      FROM seq
    )
    SELECT event_id FROM fj WHERE first_jump IS NULL OR rn >= first_jump
    """,
)
def w3_initial_price_errors(spark, sf_dir):
    """W3: initial-print error screen — within each entity's first 3
    observations, the first |Δ| > threshold marks everything before it
    as bad. Pure window algebra, no UDF."""
    ev = load_table(spark, sf_dir, "events")
    out = initial_price_error_filter(
        ev, "value", ["user_id"], ["ts", "event_id"], n_initial=3, jump_threshold=200.0
    )
    return out.select("event_id")


@register(
    "w4_group_diff",
    oracle="""
    SELECT event_id,
           value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS diff
    FROM events
    """,
)
def w4_group_diff(spark, sf_dir):
    """W4: per-group one-step difference (groupby().diff()) with a total
    ordering key."""
    ev = load_table(spark, sf_dir, "events")
    return group_diff(ev, "value", ["user_id"], ["ts", "event_id"]).select(
        "event_id", "diff"
    )


@register(
    "w5_sequence_number",
    oracle="""
    SELECT event_id,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
    FROM events
    """,
)
def w5_sequence_number(spark, sf_dir):
    """W5: SAS BY-group cumcount+1 → row_number over a deterministic
    window."""
    from trace_data_pipeline_spark.operators.cleaning import add_seq

    ev = load_table(spark, sf_dir, "events")
    return add_seq(ev, ["user_id"], ["ts", "event_id"]).select(
        "event_id", F.col("seq").cast("long").alias("seq")
    )


@register(
    "w6_log_return_filter",
    oracle="""
    WITH lp AS (
      -- Spark's log() is null on non-positive input; DuckDB's ln()
      -- throws — guard to match (zero prices are bad prints anyway)
      SELECT event_id, user_id, ts,
             CASE WHEN value > 0 THEN ln(value) END AS lv
      FROM events
    ), d AS (
      SELECT event_id, user_id,
             lv - lag(lv) OVER w AS d_in,
             lead(lv) OVER w - lv AS d_out
      FROM lp
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id FROM d
    WHERE d_in * d_out IS NULL OR d_in * d_out > -0.25
    """,
)
def w6_log_return_filter(spark, sf_dir):
    """W6: drop rows whose consecutive log-return product signals a
    spike-and-revert (< -0.25); null products (series edges) kept."""
    ev = load_table(spark, sf_dir, "events")
    out = consecutive_log_return_filter(
        ev, "value", ["user_id"], ["ts", "event_id"], threshold=-0.25
    )
    return out.select("event_id")


@register(
    "w8_rating_map",
    oracle="""
    SELECT o_orderstatus,
           ROUND(AVG(CASE o_orderpriority
                       WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
                       WHEN '3-MEDIUM' THEN 3 WHEN '4-NOT SPECIFIED' THEN 4
                       WHEN '5-LOW' THEN 5 END), 6) AS avg_priority,
           COUNT(*) AS n
    FROM orders GROUP BY 1
    """,
)
def w8_rating_map(spark, sf_dir):
    """W8: ordinal code mapping (rating letters → numeric grades) as a
    CASE chain, then a composite average."""
    orders = load_table(spark, sf_dir, "orders")
    grade = map_via_case(
        "o_orderpriority",
        {"1-URGENT": 1, "2-HIGH": 2, "3-MEDIUM": 3, "4-NOT SPECIFIED": 4, "5-LOW": 5},
    )
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.avg(grade), 6).alias("avg_priority"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "w9_curve_interp",
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-07-01') / 365.25 AS tmt
      FROM orders
    )
    SELECT o_orderkey,
           ROUND(CASE
             WHEN tmt < 1.0 THEN 0.04
             WHEN tmt >= 1.0 AND tmt < 2.0 THEN 0.04 + (tmt - 1.0) * 0.0020000000000000018 / 1.0
             WHEN tmt >= 2.0 AND tmt < 5.0 THEN 0.042 + (tmt - 2.0) * 0.002999999999999996 / 3.0
             WHEN tmt >= 5.0 AND tmt < 7.0 THEN 0.045 + (tmt - 5.0) * 0.0020000000000000018 / 2.0
             WHEN tmt >= 7.0 AND tmt < 10.0 THEN 0.047 + (tmt - 7.0) * 0.0030000000000000027 / 3.0
             WHEN tmt >= 10.0 AND tmt < 20.0 THEN 0.05 + (tmt - 10.0) * 0.004999999999999997 / 10.0
             WHEN tmt >= 20.0 AND tmt < 30.0 THEN 0.055 + (tmt - 20.0) * 0.0050000000000000044 / 10.0
             ELSE 0.06 END, 8) AS yld
    FROM t
    """,
)
def w9_curve_interp(spark, sf_dir):
    """W9: piecewise-linear key-rate curve interpolation at a derived
    tenor, clamped at both ends — pure WHEN algebra (np.interp without
    a UDF). Slope literals are spelled as exact float64 differences so
    both engines evaluate the identical expression."""
    xs = [1.0, 2.0, 5.0, 7.0, 10.0, 20.0, 30.0]
    ys = [0.04, 0.042, 0.045, 0.047, 0.05, 0.055, 0.06]
    orders = load_table(spark, sf_dir, "orders")
    tmt = F.datediff(F.lit("2002-07-01").cast("date"), F.to_date("o_orderdate")) / 365.25
    out = orders.withColumn("yld", piecewise_linear(tmt, xs, ys))
    return out.select("o_orderkey", F.round("yld", 8).alias("yld"))


@register(
    "w9b_credit_spread",
    oracle="""
    WITH ev AS (
      SELECT event_id, CAST(ts AS DATE) AS d,
             CAST(user_id % 400 AS DOUBLE) / 10.0 AS tmt,
             value AS ytm
      FROM events
    ), c AS (
      SELECT *,
             2.0 + CAST(day(d) % 10 AS DOUBLE) * 0.1 AS oneyr
      FROM ev
    ), y AS (
      SELECT event_id, tmt, ytm, oneyr,
             oneyr + 0.2 AS twoyr,  oneyr + 0.5 AS fiveyr,
             oneyr + 0.7 AS sevyr,  oneyr + 1.0 AS tenyr,
             oneyr + 1.5 AS twentyr, oneyr + 2.0 AS thirtyr
      FROM c
    )
    SELECT event_id,
           CASE
             WHEN tmt < 1.0 THEN oneyr
             WHEN tmt >= 1.0  AND tmt <= 2.0  THEN oneyr   + (tmt - 1.0)  * (twoyr   - oneyr)   / 1.0
             WHEN tmt >= 2.0  AND tmt <= 5.0  THEN twoyr   + (tmt - 2.0)  * (fiveyr  - twoyr)   / 3.0
             WHEN tmt >= 5.0  AND tmt <= 7.0  THEN fiveyr  + (tmt - 5.0)  * (sevyr   - fiveyr)  / 2.0
             WHEN tmt >= 7.0  AND tmt <= 10.0 THEN sevyr   + (tmt - 7.0)  * (tenyr   - sevyr)   / 3.0
             WHEN tmt >= 10.0 AND tmt <= 20.0 THEN tenyr   + (tmt - 10.0) * (twentyr - tenyr)   / 10.0
             WHEN tmt >= 20.0 AND tmt <= 30.0 THEN twentyr + (tmt - 20.0) * (thirtyr - twentyr) / 10.0
             ELSE thirtyr END AS yld_interp,
           ytm - (CASE
             WHEN tmt < 1.0 THEN oneyr
             WHEN tmt >= 1.0  AND tmt <= 2.0  THEN oneyr   + (tmt - 1.0)  * (twoyr   - oneyr)   / 1.0
             WHEN tmt >= 2.0  AND tmt <= 5.0  THEN twoyr   + (tmt - 2.0)  * (fiveyr  - twoyr)   / 3.0
             WHEN tmt >= 5.0  AND tmt <= 7.0  THEN fiveyr  + (tmt - 5.0)  * (sevyr   - fiveyr)  / 2.0
             WHEN tmt >= 7.0  AND tmt <= 10.0 THEN sevyr   + (tmt - 7.0)  * (tenyr   - sevyr)   / 3.0
             WHEN tmt >= 10.0 AND tmt <= 20.0 THEN tenyr   + (tmt - 10.0) * (twentyr - tenyr)   / 10.0
             WHEN tmt >= 20.0 AND tmt <= 30.0 THEN twentyr + (tmt - 20.0) * (thirtyr - twentyr) / 10.0
             ELSE thirtyr END) AS credit_spread
    FROM y
    """,
)
def w9b_credit_spread(spark, sf_dir):
    """W9 with the reference's PER-DATE curve (`helper_functions.py:
    309-408`, ComputeCredit + calculate_credit_spreads): each trade
    carries its execution day's key-rate nodes as columns; the tenor
    interpolates against THOSE, and credit_spread = ytm − yld_interp.
    Pure column algebra via piecewise_linear_cols — the reference's
    joblib row-parallel loop becomes whole-stage codegen. The synthetic
    curve derives deterministically from the date (so both engines
    build identical node columns); tenors span below-1y and beyond-30y
    to exercise both clamps."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.to_date("ts").alias("d"),
        ((F.col("user_id") % 400).cast("double") / F.lit(10.0)).alias("tmt"),
        F.col("value").alias("ytm"),
    )
    one = 2.0 + (F.dayofmonth("d") % 10).cast("double") * F.lit(0.1)
    nodes = {
        "oneyr": one,
        "twoyr": one + 0.2,
        "fiveyr": one + 0.5,
        "sevyr": one + 0.7,
        "tenyr": one + 1.0,
        "twentyr": one + 1.5,
        "thirtyr": one + 2.0,
    }
    cur = ev
    for name, expr in nodes.items():
        cur = cur.withColumn(name, expr)
    yld = piecewise_linear_cols(
        "tmt",
        [1.0, 2.0, 5.0, 7.0, 10.0, 20.0, 30.0],
        [F.col(c) for c in nodes],
    )
    cur = cur.withColumn("yld_interp", yld)
    return cur.select(
        "event_id",
        "yld_interp",
        (F.col("ytm") - F.col("yld_interp")).alias("credit_spread"),
    )


# ---------------------------------------------------------------- aggregations


@register(
    "a7_group_median",
    oracle="""
    SELECT user_id, ROUND(median(value), 6) AS med_value, COUNT(*) AS n
    FROM events GROUP BY 1
    """,
)
def a7_group_median(spark, sf_dir):
    """A7: exact per-group median (interpolated at even counts)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.round(F.median("value"), 6).alias("med_value"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "a8_pooled_stats",
    oracle="""
    SELECT l_returnflag,
           COUNT(l_extendedprice) AS n,
           ROUND(AVG(l_extendedprice), 4) AS mean,
           ROUND(stddev_samp(l_extendedprice), 4) AS std,
           MIN(l_extendedprice) AS min,
           MAX(l_extendedprice) AS max,
           ROUND(quantile_cont(l_extendedprice, 0.01), 4) AS q01,
           ROUND(quantile_cont(l_extendedprice, 0.05), 4) AS q05,
           ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS q95,
           ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS q99
    FROM lineitem GROUP BY 1
    """,
)
def a8_pooled_stats(spark, sf_dir):
    """A8: pooled descriptive stats — mean/std/min/max + exact
    interpolated quantiles per group."""
    li = load_table(spark, sf_dir, "lineitem")
    stats = pooled_stats(li, "l_extendedprice", ["l_returnflag"])
    return stats.select(
        "l_returnflag",
        "n",
        F.round("mean", 4).alias("mean"),
        F.round("std", 4).alias("std"),
        "min",
        "max",
        F.round("q01", 4).alias("q01"),
        F.round("q05", 4).alias("q05"),
        F.round("q95", 4).alias("q95"),
        F.round("q99", 4).alias("q99"),
    )


@register(
    "a9_cross_sectional",
    oracle="""
    WITH daily AS (
      SELECT CAST(l_shipdate AS DATE) AS d,
             COUNT(*) AS n, AVG(l_extendedprice) AS m
      FROM lineitem GROUP BY 1
    )
    SELECT ROUND(AVG(n), 6) AS avg_daily_n, ROUND(AVG(m), 4) AS avg_daily_price,
           COUNT(*) AS n_days
    FROM daily
    """,
)
def a9_cross_sectional(spark, sf_dir):
    """A9: two-level aggregation — per-day cross-sectional stats, then
    the time-series mean of each daily stat."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.to_date("l_shipdate").alias("d")).agg(
        F.count(F.lit(1)).alias("n"), F.avg("l_extendedprice").alias("m")
    )
    return daily.agg(
        F.round(F.avg("n"), 6).alias("avg_daily_n"),
        F.round(F.avg("m"), 4).alias("avg_daily_price"),
        F.count(F.lit(1)).alias("n_days"),
    )


@register(
    "a13b_trade_counts_by_month",
    oracle="""
    WITH ev AS (
      SELECT user_id,
             date_trunc('month', CAST(ts AS DATE)) AS m,
             value AS pr,
             CASE WHEN event_id % 3 != 0 THEN value END AS prc_bid,
             CASE WHEN event_id % 5 != 0 THEN value END AS prc_ask
      FROM events
    ),
    counts AS (
      SELECT user_id, m,
             count(pr) AS n_pr, count(prc_bid) AS n_bid,
             count(prc_ask) AS n_ask
      FROM ev GROUP BY 1, 2
    ),
    life AS (
      SELECT user_id, min(m) AS first_m, max(m) AS last_m
      FROM ev GROUP BY 1
    ),
    alive AS (
      SELECT c.m, count(*) AS n_alive
      FROM (SELECT DISTINCT m FROM counts) c
      JOIN life l ON l.first_m <= c.m AND c.m <= l.last_m
      GROUP BY 1
    ),
    sums AS (
      SELECT m, sum(n_pr) AS s_pr, sum(n_bid) AS s_bid, sum(n_ask) AS s_ask
      FROM counts GROUP BY 1
    )
    SELECT strftime(s.m, '%Y-%m') AS year_month,
           CAST(s.s_pr AS DOUBLE) / CAST(a.n_alive AS DOUBLE) AS avg_pr_days,
           CAST(s.s_bid AS DOUBLE) / CAST(a.n_alive AS DOUBLE) AS avg_prc_bid_days,
           CAST(s.s_ask AS DOUBLE) / CAST(a.n_alive AS DOUBLE) AS avg_prc_ask_days
    FROM sums s JOIN alive a ON a.m = s.m
    """,
)
def a13b_trade_counts_by_month(spark, sf_dir):
    """Trade-sparsity averages with zero-trade months in the
    denominator (`stage1/helper_functions.py:1814-1908`): a bond is
    alive for every month of its first→last window; alive-but-silent
    months dilute the average. No month spine — only the denominator
    needs the zeros (see trade_counts_by_month)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("d"),
        F.col("value").alias("pr"),
        F.when(F.col("event_id") % 3 != 0, F.col("value")).alias("prc_bid"),
        F.when(F.col("event_id") % 5 != 0, F.col("value")).alias("prc_ask"),
    )
    return trade_counts_by_month(
        ev, "user_id", "d", ["pr", "prc_bid", "prc_ask"]
    )


@register(
    "a10_concentration",
    oracle="""
    WITH totals AS (
      SELECT l_suppkey, SUM(l_extendedprice * l_quantity / 100) AS v
      FROM lineitem GROUP BY 1
    ), ranked AS (
      SELECT l_suppkey, v,
             SUM(v) OVER () AS total,
             SUM(v) OVER (ORDER BY v DESC, l_suppkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             row_number() OVER (ORDER BY v DESC, l_suppkey) AS rank,
             COUNT(*) OVER () AS n
      FROM totals
    )
    SELECT MAX(n) AS n_entities,
           ROUND(SUM((v / total) * (v / total)) * 10000, 6) AS herfindahl,
           ROUND(CAST(COUNT(CASE WHEN cum / total <= 0.5 THEN 1 END) AS DOUBLE)
                 / MAX(n), 6) AS frac_for_50pct,
           ROUND(CAST(COUNT(CASE WHEN cum / total <= 0.75 THEN 1 END) AS DOUBLE)
                 / MAX(n), 6) AS frac_for_75pct,
           ROUND(CAST(COUNT(CASE WHEN cum / total <= 0.9 THEN 1 END) AS DOUBLE)
                 / MAX(n), 6) AS frac_for_90pct,
           ROUND(SUM(CASE WHEN rank <= GREATEST(1, CAST(FLOOR(n * CAST(0.1 AS DOUBLE)) AS BIGINT))
                          THEN v / total ELSE 0 END), 6) AS top_10pct_share,
           ROUND(SUM(CASE WHEN rank <= GREATEST(1, CAST(FLOOR(n * CAST(0.25 AS DOUBLE)) AS BIGINT))
                          THEN v / total ELSE 0 END), 6) AS top_25pct_share
    FROM ranked
    """,
)
def a10_concentration(spark, sf_dir):
    """A10: market-concentration report — cumulative volume share,
    fraction of entities covering 50/75/90% of volume, top-decile/
    quartile shares, Herfindahl. The window runs over the (small)
    per-entity aggregate, not the fact table."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "dv", F.col("l_extendedprice") * F.col("l_quantity") / F.lit(100)
    )
    m = concentration_metrics(li, "l_suppkey", "dv")
    return m.select(
        "n_entities",
        F.round("herfindahl", 6).alias("herfindahl"),
        F.round("frac_for_50pct", 6).alias("frac_for_50pct"),
        F.round("frac_for_75pct", 6).alias("frac_for_75pct"),
        F.round("frac_for_90pct", 6).alias("frac_for_90pct"),
        F.round("top_10pct_share", 6).alias("top_10pct_share"),
        F.round("top_25pct_share", 6).alias("top_25pct_share"),
    )


@register(
    "a11_winsorize",
    oracle="""
    WITH bounds AS (
      SELECT strftime(l_shipdate, '%Y-%m') AS month,
             quantile_cont(l_extendedprice, 0.005) AS lo,
             quantile_cont(l_extendedprice, 0.995) AS hi
      FROM lineitem GROUP BY 1
    )
    SELECT l.month, ROUND(AVG(CASE WHEN l.l_extendedprice IS NULL THEN NULL
             ELSE LEAST(GREATEST(l.l_extendedprice, b.lo), b.hi) END), 4)
             AS mean_winsorized,
           COUNT(*) AS n
    FROM (SELECT strftime(l_shipdate, '%Y-%m') AS month, l_extendedprice
          FROM lineitem) l
    JOIN bounds b ON l.month = b.month
    GROUP BY 1
    """,
)
def a11_winsorize(spark, sf_dir):
    """A11: per-group winsorization at [0.5%, 99.5%] quantiles —
    quantiles aggregated once per group and broadcast back, then
    least/greatest clipping."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "month", F.date_format("l_shipdate", "yyyy-MM")
    )
    clipped = winsorize_by_group(
        li, "l_extendedprice", ["month"], 0.005, 0.995, out_col="wins"
    )
    return clipped.groupBy("month").agg(
        F.round(F.avg("wins"), 4).alias("mean_winsorized"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "a13_weekly_resample",
    oracle="""
    SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
           event_type,
           ROUND(AVG(value), 6) AS mean_value,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def a13_weekly_resample(spark, sf_dir):
    """A13/A14: weekly resample — date_trunc to ISO week (Monday) +
    aggregate; the reference's resample('W-MON').mean()."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format(F.date_trunc("week", F.col("ts")), "yyyy-MM-dd").alias("week"),
        "event_type",
    ).agg(
        F.round(F.avg("value"), 6).alias("mean_value"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------- order/top-k/dedup


@register(
    "o3_topk_per_group",
    oracle="""
    WITH ranked AS (
      SELECT p_brand, p_partkey, p_retailprice,
             row_number() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey) AS rank
      FROM part
    )
    SELECT p_brand, p_partkey, p_retailprice, rank FROM ranked WHERE rank <= 3
    """,
)
def o3_topk_per_group(spark, sf_dir):
    """O3: top-k per group with a deterministic tiebreak."""
    from pyspark.sql import Window

    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        part.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.col("rank").cast("long").alias("rank"),
        )
    )


@register(
    "o5_dedup_keep_first",
    oracle="""
    WITH ranked AS (
      SELECT event_id,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT event_id FROM ranked WHERE rn = 1
    """,
)
def o5_dedup_keep_first(spark, sf_dir):
    """O5: order-aware dedup — sort + drop_duplicates(keep='first') as a
    deterministic row_number window."""
    ev = load_table(spark, sf_dir, "events")
    out = keep_first(ev, ["user_id", "event_type"], ["ts", "event_id"])
    return out.select("event_id")


@register(
    "s2_standard_normalize",
    oracle="""
    WITH coded AS (
      SELECT l_orderkey, l_linenumber,
             CASE WHEN l_quantity > 45 THEN '5MM+'
                  WHEN l_quantity > 40 THEN '1MM+'
                  ELSE CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) END AS vol_tx,
             CASE CAST(l_linenumber % 6 AS INT)
                  WHEN 0 THEN 'G' WHEN 1 THEN 'M' WHEN 2 THEN 'H'
                  WHEN 3 THEN 'N' WHEN 4 THEN 'I' ELSE 'O' END AS trc_st_raw,
             CASE WHEN l_returnflag = 'N' THEN NULL ELSE l_returnflag END AS side_a,
             l_linestatus AS side_b
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber,
           CASE vol_tx WHEN '5MM+' THEN 5000000.0 WHEN '1MM+' THEN 1000000.0
                ELSE TRY_CAST(vol_tx AS DOUBLE) END AS volume,
           CASE WHEN trc_st_raw IN ('G', 'M') THEN 'T'
                WHEN trc_st_raw IN ('H', 'N') THEN 'C'
                WHEN trc_st_raw IN ('I', 'O') THEN 'W'
                ELSE trc_st_raw END AS trc_st,
           COALESCE(side_a, side_b) AS rpt_side_cd
    FROM coded
    """,
)
def s2_standard_normalize(spark, sf_dir):
    """Standard/144A scan normalization (SURVEY §3.2,
    `create_daily_standard_trace.py:1742-1753, 1905-1908`): string
    volume with capped codes '5MM+'/'1MM+' decoded to numerics
    (null-on-parse-failure), trc_st code folding G/M→T H/N→C I/O→W,
    and report-side fallback via coalesce."""
    li = load_table(spark, sf_dir, "lineitem")
    coded = li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") > 45, F.lit("5MM+"))
        .when(F.col("l_quantity") > 40, F.lit("1MM+"))
        .otherwise(F.col("l_quantity").cast("long").cast("string"))
        .alias("vol_tx"),
        F.element_at(
            F.array(*[F.lit(c) for c in "GMHNIO"]),
            (F.col("l_linenumber") % 6 + 1).cast("int"),
        ).alias("trc_st_raw"),
        F.when(F.col("l_returnflag") == "N", F.lit(None))
        .otherwise(F.col("l_returnflag"))
        .alias("side_a"),
        F.col("l_linestatus").alias("side_b"),
    )
    return coded.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("vol_tx") == "5MM+", 5000000.0)
        .when(F.col("vol_tx") == "1MM+", 1000000.0)
        .otherwise(F.col("vol_tx").try_cast("double"))
        .alias("volume"),
        F.when(F.col("trc_st_raw").isin("G", "M"), "T")
        .when(F.col("trc_st_raw").isin("H", "N"), "C")
        .when(F.col("trc_st_raw").isin("I", "O"), "W")
        .otherwise(F.col("trc_st_raw"))
        .alias("trc_st"),
        F.coalesce("side_a", "side_b").alias("rpt_side_cd"),
    )


_P3_ORACLE = """
    WITH coded AS (
      SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_shipdate,
             l_extendedprice,
             CASE WHEN l_quantity > 45 THEN '5MM+'
                  WHEN l_quantity > 40 THEN '1MM+'
                  ELSE CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) END AS vol_tx,
             CASE CAST(l_linenumber % 6 AS INT)
                  WHEN 0 THEN 'G' WHEN 1 THEN 'M' WHEN 2 THEN 'H'
                  WHEN 3 THEN 'N' WHEN 4 THEN 'I' ELSE 'O' END AS trc_st_raw
      FROM lineitem
    ),
    norm AS (
      SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_shipdate,
             l_extendedprice,
             CASE vol_tx WHEN '5MM+' THEN 5000000.0 WHEN '1MM+' THEN 1000000.0
                  ELSE TRY_CAST(vol_tx AS DOUBLE) END AS volume,
             CASE WHEN trc_st_raw IN ('G', 'M') THEN 'T'
                  WHEN trc_st_raw IN ('H', 'N') THEN 'C'
                  ELSE 'W' END AS trc_st
      FROM coded
    ),
    after_cancel AS (
      SELECT t.* FROM norm t
      WHERE t.trc_st = 'T'
        AND NOT EXISTS (
          SELECT 1 FROM norm c
          WHERE c.trc_st = 'C'
            AND c.l_orderkey = t.l_orderkey AND c.l_partkey = t.l_partkey
            AND c.volume = t.volume
        )
    ),
    tseq AS (
      SELECT *, row_number() OVER (PARTITION BY l_orderkey
                                   ORDER BY l_shipdate, l_linenumber,
                                            l_extendedprice, l_partkey,
                                            l_suppkey, volume) AS seq
      FROM after_cancel
    ),
    rseq AS (
      SELECT l_orderkey, row_number() OVER (PARTITION BY l_orderkey
                                            ORDER BY l_shipdate, l_linenumber,
                                                     l_extendedprice, l_partkey,
                                                     l_suppkey, volume) AS seq
      FROM norm WHERE trc_st = 'W'
    ),
    surv AS (
      SELECT t.* FROM tseq t
      WHERE NOT EXISTS (
        SELECT 1 FROM rseq r
        WHERE r.l_orderkey = t.l_orderkey AND r.seq = t.seq
      )
    )
    SELECT l_suppkey, strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS d,
           COUNT(*) AS n_trades,
           MIN_BY(l_extendedprice,
                  (CAST(l_orderkey AS HUGEINT) * 10 + l_linenumber) * 100000000
                  + CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS prc_first,
           MAX_BY(l_extendedprice,
                  (CAST(l_orderkey AS HUGEINT) * 10 + l_linenumber) * 100000000
                  + CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS prc_last,
           MAX(l_extendedprice) AS prc_hi,
           MIN(l_extendedprice) AS prc_lo,
           CAST((2 * SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) * 10000
                 + 100 * COUNT(*)) // (200 * COUNT(*)) AS DOUBLE) / 10000 AS prc_ew,
           -- UNROUNDED quotient of exact integer sums: p·volume has 2
           -- decimals (volume is integral), so cents sums are exact
           -- BIGINTs in any order and the double division is identical
           -- in both engines. ROUND(double, 4) is NOT portable here —
           -- Spark rounds the exact BigDecimal of the double, DuckDB
           -- rounds in float arithmetic, and at sf0.1 real groups land
           -- on 4dp boundaries and flip (display rounding belongs to
           -- the presentation layer)
           CAST(SUM(CAST(round(l_extendedprice * volume * 100, 0) AS BIGINT))
                AS DOUBLE)
             / CAST(SUM(CAST(volume AS BIGINT)) * 100 AS DOUBLE) AS prc_vw,
           CAST(SUM(CAST(volume AS BIGINT)) AS DOUBLE) AS qvolume
    FROM surv GROUP BY 1, 2
    """


@register(
    "j18_standard_reversal",
    oracle="""
    WITH norm AS (
      SELECT l_suppkey AS id, l_partkey % 50 AS bond,
             CAST(l_shipdate AS DATE) AS d, l_extendedprice AS pr,
             l_quantity AS vol, l_linenumber % 9 AS tm,
             l_orderkey % 1000 AS msg,
             CASE WHEN l_linenumber % 11 = 0 THEN 'R'
                  WHEN l_linenumber % 11 = 1 THEN 'X'
                  WHEN l_linenumber % 11 = 2 THEN 'D' END AS asof_cd
      FROM lineitem
    ),
    rev AS (
      SELECT id, bond, d, vol, pr,
             row_number() OVER (PARTITION BY id, bond, d, vol, pr
                                ORDER BY tm) AS seq
      FROM norm WHERE asof_cd = 'R'
    ),
    body AS (
      SELECT * FROM norm WHERE asof_cd IS NULL
    ),
    hdr AS (
      SELECT id, bond, d, vol, pr, tm, msg,
             row_number() OVER (PARTITION BY id, bond, d, vol, pr
                                ORDER BY tm, msg) AS seq
      FROM body
    ),
    surviving AS (
      SELECT DISTINCT h.id, h.d, h.tm, h.vol, h.pr, h.msg
      FROM hdr h
      WHERE NOT EXISTS (
        SELECT 1 FROM rev r
        WHERE r.id = h.id AND r.bond = h.bond AND r.d = h.d
          AND r.vol = h.vol AND r.pr = h.pr AND r.seq = h.seq
      )
    )
    SELECT id, strftime(d, '%Y-%m-%d') AS d, tm, vol, pr, msg
    FROM (
      -- full-row DISTINCT like the reference's clean6, THEN project:
      -- two bonds sharing a join-key stay two rows
      SELECT DISTINCT b.*
      FROM body b
      JOIN surviving s
        ON s.id = b.id AND s.d = b.d AND s.tm = b.tm
       AND s.vol = b.vol AND s.pr = b.pr AND s.msg = b.msg
    )
    """,
)
def j18_standard_reversal(spark, sf_dir):
    """J6-standard (`create_daily_standard_trace.py:138-268`): the SAS
    step-4/5 reversal removal — header-level sequence match, DISTINCT
    surviving join-keys, semi-join back, full-row DISTINCT. Differs
    from per-row removal when keys duplicate (one surviving header
    readmits every body row with that key; literal duplicates collapse
    to one). Coarse tm/msg domains force those duplicates here."""
    li = load_table(spark, sf_dir, "lineitem")
    norm = li.select(
        F.col("l_suppkey").alias("id"),
        (F.col("l_partkey") % 50).alias("bond"),
        F.to_date("l_shipdate").alias("d"),
        F.col("l_extendedprice").alias("pr"),
        F.col("l_quantity").alias("vol"),
        (F.col("l_linenumber") % 9).alias("tm"),
        (F.col("l_orderkey") % 1000).alias("msg"),
        F.when(F.col("l_linenumber") % 11 == 0, "R")
        .when(F.col("l_linenumber") % 11 == 1, "X")
        .when(F.col("l_linenumber") % 11 == 2, "D")
        .alias("asof_cd"),
    )
    out = standard_reversal_removal(
        norm,
        group_keys=["id", "bond", "d", "vol", "pr"],
        time_col="tm",
        msg_col="msg",
        join_keys=["id", "d", "tm", "vol", "pr", "msg"],
        reversal_pred=F.col("asof_cd") == "R",
        drop_pred=F.col("asof_cd").isin("R", "X", "D"),
    )
    return out.select(
        "id", F.date_format("d", "yyyy-MM-dd").alias("d"),
        "tm", "vol", "pr", "msg",
    )


@register("p3_standard_full", oracle=_P3_ORACLE)
def p3_standard_full(spark, sf_dir):
    """Standard/144A end-to-end composite (SURVEY §3.2, mirroring
    `create_daily_standard_trace.py:576-1000` the way p1 mirrors the
    Enhanced chain): S2 decode/fold normalization → cancel removal
    (multi-key anti-join against trc_st='C') → J6 sequence-matched
    reversal removal (i-th 'W' row knocks out the i-th surviving trade
    per group) → order-sensitive daily panel with exact fixed-point
    means and decimal-accumulated value weighting.

    One lazy plan: normalization is a projection fused into the scan,
    the cancel anti-join broadcasts its (small) cancel side under AQE,
    the sequence windows share one hash partitioning on l_orderkey, and
    the panel is a single hash aggregate — no materialization
    boundaries, nothing driver-side."""
    li = load_table(spark, sf_dir, "lineitem")
    norm = li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        "l_shipdate",
        "l_extendedprice",
        F.when(F.col("l_quantity") > 45, 5000000.0)
        .when(F.col("l_quantity") > 40, 1000000.0)
        .otherwise(
            F.col("l_quantity").cast("long").cast("string").try_cast("double")
        )
        .alias("volume"),
        F.when((F.col("l_linenumber") % 6).isin(0, 1), "T")
        .when((F.col("l_linenumber") % 6).isin(2, 3), "C")
        .otherwise("W")
        .alias("trc_st"),
    )
    trades = norm.filter(F.col("trc_st") == "T")
    cancels = norm.filter(F.col("trc_st") == "C")
    reversals = norm.filter(F.col("trc_st") == "W")
    after_cancel = anti_join_keys(
        trades, cancels, ["l_orderkey", "l_partkey", "volume"]
    )
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic data
    # (see the a1 tiebreak note), so the sequence order appends every
    # value-bearing column — rows still tied are full duplicates and
    # therefore interchangeable under removal
    seq_order = [
        "l_shipdate", "l_linenumber", "l_extendedprice", "l_partkey",
        "l_suppkey", "volume",
    ]
    surv = sequence_match_removal(
        after_cancel,
        reversals,
        keys=["l_orderkey"],
        trade_order=seq_order,
        reversal_order=seq_order,
    )
    p = F.col("l_extendedprice")
    cents = F.round(p * 100, 0).cast("long")
    pv_cents = F.round(p * F.col("volume") * 100, 0).cast("long")
    vol_l = F.col("volume").cast("long")
    n = F.count(F.lit(1))
    panel = surv.groupBy(
        "l_suppkey", F.date_trunc("day", F.col("l_shipdate")).alias("__d")
    ).agg(
        n.alias("n_trades"),
        _packed_price(F.min(_li_tiebreak(cents))).alias("prc_first"),
        _packed_price(F.max(_li_tiebreak(cents))).alias("prc_last"),
        F.max(p).alias("prc_hi"),
        F.min(p).alias("prc_lo"),
        round_ratio_half_up(F.sum(cents), n * 100, 4).alias("prc_ew"),
        # unrounded exact-integer-sum quotient — see the oracle comment:
        # ROUND(double, 4) tie-breaks differently across engines
        (
            F.sum(pv_cents).cast("double")
            / (F.sum(vol_l) * 100).cast("double")
        ).alias("prc_vw"),
        F.sum(vol_l).cast("double").alias("qvolume"),
    )
    return panel.select(
        "l_suppkey",
        F.date_format("__d", "yyyy-MM-dd").alias("d"),
        "n_trades", "prc_first", "prc_last", "prc_hi", "prc_lo",
        "prc_ew", "prc_vw", "qvolume",
    )


@register(
    "r1_audit_report",
    oracle="""
    WITH c AS (
      SELECT COUNT(*) AS c0,
             CAST(SUM(CASE WHEN l_extendedprice > 0
                      THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN l_extendedprice > 0 AND l_quantity > 0
                       AND l_quantity <= 45 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
             CAST(SUM(CASE WHEN l_extendedprice > 0 AND l_quantity > 0
                       AND l_quantity <= 45 AND l_discount < 0.08
                      THEN 1 ELSE 0 END) AS BIGINT) AS c3
      FROM lineitem
    )
    SELECT * FROM (
      SELECT 1 AS stage_no, 'price_positive' AS stage, c0 AS rows_before,
             c1 AS rows_after, c0 - c1 AS removed,
             CAST((2 * (c0 - c1) * 1000000 + c0) // (2 * c0) AS DOUBLE)
               / 1000000 AS removed_frac
      FROM c
      UNION ALL
      SELECT 2, 'quantity_band', c1, c2, c1 - c2,
             CAST((2 * (c1 - c2) * 1000000 + c1) // (2 * c1) AS DOUBLE) / 1000000
      FROM c
      UNION ALL
      SELECT 3, 'discount_cap', c2, c3, c2 - c3,
             CAST((2 * (c2 - c3) * 1000000 + c2) // (2 * c2) AS DOUBLE) / 1000000
      FROM c
    ) t
    """,
)
def r1_audit_report(spark, sf_dir):
    """Audit-report table (the content of the reference's
    `_build_error_files.py` per-stage removal tables, minus LaTeX):
    per filter stage, rows before/after, removed, and the exact
    half-up removal fraction — computed in ONE conditional aggregate
    over one scan (no per-stage actions; the reference re-counts after
    every filter), then unpivoted via an inline struct array."""
    li = load_table(spark, sf_dir, "lineitem")
    p1 = F.col("l_extendedprice") > 0
    p2 = p1 & (F.col("l_quantity") > 0) & (F.col("l_quantity") <= 45)
    p3 = p2 & (F.col("l_discount") < 0.08)
    cnt = lambda p: F.sum(F.when(p, 1).otherwise(0))  # noqa: E731
    agg = li.agg(
        F.count(F.lit(1)).alias("c0"),
        cnt(p1).alias("c1"),
        cnt(p2).alias("c2"),
        cnt(p3).alias("c3"),
    )
    stages = F.array(
        *[
            F.struct(
                F.lit(no).alias("stage_no"),
                F.lit(name).alias("stage"),
                F.col(b).alias("rows_before"),
                F.col(a).alias("rows_after"),
                (F.col(b) - F.col(a)).alias("removed"),
                round_ratio_half_up(F.col(b) - F.col(a), F.col(b), 6).alias(
                    "removed_frac"
                ),
            )
            for no, name, b, a in [
                (1, "price_positive", "c0", "c1"),
                (2, "quantity_band", "c1", "c2"),
                (3, "discount_cap", "c2", "c3"),
            ]
        ]
    )
    return agg.select(F.inline(stages))


@register(
    "r6_default_dynamics",
    oracle="""
    WITH rated AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             CASE WHEN (user_id + day(CAST(ts AS DATE))) % 11 = 0 THEN 22
                  ELSE 1 + user_id % 21 END AS spc
      FROM events
    ), life AS (
      SELECT user_id, min(d) AS f, max(d) AS l FROM rated GROUP BY 1
    ), fd AS (
      SELECT user_id, min(d) AS fdef FROM rated WHERE spc = 22 GROUP BY 1
    ), fu AS (
      SELECT r.user_id, min(r.d) AS fup
      FROM rated r JOIN fd ON fd.user_id = r.user_id AND r.d > fd.fdef
      WHERE r.spc < 22 GROUP BY 1
    ), binfo AS (
      SELECT life.user_id, f, l, fdef, fup
      FROM life LEFT JOIN fd USING (user_id) LEFT JOIN fu USING (user_id)
    ), bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM rated),
    spine0 AS (
      SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                                          CAST(hi AS TIMESTAMP),
                                          INTERVAL 1 DAY)) AS DATE) AS d
      FROM bounds
    ), spine AS (
      SELECT d FROM spine0 WHERE isodow(d) <= 5
    ), totals AS (
      SELECT sp.d, count(*) AS tb
      FROM spine sp JOIN binfo b ON b.f <= sp.d AND sp.d <= b.l
      GROUP BY 1
    ), defs AS (
      SELECT sp.d, count(*) AS db
      FROM spine sp JOIN binfo b
        ON b.fdef IS NOT NULL AND b.fdef <= sp.d AND sp.d <= b.l
       AND (b.fup IS NULL OR sp.d < b.fup)
      GROUP BY 1
    ), daily AS (
      SELECT sp.d, COALESCE(t.tb, 0) AS tb, COALESCE(x.db, 0) AS db
      FROM spine sp LEFT JOIN totals t ON t.d = sp.d
                    LEFT JOIN defs x ON x.d = sp.d
    )
    SELECT strftime(CAST(d + ((8 - isodow(d)) % 7) * INTERVAL 1 DAY AS DATE),
                    '%Y-%m-%d') AS week,
           CAST(SUM(db) AS BIGINT) AS count_defaulted,
           CAST(SUM(db) AS DOUBLE)
             / CAST(NULLIF(SUM(tb), 0) AS DOUBLE) * 100.0 AS pct_defaulted
    FROM daily GROUP BY 1
    """,
)
def r6_default_dynamics(spark, sf_dir):
    """Dynamics-of-default figure data (`stage1/helper_functions.py:
    1504-1781`, create_dynamics_of_default_plot — which the REFERENCE
    DISABLED for memory: its bond x business-day cross-join blows up).
    Weekly (W-MON) count and share of currently-defaulted bonds among
    alive bonds: a bond is alive on every business day of its
    [first, last] trade window and defaulted from its first rating-22
    day until its first later sub-22 day.

    Spark-first shape: NO bond x day expansion — both daily counts come
    from an interval SWEEP (+1 at each interval start, -1 after its
    end, cumulative-summed over the calendar) whose windowed frame is
    O(calendar days), not O(bonds x days); the per-bond interval frames
    are two shuffles on user_id. The weekly resample is a groupBy on
    the W-MON label. Survives millions of bonds where the reference's
    expansion could not."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    spc = F.when(
        (F.col("user_id") + F.dayofmonth("d")) % 11 == 0, F.lit(22)
    ).otherwise(F.lit(1) + F.col("user_id") % 21)
    rated = ev.select("user_id", "d", spc.alias("spc"))
    life = rated.groupBy("user_id").agg(
        F.min("d").alias("f"), F.max("d").alias("l")
    )
    fd = (
        rated.filter(F.col("spc") == 22)
        .groupBy("user_id")
        .agg(F.min("d").alias("fdef"))
    )
    fu = (
        rated.join(fd, "user_id")
        .filter((F.col("d") > F.col("fdef")) & (F.col("spc") < 22))
        .groupBy("user_id")
        .agg(F.min("d").alias("fup"))
    )
    binfo = life.join(fd, "user_id", "left").join(fu, "user_id", "left")

    bounds = rated.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("d")).filter(
        (F.dayofweek("d") >= 2) & (F.dayofweek("d") <= 6)  # Mon..Fri
    )

    t_delta = life.select(
        F.col("f").alias("d"), F.lit(1).alias("delta")
    ).unionByName(
        life.select(F.date_add("l", 1).alias("d"), F.lit(-1).alias("delta"))
    )
    defaulted = binfo.filter(F.col("fdef").isNotNull())
    end_excl = F.least(
        F.date_add("l", 1), F.coalesce("fup", F.date_add("l", 1))
    )
    d_delta = defaulted.select(
        F.col("fdef").alias("d"), F.lit(1).alias("delta")
    ).unionByName(defaulted.select(end_excl.alias("d"), F.lit(-1).alias("delta")))

    def daily_counts(deltas, name):
        # the windowed frame is per-DATE (calendar-bounded), so the
        # single-ordering window is over a dimension, not the fact table
        pts = (
            spine.select("d", F.lit(0).alias("delta"), F.lit(1).alias("sp"))
            .unionByName(deltas.select("d", "delta", F.lit(0).alias("sp")))
            .groupBy("d")
            .agg(F.sum("delta").alias("delta"), F.max("sp").alias("sp"))
        )
        w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
        return (
            pts.withColumn(name, F.sum("delta").over(w))
            .filter(F.col("sp") == 1)
            .select("d", name)
        )

    daily = daily_counts(t_delta, "tb").join(
        daily_counts(d_delta, "db"), "d", "left"
    )
    week = F.date_add("d", (F.lit(2) - F.dayofweek("d") + 7) % 7)
    return (
        daily.groupBy(F.date_format(week, "yyyy-MM-dd").alias("week"))
        .agg(
            F.sum(F.coalesce("db", F.lit(0))).alias("count_defaulted"),
            F.sum("tb").alias("t"),
        )
        .select(
            "week",
            "count_defaulted",
            (
                F.col("count_defaulted").cast("double")
                / F.when(F.col("t") == 0, None)
                .otherwise(F.col("t"))
                .cast("double")
                * F.lit(100.0)
            ).alias("pct_defaulted"),
        )
    )


@register(
    "r7_herfindahl_by_month",
    oracle="""
    WITH rated AS (
      SELECT user_id,
             strftime(date_trunc('month', CAST(ts AS DATE)), '%Y-%m')
               AS year_month,
             CAST(round(value * 100, 0) AS BIGINT) AS cents,
             CASE WHEN (user_id + day(CAST(ts AS DATE))) % 11 = 0 THEN 22
                  ELSE 1 + user_id % 21 END AS spc
      FROM events
    ), classed AS (
      SELECT CASE WHEN spc <= 10 THEN 'IG'
                  WHEN spc = 22 THEN 'DEF'
                  ELSE 'NIG' END AS rating_class,
             year_month, user_id, cents
      FROM rated
    ), bond_vol AS (
      SELECT rating_class, year_month, user_id, SUM(cents) AS v
      FROM classed GROUP BY 1, 2, 3
    )
    SELECT rating_class, year_month,
           10000.0 * (CAST(SUM(v * v) AS DOUBLE)
                      / (CAST(NULLIF(SUM(v), 0) AS DOUBLE)
                         * CAST(NULLIF(SUM(v), 0) AS DOUBLE))) AS hhi
    FROM bond_vol GROUP BY 1, 2
    """,
)
def r7_herfindahl_by_month(spark, sf_dir):
    """Herfindahl-over-time figure data (`stage1/helper_functions.py:
    3095-3230`, create_herfindahl_over_time_plot): monthly HHI of
    per-bond dollar-volume shares, 0-10,000 scale, per rating class.

    Float discipline: the reference sums squared SHARES (order-
    dependent float accumulation); here HHI = 10000 * Σv² / (Σv)² over
    EXACT integer cent sums — algebraically identical, and the only
    float ops are one conversion, one multiply chain and one division
    in a fixed order, so both engines produce the same bits. Two
    shuffles (per-bond-month sum, per-class-month sum); the sweep is
    map-side combinable all the way."""
    ev = load_table(spark, sf_dir, "events")
    d = F.to_date("ts")
    spc = F.when(
        (F.col("user_id") + F.dayofmonth(d)) % 11 == 0, F.lit(22)
    ).otherwise(F.lit(1) + F.col("user_id") % 21)
    cls = (
        F.when(spc <= 10, "IG").when(spc == 22, "DEF").otherwise("NIG")
    )
    base = ev.select(
        cls.alias("rating_class"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM").alias("year_month"),
        "user_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    bond_vol = base.groupBy("rating_class", "year_month", "user_id").agg(
        F.sum("cents").alias("v")
    )
    s1 = F.when(F.col("s1") == 0, None).otherwise(F.col("s1")).cast("double")
    return (
        bond_vol.groupBy("rating_class", "year_month")
        .agg(
            F.sum(F.col("v") * F.col("v")).alias("s2"),
            F.sum("v").alias("s1"),
        )
        .select(
            "rating_class",
            "year_month",
            (F.lit(10000.0) * (F.col("s2").cast("double") / (s1 * s1))).alias(
                "hhi"
            ),
        )
    )


@register(
    "r8_active_dormant",
    oracle="""
    WITH base AS (
      SELECT CASE WHEN spc <= 10 THEN 'IG' WHEN spc = 22 THEN 'DEF'
                  ELSE 'NIG' END AS rating_class,
             user_id, d, date_trunc('month', d) AS m
      FROM (SELECT user_id, CAST(ts AS DATE) AS d,
                   CASE WHEN (user_id + day(CAST(ts AS DATE))) % 11 = 0
                        THEN 22 ELSE 1 + user_id % 21 END AS spc,
                   CASE WHEN event_id % 7 != 0 THEN value END AS pr
            FROM events)
      WHERE pr IS NOT NULL
    ), mt AS (
      SELECT rating_class, user_id, m, max(d) AS mtd
      FROM base GROUP BY 1, 2, 3
    ), life AS (
      SELECT rating_class, user_id, min(m) AS f, max(m) AS l
      FROM base GROUP BY 1, 2
    ), spine AS (
      SELECT rating_class, user_id,
             unnest(generate_series(f, l, INTERVAL 1 MONTH)) AS m
      FROM life
    ), ffl AS (
      SELECT s.rating_class, s.user_id, s.m,
             max(mt.mtd) OVER (PARTITION BY s.rating_class, s.user_id
                               ORDER BY s.m
                               ROWS UNBOUNDED PRECEDING) AS lt
      FROM spine s LEFT JOIN mt
        ON mt.rating_class = s.rating_class AND mt.user_id = s.user_id
       AND mt.m = s.m
    ), cl AS (
      SELECT rating_class, m,
             date_diff('day', lt, last_day(CAST(m AS DATE))) AS ds
      FROM ffl
    ), agg AS (
      SELECT rating_class, strftime(m, '%Y-%m') AS year_month,
             SUM(CASE WHEN ds <= 30 THEN 1 ELSE 0 END) AS n_active,
             SUM(CASE WHEN ds > 30 AND ds <= 90 THEN 1 ELSE 0 END)
               AS n_inactive,
             SUM(CASE WHEN ds > 90 THEN 1 ELSE 0 END) AS n_dormant,
             COUNT(*) AS n_alive
      FROM cl GROUP BY 1, 2
    )
    SELECT rating_class, year_month,
           CAST(n_active AS BIGINT) AS n_active,
           CAST(n_inactive AS BIGINT) AS n_inactive,
           CAST(n_dormant AS BIGINT) AS n_dormant,
           CAST(n_active AS DOUBLE) / CAST(n_alive AS DOUBLE) * 100.0
             AS pct_active,
           CAST(n_inactive AS DOUBLE) / CAST(n_alive AS DOUBLE) * 100.0
             AS pct_inactive,
           CAST(n_dormant AS DOUBLE) / CAST(n_alive AS DOUBLE) * 100.0
             AS pct_dormant
    FROM agg
    """,
)
def r8_active_dormant(spark, sf_dir):
    """Active/Inactive/Dormant bonds over time
    (`stage1/helper_functions.py:2889-3092`,
    create_active_dormant_bonds_plot): per rating class and month,
    classify every ALIVE bond by days from month-end to its last trade
    up to that month (<=30 active, 31-90 inactive, >90 dormant), as
    shares summing to 100. Lifespans are per (class, bond) — a bond
    whose rating migrates gets a lifespan within each class, like the
    reference's filter-then-group.

    Spark shape: the reference loops months and re-filters the tape per
    month (quadratic in months); here the "last trade up to month m" is
    a RUNNING MAX over a per-bond month spine (bounded explode,
    |bonds| x alive-months), one window, one aggregation."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    d = F.to_date("ts")
    spc = F.when(
        (F.col("user_id") + F.dayofmonth(d)) % 11 == 0, F.lit(22)
    ).otherwise(F.lit(1) + F.col("user_id") % 21)
    cls = F.when(spc <= 10, "IG").when(spc == 22, "DEF").otherwise("NIG")
    pr = F.when(F.col("event_id") % 7 != 0, F.col("value"))
    base = (
        ev.select(
            cls.alias("rating_class"),
            "user_id",
            d.alias("d"),
            F.date_trunc("month", d).alias("m"),
            pr.alias("pr"),
        )
        .filter(F.col("pr").isNotNull())
    )
    mt = base.groupBy("rating_class", "user_id", "m").agg(
        F.max("d").alias("mtd")
    )
    life = base.groupBy("rating_class", "user_id").agg(
        F.min("m").alias("f"), F.max("m").alias("l")
    )
    spine = life.select(
        "rating_class",
        "user_id",
        F.explode(
            F.sequence("f", "l", F.expr("interval 1 month"))
        ).alias("m"),
    )
    w = (
        Window.partitionBy("rating_class", "user_id")
        .orderBy("m")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ffl = spine.join(mt, ["rating_class", "user_id", "m"], "left").withColumn(
        "lt", F.max("mtd").over(w)
    )
    ds = F.datediff(F.last_day(F.col("m").cast("date")), F.col("lt"))
    agg = (
        ffl.select("rating_class", "m", ds.alias("ds"))
        .groupBy(
            "rating_class", F.date_format("m", "yyyy-MM").alias("year_month")
        )
        .agg(
            F.sum(F.when(F.col("ds") <= 30, 1).otherwise(0)).alias("n_active"),
            F.sum(
                F.when((F.col("ds") > 30) & (F.col("ds") <= 90), 1).otherwise(0)
            ).alias("n_inactive"),
            F.sum(F.when(F.col("ds") > 90, 1).otherwise(0)).alias("n_dormant"),
            F.count(F.lit(1)).alias("n_alive"),
        )
    )
    t = F.col("n_alive").cast("double")
    return agg.select(
        "rating_class",
        "year_month",
        "n_active",
        "n_inactive",
        "n_dormant",
        (F.col("n_active").cast("double") / t * F.lit(100.0)).alias(
            "pct_active"
        ),
        (F.col("n_inactive").cast("double") / t * F.lit(100.0)).alias(
            "pct_inactive"
        ),
        (F.col("n_dormant").cast("double") / t * F.lit(100.0)).alias(
            "pct_dormant"
        ),
    )


@register(
    "r9_zero_trade_bonds",
    oracle="""
    WITH base AS (
      SELECT CASE WHEN spc <= 10 THEN 'IG' WHEN spc = 22 THEN 'DEF'
                  ELSE 'NIG' END AS rating_class,
             user_id, date_trunc('month', d) AS m
      FROM (SELECT user_id, CAST(ts AS DATE) AS d,
                   CASE WHEN (user_id + day(CAST(ts AS DATE))) % 11 = 0
                        THEN 22 ELSE 1 + user_id % 21 END AS spc
            FROM events)
    ), life AS (
      SELECT rating_class, user_id, min(m) AS f, max(m) AS l
      FROM base GROUP BY 1, 2
    ), months AS (
      SELECT DISTINCT rating_class, m FROM base
    ), alive AS (
      SELECT mo.rating_class, mo.m, count(*) AS n_alive
      FROM months mo JOIN life li
        ON li.rating_class = mo.rating_class
       AND li.f <= mo.m AND mo.m <= li.l
      GROUP BY 1, 2
    ), traded AS (
      SELECT rating_class, m, count(DISTINCT user_id) AS n_traded
      FROM base GROUP BY 1, 2
    )
    SELECT a.rating_class, strftime(a.m, '%Y-%m') AS year_month,
           CAST(a.n_alive AS BIGINT) AS n_alive,
           CAST(t.n_traded AS BIGINT) AS n_traded,
           CAST(a.n_alive - t.n_traded AS DOUBLE)
             / CAST(a.n_alive AS DOUBLE) * 100.0 AS zero_trade_pct
    FROM alive a JOIN traded t
      ON t.rating_class = a.rating_class AND t.m = a.m
    """,
)
def r9_zero_trade_bonds(spark, sf_dir):
    """Zero-trade bonds over time (`stage1/helper_functions.py:
    2507-2697`, create_zero_trade_bonds_plot): per rating class and
    month, the share of alive bonds with NO observation that month.

    Reference quirk reproduced: its per-type "traded" counts are
    len() of the per-(bond, month) groupby frames — a group EXISTS for
    any row that month even when every price of that type is null, so
    the pr/bid/ask lines are identical by construction; this entry
    emits the single shared series. Alive counts come from the a13b
    broadcast months-side range join, not a month loop."""
    ev = load_table(spark, sf_dir, "events")
    d = F.to_date("ts")
    spc = F.when(
        (F.col("user_id") + F.dayofmonth(d)) % 11 == 0, F.lit(22)
    ).otherwise(F.lit(1) + F.col("user_id") % 21)
    cls = F.when(spc <= 10, "IG").when(spc == 22, "DEF").otherwise("NIG")
    base = ev.select(
        cls.alias("rating_class"),
        "user_id",
        F.date_trunc("month", d).alias("m"),
    )
    life = base.groupBy("rating_class", "user_id").agg(
        F.min("m").alias("f"), F.max("m").alias("l")
    )
    months = base.select(
        F.col("rating_class").alias("__rc"), F.col("m").alias("__m")
    ).distinct()
    alive = (
        life.join(
            F.broadcast(months),
            (F.col("rating_class") == F.col("__rc"))
            & (F.col("f") <= F.col("__m"))
            & (F.col("__m") <= F.col("l")),
        )
        .groupBy(
            F.col("__rc").alias("rating_class"), F.col("__m").alias("m")
        )
        .agg(F.count(F.lit(1)).alias("n_alive"))
    )
    traded = base.groupBy("rating_class", "m").agg(
        F.countDistinct("user_id").alias("n_traded")
    )
    return (
        alive.join(traded, ["rating_class", "m"])
        .select(
            "rating_class",
            F.date_format("m", "yyyy-MM").alias("year_month"),
            "n_alive",
            "n_traded",
            (
                (F.col("n_alive") - F.col("n_traded")).cast("double")
                / F.col("n_alive").cast("double")
                * F.lit(100.0)
            ).alias("zero_trade_pct"),
        )
    )


@register(
    "r10_trading_intensity",
    oracle="""
    WITH base AS (
      SELECT user_id, d, date_trunc('month', d) AS m, pr,
             CASE WHEN spc <= 5 THEN '1-5 (AAA-A-)'
                  WHEN spc <= 10 THEN '6-10 (BBB+-)'
                  WHEN spc <= 15 THEN '11-15 (BB+-)'
                  WHEN spc <= 21 THEN '16-21 (B+-)'
                  ELSE '22 (D)' END AS rating_group
      FROM (SELECT user_id, CAST(ts AS DATE) AS d,
                   CASE WHEN (user_id + day(CAST(ts AS DATE))) % 11 = 0
                        THEN 22 ELSE 1 + user_id % 21 END AS spc,
                   CASE WHEN event_id % 7 != 0 THEN value END AS pr
            FROM events)
    ), counts AS (
      SELECT rating_group, user_id, m, count(pr) AS days_traded
      FROM base GROUP BY 1, 2, 3
    ), life AS (
      SELECT rating_group, user_id, min(m) AS f, max(m) AS l
      FROM base GROUP BY 1, 2
    ), months AS (
      SELECT DISTINCT rating_group, m FROM base
    ), alive AS (
      SELECT mo.rating_group, mo.m, count(*) AS n_alive
      FROM months mo JOIN life li
        ON li.rating_group = mo.rating_group
       AND li.f <= mo.m AND mo.m <= li.l
      GROUP BY 1, 2
    ), sums AS (
      SELECT rating_group, m, SUM(days_traded) AS total_days
      FROM counts GROUP BY 1, 2
    ), bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM base),
    bd0 AS (
      SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                                          CAST(hi AS TIMESTAMP),
                                          INTERVAL 1 DAY)) AS DATE) AS bd
      FROM bounds
    ), bdays AS (
      SELECT strftime(date_trunc('month', bd), '%Y-%m') AS year_month,
             count(*) AS business_days
      FROM bd0 WHERE isodow(bd) <= 5 GROUP BY 1
    )
    SELECT a.rating_group, strftime(a.m, '%Y-%m') AS year_month,
           CAST(s.total_days AS DOUBLE) / CAST(a.n_alive AS DOUBLE)
             AS avg_days,
           CAST(s.total_days AS DOUBLE) / CAST(a.n_alive AS DOUBLE)
             / CAST(b.business_days AS DOUBLE) * 100.0 AS probability
    FROM alive a
    JOIN sums s ON s.rating_group = a.rating_group AND s.m = a.m
    LEFT JOIN bdays b ON b.year_month = strftime(a.m, '%Y-%m')
    """,
)
def r10_trading_intensity(spark, sf_dir):
    """Trading-intensity heatmap data (`stage1/helper_functions.py:
    3256-3451`, create_trading_intensity_heatmap): per 5-bucket rating
    group and month, the average probability (%) of a valid price on a
    business day — zero-trade alive months count in the denominator
    (the a13b spine-free trick), divided by the weekday count per
    month (compute_business_days_per_month — plain weekdays).

    Spark shape: two fact aggregations + the broadcast months-side
    alive range join + the calendar-bounded business-day frame; no
    month loop, no bond x day expansion."""
    from trace_data_pipeline_spark.functions.nyse_calendar import (
        business_days_per_month_from_bounds,
    )

    ev = load_table(spark, sf_dir, "events")
    d = F.to_date("ts")
    spc = F.when(
        (F.col("user_id") + F.dayofmonth(d)) % 11 == 0, F.lit(22)
    ).otherwise(F.lit(1) + F.col("user_id") % 21)
    grp = (
        F.when(spc <= 5, "1-5 (AAA-A-)")
        .when(spc <= 10, "6-10 (BBB+-)")
        .when(spc <= 15, "11-15 (BB+-)")
        .when(spc <= 21, "16-21 (B+-)")
        .otherwise("22 (D)")
    )
    pr = F.when(F.col("event_id") % 7 != 0, F.col("value"))
    base = ev.select(
        grp.alias("rating_group"),
        "user_id",
        d.alias("d"),
        F.date_trunc("month", d).alias("m"),
        pr.alias("pr"),
    )
    # min/max d ride the counts aggregation so the business-day spine
    # bounds reduce from THIS tiny frame — no second scan of base and
    # no driver collect (r14 verdict item 8)
    counts = base.groupBy("rating_group", "user_id", "m").agg(
        F.count("pr").alias("days_traded"),
        F.min("d").alias("__d_min"),
        F.max("d").alias("__d_max"),
    )
    life = base.groupBy("rating_group", "user_id").agg(
        F.min("m").alias("f"), F.max("m").alias("l")
    )
    months = base.select(
        F.col("rating_group").alias("__rg"), F.col("m").alias("__m")
    ).distinct()
    alive = (
        life.join(
            F.broadcast(months),
            (F.col("rating_group") == F.col("__rg"))
            & (F.col("f") <= F.col("__m"))
            & (F.col("__m") <= F.col("l")),
        )
        .groupBy(
            F.col("__rg").alias("rating_group"), F.col("__m").alias("m")
        )
        .agg(F.count(F.lit(1)).alias("n_alive"))
    )
    sums = counts.groupBy("rating_group", "m").agg(
        F.sum("days_traded").alias("total_days")
    )
    bounds = counts.agg(
        F.min("__d_min").alias("lo"), F.max("__d_max").alias("hi")
    )
    bdays = business_days_per_month_from_bounds(bounds)
    avg = F.col("total_days").cast("double") / F.col("n_alive").cast("double")
    return (
        alive.join(sums, ["rating_group", "m"])
        .select(
            "rating_group",
            F.date_format("m", "yyyy-MM").alias("year_month"),
            F.col("total_days"),
            F.col("n_alive"),
            avg.alias("avg_days"),
        )
        .join(F.broadcast(bdays), "year_month", "left")
        .select(
            "rating_group",
            "year_month",
            "avg_days",
            (
                F.col("avg_days")
                / F.col("business_days").cast("double")
                * F.lit(100.0)
            ).alias("probability"),
        )
    )


@register(
    "r11_weekly_panel_series",
    oracle="""
    WITH base AS (
      SELECT d + ((8 - isodow(d)) % 7) * INTERVAL 1 DAY AS w,
             CAST(round(value * 100, 0) AS BIGINT) AS pr_cents,
             (user_id % 50 + 1) * 1000 AS amt
      FROM (SELECT user_id, CAST(ts AS DATE) AS d, value,
                   CASE WHEN (user_id + day(CAST(ts AS DATE))) % 11 = 0
                        THEN 22 ELSE 1 + user_id % 21 END AS spc
            FROM events)
      WHERE spc = 22
    ), agg AS (
      SELECT w, count(*) AS n,
             CAST(SUM(pr_cents) AS BIGINT) AS s,
             CAST(SUM(amt * pr_cents) AS BIGINT) AS mc
      FROM base GROUP BY 1
    ), bounds AS (SELECT min(w) AS lo, max(w) AS hi FROM base),
    spine AS (
      SELECT unnest(generate_series(CAST(lo AS TIMESTAMP),
                                    CAST(hi AS TIMESTAMP),
                                    INTERVAL 7 DAY)) AS w
      FROM bounds
    )
    SELECT strftime(CAST(sp.w AS DATE), '%Y-%m-%d') AS week,
           CAST(a.s AS DOUBLE) / 100.0 / CAST(a.n AS DOUBLE) AS pr,
           COALESCE(CAST(a.mc AS DOUBLE) / 1.0e10, 0.0) AS market_cap
    FROM spine sp LEFT JOIN agg a ON a.w = sp.w
    """,
)
def r11_weekly_panel_series(spark, sf_dir):
    """Stage-1 quality-report weekly time-series frame
    (`stage1/helper_functions.py:1312-1502`, create_time_series_plots,
    'defaulted' variant — the richest): W-MON weekly resample over the
    defaulted slice with pandas-resample bin semantics — the weekly
    index is CONTIGUOUS from first to last label, so gap weeks exist
    with a NULL mean and a 0.0 market-cap SUM (resample('W-MON').sum()
    of an empty bin), and market_cap = amt_outstanding·pr·10/1e9 is
    summed, not averaged, exactly like the reference's defaulted
    branch.

    Float discipline: weekly means are exact-integer cent sums divided
    once; the market-cap sum is an exact integer product sum divided by
    1e10 — bit-equal across engines with no rounding step."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    d = F.to_date("ts")
    spc = F.when(
        (F.col("user_id") + F.dayofmonth(d)) % 11 == 0, F.lit(22)
    ).otherwise(F.lit(1) + F.col("user_id") % 21)
    week = F.date_add(d, (F.lit(2) - F.dayofweek(d) + 7) % 7)
    pr_cents = F.round(F.col("value") * 100, 0).cast("long")
    amt = ((F.col("user_id") % 50 + 1) * 1000).cast("long")
    base = ev.filter(spc == 22).select(
        week.alias("w"),
        pr_cents.alias("pr_cents"),
        amt.alias("amt"),
    )
    agg = base.groupBy("w").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pr_cents").alias("s"),
        F.sum(F.col("amt") * F.col("pr_cents")).alias("mc"),
    )
    spine = base.agg(F.min("w").alias("lo"), F.max("w").alias("hi")).select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 7 days"))
        ).alias("w")
    )
    return spine.join(agg, "w", "left").select(
        F.date_format("w", "yyyy-MM-dd").alias("week"),
        (
            F.col("s").cast("double") / F.lit(100.0)
            / F.col("n").cast("double")
        ).alias("pr"),
        F.coalesce(
            F.col("mc").cast("double") / F.lit(1.0e10), F.lit(0.0)
        ).alias("market_cap"),
    )


@register(
    "r12_industry_marketcap_share",
    oracle="""
    WITH base AS (
      SELECT CAST(ts AS DATE) AS d,
             1 + user_id % 17 AS ff17num,
             CAST(round(value * 100, 0) AS BIGINT)
               * ((user_id % 50 + 1) * 1000) AS mc_units
      FROM events
    ), wk AS (
      SELECT d + ((8 - isodow(d)) % 7) * INTERVAL 1 DAY
               - INTERVAL 6 DAY AS week,
             ff17num, mc_units
      FROM base
    ), grp AS (
      SELECT week, ff17num, CAST(SUM(mc_units) AS BIGINT) AS s
      FROM wk GROUP BY 1, 2
    ), tot AS (
      SELECT week, CAST(SUM(mc_units) AS BIGINT) AS t
      FROM wk GROUP BY 1
    )
    SELECT strftime(CAST(g.week AS DATE), '%Y-%m-%d') AS week,
           g.ff17num,
           CAST(g.s AS DOUBLE) / 1.0e13 AS market_cap,
           100.0 * CAST(g.s AS DOUBLE) / CAST(t.t AS DOUBLE) AS pct
    FROM grp g JOIN tot t ON t.week = g.week
    """,
)
def r12_industry_marketcap_share(spark, sf_dir):
    """Industry market-cap composition over time
    (`stage1/helper_functions.py:4642-4810`,
    create_industry_marketcap_evolution_plot): weekly SUM of
    market cap (pr·10·amt_outstanding/1e12) per FF industry, as a share
    of the week's total. Two quirks reproduced: the week label is
    pd.Period('W-MON').to_timestamp() — the period START (the TUESDAY
    six days before the Monday end), NOT the resample('W-MON') Monday
    label the other weekly frames use; and shares are computed before
    the pivot's fillna(0), so absent (week, industry) cells are simply
    missing rows. Market-cap sums run in exact integer units
    (cents × amt) so both engines divide the same integers."""
    ev = load_table(spark, sf_dir, "events")
    d = F.to_date("ts")
    week = F.date_add(
        F.date_add(d, (F.lit(2) - F.dayofweek(d) + 7) % 7), -6
    )
    mc_units = (
        F.round(F.col("value") * 100, 0).cast("long")
        * ((F.col("user_id") % 50 + 1) * 1000).cast("long")
    )
    base = ev.select(
        week.alias("week"),
        (F.lit(1) + F.col("user_id") % 17).alias("ff17num"),
        mc_units.alias("mc_units"),
    )
    grp = base.groupBy("week", "ff17num").agg(F.sum("mc_units").alias("s"))
    tot = base.groupBy("week").agg(F.sum("mc_units").alias("t"))
    return grp.join(tot, "week").select(
        F.date_format("week", "yyyy-MM-dd").alias("week"),
        "ff17num",
        (F.col("s").cast("double") / F.lit(1.0e13)).alias("market_cap"),
        (
            F.lit(100.0) * F.col("s").cast("double")
            / F.col("t").cast("double")
        ).alias("pct"),
    )


_SIZE_EDGES = (0.005, 0.01, 0.02, 0.05, 0.1, 0.2, 0.5,
               1.0, 2.0, 5.0, 10.0, 20.0)
_SIZE_LABELS = ("le5k", "le10k", "le20k", "le50k", "le100k", "le200k",
                "le500k", "le1M", "le2M", "le5M", "le10M", "le20M",
                "le20Mplus")


def _r13_cum_sql(panel: str, pred: str) -> str:
    cols = ",\n".join(
        f"           100.0 * CAST(SUM(CASE WHEN dvolume >= 0 AND "
        f"dvolume < {e} THEN 1 ELSE 0 END) AS DOUBLE) "
        f"/ CAST(COUNT(*) AS DOUBLE) AS {lab}"
        for e, lab in zip(_SIZE_EDGES, _SIZE_LABELS[:-1])
    )
    return f"""
      SELECT '{panel}' AS panel,
             strftime(date_trunc('month', d), '%Y-%m') AS year_month,
{cols},
           100.0 * CAST(SUM(CASE WHEN dvolume >= 0 THEN 1 ELSE 0 END)
                        AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS {_SIZE_LABELS[-1]}
      FROM rated WHERE {pred} GROUP BY 1, 2
    """


@register(
    "r13_trade_size_cumulative",
    oracle="""
    WITH rated AS (
      SELECT CAST(ts AS DATE) AS d,
             CASE WHEN event_id % 19 = 0 THEN NULL
                  ELSE value / 50.0 END AS dvolume,
             CASE WHEN (user_id + day(CAST(ts AS DATE))) % 11 = 0
                  THEN 22 ELSE 1 + user_id % 21 END AS spc
      FROM events
    )
    """
    + _r13_cum_sql("all_bonds", "TRUE")
    + " UNION ALL "
    + _r13_cum_sql("investment_grade", "spc >= 1 AND spc <= 10")
    + " UNION ALL "
    + _r13_cum_sql("non_investment_grade", "spc >= 11 AND spc <= 22"),
)
def r13_trade_size_cumulative(spark, sf_dir):
    """Trade-size distribution over time
    (`stage1/helper_functions.py:4979-5147`,
    create_trade_size_distribution_plot): per rating panel and month,
    the CUMULATIVE share of trades below each dollar-volume threshold
    (pd.cut right=False buckets cumsum'd). Reference quirks reproduced:
    the denominator is ALL rows that month — null and negative dvolume
    rows count in the total but fall in no bucket (pd.cut → NaN), so
    the top 'everything' line need not reach 100; the NIG panel
    includes defaulted (11–22). Counts are exact integers; each share
    is one division."""
    ev = load_table(spark, sf_dir, "events")
    d = F.to_date("ts")
    spc = F.when(
        (F.col("user_id") + F.dayofmonth(d)) % 11 == 0, F.lit(22)
    ).otherwise(F.lit(1) + F.col("user_id") % 21)
    dvol = F.when(F.col("event_id") % 19 == 0, F.lit(None)).otherwise(
        F.col("value") / 50.0
    )
    rated = ev.select(
        F.date_format(F.date_trunc("month", d), "yyyy-MM").alias(
            "year_month"
        ),
        dvol.alias("dvolume"),
        spc.alias("spc"),
    )
    panels = (
        ("all_bonds", F.lit(True)),
        ("investment_grade", (F.col("spc") >= 1) & (F.col("spc") <= 10)),
        ("non_investment_grade", (F.col("spc") >= 11) & (F.col("spc") <= 22)),
    )
    outs = []
    for name, pred in panels:
        aggs = [
            (
                F.lit(100.0)
                * F.sum(
                    F.when(
                        (F.col("dvolume") >= 0) & (F.col("dvolume") < e), 1
                    ).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias(lab)
            for e, lab in zip(_SIZE_EDGES, _SIZE_LABELS[:-1])
        ]
        aggs.append(
            (
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("dvolume") >= 0, 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias(_SIZE_LABELS[-1])
        )
        outs.append(
            rated.filter(pred)
            .groupBy("year_month")
            .agg(*aggs)
            .select(F.lit(name).alias("panel"), "year_month", *_SIZE_LABELS)
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


@register(
    "r14_rating_maturity_mix",
    oracle="""
    WITH rated AS (
      SELECT CAST(ts AS DATE) AS d,
             CASE WHEN (user_id + day(CAST(ts AS DATE))) % 11 = 0
                  THEN 22 ELSE 1 + user_id % 21 END AS spc,
             (user_id % 25) + 0.5 AS bond_maturity
      FROM events
    ), wk AS (
      SELECT d + ((8 - isodow(d)) % 7) * INTERVAL 1 DAY
               - INTERVAL 6 DAY AS week,
             CASE WHEN spc BETWEEN 1 AND 7 THEN 'AAA+ to A-'
                  WHEN spc BETWEEN 8 AND 10 THEN 'BBB+ to BBB-'
                  WHEN spc BETWEEN 11 AND 13 THEN 'BB+ to BB-'
                  WHEN spc BETWEEN 14 AND 16 THEN 'B+ to B-'
                  WHEN spc BETWEEN 17 AND 21 THEN 'CCC+ to C'
                  ELSE 'D' END AS rating_category,
             CASE WHEN bond_maturity < 3 THEN '1 to 3 Year'
                  WHEN bond_maturity < 5 THEN '3 to 5 Year'
                  WHEN bond_maturity < 10 THEN '5 to 10 Year'
                  ELSE '10 Year Plus' END AS maturity_category
      FROM rated
    ), long_ AS (
      SELECT week, 'rating' AS panel, rating_category AS category FROM wk
      UNION ALL
      SELECT week, 'maturity', maturity_category FROM wk
    ), cnt AS (
      SELECT panel, week, category, COUNT(*) AS n
      FROM long_ GROUP BY 1, 2, 3
    ), tot AS (
      SELECT panel, week, COUNT(*) AS t FROM long_ GROUP BY 1, 2
    )
    SELECT c.panel, strftime(CAST(c.week AS DATE), '%Y-%m-%d') AS week,
           c.category, CAST(c.n AS BIGINT) AS n,
           100.0 * CAST(c.n AS DOUBLE) / CAST(t.t AS DOUBLE) AS pct
    FROM cnt c JOIN tot t ON t.panel = c.panel AND t.week = c.week
    """,
)
def r14_rating_maturity_mix(spark, sf_dir):
    """Rating/maturity composition over time
    (`stage1/helper_functions.py:5491-5760`,
    create_rating_maturity_evolution_plot): weekly trade shares by the
    six NAIC-style rating buckets (Panel A) and the four maturity
    buckets (Panel B), on the same Period('W-MON').to_timestamp()
    week-START label as r12. Counts are exact; each share is one
    division; absent (week, category) cells are missing rows (the
    pivot's fillna(0) is presentation)."""
    ev = load_table(spark, sf_dir, "events")
    d = F.to_date("ts")
    spc = F.when(
        (F.col("user_id") + F.dayofmonth(d)) % 11 == 0, F.lit(22)
    ).otherwise(F.lit(1) + F.col("user_id") % 21)
    mat = (F.col("user_id") % 25) + 0.5
    week = F.date_add(
        F.date_add(d, (F.lit(2) - F.dayofweek(d) + 7) % 7), -6
    )
    rating_cat = (
        F.when(spc.between(1, 7), "AAA+ to A-")
        .when(spc.between(8, 10), "BBB+ to BBB-")
        .when(spc.between(11, 13), "BB+ to BB-")
        .when(spc.between(14, 16), "B+ to B-")
        .when(spc.between(17, 21), "CCC+ to C")
        .otherwise("D")
    )
    mat_cat = (
        F.when(mat < 3, "1 to 3 Year")
        .when(mat < 5, "3 to 5 Year")
        .when(mat < 10, "5 to 10 Year")
        .otherwise("10 Year Plus")
    )
    wk = ev.select(
        week.alias("week"),
        rating_cat.alias("rating_category"),
        mat_cat.alias("maturity_category"),
    )
    long_ = wk.select(
        "week", F.lit("rating").alias("panel"),
        F.col("rating_category").alias("category"),
    ).unionByName(
        wk.select(
            "week", F.lit("maturity").alias("panel"),
            F.col("maturity_category").alias("category"),
        )
    )
    cnt = long_.groupBy("panel", "week", "category").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = long_.groupBy("panel", "week").agg(F.count(F.lit(1)).alias("t"))
    return cnt.join(tot, ["panel", "week"]).select(
        "panel",
        F.date_format("week", "yyyy-MM-dd").alias("week"),
        "category",
        "n",
        (
            F.lit(100.0) * F.col("n").cast("double")
            / F.col("t").cast("double")
        ).alias("pct"),
    )


@register(
    "r15_trade_frequency_hist",
    oracle="""
    WITH base AS (
      SELECT CASE WHEN spc <= 10 THEN 'IG' WHEN spc = 22 THEN 'DEF'
                  ELSE 'NIG' END AS rating_class,
             user_id, date_trunc('month', d) AS m, pr
      FROM (SELECT user_id, CAST(ts AS DATE) AS d,
                   CASE WHEN (user_id + day(CAST(ts AS DATE))) % 11 = 0
                        THEN 22 ELSE 1 + user_id % 21 END AS spc,
                   CASE WHEN event_id % 7 != 0 THEN value END AS pr
            FROM events)
    ), counts AS (
      SELECT rating_class, user_id, m, count(pr) AS days
      FROM base GROUP BY 1, 2, 3
    ), life AS (
      SELECT rating_class,
             CAST(SUM(date_diff('month', f, l) + 1) AS BIGINT)
               AS total_bond_months,
             CAST(COUNT(*) AS BIGINT) AS n_bonds
      FROM (SELECT rating_class, user_id, min(m) AS f, max(m) AS l
            FROM base GROUP BY 1, 2)
      GROUP BY 1
    ), grp AS (
      SELECT rating_class, days, CAST(COUNT(*) AS BIGINT) AS n
      FROM counts GROUP BY 1, 2
    ), ngroups AS (
      SELECT rating_class, CAST(SUM(n) AS BIGINT) AS n_grp FROM grp
      GROUP BY 1
    ), with_zero AS (
      SELECT g.rating_class, g.days,
             g.n + CASE WHEN g.days = 0
                        THEN l.total_bond_months - ng.n_grp
                        ELSE 0 END AS n
      FROM grp g
      JOIN life l ON l.rating_class = g.rating_class
      JOIN ngroups ng ON ng.rating_class = g.rating_class
      UNION ALL
      SELECT l.rating_class, 0 AS days,
             l.total_bond_months - ng.n_grp AS n
      FROM life l JOIN ngroups ng ON ng.rating_class = l.rating_class
      WHERE NOT EXISTS (SELECT 1 FROM grp g
                        WHERE g.rating_class = l.rating_class
                          AND g.days = 0)
        AND l.total_bond_months > ng.n_grp
    ), inrange AS (
      SELECT * FROM with_zero WHERE days < 23
    ), tot AS (
      SELECT rating_class, CAST(SUM(n) AS BIGINT) AS t FROM inrange
      GROUP BY 1
    )
    SELECT i.rating_class, CAST(i.days AS BIGINT) AS days,
           CAST(i.n AS BIGINT) AS n,
           100.0 * CAST(i.n AS DOUBLE) / CAST(t.t AS DOUBLE) AS pct
    FROM inrange i JOIN tot t ON t.rating_class = i.rating_class
    """,
)
def r15_trade_frequency_hist(spark, sf_dir):
    """Trade-frequency histogram frame
    (`stage1/helper_functions.py:2337-2504`,
    create_trade_frequency_histogram): per rating class, the
    distribution of days-traded per bond-month INCLUDING the zero
    bond-months (alive months with no observation, reconstructed as
    total-alive-bond-months minus observed groups — never materialized
    per row). Matplotlib's bins=range(0,24) with density=True keeps
    only days<23 in both the counts and the normalization — reproduced
    by the in-range filter before the share division. Exact integer
    counts, one division per row."""
    ev = load_table(spark, sf_dir, "events")
    d = F.to_date("ts")
    spc = F.when(
        (F.col("user_id") + F.dayofmonth(d)) % 11 == 0, F.lit(22)
    ).otherwise(F.lit(1) + F.col("user_id") % 21)
    cls = F.when(spc <= 10, "IG").when(spc == 22, "DEF").otherwise("NIG")
    pr = F.when(F.col("event_id") % 7 != 0, F.col("value"))
    base = ev.select(
        cls.alias("rating_class"),
        "user_id",
        F.date_trunc("month", d).alias("m"),
        pr.alias("pr"),
    )
    counts = base.groupBy("rating_class", "user_id", "m").agg(
        F.count("pr").alias("days")
    )
    life = (
        base.groupBy("rating_class", "user_id")
        .agg(F.min("m").alias("f"), F.max("m").alias("l"))
        .groupBy("rating_class")
        .agg(
            F.sum(
                (F.months_between("l", "f").cast("long") + 1)
            ).alias("total_bond_months")
        )
    )
    grp = counts.groupBy("rating_class", "days").agg(
        F.count(F.lit(1)).alias("n")
    )
    ngroups = grp.groupBy("rating_class").agg(F.sum("n").alias("n_grp"))
    sides = life.join(ngroups, "rating_class").select(
        "rating_class",
        (F.col("total_bond_months") - F.col("n_grp")).alias("n_zero"),
    )
    with_zero = (
        grp.join(sides, "rating_class")
        .select(
            "rating_class",
            "days",
            (
                F.col("n")
                + F.when(F.col("days") == 0, F.col("n_zero")).otherwise(0)
            ).alias("n"),
        )
        .unionByName(
            # classes where NO observed group has days == 0 still get
            # their zero bucket from the reconstructed zero months
            sides.join(
                grp.filter(F.col("days") == 0).select("rating_class"),
                "rating_class",
                "left_anti",
            )
            .filter(F.col("n_zero") > 0)
            .select(
                "rating_class",
                F.lit(0).cast("int").alias("days"),
                F.col("n_zero").alias("n"),
            )
        )
    )
    inrange = with_zero.filter(F.col("days") < 23)
    tot = inrange.groupBy("rating_class").agg(F.sum("n").alias("t"))
    return inrange.join(tot, "rating_class").select(
        "rating_class",
        F.col("days").cast("long").alias("days"),
        F.col("n").cast("long").alias("n"),
        (
            F.lit(100.0) * F.col("n").cast("double")
            / F.col("t").cast("double")
        ).alias("pct"),
    )


@register(
    "r16_concentration_over_time",
    oracle="""
    WITH base AS (
      SELECT CASE WHEN spc <= 10 THEN 'IG' WHEN spc = 22 THEN 'DEF'
                  ELSE 'NIG' END AS rating_class,
             user_id, strftime(date_trunc('month', d), '%Y-%m')
               AS year_month,
             cents
      FROM (SELECT user_id, CAST(ts AS DATE) AS d,
                   CASE WHEN (user_id + day(CAST(ts AS DATE))) % 11 = 0
                        THEN 22 ELSE 1 + user_id % 21 END AS spc,
                   CAST(round(value * 100, 0) AS BIGINT) AS cents
            FROM events)
    ), bv AS (
      SELECT rating_class, year_month, user_id,
             CAST(SUM(cents) AS BIGINT) AS v
      FROM base GROUP BY 1, 2, 3
    ), ranked AS (
      SELECT rating_class, year_month, v,
             CAST(SUM(v) OVER (PARTITION BY rating_class, year_month
                               ORDER BY v DESC, user_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum,
             CAST(SUM(v) OVER (PARTITION BY rating_class, year_month)
                  AS BIGINT) AS t,
             COUNT(*) OVER (PARTITION BY rating_class, year_month) AS nb
      FROM bv
    )
    SELECT rating_class, year_month,
           100.0 * CAST(SUM(CASE WHEN CAST(cum AS DOUBLE)
                                      / CAST(t AS DOUBLE) * 100.0 <= 50
                                 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(max(nb) AS DOUBLE) AS pct_for_50,
           100.0 * CAST(SUM(CASE WHEN CAST(cum AS DOUBLE)
                                      / CAST(t AS DOUBLE) * 100.0 <= 75
                                 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(max(nb) AS DOUBLE) AS pct_for_75,
           100.0 * CAST(SUM(CASE WHEN CAST(cum AS DOUBLE)
                                      / CAST(t AS DOUBLE) * 100.0 <= 90
                                 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(max(nb) AS DOUBLE) AS pct_for_90
    FROM ranked GROUP BY 1, 2
    """,
)
def r16_concentration_over_time(spark, sf_dir):
    """Trading concentration over time
    (`stage1/helper_functions.py:2700-2886`,
    create_concentration_over_time_plot): per rating class and MONTH,
    the share of bonds accounting for 50/75/90% of dollar volume — the
    monthly twin of a10's pooled concentration. Per-bond volumes
    cumulate as exact integer cents along the (volume DESC, bond ASC)
    order (pandas' stable descending sort of the cusip-sorted groupby
    output), so the <=threshold comparisons are engine-identical; one
    window partitioning serves the running sum, the total and the bond
    count."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    d = F.to_date("ts")
    spc = F.when(
        (F.col("user_id") + F.dayofmonth(d)) % 11 == 0, F.lit(22)
    ).otherwise(F.lit(1) + F.col("user_id") % 21)
    cls = F.when(spc <= 10, "IG").when(spc == 22, "DEF").otherwise("NIG")
    base = ev.select(
        cls.alias("rating_class"),
        "user_id",
        F.date_format(F.date_trunc("month", d), "yyyy-MM").alias(
            "year_month"
        ),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    bv = base.groupBy("rating_class", "year_month", "user_id").agg(
        F.sum("cents").alias("v")
    )
    part = Window.partitionBy("rating_class", "year_month")
    w_cum = part.orderBy(F.col("v").desc(), F.col("user_id")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = bv.select(
        "rating_class",
        "year_month",
        F.sum("v").over(w_cum).alias("cum"),
        F.sum("v").over(part).alias("t"),
        F.count(F.lit(1)).over(part).alias("nb"),
    )
    pct = F.col("cum").cast("double") / F.col("t").cast("double") * F.lit(
        100.0
    )
    aggs = [
        (
            F.lit(100.0)
            * F.sum(F.when(pct <= th, 1).otherwise(0)).cast("double")
            / F.max("nb").cast("double")
        ).alias(f"pct_for_{th}")
        for th in (50, 75, 90)
    ]
    return ranked.groupBy("rating_class", "year_month").agg(*aggs)


@register(
    "f10b_144a_screen",
    oracle="""
    WITH flagged AS (
      SELECT p_partkey,
             CASE p_partkey % 5 WHEN 0 THEN 'Y' WHEN 1 THEN 'N'
                                WHEN 2 THEN NULL ELSE 'N' END AS rule_144a,
             CASE p_partkey % 7 WHEN 0 THEN 'Y' WHEN 3 THEN NULL
                                ELSE 'N' END AS private_placement
      FROM part
    )
    SELECT p_partkey, rule_144a, private_placement FROM flagged
    WHERE rule_144a = 'Y' OR private_placement = 'Y'
    """,
)
def f10b_144a_screen(spark, sf_dir):
    """F10 depth: the LITERAL 144A universe screen —
    `rule_144a == 'Y' OR private_placement == 'Y'`
    (`create_daily_standard_trace.py:2076-2080`, the data_type='144a'
    branch) — as its own oracle-checked entry instead of pattern
    subsumption under f10's generic two-column disjunct (r14 verdict
    item 5). Null semantics match pandas exactly: a null flag compares
    False/NULL, so a row keeps only on a literal 'Y' on either side
    (null OR false → null → dropped, same outcome as pandas'
    NaN == 'Y' → False). Pure pushed-down filter, zero shuffles."""
    part = load_table(spark, sf_dir, "part")
    k = F.col("p_partkey")
    flagged = part.select(
        "p_partkey",
        F.when(k % 5 == 0, "Y")
        .when(k % 5 == 1, "N")
        .when(k % 5 == 2, F.lit(None).cast("string"))
        .otherwise("N")
        .alias("rule_144a"),
        F.when(k % 7 == 0, "Y")
        .when(k % 7 == 3, F.lit(None).cast("string"))
        .otherwise("N")
        .alias("private_placement"),
    )
    return flagged.filter(
        (F.col("rule_144a") == "Y") | (F.col("private_placement") == "Y")
    )


@register(
    "r17_industry_dvolume_evolution",
    oracle="""
    WITH base AS (
      SELECT CAST(ts AS DATE) AS d,
             CASE WHEN user_id % 23 = 0 THEN NULL
                  ELSE 1 + user_id % 17 END AS ff17num,
             CAST(round(value * 100, 0) AS BIGINT)
               * (1 + user_id % 9) AS dvol_units
      FROM events
    ), wk AS (
      SELECT d + ((8 - isodow(d)) % 7) * INTERVAL 1 DAY
               - INTERVAL 6 DAY AS week,
             ff17num, dvol_units
      FROM base WHERE ff17num IS NOT NULL
    ), grp AS (
      SELECT week, ff17num, CAST(SUM(dvol_units) AS BIGINT) AS s
      FROM wk GROUP BY 1, 2
    ), tot AS (
      SELECT week, CAST(SUM(dvol_units) AS BIGINT) AS t
      FROM wk GROUP BY 1
    )
    SELECT strftime(CAST(g.week AS DATE), '%Y-%m-%d') AS week,
           g.ff17num,
           CAST(g.s AS DOUBLE) / 100.0 AS dvolume,
           100.0 * CAST(g.s AS DOUBLE) / CAST(t.t AS DOUBLE) AS pct
    FROM grp g JOIN tot t ON t.week = g.week
    """,
)
def r17_industry_dvolume_evolution(spark, sf_dir):
    """Industry dollar-volume composition over time
    (`stage1/helper_functions.py:4813-4976`,
    create_industry_dvolume_evolution_plot): weekly SUM of dvolume per
    FF industry as a share of the week's total, after the reference's
    dropna on (dvolume, ff_column). Same two quirks as r12 (the sibling
    market-cap figure): the week label is pd.Period('W-MON')
    .to_timestamp() — the period START (the Tuesday), not the resample
    Monday — and shares are computed before the pivot's fillna(0), so
    absent (week, industry) cells are missing rows, not zeros. Sums run
    in exact integer units (cents x lot) so both engines divide the
    same integers. Was pattern-subsumed by r12; own entry per r14
    verdict item 6.

    Spark shape: two hash aggregates off one scan + an
    aggregate-on-aggregate join keyed by week; no windows, no UDFs."""
    ev = load_table(spark, sf_dir, "events")
    d = F.to_date("ts")
    week = F.date_add(
        F.date_add(d, (F.lit(2) - F.dayofweek(d) + 7) % 7), -6
    )
    ff = F.when(F.col("user_id") % 23 == 0, F.lit(None)).otherwise(
        F.lit(1) + F.col("user_id") % 17
    )
    dvol_units = (
        F.round(F.col("value") * 100, 0).cast("long")
        * (1 + F.col("user_id") % 9).cast("long")
    )
    base = ev.select(
        week.alias("week"), ff.alias("ff17num"), dvol_units.alias("dv")
    ).filter(F.col("ff17num").isNotNull())
    grp = base.groupBy("week", "ff17num").agg(F.sum("dv").alias("s"))
    tot = base.groupBy("week").agg(F.sum("dv").alias("t"))
    return grp.join(tot, "week").select(
        F.date_format("week", "yyyy-MM-dd").alias("week"),
        "ff17num",
        (F.col("s").cast("double") / F.lit(100.0)).alias("dvolume"),
        (
            F.lit(100.0) * F.col("s").cast("double")
            / F.col("t").cast("double")
        ).alias("pct"),
    )


_R18_CASE_BT = """CASE WHEN user_id % 63 < 1 THEN 'BT0'
                       WHEN user_id % 63 < 3 THEN 'BT1'
                       WHEN user_id % 63 < 7 THEN 'BT2'
                       WHEN user_id % 63 < 15 THEN 'BT3'
                       WHEN user_id % 63 < 31 THEN 'BT4'
                       ELSE 'BT5' END"""
_R18_CASE_CD = """CASE WHEN user_id % 255 < 1 THEN 'C0'
                       WHEN user_id % 255 < 3 THEN 'C1'
                       WHEN user_id % 255 < 7 THEN 'C2'
                       WHEN user_id % 255 < 15 THEN 'C3'
                       WHEN user_id % 255 < 31 THEN 'C4'
                       WHEN user_id % 255 < 63 THEN 'C5'
                       WHEN user_id % 255 < 127 THEN 'C6'
                       ELSE 'C7' END"""


@register(
    "r18_bond_characteristics_evolution",
    oracle=f"""
    WITH base AS (
      SELECT CAST(ts AS DATE)
               + ((8 - isodow(CAST(ts AS DATE))) % 7) * INTERVAL 1 DAY
               - INTERVAL 6 DAY AS week,
             {_R18_CASE_BT} AS bond_type,
             {_R18_CASE_CD} AS country_domicile,
             CASE WHEN user_id % 4 = 0 THEN 'Y' ELSE 'N' END AS rule_144a
      FROM events
      WHERE user_id % 29 <> 0
    ), combo AS (
      SELECT week, bond_type, country_domicile, rule_144a,
             COUNT(*) AS c
      FROM base GROUP BY 1, 2, 3, 4
    ), long AS (
      SELECT week, 'bond_type' AS panel, bond_type AS cat, c FROM combo
      UNION ALL
      SELECT week, 'country_domicile', country_domicile, c FROM combo
      UNION ALL
      SELECT week, 'rule_144a', rule_144a, c FROM combo
    ), cnt AS (
      SELECT panel, week, cat, CAST(SUM(c) AS BIGINT) AS c
      FROM long GROUP BY 1, 2, 3
    ), tot AS (
      SELECT panel, week, CAST(SUM(c) AS BIGINT) AS t
      FROM long GROUP BY 1, 2
    ), nw AS (
      SELECT COUNT(DISTINCT week) AS w FROM base
    ), mean AS (
      SELECT c.panel, c.cat,
             SUM(100.0 * CAST(c.c AS DOUBLE) / CAST(t.t AS DOUBLE))
               / (SELECT w FROM nw) AS mpct
      FROM cnt c JOIN tot t ON t.panel = c.panel AND t.week = c.week
      GROUP BY 1, 2
    ), lab AS (
      SELECT panel, cat,
             CASE WHEN row_number() OVER (
                    PARTITION BY panel ORDER BY mpct DESC, cat
                  ) <= 5 THEN cat ELSE 'Other' END AS label
      FROM mean
    ), relab AS (
      SELECT c.panel, c.week, l.label, CAST(SUM(c.c) AS BIGINT) AS c
      FROM cnt c JOIN lab l ON l.panel = c.panel AND l.cat = c.cat
      GROUP BY 1, 2, 3
    ), spine AS (
      SELECT DISTINCT l.panel, l.label, wks.week
      FROM lab l CROSS JOIN (SELECT DISTINCT week FROM base) wks
    )
    SELECT s.panel,
           strftime(CAST(s.week AS DATE), '%Y-%m-%d') AS week,
           s.label AS category,
           100.0 * CAST(COALESCE(r.c, 0) AS DOUBLE)
             / CAST(t.t AS DOUBLE) AS pct
    FROM spine s
    JOIN tot t ON t.panel = s.panel AND t.week = s.week
    LEFT JOIN relab r
      ON r.panel = s.panel AND r.week = s.week AND r.label = s.label
    """,
)
def r18_bond_characteristics_evolution(spark, sf_dir):
    """Bond-characteristics composition over time
    (`stage1/helper_functions.py:5149-5488`,
    create_bond_characteristics_evolution_plot): three stacked panels —
    bond_type, country_domicile, rule_144a — each the weekly trade-count
    share per category, with the reference's top-5 + 'Other' fold:
    categories rank by their MEAN weekly share across the pivot's
    fillna(0) week rows (sum of shares / total distinct weeks), the top
    five keep their names, the rest collapse into 'Other', and the
    relabeled pivot keeps explicit zero cells (the fillna(0)). Trades
    missing ANY characteristic drop from all panels (the reference's
    single dropna over the FISD lookup). Was pattern-subsumed; own
    entry per r14 verdict item 6.

    Numeric discipline: every emitted pct is one division of exact
    integer counts (the 'Other' weekly share sums COUNTS, not floats,
    algebraically identical to the reference's column sum); the float
    mean-share sum is used ONLY to rank categories, whose synthetic
    frequencies are 2x-separated so an ulp of cross-engine sum-order
    difference cannot flip the top-5 cut.

    Spark shape: ONE fact aggregation to the (week x characteristics)
    combo cube, then every later frame is combo-sized — the 3-panel
    unpivot, shares, the panel-partitioned rank window, the relabel,
    and the broadcast label x week spine. At 100 TB: one shuffle."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    d = F.to_date("ts")
    week = F.date_add(
        F.date_add(d, (F.lit(2) - F.dayofweek(d) + 7) % 7), -6
    )
    u = F.col("user_id")

    def _ladder(mod: int, prefix: str, n: int):
        m = u % mod
        expr = F.lit(f"{prefix}{n - 1}")
        for i in range(n - 2, -1, -1):
            expr = F.when(m < 2 ** (i + 1) - 1, f"{prefix}{i}").otherwise(
                expr
            )
        return expr

    base = ev.filter(u % 29 != 0).select(
        week.alias("week"),
        _ladder(63, "BT", 6).alias("bond_type"),
        _ladder(255, "C", 8).alias("country_domicile"),
        F.when(u % 4 == 0, "Y").otherwise("N").alias("rule_144a"),
    )
    combo = base.groupBy(
        "week", "bond_type", "country_domicile", "rule_144a"
    ).agg(F.count(F.lit(1)).alias("c"))
    long = (
        combo.select(
            "week", F.lit("bond_type").alias("panel"),
            F.col("bond_type").alias("cat"), "c",
        )
        .unionByName(
            combo.select(
                "week", F.lit("country_domicile").alias("panel"),
                F.col("country_domicile").alias("cat"), "c",
            )
        )
        .unionByName(
            combo.select(
                "week", F.lit("rule_144a").alias("panel"),
                F.col("rule_144a").alias("cat"), "c",
            )
        )
    )
    cnt = long.groupBy("panel", "week", "cat").agg(F.sum("c").alias("c"))
    tot = long.groupBy("panel", "week").agg(F.sum("c").alias("t"))
    nw = combo.select(F.countDistinct("week").alias("w"))
    pct = cnt.join(tot, ["panel", "week"]).withColumn(
        "pct",
        F.lit(100.0) * F.col("c").cast("double") / F.col("t").cast("double"),
    )
    mean = (
        pct.groupBy("panel", "cat")
        .agg(F.sum("pct").alias("sp"))
        .crossJoin(F.broadcast(nw))
        .withColumn("mpct", F.col("sp") / F.col("w").cast("double"))
    )
    w_rank = Window.partitionBy("panel").orderBy(
        F.col("mpct").desc(), F.col("cat")
    )
    lab = mean.withColumn("r", F.row_number().over(w_rank)).select(
        "panel",
        "cat",
        F.when(F.col("r") <= 5, F.col("cat"))
        .otherwise("Other")
        .alias("label"),
    )
    relab = (
        cnt.join(F.broadcast(lab), ["panel", "cat"])
        .groupBy("panel", "week", "label")
        .agg(F.sum("c").alias("c"))
    )
    spine = (
        base.select("week")
        .distinct()
        .crossJoin(F.broadcast(lab.select("panel", "label").distinct()))
    )
    return (
        spine.join(tot, ["panel", "week"])
        .join(relab, ["panel", "week", "label"], "left")
        .select(
            "panel",
            F.date_format("week", "yyyy-MM-dd").alias("week"),
            F.col("label").alias("category"),
            (
                F.lit(100.0)
                * F.coalesce(F.col("c"), F.lit(0)).cast("double")
                / F.col("t").cast("double")
            ).alias("pct"),
        )
    )
