"""Physical-plan guards — the 100 TB posture, asserted.

Each catalog query's physical plan is checked for scale hazards: an
accidental CartesianProduct, a dimension join that failed to broadcast,
or a scan that stopped pruning would all pass value tests at sf0.01
and then melt a cluster at 100 TB. Plans are compiled, not executed.
"""

from __future__ import annotations

import pytest

from tests.conftest import TEST_SF_DIR
from trace_data_pipeline_spark.plans import get_catalog

CATALOG = get_catalog()

# d10 broadcasts a query set against the corpus by construction — a
# BroadcastNestedLoopJoin over the broadcast side is the intended plan
_NLJ_ALLOWED = {
    "d10_cosine_topk",  # broadcast queries × corpus (intended)
    "j15_range_join",  # broadcast range table, non-equi condition
    "j13_j14_linker_extend",  # broadcast snapshot × future-date spine
    "a14_resample_ffill",  # broadcast date spine × id grid
    "a10_concentration",  # unpartitioned window over per-entity aggregate
    "a9_cross_sectional",  # global second-level aggregate
}


def _plan(spark, name: str) -> str:
    df = CATALOG[name].builder(spark, TEST_SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_no_cartesian_product(spark, name):
    """No catalog plan may contain an unbroadcast cartesian product."""
    assert "CartesianProduct" not in _plan(spark, name), name


@pytest.mark.parametrize(
    "name",
    [
        "j10_enrichment_join",
        "j16_two_hop_flag",
        "f9_calendar_semi_join",
        "w11b_modified_following",  # day spine broadcasts, equi-join
    ],
)
def test_dimension_joins_broadcast(spark, name):
    """Dimension-side joins must be broadcast (no shuffle of the fact
    table onto a small-table key)."""
    plan = _plan(spark, name)
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan, f"{name} fell back to SMJ"


def test_range_join_is_broadcast_nlj(spark):
    """J15's non-equi join must be a broadcast nested loop — never a
    shuffled cartesian."""
    plan = _plan(spark, "j15_range_join")
    assert "BroadcastNestedLoopJoin" in plan


def test_flagship_aggregate_is_single_pass(spark):
    """A1 is ONE partial+final HASH aggregate over the scan — exactly
    one shuffle, no window, no join, and no SortAggregate demotion: the
    order-sensitive first/last ride a plain min/max over the packed
    decimal tiebreak key (a min_by over a struct key would silently
    sort the fact table twice)."""
    plan = _plan(spark, "a1_daily_panel")
    assert "partial_min" in plan  # map-side combine present
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan and "Window" not in plan
    assert "HashAggregate" in plan and "SortAggregate" not in plan


def test_vocab_topk_combines_map_side(spark):
    """d20: token counting must partially aggregate BEFORE the shuffle
    (the corpus shrinks to its vocabulary in the map stage); the top-k
    rank runs over the aggregate, never the raw token stream."""
    plan = _plan(spark, "d20_vocab_topk")
    assert "partial_count" in plan
    assert plan.index("Window") < plan.index("partial_count")  # topmost


def test_kmeans_step_broadcasts_centroids(spark):
    """d22: the assignment side must broadcast the dimension-sized
    centroid set (never shuffle the corpus onto a centroid key), the
    argmax must use the group-limit pushdown, and the update must be a
    partial+final integer-sum aggregate."""
    plan = _plan(spark, "d22_kmeans_step")
    assert "BroadcastNestedLoopJoin" in plan  # corpus × broadcast centroids
    assert "WindowGroupLimit" in plan  # nearest-centroid argmax pushdown
    assert "partial_sum" in plan  # map-side combine on (cluster, dim)


def test_universe_screens_push_filters_and_prune_columns(spark):
    """f10: the chained screens must reach the parquet scan as
    PushedFilters (range, not-equal, not-null), and the scan must read
    ONLY the referenced columns — a scan fetching all of `part` for a
    1-column projection would multiply 100 TB I/O by the table width."""
    plan = _plan(spark, "f10_universe_screens")
    scan = plan[plan.index("FileScan") :]
    head = scan[:1200]
    assert "PushedFilters: [" in head
    pushed = head.split("PushedFilters: [")[1].split("]")[0]
    assert "p_size" in pushed and "IsNotNull" in pushed
    read_schema = head.split("ReadSchema: ")[1].splitlines()[0]
    assert "p_name" in read_schema  # regex screen (not pushable) needs it
    assert "p_comment" not in read_schema  # unused column pruned
    assert "p_mfgr" not in read_schema


def test_capped_jaccard_has_no_gram_self_join(spark):
    """d2 (capped): pairs must explode from bounded posting lists —
    the gram-keyed self-join (whose skew a hot gram amplifies) must be
    gone; only the two doc-id size lookups may join, and they build
    broadcast."""
    plan = _plan(spark, "d2_ngram_jaccard_pairs")
    assert "SortMergeJoin" not in plan, plan[:2000]
    assert "collect_list" in plan  # posting-list aggregate
    assert "explode(flatten(transform" in plan  # in-place pair generation


def test_standard_composite_broadcasts_removal_sides(spark):
    """p3: the cancel/reversal removal sides are collision-sized next
    to the trade stream — both anti/removal joins must build broadcast,
    and the two sequence windows must share the l_orderkey
    partitioning (one exchange each side, no extra reshuffle)."""
    plan = _plan(spark, "p3_standard_full")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Window [row_number()") == 2

def test_pq_adc_lut_broadcasts(spark):
    """d25: the per-query lookup table and the codebook must BROADCAST —
    the corpus-code side may never reshuffle on the (m, code) key, and
    the only exchange below the rank window is the (query, vector)
    partial aggregate."""
    plan = _plan(spark, "d25_pq_adc_topk")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_j4_removal_anti_join_stays_broadcast(spark):
    """j4: the removal-target anti-join must stay a BroadcastHashJoin
    (r15: the unhinted plan sort-exchanges the FULL trades side on the
    ckey string — the one exchange you can't afford at 100×). The hint
    is conditional on the corrections-source scan estimate, so this
    also guards the gate itself: a mis-read estimate would silently
    drop the hint and resurface the SMJ here."""
    plan = _plan(spark, "j4_correction_chain")
    anti = [l for l in plan.splitlines() if "LeftAnti" in l]
    assert anti and all("BroadcastHashJoin" in l for l in anti), anti
    assert "SortMergeJoin" not in plan


def test_decontaminate_broadcasts_benchmark(spark):
    """d26: the benchmark gram set must broadcast; the corpus gram
    stream collapses in a single partial-agg shuffle (no shuffle keyed
    on the gram itself, so hot boilerplate grams cannot skew)."""
    plan = _plan(spark, "d26_decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


@pytest.mark.parametrize(
    "name, marker",
    [
        ("d3_minhash_bands", "array_distinct("),   # gram-set projection
        ("d15_winnow_fingerprint", "md5("),        # winnow hash chain
    ],
)
def test_heavy_text_exprs_stay_above_widening_exchange(spark, name, marker):
    """The round-4 pushdown trap, pinned: Catalyst pushes filters below
    the widening round-robin exchange, so a filter predicate embedding
    the expensive text expression would run it single-threaded in the
    narrow scan stage. The derivation marker must appear ONLY above the
    exchange — the subtree below it may carry cheap preconditions
    (split/length/IsNotNull) but never the derived arrays."""
    # an InMemoryRelation left cached by an earlier test substitutes
    # into this plan and hides the exchange — compile cache-free
    spark.catalog.clearCache()
    plan = _plan(spark, name)
    cut = plan.find("RoundRobinPartitioning")
    assert cut != -1, f"{name} lost its widening exchange"
    below = plan[cut:]
    assert marker not in below, (
        f"{name}: heavy expression pushed below the widening exchange"
    )


def test_ivfadc_probes_and_lut_broadcast(spark):
    """d27: the centroid set and the ADC lookup table must broadcast;
    candidates meet probes on a cluster equi-join — no cartesian, no
    SMJ of the corpus."""
    plan = _plan(spark, "d27_ivfadc_topk")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_incremental_dedup_broadcasts_batch(spark):
    """d28: the batch side must broadcast into both probes (digest and
    band) — the corpus is scanned, never reshuffled on a probe key, and
    there is no corpus self-join anywhere."""
    plan = _plan(spark, "d28_incremental_dedup")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_portfolio_panel_broadcasts_and_no_sortagg(spark):
    """p6: the periodic credit-risk aggregate keeps an INT selection
    key (a var-width max_by buffer would demote it to SortAggregate),
    the market panel and the 1-row max-suppkey aggregate both
    broadcast (no fact-side shuffle for the join), and the only
    nested-loop join is the 1-row cross combine."""
    plan = _plan(spark, "p6_portfolio_panel")
    assert "SortAggregate" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_monthly_signals_shuffles_twice_no_sortagg(spark):
    """p4: the whole signal block rides TWO fact-table exchanges (the
    bond partitioning serves the daily aggregate and all three lag
    windows; the monthly rollup re-keys once); first/last selection is
    scalar-keyed so no SortAggregate demotion."""
    plan = _plan(spark, "p4_monthly_signals")
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "SortAggregate" not in plan
    assert "CartesianProduct" not in plan


def test_media_synth_entries_prune_to_doc_id(spark):
    """The d12c/d12d/d12e synthesis entries derive payloads from the
    doc id alone — the parquet scan must prune to doc_id (shipping the
    text column through the widening exchange would pay decompression
    + shuffle for bytes nobody reads)."""
    for name in ("d12c_jpeg_features", "d12d_wav_features",
                 "d12e_video_frame_features"):
        plan = _plan(spark, name)
        import re

        schemas = re.findall(r"ReadSchema: (\S+)", plan)
        assert schemas and all(s == "struct<doc_id:bigint>" for s in schemas), (
            name, schemas
        )


def test_factor_panel_one_fact_shuffle_broadcast_betas(spark):
    """p7: the beta estimators must NOT cost fact shuffles — the
    per-day market and rating-class return frames broadcast back onto
    the persisted daily frame, every aggregate stays a hash aggregate,
    and the physical plan carries at most the daily fact exchange plus
    the two tiny periodic-frame re-keys (monthly rollup + the
    month-partitioned rank window)."""
    plan = _plan(spark, "p7_factor_panel")
    assert "SortAggregate" not in plan  # rating_class recomputed, not MIN'd
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # both return joins broadcast
    assert plan.count("BroadcastHashJoin") == 2
    # the daily frame is persisted and feeds exactly three consumers
    # (market agg, class agg, join-back) — without the cache each
    # would re-run the fact aggregate; a raw Exchange count is not
    # meaningful here because every InMemoryRelation PRINTS its full
    # child plan even though it executes once
    assert plan.count("InMemoryTableScan") == 3


def test_tail_risk_panel_reuses_one_daily_exchange(spark):
    """p8: the tail-risk factors must cost exactly TWO exchanges — the
    daily fact aggregate keyed (l_suppkey, day) and one re-key of the
    tiny daily frame on hash(l_suppkey). The return lag partitions by
    bond; the three month-partitioned windows and the monthly hash
    aggregate all cluster on (l_suppkey, month), which hash(l_suppkey)
    satisfies by the subset rule — Spark must not insert a third
    exchange for them. No joins, no SortAggregate, no UDF."""
    import re

    plan = _plan(spark, "p8_tail_risk_panel")
    assert "SortAggregate" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" not in plan
    parts = set(re.findall(r"hashpartitioning\(([^)]*)\)", plan))
    assert len(parts) == 2, parts  # (l_suppkey, day-expr) + (l_suppkey)


def test_schedule_ytw_one_legs_exchange(spark):
    """w10g: the variable-length call-schedule yield-to-worst must cost
    exactly one exchange — the legs-frame re-group on the bond key.
    The explode inherits the scan partitioning, the solver runs once
    over the legs frame, and the re-group is hash-aggregated (numeric
    min/max, no SortAggregate) with no join back."""
    import re

    plan = _plan(spark, "w10g_yield_to_worst_schedule")
    assert "SortAggregate" not in plan
    assert "Join" not in plan
    parts = set(re.findall(r"hashpartitioning\(([^,]*)", plan))
    assert len(parts) == 1, parts


@pytest.mark.parametrize(
    "name", ["w10e_full_record", "w10j_dated_schedule_record"]
)
def test_full_record_zero_key_exchanges(spark, name):
    """w10e/w10j: the full 9-output analytics record is one scan +
    schedule array algebra + one Arrow solve — no key shuffle, no
    join, no SortAggregate; at most the small-file widening
    round-robin (the contract w10h's docstring cites; pin it on the
    record entries themselves too)."""
    plan = _plan(spark, name)
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan
    assert "Exchange SinglePartition" not in plan
    assert plan.count("Exchange") <= 1
    if "Exchange" in plan:
        assert "RoundRobinPartitioning" in plan
    assert "Join" not in plan
    assert "SortAggregate" not in plan
    assert "ArrowEvalPython" in plan


def test_odd_first_coupon_zero_exchanges(spark):
    """w10h: the odd-first-coupon record is one scan + column algebra +
    one Arrow solve — the physical plan must carry NO key shuffle (no
    hash/range/single-partition exchange), no join, no SortAggregate.
    The ONLY exchange allowed is the small-file round-robin widening
    from ensure_min_parallelism (visible at test scale because the
    orders scan is one split; a no-op on a production-width scan). At
    100 TB this pipelines with whatever partitioning the scan produces
    (same contract as w10e). r10 ADVICE: the old OR-form assertion
    would have let an Exchange SinglePartition/rangepartitioning
    regression pass — pin every flavor explicitly instead."""
    plan = _plan(spark, "w10h_odd_first_coupon")
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan
    assert "Exchange SinglePartition" not in plan
    assert plan.count("Exchange") <= 1  # at most the widening
    if "Exchange" in plan:
        assert "RoundRobinPartitioning" in plan
    assert "Join" not in plan
    assert "SortAggregate" not in plan
    assert "ArrowEvalPython" in plan  # the solver is the only Python


def test_error_checks_one_scan_two_kernels_one_row_combine(spark):
    """r2 (a top-5 cost entry, r11 verdict item 4): the three flag
    stages must share ONE pass over the trades frame — W1 reads the
    events scan plus its broadcast anchor-side scan (the kernel runs on
    the REDUCED anchor frame and joins back, never on the full fact),
    while W2 and W3 consume the persisted predecessor, adding ZERO new
    parquet scans; the only grouped-map kernels are W1's anchor kernel
    and W2; the three 1-row per-stage aggregates combine as broadcast
    1-row cross joins. Counted by DISTINCT node signature because every
    InMemoryRelation re-prints its full child plan (cf. the p7 guard)
    even though each cached subtree executes once."""
    import re

    plan = _plan(spark, "r2_error_checks")
    # scans: exactly two distinct (full events + W1 anchor side), both
    # of the events table — a W2/W3 recounting scan would add a third
    scans = set(re.findall(r"FileScan parquet \[[^\]]*\]", plan))
    assert len(scans) == 2, scans
    locations = re.findall(r"Location: InMemoryFileIndex\(1 paths\)\[[^\]]*", plan)
    assert locations and all("events.parquet" in loc for loc in locations)
    # kernels: exactly two distinct grouped-map UDFs (W1 anchor, W2) —
    # dedup by the kernel expression id
    kernels = set(
        re.findall(r"FlatMapGroupsInPandas \[[^\]]*\], kernel\([^)]*\)#\d+", plan)
    )
    assert len(kernels) == 2, kernels
    # the per-stage 1-row aggregates combine as broadcast cross joins
    assert plan.count("BroadcastNestedLoopJoin BuildRight, Cross") == 2
    # the W1 anchor join-back is the single distinct hash join
    bhj = {
        ln[ln.index("BroadcastHashJoin") :]
        for ln in plan.splitlines()
        if "BroadcastHashJoin" in ln
    }
    assert len(bhj) == 1, bhj
    # the diamond persists really are reused (cached consumers present)
    assert "InMemoryTableScan" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # r17: W1's keep-first dedup now mins a fixed-width decimal(38,0)
    # pack of the order tuple (r16 accepted a min(struct) SortAggregate
    # pair; the pack upgrades it to HashAggregate) — NO demotion of any
    # kind may remain.
    assert "SortAggregate" not in plan


def test_alive_range_joins_broadcast_months(spark):
    """The zero-month-aware 'alive bonds per month' frames (a13b and
    the r9/r10 report entries) range-join per-bond lifespans against
    the distinct-months frame: the MONTHS side (dozens of rows) must be
    the broadcast side of a BroadcastNestedLoopJoin — broadcasting the
    bonds side would OOM at the 100 TB posture (r13 ADVICE item 5)."""
    # a13b has no equi key → BroadcastNestedLoopJoin; r9/r10 carry the
    # rating class as an equi key → BroadcastHashJoin with the range as
    # the residual condition (strictly better)
    for name, kind in (
        ("a13b_trade_counts_by_month", "BroadcastNestedLoopJoin"),
        ("r9_zero_trade_bonds", "BroadcastHashJoin"),
        ("r10_trading_intensity", "BroadcastHashJoin"),
    ):
        plan = _plan(spark, name)
        assert kind in plan, (name, plan[:2000])
        assert "CartesianProduct" not in plan, name


def test_availability_aggregates_stay_hash_based(spark):
    """r3 (r16): min/max of the availability date run over to_date(d),
    not the ISO string — a var-width min/max buffer would demote the
    whole two-countDistinct expand chain to SortAggregate and drag two
    full-panel Sorts in front of it (the before-plan carried 8
    SortAggregate nodes; plans/r16/r3_availability_by_rating_*.txt)."""
    plan = _plan(spark, "r3_availability_by_rating")
    assert "SortAggregate" not in plan
    assert "HashAggregate" in plan


def test_w1_anchor_dedup_has_no_window(spark):
    """W1 (r16): the keep-first dedup is a min-of-order-key aggregate
    with map-side duplicate collapse, and the dead per-(id,date) median
    fallback window is deleted — the plan must carry NO Window node at
    all (the before-plan had two: row_number dedup + median fallback,
    each with its own full-fact Exchange;
    plans/r16/w1_decimal_shift_*.txt). r17: the order key is a
    fixed-width decimal(38,0) pack, so the dedup runs as HashAggregate
    — the min(struct) SortAggregate pair r16 accepted is gone
    (plans/r17/w1_decimal_shift_*.txt)."""
    plan = _plan(spark, "w1_decimal_shift")
    assert "Window" not in plan
    assert "SortAggregate" not in plan
    assert "HashAggregate" in plan


def test_stage1_ratings_fused_into_panel(spark):
    """r17: the step6 ratings attach rides the panel aggregate + a
    running last-non-null — the plan must carry NO Union (the old
    as-of union shape) and exactly TWO distinct events scans (the full
    panel scan + the fisd user_id projection; the old shape had a
    third, the rat frame's own purchase scan). Counted by DISTINCT
    scan signature because InMemoryRelation re-prints its child plan
    (cf. the r2 guard); plans/r17/p2_stage1_full_{before,after}.txt."""
    import re

    plan = _plan(spark, "p2_stage1_full")
    assert "Union" not in plan
    scans = set(re.findall(r"FileScan parquet \[[^\]]*\]", plan))
    assert len(scans) == 2, scans
    locations = re.findall(r"Location: InMemoryFileIndex\(1 paths\)\[[^\]]*", plan)
    assert locations and all("events.parquet" in loc for loc in locations)
