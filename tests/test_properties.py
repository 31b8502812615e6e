"""Property-based invariants (SURVEY §5 test plan): hypothesis drives
random price series through the error-correction and aggregation
operators and asserts the contracts that must hold for ANY input."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from trace_data_pipeline_spark.operators.decimal_shift import decimal_shift_corrector

prices = st.lists(
    st.floats(min_value=0.5, max_value=2000.0, allow_nan=False, width=32),
    min_size=3,
    max_size=25,
)

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="module")
def sp(spark):
    return spark


@given(series=prices)
@SLOW
def test_decimal_shift_invariants(sp, series):
    """Row count preserved; factors from the candidate set ∪ {1};
    suggested price is exactly price × factor; unflagged rows pass
    through untouched."""
    pdf = pd.DataFrame(
        {
            "cusip_id": "X",
            "trd_exctn_dt": "2024-01-15",
            "seq": range(len(series)),
            "rptd_pr": [round(p, 2) for p in series],
        }
    )
    out = decimal_shift_corrector(
        sp.createDataFrame(pdf), order_cols=("seq",)
    ).orderBy("seq")
    rows = out.collect()
    assert len(rows) == len(series)
    for r in rows:
        assert r["dec_shift_factor"] in (0.1, 0.01, 10.0, 100.0, 1.0)
        assert r["suggested_price"] == pytest.approx(
            r["rptd_pr"] * r["dec_shift_factor"]
        )
        if r["dec_shift_flag"] == 0:
            assert r["dec_shift_factor"] == 1.0
            assert r["suggested_price"] == r["rptd_pr"]
        else:
            # corrected prices obey the plausibility gate
            assert 5.0 <= r["suggested_price"] <= 300.0


@pytest.mark.slow  # r17 (verdict item 1): ~11 s of randomized Spark
# jobs; W1 clean mode stays default-covered by the golden vectors and
# the clean-chunk reference differential
@given(series=prices)
@SLOW
def test_clean_mode_only_rescales(sp, series):
    """mode='clean' changes exactly the flagged rows and the multiset of
    unflagged prices is preserved."""
    pdf = pd.DataFrame(
        {
            "cusip_id": "X",
            "trd_exctn_dt": "2024-01-15",
            "seq": range(len(series)),
            "rptd_pr": [round(p, 2) for p in series],
        }
    )
    df = sp.createDataFrame(pdf)
    flagged = decimal_shift_corrector(df, order_cols=("seq",)).orderBy("seq").collect()
    cleaned = (
        decimal_shift_corrector(df, order_cols=("seq",), mode="clean")
        .orderBy("seq")
        .collect()
    )
    for f, c in zip(flagged, cleaned):
        if f["dec_shift_flag"] == 1:
            assert c["rptd_pr"] == pytest.approx(f["suggested_price"])
        else:
            assert c["rptd_pr"] == f["rptd_pr"]

texts = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=127),
    min_size=20,
    max_size=120,
)


keys = st.tuples(
    # okey: FULL int64 range — the first packed component is unbudgeted
    # (it's the one that grows with data scale; the retired packed-LONG
    # key overflowed past okey ~9.2e9, the decimal(38,0) key cannot).
    # line/cents: their documented digit budgets' full domains.
    st.integers(min_value=0, max_value=2**63 - 1),
    st.integers(min_value=0, max_value=9_999),
    st.integers(min_value=0, max_value=10**12 - 1),
)


@given(rows=st.lists(keys, min_size=2, max_size=12, unique=True))
@SLOW
def test_a1_packed_tiebreak(sp, rows):
    """The a1 packed-decimal tiebreak (okey, line, cents) must order
    lexicographically across the whole documented domain — okey over the
    full int64 range, line < 1e4, cents < 1e12 — while keeping the
    aggregate a HashAggregate (pinned in test_plan_shapes)."""
    import pyspark.sql.functions as F

    from trace_data_pipeline_spark.functions.ordered import (
        first_by,
        last_by,
        packed_order_key,
    )

    df = sp.createDataFrame(rows, "okey long, line long, cents long")
    key = packed_order_key(
        (F.col("okey"), 19), (F.col("line"), 4), (F.col("cents"), 12)
    )
    got = df.agg(
        first_by(F.col("okey"), key).alias("first_okey"),
        first_by(F.col("cents"), key).alias("first_cents"),
        last_by(F.col("okey"), key).alias("last_okey"),
        last_by(F.col("cents"), key).alias("last_cents"),
    ).collect()[0]
    lo, hi = min(rows), max(rows)
    assert (got["first_okey"], got["first_cents"]) == (lo[0], lo[2])
    assert (got["last_okey"], got["last_cents"]) == (hi[0], hi[2])


graph_edges = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=18),
        st.integers(min_value=1, max_value=18),
    ).filter(lambda e: e[0] != e[1]),
    min_size=0,
    max_size=30,
)


@given(edges=graph_edges)
@SLOW
def test_connected_components_matches_union_find(sp, edges):
    """Distributed min-label propagation == a driver-side union-find on
    ANY random graph (chains, stars, cliques, self-contradictory
    duplicates, isolated nodes) — every node labeled with its
    component's minimum id."""
    from trace_data_pipeline_spark.datapipe.dedup import connected_components

    n_nodes = 18
    parent = list(range(n_nodes + 1))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    want = {}
    for u in range(1, n_nodes + 1):
        root = find(u)
        want.setdefault(root, []).append(u)
    expect = {
        u: min(members) for members in want.values() for u in members
    }

    nodes_df = sp.createDataFrame(
        [(i,) for i in range(1, n_nodes + 1)], ["doc_id"]
    )
    edges_df = (
        sp.createDataFrame(edges, ["a", "b"])
        if edges
        else sp.createDataFrame([], "a long, b long")
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(nodes_df, edges_df, max_iter=8).collect()
    }
    assert got == expect


@given(shared=texts, pre_a=texts, pre_b=texts)
@SLOW
def test_winnowing_shared_substring_guarantee(sp, shared, pre_a, pre_b):
    """The winnowing contract (k=8, w=4): two documents sharing a
    substring of length >= k + w - 1 = 11 chars share at least one
    selected fingerprint hash (Schleimer et al. theorem 1). Built by
    planting `shared` into both docs after distinct prefixes."""
    from trace_data_pipeline_spark.datapipe.text import winnow_fingerprints

    docs = sp.createDataFrame(
        [(1, pre_a + " " + shared), (2, pre_b + " " + shared)],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: set(r.fingerprints)
        for r in winnow_fingerprints(docs, "text", "doc_id", k=8, w=4, as_sets=True)
        .collect()
    }
    if len(shared) < 11 or 1 not in out or 2 not in out:
        return  # too short to fall under the guarantee
    assert out[1] & out[2], "shared >=11-char substring yielded no common fingerprint"


def test_pq_encode_rejects_indivisible_dim(sp):
    """dim % n_subspaces != 0 must be an error, not silent tail-drop."""
    from trace_data_pipeline_spark.datapipe.similarity import pq_encode

    vecs = sp.createDataFrame(
        [(1, [0.0] * 10)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="not divisible"):
        pq_encode(vecs, vecs, n_subspaces=4, dim=10)


def test_pq_adc_equals_exact_distance_to_reconstruction(sp):
    """ADC's defining identity (Jégou et al. §IV): with full-vector
    queries, the looked-up distance must EQUAL the exact L2² between
    the query and the PQ *reconstruction* (codebook centroid per
    subspace) of each database vector — independently of the DuckDB
    oracle replay, which shares the engine's arithmetic."""
    from trace_data_pipeline_spark.datapipe.similarity import (
        pq_adc_topk,
        pq_encode,
    )

    dim, m = 8, 4
    rows = [
        (i, [float(((i * 7 + j * 3) % 11) - 5) for j in range(dim)])
        for i in range(12)
    ]
    vecs = sp.createDataFrame(rows, "vec_id long, embedding array<float>")
    codebook = vecs.filter("vec_id % 4 = 0")  # 3 centroids
    queries = vecs.filter("vec_id % 6 = 0")  # 2 queries
    codes = pq_encode(vecs, codebook, n_subspaces=m, dim=dim)
    got = {
        (r.query_id, r.neighbor_id): r.adc_dist
        for r in pq_adc_topk(
            queries, codes, codebook, k=11, n_subspaces=m, dim=dim
        ).collect()
    }
    cb = {r.vec_id: r.embedding for r in codebook.collect()}
    code_rows = {r.vec_id: [r.code_0, r.code_1, r.code_2, r.code_3]
                 for r in codes.collect()}
    full = {r[0]: r[1] for r in rows}
    sub = dim // m
    for (qid, nid), adc in got.items():
        q = full[qid]
        recon = []
        for mm, cid in enumerate(code_rows[nid]):
            recon.extend(cb[cid][mm * sub:(mm + 1) * sub])
        exact = sum((a - b) ** 2 for a, b in zip(q, recon))
        assert abs(adc - exact) < 1e-6, (qid, nid, adc, exact)


def test_packed_order_key_budget_overflow_raises(sp):
    """Later components' digit budgets summing past 19 could overflow
    decimal(38,0) into a silent null key — must raise at build time."""
    import pyspark.sql.functions as F

    from trace_data_pipeline_spark.functions.ordered import packed_order_key

    with pytest.raises(ValueError, match="> 19"):
        packed_order_key((F.col("a"), 19), (F.col("b"), 10), (F.col("c"), 10))


def test_single_column_first_by_uses_key_directly(sp):
    """A single order column must be used as the min_by key unchanged
    (scalar keys keep the aggregate hash-based; wrapping it in a struct
    would demote to SortAggregate)."""
    import pyspark.sql.functions as F

    from trace_data_pipeline_spark.functions.ordered import first_by, last_by

    df = sp.createDataFrame([(1, 10.0), (2, 5.0), (3, 7.0)], "k long, v double")
    agg = df.agg(first_by("v", F.col("k")).alias("f"), last_by("v", F.col("k")).alias("l"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "struct" not in plan
    row = agg.collect()[0]
    assert (row["f"], row["l"]) == (10.0, 7.0)


def test_first_by_null_keys_are_invisible(sp):
    """The documented null-key contract: rows with a null scalar
    ordering key are skipped by first_by/last_by (min_by semantics);
    an all-null-key group yields null — never a nondeterministic pick."""
    import pyspark.sql.functions as F

    from trace_data_pipeline_spark.functions.ordered import first_by, last_by

    df = sp.createDataFrame(
        [(1, None, 50.0), (1, 2, 10.0), (1, 1, 20.0), (2, None, 9.0)],
        "g long, k long, v double",
    )
    rows = {
        r.g: (r.f, r.l)
        for r in df.groupBy("g")
        .agg(first_by("v", F.col("k")).alias("f"), last_by("v", F.col("k")).alias("l"))
        .collect()
    }
    assert rows[1] == (20.0, 10.0)  # null-key row 50.0 skipped
    assert rows[2] == (None, None)  # only null keys -> null


def test_first_by_struct_path_null_keys_are_invisible(sp):
    """The multi-column (struct) path obeys the SAME null-key contract
    as the scalar path: a row with ANY null key component is invisible
    to the selection (the struct key is null-gated — a bare struct
    would compare null fields as smallest and keep the row visible,
    sorted first: ADVICE r4)."""
    import pyspark.sql.functions as F

    from trace_data_pipeline_spark.functions.ordered import first_by, last_by

    df = sp.createDataFrame(
        [
            (1, None, 1, 50.0),  # null first component -> invisible
            (1, 2, None, 40.0),  # null second component -> invisible
            (1, 2, 1, 10.0),
            (1, 1, 9, 20.0),
            (2, None, None, 9.0),
        ],
        "g long, k1 long, k2 long, v double",
    )
    rows = {
        r.g: (r.f, r.l)
        for r in df.groupBy("g")
        .agg(
            first_by("v", F.col("k1"), F.col("k2")).alias("f"),
            last_by("v", F.col("k1"), F.col("k2")).alias("l"),
        )
        .collect()
    }
    assert rows[1] == (20.0, 10.0)
    assert rows[2] == (None, None)


def test_packed_price_requires_2dp_domain(sp):
    """_packed_price's domain contract (ADVICE r4): unpacking cents/100
    from the packed key is bit-exact for exactly-2-decimal prices and
    half-up-rounds anything finer — so (a) the roundtrip is exact on
    the 2dp domain, (b) the testdata column the call sites read
    actually IS 2dp, which is what licenses the packed-key shortcut."""
    import pyspark.sql.functions as F

    from trace_data_pipeline_spark.plans.relational import (
        _li_tiebreak,
        _packed_price,
    )

    df = sp.createDataFrame(
        [(1, 1, 901.12), (1, 2, 0.01), (1, 3, 123456789.99)],
        "l_orderkey long, l_linenumber long, l_extendedprice double",
    )
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    out = df.agg(
        _packed_price(F.min(_li_tiebreak(cents))).alias("f"),
        _packed_price(F.max(_li_tiebreak(cents))).alias("l"),
    ).collect()[0]
    assert (out["f"], out["l"]) == (901.12, 123456789.99)

    # the >2dp failure mode is REAL (documents why the contract exists):
    # 1.005 would unpack as 1.0 or 1.01, not the true row value
    bad = sp.createDataFrame(
        [(1, 1, 1.005)], "l_orderkey long, l_linenumber long, l_extendedprice double"
    )
    cents_b = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    got = bad.agg(_packed_price(F.min(_li_tiebreak(cents_b))).alias("f")).collect()[0]["f"]
    assert got != 1.005

    # and the call sites' source column is on the 2dp domain
    import os

    from tests.conftest import TEST_SF_DIR

    li = sp.read.parquet(os.path.join(TEST_SF_DIR, "lineitem.parquet"))
    off = li.filter(
        F.abs(F.col("l_extendedprice") * 100 - F.round(F.col("l_extendedprice") * 100, 0))
        > 1e-9
    ).count()
    assert off == 0


docs_texts = st.lists(
    st.text(alphabet="ab ", min_size=6, max_size=40), min_size=2, max_size=10
)


def test_incremental_dedup_null_pred_rows_are_corpus(sp):
    """A row whose batch predicate evaluates to NULL must land on the
    corpus side (coalesce → False), not vanish from both branches
    (ADVICE r4: filter(p) AND filter(~p) each drop null-pred rows, so
    the row would be neither screened nor screening)."""
    import pyspark.sql.functions as F

    from trace_data_pipeline_spark.datapipe.dedup import incremental_dedup

    df = sp.createDataFrame(
        [(1, "alpha beta gamma delta", None), (2, "alpha beta gamma delta", True)],
        "doc_id long, text string, is_batch boolean",
    )
    out = {r.doc_id: r.exact_dup for r in
           incremental_dedup(df, F.col("is_batch"), n=2).collect()}
    # doc 1 (null pred) acted as corpus: doc 2 screens against it
    assert out == {2: 1}


@pytest.mark.slow  # r17 (verdict item 1): ~16 s of randomized Spark
# jobs; d26/d28 parity plus the null-pred and sink-replay tests keep
# default-lane coverage of the same operator
@given(texts=docs_texts)
@SLOW
def test_incremental_dedup_soundness(sp, texts):
    """Soundness of the batch-vs-corpus screen on random corpora:
    exact_dup=1 ⟺ the batch text literally exists in the corpus;
    near_dup=1 ⟹ some corpus doc verifies at Jaccard ≥ τ (the LSH
    band filter may MISS near-dups — that one-sided contract is the
    probabilistic trade — but must never flag a pair below τ)."""
    from trace_data_pipeline_spark.datapipe.dedup import incremental_dedup

    rows = [(i, t) for i, t in enumerate(texts)]
    df = sp.createDataFrame(rows, "doc_id long, text string")
    import pyspark.sql.functions as F

    out = {
        r.doc_id: (r.exact_dup, r.near_dup)
        for r in incremental_dedup(
            df, F.col("doc_id") % 3 == 0, n=2, verify_threshold=0.5
        ).collect()
    }

    def grams(t, n=2):
        toks = t.split()
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    corpus = {i: t for i, t in rows if i % 3 != 0}
    for bid, text in rows:
        if bid % 3 != 0 or bid not in out:
            continue
        exact, near = out[bid]
        assert exact == (1 if text in corpus.values() else 0), (bid, texts)
        if near:
            g = grams(text)
            assert any(
                g and grams(ct)
                and len(g & grams(ct)) / len(g | grams(ct)) >= 0.5
                for ct in corpus.values()
            ), (bid, texts)


@given(
    bw=st.integers(1, 4),
    bh=st.integers(1, 4),
    crop_x=st.integers(0, 7),
    crop_y=st.integers(0, 7),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=20, deadline=None)
def test_jpeg_constant_block_roundtrip_property(bw, bh, crop_x, crop_y, seed):
    """Property form of the d12c exactness contract: ANY constant-block
    image at ANY geometry (including partial edge blocks) round-trips
    the baseline JPEG pipeline bit-exactly with the all-ones quant
    table."""
    import random

    from trace_data_pipeline_spark.datapipe.jpeg import (
        decode_jpeg,
        encode_jpeg_gray,
    )

    rng = random.Random(seed)
    w, h = bw * 8 - crop_x, bh * 8 - crop_y
    blocks = [[rng.randrange(256) for _ in range(bw)] for _ in range(bh)]
    px = bytes(blocks[y // 8][x // 8] for y in range(h) for x in range(w))
    gw, gh, ch, dec = decode_jpeg(encode_jpeg_gray(w, h, px))
    assert (gw, gh, ch) == (w, h, 1)
    assert bytes(dec) == px


@given(
    rate=st.integers(1, 192_000),
    data=st.lists(
        st.lists(st.integers(-32768, 32767), min_size=1, max_size=200),
        min_size=1,
        max_size=2,
    ),
)
@settings(max_examples=30, deadline=None)
def test_wav_roundtrip_property(rate, data):
    """Any PCM16 sample matrix round-trips the WAV codec exactly
    (channels equalized to the shortest, interleave order preserved)."""
    from trace_data_pipeline_spark.datapipe.wav import decode_wav, encode_wav

    n = min(len(ch) for ch in data)
    data = [ch[:n] for ch in data]
    r, c, got = decode_wav(encode_wav(rate, len(data), data))
    assert (r, c) == (rate, len(data))
    assert got == data


def test_p8_tail_risk_invariants(sp):
    """Structural invariants of the tail-risk panel on real data
    (beyond hash parity — these catch logic inversions a matching
    oracle would faithfully reproduce):

    - ES over the k worst returns can never exceed VaR (the k-th
      worst) — the mean of values each <= var5 is <= var5;
    - max drawdown is <= 0 by construction (price / running max - 1);
    - the zero-return share is a proper fraction;
    - k-th order statistic exists whenever n_obs >= 1: var5 null
      iff n_obs = 0.
    """
    from pyspark.sql import functions as F

    from trace_data_pipeline_spark.plans import get_catalog

    df = (
        get_catalog()["p8_tail_risk_panel"]
        .builder(sp, "/root/testdata/sf0.001")
        .cache()
    )
    assert df.filter(F.col("es5") > F.col("var5") + 1e-9).count() == 0
    assert df.filter(F.col("mdd") > 1e-12).count() == 0
    assert (
        df.filter(
            (F.col("zero_ret_share") < 0) | (F.col("zero_ret_share") > 1)
        ).count()
        == 0
    )
    assert df.filter((F.col("n_obs") >= 1) & F.col("var5").isNull()).count() == 0
    assert df.filter((F.col("n_obs") == 0) & F.col("var5").isNotNull()).count() == 0
    df.unpersist()


def test_modified_following_invariants(sp):
    """MF invariants over the whole w11b grid: every adjusted date is
    a session, stays within the original month, and is the NEAREST
    session in the chosen direction (no same-month session strictly
    between the date and its adjustment)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from trace_data_pipeline_spark.functions.nyse_calendar import (
        nyse_sessions_df,
    )
    from trace_data_pipeline_spark.operators.temporal import (
        modified_following_calendar,
    )

    cal = nyse_sessions_df(sp, dt.date(2029, 6, 1), dt.date(2032, 6, 30))
    # 340*3 days from 2029-06-15 tops out 2032-03-29, inside the
    # calendar span (dates past the spine get a null adjustment by
    # contract)
    grid = sp.range(0, 340).select(
        F.date_add(F.lit("2029-06-15").cast("date"), (F.col("id") * 3).cast("int")).alias("d")
    )
    out = modified_following_calendar(grid, "d", cal).cache()
    sess = {str(r["session_date"]) for r in cal.collect()}
    rows = out.collect()
    assert rows and all(r["adj_dt"] is not None for r in rows)
    for r in rows:
        d, adj = r["d"], r["adj_dt"]
        assert str(adj) in sess
        assert (adj.year, adj.month) == (d.year, d.month)
        lo, hi = min(d, adj), max(d, adj)
        between = [
            s
            for s in sess
            if lo < dt.date.fromisoformat(s) < hi
        ]
        assert not between, (d, adj, between)
    out.unpersist()


stub_bonds = st.tuples(
    st.floats(min_value=0.0, max_value=0.06, allow_nan=False),   # c per period
    st.integers(min_value=1, max_value=30),                      # n flows
    st.sampled_from([1, 2, 4, 12]),                              # m
    st.floats(min_value=0.05, max_value=1.0, allow_nan=False),   # q
    st.floats(min_value=0.05, max_value=1.2, allow_nan=False),   # stub ratio
    st.floats(min_value=0.002, max_value=0.12, allow_nan=False), # y per period
)


@given(bond=stub_bonds)
@SLOW
def test_stub_solver_recovers_any_priced_yield(sp, bond):
    """w10h kernel contract, property form: for ANY odd-first-coupon
    bond (random coupon, schedule length, frequency, fractional offset
    q, short/long stub ratio), pricing the flows at a known per-period
    yield with an independent textbook PV and feeding that dirty price
    to bond_analytics_stub recovers the yield to solver precision, with
    a ~zero pv_residual. Pins that the Newton kernel's basin covers the
    whole synthesis domain, not just the catalog's grid."""
    from pyspark.sql import functions as F

    from trace_data_pipeline_spark.operators.bond_math import (
        bond_analytics_stub,
    )

    c, n, m, q, ratio, y = bond
    cf1 = ratio * (c * 100.0 if c > 0 else 4.0)  # a zero-coupon bond
    # still carries a stub COUPON if the first period accrued one
    v = 1.0 / (1.0 + y)
    dirty = 0.0
    for t in range(1, n + 1):
        coup = cf1 if t == 1 else c * 100.0
        cf = coup + (100.0 if t == n else 0.0)
        dirty += cf * v ** (t - 1 + q)

    df = sp.createDataFrame(
        pd.DataFrame(
            [[dirty, c, n, m, q, cf1]],
            columns=["pd", "c", "n", "m", "q", "cf1"],
        )
    )
    r = (
        df.withColumn(
            "r",
            bond_analytics_stub(
                F.col("pd"), F.col("c"), F.col("n"), F.col("m"),
                F.col("q"), F.col("cf1"),
            ),
        )
        .select("r.*")
        .collect()[0]
    )
    assert r["pv_residual"] == pytest.approx(0.0, abs=1e-7)
    assert r["ytm"] == pytest.approx(y * m, abs=1e-7)
    assert r["mac_dur"] > 0


def test_word_ngrams_short_doc_guard(spark):
    """d34 guard: documents shorter than the n-gram order emit an empty
    gram array (NOT a [1,0]-descending-sequence artifact) and null
    repetition fractions."""
    import pandas as pd
    from pyspark.sql import functions as F

    from trace_data_pipeline_spark.datapipe.text import tokens, word_ngrams

    pdf = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["one", "two words", "a b c d"]})
    sdf = spark.createDataFrame(pdf, schema="doc_id long, text string")
    t = tokens(F.col("text"))
    got = {
        r.doc_id: (r.g2, r.g3)
        for r in sdf.select(
            "doc_id",
            word_ngrams(t, 2).alias("g2"),
            word_ngrams(t, 3).alias("g3"),
        ).collect()
    }
    assert got[1] == ([], [])
    assert got[2] == (["two words"], [])
    assert got[3] == (["a b", "b c", "c d"], ["a b c", "b c d"])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_word_ngrams_property_vs_python(spark, seed):
    """Property check for the zip_with-slice n-gram build: for random
    token arrays (including empties and length-n boundaries) the result
    equals the plain-python sliding join for n in {2, 3, 4}."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from trace_data_pipeline_spark.datapipe.text import word_ngrams

    rng = np.random.default_rng(seed)
    vocab = ["a", "bb", "ccc", "x1", "y2", "zz9"]
    rows = []
    for i in range(60):
        L = int(rng.integers(0, 9))
        rows.append((i, [vocab[int(rng.integers(0, len(vocab)))]
                         for _ in range(L)]))
    pdf = pd.DataFrame(rows, columns=["rid", "toks"])
    sdf = spark.createDataFrame(pdf, schema="rid long, toks array<string>")
    sel = sdf.select(
        "rid",
        *[word_ngrams(F.col("toks"), n).alias(f"g{n}") for n in (2, 3, 4)],
    )
    got = {r["rid"]: r for r in sel.collect()}
    for rid, toks in rows:
        for n in (2, 3, 4):
            want = [
                " ".join(toks[i : i + n])
                for i in range(len(toks) - n + 1)
            ]
            assert got[rid][f"g{n}"] == want, (rid, n, toks)
