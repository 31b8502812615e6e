"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Engine-portable by construction: every hash is md5 (identical across
Spark/DuckDB/anything), and MinHash "permutations" are lexicographic
minima of seeded md5 *strings* — uniform, deterministic, and free of
hex→int conversion differences between engines.

Scale design:
- shingling explodes each doc into (doc_id, gram) rows — embarrassingly
  parallel, no shuffle;
- MinHash signatures are one hash-aggregate over (doc_id [, seed]);
- LSH banding turns all-pairs comparison into an equi-join on
  (band_idx, band_hash) — the only shuffle, keyed so that only
  colliding docs meet. Never do a full cross join at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from trace_data_pipeline_spark.datapipe.text import tokens
from trace_data_pipeline_spark.operators.caching import (
    persistent_rdd_ids as _persistent_rdd_ids,
    tracked_persist,
    unpersist_rdd_ids as _unpersist_rdd_ids,
)


def exact_dedup_clusters(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: hash-groupBy on md5(text); keeper = min id per
    cluster. One shuffle on the 128-bit digest — uniform keys, no skew."""
    return docs.groupBy(F.md5(F.col(text_col)).alias("text_hash")).agg(
        F.min(F.col(id_col)).alias("keep_id"),
        F.count(F.lit(1)).alias("cluster_size"),
    )


def word_ngrams(toks: Column, n: int) -> Column:
    """Word n-gram shingles as space-joined strings (empty array when
    the doc has fewer than n tokens)."""
    count = F.size(toks) - F.lit(n - 1)
    # guard: Spark sequence(1, 0) would generate a DESCENDING sequence
    idx = F.when(count >= 1, F.sequence(F.lit(1), count)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))


def doc_shingles(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(doc_id, gram) distinct shingle rows."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.array_distinct(word_ngrams(tokens(F.col(text_col)), n))).alias(
                "gram"
            ),
        )
    )


def doc_gram_sets(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(doc_id, grams, n_grams) with the distinct shingles kept as one
    ARRAY per doc — a single shuffle-free projection. Docs with fewer
    than n tokens (empty gram set) are dropped, matching the exploded
    form where they simply produce no rows.

    This is the scale-friendly carrier for the minhash family: keeping
    the set per-doc lets signatures and band hashes be computed as pure
    column algebra (array_min over transform), so the only shuffles
    left in LSH dedup are the band-bucket join itself and the candidate
    verification joins."""
    # Drop short docs via the CHEAP precondition (token count >= n ⟺
    # the gram array is non-empty), NOT via size(grams) >= 1: Catalyst
    # pushes filters below the widening round-robin exchange, and a
    # filter that embeds the whole shingle expression would run the
    # tokenize+ngram+distinct work single-threaded in the narrow scan
    # stage (and again above the exchange for the projection) — the
    # measured cost was ~10 s of the d-family's wall-clock at sf0.1.
    # The token-count filter pushes down at split() cost only, while
    # the expensive gram projection stays above the exchange, spread
    # over all cores.
    sets = docs.filter(F.size(tokens(F.col(text_col))) >= n).select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(word_ngrams(tokens(F.col(text_col)), n)).alias("grams"),
    )
    return sets.withColumn("n_grams", F.size("grams"))


def _sig_cols(grams: Column, num_hashes: int) -> list[Column]:
    """MinHash signature columns from a gram ARRAY: for seed s,
    sig_s = min(md5(s|gram)) — identical values to the exploded
    groupBy-min formulation, with zero shuffle."""
    return [
        F.array_min(
            F.transform(grams, lambda g: F.md5(F.concat_ws("|", F.lit(s), g)))
        ).alias(f"sig_{s}")
        for s in range(num_hashes)
    ]


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """All-pairs n-gram Jaccard via a gram-keyed self-join (inverted
    index): pairs only meet on shared shingles, so cost is Σ|posting
    list|² per gram, not |docs|². Returns (a, b, jaccard) with a < b.

    ``max_doc_freq`` is the hot-gram guard for corpus scale: a single
    boilerplate shingle shared by F docs contributes F² pair rows, so
    one hot gram (a license header, a template footer) turns the index
    quadratic. Grams whose posting list exceeds the cap are dropped
    from INTERSECTION COUNTING ONLY — set sizes keep every gram, so a
    capped pair's Jaccard is an under-estimate (recall trade-off:
    near-dup pairs whose overlap is mostly boilerplate may fall below
    the threshold; pairs sharing distinctive content are unaffected).
    The cap bounds pair generation at Σ min(|posting|, L)² — linear in
    corpus size for fixed L. None disables the guard (exact semantics).

    Physical shape: with the cap on, the index is POSTING LISTS. Hot
    grams are identified FIRST by a fixed-buffer count aggregate and
    removed via a broadcast anti-join, so no aggregation buffer ever
    holds more than L doc ids; the survivors' posting lists are then
    collected (provably ≤ L elements) and co-occurring pairs explode
    from each list in place — no gram-keyed join at all, then one
    (a, b) count aggregate. With the cap off, posting lists are
    unbounded (one hot gram = one giant array = executor OOM), so the
    uncapped path keeps the classic gram-keyed self-join, which
    degrades to shuffle skew rather than memory failure."""
    # persist: the gram-set projection feeds the probe side(s) AND the
    # size lookup — without it Spark re-tokenizes the corpus per use.
    # Sizes come straight from the array (no groupBy shuffle).
    sets = tracked_persist(doc_gram_sets(docs, text_col, id_col, n))
    sizes = sets.select("doc_id", "n_grams")
    grams = sets.select("doc_id", F.explode("grams").alias("gram"))
    if max_doc_freq is not None:
        # pass 1 — doc-freq COUNT (fixed-width buffers, skew-safe via
        # map-side partial agg) → tiny hot-gram set → broadcast
        # anti-join. Filtering BEFORE collect_list matters: collecting
        # first would materialize the full unbounded posting array for
        # a hot gram in the aggregation buffer — the very OOM mode the
        # cap exists to prevent
        hot = (
            grams.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > max_doc_freq)
            .select("gram")
        )
        capped = grams.join(F.broadcast(hot), "gram", "left_anti")
        # pass 2 — posting lists, now provably bounded by the cap
        kept = (
            capped.groupBy("gram")
            .agg(F.array_sort(F.collect_list("doc_id")).alias("ds"))
            .filter(F.size("ds") >= 2)
        )
        # all (a < b) pairs of each sorted posting list, generated
        # in-place by a two-level transform — no self-join
        pair_structs = F.flatten(
            F.transform(
                F.col("ds"),
                lambda x, i: F.transform(
                    F.slice(
                        F.col("ds"), i + 2, F.size("ds") - i - 1
                    ),
                    lambda y: F.struct(x.alias("a"), y.alias("b")),
                ),
            )
        )
        inter = (
            kept.select(F.explode(pair_structs).alias("__p"))
            .select("__p.a", "__p.b")
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    else:
        g1 = grams.select(F.col("doc_id").alias("a"), "gram")
        g2 = grams.select(F.col("doc_id").alias("b"), "gram")
        inter = (
            g1.join(g2, "gram")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("n_grams").alias("nb"))
    jac = (
        inter.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_inter")),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold).select("a", "b", "jaccard")


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """MinHash signature per doc: for seed s, sig_s = min(md5(s|gram)) as
    a hex string (lexicographic min of a uniform hash ≡ a permutation
    minimum). Output: (doc_id, sig_0..sig_{k-1}).

    Computed as array_min over the per-doc gram set — one shuffle-free
    projection (the earlier explode + k-column hash aggregate paid a
    full shuffle for the same values)."""
    sets = doc_gram_sets(docs, text_col, id_col, n)
    return sets.select("doc_id", *_sig_cols(F.col("grams"), num_hashes))


def lsh_bands(sigs: DataFrame, num_hashes: int = 16, bands: int = 4) -> DataFrame:
    """Band the signature: band hash = md5 over its rows' concatenation.
    (doc_id, band_idx, band_hash). One explode projection — a per-band
    union would re-scan the signature frame `bands` times."""
    rows_per_band = num_hashes // bands
    entries = []
    for b in range(bands):
        cols = [F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)]
        entries.append(
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(F.concat_ws("|", *cols)).alias("band_hash"),
            )
        )
    return sigs.select(
        "doc_id", F.explode(F.array(*entries)).alias("__e")
    ).select("doc_id", "__e.band_idx", "__e.band_hash")


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    verify_threshold: float = 0.4,
) -> DataFrame:
    """MinHash+LSH near-dup detection: band-collision candidates, then
    exact Jaccard verification of ONLY the candidates.

    Scale shape: the gram-set projection is computed once and persisted;
    signatures and band hashes are shuffle-free column algebra over it.
    Only two joins shuffle: the band-bucket self-join (keyed so only
    colliding docs meet) and the candidate→gram-set lookups, where the
    candidate side is collision-sized — AQE broadcasts it at runtime, so
    the corpus-sized set frame never reshuffles. Verification is
    array_intersect on the two gram sets — identical counts to the
    inverted-index join, without its four extra shuffles; the arrays it
    ships are bounded by document length."""
    sets = tracked_persist(doc_gram_sets(docs, text_col, id_col, n))
    sigs = sets.select("doc_id", *_sig_cols(F.col("grams"), num_hashes))
    # persist the banded frame (4 small rows/doc): the candidate
    # SELF-join consumes it twice, and without the cache each side
    # re-runs the k×|grams| md5 signature fold from the gram sets
    banded = tracked_persist(lsh_bands(sigs, num_hashes, bands))
    b1 = banded.select(F.col("doc_id").alias("a"), "band_idx", "band_hash")
    b2 = banded.select(F.col("doc_id").alias("b"), "band_idx", "band_hash")
    candidates = (
        b1.join(b2, ["band_idx", "band_hash"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates()
    )
    sa = sets.select(
        F.col("doc_id").alias("a"),
        F.col("grams").alias("__ga"),
        F.col("n_grams").alias("na"),
    )
    sb = sets.select(
        F.col("doc_id").alias("b"),
        F.col("grams").alias("__gb"),
        F.col("n_grams").alias("nb"),
    )
    jac = (
        candidates.join(sa, "a")
        .join(sb, "b")
        .withColumn("n_inter", F.size(F.array_intersect("__ga", "__gb")))
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_inter")),
        )
    )
    return jac.filter(F.col("jaccard") >= verify_threshold).select("a", "b", "jaccard")


def simhash_bits(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """SimHash: per token, md5 → first bits/4 hex digits → ±1 votes per
    bit position; sign of the weighted sum per position. Output:
    (doc_id, simhash) as a bit string. Frequency-weighted (all tokens,
    not distinct).

    One shuffle-free fold per doc: the votes accumulate in a single
    `bits`-slot int array via aggregate/zip_with (the earlier
    explode + 64-named-sum-column aggregate paid a shuffle and a very
    large generated aggregate class for the same values). md5 runs once
    per token via a transform(array(md5)) let binding."""
    ndigits = bits // 4

    def tok_votes(t: Column) -> Column:
        # ±1 vote per bit position for one token; digits MSB-first
        return F.get(
            F.transform(
                F.array(F.md5(t)),
                lambda h: F.flatten(
                    F.transform(
                        F.sequence(F.lit(1), F.lit(ndigits)),
                        lambda d: F.get(
                            F.transform(
                                F.array(
                                    F.conv(h.substr(d, F.lit(1)), 16, 10).cast(
                                        "int"
                                    )
                                ),
                                lambda v: F.array(
                                    (v / 8).cast("int") % 2 * 2 - 1,
                                    (v / 4).cast("int") % 2 * 2 - 1,
                                    (v / 2).cast("int") % 2 * 2 - 1,
                                    v % 2 * 2 - 1,
                                ),
                            ),
                            0,
                        ),
                    )
                ),
            ),
            0,
        )

    votes = F.aggregate(
        tokens(F.col(text_col)),
        F.array_repeat(F.lit(0), bits),
        lambda acc, t: F.zip_with(acc, tok_votes(t), lambda a, b: a + b),
    )
    simhash = F.concat_ws(
        "",
        F.transform(
            votes, lambda v: F.when(v > 0, F.lit("1")).otherwise(F.lit("0"))
        ),
    )
    # null text produced no exploded rows in the aggregate formulation —
    # keep dropping those docs rather than emitting a null hash.
    # tokens(x) IS NULL ⟺ x IS NULL, so filter on the raw column: it
    # pushes into the parquet scan as an IsNotNull instead of paying a
    # per-row split below the widening exchange
    return docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"), simhash.alias("simhash")
    )



def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src: str = "a",
    dst: str = "b",
    max_iter: int = 8,
) -> DataFrame:
    """Connected components over a near-dup pair graph → one keeper per
    cluster, fully distributed (no driver-side union-find, no collect).

    ALTERNATING LARGE-STAR / SMALL-STAR (the CC-MR algorithm of
    Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14), replacing the r4–r8 min-label-propagation + pointer-jump
    loop (r8 verdict item 3). Each round rewrites the EDGE SET itself:

    - large-star: every node connects its strictly-larger neighbors to
      the minimum of its neighborhood (incl. itself);
    - small-star: every node connects its smaller neighbors (and
      itself) to the smallest of them.

    The fixed point is a star forest — every node points directly at
    its component minimum — so the edges ARE the labels and the
    per-round work is pure edge algebra:

    - the gate aggregate: one PARTIAL-AGGREGATED groupBy over the
      (persisted / checkpointed) edge rows computing per-node (min,
      max) neighbor — map-side combine, skew-safe for any hub degree.
      This single tiny frame serves THREE masters: the convergence
      gate (the state is a star forest ⟺ no node has BOTH a smaller
      neighbor AND ≥2 distinct neighbors ⟺ no row with min < u AND
      max ≠ min — a per-group predicate, no cross-round diff needed),
      the large-star minimum (joined back below), and at the fixed
      point the final labels themselves (label = least(u, min));
    - the rewrite: large-star as a join of the symmetric edge rows
      against that min frame (AQE broadcasts it while it is small and
      falls back to a skew-splittable shuffle join when it is not),
      then small-star FUSED into the same pipeline as a window-min over
      the large-star output (its edges are already max→min oriented),
      lazily localCheckpoint'ed. ONE edge-sized exchange per round —
      the label-propagation loop this replaced paid three (neighbor
      join, min merge, jump join).
    - ONE ACTION per round (r16): the rewrite is never counted on its
      own — the NEXT round's gate aggregate is its first consumer, so
      the gate's count materializes the checkpoint in the same job.
      The old shape paid a second job per round (the rewrite's own
      count) plus a full read-back of the just-cached edge state;
      per-round cost is now one execution of the rewrite pipeline +
      one aggregate, with no extra pass.

    Round count: empirically ceil(log2(D+1)) + 1 rounds for a
    diameter-D path (the adversarial topology: 6-node path→3,
    300→9, 1100→11, 100k-path→17); dense near-dup blobs converge in
    2–3 rounds at any size. Kiveris et al. prove O(log² n) worst-case.
    If the state is still moving after ``max_iter`` rounds the
    function raises rather than silently splitting a component —
    sizing rule with one round of slack:
    ``max_iter ≥ ceil(log2(D + 1)) + 2``. The default 8 covers path
    diameters ≤ ~100 with slack, ~30× beyond real near-dup blob
    diameters; raise it only for chain-like similarity graphs (e.g.
    sliding-window shingle chains), pinned by
    tests/test_caching.py::test_cc_raises_on_path_beyond_jump_reach.

    Scale shape: the iteration runs ONLY over edge rows — the near-dup
    subgraph, collision-sized at any corpus scale — never over the full
    node set; singletons join their self-label back in a single pass at
    the end. The one skew exposure is the small-star window (one
    partition-group per node that is larger than many neighbors); it is
    transient — after one large-star pass big groups hang off component
    MINIMA, which sit on the small (all-larger-neighbors) side of
    small-star — and WindowExec spills rather than OOMs. The large-star
    side, where persistent mega-hubs (cluster centers) live, is the
    partial-agg + join path and has no per-group materialization.

    Resource discipline — this runs inside long-lived sessions:
    - the de-self-looped edge list is persisted once (collision-sized,
      tiny next to the corpus) and unpersisted on exit; without this the
      whole LSH candidate pipeline would re-execute every round;
    - each round's edge state is lazily localCheckpoint'ed to truncate
      lineage. localCheckpoint(eager=False) REGISTERS its RDD in
      getPersistentRDDs at CALL time (not at materialization), so the
      checkpoint's ids are captured by id-diffing immediately around
      the localCheckpoint call itself and carried into the NEXT
      round's free-set (r17, ADVICE: a diff taken at the top of the
      next round starts AFTER registration and misses them — every
      round's edge-sized checkpoint leaked until ContextCleaner GC).
      A state's blocks are then freed one round after its successor
      materializes: the successor's own checkpoint makes it
      self-contained, so the predecessor is provably dead. Each
      round's min frame is unpersisted as soon as the next gate job
      has consumed the rewrite built on it. The round-0 gate diff is
      discarded: that job runs the caller's whole candidate pipeline,
      so its diff would contain caller-owned persists this loop must
      not free. On a production cluster, set a checkpoint dir and use
      reliable `checkpoint()` instead for fault tolerance.

    Returns (id_col, cluster_id) for EVERY node — singletons label
    themselves; cluster_id = min member id, the dedup keeper."""
    sc = nodes.sparkSession.sparkContext
    edge_rows = (
        edges.filter(F.col(src) != F.col(dst))
        .select(F.col(src).alias("x"), F.col(dst).alias("y"))
        .persist()
    )

    def sym(e: DataFrame) -> DataFrame:
        # symmetrize via explode, NOT a self-union: a union's two
        # branches are separate subtrees, so an un-persisted edge
        # pipeline (e.g. the whole LSH candidate computation) would
        # execute twice just to materialize the reversed copy
        return e.select(
            F.explode(
                F.array(
                    F.struct(F.col("x").alias("u"), F.col("y").alias("v")),
                    F.struct(F.col("y").alias("u"), F.col("x").alias("v")),
                )
            ).alias("__e")
        ).select("__e.u", "__e.v")

    state = edge_rows
    # blocks of the state the CURRENT lazy state was built from — dead
    # the moment the next gate job materializes it
    pending_free: set[int] = set()
    # blocks owned by the current round: the current state's checkpoint
    # (bracket-diffed around its localCheckpoint call, see below) + the
    # current mins cache (also handle-freed — re-freeing a gone id is a
    # no-op)
    cur_ids: set[int] = set()
    # checkpoint ids registered by the rewrite's localCheckpoint call,
    # carried into the NEXT round's cur_ids (registration happens at
    # call time, so the next round's before-snapshot already contains
    # them and its gate diff alone would miss them — the r16 leak)
    carried_ckpt: set[int] = set()
    prev_mins = None
    mins = None
    labels = None
    try:
        for rnd in range(max_iter + 1):
            # ONE job per round (r16): the per-node neighbor (min, max)
            # aggregate is also the FIRST consumer of the previous
            # round's lazily-checkpointed state, so counting the gate
            # materializes that checkpoint in the same action — the old
            # separate per-round `nxt.count()` job (and its extra
            # read-back of the cached edge set) is gone. Duplicate edge
            # rows (tolerated across rounds in lieu of a per-round
            # distinct shuffle) cannot fool the gate: min/max ignore
            # multiplicity, and "≥2 distinct neighbors" is exactly
            # max ≠ min.
            before = _persistent_rdd_ids(sc)
            mins = (
                sym(state)
                .groupBy("u")
                .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
                .persist()
            )
            viol = mins.filter(
                (F.col("mn") < F.col("u")) & (F.col("mx") != F.col("mn"))
            ).count()
            if rnd == 0:
                # the first gate job runs the caller's whole candidate
                # pipeline, so it may ALSO materialize caller-owned
                # persists (and edge_rows itself) — none of which this
                # loop owns. Discard the round-0 diff: edge_rows is
                # freed by its handle on exit, and every later round
                # reads only the self-contained checkpointed state, so
                # later diffs contain exactly this loop's blocks.
                cur_ids = set()
            else:
                cur_ids = carried_ckpt | (_persistent_rdd_ids(sc) - before)
            carried_ckpt = set()
            # the state this gate just materialized is self-contained:
            # the previous round's mins (consumed by the join inside
            # it) and the previous state's checkpoint blocks are dead
            if prev_mins is not None:
                prev_mins.unpersist()
                prev_mins = None
            _unpersist_rdd_ids(sc, pending_free)
            pending_free = set()
            if viol == 0:
                # star forest (or empty): edges are the labels. Leaf →
                # its center (mn < u); center/isolated-min → itself.
                # Eager tiny checkpoint so the returned frame survives
                # the unpersists below without re-running the upstream
                # candidate pipeline.
                labels = mins.select(
                    "u", F.least(F.col("u"), F.col("mn")).alias("label")
                ).localCheckpoint(eager=True)
                break
            if rnd == max_iter:
                # transform budget spent and still moving — fall
                # through to the loud raise without a wasted round
                break
            # large-star (join back the per-node min, connect larger
            # neighbors to least(mn, u)) fused with small-star
            # (window-min over the max→min-oriented large-star output)
            # in one pipeline, one edge exchange — materialized lazily
            # by the NEXT round's gate job.
            large = (
                sym(state)
                .join(mins.select("u", "mn"), "u")
                .filter(F.col("v") > F.col("u"))
                .select(
                    F.col("v").alias("p"),
                    F.least(F.col("mn"), F.col("u")).alias("q"),
                )
            )
            w = Window.partitionBy("p")
            nxt = large.withColumn("m2", F.min("q").over(w)).select(
                F.when(F.col("q") == F.col("m2"), F.col("p"))
                .otherwise(F.col("q"))
                .alias("x"),
                F.col("m2").alias("y"),
            )
            # bracket the registration: localCheckpoint(eager=False)
            # registers its RDD NOW, so this diff — not the next gate's
            # — owns the checkpoint ids
            pre_ckpt = _persistent_rdd_ids(sc)
            nxt = nxt.localCheckpoint(eager=False)
            carried_ckpt = _persistent_rdd_ids(sc) - pre_ckpt
            prev_mins, mins = mins, None
            pending_free, cur_ids = cur_ids, set()
            state = nxt
        if labels is None:
            raise ValueError(
                f"connected_components did not converge in {max_iter} "
                "rounds — component diameter exceeds the alternating-"
                "star reach; raise max_iter"
            )
        # singletons label themselves; incident nodes take their
        # converged component label. The label side is collision-sized —
        # AQE broadcasts it at runtime, so the corpus never reshuffles.
        return nodes.select(F.col(id_col)).join(
            labels.select(
                F.col("u").alias(id_col), F.col("label").alias("cluster_id")
            ),
            id_col,
            "left",
        ).select(
            F.col(id_col),
            F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("cluster_id"),
        )
    finally:
        _unpersist_rdd_ids(sc, pending_free | cur_ids | carried_ckpt)
        if mins is not None:
            mins.unpersist()
        if prev_mins is not None:
            prev_mins.unpersist()
        edge_rows.unpersist()


def incremental_dedup(
    docs: DataFrame,
    batch_pred,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    verify_threshold: float = 0.4,
) -> DataFrame:
    """Incremental-ingest dedup: decide keep/drop for an incoming BATCH
    against the standing corpus (the steady-state shape of a production
    pipeline — the corpus was deduped long ago; re-clustering it per
    ingest would be quadratic nonsense). Two tests per batch doc:
    exact (content digest seen in the corpus) and near (MinHash band
    collision with a corpus doc whose verified Jaccard ≥ threshold).

    Scale shape: the batch is small next to the corpus, so the batch
    side BROADCASTS into both probes — the corpus is scanned once for
    digests and once for band hashes, reshuffled on NEITHER; the
    band probe is strictly batch×corpus (no corpus self-join anywhere),
    and candidate verification joins the collision-sized pair set back
    to the cached gram sets. Returns one row per batch doc:
    (doc_id, exact_dup, near_dup, keep)."""
    # a NULL predicate row would otherwise fall out of BOTH branches
    # (filter(p) and filter(~p) each drop nulls) — neither screened nor
    # corpus, no output row. Coalesce pins null → corpus side.
    batch_pred = F.coalesce(batch_pred, F.lit(False))
    batch = docs.filter(batch_pred)
    corpus = docs.filter(~batch_pred)

    bh = batch.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("__h"))
    ch = corpus.select(F.md5(F.col(text_col)).alias("__h"))
    exact_ids = ch.join(F.broadcast(bh), "__h").select("doc_id").distinct()

    sets = tracked_persist(doc_gram_sets(docs, text_col, id_col, n))
    sigs = sets.select("doc_id", *_sig_cols(F.col("grams"), num_hashes))
    # persist: the batch and corpus band splits BOTH consume the banded
    # frame — without the cache the k×|grams| signature fold over the
    # whole corpus executes twice (the minhash_lsh_pairs lesson)
    banded = tracked_persist(lsh_bands(sigs, num_hashes, bands))
    bids = batch.select(F.col(id_col).alias("doc_id"))
    band_b = banded.join(F.broadcast(bids), "doc_id").select(
        F.col("doc_id").alias("bd"), "band_idx", "band_hash"
    )
    band_c = banded.join(
        F.broadcast(bids.withColumn("__b", F.lit(1))), "doc_id", "left"
    ).filter(F.col("__b").isNull()).select(
        F.col("doc_id").alias("cd"), "band_idx", "band_hash"
    )
    cand = (
        band_c.join(F.broadcast(band_b), ["band_idx", "band_hash"])
        .select("bd", "cd")
        .dropDuplicates()
    )
    sa = sets.select(
        F.col("doc_id").alias("bd"),
        F.col("grams").alias("__ga"),
        F.col("n_grams").alias("na"),
    )
    sb = sets.select(
        F.col("doc_id").alias("cd"),
        F.col("grams").alias("__gb"),
        F.col("n_grams").alias("nb"),
    )
    near_ids = (
        cand.join(sa, "bd")
        .join(sb, "cd")
        .withColumn("__ni", F.size(F.array_intersect("__ga", "__gb")))
        .withColumn(
            "__j",
            F.col("__ni").cast("double")
            / (F.col("na") + F.col("nb") - F.col("__ni")),
        )
        .filter(F.col("__j") >= verify_threshold)
        .select(F.col("bd").alias("doc_id"))
        .distinct()
    )

    out = (
        batch.select(F.col(id_col).alias("doc_id"))
        .join(exact_ids.withColumn("__e", F.lit(1)), "doc_id", "left")
        .join(near_ids.withColumn("__n", F.lit(1)), "doc_id", "left")
    )
    e = F.coalesce(F.col("__e"), F.lit(0))
    nn = F.coalesce(F.col("__n"), F.lit(0))
    return out.select(
        "doc_id",
        e.alias("exact_dup"),
        nn.alias("near_dup"),
        (1 - F.greatest(e, nn)).alias("keep"),
    )
