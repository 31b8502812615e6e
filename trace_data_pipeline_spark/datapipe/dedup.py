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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from trace_data_pipeline_spark.datapipe.text import tokens
from trace_data_pipeline_spark.operators.caching import tracked_persist


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


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """All-pairs n-gram Jaccard via a gram-keyed self-join (inverted
    index): pairs only meet on shared shingles, so cost is Σ|posting
    list|² per gram, not |docs|². Returns (a, b, jaccard) with a < b."""
    # persist: the shingle index feeds both probe sides AND the size
    # aggregate — without it Spark re-tokenizes the corpus three times
    grams = tracked_persist(doc_shingles(docs, text_col, id_col, n))
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
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
    minimum). Output: (doc_id, sig_0..sig_{k-1})."""
    grams = doc_shingles(docs, text_col, id_col, n)
    # all k hashes as COLUMNS of one projection + a single hash
    # aggregate — k× less shuffle volume than exploding a seed column,
    # and map-side partial mins do most of the work
    hashed = grams.select(
        "doc_id",
        *[
            F.md5(F.concat_ws("|", F.lit(s), F.col("gram"))).alias(f"h{s}")
            for s in range(num_hashes)
        ],
    )
    return hashed.groupBy("doc_id").agg(
        *[F.min(f"h{s}").alias(f"sig_{s}") for s in range(num_hashes)]
    )


def lsh_bands(sigs: DataFrame, num_hashes: int = 16, bands: int = 4) -> DataFrame:
    """Band the signature: band hash = md5 over its rows' concatenation.
    (doc_id, band_idx, band_hash)."""
    rows_per_band = num_hashes // bands
    parts = []
    for b in range(bands):
        cols = [F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)]
        parts.append(
            sigs.select(
                "doc_id",
                F.lit(b).alias("band_idx"),
                F.md5(F.concat_ws("|", *cols)).alias("band_hash"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


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
    exact Jaccard verification of ONLY the candidates. The verify join
    re-uses the shingle inverted index restricted to candidate pairs."""
    sigs = minhash_signatures(docs, text_col, id_col, n, num_hashes)
    banded = tracked_persist(lsh_bands(sigs, num_hashes, bands))
    b1 = banded.select(F.col("doc_id").alias("a"), "band_idx", "band_hash")
    b2 = banded.select(F.col("doc_id").alias("b"), "band_idx", "band_hash")
    candidates = (
        b1.join(b2, ["band_idx", "band_hash"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates()
    )
    candidates = tracked_persist(candidates)
    grams = tracked_persist(doc_shingles(docs, text_col, id_col, n))
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    # restrict the inverted index to candidate docs, then semi-filter the
    # gram join down to candidate PAIRS — verification cost scales with
    # the candidates, not the corpus
    ga = grams.select(F.col("doc_id").alias("a"), "gram").join(
        candidates.select("a").distinct(), "a", "left_semi"
    )
    gb = grams.select(F.col("doc_id").alias("b"), "gram").join(
        candidates.select("b").distinct(), "b", "left_semi"
    )
    inter = (
        ga.join(gb, "gram")
        .filter(F.col("a") < F.col("b"))
        .join(candidates, ["a", "b"], "left_semi")
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
    return jac.filter(F.col("jaccard") >= verify_threshold).select("a", "b", "jaccard")


def simhash_bits(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """SimHash: per token, md5 → first bits/4 hex digits → ±1 votes per
    bit position; sign of the weighted sum per position. Output:
    (doc_id, simhash) as a bit string. Frequency-weighted (tokens
    exploded, not distinct), one aggregate."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).withColumn("h", F.md5(F.col("tok")))
    digit_val = [
        (F.conv(F.substring(F.col("h"), d + 1, 1), 16, 10).cast("int"))
        for d in range(bits // 4)
    ]
    vote_exprs = []
    for b in range(bits):
        d, shift = divmod(b, 4)
        bit = F.shiftright(digit_val[d], 3 - shift).bitwiseAND(F.lit(1))
        vote_exprs.append(F.sum(bit * 2 - 1).alias(f"v{b}"))
    votes = toks.groupBy("doc_id").agg(*vote_exprs)
    bit_chars = [
        F.when(F.col(f"v{b}") > 0, F.lit("1")).otherwise(F.lit("0")) for b in range(bits)
    ]
    return votes.select("doc_id", F.concat(*bit_chars).alias("simhash"))
