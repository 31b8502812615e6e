"""Text-analysis operators for training-data pipelines.

All pure column algebra over Spark's array/lambda functions — JVM-side,
codegen'd, shuffle-free per row. Designed for 100 TB corpora: no
Python UDFs, no collect, no per-row regex beyond what the JVM
vectorizes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small fixed marker lists for the language-ID heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "los", "es"],
    "de": ["der", "die", "und", "das", "ist", "ein", "nicht"],
    "fr": ["le", "la", "de", "et", "les", "des", "est"],
    "zh": ["的", "是", "了", "在", "我", "不", "有"],
}

DEFAULT_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization; trim first so neither engine produces
    leading/trailing empty tokens."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def token_count(toks: Column) -> Column:
    return F.size(toks)


# BPE pre-tokenization shape: letter runs, single digits, single
# punctuation marks — the split byte-pair encoders apply before merges.
# Kept to syntax valid in both Java regex and RE2 so the DuckDB oracle
# runs the identical pattern.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def subword_count(text: Column) -> Column:
    """BPE-ish subword count over raw text (no vocab): a cheap proxy for
    LLM token cost that, unlike whitespace counting, bills punctuation
    and digit runs the way a byte-pair encoder would."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), F.lit(0)))


def winnow_fingerprints(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    as_sets: bool = False,
):
    """Winnowing document fingerprint (Schleimer, Wilkerson, Aiken,
    SIGMOD 2003): md5 every k-char gram, take the minimum hash in each
    sliding window of w grams, distinct the selected mins. Any shared
    substring of length >= k + w - 1 contributes a shared fingerprint —
    the standard rolling-hash near-dup/plagiarism sketch.

    Formulated as posexplode + sliding window-min so each gram is
    hashed exactly ONCE (an array-expression formulation would re-hash
    the gram sequence per window under projection collapse). One
    shuffle on doc_id; per-doc state is one document's gram sequence.
    Docs shorter than k + w - 1 chars yield no fingerprint row.
    Returns (doc_id, n_fp, fp_hash), or (doc_id, fingerprints) with
    as_sets=True (the raw selected-min sets, for pair intersection)."""
    from pyspark.sql import Window

    t = df.select(
        F.col(id_col).alias("doc_id"), F.trim(F.col(text_col)).alias("__t")
    )
    grams = t.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"IF(length(__t) >= {k}, "
                f"transform(sequence(1, length(__t) - {k - 1}), "
                f"i -> md5(substring(__t, i, {k}))), "
                f"array())"
            )
        ).alias("pos", "h"),
    )
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    cnt = Window.partitionBy("doc_id")
    mins = (
        grams.withColumn("n", F.count(F.lit(1)).over(cnt))
        .withColumn("mh", F.min("h").over(win))
        .filter(F.col("pos") <= F.col("n") - w)
    )
    # collect_set dedups inside one partial/final aggregate — a separate
    # distinct would cost a second shuffle on (doc_id, mh)
    fps = F.array_sort(F.collect_set("mh"))
    if as_sets:
        return mins.groupBy("doc_id").agg(fps.alias("fingerprints"))
    return mins.groupBy("doc_id").agg(
        F.size(F.collect_set("mh")).alias("n_fp"),
        F.md5(F.concat_ws("", fps)).alias("fp_hash"),
    )


def stopword_count(toks: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or DEFAULT_STOPWORDS
    return F.size(F.filter(toks, lambda t: t.isin(sw)))


def distinct_ratio(toks: Column) -> Column:
    """Unique-token fraction — low values flag boilerplate/spam."""
    return F.size(F.array_distinct(toks)).cast("double") / F.size(toks)


def mean_token_length(toks: Column) -> Column:
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda acc, x: acc + x
    )
    return total.cast("double") / F.size(toks)


def quality_score(toks: Column, stopwords: list[str] | None = None) -> Column:
    """Composite [0,1] quality heuristic: vocabulary diversity, non-stopword
    density, and a saturating length credit. Deterministic double algebra
    (mirrors the SQL oracle exactly)."""
    n = F.size(toks)
    dr = distinct_ratio(toks)
    stop_ratio = stopword_count(toks, stopwords).cast("double") / n
    length_credit = F.least(F.lit(1.0), n.cast("double") / F.lit(50.0))
    return dr * F.lit(0.4) + (F.lit(1.0) - stop_ratio) * F.lit(0.4) + length_credit * F.lit(0.2)


def language_guess(toks: Column, markers: dict[str, list[str]] | None = None) -> Column:
    """N-gram/stopword language-ID heuristic: count marker-token hits per
    language; argmax with a fixed language order on ties; no hits → 'und'."""
    markers = markers or LANG_MARKERS

    def _hits(words: list[str]) -> Column:
        # NB: the lambda must take exactly one arg — a two-arg lambda makes
        # F.filter pass (element, index) and the index shadows the wordlist
        return F.size(F.filter(toks, lambda t: t.isin(words)))

    scores = {lang: _hits(words) for lang, words in markers.items()}
    best_lang = F.lit("und")
    best_score = F.lit(0)
    # iterate in fixed order; strictly-greater keeps the earliest on ties
    for lang, score in scores.items():
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best_lang


def bag_fingerprint(toks: Column) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct token bag. Identical token sets collide by construction —
    the cheap first pass of content-defined dedup."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))))
