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

    Formulated as ZERO-shuffle column algebra: the gram-hash array is
    bound once per row through a `transform(array(hs), a -> ...)` let
    binding (the lambda variable pins the evaluated array, so each gram
    is hashed exactly once even though CollapseProject would otherwise
    inline and re-hash it per window), then every length-w window takes
    array_min over a slice. Per-doc state is one document's gram
    sequence, exactly as in the exploded window formulation — but with
    no shuffle and no per-doc sort at all.
    Docs shorter than k + w - 1 chars yield no fingerprint row.
    Returns (doc_id, n_fp, fp_hash), or (doc_id, fingerprints) with
    as_sets=True (the raw selected-min sets, for pair intersection)."""
    t = df.select(
        F.col(id_col).alias("doc_id"), F.trim(F.col(text_col)).alias("__t")
    )
    hs = F.expr(
        f"IF(length(__t) >= {k}, "
        f"transform(sequence(1, length(__t) - {k - 1}), "
        f"i -> md5(substring(__t, i, {k}))), "
        f"array())"
    )
    # sequence(1, 0) would DESCEND — guard the short-doc branch
    window_mins = F.get(
        F.transform(
            F.array(hs),
            lambda a: F.when(
                F.size(a) >= w,
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.size(a) - F.lit(w - 1)),
                        lambda j: F.array_min(F.slice(a, j, w)),
                    )
                ),
            ).otherwise(F.array().cast("array<string>")),
        ),
        0,
    )
    # short-doc drop via the CHEAP precondition (a fingerprint exists
    # iff len(trim(text)) >= k + w - 1), NOT size(__fps) >= 1: Catalyst
    # substitutes the alias and pushes the filter below the widening
    # exchange, which would run the whole winnow expression
    # single-threaded in the narrow scan stage and again above it
    rows = t.filter(F.length("__t") >= k + w - 1).select(
        "doc_id", F.array_sort(window_mins).alias("__fps")
    )
    if as_sets:
        return rows.select("doc_id", F.col("__fps").alias("fingerprints"))
    return rows.select(
        "doc_id",
        F.size("__fps").alias("n_fp"),
        F.md5(F.concat_ws("", "__fps")).alias("fp_hash"),
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


def word_ngrams(toks: Column, n: int) -> Column:
    """Word n-grams as space-joined strings (empty array when the
    document has fewer than n tokens). Pure array algebra — the
    repetition-signal entries consume this without materializing a
    token explosion.

    Built by zip_with over n shifted SLICES of the token array — the
    index form (transform over a sequence with element_at lookups)
    evaluates ~30x slower through Spark's interpreted
    higher-order-function path (r15: 10.4 s -> 0.4 s on the d34
    explode at sf0.1)."""
    count = F.size(toks) - (n - 1)
    gram = F.slice(toks, 1, count)
    for k in range(1, n):
        gram = F.zip_with(
            gram,
            F.slice(toks, k + 1, count),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.when(count >= 1, gram).otherwise(
        F.array().cast("array<string>")
    )
