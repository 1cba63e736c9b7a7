"""Text-analysis column functions for the training-data pipeline operators.

All are built-in-function compositions (split/transform/filter/sequence/
regexp) so they run JVM-side and scale linearly with no Python boundary.
Cross-engine determinism: anything that must match a SQL oracle uses md5
(identical hex output in Spark, DuckDB, Trino) rather than engine-specific
hash functions like xxhash64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from amundsendatabuilder_spark.functions.scalars import round_half_away

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately small + hardcoded so the oracle SQL can inline the
# same lists.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "y", "que"],
    "de": ["der", "die", "das", "und", "zu"],
    "fr": ["le", "la", "de", "et", "que"],
    "zh": ["de5", "le5", "shi4", "zai4", "he2"],
}


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


def tokens(col) -> Column:
    """Whitespace tokens, empties removed."""
    return F.filter(F.split(F.trim(_c(col)), r"\s+"), lambda t: t != "")


def word_shingles(col, n: int = 3) -> Column:
    """Word n-gram shingles of a text column (array<string>).

    shingle[i] = tokens[i..i+n-1] joined by single spaces; standard MinHash
    preprocessing (Broder '97 resemblance sketches).
    """
    return shingles_from_tokens(tokens(col), n)


def shingles_from_tokens(toks, n: int = 3) -> Column:
    """``word_shingles`` over an already-tokenized array column — lets a
    caller tokenize once and derive shingles for several ``n`` from the
    same materialized array (one text scan instead of one per n)."""
    toks = _c(toks)
    idx = F.sequence(F.lit(0), F.size(toks) - n)  # empty when size < n
    return F.when(F.size(toks) >= n,
                  F.transform(idx, lambda i: F.concat_ws(
                      " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]))
                  ).otherwise(F.array().cast("array<string>"))


def exploded_shingles(df, id_col: str, text_col: str, n: int = 3):
    """(id, shingle) rows of distinct word n-grams — the hot-path form.

    Materializes the token array as a real column BEFORE the n-gram
    transform: inlining ``tokens()`` inside the lambda makes Spark
    re-evaluate the split per element_at reference (measured 13× slower at
    sf0.1). Two narrow projections, no shuffle.
    """
    from pyspark.sql import functions as F  # local alias for clarity
    from amundsendatabuilder_spark.session import ensure_parallelism
    toks_df = ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"),
        tokens(F.col(text_col)).alias("_toks"))
    idx = F.sequence(F.lit(0), F.size(F.col("_toks")) - n)
    shingle = F.transform(idx, lambda i: F.concat_ws(
        " ", *[F.element_at(F.col("_toks"), (i + j + 1).cast("int"))
               for j in range(n)]))
    return (toks_df.where(F.size("_toks") >= n)
            .select("doc_id", F.explode(F.array_distinct(shingle)).alias("shingle")))


def char_ngrams(col, n: int = 3) -> Column:
    """Character n-grams (array<string>) — language-ID / fuzzy-match
    feature.

    Implementation note: ``substring(s, i, n)`` with a dynamic position is
    O(i) on UTF8String (it byte-scans to the char boundary), making the
    obvious transform O(len²) per row — measured 4-5x slower than this
    form on real corpora. Instead the char array is materialized ONCE per
    row and n-grams concatenate O(1) array lookups. The single-element
    outer ``transform`` is a let-binding: lambda arguments are evaluated
    once, so ``split`` doesn't re-run per gram (inlining it naively makes
    the expression ~40x slower — no common-subexpression elimination
    inside higher-order-function lambdas)."""
    s = _c(col)
    chars = F.split(s, "")
    bound = F.transform(
        F.array(F.struct(chars.alias("c"))),
        lambda row: F.transform(
            F.sequence(F.lit(0), F.length(s) - n),
            lambda i: F.concat(*[F.element_at(row["c"], i + j + 1)
                                 for j in range(n)])))
    return F.when(F.length(s) >= n, F.get(bound, 0)) \
        .otherwise(F.array().cast("array<string>"))


def token_count_ws(col) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col)).cast("long")


def token_count_bpe(col) -> Column:
    """BPE-ish subword count: words + digit runs + punctuation marks counted
    separately (a cheap deterministic proxy for a real tokenizer's token
    count; useful for budget estimates over 100 TB of text)."""
    s = _c(col)
    words = F.size(F.filter(F.split(s, r"[^A-Za-z]+"), lambda t: t != ""))
    digits = F.size(F.filter(F.split(s, r"[^0-9]+"), lambda t: t != ""))
    puncts = F.length(s) - F.length(F.regexp_replace(s, r"[.,;:!?'\"()]", ""))
    return (words + digits + puncts).cast("long")


def punct_ratio(col) -> Column:
    """Punctuation chars / total chars (0 for empty strings)."""
    s = _c(col)
    puncts = F.length(s) - F.length(F.regexp_replace(s, r"[.,;:!?'\"()]", ""))
    return F.when(F.length(s) > 0, puncts.cast("double") / F.length(s)).otherwise(F.lit(0.0))


def stopword_ratio(col, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    toks = tokens(col)
    stops = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(stops, F.lower(t))))
    return F.when(F.size(toks) > 0,
                  hits.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(col) -> Column:
    """Heuristic document quality in [0,1]: rewards mid-length docs, token
    diversity, low punctuation noise. Mirrors C4/Gopher-style rule filters
    reduced to an arithmetic score (so it is SQL-oracle-expressible)."""
    s = _c(col)
    toks = tokens(col)
    n_tok = F.size(toks).cast("double")
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    diversity = F.when(n_tok > 0,
                       F.size(F.array_distinct(toks)).cast("double") / n_tok
                       ).otherwise(F.lit(0.0))
    noise = punct_ratio(col)
    return round_half_away(len_score * 0.4 + diversity * 0.4 + (1 - noise) * 0.2, 4)


def fingerprint_md5(col) -> Column:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized, lowercased text. The content-defined-chunking
    rolling hash of larger systems degenerates to a whole-doc hash at our
    record granularity; md5 is chosen for cross-engine parity."""
    normalized = F.concat_ws(" ", tokens(F.lower(_c(col))))
    return F.md5(normalized)
