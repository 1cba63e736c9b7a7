"""Document-level text analysis operators (DataFrame -> DataFrame).

Each wraps the column functions in functions/text.py into a full-table
operator with a stable output schema, mirroring how the reference wraps
scalar transforms into Transformer classes
(reference: databuilder/transformer/base_transformer.py:14-24).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from amundsendatabuilder_spark.functions.scalars import round_half_away

from amundsendatabuilder_spark.functions.text import (
    STOPWORDS, fingerprint_md5, punct_ratio, quality_score, stopword_ratio,
    token_count_bpe, token_count_ws, tokens,
)


def language_id(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """n-gram/stopword heuristic language ID: score each language by its
    stopword hit-ratio, pick the argmax (ties broken by language code).

    Returns (doc_id, predicted_lang, confidence). A real system uses
    character-n-gram Naive Bayes (e.g. CLD3-style); the stopword-ratio
    variant keeps the operator oracle-verifiable while exercising the same
    plan shape (N scores + greatest/argmax, one pass, no shuffle).
    """
    scores = [stopword_ratio(F.col(text_col), lang).alias(f"score_{lang}")
              for lang in sorted(STOPWORDS)]
    scored = docs.select(F.col(id_col), F.col(text_col), *scores)
    langs = sorted(STOPWORDS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.coalesce(
        *[F.when(F.col(f"score_{l}") == best, F.lit(l)) for l in langs])
    return scored.select(
        F.col(id_col),
        pred.alias("predicted_lang"),
        round_half_away(best, 6).alias("confidence"),
    )


def quality_metrics(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_tokens_bpe, punct_ratio, quality) — C4/Gopher
    style quality features + composite score."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        token_count_ws(t).alias("n_tokens"),
        token_count_bpe(t).alias("n_tokens_bpe"),
        round_half_away(punct_ratio(t), 6).alias("punct_ratio"),
        quality_score(t).alias("quality"),
    )


def fingerprints(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(doc_id, fingerprint, prefix_bucket) — md5 content fingerprint plus a
    16-way prefix bucket (the partition key an incremental dedup store would
    shard by)."""
    fp = fingerprint_md5(F.col(text_col))
    return docs.select(
        F.col(id_col),
        fp.alias("fingerprint"),
        F.substring(fp, 1, 1).alias("prefix_bucket"),
    )
