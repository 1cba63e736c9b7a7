"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship search-document build (SURVEY §2.6,
reference: databuilder/extractor/neo4j_search_data_extractor.py:23-62) on
sf0.001. ``queries()``/``oracle_sql()`` expose the full oracle-verified
suite from amundsendatabuilder_spark.plans.oracle_suite — one entry per
operator class of SURVEY §2 plus the training-data pipeline operators.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from amundsendatabuilder_spark.plans.oracle_suite import ORACLES, QUERIES  # noqa: E402

# Dict iteration order = presentation order. Round-13 window (50
# slots): the SECOND re-cert-dominated window (r12 verdict item #1 —
# "oldest rows first in _PRIORITY, the remaining 27 r6-era rows at the
# very front"). Recounted from CORRECTNESS_r01–r12 this round (the
# recount is now a tool — ``python tools/cert_age.py`` prints the
# histogram and the oldest-first paste-ready stale list): the
# newest-cert histogram is 27 rows at r6 + 50 at r7 (= the verdict's 77);
# a 50-slot window cannot clear 77, so the window is
# (a) ALL 27 r6-era rows, then
# (b') the rows whose operator changed this round (the r11 rule:
# changed plan/semantics → re-certify): the logreg family carries the
# new runtime weight-register guard (r12 verdict item #5), the
# mutual-NN recall audits carry the enforced sample-scale contract
# (item #3; the exact twin too), and stream_bottomk_sample's
# timeout-on-open branch now degrades gracefully (r12 advice), then
# (c) r7-era re-certs, alphabetical, filling the remaining 14 slots;
# the other 36 r7 rows defer to r14 (all 77 stay green on the r13
# LOCAL gate meanwhile). Names not registered are skipped by
# ``_ordered``.
_PRIORITY = [
    # (a) r6-era re-certs — the oldest certification debt (27 rows)
    "duplicate_substring_spans", "funnel_stages",
    "graph_match_varlen", "graph_path_rel_props", "graph_shortest_path",
    "hll_distinct_sketch", "inverted_index_postings",
    "joinability_discovery", "journey_trigrams", "k_anonymity_audit",
    "langid_nb", "linear_touch_credit", "mixture_epochs",
    "multimodal_audio_chunks", "multimodal_gif_frames",
    "multimodal_jpeg_features", "multimodal_png_features",
    "multimodal_spectral_peak", "ri_violations", "rolling_trailing_sum",
    "scan_filter_project", "scd2_intervals", "stratified_fixed_k",
    "stream_attribution_outer", "stream_windowed_distinct",
    "stream_windowed_heavy_hitters", "zorder_layout_stats",
    # (b') operators changed in round 13 — re-certify per the r11 rule:
    # logreg_train/score gained the runtime register guard (plan
    # changed, output identical), the recall audits gained the
    # sample-scale raise (default path adds a pre-count), bottom-k's
    # timeout branch was softened
    "logreg_quality_train", "logreg_quality_score", "score_calibration",
    "logreg_weight_explain", "uncertainty_sampling", "logreg_holdout_auc",
    "mutual_nn_recall_report", "mutual_nn_exact_recall_report",
    "stream_bottomk_sample",
    # (b'' — r13 corrupt-row hardening, same sequence-steps-down class
    # as the r12 high advice): embedding_covariance now excludes
    # zero-length vectors from every sufficient statistic and raises on
    # ragged dims (PCA trio inherits the plan), frame_sample_plan clamps
    # negative durations — outputs identical on healthy data, plans
    # changed, so all five re-certify
    "embedding_covariance", "pca_power_iteration",
    "pca_explained_variance", "pca_top_components",
    "multimodal_frame_plan",
    # mixture_rates is BOTH r7-era and changed this round (empty-group
    # division hardening); distribution_drift changed too (degenerate
    # one-timestamp range no longer DIV-0-aborts)
    "mixture_rates", "distribution_drift",
    # (c) r7-era re-certs, alphabetical — first 7 fit the window
    # (through dedup_ngram_jaccard); the remaining 42 defer to r14
    "char_ngram_profile", "corpus_length_stats", "decayed_popularity",
    "decontam_benchmark_overlap", "dedup_clusters",
    "dedup_embedding_cosine", "dedup_ngram_jaccard",
]


def _ordered(mapping: dict) -> dict:
    out = {k: mapping[k] for k in _PRIORITY if k in mapping}
    out.update((k, v) for k, v in mapping.items() if k not in out)
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["search_doc_flagship"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented query/operator from SURVEY.md §2."""
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each query (keys without an entry
    get the driver's weaker rows-only check)."""
    return _ordered(ORACLES)
