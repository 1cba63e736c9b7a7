"""Text ranking over the document corpus.

The reference engine BUILDS search documents and ships them to
Elasticsearch (plans/search_documents.py, sinks/es_json.py); this module
adds the query-side scorer so the corpus itself is searchable in-engine —
Okapi BM25, the default ranking function of the search engines the
reference feeds (reference capability context:
databuilder/publisher/elasticsearch_publisher.py ships documents into an
index whose default similarity IS BM25).

Determinism: per-term partial scores are rounded, sorted by term, and
folded left-to-right (F.aggregate), so double addition order is fixed and
the DuckDB oracle (list_sum over an ORDER BY term list) reproduces the
exact bits; final scores round to 6 decimals with id tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from amundsendatabuilder_spark.functions.scalars import round_half_away
from amundsendatabuilder_spark.functions.text import tokens


def bm25_topk(docs: DataFrame, query: str, k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Okapi BM25 top-k for one query string: (doc_id, score, rank).

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl)),
    idf(t) = ln(1 + (N−df+0.5)/(df+0.5)) — the Robertson/Sparck-Jones
    form with the +1 that keeps idf positive.

    Scale shape: the exploded token stream is filtered to the query's
    terms BEFORE any aggregation, so the tf shuffle carries at most
    |query terms| rows per document — the corpus-sized token explosion
    never shuffles. N/avgdl are one scalar aggregate broadcast onto the
    scored rows (no driver collect); df is a |terms|-row aggregate. The
    final top-k is a rank window over documents that matched at least one
    term, ordered by (rounded score desc, id).
    """
    terms = sorted({t for t in query.lower().split() if t})
    assert terms, "query must contain at least one term"
    base = docs.select(F.col(id_col).alias("doc_id"),
                       tokens(F.lower(F.col(text_col))).alias("_toks"))
    lengths = base.select("doc_id", F.size("_toks").cast("double").alias("dl"))
    stats = lengths.agg(F.count("*").cast("double").alias("n_docs"),
                        F.avg("dl").alias("avgdl"))
    hits = (base.select("doc_id", F.explode("_toks").alias("term"))
            .where(F.col("term").isin(terms)))
    tf = hits.groupBy("doc_id", "term").agg(F.count("*").cast("double").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    scored = (tf.join(F.broadcast(df_), "term")
              .join(lengths, "doc_id")
              .crossJoin(F.broadcast(stats)))
    idf = F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    part = idf * (F.col("tf") * (k1 + 1)) / \
        (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    per_term = scored.select("doc_id", "term",
                             round_half_away(part, 9).alias("part"))
    # fold per-term partials in term order: double addition order is then
    # identical on both engines (DuckDB twin: list_sum(list(part ORDER BY
    # term))), making the summed score bit-reproducible
    summed = (per_term.groupBy("doc_id")
              .agg(F.aggregate(
                  F.array_sort(F.collect_list(F.struct("term", "part"))),
                  F.lit(0.0), lambda acc, s: acc + s["part"]).alias("raw")))
    # distributed top-k (TakeOrderedAndProject), NOT a global rank window
    # over the whole scored corpus; the rank window then runs on k rows
    topk = (summed.select("doc_id",
                          round_half_away(F.col("raw"), 6).alias("score"))
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(k))
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (topk.withColumn("rank", F.row_number().over(w))
            .select("doc_id", "score", "rank"))


def build_postings(docs: DataFrame, min_df: int = 1,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Inverted-index construction: one row per index term with its
    document frequency, collection frequency, and the posting list
    "doc:tf" ordered by doc id — the index-build pass behind the
    reference's Elasticsearch publisher (the engine it ships documents
    to runs exactly this structure; here the build itself is a Spark
    job so a 100 TB corpus can be indexed without a search cluster
    ingesting raw text).

    Scale shape: tokenize + per-(term, doc) count is one
    map-side-combinable aggregation; the posting-list assembly groups by
    term only — terms are Zipf-distributed, and the one giant stopword
    posting list per language is exactly what ``min_df``'s complement
    (a max_df cut upstream, cf. dedup._cap_shingle_df) or AQE skew
    handling absorbs; the list is built with sort_array so output is
    deterministic. Postings emit as strings for portability (and the
    oracle); a production sink would write the struct array."""
    from amundsendatabuilder_spark.session import ensure_parallelism
    tf = (ensure_parallelism(docs)
          .select(id_col,
                  F.explode(tokens(F.lower(F.col(text_col)))).alias("term"))
          .groupBy("term", id_col).agg(F.count(F.lit(1)).alias("tf")))
    return (tf.groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"),
                 F.sum("tf").alias("cf"),
                 F.concat_ws(",", F.transform(
                     F.sort_array(F.collect_list(F.struct(id_col, "tf"))),
                     lambda s: F.concat_ws(":", s[id_col].cast("string"),
                                           s["tf"].cast("string"))))
                 .alias("postings"))
            .where(F.col("df") >= min_df))


def rrf_fuse(ranked: dict[str, DataFrame], id_col: str = "doc_id",
             rank_col: str = "rank", k0: int = 60, k: int = 10) -> DataFrame:
    """Reciprocal-rank fusion (Cormack & Clarke 2009) of named rank lists
    — the hybrid-retrieval combiner for BM25 + vector search: score(d) =
    Σ_systems 1e6 DIV (k0 + rank_s(d)) in exact integer micro-units, so
    the fusion is order-free and hash-reproducible cross-engine (float
    RRF sums would depend on join order).

    Input: {system_name: DataFrame with (id_col, rank_col)} — each a
    top-k list. The fusion is JOIN-FREE: the tagged lists union into one
    (doc_id, system, rank) stream and a single map-side-combinable
    aggregate pivots per-system ranks and sums the integer RRF parts —
    a full-outer join of the lists cannot broadcast (Spark falls back to
    sort-merge even for 20-row sides) and the union+pivot shape carries
    only Σk rows through one shuffle. Output: (doc_id, <system>_rank ...
    nullable, rrf_score, fused_rank), top-k by (rrf_score DESC, doc_id).
    """
    assert ranked, "need at least one ranked list"
    names = list(ranked)
    u = None
    for name in names:
        part = ranked[name].select(
            F.col(id_col).alias("doc_id"), F.lit(name).alias("sys"),
            F.col(rank_col).cast("int").alias("rank"))
        u = part if u is None else u.unionByName(part)
    rrf_part = F.expr(f"CAST(1000000 DIV (CAST({k0} AS BIGINT) + rank)"
                      " AS BIGINT)")
    aggs = [F.max(F.when(F.col("sys") == name, F.col("rank")))
            .alias(f"{name}_rank") for name in names]
    fused = (u.groupBy("doc_id")
             .agg(*aggs, F.sum(rrf_part).cast("long").alias("rrf_score")))
    topk = fused.orderBy(F.col("rrf_score").desc(), F.col("doc_id")).limit(k)
    w = Window.orderBy(F.col("rrf_score").desc(), F.col("doc_id"))
    return topk.withColumn("fused_rank", F.row_number().over(w))


def association_rules(baskets: DataFrame, basket_col: str = "basket_id",
                      item_col: str = "item", min_support: int = 5,
                      min_pair_support: int | None = None,
                      k: int = 20) -> DataFrame:
    """Market-basket association rules over (basket, item) rows — the
    A-priori pair pass with exact integer metrics: for every ordered
    item pair (a → b) co-occurring in ≥ min_support baskets,
    support/confidence in ppm and lift in milli-units, top-k by
    (confidence desc, a, b).

    Scale shape: the pair generation is a self-join ON THE BASKET KEY,
    so fan-out is bounded by Σ basket_size² — bounded baskets (retail
    orders, sessions) keep it linear in baskets; one giant basket is the
    skew case and min_support pre-filtering of items (the A-priori
    downward-closure step) prunes the long tail BEFORE the self-join.
    All metrics are integer cross-multiplications over counts: lift > 1
    becomes n·n(a,b) > n(a)·n(b) exactly, no float ratios to disagree
    across engines (lift_milli = 1000·n·n_ab DIV (n_a·n_b)).
    """
    if min_pair_support is None:
        min_pair_support = min_support
    b = (baskets.select(F.col(basket_col).alias("bid"),
                        F.col(item_col).alias("item")).distinct()
         .localCheckpoint())
    n_baskets = b.agg(F.countDistinct("bid").alias("n"))
    item_counts = b.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    frequent = item_counts.where(F.col("n_item") >= min_support)
    fb = (b.join(F.broadcast(frequent.select("item")), "item")
          .select("bid", "item"))
    left = fb.select("bid", F.col("item").alias("a"))
    right = fb.select("bid", F.col("item").alias("b"))
    pairs = (left.join(right, "bid")
             .where(F.col("a") != F.col("b"))
             .groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_ab"))
             .where(F.col("n_ab") >= min_pair_support))
    na = frequent.select(F.col("item").alias("a"), F.col("n_item").alias("n_a"))
    nb = frequent.select(F.col("item").alias("b"), F.col("n_item").alias("n_b"))
    scored = (pairs.join(F.broadcast(na), "a").join(F.broadcast(nb), "b")
              .crossJoin(F.broadcast(n_baskets))
              .select("a", "b", "n_ab",
                      F.expr("n_ab * 1000000 DIV n").alias("support_ppm"),
                      F.expr("n_ab * 1000000 DIV n_a")
                      .alias("confidence_ppm"),
                      F.expr("1000 * n * n_ab DIV (n_a * n_b)")
                      .alias("lift_milli")))
    return (scored.orderBy(F.col("confidence_ppm").desc(), "a", "b")
            .limit(k))


def ndcg_at_k(ranked: DataFrame, relevance: DataFrame, k: int = 10,
              id_col: str = "doc_id", rank_col: str = "rank",
              rel_col: str = "rel") -> DataFrame:
    """nDCG@k of a ranking against graded relevance — THE IR evaluation
    metric closing the in-engine search loop (bm25_topk produces the
    ranking, hybrid_rrf_fusion merges rankings, this scores them):
    DCG = sum over served positions of (2^rel - 1)/log2(rank+1),
    normalized by the ideal DCG of the k most relevant docs in the
    whole relevance table (not just the served page — a ranking that
    missed the best docs is penalized, as it should be).

    ``ranked``: (id, rank) with rank 1-based; ``relevance``: (id, rel)
    with small non-negative integer grades — duplicate ids collapse to
    max(rel) before anything joins, so a doc graded twice can neither
    fan out the served-side join (inflating DCG) nor occupy two IDCG
    slots. Returns one row:
    (k, dcg, idcg, ndcg) — 6dp; ndcg NULL when IDCG is 0 (no relevant
    docs anywhere).

    Determinism/scale shape: gains (2^rel - 1) are exact integers;
    each position's gain/log2(rank+1) term quantizes to 1e9-scaled
    BIGINT before the (<= k)-row sums; the ideal top-k is a
    TakeOrderedAndProject on (rel DESC, id) — never a global sort —
    and ties beyond the k-cut carry equal rel, so IDCG is
    tiebreak-insensitive. One closing division.
    """
    gain = (F.pow(F.lit(2.0), F.col(rel_col).cast("double"))
            - F.lit(1.0))
    relevance = (relevance.groupBy(id_col)
                 .agg(F.max(rel_col).alias(rel_col)))
    served = (ranked.where(F.col(rank_col) <= k)
              .join(relevance.select(F.col(id_col),
                                     F.col(rel_col)), id_col, "left")
              .select(F.col(rank_col).alias("r"),
                      F.coalesce(F.col(rel_col), F.lit(0)).alias(rel_col)))
    dcg_t = round_half_away(
        gain / F.log2(F.col("r").cast("double") + 1) * 1e9, 0
    ).cast("long")
    dcg = served.select(dcg_t.alias("t")).agg(
        F.sum("t").alias("dcg_e9"))
    ideal = (relevance
             .orderBy(F.col(rel_col).desc(), id_col).limit(k)
             .select(F.row_number().over(
                 Window.orderBy(F.col(rel_col).desc(), id_col))
                 .alias("r"),
                 F.col(rel_col)))
    idcg_t = round_half_away(
        gain / F.log2(F.col("r").cast("double") + 1) * 1e9, 0
    ).cast("long")
    idcg = ideal.select(idcg_t.alias("t")).agg(
        F.sum("t").alias("idcg_e9"))
    j = dcg.crossJoin(F.broadcast(idcg))
    return j.select(
        F.lit(int(k)).alias("k"),
        round_half_away(F.col("dcg_e9").cast("double") / 1e9, 6)
        .alias("dcg"),
        round_half_away(F.col("idcg_e9").cast("double") / 1e9, 6)
        .alias("idcg"),
        F.when(F.col("idcg_e9") > 0, round_half_away(
            F.col("dcg_e9").cast("double")
            / F.col("idcg_e9").cast("double"), 6)).alias("ndcg"))


def ir_pr_at_k(ranked: DataFrame, relevance: DataFrame, k: int = 10,
               id_col: str = "doc_id", rank_col: str = "rank",
               rel_col: str = "rel") -> DataFrame:
    """Precision/recall/reciprocal-rank@k of a ranking against binary
    relevance (rel > 0 = relevant) — the set-based IR triple next to
    ``ndcg_at_k``'s graded gain: precision answers "how much of the
    page is useful", recall "how much of the useful corpus the page
    found", RR "how far down is the first hit" (the single-query term
    of MRR; mean over a query panel by unioning panels upstream).

    Same contracts as ndcg_at_k: duplicate relevance ids collapse to
    max(rel) before anything joins; recall's denominator is the WHOLE
    relevance table (a ranking that never surfaces a relevant doc is
    penalized, not forgiven). Returns one row: (k, n_rel_total,
    n_rel_at_k, precision, recall, rr) — 6dp; recall/rr NULL when no
    doc is relevant anywhere.

    Scale shape: one broadcast-sized top-k page joins the relevance
    table on id (hash join, no window); the firsts/counts are one
    aggregate. Exact integer numerators; three closing divisions.
    """
    relevance = (relevance.groupBy(id_col)
                 .agg(F.max(rel_col).alias(rel_col)))
    page = (ranked.where(F.col(rank_col) <= k)
            .join(relevance, id_col, "left")
            .select(F.col(rank_col).alias("r"),
                    (F.coalesce(F.col(rel_col), F.lit(0)) > 0)
                    .cast("int").alias("hit")))
    tot = relevance.where(F.col(rel_col) > 0).agg(
        F.count(F.lit(1)).cast("long").alias("n_rel_total"))
    agg = page.agg(
        F.sum("hit").cast("long").alias("n_rel_at_k"),
        F.min(F.when(F.col("hit") == 1, F.col("r"))).alias("first_r"))
    return (agg.crossJoin(F.broadcast(tot)).select(
        F.lit(int(k)).alias("k"),
        "n_rel_total",
        F.coalesce(F.col("n_rel_at_k"), F.lit(0)).alias("n_rel_at_k"),
        round_half_away(F.coalesce(F.col("n_rel_at_k"), F.lit(0))
                        .cast("double") / k, 6).alias("precision"),
        F.when(F.col("n_rel_total") > 0, round_half_away(
            F.coalesce(F.col("n_rel_at_k"), F.lit(0)).cast("double")
            / F.col("n_rel_total").cast("double"), 6)).alias("recall"),
        F.when(F.col("first_r").isNotNull(), round_half_away(
            F.lit(1.0) / F.col("first_r").cast("double"), 6))
        .alias("rr")))


def rank_rbo(list_a: DataFrame, list_b: DataFrame, p: float = 0.9,
             k: int = 10, id_col: str = "doc_id",
             rank_col: str = "rank") -> DataFrame:
    """Truncated rank-biased overlap (Webber, Moffat & Zobel 2010)
    between two top-k lists: RBO@k = sum_{d=1..k} (1-p) p^(d-1) X_d / d
    with X_d the overlap of the two depth-d prefixes — the top-weighted
    list-similarity metric for comparing rankers (BM25 vs fused, this
    week's index vs last week's) where Kendall/Spearman over-weight the
    tail and set overlap ignores order entirely. 0 = disjoint pages,
    1 = identical order (truncated form: the sum of the first k
    weights, ~1 - p^k mass, is attained at identity).

    A doc ranked ra in A and rb in B joins every prefix depth
    d >= max(ra, rb), so X_d = |{docs : max(ra, rb) <= d}| — one inner
    join of the two ≤k-row pages, one ≤k-row explode, no windows.
    Per-depth terms quantize to 1e12-scaled integers with the weights
    baked as exact Python-evaluated literals, so the sum is order-free
    and the oracle replays it bit-for-bit. Returns one row:
    (k, n_common, rbo) — 6dp.
    """
    a = (list_a.where(F.col(rank_col) <= k)
         .select(F.col(id_col), F.col(rank_col).alias("_ra")))
    b = (list_b.where(F.col(rank_col) <= k)
         .select(F.col(id_col), F.col(rank_col).alias("_rb")))
    m = (a.join(b, id_col)
         .select(F.greatest("_ra", "_rb").cast("int").alias("m")))
    # exact per-depth term weights (1-p) p^(d-1) / d, Python floats
    w = {d: (1.0 - p) * p ** (d - 1) / d for d in range(1, k + 1)}
    term = F.element_at(
        F.array(*[F.lit(w[d]) for d in range(1, k + 1)]), F.col("d"))
    depths = m.select(F.explode(F.sequence(F.col("m"), F.lit(k)))
                      .alias("d"))
    per_d = (depths.groupBy("d")
             .agg(F.count(F.lit(1)).cast("long").alias("xd")))
    scored = per_d.select(
        "xd",
        round_half_away(F.col("xd").cast("double") * term * 1e12, 0)
        .cast("long").alias("t_e12"))
    return (scored.agg(F.sum("t_e12").alias("s"))
            .crossJoin(F.broadcast(
                m.agg(F.count(F.lit(1)).cast("long").alias("n_common"))))
            .select(F.lit(int(k)).alias("k"), "n_common",
                    round_half_away(
                        F.coalesce(F.col("s"), F.lit(0)).cast("double")
                        / 1e12, 6).alias("rbo")))
