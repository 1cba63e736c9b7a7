"""Document-level text analysis operators (DataFrame -> DataFrame).

Each wraps the column functions in functions/text.py into a full-table
operator with a stable output schema, mirroring how the reference wraps
scalar transforms into Transformer classes
(reference: databuilder/transformer/base_transformer.py:14-24).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from amundsendatabuilder_spark.functions.scalars import round_half_away

from amundsendatabuilder_spark.functions.text import (
    STOPWORDS, char_ngrams, fingerprint_md5, punct_ratio, quality_score,
    stopword_ratio, token_count_bpe, token_count_ws, tokens,
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


def langid_nb_fit(docs: DataFrame, lang_col: str = "lang",
                  text_col: str = "text", n: int = 3) -> DataFrame:
    """Multinomial Naive Bayes language model over character n-grams —
    the REAL algorithm behind `language_id`'s documented heuristic
    stand-in (CLD3-lineage). Returns one row per (lang, gram) with
    add-one-smoothed ln P(gram|lang), plus per-lang aggregates every
    scorer needs: ln prior, the default log-prob for grams unseen in
    that language, and the language's total gram mass.

    Two shuffles: the (lang, gram) count groupBy (map-side combinable)
    and the per-lang totals; V (corpus vocab size) is a scalar aggregate.
    All log-probs round to 9 decimals so downstream folds are
    bit-reproducible cross-engine.
    """
    grams = docs.select(F.col(lang_col).alias("lang"),
                        F.explode(char_ngrams(F.lower(F.col(text_col)), n))
                        .alias("gram"))
    # counts feeds THREE consumers (totals, vocab, the final join);
    # materialize it once — it is langs x vocab rows (MBs even for a
    # 100-language model), while its lineage is the full corpus explode,
    # which would otherwise run three times
    counts = grams.groupBy("lang", "gram").agg(
        F.count("*").cast("double").alias("c")).localCheckpoint()
    totals = counts.groupBy("lang").agg(F.sum("c").alias("total"))
    vocab = counts.select("gram").distinct().agg(
        F.count("*").cast("double").alias("v"))
    priors = docs.groupBy(F.col(lang_col).alias("lang")).agg(
        F.count("*").cast("double").alias("n_docs"))
    n_total = docs.agg(F.count("*").cast("double").alias("n_all"))
    # model is the same bounded size; checkpointing the RESULT means
    # callers (predict uses it twice: broadcast scorer + lang_stats) never
    # re-run the fit pipeline per consumer
    # totals/priors are |langs| rows but sit behind the localCheckpoint,
    # which hides size stats from AQE — without the explicit hint Spark
    # falls back to sort-merge for both (the suite's only small-side SMJs)
    return (counts.join(F.broadcast(totals), "lang")
            .crossJoin(F.broadcast(vocab))
            .join(F.broadcast(priors), "lang")
            .crossJoin(F.broadcast(n_total))
            .select(
                "lang", "gram",
                round_half_away(F.log((F.col("c") + 1.0)
                                      / (F.col("total") + F.col("v"))), 9)
                .alias("logp"),
                round_half_away(F.log(1.0 / (F.col("total") + F.col("v"))), 9)
                .alias("default_logp"),
                round_half_away(F.log(F.col("n_docs") / F.col("n_all")), 9)
                .alias("log_prior"))
            .localCheckpoint())


def langid_nb_predict(docs: DataFrame, model: DataFrame,
                      id_col: str = "doc_id", text_col: str = "text",
                      n: int = 3) -> DataFrame:
    """Score every document against every language in the fitted model
    and return the argmax: (doc_id, predicted_lang, score).

    score(d, l) = ln prior_l + Σ_g m_dg·lnP(g|l) + (|d| − matched_l)·
    default_l, with the matched-gram fold ordered by gram so double
    addition is deterministic (the same cross-engine trick as BM25).
    The model broadcasts (langs × vocab rows — MBs); per-doc gram counts
    are one shuffle; the scoring join fans each doc gram out to the
    languages that contain it, bounded by |langs|.
    """
    doc_grams = (docs.select(F.col(id_col).alias("doc_id"),
                             F.explode(char_ngrams(F.lower(F.col(text_col)), n))
                             .alias("gram"))
                 .groupBy("doc_id", "gram")
                 .agg(F.count("*").cast("double").alias("m")))
    # Anchor on docs, not doc_grams: a doc shorter than n chars has no
    # grams at all, but must still be scored (prior-only argmax), per the
    # "score every document" contract. The total gram count has a closed
    # form — max(len - n + 1, 0) — so no join back to the exploded grams
    # is needed (that join re-ran the whole explode lineage a second time).
    doc_sizes = docs.select(
        F.col(id_col).alias("doc_id"),
        F.greatest(F.length(F.lower(F.col(text_col))) - (n - 1), F.lit(0))
        .cast("double").alias("g_total"))
    lang_stats = model.select("lang", "default_logp", "log_prior").distinct()
    # Deterministic summation WITHOUT a per-group collect+sort: each
    # 9-dp-rounded partial is exactly a multiple of 1e-9, so scaling to
    # int64 nano-units and summing integers is exact and order-independent
    # (collect_list + array_sort folded the same value, but materialized
    # every (doc, lang) group's gram structs — the predict stage's hotspot
    # at corpus scale). Magnitudes: |part| < 1e5 -> < 1e14 nano-units,
    # x ~1e3 grams/group, far inside int64.
    matched = (doc_grams.join(F.broadcast(model), "gram")
               .select("doc_id", "lang", "m",
                       F.round(round_half_away(F.col("m") * F.col("logp"), 9)
                               * 1e9).cast("long").alias("part_fp"))
               .groupBy("doc_id", "lang")
               .agg((F.sum("part_fp") / F.lit(1e9)).alias("hit_sum"),
                    F.sum("m").alias("matched_m")))
    scored = (doc_sizes.crossJoin(F.broadcast(lang_stats))
              .join(matched, ["doc_id", "lang"], "left")
              .select("doc_id", "lang",
                      (F.col("log_prior")
                       + F.coalesce(F.col("hit_sum"), F.lit(0.0))
                       + round_half_away(
                           (F.col("g_total")
                            - F.coalesce(F.col("matched_m"), F.lit(0.0)))
                           * F.col("default_logp"), 9)).alias("raw")))
    # argmax(raw desc, lang asc) as a map-side-combinable MIN over
    # (-raw, lang) structs instead of a row_number window: the window
    # shuffled and SORTED every (doc, lang) score row, the aggregate
    # pre-reduces each map partition to one row per doc before the
    # exchange (|langs|x fewer shuffled bytes, no sort). Double negation
    # is exact, so the ordering is identical; lang breaks ties the same
    # way; raw rides along for the final 6dp round.
    return (scored.groupBy("doc_id")
            .agg(F.min(F.struct((-F.col("raw")).alias("_neg_raw"),
                                F.col("lang").alias("lang"),
                                F.col("raw").alias("raw"))).alias("_best"))
            .select("doc_id",
                    F.col("_best.lang").alias("predicted_lang"),
                    round_half_away(F.col("_best.raw"), 6).alias("score")))


def lm_fluency_score(docs: DataFrame, model: DataFrame,
                     id_col: str = "doc_id", text_col: str = "text",
                     lang_col: str = "lang", n: int = 3) -> DataFrame:
    """CCNet-style language-model quality signal: each document's average
    per-gram log-probability under ITS OWN language's fitted char-n-gram
    model (langid_nb_fit) — the in-engine stand-in for the KenLM
    perplexity filter real pretraining pipelines gate on (low avg log-prob
    = boilerplate/garble/mixed-language, the docs a quality gate drops).

    avg_logp(d) = (Σ_matched m·lnP(g|lang_d) + (|d| − matched)·default) /
    |d|; docs with no grams (shorter than n chars) score NULL. Same scale
    shape as predict, but each doc joins only its own language's model
    rows — fan-out 1, not |langs| — and partial sums use the exact
    int64 nano-unit trick shared with langid_nb_predict.

    Returns (doc_id, lang, avg_logp). Spearman-correlates with true LM
    perplexity on the char level; thresholding is the caller's policy
    (quality_quantile_filter composes directly).
    """
    doc_grams = (docs.select(F.col(id_col).alias("doc_id"),
                             F.col(lang_col).alias("lang"),
                             F.explode(char_ngrams(F.lower(F.col(text_col)), n))
                             .alias("gram"))
                 .groupBy("doc_id", "lang", "gram")
                 .agg(F.count("*").cast("double").alias("m")))
    matched = (doc_grams.join(F.broadcast(model), ["lang", "gram"])
               .select("doc_id", "lang",
                       F.round(round_half_away(F.col("m") * F.col("logp"), 9)
                               * 1e9).cast("long").alias("part_fp"),
                       "m")
               .groupBy("doc_id", "lang")
               .agg((F.sum("part_fp") / F.lit(1e9)).alias("hit_sum"),
                    F.sum("m").alias("matched_m")))
    lang_stats = model.select("lang", "default_logp").distinct()
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.col(lang_col).alias("lang"),
        F.greatest(F.length(F.lower(F.col(text_col))) - (n - 1), F.lit(0))
        .cast("double").alias("g_total"))
    return (base.join(F.broadcast(lang_stats), "lang")
            .join(matched, ["doc_id", "lang"], "left")
            .select("doc_id", "lang",
                    F.when(F.col("g_total") > 0, round_half_away(
                        (F.coalesce(F.col("hit_sum"), F.lit(0.0))
                         + round_half_away(
                             (F.col("g_total")
                              - F.coalesce(F.col("matched_m"), F.lit(0.0)))
                             * F.col("default_logp"), 9))
                        / F.col("g_total"), 6)).alias("avg_logp")))


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


# PII patterns kept RE2-compatible so Spark (java.util.regex) and DuckDB
# (RE2) oracle runs rewrite identically. Scrub order matters: emails first
# (they contain digit runs), then long digit runs (phone-ish), then IPv4.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_DIGITS = r"[0-9]{7,}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def pii_scrub(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(doc_id, scrubbed_md5, n_emails, n_numbers) — redact emails, long
    digit runs and IPv4s with typed placeholders; counts of each redaction
    ride along for audit. Pure regexp_replace chain, JVM-side, linear scan
    — the shape a 100 TB scrub pass needs (no shuffle at all)."""
    t = F.col(text_col)
    n_emails = (F.size(F.split(t, PII_EMAIL, -1)) - 1).cast("long")
    after_email = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    n_numbers = (F.size(F.split(after_email, PII_DIGITS, -1)) - 1).cast("long")
    scrubbed = F.regexp_replace(
        F.regexp_replace(after_email, PII_DIGITS, "<NUM>"),
        PII_IPV4, "<IP>")
    return docs.select(
        F.col(id_col),
        F.md5(scrubbed).alias("scrubbed_md5"),
        n_emails.alias("n_emails"),
        n_numbers.alias("n_numbers"),
    )


def repetition_metrics(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Gopher-style repetition features per doc: fraction of tokens that are
    repeats (1 - distinct/total) and the top single token's share. One
    explode + one groupBy(doc, token) with map-side combine, then a per-doc
    re-aggregation — both shuffles carry (id, token, count), never text."""
    tok_rows = docs.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"))
    per_tok = tok_rows.groupBy(id_col, "tok").agg(F.count("*").alias("n"))
    return (per_tok.groupBy(id_col)
            .agg(F.sum("n").cast("long").alias("n_tokens"),
                 F.count("*").cast("long").alias("n_distinct"),
                 round_half_away(
                     F.lit(1.0) - F.count("*").cast("double") / F.sum("n"), 6)
                 .alias("dup_token_frac"),
                 round_half_away(
                     F.max("n").cast("double") / F.sum("n"), 6)
                 .alias("top_token_frac")))


def hash_sample(docs: DataFrame, id_col: str = "doc_id",
                strata_col: str = "lang",
                prefix_chars: tuple[str, ...] = ("0", "1")) -> DataFrame:
    """Deterministic content-addressed sampling summary per stratum:
    keep rows whose md5(id) starts with one of ``prefix_chars`` (2/16 =
    12.5% expected). Hash-based sampling is reproducible across runs,
    engines and cluster sizes — unlike rand()-based sampling, re-runs at
    100 TB select the same rows, so downstream caches stay valid."""
    h = F.substring(F.md5(F.col(id_col).cast("string")), 1, 1)
    keep = h.isin(*prefix_chars)
    return (docs.groupBy(strata_col)
            .agg(F.count("*").alias("n_total"),
                 F.sum(keep.cast("long")).cast("long").alias("n_sampled"),
                 F.min(F.when(keep, F.col(id_col))).alias("first_sampled_id")))


def vocab_topk(docs: DataFrame, k: int = 100,
               text_col: str = "text") -> DataFrame:
    """Global token vocabulary top-k by frequency (rank ties broken by
    token): the vocabulary-build pass of a tokenizer-training pipeline.
    explode -> two-level count (map-side partial then merge) -> single-
    reducer top-k on the already-tiny distinct-token set."""
    counts = (docs.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"))
              .groupBy("tok").agg(F.count("*").alias("n")))
    # Distributed top-k (TakeOrderedAndProject: per-partition heads, then a
    # k*P-row merge) instead of a global-ordered window over every distinct
    # token — at 100 TB the vocabulary is 10^7+ rows and an unpartitioned
    # window serializes them onto one core. The rank window then runs over
    # only the k surviving rows.
    top = counts.orderBy(F.col("n").desc(), F.col("tok")).limit(k)
    w = Window.orderBy(F.col("n").desc(), F.col("tok"))
    return top.withColumn("rank", F.row_number().over(w))


def bpe_merges(docs: DataFrame, iters: int = 3, vocab_size: int = 200,
               text_col: str = "text") -> DataFrame:
    """Byte-pair-encoding tokenizer training — the greedy merge loop of
    Sennrich et al. 2016, run entirely as DataFrame algebra. Returns the
    learned merge table: (it, sym_a, sym_b, pair_count), one row per
    iteration, in merge order.

    The reference pipeline ships text to external tokenizers; training the
    merges in-engine is the missing tokenizer-side operator of a training-
    data pipeline. Shape per iteration over the word-frequency table (the
    classic BPE trick — merge counts are over the DISTINCT-word table
    weighted by frequency, never the raw corpus, so the iteration cost is
    O(vocab) regardless of corpus size):
      1. adjacent symbol pairs via one array transform (no shuffle),
      2. weighted pair counts (map-side-combinable sum),
      3. the argmax pair as a 1-row aggregate, crossJoin-broadcast back
         (no driver collect),
      4. merge applied as a pure-expression greedy fold over the symbol
         array (canonical BPE pass semantics: non-overlapping,
         left-to-right — property-tested against a pure-Python reference;
         a delimiter-string ``replace`` is NOT equivalent, because
         consecutive matches in a symbol run share the delimiter and get
         skipped: 'a a a a' merged on (a,a) must give [aa, aa]).
    Determinism contract: pair-count ties break toward the
    lexicographically LARGEST (a, b) (max of the (count, a, b) struct);
    the SQL twin expresses the same greedy pass as gaps-and-islands over
    match positions.

    At 100 TB only step 0 (the word-frequency count) sees the corpus; the
    loop itself runs on the vocab_size-row word table — executor-local
    work after one broadcast per iteration. localCheckpoint per iteration
    truncates the growing lineage (the kmeans/pagerank pattern).

    This strict one-merge-per-job form is the VERIFICATION oracle and
    the small-iters path; a production 30k-merge vocabulary runs
    ``bpe_merges_batched`` (O(n_merges/batch) jobs, property-tested
    equal to its pure-Python twin, batch=1 ≡ this function).
    """
    from amundsendatabuilder_spark.operators.profiling import (
        require_register_width)
    # the per-iteration state is the vocab_size-row word register,
    # broadcast-crossJoined every merge — width contract (r11 item #5)
    require_register_width(vocab_size,
                           "bpe word-frequency register (vocab_size)")
    tok = docs.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"))
    wf = (tok.groupBy("tok").agg(F.count("*").alias("freq"))
          .orderBy(F.col("freq").desc(), F.col("tok")).limit(vocab_size))
    words = wf.select(
        "tok", "freq",
        F.filter(F.split(F.col("tok"), ""), lambda t: t != "")
        .alias("syms")).localCheckpoint()
    merge_rows = []
    # greedy non-overlapping left-to-right merge as a pure-expression
    # fold: the last accumulated symbol merges with the incoming one iff
    # they equal the chosen pair. This IS canonical BPE pass semantics —
    # a delimiter-string replace() is NOT (consecutive matches in a
    # symbol run share the delimiter, so 'a a a a' merged on (a,a) would
    # yield [aa, a, a] instead of [aa, aa]).
    merge_fold = (
        "aggregate(syms, CAST(array() AS ARRAY<STRING>), (acc, x) -> "
        "IF(size(acc) > 0 AND element_at(acc, -1) = a AND x = b, "
        "concat(slice(acc, 1, size(acc) - 1), array(concat(a, b))), "
        "concat(acc, array(x))))")
    for it in range(1, iters + 1):
        pairs_df = (words.select(F.col("freq"), F.col("syms"))
                    .where(F.size("syms") >= 2)
                    .select("freq", F.explode(F.expr(
                        "transform(sequence(0, size(syms)-2), "
                        "i -> struct(syms[i] AS a, syms[i+1] AS b))"))
                        .alias("p")))
        counts = (pairs_df.groupBy(F.col("p.a").alias("a"),
                                   F.col("p.b").alias("b"))
                  .agg(F.sum("freq").alias("cnt")))
        best = (counts.agg(F.max(F.struct("cnt", "a", "b")).alias("m"))
                .select(F.col("m.a").alias("a"), F.col("m.b").alias("b"),
                        F.col("m.cnt").cast("long").alias("cnt")))
        merge_rows.append(best.select(
            F.lit(it).alias("it"), F.col("a").alias("sym_a"),
            F.col("b").alias("sym_b"), F.col("cnt").alias("pair_count")))
        words = (words.crossJoin(F.broadcast(best))
                 .select("tok", "freq",
                         F.when(F.col("a").isNotNull(),
                                F.expr(merge_fold))
                         .otherwise(F.col("syms")).alias("syms"))
                 .localCheckpoint())
    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionByName(m)
    # a corpus whose words are all single symbols has no pairs: the 1-row
    # argmax aggregate is then a null struct — emit nothing for that
    # iteration (the SQL twin's LIMIT 1 over an empty count set likewise
    # yields no row)
    return out.where(F.col("pair_count").isNotNull())


def bpe_merges_batched(docs: DataFrame, n_merges: int = 1000,
                       batch: int = 64, vocab_size: int = 200,
                       text_col: str = "text") -> DataFrame:
    """Batched BPE training — the production-vocabulary form of
    ``bpe_merges``: instead of one Spark job per merge (30k jobs for a
    30k-merge vocabulary — the driver-loop scale killer the sequential
    form documents), each sweep selects up to ``batch`` NON-INTERACTING
    top pairs and applies them in one fold pass, so the job count is
    O(n_merges / batch) (~2 jobs per sweep: the kept-pair count and the
    checkpointed fold), e.g. ~500 sweeps for a 30k vocabulary at
    batch=64 instead of 30k sequential jobs.

    Batch selection rule (deterministic, DataFrame-algebraic): rank the
    weighted pair counts by (count DESC, a DESC, b DESC) — the same
    largest-(cnt,a,b) tie-break as ``bpe_merges`` — take the top
    ``batch`` candidates, and drop any candidate that INTERACTS with a
    higher-ranked candidate: shares a symbol with it, or one's symbol
    equals the other's concatenation (the ``(a,a)→aa`` vs ``(aa,b)``
    trap — those two merges do not commute). Surviving pairs are
    pairwise independent, so applying them in ONE left-to-right greedy
    fold equals applying them sequentially in rank order — the
    property the pure-Python twin test pins. Batched selection is the
    standard fast-BPE-trainer approximation of strict
    one-at-a-time greedy (pair counts shift slightly between batch
    boundaries vs the sequential schedule); batch=1 reproduces
    ``bpe_merges`` exactly.

    Returns (it, sym_a, sym_b, pair_count) in application order, it
    consecutive from 1. Stops early when a sweep finds no pair
    (converged). Per-sweep state is the ≤vocab_size-row word table,
    localCheckpointed (the kmeans/pagerank pattern); only step 0's
    word-frequency count ever sees the corpus.
    """
    from amundsendatabuilder_spark.operators.profiling import (
        guard_register_domain, require_register_width)
    # two registers here: the vocab_size-row word table (per-sweep state)
    # and the n_merges-row merge table the sweeps accumulate — both under
    # the raise-not-degrade width contract (r11 item #5)
    require_register_width(max(int(vocab_size), int(n_merges)),
                           "bpe word/merge registers (vocab_size, n_merges)")
    tok = docs.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"))
    wf = (tok.groupBy("tok").agg(F.count("*").alias("freq"))
          .orderBy(F.col("freq").desc(), F.col("tok")).limit(vocab_size))
    # runtime half of the contract (r12 verdict item #5): the word
    # REGISTER row count is structurally bounded by limit(vocab_size),
    # but each row's symbol array is data-dependent — a degenerate
    # megabyte "token" (binary junk surviving tokenization) makes every
    # per-sweep fold carry a million-element array. The guard rides the
    # select the table already pays for (+0 on freq when healthy) and
    # raises past 2^16 symbols: no natural-language word is within two
    # orders of magnitude of that; collapse such blobs upstream.
    words = wf.select(
        "tok",
        guard_register_domain(
            F.col("freq"),
            F.size(F.filter(F.split(F.col("tok"), ""), lambda t: t != "")),
            "bpe per-word symbol array (degenerate token)",
            limit=1 << 16).alias("freq"),
        F.filter(F.split(F.col("tok"), ""), lambda t: t != "")
        .alias("syms")).localCheckpoint()
    # greedy fold with SET membership: at a boundary at most one kept
    # pair matches exactly (pairs are distinct), and independence makes
    # the single pass equal to sequential application
    batch_fold = (
        "aggregate(syms, CAST(array() AS ARRAY<STRING>), (acc, x) -> "
        "IF(size(acc) > 0 AND exists(ms, p -> "
        "p.a = element_at(acc, -1) AND p.b = x), "
        "concat(slice(acc, 1, size(acc) - 1), "
        "array(concat(element_at(acc, -1), x))), "
        "concat(acc, array(x))))")
    merge_rows = []
    done = 0
    while done < n_merges:
        k = min(batch, n_merges - done)
        pairs_df = (words.where(F.size("syms") >= 2)
                    .select("freq", F.explode(F.expr(
                        "transform(sequence(0, size(syms)-2), "
                        "i -> struct(syms[i] AS a, syms[i+1] AS b))"))
                        .alias("p")))
        counts = (pairs_df.groupBy(F.col("p.a").alias("a"),
                                   F.col("p.b").alias("b"))
                  .agg(F.sum("freq").alias("cnt")))
        # distributed top-k first (TakeOrderedAndProject), THEN the rank
        # window over only k rows — never a global window over the full
        # pair table (the vocab_topk discipline)
        top = counts.orderBy(F.col("cnt").desc(), F.col("a").desc(),
                             F.col("b").desc()).limit(k)
        cand = top.withColumn("rk", F.row_number().over(
            Window.orderBy(F.col("cnt").desc(), F.col("a").desc(),
                           F.col("b").desc())))
        x, y = cand.alias("x"), cand.alias("y")
        interacts = (
            (F.col("y.rk") < F.col("x.rk"))
            & ((F.col("x.a") == F.col("y.a")) | (F.col("x.a") == F.col("y.b"))
               | (F.col("x.b") == F.col("y.a")) | (F.col("x.b") == F.col("y.b"))
               | (F.col("x.a") == F.concat(F.col("y.a"), F.col("y.b")))
               | (F.col("x.b") == F.concat(F.col("y.a"), F.col("y.b")))
               | (F.col("y.a") == F.concat(F.col("x.a"), F.col("x.b")))
               | (F.col("y.b") == F.concat(F.col("x.a"), F.col("x.b")))))
        kept = (x.join(y, interacts, "left_anti")
                .select(F.col("rk"), F.col("a"), F.col("b"),
                        F.col("cnt").cast("long").alias("cnt"))
                .localCheckpoint())
        n_kept = kept.count()
        if n_kept == 0:
            break  # converged: no adjacent pair remains
        merge_rows.append(kept.select(
            (F.lit(done) + F.row_number().over(Window.orderBy("rk")))
            .cast("int").alias("it"),
            F.col("a").alias("sym_a"), F.col("b").alias("sym_b"),
            F.col("cnt").alias("pair_count")))
        ms_row = kept.agg(F.sort_array(F.collect_list(
            F.struct("rk", "a", "b"))).alias("ms"))
        words = (words.crossJoin(F.broadcast(ms_row))
                 .select("tok", "freq",
                         F.expr(batch_fold).alias("syms"))
                 .localCheckpoint())
        done += n_kept
    if not merge_rows:
        schema = "it int, sym_a string, sym_b string, pair_count long"
        return docs.sparkSession.createDataFrame([], schema)
    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionByName(m)
    return out


def length_stats(docs: DataFrame, strata_col: str = "lang",
                 text_col: str = "text") -> DataFrame:
    """Per-stratum document-length distribution (exact linear-interpolation
    percentiles — matches ANSI percentile_cont/quantile_cont): the corpus
    profile a data-mixing recipe reads. Percentile is exact (not approx)
    for oracle parity; at 100 TB swap percentile_approx in with a relative
    error bound."""
    per_doc = docs.select(F.col(strata_col),
                          token_count_ws(F.col(text_col)).alias("n_tokens"))
    return (per_doc.groupBy(strata_col)
            .agg(F.count("*").alias("n_docs"),
                 round_half_away(F.avg("n_tokens"), 2).alias("avg_tokens"),
                 round_half_away(F.percentile("n_tokens", 0.5), 2).alias("p50_tokens"),
                 round_half_away(F.percentile("n_tokens", 0.9), 2).alias("p90_tokens"),
                 F.max("n_tokens").alias("max_tokens")))


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


def quality_quantile_filter(docs: DataFrame, keep_frac: float = 0.5,
                            strata_col: str = "lang",
                            id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """Keep the top ``keep_frac`` of documents per stratum by composite
    quality score — the data-mixing step that trims each language to its
    best half. Returns (doc_id, stratum, quality).

    percent_rank over (stratum) partitions: each language ranks
    independently in its own shuffle partition group, so the window
    parallelizes across strata (never a global sort). Ties are broken by
    doc_id so the kept set is deterministic and oracle-reproducible.
    """
    scored = docs.select(
        F.col(id_col), F.col(strata_col).alias("stratum"),
        round_half_away(quality_score(F.col(text_col)), 4).alias("quality"))
    w = Window.partitionBy("stratum").orderBy(
        F.col("quality").desc(), F.col(id_col))
    return (scored
            .withColumn("_pr", F.percent_rank().over(w))
            .where(F.col("_pr") <= keep_frac)
            .drop("_pr"))


def mixture_sampling_rates(docs: DataFrame,
                           group_cols: tuple[str, ...] = ("lang", "source"),
                           text_col: str = "text") -> DataFrame:
    """Per-(lang, source) token inventory + the sampling rate that would
    equalize the mixture: rate = min(1, target/actual) where target =
    total_tokens / n_groups — the bookkeeping pass behind a training-data
    mixing recipe. Returns (group..., n_docs, n_tokens, token_share, rate).

    One groupBy shuffle carrying (group_key, count, sum); the grand totals
    come from an empty window over the already-aggregated group rows
    (dozens, not documents), so the single-partition window is bounded by
    group cardinality, not data size.
    """
    g = (docs.groupBy(*group_cols)
         .agg(F.count("*").cast("long").alias("n_docs"),
              F.sum(token_count_ws(F.col(text_col))).cast("long")
              .alias("n_tokens")))
    everything = Window.partitionBy()
    total = F.sum("n_tokens").over(everything)
    n_groups = F.count("*").over(everything)
    target = total.cast("double") / n_groups
    # dirty-corpus hardening (ANSI mode aborts on x/0): a group whose
    # docs are all empty has n_tokens = 0 — it needs no downsampling
    # (rate 1) and holds no share; an entirely tokenless corpus makes
    # every share 0 rather than killing the bookkeeping pass
    return g.select(
        *group_cols, "n_docs", "n_tokens",
        F.when(total > 0, round_half_away(
            F.col("n_tokens") / total.cast("double"), 6))
        .otherwise(F.lit(0.0)).alias("token_share"),
        F.when(F.col("n_tokens") > 0, round_half_away(
            F.least(F.lit(1.0), target / F.col("n_tokens")), 6))
        .otherwise(F.lit(1.0)).alias("rate"))


def pack_shards(docs: DataFrame, budget_tokens: int = 20_000,
                strata_col: str = "lang", id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Assign documents to fixed-token-budget output shards per stratum —
    the sequence-packing bookkeeping before writing training files of
    ~budget tokens each. Returns (doc_id, stratum, n_tokens, shard_id)
    where shard_id = the shard containing the doc's starting token offset
    in (stratum, doc_id) order.

    Running sum via a window partitioned by stratum: each stratum packs
    independently and in parallel; nothing is globally ordered. The
    deterministic (doc_id) order makes shard assignment reproducible
    across runs and cluster sizes — the property that lets a 100 TB write
    be resumed or re-sharded incrementally.
    """
    per_doc = docs.select(
        F.col(id_col), F.col(strata_col).alias("stratum"),
        token_count_ws(F.col(text_col)).alias("n_tokens"))
    w = (Window.partitionBy("stratum").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum("n_tokens").over(w)
    return per_doc.withColumn(
        "shard_id",
        F.floor((cum - F.col("n_tokens")) / budget_tokens).cast("long"))


def budget_selection(docs: DataFrame, budget_tokens: int,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Select the best documents that fit a global token budget — the
    data-selection step of a training run ("take the highest-quality
    ~N-token subset"): docs ordered by (quality desc, doc_id), kept
    while the running token total stays within ``budget_tokens``.
    Returns (doc_id, n_tokens, quality, cum_tokens) for the selected
    set.

    The global prefix sum is DISTRIBUTED, not a single-partition window:
    quality has exactly 4 decimals, so ``round(quality*10000)`` is an
    exact integer band; per-band token totals (≤10⁴ rows) take a tiny
    driver-side window to become per-band offsets, broadcast back, and
    each band computes its own (doc_id-ordered) cumulative sum in
    parallel — offset + intra-band sum == the global (quality desc,
    doc_id) running total. The same two-phase prefix-sum shape holds at
    any corpus size; only the band table (bounded by the score's
    resolution, not the corpus) ever converges to one place."""
    scored = docs.select(
        F.col(id_col),
        token_count_ws(F.col(text_col)).alias("n_tokens"),
        quality_score(F.col(text_col)).alias("quality"),
    ).withColumn("_band",
                 F.round(F.col("quality") * 10000).cast("long"))
    band_tot = scored.groupBy("_band").agg(
        F.sum("n_tokens").alias("_bt"))
    w_off = (Window.orderBy(F.desc("_band"))
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = band_tot.select(
        "_band", F.coalesce(F.sum("_bt").over(w_off), F.lit(0))
        .alias("_band_offset"))
    w_in = (Window.partitionBy("_band").orderBy(id_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (scored.join(F.broadcast(offsets), "_band")
            .withColumn("cum_tokens",
                        (F.sum("n_tokens").over(w_in)
                         + F.col("_band_offset")).cast("long"))
            .where(F.col("cum_tokens") <= budget_tokens)
            .select(id_col, "n_tokens", "quality", "cum_tokens"))


def content_defined_chunks(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text",
                           boundary_hex: str = "0") -> DataFrame:
    """Content-defined chunking: a chunk boundary opens BEFORE token i
    whenever md5(token_{i-1} + ' ' + token_i) starts with
    ``boundary_hex`` (1/16 probability per position → ~16-token mean
    chunks). Unlike fixed-width ``chunk_documents``, boundaries depend
    only on local content, so an insertion near the head of a document
    shifts ONE chunk instead of re-cutting every downstream chunk — the
    property that makes chunk-level dedup stable across corpus versions
    (the rolling-hash cut rule of CDC storage systems, applied to token
    streams). Returns (doc_id, chunk_idx, n_tokens, chunk_md5).

    One shuffle, partitioned by document (the natural unit): posexplode
    -> per-doc lag + running boundary count -> per-chunk re-agg with a
    position-sorted join hash."""
    t = docs.select(F.col(id_col),
                    F.posexplode(tokens(F.lower(F.col(text_col))))
                    .alias("pos", "tok"))
    w = Window.partitionBy(id_col).orderBy("pos")
    boundary = F.when(
        (F.col("pos") > 0)
        & (F.substring(F.md5(F.concat_ws(" ", F.lag("tok").over(w),
                                         F.col("tok"))), 1, 1)
           == boundary_hex), F.lit(1)).otherwise(F.lit(0))
    cut = t.withColumn("_b", boundary)
    chunk = F.sum("_b").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (cut.withColumn("chunk_idx", chunk.cast("int"))
            .groupBy(id_col, "chunk_idx")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.md5(F.concat_ws(" ", F.transform(
                     F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                     lambda s: s["tok"]))).alias("chunk_md5")))


def chunk_documents(docs: DataFrame, chunk_tokens: int = 64,
                    overlap_tokens: int = 16, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Split documents into overlapping fixed-token chunks — the
    context-window preparation step between cleaning and training.
    Returns (doc_id, chunk_idx, n_tokens, chunk_md5); chunk i covers
    tokens [i*step, i*step + chunk_tokens) with step = chunk_tokens -
    overlap_tokens.

    One narrow pass: tokenize once into a materialized array column (never
    inside a lambda — Spark re-evaluates per reference), generate chunk
    indices with sequence(), slice + hash per chunk, explode. No shuffle
    at all; at 100 TB this pass is embarrassingly parallel and its output
    (id, idx, hash) is 1000× smaller than the text unless the chunk text
    itself is carried forward.
    """
    step = chunk_tokens - overlap_tokens
    assert step > 0, "overlap must be smaller than chunk size"
    toks_df = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")) \
        .where(F.size("_toks") > 0)
    idx = F.sequence(
        F.lit(0), F.floor((F.size("_toks") - 1) / step).cast("int"))
    chunks = F.transform(idx, lambda i: F.struct(
        i.cast("int").alias("chunk_idx"),
        F.slice(F.col("_toks"), (i * step + 1).cast("int"),
                chunk_tokens).alias("_chunk")))
    return (toks_df.select(F.col(id_col), F.explode(chunks).alias("c"))
            .select(F.col(id_col),
                    F.col("c.chunk_idx"),
                    F.size("c._chunk").cast("long").alias("n_tokens"),
                    F.md5(F.concat_ws(" ", F.col("c._chunk")))
                    .alias("chunk_md5")))


def strip_boilerplate(docs: DataFrame, chunk_tokens: int = 8,
                      max_df: int = 3, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Boilerplate PASSAGE removal — the repeated-span cleaner between
    exact dedup (whole docs) and near-dedup (whole docs): chunk each
    document into non-overlapping ``chunk_tokens``-token spans, drop every
    span whose corpus-wide occurrence count exceeds ``max_df`` (nav bars,
    license footers, cookie banners), and reassemble the survivors in
    order. Returns (doc_id, clean_text, n_chunks_kept, n_chunks_dropped);
    clean_text is token-normalized (single spaces). A doc whose spans are
    ALL boilerplate — or whose text tokenizes to ZERO tokens — survives
    with clean_text = '' and zero counts (auditable, not silently lost);
    df is the occurrence count — equal to document frequency when a span
    appears at most once per doc.

    Scale shape: two shuffles — a window count over the span partition
    (spillable; the same guard pattern as the shingle DF cap) and the
    per-doc reassembly groupBy. Chunks shuffle as (id, idx, text-span)
    rows; span text must travel for reassembly, but only once, and the
    window dedupes nothing so no state grows with the corpus.
    """
    assert chunk_tokens >= 1, (
        f"chunk_tokens must be >= 1 (got {chunk_tokens}): a zero span "
        "width makes the chunk-index sequence NULL and drops every row")
    toks_df = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")) \
        .where(F.size("_toks") > 0)
    idx = F.sequence(
        F.lit(0), F.floor((F.size("_toks") - 1) / chunk_tokens).cast("int"))
    chunks = F.transform(idx, lambda i: F.struct(
        i.cast("int").alias("chunk_idx"),
        F.concat_ws(" ", F.slice(F.col("_toks"),
                                 (i * chunk_tokens + 1).cast("int"),
                                 chunk_tokens)).alias("chunk")))
    c = (toks_df.select(F.col(id_col), F.explode(chunks).alias("c"))
         .select(F.col(id_col), F.col("c.chunk_idx"), F.col("c.chunk")))
    w = Window.partitionBy("chunk")
    flagged = c.withColumn("_df", F.count("*").over(w))
    keep = F.col("_df") <= max_df
    cleaned = (flagged.groupBy(id_col)
               .agg(F.concat_ws(" ", F.transform(
                   F.array_sort(F.collect_list(
                       F.when(keep, F.struct("chunk_idx", "chunk")))),
                   lambda s: s["chunk"])).alias("clean_text"),
                   F.sum(F.when(keep, 1).otherwise(0)).cast("long")
                   .alias("n_chunks_kept"),
                   F.sum(F.when(keep, 0).otherwise(1)).cast("long")
                   .alias("n_chunks_dropped")))
    # Anchor on docs so token-less docs come back as ('', 0, 0) rows
    # instead of vanishing — the same auditability contract as the
    # all-boilerplate case.
    return (docs.select(F.col(id_col))
            .join(cleaned, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                    F.coalesce("n_chunks_kept", F.lit(0)).cast("long")
                    .alias("n_chunks_kept"),
                    F.coalesce("n_chunks_dropped", F.lit(0)).cast("long")
                    .alias("n_chunks_dropped")))


def cross_source_overlap(docs: DataFrame, n: int = 5,
                         source_col: str = "source",
                         text_col: str = "text") -> DataFrame:
    """Pairwise content overlap between sources: count of distinct word
    n-grams shared by each source pair — the provenance contamination
    matrix a mixing recipe consults before weighting sources. Shuffles
    (source, shingle) pairs only (text never moves); the self-join output
    is bounded by shingles × source-pairs, and per-shingle fan-out is at
    most (n_sources choose 2) — independent of corpus size."""
    from amundsendatabuilder_spark.functions.text import exploded_shingles
    sh = (exploded_shingles(
        docs.select(F.col(source_col).alias("doc_id"), F.col(text_col)),
        "doc_id", text_col, n=n)
        .select(F.col("doc_id").alias("src"), "shingle").distinct())
    a, b = sh.alias("a"), sh.alias("b")
    return (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                   & (F.col("a.src") < F.col("b.src")))
            .groupBy(F.col("a.src").alias("source_a"),
                     F.col("b.src").alias("source_b"))
            .agg(F.count("*").cast("long").alias("n_shared")))


def split_assign(docs: DataFrame,
                 weights: tuple[tuple[str, float], ...] = (
                     ("train", 0.8), ("val", 0.1), ("test", 0.1)),
                 id_col: str = "doc_id") -> DataFrame:
    """Deterministic train/val/test assignment: md5(doc_id)'s first 4 hex
    chars -> a 16-bit bucket, cut at the cumulative weight boundaries.
    Returns (doc_id, split).

    Hash-based (not rand()-based) so the assignment is stable across
    runs, engines, cluster sizes, and re-partitioning — the property a
    training pipeline needs so that a doc never migrates from test to
    train between ingestion runs. Pure map-side projection: zero shuffle
    at any scale.
    """
    assert abs(sum(w for _n, w in weights) - 1.0) < 1e-9
    bucket = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10) \
        .cast("long")
    expr = F.lit(weights[-1][0])
    acc = 0.0
    cuts = []
    for name, w in weights[:-1]:
        acc += w
        cuts.append((name, int(acc * 65536)))
    for name, cut in reversed(cuts):
        expr = F.when(bucket < cut, name).otherwise(expr)
    return docs.select(F.col(id_col), expr.alias("split"))


def split_exact_counts(docs: DataFrame,
                       weights: tuple[tuple[str, int], ...] = (
                           ("train", 8), ("val", 1), ("test", 1)),
                       strata_col: str = "lang",
                       id_col: str = "doc_id") -> DataFrame:
    """Count-exact stratified split — the complement of hash-based
    ``split_assign`` (rate-exact in expectation) for when the split
    sizes must be EXACT per stratum (a 1000-doc eval set means 1000,
    not ~1000): docs rank inside each stratum by md5 (seedless,
    engine-stable), and integer weight shares cut the ranks by the
    largest-remainder method, so per-stratum counts are exactly
    floor/ceil of n*w/W with the remainder seats going to the largest
    fractional parts (ties by declaration order). Returns
    (doc_id, stratum, split).

    Per-stratum windows only — no global ordering; the rank shuffle is
    (id, stratum, 16-byte hash) rows. The trade vs split_assign: adding
    one document can shift which doc sits at a boundary (counts stay
    exact), while hash-split never migrates a doc but only hits the
    ratio in expectation. Pick per use case; both are deterministic."""
    from pyspark.sql import Window
    total_w = sum(w for _n, w in weights)
    ranked = (docs.select(
        F.col(id_col), F.col(strata_col).alias("stratum"),
        F.md5(F.concat(F.lit("split:"), F.col(id_col).cast("string")))
        .alias("_h"))
        .withColumn("_rk", F.row_number().over(
            Window.partitionBy("stratum").orderBy("_h", id_col)))
        .withColumn("_n", F.count(F.lit(1)).over(
            Window.partitionBy("stratum"))))
    # largest-remainder seat allocation, computed per row in exact
    # integer arithmetic: quota_i = n*w_i DIV W; the r = n - sum(quotas)
    # remainder seats go to the weights with the largest n*w_i mod W
    # (ties broken by declaration order). The boundary for split k is
    # then sum of allocated seats of splits 0..k-1 — all expressible as
    # a closed-form CASE over _n, so no second pass over the strata.
    names = [n for n, _ in weights]
    ws = [w for _, w in weights]
    # plan-time validation (ANSI aborts on DIV 0 at runtime): the seat
    # quotas divide by total_w in every row expression
    if total_w <= 0 or any(w < 0 for w in ws):
        raise ValueError(
            f"split_exact_counts: weights must be non-negative with a "
            f"positive sum, got {weights}")
    quota = [F.expr(f"_n * {w} DIV {total_w}") for w in ws]
    rem = [F.expr(f"(_n * {w}) % {total_w}") for w in ws]
    # seats_i = quota_i + (1 if i among top-r remainders)
    # rank of weight i among remainders (desc, ties by index): count of
    # j with (rem_j > rem_i) or (rem_j == rem_i and j < i)
    r_total = F.expr(f"_n - ({' + '.join(f'_n * {w} DIV {total_w}' for w in ws)})")
    seats = []
    for i in range(len(ws)):
        better = [F.when((rem[j] > rem[i]) if j > i else
                         (rem[j] >= rem[i]), 1).otherwise(0)
                  for j in range(len(ws)) if j != i]
        pos = sum(better[1:], better[0]) if better else F.lit(0)
        seats.append(quota[i] + F.when(pos < r_total, 1).otherwise(0))
    expr = F.lit(names[-1])
    bound = seats[0]
    conds = [(names[0], bound)]
    for i in range(1, len(ws) - 1):
        bound = bound + seats[i]
        conds.append((names[i], bound))
    for name, cut in reversed(conds):
        expr = F.when(F.col("_rk") <= cut, name).otherwise(expr)
    return ranked.select(id_col, "stratum", expr.alias("split"))


def dedup_rate_by_source(docs: DataFrame, source_col: str = "source",
                         text_col: str = "text") -> DataFrame:
    """Per-source duplication report: (source, n_docs, n_unique,
    dup_rate) where n_unique counts distinct normalized-text
    fingerprints — the provenance scorecard that decides which sources
    need aggressive dedup before mixing. One groupBy shuffle carrying
    32-byte hashes (count-distinct keeps a per-group hash set map-side;
    text never shuffles)."""
    from amundsendatabuilder_spark.functions.scalars import round_half_away
    from amundsendatabuilder_spark.functions.text import fingerprint_md5
    return (docs
            .select(F.col(source_col).alias("source"),
                    fingerprint_md5(F.col(text_col)).alias("fp"))
            .groupBy("source")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.countDistinct("fp").cast("long").alias("n_unique"))
            .withColumn("dup_rate", round_half_away(
                1.0 - F.col("n_unique") / F.col("n_docs"), 6)))


def boilerplate_chunk_stats(docs: DataFrame, chunk_tokens: int = 16,
                            min_docs: int = 2, id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """Cross-document repeated-chunk profile (the line-dedup /
    boilerplate-removal pass of CCNet-style pipelines, adapted to
    fixed-token chunks): per document, how many of its non-overlapping
    ``chunk_tokens``-token chunks also appear in at least ``min_docs``
    documents. Returns (doc_id, n_chunks, n_boilerplate, boilerplate_frac).

    Shape: one chunking pass (zero shuffle), one groupBy over chunk
    hashes to find repeated chunks (map-side combinable, 32-byte keys),
    a broadcast-friendly join back, and the per-doc rollup. Only hashes
    move — at 100 TB the chunk-frequency table is the working set, and a
    document-frequency cap (stop-chunk removal) bounds its skew the same
    way stopword shingles are dropped in n-gram dedup.
    """
    from amundsendatabuilder_spark.functions.scalars import round_half_away
    ch = chunk_documents(docs, chunk_tokens=chunk_tokens, overlap_tokens=0,
                         id_col=id_col, text_col=text_col)
    rep = (ch.groupBy("chunk_md5")
           .agg(F.countDistinct(id_col).alias("_nd"))
           .where(F.col("_nd") >= min_docs)
           .select("chunk_md5"))
    flagged = ch.join(rep, "chunk_md5", "left_semi") \
        .groupBy(id_col).agg(F.count("*").cast("long").alias("n_boilerplate"))
    per_doc = ch.groupBy(id_col).agg(F.count("*").cast("long").alias("n_chunks"))
    return (per_doc.join(flagged, id_col, "left")
            .select(F.col(id_col),
                    "n_chunks",
                    F.coalesce("n_boilerplate", F.lit(0)).cast("long")
                    .alias("n_boilerplate"))
            .withColumn("boilerplate_frac", round_half_away(
                F.col("n_boilerplate") / F.col("n_chunks"), 6)))


def token_count_histogram(docs: DataFrame, bucket_width: int = 16,
                          strata_col: str = "lang",
                          text_col: str = "text") -> DataFrame:
    """Document-length histogram per stratum with fixed-width integer
    buckets: (stratum, bucket_lo, n_docs). Integer bucket arithmetic
    (no float log) keeps bucket edges identical on every engine; the
    whole pass is one map-side-combinable groupBy over ~(strata × #
    buckets) cells."""
    from amundsendatabuilder_spark.functions.text import token_count_ws
    n = token_count_ws(F.col(text_col))
    return (docs.select(F.col(strata_col).alias("stratum"),
                        ((n / bucket_width).cast("long") * bucket_width)
                        .alias("bucket_lo"))
            .groupBy("stratum", "bucket_lo")
            .agg(F.count("*").cast("long").alias("n_docs")))


def bigram_pmi_topk(docs: DataFrame, k: int = 20, min_count: int = 10,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Top-k token-bigram collocations by pointwise mutual information —
    the phrase-mining pass (word2vec-style phrase joining, tokenizer
    merge candidates) over a corpus.

    PMI = ln((c_ab/M) / ((c_a/N)(c_b/N))) with every count exact; the
    ratio is evaluated in a FIXED multiplication order on doubles so any
    IEEE engine (same libm ln) reproduces it, then rounded to 6dp, with
    ordering ties broken by the bigram itself. ``min_count`` suppresses
    the degenerate hapax pairs that dominate raw PMI.

    Scale shape: bigram and unigram counts are map-side-combinable
    aggregations over the token stream; N and M are 1-row aggregates
    broadcast by crossJoin; the top-k runs distributed
    (TakeOrderedAndProject) over bigrams already cut to >= min_count."""
    from pyspark.sql import Window

    from amundsendatabuilder_spark.functions.scalars import round_half_away
    from amundsendatabuilder_spark.functions.text import tokens
    from amundsendatabuilder_spark.session import ensure_parallelism
    docs = ensure_parallelism(docs)
    # the position table feeds both bigram sides and the unigram counts —
    # one materialization instead of four tokenize scans
    toks = docs.select(F.col(id_col).alias("_rid"),
                       F.posexplode(tokens(F.lower(F.col(text_col))))
                       .alias("pos", "tok")).localCheckpoint()
    # adjacent pairs WITHIN a doc: join on (doc, pos+1); cheaper than the
    # join at scale would be a transform over the token array — but the
    # array form cannot reuse the unigram explode, and the join is
    # doc-co-partitioned anyway
    a = toks.select("_rid", "pos", F.col("tok").alias("w1"))
    b = toks.select("_rid", (F.col("pos") - 1).alias("pos"),
                    F.col("tok").alias("w2"))
    bi = (a.join(b, ["_rid", "pos"])
          .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_ab")))
    uni = (toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
           .localCheckpoint())
    totals = (bi.agg(F.sum("c_ab").alias("m"))
              .crossJoin(uni.agg(F.sum("c").alias("n"))))
    ua = uni.select(F.col("tok").alias("w1"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("tok").alias("w2"), F.col("c").alias("c_b"))
    scored = (bi.where(F.col("c_ab") >= min_count)
              .join(F.broadcast(ua), "w1").join(F.broadcast(ub), "w2")
              .crossJoin(F.broadcast(totals))
              .select("w1", "w2", "c_ab", round_half_away(F.expr(
                  "ln(((CAST(c_ab AS DOUBLE) / CAST(m AS DOUBLE)) "
                  "/ CAST(c_a AS DOUBLE)) * CAST(n AS DOUBLE) "
                  "/ CAST(c_b AS DOUBLE) * CAST(n AS DOUBLE))"), 6)
                  .alias("pmi")))
    top = scored.orderBy(F.col("pmi").desc(), "w1", "w2").limit(k)
    w = Window.orderBy(F.col("pmi").desc(), "w1", "w2")
    return top.withColumn("rank", F.row_number().over(w))


def stratified_fixed_k(docs: DataFrame, k: int = 10,
                       strata_col: str = "lang",
                       id_col: str = "doc_id") -> DataFrame:
    """Exactly-k-per-stratum deterministic sample: rank rows inside each
    stratum by md5 of the id (a content-independent uniform order) and
    keep the first k — the eval-set / human-review draw where every
    stratum must contribute a FIXED count, vs hash_sample's fixed RATE
    (which leaves small strata empty and big strata oversized).

    Re-running on the same data returns the same rows (seedless md5
    order); adding documents only displaces rows whose hash falls below
    the new arrivals'. Scale shape: one window per stratum — the sort
    spreads across the stratum key space; no global order."""
    from pyspark.sql import Window
    h = F.md5(F.concat(F.lit("sfk:"), F.col(id_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col))
    return (docs.select(strata_col, id_col, h.alias("h"))
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k)
            .select(strata_col, id_col, F.col("rk").cast("int").alias("rk")))


def mixture_epochs(docs: DataFrame, budget_tokens: int,
                   weights_ppm: dict[str, int],
                   source_col: str = "source",
                   text_col: str = "text") -> DataFrame:
    """Training-mixture epoch accounting: given per-source mixture
    weights (parts-per-million) and a total token budget, how many
    tokens each source must contribute and how many passes (epochs)
    over its available tokens that implies — the planning table behind
    a data recipe (weights from mixture_sampling_rates, shards from
    pack_shards).

    All integer arithmetic: needed = budget * ppm DIV 1e6, epochs_x100 =
    ceil(100 * needed / available) — the 2dp fixed-point epoch count an
    engineer actually reads (203 -> 2.03 passes, the over-1 signal that
    a source will repeat). Sources absent from ``weights_ppm`` get
    weight 0. One aggregation over the corpus; the weight table is a
    literal map."""
    from amundsendatabuilder_spark.functions.text import tokens
    from amundsendatabuilder_spark.session import ensure_parallelism
    avail = (ensure_parallelism(docs)
             .groupBy(source_col)
             .agg(F.sum(F.size(tokens(F.lower(F.col(text_col)))))
                  .cast("long").alias("avail_tokens")))
    wmap = F.create_map(*[F.lit(x) for kv in weights_ppm.items()
                          for x in kv])
    needed = F.expr(f"CAST({budget_tokens} AS BIGINT) * ppm DIV 1000000")
    return (avail
            .withColumn("ppm", F.coalesce(wmap[F.col(source_col)], F.lit(0))
                        .cast("long"))
            .withColumn("needed_tokens", needed)
            # corpus-level-empty denominator (ANSI aborts on DIV 0): a
            # source the recipe demands tokens FROM but whose docs are
            # all empty has avail_tokens = 0 — no finite epoch count
            # satisfies it, so the row reads NULL (visibly
            # unsatisfiable) instead of killing the planning table
            # (r14 degenerate-corpus sweep)
            .withColumn("epochs_x100",
                        F.expr("CASE WHEN needed_tokens = 0 THEN 0 "
                               "WHEN avail_tokens = 0 THEN NULL "
                               "ELSE (100 * needed_tokens "
                               "+ avail_tokens - 1) DIV avail_tokens END")
                        .cast("long")))


def class_keywords(docs: DataFrame, class_col: str = "lang", k: int = 5,
                   min_count: int = 5,
                   text_col: str = "text") -> DataFrame:
    """Top-k distinctive tokens per class (c-TF-IDF): token frequency
    within the class, damped by how many classes the token appears in —
    the corpus-insight pass behind "what characterizes each source /
    language / cluster" reports (BERTopic's class-based TF-IDF applied
    to corpus strata).

    score = (c_tc / total_c) * ln(n_classes / df_t), every input an
    exact integer, the ratio one fixed double expression rounded 6dp,
    ties broken by token. Per-class counts are map-side combinable; the
    rank window runs only over tokens that survived min_count, and the
    class-df table is tiny (distinct tokens x classes)."""
    from pyspark.sql import Window

    from amundsendatabuilder_spark.functions.scalars import round_half_away
    from amundsendatabuilder_spark.functions.text import tokens
    from amundsendatabuilder_spark.session import ensure_parallelism
    tok = (ensure_parallelism(docs)
           .select(F.col(class_col).alias("cls"),
                   F.explode(tokens(F.lower(F.col(text_col)))).alias("tok")))
    counts = (tok.groupBy("cls", "tok")
              .agg(F.count(F.lit(1)).alias("c")).localCheckpoint())
    totals = counts.groupBy("cls").agg(F.sum("c").alias("total"))
    dfreq = counts.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_classes = counts.select("cls").distinct().count()
    scored = (counts.where(F.col("c") >= min_count)
              .join(F.broadcast(totals), "cls")
              .join(F.broadcast(dfreq), "tok")
              .select("cls", "tok", "c",
                      round_half_away(
                          F.expr(f"(CAST(c AS DOUBLE) / CAST(total AS "
                                 f"DOUBLE)) * ln(CAST({n_classes} AS "
                                 f"DOUBLE) / CAST(df AS DOUBLE))"), 6)
                      .alias("score")))
    w = Window.partitionBy("cls").orderBy(F.col("score").desc(), "tok")
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("cls", "tok", "c", "score",
                    F.col("rank").cast("int").alias("rank")))


def corpus_digest(docs: DataFrame, group_col: str = "source",
                  id_col: str = "doc_id", text_col: str = "text",
                  buckets: int = 64) -> DataFrame:
    """Order-free content digest per corpus partition — a two-level
    Merkle fold that certifies "these two corpus versions are
    byte-identical" (or pinpoints which source changed) without moving
    any text: per-doc md5 → per-bucket digest of the SORTED doc hashes →
    per-group digest of the bucket digests.

    Two levels, not one giant string_agg: at 100 TB a single
    concat-of-all-hashes per source would funnel each source's hashes
    through one reducer row; bucketing by doc_id % buckets bounds every
    concatenated string to n/buckets·32 chars and the second level folds
    only ``buckets`` rows per group. Sorting the hashes (not arrival
    order) is what makes the digest insensitive to partitioning/shuffle
    order. Output: (group, n_docs, digest).
    """
    h = (docs.select(
        F.col(group_col).alias("grp"),
        (F.col(id_col) % buckets).alias("bucket"),
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":"),
                       F.md5(F.col(text_col)))).alias("h")))
    b = (h.groupBy("grp", "bucket")
         .agg(F.count(F.lit(1)).alias("n"),
              F.md5(F.concat_ws("", F.array_sort(F.collect_list("h"))))
              .alias("bh")))
    return (b.groupBy("grp")
            .agg(F.sum("n").alias("n_docs"),
                 F.md5(F.concat_ws("", F.transform(
                     F.array_sort(F.collect_list(F.struct("bucket", "bh"))),
                     lambda s: s["bh"]))).alias("digest"))
            .withColumnRenamed("grp", group_col))


def feature_hashing(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", hex_chars: int = 2) -> DataFrame:
    """Hashing-trick featurizer (Weinberger et al. 2009): each token
    hashes into one of 16^hex_chars buckets with a ±1 sign drawn from
    the next hash character, and a document's sparse feature vector is
    the signed count per bucket — the fixed-width, vocabulary-free text
    featurization that needs NO fitted dictionary, so it parallelizes
    embarrassingly at 100 TB (one tokenize + one (doc, bucket)
    map-side-combinable aggregation; the unsigned-collision bias the
    sign trick cancels in expectation).

    md5-based (engine-identical hex in Spark/DuckDB/Trino), buckets kept
    AS hex prefixes — a string key shuffles the same bytes an int would
    and skips a base conversion on both engines. Output: sparse
    (doc_id, bucket, val) rows with val ≠ 0.
    """
    h = F.md5(F.col("tok").cast("binary"))
    rows = (docs.select(F.col(id_col).alias("doc_id"),
                        F.explode(tokens(F.lower(F.col(text_col))))
                        .alias("tok"))
            .select("doc_id",
                    F.substring(h, 1, hex_chars).alias("bucket"),
                    F.when(F.substring(h, hex_chars + 1, 1)
                           .isin(*"01234567"), 1).otherwise(-1)
                    .alias("sign")))
    return (rows.groupBy("doc_id", "bucket")
            .agg(F.sum("sign").cast("long").alias("val"))
            .where(F.col("val") != 0))


def feature_hashing_bits(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", bits: int = 18,
                         bigrams: bool = True) -> DataFrame:
    """fastText-class hashed featurizer at power-of-two widths (r11
    verdict item #6 — the width-ladder config): feature units are word
    unigrams PLUS adjacent word bigrams (the fastText wordNgrams=2
    recipe), each hashed into one of 2^bits integer buckets (top 60 md5
    bits mod 2^bits — exact in signed 64-bit) with the ±1 sign trick of
    ``feature_hashing``. Output: sparse (doc_id, bucket, val), val ≠ 0.

    The hex-prefix ``feature_hashing`` stays the oracle-pinned default
    (16^k widths, string buckets replayable in DuckDB); this form fills
    the 2^18/2^20 rungs between hex gridpoints for production sizing.
    Same 100 TB shape: one tokenize + one map-side-combinable
    (doc, bucket) aggregation, no fitted dictionary. The 2^bits bucket
    space is a register width — checked at plan time."""
    from amundsendatabuilder_spark.operators.profiling import (
        require_register_width)
    require_register_width(1 << bits,
                           "hashed feature/weight register (2^bits)")
    toked = docs.select(F.col(id_col).alias("doc_id"),
                        tokens(F.lower(F.col(text_col))).alias("_toks"))
    gram_arr = F.col("_toks")
    if bigrams:
        # guard the 0/1-token case: sequence(1, 0) steps DOWN ([1, 0])
        # because Spark defaults the step to -1 when start > stop, so an
        # unguarded bigram lambda indexes _toks[1] on a short array —
        # INVALID_ARRAY_INDEX under ANSI mode, phantom NULL buckets
        # otherwise. Short docs contribute unigrams only.
        gram_arr = F.concat(
            F.col("_toks"),
            F.expr("CASE WHEN size(_toks) >= 2 THEN "
                   "transform(sequence(1, size(_toks) - 1), "
                   "i -> concat(_toks[i-1], ' ', _toks[i])) "
                   "ELSE CAST(array() AS ARRAY<STRING>) END"))
    h = F.md5(F.col("gram").cast("binary"))
    rows = (toked.select("doc_id", F.explode(gram_arr).alias("gram"))
            .select("doc_id",
                    (F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
                     % F.lit(1 << bits)).alias("bucket"),
                    F.when(F.substring(h, 16, 1).isin(*"01234567"), 1)
                    .otherwise(-1).alias("sign")))
    return (rows.groupBy("doc_id", "bucket")
            .agg(F.sum("sign").cast("long").alias("val"))
            .where(F.col("val") != 0))


def dataset_card(docs: DataFrame, group_col: str = "source",
                 id_col: str = "doc_id", text_col: str = "text",
                 lang_col: str = "lang") -> DataFrame:
    """Per-source dataset card — the one-table corpus summary a data
    release ships: (source, n_docs, total_tokens, dup_ppm, p50_tokens,
    top_lang). Every statistic is exact and order-free: token counts are
    whitespace counts, duplication is 1 − distinct-fingerprint ratio in
    integer ppm, the median is discrete (value at row ⌈n/2⌉), and the
    dominant language is a (count DESC, lang ASC) argmax via
    min-of-struct — no float, no sampling, so two corpus builds produce
    byte-identical cards iff the corpora match.

    Plan: one scan derives (tokens, fingerprint); one group aggregate
    per statistic family (counts+distinct, rank-window median, language
    argmax), joined back on the group key — shuffles carry (group,
    scalar) rows only."""
    d = docs.select(
        F.col(group_col).alias("grp"), F.col(lang_col).alias("lang"),
        F.col(id_col).alias("o"),
        token_count_ws(F.col(text_col)).alias("n_tok"),
        fingerprint_md5(F.col(text_col)).alias("fp"))
    base = (d.groupBy("grp")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tok").alias("total_tokens"),
                 F.countDistinct("fp").alias("n_distinct")))
    ranked = (d.select("grp", "n_tok", "o")
              .withColumn("rn", F.row_number().over(
                  Window.partitionBy("grp").orderBy("n_tok", "o")))
              .withColumn("n", F.count(F.lit(1)).over(
                  Window.partitionBy("grp"))))
    med = (ranked.where(F.col("rn") == F.expr("(n + 1) DIV 2"))
           .groupBy("grp").agg(F.min("n_tok").alias("p50_tokens")))
    lng = (d.groupBy("grp", "lang").agg(F.count(F.lit(1)).alias("c"))
           .groupBy("grp")
           .agg(F.min(F.struct((-F.col("c")).alias("nc"), F.col("lang")))
                .alias("m"))
           .select("grp", F.col("m.lang").alias("top_lang")))
    return (base.join(med, "grp").join(lng, "grp")
            .select(F.col("grp").alias(group_col), "n_docs",
                    "total_tokens",
                    F.expr("(n_docs - n_distinct) * 1000000 DIV n_docs")
                    .alias("dup_ppm"),
                    "p50_tokens", "top_lang"))


def bpe_apply(docs: DataFrame, merges: DataFrame, iters: int,
              text_col: str = "text") -> DataFrame:
    """Apply a learned BPE merge table to a corpus and report subword
    compression per document: (doc_id, n_words, n_subwords) — the encode
    side of the tokenizer whose training pass is ``bpe_merges``
    (together they close the train→encode loop in-engine).

    The corpus text is never folded row-by-row: encoding factors through
    the DISTINCT-token vocabulary (identical words encode identically),
    so the merge folds run once per distinct word and a broadcast join
    carries (word → subword count) back onto the exploded token stream —
    at 100 TB the vocabulary is 10^7 rows while the corpus is 10^11, a
    four-orders-of-magnitude saving over per-occurrence encoding.
    ``merges`` holds at most one row per iteration 1..iters (the shape
    ``bpe_merges`` emits — degenerate corpora legitimately skip
    iterations, so absent rows are identity passes, mirroring
    training's null-struct guard: each iteration's merge frame is
    max-aggregated to exactly one possibly-null row, so an empty
    iteration can never crossJoin the vocabulary away); each fold is
    the same greedy non-overlapping pass as training, applied in merge
    order.
    """
    tok_stream = docs.select(
        F.col("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"))
    encoded = _bpe_encode_vocab(tok_stream, merges, iters)
    return (tok_stream.join(F.broadcast(encoded), "tok")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.sum("n_sub").alias("n_subwords")))


def _bpe_encode_vocab(tok_stream: DataFrame, merges: DataFrame,
                      iters: int) -> DataFrame:
    """The distinct-vocabulary encode core shared by ``bpe_apply`` and
    ``bpe_fertility_report``: (tok, n_sub) — each DISTINCT word folded
    through the merge table once (broadcast back onto occurrences)."""
    words = (tok_stream.select("tok").distinct()
             .select("tok", F.filter(F.split(F.col("tok"), ""),
                                     lambda t: t != "").alias("syms")))
    merge_fold = (
        "aggregate(syms, CAST(array() AS ARRAY<STRING>), (acc, x) -> "
        "IF(size(acc) > 0 AND element_at(acc, -1) = a AND x = b, "
        "concat(slice(acc, 1, size(acc) - 1), array(concat(a, b))), "
        "concat(acc, array(x))))")
    for i in range(1, iters + 1):
        # 1-row aggregate (null struct when the iteration is absent) —
        # never an empty frame, so the crossJoin preserves every word
        m = (merges.where(F.col("it") == i)
             .agg(F.max(F.struct("sym_a", "sym_b")).alias("m"))
             .select(F.col("m.sym_a").alias("a"), F.col("m.sym_b").alias("b")))
        words = (words.crossJoin(F.broadcast(m))
                 .select("tok",
                         F.when(F.col("a").isNotNull(), F.expr(merge_fold))
                         .otherwise(F.col("syms")).alias("syms")))
    return words.select("tok", F.size("syms").cast("long").alias("n_sub"))


def bpe_fertility_report(docs: DataFrame, merges: DataFrame, iters: int,
                         text_col: str = "text",
                         group_col: str = "source") -> DataFrame:
    """Tokenizer evaluation per corpus slice: apply a learned BPE merge
    table and report, per ``group_col``, (n_docs, n_words, n_subwords,
    n_token_chars, fertility, chars_per_subword) — fertility
    (subwords per word) and compression (chars per subword) are THE two
    numbers a tokenizer review reads before committing a vocabulary to
    a 100 TB training run: a slice whose fertility is 2x the corpus
    mean pays 2x the sequence length for the same text. Ratios are one
    exact-integer division each (6dp), never float accumulations.

    Scale shape is ``bpe_apply``'s: merge folds run once per DISTINCT
    word, the (word -> subword count) map broadcasts back onto the
    exploded occurrence stream, and the per-slice report is one
    map-side-combinable aggregate of (long, long, long) counters."""
    from amundsendatabuilder_spark.functions.scalars import round_half_away
    tok_stream = docs.select(
        F.col("doc_id"), F.col(group_col).alias("_grp"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"))
    encoded = _bpe_encode_vocab(tok_stream, merges, iters)
    return (tok_stream.join(F.broadcast(encoded), "tok")
            .groupBy("_grp")
            .agg(F.countDistinct("doc_id").alias("n_docs"),
                 F.count(F.lit(1)).alias("n_words"),
                 F.sum("n_sub").alias("n_subwords"),
                 F.sum(F.length("tok")).cast("long")
                 .alias("n_token_chars"))
            .select(F.col("_grp").alias(group_col), "n_docs", "n_words",
                    "n_subwords", "n_token_chars",
                    round_half_away(
                        F.col("n_subwords").cast("double")
                        / F.col("n_words").cast("double"), 6)
                    .alias("fertility"),
                    round_half_away(
                        F.col("n_token_chars").cast("double")
                        / F.col("n_subwords").cast("double"), 6)
                    .alias("chars_per_subword"))
            .orderBy(group_col))


def quality_decile_table(docs: DataFrame, n_deciles: int = 10,
                         text_col: str = "text") -> DataFrame:
    """Production decile/threshold table — the register-sketch twin of
    ``quality_decile_profile`` with NO corpus-wide window (the exact
    ntile formulation is its verification oracle; this is the form that
    runs at 100 TB).

    The quality score is 4-dp-quantized, so score×10⁴ has at most 10001
    distinct values: per-score registers are EXACT and SUM-mergeable
    across shards/days (the ``histogram_registers`` family,
    sketches.py:327, with width=1 over the quantized domain). Decile
    boundary k = min score whose cumulative register count reaches
    ⌈k·N/10⌉ — provably the same value that sits at row ⌈k·N/10⌉ of the
    exact (score, id) total order, which is what the DuckDB twin
    computes by sorting.

    Output, one row per decile k: ``cut_q`` (boundary score ×10⁴) and
    the cumulative lift stats at that cut — docs / tokens / distinct
    fingerprints at-or-below it, plus ppm shares — read as "cutting the
    corpus at decile k's score keeps X docs, Y tokens, Z of the
    duplicate mass".

    Plan shape: one derive scan (cached projection: three longs + one
    hash per doc, released before return), two register aggregations
    (score, and min-score per fingerprint for the cumulative-distinct
    curve), then ONE window over the ≤10001-row register table —
    bounded cardinality regardless of corpus size, never a corpus sort
    — and a 10-row boundary join. The register table is eagerly
    localCheckpointed (the graph_algo persist-then-release convention),
    so the per-doc cache is unpersisted before return and the returned
    plan references only the bounded registers; corpus totals read off
    the registers' own sums rather than a third corpus scan.
    """
    from pyspark import StorageLevel
    d = docs.select(
        round_half_away(quality_score(F.col(text_col)) * 10000, 0)
        .cast("long").alias("qi"),
        token_count_ws(F.col(text_col)).alias("n_tok"),
        fingerprint_md5(F.col(text_col)).alias("fp"))
    d = d.persist(StorageLevel.MEMORY_AND_DISK)
    regs = d.groupBy("qi").agg(F.count(F.lit(1)).alias("c"),
                               F.sum("n_tok").alias("tk"))
    # cumulative-distinct curve: each fingerprint counts once, at its
    # minimum score — count(DISTINCT fp | qi <= cut) = #fps with q0 <= cut
    fp_regs = (d.groupBy("fp").agg(F.min("qi").alias("qi"))
               .groupBy("qi").agg(F.count(F.lit(1)).alias("fc")))
    # eager checkpoint materializes both register aggregations (the two
    # scans share the cached d), then the per-doc cache is released — the
    # returned plan holds only the ≤10001-row register snapshot
    merged = (regs.join(fp_regs, "qi", "left").na.fill({"fc": 0})
              .localCheckpoint())
    d.unpersist()
    # window over the register table: <= 10001 rows by construction
    # (score domain), NOT a corpus window
    wq = Window.orderBy("qi").rowsBetween(Window.unboundedPreceding, 0)
    cum = merged.select(
        "qi",
        F.sum("c").over(wq).alias("cc"),
        F.sum("tk").over(wq).alias("ct"),
        F.sum("fc").over(wq).alias("cf"))
    # corpus totals = the registers' own sums (no third corpus scan)
    totals = merged.agg(F.sum("c").alias("n"), F.sum("tk").alias("tok_n"))
    ks = (totals.select(
        F.explode(F.sequence(F.lit(1), F.lit(n_deciles))).alias("decile"),
        "n", "tok_n")
        .withColumn("need", F.expr(
            f"CAST(-((-decile * n) DIV {n_deciles}) AS BIGINT)")))  # ceil
    bounds = (cum.join(F.broadcast(ks), F.col("cc") >= F.col("need"))
              .groupBy("decile", "n", "tok_n")
              .agg(F.min("qi").alias("cut_q")))
    out = (bounds.join(F.broadcast(cum), bounds.cut_q == cum.qi)
           .select(
               F.col("decile").cast("int").alias("decile"),
               F.col("cut_q").cast("long").alias("cut_q"),
               F.col("cc").cast("long").alias("n_docs_le"),
               F.expr("cc * 1000000 DIV n").cast("long").alias("pct_docs_ppm"),
               F.col("ct").cast("long").alias("total_tokens_le"),
               # corpus-level-empty denominator (ANSI aborts on DIV 0):
               # an all-empty-docs corpus has rows (every doc registers
               # at score 0) but tok_n = 0 — 0 of 0 tokens is 0 ppm,
               # same convention as mixture_sampling_rates' token_share.
               # n needs no guard: a joined row implies cc >= need >= 1
               # so regs were nonempty and n = sum(c) >= 1
               F.expr("CASE WHEN tok_n > 0 THEN ct * 1000000 DIV tok_n "
                      "ELSE 0 END").cast("long")
               .alias("pct_tokens_ppm"),
               F.col("cf").cast("long").alias("n_distinct_le"),
               F.expr("(cc - cf) * 1000000 DIV cc").cast("long")
               .alias("dup_ppm_le")))
    return out


def quality_decile_profile(docs: DataFrame, n_deciles: int = 10,
                           id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """Curation lift curve: documents bucketed into quality-score
    deciles (exact ntile over a TOTAL order — score ties broken by id,
    the equi_depth_histogram trick that makes bucket membership
    engine-reproducible), each decile profiled with the signals a
    filter-threshold decision needs: doc count, token mass, exact
    duplicate rate (ppm), and mean length. Read it as "if I cut below
    decile k, I lose X% of tokens and Y% of the duplicates" — the table
    behind every quality-threshold choice in corpus curation.

    One derive scan + one ntile window + one decile aggregate; only
    (decile, scalar) rows shuffle after the window. The ntile is a
    corpus-wide single-partition sort: this form is the VERIFICATION
    oracle — the production path at scale is ``quality_decile_table``,
    which derives the same boundaries from bounded per-score registers
    with no corpus window."""
    d = docs.select(
        F.col(id_col).alias("o"),
        quality_score(F.col(text_col)).alias("q"),
        token_count_ws(F.col(text_col)).alias("n_tok"),
        fingerprint_md5(F.col(text_col)).alias("fp"))
    w = Window.orderBy("q", "o")
    bucketed = d.withColumn("decile", F.ntile(n_deciles).over(w))
    return (bucketed.groupBy("decile")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tok").alias("total_tokens"),
                 F.countDistinct("fp").alias("n_distinct"),
                 F.expr("(count(*) - count(DISTINCT fp)) * 1000000"
                        " DIV count(*)").alias("dup_ppm"),
                 F.expr("sum(n_tok) DIV count(*)").alias("avg_tokens"))
            .withColumn("decile", F.col("decile").cast("int")))


def ngram_diversity(docs: DataFrame, ns: tuple[int, ...] = (1, 2, 3),
                    group_col: str = "source",
                    text_col: str = "text") -> DataFrame:
    """Distinct-n diversity per group (the distinct-1/2/3 metric of Li et
    al. 2016): for each n, the count of distinct word n-grams, the total
    n-gram occurrences, and their ratio in integer ppm — the standard
    corpus-diversity axis of a dataset card (low distinct_ppm = heavy
    repetition/templating inside that source). Returns one row per
    (group, n): (source, n, distinct_ngrams, total_ngrams, distinct_ppm).

    Scale shape: text is tokenized ONCE (the token array is
    localCheckpoint-materialized, then all n shingle arrays derive from
    it in a single struct explode); the shuffle carries (group, n, gram)
    with a map-side partial count, and the distinct count is the
    second-level count over the first groupBy — never countDistinct over
    raw rows. This is the EXACT audit; ``hll_distinct_sketch`` is the
    one-pass mergeable-register path when +-2%% suffices.
    """
    from amundsendatabuilder_spark.functions.text import (
        shingles_from_tokens, tokens)
    from amundsendatabuilder_spark.session import ensure_parallelism
    d = (ensure_parallelism(docs)
         .select(F.col(group_col).alias("grp"),
                 tokens(F.lower(F.col(text_col))).alias("_toks"))
         .localCheckpoint())
    def tagged(n: int) -> F.Column:
        # single-arg lambda: transform() feeds the element index to a
        # second parameter, so a two-arg lambda would shadow ``n``
        return F.transform(shingles_from_tokens(F.col("_toks"), n),
                           lambda g: F.struct(F.lit(n).alias("n"),
                                              g.alias("gram")))

    struct_arrays = [tagged(n) for n in ns]
    grams = (d.select("grp", F.explode(F.concat(*struct_arrays)).alias("s"))
             .select("grp", F.col("s.n").alias("n"),
                     F.col("s.gram").alias("gram")))
    counts = (grams.groupBy("grp", "n", "gram")
              .agg(F.count(F.lit(1)).cast("long").alias("c")))
    return (counts.groupBy("grp", "n")
            .agg(F.count(F.lit(1)).cast("long").alias("distinct_ngrams"),
                 F.sum("c").cast("long").alias("total_ngrams"))
            .withColumn("distinct_ppm", F.expr(
                "distinct_ngrams * CAST(1000000 AS BIGINT) DIV total_ngrams"))
            .select(F.col("grp").alias(group_col), "n", "distinct_ngrams",
                    "total_ngrams", "distinct_ppm"))


def oov_rate_report(docs: DataFrame, vocab_size: int = 1000,
                    group_col: str = "source",
                    text_col: str = "text") -> DataFrame:
    """Out-of-vocabulary rate per group against a corpus-trained top-V
    vocabulary (count DESC, token ties): the coverage check run after a
    tokenizer/vocab build — a source with high oov_ppm will fragment
    into byte-fallbacks and waste context length. Returns
    (source, total_tokens, oov_tokens, oov_ppm), exact integer ppm.

    Scale shape: tokens collapse to (group, token) counts FIRST
    (map-side combinable; rows bounded by groups x vocab, not corpus
    tokens); the global vocabulary cut is a distributed top-V
    (TakeOrderedAndProject over the token-count table — never a global
    sort of the corpus) that then broadcasts into a map-side membership
    join.
    """
    from amundsendatabuilder_spark.functions.text import tokens
    from amundsendatabuilder_spark.session import ensure_parallelism
    st = (ensure_parallelism(docs)
          .select(F.col(group_col).alias("grp"),
                  F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"))
          .groupBy("grp", "tok")
          .agg(F.count(F.lit(1)).cast("long").alias("c"))
          .localCheckpoint())
    vocab = (st.groupBy("tok").agg(F.sum("c").alias("n"))
             .orderBy(F.col("n").desc(), "tok").limit(vocab_size)
             .select("tok", F.lit(True).alias("_in_vocab")))
    return (st.join(F.broadcast(vocab), "tok", "left")
            .groupBy("grp")
            .agg(F.sum("c").cast("long").alias("total_tokens"),
                 F.sum(F.when(F.col("_in_vocab").isNull(), F.col("c"))
                       .otherwise(F.lit(0))).cast("long")
                 .alias("oov_tokens"))
            .withColumn("oov_ppm", F.expr(
                "oov_tokens * CAST(1000000 AS BIGINT) DIV total_tokens"))
            .select(F.col("grp").alias(group_col), "total_tokens",
                    "oov_tokens", "oov_ppm"))


def zipf_alpha_report(docs: DataFrame, top_r: int = 20,
                      group_col: str = "source",
                      text_col: str = "text") -> DataFrame:
    """Zipf exponent per group: least-squares slope of ln(frequency) on
    ln(rank) over the group's top ``top_r`` tokens — natural corpora sit
    near alpha ~= 1; a source whose alpha collapses toward 0 is
    templated/synthetic (flat frequencies), one far above 1 is
    degenerate repetition. The distribution-shape complement of
    ``ngram_diversity`` on a dataset card. Returns
    (source, n_points, top_count, zipf_alpha), alpha NULL when fewer
    than 2 points or zero x-variance.

    Determinism/scale shape: token counts collapse map-side; the rank
    window partitions by GROUP over the (group, token) count table
    (bounded by per-source vocabulary, never corpus tokens); ln values
    are quantized ONCE to 1e6-scaled BIGINT so every regression
    sufficient statistic is an exact, order-free integer sum
    (trend_slopes' contract), and the single double division rounds to
    6dp. Domain: |X| <= ln(top_r)*1e6, |Y| <= ln(total_tokens)*1e6 —
    n*SXY stays far inside int64 for any real corpus.
    """
    from amundsendatabuilder_spark.functions.scalars import round_half_away
    from amundsendatabuilder_spark.functions.text import tokens
    from amundsendatabuilder_spark.session import ensure_parallelism
    st = (ensure_parallelism(docs)
          .select(F.col(group_col).alias("grp"),
                  F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"))
          .groupBy("grp", "tok")
          .agg(F.count(F.lit(1)).cast("long").alias("c")))
    w = Window.partitionBy("grp").orderBy(F.col("c").desc(), "tok")
    ranked = (st.withColumn("rank", F.row_number().over(w))
              .where(F.col("rank") <= top_r))
    q = (ranked.select(
        "grp", "c",
        round_half_away(F.log(F.col("rank").cast("double")) * 1e6, 0)
        .cast("long").alias("x"),
        round_half_away(F.log(F.col("c").cast("double")) * 1e6, 0)
        .cast("long").alias("y")))
    sums = (q.groupBy("grp")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.max("c").alias("top_count"),
                 F.sum("x").alias("sx"), F.sum("y").alias("sy"),
                 F.sum(F.col("x") * F.col("y")).alias("sxy"),
                 F.sum(F.col("x") * F.col("x")).alias("sxx")))
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (sums.select(
        F.col("grp").alias(group_col),
        F.col("n").alias("n_points"), "top_count",
        F.when(den > 0, round_half_away(
            -(num.cast("double") / den.cast("double")), 6))
        .alias("zipf_alpha")))


def heaps_law_fit(docs: DataFrame, n_checkpoints: int = 8,
                  group_col: str = "source",
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Heaps'-law vocabulary-growth exponent per group: least-squares
    slope of ln(vocabulary size) on ln(cumulative token count) measured
    at ``n_checkpoints`` document-id checkpoints — natural corpora grow
    sublinearly (beta ~= 0.4-0.6); beta near 1 means near-disjoint
    vocabularies (noise/IDs), beta near 0 means a closed template
    vocabulary. The growth-curve complement of ``zipf_alpha_report`` on
    a dataset card (the two exponents are theoretically linked,
    beta ~= 1/alpha).

    Returns (source, n_points, total_tokens, vocab_total, heaps_beta);
    beta NULL when fewer than 2 distinct checkpoints or zero x-variance.

    Determinism/scale shape: NO corpus-wide window and NO per-prefix
    rescan. One token pass yields (group, token, first_doc=min(doc_id))
    — map-side combinable, bounded by per-group vocabulary — and one
    doc pass yields per-doc token counts. Checkpoints are fixed integer
    quantiles of the group's doc-id RANGE (min + ((max-min)*j) DIV C,
    deduplicated), so both cumulative statistics collapse to a
    broadcast-join + conditional aggregation: tokens_at(c) =
    SUM(n_toks WHERE doc_id <= c), vocab_at(c) = COUNT(first_doc <= c).
    ln values quantize ONCE to 1e6-scaled BIGINT so the regression
    sufficient statistics are exact, order-free integer sums
    (trend_slopes' contract); the single double division rounds to 6dp.
    """
    from amundsendatabuilder_spark.functions.text import tokens as _toks
    from amundsendatabuilder_spark.session import ensure_parallelism
    base = ensure_parallelism(docs).select(
        F.col(group_col).alias("grp"), F.col(id_col).alias("did"),
        F.col(text_col).alias("txt"))
    # Pass 1: per-token first occurrence (by doc id) within each group.
    first = (base
             .select("grp", "did",
                     F.explode(_toks(F.lower(F.col("txt")))).alias("tok"))
             .groupBy("grp", "tok")
             .agg(F.min("did").alias("first_doc"),
                  F.count(F.lit(1)).cast("long").alias("c")))
    # Pass 2: per-doc token counts (no explode needed — array size).
    per_doc = base.select(
        "grp", "did",
        F.size(_toks(F.lower(F.col("txt")))).cast("long").alias("n_toks"))
    # Checkpoints: integer quantiles of each group's doc-id range.
    bounds = per_doc.groupBy("grp").agg(
        F.min("did").alias("lo"), F.max("did").alias("hi"))
    js = F.sequence(F.lit(1), F.lit(int(n_checkpoints)))
    cps = (bounds
           .select("grp", "lo", "hi", F.explode(js).alias("j"))
           .select("grp", F.expr(
               f"lo + ((hi - lo) * j) DIV {int(n_checkpoints)}")
               .cast("long").alias("cp"))
           .distinct())
    # Conditional aggregation against the broadcast checkpoint table.
    toks_at = (per_doc.join(F.broadcast(cps), "grp")
               .where(F.col("did") <= F.col("cp"))
               .groupBy("grp", "cp")
               .agg(F.sum("n_toks").alias("n_tok")))
    vocab_at = (first.join(F.broadcast(cps), "grp")
                .where(F.col("first_doc") <= F.col("cp"))
                .groupBy("grp", "cp")
                .agg(F.count(F.lit(1)).cast("long").alias("n_vocab")))
    pts = (toks_at.join(F.broadcast(vocab_at), ["grp", "cp"])
           .where((F.col("n_tok") > 0) & (F.col("n_vocab") > 0))
           .select("grp",
                   round_half_away(F.log(F.col("n_tok").cast("double"))
                                   * 1e6, 0).cast("long").alias("x"),
                   round_half_away(F.log(F.col("n_vocab").cast("double"))
                                   * 1e6, 0).cast("long").alias("y"),
                   "n_tok", "n_vocab"))
    sums = (pts.groupBy("grp")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.max("n_tok").alias("total_tokens"),
                 F.max("n_vocab").alias("vocab_total"),
                 F.sum("x").alias("sx"), F.sum("y").alias("sy"),
                 F.sum(F.col("x") * F.col("y")).alias("sxy"),
                 F.sum(F.col("x") * F.col("x")).alias("sxx")))
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (sums.select(
        F.col("grp").alias(group_col),
        F.col("n").alias("n_points"), "total_tokens", "vocab_total",
        F.when(den > 0, round_half_away(
            num.cast("double") / den.cast("double"), 6))
        .alias("heaps_beta")))


def token_js_divergence(docs: DataFrame, group_col: str = "source",
                        text_col: str = "text") -> DataFrame:
    """Pairwise Jensen-Shannon divergence (nats) between the unigram
    token distributions of every group pair — the distributional
    complement of ``cross_source_overlap`` (which sketches *distinct*
    vocabulary overlap but is blind to frequency shape). JS = 0 for
    identical mixtures, ln 2 for disjoint vocabularies; a mixture-design
    tool pairs it with ``temperature_mixture_plan`` to avoid upweighting
    near-duplicate sources.

    Returns (source_a, source_b, n_common_tokens, js_divergence) for
    a < b, js rounded to 6dp.

    Determinism/scale shape: NO full outer join per pair. Token counts
    collapse map-side to (group, token, c); the vocab-sized self-join on
    token emits one row per co-occurring (pair, token) — bounded by
    sources^2 x vocab, hash-partitioned on token, never corpus rows.
    Tokens private to one side contribute exactly p*ln2, folded in
    analytically via the pair's co-occurring probability mass (an exact
    integer sum), so nothing is scanned twice. Per-token KL terms are
    quantized ONCE to 1e9-scaled BIGINT so the cross-partition sums are
    exact, order-free integers; the two closing double ops (missing-mass
    ln2 terms + final 0.5x) round to 6dp.
    """
    from amundsendatabuilder_spark.functions.text import tokens as _toks
    from amundsendatabuilder_spark.session import ensure_parallelism
    st = (ensure_parallelism(docs)
          .select(F.col(group_col).alias("grp"),
                  F.explode(_toks(F.lower(F.col(text_col)))).alias("tok"))
          .groupBy("grp", "tok")
          .agg(F.count(F.lit(1)).cast("long").alias("c")))
    totals = st.groupBy("grp").agg(F.sum("c").cast("long").alias("n"))
    a = st.select(F.col("grp").alias("ga"), "tok",
                  F.col("c").alias("ca"))
    b = st.select(F.col("grp").alias("gb"), F.col("tok").alias("tokb"),
                  F.col("c").alias("cb"))
    co = (a.join(b, (F.col("tok") == F.col("tokb"))
                 & (F.col("ga") < F.col("gb")))
          .join(F.broadcast(totals.select(F.col("grp").alias("ga"),
                                          F.col("n").alias("na"))), "ga")
          .join(F.broadcast(totals.select(F.col("grp").alias("gb"),
                                          F.col("n").alias("nb"))), "gb"))
    p = F.col("ca").cast("double") / F.col("na").cast("double")
    q = F.col("cb").cast("double") / F.col("nb").cast("double")
    term_a = p * F.log(F.lit(2.0) * p / (p + q))
    term_b = q * F.log(F.lit(2.0) * q / (p + q))
    terms = co.select(
        "ga", "gb", "na", "nb", "ca", "cb",
        round_half_away(term_a * 1e9, 0).cast("long").alias("qa"),
        round_half_away(term_b * 1e9, 0).cast("long").alias("qb"))
    agg = (terms.groupBy("ga", "gb")
           .agg(F.count(F.lit(1)).cast("long").alias("n_common"),
                F.sum("ca").cast("long").alias("co_mass_a"),
                F.sum("cb").cast("long").alias("co_mass_b"),
                F.sum("qa").alias("sqa"), F.sum("qb").alias("sqb")))
    # Complete pair frame (|groups|^2 rows, broadcast): pairs sharing no
    # token still emit a row — their divergence is exactly ln 2.
    ta = totals.select(F.col("grp").alias("ga"), F.col("n").alias("na"))
    tb = totals.select(F.col("grp").alias("gb"), F.col("n").alias("nb"))
    pairs = ta.join(F.broadcast(tb), F.col("ga") < F.col("gb"))
    sums = (pairs.join(agg, ["ga", "gb"], "left")
            .select("ga", "gb", "na", "nb",
                    F.coalesce("n_common", F.lit(0)).cast("long")
                    .alias("n_common"),
                    F.coalesce("co_mass_a", F.lit(0)).cast("long")
                    .alias("co_mass_a"),
                    F.coalesce("co_mass_b", F.lit(0)).cast("long")
                    .alias("co_mass_b"),
                    F.coalesce("sqa", F.lit(0)).cast("long").alias("sqa"),
                    F.coalesce("sqb", F.lit(0)).cast("long")
                    .alias("sqb")))
    ln2 = 0.6931471805599453
    miss_a = ((F.col("na") - F.col("co_mass_a")).cast("double")
              / F.col("na").cast("double")) * F.lit(ln2)
    miss_b = ((F.col("nb") - F.col("co_mass_b")).cast("double")
              / F.col("nb").cast("double")) * F.lit(ln2)
    js = F.lit(0.5) * (F.col("sqa").cast("double") / F.lit(1e9) + miss_a
                       + F.col("sqb").cast("double") / F.lit(1e9)
                       + miss_b)
    return (sums.select(
        F.col("ga").alias("source_a"), F.col("gb").alias("source_b"),
        F.col("n_common").alias("n_common_tokens"),
        round_half_away(js, 6).alias("js_divergence")))


def vocab_coverage_curve(docs: DataFrame,
                         ks: tuple[int, ...] = (1, 3, 10, 100, 1000,
                                                10000),
                         group_col: str = "source",
                         text_col: str = "text") -> DataFrame:
    """Vocabulary coverage curve per group: the fraction of all token
    OCCURRENCES covered by the group's top-k most frequent tokens, for
    each k in ``ks`` — the tokenizer-budget planning view (how large a
    vocab before coverage plateaus) complementing ``oov_rate_report``
    (which fixes one V) and ``vocab_topk`` (which lists the tokens).

    Returns (source, k, vocab_size, covered_occurrences,
    total_occurrences, coverage) — coverage 6dp, k capped at the
    group's vocabulary so k > vocab rows read coverage = 1.

    Determinism/scale shape: NO corpus-vocab sort. Token counts
    collapse map-side; the count-of-counts REGISTER table (grp,
    count, tokens-with-count, mass) is bounded by distinct frequency
    values — O(sqrt(group tokens)) — and the cumulative window runs
    over it, never over the vocabulary. Top-k mass is
    mass_above + (k - tokens_above) * boundary_count, exact integers
    throughout (ties at the boundary all carry the same count, so the
    value is tiebreak-free); the single coverage division rounds 6dp.
    The DuckDB oracle derives the same numbers INDEPENDENTLY by
    sorting tokens and summing the top k — the two derivations agree
    only if the register algebra is right.
    """
    from amundsendatabuilder_spark.functions.text import tokens as _toks
    from amundsendatabuilder_spark.session import ensure_parallelism
    st = (ensure_parallelism(docs)
          .select(F.col(group_col).alias("grp"),
                  F.explode(_toks(F.lower(F.col(text_col)))).alias("tok"))
          .groupBy("grp", "tok")
          .agg(F.count(F.lit(1)).cast("long").alias("c")))
    reg = (st.groupBy("grp", "c")
           .agg(F.count(F.lit(1)).cast("long").alias("m"))
           .withColumn("mass", F.col("c") * F.col("m")))
    w = (Window.partitionBy("grp").orderBy(F.col("c").desc())
         .rowsBetween(Window.unboundedPreceding, -1))
    cum = reg.select(
        "grp", "c", "m",
        F.coalesce(F.sum("m").over(w), F.lit(0)).cast("long")
        .alias("tokens_above"),
        F.coalesce(F.sum("mass").over(w), F.lit(0)).cast("long")
        .alias("mass_above"))
    tot = reg.groupBy("grp").agg(
        F.sum("m").cast("long").alias("vocab"),
        F.sum("mass").cast("long").alias("total"))
    spark = docs.sparkSession
    ks_df = spark.createDataFrame([(int(k),) for k in sorted(ks)],
                                  "k long")
    j = (cum.join(F.broadcast(tot), "grp")
         .join(F.broadcast(ks_df),
               F.expr("tokens_above < least(k, vocab) "
                      "AND least(k, vocab) <= tokens_above + m")))
    covered = (F.col("mass_above")
               + (F.least("k", "vocab") - F.col("tokens_above"))
               * F.col("c"))
    return (j.select(
        F.col("grp").alias(group_col), "k",
        F.col("vocab").alias("vocab_size"),
        covered.alias("covered_occurrences"),
        F.col("total").alias("total_occurrences"),
        round_half_away(covered.cast("double")
                        / F.col("total").cast("double"), 6)
        .alias("coverage")))


def readability_report(docs: DataFrame, group_col: str = "source",
                       text_col: str = "text") -> DataFrame:
    """Flesch reading-ease profile per group: mean words-per-sentence,
    syllables-per-word, and the Flesch score
    206.835 - 1.015*(W/S) - 84.6*(Y/W) — the readability row of a
    dataset card (very low scores flag legalese/boilerplate, very high
    ones flag fragment/listing noise; both are curation signals
    orthogonal to quality_score's length/diversity blend).

    Syllables use the standard regex proxy: maximal [aeiouy]+ runs in
    the lowercased text (exact syllabification needs a dictionary; the
    run-count proxy is the classic implementable stand-in and is
    identical in both engines). Sentences are maximal [.!?]+ runs,
    floored at 1 per doc. Docs with zero words are excluded.

    Returns (source, n_docs, words_per_sentence, syllables_per_word,
    flesch_reading_ease), all 4dp.

    Determinism/scale shape: one map-side pass computes per-doc (W, S,
    Y) as exact integers; each per-doc ratio/score quantizes to
    1e4-scaled BIGINT before the group sum (order-free), and the three
    closing mean divisions round 4dp. No shuffle beyond the group
    aggregation.
    """
    from amundsendatabuilder_spark.functions.text import tokens as _toks
    from amundsendatabuilder_spark.session import ensure_parallelism
    t = F.col(text_col)
    wc = F.size(_toks(t)).cast("long")
    sc = F.greatest(
        F.size(F.regexp_extract_all(t, F.lit(r"[.!?]+"), 0)).cast("long"),
        F.lit(1))
    yc = F.size(F.regexp_extract_all(F.lower(t),
                                     F.lit(r"[aeiouy]+"), 0)).cast("long")
    per = (ensure_parallelism(docs)
           .select(F.col(group_col).alias("grp"),
                   wc.alias("w"), sc.alias("s"), yc.alias("y"))
           .where(F.col("w") > 0))
    wps = F.col("w").cast("double") / F.col("s").cast("double")
    ypw = F.col("y").cast("double") / F.col("w").cast("double")
    flesch = (F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * ypw)
    q = per.select(
        "grp",
        round_half_away(wps * 1e4, 0).cast("long").alias("q_wps"),
        round_half_away(ypw * 1e4, 0).cast("long").alias("q_ypw"),
        round_half_away(flesch * 1e4, 0).cast("long").alias("q_fl"))
    s = q.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("q_wps").alias("s_wps"), F.sum("q_ypw").alias("s_ypw"),
        F.sum("q_fl").alias("s_fl"))
    nd = F.col("n_docs").cast("double") * 1e4
    return s.select(
        F.col("grp").alias(group_col), "n_docs",
        round_half_away(F.col("s_wps").cast("double") / nd, 4)
        .alias("words_per_sentence"),
        round_half_away(F.col("s_ypw").cast("double") / nd, 4)
        .alias("syllables_per_word"),
        round_half_away(F.col("s_fl").cast("double") / nd, 4)
        .alias("flesch_reading_ease"))


def ngram_entropy_rate(docs: DataFrame, group_col: str = "source",
                       text_col: str = "text") -> DataFrame:
    """Token-level entropy rate per group: unigram entropy H(X), bigram
    joint entropy H(X1,X2), and the conditional entropy rate
    H(X2|X1) = H(X1,X2) - H(X1) in nats — the frequency-weighted
    complexity measure ``ngram_diversity`` (distinct-n ratios) cannot
    see: a source that repeats one sentence has high distinct-1 ratio
    early but near-zero entropy rate, flagging templated/degenerate
    text for the dataset card.

    Returns (source, n_unigrams, n_bigrams, unigram_entropy,
    bigram_entropy, entropy_rate), entropies 6dp nats; groups with no
    bigram (all docs single-token) emit NULL bigram/rate columns.

    Determinism/scale shape: unigram and within-doc-adjacent bigram
    counts collapse map-side (the bigram explode is positions-1 per
    doc, never a self-join); each -p ln p term quantizes to 1e9-scaled
    BIGINT over the count REGISTERS (bounded by vocab / bigram vocab),
    summing order-free; the closing subtraction works on the quantized
    integers so H(X1,X2) - H(X1) is exactly consistent with the
    reported entropies.
    """
    from amundsendatabuilder_spark.functions.text import (
        shingles_from_tokens, tokens as _toks)
    from amundsendatabuilder_spark.session import ensure_parallelism
    base = (ensure_parallelism(docs)
            .select(F.col(group_col).alias("grp"),
                    _toks(F.lower(F.col(text_col))).alias("toks")))

    def _entropy(counted: DataFrame, n_name: str, h_name: str):
        tot = counted.groupBy("grp").agg(
            F.sum("c").cast("long").alias("nt"))
        p = F.col("c").cast("double") / F.col("nt").cast("double")
        return (counted.join(F.broadcast(tot), "grp")
                .select("grp", "nt",
                        round_half_away(-p * F.log(p) * 1e9, 0)
                        .cast("long").alias("t"))
                .groupBy("grp")
                .agg(F.max("nt").alias(n_name),
                     F.sum("t").alias(h_name)))

    uni = (base.select("grp", F.explode("toks").alias("g"))
           .groupBy("grp", "g")
           .agg(F.count(F.lit(1)).cast("long").alias("c")))
    bi = (base.select("grp",
                      F.explode(shingles_from_tokens(F.col("toks"), 2))
                      .alias("g"))
          .groupBy("grp", "g")
          .agg(F.count(F.lit(1)).cast("long").alias("c")))
    hu = _entropy(uni, "n_unigrams", "hu_e9")
    hb = _entropy(bi, "n_bigrams", "hb_e9")
    j = hu.join(hb, "grp", "left")
    return j.select(
        F.col("grp").alias(group_col), "n_unigrams",
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        round_half_away(F.col("hu_e9").cast("double") / 1e9, 6)
        .alias("unigram_entropy"),
        round_half_away(F.col("hb_e9").cast("double") / 1e9, 6)
        .alias("bigram_entropy"),
        round_half_away((F.col("hb_e9") - F.col("hu_e9")).cast("double")
                        / 1e9, 6).alias("entropy_rate"))


def hapax_report(docs: DataFrame, group_col: str = "source",
                 text_col: str = "text") -> DataFrame:
    """Lexical-richness tail profile per group: the share of vocabulary
    that occurs exactly once (hapax legomena) and the share of total
    token mass those words carry — the classic corpus-linguistics pair
    to ``zipf_alpha_report``/``heaps_law_fit``: natural text keeps a
    fat hapax tail (~40-60% of vocab); templated/synthetic text
    collapses it, OCR noise inflates it. A tokenizer trainer reads
    hapax_mass directly as "token mass the vocab cut will shatter".

    Returns (source, vocab_size, total_tokens, hapax_count,
    hapax_vocab_ppm, hapax_mass_ppm) — exact integer ppm via DIV.

    Determinism/scale shape: token counts collapse map-side; the
    hapax statistics come entirely from the count-of-counts REGISTER
    (vocab_coverage_curve's table — bounded by distinct frequencies),
    so nothing beyond the (group, token) aggregation touches corpus
    rows and every output is exact integer arithmetic.
    """
    from amundsendatabuilder_spark.functions.text import tokens as _toks
    from amundsendatabuilder_spark.session import ensure_parallelism
    st = (ensure_parallelism(docs)
          .select(F.col(group_col).alias("grp"),
                  F.explode(_toks(F.lower(F.col(text_col)))).alias("tok"))
          .groupBy("grp", "tok")
          .agg(F.count(F.lit(1)).cast("long").alias("c")))
    reg = (st.groupBy("grp", "c")
           .agg(F.count(F.lit(1)).cast("long").alias("m")))
    s = reg.groupBy("grp").agg(
        F.sum("m").cast("long").alias("vocab_size"),
        F.sum(F.col("c") * F.col("m")).cast("long").alias("total_tokens"),
        F.sum(F.when(F.col("c") == 1, F.col("m")).otherwise(0))
        .cast("long").alias("hapax_count"))
    return s.select(
        F.col("grp").alias(group_col), "vocab_size", "total_tokens",
        "hapax_count",
        F.expr("hapax_count * CAST(1000000 AS BIGINT) DIV vocab_size")
        .alias("hapax_vocab_ppm"),
        F.expr("hapax_count * CAST(1000000 AS BIGINT) DIV total_tokens")
        .alias("hapax_mass_ppm"))


def keyness_g2(docs: DataFrame, k: int = 5, group_col: str = "source",
               text_col: str = "text") -> DataFrame:
    """Dunning log-likelihood (G²) keyness: for each group, the k
    tokens whose frequency most significantly deviates from the rest
    of the corpus — the statistically-grounded "what characterizes
    this source" (Dunning 1993), robust on rare words where
    ``class_keywords``' tf-idf flavor over-rewards hapaxes. G² is the
    2x2 contingency likelihood ratio: token-in-group vs token-in-rest.

    Returns (source, rank, token, g2, overused) — top ``k`` per group
    by (g2 DESC, token), g2 6dp, overused TRUE when the group uses the
    token MORE than the corpus rate. Only tokens PRESENT in the group
    are scored (a completely avoided token would need a groups x
    corpus-vocab dense grid — at 100 TB that cross product is the
    wrong default; under-use of present tokens still surfaces).

    Determinism/scale shape: one (group, token) count pass; corpus
    token totals join back on token (vocab-sized, hash-partitioned);
    each token's G² is ONE fixed double expression over exact integer
    cell counts (no cross-partition float sums), rounded 6dp with the
    token as tiebreak before the per-group top-k window (bounded by
    per-group vocabulary, never corpus tokens — zipf_alpha_report's
    window contract).
    """
    from amundsendatabuilder_spark.functions.text import tokens as _toks
    from amundsendatabuilder_spark.session import ensure_parallelism
    st = (ensure_parallelism(docs)
          .select(F.col(group_col).alias("grp"),
                  F.explode(_toks(F.lower(F.col(text_col)))).alias("tok"))
          .groupBy("grp", "tok")
          .agg(F.count(F.lit(1)).cast("long").alias("a")))
    ng = st.groupBy("grp").agg(F.sum("a").cast("long").alias("n_g"))
    ct = st.groupBy("tok").agg(F.sum("a").cast("long").alias("c_tot"))
    n = st.agg(F.sum("a").cast("long").alias("n"))
    j = (st.join(F.broadcast(ng), "grp").join(ct, "tok")
         .crossJoin(F.broadcast(n)))
    a = F.col("a").cast("double")
    b = (F.col("c_tot") - F.col("a")).cast("double")
    c_ = (F.col("n_g") - F.col("a")).cast("double")
    d_ = (F.col("n") - F.col("n_g") - F.col("c_tot")
          + F.col("a")).cast("double")
    nn = F.col("n").cast("double")
    ea = F.col("n_g").cast("double") * F.col("c_tot").cast("double") / nn
    eb = ((nn - F.col("n_g").cast("double"))
          * F.col("c_tot").cast("double") / nn)
    ec = (F.col("n_g").cast("double")
          * (nn - F.col("c_tot").cast("double")) / nn)
    ed = ((nn - F.col("n_g").cast("double"))
          * (nn - F.col("c_tot").cast("double")) / nn)

    def term(o, e):
        return F.when(o > 0, o * F.log(o / e)).otherwise(F.lit(0.0))

    g2 = round_half_away(
        2.0 * (term(a, ea) + term(b, eb) + term(c_, ec) + term(d_, ed)),
        6)
    scored = j.select("grp", "tok", g2.alias("g2"),
                      (a > ea).alias("overused"))
    w = Window.partitionBy("grp").orderBy(F.col("g2").desc(), "tok")
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(F.col("grp").alias(group_col),
                    F.col("rank").cast("int").alias("rank"),
                    F.col("tok").alias("token"), "g2", "overused"))
