"""Property-based tests (hypothesis) — beyond the reference's test
strategy (SURVEY §5 notes it has none): cross-engine rounding equivalence,
tag-normalization invariants, Jaccard bounds, key-template injectivity."""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def sp(spark):
    return spark


# module-scope: one Spark action per example would be too slow, so each
# property collects a batch of examples into ONE DataFrame evaluation.

@settings(max_examples=20, deadline=None)
@given(st.lists(st.floats(min_value=-1e9, max_value=1e9,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=30))
def test_round_half_away_equals_duckdb(sp, xs):
    from amundsendatabuilder_spark.functions.scalars import round_half_away
    df = sp.createDataFrame([(float(x),) for x in xs], "x double")
    got = [r[0] for r in df.select(round_half_away("x", 2)).collect()]
    con = duckdb.connect()
    want = [con.execute("SELECT round(?::DOUBLE, 2)", [float(x)]).fetchone()[0]
            for x in xs]
    assert got == want


@settings(max_examples=15, deadline=None)
@given(st.lists(st.text(alphabet="aAbB ,\t", max_size=12), min_size=1, max_size=8))
def test_normalize_tags_invariants(sp, raws):
    from amundsendatabuilder_spark.functions.scalars import normalize_tags
    df = sp.createDataFrame([(",".join(raws),)], "t string")
    out = df.select(normalize_tags("t")).collect()[0][0]
    for tag in out:
        assert tag == tag.lower() == tag.strip()
        assert tag != ""
        assert "," not in tag


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 1000),
                          st.lists(st.sampled_from(["a", "b", "c", "d", "e"]),
                                   min_size=3, max_size=12)),
                min_size=2, max_size=6, unique_by=lambda t: t[0]))
def test_jaccard_bounds_and_symmetry_inputs(sp, docs):
    from amundsendatabuilder_spark.operators.dedup import ngram_jaccard_pairs
    df = sp.createDataFrame([(i, " ".join(words)) for i, words in docs],
                            "doc_id long, text string")
    pairs = ngram_jaccard_pairs(df, threshold=0.0).collect()
    for r in pairs:
        assert 0.0 <= r["jaccard"] <= 1.0
        assert r["doc_a"] < r["doc_b"]


def test_key_template_injective(sp):
    # distinct (db,cluster,schema,table) quadruples -> distinct keys
    from amundsendatabuilder_spark import keys
    rows = [("h", "g", "s", "t"), ("h", "g", "s.t", ""), ("h", "g.s", "", "t"),
            ("hive", "gold", "sch", "tbl")]
    df = sp.createDataFrame(rows, "db string, cl string, sc string, tb string")
    out = [r[0] for r in df.select(
        keys.table_key("db", "cl", "sc", "tb")).collect()]
    assert len(set(out)) == len(out)


def test_pack_shards_invariants(spark):
    """Property: shard_id equals the doc's starting token offset // budget
    within its stratum (recomputed independently), so ids are
    non-decreasing in doc_id order and every shard's token sum stays under
    budget + its largest doc (docs never split)."""
    from amundsendatabuilder_spark.operators.textops import pack_shards
    import random
    rng = random.Random(11)
    docs = [(i, rng.choice(["en", "fr"]), "w " * rng.randrange(1, 120))
            for i in range(200)]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    out = pack_shards(df, budget_tokens=100).collect()
    by_stratum: dict = {}
    for r in out:
        by_stratum.setdefault(r.stratum, []).append(r)
    for stratum, rows in by_stratum.items():
        rows.sort(key=lambda r: r.doc_id)
        offset = 0
        for r in rows:
            assert r.shard_id == offset // 100  # independent recomputation
            offset += r.n_tokens
        for sid in {r.shard_id for r in rows}:
            members = [r for r in rows if r.shard_id == sid]
            total = sum(r.n_tokens for r in members)
            assert total < 100 + max(r.n_tokens for r in members)


def test_chunk_documents_invariants(spark):
    """Property: chunks tile the token array with the configured step;
    every chunk except possibly the last is full; reassembling chunk
    starts covers every token index."""
    from amundsendatabuilder_spark.operators.textops import chunk_documents
    import random
    rng = random.Random(12)
    docs = [(i, "tok " * rng.randrange(1, 300)) for i in range(50)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    n_tokens = {i: t.count("tok") for i, t in docs}
    out = chunk_documents(df, chunk_tokens=64, overlap_tokens=16).collect()
    step = 48
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(n_tokens)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_idx)
        n = n_tokens[doc_id]
        assert [r.chunk_idx for r in rows] == list(range(len(rows)))
        assert len(rows) == (n - 1) // step + 1
        for r in rows[:-1]:
            assert r.n_tokens == 64 or r.chunk_idx * step + r.n_tokens == n
        last = rows[-1]
        assert last.chunk_idx * step + last.n_tokens == n  # tail reaches end


# ---------------------------------------------------------------------------
# Universal-hash position properties (functions/hashing.udh_positions)
# ---------------------------------------------------------------------------

@given(st.integers(min_value=2, max_value=12).map(lambda p: 1 << p),
       st.lists(st.text(alphabet="abcdefgh0123", min_size=1, max_size=12),
                min_size=8, max_size=8, unique=True))
@settings(max_examples=15, deadline=None)
def test_udh_rows_not_collapsed_for_pow2_widths(width, values):
    """Regression for the depth-collapse bug: with a power-of-two width,
    reducing mod 2^32 then mod width made every row's bucket a function
    of the same low bits, so ALL rows collided together whenever two
    values shared them. With the prime intermediate, two values that
    collide in one row must usually disagree in another (rows draw from
    independent md5 chunks)."""
    import hashlib

    from amundsendatabuilder_spark.functions.hashing import (
        MERSENNE_31, minhash_constants)
    a, b = minhash_constants(4)

    def positions(v):
        h = hashlib.md5(v.encode()).hexdigest()
        return tuple((int(h[(j % 4) * 8:(j % 4) * 8 + 8], 16) * a[j] + b[j])
                     % MERSENNE_31 % width for j in range(4))
    pos = [positions(v) for v in values]
    full_collisions = sum(
        1 for i in range(len(pos)) for j in range(i + 1, len(pos))
        if pos[i] == pos[j])
    # 28 pairs, 4 independent rows: P(all-rows collision) ~ (1/width)^4;
    # even at width 4 that is ~0.4% per pair — more than one full
    # collision across 28 pairs means the rows are correlated
    assert full_collisions <= 1


def test_udh_positions_match_sql_text(spark):
    """The Python/Spark expression and the generated SQL text must
    produce identical coordinates — the cross-engine contract every
    sketch oracle relies on."""
    import duckdb
    from pyspark.sql import functions as F

    from amundsendatabuilder_spark.functions.hashing import (
        udh_positions, udh_positions_sql)
    vals = [("tok%d" % i,) for i in range(50)]
    df = spark.createDataFrame(vals, "v string")
    got = df.select("v", *[p.alias(f"p{j}") for j, p in
                           enumerate(udh_positions(F.col("v"), 4, 512))]
                    ).collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", vals)
    exprs = udh_positions_sql("v", 4, 512)
    want = {row[0]: tuple(row[1:]) for row in con.execute(
        "SELECT v, " + ", ".join(exprs) + " FROM t").fetchall()}
    for r in got:
        assert (r.p0, r.p1, r.p2, r.p3) == want[r.v]


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(alphabet="abc", min_size=1, max_size=6),
                min_size=2, max_size=12, unique=True))
def test_fuzzy_match_recall_equals_brute_force(sp, names):
    """SymSpell deletion blocking must find EVERY distance<=1 pair the
    brute-force levenshtein join finds — recall exactly 1.0, on
    adversarially small alphabets where collisions abound."""
    from amundsendatabuilder_spark.operators.dedup import fuzzy_match_pairs
    df = sp.createDataFrame(list(enumerate(names)), "id long, name string")
    got = {(r.id_a, r.id_b, r.distance)
           for r in fuzzy_match_pairs(df, "id", "name").collect()}

    def lev(a, b):
        import functools

        @functools.lru_cache(maxsize=None)
        def d(i, j):
            if i == 0:
                return j
            if j == 0:
                return i
            return min(d(i - 1, j) + 1, d(i, j - 1) + 1,
                       d(i - 1, j - 1) + (a[i - 1] != b[j - 1]))
        return d(len(a), len(b))

    want = set()
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            dd = lev(names[i], names[j])
            if dd <= 1:
                want.add((i, j, dd))
    assert got == want


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=50),
                min_size=1, max_size=20))
def test_budget_selection_prefix_sum_matches_naive(sp, lens):
    """The banded distributed prefix sum must equal the naive global
    (quality desc, doc_id) running total for any corpus shape."""
    from amundsendatabuilder_spark.operators.textops import budget_selection
    rows = [(i, " ".join(f"w{i}x{j % (1 + i % 5)}" for j in range(n)))
            for i, n in enumerate(lens)]
    df = sp.createDataFrame(rows, "doc_id long, text string")
    got = sorted(budget_selection(df, budget_tokens=10**9).collect(),
                 key=lambda r: r.cum_tokens)
    # reconstruct the naive order: quality desc, doc_id asc
    order = sorted(got, key=lambda r: (-r.quality, r.doc_id))
    assert [r.doc_id for r in got] == [r.doc_id for r in order]
    run = 0
    for r in order:
        run += r.n_tokens
        assert r.cum_tokens == run


@settings(max_examples=8, deadline=None)
@given(st.lists(st.text(alphabet="abcd", min_size=1, max_size=6),
                min_size=1, max_size=12))
def test_bpe_merges_match_pure_python_reference(sp, words):
    """bpe_merges == a straightforward pure-Python BPE on the same
    word-frequency table (greedy max pair, ties to the LARGEST (a,b),
    non-overlapping left-to-right merge)."""
    from collections import Counter
    from amundsendatabuilder_spark.operators.textops import bpe_merges

    text = " ".join(words)
    df = sp.createDataFrame([(1, text)], "doc_id long, text string")
    iters = 2
    got = [(r.sym_a, r.sym_b, r.pair_count)
           for r in bpe_merges(df, iters=iters, vocab_size=50)
           .orderBy("it").collect()]

    freq = Counter(w.lower() for w in text.split() if w)
    seqs = {w: list(w) for w in freq}
    want = []
    for _ in range(iters):
        counts = Counter()
        for w, syms in seqs.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += freq[w]
        if not counts:
            break
        best = max(counts, key=lambda p: (counts[p], p[0], p[1]))
        want.append((best[0], best[1], counts[best]))
        a, b = best
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    assert got == want


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 60), st.integers(0, 60))
                .filter(lambda p: p[0] != p[1]),
                min_size=0, max_size=40))
def test_leakage_safe_split_never_splits_an_edge(sp, edges):
    """Every near-dup edge's endpoints land in the same split, and the
    assignment is a total function over the doc set — for ANY pair
    graph (self-loops excluded by construction)."""
    from amundsendatabuilder_spark.operators.curation import (
        leakage_safe_split)
    docs = sp.createDataFrame([(i, "t") for i in range(61)],
                              "doc_id long, text string")
    pairs = sp.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges] or [(0, 0)],
        "doc_a long, doc_b long")
    if not edges:
        pairs = pairs.where(F.col("doc_a") != F.col("doc_b"))
    out = {r.doc_id: r for r in leakage_safe_split(docs, pairs).collect()}
    assert sorted(out) == list(range(61))
    for a, b in edges:
        assert out[a].split == out[b].split, (a, b)
        assert out[a].group_key == out[b].group_key
