"""Online (streaming) deduplication with explicit per-key state.

The batch dedup operators (operators/dedup.py) answer "which of these
documents are duplicates of each other"; a training-data INGEST pipeline
also needs the online form — "have I ever seen this document before" —
so newly arriving corpus shards drop repeats against all history without
re-scanning it. Spark's built-in ``dropDuplicates`` on a stream keeps
state but cannot express richer policies (count duplicates, TTL state,
emit audit rows), so this is the engine's ``applyInPandasWithState``
custom stateful operator (the API the reference's surface never reaches;
its Kafka extractor is stateless — SURVEY §2.8).

Scale shape: state lives in the state store partitioned by fingerprint —
one boolean+count per distinct document ever seen; the shuffle carries
(fingerprint, doc_id) only. With RocksDB state backend this runs
indefinitely; pair with a processing-time TTL when the dedup horizon is
bounded (e.g. drop state after 30 days).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FIRST_SEEN_OUTPUT = "fingerprint string, doc_id long, dup_rank long"
_STATE_SCHEMA = "n_seen long"


def _first_seen_fn(key, pdf_iter, state: GroupState):
    """Emit the first-ever row per fingerprint; track duplicate count in
    state. Runs once per (micro-batch, key) group with an Arrow batch
    iterator — O(state) memory is one long per key."""
    import pandas as pd

    (n_seen,) = state.get if state.exists else (0,)
    was_new = n_seen == 0
    min_id = None
    for pdf in pdf_iter:
        if len(pdf) == 0:
            continue
        if was_new:
            chunk_min = int(pdf["doc_id"].min())
            min_id = chunk_min if min_id is None else min(min_id, chunk_min)
        n_seen += len(pdf)
    state.update((n_seen,))
    if was_new and min_id is not None:
        # min across ALL Arrow chunks of this batch's group, so the keeper
        # is deterministic regardless of batch chunking
        yield pd.DataFrame({"fingerprint": [key[0]],
                            "doc_id": [min_id],
                            "dup_rank": [0]})


NEAR_DUP_OUTPUT = "band int, band_sig string, doc_a long, doc_b long"
_ND_STATE_SCHEMA = "keeper long"


def _near_dup_fn(key, pdf_iter, state: GroupState):
    """Per (band, band_sig) bucket: the first doc ever seen becomes the
    bucket keeper (state = one long); every later doc in the bucket emits
    a candidate pair (keeper, doc). Within a micro-batch, ids are sorted
    so the keeper is deterministic regardless of Arrow chunking."""
    import pandas as pd

    keeper = state.get[0] if state.exists else None
    ids: list[int] = []
    for pdf in pdf_iter:
        ids.extend(int(x) for x in pdf["doc_id"])
    ids.sort()
    out_b = []
    for d in ids:
        if keeper is None:
            keeper = d
        elif d != keeper:
            out_b.append(d)
    state.update((keeper,))
    if out_b:
        yield pd.DataFrame({"band": [key[0]] * len(out_b),
                            "band_sig": [key[1]] * len(out_b),
                            "doc_a": [keeper] * len(out_b),
                            "doc_b": out_b})


def near_dup_candidates(docs: DataFrame, num_hashes: int = 16,
                        bands: int = 4, shingle_size: int = 3) -> DataFrame:
    """Online NEAR-duplicate candidates — the streaming twin of the batch
    ``dedup.minhash_lsh_pairs`` path: each arriving document's MinHash
    band signatures (computed as a pure per-row projection,
    ``dedup.minhash_signatures_projected`` — no pre-state aggregation, so
    the query stays single-stateful) key a state store holding one keeper
    doc_id per (band, band_sig) bucket; a document landing in any
    already-seen bucket emits (keeper, doc) in that micro-batch.

    Output mirrors the batch candidate stage pre-distinct: a pair can
    surface through several bands — dedupe and exact-verify downstream
    (e.g. per-batch in foreachBatch), exactly as the batch pipeline
    verifies LSH candidates. State is one long per distinct bucket ever
    seen; the stateful shuffle carries (band, band_sig, doc_id) only —
    document text never reaches the state store, the shape that runs
    indefinitely on RocksDB state at ingest scale."""
    from amundsendatabuilder_spark.operators.dedup import (
        band_sig_rows, minhash_signatures_projected)
    sigs = minhash_signatures_projected(docs, num_hashes=num_hashes,
                                        shingle_size=shingle_size)
    keyed = band_sig_rows(sigs, num_hashes, bands)
    return (keyed.groupBy("band", "band_sig")
            .applyInPandasWithState(
                _near_dup_fn,
                outputStructType=NEAR_DUP_OUTPUT,
                stateStructType=_ND_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            ))


def first_seen_filter(docs: DataFrame, key_col: str = "fingerprint") -> DataFrame:
    """Streaming first-seen dedup: one output row per distinct ``key_col``
    ever observed, emitted in the micro-batch where it first appears.
    Input needs (fingerprint, doc_id) columns; the full document payload
    should be joined back AFTER dedup (semi-join on the emitted keys) so
    text never enters the state store or the stateful shuffle."""
    return (
        docs.groupBy(key_col)
        .applyInPandasWithState(
            _first_seen_fn,
            outputStructType=FIRST_SEEN_OUTPUT,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


LAST_WRITER_OUTPUT = "k long, seq long, val double"
_LW_STATE_SCHEMA = "seq long"


def _last_writer_fn(key, pdf_iter, state: GroupState):
    """Per key: track the highest sequence ever seen (state = one long);
    emit a row only in micro-batches where the winner ADVANCES — the
    change-feed of a last-writer-wins materialized view. Within a batch
    the winner is the max (seq, val) PAIR — seq ties break toward the
    larger value — so the emitted row is deterministic regardless of
    Arrow chunking even when one batch carries several rows at the
    winning sequence (idxmax alone would pick whichever chunk arrived
    first)."""
    import pandas as pd

    best = state.get[0] if state.exists else None
    new_seq, new_val = None, None
    for pdf in pdf_iter:
        if len(pdf) == 0:
            continue
        for s, v in zip(pdf["seq"].to_numpy(), pdf["val"].to_numpy()):
            s, v = int(s), float(v)
            if (new_seq is None or s > new_seq
                    or (s == new_seq and v > new_val)):
                new_seq, new_val = s, v
    if new_seq is not None and (best is None or new_seq > best):
        state.update((new_seq,))
        yield pd.DataFrame({"k": [key[0]], "seq": [new_seq],
                            "val": [new_val]})


def last_writer_filter(rows: DataFrame) -> DataFrame:
    """Streaming last-writer-wins upsert view — the online form of
    asof.cdc_apply: input (k, seq, val) change rows; output one row per
    key per micro-batch IN WHICH ITS WINNER ADVANCES, carrying the new
    winning (seq, val). Downstream sinks apply the change feed as an
    upsert (foreachBatch MERGE), giving a continuously-maintained
    snapshot without ever rescanning history.

    State is ONE long (the winning seq) per key — values don't live in
    the state store, so arbitrarily wide payloads cost state nothing
    beyond the emitted rows; the stateful shuffle carries (k, seq, val)
    only. Late or replayed rows with seq ≤ the stored winner are
    absorbed silently (idempotent under at-least-once delivery)."""
    return (
        rows.groupBy("k")
        .applyInPandasWithState(
            _last_writer_fn,
            outputStructType=LAST_WRITER_OUTPUT,
            stateStructType=_LW_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
