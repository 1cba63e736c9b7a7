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
