"""Sinks: staged-file writers (Neo4j-shape CSV shards, ES newline-JSON)
and foreachPartition publishers with the reference's batching/idempotency
semantics (publish tag, create-only labels, atomic finalize)."""
