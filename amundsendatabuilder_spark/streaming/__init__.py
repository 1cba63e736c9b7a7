"""Structured Streaming equivalents of the reference's streaming surface
(the Kafka micro-batch source with commit-on-success,
extractor/kafka_source_extractor.py) plus the windowed/stateful operators a
training-data event pipeline adds on top."""
