"""amundsendatabuilder_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of amundsen-io/amundsendatabuilder.

The reference (``/root/reference``) is a single-process, record-at-a-time
metadata-ETL framework: Extractor -> Transformer -> Loader -> Publisher
(reference: databuilder/task/task.py:49-77).  This package re-expresses that
dataflow as set-level Spark DataFrame algebra:

- ``sources/``   — scans/connectors (CSV, JDBC dialect catalog, REST join,
                   Kafka, generic) returning DataFrames.
- ``models/``    — entity schemas + ``expand()`` functions that turn a model
                   DataFrame into (nodes_df, rels_df) graph DataFrames
                   (reference: databuilder/models/graph_serializable.py).
- ``functions/`` — scalar/vector/text column functions (all JVM-side
                   ``pyspark.sql.functions`` compositions; no row-at-a-time
                   Python UDFs in the hot path).
- ``operators/`` — set-level operators the reference lacks but a 100 TB
                   training-data pipeline needs: dedup (exact / MinHash-LSH /
                   SimHash / n-gram Jaccard / embedding cosine), ANN
                   similarity search, text analysis, multimodal plumbing.
- ``plans/``     — composed multi-join/aggregate plans: the search-document
                   builds (reference: extractor/neo4j_search_data_extractor.py),
                   staleness sweep, publish stamping.
- ``sinks/``     — staged writers (neo4j-shape CSV shards, ES newline-JSON)
                   and foreachPartition publishers.
- ``streaming/`` — Structured Streaming equivalents of the Kafka
                   commit-on-success micro-batch source.

Everything is DataFrame-first so Catalyst handles pushdown, pruning, join
strategy and AQE; the package never hand-schedules what the optimizer does.
"""

__version__ = "0.1.0"
