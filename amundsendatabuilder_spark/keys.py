"""Deterministic entity-key templates — the reference's de-facto primary-key
system (reference: databuilder/models/table_metadata.py:296-313,249,176-183;
models/watermark.py:23-24; models/user.py:23; models/dashboard/*).

Every downstream join/merge in the graph is an equality join on these string
keys, so they are built with JVM-side ``format_string`` (codegen'd, no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


def database_key(db) -> Column:
    # reference: models/table_metadata.py:303  'database://{db}'
    return F.format_string("database://%s", _c(db))


def cluster_key(db, cluster) -> Column:
    # reference: models/table_metadata.py:308  '{db}://{cluster}'
    return F.format_string("%s://%s", _c(db), _c(cluster))


def schema_key(db, cluster, schema) -> Column:
    # reference: models/table_metadata.py:313  '{db}://{cluster}.{schema}'
    return F.format_string("%s://%s.%s", _c(db), _c(cluster), _c(schema))


def table_key(db, cluster, schema, table) -> Column:
    # reference: models/table_metadata.py:296  '{db}://{cluster}.{schema}/{tbl}'
    return F.format_string("%s://%s.%s/%s", _c(db), _c(cluster), _c(schema), _c(table))


def column_key(db, cluster, schema, table, column) -> Column:
    # reference: models/table_metadata.py:249
    return F.format_string("%s://%s.%s/%s/%s",
                           _c(db), _c(cluster), _c(schema), _c(table), _c(column))


def description_key(start_key, source=None) -> Column:
    """'{start}/_description' for the default source, else
    '{start}/_{source}_description' (reference: models/table_metadata.py:176-183)."""
    if source is None:
        return F.concat(_c(start_key), F.lit("/_description"))
    src = _c(source)
    return F.when(
        src.isNull() | (src == "") | (src == "description"),
        F.concat(_c(start_key), F.lit("/_description")),
    ).otherwise(F.concat(_c(start_key), F.lit("/_"), src, F.lit("_description")))


def stat_key(db, cluster, schema, table, column, stat_type) -> Column:
    # reference: models/table_stats.py:23-24
    return F.format_string("%s://%s.%s/%s/%s/%s/", _c(db), _c(cluster),
                           _c(schema), _c(table), _c(column), _c(stat_type))


def watermark_key(db, cluster, schema, table, part_type) -> Column:
    # reference: models/watermark.py:23-24
    return F.format_string("%s://%s.%s/%s/%s/", _c(db), _c(cluster),
                           _c(schema), _c(table), _c(part_type))


def timestamp_key(db, cluster, schema, table) -> Column:
    # reference: models/table_last_updated.py:20
    return F.format_string("%s://%s.%s/%s/timestamp",
                           _c(db), _c(cluster), _c(schema), _c(table))


def user_key(email) -> Column:
    # reference: models/user.py:23 — the email IS the key
    return _c(email)


def tag_key(tag) -> Column:
    # reference: models/table_metadata.py:46
    return _c(tag)


def dashboard_group_key(product, cluster, group_id) -> Column:
    # reference: models/dashboard/dashboard_metadata.py:56
    return F.format_string("%s_dashboard://%s.%s", _c(product), _c(cluster), _c(group_id))


def dashboard_key(product, cluster, group_id, dashboard_id) -> Column:
    # reference: models/dashboard/dashboard_metadata.py:42
    return F.format_string("%s_dashboard://%s.%s/%s",
                           _c(product), _c(cluster), _c(group_id), _c(dashboard_id))


def dashboard_execution_key(dashboard_key_col, execution_id) -> Column:
    # reference: models/dashboard/dashboard_execution.py:26-32
    return F.concat(_c(dashboard_key_col), F.lit("/execution/"), _c(execution_id))
