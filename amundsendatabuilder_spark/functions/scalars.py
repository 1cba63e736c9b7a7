"""Scalar column functions mirroring the reference's transformer surface.

Each function documents the reference behavior it reproduces (file:line into
/root/reference) and is implemented as a built-in-function composition so
Catalyst folds/pushes it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


def epoch_from_string(col, fmt: str = "yyyy-MM-dd'T'HH:mm:ss") -> Column:
    """Timestamp string -> epoch seconds; 0 on parse failure.

    reference: databuilder/transformer/timestamp_string_to_epoch.py:30-44
    (strptime -> timestamp(); returns 0 when parsing fails).
    Spark: ``try_to_timestamp`` yields NULL on failure (even under ANSI
    mode, where plain unix_timestamp would raise) -> coalesce to 0.
    Assumes UTC session timezone (set in session.py) for parity with the
    reference's naive-datetime arithmetic.
    """
    ts = F.try_to_timestamp(_c(col), F.lit(fmt))
    return F.coalesce(F.unix_timestamp(ts), F.lit(0)).cast("long")


def round_half_away(col, n: int) -> Column:
    """Round a double to n decimals with half-away-from-zero semantics
    computed ON THE SCALED BINARY DOUBLE — bit-for-bit what DuckDB/C++
    ``std::round(x * 10^n) / 10^n`` produces, unlike Spark's ``round``
    which HALF_UPs the shortest decimal string (BigDecimal.valueOf).
    Required for oracle value-hash parity on every float column.
    """
    p = F.lit(float(10 ** n))
    scaled = _c(col).cast("double") * p
    pos = F.floor(scaled + F.lit(0.5))
    neg = -F.floor(-scaled + F.lit(0.5))
    return (F.when(scaled >= 0, pos).otherwise(neg).cast("double") / p)


def literal_replace(col, pairs: list[tuple[str, str]]) -> Column:
    """Apply ordered literal (not regex!) replacements.

    reference: databuilder/transformer/regex_str_replace_transformer.py:41-42
    — despite the class name it calls ``str.replace`` (literal). We therefore
    use ``F.replace`` (literal) rather than ``regexp_replace``.
    """
    out = _c(col)
    for search, repl in pairs:
        out = F.replace(out, F.lit(search), F.lit(repl))
    return out


def normalize_tags(col) -> Column:
    """Comma-separated tag string -> array of lowercased, trimmed, non-empty
    tags. reference: databuilder/models/table_metadata.py:34-41 (format_tags:
    lower/strip) and csv split at extractor/csv_extractor.py:17-24."""
    exploded = F.split(_c(col), ",")
    # NOT F.trim: Spark trim strips only ' ' while the reference's
    # str.strip() strips all whitespace (tabs included) — regexp instead
    cleaned = F.transform(
        exploded,
        lambda t: F.lower(F.regexp_replace(t, r"^\s+|\s+$", "")))
    return F.filter(cleaned, lambda t: (t != "") & t.isNotNull())


def template_substitute(template: str, **field_cols) -> Column:
    """'{field}' template substitution from record fields.

    reference: databuilder/transformer/template_variable_substitution_transformer.py:29-33
    (``template.format(**record)``). Implemented as concat of literal chunks
    and columns so it stays inside codegen.
    """
    import re

    parts = re.split(r"\{(\w+)\}", template)
    cols: list[Column] = []
    for i, part in enumerate(parts):
        if i % 2 == 0:
            if part:
                cols.append(F.lit(part))
        else:
            cols.append(_c(field_cols[part]).cast("string"))
    if not cols:
        return F.lit("")
    return F.concat(*cols)


def decode_presto_view(col, columns_schema: str = "array<struct<name:string,type:string>>") -> Column:
    """Presto view definition: base64-encoded JSON -> array of column structs.

    reference: databuilder/extractor/presto_view_metadata_extractor.py:100-115
    (strips the '/* Presto View: ' wrapper, base64-decodes, json-parses
    ``columns``). Spark: regexp_extract + unbase64 + from_json — no UDF.
    """
    payload = F.regexp_extract(_c(col), r"/\* Presto View: ([^*]+) \*/", 1)
    decoded = F.unbase64(payload).cast("string")
    return F.from_json(F.get_json_object(decoded, "$.columns"), columns_schema)
