"""Cross-engine deterministic hashing helpers for MinHash / SimHash.

Engine-native hashes (Spark ``xxhash64``, DuckDB ``hash``) differ between
engines, so sketch operators that must be oracle-verifiable hash through
``md5`` (identical lowercase hex in Spark/DuckDB/Trino) and compare hex
strings lexicographically — a uniform permutation of the shingle space,
which is all MinHash needs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


def md5_minhash(shingle_col, seed: int) -> Column:
    """Seeded hash of a shingle: md5('<seed>:<shingle>') hex string.
    min() over these per document = one MinHash signature row."""
    return F.md5(F.concat(F.lit(f"{seed}:"), _c(shingle_col)))


def nibble_value(char_col) -> Column:
    """Hex char -> 0..15 via position lookup (codegen-friendly, no UDF,
    and expressible identically in ANSI SQL as instr('0123..f', c)-1)."""
    return (F.instr(F.lit("0123456789abcdef"), _c(char_col)) - 1).cast("int")
