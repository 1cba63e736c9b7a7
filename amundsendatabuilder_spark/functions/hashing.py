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


MINHASH_MOD = 1 << 32


def minhash_constants(num_hashes: int) -> tuple[list[int], list[int]]:
    """(A, B) multiplier/offset tables for the universal-hash MinHash
    family h_j(x) = (chunk(x) * A_j + B_j) mod 2^32.

    A_j odd and < 2^31 so chunk (< 2^32) * A_j stays under 2^63 — exact in
    signed 64-bit arithmetic on BOTH engines (Spark long, DuckDB BIGINT);
    golden-ratio/Murmur mixing constants give independent permutations.
    Fixed literals mirrored into the DuckDB oracle SQL.

    Register contract (r11 verdict item #5): num_hashes is the width of
    every downstream minhash register — the per-doc signature array, the
    band-signature rows (bands <= num_hashes), the streaming per-window
    min registers, and ALSO the literal table baked into the plan here —
    so the single choke point every minhash consumer passes through
    enforces the raise-not-degrade width contract at plan time."""
    from amundsendatabuilder_spark.operators.profiling import (
        require_register_width)
    require_register_width(num_hashes,
                           "minhash signature/band registers (num_hashes)")
    a = [((0x9E3779B1 * (2 * j + 1)) % 0x8000_0000) | 1
         for j in range(num_hashes)]
    b = [(0x85EBCA77 * j) % 0x8000_0000 for j in range(num_hashes)]
    return a, b


def md5_chunks(col) -> list[Column]:
    """Four independent uniform 32-bit integers from ONE md5 evaluation —
    8-hex substrings parsed with conv(,16,10). The md5 is the expensive
    part of MinHash at corpus scale; every derived hash function reuses
    these chunks through minhash_constants arithmetic instead of paying
    another digest."""
    h = F.md5(_c(col))
    return [F.conv(F.substring(h, i * 8 + 1, 8), 16, 10).cast("long")
            for i in range(4)]


def nibble_value(char_col) -> Column:
    """Hex char -> 0..15 via position lookup (codegen-friendly, no UDF,
    and expressible identically in ANSI SQL as instr('0123..f', c)-1)."""
    return (F.instr(F.lit("0123456789abcdef"), _c(char_col)) - 1).cast("int")


MERSENNE_31 = (1 << 31) - 1


def udh_positions(col, n: int, width: int) -> list[Column]:
    """n independent hash positions in [0, width) from ONE md5 — the
    bucket/bit coordinates for count-min rows and Bloom probes.

    Row j draws from md5 chunk j%4 (independent 32-bit values), passed
    through h_j = (chunk * A_j + B_j) mod (2^31 - 1) mod width. The
    PRIME modulus matters: reducing mod 2^32 and then mod a power-of-two
    width would keep only the low bits of the chunk, making every row's
    bucket a function of chunk mod width — perfectly correlated rows,
    which silently turns a depth-d sketch into a depth-1 one. All math
    stays under 2^63, exact in signed 64-bit on both engines."""
    a, b = minhash_constants(n)
    chunks = md5_chunks(col)
    return [((chunks[j % 4] * F.lit(a[j]) + F.lit(b[j]))
             % F.lit(MERSENNE_31) % F.lit(width)) for j in range(n)]


def udh_positions_sql(col: str, n: int, width: int) -> list[str]:
    """ANSI twin of ``udh_positions``: one SQL expression per row j,
    referencing column ``col`` (DuckDB hex cast idiom)."""
    a, b = minhash_constants(n)
    return [
        f"(CAST('0x' || substr(md5({col}), {(j % 4) * 8 + 1}, 8) AS BIGINT)"
        f" * {a[j]} + {b[j]}) % {MERSENNE_31} % {width}"
        for j in range(n)]
