"""Vector column functions over ``array<float|double>`` embedding columns.

Implemented with higher-order functions (``zip_with`` + ``aggregate``) so the
arithmetic stays in the JVM with no Python/Arrow round-trip. ``aggregate``
folds left-to-right, making float sums order-deterministic — required for
oracle parity and for reproducible ANN ranking.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


def dot(a, b) -> Column:
    """Dot product of two equal-length arrays, computed in double."""
    prods = F.zip_with(_c(a), _c(b),
                       lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a) -> Column:
    sq = F.transform(_c(a), lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def l2_distance(a, b) -> Column:
    """Euclidean distance in double precision. Left-to-right ``aggregate``
    fold over the squared differences, then sqrt — the same accumulation
    order DuckDB's ``list_distance`` uses, which keeps rounded values
    engine-identical (verified by the PQ oracle's hash gate)."""
    sq = F.zip_with(_c(a), _c(b),
                    lambda x, y: (x.cast("double") - y.cast("double"))
                    * (x.cast("double") - y.cast("double")))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def random_planes(dim: int, n: int, seed: int = 7) -> list[list[float]]:
    """``n`` Gaussian random hyperplanes of dimension ``dim`` for
    random-hyperplane (sign-of-dot) LSH. Seeded NumPy PCG64 so the planes
    — and therefore every signature and bucket — are bit-reproducible
    across runs and machines; generated driver-side once (n×dim floats,
    kilobytes) and baked into the plan as literals."""
    import numpy as np
    rng = np.random.default_rng(seed)
    return [[float(x) for x in row] for row in rng.normal(size=(n, dim))]


def cosine_similarity(a, b, norm_a: Column | None = None,
                      norm_b: Column | None = None) -> Column:
    """Cosine similarity in double precision; NULL when either norm is 0.

    Pass precomputed ``norm_a``/``norm_b`` columns on hot paths (top-k
    scans recompute the query norm |corpus| times otherwise); results are
    bit-identical since the same sqrt values feed the same division."""
    na = norm_a if norm_a is not None else l2_norm(a)
    nb = norm_b if norm_b is not None else l2_norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb))
