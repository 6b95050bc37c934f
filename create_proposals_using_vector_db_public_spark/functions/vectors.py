"""Vector math as pure Column expressions (no UDFs — everything stays in
whole-stage codegen on the JVM).

The reference computes L2 distance inside FAISS ``IndexFlatL2`` (exact brute
force, reference ``app.py:90,180``) and a display-only cosine via sklearn
(``app.py:184``). Here both are ``zip_with``/``aggregate`` expressions, so a
kNN scan is a single codegen'd stage — at 100 TB this is a narrow map over
the vectors table with a per-partition top-k reduce, no Python worker and no
shuffle of the raw vectors.

All helpers cast elements to double first: the source columns are
``array<float>`` and float-typed lambda arithmetic would accumulate float32
rounding that diverges from any double-based oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: Column | str) -> Column:
    col = F.col(col) if isinstance(col, str) else col
    return F.transform(col, lambda x: x.cast("double"))


def vec_lit(values: Sequence[float]) -> Column:
    """A literal vector as an array<double> Column."""
    return F.array(*[F.lit(float(v)) for v in values])


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def l2_dist_sq(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_dist(a: Column, b: Column) -> Column:
    return F.sqrt(l2_dist_sq(a, b))


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either norm is zero (the reference's
    zero-vector rows for empty text, ``app_callapi.py:112``, would otherwise
    divide by zero)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0.0, dot(a, b) / denom)


def normalize(a: Column) -> Column:
    """L2-normalize; zero vectors pass through unchanged."""
    n = l2_norm(a)
    return F.when(n != 0.0, F.transform(a, lambda x: x / n)).otherwise(a)
