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

Construction cost (round-13 measurement): every helper accepts either a
``Column`` or a **SQL fragment string**. The Column path builds each lambda
via ~40 py4j round-trips (measured 52 ms per ``l2_dist`` on this box — the
dominant cost of whole queries that build distance expressions in loops);
the string path assembles the identical expression as ONE ``F.expr`` parse
(~1 ms). Both paths produce the same analyzed expression tree — same
operations in the same order, so float results are bit-identical and the
DuckDB oracles are untouched. Hot operators pass fragment strings; the
Column path remains for arbitrary caller-built expressions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---- SQL-fragment text generators (string fast path) ----
#
# Each s_* mirrors the Column form below TERM FOR TERM (same operations,
# same order — float algebra must not drift between the two paths).


def s_as_double_array(a: str) -> str:
    return f"transform({a}, x -> CAST(x AS DOUBLE))"


def s_dot(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        f"0D, (acc, v) -> acc + v)"
    )


def s_l2_norm(a: str) -> str:
    return f"sqrt({s_dot(a, a)})"


def s_l2_dist_sq(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
        f"0D, (acc, v) -> acc + v)"
    )


def s_l2_dist(a: str, b: str) -> str:
    return f"sqrt({s_l2_dist_sq(a, b)})"


def s_cosine_sim(a: str, b: str) -> str:
    denom = f"({s_l2_norm(a)} * {s_l2_norm(b)})"
    return f"CASE WHEN {denom} != 0D THEN ({s_dot(a, b)} / {denom}) END"


def s_normalize(a: str) -> str:
    n = s_l2_norm(a)
    return f"CASE WHEN {n} != 0D THEN transform({a}, x -> x / {n}) ELSE {a} END"


def s_vec_lit(values: Sequence[float]) -> str:
    """A literal vector as a SQL array<double> fragment. Elements go
    through CAST('<repr>' AS DOUBLE): Python float repr round-trips
    exactly, and the cast parses the same decimal string both engines
    print — bit-identical to ``F.lit(float(v))``."""
    return (
        "array("
        + ", ".join(f"CAST('{float(v)!r}' AS DOUBLE)" for v in values)
        + ")"
    )


def _both_sql(*cols: Column | str) -> bool:
    return all(isinstance(c, str) for c in cols)


def as_double_array(col: Column | str, sql: bool = False) -> Column | str:
    """``sql=True`` (with a string input) returns the FRAGMENT, for callers
    composing larger string expressions; default returns a Column."""
    if isinstance(col, str):
        frag = s_as_double_array(col)
        return frag if sql else F.expr(frag)
    return F.transform(col, lambda x: x.cast("double"))


def vec_lit(values: Sequence[float]) -> Column:
    """A literal vector as an array<double> Column (one expr parse)."""
    return F.expr(s_vec_lit(values))


def dot(a: Column | str, b: Column | str) -> Column:
    if _both_sql(a, b):
        return F.expr(s_dot(a, b))
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    if isinstance(a, str):
        return F.expr(s_l2_norm(a))
    return F.sqrt(dot(a, a))


def l2_dist_sq(a: Column | str, b: Column | str) -> Column:
    if _both_sql(a, b):
        return F.expr(s_l2_dist_sq(a, b))
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_dist(a: Column | str, b: Column | str) -> Column:
    if _both_sql(a, b):
        return F.expr(s_l2_dist(a, b))
    return F.sqrt(l2_dist_sq(a, b))


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either norm is zero (the reference's
    zero-vector rows for empty text, ``app_callapi.py:112``, would otherwise
    divide by zero)."""
    if _both_sql(a, b):
        return F.expr(s_cosine_sim(a, b))
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0.0, dot(a, b) / denom)


def normalize(a: Column | str) -> Column:
    """L2-normalize; zero vectors pass through unchanged."""
    if isinstance(a, str):
        return F.expr(s_normalize(a))
    n = l2_norm(a)
    return F.when(n != 0.0, F.transform(a, lambda x: x / n)).otherwise(a)
