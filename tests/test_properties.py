"""Property-based equivalence tests (hypothesis) for the algebraic
rewrites the engine relies on. Each property batches all generated cases
into ONE DataFrame per example so Spark job count stays low.

These guard rewrites, not behaviors: if someone "optimizes" one side
again, the property pins it to the reference formulation.
"""

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from create_proposals_using_vector_db_public_spark.functions import text as T
from create_proposals_using_vector_db_public_spark.functions import hashing as H
from create_proposals_using_vector_db_public_spark.operators import dedup as D

# printable-ish unicode incl. whitespace runs, CJK, accents — the fixture
# corpus is Korean+English so non-ASCII must hold
_TEXTS = st.lists(
    st.text(
        alphabet=st.characters(
            whitelist_categories=("L", "N", "P", "Zs"),
            whitelist_characters="\t\n 가나다힣é",
        ),
        max_size=80,
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=15, deadline=None)
@given(_TEXTS)
def test_fingerprint_regex_form_equals_token_form(spark, texts):
    """The round-2 single-pass fingerprint (trim ∘ collapse-\\s+ ∘ lower)
    must hash identically to the original tokenize/trim/drop-empty/join
    normalization for ANY input."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i: int, t: string")
    token_form = H.md5_hex(F.array_join(T.tokens(F.lower(F.col("t"))), " "))
    rows = df.select(
        T.fingerprint("t").alias("fast"), token_form.alias("ref")
    ).collect()
    for r in rows:
        assert r["fast"] == r["ref"]


@settings(max_examples=10, deadline=None)
@given(_TEXTS)
def test_minhash_exploded_equals_rowlocal(spark, texts):
    """The exploded word-hash MinHash (one narrow shuffle) must produce the
    SAME signatures as the row-local array form it replaced for perf."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )
    exploded = {
        r["doc_id"]: tuple(r[f"mh{j}"] for j in range(4))
        for r in D.minhash_signatures(df, num_hashes=4).collect()
    }
    # row-local reference: hash words, combine consecutive into shingle
    # hashes, then affine-min per hash function — all as array expressions
    toks = T.tokens("text")
    wh = F.transform(toks, lambda w: H.h64(w, nchars=D.MINHASH_BASE_HEX))
    n = F.size(wh)
    sh = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(0), n - 3),
            lambda i: (
                (
                    (F.element_at(wh, i + 1) * D.SHINGLE_COMBINE
                     + F.element_at(wh, i + 2)) % D.MINHASH_P
                ) * D.SHINGLE_COMBINE + F.element_at(wh, i + 3)
            ) % D.MINHASH_P,
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    base = df.select(F.col("doc_id"), sh.alias("sh")).filter(F.size("sh") > 0)
    rowlocal = {
        r["doc_id"]: tuple(r[f"mh{j}"] for j in range(4))
        for r in base.select(
            "doc_id", *D.minhash_cols(F.col("sh"), num_hashes=4)
        ).collect()
    }
    assert exploded == rowlocal


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(10**15), max_value=10**15),
            st.integers(min_value=1, max_value=10**6),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_integer_half_away_rounding_matches_python(spark, cases):
    """q_centroid_label derives round-half-away-from-zero(s/n) purely from
    truncating integer division on non-negative operands (where truncating
    and floor division agree, so Spark `div` == DuckDB `//`). Pin the CASE
    formula to Python's exact Fraction-based rounding for any (s, n)."""
    from fractions import Fraction

    def py_half_away(s: int, n: int) -> int:
        q = Fraction(s, n)
        sign = -1 if q < 0 else 1
        aq = abs(q)
        fl = aq.numerator // aq.denominator
        rem = aq - fl
        return sign * (fl + (1 if rem >= Fraction(1, 2) else 0))

    df = spark.createDataFrame(
        [(i, s, n) for i, (s, n) in enumerate(cases)], "i: int, s: long, n: long"
    )
    got = {
        r.i: r.c
        for r in df.select(
            "i",
            F.expr(
                "CASE WHEN s >= 0 THEN (2*s + n) div (2*n)"
                " ELSE -((2*(-s) + n) div (2*n)) END"
            ).alias("c"),
        ).collect()
    }
    for i, (s, n) in enumerate(cases):
        assert got[i] == py_half_away(s, n), (s, n)
