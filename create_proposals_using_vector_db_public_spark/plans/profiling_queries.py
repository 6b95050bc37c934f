"""Data-profiling / data-quality declared queries — the "know your
corpus" operators a 100 TB training-data pipeline runs before anything
else: per-column statistics (ANALYZE TABLE shape), moment-based outlier
flagging, vocabulary coverage (OOV rate), and conjunctive inverted-index
search.

Every output is integer or scaled-integer exact, so the driver's value
hash is stable at any scale and under any partitioning (the round-1
float-determinism lesson applied from the start: engine-order-dependent
double accumulation never reaches an output column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..sources import load_table
from .duck import d_words
from .registry import query

# --- column profiling (ANALYZE TABLE) ---------------------------------------
#
# One row per profiled column: row/null/distinct counts plus type-aware
# min/max keys, everything BIGINT:
#   numeric   -> value scaled x100 (money-grade fixture data is 2dp)
#   timestamp -> epoch days
#   string    -> min/max LENGTH (content min/max is collation-dependent;
#                length is what size-skew planning actually needs)

_PROFILE_ORACLE = """
WITH s AS (
  SELECT
    count(*) AS n_rows,
    count(*) - count(l_quantity)      AS nn_qty,
    count(*) - count(l_extendedprice) AS nn_price,
    count(*) - count(l_returnflag)    AS nn_flag,
    count(*) - count(l_shipdate)      AS nn_ship,
    count(DISTINCT l_quantity)      AS nd_qty,
    count(DISTINCT l_extendedprice) AS nd_price,
    count(DISTINCT l_returnflag)    AS nd_flag,
    count(DISTINCT l_shipdate)      AS nd_ship,
    CAST(round(min(l_quantity) * 100) AS BIGINT) AS min_qty,
    CAST(round(max(l_quantity) * 100) AS BIGINT) AS max_qty,
    CAST(round(min(l_extendedprice) * 100) AS BIGINT) AS min_price,
    CAST(round(max(l_extendedprice) * 100) AS BIGINT) AS max_price,
    min(length(l_returnflag)) AS min_flag,
    max(length(l_returnflag)) AS max_flag,
    CAST(CAST(min(l_shipdate) AS DATE) - DATE '1970-01-01' AS BIGINT)
      AS min_ship,
    CAST(CAST(max(l_shipdate) AS DATE) - DATE '1970-01-01' AS BIGINT)
      AS max_ship
  FROM lineitem
)
SELECT col_name, n_rows, n_nulls, n_distinct, min_key, max_key FROM (
  SELECT 'l_quantity' AS col_name, CAST(n_rows AS BIGINT) AS n_rows,
         CAST(nn_qty AS BIGINT) AS n_nulls, CAST(nd_qty AS BIGINT) AS n_distinct,
         min_qty AS min_key, max_qty AS max_key FROM s
  UNION ALL
  SELECT 'l_extendedprice', CAST(n_rows AS BIGINT), CAST(nn_price AS BIGINT),
         CAST(nd_price AS BIGINT), min_price, max_price FROM s
  UNION ALL
  SELECT 'l_returnflag', CAST(n_rows AS BIGINT), CAST(nn_flag AS BIGINT),
         CAST(nd_flag AS BIGINT), CAST(min_flag AS BIGINT),
         CAST(max_flag AS BIGINT) FROM s
  UNION ALL
  SELECT 'l_shipdate', CAST(n_rows AS BIGINT), CAST(nn_ship AS BIGINT),
         CAST(nd_ship AS BIGINT), min_ship, max_ship FROM s
)
"""


@query("q_profile", oracle=_PROFILE_ORACLE)
def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling in ONE scan: every count/null/distinct/min/max
    aggregate for all profiled columns computes in a single partial+final
    aggregation, then the 1-row result is unpivoted driver-free with
    stack(). The multi-column COUNT(DISTINCT) makes Catalyst expand the
    input x4 before the partial agg — that is a deliberate trade: at
    100 TB one expanded scan still beats four separate scans because each
    expansion row carries exactly one column, and the alternative
    (approx_count_distinct) loses the exactness the oracle checks.
    """
    li = load_table(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    agg = li.agg(
        n.alias("n_rows"),
        (n - F.count("l_quantity")).alias("nn_qty"),
        (n - F.count("l_extendedprice")).alias("nn_price"),
        (n - F.count("l_returnflag")).alias("nn_flag"),
        (n - F.count("l_shipdate")).alias("nn_ship"),
        F.countDistinct("l_quantity").alias("nd_qty"),
        F.countDistinct("l_extendedprice").alias("nd_price"),
        F.countDistinct("l_returnflag").alias("nd_flag"),
        F.countDistinct("l_shipdate").alias("nd_ship"),
        F.round(F.min("l_quantity") * 100).cast("bigint").alias("min_qty"),
        F.round(F.max("l_quantity") * 100).cast("bigint").alias("max_qty"),
        F.round(F.min("l_extendedprice") * 100).cast("bigint").alias("min_price"),
        F.round(F.max("l_extendedprice") * 100).cast("bigint").alias("max_price"),
        F.min(F.length("l_returnflag")).cast("bigint").alias("min_flag"),
        F.max(F.length("l_returnflag")).cast("bigint").alias("max_flag"),
        # datediff on the NTZ timestamp's date fields — timezone-free on
        # both engines (epoch-micros would re-interpret via session tz)
        F.datediff(F.to_date(F.min("l_shipdate")), F.lit("1970-01-01"))
        .cast("bigint").alias("min_ship"),
        F.datediff(F.to_date(F.max("l_shipdate")), F.lit("1970-01-01"))
        .cast("bigint").alias("max_ship"),
    )
    return agg.selectExpr(
        """stack(4,
             'l_quantity',      n_rows, nn_qty,   nd_qty,   min_qty,   max_qty,
             'l_extendedprice', n_rows, nn_price, nd_price, min_price, max_price,
             'l_returnflag',    n_rows, nn_flag,  nd_flag,  min_flag,  max_flag,
             'l_shipdate',      n_rows, nn_ship,  nd_ship,  min_ship,  max_ship
           ) AS (col_name, n_rows, n_nulls, n_distinct, min_key, max_key)"""
    )


# --- moment-based outlier flagging -------------------------------------------
#
# Flag events more than 2 sample standard deviations from their
# (event_type, month) group mean. Everything stays INTEGER: with v = 100x
# value (cents), S = sum(v), Q = sum(v^2), n = count, the condition
#     |x - mean| > 2 * stddev_samp
# squares to
#     (n*v - S)^2 * (n-1) > 4 * n * (n*Q - S^2)
# -- no division, no sqrt, no float anywhere, so the flag is bit-exact in
# both engines. Intermediates run in 128-bit integers (Spark DECIMAL(38,0),
# DuckDB HUGEINT) because (n*v)^2*(n-1) overflows int64 once groups pass
# ~1e3 rows. 128-bit headroom: lhs ~ n^3 * R^2 with R the cent-scaled
# value spread (~1e6 here), so DECIMAL(38,0) holds to n ~ 5e8 rows per
# (type, month) group; a 100 TB run whose cells exceed that splits the
# group key finer (e.g. (type, day)) before this pass — the algebra is
# unchanged, only the grouping granularity.

_ANOMALY_ORACLE = """
WITH e AS (
  SELECT event_id, event_type, strftime(ts, '%Y-%m') AS month,
         CAST(round(value * 100) AS BIGINT) AS v100
  FROM events
), g AS (
  SELECT event_type, month,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(v100) AS HUGEINT) AS s,
         CAST(sum(CAST(v100 AS HUGEINT) * v100) AS HUGEINT) AS q
  FROM e GROUP BY event_type, month
)
SELECT e.event_id, e.event_type, e.month, e.v100,
       CAST(g.n AS BIGINT) AS group_n
FROM e JOIN g USING (event_type, month)
WHERE (g.n * e.v100 - g.s) * (g.n * e.v100 - g.s) * (g.n - 1)
      > 4 * g.n * (g.n * g.q - g.s * g.s)
"""


@query("q_anomaly", oracle=_ANOMALY_ORACLE)
def q_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sigma outlier events per (event_type, month) via integer moment
    algebra — the anomaly gate a pipeline runs over metric streams before
    training on them.

    Scale shape: one partial+final aggregate keyed by the group, then a
    same-key join of the tiny group-moment table back to events (broadcast
    at any scale: |event types| x |months| rows). No window over the full
    stream, no second shuffle.
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.date_format("ts", "yyyy-MM").alias("month"),
        F.round(F.col("value") * 100).cast("bigint").alias("v100"),
    )
    d38 = "decimal(38,0)"
    g = e.groupBy("event_type", "month").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(F.col("v100").cast(d38)).cast(d38).alias("s"),
        F.sum(F.col("v100").cast(d38) * F.col("v100")).cast(d38).alias("q"),
    )
    j = e.join(F.broadcast(g), ["event_type", "month"])
    v = F.col("v100").cast(d38)
    lhs = (F.col("n") * v - F.col("s")) * (F.col("n") * v - F.col("s")) * (
        F.col("n") - 1
    )
    rhs = 4 * F.col("n") * (F.col("n") * F.col("q") - F.col("s") * F.col("s"))
    return j.filter(lhs > rhs).select(
        "event_id",
        "event_type",
        "month",
        "v100",
        F.col("n").cast("bigint").alias("group_n"),
    )


# --- vocabulary coverage (OOV rate) ------------------------------------------

# below the fixture's 31 distinct terms ON PURPOSE: with N >= |vocab| the
# left join always matches, every oov_rate is 0, and the boundary
# tie-break is never exercised — the check would be vacuous
_VOCAB_N = 20

_VOCAB_WORDS_SQL = d_words("lower(text)")

_VOCAB_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({_VOCAB_WORDS_SQL}) AS w FROM documents
), vocab AS (
  SELECT w FROM toks GROUP BY w
  ORDER BY count(*) DESC, w ASC LIMIT {_VOCAB_N}
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(*) FILTER (WHERE v.w IS NULL) AS BIGINT) AS n_oov,
       round(count(*) FILTER (WHERE v.w IS NULL) / count(*), 6) AS oov_rate
FROM toks t LEFT JOIN vocab v ON t.w = v.w
GROUP BY t.doc_id
"""


@query("q_vocab_coverage", oracle=_VOCAB_ORACLE)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N vocabulary construction + per-document out-of-vocabulary
    rate — the coverage check run before committing to a tokenizer vocab.
    Vocabulary rank ties break on the token itself so the vocab set is
    deterministic.

    Scale shape: token counting is one partial+final aggregate on the
    token; the global top-N is TakeOrderedAndProject (per-partition heaps,
    no full sort); the N-row vocab then broadcasts back onto the token
    stream, so the per-doc pass adds no shuffle beyond its own doc_id
    aggregation. The OOV division happens once per doc on two BIGINTs —
    IEEE-exact and identical in both engines.
    """
    toks = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(T.tokens(F.lower(F.col("text")))).alias("w"))
    )
    vocab = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("w").asc())
        .limit(_VOCAB_N)
        .select("w", F.lit(True).alias("in_vocab"))
    )
    j = toks.join(F.broadcast(vocab), "w", "left")
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count(F.when(F.col("in_vocab").isNull(), 1)).alias("n_oov"),
        F.round(
            F.count(F.when(F.col("in_vocab").isNull(), 1))
            / F.count(F.lit(1)),
            6,
        ).alias("oov_rate"),
    )


# --- conjunctive inverted-index search ---------------------------------------

_SEARCH_TERMS = ("vector", "join", "scan")

_INVERTED_ORACLE = f"""
WITH postings AS (
  SELECT DISTINCT doc_id, w FROM (
    SELECT doc_id, unnest({_VOCAB_WORDS_SQL}) AS w FROM documents
  )
  WHERE w IN ({", ".join(f"'{t}'" for t in _SEARCH_TERMS)})
)
SELECT p.doc_id, d.lang, d.n_chars
FROM postings p JOIN documents d ON p.doc_id = d.doc_id
GROUP BY p.doc_id, d.lang, d.n_chars
HAVING count(*) = {len(_SEARCH_TERMS)}
"""


@query("q_inverted_search", oracle=_INVERTED_ORACLE)
def q_inverted_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND-of-terms document search by posting-list intersection: docs
    containing EVERY query term, found by counting distinct matched terms
    per doc — the inverted-index query shape (term -> postings -> count ==
    |terms|), not a LIKE scan.

    Scale shape: the term filter applies BEFORE the shuffle, so only
    postings of the queried terms move (at 100 TB with a materialized
    postings table this is an index lookup; here the posting build is
    fused into the same job). The doc-metadata join keys on doc_id
    after the intersection has already shrunk the left side to final
    matches.
    """
    docs = load_table(spark, sf_dir, "documents")

    postings = (
        docs.select("doc_id", F.explode(T.tokens(F.lower(F.col("text")))).alias("w"))
        .filter(F.col("w").isin(*_SEARCH_TERMS))
        .distinct()
    )
    hits = (
        postings.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_terms"))
        .filter(F.col("n_terms") == len(_SEARCH_TERMS))
    )
    return hits.join(docs, "doc_id").select("doc_id", "lang", "n_chars")


# --- data-quality audit (FK orphans + rule violations) -----------------------

_DQ_ORACLE = """
SELECT 'fk_lineitem_orders' AS check_name,
       CAST((SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
         AS n_violations
UNION ALL
SELECT 'fk_lineitem_part',
       CAST((SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM part p
                               WHERE p.p_partkey = l.l_partkey)) AS BIGINT)
UNION ALL
SELECT 'fk_orders_customer',
       CAST((SELECT count(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
UNION ALL
SELECT 'fk_customer_nation',
       CAST((SELECT count(*) FROM customer c
             WHERE NOT EXISTS (SELECT 1 FROM nation n
                               WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT)
UNION ALL
SELECT 'rule_discount_range',
       CAST((SELECT count(*) FROM lineitem
             WHERE l_discount < 0.0 OR l_discount > 1.0) AS BIGINT)
UNION ALL
SELECT 'rule_price_positive',
       CAST((SELECT count(*) FROM lineitem
             WHERE l_extendedprice <= 0.0) AS BIGINT)
UNION ALL
SELECT 'rule_ship_not_before_order',
       CAST((SELECT count(*) FROM lineitem l JOIN orders o
             ON o.o_orderkey = l.l_orderkey
             WHERE l.l_shipdate < o.o_orderdate) AS BIGINT)
UNION ALL
SELECT 'rule_quantity_positive',
       CAST((SELECT count(*) FROM lineitem WHERE l_quantity <= 0.0) AS BIGINT)
"""


@query("q_dq_audit", oracle=_DQ_ORACLE)
def q_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit suite: referential-integrity orphan counts over
    the star schema's FK edges (left-anti joins) plus domain-rule
    violation counts (range/positivity/temporal-order predicates) — the
    ingest gate a pipeline runs before promoting a snapshot, in one
    long-format result (check_name, n_violations).

    Scale shape: ONE pass per audited child table. All six lineitem
    checks (two FK orphan counts, three domain rules, the ship-date
    order) fold into a single scan: left-join the orders keys (the one
    real shuffle) and the broadcast part keys, then six conditional sums
    in one aggregate, unpivoted to long format. Separate per-check count
    branches would re-scan lineitem once each — Spark does not merge
    sibling aggregates. Orders and customer each get their own
    single-pass branch with a broadcast parent. The oracle keeps the
    textbook one-subquery-per-check formulation, proving the fused plan
    equivalent. Non-vacuousness: the fixture data is clean by
    construction, so most checks count 0 — the audit asserting zero IS
    the production use; the ship-before-order rule has real violations at
    every SF, keeping the oracle comparison sensitive to logic drift."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part")
    n = load_table(spark, sf_dir, "nation")

    def flag(cond) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0))

    def unpivot(agged: DataFrame, names: list[str]) -> DataFrame:
        pairs = ", ".join(f"'{x}', {x}" for x in names)
        return agged.select(
            F.expr(
                f"stack({len(names)}, {pairs}) AS (check_name, n_violations)"
            )
        )

    li_pass = unpivot(
        li.join(
            o.select("o_orderkey", "o_orderdate"),
            li["l_orderkey"] == F.col("o_orderkey"),
            "left",
        )
        .join(
            F.broadcast(p.select("p_partkey")),
            li["l_partkey"] == F.col("p_partkey"),
            "left",
        )
        .agg(
            flag(F.col("o_orderkey").isNull()).alias("fk_lineitem_orders"),
            flag(F.col("p_partkey").isNull()).alias("fk_lineitem_part"),
            flag(
                (F.col("l_discount") < 0.0) | (F.col("l_discount") > 1.0)
            ).alias("rule_discount_range"),
            flag(F.col("l_extendedprice") <= 0.0).alias("rule_price_positive"),
            flag(F.col("l_quantity") <= 0.0).alias("rule_quantity_positive"),
            # NULL o_orderdate (orphan) compares to false -> not counted,
            # matching the oracle's inner-join formulation
            flag(F.col("l_shipdate") < F.col("o_orderdate")).alias(
                "rule_ship_not_before_order"
            ),
        ),
        [
            "fk_lineitem_orders",
            "fk_lineitem_part",
            "rule_discount_range",
            "rule_price_positive",
            "rule_quantity_positive",
            "rule_ship_not_before_order",
        ],
    )
    o_pass = unpivot(
        o.join(
            F.broadcast(c.select("c_custkey")),
            o["o_custkey"] == F.col("c_custkey"),
            "left",
        ).agg(flag(F.col("c_custkey").isNull()).alias("fk_orders_customer")),
        ["fk_orders_customer"],
    )
    c_pass = unpivot(
        c.join(
            F.broadcast(n.select("n_nationkey")),
            c["c_nationkey"] == F.col("n_nationkey"),
            "left",
        ).agg(flag(F.col("n_nationkey").isNull()).alias("fk_customer_nation")),
        ["fk_customer_nation"],
    )
    return li_pass.unionByName(o_pass).unionByName(c_pass)


# --- trigram typicality (n-gram LM scoring without logs) ----------------------

_TRIGRAM_ORACLE = """
WITH d AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id < 1000 AND length(text) >= 3
), occ AS (
  SELECT doc_id,
         unnest(list_transform(range(1, length(text) - 1),
                               i -> substr(text, i, 3))) AS g
  FROM d
), freq AS (
  SELECT g, CAST(count(*) AS BIGINT) AS f FROM occ GROUP BY g
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
       round(CAST(sum(f) AS DOUBLE) / count(*), 6) AS typicality
FROM occ JOIN freq USING (g)
GROUP BY doc_id
"""


@query("q_trigram_typicality", oracle=_TRIGRAM_ORACLE)
def q_trigram_typicality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram typicality scoring — the n-gram language-model
    quality signal (gibberish and boilerplate both sit in the tails)
    computed WITHOUT logarithms: a document's score is the mean corpus
    frequency of its trigram occurrences. Log-prob scoring is the same
    plan with log(f/N) in the final projection; libm log differs in the
    last ulp across engines, so the declared query stays on the
    integer-mean form that hash-matches exactly (one double divide).

    Scale shape: trigram extraction is array-local (substr over a
    sequence); the frequency table aggregates (gram, count) pairs —
    alphabet-bounded, broadcastable — and joins back onto the occurrence
    stream by gram, so nothing wider than (doc_id, gram) ever shuffles."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < 1000) & (F.length("text") >= 3))
    )
    occ = d.select(
        "doc_id", F.explode(T.char_ngrams(F.col("text"), 3)).alias("g")
    )
    freq = occ.groupBy("g").agg(F.count("*").alias("f"))
    return (
        occ.join(F.broadcast(freq), "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_trigrams"),
            F.round(
                F.sum("f").cast("double") / F.count("*"), 6
            ).alias("typicality"),
        )
    )


# --- dataset card --------------------------------------------------------------

_CARD_ORACLE = f"""
WITH w AS (
  SELECT doc_id, lang, source,
         md5(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ',
                                 'g'), ' ')) AS fp,
         {d_words()} AS words
  FROM documents
), doc_stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(words)) AS BIGINT) AS n_tokens,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS n_exact_dups
  FROM w
), vocab AS (
  SELECT CAST(count(DISTINCT t) AS BIGINT) AS n_distinct_terms
  FROM (SELECT unnest(words) AS t FROM w)
)
SELECT d.n_docs, d.n_tokens, v.n_distinct_terms, d.n_langs, d.n_sources,
       d.n_exact_dups,
       round(CAST(d.n_tokens AS DOUBLE) / d.n_docs, 6) AS mean_doc_tokens
FROM doc_stats d, vocab v
"""


@query("q_dataset_card", oracle=_CARD_ORACLE)
def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card a corpus release ships: one row of corpus-level
    facts — document and token counts, vocabulary size, language and
    source coverage, exact-duplicate count (fingerprint collisions), and
    mean document length. Composes the engine's own primitives
    (fingerprint, tokenizer) into the release-gate summary.

    Scale shape: ONE scan feeds both aggregates (the vocabulary distinct
    is the only shuffle wider than a handful of rows — it collapses to
    term space, Heaps-bounded); the two 1-row aggregates cross join. The
    single divide runs on two exact BIGINTs."""
    d = load_table(spark, sf_dir, "documents")
    w = d.select(
        "doc_id",
        "lang",
        "source",
        T.fingerprint("text").alias("fp"),
        T.tokens("text").alias("words"),
    )
    doc_stats = w.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size("words")).cast("bigint").alias("n_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        (F.count("*") - F.countDistinct("fp")).alias("n_exact_dups"),
    )
    vocab = w.select(F.explode("words").alias("t")).agg(
        F.countDistinct("t").alias("n_distinct_terms")
    )
    return doc_stats.crossJoin(F.broadcast(vocab)).select(
        "n_docs",
        "n_tokens",
        "n_distinct_terms",
        "n_langs",
        "n_sources",
        "n_exact_dups",
        F.round(
            F.col("n_tokens").cast("double") / F.col("n_docs"), 6
        ).alias("mean_doc_tokens"),
    )
