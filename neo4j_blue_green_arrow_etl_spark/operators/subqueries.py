"""Subquery family + window/HOF extensions (round 3).

The reference has no SQL dialect at all (SURVEY §2: its query surface is
the load pipeline plus catalog Cypher), and the engine's registry until
now had no subquery-shaped queries either. This module closes that gap
with the four canonical subquery forms — EXISTS, IN, correlated scalar,
uncorrelated scalar — plus NOT EXISTS, each expressed the Spark-first
way: **decorrelated into joins** (semi/anti/aggregate-join), which is
exactly what Catalyst's RewriteCorrelatedScalarSubquery /
RewritePredicateSubquery rules would do to the SQL form — here the plan
is declared directly so the join strategy (broadcast vs shuffle) is
visible and auditable.

Scale notes per query are inline; the common theme: every subquery
becomes ONE extra join whose build side is an aggregate (orders of
magnitude smaller than the probe side), so the 100 TB cost is the probe
table's single shuffle — no per-row re-execution semantics anywhere.

Cross-engine determinism discipline (learned from the sf0.1 sweep):
sums that feed comparisons or output are computed over exact domains —
integral doubles (quantities), DECIMAL-cast money, or integer cents —
never order-dependent float accumulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .relational import _t, register

# Late-shipment horizon for the EXISTS query (days after order date).
LATE_DAYS = 30
# Total-quantity threshold for the IN-subquery query (TPC-H Q18 uses
# 300+ at SF1; the synthetic orders have ~4 lines so 150 keeps the
# qualifying set selective but non-trivial at every sandbox SF).
BIG_ORDER_QTY = 150
# Early-shipment horizon for the NOT EXISTS query.
EARLY_DAYS = 7
Q17_BRAND = "Brand#1"


@register(
    "q_sq1_exists",
    oracle=(
        "SELECT o_orderpriority, COUNT(*) AS n_orders FROM orders o "
        "WHERE EXISTS (SELECT 1 FROM lineitem l "
        "WHERE l.l_orderkey = o.o_orderkey "
        f"AND l.l_shipdate > o.o_orderdate + INTERVAL {LATE_DAYS} DAY) "
        "GROUP BY 1 ORDER BY 1"
    ),
    doc="EXISTS subquery (TPC-H Q4 shape): orders with at least one "
    f"line shipped > {LATE_DAYS} days after the order date, counted per "
    "priority. Spark-first decorrelation: LEFT SEMI join with the "
    "non-equi ship-date condition folded into the join predicate — one "
    "shuffle on orderkey, semi-join short-circuits per probe row (no "
    "duplicate explosion, no DISTINCT needed). At 100 TB both sides "
    "shuffle once on the join key; the date predicate prunes inside "
    "the join, not in a post-filter.",
)
def q_sq1_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > o["o_orderdate"] + F.expr(f"INTERVAL {LATE_DAYS} DAY")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "q_sq2_in",
    oracle=(
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem "
        f"GROUP BY 1 HAVING SUM(l_quantity) > {BIG_ORDER_QTY}) "
        "ORDER BY 1"
    ),
    doc="IN subquery over an aggregate (TPC-H Q18 shape): orders whose "
    f"total line quantity exceeds {BIG_ORDER_QTY}. Spark-first: the "
    "HAVING aggregate materializes as a keys-only DataFrame and the IN "
    "becomes a LEFT SEMI join on it. Quantities are integral doubles, "
    "so the HAVING sum is exact and order-independent — the threshold "
    "comparison cannot flip between engines. At 100 TB the qualifying "
    "key set is tiny (heavy-hitter orders) and broadcasts.",
)
def q_sq2_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > BIG_ORDER_QTY)
        .select("l_orderkey")
    )
    return (
        o.join(big, o["o_orderkey"] == big["l_orderkey"], "left_semi")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


@register(
    "q_sq3_corr17",
    oracle=(
        "SELECT ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) / 7.0, 2) "
        "AS avg_yearly FROM lineitem l "
        "JOIN part p ON p.p_partkey = l.l_partkey "
        f"WHERE p.p_brand = '{Q17_BRAND}' "
        "AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) "
        "FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)"
    ),
    doc="CORRELATED scalar subquery (TPC-H Q17 shape): revenue of "
    "small-quantity lines (below 20% of their part's average quantity) "
    f"for {Q17_BRAND}, annualized. Spark-first decorrelation: the "
    "correlated AVG becomes ONE per-part aggregate joined back on "
    "l_partkey — the naive semantics re-runs the subquery per row; the "
    "decorrelated plan costs one extra aggregate + join regardless of "
    "table size. The part-brand dimension broadcasts. Determinism: the "
    "quantity AVG is exact (integral doubles), the revenue sum "
    "accumulates in DECIMAL.",
)
def q_sq3_corr17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == Q17_BRAND)
        .select("p_partkey")
    )
    # restrict to the brand's lineitems BEFORE aggregating: the per-part
    # AVG is identical (partkey determines the group) but the aggregate
    # shuffles only the brand's share of the table, not all of lineitem
    brand_li = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"], "left_semi")
    thresh = brand_li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_thresh")
    )
    return (
        brand_li.join(thresh, brand_li["l_partkey"] == thresh["t_partkey"])
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) / 7.0, 2
            ).alias("avg_yearly")
        )
    )


@register(
    "q_sq4_scalar",
    oracle=(
        "WITH t AS (SELECT c_custkey, "
        "CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents FROM customer), "
        "a AS (SELECT SUM(cents) * 1.0 / COUNT(*) AS avg_cents FROM t) "
        "SELECT c_custkey, ROUND((cents - avg_cents) / 100, 4) AS above_avg "
        "FROM t, a WHERE cents > avg_cents ORDER BY 1"
    ),
    doc="UNCORRELATED scalar subquery: customers above the global "
    "average balance, with their distance from it. Spark-first: the "
    "global aggregate is a ONE-ROW DataFrame broadcast-crossJoined onto "
    "the scan (the same global-constant-attachment pattern as q_x2's "
    "query vector) — no driver round-trip, no second scan epoch. "
    "Determinism: balances become integer cents first, so the global "
    "sum is exact whatever the partition order; the single double "
    "division is then bit-identical across engines.",
)
def q_sq4_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", F.round(F.col("c_acctbal") * 100).cast("long").alias("cents")
    )
    avg_row = c.agg(
        (F.sum("cents") * 1.0 / F.count("*")).alias("avg_cents")
    )
    return (
        c.crossJoin(F.broadcast(avg_row))
        .filter(F.col("cents") > F.col("avg_cents"))
        .select(
            "c_custkey",
            F.round((F.col("cents") - F.col("avg_cents")) / 100, 4).alias("above_avg"),
        )
        .orderBy("c_custkey")
    )


@register(
    "q_sq5_notexists",
    oracle=(
        "SELECT o_orderkey FROM orders o "
        "WHERE NOT EXISTS (SELECT 1 FROM lineitem l "
        "WHERE l.l_orderkey = o.o_orderkey "
        f"AND l.l_shipdate <= o.o_orderdate + INTERVAL {EARLY_DAYS} DAY) "
        "ORDER BY 1"
    ),
    doc="NOT EXISTS subquery (TPC-H Q21/Q22 family): orders where no "
    f"line shipped within {EARLY_DAYS} days of the order date. "
    "Spark-first: LEFT ANTI join with the compound (equi + date) "
    "predicate in the join condition — the anti join IS the decorrelated "
    "NOT EXISTS, null-safe by construction (unlike NOT IN, which "
    "tri-values on nulls). Same single-shuffle cost profile as "
    "q_sq1_exists.",
)
def q_sq5_notexists(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o["o_orderkey"] == li["l_orderkey"])
            & (
                li["l_shipdate"]
                <= o["o_orderdate"] + F.expr(f"INTERVAL {EARLY_DAYS} DAY")
            ),
            "left_anti",
        )
        .select("o_orderkey")
        .orderBy("o_orderkey")
    )


_W7_FULL = (
    "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING"
)


@register(
    "q_w7_firstlast",
    oracle=(
        "SELECT o_custkey, o_orderkey, "
        "FIRST_VALUE(o_totalprice) OVER "
        "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS first_price, "
        f"LAST_VALUE(o_totalprice) OVER ({_W7_FULL}) AS last_price, "
        f"NTH_VALUE(o_totalprice, 2) OVER ({_W7_FULL}) AS second_price "
        "FROM orders ORDER BY 1, 2"
    ),
    doc="Window value-locator family: FIRST_VALUE / LAST_VALUE / "
    "NTH_VALUE over a per-customer order history (ties broken by "
    "orderkey for determinism). LAST/NTH use the full-partition frame "
    "— the default running frame makes LAST_VALUE the current row, the "
    "classic window gotcha, pinned here on both engines. One window "
    "shuffle serves all three functions (same partitioning + ordering).",
)
def q_w7_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w_full).alias("second_price"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "q_f10_hof",
    oracle=(
        # COALESCE: DuckDB's list_aggregate([], 'sum') is NULL while
        # Spark's aggregate fold starts at 0.0 — an all-nonpositive
        # embedding must score 0.0 on both sides
        "SELECT vec_id, "
        "COALESCE(ROUND(list_aggregate(list_transform(list_filter(embedding, x -> x > 0), "
        "x -> x::DOUBLE * x::DOUBLE), 'sum'), 4), 0.0) AS pos_energy, "
        "len(list_filter(embedding, x -> x > 0)) AS n_pos "
        "FROM embeddings ORDER BY 1"
    ),
    doc="Higher-order array functions composed — filter -> transform -> "
    "aggregate: energy (sum of squares) of each embedding's positive "
    "components plus their count. All three lambdas run JVM-side inside "
    "whole-stage codegen (no Python), the fold is sequential in array "
    "order on both engines (the same bit-compat contract q_x2's dot "
    "product relies on). At 100 TB this is a map-only projection — "
    "zero shuffles.",
)
def q_f10_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    pos = F.filter("embedding", lambda x: x > 0)
    sq = F.transform(pos, lambda x: x.cast("double") * x.cast("double"))
    return e.select(
        "vec_id",
        F.round(F.aggregate(sq, F.lit(0.0), lambda a, v: a + v), 4).alias(
            "pos_energy"
        ),
        F.size(pos).alias("n_pos"),
    ).orderBy("vec_id")


@register(
    "q_f11_regexall",
    oracle=(
        "SELECT doc_id, "
        "len(regexp_extract_all(text, '[a-z]{7,}')) AS n_long_words, "
        "COALESCE(NULLIF(regexp_extract(text, '[a-z]{7,}'), ''), '-') "
        "AS first_long_word FROM documents ORDER BY 1"
    ),
    doc="Multi-match regex extraction: count and first occurrence of "
    "long (>= 7 letter) words per document — the feature-extraction "
    "shape used for PII scans and pattern mining over text corpora. "
    "regexp_extract_all returns the full match array (JVM regex vs RE2 "
    "agree on this character-class pattern); no-match normalizes to '-' "
    "on both engines. Map-only, zero shuffles at any scale.",
)
def q_f11_regexall(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    first = F.regexp_extract("text", "[a-z]{7,}", 0)
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit("[a-z]{7,}"), F.lit(0))).alias(
            "n_long_words"
        ),
        F.when(first == "", "-").otherwise(first).alias("first_long_word"),
    ).orderBy("doc_id")


@register(
    "q_sq6_q2min",
    oracle=(
        "SELECT s.s_suppkey, s.s_name, n.n_name, s.s_acctbal "
        "FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "WHERE s.s_acctbal = (SELECT MIN(s2.s_acctbal) FROM supplier s2 "
        "WHERE s2.s_nationkey = s.s_nationkey) ORDER BY 1"
    ),
    doc="Correlated MIN join-back (TPC-H Q2 shape): the supplier(s) "
    "holding each nation's minimum balance. Unlike argmin/max_by "
    "(q_t2_argmax) this KEEPS ties — the subquery decorrelates into a "
    "per-nation MIN aggregate equi-joined back on (nationkey, acctbal). "
    "The equality compares a selected value (no arithmetic) so it is "
    "exact across engines. Both the aggregate and the nation dim "
    "broadcast; the probe side scans once.",
)
def q_sq6_q2min(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    mn = s.groupBy(F.col("s_nationkey").alias("m_nationkey")).agg(
        F.min("s_acctbal").alias("mn")
    )
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(
            F.broadcast(mn),
            (s["s_nationkey"] == mn["m_nationkey"]) & (s["s_acctbal"] == mn["mn"]),
        )
        .select("s_suppkey", "s_name", "n_name", "s_acctbal")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q20 shape: nested aggregate semi-join (dominant-share suppliers)
# --------------------------------------------------------------------------

Q20_BRAND = "Brand#12"
Q20_SHARE = 0.10  # a supplier "dominates" a part above this volume share


@register(
    "q_sq7_q20",
    oracle=(
        f"WITH brand_parts AS (SELECT p_partkey FROM part WHERE p_brand = '{Q20_BRAND}'), "
        "vol AS (SELECT l_partkey, l_suppkey, SUM(l_quantity) AS sq "
        "FROM lineitem JOIN brand_parts ON l_partkey = p_partkey GROUP BY 1, 2), "
        "tot AS (SELECT l_partkey, SUM(sq) AS tq FROM vol GROUP BY 1) "
        "SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey IN ("
        "SELECT v.l_suppkey FROM vol v JOIN tot t USING (l_partkey) "
        f"WHERE v.sq > {Q20_SHARE} * t.tq) ORDER BY s_suppkey"
    ),
    doc=f"TPC-H Q20 shape: suppliers shipping more than "
    f"{int(Q20_SHARE * 100)}% of any {Q20_BRAND} part's total volume — "
    "a nested-aggregate semi-join (IN over a correlated-aggregate "
    "derived table), decorrelated the same way as q_sq2/q_sq3: "
    "aggregate once per (part, supplier), re-aggregate per part, join "
    "the two SMALL aggregate tables, semi-join the supplier dimension "
    "on the survivors. Scale: the fact table is touched by exactly one "
    "brand-filtered scan + one groupBy; everything after operates on "
    "aggregate-cardinality tables (broadcastable), never on lineitem "
    "again.",
)
def q_sq7_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == Q20_BRAND)
    s = _t(spark, sf_dir, "supplier")
    vol = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("sq"))
    )
    tot = vol.groupBy("l_partkey").agg(F.sum("sq").alias("tq"))
    dominant = (
        vol.join(tot, "l_partkey")
        .filter(F.col("sq") > Q20_SHARE * F.col("tq"))
        .select(F.col("l_suppkey").alias("s_suppkey"))
        .distinct()
    )
    return (
        s.join(F.broadcast(dominant), "s_suppkey", "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )
