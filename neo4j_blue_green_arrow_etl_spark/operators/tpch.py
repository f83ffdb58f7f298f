"""TPC-H-shape suite completion (round 4).

The registry already covers Q1 (q_a1), Q2-min (q_sq6_q2min), Q3
(q_j12_q3), Q4 (q_sq1_exists), Q5 (q_j8_multiway), Q14 (q_j9_part),
Q17 (q_sq3_corr17), Q19 (q_j13_q19), Q20 (q_sq7_q20), Q22 (q_j15_q22).
This module adds the remaining canonical join/agg shapes — Q6, Q7, Q8,
Q9, Q10, Q12, Q13, Q16, Q18, Q21 — adapted to the driver testdata schema
(TESTDATA.md): there is no ``partsupp`` table (part--supplier
association is derived from distinct lineitem pairs), no
``l_commitdate``/``l_receiptdate``/``l_shipmode`` (lateness is defined
as ``l_shipdate`` vs ``o_orderdate + N days``), and no comment
columns (the Q13/Q16 exclusion predicates use ``o_orderpriority`` /
``s_acctbal`` instead). Each adaptation is noted on the query.

These mirror the consumer-facing analytical contract of the reference
(docs/DEMO.md:171-186 runs aggregate queries over the loaded graph);
the reference itself has no SQL executor, so the plan shapes here are
the Spark-first realization of SURVEY §2.12's declared query surface.

Scale notes per query are the 100 TB design: dimension tables
(nation/region/supplier/customer at TPC-H ratios) broadcast; the only
big-big shuffles are orders<->lineitem on orderkey and the final
group-bys; every date/brand/type filter pushes to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .relational import _t, register

# ---------------------------------------------------------------------------
# Q6 — forecasting revenue change
# ---------------------------------------------------------------------------

_Q6_LO, _Q6_HI = "1997-01-01", "1998-01-01"
_Q6_DISC_LO, _Q6_DISC_HI = 0.05, 0.07
_Q6_QTY = 24


@register(
    "q_h6_forecast",
    oracle=(
        "SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue "
        "FROM lineitem "
        f"WHERE l_shipdate >= '{_Q6_LO}' AND l_shipdate < '{_Q6_HI}' "
        f"AND l_discount BETWEEN {_Q6_DISC_LO} AND {_Q6_DISC_HI} "
        f"AND l_quantity < {_Q6_QTY}"
    ),
    doc="TPC-H Q6 (forecasting revenue change): single-table filter + "
    "scalar aggregate — the canonical pushdown probe. Scale: zero "
    "joins, zero wide shuffles; all three predicates (shipdate range, "
    "discount band, quantity cap) push to the parquet scan as "
    "row-group min/max pruning, and the partial SUM makes the single "
    "exchange one double per task. At 100 TB this query's cost IS the "
    "pruned scan — the plan to check when validating a new storage "
    "layout. Adaptation: none (schema-complete).",
)
def q_h6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _Q6_LO)
            & (F.col("l_shipdate") < _Q6_HI)
            & F.col("l_discount").between(_Q6_DISC_LO, _Q6_DISC_HI)
            & (F.col("l_quantity") < _Q6_QTY)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# ---------------------------------------------------------------------------

_Q7_N1, _Q7_N2 = "NATION_1", "NATION_2"
_Q7_LO, _Q7_HI = "1996-01-01", "1997-12-31"


@register(
    "q_h7_volume",
    oracle=(
        "SELECT supp_nation, cust_nation, l_year, "
        "ROUND(SUM(volume), 2) AS revenue FROM ("
        "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
        "CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year, "
        "l_extendedprice * (1 - l_discount) AS volume "
        "FROM supplier JOIN lineitem ON s_suppkey = l_suppkey "
        "JOIN orders ON o_orderkey = l_orderkey "
        "JOIN customer ON c_custkey = o_custkey "
        "JOIN nation n1 ON s_nationkey = n1.n_nationkey "
        "JOIN nation n2 ON c_nationkey = n2.n_nationkey "
        f"WHERE ((n1.n_name = '{_Q7_N1}' AND n2.n_name = '{_Q7_N2}') "
        f"OR (n1.n_name = '{_Q7_N2}' AND n2.n_name = '{_Q7_N1}')) "
        f"AND l_shipdate BETWEEN '{_Q7_LO}' AND '{_Q7_HI}') shipping "
        "GROUP BY supp_nation, cust_nation, l_year "
        "ORDER BY supp_nation, cust_nation, l_year"
    ),
    doc="TPC-H Q7 (volume shipping): bilateral trade revenue between "
    "two nations by shipment year — the disjunctive cross-side nation "
    "pair is the interesting predicate (it cannot be split into "
    "single-side pushdowns, but each arm's nation-key IN-set can). "
    "Scale: both nation joins broadcast; supplier and customer "
    "broadcast at TPC-H dim ratios; the orders<->lineitem equi-join "
    "is the one big-big shuffle; the shipdate range pushes to the "
    "scan. Adaptation: none needed (schema-complete).",
)
def q_h7_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(_Q7_LO, _Q7_HI)
    )
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == _Q7_N1) & (F.col("cust_nation") == _Q7_N2)
    ) | ((F.col("supp_nation") == _Q7_N2) & (F.col("cust_nation") == _Q7_N1))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8 — national market share
# ---------------------------------------------------------------------------

_Q8_NATION = "NATION_3"
_Q8_REGION = "ASIA"
_Q8_TYPE = "STANDARD"


@register(
    "q_h8_share",
    oracle=(
        "SELECT o_year, ROUND(SUM(CASE WHEN nation = "
        f"'{_Q8_NATION}' THEN volume ELSE 0 END) / SUM(volume), 6) "
        "AS mkt_share FROM ("
        "SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year, "
        "l_extendedprice * (1 - l_discount) AS volume, n2.n_name AS nation "
        "FROM part JOIN lineitem ON p_partkey = l_partkey "
        "JOIN supplier ON s_suppkey = l_suppkey "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation n1 ON c_nationkey = n1.n_nationkey "
        "JOIN region ON n1.n_regionkey = r_regionkey "
        "JOIN nation n2 ON s_nationkey = n2.n_nationkey "
        f"WHERE r_name = '{_Q8_REGION}' AND p_type = '{_Q8_TYPE}' "
        "AND o_orderdate BETWEEN '1996-01-01' AND '1997-12-31') all_nations "
        "GROUP BY o_year ORDER BY o_year"
    ),
    doc="TPC-H Q8 (national market share): the share of one supplier "
    "nation in a region's customer market for one part type, by order "
    "year — conditional-aggregate ratio over an 8-table join tree. "
    "Scale: part filter (p_type) broadcasts a pre-filtered dimension "
    "that semi-reduces lineitem early; region->nation prune the "
    "customer side; conditional SUM computes share in ONE pass (no "
    "self-join of numerator vs denominator).",
)
def q_h8_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == _Q8_TYPE)
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1996-01-01", "1997-12-31")
    )
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == _Q8_REGION)
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == _Q8_NATION, vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit
# ---------------------------------------------------------------------------

_Q9_NAME_FRAG = "red"
# No partsupp table in the testdata -> supply cost is modeled as a
# fixed fraction of p_retailprice (deterministic, both engines).
_Q9_COST_FRAC = 0.6


@register(
    "q_h9_profit",
    oracle=(
        "SELECT nation, o_year, ROUND(SUM(amount), 2) AS sum_profit FROM ("
        "SELECT n_name AS nation, "
        "CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year, "
        "l_extendedprice * (1 - l_discount) - "
        f"p_retailprice * {_Q9_COST_FRAC} * l_quantity AS amount "
        "FROM part JOIN lineitem ON p_partkey = l_partkey "
        "JOIN supplier ON s_suppkey = l_suppkey "
        "JOIN orders ON o_orderkey = l_orderkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        f"WHERE p_name LIKE '%{_Q9_NAME_FRAG}%') profit "
        "GROUP BY nation, o_year ORDER BY nation, o_year DESC"
    ),
    doc="TPC-H Q9 (product-type profit): profit by supplier nation and "
    "order year for parts whose name contains a fragment. Adaptation: "
    "the testdata has no partsupp, so ps_supplycost is modeled as "
    f"p_retailprice * {_Q9_COST_FRAC} (identical formula both "
    "engines). Scale: the LIKE filter prunes part BEFORE broadcast, "
    "semi-reducing lineitem at the scan-side join; orders<->lineitem "
    "is the only shuffle pair; two-key groupBy at the end.",
)
def q_h9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(
        F.col("p_name").contains(_Q9_NAME_FRAG)
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.lit(_Q9_COST_FRAC) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting
# ---------------------------------------------------------------------------

_Q10_LO, _Q10_HI = "1997-01-01", "1997-06-30"


@register(
    "q_h10_returns",
    oracle=(
        "SELECT c_custkey, c_name, "
        "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue, "
        "ROUND(c_acctbal, 2) AS acctbal, n_name "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        f"WHERE o_orderdate BETWEEN '{_Q10_LO}' AND '{_Q10_HI}' "
        "AND l_returnflag = 'R' "
        "GROUP BY c_custkey, c_name, c_acctbal, n_name "
        "ORDER BY revenue DESC, c_custkey LIMIT 20"
    ),
    doc="TPC-H Q10 (returned items): top-20 customers by lost revenue "
    "from returned lineitems in a half-year order window. Scale: both "
    "filters (orderdate range, returnflag) push to their scans; "
    "customer+nation broadcast; group on custkey then "
    "TakeOrderedAndProject for the top-20 (no global sort).",
)
def q_h10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(_Q10_LO, _Q10_HI)
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q11 — important stock identification
# ---------------------------------------------------------------------------

_Q11_FRACTION = 0.0005


@register(
    "q_h11_partvalue",
    oracle=(
        "WITH pv AS (SELECT l_partkey AS ps_partkey, "
        "SUM(l_quantity * l_extendedprice / (1 + l_tax)) AS value "
        "FROM lineitem GROUP BY 1) "
        "SELECT ps_partkey, ROUND(value, 2) AS value FROM pv "
        f"WHERE value > (SELECT SUM(value) * {_Q11_FRACTION} FROM pv) "
        "ORDER BY value DESC, ps_partkey LIMIT 50"
    ),
    doc="TPC-H Q11 (important stock): parts whose inventory value "
    "exceeds a fixed fraction of TOTAL inventory value — the "
    "aggregate-vs-global-scalar HAVING shape. Adaptation: no partsupp, "
    "so per-part value is the lineitem rollup of "
    "quantity * extendedprice / (1+tax). The engine computes the "
    "rollup ONCE, derives the global threshold as a one-row aggregate "
    "of it, and broadcast-crossjoins that scalar back onto the rollup "
    "(the rollup itself is NOT recomputed — one fact shuffle total; "
    "Spark reuses the exchange for both consumers). Top-50 via "
    "TakeOrderedAndProject.",
)
def q_h11_partvalue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pv = li.groupBy(F.col("l_partkey").alias("ps_partkey")).agg(
        F.sum(
            F.col("l_quantity")
            * F.col("l_extendedprice")
            / (1 + F.col("l_tax"))
        ).alias("value")
    )
    thresh = pv.agg(
        (F.sum("value") * F.lit(_Q11_FRACTION)).alias("thresh")
    )
    return (
        pv.join(F.broadcast(thresh))
        .filter(F.col("value") > F.col("thresh"))
        .select("ps_partkey", F.round("value", 2).alias("value"))
        .orderBy(F.desc("value"), "ps_partkey")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier
# ---------------------------------------------------------------------------

_Q15_LO, _Q15_HI = "1997-01-01", "1997-04-01"


@register(
    "q_h15_topsupp",
    oracle=(
        "WITH revenue AS (SELECT l_suppkey AS supplier_no, "
        "SUM(l_extendedprice * (1 - l_discount)) AS total_rev "
        f"FROM lineitem WHERE l_shipdate >= '{_Q15_LO}' "
        f"AND l_shipdate < '{_Q15_HI}' GROUP BY 1) "
        "SELECT s_suppkey, s_name, ROUND(total_rev, 2) AS total_revenue "
        "FROM supplier JOIN revenue ON s_suppkey = supplier_no "
        "WHERE total_rev = (SELECT MAX(total_rev) FROM revenue) "
        "ORDER BY s_suppkey"
    ),
    doc="TPC-H Q15 (top supplier): the supplier(s) with maximum "
    "quarterly revenue — the view-then-scalar-max self-reference "
    "shape (ties kept, so a LIMIT 1 would be wrong). The engine "
    "materializes the revenue rollup once, takes its one-row MAX, and "
    "broadcast-joins the scalar back as an equality filter; the "
    "supplier dimension broadcasts onto the surviving row(s). Scale: "
    "one shipdate-pruned fact shuffle; everything after is "
    "scalar/broadcast.",
)
def q_h15_topsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _Q15_LO) & (F.col("l_shipdate") < _Q15_HI)
    )
    s = _t(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_rev"
        )
    )
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", F.round("total_rev", 2).alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q12 — shipping-lateness priority counts (shipmode adaptation)
# ---------------------------------------------------------------------------

_Q12_YEAR = "1997"


@register(
    "q_h12_latebucket",
    oracle=(
        "SELECT late_bucket, "
        "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
        "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
        "CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') "
        "THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count FROM ("
        "SELECT o_orderpriority, CASE "
        "WHEN date_diff('day', o_orderdate, l_shipdate) <= 30 THEN 'fast' "
        "WHEN date_diff('day', o_orderdate, l_shipdate) <= 90 THEN 'normal' "
        "ELSE 'late' END AS late_bucket "
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey "
        f"WHERE l_shipdate >= '{_Q12_YEAR}-01-01' "
        f"AND l_shipdate < '{int(_Q12_YEAR) + 1}-01-01') t "
        "GROUP BY late_bucket ORDER BY late_bucket"
    ),
    doc="TPC-H Q12 shape (shipping modes and order priority): the "
    "testdata has no l_shipmode/l_commitdate/l_receiptdate, so the "
    "partition dimension is a derived ship-latency bucket "
    "(days from order to ship: <=30 fast, <=90 normal, else late) — "
    "same plan shape: one fact-fact join, a derived CASE dimension, "
    "conditional counts per bucket. Scale: shipdate-year filter "
    "pushes to the lineitem scan; single shuffle on orderkey; the "
    "3-row output aggregates map-side.",
)
def q_h12_latebucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= f"{_Q12_YEAR}-01-01")
        & (F.col("l_shipdate") < f"{int(_Q12_YEAR) + 1}-01-01")
    )
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(lag <= 30, "fast").when(lag <= 90, "normal").otherwise("late")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(bucket.alias("late_bucket"), high.alias("is_high"))
        .groupBy("late_bucket")
        .agg(
            F.sum(F.when(F.col("is_high"), 1).otherwise(0)).alias(
                "high_line_count"
            ),
            F.sum(F.when(~F.col("is_high"), 1).otherwise(0)).alias(
                "low_line_count"
            ),
        )
        .orderBy("late_bucket")
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution
# ---------------------------------------------------------------------------


@register(
    "q_h13_custdist",
    oracle=(
        "SELECT c_count, COUNT(*) AS custdist FROM ("
        "SELECT c_custkey, COUNT(o_orderkey) AS c_count "
        "FROM customer LEFT JOIN orders ON c_custkey = o_custkey "
        "AND o_orderpriority <> '5-LOW' "
        "GROUP BY c_custkey) c_orders "
        "GROUP BY c_count ORDER BY custdist DESC, c_count DESC"
    ),
    doc="TPC-H Q13 (customer distribution): histogram of customers by "
    "order count, where the exclusion predicate lives in the OUTER "
    "join condition (customers with zero qualifying orders must "
    "appear with c_count=0 — a WHERE would silently drop them; the "
    "reference's comment-LIKE filter is adapted to o_orderpriority). "
    "Scale: left outer join shuffles on custkey, first groupBy "
    "reuses that partitioning (zero extra exchange), second groupBy "
    "reduces to ~tens of rows map-side.",
)
def q_h13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# Q16 — supplier count by part attributes
# ---------------------------------------------------------------------------

_Q16_SIZES = [5, 10, 15, 20]
_Q16_BRAND = "Brand#1"


@register(
    "q_h16_suppcnt",
    oracle=(
        "SELECT p_brand, p_type, p_size, "
        "COUNT(DISTINCT ps_suppkey) AS supplier_cnt FROM ("
        "SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey "
        "FROM lineitem) partsupp "
        "JOIN part ON p_partkey = ps_partkey "
        f"WHERE p_brand <> '{_Q16_BRAND}' AND p_type NOT LIKE 'PROMO%' "
        f"AND p_size IN ({', '.join(str(s) for s in _Q16_SIZES)}) "
        "AND ps_suppkey NOT IN "
        "(SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) "
        "GROUP BY p_brand, p_type, p_size "
        "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"
    ),
    doc="TPC-H Q16 (parts/supplier relationship): supplier counts per "
    "(brand, type, size) with brand/type/size exclusion filters and a "
    "NOT IN supplier blacklist. Adaptations: partsupp is derived as "
    "DISTINCT (l_partkey, l_suppkey) from lineitem; the 'complaints' "
    "comment filter becomes s_acctbal < 0. Scale: the distinct "
    "pair-derivation is one shuffle on the pair key; part (filtered) "
    "broadcasts; the blacklist is a broadcast null-safe anti-join "
    "(Spark's NOT IN plan); count_distinct shuffles partial sketches "
    "on the 3-key group.",
)
def q_h16_suppcnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = (
        _t(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
    )
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != _Q16_BRAND)
        & ~F.col("p_type").startswith("PROMO")
        & F.col("p_size").isin(_Q16_SIZES)
    )
    bad = _t(spark, sf_dir, "supplier").filter(
        (F.col("s_acctbal") < 0) & F.col("s_suppkey").isNotNull()
    )
    return (
        ps.join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume customers
# ---------------------------------------------------------------------------

_Q18_QTY = 300


@register(
    "q_h18_bigorders",
    oracle=(
        "SELECT c_name, c_custkey, o_orderkey, "
        "strftime(o_orderdate, '%Y-%m-%d') AS orderdate, "
        "ROUND(o_totalprice, 2) AS totalprice, "
        "CAST(SUM(l_quantity) AS DOUBLE) AS total_qty "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON o_orderkey = l_orderkey "
        "WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem "
        f"GROUP BY l_orderkey HAVING SUM(l_quantity) > {_Q18_QTY}) "
        "GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice "
        "ORDER BY totalprice DESC, o_orderkey LIMIT 10"
    ),
    doc="TPC-H Q18 (large-volume customer): orders whose total line "
    "quantity exceeds a threshold, with customer attribution — the "
    "HAVING-IN-subquery shape. The engine computes qualifying "
    "orderkeys ONCE (groupBy-sum + filter) and semi-joins them back; "
    "Spark plans the IN as a left-semi hash join, and at TPC-H "
    "selectivity (~1e-4 of orders) the qualifying-key set broadcasts. "
    "Scale: one shuffle for the qty rollup (reused for total_qty), "
    "customer broadcasts, top-10 via TakeOrderedAndProject.",
)
def q_h18_bigorders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > _Q18_QTY)
    )
    return (
        o.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting
# ---------------------------------------------------------------------------

_Q21_NATION = "NATION_5"
_Q21_LATE_DAYS = 60


@register(
    "q_h21_waiting",
    oracle=(
        "WITH supp_ship AS (SELECT l_orderkey, l_suppkey, "
        "MAX(date_diff('day', o_orderdate, l_shipdate)) AS lag_days "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "WHERE o_orderstatus = 'F' GROUP BY l_orderkey, l_suppkey) "
        "SELECT s_name, COUNT(*) AS numwait FROM supp_ship l1 "
        "JOIN supplier ON l1.l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        f"WHERE n_name = '{_Q21_NATION}' "
        f"AND l1.lag_days > {_Q21_LATE_DAYS} "
        "AND EXISTS (SELECT 1 FROM supp_ship l2 "
        "WHERE l2.l_orderkey = l1.l_orderkey "
        "AND l2.l_suppkey <> l1.l_suppkey) "
        "AND NOT EXISTS (SELECT 1 FROM supp_ship l3 "
        "WHERE l3.l_orderkey = l1.l_orderkey "
        "AND l3.l_suppkey <> l1.l_suppkey "
        f"AND l3.lag_days > {_Q21_LATE_DAYS}) "
        "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20"
    ),
    doc="TPC-H Q21 (suppliers who kept orders waiting): for finished "
    "multi-supplier orders, count per supplier the orders where THIS "
    "supplier shipped late and no co-supplier did — the double "
    "correlated EXISTS / NOT EXISTS shape. Adaptation: no "
    "l_receiptdate/l_commitdate in the testdata, so 'late' is "
    "ship-lag > 60 days after order date. The engine rewrites both "
    "correlated subqueries as ONE per-order aggregate (co-supplier "
    "count, late-supplier count) joined back — computing the "
    "EXISTS/NOT-EXISTS pair in a single pass instead of two "
    "semi/anti joins over the fact table. Scale: supp_ship is one "
    "orderkey shuffle (reused by the per-order rollup via AQE), "
    "supplier/nation broadcast, output is a 20-row top-k.",
)
def q_h21_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == _Q21_NATION)
    supp_ship = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
            ).alias("lag_days")
        )
    )
    is_late = (F.col("lag_days") > _Q21_LATE_DAYS).cast("int")
    per_order = supp_ship.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"), F.sum(is_late).alias("n_late")
    )
    return (
        supp_ship.filter(F.col("lag_days") > _Q21_LATE_DAYS)
        .join(per_order, "l_orderkey")
        # EXISTS co-supplier  <=>  n_supp >= 2; NOT EXISTS other late
        # supplier  <=>  this row is the order's only late one.
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )
