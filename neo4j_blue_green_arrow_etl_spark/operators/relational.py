"""Relational operator surface: SURVEY.md §2.12 declared query set.

Each query is a pair: a Spark DataFrame builder (the engine under test)
and a DuckDB oracle SQL string (ANSI-ish, DuckDB dialect). Both sides
derive any non-base tables from ``fixtures`` — one source of truth.

Output discipline (so cross-engine value-hashing is stable):
- every computed/aggregate column is aliased identically on both sides;
- no raw timestamp outputs — format to string or epoch seconds;
- double aggregates are ROUNDed on both sides (floating sums are
  order-dependent; rounding removes last-bit divergence);
- LIMIT queries order by the output keys so selection is deterministic.

Scale notes are attached per query: what shuffles, what broadcasts,
what pushes down. These choices are the 100 TB design, tested small.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import fixtures as FX


@dataclass(frozen=True)
class QuerySpec:
    """One declared query: Spark implementation + optional DuckDB oracle.

    ``alias_of`` marks a driver-window rotation alias (see
    operators/__init__.py): same implementation and oracle under an
    early-alphabet name so the driver's first-50 correctness sample
    reaches families that otherwise sort past its cap. Aliases are NOT
    new operators — bench skips them so no query is timed twice."""

    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    alias_of: str | None = None


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(spark=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def barrier_sort(*sort_cols):
    """Global sort with a materialization barrier before the range
    exchange — use as ``df.transform(barrier_sort("a", "b"))`` in place
    of ``df.orderBy("a", "b")``.

    A bare ``orderBy`` executes every narrow stage above the last
    shuffle TWICE: the RangePartitioner first runs a sampling job to
    pick split points, and while shuffle map outputs are reused across
    jobs, post-shuffle narrow work (joins' probe side, per-pair
    verification like ``levenshtein``, filters) is recomputed for both
    the sample and the real pass. Pushing the finished rows through one
    extra round-robin exchange turns that compute into a reusable
    shuffle map stage, so the sampling pass reads shuffle files instead
    of re-running it — measured 1.9x on q_x24_fuzzy (5.2s -> 2.7s at
    sf0.1, the banded-Levenshtein verify was evaluated twice).

    Use it when the rows feeding the sort were expensive to produce;
    a plan whose last stage is already a cheap aggregate merge gains
    nothing and should keep plain orderBy. At 100 TB the added exchange
    moves only the final result's bytes — the same barrier a
    cache()/checkpoint would add, minus the memory footprint."""

    def _apply(df: DataFrame) -> DataFrame:
        n = df.sparkSession.sparkContext.defaultParallelism
        return df.repartition(n).orderBy(*sort_cols)

    return _apply


def rescue_parallelism(df: DataFrame, *keys: str) -> DataFrame:
    """Scale-adaptive scan rescue (guide: 'input skew — one huge
    unsplittable file... repartition immediately after the read'): when
    a scan yields FEWER partitions than cores — a single small file, or
    one unsplittable row group — every narrow operator above it
    (shingle explode, per-row hashing, Arrow decode) runs on ONE core
    until the first exchange. Hash-repartition by ``keys`` to
    defaultParallelism so the fan-out work parallelizes.

    Deliberately a no-op whenever the scan already has >= cores
    partitions: at 100 TB inputs arrive in thousands of splits and this
    adds NOTHING (no shuffle, no plan change) — the repartition only
    fires on undersized inputs, where the shuffled bytes are by
    definition small. Hash (not round-robin) keying skips the
    sort-before-repartition pass and keeps the row->partition
    assignment deterministic under task retry (SPARK-38388 class of
    bugs). Use a high-cardinality key; callers with order-sensitive
    float aggregation downstream must NOT use this (reordering partial
    sums perturbs last-bit double results) — every current caller
    aggregates ints/exact ratios only.

    Measured (sf0.1, single 0.6 MB documents file -> 1-partition scan):
    q_dedup_ngram-equivalent pipeline 2.29s -> 0.81-0.88s; the same
    rescue on a columnar scan->agg (sssp edge build) LOST 0.25s — only
    rescue scans feeding expensive fan-out, not plain aggregations."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *keys)


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize the events ``ts`` column to TimestampType across data
    generator versions: the current testdata writes timestamp[us]
    (already TimestampType on read); older trees wrote nanosecond int64
    which — under spark.sql.legacy.parquet.nanosAsLong — arrives as a
    bigint and is integer-divided to microseconds here (no double
    roundtrip: ns magnitudes exceed 2^53). Parquet timestamps without
    timezone annotation read as TIMESTAMP_NTZ in Spark 4; cast them to
    TIMESTAMP (numerically a no-op under the UTC session timezone) so
    unix_micros/window expressions downstream resolve uniformly."""
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    if dt == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


# ---------------------------------------------------------------------------
# Scans / projections / filters
# ---------------------------------------------------------------------------


@register(
    "q_s1",
    oracle=(
        "SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, "
        "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
        "strftime(l_shipdate, '%Y-%m-%d') AS l_shipdate_str "
        "FROM lineitem ORDER BY l_orderkey, l_linenumber"
    ),
    doc="S1/S3 full parquet scan (reference neo4j_pq.py:275, 116-126). "
    "Scale: columnar vectorized scan, no shuffle; timestamps projected "
    "to strings for cross-engine hashing.",
)
def q_s1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("l_shipdate_str"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "q_p1",
    oracle=FX.with_clause("nodes_entity")
    + " SELECT nodeId, array_to_string(labels, ',') AS labels FROM nodes_entity ORDER BY nodeId",
    doc="P1-P3 positional rename + CSV label split -> array (reference "
    "neo4j_pq.py:48-51, 70-81); array re-joined for stable hashing.",
)
def q_p1(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes = FX.nodes_entity(spark, sf_dir)
    return nodes.select(
        "nodeId", F.array_join("labels", ",").alias("labels")
    ).orderBy("nodeId")


@register(
    "q_p4",
    oracle=(
        "SELECT o_orderkey FROM orders "
        "WHERE o_orderstatus = 'O' AND o_totalprice > 1000 ORDER BY o_orderkey"
    ),
    doc="P4-P8 conjunctive filters (reference orchestrator.py:253-262). "
    "Scale: both predicates push down to the parquet scan (PushedFilters).",
)
def q_p4(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 1000))
        .select("o_orderkey")
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@register(
    "q_j1",
    oracle=FX.with_clause("edges", "all_nodes")
    + " SELECT e.sourceNodeId FROM edges e "
    "WHERE NOT EXISTS (SELECT 1 FROM all_nodes n WHERE n.nodeId = e.sourceNodeId) "
    "ORDER BY 1",
    doc="J-referential-integrity: edges whose source is not a known node "
    "(expected empty; reference contract neo4j_pq.py:74, 97-100). "
    "Scale: left_anti equi-join, shuffles on the id key; AQE converts to "
    "broadcast when the node side is small.",
)
def q_j1(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = FX.edges(spark, sf_dir)
    n = FX.all_nodes(spark, sf_dir).select("nodeId")
    return (
        e.join(n, e.sourceNodeId == n.nodeId, "left_anti")
        .select("sourceNodeId")
        .orderBy("sourceNodeId")
    )


@register(
    "q_j2",
    oracle=(
        "SELECT c_custkey, n_name FROM customer "
        "JOIN nation ON c_nationkey = n_nationkey ORDER BY c_custkey"
    ),
    doc="Broadcast hash join: tiny dim (nation, 25 rows) broadcast to every "
    "task — zero shuffle of the fact side at any scale.",
)
def q_j2(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("c_custkey", "n_name")
        .orderBy("c_custkey")
    )


@register(
    "q_j3",
    oracle=FX.with_clause("scanned", "processed")
    + " SELECT s.customer_id, s.ts FROM scanned s "
    "WHERE NOT EXISTS (SELECT 1 FROM processed p "
    "WHERE s.customer_id = p.customer_id AND s.ts = p.ts) ORDER BY 1, 2",
    doc="J1/J3 left-anti dedup: new snapshots = scanned minus processed "
    "(reference orchestrator.py:224, 249-251).",
)
def q_j3(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = FX.scanned_df(spark)
    p = FX.processed_df(spark)
    return s.join(p, ["customer_id", "ts"], "left_anti").orderBy("customer_id", "ts")


@register(
    "q_j4",
    oracle=FX.with_clause("dbs", "aliases")
    + " SELECT d.name FROM dbs d "
    "WHERE NOT EXISTS (SELECT 1 FROM aliases a WHERE d.name = a.database) ORDER BY 1",
    doc="J2 alias guard: databases droppable only if no alias points at them "
    "(reference orchestrator.py:410-417).",
)
def q_j4(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = FX.dbs_df(spark)
    a = FX.aliases_df(spark)
    return (
        d.join(a, d.name == a.database, "left_anti").select("name").orderBy("name")
    )


@register(
    "q_j5",
    oracle=(
        "SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_str, "
        "l_extendedprice FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "ORDER BY l_orderkey, l_extendedprice"
    ),
    doc="Large-large sort-merge join (merge hint pins the strategy; at 100 TB "
    "both sides shuffle-sort on the key — the co-location candidate for "
    "bucketing if this join repeats).",
)
def q_j5(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    return (
        li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_str"),
            "l_extendedprice",
        )
        .orderBy("l_orderkey", "l_extendedprice")
    )


@register(
    "q_j6",
    oracle=(
        "SELECT c1.c_custkey AS custkey_a, c2.c_custkey AS custkey_b FROM customer c1 "
        "JOIN customer c2 ON c1.c_nationkey = c2.c_nationkey "
        "AND c1.c_acctbal < c2.c_acctbal AND c1.c_custkey < c2.c_custkey "
        "ORDER BY 1, 2"
    ),
    doc="Range/theta self-join with an equi anchor (c_nationkey) so Spark "
    "executes a hash join on the equi key with residual range predicates — "
    "NOT a cartesian product; partitions by nation at scale.",
)
def q_j6(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    c1 = c.alias("c1")
    c2 = c.alias("c2")
    return (
        c1.join(
            c2,
            (F.col("c1.c_nationkey") == F.col("c2.c_nationkey"))
            & (F.col("c1.c_acctbal") < F.col("c2.c_acctbal"))
            & (F.col("c1.c_custkey") < F.col("c2.c_custkey")),
        )
        .select(
            F.col("c1.c_custkey").alias("custkey_a"),
            F.col("c2.c_custkey").alias("custkey_b"),
        )
        .orderBy("custkey_a", "custkey_b")
    )


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


@register(
    "q_a1",
    oracle=(
        "SELECT l_returnflag, l_linestatus, "
        "ROUND(SUM(l_quantity), 2) AS sum_qty, "
        "ROUND(SUM(l_extendedprice), 2) AS sum_price, "
        "COUNT(*) AS cnt FROM lineitem "
        "GROUP BY l_returnflag, l_linestatus ORDER BY 1, 2"
    ),
    doc="A1-A3 grouped sum/count (TPC-H Q1 core; reference "
    "load_with_aliases.py:131-132). Scale: partial aggregation map-side, "
    "one shuffle on (returnflag, linestatus) — 6 groups, trivially balanced.",
)
def q_a1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.count("*").alias("cnt"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q_a2",
    oracle=FX.with_clause("snapshots")
    + " SELECT customer_id, MAX(ts) AS max_ts FROM snapshots GROUP BY 1 ORDER BY 1",
    doc="A4 max-per-group: latest deployment per customer (reference "
    "orchestrator.py:364-384).",
)
def q_a2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        FX.snapshots_df(spark)
        .groupBy("customer_id")
        .agg(F.max("ts").alias("max_ts"))
        .orderBy("customer_id")
    )


@register(
    "q_a3",
    oracle="SELECT COUNT(DISTINCT l_suppkey) AS n_supp FROM lineitem",
    doc="Distinct aggregate. Scale: two-phase distinct (partial per-partition "
    "dedup, then final); approx_count_distinct variant tested separately "
    "within 5% (tests/test_relational.py).",
)
def q_a3(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(F.countDistinct("l_suppkey").alias("n_supp"))


@register(
    "q_a4",
    oracle=(
        "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt FROM orders "
        "GROUP BY ROLLUP(o_orderstatus, o_orderpriority) "
        "ORDER BY 1 NULLS LAST, 2 NULLS LAST, 3"
    ),
    doc="Grouping-set rollup (no reference counterpart; built-in capability "
    "declared in SURVEY §2.4).",
)
def q_a4(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("cnt"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_last(),
            F.col("o_orderpriority").asc_nulls_last(),
            "cnt",
        )
    )


@register(
    "q_a5",
    oracle=(
        "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt, "
        "ROUND(SUM(o_totalprice), 2) AS total FROM orders "
        "GROUP BY CUBE(o_orderstatus, o_orderpriority) "
        "ORDER BY 1 NULLS LAST, 2 NULLS LAST, 3"
    ),
    doc="Full cube over (status, priority) with count + sum — the other "
    "grouping-set shape §2.4 declares. Catalyst expands the cube into "
    "grouping sets with a single Expand + one shuffle (partial aggs "
    "map-side), not 4 separate scans.",
)
def q_a5(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_last(),
            F.col("o_orderpriority").asc_nulls_last(),
            "cnt",
        )
    )


@register(
    "q_a12_gsets",
    oracle=(
        "SELECT o_orderstatus, o_orderpriority, "
        "GROUPING(o_orderstatus) + 2 * GROUPING(o_orderpriority) AS gid, "
        "COUNT(*) AS cnt FROM orders "
        "GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ()) "
        "ORDER BY gid, 1 NULLS LAST, 2 NULLS LAST"
    ),
    doc="Explicit GROUPING SETS — the third grouping-set shape next to "
    "rollup (q_a4) and cube (q_a5): per-status totals, per-priority "
    "totals, and the grand total in ONE pass, with grouping_id "
    "disambiguating real NULLs from grouping NULLs. Same Expand + one "
    "shuffle physical plan as cube, but expansion factor is "
    "|sets| = 3, not 2^cols — at 100 TB you enumerate exactly the "
    "rollup tiers you need and pay shuffle rows ∝ |sets|.",
)
def q_a12_gsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    # parameterized sql: no temp-view registration, nothing to leak or
    # collide across concurrent/repeated runs
    return spark.sql(
        "SELECT o_orderstatus, o_orderpriority, "
        "grouping(o_orderstatus) + 2 * grouping(o_orderpriority) AS gid, "
        "COUNT(*) AS cnt FROM {o} "
        "GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ()) "
        "ORDER BY gid, o_orderstatus NULLS LAST, o_orderpriority NULLS LAST",
        o=o,
    )


@register(
    "q_j8_multiway",
    oracle=(
        "SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "WHERE r_name = 'ASIA' "
        "GROUP BY n_name ORDER BY revenue DESC, n_name"
    ),
    doc="TPC-H Q5-shaped 6-table join (local supplier volume): the "
    "multiway join-tree showcase. Catalyst reorders; region/nation/"
    "supplier/customer broadcast (small dims), orders-lineitem is the "
    "one sort-merge pair; the r_name filter partition-prunes the "
    "region->nation->supplier chain before the fact tables join. One "
    "big-big shuffle total at any scale.",
)
def q_j8_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# ---------------------------------------------------------------------------
# Windows / sorts / limits
# ---------------------------------------------------------------------------


@register(
    "q_w1",
    oracle=FX.with_clause("snapshots")
    + " SELECT customer_id, ts FROM (SELECT customer_id, ts, "
    "ROW_NUMBER() OVER (PARTITION BY customer_id ORDER BY ts DESC) AS rn "
    "FROM snapshots) WHERE rn <= 2 ORDER BY 1, 2",
    doc="T1 keep-newest-2 retention window (reference orchestrator.py:386-424 "
    "sort+slice, re-expressed as row_number).",
)
def q_w1(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("customer_id").orderBy(F.desc("ts"))
    return (
        FX.snapshots_df(spark)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("customer_id", "ts")
        .orderBy("customer_id", "ts")
    )


@register(
    "q_w2",
    oracle=(
        "SELECT o_custkey, o_orderkey, "
        "ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderdate, o_orderkey "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total "
        "FROM orders ORDER BY o_custkey, o_orderkey"
    ),
    doc="Analytic window with explicit ROWS frame: per-customer running "
    "revenue. Scale: one shuffle on o_custkey then in-partition sort.",
)
def q_w2(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "q_w3",
    oracle=(
        "SELECT user_id, event_id, "
        "LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value "
        "FROM events ORDER BY user_id, event_id"
    ),
    doc="lag/lead analytic window over the event stream; orders on the "
    "raw ts column (TimestampType), which sorts identically in both "
    "engines.",
)
def q_w3(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id", "event_id", F.lag("value").over(w).alias("prev_value")
    ).orderBy("user_id", "event_id")


@register(
    "q_t1",
    oracle=(
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
    ),
    doc="Global top-k: Spark runs TakeOrderedAndProject — per-partition "
    "top-10 then driver merge, no global sort at any scale.",
)
def q_t1(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@register(
    "q_u1",
    oracle=FX.with_clause("nodes_entity", "nodes_address")
    + " SELECT nodeId FROM nodes_entity UNION ALL "
    "SELECT nodeId FROM nodes_address ORDER BY 1",
    doc="U1 union of node-label dirs into one relation (reference "
    "README.md:182-191, neo4j_pq.py:279-285).",
)
def q_u1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ne = FX.nodes_entity(spark, sf_dir).select("nodeId")
    na = FX.nodes_address(spark, sf_dir).select("nodeId")
    return ne.unionByName(na).orderBy("nodeId")


@register(
    "q_u2",
    oracle=(
        "SELECT c_nationkey FROM customer EXCEPT "
        "SELECT s_nationkey FROM supplier ORDER BY 1"
    ),
    doc="EXCEPT (distinct set difference) — U2/J1 set-membership semantics.",
)
def q_u2(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_nationkey")
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("c_nationkey"))
    return c.subtract(s).orderBy("c_nationkey")


@register(
    "q_u3",
    oracle=(
        "SELECT c_nationkey AS nationkey FROM customer INTERSECT "
        "SELECT s_nationkey FROM supplier ORDER BY 1"
    ),
    doc="INTERSECT (distinct) — §2.7's remaining declared set op. Spark "
    "plans it as a left-semi aggregate join; one shuffle per side.",
)
def q_u3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s).orderBy("nationkey")


# ---------------------------------------------------------------------------
# Scalar functions
# ---------------------------------------------------------------------------


@register(
    "q_f1",
    oracle=FX.with_clause("dbs")
    + " SELECT name, string_split(name, '-')[-1] AS ts_part, "
    "UPPER(name) AS upper_name, name LIKE 'customer1-%' AS is_c1 "
    "FROM dbs ORDER BY name",
    doc="F1-F6 string functions: split + last element (reference "
    "orchestrator.py:377-379), upper (neo4j_arrow_error.py:17), prefix test "
    "(orchestrator.py:371).",
)
def q_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = FX.dbs_df(spark)
    return d.select(
        "name",
        F.element_at(F.split("name", "-"), -1).alias("ts_part"),
        F.upper("name").alias("upper_name"),
        F.col("name").startswith("customer1-").alias("is_c1"),
    ).orderBy("name")


@register(
    "q_f2",
    oracle=(
        "SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS date_str, "
        "CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s FROM orders ORDER BY 1"
    ),
    doc="F8 timestamp formatting + epoch seconds (UTC session timezone "
    "pins the semantics; reference simulate_snapshot.py:17).",
)
def q_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("date_str"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    ).orderBy("o_orderkey")


@register(
    "q_f3",
    oracle=(
        "SELECT l_orderkey, l_linenumber, "
        "l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge "
        "FROM lineitem ORDER BY 1, 2"
    ),
    doc="F10 arithmetic expression chain (TPC-H charge). Raw doubles on "
    "purpose: per-row left-to-right double math is bit-identical across "
    "engines, while ROUND() tie-breaking at representational boundaries "
    "is NOT (HALF_UP on exact BigDecimal vs float-multiply) — rounding "
    "is reserved for order-dependent aggregates.",
)
def q_f3(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))).alias("charge"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "q_f4",
    oracle=(
        "SELECT event_id, json_extract_string(props, '$.k') AS k FROM events ORDER BY 1"
    ),
    doc="F11 JSON field extraction from the event props payload "
    "(reference neo4j_arrow_client.py:134-139 JSON round-trip).",
)
def q_f4(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id", F.get_json_object("props", "$.k").alias("k")
    ).orderBy("event_id")


@register(
    "q_f5",
    oracle=FX.with_clause("nodes_entity")
    + " SELECT nodeId, unnest(labels) AS label FROM nodes_entity ORDER BY 1, 2",
    doc="F13/explode: one output row per label (generator/UDTF-shaped "
    "surface over the split label array).",
)
def q_f5(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = FX.nodes_entity(spark, sf_dir)
    return n.select("nodeId", F.explode("labels").alias("label")).orderBy(
        "nodeId", "label"
    )


@register(
    "q_f7_map",
    oracle=(
        "SELECT event_id, 'id,type' AS keys_csv, event_type AS type_val, "
        "CAST(event_id AS VARCHAR) AS id_val FROM events ORDER BY event_id"
    ),
    doc="Map functions (§2.8 declared 'map functions — built-in'): build "
    "a map column with create_map, extract with element_at, enumerate "
    "with map_keys. The oracle mirrors the expected values directly "
    "(DuckDB's map-extract API differs across versions); per-row map, "
    "no shuffle.",
)
def q_f7_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"),
        F.col("event_type"),
        F.lit("id"),
        F.col("event_id").cast("string"),
    )
    return e.select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_csv"),
        F.element_at(m, "type").alias("type_val"),
        F.element_at(m, "id").alias("id_val"),
    ).orderBy("event_id")


@register(
    "q_f8_base64",
    oracle=(
        "SELECT doc_id, to_base64(encode(text)) AS b64, "
        "octet_length(from_base64(to_base64(encode(text)))) AS rt_len "
        "FROM documents WHERE doc_id < 500 ORDER BY doc_id"
    ),
    doc="F12 base64 encode + decode round-trip (reference "
    "neo4j_arrow_client.py:345 base64-encodes auth tokens). RFC 4648 "
    "standard alphabet with padding on both engines; rt_len pins that "
    "unbase64 is the exact inverse. Per-row expression, no shuffle.",
)
def q_f8_base64(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.scalar import b64

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    enc = b64(F.encode("text", "UTF-8"))
    return d.select(
        "doc_id",
        enc.alias("b64"),
        F.octet_length(F.unbase64(enc)).alias("rt_len"),
    ).orderBy("doc_id")


@register(
    "q_f9_bucket",
    oracle=(
        # DuckDB has no width_bucket; for lo=0, hi=600000, n=12 the
        # SQL-standard definition reduces to floor(x/50000)+1 clamped
        # to [0, 13] (o_totalprice is always > 0 here).
        "SELECT LEAST(CAST(FLOOR(o_totalprice / 50000) + 1 AS INT), 13) AS bucket, "
        "COUNT(*) AS cnt, ROUND(MIN(o_totalprice), 2) AS lo, "
        "ROUND(MAX(o_totalprice), 2) AS hi "
        "FROM orders GROUP BY bucket ORDER BY bucket"
    ),
    doc="Equi-width histogram via the SQL-standard width_bucket "
    "(feature binning for model inputs / data profiling). Map-side "
    "partial aggregation means the shuffle carries at most 14 rows per "
    "task (12 buckets + under/overflow) regardless of input size — the "
    "canonical scan-bound profile query at 100 TB.",
)
def q_f9_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.width_bucket("o_totalprice", F.lit(0), F.lit(600000), F.lit(12))
            .cast("int")
            .alias("bucket")
        )
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Streaming-shaped semantics (batch-checkable)
# ---------------------------------------------------------------------------


@register(
    "q_st1",
    oracle=FX.with_clause("arrivals")
    + " SELECT customer_id, MAX(ts) AS max_ts FROM arrivals GROUP BY 1 ORDER BY 1",
    doc="ST2/ST3 latest-wins under out-of-order arrival: micro-batch "
    "simulation folds arrival batches into per-customer max-ts state; the "
    "final state must equal the batch answer regardless of arrival order "
    "(reference orchestrator.py:322-324, 364-384). The true streaming path "
    "lives in streaming/orchestrator.py and is exercised in tests.",
)
def q_st1(spark: SparkSession, sf_dir: str) -> DataFrame:
    arrivals = FX.arrivals_df(spark)
    n_batches = 4
    state: DataFrame | None = None
    for b in range(n_batches):
        batch = arrivals.filter(
            (F.col("arrival_order") % n_batches) == b
        ).select("customer_id", "ts")
        state = batch if state is None else state.unionByName(batch)
        state = state.groupBy("customer_id").agg(F.max("ts").alias("ts"))
    assert state is not None
    return state.select("customer_id", F.col("ts").alias("max_ts")).orderBy("customer_id")


@register(
    "q_st2",
    oracle=(
        "SELECT user_id, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start_s, "
        "COUNT(*) AS cnt FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    doc="Tumbling 1-hour event-time window (batch-mode window(); same "
    "expression runs under readStream with a watermark).",
)
def q_st2(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = normalize_event_ts(_t(spark, sf_dir, "events"))
    return (
        e.groupBy("user_id", F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "cnt",
        )
        .orderBy("user_id", "window_start_s")
    )


@register(
    "q_t2_argmax",
    oracle=(
        "SELECT o_custkey, arg_max(o_orderkey, o_totalprice + o_orderkey / 1e9) AS top_order, "
        "ROUND(MAX(o_totalprice), 2) AS top_price "
        "FROM orders GROUP BY o_custkey ORDER BY o_custkey"
    ),
    doc="Argmax per group (T2: the reference's latest-timestamp argmax, "
    "orchestrator.py:382, generalized): max_by with an orderkey "
    "tie-break folded into the ranking value so both engines pick the "
    "same row when prices tie. One groupBy, map-side partials.",
)
def q_t2_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    rank_val = F.col("o_totalprice") + F.col("o_orderkey") / F.lit(1e9)
    return (
        o.groupBy("o_custkey")
        .agg(
            F.max_by("o_orderkey", rank_val).alias("top_order"),
            F.round(F.max("o_totalprice"), 2).alias("top_price"),
        )
        .orderBy("o_custkey")
    )


@register(
    "q_a7_percentile",
    oracle=(
        "SELECT l_returnflag, "
        "ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50, "
        "ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95 "
        "FROM lineitem GROUP BY 1 ORDER BY 1"
    ),
    doc="Exact interpolated percentiles per group (Spark `percentile` "
    "== DuckDB quantile_cont, both linear interpolation). Exact "
    "percentile requires per-group sort — at 100 TB switch to "
    "approx_percentile (t-digest, mergeable partial state); the exact "
    "form is the oracle for that swap.",
)
def q_a7_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    # ONE percentile agg with an array of fractions: the per-group value
    # buffer is built and sorted once for both quantiles (two separate
    # percentile() calls each keep their own copy — measured ~2x)
    return (
        li.groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, array(0.5D, 0.95D))").alias("ps"))
        .select(
            "l_returnflag",
            F.round(F.element_at("ps", 1), 4).alias("p50"),
            F.round(F.element_at("ps", 2), 4).alias("p95"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_a8_condagg",
    oracle=(
        "SELECT o_custkey, "
        "COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled, "
        "ROUND(SUM(o_totalprice) FILTER (WHERE o_orderpriority LIKE '1%'), 2) AS urgent_total, "
        "ROUND(AVG(CASE WHEN o_totalprice > 100000 THEN 1.0 ELSE 0.0 END), 4) AS big_frac "
        "FROM orders GROUP BY 1 ORDER BY 1"
    ),
    doc="Conditional aggregation (FILTER clause / count_if shape): "
    "three differently-filtered aggregates in ONE pass over one "
    "shuffle — the idiom that replaces three separate scans.",
)
def q_a8_condagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_filled"),
            F.round(
                F.sum(F.when(F.col("o_orderpriority").startswith("1"), F.col("o_totalprice"))),
                2,
            ).alias("urgent_total"),
            F.round(
                F.avg(F.when(F.col("o_totalprice") > 100000, 1.0).otherwise(0.0)), 4
            ).alias("big_frac"),
        )
        .orderBy("o_custkey")
    )


@register(
    "q_j9_part",
    oracle=(
        "SELECT p_type, p_brand, "
        "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue, "
        "COUNT(*) AS n_lines "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    doc="TPC-H Q14-shaped part-dimension join: revenue by part type and "
    "brand. part broadcasts (small dim), lineitem streams through — "
    "zero fact-side shuffle before the aggregation; scan pruned to 4 "
    "lineitem + 3 part columns.",
)
def q_j9_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_type", "p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("p_type", "p_brand")
    )


@register(
    "q_st5_dropdup",
    oracle=FX.with_clause("arrivals")
    + " SELECT DISTINCT customer_id, ts FROM arrivals ORDER BY 1, 2",
    doc="Exactly-once dedup on (customer_id, ts) — the literal Spark "
    "mapping of the reference's processed_snapshots set (ST2, "
    "orchestrator.py:224, 249-251): dropDuplicates on the identity key. "
    "Under readStream the same call is stateful with watermark-based "
    "state expiry; batch mode here for the oracle.",
)
def q_st5_dropdup(spark: SparkSession, sf_dir: str) -> DataFrame:
    arrivals = FX.arrivals_df(spark)
    return (
        arrivals.select("customer_id", "ts")
        .dropDuplicates(["customer_id", "ts"])
        .orderBy("customer_id", "ts")
    )


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "q_a9_pivot",
    oracle=(
        "SELECT user_id, "
        + ", ".join(
            f"COUNT(*) FILTER (WHERE event_type = '{t}') AS n_{t}"
            for t in ("click", "error", "purchase", "signup", "view")
        )
        + " FROM events GROUP BY user_id ORDER BY user_id"
    ),
    doc="Pivot: per-user event counts spread over one column per event "
    "type. The value list is EXPLICIT — pivot without it runs a driver-"
    "side distinct pass over the data to discover columns (two jobs, "
    "schema depends on data: both wrong at 100 TB). With values pinned "
    "it is one partial+final aggregation, exactly like any groupBy.",
)
def q_a9_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .select(
            "user_id",
            *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in _EVENT_TYPES],
        )
        .orderBy("user_id")
    )


@register(
    "q_a10_unpivot",
    oracle=(
        "WITH p AS (SELECT user_id, "
        + ", ".join(
            f"COUNT(*) FILTER (WHERE event_type = '{t}') AS n_{t}"
            for t in ("click", "error", "purchase", "signup", "view")
        )
        + " FROM events GROUP BY user_id) "
        "SELECT user_id, kind, n FROM p "
        "UNPIVOT (n FOR kind IN (n_click, n_error, n_purchase, n_signup, n_view)) "
        "WHERE n > 0 ORDER BY user_id, kind"
    ),
    doc="Unpivot (melt): the inverse reshape, wide per-type count "
    "columns back to (user_id, kind, n) rows via the native unpivot "
    "operator — a per-row Expand, no shuffle beyond the source agg; "
    "zero rows dropped map-side (filter n>0 mirrors UNPIVOT's implicit "
    "NULL-drop so both engines emit identical row sets).",
)
def q_a10_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = q_a9_pivot(spark, sf_dir)
    return (
        wide.unpivot(
            "user_id",
            [f"n_{t}" for t in _EVENT_TYPES],
            "kind",
            "n",
        )
        .filter(F.col("n") > 0)
        .orderBy("user_id", "kind")
    )


# ---------------------------------------------------------------------------
# Skew mitigation surfaced as registry queries: the ORACLE proves the
# salted plans compute exactly what the plain plans compute.
# ---------------------------------------------------------------------------


@register(
    "q_a13_salted",
    oracle=(
        "SELECT l_returnflag, COUNT(*) AS cnt, "
        "ROUND(SUM(l_quantity), 2) AS sum_qty, "
        "ROUND(MAX(l_extendedprice), 2) AS max_price "
        "FROM lineitem GROUP BY 1 ORDER BY 1"
    ),
    doc="Two-phase SALTED aggregation on a 3-value group key (the "
    "worst-case skew shape: 600k rows, 3 groups -> 3 reducers do all "
    "the work in a plain plan). Phase 1 aggregates on (key, "
    "xxhash64-salt%16), spreading each hot group over 16 tasks; phase "
    "2 folds 16 partial rows per key. The DuckDB oracle is the PLAIN "
    "aggregate — the correctness gate itself proves salted == plain, "
    "which only holds for re-aggregable functions (sum/count/min/max; "
    "see functions/skew.py). Deterministic salt (never rand()) keeps "
    "retries and oracle runs reproducible.",
)
def q_a13_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.skew import salted_aggregate

    li = _t(spark, sf_dir, "lineitem")
    out = salted_aggregate(
        li,
        "l_returnflag",
        {
            "cnt": ("*", "count"),
            "sum_qty_raw": ("l_quantity", "sum"),
            "max_price_raw": ("l_extendedprice", "max"),
        },
        salt_from="l_orderkey",
        n_salts=16,
    )
    return out.select(
        "l_returnflag",
        "cnt",
        F.round("sum_qty_raw", 2).alias("sum_qty"),
        F.round("max_price_raw", 2).alias("max_price"),
    ).orderBy("l_returnflag")


@register(
    "q_j11_skewjoin",
    oracle=(
        "SELECT o.o_orderpriority, COUNT(*) AS cnt, "
        "ROUND(SUM(l.l_extendedprice), 2) AS total "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "GROUP BY 1 ORDER BY 1"
    ),
    doc="SALTED equi-join: the fact side's join keys are spread over 16 "
    "deterministic salt buckets and the dimension side is exploded to "
    "match, so a pathologically hot key lands on 16 tasks instead of "
    "one (functions/skew.py:salted_join; left-preserving join types "
    "only — the guard is pytest-pinned). The oracle is the PLAIN join "
    "+ aggregate, proving the salted plan is result-identical. At "
    "100 TB you reach for this when AQE's skew split cannot help (a "
    "single key's hash-aggregate bucket cannot be split by AQE).",
)
def q_j11_skewjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.skew import salted_join

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_extendedprice",
        # (l_orderkey, l_linenumber) is the PK; the salt column must be
        # unique so the hot key's rows spread across all buckets. A
        # 64-bit hash, not a string concat: the salt source rides the
        # fact-side shuffle, so 8 fixed bytes beat a ~12-byte string
        # (and skip the per-row concat) — same salt distribution
        F.xxhash64("l_orderkey", "l_linenumber").alias("_uid"),
    )
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, o, key="l_orderkey", salt_from="_uid")
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("l_extendedprice"), 2).alias("total"),
        )
        .orderBy("o_orderpriority")
    )


Q3_DATE = "1998-06-01"


@register(
    "q_j12_q3",
    oracle=(
        "SELECT l_orderkey, "
        "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue, "
        "strftime(o_orderdate, '%Y-%m-%d') AS orderdate "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        f"WHERE c_mktsegment = 'BUILDING' AND o_orderdate < '{Q3_DATE}' "
        f"AND l_shipdate > '{Q3_DATE}' "
        "GROUP BY l_orderkey, o_orderdate "
        "ORDER BY revenue DESC, l_orderkey LIMIT 10"
    ),
    doc="TPC-H Q3 shape (shipping-priority): segment-filtered customers "
    "join date-filtered orders join ship-date-filtered lineitem, "
    "revenue per order, top-10. The classic selective-join-then-top-k "
    "plan: all three filters push to their scans, customer broadcasts "
    "after its segment filter, the orders<->lineitem join is the one "
    "real shuffle, and the top-10 is TakeOrderedAndProject — no global "
    "sort. Complements q_a1 (Q1) and q_j8_multiway (Q5) and "
    "q_j9_part (Q14).",
)
def q_j12_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < Q3_DATE)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > Q3_DATE)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Disjunctive-predicate join (TPC-H Q19 shape)
# --------------------------------------------------------------------------

_Q19_ARMS = [
    # (brand, size_lo, size_hi, qty_lo, qty_hi)
    ("Brand#12", 1, 5, 1, 11),
    ("Brand#23", 1, 10, 10, 20),
    ("Brand#34", 1, 15, 20, 30),
]


@register(
    "q_j13_q19",
    oracle=(
        "SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue, "
        "COUNT(*) AS n "
        "FROM lineitem JOIN part ON p_partkey = l_partkey WHERE "
        + " OR ".join(
            f"(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi} "
            f"AND l_quantity BETWEEN {qlo} AND {qhi})"
            for b, slo, shi, qlo, qhi in _Q19_ARMS
        )
    ),
    doc="TPC-H Q19 shape: a disjunction of multi-column predicate arms "
    "spanning BOTH join sides (brand+size on part, quantity on "
    "lineitem). The interesting plan property: Catalyst derives "
    "single-side implied filters from the OR (brand IN (...), size <= "
    "max, quantity ranges) and pushes them below the join into the "
    "scans, so the join probes a pre-filtered fraction of each table "
    "while the full disjunction is re-checked post-join. Part side is "
    "broadcast (dimension-sized); revenue rounded to cents.",
)
def q_j13_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    arms = None
    for b, slo, shi, qlo, qhi in _Q19_ARMS:
        arm = (
            (F.col("p_brand") == b)
            & F.col("p_size").between(slo, shi)
            & F.col("l_quantity").between(qlo, qhi)
        )
        arms = arm if arms is None else (arms | arm)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(arms)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n"),
        )
    )


# --------------------------------------------------------------------------
# Dataset profiling (per-column stats in one pass)
# --------------------------------------------------------------------------

_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate", "o_orderstatus"]


@register(
    "q_prof1",
    oracle=(
        " UNION ALL ".join(
            f"SELECT '{c}' AS column_name, COUNT(*) AS n_rows, "
            f"COUNT(*) - COUNT({c}) AS n_null, "
            f"COUNT(DISTINCT {c}) AS n_distinct FROM orders"
            for c in _PROFILE_COLS
        )
        + " ORDER BY column_name"
    ),
    doc="Dataset profiling: per-column row/null/distinct counts over "
    "orders, the schema-quality sweep every ingestion pipeline runs "
    "before training-data acceptance. ONE scan: all per-column "
    "aggregates are computed in a single aggregate node (Catalyst "
    "collapses the 15 expressions into one pass), then a stack() "
    "unpivot emits the long-form report — vs the naive per-column "
    "UNION of scans the oracle spells out. Scale: count_distinct "
    "shuffles per-column partial sketches, not rows; swap in "
    "approx_count_distinct (q_a3/q_a11_hll) when exactness is not "
    "required at 100 TB.",
)
def q_prof1(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count("*").alias(f"{c}__rows"),
            (F.count("*") - F.count(c)).alias(f"{c}__null"),
            F.countDistinct(c).alias(f"{c}__distinct"),
        ]
    wide = o.agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', {c}__rows, {c}__null, {c}__distinct" for c in _PROFILE_COLS
    )
    return (
        wide.selectExpr(
            f"stack({len(_PROFILE_COLS)}, {stack_expr}) AS "
            "(column_name, n_rows, n_null, n_distinct)"
        )
        .orderBy("column_name")
    )


# --------------------------------------------------------------------------
# Ratio-to-report window (percent of partition total)
# --------------------------------------------------------------------------


@register(
    "q_w8_share",
    oracle=(
        "SELECT o_orderkey, o_custkey, "
        "ROUND(o_totalprice / SUM(o_totalprice) OVER (PARTITION BY o_custkey), 6) "
        "AS share FROM orders ORDER BY o_custkey, o_orderkey"
    ),
    doc="Ratio-to-report: each order's share of its customer's total "
    "spend — an UNORDERED window (whole-partition frame, no sort "
    "required within the partition beyond the shuffle). One shuffle on "
    "o_custkey computes the partition sum and reuses the same exchange "
    "for the projection; the alternative groupBy+join-back costs a "
    "second shuffle and a join. Scale: partition-total windows are the "
    "cheapest window class (no ORDER BY -> no per-partition sort).",
)
def q_w8_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            F.round(
                F.col("o_totalprice") / F.sum("o_totalprice").over(w), 6
            ).alias("share"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# --------------------------------------------------------------------------
# Null-safe join semantics (<=> / IS NOT DISTINCT FROM)
# --------------------------------------------------------------------------


@register(
    "q_j14_nullsafe",
    oracle=(
        "WITH e AS (SELECT NULLIF(CAST(json_extract_string(props, '$.k') AS INT) % 7, 0) AS nk "
        "FROM events), d AS (SELECT DISTINCT nk FROM e) "
        "SELECT d.nk, COUNT(*) AS n FROM d JOIN e ON d.nk IS NOT DISTINCT FROM e.nk "
        "GROUP BY d.nk ORDER BY d.nk NULLS LAST"
    ),
    doc="Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): the key "
    "domain includes NULL (props.k % 7 nulled at 0) and the join must "
    "match NULL to NULL — a plain equi-join silently drops that whole "
    "group, the classic CDC/dimension-lookup bug. Spark plans <=> as a "
    "regular hash join (NULL hashes like a value under null-safe "
    "semantics), so the scale properties are identical to q_j2; the "
    "query pins the semantic difference with the NULL group's count in "
    "the output.",
)
def q_j14_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").select(
        F.nullif(
            F.get_json_object("props", "$.k").cast("int") % 7, F.lit(0)
        ).alias("nk")
    )
    d = e.distinct().withColumnRenamed("nk", "dk")
    return (
        d.join(e, d.dk.eqNullSafe(e.nk))
        .groupBy(F.col("dk").alias("nk"))
        .agg(F.count("*").alias("n"))
        .orderBy(F.asc_nulls_last("nk"))
    )


# --------------------------------------------------------------------------
# Robust statistics per group (median + MAD)
# --------------------------------------------------------------------------


@register(
    "q_a14_mad",
    oracle=(
        "WITH med AS (SELECT c_nationkey, quantile_cont(c_acctbal, 0.5) AS med "
        "FROM customer GROUP BY 1) "
        "SELECT c.c_nationkey, ROUND(m.med, 4) AS med, "
        "ROUND(quantile_cont(ABS(c.c_acctbal - m.med), 0.5), 4) AS mad "
        "FROM customer c JOIN med m USING (c_nationkey) "
        "GROUP BY c.c_nationkey, m.med ORDER BY c.c_nationkey"
    ),
    doc="Robust per-group statistics: median and median-absolute-"
    "deviation of customer balances per nation — the outlier-resistant "
    "dispersion pair data-quality monitors use where mean/stddev "
    "mislead. Two aggregation passes by necessity (MAD is a median OF "
    "deviations FROM a median); the 25-row median table broadcasts "
    "back onto the scan so the second pass adds no extra shuffle of "
    "the fact table beyond its own groupBy. Exact interpolated "
    "percentile both sides (== quantile_cont); at 100 TB swap "
    "approx_percentile exactly as q_a7 documents.",
)
def q_a14_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_nationkey", "c_acctbal")
    med = c.groupBy("c_nationkey").agg(
        F.expr("percentile(c_acctbal, 0.5D)").alias("med")
    )
    return (
        c.join(F.broadcast(med), "c_nationkey")
        .groupBy("c_nationkey", "med")
        .agg(
            F.expr("percentile(abs(c_acctbal - med), 0.5D)").alias("mad_raw")
        )
        .select(
            "c_nationkey",
            F.round("med", 4).alias("med"),
            F.round("mad_raw", 4).alias("mad"),
        )
        .orderBy("c_nationkey")
    )


# --------------------------------------------------------------------------
# Data-quality expectations suite
# --------------------------------------------------------------------------

DQ_VALUE_CAP = 300.0  # events.value acceptance ceiling (above p99.9 at every sf, below each sf max -> always fires)


@register(
    "q_dq1_expectations",
    oracle=(
        "SELECT 'events_value_le_cap' AS rule, "
        f"(SELECT COUNT(*) FROM events WHERE value > {DQ_VALUE_CAP}) AS violations "
        "UNION ALL SELECT 'orders_fk_customer', "
        "(SELECT COUNT(*) FROM orders o LEFT JOIN customer c "
        "ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL) "
        "UNION ALL SELECT 'orders_pk_unique', "
        "(SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders "
        "GROUP BY 1 HAVING COUNT(*) > 1)) "
        "UNION ALL SELECT 'orders_price_positive', "
        "(SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0) "
        "UNION ALL SELECT 'orders_status_enum', "
        "(SELECT COUNT(*) FROM orders WHERE o_orderstatus NOT IN ('O', 'F', 'P')) "
        "ORDER BY rule"
    ),
    doc="Data-quality expectations suite: named acceptance rules -> "
    "violation counts (primary-key uniqueness, referential integrity "
    "to customer, value-range, enum-domain, and a numeric cap that "
    "actually FIRES on this data so the non-zero path is exercised). "
    "The deequ/great-expectations contract as a single DataFrame "
    "union. Plan: each rule is an independent aggregate; the FK check "
    "is a broadcast LEFT ANTI (customer is the small side); uniqueness "
    "is a digest-width groupBy. Scale: rules run as one job, each "
    "O(one scan) with map-side reduction — violation counts, never "
    "violating rows, cross the wire.",
)
def q_dq1_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    e = _t(spark, sf_dir, "events")

    def one(rule: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(rule).alias("rule"),
            F.coalesce(F.first("violations"), F.lit(0)).alias("violations"),
        )

    value_cap = e.filter(F.col("value") > DQ_VALUE_CAP).agg(
        F.count("*").alias("violations")
    )
    fk = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count("*").alias("violations"))
    )
    pk = (
        o.groupBy("o_orderkey")
        .count()
        .filter(F.col("count") > 1)
        .agg(F.count("*").alias("violations"))
    )
    price = o.filter(F.col("o_totalprice") <= 0).agg(
        F.count("*").alias("violations")
    )
    enum = o.filter(~F.col("o_orderstatus").isin("O", "F", "P")).agg(
        F.count("*").alias("violations")
    )
    return (
        one("events_value_le_cap", value_cap)
        .unionByName(one("orders_fk_customer", fk))
        .unionByName(one("orders_pk_unique", pk))
        .unionByName(one("orders_price_positive", price))
        .unionByName(one("orders_status_enum", enum))
        .orderBy("rule")
    )


# --------------------------------------------------------------------------
# Heavy hitters per group (top-k frequent values)
# --------------------------------------------------------------------------

HH_K = 3


@register(
    "q_a15_heavyhitters",
    oracle=(
        "SELECT user_id, event_type, n FROM ("
        " SELECT user_id, event_type, COUNT(*) AS n,"
        " row_number() OVER (PARTITION BY user_id"
        "   ORDER BY COUNT(*) DESC, event_type) AS rk"
        " FROM events GROUP BY 1, 2"
        f") WHERE rk <= {HH_K} ORDER BY user_id, n DESC, event_type"
    ),
    doc=f"Heavy hitters: each user's top-{HH_K} event types by "
    "frequency (ties to the alphabetically-first type). One groupBy "
    "(map-side combined: the shuffle carries (user, type, partial "
    "count), bounded by user x alphabet) + one window on the ALREADY "
    "AGGREGATED table — the window input is group-cardinality, not "
    "event-cardinality. Scale: for unbounded type alphabets swap the "
    "exact count for a count-min/space-saving sketch; this exact form "
    "is that swap's oracle, the same role q_a7 plays for "
    "approx_percentile.",
)
def q_a15_heavyhitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), "event_type")
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= HH_K)
        .select("user_id", "event_type", "n")
        .orderBy("user_id", F.desc("n"), "event_type")
    )


# --------------------------------------------------------------------------
# Statistical-moment aggregates (corr / covar / stddev / variance)
# --------------------------------------------------------------------------


@register(
    "q_a16_stats",
    oracle=(
        "SELECT l_returnflag, "
        "ROUND(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr, "
        "ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar, "
        "ROUND(stddev_samp(l_extendedprice), 2) AS price_stddev, "
        "ROUND(var_pop(l_quantity), 4) AS qty_var "
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    doc="Statistical-moment aggregate family: Pearson correlation, "
    "sample covariance, sample stddev, and population variance of "
    "lineitem quantity/price per return flag — the profiling moments a "
    "feature-drift monitor tracks. All four are single-pass streaming "
    "aggregates (sum, sum-of-squares, cross-product accumulators) with "
    "map-side partials, so the shuffle carries one accumulator row per "
    "(partition, flag): identical cost to a plain SUM at any scale. "
    "Definitions are engine-identical (corr/covar_samp/stddev_samp/"
    "var_pop); skewness/kurtosis deliberately excluded — Spark uses "
    "population formulas, DuckDB bias-corrected sample formulas, so "
    "they are not cross-engine comparable. Results rounded: moment "
    "accumulation order differs across engines in the last float bits.",
)
def q_a16_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias(
                "qty_price_corr"
            ),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
                "qty_price_covar"
            ),
            F.round(F.stddev_samp("l_extendedprice"), 2).alias("price_stddev"),
            F.round(F.var_pop("l_quantity"), 4).alias("qty_var"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# TPC-H Q22 shape: scalar-average gate + anti-join + substring grouping
# --------------------------------------------------------------------------

Q22_CUTOFF = "2000-06-01"  # "dormant" = no order on/after this date


@register(
    "q_j15_q22",
    oracle=(
        "SELECT cntrycode, COUNT(*) AS numcust, "
        "ROUND(SUM(c_acctbal), 2) AS totacctbal FROM ("
        " SELECT lpad(CAST(c_nationkey AS VARCHAR), 2, '0') AS cntrycode,"
        "        c_acctbal"
        " FROM customer c"
        " WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer"
        "                    WHERE c_acctbal > 0.0)"
        " AND NOT EXISTS (SELECT 1 FROM orders o"
        "                 WHERE o.o_custkey = c.c_custkey"
        f"                 AND o.o_orderdate >= DATE '{Q22_CUTOFF}')"
        ") GROUP BY cntrycode ORDER BY cntrycode"
    ),
    doc="TPC-H Q22 shape (global-customer-distribution): customers with "
    f"above-average balance and no order since {Q22_CUTOFF} (every "
    "custkey in this generator has SOME order, so the date predicate "
    "inside the NOT EXISTS keeps the anti-join non-vacuous at every "
    "SF — Q22's 'dormant customer' semantics). Exercises a scalar "
    "subquery (the positive-balance average) "
    "feeding a filter, a NOT EXISTS anti-join, and substring-derived "
    "grouping in one plan. Scale: the scalar average is a one-row "
    "broadcast gate evaluated before the join; the anti-join shuffles "
    "on custkey (or broadcasts the distinct-custkey side when orders "
    "is pre-aggregated); the final groupBy is over the tiny country-"
    "code alphabet so its shuffle is a few dozen partial rows. This "
    "testdata has no c_phone column, so the country code is derived "
    "as zero-padded c_nationkey, identically in both engines — the "
    "substring-grouping shape of Q22 is preserved.",
)
def q_j15_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(Q22_CUTOFF).cast("date"))
        .select("o_custkey")
    )
    avg_pos = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    return (
        c.join(F.broadcast(avg_pos))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select(
            F.lpad(F.col("c_nationkey").cast("string"), 2, "0").alias(
                "cntrycode"
            ),
            "c_acctbal",
        )
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


# --------------------------------------------------------------------------
# URL parsing (web-corpus provenance columns)
# --------------------------------------------------------------------------


@register(
    "q_f12_url",
    oracle=(
        "WITH u AS (SELECT doc_id, 'https://' || source || "
        "'.example.com/docs/' || CAST(doc_id AS VARCHAR) || '?lang=' || lang "
        "AS url FROM documents) "
        "SELECT doc_id, "
        "regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host, "
        "regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path, "
        "regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS lang_param "
        "FROM u ORDER BY doc_id"
    ),
    doc="URL decomposition — the provenance columns every web-scraped "
    "training corpus carries (host for per-domain capping/blocklists, "
    "path for boilerplate heuristics, query params for tracking "
    "stripping). The testdata has no URL column, so one is synthesized "
    "deterministically from (source, doc_id, lang) on BOTH engines, "
    "then parsed: Spark with the built-in parse_url (HOST/PATH/QUERY-"
    "key extraction, JVM codegen), the oracle with equivalent anchored "
    "regexes. Scale: pure map-side column expressions — no shuffle, "
    "prunes to three input columns; this is the normalize step that "
    "feeds q_x13_sample-style per-domain capping at 100 TB.",
)
def q_f12_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Semi-structured Variant decode (Spark 4 VariantType)
# --------------------------------------------------------------------------


@register(
    "q_f13_variant",
    oracle=(
        "SELECT event_type, "
        "COUNT(*) AS n, "
        "CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k, "
        "COUNT(*) FILTER (WHERE json_extract_string(props, '$.missing') "
        "IS NOT NULL) AS n_missing_key "
        "FROM events GROUP BY event_type ORDER BY event_type"
    ),
    doc="Semi-structured decode via Spark 4 VariantType: parse the JSON "
    "props payload ONCE into a variant (binary-encoded, typed access "
    "without re-parsing), then extract typed fields with "
    "try_variant_get — including a missing-path probe that must yield "
    "NULL, not an error. The oracle is classic per-access JSON string "
    "extraction; identical results prove the variant path's typed "
    "semantics. Scale: variant parse + field access are JVM codegen "
    "expressions; for repeated multi-field access variant beats "
    "get_json_object's per-call re-parse, the reason warehouses adopted "
    "it for telemetry columns exactly like this one. Map-side partial "
    "aggs; shuffle is alphabet-sized.",
)
def q_f13_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").select("event_type", "props")
    v = F.parse_json("props")
    return (
        e.select(
            "event_type",
            F.try_variant_get(v, "$.k", "int").alias("k"),
            F.try_variant_get(v, "$.missing", "string").alias("miss"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.count("miss").alias("n_missing_key"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Snapshot diff (blue vs green version comparison)
# --------------------------------------------------------------------------

DIFF_OLD_MOD = 10  # old version drops keys % 10 == 0
DIFF_NEW_MOD = 7  # new version drops keys % 7 == 0
DIFF_CHG_MOD = 3  # new version bumps price on keys % 3 == 0


@register(
    "q_x30_snapdiff",
    oracle=(
        "WITH cents AS (SELECT o_orderkey AS k, "
        "CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c FROM orders), "
        f"old_v AS (SELECT k, c FROM cents WHERE k % {DIFF_OLD_MOD} <> 0), "
        "new_v AS (SELECT k, "
        f"CASE WHEN k % {DIFF_CHG_MOD} = 0 "
        "THEN (c * 11 + 5) // 10 ELSE c END AS c "
        f"FROM cents WHERE k % {DIFF_NEW_MOD} <> 0) "
        "SELECT CASE WHEN o.k IS NULL THEN 'added' "
        "WHEN n.k IS NULL THEN 'removed' "
        "WHEN o.c <> n.c THEN 'changed' ELSE 'unchanged' END AS change_type, "
        "COUNT(*) AS n_rows, "
        "CAST(SUM(COALESCE(n.c, 0) - COALESCE(o.c, 0)) AS BIGINT) AS delta_cents "
        "FROM old_v o FULL OUTER JOIN new_v n ON o.k = n.k "
        "GROUP BY 1 ORDER BY 1"
    ),
    doc="Snapshot diff — the blue/green question 'what changed between "
    "versions' as a FULL OUTER JOIN with row classification "
    "(added/removed/changed/unchanged) and a value-delta aggregate in "
    "exact integer cents: prices convert to cents ONCE and the 10% "
    "bump is pure integer arithmetic ((c*11+5) DIV 10) — double sums "
    "at 1e8 magnitude drift across engines' summation orders, and "
    "even per-row ROUND(p*1.1, 2) splits on representation boundaries. "
    "The two versions derive deterministically from orders (drop-mod "
    "key sets, price bump on a third mod) so both engines diff "
    "identical inputs. Plan: full outer sort-merge on the key — both "
    "sides shuffle ONCE; the classifier and delta are post-join "
    "expressions, the final groupBy is 4 rows. Scale: exactly a "
    "large-large join; at 100 TB diff cost ∝ the two snapshots' scan + "
    "one co-partitioned shuffle, and bucketed-at-rest versions "
    "(test_bucketing's layout) drop even that exchange. The row-level "
    "form (drop the groupBy) feeds the orchestrator's promote/audit "
    "report.",
)
def q_x30_snapdiff(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
    )
    old_v = o.filter(F.col("k") % DIFF_OLD_MOD != 0).select(
        F.col("k").alias("k_old"), F.col("c").alias("c_old")
    )
    new_v = o.filter(F.col("k") % DIFF_NEW_MOD != 0).select(
        F.col("k").alias("k_new"),
        F.when(
            F.col("k") % DIFF_CHG_MOD == 0,
            F.expr("CAST((c * 11 + 5) DIV 10 AS BIGINT)"),
        )
        .otherwise(F.col("c"))
        .alias("c_new"),
    )
    joined = old_v.join(
        new_v, F.col("k_old") == F.col("k_new"), "full_outer"
    )
    change = (
        F.when(F.col("k_old").isNull(), "added")
        .when(F.col("k_new").isNull(), "removed")
        .when(F.col("c_old") != F.col("c_new"), "changed")
        .otherwise("unchanged")
    )
    return (
        joined.groupBy(change.alias("change_type"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(
                F.coalesce("c_new", F.lit(0)) - F.coalesce("c_old", F.lit(0))
            ).alias("delta_cents"),
        )
        .orderBy("change_type")
    )


# ---------------------------------------------------------------------------
# Bloom-style prefiltered semi-join (round 4)
# ---------------------------------------------------------------------------

BLOOM_BUCKETS = 1 << 16  # buckets per hash function (bounded broadcast size)


@register(
    "q_j16_bloom",
    oracle=(
        "SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n, "
        "ROUND(SUM(l_quantity), 2) AS sum_qty "
        "FROM lineitem WHERE l_orderkey IN ("
        " SELECT o_orderkey FROM orders"
        " WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000) "
        "GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    doc="Bloom-prefiltered semi-join: lineitem rows whose order is "
    "urgent+expensive, aggregated per returnflag. The filter side's keys "
    "are folded into a Bloom-style structure with k=2 hash functions "
    f"materialized as two DISTINCT bucket sets (hash % {BLOOM_BUCKETS}) "
    "— bounded broadcast payload no matter how many keys the dim has — "
    "and the big side is prefiltered by two broadcast semi-joins on "
    "bucket membership before the EXACT semi-join removes the false "
    "positives, so results are precise. Scale: this is the manual twin "
    "of Spark's runtime bloom filter (spark.sql.optimizer.runtime."
    "bloomFilter.*, which only triggers on selective shuffle joins); "
    "the prefilter cuts the probe side's shuffle volume by the bloom's "
    "selectivity while the broadcast stays O(BUCKETS) — the knob that "
    "matters when the dim's key set itself is too big to broadcast.",
)
def q_j16_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    keys = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > 150000)
        )
        .select("o_orderkey")
    )
    m = F.lit(BLOOM_BUCKETS)
    b1 = keys.select(
        F.pmod(F.xxhash64("o_orderkey"), m).alias("b1")
    ).distinct()
    b2 = keys.select(
        F.pmod(F.xxhash64(F.lit("seed2"), F.col("o_orderkey")), m).alias("b2")
    ).distinct()
    pre = (
        li.withColumn("b1", F.pmod(F.xxhash64("l_orderkey"), m))
        .join(F.broadcast(b1), "b1", "left_semi")
        .withColumn("b2", F.pmod(F.xxhash64(F.lit("seed2"), F.col("l_orderkey")), m))
        .join(F.broadcast(b2), "b2", "left_semi")
    )
    exact = pre.join(
        keys, pre["l_orderkey"] == keys["o_orderkey"], "left_semi"
    )
    return (
        exact.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Market-basket pair co-occurrence (round 4, wave 2)
# ---------------------------------------------------------------------------

BASKET_MIN_SUPPORT = 3  # orders a pair must co-occur in
BASKET_TOP = 50


@register(
    "q_a20_basket",
    oracle=(
        "WITH items AS ("
        " SELECT DISTINCT l_orderkey AS ok, l_partkey AS part FROM lineitem"
        "), pairs AS ("
        " SELECT a.part AS part_a, b.part AS part_b,"
        " CAST(COUNT(*) AS BIGINT) AS support"
        " FROM items a JOIN items b ON a.ok = b.ok AND a.part < b.part"
        " GROUP BY 1, 2"
        f") SELECT part_a, part_b, support FROM ("
        " SELECT *, ROW_NUMBER() OVER ("
        "   ORDER BY support DESC, part_a, part_b) AS rn"
        f" FROM pairs WHERE support >= {BASKET_MIN_SUPPORT})"
        f" WHERE rn <= {BASKET_TOP}"
        " ORDER BY support DESC, part_a, part_b"
    ),
    doc=f"Market-basket pair mining: part pairs co-occurring in >= "
    f"{BASKET_MIN_SUPPORT} orders, top {BASKET_TOP} by support — the "
    "co-occurrence primitive behind recommendations and FP-growth's "
    "first pass. Pair generation self-joins the DISTINCT (order, item) "
    "table on the order key, so pair volume is bounded by "
    "sum(basket_size^2) — baskets are small by nature (TPC-H ~7 "
    "lines), which is what makes basket mining tractable where "
    "document-pair mining needs LSH. The support filter then cuts the "
    "pair table before ranking; ranking is a top-k window, not a "
    "global sort. Scale: one distinct shuffle, one self equi-join on "
    "the basket key, one agg; a pathological mega-basket is the q_x24 "
    "hot-block shape and would get the same salt treatment.",
)
def q_a20_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part"))
        .distinct()
    )
    a = items.select("ok", F.col("part").alias("part_a"))
    b = items.select("ok", F.col("part").alias("part_b"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= BASKET_MIN_SUPPORT)
    )
    # top-k via sort+limit: compiles to TakeOrderedAndProject (per-
    # partition heaps + one k-row merge) — the old global row_number
    # window funneled every surviving pair through a single window
    # task before the rank filter; same deterministic total order,
    # identical rows (r12)
    return pairs.orderBy(F.desc("support"), "part_a", "part_b").limit(
        BASKET_TOP
    )
