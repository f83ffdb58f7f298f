"""Deterministic derived tables shared by Spark queries and DuckDB oracles.

FIXTURES.md §2 defines graph-snapshot tables derived from the TPC-H-ish
base tables; §3 defines small control-plane metadata tables. This module
is the single source of truth: each table has BOTH a Spark DataFrame
builder and a DuckDB CTE SQL string generated from the same Python
constants/derivation rules, so the two sides cannot drift.

Graph derivations (FIXTURES.md §2, mirroring reference data contracts
neo4j_pq.py:70-81, 93-103 and setup_demo_data.py:27-28):

  nodes_entity  : one row per customer  (id 'E'||c_custkey)
  nodes_address : one row per supplier  (id 'A'||s_suppkey)
  edges         : HAS_PRINCIPAL_ADDRESS (all customers)
                  + HAS_MAILING_ADDRESS (even c_custkey)
                  + HAS_AGENT_ADDRESS   (c_custkey % 3 = 0)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .sources.snapshot import normalize_edges, normalize_nodes

# --------------------------------------------------------------------------
# Control-plane constants (FIXTURES.md §3)
# --------------------------------------------------------------------------

CUSTOMERS: tuple[str, ...] = ("customer1", "customer2", "customer3")
BASE_TS: tuple[int, ...] = (1767741427, 1767741527)  # setup_demo_data.py:27-28
EXTRA_TS: tuple[int, ...] = (1767741627, 1767741727)
NEW_TS: int = 1767741827

SNAPSHOT_PAIRS: list[tuple[str, int]] = [
    (c, t) for c in CUSTOMERS for t in (*BASE_TS, *EXTRA_TS)
]
SCANNED_PAIRS: list[tuple[str, int]] = SNAPSHOT_PAIRS + [(c, NEW_TS) for c in CUSTOMERS]
PROCESSED_PAIRS: list[tuple[str, int]] = [(c, t) for c, t in SNAPSHOT_PAIRS if t <= max(BASE_TS)]
DB_NAMES: list[str] = [f"{c}-{t}" for c, t in SNAPSHOT_PAIRS] + ["neo4j"]
ALIAS_ROWS: list[tuple[str, str]] = [(c, f"{c}-{max(EXTRA_TS)}") for c in CUSTOMERS]

# Deliberately out-of-order arrival sequence (deterministic permutation
# of SNAPSHOT_PAIRS; late-data test per reference orchestrator.py:322-324).
ARRIVAL_ROWS: list[tuple[str, int, int]] = [
    (c, t, i + 1)
    for i, (c, t) in enumerate(
        sorted(SNAPSHOT_PAIRS, key=lambda p: ((p[1] * 7 + len(p[0]) + ord(p[0][-1])) % 13, p[0], p[1]))
    )
]


# --------------------------------------------------------------------------
# Spark builders — control plane
# --------------------------------------------------------------------------

_PAIR_SCHEMA = T.StructType(
    [
        T.StructField("customer_id", T.StringType(), False),
        T.StructField("ts", T.LongType(), False),
    ]
)


def snapshots_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(SNAPSHOT_PAIRS, _PAIR_SCHEMA)


def scanned_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(SCANNED_PAIRS, _PAIR_SCHEMA)


def processed_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(PROCESSED_PAIRS, _PAIR_SCHEMA)


def dbs_df(spark: SparkSession) -> DataFrame:
    schema = T.StructType([T.StructField("name", T.StringType(), False)])
    return spark.createDataFrame([(n,) for n in DB_NAMES], schema)


def aliases_df(spark: SparkSession) -> DataFrame:
    schema = T.StructType(
        [
            T.StructField("name", T.StringType(), False),
            T.StructField("database", T.StringType(), False),
        ]
    )
    return spark.createDataFrame(ALIAS_ROWS, schema)


def arrivals_df(spark: SparkSession) -> DataFrame:
    schema = T.StructType(
        [
            T.StructField("customer_id", T.StringType(), False),
            T.StructField("ts", T.LongType(), False),
            T.StructField("arrival_order", T.LongType(), False),
        ]
    )
    return spark.createDataFrame(ARRIVAL_ROWS, schema)


# --------------------------------------------------------------------------
# Spark builders — graph tables derived from base tables
# --------------------------------------------------------------------------


def _customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/customer.parquet")


def _supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/supplier.parquet")


def raw_entity_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional node table (pre-normalization contract): columns are
    (id, LABELS csv, name, acctbal, segment) — FIXTURES.md §2."""
    c = _customer(spark, sf_dir)
    return c.select(
        F.concat(F.lit("E"), F.col("c_custkey").cast("string")).alias("id"),
        F.when(F.col("c_custkey") % 2 == 0, F.lit("Entity"))
        .otherwise(F.lit("Entity,Company"))
        .alias("LABELS"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("segment"),
    )


def raw_address_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _supplier(spark, sf_dir)
    return s.select(
        F.concat(F.lit("A"), F.col("s_suppkey").cast("string")).alias("id"),
        F.lit("Address").alias("LABELS"),
        F.col("s_name").alias("name"),
        F.col("s_nationkey").alias("nationkey"),
    )


EDGE_TYPES: tuple[tuple[str, str], ...] = (
    # (relationship type, SQL predicate on c_custkey; "TRUE" = all rows)
    ("HAS_PRINCIPAL_ADDRESS", "TRUE"),
    ("HAS_MAILING_ADDRESS", "c_custkey % 2 = 0"),
    ("HAS_AGENT_ADDRESS", "c_custkey % 3 = 0"),
)


def raw_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional edge table: (src, dst, type, weight) — FIXTURES.md §2."""
    c = _customer(spark, sf_dir)
    parts = []
    for rel_type, predicate in EDGE_TYPES:
        parts.append(
            c.filter(F.expr(predicate)).select(
                F.concat(F.lit("E"), F.col("c_custkey").cast("string")).alias("src"),
                F.concat(F.lit("A"), (F.lit(1) + F.col("c_custkey") % 10).cast("string")).alias("dst"),
                F.lit(rel_type).alias("type"),
                (F.col("c_acctbal") / 100.0).alias("weight"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def nodes_entity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized entity nodes: nodeId, labels array<string>, props."""
    return normalize_nodes(raw_entity_nodes(spark, sf_dir))


def nodes_address(spark: SparkSession, sf_dir: str) -> DataFrame:
    return normalize_nodes(raw_address_nodes(spark, sf_dir))


def all_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return nodes_entity(spark, sf_dir).unionByName(
        nodes_address(spark, sf_dir), allowMissingColumns=True
    )


def edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return normalize_edges(raw_edges(spark, sf_dir))


_REPLICA_STRIDE = 10_000_000  # id headroom between snapshot replicas


def _replicate_ids(df: DataFrame, id_cols: tuple[str, ...], scale: int) -> DataFrame:
    """``scale`` shifted copies of a positional table: each replica adds
    rep*stride to the numeric tail of every prefixed id ('E123' ->
    'E10000123'), so node identity, edge endpoints, and graph topology
    replicate per copy instead of collapsing into one hot graph. The
    replica index comes from a broadcast crossJoin with range(scale) —
    one tiny BNLJ, not a ``scale``-way union plan."""
    if scale <= 1:
        return df
    # Guard against silent replica-range collisions: if a base id's
    # numeric tail reaches the stride (e.g. sf>=100 custkeys run past
    # 10M), replica 0's shifted ids would fold into replica 1's range,
    # merging topology the scaled bench believes is disjoint. Fail
    # loudly instead — one tiny max() aggregate per replicated table.
    max_tail = df.select(
        F.greatest(
            *[
                F.max(F.substring(F.col(c), 2, 30).cast("long"))
                for c in id_cols
            ],
            F.lit(0).cast("long"),
        ).alias("m")
    ).first()
    if max_tail and max_tail.m is not None and max_tail.m >= _REPLICA_STRIDE:
        raise ValueError(
            f"_replicate_ids: max numeric id tail {max_tail.m} >= replica "
            f"stride {_REPLICA_STRIDE}; shifted replicas would collide — "
            "raise _REPLICA_STRIDE or derive it from the data's max id"
        )
    reps = F.broadcast(df.sparkSession.range(scale).withColumnRenamed("id", "rep"))
    shifted = [
        F.concat(
            F.substring(c, 1, 1),
            (
                F.substring(F.col(c), 2, 30).cast("long")
                + F.col("rep") * _REPLICA_STRIDE
            ).cast("string"),
        ).alias(c)
        if c in id_cols
        else F.col(c)
        for c in df.columns
    ]
    return df.crossJoin(reps).select(*shifted)


def materialize_snapshot(
    spark: SparkSession,
    sf_dir: str,
    base: str,
    customer_id: str,
    timestamp: int,
    scale: int = 1,
) -> str:
    """Write one FIXTURES.md §2 snapshot tree to disk:

        {base}/{customer_id}/{timestamp}/nodes/{Entity,Address}/
        {base}/{customer_id}/{timestamp}/relationships/HAS_*/

    using the positional (pre-normalization) column contract the
    reference consumes. ``scale`` > 1 writes that many id-shifted
    replicas of every table (tools/bench_pipeline.py --scale: ingest
    throughput measured at multi-million-row snapshots). Returns the
    snapshot path."""
    root = f"{base}/{customer_id}/{timestamp}"
    _replicate_ids(raw_entity_nodes(spark, sf_dir), ("id",), scale).write.mode(
        "overwrite"
    ).parquet(f"{root}/nodes/Entity")
    _replicate_ids(raw_address_nodes(spark, sf_dir), ("id",), scale).write.mode(
        "overwrite"
    ).parquet(f"{root}/nodes/Address")
    c = _customer(spark, sf_dir)
    for rel_type, predicate in EDGE_TYPES:
        raw = c.filter(F.expr(predicate)).select(
            F.concat(F.lit("E"), F.col("c_custkey").cast("string")).alias("src"),
            F.concat(F.lit("A"), (F.lit(1) + F.col("c_custkey") % 10).cast("string")).alias("dst"),
            F.lit(rel_type).alias("type"),
            (F.col("c_acctbal") / 100.0).alias("weight"),
        )
        _replicate_ids(raw, ("src", "dst"), scale).write.mode("overwrite").parquet(
            f"{root}/relationships/{rel_type}"
        )
    return root


# --------------------------------------------------------------------------
# DuckDB CTE SQL — generated from the SAME constants/rules
# --------------------------------------------------------------------------


def _values_sql(rows: list[tuple], casts: tuple[str, ...]) -> str:
    def render(v, cast):
        if isinstance(v, str):
            s = "'" + v.replace("'", "''") + "'"
        else:
            s = str(v)
        return f"CAST({s} AS {cast})"

    return ", ".join("(" + ", ".join(render(v, c) for v, c in zip(row, casts)) + ")" for row in rows)


def control_plane_ctes() -> dict[str, str]:
    """CTE body SQL for each control-plane table (DuckDB dialect)."""
    return {
        "snapshots": f"SELECT * FROM (VALUES {_values_sql(SNAPSHOT_PAIRS, ('VARCHAR', 'BIGINT'))}) AS v(customer_id, ts)",
        "scanned": f"SELECT * FROM (VALUES {_values_sql(SCANNED_PAIRS, ('VARCHAR', 'BIGINT'))}) AS v(customer_id, ts)",
        "processed": f"SELECT * FROM (VALUES {_values_sql(PROCESSED_PAIRS, ('VARCHAR', 'BIGINT'))}) AS v(customer_id, ts)",
        "dbs": f"SELECT * FROM (VALUES {_values_sql([(n,) for n in DB_NAMES], ('VARCHAR',))}) AS v(name)",
        "aliases": f"SELECT * FROM (VALUES {_values_sql(ALIAS_ROWS, ('VARCHAR', 'VARCHAR'))}) AS v(name, database)",
        "arrivals": f"SELECT * FROM (VALUES {_values_sql(ARRIVAL_ROWS, ('VARCHAR', 'BIGINT', 'BIGINT'))}) AS v(customer_id, ts, arrival_order)",
    }


def graph_ctes() -> dict[str, str]:
    """CTE body SQL for derived graph tables (DuckDB dialect), matching
    the Spark builders above rule-for-rule."""
    edge_parts = []
    for rel_type, predicate in EDGE_TYPES:
        edge_parts.append(
            f"SELECT 'E' || CAST(c_custkey AS VARCHAR) AS sourceNodeId, "
            f"'A' || CAST(1 + c_custkey % 10 AS VARCHAR) AS targetNodeId, "
            f"'{rel_type}' AS relationshipType, "
            f"c_acctbal / 100.0 AS weight FROM customer WHERE {predicate}"
        )
    return {
        "nodes_entity": (
            "SELECT 'E' || CAST(c_custkey AS VARCHAR) AS nodeId, "
            "string_split(CASE WHEN c_custkey % 2 = 0 THEN 'Entity' ELSE 'Entity,Company' END, ',') AS labels, "
            "c_name AS name, c_acctbal AS acctbal, c_mktsegment AS segment FROM customer"
        ),
        "nodes_address": (
            "SELECT 'A' || CAST(s_suppkey AS VARCHAR) AS nodeId, "
            "string_split('Address', ',') AS labels, "
            "s_name AS name, s_nationkey AS nationkey FROM supplier"
        ),
        "all_nodes": (
            "SELECT nodeId FROM nodes_entity UNION ALL SELECT nodeId FROM nodes_address"
        ),
        "edges": " UNION ALL ".join(edge_parts),
    }


def with_clause(*names: str) -> str:
    """Build a ``WITH`` clause containing the named CTEs (dependencies
    resolved: graph CTEs referencing each other are ordered)."""
    registry = {**control_plane_ctes(), **graph_ctes()}
    ordered: list[str] = []
    def add(name: str) -> None:
        if name in ordered:
            return
        if name == "all_nodes":
            add("nodes_entity")
            add("nodes_address")
        ordered.append(name)
    for n in names:
        add(n)
    parts = [f"{n} AS ({registry[n]})" for n in ordered]
    return "WITH " + ", ".join(parts)
