"""Snapshot source: directory-partitioned property-graph Parquet.

Data model (reference README.md:179-216):

    data/{customer_id}/{timestamp}/
      nodes/{Label}/*.parquet
      relationships/{REL_TYPE}/*.parquet

Column meaning is POSITIONAL at the boundary (reference
neo4j_pq.py:70-81 for nodes, :93-103 for edges); this module is the one
place that converts the positional contract into a declared named
schema, after which everything downstream is schema-first.

Scale note: the normalizations here are pure Catalyst expressions
(rename + ``F.split``), so they fuse into the parquet scan inside
whole-stage codegen — no Python on the data path, unlike the
reference's pandas row-apply label split (neo4j_pq.py:59).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NODE_ID = "nodeId"
LABELS = "labels"
SOURCE_ID = "sourceNodeId"
TARGET_ID = "targetNodeId"
REL_TYPE = "relationshipType"


def normalize_nodes(df: DataFrame) -> DataFrame:
    """Positional node contract -> named schema.

    Column 0 -> ``nodeId``; column 1 -> ``labels`` as array<string> by
    splitting the comma-separated label string (reference
    neo4j_pq.py:48-51, 70-81); columns 2..n pass through unchanged.
    A single label without a comma still becomes a one-element array
    (``F.split`` handles both, replacing the reference's scalar-vs-list
    branch at neo4j_pq.py:49-51).
    """
    cols = df.columns
    if len(cols) < 2:
        raise ValueError(f"node table needs >= 2 columns (id, labels); got {cols}")
    renamed = df.toDF(NODE_ID, LABELS, *cols[2:])
    return renamed.withColumn(LABELS, F.split(F.col(LABELS).cast("string"), ","))


def normalize_edges(df: DataFrame) -> DataFrame:
    """Positional edge contract -> named schema.

    Column 0 -> ``sourceNodeId``, column 1 -> ``targetNodeId``,
    column 2 -> ``relationshipType`` (reference neo4j_pq.py:93-103);
    columns 3..n are edge properties passed through.
    """
    cols = df.columns
    if len(cols) < 3:
        raise ValueError(f"edge table needs >= 3 columns (src, dst, type); got {cols}")
    return df.toDF(SOURCE_ID, TARGET_ID, REL_TYPE, *cols[3:])


FORMATS = ("parquet", "orc", "csv", "json")


def _read_table(spark: SparkSession, path: str, fmt: str) -> DataFrame:
    """One snapshot table in any supported format.

    parquet, orc, and csv-with-header preserve COLUMN ORDER, so the
    positional contract applies directly. JSON is name-based (Spark
    infers fields alphabetically), so JSON snapshots must already carry
    the NAMED contract (nodeId/labels/... or sourceNodeId/...) —
    enforced by the normalizers below via a reorder, not a rename."""
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "orc":
        return spark.read.orc(path)
    if fmt == "csv":
        return spark.read.option("header", True).option("inferSchema", True).csv(path)
    if fmt == "json":
        return spark.read.json(path)
    raise ValueError(f"unsupported snapshot format {fmt!r}; use one of {FORMATS}")


def _to_positional(df: DataFrame, leading: tuple[str, ...]) -> DataFrame:
    """Reorder a NAME-based table (JSON) into the positional contract:
    the named key columns first, properties after, alphabetically."""
    missing = [c for c in leading if c not in df.columns]
    if missing:
        raise ValueError(
            f"name-based snapshot table lacks required columns {missing}; "
            f"got {df.columns}"
        )
    props = sorted(c for c in df.columns if c not in leading)
    return df.select(*leading, *props)


def read_nodes(spark: SparkSession, *paths: str, fmt: str = "parquet") -> DataFrame:
    """Read one or more node-label directories and normalize.

    Multiple label dirs are unioned by name with missing property
    columns null-filled (the reference processes each dir separately
    and the server unions; here the union is explicit so the engine has
    ONE nodes relation to query)."""
    raw = [_read_table(spark, p, fmt) for p in paths]
    if fmt == "json":
        raw = [_to_positional(d, (NODE_ID, LABELS)) for d in raw]
    dfs = [normalize_nodes(d) for d in raw]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


def read_edges(spark: SparkSession, *paths: str, fmt: str = "parquet") -> DataFrame:
    raw = [_read_table(spark, p, fmt) for p in paths]
    if fmt == "json":
        raw = [_to_positional(d, (SOURCE_ID, TARGET_ID, REL_TYPE)) for d in raw]
    dfs = [normalize_edges(d) for d in raw]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


@dataclass(frozen=True)
class SnapshotRef:
    """Identity of one discovered snapshot (reference orchestrator.py:42-50).

    The database name it loads into is ``{customer_id}-{timestamp}``
    (reference load_with_aliases.py:48)."""

    customer_id: str
    timestamp: int
    path: str

    @property
    def database(self) -> str:
        return f"{self.customer_id}-{self.timestamp}"


# derived from FORMATS so the read path and the discovery gate can never
# drift (ADVICE r3: ORC was readable but invisible to discovery); .ndjson
# is the one extra spelling the json reader accepts
DATA_SUFFIXES = tuple(f".{f}" for f in FORMATS) + (".ndjson",)


def _non_empty_dir(p: Path) -> bool:
    """True when the tree under ``p`` contains at least one COMMITTED
    data file. Counting any entry would race the graphsnapshot writer:
    its tasks stage ``.staging/*.staged`` fragments (and mkdir the table dirs)
    before the driver's atomic rename publishes them — a directory
    holding only staged fragments must stay invisible to the
    completeness gate, or discovery promotes a half-written snapshot.

    Discovery polls while writers commit/abort/cleanup concurrently, so
    every stat tolerates files vanishing mid-walk (OSError -> skip).
    Cost: the walk short-circuits on the first committed file; the
    no-committed-file case touches every entry of ONE table dir —
    bounded by that snapshot's fragment count, control-plane-sized."""
    if not p.is_dir():
        return False
    try:
        for f in p.rglob("*"):
            try:
                if (
                    f.suffix in DATA_SUFFIXES
                    and f.is_file()
                    and f.stat().st_size > 0
                ):
                    return True
            except OSError:
                continue  # deleted mid-walk by a concurrent writer
    except OSError:
        return False  # the dir itself vanished (cleanup/abort race)
    return False


def discover_snapshots(base_path: str | Path) -> list[SnapshotRef]:
    """Scan ``base/{customer}/{timestamp}`` for COMPLETE snapshots.

    Completeness gate (reference orchestrator.py:253-262): both
    ``nodes/`` and ``relationships/`` must exist and be non-empty;
    timestamp dirs must be integer-named (orchestrator.py:243-245).
    Driver-side listing by design — this is control-plane metadata, a
    few thousand dirs at most, not data-plane work.
    """
    base = Path(base_path)
    found: list[SnapshotRef] = []
    if not base.is_dir():
        return found
    for customer_dir in sorted(p for p in base.iterdir() if p.is_dir()):
        for ts_dir in sorted(p for p in customer_dir.iterdir() if p.is_dir()):
            try:
                ts = int(ts_dir.name)
            except ValueError:
                continue
            if _non_empty_dir(ts_dir / "nodes") and _non_empty_dir(ts_dir / "relationships"):
                found.append(SnapshotRef(customer_dir.name, ts, str(ts_dir)))
    return found


def _detect_format(table_dir: Path) -> str:
    """Format of one label/type dir by its data files' extension —
    snapshots can arrive as parquet, csv (header), or ndjson; mixing
    formats ACROSS dirs of one snapshot is fine, within one dir the
    first recognized extension wins."""
    for f in sorted(table_dir.iterdir()):
        suffix = f.suffix.lstrip(".").lower()
        if suffix in FORMATS:
            return suffix
        if suffix == "ndjson":
            return "json"
    return "parquet"


def read_snapshot(spark: SparkSession, snapshot: SnapshotRef) -> tuple[DataFrame, DataFrame]:
    """Load one complete snapshot as (nodes, edges) DataFrames with the
    engine's named schema, all labels/types unioned; each label/type dir
    may independently be parquet, csv, or json (auto-detected)."""
    node_dirs = sorted(p for p in Path(snapshot.path, "nodes").iterdir() if p.is_dir())
    edge_dirs = sorted(
        p for p in Path(snapshot.path, "relationships").iterdir() if p.is_dir()
    )
    nodes = [
        read_nodes(spark, str(p), fmt=_detect_format(p)) for p in node_dirs
    ]
    edges = [
        read_edges(spark, str(p), fmt=_detect_format(p)) for p in edge_dirs
    ]
    out_n = nodes[0]
    for d in nodes[1:]:
        out_n = out_n.unionByName(d, allowMissingColumns=True)
    out_e = edges[0]
    for d in edges[1:]:
        out_e = out_e.unionByName(d, allowMissingColumns=True)
    return out_n, out_e


def diff_nodes(old: DataFrame, new: DataFrame) -> DataFrame:
    """What changed between two snapshot generations: one row per
    nodeId with change in {'added','removed','changed'} (unchanged
    nodes are omitted) — the blue/green inspection tool for "what does
    cutting over to this green actually change?".

    Scale: each side is reduced MAP-SIDE to (nodeId, sha256 digest of
    all non-id columns, canonically ordered), so the single full-outer
    equi-join shuffles fixed-width rows however wide the node
    properties are."""

    def digest(df: DataFrame, out: str) -> DataFrame:
        cols = sorted(c for c in df.columns if c != NODE_ID)
        payload = F.to_json(
            F.struct(*[F.col(c).cast("string").alias(c) for c in cols])
        )
        return df.select(NODE_ID, F.sha2(payload, 256).alias(out))

    o = digest(old, "_od")
    n = digest(new, "_nd")
    change = (
        F.when(F.col("_od").isNull(), "added")
        .when(F.col("_nd").isNull(), "removed")
        .when(F.col("_od") != F.col("_nd"), "changed")
    )
    return (
        o.join(n, NODE_ID, "full_outer")
        .select(NODE_ID, change.alias("change"))
        .filter(F.col("change").isNotNull())
    )
