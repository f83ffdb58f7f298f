from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F
import pytest

from neo4j_blue_green_arrow_etl_spark import fixtures as FX
from neo4j_blue_green_arrow_etl_spark.sources import (
    discover_snapshots,
    normalize_edges,
    normalize_nodes,
    read_snapshot,
)
from neo4j_blue_green_arrow_etl_spark.sources.snapshot import SnapshotRef


def test_normalize_nodes_positional_rename_and_split(spark, sf_dir):
    raw = FX.raw_entity_nodes(spark, sf_dir)
    out = normalize_nodes(raw)
    assert out.columns == ["nodeId", "labels", "name", "acctbal", "segment"]
    rows = {r.nodeId: r.labels for r in out.collect()}
    # even custkey -> single label; odd -> two labels (comma split)
    assert rows["E2"] == ["Entity"]
    assert rows["E1"] == ["Entity", "Company"]


def test_normalize_nodes_single_label_is_one_element_array(spark, sf_dir):
    out = normalize_nodes(FX.raw_address_nodes(spark, sf_dir))
    assert out.select("labels").first()[0] == ["Address"]


def test_normalize_edges_positional_rename(spark, sf_dir):
    out = normalize_edges(FX.raw_edges(spark, sf_dir))
    assert out.columns == ["sourceNodeId", "targetNodeId", "relationshipType", "weight"]
    types = {r[0] for r in out.select("relationshipType").distinct().collect()}
    assert types == {t for t, _ in FX.EDGE_TYPES}


def test_normalize_rejects_too_few_columns(spark):
    df = spark.createDataFrame([(1,)], "a: long")
    with pytest.raises(ValueError):
        normalize_nodes(df)
    with pytest.raises(ValueError):
        normalize_edges(df.withColumn("b", df.a))


def test_discover_and_read_snapshot(spark, sf_dir, tmp_path):
    base = str(tmp_path / "data")
    FX.materialize_snapshot(spark, sf_dir, base, "customer1", 1767741427)
    # incomplete snapshot: nodes only -> must be skipped (ST4 gate)
    incomplete = Path(base) / "customer2" / "1767741500" / "nodes" / "Entity"
    incomplete.mkdir(parents=True)
    (incomplete / "part.parquet").write_bytes(b"")
    # non-integer timestamp dir -> skipped
    bogus = Path(base) / "customer3" / "not_a_ts" / "nodes"
    bogus.mkdir(parents=True)

    found = discover_snapshots(base)
    assert [(s.customer_id, s.timestamp) for s in found] == [("customer1", 1767741427)]
    assert found[0].database == "customer1-1767741427"

    nodes, edges = read_snapshot(spark, found[0])
    n_customers = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    n_suppliers = spark.read.parquet(f"{sf_dir}/supplier.parquet").count()
    assert nodes.count() == n_customers + n_suppliers
    # union-by-name: address rows have null segment, entity rows null nationkey
    assert "nationkey" in nodes.columns and "segment" in nodes.columns
    assert edges.select("relationshipType").distinct().count() == 3


def test_snapshot_ref_database_name():
    assert SnapshotRef("customer9", 123, "/x").database == "customer9-123"


def test_property_schema_evolution_across_snapshots(spark, tmp_path):
    """A newer snapshot may add property columns (the reference passes
    properties through untyped, neo4j_pq.py:56-59, so producers evolve
    freely). Both generations stay independently queryable, and the
    alias cutover changes the visible schema atomically."""
    from neo4j_blue_green_arrow_etl_spark.plans.catalog import DeploymentCatalog
    from neo4j_blue_green_arrow_etl_spark.sources.snapshot import (
        SnapshotRef,
        read_snapshot,
    )

    base = tmp_path / "data"
    for ts, extra in ((100, False), (200, True)):
        root = base / "acme" / str(ts)
        nodes = spark.createDataFrame(
            [(f"N{i}", "Entity", float(i)) for i in range(5)],
            ["id", "labels", "score"],
        )
        if extra:
            nodes = nodes.withColumn("region", F.lit("emea"))  # new property
        nodes.write.parquet(str(root / "nodes" / "Entity"))
        spark.createDataFrame(
            [("N0", "N1", "REL", 1.0)], ["src", "dst", "type", "w"]
        ).write.parquet(str(root / "relationships" / "REL"))

    cat = DeploymentCatalog(spark, tmp_path / "m.json")
    for ts in (100, 200):
        ref = SnapshotRef("acme", ts, str(base / "acme" / str(ts)))
        n, e = read_snapshot(spark, ref)
        cat.register_deployment("acme", ts, n, e, source_path=ref.path)

    cat.set_alias("acme", 100)
    v1 = spark.table("acme_nodes")
    assert "region" not in v1.columns
    cat.set_alias("acme", 200)  # cutover to the evolved schema
    v2 = spark.table("acme_nodes")
    assert "region" in v2.columns and v2.count() == 5


def test_csv_and_json_snapshot_formats_match_parquet(spark, sf_dir, tmp_path):
    """Multi-format ingestion: the same snapshot delivered as CSV
    (positional, header) or NDJSON (named contract) must normalize to
    exactly the parquet-read result; mixing formats across label dirs
    of one snapshot also works (auto-detected per dir)."""
    from neo4j_blue_green_arrow_etl_spark import fixtures as FX
    from neo4j_blue_green_arrow_etl_spark.sources.snapshot import (
        SnapshotRef,
        read_snapshot,
    )

    base = str(tmp_path / "pq")
    FX.materialize_snapshot(spark, sf_dir, base, "acme", 100)
    ref_pq = SnapshotRef("acme", 100, f"{base}/acme/100")
    want_nodes, want_edges = read_snapshot(spark, ref_pq)
    want_n = sorted(
        (r.nodeId, ",".join(r.labels)) for r in want_nodes.collect()
    )
    want_e = want_edges.count()

    # same tree re-materialized as csv nodes + json edges (named form)
    mixed = tmp_path / "mixed" / "acme" / "100"
    for d in Path(f"{base}/acme/100/nodes").iterdir():
        raw = spark.read.parquet(str(d))
        raw.coalesce(1).write.option("header", True).csv(
            str(mixed / "nodes" / d.name)
        )
    for d in Path(f"{base}/acme/100/relationships").iterdir():
        raw = spark.read.parquet(str(d))
        named = raw.toDF(
            "sourceNodeId", "targetNodeId", "relationshipType", *raw.columns[3:]
        )
        named.coalesce(1).write.json(str(mixed / "relationships" / d.name))
    got_nodes, got_edges = read_snapshot(
        spark, SnapshotRef("acme", 100, str(mixed))
    )
    got_n = sorted((r.nodeId, ",".join(r.labels)) for r in got_nodes.collect())
    assert got_n == want_n
    assert got_edges.count() == want_e
    assert got_edges.columns[:3] == ["sourceNodeId", "targetNodeId", "relationshipType"]


def test_json_nodes_missing_named_columns_rejected(spark, tmp_path):
    from neo4j_blue_green_arrow_etl_spark.sources.snapshot import read_nodes

    p = tmp_path / "bad_json"
    spark.range(3).toDF("some_col").write.json(str(p))
    with pytest.raises(ValueError, match="lacks required columns"):
        read_nodes(spark, str(p), fmt="json")


def test_diff_nodes_classifies_changes(spark):
    from neo4j_blue_green_arrow_etl_spark.sources.snapshot import diff_nodes

    old = spark.createDataFrame(
        [("A", "x", 1.0), ("B", "y", 2.0), ("C", "z", 3.0)],
        "nodeId string, prop string, w double",
    )
    new = spark.createDataFrame(
        [("A", "x", 1.0), ("B", "y", 9.9), ("D", "q", 4.0)],
        "nodeId string, prop string, w double",
    )
    got = {r.nodeId: r.change for r in diff_nodes(old, new).collect()}
    assert got == {"B": "changed", "C": "removed", "D": "added"}  # A unchanged, omitted


def test_diff_nodes_column_order_insensitive(spark):
    """The digest canonicalizes property order: the same data with
    reordered property columns must diff as unchanged."""
    from neo4j_blue_green_arrow_etl_spark.sources.snapshot import diff_nodes

    old = spark.createDataFrame(
        [("A", "x", 1.0)], "nodeId string, prop string, w double"
    )
    new = old.select("nodeId", "w", "prop")
    assert diff_nodes(old, new).count() == 0


def test_orc_snapshot_format_matches_parquet(spark, sf_dir, tmp_path):
    """ORC is column-order-preserving like parquet, so the positional
    contract applies directly; an ORC-delivered snapshot must normalize
    to the same result as the parquet original."""
    from neo4j_blue_green_arrow_etl_spark import fixtures as FX
    from neo4j_blue_green_arrow_etl_spark.sources.snapshot import (
        SnapshotRef,
        read_snapshot,
    )

    base = str(tmp_path / "pq")
    FX.materialize_snapshot(spark, sf_dir, base, "acme", 100)
    ref_pq = SnapshotRef("acme", 100, f"{base}/acme/100")
    want_nodes, want_edges = read_snapshot(spark, ref_pq)
    want_n = sorted((r.nodeId, ",".join(r.labels)) for r in want_nodes.collect())
    want_e = want_edges.count()

    orc = tmp_path / "orc" / "acme" / "100"
    for kind in ("nodes", "relationships"):
        for d in Path(f"{base}/acme/100/{kind}").iterdir():
            spark.read.parquet(str(d)).coalesce(1).write.orc(
                str(orc / kind / d.name)
            )
    got_nodes, got_edges = read_snapshot(spark, SnapshotRef("acme", 100, str(orc)))
    got_n = sorted((r.nodeId, ",".join(r.labels)) for r in got_nodes.collect())
    assert got_n == want_n
    assert got_edges.count() == want_e


def test_orc_snapshot_is_discoverable(spark, sf_dir, tmp_path):
    """ADVICE r3: DATA_SUFFIXES omitted .orc, so an ORC-only snapshot was
    readable but invisible to discover_snapshots (the completeness gate
    saw empty table dirs). DATA_SUFFIXES is now derived from FORMATS;
    this pins discovery for every supported format."""
    from neo4j_blue_green_arrow_etl_spark import fixtures as FX
    from neo4j_blue_green_arrow_etl_spark.sources.snapshot import (
        DATA_SUFFIXES,
        FORMATS,
        SnapshotRef,
        read_snapshot,
    )

    # the gate and the readers must agree on what counts as data
    assert set(f".{f}" for f in FORMATS) <= set(DATA_SUFFIXES)

    base = str(tmp_path / "pq")
    FX.materialize_snapshot(spark, sf_dir, base, "acme", 100)
    orc_base = tmp_path / "orcbase"
    orc = orc_base / "acme" / "100"
    for kind in ("nodes", "relationships"):
        for d in Path(f"{base}/acme/100/{kind}").iterdir():
            spark.read.parquet(str(d)).coalesce(1).write.orc(
                str(orc / kind / d.name)
            )
    found = discover_snapshots(str(orc_base))
    assert found == [SnapshotRef("acme", 100, str(orc))]
    nodes, edges = read_snapshot(spark, found[0])
    assert nodes.count() > 0 and edges.count() > 0
