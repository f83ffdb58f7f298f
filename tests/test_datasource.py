"""Spark 4 Python Data Source (`graphsnapshot`) — positional contract
applied at the source, fragment-level partition planning, and filter
pushdown into the pyarrow scan."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

import neo4j_blue_green_arrow_etl_spark.fixtures as FX
from neo4j_blue_green_arrow_etl_spark.sources.snapshot import (
    read_edges,
    read_nodes,
)
from neo4j_blue_green_arrow_etl_spark.sources.snapshot_datasource import (
    FragmentPartition,
    SnapshotReader,
    register_snapshot_source,
)
from pyspark.sql.datasource import EqualTo, GreaterThan, StringContains

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def snapshot_tree(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("dsrc") / "data")
    FX.materialize_snapshot(spark, SF_SMOKE, base, "customer1", 1767741427)
    root = Path(base) / "customer1" / "1767741427"
    register_snapshot_source(spark)
    return root


def _nodes_dir(root: Path) -> str:
    return str(root / "nodes" / "Entity")


def _edges_dir(root: Path) -> str:
    return str(root / "relationships" / "HAS_PRINCIPAL_ADDRESS")


def test_nodes_match_builtin_reader(spark, snapshot_tree):
    """The custom source must produce exactly the rows/schema of the
    engine's read_nodes path (positional rename + label split)."""
    via_ds = (
        spark.read.format("graphsnapshot")
        .option("path", _nodes_dir(snapshot_tree))
        .option("kind", "nodes")
        .load()
    )
    via_builtin = read_nodes(spark, _nodes_dir(snapshot_tree))
    assert via_ds.columns == via_builtin.columns
    a = {tuple(r) for r in via_ds.withColumn("labels", F.array_join("labels", ",")).collect()}
    b = {tuple(r) for r in via_builtin.withColumn("labels", F.array_join("labels", ",")).collect()}
    assert a == b


def test_edges_match_builtin_reader(spark, snapshot_tree):
    via_ds = (
        spark.read.format("graphsnapshot")
        .option("path", _edges_dir(snapshot_tree))
        .option("kind", "edges")
        .load()
    )
    via_builtin = read_edges(spark, _edges_dir(snapshot_tree))
    assert via_ds.columns == via_builtin.columns
    assert via_ds.count() == via_builtin.count()
    assert {tuple(r) for r in via_ds.collect()} == {
        tuple(r) for r in via_builtin.collect()
    }


def test_one_partition_per_fragment(spark, snapshot_tree):
    """Reference S2 parity: the work list is one unit per parquet
    fragment (neo4j_pq.py:279-285), expressed as InputPartitions."""
    n_frags = len(list(Path(_nodes_dir(snapshot_tree)).rglob("*.parquet")))
    reader = SnapshotReader(
        {"path": _nodes_dir(snapshot_tree), "kind": "nodes"}, None
    )
    parts = reader.partitions()
    assert len(parts) == n_frags
    assert all(isinstance(p, FragmentPartition) for p in parts)


def test_filter_pushdown_absorbs_comparisons_and_filters_rows(spark, snapshot_tree):
    """Comparison predicates on scalar columns are absorbed into the
    pyarrow scan; results match the unpushed plan."""
    reader = SnapshotReader(
        {"path": _nodes_dir(snapshot_tree), "kind": "nodes"}, None
    )
    fid = EqualTo(("nodeId",), "E7")
    flab = StringContains(("labels",), "Entity")  # derived col: must bounce
    unsupported = list(reader.pushFilters([fid, flab]))
    assert unsupported == [flab]
    assert reader._pushed == [fid]

    df = (
        spark.read.format("graphsnapshot")
        .option("path", _nodes_dir(snapshot_tree))
        .option("kind", "nodes")
        .load()
    )
    got = df.filter(F.col("nodeId") == "E7").collect()
    want = (
        read_nodes(spark, _nodes_dir(snapshot_tree))
        .filter(F.col("nodeId") == "E7")
        .collect()
    )
    assert len(got) == len(want) == 1
    assert got[0].nodeId == want[0].nodeId


def test_labels_filter_not_absorbed_but_correct(spark, snapshot_tree):
    """Filters on the derived labels column stay Spark-side and still
    evaluate correctly end-to-end."""
    df = (
        spark.read.format("graphsnapshot")
        .option("path", _nodes_dir(snapshot_tree))
        .option("kind", "nodes")
        .load()
    )
    got = df.filter(F.array_contains("labels", "Company")).count()
    want = (
        read_nodes(spark, _nodes_dir(snapshot_tree))
        .filter(F.array_contains("labels", "Company"))
        .count()
    )
    assert got == want > 0


def test_batch_size_option_controls_arrow_batches(spark, snapshot_tree):
    """table_size (reference arrow_table_size parity) bounds the rows
    per emitted RecordBatch."""
    reader = SnapshotReader(
        {"path": _nodes_dir(snapshot_tree), "kind": "nodes", "table_size": 7},
        None,
    )
    [part] = reader.partitions()[:1]
    batches = list(reader.read(part))
    assert batches and all(b.num_rows <= 7 for b in batches)
    assert batches[0].schema.names[:2] == ["nodeId", "labels"]


def test_bad_options_raise(spark, snapshot_tree):
    with pytest.raises(ValueError):
        SnapshotReader({"kind": "nodes"}, None)
    with pytest.raises(ValueError):
        SnapshotReader({"path": "/x", "kind": "weird"}, None)


# ---------------------------------------------------------------------------
# Streaming arrival source
# ---------------------------------------------------------------------------


def _run_available(spark, base, checkpoint, out_dir):
    """One availableNow run writing discoveries to a parquet sink (the
    memory sink cannot recover from a checkpoint); returns the
    CUMULATIVE discovered set across all runs sharing the sink."""
    from neo4j_blue_green_arrow_etl_spark.sources.snapshot_datasource import (
        register_arrival_source,
    )

    register_arrival_source(spark)
    q = (
        spark.readStream.format("snapshotarrivals")
        .option("path", base)
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    out = spark.read.parquet(out_dir)
    rows = [(r.customer_id, r.timestamp) for r in out.collect()]
    assert len(rows) == len(set(rows)), "duplicate discovery emitted"
    return set(rows)


def test_arrival_stream_discovers_then_stays_exactly_once(spark, tmp_path):
    """The watcher loop as a Structured Streaming source: first run
    discovers existing complete snapshots; a restart from the SAME
    checkpoint re-emits nothing (offset-log dedup, ST2); a new snapshot
    then arrives exactly once; incomplete trees stay invisible (ST4)."""
    base = str(tmp_path / "data")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    FX.materialize_snapshot(spark, SF_SMOKE, base, "acme", 100)
    # incomplete: nodes only -> must NOT be discovered
    partial = Path(base) / "acme" / "200" / "nodes" / "Entity"
    partial.mkdir(parents=True)
    (partial / "x.parquet").write_bytes(b"pq")

    assert _run_available(spark, base, ckpt, out) == {("acme", 100)}
    # restart, nothing new -> cumulative set unchanged, no re-emission
    assert _run_available(spark, base, ckpt, out) == {("acme", 100)}
    # a second complete snapshot arrives -> exactly that one more
    FX.materialize_snapshot(spark, SF_SMOKE, base, "acme", 300)
    assert _run_available(spark, base, ckpt, out) == {
        ("acme", 100),
        ("acme", 300),
    }


def test_arrival_reader_offsets_are_replayable(tmp_path, spark):
    """readBetweenOffsets re-derives exactly the delta between two
    offsets (crash-recovery contract of the offset log)."""
    from neo4j_blue_green_arrow_etl_spark.sources.snapshot_datasource import (
        SnapshotArrivalStreamReader,
    )

    base = str(tmp_path / "data")
    FX.materialize_snapshot(spark, SF_SMOKE, base, "acme", 100)
    r = SnapshotArrivalStreamReader({"path": base})
    start = r.initialOffset()
    rows1, end1 = r.read(start)
    assert [(c, t) for c, t, _ in rows1] == [("acme", 100)]
    FX.materialize_snapshot(spark, SF_SMOKE, base, "acme", 300)
    rows2, end2 = r.read(end1)
    assert [(c, t) for c, t, _ in rows2] == [("acme", 300)]
    replay = list(r.readBetweenOffsets(end1, end2))
    assert [(c, t) for c, t, _ in replay] == [("acme", 300)]
    # full-range replay covers both
    assert {(c, t) for c, t, _ in r.readBetweenOffsets(start, end2)} == {
        ("acme", 100),
        ("acme", 300),
    }
