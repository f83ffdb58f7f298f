"""Graph sinks: two-phase (nodes strictly before edges) write targets.

The reference streams Arrow batches to a Neo4j GDS Flight server with a
session state machine CREATE_DATABASE -> feed nodes -> NODE_LOAD_DONE ->
feed edges -> RELATIONSHIP_LOAD_DONE (reference
neo4j_arrow_client.py:30-35, 123-149, 225-296). This engine keeps the
protocol shape — an explicit lifecycle with an ordered barrier between
the node phase and the edge phase — behind a sink interface:

- ``ParquetGraphSink`` (default, always available): writes the loaded
  graph to versioned parquet locations. Fully distributed ``df.write``;
  the two-phase barrier is the sequential pair of Spark write jobs.
- ``FlightGraphSink``: the Neo4j Arrow adapter. The gRPC data path runs
  per-partition on executors (``mapInArrow`` + ``do_put``) so 1000
  executors stream concurrently; integration-tested over real gRPC
  against the in-process ``flight_server.InMemoryGraphFlightServer``.

State assertions are real (the reference's broken ``==`` no-op check,
neo4j_arrow_client.py:227, is flagged in SURVEY §4.3 — we assert).
"""

from __future__ import annotations

import abc
import enum
import json
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame

from ..errors import InvalidArgumentError


class SinkState(enum.Enum):
    READY = "ready"
    CREATED = "created"
    FEEDING_NODES = "feeding_nodes"
    FEEDING_EDGES = "feeding_edges"
    DONE = "done"
    ABORTED = "aborted"


@dataclass
class WriteResult:
    rows: int
    bytes: int = 0


class GraphSink(abc.ABC):
    """Two-phase graph load protocol (nodes before edges, explicit
    barriers), mirroring the reference client lifecycle."""

    def __init__(self, database: str):
        self.database = database
        self.state = SinkState.READY
        # client-side truth for the barrier cross-check: rows the
        # executors actually streamed, accumulated across write calls
        self._written = {"nodes": 0, "edges": 0}

    def _require(self, *states: SinkState) -> None:
        if self.state not in states:
            raise InvalidArgumentError(
                f"sink for {self.database!r} in state {self.state.value}, "
                f"expected one of {[s.value for s in states]}"
            )

    def create_database(self) -> None:
        self._require(SinkState.READY)
        self._create()
        self.state = SinkState.CREATED

    def write_nodes(self, nodes: DataFrame) -> WriteResult:
        self._require(SinkState.CREATED, SinkState.FEEDING_NODES)
        self.state = SinkState.FEEDING_NODES
        res = self._write_nodes(nodes)
        self._written["nodes"] += res.rows
        return res

    def nodes_done(self) -> dict:
        """Returns the sink's acknowledgment payload (the Flight server
        answers ``{"name": ..., "node_count": N}``), so callers can
        cross-check server-side counts — the only verification channel
        when the server runs out of process. The barrier cross-checks it
        automatically: a killed writer's half-stream arrives at the
        server as a clean TCP half-close and is silently committed, and
        Spark's task retry then re-streams the whole partition — the
        server-vs-client count mismatch here is the ONLY place that
        corruption is observable, so a mismatch raises
        SinkIntegrityError instead of finalizing a wrong graph."""
        self._require(SinkState.FEEDING_NODES)
        ack = self._nodes_done()
        self._check_count(ack, "node_count", self._written["nodes"])
        self.state = SinkState.FEEDING_EDGES
        return ack or {}

    def write_edges(self, edges: DataFrame) -> WriteResult:
        self._require(SinkState.FEEDING_EDGES)
        res = self._write_edges(edges)
        self._written["edges"] += res.rows
        return res

    def edges_done(self) -> dict:
        """See nodes_done: returns ``{"relationship_count": N, ...}``
        and applies the same count cross-check."""
        self._require(SinkState.FEEDING_EDGES)
        ack = self._finalize()
        self._check_count(ack, "relationship_count", self._written["edges"])
        self.state = SinkState.DONE
        return ack or {}

    def _check_count(self, ack: dict | None, key: str, written: int) -> None:
        from ..errors import SinkIntegrityError

        if ack and key in ack and ack[key] != written:
            raise SinkIntegrityError(
                f"sink {self.database!r}: server acknowledged "
                f"{ack[key]} {key.split('_')[0]}s but executors streamed "
                f"{written} — half-committed stream from a killed/"
                "retried writer; abort the load"
            )

    def abort(self) -> None:
        """Idempotent: aborting an unstarted/aborted sink is a no-op
        (reference abort tolerates NOT_FOUND, test_neo4j_arrow_client.py:23-43)."""
        if self.state not in (SinkState.READY, SinkState.ABORTED):
            self._abort()
        self.state = SinkState.ABORTED

    @abc.abstractmethod
    def _create(self) -> None: ...

    @abc.abstractmethod
    def _write_nodes(self, nodes: DataFrame) -> WriteResult: ...

    @abc.abstractmethod
    def _write_edges(self, edges: DataFrame) -> WriteResult: ...

    def _nodes_done(self) -> dict | None:  # optional hook (phase barrier)
        pass

    def _finalize(self) -> dict | None:  # optional hook
        pass

    def _abort(self) -> None:  # optional hook
        pass


class ParquetGraphSink(GraphSink):
    """Default sink: versioned parquet tree

        {base}/{database}/nodes/   {base}/{database}/relationships/

    plus a ``_LOAD_META.json`` marker written only at ``edges_done`` —
    the completeness gate for downstream discovery (analogous to the
    reference's "complete snapshot" contract, orchestrator.py:253-262).
    Scale: plain ``df.write.parquet`` — fully parallel, one file per
    partition; no driver materialization.
    """

    def __init__(self, database: str, base_path: str | Path):
        super().__init__(database)
        self.base = Path(base_path) / database
        self.counts: dict[str, int] = {}

    def _create(self) -> None:
        self.base.mkdir(parents=True, exist_ok=True)

    def _write(self, df: DataFrame, kind: str, key: str) -> WriteResult:
        # The protocol allows MULTIPLE write calls per phase (the
        # reference streams batch after batch): the first call of a
        # phase starts clean (overwrite), subsequent calls APPEND —
        # previously every call overwrote, silently discarding earlier
        # batches while counts kept accumulating.
        mode = "append" if key in self.counts else "overwrite"
        df.write.mode(mode).parquet(str(self.base / kind))
        n = int(df.count())
        self.counts[key] = self.counts.get(key, 0) + n
        return WriteResult(rows=n)

    def _write_nodes(self, nodes: DataFrame) -> WriteResult:
        return self._write(nodes, "nodes", "nodes")

    def _write_edges(self, edges: DataFrame) -> WriteResult:
        return self._write(edges, "relationships", "edges")

    def _finalize(self) -> None:
        (self.base / "_LOAD_META.json").write_text(
            json.dumps({"database": self.database, "counts": self.counts})
        )

    def _abort(self) -> None:
        # leave data for post-mortem; drop the completeness marker
        marker = self.base / "_LOAD_META.json"
        if marker.exists():
            marker.unlink()

    def compact(self, spark, target_files: int = 1) -> dict[str, int]:
        """Small-files maintenance: rewrite nodes/ and relationships/
        with ``target_files`` files each, swapping directories only
        after the full rewrite succeeds (write-aside + rename, so a
        crash mid-compaction leaves the original data intact — the same
        atomicity discipline as the catalog manifest).

        At 100 TB this is the periodic job that keeps file counts at
        ~max(partitions, bytes / 1 GiB) after many incremental loads;
        readers are unaffected because the swap is a rename."""
        self._require(SinkState.DONE)
        import shutil

        out: dict[str, int] = {}
        for kind in ("nodes", "relationships"):
            src = self.base / kind
            if not src.exists():
                continue
            tmp = self.base / f"_{kind}.compacting"
            df = spark.read.parquet(str(src))
            df.coalesce(target_files).write.mode("overwrite").parquet(str(tmp))
            n_before = len(df.inputFiles())
            old = self.base / f"_{kind}.old"
            src.rename(old)
            tmp.rename(src)
            shutil.rmtree(old)
            out[kind] = n_before
        return out


class FlightGraphSink(GraphSink):
    """Neo4j GDS Arrow Flight adapter — runnable gRPC data path.

    Protocol (reference neo4j_arrow_client.py:123-296):
    - lifecycle actions (CREATE_DATABASE / NODE_LOAD_DONE /
      RELATIONSHIP_LOAD_DONE / ABORT) are driver-side DoAction calls
      with a JSON body framing the load;
    - the data path is DISTRIBUTED: ``df.mapInArrow`` hands each
      executor task its partition as pyarrow RecordBatches; the task
      opens its own FlightClient (connections are not serializable —
      create per partition, the lesson of reference
      neo4j_arrow_client.py:58-73) and streams every batch through ONE
      ``do_put`` whose descriptor command is
      ``{"name": db, "entity_type": "node"|"relationship"}``, then
      emits a single (rows, nbytes) stats row. A native sum over the
      stats rows yields the WriteResult — so throughput scales with
      executors instead of the reference's single-host fork pool
      (neo4j_pq.py:290-303), and nothing but two longs per partition
      crosses back to the driver.

    Tested end-to-end against the in-process
    ``flight_server.InMemoryGraphFlightServer`` over real gRPC
    (tests/test_flight_sink.py); point host/port at a production GDS
    Arrow service for real loads. No auth middleware is attached — add
    the reference's basic-auth/bearer middleware for secured servers.
    """

    def __init__(self, database: str, host: str = "localhost", port: int = 8491):
        super().__init__(database)
        self.host, self.port = host, port

    # -- driver-side lifecycle -----------------------------------------

    def _action(self, action: str, body: dict) -> dict:
        import pyarrow.flight as flight

        client = flight.FlightClient(
            flight.Location.for_grpc_tcp(self.host, self.port)
        )
        try:
            result = client.do_action(
                flight.Action(action, json.dumps(body).encode())
            )
            first = next(iter(result), None)
            return json.loads(first.body.to_pybytes()) if first is not None else {}
        finally:
            client.close()

    # CREATE_DATABASE gets 10 total attempts, 3 s apart, like the
    # reference (@retry_on_failure on create_database,
    # neo4j_arrow_client.py:208-225, `for attempt in range(10)`): a
    # just-dropped database of the same name can linger
    # server-side for a few seconds during blue/green churn. _sleep is
    # injectable for tests.
    _create_sleep = None

    def _create(self) -> None:
        from ..errors import retry_on_failure

        @retry_on_failure(max_retries=10, delay=3.0, sleep=self._create_sleep)
        def do_create():
            # config mirrors the reference's create_database defaults
            # (neo4j_arrow_client.py:231-239)
            self._action(
                "CREATE_DATABASE",
                {
                    "name": self.database,
                    "concurrency": 4,
                    "high_io": True,
                    "force": True,
                    "record_format": "aligned",
                    "id_property": "id",
                    "id_type": "INTEGER",
                },
            )

        do_create()

    def _nodes_done(self) -> dict:
        return self._action("NODE_LOAD_DONE", {"name": self.database})

    def _finalize(self) -> dict:
        return self._action("RELATIONSHIP_LOAD_DONE", {"name": self.database})

    def _abort(self) -> None:
        import pyarrow.flight as flight

        try:
            self._action("ABORT", {"name": self.database})
        except flight.FlightError as e:
            # nothing to abort is a no-op, as in the reference client
            # (abort tolerates NOT_FOUND, neo4j_arrow_client.py:96-121)
            if "NOT_FOUND" not in str(e):
                raise

    # -- executor-side data path ---------------------------------------

    def _put(self, df: DataFrame, entity_type: str) -> WriteResult:
        from pyspark.sql import functions as F

        host, port = self.host, self.port
        desc = json.dumps({"name": self.database, "entity_type": entity_type}).encode()

        def put_partition(batches):
            # Self-contained closure (ships by value; executors need no
            # package import). One FlightClient + one do_put stream per
            # partition; empty partitions open no connection.
            import itertools

            import pyarrow as pa
            import pyarrow.flight as flight

            it = iter(batches)
            first = next(it, None)
            rows = nbytes = 0
            if first is not None:
                client = flight.FlightClient(
                    flight.Location.for_grpc_tcp(host, port)
                )
                try:
                    writer, _ = client.do_put(
                        flight.FlightDescriptor.for_command(desc), first.schema
                    )
                    with writer:
                        for b in itertools.chain([first], it):
                            writer.write_batch(b)
                            rows += b.num_rows
                            nbytes += b.get_total_buffer_size()
                finally:
                    client.close()
            yield pa.RecordBatch.from_pydict({"rows": [rows], "nbytes": [nbytes]})

        stats = df.mapInArrow(put_partition, "rows long, nbytes long")
        agg = stats.agg(
            F.sum("rows").alias("r"), F.sum("nbytes").alias("b")
        ).collect()[0]
        return WriteResult(rows=int(agg.r or 0), bytes=int(agg.b or 0))

    def _write_nodes(self, nodes: DataFrame) -> WriteResult:
        return self._put(nodes, "node")

    def _write_edges(self, edges: DataFrame) -> WriteResult:
        return self._put(edges, "relationship")


def flight_load_fn(host: str, port: int):
    """Orchestrator-compatible ``load_fn`` that loads each discovered
    snapshot through the Flight sink's two-phase protocol (create ->
    nodes -> barrier -> edges -> done) and records the deployment in
    the catalog. One definition serves the pipeline bench and the
    integration tests, so protocol changes have a single home."""
    from ..sources.snapshot import read_snapshot

    def load(spark, ref, catalog):
        nodes, edges = read_snapshot(spark, ref)
        sink = FlightGraphSink(ref.database, host=host, port=port)
        sink.create_database()
        try:
            sink.write_nodes(nodes)
            sink.nodes_done()
            sink.write_edges(edges)
            sink.edges_done()
        except Exception:
            # Don't leave the server database stuck in a feeding state:
            # abort the import (reference parity — load_with_aliases.py
            # clears stuck imports via client.abort) before surfacing
            # the failure to the orchestrator's retry loop.
            try:
                sink.abort()
            except Exception:
                pass  # the original error is the one worth raising
            raise
        catalog.register_deployment(
            ref.customer_id, ref.timestamp, nodes, edges, source_path=str(ref.path)
        )

    return load
