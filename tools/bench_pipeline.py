"""Snapshot-pipeline benchmark: wall time and rows/s for one full
blue/green cycle (discover -> load -> alias switch -> retention) on a
snapshot materialized from $SPARK_GRAFT_SF_DIR-equivalent data.

Usage: python tools/bench_pipeline.py [sf_dir] [--flight] [--scale N]
Prints one JSON line: {"pipeline_sec": ..., "rows": ..., "rows_per_sec": ...}

--scale N materializes N id-shifted replicas of the snapshot before the
timed cycle (fixtures.materialize_snapshot scale=), so ingest throughput
is measured at multi-million-row snapshots instead of the fixed-latency
floor a 43k-row snapshot sits on (VERDICT r4 task 5: --scale 100 is
~4.3M rows).

--flight routes the load through the Arrow Flight gRPC sink against an
in-process server (per-partition executor-side do_put streams), so the
reported rows/s is the measurable analogue of the reference's
node/edge load throughput (load_with_aliases.py:131-160, logged but
never published).
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    argv = sys.argv[1:]
    scale = 1
    if "--scale" in argv:
        i = argv.index("--scale")
        scale = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    use_flight = "--flight" in argv
    args = [a for a in argv if a != "--flight"]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    from neo4j_blue_green_arrow_etl_spark.fixtures import materialize_snapshot
    from neo4j_blue_green_arrow_etl_spark.plans.catalog import DeploymentCatalog
    from neo4j_blue_green_arrow_etl_spark.session import get_spark
    from neo4j_blue_green_arrow_etl_spark.sources.snapshot import (
        discover_snapshots,
        read_snapshot,
    )
    from neo4j_blue_green_arrow_etl_spark.streaming.orchestrator import Orchestrator

    spark = get_spark("bench_pipeline")
    base = Path(tempfile.mkdtemp(prefix="bench_pipeline_"))
    materialize_snapshot(spark, sf_dir, str(base), "bench", 1000, scale=scale)

    # row count of the snapshot (outside the timed section)
    ref = discover_snapshots(base)[0]
    nodes, edges = read_snapshot(spark, ref)
    total_rows = nodes.count() + edges.count()

    cat = DeploymentCatalog(spark, manifest_path=base / "manifest.json")
    server = None
    load_fn = None
    if use_flight:
        from neo4j_blue_green_arrow_etl_spark.sinks.flight_server import (
            InMemoryGraphFlightServer,
        )
        from neo4j_blue_green_arrow_etl_spark.sinks.graph_sink import flight_load_fn

        server = InMemoryGraphFlightServer()
        load_fn = flight_load_fn("127.0.0.1", server.port)

    orch = Orchestrator(spark, base, catalog=cat, load_fn=load_fn)
    try:
        t0 = time.time()
        orch.run_cycle()
        wall = time.time() - t0
        assert cat.alias_target("bench") == "bench-1000", cat.list_aliases()
        if server is not None:
            g = server.graphs["bench-1000"]
            assert g["state"] == "done" and g["nodes"] + g["relationships"] == total_rows
    finally:
        # shut the gRPC server down even when the cycle or an assertion
        # fails, so the bench process doesn't leak the server thread
        if server is not None:
            server.shutdown()

    print(
        json.dumps(
            {
                "pipeline_sec": round(wall, 3),
                "rows": total_rows,
                "rows_per_sec": round(total_rows / wall),
                "sink": "flight-grpc" if use_flight else "parquet",
                "sf_dir": sf_dir,
                "scale": scale,
            }
        )
    )


if __name__ == "__main__":
    main()
