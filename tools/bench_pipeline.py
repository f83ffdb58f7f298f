"""Snapshot-pipeline benchmark: wall time and rows/s for one full
blue/green cycle (discover -> load -> alias switch -> retention) on a
snapshot materialized from $SPARK_GRAFT_SF_DIR-equivalent data.

Usage: python tools/bench_pipeline.py [sf_dir]
Prints one JSON line: {"pipeline_sec": ..., "rows": ..., "rows_per_sec": ...}
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
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
    materialize_snapshot(spark, sf_dir, str(base), "bench", 1000)

    # row count of the snapshot (outside the timed section)
    ref = discover_snapshots(base)[0]
    nodes, edges = read_snapshot(spark, ref)
    total_rows = nodes.count() + edges.count()

    cat = DeploymentCatalog(spark, manifest_path=base / "manifest.json")
    orch = Orchestrator(spark, base, catalog=cat)
    t0 = time.time()
    orch.run_cycle()
    wall = time.time() - t0
    assert cat.alias_target("bench") == "bench-1000", cat.list_aliases()

    print(
        json.dumps(
            {
                "pipeline_sec": round(wall, 3),
                "rows": total_rows,
                "rows_per_sec": round(total_rows / wall),
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
