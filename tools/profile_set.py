"""Profile a SET of registry queries in one session with bench-like
warmup — the inner A/B loop for optimization work (profile_query.py
times one query per JVM; comparing many queries that way pays a fresh
first-hit penalty per query and per variant).

Usage: python tools/profile_set.py [--passes N] [--sf DIR] q_a1 q_j5 ...
Prints one line per query: min seconds over N passes (noop sink), plus
a total. Methodology matches bench.py (noop write, clearCache between
queries, sf0.001 operator-class warmup).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    args = list(sys.argv[1:])
    passes = 2
    sf_dir = "/root/testdata/sf0.1"
    if "--passes" in args:
        i = args.index("--passes")
        passes = int(args[i + 1])
        del args[i : i + 2]
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    names = args

    from neo4j_blue_green_arrow_etl_spark.operators import REGISTRY
    from neo4j_blue_green_arrow_etl_spark.session import get_spark

    spark = get_spark("profile-set")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    spark.createDataFrame([(1,)], "a int").write.format("noop").mode(
        "overwrite"
    ).save()
    smoke = "/root/testdata/sf0.001"
    for wname in ("q_a1", "q_j5", "q_w2", "q_a4", "q_g6_bfs"):
        if wname in REGISTRY:
            try:
                REGISTRY[wname].spark(spark, smoke).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:
                pass
    spark.catalog.clearCache()

    best: dict[str, float] = {}
    for _ in range(passes):
        for name in names:
            t0 = time.time()
            REGISTRY[name].spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            took = time.time() - t0
            best[name] = min(best.get(name, 1e9), took)
            spark.catalog.clearCache()
    for name in names:
        print(f"{name}: {best[name]:.2f}s", flush=True)
    print(f"TOTAL (min/query): {sum(best.values()):.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
