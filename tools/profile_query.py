"""Profile ONE registry query at a given SF: wall time over N runs plus
the formatted physical plan — the inner loop for bench optimization.

Usage: python tools/profile_query.py q_x24_fuzzy [sf_dir] [runs]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    from pyspark.sql import SparkSession

    from neo4j_blue_green_arrow_etl_spark.operators import REGISTRY

    spark = (
        SparkSession.builder.master("local[32]")
        .appName(f"profile-{name}")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    spark.createDataFrame([(1,)], "a int").write.format("noop").mode(
        "overwrite"
    ).save()
    q = REGISTRY[name].spark
    for i in range(runs):
        t0 = time.monotonic()
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()
        print(f"run {i}: {time.monotonic() - t0:.2f}s", flush=True)
        spark.catalog.clearCache()
    if "--explain" in sys.argv:
        q(spark, sf_dir).explain("formatted")
    spark.stop()


if __name__ == "__main__":
    main()
