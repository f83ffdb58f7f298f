"""Bucket-pruned vs full vs AUTO probe crossover measurement.

Builds a wide (default 1024-bucket) shingle index over the sf corpus
side (doc_id % INCR_MOD != 0), then probes batches of increasing size
through all three paths:

- full   — probe_dedup_index: co-located scan of the whole table
- pruned — probe_dedup_index_pruned: path-read of touched buckets only
- auto   — probe_dedup_index_auto: routes on |touched|/buckets vs
           AUTO_PRUNE_THRESHOLD

The r7 artifact (PRUNED_PROBE_r7.json) measured the full/pruned
crossover and left the choice to callers; r8 adds the router — the
check here is that auto ~= min(full, pruned) at every batch size (it
pays one extra distinct+collect for the touched set on the full route).

Usage: python tools/pruned_probe.py [--sf-dir D] [--buckets N]
         [--batches 3,30,300] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--buckets", type=int, default=1024)
    ap.add_argument("--batches", default="3,30,300")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from neo4j_blue_green_arrow_etl_spark.operators.dedup import INCR_MOD
    from neo4j_blue_green_arrow_etl_spark.operators.dedup_index import (
        AUTO_PRUNE_THRESHOLD,
        _touched_buckets,
        append_index_batch,
        ensure_index_table,
        postings_with_sizes,
        probe_dedup_index,
        probe_dedup_index_auto,
        probe_dedup_index_pruned,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import tempfile

    idx = tempfile.mkdtemp(prefix="spark_graft_pruned_probe_")
    # mkdtemp pre-creates the dir; ensure treats it as existing (fine)
    table = ensure_index_table(spark, idx, buckets=args.buckets)
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") % INCR_MOD != 0)
    t0 = time.time()
    append_index_batch(spark, table, postings_with_sizes(corpus), 0)
    build_s = round(time.time() - t0, 2)
    n_files = len(list(Path(idx).glob("batch_id=*/part-*")))
    print(f"index built: {corpus.count()} docs, {n_files} files, {build_s}s")

    incoming = docs.filter(F.col("doc_id") % INCR_MOD == 0)
    result = {
        "sf": args.sf_dir,
        "buckets": args.buckets,
        "auto_threshold": AUTO_PRUNE_THRESHOLD,
        "corpus_docs": corpus.count(),
        "total_files": n_files,
        "batches": {},
    }
    for size in [int(s) for s in args.batches.split(",")]:
        batch = incoming.limit(size).localCheckpoint()
        touched = _touched_buckets(postings_with_sizes(batch), args.buckets)
        row = {"touched_buckets": len(touched)}
        routes = {
            "full": lambda: probe_dedup_index(spark, batch, table),
            "pruned": lambda: probe_dedup_index_pruned(spark, batch, idx),
            "auto": lambda: probe_dedup_index_auto(spark, batch, idx),
        }
        for name, fn in routes.items():
            best, rows = None, None
            for _ in range(2):  # 2-pass min: drop warm-up jitter
                t0 = time.time()
                rows = fn().count()
                sec = time.time() - t0
                best = sec if best is None else min(best, sec)
            row[name] = {"sec": round(best, 3), "rows": rows}
        row["auto_route"] = (
            "pruned"
            if len(touched) <= AUTO_PRUNE_THRESHOLD * args.buckets
            else "full"
        )
        result["batches"][str(size)] = row
        print(size, row)

    result["note"] = (
        "2-pass min per cell, idle local[32], "
        f"{args.buckets}-bucket index over the {args.sf_dir} corpus "
        "side. r8 adds probe_dedup_index_auto: routes pruned when "
        f"|touched|/buckets <= {AUTO_PRUNE_THRESHOLD} (the r7-measured "
        "crossover), full co-located scan otherwise — auto should "
        "track min(full, pruned) at every size, paying only the "
        "touched-set distinct+collect on the full route."
    )
    out = args.out or "PRUNED_PROBE.json"
    Path(out).write_text(json.dumps(result, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
