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
        # INTERLEAVED passes (r10): one pass of every route, repeated —
        # host-noise spikes then hit all routes about equally instead of
        # whichever route owned the noisy window (the r9 artifact showed
        # auto 1.25-2.4x off its own underlying route from noise alone);
        # min-of-4 per route drops the spikes.
        best: dict[str, float] = {}
        rows_by: dict[str, int] = {}
        for fn in routes.values():  # untimed warm-up: codegen + caches
            fn().count()
        order = list(routes.items())
        for i in range(10):
            # rotate the visit order per pass: a multi-second host-noise
            # burst then lands on a different route each cycle
            for name, fn in order[i % 3 :] + order[: i % 3]:
                t0 = time.time()
                rows_by[name] = fn().count()
                sec = time.time() - t0
                best[name] = min(best.get(name, sec), sec)
        for name in routes:
            row[name] = {"sec": round(best[name], 3), "rows": rows_by[name]}
        route = (
            "pruned"
            if len(touched) <= AUTO_PRUNE_THRESHOLD * args.buckets
            else "full"
        )
        row["auto_route"] = route
        # auto_vs_chosen is the router's true overhead (the decision
        # job + ensure); auto_vs_min additionally exposes crossover
        # calibration — at full bucket coverage the two underlying
        # routes are equal within host noise and flip winners between
        # runs, so auto_vs_min can exceed 1 there without any real
        # overhead (see note).
        row["auto_vs_chosen"] = round(best["auto"] / best[route], 3)
        row["auto_vs_min"] = round(best["auto"] / min(best["full"], best["pruned"]), 3)
        result["batches"][str(size)] = row
        print(size, row)

    result["note"] = (
        "10-pass rotating-order interleaved min per cell, idle local[32], "
        f"{args.buckets}-bucket index over the {args.sf_dir} corpus "
        "side. r8 added probe_dedup_index_auto (routes pruned when "
        f"|touched|/buckets <= {AUTO_PRUNE_THRESHOLD}); r10: the exact "
        "touched-set job's shuffle is BOUNDED (map-side partial "
        "distinct caps it at width x partitions ids — one ~0.15 s job "
        "at every batch size; the r9 'full-route overhead' was host "
        "noise on top of it), and indexes wider than "
        "_ESTIMATE_MIN_WIDTH pre-estimate with a single-row HLL agg "
        "so a clearly-full batch skips even that. auto_vs_chosen is "
        "the router's measured overhead; at 100% bucket coverage full "
        "and pruned are equal within host noise and swap winners "
        "between runs, so auto_vs_min at that cell reads the coin "
        "flip, not the router."
    )
    out = args.out or "PRUNED_PROBE.json"
    Path(out).write_text(json.dumps(result, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
