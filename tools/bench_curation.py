"""Curation-capstone benchmark: the COMPOSED production pipeline —
MinHash-LSH dedup (candidates + exact-Jaccard verify) -> star-CC
duplicate clusters -> canonical-survivor selection -> quality-histogram
token-budget selection — end to end over an N-replica documents table.

Usage: python tools/bench_curation.py [sf_dir] [--scale N] [--frac F]
                                      [--mode disjoint|neardup]
                                      [--out FILE.json]

Per-operator probes (tools/scale_probe.py) prove each stage's scaling
alone; this tool measures what a real 100 TB curation run executes: the
multi-stage plan where dedup's shuffle output feeds an iterative CC,
whose labels anti-join the corpus, whose survivors feed the budget
histogram — shuffle reuse, checkpoint pressure, and stage overlap
included. Prints one JSON line with wall time, per-stage seconds, and
docs/s; the BASELINE.md "curation capstone" row records the x100 run
(VERDICT r5 task 6).

The scaled input replicates sf0.1's documents with SHIFTED doc_ids;
--mode picks the text discipline (see build_scaled_docs): "disjoint"
grows duplicate structure linearly (the honest N x data measurement),
"neardup" builds the adversarial all-duplicates corpus that stress-
tests the bucket/block caps.

Memory: the x100 run (500k docs, ~80M cached shingle rows, 32
concurrent tasks) needs more than the 8g default single-JVM heap —
run with SPARK_GRAFT_DRIVER_MEM=32g (a real cluster's aggregate
executor memory dwarfs this; the knob exists only because local[32]
puts all 32 task slots in one JVM).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BASE_SF = "/root/testdata/sf0.1"
WORK = "/tmp/spark_graft_curation"
KEY_STRIDE = 100_000_000


def build_scaled_docs(spark, factor: int, mode: str = "disjoint") -> str:
    """N replicas of sf0.1's documents with shifted doc_ids.

    mode="disjoint" (default): every WORD carries a replica tag, so
    replicas share no shingles — the corpus is N disjoint copies and
    duplicate structure (pairs, clusters, dropped mass) grows LINEARLY
    with the factor: the honest "N x more data" workload.

    mode="neardup": only a per-replica suffix is appended, so each doc
    is a >=0.9-Jaccard near-dup of its N-1 replicas — an adversarial
    all-duplicates corpus (every bucket/block is hot, pair mass is
    quadratic in N before the caps act). Useful as the cap stress
    test, NOT as a scale measurement."""
    from pyspark.sql import functions as F

    out = f"{WORK}/{mode}_x{factor}"
    marker = Path(out, "_READY")
    if marker.exists():
        return out
    src = spark.read.parquet(f"{BASE_SF}/documents.parquet")
    parts = []
    for i in range(factor):
        rep = src.withColumn(
            "doc_id", F.col("doc_id") + F.lit(i * KEY_STRIDE)
        )
        if i > 0:
            if mode == "neardup":
                rep = rep.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" r{i}"))
                )
            else:
                rep = rep.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda w: F.concat(F.lit(f"r{i}."), w),
                        ),
                        " ",
                    ),
                )
        parts.append(rep)
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    marker.write_text("ok")
    return out


def main() -> None:
    argv = sys.argv[1:]

    def opt(flag, default, cast):
        if flag in argv:
            i = argv.index(flag)
            v = cast(argv[i + 1])
            del argv[i : i + 2]
            return v
        return default

    scale = opt("--scale", 100, int)
    frac = opt("--frac", 0.6, float)
    mode = opt("--mode", "disjoint", str)
    out_file = opt("--out", None, str)
    sf_dir = argv[0] if argv else BASE_SF

    from pyspark.sql import functions as F

    from neo4j_blue_green_arrow_etl_spark.operators.curation import (
        _BUDGET_BINS,
        token_budget_select,
    )
    from neo4j_blue_green_arrow_etl_spark.operators.dedup import (
        q_dedup_minhash,
    )
    from neo4j_blue_green_arrow_etl_spark.operators.graph import (
        connected_components_star,
    )
    from neo4j_blue_green_arrow_etl_spark.session import get_spark

    # x100 adversarial verifies ~27M near-dup pairs; the default 8g
    # driver heap (fine for every per-query bench) OOMed here once GC
    # locker + parquet read-ahead stacked on 32 task threads — size
    # the one tool that runs 100x data accordingly
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = get_spark("bench_curation")
    work = build_scaled_docs(spark, scale, mode) if scale > 1 else sf_dir
    docs = spark.read.parquet(f"{work}/documents.parquet")
    n_docs = docs.count()  # outside the timed section

    t_all = time.time()
    stages: dict[str, float] = {}

    # 1. DEDUP: MinHash-LSH candidates + exact-Jaccard verify. The pair
    #    set is materialized (localCheckpoint) because CC iterates over
    #    it — recomputing the whole dedup plan per CC round would bill
    #    dedup rounds times.
    t0 = time.time()
    pairs = (
        q_dedup_minhash(spark, work)
        .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .localCheckpoint()
    )
    n_pairs = pairs.count()
    stages["dedup_minhash"] = round(time.time() - t0, 2)

    # 2. CLUSTER: large-star/small-star contraction; non-canonical
    #    members (node != comp) are the duplicates a curation run drops.
    t0 = time.time()
    labels = connected_components_star(
        pairs.select(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"))
    )
    dropped = labels.filter(F.col("node") != F.col("comp")).select(
        F.col("node").alias("doc_id")
    )
    n_dropped = dropped.count()
    stages["cluster_cc"] = round(time.time() - t0, 2)

    # 3+4. GATE + SELECT: survivors (anti-join against dropped) flow
    #      into the quality-histogram budget cutoff — one composed plan,
    #      forced by a single count at the end. No broadcast hint: in
    #      the adversarial neardup mode the dropped set is ~99% of the
    #      corpus, so the join strategy is left to AQE's measured size.
    t0 = time.time()
    words = F.split(F.col("text"), " ")
    qbin = F.floor(
        F.size(F.array_distinct(words)) / F.size(words) * _BUDGET_BINS
    ).cast("int")
    survivors = docs.join(dropped, "doc_id", "left_anti").select(
        "doc_id", "n_chars", qbin.alias("qbin")
    )
    selected = token_budget_select(survivors, frac=frac)
    sel = selected.agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("chars")
    ).first()
    stages["gate_select"] = round(time.time() - t0, 2)

    wall = round(time.time() - t_all, 2)
    payload = {
        "scale": scale,
        "mode": mode if scale > 1 else "base",
        "sf_base": sf_dir if scale == 1 else BASE_SF,
        "docs_in": n_docs,
        "dup_pairs": n_pairs,
        "docs_dropped_as_dups": n_dropped,
        "docs_selected": int(sel.n),
        "chars_selected": int(sel.chars),
        "budget_frac": frac,
        "stage_secs": stages,
        "pipeline_sec": wall,
        "docs_per_sec": round(n_docs / wall, 1),
    }
    print(json.dumps(payload))
    if out_file:
        Path(out_file).write_text(json.dumps(payload, indent=1) + "\n")


if __name__ == "__main__":
    main()
