"""Query-side latency-vs-corpus-size curve for the at-rest IVF-PQ index.

The dedup index has scale-probe trees (SCALE_PROBE_INDEX/FIXEDBATCH/
DISJOINT); this is the ANN twin (VERDICT r8 task 3): build the index
over x1..x32 replicas of the sf embeddings table and measure
query_ivfpq_index wall time and top-5 recall per (scale, nprobe)
point, so the "cell pruning keeps queries fast" claim has a measured
exponent and a stated policy for when to raise IVF_CELLS.

Corpus synthesis: replica k shifts vec_ids by k*N and adds a small
deterministic per-element perturbation (2% of the mean norm, a fixed
sinusoid of vec_id and position — no RNG, reruns are byte-stable), so
scaled corpora keep the base distribution without exact duplicates.

Ground truth is brute-force cosine in numpy driver-side over the
CURRENT corpus (measurement harness, not a data path — 64k x 64 floats
at x32 is ~33 MB). Latency is the median of --queries fresh
query_ivfpq_index calls (each pays the real plan-build + scan cost; a
production server would reuse plans, so the floor here is
conservative).

What to expect and how to read it: IVF_CELLS is FIXED (16), so each
cell's row count grows linearly with the corpus and a query scans
nprobe/IVF_CELLS of everything — the latency exponent should approach
the scan's linear slope only once per-cell data outgrows the job-floor
constant. The policy knob is cells-per-corpus: raise IVF_CELLS (and
re-train) when per-cell rows push the probed fraction's scan past the
latency budget; the curve names where that happens for this fixture.

Usage: python tools/ann_scale_probe.py [--sf-dir D] [--scales 1,2,4,..]
         [--queries Q] [--nprobes 2,4,8] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def brute_top5(mat: np.ndarray, ids: np.ndarray, qvec: np.ndarray, qid: int):
    norms = np.sqrt((mat * mat).sum(axis=1))
    sims = (mat @ qvec) / (norms * np.sqrt(qvec @ qvec))
    order = np.lexsort((ids, -sims))
    out = [int(ids[i]) for i in order[:6] if ids[i] != qid]
    return out[:5]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--scales", default="1,2,4,8,16,32")
    ap.add_argument("--queries", type=int, default=5)
    ap.add_argument("--nprobes", default="2,4,8,16")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]
    nprobes = [int(p) for p in args.nprobes.split(",")]

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from neo4j_blue_green_arrow_etl_spark.operators.similarity import (
        IVF_CELLS,
        build_ivfpq_index,
        query_ivfpq_index,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n_base = base.count()
    mean_norm = float(
        base.select(
            F.sqrt(
                F.aggregate(
                    "embedding", F.lit(0.0), lambda a, x: a + x * x
                )
            ).alias("nrm")
        )
        .agg(F.avg("nrm"))
        .first()[0]
    )
    jitter = 0.02 * mean_norm

    rng = np.random.default_rng(11)
    qids = sorted(int(v) for v in rng.choice(n_base, args.queries, replace=False))
    qvecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in base.filter(F.col("vec_id").isin(qids)).collect()
    }

    work = tempfile.mkdtemp(prefix="spark_graft_annscale_")
    result = {
        "sf": args.sf_dir,
        "base_vectors": n_base,
        "ivf_cells": IVF_CELLS,
        "queries": args.queries,
        "jitter_frac_of_mean_norm": 0.02,
        "scales": {},
    }

    for scale in scales:
        reps = [base]
        for k in range(1, scale):
            reps.append(
                base.select(
                    (F.col("vec_id") + F.lit(k * n_base)).alias("vec_id"),
                    F.transform(
                        "embedding",
                        lambda x, i: x
                        + F.lit(jitter)
                        * F.sin(F.col("vec_id") * 0.37 + i.cast("double") * 1.7 + k),
                    ).alias("embedding"),
                )
            )
        corpus = reps[0]
        for r in reps[1:]:
            corpus = corpus.unionByName(r)
        cdir = f"{work}/x{scale}"
        corpus.write.mode("overwrite").parquet(f"{cdir}/embeddings.parquet")

        idx = f"{work}/idx_x{scale}"
        t0 = time.monotonic()
        build_ivfpq_index(spark, cdir, idx)
        build_s = time.monotonic() - t0

        rows = spark.read.parquet(f"{cdir}/embeddings.parquet").collect()
        ids = np.array([r.vec_id for r in rows])
        mat = np.array([r.embedding for r in rows], dtype=np.float64)

        point = {
            "vectors": int(len(ids)),
            "rows_per_cell_avg": round(len(ids) / IVF_CELLS, 1),
            "build_s": round(build_s, 2),
            "nprobe": {},
        }
        for nprobe in nprobes:
            lat, hits = [], []
            for qid in qids:
                qvec = qvecs[qid]
                t0 = time.monotonic()
                got = [
                    r.vec_id
                    for r in query_ivfpq_index(
                        spark,
                        idx,
                        [float(v) for v in qvec],  # plain floats: the
                        # query path feeds a createDataFrame re-rank
                        probes=nprobe,
                        exclude_id=qid,
                    ).collect()
                ]
                lat.append(time.monotonic() - t0)
                truth = brute_top5(mat, ids, qvec, qid)
                hits.append(len(set(got) & set(truth)) / 5)
            point["nprobe"][str(nprobe)] = {
                "median_query_s": round(statistics.median(lat), 3),
                "recall_at_5": round(statistics.mean(hits), 3),
            }
        # recall->nprobe POLICY (r10): (a) smallest swept nprobe whose
        # jittered-protocol recall meets 0.9; (b) what the library's
        # own calibrator picks on this index (corpus-vector queries vs
        # exact-cosine truth — the knob a deployment actually pins).
        swept_ok = [
            p
            for p in nprobes
            if point["nprobe"][str(p)]["recall_at_5"] >= 0.9
        ]
        from neo4j_blue_green_arrow_etl_spark.operators.similarity import (
            calibrate_nprobe,
        )

        point["policy"] = {
            "target_recall": 0.9,
            "smallest_swept_nprobe_meeting_target": (
                min(swept_ok) if swept_ok else None
            ),
            "calibrated": calibrate_nprobe(spark, idx, target_recall=0.9),
        }
        result["scales"][f"x{scale}"] = point
        print(f"x{scale}: {json.dumps(point)}", flush=True)

    # latency exponent at the default nprobe across the measured range
    import math

    default_np = str(nprobes[len(nprobes) // 2])
    xs = [s for s in scales]
    ys = [
        result["scales"][f"x{s}"]["nprobe"][default_np]["median_query_s"]
        for s in scales
    ]
    lx, ly = [math.log(v) for v in xs], [math.log(v) for v in ys]
    mx, my = sum(lx) / len(lx), sum(ly) / len(ly)
    slope = sum((a - mx) * (b - my) for a, b in zip(lx, ly)) / sum(
        (a - mx) ** 2 for a in lx
    )
    result["latency_exponent_at_default_nprobe"] = round(slope, 3)
    out = args.out or "SCALE_PROBE_ANN_r10.json"
    Path(out).write_text(json.dumps(result, indent=1))
    print(f"wrote {out}; exponent {slope:.3f}")


if __name__ == "__main__":
    main()
