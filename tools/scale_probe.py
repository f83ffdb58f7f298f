"""Measured scale-up probe: run representative operators at 1x/2x/4x/8x
of sf0.1 and record how wall time grows.

Usage: python tools/scale_probe.py [--factors 1,2,4,8] [--out SCALE_PROBE.json]

The scaled inputs are built in /tmp by replicating the sf0.1 tables with
SHIFTED keys (and per-replica text suffixes), so key cardinality, join
multiplicity, and duplicate structure grow with the data instead of
degenerating (a naive self-union would make every document an exact
duplicate and every join key 8x hot — measuring skew, not scale).

Probed queries (one per cost family):
- q_a1        scan + aggregate          (lineitem)
- q_j5        large-large sort-merge    (orders join lineitem, same shift)
- q_x1        exact dedup groupBy       (documents, distinct texts)
- q_x13_sample window rank per group    (documents)
- q_dedup_minhash LSH candidate join    (documents; bucket-cap regression guard)
- q_x24_fuzzy  salted blocking join     (documents; hot-block regression guard)

Output: one JSON with secs per (query, factor) and the log2-slope
("scaling exponent": 1.0 = perfectly linear). At local[32] with fixed
resources, time ~ factor^e with e <= ~1 is the pass signal; e >> 1
flags a super-linear operator. This is the measured companion to
SCALING.md's per-family arguments.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BASE_SF = "/root/testdata/sf0.1"
# r6: new tree name — the r5 tree lacks the embeddings table and its
# _READY markers would skip the rebuild
WORK = "/tmp/spark_graft_scale_r6"

# table -> (int key columns to shift, text columns to suffix)
# l_partkey/l_suppkey are shifted so the part--supplier graph grows
# with the factor (disconnected replica per shift): without it the
# distinct edge list of the graph probes would collapse back to the
# x1 graph and the probe would measure nothing. embeddings replicate
# with a per-replica vector perturbation (below) so ANN bucket/list
# structure grows proportionally instead of stacking exact-duplicate
# vectors into maximally hot buckets.
TABLES = {
    "lineitem": (["l_orderkey", "l_partkey", "l_suppkey"], []),
    "orders": (["o_orderkey"], []),
    "documents": (["doc_id"], ["text"]),
    "embeddings": (["vec_id"], []),
}
PROBES = [
    "q_a1",
    "q_j5",
    "q_x1",
    "q_x13_sample",
    "q_dedup_minhash",
    "q_x24_fuzzy",
    # iterative graph family (VERDICT r4 task 3): runtime must grow with
    # rounds x frontier/edges, not quadratically. Replica graphs keep the
    # round count constant while edges grow linearly, so exponent <= ~1.2
    # is the pass signal here too.
    "q_g8_kcore",
    "q_g10_sssp",
    "q_x5b_clusters_star",
    # r6: the capped production twin of the fuzzy/ER family — the cap
    # is the mechanism that removes the uncapped 1.13 exponent, so it
    # is probed by default; the deep x16/x32 run (--queries ... |
    # --factors 1,...,32) extends the capped dedup/ANN tier to the
    # factors where bucket/block caps actually pay off.
    "q_x24b_fuzzy_capped",
    # r7: the indexed incremental-dedup probe — its recompute twin
    # q_x44_incrdedup and the streaming fold q_st6_neardup are probed
    # in the dedicated probe-vs-recompute run (SCALE_PROBE_INDEX_r7:
    # --queries q_x44_incrdedup,q_x44b_incrdedup_indexed,q_st6_neardup
    # --tables documents --factors 1,2,4,8,16), as are the composed
    # capstones q_x31b_erclusters_capped / q_x45_curate (r6 task 5).
    "q_x44b_incrdedup_indexed",
]
KEY_STRIDE = 100_000_000


def build_scaled(
    spark,
    factor: int,
    tables: list[str] | None = None,
    text_mode: str = "suffix",
    fixed_batch: bool = False,
) -> str:
    """text_mode governs how replica TEXT diverges:

    - "suffix" (default): append " r{i}" — replicas stay EXACT-distinct
      but remain NEAR-duplicates of each other (only trailing shingles
      change), so true near-dup pair volume grows ~quadratically with
      the factor. This is the duplicate-ADVERSARIAL stress tree: probes
      of Jaccard-tier operators measure output-proportional verify
      work, not input scaling.
    - "tagwords": suffix every word with the replica tag
      ("w1_r1 w2_r1 ...") — the replica's 3-gram structure is
      ISOMORPHIC to the base tree's (pairwise Jaccard within a
      replica is exactly the base value) while cross-replica Jaccard
      is ZERO, so duplicate structure stays PROPORTIONAL to corpus
      size. This is the constant-duplicate-rate growth tree — the
      exponent that answers "what happens when the corpus grows"
      rather than "what happens when one dup chain goes hot".
    - "interleave": weave an "r{i}" token BETWEEN words. Also zero
      cross-replica Jaccard, but the woven grams (r{i}, w, r{i}) are
      shared by ANY two docs of a replica sharing ONE word — every
      replica becomes a hot-shingle block of near-replica size. This
      is the HOT-KEY adversarial tree for exact Jaccard tiers
      (candidate volume quadratic by construction; measured: q_x45
      9x at x2 vs tagwords); keep it for stressing cap/df-bound
      tiers, not for growth exponents of exact ones.
    """
    from pyspark.sql import functions as F

    tables = tables or list(TABLES)
    suffix = {"suffix": "", "interleave": "_disjoint", "tagwords": "_tagwords"}[
        text_mode
    ]
    if fixed_batch:
        suffix += "_fixedbatch"
    out = f"{WORK}/x{factor}{suffix}"
    # per-table markers: a deep-factor run that needs only documents +
    # embeddings must not pay for (or depend on) lineitem/orders builds
    pending = [t for t in tables if not Path(out, f"_READY_{t}").exists()]
    if not pending:
        return out
    for table in pending:
        keys, texts = TABLES[table]
        src = spark.read.parquet(f"{BASE_SF}/{table}.parquet")
        parts = []
        for i in range(factor):
            rep = src
            for k in keys:
                rep = rep.withColumn(k, F.col(k) + F.lit(i * KEY_STRIDE))
            if fixed_batch and table == "documents" and i > 0:
                # daily-ingest shape: the CORPUS grows with the factor
                # while the incoming batch stays the base tree's batch.
                # q_x44*'s batch convention is doc_id % 10 == 0
                # (operators/dedup.INCR_MOD); KEY_STRIDE is a multiple
                # of 10, so dropping the batch residue from every
                # replica leaves exactly the base batch probing a
                # corpus ~0.9 x factor larger — the batch<<corpus
                # regime the persisted index exists for (the plain
                # trees scale the batch WITH the corpus, so quadratic
                # verify work swamps the index-vs-recompute delta).
                rep = rep.filter(F.col("doc_id") % 10 != 0)
            for t in texts:
                if text_mode == "tagwords" and i > 0:
                    rep = rep.withColumn(
                        t,
                        F.regexp_replace(F.col(t), r"(\S+)", f"$1_r{i}"),
                    )
                elif text_mode == "interleave" and i > 0:
                    rep = rep.withColumn(
                        t,
                        F.concat(
                            F.lit(f"r{i} "),
                            F.regexp_replace(F.col(t), " ", f" r{i} "),
                        ),
                    )
                else:
                    # exact-distinct content per replica (but still
                    # near-dup across replicas — see docstring)
                    rep = rep.withColumn(
                        t, F.concat(F.col(t), F.lit(f" r{i}"))
                    )
            if table == "embeddings" and i > 0:
                # deterministic per-replica perturbation: replicas are
                # near (not exact) duplicates, so LSH/IVF bucket and
                # list populations grow with the factor instead of
                # collapsing onto identical hash keys
                rep = rep.withColumn(
                    "embedding",
                    F.transform(
                        F.col("embedding"),
                        lambda x, j: x
                        + (F.lit(float(i)) * 0.013 + (j + 1) * 0.0007)
                        % F.lit(0.11),
                    ),
                )
            parts.append(rep)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.write.mode("overwrite").parquet(f"{out}/{table}.parquet")
        Path(out, f"_READY_{table}").parent.mkdir(parents=True, exist_ok=True)
        Path(out, f"_READY_{table}").write_text("ok")
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,2,4,8")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--out", default="SCALE_PROBE.json")
    ap.add_argument(
        "--tables",
        default=None,
        help="comma-separated tables to replicate (default: all; pass "
        "documents,embeddings for the deep-factor dedup/ANN tier)",
    )
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated registry names to probe (default: the "
        "built-in one-per-cost-family set)",
    )
    ap.add_argument(
        "--text-mode",
        default="suffix",
        choices=["suffix", "tagwords", "interleave"],
        help="replica text divergence: suffix = near-dup-adversarial "
        "stress tree (default); tagwords = zero cross-replica Jaccard "
        "with base-isomorphic shingle structure (the proportional "
        "growth tree); interleave = hot-shingle adversarial tree "
        "(quadratic exact-tier candidates by construction)",
    )
    ap.add_argument(
        "--fixed-batch",
        action="store_true",
        help="hold the q_x44* incoming batch at the BASE tree's batch "
        "(drop the doc_id%%10==0 residue from every replica) so the "
        "probe measures a fixed daily ingest against a corpus growing "
        "with the factor — the batch<<corpus regime the persisted "
        "index exists for",
    )
    args = ap.parse_args()
    factors = [int(f) for f in args.factors.split(",")]
    probes = args.queries.split(",") if args.queries else PROBES
    tables = args.tables.split(",") if args.tables else None

    from neo4j_blue_green_arrow_etl_spark.operators import REGISTRY
    from neo4j_blue_green_arrow_etl_spark.session import get_spark

    spark = get_spark("scale_probe")
    # warm codegen/scheduler so x1 isn't billed the startup cost
    spark.read.parquet(f"{BASE_SF}/nation.parquet").count()

    results: dict[str, dict[str, float]] = {q: {} for q in probes}
    for factor in factors:
        sf_dir = build_scaled(
            spark, factor, tables, args.text_mode, args.fixed_batch
        )
        for q in probes:
            # min over repeats: the first run pays cold page-cache and
            # codegen cost that would otherwise masquerade as compute
            best = None
            for _ in range(max(args.repeats, 1)):
                t0 = time.time()
                REGISTRY[q].spark(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            results[q][str(factor)] = round(best, 3)
            print(f"x{factor} {q}: {results[q][str(factor)]}s", file=sys.stderr)

    slopes = {}
    for q, times in results.items():
        fs = sorted(int(f) for f in times)
        # the smallest factor runs first and still carries residual
        # cold-start (page cache, codegen) — fit on the warm factors
        if len(fs) >= 3:
            fs = fs[1:]
        if len(fs) >= 2:
            # least-squares slope of log2(time) vs log2(factor)
            xs = [math.log2(f) for f in fs]
            ys = [math.log2(times[str(f)]) for f in fs]
            n = len(xs)
            mx, my = sum(xs) / n, sum(ys) / n
            denom = sum((x - mx) ** 2 for x in xs)
            slopes[q] = round(
                sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom, 3
            )
    payload = {
        "base_sf_dir": BASE_SF,
        "factors": factors,
        "fixed_batch": args.fixed_batch,
        "text_mode": args.text_mode,
        "secs": results,
        "scaling_exponent_warm": slopes,
        "note": "exponent ~1.0 = linear time growth on fixed local[32] "
        "resources (fit over the warm factors, smallest dropped); "
        "~0 means the operator is still fixed-overhead-bound at the "
        "largest factor — compute headroom, not a scaling property",
    }
    print(json.dumps(payload))
    Path(args.out).write_text(json.dumps(payload, indent=1) + "\n")


if __name__ == "__main__":
    main()
