"""Near-bar routing probe (VERDICT r10 task 5): the capstone
duplicate-mass routers' thresholds (dedup.PAIR_MASS_PER_DOC=500,
dedup.FUZZY_BLOCK_MASS_PER_DOC=160) are calibrated constants pinned by
two far-apart regimes (proportional ~28-253/doc, adversarial 535+/doc).
This probe measures the GRAY ZONE: corpora engineered to sit at
~0.8x and ~1.2x of each bar, with BOTH tiers timed on each side, so the
worst-case cost of the router's choice near the bar is a measured,
bounded number (the same crossover argument the pruned-probe router
makes) rather than an assumption.

Corpus construction: start from sf0.1 documents and append k near-dup
copies (" nb{i}" suffix — same first token, shingle overlap ~1) of the
first D docs; D and k tune the added pair/block mass. The probe
measures the actual estimator values (shingle_pair_mass /
fuzzy_block_mass per doc) on each built corpus and records them next
to the timings — the corpora are defined by their MEASURED mass ratio
to the bar, not by the construction parameters.

Routing is forced through the caller-visible env overrides
(SPARK_GRAFT_PAIR_MASS_PER_DOC / SPARK_GRAFT_FUZZY_BLOCK_MASS_PER_DOC,
operators/dedup.route_by_mass): a huge bar forces the EXACT tier, 0
forces the CAPPED tier, unset measures the router's own choice.

Usage: python tools/near_bar_probe.py [--repeats 2] [--out FILE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BASE_SF = "/root/testdata/sf0.1"
WORK = "/tmp/spark_graft_nearbar"

# (name, registry query, mass estimator, bar constant, env var)
ROUTERS = {
    "pair_mass": {
        "query": "q_x45_curate",
        "env": "SPARK_GRAFT_PAIR_MASS_PER_DOC",
    },
    "fuzzy_block_mass": {
        "query": "q_x31_erclusters",
        "env": "SPARK_GRAFT_FUZZY_BLOCK_MASS_PER_DOC",
    },
}


def _build(spark, name: str, dup_docs: int, copies: int) -> str:
    """sf0.1 documents + `copies` near-dup copies of the first
    `dup_docs` docs, ids shifted far above the base range."""
    from pyspark.sql import functions as F

    out = f"{WORK}/{name}"
    if Path(out, "_READY").exists():
        return out
    src = spark.read.parquet(f"{BASE_SF}/documents.parquet")
    seeds = src.orderBy("doc_id").limit(dup_docs)
    parts = [src]
    for i in range(1, copies + 1):
        parts.append(
            seeds.withColumn(
                "doc_id", F.col("doc_id") + F.lit(i * 10_000_000)
            ).withColumn("text", F.concat(F.col("text"), F.lit(f" nb{i}")))
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    Path(out, "_READY").write_text("ok")
    return out


def _masses(spark, sf_dir: str) -> dict[str, float]:
    from neo4j_blue_green_arrow_etl_spark.operators.dedup import (
        _docs,
        fuzzy_block_mass,
        fuzzy_blocking_table,
        hashed_shingle_postings,
        shingle_pair_mass,
    )

    docs = _docs(spark, sf_dir)
    n = docs.count()
    return {
        "n_docs": n,
        "pair_mass_per_doc": round(
            shingle_pair_mass(hashed_shingle_postings(docs)) / n, 1
        ),
        "fuzzy_block_mass_per_doc": round(
            fuzzy_block_mass(fuzzy_blocking_table(docs)) / n, 1
        ),
    }


def _timed(spark, query: str, sf_dir: str, repeats: int) -> float:
    from neo4j_blue_green_arrow_etl_spark.operators import REGISTRY

    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        REGISTRY[query].spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        best = min(best, time.time() - t0)
        spark.catalog.clearCache()
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--out", default="NEAR_BAR_PROBE.json")
    args = ap.parse_args()

    from neo4j_blue_green_arrow_etl_spark.operators.dedup import (
        FUZZY_BLOCK_MASS_PER_DOC,
        PAIR_MASS_PER_DOC,
    )
    from neo4j_blue_green_arrow_etl_spark.session import get_spark

    spark = get_spark("near_bar_probe")
    bars = {
        "pair_mass": PAIR_MASS_PER_DOC,
        "fuzzy_block_mass": FUZZY_BLOCK_MASS_PER_DOC,
    }
    # Construction parameters found by measuring the estimators on
    # candidate builds (the artifact records the measured masses, which
    # are what define the regime): the " nb{i}" copies share ~all
    # shingles and the first token, so pair mass grows ~C(copies+1, 2)
    # x shingles/doc x dup_docs and block mass likewise within tok1
    # blocks. below_* targets ~0.8x of each bar, above_* ~1.2x.
    # measured (2026-08-16): pair 0.84x / 1.23x, fuzzy 0.77x / 1.12x;
    # corpus names are parameter-keyed so a parameter change can never
    # silently reuse a stale build's _READY marker
    corpora = {
        "pair_mass": {
            "below": ("pair_d60_k19", 60, 19),
            "above": ("pair_d90_k26", 90, 26),
        },
        "fuzzy_block_mass": {
            "below": ("fuzzy_d260_k9", 260, 9),
            "above": ("fuzzy_d330_k17", 330, 17),
        },
    }
    result: dict = {
        "base_sf_dir": BASE_SF,
        "bars": bars,
        "what": (
            "gray-zone routing cost: corpora measured at ~0.8x/1.2x of "
            "each duplicate-mass bar, both tiers forced via the env "
            "overrides, worst_case_ratio = auto / min(exact, capped) — "
            "the bounded cost of a wrong routing near the bar"
        ),
        "routers": {},
    }
    for router, spec in ROUTERS.items():
        query, env = spec["query"], spec["env"]
        rrows = {}
        for side, (name, dup_docs, copies) in corpora[router].items():
            sf_dir = _build(spark, name, dup_docs, copies)
            masses = _masses(spark, sf_dir)
            mass = masses[f"{router}_per_doc"]
            os.environ.pop(env, None)
            t_auto = _timed(spark, query, sf_dir, args.repeats)
            os.environ[env] = "1e18"
            t_exact = _timed(spark, query, sf_dir, args.repeats)
            os.environ[env] = "0"
            t_capped = _timed(spark, query, sf_dir, args.repeats)
            os.environ.pop(env, None)
            best = min(t_exact, t_capped)
            rrows[side] = {
                "corpus": name,
                "measured_mass_per_doc": mass,
                "mass_over_bar": round(mass / bars[router], 3),
                "auto_choice": "capped" if mass > bars[router] else "exact",
                "secs": {
                    "auto": t_auto,
                    "forced_exact": t_exact,
                    "forced_capped": t_capped,
                },
                "worst_case_ratio": round(t_auto / best, 3),
                **{
                    k: v
                    for k, v in masses.items()
                    if k != f"{router}_per_doc"
                },
            }
            print(f"{router}/{side}: {rrows[side]}", flush=True)
        result["routers"][router] = {"query": query, "env": env, **rrows}
    Path(args.out).write_text(json.dumps(result, indent=1) + "\n")
    print(f"wrote {args.out}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
