"""Measure the recall of the five rows-only approximate queries against
their exact counterparts at a given scale factor.

Usage: python tools/recall_probe.py [sf_dir] [--out RECALL_r3.json]

The oracle sweep can only row-count these (hash-seeded approximation is
not SQL-reproducible), and pytest pins recall floors at sf0.001 — this
probe makes the same checks durable AT SCALE:

- q_dedup_minhash vs q_dedup_ngram: near-dup PAIR recall, plus the
  no-false-positive invariant (candidates are exact-Jaccard-verified)
- q_dedup_simhash vs q_dedup_ngram: pair recall of the verified
  Hamming-radius candidate tier, plus the same no-false-positive
  invariant (r5: shingle-feature fingerprints + band-pair probing +
  exact-Jaccard verify; pinned floor 0.6 in pytest)
- q_sim_lsh / q_sim_ivf / q_sim_pq vs q_x2: top-k id overlap vs the
  exact brute-force scan
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
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from neo4j_blue_green_arrow_etl_spark.operators import REGISTRY
    from neo4j_blue_green_arrow_etl_spark.session import get_spark

    spark = get_spark("recall_probe")
    t0 = time.time()

    exact_pairs = {
        (r.doc_a, r.doc_b)
        for r in REGISTRY["q_dedup_ngram"].spark(spark, args.sf_dir).collect()
    }
    minhash = {
        (r.doc_a, r.doc_b)
        for r in REGISTRY["q_dedup_minhash"].spark(spark, args.sf_dir).collect()
    }
    simhash = {
        (r.doc_a, r.doc_b)
        for r in REGISTRY["q_dedup_simhash"].spark(spark, args.sf_dir).collect()
    }
    brute = [
        r.vec_id for r in REGISTRY["q_x2"].spark(spark, args.sf_dir).collect()
    ]
    ann = {}
    for q in ("q_sim_lsh", "q_sim_ivf", "q_sim_pq"):
        ids = [r.vec_id for r in REGISTRY[q].spark(spark, args.sf_dir).collect()]
        ann[q] = (
            round(len(set(brute) & set(ids)) / len(brute), 3)
            if brute
            else None
        )

    payload = {
        "sf_dir": args.sf_dir,
        "exact_ngram_pairs": len(exact_pairs),
        "minhash": {
            "pairs": len(minhash),
            "false_positives": len(minhash - exact_pairs),
            "recall": round(len(minhash & exact_pairs) / len(exact_pairs), 3)
            if exact_pairs
            else None,
        },
        "simhash": {
            "pairs": len(simhash),
            "false_positives": len(simhash - exact_pairs),
            "recall_vs_ngram": round(
                len(simhash & exact_pairs) / len(exact_pairs), 3
            )
            if exact_pairs
            else None,
        },
        "ann_topk_overlap_vs_bruteforce": ann,
        "secs": round(time.time() - t0, 1),
    }
    print(json.dumps(payload))
    if args.out:
        Path(args.out).write_text(json.dumps(payload, indent=1) + "\n")


if __name__ == "__main__":
    main()
