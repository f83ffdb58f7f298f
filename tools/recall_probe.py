"""Measure the recall of the rows-only approximate queries against
their exact counterparts at a given scale factor — plus (r6) the pair
recall and ER cluster agreement of the CAPPED fuzzy/ER tier vs its
uncapped oracle-gated twin.

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
    for q in ("q_sim_lsh", "q_sim_ivf", "q_sim_pq", "q_sim_ivfpq"):
        ids = [r.vec_id for r in REGISTRY[q].spark(spark, args.sf_dir).collect()]
        ann[q] = (
            round(len(set(brute) & set(ids)) / len(brute), 3)
            if brute
            else None
        )

    # r6: the capped fuzzy/ER production twin — pair recall vs the
    # uncapped exact-blocking form, and cluster-level agreement of the
    # capped ER capstone (both tiers are oracle-gated individually;
    # this measures what the CAP costs, the analogue of minhash-vs-
    # ngram above)
    fuzzy_exact = {
        (r.doc_a, r.doc_b)
        for r in REGISTRY["q_x24_fuzzy"].spark(spark, args.sf_dir).collect()
    }
    fuzzy_capped = {
        (r.doc_a, r.doc_b)
        for r in REGISTRY["q_x24b_fuzzy_capped"]
        .spark(spark, args.sf_dir)
        .collect()
    }
    er_exact = {
        r.doc_id: r.cluster
        for r in REGISTRY["q_x31_erclusters"]
        .spark(spark, args.sf_dir)
        .collect()
    }
    er_capped = {
        r.doc_id: r.cluster
        for r in REGISTRY["q_x31b_erclusters_capped"]
        .spark(spark, args.sf_dir)
        .collect()
    }
    # pairwise cluster agreement over docs clustered by BOTH forms:
    # fraction of same-cluster-in-exact doc pairs that are also
    # same-cluster in the capped form (the split risk the star tier
    # introduces; merges are impossible — capped pairs are a subset)
    common_docs = sorted(set(er_exact) & set(er_capped))
    same_exact = [
        (a, b)
        for i, a in enumerate(common_docs)
        for b in common_docs[i + 1 :]
        if er_exact[a] == er_exact[b]
    ]
    er_agreement = (
        round(
            sum(1 for a, b in same_exact if er_capped[a] == er_capped[b])
            / len(same_exact),
            3,
        )
        if same_exact
        else None
    )

    payload = {
        "sf_dir": args.sf_dir,
        "exact_ngram_pairs": len(exact_pairs),
        "fuzzy_capped": {
            "pairs": len(fuzzy_capped),
            "uncapped_pairs": len(fuzzy_exact),
            "false_positives": len(fuzzy_capped - fuzzy_exact),
            "pair_recall_vs_uncapped": round(
                len(fuzzy_capped & fuzzy_exact) / len(fuzzy_exact), 3
            )
            if fuzzy_exact
            else None,
            "er_cluster_pair_agreement": er_agreement,
            "er_docs_clustered": {
                "uncapped": len(er_exact),
                "capped": len(er_capped),
            },
        },
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
