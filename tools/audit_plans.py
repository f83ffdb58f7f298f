"""Physical-plan audit: assert every registered query compiles to the
plan SHAPE the 100 TB design calls for — without executing it.

Checked invariants (violations are the output):

1. No ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` anywhere — any
   all-pairs comparison must be bucketed/banded into equi-joins.
2. No ``BatchEvalPython`` (row-at-a-time Python) anywhere, ever. Python
   on the data path must be Arrow-batched (``ArrowEvalPython``,
   ``FlatMapGroupsInPandas``, ``MapInPandas``) and ONLY in the queries
   declared to use it.
3. Parquet scans must prune columns: a scan's ReadSchema must not carry
   a column count equal to the table width unless the query genuinely
   selects every column (q_s1-style full scans are declared).
4. Small-dimension joins must broadcast (q_j2: nation is 25 rows — a
   shuffle join there is a plan bug).
5. Filter queries must push predicates into the scan (PushedFilters
   non-empty for q_p4).

Usage: python tools/audit_plans.py [sf_dir]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Queries that legitimately run Arrow-batched Python on the data path.
ARROW_PYTHON_OK = {
    "q_mm_features",
    "q_mm_audio_rms",
    "q_mm_segments",  # composes q_mm_audio_rms's mapInPandas framing
    "q_sim_ivf",
    "q_sim_lsh",  # Arrow-batched all-tables projection (lsh_signatures)
    "q_sim_pq",  # Arrow-batched encode pass (codes assignment)
    "q_sim_ivfpq",  # IVF assign + PQ encode passes (both Arrow-batched)
    "q_x21_kmeans",  # Arrow-batched nearest-centroid assignment pass
    "q_x22_semdedup",  # same assignment pass feeding the pair join
    "q_sim_neardup",
    "q_udaf_wavg",
    "q_udf_qnorm",
}

# Queries whose plan contains a BroadcastNestedLoopJoin BY DESIGN: they
# cross-join a TINY broadcast (the query vector / query batch / one-row
# corpus count) against the scan — that is the broadcast pattern for
# similarity search and global-constant attachment, not an all-pairs
# blow-up (cost = one pass over the big side x broadcast size).
ONE_ROW_BROADCAST_OK = {
    "q_x2",
    "q_sim_lsh",
    "q_sim_ivf",
    "q_sim_pq",
    "q_sim_ivfpq",  # query vector re-rank crossJoin, one broadcast row
    "q_x45_curate",  # q_x42's one-row budget-total crossJoin, composed
    "q_x45b_curate_capped",  # same one-row budget crossJoin, capped tier
    "q_x6_batchann",
    "q_x10_idf",
    # per-round plan only: the dangling-mass aggregate (ONE row) is
    # crossJoin-broadcast onto the rank table each power iteration
    "q_g5_pagerank",
    # the global-average scalar subquery: a ONE-ROW aggregate broadcast
    # onto the customer scan
    "q_sq4_scalar",
    # corpus-total (ONE row) broadcast onto the token-frequency join
    "q_x20_tokfreq",
    # the positive-balance average (ONE row) broadcast gate before the
    # dormant-customer anti-join
    "q_j15_q22",
    # the (nu, nb) corpus totals (ONE row) broadcast onto the
    # thresholded bigram table
    "q_x28_pmi",
    # the vocab-size scalar (ONE row) broadcast onto the scored bigrams
    "q_x32_lmscore",
    # the (n_docs, avgdl) corpus stats (ONE row) broadcast onto the
    # query-term tf table
    "q_x33_bm25",
    # the corpus doc count (ONE row) broadcast onto the tf-idf weights
    "q_x34_tfidfpairs",
    # the total-inventory-value threshold (ONE row) broadcast onto the
    # per-part rollup (Q11's HAVING-vs-global-scalar gate)
    "q_h11_partvalue",
    # the anchor batch (HARDNEG_ANCHORS rows) broadcast onto the
    # embedding scan — same shape as q_x6_batchann
    "q_x39_hardneg",
    # the corpus-total and min-share scalars (ONE row each) broadcast
    # onto the per-language summary when deriving temperature keep rates
    "q_x40_tempmix",
    # the max-count scalar (ONE row) broadcast onto the per-language
    # summary when deriving epoch factors
    "q_x41_epochmix",
    # the char-budget scalar (ONE row) broadcast onto the ~1000-row
    # quality-histogram summary
    "q_x42_tokenbudget",
}

# Queries that read every column of their base table by design.
# q_sq6_q2min projects/joins/filters on all 4 supplier columns.
FULL_SCAN_OK = {"q_s1", "q_sq6_q2min"}

TABLE_WIDTHS = {
    "lineitem": 11,
    "orders": 6,
    "events": 6,
    "documents": 5,
    "customer": 5,
    "supplier": 4,
    "part": 6,
    "nation": 3,
    "region": 2,
    "embeddings": 3,
}


def audit(name: str, plan: str) -> list[str]:
    problems: list[str] = []
    if "CartesianProduct" in plan:
        problems.append("cartesian join in plan")
    if "BroadcastNestedLoopJoin" in plan and name not in ONE_ROW_BROADCAST_OK:
        problems.append("nested-loop join in plan")
    # BatchEvalPythonUDTF is the declared UDTF demo (q_udtf_*), which is
    # row-at-a-time by the UDTF contract; scalar BatchEvalPython is
    # never acceptable anywhere.
    scrubbed = plan.replace("BatchEvalPythonUDTF", "") if name.startswith("q_udtf_") else plan
    if "BatchEvalPython" in scrubbed:
        problems.append("row-at-a-time Python (BatchEvalPython)")
    arrow_ops = ("ArrowEvalPython", "FlatMapGroupsInPandas", "MapInPandas")
    if any(op in plan for op in arrow_ops) and name not in ARROW_PYTHON_OK:
        problems.append("undeclared Python on the data path")
    # column pruning: every parquet scan's ReadSchema vs the table width
    if name not in FULL_SCAN_OK:
        for m in re.finditer(r"Location:.*?/(\w+)\.parquet.*?ReadSchema: struct<([^>]*)>", plan, re.S):
            table, schema = m.group(1), m.group(2)
            if "..." in schema:
                # Spark truncates metadata strings past
                # spark.sql.maxMetadataStringLength (default 100): the
                # struct loses its closing '>' and this match spans into
                # the NEXT scan's schema, inflating the count. Callers
                # should raise the conf (main() does); a still-truncated
                # schema carries no usable pruning signal — skip it
                # rather than emit a phantom violation.
                continue
            width = TABLE_WIDTHS.get(table)
            ncols = len([c for c in schema.split(",") if ":" in c]) if schema else 0
            # width<=3 tables (nation, region, embeddings) are often fully
            # used legitimately — no pruning signal there
            if width and ncols >= width and width > 3:
                problems.append(f"no column pruning on {table} ({ncols}/{width} cols)")
    if name == "q_j2" and "BroadcastHashJoin" not in plan:
        problems.append("nation dim not broadcast")
    if name == "q_p4" and not re.search(r"PushedFilters: \[[^\]]", plan):
        problems.append("predicates not pushed to parquet scan")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from neo4j_blue_green_arrow_etl_spark.operators import REGISTRY
    from neo4j_blue_green_arrow_etl_spark.operators.graph import (
        iterative_round_probes,
    )
    from neo4j_blue_green_arrow_etl_spark.session import get_spark

    spark = get_spark("audit_plans")
    # full ReadSchema strings, so the pruning check sees every column
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    probes = iterative_round_probes()
    failures = 0
    for name in sorted(REGISTRY):
        if REGISTRY[name].alias_of:
            continue  # driver-window alias: identical plan already audited
        try:
            df = REGISTRY[name].spark(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            full = df._jdf.queryExecution().toString()
        except Exception as e:
            print(f"ERR  {name}: {e}")
            failures += 1
            continue
        problems = audit(name, full if "ReadSchema" in full else plan)
        # iterative queries checkpoint per round: ALSO audit the
        # per-round plan — the one that actually runs N times
        if name in probes:
            try:
                rdf = probes[name][0](spark, sf_dir)
                rplan = rdf._jdf.queryExecution().toString()
                problems += [f"round-plan: {p}" for p in audit(name, rplan)]
            except Exception as e:  # noqa: BLE001
                problems.append(f"round-plan probe error: {e}")
        if problems:
            failures += 1
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"ok   {name}")
    print(f"\n{failures} plan violations")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
