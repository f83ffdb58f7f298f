"""Operator registry: importing this package registers every declared
query (SURVEY.md §2.12 + north-star extensions) into ``REGISTRY``."""

from . import (  # noqa: F401
    curation,
    dedup,
    dedup_index,
    graph,
    multimodal,
    pandas_surface,
    pipeline,
    relational,
    similarity,
    sketches,
    subqueries,
    temporal,
    textops,
    tpch,
)
from .relational import REGISTRY, QuerySpec

# Driver-window rotation (VERDICT r4 task 7): the driver's correctness
# gate samples the first 50 registry names ALPHABETICALLY, so families
# whose names sort late (TPC-H q_h*, joins q_j*, windows q_w*,
# streaming q_st*, temporal q_ts*, subqueries q_sq*, UDTF q_udtf*,
# multimodal q_mm*, curation/dedup q_x*) never reach it. Each alias
# re-registers one representative of such a family under an
# early-alphabet name — same callable, same oracle, flagged alias_of so
# bench.py times nothing twice and coverage counts exclude them.
# Round-11 rotation (VERDICT r10 task 3): r10 gated 50 never-gated
# queries; 32 real queries remained with no driver oracle row in ANY
# round (computed by resolving every historical CORRECTNESS_r* window
# through its alias map) — the whole ungated x-series text/curation
# family. This window covers ALL 32, bringing every real query to >= 1
# lifetime driver gating, plus 18 re-gates of code r11 changed: the
# at-rest trained-artifact sim family (ivf/ivfpq/pq), the
# ledger-guarded retract streams (st8/st9) and manifest-hardened st6,
# the single-evaluation delete leg (x44e) and its index siblings
# (x44b/c/d), the sharded-boundary token budget (x42), both
# duplicate-mass-routed capstones and their capped twins
# (x45/x45b/x31/x31b), the fuzzy tiers (x24/x24b), and exact dedup
# (x1, anchor of the changed dedup path). Everything displaced stayed
# green in r10 and remains gated by the full local sweeps.
# History: r5 ts1/ev1/dq1/prof1; r6 sim_pq/sim_ivfpq; r7 x44b/c, st6;
# r8 x44d, st6, x44b/c, x45, g6_bfs, g10_sssp, mm_patches,
# mm_segments, w9_islands; r9 x44e, x45b, st8, st9, st6, h9, h21,
# g9, ts5, x40, x42, x33; r10 the whole TPC-H/subquery/window/udf/
# join/ts/sets/mm/text/streaming-ANN block — all green in their
# windows.
_DRIVER_ROTATION = {
    "q_0cap01_x3_lang": "q_x3_lang",
    "q_0cap02_x3_tokens": "q_x3_tokens",
    "q_0cap03_x4_split": "q_x4_split",
    "q_0cap04_x5b_clusters_star": "q_x5b_clusters_star",
    "q_0cap05_x7_corpus": "q_x7_corpus",
    "q_0cap06_x9_mix": "q_x9_mix",
    "q_0cap07_x10_idf": "q_x10_idf",
    "q_0cap08_x11_pack": "q_x11_pack",
    "q_0cap09_x12_quant": "q_x12_quant",
    "q_0cap10_x13_sample": "q_x13_sample",
    "q_0cap11_x14_chunk": "q_x14_chunk",
    "q_0cap12_x15_incragg": "q_x15_incragg",
    "q_0cap13_x16_cdc": "q_x16_cdc",
    "q_0cap14_x17_score": "q_x17_score",
    "q_0cap15_x18_centroid": "q_x18_centroid",
    "q_0cap16_x19_feathash": "q_x19_feathash",
    "q_0cap17_x20_tokfreq": "q_x20_tokfreq",
    "q_0cap18_x23_spandedup": "q_x23_spandedup",
    "q_0cap19_x25_winsorize": "q_x25_winsorize",
    "q_0cap20_x26_overlap": "q_x26_overlap",
    "q_0cap21_x27_qbucket": "q_x27_qbucket",
    "q_0cap22_x28_pmi": "q_x28_pmi",
    "q_0cap23_x29_domcap": "q_x29_domcap",
    "q_0cap24_x30_snapdiff": "q_x30_snapdiff",
    "q_0cap25_x32_lmscore": "q_x32_lmscore",
    "q_0cap26_x34_tfidfpairs": "q_x34_tfidfpairs",
    "q_0cap27_x35_entropy": "q_x35_entropy",
    "q_0cap28_x36_qualitygate": "q_x36_qualitygate",
    "q_0cap29_x37_charprofile": "q_x37_charprofile",
    "q_0cap30_x38_bpemerge": "q_x38_bpemerge",
    "q_0cap31_x39_hardneg": "q_x39_hardneg",
    "q_0cap32_x41_epochmix": "q_x41_epochmix",
    "q_0cap33_sim_ivf": "q_sim_ivf",
    "q_0cap34_sim_ivfpq": "q_sim_ivfpq",
    "q_0cap35_sim_pq": "q_sim_pq",
    "q_0cap36_st6_neardup": "q_st6_neardup",
    "q_0cap37_st8_retract": "q_st8_retract",
    "q_0cap38_st9_annretract": "q_st9_annretract",
    "q_0cap39_x42_tokenbudget": "q_x42_tokenbudget",
    "q_0cap40_x44b_indexed": "q_x44b_incrdedup_indexed",
    "q_0cap41_x44c_compacted": "q_x44c_incrdedup_compacted",
    "q_0cap42_x44d_pruned": "q_x44d_incrdedup_pruned",
    "q_0cap43_x44e_deleted": "q_x44e_incrdedup_deleted",
    "q_0cap44_x45_curate": "q_x45_curate",
    "q_0cap45_x45b_capped": "q_x45b_curate_capped",
    "q_0cap46_x31_erclusters": "q_x31_erclusters",
    "q_0cap47_x31b_ercapped": "q_x31b_erclusters_capped",
    "q_0cap48_x24_fuzzy": "q_x24_fuzzy",
    "q_0cap49_x24b_capped": "q_x24b_fuzzy_capped",
    "q_0cap50_x1_dedup": "q_x1",
}
for _alias, _target in _DRIVER_ROTATION.items():
    _spec = REGISTRY.get(_target)
    if _spec is None:
        # A renamed/removed rotation target must fail as ONE loud,
        # attributable test failure — not a bare KeyError that breaks
        # import of the whole operators package.
        import warnings

        warnings.warn(
            f"driver-rotation target {_target!r} is not in REGISTRY; "
            f"alias {_alias!r} skipped — fix _DRIVER_ROTATION",
            stacklevel=1,
        )
        continue
    REGISTRY[_alias] = QuerySpec(
        spark=_spec.spark,
        oracle=_spec.oracle,
        doc=f"Driver-window rotation alias of {_target}. " + _spec.doc,
        alias_of=_target,
    )

__all__ = ["REGISTRY", "QuerySpec"]
