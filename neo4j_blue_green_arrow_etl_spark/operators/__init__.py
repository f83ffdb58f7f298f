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
# Round-10 rotation (VERDICT r9 task 3): after nine rounds, ~80 of the
# 196 real queries had never had a driver-side oracle row (the driver
# samples the first 50 names alphabetically, so q_a*/q_f* families
# owned the window every round). This round hands the ENTIRE window to
# never-gated queries: 50 aliases named q_0cap* (sorting before q_a1,
# so they ARE the window) covering the whole ungated TPC-H family, all
# six subquery shapes, the window-function family, udf/udaf/udtf, the
# ungated joins and time-series ops, sets, audio, text-repetition,
# streaming ANN ingest, and ten x-series curation ops — several of
# which (x44_incrdedup, x5_dupclusters, x24_fuzzy, x31b, x22, x21, x2,
# x6) also re-gate code this round changed (probe_match_pairs router,
# ngram_pairs refactor, capped tier, ivf centroids). Everything
# displaced from the old window (q_a*/q_cap01-12 targets) stayed green
# in r9 and remains gated by the full local sweeps.
# History: r5 ts1/ev1/dq1/prof1; r6 sim_pq/sim_ivfpq; r7 x44b/c, st6;
# r8 x44d, st6, x44b/c, x45, g6_bfs, g10_sssp, mm_patches,
# mm_segments, w9_islands; r9 x44e, x45b, st8, st9, st6, h9, h21,
# g9, ts5, x40, x42, x33 — all green in their windows.
_DRIVER_ROTATION = {
    "q_0cap01_h6_forecast": "q_h6_forecast",
    "q_0cap02_h7_volume": "q_h7_volume",
    "q_0cap03_h8_share": "q_h8_share",
    "q_0cap04_h10_returns": "q_h10_returns",
    "q_0cap05_h11_partvalue": "q_h11_partvalue",
    "q_0cap06_h12_latebucket": "q_h12_latebucket",
    "q_0cap07_h13_custdist": "q_h13_custdist",
    "q_0cap08_h15_topsupp": "q_h15_topsupp",
    "q_0cap09_h16_suppcnt": "q_h16_suppcnt",
    "q_0cap10_h18_bigorders": "q_h18_bigorders",
    "q_0cap11_sq1_exists": "q_sq1_exists",
    "q_0cap12_sq2_in": "q_sq2_in",
    "q_0cap13_sq3_corr17": "q_sq3_corr17",
    "q_0cap14_sq4_scalar": "q_sq4_scalar",
    "q_0cap15_sq5_notexists": "q_sq5_notexists",
    "q_0cap16_sq6_q2min": "q_sq6_q2min",
    "q_0cap17_w2": "q_w2",
    "q_0cap18_w3": "q_w3",
    "q_0cap19_w4_scd2": "q_w4_scd2",
    "q_0cap20_w5_range": "q_w5_range",
    "q_0cap21_w6_rank": "q_w6_rank",
    "q_0cap22_w7_firstlast": "q_w7_firstlast",
    "q_0cap23_w8_share": "q_w8_share",
    "q_0cap24_w10_rollmedian": "q_w10_rollmedian",
    "q_0cap25_udf_qnorm": "q_udf_qnorm",
    "q_0cap26_udf_zscore": "q_udf_zscore",
    "q_0cap27_udaf_wavg": "q_udaf_wavg",
    "q_0cap28_udtf_tokens": "q_udtf_tokens",
    "q_0cap29_j13_q19": "q_j13_q19",
    "q_0cap30_j14_nullsafe": "q_j14_nullsafe",
    "q_0cap31_j15_q22": "q_j15_q22",
    "q_0cap32_j16_bloom": "q_j16_bloom",
    "q_0cap33_ts2_ewma": "q_ts2_ewma",
    "q_0cap34_ts3_interp": "q_ts3_interp",
    "q_0cap35_ts4_rollup": "q_ts4_rollup",
    "q_0cap36_ts6_anomaly": "q_ts6_anomaly",
    "q_0cap37_u2": "q_u2",
    "q_0cap38_u3": "q_u3",
    "q_0cap39_mm_audio_rms": "q_mm_audio_rms",
    "q_0cap40_text_repetition": "q_text_repetition",
    "q_0cap41_st7_annstream": "q_st7_annstream_ingest",
    "q_0cap42_x44_incrdedup": "q_x44_incrdedup",
    "q_0cap43_x31b_ercapped": "q_x31b_erclusters_capped",
    "q_0cap44_x24_fuzzy": "q_x24_fuzzy",
    "q_0cap45_x22_semdedup": "q_x22_semdedup",
    "q_0cap46_x21_kmeans": "q_x21_kmeans",
    "q_0cap47_x2_bruteann": "q_x2",
    "q_0cap48_x6_batchann": "q_x6_batchann",
    "q_0cap49_x5_dupclusters": "q_x5_dupclusters",
    "q_0cap50_x8_decontam": "q_x8_decontam",
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
