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
# Round-9 rotation (VERDICT r8 task 4): slots 01-02 gate what is NEW
# this round — the delete leg of the index lifecycle (q_x44e) and the
# capped curation capstone (q_x45b). Slots 03-09 hand the window to
# families that have NEVER had a driver-side row in any window: TPC-H
# shapes (q_h9 profit, q_h21 waiting), graph node-similarity, OHLC
# time-series, temperature-mixture resampling, token-budget selection,
# and BM25 ranking. Slot 07 keeps q_st6 one more round: its state read
# gained the tombstone mask path and its shingle builder changed
# (slice-based partial-gram drop). Rotated out
# after green r8 rows: x44b/c/d (their probes re-gate indirectly via
# q_x44e, which exercises the same probe_match_pairs path masked),
# BFS/SSSP/patches/segments/islands (green r8), q_x45 (its exact-tier
# composition is unchanged; the capped twin now carries the capstone
# gate).
# History: r5 ts1/ev1/dq1/prof1; r6 sim_pq/sim_ivfpq; r7 x44b/c, st6;
# r8 x44d, st6, x44b/c, x45, g6_bfs, g10_sssp, mm_patches,
# mm_segments, w9_islands — all green in their windows.
_DRIVER_ROTATION = {
    "q_cap01_x44e_deleted": "q_x44e_incrdedup_deleted",  # NEW r9: delete leg
    "q_cap02_x45b_capped": "q_x45b_curate_capped",  # NEW r9: capped capstone
    "q_cap03_h9_profit": "q_h9_profit",  # TPC-H shape, never driver-checked
    "q_cap04_h21_waiting": "q_h21_waiting",  # TPC-H shape, never driver-checked
    "q_cap05_g9_nodesim": "q_g9_nodesim",  # graph similarity, never checked
    "q_cap06_ts5_ohlc": "q_ts5_ohlc",  # time-series OHLC, never checked
    "q_cap07_st6_neardup": "q_st6_neardup",  # r9: masked state read, new shingler
    "q_cap08_x40_tempmix": "q_x40_tempmix",  # mixture resampling, never checked
    "q_cap09_x42_tokenbudget": "q_x42_tokenbudget",  # budget selection, never checked
    "q_cap10_x33_bm25": "q_x33_bm25",  # BM25 ranking, never checked
    # NEW mid-r9: streaming in-stream retractions — the streaming leg
    # of the index delete lifecycle on BOTH at-rest indexes. Displace
    # q_f7_map and q_f6_datearith from the 50-name window — both green
    # in the r8 window, nothing changed since.
    "q_cap11_st8_retract": "q_st8_retract",
    "q_cap12_st9_annretract": "q_st9_annretract",
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
