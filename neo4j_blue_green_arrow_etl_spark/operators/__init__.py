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
# Round-8 rotation (VERDICT r7 task 7): slots 01-04 cover everything
# that materially CHANGED this round — the new pruned/auto-routed probe
# (q_x44d, never driver-gated), the reworked streaming admission
# (fused single-agg probe + concurrent sinks), and the indexed/
# compacted probes whose physical path changed under them (fused
# candidate union; the compaction fold now targets a fresh negative
# generation). Slot 10 keeps the composed capstone one more round for
# the same reason (its dedup tiers sit on the changed probe). Slots
# 05-09 go to families that have NEVER had a driver-side row in any
# window: iterative graph (BFS, SSSP), multimodal (patches, segments),
# and gaps-and-islands. Rotated out after green r7 rows: sim_pq /
# sim_ivfpq (rows-only, checked r7), ts1/ev1/dq1/prof1 (green r7;
# q_dq1/q_ev* also sort into the natural window today).
_DRIVER_ROTATION = {
    "q_cap01_x44d_pruned": "q_x44d_incrdedup_pruned",  # NEW r8: auto/pruned probe
    "q_cap02_st6_neardup": "q_st6_neardup",  # r8: fused probe + parallel sinks
    "q_cap03_x44b_indexed": "q_x44b_incrdedup_indexed",  # r8: fused candidates
    "q_cap04_x44c_compacted": "q_x44c_incrdedup_compacted",  # r8: new fold target
    "q_cap05_g6_bfs": "q_g6_bfs",  # iterative graph, never driver-checked
    "q_cap06_g10_sssp": "q_g10_sssp",  # iterative graph, never driver-checked
    "q_cap07_mm_patches": "q_mm_patches",  # multimodal, never driver-checked
    "q_cap08_mm_segments": "q_mm_segments",  # multimodal, never driver-checked
    "q_cap09_w9_islands": "q_w9_islands",  # gaps-and-islands, never checked
    "q_cap10_x45_curate": "q_x45_curate",  # composed capstone over changed tiers
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
