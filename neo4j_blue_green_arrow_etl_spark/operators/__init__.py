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
# Round-7 rotation (VERDICT r6 task 3, refreshed late-r7): slots 01/04
# hand off to the r7-NEW index ops — q_x44 and q_x31b both got their
# driver-side row in CORRECTNESS_r06 through these aliases, while the
# indexed/compacted probes (new this round, same oracle as q_x44 but
# entirely different physical path: persisted bucketed table, fold
# swap) have never been driver-gated. q_st6/q_x45 keep their slots:
# both changed materially this round (hashed state keys, hashed exact
# tier). The rest of the window is unchanged from the r7 rotation —
# ANN PQ/IVF-PQ (rows-only) plus one representative each of temporal,
# events, data-quality, and profiling.
_DRIVER_ROTATION = {
    "q_cap01_x44b_indexed": "q_x44b_incrdedup_indexed",  # r7 at-rest probe
    "q_cap02_st6_neardup": "q_st6_neardup",  # streaming admission (r7 state)
    "q_cap03_x45_curate": "q_x45_curate",  # composed capstone (r7 hashed tier)
    "q_cap04_x44c_compacted": "q_x44c_incrdedup_compacted",  # r7 fold
    "q_cap05_sim_pq": "q_sim_pq",  # ANN PQ (rows-only)
    "q_cap06_sim_ivfpq": "q_sim_ivfpq",  # ANN IVF-PQ (rows-only)
    "q_cap07_ts1_gapfill": "q_ts1_gapfill",  # temporal family
    "q_cap08_ev1_funnel": "q_ev1_funnel",  # event-analytics family
    "q_cap09_dq1_expectations": "q_dq1_expectations",  # data quality
    "q_cap10_prof1": "q_prof1",  # profiling family
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
