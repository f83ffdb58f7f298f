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
# Round-7 rotation (VERDICT r6 task 3): families green under the
# r4/r5/r6 driver windows (iterative graph, IVF/LSH ANN, text quality,
# ER capstone, subquery, UDTF, multimodal, capped fuzzy) rotate OUT;
# in rotate the families that have NEVER had a driver-side row — the
# r6-new operators (incremental dedup, streaming near-dup admission
# fold, composed curation capstone), the capped ER capstone
# (q_x24b hands off to q_x31b), the two never-driver-checked ANN
# variants (PQ and IVF-PQ, rows-only: hash-seeded), and one
# representative each of temporal, events, and data-quality.
_DRIVER_ROTATION = {
    "q_cap01_x44_incrdedup": "q_x44_incrdedup",  # r6 incremental dedup
    "q_cap02_st6_neardup": "q_st6_neardup",  # r6 streaming admission
    "q_cap03_x45_curate": "q_x45_curate",  # r6 composed capstone
    "q_cap04_x31b_erclusters_capped": "q_x31b_erclusters_capped",
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
