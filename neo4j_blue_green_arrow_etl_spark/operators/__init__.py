"""Operator registry: importing this package registers every declared
query (SURVEY.md §2.12 + north-star extensions) into ``REGISTRY``."""

from . import (  # noqa: F401
    curation,
    dedup,
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
# Round-6 rotation: families green under the r4/r5 driver windows
# (TPC-H, SMJ, plain windows, streaming dedup, temporal, exact dedup,
# curation selection) rotate OUT; families that have NEVER had a
# driver-side row rotate IN — iterative graph (q_g*), similarity ANN
# (q_sim_*, rows-only: hash-seeded), text quality, the ER capstone,
# and this round's new oracle-gated capped fuzzy twin. Subquery, UDTF
# and multimodal caps are kept for continuity.
_DRIVER_ROTATION = {
    "q_cap01_g5_pagerank": "q_g5_pagerank",  # iterative graph family
    "q_cap02_g8_kcore": "q_g8_kcore",  # iterative peel (k-core)
    "q_cap03_sim_ivf": "q_sim_ivf",  # ANN IVF (rows-only)
    "q_cap04_text_quality": "q_text_quality",  # text quality scoring
    "q_cap05_x31_erclusters": "q_x31_erclusters",  # ER capstone
    "q_cap06_sq7_q20": "q_sq7_q20",  # nested subquery family
    "q_cap07_udtf_tokens": "q_udtf_tokens",  # UDTF surface
    "q_cap08_mm_frames": "q_mm_frames",  # multimodal frame sampling
    "q_cap09_x24b_fuzzy_capped": "q_x24b_fuzzy_capped",  # r6 capped ER
    "q_cap10_sim_lsh": "q_sim_lsh",  # ANN LSH (rows-only)
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
