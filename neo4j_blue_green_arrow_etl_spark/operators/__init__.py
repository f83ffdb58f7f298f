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
_DRIVER_ROTATION = {
    "q_cap01_h21_waiting": "q_h21_waiting",  # TPC-H family (q_h*)
    "q_cap02_j5_smj": "q_j5",  # large-large sort-merge join
    "q_cap03_w1_topk": "q_w1",  # window functions
    "q_cap04_st1_dedup": "q_st1",  # streaming exactly-once dedup
    "q_cap05_ts1_gapfill": "q_ts1_gapfill",  # temporal gap fill
    "q_cap06_sq7_q20": "q_sq7_q20",  # nested subquery family
    "q_cap07_udtf_tokens": "q_udtf_tokens",  # UDTF surface
    "q_cap08_mm_frames": "q_mm_frames",  # multimodal frame sampling
    "q_cap09_x1_dedup": "q_x1",  # exact dedup
    "q_cap10_x42_tokenbudget": "q_x42_tokenbudget",  # curation selection
}
for _alias, _target in _DRIVER_ROTATION.items():
    _spec = REGISTRY[_target]
    REGISTRY[_alias] = QuerySpec(
        spark=_spec.spark,
        oracle=_spec.oracle,
        doc=f"Driver-window rotation alias of {_target}. " + _spec.doc,
        alias_of=_target,
    )

__all__ = ["REGISTRY", "QuerySpec"]
