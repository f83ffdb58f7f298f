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

__all__ = ["REGISTRY", "QuerySpec"]
