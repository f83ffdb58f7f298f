"""Operator registry: importing this package registers every declared
query (SURVEY.md §2.12 + north-star extensions) into ``REGISTRY``."""

from . import dedup, multimodal, relational, similarity, textops  # noqa: F401
from .relational import REGISTRY, QuerySpec

__all__ = ["REGISTRY", "QuerySpec"]
