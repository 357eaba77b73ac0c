"""Central operator registry.

Each operator from SURVEY.md §2 registers exactly once:

    @register("agg_hash_groupby", oracle="SELECT ...")
    def q_pricing_summary(spark, sf_dir): ...

``oracle`` is the equivalent DuckDB SQL (tables pre-registered as views:
region nation customer supplier part orders lineitem events documents
embeddings). ``oracle=None`` → the driver records a weaker rows-only
check (reserved for genuinely non-SQL-expressible ops).

Determinism contract for every SQL-oracle query (SURVEY.md §2 rules):
- alias every computed column identically on both sides;
- float aggregates go through DECIMAL(18,6) (see helpers.dsum/davg) so
  Spark and DuckDB produce bit-identical doubles regardless of
  accumulation order;
- collected lists are sort_array'd; LIMIT queries are totally ordered.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    key: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(key: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a (spark_fn, oracle_sql) pair to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in REGISTRY:
            raise ValueError(f"duplicate registry key: {key}")
        REGISTRY[key] = QuerySpec(key=key, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco
