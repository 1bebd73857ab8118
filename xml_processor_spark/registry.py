"""Query registry — the single source of truth for the t2 contract.

Every operator from SURVEY.md §2 registers here exactly once, with BOTH its
PySpark implementation and (when SQL-expressible) its independent DuckDB
oracle SQL. ``__spark_entry__.py`` exposes the registry to the driver.

Determinism discipline (SURVEY §2 preamble) is enforced by construction in
the helpers of :mod:`xml_processor_spark.functions.deterministic`:
total orders with unique tie-breakers, ``sort_array``-wrapped collects,
rounded floats, second-truncated timestamps, ``min_by/max_by`` over
``first/last``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    """One t2-contract row (SURVEY §2)."""

    name: str
    spark: SparkQuery
    oracle: str | None  # DuckDB SQL; None → driver's weaker rows-only check
    origin: str = "CORE"  # REF | CORE | LLM (SURVEY §0.1 scope tags)
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    origin: str = "CORE",
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a (spark_fn, oracle_sql) pair under ``name``."""

    def _wrap(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query key: {name}")
        REGISTRY[name] = Query(
            name=name, spark=fn, oracle=oracle, origin=origin,
            doc=doc or (fn.__doc__ or ""), tags=tags,
        )
        return fn

    return _wrap


# Driver-facing key order: plain lexicographic. The order is canonical and
# content-independent — registration import order, verification history, and
# round number play no part in it, so the driver (which may sample or cap the
# keys it checks per round) sees a stable, non-curated inventory and chooses
# its own coverage.
def _ordered() -> dict[str, Query]:
    from xml_processor_spark import load_all

    load_all()
    return {k: REGISTRY[k] for k in sorted(REGISTRY)}


def get_queries() -> dict[str, SparkQuery]:
    return {k: q.spark for k, q in _ordered().items()}


def get_oracles() -> dict[str, str]:
    return {k: q.oracle for k, q in _ordered().items() if q.oracle is not None}
