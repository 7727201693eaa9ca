"""Query registry: every operator the engine claims lands here as a
(name, spark callable, oracle SQL) triple.

The spark callable has signature ``(spark, sf_dir) -> DataFrame``; the
oracle is equivalent ANSI SQL that DuckDB runs on the same parquet (views
pre-registered by the driver). ``oracle=None`` marks genuinely
non-SQL-expressible ops (approximate / LSH / ANN), for which the driver
records a weaker rows-only check.

Column-name parity rule: every computed column is aliased identically in
the Spark plan and the oracle SQL — the driver sorts columns by name
before hashing values.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: Optional[str]
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str] = None):
    """Decorator registering a query implementation + its oracle SQL."""

    def deco(fn: SparkQuery) -> SparkQuery:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Executors need the package on their PYTHONPATH for any
            # Python-on-worker operator (pandas UDF / mapInPandas);
            # see ex_hivent_spark/shipping.py. Idempotent and cheap.
            from ex_hivent_spark.shipping import ensure_shipped

            ensure_shipped(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        _REGISTRY[name] = QuerySpec(name, wrapped, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    """All registered queries (import side-effect modules first)."""
    from ex_hivent_spark import plans

    plans.load_all()
    return dict(_REGISTRY)
