"""Table diff: keyed reconciliation of two snapshots.

The operational primitive behind migration validation, CDC audits, and
backfill verification: given two versions of a table and a key, report
each row as added / removed / changed / unchanged. One full-outer join
on the key plus a column-wise comparison — no collect, no per-column
driver loops; the comparison struct packs every non-key column so the
equality check is a single struct compare (null-safe).

At 100 TB both sides shuffle once on the key; if either side is a
bucketed table on the key (sinks.write_bucketed_table), its exchange
disappears entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """Classify rows across two snapshots sharing a schema.

    Returns key columns + ``diff_status`` in
    {'added', 'removed', 'changed', 'unchanged'}.
    """
    if sorted(old.columns) != sorted(new.columns):
        raise ValueError(
            f"schemas differ: {sorted(old.columns)} vs {sorted(new.columns)}"
        )
    value_cols = [c for c in old.columns if c not in keys]
    o = old.select(
        *[F.col(k).alias(f"k_{k}") for k in keys],
        F.struct(*[F.col(c) for c in value_cols]).alias("__old"),
    )
    n = new.select(
        *[F.col(k).alias(f"k_{k}") for k in keys],
        F.struct(*[F.col(c) for c in value_cols]).alias("__new"),
    )
    cond = [o[f"k_{k}"].eqNullSafe(n[f"k_{k}"]) for k in keys]
    joined = o.join(n, cond, "full_outer")
    status = (
        F.when(F.col("__old").isNull(), F.lit("added"))
        .when(F.col("__new").isNull(), F.lit("removed"))
        .when(F.col("__old").eqNullSafe(F.col("__new")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        *[
            F.coalesce(o[f"k_{k}"], n[f"k_{k}"]).alias(k)
            for k in keys
        ],
        status.alias("diff_status"),
    )
