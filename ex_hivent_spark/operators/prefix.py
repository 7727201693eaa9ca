"""Distributed exact prefix sums / ranks — the partition-offset
technique that replaces single-partition global windows.

A `Window.orderBy(...)` with no partitionBy funnels the ENTIRE input
through one task: fine at test SF, fatal at 100 TB (Spark even warns).
But a global running total over a total order decomposes exactly:

1. range-partition the rows by the order key (each partition owns a
   contiguous key range, ranges ascend with partition id),
2. compute ordinary per-partition running sums with a window
   PARTITIONED by the physical partition id (distributed — each
   partition's window state is only its own rows),
3. compute each partition's total in one hash aggregate — a
   #partitions-row frame, collected to the driver and turned into
   per-partition OFFSETS (sum of all earlier partitions' totals),
4. global running value = offset + local running value.

The collect in step 3 is #shuffle-partitions rows (a few KB at any
scale) — the same "tiny pre-pass feeding literals" pattern the repo
uses for percentile bounds. Everything row-sized stays distributed.

Exactness: the decomposition is algebraic, not approximate — the
result is bit-identical to the single-partition window as long as the
order columns form a TOTAL order (callers must include a tiebreaker;
with duplicate keys the intra-tie order, and hence any row-numbered
output, would be nondeterministic in EITHER formulation).

Pinning: the range exchange samples the key distribution to pick
bounds, and ``spark_partition_id()`` is evaluated per task — so the
partitioned frame is local-checkpointed before fan-out, ensuring the
offset aggregate and the windowed frame see the SAME partitioning.

Two formulations:

- ``running_totals``/``running_max``: generic over ANY orderable key —
  partitions come from a sampled range exchange, which costs one
  localCheckpoint materialization to pin the sampled bounds across
  the two consumers.
- ``running_totals_blocked``/``running_max_blocked``: the caller
  supplies a DETERMINISTIC block column that is monotone in the order
  key (a fixed id range, a time bucket, a score-grid cell). No
  sampling → nothing to pin → no checkpoint, and the "partition" is
  the window's own hash exchange on the block key. Prefer these
  whenever the key has a natural fixed grid; the sampled form is the
  fallback for arbitrary keys. Block-count contract: per-block totals
  are collected to the driver only while blocks ≲ 10⁶; past that the
  fold RECURSES through DIV-8192 super-block levels computed
  distributed (see ``_blocked_offsets``), so callers may pick a
  natural grid width without bounding the block count — each extra
  level multiplies the reachable block count by 8192.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PID = "__prefix_pid"


def range_partitioned(
    df: DataFrame,
    order_cols: list[str],
    num_partitions: int | None = None,
) -> tuple[DataFrame, str]:
    """Range-partition ``df`` by the order key and pin the resulting
    partition ids as a column. Partition ids ascend with the key range,
    so id order IS range order. Returns (frame, pid column name); the
    frame is lazily local-checkpointed so every consumer sees the SAME
    sampled bounds and pid assignment."""
    spark = df.sparkSession
    n = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    parts = (
        df.repartitionByRange(n, *[F.col(c) for c in order_cols])
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    return parts, _PID


def running_max(
    df: DataFrame,
    order_cols: list[str],
    src: str,
    dst: str,
    exclusive: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach the exact global running maximum of ``src`` over a total
    order — distributed via the same partition-offset decomposition as
    :func:`running_totals` (max is associative, so the value at a row
    is greatest(max of all earlier partitions, partition-local running
    max)). ``exclusive=True`` excludes the current row (the high-water
    frame ROWS UNBOUNDED PRECEDING AND 1 PRECEDING); the first row
    globally then gets NULL, matching the single-partition window."""
    parts, pid = range_partitioned(df, order_cols, num_partitions)
    hi = Window.currentRow - 1 if exclusive else Window.currentRow
    w = (
        Window.partitionBy(pid)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, hi)
    )
    local = parts.withColumn("__local_max", F.max(src).over(w))
    tot_df = parts.groupBy(pid).agg(F.max(src).alias("__pmax"))
    dtype = dict(tot_df.dtypes)["__pmax"]
    totals = sorted(tot_df.collect(), key=lambda r: r[pid])
    offsets, best = [], None
    for row in totals:  # ≤ #partitions rows
        offsets.append((row[pid], best))
        v = row["__pmax"]
        if v is not None and (best is None or v > best):
            best = v
    off_df = df.sparkSession.createDataFrame(
        offsets, f"{pid} int, __off_max {dtype}"
    )
    out = local.join(F.broadcast(off_df), pid)
    # greatest() skips NULLs (returns null only when ALL inputs are
    # null) — exactly the semantics the stitched running max needs.
    return out.withColumn(
        dst, F.greatest(F.col("__off_max"), F.col("__local_max"))
    ).drop("__local_max", "__off_max", pid)


def running_totals(
    df: DataFrame,
    order_cols: list[str],
    sum_cols: dict[str, str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach exact global inclusive running sums over a total order.

    ``order_cols`` must totally order ``df`` (include a tiebreaker).
    ``sum_cols`` maps input column -> output running-total column; the
    running total for a row includes that row's own value. A global
    row rank is the running total of a literal-1 column.

    Plan shape: one range exchange + one pid-partitioned window + one
    #partitions-row aggregate (collected) — no single-partition stage.
    """
    spark = df.sparkSession
    parts, _ = range_partitioned(df, order_cols, num_partitions)
    w = (
        Window.partitionBy(_PID)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = parts.select(
        "*",
        *[
            F.sum(src).over(w).alias(f"__local_{src}")
            for src in sum_cols
        ],
    )
    tot_df = parts.groupBy(_PID).agg(
        *[F.sum(src).alias(src) for src in sum_cols]
    )
    # integral sums stay exact bigints; anything else rides as double
    # (decimal callers should pre-round — document, don't guess scale)
    integral = {
        src: dict(tot_df.dtypes)[src] in ("bigint", "int", "smallint")
        for src in sum_cols
    }
    totals = tot_df.collect()  # ≤ n rows — the only driver-side step
    offsets: list[tuple] = []
    acc: dict[str, float | int] = {
        src: (0 if integral[src] else 0.0) for src in sum_cols
    }
    for row in sorted(totals, key=lambda r: r[_PID]):
        offsets.append((row[_PID], *[acc[src] for src in sum_cols]))
        for src in sum_cols:
            acc[src] += row[src] or 0
    off_schema = ", ".join(
        [f"{_PID} int"]
        + [
            f"__off_{src} {'bigint' if integral[src] else 'double'}"
            for src in sum_cols
        ]
    )
    off_df = spark.createDataFrame(offsets, off_schema)
    out = local.join(F.broadcast(off_df), _PID)
    for src, dst in sum_cols.items():
        out = out.withColumn(
            dst, F.col(f"__off_{src}") + F.col(f"__local_{src}")
        ).drop(f"__local_{src}", f"__off_{src}")
    return out.drop(_PID)


# Per-level driver-side block budget: below this the prefix fold over
# block totals runs on the driver (≤ a few MB of rows); above it, an
# additional DIV-``_FANOUT`` blocking level is folded DISTRIBUTED and
# the machinery recurses on the super-block totals. Each level divides
# the block count by 8192, so two levels cover ~8×10⁹ blocks and three
# ~7×10¹³ — no driver-side collect ever exceeds the budget.
_MAX_DRIVER_BLOCKS = 1_000_000
_FANOUT = 8192

_INTEGRAL = ("bigint", "int", "smallint", "tinyint")


def _broadcastable(off: DataFrame) -> bool:
    """True when the offsets frame is small enough to broadcast (the
    driver-folded path); the recursive distributed path flags False
    and callers fall back to a plain (block-keyed, AQE-sized) join."""
    return getattr(off, "_ehs_broadcastable", True)


def _blocked_offsets(
    df: DataFrame,
    block_cols: list[str],
    aggs: list,
    fold,
    schema_types: dict[str, str],
    combine: dict[str, tuple[str, str]] | None = None,
    max_driver_blocks: int = _MAX_DRIVER_BLOCKS,
) -> DataFrame:
    """Per-block aggregate -> prefix fold over blocks in block order ->
    (block -> offsets) frame. ``fold`` maps (running_acc, row) ->
    new_acc where acc is a dict keyed like ``schema_types``; each
    block's OFFSET is the acc BEFORE folding that block in.

    When the block count exceeds ``max_driver_blocks`` AND ``combine``
    describes the fold as associative Spark aggregates (offset key ->
    (source agg column, 'sum'|'max')) whose LAST block column is
    integral, the fold itself is decomposed instead of collected: the
    last column groups into DIV-8192 super-blocks (any leading block
    columns ride along as-is, so composite (group, bucket) blockings
    recurse too), the within-super exclusive prefix runs as a bounded
    (≤8192-row-partition) window partitioned by (leading cols, super),
    and the super-block offsets come from a recursive call on the
    (leading cols, super) totals — so the driver only ever folds
    ≤ max_driver_blocks rows per level, honoring the module contract
    at any block count. Exactness: blocks order lexicographically and
    super-blocks preserve that order, so offset(block) =
    super_offset ⊕ within_prefix is the exact global fold — including
    carries ACROSS leading-column boundaries, which flow through the
    super level and land in the recursion's driver-folded base case
    (no zero-sum-per-group assumption needed). Sum over integral
    types and max over anything are associative, so re-association at
    super boundaries is exact; double sums re-associate (same caveat
    as the block decomposition itself — decimal callers pre-round).

    The returned frame carries ``_ehs_broadcastable`` (False on the
    recursive path, where |blocks| rows are too many to broadcast —
    callers must then join block-keyed without the broadcast hint)."""
    spark = df.sparkSession
    tot_df = df.groupBy(*block_cols).agg(*aggs)
    blk_schema = df.select(*block_cols).schema
    distributable = (
        combine is not None
        and blk_schema[-1].dataType.simpleString() in _INTEGRAL
    )
    tot = None
    if distributable:
        # the totals frame feeds both the bounded probe and whichever
        # path wins — pin it so df is aggregated exactly once
        tot_df = tot_df.localCheckpoint(eager=False)
        # r16 OPTIMIZATION: probe via ONE bounded collect instead of a
        # count/min/max aggregate job FOLLOWED by the full collect —
        # limit(max+1) returns every block row when the count fits the
        # driver budget (the overwhelmingly common case: value-grid
        # blockings), so the fold proceeds from the same rows and the
        # whole offsets build costs a single job. Only a genuinely
        # over-budget blocking pays the extra range probe that decides
        # whether another DIV-fanout level can still split it.
        tot = tot_df.limit(max_driver_blocks + 1).collect()
        if len(tot) <= max_driver_blocks:
            can_split = False  # driver fold on the rows we already hold
        else:
            tot = None
            probe = tot_df.agg(
                F.max(block_cols[-1]).alias("__maxb"),
                F.min(block_cols[-1]).alias("__minb"),
            ).collect()[0]
            # Termination: a DIV-fanout level only shrinks the LAST
            # key; once its range fits inside one fanout cell, further
            # levels cannot reduce the count below |leading-col
            # combos| — fold on the driver (the leading columns'
            # cardinality is the caller's own bound, e.g. |event
            # types| or |groups|).
            can_split = (
                probe["__maxb"] is not None
                and (probe["__maxb"] // _FANOUT)
                != ((probe["__minb"] or 0) // _FANOUT)
            )
    else:
        can_split = False  # driver path unconditionally (legacy contract)

    if not can_split:
        if tot is None:
            tot = tot_df.collect()
        tot.sort(key=lambda r: tuple(r[c] for c in block_cols))
        acc = {k: None for k in schema_types}
        rows = []
        for r in tot:
            rows.append(
                tuple(r[c] for c in block_cols) + tuple(acc.values())
            )
            acc = fold(acc, r)
        fields = ", ".join(
            [f.name + " " + f.dataType.simpleString() for f in blk_schema]
            + [f"{k} {t}" for k, t in schema_types.items()]
        )
        out = spark.createDataFrame(rows, fields)
        out._ehs_broadcastable = True
        return out

    # ---- distributed second blocking level (recursive) ----
    prefix_cols = list(block_cols[:-1])
    b = block_cols[-1]
    sb = f"__super_{b}"
    super_df = tot_df.withColumn(
        sb, F.floor(F.col(b) / F.lit(_FANOUT)).cast("bigint")
    )
    w = (
        Window.partitionBy(*prefix_cols, sb)
        .orderBy(b)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    )
    within = super_df
    for key, (src, kind) in combine.items():
        expr = F.sum(src).over(w) if kind == "sum" else F.max(src).over(w)
        within = within.withColumn(f"__within_{key}", expr)
    super_aggs = [
        (F.sum(src) if kind == "sum" else F.max(src)).alias(src)
        for (src, kind) in combine.values()
    ]
    super_off = _blocked_offsets(
        super_df.select(
            *prefix_cols, sb, *[src for (src, _k) in combine.values()]
        ),
        [*prefix_cols, sb],
        super_aggs,
        fold,
        schema_types,
        combine=combine,
        max_driver_blocks=max_driver_blocks,
    )
    joined = (
        within.join(F.broadcast(super_off), [*prefix_cols, sb])
        if _broadcastable(super_off)
        else within.join(super_off, [*prefix_cols, sb])
    )
    out_cols = [F.col(c) for c in prefix_cols] + [F.col(b)]
    for key, (src, kind) in combine.items():
        sup, loc = F.col(key), F.col(f"__within_{key}")
        if kind == "sum":
            # NULL offset means "no earlier block anywhere" — preserved
            # only when BOTH the super offset and the within-super
            # prefix are empty (i.e. the globally first block)
            val = F.when(
                sup.isNull() & loc.isNull(), F.lit(None)
            ).otherwise(F.coalesce(sup, F.lit(0)) + F.coalesce(loc, F.lit(0)))
        else:
            val = F.greatest(sup, loc)  # greatest skips NULLs
        out_cols.append(val.cast(schema_types[key]).alias(key))
    out = joined.select(*out_cols)
    out._ehs_broadcastable = False
    return out


def running_totals_blocked(
    df: DataFrame,
    order_cols: list[str],
    block_cols: list[str],
    sum_cols: dict[str, str],
    max_driver_blocks: int = _MAX_DRIVER_BLOCKS,
) -> DataFrame:
    """Exact global inclusive running sums over a total order, using a
    caller-supplied DETERMINISTIC blocking: ``block_cols`` must be
    monotone in ``order_cols`` (sorting rows by the order key keeps
    blocks contiguous and block-sorted). One window exchange keyed on
    the block + one light per-block aggregate whose ≤|blocks| rows are
    folded into offsets driver-side — no sampled partitioning, no
    checkpoint, fully deterministic."""
    w = (
        Window.partitionBy(*block_cols)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = df.select(
        "*",
        *[F.sum(src).over(w).alias(f"__local_{src}") for src in sum_cols],
    )
    probe = df.groupBy(*block_cols).agg(
        *[F.sum(src).alias(src) for src in sum_cols]
    )
    integral = {
        src: dict(probe.dtypes)[src] in ("bigint", "int", "smallint")
        for src in sum_cols
    }

    def fold(acc, row):
        out = dict(acc)
        for src in sum_cols:
            cur = acc[f"__off_{src}"] or (0 if integral[src] else 0.0)
            out[f"__off_{src}"] = cur + (row[src] or 0)
        return out

    off = _blocked_offsets(
        df,
        block_cols,
        [F.sum(src).alias(src) for src in sum_cols],
        fold,
        {
            f"__off_{src}": ("bigint" if integral[src] else "double")
            for src in sum_cols
        },
        combine={f"__off_{src}": (src, "sum") for src in sum_cols},
        max_driver_blocks=max_driver_blocks,
    )
    out = (
        local.join(F.broadcast(off), block_cols)
        if _broadcastable(off)
        else local.join(off, block_cols)
    )
    for src, dst in sum_cols.items():
        out = out.withColumn(
            dst,
            F.coalesce(
                F.col(f"__off_{src}"),
                F.lit(0 if integral[src] else 0.0),
            )
            + F.col(f"__local_{src}"),
        ).drop(f"__local_{src}", f"__off_{src}")
    return out


def running_max_blocked(
    df: DataFrame,
    order_cols: list[str],
    block_cols: list[str],
    src: str,
    dst: str,
    exclusive: bool = False,
    max_driver_blocks: int = _MAX_DRIVER_BLOCKS,
) -> DataFrame:
    """Exact global running max over a total order with deterministic
    blocking (see running_totals_blocked). ``exclusive=True`` excludes
    the current row (high-water frame); the first row globally gets
    NULL, matching the single-partition window."""
    hi = Window.currentRow - 1 if exclusive else Window.currentRow
    w = (
        Window.partitionBy(*block_cols)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, hi)
    )
    local = df.withColumn("__local_max", F.max(src).over(w))

    def fold(acc, row):
        prev = acc["__off_max"]
        v = row["__bmax"]
        best = prev if (v is None or (prev is not None and prev >= v)) else v
        return {"__off_max": best}

    dtype = dict(df.select(F.col(src)).dtypes)[src]
    off = _blocked_offsets(
        df,
        block_cols,
        [F.max(src).alias("__bmax")],
        fold,
        {"__off_max": dtype},
        combine={"__off_max": ("__bmax", "max")},
        max_driver_blocks=max_driver_blocks,
    )
    out = (
        local.join(F.broadcast(off), block_cols)
        if _broadcastable(off)
        else local.join(off, block_cols)
    )
    return out.withColumn(
        dst, F.greatest(F.col("__off_max"), F.col("__local_max"))
    ).drop("__local_max", "__off_max")
