"""Dataset-health audits beyond the profile/orphan/drift checks in
operators/analytics.py: a per-stream FRESHNESS readout (how stale is
each event type vs the corpus watermark, and is its recent arrival
rate collapsing?) and an ENUM-DOMAIN conformance audit (are the
categorical columns still inside their documented value sets — the
"someone added a new enum value upstream" alarm that silently breaks
downstream CASE ladders).

Plan discipline: every audit is one hash aggregate per target column
plus a broadcast one-row watermark — the union frame is
|configured columns| rows, data-volume invariant. No windows, no
collects.

Determinism: timestamps compare as exact microsecond integers;
conformance ratios are single double divisions e6-rounded; the
example violation is the alphabetical MIN violating value (an exact
pick, never a sample).

Reference parity note: the reference engine (an Elixir
event-transport client, SURVEY.md §0) has no audit surface; these
derive from the driver's analytics mandate and standard
data-observability practice (freshness/volume/schema/distribution
monitors à la the dbt-style source checks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table, spread_table
from ex_hivent_spark.functions.decimals import dround, sql_dround
from ex_hivent_spark.plans.registry import register

# Freshness window (seconds) and the fixed month span (days) for the
# expected-rate denominator.
_FRESH_WIN_S = 24 * 3600
_MONTH_DAYS = 30.0

# Documented enum domains per (table, column) — the audit's
# configuration. o_orderstatus is deliberately configured to the
# {F, O} finished/open pair (P = pending is treated as an unexpected
# state) and documents.lang to the four European languages (zh is the
# "new value appeared upstream" case), so the audit demonstrably
# exercises BOTH the conforming and violating outcome rows.
_DOMAINS: tuple[tuple[str, str, tuple[str, ...]], ...] = (
    ("events", "event_type", ("click", "error", "purchase", "signup", "view")),
    ("orders", "o_orderpriority",
     ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")),
    ("orders", "o_orderstatus", ("F", "O")),
    ("lineitem", "l_returnflag", ("A", "N", "R")),
    ("customer", "c_mktsegment",
     ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")),
    ("documents", "lang", ("de", "en", "es", "fr")),
)


@register(
    "q_quality_freshness_lag",
    oracle=f"""
    WITH wm AS (SELECT max(ts) AS wmax FROM events),
    g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_events,
             max(ts) AS last_ts,
             CAST(sum(CASE WHEN epoch(ts) > epoch(wmax) - {_FRESH_WIN_S}
                           THEN 1 ELSE 0 END) AS BIGINT) AS last24h_count
      FROM events CROSS JOIN wm GROUP BY event_type
    )
    SELECT event_type, n_events, g.last_ts,
           CAST(floor(epoch(wmax)) - floor(epoch(g.last_ts)) AS BIGINT)
             AS staleness_s,
           last24h_count,
           {sql_dround(
               f"CAST(last24h_count AS DOUBLE)"
               f" / (CAST(n_events AS DOUBLE) / {_MONTH_DAYS})", 6,
           )} AS freshness_ratio
    FROM g CROSS JOIN wm
    """,
)
def q_quality_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness audit per event type against the corpus watermark
    (the global max ts): seconds of staleness since the type's last
    arrival, the count inside the watermark's trailing 24 h, and that
    count as a ratio of the type's expected daily volume (n/30 for
    the fixed month) — ratio ≪ 1 flags a collapsing stream even when
    staleness alone still looks healthy.

    Plan: one one-row watermark aggregate broadcast into one per-type
    hash aggregate (the conditional 24 h count folds into the same
    pass) — two scans total, no windows. Determinism: staleness
    compares floor-epoch integer seconds; the ratio is a single
    double division e6-rounded; last_ts is an exact max pick."""
    e = load_table(spark, sf_dir, "events")
    wm = e.agg(F.max("ts").alias("wmax"))
    g = (
        e.crossJoin(F.broadcast(wm))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.max("ts").alias("last_ts"),
            F.sum(
                F.when(
                    F.unix_timestamp("ts")
                    > F.unix_timestamp("wmax") - _FRESH_WIN_S,
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("last24h_count"),
        )
    )
    j = g.crossJoin(F.broadcast(wm))
    return j.select(
        "event_type",
        "n_events",
        "last_ts",
        (
            F.floor(F.unix_timestamp("wmax"))
            - F.floor(F.unix_timestamp("last_ts"))
        )
        .cast("bigint")
        .alias("staleness_s"),
        "last24h_count",
        dround(
            F.col("last24h_count").cast("double")
            / (F.col("n_events").cast("double") / _MONTH_DAYS),
            6,
        ).alias("freshness_ratio"),
    )


def _sql_domain_audit(table: str, column: str, domain: tuple[str, ...]) -> str:
    vals = ", ".join("'" + v.replace("'", "''") + "'" for v in domain)
    return f"""
      SELECT '{table}' AS table_name, '{column}' AS column_name,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN {column} IN ({vals}) THEN 0 ELSE 1 END)
                  AS BIGINT) AS n_violating,
             {sql_dround(
                 f"1.0 - CAST(sum(CASE WHEN {column} IN ({vals})"
                 f" THEN 0 ELSE 1 END) AS DOUBLE) / count(*)", 6,
             )} AS conformance,
             min(CASE WHEN {column} NOT IN ({vals}) THEN {column} END)
               AS example_violation
      FROM {table}
    """


@register(
    "q_quality_enum_conformance",
    oracle=" UNION ALL ".join(
        _sql_domain_audit(t, c, d) for t, c, d in _DOMAINS
    ),
)
def q_quality_enum_conformance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Enum-domain conformance audit over six configured categorical
    columns: row count, violating-row count, conformance share and
    the alphabetically-first unexpected value per column. The
    configuration intentionally includes two violating cases
    (o_orderstatus audited against {F, O} so the P = pending state is
    flagged; documents.lang against the four European languages so zh
    is flagged) alongside four fully-conforming domains — the audit's
    both-outcome contract is pinned by tests.

    Plan: one hash aggregate per configured column (a map-side
    conditional count over its table scan — column-pruned to the one
    audited column), unioned into a six-row frame. Determinism: pure
    integer counts, one e6-rounded division, and an exact MIN pick
    for the example value (NULL when fully conforming)."""
    outs = []
    for table, column, domain in _DOMAINS:
        t = load_table(spark, sf_dir, table)
        viol = F.when(F.col(column).isin(*domain), 0).otherwise(1)
        outs.append(
            t.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum(viol).cast("bigint").alias("n_violating"),
                F.min(
                    F.when(
                        ~F.col(column).isin(*domain), F.col(column)
                    )
                ).alias("example_violation"),
            ).select(
                F.lit(table).alias("table_name"),
                F.lit(column).alias("column_name"),
                "n_rows",
                "n_violating",
                dround(
                    1.0
                    - F.col("n_violating").cast("double")
                    / F.col("n_rows"),
                    6,
                ).alias("conformance"),
                "example_violation",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


@register(
    "q_quality_order_recon",
    oracle=f"""
    WITH ls AS (
      SELECT l_orderkey,
             CAST(sum(CAST({sql_dround(
                 "l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)",
                 6)} AS DECIMAL(25,6))) AS DOUBLE) AS computed
      FROM lineitem GROUP BY l_orderkey
    ),
    j AS (
      SELECT o.o_orderpriority AS pri, o.o_totalprice AS tot,
             ls.computed
      FROM orders o LEFT JOIN ls ON ls.l_orderkey = o.o_orderkey
    ),
    r AS (
      SELECT pri,
             CASE WHEN computed IS NULL THEN 1 ELSE 0 END AS orphan,
             CASE WHEN computed IS NULL THEN NULL
                  ELSE CAST(floor(abs(tot - computed) / tot * 1e6 + 0.5)
                            AS BIGINT) END AS ri
      FROM j
    )
    SELECT pri AS o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(orphan) AS BIGINT) AS n_no_lines,
           CAST(sum(CASE WHEN ri <= 10000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_within_1pct,
           {sql_dround(
               "CAST(sum(ri) AS DOUBLE) / 1e6 / count(ri)",
               6)} AS mean_rel_diff
    FROM r GROUP BY pri
    """,
)
def q_quality_order_recon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-header reconciliation audit per order priority: recompute
    each order's total from its lines (Σ extendedprice·(1−disc)·(1+tax),
    the TPC-H header invariant) and report how many orders have NO
    lines at all (2764 orphans at sf0.1 — header/detail drift), how
    many reconcile within 1% of o_totalprice, and the mean relative
    discrepancy. On this synthetic data the header total reconciles
    with NOTHING (mean relative diff ≈ 2.1 across priorities, zero
    within 1% — a genuinely broken invariant the audit is built to
    catch); on a real TPC-H load the same query reads ≈ 0 diff.

    Plan: one per-order hash aggregate over lineitem (map-side
    combine), one shuffle-join to the header on the order key, one
    ≤|priorities| aggregate — the scalable header/detail
    reconciliation shape (never a per-order collect). Determinism:
    per-line totals are e6-rounded per-row IEEE products summed
    through the decimal detour; the relative diff is quantized to an
    exact micro-unit BIGINT per order (floor(x·1e6+0.5) — identical
    doubles in, identical integers out), so the 1%-band count and the
    integer-sum mean are exact on both engines; the closing mean is
    e6-rounded.

    r16: spread_table — the per-order aggregate's partial phase (an
    e6-round + decimal cast per line) ran inside the one-task scan;
    hash-spreading on l_orderkey parallelizes it, and the aggregate
    output keeps HashPartitioning(l_orderkey) for the header join."""
    li = spread_table(spark, sf_dir, "lineitem", "l_orderkey")
    o = load_table(spark, sf_dir, "orders")
    ls = li.groupBy("l_orderkey").agg(
        F.sum(
            dround(
                F.col("l_extendedprice")
                * (1.0 - F.col("l_discount"))
                * (1.0 + F.col("l_tax")),
                6,
            ).cast("decimal(25,6)")
        )
        .cast("double")
        .alias("computed")
    )
    j = o.select(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_totalprice").alias("tot"),
        "o_orderkey",
    ).join(ls, F.col("o_orderkey") == F.col("l_orderkey"), "left")
    ri = F.when(
        F.col("computed").isNull(), F.lit(None).cast("bigint")
    ).otherwise(
        F.floor(
            F.abs(F.col("tot") - F.col("computed")) / F.col("tot") * 1e6
            + 0.5
        ).cast("bigint")
    )
    r = j.select(
        "pri",
        F.when(F.col("computed").isNull(), 1).otherwise(0).alias("orphan"),
        ri.alias("ri"),
    )
    return r.groupBy("pri").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("orphan").cast("bigint").alias("n_no_lines"),
        F.sum(F.when(F.col("ri") <= 10000, 1).otherwise(0))
        .cast("bigint")
        .alias("n_within_1pct"),
        dround(
            F.sum("ri").cast("double") / 1e6 / F.count("ri"), 6
        ).alias("mean_rel_diff"),
    ).withColumnRenamed("pri", "o_orderpriority")


@register(
    "q_quality_ship_lag_audit",
    oracle=f"""
    WITH j AS (
      SELECT o.o_orderpriority AS pri,
             CAST(floor(CAST(epoch_us(l.l_shipdate)
                             - epoch_us(o.o_orderdate) AS DOUBLE)
                        / 86400000000.0) AS BIGINT) AS lag_days
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT pri AS o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN lag_days < 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_ship_before_order,
           CAST(min(lag_days) AS BIGINT) AS min_lag_days,
           CAST(max(lag_days) AS BIGINT) AS max_lag_days,
           {sql_dround(
               "CAST(sum(lag_days) AS DOUBLE) / count(*)",
               6)} AS mean_lag_days
    FROM j GROUP BY pri
    """,
)
def q_quality_ship_lag_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-field temporal-integrity audit: the whole-day lag between
    each line's ship date and its order's order date, per order
    priority — lines shipped BEFORE their order exists
    (n_ship_before_order > 0) are the header/detail clock-skew defect
    this audit exists to catch, and the min/mean/max lag profile per
    priority is the SLA readout (urgent priorities should show smaller
    mean lags; on this synthetic data they don't — a finding, not a
    bug). Complements q_quality_order_recon (amount integrity) with
    TIME integrity on the same join.

    Plan: one order-keyed shuffle join (the TPC-H fact-to-header
    shape), one ≤|priorities| hash aggregate. Determinism: the lag is
    an exact integer-microsecond difference floored to whole days
    (cast to DOUBLE first — exact below 2⁵³ ≈ 285 years of micros);
    counts, min and max are exact BIGINTs; the mean casts the integer
    day sum to DOUBLE once, e6-rounded."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.unix_micros("l_shipdate").alias("ship_us")
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("pri"),
        F.unix_micros("o_orderdate").alias("order_us"),
    )
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "pri",
        F.floor(
            (F.col("ship_us") - F.col("order_us")).cast("double")
            / 86400000000.0
        )
        .cast("bigint")
        .alias("lag_days"),
    )
    lag = F.col("lag_days")
    return j.groupBy("pri").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(F.when(lag < 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_ship_before_order"),
        F.min(lag).cast("bigint").alias("min_lag_days"),
        F.max(lag).cast("bigint").alias("max_lag_days"),
        dround(F.sum(lag).cast("double") / F.count(F.lit(1)), 6).alias(
            "mean_lag_days"
        ),
    ).withColumnRenamed("pri", "o_orderpriority")


@register(
    "q_quality_id_ts_monotonicity",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id,
             lag(event_id) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_id
      FROM events
    ),
    g AS (
      SELECT user_id,
             CAST(count(prev_id) AS BIGINT) AS n_steps,
             CAST(sum(CASE WHEN event_id < prev_id THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_inv
      FROM seq GROUP BY user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(n_steps) AS BIGINT) AS n_steps,
           CAST(sum(n_inv) AS BIGINT) AS n_inversions,
           CAST(sum(CASE WHEN n_inv > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_users_affected,
           floor(CASE WHEN sum(n_steps) = 0 THEN 0.0
                 ELSE CAST(sum(n_inv) AS DOUBLE) / sum(n_steps)
                 END * 1000000.0 + 0.5) / 1000000.0 AS inversion_rate
    FROM g
    """,
)
def q_quality_id_ts_monotonicity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sequence-integrity audit: within each user's (ts, event_id)
    time order, how often does the event_id DECREASE step-over-step —
    adjacent inversions between the id order and the time order (the
    documented adjacent-pair convention: O(n) and localized, not the
    all-pairs Kendall distance). A nonzero rate means ids are not
    assigned in event-time order — the assumption every "order by id
    as a cheap time proxy" consumer silently makes; this audit is what
    lets them make it safely.

    Plan: one lag pass partitioned BY USER (user-grain bounded), one
    per-user aggregate, one scalar fold. Determinism: integer id
    comparisons and counts end-to-end; the single closing rate is one
    IEEE division e6-rounded with an explicit zero-step branch."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_id",
        F.lag("event_id").over(w).alias("prev_id"),
    )
    g = seq.groupBy("user_id").agg(
        F.count("prev_id").cast("bigint").alias("n_steps"),
        F.sum(
            F.when(F.col("event_id") < F.col("prev_id"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_inv"),
    )
    steps = F.sum("n_steps")
    inv = F.sum("n_inv")
    return g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        steps.cast("bigint").alias("n_steps"),
        inv.cast("bigint").alias("n_inversions"),
        F.sum(F.when(F.col("n_inv") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_users_affected"),
        dround(
            F.when(steps == 0, F.lit(0.0)).otherwise(
                inv.cast("double") / steps
            ),
            6,
        ).alias("inversion_rate"),
    )


@register(
    "q_quality_dim_coverage",
    oracle=f"""
    SELECT 'part' AS entity,
           (SELECT CAST(count(*) AS BIGINT) FROM part) AS n_total,
           (SELECT CAST(count(*) AS BIGINT) FROM part p
            WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                              WHERE l.l_partkey = p.p_partkey))
             AS n_unreferenced,
           {sql_dround(
               "CAST((SELECT count(*) FROM part p"
               " WHERE NOT EXISTS (SELECT 1 FROM lineitem l"
               " WHERE l.l_partkey = p.p_partkey)) AS DOUBLE)"
               " / (SELECT count(*) FROM part)", 6)} AS unref_rate
    UNION ALL
    SELECT 'supplier',
           (SELECT CAST(count(*) AS BIGINT) FROM supplier),
           (SELECT CAST(count(*) AS BIGINT) FROM supplier s
            WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                              WHERE l.l_suppkey = s.s_suppkey)),
           {sql_dround(
               "CAST((SELECT count(*) FROM supplier s"
               " WHERE NOT EXISTS (SELECT 1 FROM lineitem l"
               " WHERE l.l_suppkey = s.s_suppkey)) AS DOUBLE)"
               " / (SELECT count(*) FROM supplier)", 6)}
    UNION ALL
    SELECT 'customer',
           (SELECT CAST(count(*) AS BIGINT) FROM customer),
           (SELECT CAST(count(*) AS BIGINT) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey)),
           {sql_dround(
               "CAST((SELECT count(*) FROM customer c"
               " WHERE NOT EXISTS (SELECT 1 FROM orders o"
               " WHERE o.o_custkey = c.c_custkey)) AS DOUBLE)"
               " / (SELECT count(*) FROM customer)", 6)}
    """,
)
def q_quality_dim_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-coverage audit — the REVERSE of q_quality_fk_orphans:
    not "do facts point at missing dims?" but "which dim rows does no
    fact ever reference?" — parts never ordered, suppliers never
    shipping, customers who never placed an order, each with its
    unreferenced rate. Dead dimension mass inflates broadcast tables
    and skews coverage denominators; a sudden rate jump usually means
    an ingest stopped joining.

    Plan: three LEFT-ANTI joins (each dim against the distinct
    foreign-key projection of its fact — the fact side prunes to ONE
    column before the join), each collapsing to a single counting row,
    unioned. At scale each anti join shuffles only (dim keys ∪
    distinct fact keys). Determinism: pure integer counts; the three
    closing rates are single IEEE divisions e6-rounded."""
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")

    def audit(dim, key, fact, fkey, label):
        tot = dim.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
        unref = dim.join(
            fact.select(F.col(fkey).alias(key)), key, "left_anti"
        ).agg(F.count(F.lit(1)).cast("bigint").alias("n_unreferenced"))
        return unref.crossJoin(F.broadcast(tot)).select(
            F.lit(label).alias("entity"),
            "n_total",
            "n_unreferenced",
            dround(
                F.col("n_unreferenced").cast("double") / F.col("n_total"),
                6,
            ).alias("unref_rate"),
        )

    return (
        audit(part, "p_partkey", li.select("l_partkey"), "l_partkey", "part")
        .unionAll(
            audit(
                sup,
                "s_suppkey",
                li.select("l_suppkey"),
                "l_suppkey",
                "supplier",
            )
        )
        .unionAll(audit(cust, "c_custkey", o, "o_custkey", "customer"))
    )


# The fixed 720-hour month spine (drift.py's constants).
_OUTAGE_EPOCH_H = 473352
_OUTAGE_N_HOURS = 720


@register(
    "q_quality_outage_runs",
    oracle=f"""
    WITH types AS (SELECT DISTINCT event_type FROM events),
    spine AS (
      SELECT t.event_type, s.h
      FROM types t CROSS JOIN
           (SELECT CAST(unnest(range({_OUTAGE_EPOCH_H},
                                     {_OUTAGE_EPOCH_H + _OUTAGE_N_HOURS}))
                   AS BIGINT) AS h) s
    ),
    hourly AS (
      SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT s.event_type, s.h, coalesce(o.y, 0) AS y
      FROM spine s LEFT JOIN hourly o
        ON o.event_type = s.event_type AND o.h = s.h
    ),
    empty AS (
      SELECT event_type, h,
             h - row_number() OVER (PARTITION BY event_type ORDER BY h)
               AS grp
      FROM grid WHERE y = 0
    ),
    runs AS (
      SELECT event_type, grp,
             CAST(count(*) AS BIGINT) AS run_len,
             min(h) - {_OUTAGE_EPOCH_H} AS start_hour
      FROM empty GROUP BY event_type, grp
    )
    SELECT t.event_type,
           CAST(coalesce(count(r.grp), 0) AS BIGINT) AS n_outages,
           CAST(coalesce(max(r.run_len), 0) AS BIGINT) AS max_outage_hours,
           CAST(coalesce(sum(r.run_len), 0) AS BIGINT) AS total_empty_hours,
           CAST(min(CASE WHEN r.run_len = 1 THEN NULL
                         ELSE r.start_hour END) AS BIGINT)
             AS first_multi_hour_outage
    FROM types t LEFT JOIN runs r ON r.event_type = t.event_type
    GROUP BY t.event_type
    """,
)
def q_quality_outage_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empty-hour outage census per event type over the fixed 720-hour
    month: gaps-and-islands over the densified spine — how many
    zero-event runs, the longest, total silent hours, and where the
    first multi-hour outage starts. THE freshness-page companion to
    q_quality_freshness_lag's point-in-time staleness: lag says "how
    old is the newest event", this says "how often and how long did
    the stream actually go dark".

    Plan: one per-(type, hour) hash aggregate, densified against the
    |types|×720 literal grid (a broadcast-sized frame at any event
    volume), then the classic h − row_number() island key — the
    per-type window runs over ≤720 spine rows (the module's
    documented grain bound), and runs collapse in one aggregate.
    All-integer, no rounding anywhere; types with zero outages keep a
    row via the left join (the audit must SAY "clean"), and the
    first-multi-hour pick takes the documented NULL when no run
    exceeds one hour."""
    e = load_table(spark, sf_dir, "events")
    types = e.select("event_type").distinct()
    spine = spark.range(_OUTAGE_N_HOURS).select(
        (F.col("id") + F.lit(_OUTAGE_EPOCH_H)).cast("bigint").alias("h")
    )
    grid = (
        types.crossJoin(spine)
        .join(
            e.groupBy(
                "event_type",
                F.floor(F.unix_timestamp("ts") / 3600)
                .cast("bigint")
                .alias("h"),
            ).agg(F.count(F.lit(1)).cast("bigint").alias("y")),
            ["event_type", "h"],
            "left",
        )
        .select(
            "event_type", "h", F.coalesce("y", F.lit(0)).alias("y")
        )
    )
    w = Window.partitionBy("event_type").orderBy("h")
    empty = grid.filter(F.col("y") == 0).select(
        "event_type",
        "h",
        (F.col("h") - F.row_number().over(w)).alias("grp"),
    )
    runs = empty.groupBy("event_type", "grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("run_len"),
        (F.min("h") - F.lit(_OUTAGE_EPOCH_H)).alias("start_hour"),
    )
    return (
        types.join(runs, "event_type", "left")
        .groupBy("event_type")
        .agg(
            F.coalesce(F.count("grp"), F.lit(0))
            .cast("bigint")
            .alias("n_outages"),
            F.coalesce(F.max("run_len"), F.lit(0))
            .cast("bigint")
            .alias("max_outage_hours"),
            F.coalesce(F.sum("run_len"), F.lit(0))
            .cast("bigint")
            .alias("total_empty_hours"),
            F.min(
                F.when(F.col("run_len") == 1, F.lit(None)).otherwise(
                    F.col("start_hour")
                )
            )
            .cast("bigint")
            .alias("first_multi_hour_outage"),
        )
    )


_GAP_ALERT_US = 3_600_000_000  # 1 hour, in microseconds


@register(
    "q_quality_ts_gaps",
    oracle=f"""
    WITH g AS (
      SELECT event_type,
             lag(epoch_us(ts)) OVER (PARTITION BY event_type
                                     ORDER BY ts, event_id) AS prev_us,
             epoch_us(ts) AS cur_us
      FROM events
    ),
    d AS (
      SELECT event_type, cur_us - prev_us AS gap_us
      FROM g WHERE prev_us IS NOT NULL
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(max(gap_us) AS BIGINT) AS max_gap_us,
           CAST(sum(CASE WHEN gap_us > {_GAP_ALERT_US}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps_over_1h,
           floor(CAST(sum(gap_us) AS DOUBLE) / count(*) / 1000000.0
                 * 1000000.0 + 0.5) / 1000000.0 AS mean_gap_sec
    FROM d GROUP BY event_type
    """,
)
def q_quality_ts_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-freshness audit: per event type, the inter-arrival gap
    profile of the event stream — the largest silent window, how many
    gaps exceeded the 1-hour alert bound, and the mean gap — the
    stream-level liveness view next to q_quality_outage_runs'
    zero-hour runs and q_seq_revisit_gaps' per-user view.

    Plan: one per-type lag window over the (ts, event_id) total order,
    one closing hash aggregate on the ≤|types| grain. Determinism:
    gaps are exact BIGINT microseconds (unix_micros ≙ epoch_us —
    both truncate nothing; the µs grid is the storage grid); only the
    mean converts to seconds, e6-rounded (≈1e3-1e4 magnitude — far
    from the 1e9 rounding trap)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    g = e.select(
        "event_type",
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return g.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.max("gap_us").cast("bigint").alias("max_gap_us"),
        F.sum(
            F.when(F.col("gap_us") > _GAP_ALERT_US, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_gaps_over_1h"),
        dround(
            F.sum("gap_us").cast("double")
            / F.count(F.lit(1))
            / 1000000.0,
            6,
        ).alias("mean_gap_sec"),
    )
