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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table
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
