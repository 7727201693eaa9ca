"""windowFunnel-style sequential conversion levels: for every user,
the longest prefix of the signup → click → purchase sequence
completed IN ORDER within a 7-day window of the first signup — the
ClickHouse/Snowplow "windowFunnel" operator, stricter than
q_funnel_signup_purchase's unordered completion counts (each step
must happen strictly after the previous one and inside the window).

Plan discipline: each funnel level is one conditional user-grain hash
aggregate joined user-keyed onto the previous level's frame —
aggregate-sized shuffles only, never raw-event pair joins; the final
histogram is a ≤ 4-row aggregate.

Determinism: timestamps compare as exact microsecond integers; level
assignment is pure integer CASE logic; the share is one e6-rounded
division.

Reference parity note: the reference engine (an Elixir
event-transport client, SURVEY.md §0) has no analytics surface; this
derives from the driver's analytics mandate and the standard
windowFunnel semantics popularized by ClickHouse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table
from ex_hivent_spark.functions.decimals import dround, sql_dround
from ex_hivent_spark.plans.registry import register

# Funnel step sequence and the completion window (microseconds).
_FUNNEL_STEPS = ("signup", "click", "purchase")
_FUNNEL_WIN_US = 7 * 86_400_000_000


@register(
    "q_seq_window_funnel",
    oracle=f"""
    WITH s1 AS (
      SELECT user_id, min(epoch_us(ts)) AS t1
      FROM events WHERE event_type = '{_FUNNEL_STEPS[0]}'
      GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = '{_FUNNEL_STEPS[1]}'
        AND epoch_us(e.ts) > s1.t1
        AND epoch_us(e.ts) <= s1.t1 + {_FUNNEL_WIN_US}
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t3
      FROM events e
      JOIN s1 ON e.user_id = s1.user_id
      JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = '{_FUNNEL_STEPS[2]}'
        AND epoch_us(e.ts) > s2.t2
        AND epoch_us(e.ts) <= s1.t1 + {_FUNNEL_WIN_US}
      GROUP BY e.user_id
    ),
    au AS (SELECT DISTINCT user_id FROM events),
    lv AS (
      SELECT au.user_id,
             CASE WHEN s3.user_id IS NOT NULL THEN 3
                  WHEN s2.user_id IS NOT NULL THEN 2
                  WHEN s1.user_id IS NOT NULL THEN 1
                  ELSE 0 END AS level
      FROM au
      LEFT JOIN s1 ON au.user_id = s1.user_id
      LEFT JOIN s2 ON au.user_id = s2.user_id
      LEFT JOIN s3 ON au.user_id = s3.user_id
    ),
    nt AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM lv)
    SELECT CAST(level AS BIGINT) AS level,
           CAST(count(*) AS BIGINT) AS n_at_level,
           {sql_dround(
               "CAST(count(*) AS DOUBLE) / CAST(n_users AS DOUBLE)", 6,
           )} AS share
    FROM lv CROSS JOIN nt GROUP BY level, n_users
    """,
)
def q_seq_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-funnel level histogram: per user, the deepest strictly
    ordered signup→click→purchase prefix completed within 7 days of
    the FIRST signup (each step strictly after the previous, all
    inside the window), then the user count and share at each level
    0–3.

    Deliberate deviation from ClickHouse windowFunnel: this anchors
    each user's chain at the FIRST signup only (greedy earliest-step
    matching from there), whereas windowFunnel considers EVERY cond-1
    event as a potential chain start and reports the max level over
    all starts — a user whose second signup leads the only complete
    chain is under-leveled here. First-anchor is the common product
    question ("did the user convert within 7 days of signing up?")
    and keeps the plan at three conditional user-grain aggregates; a
    per-signup-anchored variant needs the signup-set × step interval
    join (q_join_interval_attribution's shape) plus a max-level
    reduce. The oracle applies the identical first-anchor rule.

    Plan: three conditional user-grain hash aggregates, each joined
    user-keyed onto the previous level (aggregate-sized sides — never
    raw-event pair joins), three left joins onto the distinct-user
    frame, and a ≤4-row closing histogram. Determinism: exact
    microsecond comparisons (epoch_us both sides), integer CASE
    levels, one e6-rounded share."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    s1 = (
        e.filter(F.col("event_type") == _FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min(us).alias("t1"))
        # r16 wave 9 NOTE: pin variants (4-pin and 2-pin) were both
        # A/B-tested and REVERTED (4-pin 1.45 s; 2-pin wash-to-slower
        # in the calm tiebreak vs 0.76 unpinned): the duplicated
        # filtered-aggregate subtrees overlap within one job, and
        # each checkpoint adds a blocking materialization job.
    )
    s2 = (
        e.filter(F.col("event_type") == _FUNNEL_STEPS[1])
        .join(s1, "user_id")
        .filter((us > F.col("t1")) & (us <= F.col("t1") + _FUNNEL_WIN_US))
        .groupBy("user_id")
        .agg(F.min(us).alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == _FUNNEL_STEPS[2])
        .join(s1, "user_id")
        .join(s2, "user_id")
        .filter((us > F.col("t2")) & (us <= F.col("t1") + _FUNNEL_WIN_US))
        .groupBy("user_id")
        .agg(F.min(us).alias("t3"))
    )
    au = e.select("user_id").distinct()
    lv = (
        au.join(s1.select("user_id", F.lit(1).alias("l1")), "user_id", "left")
        .join(s2.select("user_id", F.lit(1).alias("l2")), "user_id", "left")
        .join(s3.select("user_id", F.lit(1).alias("l3")), "user_id", "left")
        .select(
            F.when(F.col("l3").isNotNull(), 3)
            .when(F.col("l2").isNotNull(), 2)
            .when(F.col("l1").isNotNull(), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("level")
        )
    )
    nt = lv.agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    return (
        lv.crossJoin(F.broadcast(nt))
        .groupBy("level", "n_users")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_at_level"))
        .select(
            "level",
            "n_at_level",
            dround(
                F.col("n_at_level").cast("double")
                / F.col("n_users").cast("double"),
                6,
            ).alias("share"),
        )
    )
