"""Conversion-latency distribution: how long after their FIRST signup
do users make their FIRST subsequent purchase — the time-to-convert
readout (count, mean, exact median) behind activation dashboards and
the q_funnel_signup_purchase completion counts.

Plan discipline: the stream collapses to per-user first-signup /
first-qualifying-purchase timestamps in hash aggregates (one
user-keyed shuffle join between them — user-grain, never raw-event
pairs); the exact median runs on the DISTINCT-delay frame via the
blocked prefix fold (operators/prefix.py) — day-width blocks, ≤ ~31
at any scale — never a global sort.

Determinism: timestamps compare and subtract as exact microsecond
integers; the mean rides the decimal detour; the median is the
q_stats_brown_forsythe two-middle-pick half-sum; second conversions
are e6-rounded only at the final unit change.

Reference parity note: the reference engine (an Elixir
event-transport client, SURVEY.md §0) has no analytics surface; this
derives from the driver's analytics mandate and standard
product-analytics practice (activation latency curves).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table
from ex_hivent_spark.functions.decimals import dround, sql_dround
from ex_hivent_spark.operators.prefix import running_totals_blocked
from ex_hivent_spark.plans.registry import register

# Median-ranking grid: delays live inside the fixed month — day-width
# blocks keep the prefix fold at ≤ ~31 blocks at any scale.
_DELAY_BLOCK_US = 86_400_000_000


@register(
    "q_seq_conversion_latency",
    oracle=f"""
    WITH s AS (
      SELECT user_id, min(epoch_us(ts)) AS t0
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id,
             CAST(min(epoch_us(e.ts)) - any_value(s.t0) AS BIGINT) AS d_us
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s.t0
      GROUP BY e.user_id
    ),
    vc AS (
      SELECT d_us, CAST(count(*) AS BIGINT) AS cnt FROM p GROUP BY d_us
    ),
    cum AS (
      SELECT d_us, cnt,
             CAST(sum(cnt) OVER (ORDER BY d_us
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS cum
      FROM vc
    ),
    nt AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM vc),
    med AS (
      SELECT ((SELECT min(d_us) FROM cum c CROSS JOIN nt
               WHERE c.cum >= CAST(floor((nt.n + 1) / 2.0) AS BIGINT))
              + (SELECT min(d_us) FROM cum c CROSS JOIN nt
                 WHERE c.cum >= CAST(floor(nt.n / 2.0) AS BIGINT) + 1)
             ) / 2.0 AS med_us
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_converted,
             CAST(sum(CAST(d_us AS DECIMAL(25,0))) AS DOUBLE) AS sum_us
      FROM p
    )
    SELECT n_converted,
           {sql_dround("sum_us / n_converted / 1000000.0", 6)}
             AS mean_delay_s,
           {sql_dround("med_us / 1000000.0", 6)} AS median_delay_s
    FROM m CROSS JOIN med
    """,
)
def q_seq_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversion latency: for every user, the exact
    microsecond gap between their first signup and their first
    STRICTLY LATER purchase; reported as the converted-user count,
    the mean delay and the exact median delay (lower/upper
    middle-pick half-sum), in seconds.

    Plan: two conditional hash aggregates to user grain, one
    user-keyed join (aggregate-sized sides), then the exact median
    via distinct-delay counts + the blocked prefix fold (day-width
    blocks — ≤ ~31 at any scale) and two filtered min-picks — the
    q_stats_brown_forsythe median machinery, never a global sort.
    Determinism: delays are exact integer microseconds end-to-end
    (epoch_us both sides — no second truncation); the mean's decimal
    sum is scale-0; the only roundings are the two closing
    unit-change divisions at e6."""
    e = load_table(spark, sf_dir, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("t0"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.unix_micros("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(
            (F.min(F.unix_micros("ts")) - F.first("t0"))
            .cast("bigint")
            .alias("d_us")
        )
    )
    p = p.localCheckpoint(eager=False)  # moments + median: one pass
    vc = p.groupBy("d_us").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    blocked = vc.withColumn(
        "blk", F.floor(F.col("d_us") / F.lit(_DELAY_BLOCK_US))
    )
    cum = running_totals_blocked(
        blocked,
        order_cols=["d_us"],
        block_cols=["blk"],
        sum_cols={"cnt": "cum"},
    )
    nt = vc.agg(F.sum("cnt").cast("bigint").alias("n"))
    c = cum.crossJoin(F.broadcast(nt))
    # r16: both middle picks in one conditional aggregate (min ignores
    # when()-nulls) — one pass over the prefix subtree, no lo⋈hi join.
    med = c.agg(
        F.min(
            F.when(
                F.col("cum") >= F.floor((F.col("n") + 1) / 2.0).cast("bigint"),
                F.col("d_us"),
            )
        ).alias("v_lo"),
        F.min(
            F.when(
                F.col("cum") >= F.floor(F.col("n") / 2.0).cast("bigint") + 1,
                F.col("d_us"),
            )
        ).alias("v_hi"),
    ).select(((F.col("v_lo") + F.col("v_hi")) / 2.0).alias("med_us"))
    m = p.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        F.sum(F.col("d_us").cast("decimal(25,0)"))
        .cast("double")
        .alias("sum_us"),
    )
    return m.crossJoin(F.broadcast(med)).select(
        "n_converted",
        dround(
            F.col("sum_us") / F.col("n_converted") / 1000000.0, 6
        ).alias("mean_delay_s"),
        dround(F.col("med_us") / 1000000.0, 6).alias("median_delay_s"),
    )


@register(
    "q_agg_repeat_purchase",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey, min(epoch_us(o_orderdate)) AS t1,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY o_custkey
    ),
    seconds AS (
      SELECT o.o_custkey,
             CAST(min(epoch_us(o.o_orderdate)) - any_value(f.t1)
                  AS BIGINT) AS gap_us
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
      WHERE epoch_us(o.o_orderdate) > f.t1
      GROUP BY o.o_custkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CASE WHEN f.n_orders >= 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_repeaters,
           floor(CAST(sum(CASE WHEN f.n_orders >= 2 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*) * 1000000.0 + 0.5)
             / 1000000.0 AS repeat_rate,
           floor(CAST(sum(CAST(s.gap_us AS DECIMAL(25,0))) AS DOUBLE)
                 / count(s.gap_us) / 86400000000.0 * 1000000.0 + 0.5)
             / 1000000.0 AS mean_days_to_second
    FROM firsts f LEFT JOIN seconds s ON f.o_custkey = s.o_custkey
    """,
)
def q_agg_repeat_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase profile: customer count, customers with a
    second order, the repeat rate, and the mean days from first order
    to the first STRICTLY LATER order (same-day repeat orders —
    identical o_orderdate — do not count as "later": the exact
    strictly-greater microsecond comparison, documented). The
    retention-economics headline next to q_agg_cohort_ltv.

    Plan: one customer-grain aggregate, one customer-keyed join for
    the second-order pick, one closing aggregate — aggregate-sized
    shuffles only. Determinism: exact microsecond comparisons, integer
    counts, a scale-0 decimal gap sum, two e6-rounded closings."""
    o = load_table(spark, sf_dir, "orders")
    us = F.unix_micros("o_orderdate")
    firsts = o.groupBy("o_custkey").agg(
        F.min(us).alias("t1"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    )  # wave-9 pin A/B-tested and REVERTED (0.49 unpinned vs 0.62
    # pinned in the calm tiebreak)
    seconds = (
        o.join(firsts.select("o_custkey", "t1"), "o_custkey")
        .filter(us > F.col("t1"))
        .groupBy("o_custkey")
        .agg((F.min(us) - F.first("t1")).cast("bigint").alias("gap_us"))
    )
    j = firsts.join(seconds, "o_custkey", "left")
    rep = F.sum(F.when(F.col("n_orders") >= 2, 1).otherwise(0)).cast(
        "bigint"
    )
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        rep.alias("n_repeaters"),
        dround(rep.cast("double") / F.count(F.lit(1)), 6).alias(
            "repeat_rate"
        ),
        dround(
            F.sum(F.col("gap_us").cast("decimal(25,0)")).cast("double")
            / F.count("gap_us")
            / 86400000000.0,
            6,
        ).alias("mean_days_to_second"),
    )


@register(
    "q_seq_user_lifespan",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             CAST(max(epoch_us(ts)) - min(epoch_us(ts)) AS BIGINT)
               AS span_us,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id
    ),
    vc AS (
      SELECT span_us, CAST(count(*) AS BIGINT) AS cnt
      FROM u GROUP BY span_us
    ),
    cum AS (
      SELECT span_us, cnt,
             CAST(sum(cnt) OVER (ORDER BY span_us
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS cum
      FROM vc
    ),
    nt AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM vc),
    med AS (
      SELECT ((SELECT min(span_us) FROM cum c CROSS JOIN nt
               WHERE c.cum >= CAST(floor((nt.n + 1) / 2.0) AS BIGINT))
              + (SELECT min(span_us) FROM cum c CROSS JOIN nt
                 WHERE c.cum >= CAST(floor(nt.n / 2.0) AS BIGINT) + 1)
             ) / 2.0 AS med_us
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(CAST(span_us AS DECIMAL(25,0))) AS DOUBLE)
               AS sum_us,
             CAST(sum(CASE WHEN span_us = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_single_moment
      FROM u
    )
    SELECT n_users, n_single_moment,
           {sql_dround("sum_us / n_users / 86400000000.0", 6)}
             AS mean_lifespan_days,
           {sql_dround("med_us / 86400000000.0", 6)}
             AS median_lifespan_days
    FROM m CROSS JOIN med
    """,
)
def q_seq_user_lifespan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observed user lifespan distribution: per user, the exact
    microsecond span between first and last event, summarized as the
    user count, the single-moment-user count (span 0 — one event or
    all at one timestamp), and the mean + exact median lifespan in
    days. The engagement-duration companion to q_agg_dau_wau's
    activity rates — a shrinking median lifespan is churn before DAU
    feels it.

    Plan: one user-grain min/max aggregate; the exact median via
    distinct-span counts + the blocked prefix fold (day-width blocks)
    and two filtered min-picks — the q_seq_conversion_latency
    machinery. Determinism: exact integer microsecond spans, scale-0
    decimal sums, e6-rounded closing unit changes."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    u = e.groupBy("user_id").agg(
        (F.max(us) - F.min(us)).cast("bigint").alias("span_us")
    ).localCheckpoint(eager=False)  # moments + median: one pass
    vc = u.groupBy("span_us").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    blocked = vc.withColumn(
        "blk", F.floor(F.col("span_us") / F.lit(_DELAY_BLOCK_US))
    )
    cum = running_totals_blocked(
        blocked,
        order_cols=["span_us"],
        block_cols=["blk"],
        sum_cols={"cnt": "cum"},
    )
    nt = vc.agg(F.sum("cnt").cast("bigint").alias("n"))
    c = cum.crossJoin(F.broadcast(nt))
    # r16: both middle picks in one conditional aggregate (min ignores
    # when()-nulls) — one pass over the prefix subtree, no lo⋈hi join.
    med = c.agg(
        F.min(
            F.when(
                F.col("cum") >= F.floor((F.col("n") + 1) / 2.0).cast("bigint"),
                F.col("span_us"),
            )
        ).alias("v_lo"),
        F.min(
            F.when(
                F.col("cum") >= F.floor(F.col("n") / 2.0).cast("bigint") + 1,
                F.col("span_us"),
            )
        ).alias("v_hi"),
    ).select(((F.col("v_lo") + F.col("v_hi")) / 2.0).alias("med_us"))
    m = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(F.col("span_us").cast("decimal(25,0)"))
        .cast("double")
        .alias("sum_us"),
        F.sum(F.when(F.col("span_us") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_single_moment"),
    )
    return m.crossJoin(F.broadcast(med)).select(
        "n_users",
        "n_single_moment",
        dround(
            F.col("sum_us") / F.col("n_users") / 86400000000.0, 6
        ).alias("mean_lifespan_days"),
        dround(F.col("med_us") / 86400000000.0, 6).alias(
            "median_lifespan_days"
        ),
    )


@register(
    "q_seq_dwell_matrix",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type, epoch_us(ts) AS us,
             lag(event_type) OVER w AS prev_type,
             lag(epoch_us(ts)) OVER w AS prev_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    g AS (
      SELECT prev_type, event_type AS next_type,
             CAST(count(*) AS BIGINT) AS n_trans,
             CAST(sum(us - prev_us) AS BIGINT) AS sum_us,
             CAST(max(us - prev_us) AS BIGINT) AS max_us
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT prev_type, next_type, n_trans,
           {sql_dround(
               "CAST(sum_us AS DOUBLE) / n_trans / 1e6", 6)}
             AS mean_dwell_sec,
           {sql_dround("CAST(max_us AS DOUBLE) / 1e6", 6)}
             AS max_dwell_sec
    FROM g
    """,
)
def q_seq_dwell_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dwell-time transition matrix: for every consecutive event pair
    within a user's (ts, event_id)-ordered stream, the count, mean and
    max seconds spent between the previous event type and the next —
    the "how long do users sit on a view before clicking?" panel that
    turns q_ts_markov_transitions' WHERE-to probabilities into
    HOW-LONG dynamics (a slow view→purchase cell is a checkout-
    friction flag; a near-zero click→click cell is bot cadence).

    Plan: one lag pass partitioned BY USER (user-grain bounded — the
    sessionize class, scales with the key count), then one hash
    aggregate to the ≤|types|² matrix. Determinism: dwell gaps are
    exact BIGINT microsecond differences summed as BIGINTs (exact at
    any scale — no decimal detour needed for integers); the closing
    mean and max cast the integer to DOUBLE once (correctly rounded
    identically past 2⁵³ on both engines) and e6-round after the
    deterministic /1e6 rescale."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag(F.unix_micros("ts")).over(w).alias("prev_us"),
    ).filter(F.col("prev_type").isNotNull())
    g = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_trans"),
        F.sum(F.col("us") - F.col("prev_us")).cast("bigint").alias("sum_us"),
        F.max(F.col("us") - F.col("prev_us")).cast("bigint").alias("max_us"),
    )
    return g.select(
        "prev_type",
        "next_type",
        "n_trans",
        dround(
            F.col("sum_us").cast("double") / F.col("n_trans") / 1e6, 6
        ).alias("mean_dwell_sec"),
        dround(F.col("max_us").cast("double") / 1e6, 6).alias(
            "max_dwell_sec"
        ),
    )


@register(
    "q_seq_revisit_gaps",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d
      FROM events
    ),
    gaps AS (
      SELECT user_id,
             d - lag(d) OVER (PARTITION BY user_id ORDER BY d) AS gap
      FROM ud
    ),
    hist AS (
      SELECT gap AS gap_days, CAST(count(*) AS BIGINT) AS n_gaps
      FROM gaps WHERE gap IS NOT NULL GROUP BY gap
    ),
    tot AS (SELECT CAST(sum(n_gaps) AS BIGINT) AS t FROM hist)
    SELECT gap_days, n_gaps,
           floor(CAST(n_gaps AS DOUBLE) / t * 1000000.0 + 0.5)
             / 1000000.0 AS share
    FROM hist CROSS JOIN tot
    """,
)
def q_seq_revisit_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-visit gap histogram: for every user, the whole-day gaps
    between consecutive ACTIVE days (distinct (user, day) pairs — five
    events on one day are one visit), rolled up to a gap-length
    distribution with shares. The return-cadence readout between
    q_agg_dau_wau_stickiness (a single ratio) and q_cohort_retention
    (day-zero anchored): a healthy daily habit piles mass on gap 1; a
    weekly product peaks at 7; a fattening tail is churn in progress.

    Plan: one distinct-(user, day) aggregate over the corpus, one lag
    pass partitioned BY USER over the ≤|users|·|days| visit frame
    (user-grain bounded), one ≤|days| histogram aggregate with the
    scalar total broadcast back. Determinism: day ids and gaps are
    exact integer arithmetic; the closing share is one IEEE division
    e6-rounded."""
    e = load_table(spark, sf_dir, "events")
    ud = e.select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / 86400).cast("bigint").alias("d"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    gaps = ud.select(
        (F.col("d") - F.lag("d").over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    hist = gaps.groupBy(F.col("gap").alias("gap_days")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps")
    )
    tot = hist.agg(F.sum("n_gaps").cast("bigint").alias("t"))
    return hist.crossJoin(F.broadcast(tot)).select(
        "gap_days",
        "n_gaps",
        dround(F.col("n_gaps").cast("double") / F.col("t"), 6).alias(
            "share"
        ),
    )


@register(
    "q_seq_ping_pong_rate",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS t2,
             lag(event_type) OVER w AS t1,
             lead(event_type) OVER w AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    tri AS (
      SELECT t1, t2,
             CAST(count(*) AS BIGINT) AS n_triples,
             CAST(sum(CASE WHEN t3 = t1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_pingpong
      FROM seq
      WHERE t1 IS NOT NULL AND t3 IS NOT NULL AND t1 <> t2
      GROUP BY t1, t2
    )
    SELECT t1 AS from_type, t2 AS via_type, n_triples, n_pingpong,
           floor(CAST(n_pingpong AS DOUBLE) / n_triples * 1000000.0
                 + 0.5) / 1000000.0 AS pingpong_rate
    FROM tri
    """,
)
def q_seq_ping_pong_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ping-pong rate per transition: of all A→B→? triples in user
    streams (A ≠ B — a genuine departure), what share bounces straight
    back to A? High view→click→view is scan-and-return browsing; high
    anything→error→same is retry-looping — the bounce diagnosis that
    q_seq_path_trigrams' raw trigram counts contain but don't
    normalize. Conditioning is per (from, via) pair, so a rare
    transition's bounce habit isn't drowned by a common one's volume.

    Plan: one fused lag+lead window pass partitioned BY USER
    (user-grain bounded, one Window node — same spec), one hash
    aggregate to the ≤|types|² pair frame. Determinism: counts are
    exact BIGINTs; the closing rate is one IEEE division e6-rounded
    (the triple count is positive by construction)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("t2"),
        F.lag("event_type").over(w).alias("t1"),
        F.lead("event_type").over(w).alias("t3"),
    ).filter(
        F.col("t1").isNotNull()
        & F.col("t3").isNotNull()
        & (F.col("t1") != F.col("t2"))
    )
    tri = seq.groupBy("t1", "t2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triples"),
        F.sum(F.when(F.col("t3") == F.col("t1"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_pingpong"),
    )
    return tri.select(
        F.col("t1").alias("from_type"),
        F.col("t2").alias("via_type"),
        "n_triples",
        "n_pingpong",
        dround(
            F.col("n_pingpong").cast("double") / F.col("n_triples"), 6
        ).alias("pingpong_rate"),
    )


@register(
    "q_seq_habit_strength",
    oracle="""
    WITH uh AS (
      SELECT user_id,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24 AS hh,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    u AS (
      SELECT user_id,
             CAST(max(y) AS BIGINT) AS modal,
             CAST(sum(y) AS BIGINT) AS n
      FROM uh GROUP BY user_id
    ),
    b AS (
      SELECT CAST(floor(CAST(modal AS DOUBLE) / n * 10.0) AS BIGINT)
               AS decile,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(n) AS BIGINT) AS n_events
      FROM u GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n_users) AS BIGINT) AS t FROM b)
    SELECT decile, n_users, n_events,
           floor(CAST(n_users AS DOUBLE) / t * 1000000.0 + 0.5)
             / 1000000.0 AS user_share
    FROM b CROSS JOIN tot
    """,
)
def q_seq_habit_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Habit-strength histogram: per user, the share of their events
    falling in their single busiest hour-of-day (the modal-hour
    share), bucketed into deciles — decile 10 (share = 1.0) is a
    one-hour-a-day habit, decile 0-1 is around-the-clock usage. The
    per-USER concentration twin of q_ts_diurnal_entropy's per-type
    uniformity: a fleet-level entropy can stay flat while individual
    users polarize, which is exactly what this distribution catches.

    Plan: one (user, hour-of-day) hash aggregate (≤24 rows per user),
    one per-user max/sum fold, one ≤11-row decile histogram with the
    scalar total broadcast back — user-grain bounded throughout, no
    windows. Determinism: counts are exact BIGINTs; the decile is
    floor(modal/n·10) on one IEEE division (modal = n gives decile 10,
    its own documented bucket); the closing share is e6-rounded."""
    e = load_table(spark, sf_dir, "events")
    uh = e.groupBy(
        "user_id",
        (F.floor(F.unix_timestamp("ts") / 3600).cast("bigint") % 24).alias(
            "hh"
        ),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    u = uh.groupBy("user_id").agg(
        F.max("y").cast("bigint").alias("modal"),
        F.sum("y").cast("bigint").alias("n"),
    )
    b = u.groupBy(
        F.floor(F.col("modal").cast("double") / F.col("n") * 10.0)
        .cast("bigint")
        .alias("decile")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("n").cast("bigint").alias("n_events"),
    )
    tot = b.agg(F.sum("n_users").cast("bigint").alias("t"))
    return b.crossJoin(F.broadcast(tot)).select(
        "decile",
        "n_users",
        "n_events",
        dround(F.col("n_users").cast("double") / F.col("t"), 6).alias(
            "user_share"
        ),
    )


@register(
    "q_seq_interevent_burstiness",
    oracle=f"""
    WITH seq AS (
      SELECT user_id,
             epoch_us(ts) // 1000000
             - lag(epoch_us(ts) // 1000000)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS gap
      FROM events
    ),
    g AS (
      SELECT user_id,
             CAST(count(gap) AS BIGINT) AS n_gaps,
             CAST(sum(gap) AS BIGINT) AS sg,
             CAST(sum(gap * gap) AS BIGINT) AS sgg
      FROM seq WHERE gap IS NOT NULL GROUP BY user_id
    ),
    s AS (
      SELECT user_id, n_gaps,
             CAST(sg AS DOUBLE) / n_gaps AS mu,
             {sql_dround(
                 "sqrt((CAST(sgg AS DOUBLE)"
                 " - CAST(sg AS DOUBLE) * sg / n_gaps) / n_gaps)", 6,
             )} AS sigma
      FROM g WHERE n_gaps >= 3
    )
    SELECT user_id, n_gaps,
           {sql_dround("mu", 6)} AS mean_gap_s,
           sigma AS sd_gap_s,
           CASE WHEN sigma + mu = 0 THEN 0.0
                ELSE {sql_dround("(sigma - mu) / (sigma + mu)", 6)}
           END AS burstiness
    FROM s
    """,
)
def q_seq_interevent_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh–Barabási inter-event burstiness per user:
    B = (σ − μ)/(σ + μ) over the user's inter-event gaps (seconds,
    (ts, event_id) total order), for users with ≥ 3 gaps. B → −1 for
    clockwork-regular activity, 0 for a Poisson user, → +1 for
    extreme bursts — the per-ENTITY arrival-pattern classifier next
    to q_ts_fano_factor's per-series dispersion (same question,
    different grain: Fano profiles the aggregate stream, B profiles
    each user).

    Plan: one per-user lag window (user-partitioned — distributed),
    one hash aggregate to (n, Σg, Σg²) — all exact int64 (gaps fit a
    month in seconds, squares ≤ ~7e12, sums exact) — then per-row
    closings. Determinism: timestamps floor to WHOLE seconds via
    integer division of exact microseconds on BOTH sides (DuckDB's
    epoch() keeps fractional µs where Spark's unix_timestamp
    truncates — the gap grid must agree before any squaring); μ and
    the variance are deterministic double arithmetic ON exact
    integers; σ e6-rounds its sqrt (libm); B is computed from the
    rounded σ identically on both sides; the degenerate all-zero-gap
    user (σ = μ = 0) takes the documented 0.0 branch (regularity
    convention)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.expr("unix_micros(ts) div 1000000")
    seq = e.select(
        "user_id", (sec - F.lag(sec).over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    g = seq.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.sum("gap").cast("bigint").alias("sg"),
        F.sum(F.col("gap") * F.col("gap")).cast("bigint").alias("sgg"),
    ).filter(F.col("n_gaps") >= 3)
    n = F.col("n_gaps")
    mu = F.col("sg").cast("double") / n
    var = (
        F.col("sgg").cast("double")
        - F.col("sg").cast("double") * F.col("sg") / n
    ) / n
    s = g.select(
        "user_id",
        "n_gaps",
        mu.alias("mu"),
        dround(F.sqrt(var), 6).alias("sigma"),
    )
    sig, m = F.col("sigma"), F.col("mu")
    return s.select(
        "user_id",
        "n_gaps",
        dround(m, 6).alias("mean_gap_s"),
        sig.alias("sd_gap_s"),
        F.when(sig + m == 0, F.lit(0.0))
        .otherwise(dround((sig - m) / (sig + m), 6))
        .alias("burstiness"),
    )


@register(
    "q_seq_first_touch_attribution",
    oracle="""
    WITH firsts AS (
      SELECT user_id, event_type AS first_touch
      FROM (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
      ) WHERE rn = 1
    ),
    conv AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    )
    SELECT f.first_touch,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(coalesce(sum(CASE WHEN c.user_id IS NOT NULL
                                  THEN 1 END), 0) AS BIGINT)
             AS n_converted,
           floor(coalesce(sum(CASE WHEN c.user_id IS NOT NULL
                                   THEN 1 END), 0)
                 / CAST(count(*) AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS conv_rate
    FROM firsts f LEFT JOIN conv c ON c.user_id = f.user_id
    GROUP BY f.first_touch
    """,
)
def q_seq_first_touch_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-touch conversion attribution: every user's FIRST event
    type (their acquisition channel in the attribution sense), and per
    channel how many of those users ever purchased — the classic
    first-touch model next to q_seq_conversion_latency's timing view
    and q_funnel_signup_purchase's step view.

    Plan: one per-user rank window picks the first event ((ts,
    event_id) total order — the id tiebreak makes tied timestamps
    deterministic), one distinct-converters aggregate, a user-keyed
    left join, one closing hash aggregate on the ≤|types| channel
    grain. Determinism: exact integer counts; conv_rate is one IEEE
    division, e6-rounded."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    firsts = (
        e.select(
            "user_id",
            F.col("event_type").alias("first_touch"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    conv = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        firsts.join(conv, "user_id", "left")
        .groupBy("first_touch")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.coalesce(F.sum("hit"), F.lit(0))
            .cast("bigint")
            .alias("n_converted"),
            dround(
                F.coalesce(F.sum("hit"), F.lit(0))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("conv_rate"),
        )
    )
