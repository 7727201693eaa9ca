"""Second classical-inference battery: Kendall's tau-b (rank
association between two daily metrics), McNemar's paired-proportion
test (did the same users change behavior between month halves?), the
chi-square goodness-of-fit test (is traffic uniform over the weekly
cycle?), the Friedman test (do event types rank consistently across
daily blocks?), and Bartlett's test (are group variances equal enough
for pooled-variance parametrics?) — completing operators/stats.py's
toolkit with the paired/blocked/association tests an experimentation
platform runs alongside the k-sample batteries.

None exists as a Spark builtin. Plans follow the stats.py discipline:
event volume enters ONLY through hash aggregates at the (type, day) or
(type, user) grain; everything downstream touches frames bounded by
group cardinality (types × days, a retention-bounded pre-agg exactly
like q_ts_theil_sen's) — never by traffic. The Kendall pair expansion
is |days|² per type and the Friedman ranking window is |types| per
day, both documented retention-grain bounds.

Determinism: integer counts and decimal-detour sums throughout; exact
.5-grid midranks from integer rank/count arithmetic; every libm (ln,
sqrt) and every cancellation-prone closing e6-rounded on both sides;
zero denominators take explicit NULL branches identically.

Reference parity note: the reference engine (an Elixir event-transport
client, SURVEY.md §0) has no statistics surface; these derive from the
driver's analytics mandate and standard experimentation practice
(tau-b per Kendall, McNemar 1947, Friedman 1937, Bartlett 1937).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table
from ex_hivent_spark.functions.decimals import dround, sql_dround
from ex_hivent_spark.plans.registry import register

# The events table spans one fixed 720-hour month at every SF
# (drift.py's spine constants); its midpoint splits the McNemar pair.
_EPOCH_H = 473352
_MID_TS = (_EPOCH_H + 360) * 3600

# Oracle twin of the per-(type, day) metric pre-agg used by the
# Kendall and GOF tests: day id, event count, distinct users.
_SQL_DAILY = """
      SELECT event_type,
             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS x,
             CAST(count(DISTINCT user_id) AS BIGINT) AS y
      FROM events
      GROUP BY 1, 2
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, d, x=n_events, y=n_distinct_users) per day."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 86400).cast("bigint").alias("d"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("x"),
        F.count_distinct("user_id").cast("bigint").alias("y"),
    )


@register(
    "q_stats_kendall_tau",
    oracle=f"""
    WITH daily AS ({_SQL_DAILY}),
    pairs AS (
      SELECT a.event_type,
             CASE WHEN (a.x < b.x AND a.y < b.y)
                    OR (a.x > b.x AND a.y > b.y) THEN 1 ELSE 0 END AS conc,
             CASE WHEN (a.x < b.x AND a.y > b.y)
                    OR (a.x > b.x AND a.y < b.y) THEN 1 ELSE 0 END AS disc,
             CASE WHEN a.x = b.x AND a.y <> b.y THEN 1 ELSE 0 END AS tx,
             CASE WHEN a.y = b.y AND a.x <> b.x THEN 1 ELSE 0 END AS ty
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.d < b.d
    ),
    agg AS (
      SELECT event_type,
             CAST(sum(conc) AS BIGINT) AS n_conc,
             CAST(sum(disc) AS BIGINT) AS n_disc,
             CAST(sum(tx) AS BIGINT) AS n_tie_x,
             CAST(sum(ty) AS BIGINT) AS n_tie_y
      FROM pairs GROUP BY event_type
    )
    SELECT event_type, n_conc, n_disc, n_tie_x, n_tie_y,
           CASE WHEN (n_conc + n_disc + n_tie_y) = 0
                  OR (n_conc + n_disc + n_tie_x) = 0 THEN NULL
                ELSE {sql_dround(
                    "(n_conc - n_disc) / sqrt("
                    "CAST((n_conc + n_disc + n_tie_y) AS DOUBLE)"
                    " * (n_conc + n_disc + n_tie_x))", 6)}
           END AS tau_b
    FROM agg
    """,
)
def q_stats_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b per event type between the two daily health
    metrics — event volume (x) and distinct-user reach (y): over all
    day pairs, (concordant − discordant) / sqrt(pairs-untied-in-x ×
    pairs-untied-in-y). tau near +1 says volume and reach move
    together (organic growth); near 0 says volume moves without reach
    (a few users generating load). The tie-corrected b variant is the
    right one on count data where equal days happen.

    Plan: ONE hash aggregate to the (type, day) grain — the only pass
    over event volume — then a |days|² per-type pair self-join (435
    pairs per type on the 30-day month; retention-grain bounded, the
    q_ts_theil_sen discipline) and a per-type hash aggregate.
    Determinism: concordance/tie counts are exact integers; the only
    float math is the single closing sqrt ratio, e6-rounded; a fully
    tied axis yields NULL identically on both sides."""
    daily = _daily(spark, sf_dir)
    a, b = daily.alias("a"), daily.alias("b")
    ax, bx = F.col("a.x"), F.col("b.x")
    ay, by = F.col("a.y"), F.col("b.y")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.d") < F.col("b.d")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.when(((ax < bx) & (ay < by)) | ((ax > bx) & (ay > by)), 1)
        .otherwise(0)
        .alias("conc"),
        F.when(((ax < bx) & (ay > by)) | ((ax > bx) & (ay < by)), 1)
        .otherwise(0)
        .alias("disc"),
        F.when((ax == bx) & (ay != by), 1).otherwise(0).alias("tx"),
        F.when((ay == by) & (ax != bx), 1).otherwise(0).alias("ty"),
    )
    agg = pairs.groupBy("event_type").agg(
        F.sum("conc").cast("bigint").alias("n_conc"),
        F.sum("disc").cast("bigint").alias("n_disc"),
        F.sum("tx").cast("bigint").alias("n_tie_x"),
        F.sum("ty").cast("bigint").alias("n_tie_y"),
    )
    den_x = F.col("n_conc") + F.col("n_disc") + F.col("n_tie_y")
    den_y = F.col("n_conc") + F.col("n_disc") + F.col("n_tie_x")
    return agg.select(
        "event_type",
        "n_conc",
        "n_disc",
        "n_tie_x",
        "n_tie_y",
        F.when((den_x == 0) | (den_y == 0), F.lit(None).cast("double"))
        .otherwise(
            dround(
                (F.col("n_conc") - F.col("n_disc"))
                / F.sqrt(den_x.cast("double") * den_y),
                6,
            )
        )
        .alias("tau_b"),
    )


@register(
    "q_stats_mcnemar",
    oracle=f"""
    WITH flags AS (
      SELECT event_type, user_id,
             max(CASE WHEN epoch(ts) < {_MID_TS} THEN 1 ELSE 0 END) AS h1,
             max(CASE WHEN epoch(ts) >= {_MID_TS} THEN 1 ELSE 0 END) AS h2
      FROM events GROUP BY event_type, user_id
    ),
    cells AS (
      SELECT event_type,
             CAST(sum(CASE WHEN h1 = 1 AND h2 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_both,
             CAST(sum(CASE WHEN h1 = 1 AND h2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_first_only,
             CAST(sum(CASE WHEN h1 = 0 AND h2 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_second_only
      FROM flags GROUP BY event_type
    ),
    u AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
          FROM events)
    SELECT event_type, n_both, n_first_only, n_second_only,
           n_users - n_both - n_first_only - n_second_only AS n_neither,
           CASE WHEN n_first_only + n_second_only = 0 THEN NULL
                ELSE {sql_dround(
                    "CAST((n_first_only - n_second_only)"
                    " * (n_first_only - n_second_only) AS DOUBLE)"
                    " / (n_first_only + n_second_only)", 6)}
           END AS mcnemar_stat,
           CASE WHEN n_first_only + n_second_only = 0 THEN NULL
                ELSE {sql_dround(
                    "CAST(greatest(abs(n_first_only - n_second_only)"
                    " - 1, 0) * greatest(abs(n_first_only"
                    " - n_second_only) - 1, 0) AS DOUBLE)"
                    " / (n_first_only + n_second_only)", 6)}
           END AS mcnemar_cc
    FROM cells CROSS JOIN u
    """,
)
def q_stats_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test per event type on the paired month halves: each
    user is (did type in H1, did type in H2); the discordant cells —
    first-half-only (b) vs second-half-only (c) — carry all the
    information about marginal change, stat = (b−c)²/(b+c), plus the
    continuity-corrected (|b−c|−1)²/(b+c) variant. The four-cell
    breakdown (both / b / c / neither, against the all-events user
    universe) is emitted for the contingency readout.

    Plan: one (type, user) hash aggregate over event volume, one
    per-type hash aggregate of the flags, and a one-row broadcast
    cross join for the user-universe scalar. Determinism: pure integer
    cell counts; the two closing ratios are single IEEE divisions of
    integers, e6-rounded; b+c = 0 yields NULL identically."""
    e = load_table(spark, sf_dir, "events")
    flags = e.groupBy("event_type", "user_id").agg(
        F.max(
            F.when(F.unix_timestamp("ts") < _MID_TS, 1).otherwise(0)
        ).alias("h1"),
        F.max(
            F.when(F.unix_timestamp("ts") >= _MID_TS, 1).otherwise(0)
        ).alias("h2"),
    )
    cells = flags.groupBy("event_type").agg(
        F.sum(F.when((F.col("h1") == 1) & (F.col("h2") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("n_both"),
        F.sum(F.when((F.col("h1") == 1) & (F.col("h2") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("n_first_only"),
        F.sum(F.when((F.col("h1") == 0) & (F.col("h2") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("n_second_only"),
    )
    universe = e.agg(
        F.count_distinct("user_id").cast("bigint").alias("n_users")
    )
    joined = cells.crossJoin(F.broadcast(universe))
    b, c = F.col("n_first_only"), F.col("n_second_only")
    diff2 = ((b - c) * (b - c)).cast("double")
    cc = F.greatest(F.abs(b - c) - 1, F.lit(0))
    cc2 = (cc * cc).cast("double")
    return joined.select(
        "event_type",
        "n_both",
        "n_first_only",
        "n_second_only",
        (
            F.col("n_users")
            - F.col("n_both")
            - F.col("n_first_only")
            - F.col("n_second_only")
        ).alias("n_neither"),
        F.when(b + c == 0, F.lit(None).cast("double"))
        .otherwise(dround(diff2 / (b + c), 6))
        .alias("mcnemar_stat"),
        F.when(b + c == 0, F.lit(None).cast("double"))
        .otherwise(dround(cc2 / (b + c), 6))
        .alias("mcnemar_cc"),
    )


@register(
    "q_stats_chisq_gof",
    oracle=f"""
    WITH obs AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 86400) AS BIGINT) % 7 AS dow,
             CAST(count(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT t.event_type, g.dow
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT CAST(unnest(range(7)) AS BIGINT) AS dow) g
    ),
    dense AS (
      SELECT grid.event_type, grid.dow, COALESCE(obs.o, 0) AS o
      FROM grid LEFT JOIN obs
        ON grid.event_type = obs.event_type AND grid.dow = obs.dow
    ),
    tot AS (
      SELECT event_type, CAST(sum(o) AS BIGINT) AS n
      FROM dense GROUP BY event_type
    ),
    terms AS (
      SELECT dense.event_type, dense.o, tot.n,
             {sql_dround(
                 "(dense.o - tot.n / 7.0) * (dense.o - tot.n / 7.0)"
                 " / (tot.n / 7.0)", 6)} AS term
      FROM dense JOIN tot ON dense.event_type = tot.event_type
      WHERE tot.n > 0
    )
    SELECT event_type, CAST(max(n) AS BIGINT) AS n_events,
           CAST(6 AS INT) AS df,
           {sql_dround(
               "CAST(sum(CAST(term AS DECIMAL(25,6))) AS DOUBLE)", 6)}
             AS chi2
    FROM terms GROUP BY event_type
    """,
)
def q_stats_chisq_gof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square goodness-of-fit per event type against a uniform
    weekly cycle: the month's events bucketed by epoch-day mod 7 (a
    pure arithmetic weekday class — no calendar lookup, identical in
    both engines), expected n/7 per cell, chi² = Σ(O−E)²/E over all 7
    cells INCLUDING empty ones (the densified grid matters: a missing
    cell contributes E, not zero). Large chi² on df=6 flags a weekly
    rhythm the uniform model can't explain.

    Plan: one hash aggregate over event volume, a |types|×7 broadcast
    grid to densify, and a per-type closing aggregate — the grid and
    everything after it is group-cardinality bounded. Determinism:
    observed counts are exact integers, each cell term is one IEEE
    chain e6-rounded, and the 7-term sum rides the decimal detour."""
    e = load_table(spark, sf_dir, "events")
    # r16 wave 9: derive the type list from the observed grid (a type
    # with zero events appears in neither — kept, one scan saved with
    # no checkpoint). Pinning obs was also A/B-tested and REVERTED
    # (0.43 unpinned vs 0.55 pinned: the duplicated subtrees overlap
    # within one job).
    obs = e.groupBy(
        "event_type",
        (
            F.floor(F.unix_timestamp("ts") / 86400).cast("bigint") % 7
        ).alias("dow"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    types = obs.select("event_type").distinct()
    grid = types.crossJoin(
        F.broadcast(
            spark.range(7).select(F.col("id").cast("bigint").alias("dow"))
        )
    )
    dense = grid.join(obs, ["event_type", "dow"], "left").select(
        "event_type", "dow", F.coalesce(F.col("o"), F.lit(0)).alias("o")
    )
    tot = dense.groupBy("event_type").agg(
        F.sum("o").cast("bigint").alias("n")
    )
    ecol = F.col("n") / 7.0
    terms = (
        dense.join(tot, "event_type")
        .filter(F.col("n") > 0)
        .select(
            "event_type",
            "n",
            dround(
                (F.col("o") - ecol) * (F.col("o") - ecol) / ecol, 6
            ).alias("term"),
        )
    )
    return terms.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_events"),
        F.lit(6).cast("int").alias("df"),
        dround(
            F.sum(F.col("term").cast("decimal(25,6)")).cast("double"), 6
        ).alias("chi2"),
    )


# Friedman daily metric: per-(day, type) decimal sum of value.
_SQL_FRIEDMAN_DAILY = """
      SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
             event_type,
             CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS m
      FROM events GROUP BY 1, 2
"""


@register(
    "q_stats_friedman",
    oracle=f"""
    WITH daily AS ({_SQL_FRIEDMAN_DAILY}),
    nd AS (SELECT CAST(count(DISTINCT d) AS BIGINT) AS n_days FROM daily),
    kept AS (
      SELECT event_type FROM daily CROSS JOIN nd
      GROUP BY event_type, n_days
      HAVING count(*) = max(n_days)
    ),
    cells AS (
      SELECT daily.d, daily.event_type, daily.m
      FROM daily JOIN kept ON daily.event_type = kept.event_type
    ),
    ranked AS (
      SELECT d, event_type,
             CAST(rank() OVER (PARTITION BY d ORDER BY m) AS DOUBLE)
               + (CAST(count(*) OVER (PARTITION BY d, m) AS DOUBLE) - 1)
                 / 2.0 AS r,
             CAST(count(*) OVER (PARTITION BY d, m) AS BIGINT) AS t
      FROM cells
    ),
    rsums AS (
      SELECT event_type, sum(r) AS rj
      FROM ranked GROUP BY event_type
    ),
    ties AS (
      SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tie_sum
      FROM (SELECT d, m, CAST(count(*) AS BIGINT) AS t
            FROM cells GROUP BY d, m)
    ),
    dims AS (
      SELECT CAST(count(DISTINCT d) AS BIGINT) AS n,
             CAST(count(DISTINCT event_type) AS BIGINT) AS k
      FROM cells
    )
    SELECT n AS n_days, k,
           {sql_dround(
               "12.0 / (n * k * (k + 1)) * sum(rj * rj)"
               " - 3.0 * n * (k + 1)", 6)} AS q_stat,
           {sql_dround(
               "1.0 - CAST(tie_sum AS DOUBLE) / (n * (k*k*k - k))",
               6)} AS tie_factor,
           CASE WHEN tie_sum = n * (k*k*k - k) THEN NULL
                ELSE {sql_dround(
                    "(12.0 / (n * k * (k + 1)) * sum(rj * rj)"
                    " - 3.0 * n * (k + 1))"
                    " / (1.0 - CAST(tie_sum AS DOUBLE)"
                    " / (n * (k*k*k - k)))", 6)}
           END AS q_adj
    FROM rsums CROSS JOIN ties CROSS JOIN dims
    GROUP BY n, k, tie_sum
    """,
)
def q_stats_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman's rank test: do event types keep the same daily-value
    ordering across the month's 30 daily blocks? Within each day the
    kept types (those present EVERY day — complete blocks, the test's
    requirement) get midranks of their daily value sums; Q =
    12/(nk(k+1))·ΣR_j² − 3n(k+1) on df k−1, with the standard tie
    correction factor 1 − Σ(t³−t)/(n(k³−k)) and the adjusted Q/C
    (NULL when every block is fully tied). A small Q says the types'
    relative magnitudes are stable; a large Q says some type
    systematically outranks others.

    Plan: one (day, type) hash aggregate over event volume; the
    ranking window is partitioned BY DAY over ≤ |types| rows (group-
    cardinality bounded); everything downstream is tiny aggregates.
    Determinism: the ranked metric is a decimal-detour sum (identical
    doubles on both engines, so tie groups agree exactly); midranks
    are exact .5-grid rationals from integer rank/count arithmetic
    whose sums stay far below 2^53 (order-insensitive); the closings
    are IEEE chains from integers, e6-rounded."""
    e = load_table(spark, sf_dir, "events")
    # r16 wave 9 NOTE: pinning this frame was A/B-tested TWICE and
    # REVERTED (calm tiebreak 2.29 unpinned vs 6.03 pinned): the nine
    # duplicated events subtrees all sit inside the final job and run
    # CONCURRENTLY across the cores, while a localCheckpoint
    # serializes the aggregate into a blocking materialization ahead
    # of every consumer. Contrast q_stats_page_trend, whose consumers
    # include sequential driver-collect jobs.
    daily = e.groupBy(
        F.floor(F.unix_timestamp("ts") / 86400).cast("bigint").alias("d"),
        "event_type",
    ).agg(F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("m"))
    n_days_f = daily.agg(
        F.count_distinct("d").cast("bigint").alias("n_days")
    )
    kept = (
        daily.crossJoin(F.broadcast(n_days_f))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.max("n_days").alias("nd"),
        )
        .filter(F.col("c") == F.col("nd"))
        .select("event_type")
    )
    cells = daily.join(F.broadcast(kept), "event_type").select(
        "d", "event_type", "m"
    )
    wr = Window.partitionBy("d").orderBy("m")
    wt = Window.partitionBy("d", "m")
    ranked = cells.select(
        "d",
        "event_type",
        (
            F.rank().over(wr).cast("double")
            + (F.count(F.lit(1)).over(wt).cast("double") - 1) / 2.0
        ).alias("r"),
    )
    rsums = ranked.groupBy("event_type").agg(F.sum("r").alias("rj"))
    ties = (
        cells.groupBy("d", "m")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .agg(
            F.sum(
                F.col("t") * F.col("t") * F.col("t") - F.col("t")
            )
            .cast("bigint")
            .alias("tie_sum")
        )
    )
    dims = cells.agg(
        F.count_distinct("d").cast("bigint").alias("n"),
        F.count_distinct("event_type").cast("bigint").alias("k"),
    )
    joined = rsums.crossJoin(F.broadcast(ties)).crossJoin(F.broadcast(dims))
    n, k, tie_sum = F.col("n"), F.col("k"), F.col("tie_sum")
    qexpr = 12.0 / (n * k * (k + 1)) * F.sum(
        F.col("rj") * F.col("rj")
    ) - 3.0 * n * (k + 1)
    tie_den = n * (k * k * k - k)
    cexpr = 1.0 - tie_sum.cast("double") / tie_den
    return joined.groupBy("n", "k", "tie_sum").agg(
        dround(qexpr, 6).alias("q_stat"),
        dround(cexpr, 6).alias("tie_factor"),
        F.when(tie_sum == tie_den, F.lit(None).cast("double"))
        .otherwise(dround(qexpr / cexpr, 6))
        .alias("q_adj"),
    ).select(
        F.col("n").alias("n_days"), "k", "q_stat", "tie_factor", "q_adj"
    )


# Bartlett oracle sub-expressions (composed to mirror the Spark side
# exactly: e6 round the pooled variance, its ln, and 1/(N-k) before
# they enter the closing chain).
_B_POOLED = sql_dround("ssq_tot / (ntot - k)", 6)
_B_LNP = sql_dround(f"ln({_B_POOLED})", 6)
_B_INV_NK = sql_dround("1.0 / (ntot - k)", 6)


@register(
    "q_stats_bartlett",
    oracle=f"""
    WITH g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sx,
             CAST(sum(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE)
               AS sxx
      FROM events GROUP BY event_type
    ),
    v AS (
      SELECT event_type, n,
             {sql_dround("(sxx - sx * sx / n) / (n - 1)", 6)} AS s2,
             {sql_dround("sxx - sx * sx / n", 6)} AS ssq
      FROM g WHERE n >= 2
    ),
    vpos AS (SELECT * FROM v WHERE s2 > 0),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n) AS BIGINT) AS ntot,
             CAST(sum(CAST(ssq AS DECIMAL(25,6))) AS DOUBLE) AS ssq_tot,
             CAST(sum(CAST((n - 1) * ({sql_dround("ln(s2)", 6)})
                  AS DECIMAL(25,6))) AS DOUBLE) AS wlns,
             CAST(sum(CAST({sql_dround("1.0 / (n - 1)", 6)}
                  AS DECIMAL(25,6))) AS DOUBLE) AS inv_sum
      FROM vpos
    )
    SELECT k, ntot AS n_total,
           {_B_POOLED} AS pooled_var,
           CASE WHEN k < 2 THEN NULL
                ELSE {sql_dround(
                    f"((ntot - k) * ({_B_LNP}) - wlns)"
                    f" / (1.0 + (inv_sum - ({_B_INV_NK}))"
                    f" / (3.0 * (k - 1)))", 6)}
           END AS bartlett_stat
    FROM t
    """,
)
def q_stats_bartlett(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's homogeneity-of-variance test across event types on
    value: T = [(N−k)·ln(Sp²) − Σ(nᵢ−1)·ln(Sᵢ²)] / C with C = 1 +
    (Σ1/(nᵢ−1) − 1/(N−k)) / (3(k−1)) — the likelihood-ratio gate that
    says whether a pooled-variance readout (ANOVA's assumption,
    q_stats_anova_oneway) is honest, sharper than Brown–Forsythe when
    the data is near-normal. Groups need n ≥ 2 and a positive sample
    variance (a constant group has no log-variance) — excluded
    identically on both sides.

    Plan: a single per-type hash aggregate over event volume (count +
    two decimal power sums), then one k-row closing aggregate.
    Determinism: Sᵢ² comes off decimal sums via one IEEE chain and is
    e6-rounded; each ln is e6-rounded before its integer-weighted
    decimal re-aggregation (both engines sum identical terms); the
    closing ratio is e6-rounded."""
    e = load_table(spark, sf_dir, "events")
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("value").cast("decimal(25,6)"))
        .cast("double")
        .alias("sx"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(38,6)"))
        .cast("double")
        .alias("sxx"),
    )
    nn = F.col("n")
    v = g.filter(nn >= 2).select(
        "event_type",
        "n",
        dround(
            (F.col("sxx") - F.col("sx") * F.col("sx") / nn) / (nn - 1), 6
        ).alias("s2"),
        dround(F.col("sxx") - F.col("sx") * F.col("sx") / nn, 6).alias(
            "ssq"
        ),
    )
    vpos = v.filter(F.col("s2") > 0)
    t = vpos.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("ntot"),
        F.sum(F.col("ssq").cast("decimal(25,6)"))
        .cast("double")
        .alias("ssq_tot"),
        F.sum(
            ((F.col("n") - 1) * dround(F.log(F.col("s2")), 6)).cast(
                "decimal(25,6)"
            )
        )
        .cast("double")
        .alias("wlns"),
        F.sum(
            dround(1.0 / (F.col("n") - 1).cast("double"), 6).cast(
                "decimal(25,6)"
            )
        )
        .cast("double")
        .alias("inv_sum"),
    )
    k, ntot = F.col("k"), F.col("ntot")
    pooled = dround(F.col("ssq_tot") / (ntot - k), 6)
    lnp = dround(F.log(pooled), 6)
    inv_nk = dround(1.0 / (ntot - k).cast("double"), 6)
    return t.select(
        "k",
        ntot.alias("n_total"),
        pooled.alias("pooled_var"),
        F.when(k < 2, F.lit(None).cast("double"))
        .otherwise(
            dround(
                ((ntot - k) * lnp - F.col("wlns"))
                / (1.0 + (F.col("inv_sum") - inv_nk) / (3.0 * (k - 1))),
                6,
            )
        )
        .alias("bartlett_stat"),
    )


# SPRT hypotheses for the hourly purchase-share walk (the corpus-wide
# purchase share sits near 0.20 by construction) and Wald error rates.
_SPRT_P0 = 0.18
_SPRT_P1 = 0.22
_SPRT_ALPHA = 0.05
_SPRT_BETA = 0.05
# Per-event log-likelihood increments and Wald boundaries, computed
# ONCE in Python so both engines consume bit-identical double
# literals (repr round-trips exactly).
import math as _math  # noqa: E402

_SPRT_L1 = _math.log(_SPRT_P1 / _SPRT_P0)
_SPRT_L0 = _math.log((1.0 - _SPRT_P1) / (1.0 - _SPRT_P0))
_SPRT_A = _math.log((1.0 - _SPRT_BETA) / _SPRT_ALPHA)
_SPRT_B = _math.log(_SPRT_BETA / (1.0 - _SPRT_ALPHA))
# SQL spellings: a bare float literal is typed DECIMAL by both SQL
# dialects — every literal must be cast to DOUBLE or the oracle's
# arithmetic silently lands in decimal.
_SQL_L1 = f"CAST({_SPRT_L1!r} AS DOUBLE)"
_SQL_L0 = f"CAST({_SPRT_L0!r} AS DOUBLE)"
_SQL_A = f"CAST({_SPRT_A!r} AS DOUBLE)"
_SQL_B = f"CAST({_SPRT_B!r} AS DOUBLE)"


@register(
    "q_ab_sprt_boundary",
    oracle=f"""
    WITH hourly AS (
      SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    walk AS (
      SELECT h,
             CAST(sum(CAST({sql_dround(
                 f"c * {_SQL_L1} + (n - c) * {_SQL_L0}", 6)}
                 AS DECIMAL(25,6)) ) OVER (
               ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS DOUBLE) AS llr
      FROM hourly
    )
    SELECT CAST(count(*) AS BIGINT) AS n_hours,
           {sql_dround("max_by(llr, h)", 6)} AS final_llr,
           least(min(CASE WHEN llr >= {_SQL_A} THEN h END),
                 min(CASE WHEN llr <= {_SQL_B} THEN h END))
             AS first_cross_h,
           CASE
             WHEN min(CASE WHEN llr >= {_SQL_A} THEN h END) IS NULL
              AND min(CASE WHEN llr <= {_SQL_B} THEN h END) IS NULL
               THEN 'continue'
             WHEN min(CASE WHEN llr <= {_SQL_B} THEN h END) IS NULL
               OR COALESCE(min(CASE WHEN llr >= {_SQL_A} THEN h END),
                           9223372036854775807)
                  < min(CASE WHEN llr <= {_SQL_B} THEN h END)
               THEN 'accept_h1'
             ELSE 'accept_h0'
           END AS decision
    FROM walk
    """,
)
def q_ab_sprt_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test on the hourly purchase
    share: the cumulative log-likelihood ratio of H1 (p = 0.22)
    against H0 (p = 0.18) walks hour by hour — each hour adds
    c·ln(p1/p0) + (n−c)·ln((1−p1)/(1−p0)) — and the test stops the
    FIRST time the walk exits the Wald band [ln(β/(1−α)),
    ln((1−β)/α)] (α = β = 0.05 → ±ln 19). Emits the first crossing
    hour and the decision — the always-valid sequential monitor an
    experimentation platform runs instead of peeking at a fixed-N
    test (q_ab_proportion_test) every hour.

    Plan: one hourly hash aggregate over event volume, then a
    cumulative sum over the ≤|hours| walk (time-grain bounded, the
    q_ts_kpss_lite class) and a single closing aggregate.
    Determinism: the per-event increments and both boundaries are
    Python-computed double literals consumed identically by both
    engines; each hour's increment is integer-weighted literal
    arithmetic e6-rounded before the decimal-detour cumsum; crossing
    hours are integer mins; final_llr is picked by max_by on the
    unique hour key."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.floor(F.unix_timestamp("ts") / 3600).cast("bigint").alias("h")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("c"),
    )
    wc = Window.orderBy("h").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    inc = dround(
        F.col("c") * _SPRT_L1 + (F.col("n") - F.col("c")) * _SPRT_L0, 6
    )
    walk = hourly.select(
        "h",
        F.sum(inc.cast("decimal(25,6)"))
        .over(wc)
        .cast("double")
        .alias("llr"),
    )
    up = F.min(F.when(F.col("llr") >= _SPRT_A, F.col("h")))
    dn = F.min(F.when(F.col("llr") <= _SPRT_B, F.col("h")))
    agg = walk.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        dround(F.max_by("llr", "h"), 6).alias("final_llr"),
        up.alias("up_h"),
        dn.alias("dn_h"),
    )
    return agg.select(
        "n_hours",
        "final_llr",
        F.least("up_h", "dn_h").alias("first_cross_h"),
        F.when(
            F.col("up_h").isNull() & F.col("dn_h").isNull(),
            F.lit("continue"),
        )
        .when(
            F.col("dn_h").isNull()
            | (
                F.coalesce(F.col("up_h"), F.lit(9223372036854775807))
                < F.col("dn_h")
            ),
            F.lit("accept_h1"),
        )
        .otherwise(F.lit("accept_h0"))
        .alias("decision"),
    )


# Permutation-test parameters: replicate count and the md5 parity
# assignment (deterministic — rows land in the same pseudo-arm on any
# cluster, partitioning, or retry; the engine's no-rand() rule).
_PERM_B = 200


@register(
    "q_ab_permutation_test",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS m
      FROM events GROUP BY user_id
    ),
    obs AS (
      SELECT
        CAST(sum(CASE WHEN user_id % 2 = 0
                      THEN CAST(m AS DECIMAL(25,6)) END) AS DOUBLE)
          / sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        - CAST(sum(CASE WHEN user_id % 2 = 1
                        THEN CAST(m AS DECIMAL(25,6)) END) AS DOUBLE)
          / sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS d_obs,
        CAST(count(*) AS BIGINT) AS n_users
      FROM u
    ),
    reps AS (
      SELECT u.user_id, u.m, r.rep,
             ('0x' || substr(md5(CAST(u.user_id AS VARCHAR) || ':'
                                 || CAST(r.rep AS VARCHAR)), 32, 1)
             )::BIGINT % 2 AS arm
      FROM u, (SELECT CAST(unnest(range({_PERM_B})) AS BIGINT) AS rep) r
    ),
    rdiff AS (
      SELECT rep,
             CAST(sum(CASE WHEN arm = 0
                           THEN CAST(m AS DECIMAL(25,6)) END) AS DOUBLE)
               / sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
             - CAST(sum(CASE WHEN arm = 1
                             THEN CAST(m AS DECIMAL(25,6)) END) AS DOUBLE)
               / sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS d
      FROM reps GROUP BY rep
    )
    SELECT o.n_users, CAST({_PERM_B} AS BIGINT) AS n_reps,
           {sql_dround("o.d_obs", 6)} AS obs_diff,
           CAST(sum(CASE WHEN abs(r.d) >= abs(o.d_obs)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
           {sql_dround(
               f"(1.0 + sum(CASE WHEN abs(r.d) >= abs(o.d_obs)"
               f" THEN 1 ELSE 0 END)) / (1.0 + {_PERM_B})", 6)}
             AS p_value
    FROM rdiff r CROSS JOIN obs o
    GROUP BY o.n_users, o.d_obs
    """,
)
def q_ab_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation test on the observed A/B split (user_id parity, the
    q_ab_proportion_test convention): the per-user value-sum mean
    difference between arms, re-scored under 200 DETERMINISTIC
    pseudo-random re-assignments (arm(u, rep) = md5 parity — the
    engine's no-rand() rule, so every replicate is identical on any
    cluster or retry), with the standard add-one p-value
    (1 + #{|d_rep| ≥ |d_obs|}) / (B + 1). The distribution-free
    companion to q_agg_welch_ttest: no normality or equal-variance
    assumption, just exchangeability.

    Plan: event volume collapses to the per-USER metric frame ONCE;
    the 200-replicate grid expands the user frame (never raw events) —
    |users|×B rows through one hash aggregate keyed on rep. At 100 TB
    the replicate fan-out is tunable and the expansion stays
    aggregate-sized. Determinism: per-user sums ride the decimal
    detour, replicate assignment is md5 parity on identical strings,
    per-rep means are decimal-sum/count, and the comparison against
    |d_obs| uses bit-identical doubles; the closing p is e6-rounded."""
    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(25,6)"))
        .cast("double")
        .alias("m")
    )

    def arm_mean(frame: DataFrame, arm_col, grp: list) -> DataFrame:
        md = F.sum(
            F.when(arm_col == 0, F.col("m").cast("decimal(25,6)"))
        ).cast("double") / F.sum(F.when(arm_col == 0, 1).otherwise(0)) - F.sum(
            F.when(arm_col == 1, F.col("m").cast("decimal(25,6)"))
        ).cast("double") / F.sum(F.when(arm_col == 1, 1).otherwise(0))
        aggs = [md.alias("d")]
        if not grp:
            aggs.append(F.count(F.lit(1)).cast("bigint").alias("n_users"))
            return frame.agg(*aggs)
        return frame.groupBy(*grp).agg(*aggs)

    obs = arm_mean(u, F.col("user_id") % 2, []).select(
        F.col("d").alias("d_obs"), "n_users"
    )
    reps_grid = spark.range(_PERM_B).select(
        F.col("id").cast("bigint").alias("rep")
    )
    arm = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("user_id").cast("string"),
                        F.lit(":"),
                        F.col("rep").cast("string"),
                    )
                ),
                32,
                1,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    reps = u.crossJoin(F.broadcast(reps_grid)).select(
        "user_id", "m", "rep", arm.alias("arm")
    )
    rdiff = arm_mean(reps, F.col("arm"), ["rep"])
    joined = rdiff.crossJoin(F.broadcast(obs))
    extreme = F.sum(
        F.when(F.abs(F.col("d")) >= F.abs(F.col("d_obs")), 1).otherwise(0)
    ).cast("bigint")
    return joined.groupBy("n_users", "d_obs").agg(
        F.lit(_PERM_B).cast("bigint").alias("n_reps"),
        extreme.alias("n_extreme"),
        dround(
            (
                1.0
                + F.sum(
                    F.when(
                        F.abs(F.col("d")) >= F.abs(F.col("d_obs")), 1
                    ).otherwise(0)
                )
            )
            / (1.0 + _PERM_B),
            6,
        ).alias("p_value"),
    ).select(
        "n_users",
        "n_reps",
        dround(F.col("d_obs"), 6).alias("obs_diff"),
        "n_extreme",
        "p_value",
    )


@register(
    "q_stats_page_trend",
    oracle=f"""
    WITH daily AS ({_SQL_FRIEDMAN_DAILY}),
    nd AS (SELECT CAST(count(DISTINCT d) AS BIGINT) AS n_days FROM daily),
    kept AS (
      SELECT event_type FROM daily CROSS JOIN nd
      GROUP BY event_type, n_days
      HAVING count(*) = max(n_days)
    ),
    cells AS (
      SELECT daily.d, daily.event_type, daily.m
      FROM daily JOIN kept ON daily.event_type = kept.event_type
    ),
    ranked AS (
      SELECT d, event_type,
             CAST(rank() OVER (PARTITION BY d ORDER BY m) AS DOUBLE)
               + (CAST(count(*) OVER (PARTITION BY d, m) AS DOUBLE) - 1)
                 / 2.0 AS r
      FROM cells
    ),
    rsums AS (
      SELECT event_type,
             CAST(row_number() OVER (ORDER BY event_type) AS BIGINT)
               AS j,
             CAST(sum(CAST(r AS DECIMAL(25,6))) AS DOUBLE) AS rj
      FROM ranked GROUP BY event_type
    ),
    dims AS (
      SELECT CAST(count(DISTINCT d) AS BIGINT) AS n,
             CAST(count(DISTINCT event_type) AS BIGINT) AS k
      FROM cells
    ),
    stat AS (
      SELECT n, k,
             CAST(sum(CAST(j * rj AS DECIMAL(25,6))) AS DOUBLE) AS l,
             CAST(n AS DOUBLE) * k * (k + 1) * (k + 1) / 4.0 AS e_l,
             CAST(n AS DOUBLE) * k * k * (k + 1) * (k * k - 1)
               / 144.0 AS var_l
      FROM rsums CROSS JOIN dims
      GROUP BY n, k
    )
    SELECT n AS n_days, k, {sql_dround("l", 6)} AS l_stat,
           {sql_dround("e_l", 6)} AS e_l,
           {sql_dround("var_l", 6)} AS var_l,
           CASE WHEN var_l <= 0 THEN NULL
                ELSE {sql_dround(
                    "(l - e_l) / ("
                    + sql_dround("sqrt(var_l)", 6) + ")", 6)}
           END AS z
    FROM stat
    """,
)
def q_stats_page_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's trend test for an ordered alternative across the daily
    blocks: with the kept event types ordered alphabetically as the
    hypothesized monotone ordering, L = Σ_j j·R_j on the within-day
    midranks (R_j = rank sum of the j-th type) against E[L] =
    nk(k+1)²/4 and Var[L] = nk²(k+1)(k²−1)/144; z = (L−E)/√Var. Where
    Friedman only answers "do the types differ in daily magnitude?",
    Page answers "do they differ IN THE STATED ORDER?" — the trend-
    aware upgrade a ramp-up experiment wants (treatment intensities
    have a natural order).

    Plan: one (day, type) hash aggregate; ranking windows partitioned
    BY DAY over ≤|types| rows (group-cardinality bounded, the friedman
    class); the j-index window runs over the ≤|types|-row rank-sum
    frame (bounded aggregate output, allowlisted). Determinism: the
    ranked metric is a decimal-detour sum so tie groups agree exactly;
    midranks are exact .5-grid rationals, and both L and the rank sums
    ride the decimal detour (order-insensitive); E, Var close from
    BIGINT dims in identical IEEE order; √Var is e6-rounded before the
    e6-rounded z; a degenerate single-type panel reads NULL z."""
    e = load_table(spark, sf_dir, "events")
    # r16 wave 8: pin the (day, type) frame — it is ≤ |days|·|types|
    # rows yet feeds FIVE consumers (n_days, kept, cells → ranked +
    # dims), each of which previously re-ran the events-scale
    # aggregate (the before plan holds six events scans).
    daily = e.groupBy(
        F.floor(F.unix_timestamp("ts") / 86400).cast("bigint").alias("d"),
        "event_type",
    ).agg(
        F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("m")
    ).localCheckpoint(eager=False)
    n_days_f = daily.agg(
        F.count_distinct("d").cast("bigint").alias("n_days")
    )
    kept = (
        daily.crossJoin(F.broadcast(n_days_f))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("c"), F.max("n_days").alias("nd"))
        .filter(F.col("c") == F.col("nd"))
        .select("event_type")
    )
    cells = daily.join(F.broadcast(kept), "event_type").select(
        "d", "event_type", "m"
    )
    wr = Window.partitionBy("d").orderBy("m")
    wt = Window.partitionBy("d", "m")
    ranked = cells.select(
        "d",
        "event_type",
        (
            F.rank().over(wr).cast("double")
            + (F.count(F.lit(1)).over(wt).cast("double") - 1) / 2.0
        ).alias("r"),
    )
    wj = Window.orderBy("event_type")
    rsums = (
        ranked.groupBy("event_type")
        .agg(
            F.sum(F.col("r").cast("decimal(25,6)"))
            .cast("double")
            .alias("rj")
        )
        .select(
            "event_type",
            F.row_number().over(wj).cast("bigint").alias("j"),
            "rj",
        )
    )
    dims = cells.agg(
        F.count_distinct("d").cast("bigint").alias("n"),
        F.count_distinct("event_type").cast("bigint").alias("k"),
    )
    n, k = F.col("n"), F.col("k")
    stat = (
        rsums.crossJoin(F.broadcast(dims))
        .groupBy("n", "k")
        .agg(
            F.sum((F.col("j") * F.col("rj")).cast("decimal(25,6)"))
            .cast("double")
            .alias("l"),
            F.max(
                n.cast("double") * k * (k + 1) * (k + 1) / 4.0
            ).alias("e_l"),
            F.max(
                n.cast("double") * k * k * (k + 1) * (k * k - 1) / 144.0
            ).alias("var_l"),
        )
    )
    lc, el, vl = F.col("l"), F.col("e_l"), F.col("var_l")
    return stat.select(
        F.col("n").alias("n_days"),
        "k",
        dround(lc, 6).alias("l_stat"),
        dround(el, 6).alias("e_l"),
        dround(vl, 6).alias("var_l"),
        F.when(vl <= 0, F.lit(None).cast("double"))
        .otherwise(dround((lc - el) / dround(F.sqrt(vl), 6), 6))
        .alias("z"),
    )


# Homogeneity split point: first 15 days vs the rest of the month.
_H2_SPLIT_DAY = 19723 + 15  # _EPOCH_DAY + 15 (tsdiag.py convention)


@register(
    "q_stats_chi2_homogeneity",
    oracle=f"""
    WITH o AS (
      SELECT event_type,
             CAST(sum(CASE WHEN floor(epoch(ts) / 86400)
                                < {_H2_SPLIT_DAY}
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
             CAST(sum(CASE WHEN floor(epoch(ts) / 86400)
                                >= {_H2_SPLIT_DAY}
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_second
      FROM events GROUP BY event_type
    ),
    t AS (
      SELECT CAST(sum(n_first) AS BIGINT) AS c1,
             CAST(sum(n_second) AS BIGINT) AS c2
      FROM o
    ),
    e AS (
      SELECT o.event_type, o.n_first, o.n_second, t.c1, t.c2,
             CAST(o.n_first + o.n_second AS DOUBLE) * t.c1
               / (t.c1 + t.c2) AS e1,
             CAST(o.n_first + o.n_second AS DOUBLE) * t.c2
               / (t.c1 + t.c2) AS e2
      FROM o CROSS JOIN t
    )
    SELECT event_type, n_first, n_second,
           {sql_dround("e1", 6)} AS exp_first,
           {sql_dround("e2", 6)} AS exp_second,
           {sql_dround(
               "(n_first - e1) * (n_first - e1) / e1"
               " + (n_second - e2) * (n_second - e2) / e2",
               6)} AS chi2_term
    FROM e
    """,
)
def q_stats_chi2_homogeneity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² homogeneity decomposition of the event-type mix across the
    month's two halves (days 1–15 vs 16–31): per type, the observed
    half counts, the margin-derived expected counts, and the type's
    two-cell χ² contribution — summed over types this is the k×2
    homogeneity statistic on df = k−1, and PER TYPE it names which
    behavior actually shifted (the categorical sibling of
    q_ts_psi_drift's binned-numeric drift score).

    Plan: one conditional hash aggregate to ≤|types| rows (the
    corpus-sized pass), margins broadcast back, per-row closing.
    Determinism: all counts are exact BIGINTs from integer day
    arithmetic; expectations cast the integer products to DOUBLE in
    identical order (granger discipline); contributions are IEEE
    chains e6-rounded (margins are positive whenever a type row
    exists)."""
    e = load_table(spark, sf_dir, "events")
    day = F.floor(F.unix_timestamp("ts") / 86400)
    o = e.groupBy("event_type").agg(
        F.sum(F.when(day < _H2_SPLIT_DAY, 1).otherwise(0))
        .cast("bigint")
        .alias("n_first"),
        F.sum(F.when(day >= _H2_SPLIT_DAY, 1).otherwise(0))
        .cast("bigint")
        .alias("n_second"),
    )
    t = o.agg(
        F.sum("n_first").cast("bigint").alias("c1"),
        F.sum("n_second").cast("bigint").alias("c2"),
    )
    j = o.crossJoin(F.broadcast(t))
    row_tot = (F.col("n_first") + F.col("n_second")).cast("double")
    gt = F.col("c1") + F.col("c2")
    ecols = j.select(
        "event_type",
        "n_first",
        "n_second",
        (row_tot * F.col("c1") / gt).alias("e1"),
        (row_tot * F.col("c2") / gt).alias("e2"),
    )
    d1 = F.col("n_first") - F.col("e1")
    d2 = F.col("n_second") - F.col("e2")
    return ecols.select(
        "event_type",
        "n_first",
        "n_second",
        dround(F.col("e1"), 6).alias("exp_first"),
        dround(F.col("e2"), 6).alias("exp_second"),
        dround(
            d1 * d1 / F.col("e1") + d2 * d2 / F.col("e2"), 6
        ).alias("chi2_term"),
    )


@register(
    "q_stats_jonckheere",
    oracle=f"""
    WITH daily AS ({_SQL_FRIEDMAN_DAILY}),
    u AS (
      SELECT CAST(sum(CAST(CASE WHEN a.m < b.m THEN 1.0
                           WHEN a.m = b.m THEN 0.5
                           ELSE 0.0 END AS DECIMAL(25,6)))
                  AS DOUBLE) AS j
      FROM daily a JOIN daily b ON a.event_type < b.event_type
    ),
    sizes AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n
      FROM daily GROUP BY event_type
    ),
    dims AS (
      SELECT CAST(sum(n) AS BIGINT) AS nn,
             CAST(sum(n * n) AS BIGINT) AS sn2,
             CAST(sum(n * n * (2 * n + 3)) AS BIGINT) AS sv
      FROM sizes
    ),
    c AS (
      SELECT j, nn,
             (CAST(nn AS DOUBLE) * nn - sn2) / 4.0 AS e_j,
             (CAST(nn AS DOUBLE) * nn * (2.0 * nn + 3.0) - sv)
               / 72.0 AS var_j
      FROM u CROSS JOIN dims
    )
    SELECT nn AS n_obs, {sql_dround("j", 6)} AS j_stat,
           {sql_dround("e_j", 6)} AS e_j,
           {sql_dround("var_j", 6)} AS var_j,
           CASE WHEN var_j <= 0 THEN NULL
                ELSE {sql_dround(
                    "(j - e_j) / (" + sql_dround("sqrt(var_j)", 6)
                    + ")", 6)}
           END AS z
    FROM c
    """,
)
def q_stats_jonckheere(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheère–Terpstra ordered-alternative trend test across the
    event types' daily value sums (types ordered alphabetically as the
    hypothesized ordering, the q_stats_page_trend convention): J sums
    the Mann–Whitney exceedance counts over all ordered group pairs
    (ties count ½), against E[J] = (N²−Σnᵢ²)/4 and the no-tie
    Var[J] = (N²(2N+3) − Σnᵢ²(2nᵢ+3))/72. Where Page tests trend in
    WITHIN-DAY ranks (blocked), J tests it in the POOLED samples —
    sensitive to level differences Page's block ranks normalize away.

    Plan: one (day, type) hash aggregate (the only pass over volume),
    then an ordered-group-pair join over the ≤k·|days| daily frame
    (retention-grain bounded, the q_stats_kendall_tau class) and a
    scalar close. Determinism: the daily metric is a decimal-detour
    sum so cross-engine comparisons agree exactly; the ½-grid U rides
    the decimal detour; moment closings cast BIGINTs to DOUBLE in
    identical IEEE order; √ is e6-rounded before the e6-rounded z; a
    degenerate variance reads NULL."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.floor(F.unix_timestamp("ts") / 86400).cast("bigint").alias("d"),
        "event_type",
    ).agg(
        F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("m")
    )
    daily = daily.localCheckpoint(eager=False)
    a, b = daily.alias("a"), daily.alias("b")
    cmp = (
        F.when(F.col("a.m") < F.col("b.m"), 1.0)
        .when(F.col("a.m") == F.col("b.m"), 0.5)
        .otherwise(0.0)
    )
    u = a.join(
        b, F.col("a.event_type") < F.col("b.event_type")
    ).agg(
        F.sum(cmp.cast("decimal(25,6)")).cast("double").alias("j")
    )
    sizes = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    n = F.col("n")
    dims = sizes.agg(
        F.sum(n).cast("bigint").alias("nn"),
        F.sum(n * n).cast("bigint").alias("sn2"),
        F.sum(n * n * (2 * n + 3)).cast("bigint").alias("sv"),
    )
    nn = F.col("nn")
    c = u.crossJoin(F.broadcast(dims)).select(
        "j",
        "nn",
        ((nn.cast("double") * nn - F.col("sn2")) / 4.0).alias("e_j"),
        (
            (nn.cast("double") * nn * (2.0 * nn + 3.0) - F.col("sv"))
            / 72.0
        ).alias("var_j"),
    )
    j, ej, vj = F.col("j"), F.col("e_j"), F.col("var_j")
    return c.select(
        nn.alias("n_obs"),
        dround(j, 6).alias("j_stat"),
        dround(ej, 6).alias("e_j"),
        dround(vj, 6).alias("var_j"),
        F.when(vj <= 0, F.lit(None).cast("double"))
        .otherwise(dround((j - ej) / dround(F.sqrt(vj), 6), 6))
        .alias("z"),
    )


@register(
    "q_stats_ttest_paired",
    oracle=f"""
    WITH per AS (
      SELECT user_id,
             CASE WHEN epoch(ts) < {_MID_TS} THEN 1 ELSE 2 END AS half,
             CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sv,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    pairs AS (
      SELECT user_id,
             max(CASE WHEN half = 1 THEN sv / c END) AS m1,
             max(CASE WHEN half = 2 THEN sv / c END) AS m2
      FROM per GROUP BY user_id
    ),
    d AS (
      SELECT {sql_dround("m2 - m1", 6)} AS d
      FROM pairs WHERE m1 IS NOT NULL AND m2 IS NOT NULL
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(d AS DECIMAL(25,6))) AS DOUBLE) AS sd,
             CAST(sum(CAST({sql_dround("d * d", 6)} AS DECIMAL(25,6)))
                  AS DOUBLE) AS sdd
      FROM d
    )
    SELECT n AS n_pairs,
           {sql_dround("sd / n", 6)} AS mean_diff,
           {sql_dround(
               "sqrt((sdd - sd * sd / n) / (n - 1))", 6)} AS sd_diff,
           CASE WHEN (sdd - sd * sd / n) / (n - 1) <= 0 THEN NULL
                ELSE {sql_dround(
                    "(sd / n) / sqrt((sdd - sd * sd / n) / (n - 1) / n)",
                    6)}
           END AS t_stat
    FROM agg
    """,
)
def q_stats_ttest_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired t-test on per-user mean event value, first month-half vs
    second (the same _MID_TS split McNemar uses for proportions, here
    for means): d_u = mean2(u) − mean1(u) over users active in BOTH
    halves, t = mean(d) / (sd(d)/√n). THE pre/post test of an
    experimentation platform when each user is their own control —
    pairing removes between-user variance that q_agg_welch_ttest's
    independent-samples form must carry.

    Plan: one (user, half) hash aggregate over the stream (partial
    combine; |users|×2 rows out), a per-user pivot via conditional
    max, one closing aggregate — traffic-invariant after the first
    shuffle. Determinism: per-user means are decimal-sum/count; d is
    e6-rounded, d² e6-rounded, both decimal-summed (magnitudes
    ≤ ~5e8 at scale 6 — inside the 2^53 bound); sqrt on identical
    doubles is correctly rounded; a non-positive variance (all d
    equal) takes the NULL branch on both sides."""
    e = load_table(spark, sf_dir, "events")
    half = F.when(F.unix_timestamp("ts") < _MID_TS, 1).otherwise(2)
    per = e.groupBy("user_id", half.alias("half")).agg(
        F.sum(F.col("value").cast("decimal(25,6)"))
        .cast("double")
        .alias("sv"),
        F.count(F.lit(1)).cast("bigint").alias("c"),
    )
    m = F.col("sv") / F.col("c")
    pairs = per.groupBy("user_id").agg(
        F.max(F.when(F.col("half") == 1, m)).alias("m1"),
        F.max(F.when(F.col("half") == 2, m)).alias("m2"),
    )
    d = (
        pairs.filter(F.col("m1").isNotNull() & F.col("m2").isNotNull())
        .select(dround(F.col("m2") - F.col("m1"), 6).alias("d"))
    )
    agg = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("d").cast("decimal(25,6)")).cast("double").alias("sd"),
        F.sum(dround(F.col("d") * F.col("d"), 6).cast("decimal(25,6)"))
        .cast("double")
        .alias("sdd"),
    )
    n, sd, sdd = F.col("n"), F.col("sd"), F.col("sdd")
    var = (sdd - sd * sd / n) / (n - 1)
    return agg.select(
        n.alias("n_pairs"),
        dround(sd / n, 6).alias("mean_diff"),
        dround(F.sqrt(var), 6).alias("sd_diff"),
        F.when(var <= 0, F.lit(None).cast("double"))
        .otherwise(dround((sd / n) / F.sqrt(var / n), 6))
        .alias("t_stat"),
    )


@register(
    "q_stats_f_test_variance",
    oracle=f"""
    WITH g AS (
      SELECT l_returnflag AS rf,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE)
               AS sx,
             CAST(sum(CAST(l_extendedprice * l_extendedprice
                           AS DECIMAL(38,6))) AS DOUBLE) AS sxx
      FROM lineitem WHERE l_returnflag IN ('R', 'A')
      GROUP BY l_returnflag
    ),
    w AS (
      SELECT r.n AS n1,
             (r.sxx - r.sx * r.sx / r.n) / (r.n - 1) AS s1,
             a.n AS n2,
             (a.sxx - a.sx * a.sx / a.n) / (a.n - 1) AS s2
      FROM (SELECT * FROM g WHERE rf = 'R') r
      CROSS JOIN (SELECT * FROM g WHERE rf = 'A') a
    )
    SELECT n1, n2,
           CAST(n1 - 1 AS BIGINT) AS df1,
           CAST(n2 - 1 AS BIGINT) AS df2,
           CASE WHEN s2 <= 0 THEN NULL
                ELSE {sql_dround("s1 / s2", 6)} END AS f_stat
    FROM w
    """,
)
def q_stats_f_test_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample F test of equal variance on l_extendedprice between
    returned ('R') and acknowledged ('A') line items — the classical
    variance-ratio F = s²_R / s²_A with its degrees of freedom,
    exactly the pair q_agg_welch_ttest compares means for; running
    both is the standard location+scale read of a segmentation.

    Plan: one conditional hash aggregate (two groups), a 2-row
    reshape, a single-row closing — entirely partial-aggregated,
    traffic-invariant. Determinism: moment sums ride the welch-proven
    decimal(25,6)/(38,6) detour; the RAW variances are deliberately
    NOT emitted — their ~9e8 magnitude sits past the 2^53 unscaled-
    decimal bound where DuckDB's decimal→double cast double-rounds
    (±~1.5e-6 absolute on the variance, which flips any e6 grid), but
    the F RATIO carries only ~1e-16 RELATIVE drift and e6-rounds
    identically; a degenerate zero denominator takes the NULL branch
    on both sides."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice")
    g = (
        li.filter(F.col("l_returnflag").isin("R", "A"))
        .groupBy(F.col("l_returnflag").alias("rf"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(x.cast("decimal(25,6)")).cast("double").alias("sx"),
            F.sum((x * x).cast("decimal(38,6)")).cast("double").alias("sxx"),
        )
    )
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (
        F.col("n") - 1
    )
    gg = g.select("rf", "n", var.alias("s2"))
    r = gg.filter(F.col("rf") == "R").select(
        F.col("n").alias("n1"), F.col("s2").alias("s1")
    )
    a = gg.filter(F.col("rf") == "A").select(
        F.col("n").alias("n2"), F.col("s2").alias("s2")
    )
    w = r.crossJoin(F.broadcast(a))
    return w.select(
        "n1",
        "n2",
        (F.col("n1") - 1).cast("bigint").alias("df1"),
        (F.col("n2") - 1).cast("bigint").alias("df2"),
        F.when(F.col("s2") <= 0, F.lit(None).cast("double"))
        .otherwise(dround(F.col("s1") / F.col("s2"), 6))
        .alias("f_stat"),
    )
