"""Behavioral segmentation operators: RFM (recency / frequency /
monetary) quintile scoring over the order history, the quintile
mobility matrix ("which spend tier did each user move to between the
early and late half of the window?"), and per-user event-path trigram
mining — the customer-analytics layer every growth/retention platform
derives from the same event and order streams the rest of the engine
queries.

Plan discipline: every global ranking goes through the DETERMINISTIC
blocked prefix fold (operators/prefix.py) over a per-entity aggregate
frame — never a global ntile/row_number window — so the quintile
assignments scale to any customer count; path mining windows are
partitioned per user (bounded per-user activity), and every output is
segment-cardinality sized (≤5³ RFM cells, ≤5² mobility cells, ≤|type|³
trigrams).

Determinism: metrics ride the decimal detour; ranks are exact integers
from the prefix fold with entity-key tie-breaks; quintile arithmetic is
exact double math below 2⁵³ (floor(5·(rank−1)/n)); no libm anywhere.

Reference parity note: the reference engine (an Elixir event-transport
client, SURVEY.md §0) has no analytics surface; these derive from the
driver's analytics mandate and standard RFM / cohort practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table
from ex_hivent_spark.functions.decimals import dround, sql_dround
from ex_hivent_spark.operators.prefix import running_totals_blocked
from ex_hivent_spark.plans.registry import register

# TPC-H orders end 1998-08-02; the RFM "as-of" reference day.
_RFM_NOW = "1998-08-03"
# Prefix-fold block widths per metric (bounded block counts at any
# scale: recency ≤ ~2600 days, frequency ≤ ~100, monetary ≤ ~600k).
_REC_BLOCK = 100.0
_FRQ_BLOCK = 5.0
_MON_BLOCK = 50000.0
# Early/late mobility split of the 2024-01 events month.
_CUT = "2024-01-16"
_VAL_BLOCK = 500.0


def _quintile(frame: DataFrame, metric: str, block: float, out: str) -> DataFrame:
    """(o_custkey|user_id, metric) frame -> + ascending quintile 1..5
    via the blocked prefix rank (ties broken by the entity key)."""
    key = frame.columns[0]
    blocked = frame.withColumn(
        "blk", F.floor(F.col(metric) / F.lit(block))
    ).withColumn("one", F.lit(1).cast("bigint"))
    ranked = running_totals_blocked(
        blocked,
        order_cols=[metric, key],
        block_cols=["blk"],
        sum_cols={"one": "rnk"},
    )
    # r16 OPTIMIZATION: count the INPUT frame, not the ranked one — the
    # row count is identical (running_totals_blocked inner-joins every
    # block back), and the broadcast-n subtree no longer re-executes
    # the window + offsets join just to count rows.
    n = frame.agg(F.count(F.lit(1)).cast("bigint").alias("n_tot"))
    return (
        ranked.crossJoin(F.broadcast(n))
        .select(
            key,
            metric,
            (
                F.floor(
                    5.0
                    * (F.col("rnk") - 1).cast("double")
                    / F.col("n_tot").cast("double")
                ).cast("int")
                + 1
            ).alias(out),
        )
    )


# Oracle twin: ascending quintile from row_number with the same
# (metric, key) total order. {m}=metric col, {k}=key col, {src}=CTE.
def _sql_quintile(src: str, k: str, m: str, out: str) -> str:
    return f"""
      SELECT {k}, {m},
             CAST(floor(5.0 * (row_number() OVER (ORDER BY {m}, {k}) - 1)
                        / (SELECT count(*) FROM {src})) AS INTEGER) + 1
               AS {out}
      FROM {src}
    """


@register(
    "q_agg_rfm_scores",
    oracle=f"""
    WITH rfm AS (
      SELECT o_custkey,
             CAST(date_diff('day', max(o_orderdate),
                            DATE '{_RFM_NOW}') AS BIGINT) AS recency,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
               AS monetary
      FROM orders GROUP BY o_custkey
    ),
    r AS ({_sql_quintile("rfm", "o_custkey", "recency", "r_q")}),
    f AS ({_sql_quintile("rfm", "o_custkey", "frequency", "f_q")}),
    m AS ({_sql_quintile("rfm", "o_custkey", "monetary", "m_q")}),
    scored AS (
      SELECT rfm.o_custkey,
             6 - r.r_q AS r_score, f.f_q AS f_score, m.m_q AS m_score,
             rfm.monetary
      FROM rfm
      JOIN r USING (o_custkey) JOIN f USING (o_custkey)
      JOIN m USING (o_custkey)
    )
    SELECT r_score, f_score, m_score,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(monetary AS DECIMAL(25,6))) AS DOUBLE)
             / count(*) AS avg_monetary
    FROM scored
    GROUP BY r_score, f_score, m_score
    ORDER BY r_score, f_score, m_score
    """,
)
def q_agg_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation of the customer base: per customer, recency
    (days from last order to the as-of day), frequency (order count),
    monetary (lifetime revenue), each quintile-scored 1..5 — recency
    INVERTED (score 5 = most recent, the marketing convention) — then
    rolled up to the ≤125 (R,F,M) segments with size and average
    spend. The canonical "who are my champions / at-risk / hibernating
    customers" cut.

    Plan: one hash aggregate collapses orders to the per-customer RFM
    frame; each quintile comes from the DETERMINISTIC blocked prefix
    rank over that frame (fixed metric-grid blocks, custkey
    tie-breaks — NO global ntile window anywhere); the three score
    columns re-join on custkey (customer-sized shuffle joins, far
    below fact volume) and one final hash aggregate emits the segment
    matrix. Determinism: recency/frequency are exact integers,
    monetary rides the decimal detour, ranks are exact prefix-fold
    integers, and the quintile floor stays below 2⁵³."""
    o = load_table(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.datediff(
            F.lit(_RFM_NOW).cast("date"), F.max("o_orderdate").cast("date")
        )
        .cast("bigint")
        .alias("recency"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
        .cast("double")
        .alias("monetary"),
    ).localCheckpoint(eager=False)  # three quintile folds + the final
    # join fan out from this one customer-sized frame
    r = _quintile(
        rfm.select("o_custkey", "recency"), "recency", _REC_BLOCK, "r_q"
    )
    f = _quintile(
        rfm.select("o_custkey", "frequency"),
        "frequency",
        _FRQ_BLOCK,
        "f_q",
    )
    m = _quintile(
        rfm.select("o_custkey", "monetary"), "monetary", _MON_BLOCK, "m_q"
    )
    scored = (
        rfm.select("o_custkey", "monetary")
        .join(r.select("o_custkey", "r_q"), "o_custkey")
        .join(f.select("o_custkey", "f_q"), "o_custkey")
        .join(m.select("o_custkey", "m_q"), "o_custkey")
        .select(
            (6 - F.col("r_q")).alias("r_score"),
            F.col("f_q").alias("f_score"),
            F.col("m_q").alias("m_score"),
            "monetary",
        )
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            (
                F.sum(F.col("monetary").cast("decimal(25,6)")).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ).alias("avg_monetary"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


@register(
    "q_agg_quintile_mobility",
    oracle=f"""
    WITH early AS (
      SELECT user_id,
             CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS v
      FROM events WHERE ts < TIMESTAMP '{_CUT} 00:00:00'
      GROUP BY user_id
    ),
    late AS (
      SELECT user_id,
             CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS v
      FROM events WHERE ts >= TIMESTAMP '{_CUT} 00:00:00'
      GROUP BY user_id
    ),
    qe AS ({_sql_quintile("early", "user_id", "v", "q_early")}),
    ql AS ({_sql_quintile("late", "user_id", "v", "q_late")}),
    moves AS (
      SELECT qe.q_early, ql.q_late
      FROM qe JOIN ql USING (user_id)
    )
    SELECT q_early, q_late,
           CAST(count(*) AS BIGINT) AS n_users
    FROM moves GROUP BY q_early, q_late
    ORDER BY q_early, q_late
    """,
)
def q_agg_quintile_mobility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spend-tier mobility matrix: each user's total event value is
    quintile-ranked within the early half (before Jan 16) and again
    within the late half of the month; the ≤25-cell (early tier →
    late tier) transition matrix over users active in BOTH halves is
    the standard "are my top spenders staying on top?" churn-risk
    readout (a heavy off-diagonal mass = tier instability).

    Plan: two filtered hash aggregates collapse the stream to the two
    per-user value frames (one scan each half); each quintile is the
    blocked prefix rank over its user-sized frame (user_id
    tie-breaks, NO global window); the matrix is one user-keyed
    shuffle join plus a 25-cell hash aggregate. Determinism: value
    sums ride the decimal detour; ranks and the quintile floor are
    exact; counts are integers."""
    e = load_table(spark, sf_dir, "events")

    def half(pred) -> DataFrame:
        # r16 wave 9 NOTE: pinning each half frame was A/B-tested and
        # REVERTED (calm tiebreak 2.00 unpinned vs 5.91 pinned) — the
        # duplicated filtered aggregates overlap within one job.
        return (
            e.filter(pred)
            .groupBy("user_id")
            .agg(
                F.sum(F.col("value").cast("decimal(25,6)"))
                .cast("double")
                .alias("v")
            )
        )

    cut = F.lit(f"{_CUT} 00:00:00").cast("timestamp")
    qe = _quintile(
        half(F.col("ts") < cut), "v", _VAL_BLOCK, "q_early"
    )
    ql = _quintile(
        half(F.col("ts") >= cut), "v", _VAL_BLOCK, "q_late"
    )
    return (
        qe.select("user_id", "q_early")
        .join(ql.select("user_id", "q_late"), "user_id")
        .groupBy("q_early", "q_late")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("q_early", "q_late")
    )


@register(
    "q_seq_path_trigrams",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS t2,
             lead(event_type, 2) OVER w AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type AS t1, t2, t3,
           CAST(count(*) AS BIGINT) AS n_paths
    FROM seq WHERE t2 IS NOT NULL AND t3 IS NOT NULL
    GROUP BY event_type, t2, t3
    ORDER BY n_paths DESC, t1, t2, t3
    """,
)
def q_seq_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-path trigram mining: every consecutive
    (t₁ → t₂ → t₃) triple of event types along each user's
    (ts, event_id)-ordered stream, counted across users — the raw
    material for Sankey/path-drop-off views and the empirical prior a
    next-event model starts from (the 3-gram twin of
    q_ts_markov_transitions' 2-gram matrix). Output is ≤|type|³ rows,
    most-frequent first with a full lexicographic tie-break.

    Plan: two leads over the per-USER window (bounded by one user's
    activity, the sessionize discipline — never a global sort) feed
    one hash aggregate onto the ≤125-row trigram frame; the final
    sort is segment-cardinality sized. Determinism: pure integer
    counts over an exact total order."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t2").isNotNull() & F.col("t3").isNotNull())
    return (
        seq.groupBy("t1", "t2", "t3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_paths"))
        .orderBy(F.col("n_paths").desc(), "t1", "t2", "t3")
    )


# Kaplan-Meier duration grid blocking (durations live on the <=720
# whole-hour grid of the events month).
_KM_BLOCK = 100.0


@register(
    "q_agg_survival_km",
    oracle="""
    WITH life AS (
      SELECT user_id,
             min(ts) AS t0,
             max(ts) AS t_last,
             min(CASE WHEN event_type = 'error' THEN ts END) AS t_err
      FROM events GROUP BY user_id
    ),
    dur AS (
      SELECT user_id,
             CAST(floor(date_diff('second', t0, coalesce(t_err, t_last))
                        / 3600.0) AS BIGINT) AS dur_h,
             CAST(CASE WHEN t_err IS NOT NULL THEN 1 ELSE 0 END
                  AS BIGINT) AS ev
      FROM life
    ),
    grid AS (
      SELECT dur_h,
             CAST(count(*) AS BIGINT) AS a,
             CAST(sum(ev) AS BIGINT) AS d
      FROM dur GROUP BY dur_h
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dur),
    cum AS (
      SELECT dur_h, a, d,
             CAST(sum(a) OVER (ORDER BY dur_h
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS ca,
             n
      FROM grid CROSS JOIN tot
    ),
    risk AS (
      SELECT dur_h, a, d, n - (ca - a) AS n_risk FROM cum
    ),
    terms AS (
      SELECT dur_h, a, d, n_risk,
             CASE WHEN d = 0 THEN CAST(0 AS BIGINT)
                  WHEN d = n_risk THEN NULL
                  ELSE CAST(floor(ln(CAST(n_risk - d AS DOUBLE)
                                     / n_risk) * 1000000.0 - 0.5 + 1.0)
                            AS BIGINT) END AS lnt_u,
             CASE WHEN d = n_risk THEN 1 ELSE 0 END AS zero_flag
      FROM risk
    ),
    surv AS (
      SELECT dur_h, d, n_risk, a - d AS n_censored_at,
             CAST(sum(coalesce(lnt_u, 0)) OVER (ORDER BY dur_h
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS lsum_u,
             CAST(sum(zero_flag) OVER (ORDER BY dur_h
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS zf
      FROM terms
    )
    SELECT dur_h, n_risk, d AS n_events, n_censored_at,
           CASE WHEN zf > 0 THEN 0.0
                ELSE floor(exp(CAST(lsum_u AS DOUBLE) / 1000000.0)
                           * 1000000.0 + 0.5) / 1000000.0
           END AS survival
    FROM surv WHERE d > 0
    """,
)
def q_agg_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve for time-to-first-error per user:
    duration = whole hours from a user's first event to their first
    'error' (right-censored at their last observed event when no error
    ever occurs); S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) over event times with
    the risk set nᵢ = users whose duration ≥ tᵢ (censored users count
    while at risk — the estimator's whole point; naive "error rate
    among finished users" is biased). The standard reliability /
    churn-curve readout. One row per event time.

    Plan: one hash aggregate collapses events to per-user lifetimes,
    a second onto the ≤720-row whole-hour duration grid — everything
    after is time-grain bounded (the cumulative windows run over the
    GRID, via the blocked prefix fold, no global data-sized window).
    Determinism: risk/event counts are exact integers; each KM factor
    enters as a TOWARD-MINUS-INFINITY e6-rounded ln (floor(x·1e6 −
    0.5 + 1)/1e6 ≡ ceil-adjusted — rounding the NEGATIVE ln with the
    same dround convention both sides), carried as exact BIGINT
    micro-nats through the prefix fold (integer cumulative sums — no
    double summation order anywhere);
    the closing exp (the only other libm) is e6-rounded; the d = n
    absorbing state (survival exactly 0, where ln diverges) rides an
    integer cumulative flag."""
    e = load_table(spark, sf_dir, "events")
    life = e.groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        F.max("ts").alias("t_last"),
        F.min(
            F.when(F.col("event_type") == "error", F.col("ts"))
        ).alias("t_err"),
    )
    dur = life.select(
        F.floor(
            (
                F.unix_timestamp(F.coalesce("t_err", "t_last"))
                - F.unix_timestamp("t0")
            )
            / 3600.0
        )
        .cast("bigint")
        .alias("dur_h"),
        F.when(F.col("t_err").isNotNull(), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("ev"),
    )
    grid = dur.groupBy("dur_h").agg(
        F.count(F.lit(1)).cast("bigint").alias("a"),
        F.sum("ev").cast("bigint").alias("d"),
    ).localCheckpoint(eager=False)  # totals + two prefix passes: the
    # bounded grid frame is computed once
    tot = grid.agg(F.sum("a").cast("bigint").alias("n"))
    blocked = grid.withColumn(
        "blk", F.floor(F.col("dur_h") / F.lit(_KM_BLOCK))
    )
    nr, d = F.col("n_risk"), F.col("d")
    ranked = running_totals_blocked(
        blocked,
        order_cols=["dur_h"],
        block_cols=["blk"],
        sum_cols={"a": "ca"},
    ).crossJoin(F.broadcast(tot)).select(
        "dur_h",
        "a",
        "d",
        "blk",
        (F.col("n") - (F.col("ca") - F.col("a"))).alias("n_risk"),
    )
    # toward-minus-infinity e6 rounding of the negative ln (the dround
    # convention floor(x*1e6+0.5) mirrored for the magnitude): both
    # engines compute floor(ln*1e6 - 0.5 + 1)/1e6.
    lnt = (
        F.when(d == 0, F.lit(0).cast("bigint"))
        .when(d == F.col("n_risk"), F.lit(None).cast("bigint"))
        .otherwise(
            F.floor(
                F.log((nr - d).cast("double") / nr) * 1000000.0
                - 0.5
                + 1.0
            ).cast("bigint")
        )
    )
    terms = ranked.select(
        "dur_h",
        "a",
        "d",
        "blk",
        "n_risk",
        lnt.alias("lnt_u"),
        F.when(d == nr, 1).otherwise(0).alias("zero_flag"),
        # r16: the second blocked-prefix pass consumes this frame TWICE
        # (its local window + its offsets probe) — pin it so the first
        # prefix pass's window + offsets join is not re-executed per
        # consumer (same reason grid above is checkpointed).
    ).localCheckpoint(eager=False)
    cum = running_totals_blocked(
        terms.select(
            "dur_h",
            "a",
            "d",
            "blk",
            "n_risk",
            F.coalesce("lnt_u", F.lit(0).cast("bigint")).alias(
                "lnt_u"
            ),
            "zero_flag",
        ),
        order_cols=["dur_h"],
        block_cols=["blk"],
        sum_cols={"lnt_u": "lsum_u", "zero_flag": "zf"},
    )
    return (
        cum.filter(F.col("d") > 0)
        .select(
            "dur_h",
            "n_risk",
            F.col("d").alias("n_events"),
            (F.col("a") - F.col("d")).alias("n_censored_at"),
            F.when(F.col("zf") > 0, F.lit(0.0))
            .otherwise(
                F.floor(
                    F.exp(
                        F.col("lsum_u").cast("double") / 1000000.0
                    )
                    * 1000000.0
                    + 0.5
                )
                / 1000000.0
            )
            .alias("survival"),
        )
    )


@register(
    "q_agg_new_vs_returning",
    oracle="""
    WITH fs AS (
      SELECT user_id, CAST(min(ts) AS DATE) AS first_day
      FROM events GROUP BY user_id
    ),
    act AS (
      SELECT CAST(ts AS DATE) AS day, user_id
      FROM events GROUP BY 1, 2
    )
    SELECT a.day,
           CAST(count(*) AS BIGINT) AS active_users,
           CAST(sum(CASE WHEN f.first_day = a.day THEN 1 ELSE 0 END)
                AS BIGINT) AS new_users,
           CAST(sum(CASE WHEN f.first_day < a.day THEN 1 ELSE 0 END)
                AS BIGINT) AS returning_users
    FROM act a JOIN fs f ON f.user_id = a.user_id
    GROUP BY a.day ORDER BY a.day
    """,
)
def q_agg_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning user split: a user is NEW on the day of
    their first-ever event and RETURNING on every later active day —
    the growth-accounting decomposition (is today's traffic
    acquisition or retention?) every product dashboard leads with.

    Plan: two hash aggregates (per-user first day; distinct active
    (day, user) pairs) and one user-keyed shuffle join — both sides
    user-scale, far below event volume; the output is |days| rows.
    First-seen is computed over ALL history, so the plan's state is
    the per-user frame, not a window. Determinism: pure integer
    counts over exact date casts."""
    e = load_table(spark, sf_dir, "events")
    fs = e.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("first_day")
    )
    act = (
        e.select(F.col("ts").cast("date").alias("day"), "user_id")
        .distinct()
    )
    return (
        act.join(fs, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("active_users"),
            F.sum(
                F.when(F.col("first_day") == F.col("day"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("new_users"),
            F.sum(
                F.when(F.col("first_day") < F.col("day"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("returning_users"),
        )
        .orderBy("day")
    )


@register(
    "q_agg_dau_wau_stickiness",
    oracle="""
    WITH dau AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(count(DISTINCT user_id) AS BIGINT) AS dau
      FROM events GROUP BY 1
    ),
    wau AS (
      SELECT CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS week,
             CAST(count(DISTINCT user_id) AS BIGINT) AS wau
      FROM events GROUP BY 1
    )
    SELECT d.day, d.dau, w.wau,
           CAST(d.dau AS DOUBLE) / w.wau AS stickiness
    FROM dau d
    JOIN wau w
      ON w.week = CAST(date_trunc('week', d.day) AS DATE)
    ORDER BY d.day
    """,
)
def q_agg_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per day: daily active users over the active
    users of the day's ISO calendar week — the engagement-frequency
    ratio ("of this week's users, what share shows up on a given
    day?") that separates a daily habit from a weekly chore. Calendar
    weeks (not trailing windows) keep both sides a plain hash
    aggregate — the trailing-window variant is the
    q_win_sliding_distinct machinery.

    Plan: two count-distinct hash aggregates at different calendar
    grains joined on the week key — |days| rows out; distinct-count
    state is per-grain user sets handled by Spark's partial
    aggregation, no window anywhere. Determinism: integer counts,
    one exact double division; Spark's date_trunc('week') and
    DuckDB's agree on ISO Monday weeks."""
    e = load_table(spark, sf_dir, "events")
    dau = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.countDistinct("user_id").cast("bigint").alias("dau")
    )
    wau = e.groupBy(
        F.date_trunc("week", F.col("ts").cast("date"))
        .cast("date")
        .alias("week")
    ).agg(F.countDistinct("user_id").cast("bigint").alias("wau"))
    return (
        dau.withColumn(
            "week", F.date_trunc("week", F.col("day")).cast("date")
        )
        .join(F.broadcast(wau), "week")
        .select(
            "day",
            "dau",
            "wau",
            (F.col("dau").cast("double") / F.col("wau")).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )


@register(
    "q_ts_entropy_rate",
    oracle="""
    WITH seq AS (
      SELECT event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    pairs AS (
      SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n_trans
      FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ),
    outs AS (
      SELECT cur, CAST(sum(n_trans) AS BIGINT) AS n_out
      FROM pairs GROUP BY cur
    ),
    tot AS (SELECT CAST(sum(n_trans) AS BIGINT) AS n FROM pairs),
    terms AS (
      SELECT p.cur, p.n_trans, o.n_out, t.n,
             (CAST(o.n_out AS DOUBLE) / t.n)
               * (CAST(p.n_trans AS DOUBLE) / o.n_out)
               * (floor(ln(CAST(p.n_trans AS DOUBLE) / o.n_out)
                        * 1000000.0 - 0.5 + 1.0) / 1000000.0) AS h_term
      FROM pairs p JOIN outs o ON p.cur = o.cur CROSS JOIN tot t
    )
    SELECT CAST(max(n) AS BIGINT) AS n_transitions,
           CAST(count(*) AS BIGINT) AS n_cells,
           floor(-CAST(sum(CAST(h_term AS DECIMAL(25,9))) AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS entropy_rate_nats
    FROM terms
    """,
)
def q_ts_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the first-order behavior Markov chain:
    H = −Σ_s π̂(s) Σ_t P(t|s) ln P(t|s) with the empirical source
    distribution π̂(s) = out-transitions(s)/N — the single-number
    "how predictable is the next user action?" summary of
    q_ts_markov_transitions' matrix (ln|types| ≈ 1.61 nats = fully
    random; near 0 = deterministic flows), the metric to watch for
    bot traffic (entropy collapses) or UI regressions (entropy
    spikes).

    Plan: the same per-user lead window and (cur, nxt) hash aggregate
    as the transition matrix; the closing is one aggregate over the
    ≤|types|² cells. Determinism: probabilities are exact integer
    ratios; each ln is e6-rounded toward −∞ (the KM convention for
    negative logs); the per-cell products sum through decimal(25,9)
    (terms are < 1e0 with e6-grid factors — scale 9 keeps the
    3-factor product exact enough that both engines quantize
    identically) and the final sign-flip is e6-rounded."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    pairs = seq.groupBy("cur", "nxt").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_trans")
    ).localCheckpoint(eager=False)  # outs + total + terms: one pass
    outs = pairs.groupBy("cur").agg(
        F.sum("n_trans").cast("bigint").alias("n_out")
    )
    tot = pairs.agg(F.sum("n_trans").cast("bigint").alias("n"))
    p_cond = F.col("n_trans").cast("double") / F.col("n_out")
    h_term = (
        (F.col("n_out").cast("double") / F.col("n"))
        * p_cond
        * (
            F.floor(F.log(p_cond) * 1000000.0 - 0.5 + 1.0)
            / 1000000.0
        )
    )
    terms = (
        pairs.join(F.broadcast(outs), "cur")
        .crossJoin(F.broadcast(tot))
        .select("n_trans", "n_out", "n", h_term.alias("h_term"))
    )
    return terms.agg(
        F.max("n").cast("bigint").alias("n_transitions"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        (
            F.floor(
                -F.sum(F.col("h_term").cast("decimal(25,9)")).cast(
                    "double"
                )
                * 1000000.0
                + 0.5
            )
            / 1000000.0
        ).alias("entropy_rate_nats"),
    )


@register(
    "q_agg_cohort_ltv",
    oracle="""
    WITH first_seen AS (
      SELECT user_id,
             CAST(date_trunc('week', CAST(min(ts) AS DATE)) AS DATE)
               AS cohort_week
      FROM events GROUP BY user_id
    ),
    sizes AS (
      SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_users
      FROM first_seen GROUP BY cohort_week
    ),
    weekly AS (
      SELECT f.cohort_week,
             CAST(date_diff('week', f.cohort_week,
                    CAST(date_trunc('week', CAST(e.ts AS DATE)) AS DATE))
                  AS BIGINT) AS age_weeks,
             CAST(sum(CAST(e.value AS DECIMAL(25,6))) AS DECIMAL(25,6))
               AS rev
      FROM events e JOIN first_seen f ON f.user_id = e.user_id
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT cohort_week, age_weeks,
             CAST(sum(rev) OVER (PARTITION BY cohort_week
                                 ORDER BY age_weeks
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS DOUBLE) AS cum_rev
      FROM weekly
    )
    SELECT c.cohort_week, c.age_weeks, s.cohort_users, c.cum_rev,
           c.cum_rev / s.cohort_users AS ltv_per_user
    FROM cum c JOIN sizes s USING (cohort_week)
    ORDER BY cohort_week, age_weeks
    """,
)
def q_agg_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curve: users cohorted by first-seen ISO week; for
    each (cohort, weeks-since-first-seen) cell, the CUMULATIVE value
    generated so far divided by cohort size — the lifetime-value
    triangle finance reads payback periods from (q_cohort_retention's
    revenue twin: that one counts active users, this one accumulates
    value).

    Plan: per-user first-seen aggregate, user-keyed join back (user
    scale), hash aggregate onto the (cohort, age) grid — |weeks|²/2
    cells, time-grain bounded — then the cumulative sum runs over ≤
    |weeks| rows per cohort partition. Determinism: revenue stays in
    EXACT decimal through both the cell aggregate AND the running
    window (decimal window sums are order-insensitive), cast to
    double only at output; the per-user division is one deterministic
    double op."""
    e = load_table(spark, sf_dir, "events")
    fs = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts").cast("date"))
        .cast("date")
        .alias("cohort_week")
    )  # wave-9 pin A/B-tested and REVERTED (0.56 unpinned vs 0.73
    # pinned in the calm tiebreak)
    sizes = fs.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_users")
    )
    weekly = (
        e.join(fs, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts").cast("date")).cast(
                        "date"
                    ),
                    F.col("cohort_week"),
                )
                / 7
            )
            .cast("bigint")
            .alias("age_weeks"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(25,6)"))
            .cast("decimal(25,6)")
            .alias("rev")
        )
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("age_weeks")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = weekly.select(
        "cohort_week",
        "age_weeks",
        F.sum("rev").over(w).cast("double").alias("cum_rev"),
    )
    return (
        cum.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "age_weeks",
            "cohort_users",
            "cum_rev",
            (F.col("cum_rev") / F.col("cohort_users")).alias(
                "ltv_per_user"
            ),
        )
        .orderBy("cohort_week", "age_weeks")
    )


# Naive-forecast backtest: seasonal lag in hours (the daily cycle).
_BT_LAG = 24


@register(
    "q_ts_backtest_naive",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_id,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    f AS (
      SELECT a.event_type, a.hour_id, a.y, b.y AS yhat
      FROM hourly a
      JOIN hourly b ON b.event_type = a.event_type
                   AND b.hour_id = a.hour_id - {_BT_LAG}
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_forecasts,
           CAST(sum(abs(y - yhat)) AS BIGINT) AS sum_abs_err,
           CAST(sum(abs(y - yhat)) AS DOUBLE) / count(*) AS mae,
           floor(CAST(sum(CASE WHEN y > 0
                         THEN CAST(CAST(abs(y - yhat) AS DOUBLE) / y
                                   AS DECIMAL(25,12))
                         ELSE NULL END) AS DOUBLE)
             / sum(CASE WHEN y > 0 THEN 1 ELSE 0 END)
             * 1000000.0 + 0.5) / 1000000.0 AS mape,
           CAST(sum((y - yhat) * (y - yhat)) AS BIGINT) AS sum_sq_err
    FROM f GROUP BY event_type ORDER BY event_type
    """,
)
def q_ts_backtest_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest per event type: predict each
    hour's event count with the same hour yesterday (ŷ(t) = y(t−24))
    and score MAE / MAPE / squared error over every hour where both
    sides exist — the mandatory BASELINE row of any forecasting
    evaluation (a model that can't beat seasonal-naive is noise), and
    the capacity-planning sanity check for how repeatable the daily
    cycle actually is.

    Plan: one hash aggregate to the hourly grain, one self-join on
    (type, hour−24) — both sides time-grain bounded — and one closing
    aggregate. Determinism: errors are exact integers; MAPE's
    per-row ratio is ONE deterministic double division quantized to
    decimal(25,12) before the order-insensitive sum (a decimal/bigint
    division lands on engine-specific result scales, and scale 15
    pushes the summed unscaled value past 2^53 where DuckDB's
    decimal→double cast double-rounds — both measured) and the
    closing mean is e6-rounded and zero-actual hours are
    excluded from MAPE on both sides."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600)
        .cast("bigint")
        .alias("hour_id"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y")).localCheckpoint(
        eager=False
    )  # both join sides: one scan
    b = hourly.select(
        F.col("event_type").alias("bt"),
        F.col("hour_id").alias("bh"),
        F.col("y").alias("yhat"),
    )
    f = hourly.join(
        b,
        (F.col("bt") == F.col("event_type"))
        & (F.col("bh") == F.col("hour_id") - _BT_LAG),
    )
    err = F.abs(F.col("y") - F.col("yhat"))
    return (
        f.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_forecasts"),
            F.sum(err).cast("bigint").alias("sum_abs_err"),
            (F.sum(err).cast("double") / F.count(F.lit(1))).alias("mae"),
            (
                F.floor(
                    F.sum(
                        F.when(
                            F.col("y") > 0,
                            (err.cast("double") / F.col("y")).cast(
                                "decimal(25,12)"
                            ),
                        )
                    ).cast("double")
                    / F.sum(F.when(F.col("y") > 0, 1).otherwise(0))
                    * 1000000.0
                    + 0.5
                )
                / 1000000.0
            ).alias("mape"),
            F.sum(
                (F.col("y") - F.col("yhat"))
                * (F.col("y") - F.col("yhat"))
            )
            .cast("bigint")
            .alias("sum_sq_err"),
        )
        .orderBy("event_type")
    )


@register(
    "q_seq_next_event_accuracy",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, ts, event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    train AS (
      SELECT cur, nxt, CAST(count(*) AS BIGINT) AS cnt
      FROM seq
      WHERE nxt IS NOT NULL AND ts < CAST('{_CUT} 00:00:00' AS TIMESTAMP)
      GROUP BY cur, nxt
    ),
    pred AS (
      SELECT cur, nxt AS predicted, cnt AS n_train_top,
             row_number() OVER (PARTITION BY cur
                                ORDER BY cnt DESC, nxt ASC) AS rn
      FROM train
    ),
    trn_tot AS (
      SELECT cur, CAST(sum(cnt) AS BIGINT) AS n_train FROM train
      GROUP BY cur
    ),
    eval AS (
      SELECT cur, nxt FROM seq
      WHERE nxt IS NOT NULL
        AND ts >= CAST('{_CUT} 00:00:00' AS TIMESTAMP)
    )
    SELECT e.cur AS event_type, p.predicted, t.n_train,
           CAST(count(*) AS BIGINT) AS n_eval,
           CAST(sum(CASE WHEN e.nxt = p.predicted THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           {sql_dround(
               "CAST(sum(CASE WHEN e.nxt = p.predicted THEN 1 ELSE 0"
               " END) AS DOUBLE) / count(*)", 6)} AS accuracy
    FROM eval e
    JOIN (SELECT cur, predicted FROM pred WHERE rn = 1) p
      ON e.cur = p.cur
    JOIN trn_tot t ON e.cur = t.cur
    GROUP BY e.cur, p.predicted, t.n_train
    """,
)
def q_seq_next_event_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical next-event-prediction eval: train a majority-vote
    transition model on the month's FIRST half (per current type, the
    most frequent next type along each user's (ts, event_id)-ordered
    stream, ties broken lexicographically) and score its top-1
    accuracy on the second half — the honest train/test readout of
    how predictable the event stream is, one level above
    q_ts_markov_transitions' raw matrix (which describes, but never
    scores, the model). A transition whose current event predates the
    cut trains even when its successor lands after it (the boundary
    transition belongs to its origin).

    Plan: one lead over the per-USER window (bounded by one user's
    activity, the q_seq_path_trigrams discipline), a ≤|types|² hash
    aggregate for the model, a row_number over the ≤|types| rows per
    current type, and a broadcast join of the tiny model onto the
    eval half. Current types never seen in training are dropped (no
    model exists — an inner join on both sides). Determinism: integer
    counts, a deterministic (count DESC, type ASC) argmax, one
    e6-rounded closing ratio."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "ts",
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    cut = F.lit(f"{_CUT} 00:00:00").cast("timestamp")
    train = (
        seq.filter(F.col("ts") < cut)
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        # wave-9 pin A/B-tested and REVERTED (0.86 unpinned vs 0.91
        # pinned; the duplicated lead-window subtrees overlap)
    )
    wp = Window.partitionBy("cur").orderBy(
        F.col("cnt").desc(), F.col("nxt").asc()
    )
    pred = (
        train.select(
            "cur",
            F.col("nxt").alias("predicted"),
            F.row_number().over(wp).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select("cur", "predicted")
    )
    trn_tot = train.groupBy("cur").agg(
        F.sum("cnt").cast("bigint").alias("n_train")
    )
    ev = seq.filter(F.col("ts") >= cut).select("cur", "nxt")
    correct = F.sum(
        F.when(F.col("nxt") == F.col("predicted"), 1).otherwise(0)
    ).cast("bigint")
    return (
        ev.join(F.broadcast(pred), "cur")
        .join(F.broadcast(trn_tot), "cur")
        .groupBy(
            F.col("cur").alias("event_type"), "predicted", "n_train"
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_eval"),
            correct.alias("n_correct"),
            dround(
                F.sum(
                    F.when(F.col("nxt") == F.col("predicted"), 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("accuracy"),
        )
    )
