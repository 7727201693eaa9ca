"""Markov-chain convergence analytics on the user-behavior transition
matrix: the stationary distribution reached by a FIXED number of
power-iteration steps from the uniform start, compared against the
empirical state occupancy — "where does user behavior settle if the
observed dynamics keep running", the long-run companion to
q_ts_markov_transitions' one-step matrix (and the same
fixed-round-count iteration discipline as q_llm_graph_pagerank).

Plan discipline: event volume collapses ONCE to the ≤ |types|²
transition-count frame (one per-user lead window — distributed,
one row per user partition); every power-iteration step is a
broadcast join of a |types|-row vector against that bounded matrix.
Eight steps = eight tiny stages, data-volume invariant.

Determinism: P(next|cur) entries are single exact IEEE divisions of
integer counts; each step's products are e12-rounded before their
decimal(38,12) sums and the updated vector is e6-rounded — both
engines walk the identical rounded trajectory, so the fixed point of
the FINITE iteration is bit-identical (the PageRank convention).

Reference parity note: the reference engine (an Elixir
event-transport client, SURVEY.md §0) has no analytics surface; this
derives from the driver's analytics mandate and standard Markov-chain
practice (power iteration toward the Perron vector).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table
from ex_hivent_spark.functions.decimals import dround, sql_dround
from ex_hivent_spark.plans.registry import register

# Fixed power-iteration round count (the q_llm_graph_pagerank
# convention: a literal round budget, never a data-dependent
# convergence test).
_POWER_STEPS = 8


def _sql_stationary() -> str:
    """Chained-CTE oracle: s0 = uniform, s_{t+1} = e6(s_t · P)."""
    steps = []
    for t in range(_POWER_STEPS):
        steps.append(
            f"""s{t + 1} AS (
      SELECT p.nxt AS state,
             {sql_dround(
                 "CAST(sum(CAST("
                 + sql_dround("s.pi * p.p_cond", 12)
                 + " AS DECIMAL(38,12))) AS DOUBLE)", 6,
             )} AS pi
      FROM s{t} s JOIN p ON s.state = p.cur
      GROUP BY p.nxt
    )"""
        )
    chain = ",\n    ".join(steps)
    return f"""
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
    p AS (
      SELECT p.cur, p.nxt,
             CAST(p.n_trans AS DOUBLE) / o.n_out AS p_cond
      FROM pairs p JOIN outs o ON p.cur = o.cur
    ),
    k AS (SELECT CAST(count(*) AS BIGINT) AS k FROM outs),
    s0 AS (
      SELECT cur AS state, 1.0 / k AS pi FROM outs CROSS JOIN k
    ),
    {chain},
    emp AS (
      SELECT o.cur AS state,
             CAST(o.n_out AS DOUBLE) / t.n AS pi_emp
      FROM outs o CROSS JOIN
           (SELECT CAST(sum(n_out) AS BIGINT) AS n FROM outs) t
    )
    SELECT s.state, {sql_dround("s.pi", 6)} AS pi_stat,
           {sql_dround("e.pi_emp", 6)} AS pi_emp,
           {sql_dround("abs(s.pi - e.pi_emp)", 6)} AS gap
    FROM s{_POWER_STEPS} s JOIN emp e ON s.state = e.state
    """


@register("q_seq_markov_stationary", oracle=_sql_stationary())
def q_seq_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary behavior distribution: 8 power-iteration steps of
    pi ← pi·P from the uniform start over the user-sequence transition
    matrix P(next|cur), reported next to the empirical state occupancy
    (each state's share of outgoing transitions) and their absolute
    gap. For an ergodic behavior chain the two nearly coincide; a
    large gap flags states whose observed occupancy is transient
    (entry/exit states) rather than recurrent.

    Plan: one per-user lead window + hash aggregate collapses the
    stream to the ≤ |types|² transition-count matrix — that part is
    the 100 TB work and stays fully distributed. The matrix itself is
    then COLLECTED (bounded by construction: |event types|² rows,
    ~25 here — the repo's ≤16-row-codebook precedent) and the 8 power
    steps run driver-side as exact scalar arithmetic: distributing 8
    joins over a ≤|types|-row vector was pure per-stage overhead
    (r11 anchor: 3.4x the oracle at sf0.1; the iteration is
    data-volume invariant either way).

    Determinism: the driver loop replicates the engines' rounded
    trajectory BIT-EXACTLY — matrix entries are single correctly-
    rounded double divisions (Python's int/int matches), per-step
    products are e12-rounded (floor(x*1e12+0.5) is exact integer
    arithmetic below 2^53), summed as exact integers (the
    decimal(38,12) sum's integer core), cast back via one correctly-
    rounded division, and the vector re-rounds at e6 — the identical
    trajectory the chained-CTE oracle walks.

    Semantics note (deliberate truncation): states that appear only
    as a SUCCESSOR (no outgoing transitions → no P row) absorb mass
    that the next vector⋈matrix step then drops, so pi_stat need not
    sum to 1 when sink states exist — it is the distribution over
    RECURRENT (outgoing-capable) states under absorbing-state
    truncation, not a renormalized proper distribution. The oracle
    applies the identical truncation; renormalizing would hide how
    much mass drains into sinks, which the gap column is there to
    show."""
    import math

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    )
    pairs = (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_trans"))
    )
    rows = pairs.collect()  # ≤ |event types|² rows — bounded

    n_out: dict[str, int] = {}
    for r in rows:
        n_out[r["cur"]] = n_out.get(r["cur"], 0) + r["n_trans"]
    p = {
        (r["cur"], r["nxt"]): r["n_trans"] / n_out[r["cur"]] for r in rows
    }
    k = len(n_out)

    def r6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    pi = {s: 1.0 / k for s in n_out}
    for _ in range(_POWER_STEPS):
        acc: dict[str, int] = {}  # nxt -> exact sum of e12 units
        for (cur, nxt), pc in p.items():
            if cur in pi:
                t = pi[cur] * pc
                acc[nxt] = acc.get(nxt, 0) + int(
                    math.floor(t * 1e12 + 0.5)
                )
        pi = {s: r6(v / 10**12) for s, v in acc.items()}

    total = sum(n_out.values())
    out_rows = [
        (
            s,
            r6(pi[s]),
            r6(n_out[s] / total),
            r6(abs(pi[s] - n_out[s] / total)),
        )
        for s in n_out
        if s in pi
    ]
    return spark.createDataFrame(
        out_rows, "state string, pi_stat double, pi_emp double, gap double"
    )


@register(
    "q_graph_reciprocity",
    oracle="""
    WITH seq AS (
      SELECT event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    pairs AS (
      SELECT cur, nxt, CAST(count(*) AS BIGINT) AS c
      FROM seq WHERE nxt IS NOT NULL AND nxt <> cur GROUP BY cur, nxt
    ),
    m AS (
      SELECT a.cur, a.nxt, a.c,
             CAST(coalesce(b.c, 0) AS BIGINT) AS c_rev
      FROM pairs a LEFT JOIN pairs b
        ON a.cur = b.nxt AND a.nxt = b.cur
    )
    SELECT CAST(sum(c) AS BIGINT) AS n_directed,
           CAST(sum(least(c, c_rev)) AS BIGINT) AS n_reciprocated,
           floor(CAST(sum(least(c, c_rev)) AS DOUBLE) / sum(c)
                 * 1000000.0 + 0.5) / 1000000.0 AS reciprocity
    FROM m
    """,
)
def q_graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted reciprocity of the behavior transition digraph
    (self-loops excluded): Σ min(c_ij, c_ji) / Σ c_ij over the
    off-diagonal transition counts — 1 when every A→B flow is matched
    by an equal B→A backflow, →0 for one-way funnels. The
    flow-symmetry companion to q_seq_markov_stationary: low
    reciprocity with a skewed stationary vector is the signature of a
    directed funnel rather than a browsing loop.

    Plan: the q_ts_markov_transitions lead window + hash aggregate
    collapses the stream to ≤ |types|² counts; the reverse-edge
    lookup is one broadcast self-join of that bounded frame; the
    closing is a one-row integer aggregate. Determinism: pure integer
    min/sum arithmetic with a single e6-rounded closing ratio."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    )
    pairs = (
        seq.filter(
            F.col("nxt").isNotNull() & (F.col("nxt") != F.col("cur"))
        )
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=False)  # both join sides: one pass
    )
    rev = pairs.select(
        F.col("cur").alias("r_nxt"),
        F.col("nxt").alias("r_cur"),
        F.col("c").alias("c_rev"),
    )
    m = pairs.join(
        F.broadcast(rev),
        (F.col("cur") == F.col("r_cur")) & (F.col("nxt") == F.col("r_nxt")),
        "left",
    ).select(
        "c", F.coalesce(F.col("c_rev"), F.lit(0)).cast("bigint").alias("c_rev")
    )
    return m.agg(
        F.sum("c").cast("bigint").alias("n_directed"),
        F.sum(F.least(F.col("c"), F.col("c_rev")))
        .cast("bigint")
        .alias("n_reciprocated"),
        dround(
            F.sum(F.least(F.col("c"), F.col("c_rev"))).cast("double")
            / F.sum("c"),
            6,
        ).alias("reciprocity"),
    )


@register(
    "q_stats_bowker_symmetry",
    oracle=f"""
    WITH seq AS (
      SELECT event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    pairs AS (
      SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE nxt IS NOT NULL AND nxt <> cur
      GROUP BY cur, nxt
    ),
    und AS (
      SELECT least(cur, nxt) AS a, greatest(cur, nxt) AS b,
             CAST(sum(CASE WHEN cur < nxt THEN n ELSE 0 END)
                  AS BIGINT) AS n_fwd,
             CAST(sum(CASE WHEN cur > nxt THEN n ELSE 0 END)
                  AS BIGINT) AS n_bwd
      FROM pairs GROUP BY 1, 2
    )
    SELECT a, b, n_fwd, n_bwd,
           {sql_dround(
               "CAST(n_fwd - n_bwd AS DOUBLE) * (n_fwd - n_bwd)"
               " / (n_fwd + n_bwd)", 6)} AS chi2_term
    FROM und
    """,
)
def q_stats_bowker_symmetry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bowker's symmetry decomposition on the user-sequence transition
    matrix: for every unordered type pair {a,b}, the a→b vs b→a
    transition counts and the McNemar-style χ² term
    (n_ab−n_ba)²/(n_ab+n_ba) — summed over pairs this is Bowker's
    statistic on df = #pairs, and PER PAIR it pinpoints exactly which
    flows are one-way (view→purchase ≫ purchase→view is healthy;
    asymmetric error→signup is an incident signature). The hypothesis-
    test companion to q_graph_reciprocity's single ratio.

    Plan: one lead pass partitioned BY USER (the q_seq_dwell_matrix
    class), one hash aggregate to ≤|types|² cells, one fold to
    ≤|types|²/2 unordered pairs — the conditional-sum trick (least/
    greatest keys) replaces a matrix self-join entirely. Determinism:
    counts are exact BIGINTs; each χ² term casts the difference to
    DOUBLE once and e6-rounds after one multiply and one divide (the
    denominator is positive by construction — a pair only exists when
    at least one direction was observed)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull() & (F.col("nxt") != F.col("cur")))
    pairs = seq.groupBy("cur", "nxt").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    und = pairs.groupBy(
        F.least("cur", "nxt").alias("a"),
        F.greatest("cur", "nxt").alias("b"),
    ).agg(
        F.sum(F.when(F.col("cur") < F.col("nxt"), F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("n_fwd"),
        F.sum(F.when(F.col("cur") > F.col("nxt"), F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("n_bwd"),
    )
    diff = F.col("n_fwd") - F.col("n_bwd")
    return und.select(
        "a",
        "b",
        "n_fwd",
        "n_bwd",
        dround(
            diff.cast("double") * diff / (F.col("n_fwd") + F.col("n_bwd")),
            6,
        ).alias("chi2_term"),
    )


_SQL_TRANS_CTES = """
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
    p AS (
      SELECT p.cur, p.nxt,
             CAST(p.n_trans AS DOUBLE) / o.n_out AS pc
      FROM pairs p JOIN outs o ON p.cur = o.cur
    )
"""


@register(
    "q_seq_markov_entropy_rate",
    oracle=_SQL_TRANS_CTES
    + f""",
    terms AS (
      SELECT cur,
             {sql_dround("pc * (" + sql_dround("ln(pc)", 6) + ")", 6)}
               AS term
      FROM p
    ),
    h AS (
      SELECT cur,
             {sql_dround(
                 "-CAST(sum(CAST(term AS DECIMAL(25,6))) AS DOUBLE)", 6,
             )} AS h_state
      FROM terms GROUP BY cur
    ),
    tot AS (SELECT CAST(sum(n_out) AS BIGINT) AS n FROM outs),
    base AS (
      SELECT o.cur AS state, o.n_out, h.h_state,
             {sql_dround("CAST(o.n_out AS DOUBLE) / t.n", 6)} AS pi_emp
      FROM outs o JOIN h ON h.cur = o.cur CROSS JOIN tot t
    )
    SELECT state, n_out, h_state, pi_emp,
           {sql_dround("pi_emp * h_state", 6)} AS contrib
    FROM base
    """,
)
def q_seq_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the user-behavior Markov chain, per state: the
    conditional next-step entropy H(cur) = −Σ P(nxt|cur)·ln P(nxt|cur)
    of each state's outgoing row, its empirical occupancy share, and
    the occupancy-weighted contribution — Σ contrib is the chain's
    empirical entropy rate (Shannon/Cover-Thomas), the predictability
    readout next to q_seq_markov_stationary's long-run distribution:
    low-entropy states are where next-event prediction (and prefetch)
    pays; a rising rate is behavioral drift.

    Plan: event volume collapses ONCE to the ≤|types|² transition
    matrix (the markov_stationary lead-window + hash aggregate); every
    later stage runs on ≤|types| rows. Determinism: P entries are
    single exact IEEE divisions of integer counts; each ln is
    e6-rounded at the source (geometric-mean convention), the product
    e6-rounds before its decimal sum, and the closing negation /
    weighting are exact-then-e6 — magnitudes are all ≤ ln|types|, far
    inside every bound."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    )
    pairs = (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_trans"))
        # r16 wave 9 NOTE: pinning this matrix was A/B-tested and
        # REVERTED (0.80 unpinned vs 1.33 pinned): the duplicated
        # lead-window subtrees overlap within one job.
    )
    outs = pairs.groupBy("cur").agg(
        F.sum("n_trans").cast("bigint").alias("n_out")
    )
    p = pairs.join(F.broadcast(outs), "cur").select(
        "cur",
        (F.col("n_trans").cast("double") / F.col("n_out")).alias("pc"),
    )
    terms = p.select(
        "cur",
        dround(F.col("pc") * dround(F.log("pc"), 6), 6).alias("term"),
    )
    h = terms.groupBy("cur").agg(
        dround(
            -F.sum(F.col("term").cast("decimal(25,6)")).cast("double"), 6
        ).alias("h_state")
    )
    tot = outs.agg(F.sum("n_out").cast("bigint").alias("n"))
    base = (
        outs.join(h, "cur")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("cur").alias("state"),
            "n_out",
            "h_state",
            dround(F.col("n_out").cast("double") / F.col("n"), 6).alias(
                "pi_emp"
            ),
        )
    )
    return base.select(
        "state",
        "n_out",
        "h_state",
        "pi_emp",
        dround(F.col("pi_emp") * F.col("h_state"), 6).alias("contrib"),
    )


_HIT_TARGET = "purchase"
_HIT_STEPS = 8


def _sql_hitting() -> str:
    """Chained-CTE oracle: v0 = [target -> 1], absorbing walk
    v_{t+1}(s) = e6( Σ_nxt P(nxt|s)·v_t(nxt) ) for non-target states;
    the target stays pinned at 1 (absorbing). LEFT JOIN + coalesce
    everywhere a v_t is consumed, so a successor absent from v_t
    contributes 0 WITHOUT dropping the state's row — the driver-side
    trajectory keeps every outs state alive each step, and the two
    engines must agree on the row set by construction even on
    degenerate chains (same values on the shipped data, where every
    successor set intersects outs)."""
    steps = []
    for t in range(_HIT_STEPS):
        steps.append(
            f"""v{t + 1} AS (
      SELECT p.cur AS state,
             CASE WHEN p.cur = '{_HIT_TARGET}' THEN 1.0 ELSE
             {sql_dround(
                 "CAST(sum(CAST("
                 + sql_dround("p.p_cond * coalesce(v.v, 0.0)", 12)
                 + " AS DECIMAL(38,12))) AS DOUBLE)", 6,
             )} END AS v
      FROM p LEFT JOIN v{t} v ON v.state = p.nxt
      GROUP BY p.cur
    )"""
        )
    chain = ",\n    ".join(steps)
    return f"""
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
    p AS (
      SELECT p.cur, p.nxt,
             CAST(p.n_trans AS DOUBLE) / o.n_out AS p_cond
      FROM pairs p JOIN outs o ON p.cur = o.cur
    ),
    v0 AS (
      SELECT cur AS state,
             CASE WHEN cur = '{_HIT_TARGET}' THEN 1.0 ELSE 0.0 END AS v
      FROM outs
    ),
    {chain}
    SELECT o.cur AS state, o.n_out,
           {sql_dround("coalesce(v.v, 0.0)", 6)} AS hit_prob_{_HIT_STEPS}
    FROM outs o LEFT JOIN v{_HIT_STEPS} v ON v.state = o.cur
    """


@register("q_seq_markov_hitting", oracle=_sql_hitting())
def q_seq_markov_hitting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-step hitting probability of the '{target}' state from every
    behavior state under the empirical transition chain: v_K(s) =
    P(reach {target} within K=8 steps | start at s), computed by the
    absorbing-state value iteration v_{{t+1}} = P·v_t with the target
    pinned at 1 — the funnel-convergence readout (how reachable is
    purchase from each entry state) complementing
    q_seq_markov_stationary's long-run occupancy.

    Plan + determinism: the q_seq_markov_stationary discipline — the
    stream collapses ONCE to the bounded ≤|types|² transition matrix
    (distributed lead window + hash aggregate), the matrix is
    collected (≤25 rows), and the 8 absorbing steps run driver-side
    replicating both engines' rounded trajectory BIT-EXACTLY
    (int/int division; e12 floor-rounding of each product is exact
    integer arithmetic below 2^53; per-step e6 re-round). Successor
    states the vector join drops (no outgoing row) contribute 0 —
    the identical truncation the chained-CTE oracle applies.

    The docstring uses {{target}} = purchase (a literal constant
    shared with the oracle text)."""
    import math

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    )
    pairs = (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_trans"))
    )
    rows = pairs.collect()  # ≤ |event types|² rows — bounded

    n_out: dict[str, int] = {}
    for r in rows:
        n_out[r["cur"]] = n_out.get(r["cur"], 0) + r["n_trans"]
    p = {
        (r["cur"], r["nxt"]): r["n_trans"] / n_out[r["cur"]] for r in rows
    }

    def r6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    v = {s: (1.0 if s == _HIT_TARGET else 0.0) for s in n_out}
    for _ in range(_HIT_STEPS):
        acc: dict[str, int] = {}
        for (cur, nxt), pc in p.items():
            if nxt in v:
                t = pc * v[nxt]
                acc[cur] = acc.get(cur, 0) + int(
                    math.floor(t * 1e12 + 0.5)
                )
        v = {
            s: (1.0 if s == _HIT_TARGET else r6(acc.get(s, 0) / 10**12))
            for s in n_out
        }

    out_rows = [
        (s, n_out[s], r6(v[s])) for s in n_out
    ]
    return spark.createDataFrame(
        out_rows,
        f"state string, n_out bigint, hit_prob_{_HIT_STEPS} double",
    )
