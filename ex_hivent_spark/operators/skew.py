"""Skew-aware join helper: salting for power-law keys.

AQE's skew-join splitting (enabled by the session defaults) handles
most runtime skew by splitting oversized shuffle partitions. Salting is
the *plan-level* tool for the cases AQE can't fix: a single join key so
hot that even one key's rows exceed an executor (power-law user_ids,
null-heavy foreign keys). The fact side spreads each key across
``n_salt`` sub-keys; the build side is replicated ``n_salt`` times, so
the join becomes uniformly distributed at the cost of an
``n_salt``-times-larger build side — which is why the build side should
be the small one.

Salt derivation is deterministic (xxhash64 of a caller-named unique
column), never rand(): retried tasks must land rows in the same salt
bucket or shuffle retries produce duplicates/losses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    fact: DataFrame,
    build: DataFrame,
    on: str,
    fact_unique_col: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ build on fact[on] == build[on]`` with the hot
    key spread over ``n_salt`` buckets. Result equals the plain join
    (asserted in tests); only the shuffle distribution changes.

    ``fact_unique_col`` seeds the deterministic salt (any column that
    varies within a key group — a row id, an event id).

    Only fact-preserving join types are allowed: with the build side
    replicated ``n_salt`` times, a right/full outer join would emit
    each unmatched build row once per salt replica — ``n_salt``
    duplicates the plain join never produces. Fact-side semantics are
    unaffected (each fact row carries exactly one salt), and
    semi/anti remain correct because a key present in build is present
    for every salt value.
    """
    allowed = {"inner", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "semi",
               "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} not supported — build-side "
            f"replication breaks right/full outer semantics; use one of "
            f"{sorted(allowed)}"
        )
    salted_fact = fact.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(F.col(fact_unique_col)), F.lit(n_salt)).cast("int"),
    )
    replicated_build = build.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))),
    )
    joined = salted_fact.join(replicated_build, [on, SALT_COL], how)
    return joined.drop(SALT_COL)
