"""Skew-mitigation join operator.

The engine's default posture for skewed shuffles is AQE
(``spark.sql.adaptive.skewJoin`` splits oversized sort-merge
partitions at runtime — enabled in ``session.get_spark``), and small
dimension sides should be ``broadcast()`` joined outright. Explicit
salting remains the tool for the cases AQE can't rewrite: stateful
streaming joins, hash-partitioned plans outside sort-merge, or a
single heavy-hitter key so large that even a split partition is one
task's worth of work. Reference context: all reference joins are
user_id equi-joins (SURVEY.md §2.3); user-keyed fixtures are uniform,
so this operator is exercised by an equivalence test rather than an
oracle query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join with the left side salted ``salt`` ways and the right
    side replicated once per salt value, so a heavy-hitter key's rows
    spread over ``salt`` reducers instead of one.

    The salt is uniform per left row (seeded ``rand`` — deterministic
    per partition, and the join RESULT is salt-independent either way).
    Replication multiplies the right side ×``salt``: use only when the
    right side is modest but too big (or the plan unable) to
    broadcast. ``how`` is restricted to inner/left — for right/full
    joins the replicated unmatched right rows would surface ``salt``
    times.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left' only")
    if salt < 1:
        raise ValueError("salt must be >= 1")
    salt_col = "__salt"
    lefts = left.withColumn(
        salt_col, F.floor(F.rand(seed=7) * salt).cast("int")
    )
    rights = right.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return lefts.join(rights, [*on, salt_col], how).drop(salt_col)
