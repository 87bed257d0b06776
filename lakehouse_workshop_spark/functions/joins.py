"""Join strategy helpers for skew (SURVEY.md §2.8 / scale posture).

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
`session.py`) handles most skew at runtime by splitting oversized
partitions. Salting is the explicit fallback for the case AQE can't fix:
a *single* join key so hot that even a split partition is one key's rows
— salting subdivides the key itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_join_salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    *,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys are split across ``salts``
    sub-partitions and ``other`` is replicated ``salts``× to meet them.

    The skewed side's rows get a uniform salt derived from
    ``monotonically_increasing_id`` (cheap, no extra shuffle; uniformity —
    not cross-run stability — is what correctness needs, since the salt is
    dropped after the join). Cost: ``other`` is scanned/shuffled ``salts``×
    — use only when ``other`` is far smaller than the hot key's row count
    but too big to broadcast.
    """
    # Replicating the right side salts× preserves semantics only for join
    # types that never emit unmatched *right* rows — a right/full outer
    # would emit each unmatched right row once per salt.
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti"}
    if how not in allowed:
        raise ValueError(f"salted_join supports {sorted(allowed)}, got {how!r}")
    salted_left = skewed.withColumn(
        SALT_COL, F.pmod(F.monotonically_increasing_id(), F.lit(salts)).cast("int")
    )
    replicated_right = other.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    return salted_left.join(replicated_right, [on, SALT_COL], how).drop(SALT_COL)
