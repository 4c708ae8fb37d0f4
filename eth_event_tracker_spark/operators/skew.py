"""Skew mitigation: salted join for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; this is the explicit form for when a join key is *known* to be
pathological (the zero-address, a mega-contract) — the big side gets a
deterministic salt, the small side is replicated salt_n times, and the
join key becomes (key, salt): one hot key fans out across salt_n tasks.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    salt_n: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equivalent to ``big.join(small, on, how)`` for equi-joins, with the
    hot-key rows of ``big`` spread over ``salt_n`` partitions.

    The big side's salt is derived from a hash of the whole row (cheap,
    deterministic, no extra column requirements); the small side is
    exploded salt_n× — acceptable precisely because it is small."""
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        # right/full outer would keep salt_n null-padded copies of each
        # unmatched small-side row (it was exploded before the join)
        raise ValueError(f"salted_join supports inner/left/semi/anti joins, not {how!r}")
    on = [on] if isinstance(on, str) else list(on)
    big_salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_n))
    )
    small_salted = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_n)]))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    out = big_salted.join(small_salted, [*on, "_salt"], how)
    return out.drop("_salt")
