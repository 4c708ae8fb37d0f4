"""Engine-portable 60-bit hash, expressible identically in Spark and
DuckDB — the foundation that makes MinHash/fingerprint operators *exactly*
verifiable against the SQL oracle (unlike xxhash64/murmur, which differ
per engine).

h_seed(s) = int64( first 15 hex chars of sha256("<seed>:" + s) )

Spark evaluates the hex→int via ``conv``; DuckDB (which lacks hex→int on
strings) via mechanical digit arithmetic over 15 positions.  Both are
pure-SQL, JVM/vectorized — no UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash60(col: Column, seed: Column | int) -> Column:
    """Spark side: deterministic 60-bit hash of a string column."""
    seed_c = F.lit(str(seed)) if isinstance(seed, int) else seed.cast("string")
    h = F.substring(F.sha2(F.concat(seed_c, F.lit(":"), col), 256), 1, 15)
    return F.conv(h, 16, 10).cast("long")


def duck_sha15_expr(col_expr: str, seed_expr: str) -> str:
    """DuckDB: the 15-hex-char digest column; pair with
    :func:`duck_digitsum_expr` in a later CTE so sha256 runs once per row."""
    return f"substr(sha256(CAST({seed_expr} AS STRING) || ':' || {col_expr}), 1, 15)"


def duck_digitsum_expr(h_col: str) -> str:
    """DuckDB: hex(15 chars)→int64 by digit arithmetic over column h_col."""
    terms = " + ".join(
        f"CAST(strpos('0123456789abcdef', substr({h_col}, {p + 1}, 1)) - 1 AS BIGINT) * {16 ** (14 - p)}::BIGINT"
        for p in range(15)
    )
    return f"({terms})"


def duck_hash60_inline(col_expr: str, seed_expr: str) -> str:
    """DuckDB: fully inlined digit arithmetic (no macro needed — the
    driver executes single SELECT statements)."""
    h = f"substr(sha256(CAST({seed_expr} AS STRING) || ':' || {col_expr}), 1, 15)"
    terms = " + ".join(
        f"CAST(strpos('0123456789abcdef', substr({h}, {p + 1}, 1)) - 1 AS BIGINT) * {16 ** (14 - p)}::BIGINT"
        for p in range(15)
    )
    return f"({terms})"


def le_uint_from_hex(col: Column, n_bytes: int) -> Column:
    """Little-endian unsigned int from the first n_bytes*2 hex chars —
    the ABI payload decode pattern (README.md:101-102 reads LE uint64s).
    n_bytes ≤ 7 keeps the value inside int64."""
    assert n_bytes <= 7
    rev = F.concat(*[F.substring(col, 2 * i + 1, 2) for i in reversed(range(n_bytes))])
    return F.conv(rev, 16, 10).cast("long")


def hash60_py(value: str, seed: int | str) -> int:
    """Driver-side twin of :func:`hash60` — the SAME digest, for the few
    places the driver must compute a row's hash without a Spark job
    (e.g. mapping query terms to their inverted-index partition buckets,
    operators/retrieval.py).  Pinned equal to the Spark expression in
    tests."""
    import hashlib

    h = hashlib.sha256(f"{seed}:{value}".encode()).hexdigest()[:15]
    return int(h, 16)
