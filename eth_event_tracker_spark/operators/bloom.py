"""Broadcast Bloom-filter prefilter for exact filter-against-corpus dedup.

The corpus-extension shape (drop every incoming doc whose normalized text
already exists in the corpus — the exact-hash sibling of
``dedup.minhash_filter_against``) is an anti-join whose big side is the
100 TB corpus.  A plain broadcast anti-join ships a hash set of EVERY
incoming key to every executor — O(|incoming|) broadcast bytes (an 80 MB+
hashmap for a 10M-row crawl batch) and it stops being broadcastable at
all once the batch outgrows the threshold.  The Bloom prefilter replaces
that with a CONSTANT-size broadcast:

  1. build  — one pass over ``incoming`` producing per-partition partial
              bitmaps (``mapInPandas``, numpy ``bitwise_or.at``), OR-ed on
              the driver: ``m_bits/8`` bytes total (128 KB at the 1 Mbit
              default) regardless of batch size.
  2. probe  — the corpus scans ONCE with a vectorized k-probe membership
              test against the broadcast bitmap; only hash-colliding rows
              (≈ true matches + fp·|corpus|) leave the scan.  The corpus
              never shuffles.
  3. verify — the tiny candidate set exact-joins ``incoming`` on the
              normalized TEXT (not the hash), so Bloom false positives
              AND xxhash64 collisions are both removed: the result is
              bit-identical to the plain anti-join for every parameter
              choice (pinned in tests with a deliberately undersized
              filter).  False negatives are impossible by construction.

This is the pattern Spark's own runtime row-level filtering and the
Parquet/ORC bloom indexes use; here it is surfaced as an operator because
the reference's store dedups incoming logs against already-stored ones by
key (store.go's append-if-absent semantics) and a training-data pipeline
dedups each crawl batch against the corpus the same way.

Sizing rule: ``m_bits ≈ 10 × |incoming|`` with ``k = 5`` gives ~1% false
positives → the probe passes ~1% of corpus rows beyond the true matches,
all discarded by the verify join.

Hashing is JVM-side ``xxhash64`` over the normalized text; Python only
tests bits (Arrow-batched, numpy-vectorized — no per-row Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import normalize


def _positions(h: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    """k probe positions per hash via double hashing (Kirsch–Mitzenmacher):
    pos_i = (h1 + i·h2) mod m, h2 forced odd so the stride cycles the
    power-of-two table.  Returns a (k, n) uint64 array."""
    h1 = h.astype(np.uint64, copy=False)
    h2 = ((h1 >> np.uint64(33)) ^ h1) * np.uint64(0xFF51AFD7ED558CCD) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64).reshape(k, 1)
    return (h1 + i * h2) & np.uint64(m_bits - 1)


def build_bloom(df: DataFrame, hash_col: str, m_bits: int = 1 << 20, k: int = 5) -> bytes:
    """One distributed pass → an ``m_bits/8``-byte bitmap.  Each partition
    folds its hashes into a partial bitmap executor-side; the driver ORs
    the per-partition partials (n_partitions × m/8 bytes — bounded by the
    task count, not the row count)."""
    if m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two, got {m_bits}")

    def fold(it):
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        for pdf in it:
            if not len(pdf):
                continue
            h = pdf[hash_col].to_numpy(dtype=np.int64).view(np.uint64)
            pos = _positions(h, k, m_bits).ravel()
            np.bitwise_or.at(
                bits,
                (pos >> np.uint64(3)).astype(np.int64),
                (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)),
            )
        yield pd.DataFrame({"bitmap": [bits.tobytes()]})

    parts = df.select(hash_col).mapInPandas(fold, "bitmap binary").collect()
    out = np.zeros(m_bits // 8, dtype=np.uint8)
    for row in parts:
        out |= np.frombuffer(row.bitmap, dtype=np.uint8)
    return out.tobytes()


def bloom_probe(df: DataFrame, hash_col: str, bitmap: bytes, k: int = 5) -> DataFrame:
    """Rows of ``df`` whose hash tests positive in the bitmap (all k bits
    set).  Superset of the true members — never drops one.  Runs directly
    on the scan: no shuffle, Arrow-batched numpy bit tests."""
    m_bits = len(bitmap) * 8
    bc = df.sparkSession.sparkContext.broadcast(bitmap)
    schema = df.schema

    def probe(it):
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        for pdf in it:
            if not len(pdf):
                continue
            h = pdf[hash_col].to_numpy(dtype=np.int64).view(np.uint64)
            pos = _positions(h, k, m_bits)
            byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
            hit = ((byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1).all(axis=0)
            if hit.any():
                yield pdf.loc[hit]

    return df.mapInPandas(probe, schema)


def bloom_filter_against(
    corpus: DataFrame,
    incoming: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """Exact filter-against-corpus: return the ``incoming`` rows whose
    normalized text matches NO corpus doc.  Result is independent of
    ``m_bits``/``k`` (they only tune how much corpus survives the
    prefilter); identical to
    ``incoming.join(corpus, on=norm, "left_anti")`` — see module
    docstring for why the Bloom beats that at 100 TB.

    NULL text never equals anything (SQL semantics): a NULL-text incoming
    row always survives, a NULL-text corpus row matches nothing."""
    nrm = normalize(F.col(text_col))
    inc = incoming.withColumn("_norm", nrm).withColumn("_h", F.xxhash64("_norm"))
    bitmap = build_bloom(inc.where(F.col("_norm").isNotNull()), "_h", m_bits, k)

    corp = corpus.select(nrm.alias("_norm")).where(F.col("_norm").isNotNull()).withColumn(
        "_h", F.xxhash64("_norm")
    )
    candidates = bloom_probe(corp, "_h", bitmap, k).select("_norm").distinct()
    return inc.join(candidates, "_norm", "left_anti").drop("_norm", "_h")


# ---------------------------------------------------------------------------
# The Bloom filter as (word, bits) ROWS — the durable/mergeable twin of
# build_bloom's broadcast bytes.  The byte form above is for shipping to
# executors (probe a scan in place); the row form is for STATE: it
# parquet-persists, merges with a plain groupBy(word).bit_or(bits) — an
# associative AND idempotent fold, so it rides the exactly-once sketch
# log (streaming/sketch.py bloom_codec) next to CMS and HLL, and unlike
# HLL its build is EXACTLY deterministic (no merge-tree dependence: OR
# of per-row word masks commutes bit-for-bit).
#
# Everything is JVM-side codegen: xxhash64 → k masked double-hash
# positions → per-word bit_or.  The position schedule masks the stride
# to the table width BEFORE the multiply (ANSI-safe: nothing can
# overflow a BIGINT), which makes it deliberately DIFFERENT from
# build_bloom's full-width numpy uint64 arithmetic — the two filters are
# not interchangeable bitmaps.
# ---------------------------------------------------------------------------
def bloom_rows(df: DataFrame, key_col: str, m_bits: int = 1 << 20, k: int = 5) -> DataFrame:
    """One aggregation pass → the filter as ≤ ``m_bits/64`` rows
    (word BIGINT, bits BIGINT), bounded by the table width regardless of
    input size.  NULL keys hash to xxhash64's null value like any other
    (callers wanting SQL NULL-semantics filter first, as
    bloom_filter_against does)."""
    if m_bits & (m_bits - 1) or m_bits < 64:
        raise ValueError(f"m_bits must be a power of two >= 64, got {m_bits}")
    M = F.lit(m_bits - 1).cast("long")
    h1 = F.xxhash64(F.col(key_col).cast("string"))
    base = h1.bitwiseAND(M)
    stride = (
        F.shiftrightunsigned(h1, 33).bitwiseXOR(h1).bitwiseAND(M).bitwiseOR(F.lit(1).cast("long"))
    )
    pos = (F.col("_b") + F.col("_i") * F.col("_s")).bitwiseAND(M)
    return (
        df.select(base.alias("_b"), stride.alias("_s"))
        .select("_b", "_s", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_i"))
        .select(pos.alias("_p"))
        .select(
            F.shiftright(F.col("_p"), 6).alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_p % 64 AS INT))").alias("_m"),
        )
        .groupBy("word")
        .agg(F.bit_or("_m").alias("bits"))
    )


def bloom_rows_member(
    sketch: DataFrame, keys: DataFrame, key_col: str, m_bits: int = 1 << 20, k: int = 5
) -> DataFrame:
    """Membership probe against a row-form filter: (key, maybe_member).
    ``False`` ⇒ definitely never added (no false negatives, pinned);
    ``True`` ⇒ added OR a false positive (rate ≈ (1 - e^{-kn/m})^k —
    callers needing exactness verify-join like bloom_filter_against).

    Scale shape: the sketch is ≤ m/64 rows → broadcast; each distinct
    key expands to its k (word, mask) probes, one broadcast-join lookup,
    bool_and per key.  No shuffle of the probed side beyond the final
    per-key aggregate on the already key-partitioned expansion."""
    M = F.lit(m_bits - 1).cast("long")
    h1 = F.xxhash64(F.col(key_col).cast("string"))
    base = h1.bitwiseAND(M)
    stride = (
        F.shiftrightunsigned(h1, 33).bitwiseXOR(h1).bitwiseAND(M).bitwiseOR(F.lit(1).cast("long"))
    )
    pos = (F.col("_b") + F.col("_i") * F.col("_s")).bitwiseAND(M)
    probes = (
        keys.select(key_col).distinct()
        .select(F.col(key_col), base.alias("_b"), stride.alias("_s"))
        .select(key_col, "_b", "_s", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_i"))
        .select(key_col, pos.alias("_p"))
        .select(
            key_col,
            F.shiftright(F.col("_p"), 6).alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_p % 64 AS INT))").alias("_m"),
        )
    )
    j = probes.join(F.broadcast(sketch), "word", "left")
    hit = F.col("bits").isNotNull() & (
        F.col("bits").bitwiseAND(F.col("_m")) == F.col("_m")
    )
    return j.groupBy(key_col).agg(F.bool_and(hit).alias("maybe_member"))
