"""Round-12 optimization pins."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401

from eth_event_tracker_spark.operators.dedup import (
    containment_pairs,
    jaccard_pairs,
    jaccard_pairs_prefix,
)


def test_collapse_bit_equal_with_sub_n_word_duplicates(spark):
    """Round-11 verdict item 3 adjudicated: the claimed edge (identical
    sub-n-word docs pair under the collapse but not without it) does NOT
    exist, because word_shingles PADS a shorter-than-n doc with ONE
    whole-text shingle (sequence(0, greatest(size-n, 0)); the DuckDB
    oracle CTE mirrors it) — so 'has >= 1 shingle' is exactly
    'normalize(text) != ""', the predicate _dup_text_groups already
    filters on.  Pinned with the verdict's own fixture (2-word and
    1-word duplicated docs, plus empties) across all three shingle-join
    operators, collapse forced on vs off."""
    rows = [
        (1, "hello world"),  # 2 words < n=3, duplicated
        (2, "hello world"),
        (3, "alpha beta gamma delta"),
        (4, "alpha beta gamma delta"),
        (5, ""),  # no shingles: must never pair
        (6, "  "),
        (7, "solo"),  # 1 word, duplicated
        (8, "solo"),
    ] + [(200 + i, "common duplicated text body here") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for fn in (jaccard_pairs, containment_pairs, jaccard_pairs_prefix):
        off = sorted(map(tuple, fn(df, collapse_identical=False).collect()))
        on = sorted(map(tuple, fn(df, collapse_identical=True).collect()))
        assert off == on, fn.__name__
        ids_in_pairs = {d for p in on for d in p[:2]}
        assert {1, 2, 7, 8} <= ids_in_pairs  # short dups DO pair (padded shingle)
        assert not {5, 6} & ids_in_pairs  # empties never pair


def test_lsh_ids_only_shape_bit_identical(spark):
    """Round-12 (verdict item 8): the ids-only candidate shape — probe
    explode, bucket join and pair-distinct on (id, bucket) metadata,
    vectors re-attached once per side for the verify — must produce the
    BIT-identICAL pair set of the in-place shape, on a corpus with exact
    duplicates (collapse on) and with the collapse forced off."""
    import math

    from pyspark.sql import functions as F

    from eth_event_tracker_spark.operators.similarity import (
        cosine_near_dup_pairs_lsh,
    )

    rows = []
    for i in range(120):
        base = [math.sin(0.7 * i + 0.13 * d) for d in range(16)]
        rows.append((i, base))
        if i % 4 == 0:  # exact duplicates
            rows.append((1000 + i, list(base)))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for collapse in (True, False):
        a = sorted(
            map(
                tuple,
                cosine_near_dup_pairs_lsh(
                    df, threshold=0.3, n_planes=4, collapse_exact=collapse, ids_only=False
                ).collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                cosine_near_dup_pairs_lsh(
                    df, threshold=0.3, n_planes=4, collapse_exact=collapse, ids_only=True
                ).collect(),
            )
        )
        assert a == b and len(a) > 0, f"collapse={collapse}"
