"""Entity resolution (record linkage): collapse records whose key
strings are near-identical into one entity, and elect a canonical
("golden") record per entity.

The classic data-cleaning composition, assembled from the repo's own
scale-safe parts — nothing here invents a new join:

1. **Blocking + match** — :func:`~..operators.text.fuzzy_pairs`: q-gram
   equality-join candidates (a strict superset within the length bound —
   see its docstring for the guarantee), refined by exact
   ``levenshtein ≤ max_dist``.  Distinct VALUES pair up, not records, so
   the quadratic term is bounded by distinct-value frequency, never row
   count — records sharing a value are linked through the value node.
2. **Transitive closure** — :func:`~..operators.dedup.dup_clusters`:
   pointer-jumped min-label propagation over the value graph, O(log
   diameter) rounds.  A~B and B~C puts A,C in one entity even when
   levenshtein(A,C) > max_dist — that is the DEFINITION of ER (match is
   a similarity relation, entity is its transitive closure), not error.
3. **Golden record** — min record id per entity, or (``scores`` given)
   the :func:`~..operators.dedup.select_keepers` argmax rule: highest
   score, ties to lowest id, so the election is total and deterministic.

Values shorter than ``fuzzy_pairs``'s q-gram guarantee bound
(q·max_dist + q − 1 chars) link on exact equality only — documented
there; raise ``q``'s bound rather than silently missing short typos.

No counterpart in the reference (its keys are exact 32-byte hashes;
`tracker.go` never fuzzy-matches) — this is the LLM-data/curation
surface: author/domain/source canonicalization before per-entity caps
or leakage-safe splits.

100 TB shape: one q-gram equality join over distinct values, O(log d)
bounded-size label rounds, one entity-partitioned window.  No
cross join, no driver-side data beyond dup_clusters' convergence
scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash60
from .dedup import dup_clusters
from .text import fuzzy_pairs


def resolve_entities(
    df: DataFrame,
    key_col: str,
    id_col: str,
    max_dist: int = 2,
    q: int = 2,
    scores: DataFrame | None = None,
    score_col: str = "quality",
    min_members: int = 1,
) -> DataFrame:
    """Resolve ``df``'s records into entities by near-identity of
    ``key_col``.

    Returns one row per record (NULL keys drop — they assert no
    identity): ``(id_col, key_col, entity_id, n_members,
    is_canonical)`` where ``entity_id`` is the entity's min record id —
    stable under repartitioning — and exactly one member per entity has
    ``is_canonical`` (min id, or the ``scores`` argmax when given).
    ``min_members=2`` restricts to entities that actually merged
    records — the ER "report" shape."""
    recs = df.select(id_col, key_col).where(F.col(key_col).isNotNull())
    # value nodes become 60-bit hashes before clustering: dup_clusters'
    # min-label/convergence arithmetic is numeric, and the label rounds
    # then shuffle fixed-width longs instead of arbitrary-length strings
    # (the label's VALUE is internal — the output entity id is the min
    # RECORD id per component, so the hash never surfaces)
    pairs = fuzzy_pairs(df, key_col, max_dist=max_dist, q=q).select(
        hash60(F.col("s_a"), 0).alias("h_a"), hash60(F.col("s_b"), 0).alias("h_b")
    )
    comps = dup_clusters(pairs, "h_a", "h_b").select(
        F.col("doc_id").alias("_vh"), F.col("cluster_id").alias("_vlabel")
    )
    # singleton values (no near-dup partner) label themselves
    labeled = (
        recs.withColumn("_vh", hash60(F.col(key_col), 0))
        .join(comps, "_vh", "left")
        .withColumn("_vlabel", F.coalesce(F.col("_vlabel"), F.col("_vh")))
    )
    w = Window.partitionBy("_vlabel")
    labeled = (
        labeled.withColumn("entity_id", F.min(id_col).over(w))
        .withColumn("n_members", F.count(F.lit(1)).over(w))
        .where(F.col("n_members") >= min_members)
    )
    if scores is None:
        canon = F.col(id_col) == F.col("entity_id")
    else:
        rank_w = Window.partitionBy("_vlabel").orderBy(
            F.desc(score_col), F.asc(id_col)
        )
        labeled = labeled.join(scores.select(id_col, score_col), id_col)
        canon = F.row_number().over(rank_w) == 1
    return labeled.withColumn("is_canonical", canon).select(
        id_col, key_col, "entity_id", "n_members", "is_canonical"
    )
