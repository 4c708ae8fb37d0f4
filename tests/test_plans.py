"""Physical-plan audits: the properties that decide 100 TB behavior are
asserted here, not just eyeballed — predicate pushdown to parquet, column
pruning, broadcast joins, TakeOrdered top-k, map-side partial aggregation,
and partitioning reuse."""

from __future__ import annotations

from pyspark.sql import functions as F

from eth_event_tracker_spark.queries import REGISTRY, _load
from eth_event_tracker_spark.tables import load_table

_load()


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") == 42).select(
        "l_orderkey", "l_quantity"
    )
    plan = plan_of(li)
    assert "PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,42)]" in plan


def test_column_pruning(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    plan = plan_of(li)
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert rs and "l_extendedprice" not in rs[0], "scan must read only projected columns"
    assert "l_orderkey" in rs[0] and "l_quantity" in rs[0]


def test_broadcast_join_selected(spark, sf_dir):
    q = REGISTRY["join_broadcast_dims"].fn(spark, sf_dir)
    plan = plan_of(q)
    assert "BroadcastHashJoin" in plan
    # the fact table (orders) must not be exchanged before the join
    assert "SortMergeJoin" not in plan


def test_topk_is_take_ordered(spark, sf_dir):
    q = REGISTRY["sort_limit_topk"].fn(spark, sf_dir)
    plan = plan_of(q)
    assert "TakeOrderedAndProject" in plan, "ORDER BY+LIMIT must not be a global sort"


def test_agg_has_partial_phase(spark, sf_dir):
    q = REGISTRY["q1_pricing_summary"].fn(spark, sf_dir)
    plan = plan_of(q)
    assert plan.count("HashAggregate") >= 2, "expect partial + final aggregation"


def test_semi_anti_join_operators(spark, sf_dir):
    q = REGISTRY["join_semi_anti"].fn(spark, sf_dir)
    plan = plan_of(q)
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_address_filter_is_source_predicate(spark, sf_dir):
    """P-1 on a *stored* entry table pushes the IN-set to parquet, the
    engine's analogue of the reference's server-side filter."""
    from eth_event_tracker_spark.operators.filters import address_filter
    from eth_event_tracker_spark.sources.mock_chain import MockProvider
    from eth_event_tracker_spark.store import ParquetStore

    import tempfile

    prov = MockProvider()
    prov.advance(20, logs_per_block=1)
    store = ParquetStore(tempfile.mkdtemp())
    e = store.entry("f1")
    e.store_logs([lg for b in prov.canonical for lg in b.logs()])
    df = address_filter(e.df(spark), ["0x" + "aa" * 20]).select("indx", "address")
    plan = plan_of(df)
    squashed = plan.replace(" ", "")
    assert "PushedFilters" in plan
    assert "In(address" in squashed or "EqualTo(address" in squashed
    # reading an entry must not cost a shuffle
    assert "Exchange" not in plan


def test_asymmetric_filters_are_equality_joins(spark, sf_dir):
    """The corpus-extension filters must form candidates through equality
    joins only — no cross join, no nested-loop join — on both the text
    (band-key) and embedding (LSH-bucket) paths."""
    from eth_event_tracker_spark.operators import dedup as OPD
    from eth_event_tracker_spark.operators import similarity as OPS

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus, incoming = docs.where("doc_id % 2 = 0"), docs.where("doc_id % 2 = 1")
    plan = plan_of(OPD.minhash_filter_against(corpus, incoming, threshold=0.8))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ec, ei = emb.where("vec_id % 2 = 0"), emb.where("vec_id % 2 = 1")
    plan = plan_of(OPS.cosine_filter_against(ec, ei, threshold=0.5, n_planes=6))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_jdbc_indx_pushdown_into_scan(spark, tmp_path):
    """VERDICT r4 #4: JdbcEntry.df/tail_df claim indx-range pushdown into
    the JDBC scan — assert it from the physical plan, Derby-backed: the
    predicate appears as a *-handled PushedFilter AND inside the generated
    external WHERE clause, so the database walks its primary-key index
    instead of shipping the table."""
    from eth_event_tracker_spark.sources.mock_chain import MockProvider

    from .test_store_conformance import _derby_store

    store = _derby_store(spark, tmp_path)
    try:
        e = store.entry("plans")
        prov = MockProvider()
        prov.advance(30, logs_per_block=1)
        e.store_logs([lg for b in prov.canonical for lg in b.logs()])

        # tail_df: the O(tail) range predicate is source-handled
        tail = e.tail_df(spark, max_rows=5)
        plan = plan_of(tail)
        assert "*GreaterThanOrEqual(indx,25)" in plan, (
            "tail_df's indx range must be fully handled by the JDBC source"
        )
        assert 'WHERE ("indx" IS NOT NULL) AND ("indx" >= 25)' in plan, (
            "the generated external query must carry the range WHERE"
        )
        assert tail.count() == 5

        # df() + point predicate: equality pushes down the same way
        pt = e.df(spark).where("indx = 7").select("indx", "block_num")
        plan = plan_of(pt)
        assert "*EqualTo(indx,7)" in plan
        assert '"indx" = 7' in plan
        assert pt.count() == 1
    finally:
        store.close()


def test_asof_join_single_shuffle(spark, sf_dir):
    """The union-window as-of join must cost exactly one exchange for the
    window (plus broadcast-free unions) — no range cross join."""
    q = REGISTRY["events_asof_join"].fn(spark, sf_dir)
    plan = plan_of(q)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # exactly two hash exchanges: the clicks dedup aggregate + the single
    # union-window shuffle; the as-of itself never joins
    assert plan.count("hashpartitioning") == 2
    assert "SortMergeJoin" not in plan


def test_q5_all_dims_broadcast(spark, sf_dir):
    q = REGISTRY["q5_local_supplier_volume"].fn(spark, sf_dir)
    plan = plan_of(q)
    assert plan.count("BroadcastHashJoin") >= 3  # supplier, nation, region


def test_global_scalars_are_not_single_partition_windows(spark, sf_dir):
    """Global scalar max must be agg + broadcast cross join — an
    empty-partitionBy window would move the entire fact table into one
    task before filtering (the round-1 scale-killer)."""
    for name in ("logs_tail_truncate", "logs_finality_split"):
        plan = plan_of(REGISTRY[name].fn(spark, sf_dir))
        assert "Window" not in plan, f"{name}: global scalar must not use a window"
        assert "BroadcastNestedLoopJoin" in plan, f"{name}: scalar must be broadcast"


def test_derived_blocks_no_global_window(spark, sf_dir):
    from eth_event_tracker_spark.tables import derived_blocks

    for fork in (False, True):
        plan = plan_of(derived_blocks(spark, sf_dir, fork=fork))
        assert "Window" not in plan


def test_indx_assignment_two_phase_value_keyed(spark, sf_dir):
    """The driver-verified indx query must run the scale plan: per-block
    offsets + within-block row_number, NOT a single-reducer global sort.
    The fact table's window must partition on block_num (value-keyed —
    deterministic across re-evaluations, unlike spark_partition_id over
    sampled range boundaries); the only SinglePartition step allowed is
    the cumulative window over the tiny per-block counts."""
    plan = plan_of(REGISTRY["logs_indx_assignment"].fn(spark, sf_dir))
    assert "partition_id" not in plan.lower()
    # the fact-side window is keyed by block_num
    assert "hashpartitioning(block_num" in plan
    # the tiny offsets branch aggregates per block BEFORE its global window
    assert plan.count("Exchange SinglePartition") <= 1


def test_decontamination_broadcast_semi_join(spark, sf_dir):
    """The eval gram set must reach the train side as a broadcast
    left-semi join — a sort-merge join would shuffle the 100 TB train
    gram table on the gram key."""
    plan = plan_of(REGISTRY["decontamination_ngram"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_exact_similarity_no_position_shuffle(spark, sf_dir):
    """The exact cosine tiers must compute dot products row-locally
    (zip_with + decimal aggregate) with the small side broadcast — not
    posexplode + a 64-key position join, which shuffles Q*N*d rows
    through a skewed exchange."""
    for name in ("embedding_cosine_topk", "embedding_near_dup"):
        plan = plan_of(REGISTRY[name].fn(spark, sf_dir))
        assert "BroadcastNestedLoopJoin" in plan, name
        assert "SortMergeJoin" not in plan, name
        assert "Generate" not in plan, f"{name}: no posexplode in the dot product"


def test_sample_stratified_no_shuffle(spark, sf_dir):
    """Hash sampling is a single filtered scan: no Exchange anywhere in
    the plan — the mixture CASE is a literal expression, not a join."""
    plan = plan_of(REGISTRY["sample_stratified"].fn(spark, sf_dir))
    assert "Exchange" not in plan, "sampling must not shuffle"
    assert "Join" not in plan, "mixture rates must be literals, not a join"


def test_doc_pipeline_packing_is_shard_windowed(spark, sf_dir):
    """Sequence packing must window per hash shard — a global (empty
    partitionBy) running sum would single-partition the whole chunk
    manifest."""
    plan = plan_of(REGISTRY["doc_pipeline"].fn(spark, sf_dir))
    assert "hashpartitioning(shard" in plan, "packing window must partition by shard"
    assert "Exchange SinglePartition" not in plan


def test_multimodal_features_plan_is_jvm_only(spark, sf_dir):
    """The registered multimodal feature path is native column expressions
    (length/substring/sha2 on binary) — no Python evaluation operator and
    no shuffle anywhere in its physical plan.  The mapInPandas decoder
    seam (decode_features) is a separate, pytest-pinned function."""
    plan = plan_of(REGISTRY["multimodal_features"].fn(spark, sf_dir))
    for marker in ("MapInPandas", "BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan, f"Python operator {marker} in multimodal_features plan"
    assert "Exchange" not in plan, "feature extraction must not shuffle"


def test_stats_unpivot_broadcasts_dim_and_generates(spark, sf_dir):
    """The unpivot query: nation dim reaches customer via broadcast (no
    SortMergeJoin) and stack() compiles to a Generate over the tiny
    aggregated table — never over the fact table."""
    plan = plan_of(REGISTRY["stats_unpivot"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Generate" in plan


def test_dedup_spans_agg_shuffles_topk(spark, sf_dir):
    """Span dedup: explode → the standard two-phase exact count-distinct
    (partial on (chunk, doc_id), merge, final on chunk — at most 3
    exchanges, all partial-aggregated) → TakeOrdered top-25 (no global
    sort, no join)."""
    plan = plan_of(REGISTRY["dedup_spans"].fn(spark, sf_dir))
    assert "TakeOrdered" in plan, "top-25 must be TakeOrdered, not Sort+Limit"
    assert "Join" not in plan
    # formatted explain lists every node twice (tree + detail section)
    assert plan.count("(") and plan.count("Exchange") <= 6, (
        "count-distinct needs at most 3 exchanges (2 agg phases + distinct), none extra"
    )
    assert "partial_count" in plan, "aggregation must have a map-side partial phase"


# ---------------------------------------------------------------------------
# Registry-wide plan lint: every registered query — current and future —
# is swept for the anti-patterns that kill 100 TB runs.  Individual tests
# above pin POSITIVE properties (broadcast chosen, pushdown reached the
# scan); this lint pins the NEGATIVE space for the whole surface at once,
# so a new registry entry cannot quietly plan a cross join or a
# row-at-a-time Python UDF.

# BroadcastNestedLoopJoin is legitimate in exactly one shape here: joining
# a broadcast SINGLE-ROW aggregate (a global scalar — max block, corpus
# head, query-vector norm) against a fact table.  These queries use it
# deliberately (see test_global_scalars_are_not_single_partition_windows);
# anything else planning a BNLJ is a bug.
_SCALAR_BROADCAST_OK = {
    "logs_point_lookup",
    "logs_tail_truncate",
    "tfidf_top_terms",  # broadcast single-row N (corpus size) scalar
    "quality_unigram_logprob",  # broadcast single-row corpus-total scalar
    "reorg_diff_except",
    "ancestor_walk",
    "changelog_assembly",
    "logs_block_enrich",
    "stats_order_values",
    "logs_finality_split",
    "embedding_cosine_topk",
    "embedding_near_dup",
    # broadcast of the 3-row instants table (views_as_of) + 1-row offset
    # scalars — every nested-loop side is O(instants), never a fact table
    "changelog_time_travel",
    "changelog_validity_intervals",
    "changelog_incremental_agg",
    # broadcast of the per-query ADC lookup tables (|queries| rows)
    "embedding_pq_topk",
    # SQ8's per-query (q_id, qv) broadcast — the same |queries|-row
    # ADC shape as embedding_pq_topk
    "embedding_sq8_topk",
    # TPC-H scalar-threshold subqueries: 1-row (total, n) / avg-balance
    # scalar broadcast against the grouped side with an INEQUALITY
    # predicate, so Catalyst cannot rewrite to BHJ (q15's equality
    # version does get rewritten); the nested-loop side is 1 row
    "q11_important_stock",
    "q22_global_sales",
    # 1-row broadcast scalars: min/max stratum count (mix/upsample
    # rates), and the (n_nodes, n_edges) count rows assembled onto the
    # triangle row
    "temperature_mix_langs",
    "temperature_upsample_langs",
    # 1-row broadcast scalars (N, total corpus length) in the BM25
    # scorers, and psi's |groups|×|buckets| grid cross + 1-row n_t
    "bm25_topk_docs",
    "bm25_batch_queries",
    "drift_psi_sources",
    # |groups|² pair frame built from a broadcast of the |groups| list
    "kmv_jaccard_event_types",
    "kmv_set_sizes_event_types",
    "triangle_count_cosupply",
    # 5-query exact side broadcasts against the corpus (cosine_topk_exact),
    # same sanctioned shape as embedding_cosine_topk
    "ann_recall_ivf",
    # hashed_tfidf_units' 1-row corpus-size scalar broadcast (the
    # tfidf_top_terms shape) under both the train and score passes
    "quality_classifier_scores",
    # 1-row successor-vocab scalar broadcast (the unigram corpus-total
    # shape one order up)
    "quality_bigram_logprob",
    # two 1-row pair-count scalars assembled onto the recall row
    "dedup_recall_minhash",
    # 1-row corpus-size / bigram-total / min-max-normalizer / budget-total
    # scalar broadcasts (the tfidf_top_terms shape)
    "ngram_boilerplate_top",
    "pmi_collocations_top",
    "quality_ensemble_docs",
    "token_budget_plan_sources",
    # round-8 continuation — 1-row scalar broadcasts only:
    # concentration's totals/inequality-scalars cross onto the
    # |sources|-row table; RRF's BM25 arm carries the bm25_topk N/len
    # scalars; RFM crosses the 1-row MAX(ts) reference instant;
    # Benford crosses the 1-row corpus count and the 1-row chi2
    "source_concentration_docs",
    "hybrid_retrieval_rrf",
    "rfm_segments_users",
    "benford_price_digits",
}

# The only sanctioned Python seams: the two Arrow-vectorized approximate
# tiers, each pytest-pinned to an exact JVM twin.
_ARROW_SEAM_OK = {
    "embedding_cosine_topk_fast",
    "embedding_ann",
    "topic_balanced_docs",
    # the Bloom probe (mapInPandas bit tests over the broadcast bitmap) —
    # result pinned parameter-independent and equal to the exact anti-join
    "dedup_bloom_filter_against",
    # the IVF arm's centroid assign/probe panda-UDFs (the embedding_ann
    # seam, reached through the recall monitor's approx side)
    "ann_recall_ivf",
}


def test_registry_wide_plan_lint(spark, sf_dir):
    bad: list[str] = []
    for name, q in REGISTRY.items():
        plan = plan_of(q.fn(spark, sf_dir))
        if "CartesianProduct" in plan:
            bad.append(f"{name}: CartesianProduct")
        if "BatchEvalPython" in plan:
            bad.append(f"{name}: row-at-a-time Python UDF")
        if "BroadcastNestedLoopJoin" in plan and name not in _SCALAR_BROADCAST_OK:
            bad.append(f"{name}: unexpected BroadcastNestedLoopJoin")
        arrow = any(
            pat in plan for pat in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")
        )
        if arrow and name not in _ARROW_SEAM_OK:
            bad.append(f"{name}: unexpected Python/Arrow stage")
    assert not bad, "plan lint failures:\n  " + "\n  ".join(bad)
