"""Physical-plan regression gates (SURVEY.md 'optimize for scale').

Correctness tests prove the right rows come back; these prove the right
*plan* produces them — pushdown reaches the scan, small dims broadcast,
aggregates partial-combine before the shuffle, and the hot path stays in
whole-stage codegen. A regression here is a 100 TB incident that sf0.01
correctness would never catch.
"""

from __future__ import annotations

import re

import pytest

import random_forest_using_hadoop_spark as engine
from tests.conftest import BENCH_SF_DIR, SF_DIR

engine.load_all()


def _formatted_str(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def _formatted_plan_at(spark, key: str, sf_dir: str) -> str:
    return _formatted_str(engine.REGISTRY[key].fn(spark, sf_dir))


def _formatted_plan(spark, key: str) -> str:
    return _formatted_plan_at(spark, key, SF_DIR)


def _executed_plan(spark, key: str) -> str:
    """Final (post-AQE) physical plan: execute, then read executedPlan —
    codegen stages appear as '*(n)' prefixes only after materialization."""
    df = engine.REGISTRY[key].fn(spark, SF_DIR)
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushdown_and_partial_agg(spark):
    plan = _formatted_plan(spark, "agg_hash_groupby")
    assert "LessThanOrEqual(l_shipdate" in plan  # predicate reached parquet
    # two-phase agg: partial HashAggregate below the Exchange, final above
    assert plan.count("HashAggregate") >= 2 and "Exchange" in plan


def test_q1_column_pruning(spark):
    plan = _formatted_plan(spark, "agg_hash_groupby")
    read_schema = next(
        line for line in plan.splitlines() if "ReadSchema" in line
    )
    # 7 needed columns; the other 4 (orderkey, partkey, suppkey,
    # linenumber...) must not be read
    assert "l_orderkey" not in read_schema
    assert "l_partkey" not in read_schema
    assert "l_quantity" in read_schema


def test_star_join_broadcasts_all_dims(spark):
    plan = _formatted_plan(spark, "join_multiway")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_broadcast_join_is_broadcast(spark):
    plan = _formatted_plan(spark, "join_broadcast")
    assert "BroadcastHashJoin" in plan


def test_scan_prune_pushdown_schema(spark):
    plan = _formatted_plan(spark, "scan_prune_pushdown")
    read_schema = next(
        line for line in plan.splitlines() if "ReadSchema" in line
    )
    assert "l_comment" not in read_schema and "l_shipdate" not in read_schema
    assert "LessThan(l_quantity,5.0)" in plan


def test_topk_no_global_sort(spark):
    """Top-k per group must rank within partitions, not globally sort the
    fact table; limit_topk must use TakeOrderedAndProject (no full sort +
    collect)."""
    plan = _formatted_plan(spark, "limit_topk")
    assert "TakeOrderedAndProject" in plan


def test_bucketed_join_has_no_join_shuffle(spark):
    """join_bucketed_colocated: both sides are bucketed+sorted on the
    join key, so the SMJ must read buckets directly — the only Exchange
    allowed in the plan is the final aggregation's."""
    plan = _executed_plan(spark, "join_bucketed_colocated")
    assert "SortMergeJoin" in plan
    # no shuffle on either join key — the only exchange is the agg's
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "Bucketed: true" in plan and "SelectedBucketsCount" in plan


# The engine's ENTIRE Python-evaluation surface, pinned (r9): the four
# keys that ARE the UDF demo surface (B58-B61) plus the codec/BLAS
# mapInPandas blocks where vectorized Python is the right tool. A key
# appearing here without being on this list means an operator silently
# fell off the JVM fast path (e.g. an expression rewritten through a
# Python lambda instead of pyspark.sql.functions).
_PYTHON_EVAL_ALLOWED = {
    "udf_scalar": {"BatchEvalPython"},        # row-UDF surface by design
    "udtf_explode": {"BatchEvalPython"},      # UDTF surface by design
    "udf_pandas": {"ArrowEvalPython"},
    "udf_broadcast_lookup": {"ArrowEvalPython"},
    "udaf_grouped": {"FlatMapGroupsInPandas"},
    "multimodal_decode": {"MapInPandas"},     # PNG codec
    "multimodal_resize": {"MapInPandas"},
    "multimodal_framesample": {"MapInPandas"},
    "multimodal_audio_codec": {"MapInPandas"},  # RIFF/WAV codec
    "sim_query_topk": {"MapInPandas"},        # BLAS batch-prune
    "dedup_embedding": {"FlatMapGroupsInPandas"},  # block-pair BLAS prune
    "dedup_lsh_audit": {"FlatMapGroupsInPandas"},  # block-pair bitmap truth
    # r13: Puffin deletion-vector blob decode — a binary roaring-bitmap
    # codec with no SQL form, run over the BOUNDED per-DV descriptor
    # frame (one row per delete file), never over data rows
    "src_iceberg_v3_dv": {"MapInPandas"},
    # r15: Avro OCF decode — a binary row codec with no SQL form, run
    # per FILE over the binaryFile scan (one Arrow batch per shard),
    # the operator's whole point (same class as the multimodal codecs)
    "src_avro": {"MapInPandas"},
    # r15b/r15c: Hudi log/cdc decode rides the same OCF codec, one
    # Arrow batch per log file (bounded by log-bearing file groups,
    # never data rows); the phash key is the PNG codec again
    "src_hudi_mor": {"MapInPandas"},
    "src_hudi_cdc": {"MapInPandas"},
    "multimodal_phash_dedup": {"MapInPandas"},
}
_PYTHON_EVAL_MARKERS = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
    "MapInPandas",
    "PythonMapInArrow",
)

# The engine's ENTIRE single-partition-window surface, pinned (r10
# verdict task 3): every WindowExec without a partition spec funnels
# its whole input through ONE task (SinglePartition exchange), so each
# site must sit on a frame bounded by something other than corpus size.
# Value = (expected node count at sf0.01, what bounds the frame). A
# data-proportional global window (the r9 _bitmap_encode vocabulary
# rank) must use helpers.dist_row_number instead and never appear here.
_UNPART_WINDOW_ALLOWED = {
    "agg_abc_classification": (2, "cumulative share over per-part agg (≤ part count)"),
    "agg_basket_pairs": (1, "rank over support-filtered pair frame, top-k cut upstream"),
    "agg_changepoint_cusum": (2, "CUSUM scan over the daily spine (≤366 rows/yr)"),
    "agg_chisq_independence": (1, "rank over the (type × cohort) contingency cells"),
    "agg_interorder_gaps": (1, "cumulative over per-gap-bucket histogram"),
    "agg_kaplan_meier": (2, "survival product over horizon-bounded risk table"),
    "agg_ks_test": (1, "cumulative CDF step over the value-domain histogram"),
    "agg_mannwhitney_u": (1, "cumulative rank over the value-domain histogram (≤20k values)"),
    "agg_pareto_point": (2, "cumulative share over per-part agg (≤ part count)"),
    "agg_spearman_corr": (2, "midranks over the daily spine (≤366 rows/yr)"),
    "pipe_corpus_mix_report": (1, "global token-share over |sources|×|langs| agg cells"),
    "pipe_length_histogram": (2, "cumulative over fixed-width length buckets"),
    "pipe_token_share_curve": (2, "cumulative share over the vocab-rank top-k cut"),
    "text_zipf_slope": (1, "rank over TakeOrderedAndProject'd top vocab"),
    "win_bollinger_bands": (1, "moving stats over the daily spine"),
    "win_ewma_crossover": (5, "EWMA chain over the daily spine (≤366 rows/yr)"),
    "win_rsi_indicator": (2, "gain/loss smoothing over the daily spine"),
    "win_sliding_median": (1, "sliding rank over the daily spine"),
    "win_vwap_cumulative": (1, "cumulative VWAP over the daily spine"),
}


def _unpartitioned_window_count(df) -> int:
    """Exact count of physical Window nodes whose partition spec is
    EMPTY (the SinglePartition funnel), read from the plan TREE via
    py4j rather than parsed out of the explain string — the string's
    bracket-group count conflates 'no partition spec' with 'has order
    spec' (a partitioned order-less window also renders two groups,
    and an unpartitioned order-less one renders one), misclassifying
    in both directions. Covers WindowExec and WindowInPandasExec;
    WindowGroupLimit is a pushed-down rank FILTER, not a funnel, and
    is deliberately excluded. Subquery plans are traversed too."""
    n = 0
    stack = [df._jdf.queryExecution().sparkPlan()]
    while stack:
        node = stack.pop()
        name = node.getClass().getSimpleName()
        if name in ("WindowExec", "WindowInPandasExec"):
            if node.partitionSpec().isEmpty():
                n += 1
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
        try:  # expression subqueries carry their own plan trees
            sq = node.subqueries()
            for i in range(sq.size()):
                stack.append(sq.apply(i))
        except Exception:
            pass
    return n


def test_no_cartesian_in_sql_oracle_queries(spark):
    """Registry-wide plan-hygiene sweep (one pass over every SQL-graded
    non-stream/ml plan): (1) no CartesianProduct — cross-join semantics
    must come from join_cross only (and the similarity brute-force
    baselines are broadcast NLJs by design); (2) no Python evaluation
    node outside the pinned _PYTHON_EVAL_ALLOWED surface — everything
    else must stay on the JVM fast path, and the designated keys may
    not silently degrade (e.g. a pandas UDF falling back to
    row-at-a-time pickling); (3) no UNpartitioned Window node outside
    the pinned _UNPART_WINDOW_ALLOWED surface — a global window
    funnels its whole input through one task, so every site must carry
    a bounded-input justification (data-proportional ranks use
    helpers.dist_row_number instead)."""
    allowed = {"join_cross", "sim_cosine_topk"}
    flagged = []
    py_flagged = []
    win_flagged = []
    # start from a cold cache: the dedup-family keys otherwise plan as
    # an InMemoryTableScan over the session pair/label memos and the
    # sweep would not see their real join pipelines (the first key to
    # rebuild each memo in this loop exposes the shared stage's plan)
    engine.release_caches(spark)
    for key, spec in engine.REGISTRY.items():
        if spec.oracle is None:
            continue
        if key.startswith(("stream_", "ml_")):
            continue  # streaming plans materialize through sinks
        df = engine.REGISTRY[key].fn(spark, SF_DIR)
        plan = _formatted_str(df)
        if "CartesianProduct" in plan and key not in allowed:
            flagged.append(key)
        found = {m for m in _PYTHON_EVAL_MARKERS if m in plan}
        if found != _PYTHON_EVAL_ALLOWED.get(key, set()):
            py_flagged.append((key, sorted(found)))
        n_unpart = _unpartitioned_window_count(df)
        if n_unpart != _UNPART_WINDOW_ALLOWED.get(key, (0, ""))[0]:
            win_flagged.append((key, n_unpart))
    assert not flagged, f"unexpected cartesian joins in: {flagged}"
    assert not py_flagged, (
        "Python-eval surface drifted from _PYTHON_EVAL_ALLOWED: "
        f"{py_flagged}"
    )
    assert not win_flagged, (
        "single-partition-window surface drifted from "
        f"_UNPART_WINDOW_ALLOWED (key, found-count): {win_flagged} — "
        "new sites need a bounded-input justification or a "
        "dist_row_number rewrite"
    )


@pytest.mark.parametrize(
    "key",
    ["agg_hash_groupby", "join_multiway", "win_rank", "fn_datetime"],
)
def test_headline_plans_stay_codegen(spark, key):
    plan = _executed_plan(spark, key)
    # '*(n)' marks WholeStageCodegen stages; the scan and both agg
    # phases must be inside one
    assert "*(" in plan, f"no codegen stage in final plan:\n{plan[:800]}"


def test_dedup_verify_bitmap_broadcast_is_size_gated(spark, monkeypatch):
    """r7 gate for the verdict's scale-killer: the exact-Jaccard verify
    may broadcast the per-doc bitmap table only while its
    metadata-estimated size fits under _ENC_BCAST_LIMIT; past the cap
    the verify joins must switch to shuffle-hash (memory bounded by a
    partition, not the whole table). Forcing the cap to 0 simulates the
    at-scale regime: the plan must show ShuffledHashJoin and no
    broadcast of the bitmap table."""
    from random_forest_using_hadoop_spark.operators import dedup_lsh

    def _verify_stage_plan() -> str:
        # probe the verify stage directly: the registry keys return the
        # session-memoized CACHED pair frame, whose explain shows only
        # an InMemoryTableScan — the join strategy switch lives (and is
        # only testable) in _exact_jaccard_pairs itself. Release caches
        # first: CacheManager's sameResult ignores join hints AND would
        # substitute the cached frame for a structurally-identical
        # rebuild, making every assertion here vacuous.
        engine.release_caches(spark)
        df = dedup_lsh._exact_jaccard_pairs(
            spark, dedup_lsh._docs_with_shingles(spark, SF_DIR)
        )
        jvm = spark._jvm
        return df._jdf.queryExecution().explainString(
            jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    base = _verify_stage_plan()  # default: under the cap → broadcast
    assert "CartesianProduct" not in base
    assert "BroadcastNestedLoopJoin" not in base
    assert "BroadcastHashJoin" in base
    monkeypatch.setattr(dedup_lsh, "_ENC_BCAST_LIMIT", 0)
    forced = _verify_stage_plan()
    assert "ShuffledHashJoin" in forced, "over-cap path must not broadcast"
    assert "CartesianProduct" not in forced
    assert "BroadcastNestedLoopJoin" not in forced
    engine.release_caches(spark)  # drop the forced-cap memo entry


def test_dedup_verify_shuffle_path_matches_broadcast_path(spark, monkeypatch):
    """The two verify-join strategies must be value-identical: the
    at-scale shuffle-hash plan returns exactly the broadcast plan's
    qualifying pairs."""
    from random_forest_using_hadoop_spark.operators import dedup_lsh

    base = sorted(
        map(tuple, engine.REGISTRY["dedup_minhash"].fn(spark, SF_DIR).collect())
    )
    monkeypatch.setattr(dedup_lsh, "_ENC_BCAST_LIMIT", 0)
    # memo clear alone is not enough: CacheManager ignores join hints
    # in sameResult, so the cached broadcast-path pair frame would
    # substitute for the rebuilt shuffle-path plan and the test would
    # pass without exercising it
    engine.release_caches(spark)
    forced = sorted(
        map(tuple, engine.REGISTRY["dedup_minhash"].fn(spark, SF_DIR).collect())
    )
    assert base == forced
    engine.release_caches(spark)  # don't leak the forced-plan memo


def test_dedup_embedding_is_bucketed_not_allpairs(spark):
    """r2 gate for the verdict's perf-weak flag, amended r9: candidates
    must come from the block-pair FlatMapGroupsInPandas BLAS prune (each
    unordered pair meets in exactly one of T(T+1)/2 groups) — neither
    the O(n²) theta join nor MLlib's approxSimilarityJoin explode (235 s
    at 2k vectors, scaling_probe r9) may reappear in the plan."""
    plan = _formatted_plan(spark, "dedup_embedding")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "FlatMapGroupsInPandas" in plan


def test_sim_topk_salted_two_phase(spark):
    """r3 gate (amends r2): the salted two-phase cut is the SCALE path —
    it must engage on a wide corpus scan and stay OUT of the plan on the
    toy single-split scan (the r2 bench paid +38% for salting 2 corpus
    partitions). Pin both shapes."""
    import re

    from pyspark.sql import functions as F

    from random_forest_using_hadoop_spark.operators import similarity as S

    # toy scan (sf0.01 parquet = 1-2 splits): single-phase, no pmod salt
    toy_plan = _formatted_plan(spark, "sim_cosine_topk")
    n_windows = len(re.findall(r"^\(\d+\) Window\b", toy_plan, re.MULTILINE))
    assert n_windows == 1, f"toy scan should skip salting, saw {n_windows} windows"
    assert "pmod" not in toy_plan

    # wide corpus (> _TOPK_SALT partitions): salted two-phase
    v = S._vectors(spark, SF_DIR)
    q = v.filter(F.col("vec_id") < S.N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("ve").alias("qv")
    )
    c = (
        v.filter(F.col("vec_id") >= S.N_QUERIES)
        .repartition(S._TOPK_SALT * 2)
        .select(F.col("vec_id").alias("corpus_id"), F.col("ve").alias("cv"))
    )
    pairs = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "corpus_id",
        F.round(S._cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
    )
    wide = S._topk_cut(pairs, salted=True)
    jvm = spark._jvm
    wide_plan = wide._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    n_windows = len(re.findall(r"^\(\d+\) Window\b", wide_plan, re.MULTILINE))
    assert n_windows == 2, f"wide scan must salt: saw {n_windows} windows"
    assert "pmod" in wide_plan


def test_range_cluster_readback_pushdown(spark):
    """sink_range_cluster: the date-band predicate must reach the parquet
    reader of the clustered copy — file/row-group pruning by min-max
    stats is the whole point of the layout rewrite."""
    plan = _formatted_plan(spark, "sink_range_cluster")
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_shipdate" in plan


def test_binned_range_join_is_equi_join(spark):
    """join_range_binned exists to avoid the nested-loop cartesian a
    pure range predicate would plan — the bin key must make it a real
    equi-join."""
    plan = _formatted_plan(spark, "join_range_binned")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_zorder_readback_pushes_both_dims(spark):
    """sink_zorder: BOTH slice predicates must reach the parquet reader
    of the z-clustered copy — two-dimensional footer pruning is the
    operator's reason to exist."""
    plan = _formatted_plan(spark, "sink_zorder")
    assert "GreaterThanOrEqual(o_custkey,100)" in plan
    assert "LessThanOrEqual(o_custkey,500)" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan
    assert "LessThan(o_orderdate" in plan


def test_skew_salted_join_is_shuffled_not_broadcast(spark):
    """join_skew_salted: the demo IS the salted shuffle shape — a
    hash/sort-merge join on (event_type, salt), never a broadcast (which
    would hide the salting) and never a cartesian."""
    plan = _formatted_plan(spark, "join_skew_salted")
    assert "BroadcastHashJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan
    assert "salt" in plan


def test_argmax_is_hash_agg_not_window(spark):
    """agg_argmax's reason to exist: latest-row-per-key WITHOUT a
    window sort — the plan must be a two-phase hash aggregate."""
    plan = _formatted_plan(spark, "agg_argmax")
    assert "Window" not in plan
    assert plan.count("HashAggregate") >= 2


def test_correlated_subquery_decorrelates(spark):
    """subquery_correlated (Q17 shape) must decorrelate to a per-key
    aggregate joined back — never a per-row re-scan (which would show
    as a nested-loop over the subquery)."""
    plan = _formatted_plan(spark, "subquery_correlated")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("HashAggregate") >= 2  # inner avg + outer count


def test_q5_pushdown_and_no_cartesian(spark):
    plan = _formatted_plan(spark, "tpch_q5_local_supplier")
    # region + date filters must reach the parquet scans
    assert "EqualTo(r_name,ASIA)" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan
    # the c_nationkey = s_nationkey theta-leg must ride a hash join,
    # never degrade to a cartesian product
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q18_rollup_before_join_and_topk(spark):
    plan = _formatted_plan(spark, "tpch_q18_large_volume")
    # quantity rollup is a two-phase hash agg (partial combines map-side
    # before the l_orderkey shuffle) ...
    assert plan.count("HashAggregate") >= 2
    # ... and the final top-20 is TakeOrderedAndProject, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_q7_q8_broadcast_all_dims_single_fact_shuffle(spark):
    """tpch_q7/q8: every dimension must broadcast — the lineitem⋈orders
    sort-merge/shuffle join is the only non-broadcast join allowed."""
    for key in ("tpch_q7_bination_volume", "tpch_q8_market_share"):
        plan = _formatted_plan(spark, key)
        assert "CartesianProduct" not in plan, key
        assert "BroadcastNestedLoopJoin" not in plan, key
        n_bhj = plan.count("BroadcastHashJoin")
        assert n_bhj >= 4, f"{key}: expected >=4 broadcast joins, saw {n_bhj}"
        # at most one shuffled join (the fact-fact leg)
        n_smj = plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin")
        assert n_smj <= 1, f"{key}: {n_smj} shuffled joins"


def test_q19_residual_pushdown(spark):
    """tpch_q19: Catalyst must derive single-side residuals from the
    OR-brackets — the quantity envelope [1,50] reaches the lineitem
    scan and the brand set reaches the part scan."""
    plan = _formatted_plan(spark, "tpch_q19_bracket_revenue")
    assert "GreaterThanOrEqual(l_quantity,1.0)" in plan
    assert "LessThanOrEqual(l_quantity,50.0)" in plan
    assert "Brand#1" in plan  # brand residual pushed to the part side
    assert "CartesianProduct" not in plan


def test_q22_anti_join_no_collect_shape(spark):
    """tpch_q22: the global AVG threshold must enter the plan as a
    broadcast (sub)join — and the no-orders test as a broadcast or
    shuffled anti join."""
    plan = _formatted_plan(spark, "tpch_q22_dormant_customers")
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_contamination_bench_set_broadcasts(spark):
    """pipe_contamination_ngram: the benchmark n-gram set must broadcast;
    the only shuffle feeds the per-doc hit count."""
    plan = _formatted_plan(spark, "pipe_contamination_ngram")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_repetition_is_pure_projection(spark):
    """pipe_repetition_score must be scan → project → filter with ZERO
    exchanges — the whole point is per-document locality."""
    plan = _formatted_plan(spark, "pipe_repetition_score")
    assert "Exchange" not in plan


def test_sessionize_single_exchange(spark):
    """win_sessionize_gap: lag-window, running-sum window, and the final
    agg all share the user_id partitioning — exactly one shuffle."""
    import re

    plan = _formatted_plan(spark, "win_sessionize_gap")
    # formatted output names each node twice (tree + detail header);
    # count detail headers like "(2) Exchange"
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE))
    assert n_exchanges == 1, f"expected 1 exchange, saw {n_exchanges}"


@pytest.mark.parametrize("sf_dir", [SF_DIR, BENCH_SF_DIR])
def test_fuzzy_join_blocked_not_cartesian(spark, sf_dir):
    """join_fuzzy_levenshtein: the self-join must ride the noun block
    key (hash join), never an all-pairs nested loop — at the grading SF
    AND the bench SF (plan choices can flip with input stats)."""
    plan = _formatted_plan_at(spark, "join_fuzzy_levenshtein", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # r9: the composite (noun, length-bin) key must stay in the join —
    # noun-only blocks are ∝ catalog and quadratic (scaling probe)
    assert "lbin" in plan


@pytest.mark.parametrize("sf_dir", [SF_DIR, BENCH_SF_DIR])
def test_contamination_broadcast_holds_at_bench_sf(spark, sf_dir):
    """pipe_contamination_ngram's broadcast-probe shape must survive the
    10× larger bench input, not just the grading SF."""
    plan = _formatted_plan_at(spark, "pipe_contamination_ngram", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_simhash_is_banded_equi_join(spark):
    """r3 gate for the verdict's perf-weak flag: simhash candidates must
    come from the (band, value) hash equi-join — the O(n²) inequality
    self-join may never reappear."""
    plan = _formatted_plan(spark, "dedup_simhash")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_pagerank_never_broadcasts_ranks(spark):
    """r3 gate: the iterative rank frame must ride merge-hinted shuffle
    joins — a per-iteration BroadcastExchange of ranks is the
    billion-node OOM the operator exists to avoid. The only broadcasts
    allowed are the EDGE-CONSTRUCTION join (orders⋈lineitem, ≤3 nodes);
    the 7 loop-side joins (adj build + 3×(contrib ⋈ + rank rebuild))
    must all be SortMergeJoin."""
    import re

    plan = _formatted_plan(spark, "graph_pagerank")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    n_smj = len(re.findall(r"^\(\d+\) SortMergeJoin", plan, re.MULTILINE))
    n_bhj = len(re.findall(r"^\(\d+\) BroadcastHashJoin", plan, re.MULTILINE))
    assert n_smj >= 7, f"rank loop degraded: only {n_smj} SortMergeJoins"
    assert n_bhj <= 3, f"{n_bhj} broadcast joins — a rank/contrib frame is broadcasting"


def test_ngram_jaccard_is_binned_equi_join(spark):
    """r3 gate, amended r9: candidates must ride the (prefix token,
    length bin) composite key as a hash equi-join — the non-equi
    |nc_a − nc_b| ≤ 20 predicate alone (BNLJ) may never reappear, and
    the length-bin-only key (docs-per-bin is ∝ corpus, so candidates
    grew quadratically: 26 s at sf0.1, scaling_probe r9) may not
    either: the join key must carry the prefix token, not just the
    numeric bin. r16: the (tok, bin) composite is collapsed to one
    xxhash64 long (guide §2.3) — the key expression must still hash
    the TOKEN (first argument), so the token-selectivity property the
    r9 gate protects is preserved."""
    plan = _formatted_plan(spark, "dedup_ngram_jaccard")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan
    assert "xxhash64(tok" in plan  # the join key hashes the prefix token
    assert "bit_count" in plan  # bitmap verify, not string-array joins


def test_quality_composite_is_pure_projection(spark):
    """pipe_quality_composite: all four quality signals in ONE scan with
    ZERO exchanges — per-document locality is the operator's contract."""
    plan = _formatted_plan(spark, "pipe_quality_composite")
    assert "Exchange" not in plan


def test_dedup_manifest_single_hash_agg(spark):
    """pipe_dedup_manifest: one two-phase hash agg on the fingerprint,
    no joins at all (the no-pair-join property is why fingerprint dedup
    runs first at 100 TB)."""
    plan = _formatted_plan(spark, "pipe_dedup_manifest")
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2


def test_heavy_hitters_candidates_broadcast(spark):
    """agg_heavy_hitters: the candidate set must broadcast into the
    recount semi-join; both counting passes must partial-combine."""
    plan = _formatted_plan(spark, "agg_heavy_hitters")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert plan.count("HashAggregate") >= 4  # 2 phases × 2 counting passes


def test_gaps_islands_single_exchange(spark):
    """win_gaps_islands: lag flag, running island counter, and the final
    per-island agg must all share the user_id partitioning — exactly one
    shuffle, same contract as win_sessionize_gap."""
    import re

    plan = _formatted_plan(spark, "win_gaps_islands")
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE))
    assert n_exchanges == 1, f"expected 1 exchange, saw {n_exchanges}"


def test_lateral_subquery_decorrelates_to_ranked_join(spark):
    """subquery_lateral: the per-outer-row LIMIT must decorrelate to the
    window-rank + hash-join shape — never a per-row rescan (nested
    loop over the inner query)."""
    plan = _formatted_plan(spark, "subquery_lateral")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_q6_all_predicates_push_to_scan(spark):
    """tpch_q6: the canonical scan-bound query — every band predicate
    must reach the parquet reader, and nothing but a two-phase global
    agg may sit above the scan."""
    plan = _formatted_plan(spark, "tpch_q6_forecast_revenue")
    pushed = next(l for l in plan.splitlines() if "PushedFilters" in l)
    for frag in (
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount",
        "LessThanOrEqual(l_discount",
        "LessThan(l_quantity",
    ):
        assert frag in pushed, f"{frag} not pushed:\n{pushed}"
    assert "Join" not in plan


def test_q21_exists_pair_stays_hash_joins(spark):
    """tpch_q21: the EXISTS/NOT-EXISTS pair (equi-key + supplier
    inequality residual) must run as hash/merge semi+anti joins — a
    BroadcastNestedLoopJoin here is quadratic in lines-per-order."""
    plan = _formatted_plan(spark, "tpch_q21_waiting_supplier")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_q2_correlated_min_is_one_window_pass(spark):
    """tpch_q2: the correlated MIN subquery must decorrelate into ONE
    window over the joined frame — the join chain may not execute twice
    (the naive plan re-runs part⋈bridge⋈suppliers for the subquery)."""
    import re

    plan = _formatted_plan(spark, "tpch_q2_min_cost_supplier")
    n_windows = len(re.findall(r"^\(\d+\) Window\b", plan, re.MULTILINE))
    assert n_windows == 1, f"expected exactly 1 window pass, saw {n_windows}"
    # one scan of lineitem feeds the bridge; the subquery must not add one
    assert plan.count("lineitem.parquet") == 1, "lineitem scanned more than once"


def test_q15_max_is_broadcast_back_not_second_pass(spark):
    """tpch_q15: the scalar MAX must come from a 1-row re-aggregate of
    the revenue frame broadcast back — lineitem is scanned at most twice
    (once per agg branch), never re-joined at fact grain."""
    plan = _formatted_plan(spark, "tpch_q15_top_supplier")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_incremental_dedup_is_prefix_equi_join(spark):
    """dedup_incremental: candidates must come from the prefix-shingle
    equi-join — batch × corpus may never appear as a nested loop — and
    (r9) the verify must stay on the packed-long bitmap path (a
    regression to per-candidate string-array joins moved ~10× the
    bytes; bit_count in the plan is the bitmap fold's signature)."""
    plan = _formatted_plan(spark, "dedup_incremental")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "bit_count" in plan


@pytest.mark.parametrize("key", ["pipe_pii_scrub", "emb_random_projection"])
def test_scan_bound_ops_have_no_exchange(spark, key):
    """The PII scrub and JL projection claim zero-shuffle scan-bound
    plans — one Exchange anywhere means a per-row map silently grew an
    aggregation or join."""
    plan = _formatted_plan(spark, key)
    assert "Exchange" not in plan, f"{key} plan gained a shuffle:\n{plan[:600]}"


def test_null_split_join_unions_null_bypass(spark):
    """join_null_split: the NULL probe rows must bypass the join via a
    Union — and nothing may degrade to a nested loop."""
    plan = _formatted_plan(spark, "join_null_split")
    assert "Union" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "key", ["agg_sliding_distinct", "agg_timeseries_densify", "win_forward_fill"]
)
def test_timeseries_ops_stay_equi_join(spark, key):
    plan = _formatted_plan(spark, key)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q20_semi_joins_no_cartesian(spark):
    """tpch_q20: both membership checks (pairs ⋉ promo parts, supplier ⋉
    qualifying suppkeys) must be broadcast semi-joins; the surplus
    threshold must not reintroduce a second lineitem pass (exactly one
    lineitem scan) or any nested-loop/cartesian shape."""
    plan = _formatted_plan(spark, "tpch_q20_part_surplus")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("LeftSemi") >= 2
    # the one-scan gate must stand on its own (an OR with a total-scan
    # bound let a second lineitem pass slip through unnoticed)
    scan_lines = [
        ln for ln in plan.splitlines()
        if "Scan parquet" in ln or "lineitem.parquet" in ln
    ]
    lineitem_scans = sum("lineitem" in ln for ln in scan_lines)
    assert lineitem_scans == 1, f"expected 1 lineitem scan, saw {lineitem_scans}"


def test_interval_overlap_is_binned_equi_join(spark):
    """join_interval_overlap: candidates must come from the day-bin hash
    equi-join — the definitional inequality theta join (nested loop)
    may never appear in the physical plan."""
    plan = _formatted_plan(spark, "join_interval_overlap")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_corr_powersum_single_agg_pass(spark):
    """agg_corr_powersum: all nine accumulators ride ONE partial+final
    hash aggregate over one scan — no per-pair recomputation, no join."""
    import re

    plan = _formatted_plan(spark, "agg_corr_powersum")
    n_scans = len(re.findall(r"^\(\d+\) Scan parquet", plan, re.MULTILINE))
    assert n_scans == 1, f"expected 1 scan, saw {n_scans}"
    assert "Join" not in plan
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE))
    assert n_exchanges == 1, f"expected 1 exchange, saw {n_exchanges}"


def test_url_parse_zero_exchange(spark):
    """fn_url_parse: stateless projection — zero exchanges."""
    plan = _formatted_plan(spark, "fn_url_parse")
    assert "Exchange" not in plan


def test_zscore_stats_broadcast_back(spark):
    """win_zscore_outlier: the 5-row stats frame must broadcast back
    onto the events scan — a sort-merge join or a raw-stream window
    sort here would be a 100 TB regression."""
    plan = _formatted_plan(spark, "win_zscore_outlier")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan


def test_spatial_grid_no_cartesian(spark):
    """join_spatial_grid: candidates come from the 3x3-neighborhood
    cell equi-join — never an all-pairs nested loop."""
    plan = _formatted_plan(spark, "join_spatial_grid")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_skew_kurtosis_single_agg_pass(spark):
    """agg_skew_kurtosis: five accumulators in ONE partial+final agg."""
    import re

    plan = _formatted_plan(spark, "agg_skew_kurtosis")
    n_scans = len(re.findall(r"^\(\d+\) Scan parquet", plan, re.MULTILINE))
    assert n_scans == 1
    assert "Join" not in plan


def test_dpp_prunes_month_partitions(spark):
    """scan_dpp_prune: the executed scan must carry a
    dynamicpruningexpression partition filter AND actually read fewer
    partition directories than exist in the staged layout."""
    plan = _executed_plan(spark, "scan_dpp_prune")
    assert "dynamicpruning" in plan.lower(), plan[:1500]


def test_scd2_join_is_equi_keyed(spark):
    """join_scd2_pointintime: the interval predicate must ride the
    custkey equi-join as a residual — a BETWEEN-only join would plan a
    nested loop."""
    plan = _formatted_plan(spark, "join_scd2_pointintime")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ols_trend_single_agg_pass(spark):
    """agg_ols_trend: sufficient statistics in ONE partial+final agg."""
    import re

    plan = _formatted_plan(spark, "agg_ols_trend")
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.MULTILINE)) == 1
    assert "Join" not in plan


def test_bigram_lm_no_cartesian_vocab_scalar_broadcast(spark):
    """text_bigram_lm: scoring joins are keyed on (token, next)/(token);
    the vocab scalar rides a broadcast — no unkeyed nested loop over
    the bigram stream (BroadcastNestedLoopJoin is legal ONLY for the
    1-row vocab scalar cross join)."""
    plan = _formatted_plan(spark, "text_bigram_lm")
    assert "CartesianProduct" not in plan


def test_basket_pairs_keyed_join_and_topn(spark):
    """agg_basket_pairs: pair generation must be the orderkey equi-join
    (fan-out bounded by basket size) and the final top-N must be a
    TakeOrderedAndProject, never a global sort of the pair frame."""
    plan = _formatted_plan(spark, "agg_basket_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan


@pytest.mark.parametrize(
    "key", ["join_spatial_grid", "join_interval_overlap", "join_scd2_pointintime"]
)
@pytest.mark.parametrize("sf_dir", [SF_DIR, BENCH_SF_DIR])
def test_blocked_joins_hold_at_bench_sf(spark, key, sf_dir):
    """The r4 blocked-join shapes must stay equi-joins at the bench SF
    as well — larger input stats must never flip the planner to a
    nested loop."""
    plan = _formatted_plan_at(spark, key, sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_runtime_bloomfilter_arms_fact_scan(spark):
    """join_runtime_bloomfilter: under the operator's session confs the
    fact scan must carry a might_contain runtime filter fed by a
    bloom_filter_agg subquery over the selective build side."""
    from random_forest_using_hadoop_spark.operators.scale_ext2 import (
        _BLOOM_CONFS,
        _bloom_join,
    )

    prior = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    for k, v in _BLOOM_CONFS.items():
        spark.conf.set(k, v)
    try:
        df = _bloom_join(spark, SF_DIR)
        jvm = spark._jvm
        plan = df._jdf.queryExecution().explainString(
            jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    finally:
        for k, v in prior.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert "might_contain" in plan, plan[:2000]
    assert "bloom_filter_agg" in plan


def test_pareto_no_global_window_over_user_frame(spark):
    """agg_pareto_point: the rank/cumsum over the per-user frame must be
    a slice-partitioned window (distributed two-pass cumulative sum) —
    an un-partitioned Window over the user rows funnels every user
    through ONE task at 100 TB. The only un-partitioned windows allowed
    are the ones over the ≤33-row slice partials (psum/pcnt)."""
    import re

    plan = _executed_plan(spark, "agg_pareto_point")
    win_specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    user_frame_specs = [s for s in win_specs if "v_fx" in s]
    assert user_frame_specs, "expected a window over the user frame"
    for spec in user_frame_specs:
        assert "slice" in spec, (
            f"user-frame window lost its slice partitioning: {spec}"
        )


@pytest.mark.parametrize(
    "key",
    ["graph_triangle_count", "text_pmi_collocations", "dedup_lsh_audit"],
)
def test_r5_pair_generators_stay_equi_join(spark, key):
    """The r5 pair-generating operators (wedge joins, positional bigram
    self-join, LSH band/shingle joins) must never degrade to a
    CartesianProduct or un-broadcast nested loop — their whole design is
    candidate generation through hash equi-joins."""
    plan = _formatted_plan(spark, key)
    assert "CartesianProduct" not in plan
    # BroadcastNestedLoopJoin only with a bounded build side (the 1-row
    # count stitches / 7-row lag spine); a non-broadcast NLJ never
    assert "NestedLoopJoin" not in plan.replace("BroadcastNestedLoopJoin", "")


def test_snapshot_timetravel_v1_read_excludes_append(spark):
    """sink_snapshot_timetravel: the two versioned reads must go through
    explicit manifest file lists, and v1's row count must be strictly
    below v2's (the append is invisible to the pinned manifest)."""
    rows = {
        r["version"]: r
        for r in engine.REGISTRY["sink_snapshot_timetravel"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert set(rows) == {1, 2}
    assert 0 < rows[1]["n_rows"] < rows[2]["n_rows"]


@pytest.mark.parametrize(
    "key", ["agg_rfm_segmentation", "ml_decile_lift"]
)
def test_rfm_no_global_window_over_customer_frame(spark, key):
    """Every NTILE/decile must derive from the distributed two-pass
    rank (helpers.dist_row_number) — each window spec partitioned by
    the range-slice id, never an un-partitioned WindowExec pulling the
    whole ranked frame through one task."""
    import re

    plan = _executed_plan(spark, key)
    win_specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert win_specs, "expected rank windows in the plan"
    sliced = [w for w in win_specs if "_rn_pid" in w]
    assert sliced, "expected at least one slice-partitioned rank window"
    for spec in win_specs:
        # the only un-partitioned windows allowed are cumulative frames
        # over the <=10-row decile summary, bounded by construction
        assert "_rn_pid" in spec or "decile" in spec, (
            f"rank window lost its slice partitioning: {spec}"
        )


def test_minhash_verify_is_broadcast_bitmap_join(spark):
    """dedup_minhash: the band self-join must be a hash equi-join (the
    no-Cartesian sweep covers the negative), and the exact-Jaccard
    verify must attach the per-doc bitmap encodings via broadcast hash
    joins — candidates stream past the small build side, never a
    shuffle of the candidate pairs against the corpus."""
    plan = _formatted_plan(spark, "dedup_minhash")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2, plan[:3000]
    assert "bit_count" in plan  # bitmap verify, not array_intersect


def test_epoch_shuffle_rank_windows_are_sliced(spark):
    """pipe_epoch_shuffle: both per-epoch global ranks must come from
    the distributed two-pass rank — every window spec partitioned by
    the range-slice id, never an un-partitioned WindowExec over the
    corpus."""
    import re

    plan = _executed_plan(spark, "pipe_epoch_shuffle")
    win_specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert win_specs, "expected rank windows in the epoch-shuffle plan"
    for spec in win_specs:
        assert "_rn_pid" in spec, (
            f"epoch-shuffle rank window lost its slice partitioning: {spec}"
        )


def test_countmin_probe_broadcasts_sketch(spark):
    """agg_countmin_heavy: the probe side must broadcast the <=d*w-cell
    sketch (KB-size mergeable state), never shuffle the key list
    against it; and the whole plan stays equi-join shaped."""
    plan = _formatted_plan(spark, "agg_countmin_heavy")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_substring_winnow_join_input_is_winnowed_and_capped(spark):
    """r8 gate for the last Σdf² hot-key exposure: the pair join of
    dedup_substring_winnow must consume the WINNOWED, df-capped hash
    set — the winnow selection (array_min over a sliding slice) and the
    df-cap filter must both sit below the self-join, and the join
    itself must be a hash equi-join."""
    plan = _formatted_plan(spark, "dedup_substring_winnow")
    assert "array_min" in plan and "slice" in plan, "winnow selection missing"
    from random_forest_using_hadoop_spark.operators.dedup_lsh import (
        _WINNOW_DF_CAP,
    )

    assert f"<= {_WINNOW_DF_CAP}" in plan, "df cap not applied before join"
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_chunk_dedup_is_single_equi_join_no_pairs(spark):
    """dedup_chunk_exact's scale claim: chunk-level dedup needs NO pair
    join — one chunk-df hash aggregate plus one equi-join of tokens to
    their df. A second join (or any non-equi join) in the plan means
    the pairwise shape crept back in."""
    plan = _formatted_plan(spark, "dedup_chunk_exact")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    import re

    # count join NODES once each: formatted explain prints every node
    # twice (tree line + '(n) NodeName' detail header) — match headers
    n_joins = len(
        re.findall(
            r"^\(\d+\) (?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)",
            plan,
            re.MULTILINE,
        )
    )
    assert n_joins == 1, f"expected exactly one equi-join, saw {n_joins}"
    assert plan.count("HashAggregate") >= 2  # partial + final df count


def test_mv_delta_scan_pushes_cutoff_predicate(spark):
    """sink_mv_delta_maintenance's scale claim: the delta leg must read
    only the tail partition — the cutoff predicate has to reach the
    parquet scan as a pushed filter, not a post-scan Filter over
    history."""
    plan = _formatted_plan(spark, "sink_mv_delta_maintenance")
    assert "GreaterThanOrEqual(o_orderdate" in plan, (
        "cutoff predicate did not push to the delta scan"
    )


def test_delta_partition_prune_reads_only_pruned_files(spark):
    """src_delta_partition_prune's scale claim: the predicate selects
    files from the LOG's partitionValues alone, so the parquet scans'
    input files must be EXACTLY the two wanted partitions' files —
    opening an excluded partition's file (or falling back to a
    directory listing of the table root) fails here even though the
    aggregate would still be correct."""
    df = engine.REGISTRY["src_delta_partition_prune"].fn(spark, SF_DIR)
    files = df.inputFiles()
    assert files, "no scan input files resolved"
    import re

    parts = {
        m.group(1)
        for f in files
        for m in [re.search(r"o_orderpriority=([^/]+)/", f)]
        if m
    }
    assert parts == {"1-URGENT", "2-HIGH"}, (
        f"scan read partitions {parts}, expected only the pruned pair"
    )
    # and the JSON log itself is not part of the DATA scan
    assert not [f for f in files if f.endswith(".json")]


def test_iceberg_partition_prune_reads_only_pruned_files(spark):
    """src_iceberg_partition_prune's scale claim: the predicate selects
    files from MANIFEST partition tuples alone, so the parquet scans'
    input files must be EXACTLY the wanted partitions' LIVE files —
    opening an excluded partition's file, a DELETED entry's file (both
    parities of 1-URGENT still exist on disk), or falling back to a
    directory listing fails here even though the aggregate could still
    be correct."""
    df = engine.REGISTRY["src_iceberg_partition_prune"].fn(spark, SF_DIR)
    files = df.inputFiles()
    assert files, "no scan input files resolved"
    import re

    parts = {
        m.group(1)
        for f in files
        for m in [re.search(r"o_orderpriority=([^/]+)/", f)]
        if m
    }
    assert parts == {"2-HIGH", "5-LOW"}, (
        f"scan read partitions {parts}, expected only the pruned pair"
    )
    # manifests/metadata are not part of the DATA scan
    assert not [f for f in files if f.endswith((".avro", ".json", ".text"))]


def test_iceberg_stats_prune_reads_proper_subset(spark):
    """src_iceberg_stats_prune's scale claim: the range predicate
    selects files from MANIFEST VALUE BOUNDS alone, and on the
    range-clustered 8-file layout the surviving set must be a PROPER
    subset (files were actually skipped) that exactly matches the scan's
    input files — opening a file whose [min, max] misses the range fails
    here even though the row filter keeps the aggregate correct."""
    import os

    from random_forest_using_hadoop_spark.operators.iceberg_ext import (
        _stats_surviving_iceberg_files,
    )
    from random_forest_using_hadoop_spark.operators.scans import _tmp

    df = engine.REGISTRY["src_iceberg_stats_prune"].fn(spark, SF_DIR)
    root = _tmp(SF_DIR, "iceberg_stats")
    survivors, total = _stats_surviving_iceberg_files(root)
    assert 0 < len(survivors) < total, (
        f"bounds pruning must skip files: kept {len(survivors)}/{total}"
    )
    from urllib.parse import unquote

    scanned = {
        unquote(f).removeprefix("file://").removeprefix("file:")
        for f in df.inputFiles()
    }
    assert scanned == {os.path.abspath(p) for p in survivors}


def test_iceberg_bucket_lookup_scans_only_target_buckets(spark):
    """src_iceberg_bucket_transform's scale claim: point lookups open
    only the looked-up keys' buckets — the 5 fixture keys hash to
    buckets {3, 4} of 8 (spec murmur3), so the scan's input files must
    sit in exactly those bucket dirs (when both have data)."""
    import re

    from random_forest_using_hadoop_spark.iceberg_format import (
        iceberg_bucket_long,
    )
    from random_forest_using_hadoop_spark.operators.iceberg_ext import (
        _BUCKET_LOOKUP_KEYS,
        _N_BUCKETS,
    )

    targets = {
        iceberg_bucket_long(k, _N_BUCKETS) for k in _BUCKET_LOOKUP_KEYS
    }
    assert targets == {3, 4}, "fixture keys pin 2 target buckets of 8"
    df = engine.REGISTRY["src_iceberg_bucket_transform"].fn(spark, SF_DIR)
    files = df.inputFiles()
    assert files, "no scan input files resolved"
    scanned = {
        int(m.group(1))
        for f in files
        for m in [re.search(r"o_orderkey_bucket=(\d+)/", f)]
        if m
    }
    assert scanned <= targets and scanned, (
        f"scan read buckets {scanned}, target {targets}"
    )


def test_iceberg_year_transform_prunes_years(spark):
    """src_iceberg_year_transform's scale claim: the [1996, 1998) date
    predicate maps to year ordinals {26, 27}, and the scan must open
    ONLY those ordinals' files (the staged table spans more years)."""
    import re

    df = engine.REGISTRY["src_iceberg_year_transform"].fn(spark, SF_DIR)
    files = df.inputFiles()
    assert files, "no scan input files resolved"
    scanned = {
        int(m.group(1))
        for f in files
        for m in [re.search(r"o_orderdate_year=(\d+)/", f)]
        if m
    }
    assert scanned <= {26, 27} and scanned, (
        f"scan read year ordinals {scanned}, expected within {{26, 27}}"
    )
    # and the table genuinely spans more years than the pruned pair
    import os

    from random_forest_using_hadoop_spark.operators.scans import _tmp

    base = os.path.join(_tmp(SF_DIR, "iceberg_year"), "data", "s1")
    all_years = {
        int(d.split("=", 1)[1])
        for d in os.listdir(base)
        if d.startswith("o_orderdate_year=")
    }
    assert len(all_years) > len(scanned), "fixture must have years to skip"


def test_delta_stats_skipping_reads_only_surviving_files(spark):
    """src_delta_stats_skipping's scale claim: the range predicate
    selects files from the LOG's add.stats min/max alone, so the
    parquet scan's input files must be exactly the stats-surviving set
    — and on the range-clustered 8-file layout that set must be a
    PROPER subset (files were actually skipped). Opening a file whose
    [min, max] interval misses the predicate range fails here even
    though the row-level filter would keep the aggregate correct."""
    import os

    from random_forest_using_hadoop_spark.operators.delta_ext import (
        _SKIP_HI,
        _SKIP_LO,
        _stats_surviving_files,
    )
    from random_forest_using_hadoop_spark.operators.scans import _tmp

    df = engine.REGISTRY["src_delta_stats_skipping"].fn(spark, SF_DIR)
    files = {os.path.basename(f) for f in df.inputFiles()}
    assert files, "no scan input files resolved"
    root = _tmp(SF_DIR, "delta_stats")
    surviving = {
        os.path.basename(p)
        for p in _stats_surviving_files(
            spark, os.path.join(root, "_delta_log"), _SKIP_LO, _SKIP_HI
        )
    }
    all_files = {
        f
        for f in os.listdir(os.path.join(root, "data"))
        if f.endswith(".parquet")
    }
    assert files == surviving, (
        f"scan read {sorted(files - surviving)} beyond the surviving set"
    )
    assert surviving < all_files, (
        "stats pruned nothing on the range-clustered layout — "
        "the skip rule is inert"
    )


# --- r13: Iceberg delete-application join shape gates ---------------------------


def test_iceberg_eq_delete_single_anti_join(spark):
    """src_iceberg_eq_delete's scale claim: ALL equality-delete files
    (the fixture stages TWO, range-split like a real CDC commit) apply
    in EXACTLY ONE anti-join — a per-delete-file join loop would grow
    plan depth with every landed delete commit, unbounded for a stream
    that commits once a minute. Counted on the optimized logical plan."""
    df = engine.REGISTRY["src_iceberg_eq_delete"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LeftAnti") == 1, plan


def test_iceberg_delete_broadcast_is_stats_gated(spark):
    """The delete side of BOTH Iceberg delete-application anti-joins
    must not be hint-forced broadcast: the hint applies only when the
    manifests' record_count says the set fits. With the gate forced
    shut (cap = 0) and size-based auto-broadcast disabled, the
    anti-join must plan as a shuffle join — proving nothing in the code
    path forces a 100 TB delete backlog through every executor."""
    from random_forest_using_hadoop_spark.operators import iceberg_ext

    conf = spark.conf
    old_thresh = conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_cap = iceberg_ext._DELETE_BROADCAST_MAX_ROWS
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        iceberg_ext._DELETE_BROADCAST_MAX_ROWS = 0
        for key in ("src_iceberg_pos_delete", "src_iceberg_eq_delete"):
            df = engine.REGISTRY[key].fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().sparkPlan().toString()
            anti = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
            assert anti, f"{key}: no anti-join in physical plan"
            assert not any("Broadcast" in ln for ln in anti), (
                f"{key}: anti-join still broadcasts with the gate shut:\n"
                + "\n".join(anti)
            )
    finally:
        iceberg_ext._DELETE_BROADCAST_MAX_ROWS = old_cap
        conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)


def test_iceberg_delete_broadcast_open_gate_hints(spark):
    """Converse of the shut-gate test: under the cap the delete side IS
    hinted (small delete sets should never shuffle the 100 TB data
    side), visible as a broadcast anti-join in the default-conf plan."""
    df = engine.REGISTRY["src_iceberg_pos_delete"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    anti = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
    assert anti and all("Broadcast" in ln for ln in anti), (
        "small delete set did not broadcast:\n" + "\n".join(anti)
    )


def test_iceberg_spec_evolution_prunes_only_its_spec(spark):
    """src_iceberg_spec_evolution's pruning contract: the priority
    predicate prunes ONLY spec-1 (priority-partitioned) manifests —
    the scan must open EVERY spec-0 (status-partitioned) file (their
    tuples don't speak priority; a positional reader would drop them
    all) and EXACTLY the two wanted priority partitions of spec-1."""
    import os

    from random_forest_using_hadoop_spark.operators.scans import _tmp

    df = engine.REGISTRY["src_iceberg_spec_evolution"].fn(spark, SF_DIR)
    files = df.inputFiles()
    assert files, "no scan input files resolved"
    from urllib.parse import unquote

    scanned = {
        unquote(f).removeprefix("file://").removeprefix("file:")
        for f in files
    }
    root = _tmp(SF_DIR, "iceberg_specevo")
    s1 = os.path.join(root, "data", "s1")
    staged_s1 = {
        os.path.join(s1, d, f)
        for d in os.listdir(s1)
        if d.startswith("o_orderstatus=")
        for f in os.listdir(os.path.join(s1, d))
        if f.endswith(".parquet")
    }
    assert len(staged_s1) >= 2, "fixture must stage multiple status files"
    assert staged_s1 <= scanned, (
        "spec-0 files were mis-pruned by the spec-1 predicate: missing "
        f"{sorted(staged_s1 - scanned)[:3]}"
    )
    s2_parts = {
        m.group(1)
        for f in scanned
        for m in [re.search(r"/s2/o_orderpriority=([^/]+)/", f)]
        if m
    }
    assert s2_parts == {"2-HIGH", "5-LOW"}, (
        f"spec-1 scan read partitions {s2_parts}, expected the pruned pair"
    )


def test_delta_liquid_clustering_skips_by_discovered_column(spark):
    """src_delta_liquid_clustering's scale claim: the clustering column
    comes from the delta.clustering domainMetadata (never hardcoded)
    and the scan opens ONLY the files whose stats interval on that
    column overlaps the predicate — a proper subset of the 8-file
    clustered layout."""
    import os

    from random_forest_using_hadoop_spark.operators.delta_ext import (
        _LIQ_HI,
        _LIQ_LO,
        _delta_clustering_columns,
        _stats_surviving_files_for,
    )
    from random_forest_using_hadoop_spark.operators.scans import _tmp

    df = engine.REGISTRY["src_delta_liquid_clustering"].fn(spark, SF_DIR)
    files = {os.path.basename(f) for f in df.inputFiles()}
    assert files, "no scan input files resolved"
    root = _tmp(SF_DIR, "delta_liquid")
    log_dir = os.path.join(root, "_delta_log")
    assert _delta_clustering_columns(log_dir) == ["o_custkey"]
    surviving = {
        os.path.basename(p)
        for p in _stats_surviving_files_for(
            spark, log_dir, "o_custkey", _LIQ_LO, _LIQ_HI
        )
    }
    all_files = {
        f
        for f in os.listdir(os.path.join(root, "data"))
        if f.endswith(".parquet")
    }
    assert files == surviving, (
        f"scan read {sorted(files - surviving)} beyond the surviving set"
    )
    assert surviving < all_files, (
        "clustering stats pruned nothing on the range-clustered layout"
    )


def test_iceberg_multifield_spec_prunes_to_one_cell(spark):
    """src_iceberg_multifield_spec's pruning contract: the conjunctive
    (priority, status) point predicate prunes on the FULL tuple — the
    scan opens only the one cell's files out of the many staged
    (priority × status) cells; first-value-only pruning would open
    every status under 1-URGENT."""
    import os

    df = engine.REGISTRY["src_iceberg_multifield_spec"].fn(spark, SF_DIR)
    files = df.inputFiles()
    assert files, "no scan input files resolved"
    from urllib.parse import unquote

    cells = {
        (m.group(1), m.group(2))
        for f in files
        for m in [
            re.search(
                r"o_orderpriority=([^/]+)/o_orderstatus=([^/]+)/", unquote(f)
            )
        ]
        if m
    }
    assert cells == {("1-URGENT", "F")}, f"scan read cells {cells}"
    # the staged layout genuinely has more cells than the pruned one
    from random_forest_using_hadoop_spark.operators.scans import _tmp

    base = os.path.join(_tmp(SF_DIR, "iceberg_mspec"), "data", "s1")
    n_cells = sum(
        1
        for d1 in os.listdir(base)
        if d1.startswith("o_orderpriority=")
        for d2 in os.listdir(os.path.join(base, d1))
        if d2.startswith("o_orderstatus=")
    )
    assert n_cells > 1, "fixture must stage multiple cells"


def test_delta_row_tracking_ids_unique_and_watermarked(spark):
    """src_delta_row_tracking's lineage contract: derived row ids are
    globally UNIQUE and the log's rowIdHighWaterMark equals the highest
    assigned id — the invariant that makes fresh ids safe to assign
    concurrently at 100 TB."""
    import json
    import os

    from pyspark.sql import functions as F

    from random_forest_using_hadoop_spark.operators.scans import (
        _norm_file_uri,
        _tmp,
    )

    engine.REGISTRY["src_delta_row_tracking"].fn(spark, SF_DIR).collect()
    root = _tmp(SF_DIR, "delta_rowtrack")
    log_dir = os.path.join(root, "_delta_log")
    adds, hwm = [], None
    for f in sorted(os.listdir(log_dir)):
        if not f.endswith(".json"):
            continue
        for line in open(os.path.join(log_dir, f)):
            if not line.strip():
                continue
            act = json.loads(line)
            if "add" in act:
                adds.append(act["add"])
            dm = act.get("domainMetadata")
            if dm and dm["domain"] == "delta.rowTracking":
                hwm = json.loads(dm["configuration"])["rowIdHighWaterMark"]
    base_map = spark.createDataFrame(
        [(os.path.join(root, a["path"]), a["baseRowId"]) for a in adds],
        "file_path string, base long",
    )
    ids = (
        spark.read.parquet(*sorted(os.path.join(root, a["path"]) for a in adds))
        .select(
            _norm_file_uri(F.input_file_name()).alias("_fp"),
            F.col("_metadata.row_index").alias("_pos"),
        )
        .join(F.broadcast(base_map), F.col("_fp") == base_map["file_path"])
        .select((F.col("base") + F.col("_pos")).alias("rid"))
    )
    stats = ids.agg(
        F.count("rid").alias("n"),
        F.countDistinct("rid").alias("d"),
        F.max("rid").alias("mx"),
        F.min("rid").alias("mn"),
    ).collect()[0]
    assert stats["n"] == stats["d"], "row ids collide"
    assert stats["mn"] == 0 and stats["mx"] == hwm, (
        f"ids span [{stats['mn']}, {stats['mx']}], watermark {hwm}"
    )


def test_iceberg_manifest_prune_skips_whole_manifest(spark):
    """src_iceberg_manifest_prune's planning contract: the 5-LOW point
    query must skip the low-range manifest AT THE LIST LEVEL (never
    opened — the ScanReport metric records exactly one skip of m-low)
    and the scan must open only the 5-LOW partition's files."""
    import os

    from random_forest_using_hadoop_spark.operators import iceberg_ext

    df = engine.REGISTRY["src_iceberg_manifest_prune"].fn(spark, SF_DIR)
    rep = dict(iceberg_ext._LAST_SCAN_REPORT)
    assert rep["manifests_total"] == 2, rep
    assert rep["manifests_skipped"] == 1, rep
    assert [os.path.basename(p) for p in rep["skipped_paths"]] == [
        "m-low.avro"
    ], rep
    from urllib.parse import unquote

    parts = {
        m.group(1)
        for f in df.inputFiles()
        for m in [re.search(r"o_orderpriority=([^/]+)/", unquote(f))]
        if m
    }
    assert parts == {"5-LOW"}, parts


def test_delta_log_compaction_minimal_segment(spark):
    """src_delta_log_compaction's planning contract: the reader's
    segment is exactly [0.3.compacted.json, commit 4] — never the five
    raw commits — and the compacted file alone suffices for the
    covered range (proven by deleting c0..c3 and re-reading)."""
    import json
    import os

    from random_forest_using_hadoop_spark.operators import delta_ext
    from random_forest_using_hadoop_spark.operators.delta_ext import (
        _delta_log_segment,
    )
    from random_forest_using_hadoop_spark.operators.scans import _tmp

    engine.REGISTRY["src_delta_log_compaction"].fn(spark, SF_DIR).collect()
    assert delta_ext._LAST_LOG_SEGMENT == [
        f"{0:020d}.{3:020d}.compacted.json",
        f"{4:020d}.json",
    ], delta_ext._LAST_LOG_SEGMENT
    # the compacted range is self-sufficient: remove c0..c3 → same live set
    root = _tmp(SF_DIR, "delta_logcompact")
    log_dir = os.path.join(root, "_delta_log")

    def _live(files):
        live = {}
        for f in files:
            for line in open(os.path.join(log_dir, f)):
                if not line.strip():
                    continue
                act = json.loads(line)
                if "add" in act:
                    live[act["add"]["path"]] = True
                elif "remove" in act:
                    live.pop(act["remove"]["path"], None)
        return set(live)

    before = _live(_delta_log_segment(log_dir))
    for v in range(4):
        os.remove(os.path.join(log_dir, f"{v:020d}.json"))
    after = _live(_delta_log_segment(log_dir))
    assert before == after and before, "compacted file must be sufficient"
    # without ANY compaction file the fallback replays raw commits
    os.remove(os.path.join(log_dir, f"{0:020d}.{3:020d}.compacted.json"))
    assert _delta_log_segment(log_dir) == [f"{4:020d}.json"]


def test_iceberg_meta_files_reads_zero_data(spark):
    """src_iceberg_meta_files' scale claim: the $partitions-style view
    is pure planner metadata — the result plan touches ZERO parquet
    inputs while still reporting accurate per-partition record counts."""
    df = engine.REGISTRY["src_iceberg_meta_files"].fn(spark, SF_DIR)
    assert df.inputFiles() == [], df.inputFiles()


def test_iceberg_rollback_keeps_history_reachable(spark):
    """sink_iceberg_rollback's forensics contract: after the pointer
    flip to s1, the rolled-back-FROM snapshots (s2, s3) remain fully
    readable by id — rollback hides nothing until snapshot expiry."""
    from random_forest_using_hadoop_spark.operators.iceberg_ext import (
        _S1,
        _S2,
        _S3,
        _iceberg_live_files,
        _iceberg_snapshot,
        _iceberg_table_meta,
    )
    from random_forest_using_hadoop_spark.operators.scans import _tmp

    engine.REGISTRY["sink_iceberg_rollback"].fn(spark, SF_DIR).collect()
    meta = _iceberg_table_meta(_tmp(SF_DIR, "iceberg_rollback"))
    assert meta["current-snapshot-id"] == _S1
    f1 = _iceberg_live_files(_iceberg_snapshot(meta))
    f2 = _iceberg_live_files(_iceberg_snapshot(meta, snapshot_id=_S2))
    f3 = _iceberg_live_files(_iceberg_snapshot(meta, snapshot_id=_S3))
    assert {p for p, _, _ in f1} < {p for p, _, _ in f2}
    # s3 dropped the urgent partition; s2 still carries it
    assert {v for _, v, _ in f2} - {v for _, v, _ in f3} == {"1-URGENT"}


# --- r14: Iceberg changelog scan gates ------------------------------------------


def test_changelog_single_scan_per_side_and_join_constant(spark):
    """src_iceberg_changelog's scale claim: plan size depends on the
    number of PARTITION VALUES (identity-partition restoration) and
    delete MODALITIES — never on how many delete files or commits
    landed in the range. The fixture stages 2 equality-delete files and
    one position-delete file per affected partition; both must ride
    ONE scan relation each, and delete application must be exactly one
    join per modality."""
    from random_forest_using_hadoop_spark.operators.iceberg_ext import _S2
    from random_forest_using_hadoop_spark.operators.lake_r14 import (
        _changelog_plan,
    )
    from random_forest_using_hadoop_spark.operators.scans import _tmp

    df = engine.REGISTRY["src_iceberg_changelog"].fn(spark, SF_DIR)
    plan = _changelog_plan(_tmp(SF_DIR, "iceberg_changelog"), from_id=_S2)
    assert len({v for _, v, _ in plan["inserted"]}) >= 2
    assert len(plan["eq_files"]) >= 2, "fixture must shard eq deletes"
    assert len(plan["pos_files"]) >= 2, "fixture must shard pos deletes"
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    # r15: ONE relation per SIDE — inserted, removed, base (referenced
    # by both delete branches, so it appears twice), eq keys, pos pairs
    # — independent of partition-value count too (the identity value
    # rides the broadcast path map, not a per-value scan union)
    assert opt.count("Relation [") == 6, opt
    # joins: ins+rem ordinal maps (2) + per delete modality: base
    # ordinal map + base seq map + delete-file map + ONE apply (4×2)
    assert opt.count("Join ") == 10, opt


def test_changelog_delete_apply_broadcast_is_stats_gated(spark):
    """With the manifest-cardinality gate forced shut and size-based
    auto-broadcast off, the two delete-APPLY joins must shuffle — the
    bounded metadata maps may stay hinted, but nothing forces a 100 TB
    delete backlog through every executor."""
    from random_forest_using_hadoop_spark.operators import iceberg_ext

    conf = spark.conf
    old_thresh = conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_cap = iceberg_ext._DELETE_BROADCAST_MAX_ROWS
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        iceberg_ext._DELETE_BROADCAST_MAX_ROWS = 0
        df = engine.REGISTRY["src_iceberg_changelog"].fn(spark, SF_DIR)
        phys = df._jdf.queryExecution().sparkPlan().toString()
        shuffled = phys.count("SortMergeJoin") + phys.count(
            "ShuffledHashJoin"
        )
        assert shuffled == 2, (
            f"expected the 2 delete-apply joins to shuffle, got "
            f"{shuffled}:\n{phys}"
        )
    finally:
        iceberg_ext._DELETE_BROADCAST_MAX_ROWS = old_cap
        conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)


def test_changelog_skips_replace_snapshots(spark):
    """The s6 compaction (operation=replace) must contribute NOTHING:
    no ordinal beyond 3, no s6 data path on the insert side, and no
    removed-file entries for the compacted s4 shards."""
    from random_forest_using_hadoop_spark.operators.iceberg_ext import _S2
    from random_forest_using_hadoop_spark.operators.lake_r14 import (
        _changelog_plan,
    )
    from random_forest_using_hadoop_spark.operators.scans import _tmp

    engine.REGISTRY["src_iceberg_changelog"].fn(spark, SF_DIR)
    root = _tmp(SF_DIR, "iceberg_changelog")
    plan = _changelog_plan(root, from_id=_S2)
    ordinals = (
        {o for _, _, o in plan["inserted"]}
        | {o for _, _, o in plan["removed"]}
        | {d["ordinal"] for d in plan["eq_files"]}
        | {d["ordinal"] for d in plan["pos_files"]}
    )
    assert max(ordinals) == 3
    assert not any("/s6/" in p for p, _, _ in plan["inserted"])
    assert not any("/s4/" in p for p, _, _ in plan["removed"])


def test_changelog_carried_manifests_keep_original_sequence(spark):
    """Fixture fidelity (the r13 advice finding, applied here from the
    start): a manifest-list entry for a carried-over manifest must keep
    the sequence number it was COMMITTED under, not be re-stamped with
    the referencing snapshot's."""
    import json as _json
    import os

    from random_forest_using_hadoop_spark.iceberg_format import ocf_read
    from random_forest_using_hadoop_spark.operators.scans import _tmp

    engine.REGISTRY["src_iceberg_changelog"].fn(spark, SF_DIR)
    root = _tmp(SF_DIR, "iceberg_changelog")
    meta_dir = os.path.join(root, "metadata")
    with open(os.path.join(meta_dir, "v6.metadata.json")) as fh:
        meta = _json.load(fh)
    by_id = {s["snapshot-id"]: s for s in meta["snapshots"]}
    committed_seq: dict[str, int] = {}
    for snap in meta["snapshots"]:
        _, manifests, _ = ocf_read(snap["manifest-list"])
        for m in manifests:
            path, seq = m["manifest_path"], m["sequence_number"]
            if m["added_snapshot_id"] == snap["snapshot-id"]:
                committed_seq.setdefault(path, seq)
            else:
                assert committed_seq.get(path, seq) == seq, (
                    f"carried manifest {os.path.basename(path)} re-stamped "
                    f"to seq {seq} in snapshot {snap['snapshot-id']}"
                )


def test_norm_file_uri_survives_plus_and_space(spark, tmp_path):
    """The planner/scan path-join contract (r13 advice): a data file
    whose directory carries a literal '+' AND a space must still
    equi-join between input_file_name (URI-encoded) and the planner's
    raw staged path. Plain url_decode is form-decoding and turns the
    '+' into a space — _norm_file_uri must not."""
    import os

    from pyspark.sql import functions as F

    from random_forest_using_hadoop_spark.operators.scans import (
        _norm_file_uri,
    )

    hostile = tmp_path / "pri=a+b c" / "part-0.parquet"
    os.makedirs(hostile.parent)
    spark.range(5).coalesce(1).write.mode("overwrite").parquet(
        str(hostile.parent)
    )
    (real,) = [
        str(hostile.parent / f)
        for f in os.listdir(hostile.parent)
        if f.endswith(".parquet")
    ]
    got = (
        spark.read.parquet(real)
        .select(_norm_file_uri(F.input_file_name()).alias("fp"))
        .distinct()
        .collect()
    )
    assert [r["fp"] for r in got] == [real], (
        f"normalized scan path {got} != raw staged path {real}"
    )


def test_iceberg_upsert_single_anti_join(spark):
    """sink_iceberg_upsert's scale claim: TWO landed upsert batches
    (two equality-delete files at different sequences) still apply in
    EXACTLY ONE anti-join — per-batch join chaining would grow plan
    depth with every CDC commit."""
    df = engine.REGISTRY["sink_iceberg_upsert"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LeftAnti") == 1, plan


def test_iceberg_upsert_commit_is_o_batch(spark):
    """The writer never rewrites existing data: after both upserts,
    every pre-upsert data file is byte-identical and every prior
    manifest is carried by path (no rewrite), so commit cost is
    O(batch) + O(manifest-list)."""
    import hashlib
    import os

    from random_forest_using_hadoop_spark.iceberg_format import ocf_read
    from random_forest_using_hadoop_spark.operators.iceberg_ext import (
        _iceberg_snapshot,
        _iceberg_table_meta,
    )
    from random_forest_using_hadoop_spark.operators.scans import _tmp

    root = _tmp(SF_DIR, "iceberg_upsert")
    # hash the base snapshots' data files, re-run the key, re-hash
    engine.REGISTRY["sink_iceberg_upsert"].fn(spark, SF_DIR).collect()

    def _digests():
        out = {}
        for sub in ("s1", "s2"):
            base = os.path.join(root, "data", sub)
            for dirpath, _, files in os.walk(base):
                for f in files:
                    if f.endswith(".parquet"):
                        p = os.path.join(dirpath, f)
                        out[p] = hashlib.md5(open(p, "rb").read()).hexdigest()
        return out

    base_digests = _digests()
    assert base_digests, "base data files missing"
    meta = _iceberg_table_meta(root)
    snap = _iceberg_snapshot(meta)
    _, manifests, _ = ocf_read(snap["manifest-list"])
    # the base rewrite manifest (m3) must be carried by PATH in the
    # final list — not copied or rewritten
    carried = [m for m in manifests if "m3-fixture" in m["manifest_path"]]
    assert carried and carried[0]["sequence_number"] == 3
    assert _digests() == base_digests


def test_merge_cdf_rewrites_only_overlapping_files(spark):
    """sink_delta_merge_cdf's pruning contract: the MERGE removes (and
    rewrites) EXACTLY the base files whose add.stats key interval
    overlaps the matched-key bounds — on the range-clustered sf0.01
    layout at least one base file must survive untouched, and no
    non-overlapping file may appear in the remove set."""
    import json as _json
    import os

    from random_forest_using_hadoop_spark.operators.lake_r14 import (
        _MERGE_KEY_BOUND,
    )
    from random_forest_using_hadoop_spark.operators.scans import _tmp

    engine.REGISTRY["sink_delta_merge_cdf"].fn(spark, SF_DIR).collect()
    root = _tmp(SF_DIR, "delta_merge_cdf")
    log_dir = os.path.join(root, "_delta_log")
    stats_by_path, removed = {}, set()
    with open(os.path.join(log_dir, f"{0:020d}.json")) as fh:
        for line in fh:
            add = _json.loads(line).get("add")
            if add:
                s = _json.loads(add["stats"])
                stats_by_path[add["path"]] = (
                    s["minValues"]["o_orderkey"],
                    s["maxValues"]["o_orderkey"],
                )
    with open(os.path.join(log_dir, f"{1:020d}.json")) as fh:
        for line in fh:
            rm = _json.loads(line).get("remove")
            if rm:
                removed.add(rm["path"])
    overlapping = {
        p for p, (lo, hi) in stats_by_path.items() if lo <= _MERGE_KEY_BOUND
    }
    assert removed == overlapping, (
        f"rewrite set {sorted(removed)} != stats-overlap set "
        f"{sorted(overlapping)}"
    )
    untouched = set(stats_by_path) - removed
    assert untouched, "bound pruned nothing on the range-clustered layout"
    for p in untouched:
        assert os.path.exists(os.path.join(root, p))


def test_rewrite_deletes_leaves_pure_scans(spark):
    """sink_iceberg_rewrite_deletes' contract: after the maintenance
    REPLACE commit, the manifest list carries ZERO delete manifests and
    the post-maintenance read plans NO anti-join — reads stop paying
    the delete-application cost the maintenance window bought out."""
    from random_forest_using_hadoop_spark.iceberg_format import ocf_read
    from random_forest_using_hadoop_spark.operators.iceberg_ext import (
        _iceberg_snapshot,
        _iceberg_table_meta,
    )
    from random_forest_using_hadoop_spark.operators.scans import _tmp

    df = engine.REGISTRY["sink_iceberg_rewrite_deletes"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftAnti" not in plan, plan
    root = _tmp(SF_DIR, "iceberg_upsert")
    meta = _iceberg_table_meta(root)
    snap = _iceberg_snapshot(meta)
    assert snap["summary"]["operation"] == "replace"
    _, manifests, _ = ocf_read(snap["manifest-list"])
    assert all(m["content"] == 0 for m in manifests), (
        "delete manifests survived the rewrite"
    )
    # history intact: the pre-maintenance snapshot is still readable
    # and still carries its delete manifests
    prev = meta["snapshot-log"][-2]["snapshot-id"]
    _, prev_manifests, _ = ocf_read(
        _iceberg_snapshot(meta, snapshot_id=prev)["manifest-list"]
    )
    assert any(m["content"] == 1 for m in prev_manifests)


def test_wap_publish_is_metadata_only(spark):
    """sink_iceberg_publish_wap's contract: the PUBLISH commit writes
    ONE new metadata.json and nothing else — no data file, no manifest,
    no manifest list. Proven by diffing the tree around the publish:
    v5.metadata.json must reference only objects that already existed
    at v4."""
    import json as _json
    import os

    from random_forest_using_hadoop_spark.iceberg_format import ocf_read
    from random_forest_using_hadoop_spark.operators.scans import _tmp

    engine.REGISTRY["sink_iceberg_publish_wap"].fn(spark, SF_DIR).collect()
    root = _tmp(SF_DIR, "iceberg_wap")
    meta_dir = os.path.join(root, "metadata")
    with open(os.path.join(meta_dir, "v4.metadata.json")) as fh:
        pre = _json.load(fh)
    with open(os.path.join(meta_dir, "v5.metadata.json")) as fh:
        post = _json.load(fh)
    # the published snapshot set is IDENTICAL — publish created nothing
    assert [s["snapshot-id"] for s in post["snapshots"]] == [
        s["snapshot-id"] for s in pre["snapshots"]
    ]
    assert {s["snapshot-id"]: s["manifest-list"]
            for s in post["snapshots"]} == {
        s["snapshot-id"]: s["manifest-list"] for s in pre["snapshots"]
    }
    # only the pointers moved
    assert pre["refs"]["main"]["snapshot-id"] != _iceberg_main(post)
    assert post["current-snapshot-id"] == _iceberg_main(post)
    assert post["refs"]["audit"] == pre["refs"]["audit"]
    # pre-publish main resolves to a snapshot that cannot see the wap
    # manifest; post-publish main can
    def _paths(meta, ref):
        sid = meta["refs"][ref]["snapshot-id"]
        snap = next(
            s for s in meta["snapshots"] if s["snapshot-id"] == sid
        )
        _, ms, _ = ocf_read(snap["manifest-list"])
        return {m["manifest_path"] for m in ms}

    assert _paths(post, "main") > _paths(pre, "main")


def _iceberg_main(meta):
    return meta["refs"]["main"]["snapshot-id"]


def test_changelog_removed_file_not_retargeted_by_later_deletes(spark):
    """r14 advice (lake_r14.py _changelog_plan): a data file captured
    into the delete-candidate base from an EARLY predecessor but
    REMOVED (entry status DELETED) at ordinal k must not be re-targeted
    by an equality delete at ordinal > k — its rows already flowed
    through the removal's own delete emission, and the seq predicate
    alone (data_seq < dseq) still passes after removal. Bespoke
    4-commit window: eq-delete (ord 1) → remove file X (ord 2) →
    eq-delete matching X's keys (ord 3)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from random_forest_using_hadoop_spark.iceberg_format import ocf_write
    from random_forest_using_hadoop_spark.operators.iceberg_ext import (
        _MANIFEST_FILE_SCHEMA,
        _S2,
        _S3,
        _ST_DELETED,
        _ST_EXISTING,
        _T3,
        _entry,
        _iceberg_stage,
        _pfiles,
        _write_manifest,
    )
    from random_forest_using_hadoop_spark.operators.lake_r14 import (
        _ST_ADDED,
        _append_snapshot,
        _changelog_plan,
        _changelog_rows,
        _mlrec,
    )
    from random_forest_using_hadoop_spark.operators.scans import _tmp

    o = spark.createDataFrame(
        [
            (k, 100.0 + k, "1-URGENT" if k % 5 == 0 else "3-MEDIUM")
            for k in range(1, 21)
        ],
        "o_orderkey long, o_totalprice double, o_orderpriority string",
    )
    root = _tmp(SF_DIR, "iceberg_changelog_rmtest")
    _iceberg_stage(spark, o, root)
    data_dir = os.path.join(root, "data")
    meta_dir = os.path.join(root, "metadata")
    m3 = os.path.join(meta_dir, "m3-fixture.avro")
    (x_even,) = [
        p for p, v in _pfiles(data_dir, "s1") if v == "3-MEDIUM"
    ]  # evens not %5: {2,4,6,8,12,14,16,18}
    (x_odd,) = [
        p for p, v in _pfiles(data_dir, "s2") if v == "3-MEDIUM"
    ]  # odds not %5: {1,3,7,9,11,13,17,19}
    _S4, _S5, _S6 = _S3 + 1, _S3 + 2, _S3 + 3

    def _eqdel(name: str, keys: list[int]) -> str:
        path = os.path.join(meta_dir, name)
        pq.write_table(
            pa.table({"o_orderkey": pa.array(keys, pa.int64())}), path
        )
        return path

    # ordinal 1 (S4): eq-delete key 3 (lives in the surviving odd file)
    m4d = _write_manifest(
        meta_dir,
        "m4-rmtest-del.avro",
        [_entry(_ST_ADDED, _S4, 4, _eqdel("eq-s4.parquet", [3]), None,
                equality_ids=[1], content=2)],
    )
    l4 = os.path.join(meta_dir, f"snap-{_S4}-1-rmtest.avro")
    ocf_write(
        l4, _MANIFEST_FILE_SCHEMA,
        [_mlrec(m3, 0, 3, _S3), _mlrec(m4d, 1, 4, _S4)],
        metadata={"format-version": "2"},
    )
    _append_snapshot(meta_dir, 4, _S4, 4, _T3 + 60_000, l4, "overwrite")

    # ordinal 2 (S5): REMOVE x_even (rewrite-style manifest)
    m5 = _write_manifest(
        meta_dir,
        "m5-rmtest-rm.avro",
        [
            _entry(_ST_DELETED, _S5, 5, x_even, "3-MEDIUM"),
            _entry(_ST_EXISTING, _S2, 2, x_odd, "3-MEDIUM"),
        ],
    )
    l5 = os.path.join(meta_dir, f"snap-{_S5}-1-rmtest.avro")
    ocf_write(
        l5, _MANIFEST_FILE_SCHEMA,
        [_mlrec(m5, 0, 5, _S5), _mlrec(m4d, 1, 4, _S4)],
        metadata={"format-version": "2"},
    )
    _append_snapshot(meta_dir, 5, _S5, 5, _T3 + 120_000, l5, "delete")

    # ordinal 3 (S6): eq-delete keys {8 (only ever in x_even), 9 (odd)}
    m6d = _write_manifest(
        meta_dir,
        "m6-rmtest-del.avro",
        [_entry(_ST_ADDED, _S6, 6, _eqdel("eq-s6.parquet", [8, 9]), None,
                equality_ids=[1], content=2)],
    )
    l6 = os.path.join(meta_dir, f"snap-{_S6}-1-rmtest.avro")
    ocf_write(
        l6, _MANIFEST_FILE_SCHEMA,
        [_mlrec(m5, 0, 5, _S5), _mlrec(m4d, 1, 4, _S4),
         _mlrec(m6d, 1, 6, _S6)],
        metadata={"format-version": "2"},
    )
    _append_snapshot(meta_dir, 6, _S6, 6, _T3 + 180_000, l6, "overwrite")

    plan = _changelog_plan(root, from_id=_S3)
    # the removed file is marked with its removal ordinal in base
    assert plan["base"][x_even][2] == 2
    rows = sorted(
        (r["change_ordinal"], r["change_type"], r["o_orderkey"])
        for r in _changelog_rows(spark, plan).collect()
    )
    expected = sorted(
        [(1, "delete", 3)]
        + [(2, "delete", k) for k in (2, 4, 6, 8, 12, 14, 16, 18)]
        + [(3, "delete", 9)]  # key 8 is ONLY in the removed file: no row
    )
    assert rows == expected, rows
