"""Round-7 semantics beyond generic oracle parity: invariants that a
hash-match alone wouldn't explain to a reader, pinned as executable
documentation (sibling of test_r5_semantics.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

import random_forest_using_hadoop_spark as engine
from tests.conftest import SF_DIR

engine.load_all()


def test_kaplan_meier_curve_shape(spark):
    rows = sorted(
        engine.REGISTRY["agg_kaplan_meier"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["day"],
    )
    assert rows, "events corpus has purchases [FIXTURES]"
    # at-risk counts shrink over event time; survival is a strictly
    # decreasing product of factors < 1, bounded in (0, 1]
    risks = [r["n_risk"] for r in rows]
    assert risks == sorted(risks, reverse=True)
    surv = [r["survival"] for r in rows]
    assert all(0.0 < s <= 1.0 for s in surv)
    assert all(a > b for a, b in zip(surv, surv[1:]))
    assert all(0 < r["n_events"] <= r["n_risk"] for r in rows)


def test_pr_curve_monotonicity_and_f1_identity(spark):
    rows = sorted(
        engine.REGISTRY["ml_pr_curve"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["k"],
    )
    # raising the threshold can only shrink the predicted-positive set
    pps = [r["pp"] for r in rows]
    assert pps == sorted(pps, reverse=True)
    recalls = [r["recall"] for r in rows]
    assert all(a >= b for a, b in zip(recalls, recalls[1:]))
    for r in rows:
        assert 0.0 <= r["precision"] <= 1.0 and 0.0 <= r["recall"] <= 1.0
        if r["precision"] + r["recall"] > 0:
            harm = (
                2 * r["precision"] * r["recall"]
                / (r["precision"] + r["recall"])
            )
            assert abs(r["f1"] - harm) < 1e-4  # 2TP/(PP+P) ≡ harmonic mean


def test_ewma_crossover_day_one_equals_revenue(spark):
    rows = sorted(
        engine.REGISTRY["win_ewma_crossover"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["day"],
    )
    # with one observation the normalized EWMA (and the SMA) is the
    # observation itself, and no crossover can exist yet
    first = rows[0]
    assert abs(first["ewma_fast"] - first["rev"]) < 1e-6
    assert abs(first["sma20"] - first["rev"]) < 1e-6
    assert first["crossover"] is False
    for r in rows:
        assert r["above"] == (r["ewma_fast"] > r["sma20"]) or abs(
            r["ewma_fast"] - r["sma20"]
        ) < 2e-6  # rounded columns may straddle the raw comparison


def test_ols_multi_fit_is_sane(spark):
    r = engine.REGISTRY["agg_ols_multi"].fn(spark, SF_DIR).collect()[0]
    # extended price rises with quantity (it's ~unit-price × quantity)
    assert r["b1"] > 0
    assert 0.0 < r["r2"] <= 1.0
    assert r["n_rows"] > 0


def test_winsorized_mean_bounds(spark):
    for r in engine.REGISTRY["agg_winsorized_mean"].fn(spark, SF_DIR).collect():
        assert r["p05"] <= r["p95"]
        # both robust means live inside the clamp interval
        assert r["p05"] <= r["winsor_mean"] <= r["p95"]
        assert r["p05"] <= r["trim_mean"] <= r["p95"]


def test_zipf_slope_is_negative_powerlaw(spark):
    r = engine.REGISTRY["text_zipf_slope"].fn(spark, SF_DIR).collect()[0]
    assert r["n_points"] > 10
    assert r["zipf_slope"] < 0  # frequency falls with rank, always
    assert 0.0 <= r["r2"] <= 1.0


def test_centroid_assign_partitions_corpus(spark):
    rows = engine.REGISTRY["sim_centroid_assign"].fn(spark, SF_DIR).collect()
    from random_forest_using_hadoop_spark.operators.analytics_r7 import (
        _K_CENTROIDS,
    )
    from random_forest_using_hadoop_spark.sources import load_table

    n_corpus = (
        load_table(spark, SF_DIR, "embeddings")
        .filter(F.col("vec_id") >= _K_CENTROIDS)
        .count()
    )
    # every non-centroid vector lands in exactly one cell
    assert sum(r["n_assigned"] for r in rows) == n_corpus
    assert all(r["avg_dist2"] >= 0.0 for r in rows)


def test_vwap_final_row_equals_global_ratio(spark):
    rows = sorted(
        engine.REGISTRY["win_vwap_cumulative"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["day"],
    )
    total_notional = sum(r["day_notional"] for r in rows)
    total_qty = sum(r["day_qty"] for r in rows)
    assert abs(rows[-1]["vwap_cum"] - total_notional / total_qty) < 1e-4


def test_new_vs_returning_first_day_all_new(spark):
    rows = sorted(
        engine.REGISTRY["agg_new_vs_returning"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["day"],
    )
    assert rows[0]["new_share"] == 1.0  # nobody predates the first day
    for r in rows:
        assert r["n_active"] == r["n_new"] + r["n_returning"]


def test_interorder_gap_percentiles_ordered(spark):
    r = engine.REGISTRY["agg_interorder_gaps"].fn(spark, SF_DIR).collect()[0]
    assert r["n_gaps"] > 0
    assert 0 <= r["p50_gap"] <= r["p90_gap"]
    assert r["mean_gap"] > 0


def test_bpe_pairs_support_bound_and_order(spark):
    rows = engine.REGISTRY["pipe_bpe_pair_stats"].fn(spark, SF_DIR).collect()
    assert len(rows) == 20
    occ = [r["n_occ"] for r in rows]
    assert occ == sorted(occ, reverse=True)
    for r in rows:
        assert len(r["pair"]) == 2
        assert r["n_occ"] >= r["n_tokens"]  # occurrences ≥ distinct tokens


def test_sql_cte_pipeline_rank_window(spark):
    rows = engine.REGISTRY["sql_cte_pipeline"].fn(spark, SF_DIR).collect()
    per_region: dict[str, list[int]] = {}
    for r in rows:
        assert 1 <= r["rk"] <= 3
        per_region.setdefault(r["region_name"], []).append(r["rk"])
    for ranks in per_region.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_json_gzip_roundtrip_lossless(spark):
    r = engine.REGISTRY["sink_json_gzip"].fn(spark, SF_DIR).collect()[0]
    assert r["n_roundtrip_mismatch"] == 0
    assert r["n_rows"] == r["n_docs"]  # doc_id unique through the codec


def test_dedup_rate_by_source_consistency(spark):
    for r in engine.REGISTRY["dedup_rate_by_source"].fn(spark, SF_DIR).collect():
        assert 0 < r["n_unique"] <= r["n_docs"]
        assert r["n_removable"] == r["n_docs"] - r["n_unique"]
        assert 0.0 <= r["dup_rate"] < 1.0


def test_multimodal_resize_halves_dimensions_exactly(spark):
    from random_forest_using_hadoop_spark.operators.multimodal import (
        _H_MOD,
        _H_OFF,
        _W_MOD,
        _W_OFF,
    )
    from random_forest_using_hadoop_spark.sources import load_table

    rows = {
        r["doc_id"]: r
        for r in engine.REGISTRY["multimodal_resize"].fn(spark, SF_DIR).collect()
    }
    src = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.length("text").alias("n")
    ).collect()
    for s in src:
        r = rows[s["doc_id"]]
        w, h = s["n"] % _W_MOD + _W_OFF, s["n"] % _H_MOD + _H_OFF
        assert r["width"] == (w + 1) // 2 and r["height"] == (h + 1) // 2
        assert r["roundtrip_ok"] is True  # re-decode reproduced the pixels
        assert 0 <= r["pixel_sum"] <= 255 * r["width"] * r["height"]


def test_bfs_hops_bounded_and_seeded(spark):
    from random_forest_using_hadoop_spark.operators.analytics_r7 import (
        _BFS_MAX_HOPS,
    )

    rows = engine.REGISTRY["graph_bfs_hops"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["hops"] <= _BFS_MAX_HOPS
        assert r["n_users"] > 0
    assert any(r["hops"] == 0 for r in rows)  # seeds exist in the graph


def test_abc_classes_partition_revenue(spark):
    rows = {
        r["abc_class"]: r
        for r in engine.REGISTRY["agg_abc_classification"].fn(spark, SF_DIR).collect()
    }
    assert set(rows) <= {"A", "B", "C"} and "A" in rows
    assert abs(sum(r["revenue_share"] for r in rows.values()) - 1.0) < 1e-4
    if "C" in rows:  # A holds most revenue in fewest parts by construction
        assert rows["A"]["revenue_share"] > rows["C"]["revenue_share"]


def test_csv_quoted_multiline_lossless(spark):
    r = engine.REGISTRY["scan_csv_quoted_multiline"].fn(spark, SF_DIR).collect()[0]
    assert r["n_roundtrip_mismatch"] == 0
    assert r["n_rows"] == r["n_docs"]


def test_span_corruption_rates_and_span_bounds(spark):
    rows = engine.REGISTRY["pipe_span_corruption"].fn(spark, SF_DIR).collect()
    assert rows
    tot_tok = sum(r["n_tokens"] for r in rows)
    tot_msk = sum(r["n_masked"] for r in rows)
    # global realized rate concentrates near the 15% target
    assert 0.10 < tot_msk / tot_tok < 0.20
    for r in rows:
        assert 0 <= r["n_masked"] <= r["n_tokens"]
        # every masked run contributes exactly one span
        assert r["n_spans"] <= r["n_masked"]
        assert (r["n_spans"] >= 1) == (r["n_masked"] >= 1)


def test_keyword_extraction_shape(spark):
    rows = engine.REGISTRY["text_keyword_tfidf_topk"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        kws = r["keywords"].split(",")
        assert 1 <= len(kws) <= 3
        assert all(k for k in kws)  # no empty keywords
        assert len(set(kws)) == len(kws)  # distinct terms
