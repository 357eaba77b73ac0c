"""Round-5 semantics beyond generic oracle parity: invariants that a
hash-match alone wouldn't explain to a reader, pinned as executable
documentation."""

from __future__ import annotations

from pyspark.sql import functions as F

import random_forest_using_hadoop_spark as engine
from tests.conftest import SF_DIR

engine.load_all()


def test_matryoshka_recall_bounds_and_self_consistency(spark):
    rows = engine.REGISTRY["emb_matryoshka_recall"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r["n_overlap"] <= 10
        assert abs(r["recall_at_10"] - r["n_overlap"] / 10.0) < 1e-9
    # truncation to a quarter of the dims must still retain signal on
    # structured (label-clustered) embeddings — not collapse to noise
    # (a noise ranker would overlap ≈ 10·(10/corpus) ≪ 1 per query)
    assert sum(r["n_overlap"] for r in rows) >= 5


def test_lsh_audit_counts_are_consistent(spark):
    r = engine.REGISTRY["dedup_lsh_audit"].fn(spark, SF_DIR).collect()[0]
    assert r["n_hits"] <= min(r["n_candidates"], r["n_true_pairs"])
    assert r["n_true_pairs"] > 0  # planted dup groups exist [FIXTURES]
    # identical-prefix planted groups share shingles so banding must
    # recover a substantial fraction of the truth set
    assert r["recall"] >= 0.5, r


def test_triangle_count_consistency(spark):
    r = engine.REGISTRY["graph_triangle_count"].fn(spark, SF_DIR).collect()[0]
    assert r["n_nodes"] >= 0 and r["n_edges"] >= 0
    if r["n_edges"] > 0:
        assert r["n_nodes"] >= 2
        # each triangle needs 3 distinct edges
        assert r["n_triangles"] <= r["n_edges"] ** 3


def test_drawdown_nonnegative_and_day_counts(spark):
    rows = engine.REGISTRY["win_max_drawdown"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["max_drawdown"] >= 0.0
        assert r["n_days"] > 0


def test_pareto_rewrite_matches_naive_global_window(spark):
    """The sliced two-pass cumulative sum must reproduce the naive
    single-window formulation bit-for-bit — the distribution trick is
    only legitimate if it is lossless."""
    from pyspark.sql import Window

    from random_forest_using_hadoop_spark.sources import load_table

    ev = load_table(spark, SF_DIR, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(F.floor(F.col("value") * 1000000.0 + 0.5).cast("bigint")).alias(
            "v_fx"
        )
    )
    wo = Window.orderBy(F.col("v_fx").desc(), "user_id")
    wall = Window.partitionBy()
    naive = (
        u.select(
            F.row_number().over(wo).alias("rk"),
            F.sum("v_fx")
            .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .alias("cum_fx"),
            F.sum("v_fx").over(wall).alias("tot_fx"),
            F.count(F.lit(1)).over(wall).alias("n_users"),
        )
        .filter(F.col("cum_fx").cast("double") / F.col("tot_fx") >= 0.8)
        .orderBy("rk")
        .limit(1)
        .collect()
    )
    fast = engine.REGISTRY["agg_pareto_point"].fn(spark, SF_DIR).collect()
    assert len(fast) == len(naive) == 1
    assert fast[0]["users_to_80pct"] == naive[0]["rk"]
    assert fast[0]["n_users"] == naive[0]["n_users"]


def test_asof_nearest_picks_closer_side(spark):
    rows = (
        engine.REGISTRY["join_asof_nearest"]
        .fn(spark, SF_DIR)
        .filter(F.col("nearest_ts").isNotNull())
        .limit(200)
        .collect()
    )
    assert rows
    for r in rows:
        assert r["gap_us"] >= 0
        gap = abs((r["nearest_ts"] - r["ts"]).total_seconds() * 1_000_000)
        assert round(gap) == r["gap_us"]


def test_ablation_curve_is_monotone(spark):
    rows = sorted(
        engine.REGISTRY["pipe_quality_ablation"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["min_chars"],
    )
    assert len(rows) == 8
    for a, b in zip(rows, rows[1:]):
        assert a["docs_kept"] >= b["docs_kept"]
        assert a["tokens_kept"] >= b["tokens_kept"]


def test_learning_curve_counts_nest(spark):
    rows = sorted(
        engine.REGISTRY["ml_learning_curve"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["frac"],
    )
    assert [r["frac"] for r in rows] == [0.25, 0.5, 1.0]
    assert rows[0]["n_train"] < rows[1]["n_train"] < rows[2]["n_train"]
    assert len({r["n_test"] for r in rows}) == 1


def test_countmin_never_undercounts(spark):
    rows = engine.REGISTRY["agg_countmin_heavy"].fn(spark, SF_DIR).collect()
    assert len(rows) == 10
    for r in rows:
        # the CMS structural guarantee: est >= exact, always
        assert r["overcount"] >= 0
        assert r["est_cnt"] == r["exact_cnt"] + r["overcount"]


def test_bloom_has_no_false_negatives(spark):
    r = engine.REGISTRY["agg_bloom_membership"].fn(spark, SF_DIR).collect()[0]
    # every member must test positive, so positives >= members and
    # positives - members == false positives exactly
    assert r["n_bloom_positive"] >= r["n_members"]
    assert r["n_bloom_positive"] - r["n_members"] == r["n_false_positives"]
    assert 0 <= r["measured_fpr"] <= 1.0
    assert r["n_members"] > 0


def test_incremental_diff_classifies_all_three(spark):
    rows = {
        r["change_type"]: r
        for r in engine.REGISTRY["sink_incremental_diff"].fn(spark, SF_DIR).collect()
    }
    assert set(rows) == {"insert", "update", "delete"}
    for r in rows.values():
        assert r["n_rows"] > 0 and r["key_checksum"] > 0


def test_hll_portable_regime_and_error(spark):
    r = engine.REGISTRY["agg_hll_portable"].fn(spark, SF_DIR).collect()[0]
    # graded scales sit in the raw-HLL regime: n > 2.5m = 80
    assert r["exact_distinct"] > 80
    # This is ONE fixed deterministic hash draw, not a statistical
    # sample: at sf0.01 (n ~ 4.7m) the m=32 estimator sits in HLL++'s
    # known upward-bias zone and measures +0.65 here. The rail guards
    # against implementation breaks (wrong alpha / bucket math give
    # x2-x10 errors), not sampling noise.
    assert abs(r["rel_err"]) < 0.8, r
    assert 0 <= r["n_zero_registers"] < 32


def test_src_xml_round_trip_counts(spark):
    rows = engine.REGISTRY["src_xml"].fn(spark, SF_DIR).collect()
    assert sum(r["n_nations"] for r in rows) == 25  # TPC-H nation count


def test_epoch_shuffle_balance_and_independence(spark):
    rows = engine.REGISTRY["pipe_epoch_shuffle"].fn(spark, SF_DIR).collect()
    assert len(rows) == 16  # 2 epochs x 8 shards
    n = sum(r["n_docs"] for r in rows) // 2
    sizes = [r["n_docs"] for r in rows]
    assert max(sizes) - min(sizes) <= 1  # contiguous split balance
    # independent permutations displace by ~n/3 on average; a rotation
    # or identity would sit far outside [n/6, n/2]
    disp = rows[0]["mean_displacement"]
    assert n / 6 < disp < n / 2, (disp, n)
    # epochs must produce different orders: checksums differ per shard
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r["epoch"], []).append(r["order_checksum"])
    assert sorted(by_epoch[0]) != sorted(by_epoch[1])


def test_audio_codec_round_trip_physics(spark):
    rows = engine.REGISTRY["multimodal_audio_codec"].fn(spark, SF_DIR).collect()
    assert len(rows) == 500  # one track per doc at sf0.01
    for r in rows[:50]:
        assert r["n_samples"] in {2000, 2500, 3000, 3500, 4000}
        assert abs(r["duration_ms"] - r["n_samples"] * 1000.0 / 16000) < 1e-9
        # samples are ~uniform over the int16 range, so RMS must sit
        # near 65536/sqrt(12) ~ 18919 — a decode that dropped bytes or
        # mis-parsed endianness lands far outside this band
        assert 17000 < r["rms"] < 21000, r


def test_ohlc_candle_invariants(spark):
    rows = engine.REGISTRY["win_ohlc_candles"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]
        assert r["volume"] > 0


def test_welch_ttest_dof_bounds(spark):
    r = engine.REGISTRY["agg_welch_ttest"].fn(spark, SF_DIR).collect()[0]
    # Welch dof lies between min(n)-1 and n_a+n_b-2
    assert min(r["n_a"], r["n_b"]) - 1 <= r["welch_dof"] <= r["n_a"] + r["n_b"] - 2
    # even/odd cohorts of the same process: means close, |t| modest
    assert abs(r["t_stat"]) < 10


def test_rank_stats_consistency(spark):
    mwu = engine.REGISTRY["agg_mannwhitney_u"].fn(spark, SF_DIR).collect()[0]
    ks = engine.REGISTRY["agg_ks_test"].fn(spark, SF_DIR).collect()[0]
    # U is bounded by n_a * n_b
    assert 0 <= mwu["u_a"] <= mwu["n_a"] * mwu["n_b"]
    # same process in both cohorts: tests should not scream
    assert abs(mwu["z_stat"]) < 10
    assert 0 <= ks["ks_d"] <= 1
    # the two operators see the identical pooled sample
    assert (mwu["n_a"], mwu["n_b"]) == (ks["n_a"], ks["n_b"])


def test_vocab_coverage_bounds(spark):
    rows = engine.REGISTRY["pipe_vocab_coverage"].fn(spark, SF_DIR).collect()
    assert len(rows) == 20  # src0..src19
    for r in rows:
        assert 0 < r["coverage"] <= 1
        assert abs(r["coverage"] + r["oov_rate"] - 1.0) < 1e-9
        assert r["n_covered"] <= r["n_tokens"]


def test_auc_matches_pairwise_definition(spark):
    """The rank-sum AUC must equal the definitional P(score_pos >
    score_neg) + 0.5 P(tie), computed by brute force on a sample."""
    import itertools

    from random_forest_using_hadoop_spark.sources import load_table

    r = engine.REGISTRY["ml_auc_exact"].fn(spark, SF_DIR).collect()[0]
    assert 0 <= r["auc"] <= 1
    assert abs(r["gini"] - (2 * r["auc"] - 1)) < 1e-5
    d = load_table(spark, SF_DIR, "documents").select("n_chars", "lang").collect()
    pos = [x["n_chars"] for x in d if x["lang"] == "en"]
    neg = [x["n_chars"] for x in d if x["lang"] != "en"]
    wins = sum(1.0 if p > n else (0.5 if p == n else 0.0)
               for p, n in itertools.product(pos, neg))
    assert abs(r["auc"] - wins / (len(pos) * len(neg))) < 1e-6


def test_spearman_in_range(spark):
    r = engine.REGISTRY["agg_spearman_corr"].fn(spark, SF_DIR).collect()[0]
    assert -1.0 <= r["spearman_rho"] <= 1.0
    # daily volume and daily value total are strongly coupled
    assert r["spearman_rho"] > 0.5, r


def test_bollinger_sigma_nonneg_and_frames(spark):
    rows = engine.REGISTRY["win_bollinger_bands"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["sigma"] >= 0
        assert 1 <= r["n_in_frame"] <= 20


def test_rsi_bounds(spark):
    rows = engine.REGISTRY["win_rsi_indicator"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["rsi"] <= 100.0


def test_agg_pushdown_engaged_and_conf_restored(spark):
    before = spark.conf.get("spark.sql.sources.useV1SourceList", "__unset__")
    r = engine.REGISTRY["scan_agg_pushdown"].fn(spark, SF_DIR).collect()[0]
    assert r["agg_pushed"] is True  # metadata-only path really engaged
    assert r["custkey_lo"] >= 0 and r["custkey_hi"] > r["custkey_lo"]
    after = spark.conf.get("spark.sql.sources.useV1SourceList", "__unset__")
    assert before == after  # the v2-reader conf must not leak


def test_dictionary_round_trip_lossless(spark):
    r = engine.REGISTRY["sink_dictionary_encode"].fn(spark, SF_DIR).collect()[0]
    assert r["n_roundtrip_mismatch"] == 0
    assert r["n_dict"] == 5  # orders has five priorities
    assert r["n_rows"] > 0


def test_kmv_estimates_sane(spark):
    r = engine.REGISTRY["agg_kmv_theta_setops"].fn(spark, SF_DIR).collect()[0]
    # KMV with k=64 has rsd ~ 1/sqrt(k-2) ~ 13%; allow 5 sigma
    for est, exact in [
        (r["est_purchasers"], r["exact_purchasers"]),
        (r["est_viewers"], r["exact_viewers"]),
    ]:
        assert abs(est - exact) / exact < 0.65, (est, exact)
    # set-algebra consistency: |A∪B| >= max single set est; inclusion-
    # exclusion roughly holds on the sketch estimates
    assert r["est_union"] >= max(r["est_purchasers"], r["est_viewers"]) * 0.8
    assert r["est_intersection"] <= r["est_union"]


def test_log2_histogram_partitions_rows(spark):
    from random_forest_using_hadoop_spark.sources import load_table

    rows = engine.REGISTRY["agg_log2_histogram"].fn(spark, SF_DIR).collect()
    total = load_table(spark, SF_DIR, "events").filter("value > 0").count()
    assert sum(r["n"] for r in rows) == total  # buckets partition rows
    for r in rows:
        assert r["lo"] <= r["hi"]
        assert r["lo"] * 2 > r["hi"]  # factor-2 band


def test_url_canonical_collapses_variant_groups(spark):
    r = engine.REGISTRY["pipe_url_canonical_dedup"].fn(spark, SF_DIR).collect()[0]
    # doc_ids 0..n-1 in groups of 4 decorated variants per canonical
    # URL: every group must collapse to exactly one canonical form
    assert r["n_canonical"] == (r["n_urls"] + 3) // 4
    assert r["n_dup_removed"] == r["n_urls"] - r["n_canonical"]


def test_user_paths_deterministic_and_ranked(spark):
    rows = engine.REGISTRY["agg_user_path_patterns"].fn(spark, SF_DIR).collect()
    assert len(rows) == 20
    counts = [r["n_users"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert set(r["path5"]) <= set("cvpse")  # click/view/purchase/signup/error


def test_missing_file_resilience_is_genuine(spark):
    """The staged race must actually trip the missing-file path: the
    same read WITHOUT ignoreMissingFiles must fail, and the operator's
    tolerant read must return exactly the surviving partitions."""
    import os
    import shutil

    import pytest

    from random_forest_using_hadoop_spark.operators.scans import _tmp
    from random_forest_using_hadoop_spark.sources import load_table

    rows = engine.REGISTRY["scan_missing_file_resilient"].fn(spark, SF_DIR).collect()
    assert sorted(r["l_returnflag"] for r in rows) == ["A", "N"]
    li = load_table(spark, SF_DIR, "lineitem")
    exp = {
        r["l_returnflag"]: r["n"]
        for r in li.filter("l_returnflag <> 'R'")
        .groupBy("l_returnflag")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert {r["l_returnflag"]: r["n"] for r in rows} == exp
    # negative control: the identical race without the conf must throw
    path = _tmp(SF_DIR, "missing_file_neg")
    li.select("l_orderkey", "l_returnflag").write.mode("overwrite").partitionBy(
        "l_returnflag"
    ).parquet(path)
    back = spark.read.parquet(path)
    shutil.rmtree(os.path.join(path, "l_returnflag=R"), ignore_errors=True)
    with pytest.raises(Exception, match="FILE_NOT_EXIST|FileNotFound"):
        back.count()


def test_interpolation_lies_between_neighbors(spark):
    rows = (
        engine.REGISTRY["win_gap_fill_interpolate"]
        .fn(spark, SF_DIR)
        .orderBy("user_id", "day")
        .collect()
    )
    assert rows
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    checked = 0
    for seq in by_user.values():
        # spine is contiguous daily; interpolated values must lie in
        # the closed interval of the surrounding observed values
        obs_idx = [i for i, r in enumerate(seq) if not r["is_interpolated"]]
        assert obs_idx[0] == 0 and obs_idx[-1] == len(seq) - 1
        for a, b in zip(obs_idx, obs_idx[1:]):
            lo = min(seq[a]["value_interp"], seq[b]["value_interp"])
            hi = max(seq[a]["value_interp"], seq[b]["value_interp"])
            for i in range(a + 1, b):
                assert lo - 1e-6 <= seq[i]["value_interp"] <= hi + 1e-6
                checked += 1
    assert checked > 100


def test_histogram_percentiles_match_buffered_exact(spark):
    """The histogram derivation must agree with Spark's own exact
    buffered percentile aggregate on the same quantized values."""
    from random_forest_using_hadoop_spark.sources import load_table

    got = {
        r["event_type"]: r
        for r in engine.REGISTRY["agg_percentile_histogram"].fn(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events").select(
        "event_type",
        F.floor(F.col("value") * 100.0 + 0.5).cast("bigint").alias("vf"),
    )
    pct = F.percentile("vf", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    ref = {
        r["event_type"]: r
        for r in ev.groupBy("event_type").agg(pct.alias("p")).collect()
    }
    for t, r in got.items():
        for i, name in enumerate(["p50", "p90", "p99"]):
            assert abs(r[name] - ref[t]["p"][i] / 100.0) < 1e-6, (t, name)


def test_asof_tolerance_bounds_staleness(spark):
    rows = (
        engine.REGISTRY["join_asof_tolerance"]
        .fn(spark, SF_DIR)
        .filter("matched")
        .limit(300)
        .collect()
    )
    assert rows
    for r in rows:
        gap = (r["ts"] - r["prev_purchase_ts"]).total_seconds()
        assert 0 < gap <= 30 * 60  # strictly earlier, within tolerance


def test_ipv4_subnets_partition_users(spark):
    from random_forest_using_hadoop_spark.sources import load_table

    rows = engine.REGISTRY["fn_ipv4_subnet"].fn(spark, SF_DIR).collect()
    n_users = (
        load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    )
    assert sum(r["n_hosts"] for r in rows) == n_users
    for r in rows:
        assert 0 <= r["min_host_part"] <= r["max_host_part"] <= 65535


def test_srm_no_alarm_on_hash_split(spark):
    r = engine.REGISTRY["agg_srm_guard"].fn(spark, SF_DIR).collect()[0]
    # even/odd id split is a true 50/50 design: chi2 small, no alarm
    assert r["srm_alarm"] is False
    assert r["chi2"] < 10.828
    assert abs(r["n_a"] - r["n_b"]) < (r["n_a"] + r["n_b"]) / 4


def test_decile_lift_structure(spark):
    rows = sorted(
        engine.REGISTRY["ml_decile_lift"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    caps = [r["cum_capture"] for r in rows]
    assert caps == sorted(caps)  # capture is cumulative
    assert abs(caps[-1] - 1.0) < 1e-9  # all positives captured by D10
    assert abs(rows[-1]["cum_lift"] - 1.0) < 1e-9  # full-pop lift is 1


def test_minhash_banding_recall_total_on_truth_set(spark):
    """Recall gate (r7): the PRODUCTION 8-band × 2-row xxhash banding
    must emit a candidate for EVERY pair at or above the 0.6 decision
    threshold on the test corpus — the measured backstop for the
    probabilistic (1−J²)⁸ miss-rate argument in
    _minhash_band_candidates. A banding-parameter change that silently
    drops a qualifying pair fails here before it ships."""
    from random_forest_using_hadoop_spark.operators.dedup_lsh import (
        _JACCARD_T,
        _docs_with_shingles,
        _minhash_band_candidates,
    )

    d = _docs_with_shingles(spark, SF_DIR).cache()
    cand = _minhash_band_candidates(d)
    sz = d.select("doc_id", F.size("shingles").alias("n"))
    tok = d.select("doc_id", F.explode("shingles").alias("s"))
    inter = (
        tok.alias("a")
        .join(
            tok.alias("b"),
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    truth = (
        inter.join(sz.alias("sa"), F.col("sa.doc_id") == F.col("a"))
        .join(sz.alias("sb"), F.col("sb.doc_id") == F.col("b"))
        .filter(
            F.col("i")
            / (F.col("sa.n") + F.col("sb.n") - F.col("i")).cast("double")
            >= _JACCARD_T
        )
        .select("a", "b")
    )
    n_truth = truth.count()
    assert n_truth > 0  # planted dup groups exist [FIXTURES]
    missed = truth.join(cand, ["a", "b"], "left_anti").count()
    assert missed == 0, f"banding lost {missed}/{n_truth} qualifying pairs"
    d.unpersist()
