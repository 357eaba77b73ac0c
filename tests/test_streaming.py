"""Streaming-specific semantics (SURVEY.md §5.3.4) beyond the generic
oracle-parity sweep: watermark late-drop and replay-vs-batch equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

import random_forest_using_hadoop_spark as engine
from random_forest_using_hadoop_spark.sources import load_table
from tests.conftest import SF_DIR

engine.load_all()


def test_watermark_drops_late_batch(spark):
    """B53: run 2's late batch must be dropped entirely — nothing emitted
    for it, and the state operator's drop counter equals the late row
    count; run 1's on-time windows match the batch truth."""
    out = engine.REGISTRY["stream_watermark_late"].fn(spark, SF_DIR)
    rows = out.collect()
    by_phase = {}
    for r in rows:
        by_phase.setdefault(r["phase"], []).append(r)

    assert not by_phase.get("late_emitted"), "late windows leaked through"

    ev = load_table(spark, SF_DIR, "events")
    lo, hi = ev.select(
        F.percentile_approx("ts", 0.25), F.percentile_approx("ts", 0.75)
    ).first()
    # numRowsDroppedByWatermark counts post-partial-agg rows (the drop
    # filter runs after map-side combine), so its floor is the number of
    # distinct late hour-windows, not raw late events.
    n_late_hours = (
        ev.filter(F.col("ts") <= lo)
        .select(F.date_trunc("hour", "ts"))
        .distinct()
        .count()
    )
    assert by_phase["dropped_late"][0]["n"] >= n_late_hours

    truth = {
        r["h"]: r["count"]
        for r in ev.filter(F.col("ts") >= hi)
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .count()
        .collect()
    }
    on_time = by_phase.get("on_time", [])
    assert on_time
    for r in on_time:
        assert truth.get(r["window_start"]) == r["n"]


def test_stream_equals_batch_tumbling(spark):
    """availableNow replay over the finite source ≡ the batch aggregate."""
    streamed = engine.REGISTRY["stream_tumbling"].fn(spark, SF_DIR)
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )
