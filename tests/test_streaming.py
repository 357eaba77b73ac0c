"""Streaming-specific semantics (SURVEY.md §5.3.4) beyond the generic
oracle-parity sweep: watermark late-drop and replay-vs-batch equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

import random_forest_using_hadoop_spark as engine
from random_forest_using_hadoop_spark.sources import load_table
from tests.conftest import SF_DIR

engine.load_all()


def test_watermark_drops_late_batch(spark):
    """B53: run 2's late batch must be dropped entirely (late_ok audit
    row = 1), and run 1's on-time windows must match the batch truth of
    the newest day-quartile below the final watermark."""
    out = engine.REGISTRY["stream_watermark_late"].fn(spark, SF_DIR)
    rows = out.collect()
    by_phase = {}
    for r in rows:
        by_phase.setdefault(r["phase"], []).append(r)

    assert by_phase["late_ok"][0]["n"] == 1, "late batch leaked or no drops"

    ev = load_table(spark, SF_DIR, "events")
    days = sorted(
        r[0]
        for r in ev.select(F.date_trunc("day", "ts").alias("d")).distinct().collect()
    )
    hi = days[(3 * len(days)) // 4]
    ot = ev.filter(F.date_trunc("day", "ts") >= F.lit(hi))
    wm = ot.agg(F.max("ts")).first()[0]
    import datetime

    wm = wm - datetime.timedelta(minutes=10)
    truth = {
        r["h"]: r["count"]
        for r in ot.groupBy(F.date_trunc("hour", "ts").alias("h")).count().collect()
        if r["h"] + datetime.timedelta(hours=1) <= wm
    }
    on_time = by_phase.get("on_time", [])
    assert on_time and len(on_time) == len(truth)
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
