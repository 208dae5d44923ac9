"""Live watermark-drop accounting, pinned to Spark's REAL semantics.

The batch `late_data_accounting` query models a per-row watermark; this
test pins what Structured Streaming actually does, empirically verified
(Spark 4.1, file source, availableNow, append mode):

- progress(b).eventTime.watermark = max(event_time over batches 0..b-1)
  − delay: the value used for state EVICTION/EMISSION at the END of
  batch b;
- the late-row filter IN FORCE during batch b is the PREVIOUS batch's
  reported watermark (one batch of lag): a row drops iff its window end
  <= reported_wm(b−1);
- append mode emits a window (once, final count) at the end of the
  first batch whose reported watermark reaches the window end; windows
  the final watermark never passes are never emitted.

Four deterministic micro-batches plant a drop, a late-but-allowed row,
and an exact window_end == watermark boundary drop; the test asserts
the reported watermark sequence AND the emitted windows against this
model."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

_MIN_NS = 60 * 1_000_000_000
_WIN = "10 minutes"
_DELAY = "5 minutes"
_WIN_NS = 10 * _MIN_NS
_DELAY_NS = 5 * _MIN_NS

# batch -> [(user, t_minutes)]
_ROWS = {
    # windows [0,10) and [20,30); max t = 29
    0: [(1, 5.0), (1, 29.0)],
    # advances the reported wm to 29-5 = 24 min at this batch's end
    1: [(2, 35.0)],
    # in-force wm = 24 min:
    #  t=2  -> window [0,10)  end 10 <= 24 -> DROPPED
    #  t=22 -> window [20,30) end 30 >  24 -> kept (late but allowed)
    #  t=36 -> window [30,40) -> kept
    2: [(3, 2.0), (3, 22.0), (3, 36.0)],
    # in-force wm = 35-5 = 30 min:
    #  t=25 -> window [20,30) end 30 <= 30 -> DROPPED (exact boundary)
    #  t=31 -> window [30,40) -> kept
    3: [(4, 25.0), (4, 31.0)],
}


def _model():
    """Returns (reported wm per batch in epoch sec, emitted {win_start:
    n}) under the lagged-watermark semantics above."""
    reported, kept = [], []
    max_seen = 0
    for b in sorted(_ROWS):
        inforce = reported[-1] if reported else 0
        # reported wm for batch b uses batches 0..b-1 ONLY (the current
        # batch's max folds in afterwards — empirically verified lag)
        wm_report = max(0, max_seen - _DELAY_NS) // 1_000_000_000
        for u, tmin in _ROWS[b]:
            t = int(tmin * _MIN_NS)
            win_end_s = ((t // _WIN_NS) + 1) * (_WIN_NS // 1_000_000_000)
            if not (inforce > 0 and win_end_s <= inforce):
                kept.append(t)
            max_seen = max(max_seen, t)
        reported.append(wm_report)
    final_wm = reported[-1]
    emitted = {}
    for t in kept:
        ws = (t // _WIN_NS) * (_WIN_NS // 1_000_000_000)
        if ws + _WIN_NS // 1_000_000_000 <= final_wm:  # wm passed the end
            emitted[ws] = emitted.get(ws, 0) + 1
    return reported, emitted


def test_watermark_advancement_and_drops_match_model(spark, tmp_path):
    src = tmp_path / "late_src"
    src.mkdir()
    for b in sorted(_ROWS):
        data = [(u, int(t * _MIN_NS)) for u, t in _ROWS[b]]
        spark.createDataFrame(data, "user_id bigint, ts bigint").coalesce(
            1
        ).write.parquet(str(src / f"f{b}"))
        time.sleep(1.1)  # distinct mtimes → deterministic batch order

    stream = (
        spark.readStream.schema("user_id bigint, ts bigint")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
        .withColumn("event_time", F.timestamp_micros(F.expr("ts div 1000")))
        .withWatermark("event_time", _DELAY)
    )
    agg = stream.groupBy(F.window("event_time", _WIN)).agg(
        F.count(F.lit(1)).alias("n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_check")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    want_wms, want_emitted = _model()
    # the planted scenario: [0,10) emits WITHOUT the dropped t=2 (n=1),
    # [20,30) emits with the allowed t=22 but not the boundary t=25
    # (n=2), [30,40) never emits (final wm 31 < end 40)
    assert want_emitted == {0: 1, 1200: 2}

    # calendar.timegm: the watermark string is UTC — mktime-minus-timezone
    # breaks by the DST offset under DST-observing hostile TZs
    import calendar

    got_wms = [
        calendar.timegm(
            time.strptime(p["eventTime"]["watermark"], "%Y-%m-%dT%H:%M:%S.%fZ")
        )
        for p in q.recentProgress
    ]
    assert got_wms == want_wms

    got = {
        int(r.ws.timestamp()): r.n
        for r in spark.sql("SELECT window.start ws, n FROM late_check").collect()
    }
    assert got == want_emitted
