"""Analytics operator properties beyond oracle parity."""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq


def test_sessionize_is_timezone_independent(spark, tmp_path):
    """Regression (r3 review, empirically verified bug): the session gap
    was computed via a cast to TIMESTAMP, which reads the NTZ wall time in
    the session timezone — across the US spring-forward jump a 100-minute
    wall gap measured as 40 minutes, flipping the 30-minute session break.
    The gap must be the WALL-clock difference under any session timezone."""
    from ankiocr_spark.datapipe.analytics import q_sessionize

    t = lambda h, m: datetime.datetime(2024, 3, 10, h, m)  # noqa: E731
    table = pa.table({
        "event_id": pa.array([1, 2], type=pa.int64()),
        "ts": pa.array([t(1, 30), t(3, 10)], type=pa.timestamp("us")),
        "user_id": pa.array([7, 7], type=pa.int64()),
        "event_type": pa.array(["view", "view"], type=pa.string()),
        "value": pa.array([1.0, 2.0], type=pa.float64()),
        "props": pa.array(["{}", "{}"], type=pa.string()),
    })
    pq.write_table(table, str(tmp_path / "events.parquet"))

    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/New_York"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            rows = q_sessionize(spark, str(tmp_path)).collect()
            # 100-min wall gap > 30-min threshold → TWO sessions, both tzs
            assert len(rows) == 2, (tz, rows)
            assert sorted(r["n_events"] for r in rows) == [1, 1], (tz, rows)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
