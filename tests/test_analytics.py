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


def test_float_agg_queries_are_partitioning_invariant(spark, sf_dir):
    """The driver runs these queries in ITS OWN session (unknown
    parallelism), so any partial-agg-order sensitivity in the double
    sums would surface as a hash mismatch there even though local checks
    pass. This test re-samples the aggregation order — small shuffle
    partition count, tiny file splits, AQE off — and asserts the rounded
    output is bit-identical: the round(…, 4/6) grain must fully absorb
    accumulation-order noise at the data's magnitudes."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = [
        "pricing_summary",
        "regional_revenue",
        "rollup_report",
        "sessionize",
        "topk_per_group",
        "json_props_histogram",
    ]

    def snap(name):
        df = qs[name](spark, sf_dir)
        cols = sorted(df.columns)
        return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())

    base = {n: snap(n) for n in names}
    perturbed = {
        "spark.sql.shuffle.partitions": "7",
        "spark.sql.files.maxPartitionBytes": "65536",
        "spark.sql.adaptive.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in perturbed}
    try:
        for k, v in perturbed.items():
            spark.conf.set(k, v)
        for n in names:
            assert snap(n) == base[n], n
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_timestamp_queries_are_session_tz_invariant(spark, sf_dir):
    """The parquet timestamps load as TIMESTAMP_NTZ, so every
    timestamp-touching driver query (shipdate cutoff, to_date bucketing,
    session gaps) must produce identical output under any session
    timezone — the driver's session tz is not ours to control."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = ["pricing_summary", "rollup_report", "sessionize"]

    def snap(name):
        df = qs[name](spark, sf_dir)
        cols = sorted(df.columns)
        return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())

    base = {n: snap(n) for n in names}
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("America/New_York", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            for n in names:
                assert snap(n) == base[n], (n, tz)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
