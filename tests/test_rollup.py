"""Continuous aggregate: incremental refresh must equal a full
recompute, touching only changed partitions."""

from zikeiretsu_rs_spark.catalog.rollup import Rollup
from zikeiretsu_rs_spark.datamodel import DataPoint, FieldType
from zikeiretsu_rs_spark.datetime_util import NANOS_PER_DAY, NANOS_PER_SEC
from zikeiretsu_rs_spark.engine import Engine

from test_datetime_util import nanos

HOUR = 3600 * NANOS_PER_SEC


def _bucket_map(df):
    return {
        r["bucket_start"]: (r["n"], r["sum_value"]) for r in df.collect()
    }


def test_incremental_refresh_matches_full(spark, tmp_ctx):
    engine = Engine(spark, tmp_ctx)
    store = engine.writable_store("m", [FieldType.FLOAT64])
    base = nanos(2024, 1, 1)
    # day 0 and day 1
    store.push_multi(
        [DataPoint.new(base + i * 1800 * NANOS_PER_SEC, float(i)) for i in range(96)]
    )
    store.persist()

    r = Rollup(tmp_ctx.db_dir(), "m", "hourly", HOUR)
    s1 = r.refresh(spark)
    assert s1 == {"refreshed": 2, "reused": 0, "dropped": 0}
    first = _bucket_map(r.read(spark))
    assert sum(n for n, _ in first.values()) == 96

    # second refresh with no new data: everything reused
    s2 = r.refresh(spark)
    assert s2 == {"refreshed": 0, "reused": 2, "dropped": 0}

    # append day 2 + more rows into day 1 -> only those two refresh
    store.push_multi(
        [DataPoint.new(base + NANOS_PER_DAY + 7 * NANOS_PER_SEC, 100.0),
         DataPoint.new(base + 2 * NANOS_PER_DAY, 200.0)]
    )
    store.persist()
    s3 = r.refresh(spark)
    assert s3 == {"refreshed": 2, "reused": 1, "dropped": 0}

    # incremental result == full recompute from raw
    from pyspark.sql import functions as F

    raw = spark.read.parquet(f"{tmp_ctx.db_dir()}/block/m")
    full = (
        raw.groupBy((F.col("ts") - F.col("ts") % F.lit(HOUR)).alias("bucket_start"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("f0").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )
    assert _bucket_map(r.read(spark)) == _bucket_map(full)


def test_corrupt_state_degrades_to_full_refresh(spark, tmp_ctx):
    """A truncated _state.json (crash mid-write) must not poison every
    later refresh — it reads as empty state and triggers a full
    recompute with identical results."""
    engine = Engine(spark, tmp_ctx)
    store = engine.writable_store("m", [FieldType.FLOAT64])
    base = nanos(2024, 1, 1)
    store.push_multi(
        [DataPoint.new(base + i * 1800 * NANOS_PER_SEC, float(i)) for i in range(96)]
    )
    store.persist()
    r = Rollup(tmp_ctx.db_dir(), "m", "hourly", HOUR)
    r.refresh(spark)
    good = _bucket_map(r.read(spark))
    with open(r.state_path, "w") as f:
        f.write('{"dt=2024-01-0')  # truncated JSON
    stats = r.refresh(spark)
    assert stats["refreshed"] == 2 and stats["reused"] == 0
    assert _bucket_map(r.read(spark)) == good


def test_purge_drops_rollup_partition(spark, tmp_ctx):
    from zikeiretsu_rs_spark.catalog.repair import purge_persisted

    engine = Engine(spark, tmp_ctx)
    store = engine.writable_store("m2", [FieldType.FLOAT64])
    base = nanos(2024, 3, 1)
    for d in range(3):
        store.push_multi(
            [DataPoint.new(base + d * NANOS_PER_DAY + i * NANOS_PER_SEC, 1.0)
             for i in range(4)]
        )
    store.persist()
    r = Rollup(tmp_ctx.db_dir(), "m2", "hourly", HOUR)
    r.refresh(spark)
    assert sum(n for n, _ in _bucket_map(r.read(spark)).values()) == 12

    purge_persisted(
        spark, tmp_ctx.db_dir(), "m2",
        base + NANOS_PER_DAY, base + 2 * NANOS_PER_DAY,
    )
    stats = r.refresh(spark)
    assert stats["dropped"] == 1
    assert sum(n for n, _ in _bucket_map(r.read(spark)).values()) == 8


def test_streaming_ingest_keeps_rollup_fresh(spark, tmp_ctx, tmp_path):
    from pyspark.sql import types as T

    from zikeiretsu_rs_spark.streaming.ingest import start_streaming_ingest

    engine = Engine(spark, tmp_ctx)
    store = engine.writable_store("sm", [FieldType.FLOAT64])
    r = Rollup(tmp_ctx.db_dir(), "sm", "hourly", HOUR)

    schema = T.StructType(
        [T.StructField("ts", T.LongType()), T.StructField("f0", T.DoubleType())]
    )
    base = nanos(2024, 5, 1)
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(base + i * 1200 * NANOS_PER_SEC, float(i)) for i in range(9)], schema
    ).write.parquet(src)

    q = start_streaming_ingest(
        spark.readStream.schema(schema).parquet(src),
        store,
        checkpoint_dir=str(tmp_path / "ckpt"),
        rollups=[r],
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = _bucket_map(r.read(spark))
    assert sum(n for n, _ in got.values()) == 9
    assert len(got) == 3  # 9 samples at 20min spacing -> 3 hourly buckets
