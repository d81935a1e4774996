"""fan_out gate: spread single-split local scans, no-op on wide or
streaming inputs (at scale every real table scan is already wide)."""
from crawler_spark.functions import fan_out


def test_fan_out_spreads_narrow_input(spark):
    df = spark.range(1000).coalesce(1)
    out = fan_out(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert out.count() == 1000


def test_fan_out_noop_on_wide_input(spark):
    cores = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(cores + 4)
    out = fan_out(df)
    # gate: already >= parallelism -> the SAME plan, no extra exchange
    assert out is df


def test_fan_out_noop_on_streaming(spark):
    stream = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    assert fan_out(stream) is stream
