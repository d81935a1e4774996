"""IcebergCatalog integration: the full catalog-semantics suite (append /
overwrite / bucket partial-overwrite / time travel / rollback /
skip_empty) plus a crawl smoke against the Iceberg backend.

Environment-gated like the real-codec tests: the sandbox image has no
Iceberg runtime jar, so everything here SKIPS there (VERDICT r4
"What's missing" #3 asked for the adapter + suite in-tree with an
environment skip, not a claim).  On a cluster, run with::

    pyspark --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>
"""

from __future__ import annotations

import os
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def iceberg_spark():
    from crawler_spark.iceberg_catalog import iceberg_available
    from crawler_spark.session import get_spark

    wh = tempfile.mkdtemp(prefix="iceberg_wh_")
    spark = get_spark(
        "iceberg_test", cores=4, shuffle_partitions=4,
        extra_conf={
            "spark.sql.extensions":
                "org.apache.iceberg.spark.extensions"
                ".IcebergSparkSessionExtensions",
            "spark.sql.catalog.crawl":
                "org.apache.iceberg.spark.SparkCatalog",
            "spark.sql.catalog.crawl.type": "hadoop",
            "spark.sql.catalog.crawl.warehouse": wh,
        },
    )
    if not iceberg_available(spark):
        pytest.skip("no Iceberg runtime jar in this environment "
                    "(sandbox image ships none; run on a cluster with "
                    "--packages iceberg-spark-runtime)")
    yield spark


def _cat(spark):
    from crawler_spark.iceberg_catalog import IcebergCatalog

    return IcebergCatalog(spark, "crawl")


def test_append_overwrite_and_time_travel(iceberg_spark):
    spark = iceberg_spark
    cat = _cat(spark)
    cat.drop("t1")
    s1, n1 = cat.write_counted(spark.range(0, 5).toDF("x"), "t1", "append")
    s2, n2 = cat.write_counted(spark.range(5, 8).toDF("x"), "t1", "append")
    assert (n1, n2) == (5, 3)
    assert cat.read(spark, "t1").count() == 8
    assert cat.read(spark, "t1", snapshot_id=s1).count() == 5
    s3, n3 = cat.write_counted(spark.range(0, 2).toDF("x"), "t1", "overwrite")
    assert n3 == 2
    assert cat.read(spark, "t1").count() == 2
    assert cat.read(spark, "t1", snapshot_id=s2).count() == 8


def test_skip_empty_append(iceberg_spark):
    spark = iceberg_spark
    cat = _cat(spark)
    cat.drop("t2")
    s1, _ = cat.write_counted(spark.range(0, 4).toDF("x"), "t2", "append")
    s2, n2 = cat.write_counted(
        spark.range(0, 0).toDF("x"), "t2", "append", skip_empty=True
    )
    assert (s2, n2) == (s1, 0)
    assert cat.read(spark, "t2").count() == 4


def test_bucket_partial_overwrite(iceberg_spark):
    from pyspark.sql import functions as F

    spark = iceberg_spark
    cat = _cat(spark)
    cat.drop("t3")
    df = spark.range(0, 40).select(F.col("id").alias("url_hash"))
    cat.commit_buckets(df, "t3", "url_hash", 4)  # reset: buckets 0..3
    assert cat.bucket_count("t3") == 4
    assert cat.read(spark, "t3").count() == 40
    # replace bucket 1 with 2 rows, clear bucket 2 entirely
    delta = spark.createDataFrame(
        [(1,), (5,)], "url_hash long"
    )  # both pmod 4 -> bucket 1
    cat.commit_buckets(delta, "t3", "url_hash", 4, buckets=[1, 2])
    got = {r["url_hash"] for r in cat.read(spark, "t3").collect()}
    expect = {x for x in range(40) if x % 4 in (0, 3)} | {1, 5}
    assert got == expect
    # modulus change without reset must refuse
    with pytest.raises(ValueError):
        cat.commit_buckets(delta, "t3", "url_hash", 8, buckets=[1])


def test_rollback(iceberg_spark):
    spark = iceberg_spark
    cat = _cat(spark)
    cat.drop("t4")
    s1, _ = cat.write_counted(spark.range(0, 3).toDF("x"), "t4")
    cat.write_counted(spark.range(3, 9).toDF("x"), "t4")
    cat.rollback("t4", s1)
    assert cat.read(spark, "t4").count() == 3
    assert cat.current_snapshot_id("t4") == s1


def test_crawl_smoke_on_iceberg(iceberg_spark, tmp_path):
    """The engine runs unmodified against the Iceberg backend: same
    CrawlConfig, same corpus, seen/results/frontier all through
    IcebergCatalog."""
    from crawler_spark import corpus, engine, rules

    spark = iceberg_spark
    pages = str(tmp_path / "pages")
    corpus.write_corpus(spark, pages, n_hosts=4, n_filler=50)
    cfg = engine.CrawlConfig(
        tasks=rules.synthetic_tasks(max_depth=3, n_book_hosts=4, n_sun_hosts=4),
        pages_path=pages, round_seconds=30.0, use_bloom=True,
        max_rounds=3, collect_metrics=True,
    )
    cat = _cat(spark)
    for t in engine.TABLES:
        cat.drop(t)
    state = engine.run_crawl(spark, cat, cfg)
    assert state["round"] >= 1
    assert cat.read(spark, "seen").count() > 0
    assert cat.read(spark, "results").count() > 0
