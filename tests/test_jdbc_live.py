"""Live JDBC integration: read_jdbc_ranged against an in-process Derby DB.

Closes the loop on S3 (JdbcIO.readAll analogue,
JDBCToSpannerDVTWithHash.java:580-604): the ranged predicates are executed by
a REAL JDBC connection — Apache Derby embedded, which ships on Spark's
classpath — not just constructed. Each Spark partition issues its own bound
range query, mirroring the reference's per-range readAll fan-out.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spanner_data_validator_spark.sources.jdbc_source import read_jdbc_ranged


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    """Create an embedded Derby DB with a seeded table via the driver JVM."""
    db_dir = tmp_path_factory.mktemp("derby") / "testdb"
    url = f"jdbc:derby:{db_dir};create=true"
    jvm = spark.sparkContext._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.execute("CREATE TABLE member_events (id BIGINT PRIMARY KEY, code VARCHAR(16))")
    ps = conn.prepareStatement("INSERT INTO member_events VALUES (?, ?)")
    for i in range(100):
        ps.setLong(1, i)
        ps.setString(2, f"code{i % 7}")
        ps.executeUpdate()
    ps.close()
    st.close()
    conn.close()
    return url


def test_ranged_read_covers_every_row_exactly_once(spark, derby_url):
    df = read_jdbc_ranged(
        spark, derby_url, "member_events", "id", "LONG", "0", "99", 8)
    assert df.rdd.getNumPartitions() == 8  # one partition per range predicate
    rows = df.select("id").collect()
    assert sorted(r["id"] for r in rows) == list(range(100))


def test_ranged_read_pushes_range_predicates(spark, derby_url):
    """Each partition's remote query carries its own bounds: a post-read
    filter on one range returns only that range's rows with no residue."""
    df = read_jdbc_ranged(
        spark, derby_url, "member_events", "id", "LONG", "0", "99", 4)
    per_part = df.withColumn("part", F.spark_partition_id()) \
                 .groupBy("part").agg(F.min("id").alias("lo"), F.max("id").alias("hi")) \
                 .orderBy("part").collect()
    spans = [(r["lo"], r["hi"]) for r in per_part]
    # partitions hold disjoint, ordered ranges (predicate-per-partition reads)
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2


def test_partition_filter_ratio_reads_subset(spark, derby_url):
    df = read_jdbc_ranged(
        spark, derby_url, "member_events", "id", "LONG", "0", "99", 8,
        partition_filter_ratio=4)
    n = df.count()
    assert 0 < n < 100  # filtered partitions are genuinely not read
