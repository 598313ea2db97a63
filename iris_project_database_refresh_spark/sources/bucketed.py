"""Bucketed-table helpers: pre-shuffle once at write time, then join
and aggregate WITHOUT exchanges forever after.

The refresh pipeline's hottest join is fact-to-fact on the order key
(lineitem⋈orders here; chunk⋈section⋈document in the reference's
schema). At 100 TB that shuffle dominates every run. Bucketing both
tables on the join key at ingest amortizes the shuffle across every
subsequent query: `spark.table(...)` scans report their bucket spec,
and a join on the bucket key plans as SortMergeJoin with NO Exchange
on either side (asserted in tests/test_bucketed.py).

Rules of thumb encoded here:
- both sides must have the SAME bucket count (or a divisor — AQE does
  not re-bucket);
- the bucket column must be the join key prefix; extra sort columns
  make the merge phase read-sequential;
- bucket pruning applies to equality filters on the bucket column
  (`spark.sql.sources.bucketing.enabled`, on by default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .tables import load_table

DEFAULT_BUCKETS = 8


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = DEFAULT_BUCKETS,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed managed table (parquet). The write
    performs the one-time shuffle into ``n_buckets`` files per
    partition; subsequent scans expose the bucket spec to the planner."""
    spark = df.sparkSession
    # idempotent: a crashed run can leave the location without the
    # catalog entry, which fails LOCATION_ALREADY_EXISTS on re-create
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    loc = jvm.org.apache.hadoop.fs.Path(f"{warehouse}/{table}")
    fs = loc.getFileSystem(hconf)
    if fs.exists(loc):
        fs.delete(loc, True)
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    writer = writer.sortBy(sort_col or bucket_col)
    writer.saveAsTable(table)


def bucketize_order_tables(
    spark: SparkSession, sf_dir: str, n_buckets: int = DEFAULT_BUCKETS, *, prefix: str = "bkt"
) -> tuple[str, str]:
    """Bucket lineitem and orders on the order key with matching bucket
    counts; returns the two table names."""
    li_t, ord_t = f"{prefix}_lineitem", f"{prefix}_orders"
    write_bucketed(
        load_table(spark, sf_dir, "lineitem"), li_t, "l_orderkey", n_buckets
    )
    write_bucketed(load_table(spark, sf_dir, "orders"), ord_t, "o_orderkey", n_buckets)
    return li_t, ord_t


def bucketed_order_join(spark: SparkSession, li_table: str, ord_table: str) -> DataFrame:
    """The fact-fact join on the bucket key — plans with zero
    exchanges when both tables share the bucket spec."""
    li = spark.table(li_table)
    orders = spark.table(ord_table)
    return li.join(orders, li.l_orderkey == orders.o_orderkey)
