from __future__ import annotations

import os

from pyspark.sql import functions as F

from iris_project_database_refresh_spark.sinks.partitioned import (
    cow_merge,
    read_pruned,
    write_partitioned,
)
from iris_project_database_refresh_spark.sources.tables import load_table

from .conftest import SF_CORRECT


def _events_by_day(spark):
    return load_table(spark, SF_CORRECT, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.date_trunc("day", "ts").cast("date").cast("string").alias("day"),
    )


def _file_state(path):
    """(relpath, size, mtime_ns) for every parquet data file."""
    state = {}
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                st = os.stat(p)
                state[os.path.relpath(p, path)] = (st.st_size, st.st_mtime_ns)
    return state


def test_partitioned_write_prunes_directories(spark, tmp_path):
    path = str(tmp_path / "events_by_day")
    df = _events_by_day(spark)
    write_partitioned(df, path, ["day"])

    pruned = read_pruned(spark, path, "day = '2024-01-05'")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition predicate must prune at planning time, not post-scan
    assert "PartitionFilters: [isnotnull(day" in plan
    assert pruned.count() == df.where("day = '2024-01-05'").count()
    # one file per partition directory (no small-file explosion)
    days = [d for d in os.listdir(path) if d.startswith("day=")]
    assert len(days) == 30
    for d in days:
        files = [f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)


def test_cow_merge_rewrites_only_impacted_partitions(spark, tmp_path):
    path = str(tmp_path / "events_cow")
    df = _events_by_day(spark)
    write_partitioned(df, path, ["day"])
    before = _file_state(path)

    # batch: update 10 known rows on 2024-01-03 and insert 5 new rows
    # on 2024-01-04 — exactly two impacted partitions
    updates = (
        df.where("day = '2024-01-03'")
        .orderBy("event_id")
        .limit(10)
        .withColumn("value", F.lit(-1.0))
    )
    inserts = spark.createDataFrame(
        [(10_000_000 + i, 1, "synthetic", 0.0, "2024-01-04") for i in range(5)],
        schema=df.schema,
    )
    batch = updates.unionByName(inserts)
    n_before = spark.read.parquet(path).count()

    cow_merge(spark, path, batch, "event_id", ["day"])

    after = _file_state(path)
    out = spark.read.parquet(path)
    assert out.count() == n_before + 5
    assert out.where("value = -1.0").count() == 10
    # every partition except the two impacted ones is byte-identical
    changed_dirs = {
        os.path.dirname(p)
        for p in set(before) ^ set(after)
        | {p for p in set(before) & set(after) if before[p] != after[p]}
    }
    assert changed_dirs == {"day=2024-01-03", "day=2024-01-04"}, changed_dirs
    # keys are unique after the merge (upsert, not append)
    assert out.groupBy("event_id").count().where("count > 1").count() == 0


def test_dynamic_partition_pruning_on_fact_dim_join(spark, tmp_path):
    """The second 100 TB pruning mechanism next to static PartitionFilters:
    when the partition key is only constrained THROUGH a join (dim
    carries the filter), Spark must inject a dynamicpruningexpression
    into the fact scan's PartitionFilters — the fact table then reads
    only the partitions the dim's rows select, at runtime."""
    import os

    import pyspark.sql.functions as F

    from iris_project_database_refresh_spark.sources.tables import load_table

    from .conftest import SF_CORRECT

    ev = load_table(spark, SF_CORRECT, "events").withColumn("day", F.to_date("ts"))
    fact_path = str(tmp_path / "ev")
    ev.write.partitionBy("day").mode("overwrite").parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    dim_path = str(tmp_path / "dim")
    fact.select("day").distinct().limit(2).withColumn("tag", F.lit("keep")).write.parquet(dim_path)
    dim = spark.read.parquet(dim_path).where(F.col("tag") == "keep")
    j = fact.join(dim, "day").groupBy("day").agg(F.count(F.lit(1)).alias("n"))
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), f"no DPP in plan:\n{plan[:600]}"
