from __future__ import annotations

import pytest

from iris_project_database_refresh_spark.operators import layout

from .conftest import SF_CORRECT, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(layout.QUERIES))
def test_matches_oracle(spark, oracle, name):
    assert_matches_oracle(layout.QUERIES[name](spark, SF_CORRECT), oracle, layout.ORACLES[name])


def test_zorder_prunes_both_dims_linear_only_one(spark):
    """The OPTIMIZE ZORDER claim, pinned: the linear layout prunes
    perfectly on its own sort dimension and not at all on the other;
    z-order prunes on BOTH single-dim shapes and strictly beats linear
    on the 2-D box."""
    rows = {(r.layout, r.query_shape): r for r in layout.zorder_layout(spark, SF_CORRECT).collect()}
    lin_a, lin_b = rows[("linear", "box_a_only")], rows[("linear", "box_b_only")]
    z_a, z_b = rows[("zorder", "box_a_only")], rows[("zorder", "box_b_only")]
    lin_box, z_box = rows[("linear", "box_both")], rows[("zorder", "box_both")]

    assert lin_b.files_scanned == lin_b.n_files  # no pruning off-sort-dim
    assert lin_a.files_scanned < lin_a.n_files // 2  # strong pruning on sort dim
    assert z_a.files_scanned < z_a.n_files // 2  # z-order prunes dim A...
    assert z_b.files_scanned < z_b.n_files // 2  # ...AND dim B
    assert z_box.files_scanned < lin_box.files_scanned  # and wins the 2-D box
    # both layouts hold the same data: matching rows agree per shape
    for shape in ("box_both", "box_a_only", "box_b_only"):
        assert rows[("linear", shape)].rows_matching == rows[("zorder", shape)].rows_matching


def test_compaction_bins_bounded_and_complete(spark):
    """Greedy sequential packing invariants: every file lands in
    exactly one bin, bins are contiguous per source, and a bin's bytes
    exceed the target by at most one file (the greedy overflow bound)."""
    import pyspark.sql.functions as F

    manifest = layout.file_manifest(spark, SF_CORRECT)
    n_files = manifest.count()
    max_file = manifest.agg(F.max("bytes")).collect()[0][0]
    plan = layout.compaction_plan(spark, SF_CORRECT).collect()
    assert sum(r.n_files_in for r in plan) == n_files
    for r in plan:
        assert r.bytes_in <= layout.COMPACT_TARGET + max_file
    by_source: dict[str, list] = {}
    for r in plan:
        by_source.setdefault(r.source, []).append(r.bin_id)
    for bins in by_source.values():
        assert sorted(bins) == list(range(len(bins)))  # contiguous bins


def test_vacuum_plan_partitions_files(spark):
    """live + vacuumable + time-travel-held must partition every file,
    and byte columns must add up the same way."""
    from .conftest import SF_CORRECT

    for r in layout.snapshot_vacuum_plan(spark, SF_CORRECT).collect():
        assert r.live_files + r.vacuum_files + r.timetravel_held_files == r.n_files
        total = r.live_bytes + r.vacuum_bytes + r.timetravel_held_bytes
        assert r.reclaim_bp == r.vacuum_bytes * 10000 // total
        assert 0 <= r.reclaim_bp <= 10000


def test_consistent_hashing_minimal_disruption(spark):
    from iris_project_database_refresh_spark.operators.layout import (
        N_RING,
        shard_consistent_hashing,
    )
    from .conftest import SF_CORRECT as sf

    rows = {r["node"]: r for r in shard_consistent_hashing(spark, sf).collect()}
    assert set(rows) == set(range(N_RING + 1))
    new = rows[N_RING]
    # the consistent-hashing guarantee: keys only move TO the new node
    assert new["keys_before"] == 0 and new["moved_out"] == 0
    for n in range(N_RING):
        assert rows[n]["moved_in"] == 0
        assert rows[n]["keys_after"] == rows[n]["keys_before"] - rows[n]["moved_out"]
    assert new["moved_in"] == sum(rows[n]["moved_out"] for n in range(N_RING))
    total = sum(r["keys_before"] for r in rows.values())
    # ~1/(N+1) of keys move (vnode variance allowed: 3x band)
    assert 0 < new["moved_in"] < 3 * total // (N_RING + 1)


def test_shuffle_planner_fold_consistency(spark):
    from iris_project_database_refresh_spark.operators.layout import (
        PLANNER_CANDIDATES,
        shuffle_partition_planner,
    )
    from .conftest import SF_CORRECT as sf

    rows = {r["n_partitions"]: r for r in shuffle_partition_planner(spark, sf).collect()}
    assert set(rows) == set(PLANNER_CANDIDATES)
    # total bytes conserved across every fold
    totals = {k: r["mean_bytes"] * r["n_nonempty"] for k, r in rows.items()}
    # mean uses truncating div: allow < n_partitions bytes of dust
    base = max(totals.values())
    for k, t in totals.items():
        assert base - t < k
    # coarser partitioning can only concentrate bytes
    ks = sorted(rows)
    for a, b in zip(ks, ks[1:]):
        assert rows[a]["max_bytes"] >= rows[b]["max_bytes"]
    assert sum(r["recommended"] for r in rows.values()) <= 1


def test_encoding_advisor_run_stitching(spark):
    from iris_project_database_refresh_spark.operators.layout import (
        ENC_COLS,
        column_encoding_advisor,
    )
    from .conftest import SF_CORRECT as sf

    rows = {r["column_name"]: r for r in column_encoding_advisor(spark, sf).collect()}
    assert set(rows) == {c[0] for c in ENC_COLS}
    # replay l_linestatus runs in pandas (global order) — the stitched
    # distributed count must equal the sequential truth
    import pandas as pd

    pdf = (
        spark.read.parquet(sf + "/lineitem.parquet")
        .select("l_orderkey", "l_linenumber", "l_linestatus")
        .toPandas()
        .sort_values(["l_orderkey", "l_linenumber", "l_linestatus"])
    )
    v = pdf["l_linestatus"].tolist()
    truth = 1 + sum(1 for a, b in zip(v, v[1:]) if a != b)
    assert rows["l_linestatus"]["n_runs"] == truth
    for r in rows.values():
        assert 1 <= r["n_runs"] <= r["n"]
        assert r["chosen"] in ("plain", "dict", "rle")
        chosen_bits = {"plain": "bits_plain", "dict": "bits_dict", "rle": "bits_rle"}
        assert r[chosen_bits[r["chosen"]]] == min(
            r["bits_plain"], r["bits_dict"], r["bits_rle"]
        )


def test_cow_mor_breakeven_consistency(spark):
    from iris_project_database_refresh_spark.operators.layout import (
        table_format_cow_mor_plan,
    )
    from .conftest import SF_CORRECT as sf

    rows = table_format_cow_mor_plan(spark, sf).collect()
    assert len(rows) == 20
    assert {r["chosen"] for r in rows} == {"cow", "mor"}
    for r in rows:
        cow = r["base_bytes"] + r["reads_per_day"] * r["base_bytes"]
        mor = r["delta_bytes"] + r["reads_per_day"] * (
            r["base_bytes"] + 2 * r["delta_bytes"]
        )
        assert (r["cow_daily_bytes"], r["mor_daily_bytes"]) == (cow, mor)
        assert r["chosen"] == ("cow" if cow <= mor else "mor")
        # above the breakeven read rate, COW must win
        if r["breakeven_reads"] is not None and r["reads_per_day"] > r["breakeven_reads"]:
            assert r["chosen"] == "cow"
