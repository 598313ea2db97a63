"""Driver simulation — runs the round driver's correctness check locally.

For each name in ``__spark_entry__.queries()``: run the Spark query at
sf0.01 and the paired ``oracle_sql()`` on DuckDB over the same parquet
tables, then compare sorted column names, row count, and normalized
values (columns sorted by name, floats rounded to 9dp, rows stringified
and sorted). Prints one status line per query and a final summary;
exits non-zero on any mismatch.

Usage: python scripts/driver_sim.py [name ...]   (no args = all)

With ``--record PATH`` the per-query verdicts are ALSO written as one
machine-checkable JSON artifact — {commit, sf, timestamp?, results:
{name: {rows_spark, rows_oracle, rows_ok, schema_ok, hash_ok}}} — the
``DRIVERSIM_r{N}.json`` convention the round-9 verdict asked for, so a
judge can diff a committed full-sweep record against the driver's own
CORRECTNESS sample instead of re-running every query.
"""

from __future__ import annotations

import json
import subprocess
import sys

sys.path.insert(0, ".")

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 9)
                if v == -0.0:
                    v = 0.0
            vals.append(str(v))
        out.append("|".join(vals))
    out.sort()
    return out


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from iris_project_database_refresh_spark.session import get_session

    spark = get_session()
    argv = sys.argv[1:]
    record_path = None
    if "--record" in argv:
        i = argv.index("--record")
        record_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    only = set(argv)
    record: dict[str, dict] = {}

    smoke = entrymod.entry(spark)
    n = smoke.count()
    print(f"entry(): OK rows={n} schema={[f.name for f in smoke.schema.fields]}")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_CORRECT}/{t}.parquet')"
        )
        if t == "events":
            con.execute(
                "CREATE VIEW events_us AS SELECT * REPLACE "
                "(date_trunc('microseconds', ts) AS ts) FROM events"
            )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name in sorted(queries):
        if only and name not in only:
            continue
        try:
            sdf = queries[name](spark, SF_CORRECT)
            s_cols = sorted(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                print(f"{name}: rows-only OK ({len(s_rows)} rows, no oracle)")
                record[name] = {"rows_spark": len(s_rows), "rows_only": True}
                continue
            rel = con.execute(oracles[name])
            o_cols = sorted(d[0] for d in rel.description)
            o_rows = rel.fetchall()
            ok_schema = s_cols == o_cols
            ok_rows = len(s_rows) == len(o_rows)
            ok_hash = norm(sdf.columns, s_rows) == norm(
                [d[0] for d in con.execute(oracles[name]).description], o_rows
            )
            status = "OK" if (ok_schema and ok_rows and ok_hash) else "FAIL"
            print(
                f"{name}: {status} rows={len(s_rows)}/{len(o_rows)} "
                f"schema={ok_schema} hash={ok_hash}"
            )
            record[name] = {
                "rows_spark": len(s_rows),
                "rows_oracle": len(o_rows),
                "rows_ok": ok_rows,
                "schema_ok": ok_schema,
                "hash_ok": ok_hash,
            }
            if status == "FAIL":
                failures.append(name)
                if not ok_schema:
                    print(f"  spark cols={s_cols}\n  oracle cols={o_cols}")
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:200]}")
            record[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
            failures.append(name)

    if record_path:
        commit = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True
        ).stdout.strip()
        dirty = bool(
            subprocess.run(
                ["git", "status", "--porcelain"], capture_output=True, text=True
            ).stdout.strip()
        )
        with open(record_path, "w") as f:
            json.dump(
                {
                    "commit": commit,
                    "dirty_worktree": dirty,
                    "sf_dir": SF_CORRECT,
                    "n_queries": len(record),
                    "n_failures": len(failures),
                    "failures": sorted(failures),
                    "results": record,
                },
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"record written: {record_path}")

    print(f"\n{'FAILURES: ' + ', '.join(failures) if failures else 'ALL GREEN'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
