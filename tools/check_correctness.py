#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ (Spark parquet result), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with views over
<sfDir>'s tables, and compares: row count, schema (column names), and the
full sorted value set (exact equality — stricter than any hash).
"""
import json
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_rel = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            spark_cols = sorted(spark_rel.columns)
            oracle_rel = con.sql(sql)
            oracle_cols = sorted(oracle_rel.columns)
            status = []
            if spark_cols != oracle_cols:
                status.append(f"SCHEMA spark={spark_cols} oracle={oracle_cols}")
            else:
                # The driver's hash is TYPE-sensitive: DuckDB widens e.g.
                # sum(BIGINT) to HUGEINT, which hash-mismatches a BIGINT
                # Spark column even when every value is identical. Compare
                # declared types so the local gate predicts the driver's.
                s_types = dict(zip(spark_rel.columns, (str(t) for t in spark_rel.types)))
                o_types = dict(zip(oracle_rel.columns, (str(t) for t in oracle_rel.types)))
                type_diff = [
                    f"{c}: spark={s_types[c]} oracle={o_types[c]}"
                    for c in spark_cols if s_types[c] != o_types[c]
                ]
                if type_diff:
                    status.append(f"TYPES {'; '.join(type_diff)}")
            if not status:
                cols = ", ".join(f'"{c}"' for c in spark_cols)
                order = ", ".join(f'"{c}"' for c in spark_cols)
                s_rows = con.sql(f"SELECT {cols} FROM spark_rel ORDER BY {order}").fetchall()
                o_rows = con.sql(f"SELECT {cols} FROM oracle_rel ORDER BY {order}").fetchall()
                if len(s_rows) != len(o_rows):
                    status.append(f"ROWS spark={len(s_rows)} oracle={len(o_rows)}")
                elif s_rows != o_rows:
                    bad = next(i for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b)
                    status.append(f"VALUES first-diff@{bad}: spark={s_rows[bad]} oracle={o_rows[bad]}")
            if status:
                failures += 1
                print(f"FAIL {name}: {'; '.join(status)}")
            else:
                print(f"OK   {name} ({len(s_rows)} rows)")
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"ERROR {name}: {e}")
    print(f"\n{len(oracles) - failures}/{len(oracles)} oracle-checked queries green")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
