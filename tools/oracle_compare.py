#!/usr/bin/env python3
"""Local oracle gate: compare graft.Verify parquet dumps against DuckDB
running the registry's oracle SQL on the same fixture parquet — the same
rows/schema/hash protocol as the round driver, runnable at any scale
factor. Usage:

    python3 tools/oracle_compare.py <sfDir> <verifyOutDir> <reportJson> [q1,q2,...]

The driver's gate runs at sf0.01, where skew machinery (hot-shingle caps,
salted band joins, skewed token joins) never sees a hot key; this harness
exists to run the skew family at sf0.1+ (VERDICT r09 next-round #4).
"""
import json
import sys

import duckdb


def canon(vals):
    """Hashable canonical form: floats rounded to 12 significant digits
    (both engines compute the same IEEE expression; the round guards
    against formatting-only differences), bytes hexed."""
    out = []
    for v in vals:
        if isinstance(v, float):
            out.append(f"{v:.12g}")
        elif isinstance(v, (bytes, bytearray)):
            out.append(v.hex())
        else:
            out.append(repr(v))
    return tuple(out)


def main():
    sf_dir, out_dir, report_path = sys.argv[1], sys.argv[2], sys.argv[3]
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None

    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    report = {}
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        entry = {"rows_match": False, "schema_match": False,
                 "hash_match": False, "spark_rows": -1, "oracle_rows": -1,
                 "err": None}
        try:
            spark_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            ora_rel = con.sql(sql)
            s_cols = sorted(spark_rel.columns)
            o_cols = sorted(ora_rel.columns)
            entry["schema_match"] = s_cols == o_cols
            s_rows = spark_rel.project(", ".join(f'"{c}"' for c in s_cols)) \
                .fetchall()
            o_rows = ora_rel.project(", ".join(f'"{c}"' for c in o_cols)) \
                .fetchall()
            entry["spark_rows"] = len(s_rows)
            entry["oracle_rows"] = len(o_rows)
            entry["rows_match"] = len(s_rows) == len(o_rows)
            entry["hash_match"] = \
                sorted(map(canon, s_rows)) == sorted(map(canon, o_rows))
        except Exception as e:  # noqa: BLE001 - report, don't crash the gate
            entry["err"] = f"{type(e).__name__}: {e}"
        report[name] = entry
        ok = entry["rows_match"] and entry["schema_match"] and entry["hash_match"]
        print(f"[oracle] {name}: {'OK' if ok else 'MISMATCH ' + json.dumps(entry)}")

    json.dump(report, open(report_path, "w"), indent=1)
    bad = [n for n, e in report.items()
           if not (e["rows_match"] and e["schema_match"] and e["hash_match"])]
    print(f"[oracle] {len(report) - len(bad)}/{len(report)} green -> {report_path}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
