#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Runs each oracle SQL in DuckDB against the sf parquet tables and compares
with the parquet written by `graft.Verify` (which must be run first via
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_verify").

Comparison mirrors the stated driver behavior: columns sorted by name,
rows sorted canonically, then values compared. Floats are compared exactly
(our queries round on both sides, so bits should match); on mismatch the
first few differing rows are printed for diagnosis.

TYPE-FAITHFUL (r19): the driver materializes DuckDB results through a
typed pandas/arrow path, where HUGEINT (the result type of DuckDB
sum(BIGINT), plain or windowed) degrades to float64 — so `448` renders
`448.0` and hash-mismatches an int64 Spark column even when arithmetic
is exact (the r18 `pack_sequences`/`pack_doc_offsets` reds). Earlier
revisions of this script compared via `fetchall()` Python ints, which
is type-INsensitive and could never reproduce that class. We now
(a) fetch the oracle through `.df()` — the same degradation the driver
sees — and (b) DESCRIBE every oracle and hard-fail any HUGEINT or
DECIMAL output column, so the class is caught even before values drift.
Rule: every oracle output column whose lineage includes sum() or //
must be CAST(... AS BIGINT) at the final projection.

Dev tool only — not part of the shipped library.
"""
import glob
import json
import math
import os
import sys

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = float(v)  # numpy.float64 → float: stable repr
                if math.isnan(v):
                    v = "NaN"
                else:
                    # + 0.0 normalizes IEEE -0.0, whose repr differs from 0.0
                    v = repr(round(v, 9) + 0.0)
            vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    return out


def main():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    oracle_path = os.path.join(OUT_DIR, "oracle_sql.json")
    with open(oracle_path) as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        res_glob = glob.glob(os.path.join(OUT_DIR, name, "*.parquet"))
        if not res_glob:
            print(f"MISSING  {name}: no spark result parquet")
            n_fail += 1
            continue
        try:
            # Hard gate on oracle result types: HUGEINT/DECIMAL output
            # columns degrade to float64 under the driver's typed path
            # and will always hash-mismatch an int64 Spark column.
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
            bad = [(c, t) for c, t, *_ in desc
                   if t == "HUGEINT" or t.startswith("DECIMAL")]
            if bad:
                print(f"TYPEFAIL {name}: un-CAST wide-integer oracle "
                      f"columns {bad} (add CAST(... AS BIGINT))")
                n_fail += 1
                continue
            odf = con.execute(sql).df()
            o_cols = list(odf.columns)
            o_rows = list(odf.itertuples(index=False, name=None))
        except Exception as e:
            print(f"ORAFAIL  {name}: {str(e).splitlines()[0][:160]}")
            n_fail += 1
            continue
        sdf = con.execute(
            f"SELECT * FROM read_parquet({res_glob!r})").df()
        s_cols = list(sdf.columns)
        s_rows = list(sdf.itertuples(index=False, name=None))

        if sorted(o_cols) != sorted(s_cols):
            print(f"SCHEMA   {name}: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
            n_fail += 1
            continue
        if len(o_rows) != len(s_rows):
            print(f"ROWS     {name}: spark={len(s_rows)} oracle={len(o_rows)}")
            n_fail += 1
            continue
        co, cs = canon(o_rows, o_cols), canon(s_rows, s_cols)
        if co == cs:
            print(f"PASS     {name} ({len(s_rows)} rows)")
            n_pass += 1
        else:
            diffs = [(a, b) for a, b in zip(co, cs) if a != b]
            print(f"VALUES   {name}: {len(diffs)} differing rows; first: ")
            for a, b in diffs[:3]:
                print(f"  oracle: {a}")
                print(f"  spark : {b}")
            n_fail += 1

    # queries without oracle → rows-only. A query that failed in graft.Verify
    # leaves no parquet behind; count that as a failure instead of letting
    # an empty glob abort the remaining checks.
    for d in sorted(os.listdir(OUT_DIR)):
        if os.path.isdir(os.path.join(OUT_DIR, d)) and d not in oracles:
            parts = glob.glob(os.path.join(OUT_DIR, d, "*.parquet"))
            if not parts:
                print(f"ROWSONLY {d}: NO PARQUET (query failed in Verify?)")
                n_fail += 1
                continue
            n = sum(duckdb.connect().execute(
                f"SELECT count(*) FROM read_parquet({parts!r})"
            ).fetchone())
            print(f"ROWSONLY {d}: {n} rows")

    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
