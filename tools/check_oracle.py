#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <outDir> <sfDir>

Reads the parquet dumps written by `sbt "runMain graft.Verify <sfDir> <outDir>"`
plus outDir/oracle_sql.json, runs each oracle SQL in DuckDB against the same
parquet tables, and compares row count, schema (column names sorted), and a
hash of the values (columns sorted by name, rows sorted) — strict equality on
every cell, mirroring the driver's hash compare.

TYPE-STRICT (r9 judge finding): the old fetchdf()+str() compare erased the
exact divergence the driver scores — DuckDB promotes SUM(BIGINT) (aggregate
AND window) to HUGEINT while Spark stays BIGINT, values byte-identical, hash
red. This gate now also compares the DuckDB result types of the oracle SQL
against the Spark parquet column types, allowing ONLY integer width drift
within 64 bits (TINYINT/SMALLINT/INTEGER/BIGINT — 35 legitimately-green
entries differ that way); HUGEINT or DECIMAL vs anything is a FAIL even when
every cell compares equal.
"""
import json, sys, os, glob
import duckdb

# All 64-bit-or-narrower integer widths are one equivalence class: the
# driver's hash is width-insensitive inside 64 bits but NOT beyond.
_INT64 = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
          "UTINYINT", "USMALLINT", "UINTEGER"}

def type_class(t):
    s = str(t).upper()
    return "INT64" if s in _INT64 else s

def col_types(rel):
    return {c: type_class(t) for c, t in zip(rel.columns, rel.types)}

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        pq_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{pq_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output at {pq_dir}")
            n_fail += 1
            continue
        try:
            got_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
            exp_rel = con.sql(sql)
            gt, et = col_types(got_rel), col_types(exp_rel)
            got = got_rel.fetchdf()
            exp = exp_rel.fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            n_fail += 1
            continue
        # type-strict compare: int width drift within 64 bits is the only
        # allowed divergence (HUGEINT/DECIMAL vs BIGINT hashes red driver-side)
        type_bad = [(c, gt[c], et[c]) for c in gc if gt[c] != et[c]]
        if type_bad:
            c, a, b = type_bad[0]
            print(f"FAIL {name}: type col {c}: spark={a} oracle={b}"
                  + (f" (+{len(type_bad)-1} more)" if len(type_bad) > 1 else ""))
            n_fail += 1
            continue
        g = got[gc].sort_values(gc).reset_index(drop=True)
        e = exp[ec].sort_values(ec).reset_index(drop=True)
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            n_fail += 1
            continue
        # strict per-cell equality (no tolerance — like a hash compare)
        mismatch = None
        for c in gc:
            gv, ev = g[c].tolist(), e[c].tolist()
            for i, (a, b) in enumerate(zip(gv, ev)):
                if a != b and not (a is None and b is None) and str(a) != str(b):
                    mismatch = (c, i, a, b)
                    break
            if mismatch:
                break
        if mismatch:
            c, i, a, b = mismatch
            print(f"FAIL {name}: col {c} row {i}: spark={a!r} oracle={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(g)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail of {len(oracle)}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
