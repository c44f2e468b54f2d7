#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool, not library code).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over the sfDir tables, and
compares row counts, column names/types, and values (columns sorted by name,
floats compared to 1e-9 relative, rows as multisets).
"""
import json, math, sys
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return ("nan",)
        return round(v, 9) if abs(v) < 1 else round(v, max(0, 12 - len(str(int(abs(v))))))
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
            want = con.execute(sql).fetchdf()
            gc, wc = sorted(got.columns), sorted(want.columns)
            if gc != wc:
                print(f"FAIL {name}: columns {gc} vs {wc}"); n_fail += 1; continue
            if len(got) != len(want):
                print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
            g = [tuple(norm(v) for v in r) for r in got[gc].itertuples(index=False)]
            w = [tuple(norm(v) for v in r) for r in want[wc].itertuples(index=False)]
            if sorted(map(repr, g)) != sorted(map(repr, w)):
                bad = [(a, b) for a, b in zip(g, w) if repr(a) != repr(b)][:3]
                print(f"FAIL {name}: values differ, e.g. {bad}"); n_fail += 1; continue
            # also flag ordering mismatches (driver may hash in row order)
            tag = "" if list(map(repr, g)) == list(map(repr, w)) else " (ORDER differs)"
            print(f"PASS {name}: {len(got)} rows{tag}"); n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
