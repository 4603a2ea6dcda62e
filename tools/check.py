#!/usr/bin/env python
"""Local mirror of the driver's correctness gate: run graft.Verify
output against the DuckDB oracle SQL and diff.

Usage: python tools/check.py <sfDir> <outDir>
(outDir = what `sbt "runMain graft.Verify <sfDir> <outDir>"` wrote)
"""
import sys, os, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v): v = "NaN"
                else: v = round(v, 4)
            rr.append(v)
        out.append(tuple(rr))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        pdir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(pdir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            o = con.execute(sql)
            ocols = [d[0] for d in o.description]
            orows = o.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        s = con.execute(f"SELECT * FROM read_parquet({files!r})")
        scols = [d[0] for d in s.description]
        srows = s.fetchall()
        if sorted(ocols) != sorted(scols):
            print(f"FAIL {name}: cols oracle={sorted(ocols)} spark={sorted(scols)}")
            n_fail += 1; continue
        no, ns = norm(orows, ocols), norm(srows, scols)
        if len(no) != len(ns):
            print(f"FAIL {name}: rows oracle={len(no)} spark={len(ns)}")
            n_fail += 1; continue
        bad = [(a, b) for a, b in zip(no, ns) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(no)} rows differ; first: oracle={bad[0][0]} spark={bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(no)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
