#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: load each Verify
output parquet, run the matching oracle SQL in DuckDB over the same
source tables, canonicalize (sort columns by name, sort rows), compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
            rr.append(v)
        out.append(tuple(rr))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [sorted(cols), out]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # Queries the dump DECLARED but did not produce (crashed mid-verify)
    # must fail loudly — walking only the outputs that exist scored the
    # r9 dump (14 crashes) all-green. Older dumps lack the manifest; fall
    # back to the oracle key set in that case.
    import os
    try:
        declared = set(json.load(open(f"{out_dir}/queries_manifest.json")))
    except FileNotFoundError:
        declared = set(oracle)
    try:
        verrs = json.load(open(f"{out_dir}/verify_errors.json"))
    except FileNotFoundError:
        verrs = {}
    produced = {e for e in os.listdir(out_dir)
                if os.path.isdir(f"{out_dir}/{e}")}
    for name in sorted(declared - produced):
        print(f"FAIL {name}: no output produced"
              + (f" (verify error: {verrs[name]})" if name in verrs else ""))
        n_fail += 1
    for name, sql in sorted(oracle.items()):
        if name in declared and name not in produced:
            continue  # already failed above as not-produced
        try:
            res = con.execute(sql)
            dk_cols = [c[0] for c in res.description]
            dk_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        try:
            tbl = pq.read_table(f"{out_dir}/{name}")
            sp_cols = tbl.column_names
            sp_rows = list(zip(*[tbl.column(c).to_pylist() for c in sp_cols])) \
                if sp_cols else []
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        a = canon(dk_rows, dk_cols)
        b = canon(sp_rows, sp_cols)
        if a[0] != b[0]:
            print(f"FAIL {name}: columns differ duckdb={a[0]} spark={b[0]}")
            n_fail += 1
        elif len(a[1]) != len(b[1]):
            print(f"FAIL {name}: rowcount duckdb={len(a[1])} spark={len(b[1])}")
            n_fail += 1
        elif a[1] != b[1]:
            diffs = [(x, y) for x, y in zip(a[1], b[1]) if x != y]
            print(f"FAIL {name}: {len(diffs)} differing rows; first: "
                  f"duckdb={diffs[0][0]} spark={diffs[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a[1])} rows)")
            n_pass += 1
    rows_only = set()
    for entry in sorted(produced):
        if entry not in oracle:
            try:
                n = pq.read_table(f"{out_dir}/{entry}").num_rows
                print(f"ROWS {entry}: {n} rows")
                rows_only.add(entry)
            except Exception as e:
                print(f"ROWS {entry}: unreadable: {e}")
    print(f"\n{n_pass} pass, {n_fail} fail, {len(rows_only)} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
