#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/selfcheck.py [sfDir] [outDir]

Assumes `graft.Verify` was already run (e.g. via tools/run.sh verify) so
that outDir holds <name>.parquet dirs + oracle_sql.json. Registers every
testdata table as a DuckDB view, runs each oracle SQL, and compares with
the Spark result: schema (sorted column names), row count, and a
row-order-insensitive hash of values (floats rounded to 9 significant
digits before hashing to absorb last-ulp drift).
"""
import sys, os, glob, json, hashlib, math

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# STRICT mode (default) distinguishes int from float the way a
# pandas-mediated comparison does: DuckDB HUGEINT (sum of integers)
# becomes float64 in pandas, so an oracle `sum(bigint)` without
# CAST(... AS BIGINT) will NOT hash-match a Spark bigint. Round-1
# lesson: 5 queries passed the lenient local check but failed the
# driver's gate for exactly this reason.
STRICT = os.environ.get("SELFCHECK_LENIENT", "") == ""

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if STRICT and v == int(v) and abs(v) < 2**53:
            return f"float:{v!r}"
        if v == 0:
            return "0"
        return f"{v:.9g}"
    return repr(v)

def fetch(con, sql):
    """Fetch through pandas in STRICT mode — mirrors the driver's path,
    where DuckDB HUGEINT surfaces as float64 — else plain fetchall."""
    cur = con.execute(sql)
    if not STRICT:
        return [c[0] for c in cur.description], cur.fetchall()
    df = cur.df()
    cols = list(df.columns)
    series = [df[c].tolist() for c in cols]
    rows = list(zip(*series)) if cols else []
    return cols, rows

def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()

def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table dir (e.g. the ScaleUp sf1 corpus)
            p = f"{p}/*.parquet"
        elif not os.path.exists(p):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    produced = {os.path.basename(d): d for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d)}
    n_pass = n_fail = 0
    for name in sorted(produced):
        d = produced[name]
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        got_cols, got_rows = fetch(con, f"SELECT * FROM read_parquet({files!r})")
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows={len(got_rows)})")
            continue
        try:
            exp_cols, exp_rows = fetch(con, oracles[name])
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        ok = True
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols spark={sorted(got_cols)} oracle={sorted(exp_cols)}"); ok = False
        elif len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rows spark={len(got_rows)} oracle={len(exp_rows)}"); ok = False
        elif table_hash(got_rows, got_cols) != table_hash(exp_rows, exp_cols):
            print(f"FAIL {name}: value hash mismatch")
            gh = {l for l in ("\x1f".join(norm(v) for v in r) for r in got_rows)}
            # show a few diffs (aligned by sorted col order)
            order = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
            gset = sorted("\x1f".join(norm(r[i]) for i in order) for r in got_rows)
            eset = sorted("\x1f".join(norm(r[i]) for i in order) for r in exp_rows)
            import difflib
            for line in list(difflib.unified_diff(eset, gset, "oracle", "spark", lineterm=""))[:12]:
                print("   ", line[:200])
            ok = False
        if ok:
            print(f"PASS {name} ({len(got_rows)} rows)"); n_pass += 1
        else:
            n_fail += 1
    missing = set(oracles) - set(produced)
    for name in sorted(missing):
        print(f"FAIL {name}: oracle declared but no spark output"); n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(produced) - n_pass - n_fail + len(missing)} skipped ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
