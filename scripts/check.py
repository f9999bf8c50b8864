#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB over the
sfDir tables, and compares: columns sorted by name, rows sorted by all
columns, exact value equality (floats compared exactly — the engine is
designed for bit-identical oracle parity via exact decimal sums).
"""
import sys, os, json, glob
import duckdb

def norm(rows):
    # normalize to tuples of repr-comparable values
    return sorted([tuple(str(v) for v in r) for r in rows])

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no parquet written"); n_fail += 1; continue
        got = con.sql(f"SELECT * FROM '{files[0]}'")
        got_cols = sorted(got.columns)
        got_rows = con.sql(
            f"SELECT {', '.join(quote(c) for c in got_cols)} FROM '{files[0]}'"
        ).fetchall()
        if name not in oracles:
            print(f"rows {name}: {len(got_rows)} rows (rows-only check)")
            n_rowsonly += 1
            continue
        try:
            exp = con.sql(oracles[name])
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        # The driver's compare stringifies via pandas, where HUGEINT
        # (DuckDB's sum-of-integers type) becomes float64 ("5.0" vs
        # Spark's "5") — a hash mismatch invisible to fetchall(). Flag
        # any oracle column type that doesn't survive the pandas trip.
        bad = [(c, str(t)) for c, t in zip(exp.columns, exp.types)
               if str(t) in ("HUGEINT", "UHUGEINT", "UBIGINT")
               or str(t).startswith("DECIMAL")]
        if bad:
            print(f"FAIL {name}: oracle emits pandas-unsafe types {bad}; "
                  f"CAST to BIGINT/DOUBLE in the oracle SQL")
            n_fail += 1; continue
        exp_cols = sorted(exp.columns)
        if exp_cols != got_cols:
            print(f"FAIL {name}: columns differ\n  spark: {got_cols}\n  duck:  {exp_cols}")
            n_fail += 1; continue
        exp_rows = con.sql(
            f"SELECT {', '.join(quote(c) for c in exp_cols)} FROM ({oracles[name]})"
        ).fetchall()
        g, e = norm(got_rows), norm(exp_rows)
        if g == e:
            print(f"PASS {name}: {len(g)} rows"); n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows differ (spark={len(g)}, duck={len(e)})")
            for i, (a, b) in enumerate(zip(g, e)):
                if a != b:
                    print(f"  first diff at sorted-row {i}:\n   spark: {a}\n   duck:  {b}")
                    break
            else:
                if len(g) != len(e):
                    only_g = set(g) - set(e); only_e = set(e) - set(g)
                    if only_g: print(f"   spark-only: {list(only_g)[:2]}")
                    if only_e: print(f"   duck-only:  {list(only_e)[:2]}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0

def quote(c):
    return '"' + c.replace('"', '""') + '"'

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
