#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <outDir>

Reads <outDir>/oracle_sql.json (written by graft.Verify), runs each SQL
in DuckDB with views over <sfDir>/*.parquet, reads the Spark result
parquet from <outDir>/<name>/, sorts columns by name, and compares
values. Reports per-query PASS/FAIL with first diffs. Stricter than the
driver (exact compare, tiny fp tolerance reported separately).
"""
import json, math, sys, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def close(a, b):
    if a is None or b is None:
        return a is b
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return a == b

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Verify writes an explicit crash manifest (round-3 lesson: a
    # crashed query otherwise just VANISHES from the compare).
    try:
        crashed = json.load(open(f"{out_dir}/_failures.json"))
    except Exception:
        crashed = {}
    for name, msg in sorted(crashed.items()):
        print(f"CRASH {name}: {msg.splitlines()[0] if msg else ''}")
    n_pass = n_fail = n_exact_fail = 0
    for name in sorted(oracle):
        if name in crashed:
            continue  # already reported as CRASH; don't double-count
        sql = oracle[name]
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        sdf = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        ocols, scols = sorted(odf.columns), sorted(sdf.columns)
        if ocols != scols:
            print(f"FAIL {name}: cols oracle={ocols} spark={scols}")
            n_fail += 1
            continue
        # Driver-gate parity: the driver hashes typed values, so an
        # oracle HUGEINT (pandas float64/object) vs Spark BIGINT
        # (int64) mismatches even when Python `==` says the values are
        # equal (r01's q_conditional_agg). Integer WIDTH differs freely
        # (driver passed int32-vs-BIGINT in r01), so compare dtype
        # KINDS (int/float/bool/object/datetime), not exact dtypes.
        dtbad = [(c, str(odf[c].dtype), str(sdf[c].dtype))
                 for c in ocols if odf[c].dtype.kind != sdf[c].dtype.kind]
        if dtbad:
            print(f"FAIL {name}: dtype drift (oracle vs spark): {dtbad}")
            n_fail += 1
            continue
        orows = [tuple(norm(v) for v in r)
                 for r in odf[ocols].itertuples(index=False)]
        srows = [tuple(norm(v) for v in r)
                 for r in sdf[ocols].itertuples(index=False)]
        if len(orows) != len(srows):
            print(f"FAIL {name}: rows oracle={len(orows)} spark={len(srows)}")
            n_fail += 1
            continue
        exact = orows == srows
        bad = None
        if not exact:
            for i, (o, s) in enumerate(zip(orows, srows)):
                if not all(close(a, b) for a, b in zip(o, s)):
                    bad = (i, o, s)
                    break
        if bad:
            i, o, s = bad
            print(f"FAIL {name}: row {i}\n  oracle={o}\n  spark ={s}")
            n_fail += 1
        elif not exact:
            print(f"PASS~ {name} ({len(orows)} rows, fp-tolerance only!)")
            n_exact_fail += 1
            n_pass += 1
        else:
            print(f"PASS {name} ({len(orows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass ({n_exact_fail} non-exact), {n_fail} fail, "
          f"{len(crashed)} crashed ==")
    sys.exit(1 if (n_fail or crashed) else 0)

if __name__ == "__main__":
    main()
