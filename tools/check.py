#!/usr/bin/env python3
"""Local oracle check mirroring the driver's DuckDB compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with views
registered over <sfDir>/*.parquet, reads the Spark result parquet from
<verifyOutDir>/<name>/, sorts columns by name and rows by all columns, and
compares cell values exactly. Dev-only tool (driver-side python env).
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    # sort columns by name, then rows by stringified values
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    out.sort(key=lambda t: tuple("\0" if v is None else str(v) for v in t))
    return [cols[i] for i in order], out


def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        if isinstance(a, float) and isinstance(b, float) and math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return str(a) == str(b)


def dtype_warnings(name, wdf, gdf):
    """Mirror the driver's pandas pathway: it stringifies cells after a
    pandas coercion, so equal values with different dtypes (DuckDB HUGEINT
    -> float64 vs Spark int64: '26133.0' != '26133') hash-mismatch, and
    list/ndarray cells crash its sort_values. Warn on both so the value-
    exact compare above can't silently diverge from the driver's verdict."""
    warns = []
    for col in sorted(set(wdf.columns) & set(gdf.columns)):
        wd, gd = wdf[col].dtype, gdf[col].dtype
        # Same-kind width differences (int32 vs int64) stringify identically;
        # only a kind change (int vs float: '26133' vs '26133.0', or a fall
        # to object) alters the driver's stringify-hash.
        if wd.kind != gd.kind:
            warns.append(f"dtype kind mismatch col {col}: spark={gd} oracle={wd}"
                         " (driver stringify-hash may differ; CAST the oracle)")
        for side, df in (("oracle", wdf), ("spark", gdf)):
            s = df[col].dropna()
            if len(s) and isinstance(s.iloc[0], (list, tuple)) or \
               len(s) and type(s.iloc[0]).__name__ == "ndarray":
                warns.append(f"non-scalar col {col} on {side} side"
                             " (driver pandas sort will crash; array_join it)")
    for w in warns:
        print(f"WARN {name}: {w}")
    return warns


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_warn = 0
    # entries without oracle SQL get the driver's weaker rows-only check
    import os
    dumped = {d for d in os.listdir(out_dir)
              if os.path.isdir(f"{out_dir}/{d}")}
    def error_marker(name):
        p = f"{out_dir}/{name}/_ERROR"
        if os.path.exists(p):
            return open(p).read().strip()
        return None

    for name in sorted(dumped - set(oracle)):
        if only and name not in only:
            continue
        err = error_marker(name)
        if err is not None:
            print(f"FAIL {name} (rows-only): query errored: {err}")
            n_fail += 1
            continue
        try:
            n = con.execute(f"SELECT COUNT(1) FROM '{out_dir}/{name}/*.parquet'").fetchone()[0]
        except Exception as e:
            print(f"FAIL {name} (rows-only): {e}")
            n_fail += 1
            continue
        if n > 0:
            print(f"PASS {name} (rows-only, {n} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name} (rows-only): 0 rows")
            n_fail += 1
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        err = error_marker(name)
        if err is not None:
            print(f"FAIL {name}: query errored: {err}")
            n_fail += 1
            continue
        try:
            want = con.execute(sql)
            wcols = [d[0] for d in want.description]
            wrows = want.fetchall()
            got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            gcols = [d[0] for d in got.description]
            grows = got.fetchall()
            # dtype frames are bounded: kind mismatches and non-scalar
            # cells show up in the first rows, no need to re-pull all
            wdf = con.execute(f"SELECT * FROM ({sql}) LIMIT 256").df()
            gdf = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet' LIMIT 256").df()
            n_warn += len(dtype_warnings(name, wdf, gdf))
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        wcols, wrows = canon(wrows, wcols)
        gcols, grows = canon(grows, gcols)
        if wcols != gcols:
            print(f"FAIL {name}: columns differ spark={gcols} oracle={wcols}")
            n_fail += 1
            continue
        if len(wrows) != len(grows):
            print(f"FAIL {name}: rowcount spark={len(grows)} oracle={len(wrows)}")
            n_fail += 1
            continue
        bad = None
        for i, (wr, gr) in enumerate(zip(wrows, grows)):
            for c, (wv, gv) in enumerate(zip(wr, gr)):
                if not eq(wv, gv):
                    bad = (i, wcols[c], gv, wv)
                    break
            if bad:
                break
        if bad:
            i, c, gv, wv = bad
            print(f"FAIL {name}: row {i} col {c}: spark={gv!r} oracle={wv!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail / {n_warn} dtype warnings")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
