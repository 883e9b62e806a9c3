#!/usr/bin/env python3
"""Local differential check: Verify's parquet dumps vs DuckDB oracle SQL.

Dev-only tool (uses driver-side python libs; NOT part of the Scala library).
Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1;  continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in sorted(files)],
                            ignore_index=True)
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}");  n_fail += 1;  continue
        ok, msg = compare(got, exp)
        if ok:
            print(f"PASS {name} ({len(got)} rows)");  n_pass += 1
        else:
            print(f"FAIL {name}: {msg}");  n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


def compare(got, exp):
    if sorted(got.columns) != sorted(exp.columns):
        return False, f"columns differ: {sorted(got.columns)} vs {sorted(exp.columns)}"
    cols = sorted(got.columns)
    got, exp = got[cols], exp[cols]
    if len(got) != len(exp):
        return False, f"row count {len(got)} vs {len(exp)}"
    for c in cols:
        g, e = got[c], exp[c]
        # normalize temporal / object types to comparable form
        if str(g.dtype).startswith("datetime") or str(e.dtype).startswith("datetime"):
            g = pd.to_datetime(g).astype("datetime64[us]")
            e = pd.to_datetime(e).astype("datetime64[us]")
        # dtype-strict: the driver's hash stringifies values, so int64 70 vs
        # float64 70.0 diverge there even when == here. Fail on numeric-kind
        # mismatch (int vs float vs object) to reproduce that locally.
        gk = "i" if g.dtype.kind in "iu" else g.dtype.kind
        ek = "i" if e.dtype.kind in "iu" else e.dtype.kind
        if gk != ek:
            return False, (f"col {c}: dtype kind mismatch {g.dtype} vs {e.dtype}"
                           " (driver hash is dtype-sensitive)")
        gn, en = g.isna().values, e.isna().values
        if not (gn == en).all():
            i = int(np.argmax(gn != en))
            return False, f"col {c}: null mismatch at row {i}: {g.iloc[i]!r} vs {e.iloc[i]!r}"
        gv, ev = g[~gn].values, e[~en].values
        if g.dtype == object:
            eq = all(x == y for x, y in zip(gv, ev))
        else:
            eq = (gv == ev).all() if len(gv) else True
        if not eq:
            if g.dtype == object:
                i = next(i for i, (x, y) in enumerate(zip(gv, ev)) if x != y)
            else:
                i = int(np.argmax(gv != ev))
            return False, f"col {c}: value mismatch (non-null row {i}): {gv[i]!r} vs {ev[i]!r}"
    return True, ""


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
