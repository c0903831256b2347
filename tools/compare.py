#!/usr/bin/env python3
"""Local driver-style correctness check: Spark parquet dumps vs DuckDB oracle.

Usage: python3 tools/compare.py <sfdir> <verify_out_dir>
(run `sbt "runMain graft.Verify <sfdir> <out>"` first).
"""
import json, sys, glob, os
import duckdb

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        spark_dir = f"{outdir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"[FAIL] {name}: no spark output"); n_bad += 1; continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle error {e}"); n_bad += 1; continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"[FAIL] {name}: columns {gc} != {ec}"); n_bad += 1; continue
        g = got[gc].sort_values(gc).reset_index(drop=True)
        e = exp[ec].sort_values(ec).reset_index(drop=True)
        if len(g) != len(e):
            print(f"[FAIL] {name}: rows {len(g)} != {len(e)}"); n_bad += 1; continue
        mismatch = None
        for c in gc:
            gv, ev = g[c], e[c]
            try:
                eq = (gv == ev) | (gv.isna() & ev.isna())
            except Exception:
                eq = gv.astype(str) == ev.astype(str)
            if not eq.all():
                i = int((~eq).idxmax())
                mismatch = (c, i, gv[i], ev[i]); break
        if mismatch:
            c, i, a, b = mismatch
            print(f"[FAIL] {name}: col {c} row {i}: spark={a!r} oracle={b!r}")
            n_bad += 1
        else:
            # also flag dtype differences (driver may compare schemas)
            dt = [(c, str(g[c].dtype), str(e[c].dtype)) for c in gc
                  if str(g[c].dtype) != str(e[c].dtype)]
            note = f" dtypes differ: {dt}" if dt else ""
            print(f"[ok]   {name}: {len(g)} rows{note}")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
