#!/usr/bin/env python3
"""compare.py's check for above-gate records that exceed a default
DuckDB session: same verdict semantics (sorted column sets, row counts,
exact value equality) but computed COLUMNAR inside DuckDB — a
two-sided EXCEPT ALL instead of pandas sorts — under an explicit
memory limit, thread count, and spill directory, so a 100M-row oracle
replay degrades to disk instead of the OOM killer.

Usage: python3 tools/compare_big.py <sfdir> <verify_out_dir> [keys...]
"""
import json, sys, glob, os
import duckdb


def main(sfdir, outdir, keys):
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{os.environ.get('DUCK_MEM', '80GB')}'")
    con.execute(f"SET threads={os.environ.get('DUCK_THREADS', '32')}")
    tmp = os.environ.get("DUCK_TMP", "/tmp/duck_tmp")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        if keys and name not in keys:
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"[FAIL] {name}: no spark output"); n_bad += 1; continue
        try:
            con.execute(f"CREATE OR REPLACE VIEW cb_got AS "
                        f"SELECT * FROM read_parquet({files!r})")
            con.execute(f"CREATE OR REPLACE TEMP TABLE cb_exp AS {sql}")
            gc = [r[0] for r in con.execute("DESCRIBE cb_got").fetchall()]
            ec = [r[0] for r in con.execute("DESCRIBE cb_exp").fetchall()]
            if sorted(gc) != sorted(ec):
                print(f"[FAIL] {name}: columns {sorted(gc)} != {sorted(ec)}")
                n_bad += 1; continue
            cols = ", ".join(f'"{c}"' for c in sorted(gc))
            ng = con.execute("SELECT count(*) FROM cb_got").fetchone()[0]
            ne = con.execute("SELECT count(*) FROM cb_exp").fetchone()[0]
            if ng != ne:
                print(f"[FAIL] {name}: rows {ng} != {ne}"); n_bad += 1
                continue
            nd = con.execute(
                f"SELECT count(*) FROM ("
                f"(SELECT {cols} FROM cb_got EXCEPT ALL "
                f" SELECT {cols} FROM cb_exp) UNION ALL "
                f"(SELECT {cols} FROM cb_exp EXCEPT ALL "
                f" SELECT {cols} FROM cb_got))").fetchone()[0]
        except Exception as e:
            print(f"[FAIL] {name}: oracle error {e}"); n_bad += 1; continue
        if nd:
            print(f"[FAIL] {name}: {nd} differing rows"); n_bad += 1
        else:
            print(f"[ok]   {name}: {ng} rows"); n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
