#!/usr/bin/env python3
"""Re-derive the DuckDB side of BpeSpec's cross-engine unicode parity pin.

The spec test "cross-engine unicode table parity" holds DuckDB-computed
bpe_count values as literals; this script recomputes them by running the
REAL text_bpe_count oracle SQL (dumped by graft.Verify) over the same
curated boundary code points. Run it after upgrading the JRE or DuckDB
and update the spec literals if (and only if) the two engines still
agree with each other:

    sbt -batch 'runMain graft.Verify /root/testdata/sf0.001 /tmp/vout'
    python3 tools/unicode_parity.py /tmp/vout/oracle_sql.json

The strings MUST stay byte-identical to the spec's escape sequences.
"""
import json
import sys

import duckdb

# keep in lockstep with BpeSpec "cross-engine unicode table parity" --
# explicit escapes so file encoding / NFC normalization can't drift
PINNED = [
    ("\u0130stanbul ICE", 9),
    ("\u1E9E\u00DF \u01C5\u01C4\u01C6", 5),
    ("\uA7BA\uA7BB", 2),
    ("\U00010400\U00010428 \U000104B0\U000104D8", 4),
    ("\u1C90\u10D0 \u1C91\u10D1", 4),
    ("\u13A0\uAB70", 2),
    ("\u02B0\u02B7 x", 3),
    ("\u2160 \u2163", 2),
    ("a\u0300e\u0301", 4),
    ("\U00016E40\U00016E60", 2),
    ("\uA7C0\uA7C1", 2),
    ("\u0390 \u0345", 2),
    ("\u023A\u2C65\u023E", 3),
    ("\uFB00 \uFB01", 2),
    ("\u03A3\u039F\u03A3 \u03C3\u03BF\u03C2", 6),
]


def main() -> int:
    oracle_json = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout/oracle_sql.json"
    sql = json.load(open(oracle_json))["text_bpe_count"]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)",
        [(i, t) for i, (t, _) in enumerate(PINNED)],
    )
    got = {r[0]: r[1] for r in con.execute(sql).fetchall()}
    rc = 0
    print(f"duckdb {duckdb.__version__}")
    for i, (t, want) in enumerate(PINNED):
        mark = "ok  " if got.get(i) == want else "DIFF"
        if got.get(i) != want:
            rc = 1
        print(f"[{mark}] doc {i}: duckdb={got.get(i)} pinned={want}  {t!r}")
    print("== parity holds ==" if rc == 0 else
          "== DRIFT: update BpeSpec literals iff engines still agree ==")
    return rc


if __name__ == "__main__":
    sys.exit(main())
