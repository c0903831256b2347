#!/usr/bin/env python3
"""Extend localdata/sf100 a decade for documents (+ events): 10 x sf10.

The r15 verdict's ask #7: text/dedup scale records stop at 500k docs
(sf10) while embeddings go to 2M — give the positioned-stream ops
(dedup_lines, dedup_substr_rewrite, sample_dsir/rho, the funnel) one
more decade. Scaling rules are gen_sf.py's, composed once more:

- documents: copy i appends a per-copy letter suffix to every word —
  sf10's words already carry the lower-level suffixes, so composing a
  NEW suffix again yields 10 disjoint dialects (exact/near-dup and
  line-dedup structure scales 10x instead of planting cross-copy
  duplicates);
- events: gen_sf.py's rule verbatim, including the planted heavy key
  (source event_id % 64 == 0 rows map to user_id 1 in every copy so
  exactly one hot user crosses the 1/128 gate at every SF).

Usage: python3 tools/gen_docs_sf100.py [src_dir] [dst_dir]
Defaults: /root/repo/localdata/sf10 -> /root/repo/localdata/sf100.
"""
import duckdb, os, sys

src = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/localdata/sf10"
dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/localdata/sf100"
N = 10

os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
con.execute("SET threads TO 16")


def rd(t):
    return f"read_parquet('{src}/{t}.parquet')"


def write(t, sql):
    con.execute(f"COPY ({sql}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    n = con.sql(
        f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')"
    ).fetchone()[0]
    print(t, n, flush=True)


def copies(sql_i):
    return " UNION ALL ".join(sql_i(i) for i in range(N))


doc_stride = con.sql(f"SELECT max(doc_id)+1 FROM {rd('documents')}").fetchone()[0]
ev_stride = con.sql(f"SELECT max(event_id)+1 FROM {rd('events')}").fetchone()[0]
u_stride = con.sql(f"SELECT max(user_id)+1 FROM {rd('events')}").fetchone()[0]
print("strides:", doc_stride, ev_stride, u_stride, flush=True)


def doc_i(i):
    if i == 0:
        return f"SELECT * FROM {rd('documents')}"
    sfx = "x" + chr(ord("a") + i)  # 'x' level: distinct from gen_sf's 'q'
    mut = f"regexp_replace(text, '(\\p{{L}}+)', '\\1{sfx}', 'g')"
    return (
        f"SELECT doc_id + {i*doc_stride} AS doc_id, {mut} AS text, "
        f"lang, source, CAST(length({mut}) AS BIGINT) AS n_chars "
        f"FROM {rd('documents')}"
    )


write("documents", copies(doc_i))

write("events", copies(lambda i:
    f"SELECT event_id + {i*ev_stride} AS event_id, "
    f"CAST(ts AS TIMESTAMPTZ) AS ts, "
    f"CASE WHEN event_id % 64 = 0 THEN 1 "
    f"ELSE user_id + {i*u_stride} END AS user_id, "
    f"event_type, value, props FROM {rd('events')}"))
print("DONE", flush=True)
