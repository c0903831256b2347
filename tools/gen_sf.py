#!/usr/bin/env python3
"""Generate localdata/sf<10x> = N x an existing scale factor.

Usage: python3 tools/gen_sf.py [src_dir] [dst_dir] [N]
Defaults: /root/testdata/sf0.1 -> /root/repo/localdata/sf1, N=10.

Scaling rules (BASELINE.md round-9 "10x scale step"):
- dims (region, nation) copy verbatim;
- keyed tables shift their pk (and the fks that reference them) by
  i * (max_key + 1) per copy i, so referential structure is preserved;
- events write ts as TIMESTAMPTZ (UTC session): parquet gets
  timestamp[us, tz=UTC], which Spark reads as a plain TimestampType
  (the naive variants read back as TIMESTAMP_NTZ and break
  unix_micros) and DuckDB's timestamp functions keep working; the
  sub-microsecond truncation matches Spark's own nanos→micros path;
- documents mutate every WORD with a per-copy letter suffix: each copy
  is a disjoint "dialect", so exact/near-dup structure scales 10x
  instead of every doc gaining 9 cross-copy duplicates (which would
  explode pair enumeration quadratically and measure nothing real);
- embeddings circularly shift by i positions: norm-preserving, and a
  shifted random vector decorrelates from its source, so ANN/dedup
  neighbor structure scales instead of duplicating.
"""
import duckdb, os, sys

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/localdata/sf1"
N = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(dst, exist_ok=True)
con = duckdb.connect()

def rd(t):
    return f"read_parquet('{src}/{t}.parquet')"

def write(t, sql):
    con.execute(f"COPY ({sql}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
    print(t, n)

for t in ["region", "nation"]:
    write(t, f"SELECT * FROM {rd(t)}")

stride = {}
for t, k in [("customer", "c_custkey"), ("supplier", "s_suppkey"),
             ("part", "p_partkey"), ("orders", "o_orderkey"),
             ("events", "event_id"), ("events", "user_id"),
             ("documents", "doc_id"), ("embeddings", "vec_id")]:
    stride[k] = con.sql(f"SELECT max({k})+1 FROM {rd(t)}").fetchone()[0]
print("strides:", stride)

def copies(sql_i):
    return " UNION ALL ".join(sql_i(i) for i in range(N))

write("customer", copies(lambda i:
    f"SELECT c_custkey + {i*stride['c_custkey']} AS c_custkey, "
    f"c_name, c_nationkey, c_acctbal, c_mktsegment FROM {rd('customer')}"))
write("supplier", copies(lambda i:
    f"SELECT s_suppkey + {i*stride['s_suppkey']} AS s_suppkey, "
    f"* EXCLUDE (s_suppkey) FROM {rd('supplier')}"))
write("part", copies(lambda i:
    f"SELECT p_partkey + {i*stride['p_partkey']} AS p_partkey, "
    f"* EXCLUDE (p_partkey) FROM {rd('part')}"))
write("orders", copies(lambda i:
    f"SELECT o_orderkey + {i*stride['o_orderkey']} AS o_orderkey, "
    f"o_custkey + {i*stride['c_custkey']} AS o_custkey, o_orderstatus, "
    f"o_totalprice, o_orderdate, o_orderpriority FROM {rd('orders')}"))
write("lineitem", copies(lambda i:
    f"SELECT l_orderkey + {i*stride['o_orderkey']} AS l_orderkey, "
    f"l_partkey + {i*stride['p_partkey']} AS l_partkey, "
    f"l_suppkey + {i*stride['s_suppkey']} AS l_suppkey, "
    f"* EXCLUDE (l_orderkey, l_partkey, l_suppkey) FROM {rd('lineitem')}"))
# PLANTED HEAVY KEY (r12 advisory): the per-copy user_id shift spreads
# every user's share by 1/N, so above sf0.1 NO user exceeds the 1/128
# heavy-hitter threshold and the events_heavy_hitters scale record was
# vacuously 0 rows from both engines. Remap a deterministic 1/64 slice
# of events (source event_id % 64 == 0, same rows in every copy) onto
# user_id 1, so exactly one planted hot key (~15625 ppm share) crosses
# the gate at EVERY scale factor while the tail still scales 10x.
write("events", copies(lambda i:
    f"SELECT event_id + {i*stride['event_id']} AS event_id, "
    f"CAST(ts AS TIMESTAMPTZ) AS ts, "
    f"CASE WHEN event_id % 64 = 0 THEN 1 "
    f"ELSE user_id + {i*stride['user_id']} END AS user_id, "
    f"event_type, value, props FROM {rd('events')}"))

def doc_i(i):
    if i == 0:
        return f"SELECT * FROM {rd('documents')}"
    sfx = "q" + chr(ord('a') + i)
    mut = f"regexp_replace(text, '(\\p{{L}}+)', '\\1{sfx}', 'g')"
    return (f"SELECT doc_id + {i*stride['doc_id']} AS doc_id, {mut} AS text, "
            f"lang, source, CAST(length({mut}) AS BIGINT) AS n_chars "
            f"FROM {rd('documents')}")
write("documents", copies(doc_i))

def emb_i(i):
    if i == 0:
        return f"SELECT * FROM {rd('embeddings')}"
    return (f"SELECT vec_id + {i*stride['vec_id']} AS vec_id, "
            f"embedding[{i+1}:64] || embedding[1:{i}] AS embedding, label "
            f"FROM {rd('embeddings')}")
write("embeddings", copies(emb_i))
print("DONE")
