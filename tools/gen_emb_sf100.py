#!/usr/bin/env python3
"""Generate localdata/sf100/embeddings.parquet = 10 x sf10 embeddings.

The sf100 step only needs the EMBEDDINGS table (dedup_embedding +
ann_lsh are the queries whose geometry dial first leaves the
oracle-default region there); scaling the full table set 1000x would
burn ~30 GB for nothing.

Scaling rule: gen_sf.py's circular shift alone cannot make 10 more
decorrelated copies of sf10 — sf10's copies already used shifts 0..99,
so composing another shift j would collide (shift i+j = shift i'+j')
and plant ~10M EXACT duplicate vectors, turning the benchmark into a
dup-pair-emission measurement instead of a scale measurement. Each
sf100 copy j therefore applies shift j AND a sign-flip mask: element k
negates iff bit ((k-1) % 4) of j is set. (shift, mask) pairs are
distinct across all 1000 base copies (masks differ across j; shifts
differ within j), the transform is norm-preserving, and flipping the
sign of ~half the coordinates of an isotropic vector decorrelates it,
so neighbor structure scales instead of duplicating. Copy j=0 is the
identity, preserving sf10's existing near-dup structure.

Usage: python3 tools/gen_emb_sf100.py [src_dir] [dst_dir]
Defaults: /root/repo/localdata/sf10 -> /root/repo/localdata/sf100.
"""
import duckdb, os, sys

src = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/localdata/sf10"
dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/localdata/sf100"
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()

stride = con.sql(
    f"SELECT max(vec_id)+1 FROM read_parquet('{src}/embeddings.parquet')"
).fetchone()[0]

copies = " UNION ALL ".join(f"""
      (SELECT vec_id + {j} * {stride} AS vec_id,
              list_transform(generate_series(1, len(embedding)),
                k -> embedding[((k - 1 + {j}) % len(embedding)) + 1] *
                     (CASE WHEN (({j} >> ((k - 1) % 4)) & 1) = 1
                           THEN -1 ELSE 1 END)) :: FLOAT[] AS embedding,
              label
       FROM read_parquet('{src}/embeddings.parquet'))"""
    for j in range(10))
con.execute(f"COPY ({copies}) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)")
n = con.sql(
    f"SELECT count(*), count(DISTINCT vec_id) "
    f"FROM read_parquet('{dst}/embeddings.parquet')").fetchone()
print("embeddings", n)
