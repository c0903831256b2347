#!/usr/bin/env python3
"""Generate localdata/clustered_sorted: the 112-cluster corpus in
CLUSTER-SORTED order — the data layout real corpora ship in (grouped
by source/shard) and the slice-seeded coarse quantizer's failure mode:
the centroid seed slice [8, 8+cells) lands inside the first cluster(s)
instead of covering the corpus. Same generator family as AnnSpec's
clusteredDir (unit Gaussian cluster centers, sigma 0.35, unit-norm
rows); queries 0-7 are planted in clusters 0-7.

Usage: python3 tools/gen_clustered_sorted.py [n] [clusters] [dst]
"""
import os, sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

n = int(sys.argv[1]) if len(sys.argv) > 1 else 200000
C = int(sys.argv[2]) if len(sys.argv) > 2 else 112
dst = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/localdata/clustered_sorted"
os.makedirs(dst, exist_ok=True)
rng = np.random.default_rng(44)
centers = rng.standard_normal((C, 64))

def unit(v):
    return (v / np.linalg.norm(v, axis=-1, keepdims=True)).astype(np.float32)

qs = unit(centers[:8] + 0.35 * rng.standard_normal((8, 64)))
per = (n - 8) // C
labels = np.repeat(np.arange(C), per)
labels = np.concatenate([labels, np.full((n - 8) - len(labels), C - 1)])
corpus = unit(centers[labels] + 0.35 * rng.standard_normal((len(labels), 64)))
emb = np.vstack([qs, corpus])
lab = np.concatenate([np.arange(8), labels])
tbl = pa.table({
    "vec_id": pa.array(np.arange(n), pa.int64()),
    "embedding": pa.FixedSizeListArray.from_arrays(
        pa.array(emb.reshape(-1), pa.float32()), 64).cast(pa.list_(pa.float32())),
    "label": pa.array(lab, pa.int64()),
})
pq.write_table(tbl, f"{dst}/embeddings.parquet")
print("wrote", n, "rows,", C, "clusters ->", dst)
