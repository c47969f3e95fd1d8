#!/usr/bin/env python
"""Build /tmp/sfemb: a 200k x 64 embeddings fixture (VERDICT r8 item
4 — the driver fixture holds ~2k-20k vectors at every sf, so every
cosine/ANN 'sf' number so far was a floor measurement). Deterministic
Gaussian mixture (seed 9): 128 cluster centers on the unit sphere,
cluster sizes Zipf-ish so IVF cells and LSH buckets see realistic
skew, per-point noise sigma=0.35 — near-duplicate structure exists
(same-cluster cosines ~0.8) without degenerate exact ties. Other
tables copy through from /tmp/sfbig so the oracle's view
registration and any documents-joined spec still work. Usage:
python scripts_dev/make_emb_big.py [n_rows] [out_dir]"""
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfemb"
DIM, K = 64, 128
SRC = "/tmp/sfbig"

os.makedirs(OUT, exist_ok=True)
rng = np.random.default_rng(9)
centers = rng.standard_normal((K, DIM)).astype(np.float32)
centers /= np.linalg.norm(centers, axis=1, keepdims=True)
# Zipf-ish cluster mass, normalized
w = 1.0 / np.arange(1, K + 1) ** 0.7
w /= w.sum()
labels = rng.choice(K, size=N, p=w).astype(np.int32)
vecs = centers[labels] + 0.35 * rng.standard_normal((N, DIM)).astype(
    np.float32
)
tbl = pa.table(
    {
        "vec_id": pa.array(np.arange(N, dtype=np.int64)),
        "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
        "label": pa.array(labels, type=pa.int32()),
    }
)
pq.write_table(tbl, os.path.join(OUT, "embeddings.parquet"))
for t in (
    "region nation supplier part customer orders lineitem events "
    "documents".split()
):
    src = os.path.join(SRC, f"{t}.parquet")
    dst = os.path.join(OUT, f"{t}.parquet")
    if os.path.exists(src) and not os.path.exists(dst):
        shutil.copy(src, dst)
print(f"{OUT}/embeddings.parquet: {N} x {DIM}, {K} clusters")
