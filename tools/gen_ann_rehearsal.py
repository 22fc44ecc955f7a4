#!/usr/bin/env python3
"""Generate the ANN-family scale-rehearsal embedding corpora (SCALING.md §6).

The question (VERDICT r9 #3): does ANN recall@k HOLD as the corpus grows
10x at FIXED index parameters (k-means coarse cells, nProbe, PQ codebook
size, JL coarseC), and does wall time grow ~linearly? The dim-lookup
enrichment family is the reference's point-lookup at scale; ANN is this
repo's — its 100-TB claim should be measured, not argued, the same way
the pairwise-dedup family's was in §2.

Both sizes are drawn from ONE generative process mirroring the driver
corpus's measured shape (64-dim float32, per-component sigma=0.125,
labels uniform 0..9 and spatially meaningless, ~1% near-duplicate pairs
at cosine >= 0.35): isotropic Gaussian base vectors plus a near-dup
injection that copies a source vector with small noise. Within-process
2k -> 20k comparison is the valid proxy, exactly like the Heaps'-law
text rehearsal (gen_scale_rehearsal.py) and unlike tiling the driver
table (which would duplicate every vector 10x and make recall trivially
collapse onto the copies).

Output: target/ann_rehearsal/{sfS,sfL}/embeddings.parquet
Usage: python3 tools/gen_ann_rehearsal.py [n_small=2000] [n_large=20000]
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DIM = 64
SIGMA = 0.125
NEAR_DUP_RATE = 0.01
NEAR_DUP_NOISE = 0.03  # keeps injected pairs above the 0.35 cosine band


def gen(rng, n):
    v = rng.normal(0.0, SIGMA, size=(n, DIM)).astype(np.float32)
    for _ in range(int(n * NEAR_DUP_RATE)):
        src = rng.integers(0, n)
        dst = rng.integers(0, n)
        v[dst] = v[src] + rng.normal(0.0, NEAR_DUP_NOISE, DIM).astype(np.float32)
    labels = rng.integers(0, 10, size=n).astype(np.int32)
    return v, labels


def write(out_dir, v, labels):
    os.makedirs(out_dir, exist_ok=True)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(v), dtype=np.int64)),
        "embedding": pa.array([row.tolist() for row in v],
                              type=pa.list_(pa.float32())),
        "label": pa.array(labels),
    })
    pq.write_table(tbl, os.path.join(out_dir, "embeddings.parquet"))


def main():
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    n_large = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    # optional third decade (e.g. 200000 -> sfXL) for the 1x/10x/100x law
    n_xl = int(sys.argv[3]) if len(sys.argv) > 3 else None
    # optional fourth decade (e.g. 2000000 -> sfXXL; VERDICT r14 #4)
    n_xxl = int(sys.argv[4]) if len(sys.argv) > 4 else None
    rng = np.random.default_rng(42)
    sizes = [("sfS", n_small), ("sfL", n_large)] + (
        [("sfXL", n_xl)] if n_xl else []) + (
        [("sfXXL", n_xxl)] if n_xxl else [])
    for name, n in sizes:
        v, labels = gen(rng, n)
        write(os.path.join("target/ann_rehearsal", name), v, labels)
        print(f"[ann-rehearsal] {name}: {n} vectors x {DIM} dims")


if __name__ == "__main__":
    main()
