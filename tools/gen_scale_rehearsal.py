#!/usr/bin/env python3
"""Generate a ~sf1 documents table (10x sf0.1 docs) for the pairwise-dedup
scale rehearsal (SCALING.md).

Replicates the sf0.1 corpus's generative shape — same vocabulary, same
per-document word-count distribution, same (lang, source) mix, similar
exact-/near-duplicate rates — rather than tiling the corpus 10x, which
would multiply every fingerprint's document frequency by 10 and invalidate
the df-cap scaling question the rehearsal asks.

Output: target/rehearsal/sf1/documents.parquet, with the other 9 tables
symlinked from /root/testdata/sf0.1 so Tables.contractCheck passes.

Usage: python3 tools/gen_scale_rehearsal.py [n_docs=50000]
"""
import os
import random
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT_DIR = "target/rehearsal/sf1"
EXACT_DUP_RATE = 0.0016  # 8 / 5000 in the sf0.1 corpus
NEAR_DUP_RATE = 0.01


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    rng = random.Random(42)
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT text, lang, source FROM '{SRC}/documents.parquet'").fetchall()
    vocab = sorted({w for (t, _, _) in rows for w in t.split()})
    lengths = [len(t.split()) for (t, _, _) in rows]
    langsrc = [(l, s) for (_, l, s) in rows]

    texts, langs, sources = [], [], []
    for _ in range(n_docs):
        nw = rng.choice(lengths)
        texts.append(" ".join(rng.choice(vocab) for _ in range(nw)) + " ")
        l, s = rng.choice(langsrc)
        langs.append(l)
        sources.append(s)
    # inject duplicates at the observed rates: exact copies, and near-dups
    # with ~3 mutated words (the MinHash/winnow detection band)
    for _ in range(int(n_docs * EXACT_DUP_RATE)):
        texts[rng.randrange(n_docs)] = texts[rng.randrange(n_docs)]
    for _ in range(int(n_docs * NEAR_DUP_RATE)):
        srci = rng.randrange(n_docs)
        words = texts[srci].split()
        for _ in range(min(3, len(words))):
            words[rng.randrange(len(words))] = rng.choice(vocab)
        texts[rng.randrange(n_docs)] = " ".join(words) + " "

    os.makedirs(OUT_DIR, exist_ok=True)
    table = pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(table, f"{OUT_DIR}/documents.parquet")
    for name in ("region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem", "events", "embeddings"):
        dst = f"{OUT_DIR}/{name}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{name}.parquet", dst)
    print(f"wrote {n_docs} docs to {OUT_DIR}/documents.parquet "
          f"(vocab={len(vocab)}, avg_words={sum(lengths)/len(lengths):.0f})")


if __name__ == "__main__":
    main()
