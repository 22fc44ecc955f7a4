#!/usr/bin/env python3
"""Generate the pairwise-dedup scale-rehearsal corpora (SCALING.md).

The question the rehearsal answers: do the engine's df-capped /
bucket-capped candidate bounds (Sigma df^2, Sigma bucket^2) grow
~linearly in document count, as ARCHITECTURE.md claims for real corpora?

Why NOT tile or re-sample the driver's documents table: that corpus has a
CLOSED 31-word vocabulary, so every shingle's document frequency grows
linearly with corpus size — at 10x docs not one shingle stays under the
df<=10 cap (measured: rare-shingle count 17,116 at 5k docs -> 0 at 50k),
and the blocking would measure nothing. Real text obeys Heaps' law: the
vocabulary grows with the corpus and the low-df tail stays populated, so
an absolute df cap keeps a stable per-document candidate budget. The
rehearsal therefore generates BOTH sizes (5k and 50k docs) from ONE
Zipfian open-vocabulary process — the within-process 10x comparison is the
valid proxy for the 100-TB question, and the small corpus is kept close to
the driver table's shape (same doc-count, word-count distribution, (lang,
source) mix, exact/near-dup rates).

Output: target/rehearsal/{sfS,sfL}/documents.parquet with the other 9
tables symlinked from /root/testdata/sf0.1 so Tables.contractCheck passes.

Usage: python3 tools/gen_scale_rehearsal.py [n_small=5000] [n_large=50000]
"""
import bisect
import os
import random
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT_BASE = "target/rehearsal"
EXACT_DUP_RATE = 0.0016  # 8 / 5000 in the sf0.1 corpus
NEAR_DUP_RATE = 0.01
VOCAB_POOL = 200_000     # fixed Zipf pool; the tail supplies Heaps growth
ZIPF_S = 1.07            # classic natural-language exponent


def zipf_sampler(rng, n, s):
    """Inverse-CDF sampler over ranks 1..n with P(r) ~ 1/r^s."""
    cdf = []
    acc = 0.0
    for r in range(1, n + 1):
        acc += 1.0 / r ** s
        cdf.append(acc)
    total = cdf[-1]

    def draw():
        return bisect.bisect_left(cdf, rng.random() * total)

    return draw


def gen_corpus(rng, n_docs, lengths, langsrc, draw):
    texts, langs, sources = [], [], []
    for _ in range(n_docs):
        nw = rng.choice(lengths)
        texts.append(" ".join(f"w{draw()}" for _ in range(nw)) + " ")
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
            words[rng.randrange(len(words))] = f"w{draw()}"
        texts[rng.randrange(n_docs)] = " ".join(words) + " "
    return texts, langs, sources


def write_corpus(out_dir, texts, langs, sources):
    os.makedirs(out_dir, exist_ok=True)
    table = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(table, f"{out_dir}/documents.parquet")
    for name in ("region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem", "events", "embeddings"):
        dst = f"{out_dir}/{name}.parquet"
        if not os.path.exists(dst):
            os.symlink(os.path.abspath(f"{SRC}/{name}.parquet"), dst)


def main():
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    n_large = int(sys.argv[2]) if len(sys.argv) > 2 else 50000
    # optional third decade (e.g. 500000 -> sfXL) for the 1x/10x/100x law
    n_xl = int(sys.argv[3]) if len(sys.argv) > 3 else None
    rng = random.Random(42)
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT text, lang, source FROM '{SRC}/documents.parquet'").fetchall()
    lengths = [len(t.split()) for (t, _, _) in rows]
    langsrc = [(l, s) for (_, l, s) in rows]
    draw = zipf_sampler(rng, VOCAB_POOL, ZIPF_S)

    sizes = [("sfS", n_small), ("sfL", n_large)] + (
        [("sfXL", n_xl)] if n_xl else [])
    for label, n in sizes:
        texts, langs, sources = gen_corpus(rng, n, lengths, langsrc, draw)
        out = f"{OUT_BASE}/{label}"
        write_corpus(out, texts, langs, sources)
        vocab = len({w for t in texts for w in t.split()})
        print(f"{label}: {n} docs -> {out}/documents.parquet "
              f"(distinct words={vocab}, avg_words={sum(lengths)/len(lengths):.0f})")


if __name__ == "__main__":
    main()
