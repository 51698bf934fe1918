#!/usr/bin/env python3
"""Fresh-document corpus at scale: NOVEL docs with a controlled
near-dup rate — the realistic-density complement to gen_sf.py.

Usage: python3 tools/gen_fresh.py [out_dir] [n_docs] [n_vecs]
       (defaults: /tmp/sf3fresh 150000 60000 — sf3-class volume)

Why this exists: gen_sf.py replicates the sf0.1 corpus, so every doc
has copies-1 planted near-duplicates and the TRUE pair-family answer
(q31/q32/q33/q105 output) grows QUADRATICALLY in the copy count.
That's the right stress for answer-size handling, but it masks plan
behavior: a pair query can look super-linear purely because the
answer is. This generator makes each document novel (independent
draws from a shared vocabulary; expected cross-doc shingle overlap ~
zero) and plants near-dups at a controlled ~5% rate (every 20th doc
perturbs its predecessor), the measured web-corpus shape — so the
pair-family cost against it isolates PLAN-driven growth (candidate
generation, banding, verify) from answer-driven growth.

Deterministic: numpy PCG64 seeded 42; rerunning reproduces the bytes.
Dimension tables (and any fact the pair family doesn't read) are
copied from sf0.1 so Bench's warmup and non-doc queries still
resolve; documents/embeddings are fresh.
"""
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
ROW_GROUP = 8192  # see gen_sf.py: one-row-group files serialize scans
VOCAB = 30_000
NEAR_DUP_EVERY = 20   # ~5% of docs are a near-dup of their predecessor
PERTURB_RATE = 0.03   # word-replacement rate inside a near-dup
LANGS = ["en", "de", "fr", "es", "pt"]


TOPIC_WINDOW = 2000  # per-doc vocabulary slice (a topic)


def gen_documents(n_docs, rng):
    """Each doc draws zipf-ish words from its own TOPIC WINDOW of the
    vocabulary (a hash-derived slice), not from one global head — a
    global zipf head puts the same 30 words in every doc, which makes
    every 3-gram shingle df ~ n (tripping the q31 df-cut guard in a
    way no real corpus does) and collapses all simhashes onto the
    head's fingerprint. Topic windows keep cross-doc overlap low
    (novel docs), leaving the planted perturbed copies as the ONLY
    near-dup mass — the controlled ~5% rate.
    """
    vocab = np.array([f"w{i}" for i in range(VOCAB)])
    ranks = np.arange(1, TOPIC_WINDOW + 1, dtype=np.float64)
    probs = 1.0 / ranks
    probs /= probs.sum()
    lengths = rng.integers(60, 200, size=n_docs)
    texts = [None] * n_docs
    for i in range(n_docs):
        if i % NEAR_DUP_EVERY == NEAR_DUP_EVERY - 1 and i > 0:
            base = texts[i - 1].split(" ")
            k = max(1, int(len(base) * PERTURB_RATE))
            idx = rng.choice(len(base), size=k, replace=False)
            repl = vocab[rng.integers(0, VOCAB, size=k)]
            for j, w in zip(idx, repl):
                base[j] = w
            texts[i] = " ".join(base)
        else:
            off = (i * 2654435761) % (VOCAB - TOPIC_WINDOW)
            window = vocab[off:off + TOPIC_WINDOW]
            words = window[rng.choice(TOPIC_WINDOW, size=lengths[i], p=probs)]
            texts[i] = " ".join(words)
    langs = [LANGS[i % len(LANGS)] for i in range(n_docs)]
    return pa.table({
        "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(["fresh"] * n_docs, pa.string()),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    })


def gen_embeddings(n_vecs, rng, dim=64):
    vecs = rng.standard_normal((n_vecs, dim)).astype(np.float32)
    # plant near-dups: every 20th vector is its predecessor + tiny noise
    for i in range(NEAR_DUP_EVERY - 1, n_vecs, NEAR_DUP_EVERY):
        if i > 0:
            vecs[i] = vecs[i - 1] + \
                rng.standard_normal(dim).astype(np.float32) * 0.02
    flat = pa.array(vecs.reshape(-1), pa.float32())
    offsets = pa.array(np.arange(0, (n_vecs + 1) * dim, dim, dtype=np.int32))
    emb = pa.ListArray.from_arrays(offsets, flat)
    return pa.table({
        "vec_id": pa.array(np.arange(n_vecs, dtype=np.int64)),
        "embedding": emb,
        "label": pa.array((np.arange(n_vecs) % 10).astype(np.int32)),
    })


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf3fresh"
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 150_000
    n_vecs = int(sys.argv[3]) if len(sys.argv) > 3 else 60_000
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"]:
        src = f"{SRC}/{t}.parquet"
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copyfile(src, dst)
    docs = gen_documents(n_docs, rng)
    pq.write_table(docs, f"{out}/documents.parquet", row_group_size=ROW_GROUP)
    print(f"documents: {n_docs} fresh ({n_docs // NEAR_DUP_EVERY} planted near-dups)")
    emb = gen_embeddings(n_vecs, rng)
    pq.write_table(emb, f"{out}/embeddings.parquet", row_group_size=ROW_GROUP)
    print(f"embeddings: {n_vecs} fresh ({n_vecs // NEAR_DUP_EVERY} planted near-dups)")


if __name__ == "__main__":
    main()
