#!/usr/bin/env python3
"""Deterministic sf1-class testdata from the driver's sf0.1 snapshot.

Usage: python3 tools/gen_sf.py [out_dir] [copies] [--perturb]

The driver ships sf{0.001,0.01,0.1} only; the sf1 correctness pass
(BASELINE.md round-8 section) needs ~10x volume WITHOUT inventing a new
distribution. This replicates the sf0.1 FACT tables `copies` times
with disjoint key ranges (10 interleaved sf0.1 instances) and keeps
the dimension tables fixed — correctness comparisons stay valid
because Spark and the DuckDB oracle read the SAME files, whatever
their distribution.

Per-copy transforms (copy r, shift = r * 100_000_000 — wide enough
that q88's planted re-ingest offset (+10_000_000) stays INSIDE its
copy's key range instead of colliding with the next copy's real ids):
  orders     o_orderkey += shift            (o_custkey fixed: dims unscaled)
  lineitem   l_orderkey += shift            (part/supp refs fixed)
  events     event_id   += shift            (ts/user_id unchanged: denser stream)
  documents  doc_id     += shift, text += " copy<r>"  (kills cross-copy
             EXACT identity; copies stay near-dups — the web-corpus shape)
  embeddings vec_id     += shift, embedding[0] += r/1000  (breaks exact
             cosine tie mass while keeping copies near-identical)

Deterministic: pure arithmetic on the driver's seed=42 data, no RNG.

--perturb (the r18 sf10 mode): plain replication makes every document
near-identical to ALL of its other copies, so near-dup PAIR mass grows
~copies^2 — the r17 full-suite sf10 attempt died filling 76 GB of disk
inside the shared cooc store build, and 13 pair-family queries had to
be excluded. Real web corpora don't look like that: a document's
near-dups are a bounded set, not every crawl snapshot at once. The
perturb mode mutates each replica's WORDS deterministically so pair
mass scales ~linearly:

  replica r mutates word positions p with p%10 == (j*7)%10 for every
  step j <= r, keeping only the LATEST step's doc-keyed token
  `z<j>x<h>` (h hashed from (doc_id, pos); closed form below; 7 is
  coprime to 10, so 10 consecutive steps cycle all residues).
  Effect: replica r shares ~7/10 of its word 3-grams with
  r±1 (Jaccard ≈ 0.54, still a near-dup pair) and ~4/10 with r±2
  (≈ 0.25, below the 0.5 family threshold) — each doc's near-dup
  clique is its chain NEIGHBORS, per-shingle bucket occupancy is
  bounded by the mutation rate (~every shingle dies within a few
  steps), and total pair volume grows linearly with copies.

Pure integer arithmetic per (position, replica): no RNG, bit-stable
across runs.
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

SRC = "/root/testdata/sf0.1"
DIMS = ["region", "nation", "customer", "supplier", "part"]
SHIFT = 100_000_000
# Parquet can't split below row-group granularity: the driver's files
# are ONE row group each, so a replicated fact table read as a single
# 150k-row group runs every narrow scan pipeline on ONE core — the
# r10 sf3 bench showed regex-heavy document scans at 25x instead of
# 3x purely from this. 8k-row groups let Spark parallelize the scan
# the way any production-written parquet would.
ROW_GROUP = 8192


def shifted(table, col, r):
    i = table.schema.get_field_index(col)
    return table.set_column(i, table.schema.field(i),
                            pc.add(table.column(col), r * SHIFT))


def perturb_text(txt: pa.Array, doc_ids: np.ndarray, r: int) -> pa.Array:
    """Replica r's deterministic word mutation (see module doc).

    Closed form: word position p has residue rho = p % 10; the steps
    hitting rho are j == rho*3 (mod 10) (3 = 7^-1 mod 10; j0 == 0 means
    step 10). The word is mutated iff the first such step j0 <= r, and
    the surviving token is the LATEST one: j = r - ((r - j0) % 10).

    Mutated tokens are (doc, position, step)-specific — `z<j>x<h>`
    with h hashed from (original doc_id, pos). Replicas r and r' share
    the token exactly when the position's last step is the same (the
    chain-Jaccard structure), while DIFFERENT documents never share a
    mutated shingle: a corpus-wide token (the first cut of this mode)
    put the same shingle in every doc of a replica — df 20000 hot
    buckets, the q31 gate guard tripped, and the banding joins went
    quadratic again. Doc-keyed tokens keep every bucket ~as cold as
    the base corpus (sf0.1 max 3-gram df = 25; a shingle survives in
    at most ~10 consecutive replicas, so sf10p max df stays well under
    the family's 1024 df-cut).
    """
    words = pc.split_pattern(txt, " ")
    flat = words.values.to_numpy(zero_copy_only=False)
    offs = words.offsets.to_numpy()
    counts = np.diff(offs)
    pos = np.arange(len(flat), dtype=np.int64) - np.repeat(offs[:-1], counts)
    did = np.repeat(doc_ids, counts)
    j0 = (pos % 10) * 3 % 10
    j0[j0 == 0] = 10
    j = r - ((r - j0) % 10)
    mutated = j0 <= r
    h = (did * 8191 + pos) % 1000003
    tok = np.char.add(
        np.char.add("z", j.astype("U3")),
        np.char.add("x", h.astype("U7"))).astype(object)
    new_flat = np.where(mutated, tok, flat)
    rebuilt = pa.ListArray.from_arrays(words.offsets, pa.array(new_flat, pa.string()))
    return pc.binary_join(rebuilt, " ")


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    perturb = "--perturb" in sys.argv[3:]
    import os
    os.makedirs(out, exist_ok=True)
    for t in DIMS:
        pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"), f"{out}/{t}.parquet",
                       row_group_size=ROW_GROUP)
        print(f"{t}: copied")

    def fan(name, transform):
        src = pq.read_table(f"{SRC}/{name}.parquet")
        parts = [transform(src, r) for r in range(copies)]
        merged = pa.concat_tables(parts)
        pq.write_table(merged, f"{out}/{name}.parquet", row_group_size=ROW_GROUP)
        print(f"{name}: {src.num_rows} -> {merged.num_rows}")

    fan("orders", lambda t, r: shifted(t, "o_orderkey", r))
    fan("lineitem", lambda t, r: shifted(t, "l_orderkey", r))
    fan("events", lambda t, r: shifted(t, "event_id", r))

    def docs(t, r):
        # perturb BEFORE the id shift: mutation tokens key on the
        # ORIGINAL doc_id so replicas of the same doc share them
        orig_ids = t.column("doc_id").combine_chunks().to_numpy()
        t = shifted(t, "doc_id", r)
        if r == 0:
            return t
        i = t.schema.get_field_index("text")
        base = t.column("text").combine_chunks()
        if perturb:
            base = perturb_text(base, orig_ids, r)
        txt = pc.binary_join_element_wise(base, pa.scalar(f" copy{r}"), "")
        return t.set_column(i, t.schema.field(i), txt)
    fan("documents", docs)

    def emb(t, r):
        t = shifted(t, "vec_id", r)
        if r == 0:
            return t
        i = t.schema.get_field_index("embedding")
        col = t.column("embedding").combine_chunks()
        flat = col.values.to_numpy(zero_copy_only=False).copy()
        offs = col.offsets.to_numpy(zero_copy_only=False)
        # nudge each vector's first component by r/1000 (deterministic)
        flat[offs[:-1]] += r / 1000.0
        fixed = pa.ListArray.from_arrays(col.offsets, pa.array(flat, pa.float32()))
        return t.set_column(i, pa.field("embedding", fixed.type), fixed)
    fan("embeddings", emb)


if __name__ == "__main__":
    main()
