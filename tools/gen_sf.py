#!/usr/bin/env python3
"""Deterministic sf1-class testdata from the driver's sf0.1 snapshot.

Usage: python3 tools/gen_sf.py [out_dir] [copies]

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
"""
import sys
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


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
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
        t = shifted(t, "doc_id", r)
        if r == 0:
            return t
        i = t.schema.get_field_index("text")
        txt = pc.binary_join_element_wise(
            t.column("text"), pa.scalar(f" copy{r}"), "")
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
