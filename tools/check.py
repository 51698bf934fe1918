#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> [sf_dir]

Reads <out>/oracle_sql.json + each <out>/<name>/ parquet dump written by
graft.Verify, runs each oracle SQL in DuckDB against views named after
the testdata tables, and compares: columns sorted by name, rows sorted
by all columns, exact value equality (floats compared bit-exact first,
then with 1e-9 rel tolerance reported separately).
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True,
                            key=lambda s: s.astype(str))
    return df.reset_index(drop=True)

def main():
    out = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    # spill to /tmp, not the cwd (a runaway oracle at large sf once
    # dropped 38 GB of .tmp spill files inside the repo); optional
    # GRAFT_CHECK_MEM caps duckdb so an infeasible oracle dies fast
    # instead of eating the box (driver sets neither)
    con.execute("SET temp_directory='/tmp/graft_duckdb_spill'")
    mem = os.environ.get("GRAFT_CHECK_MEM", "")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    # optional spill cap (driver sets neither): without it a quadratic
    # oracle at large sf SPILLS past the memory limit instead of dying —
    # 50+ GB of /tmp and no progress signal (the r17 sf1 incident)
    tmpcap = os.environ.get("GRAFT_CHECK_TMP", "")
    if tmpcap:
        con.execute(f"SET max_temp_directory_size='{tmpcap}'")
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    # stale-model guard: the gate-model exports in /tmp/graft_gate_models
    # are global and overwritten by every Verify run — comparing a dump
    # against models trained on a DIFFERENT sf dir fails the
    # model-consumer oracles (q32/q33/q81/q92/q105/q148/q151/...) with
    # confusing value diffs. Verify stamps both dirs; warn on mismatch.
    stamp = lambda p: open(p).read().strip() if os.path.exists(p) else None
    dump_sf = stamp(f"{out}/_SF_DIR")
    model_sf = stamp("/tmp/graft_gate_models/_SF_DIR")
    if dump_sf and model_sf and dump_sf != model_sf:
        msg = (f"dump was generated at sf dir '{dump_sf}' but the gate "
               f"models were last exported for '{model_sf}' — model-consumer "
               "oracles WILL mismatch; re-run graft.Verify for this sf first")
        # fail FAST by default: a scripted gate must not burn a long
        # run on a known-bad model/dump pairing and then report the
        # same confusing value diffs this stamp exists to prevent.
        # GRAFT_CHECK_ALLOW_STALE_MODELS=1 is the escape hatch for an
        # INTENTIONAL cross-sf comparison.
        if os.environ.get("GRAFT_CHECK_ALLOW_STALE_MODELS", "") == "1":
            print(f"WARN (GRAFT_CHECK_ALLOW_STALE_MODELS=1): {msg}")
        else:
            print(f"FATAL: {msg}")
            sys.exit(2)
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    # Local escape hatch (driver never sets it): GRAFT_CHECK_SKIP=q52,...
    # skips queries whose ORACLE is infeasible at a given sf (e.g. the
    # uncut pair-graph CTEs at sf1 in single-node DuckDB) — skipped
    # queries are reported, never silently counted as pass.
    skip = set(filter(None, os.environ.get("GRAFT_CHECK_SKIP", "").split(",")))
    names = sorted([os.path.basename(p) for p in glob.glob(f"{out}/*")
                    if os.path.isdir(p)])
    for name in sorted(skip & set(names)):
        print(f"SKIP {name}: oracle skipped via GRAFT_CHECK_SKIP")
    names = [n for n in names if n not in skip]
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracles:
            print(f"ROWS {name}: rows={len(got)} (rows-only, no oracle)")
            if len(got) == 0:
                print(f"  WARN {name}: zero rows")
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1; continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}"); n_fail += 1
            continue
        bad = []
        for c in g.columns:
            a, b = g[c].values, w[c].values
            # Spark parquet timestamps load as datetime64[ns] while recent
            # duckdb .df() returns datetime64[us]; normalize before the
            # strict dtype check so equal instants don't false-FAIL.
            if a.dtype.kind == 'M' and b.dtype.kind == 'M':
                a = a.astype('datetime64[us]')
                b = b.astype('datetime64[us]')
            if a.dtype != b.dtype:
                bad.append(f"{c}: dtype {a.dtype} != {b.dtype}")
                continue
            if a.dtype.kind == 'f':
                eq = (a == b) | (np.isnan(a.astype(float)) & np.isnan(b.astype(float)))
                if not eq.all():
                    close = np.isclose(a.astype(float), b.astype(float),
                                       rtol=1e-9, equal_nan=True)
                    tag = "CLOSE-but-not-exact" if close.all() else "DIFF"
                    i = int(np.argmin(eq))
                    bad.append(f"{c}: {tag} e.g. row{i} {a[i]!r} vs {b[i]!r}")
            else:
                eq = pd.Series(a).astype(str) == pd.Series(b).astype(str)
                if not eq.all():
                    i = int(np.argmin(eq.values))
                    bad.append(f"{c}: DIFF e.g. row{i} {a[i]!r} vs {b[i]!r}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad)); n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
    extra = set(oracles) - set(names)
    if extra:
        print(f"WARN: oracles with no output dir: {sorted(extra)}")
    print(f"== {n_pass} pass, {n_fail} fail, {len(names)-n_pass-n_fail} rows-only ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
