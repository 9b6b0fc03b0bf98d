#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 tools/check.py [sf_dir] [out_dir]

Assumes `sbt "runMain graft.Verify <sf_dir> <out_dir>"` has already run.
For each query result parquet in out_dir, runs the matching oracle SQL in
DuckDB over the same tables and compares: row count, column names, and
values (rows sorted by all columns, columns sorted by name).
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows):
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(repr(v))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


def main():
    # BOTH args are required: a defaulted out_dir silently grades a
    # stale dump (a judge hit this in round 12 — got the previous
    # fleet's 207 from /tmp/verify_out). Fail loudly instead.
    if len(sys.argv) < 3:
        sys.exit("usage: check.py <sf_dir> <out_dir> — out_dir must be "
                 "the directory the graft.Verify run just wrote "
                 "(no default: grading a stale dump is worse than an error)")
    sf_dir = sys.argv[1]
    out_dir = Path(sys.argv[2])

    # freshness stamp: Verify records registry size + git SHA + filter;
    # an unfiltered dump whose result-dir count disagrees with the
    # registry is stale/partial and must not be certified as the gate
    meta_p = out_dir / "verify_meta.json"
    meta = json.loads(meta_p.read_text()) if meta_p.exists() else None
    if meta:
        print(f"meta: registry={meta['registry_count']} dumped={meta['dumped_count']} "
              f"filter={meta['filter']} sha={meta['git_sha'][:12]} "
              f"fs={meta.get('fs_seam', '?')} sf={meta['sf_dir']}")
        n_dirs = sum(1 for p in out_dir.iterdir() if p.is_dir())
        if meta["filter"] is None and n_dirs != meta["registry_count"]:
            sys.exit(f"STALE/PARTIAL out dir: {n_dirs} result dirs but the "
                     f"registry at dump time had {meta['registry_count']} "
                     f"queries — rerun graft.Verify into a fresh dir")
    else:
        print("WARNING: no verify_meta.json — pre-stamp dump, freshness "
              "not certifiable (rerun graft.Verify to stamp)")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    oracle = json.loads((out_dir / "oracle_sql.json").read_text())

    n_pass = n_fail = n_rows_only = 0
    for res_dir in sorted(p for p in out_dir.iterdir() if p.is_dir()):
        name = res_dir.name
        got = con.execute(
            f"SELECT * FROM read_parquet('{res_dir}/*.parquet')"
        )
        got_cols = [c[0] for c in got.description]
        got_rows = got.fetchall()

        if name not in oracle:
            status = "rows-only"
            ok = len(got_rows) > 0
            n_rows_only += 1
            print(f"{'PASS' if ok else 'FAIL'} [{status}] {name}: rows={len(got_rows)}")
            if not ok:
                n_fail += 1
            continue

        exp = con.execute(oracle[name])
        exp_cols = [c[0] for c in exp.description]
        exp_rows = exp.fetchall()

        # driver sorts columns by name before hashing
        g_ix = [got_cols.index(c) for c in sorted(got_cols)]
        e_ix = [exp_cols.index(c) for c in sorted(exp_cols)]
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
            continue
        g = canon([tuple(r[i] for i in g_ix) for r in got_rows])
        e = canon([tuple(r[i] for i in e_ix) for r in exp_rows])
        if len(g) != len(e):
            print(f"FAIL {name}: rowcount {len(g)} != {len(e)}")
            n_fail += 1
        elif g != e:
            bad = [i for i, (a, b) in enumerate(zip(g, e)) if a != b][:3]
            print(f"FAIL {name}: value mismatch at sorted rows {bad}")
            for i in bad[:2]:
                print(f"   got {g[i]}\n   exp {e[i]}")
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(g)}")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
