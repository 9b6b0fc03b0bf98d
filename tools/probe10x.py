#!/usr/bin/env python3
"""Build the 10x scale-probe corpus used by SURVEY §8's probe lessons.

Scales the two corpus tables (documents ×10 with a deterministic text
perturbation, embeddings ×10 with a small deterministic nudge) and
symlinks the relational tables unchanged, so corpus-bound operators see
10× data while the TPC-H side stays fixed.

Usage: python3 tools/probe10x.py [sf_dir] [out_dir] [factor=10]
Then:  SPARK_GRAFT_SF_DIR=<out_dir> SPARK_GRAFT_CPUS=32 \
         sbt "runMain graft.Bench"
Compare per-query seconds against a clean sf_dir run: a ratio well
above the data growth means a quadratic candidate generator or a
"bounded" input that silently scales with the corpus (both happened —
SURVEY §8 lessons 24-26).
"""
import os
import shutil
import sys

import duckdb

def main():
    sf = os.path.abspath(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_probe10x"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    con = duckdb.connect()
    # replica id offset must clear the real id range AND the +1_000_000
    # synthetic-duplicate offset the dedup corpora add (corpusWithExactDups /
    # corpusWithNearVectors): with off > maxid + 1M, replica k's synthetic
    # ids (k*off + r + 1M, r <= maxid) stay below (k+1)*off for ANY maxid
    doc_off = con.sql(f"SELECT MAX(doc_id) + 1000001 FROM '{sf}/documents.parquet'").fetchone()[0]
    vec_off = con.sql(f"SELECT MAX(vec_id) + 1000001 FROM '{sf}/embeddings.parquet'").fetchone()[0]
    con.sql(f"""COPY (
      SELECT doc_id + {doc_off}*i.i AS doc_id,
             text || CASE WHEN i.i = 0 THEN '' ELSE ' rev' || i.i END AS text,
             lang, source, n_chars
      FROM '{sf}/documents.parquet', (SELECT unnest(range({factor})) AS i) i
    ) TO '{out}/documents.parquet' (FORMAT PARQUET)""")
    con.sql(f"""COPY (
      SELECT vec_id + {vec_off}*i.i AS vec_id,
             CAST(list_transform(embedding, x -> x + 0.0001*i.i) AS FLOAT[]) AS embedding,
             label
      FROM '{sf}/embeddings.parquet', (SELECT unnest(range({factor})) AS i) i
    ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
    for t in "region nation customer supplier part orders lineitem events".split():
        os.symlink(f"{sf}/{t}.parquet", f"{out}/{t}.parquet")
    docs = con.sql(f"SELECT COUNT(*) FROM '{out}/documents.parquet'").fetchone()[0]
    vecs = con.sql(f"SELECT COUNT(*) FROM '{out}/embeddings.parquet'").fetchone()[0]
    print(f"probe at {out}: {docs} docs, {vecs} vectors")

if __name__ == "__main__":
    main()
