#!/usr/bin/env python3
"""Build the Nx scale-probe corpus used by SURVEY §8/§9's probe lessons.

Scales the two corpus tables (documents xF, embeddings xF) and symlinks
the relational tables unchanged, so corpus-bound operators see F-times
data while the TPC-H side stays fixed.

Two perturbation modes:

- clique (the original): replica i keeps the base text plus a ' revI'
  suffix / a +0.0001*i embedding nudge. Every replica of a doc is a
  near-dup of every other replica, so qualifying pairs grow ~F^2 BY
  CONSTRUCTION (a replica-clique corpus). Good for stress-testing
  output-volume handling; useless for reading an operator's intrinsic
  scaling curve, because output inflation dominates runtime.

- constant (constant dup-DENSITY): replica tier i is rewritten through a
  per-tier md5-derived SUBSTITUTION CIPHER on [A-Za-z0-9] (text) and a
  per-tier md5-derived SIGNED COORDINATE PERMUTATION (embeddings). Both
  transforms are similarity-PRESERVING within a tier (n-gram equality
  and inner products survive a bijection), and similarity-DESTROYING
  across tiers (different ciphers share ~no n-grams; random signed
  permutations decorrelate vectors). Qualifying pairs therefore grow
  exactly linearly: F x (base pairs), i.e. pairs-per-doc stays constant.
  Any operator whose runtime still grows super-linearly at constant
  density has an algorithmic problem, not an output-volume excuse.

Usage:
  python3 tools/probe10x.py [sf_dir] [out_dir] [factor] [mode] [tables]
    mode:   clique | constant           (default clique)
    tables: comma list of documents,embeddings to SCALE (default both;
            unscaled corpus tables are symlinked, factor 1 = symlink)
Then:
  SPARK_GRAFT_SF_DIR=<out_dir> SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_QUERIES=d_minhash_lsh,... sbt "runMain graft.Bench"

Compare per-query seconds against a clean sf_dir run: in constant mode
a runtime ratio well above F means a quadratic candidate generator or a
"bounded" input that silently scales with the corpus.
"""
import hashlib
import os
import random
import shutil
import sys

import duckdb

ALPHABET = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
DIM = 64


def tier_cipher(i: int) -> str:
    """Deterministic per-tier permutation of ALPHABET (identity at i=0)."""
    if i == 0:
        return ALPHABET
    rnd = random.Random(hashlib.md5(f"cipher:{i}".encode()).hexdigest())
    chars = list(ALPHABET)
    rnd.shuffle(chars)
    return "".join(chars)


def tier_perm_sign(i: int):
    """Deterministic per-tier signed coordinate permutation (identity at 0)."""
    if i == 0:
        return list(range(1, DIM + 1)), [1.0] * DIM
    rnd = random.Random(hashlib.md5(f"perm:{i}".encode()).hexdigest())
    perm = list(range(1, DIM + 1))
    rnd.shuffle(perm)
    sign = [1.0 if rnd.random() < 0.5 else -1.0 for _ in range(DIM)]
    return perm, sign


def main():
    sf = os.path.abspath(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_probe10x"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    mode = sys.argv[4] if len(sys.argv) > 4 else "clique"
    tables = set((sys.argv[5] if len(sys.argv) > 5 else "documents,embeddings").split(","))
    assert mode in ("clique", "constant"), mode
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    con = duckdb.connect()
    # replica id offset must clear the real id range AND the +1_000_000
    # synthetic-duplicate offset the dedup corpora add (corpusWithExactDups /
    # corpusWithNearVectors): with off > maxid + 1M, replica k's synthetic
    # ids (k*off + r + 1M, r <= maxid) stay below (k+1)*off for ANY maxid
    doc_off = con.sql(f"SELECT MAX(doc_id) + 1000001 FROM '{sf}/documents.parquet'").fetchone()[0]
    vec_off = con.sql(f"SELECT MAX(vec_id) + 1000001 FROM '{sf}/embeddings.parquet'").fetchone()[0]

    if "documents" in tables and factor > 1:
        if mode == "clique":
            con.sql(f"""COPY (
              SELECT doc_id + {doc_off}*i.i AS doc_id,
                     text || CASE WHEN i.i = 0 THEN '' ELSE ' rev' || i.i END AS text,
                     lang, source, n_chars
              FROM '{sf}/documents.parquet', (SELECT unnest(range({factor})) AS i) i
            ) TO '{out}/documents.parquet' (FORMAT PARQUET)""")
        else:
            tiers = []
            for i in range(factor):
                cipher = tier_cipher(i).replace("'", "''")
                tiers.append(
                    f"SELECT doc_id + {doc_off}*{i} AS doc_id, "
                    f"translate(text, '{ALPHABET}', '{cipher}') AS text, "
                    f"lang, source, n_chars FROM '{sf}/documents.parquet'")
            con.sql(f"COPY ({' UNION ALL '.join(tiers)}) TO '{out}/documents.parquet' (FORMAT PARQUET)")
    elif "documents" in tables:
        os.symlink(f"{sf}/documents.parquet", f"{out}/documents.parquet")

    if "embeddings" in tables and factor > 1:
        if mode == "clique":
            con.sql(f"""COPY (
              SELECT vec_id + {vec_off}*i.i AS vec_id,
                     CAST(list_transform(embedding, x -> x + 0.0001*i.i) AS FLOAT[]) AS embedding,
                     label
              FROM '{sf}/embeddings.parquet', (SELECT unnest(range({factor})) AS i) i
            ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
        else:
            tiers = []
            for i in range(factor):
                perm, sign = tier_perm_sign(i)
                elems = ", ".join(
                    f"{sign[j]:.1f}*embedding[{perm[j]}]" for j in range(DIM))
                tiers.append(
                    f"SELECT vec_id + {vec_off}*{i} AS vec_id, "
                    f"CAST([{elems}] AS FLOAT[]) AS embedding, "
                    f"label FROM '{sf}/embeddings.parquet'")
            con.sql(f"COPY ({' UNION ALL '.join(tiers)}) TO '{out}/embeddings.parquet' (FORMAT PARQUET)")
    else:
        os.symlink(f"{sf}/embeddings.parquet", f"{out}/embeddings.parquet")

    if "documents" not in tables:
        os.symlink(f"{sf}/documents.parquet", f"{out}/documents.parquet")

    if "events" in tables and factor > 1:
        # constant-density event scaling: tier i is a DISJOINT user
        # population (user_id/event_id offsets clear the real ranges),
        # identical per-user temporal behavior (ts untouched) — state
        # size and per-key history grow exactly linearly, so a
        # super-linear block-G runtime is an algorithmic problem, not a
        # workload artifact.
        ev_off = con.sql(f"SELECT MAX(event_id) + 1000001 FROM '{sf}/events.parquet'").fetchone()[0]
        u_off = con.sql(f"SELECT MAX(user_id) + 1000001 FROM '{sf}/events.parquet'").fetchone()[0]
        tiers = " UNION ALL ".join(
            f"SELECT event_id + {ev_off}*{i} AS event_id, ts, "
            f"user_id + {u_off}*{i} AS user_id, event_type, value, props "
            f"FROM '{sf}/events.parquet'" for i in range(factor))
        con.sql(f"COPY ({tiers}) TO '{out}/events.parquet' (FORMAT PARQUET)")
    else:
        os.symlink(f"{sf}/events.parquet", f"{out}/events.parquet")

    for t in "region nation customer supplier part orders lineitem".split():
        os.symlink(f"{sf}/{t}.parquet", f"{out}/{t}.parquet")
    docs = con.sql(f"SELECT COUNT(*) FROM '{out}/documents.parquet'").fetchone()[0]
    vecs = con.sql(f"SELECT COUNT(*) FROM '{out}/embeddings.parquet'").fetchone()[0]
    print(f"probe at {out} (mode={mode}): {docs} docs, {vecs} vectors")


if __name__ == "__main__":
    main()
