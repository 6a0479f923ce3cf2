#!/usr/bin/env python3
"""Scale-stress corpus generator (round-7 scaling-evidence harness).

Builds an N-fold enlarged copy of an sf dir under /tmp, scaling the three
tables the heavy query families actually consume:

  - documents  (dedup/text family): replica k suffixes every TOKEN with
    the slice tag, so cross-slice shingle sets are fully disjoint (a word
    ROTATION was tried first and measured: rotations share almost all
    n-grams, which handed every doc 10 near-identical copies and blew the
    pair-emitting queries up ~1000x in OUTPUT — that measures duplicate
    density, not engine scaling). Token suffixing keeps each slice's
    internal dup structure bit-exact while duplicate DENSITY stays flat
    corpus-wide.
  - embeddings (ANN/semdedup family): replica k applies a CYCLIC SHIFT of
    the vector dimensions — an orthogonal transform, so intra-slice
    geometry (all cosines) is EXACTLY the original slice's, while
    cross-slice similarity on isotropic vectors is random noise. Near-dup
    density stays flat; corpus size scales.
  - lineitem   (sync/replication family; fileInventory derives from it):
    replica k offsets l_orderkey past the original key range, preserving
    the (orderkey, partkey, suppkey, linenumber) path uniqueness the
    set-algebra operators need.

Everything else is hard-linked from the source dir. Deterministic: no
RNG, all perturbations are arithmetic in the replica index.

Usage: gen_scale.py <srcSfDir> <destDir> <factor>
"""
import os, sys
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def scale_documents(src, dest, factor):
    con = duckdb.connect()
    base = con.execute(
        f"SELECT doc_id, text, lang, source, n_chars FROM '{src}/documents.parquet' "
        "ORDER BY doc_id").fetch_arrow_table()
    n = base.num_rows
    ids = base.column("doc_id").to_numpy()
    texts = base.column("text").to_pylist()
    out = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    langs = base.column("lang").to_pylist()
    sources = base.column("source").to_pylist()
    for k in range(factor):
        for i in range(n):
            t = texts[i]
            if k > 0:
                t = " ".join(w + "x" + str(k) for w in t.split(" "))
            out["doc_id"].append(int(ids[i]) + k * (int(ids.max()) + 1))
            out["text"].append(t)
            out["lang"].append(langs[i])
            out["source"].append(sources[i])
            out["n_chars"].append(len(t))
    pq.write_table(pa.table({
        "doc_id": pa.array(out["doc_id"], pa.int64()),
        "text": pa.array(out["text"], pa.string()),
        "lang": pa.array(out["lang"], pa.string()),
        "source": pa.array(out["source"], pa.string()),
        "n_chars": pa.array(out["n_chars"], pa.int64()),
    }), f"{dest}/documents.parquet")
    return n * factor


def scale_embeddings(src, dest, factor):
    t = pq.read_table(f"{src}/embeddings.parquet")
    ids = t.column("vec_id").to_numpy()
    labels = t.column("label").to_numpy()
    vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    n, dim = vecs.shape
    # distinct NONZERO shifts per replica: a zero or repeated shift makes
    # a replica a bit-exact copy of another and explodes the cross-slice
    # duplicate density the scaling evidence relies on. A stride coprime
    # with dim-1 walks 1..dim-1 without repeats, so distinctness is
    # guaranteed for factor <= dim (asserted as a backstop).
    from math import gcd
    assert factor <= dim, f"only {dim - 1} distinct cyclic shifts exist"
    stride = next(s for s in range(7, 7 + dim) if gcd(s, dim - 1) == 1)
    shifts = [1 + ((k - 1) * stride) % (dim - 1) for k in range(1, factor)]
    assert len(set(shifts)) == len(shifts) and 0 not in shifts, (
        f"replica shifts collide for factor={factor}, dim={dim}: {shifts}")
    all_ids, all_vecs, all_labels = [], [], []
    for k in range(factor):
        # cyclic dim shift: orthogonal, so slice-internal cosines are
        # bit-exactly the originals; cross-slice cosine is ~random
        v = np.roll(vecs, shifts[k - 1], axis=1) if k > 0 else vecs
        all_ids.append(ids + k * (ids.max() + 1))
        all_vecs.append(v)
        all_labels.append(labels)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.concatenate(all_ids), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in np.vstack(all_vecs)],
                              pa.list_(pa.float32())),
        "label": pa.array(np.concatenate(all_labels), pa.int32()),
    }), f"{dest}/embeddings.parquet")
    return n * factor


def scale_lineitem(src, dest, factor):
    con = duckdb.connect()
    max_key = con.execute(
        f"SELECT max(l_orderkey) + 1 FROM '{src}/lineitem.parquet'").fetchone()[0]
    reps = " UNION ALL ".join(
        f"SELECT * REPLACE (l_orderkey + {k * max_key} AS l_orderkey) "
        f"FROM '{src}/lineitem.parquet'" for k in range(factor))
    con.execute(f"COPY ({reps}) TO '{dest}/lineitem.parquet' (FORMAT PARQUET)")
    return con.execute(
        f"SELECT count(*) FROM '{dest}/lineitem.parquet'").fetchone()[0]


def main(src, dest, factor):
    os.makedirs(dest, exist_ok=True)
    scaled = {"documents", "embeddings", "lineitem"}
    for f in sorted(os.listdir(src)):
        if f.endswith(".parquet") and f.rsplit(".", 1)[0] not in scaled:
            target = os.path.join(dest, f)
            if not os.path.exists(target):
                os.link(os.path.join(src, f), target)
    print("documents:", scale_documents(src, dest, factor))
    print("embeddings:", scale_embeddings(src, dest, factor))
    print("lineitem:", scale_lineitem(src, dest, factor))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
