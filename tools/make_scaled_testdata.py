"""Materialize a scaled-up testdata tier from an existing sf dir.

The driver provides sf0.001 / sf0.01 / sf0.1; every 100 TB claim in
this repo ultimately needs a measured scaling curve, so this tool
derives an sfN tier (default 10x of sf0.1 ~= sf1) by KEY-SHIFTED
REPLICATION — each copy's keys move into a disjoint range with
foreign keys shifted consistently, so join fan-outs, group
cardinalities and selectivities scale like real data instead of
colliding:

* region / nation: fixed dimensions, copied as-is (as in TPC-H).
* customer / supplier / part: primary keys shift by copy * (max+1).
* orders: o_orderkey and o_custkey shift consistently.
* lineitem: l_orderkey / l_partkey / l_suppkey shift consistently.
* events: event_id and user_id shift (timestamps unchanged, so
  time-window groups get proportionally denser — the realistic
  shape for a busier service, and the worst case for rollups).
* documents: doc_id shifts; copies > 0 get a per-copy character
  rotation of every token (length-preserving vocabulary relabel)
  THEN a seeded per-(copy, doc) token shuffle. The shuffle destroys
  shingle/n-gram overlap (MinHash, winnowing, CDC candidates stay
  linear — without it editdist_candidate_verify measured 31x at 10x
  rows); the rotation destroys token-MULTISET equality, which the
  shuffle alone preserves and which bag-of-words SimHash hashes
  identically (without it every doc gets `factor` identical-simhash
  twins and the pair set grows C(factor,2) per family — measured as
  a single-straggler blowup of dedup_canonical_corpus at the 100x
  tier). n_chars is recomputed (rotation preserves it; belt and
  braces).
* embeddings: vec_id shifts; copies > 0 cyclically rotate the
  coordinates by the copy index. Rotation preserves norms and all
  within-copy distances (the kNN/cluster structure scales exactly
  linearly) while decorrelating copies — without it every vector has
  9 epsilon-twins and LSH/SemDeDup candidate sets grow quadratically
  (measured: embedding_lsh_neardup 33x, semdedup_prune 15x at 10x
  rows on the naive one-coordinate-perturbation variant).

Usage:
  python tools/make_scaled_testdata.py [--src /root/testdata/sf0.1]
      [--dst /tmp/levi_sf1] [--factor 10]

Deterministic: same inputs -> byte-identical outputs (fingerprinted
by bench_scale.py).
"""

from __future__ import annotations

import argparse
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _shift(table: pa.Table, col: str, amount: int) -> pa.Table:
    i = table.column_names.index(col)
    shifted = pc.add(table.column(col), pa.scalar(amount, pa.int64()))
    return table.set_column(i, col, shifted.cast(table.schema.field(col).type))


def _key_range(table: pa.Table, col: str) -> int:
    return pc.max(table.column(col)).as_py() + 1


def _inject_hot_user(table: pa.Table, frac: float) -> pa.Table:
    """Deliberate join/group skew for the skew-witness tier: reassign a
    deterministic ``frac`` of all event rows to ONE hot user_id (the
    Knuth-hash of event_id picks the rows, so the choice is stable
    across runs and independent of row order). At 100x this builds the
    real 100 TB hazard — one user owning a third of the table — that
    uniform key-shifted replication can never produce."""
    import numpy as np

    eid = table.column("event_id").combine_chunks().to_numpy(
        zero_copy_only=False
    ).astype(np.uint64)
    uid = table.column("user_id").combine_chunks().to_numpy(
        zero_copy_only=False
    ).copy()
    hot_id = int(uid.max()) + 1
    mask = (eid * np.uint64(2654435761)) % np.uint64(2**32) < np.uint64(
        int(frac * 2**32)
    )
    uid[mask] = hot_id
    i = table.column_names.index("user_id")
    out = table.set_column(
        i, "user_id",
        pa.array(uid, table.schema.field("user_id").type),
    )
    print(f"hot user {hot_id}: {int(mask.sum())} of {len(uid)} rows "
          f"({mask.mean():.1%})")
    return out


def scale(src: str, dst: str, factor: int, hot_frac: float = 0.0) -> None:
    os.makedirs(dst, exist_ok=True)
    t = {
        name: pq.read_table(os.path.join(src, f"{name}.parquet"))
        for name in ("customer", "supplier", "part", "orders",
                     "lineitem", "events", "documents", "embeddings")
    }
    for name in ("region", "nation"):
        shutil.copyfile(os.path.join(src, f"{name}.parquet"),
                        os.path.join(dst, f"{name}.parquet"))

    ck = _key_range(t["customer"], "c_custkey")
    sk = _key_range(t["supplier"], "s_suppkey")
    pk = _key_range(t["part"], "p_partkey")
    ok = _key_range(t["orders"], "o_orderkey")
    ek = _key_range(t["events"], "event_id")
    uk = _key_range(t["events"], "user_id")
    dk = _key_range(t["documents"], "doc_id")
    vk = _key_range(t["embeddings"], "vec_id")

    def copies(name, make):
        parts = [make(i) for i in range(factor)]
        out = pa.concat_tables(parts)
        pq.write_table(out, os.path.join(dst, f"{name}.parquet"),
                       compression="snappy")
        print(f"{name}: {len(out)} rows")

    copies("customer", lambda i: _shift(t["customer"], "c_custkey", i * ck))
    copies("supplier", lambda i: _shift(t["supplier"], "s_suppkey", i * sk))
    copies("part", lambda i: _shift(t["part"], "p_partkey", i * pk))
    copies("orders", lambda i: _shift(
        _shift(t["orders"], "o_orderkey", i * ok), "o_custkey", i * ck))
    copies("lineitem", lambda i: _shift(_shift(_shift(
        t["lineitem"], "l_orderkey", i * ok),
        "l_partkey", i * pk), "l_suppkey", i * sk))
    def events_copy(i):
        return _shift(
            _shift(t["events"], "event_id", i * ek), "user_id", i * uk
        )

    if hot_frac > 0.0:
        ev_parts = [events_copy(i) for i in range(factor)]
        ev = _inject_hot_user(pa.concat_tables(ev_parts), hot_frac)
        pq.write_table(ev, os.path.join(dst, "events.parquet"),
                       compression="snappy")
        print(f"events: {len(ev)} rows (hot_frac={hot_frac})")
    else:
        copies("events", events_copy)

    def docs_copy(i):
        import numpy as np

        d = _shift(t["documents"], "doc_id", i * dk)
        if i == 0:
            return d
        texts = d.column("text").to_pylist()
        ids = d.column("doc_id").to_pylist()
        # Two decorrelations compose here, because two different dedup
        # families see through one alone:
        #  * a seeded token SHUFFLE destroys shingle/n-gram overlap
        #    (MinHash, winnowing, CDC) but preserves the token
        #    MULTISET, which bag-of-words fingerprints (SimHash) hash
        #    identically — measured: every doc got `factor` identical-
        #    simhash twins and the candidate pair set grew as
        #    C(factor, 2) per family (4,950x per doc at 100x), a data
        #    artifact that pinned dedup_canonical_corpus to one
        #    straggler task at the 100x tier;
        #  * a per-copy CHARACTER ROTATION of each token (caesar over
        #    [a-z0-9], length-preserving so n_chars and token-count
        #    structure survive) relabels the copy's vocabulary, so
        #    multiset fingerprints decorrelate too — the realistic
        #    shape: a 100x corpus is new text, not 100 shuffles of the
        #    same 5k docs.
        lowers = "abcdefghijklmnopqrstuvwxyz"
        digits = "0123456789"
        r = i % 25 + 1
        rd = i % 9 + 1
        tbl = str.maketrans(
            lowers + lowers.upper() + digits,
            lowers[r:] + lowers[:r]
            + (lowers[r:] + lowers[:r]).upper()
            + digits[rd:] + digits[:rd],
        )
        out = []
        for did, text in zip(ids, texts):
            toks = text.translate(tbl).split()
            rng = np.random.RandomState(
                (i * 1_000_003 + did) % (2**32)
            )
            rng.shuffle(toks)
            out.append(" ".join(toks))
        text_arr = pa.array(out, pa.string())
        d = d.set_column(d.column_names.index("text"), "text", text_arr)
        n_chars = pc.utf8_length(text_arr).cast(
            d.schema.field("n_chars").type
        )
        return d.set_column(
            d.column_names.index("n_chars"), "n_chars", n_chars
        )

    copies("documents", docs_copy)

    def emb_copy(i):
        import numpy as np

        e = _shift(t["embeddings"], "vec_id", i * vk)
        if i == 0:
            return e
        col = e.column("embedding").combine_chunks()
        flat = col.values.to_numpy(zero_copy_only=False).copy()
        dim = len(col[0])
        # cyclic coordinate rotation: distances within a copy are
        # preserved exactly; copies are mutually decorrelated
        mat = np.roll(flat.reshape(-1, dim), i % dim, axis=1)
        new = pa.ListArray.from_arrays(
            col.offsets,
            pa.array(mat.reshape(-1).astype(np.float32), pa.float32()),
        )
        return e.set_column(
            e.column_names.index("embedding"), "embedding", new
        )

    copies("embeddings", emb_copy)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/levi_sf1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--hot-frac", type=float, default=0.0,
        help="reassign this fraction of event rows to ONE hot user_id "
             "(deliberate skew for the skew witness; 0 = uniform)",
    )
    a = ap.parse_args()
    scale(a.src, a.dst, a.factor, hot_frac=a.hot_frac)
