"""10x-scale probe dataset builder (guide §1: optimizations must hold past
the tuning scale). Replicates an sf dir 10x with shifted keys so that every
per-copy structure (planted duplicates, conversation streams, join
relationships) is preserved while totals grow linearly:

- events: event_id/lsn and user_id/conv shifted per copy — 10x change
  stream, 10x conversations, same per-conversation shape.
- documents: doc_id shifted; copies > 0 get a per-copy text suffix so the
  sf-planted duplicate groups replicate per copy instead of collapsing into
  10x-deep cross-copy groups (pair counts scale linearly, like a real 10x
  corpus).
- embeddings: vec_id shifted; copies > 0 rotated by a seeded orthogonal
  matrix — within-copy cosines are EXACTLY the originals, cross-copy
  cosines are essentially random, so the near-dup/cluster structure
  replicates per copy.
- orders/lineitem/customer: keys shifted consistently per copy so joins
  stay within-copy; dimensions (region/nation/part/supplier) are copied
  as-is.

Usage: python bench_scale10.py [--src SF_DIR] [--out DIR] [--copies N]
Then:  SPARK_GRAFT_SF_DIR=<out> python bench_extra.py <queries...>

Never used for official numbers — the frozen bench.py at the driver's sf is
the record; this exists to check that plan shapes and wall-clock scale
sanely (results on a replicated corpus are not oracle-comparable).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

KEY_OFF = 10_000_000  # per-copy key offset: clears every planted +10M/+20M
                      # id shift the catalog queries use (they stay inside a
                      # copy's own id space scaled by copy index)


def _rot(dim: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    q, r = np.linalg.qr(rng.standard_normal((dim, dim)))
    return (q * np.sign(np.diag(r))).astype(np.float64)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/scratch/sf10x")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    C = args.copies

    def read(name: str) -> pa.Table:
        return pq.read_table(f"{args.src}/{name}.parquet")

    def write(name: str, tbl: pa.Table) -> None:
        pq.write_table(tbl, f"{args.out}/{name}.parquet")
        print(f"{name}: {tbl.num_rows} rows")

    def shifted(tbl: pa.Table, int_cols: dict[str, int]) -> pa.Table:
        outs = []
        for k in range(C):
            cols = []
            for name in tbl.column_names:
                col = tbl.column(name)
                if name in int_cols and k > 0:
                    col = pa.chunked_array(
                        [pa.compute.add(c, int_cols[name] * k) for c in col.chunks]
                    )
                cols.append(col)
            outs.append(pa.table(cols, names=tbl.column_names))
        return pa.concat_tables(outs)

    # --- events: 10x change stream, per-copy conversations -----------------
    write("events", shifted(read("events"),
                            {"event_id": KEY_OFF, "user_id": 1_000_000}))

    # --- documents: per-copy text salt keeps dup structure per copy --------
    d = read("documents")
    outs = []
    for k in range(C):
        doc_id = d.column("doc_id")
        text = d.column("text")
        if k > 0:
            doc_id = pa.chunked_array(
                [pa.compute.add(c, KEY_OFF * k) for c in doc_id.chunks]
            )
            text = pa.chunked_array([
                pa.compute.binary_join_element_wise(c, f" copysalt{k}", "")
                for c in text.chunks
            ])
        n_chars = pa.chunked_array(
            [pa.compute.utf8_length(c).cast(pa.int64()) for c in text.chunks]
        )
        outs.append(pa.table(
            [doc_id, text, d.column("lang"), d.column("source"), n_chars],
            names=["doc_id", "text", "lang", "source", "n_chars"],
        ))
    write("documents", pa.concat_tables(outs))

    # --- embeddings: per-copy orthogonal rotation --------------------------
    e = read("embeddings")
    vecs = np.asarray(e.column("embedding").to_pylist(), dtype=np.float64)
    dim = vecs.shape[1]
    outs = []
    for k in range(C):
        vid = e.column("vec_id")
        v = vecs if k == 0 else vecs @ _rot(dim, 1000 + k)
        if k > 0:
            vid = pa.chunked_array(
                [pa.compute.add(c, KEY_OFF * k) for c in vid.chunks]
            )
        outs.append(pa.table(
            [vid, pa.array(list(v.astype(np.float32))), e.column("label")],
            names=["vec_id", "embedding", "label"],
        ))
    write("embeddings", pa.concat_tables(outs))

    # --- star schema: within-copy joins ------------------------------------
    write("customer", shifted(read("customer"), {"c_custkey": KEY_OFF}))
    write("orders", shifted(read("orders"),
                            {"o_orderkey": KEY_OFF, "o_custkey": KEY_OFF}))
    write("lineitem", shifted(read("lineitem"), {"l_orderkey": KEY_OFF}))
    for name in ("region", "nation", "part", "supplier"):
        write(name, read(name))


if __name__ == "__main__":
    main()
