#!/usr/bin/env python3
"""Deterministically scale the driver's sf0.1 fixture to sf1 (10x).

The environment has no network (DuckDB's tpch extension cannot
download), so sf1 is built by replicating sf0.1 ten times with key
re-offsetting — the same shape a dbgen scale-up produces: dimension
cardinalities grow 10x, fact tables grow 10x, and join fan-outs stay
constant because every replica's foreign keys point at its own replica
of the dimension (offsets are applied consistently on both sides).

Content perturbation (replicas i>0):
- documents.text: per-doc deterministic word shuffle (seeded by
  (doc_id, i)) — keeps length/vocabulary statistics but breaks shingle
  overlap, so MinHash/SimHash workloads scale the way real new data
  does instead of exploding into 10-member exact-duplicate clusters
  (which would make candidate-pair counts quadratic by construction,
  not by plan).
- embeddings.embedding: per-replica deterministic component
  permutation — norms preserved, cosine structure varies per replica,
  so brute-force/IVF top-k don't degenerate into 10-way ties.
- events keep their timestamps: sf1 is the same time range at 10x
  density, which is what a 10x-busier stream looks like.

Usage: python tools/make_sf1.py [--src /root/testdata/sf0.1] [--dst testdata_sf1]
The output directory is gitignored (about 170 MB).
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPLICAS = 10

# key-offset units: clean round numbers comfortably above each key's
# sf0.1 max, so replica key ranges never collide
OFF = {
    "custkey": 10_000_000,
    "suppkey": 1_000_000,
    "partkey": 10_000_000,
    "orderkey": 100_000_000,
    "event_id": 10_000_000,
    "user_id": 10_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}

# per-table: column -> offset unit
SHIFTS = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}

COPY_ONLY = {"region", "nation"}


def _shift(tbl: pa.Table, shifts: dict[str, str], i: int) -> pa.Table:
    for col, unit in shifts.items():
        idx = tbl.schema.get_field_index(col)
        shifted = pc.add(tbl.column(col), i * OFF[unit]).cast(tbl.schema.field(col).type)
        tbl = tbl.set_column(idx, tbl.schema.field(col), shifted)
    return tbl


def _shuffle_documents(tbl: pa.Table, i: int) -> pa.Table:
    texts = tbl.column("text").to_pylist()
    ids = tbl.column("doc_id").to_pylist()
    out = []
    for doc_id, text in zip(ids, texts):
        words = text.split()
        rng = np.random.RandomState((int(doc_id) * 1_000_003 + i * 7919) % (2**31 - 1))
        rng.shuffle(words)
        out.append(" ".join(words))
    idx = tbl.schema.get_field_index("text")
    tbl = tbl.set_column(idx, tbl.schema.field("text"), pa.array(out, type=pa.string()))
    nidx = tbl.schema.get_field_index("n_chars")
    tbl = tbl.set_column(
        nidx,
        tbl.schema.field("n_chars"),
        pa.array([len(t) for t in out], type=tbl.schema.field("n_chars").type),
    )
    return tbl


def _permute_embeddings(tbl: pa.Table, i: int) -> pa.Table:
    col = tbl.column("embedding").combine_chunks()
    arrs = col.to_pylist()
    dim = len(arrs[0]) if arrs else 0
    perm = np.random.RandomState(1234 + i).permutation(dim)
    value_type = tbl.schema.field("embedding").type.value_type
    permuted = pa.array(
        [[v[p] for p in perm] if v is not None else None for v in arrs],
        type=pa.list_(value_type),
    )
    idx = tbl.schema.get_field_index("embedding")
    return tbl.set_column(idx, tbl.schema.field("embedding"), permuted)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=os.path.join(os.path.dirname(__file__), "..", "testdata_sf1"))
    ap.add_argument(
        "--replicas",
        type=int,
        default=REPLICAS,
        help="10 = sf1 from sf0.1; 30 = the sf3 stress fixture",
    )
    args = ap.parse_args()
    replicas = args.replicas
    dst = os.path.abspath(args.dst)
    os.makedirs(dst, exist_ok=True)
    for name in sorted(os.listdir(args.src)):
        if not name.endswith(".parquet"):
            continue
        table_name = name[: -len(".parquet")]
        src_tbl = pq.read_table(os.path.join(args.src, name))
        out_path = os.path.join(dst, name)
        if table_name in COPY_ONLY:
            pq.write_table(src_tbl, out_path)
            print(f"{table_name}: copied ({src_tbl.num_rows} rows)")
            continue
        parts = []
        for i in range(replicas):
            t = src_tbl
            if i > 0:
                t = _shift(t, SHIFTS.get(table_name, {}), i)
                if table_name == "documents":
                    t = _shuffle_documents(t, i)
                elif table_name == "embeddings":
                    t = _permute_embeddings(t, i)
            parts.append(t)
        big = pa.concat_tables(parts)
        pq.write_table(big, out_path, row_group_size=256 * 1024)
        print(f"{table_name}: {src_tbl.num_rows} -> {big.num_rows} rows")
    print(f"sf1 fixture written to {dst}")


if __name__ == "__main__":
    main()
