"""Generate a one-off sfN measurement dataset by replicating sf0.1 with
key remapping (r05 verdict item 5) — NOT committed testdata, a local
artifact for SCALE.md's empirical scaling table.

Usage: python scripts/make_scale_data.py [factor] [out_dir]
       (defaults: 10 -> /tmp/sfscale/sf1)

Construction, per replica r in 0..factor-1 (r=0 is the original):
- every key domain gets offset r * (max_key + 1), applied consistently to
  primary AND foreign keys, so join fan-outs/selectivities are preserved
  exactly and the key space grows linearly;
- document text is prefixed with a per-replica token (r>0), so replicas
  are NOT near-duplicates of each other and the near-dup pair count
  scales linearly (exact copies would grow LSH bucket pairs
  quadratically — a different, pathological corpus); n_chars is
  recomputed to stay consistent;
- embeddings get a deterministic direction perturbation on element 0
  (r>0) for the same reason (pure scaling would be cosine-invariant);
- region/nation are fixed-size dims and are copied as-is;
- timestamps are left unchanged: time ranges stay fixed while per-bucket
  volume grows, which is how event volume actually scales.

Schemas are preserved exactly (pyarrow read -> mutate -> write).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# table -> {column: key_domain}
KEYED = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "eventid", "user_id": "userid"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
}
COPY = ["region", "nation"]


def domain_offsets() -> dict[str, int]:
    offs: dict[str, int] = {}
    for table, cols in KEYED.items():
        t = pq.read_table(os.path.join(SRC, f"{table}.parquet"))
        for col, dom in cols.items():
            m = pc.max(t[col]).as_py() or 0
            offs[dom] = max(offs.get(dom, 0), int(m) + 1)
    return offs


def replicate(table: str, factor: int, offs: dict[str, int]) -> pa.Table:
    base = pq.read_table(os.path.join(SRC, f"{table}.parquet"))
    parts = []
    for r in range(factor):
        t = base
        for col, dom in KEYED[table].items():
            idx = t.schema.get_field_index(col)
            shifted = pc.add(t[col], pa.scalar(r * offs[dom], type=t[col].type))
            t = t.set_column(idx, t.field(idx), shifted.cast(t[col].type))
        if table == "documents" and r > 0:
            idx = t.schema.get_field_index("text")
            txt = pc.binary_join_element_wise(
                pa.scalar(f"v{r}"), t["text"].combine_chunks(), " "
            )
            t = t.set_column(idx, t.field(idx), txt)
            nidx = t.schema.get_field_index("n_chars")
            t = t.set_column(
                nidx, t.field(nidx), pc.utf8_length(t["text"]).cast(pa.int64())
            )
        elif table == "documents":
            nidx = t.schema.get_field_index("n_chars")
            t = t.set_column(
                nidx, t.field(nidx), pc.utf8_length(t["text"]).cast(pa.int64())
            )
        if table == "embeddings" and r > 0:
            idx = t.schema.get_field_index("embedding")
            col = t["embedding"].combine_chunks()
            vals = col.values.to_numpy(zero_copy_only=False).copy()
            dim = len(col[0])
            vals[::dim] += np.float32(0.003 * r)  # element 0 of every vector
            newcol = pa.ListArray.from_arrays(
                col.offsets, pa.array(vals, type=pa.float32())
            )
            t = t.set_column(idx, t.field(idx), newcol.cast(t[idx].type))
        parts.append(t)
    return pa.concat_tables(parts)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfscale/sf1"
    os.makedirs(out, exist_ok=True)
    offs = domain_offsets()
    print("key-domain offsets:", offs)
    for table in COPY:
        t = pq.read_table(os.path.join(SRC, f"{table}.parquet"))
        pq.write_table(t, os.path.join(out, f"{table}.parquet"))
        print(f"{table}: copied ({t.num_rows} rows)")
    for table in KEYED:
        t = replicate(table, factor, offs)
        pq.write_table(t, os.path.join(out, f"{table}.parquet"))
        print(f"{table}: {t.num_rows} rows")
    print(f"wrote {out} (factor {factor})")


if __name__ == "__main__":
    main()
