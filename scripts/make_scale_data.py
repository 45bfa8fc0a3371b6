"""Generate a one-off sfN measurement dataset by replicating sf0.1 with
key remapping (r05 verdict item 5) — NOT committed testdata, a local
artifact for SCALE.md's empirical scaling table.

Usage: python scripts/make_scale_data.py [factor] [out_dir] [doc_mode]
       (defaults: 10 -> /tmp/sfscale/sf1, doc_mode=prefix)

Construction, per replica r in 0..factor-1 (r=0 is the original):
- every key domain gets offset r * (max_key + 1), applied consistently to
  primary AND foreign keys, so join fan-outs/selectivities are preserved
  exactly and the key space grows linearly;
- document text: see ``replicate_one`` — ``prefix`` (default) models the
  heavy-duplication regime (replicas are shingle-level near-copies of the
  base; df fractions preserved), ``interleave`` models a constant
  near-dup rate with per-shingle df DILUTION (the fractional-max-df
  adversary recorded in SCALE.md); n_chars is recomputed either way;
- embeddings get a per-replica deterministic sign-flip pattern on ~half
  the dims (r>0): cross-replica cosine ~ 0 (distinct vectors) while all
  within-replica pairwise angles are exactly preserved — an
  ε-perturbation would leave replicas cosine≈1 and grow ANN/near-dup
  cluster sizes with the scale factor;
- region/nation are fixed-size dims and are copied as-is;
- timestamps are left unchanged: time ranges stay fixed while per-bucket
  volume grows, which is how event volume actually scales;
- replicated tables are written as one file per replica (directory), so
  scans parallelize the way pre-split 100 TB inputs do.

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


def replicate_one(
    table: str, r: int, offs: dict[str, int], doc_mode: str = "prefix"
) -> pa.Table:
    """Replica ``r`` of ``table`` (r=0 is the original).

    ``doc_mode`` picks how replica document TEXT relates to the base —
    both are useful, for different scale questions:

    - ``prefix`` (default, the main SCALE.md table): replica text is the
      base text with a per-replica prefix token. Replicas share almost all
      shingles with the base doc, so the sf1 corpus models the
      HEAVY-DUPLICATION regime (every doc has ``factor`` shingle-level
      near-copies; cluster size grows with SF — think CommonCrawl mirror
      floods). Shingle document frequencies keep their sf0.1 FRACTIONS, so
      df-based stop-shingle caps behave as designed.
    - ``interleave``: a replica token is spliced between every pair of
      tokens, so every shingle carries the replica id — cross-replica
      Jaccard ~ 0 and near-dup pair volume scales LINEARLY (constant
      near-dup rate). The trade: each base shingle's document COUNT stays
      flat while the corpus grows, so its df FRACTION dilutes by 1/factor
      — an adversarial input for fractional max-df caps (SCALE.md
      "measured adversary" note records the resulting inverted-index
      blowup). Use this mode to reproduce that experiment.
    """
    t = pq.read_table(os.path.join(SRC, f"{table}.parquet"))
    for col, dom in KEYED[table].items():
        idx = t.schema.get_field_index(col)
        shifted = pc.add(t[col], pa.scalar(r * offs[dom], type=t[col].type))
        t = t.set_column(idx, t.field(idx), shifted.cast(t[col].type))
    if table == "documents":
        if r > 0:
            idx = t.schema.get_field_index("text")
            base = t["text"].combine_chunks()
            if doc_mode == "interleave":
                txt = pc.replace_substring(
                    base, pattern=" ", replacement=f" r{r} "
                )
            else:
                txt = pc.binary_join_element_wise(
                    pa.scalar(f"v{r}"), base, " "
                )
            t = t.set_column(idx, t.field(idx), txt)
        nidx = t.schema.get_field_index("n_chars")
        t = t.set_column(
            nidx, t.field(nidx), pc.utf8_length(t["text"]).cast(pa.int64())
        )
    if table == "embeddings" and r > 0:
        # Per-replica deterministic sign-flip pattern: flipping ~half the
        # dims sends cross-replica cosine to ~0 (distinct vectors), while
        # within-replica geometry (all pairwise angles) is EXACTLY
        # preserved — an ε-perturbation would keep replicas cosine≈1 and
        # grow ANN/near-dup cluster sizes with the scale factor.
        idx = t.schema.get_field_index("embedding")
        col = t["embedding"].combine_chunks()
        vals = col.values.to_numpy(zero_copy_only=False).copy()
        dim = len(col[0])
        signs = np.where(
            np.random.default_rng(r).random(dim) < 0.5, -1.0, 1.0
        ).astype(np.float32)
        vals = (vals.reshape(-1, dim) * signs).reshape(-1)
        newcol = pa.ListArray.from_arrays(
            col.offsets, pa.array(vals, type=pa.float32())
        )
        t = t.set_column(idx, t.field(idx), newcol.cast(t[idx].type))
    return t


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfscale/sf1"
    doc_mode = sys.argv[3] if len(sys.argv) > 3 else "prefix"
    if doc_mode not in ("prefix", "interleave"):
        raise SystemExit(f"doc_mode must be prefix|interleave, got {doc_mode}")
    os.makedirs(out, exist_ok=True)
    offs = domain_offsets()
    print("key-domain offsets:", offs)
    for table in COPY:
        t = pq.read_table(os.path.join(SRC, f"{table}.parquet"))
        pq.write_table(t, os.path.join(out, f"{table}.parquet"))
        print(f"{table}: copied ({t.num_rows} rows)")
    # Replicated tables are written as a DIRECTORY of one file per replica:
    # at 100 TB inputs arrive pre-split across many files, and a single
    # concatenated file under maxPartitionBytes would serialize the whole
    # scan onto one task — a measurement artifact, not a plan property.
    for table in KEYED:
        d = os.path.join(out, f"{table}.parquet")
        os.makedirs(d, exist_ok=True)
        n = 0
        for r in range(factor):
            t = replicate_one(table, r, offs, doc_mode)
            pq.write_table(t, os.path.join(d, f"part-{r:03d}.parquet"))
            n += t.num_rows
        print(f"{table}: {n} rows in {factor} files")
    print(f"wrote {out} (factor {factor}, doc_mode {doc_mode})")


if __name__ == "__main__":
    main()
