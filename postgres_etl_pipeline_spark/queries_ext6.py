"""Extension catalog, batch 6 (round 8): sub-linear candidate paths for
the last miner family (asymmetric containment via prefix filtering), the
IVF-PQ composition (coarse partition pruning over the product-quantized
ADC scan — the production big-ANN shape), and the streaming near-dup
admission drain.

Same registry/oracle conventions as queries_ext.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries import register, spread, t
from .queries_ext5 import _containment_oracle

# ---------------------------------------------------------------------------
# Containment mining, prefix-filtered — the sub-linear twin of
# containment_dups (verdict r07 item 2)
# ---------------------------------------------------------------------------


@register(
    "containment_prefix_dups",
    _containment_oracle(0.6),
    survey="§7 Phase 5 extension: asymmetric containment pairs via "
    "PREFIX FILTERING (A-prefix × B-full join, size + positional "
    "prunes, recall 1 by theorem) — the sub-linear candidate path for "
    "the containment miner; same oracle as containment_dups, so a "
    "hash-green row IS the recall-1 proof against the exact join",
    tags=("ext", "dedup"),
)
def containment_prefix_dups(spark, sf_dir):
    """Same measure, threshold, and stop-cap config as
    ``containment_dups`` (C(A→B) ≥ 0.6 over documents, both
    orientations) — only the candidate plan differs: A-side canonical
    prefixes joined against the full index instead of the full
    inverted-index self-join. The shared oracle pins bit-identical
    output, i.e. recall 1 vs the exact path."""
    from .operators import dedup as D

    docs = spread(t(spark, sf_dir, "documents"))
    return D.containment_prefix_pairs(
        docs, threshold=0.6, stop_max_df_frac=0.2, stop_min_df=64
    )
