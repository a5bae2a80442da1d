"""End-to-end training-corpus preparation — the flagship composition of
the engine's training-data operators:

    documents → quality gate → exact dedup → MinHash-LSH near-dup
    removal → feature-hash embedding

Each stage is the already-tested operator; this module only wires them
(filters are broadcast semi-joins on id sets, never driver-side row
loops) and reports per-stage survivor counts — the lineage a data-prep
run needs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..stages.join import semi_join_filter
from ..stages.text import embed_text, quality_score
from .dedup import exact_dedup, minhash_lsh_pairs


def _collect_ids(ds, col) -> np.ndarray:
    out = []
    for b in ds.select_columns([col]).iter_batches(
            batch_format="pyarrow", batch_size=1 << 20):
        out.append(b[col].to_numpy(zero_copy_only=False))
    return (np.sort(np.unique(np.concatenate(out))) if out
            else np.array([], dtype=np.int64))


def prepare_corpus(docs_ds, id_col="doc_id", text_col="text",
                   min_words=20, min_quality=0.2, neardup_threshold=0.7,
                   embed_dim=64):
    """Returns ``(clean_ds, stats)``: the surviving documents with an
    ``embedding`` column, and per-stage survivor counts.

    Near-dup policy: for every verified pair (ia < ib) the larger id is
    dropped (keep-first) — greedy but deterministic; transitive clusters
    collapse to their smallest id across LSH rounds.
    """
    stats = {"input": docs_ds.count()}

    # 1. quality gate (vectorized score columns + filter)
    scored = quality_score(docs_ds)

    def gate(batch: pa.Table) -> pa.Table:
        ok = ((batch["q_words"].to_numpy(zero_copy_only=False)
               >= min_words) &
              (batch["quality_score"].to_numpy(zero_copy_only=False)
               >= min_quality))
        return batch.filter(pa.array(ok)).select(
            [c for c in batch.column_names if not c.startswith("q_")
             and c != "quality_score"])

    gated = scored.map_batches(gate, batch_format="pyarrow").materialize()
    stats["after_quality"] = gated.count()

    # 2. exact dedup → keep-set semi join
    kept = exact_dedup(gated, key_col=text_col, id_col=id_col)
    keep_ids = _collect_ids(kept, "keep_id")
    gated = semi_join_filter(gated, (id_col,), ray.put(keep_ids))
    gated = gated.materialize()
    stats["after_exact_dedup"] = gated.count()

    # 3. near-dup removal: drop the larger id of every verified pair
    pairs = minhash_lsh_pairs(gated, threshold=neardup_threshold,
                              text_col=text_col, id_col=id_col)
    drop_ids = _collect_ids(pairs, "ib")
    clean = semi_join_filter(gated, (id_col,), ray.put(drop_ids),
                             anti=True).materialize()
    stats["after_neardup"] = clean.count()

    # 4. embeddings for downstream ANN / clustering
    final = embed_text(clean, dim=embed_dim)
    return final, stats
