"""Block-max MaxScore kernel: exact top-k BM25 with pruning.

Public-literature algorithms: MaxScore (Turtle & Flood 1995) with the
block-max refinement of Block-Max WAND (Ding & Suel, SIGIR 2011) — see
PAPERS.md.  The reference relies on Lucene's internal scorers for this; we
implement the same pruning ideas numpy-vectorized (term-at-a-time, so the
inner loops are bulk array ops, not per-document Python).

Exactness argument (why pruning never changes the top-k):

* terms are processed in descending max-contribution order
  M_t = idf_t * max(block_max tf-norm);
* θ = current kth-largest accumulated score, a lower bound of the final
  kth-best score (accumulated scores only grow);
* a document first appearing in term t can finally score at most
  rem(t) = Σ M_t..end; if rem(t) < θ it can never enter the top-k, so
  postings for unseen docs are skipped (MaxScore);
* a seen document's posting in block b can be skipped when
  acc[doc] + idf_t·block_max[b] + rem(t+1) < θ — its final score is then
  provably below θ (block-max pruning).  Skipping understates only the
  scores of documents already provably outside the top-k, so every emitted
  (doc_id, score) is exact and rank-identical to exhaustive TAAT (asserted
  in tests/test_query.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from cascading_solr_spark.codec import bm25_tf_norm, decode_doc_ids, decode_varint


def _topk_theta(scores: np.ndarray, k: int) -> float:
    if len(scores) < k:
        return -np.inf
    return float(np.partition(scores, len(scores) - k)[len(scores) - k])


def maxscore_kernel(
    idf: dict[str, float],
    avgdl: float,
    k1: float,
    b: float,
    k: int,
    block_size: int = 128,
):
    """Build the per-shard applyInPandas scorer (same contract as TAAT)."""

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        # group posting segments (one per salt row) by term
        segs: dict[str, list] = {}
        for row in pdf.itertuples(index=False):
            segs.setdefault(row.term, []).append(row)
        # per-term max possible contribution
        terms = []
        for t, rows in segs.items():
            m = idf[t] * max(max(r.block_maxes) for r in rows)
            terms.append((m, t))
        terms.sort(key=lambda x: -x[0])
        maxes = np.array([m for m, _ in terms])
        # rem_incl[i] = sum of maxes from i to end
        rem_incl = np.cumsum(maxes[::-1])[::-1]

        acc_ids = np.empty(0, dtype=np.int64)
        acc = np.empty(0, dtype=np.float64)

        for i, (_, t) in enumerate(terms):
            theta = _topk_theta(acc, k)
            rem_after = float(rem_incl[i]) - float(maxes[i])
            ids_parts, contrib_parts = [], []
            for r in segs[t]:
                n = int(r.n_docs)
                ids = decode_doc_ids(r.doc_ids, n)
                tfs = decode_varint(r.tfs, n)
                dls = decode_varint(r.dls, n)
                contrib = idf[t] * bm25_tf_norm(tfs, dls, avgdl, k1, b)
                if theta > -np.inf and float(rem_incl[i]) < theta:
                    # non-essential term: only docs already accumulated matter
                    pos = np.searchsorted(acc_ids, ids)
                    pos_c = np.clip(pos, 0, len(acc_ids) - 1)
                    seen = (
                        (acc_ids[pos_c] == ids)
                        if len(acc_ids)
                        else np.zeros(len(ids), dtype=bool)
                    )
                    # block-max prune: acc + block_ub + rem_after < theta
                    bmax = np.asarray(r.block_maxes, dtype=np.float64)
                    block_ub = idf[t] * bmax[np.arange(n) // block_size]
                    cur = np.where(seen, acc[pos_c] if len(acc) else 0.0, 0.0)
                    keep = seen & (cur + block_ub + rem_after >= theta)
                    ids, contrib = ids[keep], contrib[keep]
                ids_parts.append(ids)
                contrib_parts.append(contrib)
            new_ids = np.concatenate(ids_parts) if ids_parts else np.empty(0, np.int64)
            new_contrib = (
                np.concatenate(contrib_parts) if contrib_parts else np.empty(0)
            )
            if not len(new_ids):
                continue
            # merge into accumulator
            merged = np.concatenate([acc_ids, new_ids])
            weights = np.concatenate([acc, new_contrib])
            uniq, inv = np.unique(merged, return_inverse=True)
            out = np.zeros(len(uniq), dtype=np.float64)
            np.add.at(out, inv, weights)
            acc_ids, acc = uniq, out

        if not len(acc_ids):
            return pd.DataFrame({"doc_id": [], "score": []}).astype(
                {"doc_id": "int64", "score": "float64"}
            )
        if len(acc_ids) > k:
            part = np.argpartition(-acc, k)[:k]
            acc_ids, acc = acc_ids[part], acc[part]
        order = np.lexsort((acc_ids, -acc))
        return pd.DataFrame({"doc_id": acc_ids[order], "score": acc[order]})

    return score
