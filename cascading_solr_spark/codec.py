"""Posting-list codec: delta + varint compression, block-max metadata.

The reference gets compact postings for free from Lucene's index format
(delta-encoded, vint-compressed posting lists — public Lucene 4.x file-format
behavior targeted by the embedded Solr in core/SolrWriter.java).  We
re-implement the same two classic ideas directly, numpy-vectorized:

* doc ids sorted ascending, stored as first-value + gaps, each LEB128 varint
  (Lucene "VInt"); term frequencies and doc lengths varint alongside.
* per-block (``block_size`` postings) maximum of the BM25 tf-norm component,
  enabling Block-Max WAND pruning at query time (Ding & Suel, SIGIR 2011 —
  public literature; see PAPERS.md).

Storing ``tf`` and ``dl`` raw (not a quantized precomputed score) keeps query
scores exact float64 — required for rank-identity against the oracle.

All encode/decode paths are numpy bulk ops: the per-value Python loop is
replaced by a loop over the ≤10 varint byte positions.
"""

from __future__ import annotations

import numpy as np

_SEVEN = np.uint64(7)
_LOW7 = np.uint64(0x7F)

#: reserved postings term carrying delete tombstones (the Lucene liveDocs
#: bitmap analogue): analyzed tokens are maximal alnum runs (no underscore)
#: and keyword terms are always ``field:value`` namespaced, so this string
#: can never collide with a real term.  Tombstone rows ride the normal
#: postings layout (doc_ids = the deleted ids, tf/dl payloads unused) and
#: are folded away at compaction.
DELETED_TERM = "__deleted__"


def encode_varint_counts(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode a uint64 array; also return the per-value byte counts
    (lets callers split one global encode into per-group slices)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.zeros(0, dtype=np.int64)
    # bytes needed per value: 1 + floor(bit_length-1 / 7)
    nb = np.ones(v.shape, dtype=np.int64)
    x = v >> _SEVEN
    while x.any():
        nb += x > 0
        x >>= _SEVEN
    ends = np.cumsum(nb)
    starts = ends - nb
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    cur = v.copy()
    for g in range(int(nb.max())):
        mask = nb > g
        byte = (cur[mask] & _LOW7).astype(np.uint8)
        more = (nb[mask] - 1 > g).astype(np.uint8)
        out[starts[mask] + g] = byte | (more << 7)
        cur >>= _SEVEN
    return out.tobytes(), nb


def encode_varint(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array (vectorized over byte positions)."""
    return encode_varint_counts(values)[0]


def decode_varint(buf: bytes, n: int | None = None) -> np.ndarray:
    """Decode LEB128 bytes back to a uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.flatnonzero((b & 0x80) == 0)
    starts = np.concatenate(([0], ends[:-1] + 1))
    nb = ends - starts + 1
    vals = np.zeros(len(ends), dtype=np.uint64)
    for g in range(int(nb.max())):
        mask = nb > g
        vals[mask] |= (b[starts[mask] + g] & _LOW7).astype(np.uint64) << np.uint64(
            7 * g
        )
    if n is not None and len(vals) != n:
        raise ValueError(f"decoded {len(vals)} varints, expected {n}")
    return vals


def encode_doc_ids(doc_ids: np.ndarray, block_size: int | None = None) -> bytes:
    """Delta+varint encode a strictly-increasing int64 doc-id array.

    With ``block_size``, the delta chain RESTARTS (absolute value) at every
    block boundary — the property that lets the query kernel decode only the
    blocks that survive block-max pruning, without touching earlier blocks.
    """
    ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    if ids.size == 0:
        return b""
    deltas = np.empty_like(ids)
    deltas[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=deltas[1:])
    if ids.size > 1 and deltas[1:].min() <= 0:
        raise ValueError("doc_ids must be strictly increasing")
    if block_size is not None:
        starts = np.arange(0, ids.size, block_size)
        deltas[starts] = ids[starts]
    return encode_varint(deltas.astype(np.uint64))


def restart_cumsum(deltas: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Cumulative sum with restarts: values at ``starts`` are absolute, the
    rest are gaps.  Vectorized (one cumsum + one repeat)."""
    c = np.cumsum(deltas)
    sizes = np.diff(np.append(starts, len(deltas)))
    adj = np.repeat(c[starts] - deltas[starts], sizes)
    return c - adj


def decode_doc_ids(buf: bytes, n: int | None = None,
                   block_size: int | None = None) -> np.ndarray:
    """Inverse of :func:`encode_doc_ids` -> int64 array."""
    deltas = decode_varint(buf, n).astype(np.int64)
    if block_size is None:
        return np.cumsum(deltas)
    return restart_cumsum(deltas, np.arange(0, len(deltas), block_size))


def block_value_counts(n_values: int, n_blocks: int, block_size: int) -> np.ndarray:
    """Values per block: block_size everywhere, remainder in the last block."""
    counts = np.full(n_blocks, block_size, dtype=np.int64)
    if n_blocks:
        counts[-1] = n_values - (n_blocks - 1) * block_size
    return counts


def decode_selected_blocks(
    buf: bytes,
    boffs: np.ndarray,
    n_values: int,
    block_size: int,
    keep: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode ONLY the blocks flagged in ``keep`` (bool mask over blocks).

    ``boffs`` holds the per-block byte start offsets within ``buf`` (written
    by the build assembler).  Returns ``(values, kept_block_indices)`` where
    values concatenates the kept blocks in order.  This is the point of the
    block layout: pruned blocks are never varint-decoded.
    """
    boffs = np.asarray(boffs, dtype=np.int64)
    n_blocks = len(boffs)
    kept = np.flatnonzero(np.asarray(keep, dtype=bool))
    if not len(kept):
        return np.empty(0, dtype=np.uint64), kept
    ends = np.append(boffs[1:], len(buf))
    parts = b"".join(buf[boffs[j]: ends[j]] for j in kept)
    counts = block_value_counts(n_values, n_blocks, block_size)[kept]
    vals = decode_varint(parts, int(counts.sum()))
    return vals, kept


def encode_position_payload(
    pos_flat: np.ndarray, counts: np.ndarray
) -> tuple[bytes, np.ndarray]:
    """Delta+varint encode a FLAT positions array holding ``len(counts)``
    concatenated per-posting segments (segment i has ``counts[i]`` ascending
    term positions).  The delta chain restarts (absolute value) at every
    segment start, so each posting's byte slice is self-contained — the
    property that lets the phrase kernel decode positions for exactly the
    postings it needs, and lets compaction re-slice blobs without a value
    decode (:func:`split_varint_payload`).

    Returns ``(buffer, per_segment_byte_counts)`` — ONE vectorized encode
    for the whole batch; callers slice per-segment blobs from the counts
    (same global-encode-then-slice strategy as the postings assembler).

    Mirrors Lucene's .prx/.pos proximity encoding (delta-coded VInt position
    lists per posting — public Lucene 4.x file-format behavior the reference
    inherits through embedded Solr)."""
    pos = np.ascontiguousarray(pos_flat, dtype=np.int64)
    counts = np.asarray(counts, dtype=np.int64)
    if pos.size == 0:
        return b"", np.zeros(len(counts), dtype=np.int64)
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    deltas = np.empty_like(pos)
    deltas[0] = pos[0]
    np.subtract(pos[1:], pos[:-1], out=deltas[1:])
    deltas[starts] = pos[starts]
    buf, nb = encode_varint_counts(deltas.astype(np.uint64))
    if len(counts):
        seg_nb = np.add.reduceat(nb, np.minimum(starts, len(nb) - 1))
        seg_nb = np.where(counts == 0, 0, seg_nb)  # reduceat quirk: empty segs
    else:
        seg_nb = nb[:0]
    return buf, seg_nb.astype(np.int64)


def decode_positions(buf: bytes, counts: np.ndarray) -> np.ndarray:
    """Inverse of :func:`encode_position_payload` -> flat int64 positions.

    ``counts`` gives the per-segment value counts (= the postings' term
    frequencies); the delta chain restarts at each segment start."""
    counts = np.asarray(counts, dtype=np.int64)
    n = int(counts.sum())
    deltas = decode_varint(buf, n).astype(np.int64)
    if n == 0:
        return deltas
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    starts = starts[counts > 0]
    return restart_cumsum(deltas, starts)


def split_varint_payload(buf: bytes, counts: np.ndarray) -> list[bytes]:
    """Split a varint buffer into per-segment byte slices WITHOUT decoding
    values: varint boundaries are self-describing (continuation bit), so a
    single bitmask scan finds every value end.  Used by compaction to carry
    per-posting position blobs through the decode->reshuffle->assemble
    round-trip untouched (each blob's delta chain is self-contained)."""
    counts = np.asarray(counts, dtype=np.int64)
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return [b""] * len(counts)
    ends = np.flatnonzero((b & 0x80) == 0) + 1  # one past each value's last byte
    cum = np.cumsum(counts)
    if int(cum[-1]) != len(ends):
        raise ValueError(f"payload holds {len(ends)} varints, expected {cum[-1]}")
    seg_ends = np.where(counts > 0, ends[np.maximum(cum - 1, 0)], 0)
    # empty segments inherit the previous segment's end (zero-length slice)
    seg_ends = np.maximum.accumulate(seg_ends)
    seg_starts = np.concatenate(([0], seg_ends[:-1]))
    mv = memoryview(buf)
    return [bytes(mv[s:e]) for s, e in zip(seg_starts, seg_ends)]


def bm25_tf_norm(
    tfs: np.ndarray, dls: np.ndarray, avgdl: float, k1: float, b: float
) -> np.ndarray:
    """BM25 term-frequency normalization (float64, the exact scoring kernel).

    tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) — per BASELINE.json north_star
    (k1=1.2, b=0.75, Lucene's modern default similarity).
    """
    tf = tfs.astype(np.float64)
    dl = dls.astype(np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def bm25_idf(df: int, n_docs: int) -> float:
    """ln(1 + (N - df + 0.5)/(df + 0.5)) — Lucene/BM25+ style, never negative."""
    return float(np.log1p((n_docs - df + 0.5) / (df + 0.5)))


def block_maxes(
    tfs: np.ndarray,
    dls: np.ndarray,
    avgdl: float,
    k1: float,
    b: float,
    block_size: int,
) -> np.ndarray:
    """Per-block max of tf_norm (float64 -> float32 storage is NOT used:
    block maxes are upper bounds for pruning only, so float32 rounding up
    would be needed; we keep float64 and the bound stays exact)."""
    norms = bm25_tf_norm(tfs, dls, avgdl, k1, b)
    n = norms.size
    n_blocks = (n + block_size - 1) // block_size
    pad = n_blocks * block_size - n
    if pad:
        norms = np.concatenate([norms, np.full(pad, -np.inf)])
    return norms.reshape(n_blocks, block_size).max(axis=1)
