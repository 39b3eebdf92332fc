"""Packed posting store: per-term bit-plane compression wired into search.

Behavioral model: the reference keeps doclists VByte-compressed on disk
(CSphReader::UnzipInt, doc/internals-index-format.txt:24-63) and decodes
on read; its columnar library uses FastPFOR. Here the same economics move
into HBM: posting rowids (delta-coded), term frequencies, and field masks
of every term with df >= PACK_MIN are packed into 128-entry bit-plane
blocks grouped by power-of-2 width class, so the search kernel's per-slot
"read postings" step becomes a contiguous dynamic_slice of [nb, 4c] u32
words plus an in-register decode (shifts + select + cumsum) — 4-8x less
HBM traffic than raw i32 for the mid/low-width classes that dominate.

Width class is per TERM (max in-block delta width), so each term's block
run is a contiguous rectangle in its class array and one dynamic_slice
fetches it. Short-tail terms (df < PACK_MIN) stay in a raw residual
array — they are numerous but hold a small fraction of postings mass.

Decode parity: tf is packed exactly (class covers the true max), and
tfq = tf/(tf+1.2) is recomputed in f32 on device — identical rounding to
the builder's numpy f32 division on CPU backends.
"""
from __future__ import annotations

from dataclasses import dataclass, field as dc_field

import numpy as np

BLOCK = 128
PLANE_WORDS = 4            # 128 bits per plane
CLASSES = (4, 8, 16, 32)
PACK_MIN = 128             # min df to pack (else residual raw postings)
_CHUNK = 8192              # blocks per packing chunk (bounds temp memory)


def _class_of(width: np.ndarray) -> np.ndarray:
    """Bit width -> class id (index into CLASSES)."""
    c = np.zeros(len(width), np.int8)
    for i, cc in enumerate(CLASSES):
        c[width > (CLASSES[i - 1] if i else 0)] = i
    return c


def _pack_planes(vals: np.ndarray, c: int) -> np.ndarray:
    """[NB, 128] uint32 values (< 2^c) -> [NB, 4c] u32 bit-plane words."""
    out = np.empty((len(vals), PLANE_WORDS * c), np.uint32)
    sh = np.arange(32, dtype=np.uint32)
    for lo in range(0, len(vals), _CHUNK):
        v = vals[lo:lo + _CHUNK]
        bits = ((v[:, None, :] >> np.arange(c, dtype=np.uint32)[None, :,
                                            None]) & 1).astype(np.uint32)
        w = (bits.reshape(len(v), c, PLANE_WORDS, 32)
             << sh[None, None, None, :]).sum(axis=3, dtype=np.uint32)
        out[lo:lo + _CHUNK] = w.reshape(len(v), PLANE_WORDS * c)
    return out


@dataclass
class PackedStore:
    """Host-side packed streams + per-term metadata (uploaded by
    ops/device_index.upload; consumed by the planner + search kernel)."""

    # per-term: class id+1 per stream (0 = unpacked), start block row
    term_class: np.ndarray          # i8[T, 3]   (rw, tf, fm)
    term_start: np.ndarray          # i32[T, 3]  block row in class array
    # class streams: kind -> class width -> arrays
    rw_words: dict = dc_field(default_factory=dict)   # c -> u32[NB, 4c]
    rw_base: dict = dc_field(default_factory=dict)    # c -> i32[NB]
    tf_words: dict = dc_field(default_factory=dict)
    fm_words: dict = dc_field(default_factory=dict)
    # residual raw postings (unpacked short-tail terms)
    res_offsets: np.ndarray = None  # i32[T+1] (0-width for packed terms)
    res_rowid: np.ndarray = None    # i32[Pres]
    res_tfq: np.ndarray = None      # f32[Pres]
    res_fieldmask: np.ndarray = None  # i32[Pres]

    def nbytes(self) -> int:
        tot = 0
        for d in (self.rw_words, self.rw_base, self.tf_words,
                  self.fm_words):
            tot += sum(a.nbytes for a in d.values())
        for a in (self.res_rowid, self.res_tfq, self.res_fieldmask):
            tot += a.nbytes
        return tot


def build_store(term_docs: np.ndarray, term_offsets: np.ndarray,
                post_rowid: np.ndarray, post_tf: np.ndarray,
                post_tfq: np.ndarray, post_fieldmask: np.ndarray,
                force_packed: np.ndarray | None = None,
                force_class: np.ndarray | None = None,
                classes_only: bool = False):
    """force_packed (bool[T]) / force_class (i8[T,3], CLASS INDEX values)
    override the local pack decision and width classes — the sharded path
    forces GLOBAL assignments so one plan's static slot_packed shapes hold
    on every shard (a shard's local widths never exceed the global max)."""
    T = len(term_docs)
    df = term_docs.astype(np.int64)
    packed_sel = (df >= PACK_MIN) if force_packed is None \
        else (np.asarray(force_packed, bool) & (df > 0))
    p_tids = np.flatnonzero(packed_sel)

    term_class = np.zeros((T, 3), np.int8)
    term_start = np.zeros((T, 3), np.int32)

    # ---- residual raw stream for short-tail terms -------------------------
    res_offsets = np.zeros(T + 1, np.int64)
    res_len = np.where(packed_sel, 0, df)
    np.cumsum(res_len, out=res_offsets[1:])
    Pres = int(res_offsets[-1])
    res_rowid = np.zeros(Pres, np.int32)
    res_tfq = np.zeros(Pres, np.float32)
    # wide-field indexes carry [P, FW] fieldmask planes
    res_fm = (np.zeros((Pres, post_fieldmask.shape[1]), np.int32)
              if post_fieldmask.ndim == 2 else np.zeros(Pres, np.int32))
    u_tids = np.flatnonzero(~packed_sel & (df > 0))
    if len(u_tids):
        src = _ranges_concat(term_offsets, u_tids, df)
        dst = _ranges_concat(res_offsets, u_tids, res_len)
        res_rowid[dst] = post_rowid[src]
        res_tfq[dst] = post_tfq[src]
        res_fm[dst] = post_fieldmask[src]

    store = PackedStore(term_class=term_class, term_start=term_start,
                        res_offsets=res_offsets.astype(np.int32),
                        res_rowid=res_rowid, res_tfq=res_tfq,
                        res_fieldmask=res_fm)
    if not len(p_tids):
        if classes_only:
            return packed_sel, np.zeros((T, 3), np.int8)
        for c in CLASSES:
            store.rw_words[c] = np.zeros((0, PLANE_WORDS * c), np.uint32)
            store.rw_base[c] = np.zeros(0, np.int32)
            store.tf_words[c] = np.zeros((0, PLANE_WORDS * c), np.uint32)
            store.fm_words[c] = np.zeros((0, PLANE_WORDS * c), np.uint32)
        return store

    # ---- block layout for packed terms ------------------------------------
    p_df = df[p_tids]
    p_nb = (p_df + BLOCK - 1) // BLOCK
    p_len = p_nb * BLOCK
    p_out = np.zeros(len(p_tids) + 1, np.int64)
    np.cumsum(p_len, out=p_out[1:])
    total = int(p_out[-1])
    NB = total // BLOCK

    # value matrix V[sum p_len]; pad region repeats the term's LAST rowid
    # so in-block deltas stay 0 there (decode repeats the row; masked out
    # by slot length like the raw path's padding)
    src = _ranges_concat(term_offsets, p_tids, df)
    dst = _ranges_concat(p_out, np.arange(len(p_tids)), p_df)
    last_rowid = post_rowid[term_offsets[p_tids + 1].astype(np.int64) - 1]
    V = np.repeat(last_rowid.astype(np.int64), p_len)
    V[dst] = post_rowid[src]
    blocks = V.reshape(NB, BLOCK)
    deltas = blocks.copy()
    deltas[:, 1:] -= blocks[:, :-1]
    deltas[:, 0] = 0
    base = blocks[:, 0].astype(np.int32)

    # tf / fieldmask matrices (absolute values, pad 0)
    Vtf = np.zeros(total, np.int64)
    Vtf[dst] = post_tf[src]
    Vfm = np.zeros(total, np.int64)
    Vfm[dst] = post_fieldmask[src]

    # per-term class per stream: width of the max value over its blocks;
    # blocks are term-major, so per-term reductions are reduceat ranges
    blk_off = np.zeros(len(p_tids) + 1, np.int64)
    np.cumsum(p_nb, out=blk_off[1:])

    def classes_for(mat):
        bmax = mat.max(axis=1)
        tmax = np.maximum.reduceat(bmax, blk_off[:-1])
        width = np.ceil(np.log2(np.maximum(tmax, 1) + 1)).astype(np.int64)
        return _class_of(np.maximum(width, 1))

    if force_class is not None:
        fc = np.asarray(force_class)
        cls_rw = fc[p_tids, 0]
        cls_tf = fc[p_tids, 1]
        cls_fm = fc[p_tids, 2]
    else:
        cls_rw = classes_for(deltas)
        cls_tf = classes_for(Vtf.reshape(NB, BLOCK))
        cls_fm = classes_for(Vfm.reshape(NB, BLOCK))
    if classes_only:
        cls = np.zeros((T, 3), np.int8)
        cls[p_tids, 0] = cls_rw
        cls[p_tids, 1] = cls_tf
        cls[p_tids, 2] = cls_fm
        return packed_sel, cls

    def emit(kind_idx, cls, mat, words_out, base_out=None):
        for ci, c in enumerate(CLASSES):
            sel_t = np.flatnonzero(cls == ci)          # packed-term indices
            sel_b = _ranges_concat(blk_off, sel_t, p_nb)      # their blocks
            words_out[c] = _pack_planes(
                mat[sel_b].astype(np.uint32), c)
            if base_out is not None:
                base_out[c] = base[sel_b]
            # start block row per term within this class array
            nb_sel = p_nb[sel_t]
            starts = np.zeros(len(sel_t) + 1, np.int64)
            np.cumsum(nb_sel, out=starts[1:])
            term_class[p_tids[sel_t], kind_idx] = ci + 1
            term_start[p_tids[sel_t], kind_idx] = starts[:-1]

    emit(0, cls_rw, deltas, store.rw_words, store.rw_base)
    emit(1, cls_tf, Vtf.reshape(NB, BLOCK), store.tf_words)
    emit(2, cls_fm, Vfm.reshape(NB, BLOCK), store.fm_words)
    return store


def _ranges_concat(offsets: np.ndarray, ids: np.ndarray,
                   lens_all: np.ndarray) -> np.ndarray:
    """Concatenate [offsets[i], offsets[i]+len_i) ranges for i in ids."""
    lens = np.asarray(lens_all)[ids].astype(np.int64)
    tot = int(lens.sum())
    if not tot:
        return np.zeros(0, np.int64)
    rep_start = np.repeat(np.asarray(offsets)[ids].astype(np.int64), lens)
    excl = np.zeros(len(ids), np.int64)
    np.cumsum(lens[:-1], out=excl[1:])
    intra = np.arange(tot, dtype=np.int64) - np.repeat(excl, lens)
    return rep_start + intra


# --------------------------------------------------------------------------
# device-side decode (traced inside the search kernel)
# --------------------------------------------------------------------------
def decode_words(words, c: int):
    """[nb, 4c] i32 words -> [nb, 128] i32 values (bit-plane extract).
    Pure XLA: 4-way select per plane + shift/or — fuses into the slot's
    epilogue; no gathers."""
    import jax.numpy as jnp

    w = words.astype(jnp.uint32)
    lane = jnp.arange(BLOCK, dtype=jnp.int32)
    word_sel = lane // 32
    sh = (lane % 32).astype(jnp.uint32)
    nb = words.shape[0]
    vals = jnp.zeros((nb, BLOCK), jnp.int32)
    for j in range(c):
        plane = w[:, PLANE_WORDS * j: PLANE_WORDS * (j + 1)]   # [nb, 4]
        word = plane[:, :1]
        for k in range(1, PLANE_WORDS):
            word = jnp.where(word_sel[None, :] == k, plane[:, k:k + 1],
                             word)
        bit = ((word >> sh[None, :]) & jnp.uint32(1)).astype(jnp.int32)
        vals = vals + (bit << j)
    return vals


def decode_rowids(words, base, c: int):
    """Delta blocks + per-block base -> absolute rowids [nb*128]."""
    import jax.numpy as jnp

    deltas = decode_words(words, c)
    return (base[:, None] + jnp.cumsum(deltas, axis=1)).reshape(-1)
