"""Device-resident index arrays (one shard) + upload from PackedIndex.

The device layout replaces the reference's on-disk .spd/.spp/.spa files
(sphinx.cpp:859-877) with HBM-resident SoA arrays; the wordlist (.spi) and
docid lookup (.spt) stay host-side (they are control-plane lookups that
produce tiny per-query scalars — CSR offsets — not data-plane work).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..index.builder import PackedIndex


@dataclass
class DeviceIndex:
    """jax arrays for one shard. All shapes static per index generation."""

    n_rows: int                      # number of real doc rows (N); row N is the pad sink
    n_fields: int
    post_rowid: jax.Array            # i32[P]
    post_tfq: jax.Array              # f32[P]
    post_tf: jax.Array               # i32[P]
    post_fieldmask: jax.Array        # i32[P]
    post_hit_offset: jax.Array       # i32[P+1]
    hit_packed: jax.Array            # i32[H]  (Hitman packing incl. end flag)
    hit_packed_nokey: jax.Array      # i32[H]  (end flag stripped, for compares)
    hit_rowid: jax.Array             # i32[H]  (posting rowid expanded per hit)
    sent_rowid: jax.Array            # i32[?] sentence-break rows (index_sp)
    sent_pkey: jax.Array             # i32[?] sentence-break packed positions
    para_rowid: jax.Array            # i32[?]
    para_pkey: jax.Array             # i32[?]
    alive: jax.Array                 # bool[N+1], [N] always False (dead-row map, killlist.h:22)
    field_lens: jax.Array            # i32[N+1, F] tokens per field (index_field_lengths)
    docid_hi: jax.Array              # i32[N+1]: docid >> 31 (for cross-shard tie-break)
    docid_lo: jax.Array              # i32[N+1]: docid & 0x7fffffff
    attrs: dict[str, jax.Array]      # numeric SoA columns, each [N]
    mva_offsets: dict[str, jax.Array]
    mva_values: dict[str, jax.Array]

    def data_pytree(self) -> dict[str, Any]:
        """The pytree passed into jitted search programs."""
        return {
            "post_rowid": self.post_rowid,
            "post_tfq": self.post_tfq,
            "post_tf": self.post_tf,
            "post_fieldmask": self.post_fieldmask,
            "post_hit_offset": self.post_hit_offset,
            "hit_packed": self.hit_packed,
            "hit_packed_nokey": self.hit_packed_nokey,
            "hit_rowid": self.hit_rowid,
            "sent_rowid": self.sent_rowid,
            "sent_pkey": self.sent_pkey,
            "para_rowid": self.para_rowid,
            "para_pkey": self.para_pkey,
            "alive": self.alive,
            "field_lens": self.field_lens,
            "docid_hi": self.docid_hi,
            "docid_lo": self.docid_lo,
            "attrs": self.attrs,
            "mva_offsets": self.mva_offsets,
            "mva_values": self.mva_values,
        }


def _pad_breaks(arr: np.ndarray) -> np.ndarray:
    """Boundary arrays padded to >=1 with a +inf-like row so searches miss."""
    if len(arr):
        return arr.astype(np.int32)
    return np.full(1, 2**31 - 1, np.int32)


def upload(packed: PackedIndex, device=None) -> DeviceIndex:
    n = packed.n_docs
    alive = np.ones(n + 1, dtype=bool)
    alive[n] = False

    attrs: dict[str, np.ndarray] = {}
    for name, arr in packed.attrs_int.items():
        attrs[name] = arr.astype(np.int32)
    for name, arr in packed.attrs_float.items():
        attrs[name] = arr.astype(np.float32)
    for name, arr in packed.attrs_big.items():
        # device copy of bigints: f32 would lose precision for filters; keep
        # low 31 bits exact on device and flag overflow host-side (full
        # precision copy stays on host in PackedIndex.attrs_big)
        attrs[name] = np.clip(arr, -(2**31), 2**31 - 1).astype(np.int32)
    for name in packed.attrs_str:
        # strings live on device as lexicographic ordinals (filters/ORDER BY)
        attrs[name] = packed.str_ordinals(name)[2]

    put = (lambda x: jax.device_put(x, device)) if device is not None else jnp.asarray

    mva_off = {}
    mva_val = {}
    for name, (off, vals) in packed.attrs_mva.items():
        mva_off[name] = put(off.astype(np.int32))
        mva_val[name] = put(np.clip(vals, -(2**31), 2**31 - 1).astype(np.int32))

    def _pow2(x, lo=1024):
        n = lo
        while n < x:
            n <<= 1
        return n

    # over-pad posting/hit arrays so per-slot dynamic_slice windows (pow2 of
    # df / hit count, ops/search.py) never clamp at the array end
    max_df = int(packed.term_docs.max()) if packed.n_terms else 0
    pad_p = _pow2(max_df)
    max_th = 0
    if packed.n_terms:
        # max hits of any single term
        per_term_hits = (packed.post_hit_offset[packed.term_offsets[1:]]
                         - packed.post_hit_offset[packed.term_offsets[:-1]])
        max_th = int(per_term_hits.max()) if len(per_term_hits) else 0
    pad_h = _pow2(max_th)

    def padp(arr, val, pad):
        return np.concatenate([arr, np.full(pad, val, arr.dtype)])

    post_rowid_p = padp(packed.post_rowid, n, pad_p)   # pad rows -> sink N
    post_tfq_p = padp(packed.post_tfq, 0, pad_p)
    post_tf_p = padp(packed.post_tf, 0, pad_p)
    post_fm_p = padp(packed.post_fieldmask, 0, pad_p)

    hit_rowid = np.repeat(packed.post_rowid, packed.post_tf).astype(np.int32)
    hit_rowid = padp(hit_rowid, n, pad_h)
    hit_nokey = padp((packed.hit_packed & ~(1 << 23)).astype(np.int32), 0,
                     pad_h)
    hit_packed_p = padp(packed.hit_packed, 0, pad_h)

    fl = np.zeros((n + 1, max(packed.schema.n_fields, 1)), np.int32)
    if packed.field_lens.size:
        fl[:n, : packed.field_lens.shape[1]] = packed.field_lens

    did = np.append(packed.doc_ids, 2**62)  # pad row sorts last on ties
    docid_hi = (did >> 31).astype(np.int32)
    docid_lo = (did & 0x7FFFFFFF).astype(np.int32)

    return DeviceIndex(
        n_rows=n,
        n_fields=packed.schema.n_fields,
        post_rowid=put(post_rowid_p),
        post_tfq=put(post_tfq_p),
        post_tf=put(post_tf_p),
        post_fieldmask=put(post_fm_p),
        post_hit_offset=put(packed.post_hit_offset),
        hit_packed=put(hit_packed_p),
        hit_packed_nokey=put(hit_nokey),
        hit_rowid=put(hit_rowid),
        sent_rowid=put(_pad_breaks(packed.sent_rowid)),
        sent_pkey=put(_pad_breaks(packed.sent_pkey)),
        para_rowid=put(_pad_breaks(packed.para_rowid)),
        para_pkey=put(_pad_breaks(packed.para_pkey)),
        alive=put(alive),
        field_lens=put(fl),
        docid_hi=put(docid_hi),
        docid_lo=put(docid_lo),
        attrs={k: put(v) for k, v in attrs.items()},
        mva_offsets=mva_off,
        mva_values=mva_val,
    )
