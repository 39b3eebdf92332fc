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
    """jax arrays for one shard. All shapes static per index generation.

    Postings live in the packed bit-plane store (ops/packed_store.py):
    per-class word rectangles + a raw residual stream for short-tail
    terms — 4-8x less HBM than the raw i32 SoA for the big terms that
    dominate posting mass. Hits stay raw (positional operators and the
    LCS ranker read them with binary searches)."""

    n_rows: int                      # number of real doc rows (N); row N is the pad sink
    n_fields: int
    packed: dict                     # pkrw_w_{c}/pkrw_b_{c}/pktf_w_{c}/pkfm_w_{c}
    res_rowid: jax.Array             # i32[Pres] short-tail raw postings
    res_tfq: jax.Array               # f32[Pres]
    res_fieldmask: jax.Array         # i32[Pres]
    hit_packed: jax.Array            # i32[H]  (Hitman packing incl. end flag;
                                     #  compares strip bit 23 at read)
    hit_rowid: jax.Array             # i32[H]  (posting rowid expanded per hit)
    sent_rowid: jax.Array            # i32[?] sentence-break rows (index_sp)
    sent_pkey: jax.Array             # i32[?] sentence-break packed positions
    para_rowid: jax.Array            # i32[?]
    para_pkey: jax.Array             # i32[?]
    alive: jax.Array                 # bool[N+1], [N] always False (dead-row map, killlist.h:22)
    field_lens: jax.Array            # i32[N+1, F] tokens per field (index_field_lengths)
    docid_hi: jax.Array              # i32[N+1]: docid >> 32 (for cross-shard tie-break)
    docid_lo: jax.Array              # i32[N+1]: (docid & 0xffffffff) - 2^31 (order-preserving bias)
    attrs: dict[str, jax.Array]      # numeric SoA columns, each [N]
    attr_perm: dict[str, jax.Array]  # secondary index: rowids sorted by
                                     # attr value (+pad row N), each [N+1]
    mva_offsets: dict[str, jax.Array]
    mva_values: dict[str, jax.Array]

    def data_pytree(self) -> dict[str, Any]:
        """The pytree passed into jitted search programs."""
        return {
            **self.packed,
            "res_rowid": self.res_rowid,
            "res_tfq": self.res_tfq,
            "res_fieldmask": self.res_fieldmask,
            "hit_packed": self.hit_packed,
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
            "attr_perm": self.attr_perm,
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
        # exact 64-bit filtering: (hi, biased lo) i32 split — arithmetic
        # hi shift keeps the sign, so signed lexicographic compare over
        # the pair equals signed int64 compare (sphinxfilter.cpp 64-bit
        # Filter_Range; same scheme as the docid split)
        a64 = arr.astype(np.int64)
        attrs[name + "#hi"] = (a64 >> 32).astype(np.int32)
        attrs[name + "#lo"] = ((a64 & 0xFFFFFFFF) - (1 << 31)).astype(
            np.int32)
    for name in packed.attrs_str:
        # strings live on device as lexicographic ordinals (filters/ORDER
        # BY); the case-folded twin serves utf8_general_ci collation
        attrs[name] = packed.str_ordinals(name)[2]
        attrs[name + "\x00ci"] = packed.str_ordinals(name, ci=True)[2]

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

    # over-pad posting/hit arrays so per-slot dynamic_slice windows never
    # clamp at the array end — MUST use the same bucket quantization as
    # the planner's slot buckets (pow4, planner._next_pow4), which can
    # round ABOVE the next pow2
    from ..query.planner import _next_pow4
    max_df = int(packed.term_docs.max()) if packed.n_terms else 0
    pad_p = _next_pow4(max_df, 1024)
    max_th = 0
    if packed.n_terms:
        # max hits of any single term
        per_term_hits = (packed.post_hit_offset[packed.term_offsets[1:]]
                         - packed.post_hit_offset[packed.term_offsets[:-1]])
        max_th = int(per_term_hits.max()) if len(per_term_hits) else 0
    pad_h = _next_pow4(max_th, 1024)

    def padp(arr, val, pad):
        return np.concatenate([arr, np.full(pad, val, arr.dtype)])

    # packed posting store: class rectangles + residual raw stream
    from .packed_store import CLASSES, PLANE_WORDS, BLOCK
    store = packed.packed_store()
    pad_nb = pad_p // BLOCK          # worst-case slot block window
    pk: dict[str, jax.Array] = {}
    for c in CLASSES:
        w = store.rw_words.get(c)
        if w is None:
            w = np.zeros((0, PLANE_WORDS * c), np.uint32)
        b = store.rw_base.get(c, np.zeros(0, np.int32))
        wt = store.tf_words.get(c, np.zeros((0, PLANE_WORDS * c),
                                            np.uint32))
        wf = store.fm_words.get(c, np.zeros((0, PLANE_WORDS * c),
                                            np.uint32))
        padrows = np.zeros((pad_nb, PLANE_WORDS * c), np.uint32)
        pk[f"pkrw_w_{c}"] = put(np.concatenate([w, padrows]
                                               ).view(np.int32))
        pk[f"pkrw_b_{c}"] = put(padp(b.astype(np.int32), n, pad_nb))
        pk[f"pktf_w_{c}"] = put(np.concatenate([wt, padrows]
                                               ).view(np.int32))
        pk[f"pkfm_w_{c}"] = put(np.concatenate([wf, padrows]
                                               ).view(np.int32))
    res_rowid = padp(store.res_rowid, n, pad_p)        # pad rows -> sink N
    res_tfq = padp(store.res_tfq, 0, pad_p)
    if store.res_fieldmask.ndim == 2:
        res_fm = np.concatenate(
            [store.res_fieldmask,
             np.zeros((pad_p, store.res_fieldmask.shape[1]), np.int32)])
    else:
        res_fm = padp(store.res_fieldmask, 0, pad_p)

    hit_rowid = np.repeat(packed.post_rowid, packed.post_tf).astype(np.int32)
    hit_rowid = padp(hit_rowid, n, pad_h)
    hit_packed_p = padp(packed.hit_packed, 0, pad_h)

    fl = np.zeros((n + 1, max(packed.schema.n_fields, 1)), np.int32)
    if packed.field_lens.size:
        fl[:n, : packed.field_lens.shape[1]] = packed.field_lens

    # secondary indexes: rowid permutations per numeric attr (values stay
    # host-side in PackedIndex.attr_index for bound searches)
    attr_perm = {}
    perm_len = _pow2(n + 1)      # >= any scan bucket (pow2 of a subset)
    for name in (list(packed.attrs_int) + list(packed.attrs_float)
                 + list(packed.attrs_big)):
        _, perm = packed.attr_index(name)
        attr_perm[name] = put(padp(perm.astype(np.int32), n,
                                   perm_len - n))

    # pad row sorts last on ties; split covers the full 63-bit id space:
    # hi = id>>32 (< 2^31 for id < 2^63), lo biased so signed lexicographic
    # compare on (hi, lo) matches unsigned 64-bit id order
    did = np.append(packed.doc_ids, 2**63 - 1).astype(np.uint64)
    docid_hi = (did >> np.uint64(32)).astype(np.int64).astype(np.int32)
    docid_lo = ((did & np.uint64(0xFFFFFFFF)).astype(np.int64)
                - 2**31).astype(np.int32)

    return DeviceIndex(
        n_rows=n,
        n_fields=packed.schema.n_fields,
        packed=pk,
        res_rowid=put(res_rowid),
        res_tfq=put(res_tfq),
        res_fieldmask=put(res_fm),
        hit_packed=put(hit_packed_p),
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
        attr_perm=attr_perm,
        mva_offsets=mva_off,
        mva_values=mva_val,
    )
