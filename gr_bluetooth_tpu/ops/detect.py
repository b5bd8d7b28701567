"""Dense packet detection: classic access codes + LE access addresses.

The reference slides symbol-by-symbol in C++ (sniff_ac,
lib/packet_impl.cc:246-268; sniff_aa, :1452-1527), regenerating and checking
one candidate at a time.  The TPU formulation checks *every* offset of every
channel at once:

classic: the access code is affine over GF(2) in its 24 LAP bits
(ops on the (A, C) form from core.access_code).  For each offset i:
    lap_bits(i) = bits[i+38 : i+62]
    predicted(i) = (A68 @ lap_bits(i) + C68) mod 2
    err(i) = sum_j bits[i+j] XOR predicted_j(i)
The matmul runs on the MXU in f32 (values <= 24, exact); XOR in {0,1}
arithmetic is a + p - 2 a p.  The same preamble+Barker <= 2 prefilter as the
reference is computed densely so accept/reject parity holds exactly.

LE: preamble/AA/dewhitened-header Hamming distances via the generated tables
(core.le_tables) as vectorized gathers.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import access_code, whitening
from ..core.le_tables import (ACCESS_HEADER_DISTANCE, AA_DISTANCE,
                              DATA_HEADER_DISTANCE, LE_PREAMBLE_DISTANCE)

__all__ = ["classic_detect", "le_detect"]

_A68, _C68 = access_code.affine_code()
_A68 = _A68[:68].astype(np.float32)           # (68, 24)
_C68v = _C68[:68].astype(np.float32)          # (68,)

# alternating patterns for preamble (offsets 0..4) and the two valid Barker
# windows at offsets 61..67 (see core.access_code tables)
_PRE_PATTERNS = np.array([[1, 0, 1, 0, 1], [0, 1, 0, 1, 0]], dtype=np.float32)
_BARK_PATTERNS = np.array(
    [[1, 1, 1, 0, 0, 1, 0], [0, 0, 0, 1, 1, 0, 1]], dtype=np.float32)


def _windows(bits_f, offsets, width):
    """Stack shifted slices: (C, T) -> (C, T-width+1? , len(offsets))."""
    T = bits_f.shape[-1]
    n = T - width + 1
    return jnp.stack([bits_f[:, o:o + n] for o in offsets], axis=-1)


@partial(jax.jit, static_argnames=("max_ac_errors", "max_distance"))
def _classic_detect_impl(bits, A, Cv, max_ac_errors: int, max_distance: int):
    """bits: (C, T) {0,1} (any real dtype).  Returns (hits bool, err int32),
    each (C, T-71).  Distance math runs in bfloat16 (all values are small
    exact integers; the (C, n, 68) tensors and the 24->68 MXU matmul are
    the bandwidth/FLOP hot spot at full band) with f32 accumulation.
    LAP values are NOT computed densely — gather them at hit positions
    with lap_at()."""
    bits_h = jnp.asarray(bits).astype(jnp.bfloat16)
    C, T = bits_h.shape
    n = T - 72 + 1                                     # candidate offsets
    if n <= 0:
        raise ValueError("block shorter than one access code")
    # window layout (C, 68, n): offsets on the time/lane axis so each
    # shifted slice is a contiguous row — (C, n, 68) puts the window axis
    # on lanes and makes the stack a transposed strided write
    w = jnp.stack([bits_h[:, o: o + n] for o in range(68)], axis=1)
    lap = w[:, 38:62, :]                               # (C, 24, n)
    pred = jnp.einsum('jk,ckn->cjn', A.astype(jnp.bfloat16), lap,
                      preferred_element_type=jnp.float32)
    pred = pred + Cv[None, :, None]
    pred = (pred - 2.0 * jnp.floor(pred * 0.5)).astype(jnp.bfloat16)
    err = (w + pred - 2.0 * w * pred).sum(axis=1, dtype=jnp.float32)

    def dist(lo, hi, patterns):
        ds = []
        for p in patterns:
            acc = jnp.zeros((C, n), jnp.float32)
            for j in range(lo, hi):
                b = w[:, j, :]
                pj = float(p[j - lo])
                acc = acc + (b + pj - 2.0 * pj * b).astype(jnp.float32)
            ds.append(acc)
        return jnp.minimum(*ds)

    pre_d = dist(0, 5, _PRE_PATTERNS)
    bark_d = dist(61, 68, _BARK_PATTERNS)
    hits = (pre_d + bark_d <= max_distance) & (err <= max_ac_errors)
    return hits, err.astype(jnp.int32)


def lap_at(bits, chan, off):
    """LAP values at sparse (chan, offset) candidate positions: K contiguous
    24-bit row slices (vmapped dynamic_slice -> one sliced gather) instead
    of K*24 scalar gathers or a dense (C, n) LAP plane."""
    C, T = bits.shape
    b8 = jnp.asarray(bits, jnp.int8)
    c = jnp.clip(chan, 0, C - 1).astype(jnp.int32)
    o = jnp.clip(off + 38, 0, T - 24).astype(jnp.int32)
    rows = jax.vmap(
        lambda ci, oi: jax.lax.dynamic_slice(b8, (ci, oi), (1, 24))[0]
    )(c, o)                                            # (K, 24)
    j = jnp.arange(24, dtype=jnp.int32)[None, :]
    return (rows.astype(jnp.int32) << j).sum(-1).astype(jnp.int32)


def lap_from_words(words, chan, off):
    """lap_at on the bit-packed word planes (detect_pallas layout): the
    24 LAP bits at symbol off+38 span two 32-bit words, so each candidate
    costs one 2-word row slice + a funnel shift — ~10x less gather traffic
    than the 24-byte dense-row form (round-4 host-side of the device-step
    profile: lap_at was ~0.4 ms/block of the extract tail)."""
    C, W = words.shape
    u = jax.lax.bitcast_convert_type(words, jnp.uint32)
    start = off + 38
    c = jnp.clip(chan, 0, C - 1).astype(jnp.int32)
    w0 = jnp.clip(start >> 5, 0, W - 2).astype(jnp.int32)
    sh = (start & 31).astype(jnp.uint32)
    rows = jax.vmap(
        lambda ci, wi: jax.lax.dynamic_slice(u, (ci, wi), (1, 2))[0]
    )(c, w0)                                           # (K, 2) uint32
    lo = rows[:, 0] >> sh
    hi = jnp.where(sh == 0, jnp.uint32(0),
                   rows[:, 1] << ((jnp.uint32(32) - sh) & jnp.uint32(31)))
    return ((lo | hi) & jnp.uint32(0xFFFFFF)).astype(jnp.int32)


def classic_detect(bits, max_ac_errors: int = 6, max_distance: int = 2):
    """bits: (C, T) {0,1}.  Returns (hits bool, err int32, lap int32),
    each (C, T-71): candidate access-code starts per channel/offset."""
    bits = jnp.asarray(bits)
    hits, err = _classic_detect_impl(bits, jnp.asarray(_A68),
                                     jnp.asarray(_C68v),
                                     max_ac_errors, max_distance)
    # dense LAP plane for the compatibility API (tests/small rates)
    bits_f = bits.astype(jnp.float32)
    T = bits_f.shape[1]
    n = T - 72 + 1
    lap_w = jnp.stack([bits_f[:, 38 + j: 38 + j + n] for j in range(24)],
                      axis=-1)
    lap_val = (lap_w * (2.0 ** np.arange(24, dtype=np.float32))).sum(-1)
    return hits, err, lap_val.astype(jnp.int32)


# ---------------------------------------------------------------- LE

def _le_dewhiten_header_bits(index: int) -> np.ndarray:
    """Whitening word covering symbols 40..55 (the 16 header bits)."""
    return whitening.le_whitening_word(index, 16, skip=0).astype(np.float32)


@partial(jax.jit, static_argnames=("index", "is_access"))
def _le_detect_one(bits_f, index: int, is_access: bool):
    """bits_f: (T,) one LE channel.  Distances per offset (T-55)."""
    T = bits_f.shape[0]
    n = T - 56 + 1
    w = jnp.stack([bits_f[o:o + n] for o in range(56)], axis=-1)  # (n, 56)

    pre_idx = (w[:, 0:9] * (2.0 ** np.arange(9, dtype=np.float32))).sum(-1)
    pre_d = jnp.asarray(LE_PREAMBLE_DISTANCE)[pre_idx.astype(jnp.int32)]

    white = jnp.asarray(_le_dewhiten_header_bits(index))
    hdr = jnp.abs(w[:, 40:56] - white)                 # XOR with fixed word
    hdr_lsb = (hdr[:, 0:8] * (2.0 ** np.arange(8, dtype=np.float32))).sum(-1)
    hdr_msb = (hdr[:, 8:16] * (2.0 ** np.arange(8, dtype=np.float32))).sum(-1)
    tbl = ACCESS_HEADER_DISTANCE if is_access else DATA_HEADER_DISTANCE
    hdr_d = (jnp.asarray(tbl[0])[hdr_lsb.astype(jnp.int32)] +
             jnp.asarray(tbl[1])[hdr_msb.astype(jnp.int32)])

    dist = pre_d.astype(jnp.int32) + hdr_d.astype(jnp.int32)
    max_dist = 0
    if is_access:
        aa_d = jnp.zeros_like(dist)
        for k in range(4):
            b = (w[:, 8 + 8 * k:16 + 8 * k] *
                 (2.0 ** np.arange(8, dtype=np.float32))).sum(-1)
            aa_d = aa_d + jnp.asarray(AA_DISTANCE[k])[b.astype(jnp.int32)].astype(jnp.int32)
        dist = dist + aa_d
        max_dist = 2
    return dist <= max_dist, dist


def le_detect(bits, index: int):
    """bits: (T,) one channel's symbols; index: LE channel index 0..39.
    Returns (hits bool, distance int32) per offset, mirroring sniff_aa
    (lib/packet_impl.cc:1452-1527)."""
    bits_f = jnp.asarray(bits).astype(jnp.float32).reshape(-1)
    return _le_detect_one(bits_f, index, index >= 37)


# ------------------------------------------------------- LE, batched rows

def le_row_consts(indices) -> tuple:
    """Per-row constants for _le_detect_batch_impl: (white (R,16),
    aa_on (R,1), max_dist (R,1)) for LE channel indices `indices`."""
    white = np.stack([_le_dewhiten_header_bits(i) for i in indices])
    aa_on = np.array([[1.0 if i >= 37 else 0.0] for i in indices],
                     dtype=np.float32)
    max_dist = np.array([[2 if i >= 37 else 0] for i in indices],
                        dtype=np.int32)
    return white.astype(np.float32), aa_on, max_dist


def _le_detect_batch_impl(bits_f, white, aa_on, max_dist):
    """All LE rows at once (inlined into the frontend device step).

    bits_f: (R, T) f32 symbols; white: (R, 16) f32 whitening word per row;
    aa_on: (R, 1) f32 1.0 on advertising rows; max_dist: (R, 1) int32.
    Returns (hits bool, dist int32), each (R, T-55).

    Field byte values are computed as shifted multiply-adds over the bit
    planes (VPU, fused) instead of materializing a (R, n, 56) window
    tensor; distance lookups are vectorized gathers into the generated
    tables (same tables the reference hard-codes,
    lib/packet_impl.cc:1316-1444).
    """
    R, T = bits_f.shape
    n = T - 56 + 1

    def field(start, nbits, dewhiten_from=None):
        v = jnp.zeros((R, n), jnp.float32)
        for j in range(nbits):
            b = bits_f[:, start + j: start + j + n]
            if dewhiten_from is not None:
                w = white[:, dewhiten_from + j][:, None]
                b = jnp.abs(b - w)
            v = v + b * float(1 << j)
        return v.astype(jnp.int32)

    pre_d = jnp.asarray(LE_PREAMBLE_DISTANCE, jnp.int32)[field(0, 9)]
    hdr_l = field(40, 8, dewhiten_from=0)
    hdr_m = field(48, 8, dewhiten_from=8)
    acc_d = (jnp.asarray(ACCESS_HEADER_DISTANCE[0], jnp.int32)[hdr_l] +
             jnp.asarray(ACCESS_HEADER_DISTANCE[1], jnp.int32)[hdr_m])
    dat_d = (jnp.asarray(DATA_HEADER_DISTANCE[0], jnp.int32)[hdr_l] +
             jnp.asarray(DATA_HEADER_DISTANCE[1], jnp.int32)[hdr_m])
    adv = aa_on > 0.5
    hdr_d = jnp.where(adv, acc_d, dat_d)
    aa_d = jnp.zeros((R, n), jnp.int32)
    for k in range(4):
        aa_d = aa_d + jnp.asarray(AA_DISTANCE[k], jnp.int32)[field(8 + 8 * k, 8)]
    dist = pre_d + hdr_d + jnp.where(adv, aa_d, 0)
    return dist <= max_dist, dist
