"""Fused Pallas TPU kernel: GFSK demod + feedforward timing recovery +
slicer + word-pack, y channel streams -> packed symbol words.

The XLA formulation (ops/demod.py) materializes the demod tensor d (C, n)
f32, three strided symbol views e0/o0/e1, 16 per-phase metric passes, the
dense (C, n_sym) int8 bit plane, and the packed words — ~0.8 ms/block of
mostly HBM traffic at the full-band shape (round-4 profile).  This kernel
reads the y streams once per (overlapping) tile and writes ONLY the
packed (C, ceil(n_sym/32)) int32 word plane (ops/detect_pallas.py layout).

Per 512-symbol tile (1024 frames + 130-frame lookahead, manual
double-buffered DMA like ops/pfb_kernel.py — the overlap rules out the
implicit pipeline):

    d[j]     = gain * atan2(Im, Re)(y[j+1] conj(y[j]))      (VPU)
    u_f      = |d (1-f) + roll(d,-1) f|   for f in {0..7}/8
    metric   = sum(u_f) over even lanes (phases 0-7) / odd lanes (8-15),
               masked to valid symbols — the even/odd masks replace the
               stride-2 extraction that Mosaic relayouts poorly
    best     = first-max scan over the 16 phases  (argmax semantics)
    soft_all = d (1-f*) + roll(d,-1) f*;  bits = soft_all >= 0
    words    = bits @ P_even/odd -> bytes -> lo/hi halfword matmuls
               (MXU packing: sums of distinct powers of two <= 2^16 are
               exact in f32, so the pack is bit-exact; a direct 32-bit
               pack would not be)

Phase hypotheses, interpolation, and group semantics exactly match
ops/demod.py:_recover_symbols_sps2 with group=512 (the group is a
block-local estimator granularity; parity with the reference's M&M loop
is defined at the packet level — SURVEY §7 hard-part (a),
lib/multi_block.cc:122-178).  Bit-exact vs the XLA path is enforced by
tests/test_demod_kernel.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["demod_timing_pack", "atan2_poly"]


def atan2_poly(y, x):
    """Branch-free float32 atan2 for Mosaic (no atan2 primitive in the
    Pallas TPU lowering): octant reduction + the Cephes atanf minimax
    polynomial, ~2 ulp over the full plane (tests/test_demod_kernel.py
    checks < 2e-6 absolute vs np.arctan2).

    atan2(0, x<0) returns pi (sign convention of the y >= 0 half), and
    atan2(0, 0) = 0, matching np.arctan2 up to the -0.0 corner."""
    ax, ay = jnp.abs(x), jnp.abs(y)
    swap = ay > ax
    num = jnp.where(swap, ax, ay)
    den = jnp.where(swap, ay, ax)
    q = num / jnp.where(den == 0.0, 1.0, den)          # [0, 1]
    big = q > 0.4142135624                             # tan(pi/8)
    t = jnp.where(big, (q - 1.0) / (q + 1.0), q)
    z = t * t
    p = ((((8.05374449538e-2 * z - 1.38776856032e-1) * z
           + 1.99777106478e-1) * z - 3.33329491539e-1) * z * t + t)
    r = jnp.where(big, 0.78539816339744831 + p, p)     # atan(q)
    r = jnp.where(swap, 1.5707963267948966 - r, r)     # atan(ay/ax)
    r = jnp.where(x < 0.0, 3.14159265358979 - r, r)
    return jnp.where(y < 0.0, -r, r)

_GROUP = 512                   # symbols per tile = timing-phase group
_TF = 2 * _GROUP               # frames per tile
_WL = _TF + 128                # window lanes (needs TF + 2; 128-aligned)
_NPH = 16                      # timing phases
_WPT = _GROUP // 32            # words per tile (16)


def _pack_consts():
    """Packing matrices: bits_all (C, _WL) @ P -> exact byte planes.

    P_e[j, w*4+b] = 2^(k%8) for j = 64w + 2k (even lanes, parity 0);
    P_o the same for j = 64w + 2k + 1.  PL/PH combine bytes into
    half-words: lo = b0 + 256 b1, hi = b2 + 256 b3 (exact in f32)."""
    P_e = np.zeros((_WL, _WPT * 4), np.float32)
    P_o = np.zeros((_WL, _WPT * 4), np.float32)
    for w in range(_WPT):
        for k in range(32):
            col = w * 4 + k // 8
            val = float(1 << (k % 8))
            P_e[64 * w + 2 * k, col] = val
            P_o[64 * w + 2 * k + 1, col] = val
    PL = np.zeros((_WPT * 4, _WPT), np.float32)
    PH = np.zeros((_WPT * 4, _WPT), np.float32)
    for w in range(_WPT):
        PL[w * 4 + 0, w] = 1.0
        PL[w * 4 + 1, w] = 256.0
        PH[w * 4 + 2, w] = 1.0
        PH[w * 4 + 3, w] = 256.0
    return P_e, P_o, PL, PH


def _kernel(yr_hbm, yi_hbm, pe, po, plo, phi, out_ref, xs, sem,
            *, gain: float, n_sym: int):
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)

    def window_copy(tile, dst_slot):
        return (pltpu.make_async_copy(
                    yr_hbm.at[:, pl.ds(tile * _TF, _WL)],
                    xs.at[dst_slot, 0], sem.at[dst_slot, 0]),
                pltpu.make_async_copy(
                    yi_hbm.at[:, pl.ds(tile * _TF, _WL)],
                    xs.at[dst_slot, 1], sem.at[dst_slot, 1]))

    @pl.when(t == 0)
    def _():
        for c in window_copy(0, 0):
            c.start()

    @pl.when(t + 1 < n_t)
    def _():
        for c in window_copy(t + 1, nxt):
            c.start()

    for c in window_copy(t, slot):
        c.wait()

    wr = xs[slot, 0]                               # (C, _WL)
    wi = xs[slot, 1]
    C = wr.shape[0]
    wr1 = jnp.roll(wr, -1, axis=1)                 # y[j+1] (tail garbage ok)
    wi1 = jnp.roll(wi, -1, axis=1)
    pr = wr1 * wr + wi1 * wi
    pi_ = wi1 * wr - wr1 * wi
    d = gain * atan2_poly(pi_, pr)                 # d[j], valid j < _WL-1
    d1 = jnp.roll(d, -1, axis=1)                   # d[j+1]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _WL), 1)
    even = (lane & 1) == 0
    nvalid = jnp.clip(n_sym - t * _GROUP, 0, _GROUP)
    # lane j belongs to symbol k=(j-par)//2; j < 2*nvalid covers exactly
    # the valid symbols for both parities (odd lane 2k+1 < 2nv iff k < nv)
    valid = lane < 2 * nvalid
    me = even & valid
    mo = jnp.logical_not(even) & valid

    # metrics for the 16 phase hypotheses: f = (p%8)/8, parity p//8;
    # the interpolated magnitudes depend only on f — compute each once
    # and reuse for both parity masks (an MXU dot form measured the
    # same, so the simpler masked sums stay)
    us = [jnp.abs(d * (1.0 - p8 / 8.0) + d1 * (p8 / 8.0))
          for p8 in range(8)]
    cols = []
    for mask in (me, mo):
        for p8 in range(8):
            cols.append(jnp.where(mask, us[p8], 0.0)
                        .sum(axis=1, keepdims=True))

    # first-max scan == argmax semantics (strict > keeps earliest max)
    bestv = cols[0]
    besti = jnp.zeros((C, 1), jnp.int32)
    for p in range(1, _NPH):
        upd = cols[p] > bestv
        bestv = jnp.where(upd, cols[p], bestv)
        besti = jnp.where(upd, jnp.int32(p), besti)

    fb = (besti % 8).astype(jnp.float32) / 8.0     # (C, 1)
    par_odd = besti >= 8
    soft_all = d * (1.0 - fb) + d1 * fb
    bits_all = (soft_all >= 0).astype(jnp.float32)

    be = jnp.dot(bits_all, pe[...], preferred_element_type=jnp.float32)
    bo = jnp.dot(bits_all, po[...], preferred_element_type=jnp.float32)
    by = jnp.where(par_odd, bo, be)                # (C, _WPT*4) exact bytes
    lo = jnp.dot(by, plo[...], preferred_element_type=jnp.float32)
    hi = jnp.dot(by, phi[...], preferred_element_type=jnp.float32)
    out_ref[0] = (lo.astype(jnp.int32) |
                  (hi.astype(jnp.int32) << 16))


@partial(jax.jit, static_argnames=("gain", "n_sym", "interpret"))
def demod_timing_pack(yr, yi, gain: float, n_sym: int,
                      interpret: bool | None = None):
    """yr, yi: (C, F) float32 channel streams with
    F >= (n_tiles-1)*1024 + _WL (ops/pfb_kernel.py's staged output
    provides this via its trailing zero tile).

    Returns words (C, ceil(n_sym/32)) int32, bit-exact with
    detect_pallas.pack_bits_words(recover_symbols(quadrature_demod(...)))
    at group=512 (junk bits beyond n_sym masked to zero)."""
    from .detect_pallas import _resolve_interpret
    interpret = _resolve_interpret(interpret)
    C, F = yr.shape
    n_t = -(-n_sym // _GROUP)
    need = (n_t - 1) * _TF + _WL
    if F < need:
        raise ValueError(f"stream too short for windowed demod: {F} < "
                         f"{need} frames (pad with zeros)")
    C_p = -(-C // 8) * 8
    if C_p != C:
        yr = jnp.pad(yr, ((0, C_p - C), (0, 0)))
        yi = jnp.pad(yi, ((0, C_p - C), (0, 0)))

    pe, po, plo, phi = (jnp.asarray(m) for m in _pack_consts())
    words = pl.pallas_call(
        partial(_kernel, gain=float(gain), n_sym=n_sym),
        grid=(n_t,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # yr (HBM)
            pl.BlockSpec(memory_space=pl.ANY),               # yi (HBM)
            pl.BlockSpec((_WL, _WPT * 4), lambda t: (0, 0)),
            pl.BlockSpec((_WL, _WPT * 4), lambda t: (0, 0)),
            pl.BlockSpec((_WPT * 4, _WPT), lambda t: (0, 0)),
            pl.BlockSpec((_WPT * 4, _WPT), lambda t: (0, 0)),
        ],
        # tile-major output: block (1, C_p, 16) satisfies Mosaic's
        # last-two-dims rule (16 == array minor, C_p % 8 == 0); the small
        # (n_t, C, 16) -> (C, n_t*16) relayout happens in XLA below
        out_specs=pl.BlockSpec((1, C_p, _WPT), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_t, C_p, _WPT), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, 2, C_p, _WL), jnp.float32),       # window slots
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(yr, yi, pe, po, plo, phi)
    words = words.transpose(1, 0, 2).reshape(C_p, n_t * _WPT)

    nw = -(-n_sym // 32)
    words = words[:C, :nw]
    if n_sym % 32:
        tail = np.full(nw, -1, np.int64)
        tail[-1] = (1 << (n_sym % 32)) - 1
        words = words & jnp.asarray(tail.astype(np.uint32).view(np.int32))
    return words
