"""Fused Pallas TPU kernel for the polyphase filterbank's FIR+DFT.

The XLA formulation (ops/pfb.py:_pfb_impl) lowers to HBM-resident stages —
deinterleave relayout, Q-pass branch FIR, DFT matmuls, rotator — whose
intermediate u (2, M, n) round-trips HBM between fusions, and whose FIR
passes re-read xp.  At the full-band shape that traffic, not FLOPs, is the
bound (bench.py roofline).

This kernel consumes the deinterleaved stream xp (2, D, n) (produced by
pfb._deinterleave, itself a copy-speed Pallas transpose) and performs
FIR + DFT + rotator per time tile inside VMEM:

    HBM -> DMA (overlapping 128-aligned frame window, double-buffered)
        -> branch FIRs (VPU, Q shifted FMAs over the lane axis)
        -> M-point DFT as four (C, D) @ (D, TF) half-matmuls (MXU;
           the branch halves v0/v1 are never concatenated — the DFT
           matrix is split instead, Mosaic-friendly)
        -> (-1)^{cn} rotator (sign matrix baked per tile phase)
        -> HBM (y tiles)

HBM traffic for this stage collapses to: read xp once (+128/TF window
overlap), write yr/yi once.  The input cannot use the implicit pallas
pipeline because consecutive tiles need OVERLAPPING windows (frame j
draws on frames [j, j + 2Q)), so xp stays in ANY memory and windows are
fetched with `pltpu.make_async_copy`, next-tile fetch overlapping
current-tile compute.  DMA alignment rules: window length and tile
offsets are multiples of 128 lanes; the branch axis D is padded to the
8-sublane tile when needed (taps/DFT columns zero-padded, exact math).

Same math as _pfb_impl — identical window placement, prototype taps, DDC
phase convention (reference design: lib/multi_block.cc:62-79, 180-228);
exact-parity tested in tests/test_pfb_kernel.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pfb_channelize_fused"]

_TF = 1024                     # output frames per tile (multiple of 128)
_LOOKAHEAD = 128               # window = TF + 128 frames (>= TF + 2Q)


def _kernel(xp_hbm, h0, h1, cm0, cm1, sm0, sm1, sign, yr_out, yi_out,
            xs, sem, *, Q: int, TF: int):
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    W = TF + _LOOKAHEAD
    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    def window_copy(tile, dst_slot):
        return pltpu.make_async_copy(
            xp_hbm.at[:, :, pl.ds(tile * TF, W)],
            xs.at[dst_slot], sem.at[dst_slot])

    @pl.when(i == 0)
    def _():
        window_copy(0, 0).start()

    @pl.when(i + 1 < n_tiles)
    def _():
        window_copy(i + 1, nxt).start()

    window_copy(i, slot).wait()

    xw = xs[slot]                                  # (2, D_p, W)
    D_p = xw.shape[1]
    h0v, h1v = h0[...], h1[...]                    # (Q, D_p)
    v0 = jnp.zeros((2, D_p, TF), jnp.float32)
    v1 = jnp.zeros((2, D_p, TF), jnp.float32)
    for q in range(Q):
        v0 = v0 + xw[:, :, 2 * q: 2 * q + TF] * h0v[q][None, :, None]
        v1 = v1 + xw[:, :, 2 * q + 1: 2 * q + 1 + TF] * h1v[q][None, :, None]

    def dft(m0, m1):
        return (jnp.dot(m0, v0[0], preferred_element_type=jnp.float32)
                + jnp.dot(m1, v1[0], preferred_element_type=jnp.float32),
                jnp.dot(m0, v0[1], preferred_element_type=jnp.float32)
                + jnp.dot(m1, v1[1], preferred_element_type=jnp.float32))

    cr, ci = dft(cm0[...], cm1[...])               # cos branch, I/Q
    sr, si = dft(sm0[...], sm1[...])               # sin branch, I/Q
    # rotator e^{-j pi c n} = (-1)^{cn}: TF is even, so the frame-parity
    # pattern is tile-invariant and baked into the (C, TF) sign matrix
    yr_out[...] = (cr + si) * sign[...]
    yi_out[...] = (ci - sr) * sign[...]


@partial(jax.jit, static_argnames=("D", "interpret"))
def pfb_channelize_fused(x_ri, h0, h1, dft_c, dft_s, bin_odd, D: int,
                         interpret: bool = False):
    """x_ri: (2, N) float32 -> (yr, yi) each (C, n), n = N//D - 2Q.

    Drop-in equal to pfb._pfb_impl (same frame windows / group delay).
    """
    from .pfb import _deinterleave

    Q = h0.shape[0]
    if 2 * Q > _LOOKAHEAD:
        raise ValueError(f"prototype too long for the DMA lookahead: "
                         f"2Q={2 * Q} > {_LOOKAHEAD}")
    C = dft_c.shape[1]
    n_x = x_ri.shape[1] // D
    n = n_x - 2 * Q
    TF = _TF if n >= _TF else -(-n // 128) * 128
    n_tiles = -(-n // TF)
    need = n_tiles * TF + _LOOKAHEAD        # frames incl. DMA lookahead

    xp = _deinterleave(x_ri[:, : n_x * D], D)          # (2, D, n_x)
    D_p = -(-D // 8) * 8                    # sublane-aligned branch axis
    pad_d, pad_f = D_p - D, max(0, need - n_x)
    if pad_d or pad_f:
        xp = jnp.pad(xp, ((0, 0), (0, pad_d), (0, pad_f)))
        h0 = jnp.pad(h0, ((0, 0), (0, pad_d)))
        h1 = jnp.pad(h1, ((0, 0), (0, pad_d)))
    elif need > n_x:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, need - n_x)))

    # DFT matrix split into branch halves (rows of u = (v0 ; v1))
    cm = jnp.asarray(dft_c).T                          # (C, M)
    sm = jnp.asarray(dft_s).T
    cm0 = jnp.pad(cm[:, :D], ((0, 0), (0, pad_d)))
    cm1 = jnp.pad(cm[:, D:], ((0, 0), (0, pad_d)))
    sm0 = jnp.pad(sm[:, :D], ((0, 0), (0, pad_d)))
    sm1 = jnp.pad(sm[:, D:], ((0, 0), (0, pad_d)))

    parity = jnp.asarray((np.arange(TF) & 1).astype(np.float32))
    sign = 1.0 - 2.0 * (jnp.asarray(bin_odd)[:, None] * parity[None, :])

    W = TF + _LOOKAHEAD
    yr, yi = pl.pallas_call(
        partial(_kernel, Q=Q, TF=TF),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # xp (HBM)
            pl.BlockSpec((Q, D_p), lambda i: (0, 0)),        # h0
            pl.BlockSpec((Q, D_p), lambda i: (0, 0)),        # h1
            pl.BlockSpec((C, D_p), lambda i: (0, 0)),        # cos, lo half
            pl.BlockSpec((C, D_p), lambda i: (0, 0)),        # cos, hi half
            pl.BlockSpec((C, D_p), lambda i: (0, 0)),        # sin, lo half
            pl.BlockSpec((C, D_p), lambda i: (0, 0)),        # sin, hi half
            pl.BlockSpec((C, TF), lambda i: (0, 0)),         # sign
        ],
        out_specs=[
            pl.BlockSpec((C, TF), lambda i: (0, i)),
            pl.BlockSpec((C, TF), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, n_tiles * TF), jnp.float32),
            jax.ShapeDtypeStruct((C, n_tiles * TF), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 2, D_p, W), jnp.float32),         # window slots
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, h0, h1, cm0, cm1, sm0, sm1, sign)
    return yr[:, :n], yi[:, :n]
