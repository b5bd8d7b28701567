"""Pallas TPU kernel for dense classic access-code detection.

The XLA formulation in ops/detect.py materializes the (C, 68, n) symbol
window tensor in HBM (~0.5 GB per 64-slot full-band block) three times over
(stack, predict, xor-sum) — at full band the stage is pure memory traffic.
This kernel tiles the offset axis and keeps everything in VMEM / vregs:

  per (channel-tile, offset-tile) program:
    DMA bits[(8 ch), NT + 72] HBM -> VMEM                      (int32)
    v_j    = roll(bits, -j)[:, :NT]       j = 0..67  (offset-0 views;
             Mosaic cannot mix lane offsets, so every shifted view is
             normalized by a lane rotation)
    pred_j = (sum_{k: A[j,k]=1} v_{38+k} + c_j) & 1
             -- the affine GF(2) access-code map (core/access_code) as
                unrolled shifted adds: the 24->68 "matmul" has only ~800
                ones total, cheaper on the VPU than an MXU dispatch once
                the window tensor no longer exists
    err    = sum_j v_j XOR pred_j
    gate   = preamble/Barker distance prefilter (same <= 2 rule as
             sniff_ac, lib/packet_impl.cc:251-265)
    out    = err where gate else BIG

Output is a single (C, n) int32 "gated error" plane; callers form
hits = out <= max_ac_errors.  Semantics identical to
detect._classic_detect_impl (tested for exact equality).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import access_code

__all__ = ["gated_error", "classic_detect_pallas"]

_A68, _C68 = access_code.affine_code()
_A68 = _A68[:68].astype(np.int32)                      # (68, 24) 0/1
_C68v = _C68[:68].astype(np.int32)                     # (68,)

# preamble (j = 0..4) and Barker (j = 61..67) alternating patterns — the
# two polarities of each (ops/detect.py _PRE_PATTERNS/_BARK_PATTERNS)
_PRE0 = (1, 0, 1, 0, 1)
_BARK0 = (1, 1, 1, 0, 0, 1, 0)

BIG = 1 << 20                                          # gated-out marker
_C_TILE = 8
# lookahead past a tile: >= 71 offsets, and the HBM->VMEM slice width
# (nt + _PAD_OFF) must stay 128-lane aligned for Mosaic
_PAD_OFF = 128


def _kernel(bits_hbm, out_ref, *, nt: int):
    ci = pl.program_id(0)
    ti = pl.program_id(1)

    def body(buf, sem):
        cp = pltpu.make_async_copy(
            bits_hbm.at[pl.ds(ci * _C_TILE, _C_TILE),
                        pl.ds(ti * nt, nt + _PAD_OFF)],
            buf, sem)
        cp.start()
        cp.wait()
        b = buf[:, :]                                   # (8, NT+72) int32
        width = nt + _PAD_OFF
        v = [pltpu.roll(b, (width - j) % width, 1)[:, :nt]
             for j in range(68)]

        err = jnp.zeros((_C_TILE, nt), jnp.int32)
        for j in range(68):
            p = None
            for k in range(24):
                if _A68[j, k]:
                    p = v[38 + k] if p is None else p + v[38 + k]
            p = (p + int(_C68v[j])) & 1 if p is not None else \
                jnp.full((_C_TILE, nt), int(_C68v[j]) & 1, jnp.int32)
            err = err + (v[j] ^ p)

        def pat_dist(lo, pat):
            d0 = None
            for j, pj in enumerate(pat):
                x = v[lo + j] ^ pj
                d0 = x if d0 is None else d0 + x
            return jnp.minimum(d0, len(pat) - d0)      # both polarities

        dist = pat_dist(0, _PRE0) + pat_dist(61, _BARK0)
        out_ref[:, :] = jnp.where(dist <= 2, err, BIG)

    pl.run_scoped(
        body,
        pltpu.VMEM((_C_TILE, nt + _PAD_OFF), jnp.int32),
        pltpu.SemaphoreType.DMA(()),
    )


@partial(jax.jit, static_argnames=("nt", "interpret"))
def _gated_error_padded(bits_i32, *, nt: int, interpret: bool):
    """bits_i32: (C_pad, T_pad) with C_pad % 8 == 0 and
    T_pad == n_tiles * nt + _PAD_OFF.  Returns (C_pad, n_tiles * nt) int32."""
    c_pad, t_pad = bits_i32.shape
    n_tiles = (t_pad - _PAD_OFF) // nt
    grid = (c_pad // _C_TILE, n_tiles)
    return pl.pallas_call(
        partial(_kernel, nt=nt),
        out_shape=jax.ShapeDtypeStruct((c_pad, n_tiles * nt), jnp.int32),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((_C_TILE, nt), lambda ci, ti: (ci, ti),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=c_pad * n_tiles * nt * (int(_A68.sum()) + 6 * 68),
            bytes_accessed=c_pad * t_pad * 4 + c_pad * n_tiles * nt * 4,
            transcendentals=0),
    )(bits_i32)


def gated_error(bits, nt: int = 1024, interpret: bool = False):
    """bits: (C, T) {0,1} any real dtype -> (C, T-71) int32 gated AC error
    counts (BIG where the preamble/Barker prefilter rejects)."""
    bits = jnp.asarray(bits, jnp.int32)
    C, T = bits.shape
    n = T - 72 + 1
    if n <= 0:
        raise ValueError("block shorter than one access code")
    if nt % 128 != 0 and not interpret:
        raise ValueError("nt must be 128-lane aligned on hardware")
    c_pad = -(-C // _C_TILE) * _C_TILE
    n_tiles = -(-n // nt)
    t_pad = n_tiles * nt + _PAD_OFF
    bits_p = jnp.zeros((c_pad, t_pad), jnp.int32)
    bits_p = jax.lax.dynamic_update_slice(bits_p, bits[:, :min(T, t_pad)],
                                          (0, 0))
    out = _gated_error_padded(bits_p, nt=nt, interpret=interpret)
    return out[:C, :n]


def classic_detect_pallas(bits, max_ac_errors: int = 6, nt: int = 1024,
                          interpret: bool = False):
    """Drop-in for detect._classic_detect_impl: (hits bool, err int32)."""
    g = gated_error(bits, nt=nt, interpret=interpret)
    return g <= max_ac_errors, jnp.where(g >= BIG, 0, g)
