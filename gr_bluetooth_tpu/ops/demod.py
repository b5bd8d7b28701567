"""GFSK quadrature demod + feedforward timing recovery + slicer.

The reference chain is quadrature demod -> Mueller & Muller clock recovery ->
binary slicer, all sequential per channel-sample (lib/multi_block.cc:122-178).
M&M is a per-sample feedback loop — hostile to wide vector hardware — so the
TPU-native design replaces it with a *feedforward polyphase* estimator:

  1. demod d[n] = gain * atan2(Im, Re)(y[n] conj(y[n-1]))    (VPU, batched)
  2. hypothesize P timing phases tau in [0, ch_sps); sample the demod stream
     at k*ch_sps + tau via linear interpolation (one gather per phase)
  3. the GFSK eye is maximally open where |d| is largest, so per channel and
     per group of symbols pick tau* = argmax_tau sum_k |d(k*ch_sps + tau)|
  4. slice the winning phase: bit_k = d(k*ch_sps + tau*) >= 0

Parity is defined at the packet level (same packets detected/decoded), not
the sample level — SURVEY §7 "hard parts" (a).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["quadrature_demod", "recover_symbols", "demod_and_slice"]


def quadrature_demod(yr, yi, gain: float):
    """d[n] = gain * arg(y[n] * conj(y[n-1])); shape (C, N) -> (C, N-1)."""
    pr = yr[:, 1:] * yr[:, :-1] + yi[:, 1:] * yi[:, :-1]
    pi = yi[:, 1:] * yr[:, :-1] - yr[:, 1:] * yi[:, :-1]
    return gain * jnp.arctan2(pi, pr)


@partial(jax.jit, static_argnames=("ch_sps", "n_sym", "n_phases", "group"))
def recover_symbols(d, ch_sps: float, n_sym: int, n_phases: int = 16,
                    group: int = 512):
    """Feedforward timing recovery over a demodulated block.

    d: (C, N) float32.  Returns (soft, bits): (C, n_sym) float32 soft symbol
    values at the per-(channel, group) best timing phase, and int8 bits.

    For the exact 2-samples/symbol case (the PFB path) this dispatches to a
    gather-free strided formulation; the general-rate gather version below
    is the fallback for odd input rates.
    """
    if ch_sps == 2.0:
        return _recover_symbols_sps2(d, n_sym, n_phases=n_phases,
                                     group=group)
    C, N = d.shape
    taus = (jnp.arange(n_phases, dtype=jnp.float32) / n_phases) * ch_sps
    base = jnp.arange(n_sym, dtype=jnp.float32) * ch_sps          # (K,)
    pos = base[None, :] + taus[:, None]                           # (P, K)
    i0 = jnp.floor(pos).astype(jnp.int32)
    i0 = jnp.clip(i0, 0, N - 2)
    frac = pos - i0.astype(jnp.float32)
    # gather: v[c, p, k]
    v = d[:, i0] * (1.0 - frac)[None] + d[:, i0 + 1] * frac[None]
    # group-wise timing metric
    n_groups = (n_sym + group - 1) // group
    pad = n_groups * group - n_sym
    vp = jnp.pad(jnp.abs(v), ((0, 0), (0, 0), (0, pad)))
    metric = vp.reshape(C, n_phases, n_groups, group).sum(-1)     # (C, P, G)
    best = jnp.argmax(metric, axis=1)                             # (C, G)
    sel = jnp.repeat(best, group, axis=-1)[:, :n_sym]             # (C, K)
    soft = jnp.take_along_axis(v, sel[:, None, :], axis=1)[:, 0, :]
    bits = (soft >= 0).astype(jnp.int8)
    return soft, bits


@partial(jax.jit, static_argnames=("n_sym", "n_phases", "group"))
def _recover_symbols_sps2(d, n_sym: int, n_phases: int = 16,
                          group: int = 512):
    """Strided timing recovery at exactly 2 samples/symbol: every phase
    tau = p/8 interpolates between two of the three strided views
    d[2k], d[2k+1], d[2k+2] with a FIXED fraction — no gathers at all.

    Phase selection is done with per-group one-hot masks (16 selects)
    instead of take_along_axis.
    """
    C, N = d.shape
    K = n_sym
    e0 = d[:, 0: 2 * K: 2]
    o0 = d[:, 1: 2 * K + 1: 2]
    e1 = d[:, 2: 2 * K + 2: 2]
    # pad truncated tails (N may fall one short of 2K+2)
    if o0.shape[1] < K:
        o0 = jnp.pad(o0, ((0, 0), (0, K - o0.shape[1])))
    if e1.shape[1] < K:
        e1 = jnp.pad(e1, ((0, 0), (0, K - e1.shape[1])))

    half = n_phases // 2
    n_groups = (n_sym + group - 1) // group
    pad = n_groups * group - K
    metrics = []
    for p in range(n_phases):
        f = (p % half) / float(half)
        a, bb = (e0, o0) if p < half else (o0, e1)
        m = jnp.abs(a * (1.0 - f) + bb * f)
        m = jnp.pad(m, ((0, 0), (0, pad)))
        metrics.append(m.reshape(C, n_groups, group).sum(-1))  # (C, G)
    metric = jnp.stack(metrics, axis=1)                  # (C, P, G)
    best = jnp.argmax(metric, axis=1)                    # (C, G)

    # final interpolation as per-symbol coefficients: soft =
    # (1-f)*A + f*B with A/B selected by whether the winning phase sits in
    # [e0, o0) or [o0, e1) — 2 selects + 3 mul/adds over (C, K) instead of
    # materializing all n_phases dense streams and select-reducing them
    fK = jnp.repeat((best % half).astype(jnp.float32) / half, group,
                    axis=-1)[:, :K]
    m1 = jnp.repeat(best >= half, group, axis=-1)[:, :K]
    a = jnp.where(m1, o0, e0)
    bb = jnp.where(m1, e1, o0)
    soft = a * (1.0 - fK) + bb * fK
    bits = (soft >= 0).astype(jnp.int8)
    return soft, bits


def demod_and_slice(yr, yi, gain: float, ch_sps: float, n_sym: int,
                    n_phases: int = 16, group: int = 512):
    d = quadrature_demod(yr, yi, gain)
    return recover_symbols(d, ch_sps, n_sym, n_phases=n_phases, group=group)
