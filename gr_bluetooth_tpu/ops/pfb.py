"""Oversampled polyphase DFT filterbank channelizer.

The reference runs one freq_xlating FIR per channel at the full input rate
(lib/multi_block.cc:180-228, 305-342); cost scales as fs * ntaps * channels
and reaches ~0.5 TMAC per signal-second at the full 79-channel band.  The
TPU-native design factors the uniform filterbank the classic way:

    y_c[n] = e^{-j2pi c nD/M} * DFT_M{ u_r[n] }_c
    u_r[n] = sum_q h[qM + r] x[nD + qM + r]

with M = fs / 1 MHz branches and D = M/2 decimation (2 samples/symbol out,
like the reference's decim = sps/2).  Costs split into

  * branch FIRs: ntaps MACs per input sample, evaluated as Q shifted
    fused multiply-adds over the (2, n, D) polyphase view (VPU work,
    XLA-fusable, no gathers), and
  * the M-point DFT across branches as two (n, M) @ (M, C) real matmuls
    (MXU work; bin selection for the covered BR channels is folded into
    the DFT matrix columns).

~10x fewer FLOPs than the equivalent dense strided conv, with identical
output (same prototype low-pass, same DDC phase convention) — parity is
tested against ops.channelizer on small rates.

Because D = M/2, the per-output rotator e^{-j2pi c nD/M} collapses to
(-1)^{c n}: a sign flip on odd bins at odd frames.

The prototype filter is the reference's Hann low-pass design
(500 kHz cutoff / 300 kHz transition, multi_block.cc:62-69).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (BASE_FREQUENCY, CHANNEL_FILTER_CUTOFF,
                         CHANNEL_FILTER_TRANSITION, CHANNEL_WIDTH)
from .channelizer import select_channels
from .filters import lowpass_taps

__all__ = ["PfbBank", "make_pfb_bank", "pfb_channelize"]


@dataclass(frozen=True)
class PfbBank:
    fs: float
    center_freq: float
    sps: int                      # wideband samples per symbol = M branches
    decim: int                    # D = M/2
    ch_sps: float                 # always 2.0
    channels: tuple               # BR channel numbers covered
    ntaps: int                    # prototype length before padding
    h0: np.ndarray                # (Q, D) branch taps, even half-frames
    h1: np.ndarray                # (Q, D) branch taps, odd half-frames
    dft_c: np.ndarray             # (M, C) cos DFT columns for covered bins
    dft_s: np.ndarray             # (M, C) sin DFT columns for covered bins
    bin_odd: np.ndarray           # (C,) float32: 1.0 where DFT bin is odd
    demod_gain: float

    @property
    def n_channels(self) -> int:
        return len(self.channels)


def make_pfb_bank(fs: float, center_freq: float,
                  channels: tuple | None = None) -> PfbBank:
    sps = int(round(fs / 1e6))
    if abs(fs - sps * 1e6) > 1e-3 or sps < 2:
        raise ValueError("sample rate must be an integer multiple of 1 Msps >= 2")
    if sps % 2:
        raise ValueError("polyphase bank requires an even samples/symbol; "
                         "use the conv bank for odd rates")
    if abs((center_freq / 1e6) - round(center_freq / 1e6)) > 1e-9:
        raise ValueError("center frequency must sit on the 1 MHz channel grid")
    M = sps
    D = M // 2

    # channels may be overridden by resampled front ends whose TRUE band
    # is narrower than the internal rate (ops/resample.py)
    channels = tuple(channels) if channels else \
        select_channels(fs, center_freq)
    # one extra "probe row" above the top channel: the off-channel noise
    # probe at f_c + 790 kHz (multi_block.cc:71-79, 336-340) sits at
    # -210 kHz inside channel c+1's passband, so the SNR squelch reads it
    # from the neighbor's stream (ops/snr.py) — rows = channels + [high+1]
    probe_rows = channels + (channels[-1] + 1,)

    taps = lowpass_taps(1.0, fs, CHANNEL_FILTER_CUTOFF,
                        CHANNEL_FILTER_TRANSITION)
    ntaps = len(taps)
    Q = -(-ntaps // M)                                 # half-frames, ceil
    h = np.zeros(Q * M, dtype=np.float64)
    h[:ntaps] = taps
    hm = h.reshape(Q, M)
    h0 = hm[:, :D].astype(np.float32)                  # h[qM + p]
    h1 = hm[:, D:].astype(np.float32)                  # h[qM + p + D]

    C = len(probe_rows)
    r = np.arange(M)
    dft_c = np.zeros((M, C), dtype=np.float32)
    dft_s = np.zeros((M, C), dtype=np.float32)
    bin_odd = np.zeros(C, dtype=np.float32)
    for i, ch in enumerate(probe_rows):
        f_rel = BASE_FREQUENCY + ch * CHANNEL_WIDTH - center_freq
        m = int(round(f_rel / 1e6)) % M                # DFT bin
        ang = 2.0 * np.pi * m * r / M
        dft_c[:, i] = np.cos(ang)
        dft_s[:, i] = np.sin(ang)
        bin_odd[i] = float(m & 1)
    demod_gain = 2.0 / (np.pi / 2.0)                   # ch_sps / (pi/2)
    return PfbBank(fs, center_freq, sps, D, 2.0, channels, ntaps,
                   h0, h1, dft_c, dft_s, bin_odd, float(demod_gain))


_DEINT_TF = 1024          # frames per deinterleave tile


def _deint_kernel(x_ref, o_ref):
    o_ref[...] = jnp.transpose(x_ref[...], (0, 2, 1))


def _deinterleave(x2, D: int):
    """(2, n_x*D) -> (2, D, n_x): xp[p, d, j] = x[p, j*D + d].

    XLA's lowering of this 26 MB relayout (reshape+transpose or strided
    slices) costs ~1.3 ms on v5e — as much as the rest of the filterbank
    combined — so on TPU it runs as a tiled Pallas transpose at copy speed.

    The branch keys off the actual LOWERING platform (lax.platform_dependent)
    rather than the process-wide default backend, so a trace compiled for a
    CPU device while TPU is the default (or an AOT lowering) never emits the
    TPU-only pallas_call for the wrong platform.
    """
    n_x = x2.shape[1] // D
    x4 = x2.reshape(2, n_x, D)

    def xla_path(x4):
        return x4.transpose(0, 2, 1)

    def tpu_path(x4):
        from jax.experimental import pallas as pl
        pad = (-n_x) % _DEINT_TF
        if pad:
            x4 = jnp.pad(x4, ((0, 0), (0, pad), (0, 0)))
        n_p = n_x + pad
        out = pl.pallas_call(
            _deint_kernel,
            out_shape=jax.ShapeDtypeStruct((2, D, n_p), x2.dtype),
            grid=(n_p // _DEINT_TF,),
            in_specs=[pl.BlockSpec((2, _DEINT_TF, D), lambda i: (0, i, 0))],
            out_specs=pl.BlockSpec((2, D, _DEINT_TF), lambda i: (0, 0, i)),
        )(x4)
        return out[:, :, :n_x] if pad else out

    return jax.lax.platform_dependent(x4, tpu=tpu_path, default=xla_path)


@partial(jax.jit, static_argnames=("D",))
def _pfb_impl(x_ri, h0, h1, dft_c, dft_s, bin_odd, D: int):
    """x_ri: (2, N) float32 IQ planes -> (yr, yi) each (C, n_frames);
    also accepts the pre-staged (2, F, 128) layout (pfb_kernel.stage_host)
    and then returns (C, n_tiles*TF) with junk tail columns the consumer
    slices away.

    Frame n covers input samples [nD, nD + 2QD): identical window placement
    to the VALID strided conv, so downstream group-delay accounting is
    unchanged.

    Layout: frames live on the LANE axis throughout — the branch FIR's
    shifted views then slide along lanes with all 128 lanes busy (the
    frame-major (2, n, D) form keeps only D=M/2 lanes live and puts the
    shifts on sublanes), and the DFT matmul (C, M) @ (M, n) hits the MXU
    with the long axis on lanes and no output transpose.
    """
    from . import pfb_kernel

    staged = x_ri.ndim == 3
    Q = h0.shape[0]

    def xla_path(x_ri):
        if staged:
            # un-stage (tests / CPU dryrun of staged callers): frames
            # beyond the true stream are zeros, their outputs junk —
            # shape must match the TPU branch, content is sliced later
            n_x = x_ri.shape[1]
            xp = x_ri[:, :, :D].transpose(0, 2, 1)
            n = (n_x - pfb_kernel._LOOKAHEAD)
        else:
            n_x = x_ri.shape[1] // D
            # xp[p, d, j] = x[p, j*D+d]: branches sublanes, frames lanes
            xp = _deinterleave(x_ri[:, : n_x * D], D)
            n = n_x - 2 * Q
        # branch FIRs as Q fused shifted multiply-adds (VPU, lane-major);
        # staged: max slice end = 2Q-1+n = F+2Q-129 <= F, in bounds
        v0 = jnp.zeros((2, D, n), jnp.float32)
        v1 = jnp.zeros((2, D, n), jnp.float32)
        for q in range(Q):
            v0 = v0 + xp[:, :, 2 * q: 2 * q + n] * h0[q, :D][None, :, None]
            v1 = v1 + xp[:, :, 2 * q + 1: 2 * q + 1 + n] * \
                h1[q, :D][None, :, None]
        u = jnp.concatenate([v0, v1], axis=1)              # (2, M, n)
        # M-point DFT across branches, bins pre-selected (MXU):
        # (C, M) @ (M, n) with frames staying on lanes
        yr = dft_c.T @ u[0] + dft_s.T @ u[1]               # (C, n)
        yi = dft_c.T @ u[1] - dft_s.T @ u[0]
        # rotator e^{-j pi c n} = (-1)^{cn}: flip odd bins at odd frames
        n_odd = (jnp.arange(n, dtype=jnp.int32) & 1).astype(jnp.float32)
        sign = 1.0 - 2.0 * (bin_odd[:, None] * n_odd[None, :])
        yr, yi = yr * sign, yi * sign
        if staged:
            # the TPU kernel emits one extra zero-filled tile for its
            # windowed consumers — mirror it
            z = ((0, 0), (0, pfb_kernel._TF))
            yr, yi = jnp.pad(yr, z), jnp.pad(yi, z)
        return yr, yi

    def tpu_path(x_ri):
        # single fused VMEM-resident kernel: read x once, write y once
        return pfb_kernel.pfb_channelize_fused(x_ri, h0, h1, dft_c, dft_s,
                                               bin_odd, D)

    return jax.lax.platform_dependent(x_ri, tpu=tpu_path, default=xla_path)


def pfb_channelize(x, bank: PfbBank):
    """x: complex (N,) host array or (2, N) float32 planes.
    Returns (yr, yi) float32 (C, n_frames) decimated channel streams."""
    x = np.asarray(x)
    if np.iscomplexobj(x):
        x = np.stack([x.real, x.imag]).astype(np.float32)
    return _pfb_impl(jnp.asarray(x), jnp.asarray(bank.h0),
                     jnp.asarray(bank.h1), jnp.asarray(bank.dft_c),
                     jnp.asarray(bank.dft_s), jnp.asarray(bank.bin_odd),
                     bank.decim)


@partial(jax.jit, static_argnames=("D", "slot_ch"))
def _pfb_snr_impl(x3, h0, h1, dft_c, dft_s, bin_odd, probe_mr, probe_mi,
                  taps_re, taps_im, D: int, slot_ch: int):
    """Staged-input channelize + fused SNR partials:
    (2, F, 128) -> (yr, yi, oe, pe) as pfb_channelize_snr_fused.

    TPU: the single fused kernel (y never re-read for SNR).  Other
    platforms: the XLA channelizer plus jnp partials with identical
    shapes/semantics (values equal up to fp reduction order)."""
    from . import pfb_kernel as pk
    from .snr import PROBE_STRIDE, _probe_grid

    Q = h0.shape[0]
    C = dft_c.shape[1]
    TF = pk._TF

    def tpu_path(x3):
        return pk.pfb_channelize_snr_fused(x3, h0, h1, dft_c, dft_s,
                                           bin_odd, D, probe_mr, probe_mi,
                                           slot_ch)

    def xla_path(x3):
        yr, yi = _pfb_impl(x3, h0, h1, dft_c, dft_s, bin_odd, D)
        G = yr.shape[1] // TF
        # on-energy piece sums: tile t spans slots s0, s0+1 at lane b
        t = np.arange(G)
        s0 = (TF * t) // slot_ch
        b = slot_ch * (s0 + 1) - TF * t
        m0 = jnp.asarray((np.arange(TF)[None, :] < b[:, None])
                         .astype(np.float32))              # (G, TF)
        e = (yr ** 2 + yi ** 2).reshape(C, G, TF)
        oe0 = jnp.einsum("cgl,gl->gc", e, m0)
        oe1 = jnp.einsum("cgl,gl->gc", e, 1.0 - m0)
        oe = jnp.stack([oe0, oe1], axis=-1)                # (G, C, 2)

        # probe energies at every grid position, regrouped per tile
        pall = _probe_grid(yr, yi, taps_re, taps_im)       # (C, npall)
        npall = pall.shape[1]
        k0 = -(-TF * t // PROBE_STRIDE)
        kk = k0[:, None] + np.arange(pk._PC)[None, :]      # (G, _PC)
        pe = pall[:, jnp.asarray(np.minimum(kk, npall - 1).reshape(-1))]
        pe = pe.reshape(C, G, pk._PC).transpose(1, 0, 2)   # (G, C, _PC)
        return yr, yi, oe, pe

    return jax.lax.platform_dependent(x3, tpu=tpu_path, default=xla_path)

