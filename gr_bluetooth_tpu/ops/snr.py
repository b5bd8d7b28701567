"""Per-slot, per-channel SNR squelch via one wideband periodogram.

The reference measures on-channel energy as mean |y|^2 after the 500 kHz
channel DDC, and off-channel noise as mean |y|^2 after a 22.5 kHz probe DDC
at +790 kHz (check_snr, lib/multi_block.cc:253-296) — a second full FIR bank
whose tap count scales with fs (tens of thousands of taps at full band).

TPU-native redesign: by Parseval, mean |x*h|^2 = (1/L^2) sum_f |X_f|^2 |H_f|^2,
so one L-point FFT per slot gives *every* channel's on- and off-band energy
as two matmuls  P @ W_on  and  P @ W_off  with precomputed |H|^2 weight
columns — MXU work instead of 79 giant FIRs.  Same gate semantics:
snr_db = 10 log10(on/off) >= threshold.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (BASE_FREQUENCY, CHANNEL_FILTER_CUTOFF,
                         CHANNEL_FILTER_TRANSITION, CHANNEL_WIDTH,
                         NOISE_FILTER_CUTOFF, NOISE_FILTER_TRANSITION,
                         NOISE_PROBE_OFFSET, SYMBOLS_PER_SLOT)
from .channelizer import ChannelBank
from .filters import lowpass_taps

__all__ = ["SnrWeights", "make_snr_weights", "slot_snr"]


@dataclass(frozen=True)
class SnrWeights:
    slot_len: int                 # wideband samples per slot
    on_w: np.ndarray              # (L, C) float32
    off_w: np.ndarray             # (L, C) float32


def _shifted_response(taps: np.ndarray, L: int, f_rel: float, fs: float) -> np.ndarray:
    """|H(f - f_rel)|^2 sampled at the L FFT bins of rate fs.

    H(f_k - f_rel) = FFT{ h[t] e^{+j 2 pi f_rel t / fs} }[k] — exact for any
    (fractional-bin) shift at O(L log L), instead of a dense (L, ntaps)
    DTFT matrix which is ~13 GB at the full 79-channel band."""
    t = np.arange(len(taps))
    mod = taps * np.exp(2j * np.pi * (f_rel / fs) * t)
    return np.abs(np.fft.fft(mod, L)) ** 2


def make_snr_weights(bank: ChannelBank) -> SnrWeights:
    L = SYMBOLS_PER_SLOT * bank.sps
    ch_taps = lowpass_taps(1.0, bank.fs, CHANNEL_FILTER_CUTOFF,
                           CHANNEL_FILTER_TRANSITION)
    nz_taps = lowpass_taps(1.0, bank.fs, NOISE_FILTER_CUTOFF,
                           NOISE_FILTER_TRANSITION)
    C = bank.n_channels
    on_w = np.zeros((L, C), dtype=np.float32)
    off_w = np.zeros((L, C), dtype=np.float32)
    for i, ch in enumerate(bank.channels):
        f_rel = BASE_FREQUENCY + ch * CHANNEL_WIDTH - bank.center_freq
        on_w[:, i] = _shifted_response(ch_taps, L, f_rel, bank.fs)
        off_w[:, i] = _shifted_response(nz_taps, L, f_rel + NOISE_PROBE_OFFSET,
                                        bank.fs)
    return SnrWeights(L, on_w, off_w)


@partial(jax.jit, static_argnames=("slot_len",))
def _slot_snr_impl(x_ri, on_w, off_w, slot_len: int):
    """x_ri: (2, N) float32 IQ planes.  Complex only ever exists as an
    intermediate: the TPU runtime does not support complex buffers at the
    host<->device boundary (transfers/parameters), only inside programs."""
    n_slots = x_ri.shape[1] // slot_len
    xs = x_ri[:, : n_slots * slot_len].reshape(2, n_slots, slot_len)
    X = jnp.fft.fft(jax.lax.complex(xs[0], xs[1]))
    P = (jnp.real(X) ** 2 + jnp.imag(X) ** 2).astype(jnp.float32)
    scale = 1.0 / (slot_len * slot_len)
    on = (P @ on_w) * scale
    off = (P @ off_w) * scale
    snr_db = 10.0 * (jnp.log10(jnp.maximum(on, 1e-30)) -
                     jnp.log10(jnp.maximum(off, 1e-30)))
    return snr_db, on, off


def slot_snr(x, weights: SnrWeights):
    """x: complex wideband block (host) or (2, N) float32 planes;
    returns (snr_db, on, off), each (S, C)."""
    x = np.asarray(x)
    if np.iscomplexobj(x):
        x = np.stack([x.real, x.imag]).astype(np.float32)
    return _slot_snr_impl(jnp.asarray(x), jnp.asarray(weights.on_w),
                          jnp.asarray(weights.off_w), weights.slot_len)


# ------------------------------------------------- stream-based (PFB path)

PROBE_STRIDE = 40                       # probe energy samples per slot: ~31
# the probe's 22.5 kHz band decorrelates in ~44 samples at the 2 Msps
# channel rate, so ~31 strided samples per 625 us slot are near-independent
# — the slot-mean noise estimate keeps its variance while the strided conv
# does 4x less MXU work


@dataclass(frozen=True)
class StreamSnrConsts:
    """Constants for the stream-based squelch (no FFT, no full-rate FIRs).

    on-channel energy comes straight from the channel streams (that is the
    reference's definition: mean |DDC output|^2, multi_block.cc:180-228).
    The off-channel probe at f_c + 790 kHz (multi_block.cc:253-296) is
    evaluated at -210 kHz inside *channel c+1's* stream: a short complex
    band-pass at the 2 Msps channel rate instead of a 16k-tap FIR at the
    full input rate.  `kappa` rescales the probe's equivalent noise
    bandwidth to the reference's 22.5 kHz full-rate probe so the
    on/off ratio (and the 10 dB squelch default) keeps the same meaning
    on a flat noise floor.
    """
    slot_ch: int                  # channel-rate samples per slot
    taps_re: np.ndarray           # (T,) probe band-pass, real part
    taps_im: np.ndarray           # (T,) probe band-pass, imag part
    kappa: float


def make_stream_snr_consts(bank) -> StreamSnrConsts:
    ch_fs = bank.fs / bank.decim
    slot_ch = int(round(SYMBOLS_PER_SLOT * bank.ch_sps))
    # 2x the reference's 10 kHz transition: halves the tap count; kappa
    # below renormalizes the equivalent noise bandwidth so the on/off ratio
    # (and the 10 dB squelch meaning) is unchanged on a flat floor
    g = lowpass_taps(1.0, ch_fs, NOISE_FILTER_CUTOFF,
                     2.0 * NOISE_FILTER_TRANSITION)
    t = np.arange(len(g))
    theta = -2.0 * np.pi * ((NOISE_PROBE_OFFSET - CHANNEL_WIDTH) / ch_fs) * t
    taps_re = (g * np.cos(theta)).astype(np.float32)
    taps_im = (g * np.sin(theta)).astype(np.float32)
    # reference probe: 22.5 kHz cut / 10 kHz transition at the full rate
    h_ref = lowpass_taps(1.0, bank.fs, NOISE_FILTER_CUTOFF,
                         NOISE_FILTER_TRANSITION)
    h_ch = lowpass_taps(1.0, bank.fs, CHANNEL_FILTER_CUTOFF,
                        CHANNEL_FILTER_TRANSITION)
    # white-noise energies: reference off = sigma^2 sum h_ref^2 ; ours =
    # sigma^2 sum h_ch^2 * sum g^2 (probe runs on the channelized stream)
    kappa = float(np.sum(h_ref ** 2) /
                  (np.sum(h_ch ** 2) * np.sum(g ** 2)))
    return StreamSnrConsts(slot_ch, taps_re, taps_im, kappa)


def _probe_grid(yr, yi, taps_re, taps_im):
    """Probe band-pass energy at every PROBE_STRIDE-grid position of the
    given complex streams (all rows kept): (R, n) -> (R, np_) with
    np_ = (n - Tp)//stride + 1, taps zero-padded to Tp = stride-multiple.

    A shifted (R, n/40, 40) @ (40, A) matmuls + a diagonal sum — XLA's
    strided conv_general_dilated lowering cost ~0.4 ms/block on v5e
    where this matmul form is MXU noise (round-4 profile)."""
    R, n = yr.shape
    T = taps_re.shape[0]
    A = -(-T // PROBE_STRIDE)
    Tp = A * PROBE_STRIDE
    tr = jnp.pad(taps_re, (0, Tp - T)).reshape(A, PROBE_STRIDE).T
    ti = jnp.pad(taps_im, (0, Tp - T)).reshape(A, PROBE_STRIDE).T
    m40 = n // PROBE_STRIDE
    np_ = (n - Tp) // PROBE_STRIDE + 1
    yv_r = yr[:, : m40 * PROBE_STRIDE].reshape(R, m40, PROBE_STRIDE)
    yv_i = yi[:, : m40 * PROBE_STRIDE].reshape(R, m40, PROBE_STRIDE)

    def dsum(M):                                           # (R, m40, A)
        acc = M[:, 0:np_, 0]
        for a in range(1, A):
            acc = acc + M[:, a: a + np_, a]
        return acc                                         # (R, np_)

    p_re = dsum(yv_r @ tr) - dsum(yv_i @ ti)
    p_im = dsum(yv_r @ ti) + dsum(yv_i @ tr)
    return p_re ** 2 + p_im ** 2                           # (R, np_)


@partial(jax.jit, static_argnames=("slot_ch", "kappa"))
def _stream_snr_impl(yr, yi, taps_re, taps_im, *, slot_ch: int, kappa: float):
    """(C+1, n) channel streams (last row = probe row above the top
    channel) -> (S, C) per-slot SNR in dB.

    The strided probe conv is expressed as A shifted (C, m40, 40) @
    (40, A) matmuls plus a diagonal sum — XLA's strided
    conv_general_dilated lowering cost ~0.4 ms/block on v5e where the
    matmul form is MXU noise (round-4 profile).  Taps are zero-padded to
    a multiple of the 40-sample stride; the up-to-(A-1) tail windows this
    drops fall beyond the last slot's per_slot mean, so slot outputs are
    unchanged except that severely short tails (small S) edge-pad one
    slot earlier."""
    Cp, n = yr.shape
    C = Cp - 1
    S = n // slot_ch
    m = S * slot_ch
    on = (yr[:C, :m] ** 2 + yi[:C, :m] ** 2).reshape(C, S, slot_ch).mean(-1)

    # probe: shared band-pass on rows 1..C (neighbor of each channel)
    pe = _probe_grid(yr[1:, :m], yi[1:, :m], taps_re, taps_im)
    per_slot = slot_ch // PROBE_STRIDE
    Sp = min(S, pe.shape[1] // per_slot)
    off = pe[:, : Sp * per_slot].reshape(C, Sp, per_slot).mean(-1)
    off = jnp.pad(off, ((0, 0), (0, S - Sp)), mode="edge") * kappa

    snr_db = 10.0 * (jnp.log10(jnp.maximum(on, 1e-30)) -
                     jnp.log10(jnp.maximum(off, 1e-30)))
    return snr_db.T, on.T, off.T                           # (S, C)


def assemble_fused_snr(oe, pe, *, S: int, slot_ch: int, kappa: float,
                       C: int, taps_len: int):
    """(S, C) slot SNR from the PFB kernel's fused partials
    (pfb_kernel.pfb_channelize_snr_fused): oe (G, C+1, 2) per-tile
    on-energy piece sums, pe (G, C+1, _PC) probe energies at the tiles'
    grid positions.  Pure segment sums over a few thousand partials —
    the full y stream is never re-read.

    Same slot semantics as _stream_snr_impl: on = mean |y|^2 per slot,
    off = per-slot mean of the probe energies (grouped by position index
    k in runs of slot_ch // PROBE_STRIDE, identical grouping)."""
    from . import pfb_kernel as pk

    G = oe.shape[0]
    t = np.arange(G)
    s0 = (pk._TF * t) // slot_ch
    ids = np.minimum(np.stack([s0, s0 + 1], 1).reshape(-1), S)
    vals = oe.transpose(0, 2, 1).reshape(2 * G, -1)
    # NOT indices_are_sorted: the interleaved [s0, s0+1] pairs are provably
    # unsorted whenever slot_ch > _TF (e.g. 1250 > 1024 gives [0,1,0,1,..])
    # and violating the sortedness promise is UB in XLA scatter lowering
    on = jax.ops.segment_sum(vals, jnp.asarray(ids), num_segments=S + 1)
    on = on[:S, :C] / slot_ch                              # (S, C)

    Tp = -(-taps_len // PROBE_STRIDE) * PROBE_STRIDE
    m = S * slot_ch
    np_ = (m - Tp) // PROBE_STRIDE + 1
    if np_ < 1:
        raise ValueError("block too short for the probe band-pass")
    k0 = -(-pk._TF * t // PROBE_STRIDE)
    j = np.arange(pk._PC)
    kk = k0[:, None] + j[None, :]
    valid = ((PROBE_STRIDE * kk < pk._TF * (t[:, None] + 1)) &
             (kk < np_) & (j[None, :] < 26))
    pids = np.where(valid, kk, np_).reshape(-1)
    pvals = pe.transpose(0, 2, 1).reshape(G * pk._PC, -1)
    pev = jax.ops.segment_sum(pvals, jnp.asarray(pids),
                              num_segments=np_ + 1)[:np_, 1:C + 1]
    per_slot = slot_ch // PROBE_STRIDE
    Sp = min(S, np_ // per_slot)
    off = pev[: Sp * per_slot].reshape(Sp, per_slot, C).mean(1)
    off = jnp.pad(off, ((0, S - Sp), (0, 0)), mode="edge") * kappa

    snr_db = 10.0 * (jnp.log10(jnp.maximum(on, 1e-30)) -
                     jnp.log10(jnp.maximum(off, 1e-30)))
    return snr_db                                          # (S, C)
