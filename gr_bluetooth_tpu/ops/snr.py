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
    """|H(f - f_rel)|^2 sampled at the L FFT bins of rate fs."""
    H = np.fft.fft(taps, L)
    mag2 = np.abs(H) ** 2
    shift_bins = f_rel / fs * L
    k = int(round(shift_bins))
    if abs(shift_bins - k) > 1e-6:
        # non-integer bin shift: evaluate directly
        f = np.fft.fftfreq(L, d=1.0 / fs)
        t = np.arange(len(taps))
        E = np.exp(-2j * np.pi * np.outer((f - f_rel) / fs, t))
        return np.abs(E @ taps) ** 2
    return np.roll(mag2, k)


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
