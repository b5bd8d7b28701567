"""Wideband -> per-channel DDC bank as one MXU convolution.

The reference runs a separate freq_xlating_fir_filter_ccf per channel inside
a sequential for-loop over channels each slot (lib/multi_block.cc:180-228,
305-342; the dominant hot loop per SURVEY §3).  TPU-native inversion: all
channels become one batched strided convolution —

    y_c[n] = rot_c[n] * sum_t  h[t] e^{-j 2 pi f_c t / fs}  x[nD + t]

The inner sum over t for all (c, n) is a single lax.conv_general_dilated
with stride D over a 2-feature (re, im) input and 2C-feature output: XLA
lowers it onto the MXU.  The per-output phase rotator is evaluated with
exact integer modular arithmetic (f_c * D / fs is rational with denominator
sps when the center frequency sits on the 1 MHz channel grid), so there is
no f32 phase drift over arbitrarily long streams.

Filter design and channel selection mirror multi_block (multi_block.cc:62-84,
305-342): Hann low-pass, 500 kHz cutoff / 300 kHz transition, decimation
D = floor(sps/2), channels fitting in bandwidth with >= 0.9 MHz margin.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (BASE_FREQUENCY, CHANNEL_FILTER_CUTOFF,
                         CHANNEL_FILTER_TRANSITION, CHANNEL_WIDTH)
from .filters import lowpass_taps

__all__ = ["ChannelBank", "make_bank", "channelize", "select_channels"]


def select_channels(fs: float, center_freq: float) -> tuple:
    """BR channels fitting in bandwidth with >= 0.9 MHz margin
    (multi_block.cc:305-324)."""
    center = (center_freq - BASE_FREQUENCY) / CHANNEL_WIDTH
    bw = fs / CHANNEL_WIDTH
    low = max(0, int(center - bw / 2 + 0.45 + 1))
    high = min(78, int(center + bw / 2 - 0.45))
    if high < low:
        raise ValueError("no BR channels fit in this bandwidth")
    return tuple(range(low, high + 1))


@dataclass(frozen=True)
class ChannelBank:
    fs: float
    center_freq: float
    sps: int                      # wideband samples per symbol
    decim: int                    # DDC decimation D = sps // 2
    ch_sps: float                 # channel-rate samples per symbol
    channels: tuple               # BR channel numbers covered
    ntaps: int
    kernel: np.ndarray            # (2C, 2, T) float32 conv kernel
    rot_q: np.ndarray             # (C,) int32: per-channel rotator step mod sps
    demod_gain: float

    @property
    def n_channels(self) -> int:
        return len(self.channels)


def make_bank(fs: float, center_freq: float) -> ChannelBank:
    sps = int(round(fs / 1e6))
    if abs(fs - sps * 1e6) > 1e-3 or sps < 2:
        raise ValueError("sample rate must be an integer multiple of 1 Msps >= 2")
    if abs((center_freq / 1e6) - round(center_freq / 1e6)) > 1e-9:
        raise ValueError("center frequency must sit on the 1 MHz channel grid")
    decim = sps // 2
    ch_sps = sps / decim
    channels = select_channels(fs, center_freq)

    taps = lowpass_taps(1.0, fs, CHANNEL_FILTER_CUTOFF, CHANNEL_FILTER_TRANSITION)
    T = len(taps)
    t = np.arange(T)
    C = len(channels)
    kernel = np.zeros((2 * C, 2, T), dtype=np.float32)
    rot_q = np.zeros(C, dtype=np.int32)
    for i, ch in enumerate(channels):
        f_rel = BASE_FREQUENCY + ch * CHANNEL_WIDTH - center_freq
        m = int(round(f_rel / 1e6))                      # integer MHz offset
        ph = -2.0 * np.pi * (f_rel / fs) * t
        kr = (taps * np.cos(ph)).astype(np.float32)
        ki = (taps * np.sin(ph)).astype(np.float32)
        kernel[2 * i + 0, 0] = kr
        kernel[2 * i + 0, 1] = -ki
        kernel[2 * i + 1, 0] = ki
        kernel[2 * i + 1, 1] = kr
        rot_q[i] = (-m * decim) % sps                    # cycles*sps per step
    demod_gain = ch_sps / (np.pi / 2.0)
    return ChannelBank(fs, center_freq, sps, decim, ch_sps, channels,
                       T, kernel, rot_q, float(demod_gain))


@partial(jax.jit, static_argnames=("decim", "sps"))
def _channelize_impl(x_ri, kernel, rot_q, n0, decim: int, sps: int):
    out = jax.lax.conv_general_dilated(
        x_ri, kernel,
        window_strides=(decim,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )  # (1, 2C, n_out)
    n_out = out.shape[-1]
    y = out[0].reshape(-1, 2, n_out)
    yr, yi = y[:, 0, :], y[:, 1, :]
    # exact modular rotator: phase_n = 2 pi * ((n0+n) * q mod sps) / sps
    n = (n0 + jnp.arange(n_out, dtype=jnp.int32)) % sps
    r = (n[None, :] * (rot_q[:, None] % sps)) % sps
    ang = (2.0 * jnp.pi / sps) * r.astype(jnp.float32)
    cr, ci = jnp.cos(ang), jnp.sin(ang)
    return yr * cr - yi * ci, yr * ci + yi * cr


def channelize(x, bank: ChannelBank, n0: int = 0):
    """x: complex wideband samples (jax or numpy, shape (N,)).

    Returns (yr, yi) float32 arrays of shape (C, n_out) — the decimated
    complex channel streams; n0 is the absolute index of x[0] in the stream
    *in decimated output units* times decim (i.e. pass the count of wideband
    samples already consumed, divided by decim).
    """
    x = jnp.asarray(x)
    x_ri = jnp.stack([jnp.real(x), jnp.imag(x)]).astype(jnp.float32)[None]
    return _channelize_impl(x_ri, jnp.asarray(bank.kernel),
                            jnp.asarray(bank.rot_q), n0,
                            decim=bank.decim, sps=bank.sps)
