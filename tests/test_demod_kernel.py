"""Bit-exact parity of the fused demod+timing+slicer+pack Pallas kernel
(ops/demod_kernel.py, interpret mode) against the XLA reference chain
quadrature_demod -> recover_symbols(group=512) -> pack_bits_words."""
import numpy as np
import pytest

import jax.numpy as jnp

from gr_bluetooth_tpu.ops import demod, demod_kernel, detect_pallas


def _reference_words(yr, yi, gain, n_sym):
    """XLA chain with the kernel's atan2 polynomial substituted, so the
    comparison is bit-exact (Mosaic has no atan2 primitive; the
    polynomial's own accuracy is tested separately below)."""
    yr, yi = jnp.asarray(yr), jnp.asarray(yi)
    pr = yr[:, 1:] * yr[:, :-1] + yi[:, 1:] * yi[:, :-1]
    pi_ = yi[:, 1:] * yr[:, :-1] - yr[:, 1:] * yi[:, :-1]
    d = gain * demod_kernel.atan2_poly(pi_, pr)
    _, bits = demod.recover_symbols(d, 2.0, n_sym, group=512)
    return np.asarray(detect_pallas.pack_bits_words(bits))


def test_atan2_poly_accuracy():
    rng = np.random.default_rng(7)
    y = rng.normal(0, 3, 20000).astype(np.float32)
    x = rng.normal(0, 3, 20000).astype(np.float32)
    special = np.array([[0, 1], [0, -1], [1, 0], [-1, 0], [0, 0],
                        [1e-30, -1], [-1e-30, 1]], np.float32)
    y = np.concatenate([y, special[:, 0]])
    x = np.concatenate([x, special[:, 1]])
    got = np.asarray(demod_kernel.atan2_poly(jnp.asarray(y),
                                             jnp.asarray(x)))
    ref = np.arctan2(y, x)
    assert np.max(np.abs(got - ref)) < 2e-6


def _stage(yr, n_sym):
    """Pad streams the way pfb_kernel's staged output does: zero frames
    out to (n_tiles-1)*1024 + WL."""
    C, F = yr.shape
    n_t = -(-n_sym // 512)
    need = (n_t - 1) * 1024 + demod_kernel._WL
    if F < need:
        yr = np.pad(yr, ((0, 0), (0, need - F)))
    return yr


@pytest.mark.parametrize("C,n_sym,seed", [
    (8, 2048, 0),          # exact tile multiples
    (8, 2500, 1),          # partial last group
    (3, 700, 2),           # C below the sublane tile, tiny stream
    (16, 512 * 3 + 117, 3),
])
def test_words_match_reference(C, n_sym, seed):
    rng = np.random.default_rng(seed)
    F = 2 * n_sym + 2 + rng.integers(0, 5)
    # GFSK-looking content: smooth phase + noise, non-degenerate metrics
    ph = np.cumsum(rng.normal(0, 0.6, (C, F)), axis=1)
    yr = (np.cos(ph) + rng.normal(0, 0.05, (C, F))).astype(np.float32)
    yi = (np.sin(ph) + rng.normal(0, 0.05, (C, F))).astype(np.float32)

    ref = _reference_words(yr, yi, 1.2732395, n_sym)
    got = np.asarray(demod_kernel.demod_timing_pack(
        jnp.asarray(_stage(yr, n_sym)), jnp.asarray(_stage(yi, n_sym)),
        1.2732395, n_sym, interpret=True))
    assert got.shape == ref.shape
    mism = np.nonzero(got != ref)
    assert got.shape == ref.shape and not mism[0].size, (
        f"word mismatches at {list(zip(*[m[:5] for m in mism]))}")


def test_short_stream_rejected():
    yr = jnp.zeros((8, 100), jnp.float32)
    with pytest.raises(ValueError):
        demod_kernel.demod_timing_pack(yr, yr, 1.0, 4096, interpret=True)
