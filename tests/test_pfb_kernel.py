"""Fused Pallas filterbank kernel (ops/pfb_kernel.py) vs the XLA
formulation (ops/pfb.py:_pfb_impl): exact same math, so parity is tight
numeric equality, including tile edges (the overlapping-window DMA)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gr_bluetooth_tpu.ops import pfb, pfb_kernel

ON_TPU = jax.default_backend() == "tpu"
_MODES = [True] + ([False] if ON_TPU else [])


@pytest.fixture(scope="module")
def bank():
    return pfb.make_pfb_bank(8e6, 2441e6)


def _run_both(bank, x, interpret):
    args = (jnp.asarray(x), jnp.asarray(bank.h0), jnp.asarray(bank.h1),
            jnp.asarray(bank.dft_c), jnp.asarray(bank.dft_s),
            jnp.asarray(bank.bin_odd))
    yr0, yi0 = pfb._pfb_impl(*args, bank.decim)
    yr1, yi1 = pfb_kernel.pfb_channelize_fused(*args, bank.decim,
                                               interpret=interpret)
    return (np.asarray(yr0), np.asarray(yi0)), (np.asarray(yr1),
                                                np.asarray(yi1))


@pytest.mark.parametrize("interpret", _MODES,
                         ids=["interpret"] + ([] if len(_MODES) == 1
                                              else ["mosaic"]))
@pytest.mark.parametrize("n_frames", [50, 1024, 1500, 2048, 2100])
def test_fused_matches_xla(bank, interpret, n_frames):
    rng = np.random.default_rng(n_frames)
    Q = bank.h0.shape[0]
    N = (n_frames + 2 * Q) * bank.decim
    x = rng.standard_normal((2, N)).astype(np.float32)
    (yr0, yi0), (yr1, yi1) = _run_both(bank, x, interpret)
    assert yr0.shape == yr1.shape == (bank.n_channels + 1, n_frames)
    np.testing.assert_allclose(yr1, yr0, rtol=0, atol=2e-5)
    np.testing.assert_allclose(yi1, yi0, rtol=0, atol=2e-5)


@pytest.mark.parametrize("interpret", _MODES,
                         ids=["interpret"] + ([] if len(_MODES) == 1
                                              else ["mosaic"]))
def test_fused_odd_tail_samples(bank, interpret):
    # N not a multiple of D: the ragged tail must be ignored identically
    rng = np.random.default_rng(9)
    Q = bank.h0.shape[0]
    N = (1030 + 2 * Q) * bank.decim + 3
    x = rng.standard_normal((2, N)).astype(np.float32)
    (yr0, yi0), (yr1, yi1) = _run_both(bank, x, interpret)
    np.testing.assert_allclose(yr1, yr0, rtol=0, atol=2e-5)
    np.testing.assert_allclose(yi1, yi0, rtol=0, atol=2e-5)
