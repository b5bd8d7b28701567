"""Polyphase DFT filterbank vs dense strided conv bank parity.

Both implement the same uniform filterbank (same Hann prototype, same DDC
phase convention, same decimation) so their outputs must agree to float
round-off; the PFB is the fast path the frontend uses for even rates.
"""
import numpy as np
import pytest

from gr_bluetooth_tpu.ops import channelizer, pfb


@pytest.mark.parametrize("fs,center", [(4e6, 2441e6), (8e6, 2441e6),
                                       (8e6, 2476e6)])
def test_pfb_matches_conv_bank(fs, center, rng):
    cb = channelizer.make_bank(fs, center)
    pb = pfb.make_pfb_bank(fs, center)
    assert cb.channels == pb.channels
    N = 120000
    x = (rng.standard_normal(N) + 1j * rng.standard_normal(N)) \
        .astype(np.complex64)
    yr1, yi1 = map(np.asarray, channelizer.channelize(x, cb))
    yr2, yi2 = map(np.asarray, pfb.pfb_channelize(x, pb))
    C = len(cb.channels)
    yr2, yi2 = yr2[:C], yi2[:C]     # last PFB row is the SNR probe row
    n = min(yr1.shape[1], yr2.shape[1])
    ref = np.abs(yr1).max()
    assert np.abs(yr1[:, :n] - yr2[:, :n]).max() < 1e-4 * max(ref, 1.0)
    assert np.abs(yi1[:, :n] - yi2[:, :n]).max() < 1e-4 * max(ref, 1.0)


def test_pfb_rejects_odd_rates():
    with pytest.raises(ValueError):
        pfb.make_pfb_bank(3e6, 2441e6)


def test_frontend_uses_pfb_for_even_rates():
    from gr_bluetooth_tpu.models.frontend import FrontEnd
    fe = FrontEnd(8e6, 2441e6)
    assert isinstance(fe.bank, pfb.PfbBank)
    fe3 = FrontEnd(3e6, 2441e6)
    assert isinstance(fe3.bank, channelizer.ChannelBank)
