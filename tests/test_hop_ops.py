"""On-device CLK1-27 winnowing (ops/hop_ops.py) must produce candidate
sets identical to the host numpy reference (core/hop.py) — randomized
addresses/patterns, all four (aliased, afh) variants — and slot into the
piconet engine transparently."""
import numpy as np
import pytest

from gr_bluetooth_tpu.constants import SEQUENCE_LENGTH
from gr_bluetooth_tpu.core import hop
from gr_bluetooth_tpu.ops import hop_ops


def _host_chain(address, clk6, pattern, aliased, afh):
    """Reference chain: init_candidates + sequential winnow."""
    ac = hop.address_precalc(address)
    cands = hop.init_candidates(pattern[0][1], clk6, ac,
                                aliased=aliased, afh=afh)
    for off, ch in pattern[1:]:
        cands = hop.winnow(cands, off, ch, ac, aliased=aliased, afh=afh)
    return cands


def _device_chain(address, clk6, pattern, aliased, afh):
    w = hop_ops.DeviceWinnower(address, clk6, pattern[0][1],
                               aliased=aliased, afh=afh)
    for off, ch in pattern[1:]:
        w.winnow(off, ch)
    return w.candidates(), w.count


@pytest.mark.parametrize("aliased,afh", [(False, False), (True, False),
                                         (False, True), (True, True)])
def test_device_matches_host(aliased, afh):
    rng = np.random.default_rng(hash((aliased, afh)) & 0xFFFF)
    for _ in range(3):
        address = int(rng.integers(0, 1 << 28))
        clk0 = int(rng.integers(0, SEQUENCE_LENGTH))
        clk6 = clk0 & 0x3F
        ac = hop.address_precalc(address)

        # a hop-consistent observation pattern (offsets from clk0)
        def obs(off):
            ch = int(hop.hop((clk0 + off) & (SEQUENCE_LENGTH - 1), ac,
                             afh=afh))
            if aliased:
                ch = int(hop.aliased_channel(ch))
            return (off, ch)

        pattern = [obs(o) for o in [0, 2, 5, 9, 14, 27, 33]]

        want = _host_chain(address, clk6, pattern, aliased, afh)
        got, count = _device_chain(address, clk6, pattern, aliased, afh)
        assert count == len(got)
        np.testing.assert_array_equal(np.sort(want), np.sort(got))
        assert clk0 in set(got.tolist())


def test_device_winnower_random_observations():
    """Random (offset, channel) pairs — including eliminations down to the
    empty set — stay bit-identical to the host path."""
    rng = np.random.default_rng(77)
    address = 0x4724D952
    clk6 = 0x12
    ac = hop.address_precalc(address & 0xFFFFFFF)
    first_ch = int(hop.hop(clk6, ac))
    w = hop_ops.DeviceWinnower(address & 0xFFFFFFF, clk6, first_ch)
    cands = hop.init_candidates(first_ch, clk6, ac)
    np.testing.assert_array_equal(np.sort(w.candidates()), np.sort(cands))
    for _ in range(6):
        off = int(rng.integers(1, 1000))
        ch = int(rng.integers(0, 79))
        n = w.winnow(off, ch)
        cands = hop.winnow(cands, off, ch, ac)
        assert n == len(cands)
        np.testing.assert_array_equal(np.sort(w.candidates()), np.sort(cands))
        if n == 0:
            break


def test_piconet_uses_device_path():
    """init_hop_reversal through the device winnower behaves identically to
    the host path at the piconet level (candidate sets, acquisition state,
    clock offset)."""
    from gr_bluetooth_tpu.models.piconet import BasicRatePiconet

    lap, uap = 0x24D952, 0x47
    clk0 = 0x12780
    ac = hop.address_precalc(((uap << 24) | lap) & 0xFFFFFFF)
    # offsets spread across high clock bits to break candidate twins
    offsets = [0, 1, 2, 3, 5, 8, 13, 21, 1000, 32771, 65539, 131072,
               (1 << 17) + 3, 1 << 20, (1 << 24) + 7]

    def make(use_device):
        pn = BasicRatePiconet(lap=lap)
        pn.uap = uap
        pn.have_uap = pn.have_clk6 = True
        pn.first_pkt_time = 0
        pn.clk_offset = clk0 & 0x3F
        for off in offsets:
            pn.pattern_indices.append(off)
            pn.pattern_channels.append(
                int(hop.hop((clk0 + off) & (SEQUENCE_LENGTH - 1), ac)))
            pn.packets_observed += 1
        pn.init_hop_reversal(use_device=use_device)
        pn.winnow()
        return pn

    dev = make(True)
    host = make(False)
    assert dev.have_clk27 == host.have_clk27
    dc, hc = dev.get_clock27_candidates(), host.get_clock27_candidates()
    np.testing.assert_array_equal(np.sort(dc), np.sort(hc))
    assert clk0 in set(dc.tolist())
    if dev.have_clk27:
        assert dev.clk_offset == host.clk_offset == clk0
        # once acquired the mask is materialized; the winnower is gone
        assert dev._winnower is None
