"""Hop-selection kernel tests: spec structure + winnowing behavior."""
import numpy as np

from gr_bluetooth_tpu.constants import SEQUENCE_LENGTH
from gr_bluetooth_tpu.core import hop


def _ac():
    return hop.address_precalc((0x47 << 24 | 0x9E8B33) & 0xFFFFFFF)


def test_perm5_is_permutation():
    z = np.arange(32)
    for p_high, p_low in [(0, 0), (0x1F, 0x1FF), (0x12, 0x0A5), (0x07, 0x155)]:
        out = hop.perm5(z, p_high, p_low)
        assert sorted(out.tolist()) == list(range(32))


def test_perm5_identity_when_no_controls():
    assert np.array_equal(hop.perm5(np.arange(32), 0, 0), np.arange(32))


def test_hop_segment_structure():
    """Spec §2.6: within a 32-hop segment (even slots of x=0..31) every
    channel appears at most once, and all hops stay within 0..78."""
    ac = _ac()
    seq = hop.hop_sequence_block(0, 64, ac)
    assert seq.min() >= 0 and seq.max() <= 78
    even = seq[0::2]  # one per x value
    assert len(set(even.tolist())) == 32


def test_afh_mode_repeats_even_slot():
    ac = _ac()
    seq = hop.hop_sequence_block(0, 128, ac, afh=True)
    assert np.array_equal(seq[0::2], seq[1::2])


def test_channel_distribution_uniformish():
    ac = _ac()
    seq = hop.hop_sequence_block(0, 79 * 1024, ac)
    counts = np.bincount(seq, minlength=79)
    assert counts.min() > 0  # every channel used


def test_aliased_channel_range():
    ch = hop.aliased_channel(np.arange(79))
    assert ch.min() >= 26 and ch.max() <= 50


def test_winnow_recovers_planted_clock():
    """Plant a clock, observe (offset, channel) pairs, winnow to uniqueness."""
    ac = _ac()
    rng = np.random.default_rng(7)
    obs_times = np.sort(rng.choice(5000, size=24, replace=False))
    first_clock = int(rng.integers(0, SEQUENCE_LENGTH))  # clock at first packet
    offsets = obs_times - obs_times[0]
    obs_channels = hop.hop((first_clock + offsets) % SEQUENCE_LENGTH, ac)

    cands = hop.init_candidates(int(obs_channels[0]), first_clock & 0x3F, ac)
    assert first_clock in cands
    for off, ch in zip(offsets[1:], obs_channels[1:]):
        cands = hop.winnow(cands, int(off), int(ch), ac)
        if len(cands) == 1:
            break
    assert len(cands) == 1 and cands[0] == first_clock


def test_winnow_aliased_mode():
    ac = _ac()
    rng = np.random.default_rng(11)
    first_clock = int(rng.integers(0, SEQUENCE_LENGTH))
    offsets = np.sort(rng.choice(8000, size=40, replace=False))
    offsets -= offsets[0]
    chans = hop.aliased_channel(hop.hop((first_clock + offsets) % SEQUENCE_LENGTH, ac))

    cands = hop.init_candidates(int(chans[0]), first_clock & 0x3F, ac, aliased=True)
    assert first_clock in cands
    for off, ch in zip(offsets[1:], chans[1:]):
        cands = hop.winnow(cands, int(off), int(ch), ac, aliased=True)
        if len(cands) <= 1:
            break
    assert first_clock in cands
