"""2-D (time x chan) sharded frontend over the virtual 8-device CPU mesh:
per-channel-group hit tables merged on the host must reproduce the
unsharded stream exactly — classic AND LE, including packets on channels
in different groups, in the overlap (duplicated-coverage) region, and at
shard/superblock boundaries."""
import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from gr_bluetooth_tpu.constants import SYMBOLS_PER_SLOT
from gr_bluetooth_tpu.models.frontend import FrontEnd
from gr_bluetooth_tpu.parallel.sharded2d import Sharded2DFrontEnd
from gr_bluetooth_tpu.testing import PiconetSim, make_piconet_capture

FS, CENTER = 8e6, 2441e6
LAP, UAP = 0x24D952, 0x47


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]).reshape(4, 2), ("time", "chan"))


def _capture_with_le(n_slots):
    """Hop-consistent classic capture (channels span the whole band, so
    hits land in every channel group) + two LE advertising packets on LE
    channels that fall in DIFFERENT groups."""
    from gr_bluetooth_tpu.core import packets as P
    from gr_bluetooth_tpu.ops import synth as S

    sim = PiconetSim(lap=LAP, uap=UAP, clk0=0x12780)
    samples, sent = make_piconet_capture(sim, n_slots=n_slots, fs=FS,
                                         center_freq=CENTER, seed=7,
                                         tx_slots=range(0, n_slots - 6))
    sps = int(FS // 1e6)
    bits = P.encode_le_adv(0xC0FFEE11, 17, 2, b"\x01\x02\x03\x04")
    le_bits = np.concatenate([bits, np.zeros(8, np.uint8)])
    plans = []
    le_slots = (8, n_slots - 10)
    for ch, slot in zip((38, 42), le_slots):     # 2440 / 2444 MHz
        plans.append(S.PlannedPacket(
            channel=ch, start_sample=slot * SYMBOLS_PER_SLOT * sps,
            bits=le_bits))
    le = S.synthesize_capture(
        plans, n_samples=n_slots * SYMBOLS_PER_SLOT * sps, fs=FS,
        center_freq=CENTER, noise_std=0.0, seed=1)
    return samples + le, sent, le_slots


def _hit_sets(results):
    classic = {(h.clkn, h.channel, h.lap) for r in results for h in r.hits}
    le = {(h.clkn, h.channel) for r in results for h in r.le_hits}
    return classic, le


def test_channel_groups_are_contiguous_overlapping():
    fe = FrontEnd(FS, CENTER, block_slots=8)
    mesh1 = Mesh(np.array(jax.devices()[:2]).reshape(1, 2),
                 ("time", "chan"))
    sfe = Sharded2DFrontEnd(fe, mesh1)
    C = fe.bank.n_channels
    Cg = sfe.group_size
    assert Cg == -(-C // 2)
    # union of valid ranges covers every channel exactly once
    covered = []
    for g in range(2):
        covered += list(range(sfe.starts[g] + sfe.valid_start[g],
                              sfe.starts[g] + Cg))
    assert covered == list(range(C))


def test_2d_sharded_matches_unsharded(mesh):
    """Two superblocks + a partial third over the 4x2 mesh."""
    fe = FrontEnd(FS, CENTER, block_slots=16, enable_le=True)
    n_slots = fe.block_slots * 4 * 2 + 8
    samples, sent, le_slots = _capture_with_le(n_slots)

    sfe = Sharded2DFrontEnd(fe, mesh)
    assert sfe.with_le
    # LE rows really span both groups
    assert all(sfe.le_maps[g] for g in range(2))

    sharded_classic, sharded_le = _hit_sets(sfe.process(samples))
    unsharded_classic, unsharded_le = _hit_sets(list(fe.stream(samples)))

    assert unsharded_classic, "capture should produce classic hits"
    assert sharded_classic == unsharded_classic
    assert len(unsharded_le) >= 2, "both LE packets should be detected"
    assert sharded_le == unsharded_le
    # hits land in BOTH channel groups (the capture hops the whole band)
    boundary = sfe.starts[1] + sfe.valid_start[1]
    chans = {c for _, c, _ in sharded_classic}
    low = {c for c in chans if c < fe.bank.channels[boundary]}
    high = chans - low
    assert low and high


def test_2d_window_decode_parity(mesh):
    """Merged win_row indices point at the right windows: a hit's symbol
    window from the 2-D sharded result is bit-identical to the unsharded
    path's (so downstream packet decode sees the same air bits)."""
    fe = FrontEnd(FS, CENTER, block_slots=16, enable_le=True)
    n_slots = fe.block_slots * 4 + 8
    samples, sent, _ = _capture_with_le(n_slots)
    sfe = Sharded2DFrontEnd(fe, mesh)

    def windows(results):
        return {(h.clkn, h.channel): fe.packet_symbols(r, h)
                for r in results for h in r.hits}

    a = windows(sfe.process(samples))
    b = windows(list(fe.stream(samples)))
    assert a and set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])
