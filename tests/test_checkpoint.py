"""Checkpoint/resume (SURVEY §5): process half a capture, checkpoint,
resume in a fresh mode object, and match an uninterrupted run exactly."""
import numpy as np

from gr_bluetooth_tpu.io import checkpoint
from gr_bluetooth_tpu.models.piconet import BasicRatePiconet, LowEnergyPiconet
from gr_bluetooth_tpu.models.sniffer import Sniffer
from gr_bluetooth_tpu.testing import PiconetSim, make_piconet_capture
from gr_bluetooth_tpu.utils.log import EventBus

FS, CENTER = 8e6, 2441e6
LAP, UAP = 0x24D952, 0x47


def test_registry_roundtrip(tmp_path):
    pn = BasicRatePiconet(lap=LAP)
    pn.uap, pn.have_uap = UAP, True
    pn.clk_offset, pn.have_clk6 = 0x2A, True
    pn.pattern_indices = [0, 5, 9]
    pn.pattern_channels = [12, 40, 66]
    pn.packets_observed = 3
    pn.clock6_candidates = np.arange(64, dtype=np.int64)
    le = LowEnergyPiconet(aa=0xC0FFEE11)
    le.is_connection, le.crc_init, le.hop_increment = True, 0x123456, 9
    le.interval, le.anchor_clkn, le.ch_map = 6, 44, 0x1FFFFFFFFF

    path = str(tmp_path / "s.npz")
    checkpoint.save_state(path, cursor=321, basic_rate={LAP: pn},
                          low_energy={0xC0FFEE11: le})
    cursor, br, lep = checkpoint.load_state(path)
    assert cursor == 321
    q = br[LAP]
    assert (q.uap, q.have_uap, q.clk_offset, q.have_clk6) == (UAP, True, 0x2A, True)
    assert q.pattern_indices == [0, 5, 9] and q.pattern_channels == [12, 40, 66]
    assert (q.clock6_candidates == pn.clock6_candidates).all()
    l2 = lep[0xC0FFEE11]
    assert l2.is_connection and l2.crc_init == 0x123456
    assert l2.hop_increment == 9 and l2.anchor_clkn == 44
    # CSA#1 prediction works after restore (state is functional, not inert)
    assert l2.predict_channel(60) == le.predict_channel(60)


def test_hop_reversal_state_roundtrip(tmp_path):
    """_addr_consts must be rebuilt so hop()/winnow() work after load."""
    pn = BasicRatePiconet(lap=LAP)
    pn.uap, pn.have_uap = UAP, True
    pn.clk_offset, pn.have_clk6 = 0, True
    pn.pattern_indices = [0]
    pn.pattern_channels = [33]
    pn.packets_observed = 1
    pn.init_hop_reversal()
    path = str(tmp_path / "h.npz")
    checkpoint.save_state(path, basic_rate={LAP: pn})
    _, br, _ = checkpoint.load_state(path)
    q = br[LAP]
    assert q.hop_reversal_inited
    # the live set may still be device-resident; get_* materializes it
    assert (q.clock27_candidates == pn.get_clock27_candidates()).all()
    for clk in (0, 12345, 0x7FFFFFF):
        assert q.hop(clk) == pn.hop(clk)


def test_sniffer_checkpoint_resume_equals_straight_run(tmp_path):
    sim = PiconetSim(lap=LAP, uap=UAP, clk0=0x12780)
    samples, sent = make_piconet_capture(sim, n_slots=256, fs=FS,
                                         center_freq=CENTER, seed=21)
    sps = int(FS / 1e6) * 625

    # uninterrupted reference run
    ref = Sniffer(FS, CENTER, bus=EventBus(), enable_le=False)
    ref.run(samples)
    want = [(p.clkn, p.channel, p.packet_type) for p in ref.decoded]
    assert len(want) >= 5

    # interrupted run: first half, checkpoint, fresh object, second half
    a = Sniffer(FS, CENTER, bus=EventBus(), enable_le=False)
    half_slots = (128 // a.fe.block_slots) * a.fe.block_slots
    a.run(samples[: half_slots * sps + a.fe.overlap_samples])
    path = str(tmp_path / "c.npz")
    a.cursor = half_slots               # resume exactly at the cut
    a.save_state(path)

    b = Sniffer(FS, CENTER, bus=EventBus(), enable_le=False)
    cur = b.restore_state(path)
    assert cur == half_slots
    b.run(samples[cur * sps:], start_clkn=cur)
    got = ([(p.clkn, p.channel, p.packet_type) for p in a.decoded] +
           [(p.clkn, p.channel, p.packet_type) for p in b.decoded])
    # every uninterrupted decode reappears (boundary-straddling packets are
    # seen by both halves; dedupe)
    assert set(want) <= set(got)
