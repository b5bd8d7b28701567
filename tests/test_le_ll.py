"""LE link layer: CRC-24, CSA#1 channel selection, connection following.

New capability vs the reference (its low_energy_piconet is an empty stub,
lib/piconet_impl.cc:551-585, and its LE packet layer checks no CRC) — so
these are self-consistency + spec-structure tests, not parity tests.
"""
import numpy as np
import pytest

from gr_bluetooth_tpu.core import le_ll, packets
from gr_bluetooth_tpu.core.le_tables import LE_INDEX2CHAN, index2freq, freq2index
from gr_bluetooth_tpu.models.piconet import LowEnergyPiconet


# ------------------------------------------------------------------ CRC-24

def test_crc24_zero_stream():
    # all-zero data with zero init stays zero
    assert int(le_ll.crc24(np.zeros(40, np.uint8), 0)) == 0


def test_crc24_single_bit_positions():
    # one bit at the end of the stream: register = poly taps after 1 shift
    bits = np.zeros(1, np.uint8)
    bits[0] = 1
    assert int(le_ll.crc24(bits, 0)) == 0x00065B


def test_crc24_roundtrip_check():
    rng = np.random.default_rng(0)
    for init in (le_ll.ADV_CRC_INIT, 0x123456, 0):
        data = rng.integers(0, 2, 128).astype(np.uint8)
        frame = np.concatenate([data, le_ll.crc24_bits(data, init)])
        assert le_ll.crc24_ok(frame, init)
        bad = frame.copy()
        bad[17] ^= 1
        assert not le_ll.crc24_ok(bad, init)


def test_crc24_vectorized_matches_scalar():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 2, (5, 64)).astype(np.uint8)
    batch = le_ll.crc24(data, 0x555555)
    for i in range(5):
        assert int(le_ll.crc24(data[i], 0x555555)) == int(batch[i])


# ------------------------------------------------------------------ CSA#1

def test_csa1_full_map_is_plain_mod():
    chm = (1 << 37) - 1
    seq = le_ll.csa1_sequence(0, 7, chm, 37)
    assert sorted(seq.tolist()) == list(range(37))      # hop 7 visits all
    assert seq[0] == 7 and seq[1] == 14


def test_csa1_remapping():
    # only channels {0, 5, 9} used
    chm = (1 << 0) | (1 << 5) | (1 << 9)
    used = le_ll.used_channels(chm)
    assert used.tolist() == [0, 5, 9]
    for unmapped in range(37):
        ch = int(le_ll.csa1_channel(np.int64(unmapped), chm))
        if chm >> unmapped & 1:
            assert ch == unmapped
        else:
            assert ch == used[unmapped % 3]


def test_csa1_sequence_deterministic_period():
    chm = (1 << 37) - 1
    a = le_ll.csa1_sequence(0, 11, chm, 74)
    # CSA#1 with a full map has period 37
    assert np.array_equal(a[:37], a[37:])


# ------------------------------------------------------- packets + CRC

def test_encode_le_adv_crc_validates():
    bits = packets.encode_le_adv(0x8E89BED6, 37, 0,
                                 b"\x11\x22\x33\x44\x55\x66hello")
    pkt = packets.LePacket(symbols=bits, freq=2402e6)
    assert pkt.crc_rx is not None
    assert pkt.crc_ok()


def test_encode_le_adv_corruption_fails_crc():
    bits = packets.encode_le_adv(0x8E89BED6, 37, 0,
                                 b"\x11\x22\x33\x44\x55\x66hello")
    bits = bits.copy()
    bits[60] ^= 1                     # flip a payload bit
    pkt = packets.LePacket(symbols=bits, freq=2402e6)
    assert not pkt.crc_ok()


def test_encode_le_data_crc_with_crcinit():
    init = 0xABCDEF
    bits = packets.encode_le_data(0x50655F3A, 5, llid=2,
                                  payload=b"\x01\x02\x03", crc_init=init)
    pkt = packets.LePacket(symbols=bits, freq=index2freq(5))
    assert pkt.index == 5 and pkt.llid == 2 and pkt.length == 3
    assert pkt.crc_ok(init)
    assert not pkt.crc_ok(0x000000)


def test_connect_req_fields_roundtrip():
    from gr_bluetooth_tpu.testing import LeConnectionSim
    sim = LeConnectionSim()
    pkt = packets.LePacket(symbols=sim.connect_req_bits(), freq=2426e6)
    assert pkt.pdu_type == 5
    f = pkt.connect_req_fields()
    assert f is not None
    assert f["aa"] == sim.conn_aa
    assert f["crc_init"] == sim.crc_init
    assert f["hop"] == sim.hop_increment
    assert f["interval"] == sim.interval
    assert f["ch_map"] == sim.ch_map
    assert f["win_offset"] == sim.win_offset
    assert pkt.crc_ok()


def test_index_freq_maps_inverse():
    for idx in range(40):
        assert freq2index(index2freq(idx)) == idx


# ------------------------------------------------- connection follower

def test_low_energy_piconet_follows_connection():
    from gr_bluetooth_tpu.testing import LeConnectionSim
    sim = LeConnectionSim(hop_increment=9, interval=10, win_offset=3)
    req = packets.LePacket(symbols=sim.connect_req_bits(), freq=2426e6)
    pn = LowEnergyPiconet(aa=sim.conn_aa)
    pn.from_connect_req(req.connect_req_fields(), clkn=100)
    assert pn.is_connection and pn.crc_init == sim.crc_init
    # channel prediction matches the simulator's CSA#1 for every event
    for ev in range(40):
        assert pn.channel_for_event(ev) == sim.data_channel(ev)
    # event timing: anchor at 100 + 2*(1+3); events every 2*interval slots
    anchor = 100 + 2 * (1 + 3)
    assert pn.event_for_clkn(anchor) == 0
    assert pn.event_for_clkn(anchor + 2 * 10) == 1
    assert pn.event_for_clkn(anchor + 7 * 2 * 10 + 3) == 7


def test_observe_data_counts_crc():
    from gr_bluetooth_tpu.testing import LeConnectionSim
    sim = LeConnectionSim()
    req = packets.LePacket(symbols=sim.connect_req_bits(), freq=2426e6)
    pn = LowEnergyPiconet(aa=sim.conn_aa)
    pn.from_connect_req(req.connect_req_fields(), clkn=0)
    good = packets.LePacket(symbols=sim.data_bits(0, b"\xde\xad"),
                            freq=index2freq(sim.data_channel(0)))
    assert pn.observe_data(good)
    bad_syms = sim.data_bits(1, b"\xbe\xef").copy()
    bad_syms[70] ^= 1
    bad = packets.LePacket(symbols=bad_syms,
                           freq=index2freq(sim.data_channel(1)))
    assert not pn.observe_data(bad)
    assert pn.crc_ok_count == 1 and pn.crc_bad_count == 1


# ------------------------------------------------------------------ CSA#2

def test_csa2_channel_identifier_spec_value():
    # BT 5.0 Vol 6 Part B §4.5.8.3 sample data: AA 0x8E89BED6 -> 0x305F
    assert le_ll.csa2_channel_identifier(0x8E89BED6) == 0x305F


def test_csa2_spec_sample_37_used():
    # spec sample data, all 37 channels used: counters 0..3
    chm = (1 << 37) - 1
    assert le_ll.csa2_sequence(0x8E89BED6, chm, 4).tolist() == [25, 20, 6, 21]


def test_csa2_spec_sample_9_used():
    # spec sample data, used = {9,10,21,22,23,33,34,35,36}: the remapped
    # events land on 23, 9, 34 (counters 6..8)
    chm = sum(1 << c for c in (9, 10, 21, 22, 23, 33, 34, 35, 36))
    assert le_ll.csa2_sequence(0x8E89BED6, chm, 3, start=6).tolist() == \
        [23, 9, 34]


def test_csa2_outputs_always_in_map():
    rng = np.random.default_rng(7)
    for _ in range(10):
        used = rng.choice(37, size=rng.integers(2, 37), replace=False)
        chm = int(sum(1 << int(c) for c in used))
        aa = int(rng.integers(0, 1 << 32))
        seq = le_ll.csa2_sequence(aa, chm, 200)
        assert set(seq.tolist()) <= set(int(c) for c in used)


def test_csa2_visits_all_used_channels():
    # the PRN should exercise the whole map over enough events
    chm = (1 << 37) - 1
    seq = le_ll.csa2_sequence(0xA0B1C2D3, chm, 2000)
    assert set(seq.tolist()) == set(range(37))


def test_csa2_empty_map_raises():
    with pytest.raises(ValueError):
        le_ll.csa2_channel(0, 0x12345678, 0)


def test_connect_req_ch_sel_bit_roundtrip():
    from gr_bluetooth_tpu.testing import LeConnectionSim
    for ch_sel in (0, 1):
        sim = LeConnectionSim(ch_sel=ch_sel)
        req = packets.LePacket(symbols=sim.connect_req_bits(), freq=2426e6)
        fields = req.connect_req_fields()
        assert fields["ch_sel"] == ch_sel


def test_low_energy_piconet_follows_csa2_connection():
    from gr_bluetooth_tpu.testing import LeConnectionSim
    sim = LeConnectionSim(ch_sel=1, interval=10, win_offset=3)
    req = packets.LePacket(symbols=sim.connect_req_bits(), freq=2426e6)
    pn = LowEnergyPiconet(aa=sim.conn_aa)
    pn.from_connect_req(req.connect_req_fields(), clkn=100)
    assert pn.ch_sel == 1
    for ev in range(40):
        assert pn.channel_for_event(ev) == sim.data_channel(ev)
    # and the prediction really is CSA#2, not CSA#1
    assert [pn.channel_for_event(e) for e in range(40)] != \
        [int(le_ll.csa1_channel(np.int64((e + 1) * sim.hop_increment % 37),
                                sim.ch_map)) for e in range(40)]
