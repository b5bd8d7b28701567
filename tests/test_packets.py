"""Packet codec tests: encode -> decode roundtrips for every supported type,
header/UAP recovery, FHS field extraction, LE parsing."""
import numpy as np
import pytest

from gr_bluetooth_tpu.core import packets
from gr_bluetooth_tpu.core.packets import ClassicPacket, LePacket
from gr_bluetooth_tpu.constants import LE_ADV_AA

LAP, UAP, NAP = 0x24D952, 0x47, 0x1234


def _mk(bits, clkn=100, channel=39):
    return ClassicPacket(symbols=bits, clkn=clkn, channel=channel,
                         freq=2402e6 + channel * 1e6)


def _roundtrip(type_code, payload, clock=0x15, **kw):
    bits = packets.encode_classic_packet(LAP, UAP, clock, type_code,
                                         payload, **kw)
    # real captures carry trailing symbols after the packet (slot history)
    bits = np.concatenate([bits, np.zeros(64, np.uint8)])
    pkt = _mk(bits)
    assert pkt.lap == LAP
    assert pkt.header_present()
    uap = pkt.try_clock(clock)
    assert uap == UAP
    assert pkt.packet_type == type_code
    pkt.set_uap(UAP)
    pkt.set_clock(clock, False)
    assert pkt.decode()
    return pkt


def test_null_poll_header_only():
    for t in (0, 1):
        bits = packets.encode_classic_packet(LAP, UAP, 0x21, t)
        pkt = _mk(bits)
        # headers alone are < 126 symbols + trailer: pad to slot for checks
        pkt = _mk(np.concatenate([bits, np.zeros(64, np.uint8)]))
        assert pkt.header_present()
        assert pkt.try_clock(0x21) == UAP
        pkt.set_uap(UAP), pkt.set_clock(0x21, False)
        assert pkt.decode_header()
        pkt.decode_payload()
        assert pkt.payload_length == 0 and pkt.have_payload


@pytest.mark.parametrize("t,maxlen", [(3, 17), (10, 121), (14, 224)])
def test_dm_roundtrip(t, maxlen, rng):
    payload = bytes(rng.integers(0, 256, maxlen).tolist())
    pkt = _roundtrip(t, payload)
    assert pkt.payload_length == len(payload) + (3 if t == 3 else 4)
    from gr_bluetooth_tpu.utils.bits import air_to_host
    got = bytes(int(air_to_host(pkt.payload[8 * i:8 * i + 8]))
                for i in range(pkt.payload_header_length,
                               pkt.payload_length - 2))[:len(payload)]
    assert got == payload
    assert pkt.crc_check(0x15) == 10


@pytest.mark.parametrize("t,n", [(4, 25), (11, 180), (15, 330)])
def test_dh_roundtrip(t, n, rng):
    payload = bytes(rng.integers(0, 256, n).tolist())
    pkt = _roundtrip(t, payload)
    assert pkt.crc_check(0x15) == 10


def test_aux1_no_crc(rng):
    payload = bytes(rng.integers(0, 256, 10).tolist())
    pkt = _roundtrip(9, payload)
    assert pkt.crc_check(0x15) == 1  # AUX1 never confirms


def test_ev3_scan(rng):
    payload = bytes(rng.integers(0, 256, 8).tolist())
    bits = packets.encode_classic_packet(LAP, UAP, 0x15, 7, payload)
    pkt = _mk(np.concatenate([bits, rng.integers(0, 2, 300).astype(np.uint8)]))
    assert pkt.try_clock(0x15) == UAP
    pkt.set_uap(UAP)
    # EV3 CRC hit is demoted to inconclusive by the false-positive guard
    assert pkt.crc_check(0x15) == 1
    # but the raw scan finds the length
    assert pkt._ev_scan(0x15, 32) == 10
    assert pkt.payload_length == len(payload) + 2


def test_hv1_roundtrip(rng):
    payload = bytes(rng.integers(0, 256, 10).tolist())
    bits = packets.encode_classic_packet(LAP, UAP, 0x2A, 5, payload)
    pkt = _roundtrip(5, payload, clock=0x2A)
    assert pkt.payload_length == 10


def test_fhs_roundtrip_and_fields():
    clk27 = 0x5A3C21E
    bits = packets.encode_fhs_packet(LAP, UAP, NAP, clock=0x33,
                                     clk27_value=clk27)
    pkt = _mk(bits)
    assert pkt.try_clock(0x33) == UAP and pkt.packet_type == 2
    pkt.set_uap(UAP), pkt.set_clock(0x33, False)
    assert pkt.crc_check(0x33) == 1000  # FHS CRC confirms strongly
    assert pkt.decode()
    assert pkt.lap_from_fhs() == LAP
    assert pkt.uap_from_fhs() == UAP
    assert pkt.nap_from_fhs() == NAP
    assert pkt.clock_from_fhs() == (clk27 >> 1) & 0x3FFFFFF


def test_wrong_clock_rejected(rng):
    payload = bytes(rng.integers(0, 256, 17).tolist())
    bits = packets.encode_classic_packet(LAP, UAP, 0x15, 3, payload)
    pkt = _mk(bits)
    uap_wrong = pkt.try_clock(0x16)
    # wrong clock gives a different UAP almost surely, and DM1 CRC kills it
    score = pkt.crc_check(0x16)
    assert score in (0, 1)
    assert uap_wrong != UAP or score == 0


def test_id_packet_has_no_header(rng):
    from gr_bluetooth_tpu.core import access_code
    bits = np.concatenate([access_code.ac_bits(LAP),
                           rng.integers(0, 2, 60).astype(np.uint8)])
    pkt = _mk(bits)
    assert not pkt.header_present()


def test_tun_format_layout(rng):
    payload = bytes(rng.integers(0, 256, 5).tolist())
    pkt = _roundtrip(3, payload, clock=0x15)
    data = pkt.tun_format()
    assert len(data) == 9 + pkt.payload_length
    assert int.from_bytes(data[0:4], "little") == pkt.clock
    assert data[4] == 39


def test_unwhitened_mode(rng):
    """whiten=False packets decode with whitening disabled (file replay)."""
    payload = bytes(rng.integers(0, 256, 6).tolist())
    bits = packets.encode_classic_packet(LAP, UAP, 0, 4, payload, whiten=False)
    pkt = _mk(bits)
    pkt.whitened = False
    assert pkt.try_clock(0) == UAP
    pkt.set_uap(UAP), pkt.set_clock(0, False)
    assert pkt.decode()


# ---------------------------------------------------------------- LE

def test_le_adv_ind_parse(rng):
    adv_a = bytes([0x11, 0x22, 0x33, 0x44, 0x55, 0x66])
    data = b"hello-le"
    bits = packets.encode_le_adv(LE_ADV_AA, 37, 0, adv_a + data)
    pkt = LePacket(symbols=bits, freq=2402e6)
    assert pkt.index == 37
    assert pkt.aa == LE_ADV_AA
    assert pkt.pdu_type == 0
    assert pkt.length == len(adv_a) + len(data)
    s = pkt.summary()
    assert "AdvA=112233445566" in s
    assert "hello-le" in s


def test_le_connect_req_parse(rng):
    init_a = bytes(range(6))
    adv_a = bytes(range(6, 12))
    lldata = (0x50655A93).to_bytes(4, "little")      # AA
    lldata += (0xABCDEF & 0xFFFFFF).to_bytes(3, "little")  # CRCInit
    lldata += bytes([3])                              # WinSize
    lldata += (11).to_bytes(2, "little")              # WinOffset
    lldata += (39).to_bytes(2, "little")              # Interval
    lldata += (0).to_bytes(2, "little")               # Latency
    lldata += (500).to_bytes(2, "little")             # Timeout
    lldata += (0x1FFFFFFFFF).to_bytes(5, "little")    # ChM
    lldata += bytes([(2 << 5) | 9])                   # SCA<<5 | Hop
    bits = packets.encode_le_adv(LE_ADV_AA, 37, 5, init_a + adv_a + lldata)
    pkt = LePacket(symbols=bits, freq=2402e6)
    s = pkt.summary()
    assert "AA=50655a93" in s
    assert "CRCInit=abcdef" in s
    assert "Hop=9" in s and "SCA=2" in s
    assert pkt.pdu_name() == "CONNECT_REQ"


def test_le_data_channel_parse(rng):
    bits = packets.encode_le_adv(0xDEADBEEF, 5, 0, b"\x01\x02\x03")
    # data channel: index 5 (freq 2414 MHz -> LE chan 6 -> index 5)
    pkt = LePacket(symbols=bits, freq=2414e6)
    assert pkt.index == 5
    assert pkt.aa == 0xDEADBEEF
    assert "LLID" in pkt.summary()
