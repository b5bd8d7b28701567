"""core/batch_decode parity: batched steady-state decode must reproduce
ClassicPacket.decode() bit-for-bit — per type, per failure mode, and
through the full Sniffer on a multi-piconet capture."""
import numpy as np

from gr_bluetooth_tpu.core import batch_decode, packets
from gr_bluetooth_tpu.core.packets import ClassicPacket
from gr_bluetooth_tpu.models.sniffer import Sniffer
from gr_bluetooth_tpu.testing import PiconetSim, make_multi_piconet_capture

LAP, UAP = 0x24D952, 0x47


def _mk(type_code, payload=b"", clock=0x2A, corrupt=None):
    if type_code == 2:
        bits = packets.encode_fhs_packet(LAP, UAP, 0xBEEF, clock=clock,
                                         clk27_value=0x123456)
    else:
        voice = bytes(range(10)) if type_code == 8 else b""
        bits = packets.encode_classic_packet(LAP, UAP, clock, type_code,
                                             payload, voice_bytes=voice)
    sym = np.zeros(3200, np.uint8)
    sym[:len(bits)] = bits
    size = len(bits)
    if corrupt == "hec":
        sym[72:126:3] ^= 1          # flip whole header triplets -> bad HEC
        sym[73:126:3] ^= 1
        sym[74:126:3] ^= 1
    elif corrupt == "payload_fec":
        base = 126 + (80 if type_code == 8 else 0)
        # >=2 bit errors inside one data block's first bits
        sym[base + 15] ^= 1
        sym[base + 17] ^= 1
        sym[base + 19] ^= 1
    elif corrupt == "crc":
        # flip a whole FEC block's worth consistently: encode can't be
        # trivially CRC-broken without breaking FEC, so flip data bits in
        # a correctable way: single-bit error (corrected) leaves CRC ok;
        # instead flip the same bit in two different blocks
        base = 126 + 15
        sym[base + 0] ^= 1          # one bit in block 2 (corrected)
    return sym, size


def _scalar(sym, size, clock):
    pkt = ClassicPacket(symbols=sym[:size].copy())
    pkt.set_clock(clock, False)
    pkt.set_uap(UAP)
    ok = pkt.decode()
    return pkt, ok


def test_types_and_failures_match_scalar():
    cases = []
    for t, payload in ((0, b""), (1, b""), (3, b"\x01\x02\x03"),
                       (4, b"ABCDEFGH"), (10, bytes(range(60))),
                       (11, bytes(range(100))), (14, bytes(range(150))),
                       (15, bytes(range(200))), (9, b"AUX1PAY")):
        cases.append(_mk(t, payload))
        if t in (3, 10, 14):
            cases.append(_mk(t, payload, corrupt="payload_fec"))
    cases.append(_mk(3, b"\x01\x02\x03", corrupt="hec"))

    clock = 0x2A
    sym = np.stack([c[0] for c in cases])
    sizes = np.array([c[1] for c in cases])
    clocks = np.full(len(cases), clock)
    uaps = np.full(len(cases), UAP)
    rows = batch_decode.decode_known_rows(sym, sizes, clocks, uaps)

    for i, (s, size) in enumerate(cases):
        pkt, ok = _scalar(s, size, clock)
        row = rows[i]
        assert row is not None, f"case {i}: batch deferred a batch type"
        assert row["ok"] == ok, (i, pkt.packet_type)
        if row.get("header_failed"):
            continue
        assert row["packet_type"] == pkt.packet_type, i
        assert np.array_equal(row["packet_header"], pkt.packet_header), i
        assert row["payload_length"] == pkt.payload_length, i
        assert row["payload_header_length"] == pkt.payload_header_length
        assert row["payload_llid"] == pkt.payload_llid, i
        assert row["payload_flow"] == pkt.payload_flow, i
        if pkt.payload is None:
            assert row["payload"] is None, i
        else:
            assert np.array_equal(row["payload"], pkt.payload), i


def test_exotic_types_defer():
    """FHS / voice / extended-voice types must take the per-packet path."""
    for t in (2, 5, 6, 7, 12, 13):
        assert t not in batch_decode._BATCH_TYPES


def test_sniffer_batch_parity_multi_piconet():
    """Full sniffer with and without batching on a 3-piconet capture:
    identical decoded packet streams."""
    sims = [PiconetSim(lap=LAP, uap=UAP, clk0=0x12780),
            PiconetSim(lap=0x1A2B3C, uap=0x99, clk0=0x00450),
            PiconetSim(lap=0x654321, uap=0x13, clk0=0x71111)]
    samples, sent = make_multi_piconet_capture(
        sims, n_slots=48, fs=4e6, center_freq=2441e6, seed=7,
        noise_std=0.02)
    x = np.stack([samples.real, samples.imag]).astype(np.float32)

    def run(batch):
        sn = Sniffer(4e6, 2441e6, block_slots=16, batch_decode=batch)
        sn.run(x)
        return [(p.lap, p.uap, p.clkn, p.channel, p.packet_type,
                 p.payload_length,
                 None if p.payload is None else p.payload.tobytes())
                for p in sn.decoded]

    a, b = run(False), run(True)
    assert a == b
    assert len(a) > 0

def test_crc_check_clocks_matches_scalar():
    """Vectorized candidate scoring == scalar try_clock + crc_check for
    all 64 clocks, across types and corruption."""
    for t, payload, corrupt in ((3, b"\x01\x02\x03", None),
                                (10, bytes(range(40)), None),
                                (4, b"ABCDEF", None),
                                (15, bytes(range(100)), None),
                                (3, b"\x01\x02\x03", "payload_fec"),
                                (0, b"", None),
                                (8, b"dv-data", None),
                                (2, b"", None)):
        sym, size = _mk(t, payload, clock=0x2A, corrupt=corrupt)
        clocks = np.arange(64)
        base = ClassicPacket(symbols=sym[:size].copy())
        uaps, types, fec_ok = base.try_clocks(clocks)
        assert fec_ok
        want = []
        for c in range(64):
            pkt = ClassicPacket(symbols=sym[:size].copy())
            pkt.try_clock(c)
            want.append(pkt.crc_check(c))
        got = packets.crc_check_clocks(
            ClassicPacket(symbols=sym[:size].copy()),
            clocks.tolist(), uaps.tolist(), types.tolist())
        assert got == want, (t, corrupt)
