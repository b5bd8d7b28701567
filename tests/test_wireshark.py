"""Wireshark integration: pcap framing <-> doc/btbb.lua dissector parity.

The Lua dissector (doc/btbb.lua, the modern equivalent of the reference's
Wireshark C patches doc/wireshark-*-btbb.patch) hardcodes field offsets
into the pseudo-ethernet + tun_format framing.  This test re-implements
those exact offsets in Python and checks a pcap produced by PcapWriter
round-trips every field — so a framing change that would break Wireshark
dissection breaks this test first.
"""
import struct

import numpy as np

from gr_bluetooth_tpu.core import packets
from gr_bluetooth_tpu.io.writers import ETHER_TYPE, PcapWriter


def _read_pcap(path):
    with open(path, "rb") as f:
        data = f.read()
    magic, _, _, _, _, _, linktype = struct.unpack("<IHHiIII", data[:24])
    assert magic == 0xA1B2C3D4 and linktype == 1
    frames, pos = [], 24
    while pos < len(data):
        _, _, caplen, _ = struct.unpack("<IIII", data[pos:pos + 16])
        frames.append(data[pos + 16: pos + 16 + caplen])
        pos += 16 + caplen
    return frames


def _dissect(frame):
    """Exactly btbb.lua's field extraction."""
    assert len(frame) >= 14
    dst, src = frame[0:6], frame[6:12]
    ethertype = frame[12] << 8 | frame[13]
    assert ethertype == ETHER_TYPE
    body = frame[14:]
    if len(body) == 0:
        return {"id": True, "lap": int.from_bytes(dst[3:6], "big")}
    clock = int.from_bytes(body[0:4], "little")
    out = {
        "id": False,
        "dst": dst, "src": src,
        "clock": clock,
        "channel": body[4],
        "clk27": bool(body[5] & 1),
        "nap_valid": bool(body[5] & 2),
        "lt_addr": body[6] & 0x07,
        "type": (body[6] & 0x78) >> 3,
        "flow": bool(body[7] & 1),
        "arqn": bool(body[7] & 2),
        "seqn": bool(body[7] & 4),
        "hec": body[8],
        "payload": body[9:],
    }
    return out


def test_pcap_dissector_roundtrip(tmp_path):
    lap, uap, clk = 0x24D952, 0x47, 0x5A5A5
    # a DM1 with known payload, decoded end-to-end through the codec
    sym = packets.encode_classic_packet(lap, uap, clk, type_code=3,
                                        payload_bytes=b"hello wireshark")
    pkt = packets.ClassicPacket(symbols=sym, clkn=0, channel=39)
    pkt.set_clock(clk, True)
    pkt.set_uap(uap)
    assert pkt.decode()
    pkt.have_nap = True
    pkt.nap = 0xBEEF

    path = str(tmp_path / "t.pcap")
    addr = (0xBEEF << 32) | (uap << 24) | lap
    with PcapWriter(path) as w:
        w.write_packet(pkt.tun_format(), addr)
        w.write_id(lap)
    frames = _read_pcap(path)
    assert len(frames) == 2

    d = _dissect(frames[0])
    assert not d["id"]
    assert d["clock"] == clk and d["channel"] == 39
    assert d["type"] == 3                      # DM1
    assert d["clk27"] and d["nap_valid"]
    assert d["dst"] == addr.to_bytes(6, "big")
    # payload body survives framing (tun payload = len hdr + data + crc)
    assert b"hello wireshark" in bytes(d["payload"])

    i = _dissect(frames[1])
    assert i["id"] and i["lap"] == lap


def test_lua_dissector_covers_all_types():
    """The Lua type table must name all 16 BR packet types identically to
    TYPE_NAMES (lib/packet_impl.cc:199-203)."""
    from gr_bluetooth_tpu.constants import TYPE_NAMES
    with open("doc/btbb.lua") as f:
        lua = f.read()
    for code, name in enumerate(TYPE_NAMES):
        assert f'[{code}] = "{name}"' in lua, (code, name)
