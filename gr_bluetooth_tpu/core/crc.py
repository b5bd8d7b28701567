"""Bluetooth BR CRC-16 and HEC — encode, check, and UAP recovery.

CRC-16 (spec Vol 2 Part B §7.1.2, CRC-CCITT reflected form): the register is
seeded with the bit-reversed UAP in its upper byte and consumes air-order
payload bits; matches classic_packet::crcgen (lib/packet_impl.cc:528-548).

HEC (spec §7.1.1): 8-bit code over the 10 header bits, seeded with the UAP.
The reference only implements the *reverse* direction — running the HEC LFSR
backwards over the header bits to recover the UAP from a received HEC
(UAP_from_hec, lib/packet_impl.cc:596-609, Ossmann's attack).  We provide
both directions (forward HEC is needed by the synthesizer/encoder).

Everything is vectorized over leading batch axes (e.g. 64 candidate clocks at
once — the reference's per-candidate loop at lib/piconet_impl.cc:457-496).
"""
from __future__ import annotations

import numpy as np

from ..utils.bits import reverse8

__all__ = [
    "crc16", "crc16_states", "payload_crc_ok", "hec_forward", "uap_from_hec",
]


def crc16(air_bits: np.ndarray, uap) -> np.ndarray:
    """CRC-16 over air-order bits with UAP-seeded register.

    air_bits: (..., L) uint8; uap: scalar or (...) broadcastable.
    Returns (...) uint16 register value (compared against the 16 bits
    following the payload, themselves read LSB-first).
    """
    air_bits = np.asarray(air_bits, dtype=np.uint16)
    reg = (reverse8(np.asarray(uap)).astype(np.uint16) << 8) & 0xFF00
    reg = np.broadcast_to(reg, air_bits.shape[:-1]).copy()
    for i in range(air_bits.shape[-1]):
        b = air_bits[..., i]
        reg = (reg >> 1) | (((reg & 1) ^ (b & 1)) << 15)
        reg ^= (reg & 0x8000) >> 5
        reg ^= (reg & 0x8000) >> 12
    return reg


def crc16_states(air_bits: np.ndarray, uap) -> np.ndarray:
    """CRC register value after every byte (8 bits) of the stream.

    air_bits: (..., 8*n) -> (..., n+1) uint16, states[..., k] = CRC of the
    first k bytes.  This turns the reference's O(L^2) EV3/EV5 byte-length
    scans (lib/packet_impl.cc:884-913, 970-999) into a single O(L) pass.
    """
    air_bits = np.asarray(air_bits, dtype=np.uint16)
    nbytes = air_bits.shape[-1] // 8
    out = np.empty(air_bits.shape[:-1] + (nbytes + 1,), dtype=np.uint16)
    reg = (reverse8(np.asarray(uap)).astype(np.uint16) << 8) & 0xFF00
    reg = np.broadcast_to(reg, air_bits.shape[:-1]).copy()
    out[..., 0] = reg
    for k in range(nbytes):
        for i in range(8):
            b = air_bits[..., 8 * k + i]
            reg = (reg >> 1) | (((reg & 1) ^ (b & 1)) << 15)
            reg ^= (reg & 0x8000) >> 5
            reg ^= (reg & 0x8000) >> 12
        out[..., k + 1] = reg
    return out


def payload_crc_ok(payload_bits: np.ndarray, uap) -> np.ndarray:
    """Check trailing CRC: payload_bits = (..., 8*n) with last 16 bits = CRC.

    Mirrors classic_packet_impl::payload_crc (lib/packet_impl.cc:677-686).
    """
    payload_bits = np.asarray(payload_bits, dtype=np.uint8)
    data = payload_bits[..., :-16]
    crc = crc16(data, uap)
    w = (1 << np.arange(16, dtype=np.int64))
    check = (payload_bits[..., -16:].astype(np.int64) * w).sum(axis=-1)
    return crc.astype(np.int64) == check


def hec_forward(header_bits10: np.ndarray, uap) -> np.ndarray:
    """Forward HEC of 10 air-order header bits, seeded with UAP.

    Inverse of uap_from_hec (verified by round-trip test); returns the 8-bit
    HEC as transmitted (air_to_host of the 8 HEC bits).
    """
    header_bits10 = np.asarray(header_bits10, dtype=np.uint16)
    x = reverse8(np.asarray(uap)).astype(np.uint16)
    x = np.broadcast_to(x, header_bits10.shape[:-1]).copy()
    # invert the backward recursion of uap_from_hec, stepping i = 0..9
    for i in range(10):
        d = header_bits10[..., i]
        b7 = (x & 1) ^ (d & 1)
        x = (x >> 1) | (b7 << 7)
        x ^= b7 * 0x65
    return x.astype(np.uint8)


def uap_from_hec(hdr_data, hec) -> np.ndarray:
    """Recover the UAP by running the HEC LFSR backwards over the header.

    hdr_data: (...) 10-bit ints (air_to_host of header bits 0..9);
    hec: (...) 8-bit ints.  Vectorized port of the reference attack
    (lib/packet_impl.cc:596-609).
    """
    hdr_data = np.asarray(hdr_data, dtype=np.uint16)
    hec = np.asarray(hec, dtype=np.uint16)
    hec = np.broadcast_to(hec, np.broadcast(hdr_data, hec).shape).copy()
    hdr_data = np.broadcast_to(hdr_data, hec.shape)
    for i in range(9, -1, -1):
        hec ^= ((hec & 0x80) >> 7) * 0x65
        hec = ((hec << 1) & 0xFF) | (((hec >> 7) ^ (hdr_data >> i)) & 1)
    return reverse8(hec)
