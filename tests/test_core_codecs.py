"""Unit + parity tests for the spec core: bits, whitening, AC, FEC, CRC/HEC."""
import numpy as np
import pytest

from gr_bluetooth_tpu.utils.bits import (air_to_host, host_to_air, reverse8, bits_msb_to_int)
from gr_bluetooth_tpu.core import whitening, access_code, fec, crc

from conftest import requires_reference


# ---------------------------------------------------------------- bits

def test_bit_roundtrip(rng):
    vals = rng.integers(0, 2**24, size=100)
    assert np.array_equal(air_to_host(host_to_air(vals, 24)), vals)


def test_reverse8():
    assert reverse8(0x80) == 0x01
    assert reverse8(0x01) == 0x80
    assert np.array_equal(reverse8([0xF0, 0x0F]), [0x0F, 0xF0])


# ---------------------------------------------------------------- whitening

def test_whitening_is_msequence():
    s = whitening.SEQUENCE
    assert len(s) == 127 and s.sum() == 64  # 2^6 ones in a degree-7 m-sequence
    # recurrence s[n] = s[n-3] ^ s[n-7]
    ext = np.concatenate([s, s])
    for n in range(7, 127):
        assert ext[n] == ext[n - 3] ^ ext[n - 7]


@requires_reference
def test_whitening_parity_with_reference():
    import ref_tables
    assert np.array_equal(whitening.SEQUENCE, ref_tables.whitening_data())
    assert np.array_equal(whitening.CLASSIC_INDEX, ref_tables.classic_indices())
    assert np.array_equal(whitening.LE_INDEX, ref_tables.le_indices())


def test_unwhiten_involution(rng):
    bits = rng.integers(0, 2, 100).astype(np.uint8)
    w = whitening.unwhiten(bits, clock=37, skip=18)
    assert np.array_equal(whitening.unwhiten(w, clock=37, skip=18), bits)


def test_unwhiten_many_matches_scalar(rng):
    bits = rng.integers(0, 2, 64).astype(np.uint8)
    clocks = np.arange(64)
    batch = whitening.unwhiten_many(bits, clocks, skip=5)
    for c in range(64):
        assert np.array_equal(batch[c], whitening.unwhiten(bits, c, skip=5))


# ---------------------------------------------------------------- access code

def test_ac_selfcheck_all_zero_err(rng):
    for lap in [0x000000, 0xFFFFFF, 0x9E8B33, *rng.integers(0, 1 << 24, 8)]:
        air = access_code.ac_bits(int(lap))
        ok, got_lap, nerr = access_code.check_ac(air)
        assert ok and got_lap == lap and nerr == 0


def test_ac_giac_known_vector():
    """The GIAC (inquiry) access code is a published spec value:
    sync word 0x475C58CC73345E72 for LAP 0x9E8B33."""
    air = access_code.ac_bits(0x9E8B33)
    sync = bits_msb_to_int(air[4:68])  # published value reads MSB-first
    assert hex(int(sync)) == hex(0x475C58CC73345E72)


def test_ac_error_tolerance(rng):
    lap = 0x24D952
    air = access_code.ac_bits(lap)
    w = air[:68].copy()
    flip = rng.choice(np.arange(4, 38), size=6, replace=False)  # parity bits only
    w[flip] ^= 1
    ok, got, nerr = access_code.check_ac(w)
    assert ok and got == lap and nerr == 6
    w[2] ^= 1  # 7th error
    ok, _, nerr = access_code.check_ac(w)
    assert not ok and nerr == 7


@requires_reference
def test_distance_tables_parity():
    import ref_tables
    assert np.array_equal(access_code.preamble_distance_table(),
                          ref_tables.preamble_distance())
    assert np.array_equal(access_code.barker_distance_table(),
                          ref_tables.barker_distance())


def test_sniff_ac_finds_offset(rng):
    lap = 0x123456
    air = access_code.ac_bits(lap)
    stream = rng.integers(0, 2, 500).astype(np.uint8)
    stream[100:172] = air
    # mild corruption
    stream[105] ^= 1
    found = access_code.sniff_ac(stream, limit=400)
    assert found == 100


# ---------------------------------------------------------------- FEC

def test_fec13_roundtrip(rng):
    data = rng.integers(0, 2, 18).astype(np.uint8)
    enc = fec.fec13_encode(data)
    dec, ok = fec.unfec13(enc)
    assert ok and np.array_equal(dec, data)
    # flip one symbol of some triples: still decodes
    enc2 = enc.copy()
    enc2[[0, 9, 30]] ^= 1
    dec2, ok2 = fec.unfec13(enc2)
    assert ok2 and np.array_equal(dec2, data)


def test_fec13_error_threshold(rng):
    data = rng.integers(0, 2, 18).astype(np.uint8)
    enc = fec.fec13_encode(data)
    enc[::3] ^= 1  # every triple disagrees -> 18 errors >= 18/4
    _, ok = fec.unfec13(enc)
    assert not ok


def test_fec23_roundtrip(rng):
    data = rng.integers(0, 2, 40).astype(np.uint8)
    cw = fec.fec23_encode(data)
    assert cw.shape[-1] == 60
    dec, ok = fec.fec23_decode(cw, 40)
    assert ok and np.array_equal(dec[:40], data)


def test_fec23_corrects_single_data_bit(rng):
    data = rng.integers(0, 2, 10).astype(np.uint8)
    cw = fec.fec23_encode(data)
    for i in range(10):
        bad = cw.copy()
        bad[i] ^= 1
        dec, ok = fec.fec23_decode(bad, 10)
        assert ok and np.array_equal(dec, data), f"bit {i}"


def test_fec23_single_parity_error_accepted(rng):
    data = rng.integers(0, 2, 10).astype(np.uint8)
    cw = fec.fec23_encode(data)
    bad = cw.copy()
    bad[12] ^= 1
    dec, ok = fec.fec23_decode(bad, 10)
    assert ok and np.array_equal(dec, data)


def test_fec23_double_error_detected(rng):
    data = rng.integers(0, 2, 10).astype(np.uint8)
    cw = fec.fec23_encode(data)
    bad = cw.copy()
    bad[[3, 7]] ^= 1
    _, ok = fec.fec23_decode(bad, 10)
    assert not ok


# ---------------------------------------------------------------- CRC / HEC

def test_crc16_known_seed_behavior(rng):
    bits = rng.integers(0, 2, 80).astype(np.uint8)
    c1 = crc.crc16(bits, 0x47)
    c2 = crc.crc16(bits, 0x48)
    assert c1 != c2  # UAP-seeded
    # batch == scalar
    batch = crc.crc16(np.stack([bits, bits]), np.array([0x47, 0x48]))
    assert batch[0] == c1 and batch[1] == c2


def test_crc16_states_prefix_consistency(rng):
    bits = rng.integers(0, 2, 10 * 8).astype(np.uint8)
    states = crc.crc16_states(bits, 0x11)
    for k in range(11):
        assert states[k] == crc.crc16(bits[:8 * k], 0x11)


def test_payload_crc_roundtrip(rng):
    uap = 0x5A
    data = rng.integers(0, 2, 9 * 8).astype(np.uint8)
    c = crc.crc16(data, uap)
    full = np.concatenate([data, host_to_air(int(c), 16)])
    assert crc.payload_crc_ok(full, uap)
    full[3] ^= 1
    assert not crc.payload_crc_ok(full, uap)


def test_hec_roundtrip(rng):
    for _ in range(50):
        uap = int(rng.integers(0, 256))
        hdr = int(rng.integers(0, 1024))
        hec = crc.hec_forward(host_to_air(hdr, 10), uap)
        got = crc.uap_from_hec(hdr, int(hec))
        assert int(got) == uap


def test_uap_from_hec_vectorized(rng):
    hdrs = rng.integers(0, 1024, 64)
    hecs = rng.integers(0, 256, 64)
    batch = crc.uap_from_hec(hdrs, hecs)
    for i in range(64):
        assert batch[i] == crc.uap_from_hec(int(hdrs[i]), int(hecs[i]))
