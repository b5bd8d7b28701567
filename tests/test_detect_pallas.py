"""Pallas AC-detection kernel vs. the XLA reference formulation.

The kernel (ops/detect_pallas.py) must be *exactly* equivalent to
detect._classic_detect_impl with max_distance=2 (the reference's
preamble+Barker <=2 rule, lib/packet_impl.cc:251-265): same hits mask,
same error counts at hit positions.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from gr_bluetooth_tpu.core import access_code
from gr_bluetooth_tpu.ops import detect, detect_pallas


def _xla_hits(bits, max_ac_errors):
    hits, err = detect._classic_detect_impl(
        jnp.asarray(bits), jnp.asarray(detect._A68),
        jnp.asarray(detect._C68v), max_ac_errors, 2)
    return np.asarray(hits), np.asarray(err)


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_matches_xla_random(seed, rng):
    r = np.random.default_rng(seed)
    C, T = 11, 2500
    bits = r.integers(0, 2, (C, T)).astype(np.int8)
    # plant real access codes at known offsets so hits exist
    for (c, off, lap) in [(0, 100, 0x123456), (3, 700, 0x9E8B33),
                          (10, T - 80, 0x000000)]:
        ac = access_code.ac_bits(lap)[:68]
        bits[c, off:off + 68] = ac
    h_ref, e_ref = _xla_hits(bits, max_ac_errors=6)
    h_pal, e_pal = detect_pallas.classic_detect_pallas(
        bits, max_ac_errors=6, nt=512, interpret=True)
    h_pal, e_pal = np.asarray(h_pal), np.asarray(e_pal)
    assert (h_pal == h_ref).all()
    # error counts must agree wherever the prefilter passes (where the
    # prefilter rejects, the XLA path still reports err; pallas reports 0)
    assert (e_pal[h_ref] == e_ref[h_ref]).all()
    assert h_pal[0, 100] and h_pal[3, 700]


def test_pallas_nt_tiling_edges():
    """Offsets straddling tile boundaries must be identical."""
    r = np.random.default_rng(7)
    C, T = 3, 1400
    bits = r.integers(0, 2, (C, T)).astype(np.int8)
    ac = access_code.ac_bits(0xABCDEF)[:68]
    for off in (250, 255, 256, 257, 511, 512, 513, 1000):
        bits[1, off:off + 68] = ac
        h_ref, e_ref = _xla_hits(bits, max_ac_errors=4)
        h_pal, _ = detect_pallas.classic_detect_pallas(
            bits, max_ac_errors=4, nt=256, interpret=True)
        assert (np.asarray(h_pal) == h_ref).all(), off
