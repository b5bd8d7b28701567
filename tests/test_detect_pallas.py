"""Pallas AC-detection kernel vs. the XLA reference formulation.

The kernel (ops/detect_pallas.py) must be *exactly* equivalent to
detect._classic_detect_impl with max_distance=2 (the reference's
preamble+Barker <=2 rule, lib/packet_impl.cc:251-265): same hits mask,
same error counts at hit positions.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gr_bluetooth_tpu.core import access_code
from gr_bluetooth_tpu.ops import detect, detect_pallas

# interpret=True exercises the kernel semantics everywhere; the compiled
# (Mosaic) parametrization runs only where a real TPU backend exists so a
# lowering regression cannot hide behind the interpreter
_MODES = [True] + ([False] if jax.default_backend() == "tpu" else [])
mode_param = pytest.mark.parametrize(
    "interpret", _MODES,
    ids=["interpret"] + ([] if len(_MODES) == 1 else ["mosaic"]))


def _xla_hits(bits, max_ac_errors):
    hits, err = detect._classic_detect_impl(
        jnp.asarray(bits), jnp.asarray(detect._A68),
        jnp.asarray(detect._C68v), max_ac_errors, 2)
    return np.asarray(hits), np.asarray(err)


@pytest.mark.parametrize("seed", [0, 1])
@mode_param
def test_pallas_matches_xla_random(seed, interpret, rng):
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
        bits, max_ac_errors=6, nt=512, interpret=interpret)
    h_pal, e_pal = np.asarray(h_pal), np.asarray(e_pal)
    assert (h_pal == h_ref).all()
    # error counts must agree wherever the prefilter passes (where the
    # prefilter rejects, the XLA path still reports err; pallas reports 0)
    assert (e_pal[h_ref] == e_ref[h_ref]).all()
    assert h_pal[0, 100] and h_pal[3, 700]


def test_pack_bits_words_layout(rng):
    """pack_bits_words bit t -> word t//32 bit t%32, byte-compatible with
    np.unpackbits(bitorder='little') on the word bytes."""
    r = np.random.default_rng(3)
    for T in (64, 65, 95, 96):                   # incl. exact multiples of 32
        bits = r.integers(0, 2, (2, T)).astype(np.int8)
        w = np.asarray(detect_pallas.pack_bits_words(bits))
        assert w.shape == (2, -(-T // 32))
        back = np.unpackbits(
            w.astype("<i4").view(np.uint8).reshape(2, -1),
            bitorder="little", axis=1)[:, :T]
        assert (back == bits).all()


@mode_param
def test_detect_words_direct(interpret):
    """Packed-core API: hit plane, gate plane, packed error planes, and
    tail-word masking — including n%32 == 0 and a hit at the LAST offset."""
    r = np.random.default_rng(9)
    ac = access_code.ac_bits(0x5A17EC)[:68]
    for T in (72 + 31, 72 + 32 - 1 + 32, 1024 + 71):   # n=32 (exact), 63, 1024
        C = 4
        n = T - 71
        bits = r.integers(0, 2, (C, T)).astype(np.int8)
        bits[1, :68] = ac                               # first offset
        bits[2, n - 1:n - 1 + 68] = ac                  # last valid offset
        words = detect_pallas.pack_bits_words(bits)
        hit, gate, err = detect_pallas.detect_words(
            words, n, max_ac_errors=6, interpret=interpret)
        hit, gate, err = (np.asarray(o) for o in (hit, gate, err))
        h_ref, e_ref = _xla_hits(bits, max_ac_errors=6)

        def unpack(plane):
            m = plane.shape[-1] * 32
            b = np.unpackbits(plane.astype("<i4").view(np.uint8)
                              .reshape(plane.shape[0], -1),
                              bitorder="little", axis=1)
            return b[:, :n]

        assert (unpack(hit).astype(bool) == h_ref).all(), T
        # packed error counter planes reassemble to the dense error counts
        e = np.zeros((C, n), np.int32)
        for b in range(err.shape[0]):
            e |= unpack(err[b]).astype(np.int32) << b
        g = unpack(gate).astype(bool)
        assert (e[g] == e_ref[g]).all(), T
        # bits at offsets >= n must be zeroed (tail-word masking)
        tail = hit.astype("<i4").view(np.uint8)
        full = np.unpackbits(tail.reshape(C, -1), bitorder="little", axis=1)
        assert not full[:, n:].any(), T
        assert unpack(hit)[1, 0] and unpack(hit)[2, n - 1], T


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
