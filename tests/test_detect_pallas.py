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


def test_frontend_packed_path_parity():
    """The frontend's use_pallas hot path (packed squelch gate, packed hit
    extraction, packed err gather, bitcast window source) must produce the
    same BlockResults as the dense XLA path on a real synthetic capture —
    run in interpret mode so CPU CI covers the integration."""
    from gr_bluetooth_tpu.constants import SYMBOLS_PER_SLOT
    from gr_bluetooth_tpu.core import packets as P
    from gr_bluetooth_tpu.models.frontend import FrontEnd
    from gr_bluetooth_tpu.ops import synth as S

    FS, CENTER = 8e6, 2441e6
    LAP, UAP = 0x24D952, 0x47
    sps = int(FS // 1e6)
    r = np.random.default_rng(5)
    plan = []
    for slot, ch in [(1, 36), (3, 39), (4, 42), (6, 36), (9, 40)]:
        bits = P.encode_classic_packet(LAP, UAP, slot, 3,
                                       bytes(r.integers(0, 256, 9).tolist()))
        plan.append(S.PlannedPacket(
            channel=ch,
            start_sample=slot * SYMBOLS_PER_SLOT * sps + 7 * sps, bits=bits))
    le_bits = P.encode_le_adv(0x8E89BED6, 38, 0, b"\x22" * 6)
    plan.append(S.PlannedPacket(
        channel=(2426 - 2402), bits=np.concatenate(
            [le_bits, np.zeros(8, np.uint8)]),
        start_sample=11 * SYMBOLS_PER_SLOT * sps + 7 * sps))
    x = S.synthesize_capture(plan, n_samples=20 * SYMBOLS_PER_SLOT * sps,
                             fs=FS, center_freq=CENTER, noise_std=0.02,
                             seed=5)

    fe_dense = FrontEnd(FS, CENTER, block_slots=8, enable_le=True,
                        use_pallas=False)
    old = detect_pallas.DEFAULT_INTERPRET
    detect_pallas.DEFAULT_INTERPRET = True
    try:
        fe_packed = FrontEnd(FS, CENTER, block_slots=8, enable_le=True,
                             use_pallas=True)
        dense = list(fe_dense.stream(x))
        packed = list(fe_packed.stream(x))
    finally:
        detect_pallas.DEFAULT_INTERPRET = old

    assert len(dense) == len(packed)
    n_hits = 0
    for rd, rp in zip(dense, packed):
        kd = [(h.channel, h.clkn, h.sym_offset, h.lap, h.errors)
              for h in rd.hits]
        kp = [(h.channel, h.clkn, h.sym_offset, h.lap, h.errors)
              for h in rp.hits]
        assert kd == kp
        # SNR to fp tolerance: the packed path's megakernel computes the
        # slot-energy partials in-kernel with a different (tile-wise)
        # reduction order than the dense path's XLA mirror
        sd = np.array([h.snr_db for h in rd.hits])
        sp = np.array([h.snr_db for h in rp.hits])
        assert np.allclose(sd, sp, atol=1e-3)
        n_hits += len(kd)
        for hd, hp in zip(rd.hits, rp.hits):
            wd = fe_dense.packet_symbols(rd, hd)
            wp = fe_packed.packet_symbols(rp, hp)
            assert (wd == wp).all()
        ld = [(h.channel, h.clkn, h.sym_offset, h.distance) for h in rd.le_hits]
        lp = [(h.channel, h.clkn, h.sym_offset, h.distance) for h in rp.le_hits]
        assert ld == lp
        for hd, hp in zip(rd.le_hits, rp.le_hits):
            assert (fe_dense.le_packet_symbols(rd, hd) ==
                    fe_packed.le_packet_symbols(rp, hp)).all()
    assert n_hits >= 5          # every planted classic packet detected


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
