"""Staged-input path parity: the pre-staged (2, F, 128) layout must
produce the same detections as the flat (2, N) form, and the fused
SNR-partial kernel must match its XLA mirror."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gr_bluetooth_tpu.models.frontend import FrontEnd
from gr_bluetooth_tpu.ops import pfb, pfb_kernel, snr
from gr_bluetooth_tpu.testing import PiconetSim, make_piconet_capture

FS, CENTER = 4e6, 2441e6
LAP, UAP = 0x24D952, 0x47


def _fe(**kw):
    return FrontEnd(FS, CENTER, block_slots=8, max_ac_errors=1, **kw)


def _capture(fe, n_blocks=2, seed=3):
    sim = PiconetSim(lap=LAP, uap=UAP, clk0=0x12780)
    n_slots = 8 * n_blocks + 8
    samples, sent = make_piconet_capture(
        sim, n_slots=n_slots, fs=FS, center_freq=CENTER, seed=seed,
        tx_slots=range(0, n_slots - 6), noise_std=0.02)
    x = np.stack([samples.real, samples.imag]).astype(np.float32)
    need = n_blocks * fe.step_samples + fe.overlap_samples
    if x.shape[1] < need:
        x = np.pad(x, ((0, 0), (0, need - x.shape[1])))
    return x, sent


def test_staged_matches_flat_frontend():
    """Full _device_step: staged vs flat inputs give the same hit tables
    and near-identical SNR (fp reduction order differs)."""
    fe = _fe()
    x, _ = _capture(fe)
    xb = x[:, : fe.block_samples]
    o_flat = fe._jit_step(jnp.asarray(xb))
    o_staged = fe._jit_step(jnp.asarray(fe.stage_block(xb)))

    snr_f, snr_s = np.asarray(o_flat[0]), np.asarray(o_staged[0])
    assert snr_f.shape == snr_s.shape
    assert np.allclose(snr_f, snr_s, atol=1e-3), \
        np.abs(snr_f - snr_s).max()
    assert int(o_flat[1]) == int(o_staged[1]) > 0
    assert np.array_equal(np.asarray(o_flat[2]), np.asarray(o_staged[2]))
    assert np.array_equal(np.asarray(o_flat[3]), np.asarray(o_staged[3]))


def test_snr_fused_kernel_matches_mirror():
    """pfb_channelize_snr_fused (interpret) vs the XLA mirror of
    _pfb_snr_impl: same y exactly; oe/pe to fp tolerance."""
    fe = _fe()
    assert isinstance(fe.bank, pfb.PfbBank)
    b = fe.bank
    sc = fe.snr_consts
    x, _ = _capture(fe, n_blocks=1)
    x3 = jnp.asarray(fe.stage_block(x[:, : fe.block_samples]))
    pmr, pmi = pfb_kernel.probe_phase_matrices(sc.taps_re, sc.taps_im)

    got = pfb_kernel.pfb_channelize_snr_fused(
        x3, jnp.asarray(b.h0), jnp.asarray(b.h1), jnp.asarray(b.dft_c),
        jnp.asarray(b.dft_s), jnp.asarray(b.bin_odd), b.decim,
        jnp.asarray(pmr), jnp.asarray(pmi), sc.slot_ch, interpret=True)

    # mirror: run _pfb_snr_impl on CPU (platform_dependent -> xla path)
    ref = pfb._pfb_snr_impl(
        x3, jnp.asarray(b.h0), jnp.asarray(b.h1), jnp.asarray(b.dft_c),
        jnp.asarray(b.dft_s), jnp.asarray(b.bin_odd), jnp.asarray(pmr),
        jnp.asarray(pmi), jnp.asarray(sc.taps_re), jnp.asarray(sc.taps_im),
        b.decim, sc.slot_ch)

    for g, r, name, tol in ((got[0], ref[0], "yr", 2e-4),
                            (got[1], ref[1], "yi", 2e-4),
                            (got[2], ref[2], "oe", 1e-2)):
        g, r = np.asarray(g), np.asarray(r)
        assert g.shape == r.shape, name
        assert np.allclose(g, r, atol=tol, rtol=1e-4), \
            (name, np.abs(g - r).max())

    # pe: compare only at positions the assembly consumes
    n_y = fe._step_kwargs["n_y"]
    S = n_y // sc.slot_ch
    Tp = -(-len(sc.taps_re) // snr.PROBE_STRIDE) * snr.PROBE_STRIDE
    np_ = (S * sc.slot_ch - Tp) // snr.PROBE_STRIDE + 1
    G = np.asarray(got[3]).shape[0]
    t = np.arange(G)
    k0 = -(-pfb_kernel._TF * t // snr.PROBE_STRIDE)
    j = np.arange(pfb_kernel._PC)
    kk = k0[:, None] + j[None, :]
    valid = ((snr.PROBE_STRIDE * kk < pfb_kernel._TF * (t[:, None] + 1)) &
             (kk < np_) & (j[None, :] < 26))
    gpe, rpe = np.asarray(got[3]), np.asarray(ref[3])
    gv = gpe[np.nonzero(valid)[0], :, np.nonzero(valid)[1]]
    rv = rpe[np.nonzero(valid)[0], :, np.nonzero(valid)[1]]
    assert np.allclose(gv, rv, atol=1e-3, rtol=1e-3), np.abs(gv - rv).max()


def test_snr_demod_megakernel_matches_two_kernel_path():
    """pfb_channelize_snr_demod_fused (interpret) == the two-kernel
    round-4 path (pfb_channelize_snr_fused -> demod_timing_pack): packed
    words bit-exact, oe/pe identical — the y streams just never exist."""
    from gr_bluetooth_tpu.ops import demod_kernel

    fe = _fe()
    b = fe.bank
    sc = fe.snr_consts
    x, _ = _capture(fe, n_blocks=1)
    x3 = jnp.asarray(fe.stage_block(x[:, : fe.block_samples]))
    pmr, pmi = pfb_kernel.probe_phase_matrices(sc.taps_re, sc.taps_im)
    n_sym = fe.n_sym

    yr, yi, oe0, pe0 = pfb_kernel.pfb_channelize_snr_fused(
        x3, jnp.asarray(b.h0), jnp.asarray(b.h1), jnp.asarray(b.dft_c),
        jnp.asarray(b.dft_s), jnp.asarray(b.bin_odd), b.decim,
        jnp.asarray(pmr), jnp.asarray(pmi), sc.slot_ch, interpret=True)
    words0 = demod_kernel.demod_timing_pack(yr, yi, b.demod_gain, n_sym,
                                            interpret=True)

    words1, oe1, pe1 = pfb_kernel.pfb_channelize_snr_demod_fused(
        x3, jnp.asarray(b.h0), jnp.asarray(b.h1), jnp.asarray(b.dft_c),
        jnp.asarray(b.dft_s), jnp.asarray(b.bin_odd), b.decim,
        jnp.asarray(pmr), jnp.asarray(pmi), sc.slot_ch, b.demod_gain,
        n_sym, interpret=True)

    assert np.array_equal(np.asarray(words0), np.asarray(words1)), \
        "packed words differ"
    # oe/pe: same arithmetic on the shared tiles (the two-kernel path
    # appends one all-zero trailing tile the megakernel doesn't need)
    G = min(np.asarray(oe0).shape[0], np.asarray(oe1).shape[0])
    np.testing.assert_allclose(np.asarray(oe1)[:G], np.asarray(oe0)[:G],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pe1)[:G], np.asarray(pe0)[:G],
                               rtol=1e-6, atol=1e-6)
    assert not np.asarray(oe0)[G:].any() and not np.asarray(oe1)[G:].any()


def test_staged_stream_same_packets():
    """Block-streamed decode equality at the packet level: every planted
    in-band packet found by the flat stream is found by staged steps."""
    fe = _fe()
    x, _ = _capture(fe, n_blocks=3)

    def hits_of(results):
        return [(h.channel, h.clkn, h.lap) for r in results for h in r.hits]

    flat = list(fe.stream_sync(x))
    staged_hits = []
    pos, slot_base = 0, 0
    while pos + fe.block_samples <= x.shape[1]:
        xb = x[:, pos: pos + fe.block_samples]
        outs = fe._jit_step(jnp.asarray(fe.stage_block(xb)))
        res = fe.assemble_block(*outs, slot_base=slot_base)
        staged_hits.extend((h.channel, h.clkn, h.lap) for h in res.hits)
        pos += fe.step_samples
        slot_base += fe.block_slots
    assert hits_of(flat) == staged_hits
    assert any(lap == LAP for _, _, lap in staged_hits)
