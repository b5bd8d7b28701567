"""Production ingest pipeline (io/ingest.py): pipelined-vs-sync block
parity, wire formats (int16 `-s` / int8), and clock-correct overrun
handling (dropped air time must advance clkn — CLK discovery consumes
slot differences, lib/piconet_impl.cc:445-453)."""
import numpy as np
import pytest

from gr_bluetooth_tpu.constants import SYMBOLS_PER_SLOT
from gr_bluetooth_tpu.io import ingest
from gr_bluetooth_tpu.models.frontend import FrontEnd
from gr_bluetooth_tpu.models.sniffer import Sniffer
from gr_bluetooth_tpu.testing import PiconetSim, make_piconet_capture
from gr_bluetooth_tpu.utils.log import EventBus

FS, CENTER = 8e6, 2441e6
LAP, UAP = 0x24D952, 0x47


@pytest.fixture(scope="module")
def capture():
    sim = PiconetSim(lap=LAP, uap=UAP, clk0=0x12780)
    samples, sent = make_piconet_capture(sim, n_slots=256, fs=FS,
                                         center_freq=CENTER, seed=4)
    return sim, samples, sent


def _hit_keys(results):
    return [(h.channel, h.clkn, h.sym_offset, h.lap, h.errors, h.snr_db)
            for r in results for h in r.hits]


def test_pipelined_stream_matches_sync(capture):
    """FrontEnd.stream (the pipelined production path) produces exactly
    the blocks of the historical synchronous driver, padded tail block
    included."""
    _, samples, _ = capture
    fe = FrontEnd(FS, CENTER, block_slots=8, enable_le=True)
    sync = list(fe.stream_sync(samples))
    pipe = list(fe.stream(samples))
    assert len(sync) == len(pipe)
    assert [r.slot_base for r in sync] == [r.slot_base for r in pipe]
    assert _hit_keys(sync) == _hit_keys(pipe)
    assert len(_hit_keys(sync)) >= 10
    for rs, rp in zip(sync, pipe):
        for hs, hp in zip(rs.hits, rp.hits):
            assert (fe.packet_symbols(rs, hs) ==
                    fe.packet_symbols(rp, hp)).all()
        assert ([(h.channel, h.clkn, h.sym_offset) for h in rs.le_hits] ==
                [(h.channel, h.clkn, h.sym_offset) for h in rp.le_hits])


def test_pipelined_partial_tail(capture):
    """A capture ending mid-block still yields the zero-padded tail."""
    _, samples, _ = capture
    fe = FrontEnd(FS, CENTER, block_slots=8)
    x = samples[: fe.overlap_samples + 3 * fe.step_samples
                + fe.step_samples // 2]
    sync = list(fe.stream_sync(x))
    pipe = list(fe.stream(x))
    assert len(sync) == len(pipe) == 4
    assert _hit_keys(sync) == _hit_keys(pipe)


def test_int16_wire_parity(capture):
    """The int16 wire format (the SDR's actual byte stream,
    apps/btrx:134-138) detects the identical packet set: 15-bit
    quantization is far below the synthetic noise floor."""
    _, samples, _ = capture
    fe = FrontEnd(FS, CENTER, block_slots=8)
    f32 = _hit_keys(fe.stream(samples))
    i16 = _hit_keys(fe.stream(samples, wire="i16"))
    assert [k[:5] for k in f32] == [k[:5] for k in i16]
    assert len(f32) >= 10


def test_int8_wire_detection(capture):
    """int8 wire (quarter bandwidth): full planted-packet recall at
    capture SNR (fidelity/coverage trade, doc/README.aliasing:21-28)."""
    _, samples, sent = capture
    fe = FrontEnd(FS, CENTER, block_slots=8)
    bank = set(fe.bank.channels)
    want = {(s, c) for s, c, _ in sent if c in bank and s >= 1}
    got = {(h.clkn, h.channel)
           for r in fe.stream(samples, wire="i8") for h in r.hits}
    assert want <= got


class FakeLiveSource:
    """Scripted live source: raw chunks with drop reports between them."""

    def __init__(self, items, itemsize):
        self.items = items            # chunk arrays or ("drop", n_samples)
        self.itemsize = itemsize
        self._pending_drop = 0

    def iter_raw(self):
        for it in self.items:
            if isinstance(it, tuple):
                self._pending_drop += it[1]
            else:
                yield it

    def take_dropped_samples(self):
        d, self._pending_drop = self._pending_drop, 0
        return d


def test_live_chunks_slip_rounding():
    src = FakeLiveSource([np.zeros((8, 2), np.int16),
                          ("drop", 2 * 625 + 200),     # 2 slots + residual
                          np.zeros((8, 2), np.int16),
                          ("drop", 500),                # residual crosses 1
                          np.zeros((8, 2), np.int16)], 4)
    out = list(ingest.live_chunks(src, samples_per_slot=625))
    slips = [o for o in out if isinstance(o, ingest._Slip)]
    assert [s.slots for s in slips] == [2, 1]
    # bounded residual: total slipped slots ~ total dropped / slot
    assert sum(s.slots for s in slips) == round((2 * 625 + 700) / 625)


def test_overrun_advances_clock_and_sniffer_survives():
    """A mid-capture overrun (whole blocks of air lost) must not corrupt
    clkn: hits after the gap keep their true slot numbers and the sniffer
    still recovers the UAP from mixed before/after observations."""
    sim = PiconetSim(lap=LAP, uap=UAP, clk0=0x12780)
    n_slots = 512
    samples, sent = make_piconet_capture(sim, n_slots=n_slots, fs=FS,
                                         center_freq=CENTER, seed=6)
    fe_probe = FrontEnd(FS, CENTER, block_slots=8)
    st, ov = fe_probe.step_samples, fe_probe.overlap_samples
    spslot = fe_probe.samples_per_slot

    # drop two chunks' worth of air: chunk i carries air slots
    # [8i+5, 8i+13) (the 5-slot block head rides in the carry), so cutting
    # samples [ov+6*st, ov+8*st) removes air slots 53..68; report the drop
    # like a live ring would
    cut_lo, cut_hi = ov + 6 * st, ov + 8 * st
    x = np.stack([samples.real, samples.imag]).astype(np.float32)
    inter = np.ascontiguousarray(x.T)
    kept = np.concatenate([inter[:cut_lo], inter[cut_hi:]], axis=0)
    carry = np.ascontiguousarray(kept[:ov].T)

    chunks = []
    pos = ov
    blk = 0
    while pos + st <= kept.shape[0]:
        if blk == 6:
            chunks.append(("drop", cut_hi - cut_lo))
        chunks.append(kept[pos:pos + st])
        pos += st
        blk += 1
    src = FakeLiveSource(chunks, 8)

    bus = EventBus()
    mode = Sniffer(FS, CENTER, bus=bus, enable_le=False, block_slots=8)
    pipe = ingest.PipelinedIngest(mode.fe, "f32")
    results = list(pipe.run(ingest.live_chunks(src, spslot),
                            initial_carry=carry, bus=bus))
    mode.run_blocks(iter(results))

    slips = bus.events("clock_slipped")
    assert slips and slips[0]["slots"] == 16

    # clkn attribution: hits before AND after the gap match planted slots
    # (dropped air = slots 53..68; 6-slot straddle margin before, 1 after)
    bank = set(mode.fe.bank.channels)
    want = {(s, c) for s, c, _ in sent if c in bank and 1 <= s < n_slots - 6
            and not (53 - 6 <= s < 70)}
    got = {(h.clkn, h.channel) for r in results for h in r.hits}
    missing = want - got
    assert len(missing) <= max(1, len(want) // 10), sorted(missing)
    after_gap = {k for k in want if k[0] >= 70}
    assert after_gap and after_gap - got == set()

    # and the piconet layer still wins: UAP recovered across the gap
    pn = mode.basic_rate_piconets.get(LAP)
    assert pn is not None and pn.have_uap and pn.uap == UAP


def test_wire_format_snr_sweep_parity():
    """Quantized wire formats across an SNR sweep (VERDICT: the fidelity/
    coverage trade measured, not asserted — cf. the aliasing receiver,
    doc/README.aliasing:21-28).  int16's 15-bit grid never costs a packet;
    int8's quantization noise floor must cost at most one packet vs int16
    at every noise level, and none at capture-quality SNR."""
    sim = PiconetSim(lap=LAP, uap=UAP, clk0=0x12780)
    fe = FrontEnd(FS, CENTER, block_slots=8)
    bank = set(fe.bank.channels)

    def recall(samples, wire):
        got = {(h.clkn, h.channel)
               for r in fe.stream(samples, wire=wire) for h in r.hits}
        return got

    for noise_std in (0.05, 0.3, 0.6):
        samples, sent = make_piconet_capture(
            sim, n_slots=96, fs=FS, center_freq=CENTER, seed=11,
            noise_std=noise_std)
        want = {(s, c) for s, c, _ in sent if c in bank and s >= 1}
        r16 = recall(samples, "i16") & want
        r8 = recall(samples, "i8") & want
        r4 = recall(samples, "i4") & want
        # int16 == float32 recall is covered by test_int16_wire_parity;
        # here: int8 loses at most one packet relative to int16, int4 at
        # most two (its ~28 dB quantization floor is still far above the
        # GFSK detection threshold at capture-quality SNR)
        assert len(r8) >= len(r16) - 1, (noise_std, len(r16), len(r8))
        assert len(r4) >= len(r16) - 2, (noise_std, len(r16), len(r4))
        if noise_std <= 0.05:
            assert r16 == want and r8 == want and r4 == want


def test_int4_wire_decodes_payloads():
    """The int4 packed wire format (one byte per complex sample — the
    full-band operating point that fits a ~0.08 GB/s host link) carries
    enough fidelity for END-TO-END decode: every planted packet's
    payload CRC-verifies through the full Sniffer at capture-quality
    SNR."""
    sim = PiconetSim(lap=LAP, uap=UAP, clk0=0x12780)
    samples, sent = make_piconet_capture(sim, n_slots=64, fs=FS,
                                         center_freq=CENTER, seed=9,
                                         noise_std=0.05)
    sn = Sniffer(FS, CENTER, block_slots=8, enable_le=False,
                 bus=EventBus())
    decoded = sn.run_blocks(sn.fe.stream(samples, wire="i4"))
    bank = set(sn.fe.bank.channels)
    want = {(s, c) for s, c, _ in sent if c in bank and s >= 1}
    got = {(p.clkn, p.channel) for p in decoded}
    assert want <= got, want - got
    assert all(p.uap == UAP for p in decoded)
