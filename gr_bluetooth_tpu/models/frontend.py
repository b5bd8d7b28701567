"""Streaming wideband front end: blocks of IQ -> compact hit tables.

Inversion of the reference's per-slot control flow (multi_*_impl::work
re-demodulates a 5-slot history window for every channel, every slot —
lib/multi_sniffer_impl.cc:82-166): here long IQ blocks flow through the
jitted channelize/demod/detect pipeline once, with a 5-slot lookahead
overlap so packets that start near the end of a block are fully decodable.

Everything stays on device until the very end: the dense per-offset
detection masks are reduced *on device* to a fixed-size hit table
(channel, offset, LAP, errors) plus gathered per-hit symbol windows, so a
block's host traffic is a few hundred KB regardless of bandwidth — the
full (C, n_sym) tensors never cross the (slow) host link.

Per-block device work: B+LOOKAHEAD slots of wideband IQ ->
    channelize (PFB) -> GFSK demod + timing recovery -> slicer
    -> slot SNR -> dense AC detect (+ LE AA detect) -> squelch gate
    -> top-K hit extraction -> per-hit window gather.
Hits within the first B slots are reported; the stream advances B slots
(the reference advances 1).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (DEFAULT_SNR_DB, SYMBOLS_AC_SHORT, SYMBOLS_FOR_HISTORY,
                         SYMBOLS_LE_PREAMBLE_AA, SYMBOLS_PER_SLOT)
from ..core.le_tables import freq2index
from ..ops import (channelizer, demod, detect, detect_pallas, pfb,
                   pfb_kernel, snr)
from ..utils.log import get_logger

__all__ = ["FrontEnd", "Hit", "LeHit", "BlockResult"]

log = get_logger("frontend")

LOOKAHEAD_SLOTS = 5      # max packet length
WIN_SYMBOLS = 3200       # per-hit symbol window (>= 3125, lane-aligned)
LE_WIN_SYMBOLS = 512     # per-LE-hit window (>= 376 + header margin)


@dataclass(frozen=True)
class Hit:
    """One classic access-code candidate."""
    channel: int          # BR channel number
    chan_idx: int         # row in the channel bank
    clkn: int             # native slot clock at packet start
    sym_offset: int       # raw symbol offset within the block's bit stream
    lap: int
    errors: int
    snr_db: float
    win_row: int          # row in BlockResult.windows


@dataclass(frozen=True)
class LeHit:
    """One LE access-address candidate."""
    channel: int          # BR channel grid number (freq = 2402 + ch MHz)
    freq: float
    index: int            # LE channel index 0..39
    clkn: int
    sym_offset: int
    distance: int
    snr_db: float
    win_row: int          # row in BlockResult.le_windows


@dataclass
class BlockResult:
    slot_base: int              # clkn of the block's first slot
    snr_db: np.ndarray          # (S, C) per-slot SNR
    hits: list                  # list[Hit], ordered by offset
    le_hits: list               # list[LeHit], ordered by offset
    windows: np.ndarray         # (K, WIN_SYMBOLS) int8 symbol windows
    le_windows: np.ndarray      # (K_le, LE_WIN_SYMBOLS) int8
    n_slots: int                # slots advanced by this block


class FrontEnd:
    def __init__(self, sample_rate: float, center_freq: float,
                 squelch_threshold: float = DEFAULT_SNR_DB,
                 block_slots: int = 16, max_ac_errors: int = 6,
                 use_squelch: bool = True, enable_le: bool = False,
                 use_pallas: bool | None = None,
                 max_hits: int | None = None,
                 max_le_hits: int | None = None):
        # Pallas AC-detection kernel: default on for TPU backends (it keeps
        # the (C, 68, n) window tensor out of HBM), off for CPU tests
        if use_pallas is None:
            try:
                use_pallas = jax.default_backend() not in ("cpu",)
            except RuntimeError:       # backend init failure -> safe path
                use_pallas = False
        self.use_pallas = bool(use_pallas)
        # polyphase DFT filterbank for even samples/symbol (the common and
        # fast path: ~ntaps MACs/sample + one small matmul), dense strided
        # conv bank for odd integer rates (same prototype filter, same
        # outputs); off-grid rates (2.5 Msps, 7.68 Msps, ... — the
        # reference accepts any rate >= 2 Msps, lib/multi_block.cc:82)
        # resample to the nearest even integer Msps first and then run
        # the PFB restricted to the TRUE band's channels
        self.input_rate = sample_rate
        self.resampler = None
        spsf = sample_rate / 1e6
        if abs(spsf - round(spsf)) < 1e-9 and round(spsf) >= 2:
            sps = int(round(spsf))
            if sps % 2 == 0:
                self.bank = pfb.make_pfb_bank(sample_rate, center_freq)
                self.snr_consts = snr.make_stream_snr_consts(self.bank)
                self.weights = None
            else:
                self.bank = channelizer.make_bank(sample_rate, center_freq)
                self.snr_consts = None
                self.weights = snr.make_snr_weights(self.bank)
        else:
            from ..ops import resample as _rs
            fs_int = _rs.pick_internal_rate(sample_rate)
            self.resampler = _rs.make_resampler(sample_rate, fs_int)
            self.bank = pfb.make_pfb_bank(
                fs_int, center_freq,
                channels=channelizer.select_channels(sample_rate,
                                                     center_freq))
            self.snr_consts = snr.make_stream_snr_consts(self.bank)
            self.weights = None
        self.squelch = squelch_threshold
        self.use_squelch = use_squelch
        self.block_slots = block_slots
        self.max_ac_errors = max_ac_errors
        self.enable_le = enable_le
        b = self.bank
        self.samples_per_slot = SYMBOLS_PER_SLOT * b.sps
        # wideband samples consumed per block step
        self.step_samples = self.block_slots * self.samples_per_slot
        # extra samples needed: lookahead slots + filter/demod history
        self.overlap_samples = (LOOKAHEAD_SLOTS * self.samples_per_slot +
                                (b.ntaps - 1) + 4 * b.decim)
        self.block_samples = self.step_samples + self.overlap_samples
        self.n_sym = (self.block_slots + LOOKAHEAD_SLOTS) * SYMBOLS_PER_SLOT
        # VALID convolution + demod make the bit stream LEAD the input by the
        # filter group delay: symbol t in the bit stream sits at wideband
        # sample ~ t*sps + (ntaps-1)/2 + decim.  Correct when attributing a
        # detection offset to a slot / clkn (the reference's per-slot work()
        # has no such skew because it re-filters per slot with set_history).
        self.delay_sym = int(round(((b.ntaps - 1) / 2 + b.decim) / b.sps))

        # 2 hits/slot + margin: real loads top out near 1 hit/slot (the
        # fully-busy hostile bench sees ~62/64-slot block); overflow is
        # detected and logged, and the table size directly prices the
        # per-block D2H fetch (windows are 404 B/row) and the extraction
        # top_k — round 4's 8x-slots sizing made windows the largest
        # fetch on a high-latency host link
        self.max_hits = max_hits or max(128, 2 * block_slots + 64)

        # LE rows: bank channels sitting on the LE 2 MHz grid
        self.le_rows = [(i, ch, freq2index(2402e6 + ch * 1e6))
                        for i, ch in enumerate(b.channels)
                        if freq2index(2402e6 + ch * 1e6) >= 0]
        # LE hit-table capacity: data-channel detection is exact-match,
        # which random symbols pass at ~2^-9 per offset (9-bit preamble +
        # header LUTs, lib/packet_impl.cc:1452-1527), but false positives
        # only survive the squelch on busy rows/slots, so the worst-case
        # budget (every LE row busy every offset: ~3100 rows at full
        # band) is pathological.  Round 4 sized the table to it, which
        # made the LE extraction top_k and window gather the dominant
        # sniffer device cost (12.5k-row tables); cap at 512 — overflow
        # is detected, logged, and counted (assemble_block), and a real
        # capture that floods 512 LE candidates per block is jamming
        n_data_rows = sum(1 for r in self.le_rows if r[2] < 37) or 1
        fp_budget = n_data_rows * self.n_sym / 512.0
        self.max_le_hits = max_le_hits or max(
            64, 4 * block_slots, min(int(4 * fp_budget) + 64, 512))

        consts = dict(
            A68=jnp.asarray(detect._A68), C68v=jnp.asarray(detect._C68v),
        )
        if self.use_pallas:
            n_off = self.n_sym - 72 + 1
            s0, ma = _word_slot_consts(-(-n_off // 32), self.delay_sym)
            consts.update(word_s0=jnp.asarray(s0),
                          word_mask_a=jnp.asarray(ma))
        if self.enable_le and self.le_rows:
            idx = [r[2] for r in self.le_rows]
            white, aa_on, max_dist = detect.le_row_consts(idx)
            consts.update(le_rows=jnp.asarray(
                              np.array([r[0] for r in self.le_rows],
                                       dtype=np.int32)),
                          le_white=jnp.asarray(white),
                          le_aa_on=jnp.asarray(aa_on),
                          le_max_dist=jnp.asarray(max_dist))
        if isinstance(b, pfb.PfbBank):
            sc = self.snr_consts
            pmr, pmi = pfb_kernel.probe_phase_matrices(sc.taps_re,
                                                       sc.taps_im)
            consts.update(h0=jnp.asarray(b.h0), h1=jnp.asarray(b.h1),
                          dft_c=jnp.asarray(b.dft_c),
                          dft_s=jnp.asarray(b.dft_s),
                          bin_odd=jnp.asarray(b.bin_odd),
                          probe_re=jnp.asarray(sc.taps_re),
                          probe_im=jnp.asarray(sc.taps_im),
                          probe_mr=jnp.asarray(pmr),
                          probe_mi=jnp.asarray(pmi))
            snr_static = dict(slot_ch=sc.slot_ch, kappa=sc.kappa,
                              slot_len=None)
        else:
            consts.update(kernel=jnp.asarray(b.kernel),
                          rot_q=jnp.asarray(b.rot_q),
                          on_w=jnp.asarray(self.weights.on_w),
                          off_w=jnp.asarray(self.weights.off_w))
            snr_static = dict(slot_ch=None, kappa=None,
                              slot_len=self.weights.slot_len)

        # true output frames of a block: staged (2, F, 128) inputs carry a
        # junk tail the step slices back to this, making staged and flat
        # inputs bit-identical (ops/pfb_kernel.py:stage_host)
        n_y = None
        if isinstance(b, pfb.PfbBank):
            Q = b.h0.shape[0]
            n_y = self.block_samples // b.decim - 2 * Q

        self._step_kwargs = dict(
            **consts,
            is_pfb=isinstance(b, pfb.PfbBank),
            decim=b.decim, sps=b.sps, ch_sps=b.ch_sps,
            demod_gain=b.demod_gain, n_sym=self.n_sym, n_y=n_y,
            **snr_static,
            max_ac_errors=max_ac_errors,
            delay_sym=self.delay_sym,
            squelch=(float(squelch_threshold) if use_squelch else None),
            max_hits=self.max_hits, max_le_hits=self.max_le_hits,
            with_le=bool(self.enable_le and self.le_rows),
            use_pallas=self.use_pallas)
        self._jit_step = partial(_device_step, **self._step_kwargs)
        self._ingests: dict = {}        # wire -> PipelinedIngest (jit reuse)

    def stage_block(self, x: np.ndarray) -> np.ndarray:
        """Host-side staging of one (2, block_samples) float32 block into
        the TPU kernel's native (2, F, 128) layout (pfb path only).

        Pre-staging moves the lane-pad relayout (~1.2 ms/block on device)
        out of the step; use for pre-loaded block sets (bench workloads,
        replays).  Streaming paths keep the flat (2, N) form and pay the
        relayout on device."""
        b = self.bank
        if not isinstance(b, pfb.PfbBank):
            return np.asarray(x, dtype=np.float32)
        from ..ops import pfb_kernel
        return pfb_kernel.stage_host(x, b.decim, b.h0.shape[0])

    # ------------------------------------------------------------ device

    def device_step(self, x):
        """Jitted pipeline on one block of wideband IQ.

        Accepts complex64 (N,) host arrays or pre-split (2, N) float32
        planes.  The host<->device boundary is always real-valued: the TPU
        runtime rejects complex buffers in transfers (UNIMPLEMENTED), and
        planes are the idiomatic layout anyway.
        """
        x = np.asarray(x)
        if np.iscomplexobj(x):
            x = np.stack([x.real, x.imag]).astype(np.float32)
        return self._jit_step(jnp.asarray(x))

    # ------------------------------------------------------------ host

    def process_block(self, x: np.ndarray, slot_base: int) -> BlockResult:
        from ..utils.metrics import metrics
        with metrics.stage("device_step"):
            (snr_db, n_hits, hit_tab, windows,
             n_le, le_tab, le_windows) = self.device_step(x)
        with metrics.stage("assemble"):
            res = self.assemble_block(snr_db, n_hits, hit_tab, windows,
                                      n_le, le_tab, le_windows,
                                      slot_base=slot_base)
        metrics.count("blocks", 1)
        metrics.count("samples_in", self.step_samples)
        metrics.count("classic_hits", len(res.hits))
        metrics.count("le_hits", len(res.le_hits))
        return res

    def assemble_block(self, snr_db, n_hits, hit_tab, windows,
                       n_le, le_tab, le_windows, *,
                       slot_base: int) -> BlockResult:
        """Host-side assembly of one device step's outputs into hits."""
        from ..utils.metrics import metrics
        snr_db = np.asarray(snr_db)
        hit_tab = np.asarray(hit_tab)
        windows = np.asarray(windows)
        raw_hits = int(n_hits)
        n_hits = min(raw_hits, hit_tab.shape[0])
        if raw_hits > hit_tab.shape[0]:
            # fixed-size extraction is channel-major: detections past the
            # table end are LOST, not deferred (the reference's sequential
            # scan can't drop hits — multi_sniffer_impl.cc:107-149) —
            # surface it so operators can raise max_hits / shrink blocks
            dropped = raw_hits - hit_tab.shape[0]
            metrics.count("hits_dropped", dropped)
            log.warning("classic hit table overflow: %d detections > %d "
                        "rows; %d dropped (raise max_hits or lower "
                        "block_slots)", raw_hits, hit_tab.shape[0], dropped)

        limit = self.block_slots * SYMBOLS_PER_SLOT
        hits: list[Hit] = []
        last_end: dict[int, int] = {}
        order = np.argsort(hit_tab[:n_hits, 1], kind="stable")
        for k in order:
            c, t, lap, err = (int(v) for v in hit_tab[k])
            if t >= limit:
                continue               # next block re-sees offsets >= limit
            if t < last_end.get(c, 0):
                continue               # inside a previous AC (sniff skip rule)
            tc = t + self.delay_sym    # group-delay-corrected position
            slot = tc // SYMBOLS_PER_SLOT
            s_db = float(snr_db[slot, c]) if slot < snr_db.shape[0] else 0.0
            last_end[c] = t + SYMBOLS_AC_SHORT
            hits.append(Hit(channel=self.bank.channels[c], chan_idx=c,
                            clkn=(slot_base + slot) & 0x7FFFFFF,
                            sym_offset=t, lap=lap, errors=err,
                            snr_db=s_db, win_row=int(k)))

        le_hits: list[LeHit] = []
        if n_le is not None:
            le_tab = np.asarray(le_tab)
            le_windows = np.asarray(le_windows)
            raw_le = int(n_le)
            n_le = min(raw_le, le_tab.shape[0])
            if raw_le > le_tab.shape[0]:
                dropped = raw_le - le_tab.shape[0]
                metrics.count("le_hits_dropped", dropped)
                log.warning("LE hit table overflow: %d detections > %d "
                            "rows; %d dropped", raw_le, le_tab.shape[0],
                            dropped)
            le_last: dict[int, int] = {}
            le_order = np.argsort(le_tab[:n_le, 1], kind="stable")
            for k in le_order:
                r, t, dist = (int(v) for v in le_tab[k])
                if t >= limit:
                    continue
                if t < le_last.get(r, 0):
                    continue
                row, ch, index = self.le_rows[r]
                tc = t + self.delay_sym
                slot = tc // SYMBOLS_PER_SLOT
                s_db = float(snr_db[slot, row]) if slot < snr_db.shape[0] else 0.0
                le_last[r] = t + SYMBOLS_LE_PREAMBLE_AA
                le_hits.append(LeHit(channel=ch, freq=2402e6 + ch * 1e6,
                                     index=index,
                                     clkn=(slot_base + slot) & 0x7FFFFFF,
                                     sym_offset=t, distance=dist,
                                     snr_db=s_db, win_row=int(k)))
        else:
            le_windows = np.zeros((0, LE_WIN_SYMBOLS // 32 + 1), np.int32)

        return BlockResult(slot_base=slot_base, snr_db=snr_db, hits=hits,
                           le_hits=le_hits, windows=windows,
                           le_windows=le_windows, n_slots=self.block_slots)

    @staticmethod
    def _unpack_window(row: np.ndarray, sym_offset: int, n: int) -> np.ndarray:
        """Window rows arrive bit-aligned from the device (_gather_windows
        applies the off%32 funnel shift); sym_offset is unused but kept
        for signature stability."""
        bits = np.unpackbits(np.ascontiguousarray(row).view(np.uint8),
                             bitorder="little")
        return bits[:n].astype(np.int8)

    def packet_symbols(self, res: BlockResult, hit: Hit) -> np.ndarray:
        """Symbol window for a hit (up to 5 slots), for packet decode."""
        n = min(WIN_SYMBOLS, self.n_sym - hit.sym_offset)
        return self._unpack_window(res.windows[hit.win_row],
                                   hit.sym_offset, n)

    def packet_symbols_matrix(self, res: BlockResult):
        """All classic hits' symbol windows at once: (K, WIN_SYMBOLS)
        uint8 plus per-row valid symbol counts — one unpackbits over the
        block's window table instead of K per-hit unpacks (feeds
        core/batch_decode.py's batched steady-state decode)."""
        K = len(res.hits)
        if K == 0:
            return (np.zeros((0, WIN_SYMBOLS), np.uint8),
                    np.zeros(0, np.int64))
        rows = np.array([h.win_row for h in res.hits])
        w = np.ascontiguousarray(res.windows[rows])    # hits' rows only
        # rows arrive bit-aligned from the device, so one unpackbits is
        # the whole job (round 4 shifted each row here via a K x 3200
        # take_along_axis — the second-largest host cost under load)
        allbits = np.unpackbits(w.view(np.uint8).reshape(K, -1),
                                axis=1, bitorder="little")
        sym = allbits[:, :WIN_SYMBOLS]
        sizes = np.array([min(WIN_SYMBOLS, self.n_sym - h.sym_offset)
                          for h in res.hits], dtype=np.int64)
        return sym, sizes

    def le_packet_symbols(self, res: BlockResult, hit: LeHit) -> np.ndarray:
        n = min(LE_WIN_SYMBOLS, self.n_sym - hit.sym_offset)
        return self._unpack_window(res.le_windows[hit.win_row],
                                   hit.sym_offset, n)

    def stream(self, samples: np.ndarray, start_clkn: int = 0,
               wire: str = "f32"):
        """Iterate BlockResults over a long capture (host numpy input).

        This IS the production pipelined path (io.ingest): the overlap-
        save carry lives on device, each block's H2D transfer carries
        only step_samples of new data in the given wire format, and the
        next block's transfer is dispatched before the previous block's
        outputs are fetched (double buffering).  Block placement and
        outputs are identical to the historical synchronous driver
        (stream_sync, kept for parity tests)."""
        from ..io.ingest import PipelinedIngest, wire_chunks

        samples = np.asarray(samples)
        if np.iscomplexobj(samples):
            samples = np.stack([samples.real, samples.imag]).astype(np.float32)
        if self.resampler is not None:
            samples = self.resampler(samples)
        ingest = self._ingests.get(wire)
        if ingest is None:
            ingest = self._ingests[wire] = PipelinedIngest(self, wire)
        carry, chunks = wire_chunks(samples, self, wire, pad_tail=True)
        return ingest.run(chunks, start_clkn, initial_carry=carry)

    def stream_sync(self, samples: np.ndarray, start_clkn: int = 0):
        """Historical synchronous block loop (one blocking device_put +
        step + fetch per block) — the parity reference for stream()."""
        samples = np.asarray(samples)
        if np.iscomplexobj(samples):
            samples = np.stack([samples.real, samples.imag]).astype(np.float32)
        if self.resampler is not None:
            samples = self.resampler(samples)
        pos = 0
        slot_base = start_clkn
        n = samples.shape[1]
        while pos + self.block_samples <= n:
            yield self.process_block(samples[:, pos:pos + self.block_samples],
                                     slot_base)
            pos += self.step_samples
            slot_base += self.block_slots
        # tail: pad the final partial block with zeros
        if pos < n:
            tail = np.zeros((2, self.block_samples), dtype=np.float32)
            tail[:, :n - pos] = samples[:, pos:]
            yield self.process_block(tail, slot_base)


def _first_k_indices(flags, k: int):
    """Indices of the first k true elements of a flat bool/int vector, in
    order — the TPU-friendly form of `jnp.nonzero(flags, size=k)`.

    nonzero's lowering scatters a cumsum over the WHOLE domain into the
    output (262k serialized scatter updates for a full-band block, ~2 ms
    on v5e); top_k over a descending index priority does the same
    selection in one fused O(n log k) pass (~3x faster end to end).
    Fill positions (fewer than k set bits) return arbitrary indices —
    callers mask with their own `valid`.
    """
    n = flags.shape[0]
    pri = jnp.where(flags != 0,
                    jnp.int32(n) - jnp.arange(n, dtype=jnp.int32), 0)
    _, idx = jax.lax.top_k(pri, min(k, n))
    if k > n:                     # tiny domains (small test configs)
        idx = jnp.pad(idx, (0, k - n))
    return idx


def _extract_hits(mask, max_hits, payload_cols):
    """Reduce a dense (C, n) mask to a fixed-size table on device.

    Two-level sparsification: first-k over per-bucket any() (<= max_hits
    buckets matter), then first-k inside the selected buckets only —
    ~B x less selection work than one pass over the (C*n) domain.

    Returns (count, tab, chan, off, valid) where tab is
    (max_hits, 2 + len(payload_cols)) int32 rows [chan, offset, *payload]
    in channel-major order; unused rows are filled with -1.
    """
    C, n = mask.shape
    B = 128                                        # bucket width
    total = C * n
    nb = -(-total // B)
    flat = jnp.pad(mask.reshape(-1), (0, nb * B - total))
    count = flat.sum(dtype=jnp.int32)
    buckets = flat.reshape(nb, B)
    # level 1: which buckets contain hits (<= max_hits buckets matter)
    brow = _first_k_indices(buckets.any(axis=1), max_hits)
    sub = buckets[brow]                            # (max_hits, B)
    # level 2: dense first-k inside the selected buckets only
    sidx = _first_k_indices(sub.reshape(-1), max_hits)
    idx = brow[sidx // B] * B + (sidx % B)         # flat indices, ordered
    # fill positions (fewer than max_hits set bits) carry arbitrary
    # in-range indices, which the bucket padding can push past total —
    # clamp so derived chan/off stay in-domain even before `valid` masks
    idx = jnp.minimum(idx, total - 1)
    valid = jnp.arange(max_hits, dtype=jnp.int32) < count
    chan = (idx // n).astype(jnp.int32)
    off = (idx % n).astype(jnp.int32)
    cols = [chan, off] + [p.reshape(-1)[idx].astype(jnp.int32)
                          for p in payload_cols]
    tab = jnp.stack(cols, axis=1)
    tab = jnp.where(valid[:, None], tab, -1)
    return count, tab, chan, off, valid


def _extract_hits_packed(hitw, max_hits):
    """Reduce a bit-packed (C, W) int32 hit plane to sparse indices on
    device — the word-packed twin of _extract_hits (same channel-major
    order): first-k over hit-carrying words, then first-k over the
    selected words' unpacked bits (max_hits*32 elements instead of the
    full C*W*32 bit domain).

    Returns (count, chan, off, valid) with off in bit units (candidate
    offsets; callers guarantee bits >= n are already masked off).
    """
    C, W = hitw.shape
    flatw = hitw.reshape(-1)
    count = jax.lax.population_count(flatw).sum(dtype=jnp.int32)
    # superword pre-level: the single top_k over all C*W words was the
    # extraction's dominant cost (sort over ~108k elements, ~0.11
    # ms/block in the round-5 trace); selecting 32-word groups first
    # shrinks both sorts to a few-k domains.  Order (channel-major) is
    # preserved level by level, as in _extract_hits.
    SW = 32
    nsw = -(-flatw.shape[0] // SW)
    flatp = jnp.pad(flatw, (0, nsw * SW - flatw.shape[0])).reshape(nsw, SW)
    sidx = _first_k_indices(flatp.any(axis=1), max_hits)
    # gather the selected superwords via 128-lane-aligned chunk rows +
    # a 2-stage barrel select (a (K, 32)-wide row gather lowers to a
    # serialized dynamic-slice loop, ~0.12 ms/block in the round-5
    # trace; 128-wide row gathers are the one form TPU lowers well)
    n4 = -(-nsw // 4)
    table = jnp.pad(flatp, ((0, n4 * 4 - nsw), (0, 0))).reshape(n4, 4 * SW)
    rows = jnp.take(table, sidx // 4, axis=0)      # (max_hits, 128)
    g = (sidx % 4)[:, None]
    u = rows
    for k in (1, 0):
        amt = SW << k                              # 64, 32
        shifted = jnp.concatenate(
            [u[:, amt:], jnp.zeros((u.shape[0], amt), u.dtype)], axis=1)
        u = jnp.where(((g >> k) & 1) > 0, shifted, u)
    wsel = u[:, :SW].reshape(-1)                   # (max_hits*SW,)
    widx2 = _first_k_indices(wsel, max_hits)
    widx = sidx[widx2 // SW] * SW + widx2 % SW     # flat word indices
    widx = jnp.minimum(widx, flatw.shape[0] - 1)
    sel = wsel[widx2]                              # (max_hits,) words
    sh = jnp.arange(32, dtype=jnp.int32)
    bits = ((sel[:, None] >> sh) & 1).reshape(-1)  # (max_hits*32,)
    bidx = _first_k_indices(bits, max_hits)
    idx = widx[bidx // 32] * 32 + (bidx % 32)
    valid = jnp.arange(max_hits, dtype=jnp.int32) < count
    nbits = W * 32
    chan = (idx // nbits).astype(jnp.int32)
    off = (idx % nbits).astype(jnp.int32)
    return count, chan, off, valid


def _squelch_gate_words(snr_db, word_s0, word_mask_a, squelch):
    """Packed per-offset squelch gate: (S, C) slot SNR -> (C, W) int32
    word planes to AND with the packed hit plane.

    A 32-offset word spans at most two slots (625 % 32 != 0): word w's
    low `mask_a` bits sit in slot s0[w], the rest in s0[w]+1 (indices and
    masks are static — delay_sym and the slot grid are compile-time).
    The slot->word broadcast runs as one-hot (C, S+1) @ (S+1, W) matmuls:
    the gather form cost ~0.1 ms/block in lane-gather relayouts where the
    MXU does it for free."""
    S, C = snr_db.shape
    g = (snr_db.T >= squelch).astype(jnp.float32)  # (C, S)
    g = jnp.pad(g, ((0, 0), (0, 1)), mode="edge")  # slot S mirrors S-1
    s0 = jnp.minimum(word_s0, S)
    s1 = jnp.minimum(word_s0 + 1, S)
    slots = jnp.arange(S + 1, dtype=jnp.int32)[:, None]
    oh0 = (s0[None, :] == slots).astype(jnp.float32)       # (S+1, W)
    oh1 = (s1[None, :] == slots).astype(jnp.float32)
    g0 = (g @ oh0) > 0.5                           # (C, W)
    g1 = (g @ oh1) > 0.5
    ma = word_mask_a[None, :]
    return (jnp.where(g0, ma, 0) | jnp.where(g1, ~ma, 0)).astype(jnp.int32)


def _word_slot_consts(n_words: int, delay_sym: int):
    """Static per-word slot indices + intra-word slot-boundary masks for
    _squelch_gate_words."""
    w = np.arange(n_words, dtype=np.int64)
    first = 32 * w + delay_sym                     # offset+delay of bit 0
    s0 = first // SYMBOLS_PER_SLOT
    boundary = (s0 + 1) * SYMBOLS_PER_SLOT - first  # bits before next slot
    bp = np.clip(boundary, 0, 32)
    mask_a = np.where(bp >= 32, np.int64(0xFFFFFFFF), (1 << bp) - 1)
    return (s0.astype(np.int32),
            mask_a.astype(np.int64).astype(np.uint32).view(np.int32))


def _unpack_word_rows(words, rows, n_sym: int):
    """Dense float32 bit streams for a few selected rows of a packed
    word plane — the LE path needs only its ~L on-grid rows, so unpacking
    them from words is far cheaper than materializing all C dense rows."""
    sel = words[rows]                                  # (R, W)
    sh = jnp.arange(32, dtype=jnp.int32)[None, None, :]
    b = (sel[:, :, None] >> sh) & 1                    # (R, W, 32)
    return b.reshape(sel.shape[0], -1)[:, :n_sym].astype(jnp.float32)


def _gather_windows(words, chan, off, valid, width_bits):
    """(K,) channel/bit-offset -> (K, width_bits//32 + 1) int32 packed
    symbol windows, BIT-ALIGNED to each hit's offset (bit b of word j is
    the symbol at off + 32*j + b).

    TPU has exactly one gather it lowers well: whole 128-lane-aligned
    rows by index (embedding style).  Every dynamic-start formulation —
    vmapped dynamic_slice, explicit lax.gather of (1, ww) slices, flat
    element gathers — lowers to a K-iteration sequential while loop of
    dynamic-slices (~0.43 ms/block at K=512, the largest non-kernel cost
    in the round-5 trace), and a Pallas per-row-DMA kernel pays ~1 us of
    issue overhead per row (measured worse).  So: view the word plane as
    128-word chunks, gather the 2 chunks covering each window (one
    aligned row gather), then align with a 7-stage barrel shift (word
    residual, vectorized selects) + funnel shift (bit residual) — no
    per-row ops anywhere.  The off%32 alignment happening on device also
    kills the host's round-4 per-row shift gather (take_along_axis over
    K x 3200, the second-largest hostile-load host cost)."""
    C, nw = words.shape
    ww = width_bits // 32 + 1
    if ww + 127 > 256:
        raise ValueError(f"window wider than one chunk pair: {ww}")
    NC = (nw - 1) // 128 + 2           # chunks per row (ch0+1 in range)
    padded = jnp.pad(words, ((0, 1), (0, NC * 128 - nw)))
    table = padded.reshape((C + 1) * NC, 128)
    K = chan.shape[0]
    c = jnp.where(valid, jnp.clip(chan, 0, C - 1), C).astype(jnp.int32)
    ow = jnp.clip(off // 32, 0, nw - 1).astype(jnp.int32)
    ch0 = c * NC + ow // 128
    rows = jnp.take(table, jnp.stack([ch0, ch0 + 1], 1).reshape(-1),
                    axis=0).reshape(K, 256)
    # barrel shift by the word residual sw in [0, 128)
    sw = (ow % 128)[:, None]
    u = rows
    for k in range(6, -1, -1):
        amt = 1 << k
        shifted = jnp.concatenate(
            [u[:, amt:], jnp.zeros((K, amt), u.dtype)], axis=1)
        u = jnp.where((sw & amt) > 0, shifted, u)
    # funnel shift by the bit residual s in [0, 32)
    u = jax.lax.bitcast_convert_type(u[:, :ww + 1], jnp.uint32)
    s = jnp.where(valid, off % 32, 0).astype(jnp.uint32)[:, None]
    nxt = jnp.concatenate(
        [u[:, 1:ww], jnp.zeros((K, 1), jnp.uint32)], axis=1)
    u = u[:, :ww]
    lo = jax.lax.shift_right_logical(u, jnp.broadcast_to(s, u.shape))
    hi = jax.lax.shift_left(nxt, jnp.broadcast_to((32 - s) % 32, u.shape))
    hi = jnp.where(s > 0, hi, jnp.uint32(0))
    return jax.lax.bitcast_convert_type(lo | hi, jnp.int32)


def _squelch_gate(snr_db, n, delay_sym, squelch):
    """(S, C) slot SNR -> (C, n) per-offset boolean gate.

    Gather-free: slot index (t+delay)//625 is a shifted repeat, so repeat
    the per-slot gate 625x and take a static slice (delay_sym is static)."""
    S, C = snr_db.shape
    g = (snr_db.T >= squelch)                                  # (C, S)
    rep = jnp.repeat(g, SYMBOLS_PER_SLOT, axis=1)              # (C, S*625)
    pad = max(0, delay_sym + n - S * SYMBOLS_PER_SLOT)
    if pad:
        rep = jnp.concatenate([rep, jnp.repeat(rep[:, -1:], pad, axis=1)],
                              axis=1)
    return jax.lax.slice_in_dim(rep, delay_sym, delay_sym + n, axis=1)


@partial(jax.jit, static_argnames=(
    "is_pfb", "decim", "sps", "ch_sps", "demod_gain", "n_sym", "n_y",
    "slot_len", "slot_ch", "kappa", "max_ac_errors", "delay_sym", "squelch",
    "max_hits", "max_le_hits", "with_le", "use_pallas"))
def _device_step(x_ri, *, A68, C68v,
                 h0=None, h1=None, dft_c=None, dft_s=None, bin_odd=None,
                 probe_re=None, probe_im=None, probe_mr=None, probe_mi=None,
                 kernel=None, rot_q=None, on_w=None, off_w=None,
                 word_s0=None, word_mask_a=None,
                 le_rows=None, le_white=None, le_aa_on=None, le_max_dist=None,
                 is_pfb, decim, sps, ch_sps, demod_gain, n_sym, n_y=None,
                 slot_len, slot_ch, kappa, max_ac_errors, delay_sym, squelch,
                 max_hits, max_le_hits, with_le, use_pallas=False):
    staged = x_ri.ndim == 3
    words_fused = None
    if is_pfb:
        # streams carry one extra probe row above the top channel
        if staged and use_pallas:
            # round-5 megakernel: channelize + SNR partials + demod +
            # timing + slicer + word-pack in ONE pass — the y streams
            # never reach HBM (the round-4 PFB-write/demod-read boundary
            # was most of the remaining roofline gap)
            words_fused, oe, pe = pfb_kernel.pfb_channelize_snr_demod_fused(
                x_ri, h0, h1, dft_c, dft_s, bin_odd, decim,
                probe_mr, probe_mi, slot_ch, demod_gain, n_sym)
            S = n_y // slot_ch
            snr_db = snr.assemble_fused_snr(
                oe, pe, S=S, slot_ch=slot_ch, kappa=kappa,
                C=dft_c.shape[1] - 1, taps_len=probe_re.shape[0])
            yr = yi = yr_f = yi_f = None
        elif staged:
            # fused channelize + SNR partials: the y stream is written
            # once and never re-read for the squelch
            yr_f, yi_f, oe, pe = pfb._pfb_snr_impl(
                x_ri, h0, h1, dft_c, dft_s, bin_odd, probe_mr, probe_mi,
                probe_re, probe_im, decim, slot_ch)
            S = n_y // slot_ch
            snr_db = snr.assemble_fused_snr(
                oe, pe, S=S, slot_ch=slot_ch, kappa=kappa,
                C=dft_c.shape[1] - 1, taps_len=probe_re.shape[0])
            # junk tail dropped -> identical to the flat form
            yr, yi = yr_f[:-1, :n_y], yi_f[:-1, :n_y]
        else:
            yr_f, yi_f = pfb._pfb_impl(x_ri, h0, h1, dft_c, dft_s,
                                       bin_odd, decim)
            yr, yi = yr_f, yi_f
            snr_db, _, _ = snr._stream_snr_impl(yr, yi, probe_re, probe_im,
                                                slot_ch=slot_ch, kappa=kappa)
            yr, yi = yr[:-1], yi[:-1]
    else:
        yr, yi = channelizer._channelize_impl(x_ri[None], kernel, rot_q, 0,
                                              decim=decim, sps=sps)
        snr_db, _, _ = snr._slot_snr_impl(x_ri, on_w, off_w, slot_len)

    if use_pallas:
        # packed hot path: the symbol stream and the detect kernel's
        # hit/error planes stay bit-packed (32 offsets/int32 word) end to
        # end — squelch AND, sparse extraction, LAP, and window gather
        # all run on word planes, so neither the dense (C, n_sym) bit
        # plane nor the (C, n) gate/err tensors round-trip HBM
        if words_fused is not None:
            # megakernel already produced the packed planes; drop the
            # probe row (the stream's last row)
            words = words_fused[:-1]
            bits = None
        elif staged:
            # fused demod+timing+slicer+pack over the unsliced streams
            # (the trailing zero tile feeds its window lookahead)
            from ..ops import demod_kernel
            words = demod_kernel.demod_timing_pack(yr_f, yi_f, demod_gain,
                                                   n_sym)[:-1]
            bits = None
        else:
            d = demod.quadrature_demod(yr, yi, demod_gain)
            _, bits = demod.recover_symbols(d, ch_sps, n_sym)
            words = detect_pallas.pack_bits_words(bits)
        n = n_sym - 72 + 1
        hitw, _, _ = detect_pallas.detect_words(words, n, max_ac_errors,
                                                emit_err=False)
        if squelch is not None:
            hitw = hitw & _squelch_gate_words(snr_db, word_s0, word_mask_a,
                                              squelch)
        n_hits, chan, off, valid = _extract_hits_packed(hitw, max_hits)
        # windows are gathered bit-ALIGNED to each hit, so the LAP and
        # the AC error count are functions of the window itself — no
        # separate per-hit gathers from the word/err planes (their
        # vmapped 2-word slices were ~0.12 ms/block, round-5 trace):
        # LAP = symbols off+38..61 = window word 1 bits 6..29; err =
        # hamming(window[0:68], affine AC regenerated from those LAP
        # bits) — the same A68/C68v map the dense detector uses
        windows = _gather_windows(words, chan, off, valid, WIN_SYMBOLS)
        wu = jax.lax.bitcast_convert_type(windows[:, :3], jnp.uint32)
        lap_raw = jax.lax.shift_right_logical(
            wu[:, 1], jnp.uint32(6)).astype(jnp.int32) & 0xFFFFFF
        sh = jnp.arange(32, dtype=jnp.uint32)
        b96 = ((wu[:, :, None] >> sh[None, None, :]) & 1)
        bits68 = b96.reshape(-1, 96)[:, :68].astype(jnp.float32)
        pred = bits68[:, 38:62] @ A68.T.astype(jnp.float32) + C68v[None, :]
        pred = pred - 2.0 * jnp.floor(pred * 0.5)
        err = (bits68 + pred - 2.0 * bits68 * pred).sum(
            axis=1).astype(jnp.int32)
    else:
        d = demod.quadrature_demod(yr, yi, demod_gain)
        _, bits = demod.recover_symbols(d, ch_sps, n_sym)
        hits, err_d = detect._classic_detect_impl(bits, A68, C68v,
                                                  max_ac_errors, 2)
        if squelch is not None:
            hits = hits & _squelch_gate(snr_db, hits.shape[1], delay_sym,
                                        squelch)
        n_hits, tab, chan, off, valid = _extract_hits(hits, max_hits, [err_d])
        err = tab[:, 2]
        words = detect_pallas.pack_bits_words(bits)
        lap_raw = detect.lap_at(bits, chan, off)
        windows = _gather_windows(words, chan, off, valid, WIN_SYMBOLS)
    lap = jnp.where(valid, lap_raw, -1)
    neg = jnp.int32(-1)
    tab = jnp.stack([jnp.where(valid, chan, neg), jnp.where(valid, off, neg),
                     lap, jnp.where(valid, err, neg)], axis=1)

    if with_le:
        if bits is None:
            le_bits = _unpack_word_rows(words, le_rows, n_sym)
        else:
            le_bits = bits[le_rows].astype(jnp.float32)
        le_hits, le_dist = detect._le_detect_batch_impl(
            le_bits, le_white, le_aa_on, le_max_dist)
        if squelch is not None:
            gate = _squelch_gate(snr_db, le_hits.shape[1], delay_sym, squelch)
            le_hits = le_hits & gate[le_rows]
        n_le, le_tab, le_chan, le_off, le_valid = _extract_hits(
            le_hits, max_le_hits, [le_dist])
        le_windows = _gather_windows(words, le_rows[le_chan], le_off,
                                     le_valid, LE_WIN_SYMBOLS)
    else:
        n_le, le_tab, le_windows = None, None, None
    return snr_db, n_hits, tab, windows, n_le, le_tab, le_windows


@partial(jax.jit, static_argnames=(
    "is_pfb", "decim", "sps", "ch_sps", "demod_gain", "n_sym", "n_y",
    "slot_len", "slot_ch", "kappa", "max_ac_errors", "delay_sym", "squelch",
    "max_hits", "max_le_hits", "with_le", "use_pallas", "wire_scale",
    "wire_fmt", "overlap"))
def _pipelined_step(carry, new, *, wire_scale, wire_fmt="f32", overlap,
                    A68, C68v,
                    h0=None, h1=None, dft_c=None, dft_s=None, bin_odd=None,
                    probe_re=None, probe_im=None, probe_mr=None,
                    probe_mi=None,
                    kernel=None, rot_q=None, on_w=None, off_w=None,
                    word_s0=None, word_mask_a=None,
                    le_rows=None, le_white=None, le_aa_on=None,
                    le_max_dist=None,
                    is_pfb, decim, sps, ch_sps, demod_gain, n_sym, n_y=None,
                    slot_len, slot_ch, kappa, max_ac_errors, delay_sym,
                    squelch, max_hits, max_le_hits, with_le,
                    use_pallas=False):
    """Production ingest step: (device carry, RAW wire chunk) ->
    (next carry, _device_step outputs).

    `new` is an interleaved (step_samples, 2) array in the SDR wire dtype
    (int16 `-s` / int8 / float32 pairs); conversion, scaling, deinterleave
    and the overlap-save carry all happen on device, so only the new wire
    bytes cross the host link (apps/btrx:134-138 is the host-side
    short->complex converter this replaces).  Signature mirrors
    _device_step so compiled programs are shared across FrontEnd
    instances with identical configurations."""
    from ..io.ingest import wire_decode_jnp
    x = wire_decode_jnp(new, wire_fmt, wire_scale)
    xb = jnp.concatenate([carry, x], axis=1)
    if use_pallas and is_pfb:
        # stage on device so the step takes the fused-kernel fast path
        # (K1+SNR, demod->words): the lane-pad relayout costs ~1.2 ms at
        # full band, the staged step saves ~2.5 over the flat internals.
        # x is duplicated into lane groups 0..D-1 and D..2D-1 (the
        # packed-FIR/DFT layout, ops/pfb_kernel._fir_dft)
        from ..ops import pfb_kernel as _pk
        Q = h0.shape[0]
        F, _, _, _ = _pk.staged_geometry(xb.shape[1], decim, Q)
        n_x = xb.shape[1] // decim
        xv = xb[:, : n_x * decim].reshape(2, n_x, decim)
        xv = jnp.concatenate(
            [xv, xv,
             jnp.zeros((2, n_x, _pk._LD - 2 * decim), xv.dtype)], axis=2)
        xb_in = jnp.pad(xv, ((0, 0), (0, F - n_x), (0, 0)))
    else:
        xb_in = xb
    outs = _device_step(
        xb_in, A68=A68, C68v=C68v, h0=h0, h1=h1, dft_c=dft_c, dft_s=dft_s,
        bin_odd=bin_odd, probe_re=probe_re, probe_im=probe_im,
        probe_mr=probe_mr, probe_mi=probe_mi,
        kernel=kernel, rot_q=rot_q, on_w=on_w, off_w=off_w,
        word_s0=word_s0, word_mask_a=word_mask_a, le_rows=le_rows,
        le_white=le_white, le_aa_on=le_aa_on, le_max_dist=le_max_dist,
        is_pfb=is_pfb, decim=decim, sps=sps, ch_sps=ch_sps,
        demod_gain=demod_gain, n_sym=n_sym, n_y=n_y, slot_len=slot_len,
        slot_ch=slot_ch, kappa=kappa, max_ac_errors=max_ac_errors,
        delay_sym=delay_sym, squelch=squelch, max_hits=max_hits,
        max_le_hits=max_le_hits, with_le=with_le, use_pallas=use_pallas)
    return xb[:, -overlap:], outs
