"""Streaming wideband front end: blocks of IQ -> symbols + SNR + AC candidates.

Inversion of the reference's per-slot control flow (multi_*_impl::work
re-demodulates a 5-slot history window for every channel, every slot —
lib/multi_sniffer_impl.cc:82-166): here long IQ blocks flow through the
jitted channelize/demod/detect pipeline once, with a 5-slot lookahead overlap
so packets that start near the end of a block are fully decodable.  Hits are
extracted once on device and assembled into packet candidates on host.

Per-block work: B+LOOKAHEAD slots of wideband IQ -> (C, n_sym) hard symbols,
(S, C) slot SNR, dense AC candidate mask.  Hits within the first B slots are
reported; the stream then advances exactly B slots (reference advances 1).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (DEFAULT_SNR_DB, SYMBOLS_AC_SHORT, SYMBOLS_FOR_HISTORY,
                         SYMBOLS_PER_SLOT)
from ..ops import channelizer, demod, detect, snr
from ..utils.log import get_logger

__all__ = ["FrontEnd", "Hit", "BlockResult"]

log = get_logger("frontend")

LOOKAHEAD_SLOTS = 5  # max packet length


@dataclass(frozen=True)
class Hit:
    """One access-code candidate."""
    channel: int          # BR channel number
    chan_idx: int         # row in the bits array
    clkn: int             # native slot clock at packet start
    sym_offset: int       # symbol offset within the block's bit stream
    lap: int
    errors: int
    snr_db: float


@dataclass
class BlockResult:
    slot_base: int              # clkn of the block's first slot
    bits: np.ndarray            # (C, n_sym) int8 hard symbols
    snr_db: np.ndarray          # (S, C) per-slot SNR
    hits: list                  # list[Hit], ordered by (offset)
    n_slots: int                # slots advanced by this block


class FrontEnd:
    def __init__(self, sample_rate: float, center_freq: float,
                 squelch_threshold: float = DEFAULT_SNR_DB,
                 block_slots: int = 16, max_ac_errors: int = 6,
                 use_squelch: bool = True):
        self.bank = channelizer.make_bank(sample_rate, center_freq)
        self.weights = snr.make_snr_weights(self.bank)
        self.squelch = squelch_threshold
        self.use_squelch = use_squelch
        self.block_slots = block_slots
        self.max_ac_errors = max_ac_errors
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
        # filter group delay: symbol t in `bits` sits at wideband sample
        # ~ t*sps + (ntaps-1)/2 + decim.  Correct when attributing a
        # detection offset to a slot / clkn (the reference's per-slot work()
        # has no such skew because it re-filters per slot with set_history).
        self.delay_sym = int(round(((b.ntaps - 1) / 2 + b.decim) / b.sps))

        self._jit_step = partial(
            _device_step,
            kernel=jnp.asarray(b.kernel), rot_q=jnp.asarray(b.rot_q),
            on_w=jnp.asarray(self.weights.on_w),
            off_w=jnp.asarray(self.weights.off_w),
            decim=b.decim, sps=b.sps, ch_sps=b.ch_sps,
            demod_gain=b.demod_gain, n_sym=self.n_sym,
            slot_len=self.weights.slot_len,
            max_ac_errors=max_ac_errors)

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
        bits, snr_db, hits_m, err, lapv = self.device_step(x)
        bits = np.asarray(bits)
        snr_db = np.asarray(snr_db)
        hits_m = np.asarray(hits_m)
        err = np.asarray(err)
        lapv = np.asarray(lapv)

        hits: list[Hit] = []
        limit = self.block_slots * SYMBOLS_PER_SLOT
        cs, ts = np.nonzero(hits_m)
        last_end = {}
        for c, t in zip(cs, ts):
            tc = int(t) + self.delay_sym   # group-delay-corrected position
            if t >= limit:
                continue               # next block will own this hit (it
                                       # re-sees raw offsets >= limit at t-limit)
            if t < last_end.get(c, 0):
                continue               # inside a previous AC (sniff skip rule)
            slot = tc // SYMBOLS_PER_SLOT
            s_db = float(snr_db[slot, c]) if slot < snr_db.shape[0] else 0.0
            if self.use_squelch and s_db < self.squelch:
                continue
            last_end[c] = int(t) + SYMBOLS_AC_SHORT
            hits.append(Hit(channel=self.bank.channels[c], chan_idx=int(c),
                            clkn=(slot_base + slot) & 0x7FFFFFF,
                            sym_offset=int(t), lap=int(lapv[c, t]),
                            errors=int(err[c, t]), snr_db=s_db))
        hits.sort(key=lambda h: h.sym_offset)
        return BlockResult(slot_base=slot_base, bits=bits, snr_db=snr_db,
                           hits=hits, n_slots=self.block_slots)

    def packet_symbols(self, res: BlockResult, hit: Hit) -> np.ndarray:
        """Symbol window for a hit (up to 5 slots), for packet decode."""
        end = min(hit.sym_offset + SYMBOLS_FOR_HISTORY, res.bits.shape[1])
        return res.bits[hit.chan_idx, hit.sym_offset:end]

    def stream(self, samples: np.ndarray, start_clkn: int = 0):
        """Iterate BlockResults over a long capture (host numpy input)."""
        samples = np.asarray(samples)
        pos = 0
        slot_base = start_clkn
        while pos + self.block_samples <= len(samples):
            yield self.process_block(samples[pos:pos + self.block_samples],
                                     slot_base)
            pos += self.step_samples
            slot_base += self.block_slots
        # tail: pad the final partial block with zeros
        if pos < len(samples):
            tail = np.zeros(self.block_samples, dtype=np.complex64)
            n = len(samples) - pos
            tail[:n] = samples[pos:]
            yield self.process_block(tail, slot_base)


@partial(jax.jit, static_argnames=("decim", "sps", "ch_sps", "demod_gain",
                                   "n_sym", "slot_len", "max_ac_errors"))
def _device_step(x_ri, kernel, rot_q, on_w, off_w, *, decim, sps, ch_sps,
                 demod_gain, n_sym, slot_len, max_ac_errors):
    yr, yi = channelizer._channelize_impl(x_ri[None], kernel, rot_q, 0,
                                          decim=decim, sps=sps)
    d = demod.quadrature_demod(yr, yi, demod_gain)
    _, bits = demod.recover_symbols(d, ch_sps, n_sym)
    snr_db, _, _ = snr._slot_snr_impl(x_ri, on_w, off_w, slot_len)
    hits, err, lapv = detect._classic_detect_impl(
        bits.astype(jnp.float32), jnp.asarray(detect._A68),
        jnp.asarray(detect._C68v), max_ac_errors, 2)
    return bits, snr_db, hits, err, lapv
