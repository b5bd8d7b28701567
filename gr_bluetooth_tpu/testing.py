"""Golden-capture builders: piconet-consistent synthetic wideband IQ.

The reference's integration story was real captures (samples/*.cfile,
stripped from the snapshot); we synthesize captures where every packet is
hop/clock/whitening-consistent with a simulated master, so tests can assert
exact UAP/clock recovery (SURVEY §4).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .constants import SYMBOLS_PER_SLOT
from .core import hop, packets
from .ops import synth

__all__ = ["PiconetSim", "make_piconet_capture"]


@dataclass
class PiconetSim:
    lap: int
    uap: int
    nap: int = 0x1234
    clk0: int = 0          # master CLK1-27 at capture slot 0
    afh: bool = False

    def __post_init__(self):
        self._consts = hop.address_precalc(
            ((self.uap << 24) | self.lap) & 0xFFFFFFF)

    def channel_at(self, slot: int) -> int:
        return int(hop.hop((self.clk0 + slot) & 0x7FFFFFF, self._consts,
                           afh=self.afh))

    def packet_bits(self, slot: int, type_code: int = 3,
                    payload: bytes = b"\x01\x02\x03",
                    fhs: bool = False) -> np.ndarray:
        clk = (self.clk0 + slot) & 0x7FFFFFF
        if fhs:
            return packets.encode_fhs_packet(self.lap, self.uap, self.nap,
                                             clock=clk, clk27_value=clk)
        return packets.encode_classic_packet(self.lap, self.uap, clk,
                                             type_code, payload)


def make_piconet_capture(sim: PiconetSim, n_slots: int, fs: float,
                         center_freq: float, tx_slots=None,
                         payload_fn=None, noise_std: float = 0.02,
                         seed: int = 0, jitter_symbols: int = 5):
    """Synthesize a capture of `n_slots`; master transmits on `tx_slots`
    (default: every even slot) at the hop channel of its clock.

    Returns (samples, sent) where sent = [(slot, channel, type_code)] for
    packets actually placed (all of them; filter by the bank's coverage in
    tests)."""
    sps = int(round(fs / 1e6))
    spslot = SYMBOLS_PER_SLOT * sps
    if tx_slots is None:
        tx_slots = range(0, n_slots - 6, 2)
    plan, sent = [], []
    rng = np.random.default_rng(seed ^ 0x5EED)
    for slot in tx_slots:
        ch = sim.channel_at(slot)
        if payload_fn is not None:
            type_code, payload, fhs = payload_fn(slot)
        else:
            type_code, payload, fhs = 3, bytes(rng.integers(0, 256, 9).tolist()), False
        bits = sim.packet_bits(slot, type_code, payload, fhs=fhs)
        start = slot * spslot + int(rng.integers(0, jitter_symbols)) * sps
        plan.append(synth.PlannedPacket(channel=ch, start_sample=start,
                                        bits=bits))
        sent.append((slot, ch, 2 if fhs else type_code))
    samples = synth.synthesize_capture(plan, n_samples=n_slots * spslot,
                                       fs=fs, center_freq=center_freq,
                                       noise_std=noise_std, seed=seed)
    return samples, sent
