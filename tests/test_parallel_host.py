"""ParallelHostDecoder parity: the per-LAP multiprocess decode pool must
produce exactly the packets the single-process Sniffer decodes, on a
multi-piconet capture that exercises discovery, recall, and steady
state in every worker."""
import numpy as np
import pytest

from gr_bluetooth_tpu.models.parallel_host import ParallelHostDecoder
from gr_bluetooth_tpu.models.sniffer import Sniffer
from gr_bluetooth_tpu.testing import PiconetSim, make_multi_piconet_capture

LAPS = [(0x24D952, 0x47), (0x1A2B3C, 0x99), (0x654321, 0x13)]


def test_parallel_matches_sniffer():
    sims = [PiconetSim(lap=lap, uap=uap, clk0=0x100 * (i + 3))
            for i, (lap, uap) in enumerate(LAPS)]
    samples, sent = make_multi_piconet_capture(
        sims, n_slots=48, fs=4e6, center_freq=2441e6, seed=7,
        noise_std=0.02)
    x = np.stack([samples.real, samples.imag]).astype(np.float32)

    sn = Sniffer(4e6, 2441e6, block_slots=16, enable_le=False)
    blocks = list(sn.fe.stream(x))
    sn.run_blocks(iter(blocks))
    want = sorted((p.lap, p.uap, p.clkn, p.channel, p.packet_type,
                   p.payload_length,
                   None if p.payload is None
                   else np.packbits(p.payload).tobytes())
                  for p in sn.decoded)
    assert want, "oracle decoded nothing"

    with ParallelHostDecoder(n_workers=3) as pool:
        got = pool.drive(sn.fe, iter(blocks))
    got_t = sorted((d.lap, d.uap, d.clkn, d.channel, d.packet_type,
                    d.payload_length, d.payload) for d in got)
    assert got_t == want