"""Fixed-size hit tables under pressure: overflow must be *reported*
(hits_dropped / le_hits_dropped counters + warning), never silent — the
reference's sequential scan cannot drop hits (multi_sniffer_impl.cc:107-149),
so the dense design owes the operator a signal."""
import logging

import numpy as np
import pytest

from gr_bluetooth_tpu.constants import SYMBOLS_PER_SLOT
from gr_bluetooth_tpu.models.frontend import FrontEnd
from gr_bluetooth_tpu.testing import PiconetSim, make_piconet_capture
from gr_bluetooth_tpu.utils.metrics import metrics

FS, CENTER = 8e6, 2441e6
LAP, UAP = 0x24D952, 0x47


def test_classic_hit_table_overflow_reported(caplog):
    """More planted packets than table rows: the drop count is surfaced."""
    from gr_bluetooth_tpu.core import packets as P
    from gr_bluetooth_tpu.ops import synth as S

    fe = FrontEnd(FS, CENTER, block_slots=16, max_hits=4)
    sps = int(FS // 1e6)
    chans = list(fe.bank.channels)[1:-1]
    plan, sent = [], []
    rng = np.random.default_rng(7)
    for slot in range(1, 13):
        ch = chans[slot % len(chans)]
        bits = P.encode_classic_packet(LAP, UAP, slot, 3,
                                       bytes(rng.integers(0, 256, 5).tolist()))
        plan.append(S.PlannedPacket(channel=ch,
                                    start_sample=slot * SYMBOLS_PER_SLOT * sps
                                    + 8 * sps, bits=bits))
        sent.append((slot, ch))
    x = S.synthesize_capture(plan, n_samples=24 * SYMBOLS_PER_SLOT * sps,
                             fs=FS, center_freq=CENTER, noise_std=0.02,
                             seed=7)
    metrics.reset()
    with caplog.at_level(logging.WARNING, logger="grbt.frontend"):
        results = list(fe.stream(x))
    assert len(sent) > 4, "flood should exceed the table"
    assert metrics.counters["hits_dropped"] > 0
    assert any("hit table overflow" in r.message for r in caplog.records)
    # the hits that fit are still real detections
    got = {(h.clkn, h.channel) for r in results for h in r.hits}
    assert got and got <= set(sent)


def test_le_hit_table_overflow_reported(caplog):
    """LE flood: a tiny LE table drops hits loudly and the planted true
    hit is either reported or counted dropped."""
    from gr_bluetooth_tpu.core import packets as P
    from gr_bluetooth_tpu.ops import synth as S

    sps = int(FS // 1e6)
    plan = []
    # true packet early on LE data channel 17 (BR ch 38 @ 2440 MHz)
    true_bits = P.encode_le_adv(0xC0FFEE11, 17, 2, b"\x01\x02\x03\x04")
    plan.append(S.PlannedPacket(
        channel=38, start_sample=2 * SYMBOLS_PER_SLOT * sps,
        bits=np.concatenate([true_bits, np.zeros(8, np.uint8)])))
    # flood: more LE packets than the forced table size
    for k in range(8):
        bits = P.encode_le_adv(0xA0000000 + k, 17, 2, bytes([k] * 4))
        plan.append(S.PlannedPacket(
            channel=38, start_sample=(4 + k) * SYMBOLS_PER_SLOT * sps,
            bits=np.concatenate([bits, np.zeros(8, np.uint8)])))
    x = S.synthesize_capture(plan, n_samples=24 * SYMBOLS_PER_SLOT * sps,
                             fs=FS, center_freq=CENTER, noise_std=0.02,
                             seed=8)
    fe = FrontEnd(FS, CENTER, block_slots=16, enable_le=True, max_le_hits=3)
    metrics.reset()
    with caplog.at_level(logging.WARNING, logger="grbt.frontend"):
        results = list(fe.stream(x))
    n_le = sum(len(r.le_hits) for r in results)
    dropped = metrics.counters["le_hits_dropped"]
    assert dropped > 0
    assert any("LE hit table overflow" in r.message for r in caplog.records)
    assert n_le + dropped >= 9      # everything accounted for


def test_le_table_sized_from_fp_budget():
    """Default LE table capacity covers the exact-match false-positive
    expectation (rows x offsets x 2^-9) with margin, CAPPED at 512 —
    round 4's uncapped budget reached 12.5k rows at full band, making
    the LE extraction top_k and window gather the dominant device cost;
    beyond-cap floods are detected, counted, and logged instead
    (assemble_block + metrics 'le_hits_dropped')."""
    fe = FrontEnd(FS, CENTER, block_slots=64, enable_le=True)
    n_data_rows = sum(1 for r in fe.le_rows if r[2] < 37)
    fp = n_data_rows * fe.n_sym / 512.0
    assert fe.max_le_hits >= min(4 * fp, 512)
    assert fe.max_le_hits <= 1024
