"""End-to-end DSP chain tests: synth -> channelize -> demod -> detect.

These are the golden-capture tests SURVEY §4 calls for: the reference's
sample .cfiles are stripped, so we synthesize GFSK captures with known
ground truth and assert the detector finds exactly what was planted.
"""
import numpy as np
import pytest

from gr_bluetooth_tpu.core import access_code
from gr_bluetooth_tpu.core.le_tables import LE_CHAN2INDEX
from gr_bluetooth_tpu.core import whitening
from gr_bluetooth_tpu.ops import synth, channelizer, demod, detect, snr
from gr_bluetooth_tpu.utils.bits import host_to_air


def _run_chain(x, bank, group=625):
    yr, yi = channelizer.channelize(x, bank)
    n_sym = int((yr.shape[1] - 4) / bank.ch_sps)
    soft, bits = demod.demod_and_slice(yr, yi, bank.demod_gain, bank.ch_sps,
                                       n_sym, group=group)
    return np.asarray(bits)


def test_bank_channel_selection_matches_reference_rule():
    bank = channelizer.make_bank(8e6, 2476e6)
    # center ch 74, bw 8 -> low edge 70, high edge 78: channels 71..77
    assert bank.channels == tuple(range(71, 78))
    bank2 = channelizer.make_bank(2e6, 2476e6)
    assert bank2.channels == (74,)


@pytest.mark.parametrize("fs,channel", [(2e6, 74), (4e6, 73), (8e6, 77)])
def test_single_packet_detected(fs, channel, rng):
    bank = channelizer.make_bank(fs, 2476e6)
    lap = 0x3A7F01
    bits = np.concatenate([access_code.ac_bits(lap),
                           rng.integers(0, 2, 150).astype(np.uint8)])
    pkt = synth.PlannedPacket(channel=channel, start_sample=3000, bits=bits)
    x = synth.synthesize_capture([pkt], n_samples=int(fs * 0.005), fs=fs,
                                 center_freq=2476e6, noise_std=0.02, seed=2)
    out = _run_chain(x, bank)
    hits, err, lapv = detect.classic_detect(out)
    hits, err, lapv = map(np.asarray, (hits, err, lapv))
    cs, ts = np.nonzero(hits)
    assert len(cs) == 1
    assert bank.channels[cs[0]] == channel
    assert lapv[cs[0], ts[0]] == lap
    assert err[cs[0], ts[0]] <= 2


def test_multiple_packets_multiple_channels(rng):
    bank = channelizer.make_bank(8e6, 2441e6)
    laps = [0x111111, 0x9E8B33, 0x5A5A5A]
    pkts = []
    for i, lap in enumerate(laps):
        bits = np.concatenate([access_code.ac_bits(lap),
                               rng.integers(0, 2, 100).astype(np.uint8)])
        pkts.append(synth.PlannedPacket(channel=bank.channels[2 * i + 1],
                                        start_sample=4000 + 9000 * i, bits=bits))
    x = synth.synthesize_capture(pkts, n_samples=40000, fs=8e6,
                                 center_freq=2441e6, noise_std=0.02, seed=3)
    out = _run_chain(x, bank)
    hits, err, lapv = map(np.asarray, detect.classic_detect(out))
    cs, ts = np.nonzero(hits)
    found = {(bank.channels[c], int(lapv[c, t])) for c, t in zip(cs, ts)}
    want = {(p.channel, lap) for p, lap in zip(pkts, laps)}
    assert want <= found
    assert len(found) == len(want)  # no false detections elsewhere


def test_snr_squelch_separates_active_channel(rng):
    fs = 8e6
    bank = channelizer.make_bank(fs, 2476e6)
    w = snr.make_snr_weights(bank)
    bits = np.concatenate([access_code.ac_bits(0x24D952),
                           rng.integers(0, 2, 500).astype(np.uint8)])
    pkt = synth.PlannedPacket(channel=74, start_sample=0, bits=bits)
    x = synth.synthesize_capture([pkt], n_samples=3 * w.slot_len, fs=fs,
                                 center_freq=2476e6, noise_std=0.02, seed=4)
    snr_db, on, off = map(np.asarray, snr.slot_snr(x, w))
    i74 = bank.channels.index(74)
    # first slot: channel 74 is hot, its SNR dominates every other channel
    others = [snr_db[0, i] for i in range(len(bank.channels)) if i != i74]
    assert snr_db[0, i74] > max(others) + 10
    assert snr_db[0, i74] > 20


def test_detection_with_noise(rng):
    """Packet still detected at moderate noise, with err budget respected."""
    bank = channelizer.make_bank(4e6, 2441e6)
    lap = 0x6F1C2B
    bits = np.concatenate([access_code.ac_bits(lap),
                           rng.integers(0, 2, 100).astype(np.uint8)])
    pkt = synth.PlannedPacket(channel=bank.channels[1], start_sample=2500,
                              bits=bits, amplitude=1.0)
    x = synth.synthesize_capture([pkt], n_samples=20000, fs=4e6,
                                 center_freq=2441e6, noise_std=0.25, seed=5)
    out = _run_chain(x, bank)
    hits, err, lapv = map(np.asarray, detect.classic_detect(out))
    cs, ts = np.nonzero(hits)
    assert any(lapv[c, t] == lap for c, t in zip(cs, ts))


# ---------------------------------------------------------------- LE

def _build_le_adv_bits(index: int, aa: int, pdu_type: int, length: int,
                       payload: np.ndarray) -> np.ndarray:
    """preamble + AA + whitened (header+payload) air bits (ADV channel)."""
    aa_bits = host_to_air(aa, 32)
    # preamble alternates with the first AA bit (valid 9-bit pattern)
    pre9 = 0x155 if aa_bits[0] == 1 else 0x0AA
    preamble = host_to_air(pre9, 9)[:8]
    header = np.zeros(16, dtype=np.uint8)
    header[:4] = host_to_air(pdu_type, 4)
    header[8:14] = host_to_air(length, 6)
    body = np.concatenate([header, np.unpackbits(payload.astype(np.uint8),
                                                 bitorder="little")])
    white = whitening.le_whitening_word(index, len(body))
    return np.concatenate([preamble, aa_bits, body ^ white]).astype(np.uint8)


def test_le_adv_detection(rng):
    from gr_bluetooth_tpu.constants import LE_ADV_AA
    index = 37  # LE channel 0 = 2402 MHz, advertising
    payload = rng.integers(0, 256, 12).astype(np.uint8)
    bits = _build_le_adv_bits(index, LE_ADV_AA, pdu_type=0, length=12,
                              payload=payload)
    stream = rng.integers(0, 2, 1200).astype(np.uint8)
    stream[300:300 + len(bits)] = bits
    hits, dist = map(np.asarray, detect.le_detect(stream, index))
    at = np.nonzero(hits)[0]
    assert 300 in at
    assert dist[300] == 0
