"""Full-band (79-channel, 80 Msps) functional smoke on CPU: packets on
distant channels 0 / 40 / 78 plus one LE advertising channel must all come
through the PFB channelizer with correct channel attribution — catches
channel-indexing / LE-row bugs the 8 Msps e2e tests cannot see (bench.py
runs this configuration on TPU but only checks classic LAP parity)."""
import numpy as np
import pytest

from gr_bluetooth_tpu.constants import SYMBOLS_PER_SLOT
from gr_bluetooth_tpu.core import packets as P
from gr_bluetooth_tpu.models.frontend import FrontEnd
from gr_bluetooth_tpu.ops import synth as S

FS, CENTER = 80e6, 2441e6
LAP, UAP = 0x24D952, 0x47


@pytest.fixture(scope="module")
def fullband_run():
    fe = FrontEnd(FS, CENTER, block_slots=8, enable_le=True)
    assert fe.bank.n_channels == 79
    sps = int(FS // 1e6)
    plan, want = [], []
    rng = np.random.default_rng(3)
    # classic packets on the band edges and center
    for slot, ch in [(1, 0), (2, 40), (3, 78), (4, 0), (5, 78)]:
        bits = P.encode_classic_packet(LAP, UAP, slot, 3,
                                       bytes(rng.integers(0, 256, 6).tolist()))
        plan.append(S.PlannedPacket(channel=ch,
                                    start_sample=slot * SYMBOLS_PER_SLOT * sps
                                    + 10 * sps, bits=bits))
        want.append((slot, ch))
    # one LE advertising packet: LE channel 39 = 2480 MHz = BR channel 78
    le_bits = P.encode_le_adv(0x8E89BED6, 39, 0, b"\x11" * 8)
    plan.append(S.PlannedPacket(
        channel=78, start_sample=6 * SYMBOLS_PER_SLOT * sps + 10 * sps,
        bits=np.concatenate([le_bits, np.zeros(8, np.uint8)])))
    x = S.synthesize_capture(plan, n_samples=16 * SYMBOLS_PER_SLOT * sps,
                             fs=FS, center_freq=CENTER, noise_std=0.02,
                             seed=3)
    results = list(fe.stream(x))
    return fe, results, want


def test_fullband_classic_channels(fullband_run):
    fe, results, want = fullband_run
    got = {(h.clkn, h.channel): h for r in results for h in r.hits}
    for slot, ch in want:
        assert (slot, ch) in got, f"missed packet at slot {slot} ch {ch}"
        assert got[(slot, ch)].lap == LAP
        assert got[(slot, ch)].errors == 0
    # at the sniffing tolerance (6 AC errors) a 79-channel block has a
    # small noise-FP budget — those carry high error counts and are
    # screened by header_present() downstream; at <=2 errors the planted
    # set must be exact
    strict = {k for k, h in got.items() if h.errors <= 2}
    assert strict == set(want)


def test_fullband_le_row(fullband_run):
    fe, results, want = fullband_run
    le = [h for r in results for h in r.le_hits]
    assert any(h.channel == 78 and h.index == 39 and h.clkn == 6
               for h in le), le


def test_fullband_payload_decode(fullband_run):
    """A band-edge packet decodes end-to-end (channel 0 and 78 rows)."""
    from gr_bluetooth_tpu.core.packets import ClassicPacket

    fe, results, want = fullband_run
    decoded = 0
    for r in results:
        for h in r.hits:
            if h.errors > 2:        # noise FP; screened by header_present
                continue
            pkt = ClassicPacket(symbols=fe.packet_symbols(r, h),
                                clkn=h.clkn, channel=h.channel, snr=h.snr_db)
            assert pkt.lap == LAP
            assert pkt.header_present()
            pkt.set_clock(h.clkn, True)
            pkt.set_uap(UAP)
            if pkt.decode():
                decoded += 1
    assert decoded >= 4
