"""Golden end-to-end tests for the four operating modes against synthetic
piconet-consistent captures (the reference's README.first scenarios,
SURVEY §4, with exact ground truth)."""
import numpy as np
import pytest

from gr_bluetooth_tpu.constants import SYMBOLS_PER_SLOT
from gr_bluetooth_tpu.models.lap_survey import LapSurvey
from gr_bluetooth_tpu.models.uap_discovery import UapDiscovery
from gr_bluetooth_tpu.models.sniffer import Sniffer
from gr_bluetooth_tpu.models.hopper import Hopper
from gr_bluetooth_tpu.testing import PiconetSim, make_piconet_capture
from gr_bluetooth_tpu.utils.log import EventBus

FS, CENTER = 8e6, 2441e6
LAP, UAP = 0x24D952, 0x47


def _visible(sent, bank_channels):
    return [(s, c, t) for (s, c, t) in sent if c in bank_channels]


@pytest.fixture(scope="module")
def capture():
    # clk0 chosen so observations cross a CLK bit-15 boundary (changes the
    # hop kernel's c input): without that, clock pairs differing only in
    # c-conjugating bits produce IDENTICAL hop sub-sequences and CLK1-27
    # winnowing provably stalls at 2 candidates (the reference's table-based
    # winnow has the same structural ambiguity).
    sim = PiconetSim(lap=LAP, uap=UAP, clk0=0x12780)
    samples, sent = make_piconet_capture(sim, n_slots=512, fs=FS,
                                         center_freq=CENTER, seed=9)
    return sim, samples, sent


def test_lap_survey_mode(capture):
    """README.first:47 scenario: LAP survey over a capture."""
    sim, samples, sent = capture
    survey = LapSurvey(FS, CENTER, bus=EventBus())
    obs = survey.run(samples, emit_console=False)
    vis = _visible(sent, set(survey.fe.bank.channels))
    assert len(vis) >= 10, "capture should place packets in band"
    assert survey.laps() == {LAP}
    # every visible packet's slot shows up as an observation
    obs_slots = {o.clkn for o in obs}
    sent_slots = {s for s, _, _ in vis}
    assert len(sent_slots & obs_slots) >= 0.9 * len(sent_slots)
    # channels match what was transmitted
    by_slot = {s: c for s, c, _ in vis}
    for o in obs:
        if o.clkn in by_slot:
            assert o.channel == by_slot[o.clkn]


def test_uap_discovery_mode(capture):
    """README.first:54 scenario: UAP discovery by CRC/HEC winnowing."""
    sim, samples, sent = capture
    bus = EventBus()
    mode = UapDiscovery(FS, CENTER, lap=LAP, bus=bus)
    uap = mode.run(samples)
    assert uap == UAP
    # recovered CLK1-6 offset is consistent with the master clock
    pn = mode.piconet
    assert pn.have_clk6
    some_slot = sent[0][0]
    assert ((some_slot + pn.clk_offset) & 0x3F) == ((sim.clk0 + some_slot) & 0x3F)


def test_hopper_mode_acquires_clk27_and_follows(capture):
    """README.first:62-63 scenario: CLK1-27 reversal then live hopping."""
    sim, samples, sent = capture
    bus = EventBus()
    mode = Hopper(FS, CENTER, lap=LAP, bus=bus)
    decoded = mode.run(samples)
    pn = mode.piconet
    assert pn.have_clk27, "CLK1-27 not acquired"
    # offset maps capture slots onto master clock exactly
    assert pn.get_offset() == sim.clk0
    assert len(bus.events("clock_acquired")) == 1
    # after acquisition, packets were followed & decoded on predicted channels
    assert len(decoded) > 0
    for pkt in decoded:
        assert pkt.lap == LAP and pkt.uap == UAP
        assert (pkt.clock & 0x7FFFFFF) == ((sim.clk0 + pkt.clkn) & 0x7FFFFFF)


def test_sniffer_mode_decodes_payloads(capture):
    """README.first:67 scenario: all-piconet sniff with payload decode."""
    sim, samples, sent = capture
    bus = EventBus()
    mode = Sniffer(FS, CENTER, bus=bus, enable_le=False)
    decoded = mode.run(samples)
    assert len(decoded) > 3
    for pkt in decoded:
        assert pkt.lap == LAP and pkt.uap == UAP
        assert pkt.type_name() == "DM1"
        assert pkt.have_payload and pkt.payload is not None
    assert len(bus.events("uap_found")) == 1
    assert bus.events("uap_found")[0]["uap"] == UAP


def test_sniffer_fhs_harvest():
    """An FHS packet instantly restores piconet state (UAP/NAP/clock).

    clk0 is searched deterministically so the FHS slot's hop channel lies
    in the observable band — this test must always RUN (it silently
    skipped in round 1 and the key recovery path went unexercised)."""
    bank_channels = set(Sniffer(FS, CENTER, enable_le=False).fe.bank.channels)
    sim = None
    for clk0 in range(0x51234, 0x51234 + 4096):
        cand = PiconetSim(lap=LAP, uap=UAP, nap=0xBEEF, clk0=clk0)
        if cand.channel_at(10) in bank_channels:
            sim = cand
            break
    assert sim is not None, "no clk0 placing the FHS slot in band (bug)"

    def payload_fn(slot):
        if slot == 10:
            return 2, b"", True       # FHS
        return 3, b"\x11\x22\x33", False

    samples, sent = make_piconet_capture(sim, n_slots=128, fs=FS,
                                         center_freq=CENTER, seed=4,
                                         payload_fn=payload_fn)
    bus = EventBus()
    mode = Sniffer(FS, CENTER, bus=bus, enable_le=False)
    mode.run(samples)
    ev = bus.events("fhs_harvested")
    assert len(ev) >= 1
    assert ev[0]["uap"] == UAP and ev[0]["nap"] == 0xBEEF
    pn = mode.basic_rate_piconets[LAP]
    assert pn.have_clk27 and pn.have_nap
    # FHS clock: CLK2-27 <<1 truncates CLK1; offset correct mod that
    assert (pn.get_offset() - sim.clk0) & 0x7FFFFFD == 0


def test_sniffer_le_path():
    """LE advertising packet on a 2 MHz-grid channel is detected + parsed."""
    from gr_bluetooth_tpu.constants import LE_ADV_AA
    from gr_bluetooth_tpu.core import packets as P
    from gr_bluetooth_tpu.ops import synth as S

    sps = int(FS // 1e6)
    # center 2441 covers BR ch 36..42; BR ch 38 = 2440 MHz is on the LE grid:
    # LE chan 19 -> whitening index 17 (chan2index, packet_impl.cc:1295-1310;
    # a data channel, exact-match detection).
    # LLID lives in header bits 0-1: pdu_type=2 -> LLID=2 (valid).
    bits = P.encode_le_adv(0xC0FFEE11, 17, 2, b"\x01\x02\x03\x04")
    pkt_bits = np.concatenate([bits, np.zeros(8, np.uint8)])
    pkt = S.PlannedPacket(channel=38, start_sample=40 * sps, bits=pkt_bits)
    x = S.synthesize_capture([pkt], n_samples=int(21 * 625 * sps * 2), fs=FS,
                             center_freq=CENTER, noise_std=0.02, seed=6)
    bus = EventBus()
    mode = Sniffer(FS, CENTER, bus=bus, enable_le=True)
    mode.run(x)
    ev = bus.events("le_seen")
    assert len(ev) >= 1
    # noise can produce occasional false positives (the reference's data-
    # channel rule is distance<=0, which random bits pass at ~2^-9/offset);
    # require the true packet among the detections, at the right slot.
    mine = [e for e in ev if e["aa"] == 0xC0FFEE11]
    assert len(mine) == 1
    assert mine[0]["clkn"] == 0


def test_sniffer_le_connection_following():
    """CONNECT_REQ + CSA#1-hopped data packets: the sniffer seeds a
    connection follower from the LLData (new capability; the reference's
    low_energy_piconet is an empty stub, lib/piconet_impl.cc:551-585),
    validates data CRCs with the sniffed CRCInit, and its channel
    predictions match the transmitted hop sequence."""
    from gr_bluetooth_tpu.testing import LeConnectionSim, make_le_connection_capture

    fs, center = 8e6, 2426e6          # covers adv ch 38 + data idx 10, 11
    sim = LeConnectionSim(ch_map=(1 << 10) | (1 << 11), hop_increment=5,
                          interval=6, win_offset=1)
    samples, sent = make_le_connection_capture(sim, n_slots=128, fs=fs,
                                               center_freq=center,
                                               connect_slot=2, n_events=8)
    bus = EventBus()
    mode = Sniffer(fs, center, bus=bus, enable_le=True)
    mode.run(samples)

    conns = bus.events("le_connection")
    assert len(conns) == 1
    assert conns[0]["aa"] == sim.conn_aa
    assert conns[0]["crc_init"] == sim.crc_init
    assert conns[0]["hop"] == sim.hop_increment

    pn = mode.low_energy_piconets[sim.conn_aa]
    n_data_sent = sum(1 for (_, _, kind) in sent if kind == "DATA")
    assert n_data_sent >= 6
    assert pn.crc_ok_count >= n_data_sent - 1   # all in-band data validated
    assert pn.crc_bad_count == 0

    # channel prediction parity against the actual packets
    data = [p for p in mode.le_packets
            if p.aa == sim.conn_aa and p.index < 37]
    assert len(data) >= n_data_sent - 1
    for pkt in data:
        assert pn.predict_channel(pkt.clkn) == pkt.index


def test_hopper_aliased_mode():
    """Aliased (folded-band) receiver: CLK1-27 reversal and live following
    through the 79->25 channel fold (doc/README.aliasing;
    piconet_impl.cc:520-523)."""
    from gr_bluetooth_tpu.testing import make_aliased_capture

    sim = PiconetSim(lap=LAP, uap=UAP, clk0=0x12780)
    samples, sent = make_aliased_capture(sim, n_slots=384, fs=28e6,
                                         center_freq=2440e6, seed=13)
    bus = EventBus()
    mode = Hopper(28e6, 2440e6, lap=LAP, aliased=True, bus=bus)
    decoded = mode.run(samples)
    pn = mode.piconet
    assert pn.aliased
    assert pn.have_clk27, "CLK1-27 not acquired through the fold"
    assert pn.get_offset() == sim.clk0
    assert len(decoded) > 0
    by_slot = {s: (o, t) for s, o, t in sent}
    for pkt in decoded:
        assert pkt.lap == LAP and pkt.uap == UAP
        obs, true = by_slot[pkt.clkn]
        # the hopper demodulated the folded channel...
        assert pkt.channel == obs
        # ...predicted from the true hop channel
        assert int(pn.hop((sim.clk0 + pkt.clkn) & 0x7FFFFFF)) == true
