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


def test_sniffer_le_recall_before_connect_req():
    """Data packets sniffed BEFORE their CONNECT_REQ are provisionally
    invalid (no CRCInit known), then re-validated once the connection is
    seeded — the LE analog of the classic enqueue->recall structure
    (multi_sniffer_impl.cc:287-318)."""
    from gr_bluetooth_tpu.core.le_tables import LE_INDEX2CHAN
    from gr_bluetooth_tpu.ops import synth as S
    from gr_bluetooth_tpu.testing import LeConnectionSim

    fs, center = 8e6, 2426e6          # covers adv ch 38 + data idx 10, 11
    sim = LeConnectionSim(ch_map=(1 << 10) | (1 << 11), hop_increment=5,
                          interval=6, win_offset=1)
    sps = int(fs // 1e6)
    spslot = SYMBOLS_PER_SLOT * sps

    def br(index):
        return 2 * int(LE_INDEX2CHAN[index])

    rng = np.random.default_rng(7)
    plan = []
    # two data packets transit the stream BEFORE the CONNECT_REQ
    for ev, slot in [(0, 4), (1, 10)]:
        plan.append(S.PlannedPacket(
            channel=br(sim.data_channel(ev)),
            start_sample=slot * spslot + 8 * sps,
            bits=sim.data_bits(ev, bytes(rng.integers(0, 256, 8).tolist()))))
    plan.append(S.PlannedPacket(channel=br(38),
                                start_sample=24 * spslot + 8 * sps,
                                bits=sim.connect_req_bits()))
    samples = S.synthesize_capture(plan, n_samples=40 * spslot, fs=fs,
                                   center_freq=center, noise_std=0.02,
                                   seed=8)
    bus = EventBus()
    mode = Sniffer(fs, center, bus=bus, enable_le=True)
    mode.run(samples)

    assert len(bus.events("le_connection")) == 1
    # observed-at-time validation could not succeed (CRCInit unknown)
    pre = [e for e in bus.events("le_data") if e["aa"] == sim.conn_aa]
    assert len(pre) == 2 and not any(e["crc_ok"] for e in pre)
    # ...but the recall re-validates them against the sniffed CRCInit
    rec = [e for e in bus.events("le_recalled") if e["aa"] == sim.conn_aa]
    assert len(rec) == 2 and all(e["crc_ok"] for e in rec)
    pn = mode.low_energy_piconets[sim.conn_aa]
    assert pn.crc_ok_count == 2 and pn.crc_bad_count == 0


def test_hopper_afh_detect_reset_reacquire():
    """AFH end-to-end: the master hops with the AFH same-channel variant;
    the non-AFH winnow exhausts its candidates, consecutive same-channel
    slots flag looks_like_afh, the exhaustion reset retries with afh=True
    and CLK1-27 is re-acquired (lib/piconet_impl.cc:341-368, 526-547)."""
    sim = PiconetSim(lap=LAP, uap=UAP, clk0=0x12780, afh=True)
    n_slots = 640
    samples, sent = make_piconet_capture(
        sim, n_slots=n_slots, fs=FS, center_freq=CENTER, seed=21,
        tx_slots=range(0, n_slots - 6))   # every slot: TX + same-ch response
    bus = EventBus()
    mode = Hopper(FS, CENTER, lap=LAP, bus=bus)
    decoded = mode.run(samples)
    pn = mode.piconet
    assert pn.afh, "AFH retry never engaged"
    assert len(bus.events("hop_reversal_started")) >= 2, \
        "no exhaustion reset -> re-acquisition cycle"
    assert pn.have_clk27, "CLK1-27 not re-acquired under AFH"
    assert pn.get_offset() == sim.clk0
    assert len(decoded) > 0
    for pkt in decoded:
        assert pkt.lap == LAP and pkt.uap == UAP
        # followed on the AFH (same-channel-pairs) hop sequence
        assert int(pn.hop((sim.clk0 + pkt.clkn) & 0x7FFFFFF)) == pkt.channel


def test_sniffer_rf_path_type_breadth():
    """DH1/DM3/EV3/HV1/AUX1 transit the full synth->frontend->sniffer
    pipeline with decoded-payload assertions (round 1 drove only DM1/FHS
    through RF; parsers: lib/packet_impl.cc:688-1160)."""
    from gr_bluetooth_tpu.utils.bits import air_to_host

    sim = PiconetSim(lap=LAP, uap=UAP, clk0=0x12780)
    bank_channels = set(Sniffer(FS, CENTER, enable_le=False).fe.bank.channels)
    rng = np.random.default_rng(0xD00D)
    specials = [
        (4, "DH1", bytes(rng.integers(0, 256, 10).tolist())),
        (10, "DM3", bytes(rng.integers(0, 256, 30).tolist())),
        (7, "EV3", bytes(rng.integers(0, 256, 8).tolist())),
        (5, "HV1", bytes(rng.integers(0, 256, 10).tolist())),
        (9, "AUX1", bytes(rng.integers(0, 256, 12).tolist())),
    ]
    # assign each special type to an in-band slot after slot 16 (early
    # slots carry DM1s that lock UAP/CLK1-6 via CRC certainty)
    assign, queue = {}, list(specials)
    for slot in range(16, 400, 2):
        if not queue:
            break
        if sim.channel_at(slot) in bank_channels:
            assign[slot] = queue.pop(0)
    assert not queue, "not enough in-band slots for all types"

    def payload_fn(slot):
        if slot in assign:
            t, _, payload = assign[slot]
            return t, payload, False
        return 3, b"\x01\x02\x03\x04", False

    n_slots = max(assign) + 8
    samples, _ = make_piconet_capture(sim, n_slots=n_slots, fs=FS,
                                      center_freq=CENTER, seed=17,
                                      payload_fn=payload_fn,
                                      tx_slots=range(0, n_slots - 6, 2))
    mode = Sniffer(FS, CENTER, bus=EventBus(), enable_le=False)
    decoded = mode.run(samples)

    def body(pkt, nbytes, start_bit):
        return bytes(int(air_to_host(
            pkt.payload[start_bit + 8 * i: start_bit + 8 * (i + 1)]))
            for i in range(nbytes))

    by_slot = {p.clkn: p for p in decoded}
    for slot, (t, name, payload) in assign.items():
        pkt = by_slot.get(slot)
        assert pkt is not None, f"{name} packet at slot {slot} not decoded"
        assert pkt.packet_type == t, (pkt.type_name(), name)
        if t in (4, 9):          # DH1/AUX1: 1-byte payload header
            got = body(pkt, pkt.payload_length - 3, 8)
        elif t == 10:            # DM3: 2-byte payload header
            got = body(pkt, pkt.payload_length - 4, 16)
        elif t == 7:             # EV3: no header, CRC-scanned length
            got = body(pkt, pkt.payload_length - 2, 0)
        else:                    # HV1: fixed 10 bytes, no CRC, no header
            got = body(pkt, 10, 0)
        assert got == payload, f"{name} payload mismatch"


def test_sniffer_multi_piconet_concurrent():
    """Two piconets interleaved in one capture: the sniffer discovers both
    UAPs independently and decodes both streams with no cross-talk — the
    reference's headline contract of decoding everything from every piconet
    concurrently (multi_sniffer_impl.cc:82-166)."""
    from gr_bluetooth_tpu.testing import make_multi_piconet_capture

    LAP2, UAP2 = 0x5A3F71, 0xC3
    sims = [PiconetSim(lap=LAP, uap=UAP, clk0=0x12780),
            PiconetSim(lap=LAP2, uap=UAP2, clk0=0x51234)]
    samples, sent = make_multi_piconet_capture(sims, n_slots=256, fs=FS,
                                               center_freq=CENTER, seed=23)
    bus = EventBus()
    mode = Sniffer(FS, CENTER, bus=bus, enable_le=False)
    decoded = mode.run(samples)

    found = {e["lap"]: e["uap"] for e in bus.events("uap_found")}
    assert found == {LAP: UAP, LAP2: UAP2}

    by_lap = {}
    for p in decoded:
        by_lap.setdefault(p.lap, []).append(p)
    assert set(by_lap) == {LAP, LAP2}
    chan_by_slot = {s: (c, lap) for s, c, lap in sent}
    for sim in sims:
        pkts = by_lap[sim.lap]
        assert len(pkts) >= 3, f"too few decodes for {sim.lap:06x}"
        pn = mode.basic_rate_piconets[sim.lap]
        for p in pkts:
            assert p.uap == sim.uap            # no cross-contamination
            ch, lap = chan_by_slot[p.clkn]
            assert lap == sim.lap and p.channel == ch
            # recovered CLK1-6 offset maps onto this master's clock
            assert ((p.clkn + pn.clk_offset) & 0x3F) == \
                ((sim.clk0 + p.clkn) & 0x3F)


def test_sniffer_rf_path_multislot_types():
    """Multi-slot + remaining packet types (DM5/DH5/EV4/EV5/HV2/DH3)
    through the full RF pipeline with payload assertions
    (parsers: lib/packet_impl.cc:688-1160; EV4 blockwise FEC2/3 scan
    :915-968).  HV3 shares type code 7 with EV3 (already covered)."""
    from gr_bluetooth_tpu.utils.bits import air_to_host

    sim = PiconetSim(lap=LAP, uap=UAP, clk0=0x12780)
    bank_channels = set(Sniffer(FS, CENTER, enable_le=False).fe.bank.channels)
    rng = np.random.default_rng(0xE44)
    specials = [
        (14, "DM5", bytes(rng.integers(0, 256, 80).tolist())),
        (15, "DH5", bytes(rng.integers(0, 256, 120).tolist())),
        (12, "EV4", bytes(rng.integers(0, 256, 60).tolist())),
        (13, "EV5", bytes(rng.integers(0, 256, 100).tolist())),
        (6, "HV2", bytes(rng.integers(0, 256, 20).tolist())),
        (11, "DH3", bytes(rng.integers(0, 256, 60).tolist())),
    ]
    # 6-slot spacing: 5-slot packets must not overlap the next transmission
    assign, queue = {}, list(specials)
    slot = 20
    while queue and slot < 800:
        if sim.channel_at(slot) in bank_channels:
            assign[slot] = queue.pop(0)
            slot += 6
        else:
            slot += 1
    assert not queue, "not enough in-band slots for all types"

    def payload_fn(slot):
        if slot in assign:
            t, _, payload = assign[slot]
            return t, payload, False
        return 3, b"\x01\x02\x03\x04", False

    tx_slots = sorted(list(range(0, 16, 2)) + list(assign))
    n_slots = max(assign) + 8
    samples, _ = make_piconet_capture(sim, n_slots=n_slots, fs=FS,
                                      center_freq=CENTER, seed=29,
                                      payload_fn=payload_fn,
                                      tx_slots=tx_slots)
    mode = Sniffer(FS, CENTER, bus=EventBus(), enable_le=False)
    decoded = mode.run(samples)

    def body(pkt, nbytes, start_bit):
        return bytes(int(air_to_host(
            pkt.payload[start_bit + 8 * i: start_bit + 8 * (i + 1)]))
            for i in range(nbytes))

    by_slot = {p.clkn: p for p in decoded}
    for slot, (t, name, payload) in assign.items():
        pkt = by_slot.get(slot)
        assert pkt is not None, f"{name} packet at slot {slot} not decoded"
        assert pkt.packet_type == t, (pkt.type_name(), name)
        if t in (11, 14, 15):    # DH3/DM5/DH5: 2-byte payload header
            got = body(pkt, pkt.payload_length - 4, 16)
        elif t in (12, 13):      # EV4/EV5: no header, CRC-scanned length
            got = body(pkt, pkt.payload_length - 2, 0)
        else:                    # HV2: fixed 20 bytes, no CRC, no header
            got = body(pkt, 20, 0)
        assert got == payload, f"{name} payload mismatch"


def test_sniffer_rf_path_dv():
    """DV (type 8) through the full RF pipeline: the 80-bit voice field
    AND the DM1-style data field both round-trip — 16/16 classic types
    now transit RF.  The reference only skips the voice bits
    (lib/packet_impl.cc:783-785); decoding them is added capability."""
    from gr_bluetooth_tpu.utils.bits import air_to_host

    sim = PiconetSim(lap=LAP, uap=UAP, clk0=0x12780)
    bank_channels = set(Sniffer(FS, CENTER, enable_le=False).fe.bank.channels)
    rng = np.random.default_rng(0xD5)
    voice = bytes(rng.integers(0, 256, 10).tolist())
    data = bytes(rng.integers(0, 256, 7).tolist())
    dv_slots = [s for s in range(16, 200, 2)
                if sim.channel_at(s) in bank_channels][:3]
    assert dv_slots, "no in-band slots for DV"

    def payload_fn(slot):
        if slot in dv_slots:
            return 8, data, False, voice
        return 3, b"\x01\x02\x03\x04", False

    n_slots = max(dv_slots) + 8
    samples, _ = make_piconet_capture(sim, n_slots=n_slots, fs=FS,
                                      center_freq=CENTER, seed=31,
                                      payload_fn=payload_fn,
                                      tx_slots=range(0, n_slots - 6, 2))
    # batched steady-state path (default) AND scalar path must both
    # carry the voice field
    for batch in (True, False):
        mode = Sniffer(FS, CENTER, bus=EventBus(), enable_le=False,
                       batch_decode=batch)
        decoded = mode.run(samples)
        by_slot = {p.clkn: p for p in decoded}
        for slot in dv_slots:
            pkt = by_slot.get(slot)
            assert pkt is not None, f"DV at slot {slot} not decoded"
            assert pkt.packet_type == 8
            assert pkt.voice_bytes() == voice, "voice field mismatch"
            got = bytes(int(air_to_host(pkt.payload[8 + 8 * i:
                                                    16 + 8 * i]))
                        for i in range(pkt.payload_length - 3))
            assert got == data, "DV data field mismatch"
            assert pkt._payload_crc_ok()


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


def test_sniffer_le_connection_following_csa2():
    """BT5 connection (ChSel=1 on the CONNECT_IND): the follower selects
    channels with CSA#2's AA-seeded PRN (core/le_ll.py, BT 5.0 §4.5.8.3)
    instead of CSA#1's linear hop.  Entirely beyond the reference (its LE
    piconet is an empty stub, lib/piconet_impl.cc:551-585)."""
    from gr_bluetooth_tpu.testing import LeConnectionSim, make_le_connection_capture

    fs, center = 8e6, 2426e6          # covers adv ch 38 + data idx 10, 11
    sim = LeConnectionSim(ch_map=(1 << 10) | (1 << 11), ch_sel=1,
                          interval=6, win_offset=1)
    samples, sent = make_le_connection_capture(sim, n_slots=128, fs=fs,
                                               center_freq=center,
                                               connect_slot=2, n_events=8)
    bus = EventBus()
    mode = Sniffer(fs, center, bus=bus, enable_le=True)
    mode.run(samples)

    conns = bus.events("le_connection")
    assert len(conns) == 1 and conns[0]["aa"] == sim.conn_aa

    pn = mode.low_energy_piconets[sim.conn_aa]
    assert pn.ch_sel == 1
    n_data_sent = sum(1 for (_, _, kind) in sent if kind == "DATA")
    assert n_data_sent >= 6
    assert pn.crc_ok_count >= n_data_sent - 1
    assert pn.crc_bad_count == 0

    data = [p for p in mode.le_packets
            if p.aa == sim.conn_aa and p.index < 37]
    assert len(data) >= n_data_sent - 1
    for pkt in data:
        assert pn.predict_channel(pkt.clkn) == pkt.index


def test_csa2_requires_both_chsel_bits():
    """BT 5.0 Vol 6 Part B §4.5.8: the connection uses CSA#2 only when
    BOTH the advertiser's PDU and the initiator's CONNECT_IND set ChSel.
    A BT5 initiator connecting to a LEGACY advertiser (ADV_IND ChSel=0)
    must be followed with CSA#1 (round-3 ADVICE fix)."""
    from gr_bluetooth_tpu.core import le_ll, packets as P
    from gr_bluetooth_tpu.ops import synth as S
    from gr_bluetooth_tpu.testing import (LeConnectionSim,
                                          make_le_connection_capture)
    from gr_bluetooth_tpu.constants import SYMBOLS_PER_SLOT

    class LegacyAdvSim(LeConnectionSim):
        """ChSel=1 on the CONNECT_IND but the real hops are CSA#1 (the
        spec outcome when the advertiser did not offer CSA#2)."""
        def data_channel(self, event):
            unmapped = ((event + 1) * self.hop_increment) % 37
            return int(le_ll.csa1_channel(np.int64(unmapped), self.ch_map))

    fs, center = 8e6, 2426e6
    sim = LegacyAdvSim(ch_map=(1 << 10) | (1 << 11), ch_sel=1,
                       interval=6, win_offset=1)
    samples, sent = make_le_connection_capture(sim, n_slots=128, fs=fs,
                                               center_freq=center,
                                               connect_slot=4, n_events=8)
    # overlay the legacy advertiser's ADV_IND (ChSel=0) before the
    # CONNECT_IND, same AdvA, on advertising channel 38 (in band)
    sps = int(fs // 1e6)
    from gr_bluetooth_tpu.core.le_tables import LE_INDEX2CHAN
    adv_bits = P.encode_le_adv(0x8E89BED6, 38, 0,
                               sim.adv_a + b"\x02\x01\x06", ch_sel=0)
    adv = S.synthesize_capture(
        [S.PlannedPacket(channel=2 * int(LE_INDEX2CHAN[38]),
                         start_sample=SYMBOLS_PER_SLOT * sps,
                         bits=np.concatenate([adv_bits,
                                              np.zeros(8, np.uint8)]))],
        n_samples=len(samples), fs=fs, center_freq=center,
        noise_std=0.0, seed=9)
    bus = EventBus()
    mode = Sniffer(fs, center, bus=bus, enable_le=True)
    mode.run(samples + adv)

    pn = mode.low_energy_piconets[sim.conn_aa]
    assert pn.is_connection
    assert pn.ch_sel == 0, "legacy advertiser must force CSA#1"
    data = [p for p in mode.le_packets
            if p.aa == sim.conn_aa and p.index < 37]
    assert len(data) >= 5
    for pkt in data:
        assert pn.predict_channel(pkt.clkn) == pkt.index
