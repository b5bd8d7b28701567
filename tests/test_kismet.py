"""Kismet-equivalent subsystem: frames, tracker, server, source, UI.

Reference behaviors mirrored (kismet/plugin-bluetooth/):
  * 14-byte LAP frame layout (bluetooth_kismet_block.cc:95-110)
  * queue bounded at 20 with drop + wake fd (:107-125)
  * two-sighting tracker rule (tracker_bluetooth.cc:171-189)
  * BTBBDEV blit protocol (tracker_bluetooth.cc:48-127, 209-233)
"""
import select
import socket

import numpy as np
import pytest

from gr_bluetooth_tpu.kismet import (BluetoothNetwork, BtbbDevServer,
                                     FrameQueue, GpsFix, KismetSource,
                                     LapFrame, TrackerBluetooth)
from gr_bluetooth_tpu.kismet.server import format_record, parse_record
from gr_bluetooth_tpu.kismet.ui import render, sort_networks


def test_frame_roundtrip():
    f = LapFrame(lap=0x24D952, channel=39, clkn=7)
    raw = f.pack()
    assert len(raw) == 14
    assert raw[:9] == b"\x00" * 9
    assert raw[9:12] == b"\x24\xd9\x52"
    assert raw[12:14] == b"\xff\xf0"
    g = LapFrame.unpack(raw, channel=39, clkn=7)
    assert g == f
    with pytest.raises(ValueError):
        LapFrame.unpack(b"\x00" * 14)   # wrong ether_type


def test_frame_queue_bound_and_wakefd():
    q = FrameQueue(maxsize=20)
    for i in range(25):
        q.put(LapFrame(lap=i, channel=0))
    assert len(q) == 20 and q.n_dropped == 5
    r, _, _ = select.select([q.wake_fd], [], [], 0)
    assert r == [q.wake_fd]
    frames = q.drain()
    assert len(frames) == 20 and frames[0].lap == 0
    r, _, _ = select.select([q.wake_fd], [], [], 0)
    assert r == []                       # wake cleared by drain
    q.close()


def test_tracker_two_sighting_rule():
    t = TrackerBluetooth(clock=lambda: 100.0)
    assert t.observe(0xABCDEF) is None          # quarantined
    assert 0xABCDEF in t.first_nets and 0xABCDEF not in t.tracked_nets
    net = t.observe(0xABCDEF, when=105.0)
    assert net is not None and net.num_packets == 2
    assert net.first_time == 100.0 and net.last_time == 105.0
    assert net.bd_addr == "00:00:00:ab:cd:ef"
    assert t.observe(0x111111) is None          # independent LAP


def test_tracker_gps_aggregation():
    t = TrackerBluetooth(clock=lambda: 0.0)
    fixes = [GpsFix(37.0, -122.0, 10.0, 1.0), GpsFix(37.2, -122.4, 30.0, 3.0)]
    for g in fixes:
        t.observe(0x5, gps=g)
    net = t.tracked_nets[0x5]
    g = net.gpsdata
    assert (g.min_lat, g.max_lat) == (37.0, 37.2)
    assert (g.min_lon, g.max_lon) == (-122.4, -122.0)
    assert g.aggregate_points == 2
    assert abs(g.aggregate_lat / 2 - 37.1) < 1e-9
    # no-fix observations don't pollute
    t.observe(0x5, gps=GpsFix(0, 0, fix=0))
    assert net.gpsdata.aggregate_points == 2


def test_btbbdev_record_roundtrip():
    t = TrackerBluetooth(clock=lambda: 42.0)
    t.observe(0x24D952)
    t.observe(0x24D952, gps=GpsFix(37.5, -122.25, 12.0, 0.5))
    net = t.tracked_nets[0x24D952]
    rec = parse_record(format_record(net))
    assert rec["bdaddr"] == "00:00:00:24:d9:52"
    assert rec["packets"] == 2 and rec["gpsfixed"] == 1
    assert abs(rec["agglat"] - 37.5) < 1e-6


def test_server_snapshot_and_blit():
    t = TrackerBluetooth(clock=lambda: 1.0)
    t.observe(0x42)
    t.observe(0x42)          # tracked, dirty
    srv = BtbbDevServer(t)
    try:
        c = socket.create_connection(srv.address, timeout=5)
        c.settimeout(5)
        # enable path: snapshot arrives on connect
        line = c.makefile().readline()
        assert parse_record(line)["packets"] == 2
        # timer path: new sighting -> dirty -> tick sends an update
        t.observe(0x42)
        assert srv.tick() == 1
        line = c.makefile().readline()
        assert parse_record(line)["packets"] == 3
        assert srv.tick() == 0            # nothing dirty now
        c.close()
    finally:
        srv.close()


def test_source_end_to_end():
    """Synthetic capture -> KismetSource -> frames + tracked networks."""
    from gr_bluetooth_tpu.testing import PiconetSim, make_piconet_capture

    fs, center = 8e6, 2441e6
    sim = PiconetSim(lap=0x24D952, uap=0x47, clk0=0x12780)
    samples, sent = make_piconet_capture(sim, n_slots=512, fs=fs,
                                         center_freq=center, seed=5)
    src = KismetSource(fs, center, queue=FrameQueue(maxsize=1000),
                       gps_provider=lambda: GpsFix(37.0, -122.0))
    n = src.run(samples)
    bank = set(src.fe.bank.channels)
    in_band = [s for (s, c, _) in sent if c in bank and s >= 1]
    assert len(in_band) >= 5
    assert n >= len(in_band) - 1
    frames = src.queue.drain()
    assert all(f.lap == 0x24D952 for f in frames)
    net = src.tracker.tracked_nets[0x24D952]
    assert net.num_packets == n
    assert net.gpsdata.aggregate_points == n


def test_ui_render_and_sort():
    t = TrackerBluetooth(clock=lambda: 50.0)
    for lap, count in [(0x300000, 3), (0x100000, 5), (0x200000, 2)]:
        for _ in range(count):
            t.observe(lap)
    nets = t.snapshot()
    assert [n.lap for n in sort_networks(nets, "bdaddr")] == \
        [0x100000, 0x200000, 0x300000]
    assert [n.num_packets for n in sort_networks(nets, "packets")] == \
        [5, 3, 2]
    text = render(t, sort="packets", now=60.0)
    assert "00:00:00:10:00:00" in text and "3 nets" in text
    with pytest.raises(ValueError):
        sort_networks(nets, "bogus")


def test_btsurvey_cli(tmp_path):
    """btsurvey end-to-end: synthetic capture -> table + server smoke."""
    import os
    import subprocess
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo)
    r = subprocess.run(
        [sys.executable, "-m", "gr_bluetooth_tpu.kismet", "-r", "8e6",
         "-f", "2441e6", "--synthetic", "128", "--table"],
        capture_output=True, timeout=300, env=env, cwd=repo)
    assert r.returncode == 0, r.stderr.decode()[-500:]
    assert b"00:00:00:24:d9:52" in r.stdout
    assert b"tracked networks" in r.stderr
