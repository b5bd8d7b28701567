"""Concurrency tests for the native SPSC/drop-oldest ring (native/btio.cc)
and the LiveSource wrapper — closing SURVEY §5's A2 gap at the level the
reference's own pthread queue needed (bluetooth_kismet_block.cc:107-120)."""
import ctypes
import os
import threading
import time

import numpy as np
import pytest

from gr_bluetooth_tpu.io import native

lib = native.load()
pytestmark = pytest.mark.skipif(lib is None,
                                reason="native toolchain unavailable")

CAP = 1 << 20


def _writer(fd: int, data: bytes, chunk: int = 1 << 16):
    for i in range(0, len(data), chunk):
        os.write(fd, data[i:i + chunk])
    os.close(fd)


def test_ring_backpressure_stress_byte_exact():
    """Producer thread floods 4 MB through a 1 MB backpressure ring while
    the consumer pops random sizes concurrently: byte-exact delivery."""
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, 4 << 20, dtype=np.uint8).tobytes()
    rfd, wfd = os.pipe()
    t = threading.Thread(target=_writer, args=(wfd, data))
    t.start()
    ring = lib.bt_ring_create(rfd, CAP, 0)
    buf = ctypes.create_string_buffer(1 << 16)
    out = bytearray()
    sizes = rng.integers(1, 1 << 16, 4096).tolist()
    i = 0
    while True:
        n = lib.bt_ring_pop(ring, buf, sizes[i % len(sizes)])
        i += 1
        if n < 0:
            break
        out += buf.raw[:n]
    t.join()
    overruns = lib.bt_ring_overruns(ring)
    lib.bt_ring_destroy(ring)
    assert bytes(out) == data
    assert overruns == 0, "backpressure mode must never drop"


def test_ring_drop_mode_keeps_newest_exact():
    """Drop-oldest arithmetic: with no consumer running, after writing 3 MB
    through a 1 MB ring the ring must hold EXACTLY the newest 1 MB and
    account every dropped byte (the round-1 drop branch over-advanced tail
    by the incoming remainder)."""
    rng = np.random.default_rng(2)
    total = 3 * CAP + 12345          # deliberately not chunk-aligned
    data = rng.integers(0, 256, total, dtype=np.uint8).tobytes()
    rfd, wfd = os.pipe()
    t = threading.Thread(target=_writer, args=(wfd, data))
    t.start()
    ring = lib.bt_ring_create(rfd, CAP, 1)
    t.join()
    # wait for the pump thread to drain the pipe to EOF
    deadline = time.time() + 10
    while time.time() < deadline:
        avail = lib.bt_ring_available(ring)
        dropped = lib.bt_ring_dropped(ring)
        if avail + dropped == total:
            break
        time.sleep(0.01)
    assert lib.bt_ring_available(ring) == CAP
    assert lib.bt_ring_dropped(ring) == total - CAP
    assert lib.bt_ring_overruns(ring) > 0
    buf = ctypes.create_string_buffer(CAP)
    got = bytearray()
    while True:
        n = lib.bt_ring_pop(ring, buf, CAP)
        if n <= 0:
            break
        got += buf.raw[:n]
    lib.bt_ring_destroy(ring)
    assert bytes(got) == data[-CAP:], "ring must keep the NEWEST samples"


def test_ring_drop_mode_concurrent_conservation():
    """Producer floods 8 MB while a slow consumer pops concurrently (both
    sides CAS `tail`): every byte is either delivered or counted dropped,
    and delivered bytes are an untorn suffix-subsequence of the input."""
    total = 8 << 20
    # 8-byte little-endian counters so delivered data is checkable
    data = np.arange(total // 8, dtype=np.uint64).tobytes()
    rfd, wfd = os.pipe()
    t = threading.Thread(target=_writer, args=(wfd, data))
    t.start()
    ring = lib.bt_ring_create(rfd, CAP, 1)
    buf = ctypes.create_string_buffer(1 << 14)
    out = bytearray()
    while True:
        n = lib.bt_ring_pop(ring, buf, 1 << 14)
        if n < 0:
            break
        if n == 0:
            time.sleep(0.0005)
            continue
        out += buf.raw[:n]
        time.sleep(0.0002)            # force the producer ahead
    t.join()
    dropped = lib.bt_ring_dropped(ring)
    assert lib.bt_ring_overruns(ring) > 0, "consumer never fell behind"
    lib.bt_ring_destroy(ring)
    assert len(out) + dropped == total, "bytes must be delivered or counted"
    # torn-read check: drops land at arbitrary byte offsets, so scan the
    # delivered stream at all 8 alignments; counter values must be strictly
    # increasing wherever consecutive 8-byte words are both valid counters
    arr = np.frombuffer(bytes(out), dtype=np.uint8)
    best = None
    for align in range(8):
        usable = (len(arr) - align) // 8 * 8
        words = arr[align:align + usable].view(np.uint64)
        valid = words < (total // 8)
        if best is None or valid.sum() > best[1]:
            best = (words, valid.sum())
    words, _ = best
    valid = words < (total // 8)
    both = valid[:-1] & valid[1:]
    pairs_increasing = (words[1:][both] > words[:-1][both])
    # the overwhelming majority of adjacent valid pairs must be ordered
    # (only bytes straddling a drop boundary may break monotonicity)
    assert pairs_increasing.mean() > 0.99


def test_live_source_pipe_overrun_bounded():
    """LiveSource on a pipe fed faster than consumption: memory stays
    bounded by the ring, overruns are counted, and dropped samples are
    surfaced into the metrics registry (the TPU-host stand-in for the
    reference's live osmosdr source, apps/btrx:88-120)."""
    from gr_bluetooth_tpu.io.sources import LiveSource
    from gr_bluetooth_tpu.utils.metrics import Metrics

    total_samples = (4 << 20) // 8    # 4 MB of complex64
    iq = (np.random.default_rng(5).standard_normal(2 * total_samples)
          .astype(np.float32)).view(np.complex64).tobytes()
    rfd, wfd = os.pipe()
    t = threading.Thread(target=_writer, args=(wfd, iq))
    t.start()
    m = Metrics()
    src = LiveSource(rfd, chunk_samples=4096, ring_mb=1, metrics=m)
    os.close(rfd)
    got = 0
    for i, chunk in enumerate(src):
        assert chunk.shape == (2, 4096)
        got += 4096
        if i < 20:
            time.sleep(0.002)         # fall behind early on
    t.join()
    assert src.overruns > 0, "consumer never fell behind"
    assert src.dropped_bytes > 0
    # conservation: delivered + dropped + (pending remainder < one chunk)
    delivered = got * 8
    assert delivered + src.dropped_bytes <= len(iq)
    assert delivered + src.dropped_bytes > len(iq) - 4096 * 8
    snap = m.snapshot()
    assert snap["counters"].get("samples_dropped", 0) == \
        src.dropped_bytes // 8
    src.close()


def test_idle_source_does_not_spin():
    """A starved LiveSource sleeps on the ring's condvar instead of
    burning a host core: CPU time over an idle second must be a small
    fraction of wall time (the wake pattern of the Kismet plugin's
    socketpair, bluetooth_kismet_block.cc:107-120 — previously the
    consumer busy-polled bt_ring_pop)."""
    from gr_bluetooth_tpu.io.sources import LiveSource
    from gr_bluetooth_tpu.utils.metrics import Metrics

    rfd, wfd = os.pipe()
    src = LiveSource(rfd, chunk_samples=4096, ring_mb=1, metrics=Metrics())
    os.close(rfd)
    got = []

    def consume():
        for chunk in src.iter_raw():
            got.append(chunk)

    t = threading.Thread(target=consume)
    c0 = time.process_time()
    w0 = time.time()
    t.start()
    time.sleep(1.0)                   # pipe stays empty: consumer idles
    cpu_idle = time.process_time() - c0
    wall = time.time() - w0
    # a busy-spin burns ~1 core (cpu ~= wall); the condvar wait is ~0
    assert cpu_idle < 0.25 * wall, (cpu_idle, wall)
    # data still flows after the idle period, then EOF terminates
    os.write(wfd, b"\0" * (4096 * 8))
    os.close(wfd)
    t.join(timeout=5)
    assert not t.is_alive()
    assert len(got) == 1 and got[0].shape == (4096, 2)
    src.close()


def test_btbbdev_server_concurrent_clients_during_tick():
    """BTBBDEV server: clients connect (snapshot blits on the accept
    thread) while the processing thread observes + ticks at full rate —
    every record received by every client must parse cleanly and the final
    per-LAP packet counts must be exact."""
    import socket

    from gr_bluetooth_tpu.kismet.server import BtbbDevServer, parse_record
    from gr_bluetooth_tpu.kismet.tracker import TrackerBluetooth

    tracker = TrackerBluetooth(clock=lambda: 1000.0)
    srv = BtbbDevServer(tracker)
    host, port = srv.address
    LAPS = [0x111111, 0x222222, 0x333333, 0x444444]
    N_PER_LAP = 500
    stop = threading.Event()
    errors: list = []
    received: list[bytes] = []

    def client(idx):
        try:
            time.sleep(0.01 * idx)    # stagger connects mid-stream
            s = socket.create_connection((host, port), timeout=5)
            s.settimeout(0.2)
            chunks = []
            while not stop.is_set():
                try:
                    b = s.recv(65536)
                except socket.timeout:
                    continue
                if not b:
                    break
                chunks.append(b)
            # drain whatever is still in flight
            try:
                while True:
                    b = s.recv(65536)
                    if not b:
                        break
                    chunks.append(b)
            except socket.timeout:
                pass
            s.close()
            received.append(b"".join(chunks))
        except Exception as e:          # noqa: BLE001 - collected for assert
            errors.append(e)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    # processing thread: observe + tick at full rate
    for i in range(N_PER_LAP):
        for lap in LAPS:
            tracker.observe(lap)
        srv.tick()
    time.sleep(0.3)                   # let the last blits flush
    srv.tick()
    time.sleep(0.2)
    stop.set()
    for t in threads:
        t.join(timeout=5)
    srv.close()

    assert not errors, errors
    assert len(received) == 4
    final_counts = {}
    for blob in received:
        lines = blob.decode().splitlines()
        assert lines, "client received nothing"
        for line in lines:
            rec = parse_record(line + "\n" if not line.endswith("\n")
                               else line)   # parse asserts field integrity
            final_counts[rec["bdaddr"]] = max(
                final_counts.get(rec["bdaddr"], 0), rec["packets"])
    # every LAP reached every client with a consistent final count
    for lap in LAPS:
        bd = (f"00:00:00:{(lap >> 16) & 0xff:02x}:"
              f"{(lap >> 8) & 0xff:02x}:{lap & 0xff:02x}")
        assert final_counts.get(bd) == N_PER_LAP, (bd, final_counts.get(bd))


def test_live_source_i4_wire():
    """LiveSource speaks the 1-byte-per-complex-sample int4 wire: chunk
    shapes are 1-D packed bytes, round-tripping the nibble codec."""
    from gr_bluetooth_tpu.io.ingest import wire_decode_np, wire_encode
    from gr_bluetooth_tpu.io.sources import LiveSource

    rng = np.random.default_rng(11)
    x = (rng.standard_normal((2, 64 * 1024)) * 0.4).astype(np.float32)
    packed = wire_encode(x, "i4")
    rfd, wfd = os.pipe()
    t = threading.Thread(target=_writer, args=(wfd, packed.tobytes()))
    t.start()
    src = LiveSource(rfd, chunk_samples=4096, ring_mb=4, wire="i4")
    os.close(rfd)
    got = []
    for chunk in src.iter_raw():
        assert chunk.shape == (4096,) and chunk.dtype == np.uint8
        got.append(chunk)
    t.join()
    src.close()
    rec = wire_decode_np(np.concatenate(got), "i4")
    want = wire_decode_np(packed[: rec.shape[1]], "i4")
    assert np.array_equal(rec[:, : want.shape[1]], want)
