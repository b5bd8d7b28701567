"""Time-sharded streaming frontend over the virtual 8-device CPU mesh: the
halo exchange (+ next-superblock carry) must make every detection — classic
AND LE, including shard- and superblock-boundary packets — identical to the
unsharded stream."""
import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from gr_bluetooth_tpu.constants import SYMBOLS_PER_SLOT
from gr_bluetooth_tpu.models.frontend import FrontEnd
from gr_bluetooth_tpu.parallel.sharded import (ShardedFrontEnd,
                                               measure_scaling_efficiency)
from gr_bluetooth_tpu.testing import PiconetSim, make_piconet_capture

FS, CENTER = 8e6, 2441e6
LAP, UAP = 0x24D952, 0x47


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs >=4 virtual devices")
    return Mesh(np.array(devs[:4]), ("time",))


def _capture_with_le(n_slots):
    """Classic piconet capture + one LE advertising packet in-band."""
    from gr_bluetooth_tpu.core import packets as P
    from gr_bluetooth_tpu.ops import synth as S

    sim = PiconetSim(lap=LAP, uap=UAP, clk0=0x12780)
    samples, sent = make_piconet_capture(sim, n_slots=n_slots, fs=FS,
                                         center_freq=CENTER, seed=5,
                                         tx_slots=range(0, n_slots - 6))
    sps = int(FS // 1e6)
    # LE channel 19 (2440 MHz = BR ch 38) sits in this band; plant the adv
    # packet deep in the SECOND superblock so it crosses the streaming carry
    bits = P.encode_le_adv(0xC0FFEE11, 17, 2, b"\x01\x02\x03\x04")
    le_slot = n_slots - 10
    le = S.synthesize_capture(
        [S.PlannedPacket(channel=38,
                         start_sample=le_slot * SYMBOLS_PER_SLOT * sps,
                         bits=np.concatenate([bits, np.zeros(8, np.uint8)]))],
        n_samples=n_slots * SYMBOLS_PER_SLOT * sps, fs=FS,
        center_freq=CENTER, noise_std=0.0, seed=1)
    return samples + le, sent, le_slot


def _hit_sets(results):
    classic = {(h.clkn, h.channel, h.lap) for r in results for h in r.hits}
    le = {(h.clkn, h.channel) for r in results for h in r.le_hits}
    return classic, le


def test_streaming_sharded_matches_unsharded(mesh):
    """Two superblocks + a partial third: every classic and LE hit matches
    the unsharded stream exactly (no wrap-around caveats)."""
    n_dev = 4
    fe = FrontEnd(FS, CENTER, block_slots=16, enable_le=True)
    n_slots = fe.block_slots * n_dev * 2 + 8    # 136 slots
    samples, sent, le_slot = _capture_with_le(n_slots)

    sfe = ShardedFrontEnd(fe, mesh)
    assert sfe.with_le

    sharded_classic, sharded_le = _hit_sets(sfe.process(samples))
    unsharded_classic, unsharded_le = _hit_sets(list(fe.stream(samples)))

    assert unsharded_classic, "capture should produce classic hits"
    assert sharded_classic == unsharded_classic
    assert unsharded_le, "capture should produce the LE hit"
    assert sharded_le == unsharded_le
    # the planted LE packet is among them, in the second superblock
    assert any(clkn == le_slot for clkn, _ in sharded_le)
    # superblock-boundary slots are present (the streaming carry works)
    boundary = fe.block_slots * n_dev
    assert any(b - 1 <= clkn <= b + 1
               for clkn, _, _ in sharded_classic
               for b in (boundary,))


def test_scaling_efficiency_harness(mesh):
    """The efficiency harness runs and reports a sane ratio; on shared-core
    virtual devices the number is sharding overhead, not real scaling, so
    only sanity-bound it (the recorded figure comes from dryrun_multichip)."""
    fe = FrontEnd(4e6, CENTER, block_slots=8)
    eff = measure_scaling_efficiency(fe, mesh, n_superblocks=2, repeats=3)
    assert eff["n_devices"] == 4
    assert eff["sharded_sps"] > 0 and eff["ideal_sps"] > 0
    assert eff["scan_1dev_sps"] > 0
    assert eff["halo_bytes_per_superblock"] > 0
    # efficiency isolates the halo collective vs an identical zero-comm
    # twin, so it is <= 1 by construction — UNLESS the halo cost is under
    # the timer jitter, which the harness now reports explicitly
    assert 0.05 < eff["efficiency"]
    assert eff["efficiency"] <= 1.02 or eff["noise_floor"], eff


def test_dryrun_multichip_entrypoint():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_entry_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    fn, args = g.entry()
    out = fn(*args)
    jax.block_until_ready(out)


def test_device_put_local_matches_device_put(mesh):
    """Multi-host ingest contract: make_array_from_process_local_data on
    per-process chunks must build the same sharded superblock as a plain
    sharded device_put (on 1 process, local chunk == whole superblock)."""
    fe = FrontEnd(4e6, CENTER, block_slots=8)
    sfe = ShardedFrontEnd(fe, mesh)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, sfe.total_samples)).astype(np.float32) * 0.1
    head = np.zeros((2, sfe.overlap_samples), np.float32)
    out_a = sfe.step(sfe.device_put(x), head)
    out_b = sfe.step(sfe.device_put_local(x), head)
    for a, b in zip(out_a, out_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
