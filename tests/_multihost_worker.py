"""Worker process for tests/test_multihost.py: joins a 2-process
jax.distributed CPU cluster (4 virtual devices each -> 8 global), feeds
its OWN contiguous time chunk through ShardedFrontEnd.device_put_local,
streams two superblocks, and (process 0) dumps the assembled hits.

This executes the real multi-host ingest contract
(parallel/sharded.py:device_put_local) — under a single process
make_array_from_process_local_data degenerates to device_put, so only a
genuinely multi-process run exercises the cross-host array assembly.
"""
import json
import os
import sys


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    out_path = sys.argv[3]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=4")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=pid)
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from gr_bluetooth_tpu.models.frontend import FrontEnd
    from gr_bluetooth_tpu.parallel.sharded import ShardedFrontEnd
    from gr_bluetooth_tpu.testing import PiconetSim, make_piconet_capture

    assert len(jax.devices()) == 8, jax.devices()
    fe = FrontEnd(4e6, 2441e6, block_slots=8)
    mesh = Mesh(np.array(jax.devices()), ("time",))
    sfe = ShardedFrontEnd(fe, mesh)

    # both processes synthesize the same deterministic capture
    sim = PiconetSim(lap=0x24D952, uap=0x47, clk0=0x12780)
    n_super = 2
    n_slots = sfe.superblock_slots * n_super + 8
    samples, _ = make_piconet_capture(
        sim, n_slots=n_slots, fs=4e6, center_freq=2441e6, seed=3,
        tx_slots=range(0, n_slots - 6), noise_std=0.02)
    x = np.stack([samples.real, samples.imag]).astype(np.float32)
    sb, ov = sfe.total_samples, sfe.overlap_samples
    need = n_super * sb + ov
    if x.shape[1] < need:
        x = np.pad(x, ((0, 0), (0, need - x.shape[1])))

    head_sh = NamedSharding(mesh, P(None, None))
    hits = []
    for s in range(n_super):
        chunk = x[:, s * sb: (s + 1) * sb]
        # THE multi-host contract: this process contributes only its own
        # contiguous half of the superblock
        half = sb // 2
        local = chunk[:, pid * half: (pid + 1) * half]
        xg = sfe.device_put_local(local)
        head = x[:, (s + 1) * sb: (s + 1) * sb + ov]
        headg = jax.make_array_from_process_local_data(
            head_sh, np.ascontiguousarray(head))
        out = sfe.step(xg, headg)
        # tiled: keep the leading shard axis global instead of stacking a
        # process dim (required for non-fully-addressable arrays)
        gathered = multihost_utils.process_allgather(out, tiled=True)
        if pid == 0:
            for res in sfe._assemble([np.asarray(g) for g in gathered],
                                     slot_base=s * sfe.superblock_slots):
                hits.extend([h.channel, h.clkn, h.sym_offset, h.lap,
                             h.errors] for h in res.hits)

    if pid == 0:
        with open(out_path, "w") as f:
            json.dump(hits, f)
    multihost_utils.sync_global_devices("done")


if __name__ == "__main__":
    main()
