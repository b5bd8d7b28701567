"""Multi-chip sharding: time-parallel streaming with halo exchange.

The reference is a single-process GNU Radio app; its "scaling story" is the
GR scheduler (SURVEY §2, parallelism inventory).  The TPU-native scaling
axes are:

  * **time parallelism** (this module): a long capture is split into
    contiguous chunks across a `time` mesh axis.  Each device needs
    LOOKAHEAD_SLOTS + filter history of samples past its chunk end (the
    overlap-save halo); a single `lax.ppermute` pulls each device's head
    from its right neighbor over ICI — the collective equivalent of GNU
    Radio's `set_history` (lib/multi_block.cc:100-119).
  * **channel parallelism**: the channelizer's DFT-bin axis; covered by
    sharding the dense detection stage's channel dimension (future work —
    for 79 channels a single chip is far past real time, so time
    parallelism is the axis that buys throughput on long captures).

Each device runs the full fused frontend step on (chunk + halo) and emits
fixed-size hit tables; the host merges tables with per-shard clock bases.
Scaling is embarrassing by construction — the only communication is the
halo (~1.5 % of a 64-slot chunk), so samples/s scales ~linearly with
devices.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.frontend import FrontEnd, BlockResult

__all__ = ["ShardedFrontEnd"]


class ShardedFrontEnd:
    """Run a FrontEnd's device step time-sharded over a mesh axis.

    fe.block_samples = step + overlap; each device holds `step` samples and
    receives `overlap` halo samples from its right neighbor.
    """

    def __init__(self, fe: FrontEnd, mesh: Mesh, axis: str = "time"):
        if fe.step_samples < fe.overlap_samples:
            raise ValueError("chunk must be at least as long as the halo; "
                             "increase block_slots")
        self.fe = fe
        self.mesh = mesh
        self.axis = axis
        self.n_dev = mesh.shape[axis]
        n = self.n_dev
        perm = [((d + 1) % n, d) for d in range(n)]   # receive from right

        step = fe.step_samples
        overlap = fe.overlap_samples

        def shard_fn(x_local):
            # x_local: (2, step) this device's chunk
            halo = jax.lax.ppermute(x_local[:, :overlap], axis, perm)
            xb = jnp.concatenate([x_local, halo], axis=1)
            snr_db, n_hits, tab, windows, _, _, _ = fe._jit_step(xb)
            return (snr_db[None], n_hits.reshape(1, 1), tab[None],
                    windows[None])

        self._sharded = jax.jit(jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=P(None, axis),
            out_specs=(P(axis), P(axis), P(axis), P(axis))))
        self._in_sharding = NamedSharding(mesh, P(None, axis))
        self.chunk_samples = step
        self.total_samples = step * n

    def device_put(self, x: np.ndarray):
        """Place (2, n_dev*step) float32 planes sharded along time."""
        return jax.device_put(x, self._in_sharding)

    def step(self, x_sharded):
        """One sharded step over the whole mesh; returns device arrays
        (n_dev, S, C), (n_dev, 1), (n_dev, K, 4), (n_dev, K, W)."""
        return self._sharded(x_sharded)

    def process(self, samples: np.ndarray, start_clkn: int = 0):
        """Host helper: run one sharded step and assemble per-shard
        BlockResults (the last shard's halo wraps around — its tail hits
        are only valid on a cyclic capture; streaming callers feed the
        next step's head instead)."""
        samples = np.asarray(samples)
        if np.iscomplexobj(samples):
            samples = np.stack([samples.real, samples.imag]).astype(np.float32)
        if samples.shape[1] < self.total_samples:
            pad = np.zeros((2, self.total_samples), np.float32)
            pad[:, :samples.shape[1]] = samples
            samples = pad
        out = self.step(self.device_put(samples[:, :self.total_samples]))
        snr_db, n_hits, tab, windows = (np.asarray(o) for o in out)
        results = []
        for d in range(self.n_dev):
            base = start_clkn + d * self.fe.block_slots
            res = self.fe.assemble_block(
                snr_db[d], int(n_hits[d, 0]), tab[d], windows[d],
                None, None, None, slot_base=base)
            results.append(res)
        return results
