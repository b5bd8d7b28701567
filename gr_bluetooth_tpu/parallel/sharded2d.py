"""2-D sharding: time chunks x channel groups over a device mesh.

`ShardedFrontEnd` (sharded.py) scales throughput by splitting a capture
along TIME; each device still computes all 79 channels, so one
superblock's latency is fixed.  This module adds the CHANNEL axis from
SURVEY §2's parallelism inventory ("shard channel groups across TPU
cores" — the TPU-native form of the reference's per-channel loop,
lib/multi_sniffer_impl.cc:87): a 2-D mesh (time, chan) where each device
computes its time chunk for only a contiguous GROUP of channels, so
per-superblock latency shrinks with the chan axis while the time axis
keeps adding throughput.

Work split inside the fused step:

  * The wideband input is replicated across the chan axis (each chunk's
    samples contain every channel — there is no cheaper split) and the
    polyphase branch FIR (ntaps MACs/sample, a few % of the step) is
    recomputed per channel shard.
  * Everything after the DFT — the DFT matmul itself (its bin columns are
    per-shard inputs), GFSK demod, timing recovery, slicing, SNR probe,
    AC/LE detection, hit extraction, window gather: ~95 % of the FLOPs —
    runs on C/G channels per device.

Channel groups stay CONTIGUOUS slices of the bank so the SNR noise probe
keeps its structure (channel c's +790 kHz probe is read from stream row
c+1 — ops/snr.py): group g's streams are bank rows [s_g, s_g+Cg], the
last column being the probe for the group's top channel.  79 is prime, so
equal-size groups must overlap: the last group starts at C-Cg and its
first `G*Cg - C` channels duplicate the previous group's tail; the host
drops hits from the duplicated range, so assembled results are exactly
the unsharded stream's (parity-tested in tests/test_sharded2d.py).

Communication: one `ppermute` halo over the time axis (as in sharded.py);
the chan axis is communication-free — per-group hit tables are
concatenated on the host.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.frontend import FrontEnd, BlockResult, _device_step
from ..ops import detect, pfb

__all__ = ["Sharded2DFrontEnd"]


class Sharded2DFrontEnd:
    """Run a FrontEnd's fused step over a 2-D (time, chan) mesh."""

    def __init__(self, fe: FrontEnd, mesh: Mesh, time_axis: str = "time",
                 chan_axis: str = "chan"):
        if not isinstance(fe.bank, pfb.PfbBank):
            raise ValueError("channel sharding requires the polyphase bank "
                             "(even samples/symbol rates)")
        if fe.step_samples < fe.overlap_samples:
            raise ValueError("chunk must be at least as long as the halo; "
                             "increase block_slots")
        self.fe = fe
        self.mesh = mesh
        self.time_axis = time_axis
        self.chan_axis = chan_axis
        self.n_time = Tn = mesh.shape[time_axis]
        self.n_chan = G = mesh.shape[chan_axis]
        bank = fe.bank
        C = bank.n_channels
        if G > C:
            raise ValueError(f"chan axis ({G}) larger than channel count "
                             f"({C})")
        Cg = -(-C // G)
        # contiguous, possibly overlapping groups: group g covers bank
        # channels [starts[g], starts[g]+Cg); locals < valid_start[g]
        # duplicate the previous group and are dropped at assembly
        starts = [min(g * Cg, C - Cg) for g in range(G)]
        valid_start = [0] + [max(0, starts[g - 1] + Cg - starts[g])
                             for g in range(1, G)]
        self.group_size = Cg
        self.starts = starts
        self.valid_start = valid_start

        # per-group DFT columns: channel cols [s, s+Cg) plus the probe col
        # s+Cg (the next channel up, or the bank's own probe row at the top)
        dftc = np.stack([bank.dft_c[:, s:s + Cg + 1] for s in starts])
        dfts = np.stack([bank.dft_s[:, s:s + Cg + 1] for s in starts])
        binodd = np.stack([bank.bin_odd[s:s + Cg + 1] for s in starts])

        self.with_le = bool(fe.enable_le and fe.le_rows)
        le_stacks = ()
        self.le_maps: list[list[int]] = [[] for _ in range(G)]
        if self.with_le:
            for j, (row, _ch, _li) in enumerate(fe.le_rows):
                for g in range(G):
                    if starts[g] + valid_start[g] <= row < starts[g] + Cg:
                        self.le_maps[g].append(j)
            lmax = max(len(m) for m in self.le_maps)
            rows_g = np.zeros((G, lmax), np.int32)
            white_g = np.zeros((G, lmax, 16), np.float32)
            aa_g = np.zeros((G, lmax, 1), np.float32)
            # max_dist = -1 on pad rows: distance >= 0, so pads never hit
            dist_g = np.full((G, lmax, 1), -1, np.int32)
            for g, m in enumerate(self.le_maps):
                if not m:
                    continue
                idx = [fe.le_rows[j][2] for j in m]
                white, aa_on, max_dist = detect.le_row_consts(idx)
                k = len(m)
                rows_g[g, :k] = [fe.le_rows[j][0] - starts[g] for j in m]
                white_g[g, :k] = white
                aa_g[g, :k] = aa_on
                dist_g[g, :k] = max_dist
            le_stacks = (rows_g, white_g, aa_g, dist_g)

        step = fe.step_samples
        overlap = fe.overlap_samples
        perm = [((d + 1) % Tn, d) for d in range(Tn)]
        with_le = self.with_le

        def shard_fn(x_local, next_head, dftc_g, dfts_g, binodd_g, *le_g):
            halo = jax.lax.ppermute(x_local[:, :overlap], time_axis, perm)
            idx = jax.lax.axis_index(time_axis)
            halo = jnp.where(idx == Tn - 1, next_head, halo)
            xb = jnp.concatenate([x_local, halo], axis=1)
            kw = dict(fe._step_kwargs)
            kw.update(dft_c=dftc_g[0], dft_s=dfts_g[0], bin_odd=binodd_g[0])
            if with_le:
                kw.update(le_rows=le_g[0][0], le_white=le_g[1][0],
                          le_aa_on=le_g[2][0], le_max_dist=le_g[3][0])
            (snr_db, n_hits, tab, windows,
             n_le, le_tab, le_win) = _device_step(xb, **kw)
            out = (snr_db[None, None], n_hits.reshape(1, 1, 1),
                   tab[None, None], windows[None, None])
            if with_le:
                out += (n_le.reshape(1, 1, 1), le_tab[None, None],
                        le_win[None, None])
            return out

        n_out = 7 if with_le else 4
        n_le_in = 4 if with_le else 0
        # check_vma=False for the same reason as sharded.py: the pallas
        # AC-detect kernel declares no varying-mesh-axes metadata
        self._sharded = jax.jit(jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(None, time_axis), P(None, None),
                      P(chan_axis), P(chan_axis), P(chan_axis))
                     + tuple(P(chan_axis) for _ in range(n_le_in)),
            out_specs=tuple(P(time_axis, chan_axis) for _ in range(n_out)),
            check_vma=False))
        gshard = NamedSharding(mesh, P(chan_axis))
        self._gconsts = tuple(jax.device_put(a, gshard)
                              for a in (dftc, dfts, binodd) + le_stacks)
        self._in_sharding = NamedSharding(mesh, P(None, time_axis))
        self.chunk_samples = step
        self.overlap_samples = overlap
        self.total_samples = step * Tn           # one superblock
        self.superblock_slots = fe.block_slots * Tn

    def device_put(self, x: np.ndarray):
        """Place (2, n_time*step) float32 planes sharded along time,
        replicated along chan."""
        return jax.device_put(x, self._in_sharding)

    def step(self, x_sharded, next_head):
        """One sharded superblock step; per-(time, chan)-shard arrays
        (T, G, S, Cg), (T, G, 1), (T, G, K, 4), (T, G, K, W8) [+ LE]."""
        return self._sharded(x_sharded, next_head, *self._gconsts)

    # ------------------------------------------------------------- host

    def _merge_tab(self, n_hits, tab, windows, d, first_col_min):
        """Concatenate one time shard's per-group hit tables into a single
        channel-major table with GLOBAL channel indices, dropping rows from
        each group's duplicated-coverage prefix.

        Vectorized (one mask + one fancy-index pass) — the per-row loop
        cost O(total hits) python at high hit counts (round-3 weak #6);
        np.nonzero's row-major order preserves the (group, row) order the
        loop produced."""
        K = tab.shape[2]
        raw = n_hits[d, :, 0].astype(np.int64)            # (G,)
        kcl = np.minimum(raw, K)
        extra = int((raw - kcl).sum())
        idx = np.arange(K)[None, :]
        tb = tab[d]                                       # (G, K, 4)
        keep = (idx < kcl[:, None]) & \
            (tb[:, :, 0] >= np.asarray(first_col_min)[:, None])
        g_idx, i_idx = np.nonzero(keep)
        tab_m = tb[g_idx, i_idx].copy()
        if tab_m.size:
            tab_m[:, 0] += np.asarray(self.starts)[g_idx]
        win_m = windows[d][g_idx, i_idx]
        return len(tab_m) + extra, tab_m, win_m

    def _merge_le(self, n_le, le_tab, le_win, d):
        K = le_tab.shape[2]
        raw = n_le[d, :, 0].astype(np.int64)
        kcl = np.minimum(raw, K)
        extra = int((raw - kcl).sum())
        idx = np.arange(K)[None, :]
        keep = idx < kcl[:, None]
        g_idx, i_idx = np.nonzero(keep)
        tab_m = le_tab[d][g_idx, i_idx].copy()
        if tab_m.size:
            # per-group local LE row -> global LE row, via a padded map
            mlen = max(len(m) for m in self.le_maps)
            lm = np.zeros((self.n_chan, mlen), np.int64)
            for g, m in enumerate(self.le_maps):
                lm[g, :len(m)] = m
            tab_m[:, 0] = lm[g_idx, np.clip(tab_m[:, 0], 0, mlen - 1)]
        win_m = le_win[d][g_idx, i_idx]
        return len(tab_m) + extra, tab_m, win_m

    def _assemble(self, out, slot_base: int) -> list[BlockResult]:
        host = [np.asarray(o) for o in out]
        if self.with_le:
            snr_db, n_hits, tab, windows, n_le, le_tab, le_win = host
        else:
            snr_db, n_hits, tab, windows = host
            n_le = le_tab = le_win = None
        Cg = self.group_size
        vs = self.valid_start
        results = []
        for d in range(self.n_time):
            snr_full = np.concatenate(
                [snr_db[d, g][:, vs[g]:Cg] for g in range(self.n_chan)],
                axis=1)
            n_m, tab_m, win_m = self._merge_tab(n_hits, tab, windows, d, vs)
            if self.with_le:
                nle_m, letab_m, lewin_m = self._merge_le(n_le, le_tab,
                                                         le_win, d)
            else:
                nle_m = letab_m = lewin_m = None
            results.append(self.fe.assemble_block(
                snr_full, n_m, tab_m, win_m, nle_m, letab_m, lewin_m,
                slot_base=slot_base + d * self.fe.block_slots))
        return results

    def stream(self, samples: np.ndarray, start_clkn: int = 0):
        """Iterate merged BlockResults (one per time shard per superblock)
        over a long capture — identical hits to FrontEnd.stream."""
        samples = np.asarray(samples)
        if np.iscomplexobj(samples):
            samples = np.stack([samples.real,
                                samples.imag]).astype(np.float32)
        n = samples.shape[1]
        sb, ov = self.total_samples, self.overlap_samples
        pos, slot_base = 0, start_clkn
        while pos < n:
            chunk = samples[:, pos:pos + sb]
            if chunk.shape[1] < sb:
                pad = np.zeros((2, sb), np.float32)
                pad[:, :chunk.shape[1]] = chunk
                chunk = pad
            head = samples[:, pos + sb:pos + sb + ov]
            if head.shape[1] < ov:
                hp = np.zeros((2, ov), np.float32)
                hp[:, :head.shape[1]] = head
                head = hp
            out = self.step(self.device_put(chunk), jnp.asarray(head))
            yield from self._assemble(out, slot_base)
            pos += sb
            slot_base += self.superblock_slots

    def process(self, samples: np.ndarray, start_clkn: int = 0):
        return list(self.stream(samples, start_clkn))
