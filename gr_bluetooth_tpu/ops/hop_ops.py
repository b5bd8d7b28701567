"""On-device CLK1-27 hop winnowing (jax twin of core/hop.py).

The reference materializes the full 2^27-slot hop sequence per piconet
(~134 MB; gen_hops, lib/piconet_impl.cc:214-255) and winnows candidate
clocks against it with sequential scans (init_candidates/winnow,
lib/piconet_impl.cc:285-338).  core/hop.py already replaces the table with
lazy closed-form evaluation in host numpy; this module moves the heavy
candidate scans onto the device, mapping SURVEY §2's candidate-parallelism
axis to the VPU:

  * the candidate set is a device-resident boolean mask over the 2^21
    clocks congruent to CLK1-6 mod 64 — 2 MB instead of 134 MB;
  * init and each winnow are one fused elementwise pass: evaluate the
    §2.6 hop kernel (pure int32 bit-twiddling — VPU food) at
    (candidate + offset) for all 2^21 lanes and AND the channel-match
    into the mask;
  * the only per-winnow host traffic is the surviving-candidate count
    (one scalar); candidate *values* cross the link once, when the set is
    small enough to hand to the host numpy tail (core/hop.winnow).

Used by models/piconet.py behind a size threshold; core/hop.py stays the
reference implementation and fallback (parity-tested in
tests/test_hop_ops.py).
"""
from __future__ import annotations

from functools import partial

import numpy as np

from ..constants import ALIASED_CHANNELS, CHANNELS, SEQUENCE_LENGTH
from ..core.hop import _IDX1, _IDX2, AddressConsts, address_precalc

__all__ = ["DeviceWinnower", "available"]

_GRID = SEQUENCE_LENGTH // 64          # 2^21 clocks congruent mod 64


def available() -> bool:
    try:
        import jax  # noqa: F401
        return True
    except Exception:  # pragma: no cover - jax is baked into the image
        return False


def _perm5_jax(z, p):
    """Unrolled 5-bit butterfly permutation (spec §2.6.3), int32 lanes.

    Same wiring as core/hop.perm5 (and the reference's 2 MB d_perm_table,
    lib/piconet_impl.cc:179-211) — 14 conditional bit swaps, fully fused
    by XLA into one elementwise pass.
    """
    import jax.numpy as jnp

    zb = [(z >> i) & 1 for i in range(5)]
    for i in range(13, -1, -1):
        ctrl = (p >> i) & 1
        j, k = int(_IDX1[i]), int(_IDX2[i])
        a, b = zb[j], zb[k]
        zb[j] = jnp.where(ctrl == 1, b, a)
        zb[k] = jnp.where(ctrl == 1, a, b)
    out = zb[0]
    for i in range(1, 5):
        out = out | (zb[i] << i)
    return out


def _hop_jax(clk, a1, b, c1, d1, e, afh: bool):
    """Channel for slot clock(s) CLK1-27; jax twin of core/hop.hop
    (closed form of lib/piconet_impl.cc:259-276).  All int32."""
    clk = clk & (SEQUENCE_LENGTH - 1)
    if afh:
        clk = clk & ~1                  # odd slot reuses even channel
    spec = clk << 1                     # CLK0 appended; fits int32 (2^28)
    x = (spec >> 2) & 0x1F
    y1 = (spec >> 1) & 0x01
    a = (a1 ^ (spec >> 21)) & 0x1F
    c = (c1 ^ (spec >> 16)) & 0x1F
    d = (d1 ^ (spec >> 7)) & 0x1FF
    f = (spec >> 3) & 0x1FFFFF0
    z = ((x + a) % 32) ^ b
    p = d | (((y1 * 0x1F) ^ c) << 9)
    perm = _perm5_jax(z, p)
    # bank[k] = (2k) % 79, so the register-bank gather folds into arithmetic
    return (2 * (perm + e + f + (y1 << 5))) % CHANNELS


def _make_winnow():
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("aliased", "afh"))
    def winnow(mask, base, offset, channel, a1, b, c1, d1, e, *,
               aliased: bool, afh: bool):
        i = jnp.arange(_GRID, dtype=jnp.int32)
        clk = (base + (i << 6) + offset) & (SEQUENCE_LENGTH - 1)
        ch = _hop_jax(clk, a1, b, c1, d1, e, afh)
        if aliased:
            ch = (ch + 24) % ALIASED_CHANNELS + 26
        mask = mask & (ch == channel)
        return mask, mask.sum(dtype=jnp.int32)

    return winnow


_winnow = None


def _winnow_fn():
    global _winnow
    if _winnow is None:
        _winnow = _make_winnow()
    return _winnow


class DeviceWinnower:
    """Device-resident CLK1-27 candidate set for one piconet.

    Equivalent (parity-tested) to core/hop.init_candidates followed by
    core/hop.winnow chains; candidate values only leave the device via
    candidates().
    """

    def __init__(self, address: int, known_clk6: int, channel: int,
                 aliased: bool = False, afh: bool = False):
        import jax.numpy as jnp

        ac = address_precalc(address)
        self._consts = tuple(np.int32(v)
                             for v in (ac.a1, ac.b, ac.c1, ac.d1, ac.e))
        self.base = int(known_clk6) & 0x3F
        self.aliased = bool(aliased)
        self.afh = bool(afh)
        mask0 = jnp.ones((_GRID,), dtype=bool)
        self.mask, cnt = _winnow_fn()(
            mask0, np.int32(self.base), np.int32(0), np.int32(channel),
            *self._consts, aliased=self.aliased, afh=self.afh)
        self.count = int(cnt)

    def winnow(self, offset: int, channel: int) -> int:
        """AND one (offset, channel) observation into the mask; returns the
        surviving count (the only host transfer)."""
        self.mask, cnt = _winnow_fn()(
            self.mask, np.int32(self.base), np.int32(offset),
            np.int32(channel), *self._consts,
            aliased=self.aliased, afh=self.afh)
        self.count = int(cnt)
        return self.count

    def candidates(self) -> np.ndarray:
        """Materialize surviving clock values to the host (int64, sorted)."""
        m = np.asarray(self.mask)
        idx = np.nonzero(m)[0].astype(np.int64)
        return self.base + (idx << 6)
