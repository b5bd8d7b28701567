"""Pallas TPU kernel for dense classic access-code detection, bit-packed.

The XLA formulation in ops/detect.py materializes the (C, 68, n) symbol
window tensor in HBM; the round-1 kernel kept it in VMEM but still spent
~1100 int32 VPU ops per (channel, offset): 68 lane-rotated views, ~800
adds for the affine GF(2) map, 68 xor+add for the error sum.

This kernel packs 32 OFFSETS PER int32 WORD, so every GF(2) operation is a
single bitwise op on 32 candidates at once:

  * shifted views  v_j = ((B[q] >> r) & m) | (B[q+1] << 32-r)  (j = 32q+r)
    — 4 ops per j on arrays 32x smaller than the round-1 lane rolls
  * the affine map pred_j = XOR_k{A[j,k]=1} v_(38+k)  (+ c_j) — pure
    packed XOR: ~800 bit-ops cover ALL 32 offsets of a word at once
  * err = sum_j (v_j ^ pred_j) via a carry-save-adder tree: the 68 one-bit
    planes are bit-sliced into 7 binary counter planes (w1..w64) with
    ~330 full adders — ~19x fewer ops/offset than per-offset adds
  * the preamble/Barker prefilter distances (patterns are complementary,
    so min(d, len-d) covers both polarities) gate via equality planes

Per (8-channel, 128-word = 4096-offset) program everything lives in vregs;
output is 9 packed planes [hit, gate, w1..w64].  Semantics identical to
detect._classic_detect_impl (tested for exact equality).

Reference behavior matched: sniff_ac's <=2 preamble+Barker prefilter and
<= max_ac_errors acceptance, lib/packet_impl.cc:246-268.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import access_code

__all__ = ["gated_error", "classic_detect_pallas", "detect_words",
           "pack_bits_words", "BIG"]

_A68, _C68 = access_code.affine_code()
_A68 = _A68[:68].astype(np.int32)                      # (68, 24) 0/1
_C68v = _C68[:68].astype(np.int32)                     # (68,)

# preamble (j = 0..4) and Barker (j = 61..67) patterns; the two polarities
# of each are exact complements, so distance d covers both via min(d, L-d)
_PRE0 = (1, 0, 1, 0, 1)
_BARK0 = (1, 1, 1, 0, 0, 1, 0)

BIG = 1 << 20                                          # gated-out marker

# test hook: force interpret mode process-wide (CPU CI exercises the
# packed frontend integration without a TPU backend)
DEFAULT_INTERPRET = False


def _resolve_interpret(interpret):
    return DEFAULT_INTERPRET if interpret is None else interpret
_C_TILE = 8
_NW = 128                                              # words per tile
_PAD_W = 128                                           # DMA lookahead pad
_N_ERR = 7                                             # counter planes, 0..68
N_PLANES = 2 + _N_ERR                                  # hit, gate, w1..w64


def _csa(a, b, c):
    """Full adder on bit planes: returns (sum, carry)."""
    t = a ^ b
    return t ^ c, (a & b) | (c & t)


def _csa_reduce(planes):
    """Bit-sliced popcount: list of 1-bit planes -> counter bit planes
    [w1, w2, w4, ...] (LSB first)."""
    levels = [list(planes)]
    out = []
    w = 0
    while w < len(levels):
        cur = levels[w]
        if not cur:
            break
        if w + 1 >= len(levels):
            levels.append([])
        nxt = levels[w + 1]
        while len(cur) >= 3:
            s, c = _csa(cur.pop(), cur.pop(), cur.pop())
            cur.append(s)
            nxt.append(c)
        if len(cur) == 2:
            a, b = cur.pop(), cur.pop()
            cur.append(a ^ b)
            nxt.append(a & b)
        out.append(cur[0])
        w += 1
    return out


def _eq_const(planes, k):
    """Packed equality test: 1-bits where the counter == k."""
    acc = None
    for b, p in enumerate(planes):
        t = p if ((k >> b) & 1) else ~p
        acc = t if acc is None else acc & t
    return acc


def _le_const(planes, k):
    """Packed comparison: 1-bits where counter <= k (k static >= 0)."""
    lt = jnp.zeros_like(planes[0])
    eq = ~jnp.zeros_like(planes[0])
    for b in range(len(planes) - 1, -1, -1):
        p = planes[b]
        if (k >> b) & 1:
            lt = lt | (eq & ~p)
            eq = eq & p
        else:
            eq = eq & ~p
    return lt | eq


def _kernel(words_hbm, out_ref, *, nw: int, max_ac_errors: int,
            emit_err: bool):
    ci = pl.program_id(0)
    ti = pl.program_id(1)

    def body(buf, sem):
        cp = pltpu.make_async_copy(
            words_hbm.at[pl.ds(ci * _C_TILE, _C_TILE),
                         pl.ds(ti * nw, nw + _PAD_W)],
            buf, sem)
        cp.start()
        cp.wait()
        B = [buf[:, q:q + nw] for q in range(4)]       # word-offset bases

        def view(j):
            q, r = j >> 5, j & 31
            if r == 0:
                return B[q]
            # arithmetic >> then mask (bit j of each word for 32 offsets);
            # the mask kills the sign extension before the funnel OR
            m = (1 << (32 - r)) - 1
            return ((B[q] >> r) & m) | (B[q + 1] << (32 - r))

        lap = [view(38 + k) for k in range(24)]        # held live: 24 vregs

        e_planes = []
        pre_planes = []
        bark_planes = []
        for j in range(68):
            v = lap[j - 38] if 38 <= j < 62 else view(j)
            p = None
            for k in range(24):
                if _A68[j, k]:
                    p = lap[k] if p is None else p ^ lap[k]
            if p is None:
                p = jnp.zeros_like(v)
            if int(_C68v[j]) & 1:
                p = ~p
            e_planes.append(v ^ p)
            if j < 5:
                pre_planes.append(~v if _PRE0[j] else v)
            elif j >= 61:
                bark_planes.append(~v if _BARK0[j - 61] else v)

        err = _csa_reduce(e_planes)
        err = (err + [jnp.zeros_like(err[0])] * _N_ERR)[:_N_ERR]

        dp = _csa_reduce(pre_planes)                   # 0..5, 3 planes
        db = _csa_reduce(bark_planes)                  # 0..7, 3 planes
        # pre_m = min(d, 5-d): 0 <-> {0,5}, 1 <-> {1,4}, 2 <-> {2,3}
        pm0 = _eq_const(dp, 0) | _eq_const(dp, 5)
        pm1 = _eq_const(dp, 1) | _eq_const(dp, 4)
        pm2 = ~(pm0 | pm1)
        # bark_m = min(d, 7-d)
        bm0 = _eq_const(db, 0) | _eq_const(db, 7)
        bm1 = _eq_const(db, 1) | _eq_const(db, 6)
        bm2 = _eq_const(db, 2) | _eq_const(db, 5)
        # gate: pre_m + bark_m <= 2  (same rule as sniff_ac)
        gate = (pm0 & (bm0 | bm1 | bm2)) | (pm1 & (bm0 | bm1)) | (pm2 & bm0)

        hit = gate & _le_const(err, max_ac_errors)

        out_ref[0] = hit
        out_ref[1] = gate
        if emit_err:
            for b in range(_N_ERR):
                out_ref[2 + b] = err[b]

    pl.run_scoped(
        body,
        pltpu.VMEM((_C_TILE, nw + _PAD_W), jnp.int32),
        pltpu.SemaphoreType.DMA(()),
    )


@partial(jax.jit, static_argnames=("nw", "max_ac_errors", "interpret",
                                   "emit_err"))
def _planes_padded(words, *, nw: int, max_ac_errors: int, interpret: bool,
                   emit_err: bool = True):
    """words: (C_pad, n_tiles*nw + _PAD_W) int32
    -> (n_planes, C_pad, n_tiles*nw) packed planes, n_planes = N_PLANES
    with emit_err else 2 (hit+gate only — the error-counter planes are
    dead weight for callers that derive err from the hit windows)."""
    c_pad, w_pad = words.shape
    n_planes = N_PLANES if emit_err else 2
    n_tiles = (w_pad - _PAD_W) // nw
    grid = (c_pad // _C_TILE, n_tiles)
    ones = int(_A68.sum())
    return pl.pallas_call(
        partial(_kernel, nw=nw, max_ac_errors=max_ac_errors,
                emit_err=emit_err),
        out_shape=jax.ShapeDtypeStruct((n_planes, c_pad, n_tiles * nw),
                                       jnp.int32),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((n_planes, _C_TILE, nw),
                               lambda ci, ti: (0, ci, ti),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=c_pad * n_tiles * nw * (68 * 4 + ones + 68 * 6 + 120),
            bytes_accessed=c_pad * w_pad * 4 +
            n_planes * c_pad * n_tiles * nw * 4,
            transcendentals=0),
    )(words)


def pack_bits_words(bits):
    """(C, T) {0,1} -> (C, ceil(T/32)) int32; bit t of the stream sits at
    word t//32 bit t%32 (little-endian within words, byte-compatible with
    np.unpackbits(bitorder='little') on the word bytes)."""
    bits = jnp.asarray(bits, jnp.int32)
    C, T = bits.shape
    nw = -(-T // 32)
    b = jnp.pad(bits, ((0, 0), (0, nw * 32 - T))).reshape(C, nw, 32)
    sh = jnp.arange(32, dtype=jnp.int32)[None, None, :]
    return (b << sh).sum(-1).astype(jnp.int32)


def detect_words(words, n: int, max_ac_errors: int = 6, nw: int = _NW,
                 interpret: bool | None = None, emit_err: bool = True):
    """Word-packed detection core.

    words: (C, W) int32 packed symbol streams (pack_bits_words layout);
    n: number of candidate offsets (= T - 71 for T symbols).
    Returns (hit (C, W'), gate (C, W'), err (7, C, W')) packed planes with
    W' = ceil(n/32); hit/gate bits at offsets >= n are zeroed.  With
    emit_err=False, err is None and the kernel skips the error-counter
    plane writes (the hot path derives err from the hit windows).
    """
    C, W = words.shape
    n_words = -(-n // 32)
    c_pad = -(-C // _C_TILE) * _C_TILE
    n_tiles = -(-n_words // nw)
    w_pad = n_tiles * nw + _PAD_W
    wp = jnp.zeros((c_pad, w_pad), jnp.int32)
    wp = jax.lax.dynamic_update_slice(wp, words[:, :min(W, w_pad)], (0, 0))
    planes = _planes_padded(wp, nw=nw, max_ac_errors=max_ac_errors,
                            interpret=_resolve_interpret(interpret),
                            emit_err=emit_err)
    planes = planes[:, :C, :n_words]
    hit, gate = planes[0], planes[1]
    err = planes[2:] if emit_err else None
    # mask bits at offsets >= n (tail windows read past T)
    tm = np.full(n_words, -1, np.int32)
    if n % 32:
        tm[-1] = (1 << (n % 32)) - 1
    tm = jnp.asarray(tm)
    return hit & tm[None, :], gate & tm[None, :], err


def _unpack_words(w, n):
    """(C, W) int32 packed -> (C, n) int32 0/1 bits (small sizes only)."""
    C, W = w.shape
    sh = jnp.arange(32, dtype=jnp.int32)[None, None, :]
    bits = (w[:, :, None] >> sh) & 1                   # arith >> ok: &1
    return bits.reshape(C, W * 32)[:, :n]


def gated_error(bits, nt: int = 1024, interpret: bool | None = None):
    """bits: (C, T) {0,1} any real dtype -> (C, T-71) int32 gated AC error
    counts (BIG where the preamble/Barker prefilter rejects).

    Compatibility entry: packs to words, runs the packed kernel, unpacks
    dense.  Hot paths call detect_words on pre-packed streams instead.
    (nt retained for API compatibility; the packed kernel tiles by words.)
    """
    if nt != 1024:
        import warnings
        warnings.warn("gated_error: nt no longer controls tiling (the "
                      "packed kernel tiles by words) and is ignored",
                      DeprecationWarning, stacklevel=2)
    del nt
    bits = jnp.asarray(bits, jnp.int32)
    C, T = bits.shape
    n = T - 72 + 1
    if n <= 0:
        raise ValueError("block shorter than one access code")
    words = pack_bits_words(bits)
    _, gate, err = detect_words(words, n, max_ac_errors=68,
                                interpret=interpret)
    m = err.shape[-1] * 32
    e = jnp.zeros((C, m), jnp.int32)
    for b in range(err.shape[0]):
        e = e + (_unpack_words(err[b], m) << b)
    g = _unpack_words(gate, m)
    return jnp.where(g > 0, e, BIG)[:, :n]


def classic_detect_pallas(bits, max_ac_errors: int = 6, nt: int = 1024,
                          interpret: bool | None = None):
    """Drop-in for detect._classic_detect_impl: (hits bool, err int32)."""
    g = gated_error(bits, nt=nt, interpret=interpret)
    return g <= max_ac_errors, jnp.where(g >= BIG, 0, g)
