"""Fused Pallas TPU kernel for the polyphase filterbank's FIR+DFT.

The XLA formulation (ops/pfb.py:_pfb_impl) lowers to HBM-resident stages —
deinterleave relayout, Q-pass branch FIR, DFT matmuls, rotator — whose
intermediate u (2, M, n) round-trips HBM between fusions.  At the
full-band shape that traffic, not FLOPs, is the bound (bench.py roofline);
round-4 profiling (scratch/profile_step.py) attributed ~1.0 ms/block to
the standalone deinterleave relayout alone.

This kernel consumes the RAW interleaved stream with NO deinterleave
pass: x (2, N) is viewed as (2, n_x, D) — frames on sublanes, branches
on lanes — which XLA lowers as a zero-cost linear-layout reshape, then
the branch (lane) axis is zero-padded to a full 128-lane tile (~0.2 ms,
the only relayout left; Mosaic DMA requires a 128-aligned minor dim for
sliced copies).  Per time tile inside VMEM:

    HBM -> DMA (overlapping frame window (2, W, 128), double-buffered)
        -> branch FIRs frame-major: Q sublane-shifted FMAs producing
           v0/v1 (TF, 128) per plane (VPU; no transposes anywhere —
           Mosaic's (TF, 40) shuffle-transpose measured ~17 us/tile,
           which was the round-3 kernel's hidden cost)
        -> M-point DFT as four NT matmuls (C, 128) x (TF, 128)
           contracting the 128-lane branch axis (MXU; the branch halves
           v0/v1 are never concatenated — the DFT matrix is split)
        -> (-1)^{cn} rotator (sign matrix baked per tile phase)
        -> HBM (y tiles)

HBM traffic for this stage collapses to: read the padded stream once
(+ window overlap), write yr/yi once.  The input cannot use the implicit
pallas pipeline because consecutive tiles need OVERLAPPING windows
(frame j draws on frames [j, j + 2Q)), so the stream stays in ANY memory
and windows are fetched with `pltpu.make_async_copy`, next-tile fetch
overlapping current-tile compute.

Same math as _pfb_impl — identical window placement, prototype taps, DDC
phase convention (reference design: lib/multi_block.cc:62-79, 180-228);
exact-parity tested in tests/test_pfb_kernel.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pfb_channelize_fused", "pfb_channelize_snr_fused",
           "pfb_channelize_snr_demod_fused",
           "staged_geometry", "stage_host", "probe_phase_matrices"]

_TF = 1024                     # output frames per tile (multiple of 128)
_LOOKAHEAD = 256               # window = TF + 256 frames (>= TFW + 2Q)
_LD = 128                      # staged branch-lane width (DMA tile width)
_PC = 32                       # probe partial columns (<= 26 valid/tile)


def staged_geometry(n_samples: int, D: int, Q: int):
    """Geometry of the staged (2, F, _LD) input layout for a block of
    `n_samples` wideband samples: returns (F, n_tiles, TF, n).

    F frames = n_tiles * TF + _LOOKAHEAD; frames beyond n_samples // D are
    junk (zeros) whose polluted outputs lie beyond frame n = n_x - 2Q and
    are sliced away by the consumer.  Staged tiles are always _TF frames
    (the layout must be invertible from F alone)."""
    n_x = n_samples // D
    n = n_x - 2 * Q
    TF = _TF
    n_tiles = -(-n // TF)
    return n_tiles * TF + _LOOKAHEAD, n_tiles, TF, n


def stage_host(x: np.ndarray, D: int, Q: int) -> np.ndarray:
    """Host-side staging: (2, N) float32 planes -> (2, F, _LD) float32.

    A cheap numpy fill; the device-side equivalent (reshape + lane pad of
    the whole stream) is a ~1.2 ms XLA relayout per full-band block, so
    paths that can stage at the source (pre-loaded bench blocks, the
    ingest conversion) should."""
    x = np.asarray(x, dtype=np.float32)
    n_x = x.shape[1] // D
    F, _, _, _ = staged_geometry(x.shape[1], D, Q)
    out = np.zeros((2, F, _LD), dtype=np.float32)
    xv = x[:, : n_x * D].reshape(2, n_x, D)
    out[:, :n_x, :D] = xv
    # duplicate into the second lane group: both branch FIRs then run in
    # one accumulator and the DFT in one packed contraction (_fir_dft)
    out[:, :n_x, D:2 * D] = xv
    return out


def probe_phase_matrices(taps_re, taps_im):
    """(5, Wy, _PC) tap matrices for the in-kernel SNR probe, Wy = wide
    per-tile frame count (8-aligned, sized to fit the last window AND the
    fused demod's 1152-frame window — pfb_channelize_snr_demod_fused
    consumes the wide y tile directly, so Wy >= demod_kernel._WL).

    Probe windows sit on the global 40-sample grid; a 1024-frame tile's
    first window offset cycles with period 5 (1024*5 % 40 == 0), so five
    matrices cover every tile: PR[phi, l, j] places the band-pass taps at
    local offset ((-1024*phi) % 40) + 40*j.  Columns j >= 26 (and any
    off-tile tails) are masked by the XLA-side assembly."""
    from .demod_kernel import _WL as _DEMOD_WL
    T = len(taps_re)
    Wy = max(-(-(36 + 40 * 25 + T) // 8) * 8, _DEMOD_WL)
    PR = np.zeros((5, Wy, _PC), np.float32)
    PI = np.zeros((5, Wy, _PC), np.float32)
    for phi in range(5):
        off0 = (-1024 * phi) % 40
        for j in range(26):
            l0 = off0 + 40 * j
            PR[phi, l0: l0 + T, j] = taps_re
            PI[phi, l0: l0 + T, j] = taps_im
    return PR, PI


def _fir_dft(xs, slot, h0, h1, mc, ms, TFW: int, Q: int, D: int):
    """Shared per-tile FIR + DFT body, branch-packed.

    The staged layout carries x DUPLICATED in lanes 0..D-1 and D..2D-1
    (stage_host / the device staging paths write both groups), so BOTH
    branch FIRs accumulate into one (TFW, LD) buffer (h0 taps live in
    the low lane group, h1 in the high) and the M-point DFT is ONE
    (C, LD) x (TFW, LD) contraction per cos/sin x I/Q instead of two
    half-matrices added — the split form padded each D-lane half to 128
    and burned 2x the MXU FLOPs (the DFT is the megakernel's largest
    single cost, round-5 roofline).  An in-kernel lane roll was tried
    first and cost more than the matmul saving; duplicating at staging
    is free (the 128-lane rows cross HBM either way)."""
    LD = xs.shape[3]
    h0v, h1v = h0[...], h1[...]                    # (Q, LD), disjoint groups
    a = []
    for p in range(2):
        acc = jnp.zeros((TFW, LD), jnp.float32)
        for q in range(Q):
            acc = (acc
                   + xs[slot, p, pl.ds(2 * q, TFW), :] * h0v[q][None, :]
                   + xs[slot, p, pl.ds(2 * q + 1, TFW), :] *
                   h1v[q][None, :])
        a.append(acc)

    ddn = (((1,), (1,)), ((), ()))                 # contract branch lanes
    cr = jax.lax.dot_general(mc[...], a[0], ddn,
                             preferred_element_type=jnp.float32)
    ci = jax.lax.dot_general(mc[...], a[1], ddn,
                             preferred_element_type=jnp.float32)
    sr = jax.lax.dot_general(ms[...], a[0], ddn,
                             preferred_element_type=jnp.float32)
    si = jax.lax.dot_general(ms[...], a[1], ddn,
                             preferred_element_type=jnp.float32)
    return cr, ci, sr, si


def _kernel(xv_hbm, h0, h1, mc, ms, sign, yr_out, yi_out,
            xs, sem, *, Q: int, TF: int, n_data: int, D: int):
    i = pl.program_id(0)
    W = TF + _LOOKAHEAD
    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    # grid steps beyond n_data (staged mode's trailing tile) write zeros
    # for downstream windowed consumers and touch no input
    def window_copy(tile, dst_slot):
        return pltpu.make_async_copy(
            xv_hbm.at[:, pl.ds(tile * TF, W), :],
            xs.at[dst_slot], sem.at[dst_slot])

    @pl.when(i == 0)
    def _():
        window_copy(0, 0).start()

    @pl.when(i + 1 < n_data)
    def _():
        window_copy(i + 1, nxt).start()

    @pl.when(i >= n_data)
    def _():
        yr_out[...] = jnp.zeros_like(yr_out)
        yi_out[...] = jnp.zeros_like(yi_out)

    @pl.when(i < n_data)
    def _():
        window_copy(i, slot).wait()
        cr, ci, sr, si = _fir_dft(xs, slot, h0, h1, mc, ms, TF, Q, D)
        # rotator e^{-j pi c n} = (-1)^{cn}: TF is even, so the frame-
        # parity pattern is tile-invariant, baked into the (C, TF) signs
        yr_out[...] = (cr + si) * sign[...]
        yi_out[...] = (ci - sr) * sign[...]


@partial(jax.jit, static_argnames=("D", "interpret"))
def pfb_channelize_fused(x_ri, h0, h1, dft_c, dft_s, bin_odd, D: int,
                         interpret: bool = False):
    """x_ri: (2, N) float32 flat planes, OR the pre-staged (2, F, _LD)
    layout from stage_host/staged_geometry.

    Flat input: returns (yr, yi) each (C, n), n = N//D - 2Q — drop-in
    equal to pfb._pfb_impl (same frame windows / group delay) — paying a
    device-side staging relayout (~1.2 ms at full band).
    Staged input: returns (C, n_tiles*TF) with junk columns beyond the
    true n; the consumer slices to what it needs.
    """
    Q = h0.shape[0]
    if 2 * Q > _LOOKAHEAD:
        raise ValueError(f"prototype too long for the DMA lookahead: "
                         f"2Q={2 * Q} > {_LOOKAHEAD}")
    C = dft_c.shape[1]
    LD = max(_LD, -(-D // 128) * 128)
    if x_ri.ndim == 3:
        if x_ri.shape[2] != LD:
            raise ValueError(f"staged input lane width {x_ri.shape[2]} != "
                             f"{LD}")
        xv = x_ri
        n_tiles = (xv.shape[1] - _LOOKAHEAD) // _TF
        TF = _TF
        n = None                            # caller slices
        # one extra zero-filled output tile: downstream windowed kernels
        # (ops/demod_kernel.py) read y in 128-frame-lookahead windows of
        # their own, so give them deterministic zeros to land in
        grid_tiles = n_tiles + 1
    else:
        n_x = x_ri.shape[1] // D
        n = n_x - 2 * Q
        TF = _TF if n >= _TF else -(-n // 128) * 128
        n_tiles = -(-n // TF)
        grid_tiles = n_tiles
        need = n_tiles * TF + _LOOKAHEAD    # frames incl. DMA lookahead
        # free reshape: frame j, branch d = x[jD + d] (row-major
        # contiguity); branch (lane) axis: x duplicated into lane groups
        # 0..D-1 and D..2D-1 (the packed-FIR/DFT layout), padded to a
        # full 128-lane tile for the DMA
        xv = x_ri[:, : n_x * D].reshape(2, n_x, D)
        xv = jnp.concatenate(
            [xv, xv, jnp.zeros((2, n_x, LD - 2 * D), xv.dtype)], axis=2)
        xv = jnp.pad(xv, ((0, 0), (0, max(0, need - n_x)), (0, 0)))

    h0p, h1p, mc, ms = _packed_consts(h0, h1, dft_c, dft_s, D, LD)

    parity = jnp.asarray((np.arange(TF) & 1).astype(np.float32))
    sign = 1.0 - 2.0 * (jnp.asarray(bin_odd)[:, None] * parity[None, :])

    W = TF + _LOOKAHEAD
    yr, yi = pl.pallas_call(
        partial(_kernel, Q=Q, TF=TF, n_data=n_tiles, D=D),
        grid=(grid_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # xv (HBM)
            pl.BlockSpec((Q, LD), lambda i: (0, 0)),         # h0 (lo lanes)
            pl.BlockSpec((Q, LD), lambda i: (0, 0)),         # h1 (hi lanes)
            pl.BlockSpec((C, LD), lambda i: (0, 0)),         # cos, packed
            pl.BlockSpec((C, LD), lambda i: (0, 0)),         # sin, packed
            pl.BlockSpec((C, TF), lambda i: (0, 0)),         # sign
        ],
        out_specs=[
            pl.BlockSpec((C, TF), lambda i: (0, i)),
            pl.BlockSpec((C, TF), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, grid_tiles * TF), jnp.float32),
            jax.ShapeDtypeStruct((C, grid_tiles * TF), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 2, W, LD), jnp.float32),          # window slots
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xv, h0p, h1p, mc, ms, sign)
    if n is None:
        return yr, yi
    return yr[:, :n], yi[:, :n]


def _packed_consts(h0, h1, dft_c, dft_s, D: int, LD: int, C_pad: int = 0):
    """Branch-packed tap/DFT constants for _fir_dft: h0 taps in lanes
    0..D-1, h1 in D..2D-1, and the (C, M) DFT matrices packed into
    (C, LD) with their halves in the matching lane groups."""
    if 2 * D > LD:
        raise ValueError(f"branch packing needs 2D <= LD: {2 * D} > {LD}")
    h0p = jnp.pad(h0, ((0, 0), (0, LD - D)))
    h1p = jnp.pad(h1, ((0, 0), (D, LD - 2 * D)))
    cm = jnp.asarray(dft_c).T                          # (C, M)
    sm = jnp.asarray(dft_s).T
    mc = jnp.concatenate(
        [cm[:, :D], cm[:, D:],
         jnp.zeros((cm.shape[0], LD - 2 * D), cm.dtype)], axis=1)
    ms = jnp.concatenate(
        [sm[:, :D], sm[:, D:],
         jnp.zeros((sm.shape[0], LD - 2 * D), sm.dtype)], axis=1)
    if C_pad:
        mc = jnp.pad(mc, ((0, C_pad), (0, 0)))
        ms = jnp.pad(ms, ((0, C_pad), (0, 0)))
    return h0p, h1p, mc, ms


def _kernel_snr(xv_hbm, h0, h1, mc, ms, sign_w, pr, pi,
                yr_out, yi_out, oe_out, pe_out, xs, sem,
                *, Q: int, n_data: int, slot_ch: int, D: int):
    """Staged-mode variant that additionally emits the per-slot SNR
    inputs while y is still in VMEM: per-tile on-energy piece sums
    (C, 2 — a 1024-frame tile spans at most two slots) and the
    off-channel probe band-pass energies at the tile's <= 26 on-grid
    positions (four (C, _TFW) @ (_TFW, _PC) matmuls).  Saves the two
    full re-reads of the y stream the XLA SNR paid (~0.3 ms/block)."""
    i = pl.program_id(0)
    TF = _TF
    TFW = pr.shape[1]                              # wide per-tile frames
    W = TF + _LOOKAHEAD
    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    def window_copy(tile, dst_slot):
        return pltpu.make_async_copy(
            xv_hbm.at[:, pl.ds(tile * TF, W), :],
            xs.at[dst_slot], sem.at[dst_slot])

    @pl.when(i == 0)
    def _():
        window_copy(0, 0).start()

    @pl.when(i + 1 < n_data)
    def _():
        window_copy(i + 1, nxt).start()

    @pl.when(i >= n_data)
    def _():
        yr_out[...] = jnp.zeros_like(yr_out)
        yi_out[...] = jnp.zeros_like(yi_out)
        oe_out[...] = jnp.zeros_like(oe_out)
        pe_out[...] = jnp.zeros_like(pe_out)

    @pl.when(i < n_data)
    def _():
        window_copy(i, slot).wait()
        cr, ci, sr, si = _fir_dft(xs, slot, h0, h1, mc, ms, TFW, Q, D)
        ywr = (cr + si) * sign_w[...]              # rotated wide streams
        ywi = (ci - sr) * sign_w[...]
        yr_out[...] = ywr[:, :TF]
        yi_out[...] = ywi[:, :TF]

        # on-energy piece sums (rotation drops out of |y|^2, but use the
        # rotated streams for bitwise agreement with downstream readers)
        e = ywr[:, :TF] ** 2 + ywi[:, :TF] ** 2
        s0 = (TF * i) // slot_ch
        b = slot_ch * (s0 + 1) - TF * i
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, TF), 1)
        m0 = lane < b
        oe0 = jnp.where(m0, e, 0.0).sum(axis=1, keepdims=True)
        oe1 = jnp.where(m0, 0.0, e).sum(axis=1, keepdims=True)
        oe_out[0] = jnp.concatenate([oe0, oe1], axis=1)

        # probe band-pass at the tile's on-grid positions
        nn = (((1,), (0,)), ((), ()))
        prm, pim = pr[0], pi[0]                    # (_TFW, _PC), this phase
        rr = jax.lax.dot_general(ywr, prm, nn,
                                 preferred_element_type=jnp.float32)
        ri = jax.lax.dot_general(ywr, pim, nn,
                                 preferred_element_type=jnp.float32)
        ir = jax.lax.dot_general(ywi, prm, nn,
                                 preferred_element_type=jnp.float32)
        ii = jax.lax.dot_general(ywi, pim, nn,
                                 preferred_element_type=jnp.float32)
        p_re = rr - ii
        p_im = ri + ir
        pe_out[0] = p_re ** 2 + p_im ** 2


@partial(jax.jit, static_argnames=("D", "slot_ch", "interpret"))
def pfb_channelize_snr_fused(x3, h0, h1, dft_c, dft_s, bin_odd, D: int,
                             probe_mr, probe_mi, slot_ch: int,
                             interpret: bool = False):
    """Staged (2, F, _LD) input -> (yr, yi, oe, pe):
    yr/yi (C, grid*_TF) channel streams (junk tail, consumer slices),
    oe (grid, C, 2) per-tile on-energy piece sums,
    pe (grid, C, _PC) probe energies at the tile's grid positions.
    snr.assemble_fused_snr turns (oe, pe) into the (S, C) slot SNR."""
    Q = h0.shape[0]
    TFW = probe_mr.shape[1]
    if 2 * Q > _TF + _LOOKAHEAD - TFW:
        raise ValueError(f"prototype too long for the wide tile: "
                         f"2Q={2 * Q} > {_TF + _LOOKAHEAD - TFW}")
    C = dft_c.shape[1]
    LD = max(_LD, -(-D // 128) * 128)
    if x3.ndim != 3 or x3.shape[2] != LD:
        raise ValueError("pfb_channelize_snr_fused requires staged input")
    n_tiles = (x3.shape[1] - _LOOKAHEAD) // _TF
    grid_tiles = n_tiles + 1

    h0p, h1p, mc, ms = _packed_consts(h0, h1, dft_c, dft_s, D, LD)

    parity = jnp.asarray((np.arange(TFW) & 1).astype(np.float32))
    sign_w = 1.0 - 2.0 * (jnp.asarray(bin_odd)[:, None] * parity[None, :])

    W = _TF + _LOOKAHEAD
    yr, yi, oe, pe = pl.pallas_call(
        partial(_kernel_snr, Q=Q, n_data=n_tiles, slot_ch=slot_ch, D=D),
        grid=(grid_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # xv (HBM)
            pl.BlockSpec((Q, LD), lambda i: (0, 0)),         # h0 (lo lanes)
            pl.BlockSpec((Q, LD), lambda i: (0, 0)),         # h1 (hi lanes)
            pl.BlockSpec((C, LD), lambda i: (0, 0)),         # cos, packed
            pl.BlockSpec((C, LD), lambda i: (0, 0)),         # sin, packed
            pl.BlockSpec((C, TFW), lambda i: (0, 0)),        # sign (wide)
            pl.BlockSpec((1, TFW, _PC),
                         lambda i: (jax.lax.rem(i, 5), 0, 0)),   # probe re
            pl.BlockSpec((1, TFW, _PC),
                         lambda i: (jax.lax.rem(i, 5), 0, 0)),   # probe im
        ],
        out_specs=[
            pl.BlockSpec((C, _TF), lambda i: (0, i)),
            pl.BlockSpec((C, _TF), lambda i: (0, i)),
            pl.BlockSpec((1, C, 2), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, C, _PC), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, grid_tiles * _TF), jnp.float32),
            jax.ShapeDtypeStruct((C, grid_tiles * _TF), jnp.float32),
            jax.ShapeDtypeStruct((grid_tiles, C, 2), jnp.float32),
            jax.ShapeDtypeStruct((grid_tiles, C, _PC), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 2, W, LD), jnp.float32),          # window slots
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x3, h0p, h1p, mc, ms, sign_w, probe_mr, probe_mi)
    return yr, yi, oe, pe


def _kernel_snr_demod(xv_hbm, h0, h1, mc, ms, sign_w, pr, pi,
                      pkm_e, pkm_o, pkm_lo, pkm_hi,
                      words_out, oe_out, pe_out, xs, sem,
                      *, Q: int, n_data: int, slot_ch: int, gain: float,
                      n_sym: int, D: int):
    """The round-5 megakernel: channelize + SNR partials + GFSK demod +
    feedforward timing + slicer + word-pack, one pass per 1024-frame tile.

    Same FIR/DFT/rotator/SNR body as _kernel_snr, but the wide y tile
    (TFW >= demod_kernel._WL frames) is consumed by the demod body RIGHT
    HERE in VMEM and only the packed (C, 16) word tile leaves the chip —
    the y streams (the round-4 pipeline's largest remaining HBM tensors:
    one full write by the PFB kernel + one full read by the demod kernel,
    ~110 MB/block at full band) never exist.  Demod math is copied
    verbatim from demod_kernel._kernel so outputs stay bit-exact."""
    from .demod_kernel import _GROUP, _NPH, _WL, atan2_poly

    i = pl.program_id(0)
    TF = _TF
    TFW = pr.shape[1]
    W = TF + _LOOKAHEAD
    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    def window_copy(tile, dst_slot):
        return pltpu.make_async_copy(
            xv_hbm.at[:, pl.ds(tile * TF, W), :],
            xs.at[dst_slot], sem.at[dst_slot])

    @pl.when(i == 0)
    def _():
        window_copy(0, 0).start()

    @pl.when(jnp.logical_and(i + 1 < n_data, i + 1 < pl.num_programs(0)))
    def _():
        window_copy(i + 1, nxt).start()

    @pl.when(i >= n_data)
    def _():
        # zero y: the demod of an all-zero tile slices every bit to 1
        # (0 >= 0), exactly what demod_kernel produced from the staged
        # trailing zero tile — keep that bit pattern for parity
        words_out[0] = jnp.full_like(words_out[0], -1)
        oe_out[...] = jnp.zeros_like(oe_out)
        pe_out[...] = jnp.zeros_like(pe_out)

    @pl.when(i < n_data)
    def _():
        window_copy(i, slot).wait()
        cr, ci, sr, si = _fir_dft(xs, slot, h0, h1, mc, ms, TFW, Q, D)
        ywr = (cr + si) * sign_w[...]              # rotated wide streams
        ywi = (ci - sr) * sign_w[...]

        # ---- SNR partials (identical to _kernel_snr) ----
        e = ywr[:, :TF] ** 2 + ywi[:, :TF] ** 2
        s0 = (TF * i) // slot_ch
        b = slot_ch * (s0 + 1) - TF * i
        lane_tf = jax.lax.broadcasted_iota(jnp.int32, (1, TF), 1)
        m0 = lane_tf < b
        oe0 = jnp.where(m0, e, 0.0).sum(axis=1, keepdims=True)
        oe1 = jnp.where(m0, 0.0, e).sum(axis=1, keepdims=True)
        oe_out[0] = jnp.concatenate([oe0, oe1], axis=1)

        nn = (((1,), (0,)), ((), ()))
        prm, pim = pr[0], pi[0]                    # (TFW, _PC), this phase
        rr = jax.lax.dot_general(ywr, prm, nn,
                                 preferred_element_type=jnp.float32)
        ri = jax.lax.dot_general(ywr, pim, nn,
                                 preferred_element_type=jnp.float32)
        ir = jax.lax.dot_general(ywi, prm, nn,
                                 preferred_element_type=jnp.float32)
        ii = jax.lax.dot_general(ywi, pim, nn,
                                 preferred_element_type=jnp.float32)
        p_re = rr - ii
        p_im = ri + ir
        pe_out[0] = p_re ** 2 + p_im ** 2

        # ---- demod + timing + slicer + pack (demod_kernel._kernel) ----
        wr = ywr[:, :_WL]                          # (C, _WL) window
        wi = ywi[:, :_WL]
        C = wr.shape[0]
        wr1 = jnp.roll(wr, -1, axis=1)             # y[j+1] (tail garbage ok)
        wi1 = jnp.roll(wi, -1, axis=1)
        pr_ = wr1 * wr + wi1 * wi
        pi_ = wi1 * wr - wr1 * wi
        d = gain * atan2_poly(pi_, pr_)            # d[j], valid j < _WL-1
        d1 = jnp.roll(d, -1, axis=1)               # d[j+1]

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, _WL), 1)
        even = (lane & 1) == 0
        nvalid = jnp.clip(n_sym - i * _GROUP, 0, _GROUP)
        valid = lane < 2 * nvalid
        me = even & valid
        mo = jnp.logical_not(even) & valid

        us = [jnp.abs(d * (1.0 - p8 / 8.0) + d1 * (p8 / 8.0))
              for p8 in range(8)]
        cols = []
        for mask in (me, mo):
            for p8 in range(8):
                cols.append(jnp.where(mask, us[p8], 0.0)
                            .sum(axis=1, keepdims=True))

        bestv = cols[0]
        besti = jnp.zeros((C, 1), jnp.int32)
        for p in range(1, _NPH):
            upd = cols[p] > bestv
            bestv = jnp.where(upd, cols[p], bestv)
            besti = jnp.where(upd, jnp.int32(p), besti)

        fb = (besti % 8).astype(jnp.float32) / 8.0
        par_odd = besti >= 8
        soft_all = d * (1.0 - fb) + d1 * fb
        bits_all = (soft_all >= 0).astype(jnp.float32)

        be = jnp.dot(bits_all, pkm_e[...],
                     preferred_element_type=jnp.float32)
        bo = jnp.dot(bits_all, pkm_o[...],
                     preferred_element_type=jnp.float32)
        by = jnp.where(par_odd, bo, be)
        lo = jnp.dot(by, pkm_lo[...], preferred_element_type=jnp.float32)
        hi = jnp.dot(by, pkm_hi[...], preferred_element_type=jnp.float32)
        words_out[0] = (lo.astype(jnp.int32) |
                        (hi.astype(jnp.int32) << 16))


@partial(jax.jit, static_argnames=("D", "slot_ch", "gain", "n_sym",
                                   "interpret"))
def pfb_channelize_snr_demod_fused(x3, h0, h1, dft_c, dft_s, bin_odd,
                                   D: int, probe_mr, probe_mi,
                                   slot_ch: int, gain: float, n_sym: int,
                                   interpret: bool | None = None):
    """Staged (2, F, _LD) input -> (words, oe, pe):
    words (C, ceil(n_sym/32)) int32 packed symbol planes (all C rows incl.
    the probe row — the caller drops it), oe/pe as
    pfb_channelize_snr_fused.  Bit-exact with
    demod_timing_pack(pfb_channelize_snr_fused(...)) — the y streams
    simply never leave VMEM."""
    from .demod_kernel import _GROUP, _WL, _WPT, _pack_consts
    from .detect_pallas import _resolve_interpret
    interpret = _resolve_interpret(interpret)

    Q = h0.shape[0]
    TFW = probe_mr.shape[1]
    if TFW < _WL:
        raise ValueError(f"wide tile too narrow for the fused demod: "
                         f"{TFW} < {_WL}")
    if 2 * Q > _TF + _LOOKAHEAD - TFW:
        raise ValueError(f"prototype too long for the wide tile: "
                         f"2Q={2 * Q} > {_TF + _LOOKAHEAD - TFW}")
    C = dft_c.shape[1]
    C_p = -(-C // 8) * 8
    LD = max(_LD, -(-D // 128) * 128)
    if x3.ndim != 3 or x3.shape[2] != LD:
        raise ValueError("pfb_channelize_snr_demod_fused requires staged "
                         "input")
    n_tiles = (x3.shape[1] - _LOOKAHEAD) // _TF
    n_t_sym = -(-n_sym // _GROUP)
    grid_tiles = max(n_tiles, n_t_sym)

    # pad the channel axis to a sublane multiple so every (C, ...) tile
    # and the word output block satisfy Mosaic's alignment; padded rows
    # produce zero streams and are sliced off below
    h0p, h1p, mc, ms = _packed_consts(h0, h1, dft_c, dft_s, D, LD,
                                      C_pad=C_p - C)

    parity = jnp.asarray((np.arange(TFW) & 1).astype(np.float32))
    bo = jnp.pad(jnp.asarray(bin_odd), (0, C_p - C))
    sign_w = 1.0 - 2.0 * (bo[:, None] * parity[None, :])

    pkm_e, pkm_o, pkm_lo, pkm_hi = (jnp.asarray(m) for m in _pack_consts())

    W = _TF + _LOOKAHEAD
    words, oe, pe = pl.pallas_call(
        partial(_kernel_snr_demod, Q=Q, n_data=n_tiles, slot_ch=slot_ch,
                gain=float(gain), n_sym=n_sym, D=D),
        grid=(grid_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # xv (HBM)
            pl.BlockSpec((Q, LD), lambda i: (0, 0)),         # h0 (lo lanes)
            pl.BlockSpec((Q, LD), lambda i: (0, 0)),         # h1 (hi lanes)
            pl.BlockSpec((C_p, LD), lambda i: (0, 0)),       # cos, packed
            pl.BlockSpec((C_p, LD), lambda i: (0, 0)),       # sin, packed
            pl.BlockSpec((C_p, TFW), lambda i: (0, 0)),      # sign (wide)
            pl.BlockSpec((1, TFW, _PC),
                         lambda i: (jax.lax.rem(i, 5), 0, 0)),   # probe re
            pl.BlockSpec((1, TFW, _PC),
                         lambda i: (jax.lax.rem(i, 5), 0, 0)),   # probe im
            pl.BlockSpec((_WL, _WPT * 4), lambda i: (0, 0)),     # pack even
            pl.BlockSpec((_WL, _WPT * 4), lambda i: (0, 0)),     # pack odd
            pl.BlockSpec((_WPT * 4, _WPT), lambda i: (0, 0)),    # pack lo
            pl.BlockSpec((_WPT * 4, _WPT), lambda i: (0, 0)),    # pack hi
        ],
        out_specs=[
            pl.BlockSpec((1, C_p, _WPT), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, C_p, 2), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, C_p, _PC), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid_tiles, C_p, _WPT), jnp.int32),
            jax.ShapeDtypeStruct((grid_tiles, C_p, 2), jnp.float32),
            jax.ShapeDtypeStruct((grid_tiles, C_p, _PC), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 2, W, LD), jnp.float32),          # window slots
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x3, h0p, h1p, mc, ms, sign_w, probe_mr, probe_mi,
      pkm_e, pkm_o, pkm_lo, pkm_hi)

    wordsf = words.transpose(1, 0, 2).reshape(C_p, grid_tiles * _WPT)
    nw = -(-n_sym // 32)
    wordsf = wordsf[:C, :nw]
    if n_sym % 32:
        tail = np.full(nw, -1, np.int64)
        tail[-1] = (1 << (n_sym % 32)) - 1
        wordsf = wordsf & jnp.asarray(tail.astype(np.uint32).view(np.int32))
    return wordsf, oe[:, :C], pe[:, :C]
