"""Benchmark: wideband IQ samples/s/chip, full 79-channel band.

Measures the fused frontend step (PFB channelize -> GFSK demod ->
feedforward timing recovery -> slicer -> SNR squelch -> dense access-code
detect -> top-K hit extraction + packed window gather) streaming over
device-resident full-band blocks, then checks LAP-detection parity against
planted ground truth (untimed).

Methodology notes:
  * The whole streaming loop runs ON DEVICE (lax.fori_loop over blocks,
    one dispatch per workload): this rig reaches the chip through a tunnel
    whose host link is ~0.1 GB/s with unreliable async completion
    semantics, so per-block dispatch timing measures the tunnel.  A
    production ingest path double-buffers DMA against compute; the device
    compute measured here is the bound.
  * The loop's trip count is a runtime argument (one compile), and
    throughput is the DIFFERENCE quotient between a 2x and a 1x workload
    ((W2-W1)/(t2-t1)), cancelling constant dispatch/await overhead.

Baseline (BASELINE.md): the reference publishes no numbers; the target of
record is real-time full-band = 80 Msps/chip. vs_baseline = value / 80e6.

A second, ingest-included figure is measured with a production-shaped
double-buffered pipeline: the host sends only each block's NEW step samples
as int16 (the SDR wire format — USRP ships 16-bit IQ, apps/btrx:134-138
`-s` input-shorts path), device_put of block i+1 overlaps compute of block
i, and the device keeps the overlap-save carry + does the int16->float
conversion.  On this rig the host->device link is a ~0.1 GB/s tunnel, so
the ingest-included number measures the tunnel, not the design: the
pipeline needs step_samples*4 B per 64-slot block (12.8 MB / 40 ms of air
time = 0.32 GB/s sustained) — below any production PCIe/DMA link (>=8
GB/s) but ~3x above this tunnel.  Both numbers are reported; vs_baseline
stays keyed to the device-compute bound.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"ingest_samples_per_s", "ingest_vs_baseline", "ingest_note"}.
"""
import json
import sys
import time

import numpy as np


def make_stream_runner(fe, n_distinct: int):
    """Jitted device-side streaming loop with a dynamic block count;
    returns a checksum so nothing is dead-code-eliminated."""
    import jax
    import jax.numpy as jnp

    step, bs = fe.step_samples, fe.block_samples

    @jax.jit
    def run(x, n_blocks):
        def body(i, acc):
            pos = (i % n_distinct) * step
            xb = jax.lax.dynamic_slice(x, (0, pos), (2, bs))
            _, n_hits, tab, win, _, _, _ = fe._jit_step(xb)
            return (acc + n_hits.astype(jnp.float32)
                    + tab[0, 1].astype(jnp.float32)
                    + win[0, 0].astype(jnp.float32))
        return jax.lax.fori_loop(0, n_blocks, body, jnp.float32(0))

    return run


def make_ingest_runner(fe):
    """Jitted step taking (carry, new int16 step samples): the device keeps
    the overlap-save tail and converts int16->float32, so the host->device
    transfer is exactly step_samples of wire-format (short) IQ per block."""
    import jax
    import jax.numpy as jnp

    overlap = fe.block_samples - fe.step_samples

    @jax.jit
    def step(carry, xi_new):
        x_new = xi_new.astype(jnp.float32) * (1.0 / 32768.0)
        xb = jnp.concatenate([carry, x_new], axis=1)
        _, n_hits, tab, win, _, _, _ = fe._jit_step(xb)
        acc = (n_hits.astype(jnp.float32) + tab[0, 1].astype(jnp.float32)
               + win[0, 0].astype(jnp.float32))
        return xb[:, -overlap:], acc

    return step


def run_ingest(step, carry0, blocks, k):
    """Double-buffered host->device streaming: device_put of block i+1 is
    dispatched before awaiting step i, overlapping DMA with compute (two
    blocks in flight).  Returns wall seconds for k blocks."""
    import jax
    n = len(blocks)
    accs = []
    carry = carry0
    d = jax.device_put(blocks[0])
    t0 = time.time()
    for i in range(k):
        d_next = jax.device_put(blocks[(i + 1) % n])   # async H2D prefetch
        carry, acc = step(carry, d)                    # async compute
        accs.append(acc)
        d = d_next
    jax.block_until_ready(accs)
    return time.time() - t0


def make_parity_runner(fe, n_distinct: int):
    import jax
    import jax.numpy as jnp

    step, bs = fe.step_samples, fe.block_samples

    @jax.jit
    def run(x):
        def body(carry, i):
            xb = jax.lax.dynamic_slice(x, (0, i * step), (2, bs))
            _, n_hits, tab, _, _, _, _ = fe._jit_step(xb)
            return carry, (n_hits, tab)
        _, ys = jax.lax.scan(body, 0,
                             jnp.arange(n_distinct, dtype=jnp.int32))
        return ys

    return run


def main():
    import jax
    # persistent compile cache: the fused full-band step takes minutes to
    # compile; cache it across bench invocations
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    from gr_bluetooth_tpu.models.frontend import FrontEnd
    from gr_bluetooth_tpu.testing import PiconetSim, make_piconet_capture

    FS, CENTER = 80e6, 2441e6
    BLOCK_SLOTS = 64
    N_DISTINCT = 8
    N1 = 128                      # timed blocks; second workload is 2*N1
    LAP, UAP = 0x24D952, 0x47

    # max_ac_errors=1: the multi_LAP parity setting (btbb_find_ac,
    # lib/multi_LAP_impl.cc:74)
    fe = FrontEnd(FS, CENTER, block_slots=BLOCK_SLOTS, max_ac_errors=1)
    assert fe.bank.n_channels == 79, fe.bank.n_channels

    # golden capture: hop-consistent packets across the full band
    sim = PiconetSim(lap=LAP, uap=UAP, clk0=0x12780)
    n_slots = BLOCK_SLOTS * N_DISTINCT + 8
    samples, sent = make_piconet_capture(
        sim, n_slots=n_slots, fs=FS, center_freq=CENTER, seed=11,
        tx_slots=range(0, n_slots - 8, 2), noise_std=0.02)
    x = np.stack([samples.real, samples.imag]).astype(np.float32)
    need = N_DISTINCT * fe.step_samples + fe.overlap_samples
    if x.shape[1] < need:
        x = np.pad(x, ((0, 0), (0, need - x.shape[1])))
    xd = jax.device_put(x[:, :need])

    run = make_stream_runner(fe, N_DISTINCT)
    float(run(xd, 2))             # compile + settle; fetch forces completion

    t0 = time.time()
    float(run(xd, N1))
    t1 = time.time() - t0
    t0 = time.time()
    float(run(xd, 2 * N1))
    t2 = time.time() - t0
    dt_block = (t2 - t1) / N1
    samples_per_s = fe.step_samples / dt_block

    # ingest-included: int16 wire blocks, double-buffered H2D vs compute
    xi = np.clip(x * 32767.0, -32768, 32767).astype(np.int16)
    blocks = [np.ascontiguousarray(
        xi[:, fe.overlap_samples + i * fe.step_samples:
           fe.overlap_samples + (i + 1) * fe.step_samples])
        for i in range(N_DISTINCT - 1)]
    ingest_step = make_ingest_runner(fe)
    carry0 = jax.device_put(x[:, :fe.overlap_samples])
    K1 = 16
    run_ingest(ingest_step, carry0, blocks, 2)         # compile + settle
    ti1 = run_ingest(ingest_step, carry0, blocks, K1)
    ti2 = run_ingest(ingest_step, carry0, blocks, 2 * K1)
    ingest_sps = fe.step_samples / ((ti2 - ti1) / K1)

    # parity (untimed): every planted packet detected; slot 0 excluded
    # (the bit stream leads the input by the filter group delay, so a
    # packet in the capture's first symbols starts before bit index 0 —
    # the reference needs history before slot 0 too)
    parity_run = make_parity_runner(fe, N_DISTINCT)
    n_hits, tabs = (np.asarray(o) for o in parity_run(xd))
    got, laps = set(), set()
    for b in range(N_DISTINCT):
        base = b * BLOCK_SLOTS
        for c, t, lap, err in tabs[b]:
            if c < 0 or t >= BLOCK_SLOTS * 625:
                continue
            slot = (int(t) + fe.delay_sym) // 625
            got.add((base + slot, fe.bank.channels[int(c)]))
            laps.add(int(lap))
    span = N_DISTINCT * BLOCK_SLOTS
    want = {(s, c) for s, c, _ in sent if 1 <= s < span - 1}
    missing = want - got
    parity = (not missing) and laps == {LAP}
    if not parity:
        print(f"# parity FAIL: missing={sorted(missing)[:5]} "
              f"laps={[hex(l) for l in laps]}", file=sys.stderr)

    value = samples_per_s if parity else 0.0
    print(json.dumps({
        "metric": "wideband IQ samples/s/chip (79-ch channelize+demod+AC "
                  "detect); LAP detection parity",
        "value": round(value, 1),
        "unit": "samples/s",
        "vs_baseline": round(value / 80e6, 2),
        "ingest_samples_per_s": round(ingest_sps, 1),
        "ingest_vs_baseline": round(ingest_sps / 80e6, 2),
        "ingest_note": "int16 wire blocks, double-buffered device_put "
                       "overlapped with compute; this rig's host->device "
                       "tunnel is ~0.1 GB/s (needs 0.32 GB/s for real time "
                       "at int16), so this bounds the tunnel, not the chip",
    }))


if __name__ == "__main__":
    main()
