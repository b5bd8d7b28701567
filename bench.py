"""Benchmark: wideband IQ samples/s/chip, full 79-channel band.

Measures the fused frontend step (PFB channelize -> GFSK demod ->
feedforward timing recovery -> slicer -> SNR squelch -> packed AC detect
-> top-K hit extraction + packed window gather) streaming over
device-resident full-band blocks, then checks LAP-detection parity against
planted ground truth (untimed).

Methodology notes:
  * The whole streaming loop runs ON DEVICE (lax.fori_loop over blocks,
    one dispatch per workload): this rig reaches the chip through a tunnel
    (raw device_put bandwidth is MEASURED and reported as
    `raw_link_gbps`), so per-block dispatch timing measures the tunnel.
    A production ingest path double-buffers DMA against compute; the
    device compute measured here is the bound.
  * The loop's trip count is a runtime argument (one compile), and
    throughput is the DIFFERENCE quotient between a 2x and a 1x workload
    ((W2-W1)/(t2-t1)), cancelling constant dispatch/await overhead.

Baseline (BASELINE.md): the reference publishes no numbers; the target of
record is real-time full-band = 80 Msps/chip. vs_baseline = value / 80e6.

Additional figures in the JSON line:
  * ingest-included samples/s for int16 AND int8 wire formats with the
    production-shaped double-buffered pipeline (device-side carry +
    conversion, device_put of block i+1 overlapping compute of block i),
    plus the measured raw `device_put` link bandwidth that bounds them.
  * roofline accounting: modeled HBM bytes + FLOPs per block at the
    CURRENT kernel boundaries (staged input read once, y stream written
    by the fused PFB+SNR kernel and read once by the demod kernel,
    packed planes), the implied speed-of-light block time, the achieved
    fraction, and the fraction against the round-3 model for
    comparability.
  * sniffer end-to-end: a busy capture (every 2nd slot occupied) through
    the FULL Sniffer (device frontend + host packet decode), plus the
    host-decode half alone (us/packet and the implied real-time factor
    at a worst-case fully-busy 1600 packets/s air load).
  * hostile sniffer load: every slot occupied with mixed 1/3/5-slot
    types from three piconets, LE on — scalar vs batched vs discovery
    host decode.

Prints ONE JSON line.
"""
import json
import sys
import time

import numpy as np

FS, CENTER = 80e6, 2441e6
BLOCK_SLOTS = 64
N_DISTINCT = 8
N1 = 128                      # timed blocks; second workload is 2*N1
LAP, UAP = 0x24D952, 0x47

# chip peaks for the roofline: device_kind -> (fp32 matmul FLOP/s,
# HBM bytes/s).  fp32 matmuls run via the 3-pass bf16 split (~peak/4).
CHIP_PEAKS = {
    "TPU v4": (6.9e13, 1.23e12),
    "TPU v5 lite": (4.9e13, 8.19e11),
    "TPU v5": (1.15e14, 2.76e12),
    "TPU v5p": (1.15e14, 2.76e12),
    "TPU v6 lite": (2.3e14, 1.64e12),
    "TPU v6e": (2.3e14, 1.64e12),
}
DEFAULT_PEAKS = (4.9e13, 8.19e11)


def make_stream_runner(fe, n_distinct: int):
    """Jitted device-side streaming loop with a dynamic block count;
    returns a checksum so nothing is dead-code-eliminated.

    Blocks are pre-staged on the leading axis of `x` ((K, 2, F, 128) via
    fe.stage_block).  The leading-axis dynamic index copies the staged
    block (~0.14 ms at full band) — kept deliberately: it makes every
    loop iteration depend on i (a loop-invariant body gets hoisted by
    XLA and measures nothing), and production ingest writes each staged
    block fresh anyway, so a per-block buffer build is honest."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x, n_blocks):
        def body(i, acc):
            xb = jax.lax.dynamic_index_in_dim(x, i % n_distinct, 0,
                                              keepdims=False)
            _, n_hits, tab, win, _, _, _ = fe._jit_step(xb)
            return (acc + n_hits.astype(jnp.float32)
                    + tab[0, 1].astype(jnp.float32)
                    + win[0, 0].astype(jnp.float32))
        return jax.lax.fori_loop(0, n_blocks, body, jnp.float32(0))

    return run


def stage_blocks(fe, x: np.ndarray, n_distinct: int) -> np.ndarray:
    """Cut a long (2, N) capture into n_distinct staged blocks
    (K, 2, F, 128) for make_stream_runner / make_parity_runner."""
    return np.stack([
        fe.stage_block(x[:, i * fe.step_samples:
                         i * fe.step_samples + fe.block_samples])
        for i in range(n_distinct)])


def make_ingest_runner(fe, np_dtype, scale):
    """Jitted step taking (carry, new wire-format step samples): the device
    keeps the overlap-save tail and converts wire->float32, so the
    host->device transfer is exactly step_samples of wire IQ per block."""
    import jax
    import jax.numpy as jnp

    overlap = fe.block_samples - fe.step_samples

    @jax.jit
    def step(carry, xi_new):
        x_new = xi_new.astype(jnp.float32) * scale
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


def measure_raw_link(n_bytes: int = 12_800_000, repeats: int = 8) -> float:
    """Raw host->device `device_put` bandwidth in GB/s (the evidence for
    any ingest-figure interpretation; per-block wire size payload)."""
    import jax
    buf = np.ones(n_bytes // 2, np.int16)
    jax.block_until_ready(jax.device_put(buf))         # warm
    t0 = time.time()
    for _ in range(repeats):
        jax.block_until_ready(jax.device_put(buf))
    dt = time.time() - t0
    return n_bytes * repeats / dt / 1e9


def make_parity_runner(fe, n_distinct: int):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        def body(carry, i):
            xb = jax.lax.dynamic_index_in_dim(x, i, 0, keepdims=False)
            _, n_hits, tab, _, _, _, _ = fe._jit_step(xb)
            return carry, (n_hits, tab)
        _, ys = jax.lax.scan(body, 0,
                             jnp.arange(n_distinct, dtype=jnp.int32))
        return ys

    return run


def roofline(fe, dt_block: float, device_kind: str) -> dict:
    """Model the fused step's FLOPs and HBM bytes per block under ideal
    fusion, and report achieved fraction of the binding resource.

    Byte model (matches the round-4 kernelized pipeline, where the only
    HBM-resident tensors left are the staged input and the channel
    streams): staged x (2, n_x, 128) f32 read once by the PFB kernel
    (the 128-lane branch pad is physical, so its 3.2x is REAL traffic --
    the ideal-unpadded figure is also reported), y (C+1, n) f32 written
    by the PFB kernel and read 3x (SNR on + probe, demod kernel), packed
    word/hit planes W+R (KBs).  The former intermediates -- deinterleaved
    xp, branch outputs u, demod d, dense bits -- live only in VMEM now.
    FLOP model: branch FIR (2 planes x 2 halves x Q x 128 lanes x n
    MACs), DFT (8 NT matmuls (C+1, 128) x (TF, 128)), demod atan2
    polynomial (~30 ops/sample) + 16-phase metrics, pack matmuls, probe
    matmuls, detect kernel int-ops (~1100 bit-ops per 32-offset word).
    This is the SPEED-OF-LIGHT accounting: achieved_fraction < 1
    quantifies headroom (known residue: the y stream is re-read by SNR
    and the demod kernel separately instead of once, and the stream
    runner's leading-axis block index copies the staged input once).
    """
    b = fe.bank
    M, D = b.sps, b.decim
    Q = -(-b.ntaps // M)
    N = fe.block_samples
    n_x = N // D
    n = n_x - 2 * Q
    C = b.n_channels
    n_sym = fe.n_sym
    W = -(-(n_sym - 72 + 1) // 32)

    f32 = 4
    mb = [
        ("x_staged", 2 * n_x * 128 * f32),            # read once (padded)
        ("y", (1 + 1) * 2 * (C + 1) * n * f32),       # W once, R once (K2)
        ("words_planes", 2 * 10 * C * W * 4),
    ]
    hbm_bytes = sum(v for _, v in mb)
    hbm_bytes_unpadded = hbm_bytes - 2 * n_x * (128 - D) * f32

    flops = {
        "fir": 2 * 2 * 2 * Q * 128 * n,
        "dft": 2 * 8 * 128 * (C + 1) * n,
        "demod_metric": (30 + 16 * 4) * C * 2 * n_sym,
        "pack_mm": 2 * C * (2 * 1152 * 64 + 2 * 64 * 16) * (n_sym // 512),
        "probe": 2 * 4 * 200 * C * (n // 40),
        "detect_intops": 1100 * C * W,
    }
    total_flops = sum(flops.values())

    peak_flops, peak_bw = CHIP_PEAKS.get(device_kind, DEFAULT_PEAKS)
    t_bytes = hbm_bytes / peak_bw
    t_flops = total_flops / peak_flops
    modeled = max(t_bytes, t_flops)
    return {
        "device_kind": device_kind,
        "hbm_bytes_per_block": hbm_bytes,
        "hbm_bytes_ideal_unpadded": hbm_bytes_unpadded,
        "flops_per_block": total_flops,
        "bound": "hbm" if t_bytes >= t_flops else "flops",
        "modeled_ms": round(modeled * 1e3, 3),
        "actual_ms": round(dt_block * 1e3, 3),
        "achieved_fraction": round(modeled / dt_block, 3),
        "achieved_fraction_vs_r3_model": round(0.456e-3 / dt_block, 3),
        "note": "speed-of-light at the CURRENT kernel boundaries (staged "
                "input read once; y written by the PFB+SNR kernel, read "
                "once by the demod kernel; packed planes) — the model "
                "tightens as fusion improves, so the r3-model fraction "
                "(0.456 ms basis) is also reported for comparability",
    }


def bench_sniffer_hostile():
    """Worst-case host-decode loads (VERDICT r3 #2), full 79-channel band,
    three piconets, LE on:
      * `mixed`: every slot occupied back-to-back with mixed 1/3/5-slot
        DM/DH types (~580 pkt/s air rate — big packets arrive slower)
      * `max_rate`: every slot a 1-slot packet = the fully-busy
        1600 pkt/s air load
    For each: scalar vs batched us/packet, the real-time factor against
    the capture's OWN air rate, and (max_rate) the per-piconet
    multiprocess decode pool (models/parallel_host.py)."""
    import logging

    from gr_bluetooth_tpu.models.parallel_host import ParallelHostDecoder
    from gr_bluetooth_tpu.models.sniffer import Sniffer
    from gr_bluetooth_tpu.testing import (PiconetSim, make_hostile_capture,
                                          make_multi_piconet_capture)

    n_slots = 256
    air_s = n_slots * 625e-6
    sims = [PiconetSim(lap=LAP, uap=UAP, clk0=0x12780),
            PiconetSim(lap=0x1A2B3C, uap=0x99, clk0=0x00450),
            PiconetSim(lap=0x654321, uap=0x13, clk0=0x71111)]

    logging.disable(logging.INFO)
    try:
        out = {}
        for name, maker in (
                ("mixed", lambda: make_hostile_capture(
                    sims, n_slots, FS, CENTER, seed=13)),
                ("max_rate", lambda: make_multi_piconet_capture(
                    sims, n_slots, FS, CENTER, seed=13))):
            samples, sent = maker()
            x = np.stack([samples.real, samples.imag]).astype(np.float32)
            sn = Sniffer(FS, CENTER, block_slots=BLOCK_SLOTS)
            blocks = list(sn.fe.stream(x))
            n_hits = sum(len(r.hits) for r in blocks)
            reps = 10
            sec = {"planted_pkts": len(sent), "hits": n_hits,
                   "air_pkt_per_s": round(len(sent) / air_s, 0)}
            for mode, batch in (("scalar", False), ("batched", True)):
                s2 = Sniffer(FS, CENTER, block_slots=BLOCK_SLOTS,
                             batch_decode=batch)
                s2.run_blocks(iter(blocks))    # discovery warm-up
                sec[f"decoded_{mode}"] = len(s2.decoded)
                t0 = time.time()
                for _ in range(reps):
                    s2.run_blocks(iter(blocks))
                dt = (time.time() - t0) / reps
                us = dt / max(n_hits, 1) * 1e6
                sec[f"host_us_per_pkt_{mode}"] = round(us, 1)
                sec[f"host_x_realtime_{mode}"] = round(air_s / dt, 2)
            if name == "max_rate":
                with ParallelHostDecoder(n_workers=3) as pool:
                    got = pool.drive(sn.fe, iter(blocks))
                    t0 = time.time()
                    for _ in range(reps):
                        pool.drive(sn.fe, iter(blocks))
                    dtp = (time.time() - t0) / reps
                sec["decoded_parallel3"] = len(got)
                sec["host_us_per_pkt_parallel3"] = round(
                    dtp / max(n_hits, 1) * 1e6, 1)
                sec["host_x_realtime_parallel3"] = round(air_s / dtp, 2)
                # discovery mode: fresh piconet state every pass
                s3 = Sniffer(FS, CENTER, block_slots=BLOCK_SLOTS)
                t0 = time.time()
                for _ in range(3):
                    s3.basic_rate_piconets.clear()
                    s3.low_energy_piconets.clear()
                    s3.run_blocks(iter(blocks))
                sec["host_us_per_pkt_discovery"] = round(
                    (time.time() - t0) / 3 / max(n_hits, 1) * 1e6, 1)
            out[name] = sec
        out["note"] = ("3 piconets, LE on; x_realtime compares host time "
                       "to the capture's own 160 ms of air; max_rate IS "
                       "the fully-busy 1600 pkt/s load; parallel3 = "
                       "per-LAP multiprocess decode pool")
        return out
    finally:
        logging.disable(logging.NOTSET)


def bench_sniffer_e2e():
    """Busy capture through the full Sniffer: device frontend + host
    decode.  Returns e2e figures plus the host-decode half alone."""
    import logging

    from gr_bluetooth_tpu.models.sniffer import Sniffer
    from gr_bluetooth_tpu.testing import PiconetSim, make_piconet_capture

    n_slots = 256
    sim = PiconetSim(lap=LAP, uap=UAP, clk0=0x12780)
    samples, sent = make_piconet_capture(
        sim, n_slots=n_slots, fs=FS, center_freq=CENTER, seed=13,
        tx_slots=range(0, n_slots - 8, 2), noise_std=0.02)
    x = np.stack([samples.real, samples.imag]).astype(np.float32)

    logging.disable(logging.INFO)          # no console spam in the bench
    try:
        sn = Sniffer(FS, CENTER, block_slots=BLOCK_SLOTS)
        # warm: compile + piconet discovery state
        blocks = list(sn.fe.stream(x))
        sn.run_blocks(iter(blocks))
        n_pkts = len(sn.decoded)

        # e2e: stream + decode, fresh sniffer (known-piconet steady state
        # comes from the FHS-free discovery inside the run itself); int16
        # wire = the production SDR format (apps/btrx:134-138)
        sn2 = Sniffer(FS, CENTER, block_slots=BLOCK_SLOTS)
        list(sn2.fe.stream(x[:, :sn2.fe.step_samples +
                             sn2.fe.overlap_samples], wire="i16"))  # compile
        t0 = time.time()
        sn2.run_blocks(sn2.fe.stream(x, wire="i16"))
        t_e2e = time.time() - t0

        # host half alone (precomputed device outputs), steady state
        sn3 = Sniffer(FS, CENTER, block_slots=BLOCK_SLOTS)
        sn3.run_blocks(iter(blocks))       # discovery warm-up
        sn3.basic_rate_piconets.clear()
        sn3.run_blocks(iter(blocks[:1]))   # re-discover once
        t0 = time.time()
        sn3.run_blocks(iter(blocks[1:]))
        t_host = time.time() - t0
        n_host = sum(len(r.hits) for r in blocks[1:])
    finally:
        logging.disable(logging.NOTSET)

    n_samples = x.shape[1]
    air_s = n_slots * 625e-6
    us_per_pkt = t_host / max(n_host, 1) * 1e6
    return {
        "planted_pkts": len(sent),
        "decoded_pkts": n_pkts,
        "e2e_samples_per_s": round(n_samples / t_e2e, 1),
        "e2e_x_realtime": round(air_s / t_e2e, 2),
        "host_decode_us_per_pkt": round(us_per_pkt, 1),
        "host_decode_x_realtime_at_1600pps": round(
            1.0 / (1600 * us_per_pkt * 1e-6), 2),
        "note": "e2e includes the measured-slow host link; host half is "
                "the decode bound on a production link",
    }


def main():
    import jax
    # persistent compile cache: the fused full-band step takes minutes to
    # compile; cache it across bench invocations
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    from gr_bluetooth_tpu.models.frontend import FrontEnd
    from gr_bluetooth_tpu.testing import PiconetSim, make_piconet_capture

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
    xd = jax.device_put(stage_blocks(fe, x[:, :need], N_DISTINCT))

    print("# bench: compiling device stream runner", file=sys.stderr)
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

    print(f"# bench: device loop {samples_per_s/1e6:.0f} Msps; measuring raw link", file=sys.stderr)
    raw_gbps = measure_raw_link()

    print(f"# bench: raw link {raw_gbps:.3f} GB/s; ingest runs", file=sys.stderr)
    # ingest-included: wire blocks, double-buffered H2D vs compute
    ingest = {}
    for name, np_dtype, scale, full in (
            ("int16", np.int16, 32767.0, 32768.0),
            ("int8", np.int8, 127.0, 128.0)):
        xi = np.clip(x * scale, -full, full - 1).astype(np_dtype)
        blocks = [np.ascontiguousarray(
            xi[:, fe.overlap_samples + i * fe.step_samples:
               fe.overlap_samples + (i + 1) * fe.step_samples])
            for i in range(N_DISTINCT - 1)]
        step = make_ingest_runner(fe, np_dtype, 1.0 / full)
        carry0 = jax.device_put(x[:, :fe.overlap_samples])
        K1 = 16
        run_ingest(step, carry0, blocks, 2)            # compile + settle
        ti1 = run_ingest(step, carry0, blocks, K1)
        ti2 = run_ingest(step, carry0, blocks, 2 * K1)
        ingest[name] = fe.step_samples / ((ti2 - ti1) / K1)

    # parity (untimed): every planted packet detected; slot 0 excluded
    # (the bit stream leads the input by the filter group delay, so a
    # packet in the capture's first symbols starts before bit index 0 —
    # the reference needs history before slot 0 too)
    print("# bench: parity run", file=sys.stderr)
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

    kind = jax.devices()[0].device_kind
    roof = roofline(fe, dt_block, kind)
    print("# bench: sniffer e2e (fresh sniffer-config compiles on first run)", file=sys.stderr)
    e2e = bench_sniffer_e2e()
    print("# bench: hostile sniffer load", file=sys.stderr)
    hostile = bench_sniffer_hostile()

    value = samples_per_s if parity else 0.0
    print(json.dumps({
        "metric": "wideband IQ samples/s/chip (79-ch channelize+demod+AC "
                  "detect); LAP detection parity",
        "value": round(value, 1),
        "unit": "samples/s",
        "vs_baseline": round(value / 80e6, 2),
        "raw_link_gbps": round(raw_gbps, 3),
        "ingest_samples_per_s_int16": round(ingest["int16"], 1),
        "ingest_samples_per_s_int8": round(ingest["int8"], 1),
        "ingest_vs_baseline_int16": round(ingest["int16"] / 80e6, 2),
        "ingest_vs_baseline_int8": round(ingest["int8"] / 80e6, 2),
        "ingest_note": "wire blocks double-buffered against compute; "
                       "real time needs 0.32 GB/s (int16) / 0.16 GB/s "
                       "(int8) vs raw_link_gbps measured on this rig",
        "roofline": roof,
        "sniffer": e2e,
        "sniffer_hostile": hostile,
    }))


if __name__ == "__main__":
    main()
