"""Production ingest: pipelined host->device streaming.

The reference's whole job is to eat a continuous SDR stream
(/root/reference/apps/btrx:121-138 — stdin/file/osmosdr, with `-s`
selecting the int16 wire format USRPs actually ship).  The TPU-native
ingest contract has three parts, all implemented here and used by the
product streaming paths (FrontEnd.stream_pipelined, btrx stdin/live):

  * **wire format on the wire**: the host ships each block's NEW samples
    exactly as they arrive from the SDR — interleaved (N, 2) int16
    (or int8 / float32) — no host-side float conversion, deinterleave,
    or scaling; the device does all of that inside the jitted step.
    int16 halves, int8 quarters, the H2D bandwidth vs float32 planes.
  * **device-side overlap-save carry**: the device keeps the previous
    block's tail (lookahead + filter history), so no sample crosses the
    link twice.
  * **double buffering**: block i+1's `device_put` is dispatched before
    block i's outputs are fetched, overlapping DMA with compute — the
    steady state has one transfer and one compute in flight.

Clock correctness under overruns: a live radio cannot backpressure the
air, so when the drop-oldest ring sheds samples the CLOCK must advance
with air time, not with bytes consumed — CLK1-6 interval discovery and
CLK1-27 winnowing consume slot *differences* (lib/piconet_impl.cc:445-453)
and silently break otherwise.  `live_chunks` converts dropped samples to
whole slots (nearest, with a bounded sub-slot residual carried forward)
and the driver bumps `slot_base` and resets the stale device carry at the
gap.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = ["PipelinedIngest", "live_chunks", "WIRES", "wire_chunks"]

# wire formats: dtype on the link, scale applied on device.
# "i4" packs one complex sample per BYTE (I nibble low, Q nibble high,
# two's-complement 4-bit) — 80 Msps full band at ~0.08 GB/s, the
# operating point that fits this rig's measured host link (BENCH r3-r5
# raw_link_gbps ~0.08); unpack/sign-extend happens on device.  NOTE:
# 4-bit quantization of a strong in-band carrier throws cross-channel
# intermodulation images at ~20 dB apparent SNR — run the squelch at
# ~25 dB with this format (bench e2e_operating_points does; a 10 dB
# squelch lets images through, where their failed decodes trigger the
# sniffer's clock-loss resets).
WIRES = {
    "f32": (np.float32, 1.0),
    "i16": (np.int16, 1.0 / 32768.0),
    "i8": (np.int8, 1.0 / 128.0),
    "i4": (np.uint8, 1.0 / 8.0),
    # rtl_sdr's unsigned offset bytes (x = (b - 127.5) / 127.5): the
    # byte stream `rtl_sdr -f ... -` ships, fed straight to the device
    "u8": (np.uint8, 1.0 / 127.5),
}


def wire_encode(x, wire: str) -> np.ndarray:
    """(2, N) float32 planes -> the on-the-wire array, quantized exactly
    as the device-side decode will see it.  The SINGLE host-side
    authority for each format's packing (btrx replay, wire_chunks, and
    the bench all use it — a drifted copy would silently break
    carry-vs-device block parity)."""
    inter = np.ascontiguousarray(np.asarray(x, np.float32).T)  # (N, 2)
    if wire == "f32":
        return inter
    if wire == "i4":
        q = np.clip(np.round(inter * 8.0), -8, 7).astype(np.int8)
        return ((q[:, 0] & 0xF) | ((q[:, 1] & 0xF) << 4)).astype(np.uint8)
    if wire == "u8":
        return np.clip(np.round(inter * 127.5 + 127.5), 0,
                       255).astype(np.uint8)
    dtype, scale = WIRES[wire]
    lim = {"i16": 32767.0, "i8": 127.0}[wire]
    return np.clip(inter / scale, -lim - 1, lim).astype(dtype)


def wire_decode_np(inter: np.ndarray, wire: str) -> np.ndarray:
    """Wire array -> (2, N) float32 planes; the numpy mirror of
    wire_decode_jnp (used for carries and file replays)."""
    _, scale = WIRES[wire]
    if wire == "i4":
        b = np.asarray(inter).astype(np.int32)
        i4 = (b & 0xF).astype(np.float32)
        q4 = ((b >> 4) & 0xF).astype(np.float32)
        i4 -= 16.0 * (i4 >= 8)
        q4 -= 16.0 * (q4 >= 8)
        return np.ascontiguousarray(np.stack([i4, q4]) * scale)
    x = np.asarray(inter).astype(np.float32).T
    if wire == "u8":
        x = x - 127.5
    return np.ascontiguousarray(x * scale if scale != 1.0 else x)


def wire_decode_jnp(new, wire: str, scale: float):
    """Device-side wire -> (2, N) float32 planes (traced; the jnp twin
    of wire_decode_np — keep the two bit-identical)."""
    import jax.numpy as jnp
    if wire == "i4":
        b = new.astype(jnp.int32)                  # (N,) packed bytes
        i4 = (b & 0xF).astype(jnp.float32)
        q4 = ((b >> 4) & 0xF).astype(jnp.float32)
        i4 = i4 - 16.0 * (i4 >= 8)
        q4 = q4 - 16.0 * (q4 >= 8)
        return jnp.stack([i4, q4]) * scale
    x = new.astype(jnp.float32).T
    if wire == "u8":
        x = x - 127.5
    return x * scale if scale != 1.0 else x


@dataclass
class _Slip:
    """A clock discontinuity: the source dropped `slots` slots of air."""
    slots: int
    samples: int


class PipelinedIngest:
    """Streaming driver over a FrontEnd: wire chunks in, BlockResults out.

    Chunks are interleaved (step_samples, 2) arrays of the wire dtype
    (IQ pairs, exactly the SDR byte stream reshaped).  The jitted step
    converts/scales/transposes on device and carries the overlap tail,
    so per block the host link moves step_samples * itemsize * 2 bytes.
    """

    def __init__(self, fe, wire: str = "f32"):
        from functools import partial

        from ..models.frontend import _pipelined_step

        if wire not in WIRES:
            raise ValueError(f"unknown wire format {wire!r}")
        self.fe = fe
        self.wire = wire
        dtype, scale = WIRES[wire]
        self.dtype = dtype
        # signature mirrors _device_step's, so the compiled program is
        # shared across FrontEnd instances with identical configurations
        self._step = partial(_pipelined_step, **fe._step_kwargs,
                             wire_scale=float(scale), wire_fmt=wire,
                             overlap=fe.overlap_samples)
        self._zeros = np.zeros((2, fe.overlap_samples), np.float32)
        self.chunk_shape = (fe.step_samples,) if wire == "i4" else \
            (fe.step_samples, 2)
        # one-fetch output packing: a block's outputs (snr, counts, hit
        # table, windows, LE twins) fetched separately cost one link
        # round trip EACH — on a high-latency (remote/tunneled) device
        # that bound the whole e2e loop (round-5 measurements: 30-45 ms
        # RTT vs 40 ms of air per block).  The device concatenates them
        # into a single int32 vector; the host splits one buffer.
        self._out_specs = None          # [(shape, dtype) | None], lazy

        import jax
        import jax.numpy as jnp

        @jax.jit
        def _pack(outs):
            parts = []
            for o in outs:
                if o is None:
                    continue
                oi = jax.lax.bitcast_convert_type(o, jnp.int32) \
                    if o.dtype == jnp.float32 else o.astype(jnp.int32)
                parts.append(oi.reshape(-1))
            return jnp.concatenate(parts)

        self._pack = _pack

    def run(self, chunks, start_clkn: int = 0, initial_carry=None,
            bus=None):
        """Iterate BlockResults over a chunk stream.

        `chunks` yields (step_samples, 2) wire arrays, or _Slip markers
        (from live_chunks) signalling dropped air time.  Double-buffered:
        the next chunk's H2D transfer is dispatched before the previous
        block's outputs are fetched.
        """
        import jax

        from ..utils.metrics import metrics

        fe = self.fe
        carry = jax.device_put(
            initial_carry if initial_carry is not None else self._zeros)
        slot_base = start_clkn
        pending: list = []                    # [(outs, slot_base), ...]
        DEPTH = 4   # blocks in flight past the one being assembled: on a
        # high-latency (tunneled/remote) device link the per-block
        # transfer round trips (~30 ms RTT measured) need several blocks
        # of lag to fully hide; the cost is DEPTH blocks of result
        # latency, irrelevant for a sniffer
        for item in chunks:
            if isinstance(item, _Slip):
                # gap in the stream: air time advanced without samples.
                # Advance the clock and drop the stale carry (packets
                # straddling the gap are unrecoverable anyway).
                slot_base += item.slots
                carry = jax.device_put(self._zeros)
                metrics.count("clock_slipped_slots", item.slots)
                if bus is not None:
                    bus.emit("clock_slipped", slots=item.slots,
                             samples=item.samples, clkn=slot_base)
                continue
            d = jax.device_put(np.ascontiguousarray(item))  # async H2D
            if len(pending) > DEPTH:
                yield self._assemble(pending.pop(0))
            with metrics.stage("device_step"):
                carry, outs = self._step(carry, d)          # async compute
            if self._out_specs is None:
                self._out_specs = [
                    None if o is None else (o.shape, o.dtype.name)
                    for o in outs]
            packed = self._pack(tuple(outs))
            # start the single D2H copy NOW: by assemble time the buffer
            # is host-resident, so the fetch never blocks on a device
            # round trip
            packed.copy_to_host_async()
            pending.append((packed, slot_base))
            slot_base += fe.block_slots
            metrics.count("blocks", 1)
            metrics.count("samples_in", fe.step_samples)
        while pending:
            yield self._assemble(pending.pop(0))

    def _assemble(self, pending):
        from ..utils.metrics import metrics
        with metrics.stage("assemble"):
            buf = np.asarray(pending[0])       # ONE transfer per block
            outs, pos = [], 0
            for spec in self._out_specs:
                if spec is None:
                    outs.append(None)
                    continue
                shape, dtype = spec
                n = int(np.prod(shape)) if shape else 1
                a = buf[pos: pos + n]
                if dtype == "float32":
                    a = a.view(np.float32)
                a = a.reshape(shape) if shape else a[0]
                outs.append(a)
                pos += n
            res = self.fe.assemble_block(*outs, slot_base=pending[1])
        metrics.count("classic_hits", len(res.hits))
        metrics.count("le_hits", len(res.le_hits))
        return res


def wire_chunks(samples, fe, wire: str = "f32", pad_tail: bool = False):
    """Split a host capture into (initial_carry, chunk iterator) matching
    the historical block placement: the capture's first overlap_samples
    seed the carry and each chunk is the next step_samples, so
    PipelinedIngest.run(...) yields the SAME blocks as fe.stream_sync.
    With pad_tail, a final zero-padded chunk covers the partial remainder
    (stream_sync's padded tail block)."""
    samples = np.asarray(samples)
    if np.iscomplexobj(samples):
        samples = np.stack([samples.real, samples.imag]).astype(np.float32)
    inter = wire_encode(samples, wire)
    ov, st = fe.overlap_samples, fe.step_samples
    n = inter.shape[0]
    if pad_tail:
        n_chunks = max(1, -(-(n - ov) // st)) if n > 0 else 0
    else:
        n_chunks = max(0, (n - ov) // st)
    total = ov + n_chunks * st
    if total > n:
        from .sources import WIRE_ZERO_BYTE
        pad_shape = (total - n,) if wire == "i4" else (total - n, 2)
        # zero-LEVEL padding: for u8's offset format a 0x00 byte is
        # full-scale -1-1j, which would rail the tail block's energy
        fill = WIRE_ZERO_BYTE[wire] if wire == "u8" else 0
        inter = np.concatenate(
            [inter, np.full(pad_shape, fill, inter.dtype)], axis=0)
    # carry holds the QUANTIZED values (what the device would have
    # seen), so block placement and content match the wire pipeline
    carry = wire_decode_np(inter[:ov], wire)

    def chunks():
        for i in range(n_chunks):
            yield inter[ov + i * st: ov + (i + 1) * st]

    return carry, chunks()


def live_chunks(source, samples_per_slot: int):
    """Wrap a raw live source (LiveSource.iter_raw) into the chunk+slip
    stream PipelinedIngest.run consumes.

    Dropped samples are converted to whole slots (nearest; the sub-slot
    residual is carried so long-run clock drift is bounded by half a
    slot), keeping clkn locked to air time across overruns."""
    residual = 0

    def slip():
        nonlocal residual
        d = source.take_dropped_samples()
        if not d:
            return None
        residual += d
        slots = int(round(residual / samples_per_slot))
        residual -= slots * samples_per_slot
        return _Slip(slots=slots, samples=d) if slots else None

    for chunk in source.iter_raw():
        s = slip()
        if s is not None:
            yield s
        yield chunk
    s = slip()
    if s is not None:
        yield s
