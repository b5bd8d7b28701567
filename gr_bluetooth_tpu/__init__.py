"""gr_bluetooth_tpu — a TPU-native Bluetooth baseband sniffing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
greatscottgadgets/gr-bluetooth (GNU Radio 3.7 OOT module, archived):
wideband IQ in, per-channel GFSK symbols out, classic BR packet
detection/decoding, LE advertising detection, piconet UAP/clock recovery
and hop following — built data-flow-first for TPU hardware instead of
control-flow-per-slot-per-channel.

Layer map (mirrors reference SURVEY §1, re-architected):

  models/    the four operating modes (lap_survey, uap_discovery,
             sniffer, hopper) + piconet state engine
  ops/       device compute: channelizer (MXU conv), GFSK demod +
             feedforward timing recovery, dense access-code detection
             (parity matmul), GFSK synthesizer, hop/winnow kernels
  core/      spec-level codecs, host-testable numpy: whitening LFSR,
             (64,30) sync-word code, FEC 1/3 & 2/3, CRC/HEC, hop kernel,
             classic + LE packet codecs
  parallel/  mesh construction + shard_map pipeline (time shards with
             overlap-save halos, channel-group sharding)
  runtime/   native C++ IO runtime (pcap/TAP framing) + ctypes bindings
  apps/      btrx-equivalent CLI
"""

__version__ = "0.1.0"

from . import constants  # noqa: F401
