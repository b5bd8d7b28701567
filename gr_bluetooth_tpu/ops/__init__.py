from . import filters, synth, channelizer, demod, snr, detect  # noqa: F401
