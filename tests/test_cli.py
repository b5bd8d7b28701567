"""btrx CLI end-to-end: the README.first scenarios driven through the
command-line surface (subprocess, stdin/file/synthetic sources)."""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)


def run_btrx(args, stdin=None, timeout=300):
    return subprocess.run(
        [sys.executable, "-m", "gr_bluetooth_tpu.apps.btrx"] + args,
        input=stdin, capture_output=True, timeout=timeout, env=ENV,
        cwd=REPO)


@pytest.fixture(scope="module")
def capture_file(tmp_path_factory):
    from gr_bluetooth_tpu.testing import PiconetSim, make_piconet_capture
    sim = PiconetSim(lap=0x24D952, uap=0x47, clk0=0x12780)
    x, _ = make_piconet_capture(sim, n_slots=256, fs=8e6,
                                center_freq=2441e6, seed=7)
    p = tmp_path_factory.mktemp("caps") / "cap.cfile"
    x.astype(np.complex64).tofile(p)
    return str(p)


def test_cli_requires_rate():
    r = run_btrx(["-r", "1e6"])
    assert r.returncode == 1
    assert b"below minimum" in r.stderr


def test_cli_lap_survey_synthetic():
    r = run_btrx(["-r", "8e6", "-f", "2441e6", "--synthetic", "128"])
    assert r.returncode == 0, r.stderr.decode()[-500:]
    assert b"LAP 24d952" in r.stdout


def test_cli_uap_from_file(capture_file):
    r = run_btrx(["-r", "8e6", "-f", "2441e6", "-i", capture_file,
                  "-l", "24d952"])
    assert r.returncode == 0, r.stderr.decode()[-500:]
    assert b"UAP = 0x47" in r.stdout


def test_cli_hopper_stdin_pcap(capture_file, tmp_path):
    pcap = str(tmp_path / "out.pcap")
    with open(capture_file, "rb") as f:
        data = f.read()
    r = run_btrx(["-r", "8e6", "-f", "2441e6", "-i", "-", "-l", "24d952",
                  "-p", "-W", pcap], stdin=data)
    assert r.returncode == 0, r.stderr.decode()[-500:]
    assert b"wrote" in r.stderr
    assert os.path.getsize(pcap) > 24
    with open(pcap, "rb") as f:
        magic = f.read(4)
    assert magic == b"\xd4\xc3\xb2\xa1"


def test_cli_checkpoint_resume_stats(capture_file, tmp_path):
    ck = str(tmp_path / "state.npz")
    r = run_btrx(["-r", "8e6", "-f", "2441e6", "-i", capture_file, "-S",
                  "--no-le", "--checkpoint", ck, "--stats"])
    assert r.returncode == 0, r.stderr.decode()[-500:]
    assert os.path.exists(ck)
    assert b"checkpointed to" in r.stderr
    assert b"stage device_step" in r.stderr     # --stats report
    # resume from the checkpoint: piconet state (UAP) is already known, so
    # a fresh run over the same capture decodes immediately
    r2 = run_btrx(["-r", "8e6", "-f", "2441e6", "-i", capture_file, "-S",
                   "--no-le", "--resume", ck])
    assert r2.returncode == 0, r2.stderr.decode()[-500:]
    assert b"resumed from" in r2.stderr


def test_stdin_u8_byte_path():
    """SDR-in-the-loop smoke (doc/sdr_pipeline.md): a synthetic capture
    converted to rtl_sdr's unsigned offset-byte stream, piped through the
    SAME byte path a real `rtl_sdr ... - | btrx -i - --u8` pipeline uses,
    surveys the planted LAP."""
    from gr_bluetooth_tpu.testing import PiconetSim, make_piconet_capture
    sim = PiconetSim(lap=0x24D952, uap=0x47, clk0=0x12780)
    x, _ = make_piconet_capture(sim, n_slots=96, fs=4e6,
                                center_freq=2441e6, seed=21,
                                noise_std=0.02)
    inter = np.stack([x.real, x.imag], axis=1).reshape(-1)
    u8 = np.clip(np.round(inter * 127.5 + 127.5), 0, 255).astype(np.uint8)
    r = run_btrx(["-r", "4e6", "-f", "2441e6", "-i", "-", "--u8"],
                 stdin=u8.tobytes())
    assert r.returncode == 0, r.stderr.decode()[-500:]
    assert b"24d952" in r.stdout + r.stderr, \
        (r.stdout + r.stderr).decode()[-800:]


def test_stdin_i4_byte_path():
    """int4-packed stdin through btrx -4: the full-band wire format's
    byte path (one byte per complex sample) surveys the planted LAP."""
    from gr_bluetooth_tpu.io.ingest import wire_encode
    from gr_bluetooth_tpu.testing import PiconetSim, make_piconet_capture
    sim = PiconetSim(lap=0x24D952, uap=0x47, clk0=0x12780)
    x, _ = make_piconet_capture(sim, n_slots=96, fs=4e6,
                                center_freq=2441e6, seed=22,
                                noise_std=0.02)
    packed = wire_encode(np.stack([x.real, x.imag]).astype(np.float32),
                         "i4")
    r = run_btrx(["-r", "4e6", "-f", "2441e6", "-i", "-", "-4"],
                 stdin=packed.tobytes())
    assert r.returncode == 0, r.stderr.decode()[-500:]
    assert b"24d952" in r.stdout + r.stderr, \
        (r.stdout + r.stderr).decode()[-800:]
