"""Block registry (the functional GRC-descriptor equivalent, grc/*.xml)."""
import pytest

from gr_bluetooth_tpu import blocks


def test_registry_covers_reference_blocks():
    """Every reference GRC descriptor has a registry analog."""
    analogs = {d.grc_analog for d in blocks.BLOCKS.values()}
    for xml in ["grc/gr_bluetooth_multi_LAP.xml",
                "grc/gr_bluetooth_multi_UAP.xml",
                "grc/gr_bluetooth_multi_hopper.xml",
                "grc/gr_bluetooth_multi_sniffer.xml"]:
        assert xml in analogs, xml


def test_describe_shape():
    d = blocks.describe("multi_sniffer")
    assert d["category"] == "mode"
    names = {p["name"] for p in d["params"]}
    assert {"sample_rate", "center_freq", "squelch", "enable_le"} <= names


def test_build_flowgraph_end_to_end(tmp_path):
    fg = blocks.build_flowgraph({
        "source": {"block": "synthetic_source", "n_slots": 96,
                   "lap": 0x24D952, "uap": 0x47, "clk0": 0x12780,
                   "sample_rate": 8e6, "center_freq": 2.441e9},
        "mode": {"block": "multi_lap", "sample_rate": 8e6,
                 "center_freq": 2.441e9},
    })
    obs = fg.run()
    assert {o.lap for o in obs} == {0x24D952}


def test_build_flowgraph_writer_wiring(tmp_path):
    path = str(tmp_path / "o.pcap")
    fg = blocks.build_flowgraph({
        "source": {"block": "synthetic_source", "n_slots": 64,
                   "sample_rate": 8e6, "center_freq": 2.441e9},
        "mode": {"block": "multi_sniffer", "sample_rate": 8e6,
                 "center_freq": 2.441e9, "enable_le": False},
        "writer": {"block": "pcap_writer", "path": path},
    })
    assert fg.mode.writer is fg.writer
    fg.run()
    import os
    assert os.path.getsize(path) >= 24   # header written + closed cleanly


def test_unknown_block_raises():
    with pytest.raises(KeyError):
        blocks.build({"block": "nope"})
