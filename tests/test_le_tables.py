"""Parity tests for generated LE distance tables vs the reference's."""
import numpy as np

from gr_bluetooth_tpu.core import le_tables

from conftest import requires_reference


@requires_reference
def test_le_preamble_parity():
    import ref_tables
    assert np.array_equal(le_tables.LE_PREAMBLE_DISTANCE,
                          ref_tables.le_preamble_distance())


@requires_reference
def test_le_aa_parity():
    import ref_tables
    for k in range(4):
        assert np.array_equal(le_tables.AA_DISTANCE[k],
                              ref_tables.le_aa_distance(k)), f"byte {k}"


@requires_reference
def test_le_header_parity():
    import ref_tables
    al, am = ref_tables.le_access_header_distance()
    assert np.array_equal(le_tables.ACCESS_HEADER_DISTANCE[0], al)
    assert np.array_equal(le_tables.ACCESS_HEADER_DISTANCE[1], am)
    dl, dm = ref_tables.le_data_header_distance()
    assert np.array_equal(le_tables.DATA_HEADER_DISTANCE[0], dl)
    assert np.array_equal(le_tables.DATA_HEADER_DISTANCE[1], dm)


def test_chan_index_maps():
    assert le_tables.freq2chan(2402e6) == 0
    assert le_tables.freq2index(2402e6) == 37      # advertising channel
    assert le_tables.freq2index(2480e6) == 39
    assert le_tables.freq2index(2426e6) == 38
    assert le_tables.freq2chan(2403e6) == -1        # off the 2 MHz grid
    assert le_tables.freq2index(2404e6) == 0
