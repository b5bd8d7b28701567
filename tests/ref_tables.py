"""Parse constant tables out of the reference C++ source, for parity tests only.

The framework itself never reads these; tests compare our generated tables
against them to prove bit-exactness.
"""
import re
from functools import lru_cache

import numpy as np

PACKET_CC = "/root/reference/lib/packet_impl.cc"


@lru_cache(maxsize=None)
def _src():
    with open(PACKET_CC) as f:
        return f.read()


def parse_array(name: str) -> np.ndarray:
    m = re.search(re.escape(name) + r"\[\]\s*=\s*\{([^}]*)\}", _src())
    if m is None:
        raise KeyError(name)
    return np.array([int(x, 0) for x in re.findall(r"0x[0-9a-fA-F]+|\d+",
                                                   m.group(1))], dtype=np.int64)


def whitening_data() -> np.ndarray:
    return parse_array("packet::WHITENING_DATA")


def classic_indices() -> np.ndarray:
    return parse_array("classic_packet::INDICES")


def le_indices() -> np.ndarray:
    return parse_array("le_packet::INDICES")


def preamble_distance() -> np.ndarray:
    return parse_array("classic_packet::PREAMBLE_DISTANCE")


def barker_distance() -> np.ndarray:
    return parse_array("classic_packet::BARKER_DISTANCE")


def le_preamble_distance() -> np.ndarray:
    return parse_array("le_packet::PREAMBLE_DISTANCE")


def le_aa_distance(k: int) -> np.ndarray:
    return parse_array(f"le_packet::ACCESS_ADDRESS_DISTANCE_{k}")


def le_access_header_distance() -> tuple[np.ndarray, np.ndarray]:
    return (parse_array("le_packet::ACCESS_HEADER_DISTANCE_LSB"),
            parse_array("le_packet::ACCESS_HEADER_DISTANCE_MSB"))


def le_data_header_distance() -> tuple[np.ndarray, np.ndarray]:
    return (parse_array("le_packet::DATA_HEADER_DISTANCE_LSB"),
            parse_array("le_packet::DATA_HEADER_DISTANCE_MSB"))
