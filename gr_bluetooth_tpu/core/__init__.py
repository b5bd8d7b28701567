from . import whitening, access_code, fec, crc, hop  # noqa: F401
