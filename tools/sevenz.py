"""Minimal 7z extractor for the reference's test fixtures.

The reference ships its ECG test data as single-file LZMA2 .7z archives
(lib_rspt_test/*.7z). The image has no 7z tool, but Python's stdlib
lzma decodes raw LZMA1/LZMA2 streams — this module parses just enough
of the 7z container (signature header → unencoded next-header →
pack/unpack info for one folder with one coder) to hand the packed
stream to LZMADecompressor.

Not a general 7z implementation: single folder, single coder, LZMA2
(0x21) or LZMA (0x030101), no encryption, unencoded metadata header —
which is exactly what these fixtures use.
"""

from __future__ import annotations

import lzma
import struct
from typing import Tuple


def _read_number(b: bytes, pos: int) -> Tuple[int, int]:
    """7z variable-length number (ReadNumber in the 7z spec)."""
    first = b[pos]
    pos += 1
    mask = 0x80
    value = 0
    for i in range(8):
        if not (first & mask):
            value |= (first & (mask - 1)) << (8 * i)
            return value, pos
        value |= b[pos] << (8 * i)
        pos += 1
        mask >>= 1
    return value, pos


def extract_single(path: str) -> bytes:
    """Extract the (single) file payload from a simple .7z archive."""
    data = open(path, "rb").read()
    if data[:6] != b"7z\xbc\xaf\x27\x1c":
        raise ValueError("not a 7z archive")
    nh_off, nh_size = struct.unpack("<QQ", data[12:28])
    hdr = data[32 + nh_off:32 + nh_off + nh_size]
    pos = 0
    if hdr[pos] != 0x01:  # kHeader (unencoded)
        raise ValueError("encoded 7z headers not supported")
    pos += 1
    if hdr[pos] != 0x04:  # kMainStreamsInfo
        raise ValueError("unexpected 7z header layout")
    pos += 1
    if hdr[pos] != 0x06:  # kPackInfo
        raise ValueError("missing PackInfo")
    pos += 1
    pack_pos, pos = _read_number(hdr, pos)
    num_pack, pos = _read_number(hdr, pos)
    if num_pack != 1:
        raise ValueError("only single-stream archives supported")
    if hdr[pos] != 0x09:  # kSize
        raise ValueError("missing pack sizes")
    pos += 1
    pack_size, pos = _read_number(hdr, pos)
    if hdr[pos] != 0x00:  # kEnd of PackInfo
        raise ValueError("unexpected PackInfo tail")
    pos += 1
    if hdr[pos] != 0x07:  # kUnPackInfo
        raise ValueError("missing UnPackInfo")
    pos += 1
    if hdr[pos] != 0x0B:  # kFolder
        raise ValueError("missing Folder")
    pos += 1
    num_folders, pos = _read_number(hdr, pos)
    if num_folders != 1 or hdr[pos] != 0x00:  # external flag
        raise ValueError("only one inline folder supported")
    pos += 1
    num_coders, pos = _read_number(hdr, pos)
    if num_coders != 1:
        raise ValueError("only one coder supported")
    flags = hdr[pos]
    pos += 1
    id_size = flags & 0x0F
    coder_id = hdr[pos:pos + id_size]
    pos += id_size
    props = b""
    if flags & 0x20:
        props_size, pos = _read_number(hdr, pos)
        props = hdr[pos:pos + props_size]
        pos += props_size
    if hdr[pos] != 0x0C:  # kCodersUnpackSize
        raise ValueError("missing unpack sizes")
    pos += 1
    unpack_size, pos = _read_number(hdr, pos)

    packed = data[32 + pack_pos:32 + pack_pos + pack_size]
    if coder_id == b"\x21":  # LZMA2
        dict_size_prop = props[0]
        if dict_size_prop > 40:
            raise ValueError("bad lzma2 dict prop")
        if dict_size_prop == 40:
            dict_size = 0xFFFFFFFF
        else:
            dict_size = (2 | (dict_size_prop & 1)) << (dict_size_prop // 2 + 11)
        filt = [{"id": lzma.FILTER_LZMA2, "dict_size": dict_size}]
    elif coder_id == b"\x03\x01\x01":  # LZMA1
        filt = [lzma._decode_filter_properties(lzma.FILTER_LZMA1, props)]
    else:
        raise ValueError(f"unsupported coder {coder_id.hex()}")
    dec = lzma.LZMADecompressor(format=lzma.FORMAT_RAW, filters=filt)
    out = dec.decompress(packed, max_length=unpack_size)
    if len(out) != unpack_size:
        raise ValueError("short decompression")
    return out


if __name__ == "__main__":
    import sys
    payload = extract_single(sys.argv[1])
    sys.stdout.buffer.write(payload)
