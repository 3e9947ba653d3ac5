"""Minimal pure-python image codec: uncompressed 24-bit BMP and binary
PPM (P6) -> RGB8.  Vendored so the REAL ``decode_images`` path (not just
the deterministic fake) is exercisable in environments without PIL; when
PIL is importable it takes precedence and this module is never consulted.

Both formats are trivially simple and fully specified:
- BMP: BITMAPFILEHEADER (14 bytes, 'BM' magic, pixel-array offset at 10)
  + BITMAPINFOHEADER (width i32@18, height i32@22, bpp u16@28,
  compression u32@30 == BI_RGB); 24-bit rows are BGR, padded to 4 bytes,
  stored bottom-up for positive height.
- PPM P6: ASCII header "P6 <w> <h> <maxval>" with '#' comments, one
  whitespace byte, then w*h raw RGB triples.
"""

from __future__ import annotations

import struct


def decode_image_bytes(raw: bytes) -> tuple[int, int, int, bytes]:
    """Decode BMP or P6 payload bytes -> (width, height, channels,
    row-major RGB8 pixel bytes).  Raises ValueError on anything else."""
    if raw[:2] == b"BM":
        return _decode_bmp(raw)
    if raw[:2] == b"P6":
        return _decode_ppm(raw)
    raise ValueError("unsupported image format (pure-python codec handles "
                     "uncompressed 24-bit BMP and binary PPM P6)")


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Inverse for tests: RGB8 row-major -> bottom-up 24-bit BMP."""
    pad = (-3 * width) % 4
    rows = []
    for y in range(height - 1, -1, -1):
        row = bytearray()
        for x in range(width):
            r, g, b = rgb[3 * (y * width + x):3 * (y * width + x) + 3]
            row += bytes((b, g, r))
        rows.append(bytes(row) + b"\x00" * pad)
    pixels = b"".join(rows)
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(pixels), 2835, 2835, 0, 0)
    return header + dib + pixels


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Inverse for tests: RGB8 row-major -> binary PPM."""
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def _decode_bmp(raw: bytes) -> tuple[int, int, int, bytes]:
    if len(raw) < 54:
        raise ValueError("truncated BMP header")
    offset = struct.unpack_from("<I", raw, 10)[0]
    width, height = struct.unpack_from("<ii", raw, 18)
    bpp = struct.unpack_from("<H", raw, 28)[0]
    compression = struct.unpack_from("<I", raw, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    bottom_up = height > 0
    height = abs(height)
    stride = (3 * width + 3) & ~3
    if len(raw) < offset + stride * height:
        raise ValueError("truncated BMP pixel array")
    out = bytearray(3 * width * height)
    for y in range(height):
        src_y = (height - 1 - y) if bottom_up else y
        row = raw[offset + src_y * stride: offset + src_y * stride + 3 * width]
        for x in range(width):
            b, g, r = row[3 * x:3 * x + 3]
            i = 3 * (y * width + x)
            out[i:i + 3] = bytes((r, g, b))
    return width, height, 3, bytes(out)


def _decode_ppm(raw: bytes) -> tuple[int, int, int, bytes]:
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(raw) and raw[pos:pos + 1].isspace():
            pos += 1
        if raw[pos:pos + 1] == b"#":
            while pos < len(raw) and raw[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(raw) and not raw[pos:pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        fields.append(int(raw[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    need = 3 * width * height
    if len(raw) < pos + need:
        raise ValueError("truncated PPM pixel data")
    return width, height, 3, raw[pos:pos + need]
