"""Pure-stdlib image codec: a REAL PNG encoder/decoder + multi-format
header probe, so the multimodal decode path runs an actual decode
kernel (bytes → pixels) with no third-party imaging library.

Scope (deliberate): 8-bit GRAYSCALE PNG, all five scanline filter
types (None/Sub/Up/Average/Paeth) on both encode and decode, zlib
DEFLATE via the stdlib, CRC-32 verified per chunk. That is the full
decode pipeline a PIL-backed kernel would run — chunk walk, inflate,
un-filter, pixel recovery — minus only the exotic color types, which a
100 TB media pipeline would hand to a native library anyway.

``probe_image`` additionally sniffs width/height from PNG, GIF87a/89a,
BMP, and JPEG (SOF scan) headers WITHOUT decompressing — the cheap
metadata pass a lakehouse runs before any full decode.

Serialization discipline: every public function here is a CLOSURE
produced by ``_make_codec()`` (qualname ``_make_codec.<locals>.*``),
so cloudpickle ships it to Python workers BY VALUE — a plain
module-level function would pickle by reference and crash workers
whose sys.path lacks the repo root (see operators/multimodal.py).
"""

from __future__ import annotations


def _make_codec():
    import struct
    import zlib

    PNG_SIG = b"\x89PNG\r\n\x1a\n"

    def _chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    def _paeth(a: int, b: int, c: int) -> int:
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    def encode_png_gray(
        width: int, height: int, pixels: bytes, filter_for_row=None
    ) -> bytes:
        """Real 8-bit grayscale PNG. ``filter_for_row(row) -> 0..4``
        selects the scanline filter (default 0/None); filtered bytes are
        computed with the true PNG filter algorithms so decoders must
        genuinely un-filter."""
        if len(pixels) != width * height:
            raise ValueError(f"need {width * height} pixels, got {len(pixels)}")
        raw = bytearray()
        prev = bytes(width)
        for y in range(height):
            line = pixels[y * width : (y + 1) * width]
            ft = 0 if filter_for_row is None else int(filter_for_row(y)) % 5
            raw.append(ft)
            if ft == 0:
                raw += line
            elif ft == 1:  # Sub
                raw += bytes(
                    (line[x] - (line[x - 1] if x else 0)) & 0xFF
                    for x in range(width)
                )
            elif ft == 2:  # Up
                raw += bytes((line[x] - prev[x]) & 0xFF for x in range(width))
            elif ft == 3:  # Average
                raw += bytes(
                    (line[x] - (((line[x - 1] if x else 0) + prev[x]) >> 1)) & 0xFF
                    for x in range(width)
                )
            else:  # Paeth
                raw += bytes(
                    (
                        line[x]
                        - _paeth(
                            line[x - 1] if x else 0,
                            prev[x],
                            prev[x - 1] if x else 0,
                        )
                    )
                    & 0xFF
                    for x in range(width)
                )
            prev = line
        ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
        return (
            PNG_SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _chunk(b"IEND", b"")
        )

    def decode_png(data: bytes):
        """Full PNG decode: chunk walk (CRC-verified), IDAT inflate,
        scanline un-filter (all five types). Returns
        ``(width, height, pixels: bytes)`` for 8-bit grayscale."""
        if data[:8] != PNG_SIG:
            raise ValueError("not a PNG")
        pos, width = 8, None
        height = bit_depth = color_type = None
        idat = bytearray()
        while pos < len(data):
            (ln,) = struct.unpack(">I", data[pos : pos + 4])
            tag = data[pos + 4 : pos + 8]
            body = data[pos + 8 : pos + 8 + ln]
            (crc,) = struct.unpack(">I", data[pos + 8 + ln : pos + 12 + ln])
            if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
                raise ValueError(f"CRC mismatch in {tag!r}")
            if tag == b"IHDR":
                width, height, bit_depth, color_type = struct.unpack(
                    ">IIBB", body[:10]
                )
            elif tag == b"IDAT":
                idat += body
            elif tag == b"IEND":
                break
            pos += 12 + ln
        if width is None:
            raise ValueError("missing IHDR")
        if (bit_depth, color_type) != (8, 0):
            raise ValueError(
                f"unsupported PNG variant bd={bit_depth} ct={color_type}"
            )
        raw = zlib.decompress(bytes(idat))
        if len(raw) != height * (width + 1):
            raise ValueError("bad scanline payload size")
        out = bytearray()
        prev = bytes(width)
        for y in range(height):
            ft = raw[y * (width + 1)]
            line = bytearray(raw[y * (width + 1) + 1 : (y + 1) * (width + 1)])
            if ft == 1:
                for x in range(1, width):
                    line[x] = (line[x] + line[x - 1]) & 0xFF
            elif ft == 2:
                for x in range(width):
                    line[x] = (line[x] + prev[x]) & 0xFF
            elif ft == 3:
                for x in range(width):
                    left = line[x - 1] if x else 0
                    line[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
            elif ft == 4:
                for x in range(width):
                    left = line[x - 1] if x else 0
                    ul = prev[x - 1] if x else 0
                    line[x] = (line[x] + _paeth(left, prev[x], ul)) & 0xFF
            elif ft != 0:
                raise ValueError(f"bad filter type {ft}")
            out += line
            prev = bytes(line)
        return width, height, bytes(out)

    def probe_image(data: bytes):
        """Header-only (format, width, height) sniff for PNG / GIF /
        BMP / JPEG; returns (None, -1, -1) when unrecognized. Never
        decompresses pixel data — the cheap metadata scan."""
        if len(data) >= 24 and data[:8] == PNG_SIG:
            w, h = struct.unpack(">II", data[16:24])
            return "png", w, h
        if len(data) >= 10 and data[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", data[6:10])
            return "gif", w, h
        if len(data) >= 26 and data[:2] == b"BM":
            w, h = struct.unpack("<ii", data[18:26])
            return "bmp", w, abs(h)
        if len(data) >= 4 and data[:2] == b"\xff\xd8":
            pos = 2
            while pos + 9 < len(data):
                if data[pos] != 0xFF:
                    pos += 1
                    continue
                marker = data[pos + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    pos += 2
                    continue
                (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = struct.unpack(">HH", data[pos + 5 : pos + 9])
                    return "jpeg", w, h
                pos += 2 + seglen
        return None, -1, -1

    return encode_png_gray, decode_png, probe_image


encode_png_gray, decode_png, probe_image = _make_codec()
