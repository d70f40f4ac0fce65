"""Real stdlib media codecs for the multimodal operators.

Pure-stdlib (``zlib`` + ``struct``) encoders/decoders for three
container formats, so the multimodal decode stage performs a *genuine*
decode -- chunk walking, zlib inflate, PNG filter reversal, RIFF chunk
parsing -- rather than a length-derived fake:

- **PNG**: 8-bit grayscale (color type 0) and 8-bit RGB (color type 2);
  the encoder cycles through ALL FIVE scanline filters (None/Sub/Up/
  Average/Paeth) so a decoder that skips filter reversal produces wrong
  pixels; per-chunk CRC32 is written and verified.
- **BMP**: BITMAPINFOHEADER, bottom-up, 8-bit palettized grayscale and
  24-bit BGR, with 4-byte row padding.
- **WAV**: RIFF/WAVE with proper chunk walking (fmt + data, tolerating
  extra chunks), 8-bit unsigned PCM mono.
- **GIF**: animated GIF89a, 256-gray global palette, real LZW with
  variable-width codes and table resets.
- **AVI**: uncompressed RIFF 'AVI ' (hdrl/strl headers, movi LIST of
  8-bit palettized DIB frames, idx1 index) -- the second video-class
  container, so video rows exercise two genuinely different walks.

Compressed video codecs (H.264/VP9/AV1) need ffmpeg and remain the one
honest ``NotImplementedError`` in ``multimodal.py``.

No analog in the reference (it processes PDFs only); this implements the
multimodal north star of SURVEY.md with zero new dependencies.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"


class MediaFormatError(ValueError):
    """Raised when a payload is not a valid instance of its format."""


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixels: bytes, channels: int = 1) -> bytes:
    """Encode raw pixels (row-major, ``channels`` bytes/px) as a PNG.

    Scanline filters cycle 0..4 by row index, so decoding requires real
    filter reversal for every filter type, not just a zlib inflate.
    """
    if len(pixels) != width * height * channels:
        raise MediaFormatError("pixel buffer does not match dimensions")
    color_type = 0 if channels == 1 else 2
    bpp = channels
    stride = width * channels
    raw = bytearray()
    prior = bytes(stride)
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        ftype = y % 5
        raw.append(ftype)
        for x in range(stride):
            cur = row[x]
            left = row[x - bpp] if x >= bpp else 0
            up = prior[x]
            ul = prior[x - bpp] if x >= bpp else 0
            if ftype == 0:
                out = cur
            elif ftype == 1:
                out = cur - left
            elif ftype == 2:
                out = cur - up
            elif ftype == 3:
                out = cur - (left + up) // 2
            else:
                out = cur - _paeth(left, up, ul)
            raw.append(out & 0xFF)
        prior = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG -> (width, height, channels, raw pixel bytes).

    Walks chunks, verifies CRCs, inflates concatenated IDAT, and
    reverses all five scanline filter types. Supports 8-bit grayscale
    and 8-bit RGB (the formats :func:`encode_png` writes).
    """
    if data[:8] != PNG_SIG:
        raise MediaFormatError("not a PNG (bad signature)")
    pos = 8
    width = height = channels = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise MediaFormatError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if bit_depth != 8 or color_type not in (0, 2):
                raise MediaFormatError(
                    f"unsupported PNG: bit_depth={bit_depth} color_type={color_type}"
                )
            if comp != 0 or filt != 0 or interlace != 0:
                raise MediaFormatError("unsupported PNG compression/filter/interlace")
            channels = 1 if color_type == 0 else 3
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise MediaFormatError("missing IHDR or IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise MediaFormatError("decompressed size does not match dimensions")
    bpp = channels
    out = bytearray()
    prior = bytes(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        row = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        for x in range(stride):
            left = row[x - bpp] if x >= bpp else 0
            up = prior[x]
            ul = prior[x - bpp] if x >= bpp else 0
            if ftype == 0:
                add = 0
            elif ftype == 1:
                add = left
            elif ftype == 2:
                add = up
            elif ftype == 3:
                add = (left + up) // 2
            elif ftype == 4:
                add = _paeth(left, up, ul)
            else:
                raise MediaFormatError(f"bad filter type {ftype}")
            row[x] = (row[x] + add) & 0xFF
        out.extend(row)
        prior = bytes(row)
    return width, height, channels, bytes(out)


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------


def encode_bmp(width: int, height: int, pixels: bytes, channels: int = 1) -> bytes:
    """Encode raw pixels as a bottom-up BMP (8-bit palettized or 24-bit)."""
    if len(pixels) != width * height * channels:
        raise MediaFormatError("pixel buffer does not match dimensions")
    if channels == 1:
        palette = b"".join(struct.pack("<BBBB", g, g, g, 0) for g in range(256))
        bits, palette_entries = 8, 256
    elif channels == 3:
        palette, bits, palette_entries = b"", 24, 0
    else:
        raise MediaFormatError("BMP supports 1 or 3 channels")
    stride_in = width * channels
    row_out = (stride_in + 3) & ~3  # 4-byte aligned
    body = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        row = pixels[y * stride_in : (y + 1) * stride_in]
        if channels == 3:
            # BMP stores BGR
            row = bytes(
                b for x in range(width) for b in (row[3 * x + 2], row[3 * x + 1], row[3 * x])
            )
        body.extend(row)
        body.extend(b"\x00" * (row_out - stride_in))
    offset = 14 + 40 + len(palette)
    header = struct.pack("<2sIHHI", b"BM", offset + len(body), 0, 0, offset)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, bits, 0, len(body), 2835, 2835,
        palette_entries, 0,
    )
    return header + info + palette + body


def decode_bmp(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a BMP -> (width, height, channels, row-major pixel bytes)."""
    if data[:2] != b"BM":
        raise MediaFormatError("not a BMP")
    (offset,) = struct.unpack_from("<I", data, 10)
    hdr_size, width, height = struct.unpack_from("<Iii", data, 14)
    if hdr_size < 40:
        raise MediaFormatError("unsupported BMP header")
    bits, compression = struct.unpack_from("<HI", data, 28)[0], struct.unpack_from("<I", data, 30)[0]
    if compression != 0 or bits not in (8, 24):
        raise MediaFormatError(f"unsupported BMP: bits={bits} compression={compression}")
    top_down = height < 0
    height = abs(height)
    channels = 1 if bits == 8 else 3
    stride_in = width * channels
    row_in = (stride_in + 3) & ~3
    out = bytearray(width * height * channels)
    for i in range(height):
        src = offset + i * row_in
        y = i if top_down else height - 1 - i
        row = data[src : src + stride_in]
        if channels == 3:
            row = bytes(
                b for x in range(width) for b in (row[3 * x + 2], row[3 * x + 1], row[3 * x])
            )
        out[y * stride_in : (y + 1) * stride_in] = row
    return width, height, channels, bytes(out)


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


def encode_wav(samples: bytes, sample_rate: int = 8000) -> bytes:
    """Encode 8-bit unsigned mono PCM samples as a RIFF/WAVE file."""
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate, 1, 8)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(samples)) + samples
        + (b"\x00" if len(samples) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(data: bytes) -> tuple[int, int, bytes]:
    """Decode a WAV -> (n_samples, sample_rate, PCM bytes).

    Walks RIFF chunks (tolerating unknown chunks and pad bytes) rather
    than assuming a fixed 44-byte header.
    """
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise MediaFormatError("not a RIFF/WAVE file")
    pos = 12
    sample_rate = block_align = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            audio_fmt, n_ch, sample_rate, _, block_align, bits = struct.unpack_from(
                "<HHIIHH", body
            )
            if audio_fmt != 1 or n_ch != 1 or bits != 8:
                raise MediaFormatError("unsupported WAV: want 8-bit mono PCM")
        elif tag == b"data":
            pcm = body
        pos += 8 + length + (length % 2)  # chunks are word-aligned
    if sample_rate is None or pcm is None:
        raise MediaFormatError("missing fmt or data chunk")
    return len(pcm) // block_align, sample_rate, pcm


# ---------------------------------------------------------------------------
# GIF (animated, 8-bit grayscale palette) -- the video-class container
# ---------------------------------------------------------------------------


def _lzw_encode(indices: bytes, min_code_size: int = 8) -> bytes:
    """GIF-flavor LZW: variable-width codes, clear/EOI, LSB bit packing."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    bitbuf = bitcnt = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, bitcnt
        bitbuf |= code << bitcnt
        bitcnt += width
        while bitcnt >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitcnt -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        run = bytes([b])
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if bitcnt:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int = 8) -> bytes:
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    pos = bitbuf = bitcnt = 0

    def read(width: int) -> int:
        nonlocal pos, bitbuf, bitcnt
        while bitcnt < width:
            if pos >= len(data):
                return eoi
            bitbuf |= data[pos] << bitcnt
            pos += 1
            bitcnt += 8
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        bitcnt -= width
        return code

    out = bytearray()
    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None
    while True:
        code = read(width)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:  # KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1


def encode_gif(width: int, height: int, frames: list[bytes]) -> bytes:
    """Encode grayscale frames as an animated GIF89a (global 256-gray
    palette, one image block per frame, real LZW compression)."""
    for fr in frames:
        if len(fr) != width * height:
            raise MediaFormatError("frame buffer does not match dimensions")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)  # GCT, 256 entries
    for g in range(256):
        out += bytes((g, g, g))
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"  # loop forever
    for fr in frames:
        out += b"\x21\xf9\x04\x00\x0a\x00\x00\x00"  # GCE: 100ms delay
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out.append(8)  # LZW min code size
        payload = _lzw_encode(fr)
        for i in range(0, len(payload), 255):
            chunk = payload[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)  # block terminator
    out += b"\x3b"
    return bytes(out)


def decode_gif(data: bytes) -> tuple[int, int, list[bytes]]:
    """Decode an animated GIF -> (width, height, [frame pixel bytes]).

    Real container walk: header, global color table, extension blocks
    (skipped), per-frame image descriptors with optional local color
    tables, sub-block reassembly, LZW decompression, palette lookup
    (gray value = red channel). Interlace is not supported."""
    if data[:6] not in (b"GIF89a", b"GIF87a") or len(data) < 14:
        raise MediaFormatError("not a GIF (bad signature or truncated header)")
    width, height, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = data[pos : pos + 3 * n]
        pos += 3 * n
    frames: list[bytes] = []
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _x, _y, fw, fh, iflags = struct.unpack_from("<HHHHB", data, pos)
            pos += 9
            if iflags & 0x40:
                raise MediaFormatError("interlaced GIF not supported")
            table = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                table = data[pos : pos + 3 * n]
                pos += 3 * n
            if table is None:
                raise MediaFormatError("GIF image with no color table")
            min_code = data[pos]
            pos += 1
            payload = bytearray()
            while data[pos] != 0:
                ln = data[pos]
                payload += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            indices = _lzw_decode(bytes(payload), min_code)
            if len(indices) < fw * fh:
                raise MediaFormatError("GIF frame truncated")
            frames.append(bytes(table[3 * i] for i in indices[: fw * fh]))
        else:
            raise MediaFormatError(f"unknown GIF block 0x{block:02x}")
    if not frames:
        raise MediaFormatError("GIF contains no frames")
    return width, height, frames


# ---------------------------------------------------------------------------
# AVI (uncompressed 8-bit palettized DIB frames) -- the RIFF video container
# ---------------------------------------------------------------------------


def _riff_list(tag: bytes, body: bytes) -> bytes:
    return b"LIST" + struct.pack("<I", 4 + len(body)) + tag + body


def _riff_chunk(tag: bytes, body: bytes) -> bytes:
    return tag + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) % 2 else b"")


def encode_avi(width: int, height: int, frames: list[bytes], fps: int = 10) -> bytes:
    """Encode grayscale frames as an uncompressed AVI (RIFF 'AVI ').

    Real AVI 1.0 structure: hdrl LIST (avih main header + strl LIST
    with a 'vids'/'DIB ' stream header and a BITMAPINFOHEADER + 256-
    entry gray palette), movi LIST with one '00db' DIB chunk per frame
    (bottom-up rows, 4-byte aligned -- the same pixel swizzle as BMP),
    and a standard idx1 index. Pure stdlib; BI_RGB, no compression.
    """
    for fr in frames:
        if len(fr) != width * height:
            raise MediaFormatError("frame buffer does not match dimensions")
    row_out = (width + 3) & ~3
    frame_bytes = row_out * height

    def dib(fr: bytes) -> bytes:
        body = bytearray()
        for y in range(height - 1, -1, -1):  # bottom-up
            body += fr[y * width : (y + 1) * width]
            body += b"\x00" * (row_out - width)
        return bytes(body)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        frame_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        len(frames),
        0,  # dwInitialFrames
        1,  # dwStreams
        frame_bytes,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4H",
        b"vids", b"DIB ",
        0, 0, 0, 0,  # flags, priority, language, initial frames
        1, fps,  # dwScale / dwRate -> frame rate
        0, len(frames), frame_bytes, 0, 0,  # start, length, bufsize, quality, sample size
        0, 0, width, height,  # rcFrame
    )
    palette = b"".join(struct.pack("<BBBB", g, g, g, 0) for g in range(256))
    strf = (
        struct.pack("<IiiHHIIiiII", 40, width, height, 1, 8, 0, frame_bytes, 0, 0, 256, 0)
        + palette
    )
    strl = _riff_list(b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf))
    hdrl = _riff_list(b"hdrl", _riff_chunk(b"avih", avih) + strl)
    movi_body = b"".join(_riff_chunk(b"00db", dib(fr)) for fr in frames)
    movi = _riff_list(b"movi", movi_body)
    idx, off = bytearray(), 4  # offsets relative to 'movi' fourcc
    for fr in frames:
        idx += struct.pack("<4sIII", b"00db", 0x10, off, frame_bytes)  # AVIIF_KEYFRAME
        off += 8 + frame_bytes + (frame_bytes % 2)
    body = hdrl + movi + _riff_chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body


def decode_avi(data: bytes) -> tuple[int, int, list[bytes]]:
    """Decode an uncompressed AVI -> (width, height, [frame pixels]).

    Real container walk: recursive RIFF LIST traversal, avih/strf
    header parse, per-'00db' DIB unswizzle (bottom-up + row padding
    reversal), palette lookup (gray = red channel). Compressed streams
    (biCompression != 0 or non-'db' chunks) raise MediaFormatError.
    """
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise MediaFormatError("not a RIFF/AVI file")
    width = height = None
    bits = 8
    palette = None
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal width, height, bits, palette
        while pos + 8 <= end:
            tag = data[pos : pos + 4]
            (length,) = struct.unpack_from("<I", data, pos + 4)
            body_start = pos + 8
            if tag == b"LIST":
                walk(body_start + 4, body_start + length)
            elif tag == b"avih":
                w, h = struct.unpack_from("<II", data, body_start + 32)
                width, height = w, h
            elif tag == b"strf":
                hdr_size, w, h, _planes, bits_ = struct.unpack_from(
                    "<IiiHH", data, body_start
                )
                (compression,) = struct.unpack_from("<I", data, body_start + 16)
                if compression != 0 or bits_ != 8:
                    raise MediaFormatError(
                        f"unsupported AVI stream: bits={bits_} compression={compression}"
                    )
                bits = bits_
                (n_colors,) = struct.unpack_from("<I", data, body_start + 32)
                n_colors = n_colors or 256
                palette = data[body_start + hdr_size : body_start + hdr_size + 4 * n_colors]
            elif tag[2:4] == b"db":
                if width is None or palette is None:
                    raise MediaFormatError("AVI frame chunk before headers")
                row_in = (width + 3) & ~3
                if length < row_in * height:
                    raise MediaFormatError("AVI frame truncated")
                fr = bytearray(width * height)
                for i in range(height):
                    src = body_start + i * row_in
                    y = height - 1 - i  # bottom-up
                    fr[y * width : (y + 1) * width] = bytes(
                        palette[4 * idx + 2]  # red channel of RGBQUAD (b,g,r,0)
                        for idx in data[src : src + width]
                    )
                frames.append(bytes(fr))
            elif tag[2:4] == b"dc":
                raise MediaFormatError("compressed AVI frames not supported")
            pos = body_start + length + (length % 2)  # chunks are word-aligned

    walk(12, len(data))
    if width is None or not frames:
        raise MediaFormatError("AVI missing headers or frames")
    return width, height, frames


# ---------------------------------------------------------------------------
# Sniffing
# ---------------------------------------------------------------------------


def sniff(data: bytes) -> str | None:
    """Identify a payload's container format by magic bytes."""
    if data[:8] == PNG_SIG:
        return "png"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return "avi"
    if data[:6] in (b"GIF89a", b"GIF87a"):
        return "gif"
    return None
