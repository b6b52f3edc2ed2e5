"""Multimodal-column operators: image/audio/video as opaque `binary`
columns with typed metadata.

The pattern (the one a 100 TB training-data pipeline needs):

- payloads are ``binary`` columns ridden alongside a typed metadata
  struct (``format``, ``n_bytes``, ``n_frames``) — never parsed by the
  engine itself, so scans stay columnar and metadata predicates push
  down to parquet without touching payload bytes;
- decode / feature-extract / resize run as Arrow-batched
  ``mapInPandas`` stages — the only place payload bytes are opened —
  so the expensive step is embarrassingly parallel, partition-local,
  and sized by ``spark.sql.files.maxPartitionBytes`` rather than row
  count;
- frame sampling and other metadata-only derivations stay JVM-side
  (``F.sequence`` + ``explode``) — no payload I/O at all.

Codecs: REAL pure-Python coders implement `encode_media` /
`decode_media` — PPM P6 (netpbm images), WAV RIFF PCM16 (audio),
YUV4MPEG2 (raw video), PNG (zlib DEFLATE IDAT streams,
CRC-32-verified chunks, full scanline unfiltering for all five PNG
filter types incl. Paeth), baseline-sequential JPEG (Huffman + IDCT),
AVI/MJPEG (RIFF walk, per-frame JPEG), and AVI/RLE8 ('MRLE') — a
genuinely INTER-FRAME-compressed codec: keyframe + delta frames whose
unchanged pixels ride the 00 02 motion escape and are inherited from
a persistent reference buffer across frames, the decode discipline
mp4/h264 P-frames require (Microsoft BI_RLE8, public spec).
`decode_features(fake=None)` parses genuine container headers and
extracts stats from the decoded pixel/sample payload. Formats with no
shipped codec (mp4/h264-class) raise ValueError — a production
cluster links pyav/ffmpeg at that seam; the byte-histogram fallback
(`fake='histogram'`) stays for opaque bytes.

Testdata has no binary table, so `attach_blob` synthesizes the payload
deterministically from `documents.text` (UTF-8 bytes); `transcode`
wraps those raw bytes into a real container per the row's format tag —
exactly the ingest step a production pipeline runs on raw source
bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: histogram bins for the deterministic fake "decoder"
N_FEATURE_BINS = 16

#: deterministic fake frame count: bounded, derived from payload size
MAX_FRAMES = 240


def media_format(id_col: Column) -> Column:
    """Deterministic format tag (stands in for real content sniffing).
    The three tags are the uncompressed public formats the pure-Python
    codecs below really encode and decode."""
    return (
        F.when(id_col % 3 == 0, "image/ppm")
        .when(id_col % 3 == 1, "audio/wav")
        .otherwise("video/y4m")
    )


def attach_blob(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Synthesize the multimodal shape from a text corpus: opaque
    `blob BINARY` payload + `media_meta STRUCT<format, n_bytes,
    n_frames>`. On a real dataset these columns arrive from the source
    (parquet BINARY + sidecar metadata); this constructor only exists
    because the synthetic testdata ships no binary table."""
    blob = F.encode(F.col(text_col), "UTF-8")
    n_bytes = F.octet_length(F.col(text_col)).cast("long")
    return df.select(
        F.col(id_col),
        blob.alias("blob"),
        F.struct(
            media_format(F.col(id_col)).alias("format"),
            n_bytes.alias("n_bytes"),
            ((n_bytes % MAX_FRAMES) + F.lit(1)).alias("n_frames"),
        ).alias("media_meta"),
    )


def frame_sample(
    df: DataFrame, id_col: str, every: int = 10
) -> DataFrame:
    """Sample every `every`-th frame index per media row — metadata-only,
    pure JVM (`F.sequence` + `explode`), zero payload I/O. Returns
    (id_col, frame_idx LONG)."""
    n_frames = F.col("media_meta.n_frames")
    return df.select(
        F.col(id_col),
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                (n_frames - 1).cast("long"),
                F.lit(every).cast("long"),
            )
        ).alias("frame_idx"),
    )


#: PPM geometry: fixed 16-px-wide rows, height grows with payload
PPM_W = 16
#: WAV: mono 16-bit PCM at 8 kHz
WAV_RATE = 8000
#: Y4M geometry: 16x16 4:2:0 frames -> 16*16 + 2*(8*8) = 384 bytes
Y4M_W = Y4M_H = 16
_Y4M_FRAME_BYTES = Y4M_W * Y4M_H * 3 // 2
#: PNG geometry: 8-bit greyscale, fixed 16-px rows, height from payload
PNG_W = 16
_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: PNG color type -> bytes per pixel at bit depth 8
_PNG_BPP = {0: 1, 2: 3, 4: 2, 6: 4}

# ---- baseline JPEG (ITU T.81 Annex K tables, greyscale) -----------
#: JPEG geometry: 8-bit greyscale, fixed 16-px rows, height from payload
JPEG_W = 16
#: Annex K luminance quantization table, row-major 8x8
_JPEG_QTAB = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
#: zigzag scan order: position k holds the row-major index it reads
_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]
#: Annex K luminance DC Huffman spec: (#codes per length 1..16, symbols)
_JPEG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))
#: Annex K luminance AC Huffman spec
_JPEG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_JPEG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _jpeg_canonical_codes(bits: list, vals: list) -> dict:
    """Canonical Huffman assignment (T.81 C.2): symbol -> (code, size)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _jpeg_dct_matrix():
    """8x8 DCT-II basis T with T @ X @ T.T the forward transform and
    T.T @ Y @ T the inverse (orthonormal), float64 — deterministic."""
    import math

    import numpy as np

    T = np.zeros((8, 8), dtype=np.float64)
    for u in range(8):
        cu = math.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            T[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
    return T


def encode_media(data: bytes, fmt: str) -> bytes:
    """Wrap raw bytes into a REAL container of the tagged format —
    the ingest/transcode step of a media pipeline. Deterministic:
    zero-padding to the container's block size, fixed geometry.

    - image/ppm: netpbm P6 — ``P6\\n{w} {h}\\n255\\n`` + RGB24 rows.
    - audio/wav: RIFF/WAVE, fmt chunk (PCM, mono, 8 kHz, 16-bit) +
      data chunk; bytes reinterpreted as little-endian int16 samples.
    - video/y4m: YUV4MPEG2 stream header + ``FRAME\\n``-delimited
      16x16 C420 planar frames.
    - image/png: real PNG — signature, IHDR (8-bit greyscale, no
      interlace), one zlib-DEFLATE IDAT of filter-0 scanlines, IEND;
      every chunk carries its genuine CRC-32.
    - image/jpeg: real BASELINE SEQUENTIAL JPEG (ITU T.81) — greyscale
      8-bit, Annex K luminance quantization + Huffman tables carried
      in DQT/DHT, 8x8 DCT blocks, byte-stuffed entropy stream. Lossy
      (quantized DCT), like every real JPEG.
    """
    import struct

    if fmt == "image/jpeg":
        h = max(1, -(-len(data) // JPEG_W))
        body = data.ljust(h * JPEG_W, b"\x00")
        return _encode_jpeg(body, JPEG_W, h)

    if fmt == "image/png":
        import zlib

        h = max(1, -(-len(data) // PNG_W))
        body = data.ljust(h * PNG_W, b"\x00")
        raw = b"".join(
            b"\x00" + body[y * PNG_W : (y + 1) * PNG_W] for y in range(h)
        )

        def chunk(tag: bytes, payload: bytes) -> bytes:
            return (
                struct.pack(">I", len(payload))
                + tag
                + payload
                + struct.pack(">I", zlib.crc32(tag + payload))
            )

        ihdr = struct.pack(">IIBBBBB", PNG_W, h, 8, 0, 0, 0, 0)
        return (
            _PNG_SIG
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b"")
        )
    if fmt == "image/ppm":
        row = 3 * PPM_W
        h = max(1, -(-len(data) // row))
        body = data.ljust(h * row, b"\x00")
        return b"P6\n%d %d\n255\n" % (PPM_W, h) + body
    if fmt == "audio/wav":
        body = data if len(data) % 2 == 0 else data + b"\x00"
        return (
            b"RIFF"
            + struct.pack("<I", 36 + len(body))
            + b"WAVEfmt "
            + struct.pack(
                "<IHHIIHH", 16, 1, 1, WAV_RATE, WAV_RATE * 2, 2, 16
            )
            + b"data"
            + struct.pack("<I", len(body))
            + body
        )
    if fmt == "video/y4m":
        n = max(1, -(-len(data) // _Y4M_FRAME_BYTES))
        body = data.ljust(n * _Y4M_FRAME_BYTES, b"\x00")
        return b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420\n" % (
            Y4M_W,
            Y4M_H,
        ) + b"".join(
            b"FRAME\n"
            + body[i * _Y4M_FRAME_BYTES : (i + 1) * _Y4M_FRAME_BYTES]
            for i in range(n)
        )
    if fmt == "video/avi":
        return _encode_avi_mjpeg(data)
    if fmt == "video/mrle":
        return _encode_avi_rle8(data)
    raise ValueError(f"encode_media: no encoder for format {fmt!r}")


def decode_media(payload: bytes, fmt: str):
    """REAL pure-Python decoder for every shipped media format (PNG
    with zlib+Paeth, baseline JPEG, WAV/PPM/Y4M, MJPEG-AVI, RLE8
    inter-frame AVI): validates magic, parses the actual header
    fields, and returns ``(samples, info)`` — samples an int64 numpy
    array of decoded pixel/sample values, info a dict of parsed
    geometry. Raises ValueError on malformed containers (wrong magic,
    truncated data) and on formats outside the shipped list."""
    import struct

    import numpy as np

    if fmt == "image/png":
        return _decode_png(payload)

    if fmt == "image/jpeg":
        return _decode_jpeg(payload)

    if fmt in ("video/avi", "video/mrle"):
        return _decode_avi_mjpeg(payload)

    if fmt == "image/ppm":
        if payload[:2] != b"P6":
            raise ValueError("decode_media: not a P6 PPM (bad magic)")
        # header = 3 whitespace-separated ints after the magic, with
        # '#' comment lines allowed (netpbm spec), then ONE whitespace
        pos, vals = 2, []
        while len(vals) < 3:
            while payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":
                pos = payload.index(b"\n", pos) + 1
                continue
            start = pos
            while not payload[pos : pos + 1].isspace():
                pos += 1
            vals.append(int(payload[start:pos]))
        pos += 1
        w, h, maxval = vals
        if maxval != 255:
            raise ValueError("decode_media: only maxval 255 supported")
        if len(payload) - pos < w * h * 3:
            raise ValueError("decode_media: truncated PPM pixel data")
        px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
        return px.astype(np.int64), {"width": w, "height": h, "n_frames": 1}

    if fmt == "audio/wav":
        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            raise ValueError("decode_media: not a RIFF/WAVE file")
        pos, data, rate, ch, bits = 12, None, None, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            sz = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
            body = payload[pos + 8 : pos + 8 + sz]
            if cid == b"fmt ":
                _, ch, rate, _, _, bits = struct.unpack(
                    "<HHIIHH", body[:16]
                )
            elif cid == b"data":
                data = body
            pos += 8 + sz + (sz & 1)  # chunks are word-aligned
        if data is None or bits is None:
            raise ValueError("decode_media: missing fmt/data chunk")
        if bits != 16:
            raise ValueError("decode_media: only 16-bit PCM supported")
        samples = np.frombuffer(data, dtype="<i2")
        return samples.astype(np.int64), {
            "sample_rate": rate,
            "channels": ch,
            "n_frames": 1,
        }

    if fmt == "video/y4m":
        nl = payload.index(b"\n")
        hdr = payload[:nl].split(b" ")
        if hdr[0] != b"YUV4MPEG2":
            raise ValueError("decode_media: not a YUV4MPEG2 stream")
        params = {p[:1]: p[1:] for p in hdr[1:]}
        w, h = int(params[b"W"]), int(params[b"H"])
        if params.get(b"C", b"420") not in (b"420", b"420jpeg"):
            raise ValueError("decode_media: only C420 supported")
        fsz = w * h * 3 // 2
        frames, pos = [], nl + 1
        while pos < len(payload):
            eol = payload.index(b"\n", pos)
            if payload[pos : pos + 5] != b"FRAME":
                raise ValueError("decode_media: bad FRAME marker")
            pos = eol + 1
            if len(payload) - pos < fsz:
                raise ValueError("decode_media: truncated Y4M frame")
            frames.append(
                np.frombuffer(payload, dtype=np.uint8, count=fsz, offset=pos)
            )
            pos += fsz
        return np.concatenate(frames).astype(np.int64), {
            "width": w,
            "height": h,
            "n_frames": len(frames),
        }

    raise ValueError(
        f"decode_media: no decoder for format {fmt!r} — shipped codecs: "
        "ppm/wav/y4m/png/jpeg/avi-mjpeg/avi-rle8 (a production cluster "
        "links pyav/ffmpeg at this seam for mp4/h264-class formats)"
    )


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6): nearest of left/up/up-left
    to the linear estimate a + b - c, ties broken a, b, c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _decode_png(payload: bytes):
    """REAL pure-Python PNG decoder: signature + chunk walk with
    CRC-32 verification, IHDR parse, multi-IDAT zlib inflate, and full
    scanline unfiltering (None/Sub/Up/Average/Paeth) for 8-bit
    greyscale / grey-alpha / RGB / RGBA, non-interlaced. Returns
    (samples int64 ndarray of reconstructed channel bytes, info)."""
    import struct
    import zlib

    import numpy as np

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("decode_media: not a PNG (bad signature)")
    pos, ihdr, idat = len(_PNG_SIG), None, []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("decode_media: truncated PNG chunk")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if crc != zlib.crc32(tag + body):
            raise ValueError(f"decode_media: PNG CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("decode_media: PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            "decode_media: only 8-bit non-interlaced PNG supported"
        )
    if ctype not in _PNG_BPP:
        raise ValueError(f"decode_media: unsupported PNG color type {ctype}")
    bpp = _PNG_BPP[ctype]
    stride = w * bpp
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("decode_media: PNG scanline data size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        if ftype == 0:  # None
            rec = line
        elif ftype == 2:  # Up
            rec = (line + prev) & 0xFF
        else:
            rec = line.copy()
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ftype == 1:  # Sub
                    rec[x] = (rec[x] + a) & 0xFF
                elif ftype == 3:  # Average
                    rec[x] = (rec[x] + (a + b) // 2) & 0xFF
                elif ftype == 4:  # Paeth
                    rec[x] = (rec[x] + _paeth(a, b, c)) & 0xFF
                else:
                    raise ValueError(
                        f"decode_media: bad PNG filter type {ftype}"
                    )
        out[y] = rec
        prev = rec.astype(np.int64)
    return out.reshape(-1).astype(np.int64), {
        "width": w,
        "height": h,
        "channels": bpp,
        "n_frames": 1,
    }


def _encode_jpeg(body: bytes, w: int, h: int) -> bytes:
    """REAL baseline-sequential JPEG encoder (pure Python + numpy):
    greyscale pixels -> level shift -> 8x8 DCT -> Annex K quantization
    -> zigzag -> DC-difference + run-length AC -> canonical Huffman ->
    byte-stuffed entropy stream, wrapped in SOI/DQT/SOF0/DHT/SOS/EOI
    with the tables embedded, so any conformant decoder reads it."""
    import struct

    import numpy as np

    T = _jpeg_dct_matrix()
    q = np.asarray(_JPEG_QTAB, dtype=np.float64).reshape(8, 8)
    dc_codes = _jpeg_canonical_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_canonical_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)

    bw_bits: list = []  # (value, nbits) accumulator

    def put(code: int, nbits: int) -> None:
        bw_bits.append((code, nbits))

    def category(v: int) -> int:
        return int(v).bit_length() if v > 0 else int(-v).bit_length()

    px = (
        np.frombuffer(body, dtype=np.uint8)
        .reshape(h, w)
        .astype(np.float64)
    )
    # pad to full 8x8 blocks by edge replication (T.81 suggestion)
    H8, W8 = -(-h // 8) * 8, -(-w // 8) * 8
    img = np.zeros((H8, W8), dtype=np.float64)
    img[:h, :w] = px
    img[h:, :w] = px[h - 1 : h, :]
    img[:, w:] = img[:, w - 1 : w]

    prev_dc = 0
    for by in range(H8 // 8):
        for bx in range(W8 // 8):
            blk = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = T @ blk @ T.T
            # round-to-nearest, half away from zero (deterministic)
            zq = np.sign(coef) * np.floor(np.abs(coef) / q + 0.5)
            zz = [int(zq.reshape(-1)[i]) for i in _JPEG_ZIGZAG]
            diff = zz[0] - prev_dc
            prev_dc = zz[0]
            s = category(diff)
            code, n = dc_codes[s]
            put(code, n)
            if s:
                put(diff if diff > 0 else diff + (1 << s) - 1, s)
            run = 0
            last_nz = max(
                (k for k in range(1, 64) if zz[k] != 0), default=0
            )
            for k in range(1, last_nz + 1):
                if zz[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    code, n = ac_codes[0xF0]  # ZRL
                    put(code, n)
                    run -= 16
                s = category(zz[k])
                code, n = ac_codes[(run << 4) | s]
                put(code, n)
                put(zz[k] if zz[k] > 0 else zz[k] + (1 << s) - 1, s)
                run = 0
            if last_nz < 63:
                code, n = ac_codes[0x00]  # EOB
                put(code, n)

    # flush bit stream, pad with 1s, byte-stuff 0xFF -> 0xFF 0x00
    out, acc, nacc = bytearray(), 0, 0
    for v, n in bw_bits:
        acc = (acc << n) | (v & ((1 << n) - 1))
        nacc += n
        while nacc >= 8:
            byte = (acc >> (nacc - 8)) & 0xFF
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
            nacc -= 8
            acc &= (1 << nacc) - 1
    if nacc:
        byte = ((acc << (8 - nacc)) | ((1 << (8 - nacc)) - 1)) & 0xFF
        out.append(byte)
        if byte == 0xFF:
            out.append(0x00)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    dqt = seg(0xFFDB, b"\x00" + bytes(_JPEG_QTAB[i] for i in _JPEG_ZIGZAG))
    sof = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 1) + bytes((1, 0x11, 0)),
    )
    dht = seg(
        0xFFC4, b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
    ) + seg(0xFFC4, b"\x10" + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS))
    sos = seg(0xFFDA, b"\x01" + bytes((1, 0x00)) + b"\x00\x3f\x00")
    return (
        b"\xff\xd8" + dqt + sof + dht + sos + bytes(out) + b"\xff\xd9"
    )


def _decode_jpeg(payload: bytes):
    """REAL pure-Python baseline JPEG decoder: marker walk, DQT/SOF0/
    DHT/SOS parse (tables read FROM THE FILE, not assumed), canonical
    Huffman entropy decode with byte-unstuffing and restart-marker
    handling, dequantization, inverse zigzag, float64 IDCT, level
    shift + clamp. Greyscale (single component) baseline sequential
    only — progressive/chroma raise, like the other decoders raise on
    unsupported container variants. Returns (samples int64 of the
    w*h reconstructed pixels, info)."""
    import struct

    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("decode_media: not a JPEG (bad SOI)")
    pos = 2
    qtabs: dict = {}
    huff: dict = {}  # (class, id) -> {(code, size): symbol}
    w = h = None
    dc_id = ac_id = 0
    restart_interval = 0
    entropy_start = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("decode_media: bad JPEG marker sync")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI before SOS
            break
        (ln,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + ln]
        if len(body) != ln - 2:
            raise ValueError("decode_media: truncated JPEG segment")
        if marker == 0xDB:  # DQT (may hold several tables)
            bp = 0
            while bp < len(body):
                if bp + 65 > len(body):
                    raise ValueError("decode_media: truncated JPEG DQT")
                pq, tq = body[bp] >> 4, body[bp] & 0xF
                if pq != 0:
                    raise ValueError(
                        "decode_media: only 8-bit JPEG quant tables"
                    )
                tab = np.zeros(64, dtype=np.int64)
                for k in range(64):
                    tab[_JPEG_ZIGZAG[k]] = body[bp + 1 + k]
                qtabs[tq] = tab.reshape(8, 8)
                bp += 65
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8 or ncomp != 1:
                raise ValueError(
                    "decode_media: only 8-bit greyscale baseline JPEG"
                )
            if body[7] != 0x11:
                raise ValueError("decode_media: subsampled JPEG unsupported")
            quant_id = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "decode_media: only baseline sequential JPEG (SOF0)"
            )
        elif marker == 0xC4:  # DHT (may hold several tables)
            bp = 0
            while bp < len(body):
                tc, th = body[bp] >> 4, body[bp] & 0xF
                bits = list(body[bp + 1 : bp + 17])
                nvals = sum(bits)
                if len(bits) < 16 or bp + 17 + nvals > len(body):
                    raise ValueError("decode_media: truncated JPEG DHT")
                vals = list(body[bp + 17 : bp + 17 + nvals])
                codes = _jpeg_canonical_codes(bits, vals)
                huff[(tc, th)] = {
                    (code, size): sym for sym, (code, size) in codes.items()
                }
                bp += 17 + nvals
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
            if restart_interval:
                raise ValueError(
                    "decode_media: JPEG restart intervals unsupported"
                )
        elif marker == 0xDA:  # SOS
            ns = body[0]
            if ns != 1:
                raise ValueError("decode_media: multi-component scan")
            dc_id, ac_id = body[2] >> 4, body[2] & 0xF
            entropy_start = pos + 2 + ln
            break
        pos += 2 + ln
    if w is None or entropy_start is None:
        raise ValueError("decode_media: JPEG missing SOF0/SOS")
    if quant_id not in qtabs:
        raise ValueError("decode_media: JPEG missing quant table")
    q = qtabs[quant_id]
    dct = huff.get((0, dc_id))
    act = huff.get((1, ac_id))
    if dct is None or act is None:
        raise ValueError("decode_media: JPEG missing Huffman tables")

    data = payload[entropy_start:]

    class _Bits:
        def __init__(self) -> None:
            self.pos = 0
            self.acc = 0
            self.n = 0

        def _fill(self) -> None:
            while self.n <= 24:
                if self.pos >= len(data):
                    raise ValueError("decode_media: truncated JPEG scan")
                b = data[self.pos]
                if b == 0xFF:
                    nxt = data[self.pos + 1] if self.pos + 1 < len(data) else 0
                    if nxt == 0x00:
                        self.pos += 2
                    elif 0xD0 <= nxt <= 0xD7:
                        # RSTn needs a DC-predictor reset at MCU
                        # granularity; this encoder never emits DRI,
                        # so refuse rather than half-support
                        raise ValueError(
                            "decode_media: JPEG restart markers "
                            "unsupported"
                        )
                    else:  # EOI or next segment: pad with 1s
                        self.acc = (self.acc << 8) | 0xFF
                        self.n += 8
                        continue
                else:
                    self.pos += 1
                self.acc = (self.acc << 8) | b
                self.n += 8

        def take(self, k: int) -> int:
            if k == 0:
                return 0
            self._fill()
            v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
            self.n -= k
            self.acc &= (1 << self.n) - 1
            return v

        def huffman(self, table: dict) -> int:
            code = 0
            for size in range(1, 17):
                code = (code << 1) | self.take(1)
                sym = table.get((code, size))
                if sym is not None:
                    return sym
            raise ValueError("decode_media: invalid JPEG Huffman code")

    def extend(v: int, s: int) -> int:
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

    T = _jpeg_dct_matrix()
    bx_n, by_n = -(-w // 8), -(-h // 8)
    img = np.zeros((by_n * 8, bx_n * 8), dtype=np.int64)
    bits = _Bits()
    prev_dc = 0
    for by in range(by_n):
        for bx in range(bx_n):
            s = bits.huffman(dct)
            diff = extend(bits.take(s), s) if s else 0
            dc = prev_dc + diff
            prev_dc = dc
            zz = np.zeros(64, dtype=np.int64)
            zz[0] = dc
            k = 1
            while k < 64:
                sym = bits.huffman(act)
                if sym == 0x00:  # EOB
                    break
                run, size = sym >> 4, sym & 0xF
                if size == 0:
                    if run != 15:
                        raise ValueError(
                            "decode_media: bad JPEG AC symbol"
                        )
                    k += 16  # ZRL
                    continue
                k += run
                if k > 63:
                    raise ValueError("decode_media: JPEG AC overrun")
                zz[k] = extend(bits.take(size), size)
                k += 1
            blk = np.zeros(64, dtype=np.int64)
            blk[_JPEG_ZIGZAG] = zz
            coef = blk.reshape(8, 8).astype(np.float64) * q
            pix = T.T @ coef @ T + 128.0
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                np.floor(pix + 0.5), 0, 255
            ).astype(np.int64)
    return img[:h, :w].reshape(-1), {
        "width": int(w),
        "height": int(h),
        "n_frames": 1,
    }


#: AVI/MJPEG geometry: every frame is a 16x16 greyscale baseline JPEG
AVI_W = AVI_H = 16
_AVI_FRAME_BYTES = AVI_W * AVI_H
#: microseconds per frame in the AVI main header (25 fps)
_AVI_US_PER_FRAME = 40_000


def _riff_chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_size) for each RIFF chunk
    in buf[pos:end] — chunks are word-aligned (odd sizes carry one pad
    byte that is not counted in the size field)."""
    import struct

    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def _encode_avi_mjpeg(data: bytes) -> bytes:
    """REAL AVI (RIFF) container around Motion-JPEG video: the payload
    bytes split into 16x16 greyscale frames, each encoded as a full
    baseline JPEG (_encode_jpeg — tables embedded per frame, as the
    MJPEG convention requires), wrapped in the standard box structure:
    LIST hdrl (avih main header + LIST strl with a 'vids'/'MJPG' strh
    and a BITMAPINFOHEADER strf), LIST movi of '00dc' frame chunks,
    and an idx1 index with one keyframe entry per frame (every MJPEG
    frame is independently decodable). Word-aligned chunks, all sizes
    genuine."""
    import struct

    n = max(1, -(-len(data) // _AVI_FRAME_BYTES))
    body = data.ljust(n * _AVI_FRAME_BYTES, b"\x00")
    frames = [
        _encode_jpeg(
            body[i * _AVI_FRAME_BYTES : (i + 1) * _AVI_FRAME_BYTES],
            AVI_W,
            AVI_H,
        )
        for i in range(n)
    ]

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    avih = struct.pack(
        "<14I",
        _AVI_US_PER_FRAME,  # dwMicroSecPerFrame
        _AVI_FRAME_BYTES * 25,  # dwMaxBytesPerSec (nominal)
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        0,  # dwSuggestedBufferSize
        AVI_W,
        AVI_H,
        0, 0, 0, 0,  # dwReserved[4]
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII",
            0, 0, 0,  # flags, priority, language
            0,  # initial frames
            1,  # scale
            25,  # rate -> 25 fps
            0,  # start
            n,  # length (frames)
            0,  # suggested buffer
            0xFFFFFFFF,  # quality (default)
            0,  # sample size (0 = varying)
        )
        + struct.pack("<hhhh", 0, 0, AVI_W, AVI_H)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        AVI_W,
        AVI_H,
        1,  # biPlanes
        24,  # biBitCount (MJPEG convention)
        b"MJPG",  # biCompression
        _AVI_FRAME_BYTES,  # biSizeImage (nominal)
        0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_payload = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", movi_payload)
    # idx1 entries: offset is from the start of the movi LIST payload
    # (the 'movi' fourcc itself), the most common AVI convention
    idx, off = [], 4
    for f in frames:
        idx.append(
            b"00dc" + struct.pack("<III", 0x10, off, len(f))
        )  # AVIIF_KEYFRAME
        off += 8 + len(f) + (len(f) & 1)
    idx1 = chunk(b"idx1", b"".join(idx))
    riff_payload = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def _decode_avi_mjpeg(payload: bytes):
    """REAL AVI decoder, codec-dispatched on the stream format header:
    validates the RIFF/'AVI ' signature, walks the chunk tree (LIST
    hdrl -> avih for geometry and declared frame count, strl/strf for
    the BITMAPINFOHEADER's biCompression and palette; LIST movi ->
    '00dc' frame chunks), then decodes per codec:

    - 'MJPG' (or no strf — pre-r8 fixtures): every frame is an
      independent baseline JPEG (_decode_jpeg), geometry cross-checked
      against avih. Intra-only.
    - BI_RLE8 ('MRLE'): INTER-FRAME path — a persistent reference
      buffer carries pixel state across frames; each '00dc' stream
      paints only its deltas (_rle8_apply), so P-frames depend on
      every frame back to the keyframe, exactly the decode discipline
      mp4/h264 require. Bottom-up DIB rows are flipped to top-down,
      indices mapped through the embedded RGBQUAD palette. Lossless.

    Returns (all frames' samples concatenated, {width, height,
    n_frames})."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("decode_media: not a RIFF/AVI file")
    (riff_size,) = struct.unpack("<I", payload[4:8])
    end = min(len(payload), 8 + riff_size)
    w = h = declared = None
    compression: int | None = None
    palette = None
    frames: list[bytes] = []
    for fourcc, start, size in _riff_chunks(payload, 12, end):
        if fourcc != b"LIST":
            continue
        kind = payload[start : start + 4]
        if kind == b"hdrl":
            for fc2, s2, sz2 in _riff_chunks(
                payload, start + 4, start + size
            ):
                if fc2 == b"avih":
                    hdr = struct.unpack("<14I", payload[s2 : s2 + 56])
                    declared, w, h = hdr[4], hdr[8], hdr[9]
                elif fc2 == b"LIST" and payload[s2 : s2 + 4] == b"strl":
                    for fc3, s3, sz3 in _riff_chunks(
                        payload, s2 + 4, s2 + sz2
                    ):
                        if fc3 == b"strf":
                            bmih = struct.unpack(
                                "<IiiHHIIiiII", payload[s3 : s3 + 40]
                            )
                            compression = bmih[5]
                            n_colors = bmih[9] or (
                                256 if bmih[4] == 8 else 0
                            )
                            if n_colors:
                                palette = np.frombuffer(
                                    payload,
                                    np.uint8,
                                    n_colors * 4,
                                    s3 + 40,
                                ).reshape(-1, 4)
        elif kind == b"movi":
            for fc2, s2, sz2 in _riff_chunks(
                payload, start + 4, start + size
            ):
                # ##dc/##db = video frame chunks of stream ##
                if fc2[2:4] in (b"dc", b"db"):
                    frames.append(payload[s2 : s2 + sz2])
    if w is None or not frames:
        raise ValueError("decode_media: AVI missing avih or movi frames")
    if declared is not None and declared != len(frames):
        raise ValueError(
            f"decode_media: AVI declares {declared} frames but movi "
            f"carries {len(frames)}"
        )
    out = []
    if compression == _BI_RLE8:
        if palette is None:
            raise ValueError("decode_media: RLE8 AVI missing palette")
        ref = np.zeros((h, w), dtype=np.uint8)
        lut = palette[:, 0].astype(np.int64)  # greyscale: B==G==R
        for f in frames:
            _rle8_apply(f, ref)
            out.append(lut[ref[::-1]].reshape(-1))  # bottom-up -> top
    elif compression in (None, _MJPG_U32):
        for f in frames:
            samples, info = _decode_jpeg(f)
            if info["width"] != w or info["height"] != h:
                raise ValueError(
                    "decode_media: AVI frame geometry mismatches avih"
                )
            out.append(samples)
    else:
        raise ValueError(
            f"decode_media: unsupported AVI biCompression {compression}"
        )
    return np.concatenate(out), {
        "width": int(w),
        "height": int(h),
        "n_frames": len(frames),
    }


#: BI_RLE8 — the BITMAPINFOHEADER biCompression value for Microsoft
#: 8-bit run-length coding (Windows GDI / AVI 'MRLE', public spec).
_BI_RLE8 = 1
#: 'MJPG' fourcc as the little-endian uint32 biCompression carries it.
_MJPG_U32 = int.from_bytes(b"MJPG", "little")


def _rle8_encode_frame(frame, prev):
    """RLE8-encode ONE frame (2-D uint8 array in DIB storage order,
    i.e. bottom-up rows). With ``prev is None`` this is a KEYFRAME:
    every pixel is painted with encoded-mode (count, index) runs.
    With a previous frame it is a DELTA (P-) frame — the inter-frame
    path: pixels equal to the previous frame are never written; whole
    unchanged rows collapse to an end-of-line escape (00 00), interior
    unchanged spans to the motion/delta escape (00 02 dx dy), and only
    changed runs are re-painted. The decoder inherits every skipped
    pixel from its reference buffer — temporal prediction, the same
    contract mp4/h264 P-frames implement with motion compensation."""
    h, w = frame.shape
    out = bytearray()
    for y in range(h):
        row = frame[y]
        if prev is not None and bool((row == prev[y]).all()):
            out += b"\x00\x00"  # whole row inherited from reference
            continue
        x = 0
        while x < w:
            if prev is not None and row[x] == prev[y][x]:
                run = 1
                while x + run < w and row[x + run] == prev[y][x + run]:
                    run += 1
                if x + run >= w:
                    break  # trailing span inherited; EOL advances
                while run > 0:  # dx escape is a byte: hop in <=255s
                    dx = min(run, 255)
                    out += bytes((0, 2, dx, 0))
                    run -= dx
                    x += dx
            else:
                run = 1
                while (
                    x + run < w
                    and row[x + run] == row[x]
                    and not (
                        prev is not None
                        and row[x + run] == prev[y][x + run]
                    )
                    and run < 255
                ):
                    run += 1
                out += bytes((run, int(row[x])))
                x += run
        out += b"\x00\x00"
    out[-2:] = b"\x00\x01"  # last EOL becomes end-of-bitmap
    return bytes(out)


def _rle8_apply(data: bytes, buf) -> None:
    """Apply ONE RLE8 stream to the reference buffer in place (2-D
    uint8, DIB storage order). Implements the full public opcode set:
    encoded mode (count, index), absolute mode (00, 03..FF, literals,
    word-aligned), end-of-line (00 00), end-of-bitmap (00 01), and the
    delta/motion escape (00 02 dx dy) — pixels the stream skips keep
    the reference content, which is what makes a delta frame a delta
    frame."""
    import numpy as np

    h, w = buf.shape
    x = y = pos = 0
    n = len(data)
    while pos + 1 < n:
        b0, b1 = data[pos], data[pos + 1]
        pos += 2
        if b0 > 0:  # encoded mode
            if y >= h or x + b0 > w:
                raise ValueError("decode_media: RLE8 run overflows row")
            buf[y, x : x + b0] = b1
            x += b0
        elif b1 == 0:  # end of line
            x, y = 0, y + 1
            if y > h:
                raise ValueError("decode_media: RLE8 ran past last row")
        elif b1 == 1:  # end of bitmap
            return
        elif b1 == 2:  # delta: skip right dx, forward dy rows
            if pos + 2 > n:
                raise ValueError("decode_media: truncated RLE8 delta")
            x += data[pos]
            y += data[pos + 1]
            pos += 2
            if x > w or y > h:
                raise ValueError("decode_media: RLE8 delta out of frame")
        else:  # absolute mode: b1 literal indices, word-aligned
            if pos + b1 > n:
                raise ValueError("decode_media: truncated RLE8 literals")
            if y >= h or x + b1 > w:
                raise ValueError("decode_media: RLE8 literals overflow")
            buf[y, x : x + b1] = np.frombuffer(
                data, dtype=np.uint8, count=b1, offset=pos
            )
            x += b1
            pos += b1 + (b1 & 1)
    raise ValueError("decode_media: RLE8 stream missing end-of-bitmap")


def _encode_avi_rle8(data: bytes) -> bytes:
    """REAL INTER-FRAME-compressed AVI: the payload splits into 16x16
    8-bit frames; frame 0 is an RLE8 KEYFRAME and every later frame an
    RLE8 DELTA against its predecessor (_rle8_encode_frame) — only
    changed pixels are coded, unchanged spans ride the 00 02 motion
    escape. Container: the same RIFF box tree as the MJPEG twin but
    with fccHandler 'MRLE', an 8-bit BITMAPINFOHEADER with
    biCompression = BI_RLE8 and the 256-entry identity greyscale
    RGBQUAD palette, and an idx1 whose AVIIF_KEYFRAME flag marks ONLY
    frame 0 — a decoder seeking mid-stream must rewind to it, the
    defining property of inter-frame coding. Frames are stored
    bottom-up (DIB row order): the encoder flips, the decoder flips
    back. Unlike MJPEG this codec is LOSSLESS — decode recovers the
    padded payload bytes exactly, which the registered query's oracle
    checks via a full byte-sum."""
    import struct

    import numpy as np

    n = max(1, -(-len(data) // _AVI_FRAME_BYTES))
    body = data.ljust(n * _AVI_FRAME_BYTES, b"\x00")
    frames_px = [
        np.frombuffer(
            body, np.uint8, _AVI_FRAME_BYTES, i * _AVI_FRAME_BYTES
        ).reshape(AVI_H, AVI_W)[::-1]  # top-down payload -> bottom-up DIB
        for i in range(n)
    ]
    streams = [
        _rle8_encode_frame(fr, frames_px[i - 1] if i else None)
        for i, fr in enumerate(frames_px)
    ]

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    avih = struct.pack(
        "<14I",
        _AVI_US_PER_FRAME,
        _AVI_FRAME_BYTES * 25,
        0,
        0x10,  # AVIF_HASINDEX
        n,
        0,
        1,
        0,
        AVI_W,
        AVI_H,
        0, 0, 0, 0,
    )
    strh = (
        b"vids"
        + b"MRLE"
        + struct.pack(
            "<IHHIIIIIIII", 0, 0, 0, 0, 1, 25, 0, n, 0, 0xFFFFFFFF, 0
        )
        + struct.pack("<hhhh", 0, 0, AVI_W, AVI_H)
    )
    palette = b"".join(
        bytes((i, i, i, 0)) for i in range(256)
    )  # identity greyscale RGBQUADs (B, G, R, reserved)
    strf = (
        struct.pack(
            "<IiiHHIIiiII",
            40,
            AVI_W,
            AVI_H,
            1,
            8,  # biBitCount: palettized 8-bit
            _BI_RLE8,  # biCompression
            _AVI_FRAME_BYTES,
            0,
            0,
            256,  # biClrUsed
            0,
        )
        + palette
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", s) for s in streams))
    idx, off = [], 4
    for i, s in enumerate(streams):
        flag = 0x10 if i == 0 else 0  # only the keyframe seeks
        idx.append(b"00dc" + struct.pack("<III", flag, off, len(s)))
        off += 8 + len(s) + (len(s) & 1)
    idx1 = chunk(b"idx1", b"".join(idx))
    riff_payload = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def frame_energy(
    df: DataFrame, id_col: str, frame_samples: int = 200
) -> DataFrame:
    """Windowed audio feature extraction — per-frame signal energy
    over DECODED PCM samples: decode each WAV payload (real RIFF
    parse), split the int16 sample stream into fixed frames, and emit
    (id_col, frame_idx, n_samples, energy) with energy = sum of
    squared samples — exact int64 (|s| < 2^15 -> s^2 < 2^30, *200
    < 2^38). The standard first stage of audio fingerprinting / VAD.
    Arrow-batched mapInPandas, payload-local, no shuffle; at 100 TB
    the frame rows stream out partition-local and any downstream
    aggregation is the first exchange."""
    import numpy as np

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_type}, frame_idx long, n_samples long, "
        "energy long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, fidx, ns, en = [], [], [], []
            for rid, payload, m in zip(
                pdf[id_col], pdf["blob"], pdf["media_meta"]
            ):
                samples, _ = decode_media(bytes(payload), m["format"])
                for f in range(-(-len(samples) // frame_samples)):
                    chunk = samples[
                        f * frame_samples : (f + 1) * frame_samples
                    ]
                    ids.append(rid)
                    fidx.append(f)
                    ns.append(len(chunk))
                    en.append(int((chunk * chunk).sum()))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids),
                    "frame_idx": pd.Series(fidx, dtype="int64"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "energy": pd.Series(en, dtype="int64"),
                }
            )

    return df.mapInPandas(run, schema=out_schema)


def curate_features(
    df: DataFrame,
    id_col: str,
    target_bytes: int = 256,
    with_format: bool = False,
) -> DataFrame:
    """FUSED resize -> transcode -> decode -> featurize in ONE
    Arrow-batched mapInPandas stage: byte-identical to
    `decode_features(transcode(resize_payload(df, target_bytes)),
    fake=None, normalize=False)` (asserted by test), but the payload
    bytes cross the JVM<->Python boundary ONCE instead of three
    times. At 100 TB the three-stage composition Arrow-serializes
    every payload three times and runs three Python worker pipelines;
    a curation DAG that knows its stages ahead of time fuses them —
    the same reasoning as whole-stage codegen, applied to the Python
    seam. Emits (id_col, n_bytes, n_samples, features ARRAY<BIGINT>)
    where n_bytes is the ENCODED container size of the resized
    payload; with_format=True additionally passes the row's format
    tag through (it is already in the Python worker's hands — a
    caller grouping by format afterwards saves the join back to the
    metadata relation, i.e. one whole exchange of the feature
    rows)."""
    import numpy as np

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_type}, n_bytes long, n_samples long, "
        "features array<bigint>"
    )
    if with_format:
        out_schema += ", format string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats, sizes, counts, fmts = [], [], [], []
            for payload, m in zip(pdf["blob"], pdf["media_meta"]):
                raw = bytes(payload)[:target_bytes]  # resize
                fmt = m["format"]
                enc = encode_media(raw, fmt)  # transcode
                samples, _ = decode_media(enc, fmt)  # decode
                if fmt == "audio/wav":
                    bins = (samples + 32768) >> 12
                else:
                    bins = samples >> 4
                hist = np.bincount(bins, minlength=N_FEATURE_BINS)
                feats.append(hist.astype(np.int64))
                sizes.append(len(enc))
                counts.append(len(bins))
                fmts.append(fmt)
            out = {
                id_col: pdf[id_col],
                "n_bytes": pd.Series(sizes, dtype="int64"),
                "n_samples": pd.Series(counts, dtype="int64"),
                "features": feats,
            }
            if with_format:
                out["format"] = fmts
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=out_schema)


def transcode(df: DataFrame, id_col: str) -> DataFrame:
    """Wrap raw payload bytes into a real container per the row's
    format tag, re-deriving metadata from the ENCODED payload (real
    n_bytes; real frame count for video, 1 otherwise). Arrow-batched
    mapInPandas, payload-local, no shuffle — the ingest step that makes
    downstream `decode_features(fake=None)` a genuine codec path."""
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_type}, blob binary, "
        "media_meta struct<format:string,n_bytes:bigint,n_frames:bigint>"
    )

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            blobs, meta = [], []
            for raw, m in zip(pdf["blob"], pdf["media_meta"]):
                fmt = m["format"]
                enc = encode_media(bytes(raw), fmt)
                if fmt == "video/y4m":
                    n_frames = max(
                        1, -(-len(bytes(raw)) // _Y4M_FRAME_BYTES)
                    )
                elif fmt in ("video/avi", "video/mrle"):
                    n_frames = max(
                        1, -(-len(bytes(raw)) // _AVI_FRAME_BYTES)
                    )
                else:
                    n_frames = 1
                blobs.append(enc)
                meta.append(
                    {
                        "format": fmt,
                        "n_bytes": len(enc),
                        "n_frames": n_frames,
                    }
                )
            yield pd.DataFrame(
                {id_col: pdf[id_col], "blob": blobs, "media_meta": meta}
            )

    return df.mapInPandas(run, schema=out_schema)


def resize_payload(
    df: DataFrame, id_col: str, target_bytes: int = 256, fake: str = "truncate"
) -> DataFrame:
    """Resize/downsample payloads to a byte budget, updating metadata:
    (id_col, blob BINARY, media_meta STRUCT<...>) with n_bytes <=
    target_bytes and n_frames rederived.

    Same mapInPandas seam as decode_features: `fake='truncate'` is the
    deterministic stand-in codec (byte-truncate — a real pipeline swaps
    in PIL resize / audio downsample behind `fake=None`, which raises
    the gated STUB). Runs payload-local, no shuffle; output partition
    sizes shrink to the byte budget, which is the operator's point at
    100 TB (decode-and-shrink early, ship small bytes downstream)."""
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_type}, blob binary, "
        "media_meta struct<format:string,n_bytes:bigint,n_frames:bigint>"
    )

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if fake is None:
                raise ValueError(
                    "resize_payload: no real resize codec is shipped "
                    "for format "
                    f"{pdf['media_meta'].iloc[0]['format']!r}; use "
                    "fake='truncate' (a production cluster links "
                    "PIL/ffmpeg resampling at this seam)"
                )
            blobs = [bytes(b)[:target_bytes] for b in pdf["blob"]]
            meta = [
                {
                    "format": m["format"],
                    "n_bytes": len(b),
                    "n_frames": (len(b) % MAX_FRAMES) + 1,
                }
                for m, b in zip(pdf["media_meta"], blobs)
            ]
            yield pd.DataFrame(
                {id_col: pdf[id_col], "blob": blobs, "media_meta": meta}
            )

    return df.mapInPandas(run, schema=out_schema)


def decode_features(
    df: DataFrame,
    id_col: str,
    fake: str | None = "histogram",
    normalize: bool = True,
) -> DataFrame:
    """Decode payloads and emit fixed-width features: (id_col, n_bytes
    LONG, n_samples LONG, features ARRAY<DOUBLE> of N_FEATURE_BINS —
    or ARRAY<BIGINT> of raw bin COUNTS with normalize=False).

    Arrow-batched `mapInPandas`: payload bytes cross into Python once
    per batch, features come back columnar.

    - `fake=None` — the REAL path: `decode_media` parses the actual
      container (PPM/WAV/Y4M/PNG header + payload) and the histogram
      is over DECODED pixel/sample values: uint8 formats bin by value
      >> 4; WAV int16 samples bin by (s + 32768) >> 12. Formats with
      no shipped codec (mp4/h264-class) raise ValueError.
    - `fake='histogram'` — byte histogram of the raw payload, no
      container parsing (works on any bytes).

    Both paths are exact-deterministic: integer binning, and with
    normalize=False the output is pure int64 — the representation an
    external engine can reproduce bit-for-bit (the registered query's
    oracle route); normalize=True adds one float divide per bin."""
    import numpy as np

    id_type = df.schema[id_col].dataType.simpleString()
    feat_type = "array<double>" if normalize else "array<bigint>"
    out_schema = (
        f"{id_col} {id_type}, n_bytes long, n_samples long, "
        f"features {feat_type}"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats, sizes, counts = [], [], []
            for payload, m in zip(pdf["blob"], pdf["media_meta"]):
                buf = bytes(payload)
                if fake is None:
                    samples, _info = decode_media(buf, m["format"])
                    if m["format"] == "audio/wav":
                        bins = (samples + 32768) >> 12
                    else:
                        bins = samples >> 4
                else:
                    bins = np.frombuffer(buf, dtype=np.uint8) >> 4
                hist = np.bincount(bins, minlength=N_FEATURE_BINS)
                if normalize:
                    hist = hist.astype(np.float64)
                    total = hist.sum()
                    feats.append(hist / total if total else hist)
                else:
                    feats.append(hist.astype(np.int64))
                sizes.append(len(buf))
                counts.append(len(bins))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "n_samples": pd.Series(counts, dtype="int64"),
                    "features": feats,
                }
            )

    return df.mapInPandas(run, schema=out_schema)


def imghash_arrow(df: DataFrame, id_col: str) -> DataFrame:
    """Perceptual AVERAGE-HASH over decoded image pixels — the
    image-side sibling of the text SimHash tier: decode the container
    (real codec path, `decode_media`), take the first 64 decoded
    pixel bytes as the sample grid (zero-padded past the payload,
    matching the container's own padding), threshold each cell
    against the grid's integer mean, and pack the 64 bits as two
    32-bit halves (h1 = cells 0-31, h2 = 32-63; split exactly like
    dedup_simhash so the DuckDB twin never touches the int64 sign
    bit). Returns (id_col, h1 LONG, h2 LONG).

    Arrow-batched mapInPandas, payload-local, no shuffle; integer
    mean (sum div 64) keeps the threshold — and therefore every bit —
    engine-exact, so a SQL oracle reproduces the hash from hex byte
    pairs. Near-duplicate images differ in few cells, so Hamming
    blocking on the hash finds them without any pairwise pixel
    comparison — at 100 TB the hash is 8 bytes per image vs the
    payload's megabytes, and the pair stage never reopens payloads."""
    import numpy as np

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, h1 long, h2 long"

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            h1s, h2s = [], []
            for payload, m in zip(pdf["blob"], pdf["media_meta"]):
                samples, _info = decode_media(
                    bytes(payload), m["format"]
                )
                grid = np.zeros(64, dtype=np.int64)
                take = min(64, len(samples))
                grid[:take] = samples[:take]
                mean = int(grid.sum()) // 64
                bits = grid > mean
                h1 = sum(1 << i for i in range(32) if bits[i])
                h2 = sum(1 << i for i in range(32) if bits[32 + i])
                h1s.append(h1)
                h2s.append(h2)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "h1": pd.Series(h1s, dtype="int64"),
                    "h2": pd.Series(h2s, dtype="int64"),
                }
            )

    return df.mapInPandas(run, schema=out_schema)
