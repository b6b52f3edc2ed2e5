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

Codecs: four REAL pure-Python coders implement `encode_media` /
`decode_media` — PPM P6 (netpbm images), WAV RIFF PCM16 (audio),
YUV4MPEG2 (raw video), and PNG (a genuinely COMPRESSED format: zlib
DEFLATE IDAT streams, CRC-32-verified chunks, and full scanline
unfiltering for all five PNG filter types incl. Paeth, for 8-bit
grey/grey-alpha/RGB/RGBA). `decode_features(fake=None)` parses
genuine container headers and extracts stats from the decoded
pixel/sample payload. Only formats whose codecs genuinely need
external libraries this container does not ship (jpeg/mp4) remain
behind the import-gated ``NotImplementedError`` STUB
(`_decode_compressed_stub`); the byte-histogram fallback
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
    """
    import struct

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
    raise ValueError(f"encode_media: no encoder for format {fmt!r}")


def decode_media(payload: bytes, fmt: str):
    """REAL pure-Python decoder for the three uncompressed container
    formats: validates magic, parses the actual header fields, and
    returns ``(samples, info)`` — samples an int64 numpy array of
    decoded pixel/sample values, info a dict of parsed geometry.
    Raises ValueError on malformed containers (wrong magic, truncated
    data), NotImplementedError (gated STUB) for compressed formats."""
    import struct

    import numpy as np

    if fmt == "image/png":
        return _decode_png(payload)

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

    return _decode_compressed_stub(fmt)


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


def _decode_compressed_stub(fmt: str):  # pragma: no cover - STUB
    """STUB: the remaining compressed formats (jpeg/mp4/...) genuinely
    need codec libraries this container does not ship; on a production
    cluster this is where PIL / soundfile / pyav load the payload.
    (png no longer routes here — `_decode_png` is a real pure-Python
    DEFLATE-based decoder.)"""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "STUB: jpeg/mp4 codecs (PIL/soundfile/pyav) are not "
            f"installed in this environment (format {fmt!r}); "
            "ppm/wav/y4m/png decode natively via decode_media"
        ) from exc
    raise NotImplementedError("STUB: compressed decode path not wired yet")


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
                _decode_compressed_stub(
                    pdf["media_meta"].iloc[0]["format"]
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
      >> 4; WAV int16 samples bin by (s + 32768) >> 12. jpeg/mp4 hit
      the gated STUB.
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
