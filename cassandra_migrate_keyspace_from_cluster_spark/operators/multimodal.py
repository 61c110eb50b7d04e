"""Multimodal column handling (SURVEY.md Part F / task mandate).

Model: media ride along as opaque ``binary`` columns with typed
metadata (mime, byte length); decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` so the heavy per-item work is vectorized
per partition and never leaves executor memory as Python rows.

The image/audio libraries are not in this container, so the real
decoders are STUBS (clearly marked, raise NotImplementedError). What IS
real and tested: the Spark-side plumbing — binary encoding, schema,
partitioning, the mapInPandas batch iterator shape — plus a
deterministic fake feature extractor that the DuckDB oracle reproduces,
so the whole path is hash-checked end-to-end (f17).
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


# --- real decoders: stubs until the media libs are available ------------


def decode_image(payload: bytes, mime: str):  # pragma: no cover - stub
    """STUB: decode an image payload to HxWxC array (needs Pillow)."""
    raise NotImplementedError(
        "image decode requires Pillow/opencv, not present in this "
        "container; wire it into extract_features' batch loop"
    )


def sample_video_frames(payload: bytes, every_n: int = 30):  # pragma: no cover
    """STUB: frame sampling (needs pyav/ffmpeg)."""
    raise NotImplementedError("video decode requires pyav/ffmpeg")


def decode_audio(payload: bytes):  # pragma: no cover - stub
    """STUB: audio to waveform (needs soundfile/librosa)."""
    raise NotImplementedError("audio decode requires soundfile/librosa")
