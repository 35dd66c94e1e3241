"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Treats media exactly the way a 100 TB training-data pipeline must: the
bytes stay an opaque ``binary`` column from scan to sink, metadata is a
typed struct, and every per-item transform is an Arrow-batched
``mapInPandas`` stage (bytes never round-trip through Python row objects).

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so the
decode step is isolated behind ``_decode_image_impl``/``_decode_audio_impl``:
- by default they raise ``NotImplementedError`` with the dependency named,
- tests/bench inject ``fake=True`` which derives a deterministic payload
  from the bytes (blake2b-seeded) so the Spark-side plumbing — schemas,
  batch shapes, partitioning, null handling — runs for real end to end.

Operators:
- ``media_metadata``: header sniffing (magic numbers) — pure pandas/bytes,
  no codec needed; real, not stubbed.
- ``decode_and_featurize_images``: bytes -> (width, height, channels,
  mean_pixel, phash64)
- ``resize_images``: bytes -> resized bytes (+ new dims)
- ``sample_video_frames``: bytes -> exploded frame rows (frame_idx, bytes)
- ``audio_features``: bytes -> (sample_rate, n_samples, rms) rows
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# header sniffing (real — no codec required)
# ---------------------------------------------------------------------------

_MAGIC = [
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "riff"),  # wav/avi/webp -> refined below
    (b"fLaC", "audio/flac"),
    (b"ID3", "audio/mpeg"),
    (b"OggS", "audio/ogg"),
    (b"\x00\x00\x00", "video/mp4?"),  # ftyp probe below
]


def _sniff(b: bytes) -> str:
    if b is None:
        return None
    if len(b) >= 12 and b[:4] == b"RIFF":
        tag = b[8:12]
        return {b"WAVE": "audio/wav", b"AVI ": "video/avi", b"WEBP": "image/webp"}.get(
            tag, "application/riff"
        )
    if len(b) >= 12 and b[4:8] == b"ftyp":
        return "video/mp4"
    for magic, mime in _MAGIC:
        if b.startswith(magic):
            return mime if mime != "video/mp4?" else "application/octet-stream"
    return "application/octet-stream"


def media_metadata(df: DataFrame, bytes_col: str = "media") -> DataFrame:
    """Adds a typed metadata struct: (mime, n_bytes, digest)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raw = pdf[bytes_col]
            pdf = pdf.copy()
            pdf["mime"] = [None if b is None else _sniff(bytes(b)) for b in raw]
            pdf["n_bytes"] = [None if b is None else len(b) for b in raw]
            pdf["digest"] = [
                None if b is None else hashlib.blake2b(bytes(b), digest_size=16).hexdigest()
                for b in raw
            ]
            yield pdf

    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + ["mime string", "n_bytes bigint", "digest string"]
    )
    return df.mapInPandas(gen, schema=schema)


# ---------------------------------------------------------------------------
# codec boundary (stubbed; deterministic fake for tests)
# ---------------------------------------------------------------------------

def _rng_from_bytes(b: bytes) -> np.random.Generator:
    seed = int.from_bytes(hashlib.blake2b(b, digest_size=8).digest(), "big")
    return np.random.default_rng(seed)


def _decode_ppm(b: bytes) -> np.ndarray:
    """REAL decode of binary PPM (P6): ASCII header (width height maxval)
    then raw RGB bytes — pure numpy, no external codec."""
    assert b[:2] == b"P6", "not a P6 PPM"
    # header tokens may be separated by arbitrary whitespace/comments
    tokens, i = [], 2
    while len(tokens) < 3:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if b[i : i + 1] == b"#":  # comment to end of line
            while i < len(b) and b[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        tokens.append(int(b[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = tokens
    assert maxval == 255, f"only 8-bit PPM supported (maxval={maxval})"
    data = np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=i)
    return data.reshape(h, w, 3)


def _decode_wav_pcm16(b: bytes) -> tuple:
    """REAL decode of RIFF/WAVE PCM16 mono/stereo: chunk walk + frombuffer."""
    import struct

    assert b[:4] == b"RIFF" and b[8:12] == b"WAVE", "not a WAV"
    i, sr, n_ch, bits, data = 12, None, None, None, None
    while i + 8 <= len(b):
        cid, size = b[i : i + 4], struct.unpack("<I", b[i + 4 : i + 8])[0]
        body = b[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt, n_ch, sr = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            assert fmt == 1 and bits == 16, "only PCM16 supported"
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)
    assert sr and data is not None, "missing fmt/data chunk"
    samples = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    if n_ch and n_ch > 1:
        samples = samples.reshape(-1, n_ch).mean(axis=1)
    return sr, samples


def _decode_image_impl(b: bytes, fake: bool) -> np.ndarray:
    """bytes -> HxWxC uint8 array.

    REAL for uncompressed formats (P6 PPM — numpy-only parse); compressed
    formats (PNG/JPEG/...) need PIL/cv2, absent from this container, so
    they raise unless ``fake`` (deterministic blake2b-seeded stand-in that
    keeps the Spark-side plumbing honest)."""
    if b[:2] == b"P6":
        return _decode_ppm(b)
    if not fake:
        raise NotImplementedError(
            "compressed image decode requires PIL or cv2 (not available in "
            "this environment); P6 PPM decodes natively, or pass fake=True"
        )
    rng = _rng_from_bytes(b)
    h, w = int(rng.integers(8, 33)), int(rng.integers(8, 33))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _decode_audio_impl(b: bytes, fake: bool) -> tuple:
    """bytes -> (sample_rate, float32 samples). REAL for RIFF/WAVE PCM16;
    compressed audio (mp3/ogg/flac) needs soundfile/librosa."""
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        try:
            return _decode_wav_pcm16(b)
        except Exception:
            if not fake:  # malformed WAV is a data error, not a codec gap
                raise
    if not fake:
        raise NotImplementedError(
            "compressed audio decode requires soundfile/librosa (not "
            "available); WAV PCM16 decodes natively, or pass fake=True"
        )
    rng = _rng_from_bytes(b)
    n = int(rng.integers(1000, 4000))
    return 16000, rng.standard_normal(n).astype(np.float32)


# ---------------------------------------------------------------------------
# transforms (Arrow-batched; plumbing real regardless of codec)
# ---------------------------------------------------------------------------

def decode_and_featurize_images(
    df: DataFrame, bytes_col: str = "media", id_col: str = "media_id", fake: bool = False
) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, cs, means, phs = [], [], [], [], [], []
            for i, b in zip(pdf[id_col], pdf[bytes_col]):
                if b is None:
                    continue
                img = _decode_image_impl(bytes(b), fake)
                ids.append(i)
                hs.append(img.shape[0])
                ws.append(img.shape[1])
                cs.append(img.shape[2])
                means.append(float(img.mean()))
                # 64-bit average-hash: 8x8 downsample of the gray image
                gray = img.mean(axis=2)
                yi = np.linspace(0, gray.shape[0] - 1, 8).astype(int)
                xi = np.linspace(0, gray.shape[1] - 1, 8).astype(int)
                small = gray[np.ix_(yi, xi)]
                bits = (small > small.mean()).flatten()
                phs.append(int("".join("1" if x else "0" for x in bits), 2) - (1 << 63))
            yield pd.DataFrame(
                {id_col: ids, "width": ws, "height": hs, "channels": cs,
                 "mean_pixel": means, "phash64": phs}
            )

    return df.mapInPandas(
        gen,
        schema=f"{id_col} long, width int, height int, channels int, "
        "mean_pixel double, phash64 long",
    )


def sample_video_frames(
    df: DataFrame,
    bytes_col: str = "media",
    id_col: str = "media_id",
    every_n: int = 5,
    fake: bool = False,
) -> DataFrame:
    """Explode each video into sampled frame rows (frame_idx, frame_png).

    The fake codec emits deterministic per-frame payloads; the real one
    would wrap ffmpeg. Either way the output is again (id, idx, binary) —
    composable with decode_and_featurize_images downstream.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, b in zip(pdf[id_col], pdf[bytes_col]):
                if b is None:
                    continue
                if not fake:
                    raise NotImplementedError("video decode requires ffmpeg; pass fake=True")
                rng = _rng_from_bytes(bytes(b))
                n_frames = int(rng.integers(10, 40))
                for k in range(0, n_frames, every_n):
                    ids.append(i)
                    idxs.append(k)
                    frames.append(
                        hashlib.blake2b(bytes(b) + k.to_bytes(4, "big"), digest_size=32).digest()
                    )
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame_bytes": frames})

    return df.mapInPandas(gen, schema=f"{id_col} long, frame_idx int, frame_bytes binary")


def audio_features(
    df: DataFrame, bytes_col: str = "media", id_col: str = "media_id", fake: bool = False
) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, srs, ns, rms = [], [], [], []
            for i, b in zip(pdf[id_col], pdf[bytes_col]):
                if b is None:
                    continue
                sr, samples = _decode_audio_impl(bytes(b), fake)
                ids.append(i)
                srs.append(sr)
                ns.append(len(samples))
                rms.append(float(np.sqrt(np.mean(samples**2))))
            yield pd.DataFrame(
                {id_col: ids, "sample_rate": srs, "n_samples": ns, "rms": rms}
            )

    return df.mapInPandas(
        gen, schema=f"{id_col} long, sample_rate int, n_samples long, rms double"
    )


def _encode_ppm(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    bytes_col: str = "media",
    id_col: str = "media_id",
    fake: bool = False,
) -> DataFrame:
    """bytes -> resized bytes (+ new dims). REAL end-to-end for P6 PPM
    (numpy nearest-neighbor resample, PPM back out); other formats decode
    through the same codec boundary as decode_and_featurize_images and
    re-encode as PPM (the uncompressed interchange format of this
    pipeline). Arrow-batched mapInPandas — bytes never row-ify."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, outs = [], []
            for i, b in zip(pdf[id_col], pdf[bytes_col]):
                if b is None:
                    continue
                img = _decode_image_impl(bytes(b), fake)
                yi = np.linspace(0, img.shape[0] - 1, height).round().astype(int)
                xi = np.linspace(0, img.shape[1] - 1, width).round().astype(int)
                ids.append(i)
                outs.append(_encode_ppm(img[np.ix_(yi, xi)]))
            yield pd.DataFrame(
                {id_col: ids, "media": outs,
                 "width": [width] * len(ids), "height": [height] * len(ids)}
            )

    return df.mapInPandas(
        gen, schema=f"{id_col} long, media binary, width int, height int"
    )
