"""Multimodal columns (B54 + driver mandate): image/audio/video as
opaque ``binary`` payloads with typed metadata, processed by
Arrow-batched ``mapInPandas`` stages.

The real decode libraries (PIL/torchaudio/ffmpeg) are not in this
container, so the codec layer is split:

- ``FakeImageCodec`` — a deterministic toy format (header + dims +
  uint8 pixels) that makes every pipeline stage REAL and testable:
  encode, decode, feature-extract, resize, frame-sample all do actual
  byte work with verifiable roundtrips.
- ``decode_real_image`` — the PIL-backed path, import-gated; raises
  NotImplementedError with a clear message when PIL is absent.

What matters at 100 TB is the Spark-side shape, which is identical for
either codec: binary column + metadata struct scanned columnar,
``mapInPandas`` receives Arrow record batches (bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``), output schema is
declared up front, and nothing ever collects to the driver.
"""

from __future__ import annotations

import hashlib
import math
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = b"FIMG"
MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, n_frames int"
)


class FakeImageCodec:
    """Deterministic toy image/video codec: MAGIC | H | W | F | pixels,
    pixels = F frames of H*W uint8.

    Pixel content is the house md5 byte scheme (byte ``16*b+j`` of item
    ``i`` = byte ``j`` of ``md5(f"{i}:{b}")``) — the same
    engine-portable trick as ``simhash_md5``/``hll_registers`` — so a
    SQL engine can regenerate every pixel from ``(media_id, position)``
    without executing the codec.  That is what upgrades
    ``q_media_features`` from rows-only to a value-exact DuckDB oracle
    (VERDICT r12 #7): the whole encode → binary column → Arrow decode →
    stats path is differentially checked against a from-first-principles
    SQL replay."""

    @staticmethod
    def content(media_id: int, n: int) -> np.ndarray:
        """n deterministic uint8 content bytes for one item."""
        blocks = (n + 15) // 16
        buf = b"".join(
            hashlib.md5(f"{media_id}:{b}".encode()).digest() for b in range(blocks)
        )
        return np.frombuffer(buf[:n], dtype=np.uint8)

    @staticmethod
    def encode(media_id: int, width: int, height: int, n_frames: int = 1) -> bytes:
        pixels = FakeImageCodec.content(media_id, height * width * n_frames)
        return MAGIC + struct.pack("<III", height, width, n_frames) + pixels.tobytes()

    @staticmethod
    def decode(payload: bytes) -> np.ndarray:
        if payload[:4] != MAGIC:
            raise ValueError("not a FIMG payload")
        h, w, f = struct.unpack("<III", payload[4:16])
        return np.frombuffer(payload[16:], dtype=np.uint8).reshape(f, h, w)


def decode_real_image(payload: bytes):
    """The production decode path — gated on the codec library."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - PIL absent in this env
        raise NotImplementedError(
            "real image decode requires PIL; this environment ships none — "
            "use FakeImageCodec for pipeline testing"
        ) from e
    import io

    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(payload)))  # pragma: no cover


def fake_media_table(spark, n: int = 200, frames_for_video: int = 8) -> DataFrame:
    """Deterministic media corpus: ids 0..n-1, alternating image/video,
    sizes derived from the id. Built distributed (spark.range → encode
    in mapInPandas): the driver never holds the payload bytes."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].astype(int)
            rows = []
            for i in ids:
                kind = "video" if i % 3 == 0 else "image"
                h, w = 16 + (i % 5) * 8, 16 + (i % 7) * 8
                f = frames_for_video if kind == "video" else 1
                rows.append(
                    {"media_id": i, "kind": kind,
                     "payload": FakeImageCodec.encode(i, w, h, f),
                     "width": w, "height": h, "n_frames": f}
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """Decode + per-item pixel statistics (the 'embedding extraction'
    stage shape). Arrow batches in, Arrow batches out."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for _, r in b.iterrows():
                px = FakeImageCodec.decode(r["payload"]).astype(np.int64).ravel()
                # Exact integer moments, then ONE division each: both
                # sums are exact int64 (<= 255^2 * n < 2^53), so the
                # resulting doubles are a pure function of the bytes —
                # a SQL engine replaying sum/sum-of-squares computes
                # bit-identical mean/std (what makes the oracle
                # value-exact; np.mean/np.std would round differently).
                n = px.size
                s1, s2 = int(px.sum()), int((px * px).sum())
                mean = s1 / n
                std = math.sqrt(max(s2 / n - mean * mean, 0.0))
                out.append(
                    {"media_id": r["media_id"], "kind": r["kind"],
                     "mean_px": mean, "std_px": std,
                     "n_bytes": int(len(r["payload"]))}
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(
        feats, schema="media_id long, kind string, mean_px double, std_px double, n_bytes long"
    )


def resize_half(media: DataFrame) -> DataFrame:
    """2× downsample every frame (stride sampling — real byte work on
    the fake format; swap the inner two lines for PIL.resize in prod)."""

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for _, r in b.iterrows():
                px = FakeImageCodec.decode(r["payload"])
                small = px[:, ::2, ::2]
                f, h, w = small.shape
                rows.append(
                    {"media_id": r["media_id"], "kind": r["kind"],
                     "payload": MAGIC + struct.pack("<III", h, w, f) + small.tobytes(),
                     "width": w, "height": h, "n_frames": f}
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(rs, schema=MEDIA_SCHEMA)


def _bilinear(frame: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Pure-numpy bilinear interpolation of one (H, W) uint8 frame —
    the real resampling math (PIL.Image.resize(BILINEAR) equivalent,
    align_corners=False convention), not a toy stride sample."""
    h, w = frame.shape
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0, 1)[:, None]
    wx = np.clip(xs - x0, 0, 1)[None, :]
    f = frame.astype(np.float64)
    top = f[y0][:, x0] * (1 - wx) + f[y0][:, x1] * wx
    bot = f[y1][:, x0] * (1 - wx) + f[y1][:, x1] * wx
    return np.clip(np.round(top * (1 - wy) + bot * wy), 0, 255).astype(np.uint8)


def resize_bilinear(media: DataFrame, out_h: int = 16, out_w: int = 16) -> DataFrame:
    """Resize every frame to (out_h, out_w) with true bilinear
    interpolation — the normalization step before patch embedding.
    Same Arrow-batched mapInPandas shape as the other stages."""

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for _, r in b.iterrows():
                px = FakeImageCodec.decode(r["payload"])
                small = np.stack([_bilinear(fr, out_h, out_w) for fr in px])
                f, h, w = small.shape
                rows.append(
                    {"media_id": r["media_id"], "kind": r["kind"],
                     "payload": MAGIC + struct.pack("<III", h, w, f) + small.tobytes(),
                     "width": w, "height": h, "n_frames": f}
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(rs, schema=MEDIA_SCHEMA)


def patch_embeddings(media: DataFrame, side: int = 16, patch: int = 4) -> DataFrame:
    """ViT-style patch embedding without a model: bilinear-resize each
    item's FIRST frame to (side, side), split into (side/patch)² patches
    of patch×patch pixels, embed as normalized per-patch means. Output
    (media_id, kind, embedding array<float>) plugs straight into the
    similarity operators (cosine top-k, IVF, near-dup pairing) — the
    media→vector bridge of a multimodal corpus pipeline."""
    n_patches = (side // patch) ** 2

    def pe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for _, r in b.iterrows():
                px = FakeImageCodec.decode(r["payload"])[0]  # first frame
                sm = _bilinear(px, side, side).astype(np.float64)
                g = side // patch
                # (g, patch, g, patch) -> per-patch means, row-major
                means = sm.reshape(g, patch, g, patch).mean(axis=(1, 3)).ravel()
                means = (means - means.mean()) / (means.std() or 1.0)
                rows.append(
                    {"media_id": r["media_id"], "kind": r["kind"],
                     "embedding": [float(x) for x in means]}
                )
            yield pd.DataFrame(rows)

    out = media.mapInPandas(
        pe, schema="media_id long, kind string, embedding array<float>"
    )
    assert n_patches > 0
    return out


def sample_frames(media: DataFrame, every: int = 4) -> DataFrame:
    """Keep every k-th frame of video payloads (images pass through)."""

    def sf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for _, r in b.iterrows():
                px = FakeImageCodec.decode(r["payload"])
                kept = px[::every] if r["kind"] == "video" else px
                f, h, w = kept.shape
                rows.append(
                    {"media_id": r["media_id"], "kind": r["kind"],
                     "payload": MAGIC + struct.pack("<III", h, w, f) + kept.tobytes(),
                     "width": w, "height": h, "n_frames": f}
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(sf, schema=MEDIA_SCHEMA)


AUDIO_MAGIC = b"FAUD"
AUDIO_SCHEMA = "media_id long, sample_rate int, n_samples int, payload binary"


class FakeAudioCodec:
    """Deterministic toy audio: MAGIC | rate | n | int16 PCM samples.

    The waveform is pure integer math — a ±16384 square tone at
    ``200 + (id % 20) * 50`` Hz (phase accumulator
    ``(pos * 2 * freq) // rate``) plus an md5-dither in ±1024 (byte
    scheme of :class:`FakeImageCodec`, id-space offset by 7_000_000) —
    so a SQL engine can regenerate every sample from
    ``(media_id, position)`` and the audio family is value-exact
    oracle-checkable (VERDICT r12 #7) while keeping the tone-like shape
    the zero-crossing feature needs.  |pcm| ∈ [15360, 17408]: never
    zero, so crossings == tone sign flips, and dither can't flip sign."""

    @staticmethod
    def encode(media_id: int, sample_rate: int = 16000, seconds: float = 0.25) -> bytes:
        n = int(sample_rate * seconds)
        freq = 200 + (media_id % 20) * 50
        pos = np.arange(n, dtype=np.int64)
        phase = (pos * (2 * freq)) // sample_rate
        tone = np.where(phase % 2 == 0, 1, -1).astype(np.int64)
        dither = (
            FakeImageCodec.content(media_id + 7_000_000, n).astype(np.int64) - 128
        )
        pcm = (tone * 16384 + dither * 8).astype(np.int16)
        return AUDIO_MAGIC + struct.pack("<II", sample_rate, n) + pcm.tobytes()

    @staticmethod
    def decode(payload: bytes) -> tuple[int, np.ndarray]:
        if payload[:4] != AUDIO_MAGIC:
            raise ValueError("not a FAUD payload")
        rate, n = struct.unpack("<II", payload[4:12])
        return rate, np.frombuffer(payload[12:], dtype=np.int16)[:n]


def fake_audio_table(spark, n: int = 100) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for i in b["id"].astype(int):
                payload = FakeAudioCodec.encode(i)
                rate, samples = FakeAudioCodec.decode(payload)
                rows.append({"media_id": i, "sample_rate": rate,
                             "n_samples": len(samples), "payload": payload})
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=AUDIO_SCHEMA)


def audio_features(audio: DataFrame) -> DataFrame:
    """Loudness / zero-crossing features per clip (the audio analog of
    extract_features — swap the decode for torchaudio in prod)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for _, r in b.iterrows():
                rate, s = FakeAudioCodec.decode(r["payload"])
                v = s.astype(np.int64)
                # rms over x = pcm/32768 from the exact integer sum of
                # squares: one exact int division target, one sqrt, one
                # power-of-two scale — bit-replayable in SQL (same
                # rationale as extract_features' moments).
                s2 = int((v * v).sum())
                rows.append({
                    "media_id": r["media_id"],
                    "duration_s": len(s) / rate,
                    "rms": math.sqrt(s2 / len(s)) / 32768.0,
                    "zero_crossings": int(((v[:-1] * v[1:]) < 0).sum()),
                })
            yield pd.DataFrame(rows)

    return audio.mapInPandas(
        feats, schema="media_id long, duration_s double, rms double, zero_crossings long"
    )


def resample_audio(audio: DataFrame, target_rate: int = 8000) -> DataFrame:
    """Integer-stride decimation resample (deterministic stand-in for a
    real polyphase resampler)."""

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for _, r in b.iterrows():
                rate, s = FakeAudioCodec.decode(r["payload"])
                stride = max(1, rate // target_rate)
                out = s[::stride]
                new_rate = rate // stride
                rows.append({
                    "media_id": r["media_id"], "sample_rate": new_rate,
                    "n_samples": len(out),
                    "payload": AUDIO_MAGIC + struct.pack("<II", new_rate, len(out)) + out.tobytes(),
                })
            yield pd.DataFrame(rows)

    return audio.mapInPandas(rs, schema=AUDIO_SCHEMA)


def media_with_doc_metadata(media: DataFrame, docs: DataFrame) -> DataFrame:
    """Multimodal join: media ⋈ documents on id (B54) — binary payloads
    flow through the join untouched (columnar, no decode)."""
    return media.join(docs, media.media_id == docs.doc_id).select(
        "media_id", "kind", "width", "height", "n_frames", "lang", "source", "n_chars"
    )
