"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Round 1-2 stubbed the decode kernels (no Pillow/OpenCV/ffmpeg in the
environment).  Round 3 makes the decode REAL for the formats stdlib +
numpy can handle — PNG (full pixel decode incl. all four scanline
filters), BMP, binary PPM/PGM, and WAV PCM — via
``gencore_ray.functions.codecs``.  JPEG/compressed video remain
honestly undecodable here: ``strict=True`` now DECODES supported
payloads and raises only for genuinely unsupported containers, while
the default mode falls back to deterministic hash-derived fake
features for unknown bytes so plumbing tests and synthetic corpora
keep working.

Column convention::

    media:  <id>, payload: binary, media_type: string ("image"|"audio"|...)
    features out: +byte_len:int64, content_hash:uint64, media_kind:string,
                  width:int32, height:int32, n_frames:int32,
                  n_channels:int32, sample_rate:int32, mean_value:float64

``mean_value`` is mean pixel intensity (images) or RMS amplitude
(audio) — a pixel/sample-level statistic, so a wrong filter/unpack
implementation cannot pass its tests by parsing headers alone.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from gencore_ray.functions.codecs import (
    decode_bmp,
    decode_png,
    decode_ppm,
    decode_wav,
    sniff_media,
)
from gencore_ray.functions.hashing import U64, hash_bytes_u64

_IMAGE_DECODERS = {"png": decode_png, "bmp": decode_bmp, "ppm": decode_ppm}


class MediaDecodeStage:
    """Actor-pool decode/feature stage.

    __init__ is the once-per-actor setup point (ST1 analogue — the
    reference loads its genome once per process,
    /root/reference/src/reference.cpp:4-11).  Per payload:

      * sniff the container by magic bytes
      * PNG/BMP/PPM -> real pixel decode -> width/height/channels +
        mean intensity;  WAV -> real PCM decode -> sample_rate/
        channels/frames + RMS
      * unknown container: ``strict=True`` raises ValueError (row-level
        honesty — no silent fake), else deterministic hash-derived
        fake features (plumbing/synthetic-corpus mode)
    """

    OUT_FIELDS = [
        ("byte_len", pa.int64()),
        ("content_hash", pa.uint64()),
        ("media_kind", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
        ("n_channels", pa.int32()),
        ("sample_rate", pa.int32()),
        ("mean_value", pa.float64()),
    ]

    def __init__(self, payload_col: str = "payload", strict: bool = False, seed: int = 42):
        self.payload_col = payload_col
        self.strict = strict
        self.seed = seed

    def _decode_one(self, p: bytes):
        kind = sniff_media(p)
        if kind in _IMAGE_DECODERS:
            m = _IMAGE_DECODERS[kind](p)
            mean = float(m.pixels.mean()) if m.pixels is not None else 0.0
            return kind, m.width, m.height, 1, m.channels, 0, mean
        if kind == "wav":
            a = decode_wav(p)
            rms = float(np.sqrt((a.samples ** 2).mean())) if a.samples is not None and a.samples.size else 0.0
            return kind, 0, 0, a.n_frames, a.n_channels, a.sample_rate, rms
        if self.strict:
            raise ValueError(
                f"unsupported media container (magic {p[:4]!r}); this "
                "environment decodes png/bmp/ppm/wav — jpeg/video need "
                "codecs not present here"
            )
        # deterministic fake features (synthetic corpora / plumbing tests)
        h = int(hash_bytes_u64(p, seed=self.seed))
        return (
            "fake",
            h % 1920 + 1,
            (h >> 16) % 1080 + 1,
            (h >> 32) % 240 + 1,
            3,
            0,
            float(h % 256),
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        n = len(payloads)
        byte_len = np.fromiter((len(p or b"") for p in payloads), dtype=np.int64, count=n)
        chash = np.fromiter(
            (hash_bytes_u64(p or b"", seed=self.seed) for p in payloads),
            dtype=U64, count=n,
        )
        kinds: list[str] = []
        width = np.zeros(n, dtype=np.int32)
        height = np.zeros(n, dtype=np.int32)
        n_frames = np.zeros(n, dtype=np.int32)
        n_channels = np.zeros(n, dtype=np.int32)
        sample_rate = np.zeros(n, dtype=np.int32)
        mean_value = np.zeros(n, dtype=np.float64)
        for i, p in enumerate(payloads):
            k, w, h, nf, nc, sr, mv = self._decode_one(p or b"")
            kinds.append(k)
            width[i], height[i], n_frames[i] = w, h, nf
            n_channels[i], sample_rate[i], mean_value[i] = nc, sr, mv
        for name, arr in zip(
            [f[0] for f in self.OUT_FIELDS],
            [byte_len, chash, pa.array(kinds, pa.string()), width, height,
             n_frames, n_channels, sample_rate, mean_value],
        ):
            batch = batch.append_column(
                name, arr if isinstance(arr, pa.Array) else pa.array(arr)
            )
        return batch.drop_columns([self.payload_col])  # payload never leaves the stage


def decode_media(
    ds: rd.Dataset,
    payload_col: str = "payload",
    batch_size: int = 64,          # wide binary rows -> small batches
    concurrency=(1, 8),
    strict: bool = False,
) -> rd.Dataset:
    return ds.map_batches(
        MediaDecodeStage,
        fn_constructor_kwargs={"payload_col": payload_col, "strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def frame_sample_plan(n_frames: np.ndarray, every: int = 24) -> list[np.ndarray]:
    """Deterministic frame-sampling plan (indices per row) — the part of
    a video pipeline that is pure planning, fully testable."""
    return [np.arange(0, int(nf), every, dtype=np.int64) for nf in n_frames]
