"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The decode kernels themselves (image/audio/video libs) are NOT in this
environment, so the decode step is stubbed behind a deterministic fake
(or ``NotImplementedError`` when ``strict=True``) — but the Ray-side
plumbing is real and tested: actor-pool stage, small batches for wide
binary rows, fixed output schema, zero-copy Arrow in/out.

Column convention::

    media:  <id>, payload: binary, media_type: string ("image"|"audio"|...)
    features out: +byte_len:int64, content_hash:uint64,
                  width:int32, height:int32, n_frames:int32
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from gencore_ray.functions.hashing import U64, hash_bytes_u64


class MediaDecodeStage:
    """Actor-pool decode/feature stage.

    __init__ is the once-per-actor model/codec load point (ST1
    analogue — the reference loads its genome once per process,
    /root/reference/src/reference.cpp:4-11).  With ``strict=True`` the
    real decoder is required and this stub raises; otherwise features
    are derived deterministically from the payload bytes so the full
    pipeline (schema, batching, actor signature) is exercised.
    """

    OUT_FIELDS = [
        ("byte_len", pa.int64()),
        ("content_hash", pa.uint64()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
    ]

    def __init__(self, payload_col: str = "payload", strict: bool = False, seed: int = 42):
        self.payload_col = payload_col
        self.strict = strict
        self.seed = seed
        if strict:
            raise NotImplementedError(
                "real media decoding requires image/audio codecs not present "
                "in this environment; run with strict=False for the "
                "deterministic fake-feature path"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        n = len(payloads)
        byte_len = np.fromiter((len(p or b"") for p in payloads), dtype=np.int64, count=n)
        chash = np.fromiter(
            (hash_bytes_u64(p or b"", seed=self.seed) for p in payloads),
            dtype=U64, count=n,
        )
        # deterministic fake decode: dimensions derived from the hash
        width = (chash % np.uint64(1920)).astype(np.int32) + 1
        height = ((chash >> np.uint64(16)) % np.uint64(1080)).astype(np.int32) + 1
        n_frames = ((chash >> np.uint64(32)) % np.uint64(240)).astype(np.int32) + 1
        for name, arr in zip(
            [f[0] for f in self.OUT_FIELDS],
            [byte_len, chash, width, height, n_frames],
        ):
            batch = batch.append_column(name, pa.array(arr))
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
