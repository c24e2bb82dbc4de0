"""Multimodal (binary-payload) pipeline plumbing.

Images / audio / video are opaque ``binary`` columns with typed metadata
columns alongside.  The Ray-side plumbing — schemas, actor-pool stage
signatures, small-batch sizing for wide rows, output layout — is real and
tested; the codec work itself is STUBBED because no image/audio libraries
exist in this container:

* with ``decoder="fake"`` (default) the stages produce deterministic fake
  features derived from the payload bytes, so pipelines and tests exercise
  the full data path;
* with ``decoder="real"`` the stages raise ``NotImplementedError`` at the
  exact call site where a real codec (Pillow / libsndfile / pyav) would be
  invoked — swap the marked function and everything else stands.

Batch sizing note (memory-aware): payload rows are wide, so these stages
default to ``batch_size=256`` and actor pools; at 100 TB keep
``batch_size * concurrency * avg_payload`` under the worker heap.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

#: Arrow schema for a multimodal asset table.
ASSET_SCHEMA = pa.schema(
    [
        ("asset_id", pa.int64()),
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("width", pa.int32()),  # images/video; -1 otherwise
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),  # audio; -1 otherwise
        ("duration_ms", pa.int32()),  # audio/video; -1 otherwise
    ]
)

RECOMMENDED_BATCH_SIZE = 256


def _real_decode_stub(media_type: str) -> None:
    # STUB: a real deployment decodes here (Pillow for images, soundfile for
    # audio, pyav for video).  Those libraries are not in this container.
    raise NotImplementedError(
        f"real {media_type} decoding requires a codec library not present in "
        "this environment; use decoder='fake' for the deterministic test path"
    )


def _fake_features(payloads: list[bytes], dim: int) -> np.ndarray:
    """Deterministic per-payload feature vector: sha256-seeded floats."""
    out = np.empty((len(payloads), dim), dtype=np.float32)
    for i, p in enumerate(payloads):
        digest = hashlib.sha256(p or b"").digest()
        seed = int.from_bytes(digest[:8], "big")
        out[i] = np.random.default_rng(seed).standard_normal(dim).astype(np.float32)
    return out


class DecodeStage:
    """Actor-pool stage: payload -> decoded metadata (+ validity flag)."""

    def __init__(self, decoder: str = "fake"):
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "real":
            _real_decode_stub(batch.column("media_type")[0].as_py())
        payloads = batch.column("payload").to_pylist()
        sizes = np.array([len(p or b"") for p in payloads], dtype=np.int64)
        valid = sizes > 0
        return batch.append_column(
            "payload_bytes", pa.array(sizes, type=pa.int64())
        ).append_column("decode_ok", pa.array(valid, type=pa.bool_()))


class FeatureExtractStage:
    """Actor-pool stage: payload -> fixed-dim feature embedding.

    In a real deployment the model loads once per actor in ``__init__``
    (that contract is what this class demonstrates); the fake path derives
    deterministic features from the payload digest."""

    def __init__(self, dim: int = 64, decoder: str = "fake"):
        self.dim = dim
        self.decoder = decoder
        # model-load would happen HERE, once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "real":
            _real_decode_stub("feature-extract")
        feats = _fake_features(batch.column("payload").to_pylist(), self.dim)
        return batch.select(["asset_id", "media_type"]).append_column(
            "features", pa.array(list(feats), type=pa.list_(pa.float32(), self.dim))
        )


class ResizeStage:
    """Actor-pool stage: image resize (stubbed transform, real plumbing)."""

    def __init__(self, target_w: int = 224, target_h: int = 224, decoder: str = "fake"):
        self.target_w = target_w
        self.target_h = target_h
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "real":
            _real_decode_stub("image")
        # fake path: passthrough payload, rewritten dims
        n = len(batch)
        return (
            batch.drop_columns(["width", "height"])
            .append_column("width", pa.array([self.target_w] * n, type=pa.int32()))
            .append_column("height", pa.array([self.target_h] * n, type=pa.int32()))
        )


class FrameSampleStage:
    """Actor-pool stage: sample N pseudo-frames per video payload
    (flat_map-style: output has one row per sampled frame)."""

    def __init__(self, frames_per_video: int = 4, decoder: str = "fake"):
        self.frames = frames_per_video
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "real":
            _real_decode_stub("video")
        ids = batch.column("asset_id").to_numpy()
        payloads = batch.column("payload").to_pylist()
        out_ids, out_frame, out_blob = [], [], []
        for aid, p in zip(ids.tolist(), payloads):
            p = p or b""
            step = max(1, len(p) // self.frames)
            for f in range(self.frames):
                out_ids.append(aid)
                out_frame.append(f)
                # fake frame: a deterministic slice of the payload
                out_blob.append(p[f * step : f * step + min(step, 4096)])
        return pa.table(
            {
                "asset_id": pa.array(out_ids, type=pa.int64()),
                "frame_idx": pa.array(out_frame, type=pa.int32()),
                "frame_payload": pa.array(out_blob, type=pa.binary()),
            }
        )


def synth_asset_table(n: int, seed: int = 7) -> pa.Table:
    """Deterministic asset table for tests (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(sz), dtype=np.uint8).tobytes() for sz in rng.integers(512, 8192, size=n)]
    media = [("image", "audio", "video")[i % 3] for i in range(n)]
    return pa.table(
        {
            "asset_id": pa.array(np.arange(n), type=pa.int64()),
            "media_type": pa.array(media, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "width": pa.array([640 if m == "image" else -1 for m in media], type=pa.int32()),
            "height": pa.array([480 if m == "image" else -1 for m in media], type=pa.int32()),
            "sample_rate": pa.array([16000 if m == "audio" else -1 for m in media], type=pa.int32()),
            "duration_ms": pa.array([1000 if m != "image" else -1 for m in media], type=pa.int32()),
        }
    )


def multimodal_pipeline(ds, decoder: str = "fake", concurrency: int | None = None):
    """decode -> feature-extract over an asset dataset (actor pools when
    ``concurrency`` given); returns the feature dataset."""
    kwargs = dict(
        batch_format="pyarrow", zero_copy_batch=True, batch_size=RECOMMENDED_BATCH_SIZE
    )
    if concurrency is not None:
        decoded = ds.map_batches(
            DecodeStage,
            fn_constructor_kwargs=dict(decoder=decoder),
            concurrency=concurrency,
            **kwargs,
        )
        return decoded.map_batches(
            FeatureExtractStage,
            fn_constructor_kwargs=dict(decoder=decoder),
            concurrency=concurrency,
            **kwargs,
        )
    decoded = ds.map_batches(DecodeStage(decoder=decoder), **kwargs)
    return decoded.map_batches(FeatureExtractStage(decoder=decoder), **kwargs)
