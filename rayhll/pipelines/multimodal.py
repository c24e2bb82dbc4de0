"""Multimodal (binary-payload) pipeline stages.

Images / audio / video are opaque ``binary`` columns with typed metadata
columns alongside.  Three decoder modes:

* ``decoder="numpy"`` (default) — REAL decoding in pure numpy/stdlib via
  :mod:`rayhll.functions.codecs`, :mod:`rayhll.functions.jpeg`,
  :mod:`rayhll.functions.webp` and :mod:`rayhll.functions.flac`: BMP /
  binary PPM-PGM / PNG / JPEG (baseline AND progressive) / lossless-WebP
  (VP8L) images, RIFF PCM WAV and FLAC (RFC 9639 — a real compressed
  audio codec) audio, and video as concatenated-RGB24 raw or MJPEG
  (concatenated JPEG frames — a real compressed video codec).  Decode,
  feature-extract, nearest-neighbor resize and frame sampling all operate
  on actual pixels/samples.
* ``decoder="fake"`` — deterministic features derived from the payload
  sha256; exercises the full data path for arbitrary (even compressed)
  payloads without codec libraries.
* ``decoder="real"`` — raises ``NotImplementedError`` at the exact call
  site where a codec library (Pillow / libsndfile / pyav) would handle
  the remaining compressed formats (lossy-WebP/AVIF/MP3/H.264-class);
  those libraries are not in this container.  Swap the marked function
  and everything else stands.

Batch sizing note (memory-aware): payload rows are wide, so these stages
default to ``batch_size=256`` and actor pools; at 100 TB keep
``batch_size * concurrency * avg_payload`` under the worker heap.
"""

from __future__ import annotations

import hashlib
from struct import error as struct_error

import numpy as np
import pyarrow as pa

from rayhll.functions import codecs

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
    # Compressed-format swap point: a deployment with codec libraries
    # (Pillow for lossy-WebP/AVIF, soundfile for MP3, pyav for video)
    # decodes here.  BMP/PPM/WAV/rawvideo, PNG (stdlib zlib), JPEG
    # (baseline + progressive, functions/jpeg.py), MJPEG video, lossless
    # WebP (VP8L, functions/webp.py) and FLAC (RFC 9639,
    # functions/flac.py) are handled for real by decoder="numpy".
    raise NotImplementedError(
        f"real {media_type} decoding of lossy-WebP/AVIF/MP3/"
        "H.264-class formats requires a codec library not present in this "
        "environment; use decoder='numpy' for BMP/PPM/PNG/JPEG/"
        "lossless-WebP/WAV/FLAC/rawvideo/MJPEG or decoder='fake' for the "
        "digest-feature path"
    )


def _fake_features(payloads: list[bytes], dim: int) -> np.ndarray:
    """Deterministic per-payload feature vector: sha256-seeded floats."""
    out = np.empty((len(payloads), dim), dtype=np.float32)
    for i, p in enumerate(payloads):
        digest = hashlib.sha256(p or b"").digest()
        seed = int.from_bytes(digest[:8], "big")
        out[i] = np.random.default_rng(seed).standard_normal(dim).astype(np.float32)
    return out


def _numpy_decode_one(media: str, payload: bytes, w: int, h: int):
    """Decode one payload; returns (ok, width, height, sample_rate,
    duration_ms).  Per-row loop is inherent: payloads are variable-format
    opaque blobs (the per-row work is O(payload), decode-bound)."""
    try:
        if media == "image":
            img = codecs.decode_image(payload)
            return True, img.shape[1], img.shape[0], -1, -1
        if media == "audio":
            samples, rate = codecs.decode_audio(payload)
            return True, -1, -1, rate, int(round(len(samples) * 1000 / rate))
        if media == "video":
            frames = codecs.decode_video(payload, w, h)
            ok = len(frames) > 0
            fw = frames.shape[2] if ok else w
            fh = frames.shape[1] if ok else h
            return ok, fw, fh, -1, len(frames) * 40  # 25 fps nominal
    except (ValueError, struct_error):
        pass
    return False, -1, -1, -1, -1


class DecodeStage:
    """Actor-pool stage: payload -> decoded metadata (+ validity flag).

    ``numpy`` mode really parses each container and rewrites the metadata
    columns from the payload (width/height from the BMP/PPM header, sample
    rate and duration from the WAV chunks, frame count for raw video);
    ``decode_ok`` is the parse verdict, not a size check."""

    def __init__(self, decoder: str = "numpy"):
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        payloads = batch.column("payload").to_pylist()
        if self.decoder == "numpy":
            media = batch.column("media_type").to_pylist()
            ws = batch.column("width").to_numpy()
            hs = batch.column("height").to_numpy()
            ok = np.empty(n, dtype=bool)
            meta = np.empty((n, 4), dtype=np.int64)
            for i in range(n):
                ok[i], *meta[i] = _numpy_decode_one(
                    media[i], payloads[i] or b"", int(ws[i]), int(hs[i])
                )
            out = batch.drop_columns(["width", "height", "sample_rate", "duration_ms"])
            for j, name in enumerate(("width", "height", "sample_rate", "duration_ms")):
                out = out.append_column(name, pa.array(meta[:, j], type=pa.int32()))
        else:
            if self.decoder == "real":
                _real_decode_stub(batch.column("media_type")[0].as_py())
            ok = np.array([len(p or b"") > 0 for p in payloads], dtype=bool)
            out = batch
        sizes = np.array([len(p or b"") for p in payloads], dtype=np.int64)
        return out.append_column(
            "payload_bytes", pa.array(sizes, type=pa.int64())
        ).append_column("decode_ok", pa.array(ok, type=pa.bool_()))


class PerceptualHashStage:
    """Actor-pool stage: image payload -> 64-bit perceptual dHash
    (``codecs.dhash64``) for near-duplicate image detection across
    re-encodes (the image analogue of SimHash text fingerprints — hamming
    distance over ``phash64`` measures visual similarity, so the same
    banding machinery applies downstream).

    Videos hash their MIDDLE frame (raw-RGB24 payloads, dims from the
    ``width``/``height`` metadata columns when present) so re-containered
    or lightly re-encoded clips pair up too.  Appends ``phash64`` (int64;
    null for audio and undecodable payloads)."""

    def __init__(self, decoder: str = "numpy"):
        if decoder == "real":
            _real_decode_stub("perceptual-hash")
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        media = batch.column("media_type").to_pylist()
        payloads = batch.column("payload").to_pylist()
        names = batch.column_names
        ws = batch.column("width").to_numpy() if "width" in names else None
        hs = batch.column("height").to_numpy() if "height" in names else None
        out: list[int | None] = []
        for i, (m, p) in enumerate(zip(media, payloads)):
            rgb = None
            if p:
                try:
                    if m == "image":
                        rgb = codecs.decode_image(p)
                    elif m == "video":
                        w = int(ws[i]) if ws is not None else -1
                        h = int(hs[i]) if hs is not None else -1
                        frames = codecs.decode_video(p, w, h)
                        if len(frames):
                            rgb = frames[len(frames) // 2]
                except (ValueError, struct_error):
                    rgb = None
            if rgb is None:
                out.append(None)
                continue
            h = codecs.dhash64(rgb)
            out.append(h - (1 << 64) if h >= (1 << 63) else h)  # int64 view
        return batch.append_column("phash64", pa.array(out, type=pa.int64()))


class SpectralFeatureStage:
    """Actor-pool stage: audio payload -> frequency-domain features
    (``codecs.audio_spectral_features``: spectral centroid/rolloff/
    bandwidth/flatness + mel-spaced log band energies, one rfft per clip).
    Appends ``centroid_hz``, ``rolloff_hz``, ``flatness`` (float64; null
    for non-audio/undecodable payloads) and ``spectral`` (list<float32>;
    an all-zero vector for those rows — a uniform shape keeps the column
    tensor-castable downstream)."""

    def __init__(self, n_mel: int = 24, decoder: str = "numpy"):
        if decoder == "real":
            _real_decode_stub("spectral-features")
        self.n_mel = n_mel

    def __call__(self, batch: pa.Table) -> pa.Table:
        media = batch.column("media_type").to_pylist()
        payloads = batch.column("payload").to_pylist()
        cents, rolls, flats, vecs = [], [], [], []
        zero = [0.0] * self.n_mel
        for m, p in zip(media, payloads):
            if m != "audio" or not p:
                cents.append(None); rolls.append(None); flats.append(None)
                vecs.append(zero)
                continue
            try:
                samples, rate = codecs.decode_audio(p)
            except (ValueError, struct_error):
                cents.append(None); rolls.append(None); flats.append(None)
                vecs.append(zero)
                continue
            f = codecs.audio_spectral_features(samples, rate, n_mel=self.n_mel)
            cents.append(float(f[0])); rolls.append(float(f[1]))
            flats.append(float(f[3])); vecs.append(f[4:].tolist())
        return (
            batch.append_column("centroid_hz", pa.array(cents, type=pa.float64()))
            .append_column("rolloff_hz", pa.array(rolls, type=pa.float64()))
            .append_column("flatness", pa.array(flats, type=pa.float64()))
            .append_column("spectral", pa.array(vecs, type=pa.list_(pa.float32())))
        )


class FeatureExtractStage:
    """Actor-pool stage: payload -> fixed-dim feature embedding.

    In a real deployment the model loads once per actor in ``__init__``
    (that contract is what this class demonstrates).  ``numpy`` mode
    computes content features from decoded media: an 8x8 grayscale block
    grid for images / first video frame, per-window RMS band energy for
    audio; undecodable payloads get a zero vector.  ``fake`` derives
    deterministic features from the payload digest."""

    def __init__(self, dim: int = 64, decoder: str = "numpy"):
        self.dim = dim
        self.decoder = decoder
        self._grid = max(1, int(np.sqrt(dim)))
        # model-load would happen HERE, once per actor

    def _numpy_one(self, media: str, payload: bytes, w: int, h: int) -> np.ndarray:
        try:
            if media == "image":
                rgb = codecs.decode_image(payload)
            elif media == "audio":
                samples, _ = codecs.decode_audio(payload)
                return codecs.audio_band_energy(samples, bands=self.dim)
            elif media == "video":
                frames = codecs.decode_video(payload, w, h)
                if len(frames) == 0:
                    return np.zeros(self.dim, dtype=np.float32)
                rgb = frames[0]
            else:
                return np.zeros(self.dim, dtype=np.float32)
            feats = codecs.image_grid_features(rgb, grid=self._grid)
            out = np.zeros(self.dim, dtype=np.float32)
            out[: min(self.dim, len(feats))] = feats[: self.dim]
            return out
        except (ValueError, struct_error):
            return np.zeros(self.dim, dtype=np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        if self.decoder == "numpy":
            media = batch.column("media_type").to_pylist()
            ws = batch.column("width").to_numpy()
            hs = batch.column("height").to_numpy()
            feats = np.stack(
                [
                    self._numpy_one(m, p or b"", int(w), int(h))
                    for m, p, w, h in zip(media, payloads, ws, hs)
                ]
            ) if len(batch) else np.empty((0, self.dim), dtype=np.float32)
        else:
            if self.decoder == "real":
                _real_decode_stub("feature-extract")
            feats = _fake_features(payloads, self.dim)
        return batch.select(["asset_id", "media_type"]).append_column(
            "features", pa.array(list(feats), type=pa.list_(pa.float32(), self.dim))
        )


class ResizeStage:
    """Actor-pool stage: image resize.  ``numpy`` mode decodes BMP/PPM,
    nearest-neighbor resamples, and re-encodes as BMP (payload is really
    rewritten); other modes pass the payload through with rewritten dims."""

    def __init__(self, target_w: int = 224, target_h: int = 224, decoder: str = "numpy"):
        self.target_w = target_w
        self.target_h = target_h
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        if self.decoder == "real":
            _real_decode_stub("image")
        if self.decoder == "numpy":
            payloads = batch.column("payload").to_pylist()
            media = batch.column("media_type").to_pylist()
            out_payloads = []
            for m, p in zip(media, payloads):
                p = p or b""
                if m == "image":
                    try:
                        rgb = codecs.decode_image(p)
                        p = codecs.encode_bmp(
                            codecs.resize_nearest(rgb, self.target_w, self.target_h)
                        )
                    except (ValueError, struct_error):
                        pass  # undecodable: passthrough
                out_payloads.append(p)
            batch = batch.drop_columns(["payload"]).append_column(
                "payload", pa.array(out_payloads, type=pa.binary())
            )
        return (
            batch.drop_columns(["width", "height"])
            .append_column("width", pa.array([self.target_w] * n, type=pa.int32()))
            .append_column("height", pa.array([self.target_h] * n, type=pa.int32()))
        )


class FrameSampleStage:
    """Actor-pool stage: sample N frames per video payload (flat_map-style:
    one output row per sampled frame).  ``numpy`` mode decodes the raw
    RGB24 container and emits each sampled frame re-encoded as a BMP;
    ``fake`` emits deterministic payload slices."""

    def __init__(self, frames_per_video: int = 4, decoder: str = "numpy"):
        self.frames = frames_per_video
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "real":
            _real_decode_stub("video")
        ids = batch.column("asset_id").to_numpy()
        payloads = batch.column("payload").to_pylist()
        if self.decoder == "numpy":
            ws = batch.column("width").to_numpy()
            hs = batch.column("height").to_numpy()
        out_ids, out_frame, out_blob = [], [], []
        for i, (aid, p) in enumerate(zip(ids.tolist(), payloads)):
            p = p or b""
            if self.decoder == "numpy":
                try:
                    frames = codecs.decode_video(p, int(ws[i]), int(hs[i]))
                except (ValueError, struct_error):
                    continue
                if len(frames) == 0:
                    continue
                # uniform temporal sampling over the real frame sequence
                picks = np.minimum(
                    (np.arange(self.frames) * len(frames)) // self.frames,
                    len(frames) - 1,
                )
                for f, fi in enumerate(picks.tolist()):
                    out_ids.append(aid)
                    out_frame.append(f)
                    out_blob.append(codecs.encode_bmp(frames[fi]))
            else:
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
    """Deterministic asset table of OPAQUE payloads (seeded random bytes)
    for the digest-feature (``fake``) path."""
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


def synth_media_table(n: int, seed: int = 7) -> pa.Table:
    """Deterministic asset table of REAL decodable payloads for the
    ``numpy`` decoder path: BMP/PPM/PNG/baseline-JPEG/progressive-JPEG/
    lossless-WebP images (rotating, so the oracle gate exercises all
    seven encodings incl. the zlib inflate + unfilter path, both JPEG
    entropy layouts, and the VP8L prefix-code/cache/transform paths),
    audio alternating 16-bit PCM WAV / FLAC (rotating fixed-predictor,
    LPC and stereo-decorrelation modes through functions/flac.py), and
    video alternating raw-RGB24 / MJPEG (every MJPEG frame decodes
    through the full functions/jpeg.py codec).  Dim/rate metadata columns
    intentionally hold -1 sentinels except raw-RGB24 video dims (which
    that container genuinely needs) — DecodeStage must recover the true
    values from the payloads, including MJPEG dims from the per-frame
    JPEG headers and FLAC rates from STREAMINFO."""
    rng = np.random.default_rng(seed)
    ids, media, payloads, ws, hs, rates, durs = [], [], [], [], [], [], []
    from rayhll.functions import flac
    from rayhll.functions.jpeg import encode_jpeg
    from rayhll.functions.webp import encode_webp

    def encode_jpeg_progressive(img):
        return encode_jpeg(img, progressive=True)

    def encode_webp_sg_cache(img):
        return encode_webp(img, subtract_green=True, cache_bits=5)

    img_encoders = (
        codecs.encode_bmp,
        codecs.encode_ppm,
        codecs.encode_png,
        encode_jpeg,
        encode_jpeg_progressive,
        encode_webp,
        encode_webp_sg_cache,
    )
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        ids.append(i)
        media.append(kind)
        if kind == "image":
            w, h = int(rng.integers(8, 33)), int(rng.integers(8, 33))
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payloads.append(img_encoders[(i // 3) % len(img_encoders)](img))
            ws.append(-1); hs.append(-1); rates.append(-1); durs.append(-1)
        elif kind == "audio":
            rate = 8000
            n_s = int(rng.integers(100, 2000))
            if (i // 3) % 4 == 3:
                # stereo tone+noise: exercises FLAC stereo decorrelation
                t = np.arange(n_s) / rate
                left = np.sin(2 * np.pi * 440 * t) * 15000
                right = left * 0.5 + rng.integers(-500, 500, size=n_s)
                samples = np.stack([left, right], axis=1).astype(np.int16)
            else:
                samples = (
                    rng.integers(-20000, 20000, size=n_s)
                ).astype(np.int16)
            variant = (i // 3) % 4
            if variant == 0:
                payloads.append(codecs.encode_wav(samples, rate))
            elif variant == 1:
                payloads.append(flac.encode_flac(samples, rate))
            elif variant == 2:
                payloads.append(
                    flac.encode_flac(samples, rate, use_lpc=True, block_size=512)
                )
            else:
                payloads.append(
                    flac.encode_flac(samples, rate, stereo_mode="mid_side")
                )
            ws.append(-1); hs.append(-1); rates.append(-1); durs.append(-1)
        else:
            w, h = 16, 12
            nf = int(rng.integers(2, 9))
            frames = rng.integers(0, 256, size=(nf, h, w, 3), dtype=np.uint8)
            if (i // 3) % 2:
                # MJPEG (every frame through the full JPEG codec) —
                # self-describing, so the dim metadata stays -1 sentinels
                # and DecodeStage must recover w/h from the frame headers
                payloads.append(codecs.encode_mjpeg(frames))
                ws.append(-1); hs.append(-1); rates.append(-1); durs.append(-1)
            else:
                payloads.append(codecs.encode_rawvideo(frames))
                ws.append(w); hs.append(h); rates.append(-1); durs.append(-1)
    return pa.table(
        {
            "asset_id": pa.array(ids, type=pa.int64()),
            "media_type": pa.array(media, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "width": pa.array(ws, type=pa.int32()),
            "height": pa.array(hs, type=pa.int32()),
            "sample_rate": pa.array(rates, type=pa.int32()),
            "duration_ms": pa.array(durs, type=pa.int32()),
        }
    )


def multimodal_pipeline(ds, decoder: str = "numpy", concurrency: int | None = None):
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


def image_near_dup_pairs(
    ds,
    id_col: str = "asset_id",
    max_hamming: int = 3,
    decoder: str = "numpy",
    num_buckets: int | None = None,
):
    """Near-duplicate IMAGE pairs across re-encodes/containers: decode ->
    64-bit perceptual dHash (:class:`PerceptualHashStage`) -> hamming-chunk
    candidate pairing (``dedup.hamming64_pairs`` — the same pigeonhole
    machinery as SimHash text dedup; recall guaranteed for
    ``max_hamming <= 3``).  Non-image and undecodable payloads hash to
    null and never pair."""
    from rayhll.functions.partitioning import resolve_num_buckets
    from rayhll.pipelines.dedup import hamming64_pairs

    # size the pairing fanout from the RAW input's metadata count (the
    # hashed dataset is transformed and would silently fall to the floor)
    num_buckets = resolve_num_buckets(ds, num_buckets, rows_per_input_row=4.0)
    hashed = ds.map_batches(
        PerceptualHashStage,
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=RECOMMENDED_BATCH_SIZE,
        concurrency=(1, 8),
    )
    slim = hashed.select_columns([id_col, "phash64"])
    return hamming64_pairs(
        slim, id_col, hash_col="phash64", max_hamming=max_hamming,
        num_buckets=num_buckets,
    )
