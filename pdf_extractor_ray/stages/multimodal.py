"""Multimodal (binary payload) stages — real Ray plumbing, stubbed
codecs.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata.  The decode/resize/frame-sample kernels need codec libraries
absent from this container, so they are STUBBED behind
``NotImplementedError`` or a deterministic fake — but the Ray side
(schema, actor signature, small batch sizes for wide binary rows,
output layout) is real and tested, mirroring the reference's
binary-handling paths (figure extraction
/root/reference/src/pdf_processor.py:105-206, page render :35-61).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("meta", pa.struct([("width", pa.int32()), ("height", pa.int32()), ("duration_ms", pa.int32())])),
    ]
)

FEATURE_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),
        ("n_bytes", pa.int64()),
        ("digest", pa.string()),
        ("feature", pa.list_(pa.float32(), 8)),
    ]
)


def real_decode(payload: bytes, kind: str):  # pragma: no cover — needs codecs
    """The production decode path.  Image decode uses PIL when it is
    installed (returns the loaded ``PIL.Image``); audio/video need
    soundfile / pyav.  Raises NotImplementedError when the codec
    library is absent (this container); the importorskip module
    tests/test_real_codec_seams.py drives the real path the day the
    dependency appears."""
    if kind == "image":
        try:
            from PIL import Image
        except ImportError as e:
            raise NotImplementedError(
                "PIL not available in this environment; real_decode(image) "
                "needs PIL.Image.open over the payload bytes"
            ) from e
        import io

        img = Image.open(io.BytesIO(payload))
        img.load()
        return img
    raise NotImplementedError(
        "audio/video codecs not available in this environment; "
        "swap in soundfile.read / av.open here in production"
    )


def media_batch_size(
    bytes_per_row: float,
    target_bytes: int = 8 << 20,
    lo: int = 4,
    hi: int = 1024,
) -> int:
    """Size-aware media batch size: batch × payload bytes ≈ a fixed
    in-flight budget, so a 4 MB-image column gets 4-row batches while
    a 500-byte thumbnail column gets 1024-row batches (a static 32
    scheduled 31k near-empty tasks over a 1M-row lake of small
    payloads — measured as the dominant cost of multimodal_meta)."""
    return max(lo, min(hi, int(target_bytes // max(bytes_per_row, 1.0))))


def fake_feature(payload: bytes) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector:
    8 floats derived from a blake2b digest.  Keeps the plumbing (batch
    shapes, schemas, actor lifecycle) fully exercisable."""
    d = hashlib.blake2b(payload, digest_size=8).digest()
    return [b / 255.0 for b in d]


class MediaFeaturizer:
    """Actor-pool stage for binary payloads.

    ``batch_size`` must be SMALL (wide binary rows — a 4 MB payload ×
    1024-row batch would be 4 GB); callers pass batch_size≈32 and let
    dynamic block splitting handle the rest."""

    def __init__(self, use_real_codec: bool = False):
        self.use_real_codec = use_real_codec

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        feats, digests, sizes = [], [], []
        for p in payloads:
            p = p or b""
            if self.use_real_codec:
                real_decode(p, "image")  # raises: documented stub
            feats.append(fake_feature(p))
            digests.append(hashlib.blake2b(p, digest_size=16).hexdigest())
            sizes.append(len(p))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "n_bytes": pa.array(sizes, pa.int64()),
                "digest": pa.array(digests, pa.string()),
                "feature": pa.array(feats, pa.list_(pa.float32(), 8)),
            }
        )


def featurize_media(ds, concurrency=None, batch_size: int = 32):
    """Binary-column feature extraction with media-appropriate batch
    sizing (small batches × bounded concurrency so payload bytes ×
    in-flight batches fit the object store)."""
    return ds.map_batches(
        MediaFeaturizer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or (1, 4),
        zero_copy_batch=True,
    )


class MediaResizer:
    """Actor-pool resize stage (image payloads): emits a payload of the
    target geometry plus updated meta.  The pixel kernel is a
    deterministic fake (blake2b-derived bytes) — swap ``real_decode`` +
    PIL ``Image.resize`` in production; schema, batch sizing, and actor
    lifecycle are the real contract."""

    def __init__(self, width: int, height: int, use_real_codec: bool = False):
        self.width, self.height = width, height
        self.use_real_codec = use_real_codec

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        out = []
        for p in payloads:
            p = p or b""
            if self.use_real_codec:
                real_decode(p, "image")  # raises: documented stub
            out.append(hashlib.blake2b(p, digest_size=32).digest())
        meta = pa.array(
            [
                {"width": self.width, "height": self.height, "duration_ms": 0}
                for _ in payloads
            ],
            MEDIA_SCHEMA.field("meta").type,
        )
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "payload": pa.array(out, pa.binary()),
                "meta": meta,
            }
        )


def resize_media(ds, width: int, height: int, concurrency=None, batch_size: int = 32):
    return ds.map_batches(
        MediaResizer,
        fn_constructor_kwargs={"width": width, "height": height},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or (1, 4),
        zero_copy_batch=True,
    )


FRAME_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("frame_idx", pa.int32()),
        ("ts_ms", pa.int32()),
        ("payload", pa.binary()),
    ]
)


class FrameSampler:
    """Actor-pool frame-sampling stage (video payloads): one OUTPUT ROW
    per sampled frame every ``every_ms`` — the flat-map shape that makes
    downstream per-frame batches narrow again.  Frame decode is a
    deterministic fake keyed on (payload, frame_idx); the row fan-out,
    meta-driven frame count, and small input batch size are the real
    contract."""

    def __init__(self, every_ms: int = 500, use_real_codec: bool = False):
        self.every_ms = every_ms
        self.use_real_codec = use_real_codec

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        metas = batch.column("meta").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_id, out_idx, out_ts, out_payload = [], [], [], []
        for mid, meta, p in zip(ids, metas, payloads):
            p = p or b""
            if self.use_real_codec:
                real_decode(p, "video")  # raises: documented stub
            duration = int((meta or {}).get("duration_ms") or 0)
            n_frames = duration // self.every_ms
            for i in range(n_frames):
                out_id.append(mid)
                out_idx.append(i)
                out_ts.append(i * self.every_ms)
                out_payload.append(
                    hashlib.blake2b(
                        p + i.to_bytes(4, "big"), digest_size=16
                    ).digest()
                )
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(out_idx, pa.int32()),
                "ts_ms": pa.array(out_ts, pa.int32()),
                "payload": pa.array(out_payload, pa.binary()),
            }
        )


def sample_frames(ds, every_ms: int = 500, concurrency=None, batch_size: int = 16):
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"every_ms": every_ms},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or (1, 4),
        zero_copy_batch=True,
    )
