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


def real_decode(payload: bytes, kind: str):  # pragma: no cover
    """The production decode path — requires PIL / soundfile / pyav,
    none of which ship in this container."""
    raise NotImplementedError(
        "media codecs not available in this environment; "
        "swap in PIL.Image.open / av.open here in production"
    )


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
