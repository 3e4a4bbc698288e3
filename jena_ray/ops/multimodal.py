"""Multimodal column handling: media refs as opaque binary-addressed
content with typed metadata.

The image/audio decode libraries are not available in this container, so
the decode kernel is STUBBED (deterministic fake features derived from the
media_ref hash; `decode_real` raises NotImplementedError behind an
import-try). The Ray-side plumbing is real and tested: actor-pool stage,
small batch size (media payloads are fat — SURVEY §4 "memory pressure"),
typed Arrow schema in and out, one row per media span.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_FEATURES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
        ("feature", pa.list_(pa.float32(), 8)),
    ]
)


def decode_real(payload: bytes):  # pragma: no cover - no codecs in container
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image codecs not available in this environment; "
            "the pipeline uses the deterministic stub decoder"
        ) from e


class MediaFeatureExtractor:
    """Actor-pool stage: (doc_id, spans) → one feature row per media span.

    In a real deployment __init__ would load the decoder/model weights once
    per actor; here it precomputes the feature projection matrix (the
    stand-in for model state)."""

    def __init__(self, feature_dim: int = 8):
        self.dim = feature_dim
        self.proj = np.random.RandomState(11).randn(32, feature_dim).astype(np.float32)

    def _fake_decode(self, media_ref: str):
        h = hashlib.blake2b(media_ref.encode(), digest_size=40).digest()
        width = 64 + h[0] * 8
        height = 64 + h[1] * 8
        n_frames = 1 + h[2] % 32
        raw = np.frombuffer(h[8:40], dtype=np.uint8).astype(np.float32) / 255.0
        feat = raw @ self.proj
        return width, height, n_frames, feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, refs, ws, hs, fr, feats = [], [], [], [], [], []
        for doc_id, spans in zip(
            batch["doc_id"].to_pylist(), batch["spans"].to_pylist()
        ):
            for s in spans or []:
                if s["kind"] != "media" or not s["media_ref"]:
                    continue
                w, h, n, f = self._fake_decode(s["media_ref"])
                doc_ids.append(doc_id)
                refs.append(s["media_ref"])
                ws.append(w)
                hs.append(h)
                fr.append(n)
                feats.append([float(x) for x in f])
        return pa.Table.from_arrays(
            [
                pa.array(doc_ids, pa.string()),
                pa.array(refs, pa.string()),
                pa.array(ws, pa.int32()),
                pa.array(hs, pa.int32()),
                pa.array(fr, pa.int32()),
                pa.array(feats, pa.list_(pa.float32(), 8)),
            ],
            schema=MEDIA_FEATURES_SCHEMA,
        )


def media_features(docs_ds, concurrency=2, batch_size: int = 64):
    """Small batch_size: media rows are wide; concurrency × batch must fit
    worker heaps (SURVEY §4 memory-pressure row)."""
    return docs_ds.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
