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
    # num_cpus=0.5: decode stubs are cheap; fractional reservation lets a
    # chained downstream actor pool (resize / frame-sample) co-schedule on
    # a small CPU pool instead of deadlocking on whole-CPU reservations
    return docs_ds.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )


RESIZE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("out_width", pa.int32()),
        ("out_height", pa.int32()),
    ]
)


class MediaResizer:
    """Actor-pool resize stage: fit each media item into a target box,
    preserving aspect ratio (integer floor math — deterministic across
    retries). The pixel resample itself is the stubbed decode step; the
    DIMENSION plan is the real, testable output a downstream writer or
    thumbnailer consumes."""

    def __init__(self, max_w: int = 256, max_h: int = 256):
        self.max_w = max_w
        self.max_h = max_h

    def _plan(self, w: int, h: int) -> tuple[int, int]:
        if w <= self.max_w and h <= self.max_h:
            return w, h
        if w * self.max_h <= h * self.max_w:
            # height binds: scale = max_h / h
            return max(1, w * self.max_h // h), self.max_h
        # width binds: scale = max_w / w
        return self.max_w, max(1, h * self.max_w // w)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws = batch["width"].to_pylist()
        hs = batch["height"].to_pylist()
        out = [self._plan(w, h) for w, h in zip(ws, hs)]
        return pa.Table.from_arrays(
            [
                batch["doc_id"].combine_chunks().cast(pa.string()),
                batch["media_ref"].combine_chunks().cast(pa.string()),
                pa.array(ws, pa.int32()),
                pa.array(hs, pa.int32()),
                pa.array([o[0] for o in out], pa.int32()),
                pa.array([o[1] for o in out], pa.int32()),
            ],
            schema=RESIZE_SCHEMA,
        )


FRAME_SAMPLE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("frame_idx", pa.int32()),
        ("frame_ref", pa.string()),
    ]
)


class FrameSampler:
    """Actor-pool frame-sampling stage: k uniformly spaced frames per
    media item (idx_i = floor(i * n_frames / k), deduplicated for short
    clips) — the standard video keyframe subsample before per-frame
    feature extraction. One output row per sampled frame; frame_ref is
    the addressable '<media_ref>#<idx>' the (stubbed) decoder would
    fetch."""

    def __init__(self, k: int = 4):
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, refs, idxs, frefs = [], [], [], []
        for d, r, n in zip(
            batch["doc_id"].to_pylist(),
            batch["media_ref"].to_pylist(),
            batch["n_frames"].to_pylist(),
        ):
            seen = set()
            for i in range(self.k):
                idx = i * n // self.k
                if idx in seen:
                    continue
                seen.add(idx)
                doc_ids.append(d)
                refs.append(r)
                idxs.append(idx)
                frefs.append(f"{r}#{idx}")
        return pa.Table.from_arrays(
            [
                pa.array(doc_ids, pa.string()),
                pa.array(refs, pa.string()),
                pa.array(idxs, pa.int32()),
                pa.array(frefs, pa.string()),
            ],
            schema=FRAME_SAMPLE_SCHEMA,
        )


def media_resize(features_ds, *, max_w: int = 256, max_h: int = 256,
                 concurrency=2, batch_size: int = 64):
    """Resize plan over the media_features output (or any table with
    doc_id/media_ref/width/height)."""
    return features_ds.map_batches(
        MediaResizer,
        fn_constructor_kwargs={"max_w": max_w, "max_h": max_h},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )


def media_frame_sample(features_ds, *, k: int = 4, concurrency=2,
                       batch_size: int = 64):
    """Uniform k-frame subsample over the media_features output (or any
    table with doc_id/media_ref/n_frames)."""
    return features_ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"k": k},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )


def media_caption_pairs(docs_ds, *, max_window: int = 1):
    """(media_ref, caption) training-pair extraction from interleaved
    documents — the web-corpus image-text pairing step of CLIP/LAION-
    style pipelines: each media span is paired with the text of its
    neighboring text spans (up to ``max_window`` on each side, in span
    order — web-page alt-text/caption heuristics reduced to span
    adjacency, which is what the interleaved (kind, offset) layout
    preserves). Pure per-document flat-map over the spans column — no
    shuffle, embarrassingly parallel.

    Returns (doc_id, media_ref, span_idx, caption_before,
    caption_after)."""

    def explode(b: pa.Table) -> pa.Table:
        ids, refs, idxs, before, after = [], [], [], [], []
        for d, spans in zip(b["doc_id"].to_pylist(),
                            b["spans"].to_pylist()):
            spans = spans or []
            for i, s in enumerate(spans):
                if s["kind"] != "media":
                    continue
                pre = [t["text"] for t in spans[max(0, i - max_window):i]
                       if t["kind"] == "text"]
                post = [t["text"] for t in spans[i + 1:i + 1 + max_window]
                        if t["kind"] == "text"]
                ids.append(d)
                refs.append(s["media_ref"])
                idxs.append(i)
                before.append(" ".join(pre))
                after.append(" ".join(post))
        return pa.table({
            "doc_id": pa.array(ids, pa.string()),
            "media_ref": pa.array(refs, pa.string()),
            "span_idx": pa.array(idxs, pa.int64()),
            "caption_before": pa.array(before, pa.large_string()),
            "caption_after": pa.array(after, pa.large_string()),
        })

    return docs_ds.map_batches(explode, batch_format="pyarrow")


def media_dedup(docs_ds):
    """Corpus-wide media dedup by content address — the LAION-style
    pass that collapses an image reused across many pages to one
    canonical copy before decode/embedding (by media_ref here; with
    real payloads the key is the payload digest — same shuffle). One
    explode + ONE groupby(media_ref): keeper = lexicographically
    smallest (doc_id, span_idx).

    Returns (media_ref, keep_doc, keep_span, n_uses)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Min

    def explode(b: pa.Table) -> pa.Table:
        ids, refs, idxs = [], [], []
        for d, spans in zip(b["doc_id"].to_pylist(),
                            b["spans"].to_pylist()):
            for i, s in enumerate(spans or []):
                if s["kind"] == "media":
                    ids.append(d)
                    refs.append(s["media_ref"])
                    idxs.append(i)
        # pack (doc_id, span_idx) so the corpus-wide keeper is ONE Min
        pack = [f"{d}|{i:06d}" for d, i in zip(ids, idxs)]
        return pa.table({
            "media_ref": pa.array(refs, pa.string()),
            "pack": pa.array(pack, pa.string()),
        })

    agg = (docs_ds.map_batches(explode, batch_format="pyarrow")
           .groupby("media_ref")
           .aggregate(Min("pack", alias_name="keep"),
                      Count(alias_name="n_uses")))

    def unpack(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return t
        keep = t["keep"].to_pylist()
        docs = [x.rsplit("|", 1)[0] for x in keep]
        spans = [int(x.rsplit("|", 1)[1]) for x in keep]
        return pa.table({
            "media_ref": t["media_ref"].combine_chunks().cast(pa.string()),
            "keep_doc": pa.array(docs, pa.string()),
            "keep_span": pa.array(spans, pa.int64()),
            "n_uses": t["n_uses"].combine_chunks().cast(pa.int64()),
        })

    return agg.map_batches(unpack, batch_format="pyarrow")
