"""Deterministic blank-node label allocation, document-scoped.

Reference scheme (riot/lang/BlankNodeAllocatorHash.java:47-150): label →
hash128(seed ‖ label) → 32 lowercase hex chars; the seed is fresh per run
by default but a fixed-seed variant exists
(BlankNodeAllocatorFixedSeedHash.java) and scope is per document
(LabelToNode.createScopeByDocumentHash, riot/lang/LabelToNode.java:48-64).

We make determinism the default: seed = H(run_seed ‖ doc_id), so

- two docs using the same local label "_:b0" get different global labels
  (document scoping), and
- retries / different parallelism levels produce byte-identical output
  (the N-vs-4N determinism check in BASELINE.md).

Hash is blake2b-128 (stdlib; the reference's MurmurHash3-128 choice is an
implementation detail — bnode identity is only compared up to isomorphism).
"""

from __future__ import annotations

import hashlib

from .escapes import escape_iri


def doc_seed(run_seed: str, doc_id: str) -> bytes:
    return hashlib.blake2b(
        run_seed.encode() + b"\x00" + doc_id.encode(), digest_size=16
    ).digest()


def label_for(seed: bytes, local_label: str) -> str:
    """Global 32-hex-char label for a document-local bnode label."""
    return hashlib.blake2b(
        local_label.encode(), key=seed, digest_size=16
    ).hexdigest()


def fresh_label(seed: bytes, counter: int) -> str:
    """Label for an anonymous bnode ([] / collection cells): position-keyed."""
    return label_for(seed, f"\x01anon{counter}")


class BNodeScope:
    """Per-document label map — the LabelToNode analog, used inside one
    parse UDF invocation (never shared across documents or batches)."""

    __slots__ = ("seed", "map", "counter")

    def __init__(self, run_seed: str, doc_id: str):
        self.seed = doc_seed(run_seed, doc_id)
        self.map: dict[str, str] = {}
        self.counter = 0

    def get(self, local_label: str) -> str:
        lab = self.map.get(local_label)
        if lab is None:
            lab = label_for(self.seed, local_label)
            self.map[local_label] = lab
        return lab

    def fresh(self) -> str:
        self.counter += 1
        return fresh_label(self.seed, self.counter)


def skolemize_iri(label: str) -> str:
    """bnode → pseudo-IRI '_:label' round-trip (riot/system/RiotLib.java:63-131)."""
    return "urn:bnode:" + escape_iri(label)


def unskolemize_label(iri: str) -> str | None:
    if iri.startswith("urn:bnode:"):
        return iri[len("urn:bnode:"):]
    return None
