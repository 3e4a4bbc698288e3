"""RDF-Patch-style incremental updates over a materialized triple table.

Parity: jena-rdfpatch (RDFChanges interface, RDFChanges.java:30-120 —
events A (add) / D (delete) over quads; file log rdfpatch/filelog/).
SURVEY §4 names this the model for incremental updates of the KG.

A patch is a text log, one operation per line:

    A <s> <p> <o> .          # add triple (N-Triples term syntax)
    D <s> <p> <o> .          # delete triple
    TX / TC                  # transaction begin/commit (ignored: a patch
                             # file is applied atomically as a whole)

Ops are replayed in FILE ORDER to effective add/delete sets (last op per
triple wins — sequential RDFChanges semantics), then applied distributed:
  new = (current ∪ adds) ∖ deletes
realized as a broadcast of the (small) delete set + union + exact dedup.
For patch batches large enough to break the broadcast assumption, apply
in hash-partitioned chunks (the dedup shuffle already partitions).
"""

from __future__ import annotations

import pyarrow as pa

from ..model import TRIPLE_SCHEMA, RDFParseError
from ..rdf.ntriples import parse_ntriples
from ..stages.dedup import KEY_COLS, exact_dedup


def parse_patch_ops(text: str) -> list[tuple[str, tuple]]:
    """Patch text → ordered [(op, term-8-tuple), ...] in file order."""
    ops: list[tuple[str, tuple]] = []
    for lineno, line in enumerate(text.split("\n"), 1):
        line = line.strip()
        if not line or line.startswith("#") or line in ("TX .", "TC .", "TX", "TC"):
            continue
        op, _, rest = line.partition(" ")
        if op in ("A", "D"):
            ops.extend((op, t) for t in parse_ntriples(rest))
        else:
            raise RDFParseError(f"patch line {lineno}: unknown op {op!r}")
    return ops


def parse_patch(text: str) -> tuple[list[tuple], list[tuple]]:
    """Patch text → EFFECTIVE (adds, deletes): ops are replayed in file
    order and the LAST op per triple key wins (jena-rdfpatch RDFChanges is
    sequential — 'D t' then 'A t' must leave t present; ADVICE r1 #5), so
    the effective sets are disjoint and set algebra applies cleanly."""
    last: dict[tuple, tuple[str, tuple]] = {}
    for op, t in parse_patch_ops(text):
        last[tuple(t[:8])] = (op, t)
    adds = [t for op, t in last.values() if op == "A"]
    deletes = [t for op, t in last.values() if op == "D"]
    return adds, deletes


def _to_table(tuples: list[tuple], doc_id: str) -> pa.Table:
    cols = {name: [] for name in TRIPLE_SCHEMA.names}
    for (s_kind, s_lex, p, o_kind, o_lex, o_dt, o_lang, g) in tuples:
        cols["s_kind"].append(s_kind)
        cols["s_lex"].append(s_lex)
        cols["p"].append(p)
        cols["o_kind"].append(o_kind)
        cols["o_lex"].append(o_lex)
        cols["o_datatype"].append(o_dt)
        cols["o_lang"].append(o_lang)
        cols["g"].append(g)
        cols["doc_id"].append(doc_id)
    return pa.Table.from_arrays(
        [pa.array(cols[f.name], f.type) for f in TRIPLE_SCHEMA], schema=TRIPLE_SCHEMA
    )


def _key_of_row(t: tuple) -> tuple:
    return tuple(t[:8])


def apply_patch(triples_ds, patch_text: str, *, patch_id: str = "patch"):
    """(current ∪ adds) ∖ deletes, deduplicated. Returns a new Dataset."""
    import ray
    import ray.data as rd

    adds, deletes = parse_patch(patch_text)
    del_keys = {tuple(t[:8]) for t in deletes}
    del_ref = ray.put(del_keys)

    def drop_deleted(batch: pa.Table) -> pa.Table:
        import ray as _ray

        keys = _ray.get(del_ref)
        if not keys:
            return batch
        cols = [batch.column(c).to_pylist() for c in KEY_COLS]
        mask = pa.array(
            [tuple(row) not in keys for row in zip(*cols)]
        )
        return batch.filter(mask)

    out = triples_ds
    if adds:
        out = out.union(rd.from_arrow(_to_table(adds, patch_id)))
    if deletes:
        out = out.map_batches(drop_deleted, batch_format="pyarrow", batch_size=65536)
    return exact_dedup(out)
