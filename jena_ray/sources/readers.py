"""RDF file readers — the RDFDataMgr / RDFParser facade analog
(jena-arq/src/main/java/org/apache/jena/riot/RDFParser.java:90,263-446;
language registry RDFLanguages.java:69-177).

``read_rdf`` turns a directory/glob of RDF files into a triple Dataset:
files are read distributed (``read_binary_files`` keeps one file per row —
parser state stays file-scoped exactly like the reference's per-file
parse, SURVEY §3.1), parsed inside ``map_batches``, blank-node labels
hashed with the file path as the document scope.
"""

from __future__ import annotations

import os

import pyarrow as pa

from ..model import KIND_BNODE, KIND_TRIPLE_TERM, TRIPLE_SCHEMA, RDFParseError
from ..rdf.bnodes import BNodeScope
from ..rdf.iso import remap_triple_term_bnodes
from ..rdf.ntriples import parse_ntriples
from ..rdf.turtle import parse_trig, parse_turtle

_EXT_TO_LANG = {
    ".nt": "ntriples",
    ".nq": "nquads",
    ".ttl": "turtle",
    ".trig": "trig",
    ".rdf": "rdfxml",
    ".owl": "rdfxml",
    ".jsonld": "jsonld",
    ".json": "jsonld",
    ".trix": "trix",
    ".rj": "rdfjson",
    # N3 is treated as Turtle, exactly like the reference
    # (RDFLanguages.java:86 "N3 (treat as Turtle)")
    ".n3": "turtle",
    # binary encodings (RDFLanguages.java:142,148)
    ".rt": "rdfthrift",
    ".trdf": "rdfthrift",
    ".rpb": "rdfprotobuf",
    ".pbrdf": "rdfprotobuf",
}

# Formats parsed from raw bytes, not decoded text. Their blank-node
# labels are used DIRECTLY (no per-file scope hash): the reference's
# binary converters build nodes straight from the wire label
# (ThriftConvert.java convert bnode branch — createBlankNode(label);
# ProtobufConvert likewise), so machine-written labels survive a
# write→read round trip byte-exactly.
_BINARY_LANGS = {"rdfthrift", "rdfprotobuf"}


def lang_for_path(path: str) -> str | None:
    return _EXT_TO_LANG.get(os.path.splitext(path)[1].lower())


def parse_rdf_text(
    text: str, lang: str, base: str = "", on_error: str = "raise"
) -> list[tuple]:
    if lang == "ntriples":
        return parse_ntriples(text, on_error=on_error)
    if lang == "nquads":
        return parse_ntriples(text, quads=True, on_error=on_error)
    if lang == "turtle":
        return parse_turtle(text, base=base, on_error=on_error)
    if lang == "trig":
        return parse_trig(text, base=base, on_error=on_error)
    if lang == "rdfxml":
        from .. rdf.rdfxml import parse_rdfxml

        return parse_rdfxml(text, base=base, on_error=on_error)
    if lang == "jsonld":
        from ..rdf.jsonld import parse_jsonld

        return parse_jsonld(text, base=base, on_error=on_error)
    if lang == "trix":
        from ..rdf.trix import parse_trix

        return parse_trix(text, base=base, on_error=on_error)
    if lang == "rdfjson":
        from ..rdf.rdfjson import parse_rdfjson

        return parse_rdfjson(text, base=base, on_error=on_error)
    raise RDFParseError(f"unknown RDF language: {lang!r}")


def parse_rdf_bytes(data: bytes, lang: str, on_error: str = "raise") -> list[tuple]:
    """Binary-encoded RDF (no text decode, no base resolution — the wire
    formats carry absolute IRIs only)."""
    if lang == "rdfthrift":
        from ..rdf.thrift import parse_thrift

        return parse_thrift(data, on_error=on_error)
    if lang == "rdfprotobuf":
        from ..rdf.protobuf import parse_protobuf

        return parse_protobuf(data, on_error=on_error)
    raise RDFParseError(f"unknown binary RDF language: {lang!r}")


def _parse_files_batch(
    batch: pa.Table, run_seed: str, on_error: str
) -> pa.Table:
    cols: dict[str, list] = {name: [] for name in TRIPLE_SCHEMA.names}
    for path, data in zip(batch["path"].to_pylist(), batch["bytes"].to_pylist()):
        lang = lang_for_path(path)
        if lang is None:
            if on_error == "skip":
                continue
            raise RDFParseError(f"cannot determine RDF language of {path}")
        if lang in _BINARY_LANGS:
            triples = parse_rdf_bytes(bytes(data), lang, on_error=on_error)
            for row in triples:
                for name, val in zip(TRIPLE_SCHEMA.names, row + (path,)):
                    cols[name].append(val)
            continue
        text = bytes(data).decode("utf-8", errors="strict" if on_error == "raise" else "replace")
        base = "file://" + path
        triples = parse_rdf_text(text, lang, base=base, on_error=on_error)
        scope = BNodeScope(run_seed, path)  # bnode scope = the file (LabelToNode)
        for (s_kind, s_lex, p, o_kind, o_lex, o_dt, o_lang, g) in triples:
            if s_kind == KIND_BNODE:
                s_lex = scope.get(s_lex)
            if o_kind == KIND_BNODE:
                o_lex = scope.get(o_lex)
            elif o_kind == KIND_TRIPLE_TERM:
                # bnode labels INSIDE the reified term must go through the
                # same scope as the asserted triples, or the reifier and
                # its term silently diverge (and two files reusing '_:x'
                # collide) — ADVICE r1 #1
                o_lex = remap_triple_term_bnodes(o_lex, scope.get)
            if g.startswith("_:"):
                g = "_:" + scope.get(g[2:])
            cols["s_kind"].append(s_kind)
            cols["s_lex"].append(s_lex)
            cols["p"].append(p)
            cols["o_kind"].append(o_kind)
            cols["o_lex"].append(o_lex)
            cols["o_datatype"].append(o_dt)
            cols["o_lang"].append(o_lang)
            cols["g"].append(g)
            cols["doc_id"].append(path)
    return pa.Table.from_arrays(
        [pa.array(cols[f.name], f.type) for f in TRIPLE_SCHEMA], schema=TRIPLE_SCHEMA
    )


def read_rdf(paths, *, run_seed: str = "jena-ray-run-42", on_error: str = "raise"):
    """Directory / file list of .nt/.nq/.ttl/.trig files → triple Dataset."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True)
    return ds.map_batches(
        lambda b: _parse_files_batch(b, run_seed, on_error),
        batch_format="pyarrow",
    )
