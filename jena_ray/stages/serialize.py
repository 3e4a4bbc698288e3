"""Serialization stages: N-Triples/N-Quads (streaming) and Turtle-flat.

Parity (SURVEY §2.2):
- NT/NQ: riot/writer/NTriplesWriter.java + NodeFormatterNT.java:32-97 —
  one line per triple, fully streaming (stateless map_batches)
- Turtle-flat: riot/writer/WriterStreamRDFFlat.java — a per-batch prefix
  header + one triple per line with prefix abbreviation; no cross-batch
  state (the streaming writers intentionally avoid subject grouping)
- result-set writers (rows → CSV/JSON): ds.write_csv / write_json
"""

from __future__ import annotations

import pyarrow as pa

from ..model import KIND_BNODE, KIND_IRI, KIND_LITERAL, KIND_TRIPLE_TERM, XSD_STRING
from ..rdf.escapes import escape_string
from ..rdf.ntriples import format_triple

_COLS = ["s_kind", "s_lex", "p", "o_kind", "o_lex", "o_datatype", "o_lang", "g"]


def format_nt_batch(batch: pa.Table) -> pa.Table:
    cols = [batch.column(c).to_pylist() for c in _COLS]
    lines = [format_triple(*t) for t in zip(*cols)]
    return pa.Table.from_arrays([pa.array(lines, pa.large_string())], names=["line"])


DEFAULT_PREFIXES = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "owl": "http://www.w3.org/2002/07/owl#",
}


def _abbrev(iri: str, prefixes: dict[str, str]) -> str | None:
    for pfx, ns in prefixes.items():
        if iri.startswith(ns):
            local = iri[len(ns):]
            if local and all(c.isalnum() or c in "_-" for c in local) \
                    and not local[0].isdigit():
                return f"{pfx}:{local}"
    return None


def _term_ttl(kind: int, lex: str, dt: str, lang: str, prefixes) -> str:
    if kind == KIND_IRI:
        short = _abbrev(lex, prefixes)
        return short if short else f"<{lex}>"
    if kind == KIND_LITERAL:
        body = '"' + escape_string(lex) + '"'
        if lang:
            return body + "@" + lang
        if dt and dt != XSD_STRING:
            short = _abbrev(dt, prefixes)
            return body + "^^" + (short if short else f"<{dt}>")
        return body
    if kind == KIND_TRIPLE_TERM:
        # o_lex is the canonical NT inner serialization; NT terms are
        # valid Turtle tokens, so emit it verbatim inside <<( )>>
        return "<<( " + lex + " )>>"
    if kind == KIND_BNODE:
        return "_:" + lex
    raise ValueError(f"unknown term kind {kind} (lex {lex!r})")


def format_turtle_flat_batch(batch: pa.Table, prefixes=None) -> pa.Table:
    """Per-batch header of @prefix lines + flat triples (no grouping)."""
    prefixes = prefixes or DEFAULT_PREFIXES
    header = [f"@prefix {p}: <{ns}> ." for p, ns in sorted(prefixes.items())]
    cols = [batch.column(c).to_pylist() for c in _COLS]
    lines = list(header)
    for s_kind, s_lex, p, o_kind, o_lex, o_dt, o_lang, _g in zip(*cols):
        s = _term_ttl(s_kind, s_lex, "", "", prefixes)
        pred = "a" if p == "http://www.w3.org/1999/02/22-rdf-syntax-ns#type" \
            else _term_ttl(KIND_IRI, p, "", "", prefixes)
        o = _term_ttl(o_kind, o_lex, o_dt, o_lang, prefixes)
        lines.append(f"{s} {pred} {o} .")
    return pa.Table.from_arrays([pa.array(lines, pa.large_string())], names=["line"])


def write_ntriples(triples_ds, out_dir: str):
    """Streaming NT sink: formatted lines as single-column text parquet
    (swap for write_text/object storage at deployment)."""
    triples_ds.map_batches(format_nt_batch, batch_format="pyarrow").write_parquet(
        out_dir
    )
    return out_dir


def write_results(ds, out_dir: str, fmt: str = "csv"):
    """Result-set writers (rows, not triples) — the analog of the
    reference's SPARQL result-set serializers (riot/rowset/rw/,
    RowSetWriterRegistry.java): any row-shaped Dataset to CSV / JSON."""
    if fmt == "csv":
        ds.write_csv(out_dir)
    elif fmt == "json":
        ds.write_json(out_dir)
    elif fmt == "parquet":
        ds.write_parquet(out_dir)
    else:
        raise ValueError(f"unknown result format: {fmt!r}")
    return out_dir
