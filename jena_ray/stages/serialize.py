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


def _binding_vars(names) -> list[str]:
    """Visible variables of a binding table (hidden term-metadata columns
    {v}__kind/__dt/__lang and the zero-var __exists marker excluded)."""
    return [n for n in names
            if not n.endswith(("__kind", "__dt", "__lang"))
            and n != "__exists"]


def _dataset_vars(ds) -> list[str]:
    """Visible variables straight from the Dataset schema — resolved
    BEFORE iterating batches so empty result sets still carry the
    projected variable list (the reference's RowSetWriter* always write
    the header/vars block; a zero-batch stream must too)."""
    schema = ds.schema(fetch_if_missing=True)
    return _binding_vars(schema.names if schema is not None else [])


def _term_sparql(lex, kind, dt, lang) -> str:
    """One binding value in SPARQL TSV term syntax
    (riot/rowset/rw/RowSetWriterTSV.java: Turtle-style terms)."""
    from ..model import KIND_BNODE, KIND_IRI, XSD_STRING

    if lex is None:
        return ""
    if kind == KIND_IRI:
        return f"<{lex}>"
    if kind == KIND_BNODE:
        return f"_:{lex}"
    esc = (
        str(lex)
        .replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )
    if lang:
        return f'"{esc}"@{lang}'
    if dt and dt != XSD_STRING:
        return f'"{esc}"^^<{dt}>'
    return f'"{esc}"'


def _row_terms(t: pa.Table, variables: list[str]):
    """Yield per-row (var → (lex, kind, dt, lang)) using the hidden term
    metadata when present; plain columns default to literals."""
    names = set(t.schema.names)
    cols = {}
    for v in variables:
        cols[v] = t[v].to_pylist()
        cols[v + "__kind"] = (
            t[v + "__kind"].to_pylist()
            if v + "__kind" in names
            else [None] * t.num_rows
        )
        cols[v + "__dt"] = (
            t[v + "__dt"].to_pylist() if v + "__dt" in names else [""] * t.num_rows
        )
        cols[v + "__lang"] = (
            t[v + "__lang"].to_pylist()
            if v + "__lang" in names
            else [""] * t.num_rows
        )
    for i in range(t.num_rows):
        yield {
            v: (
                cols[v][i],
                cols[v + "__kind"][i],
                cols[v + "__dt"][i] or "",
                cols[v + "__lang"][i] or "",
            )
            for v in variables
        }


def results_tsv(ds) -> str:
    """SPARQL TSV result set (riot/rowset/rw/RowSetWriterTSV.java):
    ``?var`` header line, one Turtle-term row per solution. Assembled on
    the driver — result sets are query OUTPUTS (driver-scale by nature);
    stream big row sets with write_results(fmt=\"csv\"/\"parquet\")."""
    variables = _dataset_vars(ds)
    lines: list[str] = ["\t".join("?" + v for v in variables)]
    for t in ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
        for row in _row_terms(t, variables):
            lines.append("\t".join(_term_sparql(*row[v]) for v in variables))
    return "\n".join(lines) + "\n"


def results_xml(ds) -> str:
    """SPARQL XML results format (riot/rowset/rw/RowSetWriterXML.java):
    <sparql><head>…<results><result><binding>…  Driver-assembled (see
    results_tsv)."""
    from xml.sax.saxutils import escape

    from ..model import KIND_BNODE, KIND_IRI

    body: list[str] = []
    variables = _dataset_vars(ds)
    for t in ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
        for row in _row_terms(t, variables):
            parts = ["  <result>"]
            for v in variables:
                lex, kind, dt, lang = row[v]
                if lex is None:
                    continue  # unbound: binding omitted, per the format
                if kind == KIND_IRI:
                    val = f"<uri>{escape(str(lex))}</uri>"
                elif kind == KIND_BNODE:
                    val = f"<bnode>{escape(str(lex))}</bnode>"
                elif lang:
                    val = (f'<literal xml:lang="{escape(lang)}">'
                           f"{escape(str(lex))}</literal>")
                elif dt:
                    val = (f'<literal datatype="{escape(dt)}">'
                           f"{escape(str(lex))}</literal>")
                else:
                    val = f"<literal>{escape(str(lex))}</literal>"
                parts.append(f'    <binding name="{escape(v)}">{val}</binding>')
            parts.append("  </result>")
            body.append("\n".join(parts))
    head = "\n".join(f'  <variable name="{v}"/>' for v in variables)
    return (
        '<?xml version="1.0"?>\n'
        '<sparql xmlns="http://www.w3.org/2005/sparql-results#">\n'
        "<head>\n" + head + ("\n" if head else "") + "</head>\n"
        "<results>\n" + "\n".join(body) + ("\n" if body else "") +
        "</results>\n</sparql>\n"
    )


def results_csv(ds) -> str:
    """W3C SPARQL 1.1 CSV results (riot/rowset/rw/RowSetWriterCSV.java):
    header of bare variable names, plain lexical forms (IRIs bare,
    bnodes ``_:label``), RFC 4180 quoting. Driver-assembled (see
    results_tsv); stream big row sets with write_results(fmt="csv")."""
    from ..model import KIND_BNODE

    def _cell(lex, kind, dt, lang) -> str:
        if lex is None:
            return ""
        s = f"_:{lex}" if kind == KIND_BNODE else str(lex)
        if any(c in s for c in (",", '"', "\n", "\r")):
            return '"' + s.replace('"', '""') + '"'
        return s

    variables = _dataset_vars(ds)
    lines: list[str] = [",".join(variables)]
    for t in ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
        for row in _row_terms(t, variables):
            lines.append(",".join(_cell(*row[v]) for v in variables))
    return "\r\n".join(lines) + "\r\n"


def results_json(ds) -> str:
    """W3C SPARQL 1.1 Results JSON (riot/rowset/rw/RowSetWriterJSON.java):
    ``{"head": {"vars": [...]}, "results": {"bindings": [...]}}`` with
    typed term objects. Driver-assembled (see results_tsv)."""
    import json as _json

    from ..model import KIND_BNODE, KIND_IRI, XSD_STRING

    bindings: list[dict] = []
    variables = _dataset_vars(ds)
    for t in ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
        for row in _row_terms(t, variables):
            b = {}
            for v in variables:
                lex, kind, dt, lang = row[v]
                if lex is None:
                    continue  # unbound: member omitted, per the format
                if kind == KIND_IRI:
                    b[v] = {"type": "uri", "value": str(lex)}
                elif kind == KIND_BNODE:
                    b[v] = {"type": "bnode", "value": str(lex)}
                else:
                    term: dict = {"type": "literal", "value": str(lex)}
                    if lang:
                        term["xml:lang"] = lang
                    elif dt and dt != XSD_STRING:
                        term["datatype"] = dt
                    b[v] = term
            bindings.append(b)
    return _json.dumps(
        {"head": {"vars": variables},
         "results": {"bindings": bindings}},
        indent=2,
    ) + "\n"


def write_results(ds, out_dir: str, fmt: str = "csv"):
    """Result-set writers (rows, not triples) — the analog of the
    reference's SPARQL result-set serializers (riot/rowset/rw/,
    RowSetWriterRegistry.java): CSV / JSON / parquet stream distributed;
    TSV / XML assemble one document (driver-scale result sets)."""
    if fmt == "csv":
        ds.write_csv(out_dir)
    elif fmt == "json":
        ds.write_json(out_dir)
    elif fmt == "parquet":
        ds.write_parquet(out_dir)
    elif fmt in ("tsv", "xml", "srj"):
        import os

        os.makedirs(out_dir, exist_ok=True)
        text = {"tsv": results_tsv, "xml": results_xml,
                "srj": results_json}[fmt](ds)
        path = os.path.join(out_dir, f"results.{fmt}")
        with open(path, "w", encoding="utf-8") as f:
            f.write(text)
    elif fmt in ("srt", "srp"):
        import os

        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, f"results.{fmt}")
        with open(path, "wb") as f:
            f.write(results_binary(ds, fmt))
    else:
        raise ValueError(f"unknown result format: {fmt!r}")
    return out_dir


# ---------------------------------------------------------------------------
# Binary RDF sinks (RDF Thrift / RDF Protobuf). Both wire formats are
# concatenable — every stream row is self-delimiting and the writers never
# emit cross-row prefix state — so one fragment per block, written in any
# order into a part-file directory, is a valid distributed serialization
# (the reference streams one file through StreamRDF2Thrift.java /
# StreamRDF2Protobuf.java; the fragment property is what makes the same
# encoding distributable).


def _batch_triple_rows(batch: pa.Table):
    cols = [
        batch[n].to_pylist()
        for n in (
            "s_kind", "s_lex", "p", "o_kind", "o_lex",
            "o_datatype", "o_lang", "g",
        )
    ]
    return zip(*cols)


def format_thrift_batch(batch: pa.Table, values: bool = False) -> pa.Table:
    from ..rdf.thrift import write_thrift_rows

    frag = write_thrift_rows(_batch_triple_rows(batch), values=values)
    return pa.table({"data": pa.array([frag], pa.large_binary())})


def format_protobuf_batch(batch: pa.Table, values: bool = False) -> pa.Table:
    from ..rdf.protobuf import write_protobuf_rows

    frag = write_protobuf_rows(_batch_triple_rows(batch), values=values)
    return pa.table({"data": pa.array([frag], pa.large_binary())})


def write_rdf_binary(
    triples_ds, out_dir: str, fmt: str = "rdfthrift", *, values: bool = False
):
    """Streaming binary sink: one wire fragment per block, stored as
    single-column binary parquet part-files (same deployment note as
    write_ntriples — swap for raw-file storage outside the sandbox).
    ``values=True`` selects the value-form encodings
    (RDFFormat.RDF_THRIFT_VALUES / RDF_PROTO_VALUES)."""
    fn = {
        "rdfthrift": format_thrift_batch,
        "rdfprotobuf": format_protobuf_batch,
    }.get(fmt)
    if fn is None:
        raise ValueError(f"unknown binary RDF format: {fmt!r}")
    triples_ds.map_batches(
        fn, batch_format="pyarrow", fn_kwargs={"values": values}
    ).write_parquet(out_dir)
    return out_dir


def results_binary(ds, fmt: str = "srt") -> bytes:
    """SPARQL result set in the Thrift ("srt") / Protobuf ("srp") binary
    encodings (Binding2Thrift.java / Binding2Protobuf.java). Driver-
    assembled like results_tsv — result sets are query outputs."""
    from ..model import KIND_LITERAL

    variables = _dataset_vars(ds)
    rows: list[list] = []
    for t in ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
        for row in _row_terms(t, variables):
            terms = []
            for v in variables:
                lex, kind, dt, lang = row[v]
                if lex is None:
                    terms.append(None)  # unbound → RDF_UNDEF
                else:
                    terms.append(
                        (KIND_LITERAL if kind is None else kind, str(lex), dt, lang)
                    )
            rows.append(terms)
    if fmt == "srt":
        from ..rdf.thrift import write_thrift_results

        return write_thrift_results(variables, rows)
    if fmt == "srp":
        from ..rdf.protobuf import write_protobuf_results

        return write_protobuf_results(variables, rows)
    raise ValueError(f"unknown binary result format: {fmt!r}")
