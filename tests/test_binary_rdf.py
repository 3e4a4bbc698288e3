"""RDF Thrift / RDF Protobuf binary encodings: wire-level round trips,
value forms, prefix-name expansion, fragment concatenation, result sets,
and the distributed read/write paths.

No golden binary files ship with the reference (its Java tests generate
streams in-process), so the strategy here is the same: field numbering is
checked against the vendored IDLs (jena-arq/Grammar/RDF-Thrift/
BinaryRDF.thrift, jena-arq/Grammar/RDF-Protobuf/binary-rdf.proto) and
semantics against ThriftConvert.java / ProtobufConvert.java; these tests
pin round-trip fidelity and the canonical value-form decodings.
"""

import pytest

from jena_ray.model import (
    KIND_BNODE,
    KIND_IRI,
    KIND_LITERAL,
    KIND_TRIPLE_TERM,
    XSD_NS,
    RDFParseError,
)
from jena_ray.rdf.protobuf import (
    parse_protobuf,
    parse_protobuf_results,
    write_protobuf_results,
    write_protobuf_rows,
)
from jena_ray.rdf.thrift import (
    parse_thrift,
    parse_thrift_results,
    write_thrift_results,
    write_thrift_rows,
)

I, B, L, T = KIND_IRI, KIND_BNODE, KIND_LITERAL, KIND_TRIPLE_TERM

ROWS = [
    # plain IRI triple in the default graph
    (I, "http://e/s", "http://e/p", I, "http://e/o", "", "", ""),
    # bnode subject, plain literal (xsd:string travels dt-less on the wire)
    (B, "b0", "http://e/p", L, "hello", "", "", ""),
    # lang tag / lang + base direction
    (I, "http://e/s", "http://e/p", L, "bonjour", "", "fr", ""),
    (I, "http://e/s", "http://e/p", L, "shalom", "", "he--rtl", ""),
    # typed literal (non-value datatype stays lexical)
    (I, "http://e/s", "http://e/p", L, "2024-01-02", XSD_NS + "date", "", ""),
    # quad with an IRI graph and one with a bnode graph
    (I, "http://e/s", "http://e/p", I, "http://e/o", "", "", "http://e/g"),
    (I, "http://e/s", "http://e/p", L, "in-bg", "", "", "_:g1"),
    # triple term object (RDF-star), nested one level
    (I, "http://e/s", "http://e/said", T,
     '<http://e/a> <http://e/b> "c"', "", "", ""),
    # unicode + escapes survive UTF-8 binary strings untouched
    (I, "http://e/s", "http://e/p", L, 'tab\t"quote"\nnl — é☃', "", "", ""),
]

VALUE_ROWS = [
    (I, "http://e/s", "http://e/p", L, "42", XSD_NS + "integer", "", ""),
    (I, "http://e/s", "http://e/p", L, "-7", XSD_NS + "int", "", ""),
    (I, "http://e/s", "http://e/p", L, "1.50", XSD_NS + "decimal", "", ""),
    (I, "http://e/s", "http://e/p", L, "2.5", XSD_NS + "double", "", ""),
]


@pytest.mark.parametrize(
    "write,parse",
    [(write_thrift_rows, parse_thrift), (write_protobuf_rows, parse_protobuf)],
    ids=["thrift", "protobuf"],
)
def test_roundtrip_all_kinds(write, parse):
    data = write(ROWS)
    assert parse(data) == ROWS


@pytest.mark.parametrize(
    "write,parse",
    [(write_thrift_rows, parse_thrift), (write_protobuf_rows, parse_protobuf)],
    ids=["thrift", "protobuf"],
)
def test_fragments_concatenate(write, parse):
    whole = write(ROWS)
    frags = b"".join(write([r]) for r in ROWS)
    assert frags == whole
    assert parse(frags) == ROWS


@pytest.mark.parametrize(
    "write,parse",
    [(write_thrift_rows, parse_thrift), (write_protobuf_rows, parse_protobuf)],
    ids=["thrift", "protobuf"],
)
def test_values_mode_canonical_decode(write, parse):
    """Value forms decode to the canonical Java lexicals
    (ThriftConvert.java:297-318): Long.toString / BigDecimal.toPlainString
    / Double.toString — value-preserving, not lexical-preserving."""
    data = write(VALUE_ROWS, values=True)
    # value forms are smaller than the lexical forms they replace
    assert len(data) < len(write(VALUE_ROWS, values=False))
    got = parse(data)
    assert [r[4] for r in got] == ["42", "-7", "1.50", "2.5"]
    # integer-family datatypes widen to xsd:integer through the i64 form
    assert got[0][5] == XSD_NS + "integer"
    assert got[1][5] == XSD_NS + "integer"
    assert got[2][5] == XSD_NS + "decimal"
    assert got[3][5] == XSD_NS + "double"

    # canonicalizing decodes: non-canonical lexicals come back normalized
    odd = [
        (I, "http://e/s", "http://e/p", L, "+042", XSD_NS + "integer", "", ""),
        (I, "http://e/s", "http://e/p", L, "1e3", XSD_NS + "double", "", ""),
        (I, "http://e/s", "http://e/p", L, "1e30", XSD_NS + "double", "", ""),
    ]
    got = parse(write(odd, values=True))
    assert [r[4] for r in got] == ["42", "1000.0", "1.0E30"]

    # a decimal whose unscaled value overflows i64 stays lexical
    big = [(I, "http://e/s", "http://e/p", L,
            "123456789012345678901234567890.5", XSD_NS + "decimal", "", "")]
    assert parse(write(big, values=True)) == big


def test_thrift_prefix_name_expansion():
    """Reader-side RDF_PrefixDecl / RDF_PrefixName handling (the writer
    never abbreviates, so craft the stream by hand)."""
    from jena_ray.rdf.thrift import _Writer, CT_STRUCT, CT_BINARY

    wd = _Writer()
    # RDF_StreamRow.prefixDecl { prefix="ex", uri="http://e/" }
    wd.field(1, CT_STRUCT, 0)
    f = wd.field(1, CT_BINARY, 0)
    wd.string("ex")
    wd.field(2, CT_BINARY, f)
    wd.string("http://e/")
    wd.stop()
    wd.stop()
    decl = bytes(wd.buf)
    w = _Writer()
    # RDF_StreamRow.triple with prefixName subject/predicate/object
    w.field(2, CT_STRUCT, 0)
    last = 0
    for pos, local in ((1, "s"), (2, "p"), (3, "o")):
        last = w.field(pos, CT_STRUCT, last)  # RDF_Term
        w.field(4, CT_STRUCT, 0)  # prefixName
        f = w.field(1, CT_BINARY, 0)
        w.string("ex")
        w.field(2, CT_BINARY, f)
        w.string(local)
        w.stop()
        w.stop()
    w.stop()
    w.stop()
    triple_row = bytes(w.buf)
    assert parse_thrift(decl + triple_row) == [
        (I, "http://e/s", "http://e/p", I, "http://e/o", "", "", "")
    ]
    # undeclared prefix is an error
    assert parse_thrift(triple_row, on_error="skip") == []
    with pytest.raises(RDFParseError):
        parse_thrift(triple_row)


def test_protobuf_prefix_name_expansion():
    from jena_ray.rdf.protobuf import _w_len, _w_varint

    def msg(fid, payload):
        out = bytearray()
        _w_len(out, fid, payload)
        return out

    def string_field(fid, s):
        return msg(fid, bytearray(s.encode()))

    decl = string_field(1, "ex") + string_field(2, "http://e/")
    row1 = msg(1, decl)  # StreamRow.prefixDecl
    pn = string_field(1, "ex") + string_field(2, "x")
    term = msg(4, pn)  # RDF_Term.prefixName
    triple = msg(1, term) + msg(2, term) + msg(3, term)
    row2 = msg(2, triple)  # StreamRow.triple
    out = bytearray()
    for row in (row1, row2):
        _w_varint(out, len(row))
        out += row
    assert parse_protobuf(bytes(out)) == [
        (I, "http://e/x", "http://e/x", I, "http://e/x", "", "", "")
    ]


@pytest.mark.parametrize(
    "write,parse",
    [(write_thrift_rows, parse_thrift), (write_protobuf_rows, parse_protobuf)],
    ids=["thrift", "protobuf"],
)
def test_truncated_stream(write, parse):
    data = write(ROWS)
    with pytest.raises(RDFParseError):
        parse(data[:-3])
    assert parse(data[:-3], on_error="skip") == ROWS[:-1]


@pytest.mark.parametrize(
    "write,parse",
    [
        (write_thrift_results, parse_thrift_results),
        (write_protobuf_results, parse_protobuf_results),
    ],
    ids=["srt", "srp"],
)
def test_result_set_roundtrip(write, parse):
    vars_ = ["s", "v"]
    rows = [
        [(I, "http://e/s", "", ""), (L, "12", XSD_NS + "integer", "")],
        [(B, "b7", "", ""), None],  # unbound → RDF_UNDEF
        [(L, "oui", "", "fr"), (T, '<http://e/a> <http://e/b> "c"', "", "")],
    ]
    data = write(vars_, rows)
    names, got = parse(data)
    assert names == vars_
    assert got == rows


def test_java_double_str():
    from jena_ray.rdf.thrift import _java_double_str

    assert _java_double_str(2.5) == "2.5"
    assert _java_double_str(1000.0) == "1000.0"
    assert _java_double_str(1e30) == "1.0E30"
    assert _java_double_str(1.5e-5) == "1.5E-5"
    assert _java_double_str(0.001) == "0.001"
    assert _java_double_str(-0.0) == "-0.0"
    assert _java_double_str(float("nan")) == "NaN"
    assert _java_double_str(float("-inf")) == "-Infinity"


@pytest.mark.usefixtures("ray_session")
def test_read_rdf_binary_files(tmp_path):
    """The RDFDataMgr facade reads .trdf / .rpb files distributed; bnode
    labels are direct (no per-file scope hash) per ThriftConvert."""
    from jena_ray.sources.readers import read_rdf

    (tmp_path / "a.trdf").write_bytes(write_thrift_rows(ROWS))
    (tmp_path / "b.rpb").write_bytes(write_protobuf_rows(ROWS))
    ds = read_rdf(str(tmp_path))
    rows = ds.take_all()
    assert len(rows) == 2 * len(ROWS)
    direct_labels = {r["s_lex"] for r in rows if r["s_kind"] == B}
    assert direct_labels == {"b0"}  # same label from both files, unscoped


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("fmt", ["rdfthrift", "rdfprotobuf"])
def test_write_rdf_binary_sink(tmp_path, fmt):
    """Distributed binary sink: per-block fragments, any concatenation
    order parses to the same triple set."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from jena_ray.model import TRIPLE_SCHEMA
    from jena_ray.stages.serialize import write_rdf_binary

    cols = list(zip(*[r + ("doc",) for r in ROWS]))
    table = pa.Table.from_arrays(
        [pa.array(c, f.type) for c, f in zip(cols, TRIPLE_SCHEMA)],
        schema=TRIPLE_SCHEMA,
    )
    ds = rd.from_arrow(table).repartition(3)
    out = str(tmp_path / fmt)
    write_rdf_binary(ds, out, fmt)
    frags = pq.read_table(out)["data"].to_pylist()
    assert len(frags) >= 1
    parse = parse_thrift if fmt == "rdfthrift" else parse_protobuf
    got = parse(b"".join(bytes(f) for f in frags))
    assert sorted(got) == sorted(ROWS)


@pytest.mark.usefixtures("ray_session")
def test_results_binary(tmp_path):
    import ray.data as rd

    from jena_ray.stages.serialize import results_binary, write_results

    ds = rd.from_items([{"a": "x", "b": 1}, {"a": "y", "b": 2}])
    names, rows = parse_thrift_results(results_binary(ds, "srt"))
    assert names == ["a", "b"]
    assert [r[0][1] for r in rows] == ["x", "y"]
    names2, rows2 = parse_protobuf_results(results_binary(ds, "srp"))
    assert (names2, rows2) == (names, rows)
    # write_results file forms
    out = write_results(ds, str(tmp_path / "srt"), "srt")
    data = open(f"{out}/results.srt", "rb").read()
    assert parse_thrift_results(data) == (names, rows)
