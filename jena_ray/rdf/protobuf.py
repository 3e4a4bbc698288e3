"""RDF Protobuf (RDF binary encoding, proto3) reader / writer.

Apache Jena's RDF Protobuf is a stream of *length-delimited*
``RDF_StreamRow`` proto3 messages — each row is preceded by its varint
byte length, exactly Java's ``writeDelimitedTo`` / ``parseDelimitedFrom``
(reference: jena-arq/Grammar/RDF-Protobuf/binary-rdf.proto; framing
PBufRDF.java:46-50, row loop Protobuf2StreamRDF.java; term conversion
ProtobufConvert.java — same semantics as the Thrift sibling
ThriftConvert.java, with one schema difference: ``RDF_Literal`` carries a
``oneof literalKind { simple / langtag / langdir / datatype / dtPrefix }``
so plain xsd:string literals are tagged ``simple=true`` instead of
omitting the field, and lang+direction travels as one ``langdir`` string
``"lang--dir"`` — which happens to be the engine's own o_lang form).

This module hand-rolls the proto3 wire format (no protobuf dependency):
varints, zigzag sint64/sint32, length-delimited strings/messages, and
64-bit little-endian doubles.  Like the Thrift form, a concatenation of
valid fragments is a valid file, so per-block fragments from
``map_batches`` written in order form the distributed write path.

Value forms (valInteger=20 / valDouble=21 / valDecimal=22) follow
ProtobufConvert.toProtobufValue and decode to the canonical Java lexical
forms, shared with the Thrift module.
"""

from __future__ import annotations

import struct as _struct

from ..model import (
    KIND_BNODE,
    KIND_IRI,
    KIND_LITERAL,
    KIND_TRIPLE_TERM,
    RDF_NS,
    XSD_NS,
    XSD_STRING,
    RDFParseError,
)
from .thrift import _decimal_plain, _java_double_str
from .tripleterm import parse_tt, serialize_tt

RDF_LANGSTRING = RDF_NS + "langString"
RDF_DIRLANGSTRING = RDF_NS + "dirLangString"
XSD_INTEGER = XSD_NS + "integer"
XSD_DECIMAL = XSD_NS + "decimal"
XSD_DOUBLE = XSD_NS + "double"

WT_VARINT = 0
WT_I64 = 1
WT_LEN = 2
WT_I32 = 5


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


class _Reader:
    def __init__(self, data: bytes, end: int | None = None):
        self.data = data
        self.pos = 0
        self.end = len(data) if end is None else end

    def at_eof(self) -> bool:
        return self.pos >= self.end

    def varint(self) -> int:
        shift = 0
        result = 0
        while True:
            if self.pos >= self.end:
                raise RDFParseError("RDF Protobuf: truncated varint")
            b = self.data[self.pos]
            self.pos += 1
            result |= (b & 0x7F) << shift
            if not b & 0x80:
                return result
            shift += 7
            if shift > 70:
                raise RDFParseError("RDF Protobuf: varint too long")

    def tag(self):
        t = self.varint()
        return t >> 3, t & 0x7

    def bytes_(self) -> bytes:
        n = self.varint()
        if self.pos + n > self.end:
            raise RDFParseError("RDF Protobuf: truncated bytes field")
        b = self.data[self.pos : self.pos + n]
        self.pos += n
        return b

    def string(self) -> str:
        return self.bytes_().decode("utf-8")

    def double(self) -> float:
        if self.pos + 8 > self.end:
            raise RDFParseError("RDF Protobuf: truncated double")
        (v,) = _struct.unpack_from("<d", self.data, self.pos)
        self.pos += 8
        return v

    def sub(self) -> "_Reader":
        """A cursor over one nested length-delimited message."""
        n = self.varint()
        if self.pos + n > self.end:
            raise RDFParseError("RDF Protobuf: truncated message")
        r = _Reader(self.data, self.pos + n)
        r.pos = self.pos
        self.pos += n
        return r

    def skip(self, wt: int) -> None:
        if wt == WT_VARINT:
            self.varint()
        elif wt == WT_I64:
            self.pos += 8
        elif wt == WT_LEN:
            n = self.varint()  # NB: varint() moves pos — must not fold
            self.pos += n      # into the augmented assignment

        elif wt == WT_I32:
            self.pos += 4
        else:
            raise RDFParseError(f"RDF Protobuf: unsupported wire type {wt}")


# ---------------------------------------------------------------------------
# message decoders (field numbering follows binary-rdf.proto)


def _read_prefix_name(r: _Reader) -> tuple[str, str]:
    prefix = local = ""
    while not r.at_eof():
        fid, wt = r.tag()
        if fid == 1 and wt == WT_LEN:
            prefix = r.string()
        elif fid == 2 and wt == WT_LEN:
            local = r.string()
        else:
            r.skip(wt)
    return prefix, local


def _expand(prefix: str, local: str, pmap: dict) -> str:
    base = pmap.get(prefix)
    if base is None:
        raise RDFParseError(f"RDF Protobuf: undeclared prefix {prefix!r}")
    return base + local


def _read_literal(r: _Reader, pmap: dict) -> tuple[str, str, str]:
    lex = ""
    lang = ""
    dt = ""
    while not r.at_eof():
        fid, wt = r.tag()
        if fid == 1 and wt == WT_LEN:
            lex = r.string()
        elif fid == 9 and wt == WT_VARINT:  # simple
            r.varint()
        elif fid == 2 and wt == WT_LEN:  # langtag
            lang = r.string()
        elif fid == 5 and wt == WT_LEN:  # langdir "lang--dir"
            lang = r.string()
        elif fid == 3 and wt == WT_LEN:  # datatype
            dt = r.string()
        elif fid == 4 and wt == WT_LEN:  # dtPrefix
            dt = _expand(*_read_prefix_name(r.sub()), pmap)
        else:
            r.skip(wt)
    if lang:
        return lex, "", lang
    if dt in (RDF_LANGSTRING, RDF_DIRLANGSTRING):
        raise RDFParseError("RDF Protobuf: langString literal without langtag")
    return lex, ("" if dt in ("", XSD_STRING) else dt), ""


def _read_string_msg(r: _Reader) -> str:
    val = ""
    while not r.at_eof():
        fid, wt = r.tag()
        if fid == 1 and wt == WT_LEN:
            val = r.string()
        else:
            r.skip(wt)
    return val


def _read_term(r: _Reader, pmap: dict):
    term = None
    while not r.at_eof():
        fid, wt = r.tag()
        if fid == 1 and wt == WT_LEN:  # iri
            term = (KIND_IRI, _read_string_msg(r.sub()), "", "")
        elif fid == 2 and wt == WT_LEN:  # bnode
            term = (KIND_BNODE, _read_string_msg(r.sub()), "", "")
        elif fid == 3 and wt == WT_LEN:  # literal
            lex, dt, lang = _read_literal(r.sub(), pmap)
            term = (KIND_LITERAL, lex, dt, lang)
        elif fid == 4 and wt == WT_LEN:  # prefixName
            term = (KIND_IRI, _expand(*_read_prefix_name(r.sub()), pmap), "", "")
        elif fid == 6 and wt == WT_LEN:  # tripleTerm
            s, p, o = _read_triple_parts(r.sub(), pmap)
            term = (KIND_TRIPLE_TERM, serialize_tt(s, p, o), "", "")
        elif fid == 20 and wt == WT_VARINT:  # valInteger (sint64)
            term = (KIND_LITERAL, str(_unzigzag(r.varint())), XSD_INTEGER, "")
        elif fid == 21 and wt == WT_I64:  # valDouble
            term = (KIND_LITERAL, _java_double_str(r.double()), XSD_DOUBLE, "")
        elif fid == 22 and wt == WT_LEN:  # valDecimal
            sr = r.sub()
            value = scale = 0
            while not sr.at_eof():
                f2, w2 = sr.tag()
                if f2 == 1 and w2 == WT_VARINT:
                    value = _unzigzag(sr.varint())
                elif f2 == 2 and w2 == WT_VARINT:
                    scale = _unzigzag(sr.varint())
                else:
                    sr.skip(w2)
            term = (KIND_LITERAL, _decimal_plain(value, scale), XSD_DECIMAL, "")
        elif fid in (5, 7, 8, 9) and wt == WT_LEN:  # var / any / undef / repeat
            r.skip(wt)
            raise RDFParseError(
                "RDF Protobuf: variable/ANY/UNDEF term in a graph stream"
            )
        else:
            r.skip(wt)
    if term is None:
        raise RDFParseError("RDF Protobuf: empty RDF_Term oneof")
    return term


def _read_triple_parts(r: _Reader, pmap: dict):
    s = p = o = None
    while not r.at_eof():
        fid, wt = r.tag()
        if fid == 1 and wt == WT_LEN:
            s = _read_term(r.sub(), pmap)
        elif fid == 2 and wt == WT_LEN:
            p = _read_term(r.sub(), pmap)
        elif fid == 3 and wt == WT_LEN:
            o = _read_term(r.sub(), pmap)
        else:
            r.skip(wt)
    if s is None or p is None or o is None:
        raise RDFParseError("RDF Protobuf: incomplete triple")
    return s, p, o


def _read_quad_parts(r: _Reader, pmap: dict):
    s = p = o = g = None
    while not r.at_eof():
        fid, wt = r.tag()
        if fid == 1 and wt == WT_LEN:
            s = _read_term(r.sub(), pmap)
        elif fid == 2 and wt == WT_LEN:
            p = _read_term(r.sub(), pmap)
        elif fid == 3 and wt == WT_LEN:
            o = _read_term(r.sub(), pmap)
        elif fid == 4 and wt == WT_LEN:
            g = _read_term(r.sub(), pmap)
        else:
            r.skip(wt)
    if s is None or p is None or o is None:
        raise RDFParseError("RDF Protobuf: incomplete quad")
    return s, p, o, g


def _positional(s, p, o, g) -> tuple:
    if s[0] not in (KIND_IRI, KIND_BNODE):
        raise RDFParseError("RDF Protobuf: bad subject kind")
    if p[0] != KIND_IRI:
        raise RDFParseError("RDF Protobuf: predicate must be an IRI")
    gname = ""
    if g is not None:
        if g[0] == KIND_IRI:
            gname = g[1]
        elif g[0] == KIND_BNODE:
            gname = "_:" + g[1]
        else:
            raise RDFParseError("RDF Protobuf: bad graph name kind")
    return (s[0], s[1], p[1], o[0], o[1], o[2], o[3], gname)


def parse_protobuf(data: bytes, *, on_error: str = "raise") -> list[tuple]:
    """Parse one RDF Protobuf file (length-delimited RDF_StreamRow
    messages) → engine 8-tuples. Prefix declarations update the running
    prefix map; ``base`` rows are consumed and ignored (terms arrive
    absolute)."""
    top = _Reader(data)
    pmap: dict[str, str] = {}
    out: list[tuple] = []
    while not top.at_eof():
        start = top.pos
        try:
            r = top.sub()  # one delimited RDF_StreamRow
            row = None
            while not r.at_eof():
                fid, wt = r.tag()
                if fid == 1 and wt == WT_LEN:  # prefixDecl
                    sr = r.sub()
                    prefix = uri = ""
                    while not sr.at_eof():
                        f2, w2 = sr.tag()
                        if f2 == 1 and w2 == WT_LEN:
                            prefix = sr.string()
                        elif f2 == 2 and w2 == WT_LEN:
                            uri = sr.string()
                        else:
                            sr.skip(w2)
                    pmap[prefix] = uri
                elif fid == 2 and wt == WT_LEN:  # triple
                    row = _positional(*_read_triple_parts(r.sub(), pmap), None)
                elif fid == 3 and wt == WT_LEN:  # quad
                    row = _positional(*_read_quad_parts(r.sub(), pmap))
                elif fid == 4 and wt == WT_LEN:  # base (RDF_IRI)
                    _read_string_msg(r.sub())
                else:
                    r.skip(wt)
            if row is not None:
                out.append(row)
        except RDFParseError:
            if on_error == "skip":
                break  # binary streams cannot resynchronize
            raise RDFParseError(
                f"RDF Protobuf: bad stream row at byte {start}"
            ) from None
    return out


# ---------------------------------------------------------------------------
# writer


def _w_varint(out: bytearray, n: int) -> None:
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _w_tag(out: bytearray, fid: int, wt: int) -> None:
    _w_varint(out, (fid << 3) | wt)


def _w_len(out: bytearray, fid: int, payload: bytes | bytearray) -> None:
    _w_tag(out, fid, WT_LEN)
    _w_varint(out, len(payload))
    out += payload


def _w_string_msg(fid: int, value: str) -> bytearray:
    """A message holding one string at field 1, returned as the payload
    of enclosing field `fid`."""
    inner = bytearray()
    _w_len(inner, 1, value.encode("utf-8"))
    outer = bytearray()
    _w_len(outer, fid, inner)
    return outer


_INT_DTS = {
    XSD_INTEGER,
    XSD_NS + "long",
    XSD_NS + "int",
    XSD_NS + "short",
    XSD_NS + "byte",
}
_I64_MIN, _I64_MAX = -(1 << 63), (1 << 63) - 1


def _try_value_form(lex: str, dt: str) -> bytearray | None:
    try:
        if dt in _INT_DTS:
            v = int(lex, 10)
            if _I64_MIN <= v <= _I64_MAX:
                out = bytearray()
                _w_tag(out, 20, WT_VARINT)
                _w_varint(out, _zigzag(v))
                return out
        elif dt == XSD_DECIMAL:
            from decimal import Decimal

            d = Decimal(lex)
            sign, digits, exp = d.as_tuple()
            unscaled = int("".join(map(str, digits))) * (-1 if sign else 1)
            scale = -exp
            if _I64_MIN <= unscaled <= _I64_MAX and -(1 << 31) <= scale < (1 << 31):
                inner = bytearray()
                _w_tag(inner, 1, WT_VARINT)
                _w_varint(inner, _zigzag(unscaled))
                _w_tag(inner, 2, WT_VARINT)
                _w_varint(inner, _zigzag(scale))
                out = bytearray()
                _w_len(out, 22, inner)
                return out
        elif dt == XSD_DOUBLE:
            out = bytearray()
            _w_tag(out, 21, WT_I64)
            out += _struct.pack("<d", float(lex))
            return out
    except (ValueError, ArithmeticError):
        return None
    return None


def _term_payload(term, *, values: bool) -> bytearray:
    """One RDF_Term message's bytes (the oneof field only)."""
    kind, lex, dt, lang = term
    if kind == KIND_IRI:
        return _w_string_msg(1, lex)
    if kind == KIND_BNODE:
        return _w_string_msg(2, lex)
    if kind == KIND_TRIPLE_TERM:
        s, p, o = parse_tt(lex)
        inner = bytearray()
        _w_len(inner, 1, _term_payload(s, values=values))
        _w_len(inner, 2, _term_payload(p, values=values))
        _w_len(inner, 3, _term_payload(o, values=values))
        out = bytearray()
        _w_len(out, 6, inner)
        return out
    # literal
    if values and not lang:
        got = _try_value_form(lex, dt)
        if got is not None:
            return got
    lit = bytearray()
    _w_len(lit, 1, lex.encode("utf-8"))
    if lang:
        tag, _, basedir = lang.partition("--")
        if basedir:
            _w_len(lit, 5, lang.encode("utf-8"))  # langdir "lang--dir"
        else:
            _w_len(lit, 2, tag.encode("utf-8"))
    elif dt and dt != XSD_STRING:
        _w_len(lit, 3, dt.encode("utf-8"))
    else:
        _w_tag(lit, 9, WT_VARINT)  # simple = true
        _w_varint(lit, 1)
    out = bytearray()
    _w_len(out, 3, lit)
    return out


def write_protobuf_rows(rows, *, values: bool = False) -> bytes:
    """Iterable of engine 8-tuples → one RDF Protobuf fragment (bytes):
    length-delimited RDF_StreamRow messages (triple rows for g=="",
    quad rows otherwise). Fragments concatenate."""
    out = bytearray()
    for (s_kind, s_lex, p, o_kind, o_lex, o_dt, o_lang, g) in rows:
        body = bytearray()
        _w_len(body, 1, _term_payload((s_kind, s_lex, "", ""), values=values))
        _w_len(body, 2, _term_payload((KIND_IRI, p, "", ""), values=values))
        _w_len(
            body, 3, _term_payload((o_kind, o_lex, o_dt, o_lang), values=values)
        )
        if g:
            gterm = (
                (KIND_BNODE, g[2:], "", "")
                if g.startswith("_:")
                else (KIND_IRI, g, "", "")
            )
            _w_len(body, 4, _term_payload(gterm, values=values))
        row = bytearray()
        _w_len(row, 3 if g else 2, body)  # StreamRow.quad / .triple
        _w_varint(out, len(row))  # writeDelimitedTo framing
        out += row
    return bytes(out)


# ---------------------------------------------------------------------------
# SPARQL result sets (delimited RDF_VarTuple then RDF_DataTuple rows —
# Binding2Protobuf.java / Protobuf2Binding.java; "srp")


def write_protobuf_results(var_names: list[str], rows: list[list]) -> bytes:
    out = bytearray()
    header = bytearray()
    for name in var_names:
        header += _w_string_msg(1, name)
    _w_varint(out, len(header))
    out += header
    undef = bytearray()
    _w_tag(undef, 8, WT_LEN)  # RDF_Term.undefined = empty RDF_UNDEF msg
    _w_varint(undef, 0)
    for row in rows:
        body = bytearray()
        for term in row:
            payload = undef if term is None else _term_payload(term, values=False)
            _w_len(body, 1, payload)
        _w_varint(out, len(body))
        out += body
    return bytes(out)


def parse_protobuf_results(data: bytes):
    top = _Reader(data)
    var_names: list[str] = []
    rows: list[list] = []
    first = True
    while not top.at_eof():
        r = top.sub()
        if first:
            while not r.at_eof():
                fid, wt = r.tag()
                if fid == 1 and wt == WT_LEN:
                    var_names.append(_read_string_msg(r.sub()))
                else:
                    r.skip(wt)
            first = False
            continue
        row: list = []
        while not r.at_eof():
            fid, wt = r.tag()
            if fid == 1 and wt == WT_LEN:
                tr = r.sub()
                # peek for the undefined oneof arm
                term = _read_result_term(tr)
                row.append(term)
            else:
                r.skip(wt)
        rows.append(row)
    return var_names, rows


def _read_result_term(r: _Reader):
    save = _Reader(r.data, r.end)
    save.pos = r.pos
    while not save.at_eof():
        fid, wt = save.tag()
        if fid == 8 and wt == WT_LEN:  # undefined
            return None
        save.skip(wt)
    return _read_term(r, {})


__all__ = [
    "parse_protobuf",
    "write_protobuf_rows",
    "parse_protobuf_results",
    "write_protobuf_results",
]
