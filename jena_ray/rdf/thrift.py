"""RDF Thrift (RDF binary encoding) reader / writer.

Apache Jena's RDF Thrift is a stream of ``RDF_StreamRow`` Thrift structs
written with the Thrift *compact protocol*, no message envelope — struct
after struct until EOF (reference: jena-arq/Grammar/RDF-Thrift/
BinaryRDF.thrift; stream framing TRDF.java:67-104 — TCompactProtocol over
a buffered IOStream transport; row loop IteratorThriftRDF.java;
term conversion ThriftConvert.java:132-239 toThrift /
ThriftConvert.java:243-335 convert; value forms toThriftValue
ThriftConvert.java:69-120).

This module is a self-contained pure-Python implementation of exactly the
compact-protocol subset the IDL needs (varint/zigzag ints, strings,
structs, unions, lists, little-endian doubles — the Java library's
``fixedLongToBytes`` byte order). It is the stateless parse/serialize
kernel used inside ``map_batches``: parsing one file's bytes yields the
engine's 8-tuples ``(s_kind, s_lex, p, o_kind, o_lex, o_dt, o_lang, g)``
and writing a batch of triple rows yields a bytes fragment.  RDF Thrift
streams are concatenable (each row is self-delimiting and the only
cross-row state is prefix declarations, which the writer never emits), so
per-block fragments written in order form a valid file — the distributed
write path.

Semantics mirrored from the reference:

* IRIs may arrive abbreviated as ``RDF_PrefixName``; the reader keeps a
  running prefix map from ``RDF_PrefixDecl`` rows and expands them
  (ThriftConvert.convert prefixName branch).  The writer emits full IRIs.
* xsd:string / rdf:langString / rdf:dirLangString literals are written
  without a datatype field (ThriftConvert.java:186-190); base direction
  travels in its own field and maps to the engine's ``lang--dir`` o_lang
  convention.
* ``values`` mode (RDFFormat.RDF_THRIFT_VALUES): xsd integer family /
  xsd:decimal / xsd:double literals with valid lexicals become
  valInteger / valDecimal / valDouble; decoding restores the *canonical*
  Java lexical (Long.toString / BigDecimal.toPlainString /
  Double.toString — ThriftConvert.java:297-318), so the round trip is
  value-preserving, not lexical-preserving, exactly like the reference.
* Variables / ANY / UNDEF terms never appear in graph streams and are
  rejected in triple positions (ParserProfileStd positional checks).
"""

from __future__ import annotations

import io
import struct as _struct

from ..model import (
    KIND_BNODE,
    KIND_IRI,
    KIND_LITERAL,
    KIND_TRIPLE_TERM,
    RDF_LANGSTRING,
    RDF_NS,
    XSD_NS,
    XSD_STRING,
    RDFParseError,
)
from .tripleterm import parse_tt, serialize_tt

RDF_DIRLANGSTRING = RDF_NS + "dirLangString"
XSD_INTEGER = XSD_NS + "integer"
XSD_DECIMAL = XSD_NS + "decimal"
XSD_DOUBLE = XSD_NS + "double"

# ---------------------------------------------------------------------------
# Thrift compact protocol primitives
# (apache/thrift doc/specs/thrift-compact-protocol.md; byte order of
# doubles follows the Java library Jena links against: little-endian)

CT_STOP = 0x00
CT_BOOL_TRUE = 0x01
CT_BOOL_FALSE = 0x02
CT_BYTE = 0x03
CT_I16 = 0x04
CT_I32 = 0x05
CT_I64 = 0x06
CT_DOUBLE = 0x07
CT_BINARY = 0x08
CT_LIST = 0x09
CT_SET = 0x0A
CT_MAP = 0x0B
CT_STRUCT = 0x0C


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_varint(out: bytearray, n: int) -> None:
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


class _Reader:
    """Cursor over one file's bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def at_eof(self) -> bool:
        return self.pos >= len(self.data)

    def byte(self) -> int:
        if self.pos >= len(self.data):
            raise RDFParseError("RDF Thrift: truncated stream")
        b = self.data[self.pos]
        self.pos += 1
        return b

    def varint(self) -> int:
        shift = 0
        result = 0
        while True:
            b = self.byte()
            result |= (b & 0x7F) << shift
            if not b & 0x80:
                return result
            shift += 7
            if shift > 70:
                raise RDFParseError("RDF Thrift: varint too long")

    def zz(self) -> int:
        return _unzigzag(self.varint())

    def string(self) -> str:
        n = self.varint()
        if self.pos + n > len(self.data):
            raise RDFParseError("RDF Thrift: truncated string")
        s = self.data[self.pos : self.pos + n].decode("utf-8")
        self.pos += n
        return s

    def double(self) -> float:
        if self.pos + 8 > len(self.data):
            raise RDFParseError("RDF Thrift: truncated double")
        (v,) = _struct.unpack_from("<d", self.data, self.pos)
        self.pos += 8
        return v

    def skip(self, ftype: int) -> None:
        """Skip one value of the given compact type (forward compat)."""
        if ftype in (CT_BOOL_TRUE, CT_BOOL_FALSE):
            return
        if ftype == CT_BYTE:
            self.byte()
        elif ftype in (CT_I16, CT_I32, CT_I64):
            self.varint()
        elif ftype == CT_DOUBLE:
            self.pos += 8
        elif ftype == CT_BINARY:
            n = self.varint()
            self.pos += n
        elif ftype in (CT_LIST, CT_SET):
            head = self.byte()
            size = (head >> 4) & 0x0F
            etype = head & 0x0F
            if size == 15:
                size = self.varint()
            for _ in range(size):
                self.skip(etype)
        elif ftype == CT_STRUCT:
            while True:
                b = self.byte()
                if b == CT_STOP:
                    return
                ft = b & 0x0F
                if (b >> 4) & 0x0F == 0:
                    self.zz()
                self.skip(ft)
        else:
            raise RDFParseError(f"RDF Thrift: cannot skip type {ftype}")

    def field_header(self, last_fid: int):
        """Returns (field_id, compact_type, new_last_fid) or None at STOP."""
        b = self.byte()
        if b == CT_STOP:
            return None
        ftype = b & 0x0F
        delta = (b >> 4) & 0x0F
        fid = last_fid + delta if delta else self.zz()
        return fid, ftype, fid


# ---------------------------------------------------------------------------
# struct decoders (field numbering follows BinaryRDF.thrift)


def _read_fields(r: _Reader):
    """Generator of (field_id, compact_type) for one struct."""
    last = 0
    while True:
        h = r.field_header(last)
        if h is None:
            return
        fid, ftype, last = h
        yield fid, ftype


def _read_prefix_name(r: _Reader) -> tuple[str, str]:
    prefix = local = ""
    for fid, ftype in _read_fields(r):
        if fid == 1 and ftype == CT_BINARY:
            prefix = r.string()
        elif fid == 2 and ftype == CT_BINARY:
            local = r.string()
        else:
            r.skip(ftype)
    return prefix, local


def _expand(prefix: str, local: str, pmap: dict) -> str:
    base = pmap.get(prefix)
    if base is None:
        raise RDFParseError(f"RDF Thrift: undeclared prefix {prefix!r}")
    return base + local


def _java_double_str(x: float) -> str:
    """Java ``Double.toString`` (ThriftConvert.java:306): shortest
    round-trip decimal, plain form for 1e-3 <= |x| < 1e7, otherwise
    computerized scientific notation ``d.dddE±e``; always a '.' digit."""
    if x != x:
        return "NaN"
    if x == float("inf"):
        return "Infinity"
    if x == float("-inf"):
        return "-Infinity"
    if x == 0.0:
        return "-0.0" if _struct.pack("<d", x)[7] & 0x80 else "0.0"
    sign = "-" if x < 0 else ""
    a = abs(x)
    rep = repr(a)  # shortest round-trip, same guarantee as Java
    if 1e-3 <= a < 1e7:
        # plain decimal form
        if "e" in rep or "E" in rep:
            # rare: repr chose sci inside the plain window — expand
            from decimal import Decimal

            rep = format(Decimal(rep), "f")
        if "." not in rep:
            rep += ".0"
        return sign + rep
    # scientific form d.ddddEe
    from decimal import Decimal

    d = Decimal(rep)
    digs = d.as_tuple().digits
    e10 = d.adjusted()
    ds = "".join(map(str, digs)).rstrip("0") or "0"
    mant_s = ds[0] + "." + (ds[1:] or "0")
    return f"{sign}{mant_s}E{e10}"


def _decimal_plain(value: int, scale: int) -> str:
    """Java ``BigDecimal.valueOf(value, scale).toPlainString()``."""
    sign = "-" if value < 0 else ""
    digits = str(abs(value))
    if scale <= 0:
        return sign + digits + "0" * (-scale)
    if len(digits) <= scale:
        digits = "0" * (scale - len(digits) + 1) + digits
    return sign + digits[:-scale] + "." + digits[-scale:]


def _read_literal(r: _Reader, pmap: dict) -> tuple[str, str, str]:
    """RDF_Literal → (lex, datatype, lang) in engine columns."""
    lex = ""
    lang = ""
    basedir = ""
    dt = ""
    for fid, ftype in _read_fields(r):
        if fid == 1 and ftype == CT_BINARY:
            lex = r.string()
        elif fid == 2 and ftype == CT_BINARY:
            lang = r.string()
        elif fid == 5 and ftype == CT_BINARY:
            basedir = r.string()
        elif fid == 3 and ftype == CT_BINARY:
            dt = r.string()
        elif fid == 4 and ftype == CT_STRUCT:
            dt = _expand(*_read_prefix_name(r), pmap)
        else:
            r.skip(ftype)
    if basedir:
        lang = lang + "--" + basedir
    if lang:
        # engine convention (model.py): lang-tagged rows carry o_datatype=""
        return lex, "", lang
    if dt in (RDF_LANGSTRING, RDF_DIRLANGSTRING):
        raise RDFParseError("RDF Thrift: langString literal without langtag")
    return lex, ("" if dt in ("", XSD_STRING) else dt), ""


def _read_term(r: _Reader, pmap: dict):
    """RDF_Term union → (kind, lex, dt, lang)."""
    term = None
    for fid, ftype in _read_fields(r):
        if fid == 1 and ftype == CT_STRUCT:  # iri
            iri = ""
            for f2, t2 in _read_fields(r):
                if f2 == 1 and t2 == CT_BINARY:
                    iri = r.string()
                else:
                    r.skip(t2)
            term = (KIND_IRI, iri, "", "")
        elif fid == 2 and ftype == CT_STRUCT:  # bnode
            label = ""
            for f2, t2 in _read_fields(r):
                if f2 == 1 and t2 == CT_BINARY:
                    label = r.string()
                else:
                    r.skip(t2)
            term = (KIND_BNODE, label, "", "")
        elif fid == 3 and ftype == CT_STRUCT:  # literal
            lex, dt, lang = _read_literal(r, pmap)
            term = (KIND_LITERAL, lex, dt, lang)
        elif fid == 4 and ftype == CT_STRUCT:  # prefixName
            term = (KIND_IRI, _expand(*_read_prefix_name(r), pmap), "", "")
        elif fid == 9 and ftype == CT_STRUCT:  # tripleTerm
            s, p, o = _read_triple_parts(r, pmap)
            term = (KIND_TRIPLE_TERM, serialize_tt(s, p, o), "", "")
        elif fid == 10 and ftype == CT_I64:  # valInteger
            term = (KIND_LITERAL, str(r.zz()), XSD_INTEGER, "")
        elif fid == 11 and ftype == CT_DOUBLE:  # valDouble
            term = (KIND_LITERAL, _java_double_str(r.double()), XSD_DOUBLE, "")
        elif fid == 12 and ftype == CT_STRUCT:  # valDecimal
            value = scale = 0
            for f2, t2 in _read_fields(r):
                if f2 == 1 and t2 == CT_I64:
                    value = r.zz()
                elif f2 == 2 and t2 == CT_I32:
                    scale = r.zz()
                else:
                    r.skip(t2)
            term = (KIND_LITERAL, _decimal_plain(value, scale), XSD_DECIMAL, "")
        elif fid in (5, 6, 7, 8):  # variable / any / undef / repeat
            r.skip(ftype)
            raise RDFParseError(
                "RDF Thrift: variable/ANY/UNDEF term in a graph stream"
            )
        else:
            r.skip(ftype)
    if term is None:
        raise RDFParseError("RDF Thrift: empty RDF_Term union")
    return term


def _read_triple_parts(r: _Reader, pmap: dict):
    s = p = o = None
    for fid, ftype in _read_fields(r):
        if fid == 1 and ftype == CT_STRUCT:
            s = _read_term(r, pmap)
        elif fid == 2 and ftype == CT_STRUCT:
            p = _read_term(r, pmap)
        elif fid == 3 and ftype == CT_STRUCT:
            o = _read_term(r, pmap)
        else:
            r.skip(ftype)
    if s is None or p is None or o is None:
        raise RDFParseError("RDF Thrift: incomplete triple")
    return s, p, o


def _read_quad_parts(r: _Reader, pmap: dict):
    s = p = o = g = None
    for fid, ftype in _read_fields(r):
        if fid == 1 and ftype == CT_STRUCT:
            s = _read_term(r, pmap)
        elif fid == 2 and ftype == CT_STRUCT:
            p = _read_term(r, pmap)
        elif fid == 3 and ftype == CT_STRUCT:
            o = _read_term(r, pmap)
        elif fid == 4 and ftype == CT_STRUCT:
            g = _read_term(r, pmap)
        else:
            r.skip(ftype)
    if s is None or p is None or o is None:
        raise RDFParseError("RDF Thrift: incomplete quad")
    return s, p, o, g


def _positional(s, p, o, g) -> tuple:
    """Apply the reference's positional constraints and flatten to the
    engine 8-tuple (ParserProfileStd.checkTriple/checkQuad)."""
    if s[0] not in (KIND_IRI, KIND_BNODE):
        raise RDFParseError("RDF Thrift: bad subject kind")
    if p[0] != KIND_IRI:
        raise RDFParseError("RDF Thrift: predicate must be an IRI")
    gname = ""
    if g is not None:
        if g[0] == KIND_IRI:
            gname = g[1]
        elif g[0] == KIND_BNODE:
            gname = "_:" + g[1]
        else:
            raise RDFParseError("RDF Thrift: bad graph name kind")
    return (s[0], s[1], p[1], o[0], o[1], o[2], o[3], gname)


def parse_thrift(data: bytes, *, on_error: str = "raise") -> list[tuple]:
    """Parse one RDF Thrift file (bytes) → engine 8-tuples.

    Prefix declarations update the running prefix map (and emit no row);
    triples land in the default graph (g=""), quads carry their graph.
    """
    r = _Reader(data)
    pmap: dict[str, str] = {}
    out: list[tuple] = []
    while not r.at_eof():
        start = r.pos
        try:
            row = None
            for fid, ftype in _read_fields(r):
                if fid == 1 and ftype == CT_STRUCT:  # prefixDecl
                    prefix = uri = ""
                    for f2, t2 in _read_fields(r):
                        if f2 == 1 and t2 == CT_BINARY:
                            prefix = r.string()
                        elif f2 == 2 and t2 == CT_BINARY:
                            uri = r.string()
                        else:
                            r.skip(t2)
                    pmap[prefix] = uri
                elif fid == 2 and ftype == CT_STRUCT:  # triple
                    row = _positional(*_read_triple_parts(r, pmap), None)
                elif fid == 3 and ftype == CT_STRUCT:  # quad
                    row = _positional(*_read_quad_parts(r, pmap))
                else:
                    r.skip(ftype)
            if row is not None:
                out.append(row)
        except RDFParseError:
            if on_error == "skip":
                # binary streams cannot resynchronize after corruption —
                # drop the remainder of the file (the reference aborts)
                break
            raise RDFParseError(
                f"RDF Thrift: bad stream row at byte {start}"
            ) from None
    return out


# ---------------------------------------------------------------------------
# writer


class _Writer:
    def __init__(self):
        self.buf = bytearray()

    def field(self, fid: int, ftype: int, last: int) -> int:
        delta = fid - last
        if 0 < delta <= 15:
            self.buf.append((delta << 4) | ftype)
        else:
            self.buf.append(ftype)
            _write_varint(self.buf, _zigzag(fid))
        return fid

    def stop(self) -> None:
        self.buf.append(CT_STOP)

    def string(self, s: str) -> None:
        b = s.encode("utf-8")
        _write_varint(self.buf, len(b))
        self.buf += b

    def i_zz(self, n: int) -> None:
        _write_varint(self.buf, _zigzag(n))

    def double(self, x: float) -> None:
        self.buf += _struct.pack("<d", x)


def _w_string_struct(w: _Writer, fid: int, value: str) -> None:
    """Write a one-string-field struct (RDF_IRI / RDF_BNode /
    RDF_PrefixDecl half) as field `fid` of the enclosing struct."""
    w.field(fid, CT_STRUCT, 0)
    w.field(1, CT_BINARY, 0)
    w.string(value)
    w.stop()


_INT_DTS = {
    XSD_INTEGER,
    XSD_NS + "long",
    XSD_NS + "int",
    XSD_NS + "short",
    XSD_NS + "byte",
}
_I64_MIN, _I64_MAX = -(1 << 63), (1 << 63) - 1


def _try_value_form(w: _Writer, lex: str, dt: str) -> bool:
    """values-mode encoding (ThriftConvert.toThriftValue): writes the
    union's value field and returns True when the literal qualifies."""
    try:
        if dt in _INT_DTS:
            v = int(lex, 10)
            if _I64_MIN <= v <= _I64_MAX:
                w.field(10, CT_I64, 0)
                w.i_zz(v)
                return True
        elif dt == XSD_DECIMAL:
            from decimal import Decimal

            d = Decimal(lex)
            sign, digits, exp = d.as_tuple()
            unscaled = int("".join(map(str, digits))) * (-1 if sign else 1)
            scale = -exp
            if _I64_MIN <= unscaled <= _I64_MAX and -(1 << 31) <= scale < (1 << 31):
                w.field(12, CT_STRUCT, 0)
                f2 = w.field(1, CT_I64, 0)
                w.i_zz(unscaled)
                w.field(2, CT_I32, f2)
                w.i_zz(scale)
                w.stop()
                return True
        elif dt == XSD_DOUBLE:
            w.field(11, CT_DOUBLE, 0)
            w.double(float(lex))
            return True
    except (ValueError, ArithmeticError):
        return False
    return False


def _write_term_fields(w: _Writer, term, *, values: bool) -> None:
    """Write the single union field of one RDF_Term struct (the caller
    opens the struct and writes its STOP)."""
    kind, lex, dt, lang = term
    if kind == KIND_IRI:
        _w_string_struct(w, 1, lex)
        return
    if kind == KIND_BNODE:
        _w_string_struct(w, 2, lex)
        return
    if kind == KIND_TRIPLE_TERM:
        s, p, o = parse_tt(lex)
        w.field(9, CT_STRUCT, 0)
        f2 = _write_term(w, 1, 0, s, values=values)
        f2 = _write_term(w, 2, f2, p, values=values)
        _write_term(w, 3, f2, o, values=values)
        w.stop()
        return
    # literal
    if values and not lang and _try_value_form(w, lex, dt):
        return
    w.field(3, CT_STRUCT, 0)
    f2 = w.field(1, CT_BINARY, 0)
    w.string(lex)
    if lang:
        tag, _, basedir = lang.partition("--")
        f2 = w.field(2, CT_BINARY, f2)
        w.string(tag)
        if basedir:
            f2 = w.field(5, CT_BINARY, f2)
            w.string(basedir)
    elif dt and dt != XSD_STRING:
        f2 = w.field(3, CT_BINARY, f2)
        w.string(dt)
    w.stop()


def _write_term(w: _Writer, fid: int, last: int, term, *, values: bool) -> int:
    """Write one RDF_Term struct as field `fid` of the enclosing struct."""
    last = w.field(fid, CT_STRUCT, last)
    _write_term_fields(w, term, values=values)
    w.stop()
    return last


def write_thrift_rows(rows, *, values: bool = False) -> bytes:
    """Iterable of engine 8-tuples → one RDF Thrift fragment (bytes).

    Rows with g=="" become RDF_StreamRow.triple, others RDF_StreamRow.quad
    (StreamRDF2Thrift.java triple/quad events). Fragments concatenate.
    """
    w = _Writer()
    for (s_kind, s_lex, p, o_kind, o_lex, o_dt, o_lang, g) in rows:
        s = (s_kind, s_lex, "", "")
        pt = (KIND_IRI, p, "", "")
        o = (o_kind, o_lex, o_dt, o_lang)
        if g:
            w.field(3, CT_STRUCT, 0)  # StreamRow.quad
        else:
            w.field(2, CT_STRUCT, 0)  # StreamRow.triple
        f = _write_term(w, 1, 0, s, values=values)
        f = _write_term(w, 2, f, pt, values=values)
        f = _write_term(w, 3, f, o, values=values)
        if g:
            gterm = (
                (KIND_BNODE, g[2:], "", "")
                if g.startswith("_:")
                else (KIND_IRI, g, "", "")
            )
            _write_term(w, 4, f, gterm, values=values)
        w.stop()  # inner triple/quad struct
        w.stop()  # StreamRow union struct
    return bytes(w.buf)


# ---------------------------------------------------------------------------
# SPARQL result sets (RDF_VarTuple header + RDF_DataTuple rows —
# Binding2Thrift.java / Thift2Binding.java; Jena content type
# application/sparql-results+thrift, "srt")


def write_thrift_results(var_names: list[str], rows: list[list]) -> bytes:
    """Result set → SRT bytes. `rows` holds per-var terms as engine
    4-tuples (kind, lex, dt, lang) or None for unbound (→ RDF_UNDEF)."""
    w = _Writer()
    # RDF_VarTuple { 1: list<RDF_VAR> }
    w.field(1, CT_LIST, 0)
    n = len(var_names)
    if n < 15:
        w.buf.append((n << 4) | CT_STRUCT)
    else:
        w.buf.append(0xF0 | CT_STRUCT)
        _write_varint(w.buf, n)
    for name in var_names:
        w.field(1, CT_BINARY, 0)
        w.string(name)
        w.stop()
    w.stop()
    for row in rows:
        w.field(1, CT_LIST, 0)
        if n < 15:
            w.buf.append((n << 4) | CT_STRUCT)
        else:
            w.buf.append(0xF0 | CT_STRUCT)
            _write_varint(w.buf, n)
        for term in row:
            # unions as list elements are structs themselves: one union
            # field (or RDF_UNDEF for unbound) then STOP
            if term is None:
                w.field(7, CT_STRUCT, 0)  # undefined
                w.stop()
            else:
                _write_term_union(w, term)
            w.stop()
        w.stop()
    return bytes(w.buf)


def _write_term_union(w: _Writer, term) -> None:
    """Write the FIELDS of one RDF_Term union (caller writes the STOP)."""
    _write_term_fields(w, term, values=False)


def parse_thrift_results(data: bytes):
    """SRT bytes → (var_names, rows of engine 4-tuples / None)."""
    r = _Reader(data)
    var_names: list[str] = []
    first = True
    rows: list[list] = []
    while not r.at_eof():
        tuple_terms: list = []
        names: list[str] = []
        for fid, ftype in _read_fields(r):
            if fid == 1 and ftype == CT_LIST:
                head = r.byte()
                size = (head >> 4) & 0x0F
                etype = head & 0x0F
                if size == 15:
                    size = r.varint()
                for _ in range(size):
                    if first:
                        name = ""
                        for f2, t2 in _read_fields(r):
                            if f2 == 1 and t2 == CT_BINARY:
                                name = r.string()
                            else:
                                r.skip(t2)
                        names.append(name)
                    else:
                        tuple_terms.append(_read_result_term(r))
            else:
                r.skip(ftype)
        if first:
            var_names = names
            first = False
        else:
            rows.append(tuple_terms)
    return var_names, rows


def _read_result_term(r: _Reader):
    term = None
    undef = False
    for fid, ftype in _read_fields(r):
        if fid == 7 and ftype == CT_STRUCT:  # undefined
            for _f2, t2 in _read_fields(r):
                r.skip(t2)
            undef = True
        elif fid == 1 and ftype == CT_STRUCT:
            iri = ""
            for f2, t2 in _read_fields(r):
                if f2 == 1 and t2 == CT_BINARY:
                    iri = r.string()
                else:
                    r.skip(t2)
            term = (KIND_IRI, iri, "", "")
        elif fid == 2 and ftype == CT_STRUCT:
            label = ""
            for f2, t2 in _read_fields(r):
                if f2 == 1 and t2 == CT_BINARY:
                    label = r.string()
                else:
                    r.skip(t2)
            term = (KIND_BNODE, label, "", "")
        elif fid == 3 and ftype == CT_STRUCT:
            lex, dt, lang = _read_literal(r, {})
            term = (KIND_LITERAL, lex, dt, lang)
        elif fid == 9 and ftype == CT_STRUCT:
            s, p, o = _read_triple_parts(r, {})
            term = (KIND_TRIPLE_TERM, serialize_tt(s, p, o), "", "")
        elif fid == 10 and ftype == CT_I64:
            term = (KIND_LITERAL, str(r.zz()), XSD_INTEGER, "")
        elif fid == 11 and ftype == CT_DOUBLE:
            term = (KIND_LITERAL, _java_double_str(r.double()), XSD_DOUBLE, "")
        elif fid == 12 and ftype == CT_STRUCT:
            value = scale = 0
            for f2, t2 in _read_fields(r):
                if f2 == 1 and t2 == CT_I64:
                    value = r.zz()
                elif f2 == 2 and t2 == CT_I32:
                    scale = r.zz()
                else:
                    r.skip(t2)
            term = (KIND_LITERAL, _decimal_plain(value, scale), XSD_DECIMAL, "")
        else:
            r.skip(ftype)
    if undef:
        return None
    if term is None:
        raise RDFParseError("RDF Thrift results: empty term")
    return term


# ---------------------------------------------------------------------------
# RDF Patch binary rows (RDF_Patch_Row union — BinaryRDF.thrift:158-165;
# stream framing identical to graph streams: struct after struct over the
# compact protocol, RDFPatchReaderBinary.java:118-160 /
# RDFChangesWriterBinary.java:94-190). Ops use the SAME codes/payloads as
# the text parser (state/patch.parse_patch_ops), so the transaction
# replay and effective-set logic is shared.

_PATCH_TXN = {0: "TX", 1: "TC", 2: "TA", 3: "Z"}  # enum PatchTxn
_PATCH_TXN_INV = {v: k for k, v in _PATCH_TXN.items()}


def _graph_str(term) -> str:
    if term is None:
        return ""
    if term[0] == KIND_IRI:
        return term[1]
    if term[0] == KIND_BNODE:
        return "_:" + term[1]
    raise RDFParseError("RDF Patch: bad graph node kind")


def _graph_term(g: str):
    if not g:
        return None
    if g.startswith("_:"):
        return (KIND_BNODE, g[2:], "", "")
    return (KIND_IRI, g, "", "")


def parse_patch_thrift(data: bytes) -> list[tuple]:
    """Binary patch bytes → ordered [(code, payload), ...] with the text
    parser's op shapes: A/D → term 8-tuple, PA → (graph, prefix, uri),
    PD → (graph, prefix), H → (field, raw term text), TX/TC/TA/Z → None."""
    from .ntriples import format_term_raw

    r = _Reader(data)
    ops: list[tuple] = []
    while not r.at_eof():
        for fid, ftype in _read_fields(r):
            if fid == 1 and ftype == CT_STRUCT:  # header
                name, val = "", None
                for f2, t2 in _read_fields(r):
                    if f2 == 1 and t2 == CT_BINARY:
                        name = r.string()
                    elif f2 == 2 and t2 == CT_STRUCT:
                        val = _read_term(r, {})
                    else:
                        r.skip(t2)
                if val is None:
                    raise RDFParseError("RDF Patch: header without value")
                ops.append(("H", (name, format_term_raw(*val))))
            elif fid in (2, 3) and ftype == CT_STRUCT:  # dataAdd / dataDel
                s, p, o, g = _read_quad_parts(r, {})
                ops.append(("A" if fid == 2 else "D", _positional(s, p, o, g)))
            elif fid == 4 and ftype == CT_STRUCT:  # prefixAdd
                gterm, prefix, uri = None, "", ""
                for f2, t2 in _read_fields(r):
                    if f2 == 1 and t2 == CT_STRUCT:
                        gterm = _read_term(r, {})
                    elif f2 == 2 and t2 == CT_BINARY:
                        prefix = r.string()
                    elif f2 == 3 and t2 == CT_BINARY:
                        uri = r.string()
                    else:
                        r.skip(t2)
                ops.append(("PA", (_graph_str(gterm), prefix, uri)))
            elif fid == 5 and ftype == CT_STRUCT:  # prefixDel
                gterm, prefix = None, ""
                for f2, t2 in _read_fields(r):
                    if f2 == 1 and t2 == CT_STRUCT:
                        gterm = _read_term(r, {})
                    elif f2 == 2 and t2 == CT_BINARY:
                        prefix = r.string()
                    else:
                        r.skip(t2)
                ops.append(("PD", (_graph_str(gterm), prefix)))
            elif fid == 6 and ftype == CT_I32:  # txn enum
                code = _PATCH_TXN.get(r.zz())
                if code is None:
                    raise RDFParseError("RDF Patch: unknown PatchTxn value")
                ops.append((code, None))
            else:
                r.skip(ftype)
    return ops


def write_patch_thrift(ops) -> bytes:
    """Ordered (code, payload) ops → binary patch bytes (fragments
    concatenate, like graph streams). H payloads accept the text
    parser's raw term text or a (kind, lex, dt, lang) tuple."""
    from .tripleterm import _comp

    w = _Writer()
    for code, payload in ops:
        if code == "H":
            name, val = payload
            if isinstance(val, str):
                val, _pos = _comp(val, 0, "object")
            w.field(1, CT_STRUCT, 0)
            f = w.field(1, CT_BINARY, 0)
            w.string(name)
            _write_term(w, 2, f, val, values=False)
            w.stop()
        elif code in ("A", "D"):
            (s_kind, s_lex, p, o_kind, o_lex, o_dt, o_lang, g) = payload
            w.field(2 if code == "A" else 3, CT_STRUCT, 0)
            f = _write_term(w, 1, 0, (s_kind, s_lex, "", ""), values=False)
            f = _write_term(w, 2, f, (KIND_IRI, p, "", ""), values=False)
            f = _write_term(w, 3, f, (o_kind, o_lex, o_dt, o_lang), values=False)
            gt = _graph_term(g)
            if gt is not None:
                _write_term(w, 4, f, gt, values=False)
            w.stop()
        elif code == "PA":
            g, prefix, uri = payload
            w.field(4, CT_STRUCT, 0)
            f = 0
            gt = _graph_term(g)
            if gt is not None:
                f = _write_term(w, 1, 0, gt, values=False)
            f = w.field(2, CT_BINARY, f)
            w.string(prefix)
            w.field(3, CT_BINARY, f)
            w.string(uri)
            w.stop()
        elif code == "PD":
            g, prefix = payload
            w.field(5, CT_STRUCT, 0)
            f = 0
            gt = _graph_term(g)
            if gt is not None:
                f = _write_term(w, 1, 0, gt, values=False)
            w.field(2, CT_BINARY, f)
            w.string(prefix)
            w.stop()
        elif code in _PATCH_TXN_INV:
            w.field(6, CT_I32, 0)
            w.i_zz(_PATCH_TXN_INV[code])
        else:
            raise RDFParseError(f"RDF Patch: unknown op code {code!r}")
        w.stop()  # RDF_Patch_Row union struct
    return bytes(w.buf)


__all__ = [
    "parse_thrift",
    "write_thrift_rows",
    "parse_thrift_results",
    "write_thrift_results",
    "parse_patch_thrift",
    "write_patch_thrift",
]
