"""N-Triples / N-Quads parser and serializer.

Parser semantics follow the reference line parser
(jena-arq/.../riot/lang/LangNTriples.java:41-75, term rules
LangNTuple.java:86-175) and positional checks
(ParserProfileStd.checkTriple, riot/system/ParserProfileStd.java:150-177).
Serializer follows NodeFormatterNT (riot/out/NodeFormatterNT.java:32-97).

This is the stateless parse kernel used inside ``map_batches`` — one call
parses one document's worth of text; no cross-document state exists (blank
node labels are document-scoped by the caller, mirroring
LabelToNode.createScopeByDocumentHash, riot/lang/LabelToNode.java:48).
"""

from __future__ import annotations

import re

from ..model import (
    KIND_BNODE,
    KIND_IRI,
    KIND_LITERAL,
    RDF_LANGSTRING,
    XSD_STRING,
    RDFParseError,
)
from . import grammar as g
from .escapes import escape_iri, escape_string, unescape_iri, unescape_string

# One full statement per line:  subject predicate object (graph)? '.'
# Whitespace between terms is optional where terms self-delimit
# (W3C minimal_whitespace.nt; the reference tokenizer needs no separators).
_WS = r"[ \t]*"
_OWS = r"[ \t]*"
_SUBJ = "(?P<s>" + g.IRIREF + "|" + g.BLANK_NODE_LABEL + ")"
_PRED = "(?P<p>" + g.IRIREF + ")"
_OBJ = (
    "(?P<o>"
    + g.IRIREF
    + "|"
    + g.BLANK_NODE_LABEL
    + "|"
    + g.STRING_LITERAL_QUOTE
    + "(?:\\^\\^"
    + g.IRIREF
    + "|"
    + g.LANGTAG
    + ")?"
    + ")"
)
_GRAPH = "(?:[ \t]+(?P<g>" + g.IRIREF + "|" + g.BLANK_NODE_LABEL + "))?"

_TRIPLE_RE = re.compile(
    "^" + _OWS + _SUBJ + _WS + _PRED + _WS + _OBJ + _OWS + r"\." + _OWS + r"(?:#.*)?$"
)
_QUAD_RE = re.compile(
    "^" + _OWS + _SUBJ + _WS + _PRED + _WS + _OBJ + _GRAPH + _OWS + r"\." + _OWS + r"(?:#.*)?$"
)
_BLANK_RE = re.compile(r"^[ \t]*(?:#.*)?$")

_LIT_SPLIT_RE = re.compile(
    "^(?P<str>" + g.STRING_LITERAL_QUOTE + ")"
    "(?:\\^\\^(?P<dt>" + g.IRIREF + ")|(?P<lang>" + g.LANGTAG + "))?$"
)


def _check_no_surrogates(s: str, what: str) -> None:
    for c in s:
        if 0xD800 <= ord(c) <= 0xDFFF:
            raise RDFParseError(f"lone surrogate in {what}: U+{ord(c):04X}")


_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")


def _parse_iri(tok: str) -> str:
    iri = unescape_iri(tok[1:-1])
    _check_no_surrogates(iri, "IRI")
    # Minimal well-formedness: the reference errors on spaces/control chars
    # post-unescape (ParserProfileStd.internalMakeIRI space check :103).
    for c in iri:
        if ord(c) <= 0x20 or c in '<>"{}|^`':
            raise RDFParseError(f"illegal character in IRI after unescape: {iri!r}")
    # N-Triples has no base: every IRI must be absolute (scheme required;
    # W3C nt-syntax-bad-uri-06..09).
    if not _SCHEME_RE.match(iri):
        raise RDFParseError(f"relative IRI not allowed in N-Triples: {iri!r}")
    return iri


def _parse_subject(tok: str) -> tuple[int, str]:
    if tok[0] == "<":
        return KIND_IRI, _parse_iri(tok)
    return KIND_BNODE, tok[2:]


def _parse_object(tok: str) -> tuple[int, str, str, str]:
    """Returns (kind, lex, datatype, lang)."""
    c0 = tok[0]
    if c0 == "<":
        return KIND_IRI, _parse_iri(tok), "", ""
    if c0 == "_":
        return KIND_BNODE, tok[2:], "", ""
    m = _LIT_SPLIT_RE.match(tok)
    if m is None:
        raise RDFParseError(f"malformed literal: {tok!r}")
    lex = unescape_string(m.group("str")[1:-1])
    _check_no_surrogates(lex, "literal")
    if m.group("dt"):
        return KIND_LITERAL, lex, _parse_iri(m.group("dt")), ""
    if m.group("lang"):
        return KIND_LITERAL, lex, RDF_LANGSTRING, m.group("lang")[1:]
    return KIND_LITERAL, lex, XSD_STRING, ""


def parse_ntriples(
    text: str, *, quads: bool = False, on_error: str = "raise"
) -> list[tuple]:
    """Parse an N-Triples (or N-Quads) document.

    Returns a list of 8-tuples
    ``(s_kind, s_lex, p, o_kind, o_lex, o_datatype, o_lang, g)``.
    ``on_error``: "raise" (reference default — parse errors abort) or
    "skip" (drop bad lines; used for lenient web-corpus extraction).
    """
    stmt_re = _QUAD_RE if quads else _TRIPLE_RE
    out: list[tuple] = []
    for lineno, line in enumerate(text.split("\n"), 1):
        if _BLANK_RE.match(line):
            continue
        m = stmt_re.match(line)
        if m is None:
            if on_error == "skip":
                continue
            raise RDFParseError(f"line {lineno}: cannot parse {line!r}")
        try:
            s_kind, s_lex = _parse_subject(m.group("s"))
            p = _parse_iri(m.group("p"))
            o_kind, o_lex, o_dt, o_lang = _parse_object(m.group("o"))
            gname = ""
            if quads and m.group("g"):
                gtok = m.group("g")
                gname = _parse_iri(gtok) if gtok[0] == "<" else "_:" + gtok[2:]
        except RDFParseError:
            if on_error == "skip":
                continue
            raise RDFParseError(f"line {lineno}: bad term in {line!r}") from None
        out.append((s_kind, s_lex, p, o_kind, o_lex, o_dt, o_lang, gname))
    return out


# --- serialization (NodeFormatterNT.java:32-97) -----------------------------


def format_term(kind: int, lex: str, datatype: str = "", lang: str = "") -> str:
    if kind == KIND_IRI:
        return "<" + escape_iri(lex) + ">"
    if kind == KIND_BNODE:
        return "_:" + _encode_bnode_label(lex)
    if kind == KIND_LITERAL:
        body = '"' + escape_string(lex) + '"'
        if lang:
            return body + "@" + lang
        if datatype and datatype != XSD_STRING:
            return body + "^^<" + escape_iri(datatype) + ">"
        return body
    raise RDFParseError(f"cannot format term kind {kind}")


# Blank-node label safety encoding (NodeFmtLib.encodeBNodeLabel,
# riot/out/NodeFmtLib.java:232-255): leading 'B', 'X' escapes unsafe chars
# as Xhh hex pairs so any internal label becomes a valid NT bnode label.
_SAFE_BNODE_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9_]*$")


def _encode_bnode_label(label: str) -> str:
    if _SAFE_BNODE_RE.match(label) and "X" not in label:
        return label
    out = ["B"]
    for c in label:
        if c.isalnum() and c != "X" and ord(c) < 128:
            out.append(c)
        else:
            for b in c.encode("utf-8"):
                out.append("X%02X" % b)
    return "".join(out)


def format_triple(s_kind, s_lex, p, o_kind, o_lex, o_dt, o_lang, g_name="") -> str:
    parts = [
        format_term(s_kind, s_lex),
        format_term(KIND_IRI, p),
        format_term(o_kind, o_lex, o_dt, o_lang),
    ]
    if g_name:
        if g_name.startswith("_:"):
            parts.append(format_term(KIND_BNODE, g_name[2:]))
        else:
            parts.append(format_term(KIND_IRI, g_name))
    return " ".join(parts) + " ."
