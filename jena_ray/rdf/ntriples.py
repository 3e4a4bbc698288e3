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
# whitespace between the lexical form and its @lang / ^^datatype
# annotation is permitted (RDF 1.2 c14n extra_whitespace tests)
_OBJ = (
    "(?P<o>"
    + g.IRIREF
    + "|"
    + g.BLANK_NODE_LABEL
    + "|"
    + g.STRING_LITERAL_QUOTE
    + "(?:[ \\t]*\\^\\^[ \\t]*"
    + g.IRIREF
    + "|[ \\t]*"
    + g.LANGTAG
    + ")?"
    + ")"
)
_GRAPH = "(?:[ \t]*(?P<g>" + g.IRIREF + "|" + g.BLANK_NODE_LABEL + "))?"

_TRIPLE_RE = re.compile(
    "^" + _OWS + _SUBJ + _WS + _PRED + _WS + _OBJ + _OWS + r"\." + _OWS + r"(?:#.*)?$"
)
_QUAD_RE = re.compile(
    "^" + _OWS + _SUBJ + _WS + _PRED + _WS + _OBJ + _GRAPH + _OWS + r"\." + _OWS + r"(?:#.*)?$"
)
_BLANK_RE = re.compile(r"^[ \t]*(?:#.*)?$")

_LIT_SPLIT_RE = re.compile(
    "^(?P<str>" + g.STRING_LITERAL_QUOTE + ")"
    "(?:[ \\t]*\\^\\^[ \\t]*(?P<dt>" + g.IRIREF + ")"
    "|[ \\t]*(?P<lang>" + g.LANGTAG + "))?$"
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
        dt = _parse_iri(m.group("dt"))
        # rdf:langString / rdf:dirLangString as explicit datatypes are
        # ill-formed — those datatypes require an actual language tag
        # (RDF 1.2 ntriples-langdir-bad-3/5)
        if dt in (RDF_LANGSTRING, RDF_LANGSTRING[: -len("langString")] + "dirLangString"):
            raise RDFParseError(f"{dt} literal requires a language tag")
        return KIND_LITERAL, lex, dt, ""
    if m.group("lang"):
        return KIND_LITERAL, lex, RDF_LANGSTRING, m.group("lang")[1:]
    return KIND_LITERAL, lex, XSD_STRING, ""


# --- RDF 1.2 slow path: triple terms <<( s p o )>> (nested) ---------------

_WS_RE = re.compile(r"[ \t]*")
_T_IRI_RE = re.compile(g.IRIREF)
_T_BNODE_RE = re.compile(g.BLANK_NODE_LABEL)
_T_LIT_RE = re.compile(
    g.STRING_LITERAL_QUOTE + r"(?:\^\^" + g.IRIREF + "|" + g.LANGTAG + ")?"
)


def _skip_ws(line: str, pos: int) -> int:
    return _WS_RE.match(line, pos).end()


def _parse_term12(line: str, pos: int, position: str):
    """Recursive term parser for RDF 1.2 lines. Returns ((kind, lex, dt,
    lang), new_pos). Triple terms allowed in object position only
    (LangNTriples 1.2 grammar)."""
    pos = _skip_ws(line, pos)
    if line.startswith("<<(", pos):
        if position != "object":
            raise RDFParseError("triple term only allowed in object position")
        pos += 3
        s, pos = _parse_term12(line, pos, "subject")
        p, pos = _parse_term12(line, pos, "predicate")
        o, pos = _parse_term12(line, pos, "object")
        pos = _skip_ws(line, pos)
        if not line.startswith(")>>", pos):
            raise RDFParseError("unterminated triple term")
        pos += 3
        if s[0] not in (KIND_IRI, KIND_BNODE):
            raise RDFParseError("bad triple-term subject")
        inner = " ".join(
            [format_term_raw(*s), format_term_raw(KIND_IRI, p[1]),
             format_term_raw(*o)]
        )
        from ..model import KIND_TRIPLE_TERM

        return (KIND_TRIPLE_TERM, inner, "", ""), pos
    m = _T_IRI_RE.match(line, pos)
    if m:
        iri = _parse_iri(m.group(0))
        if position == "predicate":
            return (KIND_IRI, iri, "", ""), m.end()
        return (KIND_IRI, iri, "", ""), m.end()
    if position == "predicate":
        raise RDFParseError(f"bad predicate at {line[pos:pos+20]!r}")
    m = _T_BNODE_RE.match(line, pos)
    if m:
        return (KIND_BNODE, m.group(0)[2:], "", ""), m.end()
    if position == "subject":
        raise RDFParseError(f"bad subject at {line[pos:pos+20]!r}")
    m = _T_LIT_RE.match(line, pos)
    if m:
        kind, lex, dt, lang = _parse_object(m.group(0))
        return (kind, lex, dt, lang), m.end()
    raise RDFParseError(f"bad term at {line[pos:pos+20]!r}")


def _parse_line12(line: str, quads: bool) -> tuple:
    s, pos = _parse_term12(line, 0, "subject")
    p, pos = _parse_term12(line, pos, "predicate")
    o, pos = _parse_term12(line, pos, "object")
    gname = ""
    if quads:
        pos2 = _skip_ws(line, pos)
        if not line.startswith(".", pos2):
            gterm, pos = _parse_term12(line, pos, "subject")
            gname = gterm[1] if gterm[0] == KIND_IRI else "_:" + gterm[1]
    pos = _skip_ws(line, pos)
    if not line.startswith(".", pos):
        raise RDFParseError(f"expected '.' at {line[pos:pos+20]!r}")
    rest = line[pos + 1:].strip()
    if rest and not rest.startswith("#"):
        raise RDFParseError(f"trailing content {rest!r}")
    return (s[0], s[1], p[1], o[0], o[1], o[2], o[3], gname)


def parse_ntriples(
    text: str, *, quads: bool = False, on_error: str = "raise"
) -> list[tuple]:
    """Parse an N-Triples (or N-Quads) document.

    Returns a list of 8-tuples
    ``(s_kind, s_lex, p, o_kind, o_lex, o_datatype, o_lang, g)``.
    Triple terms (RDF 1.2 ``<<( s p o )>>``) become KIND_TRIPLE_TERM
    objects whose o_lex is the canonical serialization of the inner
    triple. ``on_error``: "raise" (reference default — parse errors
    abort) or "skip" (drop bad lines; lenient web-corpus extraction).
    """
    stmt_re = _QUAD_RE if quads else _TRIPLE_RE
    out: list[tuple] = []
    for lineno, line in enumerate(text.split("\n"), 1):
        if _BLANK_RE.match(line):
            continue
        if "<<(" in line:
            try:
                out.append(_parse_line12(line, quads))
            except RDFParseError:
                if on_error == "skip":
                    continue
                raise RDFParseError(f"line {lineno}: cannot parse {line!r}") from None
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


def format_term(kind: int, lex: str, datatype: str = "", lang: str = "",
                *, c14n: bool = False) -> str:
    if kind == KIND_IRI:
        return "<" + escape_iri(lex) + ">"
    if kind == KIND_BNODE:
        return "_:" + _encode_bnode_label(lex)
    if kind == KIND_LITERAL:
        body = '"' + escape_string(lex) + '"'
        if lang:
            # canonical N-Triples (RDF 1.2 c14n) lowercases language tags
            return body + "@" + (lang.lower() if c14n else lang)
        if datatype and datatype != XSD_STRING:
            return body + "^^<" + escape_iri(datatype) + ">"
        return body
    if kind == 3:  # KIND_TRIPLE_TERM: o_lex is the serialized inner triple
        return "<<( " + lex + " )>>"
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


def format_term_raw(kind: int, lex: str, datatype: str = "", lang: str = "") -> str:
    """Like format_term but bnode labels verbatim (no safety encoding) —
    used for triple-term inner serialization where label identity must be
    preserved for isomorphism checks."""
    if kind == KIND_BNODE:
        return "_:" + lex
    return format_term(kind, lex, datatype, lang)


def format_triple(s_kind, s_lex, p, o_kind, o_lex, o_dt, o_lang, g_name="",
                  *, c14n: bool = False) -> str:
    parts = [
        format_term(s_kind, s_lex),
        format_term(KIND_IRI, p),
        format_term(o_kind, o_lex, o_dt, o_lang, c14n=c14n),
    ]
    if g_name:
        if g_name.startswith("_:"):
            parts.append(format_term(KIND_BNODE, g_name[2:]))
        else:
            parts.append(format_term(KIND_IRI, g_name))
    return " ".join(parts) + " ."
