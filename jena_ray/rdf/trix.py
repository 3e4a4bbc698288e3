"""TriX reader — the XML triple interchange format.

Parity: jena-arq/.../riot/lang/ReaderTriX.java (SURVEY §2.1 "TriX").
Structure:

    <TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/">
      <graph>
        <uri>http://g</uri>?           <!-- optional graph name first -->
        <triple>
          <uri>..</uri> | <id>bnode</id> |
          <plainLiteral xml:lang="..">..</plainLiteral> |
          <typedLiteral datatype="..">..</typedLiteral>
          (exactly three terms)
        </triple>*
      </graph>*
    </TriX>
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from ..model import (
    KIND_BNODE,
    KIND_IRI,
    KIND_LITERAL,
    RDF_LANGSTRING,
    XSD_STRING,
    RDFParseError,
)

TRIX_NS = "http://www.w3.org/2004/03/trix/trix-1/"


def _term(el) -> tuple:
    tag = el.tag.rsplit("}", 1)[-1]
    text = el.text or ""
    if tag == "uri":
        return (KIND_IRI, text, "", "")
    if tag == "id":
        return (KIND_BNODE, text, "", "")
    if tag == "plainLiteral":
        lang = el.get("{http://www.w3.org/XML/1998/namespace}lang", "")
        if lang:
            return (KIND_LITERAL, text, RDF_LANGSTRING, lang)
        return (KIND_LITERAL, text, XSD_STRING, "")
    if tag == "typedLiteral":
        dt = el.get("datatype")
        if not dt:
            raise RDFParseError("typedLiteral without datatype")
        return (KIND_LITERAL, text, dt, "")
    raise RDFParseError(f"unknown TriX term element: {tag}")


def parse_trix(text: str, base: str = "", on_error: str = "raise") -> list[tuple]:
    """One TriX document → term 8-tuples (with graph names)."""
    try:
        root = ET.fromstring(text)
        if root.tag.rsplit("}", 1)[-1] != "TriX":
            raise RDFParseError("root element must be TriX")
        out: list[tuple] = []
        for graph in root:
            if graph.tag.rsplit("}", 1)[-1] != "graph":
                raise RDFParseError("TriX children must be <graph>")
            gname = ""
            children = list(graph)
            if children and children[0].tag.rsplit("}", 1)[-1] == "uri":
                gname = children[0].text or ""
                children = children[1:]
            for trip in children:
                if trip.tag.rsplit("}", 1)[-1] != "triple":
                    raise RDFParseError("expected <triple>")
                terms = [_term(t) for t in trip]
                if len(terms) != 3:
                    raise RDFParseError("a <triple> needs exactly 3 terms")
                (s_kind, s_lex, _, _), (p_kind, p_lex, _, _), o = terms
                if s_kind == KIND_LITERAL:
                    raise RDFParseError("literal subject")
                if p_kind != KIND_IRI:
                    raise RDFParseError("predicate must be a URI")
                out.append(
                    (s_kind, s_lex, p_lex, o[0], o[1], o[2], o[3], gname)
                )
        return out
    except (ET.ParseError, RDFParseError) as e:
        if on_error == "skip":
            return []
        if isinstance(e, RDFParseError):
            raise
        raise RDFParseError(f"TriX parse error: {e}") from None
