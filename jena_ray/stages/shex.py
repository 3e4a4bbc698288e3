"""ShEx validation — spec-level subset as a distributed per-focus stage.

Parity: jena-shex (Shex.java schema parse, ShexValidator.java validate
with a shape map, ShexReport.java statuses; ShExC grammar
parser/ShExC.jj), exercised against the vendored shexSpec/shexTest
validation corpus (tests/test_w3c_shex.py).

Implemented surface:

- shape declarations ``<Label> <shapeExpression>`` and ``start =``;
  shape expressions are boolean combinations (NOT > AND > OR) of:
  node constraints, braced shapes, ``@<ref>``, ``.``, parentheses
- node constraints: node kinds IRI / BNODE / LITERAL / NONLITERAL,
  datatype IRIs (with D-validity for the XSD numeric/boolean/temporal
  types — "1.0"^^xsd:integer does NOT satisfy xsd:integer), value sets
  (IRIs, literals incl. lang-tagged/typed/numeric, IRI stems ``<x>~``,
  literal stems ``"x"~``, language tags ``@en`` and stems ``@fr~``,
  stem ranges with exclusions ``[. - <x> - <y>~]``), XS facets
  (MIN/MAXLENGTH, LENGTH, MIN/MAXINCLUSIVE/EXCLUSIVE, TOTALDIGITS,
  FRACTIONDIGITS, ``/regex/flags``)
- triple expressions: EachOf ``;``, OneOf ``|``, grouping with group
  cardinalities, inverse constraints ``^<p>``, cardinalities
  ``? + * {m} {m,n} {m,*}``, CLOSED, EXTRA
- matching: exact ShEx partition semantics per focus node — a
  memoized backtracking matcher assigns the node's NEIGHBORHOOD
  (outgoing AND incoming arcs) to triple constraints; arcs whose
  predicate is mentioned but that match no constraint are admitted
  only by EXTRA; CLOSED rejects unmentioned outgoing predicates
- shape references: evaluated in dependency order of the ref graph's
  SCCs; acyclic refs get one distributed per-focus pass each and
  their conforming-node sets broadcast; recursive refs run the
  greatest-fixpoint iteration (maximal typing; negation into a cycle
  raises — non-stratified). Nodes ABSENT from the graph fall back to
  analytic empty-neighborhood conformance.
- shape maps: fixed nodes (IRIs, literals, bnodes) and
  ``{FOCUS a <C>}@<Shape>`` / ``{FOCUS <p> <o>}`` selectors; ``@START``.

NOT in subset (documented): semantic actions ``%``, IMPORT, EXTERNAL,
ABSTRACT/EXTENDS, triple-expression labels ``$``/inclusions ``&``.

Execution shape: the small schema + shape map broadcast; the data is
flipped into an ARC table (one row per triple per endpoint, outgoing
and incoming) hash-grouped by node so every focus node's full
neighborhood is co-located; groups validate with the per-group matcher.
Report rows: (focus, shape, status, reason)."""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from functools import lru_cache

import pandas as pd

from ..model import (KIND_BNODE, KIND_IRI, KIND_LITERAL, RDF_TYPE,
                     RDFParseError, XSD_NS, XSD_STRING)

_UNBOUNDED = -1
_RDF_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"


# --- AST ---------------------------------------------------------------------
# value / shape expressions are tagged tuples:
#   ("any",)                        wildcard '.'
#   ("nc", base, facets)            node constraint; base is None,
#                                   ("kind", k), ("datatype", iri) or
#                                   ("values", (item, ...)); facets is a
#                                   tuple of (name, value)
#   ("ref", label)                  @<label>
#   ("and", (e, ...)) ("or", (e, ...)) ("not", e)
#   ("shape", Shape)
# triple expressions:
#   ("tc", inverse, pred, valueExpr, lo, hi)
#   ("each", (sub, ...), lo, hi)    EachOf ';' (group cardinality)
#   ("one", (sub, ...), lo, hi)     OneOf '|'
#   ("empty",)


@dataclass
class Shape:
    label: str
    expr: tuple | None = None  # triple expression (None = empty shape)
    closed: bool = False
    extra: frozenset = frozenset()


class ShexSchema:
    def __init__(self, shapes: dict[str, tuple], prefixes: dict[str, str],
                 start: str | None = None):
        self.shapes = shapes      # label -> shape EXPRESSION
        self.prefixes = prefixes
        self.start = start        # label of the start expression


_TOKEN = re.compile(
    r"""[\s,]*(?:
        (?P<comment>\#[^\n]*|/\*[\s\S]*?\*/) |
        (?P<kw>(?i:PREFIX|BASE|CLOSED|EXTRA|IMPORT|EXTERNAL|ABSTRACT|
                EXTENDS|RESTRICTS|START|NOT|AND|OR|IRI|BNODE|NONLITERAL|
                LITERAL|MINLENGTH|MAXLENGTH|LENGTH|MININCLUSIVE|
                MINEXCLUSIVE|MAXINCLUSIVE|MAXEXCLUSIVE|TOTALDIGITS|
                FRACTIONDIGITS)\b) |
        (?P<iri><[^<>\s]*>) |
        (?P<bnode>_:[\w\-.·̀-ͯ‿-⁀]+) |
        (?P<langstem>@(?:[A-Za-z]+(?:-[A-Za-z0-9]+)*)?~|@[A-Za-z]+(?:-[A-Za-z0-9]+)*(?![\w:\-])) |
        (?P<pname>[A-Za-z_][\w\-.]*:[\w\-.%]*|:[\w\-.%]*|[A-Za-z_][\w\-.]*:) |
        (?P<a>a\b) |
        (?P<string>"{3}(?:[^\\]|\\.)*?"{3}|'{3}(?:[^\\]|\\.)*?'{3}
                   |"(?:[^"\\\n]|\\.)*"|'(?:[^'\\\n]|\\.)*') |
        (?P<regex>/(?:[^/\\\n\r]|\\.)+/[smix]*) |
        (?P<bool>(?:true|false)\b) |
        (?P<num>[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?) |
        (?P<card>[?*+]|\{[ \t]*[0-9]+(?:[ \t]*,[ \t]*(?:[0-9]+|\*))?[ \t]*\}) |
        (?P<dtmark>\^\^) |
        (?P<annot>//) |
        (?P<punct>[{}()\[\];@.|^~\-%$&=])
    )""",
    re.VERBOSE,
)

_ESC_MAP = {"t": "\t", "n": "\n", "r": "\r", "b": "\b", "f": "\f",
            '"': '"', "'": "'", "\\": "\\", "/": "/"}


def _unesc(s: str) -> str:
    if "\\" not in s:
        return s

    def rep(m):
        e = m.group(1)
        if e[0] in "uU" and len(e) > 1:
            return chr(int(e[1:], 16))
        if e in _ESC_MAP:
            return _ESC_MAP[e]
        raise RDFParseError(f"ShExC: bad string escape \\{e}")

    return re.sub(r"\\(u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8}|.)", rep, s)


def _sq(v: str) -> str:
    if v[:3] in ('"""', "'''"):
        return v[3:-3]
    return v[1:-1]


def _tokenize(text: str):
    pos = 0
    out = []
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if m is None or m.end() == pos:
            if not text[pos:].strip(" \t\r\n,"):
                break
            raise RDFParseError(
                f"ShExC: cannot tokenize at {text[pos:pos+24]!r}")
        pos = m.end()
        if m.lastgroup in (None, "comment"):
            continue
        kind = m.lastgroup
        val = m.group(kind)
        if kind == "kw":
            val = val.upper()
        out.append((kind, val))
    return out


def parse_shexc(text: str, base_iri: str = "") -> ShexSchema:
    toks = _tokenize(text)
    prefixes: dict[str, str] = {}
    base = [base_iri]
    shapes: dict[str, tuple] = {}
    start: list[str | None] = [None]
    i = 0
    n_anon = [0]

    def expand(kind: str, val: str) -> str:
        if kind == "iri":
            iri = _unesc(val[1:-1])
            if base[0] and ":" not in iri.split("/", 1)[0].split("#")[0]:
                b = base[0]
                if iri.startswith("#"):
                    return b.split("#")[0] + iri
                return b.rsplit("/", 1)[0] + "/" + iri
            return iri
        if kind == "bnode":
            return val  # bnode shape labels keep the _: form
        if kind == "pname":
            pfx, _, local = val.partition(":")
            if pfx not in prefixes:
                raise RDFParseError(f"ShExC: unknown prefix {pfx!r}")
            return prefixes[pfx] + local.replace("%", "%")
        raise RDFParseError(f"ShExC: expected IRI, got {val!r}")

    def peek(k=0):
        return toks[i + k] if i + k < len(toks) else ("eof", "")

    def lift_shape(shape: Shape) -> str:
        """Inline shape in value position → synthetic label (the
        conf-set machinery resolves it like any other ref)."""
        lbl = f"__inline_{n_anon[0]}"
        n_anon[0] += 1
        shapes[lbl] = ("shape", shape)
        return lbl

    _FACETS_STR = ("MINLENGTH", "MAXLENGTH", "LENGTH")
    _FACETS_NUM = ("MININCLUSIVE", "MINEXCLUSIVE", "MAXINCLUSIVE",
                   "MAXEXCLUSIVE", "TOTALDIGITS", "FRACTIONDIGITS")

    def parse_facets():
        nonlocal i
        facets = []
        while True:
            k, v = peek()
            if k == "kw" and v in _FACETS_STR:
                i += 1
                nk, nv = peek()
                if nk != "num":
                    raise RDFParseError(f"ShExC: {v} needs a number")
                i += 1
                facets.append((v, int(float(nv))))
            elif k == "kw" and v in _FACETS_NUM:
                i += 1
                nk, nv = peek()
                if nk != "num":
                    raise RDFParseError(f"ShExC: {v} needs a number")
                i += 1
                facets.append((v, float(nv)))
            elif k == "regex":
                i += 1
                body, _, flags = v[1:].rpartition("/")
                facets.append(("PATTERN", (body, flags)))
            else:
                break
        return tuple(facets)

    def parse_literal():
        """string ('@lang' | '^^dt')? → (lex, dt, lang)."""
        nonlocal i
        k, v = peek()
        if k == "string":
            i += 1
            lex = _unesc(_sq(v))
            nk, nv = peek()
            if nk == "langstem" and not nv.endswith("~"):
                i += 1
                return (lex, _RDF_LANGSTRING, nv[1:])
            if nk == "dtmark":
                i += 1
                dk, dv = peek()
                i += 1
                return (lex, expand(dk, dv), "")
            return (lex, XSD_STRING, "")
        if k == "num":
            i += 1
            dt = (XSD_NS + "double" if "e" in v.lower()
                  else XSD_NS + "decimal" if "." in v
                  else XSD_NS + "integer")
            return (v, dt, "")
        if k == "bool":
            i += 1
            return (v, XSD_NS + "boolean", "")
        raise RDFParseError(f"ShExC: expected literal, got {v!r}")

    def parse_vs_item():
        """One value-set member (possibly a stem / stem range)."""
        nonlocal i
        k, v = peek()
        if k == "punct" and v == ".":
            # wildcard stem range: . followed by exclusions
            i += 1
            excl = parse_exclusions()
            return ("range", ("wild",), excl)
        if k == "langstem":
            i += 1
            if v.endswith("~"):
                excl = parse_exclusions()
                return ("range", ("langstem", v[1:-1]), excl)
            return ("langtag", v[1:])
        if k == "punct" and v == "@" and peek(1) == ("punct", "~"):
            i += 2
            excl = parse_exclusions()
            return ("range", ("langstem", ""), excl)
        if k in ("string", "num", "bool"):
            lex, dt, lang = parse_literal()
            if peek() == ("punct", "~"):
                i += 1
                excl = parse_exclusions()
                return ("range", ("litstem", lex), excl)
            return ("lit", lex, dt, lang)
        if k in ("iri", "pname", "a"):
            iri = RDF_TYPE if k == "a" else expand(k, v)
            i += 1
            if peek() == ("punct", "~"):
                i += 1
                excl = parse_exclusions()
                return ("range", ("iristem", iri), excl)
            return ("iri", iri)
        raise RDFParseError(f"ShExC: bad value-set member at {v!r}")

    def parse_exclusions():
        nonlocal i
        out = []
        while peek() == ("punct", "-"):
            i += 1
            k, v = peek()
            if k == "langstem":
                i += 1
                if v.endswith("~"):
                    out.append(("langstem", v[1:-1]))
                else:
                    out.append(("langtag", v[1:]))
                continue
            if k in ("string", "num", "bool"):
                lex, dt, lang = parse_literal()
                if peek() == ("punct", "~"):
                    i += 1
                    out.append(("litstem", lex))
                else:
                    out.append(("lit", lex, dt, lang))
                continue
            iri = expand(k, v)
            i += 1
            if peek() == ("punct", "~"):
                i += 1
                out.append(("iristem", iri))
            else:
                out.append(("iri", iri))
        return tuple(out)

    def parse_value_set():
        nonlocal i
        i += 1  # '['
        items = []
        while peek() != ("punct", "]"):
            if peek()[0] == "eof":
                raise RDFParseError("ShExC: unterminated value set")
            items.append(parse_vs_item())
        i += 1
        return ("values", tuple(items))

    def _with_shape_suffix(nc):
        """grammar shapeAtom ::= nonLitNodeConstraint shapeOrRef? —
        a node constraint JUXTAPOSED with an inline shape or @ref is an
        implicit AND (0focusIRI, 1IRIInline0)."""
        nonlocal i
        k, v = peek()
        if (k == "kw" and v in ("CLOSED", "EXTRA")) or (
                k == "punct" and v in ("{", "@")):
            suffix = parse_value_atom()
            return ("and", (nc, suffix))
        return nc

    def parse_value_atom():
        nonlocal i
        k, v = peek()
        if k == "punct" and v == "(":
            i += 1
            e = parse_value_or()
            if peek() != ("punct", ")"):
                raise RDFParseError("ShExC: expected ')'")
            i += 1
            return e
        if k == "punct" and v == "@":
            i += 1
            k2, v2 = peek()
            i += 1
            return ("ref", expand(k2, v2))
        if k == "punct" and v == "%":
            raise RDFParseError("ShExC: semantic actions out of subset")
        if (k == "kw" and v in ("CLOSED", "EXTRA")) or (
                k == "punct" and v == "{"):
            return ("ref", lift_shape(parse_braced_shape("__inline")))
        if k == "punct" and v == ".":
            i += 1
            facets = parse_facets()
            if facets:
                return _with_shape_suffix(("nc", None, facets))
            return _with_shape_suffix(("any",))
        if k == "kw" and v in ("IRI", "BNODE", "LITERAL", "NONLITERAL"):
            i += 1
            return _with_shape_suffix(("nc", ("kind", v), parse_facets()))
        if k == "punct" and v == "[":
            vs = parse_value_set()
            return _with_shape_suffix(("nc", vs, parse_facets()))
        if (k == "kw" and v in _FACETS_STR + _FACETS_NUM) or k == "regex":
            return _with_shape_suffix(("nc", None, parse_facets()))
        if k in ("iri", "pname"):
            i += 1
            return _with_shape_suffix(
                ("nc", ("datatype", expand(k, v)), parse_facets()))
        raise RDFParseError(f"ShExC: bad value expression at {v!r}")

    def parse_value_not():
        nonlocal i
        if peek() == ("kw", "NOT"):
            i += 1
            return ("not", parse_value_not())
        return parse_value_atom()

    def parse_value_and():
        nonlocal i
        arms = [parse_value_not()]
        while peek() == ("kw", "AND"):
            i += 1
            arms.append(parse_value_not())
        return arms[0] if len(arms) == 1 else ("and", tuple(arms))

    def parse_value_or():
        nonlocal i
        arms = [parse_value_and()]
        while peek() == ("kw", "OR"):
            i += 1
            arms.append(parse_value_and())
        return arms[0] if len(arms) == 1 else ("or", tuple(arms))

    def parse_card():
        nonlocal i
        k, v = peek()
        if k == "card":
            i += 1
            if v == "?":
                return 0, 1
            if v == "+":
                return 1, _UNBOUNDED
            if v == "*":
                return 0, _UNBOUNDED
            body = v[1:-1].replace(" ", "").replace("\t", "")
            if "," in body:
                lo, hi = body.split(",")
                return int(lo), (_UNBOUNDED if hi == "*" else int(hi))
            return int(body), int(body)
        return 1, 1

    def skip_annotations():
        # '//' predicate (iri|literal|num) — parsed and DROPPED
        nonlocal i
        while peek()[0] == "annot":
            i += 1
            pk, pv = peek()
            if pk == "a":
                i += 1
            else:
                expand(pk, pv)
                i += 1
            if peek()[0] in ("string", "num"):
                parse_literal()
            else:
                ek, ev = peek()
                expand(ek, ev)
                i += 1

    def parse_tc_or_group():
        nonlocal i
        k, v = peek()
        if k == "punct" and v == "(":
            i += 1
            sub = parse_one_of()
            if peek() != ("punct", ")"):
                raise RDFParseError("ShExC: expected ')' in group")
            i += 1
            lo, hi = parse_card()
            skip_annotations()
            if isinstance(sub, tuple) and sub[0] in ("each", "one") \
                    and (lo, hi) != (1, 1):
                return (sub[0], sub[1], lo, hi)
            if (lo, hi) != (1, 1):
                return ("each", (sub,), lo, hi)
            return sub
        if k == "punct" and v in ("$", "&"):
            raise RDFParseError(
                "ShExC: triple-expression labels/inclusions out of subset")
        if k == "punct" and v == "%":
            raise RDFParseError("ShExC: semantic actions out of subset")
        inverse = False
        if k == "punct" and v == "^":
            inverse = True
            i += 1
            k, v = peek()
        pred = RDF_TYPE if k == "a" else expand(k, v)
        i += 1
        # value expression (may be absent before a cardinality — then
        # it is '.'; grammar requires one of: expr, '.', cardinality)
        k2, v2 = peek()
        if (k2 == "punct" and v2 in (";", "}", ")", "|")) or k2 == "card":
            ve = ("any",)
        else:
            ve = parse_value_or()
        lo, hi = parse_card()
        skip_annotations()
        return ("tc", inverse, pred, ve, lo, hi)

    def parse_each_of():
        nonlocal i
        subs = [parse_tc_or_group()]
        while peek() == ("punct", ";"):
            i += 1
            k, v = peek()
            if k == "punct" and v in ("}", ")", "|"):
                break  # trailing ';'
            subs.append(parse_tc_or_group())
        return subs[0] if len(subs) == 1 else ("each", tuple(subs), 1, 1)

    def parse_one_of():
        nonlocal i
        subs = [parse_each_of()]
        while peek() == ("punct", "|"):
            i += 1
            subs.append(parse_each_of())
        return subs[0] if len(subs) == 1 else ("one", tuple(subs), 1, 1)

    def parse_braced_shape(label: str) -> Shape:
        nonlocal i
        closed = False
        extra: set = set()
        while True:
            k, v = peek()
            if k == "kw" and v == "CLOSED":
                closed = True
                i += 1
                continue
            if k == "kw" and v == "EXTRA":
                i += 1
                while peek()[0] in ("iri", "pname", "a"):
                    ek, ev = peek()
                    extra.add(RDF_TYPE if ek == "a" else expand(ek, ev))
                    i += 1
                continue
            break
        if peek() != ("punct", "{"):
            raise RDFParseError(f"ShExC: expected '{{' in shape {label!r}")
        i += 1
        if peek() == ("punct", "}"):
            i += 1
            skip_annotations()
            return Shape(label=label, expr=None, closed=closed,
                         extra=frozenset(extra))
        expr = parse_one_of()
        if peek() != ("punct", "}"):
            raise RDFParseError(f"ShExC: expected '}}' in shape {label!r}")
        i += 1
        skip_annotations()
        return Shape(label=label, expr=expr, closed=closed,
                     extra=frozenset(extra))

    def parse_shape_atom(label: str):
        nonlocal i
        k, v = peek()
        if k == "punct" and v == "(":
            i += 1
            e = parse_shape_or(label)
            if peek() != ("punct", ")"):
                raise RDFParseError(f"ShExC: expected ')' in {label!r}")
            i += 1
            return e
        if k == "punct" and v == "@":
            i += 1
            k2, v2 = peek()
            i += 1
            return ("ref", expand(k2, v2))
        if (k == "kw" and v in ("CLOSED", "EXTRA")) or (
                k == "punct" and v == "{"):
            return ("shape", parse_braced_shape(label))
        if k == "punct" and v == "%":
            raise RDFParseError("ShExC: semantic actions out of subset")
        # node constraint as a top-level shape expression
        return parse_value_atom()

    def parse_shape_not(label: str):
        nonlocal i
        if peek() == ("kw", "NOT"):
            i += 1
            return ("not", parse_shape_not(label))
        return parse_shape_atom(label)

    def parse_shape_and(label: str):
        nonlocal i
        arms = [parse_shape_not(label)]
        while peek() == ("kw", "AND"):
            i += 1
            arms.append(parse_shape_not(label))
        return arms[0] if len(arms) == 1 else ("and", tuple(arms))

    def parse_shape_or(label: str):
        nonlocal i
        arms = [parse_shape_and(label)]
        while peek() == ("kw", "OR"):
            i += 1
            arms.append(parse_shape_and(label))
        return arms[0] if len(arms) == 1 else ("or", tuple(arms))

    while i < len(toks):
        kind, val = toks[i]
        if kind == "kw" and val == "PREFIX":
            pfx = toks[i + 1][1]
            if not pfx.endswith(":"):
                pfx = pfx.partition(":")[0] + ":"
            prefixes[pfx[:-1]] = _unesc(toks[i + 2][1][1:-1])
            i += 3
            continue
        if kind == "kw" and val == "BASE":
            base[0] = _unesc(toks[i + 1][1][1:-1])
            i += 2
            continue
        if kind == "kw" and val in ("IMPORT", "EXTERNAL", "ABSTRACT",
                                    "EXTENDS", "RESTRICTS"):
            raise RDFParseError(f"ShExC: {val} out of subset")
        if kind == "kw" and val == "START":
            i += 1
            if peek() == ("punct", "="):
                i += 1
            lbl = "__start"
            shapes[lbl] = parse_shape_or(lbl)
            start[0] = lbl
            continue
        if kind == "punct" and val == "%":
            raise RDFParseError("ShExC: semantic actions out of subset")
        label = expand(kind, val)
        i += 1
        shapes[label] = parse_shape_or(label)
    return ShexSchema(shapes, prefixes, start=start[0])


# --- shape map ---------------------------------------------------------------


@dataclass
class ShapeMapEntry:
    shape: str
    node: tuple | None = None        # fixed focus TERM (kind, lex, dt, lang)
    target_class: str | None = None  # {FOCUS a <C>}@shape
    target_pred: tuple | None = None  # {FOCUS <p> <o>} / {FOCUS _ <p> FOCUS}


def parse_shape_map(text: str, schema: ShexSchema) -> list[ShapeMapEntry]:
    """``<node>@<Shape>`` / ``"lit"^^<dt>@<Shape>`` / ``_:b@<Shape>``
    per line (or comma-separated), ``{FOCUS a <C>}@<Shape>``,
    ``@START`` as the shape."""
    entries = []
    pat_node = re.compile(
        r"""\s*(?:
            <(?P<iri>[^>]*)> |
            (?P<bn>_:[\w\-.]+) |
            "(?P<lex>(?:[^"\\]|\\.)*)"
            (?:\^\^<(?P<dt>[^>]*)>|@(?P<lang>[A-Za-z][\w-]*))?
        )\s*@\s*(?:<(?P<shape>[^>]*)>|(?P<start>START))\s*$""",
        re.VERBOSE)
    pat_focus = re.compile(
        r"""\{\s*FOCUS\s+(?:a|<(?P<p>[^>]*)>)\s+
            (?:<(?P<o>[^>]*)>|_)\s*\}\s*@\s*
            (?:<(?P<shape>[^>]*)>|(?P<start>START))\s*$""",
        re.VERBOSE)
    parts = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts.extend(p for p in re.split(r",(?=[<_{\"])", line) if p.strip())
    for part in parts:
        part = part.strip().rstrip(",")
        m = pat_focus.match(part)
        if m:
            shape = "__start" if m.group("start") else m.group("shape")
            if m.group("p") is None:
                entries.append(ShapeMapEntry(
                    shape=shape, target_class=m.group("o")))
            else:
                entries.append(ShapeMapEntry(
                    shape=shape, target_pred=(m.group("p"), m.group("o"))))
            continue
        m = pat_node.match(part)
        if m:
            shape = "__start" if m.group("start") else m.group("shape")
            if m.group("iri") is not None:
                node = (KIND_IRI, m.group("iri"), "", "")
            elif m.group("bn") is not None:
                node = (KIND_BNODE, m.group("bn")[2:], "", "")
            else:
                lex = _unesc(m.group("lex"))
                dt = m.group("dt") or ""
                lang = m.group("lang") or ""
                if lang:
                    dt = _RDF_LANGSTRING
                elif not dt:
                    dt = XSD_STRING
                node = (KIND_LITERAL, lex, dt, lang)
            entries.append(ShapeMapEntry(shape=shape, node=node))
            continue
        raise RDFParseError(f"shape map: cannot parse {part!r}")
    for e in entries:
        if e.shape not in schema.shapes:
            raise RDFParseError(
                f"shape map references unknown shape {e.shape!r}")
    return entries


# --- node-constraint evaluation ----------------------------------------------

_NUM_DTS = frozenset(
    XSD_NS + s for s in (
        "integer", "decimal", "float", "double", "int", "long", "short",
        "byte", "nonNegativeInteger", "nonPositiveInteger",
        "positiveInteger", "negativeInteger", "unsignedLong",
        "unsignedInt", "unsignedShort", "unsignedByte"))

_INT_DTS = frozenset(d for d in _NUM_DTS if d not in (
    XSD_NS + "decimal", XSD_NS + "float", XSD_NS + "double"))

_XSD_VALID = {
    **{d: r"[+-]?\d+" for d in _INT_DTS},
    XSD_NS + "decimal": r"[+-]?(\d+(\.\d*)?|\.\d+)",
    XSD_NS + "float":
        r"[+-]?((\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?|INF|NaN)",
    XSD_NS + "double":
        r"[+-]?((\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?|INF|NaN)",
    XSD_NS + "boolean": r"true|false|1|0",
    XSD_NS + "date": r"-?\d{4,}-\d{2}-\d{2}(Z|[+-]\d{2}:\d{2})?",
    XSD_NS + "dateTime":
        r"-?\d{4,}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?"
        r"(Z|[+-]\d{2}:\d{2})?",
}

_INT_RANGES = {
    XSD_NS + "byte": (-128, 127),
    XSD_NS + "short": (-32768, 32767),
    XSD_NS + "int": (-2147483648, 2147483647),
    XSD_NS + "long": (-(2 ** 63), 2 ** 63 - 1),
    XSD_NS + "unsignedByte": (0, 255),
    XSD_NS + "unsignedShort": (0, 65535),
    XSD_NS + "unsignedInt": (0, 4294967295),
    XSD_NS + "unsignedLong": (0, 2 ** 64 - 1),
    XSD_NS + "nonNegativeInteger": (0, None),
    XSD_NS + "positiveInteger": (1, None),
    XSD_NS + "nonPositiveInteger": (None, 0),
    XSD_NS + "negativeInteger": (None, -1),
}


def _dt_valid(lex: str, dt: str) -> bool:
    pat = _XSD_VALID.get(dt)
    if pat is not None and re.fullmatch(pat, lex) is None:
        return False
    rng = _INT_RANGES.get(dt)
    if rng is not None:
        x = int(lex)
        lo, hi = rng
        if lo is not None and x < lo:
            return False
        if hi is not None and x > hi:
            return False
    return True


def _lit_value(lex: str, dt: str):
    """Numeric value of a literal when its datatype is numeric and the
    lexical is valid, else None."""
    if dt in _NUM_DTS and _dt_valid(lex, dt):
        try:
            return float(lex)
        except ValueError:
            return None
    return None


def _lang_matches(lang: str, tag: str) -> bool:
    ll, tl = lang.lower(), tag.lower()
    return ll == tl or ll.startswith(tl + "-")


def _vs_member(item, o_kind, o_lex, o_dt, o_lang) -> bool:
    t = item[0]
    if t == "iri":
        return o_kind == KIND_IRI and o_lex == item[1]
    if t == "lit":
        # TERM equality: same lexical form, datatype and language
        # ("00"^^xsd:integer does NOT match [0]; "0.0e0" ≠ "0.0E0")
        if o_kind != KIND_LITERAL:
            return False
        _, lex, dt, lang = item
        odt = _RDF_LANGSTRING if o_lang else (o_dt or XSD_STRING)
        if lang or o_lang:
            return (o_lang or "").lower() == (lang or "").lower() \
                and lex == o_lex
        return lex == o_lex and dt == odt
    if t == "langtag":
        return (o_kind == KIND_LITERAL and bool(o_lang)
                and o_lang.lower() == item[1].lower())
    if t == "range":
        stem, excl = item[1], item[2]
        st = stem[0]
        if st == "wild":
            ok = True
        elif st == "iristem":
            ok = o_kind == KIND_IRI and o_lex.startswith(stem[1])
        elif st == "litstem":
            ok = o_kind == KIND_LITERAL and o_lex.startswith(stem[1])
        elif st == "langstem":
            ok = (o_kind == KIND_LITERAL and bool(o_lang)
                  and (stem[1] == "" or _lang_matches(o_lang, stem[1])))
        else:  # pragma: no cover
            ok = False
        if not ok:
            return False
        for ex in excl:
            if _vs_member(ex, o_kind, o_lex, o_dt, o_lang):
                return False
            if ex[0] == "iristem" and o_kind == KIND_IRI \
                    and o_lex.startswith(ex[1]):
                return False
            if ex[0] == "litstem" and o_kind == KIND_LITERAL \
                    and o_lex.startswith(ex[1]):
                return False
            if ex[0] == "langstem" and o_kind == KIND_LITERAL \
                    and o_lang and _lang_matches(o_lang, ex[1]):
                return False
        return True
    return False


def _check_facet(name, val, o_kind, o_lex, o_dt, o_lang) -> bool:
    if name in ("LENGTH", "MINLENGTH", "MAXLENGTH"):
        n = len(o_lex)
        if name == "LENGTH":
            return n == val
        if name == "MINLENGTH":
            return n >= val
        return n <= val
    if name == "PATTERN":
        body, flags = val
        inline = "".join(c for c in flags if c in "ims")
        pat = f"(?{inline}){body}" if inline else body
        try:
            return re.search(_unesc_regex(pat), o_lex) is not None
        except re.error:
            return False
    # numeric facets apply to the literal's numeric VALUE
    if o_kind != KIND_LITERAL:
        return False
    x = _lit_value(o_lex, o_dt or "")
    if x is None:
        return False
    if name == "MININCLUSIVE":
        return x >= val
    if name == "MINEXCLUSIVE":
        return x > val
    if name == "MAXINCLUSIVE":
        return x <= val
    if name == "MAXEXCLUSIVE":
        return x < val
    if name in ("TOTALDIGITS", "FRACTIONDIGITS") and (
            (o_dt or "") not in _INT_DTS
            and (o_dt or "") != XSD_NS + "decimal"):
        return False  # digit facets apply to xsd:decimal + integtypes
    if name == "TOTALDIGITS":
        digits = re.sub(r"[^0-9]", "", o_lex.lstrip("+-").lstrip("0") or "0")
        return len(digits.rstrip("0") or "0") <= val if "." in o_lex \
            else len(o_lex.lstrip("+-").lstrip("0") or "0") <= val
    if name == "FRACTIONDIGITS":
        frac = o_lex.partition(".")[2].rstrip("0")
        return len(frac) <= val
    return False


def _unesc_regex(p: str) -> str:
    # ShExC regex literals escape '/' as '\/'
    return p.replace("\\/", "/")


# --- matching ----------------------------------------------------------------
# an arc is (direction, predicate, v_kind, v_lex, v_dt, v_lang);
# direction 0 = outgoing (value = object), 1 = incoming (value = subject)


def _tc_list(expr) -> list:
    if expr is None:
        return []
    t = expr[0]
    if t == "tc":
        return [expr]
    if t in ("each", "one"):
        out = []
        for s in expr[1]:
            out.extend(_tc_list(s))
        return out
    return []


def _matches_value(ve, arc_val, conf) -> bool:
    """arc_val = (kind, lex, dt, lang); conf = the reference-resolution
    context (dict label → (conf_set, seen_nodes) plus the schema for
    analytic fallback)."""
    o_kind, o_lex, o_dt, o_lang = arc_val
    tag = ve[0]
    if tag == "any":
        return True
    if tag == "nc":
        base, facets = ve[1], ve[2]
        if base is not None:
            bt = base[0]
            if bt == "kind":
                k = base[1]
                ok = ((k == "IRI" and o_kind == KIND_IRI)
                      or (k == "BNODE" and o_kind == KIND_BNODE)
                      or (k == "LITERAL" and o_kind == KIND_LITERAL)
                      or (k == "NONLITERAL" and o_kind != KIND_LITERAL))
                if not ok:
                    return False
            elif bt == "datatype":
                if o_kind != KIND_LITERAL:
                    return False
                odt = o_dt or XSD_STRING
                if o_lang:
                    odt = _RDF_LANGSTRING
                if odt != base[1] or not _dt_valid(o_lex, odt):
                    return False
            elif bt == "values":
                if not any(_vs_member(it, o_kind, o_lex, o_dt, o_lang)
                           for it in base[1]):
                    return False
        for name, val in facets:
            if not _check_facet(name, val, o_kind, o_lex, o_dt, o_lang):
                return False
        return True
    if tag == "ref":
        return _ref_ok(ve[1], arc_val, conf)
    if tag == "not":
        return not _matches_value(ve[1], arc_val, conf)
    if tag == "and":
        return all(_matches_value(a, arc_val, conf) for a in ve[1])
    if tag == "or":
        return any(_matches_value(a, arc_val, conf) for a in ve[1])
    if tag == "shape":  # pragma: no cover — shapes are lifted to refs
        return _conforms(None, ve, arc_val, conf, empty=True) == []
    raise RDFParseError(f"ShEx: unknown value expression {ve!r}")


def _ref_ok(label, term, conf) -> bool:
    """Does a TERM conform to a referenced shape expression? Nodes seen
    in the graph consult the broadcast conf set (computed over their
    full neighborhoods); absent nodes evaluate analytically against
    the empty neighborhood."""
    conf_sets, seen, schema = conf
    key = (term[0], term[1])
    if key in seen:
        return key in conf_sets.get(label, frozenset())
    expr = schema.shapes.get(label)
    if expr is None:
        return False
    return not _conforms_expr_term(expr, term, [], conf)


def _arcs_of_group(g: pd.DataFrame) -> list:
    return [
        (int(r["dir"]), r["p"], (int(r["v_kind"]), r["v_lex"],
                                 r["v_dt"] or "", r["v_lang"] or ""))
        for _, r in g.iterrows()
    ]


def _match_shape(shape: Shape, arcs: list, conf) -> list[str]:
    """Violation reasons for matching a NEIGHBORHOOD against one braced
    shape (empty list = match). Exact partition semantics via a
    memoized backtracking matcher."""
    tcs = _tc_list(shape.expr)
    mentioned = {(tc[1], tc[2]) for tc in tcs}  # (inverse, pred)
    # matchable arcs: direction+predicate mentioned by some TC
    matchable = []
    rest_out = []
    for idx, (d, p, val) in enumerate(arcs):
        if (bool(d), p) in {(tc[1], tc[2]) for tc in tcs}:
            matchable.append(idx)
        elif d == 0:
            rest_out.append(p)
    if shape.closed:
        bad = [p for p in rest_out if p not in shape.extra]
        if bad:
            return [f"CLOSED: undeclared predicate {bad[0]}"]
    arcs_by_idx = {i: arcs[i] for i in matchable}

    # value-match precomputation per (arc, tc)
    sat: dict[tuple, bool] = {}
    for idx in matchable:
        d, p, val = arcs[idx]
        for t_i, tc in enumerate(tcs):
            if tc[1] == bool(d) and tc[2] == p:
                sat[(idx, id(tc))] = _matches_value(tc[3], val, conf)

    from itertools import combinations

    memo: dict = {}

    def match(expr, avail: frozenset) -> set:
        """Possible REMAINDER arc-sets after matching expr."""
        key = (id(expr), avail)
        if key in memo:
            return memo[key]
        out: set = set()
        t = expr[0]
        if t == "tc":
            _, inv, pred, ve, lo, hi = expr
            cands = [a for a in avail
                     if arcs[a][0] == int(inv) and arcs[a][1] == pred
                     and sat.get((a, id(expr)), False)]
            hi_eff = len(cands) if hi == _UNBOUNDED else min(hi, len(cands))
            for k in range(lo, hi_eff + 1):
                if k == 0:
                    out.add(avail)
                    continue
                for combo in combinations(cands, k):
                    out.add(avail - frozenset(combo))
        elif t in ("each", "one"):
            subs, lo, hi = expr[1], expr[2], expr[3]

            def once(av: frozenset) -> set:
                if t == "each":
                    states = {av}
                    for s in subs:
                        nxt: set = set()
                        for st in states:
                            nxt |= match(s, st)
                        states = nxt
                        if not states:
                            break
                    return states
                res: set = set()
                for s in subs:
                    res |= match(s, av)
                return res

            states = {avail}
            # k repetitions, k in [lo, hi]; stop growing when stable
            k = 0
            reached: set = set()
            if lo == 0:
                reached.add(avail)
            frontier = {avail}
            max_reps = hi if hi != _UNBOUNDED else len(avail) + 1
            while k < max_reps:
                k += 1
                nxt: set = set()
                for st in frontier:
                    nxt |= once(st)
                frontier = nxt - (reached if k > lo else set())
                if k >= lo:
                    reached |= nxt
                if not frontier:
                    break
            out = reached
        elif t == "empty":
            out = {avail}
        else:  # pragma: no cover
            raise RDFParseError(f"ShEx: unknown triple expression {expr!r}")
        memo[key] = out
        return out

    all_m = frozenset(matchable)
    if shape.expr is None:
        remainders = {all_m}
    else:
        remainders = match(shape.expr, all_m)
    # success: some matching leaves only leftovers EXTRA admits —
    # outgoing arcs whose predicate is in EXTRA and that do NOT match
    # any same-predicate constraint (spec: an EXTRA triple is one that
    # does not match the expression; 1dotExtra1_fail-iri2)
    def _excused(a):
        if arcs[a][0] != 0 or arcs[a][1] not in shape.extra:
            return False
        return not any(
            sat.get((a, id(tc)), False)
            for tc in tcs
            if tc[1] == bool(arcs[a][0]) and tc[2] == arcs[a][1])

    for rem in remainders:
        if all(_excused(a) for a in rem):
            return []
    # diagnose: per-TC cardinality shortfalls give actionable reasons
    reasons = []
    for tc in tcs:
        _, inv, pred, _ve, lo, hi = tc
        n = sum(1 for a in matchable
                if arcs[a][0] == int(inv) and arcs[a][1] == pred
                and sat.get((a, id(tc)), False))
        mark = "^" if inv else ""
        if n < lo:
            reasons.append(
                f"{mark}{pred}: {n} matching value(s) < min {lo}")
        elif hi != _UNBOUNDED and n > hi:
            reasons.append(
                f"{mark}{pred}: {n} matching value(s) > max {hi}")
    if not reasons:
        reasons = ["neighborhood does not match the triple expression "
                   "(unmatched triples not admitted by EXTRA)"]
    return reasons


def _conforms_expr_term(expr, focus_term, arcs, conf) -> list[str]:
    """Violation reasons for one focus node (term + neighborhood arcs)
    against a shape EXPRESSION."""
    tag = expr[0]
    if tag == "shape":
        return _match_shape(expr[1], arcs, conf)
    if tag in ("any", "nc"):
        ok = _matches_value(expr, focus_term, conf)
        return [] if ok else [f"focus fails node constraint {tag}"]
    if tag == "ref":
        # the focus node: if present in the graph its conf set answers;
        # a graph-absent focus validates with the GIVEN (empty) arcs
        conf_sets, seen, schema = conf
        key = (focus_term[0], focus_term[1])
        if key in seen and expr[1] in conf_sets:
            ok = key in conf_sets[expr[1]]
        else:
            ref_expr = schema.shapes.get(expr[1])
            ok = ref_expr is not None and not _conforms_expr_term(
                ref_expr, focus_term, arcs, conf)
        return [] if ok else [f"@{expr[1]}: focus does not conform"]
    if tag == "and":
        out: list[str] = []
        for arm in expr[1]:
            out.extend(_conforms_expr_term(arm, focus_term, arcs, conf))
        return out
    if tag == "or":
        for arm in expr[1]:
            if not _conforms_expr_term(arm, focus_term, arcs, conf):
                return []
        return ["OR: no disjunct satisfied"]
    if tag == "not":
        inner = _conforms_expr_term(expr[1], focus_term, arcs, conf)
        return [] if inner else ["NOT: inner expression satisfied"]
    raise RDFParseError(f"ShEx: unknown shape expression {expr!r}")





# --- reference resolution (SCC conf sets over ARC groups) ---------------------


def _ve_refs_signed(ve, neg: bool) -> set:
    t = ve[0]
    if t == "ref":
        return {(ve[1], neg)}
    if t == "not":
        return _ve_refs_signed(ve[1], not neg)
    if t in ("and", "or"):
        out: set = set()
        for a in ve[1]:
            out |= _ve_refs_signed(a, neg)
        return out
    return set()


def _texpr_refs_signed(expr, neg: bool) -> set:
    if expr is None:
        return set()
    t = expr[0]
    if t == "tc":
        return _ve_refs_signed(expr[3], neg)
    if t in ("each", "one"):
        out: set = set()
        for s in expr[1]:
            out |= _texpr_refs_signed(s, neg)
        return out
    return set()


def _shape_refs_signed(expr, neg: bool = False) -> set:
    """(label, under-odd-NOTs) pairs for every @<ref> reachable."""
    tag = expr[0]
    if tag == "shape":
        return _texpr_refs_signed(expr[1].expr, neg)
    if tag == "ref":
        return {(expr[1], neg)}
    if tag in ("and", "or"):
        out: set = set()
        for arm in expr[1]:
            out |= _shape_refs_signed(arm, neg)
        return out
    if tag == "not":
        return _shape_refs_signed(expr[1], not neg)
    if tag in ("any", "nc"):
        return set()
    raise RDFParseError(f"ShEx: unknown shape expression {expr!r}")


def _shape_refs(expr) -> set:
    return {lbl for lbl, _ in _shape_refs_signed(expr)}


def _ref_sccs(schema: ShexSchema) -> list[list[str]]:
    """SCCs of the shape-reference graph in dependency order."""
    deps: dict[str, set] = {}
    for label in sorted(schema.shapes):
        refs = _shape_refs(schema.shapes[label])
        for dep in refs:
            if dep not in schema.shapes:
                raise RDFParseError(
                    f"ShEx: reference to unknown shape {dep!r}")
        deps[label] = refs
    index: dict[str, int] = {}
    low: dict[str, int] = {}
    on_stack: set = set()
    stack: list[str] = []
    sccs: list[list[str]] = []
    counter = [0]

    def strongconnect(v: str):
        work = [(v, iter(sorted(deps[v])))]
        index[v] = low[v] = counter[0]
        counter[0] += 1
        stack.append(v)
        on_stack.add(v)
        while work:
            node, it = work[-1]
            advanced = False
            for w in it:
                if w not in index:
                    index[w] = low[w] = counter[0]
                    counter[0] += 1
                    stack.append(w)
                    on_stack.add(w)
                    work.append((w, iter(sorted(deps[w]))))
                    advanced = True
                    break
                if w in on_stack:
                    low[node] = min(low[node], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[node])
            if low[node] == index[node]:
                scc = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    scc.append(w)
                    if w == node:
                        break
                sccs.append(sorted(scc))

    for label in sorted(schema.shapes):
        if label not in index:
            strongconnect(label)
    return sccs


def _arcs_dataset(triples_ds):
    """Flip the triple table into the ARC table: one row per triple per
    endpoint — (n_kind, n_lex) the node, dir 0=outgoing/1=incoming, p,
    and the value term columns. Grouping by node co-locates the FULL
    neighborhood (outgoing and incoming) of every node."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def flip(t: pa.Table) -> pa.Table:
        n = t.num_rows
        sk = t["s_kind"].combine_chunks().cast(pa.int8())
        sl = t["s_lex"].combine_chunks().cast(pa.large_string())
        p = t["p"].combine_chunks().cast(pa.large_string())
        ok = t["o_kind"].combine_chunks().cast(pa.int8())
        ol = t["o_lex"].combine_chunks().cast(pa.large_string())
        od = pc.fill_null(
            t["o_datatype"].combine_chunks().cast(pa.large_string()), "")
        og = pc.fill_null(
            t["o_lang"].combine_chunks().cast(pa.large_string()), "")
        empty = pa.array([""] * n, pa.large_string())
        out_part = pa.table({
            "n_kind": sk, "n_lex": sl,
            "dir": pa.array([0] * n, pa.int8()), "p": p,
            "v_kind": ok, "v_lex": ol, "v_dt": od, "v_lang": og})
        in_part = pa.table({
            "n_kind": ok, "n_lex": ol,
            "dir": pa.array([1] * n, pa.int8()), "p": p,
            "v_kind": sk, "v_lex": sl, "v_dt": empty, "v_lang": empty})
        return pa.concat_tables([out_part, in_part])

    return triples_ds.map_batches(flip, batch_format="pyarrow")


def _conforming_nodes(arcs_ds, schema: ShexSchema, label: str,
                      conf_sets: dict, seen: frozenset) -> frozenset:
    """One distributed pass: the set of (kind, lex) nodes conforming to
    `label` over their full neighborhoods."""
    import ray

    state_ref = ray.put((schema, label, dict(conf_sets), seen))

    def check(g: pd.DataFrame) -> pd.DataFrame:
        schema_, label_, confs, seen_ = ray.get(state_ref)
        kind = int(g["n_kind"].iloc[0])
        lex = g["n_lex"].iloc[0]
        term = (kind, lex, "", "")
        arcs = _arcs_of_group(g)
        conf = (confs, seen_, schema_)
        bad = _conforms_expr_term(schema_.shapes[label_], term, arcs, conf)
        if bad:
            return pd.DataFrame({"k": [], "n": []})
        return pd.DataFrame({"k": [kind], "n": [lex]})

    rows = (
        arcs_ds.groupby(["n_kind", "n_lex"])
        .map_groups(check, batch_format="pandas")
        .take_all()
    )
    return frozenset((int(r["k"]), r["n"]) for r in rows)


def _all_nodes(arcs_ds) -> frozenset:
    """(kind, lex) of every node in the graph (the gfp universe and the
    'seen' set — broadcast-scale by the documented focus assumption)."""
    rows = (
        arcs_ds.groupby(["n_kind", "n_lex"]).count().take_all()
    )
    return frozenset((int(r["n_kind"]), r["n_lex"]) for r in rows)


def _resolve_conf_sets(arcs_ds, schema: ShexSchema, seen: frozenset) -> dict:
    """Conformance sets for every referenced shape, SCC by SCC (see
    module docstring): acyclic refs one pass each; cyclic SCCs by
    greatest-fixpoint; negation into a cycle raises."""
    referenced: set = set()
    for label in schema.shapes:
        referenced |= _shape_refs(schema.shapes[label])

    conf_sets: dict[str, frozenset] = {}
    for scc in _ref_sccs(schema):
        cyclic = len(scc) > 1 or scc[0] in _shape_refs(schema.shapes[scc[0]])
        if not cyclic:
            label = scc[0]
            if label in referenced:
                conf_sets[label] = _conforming_nodes(
                    arcs_ds, schema, label, conf_sets, seen)
            continue
        in_scc = set(scc)
        for label in scc:
            for dep, neg in _shape_refs_signed(schema.shapes[label]):
                if neg and dep in in_scc:
                    raise RDFParseError(
                        f"ShEx: negated reference @{dep} inside recursive "
                        f"cycle {scc} (non-stratified)")
        for label in scc:
            conf_sets[label] = seen
        while True:
            changed = False
            for label in scc:
                new = _conforming_nodes(
                    arcs_ds, schema, label, conf_sets, seen)
                if new != conf_sets[label]:
                    conf_sets[label] = new
                    changed = True
            if not changed:
                break
    return conf_sets


# graphs below this many TRIPLES validate on the driver — the
# conformance corpus is thousands of 2-triple graphs, and a dozen Ray
# round-trips per graph would dominate; the distributed path is the
# same code over arc GROUPS (same strategy switch as
# CLOSURE_DRIVER_THRESHOLD in ops/paths)
SHEX_DRIVER_THRESHOLD = 10_000


def _validate_local(table, schema: ShexSchema, entries) -> pd.DataFrame:
    """Driver-side mirror of the distributed path for tiny graphs:
    build per-node neighborhoods in dicts, resolve conf sets with the
    same SCC/gfp logic, evaluate every shape-map entry."""
    by_node: dict[tuple, list] = {}
    rows = table.to_pylist()
    for r in rows:
        s_key = (int(r["s_kind"]), r["s_lex"])
        o_key = (int(r["o_kind"]), r["o_lex"])
        by_node.setdefault(s_key, []).append(
            (0, r["p"], (int(r["o_kind"]), r["o_lex"],
                         r["o_datatype"] or "", r["o_lang"] or "")))
        by_node.setdefault(o_key, []).append(
            (1, r["p"], (int(r["s_kind"]), r["s_lex"], "", "")))
    seen = frozenset(by_node)

    def conforming(label, conf_sets):
        conf = (conf_sets, seen, schema)
        out = set()
        for (kind, lex), arcs in by_node.items():
            if not _conforms_expr_term(
                    schema.shapes[label], (kind, lex, "", ""), arcs, conf):
                out.add((kind, lex))
        return frozenset(out)

    referenced: set = set()
    for label in schema.shapes:
        referenced |= _shape_refs(schema.shapes[label])
    conf_sets: dict[str, frozenset] = {}
    for scc in _ref_sccs(schema):
        cyclic = (len(scc) > 1
                  or scc[0] in _shape_refs(schema.shapes[scc[0]]))
        if not cyclic:
            if scc[0] in referenced:
                conf_sets[scc[0]] = conforming(scc[0], conf_sets)
            continue
        in_scc = set(scc)
        for label in scc:
            for dep, neg in _shape_refs_signed(schema.shapes[label]):
                if neg and dep in in_scc:
                    raise RDFParseError(
                        f"ShEx: negated reference @{dep} inside recursive "
                        f"cycle {scc} (non-stratified)")
        for label in scc:
            conf_sets[label] = seen
        while True:
            changed = False
            for label in scc:
                new = conforming(label, conf_sets)
                if new != conf_sets[label]:
                    conf_sets[label] = new
                    changed = True
            if not changed:
                break

    conf = (conf_sets, seen, schema)
    out = {"focus": [], "shape": [], "status": [], "reason": []}

    def emit(term, arcs, e):
        reasons = _conforms_expr_term(
            schema.shapes[e.shape], term, arcs, conf)
        out["focus"].append(term[1])
        out["shape"].append(e.shape)
        out["status"].append("nonconformant" if reasons else "conformant")
        out["reason"].append("; ".join(reasons))

    for e in entries:
        if e.node is not None:
            key = (e.node[0], e.node[1])
            emit(e.node, by_node.get(key, []), e)
            continue
        for (kind, lex), arcs in sorted(by_node.items()):
            if e.target_class is not None:
                applies = any(d == 0 and p == RDF_TYPE
                              and v[1] == e.target_class
                              for d, p, v in arcs)
            else:
                p0, o0 = e.target_pred
                applies = any(d == 0 and p == p0
                              and (o0 is None or v[1] == o0)
                              for d, p, v in arcs)
            if applies:
                emit((kind, lex, "", ""), arcs, e)
    return pd.DataFrame(out)


def validate_shex(triples_ds, schema_text: str, shape_map_text: str,
                  base: str = ""):
    """ShEx validation report Dataset: (focus, shape, status, reason).

    One distributed per-focus pass over the ARC table per referenced
    shape (dependency order) + one for the shape map; focus nodes
    ABSENT from the graph are validated analytically on the driver
    (empty neighborhood) and unioned in."""
    import pyarrow as pa
    import ray
    import ray.data as rd

    schema = parse_shexc(schema_text, base_iri=base)
    entries = parse_shape_map(shape_map_text, schema)

    from ..util import fast_count

    n, triples_ds = fast_count(triples_ds)
    if n <= SHEX_DRIVER_THRESHOLD:
        import pyarrow as pa_

        tbl = pa_.concat_tables(
            [b for b in triples_ds.iter_batches(batch_format="pyarrow")]
        ) if n else pa_.table({f.name: pa_.array([], f.type)
                               for f in __import__(
                                   "jena_ray.model",
                                   fromlist=["TRIPLE_SCHEMA"]
                               ).TRIPLE_SCHEMA})
        df = _validate_local(tbl, schema, entries)
        return rd.from_pandas(df) if len(df) else rd.from_arrow(pa_.table({
            "focus": pa_.array([], pa_.large_string()),
            "shape": pa_.array([], pa_.large_string()),
            "status": pa_.array([], pa_.large_string()),
            "reason": pa_.array([], pa_.large_string())}))

    arcs_ds = _arcs_dataset(triples_ds)
    from ..util import compact_blocks

    arcs_ds = compact_blocks(arcs_ds)
    seen = _all_nodes(arcs_ds)
    conf_sets = _resolve_conf_sets(arcs_ds, schema, seen)

    state_ref = ray.put((schema, entries, conf_sets, seen))

    def validate(g: pd.DataFrame) -> pd.DataFrame:
        schema_, entries_, confs, seen_ = ray.get(state_ref)
        kind = int(g["n_kind"].iloc[0])
        lex = g["n_lex"].iloc[0]
        arcs = _arcs_of_group(g)
        types = {v[1] for d, p, v in arcs
                 if d == 0 and p == RDF_TYPE}
        preds_out = {(p, v[1]) for d, p, v in arcs if d == 0}
        out = {"focus": [], "shape": [], "status": [], "reason": []}
        conf = (confs, seen_, schema_)
        for e in entries_:
            if e.node is not None:
                applies = (e.node[0] == kind and e.node[1] == lex)
                term = e.node if applies else None
            elif e.target_class is not None:
                applies = e.target_class in types
                term = (kind, lex, "", "")
            else:
                p0, o0 = e.target_pred
                applies = any(p == p0 and (o0 is None or v == o0)
                              for p, v in preds_out)
                term = (kind, lex, "", "")
            if not applies:
                continue
            reasons = _conforms_expr_term(
                schema_.shapes[e.shape], term, arcs, conf)
            out["focus"].append(lex)
            out["shape"].append(e.shape)
            out["status"].append(
                "nonconformant" if reasons else "conformant")
            out["reason"].append("; ".join(r for r in reasons))
        return pd.DataFrame(out)

    report = arcs_ds.groupby(["n_kind", "n_lex"]).map_groups(
        validate, batch_format="pandas")

    # fixed-map focus nodes absent from the graph: empty neighborhood
    conf = (conf_sets, seen, schema)
    extra_rows = {"focus": [], "shape": [], "status": [], "reason": []}
    for e in entries:
        if e.node is None:
            continue
        if (e.node[0], e.node[1]) in seen:
            continue
        reasons = _conforms_expr_term(
            schema.shapes[e.shape], e.node, [], conf)
        extra_rows["focus"].append(e.node[1])
        extra_rows["shape"].append(e.shape)
        extra_rows["status"].append(
            "nonconformant" if reasons else "conformant")
        extra_rows["reason"].append("; ".join(reasons))
    if extra_rows["focus"]:
        report = report.union(rd.from_arrow(pa.table({
            k: pa.array(v, pa.large_string())
            for k, v in extra_rows.items()})))
    return report
