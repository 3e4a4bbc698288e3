"""Turtle 1.1 parser — recursive descent over a regex scanner.

Grammar/semantics parity with the reference's recursive-descent parser
(jena-arq/.../riot/lang/LangTurtle.java:62 + LangTurtleBase.java):

- directives @prefix/@base/PREFIX/BASE, positional effect
  (LangTurtleBase.java:109-200: a redefinition applies to subsequent
  terms only)
- predicate-object lists ';' (:582-599), object lists ',' (:669)
- blank-node property lists '[...]' (:737-762)
- collections '(...)' → rdf:first/rdf:rest/rdf:nil in list order (:767-814)
- numeric/boolean shorthand → xsd:integer/decimal/double/boolean (:479)
- 'a' → rdf:type; prefixed-name escapes; all four string quote forms
- every IRI resolved against the current base (RFC 3986,
  ParserProfileStd.internalMakeIRI, riot/system/ParserProfileStd.java:101-134)

Per-document mutable state (prefix map, base, bnode labels) lives inside a
single parse() call — the Ray stage wraps one call per document row, so the
state never crosses batch or task boundaries (SURVEY.md §2.10).
"""

from __future__ import annotations

import re

from ..model import (
    KIND_BNODE,
    KIND_IRI,
    KIND_LITERAL,
    KIND_TRIPLE_TERM,
    RDF_FIRST,
    RDF_LANGSTRING,
    RDF_NIL,
    RDF_NS,
    RDF_REST,
    RDF_TYPE,
    XSD_NS,
    XSD_STRING,
    RDFParseError,
)

RDF_REIFIES = RDF_NS + "reifies"
from . import grammar as g
from .escapes import unescape_iri, unescape_string
from .iri import resolve

# --- tokenizer --------------------------------------------------------------

_TOKEN_SPEC = [
    ("WS", r"[ \t\r\n]+"),
    ("COMMENT", r"#[^\n]*"),
    ("IRIREF", g.IRIREF),
    # RDF 1.2 terminals (before generic punctuation; IRIREF can never
    # match "<<" since '<' is excluded inside IRIREF bodies)
    ("TT_OPEN", r"<<\("),
    ("TT_CLOSE", r"\)>>"),
    ("RT_OPEN", r"<<"),
    ("RT_CLOSE", r">>"),
    ("ANNOT_OPEN", r"\{\|"),
    ("ANNOT_CLOSE", r"\|\}"),
    ("TILDE", r"~"),
    ("STRING_LONG2", g.STRING_LITERAL_LONG_QUOTE),
    ("STRING_LONG1", g.STRING_LITERAL_LONG_SINGLE_QUOTE),
    ("STRING2", g.STRING_LITERAL_QUOTE),
    ("STRING1", g.STRING_LITERAL_SINGLE_QUOTE),
    ("BNODE", g.BLANK_NODE_LABEL),
    ("ATPREFIX", r"@prefix(?![A-Za-z0-9\-])"),
    ("ATBASE", r"@base(?![A-Za-z0-9\-])"),
    ("ATVERSION", r"@version(?![A-Za-z0-9\-])"),
    ("LANGTAG", g.LANGTAG),
    ("DOUBLE", g.DOUBLE),
    ("DECIMAL", g.DECIMAL),
    ("INTEGER", g.INTEGER),
    ("DTYPE", r"\^\^"),
    ("ANON", r"\[[ \t\r\n]*\]"),
    ("PNAME_LN", g.PNAME_LN),
    ("PNAME_NS", g.PNAME_NS),
    # bare keywords AFTER pnames so e.g. "a:b" lexes as a pname
    ("KEYWORD", r"(?:true|false|a)(?![A-Za-z0-9_:\-])|(?:[Pp][Rr][Ee][Ff][Ii][Xx]|[Bb][Aa][Ss][Ee]|[Vv][Ee][Rr][Ss][Ii][Oo][Nn])(?![A-Za-z0-9_:\-])"),
    ("GRAPHKW", r"[Gg][Rr][Aa][Pp][Hh](?![A-Za-z0-9_:\-])"),
    ("PUNCT", r"[][();,.{}]"),
]
_SCANNER = re.compile("|".join(f"(?P<{n}>{p})" for n, p in _TOKEN_SPEC), re.S)


def _tokenize(text: str):
    # single C-level pass; contiguity check catches untokenizable spans
    # (finditer would silently skip them otherwise)
    out = []
    pos = 0
    for m in _SCANNER.finditer(text):
        if m.start() != pos:
            raise RDFParseError(
                f"cannot tokenize at offset {pos}: {text[pos:pos+30]!r}"
            )
        pos = m.end()
        kind = m.lastgroup
        if kind not in ("WS", "COMMENT"):
            out.append((kind, m.group(0)))
    if pos != len(text):
        raise RDFParseError(
            f"cannot tokenize at offset {pos}: {text[pos:pos+30]!r}"
        )
    out.append(("EOF", ""))
    return out


# --- parser -----------------------------------------------------------------

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")
_LOCAL_ESC_RE = re.compile(r"\\([_~.\-!$&'()*+,;=/?#@%])")


class TurtleParser:
    """One instance per document. ``parse`` returns a list of 8-tuples
    ``(s_kind, s_lex, p, o_kind, o_lex, o_datatype, o_lang, g="")`` with
    document-local bnode labels (anonymous nodes get labels "!a<N>")."""

    def __init__(self, base: str = ""):
        self.base = base
        self.prefixes: dict[str, str] = {}
        self.anon_counter = 0
        self.out: list[tuple] = []
        self.toks: list[tuple[str, str]] = []
        self.i = 0

    # token helpers
    def _peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def _next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def _expect_punct(self, ch: str) -> None:
        k, v = self._next()
        if k != "PUNCT" or v != ch:
            raise RDFParseError(f"expected {ch!r}, got {v!r}")

    def _fresh_bnode(self) -> str:
        self.anon_counter += 1
        return f"!a{self.anon_counter}"

    # term construction
    def _make_iri(self, ref: str) -> str:
        if _SCHEME_RE.match(ref) and not self.base:
            return ref
        if self.base:
            return resolve(self.base, ref)
        if not _SCHEME_RE.match(ref):
            raise RDFParseError(f"relative IRI {ref!r} with no base")
        return ref

    def _iri_from_token(self, kind: str, val: str) -> str:
        if kind == "IRIREF":
            iri = unescape_iri(val[1:-1])
            for c in iri:
                if ord(c) <= 0x20 or c in '<>"{}|^`':
                    raise RDFParseError(f"illegal char in IRI: {iri!r}")
            return self._make_iri(iri)
        if kind in ("PNAME_LN", "PNAME_NS"):
            ns, _, local = val.partition(":")
            if ns not in self.prefixes:
                raise RDFParseError(f"undefined prefix {ns!r}:")
            return self.prefixes[ns] + _LOCAL_ESC_RE.sub(
                lambda m: m.group(1), _decode_pct_keep(local)
            )
        raise RDFParseError(f"not an IRI token: {val!r}")

    # grammar productions
    def parse(self, text: str) -> list[tuple]:
        self.toks = _tokenize(text)
        self.i = 0
        while self._peek()[0] != "EOF":
            k, v = self._peek()
            if k == "ATPREFIX":
                self._next()
                self._directive_prefix(require_dot=True)
            elif k == "ATBASE":
                self._next()
                self._directive_base(require_dot=True)
            elif k == "KEYWORD" and v.lower() == "prefix":
                self._next()
                self._directive_prefix(require_dot=False)
            elif k == "KEYWORD" and v.lower() == "base":
                self._next()
                self._directive_base(require_dot=False)
            elif k == "ATVERSION" or (k == "KEYWORD" and v.lower() == "version"):
                self._next()
                self._directive_version(require_dot=(k == "ATVERSION"))
            else:
                self._triples()
                self._expect_punct(".")
        return self.out

    def _directive_version(self, require_dot: bool) -> None:
        k, v = self._next()
        if k not in ("STRING2", "STRING1"):
            raise RDFParseError(f"expected version string, got {v!r}")
        if require_dot:
            self._expect_punct(".")

    def _directive_prefix(self, require_dot: bool) -> None:
        k, v = self._next()
        if k != "PNAME_NS":
            raise RDFParseError(f"expected prefix name, got {v!r}")
        ns = v[:-1]
        k2, v2 = self._next()
        if k2 != "IRIREF":
            raise RDFParseError(f"expected IRI in @prefix, got {v2!r}")
        iri = unescape_iri(v2[1:-1])
        # positional: applies to subsequent terms only (LangTurtleBase:172-199)
        self.prefixes[ns] = self._make_iri(iri) if not _SCHEME_RE.match(iri) else iri
        if require_dot:
            self._expect_punct(".")

    def _directive_base(self, require_dot: bool) -> None:
        k, v = self._next()
        if k != "IRIREF":
            raise RDFParseError(f"expected IRI in @base, got {v!r}")
        iri = unescape_iri(v[1:-1])
        self.base = resolve(self.base, iri) if self.base else iri
        if require_dot:
            self._expect_punct(".")

    def _triples(self) -> None:
        k, v = self._peek()
        if k == "PUNCT" and v == "[":
            subj = self._bnode_property_list()
            # predicateObjectList is optional after a bnode property list
            # (terminator is '.' in Turtle, also '}' inside a TriG block)
            k2, v2 = self._peek()
            if not (k2 == "PUNCT" and v2 in (".", "}")):
                self._predicate_object_list(subj)
        elif k == "PUNCT" and v == "(":
            subj = self._collection()
            self._predicate_object_list(subj)
        elif k == "RT_OPEN":
            subj = self._subject()
            # a sole reified triple is a complete statement (its reifies
            # assertion was already emitted) — turtle12-syntax-basic-04
            k2, v2 = self._peek()
            if not (k2 == "PUNCT" and v2 in (".", "}")):
                self._predicate_object_list(subj)
        else:
            subj = self._subject()
            self._predicate_object_list(subj)

    def _subject(self) -> tuple[int, str]:
        k, v = self._peek()
        if k == "RT_OPEN":
            self._next()
            return self._reified_triple()
        self._next()
        if k in ("IRIREF", "PNAME_LN", "PNAME_NS"):
            return (KIND_IRI, self._iri_from_token(k, v))
        if k == "BNODE":
            return (KIND_BNODE, v[2:])
        if k == "ANON":
            return (KIND_BNODE, self._fresh_bnode())
        raise RDFParseError(f"bad subject: {v!r} (literal subjects are illegal)")

    # --- RDF 1.2: triple terms, reified triples, annotations ---------------

    def _serialize_term(self, t: tuple[int, str, str, str]) -> str:
        from .ntriples import format_term_raw

        return format_term_raw(t[0], t[1], t[2], t[3])

    def _triple_term(self) -> tuple[int, str, str, str]:
        """After TT_OPEN: ttSubject verb ttObject ')>>'."""
        s = self._tt_subject()
        p = self._predicate()
        o = self._tt_object()
        k, v = self._next()
        if k != "TT_CLOSE":
            raise RDFParseError(f"expected ')>>', got {v!r}")
        inner = " ".join(
            [self._serialize_term((s[0], s[1], "", "")),
             self._serialize_term((KIND_IRI, p, "", "")),
             self._serialize_term(o)]
        )
        return (KIND_TRIPLE_TERM, inner, "", "")

    def _tt_subject(self) -> tuple[int, str]:
        k, v = self._next()
        if k in ("IRIREF", "PNAME_LN", "PNAME_NS"):
            return (KIND_IRI, self._iri_from_token(k, v))
        if k == "BNODE":
            return (KIND_BNODE, v[2:])
        if k == "ANON":
            return (KIND_BNODE, self._fresh_bnode())
        raise RDFParseError(f"bad triple-term subject: {v!r}")

    def _tt_object(self) -> tuple[int, str, str, str]:
        k, v = self._peek()
        if k == "TT_OPEN":
            self._next()
            return self._triple_term()
        if k in ("PUNCT",) and v in ("[", "("):
            raise RDFParseError("property/collection lists not allowed in triple terms")
        if k == "RT_OPEN":
            raise RDFParseError("reified triple not allowed inside a triple term")
        return self._object()

    def _reified_triple(self) -> tuple[int, str]:
        """After RT_OPEN: rtSubject verb rtObject reifier? '>>' —
        emits (reifier, rdf:reifies, tripleTerm), value = reifier."""
        k, _ = self._peek()
        if k == "RT_OPEN":
            self._next()
            s = self._reified_triple()
        else:
            s = self._tt_subject()
        p = self._predicate()
        k, v = self._peek()
        if k == "RT_OPEN":
            self._next()
            rt = self._reified_triple()
            o = (rt[0], rt[1], "", "")
        elif k == "TT_OPEN":
            self._next()
            o = self._triple_term()
        elif k == "PUNCT" and v in ("[", "("):
            # collections / bnode property lists are not rtObjects
            # (turtle12-syntax-bad-06/07); '[]' (ANON) is fine and is a
            # distinct token
            raise RDFParseError(f"{v!r} not allowed inside a reified triple")
        else:
            o = self._object()
        reifier = None
        if self._peek()[0] == "TILDE":
            self._next()
            reifier = self._opt_reifier_term()
        k, v = self._next()
        if k != "RT_CLOSE":
            raise RDFParseError(f"expected '>>', got {v!r}")
        if reifier is None:
            reifier = (KIND_BNODE, self._fresh_bnode())
        inner = " ".join(
            [self._serialize_term((s[0], s[1], "", "")),
             self._serialize_term((KIND_IRI, p, "", "")),
             self._serialize_term(o)]
        )
        self._emit(reifier, RDF_REIFIES, (KIND_TRIPLE_TERM, inner, "", ""))
        return reifier

    def _opt_reifier_term(self) -> tuple[int, str] | None:
        k, v = self._peek()
        if k in ("IRIREF", "PNAME_LN", "PNAME_NS"):
            self._next()
            return (KIND_IRI, self._iri_from_token(k, v))
        if k == "BNODE":
            self._next()
            return (KIND_BNODE, v[2:])
        if k == "ANON":
            self._next()
            return (KIND_BNODE, self._fresh_bnode())
        return None

    def _predicate(self) -> str:
        k, v = self._next()
        if k == "KEYWORD" and v == "a":
            return RDF_TYPE
        if k in ("IRIREF", "PNAME_LN", "PNAME_NS"):
            return self._iri_from_token(k, v)
        raise RDFParseError(f"bad predicate: {v!r}")

    def _predicate_object_list(self, subj: tuple[int, str]) -> None:
        while True:
            p = self._predicate()
            self._object_list(subj, p)
            k, v = self._peek()
            if k == "PUNCT" and v == ";":
                self._next()
                # allow trailing ';' before '.' / ']' / '}' / '|}' blocks
                k2, v2 = self._peek()
                if (k2 == "PUNCT" and v2 in (".", "]", ";", "}")) or k2 == "ANNOT_CLOSE":
                    while self._peek() == ("PUNCT", ";"):
                        self._next()
                    if self._peek()[1] in (".", "]", "}", "|}"):
                        return
                continue
            return

    def _object_list(self, subj: tuple[int, str], p: str) -> None:
        while True:
            o = self._object()
            self._emit(subj, p, o)
            self._annotations(subj, p, o)
            if self._peek() == ("PUNCT", ","):
                self._next()
                continue
            return

    def _annotations(self, subj, p, o) -> None:
        """RDF 1.2 annotation syntax after an asserted object:
        ('~' reifier? | '{|' predicateObjectList '|}')* — each '~' mints a
        reifies assertion; each block annotates the pending (or a fresh)
        reifier (turtle12-eval-annotation-*)."""
        pending: tuple[int, str] | None = None
        while True:
            k, v = self._peek()
            if k == "TILDE":
                self._next()
                r = self._opt_reifier_term()
                if r is None:
                    r = (KIND_BNODE, self._fresh_bnode())
                inner = " ".join(
                    [self._serialize_term((subj[0], subj[1], "", "")),
                     self._serialize_term((KIND_IRI, p, "", "")),
                     self._serialize_term(o)]
                )
                self._emit(r, RDF_REIFIES, (KIND_TRIPLE_TERM, inner, "", ""))
                pending = r
            elif k == "ANNOT_OPEN":
                self._next()
                if pending is None:
                    r = (KIND_BNODE, self._fresh_bnode())
                    inner = " ".join(
                        [self._serialize_term((subj[0], subj[1], "", "")),
                         self._serialize_term((KIND_IRI, p, "", "")),
                         self._serialize_term(o)]
                    )
                    self._emit(r, RDF_REIFIES, (KIND_TRIPLE_TERM, inner, "", ""))
                else:
                    r = pending
                self._predicate_object_list(r)
                kk, vv = self._next()
                if kk != "ANNOT_CLOSE":
                    raise RDFParseError(f"expected '|}}', got {vv!r}")
                pending = None
            else:
                return

    def _object(self) -> tuple[int, str, str, str]:
        """Returns (kind, lex, datatype, lang)."""
        k, v = self._peek()
        if k == "TT_OPEN":
            self._next()
            return self._triple_term()
        if k == "RT_OPEN":
            self._next()
            r = self._reified_triple()
            return (r[0], r[1], "", "")
        if k == "PUNCT" and v == "[":
            kind, lab = self._bnode_property_list()
            return (kind, lab, "", "")
        if k == "PUNCT" and v == "(":
            kind, lab = self._collection()
            return (kind, lab, "", "")
        self._next()
        if k in ("IRIREF", "PNAME_LN", "PNAME_NS"):
            return (KIND_IRI, self._iri_from_token(k, v), "", "")
        if k == "BNODE":
            return (KIND_BNODE, v[2:], "", "")
        if k == "ANON":
            return (KIND_BNODE, self._fresh_bnode(), "", "")
        if k in ("STRING2", "STRING1", "STRING_LONG2", "STRING_LONG1"):
            lex = self._string_body(k, v)
            nk, nv = self._peek()
            if nk == "LANGTAG":
                self._next()
                return (KIND_LITERAL, lex, RDF_LANGSTRING, nv[1:])
            if nk == "DTYPE":
                self._next()
                dk, dv = self._next()
                return (KIND_LITERAL, lex, self._iri_from_token(dk, dv), "")
            return (KIND_LITERAL, lex, XSD_STRING, "")
        if k == "INTEGER":
            return (KIND_LITERAL, v, XSD_NS + "integer", "")
        if k == "DECIMAL":
            return (KIND_LITERAL, v, XSD_NS + "decimal", "")
        if k == "DOUBLE":
            return (KIND_LITERAL, v, XSD_NS + "double", "")
        if k == "KEYWORD" and v in ("true", "false"):
            return (KIND_LITERAL, v, XSD_NS + "boolean", "")
        raise RDFParseError(f"bad object: {v!r}")

    @staticmethod
    def _string_body(kind: str, v: str) -> str:
        if kind in ("STRING_LONG2", "STRING_LONG1"):
            return unescape_string(v[3:-3])
        return unescape_string(v[1:-1])

    def _bnode_property_list(self) -> tuple[int, str]:
        self._expect_punct("[")
        label = self._fresh_bnode()
        self._predicate_object_list((KIND_BNODE, label))
        self._expect_punct("]")
        return (KIND_BNODE, label)

    def _collection(self) -> tuple[int, str]:
        # (...) → rdf:first/rdf:rest chain in list order (LangTurtleBase:767-814)
        self._expect_punct("(")
        items: list[tuple[int, str, str, str]] = []
        while not (self._peek() == ("PUNCT", ")")):
            if self._peek()[0] == "EOF":
                raise RDFParseError("unterminated collection")
            items.append(self._object())
        self._next()  # ')'
        if not items:
            return (KIND_IRI, RDF_NIL)
        cells = [self._fresh_bnode() for _ in items]
        for idx, item in enumerate(items):
            cell = (KIND_BNODE, cells[idx])
            self._emit(cell, RDF_FIRST, item)
            rest: tuple[int, str, str, str]
            if idx + 1 < len(cells):
                rest = (KIND_BNODE, cells[idx + 1], "", "")
            else:
                rest = (KIND_IRI, RDF_NIL, "", "")
            self._emit(cell, RDF_REST, rest)
        return (KIND_BNODE, cells[0])

    def _emit(self, subj: tuple[int, str], p: str, o: tuple[int, str, str, str]) -> None:
        self.out.append((subj[0], subj[1], p, o[0], o[1], o[2], o[3], ""))


def _decode_pct_keep(local: str) -> str:
    """PN_LOCAL %-escapes stay literal percent sequences (Turtle spec)."""
    return local


def parse_turtle(text: str, base: str = "", on_error: str = "raise") -> list[tuple]:
    """Parse one Turtle document → list of term 8-tuples (see TurtleParser)."""
    try:
        return TurtleParser(base=base).parse(text)
    except RDFParseError:
        if on_error == "skip":
            return []
        raise
    except RecursionError:
        if on_error == "skip":
            return []
        raise RDFParseError("nesting too deep")


class TriGParser(TurtleParser):
    """TriG 1.1 = Turtle + named-graph blocks (riot/lang/LangTriG.java):

        GRAPH <g> { triples }    |    <g> { triples }    |    { triples }

    plus plain Turtle statements (default graph). The current graph name
    is positional state, scoped to one block.
    """

    def __init__(self, base: str = ""):
        super().__init__(base)
        self.current_graph = ""

    def parse(self, text: str) -> list[tuple]:
        self.toks = _tokenize(text)
        self.i = 0
        while self._peek()[0] != "EOF":
            k, v = self._peek()
            if k == "ATPREFIX":
                self._next()
                self._directive_prefix(require_dot=True)
            elif k == "ATBASE":
                self._next()
                self._directive_base(require_dot=True)
            elif k == "KEYWORD" and v.lower() == "prefix":
                self._next()
                self._directive_prefix(require_dot=False)
            elif k == "KEYWORD" and v.lower() == "base":
                self._next()
                self._directive_base(require_dot=False)
            else:
                self._block()
        return self.out

    def _block(self) -> None:
        k, v = self._peek()
        # GRAPH <name> { ... }
        if self._is_graph_keyword():
            self._next()
            gname = self._graph_name()
            self._wrapped_block(gname)
            return
        # <name> { ... }  |  _:b { ... }
        if k in ("IRIREF", "PNAME_LN", "PNAME_NS", "BNODE", "ANON"):
            save = self.i
            try:
                gname = self._graph_name()
            except RDFParseError:
                self.i = save
                gname = None
            if gname is not None and self._peek() == ("PUNCT", "{"):
                self._wrapped_block(gname)
                return
            self.i = save
        if self._peek() == ("PUNCT", "{"):
            self._wrapped_block("")
            return
        # plain Turtle statement → default graph
        self.current_graph = ""
        self._triples()
        self._expect_punct(".")

    def _is_graph_keyword(self) -> bool:
        k, v = self._peek()
        return k == "GRAPHKW"

    def _graph_name(self) -> str:
        k, v = self._next()
        if k in ("IRIREF", "PNAME_LN", "PNAME_NS"):
            return self._iri_from_token(k, v)
        if k == "BNODE":
            return "_:" + v[2:]
        if k == "ANON":
            return "_:" + self._fresh_bnode()
        raise RDFParseError(f"bad graph name: {v!r}")

    def _wrapped_block(self, gname: str) -> None:
        self._expect_punct("{")
        self.current_graph = gname
        while not (self._peek() == ("PUNCT", "}")):
            if self._peek()[0] == "EOF":
                raise RDFParseError("unterminated graph block")
            self._triples()
            if self._peek() == ("PUNCT", "."):
                self._next()
            elif self._peek() != ("PUNCT", "}"):
                raise RDFParseError(f"expected '.' or '}}', got {self._peek()[1]!r}")
        self._next()  # '}'
        self.current_graph = ""

    def _emit(self, subj, p, o) -> None:
        self.out.append(
            (subj[0], subj[1], p, o[0], o[1], o[2], o[3], self.current_graph)
        )


def parse_trig(text: str, base: str = "", on_error: str = "raise") -> list[tuple]:
    """Parse one TriG document → term 8-tuples with graph names."""
    try:
        return TriGParser(base=base).parse(text)
    except (RDFParseError, RecursionError):
        if on_error == "skip":
            return []
        raise
