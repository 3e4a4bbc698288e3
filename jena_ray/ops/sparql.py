"""Minimal SPARQL SELECT front-end → Dataset pipeline compiler.

Reference: jena-arq's parse → algebra → execute chain
(sparql/lang/SPARQLParser, algebra/Algebra.java:73-77 compile/optimize,
engine/main/OpExecutor.java execute). This is the text front door the
round-1 verdict named the #1 user-surface gap; the subset below compiles
onto the already-oracled Dataset operators:

    SELECT [DISTINCT] ?v ... | *        → ops/bgp.select / dedup
    WHERE { triple patterns . ... }     → ops/bgp.match_bgp (chained
                                          hash joins, greedy planner)
    OPTIONAL { ... }                    → left-outer hash join on the
                                          shared variables (OpLeftJoin)
    { ... } UNION { ... }               → column-aligned Dataset.union
                                          (OpUnion, bag semantics)
    MINUS { ... }                       → marker left-join anti-semantics
                                          (OpMinus: drop bindings that
                                          join a right-side row)
    FILTER [NOT] EXISTS { ... }         → marker semi/anti join on the
                                          shared variables (E_Exists /
                                          E_NotExists); with no shared
                                          variables, a non-emptiness gate
    GROUP BY ?v ... + aggregates        → Dataset.groupby().aggregate
                                          (COUNT/SUM/MIN/MAX/AVG(?v),
                                          numeric coercion for SUM/AVG;
                                          COUNT(DISTINCT ?v) and
                                          GROUP_CONCAT(?v; SEPARATOR=..)
                                          as distributed AggregateFn
                                          folds, SAMPLE(?v) as the
                                          deterministic min)
    FILTER(expr)                        → vectorized pyarrow.compute
    ORDER BY [ASC|DESC](?v) ...         → Dataset.sort
    LIMIT / OFFSET                      → Dataset.limit (+offset skip)
    PREFIX / a / IRIs / literals / vars

Expression subset: comparisons (= != < <= > >=), && || !,
arithmetic + - * / with unary minus (type-error rows → null → false),
?v [NOT] IN (constants), REGEX(?v, "pat"),
STRSTARTS/STRENDS/CONTAINS(?v, "s"), STRLEN(?v), BOUND(?v), LANG(?v),
DATATYPE(?v), LANGMATCHES(LANG(?v), "rng"),
ISIRI/ISURI/ISLITERAL/ISBLANK(?v), and the value builtins STR, UCASE,
LCASE, CONCAT, SUBSTR(e, start[, len]) (constant bounds),
REPLACE(e, "pat", "rep") ($N backrefs), STRBEFORE/STRAFTER(e, "s"),
ABS/ROUND/CEIL/FLOOR, COALESCE, IF(cond, a, b) — all vectorized
pyarrow.compute kernels. SELECT (expr AS ?v) projection expressions
desugar to trailing BINDs. Bindings are lexical forms plus
hidden term-metadata columns ({v}__kind/__dt/__lang, see ops/bgp.py);
comparison is TERM-TYPED (NodeValue.java): in a numeric context (a
numeric literal / STRLEN operand) rows compare in the numeric value
space — ill-typed rows are type errors → false — while untyped lexical
numbers keep working; between two terms, rows where BOTH sides are
numeric-TYPED compare by value ("01"^^xsd:int = "1"^^xsd:decimal), all
others lexically. ORDER BY uses SPARQL term ordering
(BindingComparator.java): unbound < bnode < IRI < literal, numeric
literals by value. Joins remain on the lexical form (documented subset).
Unmatched OPTIONAL variables surface as nulls, exactly like the algebra.

Property paths in predicate position compile onto ops/paths.py's
evaluator: `^p`, `p|q`, `p/q`, `!(p|^q)`, and closures `p*`/`p+`/`p?` —
closures require a constant subject or object (seeded evaluation, the
shape SPARQL engines use; unseeded closure is O(V²) and rejected).

VALUES (single- and multi-var) compiles to an inline relation joined
into the group; BIND(expr AS ?v) to a vectorized computed column
(numeric results render as canonical lexical forms).

{ SELECT ... } subqueries compile recursively and join into their group
on the shared variables (aggregate subqueries included). GRAPH <g>
scopes its group's patterns to one named graph; GRAPH ?g matches named
graphs only and binds ?g as a shared variable (same-graph joins).
DESCRIBE <iri> returns the node's direct star; ASK short-circuits.
Default-graph mode is UNION-default (no g constraint — Jena
unionDefaultGraph), matching the engine's one-table model.

Out of subset: federated SERVICE, GRAPH scope inside subqueries. OPTIONAL and
each UNION arm must share ≥1 variable with the rest of their group (no
cartesian products — same rule as the BGP planner).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from ..model import (RDF_FIRST, RDF_NIL, RDF_REST, RDF_TYPE, RDFParseError)
from ..rdf.literals import XSD_INTEGER_TYPES as _XSD_INTS
from . import paths as _paths
from .bgp import Lit, TTPat, Var, match_bgp, select, tt_ground_lex

RDF_REIFIES = "http://www.w3.org/1999/02/22-rdf-syntax-ns#reifies"


def _walk_term_types(x, cls) -> bool:
    """True when a pattern/template term (possibly a nested triple-term
    TTPat) contains an instance of ``cls`` (Var / BNode walks)."""
    if isinstance(x, cls):
        return True
    if isinstance(x, TTPat):
        return any(_walk_term_types(c, cls) for c in (x.s, x.p, x.o))
    return False


from dataclasses import dataclass as _dataclass


@_dataclass(frozen=True)
class BNode:
    """A blank node in an update/CONSTRUCT template (fresh per
    solution) or INSERT DATA block (shared within the block)."""

    label: str

_TOK = re.compile(
    r"""\s*(?:
        (?P<comment>\#[^\n]*) |
        # PN_CHARS includes U+00B7, combining marks U+0300-U+036F and
        # U+203F-U+2040 in non-first position (grammar PN_CHARS)
        # PN_LOCAL admits PLX = %XX percent-groups (NOT decoded) and
        # PN_LOCAL_ESC backslash escapes (grammar 19.8 [170-173])
        (?P<pname>[^\W\d](?:[\w\-.·̀-ͯ‿-⁀]*[\w\-·̀-ͯ‿-⁀])?:(?:(?:[\w:·̀-ͯ‿-⁀]|%[0-9A-Fa-f]{2}|\\[_~.\-!$&'()*+,;=/?#@%])(?:(?:[\w\-.:·̀-ͯ‿-⁀]|%[0-9A-Fa-f]{2}|\\[_~.\-!$&'()*+,;=/?#@%])*(?:[\w\-:·̀-ͯ‿-⁀]|%[0-9A-Fa-f]{2}|\\[_~.\-!$&'()*+,;=/?#@%]))?)?|:(?:(?:[\w:·̀-ͯ‿-⁀]|%[0-9A-Fa-f]{2}|\\[_~.\-!$&'()*+,;=/?#@%])(?:(?:[\w\-.:·̀-ͯ‿-⁀]|%[0-9A-Fa-f]{2}|\\[_~.\-!$&'()*+,;=/?#@%])*(?:[\w\-:·̀-ͯ‿-⁀]|%[0-9A-Fa-f]{2}|\\[_~.\-!$&'()*+,;=/?#@%]))?)?) |
        (?P<kw>(?i:PREFIX|BASE|SELECT|CONSTRUCT|DESCRIBE|ASK|DISTINCT|WHERE|FILTER|OPTIONAL|UNION|MINUS|GRAPH|GROUP_CONCAT|GROUP|HAVING|ORDER|BY|ASC|DESC|LIMIT|OFFSET|REGEX|STRSTARTS|STRENDS|CONTAINS|STRLEN|STRBEFORE|STRAFTER|STR|BOUND|LANGMATCHES|LANG|DATATYPE|ISIRI|ISURI|ISLITERAL|ISBLANK|COUNT|SUM|MIN|MAX|AVG|SAMPLE|MODE|MEDIAN|SEPARATOR|AS|VALUES|BIND|LET|LATERAL|EXISTS|NOT|INSERT|IN|IF|UCASE|LCASE|CONCAT|SUBSTR|REPLACE|ABS|ROUND|CEIL|FLOOR|COALESCE|DELETE|DATA|CLEAR|ALL|DEFAULT|WITH|USING|NAMED|FROM|DROP|CREATE|ADD|MOVE|COPY|SILENT|TO|LOAD|INTO|TRUE|FALSE|SAMETERM|ISNUMERIC|MD5|SHA1|SHA256|SHA384|SHA512|STRDT|STRLANG|UNDEF|REDUCED|YEAR|MONTH|DAY|HOURS|MINUTES|SECONDS|TIMEZONE|TZ|NOW|RAND|UUID|STRUUID|BNODE|IRI|URI|ENCODE_FOR_URI|FOLD|UNFOLD|TRIPLE|SUBJECT|PREDICATE|OBJECT|ISTRIPLE|LANGDIR|STRLANGDIR|HASLANG|HASLANGDIR|a)\b) |
        (?P<var>[?$][A-Za-z_]\w*) |
        # RDF 1.2 triple-term / reified-triple / annotation delimiters
        # (before iri/op so `<<`/`<<(`/`)>>`/`{|` lex as single tokens)
        (?P<tt><<\(|\)>>|<<|>>|\{\||\|\}|~) |
        (?P<iri><[^<>\s]*>) |
        (?P<num>[+-]?(?:\d+\.\d+|\.\d+|\d+)(?:[eE][+-]?\d+)?) |
        (?P<string>"{3}(?:[^\\]|\\.)*?"{3}|'{3}(?:[^\\]|\\.)*?'{3}|"(?:[^"\\\n]|\\.)*"|'(?:[^'\\\n]|\\.)*') |
        (?P<langtag>@[A-Za-z]+(?:-[A-Za-z0-9]+)*) |
        (?P<op>&&|\|\||!=|<=|>=|\^\^|[=<>!*{}().,;|/^+?\[\]-]) |
    )""",
    re.VERBOSE,
)


def _tokenize(text: str):
    out, pos = [], 0
    while pos < len(text):
        m = _TOK.match(text, pos)
        if m is None or m.end() == pos and not text[pos:].strip():
            break
        if m.end() == pos:
            raise RDFParseError(f"SPARQL: cannot tokenize at {text[pos:pos+24]!r}")
        pos = m.end()
        if m.lastgroup in (None, "comment"):
            continue
        out.append((m.lastgroup, m.group(m.lastgroup)))
    return out


def _sq(v: str) -> str:
    """Strip string-literal quotes (short or long form)."""
    if v.startswith('\'\'\'') or v.startswith('"""'):
        return v[3:-3]
    return v[1:-1]


_ESC_RE = re.compile(r"\\(u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8}|.)", re.S)
_ESC_MAP = {"t": "\t", "n": "\n", "r": "\r", "b": "\b", "f": "\f",
            '"': '"', "'": "'", "\\": "\\"}


def _unesc(s: str) -> str:
    """SPARQL string-literal escapes (grammar ECHAR + codepoint escapes
    \\uXXXX / \\UXXXXXXXX), single left-to-right pass — an escape's
    OUTPUT is never re-scanned, and a lone surrogate codepoint is a
    syntax error (W3C syntax-query surrogate tests)."""
    if "\\" not in s:
        return s

    def rep(m):
        e = m.group(1)
        if e[0] in "uU" and len(e) > 1:
            cp = int(e[1:], 16)
            if 0xD800 <= cp <= 0xDFFF:
                raise RDFParseError(
                    "SPARQL: surrogate codepoint escape in string literal")
            return chr(cp)
        if e in _ESC_MAP:
            return _ESC_MAP[e]
        raise RDFParseError(f"SPARQL: bad string escape \\{e}")

    return _ESC_RE.sub(rep, s)


# keywords that can open an ORDER BY expression condition (grammar
# OrderCondition ::= (ASC|DESC) BrackettedExpression | Constraint | Var;
# Constraint = BrackettedExpression | BuiltInCall | FunctionCall)
_ORDER_FN_KWS = frozenset({
    "STR", "UCASE", "LCASE", "ABS", "ROUND", "CEIL", "FLOOR", "STRLEN",
    "BOUND", "LANG", "DATATYPE", "ISIRI", "ISURI", "ISLITERAL", "ISBLANK",
    "REGEX", "STRSTARTS", "STRENDS", "CONTAINS", "LANGMATCHES", "MD5",
    "SHA1", "SHA256", "SHA384", "SHA512", "YEAR", "MONTH", "DAY", "HOURS",
    "MINUTES", "SECONDS", "TIMEZONE", "TZ", "NOW", "RAND", "UUID",
    "STRUUID", "BNODE", "IRI", "URI", "ENCODE_FOR_URI", "SAMETERM",
    "ISNUMERIC", "STRDT", "STRLANG", "CONCAT", "COALESCE", "SUBSTR",
    "REPLACE", "STRBEFORE", "STRAFTER", "IF",
})


class _Parser:
    def __init__(self, text: str, base: str = "", arq: bool = False):
        """``arq=True`` admits the ARQ EXTENDED syntax forms that
        STRICT SPARQL 1.1 must reject (Syntax.syntaxARQ vs
        syntaxSPARQL_11 — jena keys this on the .arq file extension):
        bare aggregates in the projection and SELECT * with GROUP BY
        (syn-bad-01/05 are negative tests in the strict suite)."""
        self.toks = _tokenize(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.base = base
        self.arq = arq

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", "")

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, kind, val=None):
        k, v = self.next()
        if k != kind or (val is not None and v.upper() != val.upper()):
            raise RDFParseError(f"SPARQL: expected {val or kind}, got {v!r}")
        return v

    def kw(self, word) -> bool:
        k, v = self.peek()
        if k == "kw" and v.upper() == word.upper():
            self.i += 1
            return True
        return False

    def _plain_agg_ahead(self) -> bool:
        """Lookahead (no consumption) at ``AGG ( … )``: True iff the
        token after the aggregate's balanced close-paren is AS — i.e.
        the projection item is a plain ``(AGG(…) AS ?v)``. False means
        the aggregate is a subexpression (``(COUNT(?x) + 1 AS ?c)``)
        and must go through the expression grammar's hidden-aggregate
        rewrite instead of the direct branch."""
        j = self.i + 1  # the aggregate's own '('
        if j >= len(self.toks) or self.toks[j] != ("op", "("):
            return False
        depth = 0
        while j < len(self.toks):
            k, v = self.toks[j]
            if k == "op" and v == "(":
                depth += 1
            elif k == "op" and v == ")":
                depth -= 1
                if depth == 0:
                    nxt = (self.toks[j + 1] if j + 1 < len(self.toks)
                           else ("eof", ""))
                    return nxt[0] == "kw" and nxt[1].upper() == "AS"
            j += 1
        return False

    def expand(self, kind, val) -> str:
        if kind == "iri":
            iri = val[1:-1]
            from ..rdf.iri import resolve

            # RFC 3986 §5.2.2 applies to ABSOLUTE references too: the
            # transform runs remove_dot_segments on the path whenever
            # R has a scheme (Jena resolves every parsed IRI), so
            # <eXAMPLE://a/./b/../b/c> and the same IRI in data match
            if re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", iri):
                return resolve("", iri)
            if self.base:
                return resolve(self.base, iri)
            return iri
        if kind == "pname":
            pfx, _, local = val.partition(":")
            if pfx not in self.prefixes:
                raise RDFParseError(f"SPARQL: unknown prefix {pfx!r}")
            if "\\" in local:
                # PN_LOCAL_ESC: '\~' etc. unescape to the bare char in
                # the IRI; %XX percent groups stay as-typed
                local = re.sub(r"\\([_~.\-!$&'()*+,;=/?#@%])", r"\1",
                               local)
            return self.prefixes[pfx] + local
        raise RDFParseError(f"SPARQL: expected IRI, got {val!r}")

    # --- grammar ----------------------------------------------------------

    def parse(self) -> dict:
        self.parse_prologue()
        if self.kw("ASK"):
            froms = self.parse_datasets()
            self.kw("WHERE")
            group = self.parse_group()
            _validate_scopes(group)
            if froms:
                group = {"elements": [("dataset", froms, group)],
                         "filters": [], "exists": []}
            if self.peek()[0] != "eof":
                raise RDFParseError("SPARQL: trailing tokens after ASK group")
            return {"form": "ask", "group": group}
        if self.kw("DESCRIBE"):
            # DESCRIBE ( VarOrIri+ | '*' ) DatasetClause* WhereClause?
            # (SPARQL 11 §10.4; the reference's QueryEngine + default
            # DescribeBNodeClosure handler)
            star = False
            nodes: list[str] = []
            dvars: list[str] = []
            if self.peek() == ("op", "*"):
                self.next()
                star = True
            else:
                while True:
                    k, v = self.peek()
                    if k == "var":
                        self.next()
                        dvars.append(v[1:])
                    elif k in ("iri", "pname"):
                        self.next()
                        nodes.append(self.expand(k, v))
                    else:
                        break
                if not nodes and not dvars:
                    raise RDFParseError(
                        "SPARQL: DESCRIBE needs a var, IRI, or *")
            froms = self.parse_datasets()
            group = None
            if self.kw("WHERE") or self.peek() == ("op", "{"):
                group = self.parse_group()
                _validate_scopes(group)
                if froms:
                    group = {"elements": [("dataset", froms, group)],
                             "filters": [], "exists": []}
            if self.peek()[0] != "eof":
                raise RDFParseError(
                    "SPARQL: trailing tokens after DESCRIBE")
            return {"form": "describe", "nodes": nodes, "vars": dvars,
                    "star": star, "group": group}
        if self.kw("CONSTRUCT"):
            if self.peek() != ("op", "{"):
                # CONSTRUCT DatasetClause* WHERE { tp ... } shortform
                # (SPARQL 10.2.2; the template is the WHERE pattern)
                froms = self.parse_datasets()
                self.expect("kw", "WHERE")
                group = self.parse_group()
                _validate_scopes(group)
                # pattern blank nodes (incl. desugared RDF 1.2 reifiers)
                # are existential VARS in the WHERE but template BNODES
                # in the shortform template: fresh per solution, not the
                # data's matched label (Jena Template/TemplateLib)
                def _bn(x):
                    if isinstance(x, Var) and x.name.startswith("__bn_"):
                        return BNode(x.name[5:])
                    if isinstance(x, TTPat):
                        return TTPat(_bn(x.s), _bn(x.p), _bn(x.o))
                    return x

                def _tpl_from(g, gname=""):
                    # GRAPH blocks in the WHERE become template QUADS
                    # (ARQ CONSTRUCT-quad short form)
                    out = []
                    for el in g["elements"]:
                        if el[0] == "bgp":
                            out += [(_bn(p[0]), p[1], _bn(p[2]), gname)
                                    for p in el[1]]
                        elif el[0] == "graph":
                            out += _tpl_from(el[2], el[1])
                    return out

                template = _tpl_from(group)
                if froms:
                    group = {"elements": [("dataset", froms, group)],
                             "filters": [], "exists": []}
                limit = None
                if self.kw("LIMIT"):
                    limit = int(self.expect("num"))
                if self.peek()[0] != "eof":
                    raise RDFParseError(
                        "SPARQL: trailing tokens after CONSTRUCT WHERE")
                return {"form": "construct", "template": template,
                        "group": group, "limit": limit}
            # the quad template block shares the update-template
            # grammar (triples + GRAPH blocks → (s,p,o,g) quads; ARQ
            # CONSTRUCT-quad full form)
            template = self._parse_template_block()
            froms = self.parse_datasets()
            self.kw("WHERE")  # optional (WhereClause ::= 'WHERE'? Group)
            group = self.parse_group()
            _validate_scopes(group)
            if froms:
                group = {"elements": [("dataset", froms, group)],
                         "filters": [], "exists": []}
            limit = None
            if self.kw("LIMIT"):
                limit = int(self.expect("num"))
            if self.peek()[0] != "eof":
                raise RDFParseError("SPARQL: trailing tokens after CONSTRUCT")
            for pat in template:
                if isinstance(pat[1], _paths.Path):
                    raise RDFParseError(
                        "SPARQL: property paths not allowed in CONSTRUCT template"
                    )
            return {"form": "construct", "template": template, "group": group,
                    "limit": limit}
        q = self.parse_select_rest()
        if self.peek()[0] != "eof":
            raise RDFParseError(f"SPARQL: trailing tokens at {self.peek()[1]!r}")
        _validate_query_scopes(q)
        return q

    def parse_prologue(self) -> None:
        """PREFIX / BASE declarations, any order, repeatable."""
        while True:
            if self.kw("PREFIX"):
                k, v = self.next()
                # PNAME_NS only: one ':' and it is final (syn-bad-pname)
                if k != "pname" or not v.endswith(":") or ":" in v[:-1]:
                    raise RDFParseError(
                        f"SPARQL: bad PREFIX declaration {v!r}")
                pfx = v[:-1]
                self.prefixes[pfx] = self.expand("iri", self.expect("iri"))
            elif self.kw("BASE"):
                self.base = self.expect("iri")[1:-1]
            else:
                return

    def _graph_ref(self):
        """[GRAPH] <g> | DEFAULT | NAMED | ALL → "" | iri | "named" |
        "all" (GraphRef / GraphOrDefault of the update grammar)."""
        if self.kw("DEFAULT"):
            return ""
        if self.kw("NAMED"):
            return "named"
        if self.kw("ALL"):
            return "all"
        self.kw("GRAPH")
        k, v = self.next()
        return self.expand(k, v)

    def parse_update(self) -> list[dict]:
        """SPARQL 1.1 Update request → list of operation dicts
        (jena-arq modify/UpdateRequest / lang/UpdateParser analog).
        Subset: INSERT/DELETE DATA (quads), DELETE WHERE,
        [WITH <g>] DELETE {} INSERT {} [USING [NAMED] <g>]* WHERE {},
        CLEAR/DROP [SILENT] (ALL|DEFAULT|NAMED|GRAPH g), CREATE,
        ADD/MOVE/COPY [SILENT]; ';'-separated operations apply
        sequentially. GRAPH blocks in templates/data produce quads."""
        self.parse_prologue()
        ops: list[dict] = []
        seen_data_labels: set = set()

        def _check_data_labels(quads):
            labels = {
                x.label for q in quads for x in q[:3]
                if isinstance(x, BNode) and not x.label.startswith("anon")
            }
            reused = labels & seen_data_labels
            if reused:
                raise RDFParseError(
                    "SPARQL update: blank node label reused across DATA "
                    f"operations: _:{sorted(reused)[0]}")
            seen_data_labels.update(labels)
            return quads

        while self.peek()[0] != "eof":
            k0, v0 = self.peek()
            word = v0.upper() if k0 == "kw" else ""
            if word in ("CLEAR", "DROP"):
                self.next()
                self.kw("SILENT")
                what = self._graph_ref()
                ops.append({"op": "clear", "what": what or "default"})
            elif word == "CREATE":
                self.next()
                self.kw("SILENT")
                self._graph_ref()
                # an empty graph has no rows — CREATE is a no-op success
            elif word == "LOAD":
                # LOAD [SILENT] <doc> [INTO GRAPH g] — SYNTAX accepted
                # (the grammar); execution needs network access, which
                # this engine documents out (SILENT still succeeds as
                # the no-op the spec prescribes for a failed load)
                self.next()
                silent = self.kw("SILENT")
                k, v = self.next()
                if k != "iri":
                    raise RDFParseError(
                        "SPARQL update: LOAD needs an IRI")
                src = v[1:-1]
                g = ""
                if self.kw("INTO"):
                    self.expect("kw", "GRAPH")
                    k2, v2 = self.next()
                    g = self.expand(k2, v2)
                ops.append({"op": "load", "src": src, "graph": g,
                            "silent": silent})
            elif word in ("ADD", "MOVE", "COPY"):
                self.next()
                self.kw("SILENT")
                src = self._graph_ref()
                self.expect("kw", "TO")
                dst = self._graph_ref()
                ops.append({"op": word.lower(), "src": src, "dst": dst})
            elif word == "WITH" or word == "INSERT" or word == "DELETE":
                with_g = ""
                if word == "WITH":
                    self.next()
                    k, v = self.next()
                    with_g = self.expand(k, v)
                if self.kw("INSERT"):
                    if not with_g and self.kw("DATA"):
                        ops.append({"op": "insert_data",
                                    "quads": _check_data_labels(
                                        self._parse_template_block(
                                            constant=True))})
                    else:
                        tmpl = self._parse_template_block(default_g=with_g)
                        using = self._parse_usings()
                        self.expect("kw", "WHERE")
                        ops.append({"op": "modify", "delete": None,
                                    "insert": tmpl, "with": with_g,
                                    "using": using,
                                    "group": self.parse_group()})
                elif self.kw("DELETE"):
                    if not with_g and self.kw("DATA"):
                        ops.append({"op": "delete_data",
                                    "quads": self._parse_template_block(
                                        constant=True,
                                        forbid_bnodes=True)})
                    elif self.kw("WHERE"):
                        grp = self.parse_group()
                        for el in grp["elements"]:
                            if el[0] != "bgp":
                                continue
                            for pat in el[1]:
                                for x in pat:
                                    if isinstance(x, Var) and \
                                            x.name.startswith("__bn_"):
                                        raise RDFParseError(
                                            "SPARQL update: DELETE WHERE "
                                            "cannot contain blank nodes")
                        tmpl = [(s, p, o, with_g)
                                for el in grp["elements"] if el[0] == "bgp"
                                for (s, p, o) in el[1]]
                        tmpl += [(s, p, o, el[1])
                                 for el in grp["elements"]
                                 if el[0] == "graph"
                                 for sub_el in el[2]["elements"]
                                 if sub_el[0] == "bgp"
                                 for (s, p, o) in sub_el[1]]
                        if not tmpl:
                            raise RDFParseError(
                                "SPARQL update: DELETE WHERE needs triple "
                                "patterns")
                        ops.append({"op": "modify", "delete": tmpl,
                                    "insert": None, "with": with_g,
                                    "using": [], "group": grp})
                    else:
                        dt = self._parse_template_block(
                            default_g=with_g, forbid_bnodes=True)
                        ins = None
                        if self.kw("INSERT"):
                            ins = self._parse_template_block(
                                default_g=with_g)
                        using = self._parse_usings()
                        self.expect("kw", "WHERE")
                        ops.append({"op": "modify", "delete": dt,
                                    "insert": ins, "with": with_g,
                                    "using": using,
                                    "group": self.parse_group()})
                else:
                    raise RDFParseError(
                        "SPARQL update: WITH needs DELETE or INSERT")
            else:
                raise RDFParseError(
                    f"SPARQL update: unexpected token {self.peek()[1]!r}")
            if self.peek() == ("op", ";"):
                self.next()
            elif self.peek()[0] != "eof":
                # operations MUST be ';'-separated (grammar Update ::=
                # Prologue (Update1 (';' Update)?)? — bad-07)
                raise RDFParseError(
                    "SPARQL update: missing ';' between operations at "
                    f"{self.peek()[1]!r}")
        return ops

    def parse_datasets(self) -> list:
        """FROM <g> / FROM NAMED <g> clauses → [(named?, iri), ...]
        (DatasetClause; evaluated like USING via _using_view)."""
        out = []
        while self.kw("FROM"):
            named = self.kw("NAMED")
            k, v = self.next()
            out.append((named, self.expand(k, v)))
        return out

    def _parse_usings(self) -> list:
        """USING <g> / USING NAMED <g> clauses → [(named?, iri), ...]"""
        out = []
        while self.kw("USING"):
            named = self.kw("NAMED")
            k, v = self.next()
            out.append((named, self.expand(k, v)))
        return out

    def _parse_template_block(self, constant: bool = False,
                              default_g: str = "",
                              forbid_bnodes: bool = False) -> list:
        """{ quads } — triples and GRAPH <g>/{?g} { triples } blocks →
        (s, p, o, g) quads (UpdateDataInsert/QuadDataAcc analog);
        ``default_g`` is the WITH graph for bare triples. With
        ``constant=True`` variables are rejected (INSERT/DELETE DATA
        takes ground quads)."""
        self.expect("op", "{")
        template = []

        def add(pat, g):
            if isinstance(pat[1], _paths.Path):
                raise RDFParseError(
                    "SPARQL update: property paths not allowed in templates")
            if constant and any(_walk_term_types(x, Var) for x in pat):
                raise RDFParseError(
                    "SPARQL update: INSERT/DELETE DATA takes ground triples")
            if forbid_bnodes and any(
                    _walk_term_types(x, BNode) for x in pat):
                raise RDFParseError(
                    "SPARQL update: DELETE templates cannot contain "
                    "blank nodes")
            template.append((pat[0], pat[1], pat[2], g))

        while self.peek() != ("op", "}"):
            if self.kw("GRAPH"):
                k, v = self.peek()
                if k == "var":
                    if constant:
                        raise RDFParseError(
                            "SPARQL update: DATA blocks take constant "
                            "graph names")
                    self.next()
                    g = Var(v[1:])
                else:
                    self.next()
                    g = self.expand(k, v)
                self.expect("op", "{")
                while self.peek() != ("op", "}"):
                    for pat in self.parse_triples_block(as_template=True):
                        add(pat, g)
                    while self.peek() == ("op", "."):
                        self.next()
                self.next()
            else:
                for pat in self.parse_triples_block(as_template=True):
                    add(pat, default_g)
            while self.peek() == ("op", "."):
                self.next()
        self.next()
        return template

    def parse_select_rest(self) -> dict:
        """SELECT ... WHERE ... [GROUP BY/HAVING/ORDER/LIMIT/OFFSET] —
        shared by top-level queries and { SELECT ... } subqueries."""
        self.expect("kw", "SELECT")
        distinct = self.kw("DISTINCT")
        self.kw("REDUCED")  # REDUCED may keep the bag unchanged (18.2.5)
        proj: list | None
        agg_binds: list = []
        hidden_aggs: list = []
        # aggregate-in-expression context: active while parsing SELECT
        # expressions and HAVING (saved/restored — subqueries nest)
        prev_ctx = (getattr(self, "_agg_collect", None),
                    getattr(self, "_agg_expr_binds", None),
                    getattr(self, "_agg_aliases", None))
        self._agg_collect = hidden_aggs
        self._agg_expr_binds = agg_binds
        self._agg_aliases = None
        if self.peek() == ("op", "*"):
            self.next()
            proj = None
        else:
            proj = []
            while True:
                k, v = self.peek()
                if k == "var":
                    proj.append(("var", self.next()[1][1:]))
                elif (self.arq and k == "kw" and v.upper() in (
                        "COUNT", "SUM", "MIN", "MAX", "AVG", "SAMPLE",
                        "MODE", "MEDIAN")
                        and self.i + 1 < len(self.toks)
                        and self.toks[self.i + 1] == ("op", "(")):
                    # old ARQ style: a BARE aggregate in the projection
                    # (`SELECT count(*) {..}`) — jena allocates internal
                    # result vars named .1, .2 ... (GroupBy/count-01's
                    # golden var name)
                    fn = self.next()[1].upper()
                    self.expect("op", "(")
                    agg_distinct = self.kw("DISTINCT")
                    if self.peek() == ("op", "*"):
                        self.next()
                        var = None
                        if fn != "COUNT":
                            raise RDFParseError(
                                "SPARQL: only COUNT(*) allowed")
                    else:
                        var = self.expect("var")[1:]
                    self.expect("op", ")")
                    alias = f".{sum(1 for p in proj if p[0] == 'agg') + 1}"
                    proj.append(("agg", fn, var, alias, agg_distinct, " "))
                elif k == "op" and v == "(":
                    self.next()
                    kk, vv = self.peek()
                    fn = vv.upper() if kk == "kw" else None
                    if fn in ("COUNT", "SUM", "MIN", "MAX", "AVG",
                              "SAMPLE", "GROUP_CONCAT",
                              "MODE", "MEDIAN") and self._plain_agg_ahead():
                        self.next()
                        self.expect("op", "(")
                        agg_distinct = self.kw("DISTINCT")
                        if self.peek() == ("op", "*"):
                            self.next()
                            var = None
                            if fn != "COUNT":
                                raise RDFParseError("SPARQL: only COUNT(*) allowed")
                        else:
                            agg_arg = self.parse_add()
                            if agg_arg[0] == "var":
                                var = agg_arg[1]
                            else:
                                # aggregate over an EXPRESSION: desugar
                                # to a hidden pre-group BIND (AggSum over
                                # ExprVar rewriting)
                                var = f"__aggexpr_{len(proj)}"
                                agg_binds.append((agg_arg, var))
                        # GROUP_CONCAT(?v ; SEPARATOR="..") — default " "
                        # per AggGroupConcat; within-group order is
                        # undefined in the spec, this engine sorts for
                        # determinism
                        sep = " "
                        if fn == "GROUP_CONCAT" and self.peek() == ("op", ";"):
                            self.next()
                            self.expect("kw", "SEPARATOR")
                            self.expect("op", "=")
                            sep = _unesc(_sq(self.expect("string")))
                        self.expect("op", ")")
                        self.expect("kw", "AS")
                        alias = self.expect("var")[1:]
                        self.expect("op", ")")
                        proj.append(("agg", fn, var, alias, agg_distinct, sep))
                    elif fn == "FOLD":
                        # FOLD(?v) / FOLD(DISTINCT ?v) / FOLD(?v ORDER BY
                        # [DESC(]?o[)]) → cdt:List; FOLD(?k, ?v ...) →
                        # cdt:Map (the fork's AggFoldList/AggFoldMap)
                        self.next()
                        self.expect("op", "(")
                        agg_distinct = self.kw("DISTINCT")
                        v1 = self.expect("var")[1:]
                        var2 = None
                        if self.peek() == ("op", ","):
                            self.next()
                            var2 = self.expect("var")[1:]
                        order = None
                        if self.kw("ORDER"):
                            self.expect("kw", "BY")
                            okeys = []
                            while True:
                                if self.kw("DESC"):
                                    self.expect("op", "(")
                                    okeys.append(
                                        (self.expect("var")[1:], True))
                                    self.expect("op", ")")
                                elif self.kw("ASC"):
                                    self.expect("op", "(")
                                    okeys.append(
                                        (self.expect("var")[1:], False))
                                    self.expect("op", ")")
                                elif self.peek()[0] == "var":
                                    okeys.append(
                                        (self.expect("var")[1:], False))
                                else:
                                    break
                            if not okeys:
                                raise RDFParseError(
                                    "SPARQL: FOLD ORDER BY needs keys")
                            order = okeys
                        self.expect("op", ")")
                        self.expect("kw", "AS")
                        alias = self.expect("var")[1:]
                        self.expect("op", ")")
                        proj.append(("agg", "FOLD", v1, alias, agg_distinct,
                                     {"var2": var2, "order": order}))
                    else:
                        # SELECT (expr AS ?v) — a projection expression.
                        # With no aggregates inside: desugared into a
                        # trailing BIND. With aggregates inside (e.g.
                        # ((MIN(?p)+MAX(?p))/2 AS ?c)): a POST-GROUP bind
                        # evaluated over the aggregated relation.
                        n_hidden0 = len(hidden_aggs)
                        expr = self.parse_or()
                        self.expect("kw", "AS")
                        alias = self.expect("var")[1:]
                        self.expect("op", ")")
                        if len(hidden_aggs) > n_hidden0:
                            proj.append(("postbind", expr, alias))
                        else:
                            proj.append(("exprbind", expr, alias))
                else:
                    break
            if not proj:
                raise RDFParseError("SPARQL: empty projection")
        # aggregates are not expressions inside WHERE / GROUP BY
        self._agg_collect = None
        self._agg_expr_binds = None
        froms = self.parse_datasets()
        self.kw("WHERE")  # the WHERE keyword is optional (SELECT * { })
        group = self.parse_group()
        if froms:
            group = {"elements": [("dataset", froms, group)],
                     "filters": [], "exists": []}
        plain_proj_vars = [p[1] for p in (proj or []) if p[0] == "var"]
        aliases_seen: set = set()
        for p in (proj or []):
            if p[0] in ("agg", "exprbind", "postbind"):
                alias = p[3] if p[0] == "agg" else p[2]
                if alias in aliases_seen or alias in plain_proj_vars:
                    raise RDFParseError(
                        f"SPARQL: duplicate projection of ?{alias}")
                aliases_seen.add(alias)
        exprbind_map: dict = {}

        def _note(e, alias):
            try:
                exprbind_map[e] = alias
            except TypeError:
                pass  # exprs holding lists (CONCAT args) aren't keys

        for e, v2 in agg_binds:
            group["elements"].append(("bind", e, v2))
            _note(e, v2)
        converted: dict = {}
        if proj:
            for i, p in enumerate(proj):
                if p[0] == "exprbind":
                    group["elements"].append(("bind", p[1], p[2]))
                    _note(p[1], p[2])
                    converted[p[2]] = p[1]
                    proj[i] = ("var", p[2])
        group_by: list[str] = []
        having = None
        if self.kw("GROUP"):
            self.expect("kw", "BY")
            while True:
                k, v = self.peek()
                if k == "var":
                    group_by.append(self.next()[1][1:])
                elif k == "op" and v == "(":
                    # GROUP BY (expr [AS ?v]): group on a computed key —
                    # reuse a projection BIND of the same expression,
                    # else add a hidden one
                    self.next()
                    e = self.parse_or()
                    if self.kw("AS"):
                        alias = self.expect("var")[1:]
                        group["elements"].append(("bind", e, alias))
                    elif isinstance(e, tuple) and all(
                            not isinstance(x, list) for x in e) \
                            and e in exprbind_map:
                        alias = exprbind_map[e]
                    else:
                        alias = f"__gbexpr_{len(group_by)}"
                        group["elements"].append(("bind", e, alias))
                    self.expect("op", ")")
                    group_by.append(alias)
                else:
                    break
            if not group_by:
                raise RDFParseError("SPARQL: empty GROUP BY")
            if proj is None:
                if not self.arq:
                    raise RDFParseError(
                        "SPARQL: SELECT * cannot be used with GROUP BY")
                # ARQ extension (syntax-arq): SELECT * with GROUP BY
                # projects the group keys (GroupBy/group-05: keys incl.
                # expression aliases)
                proj = [("var", v) for v in group_by
                        if not v.startswith("__gbexpr_")]
            bad = [v for v in plain_proj_vars if v not in group_by]
            if bad:
                raise RDFParseError(
                    f"SPARQL: ?{bad[0]} is projected but neither grouped "
                    "nor aggregated")
            # a projection EXPRESSION that is not itself a group key
            # evaluates AFTER grouping (OpExtend over OpGroup — jena's
            # `SELECT (1 AS ?p) .. GROUP BY ?z`, GroupBy group-11).
            # With aggregates the postbind machinery handles it; with
            # none, the pre-group BIND stays (the value is functionally
            # dependent on the keys for any VALID query) and the
            # group-key check below must admit the alias.
            has_aggs_p = any(p[0] == "agg" for p in proj) or hidden_aggs
            if has_aggs_p:
                for i2, p2 in enumerate(proj):
                    if (p2[0] == "var" and p2[1] in converted
                            and p2[1] not in group_by):
                        e2 = converted[p2[1]]
                        try:
                            group["elements"].remove(("bind", e2, p2[1]))
                        except ValueError:
                            continue
                        proj[i2] = ("postbind", e2, p2[1])
        if self.kw("HAVING"):
            # HAVING over the aliased aggregates (an inline aggregate
            # call rewrites to the matching projected alias, or
            # registers a hidden aggregate). Legal WITHOUT GROUP BY —
            # aggregates then run over the one implicit group (§11.1,
            # agg06); new hidden pre-group binds flush below.
            self._agg_aliases = {
                (p[1], p[2], p[4]): p[3]
                for p in (proj or []) if p[0] == "agg"
            }
            self._agg_collect = hidden_aggs
            self._agg_expr_binds = agg_binds
            n_binds0 = len(agg_binds)
            self.expect("op", "(")
            having = self.parse_or()
            self.expect("op", ")")
            self._agg_aliases = None
            self._agg_collect = None
            self._agg_expr_binds = None
            for e, v2 in agg_binds[n_binds0:]:
                group["elements"].append(("bind", e, v2))
            if not group_by and not hidden_aggs and not any(
                    p[0] == "agg" for p in (proj or [])):
                raise RDFParseError(
                    "SPARQL: HAVING without GROUP BY needs an aggregate")
        order = []
        if self.kw("ORDER"):
            self.expect("kw", "BY")
            while True:
                k, v = self.peek()
                U = v.upper() if k == "kw" else None

                def _order_cond(e, desc):
                    # expression order condition → hidden BIND in the
                    # WHERE group; the term sort runs on the computed
                    # column (with its stamped meta), projected away
                    if e[0] == "var":
                        order.append((e[1], desc))
                        return
                    alias = f"__oexpr_{len(order)}"
                    group["elements"].append(("bind", e, alias))
                    order.append((alias, desc))

                if U in ("ASC", "DESC"):
                    self.next()
                    self.expect("op", "(")
                    _order_cond(self.parse_or(), U == "DESC")
                    self.expect("op", ")")
                elif k == "var":
                    self.next()
                    order.append((v[1:], False))
                elif k == "op" and v == "(":
                    # bracketted expression condition: ORDER BY (?a+?b)
                    self.next()
                    _order_cond(self.parse_or(), False)
                    self.expect("op", ")")
                elif k in ("iri", "pname") or U in _ORDER_FN_KWS:
                    # BuiltInCall / FunctionCall condition:
                    # ORDER BY str(?o), ORDER BY xsd:integer(?o)
                    _order_cond(self.parse_primary(), False)
                else:
                    break
        limit = offset = None
        # LIMIT/OFFSET in either order
        for _ in range(2):
            if self.kw("LIMIT"):
                limit = int(self.expect("num"))
            elif self.kw("OFFSET"):
                offset = int(self.expect("num"))
        if self.kw("VALUES"):
            # trailing ValuesClause joins onto the WHERE pattern (§10.2)
            group["elements"].append(self.parse_values())
        (self._agg_collect, self._agg_expr_binds,
         self._agg_aliases) = prev_ctx
        return {
            "form": "select", "distinct": distinct, "project": proj,
            "group": group, "group_by": group_by, "having": having,
            "order": order, "limit": limit, "offset": offset,
            "hidden_aggs": hidden_aggs,
            "proj_expr_vars": set(converted),
        }

    def parse_group(self) -> dict:
        """GroupGraphPattern: '{' (pattern | FILTER | OPTIONAL group |
        group UNION group)* '}' → {"elements": [...], "filters": [...]}."""
        self.expect("op", "{")
        elements: list = []
        filters: list = []
        exists: list = []
        # blank-node label scoping (19.6): a _:label may span dots
        # within ONE basic graph pattern but cannot recur once the BGP
        # is closed by another pattern element or a nested group
        blabels_open: set = set()
        blabels_closed: set = set()

        def _close_labels(extra=()):
            extra = set(extra)
            reused = extra & (blabels_open | blabels_closed)
            if reused:
                raise RDFParseError(
                    "SPARQL: blank node label reused across basic "
                    f"graph patterns: _:{sorted(reused)[0]}")
            blabels_closed.update(blabels_open)
            blabels_closed.update(extra)
            blabels_open.clear()

        def _sub_labels(g):
            return g.get("_blabels", set()) if isinstance(g, dict) else set()

        # GroupGraphPattern ::= '{' ( SubSelect | GroupGraphPatternSub )
        # '}' — a bare SELECT right after the brace is a subquery
        if self.peek()[0] == "kw" and self.peek()[1].upper() == "SELECT":
            sub = self.parse_select_rest()
            self.expect("op", "}")
            return {"elements": [("subquery", sub)], "filters": [],
                    "exists": [],
                    "_blabels": _sub_labels(sub.get("group", {}))}
        while self.peek() != ("op", "}"):
            if self.kw("FILTER"):
                # FILTER EXISTS { ... } / FILTER NOT EXISTS { ... } are
                # pattern-level gates (E_Exists/E_NotExists), collected
                # apart from the row-wise expression filters
                if self.kw("EXISTS"):
                    exists.append((True, self.parse_group()))
                elif self.kw("NOT"):
                    if not self.kw("EXISTS"):
                        raise RDFParseError(
                            "SPARQL: FILTER NOT must be followed by EXISTS"
                        )
                    exists.append((False, self.parse_group()))
                elif self.peek() == ("op", "("):
                    # EXISTS parses as an expression operand now — a
                    # filter that is EXACTLY [NOT] EXISTS routes to the
                    # efficient semi-join gate; EXISTS nested in ||/&&
                    # stays in the expression (marker-column compile)
                    self.next()
                    e = self.parse_or()
                    self.expect("op", ")")
                    if e[0] == "existsexpr":
                        exists.append((e[1], e[2]))
                    elif (e[0] == "not" and isinstance(e[1], tuple)
                          and e[1][0] == "existsexpr"):
                        exists.append((not e[1][1], e[1][2]))
                    else:
                        filters.append(e)
                else:
                    # FILTER Constraint may be a bare BuiltInCall /
                    # FunctionCall without outer parens (FILTER regex(..))
                    # — but never a bare variable/literal (grammar:
                    # BrackettedExpression | BuiltInCall | FunctionCall)
                    if self.peek()[0] not in ("kw", "iri", "pname"):
                        raise RDFParseError(
                            "SPARQL: FILTER needs (expr), a builtin, or "
                            "a function call")
                    filters.append(self.parse_primary())
            elif self.kw("UNFOLD"):
                # UNFOLD( ?cdt AS ?v1 [, ?v2] ) — the fork's CDT clause:
                # one solution per list element (v2 = 1-based index) or
                # map entry (v1 = key, v2 = value)
                self.expect("op", "(")
                src = self.expect("var")[1:]
                self.expect("kw", "AS")
                v1 = self.expect("var")[1:]
                v2 = None
                if self.peek() == ("op", ","):
                    self.next()
                    v2 = self.expect("var")[1:]
                self.expect("op", ")")
                elements.append(("unfold", src, v1, v2))
            elif self.kw("OPTIONAL"):
                g2 = self.parse_group()
                _close_labels(_sub_labels(g2))
                elements.append(("optional", g2))
            elif self.kw("MINUS"):
                g2 = self.parse_group()
                _close_labels(_sub_labels(g2))
                elements.append(("minus", g2))
            elif self.kw("GRAPH"):
                k, v = self.next()
                term = Var(v[1:]) if k == "var" else self.expand(k, v)
                g2 = self.parse_group()
                _close_labels(_sub_labels(g2))
                elements.append(("graph", term, g2))
            elif self.kw("VALUES"):
                elements.append(self.parse_values())
            elif self.kw("BIND"):
                self.expect("op", "(")
                expr = self.parse_or()
                self.expect("kw", "AS")
                var = self.expect("var")[1:]
                self.expect("op", ")")
                elements.append(("bind", expr, var))
            elif ((self.peek()[0] == "kw"
                   and self.peek()[1].upper() == "EXISTS")
                  or (self.peek()[0] == "kw"
                      and self.peek()[1].upper() == "NOT"
                      and self.i + 1 < len(self.toks)
                      and self.toks[self.i + 1][0] == "kw"
                      and self.toks[self.i + 1][1].upper() == "EXISTS")):
                # ARQ extended syntax: bare [NOT] EXISTS { P } as a
                # group element (ElementExists/ElementNotExists —
                # Negation/neg-01..05); same compile lane as the
                # FILTER form's exists list
                positive = self.peek()[1].upper() == "EXISTS"
                self.next()
                if not positive:
                    self.next()  # EXISTS after NOT
                exists.append((positive, self.parse_group()))
            elif self.kw("LATERAL"):
                # ARQ LATERAL (syntax-arq, Jena 4.7): correlated
                # right-side evaluation — compiled distributed, see the
                # ("lateral", ...) branch in _compile_group
                g2 = self.parse_group()
                elements.append(("lateral", g2))
            elif self.kw("LET"):
                # ARQ extension: LET ( ?v := expr ) — assignment, not
                # BIND: an already-bound target becomes a sameValueAs
                # gate, an eval error leaves the var unbound and the
                # solution alive (QueryIterAssign, mustBeNewVar=false)
                self.expect("op", "(")
                var = self.expect("var")[1:]
                # ':=' lexes as pname ":" + op "="
                k, v = self.next()
                if not (k == "pname" and v == ":"):
                    raise RDFParseError("SPARQL: LET needs ':='")
                self.expect("op", "=")
                expr = self.parse_or()
                self.expect("op", ")")
                elements.append(("letbind", expr, var))
            elif (self.peek()[0] == "kw"
                  and self.peek()[1].upper() == "SELECT"
                  and not elements):
                # bare SubSelect as the whole group body (grammar
                # GroupGraphPattern ::= '{' ( SubSelect | ... ) '}' —
                # a UNION arm like { SELECT (2 AS ?X) {} }); a SELECT
                # after other elements is a syntax error (syn-bad-07)
                elements.append(("subquery", self.parse_select_rest()))
                if self.peek() != ("op", "}"):
                    raise RDFParseError(
                        "SPARQL: SubSelect must be the whole group")
            elif self.peek() == ("op", "{"):
                # lookahead: '{ SELECT' is a subquery, else a UNION group
                if (self.i + 1 < len(self.toks)
                        and self.toks[self.i + 1][0] == "kw"
                        and self.toks[self.i + 1][1].upper() == "SELECT"):
                    self.next()  # {
                    sub = self.parse_select_rest()
                    self.expect("op", "}")
                    if (self.peek()[0] == "kw"
                            and self.peek()[1].upper() == "UNION"):
                        # { SELECT .. } UNION { .. }: each subquery arm
                        # wraps as a one-element group (SELECTscope1)
                        arms = [{"elements": [("subquery", sub)],
                                 "filters": [], "exists": []}]
                        while self.kw("UNION"):
                            arm = self.parse_group()
                            _close_labels(_sub_labels(arm))
                            arms.append(arm)
                        elements.append(("union", arms))
                    else:
                        elements.append(("subquery", sub))
                else:
                    left = self.parse_group()
                    _close_labels(_sub_labels(left))
                    if self.peek() == ("kw", "UNION") or (
                            self.peek()[0] == "kw"
                            and self.peek()[1].upper() == "UNION"):
                        self.next()
                        right = self.parse_group()
                        _close_labels(_sub_labels(right))
                        arms = [left, right]
                        while self.kw("UNION"):
                            nxt = self.parse_group()
                            _close_labels(_sub_labels(nxt))
                            arms.append(nxt)
                        elements.append(("union", arms))
                    else:
                        # bare nested GroupGraphPattern: { P1 } { P2 }
                        # joins like any other group element
                        elements.append(("group", left))
            else:
                pats = self.parse_triples_block()
                labels = {
                    x.name[5:] for pat in pats for x in pat
                    if isinstance(x, Var) and x.name.startswith("__bn_")
                    and not re.fullmatch(r"anon\d+", x.name[5:])
                }
                reused = labels & blabels_closed
                if reused:
                    raise RDFParseError(
                        "SPARQL: blank node label reused across basic "
                        f"graph patterns: _:{sorted(reused)[0]}")
                blabels_open.update(labels)
                for pat in pats:
                    if isinstance(pat[1], _paths.Path):
                        elements.append(("path", pat))
                    elif elements and elements[-1][0] == "bgp":
                        elements[-1][1].append(pat)
                    else:
                        elements.append(("bgp", [pat]))
                # TriplesBlock ::= TriplesSameSubject ('.' TriplesBlock?)?
                # — consecutive triples need the separating DOT
                if self.peek() != ("op", ".") and self._starts_term():
                    raise RDFParseError(
                        "SPARQL: missing '.' between triples")
            # at most ONE optional DOT after a group element ('. .' is
            # a syntax error — syn-bad-08..13)
            if self.peek() == ("op", "."):
                self.next()
                if self.peek() == ("op", "."):
                    raise RDFParseError("SPARQL: doubled '.' in group")
        self.next()  # }
        _close_labels()
        return {"elements": elements, "filters": filters,
                "exists": exists, "_blabels": set(blabels_closed)}

    def parse_values(self):
        """VALUES ?v { t ... }  |  VALUES (?v ?w) { (t t) ... }"""
        if self.peek()[0] == "var":
            vars_ = [self.next()[1][1:]]
            multi = False
        else:
            self.expect("op", "(")
            vars_ = []
            while self.peek()[0] == "var":
                vars_.append(self.next()[1][1:])
            self.expect("op", ")")
            multi = True
        self.expect("op", "{")
        rows: list[list] = []
        metas: list[list] = []
        while self.peek() != ("op", "}"):
            if multi:
                self.expect("op", "(")
                row = []
                while self.peek() != ("op", ")"):
                    row.append(self._values_term())
                self.next()
            else:
                row = [self._values_term()]
            if len(row) != len(vars_):
                raise RDFParseError("SPARQL: VALUES row arity mismatch")
            rows.append([t[0] if t else None for t in row])
            metas.append([t[1:] if t else None for t in row])
        self.next()  # }
        return ("values", vars_, rows, metas)

    def _values_term(self):
        """→ (lex, kind, dt, lang) or None for UNDEF. Joins stay on the
        lexical form (the engine's binding columns); the term type rides
        the hidden meta columns so FILTER/ORDER see the datatype/lang
        ("a"@en is not plain "a" under term comparison)."""
        from ..model import KIND_IRI, KIND_LITERAL, RDF_LANGSTRING, XSD_NS

        k, v = self.next()
        if k in ("iri", "pname"):
            return (self.expand(k, v), KIND_IRI, "", "")
        if k == "kw" and v.upper() == "UNDEF":
            return None
        if k == "kw" and v.upper() in ("TRUE", "FALSE"):
            return (v.lower(), KIND_LITERAL, XSD_NS + "boolean", "")
        if k == "string":
            lex = _unesc(_sq(v))
            nk, nv = self.peek()
            if nk == "op" and nv == "^^":
                self.next()
                dk, dv = self.next()
                if dk not in ("iri", "pname"):
                    raise RDFParseError(
                        f"SPARQL: datatype IRI expected after ^^, got {dv!r}")
                return (lex, KIND_LITERAL, self.expand(dk, dv), "")
            if nk == "langtag":
                self.next()
                return (lex, KIND_LITERAL, RDF_LANGSTRING, nv[1:])
            # plain literal: the engine's untyped tabular convention
            return (lex, KIND_LITERAL, "", "")
        if k == "num":
            # numeric shorthand carries its XSD type (same as
            # parse_term) so EBV/compare see the number, not a string
            dt = (XSD_NS + "double" if "e" in v.lower()
                  else XSD_NS + "decimal" if "." in v
                  else XSD_NS + "integer")
            return (v, KIND_LITERAL, dt, "")
        if k == "tt" and v == "<<(":
            from ..model import KIND_TRIPLE_TERM

            tp = self._parse_tt_pattern(as_template=True)
            lex = tt_ground_lex(tp)
            if lex is None:
                raise RDFParseError(
                    "SPARQL: VALUES triple term must be ground")

            # TripleTermData subjects are IRIs only (grammar: no
            # literal, no nested triple term — the values-tripleterm
            # negative tests)
            def _chk(node):
                if not isinstance(node.s, str):
                    raise RDFParseError(
                        "SPARQL: VALUES triple-term subject must be "
                        "an IRI")
                if isinstance(node.o, TTPat):
                    _chk(node.o)

            _chk(tp)
            return (lex, KIND_TRIPLE_TERM, "", "")
        raise RDFParseError(f"SPARQL: bad VALUES term {v!r}")

    def parse_term(self, position: str):
        k, v = self.next()
        if k == "var":
            return Var(v[1:])
        if k == "kw" and v == "a" and position == "predicate":
            return RDF_TYPE
        if k == "pname" and v.startswith("_:"):
            if ":" in v[2:]:
                raise RDFParseError(
                    f"SPARQL: ':' not allowed in blank node label {v!r}")
            return BNode(v[2:])
        if k == "op" and v == "[" and position in ("subject", "object", "ttsubject"):
            self.expect("op", "]")
            self._anon_n = getattr(self, "_anon_n", 0) + 1
            return BNode(f"anon{self._anon_n}")
        if k in ("iri", "pname"):
            return self.expand(k, v)
        if k == "string" and position in ("object", "subject"):
            from ..model import XSD_STRING

            lex = _unesc(_sq(v))
            nk, nv = self.peek()
            if nk == "op" and nv == "^^":
                self.next()
                dk, dv = self.next()
                if dk not in ("iri", "pname"):
                    raise RDFParseError(
                        f"SPARQL: datatype IRI expected after ^^, got {dv!r}")
                return Lit(lex, dts=(self.expand(dk, dv),), lang="")
            if nk == "langtag":
                from ..model import RDF_LANGSTRING

                self.next()
                return Lit(lex, dts=("", RDF_LANGSTRING), lang=nv[1:])
            # simple literal ≡ xsd:string (RDF 1.1); "" keeps the
            # engine's untyped tabular convention matching
            return Lit(lex, dts=("", XSD_STRING), lang="")
        if k == "num" and position in ("object", "subject"):
            from ..model import XSD_NS

            if "e" in v.lower():
                dt = XSD_NS + "double"
            elif "." in v:
                dt = XSD_NS + "decimal"
            else:
                dt = XSD_NS + "integer"
            return Lit(v, dts=("", dt), lang="")
        if k == "kw" and v.upper() in ("TRUE", "FALSE") \
                and position in ("object", "subject"):
            from ..model import XSD_NS

            return Lit(v.lower(), dts=("", XSD_NS + "boolean"), lang="")
        raise RDFParseError(f"SPARQL: bad {position} term {v!r}")

    def _starts_term(self) -> bool:
        k, v = self.peek()
        if k in ("var", "iri", "num", "string", "langtag"):
            return True
        if k == "pname":
            return True
        if k == "op" and v in ("[", "("):
            return True
        if k == "tt" and v in ("<<", "<<("):
            return True
        return False

    def _skip_lit_suffix(self):
        """Consume an optional @lang / ^^<dt> after a string argument
        (the engine's fn args compare lexically)."""
        nk, nv = self.peek()
        if nk == "langtag":
            self.next()
        elif nk == "op" and nv == "^^":
            self.next()
            self.next()

    def _fresh_bnode(self, as_template: bool):
        self._anon_n = getattr(self, "_anon_n", 0) + 1
        label = f"anon{self._anon_n}"
        return BNode(label) if as_template else Var("__bn_" + label)

    def _bnode_fix(self, term, as_template: bool):
        # a blank node in a WHERE pattern is an existential — a
        # non-projectable variable (SPARQL 19.6 / LabelToNode)
        if isinstance(term, BNode) and not as_template:
            return Var("__bn_" + term.label)
        return term

    # --- RDF 1.2: triple terms, reified triples, annotations ----------

    def _parse_tt_pattern(self, as_template: bool) -> TTPat:
        """After '<<(': TripleTerm → TTPat (components may be vars in
        pattern/template position; ground terms serialize on match)."""

        def component(position: str):
            k, v = self.peek()
            if k == "tt" and v == "<<(":
                if position == "predicate":
                    raise RDFParseError(
                        "SPARQL: triple term not allowed as predicate")
                self.next()
                return self._parse_tt_pattern(as_template)
            if k == "tt":
                raise RDFParseError(
                    "SPARQL: reified triple not allowed inside a triple term")
            return self._bnode_fix(self.parse_term(
                "ttsubject" if position == "subject" else position),
                as_template)

        s = component("subject")
        p = self.parse_term("predicate")
        o = component("object")
        k, v = self.next()
        if (k, v) != ("tt", ")>>"):
            raise RDFParseError(f"SPARQL: expected ')>>', got {v!r}")
        return TTPat(s, p, o)

    def _parse_reified(self, out: list, as_template: bool):
        """After '<<': ReifiedTriple (SPARQL 1.2 grammar) — desugars to
        ``reifier rdf:reifies <<( s p o )>>`` appended to ``out``;
        returns the reifier term (given after '~', else fresh)."""

        def part(position: str):
            k, v = self.peek()
            if k == "tt" and v == "<<":
                self.next()
                return self._parse_reified(out, as_template)
            if k == "tt" and v == "<<(":
                if position == "predicate":
                    raise RDFParseError(
                        "SPARQL: triple term not allowed as predicate")
                self.next()
                return self._parse_tt_pattern(as_template)
            return self._bnode_fix(self.parse_term(
                "ttsubject" if position == "subject" else position),
                as_template)

        s = part("subject")
        p = self.parse_term("predicate")
        o = part("object")
        r = None
        if self.peek() == ("tt", "~"):
            self.next()
            k, v = self.peek()
            if k in ("var", "iri", "pname") or (k == "op" and v == "["):
                r = self._bnode_fix(self.parse_term("subject"), as_template)
        if r is None:
            r = self._fresh_bnode(as_template)
        out.append((r, RDF_REIFIES, TTPat(s, p, o)))
        k, v = self.next()
        if (k, v) != ("tt", ">>"):
            raise RDFParseError(f"SPARQL: expected '>>', got {v!r}")
        return r

    def _parse_annotations(self, s, p, o, out: list, as_template: bool):
        """Annotation ::= ('~' Reifier? | '{| po-list |}')* after an
        object — each reifier R adds ``R rdf:reifies <<( s p o )>>``;
        an annotation block's po-list hangs off the current reifier
        (fresh when none was given)."""
        cur = None
        while True:
            k, v = self.peek()
            if (k, v) not in (("tt", "~"), ("tt", "{|")):
                return
            if not (isinstance(p, str) or isinstance(p, Var)):
                raise RDFParseError(
                    "SPARQL: annotations require a plain predicate, "
                    "not a property path")
            if v == "~":
                self.next()
                k2, v2 = self.peek()
                if k2 in ("var", "iri", "pname") or (
                        k2 == "op" and v2 == "["):
                    cur = self._bnode_fix(
                        self.parse_term("subject"), as_template)
                else:
                    cur = self._fresh_bnode(as_template)
                out.append((cur, RDF_REIFIES, TTPat(s, p, o)))
            else:
                self.next()
                if cur is None:
                    cur = self._fresh_bnode(as_template)
                    out.append((cur, RDF_REIFIES, TTPat(s, p, o)))
                self._po_list(cur, out, as_template)
                self.expect("tt", "|}")
                cur = None

    def parse_triples_block(self, as_template: bool = False) -> list:
        """TriplesSameSubject: subject (term or [ po-list ]) followed by
        a PropertyListNotEmpty with ';' predicate groups and ','
        object lists; '[ ... ]' property lists nest. → list of
        (s, p, o) patterns (SPARQL grammar TriplesBlock)."""
        out: list = []
        k, v = self.peek()
        if k == "tt" and v == "<<":
            self.next()
            s = self._parse_reified(out, as_template)
            k2, v2 = self.peek()
            if (k2 == "op" and v2 in (".", "}")) or k2 is None:
                return out  # bare reified-triple statement
            self._po_list(s, out, as_template)
            return out
        if k == "tt" and v == "<<(":
            # SPARQL 1.2 grammar admits triple-term SUBJECTS (RDF 1.2
            # Full; syntax-triple-terms-positive subject-tripleterm) —
            # matching destructures s_lex gated to s_kind==3 rows
            self.next()
            s = self._parse_tt_pattern(as_template)
            self._po_list(s, out, as_template)
            return out
        if k == "op" and v == "[":
            self.next()
            s = self._fresh_bnode(as_template)
            if self.peek() != ("op", "]"):
                self._po_list(s, out, as_template)
            self.expect("op", "]")
            # a lone '[ po ]' with no outer predicates is complete
            k2, v2 = self.peek()
            if k2 == "op" and v2 in (".", "}"):
                if not out:
                    raise RDFParseError(
                        "SPARQL: '[]' alone is not a triple pattern")
                return out
        elif k == "op" and v == "(":
            # collection as SUBJECT: ( e1 e2 ) :p ?o (grammar
            # TriplesSameSubject ::= TriplesNode PropertyList) — the
            # rdf:first/rest chain's head node takes the po-list, which
            # may be EMPTY (syntax-lists-03/04: `{ ( ?z ) }` alone)
            s = self._object_node(out, as_template)
            k2, v2 = self.peek()
            if ((k2 == "op" and v2 in (".", "}")) or k2 == "eof") and out:
                # the empty PropertyList needs a real Collection —
                # a lone '()' (rdf:nil, no triples) stays an error
                # (syn-bad-lone-list)
                return out
        else:
            s = self._bnode_fix(self.parse_term("subject"), as_template)
        self._po_list(s, out, as_template)
        return out

    def _po_list(self, s, out: list, as_template: bool):
        while True:
            k, v = self.peek()
            if k == "var":
                p = self.parse_term("predicate")
            else:
                p = self.parse_path()
                if isinstance(p, _paths.Link):
                    p = p.p  # plain predicate — stays a BGP pattern
            while True:
                o = self._object_node(out, as_template)
                out.append((s, p, o))
                self._parse_annotations(s, p, o, out, as_template)
                if self.peek() == ("op", ","):
                    self.next()
                    continue
                break
            if self.peek() == ("op", ";"):
                while self.peek() == ("op", ";"):
                    self.next()
                k2, v2 = self.peek()
                # continue only on a valid predicate start — a trailing
                # ';' may be followed by '}'/'.' OR another group
                # element (`:p :q :r ; OPTIONAL {..}`, syntax-struct-11)
                if not (k2 in ("var", "iri", "pname")
                        or (k2 == "kw" and v2 == "a")
                        or (k2 == "op" and v2 in ("(", "^", "!"))):
                    break
                continue
            break

    def _object_node(self, out: list, as_template: bool):
        k, v = self.peek()
        if k == "tt" and v == "<<":
            self.next()
            return self._parse_reified(out, as_template)
        if k == "tt" and v == "<<(":
            self.next()
            return self._parse_tt_pattern(as_template)
        if k == "op" and v == "[":
            self.next()
            b = self._fresh_bnode(as_template)
            if self.peek() != ("op", "]"):
                self._po_list(b, out, as_template)
            self.expect("op", "]")
            return b
        if k == "op" and v == "(":
            # RDF collection ( e1 e2 ... ) → rdf:first/rdf:rest chain,
            # () → rdf:nil (grammar Collection; LangTurtleBase lists)
            self.next()
            if self.peek() == ("op", ")"):
                self.next()
                return RDF_NIL
            elems = []
            while self.peek() != ("op", ")"):
                elems.append(self._object_node(out, as_template))
            self.next()
            nodes = [self._fresh_bnode(as_template) for _ in elems]
            for i, (bn, el) in enumerate(zip(nodes, elems)):
                out.append((bn, RDF_FIRST, el))
                nxt = nodes[i + 1] if i + 1 < len(nodes) else RDF_NIL
                out.append((bn, RDF_REST, nxt))
            return nodes[0]
        return self._bnode_fix(self.parse_term("object"), as_template)

    def parse_pattern(self, as_template: bool = False):
        """Single-triple compatibility wrapper over parse_triples_block
        (callers that handle one pattern at a time)."""
        pats = self.parse_triples_block(as_template=as_template)
        if len(pats) != 1:
            raise RDFParseError(
                "SPARQL: expected a single triple pattern here")
        return pats[0]

    # SPARQL property-path grammar (P_Alt > P_Seq > modifiers > primary),
    # compiled onto ops/paths.py's AST
    def parse_path(self):
        left = self.parse_path_seq()
        while self.peek() == ("op", "|"):
            self.next()
            left = _paths.Alt(left, self.parse_path_seq())
        return left

    def parse_path_seq(self):
        left = self.parse_path_elt()
        while self.peek() == ("op", "/"):
            self.next()
            left = _paths.Seq(left, self.parse_path_elt())
        return left

    def parse_path_elt(self):
        prim = self.parse_path_primary()
        k, v = self.peek()
        if k == "op" and v in ("*", "+", "?"):
            self.next()
            cls = {"*": _paths.Star, "+": _paths.Plus, "?": _paths.Opt}[v]
            return cls(prim)
        if k == "op" and v == "{":
            # P_Mod quantifiers p{n}, p{n,m}, p{n,} (ARQ path extension):
            # expanded structurally — p^n ⟶ Seq chain, the optional tail
            # as nested Opt(Seq(p, Opt(...))), open end as Star
            self.next()
            n = int(self.expect("num"))
            m = n
            open_end = False
            if self.peek() == ("op", ","):
                self.next()
                if self.peek()[0] == "num":
                    m = int(self.next()[1])
                else:
                    open_end = True
            self.expect("op", "}")

            def seq_n(p, k):
                out = None
                for _ in range(k):
                    out = p if out is None else _paths.Seq(out, p)
                return out

            def opt_tail(p, k):
                out = None
                for _ in range(k):
                    out = (_paths.Opt(p) if out is None
                           else _paths.Opt(_paths.Seq(p, out)))
                return out

            if open_end:
                tail = _paths.Star(prim)
            else:
                tail = opt_tail(prim, m - n) if m > n else None
            head = seq_n(prim, n)
            if head is None:
                if tail is not None:
                    return tail
                # p{0}: the zero-length relation ONLY (not Opt — that
                # would spuriously admit one-step pairs)
                return _paths.Zero()
            return head if tail is None else _paths.Seq(head, tail)
        return prim

    def parse_path_primary(self):
        k, v = self.peek()
        if k == "op" and v == "^":
            self.next()
            return _paths.Inv(self.parse_path_primary())
        if k == "op" and v == "(":
            self.next()
            p = self.parse_path()
            self.expect("op", ")")
            return p
        if k == "op" and v == "!":
            self.next()
            nk, nv = self.peek()
            if not (nk == "op" and nv == "("):
                # !elt / !^elt shorthand: a one-member negated set
                if nk == "op" and nv == "^":
                    self.next()
                    kk, vv = self.next()
                    return _paths.NegSet(
                        fwd=(), inv=(self.expand(kk, vv),))
                kk, vv = self.next()
                p = (RDF_TYPE if kk == "kw" and vv == "a"
                     else self.expand(kk, vv))
                return _paths.NegSet(fwd=(p,), inv=())
            self.expect("op", "(")
            fwd, inv = [], []
            while True:
                kk, vv = self.peek()
                if kk == "op" and vv == "^":
                    self.next()
                    kk, vv = self.next()
                    inv.append(self.expand(kk, vv))
                else:
                    kk, vv = self.next()
                    if kk == "kw" and vv == "a":
                        fwd.append(RDF_TYPE)
                    else:
                        fwd.append(self.expand(kk, vv))
                if self.peek() == ("op", "|"):
                    self.next()
                    continue
                break
            self.expect("op", ")")
            return _paths.NegSet(fwd=tuple(fwd), inv=tuple(inv))
        kk, vv = self.next()
        if kk == "kw" and vv == "a":
            return _paths.Link(RDF_TYPE)
        if kk in ("iri", "pname"):
            return _paths.Link(self.expand(kk, vv))
        raise RDFParseError(f"SPARQL: bad path element {vv!r}")

    # --- expressions (precedence: ! > cmp > && > ||) ----------------------

    def parse_or(self):
        left = self.parse_and()
        while self.peek() == ("op", "||"):
            self.next()
            right = self.parse_and()
            left = ("or", left, right)
        return left

    def parse_and(self):
        left = self.parse_not()
        while self.peek() == ("op", "&&"):
            self.next()
            right = self.parse_not()
            left = ("and", left, right)
        return left

    def parse_not(self):
        if self.peek() == ("op", "!"):
            self.next()
            return ("not", self.parse_not())
        return self.parse_cmp()

    def parse_primary(self):
        k, v = self.peek()
        if k == "op" and v == "(":
            self.next()
            e = self.parse_or()
            self.expect("op", ")")
            return e
        if k == "kw" and v.upper() in ("REGEX", "STRSTARTS", "STRENDS", "CONTAINS"):
            fn = v.upper()
            self.next()
            self.expect("op", "(")
            via_str = False
            if self.peek() == ("kw", "STR") or self.peek()[1].upper() == "STR":
                # REGEX(STR(?v), ...) — lexical form of ANY term, so the
                # literal-only type check is waived (E_Str wrapping)
                self.next()
                self.expect("op", "(")
                var = self.expect("var")[1:]
                self.expect("op", ")")
                via_str = True
            else:
                var = self.expect("var")[1:]
            self.expect("op", ",")
            if fn == "REGEX" and self.peek()[0] == "var":
                # REGEX(?v, ?pat[, ?flags]) — VARIABLE pattern/flags
                # (E_Regex compiles per solution; ExprRegex q-regex-3/4)
                patvar = self.expect("var")[1:]
                flagsvar = None
                if self.peek() == ("op", ","):
                    self.next()
                    k2, v2 = self.next()
                    if k2 == "var":
                        flagsvar = v2[1:]
                    elif k2 == "string":
                        flagsvar = ("const", _unesc(_sq(v2)))
                    else:
                        raise RDFParseError(
                            "SPARQL: bad REGEX flags argument")
                self.expect("op", ")")
                return ("regex_dyn", var, patvar, flagsvar, via_str)
            arg = _unesc(_sq(self.expect("string")))
            self._skip_lit_suffix()
            if fn == "REGEX" and self.peek() == ("op", ","):
                # REGEX(?v, pat, flags) — XPath flags folded into the
                # pattern as an inline group (E_Regex / RegexJava)
                self.next()
                flags = _unesc(_sq(self.expect("string")))
                arg = _fold_xpath_flags(arg, flags)
            self.expect("op", ")")
            if fn == "REGEX" and via_str:
                return ("regex_str", var, arg)
            return (fn.lower(), var, arg)
        if k == "kw" and v.upper() in ("STRLEN", "BOUND", "LANG", "DATATYPE",
                                       "ISIRI", "ISURI", "ISLITERAL",
                                       "ISBLANK"):
            fn = v.lower()
            if fn == "isuri":
                fn = "isiri"
            self.next()
            self.expect("op", "(")
            if fn == "datatype":
                # DATATYPE over a var (declared type) or a computed
                # expression (the promoted result type)
                e = self.parse_add()
                self.expect("op", ")")
                if e[0] == "var":
                    return (fn, e[1])
                return ("datatype_expr", e)
            if fn == "strlen":
                # STRLEN over a var or a computed string expression
                # (E_StrLength takes any expression)
                e = self.parse_add()
                self.expect("op", ")")
                if e[0] == "var":
                    return (fn, e[1])
                return ("strlenx", e)
            var = self.expect("var")[1:]
            self.expect("op", ")")
            return (fn, var)
        if k == "tt" and v == "<<(":
            # ExprTripleTerm: <<( subject Verb ExprVarOrTerm )>> — the
            # grammar restricts the subject to Var | iri (no literal,
            # no nested triple term; rdf-tests tripleterm-subject-03/06)
            self.next()
            s = self.parse_primary()
            if s[0] not in ("var", "iriconst"):
                raise RDFParseError(
                    "SPARQL: triple-term subject must be a variable or "
                    f"IRI, got {s[0]}")
            p = self.parse_primary()
            o = self.parse_primary()
            self.expect("tt", ")>>")
            return ("tripleexpr", s, p, o)
        if k == "kw" and v.upper() == "ISTRIPLE":
            self.next()
            self.expect("op", "(")
            var = self.expect("var")[1:]
            self.expect("op", ")")
            return ("istriple", var)
        if k == "kw" and v.upper() in ("LANGDIR", "HASLANG", "HASLANGDIR"):
            fn = v.lower()
            self.next()
            self.expect("op", "(")
            var = self.expect("var")[1:]
            self.expect("op", ")")
            return (fn, var)
        if k == "kw" and v.upper() == "STRLANGDIR":
            self.next()
            self.expect("op", "(")
            a = self.parse_add()
            self.expect("op", ",")
            b = self.parse_add()
            self.expect("op", ",")
            c = self.parse_add()
            self.expect("op", ")")
            if b[0] != "lit" or c[0] != "lit":
                raise RDFParseError(
                    "SPARQL: STRLANGDIR tag/direction must be constant "
                    "strings")
            return ("strlangdir", a, b[1], c[1])
        if k == "kw" and v.upper() in ("SUBJECT", "PREDICATE", "OBJECT"):
            which = {"SUBJECT": "s", "PREDICATE": "p", "OBJECT": "o"}[
                v.upper()]
            self.next()
            self.expect("op", "(")
            e = self.parse_add()
            self.expect("op", ")")
            return ("ttcomp", which, e)
        if k == "kw" and v.upper() == "TRIPLE":
            self.next()
            self.expect("op", "(")
            s = self.parse_add()
            self.expect("op", ",")
            p = self.parse_add()
            self.expect("op", ",")
            o = self.parse_add()
            self.expect("op", ")")
            return ("tripleexpr", s, p, o)
        if k == "kw" and v.upper() == "LANGMATCHES":
            # LANGMATCHES(LANG(?v), "range") — the common idiom; the
            # first arg is required to be LANG(?v) in this subset
            self.next()
            self.expect("op", "(")
            self.expect("kw", "LANG")
            self.expect("op", "(")
            var = self.expect("var")[1:]
            self.expect("op", ")")
            self.expect("op", ",")
            rng = _unesc(_sq(self.expect("string")))
            self.expect("op", ")")
            return ("langmatches", var, rng)
        U = v.upper() if k == "kw" else None
        if U == "EXISTS":
            # EXISTS { P } inside an expression (E_Exists as an operand,
            # e.g. FILTER(?a = ?b || NOT EXISTS {...})) — compiled to a
            # per-row marker column by a semi-join before the filter
            self.next()
            return ("existsexpr", True, self.parse_group())
        if U == "NOT":
            self.next()
            if not self.kw("EXISTS"):
                raise RDFParseError(
                    "SPARQL: NOT at expression start must be NOT EXISTS")
            return ("existsexpr", False, self.parse_group())
        if U in ("COUNT", "SUM", "MIN", "MAX", "AVG", "SAMPLE",
                 "GROUP_CONCAT", "MODE", "MEDIAN") and (
                getattr(self, "_agg_aliases", None) is not None
                or getattr(self, "_agg_collect", None) is not None):
            # an aggregate call INSIDE an expression (SELECT expression
            # or HAVING): reuse the matching projected alias when one
            # exists, else register a hidden aggregate (ExprTransform-
            # style rewrite to an ExprVar over a synthesized AggExpr)
            self.next()
            self.expect("op", "(")
            distinct = self.kw("DISTINCT")
            sep = " "
            if self.peek() == ("op", "*"):
                self.next()
                var = None
                if U != "COUNT":
                    raise RDFParseError("SPARQL: only COUNT(*) allowed")
            else:
                arg = self.parse_add()
                if arg[0] == "var":
                    var = arg[1]
                else:
                    binds = getattr(self, "_agg_expr_binds", None)
                    if binds is None:
                        raise RDFParseError(
                            "SPARQL: aggregate over an expression is "
                            "only allowed in SELECT/HAVING")
                    var = f"__aggexpr_h{len(binds)}"
                    binds.append((arg, var))
            if U == "GROUP_CONCAT" and self.peek() == ("op", ";"):
                self.next()
                self.expect("kw", "SEPARATOR")
                self.expect("op", "=")
                sep = _unesc(_sq(self.expect("string")))
            self.expect("op", ")")
            aliases = getattr(self, "_agg_aliases", None)
            alias = aliases.get((U, var, distinct)) if aliases else None
            if alias is None:
                collect = getattr(self, "_agg_collect", None)
                if collect is None:
                    raise RDFParseError(
                        "SPARQL: HAVING aggregate must match a projected "
                        "(agg AS ?alias)")
                alias = f"__hagg_{len(collect)}"
                collect.append(("agg", U, var, alias, distinct, sep))
            return ("var", alias)
        if U in ("STR", "UCASE", "LCASE", "ABS", "ROUND", "CEIL", "FLOOR"):
            self.next()
            self.expect("op", "(")
            e = self.parse_add()
            self.expect("op", ")")
            return ("fn1", U, e)
        if U in ("MD5", "SHA1", "SHA256", "SHA384", "SHA512"):
            self.next()
            self.expect("op", "(")
            e = self.parse_add()
            self.expect("op", ")")
            return ("hashfn", U.lower(), e)
        if U in ("YEAR", "MONTH", "DAY", "HOURS", "MINUTES", "SECONDS",
                 "TIMEZONE", "TZ"):
            self.next()
            self.expect("op", "(")
            e = self.parse_add()
            self.expect("op", ")")
            return ("dtfn", U.lower(), e)
        if U == "NOW":
            from ..model import XSD_NS

            self.next()
            self.expect("op", "(")
            self.expect("op", ")")
            # one instant for the whole query (E_Now)
            if not hasattr(self, "_now"):
                from datetime import datetime, timezone as _tz

                self._now = datetime.now(_tz.utc).isoformat(
                    timespec="seconds").replace("+00:00", "Z")
            return ("typedlit", self._now, XSD_NS + "dateTime", "")
        if U == "RAND":
            self.next()
            self.expect("op", "(")
            self.expect("op", ")")
            return ("rand",)
        if U in ("UUID", "STRUUID"):
            self.next()
            self.expect("op", "(")
            self.expect("op", ")")
            return ("uuid", U == "STRUUID")
        if U == "BNODE":
            self.next()
            self.expect("op", "(")
            e = None
            if self.peek() != ("op", ")"):
                e = self.parse_add()
            self.expect("op", ")")
            return ("bnodefn", e)
        if U in ("IRI", "URI"):
            self.next()
            self.expect("op", "(")
            e = self.parse_add()
            self.expect("op", ")")
            return ("irifn", e, self.base)
        if U == "ENCODE_FOR_URI":
            self.next()
            self.expect("op", "(")
            e = self.parse_add()
            self.expect("op", ")")
            return ("encuri", e)
        if U == "SAMETERM":
            self.next()
            self.expect("op", "(")
            a = self.parse_add()
            self.expect("op", ",")
            b = self.parse_add()
            self.expect("op", ")")
            return ("sameterm", a, b)
        if U == "ISNUMERIC":
            self.next()
            self.expect("op", "(")
            e = self.parse_add()
            self.expect("op", ")")
            return ("isnumeric", e)
        if U in ("STRDT", "STRLANG"):
            self.next()
            self.expect("op", "(")
            a = self.parse_add()
            self.expect("op", ",")
            b = self.parse_add()
            self.expect("op", ")")
            if U == "STRDT":
                if b[0] != "iriconst":
                    raise RDFParseError(
                        "SPARQL: STRDT datatype must be a constant IRI")
                return ("strdt", a, b[1])
            if b[0] != "lit":
                raise RDFParseError(
                    "SPARQL: STRLANG tag must be a constant string")
            return ("strlang", a, b[1])
        if U in ("CONCAT", "COALESCE"):
            # zero args allowed (ExpressionList ::= NIL | ...):
            # CONCAT() = "", COALESCE() = error
            self.next()
            self.expect("op", "(")
            args = []
            if self.peek() != ("op", ")"):
                args.append(self.parse_add())
                while self.peek() == ("op", ","):
                    self.next()
                    args.append(self.parse_add())
            self.expect("op", ")")
            return ("concat" if U == "CONCAT" else "coalesce", args)
        if U == "SUBSTR":
            # SUBSTR(expr, start [, length]) — 1-based codepoints
            # (E_StrSubstring / xpath fn:substring); start/length constant
            self.next()
            self.expect("op", "(")
            e = self.parse_add()
            self.expect("op", ",")
            start = self.parse_add()
            length = None
            if self.peek() == ("op", ","):
                self.next()
                length = self.parse_add()
            self.expect("op", ")")
            if start[0] != "num" or (length is not None and length[0] != "num"):
                raise RDFParseError(
                    "SPARQL: SUBSTR start/length must be numeric constants"
                )
            return ("substr", e, int(start[1]),
                    None if length is None else int(length[1]))
        if U == "REPLACE":
            # REPLACE(expr, "pattern", "replacement") — regex with $N
            # backrefs (E_StrReplace)
            self.next()
            self.expect("op", "(")
            e = self.parse_add()
            self.expect("op", ",")
            pat = _unesc(_sq(self.expect("string")))
            self.expect("op", ",")
            rep = _unesc(_sq(self.expect("string")))
            self.expect("op", ")")
            return ("replace", e, pat, rep)
        if U in ("STRBEFORE", "STRAFTER"):
            self.next()
            self.expect("op", "(")
            e = self.parse_add()
            self.expect("op", ",")
            s = _unesc(_sq(self.expect("string")))
            lang2 = ""
            nk, nv = self.peek()
            if nk == "langtag":
                self.next()
                lang2 = nv[1:]
            elif nk == "op" and nv == "^^":
                self.next()
                self.next()
            self.expect("op", ")")
            return (U.lower(), e, s, lang2)
        if U == "IF":
            # IF(cond, then, else) — E_Conditional
            self.next()
            self.expect("op", "(")
            cond = self.parse_or()
            self.expect("op", ",")
            a = self.parse_add()
            self.expect("op", ",")
            b = self.parse_add()
            self.expect("op", ")")
            return ("ifexpr", cond, a, b)
        if k == "var":
            self.next()
            return ("var", v[1:])
        if k == "string":
            self.next()
            lex = _unesc(_sq(v))
            nk, nv = self.peek()
            if nk == "op" and nv == "^^":
                self.next()
                dk, dv = self.next()
                if dk not in ("iri", "pname"):
                    raise RDFParseError(
                        f"SPARQL: datatype IRI expected after ^^, got {dv!r}")
                dt = self.expand(dk, dv)
                from ..rdf.cdt import CDT_LIST, CDT_MAP, scope_cdt_bnodes

                if dt in (CDT_LIST, CDT_MAP) and "_:" in lex:
                    # bnode labels inside a query's CDT literal are
                    # QUERY-scoped — distinct from any data document's
                    # (bnodes-turtle-sparql-01..04); "q0_" cannot
                    # collide with a document scope (those end "_ttl_")
                    lex = scope_cdt_bnodes(lex, dt, "q0_")
                return ("typedlit", lex, dt, "")
            if nk == "langtag":
                self.next()
                return ("typedlit", lex, "", nv[1:])
            return ("lit", lex)
        if k == "kw" and v.upper() in ("TRUE", "FALSE"):
            from ..model import XSD_NS

            self.next()
            return ("typedlit", v.lower(), XSD_NS + "boolean", "")
        if k == "num":
            from ..model import XSD_NS

            self.next()
            # numeric literal shorthand carries its XSD type (grammar:
            # INTEGER / DECIMAL / DOUBLE)
            dt = (XSD_NS + "double" if "e" in v.lower()
                  else XSD_NS + "decimal" if "." in v
                  else XSD_NS + "integer")
            return ("num", float(v), dt)
        if k in ("iri", "pname"):  # e.g. DATATYPE(?v) = xsd:decimal
            self.next()
            iri = self.expand(k, v)
            if self.peek() == ("op", "("):
                # IRI function call: XSD casts (XSDFuncOp cast) or the
                # CDT function library (function/library/cdt/*.java)
                self.next()
                args = []
                if self.peek() != ("op", ")"):
                    args.append(self.parse_or())
                    while self.peek() == ("op", ","):
                        self.next()
                        args.append(self.parse_or())
                self.expect("op", ")")
                if iri in _CAST_TARGETS and len(args) == 1:
                    return ("cast", iri, args[0])
                from ..rdf.cdt import CDT_NS

                if iri.startswith(CDT_NS):
                    fn = iri[len(CDT_NS):]
                    if fn not in _CDT_FNS:
                        raise RDFParseError(
                            f"SPARQL: unsupported cdt function <{iri}>")
                    return ("cdtfn", fn, args)
                return _iri_function_node(iri, args)
            return ("iriconst", iri)
        raise RDFParseError(f"SPARQL: bad expression at {v!r}")

    def parse_cmp(self):
        left = self.parse_add()
        k, v = self.peek()
        if k == "op" and v in ("=", "!=", "<", "<=", ">", ">="):
            self.next()
            right = self.parse_add()
            return ("cmp", v, left, right)
        if k == "kw" and v.upper() == "IN":
            self.next()
            return self._in_node(left, self.parse_in_list(), True)
        if k == "kw" and v.upper() == "NOT":
            self.next()
            if not self.kw("IN"):
                raise RDFParseError(
                    "SPARQL: NOT in an expression must be followed by IN"
                )
            return self._in_node(left, self.parse_in_list(), False)
        return left

    @staticmethod
    def _in_node(left, members, positive: bool):
        """IN over a constant list stays the vectorized set-membership
        node; general expression members desugar per §17.4.1.9:
        e IN (x1..xn) ≡ (e = x1 || ...), NOT IN ≡ its 3-valued negation
        (errors in non-matching members follow ||/&& Kleene logic)."""
        consts: list = []
        for e in members:
            c = ("lit", e[1]) if e[0] == "iriconst" else e
            if c[0] not in ("lit", "num"):
                consts = None
                break
            consts.append(c)
        if consts is not None:
            return ("inlist", left, consts, positive)
        node = None
        for e in members:
            eq = ("cmp", "=", left, e)
            node = eq if node is None else ("or", node, eq)
        if node is None:  # e IN () = false, e NOT IN () = true
            node = ("inlist", left, [], positive)
            return node
        return node if positive else ("not", node)

    def parse_in_list(self):
        """'(' expr, expr, ... ')' — members are arbitrary expressions."""
        self.expect("op", "(")
        vals: list = []
        if self.peek() != ("op", ")"):
            while True:
                vals.append(self.parse_add())
                if self.peek() == ("op", ","):
                    self.next()
                    continue
                break
        self.expect("op", ")")
        return vals

    # arithmetic: cmp > add (+ -) > mul (* /) > unary (-) > primary
    def parse_add(self):
        left = self.parse_mul()
        while True:
            k, v = self.peek()
            if k == "op" and v in ("+", "-"):
                self.next()
                left = ("arith", v, left, self.parse_mul())
            elif k == "num" and (v.startswith("-") or v.startswith("+")):
                # the tokenizer folds the sign into the number ("?n -1",
                # "?o +1"); re-read it as an addition of the signed value
                self.next()
                left = ("arith", "+", left, (
                    "num", float(v),
                    "http://www.w3.org/2001/XMLSchema#double"
                    if "e" in v.lower() else
                    "http://www.w3.org/2001/XMLSchema#decimal"
                    if "." in v else
                    "http://www.w3.org/2001/XMLSchema#integer"))
            else:
                return left

    def parse_mul(self):
        left = self.parse_unary()
        while True:
            k, v = self.peek()
            if k == "op" and v in ("*", "/"):
                self.next()
                left = ("arith", v, left, self.parse_unary())
            else:
                return left

    def parse_unary(self):
        k, v = self.peek()
        if k == "op" and v == "-":
            self.next()
            return ("arith", "-", ("num", 0.0, _XSD + "integer"), self.parse_unary())
        if k == "op" and v == "+":
            self.next()
            return self.parse_unary()
        return self.parse_primary()


_CMP = {
    "=": pc.equal, "!=": pc.not_equal, "<": pc.less, "<=": pc.less_equal,
    ">": pc.greater, ">=": pc.greater_equal,
}

# numeric value-space datatypes (NodeValue.java numeric promotion set)
_NUMERIC_DTS = frozenset(_XSD_INTS) | {
    _p + s for _p in ("http://www.w3.org/2001/XMLSchema#",)
    for s in ("decimal", "double", "float")
}
_NUM_RE = r"^[+-]?((\d+(\.\d*)?)|(\.\d+))([eE][+-]?\d+)?$"

_NUMERIC_FN1 = frozenset({"ABS", "ROUND", "CEIL", "FLOOR"})

def _fold_xpath_flags(pat: str, flags: str) -> str:
    """Fold XPath regex flags (F&O §5.6.2) into the pattern itself as an
    inline group, the way E_Regex / RegexJava normalizes them: 'q' makes
    the whole pattern literal, 'x' strips whitespace outside character
    classes (RE2 has no verbose mode), i/m/s become (?ims)."""
    if "q" in flags:
        # XPath 'q': every pattern character is literal
        pat = re.escape(pat)
    if "x" in flags and "q" not in flags:
        out_chars = []
        in_class = esc = False
        for ch in pat:
            if esc:
                out_chars.append(ch)
                esc = False
                continue
            if ch == "\\":
                out_chars.append(ch)
                esc = True
                continue
            if ch == "[" and not in_class:
                in_class = True
            elif ch == "]" and in_class:
                in_class = False
            if ch in " \t\n\r" and not in_class:
                continue
            out_chars.append(ch)
        pat = "".join(out_chars)
    inline = "".join(c for c in flags if c in "ims")
    if inline:
        pat = f"(?{inline}){pat}"
    return pat


# --- extension function IRIs (ARQ afn: library + xpath fn:) ----------------
_AFN_NS = "http://jena.apache.org/ARQ/function#"
_FN_XPATH = "http://www.w3.org/2005/xpath-functions#"
_MATH_XPATH = "http://www.w3.org/2005/xpath-functions/math#"
_LEV_NS = "http://www.dotnetrdf.org/leviathan#"


def _iri_function_node(iri: str, args: list):
    """IRI function call → expression node. The afn: library desugars
    onto existing nodes (function/library/{strlen,substring,sha1sum,
    localname,namespace,langeq,strjoin,evenInteger,min,max,sqrt,pi,e}
    .java); an IRI in a namespace the engine knows nothing about is a
    RUNTIME expression error per solution in jena (FunctionRegistry
    miss → ExprEvalException), so a FILTER drops every row instead of
    failing the query — ARQ Function/func-01/02 golden results."""
    import math as _math

    if iri.startswith(_AFN_NS):
        name = iri[len(_AFN_NS):]

        def need(lo, hi=None):
            hi = lo if hi is None else hi
            if not (lo <= len(args) <= hi):
                raise RDFParseError(
                    f"SPARQL: <{iri}> takes {lo}..{hi} arguments")

        if name == "strlen":
            need(1)
            return ("strlenx", args[0])
        if name in ("substr", "substring"):
            # XSDFuncOp.javaSubstring: JAVA-style 0-based begin/end
            # indexes (not the 1-based start/length of SPARQL SUBSTR)
            need(2, 3)
            return ("jsubstr", args[0], args[1],
                    args[2] if len(args) == 3 else None)
        if name == "sha1sum":
            need(1)  # sha1sum.java: SHA1(str(x))
            return ("hashfn", "sha1", ("fn1", "STR", args[0]))
        if name == "localname":
            need(1)
            return ("irisplit", "local", args[0])
        if name == "namespace":
            need(1)
            return ("irisplit", "ns", args[0])
        if name == "langeq":
            # langeq.java: langMatches(lang(v1), v2)
            need(2)
            v, r = args
            if v[0] == "var" and r[0] == "lit":
                return ("langmatches", v[1], r[1])
            raise RDFParseError(
                "SPARQL: afn:langeq subset takes (?var, \"range\")")
        if name == "strjoin":
            need(1, 64)
            sep, parts = args[0], []
            for i, a in enumerate(args[1:]):
                if i:
                    parts.append(sep)
                parts.append(a)
            return ("concat", parts)
        if name == "evenInteger":
            need(1)
            return ("evenint", args[0])
        if name in ("min", "max"):
            need(2)
            return ("minmax2", name, args[0], args[1])
        if name == "sqrt":
            need(1)
            return ("sqrt1", args[0])
        if name == "pi":
            need(0)
            return ("num", _math.pi, _XSD + "double")
        if name == "e":
            need(0)
            return ("num", _math.e, _XSD + "double")
        raise RDFParseError(f"SPARQL: unsupported function <{iri}>")
    if iri.startswith(_FN_XPATH):
        return _fn_xpath_node(iri, iri[len(_FN_XPATH):], args)
    if iri.startswith(_MATH_XPATH):
        return _math_xpath_node(iri, iri[len(_MATH_XPATH):], args)
    if iri.startswith(_LEV_NS):
        return _leviathan_node(iri, iri[len(_LEV_NS):], args)
    return ("errfn", iri, args)


def _need_args(iri: str, args: list, lo: int, hi: int | None = None):
    hi = lo if hi is None else hi
    if not (lo <= len(args) <= hi):
        raise RDFParseError(f"SPARQL: <{iri}> takes {lo}..{hi} arguments")


def _const_str(node):
    """Constant-string view of a parsed argument node, or None."""
    if node and node[0] == "lit":
        return node[1]
    if node and node[0] == "typedlit" and node[2] in ("", _XSD + "string"):
        return node[1]
    return None


# XPath F&O string functions with a direct SPARQL-builtin equivalent
_FN_TO_FN1 = {"upper-case": "UCASE", "lower-case": "LCASE", "abs": "ABS",
              "ceiling": "CEIL", "floor": "FLOOR", "round": "ROUND"}
# fn: date/time component accessors → the engine's dtfn kernel
_FN_DT_ACCESSOR = {
    "year-from-dateTime": "year", "year-from-date": "year",
    "years-from-dateTime": "year", "years-from-date": "year",
    "month-from-dateTime": "month", "month-from-date": "month",
    "months-from-dateTime": "month", "months-from-date": "month",
    "day-from-dateTime": "day", "day-from-date": "day",
    "days-from-dateTime": "day", "days-from-date": "day",
    "hours-from-dateTime": "hours", "hours-from-time": "hours",
    "minutes-from-dateTime": "minutes", "minutes-from-time": "minutes",
    "seconds-from-dateTime": "seconds", "seconds-from-time": "seconds",
    "timezone-from-dateTime": "timezone", "timezone-from-date": "timezone",
    "timezone-from-time": "timezone",
}
_FN_DUR_ACCESSOR = {
    "years-from-duration": "years", "months-from-duration": "months",
    "days-from-duration": "days", "hours-from-duration": "hours",
    "minutes-from-duration": "minutes", "seconds-from-duration": "seconds",
}


def _fn_xpath_node(iri: str, name: str, args: list):
    """XPath F&O function (fn: namespace) → expression node, the surface
    StandardFunctions.java:61 (loadStdDefs) registers. Most desugar onto
    the engine's existing vectorized SPARQL-builtin nodes (the SPARQL
    builtins are DEFINED as these functions, §17.4); the rest get small
    dedicated kernels (normspace/normuni/durfn/dtcombine/adjtz)."""
    if name == "concat":
        return ("concat", args)
    if name == "error":  # FN_Error: evaluating it is an expression error
        return ("errfn", iri, args)
    if name == "string-length":
        _need_args(iri, args, 1)
        return ("strlenx", args[0])
    if name in _FN_TO_FN1:
        _need_args(iri, args, 1)
        return ("fn1", _FN_TO_FN1[name], args[0])
    if name == "round-half-to-even":
        _need_args(iri, args, 1, 2)
        prec = 0
        if len(args) == 2:
            if args[1][0] != "num":
                raise RDFParseError(
                    f"SPARQL: <{iri}> precision must be a numeric constant")
            prec = int(args[1][1])
        return ("mathfn", "rhte", [args[0], ("num", float(prec),
                                             _XSD + "integer")])
    if name == "encode-for-uri":
        _need_args(iri, args, 1)
        return ("encuri", args[0])
    if name == "boolean":
        # fn:boolean = the effective boolean value; double Kleene
        # negation computes EBV and preserves error-as-null
        _need_args(iri, args, 1)
        return ("not", ("not", args[0]))
    if name == "not":
        _need_args(iri, args, 1)
        return ("not", args[0])
    if name == "substring":
        _need_args(iri, args, 2, 3)
        if args[1][0] != "num" or (len(args) == 3 and args[2][0] != "num"):
            raise RDFParseError(
                f"SPARQL: <{iri}> start/length must be numeric constants")
        # XPath rounds fractional positions (fn:substring = SPARQL SUBSTR)
        start = int(round(args[1][1]))
        length = int(round(args[2][1])) if len(args) == 3 else None
        return ("substr", args[0], start, length)
    if name == "normalize-space":
        _need_args(iri, args, 1)
        return ("normspace", args[0])
    if name == "normalize-unicode":
        _need_args(iri, args, 1, 2)
        form = "NFC"
        if len(args) == 2:
            s = _const_str(args[1])
            if s is None:
                raise RDFParseError(
                    f"SPARQL: <{iri}> form must be a string constant")
            form = s.strip().upper() or "NFC"
            if form not in ("NFC", "NFD", "NFKC", "NFKD"):
                raise RDFParseError(
                    f"SPARQL: <{iri}> unsupported normalization form {form}")
        return ("normuni", args[0], form)
    if name in ("contains", "starts-with", "ends-with"):
        _need_args(iri, args, 2)
        s = _const_str(args[1])
        if args[0][0] != "var" or s is None:
            raise RDFParseError(
                f"SPARQL: <{iri}> subset takes (?var, \"constant\")")
        tag = {"contains": "contains", "starts-with": "strstarts",
               "ends-with": "strends"}[name]
        return (tag, args[0][1], s)
    if name in ("substring-before", "substring-after"):
        _need_args(iri, args, 2)
        s = _const_str(args[1])
        if s is None:
            raise RDFParseError(
                f"SPARQL: <{iri}> separator must be a string constant")
        return ("strbefore" if name == "substring-before" else "strafter",
                args[0], s, "")
    if name == "matches":
        _need_args(iri, args, 2, 3)
        pat = _const_str(args[1])
        flags = _const_str(args[2]) if len(args) == 3 else ""
        if pat is None or flags is None:
            raise RDFParseError(
                f"SPARQL: <{iri}> pattern/flags must be string constants")
        pat = _fold_xpath_flags(pat, flags or "")
        if args[0][0] == "var":
            return ("regex", args[0][1], pat)
        if (args[0][0] == "fn1" and args[0][1] == "STR"
                and args[0][2][0] == "var"):
            return ("regex_str", args[0][2][1], pat)
        raise RDFParseError(f"SPARQL: <{iri}> subset takes a variable "
                            "(or STR(?var)) first argument")
    if name == "replace":
        _need_args(iri, args, 3, 4)
        pat, rep = _const_str(args[1]), _const_str(args[2])
        flags = _const_str(args[3]) if len(args) == 4 else ""
        if pat is None or rep is None or flags is None:
            raise RDFParseError(
                f"SPARQL: <{iri}> pattern/replacement/flags must be "
                "string constants")
        return ("replace", args[0], _fold_xpath_flags(pat, flags or ""), rep)
    if name in _FN_DT_ACCESSOR:
        _need_args(iri, args, 1)
        return ("dtfn", _FN_DT_ACCESSOR[name], args[0])
    if name in _FN_DUR_ACCESSOR:
        _need_args(iri, args, 1)
        return ("durfn", _FN_DUR_ACCESSOR[name], args[0])
    if name == "dateTime":  # FN_DateTime: fn:dateTime(date, time)
        _need_args(iri, args, 2)
        return ("dtcombine", args[0], args[1])
    if name == "implicit-timezone":
        # FN_Timezone: this engine's implicit timezone is UTC
        _need_args(iri, args, 0)
        return ("typedlit", "PT0S", _XSD + "dayTimeDuration", "")
    if name in ("adjust-dateTime-to-timezone", "adjust-date-to-timezone",
                "adjust-time-to-timezone"):
        _need_args(iri, args, 1, 2)
        tz = None
        if len(args) == 2:
            a = args[1]
            if a[0] == "typedlit" and a[2] == _XSD + "dayTimeDuration":
                tz = a[1]
            else:
                raise RDFParseError(
                    f"SPARQL: <{iri}> timezone must be a constant "
                    "xsd:dayTimeDuration")
        kind = name.split("-")[1]  # dateTime | date | time
        return ("adjtz", kind, args[0], tz)
    if name == "numeric-mod":
        _need_args(iri, args, 2)
        return ("mathfn", "mod", args)
    if name == "numeric-integer-divide":
        _need_args(iri, args, 2)
        return ("mathfn", "idiv", args)
    if name == "apply":
        # FN_Apply (F&O 3.1): fn:apply(functionIRI, args...) — the
        # function id resolves through the registry; a constant IRI
        # desugars to the call itself at build time. Blank/literal ids
        # are runtime eval errors (FN_Apply.java:66-71); a variable id
        # (per-row dispatch) is out of subset here.
        if not args:
            raise RDFParseError("SPARQL: fn:apply needs a function id")
        head = args[0]
        if head[0] == "iriconst":
            return _iri_function_node(head[1], args[1:])
        if head[0] == "var":
            raise RDFParseError(
                "SPARQL: fn:apply with a variable function id is out "
                "of subset (constant IRI only)")
        return ("errfn", iri, args)  # literal/bnode id: eval error
    if name == "format-number":
        # FN_FormatNumber: 2 or 3 args; the 3rd is a BCP-47 tag naming
        # the DecimalFormatSymbols locale (XSDFuncOp.formatNumber,
        # XSDFuncOp.java:1757). Non-string picture/locale constants are
        # RUNTIME eval errors in jena, not build errors.
        _need_args(iri, args, 2, 3)
        pat = _const_str(args[1])
        loc = _const_str(args[2]) if len(args) == 3 else ""
        if pat is None or loc is None:
            if args[1][0] in ("var",) or (len(args) == 3
                                          and args[2][0] in ("var",)):
                raise RDFParseError(
                    f"SPARQL: <{iri}> picture/locale must be string "
                    "constants")
            return ("errfn", iri, args)  # e.g. an IRI picture: eval error
        return ("fmtnum", args[0], pat, loc)
    # a REAL xpath function the engine hasn't implemented (fn:apply,
    # fn:collation-key, ...): reject (honest out-of-subset skip) rather
    # than mis-evaluate to empty
    raise RDFParseError(f"SPARQL: unsupported function <{iri}>")


_MATH1 = frozenset({"exp", "exp10", "log", "log10", "sqrt", "sin", "cos",
                    "tan", "asin", "acos", "atan"})


def _math_xpath_node(iri: str, name: str, args: list):
    """XPath math: namespace (F&O §4.8) — StandardFunctions.java:264
    registers pi/exp/exp10/log/log10/pow/sqrt/sin/cos/tan/asin/acos/
    atan/atan2. All return xsd:double; domain errors are IEEE NaN/Inf."""
    import math as _m

    if name == "pi":
        _need_args(iri, args, 0)
        return ("num", _m.pi, _XSD + "double")
    if name in _MATH1:
        _need_args(iri, args, 1)
        return ("mathfn", name, args)
    if name in ("pow", "atan2"):
        _need_args(iri, args, 2)
        return ("mathfn", name, args)
    raise RDFParseError(f"SPARQL: unsupported function <{iri}>")


def _leviathan_node(iri: str, name: str, args: list):
    """Leviathan function library (lfn:, function/library/leviathan/*.java;
    MappedLoader.java:52 maps the dotnetrdf namespace to those classes —
    local name == class name). Everything desugars onto the engine's
    mathfn/hashfn kernels; semantics follow each class's exec()."""
    D = _XSD + "double"
    if name in ("md5hash", "sha256hash"):
        _need_args(iri, args, 1)
        return ("hashfn", "md5" if name == "md5hash" else "sha256",
                ("fn1", "STR", args[0]))
    if name == "sqrt":
        _need_args(iri, args, 1)
        return ("sqrt1", args[0])
    if name == "sq":
        _need_args(iri, args, 1)
        return ("mathfn", "pow", [args[0], ("num", 2.0, D)])
    if name == "cube":
        _need_args(iri, args, 1)
        return ("mathfn", "pow", [args[0], ("num", 3.0, D)])
    if name == "ten":  # ten.java: 10^x
        _need_args(iri, args, 1)
        return ("mathfn", "exp10", args)
    if name == "e":  # e.java: e^x (NOT the constant)
        _need_args(iri, args, 1)
        return ("mathfn", "exp", args)
    if name == "ln":
        _need_args(iri, args, 1)
        return ("mathfn", "log", args)
    if name == "log":  # log.java: 1 arg = log10, 2 args = arbitrary base
        _need_args(iri, args, 1, 2)
        if len(args) == 1:
            return ("mathfn", "log10", args)
        return ("mathfn", "logb", args)
    if name == "pow":
        _need_args(iri, args, 2)
        return ("mathfn", "pow", args)
    if name == "root":  # root.java: v ** (1/root)
        _need_args(iri, args, 2)
        return ("mathfn", "root", args)
    if name in ("factorial", "reciprocal"):
        _need_args(iri, args, 1)
        return ("mathfn", name, args)
    if name in ("sin", "cos", "tan"):
        _need_args(iri, args, 1)
        return ("mathfn", name, args)
    if name in ("sin1", "cos1", "tan1"):  # inverse trig
        _need_args(iri, args, 1)
        return ("mathfn", "a" + name[:-1], args)
    if name in ("sec", "cosec", "cot", "sec1", "cosec1", "cot1"):
        _need_args(iri, args, 1)
        return ("mathfn", name, args)
    if name == "degreesToRadians":
        _need_args(iri, args, 1)
        return ("mathfn", "deg2rad", args)
    if name == "radiansToDegrees":
        _need_args(iri, args, 1)
        return ("mathfn", "rad2deg", args)
    if name == "pythagoras":
        _need_args(iri, args, 2)
        return ("mathfn", "pythagoras", args)
    if name == "cartesian":  # cartesian.java: 2D (4 args) / 3D (6 args)
        if len(args) not in (4, 6):
            raise RDFParseError(f"SPARQL: <{iri}> takes 4 or 6 arguments")
        return ("mathfn", "cartesian", args)
    if name == "rnd":
        # rnd.java: () → [0,1), (max) → [0,max), (min,max) → [min,max)
        _need_args(iri, args, 0, 2)
        return ("mathfn", "rnd", args)
    raise RDFParseError(f"SPARQL: unsupported function <{iri}>")

_XSD = "http://www.w3.org/2001/XMLSchema#"
_CAST_NUMERIC = frozenset(
    _XSD + s for s in ("integer", "decimal", "float", "double", "int",
                       "long", "short", "byte", "nonNegativeInteger",
                       "unsignedInt", "unsignedLong"))
_CAST_TARGETS = _CAST_NUMERIC | frozenset(
    _XSD + s for s in ("string", "boolean", "dateTime", "date"))

_PROMO_RANK = {}
for _s in ("integer", "int", "long", "short", "byte",
           "nonNegativeInteger", "nonPositiveInteger", "positiveInteger",
           "negativeInteger", "unsignedLong", "unsignedInt",
           "unsignedShort", "unsignedByte"):
    _PROMO_RANK[_XSD + _s] = 0
_PROMO_RANK[_XSD + "decimal"] = 1
_PROMO_RANK[_XSD + "float"] = 2
_PROMO_RANK[_XSD + "double"] = 3
_PROMO_BY_RANK = (_XSD + "integer", _XSD + "decimal", _XSD + "float",
                  _XSD + "double")


def _is_numeric_node(node) -> bool:
    """Nodes whose value is already in the numeric value space — they put
    a comparison into the engine's numeric context."""
    tag = node[0] if node else None
    return (tag in ("num", "strlen", "strlenx", "arith", "rand",
                    "minmax2", "sqrt1", "mathfn", "durfn")
            or (tag == "typedlit" and node[2] in _NUMERIC_DTS)
            or (tag == "cast" and node[1] in _CAST_NUMERIC)
            or (tag == "dtfn" and node[1] not in ("tz", "timezone"))
            or (tag == "fn1" and node[1] in _NUMERIC_FN1))


def _to_lexical(val, n_rows: int):
    """Any value-expression result → large_string array/scalar with the
    canonical numeric lexical form (integral floats print bare, matching
    the BIND output convention)."""
    if isinstance(val, pa.Scalar):
        if pa.types.is_large_string(val.type):
            return val
        if pa.types.is_string(val.type):
            return pa.scalar(val.as_py(), pa.large_string())
        x = val.as_py()
        if x is None:
            return pa.scalar(None, pa.large_string())
        if isinstance(x, float) and x == int(x):
            x = int(x)
        return pa.scalar(str(x), pa.large_string())
    arr = val.combine_chunks() if isinstance(val, pa.ChunkedArray) else val
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        return arr.cast(pa.large_string())
    as_int = pc.cast(arr, pa.int64(), safe=False)
    integral = pc.all(
        pc.equal(pc.cast(as_int, pa.float64()), pc.cast(arr, pa.float64()))
    ).as_py()
    return pc.cast(as_int if integral else arr, pa.large_string())


def _str_arg(node, t: pa.Table, arr, simple_only: bool = False):
    """String-argument gate (SPARQL 17.4.3 / XSDFuncOp.checkAndGetString):
    a string function applied to a non-string literal (numeric, unknown
    datatype) or a non-literal term is a per-row type error → null.
    Simple literals, xsd:string, lang-tagged literals, and the engine's
    untyped tabular convention (dt = "") pass through."""
    if not node or node[0] != "var":
        return arr
    from ..model import KIND_LITERAL, RDF_LANGSTRING, XSD_STRING

    names = t.schema.names
    dc, kc = node[1] + "__dt", node[1] + "__kind"
    if dc not in names:
        return arr
    if isinstance(arr, pa.Scalar):
        arr = pa.array([arr.as_py()] * t.num_rows, pa.large_string())
    dt = pc.fill_null(t[dc].combine_chunks().cast(pa.large_string()), "")
    allowed = (["", XSD_STRING] if simple_only
               else ["", XSD_STRING, RDF_LANGSTRING])
    ok = pc.is_in(dt, value_set=pa.array(allowed, pa.large_string()))
    if simple_only:
        lc = node[1] + "__lang"
        if lc in names:
            ok = pc.and_(ok, pc.fill_null(pc.equal(
                t[lc].combine_chunks().cast(pa.large_string()), ""), True))
    if kc in names:
        ok = pc.and_(ok, pc.fill_null(pc.equal(
            t[kc].combine_chunks(), pa.scalar(KIND_LITERAL, pa.int8())),
            True))
    return pc.if_else(ok, arr, pa.scalar(None, pa.large_string()))


def _num_rank(node, t: pa.Table):
    """Per-row numeric-promotion rank of an expression (0=integer,
    1=decimal, 2=float, 3=double; null = not a number / error) —
    NodeValueOps' XPath promotion lattice, vectorized."""
    n = t.num_rows
    tag = node[0]

    def const(r):
        return pa.array([r] * n, pa.int8())

    if tag == "num":
        return const(_PROMO_RANK[node[2]])
    if tag == "typedlit":
        r = _PROMO_RANK.get(node[2])
        if r is None:
            return pa.nulls(n, pa.int8())
        try:
            float(node[1])
        except ValueError:
            return pa.nulls(n, pa.int8())
        return const(r)
    if tag == "var":
        lex = _var_col(t, node[1])
        num_ok = pc.fill_null(pc.match_substring_regex(lex, _NUM_RE), False)
        dc = node[1] + "__dt"
        if dc not in t.schema.names:
            # untyped tabular: numeric-looking → integer/decimal by form
            has_dot = pc.fill_null(
                pc.match_substring_regex(lex, r"[.eE]"), False)
            r = pc.if_else(has_dot, _i8(1), _i8(0))
            return pc.if_else(num_ok, r, pa.scalar(None, pa.int8()))
        dt = pc.fill_null(t[dc].combine_chunks().cast(pa.large_string()), "")
        rank = pa.nulls(n, pa.int8())
        ints = pa.array(
            sorted(d for d, r in _PROMO_RANK.items() if r == 0),
            pa.large_string())
        rank = pc.if_else(pc.is_in(dt, value_set=ints), _i8(0), rank)
        rank = pc.if_else(pc.equal(dt, _XSD + "decimal"), _i8(1), rank)
        rank = pc.if_else(pc.equal(dt, _XSD + "float"), _i8(2), rank)
        rank = pc.if_else(pc.equal(dt, _XSD + "double"), _i8(3), rank)
        return pc.if_else(num_ok, rank, pa.scalar(None, pa.int8()))
    if tag == "arith":
        rl, rr = _num_rank(node[2], t), _num_rank(node[3], t)
        m = pc.max_element_wise(rl, rr, skip_nulls=False)
        if node[1] == "/":
            # op:numeric-divide on two integers yields a decimal
            m = pc.if_else(pc.equal(m, _i8(0)), _i8(1), m)
        return m
    if tag == "cast" and node[1] in _CAST_NUMERIC:
        return const(_PROMO_RANK.get(node[1], 0))
    if tag == "rand":
        return const(3)
    if tag == "dtfn":
        if node[1] in ("tz", "timezone"):
            return pa.nulls(n, pa.int8())
        return const(1 if node[1] == "seconds" else 0)
    if tag == "strlen":
        return const(0)
    if tag == "fn1" and node[1] in _NUMERIC_FN1:
        return _num_rank(node[2], t)
    if tag == "mathfn":
        return const(3)  # math: results are xsd:double
    if tag == "durfn":
        return const(1 if node[1] == "seconds" else 0)
    return pa.nulls(n, pa.int8())


def _eval_num(node, t: pa.Table):
    """Evaluate a value expression in the numeric context → float64 with
    null where the row has no numeric value."""
    return _num_or_null(node, t, _eval_value(node, t), strict=True)


def _num_or_null(node, t: pa.Table, val, strict: bool):
    """Numeric view of one comparison operand: a float64 array/scalar with
    NULL where the row has no numeric value.

    strict=True (a numeric literal / STRLEN on the other side — the
    engine's numeric context): a var row is numeric when its lexical form
    parses AND its datatype is numeric or absent (untyped data keeps the
    documented lexical-numeric behavior); ill-typed rows become null →
    comparison false, SPARQL's type-error-is-false rule.

    strict=False (term-typed value comparison, NodeValue.sameValueAs /
    compare): a var row is numeric ONLY when its datatype is in the
    numeric value space — plain "42" stays a string."""
    tag = node[0] if node else None
    if tag == "typedlit":
        if node[2] in _NUMERIC_DTS:
            try:
                return pa.scalar(float(node[1]), pa.float64())
            except (TypeError, ValueError):
                return pa.scalar(None, pa.float64())
        return pa.scalar(None, pa.float64())
    if tag == "iriconst":
        return pa.scalar(None, pa.float64())
    if _is_numeric_node(node):
        return val if not isinstance(val, pa.ChunkedArray) else val.combine_chunks()
    if tag == "lit":
        if strict:
            try:
                return pa.scalar(float(node[1]), pa.float64())
            except (TypeError, ValueError):
                return pa.scalar(None, pa.float64())
        return pa.scalar(None, pa.float64())
    if tag == "var":
        arr = val.combine_chunks() if isinstance(val, pa.ChunkedArray) else val
        if not (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)):
            return pc.cast(arr, pa.float64())
        ok = pc.fill_null(pc.match_substring_regex(arr, _NUM_RE), False)
        dt_col = node[1] + "__dt"
        if dt_col in t.schema.names:
            dt = t[dt_col].combine_chunks()
            numeric_dt = pc.fill_null(
                pc.is_in(dt, value_set=pa.array(sorted(_NUMERIC_DTS), dt.type)),
                False,
            )
            if strict:
                dt_gate = pc.or_(
                    numeric_dt,
                    pc.fill_null(pc.equal(dt, ""), True),
                )
            else:
                dt_gate = numeric_dt
            ok = pc.and_(ok, dt_gate)
        elif not strict:
            # no metadata → no typed value space to speak of
            return pa.nulls(len(arr), pa.float64())
        guarded = pc.if_else(ok, arr, pa.scalar(None, arr.type))
        return pc.cast(guarded, pa.float64())
    # other value expressions are engine-numeric already (or fail the cast)
    try:
        return pc.cast(
            val.combine_chunks() if isinstance(val, pa.ChunkedArray) else val,
            pa.float64(),
        )
    except pa.ArrowInvalid:
        return pa.scalar(None, pa.float64())


def _var_col(t: pa.Table, name: str):
    """Column of ?name, or an all-null column when the var is not in
    scope of this relation (unbound reference = type error per row).
    Native-typed columns (aggregate outputs like COUNT's int64, seen
    e.g. by a HAVING expression) are cast to their lexical form —
    every expression kernel downstream works over lexical strings."""
    if name in t.schema.names:
        col = t[name].combine_chunks()
        if (pa.types.is_integer(col.type) or pa.types.is_floating(col.type)
                or pa.types.is_boolean(col.type)):
            col = pc.cast(col, pa.large_string())
        return col
    return pa.array([None] * t.num_rows, pa.large_string())


_CDT_FNS = {"get", "size", "concat", "contains", "containsKey",
            "containsTerm", "head", "tail", "keys", "reverse",
            "subseq", "put", "remove", "merge", "List", "Map"}

# sentinel: an UNBOUND argument (distinct from a CDT null element)
_CDT_UNBOUND = object()


def _cdt_term_of(lex, cls, dt, lang):
    """One evaluated argument → a cdt.py term tuple (kind, lex, dt,
    lang), a nested list/dict for CDT composites, or _CDT_UNBOUND."""
    from ..model import KIND_BNODE, KIND_IRI, KIND_LITERAL
    from ..rdf.cdt import (CDT_LIST, CDT_MAP, parse_cdt_list,
                           parse_cdt_map)

    if lex is None:
        return _CDT_UNBOUND
    if dt == CDT_LIST:
        return parse_cdt_list(lex)
    if dt == CDT_MAP:
        return parse_cdt_map(lex)
    if cls == _CLS_IRI:
        return (KIND_IRI, lex, "", "")
    if cls == _CLS_BNODE:
        return (KIND_BNODE, lex, "", "")
    if cls == _CLS_NUM and not dt:
        # numeric expression result (arith/strlen): typed per lexical
        from ..model import XSD_NS

        dt = XSD_NS + ("integer" if re.fullmatch(r"[+-]?\d+", lex)
                       else "decimal")
    return (KIND_LITERAL, lex, dt or "", lang or "")


def _cdt_value_key(term):
    """Value-space identity for map keys / contains checks: numeric
    literals normalize across lexical forms; plain ≡ xsd:string; lang
    tags case-fold (CompositeDatatypeMap key identity)."""
    from ..model import KIND_LITERAL, XSD_STRING

    from ..model import RDF_LANGSTRING

    if term is None or isinstance(term, (list, dict)):
        raise ValueError("composite/null is not an atomic key")
    kind, lex, dt, lang = term
    if kind == KIND_LITERAL and not lang:
        if dt in _NUMERIC_DTS or dt == "":
            try:
                f = float(lex)
                return ("num", int(f) if f == int(f) else f)
            except ValueError:
                pass
        if dt == XSD_STRING:
            dt = ""
    if lang:  # lang literal: datatype is rdf:langString by definition
        dt = RDF_LANGSTRING
    return (kind, lex, dt, (lang or "").lower())


def _cdt_term_key(term):
    """TERM identity for map keys (CompositeDatatypeMap: keys are
    unique RDF terms — '02'^^xsd:integer and 2 are DISTINCT keys;
    plain ≡ xsd:string is the one abstract-syntax identification)."""
    from ..model import KIND_LITERAL, RDF_LANGSTRING, XSD_STRING

    if term is None or isinstance(term, (list, dict)):
        raise ValueError("composite/null is not an atomic key")
    kind, lex, dt, lang = term
    if kind == KIND_LITERAL and dt == XSD_STRING and not lang:
        dt = ""
    if lang:
        dt = RDF_LANGSTRING
    return (kind, lex, dt, (lang or "").lower())


def _apply_cdt(fn: str, row: tuple):
    """One row of a cdt:* call (function/library/cdt/*.java semantics:
    GetFct, ConcatFct, ContainsFct, ContainsKeyFct, HeadFct, TailFct,
    KeysFct, SizeFct, ReverseFct, SubSeqFct, PutFct, RemoveFct,
    MergeFct, ListFct, MapFct). Arguments are cdt term tuples / nested
    structures; raises on error → null."""
    from ..model import KIND_BNODE, KIND_LITERAL, XSD_NS as XSD
    from ..rdf.cdt import format_cdt_list, format_cdt_map

    def want_list(x):
        # only a parsed composite qualifies (an untyped string is NOT a
        # cdt:List — get-error-01); dt-typed args were parsed upstream
        if isinstance(x, list):
            return x
        raise ValueError("not a cdt:List")

    def want_map(x):
        if isinstance(x, dict):
            return x
        raise ValueError("not a cdt:Map")

    _INT_DTS = {XSD + s for s in (
        "integer", "int", "long", "short", "byte", "nonNegativeInteger",
        "positiveInteger", "nonPositiveInteger", "negativeInteger",
        "unsignedLong", "unsignedInt", "unsignedShort", "unsignedByte")}

    def want_int(x):
        # an xsd:integer-family term (GetFct/SubSeqFct type-check:
        # 2.0 is NOT a valid index even though its value is integral)
        if (isinstance(x, tuple) and x[0] == KIND_LITERAL
                and (x[2] in _INT_DTS
                     or (not x[2] and re.fullmatch(r"[+-]?\d+", x[1])))):
            return int(x[1])
        raise ValueError("not an integer")

    def elem_out(e):
        # element → an ("ELEM", term) marker: the caller re-attaches
        # per-row term metadata (kind/dt/lang); null element → unbound
        if e is None:
            raise ValueError("null element")
        return ("ELEM", e)

    if fn == "List":  # constructor: unbound args become null elements
        return format_cdt_list(
            [None if x is _CDT_UNBOUND else x for x in row])
    if fn == "Map":  # constructor: (k1, v1, k2, v2, ...), later key wins
        if len(row) % 2:
            raise ValueError("cdt:Map needs key/value pairs")
        out: dict = {}
        seen: dict = {}
        for i in range(0, len(row), 2):
            k, v = row[i], row[i + 1]
            if k is _CDT_UNBOUND or (
                    isinstance(k, tuple) and k[0] == KIND_BNODE):
                # unbound / blank-node KEY: the pair is skipped (MapFct —
                # a bnode is not a valid map key)
                continue
            if isinstance(k, (list, dict)):
                raise ValueError("bad map key")
            kk = _cdt_term_key(k)
            if kk in seen:
                del out[seen[kk]]
            seen[kk] = k
            out[k] = None if v is _CDT_UNBOUND else v
        return format_cdt_map(out)
    if fn == "put":
        # an unbound VALUE becomes a null entry (PutFct); unbound
        # container/key stay errors
        if row[0] is _CDT_UNBOUND or row[1] is _CDT_UNBOUND:
            raise ValueError("unbound argument")
        m = dict(want_map(row[0]))
        k = row[1]
        # 2-arg form / unbound value → null entry (PutFct)
        v = None if len(row) < 3 or row[2] is _CDT_UNBOUND else row[2]
        if isinstance(k, (list, dict)):
            raise ValueError("composite map key")
        if isinstance(k, tuple) and k[0] == KIND_BNODE:
            raise ValueError("bnode map key")
        kk = _cdt_term_key(k)
        for old in list(m):
            if _cdt_term_key(old) == kk:
                del m[old]
        m[k] = v
        return format_cdt_map(m)
    if any(x is _CDT_UNBOUND for x in row):
        raise ValueError("unbound argument")
    if fn == "size":
        if not isinstance(row[0], (list, dict)):
            raise ValueError("size needs a cdt:List or cdt:Map")
        return len(row[0])
    if fn == "concat":
        out = []
        for x in row:
            out.extend(want_list(x))
        return format_cdt_list(out)
    if fn == "get":
        c = row[0]
        if isinstance(c, dict):
            key = _cdt_term_key(row[1])
            for k, v in c.items():
                if _cdt_term_key(k) == key:
                    return elem_out(v)
            raise ValueError("no such key")
        i = want_int(row[1])
        c = want_list(c)
        if not 1 <= i <= len(c):  # 1-based (GetFct)
            raise ValueError("index out of range")
        return elem_out(c[i - 1])
    if fn in ("contains", "containsTerm"):
        from ..rdf.cdt import _elem_same

        vals = want_list(row[0])
        unknown = False
        for v in vals:
            try:
                if _elem_same(v, row[1]):
                    return True
            except Exception:
                if (isinstance(v, tuple) and v[0] == KIND_BNODE
                        and isinstance(row[1], tuple)
                        and row[1][0] == KIND_BNODE):
                    continue  # bnode membership is sameTerm: a distinct
                    # label is a definite miss (ContainsFct)
                unknown = True
        if unknown:
            raise ValueError("membership unknown")
        return False
    if fn == "containsKey":
        m = want_map(row[0])
        key = _cdt_term_key(row[1])
        return any(_cdt_term_key(k) == key for k in m)
    if fn == "head":
        vals = want_list(row[0])
        if not vals:
            raise ValueError("head of empty list")
        return elem_out(vals[0])
    if fn == "tail":
        vals = want_list(row[0])
        if not vals:
            raise ValueError("tail of empty list")
        return format_cdt_list(vals[1:])
    if fn == "reverse":
        return format_cdt_list(list(reversed(want_list(row[0]))))
    if fn == "subseq":
        vals = want_list(row[0])
        start = want_int(row[1])
        length = want_int(row[2]) if len(row) > 2 else len(vals) - start + 1
        if start < 1 or length < 0 or start + length - 1 > len(vals):
            raise ValueError("subseq out of range")
        return format_cdt_list(vals[start - 1:start - 1 + length])
    if fn == "keys":
        return format_cdt_list(list(want_map(row[0]).keys()))
    if fn == "remove":
        if isinstance(row[1], tuple) and row[1][0] == KIND_BNODE:
            # a bnode is never a map key: by definition the input term
            # is returned UNCHANGED (RemoveFct special case)
            return ("PASSTHROUGH", 0)
        m = dict(want_map(row[0]))
        kk = _cdt_term_key(row[1])
        for old in list(m):
            if _cdt_term_key(old) == kk:
                del m[old]
        return format_cdt_map(m)
    if fn == "merge":
        m1, m2 = want_map(row[0]), want_map(row[1])
        out = dict(m1)
        keys1 = {_cdt_term_key(k) for k in m1}
        for k, v in m2.items():
            if _cdt_term_key(k) not in keys1:
                out[k] = v
        return format_cdt_map(out)
    raise ValueError(f"unknown cdt fn {fn}")


def _eval_cdtfn(node, t: pa.Table, with_meta: bool = False):
    """cdt:* library call over a binding batch. CDT literals are nested
    term structures, so the kernel is per-VALUE structural (not an
    Arrow kernel); errors yield null per SPARQL error semantics.
    Results: size → numeric, contains/containsKey → boolean, others →
    the engine's lexical convention (CDT outputs canonical).
    ``with_meta=True`` additionally returns per-row (kind, dt, lang)
    arrays — get/head elements keep their term identity (a blank-node
    element stays a blank node through BIND)."""
    from ..rdf.cdt import CDT_LIST, CDT_MAP

    fn, args = node[1], node[2]
    n = t.num_rows
    cols = []
    for a in args:
        S = _eq_side(a, t)
        lex = S["lex"].to_pylist()
        cls = S["cls"].to_pylist()
        dt = S["dt"].to_pylist()
        lang = S["lang"].to_pylist()
        # a statically CDT-typed expression (nested cdt:List(...) /
        # typed literal) parses as a nested structure even when the
        # generic classifier lost the datatype
        static = _expr_static_meta(a)
        sdt = static[1] if static else None
        if sdt in (CDT_LIST, CDT_MAP):
            dt = [sdt] * n
        cols.append(list(zip(lex, cls, dt, lang)))
    from ..model import KIND_LITERAL
    from ..rdf.cdt import format_cdt_list, format_cdt_map

    out = []
    kinds: list = []
    dts: list = []
    langs: list = []
    for i in range(n):
        kind = dt = lang = None
        try:
            row = tuple(_cdt_term_of(*c[i]) for c in cols)
            res = _apply_cdt(fn, row)
            if isinstance(res, tuple) and res[0] == "PASSTHROUGH":
                res = cols[res[1]][i][0]  # input lexical unchanged
                kind, dt, lang = KIND_LITERAL, CDT_MAP, ""
            elif isinstance(res, tuple) and res[0] == "ELEM":
                e = res[1]
                if isinstance(e, list):
                    res, kind, dt, lang = (format_cdt_list(e),
                                           KIND_LITERAL, CDT_LIST, "")
                elif isinstance(e, dict):
                    res, kind, dt, lang = (format_cdt_map(e),
                                           KIND_LITERAL, CDT_MAP, "")
                else:
                    kind, res, dt, lang = e
            out.append(res)
        except Exception:
            out.append(None)
        kinds.append(kind)
        dts.append(dt or "")
        langs.append(lang or "")
    if fn == "size":
        return pa.array(
            [float(x) if x is not None else None for x in out], pa.float64())
    if fn in ("contains", "containsKey", "containsTerm"):
        return pa.array(out, pa.bool_())
    lex_arr = pa.array(out, pa.large_string())
    if with_meta:
        static = _expr_static_meta(node)
        if static is not None:
            kinds = [static[0] if x is not None else None for x in out]
            dts = [static[1] if x is not None else "" for x in out]
            langs = [static[2] if x is not None else "" for x in out]
        return (lex_arr, pa.array(kinds, pa.int8()),
                pa.array(dts, pa.large_string()),
                pa.array(langs, pa.large_string()))
    return lex_arr


def _eval_value(node, t: pa.Table):
    tag = node[0]
    if tag == "cdtfn":
        return _eval_cdtfn(node, t)
    if tag == "var":
        # out-of-scope vars yield nulls (bottom-up semantics: an
        # inner-group FILTER naming an outer var sees it unbound)
        return _var_col(t, node[1])
    if tag == "lit" or tag == "iriconst":
        return pa.scalar(node[1], pa.large_string())
    if tag == "typedlit":
        return pa.scalar(node[1], pa.large_string())
    if tag == "num":
        return pa.scalar(node[1], pa.float64())
    if tag == "strlen":
        return pc.cast(pc.utf8_length(_var_col(t, node[1])), pa.float64())
    if tag == "strlenx":  # STRLEN over a computed expression
        v = _to_lexical(_eval_value(node[1], t), t.num_rows)
        if isinstance(v, pa.Scalar):
            v = pa.array([v.as_py()] * t.num_rows, pa.large_string())
        return pc.cast(pc.utf8_length(v), pa.float64())
    if tag == "jsubstr":
        # afn:substring — JAVA String.substring semantics
        # (XSDFuncOp.javaSubstring): 0-based [begin, end); indexes out
        # of range are EXPRESSION ERRORS (IndexOutOfBounds →
        # ExprEvalException), not clamped like SPARQL SUBSTR
        arr = _str_arg(node[1], t,
                       _to_lexical(_eval_value(node[1], t), t.num_rows))
        if isinstance(arr, pa.Scalar):
            arr = pa.array([arr.as_py()] * t.num_rows, pa.large_string())
        bv = _eval_num(node[2], t)
        ev = None if node[3] is None else _eval_num(node[3], t)
        if isinstance(bv, pa.Scalar) and (
                ev is None or isinstance(ev, pa.Scalar)):
            begin = bv.as_py()
            end = None if ev is None else ev.as_py()
            if begin is None or (node[3] is not None and end is None):
                return pa.scalar(None, pa.large_string())
            begin, end = int(begin), None if end is None else int(end)
            n = pc.utf8_length(arr)
            hi = begin if end is None else max(begin, end)
            ok = pc.and_(
                pc.fill_null(pc.greater_equal(n, hi), False),
                pa.scalar(begin >= 0 and (end is None or end >= begin)))
            sliced = pc.utf8_slice_codeunits(arr, max(begin, 0), end)
            return pc.if_else(ok, sliced,
                              pa.scalar(None, pa.large_string()))
        # per-row index expressions (seq-1's strlen(str(rdf:))+1 — a
        # cold conformance path)
        bl = (bv.to_pylist() if not isinstance(bv, pa.Scalar)
              else [bv.as_py()] * t.num_rows)
        el = ([None] * t.num_rows if ev is None
              else ev.to_pylist() if not isinstance(ev, pa.Scalar)
              else [ev.as_py()] * t.num_rows)
        out = []
        for sx, b, e in zip(arr.to_pylist(), bl, el):
            if sx is None or b is None or (node[3] is not None and e is None):
                out.append(None)
                continue
            b = int(b)
            e = None if e is None else int(e)
            if b < 0 or b > len(sx) or (
                    e is not None and (e < b or e > len(sx))):
                out.append(None)
            else:
                out.append(sx[b:] if e is None else sx[b:e])
        return pa.array(out, pa.large_string())
    if tag == "irisplit":
        # afn:localname / afn:namespace (library/localname.java —
        # Node.getLocalName, the NCName-suffix split); non-IRI rows are
        # expression errors → null
        from ..model import KIND_IRI

        from .propfunc import split_iri

        which, e = node[1], node[2]
        v = _to_lexical(_eval_value(e, t), t.num_rows)
        if isinstance(v, pa.Scalar):
            v = pa.array([v.as_py()] * t.num_rows, pa.large_string())
        out = []
        for x in v.to_pylist():
            if x is None:
                out.append(None)
            else:
                ns, local = split_iri(x)
                out.append(ns if which == "ns" else local)
        res = pa.array(out, pa.large_string())
        if e[0] == "var" and e[1] + "__kind" in t.schema.names:
            is_iri = pc.fill_null(
                pc.equal(t[e[1] + "__kind"].combine_chunks(),
                         pa.scalar(KIND_IRI, pa.int8())), True)
            res = pc.if_else(is_iri, res,
                             pa.scalar(None, pa.large_string()))
        return res
    if tag == "errfn":
        # unregistered extension function: every row errors
        return pa.scalar(None, pa.large_string())
    if tag == "minmax2":
        a, b = _eval_num(node[2], t), _eval_num(node[3], t)
        f = pc.min_element_wise if node[1] == "min" else pc.max_element_wise
        # a null operand is an expression error → propagate, don't skip
        return f(a, b, skip_nulls=False)
    if tag == "sqrt1":
        return pc.sqrt(_eval_num(node[1], t))
    if tag == "mathfn":
        return _eval_mathfn(node, t)
    if tag == "normspace":
        # fn:normalize-space (F&O §5.4.5): trim + collapse runs of
        # \x20 \t \r \n to a single space
        arr = _str_arg(node[1], t,
                       _to_lexical(_eval_value(node[1], t), t.num_rows))
        return pc.utf8_trim(
            pc.replace_substring_regex(arr, r"[ \t\r\n]+", " "),
            characters=" ")
    if tag == "normuni":
        # fn:normalize-unicode (F&O §5.4.6) — per-row unicodedata; the
        # form is a parse-time constant
        import unicodedata as _ud

        arr = _str_arg(node[1], t,
                       _to_lexical(_eval_value(node[1], t), t.num_rows))
        if isinstance(arr, pa.Scalar):
            arr = pa.array([arr.as_py()] * t.num_rows, pa.large_string())
        form = node[2]
        return pa.array(
            [None if x is None else _ud.normalize(form, x)
             for x in arr.to_pylist()],
            pa.large_string())
    if tag == "fmtnum":
        # fn:format-number → Java DecimalFormat semantics
        # (functions/decimalformat.py). Integer-typed rows format via
        # the long path (XSDFuncOp OP_INTEGER), others via double.
        from ..functions.decimalformat import (DecimalFormatError,
                                               format_number)

        nums = _eval_num(node[1], t)
        if isinstance(nums, pa.Scalar):
            nums = pa.array([nums.as_py()] * t.num_rows, pa.float64())
        rank = _num_rank(node[1], t)
        if isinstance(rank, pa.Scalar):
            rank = pa.array([rank.as_py()] * t.num_rows, pa.int8())
        try:
            out = []
            for v, r in zip(nums.to_pylist(), rank.to_pylist()):
                if v is None:
                    out.append(None)
                elif r == 0 and float(v).is_integer():
                    out.append(format_number(int(v), node[2], node[3]))
                else:
                    out.append(format_number(v, node[2], node[3]))
            return pa.array(out, pa.large_string())
        except DecimalFormatError:
            return pa.scalar(None, pa.large_string())
    if tag == "durfn":
        return _eval_durfn(node, t)
    if tag == "dtcombine":
        return _eval_dtcombine(node, t)
    if tag == "adjtz":
        return _eval_adjtz(node, t)
    if tag in ("lang", "langdir"):
        from ..model import KIND_LITERAL

        col = t[node[1] + "__lang"] if node[1] + "__lang" in t.schema.names else None
        if col is None:
            out = pa.array([""] * t.num_rows, pa.large_string())
        else:
            out = pc.fill_null(col.combine_chunks().cast(pa.large_string()), "")
        if tag == "lang":
            # RDF 1.2: the base direction rides the lang slot as
            # "en--ltr" — LANG returns the language alone
            out = pc.replace_substring_regex(out, r"--(ltr|rtl)$", "")
        else:  # LANGDIR: the direction alone ("" when none)
            out = pc.if_else(
                pc.match_substring_regex(out, r"--ltr$"),
                pa.scalar("ltr", pa.large_string()),
                pc.if_else(
                    pc.match_substring_regex(out, r"--rtl$"),
                    pa.scalar("rtl", pa.large_string()),
                    pa.scalar("", pa.large_string())))
        # LANG of a non-literal (or unbound) is a type error → null
        kc = node[1] + "__kind"
        if kc in t.schema.names:
            is_lit = pc.fill_null(pc.equal(
                t[kc].combine_chunks(), pa.scalar(KIND_LITERAL, pa.int8())),
                True)
            out = pc.if_else(is_lit, out, pa.scalar(None, pa.large_string()))
        bound = pc.is_valid(_var_col(t, node[1]))
        return pc.if_else(bound, out, pa.scalar(None, pa.large_string()))
    if tag == "datatype":
        # DATATYPE(?v): declared dt; plain literal → xsd:string;
        # lang-tagged → rdf:langString; non-literals → null (type error)
        from ..model import KIND_LITERAL, RDF_LANGSTRING, XSD_STRING

        names = t.schema.names
        n = t.num_rows
        dt = (
            t[node[1] + "__dt"].combine_chunks().cast(pa.large_string())
            if node[1] + "__dt" in names
            else pa.array([""] * n, pa.large_string())
        )
        lang = (
            t[node[1] + "__lang"].combine_chunks().cast(pa.large_string())
            if node[1] + "__lang" in names
            else pa.array([""] * n, pa.large_string())
        )
        kind = (
            t[node[1] + "__kind"].combine_chunks()
            if node[1] + "__kind" in names
            else pa.array([KIND_LITERAL] * n, pa.int8())
        )
        out = pc.if_else(
            pc.fill_null(pc.not_equal(lang, ""), False),
            pa.scalar(RDF_LANGSTRING, pa.large_string()),
            pc.if_else(
                pc.fill_null(pc.equal(dt, ""), True),
                pa.scalar(XSD_STRING, pa.large_string()),
                dt,
            ),
        )
        is_lit = pc.fill_null(
            pc.equal(kind, pa.scalar(KIND_LITERAL, pa.int8())), True
        )
        # an unbound var (or out-of-scope reference) is a type error →
        # null, never xsd:string
        is_lit = pc.and_(is_lit, pc.is_valid(_var_col(t, node[1])))
        return pc.if_else(is_lit, out, pa.scalar(None, pa.large_string()))
    if tag == "datatype_expr":
        sub = node[1]
        if sub[0] == "lit":
            from ..model import XSD_STRING

            return pa.array([XSD_STRING] * t.num_rows, pa.large_string())
        if sub[0] == "typedlit":
            from ..model import RDF_LANGSTRING, XSD_NS, XSD_STRING

            if sub[3]:  # lang-tagged (RDF 1.2: --dir → dirLangString)
                dt = ("http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                      "dirLangString" if "--" in sub[3] else RDF_LANGSTRING)
                return pa.array([dt] * t.num_rows, pa.large_string())
            return pa.array(
                [sub[2] or XSD_STRING] * t.num_rows, pa.large_string())
        if sub[0] in ("uuid", "irifn", "bnodefn") and not (
                sub[0] == "uuid" and sub[1]):
            # IRIs / bnodes have no datatype → per-row type error
            return pa.nulls(t.num_rows, pa.large_string())
        if sub[0] == "encuri" or (sub[0] == "uuid" and sub[1]):
            from ..model import XSD_STRING

            return pa.array([XSD_STRING] * t.num_rows, pa.large_string())
        if sub[0] == "dtfn" and sub[1] in ("tz",):
            from ..model import XSD_STRING

            return pa.array([XSD_STRING] * t.num_rows, pa.large_string())
        if sub[0] == "dtfn" and sub[1] == "timezone":
            val = _eval_value(sub, t)
            return pc.if_else(
                pc.is_valid(val),
                pa.scalar(_XSD + "dayTimeDuration", pa.large_string()),
                pa.scalar(None, pa.large_string()))
        if sub[0] == "cast":
            # DATATYPE of a constructor cast: the target type wherever
            # the cast itself succeeded
            val = _eval_value(sub, t)
            if isinstance(val, pa.Scalar):
                val = pa.array([val.as_py()] * t.num_rows)
            return pc.if_else(
                pc.is_valid(val),
                pa.scalar(sub[1], pa.large_string()),
                pa.scalar(None, pa.large_string()))
        if sub[0] in ("hashfn", "concat", "substr", "replace",
                      "strbefore", "strafter", "irisplit", "normspace",
                      "normuni") or (
                sub[0] == "fn1" and sub[1] in ("STR", "UCASE", "LCASE")):
            val = _eval_value(sub, t)
            if isinstance(val, pa.Scalar):
                val = pa.array([val.as_py()] * t.num_rows)
            from ..model import XSD_STRING

            return pc.if_else(
                pc.is_valid(val),
                pa.scalar(XSD_STRING, pa.large_string()),
                pa.scalar(None, pa.large_string()))
        # a computed numeric expression → the promoted result type IRI
        # per row, null on error
        rank = _num_rank(node[1], t)
        out = pa.scalar(None, pa.large_string())
        for r in (3, 2, 1, 0):
            out = pc.if_else(
                pc.fill_null(pc.equal(rank, _i8(r)), False),
                pa.scalar(_PROMO_BY_RANK[r], pa.large_string()),
                out)
        # also require the VALUE itself to evaluate (0-divisor etc.)
        val = _eval_num(node[1], t)
        if not isinstance(val, pa.Scalar):
            out = pc.if_else(pc.is_valid(val), out,
                             pa.scalar(None, pa.large_string()))
        return out
    if tag == "arith":
        # numeric operators with SPARQL's type-error-is-null semantics:
        # a non-numeric operand row yields null (E_Add .. E_Divide)
        op, l, r = node[1], node[2], node[3]
        ln, rn = _eval_num(l, t), _eval_num(r, t)
        if op == "/":
            # guard integer-style checked division: null out zero divisors
            zero = pc.equal(rn, 0.0)
            if isinstance(zero, pa.Scalar):
                if zero.as_py():
                    rn = pa.scalar(None, pa.float64())
            else:
                rn = pc.if_else(pc.fill_null(zero, False),
                                pa.scalar(None, pa.float64()), rn)
        f = {"+": pc.add, "-": pc.subtract, "*": pc.multiply,
             "/": pc.divide}[op]
        return f(ln, rn)
    if tag == "fn1":
        fn, e = node[1], node[2]
        if fn == "STR":
            return _to_lexical(_eval_value(e, t), t.num_rows)
        if fn == "UCASE":
            return pc.utf8_upper(
                _str_arg(e, t, _to_lexical(_eval_value(e, t), t.num_rows)))
        if fn == "LCASE":
            return pc.utf8_lower(
                _str_arg(e, t, _to_lexical(_eval_value(e, t), t.num_rows)))
        num = _eval_num(e, t)
        if fn == "ABS":
            return pc.abs(num)
        if fn == "CEIL":
            return pc.ceil(num)
        if fn == "FLOOR":
            return pc.floor(num)
        # ROUND: xpath fn:round — ties toward positive infinity
        return pc.round(num, 0, round_mode="half_up")
    if tag == "concat":
        if not node[1]:  # CONCAT() = the empty string
            return pa.scalar("", pa.large_string())
        parts = [_str_arg(e, t, _to_lexical(_eval_value(e, t), t.num_rows))
                 for e in node[1]]
        return pc.binary_join_element_wise(
            *parts, pa.scalar("", pa.large_string())
        )
    if tag == "coalesce":
        if not node[1]:  # COALESCE() = error
            return pa.scalar(None, pa.large_string())
        out = None
        for e in node[1]:
            v = _to_lexical(_eval_value(e, t), t.num_rows)
            if isinstance(v, pa.Scalar):
                v = pa.array([v.as_py()] * t.num_rows, pa.large_string())
            out = v if out is None else pc.coalesce(out, v)
        return out
    if tag == "substr":
        arr = _str_arg(node[1], t,
                       _to_lexical(_eval_value(node[1], t), t.num_rows))
        start, length = node[2], node[3]
        stop = None if length is None else start - 1 + length
        return pc.utf8_slice_codeunits(arr, max(start - 1, 0), stop)
    if tag == "replace":
        arr = _str_arg(node[1], t,
                       _to_lexical(_eval_value(node[1], t), t.num_rows))
        # SPARQL backrefs are $N; RE2 replacement wants \N
        rep = re.sub(r"\$(\d)", r"\\\1", node[3])
        return pc.replace_substring_regex(
            arr, pattern=node[2], replacement=rep
        )
    if tag in ("strbefore", "strafter"):
        arr = _str_arg(node[1], t,
                       _to_lexical(_eval_value(node[1], t), t.num_rows))
        if isinstance(arr, pa.Scalar):
            arr = pa.array([arr.as_py()] * t.num_rows, pa.large_string())
        # argument compatibility (17.4.3.1): a lang-tagged second arg
        # requires the first arg to carry the SAME tag, else type error
        lang2 = node[3] if len(node) > 3 else ""
        if lang2 and node[1][0] == "var" \
                and node[1][1] + "__lang" in t.schema.names:
            l1 = pc.utf8_lower(pc.fill_null(
                t[node[1][1] + "__lang"].combine_chunks().cast(
                    pa.large_string()), ""))
            ok = pc.equal(l1, lang2.lower())
            arr = pc.if_else(ok, arr, pa.scalar(None, pa.large_string()))
        elif lang2:
            arr = pa.nulls(t.num_rows, pa.large_string())
        s = node[2]
        if s == "":
            # STRBEFORE(x, "") = "", STRAFTER(x, "") = x (spec);
            # type-error rows stay null
            if tag == "strafter":
                return arr
            return pc.if_else(
                pc.is_valid(arr), pa.scalar("", pa.large_string()),
                pa.scalar(None, pa.large_string()))
        found = pc.greater_equal(pc.find_substring(arr, s), 0)
        # replace the FIRST occurrence with a sentinel, append one more
        # sentinel, split once: [before, after + NUL] when found,
        # [x, ""] when not — all rows have exactly two parts
        sent = "\x00"
        y = pc.binary_join_element_wise(
            pc.replace_substring(arr, pattern=s, replacement=sent,
                                 max_replacements=1),
            pa.scalar(sent, pa.large_string()),
            pa.scalar("", pa.large_string()),
        )
        parts = pc.split_pattern(y, pattern=sent, max_splits=1)
        empty = pa.scalar("", pa.large_string())
        if tag == "strbefore":
            return pc.if_else(found, pc.list_element(parts, 0), empty)
        after = pc.utf8_rtrim(
            pc.list_element(parts, 1).cast(pa.large_string()),
            characters=sent,
        )
        return pc.if_else(found, after, empty)
    if tag == "dtfn":
        # date/time component accessors (E_DateTimeYear .. E_DateTimeTZ)
        from datetime import datetime

        fn = node[1]
        arr = _to_lexical(_eval_value(node[2], t), t.num_rows)
        if isinstance(arr, pa.Scalar):
            arr = pa.array([arr.as_py()] * t.num_rows, pa.large_string())
        out = []
        for s in arr.to_pylist():
            if s is None:
                out.append(None)
                continue
            s2 = s[:-1] + "+00:00" if s.endswith("Z") else s
            d = None
            try:
                d = datetime.fromisoformat(s2)
            except (ValueError, TypeError):
                try:
                    # xsd:time lexical ("13:20:00[+TZ]")
                    d = datetime.fromisoformat("2000-01-01T" + s2)
                except (ValueError, TypeError):
                    # xsd:date WITH an explicit timezone
                    mdz = re.match(
                        r"^(\d{4}-\d{2}-\d{2})([+-]\d{2}:\d{2})$", s2)
                    if mdz:
                        d = datetime.fromisoformat(
                            mdz.group(1) + "T00:00:00" + mdz.group(2))
            if d is None:
                out.append(None)
                continue
            if fn == "year":
                out.append(float(d.year))
            elif fn == "month":
                out.append(float(d.month))
            elif fn == "day":
                out.append(float(d.day))
            elif fn == "hours":
                out.append(float(d.hour))
            elif fn == "minutes":
                out.append(float(d.minute))
            elif fn == "seconds":
                out.append(d.second + d.microsecond / 1e6)
            elif fn == "tz":
                if d.tzinfo is None:
                    out.append("")
                else:
                    off = d.utcoffset()
                    secs = int(off.total_seconds())
                    if secs == 0:
                        out.append("Z")
                    else:
                        sign = "-" if secs < 0 else "+"
                        secs = abs(secs)
                        out.append(f"{sign}{secs // 3600:02d}:"
                                   f"{(secs % 3600) // 60:02d}")
            else:  # timezone → xsd:dayTimeDuration lexical
                if d.tzinfo is None:
                    out.append(None)  # no timezone → type error
                else:
                    secs = int(d.utcoffset().total_seconds())
                    if secs == 0:
                        out.append("PT0S")
                    else:
                        sign = "-" if secs < 0 else ""
                        secs = abs(secs)
                        h, m = secs // 3600, (secs % 3600) // 60
                        dur = f"{sign}PT"
                        if h:
                            dur += f"{h}H"
                        if m:
                            dur += f"{m}M"
                        if not h and not m:
                            dur += "0S"
                        out.append(dur)
        if fn in ("tz", "timezone"):
            return pa.array(out, pa.large_string())
        return pa.array(out, pa.float64())
    if tag == "rand":
        import random

        return pa.array([random.random() for _ in range(t.num_rows)],
                        pa.float64())
    if tag == "uuid":
        import uuid as _uuid

        vals = [str(_uuid.uuid4()) for _ in range(t.num_rows)]
        if node[1]:  # STRUUID
            return pa.array(vals, pa.large_string())
        return pa.array(["urn:uuid:" + v for v in vals], pa.large_string())
    if tag == "bnodefn":
        import hashlib as _hl

        if node[1] is None:
            import uuid as _uuid

            return pa.array(
                [f"bn{_uuid.uuid4().hex[:12]}" for _ in range(t.num_rows)],
                pa.large_string())
        arr = _to_lexical(_eval_value(node[1], t), t.num_rows)
        if isinstance(arr, pa.Scalar):
            arr = pa.array([arr.as_py()] * t.num_rows, pa.large_string())
        # same argument → same bnode within a solution; distinct per row
        return pa.array(
            [None if s is None else
             "bn" + _hl.md5(f"{i}|{s}".encode()).hexdigest()[:12]
             for i, s in enumerate(arr.to_pylist())],
            pa.large_string())
    if tag == "irifn":
        arr = _to_lexical(_eval_value(node[1], t), t.num_rows)
        if isinstance(arr, pa.Scalar):
            arr = pa.array([arr.as_py()] * t.num_rows, pa.large_string())
        base = node[2] if len(node) > 2 else ""
        if base:
            from ..rdf.iri import resolve

            return pa.array(
                [None if s is None else
                 (s if re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", s)
                  else resolve(base, s))
                 for s in arr.to_pylist()],
                pa.large_string())
        return arr
    if tag == "encuri":
        from urllib.parse import quote

        arr = _str_arg(node[1], t,
                       _to_lexical(_eval_value(node[1], t), t.num_rows))
        if isinstance(arr, pa.Scalar):
            arr = pa.array([arr.as_py()] * t.num_rows, pa.large_string())
        return pa.array(
            [None if s is None else quote(s, safe="-_.~")
             for s in arr.to_pylist()],
            pa.large_string())
    if tag == "hashfn":
        import hashlib

        arr = _str_arg(node[2], t,
                       _to_lexical(_eval_value(node[2], t), t.num_rows))
        if isinstance(arr, pa.Scalar):
            arr = pa.array([arr.as_py()] * t.num_rows, pa.large_string())
        fn = getattr(hashlib, node[1])
        return pa.array(
            [fn(x.encode()).hexdigest() if x is not None else None
             for x in arr.to_pylist()],
            pa.large_string())
    if tag == "cast":
        # XPath-style constructor casting is SOURCE-TYPE aware
        # (XSDFuncOp cast table): a string source must carry a valid
        # lexical form of the TARGET type (no truncation), a numeric
        # source converts by value, booleans map 1/0, everything else
        # is a per-row error (null)
        target = node[1]
        S = _eq_side(node[2], t)
        lex, cls, num = S["lex"], S["cls"], S["num"]
        str_src = pc.or_(pc.equal(cls, _i8(_CLS_STR)),
                         pc.equal(cls, _i8(_CLS_UNTYPED)))
        num_src = pc.equal(cls, _i8(_CLS_NUM))
        bool_src = pc.equal(cls, _i8(_CLS_BOOL))
        null_f = pa.scalar(None, pa.float64())
        null_s = pa.scalar(None, pa.large_string())
        if target in _CAST_NUMERIC:
            rank = _PROMO_RANK.get(target, 0)
            if rank == 0:
                pat = r"^[+-]?\d+$"
            elif rank == 1:
                pat = r"^[+-]?(\d+(\.\d*)?|\.\d+)$"
            else:
                pat = _NUM_RE
            lex_ok = pc.fill_null(pc.match_substring_regex(lex, pat), False)
            from_str = pc.cast(
                pc.if_else(pc.and_(str_src, lex_ok), lex, null_s),
                pa.float64())
            from_num = pc.if_else(num_src,
                                  pc.trunc(num) if rank == 0 else num,
                                  null_f)
            from_bool = pc.if_else(bool_src, num, null_f)
            return pc.coalesce(from_str, from_num, from_bool)
        if target == _XSD + "boolean":
            truthy = pc.fill_null(pc.is_in(lex, value_set=pa.array(
                ["true", "1"], lex.type)), False)
            falsy = pc.fill_null(pc.is_in(lex, value_set=pa.array(
                ["false", "0"], lex.type)), False)
            from_str = pc.if_else(
                pc.and_(str_src, pc.or_(truthy, falsy)),
                pc.if_else(truthy, pa.scalar("true", pa.large_string()),
                           pa.scalar("false", pa.large_string())),
                null_s)
            num_val = pc.if_else(
                pc.fill_null(pc.not_equal(num, 0.0), False),
                pa.scalar("true", pa.large_string()),
                pa.scalar("false", pa.large_string()))
            from_numb = pc.if_else(pc.or_(num_src, bool_src), num_val,
                                   null_s)
            return pc.coalesce(from_str, from_numb)
        if target in (_XSD + "dateTime", _XSD + "date"):
            time_src = pc.equal(cls, _i8(_CLS_TIME))
            valid_lex = pa.array(
                [x is not None and _epoch_of(x) is not None
                 for x in lex.to_pylist()])
            ok = pc.and_(pc.or_(str_src, time_src), valid_lex)
            return pc.if_else(ok, lex, null_s)
        # xsd:string: canonical lexical of the VALUE — numeric sources
        # print canonically (integral → bare int, "1E0" → "1"), booleans
        # as true/false; other terms keep their lexical form
        as_int = pc.cast(num, pa.int64(), safe=False)
        integral = pc.fill_null(
            pc.equal(pc.cast(as_int, pa.float64()), num), False)
        num_canon = pc.if_else(
            integral,
            pc.cast(as_int, pa.string()).cast(pa.large_string()),
            pc.cast(num, pa.string()).cast(pa.large_string()))
        bool_canon = pc.if_else(
            pc.fill_null(pc.not_equal(num, 0.0), False),
            pa.scalar("true", pa.large_string()),
            pa.scalar("false", pa.large_string()))
        lang_src = pc.equal(cls, _i8(_CLS_LANG))
        bad = pc.or_(pc.equal(cls, _i8(_CLS_BNODE)), lang_src)
        out = pc.if_else(num_src, num_canon,
                         pc.if_else(bool_src, bool_canon, lex))
        return pc.if_else(bad, null_s, out)
    if tag in ("strdt", "strlang", "strlangdir"):
        # value model is lexical; the type/lang shows up in term
        # classification (_eq_side) and DATATYPE/LANG accessors.
        # STRDT/STRLANG require a SIMPLE literal argument (17.4.2.8/9)
        sub = node[1]
        if (sub[0] in ("num", "iriconst", "bnodefn", "tripleexpr")
                or (sub[0] == "typedlit" and (sub[3] or sub[2] not in
                                              ("", _XSD + "string")))):
            # constant non-(simple-string) argument → type error
            return pa.nulls(t.num_rows, pa.large_string())
        if tag == "strlang" and not node[2]:
            # empty language tag is a type error (E_StrLang)
            return pa.nulls(t.num_rows, pa.large_string())
        if tag == "strlangdir" and (
                not node[2] or node[3] not in ("ltr", "rtl")):
            # direction must be exactly "ltr"/"rtl"; lang nonempty
            return pa.nulls(t.num_rows, pa.large_string())
        arr = _str_arg(sub, t,
                       _to_lexical(_eval_value(sub, t), t.num_rows),
                       simple_only=True)
        return arr
    if tag == "ifexpr":
        # IF propagates a condition ERROR (null) to the result — it does
        # not fall through to the else branch (E_Conditional)
        cond = _eval_bool(node[1], t)
        if isinstance(cond, pa.Scalar):
            cond = pa.array([cond.as_py()] * t.num_rows, pa.bool_())
        a = _to_lexical(_eval_value(node[2], t), t.num_rows)
        b = _to_lexical(_eval_value(node[3], t), t.num_rows)
        return pc.if_else(cond, a, b)
    if tag in ("tripleexpr", "ttcomp"):
        return _tt_term_arrays(node, t)[0]
    if tag in ("cmp", "and", "or", "not", "bound", "regex", "strstarts",
               "strends", "contains", "langmatches", "isiri", "isliteral",
               "isblank", "istriple", "haslang", "haslangdir", "in",
               "notin", "evenint"):
        # a boolean expression used as a VALUE, e.g. BIND((?y = ?z) AS
        # ?eq): xsd:boolean lexical forms; evaluation errors stay null
        m = _eval_bool(node, t)
        if isinstance(m, pa.Scalar):
            m = pa.array([m.as_py()] * t.num_rows)
        return pc.if_else(
            m,
            pa.scalar("true", pa.large_string()),
            pa.scalar("false", pa.large_string()),
        )
    raise RDFParseError(f"SPARQL: not a value expression: {node!r}")


# --- RDFterm-equal (`=` / `!=`) --------------------------------------------
#
# SPARQL 17.4.1.7 / Jena NodeValue.sameValueAs + E_Equals/E_NotEquals:
# terms are classified per row into value-space classes; equality is
# definitive inside a class (and across the STR/UNTYPED bridge), an
# ERROR (null) for literal pairs in incomparable value spaces, and
# definitively false across term kinds. `same term` always wins.
# UNTYPED (dt="" — the engine's plain-tabular convention, distinct from
# parsed xsd:string literals) keeps the documented lexical/numeric
# behavior instead of the spec's simple-literal error rules.
(_CLS_IRI, _CLS_BNODE, _CLS_STR, _CLS_LANG, _CLS_NUM, _CLS_BOOL,
 _CLS_TIME, _CLS_UNTYPED, _CLS_OTHER, _CLS_TT) = range(10)

_TIME_DTS = tuple(
    "http://www.w3.org/2001/XMLSchema#" + s
    for s in ("dateTime", "dateTimeStamp", "date"))

_BOOL_EXPR_TAGS = frozenset(
    {"cmp", "and", "or", "not", "bound", "inlist", "regex", "regex_str",
     "regex_dyn", "strstarts", "strends", "contains", "isiri",
     "isliteral", "isblank", "istriple", "haslang", "haslangdir",
     "langmatches", "exists_marker", "evenint"})


def _epoch_of(s):
    """ISO-8601 lexical form → POSIX seconds, or None when ill-formed.
    Timezone-less values are anchored at UTC (one consistent instant —
    comparisons between two timezone-less values are exact)."""
    from datetime import datetime, timedelta, timezone

    try:
        if s.endswith("Z"):
            s = s[:-1] + "+00:00"
        if "T24:00:00" in s:
            # XSD end-of-day form: 24:00:00 = next day's 00:00:00
            date_part, _, rest = s.partition("T24:00:00")
            nxt = (datetime.fromisoformat(date_part)
                   + timedelta(days=1)).date().isoformat()
            s = nxt + "T00:00:00" + rest.lstrip("0.") if rest.startswith(
                ".") else nxt + "T00:00:00" + rest
        d = datetime.fromisoformat(s)
    except (ValueError, TypeError):
        return None
    if d.tzinfo is None:
        d = d.replace(tzinfo=timezone.utc)
    return d.timestamp()


def _i8(x: int):
    return pa.scalar(x, pa.int8())


def _classify_var(v: str, t: pa.Table) -> dict:
    from ..model import KIND_BNODE, KIND_IRI, KIND_LITERAL, XSD_NS, XSD_STRING

    n = t.num_rows
    names = t.schema.names
    lex = _var_col(t, v)
    kc, dc, lc = v + "__kind", v + "__dt", v + "__lang"
    num_ok = pc.fill_null(pc.match_substring_regex(lex, _NUM_RE), False)
    numf = pc.cast(
        pc.if_else(num_ok, lex, pa.scalar(None, lex.type)), pa.float64())
    if kc not in names and dc not in names:
        return {
            "lex": lex,
            "cls": pa.array([_CLS_UNTYPED] * n, pa.int8()),
            "dt": pa.array([""] * n, pa.large_string()),
            "lang": pa.array([""] * n, pa.large_string()),
            "num": numf,
            "tz": pa.array([False] * n),
            "tprim": pa.array([-1] * n, pa.int8()),
        }
    kind = (t[kc].combine_chunks() if kc in names
            else pa.array([KIND_LITERAL] * n, pa.int8()))
    kind = pc.fill_null(kind, KIND_LITERAL)
    dt = (pc.fill_null(t[dc].combine_chunks().cast(pa.large_string()), "")
          if dc in names else pa.array([""] * n, pa.large_string()))
    lang = (pc.utf8_lower(pc.fill_null(
        t[lc].combine_chunks().cast(pa.large_string()), ""))
        if lc in names else pa.array([""] * n, pa.large_string()))
    num_dt = pc.is_in(
        dt, value_set=pa.array(sorted(_NUMERIC_DTS), pa.large_string()))
    bool_dt = pc.equal(dt, XSD_NS + "boolean")
    time_dt = pc.is_in(dt, value_set=pa.array(_TIME_DTS, pa.large_string()))
    bool_ok = pc.fill_null(pc.is_in(
        lex, value_set=pa.array(["true", "false", "0", "1"], lex.type)),
        False)
    if pc.any(time_dt).as_py():
        mask = time_dt.to_pylist()
        ep = pa.array(
            [_epoch_of(s) if (m and s is not None) else None
             for s, m in zip(lex.to_pylist(), mask)],
            pa.float64())
    else:
        ep = pa.nulls(n, pa.float64())
    cls = pa.array([_CLS_OTHER] * n, pa.int8())
    cls = pc.if_else(
        pc.and_(pc.equal(dt, ""), pc.equal(lang, "")),
        _i8(_CLS_UNTYPED), cls)
    cls = pc.if_else(pc.equal(dt, XSD_STRING), _i8(_CLS_STR), cls)
    cls = pc.if_else(pc.and_(time_dt, pc.is_valid(ep)), _i8(_CLS_TIME), cls)
    cls = pc.if_else(pc.and_(bool_dt, bool_ok), _i8(_CLS_BOOL), cls)
    cls = pc.if_else(pc.and_(num_dt, num_ok), _i8(_CLS_NUM), cls)
    cls = pc.if_else(pc.and_(num_dt, pc.invert(num_ok)), _i8(_CLS_OTHER), cls)
    cls = pc.if_else(pc.not_equal(lang, ""), _i8(_CLS_LANG), cls)
    cls = pc.if_else(
        pc.equal(kind, _i8(KIND_BNODE)), _i8(_CLS_BNODE), cls)
    cls = pc.if_else(pc.equal(kind, _i8(KIND_IRI)), _i8(_CLS_IRI), cls)
    from ..model import KIND_TRIPLE_TERM

    cls = pc.if_else(
        pc.equal(kind, _i8(KIND_TRIPLE_TERM)), _i8(_CLS_TT), cls)
    bool_num = pc.cast(pc.fill_null(pc.is_in(
        lex, value_set=pa.array(["true", "1"], lex.type)), False),
        pa.float64())
    num = pc.if_else(
        pc.or_(pc.equal(cls, _i8(_CLS_NUM)),
               pc.and_(pc.equal(cls, _i8(_CLS_UNTYPED)), num_ok)),
        numf,
        pc.if_else(
            pc.equal(cls, _i8(_CLS_BOOL)), bool_num,
            pc.if_else(pc.equal(cls, _i8(_CLS_TIME)), ep,
                       pa.scalar(None, pa.float64()))))
    tzb = pc.fill_null(
        pc.match_substring_regex(lex, r"(Z|[+-]\d\d:\d\d)$"), False)
    tprim = pc.if_else(
        pc.is_in(dt, value_set=pa.array(_TIME_DTS[:2], pa.large_string())),
        _i8(0),
        pc.if_else(pc.equal(dt, _TIME_DTS[2]), _i8(1), _i8(-1)))
    return {"lex": lex, "cls": cls, "dt": dt, "lang": lang, "num": num,
            "tz": tzb, "tprim": tprim}


def _classify_term_arrays(lex, kind, dt, lang) -> dict:
    """Classify per-row term arrays (lex, kind, dt, lang) — reuses the
    variable classifier over a synthesized one-variable table."""
    tmp = pa.table({"__x": lex, "__x__kind": kind,
                    "__x__dt": dt, "__x__lang": lang})
    return _classify_var("__x", tmp)


def _cls_to_kind(c: int) -> int:
    from ..model import (KIND_BNODE, KIND_IRI, KIND_LITERAL,
                         KIND_TRIPLE_TERM)

    if c == _CLS_IRI:
        return KIND_IRI
    if c == _CLS_BNODE:
        return KIND_BNODE
    if c == _CLS_TT:
        return KIND_TRIPLE_TERM
    return KIND_LITERAL


def _tt_term_arrays(node, t: pa.Table):
    """Evaluate an RDF 1.2 triple-term expression node per row →
    (lex, kind, dt, lang) arrays (SPARQL 1.2 TRIPLE()/`<<( )>>` and
    SUBJECT/PREDICATE/OBJECT accessors; errors → null rows)."""
    from ..model import (KIND_BNODE, KIND_IRI, KIND_TRIPLE_TERM,
                         RDF_LANGSTRING)
    from ..rdf.tripleterm import parse_tt, serialize_tt

    n = t.num_rows
    if node[0] == "tripleexpr":
        sides = [_eq_side(x, t) for x in node[1:4]]
        cols = []
        for S in sides:
            cols.append((S["lex"].to_pylist(), S["cls"].to_pylist(),
                         S["dt"].to_pylist(), S["lang"].to_pylist()))
        lex_out: list = []
        for i in range(n):
            sl, sc = cols[0][0][i], cols[0][1][i]
            pl, pcl = cols[1][0][i], cols[1][1][i]
            ol, ocl = cols[2][0][i], cols[2][1][i]
            if (sl is None or pl is None or ol is None
                    or pcl != _CLS_IRI
                    or sc not in (_CLS_IRI, _CLS_BNODE, _CLS_TT)):
                lex_out.append(None)
                continue
            if sc == _CLS_TT:
                # a triple term cannot be a subject (RDF 1.2)
                lex_out.append(None)
                continue
            o_dt = cols[2][2][i] or ""
            o_lang = cols[2][3][i] or ""
            if o_lang and not o_dt:
                o_dt = RDF_LANGSTRING
            lex_out.append(serialize_tt(
                (_cls_to_kind(sc), sl, "", ""),
                (KIND_IRI, pl, "", ""),
                (_cls_to_kind(ocl), ol,
                 "" if ocl in (_CLS_IRI, _CLS_BNODE, _CLS_TT) else o_dt,
                 "" if ocl in (_CLS_IRI, _CLS_BNODE, _CLS_TT) else o_lang)))
        lex = pa.array(lex_out, pa.large_string())
        kind = pc.if_else(pc.is_valid(lex),
                          pa.scalar(KIND_TRIPLE_TERM, pa.int8()),
                          pa.scalar(None, pa.int8()))
        empty = pa.array([""] * n, pa.large_string())
        return lex, kind, empty, empty
    # ("ttcomp", "s"|"p"|"o", expr)
    which = node[1]
    S = _eq_side(node[2], t)
    lexes = S["lex"].to_pylist()
    clss = S["cls"].to_pylist()
    out_l: list = []
    out_k: list = []
    out_d: list = []
    out_g: list = []
    for i in range(n):
        if clss[i] != _CLS_TT or lexes[i] is None:
            out_l.append(None)
            out_k.append(None)
            out_d.append("")
            out_g.append("")
            continue
        try:
            s_, p_, o_ = parse_tt(lexes[i])
        except Exception:
            out_l.append(None)
            out_k.append(None)
            out_d.append("")
            out_g.append("")
            continue
        comp = {"s": s_, "p": (KIND_IRI, p_[1], "", ""), "o": o_}[which]
        out_l.append(comp[1])
        out_k.append(comp[0])
        out_d.append(comp[2] or "")
        out_g.append(comp[3] or "")
    return (pa.array(out_l, pa.large_string()),
            pa.array(out_k, pa.int8()),
            pa.array(out_d, pa.large_string()),
            pa.array(out_g, pa.large_string()))


def _eq_side(node, t: pa.Table) -> dict:
    from ..model import XSD_NS, XSD_STRING

    n = t.num_rows
    tag = node[0]

    def const(lex, cls, dt="", lang="", num=None):
        import re as _re

        tz = bool(_re.search(r"(Z|[+-]\d\d:\d\d)$", lex)) if cls == _CLS_TIME \
            else False
        tprim = -1
        if cls == _CLS_TIME:
            tprim = 1 if dt == _TIME_DTS[2] else 0
        return {
            "lex": pa.array([lex] * n, pa.large_string()),
            "cls": pa.array([cls] * n, pa.int8()),
            "dt": pa.array([dt] * n, pa.large_string()),
            "lang": pa.array([lang.lower()] * n, pa.large_string()),
            "num": pa.array([num] * n, pa.float64()),
            "tz": pa.array([tz] * n),
            "tprim": pa.array([tprim] * n, pa.int8()),
        }

    if tag == "lit":
        return const(node[1], _CLS_STR)
    if tag == "iriconst":
        return const(node[1], _CLS_IRI)
    if tag == "num":
        x = node[1]
        lex = str(int(x)) if x == int(x) else str(x)
        dt = node[2] if len(node) > 2 and node[2] else XSD_NS + "decimal"
        return const(lex, _CLS_NUM, dt=dt, num=float(x))
    if tag == "typedlit":
        lex, dt, lang = node[1], node[2], node[3]
        if lang:
            return const(lex, _CLS_LANG, lang=lang)
        if dt in _NUMERIC_DTS:
            try:
                return const(lex, _CLS_NUM, dt=dt, num=float(lex))
            except ValueError:
                return const(lex, _CLS_OTHER, dt=dt)
        if dt == XSD_NS + "boolean":
            if lex in ("true", "1"):
                return const(lex, _CLS_BOOL, dt=dt, num=1.0)
            if lex in ("false", "0"):
                return const(lex, _CLS_BOOL, dt=dt, num=0.0)
            return const(lex, _CLS_OTHER, dt=dt)
        if dt in _TIME_DTS:
            e = _epoch_of(lex)
            return const(lex, _CLS_TIME if e is not None else _CLS_OTHER,
                         dt=dt, num=e)
        if dt in ("", XSD_STRING):
            return const(lex, _CLS_STR, dt=dt)
        return const(lex, _CLS_OTHER, dt=dt)
    if tag == "var":
        return _classify_var(node[1], t)
    if tag in ("tripleexpr", "ttcomp"):
        lex3, kind3, dt3, lang3 = _tt_term_arrays(node, t)
        return _classify_term_arrays(lex3, kind3, dt3, lang3)
    if tag == "bnodefn":
        val = _eval_value(node, t)
        lex = _to_lexical(val, n)
        if isinstance(lex, pa.Scalar):
            lex = pa.array([lex.as_py()] * n, pa.large_string())
        if isinstance(lex, pa.ChunkedArray):
            lex = lex.combine_chunks()
        return {"lex": lex,
                "cls": pa.array([_CLS_BNODE] * n, pa.int8()),
                "dt": pa.array([""] * n, pa.large_string()),
                "lang": pa.array([""] * n, pa.large_string()),
                "num": pa.nulls(n, pa.float64())}
    if tag == "cdtfn":
        empty = pa.array([""] * n, pa.large_string())
        val = _eval_cdtfn(node, t)
        if node[1] == "size":
            lex = _to_lexical(val, n)
            if isinstance(lex, pa.ChunkedArray):
                lex = lex.combine_chunks()
            return {"lex": lex,
                    "cls": pc.if_else(pc.is_valid(val), _i8(_CLS_NUM),
                                      _i8(_CLS_OTHER)),
                    "dt": pa.array([XSD_NS + "integer"] * n,
                                   pa.large_string()),
                    "lang": empty, "num": val}
        if node[1] in ("contains", "containsKey", "containsTerm"):
            lexb = pc.if_else(
                val, pa.scalar("true", pa.large_string()),
                pa.scalar("false", pa.large_string()))
            return {"lex": lexb,
                    "cls": pa.array([_CLS_BOOL] * n, pa.int8()),
                    "dt": pa.array([XSD_NS + "boolean"] * n,
                                   pa.large_string()),
                    "lang": empty, "num": pc.cast(val, pa.float64())}
        static = _expr_static_meta(node)
        dtv = static[1] if static else ""
        if dtv:  # CDT composite output: typed, no numeric value
            return {"lex": val,
                    "cls": pa.array([_CLS_OTHER] * n, pa.int8()),
                    "dt": pa.array([dtv] * n, pa.large_string()),
                    "lang": empty, "num": pa.nulls(n, pa.float64())}
        # get/head: dynamic element type — re-evaluate with per-row
        # term metadata and classify each row by its own kind/dt/lang
        lex2, kind2, dt2, lang2 = _eval_cdtfn(node, t, with_meta=True)
        return _classify_term_arrays(lex2, kind2, dt2, lang2)
    # computed expression → static class by producing tag
    val = _eval_value(node, t)
    lex = _to_lexical(val, n)
    if isinstance(lex, pa.Scalar):
        lex = pa.array([lex.as_py()] * n, pa.large_string())
    if isinstance(lex, pa.ChunkedArray):
        lex = lex.combine_chunks()
    empty_dt = pa.array([""] * n, pa.large_string())
    empty_lang = pa.array([""] * n, pa.large_string())
    if _is_numeric_node(node):
        numv = _num_or_null(node, t, val, strict=True)
        if isinstance(numv, pa.Scalar):
            numv = pa.array([numv.as_py()] * n, pa.float64())
        if isinstance(numv, pa.ChunkedArray):
            numv = numv.combine_chunks()
        cls = pc.if_else(pc.is_valid(numv), _i8(_CLS_NUM), _i8(_CLS_OTHER))
        return {"lex": lex, "cls": cls, "dt": empty_dt, "lang": empty_lang,
                "num": numv}
    if tag in ("datatype", "datatype_expr"):
        return {"lex": lex,
                "cls": pa.array([_CLS_IRI] * n, pa.int8()),
                "dt": empty_dt, "lang": empty_lang,
                "num": pa.nulls(n, pa.float64())}
    if tag in ("strlang", "strlangdir"):
        lang = node[2].lower()
        if tag == "strlangdir":
            lang = f"{lang}--{node[3]}"
        return {"lex": lex,
                "cls": pc.if_else(pc.is_valid(lex), _i8(_CLS_LANG),
                                  _i8(_CLS_OTHER)),
                "dt": empty_dt,
                "lang": pa.array([lang] * n, pa.large_string()),
                "num": pa.nulls(n, pa.float64())}
    if tag == "strdt":
        sub = ("typedlit", "", node[2], "")
        num_ok = pc.fill_null(pc.match_substring_regex(lex, _NUM_RE), False)
        numv = pc.cast(pc.if_else(num_ok, lex, pa.scalar(None, lex.type)),
                       pa.float64())
        if node[2] in _NUMERIC_DTS:
            cls = pc.if_else(num_ok, _i8(_CLS_NUM), _i8(_CLS_OTHER))
        elif node[2] in ("", XSD_STRING):
            cls = pa.array([_CLS_STR] * n, pa.int8())
        else:
            cls = pa.array([_CLS_OTHER] * n, pa.int8())
        return {"lex": lex, "cls": cls,
                "dt": pa.array([node[2]] * n, pa.large_string()),
                "lang": empty_lang, "num": numv}
    if tag in _BOOL_EXPR_TAGS:
        num = pc.cast(
            pc.fill_null(pc.equal(lex, "true"), False), pa.float64())
        return {"lex": lex,
                "cls": pa.array([_CLS_BOOL] * n, pa.int8()),
                "dt": empty_dt, "lang": empty_lang, "num": num}
    return {"lex": lex,
            "cls": pa.array([_CLS_STR] * n, pa.int8()),
            "dt": empty_dt, "lang": empty_lang,
            "num": pa.nulls(n, pa.float64())}


def _side_tz(S: dict, n: int):
    return S.get("tz") if S.get("tz") is not None else pa.array([False] * n)


def _side_tprim(S: dict, n: int):
    return (S.get("tprim") if S.get("tprim") is not None
            else pa.array([-1] * n, pa.int8()))


def _term_eq(op: str, l, r, t: pa.Table):
    """`=` / `!=` with nulls for type errors (3-valued logic)."""
    L, R = _eq_side(l, t), _eq_side(r, t)
    cl, cr = L["cls"], R["cls"]

    def both(a):
        return pc.and_(pc.equal(cl, _i8(a)), pc.equal(cr, _i8(a)))

    def pairm(a, b):
        return pc.or_(
            pc.and_(pc.equal(cl, _i8(a)), pc.equal(cr, _i8(b))),
            pc.and_(pc.equal(cl, _i8(b)), pc.equal(cr, _i8(a))))

    lex_eq = pc.fill_null(pc.equal(L["lex"], R["lex"]), False)
    dt_eq = pc.fill_null(pc.equal(L["dt"], R["dt"]), False)
    lang_eq = pc.fill_null(pc.equal(L["lang"], R["lang"]), False)
    num_eq = pc.fill_null(pc.equal(L["num"], R["num"]), False)
    same_term = pc.and_(pc.and_(lex_eq, dt_eq),
                        pc.and_(lang_eq, pc.equal(cl, cr)))

    n = t.num_rows
    acc = pa.nulls(n, pa.bool_())  # default: incomparable → error
    is_nonlit_l = pc.or_(pc.equal(cl, _i8(_CLS_IRI)),
                         pc.equal(cl, _i8(_CLS_BNODE)))
    is_nonlit_r = pc.or_(pc.equal(cr, _i8(_CLS_IRI)),
                         pc.equal(cr, _i8(_CLS_BNODE)))
    mixed_nonlit = pc.and_(
        pc.or_(is_nonlit_l, is_nonlit_r),
        pc.invert(pc.or_(both(_CLS_IRI), both(_CLS_BNODE))))
    acc = pc.if_else(mixed_nonlit, pa.scalar(False), acc)
    acc = pc.if_else(pc.or_(both(_CLS_IRI), both(_CLS_BNODE)), lex_eq, acc)
    # a lang-tagged literal never equals a literal of another class
    lang_mixed = pc.and_(
        pc.invert(pc.or_(is_nonlit_l, is_nonlit_r)),
        pc.and_(pc.invert(both(_CLS_LANG)),
                pc.or_(pc.equal(cl, _i8(_CLS_LANG)),
                       pc.equal(cr, _i8(_CLS_LANG)))))
    acc = pc.if_else(lang_mixed, pa.scalar(False), acc)
    acc = pc.if_else(both(_CLS_LANG), pc.and_(lex_eq, lang_eq), acc)
    # two literals in KNOWN but DIFFERENT value spaces are definitively
    # unequal (Jena NodeValue.sameValueAs / ValueSpace.VSPACE_DIFFERENT:
    # "Other" != true, 1 != true — ARQ ExprDatatypes dt-query-3/4);
    # only an UNKNOWN datatype keeps the open-world type error
    known_set = pa.array(
        [_CLS_STR, _CLS_NUM, _CLS_BOOL, _CLS_TIME], pa.int8())
    diff_known = pc.and_(
        pc.and_(
            pc.fill_null(pc.is_in(cl, value_set=known_set), False),
            pc.fill_null(pc.is_in(cr, value_set=known_set), False)),
        pc.not_equal(cl, cr))
    acc = pc.if_else(diff_known, pa.scalar(False), acc)
    str_pair = pc.or_(
        pc.or_(both(_CLS_STR), both(_CLS_UNTYPED)),
        pairm(_CLS_STR, _CLS_UNTYPED))
    acc = pc.if_else(str_pair, lex_eq, acc)
    value_pair = pc.or_(both(_CLS_NUM), both(_CLS_BOOL))
    acc = pc.if_else(value_pair, num_eq, acc)
    # temporal values: a date never equals a dateTime (disjoint primitive
    # value spaces → definitively unequal); mixed timezone-ness is
    # indeterminate inside the XSD ±14-hour window (F&O comparison
    # rule), definitive outside
    prim_eq = pc.equal(_side_tprim(L, n), _side_tprim(R, n))
    tz_ok = pc.or_(
        pc.equal(_side_tz(L, n), _side_tz(R, n)),
        pc.fill_null(pc.greater(
            pc.abs(pc.subtract(L["num"], R["num"])), 50400.0), False))
    acc = pc.if_else(
        both(_CLS_TIME),
        pc.if_else(
            prim_eq,
            pc.if_else(tz_ok, num_eq, pa.scalar(None, pa.bool_())),
            pa.scalar(False)),
        acc)
    # engine tabular convention: an UNTYPED side (metadata-free
    # relation — aggregates, tabular data) compares lexically against
    # any term kind, and by value against numbers
    untyped_any = pc.or_(pc.equal(cl, _i8(_CLS_UNTYPED)),
                         pc.equal(cr, _i8(_CLS_UNTYPED)))
    acc = pc.if_else(untyped_any, lex_eq, acc)
    acc = pc.if_else(pairm(_CLS_UNTYPED, _CLS_NUM), num_eq, acc)
    # CDT composite literals (the fork's cdt:List / cdt:Map VALUE
    # space, CompositeDatatypeList.java): equal iff canonical forms
    # equal; ill-formed lexicals are a type error. Per-row structural
    # compare, only on rows where both sides carry a CDT datatype.
    from ..rdf.cdt import CDT_LIST, CDT_MAP, cdt_same_value

    cdt_set = pa.array([CDT_LIST, CDT_MAP], pa.large_string())
    cdt_mask = pc.fill_null(pc.and_(
        pc.is_in(L["dt"], value_set=cdt_set),
        pc.is_in(R["dt"], value_set=cdt_set)), False)
    if pc.any(cdt_mask).as_py():
        ll, rr = L["lex"].to_pylist(), R["lex"].to_pylist()
        ld, rd = L["dt"].to_pylist(), R["dt"].to_pylist()
        vals: list = []
        for i, m in enumerate(cdt_mask.to_pylist()):
            if not m:
                vals.append(None)
                continue
            if ld[i] != rd[i]:
                vals.append(False)
                continue
            try:
                vals.append(cdt_same_value(ll[i], rr[i], ld[i]))
            except Exception:
                vals.append(None)  # unknown / ill-formed → error
        acc = pc.if_else(cdt_mask, pa.array(vals, pa.bool_()), acc)
    # RDF 1.2 triple terms: component-wise VALUE equality (SPARQL 1.2
    # §17.4.1.7); a triple term never equals a non-triple-term
    tt_l, tt_r = pc.equal(cl, _i8(_CLS_TT)), pc.equal(cr, _i8(_CLS_TT))
    tt_mixed = pc.and_(pc.or_(tt_l, tt_r), pc.invert(both(_CLS_TT)))
    acc = pc.if_else(tt_mixed, pa.scalar(False), acc)
    tt_mask = pc.fill_null(both(_CLS_TT), False)
    if pc.any(tt_mask).as_py():
        from ..rdf.tripleterm import tt_same_value

        ll, rr = L["lex"].to_pylist(), R["lex"].to_pylist()
        vals2: list = []
        for i, m in enumerate(tt_mask.to_pylist()):
            if not m:
                vals2.append(None)
                continue
            try:
                vals2.append(tt_same_value(ll[i], rr[i]))
            except Exception:
                vals2.append(None)  # unknown → type error
        acc = pc.if_else(tt_mask, pa.array(vals2, pa.bool_()), acc)
    acc = pc.if_else(same_term, pa.scalar(True), acc)
    bound = pc.and_(pc.is_valid(L["lex"]), pc.is_valid(R["lex"]))
    acc = pc.if_else(bound, acc, pa.scalar(None, pa.bool_()))
    return acc if op == "=" else pc.invert(acc)


def _term_ord(op: str, l, r, t: pa.Table):
    """`<` `>` `<=` `>=` outside the numeric context: operator-mapping
    comparison per value-space class (XPath fn:compare / op:numeric-*
    via NodeValue.compare); pairs with no ordered value space in common
    are type errors (null)."""
    L, R = _eq_side(l, t), _eq_side(r, t)
    cl, cr = L["cls"], R["cls"]
    n = t.num_rows

    def both(a):
        return pc.and_(pc.equal(cl, _i8(a)), pc.equal(cr, _i8(a)))

    def pairm(a, b):
        return pc.or_(
            pc.and_(pc.equal(cl, _i8(a)), pc.equal(cr, _i8(b))),
            pc.and_(pc.equal(cl, _i8(b)), pc.equal(cr, _i8(a))))

    num_cmp = _CMP[op](L["num"], R["num"])
    lex_cmp = _CMP[op](L["lex"], R["lex"])
    acc = pa.nulls(n, pa.bool_())
    # strings (and the untyped tabular bridge) order by codepoint
    str_pair = pc.or_(
        pc.or_(both(_CLS_STR), both(_CLS_UNTYPED)),
        pairm(_CLS_STR, _CLS_UNTYPED))
    acc = pc.if_else(str_pair, lex_cmp, acc)
    num_pair = pc.or_(both(_CLS_NUM), pairm(_CLS_NUM, _CLS_UNTYPED))
    acc = pc.if_else(num_pair, num_cmp, acc)
    acc = pc.if_else(both(_CLS_BOOL), num_cmp, acc)
    time_ok = pc.and_(
        pc.equal(_side_tprim(L, n), _side_tprim(R, n)),
        pc.or_(pc.equal(_side_tz(L, n), _side_tz(R, n)),
               pc.fill_null(pc.greater(
                   pc.abs(pc.subtract(L["num"], R["num"])), 50400.0),
                   False)))
    acc = pc.if_else(
        both(_CLS_TIME),
        pc.if_else(time_ok, num_cmp, pa.scalar(None, pa.bool_())),
        acc)
    # CDT composite literals: the fork's list/map less-than semantics
    # (CompositeDatatypeList/Map.compare, sortOrderingCompare=false);
    # incomparable pairs / ill-formed lexicals stay type errors (null)
    from ..rdf.cdt import CDT_LIST, CDT_MAP, cdt_compare

    cdt_set = pa.array([CDT_LIST, CDT_MAP], pa.large_string())
    cdt_mask = pc.fill_null(pc.and_(
        pc.is_in(L["dt"], value_set=cdt_set),
        pc.is_in(R["dt"], value_set=cdt_set)), False)
    if pc.any(cdt_mask).as_py():
        ll, rr = L["lex"].to_pylist(), R["lex"].to_pylist()
        ld, rd = L["dt"].to_pylist(), R["dt"].to_pylist()
        vals: list = []
        for i, m in enumerate(cdt_mask.to_pylist()):
            if not m or ld[i] != rd[i]:
                vals.append(None)
                continue
            try:
                c = cdt_compare(ll[i], rr[i], ld[i])
            except Exception:
                vals.append(None)
                continue
            vals.append({"<": c < 0, "<=": c <= 0,
                         ">": c > 0, ">=": c >= 0}[op])
        acc = pc.if_else(cdt_mask, pa.array(vals, pa.bool_()), acc)
    # RDF 1.2 triple terms: the first component pair not value-equal
    # decides, and must itself be operator-orderable (else type error)
    tt_mask = pc.fill_null(
        pc.and_(pc.equal(cl, _i8(_CLS_TT)), pc.equal(cr, _i8(_CLS_TT))),
        False)
    if pc.any(tt_mask).as_py():
        from ..rdf.tripleterm import tt_compare_op

        ll, rr = L["lex"].to_pylist(), R["lex"].to_pylist()
        vals3: list = []
        for i, m in enumerate(tt_mask.to_pylist()):
            if not m:
                vals3.append(None)
                continue
            try:
                c = tt_compare_op(ll[i], rr[i])
            except Exception:
                vals3.append(None)
                continue
            vals3.append({"<": c < 0, "<=": c <= 0,
                          ">": c > 0, ">=": c >= 0}[op])
        acc = pc.if_else(tt_mask, pa.array(vals3, pa.bool_()), acc)
    if op in ("<=", ">="):
        # A <= B holds whenever A = B holds (RDFterm-equal), even for
        # term kinds with no `<` order — IRIs, bnodes, triple terms
        # (SPARQL 1.2 operator mapping; Jena NodeValue.compare).
        # NOT for CDT literals: their own branch above already applied
        # sortOrderingCompare, and `<=` on lists with blank-node
        # elements must stay a type error even when `=` would hold
        # (SPARQL-CDTs list-less-equal-28/29)
        eq_true = pc.fill_null(_term_eq("=", l, r, t), False)
        eq_true = pc.and_(eq_true, pc.invert(cdt_mask))
        acc = pc.if_else(eq_true, pa.scalar(True), acc)
    bound = pc.and_(pc.is_valid(L["lex"]), pc.is_valid(R["lex"]))
    return pc.if_else(bound, acc, pa.scalar(None, pa.bool_()))


def _ebv(node, t: pa.Table):
    """Effective boolean value of a value expression in boolean position
    (XSDFuncOp.booleanEffectiveValue, SPARQL 17.2.2): boolean literals by
    value, numeric literals true iff non-zero/non-NaN (ill-formed →
    false), string-ish literals true iff non-empty; IRIs/bnodes/unbound/
    unknown datatypes are type errors → false in a FILTER."""
    from ..model import KIND_LITERAL, XSD_NS, XSD_STRING

    n = t.num_rows
    if node[0] == "typedlit":
        if node[2] == XSD_NS + "boolean":
            return pa.array([node[1] in ("true", "1")] * n)
        if node[2] in _NUMERIC_DTS:
            try:
                x = float(node[1])
                return pa.array([x == x and x != 0] * n)
            except ValueError:
                return pa.array([False] * n)
    val = _eval_value(node, t)
    if isinstance(val, pa.Scalar):
        x = val.as_py()
        if x is None:
            return pa.array([None] * n, pa.bool_())
        if isinstance(x, (int, float)):
            return pa.array([bool(x == x and x != 0)] * n)
        return pa.array([len(str(x)) > 0] * n)
    arr = val.combine_chunks() if isinstance(val, pa.ChunkedArray) else val
    if pa.types.is_floating(arr.type) or pa.types.is_integer(arr.type):
        f = pc.cast(arr, pa.float64())
        return pc.fill_null(
            pc.and_(pc.invert(pc.is_nan(f)), pc.not_equal(f, 0.0)), False)
    arr = arr.cast(pa.large_string())
    names = t.schema.names
    if node[0] == "var" and node[1] + "__dt" in names:
        dt = pc.fill_null(
            t[node[1] + "__dt"].combine_chunks().cast(pa.large_string()), "")
        lang = (
            pc.fill_null(
                t[node[1] + "__lang"].combine_chunks().cast(pa.large_string()),
                "")
            if node[1] + "__lang" in names
            else pa.array([""] * n, pa.large_string())
        )
        kind = (
            t[node[1] + "__kind"].combine_chunks()
            if node[1] + "__kind" in names
            else pa.array([KIND_LITERAL] * n, pa.int8())
        )
        is_lit = pc.fill_null(
            pc.equal(kind, pa.scalar(KIND_LITERAL, pa.int8())), True)
        bool_dt = pc.equal(dt, XSD_NS + "boolean")
        num_dt = pc.is_in(
            dt, value_set=pa.array(sorted(_NUMERIC_DTS), pa.large_string()))
        # lang-tagged literals have NO effective boolean value (the
        # SPARQL 1.2 EBV table: only xsd:boolean, numerics, and
        # xsd:string/simple literals — not-not test)
        plainish = pc.and_(
            pc.or_(pc.equal(dt, ""), pc.equal(dt, XSD_STRING)),
            pc.equal(lang, ""),
        )
        num_ok = pc.fill_null(pc.match_substring_regex(arr, _NUM_RE), False)
        numv = pc.cast(
            pc.if_else(num_ok, arr, pa.scalar(None, arr.type)), pa.float64())
        # an ill-formed xsd:boolean is a type error (SPARQL 1.2 EBV)
        bool_res = pc.if_else(
            pc.fill_null(pc.is_in(arr, value_set=pa.array(
                ["true", "1", "false", "0"], arr.type)), False),
            pc.fill_null(pc.is_in(arr, value_set=pa.array(
                ["true", "1"], arr.type)), False),
            pa.scalar(None, pa.bool_()))
        num_res = pc.fill_null(pc.not_equal(numv, 0.0), False)
        str_res = pc.fill_null(pc.greater(pc.utf8_length(arr), 0), False)
        res = pc.if_else(
            bool_dt, bool_res,
            pc.if_else(
                num_dt, num_res,
                pc.if_else(plainish, str_res,
                           pa.scalar(None, pa.bool_()))))
        # type errors stay NULL (3-valued logic: `!` of an error is an
        # error, not true); the FILTER boundary fills null → false
        res = pc.if_else(is_lit, res, pa.scalar(None, pa.bool_()))
        return pc.if_else(pc.is_valid(arr), res, pa.scalar(None, pa.bool_()))
    # no term metadata: numeric-looking lexical forms by value, others
    # by non-emptiness
    num_ok = pc.fill_null(pc.match_substring_regex(arr, _NUM_RE), False)
    numv = pc.cast(
        pc.if_else(num_ok, arr, pa.scalar(None, arr.type)), pa.float64())
    res = pc.if_else(
        num_ok,
        pc.fill_null(pc.not_equal(numv, 0.0), False),
        pc.fill_null(pc.greater(pc.utf8_length(arr), 0), False),
    )
    return pc.if_else(pc.is_valid(arr), res, pa.scalar(None, pa.bool_()))


def _expr_static_meta(node):
    """(kind, dt, lang) a BIND of this expression should stamp on its
    variable, or None when the per-value numeric/lexical fallback
    applies. Drives DATATYPE/ISIRI/term-equality over bound vars."""
    from ..model import (KIND_BNODE, KIND_IRI, KIND_LITERAL, XSD_NS,
                         XSD_STRING)

    tag = node[0]
    if tag == "typedlit":
        return (KIND_LITERAL, node[2] or XSD_STRING, node[3])
    if tag == "rand":
        return (KIND_LITERAL, XSD_NS + "double", "")
    if tag == "dtfn":
        if node[1] == "tz":
            return (KIND_LITERAL, XSD_STRING, "")
        if node[1] == "timezone":
            return (KIND_LITERAL, XSD_NS + "dayTimeDuration", "")
        if node[1] == "seconds":
            return (KIND_LITERAL, XSD_NS + "decimal", "")
        return (KIND_LITERAL, XSD_NS + "integer", "")
    if tag == "uuid":
        return ((KIND_LITERAL, XSD_STRING, "") if node[1]
                else (KIND_IRI, "", ""))
    if tag == "irifn":
        return (KIND_IRI, "", "")
    if tag == "bnodefn":
        return (KIND_BNODE, "", "")
    if tag == "cast":
        return (KIND_LITERAL, node[1], "")
    if tag in ("hashfn", "encuri", "concat", "substr", "replace",
               "strbefore", "strafter", "strdt", "strlang", "strlangdir"):
        if tag == "strdt":
            return (KIND_LITERAL, node[2], "")
        if tag == "strlang":
            from ..model import RDF_LANGSTRING

            return (KIND_LITERAL, RDF_LANGSTRING, node[2])
        if tag == "strlangdir":
            from ..model import RDF_LANGSTRING

            return (KIND_LITERAL, RDF_LANGSTRING,
                    f"{node[2]}--{node[3]}")
        return (KIND_LITERAL, XSD_STRING, "")
    if tag == "tripleexpr":
        from ..model import KIND_TRIPLE_TERM

        return (KIND_TRIPLE_TERM, "", "")
    if tag == "fn1" and node[1] in ("STR", "UCASE", "LCASE"):
        return (KIND_LITERAL, XSD_STRING, "")
    if tag in ("normspace", "normuni", "fmtnum"):
        return (KIND_LITERAL, XSD_STRING, "")
    if tag == "mathfn":
        return (KIND_LITERAL, XSD_NS + "double", "")
    if tag == "durfn":
        return (KIND_LITERAL,
                XSD_NS + ("decimal" if node[1] == "seconds" else "integer"),
                "")
    if tag == "dtcombine":
        return (KIND_LITERAL, XSD_NS + "dateTime", "")
    if tag == "adjtz":
        return (KIND_LITERAL, XSD_NS + node[1], "")
    if tag in _BOOL_EXPR_TAGS:
        # BIND of a boolean expression yields an xsd:boolean value
        # (EBV of the bound var then follows boolean, not string, rules)
        return (KIND_LITERAL, XSD_NS + "boolean", "")
    if tag == "cdtfn":
        from ..rdf.cdt import CDT_LIST, CDT_MAP

        fn = node[1]
        if fn in ("concat", "tail", "keys", "reverse", "subseq", "List"):
            return (KIND_LITERAL, CDT_LIST, "")
        if fn == "size":
            return (KIND_LITERAL, XSD_NS + "integer", "")
        if fn in ("contains", "containsKey", "containsTerm"):
            return (KIND_LITERAL, XSD_NS + "boolean", "")
        if fn in ("put", "remove", "merge", "Map"):
            return (KIND_LITERAL, CDT_MAP, "")
        return None  # get/head: element type is dynamic
    return None


def _eval_mathfn(node, t: pa.Table):
    """("mathfn", name, [args]) — vectorized math kernels over the
    numeric context (XPath math: §4.8 / leviathan). All results are
    float64 (xsd:double); domain errors follow IEEE (NaN/Inf), argument
    type errors are null (expression error)."""
    import math as _m

    name, args = node[1], node[2]

    def num(i):
        v = _eval_num(args[i], t)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        if isinstance(v, pa.Scalar):
            v = pa.array([v.as_py()] * t.num_rows, pa.float64())
        return v.cast(pa.float64())

    if name == "rnd":
        import random

        lo, hi = 0.0, 1.0
        if len(args) == 1:
            hi = float(args[0][1]) if args[0][0] == "num" else 1.0
        elif len(args) == 2:
            lo = float(args[0][1]) if args[0][0] == "num" else 0.0
            hi = float(args[1][1]) if args[1][0] == "num" else 1.0
        return pa.array(
            [lo + random.random() * (hi - lo) for _ in range(t.num_rows)],
            pa.float64())
    if name in _MATH1 or name in ("deg2rad", "rad2deg", "reciprocal",
                                  "factorial", "sec", "cosec", "cot",
                                  "sec1", "cosec1", "cot1", "rhte"):
        x = num(0)
        if name == "exp":
            return pc.exp(x)
        if name == "exp10":
            return pc.power(pa.scalar(10.0, pa.float64()), x)
        if name == "log":
            return pc.ln(x)
        if name == "log10":
            return pc.log10(x)
        if name == "sqrt":
            return pc.sqrt(x)
        if name in ("sin", "cos", "tan", "asin", "acos", "atan"):
            return getattr(pc, name)(x)
        if name == "deg2rad":
            return pc.multiply(x, pa.scalar(_m.pi / 180.0, pa.float64()))
        if name == "rad2deg":
            return pc.multiply(x, pa.scalar(180.0 / _m.pi, pa.float64()))
        if name == "reciprocal":
            return pc.divide(pa.scalar(1.0, pa.float64()), x)
        if name == "sec":
            return pc.divide(pa.scalar(1.0, pa.float64()), pc.cos(x))
        if name == "cosec":
            return pc.divide(pa.scalar(1.0, pa.float64()), pc.sin(x))
        if name == "cot":
            return pc.divide(pc.cos(x), pc.sin(x))
        if name == "sec1":  # sec1.java: acos(1/x)
            return pc.acos(pc.divide(pa.scalar(1.0, pa.float64()), x))
        if name == "cosec1":
            return pc.asin(pc.divide(pa.scalar(1.0, pa.float64()), x))
        if name == "cot1":
            return pc.atan(pc.divide(pa.scalar(1.0, pa.float64()), x))
        if name == "rhte":  # fn:round-half-to-even
            prec = int(args[1][1]) if len(args) > 1 else 0
            return pc.round(x, prec, round_mode="half_to_even")
        # factorial.java: integer factorial; non-integral → error (null)
        out = []
        for v in x.to_pylist():
            if v is None or v != int(v) or v < 0 or v > 170:
                out.append(None)
            else:
                out.append(float(_m.factorial(int(v))))
        return pa.array(out, pa.float64())
    a, b = num(0), num(1)
    if name == "pow":
        return pc.power(a, b)
    if name == "atan2":
        return pc.atan2(a, b)
    if name == "logb":  # leviathan log(x, base)
        return pc.divide(pc.log10(a), pc.log10(b))
    if name == "root":  # root.java: a ** (1/b)
        return pc.power(a, pc.divide(pa.scalar(1.0, pa.float64()), b))
    if name == "pythagoras":
        return pc.sqrt(pc.add(pc.multiply(a, a), pc.multiply(b, b)))
    if name == "mod":
        # op:numeric-mod: result sign follows the dividend (fmod); a
        # zero divisor is an expression error
        import numpy as _np

        an = a.to_numpy(zero_copy_only=False)
        bn = b.to_numpy(zero_copy_only=False)
        with _np.errstate(all="ignore"):
            r = _np.fmod(an, bn)
        mask = _np.isnan(an) | _np.isnan(bn) | (bn == 0)
        return pa.array(_np.where(mask, _np.nan, r), pa.float64(),
                        mask=mask)
    if name == "idiv":
        # op:numeric-integer-divide: truncate toward zero; zero divisor
        # is an expression error
        import numpy as _np

        an = a.to_numpy(zero_copy_only=False)
        bn = b.to_numpy(zero_copy_only=False)
        with _np.errstate(all="ignore"):
            r = _np.trunc(an / bn)
        mask = _np.isnan(an) | _np.isnan(bn) | (bn == 0)
        return pa.array(_np.where(mask, _np.nan, r), pa.float64(),
                        mask=mask)
    if name == "cartesian":
        if len(args) == 4:
            dx = pc.subtract(a, num(2))
            dy = pc.subtract(b, num(3))
            return pc.sqrt(pc.add(pc.multiply(dx, dx),
                                  pc.multiply(dy, dy)))
        dx = pc.subtract(a, num(3))
        dy = pc.subtract(b, num(4))
        dz = pc.subtract(num(2), num(5))
        return pc.sqrt(pc.add(pc.add(pc.multiply(dx, dx),
                                     pc.multiply(dy, dy)),
                              pc.multiply(dz, dz)))
    raise RDFParseError(f"SPARQL: unknown mathfn {name}")


_DUR_RE = re.compile(
    r"^(-)?P(?:(\d+)Y)?(?:(\d+)M)?(?:(\d+)D)?"
    r"(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+(?:\.\d+)?)S)?)?$")


def _eval_durfn(node, t: pa.Table):
    """("durfn", component, e) — XPath duration component accessors
    (FN_YearsFromDuration.java et al.): components are NORMALIZED
    (hours-from-duration("PT36H") = 12) and all carry the duration's
    sign. seconds returns decimal, the rest integers (float64 here;
    the meta stamp picks the datatype)."""
    comp = node[1]
    arr = _to_lexical(_eval_value(node[2], t), t.num_rows)
    if isinstance(arr, pa.Scalar):
        arr = pa.array([arr.as_py()] * t.num_rows, pa.large_string())
    out = []
    for s in arr.to_pylist():
        m = _DUR_RE.match(s) if s is not None else None
        if m is None or not any(m.group(i) for i in range(2, 8)):
            out.append(None)
            continue
        neg = -1 if m.group(1) else 1
        months = int(m.group(2) or 0) * 12 + int(m.group(3) or 0)
        secs = (int(m.group(4) or 0) * 86400 + int(m.group(5) or 0) * 3600
                + int(m.group(6) or 0) * 60 + float(m.group(7) or 0))
        if comp == "years":
            out.append(neg * (months // 12))
        elif comp == "months":
            out.append(neg * (months % 12))
        elif comp == "days":
            out.append(neg * int(secs // 86400))
        elif comp == "hours":
            out.append(neg * int(secs % 86400 // 3600))
        elif comp == "minutes":
            out.append(neg * int(secs % 3600 // 60))
        else:  # seconds
            out.append(neg * (secs % 60))
    return pa.array(out, pa.float64())


def _eval_dtcombine(node, t: pa.Table):
    """("dtcombine", date, time) — fn:dateTime (FN_DateTime.java): join
    the date and time lexicals; the date's timezone wins when the time
    has none, mismatched explicit timezones are an error."""
    n = t.num_rows
    d = _to_lexical(_eval_value(node[1], t), n)
    tm = _to_lexical(_eval_value(node[2], t), n)
    if isinstance(d, pa.Scalar):
        d = pa.array([d.as_py()] * n, pa.large_string())
    if isinstance(tm, pa.Scalar):
        tm = pa.array([tm.as_py()] * n, pa.large_string())
    tz_re = re.compile(r"(Z|[+-]\d{2}:\d{2})$")
    out = []
    for dv, tv in zip(d.to_pylist(), tm.to_pylist()):
        if dv is None or tv is None:
            out.append(None)
            continue
        mdz = tz_re.search(dv)
        mtz = tz_re.search(tv)
        dz = mdz.group(1) if mdz else None
        tzs = mtz.group(1) if mtz else None
        if dz and tzs and dz != tzs:
            out.append(None)
            continue
        date_part = dv[:mdz.start()] if mdz else dv
        out.append(date_part + "T" + (tv if tzs else tv + (dz or "")))
    return pa.array(out, pa.large_string())


def _eval_adjtz(node, t: pa.Table):
    """("adjtz", kind, e, tz) — fn:adjust-*-to-timezone
    (FN_AdjustDatetimeToTimezone.java): shift a zoned value to the
    target zone; stamp a zone-less value with it. tz=None means the
    implicit timezone (UTC for this engine)."""
    from datetime import datetime, timedelta, timezone as _tzmod

    kind, tzlex = node[1], node[3]
    if tzlex is None:
        delta = timedelta(0)
    else:
        m = _DUR_RE.match(tzlex)
        if m is None:
            return pa.nulls(t.num_rows, pa.large_string())
        sign = -1 if m.group(1) else 1
        delta = sign * timedelta(
            hours=int(m.group(5) or 0), minutes=int(m.group(6) or 0))
    tzinfo = _tzmod(delta)

    def _suffix(d: datetime) -> str:
        secs = int(d.utcoffset().total_seconds())
        if secs == 0:
            return "Z"
        sign = "-" if secs < 0 else "+"
        secs = abs(secs)
        return f"{sign}{secs // 3600:02d}:{(secs % 3600) // 60:02d}"

    tz_re = re.compile(r"(Z|[+-]\d{2}:\d{2})$")
    arr = _to_lexical(_eval_value(node[2], t), t.num_rows)
    if isinstance(arr, pa.Scalar):
        arr = pa.array([arr.as_py()] * t.num_rows, pa.large_string())
    out = []
    for s in arr.to_pylist():
        if s is None:
            out.append(None)
            continue
        m = tz_re.search(s)
        stz = m.group(1) if m else None
        core = s[:m.start()] if m else s
        if kind == "time":
            core = "2000-01-01T" + core
        elif kind == "date":
            core = core + "T00:00:00"
        if stz:
            core += "+00:00" if stz == "Z" else stz
        try:
            d = datetime.fromisoformat(core)
        except (ValueError, TypeError):
            out.append(None)
            continue
        d = d.replace(tzinfo=tzinfo) if d.tzinfo is None \
            else d.astimezone(tzinfo)
        suffix = _suffix(d)
        iso = d.isoformat()
        if kind == "date":
            out.append(iso[:10] + suffix)
        elif kind == "time":
            sec_part = iso[11:19] + (iso[19:].split("+")[0].split("-")[0]
                                     if "." in iso[19:] else "")
            out.append(sec_part + suffix)
        else:
            naive = d.replace(tzinfo=None).isoformat()
            out.append(naive + suffix)
    return pa.array(out, pa.large_string())


def _eval_bool(node, t: pa.Table):
    tag = node[0]
    if tag == "cdtfn" and node[1] in ("contains", "containsKey",
                                      "containsTerm"):
        return _eval_cdtfn(node, t)
    if tag == "and":
        # SPARQL 3-valued logic (17.2): error && false = false,
        # error && true = error — Kleene semantics over null-as-error
        return pc.and_kleene(_eval_bool(node[1], t), _eval_bool(node[2], t))
    if tag == "or":
        return pc.or_kleene(_eval_bool(node[1], t), _eval_bool(node[2], t))
    if tag == "not":
        return pc.invert(_eval_bool(node[1], t))
    if tag == "exists_marker":
        # EXISTS-in-expression marker column (never null — a definite
        # true/false per row), appended by _exists_mark
        return t[node[1]].combine_chunks()
    if tag == "bound":
        return pc.is_valid(_var_col(t, node[1]))
    if tag == "sameterm":
        from ..model import RDF_LANGSTRING, XSD_STRING

        L, R = _eq_side(node[1], t), _eq_side(node[2], t)

        def nz_dt(S):
            # RDF 1.1: a simple literal IS xsd:string, and the
            # lang-string datatype is implied by the tag — normalize
            # the declared-dt variants so sameTerm sees one term
            return pc.if_else(
                pc.is_in(S["dt"], value_set=pa.array(
                    [XSD_STRING, RDF_LANGSTRING], pa.large_string())),
                pa.scalar("", pa.large_string()), S["dt"])

        def nz_cls(S):
            return pc.if_else(pc.equal(S["cls"], _i8(_CLS_STR)),
                              _i8(_CLS_UNTYPED), S["cls"])

        res = pc.and_(
            pc.and_(pc.fill_null(pc.equal(L["lex"], R["lex"]), False),
                    pc.fill_null(pc.equal(nz_dt(L), nz_dt(R)), False)),
            pc.and_(pc.fill_null(pc.equal(L["lang"], R["lang"]), False),
                    pc.equal(nz_cls(L), nz_cls(R))))
        bound = pc.and_(pc.is_valid(L["lex"]), pc.is_valid(R["lex"]))
        return pc.if_else(bound, res, pa.scalar(None, pa.bool_()))
    if tag == "isnumeric":
        S = _eq_side(node[1], t)
        res = pc.or_(
            pc.equal(S["cls"], _i8(_CLS_NUM)),
            pc.and_(pc.equal(S["cls"], _i8(_CLS_UNTYPED)),
                    pc.is_valid(S["num"])))
        return pc.if_else(pc.is_valid(S["lex"]), res,
                          pa.scalar(None, pa.bool_()))
    if tag == "regex_str":
        # REGEX(STR(?v), pat): lexical form of any term kind
        return pc.match_substring_regex(_var_col(t, node[1]), node[2])
    if tag == "regex_dyn":
        # REGEX with a VARIABLE pattern/flags — compiled per row
        # (E_Regex with non-constant args; ExprRegex q-regex-3/4).
        # A cold path: constant patterns stay on the Arrow kernel.
        _, var, patvar, flagsvar, via_str = node
        vals = _var_col(t, var).to_pylist()
        pats = _var_col(t, patvar).to_pylist()
        if flagsvar is None:
            flags_l = [""] * t.num_rows
        elif isinstance(flagsvar, tuple):
            flags_l = [flagsvar[1]] * t.num_rows
        else:
            flags_l = _var_col(t, flagsvar).to_pylist()
        out = []
        for v2, p2, fl in zip(vals, pats, flags_l):
            if v2 is None or p2 is None:
                out.append(None)
                continue
            f = 0
            for c in (fl or ""):
                f |= {"i": re.I, "s": re.S, "m": re.M}.get(c, 0)
            try:
                out.append(bool(re.search(p2, v2, f)))
            except re.error:
                out.append(None)
        return pa.array(out, pa.bool_())
    if tag == "regex":
        m = pc.match_substring_regex(_var_col(t, node[1]), node[2])
        kc = node[1] + "__kind"
        if kc in t.schema.names:
            # REGEX requires a string literal arg — an IRI/bnode binding
            # is a type error → effective false (E_Regex/XSDFuncOp)
            from ..model import KIND_LITERAL

            m = pc.and_(m, pc.fill_null(pc.equal(
                t[kc].combine_chunks(),
                pa.scalar(KIND_LITERAL, pa.int8())), True))
        return m
    if tag == "strstarts":
        return pc.starts_with(_var_col(t, node[1]), node[2])
    if tag == "strends":
        return pc.ends_with(_var_col(t, node[1]), node[2])
    if tag == "contains":
        return pc.match_substring(_var_col(t, node[1]), node[2])
    if tag in ("haslang", "haslangdir"):
        from ..model import KIND_LITERAL

        n = t.num_rows
        lc, kc = node[1] + "__lang", node[1] + "__kind"
        lang = (pc.fill_null(
            t[lc].combine_chunks().cast(pa.large_string()), "")
            if lc in t.schema.names
            else pa.array([""] * n, pa.large_string()))
        if tag == "haslang":
            out = pc.not_equal(
                pc.replace_substring_regex(lang, r"--(ltr|rtl)$", ""), "")
        else:
            out = pc.match_substring_regex(lang, r"--(ltr|rtl)$")
        if kc in t.schema.names:
            out = pc.and_(out, pc.fill_null(pc.equal(
                t[kc].combine_chunks(), pa.scalar(KIND_LITERAL, pa.int8())),
                True))
        bound = pc.is_valid(_var_col(t, node[1]))
        return pc.if_else(bound, out, pa.scalar(None, pa.bool_()))
    if tag in ("isiri", "isliteral", "isblank", "istriple"):
        from ..model import (KIND_BNODE, KIND_IRI, KIND_LITERAL,
                             KIND_TRIPLE_TERM)

        want = {"isiri": KIND_IRI, "isliteral": KIND_LITERAL,
                "isblank": KIND_BNODE, "istriple": KIND_TRIPLE_TERM}[tag]
        kc = node[1] + "__kind"
        if kc not in t.schema.names:
            return pa.array([tag == "isliteral"] * t.num_rows)
        return pc.fill_null(
            pc.equal(t[kc].combine_chunks(), pa.scalar(want, pa.int8())), False
        )
    if tag == "evenint":
        # library/evenInteger.java (example function): values in the
        # INTEGER datatype family only (NodeValue.isInteger — "2.0" and
        # "2"^^xsd:decimal are expression errors, data-1.ttl comments);
        # even → true
        e = node[1]
        v = _eval_num(e, t)
        if isinstance(v, pa.Scalar):
            v = pa.array([v.as_py()] * t.num_rows, pa.float64())
        ok = pc.and_(pc.is_valid(v),
                     pc.fill_null(pc.equal(v, pc.round(v)), False))
        lex = _to_lexical(_eval_value(e, t), t.num_rows)
        if isinstance(lex, pa.Scalar):
            lex = pa.array([lex.as_py()] * t.num_rows, pa.large_string())
        int_lex = pc.fill_null(
            pc.match_substring_regex(lex, r"^[+-]?\d+$"), False)
        if e[0] == "var" and e[1] + "__dt" in t.schema.names:
            dt = pc.fill_null(
                t[e[1] + "__dt"].combine_chunks().cast(pa.large_string()),
                "")
            int_dts = pa.array(
                sorted(k for k, r in _PROMO_RANK.items() if r == 0),
                pa.large_string())
            int_ok = pc.or_(pc.is_in(dt, value_set=int_dts),
                            pc.and_(pc.equal(dt, ""), int_lex))
        else:
            int_ok = int_lex
        ok = pc.and_(ok, int_ok)
        safe = pc.if_else(ok, v, pa.scalar(0.0, pa.float64()))
        half2 = pc.multiply(pc.floor(pc.divide(safe, 2.0)), 2.0)
        even = pc.equal(pc.subtract(safe, half2), 0.0)
        return pc.if_else(ok, even, pa.scalar(None, pa.bool_()))
    if tag == "errfn":
        # unregistered extension function in boolean position: every
        # row is an expression error (3-valued null → FILTER false)
        return pa.array([None] * t.num_rows, pa.bool_())
    if tag == "langmatches":
        # LANGMATCHES(LANG(?v), "range"): '*' = any nonempty; else
        # case-insensitive exact tag or prefix-before-'-' match (RFC 4647
        # basic filtering, E_LangMatches.java)
        # type errors (LANG of a non-literal → null) stay null so that
        # !langMatches(...) keeps 3-valued semantics
        lang = pc.utf8_lower(_eval_value(("lang", node[1]), t))
        rng = node[2].lower()
        if rng == "*":
            return pc.not_equal(lang, "")
        return pc.or_(
            pc.equal(lang, rng),
            pc.starts_with(lang, rng + "-"),
        )
    if tag == "inlist":
        _, e, vals, positive = node
        v = _to_lexical(_eval_value(e, t), t.num_rows)
        if isinstance(v, pa.Scalar):
            v = pa.array([v.as_py()] * t.num_rows, pa.large_string())
        lex = []
        for x in vals:
            if x[0] == "lit":
                lex.append(x[1])
            else:  # num → canonical lexical (ints bare)
                n = x[1]
                lex.append(str(int(n)) if n == int(n) else str(n))
        m = pc.fill_null(
            pc.is_in(v, value_set=pa.array(lex, pa.large_string())), False
        )
        return m if positive else pc.invert(m)
    if tag == "cmp":
        op, l, r = node[1], node[2], node[3]
        if op in ("=", "!="):
            return _term_eq(op, l, r, t)
        lv, rv = _eval_value(l, t), _eval_value(r, t)
        # numeric CONTEXT (a numeric literal / STRLEN / arithmetic
        # operand): compare in the numeric value space,
        # ill-typed/unparseable rows → false
        strict = _is_numeric_node(l) or _is_numeric_node(r)
        ln = _num_or_null(l, t, lv, strict=strict)
        rn = _num_or_null(r, t, rv, strict=strict)
        both_num = pc.and_(pc.is_valid(ln), pc.is_valid(rn))
        if isinstance(both_num, pa.Scalar):
            both_num = pa.array([both_num.as_py()] * t.num_rows)
        num_res = pc.fill_null(_CMP[op](ln, rn), False)
        if strict:
            return pc.if_else(both_num, num_res, pa.scalar(False))
        return _term_ord(op, l, r, t)
    # a value expression in boolean position → its effective boolean
    # value (FILTER(?v), FILTER(?x + ?y), ...)
    try:
        return _ebv(node, t)
    except RDFParseError:
        raise RDFParseError(f"SPARQL: not a boolean expression: {node!r}")


def _term_sort(bindings_ds, order: list):
    """SPARQL term ordering over a binding Dataset WITH metadata columns
    (BindingComparator.java + NodeValue.compareAlways): unbound < bnode
    < IRI < literal; literals order by VALUE SPACE rank
    (ValueSpace.java:52-112 — string 50 < lang 55 < numeric 110 <
    boolean 120 < dateTime 130 < date 131 < time 135 < duration 160 <
    cdt:List 300 < cdt:Map 301 < triple term 999 < unknown/ill-formed
    6000), then by value within the space, then syntactically
    (lexical form, datatype IRI — the ARQ Sort-3 tie order). Realized
    as four helper sort-key columns per ORDER var — kind class, value-
    space rank, numeric value, encoded lexical — then one Dataset.sort;
    DESC reverses the whole comparator (all four flags)."""
    order_vars = [v for v, _ in order]

    def add_keys(t: pa.Table) -> pa.Table:
        cols = {c: t[c].combine_chunks() for c in t.schema.names}
        n = t.num_rows
        for v in order_vars:
            klass, rank, num, s = _order_key_cols(cols, n, v)
            cols[f"__ok_{v}"] = klass
            cols[f"__of_{v}"] = rank
            cols[f"__on_{v}"] = num
            cols[f"__os_{v}"] = s
        return pa.table(cols)

    keyed = bindings_ds.map_batches(add_keys, batch_format="pyarrow")
    keys, desc = [], []
    for v, d in order:
        keys += [f"__ok_{v}", f"__of_{v}", f"__on_{v}", f"__os_{v}"]
        desc += [d, d, d, d]
    out = keyed.sort(keys, descending=desc)

    def drop_keys(t: pa.Table) -> pa.Table:
        keep = [c for c in t.schema.names if not c.startswith(("__ok_", "__of_", "__on_", "__os_"))]
        return t.select(keep)

    return out.map_batches(drop_keys, batch_format="pyarrow")


def _order_key_cols(cols: dict, n: int, v: str):
    """The four order-preserving sort-key arrays for ORDER-var ?v over
    a binding batch's columns: (kind class int8, value-space rank
    int16, numeric value float64, encoded lexical). See _term_sort for
    the comparator this realizes."""
    from ..model import KIND_BNODE, KIND_IRI

    if True:
        if True:
            lex = cols.get(v, pa.nulls(n, pa.large_string()))
            kind = cols.get(v + "__kind", pa.nulls(n, pa.int8()))
            if not pa.types.is_integer(kind.type):
                # post-_dedup meta columns come back lexical-cast
                kind = pc.cast(kind, pa.int8())
            dt = cols.get(v + "__dt", pa.array([""] * n, pa.large_string()))
            lang = cols.get(
                v + "__lang", pa.array([""] * n, pa.large_string()))
            from ..model import KIND_TRIPLE_TERM

            klass = pc.if_else(
                pc.is_null(lex),
                pa.scalar(0, pa.int8()),
                pc.if_else(
                    pc.fill_null(
                        pc.equal(kind, pa.scalar(KIND_BNODE, pa.int8())), False
                    ),
                    pa.scalar(1, pa.int8()),
                    pc.if_else(
                        pc.fill_null(
                            pc.equal(kind, pa.scalar(KIND_IRI, pa.int8())),
                            False,
                        ),
                        pa.scalar(2, pa.int8()),
                        pa.scalar(3, pa.int8()),
                    ),
                ),
            )
            is_tt = pc.fill_null(pc.equal(
                kind, pa.scalar(KIND_TRIPLE_TERM, pa.int8())), False)
            if not (pa.types.is_string(lex.type)
                    or pa.types.is_large_string(lex.type)):
                # native (aggregate) columns sort by their lexical form
                lex = lex.cast(pa.large_string())
            lexf = pc.fill_null(lex, "")
            dtf = pc.fill_null(dt.cast(pa.large_string()), "")
            langf = pc.fill_null(lang.cast(pa.large_string()), "")
            numeric_dt = pc.fill_null(
                pc.is_in(dtf,
                         value_set=pa.array(sorted(_NUMERIC_DTS),
                                            pa.large_string())),
                False,
            )
            parseable = pc.fill_null(
                pc.match_substring_regex(lexf, _NUM_RE), False
            )
            is_num = pc.and_(numeric_dt, parseable)
            is_bool = pc.and_(
                pc.equal(dtf, _XSD + "boolean"),
                pc.is_in(lexf, value_set=pa.array(
                    ["true", "false", "0", "1"], pa.large_string())))
            num = pc.cast(
                pc.if_else(is_num, lex, pa.scalar(None, lex.type)), pa.float64()
            )
            num = pc.if_else(
                pc.and_(is_bool, pc.invert(is_num)),
                pc.cast(pc.is_in(lexf, value_set=pa.array(
                    ["true", "1"], pa.large_string())), pa.float64()),
                num)

            def _dt_in(*names):
                return pc.fill_null(pc.is_in(dtf, value_set=pa.array(
                    [_XSD + s for s in names], pa.large_string())), False)

            from ..rdf.cdt import CDT_LIST, CDT_MAP

            rank = pa.array([6000] * n, pa.int16())
            for cond, r in (
                (pc.equal(dtf, CDT_MAP), 301),
                (pc.equal(dtf, CDT_LIST), 300),
                (_dt_in("duration", "yearMonthDuration",
                        "dayTimeDuration"), 160),
                (_dt_in("time"), 135),
                (_dt_in("date"), 131),
                (_dt_in("dateTime", "dateTimeStamp"), 130),
                (is_bool, 120),
                (is_num, 110),
                (pc.not_equal(langf, ""), 55),
                (pc.and_(pc.equal(langf, ""),
                         pc.or_(pc.equal(dtf, ""),
                                pc.equal(dtf, _XSD + "string"))), 50),
            ):
                rank = pc.if_else(pc.fill_null(cond, False),
                                  pa.scalar(r, pa.int16()), rank)
            rank = pc.if_else(is_tt, pa.scalar(999, pa.int16()), rank)
            flag = rank
            # syntactic tie-break after value equality: lexical form,
            # then datatype IRI, then lang (xsd:string folds into the
            # simple-literal form — same RDF 1.1 term)
            dt_key = pc.if_else(pc.equal(dtf, _XSD + "string"),
                                pa.scalar("", pa.large_string()), dtf)
            s = pc.binary_join_element_wise(
                lexf, dt_key, pc.utf8_lower(langf),
                pa.scalar("\x00", pa.large_string()))
            # CDT-typed literals sort by the structural ORDER BY
            # comparator (sortOrderingCompare) — realized as an
            # order-preserving encoded key (rdf/cdt.cdt_sort_key);
            # the per-row python encode runs only on CDT rows
            from ..rdf.cdt import CDT_LIST, CDT_MAP, cdt_sort_key

            is_cdt = pc.fill_null(pc.is_in(
                dt, value_set=pa.array([CDT_LIST, CDT_MAP], dt.type)),
                False)
            if pc.any(is_cdt).as_py():
                s_py = s.to_pylist()
                lex_py = lexf.to_pylist()
                dt_py = dt.to_pylist()
                for i, hit in enumerate(is_cdt.to_pylist()):
                    if hit:
                        try:
                            s_py[i] = cdt_sort_key(lex_py[i], dt_py[i])
                        except ValueError:
                            pass  # ill-formed: keep the encoded lexical
                s = pa.array(s_py, pa.large_string())
            if pc.any(is_tt).as_py():
                # triple terms: recursive component-wise encoded key
                from ..rdf.tripleterm import tt_sort_key

                s_py = s.to_pylist()
                lex_py = lexf.to_pylist()
                for i, hit in enumerate(is_tt.to_pylist()):
                    if hit and lex_py[i]:
                        try:
                            s_py[i] = tt_sort_key(lex_py[i])
                        except Exception:
                            pass  # ill-formed: keep the encoded lexical
                s = pa.array(s_py, pa.large_string())
            return klass, flag, pc.fill_null(num, 0.0), s


def _encode_order_key(cols: dict, n: int, order: list):
    """One order-preserving STRING sort key for the whole ORDER BY
    condition list (all-ASC or all-DESC only): per var, the four
    _order_key_cols components packed as fixed-width sortable text —
    kind-class digit, 4-digit rank, the float64 numeric value through
    the IEEE total-order bit trick (sign-flip → uint64 → zero-padded
    decimal), then the encoded lexical — vars joined with NUL. Lets a
    groupby aggregate pick each group's FIRST row in sort order with a
    single Min/Max (ARQ's distinct-to-reduced transform)."""
    parts = []
    sep = pa.scalar("\x00", pa.large_string())
    for v, _d in order:
        klass, rank, num, s = _order_key_cols(cols, n, v)
        k = pc.cast(klass, pa.large_string())
        r = pc.utf8_lpad(pc.cast(rank, pa.large_string()), 4, "0")
        ubits = pc.fill_null(num, 0.0).view(pa.uint64())
        neg = pc.not_equal(
            pc.bit_wise_and(ubits, pa.scalar(1 << 63, pa.uint64())),
            pa.scalar(0, pa.uint64()))
        mapped = pc.if_else(
            neg, pc.bit_wise_not(ubits),
            pc.bit_wise_or(ubits, pa.scalar(1 << 63, pa.uint64())))
        nk = pc.utf8_lpad(pc.cast(mapped, pa.large_string()), 20, "0")
        parts += [k, r, nk, s]
    return pc.binary_join_element_wise(*parts, sep)


def _proj_alias(p) -> str | None:
    """The variable a projection item binds: ("var", name) → name,
    ("agg", fn, var, alias, ...) → alias, ("exprbind", expr, alias) →
    alias."""
    if p[0] == "var":
        return p[1]
    if p[0] == "agg":
        return p[3]
    if p[0] == "exprbind":
        return p[2]
    return None


def _validate_scopes(group: dict) -> None:
    """Parse-time in-scope-variable checks (SPARQL §18.2.1; ARQ's
    SyntaxVarScope): a BIND target must not already be in scope from
    the preceding elements of its group. Recurses into nested groups,
    OPTIONAL/MINUS, GRAPH, UNION arms and subqueries."""
    scope: set = set()
    for el in group.get("elements", ()):
        t = el[0]
        if t == "bind" and el[2] in scope:
            raise RDFParseError(
                f"SPARQL: BIND target ?{el[2]} is already in scope (18.2.1)")
        if t in ("group", "optional", "minus", "lateral"):
            _validate_scopes(el[1])
        elif t in ("graph", "dataset"):
            _validate_scopes(el[2])
        elif t == "union":
            for arm in el[1]:
                _validate_scopes(arm)
        elif t == "subquery":
            _validate_query_scopes(el[1])
        scope |= _group_vars({"elements": [el]})


def _validate_query_scopes(q: dict) -> None:
    """SELECT-expression scope check (§18.2.1: the target of
    (expr AS ?v) must not be in-scope from the WHERE group or an
    earlier projection item). Grouped/aggregate queries keep their
    own scope rules and are not checked here."""
    g = q.get("group")
    if g:
        _validate_scopes(g)
    proj = q.get("project")
    if proj and not q.get("group_by") and not any(
            p[0] == "agg" for p in proj):
        gv = _group_vars(g) if g else set()
        seen: set = set()
        for p in proj:
            if p[0] == "var":
                seen.add(p[1])
                continue
            alias = _proj_alias(p)
            if alias and (alias in gv or alias in seen):
                raise RDFParseError(
                    f"SPARQL: SELECT expression re-binds in-scope "
                    f"?{alias} (18.2.1)")
            if alias:
                seen.add(alias)


def _group_vars(group: dict) -> set:
    out: set = set()
    for el in group["elements"]:
        if el[0] == "bgp":
            from .bgp import _pattern_vars

            out |= {v for pat in el[1] for v in _pattern_vars(pat)}
        elif el[0] == "path":
            out |= {x.name for x in (el[1][0], el[1][2]) if isinstance(x, Var)}
        elif el[0] == "group":
            out |= _group_vars(el[1])
        elif el[0] == "dataset":
            out |= _group_vars(el[2])
        elif el[0] == "values":
            out |= set(el[1])
        elif el[0] == "relation":
            out |= set(el[2])
        elif el[0] in ("bind", "letbind"):
            out.add(el[2])
        elif el[0] == "unfold":
            out.add(el[2])
            if el[3]:
                out.add(el[3])
        elif el[0] == "subquery":
            q = el[1]
            if q["project"] is None:
                out |= _group_vars(q["group"])
            else:
                out |= {_proj_alias(p) for p in q["project"] if _proj_alias(p)}
        elif el[0] == "graph":
            out |= _group_vars(el[2])
            if isinstance(el[1], Var):
                out.add(el[1].name)
        elif el[0] in ("optional", "lateral"):
            out |= _group_vars(el[1])
        elif el[0] == "union":
            for arm in el[1]:
                out |= _group_vars(arm)
    return out


def _has_closure(p) -> bool:
    if isinstance(p, (_paths.Star, _paths.Plus, _paths.Opt, _paths.Zero)):
        return True
    if isinstance(p, _paths.Inv):
        return _has_closure(p.path)
    if isinstance(p, (_paths.Alt, _paths.Seq)):
        return any(_has_closure(x) for x in p.paths)
    return False


def _invert_path(p):
    """Structural reversal: pairs(invert(P)) == reversed pairs(P). Needed
    so a constant-OBJECT closure can be evaluated seeded from that end
    (plain Inv wrapping would evaluate the closure unseeded first)."""
    if isinstance(p, _paths.Link):
        return _paths.Inv(p)
    if isinstance(p, _paths.Inv):
        return p.path
    if isinstance(p, _paths.Seq):
        return _paths.Seq(*[_invert_path(x) for x in reversed(p.paths)])
    if isinstance(p, _paths.Alt):
        return _paths.Alt(*[_invert_path(x) for x in p.paths])
    if isinstance(p, _paths.Star):
        return _paths.Star(_invert_path(p.path))
    if isinstance(p, _paths.Plus):
        return _paths.Plus(_invert_path(p.path))
    if isinstance(p, _paths.Opt):
        return _paths.Opt(_invert_path(p.path))
    if isinstance(p, _paths.NegSet):
        return _paths.Inv(p)  # non-closure: generic inversion is fine
    if isinstance(p, _paths.Zero):
        return p  # identity relation: self-inverse
    raise RDFParseError(f"SPARQL: cannot invert path {p!r}")


def _compile_path_pattern(triples_ds, pat):
    """(s, Path, o) → binding relation. Closure operators (* + ?) need a
    constant endpoint in this subset (seeded evaluation — the shape
    SPARQL engines use; an unseeded closure is O(V²)). Seeds propagate
    through Seq and Alt (PathEval.java), so p/q*, (p/q)* and (p*|q)
    evaluate seeded, and closures nested inside another closure's step
    ((p*/q)+, (p*|q)+, ^(p*)) re-evaluate the step seeded per round
    (eval_path's _step_needs_seeding / _inv_push)."""
    s, path, o = pat
    if isinstance(o, Lit):
        o = o.lex  # path matching is over lexical forms

    def to_edges(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "s": t["s_lex"].combine_chunks().cast(pa.large_string()),
                "p": t["p"].combine_chunks().cast(pa.large_string()),
                "o": t["o_lex"].combine_chunks().cast(pa.large_string()),
            }
        )

    edges = triples_ds.map_batches(to_edges, batch_format="pyarrow")
    seeds = None
    if _has_closure(path):
        if not isinstance(s, Var):
            seeds = [s]
        elif not isinstance(o, Var):
            # evaluate the structurally inverted path from the object
            path = _invert_path(path)
            s, o = o, s
            seeds = [s]
        # else: both endpoints are vars — eval_path runs the UNSEEDED
        # distributed closure (transitive_pairs semi-naive iteration)
    # bag semantics: non-closure path operators preserve multiplicities
    # (SPARQL §18.4 — Alt is multiset union, Seq multiplies; the closure
    # forms * + ? stay distinct by definition)
    pairs = _paths.eval_path(edges, path, seeds=seeds, bag=True)

    out_cols: list[tuple[str, str]] = []
    filt = []
    if isinstance(s, Var):
        out_cols.append((s.name, "start"))
    else:
        filt.append(("start", s))
    if isinstance(o, Var):
        out_cols.append((o.name, "end"))
    else:
        filt.append(("end", o))
    if not out_cols:
        # all-constant path (ASK-shaped): unit relation keeping the
        # match count, like the all-constant BGP pattern

        def gate(t: pa.Table) -> pa.Table:
            if t.num_columns == 0:
                return pa.table(
                    {"__exists": pa.array([], pa.large_string())})
            x = t
            for col, const in filt:
                x = x.filter(pc.equal(x[col], const))
            return pa.table({"__exists": pa.array(
                ["1"] * x.num_rows, pa.large_string())})

        return pairs.map_batches(gate, batch_format="pyarrow"), []
    if len({n for n, _ in out_cols}) != len(out_cols):
        # ?x path ?x: keep the diagonal, bind one column
        var = out_cols[0][0]

        def diag(t: pa.Table) -> pa.Table:
            if t.num_columns == 0:
                return pa.table({var: pa.array([], pa.large_string())})
            x = t.filter(pc.equal(t["start"], t["end"]))
            return pa.table({var: x["start"].combine_chunks()})

        return pairs.map_batches(diag, batch_format="pyarrow"), [var]

    def project(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.table(
                {n: pa.array([], pa.large_string()) for n, _ in out_cols}
            )
        x = t
        for col, const in filt:
            x = x.filter(pc.equal(x[col], const))
        return pa.table({n: x[c].combine_chunks() for n, c in out_cols})

    rel = pairs.map_batches(project, batch_format="pyarrow")
    return rel, sorted(n for n, _ in out_cols)


def _align_columns(ds, have: list, want: list):
    """Add null columns for vars an arm doesn't bind, order columns, and
    normalize the hidden term-metadata columns: every var in ``want``
    always gets {v}__kind/{v}__dt/{v}__lang (existing values kept,
    defaults otherwise) so union arms and join outputs share one schema."""
    from .bgp import meta_cols_of

    def fn(t: pa.Table) -> pa.Table:
        names = set(t.schema.names) if t.num_columns else set()
        n = t.num_rows if t.num_columns else 0
        cols: dict = {}
        for v in want:
            if v in names:
                c = t[v].combine_chunks()
                # normalize string→large_string (join-key safety); leave
                # numeric columns (e.g. subquery aggregate aliases) alone
                if pa.types.is_string(c.type):
                    c = c.cast(pa.large_string())
                cols[v] = c
            else:
                cols[v] = pa.nulls(n, pa.large_string())
            kc, dc, lc = meta_cols_of(v)
            cols[kc] = (
                t[kc].combine_chunks().cast(pa.int8())
                if kc in names
                else pa.nulls(n, pa.int8())
            )
            cols[dc] = (
                t[dc].combine_chunks().cast(pa.large_string())
                if dc in names
                else pa.array([""] * n, pa.large_string())
            )
            cols[lc] = (
                t[lc].combine_chunks().cast(pa.large_string())
                if lc in names
                else pa.array([""] * n, pa.large_string())
            )
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def _present_masks(ds, shared: list) -> list:
    """Distinct bound-masks (tuple of bound vars per mask) present in a
    binding relation — vectorized bit arithmetic per block (the same
    kernel shape as _minus_bindings' mask_kernel), a few distinct ints
    per block to the driver."""

    def block_masks(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.table({"mask": pa.array([], pa.int64())})
        m = None
        for i, v in enumerate(shared):
            bit = pc.if_else(
                pc.is_valid(t[v].combine_chunks())
                if v in t.schema.names
                else pa.array([False] * t.num_rows),
                pa.scalar(1 << i, pa.int64()),
                pa.scalar(0, pa.int64()),
            )
            m = bit if m is None else pc.add(m, bit)
        return pa.table({"mask": pc.unique(m)})

    seen = set()
    for r in ds.map_batches(block_masks, batch_format="pyarrow").take_all():
        seen.add(r["mask"])
    return [
        tuple(v for i, v in enumerate(shared) if m & (1 << i))
        for m in sorted(seen)
    ]


def _filter_mask(ds, shared: list, bound: tuple):
    """Rows whose bound-mask over `shared` equals `bound`, with the
    all-null shared columns (and their meta) dropped."""
    from .bgp import meta_cols_of

    bound_set = set(bound)
    drop = [v for v in shared if v not in bound_set]
    drop_cols = set(drop) | {m for v in drop for m in meta_cols_of(v)}

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return t
        mask = None
        for v in shared:
            if v in t.schema.names:
                c = pc.is_valid(t[v].combine_chunks())
            else:
                c = pa.array([False] * t.num_rows)
            if v not in bound_set:
                c = pc.invert(c)
            mask = c if mask is None else pc.and_(mask, c)
        t = t.filter(mask)
        keep = [c for c in t.schema.names if c not in drop_cols]
        return t.select(keep)

    return ds.map_batches(kernel, batch_format="pyarrow")


def _cross_join(left, left_vars, right, right_vars):
    """Cartesian product of two binding relations via a constant join
    key (disjoint-domain compatibility: every pair merges)."""

    def add_key(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return t
        return t.append_column(
            "__cross", pa.array(["1"] * t.num_rows, pa.large_string()))

    lk = left.map_batches(add_key, batch_format="pyarrow")
    rk = right.map_batches(add_key, batch_format="pyarrow")
    joined, jv = _join_bindings(
        lk, sorted(left_vars + ["__cross"]),
        rk, sorted(right_vars + ["__cross"]), "inner")
    out = joined.map_batches(
        lambda t: t.select([c for c in t.schema.names if c != "__cross"])
        if t.num_columns else t,
        batch_format="pyarrow")
    return out, sorted(set(left_vars) | set(right_vars))


def _join_partial(lc, left_vars, rc, right_vars, shared):
    """Inner join where either side holds PARTIALLY BOUND solutions
    (UNION arms / OPTIONAL misses): SPARQL compatibility keys each row
    pair only on the vars bound on BOTH sides (Binding.compatible —
    unbound matches anything). Decomposed into one hash join per
    bound-mask pair; each subset has no nulls in its keys so the plain
    hash join is exact. Mask counts are tiny (≤2^|shared| patterns that
    actually occur), so this stays a handful of joins."""
    out_vars_all = sorted(set(left_vars) | set(right_vars))
    lmasks = _present_masks(lc, shared)
    rmasks = _present_masks(rc, shared)
    parts = []
    for lm in lmasks:
        lsub = _filter_mask(lc, shared, lm)
        lv = sorted(set(left_vars) - (set(shared) - set(lm)))
        for rm in rmasks:
            rsub = _filter_mask(rc, shared, rm)
            rv = sorted(set(right_vars) - (set(shared) - set(rm)))
            keys = sorted(set(lm) & set(rm))
            if keys:
                part, pv = _join_bindings(lsub, lv, rsub, rv, "inner")
            else:
                part, pv = _cross_join(lsub, lv, rsub, rv)
            parts.append(_align_columns(part, pv, out_vars_all))
    if not parts:
        # one side is empty (no bound-mask groups): empty join result
        import ray.data as rd

        empty = rd.from_arrow(pa.table(
            {v: pa.array([], pa.large_string()) for v in out_vars_all}))
        return empty, out_vars_all
    acc = parts[0]
    for p in parts[1:]:
        acc = acc.union(p)
    return acc, out_vars_all


def _shared_nulls(ds, shared: list) -> bool:
    """Does any row leave one of `shared` unbound (null / missing)?"""

    def counts(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.table({"n": pa.array([0], pa.int64())})
        n = 0
        for v in shared:
            if v in t.schema.names:
                n += t[v].null_count
            else:
                n += t.num_rows
        return pa.table({"n": pa.array([n], pa.int64())})

    return any(
        r["n"] > 0
        for r in ds.map_batches(counts, batch_format="pyarrow").take_all()
    )


def _join_bindings(left, left_vars, right, right_vars, how: str,
                   maybe_partial=(False, False)):
    from ..util import compact_blocks

    # unit relation (all-constant BGP — no variable columns, only the
    # __exists marker): join = existence gate × bag multiplier
    if not right_vars or not left_vars:
        if not right_vars:
            unit, other, other_vars = right, left, left_vars
        else:
            unit, other, other_vars = left, right, right_vars
        n = unit.count()
        if n == 0:
            # inner: no solutions; left_outer (OPTIONAL over a constant
            # pattern that matched nothing): left side unchanged
            if how == "left_outer" and not right_vars:
                return left, left_vars
            return other.limit(0), other_vars
        if n > 1 and how != "left_outer":
            other = other.map_batches(
                lambda t, _m=n: pa.concat_tables([t] * _m)
                if t.num_columns
                else t,
                batch_format="pyarrow",
            )
        return other, other_vars
    shared = sorted(set(left_vars) & set(right_vars))
    if not shared:
        if how != "inner":
            # OPTIONAL with no shared vars: every pair is compatible,
            # so the left join degenerates to the cross product too
            if right.limit(1).count() == 0:
                out_vars = sorted(set(left_vars) | set(right_vars))
                return _align_columns(left, left_vars, out_vars), out_vars
        return _cross_join(left, left_vars, right, right_vars)
    # partially bound solutions in a shared var (UNION arms with
    # differing variables, OPTIONAL misses, BIND errors) make the plain
    # hash join wrong: an unbound var is compatible with anything. The
    # `maybe_partial` flags (tracked structurally by _compile_group)
    # gate the extra null scan so fully-bound pipelines pay nothing.
    left_p, right_p = maybe_partial
    if (left_p and _shared_nulls(left, shared)) or (
        right_p and _shared_nulls(right, shared)
    ):
        if how == "inner":
            return _join_partial(left, left_vars, right, right_vars, shared)
        # left_outer: LeftJoin = Join_compat ∪ Diff (§18.5) — the inner
        # decomposition for the matched side, the mask-partitioned
        # compat-removal (diff semantics) for the miss side
        matched, mvars = _join_partial(left, left_vars, right, right_vars,
                                       shared)
        missed, _ = _compat_remove(left, left_vars, right, right_vars,
                                   shared, diff=True)
        out_vars = sorted(set(left_vars) | set(right_vars))
        return (
            _align_columns(matched, mvars, out_vars).union(
                _align_columns(missed, left_vars, out_vars)),
            out_vars,
        )
    # both sides may carry meta columns for shared vars (name collision in
    # the join) — keep the left side's, drop the right's
    from .bgp import meta_cols_of

    drop = tuple(m for v in shared for m in meta_cols_of(v))

    def _drop_meta(t: pa.Table) -> pa.Table:
        keep = [c for c in t.schema.names if c not in drop]
        return t.select(keep)

    right = right.map_batches(_drop_meta, batch_format="pyarrow")

    def _lexicalize_keys(t: pa.Table) -> pa.Table:
        # a subquery aggregate alias is numeric (double/int64); joining
        # it against a lexical binding column needs one type — cast to
        # the lexical form (Arrow renders integral doubles without .0)
        if t.num_columns == 0:
            return t
        for v in shared:
            if v in t.schema.names and not pa.types.is_large_string(
                t.schema.field(v).type
            ):
                idx = t.schema.get_field_index(v)
                t = t.set_column(
                    idx, v,
                    t[v].combine_chunks().cast(pa.string())
                    .cast(pa.large_string()),
                )
        return t

    left = left.map_batches(_lexicalize_keys, batch_format="pyarrow")
    right = right.map_batches(_lexicalize_keys, batch_format="pyarrow")
    lc = compact_blocks(left)
    rc = compact_blocks(right)
    out_vars_all = sorted(set(left_vars) | set(right_vars))
    if rc.count() == 0:
        # empty right side: Ray's hash join can't resolve key fields on
        # a blockless dataset. inner → empty; left_outer (OPTIONAL that
        # matched nothing) → left rows with the right-only vars null
        if how == "left_outer":
            return _align_columns(lc, left_vars, out_vars_all), out_vars_all
        return _align_columns(lc.limit(0), left_vars,
                              out_vars_all), out_vars_all
    if lc.count() == 0:
        # empty left side: inner → empty result, left_outer → nothing
        # to extend; either way Ray's hash join would lose the key
        # schema on a blockless dataset
        return _align_columns(lc, left_vars, out_vars_all), out_vars_all
    n_parts = max(1, min(64, lc.count() // 2_000_000))
    joined = lc.join(rc, join_type=how, num_partitions=n_parts,
                     on=tuple(shared))
    out_vars = sorted(set(left_vars) | set(right_vars))
    return _align_columns(
        compact_blocks(joined), out_vars, out_vars
    ), out_vars


def _minus_bindings(left, left_vars, right, right_vars):
    """OpMinus (§8.3.3): drop a left binding μ when SOME right binding
    μ' is compatible with it (agrees on every var bound in BOTH) and
    dom(μ)∩dom(μ') is non-empty."""
    shared = sorted(set(left_vars) & set(right_vars))
    if not shared:
        # SPARQL: MINUS with disjoint domains removes nothing
        return left, left_vars
    return _compat_remove(left, left_vars, right, right_vars, shared,
                          diff=False)


def _compat_remove(left, left_vars, right, right_vars, shared,
                   *, diff: bool):
    """Left bindings with NO compatible right binding. ``diff=False`` is
    MINUS (§8.3.3: removal additionally requires a non-empty domain
    intersection); ``diff=True`` is Diff (§18.5: a disjoint-domain pair
    IS compatible, so it removes — the OPTIONAL miss side when either
    relation holds partially bound solutions).

    When every shared var is bound on both sides this is one marker
    anti-join. With OPTIONAL-produced nulls the commonly-bound var set
    differs per row pair, so the relation is partitioned by each side's
    bound-mask over the shared vars (≤2^k masks, k = |shared|, and only
    masks actually present — two tiny aggregations); each (L, B) mask
    pair with a non-empty intersection contributes one distinct-key
    anti-join on exactly the commonly bound vars."""
    from ..util import compact_blocks

    def mask_kernel(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return t.append_column("__mask", pa.array([], pa.int64()))
        m = None
        for i, v in enumerate(shared):
            bit = pc.if_else(
                pc.is_valid(t[v].combine_chunks())
                if v in t.schema.names
                else pa.array([False] * t.num_rows),
                pa.scalar(1 << i, pa.int64()),
                pa.scalar(0, pa.int64()),
            )
            m = bit if m is None else pc.add(m, bit)
        return t.append_column("__mask", m)

    lm = compact_blocks(left.map_batches(mask_kernel, batch_format="pyarrow"))
    rm = compact_blocks(right.map_batches(mask_kernel, batch_format="pyarrow"))

    def masks_of(ds):
        rows = ds.groupby("__mask").count().take_all()
        return sorted(r["__mask"] for r in rows)

    all_right_masks = masks_of(rm) if rm.count() else []
    # MINUS needs dom(μ)∩dom(μ') non-empty, so an all-unbound right row
    # (mask 0) removes nothing; for Diff it is compatible with EVERYTHING
    right_masks = all_right_masks if diff else [b for b in all_right_masks
                                                if b]
    left_masks = masks_of(lm) if lm.count() else []
    full = (1 << len(shared)) - 1
    if right_masks == [full] and left_masks in ([], [full]):
        # fast path: everything fully bound — single anti-join
        out = _marker_semijoin(left, left_vars, right, shared,
                               keep_matched=False)
        return out, left_vars

    acc = lm
    for B in right_masks:
        r_sub = rm.map_batches(
            lambda t, _b=B: t.filter(pc.equal(t["__mask"], _b))
            if t.num_columns
            else t,
            batch_format="pyarrow",
        )
        for L in left_masks:
            common = L & B
            if not common:
                if not diff:
                    continue  # MINUS: disjoint domains don't remove
                # Diff: a disjoint-domain right row is compatible with
                # every left row of this mask — the mask is present in
                # the right relation (masks_of only reports non-empty
                # classes), so the whole left class is removed
                acc = compact_blocks(acc.map_batches(
                    lambda t, _l=L: t.filter(pc.not_equal(t["__mask"], _l))
                    if t.num_columns
                    else t,
                    batch_format="pyarrow",
                ))
                continue
            keys = [v for i, v in enumerate(shared) if common & (1 << i)]
            part = acc.map_batches(
                lambda t, _l=L: t.filter(pc.equal(t["__mask"], _l))
                if t.num_columns
                else t,
                batch_format="pyarrow",
            )
            rest = acc.map_batches(
                lambda t, _l=L: t.filter(pc.not_equal(t["__mask"], _l))
                if t.num_columns
                else t,
                batch_format="pyarrow",
            )
            survived = _marker_semijoin(
                compact_blocks(part), left_vars + ["__mask"],
                r_sub, keys, keep_matched=False,
            )
            acc = compact_blocks(compact_blocks(rest).union(survived))
    out = acc.map_batches(
        lambda t: t.drop_columns(["__mask"])
        if t.num_columns and "__mask" in t.schema.names
        else t,
        batch_format="pyarrow",
    )
    return out, left_vars


def _exists_bindings(left, left_vars, right, right_vars, positive: bool):
    """FILTER [NOT] EXISTS { ... } (E_Exists/E_NotExists,
    OpFilter over OpExists): keep left bindings that are (in)compatible
    with some right binding on the shared variables — a semi/anti marker
    join. With NO shared variables the inner pattern's solutions don't
    depend on the current row, so the filter degenerates to a gate on
    pattern non-emptiness (exactly the substitution semantics)."""
    shared = sorted(set(left_vars) & set(right_vars))
    if not shared:
        nonempty = right.limit(1).count() > 0
        return (left if nonempty == positive else left.limit(0)), left_vars
    return _marker_semijoin(left, left_vars, right, shared,
                            keep_matched=positive), left_vars


def _exists_mark(left, left_vars, right, right_vars, colname: str):
    """EXISTS { P } as an expression OPERAND (nested in ||/&&): append a
    per-row boolean column — does a compatible right binding exist —
    via the same distinct-key marker join as _marker_semijoin, but
    tagging instead of filtering."""
    from ..util import compact_blocks

    shared = sorted(set(left_vars) & set(right_vars))
    if not shared:
        nonempty = right.limit(1).count() > 0
        return left.map_batches(
            lambda t, _v=nonempty, _c=colname: t.append_column(
                _c, pa.array([_v] * t.num_rows, pa.bool_()))
            if t.num_columns else t,
            batch_format="pyarrow")

    def mark(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.table(
                {**{v: pa.array([], pa.large_string()) for v in shared},
                 "__minus": pa.array([], pa.int8())})
        out = {v: t[v].combine_chunks() for v in shared}
        out["__minus"] = pa.array([1] * t.num_rows, pa.int8())
        return pa.table(out)

    rkeys = compact_blocks(
        right.map_batches(mark, batch_format="pyarrow")
        .groupby(shared)
        .min("__minus")
        .map_batches(
            lambda t: t.rename_columns(shared + ["__minus"])
            if t.num_columns else t,
            batch_format="pyarrow")
        .map_batches(
            lambda t: pa.table(
                {**{v: t[v].combine_chunks().cast(pa.large_string())
                    for v in shared},
                 "__minus": t["__minus"].combine_chunks()})
            if t.num_columns else t,
            batch_format="pyarrow"))
    lc = compact_blocks(left)
    if lc.count() == 0:
        return lc
    if rkeys.count() == 0:
        return lc.map_batches(
            lambda t, _c=colname: t.append_column(
                _c, pa.array([False] * t.num_rows, pa.bool_()))
            if t.num_columns else t,
            batch_format="pyarrow")
    n_parts = max(1, min(64, lc.count() // 2_000_000))
    joined = lc.join(rkeys, join_type="left_outer",
                     num_partitions=n_parts, on=tuple(shared))

    def tag(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return t
        m = pc.is_valid(t["__minus"].combine_chunks())
        keep = [c for c in t.schema.names if c != "__minus"]
        return t.select(keep).append_column(colname, m)

    return joined.map_batches(tag, batch_format="pyarrow")


def _marker_semijoin(left, left_vars, right, shared, keep_matched: bool):
    """Distinct right-side keys on ``shared`` get a marker; a left-outer
    join then keeps left rows whose marker is (non-)null."""
    from ..util import compact_blocks

    def mark(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.table(
                {**{v: pa.array([], pa.large_string()) for v in shared},
                 "__minus": pa.array([], pa.int8())}
            )
        out = {v: t[v].combine_chunks() for v in shared}
        out["__minus"] = pa.array([1] * t.num_rows, pa.int8())
        return pa.table(out)

    # distinct shared-key rows with a marker
    rkeys = compact_blocks(
        right.map_batches(mark, batch_format="pyarrow")
        .groupby(shared)
        .min("__minus")
        .map_batches(
            lambda t: t.rename_columns(shared + ["__minus"])
            if t.num_columns
            else t,
            batch_format="pyarrow",
        )
        .map_batches(
            lambda t: pa.table(
                {**{v: t[v].combine_chunks().cast(pa.large_string())
                    for v in shared},
                 "__minus": t["__minus"].combine_chunks()}
            )
            if t.num_columns
            else t,
            batch_format="pyarrow",
        )
    )
    lc = compact_blocks(left)
    if lc.count() == 0:
        return lc
    if rkeys.count() == 0:
        # empty right side: Ray's hash join can't key a blockless
        # dataset. Semi join → nothing survives; anti join → all do
        return lc.limit(0) if keep_matched else lc
    n_parts = max(1, min(64, lc.count() // 2_000_000))
    joined = lc.join(rkeys, join_type="left_outer", num_partitions=n_parts,
                     on=tuple(shared))

    def sieve(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            from .bgp import meta_cols_of

            cols: dict = {}
            for v in left_vars:
                cols[v] = pa.array([], pa.large_string())
                kc, dc, lc = meta_cols_of(v)
                cols[kc] = pa.array([], pa.int8())
                cols[dc] = pa.array([], pa.large_string())
                cols[lc] = pa.array([], pa.large_string())
            return pa.table(cols)
        m = pc.is_null(t["__minus"])
        x = t.filter(pc.invert(m) if keep_matched else m)
        keep = [c for c in x.schema.names if c != "__minus"]
        return x.select(keep)

    return compact_blocks(
        joined.map_batches(sieve, batch_format="pyarrow")
    )


def _expr_vars(node) -> set:
    """Variable names referenced by a filter-expression AST node."""
    out: set = set()
    if not isinstance(node, tuple) or not node:
        return out
    tag = node[0]
    if tag == "var":
        return {node[1]}
    # tags carrying a bare var name at position 1
    if tag in ("bound", "regex", "regex_str", "strstarts", "strends",
               "contains", "isiri", "isliteral", "isblank", "strlen",
               "lang", "datatype", "langmatches") and isinstance(
                   node[1], str) and tag != "var":
        out.add(node[1])
    for x in node[1:]:
        if isinstance(x, tuple):
            out |= _expr_vars(x)
        elif isinstance(x, (list,)):
            for y in x:
                if isinstance(y, tuple):
                    out |= _expr_vars(y)
    return out


def _filter_bindings(ds, vars_: list, filters: list):
    """Apply FILTER expressions to a binding relation (errors → false)."""

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            from .bgp import meta_cols_of

            cols: dict = {}
            for v in vars_:
                cols[v] = pa.array([], pa.large_string())
                kc, dc, lc = meta_cols_of(v)
                cols[kc] = pa.array([], pa.int8())
                cols[dc] = pa.array([], pa.large_string())
                cols[lc] = pa.array([], pa.large_string())
            return pa.table(cols)
        mask = None
        for f in filters:
            m = pc.fill_null(_eval_bool(f, t), False)
            mask = m if mask is None else pc.and_(mask, m)
        return t.filter(mask)

    return ds.map_batches(kernel, batch_format="pyarrow")


# sentinel standing in for an UNBOUND value in exact-row joins (hash
# joins drop null keys); contains \x00 so no RDF term collides with it
_UNBOUND_SENTINEL = "\x00\x1funbound\x1f"


def _encode_unbound(ds, cols):
    def kern(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return t
        for v in cols:
            if v in t.schema.names:
                i = t.schema.get_field_index(v)
                t = t.set_column(
                    i, v,
                    pc.fill_null(
                        t[v].combine_chunks().cast(pa.large_string()),
                        _UNBOUND_SENTINEL))
        return t

    return ds.map_batches(kern, batch_format="pyarrow")


def _decode_unbound(ds, cols):
    def kern(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return t
        for v in cols:
            if v in t.schema.names:
                i = t.schema.get_field_index(v)
                c = t[v].combine_chunks()
                t = t.set_column(
                    i, v,
                    pc.if_else(pc.equal(c, _UNBOUND_SENTINEL),
                               pa.scalar(None, pa.large_string()), c))
        return t

    return ds.map_batches(kern, batch_format="pyarrow")


def _left_join_conditional(left, left_vars, right, right_vars, filters,
                           maybe_partial=(False, False)):
    """LeftJoin with a condition over the merged solution:
    Filter(expr, Join(Ω1, Ω2)) ∪ Diff — left rows with no surviving
    match re-enter with the right-only vars unbound. ``maybe_partial``
    threads through to the inner join (partially bound solutions need
    the bound-mask decomposition); the diff's exact-row anti-join
    sentinel-encodes unbound values so null-keyed left rows are kept
    (hash joins drop null keys)."""
    joined, joined_vars = _join_bindings(left, left_vars, right,
                                         right_vars, "inner",
                                         maybe_partial=maybe_partial)
    matched = _filter_bindings(joined, joined_vars, filters)
    matched_left = select(matched, left_vars)
    if maybe_partial[0] and _shared_nulls(left, left_vars):
        unmatched, _ = _exists_bindings(
            _encode_unbound(left, left_vars), left_vars,
            _encode_unbound(matched_left, left_vars), left_vars,
            positive=False)
        unmatched = _decode_unbound(unmatched, left_vars)
    else:
        unmatched, _ = _exists_bindings(left, left_vars, matched_left,
                                        left_vars, positive=False)
    padded = _align_columns(unmatched, left_vars, joined_vars)
    return matched.union(padded), joined_vars


def _subquery_out_vars(q: dict):
    if q.get("project") is None:
        return sorted(v for v in _group_vars(q["group"])
                      if not v.startswith("__bn_"))
    return sorted(a for a in (_proj_alias(p) for p in q["project"]) if a)


def _per_key_window(rel, keys: list, order: list, limit, offset):
    """ORDER BY / LIMIT / OFFSET applied PER correlation-key group —
    the distributed realization of a LATERAL windowed subquery (one
    shuffle on the correlation keys; SPARQL term ordering via the same
    four-key encoding as the global _term_sort)."""

    def win(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        names = list(t.schema.names)
        if order:
            cols = {c: t[c].combine_chunks() for c in names}
            n = t.num_rows
            sort_keys = []
            for v, d in order:
                klass, rank, num, s = _order_key_cols(cols, n, v)
                for suff, arr in (("k", klass), ("f", rank),
                                  ("n", num), ("s", s)):
                    cols[f"__w{suff}_{v}"] = arr
                    sort_keys.append(
                        (f"__w{suff}_{v}",
                         "descending" if d else "ascending"))
            t2 = pa.table(cols)
            t = t2.take(pc.sort_indices(t2, sort_keys=sort_keys))
            t = t.select(names)
        lo = offset or 0
        if limit is None:
            return t.slice(lo)
        return t.slice(lo, limit)

    return rel.groupby(keys).map_groups(win, batch_format="pyarrow")


def _lateral_rel(triples_ds, lg: dict, acc_vars: list, graph):
    """LATERAL right side → (rel, rel_vars, deferred_filters, how).
    A lone windowed subquery (LIMIT/OFFSET, optionally ORDER BY)
    correlates per key group; a lone OPTIONAL around one becomes the
    left_outer variant; anything else compiles normally with filters
    that reference outer in-scope vars deferred to run AFTER the join
    (substitution semantics for plain patterns ≡ join + condition)."""
    els = lg.get("elements", ())
    how = "inner"
    sub = None
    if len(els) == 1 and not lg.get("filters"):
        if els[0][0] == "subquery":
            sub = els[0][1]
        elif els[0][0] == "optional":
            ig = els[0][1]
            iels = ig.get("elements", ())
            if (len(iels) == 1 and iels[0][0] == "subquery"
                    and not ig.get("filters")):
                sub = iels[0][1]
                how = "left_outer"
    if sub is not None and (sub.get("limit") is not None
                            or sub.get("offset")):
        out_vars = _subquery_out_vars(sub)
        keys = sorted(set(out_vars) & set(acc_vars))
        if keys:
            inner_q = {**sub, "limit": None, "offset": 0, "order": []}
            rel, rel_vars = _exec_select(triples_ds, inner_q, graph=graph)
            rel = _per_key_window(rel, keys, sub.get("order") or [],
                                  sub.get("limit"), sub.get("offset"))
            return rel, rel_vars, [], how
    ivars = _group_vars(lg)
    deferred = [f for f in lg.get("filters", [])
                if (_expr_vars(f) - ivars) & set(acc_vars)]
    if deferred:
        lg = dict(lg)
        lg["filters"] = [f for f in lg["filters"] if f not in deferred]
    rel, rel_vars = _compile_group(triples_ds, lg, graph=graph)
    return rel, rel_vars, deferred, how


def _apply_filter_exprs(acc, filters: list):
    """Post-join FILTER conjunction (error → effective false)."""

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return t
        mask = None
        for f in filters:
            m = pc.fill_null(_eval_bool(f, t), False)
            if isinstance(m, pa.Scalar):
                m = pa.array([m.as_py()] * t.num_rows, pa.bool_())
            mask = m if mask is None else pc.and_(mask, m)
        return t.filter(mask)

    return acc.map_batches(kernel, batch_format="pyarrow")


def _let_rebind_kernel(expr, var):
    """ARQ LET over an ALREADY-BOUND variable (QueryIterAssign with
    mustBeNewVar=false): per row —
      old bound, new value equal (value space)  → keep
      old bound, new value different            → drop the solution
      old bound, expression error               → keep (no assignment)
      old unbound (partial solution)            → assign the new value
    Value equality is numeric-aware (sameValueAs over the numeric
    bridge: "3"^^xsd:integer == 6-3), lexical otherwise."""

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        val = _eval_value(expr, t)
        new = _to_lexical(val, t.num_rows)
        if isinstance(new, pa.Scalar):
            new = pa.array([new.as_py()] * t.num_rows, pa.large_string())
        old = t[var].combine_chunks().cast(pa.large_string())
        old_null = pc.is_null(old)
        new_null = pc.is_null(new)
        lex_eq = pc.fill_null(pc.equal(old, new), False)
        old_num = pc.cast(
            pc.if_else(pc.fill_null(pc.match_substring_regex(
                pc.fill_null(old, ""), _NUM_RE), False), old, None),
            pa.float64(), safe=False)
        new_num = pc.cast(
            pc.if_else(pc.fill_null(pc.match_substring_regex(
                pc.fill_null(new, ""), _NUM_RE), False), new, None),
            pa.float64(), safe=False)
        num_eq = pc.fill_null(pc.equal(old_num, new_num), False)
        keep = pc.or_(pc.or_(old_null, new_null),
                      pc.or_(lex_eq, num_eq))
        out = {}
        for c in t.schema.names:
            col = t[c].combine_chunks()
            if c == var:
                col = pc.if_else(old_null, new, old)
            out[c] = col
        return pa.table(out).filter(keep)

    return kernel


def _group_maybe_partial(group: dict) -> bool:
    """Structural over-approximation: can this group's solutions leave a
    variable unbound? (OPTIONAL, BIND errors, mixed-var UNION arms —
    drives the partially-bound join decomposition.)"""
    for el in group.get("elements", ()):
        t = el[0]
        if t in ("optional", "bind", "letbind", "unfold"):
            return True
        if t == "values" and any(x is None for r in el[2] for x in r):
            # UNDEF rows: unbound vars flow out of a NESTED VALUES too
            # (braced group / GRAPH / dataset / union arm) — without this
            # the plain hash join silently drops the UNDEF rows
            return True
        if t == "union":
            vs = [frozenset(_group_vars(a)) for a in el[1]]
            if len(set(vs)) > 1 or any(_group_maybe_partial(a)
                                       for a in el[1]):
                return True
        if t in ("group", "lateral") and _group_maybe_partial(el[1]):
            return True
        if t == "dataset" and _group_maybe_partial(el[2]):
            return True
        if t == "graph" and _group_maybe_partial(el[2]):
            return True
        if t == "subquery" and _group_maybe_partial(el[1].get("group", {})):
            return True
    return False


def _compile_group(triples_ds, group: dict, graph=None):
    """→ (bindings Dataset, sorted var list) for one GroupGraphPattern.
    ``graph`` (None | IRI string | Var) scopes the group's patterns —
    set by an enclosing GRAPH element."""
    import ray.data as rd

    acc = None
    acc_vars: list = []
    acc_partial = False  # may acc hold rows with an unbound var?
    for el in group["elements"]:
        rel_partial = False
        if el[0] == "bgp":
            from .propfunc import compile_bgp_with_pfs, has_pf

            if has_pf(el[1]):
                # property-function predicates split the BGP (Jena's
                # PropertyFunctionProcessor): see ops/propfunc.py
                rel, rel_vars = compile_bgp_with_pfs(
                    triples_ds, el[1], graph=graph)
                how = "inner"
            else:
                rel = match_bgp(triples_ds, el[1], distinct=False,
                                graph=graph, with_meta=True)
                from .bgp import _pattern_vars

                rel_vars = sorted(
                    {v for pat in el[1] for v in _pattern_vars(pat)}
                    | ({graph.name} if isinstance(graph, Var) else set())
                )
                how = "inner"
        elif el[0] == "graph":
            if isinstance(el[1], Var):
                # a FILTER inside GRAPH ?g {..} evaluates BEFORE the
                # graph var joins (§18.5 Graph(var,P): P sees ?g
                # unbound unless a pattern in P binds it) — referencing
                # it is a per-row type error → empty (ARQ graph-20)
                gvn = el[1].name
                if any(gvn in _expr_vars(f)
                       for f in el[2].get("filters", ())) \
                        and gvn not in _group_vars(el[2]):
                    rel_vars = sorted(_group_vars(el[2]) | {gvn})
                    rel = rd.from_arrow(pa.table(
                        {v: pa.array([], pa.large_string())
                         for v in rel_vars}))
                    acc, acc_vars = (rel, rel_vars) if acc is None else \
                        _join_bindings(acc, acc_vars, rel, rel_vars,
                                       "inner")
                    continue
            rel, rel_vars = _compile_group(triples_ds, el[2], graph=el[1])
            rel_partial = _group_maybe_partial(el[2])
            how = "inner"
        elif el[0] == "group":
            rel, rel_vars = _compile_group(triples_ds, el[1], graph=graph)
            rel_partial = _group_maybe_partial(el[1])
            how = "inner"
        elif el[0] == "dataset":
            # FROM / FROM NAMED: re-scope the store for this group
            rel, rel_vars = _compile_group(
                _using_view(triples_ds, el[1]), el[2], graph="")
            rel_partial = _group_maybe_partial(el[2])
            how = "inner"
        elif el[0] == "path":
            if graph is not None and not isinstance(graph, str):
                # GRAPH ?g { path }: one seeded evaluation per named
                # graph, ?g bound to the graph name (Jena iterates the
                # dataset's graphs the same way). The graph COUNT is
                # driver-sized here — capped to keep the loop honest.
                gnames = sorted({
                    r["g"] for r in triples_ds.map_batches(
                        lambda t: pa.table({"g": pc.unique(pc.drop_null(
                            pc.if_else(pc.not_equal(
                                t["g"].combine_chunks().cast(
                                    pa.large_string()), ""),
                                t["g"].combine_chunks().cast(
                                    pa.large_string()),
                                pa.scalar(None, pa.large_string()))))})
                        if t.num_columns and "g" in t.schema.names
                        else pa.table({"g": pa.array(
                            [], pa.large_string())}),
                        batch_format="pyarrow",
                    ).take_all()
                })
                if len(gnames) > 10_000:
                    raise RDFParseError(
                        "SPARQL: paths under GRAPH ?var over >10k named "
                        "graphs are out of subset")
                from .bgp import meta_cols_of as _mco

                arms = []
                gname = graph.name
                for gv in gnames:
                    scoped = triples_ds.map_batches(
                        lambda t, _g=gv: t.filter(pc.equal(t["g"], _g))
                        if t.num_columns and "g" in t.schema.names
                        else t,
                        batch_format="pyarrow",
                    )
                    arm, arm_vars = _compile_path_pattern(scoped, el[1])

                    def tag_g(t: pa.Table, _g=gv, _v=gname) -> pa.Table:
                        if t.num_columns == 0:
                            return t
                        kc, dc, lc = _mco(_v)
                        from ..model import KIND_IRI

                        n2 = t.num_rows
                        return t.append_column(
                            _v, pa.array([_g] * n2, pa.large_string())
                        ).append_column(
                            kc, pa.array([KIND_IRI] * n2, pa.int8())
                        ).append_column(
                            dc, pa.array([""] * n2, pa.large_string())
                        ).append_column(
                            lc, pa.array([""] * n2, pa.large_string()))

                    arms.append((arm.map_batches(
                        tag_g, batch_format="pyarrow"),
                        sorted(arm_vars + [gname])))
                if not arms:
                    from ..model import TRIPLE_SCHEMA

                    rel = rd.from_arrow(pa.table(
                        {gname: pa.array([], pa.large_string())}))
                    rel_vars = [gname]
                else:
                    rel_vars = arms[0][1]
                    rel = arms[0][0]
                    for a_ds, _ in arms[1:]:
                        rel = rel.union(a_ds)
                how = "inner"
                if acc is None:
                    acc = _align_columns(rel, rel_vars, rel_vars)
                    acc_vars = rel_vars
                else:
                    acc, acc_vars = _join_bindings(
                        acc, acc_vars, rel, rel_vars, how)
                continue
            scoped = triples_ds
            if isinstance(graph, str):
                scoped = triples_ds.map_batches(
                    lambda t, _g=graph: t.filter(pc.equal(t["g"], _g))
                    if t.num_columns and "g" in t.schema.names
                    else t,
                    batch_format="pyarrow",
                )
            rel, rel_vars = _compile_path_pattern(scoped, el[1])
            how = "inner"
        elif el[0] == "subquery":
            proj_spec = el[1].get("project")
            projects_g = isinstance(graph, Var) and (
                proj_spec is None  # SELECT * projects every inner var
                or any(p[0] == "var" and p[1] == graph.name
                       for p in proj_spec)
            )
            if isinstance(graph, Var) and not projects_g:
                # subquery scoping: an inner var spelled like the outer
                # GRAPH var is a DIFFERENT variable (only projected vars
                # escape) — propagate the scope under a hidden name and
                # rename the graph column afterwards
                hidden = "__graph_scope"
                rel, rel_vars = _exec_select(
                    triples_ds, el[1], graph=Var(hidden))
                from .bgp import meta_cols_of

                ren = {hidden: graph.name}
                for a, b in zip(meta_cols_of(hidden),
                                meta_cols_of(graph.name)):
                    ren[a] = b

                def _ren(t: pa.Table, _m=dict(ren)) -> pa.Table:
                    if t.num_columns == 0:
                        return t
                    return t.rename_columns(
                        [_m.get(c, c) for c in t.schema.names])

                rel = rel.map_batches(_ren, batch_format="pyarrow")
                rel_vars = sorted(
                    graph.name if v == hidden else v for v in rel_vars)
            else:
                rel, rel_vars = _exec_select(triples_ds, el[1], graph=graph)
            how = "inner"
        elif el[0] == "lateral":
            # ARQ LATERAL: correlated right side, realized distributed
            # (windowed subqueries → per-key groups, plain groups →
            # join + deferred outer-referencing filters)
            lg = el[1]
            if acc is None:
                rel, rel_vars = _compile_group(triples_ds, lg, graph=graph)
                rel_partial = _group_maybe_partial(lg)
                how = "inner"
            else:
                rel, rel_vars, deferred, lhow = _lateral_rel(
                    triples_ds, lg, acc_vars, graph)
                acc, acc_vars = _join_bindings(
                    acc, acc_vars, rel, rel_vars, lhow,
                    maybe_partial=(acc_partial,
                                   _group_maybe_partial(lg)))
                if lhow == "left_outer" or _group_maybe_partial(lg):
                    acc_partial = True
                if deferred:
                    acc = _apply_filter_exprs(acc, deferred)
                continue
        elif el[0] == "optional":
            inner = el[1]
            # NOTE OPTIONAL { LATERAL { X } } correlates only WITHIN
            # the optional group (bottom-up — jena's lateral-in-optional
            # golden applies the window GLOBALLY, not per outer row)
            # PF-only OPTIONAL (e.g. OPTIONAL { ?x apf:splitIRI (..) })
            # evaluates by SUBSTITUTION against the left bindings
            # (PFuncSimple.execEvaluated per binding): apply the PFs to
            # the accumulator directly, null outputs on misses
            if acc is not None and not inner.get("filters"):
                from .propfunc import (SIMPLE_PFS, apply_pf, has_pf,
                                       split_pf_patterns)

                els = inner.get("elements", ())
                if len(els) == 1 and els[0][0] == "bgp" \
                        and has_pf(els[0][1]):
                    segs = split_pf_patterns(els[0][1])
                    if all(not plain for plain, _ in segs) and all(
                            p is not None and p[2] in SIMPLE_PFS
                            for _, p in segs):
                        for _, p in segs:
                            acc, acc_vars = apply_pf(
                                acc, acc_vars, p, triples_ds, graph,
                                optional=True)
                        acc_partial = True
                        continue
            # LeftJoin(Ω1, Ω2, expr) — a FILTER inside OPTIONAL that
            # names a variable bound only on the LEFT side is the join
            # CONDITION, evaluated over the merged solution
            # (section 18.5; QueryIterNestedLoopLeftJoin). Realized as
            # Filter(expr, Join) ∪ (Ω1 ∖ matched-left-rows).
            deferred = []
            if acc is not None and inner.get("filters"):
                ivars = _group_vars(inner)
                deferred = [
                    f for f in inner["filters"]
                    if (_expr_vars(f) - ivars) & set(acc_vars)
                ]
            if deferred:
                inner = dict(inner)
                inner["filters"] = [
                    f for f in inner["filters"] if f not in deferred]
                rel, rel_vars = _compile_group(triples_ds, inner, graph=graph)
                acc, acc_vars = _left_join_conditional(
                    acc, acc_vars, rel, rel_vars, deferred,
                    maybe_partial=(acc_partial,
                                   _group_maybe_partial(inner)))
                acc_partial = True
                continue
            rel, rel_vars = _compile_group(triples_ds, el[1], graph=graph)
            how = "left_outer"
        elif el[0] == "unfold":
            if acc is None:
                raise RDFParseError("SPARQL: UNFOLD cannot open a group")
            _, src, v1, v2 = el
            acc = acc.map_batches(_unfold_kernel(src, v1, v2),
                                  batch_format="pyarrow")
            acc_vars = sorted(set(acc_vars) | {v1}
                              | ({v2} if v2 else set()))
            acc_partial = True  # null elements leave v1/v2 unbound
            continue
        elif el[0] == "minus":
            if acc is None:
                raise RDFParseError("SPARQL: MINUS cannot open a group")
            rel, rel_vars = _compile_group(triples_ds, el[1], graph=graph)
            acc, acc_vars = _minus_bindings(acc, acc_vars, rel, rel_vars)
            continue
        elif el[0] == "relation":
            # a pre-bound binding relation injected programmatically
            # (sparql_select_prebound — SHACL ASK-validator pre-binding
            # as a join): a Dataset whose columns are the named vars
            # (+ optional __kind/__dt/__lang meta columns)
            rel, rel_vars = el[1], sorted(el[2])
            how = "inner"
        elif el[0] == "values":
            import ray.data as rd

            from .bgp import meta_cols_of

            _, vnames, rows, metas = el
            cols: dict = {}
            for i, v in enumerate(vnames):
                cols[v] = pa.array([r[i] for r in rows], pa.large_string())
                kc, dc, lc = meta_cols_of(v)
                cols[kc] = pa.array(
                    [m[i][0] if m[i] else None for m in metas], pa.int8())
                cols[dc] = pa.array(
                    [m[i][1] if m[i] else "" for m in metas],
                    pa.large_string())
                cols[lc] = pa.array(
                    [m[i][2] if m[i] else "" for m in metas],
                    pa.large_string())
            rel = rd.from_arrow(pa.table(cols))
            rel_vars = sorted(vnames)
            rel_partial = any(x is None for r in rows for x in r)
            how = "inner"
        elif el[0] in ("bind", "letbind"):
            if acc is None:
                # BIND over the unit solution (a group opening with BIND)
                acc = rd.from_arrow(pa.table(
                    {"__exists": pa.array(["1"], pa.large_string())}))
                acc_vars = []
            _, expr, var = el
            if var in acc_vars:
                if el[0] == "bind":
                    raise RDFParseError(
                        f"SPARQL: BIND reassigns bound ?{var}")
                # ARQ LET on an already-bound var: per-row sameValueAs
                # gate (QueryIterAssign) — bound+equal keeps the row,
                # bound+different drops it, eval error or unbound old
                # value leaves the solution alive (assign-08/09)
                acc = acc.map_batches(
                    _let_rebind_kernel(expr, var), batch_format="pyarrow")
                continue
            new_vars = sorted(acc_vars + [var])

            def bind_kernel(t: pa.Table, _expr=expr, _var=var,
                            _vars=tuple(new_vars)) -> pa.Table:
                from .bgp import is_meta_col, meta_cols_of

                if t.num_columns == 0:
                    cols0: dict = {}
                    for v in _vars:
                        cols0[v] = pa.array([], pa.large_string())
                        kc0, dc0, lc0 = meta_cols_of(v)
                        cols0[kc0] = pa.array([], pa.int8())
                        cols0[dc0] = pa.array([], pa.large_string())
                        cols0[lc0] = pa.array([], pa.large_string())
                    return pa.table(cols0)
                val = _eval_value(_expr, t)
                if isinstance(val, pa.Scalar):
                    col = pa.array([val.as_py()] * t.num_rows)
                else:
                    col = val
                if pa.types.is_boolean(col.type):
                    col = pc.if_else(
                        col, pa.scalar("true", pa.large_string()),
                        pa.scalar("false", pa.large_string()))
                if not pa.types.is_string(col.type) and not pa.types.is_large_string(col.type):
                    # numeric → canonical lexical form (ints print bare)
                    as_int = pc.cast(col, pa.int64(), safe=False)
                    integral = pc.all(
                        pc.equal(pc.cast(as_int, pa.float64()),
                                 pc.cast(col, pa.float64()))
                    ).as_py()
                    col = pc.cast(as_int if integral else col, pa.large_string())
                else:
                    col = pc.cast(col, pa.large_string())
                cols = {v: t[v].combine_chunks() for v in _vars if v != _var}
                cols[_var] = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                out = {v: cols[v] for v in _vars}
                # meta passthrough for existing vars; the bound var gets
                # plain-literal defaults
                for c in t.schema.names:
                    if is_meta_col(c):
                        out[c] = t[c].combine_chunks()
                kc, dc, lc = meta_cols_of(_var)
                if kc not in out:
                    from ..model import KIND_LITERAL, XSD_NS

                    static = _expr_static_meta(_expr)
                    if (_expr[0] == "cdtfn"
                            and _expr[1] in ("get", "head")):
                        # dynamic element type: per-row term metadata
                        # (a blank-node element stays a blank node)
                        _l2, k2, d2, g2 = _eval_cdtfn(
                            _expr, t, with_meta=True)
                        out[kc], out[dc], out[lc] = k2, d2, g2
                    elif _expr[0] in ("tripleexpr", "ttcomp"):
                        # triple-term expressions: per-row term metadata
                        # (kind 3 for TRIPLE(); component kind for
                        # SUBJECT/PREDICATE/OBJECT)
                        _l2, k2, d2, g2 = _tt_term_arrays(_expr, t)
                        out[kc], out[dc], out[lc] = k2, d2, g2
                    elif static is not None:
                        s_kind, s_dt, s_lang = static
                        valid = pc.is_valid(out[_var])
                        out[kc] = pc.if_else(
                            valid, pa.scalar(s_kind, pa.int8()),
                            pa.scalar(None, pa.int8()))
                        out[dc] = pa.array([s_dt] * t.num_rows,
                                           pa.large_string())
                        out[lc] = pa.array([s_lang] * t.num_rows,
                                           pa.large_string())
                    elif _is_numeric_node(_expr):
                        # a numeric expression yields a TYPED value
                        # (NodeValueOps promotion): integral → integer
                        num = pc.cast(out[_var], pa.float64())
                        integral = pc.fill_null(pc.equal(
                            pc.cast(pc.cast(num, pa.int64(), safe=False),
                                    pa.float64()), num), False)
                        out[kc] = pc.if_else(
                            pc.is_valid(out[_var]),
                            pa.scalar(KIND_LITERAL, pa.int8()),
                            pa.scalar(None, pa.int8()))
                        out[dc] = pc.if_else(
                            integral,
                            pa.scalar(XSD_NS + "integer", pa.large_string()),
                            pa.scalar(XSD_NS + "decimal", pa.large_string()))
                    else:
                        out[kc] = pa.nulls(t.num_rows, pa.int8())
                        out[dc] = pa.array([""] * t.num_rows,
                                           pa.large_string())
                    out[lc] = pa.array([""] * t.num_rows, pa.large_string())
                return pa.table(out)

            acc = acc.map_batches(bind_kernel, batch_format="pyarrow")
            acc_vars = new_vars
            acc_partial = True  # a BIND error leaves the var unbound
            continue
        elif el[0] == "union":
            arms = [_compile_group(triples_ds, a, graph=graph) for a in el[1]]
            rel_vars = sorted(set().union(*(set(v) for _, v in arms)))
            rel_partial = (
                any(set(v) != set(rel_vars) for _, v in arms)
                or any(_group_maybe_partial(a) for a in el[1])
            )
            rel = _align_columns(arms[0][0], arms[0][1], rel_vars)
            for a_ds, a_vars in arms[1:]:
                rel = rel.union(_align_columns(a_ds, a_vars, rel_vars))
            how = "inner"
        else:  # pragma: no cover
            raise RDFParseError(f"SPARQL: unknown group element {el[0]!r}")
        if acc is None:
            if how == "left_outer":
                # the group OPENS with OPTIONAL: LeftJoin(unit, P) —
                # P when non-empty, else the single all-unbound
                # solution survives (SPARQL §18.5; ARQ
                # filter-equality-04/13)
                from .bgp import meta_cols_of
                from ..util import fast_count

                n_rel, rel = fast_count(rel)
                if n_rel == 0:
                    cols = {"__exists": pa.array(["1"],
                                                 pa.large_string())}
                    for v in rel_vars:
                        cols[v] = pa.array([None], pa.large_string())
                        kc, dc, lc = meta_cols_of(v)
                        cols[kc] = pa.array([None], pa.int8())
                        cols[dc] = pa.array([None], pa.large_string())
                        cols[lc] = pa.array([None], pa.large_string())
                    acc = rd.from_arrow(pa.table(cols))
                    acc_vars = rel_vars
                    acc_partial = True
                    continue
            if rel_vars:
                acc = _align_columns(rel, rel_vars, rel_vars)
            else:
                acc = rel  # unit relation: keep the __exists marker rows
            acc_vars = rel_vars
            if rel_partial:
                # a partial FIRST element (mixed-var UNION / nested
                # VALUES UNDEF) makes the accumulator partial too
                acc_partial = True
        else:
            acc, acc_vars = _join_bindings(
                acc, acc_vars, rel, rel_vars, how,
                maybe_partial=(acc_partial, rel_partial))
            if how == "left_outer" or rel_partial:
                acc_partial = True
    if acc is None and (group["filters"] or group.get("exists")):
        # only FILTERs / bare [NOT] EXISTS elements: evaluate them
        # over the unit solution (ASK { NOT EXISTS {..} }, neg-01)
        acc = rd.from_arrow(pa.table(
            {"__exists": pa.array(["1"], pa.large_string())}))
        acc_vars = []
    if acc is None:
        if not group["filters"] and not group.get("exists"):
            if isinstance(graph, Var):
                # GRAPH ?g {}: one solution per named graph (the empty
                # inner group is unit — ?g ranges over graph names)
                from .bgp import meta_cols_of
                from ..model import KIND_IRI

                gname = graph.name
                kc, dc, lc = meta_cols_of(gname)

                def gkernel(t: pa.Table, _v=gname) -> pa.Table:
                    if t.num_columns == 0 or "g" not in t.schema.names:
                        return pa.table(
                            {_v: pa.array([], pa.large_string())})
                    g = t["g"].combine_chunks().cast(pa.large_string())
                    x = pc.drop_null(pc.unique(
                        pc.if_else(pc.not_equal(g, ""), g,
                                   pa.scalar(None, pa.large_string()))))
                    return pa.table({_v: x})

                names_ds = triples_ds.map_batches(
                    gkernel, batch_format="pyarrow")
                names_ds = names_ds.groupby(gname).count().map_batches(
                    lambda t, _v=gname: pa.table({
                        _v: t[_v].combine_chunks().cast(pa.large_string()),
                        kc: pa.array([KIND_IRI] * t.num_rows, pa.int8()),
                        dc: pa.array([""] * t.num_rows, pa.large_string()),
                        lc: pa.array([""] * t.num_rows, pa.large_string()),
                    }) if t.num_columns else t,
                    batch_format="pyarrow",
                )
                return names_ds, [gname]
            if isinstance(graph, str) and graph:
                # GRAPH <g> {}: unit iff the named graph is non-empty
                gate = triples_ds.map_batches(
                    lambda t, _g=graph: pa.table({"__exists": pa.array(
                        ["1"] * t.filter(pc.equal(t["g"], _g)).num_rows,
                        pa.large_string())})
                    if t.num_columns and "g" in t.schema.names
                    else pa.table(
                        {"__exists": pa.array([], pa.large_string())}),
                    batch_format="pyarrow",
                ).limit(1)
                return gate, []
            # empty group pattern {} = the unit solution: one empty
            # binding (SPARQL 18.5 — Join(unit, X) = X)
            acc = rd.from_arrow(pa.table(
                {"__exists": pa.array(["1"], pa.large_string())}))
            return acc, []
        raise RDFParseError("SPARQL: empty WHERE block")
    if group["filters"]:
        filters = group["filters"]
        # EXISTS nested inside a filter EXPRESSION: each occurrence is
        # compiled to a per-row boolean marker column by a semi-join
        # over the accumulated bindings, and the AST node rewritten to
        # a column reference the kernel reads
        ex_nodes: list = []

        def _rw_exists(n):
            if isinstance(n, list):
                return [_rw_exists(x) for x in n]
            if not isinstance(n, tuple) or not n:
                return n
            if n[0] == "existsexpr":
                col = f"__exm_{len(ex_nodes)}"
                ex_nodes.append((col, n[2]))
                markref = ("exists_marker", col)
                return markref if n[1] else ("not", markref)
            return tuple(_rw_exists(x) for x in n)

        filters = [_rw_exists(f) for f in filters]
        for col, sub in ex_nodes:
            rel, rel_vars = _compile_group(triples_ds, sub, graph=graph)
            acc = _exists_mark(acc, acc_vars, rel, rel_vars, col)

        def kernel(t: pa.Table) -> pa.Table:
            if t.num_columns == 0:
                from .bgp import meta_cols_of

                cols: dict = {}
                for v in acc_vars:
                    cols[v] = pa.array([], pa.large_string())
                    kc, dc, lc = meta_cols_of(v)
                    cols[kc] = pa.array([], pa.int8())
                    cols[dc] = pa.array([], pa.large_string())
                    cols[lc] = pa.array([], pa.large_string())
                return pa.table(cols)
            mask = None
            for f in filters:
                m = _eval_bool(f, t)
                # SPARQL: an error/null in a FILTER is effective false
                m = pc.fill_null(m, False)
                mask = m if mask is None else pc.and_(mask, m)
            x = t.filter(mask)
            if ex_nodes:
                x = x.select([c for c in x.schema.names
                              if not c.startswith("__exm_")])
            return x

        acc = acc.map_batches(kernel, batch_format="pyarrow")
    for positive, sub in group.get("exists", ()):
        rel, rel_vars = _compile_group(triples_ds, sub, graph=graph)
        acc, acc_vars = _exists_bindings(acc, acc_vars, rel, rel_vars,
                                         positive)
    return acc, acc_vars


def sparql_ask(triples_ds, query_text: str, base: str = "",
               arq: bool = False) -> bool:
    """ASK { ... } → does any solution exist (OpSlice 1 + nonempty)."""
    q = _Parser(query_text, base=base, arq=arq).parse()
    if q["form"] != "ask":
        raise RDFParseError("sparql_ask: not an ASK query")
    bindings, _ = _compile_group(triples_ds, q["group"], graph="")
    return len(bindings.limit(1).take(1)) > 0


def sparql_construct(triples_ds, query_text: str, base: str = "",
                     arq: bool = False):
    """CONSTRUCT { template } WHERE { ... } → triple-table Dataset
    (TRIPLE_SCHEMA; bnodes/paths not allowed in the template subset).
    Template constants are IRIs; bound values whose lexical form is not
    an IRI-shaped string become plain literals."""
    from ..model import KIND_IRI, KIND_LITERAL, TRIPLE_SCHEMA, XSD_STRING

    q = _Parser(query_text, base=base, arq=arq).parse()
    if q["form"] != "construct":
        raise RDFParseError("sparql_construct: not a CONSTRUCT query")
    bindings, all_vars = _compile_group(triples_ds, q["group"], graph="")
    out = _instantiate_template(bindings, all_vars, q["template"], "construct")
    # CONSTRUCT produces a GRAPH — a set of triples (SPARQL 16.2);
    # duplicate instantiations collapse
    from ..stages.dedup import exact_dedup

    out = exact_dedup(out)
    if q["limit"] is not None:
        out = out.limit(q["limit"])
    return out


def _unfold_kernel(src: str, v1: str, v2: str | None):
    """UNFOLD(?src AS ?v1[, ?v2]) batch kernel: one output row per CDT
    element/entry of each input row's ?src (per-row term metadata on
    the new vars; ill-typed / unbound ?src eliminates the row)."""
    from ..model import KIND_LITERAL, XSD_NS
    from ..rdf.cdt import (CDT_LIST, CDT_MAP, format_cdt_list,
                           format_cdt_map, parse_cdt_list, parse_cdt_map)
    from .bgp import meta_cols_of

    int_dt = XSD_NS + "integer"

    def term_cols(e):
        # element → (lex, kind, dt, lang); None = unbound
        if e is None:
            return (None, None, "", "")
        if isinstance(e, list):
            return (format_cdt_list(e), KIND_LITERAL, CDT_LIST, "")
        if isinstance(e, dict):
            return (format_cdt_map(e), KIND_LITERAL, CDT_MAP, "")
        k, l, d, g = e
        return (l, k, d, g)

    def kern(t: pa.Table) -> pa.Table:
        new_vars = [v1] + ([v2] if v2 else [])
        if t.num_columns == 0:
            cols0: dict = {}
            for v in new_vars:
                cols0[v] = pa.array([], pa.large_string())
                kc, dc, lc = meta_cols_of(v)
                cols0[kc] = pa.array([], pa.int8())
                cols0[dc] = pa.array([], pa.large_string())
                cols0[lc] = pa.array([], pa.large_string())
            return pa.table(cols0)
        names = t.schema.names
        lex = (t[src].combine_chunks().cast(pa.large_string()).to_pylist()
               if src in names else [None] * t.num_rows)
        dc_src = src + "__dt"
        dts = (pc.fill_null(t[dc_src].combine_chunks()
                            .cast(pa.large_string()), "").to_pylist()
               if dc_src in names else [""] * t.num_rows)
        take: list[int] = []
        out1: list = []
        out2: list = []
        for i, (lx, d) in enumerate(zip(lex, dts)):
            if lx is None:
                continue  # unbound source: row eliminated
            try:
                if d == CDT_MAP:
                    entries = [(term_cols(k), term_cols(v))
                               for k, v in parse_cdt_map(lx).items()]
                elif d == CDT_LIST:
                    vals = parse_cdt_list(lx)
                    entries = [
                        (term_cols(e),
                         (str(j + 1), KIND_LITERAL, int_dt, ""))
                        for j, e in enumerate(vals)]
                else:
                    continue  # not a CDT literal: row eliminated
            except Exception:
                continue
            for a, b in entries:
                take.append(i)
                out1.append(a)
                out2.append(b)
        base = t.take(pa.array(take, pa.int64()))
        cols = {c: base[c].combine_chunks() for c in names}

        def put(v, data):
            kc, dc, lc = meta_cols_of(v)
            cols[v] = pa.array([x[0] for x in data], pa.large_string())
            cols[kc] = pa.array([x[1] for x in data], pa.int8())
            cols[dc] = pa.array([x[2] or "" for x in data],
                                pa.large_string())
            cols[lc] = pa.array([x[3] or "" for x in data],
                                pa.large_string())

        put(v1, out1)
        if v2:
            put(v2, out2)
        return pa.table(cols)

    return kern


def _with_block_ordinal(ds):
    """Append a deterministic per-block ordinal column ``__blk`` —
    block identity for existential (template-bnode) freshness, assigned
    from the materialized block order, stable under task retry."""
    import ray
    import ray.data as rd

    mat = ds.materialize()
    refs = mat.to_arrow_refs()
    if not refs:
        return mat

    @ray.remote(num_cpus=0.25)
    def _tag_blk(t: pa.Table, i: int) -> pa.Table:
        if t.num_columns == 0:
            return t
        return t.append_column("__blk",
                               pa.array([i] * t.num_rows, pa.int64()))

    return rd.from_arrow_refs(
        [_tag_blk.remote(r, i) for i, r in enumerate(refs)])


def _instantiate_template(bindings, all_vars, template, doc_id: str):
    """Binding relation × triple template → TRIPLE_SCHEMA Dataset
    (shared by CONSTRUCT and the update INSERT/DELETE templates; the
    reference's TemplateLib.subst). Template constants are IRIs; bound
    values whose lexical form is not IRI-shaped become plain literals;
    rows with an unbound template var emit no triple."""
    from ..model import KIND_IRI, KIND_LITERAL, TRIPLE_SCHEMA, XSD_NS, XSD_STRING

    quads = [(p[0], p[1], p[2], p[3] if len(p) > 3 else "")
             for p in template]

    def _term_has_bnode(x) -> bool:
        if isinstance(x, BNode):
            return True
        if isinstance(x, TTPat):
            return any(_term_has_bnode(c) for c in (x.s, x.p, x.o))
        return False

    has_bnode = any(
        _term_has_bnode(x) for q in quads for x in (q[0], q[2]))
    if has_bnode:
        # fresh bnode PER SOLUTION requires a globally unique row
        # identity: a deterministic block ordinal (content hashing is
        # wrong — two blocks with identical content, e.g. a UNION of
        # identical arms, must still yield DISTINCT existentials)
        bindings = _with_block_ordinal(bindings)

    def emit(t: pa.Table) -> pa.Table:
        from ..model import KIND_BNODE

        names = t.schema.names
        cols: dict[str, list] = {n: [] for n in TRIPLE_SCHEMA.names}
        if t.num_columns:
            data = {c: t[c].to_pylist() for c in names}
            n_rows = t.num_rows

            class _NoBind:
                # a template var absent from the bindings: every row
                # reads None → the quad is skipped, never a wildcard
                def __getitem__(self, _i):
                    return None

            _NOBIND = _NoBind()
            if has_bnode:
                # deterministic block scope: fresh bnode PER SOLUTION
                # (TemplateLib: template bnodes are existentials), same
                # across quads of one solution, unique across blocks via
                # the assigned ordinal, stable under task retry
                bscope = f"{doc_id}.b{data['__blk'][0]}"
                data.pop("__blk", None)
            def tt_tuple(node, i):
                """Template triple-term component → (kind, lex, dt,
                lang) term tuple for solution row i, or None when a
                component var is unbound (the quad is skipped)."""
                from ..model import KIND_BNODE as _KB
                from ..model import KIND_TRIPLE_TERM as _KT

                if isinstance(node, TTPat):
                    st = tt_tuple(node.s, i)
                    pt = tt_tuple(node.p, i)
                    ot = tt_tuple(node.o, i)
                    if st is None or pt is None or ot is None:
                        return None
                    if st[0] not in (KIND_IRI, _KB) or pt[0] != KIND_IRI:
                        return None
                    from ..rdf.tripleterm import serialize_tt

                    return (_KT, serialize_tt(st, pt, ot), "", "")
                if isinstance(node, Var):
                    lx = data.get(node.name, _NOBIND)[i]
                    if lx is None:
                        return None
                    kind = data.get(node.name + "__kind",
                                    (None,) * n_rows)[i]
                    dt = data.get(node.name + "__dt", (None,) * n_rows)[i]
                    lang = data.get(node.name + "__lang",
                                    (None,) * n_rows)[i] or ""
                    if isinstance(lx, bool):
                        return (KIND_LITERAL, "true" if lx else "false",
                                XSD_NS + "boolean", "")
                    if isinstance(lx, (int, float)):
                        if isinstance(lx, float) and lx != int(lx):
                            return (KIND_LITERAL, str(lx),
                                    XSD_NS + "decimal", "")
                        return (KIND_LITERAL, str(int(lx)),
                                XSD_NS + "integer", "")
                    if kind is None:
                        is_iri = isinstance(lx, str) and lx.startswith(
                            ("http://", "https://", "urn:", "file://"))
                        kind = KIND_IRI if is_iri else KIND_LITERAL
                        dt = ""
                    return (kind, lx, dt or "", lang)
                if isinstance(node, BNode):
                    return (_KB, f"{node.label}.{bscope}.{i}", "", "")
                if isinstance(node, Lit):
                    dt = next((d for d in (node.dts or ()) if d), "")
                    if node.lang:
                        dt = ""
                    return (KIND_LITERAL, node.lex, dt, node.lang or "")
                return (KIND_IRI, node, "", "")

            for i in range(n_rows):
                for s, p, o, g in quads:
                    if isinstance(s, BNode):
                        sv = f"{s.label}.{bscope}.{i}"
                    else:
                        sv = (data.get(s.name, _NOBIND)[i]
                              if isinstance(s, Var) else s)
                    pv = (data.get(p.name, _NOBIND)[i]
                          if isinstance(p, Var) else p)
                    gv = (data.get(g.name, _NOBIND)[i]
                          if isinstance(g, Var) else g)
                    s_kind = KIND_BNODE if isinstance(s, BNode) else KIND_IRI
                    if isinstance(s, Var):
                        sk = data.get(s.name + "__kind", (None,) * n_rows)[i]
                        if sk is not None:
                            s_kind = sk
                    if isinstance(o, Var):
                        ov = data.get(o.name, _NOBIND)[i]
                        # a store-sourced binding carries its term
                        # metadata — round-trip it instead of guessing
                        o_kind = data.get(
                            o.name + "__kind", (None,) * n_rows)[i]
                        o_dt = data.get(
                            o.name + "__dt", (None,) * n_rows)[i]
                        o_lang = data.get(
                            o.name + "__lang", (None,) * n_rows)[i] or ""
                        if o_kind is None:
                            o_is_iri = isinstance(ov, str) and ov.startswith(
                                ("http://", "https://", "urn:", "file://")
                            )
                            o_kind = KIND_IRI if o_is_iri else KIND_LITERAL
                            o_dt = "" if o_is_iri else XSD_STRING
                        elif o_dt is None:
                            o_dt = ""
                    elif isinstance(o, TTPat):
                        tup = tt_tuple(o, i)
                        if tup is None:
                            ov, o_dt, o_lang, o_kind = None, "", "", None
                        else:
                            o_kind, ov, o_dt, o_lang = tup
                    elif isinstance(o, Lit):
                        ov = o.lex
                        o_dt = next((d for d in (o.dts or ()) if d),
                                    XSD_STRING)
                        o_lang = o.lang or ""
                        if o_lang:
                            o_dt = ""
                        o_kind = KIND_LITERAL
                    elif isinstance(o, BNode):
                        ov = f"{o.label}.{bscope}.{i}"
                        o_dt, o_lang = "", ""
                        o_kind = KIND_BNODE
                    else:
                        ov, o_dt, o_lang = o, "", ""
                        o_kind = KIND_IRI
                    if sv is None or pv is None or ov is None or gv is None:
                        continue  # unbound OPTIONAL var: skip the triple
                    if isinstance(ov, bool):
                        ov, o_dt = ("true" if ov else "false"),  \
                            XSD_NS + "boolean"
                        o_kind = KIND_LITERAL
                    elif isinstance(ov, (int, float)):
                        # numeric binding (subquery aggregate alias):
                        # canonical lexical + numeric datatype
                        if isinstance(ov, float) and ov != int(ov):
                            ov, o_dt = str(ov), XSD_NS + "decimal"
                        else:
                            ov, o_dt = str(int(ov)), XSD_NS + "integer"
                        o_kind = KIND_LITERAL
                    cols["s_kind"].append(s_kind)
                    cols["s_lex"].append(sv)
                    cols["p"].append(pv)
                    cols["o_kind"].append(o_kind)
                    cols["o_lex"].append(ov)
                    cols["o_datatype"].append(o_dt)
                    cols["o_lang"].append(o_lang)
                    cols["g"].append(gv)
                    cols["doc_id"].append(doc_id)
        return pa.Table.from_arrays(
            [pa.array(cols[f.name], f.type) for f in TRIPLE_SCHEMA],
            schema=TRIPLE_SCHEMA,
        )

    return bindings.map_batches(emit, batch_format="pyarrow")


def _ground_triples_table(template) -> pa.Table:
    """Ground INSERT/DELETE DATA quads → TRIPLE_SCHEMA arrow table."""
    from ..model import KIND_IRI, KIND_LITERAL, TRIPLE_SCHEMA, XSD_STRING

    from ..model import KIND_BNODE

    cols: dict[str, list] = {n: [] for n in TRIPLE_SCHEMA.names}
    for pat in template:
        s, p, o = pat[0], pat[1], pat[2]
        g = pat[3] if len(pat) > 3 else ""
        s_kind = KIND_IRI
        if isinstance(s, BNode):
            # same label within one DATA block = same node (scoped to
            # the request — UpdateDataWriter's bnode handling)
            s_kind, s = KIND_BNODE, "upd_" + s.label
        if isinstance(o, BNode):
            cols["s_kind"].append(s_kind)
            cols["s_lex"].append(s)
            cols["p"].append(p)
            cols["o_kind"].append(KIND_BNODE)
            cols["o_lex"].append("upd_" + o.label)
            cols["o_datatype"].append("")
            cols["o_lang"].append("")
            cols["g"].append(g)
            cols["doc_id"].append("update")
            continue
        if isinstance(o, TTPat):
            from ..model import KIND_TRIPLE_TERM

            def upd_bnodes(tp):
                def f(x):
                    if isinstance(x, TTPat):
                        return upd_bnodes(x)
                    if isinstance(x, BNode):
                        return BNode("upd_" + x.label)
                    return x

                return TTPat(f(tp.s), f(tp.p), f(tp.o))

            from .bgp import tt_ground_lex as _tgl

            o_lex = _tgl(upd_bnodes(o))
            if o_lex is None:
                raise RDFParseError(
                    "SPARQL update: DATA triple terms must be ground")
            o_lang, o_dt = "", ""
            o_kind = KIND_TRIPLE_TERM
        elif isinstance(o, Lit):
            o_lex = o.lex
            o_lang = o.lang or ""
            o_dt = "" if o_lang else next(
                (d for d in (o.dts or ()) if d), XSD_STRING)
            o_kind = KIND_LITERAL
        else:
            # parse_term yields a bare str only for IRIs/pnames
            o_lex, o_lang = o, ""
            o_kind = KIND_IRI
            o_dt = ""
        cols["s_kind"].append(s_kind)
        cols["s_lex"].append(s)
        cols["p"].append(p)
        cols["o_kind"].append(o_kind)
        cols["o_lex"].append(o_lex)
        cols["o_datatype"].append(o_dt)
        cols["o_lang"].append(o_lang)
        cols["g"].append(g)
        cols["doc_id"].append("update")
    return pa.Table.from_arrays(
        [pa.array(cols[f.name], f.type) for f in TRIPLE_SCHEMA],
        schema=TRIPLE_SCHEMA,
    )


_DEL_KEY = ["s_lex", "p", "o_lex", "g"]


def _delete_triples(store, del_ds):
    """Remove every store row whose (s_lex, p, o_lex, g) quad key
    appears in ``del_ds`` — a distributed marker anti-join
    (set-semantics DELETE: all copies of a matched quad go, whatever
    their doc_id).
    The delete side is deduped to distinct keys first so the join
    can't fan out."""
    from ..util import compact_blocks

    keys = compact_blocks(
        del_ds.map_batches(
            lambda t: pa.table(
                {**{c: t[c].combine_chunks().cast(pa.large_string())
                    for c in _DEL_KEY}}
            )
            if t.num_columns
            else t,
            batch_format="pyarrow",
        )
        .groupby(_DEL_KEY)
        .count()
        .map_batches(
            lambda t: pa.table(
                {**{c: t[c].combine_chunks().cast(pa.large_string())
                    for c in _DEL_KEY},
                 "__del": pa.array([1] * t.num_rows, pa.int8())}
            )
            if t.num_columns
            else t,
            batch_format="pyarrow",
        )
    )
    left = compact_blocks(store)
    if keys.count() == 0 or left.count() == 0:
        return left
    n_parts = max(1, min(64, left.count() // 2_000_000))
    joined = left.join(keys, join_type="left_outer",
                       num_partitions=n_parts, on=tuple(_DEL_KEY))

    def sieve(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return t
        keep = t.filter(pc.is_null(t["__del"]))
        return keep.drop_columns(["__del"])

    return joined.map_batches(sieve, batch_format="pyarrow")


def sparql_update(triples_ds, update_text: str):
    """SPARQL 1.1 Update over the triple Dataset → updated Dataset
    (jena-arq UpdateAction.execute / modify/UpdateEngineWorker rebuilt on
    Dataset algebra). Subset: INSERT DATA / DELETE DATA (ground,
    default graph), DELETE WHERE, DELETE {} INSERT {} WHERE {}, CLEAR;
    ';'-separated operations apply sequentially, each seeing its
    predecessors' effects (§3.1.3: within one modify, WHERE evaluates
    against the pre-state, deletes apply before inserts).

    Execution shape: INSERT = union + hash-partitioned exact dedup
    (set semantics); DELETE = distinct-key marker anti-join; templates
    instantiate over the WHERE bindings with the CONSTRUCT machinery.
    Everything stays a Dataset — no driver-sized state."""
    import ray.data as rd

    from ..stages.dedup import exact_dedup

    ops = _Parser(update_text).parse_update()
    store = triples_ds
    for op_i, op in enumerate(ops):
        if op["op"] == "load":
            # no network in this engine: LOAD SILENT is the spec's
            # failed-load no-op; a plain LOAD fails the request
            if op.get("silent"):
                continue
            raise RDFParseError(
                f"SPARQL update: LOAD <{op['src']}> needs network "
                "access (out of scope — use the file readers)")
        if op["op"] == "clear":
            what = op["what"]
            if what == "all":
                from ..model import TRIPLE_SCHEMA

                store = rd.from_arrow(TRIPLE_SCHEMA.empty_table())
            elif what == "default":
                store = store.map_batches(
                    lambda t: t.filter(pc.not_equal(t["g"], ""))
                    if t.num_columns
                    else t,
                    batch_format="pyarrow",
                )
            elif what == "named":
                store = store.map_batches(
                    lambda t: t.filter(pc.equal(t["g"], ""))
                    if t.num_columns
                    else t,
                    batch_format="pyarrow",
                )
            else:
                store = store.map_batches(
                    lambda t, _g=what: t.filter(pc.not_equal(t["g"], _g))
                    if t.num_columns
                    else t,
                    batch_format="pyarrow",
                )
        elif op["op"] == "insert_data":
            add = rd.from_arrow(_ground_triples_table(op["quads"]))
            store = exact_dedup(store.union(add))
        elif op["op"] == "delete_data":
            dels = rd.from_arrow(_ground_triples_table(op["quads"]))
            store = _delete_triples(store, dels)
        elif op["op"] == "modify":
            wg = op.get("with", "")
            where_store = store
            if op.get("using"):
                where_store = _using_view(store, op["using"])
            bindings, all_vars = _compile_group(
                where_store, op["group"], graph=wg or "")
            if op["delete"]:
                dels = _instantiate_template(
                    bindings, all_vars, op["delete"], f"update_{op_i}")
                store = _delete_triples(store, dels)
            if op["insert"]:
                # doc_id carries the operation index so template bnodes
                # from different operations never collide
                ins = _instantiate_template(
                    bindings, all_vars, op["insert"], f"update_{op_i}")
                store = exact_dedup(store.union(ins))
        elif op["op"] in ("add", "move", "copy"):
            src, dst = op["src"], op["dst"]
            if src == dst:
                continue

            def copy_rows(t: pa.Table, _s=src, _d=dst) -> pa.Table:
                if t.num_columns == 0:
                    return t
                x = t.filter(pc.equal(t["g"], _s))
                idx = x.schema.get_field_index("g")
                return x.set_column(
                    idx, "g",
                    pa.array([_d] * x.num_rows, pa.large_string()))

            copied = store.map_batches(copy_rows, batch_format="pyarrow")
            if op["op"] == "add":
                base = store
            else:
                rm = {dst} if op["op"] == "copy" else {dst, src}

                def keep(t: pa.Table, _rm=tuple(rm)) -> pa.Table:
                    if t.num_columns == 0:
                        return t
                    m = pc.invert(pc.is_in(
                        t["g"].combine_chunks().cast(pa.large_string()),
                        value_set=pa.array(list(_rm), pa.large_string())))
                    return t.filter(m)

                base = store.map_batches(keep, batch_format="pyarrow")
            store = exact_dedup(base.union(copied))
        else:  # pragma: no cover
            raise RDFParseError(f"SPARQL update: unknown op {op['op']!r}")
    return store


def _using_view(store, using: list):
    """USING / USING NAMED dataset for a modify's WHERE (SPARQL Update
    §3.1.3, like FROM/FROM NAMED): default graph = union of the USING
    graphs (renamed to ""), named graphs = the USING NAMED ones only."""
    defaults = [g for named, g in using if not named]
    named_gs = [g for named, g in using if named]

    def remap(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return t
        g = t["g"].combine_chunks().cast(pa.large_string())
        parts = []
        if defaults:
            # default-graph role: the union of the FROM graphs, renamed
            d = t.filter(pc.is_in(g, value_set=pa.array(
                defaults, pa.large_string())))
            idx = d.schema.get_field_index("g")
            parts.append(d.set_column(
                idx, "g",
                pa.array([""] * d.num_rows, pa.large_string())))
        if named_gs:
            # named-graph role: a graph may serve BOTH roles (FROM +
            # FROM NAMED), so these rows are emitted separately
            parts.append(t.filter(pc.is_in(g, value_set=pa.array(
                named_gs, pa.large_string()))))
        if not parts:
            return t.slice(0, 0)
        return pa.concat_tables(parts)

    return store.map_batches(remap, batch_format="pyarrow")


def sparql_describe(triples_ds, query_text: str, base: str = "",
                    arq: bool = False):
    """DESCRIBE (var|iri)+ [WHERE {...}] → the reference's default
    DescribeBNodeClosure handler semantics: over the UNION of the
    default and named graphs, every triple whose subject is a described
    node, plus the recursive blank-node closure of the objects.

    The node list is driver-materialized (distinct projected resources
    of the WHERE clause — same shape as the reference, which builds the
    description Model on the caller); the description triples stay a
    Dataset, filtered per closure round against a broadcast frontier."""
    from ..model import KIND_BNODE, KIND_IRI

    q = _Parser(query_text, base=base, arq=arq).parse()
    if q["form"] != "describe":
        raise RDFParseError("sparql_describe: not a DESCRIBE query")

    import ray

    from .bgp import meta_cols_of

    nodes: set[str] = set(q["nodes"])
    if q["group"] is not None:
        bindings, bvars = _compile_group(triples_ds, q["group"], graph="")
        want = bvars if q["star"] else [v for v in q["vars"] if v in bvars]
        for batch in bindings.iter_batches(batch_format="pyarrow"):
            for v in want:
                if v not in batch.schema.names:
                    continue
                kc = meta_cols_of(v)[0]
                kinds = (batch[kc].to_pylist()
                         if kc in batch.schema.names else None)
                for i, lex in enumerate(batch[v].to_pylist()):
                    if lex is None:
                        continue
                    if kinds is None or kinds[i] in (KIND_IRI, KIND_BNODE):
                        nodes.add(lex)

    def star_of(frontier: set):
        fr = ray.put(sorted(frontier))

        def f(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t["s_lex"],
                                     pa.array(ray.get(fr),
                                              pa.large_string())))

        return triples_ds.map_batches(f, batch_format="pyarrow")

    seen: set[str] = set()
    frontier = set(nodes)
    parts = []
    while frontier:
        seen |= frontier
        part = star_of(frontier)
        part = part.materialize()
        parts.append(part)
        # blank-node objects not yet described extend the closure
        nxt = set()
        for batch in part.iter_batches(batch_format="pyarrow"):
            if "o_kind" not in batch.schema.names:
                continue  # tabular store without term kinds: no bnodes
            mask = pc.equal(batch["o_kind"], KIND_BNODE)
            for lex in batch.filter(mask)["o_lex"].to_pylist():
                if lex not in seen:
                    nxt.add(lex)
        frontier = nxt
    from ..stages.dedup import exact_dedup

    def to_default(t: pa.Table) -> pa.Table:
        # descriptions are a plain GRAPH over the dataset union;
        # normalize to the full triple schema (tabular stores may lack
        # the kind/meta columns exact_dedup keys on)
        from ..model import KIND_IRI, KIND_LITERAL

        n = t.num_rows
        names = set(t.schema.names)
        cols = {name: t[name] for name in t.schema.names}
        cols["g"] = pa.array([""] * n, pa.large_string())
        if "s_kind" not in names:
            cols["s_kind"] = pa.array([KIND_IRI] * n, pa.int8())
        if "o_kind" not in names:
            cols["o_kind"] = pa.array([KIND_LITERAL] * n, pa.int8())
        for c in ("o_datatype", "o_lang"):
            if c not in names:
                cols[c] = pa.array([""] * n, pa.large_string())
        if "doc_id" not in names:
            cols["doc_id"] = pa.array([""] * n, pa.large_string())
        return pa.table(cols)

    if not parts:
        return triples_ds.limit(0)
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return exact_dedup(out.map_batches(to_default, batch_format="pyarrow"))


def sparql_query(triples_ds, query_text: str, with_meta: bool = False):
    """Form dispatcher: SELECT → binding Dataset, ASK → bool,
    CONSTRUCT/DESCRIBE → triple Dataset. ``with_meta=True`` keeps the
    hidden per-var term-metadata columns ({v}__kind/__dt/__lang) in
    SELECT results so result-set serializers can emit real term types
    (the RowSetWriter* path always sees typed Bindings)."""
    form = _Parser(query_text).parse()["form"]
    if form == "ask":
        return sparql_ask(triples_ds, query_text)
    if form == "construct":
        return sparql_construct(triples_ds, query_text)
    if form == "describe":
        return sparql_describe(triples_ds, query_text)
    return sparql_select(triples_ds, query_text, with_meta=with_meta)


def sparql_select(triples_ds, query_text: str, base: str = "",
                  arq: bool = False, with_meta: bool = False):
    """Parse + compile + execute a SELECT query over the triple Dataset.
    Returns a binding Dataset (one large_string column per projected var;
    ``with_meta=True`` additionally keeps each var's {v}__kind/__dt/__lang
    term-metadata columns for typed result serialization)."""
    q = _Parser(query_text, base=base, arq=arq).parse()
    if q["form"] != "select":
        raise RDFParseError("sparql_select: not a SELECT query")
    out, _cols = _exec_select(triples_ds, q, keep_meta=with_meta)
    return out


def sparql_select_prebound(triples_ds, query_text: str, relation_ds,
                           rel_vars, base: str = "", arq: bool = False):
    """SELECT with a PRE-BOUND binding relation joined in as the first
    WHERE element (SPARQL pre-binding expressed as a join — the SHACL
    ASK-validator execution shape: the (this, value) candidate pairs
    Dataset is the relation; the body's patterns/FILTERs restrict it).
    ``relation_ds`` columns: one large_string per var in ``rel_vars``
    (+ optional <var>__kind/__dt/__lang term-meta columns)."""
    q = _Parser(query_text, base=base, arq=arq).parse()
    if q["form"] != "select":
        raise RDFParseError("sparql_select_prebound: not a SELECT query")
    q["group"]["elements"].insert(
        0, ("relation", relation_ds, list(rel_vars)))
    out, _cols = _exec_select(triples_ds, q)
    return out


def _block_col_values(blk, col: str) -> list:
    """Column values of an aggregate block (arrow Table or pandas frame)."""
    if isinstance(blk, pa.Table):
        return blk[col].to_pylist()
    return list(blk[col])


def _agg_group_concat(col: str, alias: str, sep: str,
                      distinct: bool = False):
    """GROUP_CONCAT as a distributed AggregateFn: per-block value lists,
    concatenated at merge, sorted+joined at finalize (the sort pins the
    spec's undefined within-group order to a deterministic one). Group
    state is O(group size) strings — the same bound any exact
    GROUP_CONCAT carries. ``distinct`` dedups at finalize."""
    from ray.data.aggregate import AggregateFn

    return AggregateFn(
        init=lambda k: [],
        merge=lambda a, b: a + b,
        accumulate_block=lambda a, blk: a + [
            x for x in _block_col_values(blk, col) if x is not None
        ],
        finalize=lambda a: sep.join(
            sorted(set(a)) if distinct else sorted(a)),
        name=alias,
    )


def _agg_mode_median(col: str, alias: str, mode: bool,
                     distinct: bool = False):
    """ARQ mode() / median() statistical aggregates (syntax-arq
    keywords; AggMode/AggMedian.java): numeric value collections —
    a bound non-number errors the whole group (the summed __e flag
    column nulls the alias, same as SUM/AVG). Mode ties break to the
    SMALLEST value (jena's pick is insertion-order-dependent, which a
    distributed merge cannot reproduce — this pins a deterministic
    choice)."""
    from ray.data.aggregate import AggregateFn

    def fin(a):
        if not a:
            return None
        vals = sorted(set(a) if distinct else a)
        if mode:
            from collections import Counter

            best = max(Counter(vals).items(),
                       key=lambda kv: (kv[1], -kv[0]))[0]
            return float(best)
        n = len(vals)
        if n % 2:
            return float(vals[n // 2])
        return (vals[n // 2] + vals[n // 2 - 1]) / 2.0

    return AggregateFn(
        init=lambda k: [],
        merge=lambda a, b: a + b,
        accumulate_block=lambda a, blk: a + [
            x for x in _block_col_values(blk, col) if x is not None
        ],
        finalize=fin,
        name=alias,
    )


def _agg_numeric_distinct(col: str, alias: str, avg: bool):
    """SUM(DISTINCT) / AVG(DISTINCT) as a distributed AggregateFn:
    per-group VALUE sets (AccSumDistinct / AccAvgDistinct semantics —
    NodeValue equality is value-space, so the float set matches),
    summed/averaged at finalize. State is O(distinct values)."""
    from ray.data.aggregate import AggregateFn

    def fin(a):
        if not a:
            return 0
        s = sum(a)
        return (s / len(a)) if avg else s

    return AggregateFn(
        init=lambda k: set(),
        merge=lambda a, b: a | b,
        accumulate_block=lambda a, blk: a | {
            x for x in _block_col_values(blk, col) if x is not None
        },
        finalize=fin,
        name=alias,
    )


def _agg_fold(i: int, alias: str, distinct: bool, extra: dict):
    """FOLD as a distributed AggregateFn (the fork's AggFoldList /
    AggFoldMap): per-block TERM tuples accumulate in row order,
    concatenate at merge, optional ORDER BY key sort + DISTINCT dedup
    at finalize, then one canonical cdt:List / cdt:Map lexical."""
    from ray.data.aggregate import AggregateFn

    from ..model import KIND_BNODE
    from ..rdf.cdt import format_cdt_list, format_cdt_map

    from ..model import KIND_LITERAL, XSD_NS

    is_map = bool(extra.get("var2"))
    order = extra.get("order")
    col = f"__a{i}"

    def term(k, l, d, g):
        if l is None:
            return None
        d, g = d or "", g or ""
        if k == KIND_LITERAL and not d and not g:
            # the engine's untyped convention: numeric lexicals are
            # numbers (a tabular int folds as an integer, not a string)
            if re.fullmatch(r"[+-]?\d+", l):
                d = XSD_NS + "integer"
            elif re.fullmatch(r"[+-]?(\d+\.\d*|\.\d+)", l):
                d = XSD_NS + "decimal"
        return (k, l, d, g)

    def acc_block(a, blk):
        lex = _block_col_values(blk, col)
        kind = _block_col_values(blk, col + "k")
        dt = _block_col_values(blk, col + "d")
        lang = _block_col_values(blk, col + "g")
        quads = [term(k, l, d, g)
                 for l, k, d, g in zip(lex, kind, dt, lang)]
        if is_map:
            kl = _block_col_values(blk, col + "2")
            kk = _block_col_values(blk, col + "2k")
            kd = _block_col_values(blk, col + "2d")
            kg = _block_col_values(blk, col + "2g")
            keys = [term(k, l, d, g)
                    for l, k, d, g in zip(kl, kk, kd, kg)]
        else:
            keys = [None] * len(quads)
        if order:
            sides = [(_block_col_values(blk, f"{col}o{j}"),
                      _block_col_values(blk, f"{col}ol{j}"))
                     for j in range(len(order))]
            okeys = [tuple((on[r], ol[r]) for on, ol in sides)
                     for r in range(len(quads))]
        else:
            okeys = [None] * len(quads)
        return a + list(zip(quads, keys, okeys))

    def fin(a):
        rows = list(a)
        if order:
            def skey1(pair):
                onum, olex = pair
                # SPARQL ordering: unbound lowest, numbers before
                # other literals, then lexical
                unbound = olex is None and onum is None
                return (0 if unbound else 1,
                        0 if onum is not None else 1,
                        onum if onum is not None else 0.0,
                        olex or "")

            # mixed ASC/DESC multi-key: stable sort from the LAST key
            # to the first (fold-list-orderby-06)
            for j in range(len(order) - 1, -1, -1):
                rows.sort(key=lambda r, _j=j: skey1(r[2][_j]),
                          reverse=order[j][1])
        if is_map:
            # FOLD(?k, ?v): the FIRST var is the key, the second the value
            out: dict = {}
            seen: dict = {}
            for key, val, _ok in rows:
                if key is None or key[0] == KIND_BNODE:
                    continue  # unbound / bnode keys are skipped
                kk2 = _cdt_term_key(key)
                if kk2 in seen:
                    del out[seen[kk2]]
                seen[kk2] = key
                out[key] = val
            return format_cdt_map(out)
        terms = [r[0] for r in rows]
        if distinct:
            seen2: set = set()
            uniq = []
            for x in terms:
                k2 = ("null",) if x is None else x
                if k2 in seen2:
                    continue
                seen2.add(k2)
                uniq.append(x)
            terms = uniq
        return format_cdt_list(terms)

    return AggregateFn(
        init=lambda k: [],
        merge=lambda a, b: a + b,
        accumulate_block=acc_block,
        finalize=fin,
        name=alias,
    )


def _agg_count_distinct(col: str, alias: str):
    """COUNT(DISTINCT ?v) as a distributed AggregateFn: per-group value
    SETS merged across blocks (exact distinct needs the set; state is
    O(distinct values in the group))."""
    from ray.data.aggregate import AggregateFn

    return AggregateFn(
        init=lambda k: set(),
        merge=lambda a, b: a | b,
        accumulate_block=lambda a, blk: a | {
            x for x in _block_col_values(blk, col) if x is not None
        },
        finalize=lambda a: len(a),
        name=alias,
    )


def _exec_select(triples_ds, q: dict, graph="", keep_meta: bool = False):
    """Execute a parsed SELECT dict → (Dataset, projected column names).
    Shared by the top-level form and { SELECT ... } subqueries; ``graph``
    propagates an enclosing GRAPH scope into the subquery's patterns
    (SPARQL 1.1 §13.3.1 — the active graph applies inside subqueries).
    ``keep_meta=True`` (top-level result-writer path only) keeps each
    projected var's hidden {v}__kind/__dt/__lang columns in the output."""
    bindings, all_vars = _compile_group(triples_ds, q["group"], graph=graph)
    # SELECT * projects only NAMED variables — anonymous-bnode pattern
    # placeholders (__bn_*) are existentials, invisible to projection
    proj_items = q["project"] or [
        ("var", v) for v in all_vars if not v.startswith("__bn_")]
    if not proj_items:
        # SELECT * over a zero-variable group (e.g. GRAPH <g> {}):
        # solutions are empty bindings — keep the __exists marker so the
        # row count survives (a zero-column Arrow table has no rows)
        return bindings, []
    if isinstance(graph, Var) and graph.name in all_vars:
        # GRAPH ?g { SELECT ... }: the subquery evaluates once per named
        # graph, so the graph var rides along — implicitly projected and
        # (when aggregating) an implicit GROUP BY key, making aggregates
        # per-active-graph (SPARQL 1.1 §13.3 Graph(?g, P) semantics)
        if not any(p[0] == "var" and p[1] == graph.name for p in proj_items):
            proj_items = proj_items + [("var", graph.name)]
        has_aggs = any(p[0] == "agg" for p in proj_items)
        if (has_aggs or q["group_by"]) and graph.name not in q["group_by"]:
            q = {**q, "group_by": q["group_by"] + [graph.name]}
    agg_items = [p for p in proj_items if p[0] == "agg"] + list(
        q.get("hidden_aggs") or [])
    post_items = [(p[1], p[2]) for p in proj_items if p[0] == "postbind"]
    var_items = [p[1] for p in proj_items if p[0] == "var"]
    aliases = [p[3] for p in agg_items]
    known = set(all_vars) | set(aliases) | {a for _, a in post_items}
    missing = [v for v in dict.fromkeys(
        var_items + q["group_by"] + [v for v, _ in q["order"]])
        if v not in known]
    if missing:
        # a projected / GROUP BY / ORDER BY var bound nowhere in the
        # pattern is LEGAL SPARQL — it is simply unbound in every
        # solution (jena projects a null column); materialize all-null
        # columns instead of rejecting
        def _add_null_cols(t: pa.Table, _vs=tuple(missing)) -> pa.Table:
            from .bgp import meta_cols_of

            if t.num_columns == 0:
                return t
            cols = {c: t[c].combine_chunks() for c in t.schema.names}
            n = t.num_rows
            for v in _vs:
                cols[v] = pa.nulls(n, pa.large_string())
                kc, dc, lc = meta_cols_of(v)
                cols[kc] = pa.nulls(n, pa.int8())
                cols[dc] = pa.array([""] * n, pa.large_string())
                cols[lc] = pa.array([""] * n, pa.large_string())
            return pa.table(cols)

        bindings = bindings.map_batches(
            _add_null_cols, batch_format="pyarrow")
        all_vars = sorted(set(all_vars) | set(missing))
        known |= set(missing)

    proj = [p[1] if p[0] == "var"
            else p[2] if p[0] == "postbind"
            else p[3] for p in proj_items]
    if q["group_by"] and not agg_items:
        # GROUP BY with no aggregates in the projection: one solution
        # per group — distinct over the group keys (OpGroup with an
        # empty aggregator list); projection-expression aliases ride
        # along (their value is key-functional for valid queries)
        pe = q.get("proj_expr_vars") or set()
        for v in var_items:
            if v not in q["group_by"] and v not in pe:
                raise RDFParseError(
                    f"SPARQL: projected ?{v} is neither aggregated nor a "
                    "GROUP BY key"
                )
        q = {**q, "distinct": True}
    if agg_items:
        keys = q["group_by"]
        for v in var_items:
            if v not in keys:
                raise RDFParseError(
                    f"SPARQL: projected ?{v} is neither aggregated nor a "
                    "GROUP BY key"
                )
        from ray.data.aggregate import Max, Mean, Min, Sum

        def _is_string_agg(item) -> bool:
            _, fn, _var, _al, distinct_i, _sep = item
            return fn in ("SAMPLE", "GROUP_CONCAT") or (
                fn == "COUNT" and distinct_i
            )

        def _fold_cols(t: pa.Table, i: int, item, cols: dict) -> None:
            """FOLD travels as TERM tuples: lex/kind/dt/lang per folded
            var (+ the map-key var, + the ORDER BY key)."""
            from ..model import KIND_LITERAL

            _, _fn, var, _al, _d, extra = item
            n = t.num_rows
            names = t.schema.names

            def quad(v, tag):
                cols[f"__a{i}{tag}"] = (
                    t[v].combine_chunks().cast(pa.large_string())
                    if v in names
                    else pa.nulls(n, pa.large_string()))
                kc, dc, lc = v + "__kind", v + "__dt", v + "__lang"
                cols[f"__a{i}{tag}k"] = (
                    pc.fill_null(t[kc].combine_chunks().cast(pa.int8()),
                                 KIND_LITERAL)
                    if kc in names
                    else pa.array([KIND_LITERAL] * n, pa.int8()))
                cols[f"__a{i}{tag}d"] = (
                    pc.fill_null(t[dc].combine_chunks()
                                 .cast(pa.large_string()), "")
                    if dc in names
                    else pa.array([""] * n, pa.large_string()))
                cols[f"__a{i}{tag}g"] = (
                    pc.fill_null(t[lc].combine_chunks()
                                 .cast(pa.large_string()), "")
                    if lc in names
                    else pa.array([""] * n, pa.large_string()))

            quad(var, "")
            if extra.get("var2"):
                quad(extra["var2"], "2")
            order = extra.get("order")
            if order:
                for j, (ov, _d) in enumerate(order):
                    olex = (t[ov].combine_chunks().cast(pa.large_string())
                            if ov in names
                            else pa.nulls(n, pa.large_string()))
                    num_ok = pc.fill_null(
                        pc.match_substring_regex(olex, _NUM_RE), False)
                    cols[f"__a{i}o{j}"] = pc.cast(
                        pc.if_else(num_ok, olex,
                                   pa.scalar(None, olex.type)),
                        pa.float64())
                    # nulls mark UNBOUND sort keys
                    cols[f"__a{i}ol{j}"] = olex

        def _fold_empty_cols(i: int, item, cols: dict) -> None:
            _, _fn, _var, _al, _d, extra = item
            tags = [""] + (["2"] if extra.get("var2") else [])
            for tag in tags:
                cols[f"__a{i}{tag}"] = pa.array([], pa.large_string())
                cols[f"__a{i}{tag}k"] = pa.array([], pa.int8())
                cols[f"__a{i}{tag}d"] = pa.array([], pa.large_string())
                cols[f"__a{i}{tag}g"] = pa.array([], pa.large_string())
            for j in range(len(extra.get("order") or ())):
                cols[f"__a{i}o{j}"] = pa.array([], pa.float64())
                cols[f"__a{i}ol{j}"] = pa.array([], pa.large_string())

        def _key_meta_cols(t: pa.Table | None, cols: dict) -> None:
            """GROUP BY keys are TERMS, not lexical forms ('1'^^integer,
            '001'^^integer and '1'^^string are three groups — SPARQL
            18.5.1/Group-1): the key vars' meta columns join the
            groupby key, defaulted when the relation carries none."""
            from ..model import KIND_LITERAL

            n = t.num_rows if t is not None else 0
            names = t.schema.names if t is not None else ()
            for k in keys:
                kc, dc, lc = k + "__kind", k + "__dt", k + "__lang"
                cols[kc] = (pc.fill_null(
                    t[kc].combine_chunks().cast(pa.int8()), KIND_LITERAL)
                    if kc in names
                    else pa.array([KIND_LITERAL] * n, pa.int8()))
                cols[dc] = (pc.fill_null(
                    t[dc].combine_chunks().cast(pa.large_string()), "")
                    if dc in names
                    else pa.array([""] * n, pa.large_string()))
                cols[lc] = (pc.fill_null(
                    t[lc].combine_chunks().cast(pa.large_string()), "")
                    if lc in names
                    else pa.array([""] * n, pa.large_string()))

        gb_keys = [c for k in keys
                   for c in (k, k + "__kind", k + "__dt", k + "__lang")]

        def prep(t: pa.Table) -> pa.Table:
            if t.num_columns == 0:
                cols = {k: pa.array([], pa.large_string()) for k in keys}
                _key_meta_cols(None, cols)
                for i, item in enumerate(agg_items):
                    fn = item[1]
                    if fn == "FOLD":
                        _fold_empty_cols(i, item, cols)
                    elif _is_string_agg(item):
                        cols[f"__a{i}"] = pa.array([], pa.large_string())
                    elif fn == "COUNT":
                        cols[f"__a{i}"] = pa.array([], pa.int64())
                    else:
                        cols[f"__a{i}"] = pa.array([], pa.float64())
                        cols[f"__e{i}"] = pa.array([], pa.int64())
                return pa.table(cols)
            cols = {k: t[k].combine_chunks() for k in keys}
            _key_meta_cols(t, cols)
            for i, item in enumerate(agg_items):
                _, fn, var, _al, _d, _s = item
                if fn == "FOLD":
                    _fold_cols(t, i, item, cols)
                    continue
                if _is_string_agg(item):
                    if var is None:
                        # COUNT(DISTINCT *): distinct SOLUTIONS — a
                        # composite key over every named var column
                        # (+ term metadata), JENA-1778
                        vcols = sorted(c for c in t.schema.names
                                       if not c.startswith("__"))
                        parts = [
                            pc.fill_null(
                                t[c].combine_chunks().cast(
                                    pa.large_string()),
                                "\x00unbound")
                            for c in vcols]
                        col = (pc.binary_join_element_wise(
                            *parts, pa.scalar("\x1f", pa.large_string()))
                            if parts
                            else pa.array([""] * t.num_rows,
                                          pa.large_string()))
                    else:
                        # the value itself travels to the aggregate
                        col = t[var].combine_chunks().cast(
                            pa.large_string())
                elif fn == "COUNT":
                    col = (
                        pa.array([1] * t.num_rows, pa.int64())
                        if var is None
                        else pc.cast(pc.is_valid(t[var].combine_chunks()), pa.int64())
                    )
                else:
                    # SPARQL numeric aggregate: coerce the lexical form;
                    # a BOUND non-numeric value makes the whole group's
                    # aggregate a type error → unbound (agg-err-01):
                    # the error travels as a summed flag column
                    lex = (t[var].combine_chunks().cast(pa.large_string())
                           if var in t.schema.names
                           else pa.nulls(t.num_rows, pa.large_string()))
                    num_ok = pc.fill_null(
                        pc.match_substring_regex(lex, _NUM_RE), False)
                    col = pc.cast(
                        pc.if_else(num_ok, lex,
                                   pa.scalar(None, pa.large_string())),
                        pa.float64())
                    cols[f"__e{i}"] = pc.cast(
                        pc.and_(pc.is_valid(lex), pc.invert(num_ok)),
                        pa.int64())
                cols[f"__a{i}"] = col
            return pa.table(cols)

        prepped = bindings.map_batches(prep, batch_format="pyarrow")
        agg_cls = {"COUNT": Sum, "SUM": Sum, "MIN": Min, "MAX": Max, "AVG": Mean}
        aggs = []
        err_aliases: list[tuple[str, str]] = []  # (err col, agg alias)
        for i, item in enumerate(agg_items):
            _, fn, _var, alias, distinct_i, sep = item
            col = f"__a{i}"
            if fn == "FOLD":
                aggs.append(_agg_fold(i, alias, distinct_i, sep))
            elif fn == "COUNT" and distinct_i:
                aggs.append(_agg_count_distinct(col, alias))
            elif fn in ("MODE", "MEDIAN"):
                aggs.append(_agg_mode_median(col, alias, fn == "MODE",
                                             distinct_i))
                ec = f"__err{i}"
                aggs.append(Sum(f"__e{i}", alias_name=ec))
                err_aliases.append((ec, alias))
            elif fn in ("SUM", "AVG") and distinct_i:
                aggs.append(_agg_numeric_distinct(col, alias,
                                                  avg=fn == "AVG"))
                ec = f"__err{i}"
                aggs.append(Sum(f"__e{i}", alias_name=ec))
                err_aliases.append((ec, alias))
            elif fn == "GROUP_CONCAT":
                aggs.append(_agg_group_concat(col, alias, sep,
                                              distinct=distinct_i))
            elif fn == "SAMPLE":
                # deterministic SAMPLE: the minimum term (AggSample leaves
                # the choice open; min makes runs reproducible)
                aggs.append(Min(col, alias_name=alias))
            else:
                aggs.append(agg_cls[fn](col, alias_name=alias))
                if fn in ("SUM", "MIN", "MAX", "AVG"):
                    ec = f"__err{i}"
                    aggs.append(Sum(f"__e{i}", alias_name=ec))
                    err_aliases.append((ec, alias))

        def errfix_kernel(t: pa.Table) -> pa.Table:
            """Null out numeric aggregates of groups holding a bound
            non-numeric value (SPARQL: aggregate error → unbound),
            dropping the flag columns."""
            if t.num_columns == 0:
                return t
            ecols = {e for e, _ in err_aliases}
            cols = {c: t[c].combine_chunks() for c in t.schema.names
                    if c not in ecols}
            for ec, alias in err_aliases:
                bad = pc.fill_null(pc.greater(t[ec].combine_chunks(), 0),
                                   False)
                cols[alias] = pc.if_else(
                    bad, pa.scalar(None, cols[alias].type), cols[alias])
            return pa.table(cols)

        def postbind_kernel(t: pa.Table) -> pa.Table:
            """SELECT expressions over aggregates — evaluated on the
            aggregated relation, appended as lexical columns."""
            if t.num_columns == 0:
                return t
            cols = {c: t[c].combine_chunks() for c in t.schema.names}
            for expr, alias in post_items:
                v = _to_lexical(_eval_value(expr, t), t.num_rows)
                if isinstance(v, pa.Scalar):
                    v = pa.array([v.as_py()] * t.num_rows,
                                 pa.large_string())
                cols[alias] = v
            return pa.table(cols)
        if keys:
            grouped = prepped.groupby(gb_keys).aggregate(*aggs)
            if err_aliases:
                grouped = grouped.map_batches(
                    errfix_kernel, batch_format="pyarrow")
            if q.get("having") is not None:
                having = q["having"]

                def having_kernel(t: pa.Table) -> pa.Table:
                    if t.num_columns == 0:
                        return t
                    return t.filter(pc.fill_null(_eval_bool(having, t), False))

                grouped = grouped.map_batches(having_kernel, batch_format="pyarrow")
            if post_items:
                grouped = grouped.map_batches(
                    postbind_kernel, batch_format="pyarrow")
            fold_meta = {p[3]: (p[5].get("var2") is not None)
                         for p in agg_items if p[1] == "FOLD"}

            def project_cast(t: pa.Table) -> pa.Table:
                if t.num_columns == 0:
                    return t
                cols = {}
                for n in proj:
                    c = t[n].combine_chunks()
                    # Ray groupby downgrades large_string keys to string;
                    # downstream joins refuse the mix — re-cast
                    if pa.types.is_string(c.type):
                        c = c.cast(pa.large_string())
                    cols[n] = c
                    # group-key vars keep their term metadata (ORDER/
                    # compare after GROUP BY see the datatype)
                    for sfx in ("__kind", "__dt", "__lang"):
                        mc = n + sfx
                        if mc in t.schema.names:
                            m = t[mc].combine_chunks()
                            if pa.types.is_string(m.type):
                                m = m.cast(pa.large_string())
                            cols[mc] = m
                # FOLD aliases are CDT-typed literals — stamp the meta
                # so value-space equality sees the datatype
                if fold_meta:
                    from ..model import KIND_LITERAL
                    from ..rdf.cdt import CDT_LIST, CDT_MAP

                    nr = t.num_rows
                    for al, im in fold_meta.items():
                        if al not in cols:
                            continue
                        kc, dc, lc = al + "__kind", al + "__dt", al + "__lang"
                        cols[kc] = pa.array([KIND_LITERAL] * nr, pa.int8())
                        cols[dc] = pa.array(
                            [CDT_MAP if im else CDT_LIST] * nr,
                            pa.large_string())
                        cols[lc] = pa.array([""] * nr, pa.large_string())
                return pa.table(cols)

            out = grouped.map_batches(project_cast, batch_format="pyarrow")
        else:
            import ray.data as rd

            row = prepped.aggregate(*aggs) or {}
            # SPARQL defines COUNT/SUM/AVG over the empty group as 0
            # (§18.5.1.4 Avg(∅)=0); MIN/MAX/SAMPLE stay unbound (None);
            # FOLD over the empty group is the empty list / map; a group
            # holding a bound non-numeric value is an ERROR → unbound
            zero_fns = {"COUNT", "SUM", "AVG"}
            fn_by_alias = {p[3]: p[1] for p in agg_items}
            fold_items = {p[3]: p for p in agg_items if p[1] == "FOLD"}
            err_by_alias = {alias: ec for ec, alias in err_aliases}
            post_aliases = {a for _, a in post_items}
            needed = [n for n in proj if n not in post_aliases]
            needed += [a for a in aliases if a not in needed]
            vals = {}
            for n in needed:
                v = row.get(n)
                if err_by_alias.get(n) and (row.get(err_by_alias[n]) or 0) > 0:
                    v = None
                elif v is None and fn_by_alias.get(n) in zero_fns:
                    v = 0
                if v is None and n in fold_items:
                    v = "{}" if fold_items[n][5].get("var2") else "[]"
                vals[n] = v
            if fold_items:
                from ..model import KIND_LITERAL
                from ..rdf.cdt import CDT_LIST, CDT_MAP

                for al, item in fold_items.items():
                    if al not in vals:
                        continue
                    vals[al + "__kind"] = KIND_LITERAL
                    vals[al + "__dt"] = (CDT_MAP if item[5].get("var2")
                                         else CDT_LIST)
                    vals[al + "__lang"] = ""
            out = rd.from_items([vals])
            if q.get("having") is not None:
                having_g = q["having"]
                out = out.map_batches(
                    lambda t, _h=having_g: t.filter(
                        pc.fill_null(_eval_bool(_h, t), False))
                    if t.num_columns else t,
                    batch_format="pyarrow")
            if post_items:
                out = out.map_batches(postbind_kernel,
                                      batch_format="pyarrow")
            hidden_in_vals = [n for n in needed if n not in proj]
            if hidden_in_vals:
                keep = proj + [m for al in fold_items if al in proj
                               for m in (al + "__kind", al + "__dt",
                                         al + "__lang")]
                out = out.map_batches(
                    lambda t, _k=tuple(keep): pa.table(
                        {c: t[c].combine_chunks() for c in _k})
                    if t.num_columns else t,
                    batch_format="pyarrow")
    else:
        if q["distinct"]:
            # distinct over TERMS: include each var's kind/dt/lang
            # metadata in the dedup key ("1"^^xsd:integer and
            # "1"^^xsd:decimal are different terms with one lexical).
            # Dedup BEFORE the ORDER BY sort — the algebra is
            # Slice(Distinct(Project(OrderBy(..)))), so the distinct
            # rows must come out term-ordered (ARQ opt-top-05..12);
            # dedup-then-sort yields the same ordered set with one
            # shuffle each way.
            from .bgp import _dedup, meta_cols_of

            order = q["order"] or ()
            order_extra = [v for v, _ in order if v not in proj]
            # GROUP BY with no aggregates = one solution PER GROUP:
            # non-projected group keys (e.g. a GROUP BY expression)
            # stay in the dedup key, then project away
            gb_extra = [v for v in (q["group_by"] or ())
                        if v not in proj]
            keep_vars = proj + gb_extra
            meta_sel = [m for v in keep_vars for m in meta_cols_of(v)]

            def keep_meta(t: pa.Table) -> pa.Table:
                if t.num_columns == 0:
                    return t
                names = set(t.schema.names)
                cols = {c: t[c].combine_chunks() for c in keep_vars
                        if c in names}
                for m in meta_sel:
                    if m in names:
                        cols[m] = t[m].combine_chunks()
                return pa.table(cols)

            if order_extra:
                # ORDER BY on non-projected vars under DISTINCT — ARQ's
                # TransformDistinctToReduced shape: keep each projected
                # term-group's FIRST row in sort order. One Min/Max
                # over a single encoded sort key per group.
                dirs = {d for _, d in order}
                if len(dirs) > 1:
                    raise RDFParseError(
                        "SPARQL: DISTINCT with mixed ASC/DESC over "
                        "non-projected ORDER BY vars is out of subset")
                all_desc = dirs == {True}

                def keyed_meta(t: pa.Table) -> pa.Table:
                    if t.num_columns == 0:
                        return t
                    allc = {c: t[c].combine_chunks()
                            for c in t.schema.names}
                    okey = _encode_order_key(allc, t.num_rows, order)
                    out_t = keep_meta(t)
                    return out_t.append_column("__okey", okey)

                from ray.data.aggregate import Max, Min

                wide = bindings.map_batches(
                    keyed_meta, batch_format="pyarrow")
                first = wide.take(1)
                dedup_cols = ([c for c in first[0] if c != "__okey"]
                              if first else proj)
                agg = (Max if all_desc else Min)(
                    "__okey", alias_name="__okey")
                rep = wide.groupby(dedup_cols).aggregate(agg)
                deduped = rep.sort("__okey", descending=all_desc)
            else:
                wide = bindings.map_batches(
                    keep_meta, batch_format="pyarrow")
                first = wide.take(1)
                dedup_cols = list(first[0].keys()) if first else proj
                deduped = _dedup(wide, dedup_cols)
                if q["order"]:
                    deduped = _term_sort(deduped, q["order"])
            final_cols = (proj + [m for v in proj for m in meta_cols_of(v)]
                          if keep_meta else proj)
            out = deduped.map_batches(
                lambda t, _fc=tuple(final_cols): pa.table(
                    {c: t[c].combine_chunks() for c in _fc
                     if c in t.schema.names})
                if t.num_columns
                else t,
                batch_format="pyarrow",
            )
        elif q["order"]:
            # SPARQL term ordering needs the term metadata — sort the
            # binding table (meta still attached), then project; the
            # projection map preserves row order
            bindings = _term_sort(bindings, q["order"])
            out = (_select_keep_meta(bindings, proj) if keep_meta
                   else select(bindings, proj))
        else:
            out = (_select_keep_meta(bindings, proj) if keep_meta
                   else select(bindings, proj))
    if agg_items and q["group_by"]:
        # the group-key term-meta columns were part of the groupby key
        # (term-identity grouping) — project them away from the FINAL
        # relation; FOLD aliases keep their CDT meta stamp
        fold_aliases = [p[3] for p in agg_items if p[1] == "FOLD"]
        keepc = list(proj) + [
            m for al in fold_aliases if al in proj
            for m in (al + "__kind", al + "__dt", al + "__lang")]
        if keep_meta:
            from .bgp import meta_cols_of as _mco

            keepc += [m for v in proj for m in _mco(v) if m not in keepc]

        def _strip_key_meta(t: pa.Table, _k=tuple(keepc)) -> pa.Table:
            if t.num_columns == 0:
                return t
            names = set(t.schema.names)
            return pa.table({c: t[c].combine_chunks()
                             for c in _k if c in names})

        out = out.map_batches(_strip_key_meta, batch_format="pyarrow")
    if q["distinct"] and agg_items:
        from .bgp import _dedup

        out = _dedup(out, proj)
    if q["order"] and agg_items:
        # aggregate aliases carry no term metadata — plain column sort
        # (aggregates are natively numeric already)
        out = out.sort(
            [v for v, _ in q["order"]], descending=[d for _, d in q["order"]]
        )
    if q["offset"]:
        out = _dataset_offset(out, q["offset"], proj)
    if q["limit"] is not None:
        out = out.limit(q["limit"])
    return out, proj


def _select_keep_meta(bindings_ds, proj):
    """Projection that keeps each projected var's hidden term-metadata
    columns ({v}__kind/__dt/__lang) when present — the result-writer
    path (jena's Binding always carries Node term types; our writers
    recover them from these columns via serialize._row_terms)."""
    from .bgp import meta_cols_of

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.table(
                {c: pa.array([], pa.large_string()) for c in proj})
        names = set(t.schema.names)
        cols = {}
        for v in proj:
            cols[v] = t[v].combine_chunks()
            for m in meta_cols_of(v):
                if m in names:
                    cols[m] = t[m].combine_chunks()
        return pa.table(cols)

    return bindings_ds.map_batches(kernel, batch_format="pyarrow")


def _dataset_offset(ds, offset: int, proj):
    """Distributed OFFSET (OpSlice's skipped prefix): drop the first
    ``offset`` rows by BLOCK-METADATA prefix sums — whole skipped blocks
    are dropped by ref, only the single straddling block is sliced in a
    worker task, and nothing is collected to the driver (the round-3
    take_all() here was a driver OOM on fact-sized results)."""
    import ray
    import ray.data as rd

    mat = ds.materialize()
    metas = [meta for b in mat.iter_internal_ref_bundles()
             for _, meta in b.blocks]
    refs = mat.to_arrow_refs()
    counts = [m.num_rows for m in metas]
    if any(c is None for c in counts):
        @ray.remote(num_cpus=0.25)
        def _nrows(t: pa.Table) -> int:
            return t.num_rows

        counts = ray.get([_nrows.remote(r) for r in refs])

    @ray.remote(num_cpus=0.25)
    def _slice_blk(t: pa.Table, start: int) -> pa.Table:
        return t.slice(start)

    out_refs = []
    skip = offset
    for r, n in zip(refs, counts):
        if skip >= n:
            skip -= n
            continue
        out_refs.append(_slice_blk.remote(r, skip) if skip else r)
        skip = 0
    if not out_refs:
        schema = mat.schema()
        base = getattr(schema, "base_schema", None) if schema else None
        if base is not None:
            return rd.from_arrow(base.empty_table())
        return rd.from_arrow(
            pa.table({c: pa.array([], pa.large_string()) for c in proj}))
    return rd.from_arrow_refs(out_refs)
