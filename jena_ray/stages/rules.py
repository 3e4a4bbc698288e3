"""Generic forward-rule engine — user-supplied rule files.

Parity: jena-core reasoner/rulesys/Rule.java:72-83 (embedded rule
syntax; rulesParserFromReader handles ``@prefix`` and comment lines) and
BasicForwardRuleInfGraph.java (forward closure over the rule set).
Implemented subset:

- ``[name: (pattern ...) guard(...) -> (pattern ...)]`` — triple-pattern
  bodies and heads, optional rule name, commas-as-whitespace
- terms: ``?var``, ``<iri>``, ``prefix:local``, quoted literals with
  optional ``^^dt`` / ``@lang``, bare integers/decimals
- builtin guards evaluated vectorized on the binding table:
  ``equal / notEqual`` (lexical), ``lessThan / greaterThan / le / ge``
  (numeric) — the most-used slice of reasoner/rulesys/builtins/
- NOT in subset (documented): functors, backward (``<-``) rules,
  embedded rules, ``@include``, the remaining builtin library

Ray realization: each round evaluates every rule body as a BGP over the
current graph (ops/bgp.match_bgp — chained hash joins with the planner's
connected order), instantiates head patterns VECTORIZED from the binding
table (term metadata columns carry kind/datatype/lang), then folds the
candidate triples into the graph with ONE min-tag groupby over the full
triple key — the same merge shape as ops/paths._closure: rows whose
min(tag)==1 are the genuinely-new frontier and the merge output doubles
as the deduped accumulator, so a round costs the body joins plus a
single shuffle. Rounds are bounded by derivation depth; fixpoint by
default, an explicit ``max_rounds`` RAISES rather than truncating.

Unlike the reference's RETE engine the body match is re-evaluated per
round rather than incrementally maintained — at Dataset granularity a
round is a handful of hash joins, and semi-naive maintenance of every
rule's alpha memory would pin per-rule state across rounds. Scale note:
the merge groups on the 8-column triple key; above ~10M candidate rows
per round, switch to stages/dedup.py's int-hash partition trick.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc

from ..model import KIND_IRI, KIND_LITERAL, TRIPLE_SCHEMA
from ..ops.bgp import Var, meta_cols_of
from ..util import compact_blocks

XSD = "http://www.w3.org/2001/XMLSchema#"

# (name, lexical) constant kinds
IRI = "iri"
LIT = "lit"


@dataclass(frozen=True)
class Const:
    kind: str  # IRI | LIT
    lex: str
    dt: str = ""
    lang: str = ""


@dataclass
class Builtin:
    name: str
    args: list  # Var | Const


@dataclass
class Rule:
    name: str
    body: list  # [(term, term, term)]
    guards: list = field(default_factory=list)  # [Builtin]
    head: list = field(default_factory=list)  # [(term, term, term)]


BUILTINS = {"equal", "notEqual", "lessThan", "greaterThan", "le", "ge"}

_TOKEN = re.compile(
    r"""
    (?P<ws>[\s,]+)
  | (?P<comment>\#[^\n]*|//[^\n]*)
  | (?P<iri><[^>\s]*>)
  | (?P<var>\?[A-Za-z_][A-Za-z0-9_]*)
  | (?P<str>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<dt>\^\^)
  | (?P<lang>@[A-Za-z][A-Za-z0-9-]*)
  | (?P<num>[+-]?\d+(?:\.\d+)?)
  | (?P<arrow>->)
  | (?P<punct>[\[\]():.])
  | (?P<pname>[A-Za-z_][A-Za-z0-9_.-]*:?[A-Za-z0-9_.-]*)
    """,
    re.VERBOSE,
)


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(text):
        m = _TOKEN.match(text, i)
        if not m:
            raise ValueError(f"rule syntax error at {text[i:i+20]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        out.append((kind, m.group()))
    return out


class _Parser:
    def __init__(self, toks: list[tuple[str, str]], prefixes: dict[str, str]):
        self.toks = toks
        self.i = 0
        self.prefixes = prefixes

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, text: str):
        kind, tok = self.next()
        if tok != text:
            raise ValueError(f"expected {text!r}, got {tok!r}")

    def _resolve(self, pname: str) -> str:
        if ":" not in pname:
            raise ValueError(f"bare name {pname!r} (not a prefixed name)")
        pfx, local = pname.split(":", 1)
        if pfx not in self.prefixes:
            raise ValueError(f"unknown prefix {pfx!r} in {pname!r}")
        return self.prefixes[pfx] + local

    def term(self):
        kind, tok = self.next()
        if kind == "var":
            return Var(tok[1:])
        if kind == "iri":
            return Const(IRI, tok[1:-1])
        if kind == "num":
            dt = XSD + ("decimal" if "." in tok else "integer")
            return Const(LIT, tok, dt)
        if kind == "str":
            lex = tok[1:-1].encode().decode("unicode_escape")
            dt, lang = "", ""
            if self.peek()[0] == "dt":
                self.next()
                k2, t2 = self.next()
                dt = t2[1:-1] if k2 == "iri" else self._resolve(t2)
            elif self.peek()[0] == "lang":
                _, t2 = self.next()
                lang = t2[1:]
            return Const(LIT, lex, dt, lang)
        if kind == "pname":
            return Const(IRI, self._resolve(tok))
        raise ValueError(f"unexpected term token {tok!r}")

    def clause(self):
        """'(' s p o ')' → pattern; name '(' args ')' → builtin."""
        kind, tok = self.peek()
        if tok == "(":
            self.next()
            s, p, o = self.term(), self.term(), self.term()
            self.expect(")")
            return ("pattern", (s, p, o))
        if kind == "pname" and ":" not in tok:
            self.next()
            if tok not in BUILTINS:
                raise ValueError(
                    f"unknown builtin {tok!r} (supported: {sorted(BUILTINS)})"
                )
            self.expect("(")
            args = []
            while self.peek()[1] != ")":
                args.append(self.term())
            self.expect(")")
            return ("builtin", Builtin(tok, args))
        raise ValueError(f"unexpected clause token {tok!r}")

    def rule(self) -> Rule:
        self.expect("[")
        name = ""
        # optional 'name:' label — a pname ENDING in ':' can only be a
        # label here (prefixed names carry the colon mid-token; @prefix
        # lines were stripped before tokenizing)
        kind, tok = self.peek()
        if kind == "pname" and tok.endswith(":") and ":" not in tok[:-1]:
            name = tok[:-1]
            self.next()
        elif (
            kind == "pname"
            and ":" not in tok
            and self.i + 1 < len(self.toks)
            and self.toks[self.i + 1][1] == ":"
        ):
            name = tok
            self.next()
            self.next()
        body, guards, head = [], [], []
        seen_arrow = False
        while True:
            kind, tok = self.peek()
            if tok == "]":
                self.next()
                break
            if kind == "arrow":
                self.next()
                seen_arrow = True
                continue
            ckind, c = self.clause()
            if not seen_arrow:
                (body if ckind == "pattern" else guards).append(c)
            else:
                if ckind != "pattern":
                    raise ValueError("builtins are body-only in this subset")
                head.append(c)
        if self.peek()[1] == ".":
            self.next()
        if not seen_arrow or not head or not body:
            raise ValueError("rule needs a non-empty body, '->', and a head")
        return Rule(name=name, body=body, guards=guards, head=head)


def parse_rules(text: str) -> list[Rule]:
    """Rule file text → rules. ``@prefix pre: <uri> .`` lines and
    ``#``/``//`` comments as in Rule.rulesParserFromReader."""
    prefixes: dict[str, str] = {}
    body_lines = []
    for line in text.splitlines():
        stripped = line.strip()
        if stripped.startswith("@prefix"):
            m = re.match(r"@prefix\s+([A-Za-z_][\w.-]*)\s*:\s*<([^>]*)>", stripped)
            if not m:
                raise ValueError(f"bad @prefix line: {line!r}")
            prefixes[m.group(1)] = m.group(2)
            continue
        if stripped.startswith("@include"):
            raise ValueError("@include is not in the engine's rule subset")
        body_lines.append(line)
    parser = _Parser(_tokenize("\n".join(body_lines)), prefixes)
    rules = []
    while parser.peek()[0] is not None:
        rules.append(parser.rule())
    return rules


# --------------------------------------------------------------------------
# evaluation
# --------------------------------------------------------------------------


def _guard_mask(t: pa.Table, g: Builtin):
    def col(arg, numeric: bool):
        if isinstance(arg, Var):
            c = t[arg.name].combine_chunks().cast(pa.large_string())
        else:
            c = pa.array([arg.lex] * t.num_rows, pa.large_string())
        if numeric:
            # invalid lexicals → null (Arrow cast would raise), so a
            # numeric guard over a non-numeric binding fails, not crashes
            valid = pc.match_substring_regex(
                c, r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$"
            )
            return pc.cast(
                pc.if_else(valid, c, pa.scalar(None, pa.large_string())),
                pa.float64(),
            )
        return c

    numeric = g.name in ("lessThan", "greaterThan", "le", "ge")
    a, b = col(g.args[0], numeric), col(g.args[1], numeric)
    op = {
        "equal": pc.equal,
        "notEqual": pc.not_equal,
        "lessThan": pc.less,
        "greaterThan": pc.greater,
        "le": pc.less_equal,
        "ge": pc.greater_equal,
    }[g.name]
    # nulls (non-numeric lexicals under a numeric builtin) fail the guard
    return pc.fill_null(op(a, b), False)


def _apply_guards(bindings_ds, guards: list[Builtin]):
    if not guards:
        return bindings_ds

    def kern(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return t
        mask = None
        for g in guards:
            m = _guard_mask(t, g)
            mask = m if mask is None else pc.and_(mask, m)
        return t.filter(mask)

    return bindings_ds.map_batches(kern, batch_format="pyarrow")


def _instantiate(head: list, rule_name: str):
    """Binding table (with term metadata) → head triples, vectorized."""

    def kern(t: pa.Table) -> pa.Table:
        n = t.num_rows
        names = set(t.schema.names)
        if t.num_columns == 0 or n == 0:
            return TRIPLE_SCHEMA.empty_table()

        def var_cols(v: str):
            lex = t[v].combine_chunks().cast(pa.large_string())
            kc, dc, lc = meta_cols_of(v)
            kind = (
                t[kc].combine_chunks().cast(pa.int8())
                if kc in names
                else pa.array([KIND_IRI] * n, pa.int8())
            )
            dt = (
                t[dc].combine_chunks().cast(pa.large_string())
                if dc in names
                else pa.array([""] * n, pa.large_string())
            )
            lang = (
                t[lc].combine_chunks().cast(pa.large_string())
                if lc in names
                else pa.array([""] * n, pa.large_string())
            )
            return kind, lex, dt, lang

        def const_cols(c: Const):
            kind_val = KIND_IRI if c.kind == IRI else KIND_LITERAL
            return (
                pa.array([kind_val] * n, pa.int8()),
                pa.array([c.lex] * n, pa.large_string()),
                pa.array([c.dt] * n, pa.large_string()),
                pa.array([c.lang] * n, pa.large_string()),
            )

        empty = pa.array([""] * n, pa.large_string())
        doc = pa.array([f"rule:{rule_name}"] * n, pa.large_string())
        out = []
        for (s, p, o) in head:
            s_kind, s_lex, _, _ = (
                var_cols(s.name) if isinstance(s, Var) else const_cols(s)
            )
            if isinstance(p, Var):
                p_col = t[p.name].combine_chunks().cast(pa.large_string())
            else:
                p_col = pa.array([p.lex] * n, pa.large_string())
            o_kind, o_lex, o_dt, o_lang = (
                var_cols(o.name) if isinstance(o, Var) else const_cols(o)
            )
            out.append(
                pa.Table.from_arrays(
                    [s_kind, s_lex, p_col, o_kind, o_lex, o_dt, o_lang,
                     empty, doc],
                    schema=TRIPLE_SCHEMA,
                )
            )
        return pa.concat_tables(out)

    return kern


KEY_COLS = ["s_kind", "s_lex", "p", "o_kind", "o_lex", "o_datatype",
            "o_lang", "g"]


def _tag(ds, tag_val: int):
    def kern(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return t
        return t.append_column("tag", pa.array([tag_val] * t.num_rows, pa.int8()))

    return ds.map_batches(kern, batch_format="pyarrow")


def forward_chain(triples_ds, rules, *, max_rounds: int | None = None):
    """Forward closure of the rule set over the triple Dataset → the
    saturated graph (input ∪ derived, set semantics on the triple key,
    min(doc_id) provenance). ``rules``: rule file text or parsed list."""
    from ..ops.bgp import match_bgp

    if isinstance(rules, str):
        rules = parse_rules(rules)

    def bgp_pat(pat):
        # match_bgp constants are LEXICAL strings (s_lex/p/o_lex equality;
        # literal constants match by lexical form — the engine's
        # documented term-join subset)
        return tuple(x if isinstance(x, Var) else x.lex for x in pat)

    graph = compact_blocks(triples_ds)
    rounds = 0
    while True:
        cands = []
        for idx, rule in enumerate(rules):
            b = match_bgp(graph, [bgp_pat(p) for p in rule.body], with_meta=True)
            b = _apply_guards(b, rule.guards)
            # compact: drop empty pass-through blocks that kept the
            # BINDING schema (map_batches skips empty blocks without
            # invoking the UDF — they would poison the union/groupby)
            cands.append(
                compact_blocks(
                    b.map_batches(
                        _instantiate(rule.head, rule.name or f"r{idx}"),
                        batch_format="pyarrow",
                    )
                )
            )
        new = cands[0]
        for c in cands[1:]:
            new = new.union(c)
        merged = compact_blocks(
            _tag(graph, 0)
            .union(_tag(new, 1))
            .groupby(KEY_COLS)
            .aggregate(*_min_aggs())
        )
        n_new = merged.map_batches(_count_new, batch_format="pyarrow").sum("n")
        graph = compact_blocks(
            merged.map_batches(_merged_to_triples, batch_format="pyarrow")
        )
        if not n_new:
            break
        if max_rounds is not None and rounds >= max_rounds:
            raise RuntimeError(
                f"forward_chain: round cap {max_rounds} hit with "
                f"{n_new} new triples — result would be truncated"
            )
        rounds += 1
    return graph


def _min_aggs():
    from ray.data.aggregate import Min

    return [Min("tag"), Min("doc_id")]


def _count_new(t: pa.Table) -> pa.Table:
    if t.num_columns == 0:
        return pa.table({"n": pa.array([0], pa.int64())})
    new = pc.sum(pc.equal(t["min(tag)"], pa.scalar(1, pa.int8()))).as_py() or 0
    return pa.table({"n": pa.array([new], pa.int64())})


def _merged_to_triples(t: pa.Table) -> pa.Table:
    if t.num_columns == 0:
        return TRIPLE_SCHEMA.empty_table()
    cols = []
    for f in TRIPLE_SCHEMA:
        src = "min(doc_id)" if f.name == "doc_id" else f.name
        cols.append(t[src].combine_chunks().cast(f.type))
    return pa.Table.from_arrays(cols, schema=TRIPLE_SCHEMA)
