"""TriX reader — the XML triple interchange format.

Parity: jena-arq/.../riot/lang/ReaderTriX.java; conformance corpus
jena-arq/testing/RIOT/Lang/TriX (tests/test_trix_graphalgo.py runs
every .trix against its golden .nq and the bad-01..09 rejections).

    <TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/">  (or <trix>)
      <graph>
        (<uri>g</uri> | <id>bnode</id>)?      <!-- optional name first -->
        <triple>
          <uri>..</uri> | <id>b</id> | <qname>pfx:local</qname> |
          <plainLiteral xml:lang="..">..</plainLiteral> |
          <typedLiteral datatype="..">..</typedLiteral> |
          <triple>..3 terms..</triple>        <!-- RDF 1.2 triple term -->
          (exactly three terms)
        </triple>*
      </graph>*
    </TriX>

Built on expat WITHOUT namespace processing so (a) qname prefixes and
the per-element xmlns declarations stay visible (TriX <qname> terms
resolve against them), and (b) rdf:XMLLiteral values capture the RAW
inner XML byte-for-byte as jena does (tags, attributes and whitespace
preserved — trix-12/13/14 goldens)."""

from __future__ import annotations

from ..model import (
    KIND_BNODE,
    KIND_IRI,
    KIND_LITERAL,
    KIND_TRIPLE_TERM,
    RDF_LANGSTRING,
    XSD_STRING,
    RDFParseError,
)

TRIX_NS = "http://www.w3.org/2004/03/trix/trix-1/"

_TERM_TAGS = frozenset(
    {"uri", "id", "qname", "plainLiteral", "typedLiteral", "triple"})


def _local(tag: str) -> str:
    return tag.rsplit(":", 1)[-1]


def parse_trix(text: str, base: str = "", on_error: str = "raise") -> list[tuple]:
    """One TriX document → term 8-tuples (with graph names; a bnode
    graph name carries the '_:' prefix)."""
    try:
        return _parse(text)
    except RDFParseError:
        if on_error == "skip":
            return []
        raise


def _parse(text: str) -> list[tuple]:
    import xml.parsers.expat as expat

    data = text.encode("utf-8") if isinstance(text, str) else text
    parser = expat.ParserCreate()

    out: list[tuple] = []
    # stack frames: ("root",) | ("trix",) | ("graph", name, saw_triple)
    # | ("triple", terms) | ("term", tag, text_chunks, attrs)
    stack: list = [["root"]]
    ns_stack: list[dict] = [{}]
    lit: dict | None = None  # raw-capture state for literal elements
    bn = [0]

    def err(msg: str):
        raise RDFParseError(f"TriX: {msg}")

    def fresh_label() -> str:
        bn[0] += 1
        return f"trixg{bn[0]}"

    def mark_lit_content():
        if lit is not None and lit["start"] is None:
            lit["start"] = parser.CurrentByteIndex

    def finish_term(term: tuple):
        """A completed TERM lands in the enclosing frame."""
        top = stack[-1]
        if top[0] == "triple":
            top[1].append(term)
            return
        if top[0] == "graph":
            # a graph's FIRST child uri/id names the graph
            if top[1] is None and not top[2] \
                    and term[0] in (KIND_IRI, KIND_BNODE):
                top[1] = (term[1] if term[0] == KIND_IRI
                          else "_:" + term[1])
                return
            err("unexpected term element in <graph>")
        err("unexpected term element")

    def start(name, attrs):
        nonlocal lit
        if lit is not None:
            # inside a literal: raw capture only
            mark_lit_content()
            lit["depth"] += 1
            lit["has_elem"] = True
            return
        mark_lit_content()
        new_ns = dict(ns_stack[-1])
        for k, v in attrs.items():
            if k == "xmlns":
                new_ns[""] = v
            elif k.startswith("xmlns:"):
                new_ns[k[6:]] = v
        ns_stack.append(new_ns)
        tag = _local(name)
        top = stack[-1]
        if top[0] == "root":
            if tag.lower() != "trix":
                err("root element must be TriX")
            stack.append(["trix"])
            return
        if top[0] == "trix":
            if tag != "graph":
                err("TriX children must be <graph>")
            stack.append(["graph", None, False])
            return
        if tag == "triple":
            if top[0] == "graph":
                top[2] = True
                stack.append(["triple", []])
                return
            if top[0] == "triple":
                # RDF 1.2: a nested <triple> is a triple TERM
                stack.append(["triple", []])
                return
            err("<triple> outside <graph>")
        if tag in _TERM_TAGS:
            if top[0] not in ("triple", "graph"):
                err(f"unexpected <{tag}>")
            if top[0] == "graph" and tag not in ("uri", "id"):
                err(f"a <graph> name must be <uri> or <id>, not <{tag}>")
            stack.append(["term", tag, [], dict(attrs)])
            if tag in ("plainLiteral", "typedLiteral"):
                lit = {"depth": 0, "start": None, "has_elem": False,
                       "chunks": []}
            return
        err(f"unknown TriX element: {tag}")

    def chars(s):
        if lit is not None:
            mark_lit_content()
            lit["chunks"].append(s)
            return
        top = stack[-1]
        if top[0] == "term":
            top[2].append(s)
        elif s.strip():
            err(f"stray text {s.strip()[:20]!r}")

    def end(name):
        nonlocal lit
        if lit is not None and lit["depth"] > 0:
            lit["depth"] -= 1
            return
        top = stack.pop()
        if top[0] == "term":
            tag, chunks, attrs = top[1], top[2], top[3]
            if tag in ("plainLiteral", "typedLiteral"):
                assert lit is not None
                if lit["has_elem"]:
                    # RAW inner XML (rdf:XMLLiteral) — byte-exact
                    lex = data[lit["start"]:parser.CurrentByteIndex
                               ].decode("utf-8")
                elif lit["start"] is None:
                    lex = ""
                else:
                    lex = "".join(lit["chunks"])
                lit = None
                if tag == "typedLiteral":
                    dt = attrs.get("datatype")
                    if not dt:
                        err("typedLiteral without datatype")
                    finish_term((KIND_LITERAL, lex, dt, ""))
                else:
                    lang = attrs.get("xml:lang", "")
                    finish_term(
                        (KIND_LITERAL, lex, RDF_LANGSTRING, lang)
                        if lang else (KIND_LITERAL, lex, XSD_STRING, ""))
            else:
                txt = "".join(chunks).strip()
                if tag == "uri":
                    finish_term((KIND_IRI, txt, "", ""))
                elif tag == "id":
                    finish_term((KIND_BNODE, txt, "", ""))
                else:  # qname
                    pfx, sep, local_n = txt.partition(":")
                    if not sep:
                        pfx, local_n = "", txt
                    ns = ns_stack[-1].get(pfx)
                    if ns is None:
                        err(f"undeclared qname prefix {pfx!r}")
                    finish_term((KIND_IRI, ns + local_n, "", ""))
            ns_stack.pop()
            return
        ns_stack.pop()
        if top[0] == "triple":
            terms = top[1]
            if len(terms) != 3:
                err("a <triple> needs exactly 3 terms")
            s, p, o = terms
            parent = stack[-1]
            if parent[0] == "triple":
                # nested triple → serialized triple TERM
                from .tripleterm import serialize_tt

                if s[0] == KIND_LITERAL:
                    err("literal subject in triple term")
                if s[0] == KIND_TRIPLE_TERM:
                    err("triple term not allowed as a triple-term "
                        "subject (star-bad-triple-term-4)")
                if p[0] != KIND_IRI:
                    err("triple-term predicate must be a URI")
                parent[1].append(
                    (KIND_TRIPLE_TERM, serialize_tt(s, p, o), "", ""))
                return
            if s[0] == KIND_LITERAL:
                err("literal subject")
            if s[0] == KIND_TRIPLE_TERM:
                err("triple-term subject")
            if p[0] != KIND_IRI:
                err("predicate must be a URI")
            gname = parent[1] or "" if parent[0] == "graph" else ""
            out.append((s[0], s[1], p[1], o[0], o[1], o[2], o[3], gname))
            return
        # graph / trix close: nothing to emit

    parser.StartElementHandler = start
    parser.EndElementHandler = end
    parser.CharacterDataHandler = chars
    try:
        parser.Parse(data, True)
    except expat.ExpatError as e:
        raise RDFParseError(f"TriX parse error: {e}") from None
    if len(stack) != 1 or stack[0][0] != "root":
        raise RDFParseError("TriX: truncated document")
    return out
