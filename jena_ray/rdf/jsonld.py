"""JSON-LD reader — the practical 1.1 subset, stdlib-only.

Parity target: jena-arq/.../riot/lang/LangJSONLD11.java (which delegates
to titanium-json-ld). This implementation covers the core used by
real-world documents, without remote-context fetching (the sandbox has no
network; remote @context URLs raise):

- @context: term→IRI strings, prefix definitions, expanded term defs
  ({"@id", "@type": coercion / "@id" / "@json", "@container":
  @list/@set/@index/@language/@id/@type, "@reverse", term-scoped
  "@context"}, @vocab, @base, @language)
- node objects: @id (IRI or _:bnode), @type, nested nodes (fresh bnodes),
  node references, arrays, @graph (top-level and named), @reverse,
  @included, @nest
- value objects: @value with @type / @language; @json literals
  (rdf:JSON, canonical sorted-key lexical)
- @list containers → rdf:first/rest chains; language maps → tagged
  literals (@none key = untagged); index maps drop the index key;
  id/type maps inject the key as @id / an extra @type

Not covered (documented out, LangJSONLD11.java delegates these to
titanium): remote contexts (no network), @direction base direction,
type-scoped contexts, @propagate/@protected enforcement.

Output: term 8-tuples like the other parsers (doc-local bnode labels).
"""

from __future__ import annotations

import json

from ..model import (
    KIND_BNODE,
    KIND_IRI,
    KIND_LITERAL,
    RDF_FIRST,
    RDF_LANGSTRING,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    XSD_NS,
    XSD_STRING,
    RDFParseError,
)
from .iri import resolve

_KEYWORDS = {"@context", "@id", "@type", "@value", "@language", "@list",
             "@set", "@graph", "@base", "@vocab", "@container", "@reverse",
             "@index", "@nest", "@included", "@json", "@none", "@version",
             "@direction", "@propagate", "@protected"}

RDF_JSON = "http://www.w3.org/1999/02/22-rdf-syntax-ns#JSON"


def _json_canonical(v) -> str:
    """Canonical JSON lexical for rdf:JSON literals (JSON-LD 1.1 §8.2 —
    sorted keys, minimal separators, no ASCII escaping)."""
    return json.dumps(v, sort_keys=True, separators=(",", ":"),
                      ensure_ascii=False)


def _containers(tdef: dict) -> set:
    c = tdef.get("@container")
    if c is None:
        return set()
    return set(c) if isinstance(c, list) else {c}


class _Context:
    def __init__(self, parent=None):
        self.terms: dict[str, dict] = dict(parent.terms) if parent else {}
        self.vocab = parent.vocab if parent else None
        self.base = parent.base if parent else ""
        self.language = parent.language if parent else None

    def child(self, ctx_obj) -> "_Context":
        out = _Context(self)
        if ctx_obj is None:
            return _Context()  # null context resets
        if isinstance(ctx_obj, str):
            raise RDFParseError(
                f"remote @context not supported offline: {ctx_obj!r}"
            )
        if isinstance(ctx_obj, list):
            for c in ctx_obj:
                out = out.child(c)
            return out
        for key, val in ctx_obj.items():
            if key == "@vocab":
                out.vocab = val
            elif key == "@base":
                out.base = val
            elif key == "@language":
                out.language = val
            elif key.startswith("@"):
                continue
            elif isinstance(val, str):
                out.terms[key] = {"@id": val}
            elif isinstance(val, dict):
                out.terms[key] = val
            elif val is None:
                out.terms.pop(key, None)
        return out

    def expand_iri(self, value: str, *, vocab: bool = False, _seen=frozenset()) -> str | None:
        if value.startswith("@"):
            return value
        if value in self.terms and value not in _seen:
            tid = self.terms[value].get("@id")
            if tid is None:
                return None
            if tid == value:
                return tid
            # a term's @id may itself be a CURIE ("name": "foaf:name") —
            # expand recursively through the context (ADVICE r1 #2); _seen
            # breaks definition cycles
            return self.expand_iri(tid, vocab=True, _seen=_seen | {value})
        if ":" in value:
            prefix, _, suffix = value.partition(":")
            if prefix in self.terms and not suffix.startswith("//") \
                    and prefix not in _seen:
                pid = self.terms[prefix].get("@id", "")
                if pid and pid != prefix:
                    pid = self.expand_iri(
                        pid, vocab=True, _seen=_seen | {prefix}
                    ) or pid
                return pid + suffix
            return value  # absolute IRI (or _:bnode handled by caller)
        if vocab and self.vocab:
            return self.vocab + value
        if self.base:
            return resolve(self.base, value)
        return value

    def term_def(self, term: str) -> dict:
        return self.terms.get(term, {})


class _State:
    def __init__(self):
        self.out: list[tuple] = []
        self.anon = 0

    def fresh(self) -> str:
        self.anon += 1
        return f"!a{self.anon}"


def _subject_of(node: dict, ctx: _Context, st: _State):
    nid = node.get("@id")
    if nid is None:
        return (KIND_BNODE, st.fresh())
    if nid.startswith("_:"):
        return (KIND_BNODE, nid[2:])
    return (KIND_IRI, ctx.expand_iri(nid))


def _object_term(value, ctx: _Context, st: _State, tdef: dict, graph: str):
    """Returns (kind, lex, datatype, lang) or None if no triple."""
    if tdef.get("@type") == "@json":
        return (KIND_LITERAL, _json_canonical(value), RDF_JSON, "")
    if isinstance(value, dict):
        if "@value" in value:
            v = value["@value"]
            if value.get("@type") == "@json":
                return (KIND_LITERAL, _json_canonical(v), RDF_JSON, "")
            if isinstance(v, bool):
                return (KIND_LITERAL, "true" if v else "false",
                        XSD_NS + "boolean", "")
            if isinstance(v, int):
                return (KIND_LITERAL, str(v), XSD_NS + "integer", "")
            if isinstance(v, float):
                return (KIND_LITERAL, repr(v), XSD_NS + "double", "")
            dt = value.get("@type")
            lang = value.get("@language")
            if dt:
                return (KIND_LITERAL, str(v), ctx.expand_iri(dt, vocab=True), "")
            if lang:
                return (KIND_LITERAL, str(v), RDF_LANGSTRING, lang)
            if ctx.language:
                return (KIND_LITERAL, str(v), RDF_LANGSTRING, ctx.language)
            return (KIND_LITERAL, str(v), XSD_STRING, "")
        if "@list" in value:
            items = value["@list"]
            if not isinstance(items, list):
                items = [items]
            terms = [_object_term(i, ctx, st, {}, graph) for i in items]
            terms = [t for t in terms if t is not None]
            if not terms:
                return (KIND_IRI, RDF_NIL, "", "")
            cells = [st.fresh() for _ in terms]
            for i, t in enumerate(terms):
                cell = (KIND_BNODE, cells[i])
                st.out.append((cell[0], cell[1], RDF_FIRST, t[0], t[1], t[2], t[3], graph))
                nxt = (KIND_BNODE, cells[i + 1], "", "") if i + 1 < len(cells) \
                    else (KIND_IRI, RDF_NIL, "", "")
                st.out.append((cell[0], cell[1], RDF_REST, nxt[0], nxt[1], "", "", graph))
            return (KIND_BNODE, cells[0], "", "")
        # node object / node reference
        subj = _node(value, ctx, st, graph)
        return (subj[0], subj[1], "", "")
    if isinstance(value, bool):
        return (KIND_LITERAL, "true" if value else "false", XSD_NS + "boolean", "")
    if isinstance(value, int):
        return (KIND_LITERAL, str(value), XSD_NS + "integer", "")
    if isinstance(value, float):
        return (KIND_LITERAL, repr(value), XSD_NS + "double", "")
    if isinstance(value, str):
        tt = tdef.get("@type")
        if tt == "@id":
            iri = ctx.expand_iri(value)
            if value.startswith("_:"):
                return (KIND_BNODE, value[2:], "", "")
            return (KIND_IRI, iri, "", "")
        if tt:
            return (KIND_LITERAL, value, ctx.expand_iri(tt, vocab=True), "")
        lang = tdef.get("@language", ctx.language)
        if lang:
            return (KIND_LITERAL, value, RDF_LANGSTRING, lang)
        return (KIND_LITERAL, value, XSD_STRING, "")
    if value is None:
        return None
    raise RDFParseError(f"unsupported JSON-LD value: {value!r}")


def _node(node: dict, ctx: _Context, st: _State, graph: str = ""):
    if "@context" in node:
        ctx = ctx.child(node["@context"])
    subj = _subject_of(node, ctx, st)

    types = node.get("@type", [])
    if isinstance(types, str):
        types = [types]
    for t in types:
        st.out.append(
            (subj[0], subj[1], RDF_TYPE, KIND_IRI,
             ctx.expand_iri(t, vocab=True), "", "", graph)
        )

    if "@graph" in node and node.get("@id") is not None:
        gname = subj[1] if subj[0] == KIND_IRI else "_:" + subj[1]
        for child in _as_list(node["@graph"]):
            _node(child, ctx, st, gname)

    if "@included" in node:  # JSON-LD 1.1 §9.13: sibling nodes, same graph
        for child in _as_list(node["@included"]):
            _node(child, ctx, st, graph)

    if "@reverse" in node:  # {"@reverse": {pred: nodes}} → (obj, pred, subj)
        for rkey, rval in node["@reverse"].items():
            rpred = ctx.expand_iri(rkey, vocab=True)
            for v in _as_list(rval):
                obj = _node(v, ctx, st, graph) if isinstance(v, dict) else (
                    (KIND_BNODE, v[2:]) if isinstance(v, str) and v.startswith("_:")
                    else (KIND_IRI, ctx.expand_iri(v))
                )
                st.out.append(
                    (obj[0], obj[1], rpred, subj[0], subj[1], "", "", graph)
                )

    _props(subj, node, ctx, st, graph)
    return subj


def _props(subj, node: dict, ctx: _Context, st: _State, graph: str):
    """Emit the property triples of one node object (also used for the
    contents of @nest groups, which attach to the PARENT node)."""
    for key, value in node.items():
        if key == "@nest" or ctx.term_def(key).get("@id") == "@nest":
            for nest_obj in _as_list(value):
                if not isinstance(nest_obj, dict) or "@value" in nest_obj:
                    raise RDFParseError("@nest value must be a node-like map")
                _props(subj, nest_obj, ctx, st, graph)
            continue
        if key in _KEYWORDS:
            continue
        tdef = ctx.term_def(key)
        if "@context" in tdef:  # term-scoped context (property scope)
            ctx_here = ctx.child(tdef["@context"])
            tdef = {k: v for k, v in tdef.items() if k != "@context"}
        else:
            ctx_here = ctx
        if "@reverse" in tdef:  # reverse term: {"children": {"@reverse": iri}}
            rpred = ctx_here.expand_iri(tdef["@reverse"], vocab=True)
            for v in _as_list(value):
                obj = _node(v, ctx_here, st, graph) if isinstance(v, dict) else (
                    (KIND_BNODE, v[2:]) if isinstance(v, str) and v.startswith("_:")
                    else (KIND_IRI, ctx_here.expand_iri(v))
                )
                st.out.append(
                    (obj[0], obj[1], rpred, subj[0], subj[1], "", "", graph)
                )
            continue
        pred = ctx.expand_iri(key, vocab=True)
        if pred is None or (pred.startswith("@")):
            continue
        if ":" not in pred:
            continue  # term not expandable to an IRI → dropped (spec behavior)
        conts = _containers(tdef)
        if "@language" in conts and isinstance(value, dict):
            # language map: key = tag ("@none" = untagged), value = strings
            for tag, vals in value.items():
                for v in _as_list(vals):
                    if v is None:
                        continue
                    term = (
                        (KIND_LITERAL, str(v), XSD_STRING, "")
                        if tag == "@none"
                        else (KIND_LITERAL, str(v), RDF_LANGSTRING, tag)
                    )
                    st.out.append((subj[0], subj[1], pred, *term, graph))
            continue
        if "@index" in conts and isinstance(value, dict):
            # index map: index keys are dropped on the way to RDF
            value = [v for vals in value.values() for v in _as_list(vals)]
        elif "@id" in conts and isinstance(value, dict):
            # id map: the key becomes the node's @id ("@none" → bnode)
            expanded = []
            for nid, v in value.items():
                for item in _as_list(v):
                    item = dict(item) if isinstance(item, dict) else {"@id": item}
                    if "@id" not in item and nid != "@none":
                        item["@id"] = nid
                    expanded.append(item)
            value = expanded
        elif "@type" in conts and isinstance(value, dict):
            # type map: the key joins the node's @type list
            expanded = []
            for tkey, v in value.items():
                for item in _as_list(v):
                    item = dict(item) if isinstance(item, dict) else {"@id": item}
                    if tkey != "@none":
                        tl = _as_list(item.get("@type", []))
                        item["@type"] = tl + [tkey]
                    expanded.append(item)
            value = expanded
        values = value if isinstance(value, list) else [value]
        if "@list" in conts and not (
            len(values) == 1 and isinstance(values[0], dict) and "@list" in values[0]
        ):
            values = [{"@list": values}]
        for v in values:
            term = _object_term(v, ctx_here, st, tdef, graph)
            if term is not None:
                st.out.append(
                    (subj[0], subj[1], pred, term[0], term[1], term[2], term[3], graph)
                )


def _as_list(v):
    return v if isinstance(v, list) else [v]


def parse_jsonld(text: str, base: str = "", on_error: str = "raise") -> list[tuple]:
    """One JSON-LD document → term 8-tuples."""
    try:
        doc = json.loads(text)
        ctx = _Context()
        ctx.base = base
        st = _State()
        if isinstance(doc, dict) and "@context" in doc:
            ctx = ctx.child(doc["@context"])
        if isinstance(doc, list):
            for node in doc:
                _node(node, ctx, st)
        elif isinstance(doc, dict) and "@graph" in doc and doc.get("@id") is None:
            for node in _as_list(doc["@graph"]):
                _node(node, ctx, st)
        elif isinstance(doc, dict):
            _node(doc, ctx, st)
        else:
            raise RDFParseError("JSON-LD document must be an object or array")
        return st.out
    except (RDFParseError, json.JSONDecodeError, ValueError, AttributeError) as e:
        if on_error == "skip":
            return []
        if isinstance(e, RDFParseError):
            raise
        raise RDFParseError(f"JSON-LD parse error: {e}") from None
