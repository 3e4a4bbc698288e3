"""Pretty / structured writers: Turtle (subject-grouped), JSON-LD, RDF/XML.

Parity (SURVEY §2.2):
- Turtle pretty writer (TurtleShell.java + TurtleWriter*.java): subject
  grouping with ';' predicate lists and ',' object lists, prefix
  abbreviation. Realized distributed: groupby(subject).map_groups — the
  per-subject grouping the reference does in memory becomes the shuffle
  key. (Nested bnode inlining is not done; labels print as _:x. The W3C
  comparison is by parsed graph, so this is conformance-equivalent.)
- JSON-LD writer (JsonLD11Writer.java): one node object per subject,
  document = array of node objects.
- RDF/XML writer (RDFXML*Writer.java): one rdf:Description per subject.

Each writer emits per-subject text fragments; document assembly = header
+ fragments + footer (see ``assemble``). Round-trip safety is tested by
reparsing with our own readers.
"""

from __future__ import annotations

import json
from xml.sax.saxutils import escape as xml_escape
from xml.sax.saxutils import quoteattr

import pandas as pd

from ..model import (
    KIND_BNODE,
    KIND_IRI,
    KIND_LITERAL,
    RDF_NS,
    RDF_TYPE,
    XSD_STRING,
)
from ..rdf.escapes import escape_string
from .serialize import DEFAULT_PREFIXES, _abbrev, _term_ttl


def _group_sort_key(g: pd.DataFrame) -> pd.DataFrame:
    return g.sort_values(["p", "o_kind", "o_lex"], kind="mergesort")


def turtle_pretty_groups(triples_ds, prefixes: dict | None = None):
    """One pretty Turtle block per subject. Besides the assembled
    ``fragment``, each row carries the subject kind/label and the bare
    property ``body`` so :func:`assemble` can INLINE single-reference
    bnodes as nested ``[ ... ]`` (TurtleShell.java writeNestedObjects)."""
    prefixes = prefixes or DEFAULT_PREFIXES

    def fmt(g: pd.DataFrame) -> pd.DataFrame:
        g = _group_sort_key(g)
        s_kind = int(g["s_kind"].iloc[0])
        s_lex = g["s_lex"].iloc[0]
        subj = _term_ttl(s_kind, s_lex, "", "", prefixes)
        parts = []
        for p, pg in g.groupby("p", sort=True):
            pred = "a" if p == RDF_TYPE else _term_ttl(KIND_IRI, p, "", "", prefixes)
            objs = ", ".join(
                _term_ttl(int(r["o_kind"]), r["o_lex"], r["o_datatype"], r["o_lang"],
                          prefixes)
                for _, r in pg.iterrows()
            )
            parts.append(f"{pred} {objs}")
        body = " ;\n        ".join(parts)
        block = subj + " " + body + " ."
        return pd.DataFrame(
            {
                "fragment": [block],
                "sort_key": [s_lex],
                "s_is_bnode": [s_kind == KIND_BNODE],
                "s_label": [s_lex],
                "body": [body],
            }
        )

    return triples_ds.groupby(["s_kind", "s_lex"]).map_groups(
        fmt, batch_format="pandas"
    )


def _string_spans(text: str) -> list[tuple[int, int]]:
    """Spans of Turtle string literals (short/long, single/double quoted,
    backslash escapes honored) — bnode-reference scanning must skip these
    so a literal containing ``"_:b0"`` is never treated as a reference."""
    spans = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c in "\"'":
            start = i
            if text[i : i + 3] == c * 3:
                q = c * 3
                i += 3
                while i < n and text[i : i + 3] != q:
                    i += 2 if text[i] == "\\" else 1
                i = min(n, i + 3)
            else:
                i += 1
                while i < n and text[i] != c:
                    i += 2 if text[i] == "\\" else 1
                i = min(n, i + 1)
            spans.append((start, i))
        else:
            i += 1
    return spans


def _inline_bnodes(rows: list[dict]) -> list[str]:
    """Driver-side bnode inlining over the (small) assembled fragment set:
    a bnode subject referenced EXACTLY ONCE as an object (and not by
    itself) is substituted into its referencing block as ``[ body ]`` and
    its own block dropped; iterated to fixpoint so chains nest bottom-up.
    Cycles and multi-reference bnodes keep their ``_:x`` labels (same rule
    as the reference's pretty writer). Reference scanning is quote-aware:
    ``_:label`` inside a string literal is content, not a reference."""
    import re

    frags = {i: dict(r) for i, r in enumerate(rows)}

    def matches_outside_strings(label: str, body: str):
        pat = re.compile(rf"_:{re.escape(label)}(?![0-9A-Za-z_\-])")
        spans = _string_spans(body)
        return [
            m
            for m in pat.finditer(body)
            if not any(a <= m.start() < b for a, b in spans)
        ]

    def refs_of(label: str):
        return [
            i
            for i, f in frags.items()
            for _ in matches_outside_strings(label, f["body"])
        ]

    changed = True
    while changed:
        changed = False
        for i in sorted(frags):
            f = frags.get(i)
            if f is None or not f["s_is_bnode"]:
                continue
            label = f["s_label"]
            ref_ids = refs_of(label)
            if len(ref_ids) != 1 or ref_ids[0] == i:
                continue
            j = ref_ids[0]
            body = frags[j]["body"]
            m = matches_outside_strings(label, body)[0]
            inline = "[ " + f["body"] + " ]"
            frags[j]["body"] = body[: m.start()] + inline + body[m.end():]
            del frags[i]
            changed = True

    out = []
    for i in sorted(frags, key=lambda k: frags[k]["sort_key"]):
        f = frags[i]
        subj = f["fragment"].split(" ", 1)[0] if not f["s_is_bnode"] else "_:" + f["s_label"]
        out.append(subj + " " + f["body"] + " .")
    return out


def turtle_header(prefixes: dict | None = None) -> str:
    prefixes = prefixes or DEFAULT_PREFIXES
    return "\n".join(f"@prefix {p}: <{ns}> ." for p, ns in sorted(prefixes.items()))


def _jsonld_value(o_kind, o_lex, o_dt, o_lang):
    if o_kind == KIND_IRI:
        return {"@id": o_lex}
    if o_kind == KIND_BNODE:
        return {"@id": "_:" + o_lex}
    if o_lang:
        return {"@value": o_lex, "@language": o_lang}
    if o_dt and o_dt != XSD_STRING:
        return {"@value": o_lex, "@type": o_dt}
    return {"@value": o_lex}


def jsonld_groups(triples_ds):
    """One JSON-LD node object (as compact JSON text) per subject."""

    def fmt(g: pd.DataFrame) -> pd.DataFrame:
        g = _group_sort_key(g)
        s_kind = int(g["s_kind"].iloc[0])
        s_lex = g["s_lex"].iloc[0]
        node: dict = {"@id": s_lex if s_kind == KIND_IRI else "_:" + s_lex}
        for p, pg in g.groupby("p", sort=True):
            vals = [
                _jsonld_value(int(r["o_kind"]), r["o_lex"], r["o_datatype"],
                              r["o_lang"])
                for _, r in pg.iterrows()
            ]
            if p == RDF_TYPE and all("@id" in v and not v["@id"].startswith("_:")
                                     for v in vals):
                node["@type"] = [v["@id"] for v in vals]
            else:
                node[p] = vals
        return pd.DataFrame(
            {"fragment": [json.dumps(node, sort_keys=True)], "sort_key": [s_lex]}
        )

    return triples_ds.groupby(["s_kind", "s_lex"]).map_groups(
        fmt, batch_format="pandas"
    )


def rdfjson_groups(triples_ds):
    """One RDF/JSON subject entry (as '"S": {...}' text) per subject
    (RDFJSONWriter.java — resource-centric, one key per subject)."""
    from ..rdf.rdfjson import _value_obj

    def fmt(g: pd.DataFrame) -> pd.DataFrame:
        g = _group_sort_key(g)
        s_kind = int(g["s_kind"].iloc[0])
        s_lex = g["s_lex"].iloc[0]
        skey = "_:" + s_lex if s_kind == KIND_BNODE else s_lex
        props: dict = {}
        for _, r in g.iterrows():
            v = _value_obj(int(r["o_kind"]), r["o_lex"], r["o_datatype"], r["o_lang"])
            vals = props.setdefault(r["p"], [])
            if v not in vals:
                vals.append(v)
        frag = json.dumps(skey) + ": " + json.dumps(props, sort_keys=True)
        return pd.DataFrame({"fragment": [frag], "sort_key": [skey]})

    return triples_ds.groupby(["s_kind", "s_lex"]).map_groups(
        fmt, batch_format="pandas"
    )


def _rdfxml_prop(p, o_kind, o_lex, o_dt, o_lang) -> str:
    # property elements use a generated q-name via a per-document ns table;
    # for the flat writer we split at the last # or /
    for sep in ("#", "/"):
        i = p.rfind(sep)
        if i > 0 and i < len(p) - 1:
            ns, local = p[: i + 1], p[i + 1:]
            if local.replace("_", "").replace("-", "").isalnum() and not local[0].isdigit():
                break
    else:
        # the reference's RDF/XML writer raises "cannot split URI" rather
        # than altering data (ADVICE r1 #3: ns+"value" round-trips to a
        # DIFFERENT predicate — silent corruption)
        raise ValueError(
            f"RDF/XML writer: cannot derive an XML qname from predicate IRI {p!r}"
        )
    tag = f"n:{local}"
    nsdecl = f' xmlns:n="{xml_escape(ns)}"'
    if o_kind == KIND_IRI:
        return f"<{tag}{nsdecl} rdf:resource={quoteattr(o_lex)}/>"
    if o_kind == KIND_BNODE:
        return f"<{tag}{nsdecl} rdf:nodeID={quoteattr(o_lex)}/>"
    attrs = ""
    if o_lang:
        attrs = f" xml:lang={quoteattr(o_lang)}"
    elif o_dt and o_dt != XSD_STRING:
        attrs = f" rdf:datatype={quoteattr(o_dt)}"
    return f"<{tag}{nsdecl}{attrs}>{xml_escape(o_lex)}</{tag}>"


def rdfxml_groups(triples_ds):
    """One <rdf:Description> block per subject."""

    def fmt(g: pd.DataFrame) -> pd.DataFrame:
        g = _group_sort_key(g)
        s_kind = int(g["s_kind"].iloc[0])
        s_lex = g["s_lex"].iloc[0]
        if s_kind == KIND_IRI:
            head = f"<rdf:Description rdf:about={quoteattr(s_lex)}>"
        else:
            head = f"<rdf:Description rdf:nodeID={quoteattr(s_lex)}>"
        props = [
            "  " + _rdfxml_prop(r["p"], int(r["o_kind"]), r["o_lex"],
                                r["o_datatype"], r["o_lang"])
            for _, r in g.iterrows()
        ]
        block = "\n".join([head, *props, "</rdf:Description>"])
        return pd.DataFrame({"fragment": [block], "sort_key": [s_lex]})

    return triples_ds.groupby(["s_kind", "s_lex"]).map_groups(
        fmt, batch_format="pandas"
    )


RDFXML_HEADER = (
    '<?xml version="1.0"?>\n'
    f'<rdf:RDF xmlns:rdf="{RDF_NS}">'
)
RDFXML_FOOTER = "</rdf:RDF>"

TRIX_HEADER = '<?xml version="1.0"?>\n<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/">'
TRIX_FOOTER = "</TriX>"


def _trix_term(kind, lex, dt, lang) -> str:
    if kind == KIND_IRI:
        return f"<uri>{xml_escape(lex)}</uri>"
    if kind == KIND_BNODE:
        return f"<id>{xml_escape(lex)}</id>"
    if lang:
        return f'<plainLiteral xml:lang={quoteattr(lang)}>{xml_escape(lex)}</plainLiteral>'
    if dt and dt != XSD_STRING:
        return f"<typedLiteral datatype={quoteattr(dt)}>{xml_escape(lex)}</typedLiteral>"
    return f"<plainLiteral>{xml_escape(lex)}</plainLiteral>"


def trix_groups(triples_ds):
    """One <graph> fragment per graph name (TriX writer, symmetric to
    rdf/trix.py; graph name = shuffle key)."""

    def fmt(g: pd.DataFrame) -> pd.DataFrame:
        gname = g["g"].iloc[0]
        lines = ["<graph>"]
        if gname:
            lines.append(f"  <uri>{xml_escape(gname)}</uri>")
        g = g.sort_values(["s_lex", "p", "o_lex"], kind="mergesort")
        for _, r in g.iterrows():
            lines.append("  <triple>")
            lines.append("    " + _trix_term(int(r["s_kind"]), r["s_lex"], "", ""))
            lines.append("    " + _trix_term(KIND_IRI, r["p"], "", ""))
            lines.append(
                "    "
                + _trix_term(int(r["o_kind"]), r["o_lex"], r["o_datatype"], r["o_lang"])
            )
            lines.append("  </triple>")
        lines.append("</graph>")
        return pd.DataFrame({"fragment": ["\n".join(lines)], "sort_key": [gname]})

    return triples_ds.groupby("g").map_groups(fmt, batch_format="pandas")


def assemble(fragments_ds, fmt: str, prefixes: dict | None = None) -> str:
    """Deterministic full-document text (small outputs / tests): sorted
    fragments + header/footer. Large outputs keep the fragments dataset
    and write it partitioned instead."""
    rows = sorted(fragments_ds.take_all(), key=lambda r: r["sort_key"])
    frags = [r["fragment"] for r in rows]
    if fmt == "turtle":
        if rows and "s_is_bnode" in rows[0]:
            frags = _inline_bnodes(rows)
        return turtle_header(prefixes) + "\n\n" + "\n\n".join(frags) + "\n"
    if fmt == "jsonld":
        return "[" + ",\n".join(frags) + "]"
    if fmt == "rdfxml":
        return RDFXML_HEADER + "\n" + "\n".join(frags) + "\n" + RDFXML_FOOTER
    if fmt == "trix":
        return TRIX_HEADER + "\n" + "\n".join(frags) + "\n" + TRIX_FOOTER
    if fmt == "rdfjson":
        return "{" + ",\n".join(frags) + "}"
    raise ValueError(f"unknown format {fmt!r}")
