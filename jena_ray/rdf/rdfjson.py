"""RDF/JSON (the talis-style resource-centric JSON serialization).

Reference: jena-arq riot/lang/LangRDFJSON.java (reader) and
riot/writer/RDFJSONWriter.java:

    { "S": { "P": [ { "type": "uri"|"literal"|"bnode", "value": "...",
                      "datatype": "...", "lang": "..." }, ... ] } }

Subjects/objects with "_:" prefixes are blank nodes. Not to be confused
with JSON-LD (rdf/jsonld.py).
"""

from __future__ import annotations

import json

from ..model import (
    KIND_BNODE,
    KIND_IRI,
    KIND_LITERAL,
    XSD_STRING,
    RDFParseError,
)


def parse_rdfjson(text: str, base: str = "", on_error: str = "raise") -> list[tuple]:
    """RDF/JSON document → list of term 8-tuples."""
    try:
        # jena's RDF/JSON tokenizer skips '#' comment LINES
        # (RIOT/Lang/RDF-JSON rdf-json-00.rj opens with "#Empty")
        if "#" in text:
            text = "\n".join(
                ln for ln in text.split("\n")
                if not ln.lstrip().startswith("#"))
        doc = json.loads(text)
        if not isinstance(doc, dict):
            raise RDFParseError("RDF/JSON root must be an object")
    except (json.JSONDecodeError, RDFParseError):
        if on_error == "skip":
            return []
        raise RDFParseError("invalid RDF/JSON document") from None
    out: list[tuple] = []
    for s, props in doc.items():
        if s.startswith("_:"):
            s_kind, s_lex = KIND_BNODE, s[2:]
        else:
            s_kind, s_lex = KIND_IRI, s
        if not isinstance(props, dict):
            if on_error == "skip":
                continue
            raise RDFParseError(f"subject {s!r}: properties must be an object")
        for p, vals in props.items():
            if not isinstance(vals, list):
                if on_error == "skip":
                    continue
                raise RDFParseError(f"{s!r} {p!r}: values must be an array")
            for v in vals:
                try:
                    t = v.get("type")
                    value = v["value"]
                    if t == "uri":
                        out.append((s_kind, s_lex, p, KIND_IRI, value, "", "", ""))
                    elif t == "bnode":
                        lex = value[2:] if value.startswith("_:") else value
                        out.append((s_kind, s_lex, p, KIND_BNODE, lex, "", "", ""))
                    elif t == "literal":
                        lang = v.get("lang", "") or ""
                        dt = v.get("datatype", "") or ""
                        if lang and not dt:
                            from ..model import RDF_LANGSTRING

                            dt = RDF_LANGSTRING
                        elif not lang and not dt:
                            dt = XSD_STRING
                        out.append(
                            (s_kind, s_lex, p, KIND_LITERAL, value, dt, lang, "")
                        )
                    else:
                        raise RDFParseError(f"unknown value type {t!r}")
                except (AttributeError, KeyError, TypeError):
                    if on_error == "skip":
                        continue
                    raise RDFParseError(
                        f"{s!r} {p!r}: bad value object {v!r}"
                    ) from None
                except RDFParseError:
                    if on_error == "skip":
                        continue
                    raise
    return out


def _value_obj(o_kind: int, o_lex: str, o_dt: str, o_lang: str) -> dict:
    if o_kind == KIND_IRI:
        return {"type": "uri", "value": o_lex}
    if o_kind == KIND_BNODE:
        return {"type": "bnode", "value": "_:" + o_lex}
    v: dict = {"type": "literal", "value": o_lex}
    if o_lang:
        v["lang"] = o_lang
    elif o_dt and o_dt != XSD_STRING:
        v["datatype"] = o_dt
    return v


def format_rdfjson(triples: list[tuple]) -> str:
    """Term tuples → RDF/JSON text (deterministic key order)."""
    doc: dict[str, dict[str, list]] = {}
    for t in triples:
        s_kind, s_lex, p, o_kind, o_lex, o_dt, o_lang = t[:7]
        s = "_:" + s_lex if s_kind == KIND_BNODE else s_lex
        vals = doc.setdefault(s, {}).setdefault(p, [])
        v = _value_obj(o_kind, o_lex, o_dt, o_lang)
        if v not in vals:
            vals.append(v)
    return json.dumps(doc, sort_keys=True, indent=1)
