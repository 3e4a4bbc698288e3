"""W3C RDF test-suite manifest reader.

Python port of the reference's manifest-driven conformance runner
(jena-arq/src/test/java/org/apache/jena/riot/Scripts_RIOT_rdf_tests_std.java:40-80
→ arq/junit/manifest/Manifest.java). The manifest.ttl is itself Turtle, so
we bootstrap with our own parser.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from ..model import KIND_IRI, RDF_FIRST, RDF_NIL, RDF_REST, RDF_TYPE
from .turtle import parse_turtle

MF = "http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#"
RDFT = "http://www.w3.org/ns/rdftest#"

POSITIVE_SYNTAX = {
    RDFT + "TestTurtlePositiveSyntax",
    RDFT + "TestNTriplesPositiveSyntax",
    RDFT + "TestNQuadsPositiveSyntax",
    RDFT + "TestTrigPositiveSyntax",
}
NEGATIVE_SYNTAX = {
    RDFT + "TestTurtleNegativeSyntax",
    RDFT + "TestNTriplesNegativeSyntax",
    RDFT + "TestNQuadsNegativeSyntax",
    RDFT + "TestTrigNegativeSyntax",
}
EVAL = {RDFT + "TestTurtleEval", RDFT + "TestTrigEval", RDFT + "TestXMLEval"}
C14N = {RDFT + "TestNTriplesPositiveC14N", RDFT + "TestNQuadsPositiveC14N"}
NEGATIVE_SYNTAX.add(RDFT + "TestXMLNegativeSyntax")
NEGATIVE_EVAL = {RDFT + "TestTurtleNegativeEval", RDFT + "TestTrigNegativeEval"}


@dataclass
class W3CTest:
    name: str
    kind: str  # "positive" | "negative" | "eval" | "c14n" | "entail+" | "entail-" | ...
    action: str  # path to input file
    result: str | None  # path to golden for eval/entailment tests
    base_iri: str  # base IRI the test must be parsed with
    regime: str = ""  # entailment regime ("simple" | "RDF" | "RDFS" | ...)
    recognized: tuple = ()  # recognized datatype IRIs (D-entailment)


def read_manifest(manifest_path: str) -> list[W3CTest]:
    manifest_path = os.path.abspath(manifest_path)
    dir_path = os.path.dirname(manifest_path)
    base = "file://" + manifest_path
    text = open(manifest_path, encoding="utf-8").read()
    triples = parse_turtle(text, base=base)

    # index: (s_kind, s_lex) -> {p: [(o_kind, o_lex)]}
    idx: dict[tuple, dict[str, list[tuple]]] = {}
    for t in triples:
        idx.setdefault((t[0], t[1]), {}).setdefault(t[2], []).append((t[3], t[4]))

    def get1(node: tuple, p: str) -> tuple | None:
        v = idx.get(node, {}).get(p)
        return v[0] if v else None

    # the manifest root may be <> (resolves to the file IRI) or any named
    # subject typed mf:Manifest (the rdf12 suites use a prefixed name)
    root = (KIND_IRI, base)
    if MF + "entries" not in idx.get(root, {}):
        for node, props in idx.items():
            if any(
                o_lex == MF + "Manifest"
                for (_k, o_lex) in props.get(RDF_TYPE, [])
            ) and MF + "entries" in props:
                root = node
                break
    assumed = get1(root, MF + "assumedTestBase")
    test_base_root = assumed[1] if assumed else base.rsplit("/", 1)[0] + "/"

    entries_head = get1(root, MF + "entries")
    out: list[W3CTest] = []
    node = entries_head
    while node is not None and not (node[0] == KIND_IRI and node[1] == RDF_NIL):
        entry = get1(node, RDF_FIRST)
        node = get1(node, RDF_REST)
        if entry is None:
            break
        ttype = get1(entry, RDF_TYPE)
        action = get1(entry, MF + "action")
        result = get1(entry, MF + "result")
        if ttype is None or action is None:
            continue
        t = ttype[1]
        if t in POSITIVE_SYNTAX:
            kind = "positive"
        elif t in NEGATIVE_SYNTAX:
            kind = "negative"
        elif t in EVAL:
            kind = "eval"
        elif t in C14N:
            kind = "c14n"
        elif t == MF + "PositiveEntailmentTest":
            kind = "entail+"
        elif t == MF + "NegativeEntailmentTest":
            kind = "entail-"
        elif t in NEGATIVE_EVAL:
            kind = "negative-eval"
        else:
            kind = t
        manifest_dir_iri = base.rsplit("/", 1)[0] + "/"

        def rel_path(iri: str) -> str:
            # path relative to the manifest file (entries may live in
            # subdirectories, e.g. the RDF/XML suite) or to the assumed base
            if iri.startswith(manifest_dir_iri):
                return iri[len(manifest_dir_iri):]
            if iri.startswith(test_base_root):
                return iri[len(test_base_root):]
            return iri.rsplit("/", 1)[-1]

        act_file = rel_path(action[1])
        res_file = rel_path(result[1]) if result else None
        name = entry[1].rsplit("#", 1)[-1] or entry[1].rsplit("/", 1)[-1]
        regime_v = get1(entry, MF + "entailmentRegime")
        recognized: list[str] = []
        node2 = get1(entry, MF + "recognizedDatatypes")
        while node2 is not None and not (node2[0] == KIND_IRI and node2[1] == RDF_NIL):
            first = get1(node2, RDF_FIRST)
            if first is not None:
                recognized.append(first[1])
            node2 = get1(node2, RDF_REST)
        out.append(
            W3CTest(
                name=name,
                kind=kind,
                action=os.path.join(dir_path, *act_file.split("/")),
                result=os.path.join(dir_path, *res_file.split("/")) if res_file else None,
                base_iri=test_base_root + act_file,
                regime=regime_v[1] if regime_v else "",
                recognized=tuple(recognized),
            )
        )
    return out
