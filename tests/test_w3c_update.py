"""W3C SPARQL 1.1 Update evaluation suites, manifest-driven, through
sparql_update (the reference's arq/junit/sparql/UpdateEvalTest.java
runner rebuilt over the Dataset-algebra update engine).

Each test builds a graph store from the manifest's ut:data /
ut:graphData inputs, runs the .ru request, and compares the resulting
store per graph against the golden graphs under bnode isomorphism.
Requests outside the engine's documented update subset SKIP with the
parse error shown."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from jena_ray.model import (
    KIND_BNODE,
    RDFParseError,
    TRIPLE_SCHEMA,
)
from jena_ray.rdf.w3c_sparql import read_sparql_manifest

ROOT = "/root/reference/jena-arq/testing/rdf-tests-cg/sparql/sparql11"

SUITES = [
    "basic-update",
    "delete-data",
    "delete-insert",
    "delete-where",
    "delete",
    "clear",
    "drop",
    "add",
    "copy",
    "move",
    "update-silent",
]

KNOWN_FAIL: dict[str, str] = {}


def _all_tests():
    out = []
    for suite in SUITES:
        path = os.path.join(ROOT, suite, "manifest.ttl")
        if not os.path.exists(path):
            continue
        for t in read_sparql_manifest(path):
            if t.kind == "update":
                out.append((f"{suite}:{t.name}", t))
    return out


_TESTS = _all_tests()


def pytest_generate_tests(metafunc):
    if "update_eval" in metafunc.fixturenames:
        metafunc.parametrize(
            "update_eval", [t for _, t in _TESTS],
            ids=[i for i, _ in _TESTS],
        )


def _parse_graph(path: str) -> list[tuple]:
    """One golden/input file → list of 8-tuples with file-scoped bnode
    labels (document-scoped labels, LabelToNode semantics)."""
    from jena_ray.sources.readers import lang_for_path, parse_rdf_text

    lang = lang_for_path(path) or "turtle"
    triples = parse_rdf_text(
        open(path, encoding="utf-8").read(), lang, base="file://" + path)
    scope = os.path.basename(path) + "#"
    out = []
    for (s_kind, s_lex, p, o_kind, o_lex, o_dt, o_lang, _g) in triples:
        if s_kind == KIND_BNODE:
            s_lex = scope + s_lex
        if o_kind == KIND_BNODE:
            o_lex = scope + o_lex
        out.append((s_kind, s_lex, p, o_kind, o_lex, o_dt, o_lang))
    return out


def _store_table(test) -> pa.Table:
    cols: dict[str, list] = {n: [] for n in TRIPLE_SCHEMA.names}

    def add(path, g):
        for (s_kind, s_lex, p, o_kind, o_lex, o_dt, o_lang) in \
                _parse_graph(path):
            cols["s_kind"].append(s_kind)
            cols["s_lex"].append(s_lex)
            cols["p"].append(p)
            cols["o_kind"].append(o_kind)
            cols["o_lex"].append(o_lex)
            cols["o_datatype"].append(o_dt)
            cols["o_lang"].append(o_lang)
            cols["g"].append(g)
            cols["doc_id"].append(os.path.basename(path))

    for d in test.data:
        add(d, "")
    for gd, label in test.graph_data_labeled:
        add(gd, label)
    return pa.Table.from_arrays(
        [pa.array(cols[f.name], f.type) for f in TRIPLE_SCHEMA],
        schema=TRIPLE_SCHEMA,
    )


@pytest.mark.usefixtures("ray_session")
def test_w3c_update_eval(update_eval):
    import ray.data as rd

    from jena_ray.ops.sparql import sparql_update
    from jena_ray.rdf.iso import graph_iso

    test = update_eval
    for key, reason in KNOWN_FAIL.items():
        if test.query.endswith(key) or test.name == key:
            pytest.xfail(reason)
    req = open(test.query, encoding="utf-8").read()
    store = rd.from_arrow(_store_table(test))
    try:
        out = sparql_update(store, req)
        rows = out.take_all()
    except RDFParseError as e:
        pytest.skip(f"out of subset: {e}")

    got_by_g: dict[str, list] = {}
    for r in rows:
        got_by_g.setdefault(r["g"], []).append(
            (r["s_kind"], r["s_lex"], r["p"], r["o_kind"], r["o_lex"],
             r["o_datatype"], r["o_lang"]))

    exp_by_g: dict[str, list] = {}
    for d in test.result_data:
        exp_by_g.setdefault("", []).extend(_parse_graph(d))
    for gd, label in test.result_graph_data:
        exp_by_g.setdefault(label, []).extend(_parse_graph(gd))

    # empty graphs don't exist in the quad store — drop empty expecteds
    exp_by_g = {g: ts for g, ts in exp_by_g.items() if ts}
    assert set(got_by_g) == set(exp_by_g), (
        f"graph sets differ: got {sorted(got_by_g)}, "
        f"want {sorted(exp_by_g)}"
    )
    for g, exp in exp_by_g.items():
        got = got_by_g[g]
        pad = lambda ts: [t + ("",) for t in ts]  # noqa: E731
        assert graph_iso(pad(got), pad(exp)), (
            f"graph <{g or 'default'}> mismatch: {len(got)} got vs "
            f"{len(exp)} expected\ngot={sorted(got)[:8]}\n"
            f"exp={sorted(exp)[:8]}"
        )
