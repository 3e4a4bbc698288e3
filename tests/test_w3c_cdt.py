"""SPARQL-CDTs function suites (the fork's composite-datatype tests,
jena-arq/testing/SPARQL-CDTs/ — list-functions + map-functions),
manifest-driven through the text front door, same harness shape as
tests/test_w3c_sparql.py.

Honest accounting: tests outside the engine's documented subset SKIP
with the parse/eval error; supported tests must produce the expected
result set. KNOWN_FAIL tracks wrong answers without hiding them."""

from __future__ import annotations

import os
import re

import pytest

from jena_ray.model import RDFParseError
from jena_ray.rdf.w3c_sparql import read_expected, read_sparql_manifest

ROOT = "/root/reference/jena-arq/testing/SPARQL-CDTs"

SUITES = ["list-functions", "map-functions", "fold", "unfold",
          "orderby", "bnodes"]

_ORDERBY_GAP = ("CDT ORDER BY (compareAlways sort semantics) not wired "
                "into the distributed term sort")
_BNODE_GAP = ("document-scoped bnode labels inside Turtle-sourced CDT "
              "literals out of subset")
KNOWN_FAIL: dict[str, str] = {
    **{f"order-list-{s}": _ORDERBY_GAP
       for s in ("03", "05", "06", "null-01", "null-02")},
    **{f"order-map-{s}": _ORDERBY_GAP
       for s in ("03", "06", "08", "10", "12", "13", "17",
                 "null-01", "null-02")},
    **{f"bnodes-turtle-{s}": _BNODE_GAP
       for s in ("15", "16", "17", "18", "19")},
    **{f"bnodes-turtle-sparql-{s}": _BNODE_GAP
       for s in ("01", "02", "03", "04")},
}


def _all_tests():
    out = []
    for suite in SUITES:
        path = os.path.join(ROOT, suite, "manifest.ttl")
        if not os.path.exists(path):
            continue
        for t in read_sparql_manifest(path):
            if t.kind == "eval" and t.result is not None:
                out.append((f"{suite}:{t.name}", t))
    return out


_TESTS = _all_tests()


def pytest_generate_tests(metafunc):
    if "cdt_eval" in metafunc.fixturenames:
        metafunc.parametrize(
            "cdt_eval", [t for _, t in _TESTS], ids=[i for i, _ in _TESTS]
        )


@pytest.mark.usefixtures("ray_session")
def test_w3c_cdt_eval(cdt_eval):
    import pyarrow as pa
    import ray.data as rd

    from jena_ray.model import TRIPLE_SCHEMA
    from jena_ray.ops.sparql import sparql_ask, sparql_select
    from jena_ray.rdf.w3c_sparql import solutions_match
    from jena_ray.sources.readers import lang_for_path, parse_rdf_text

    test = cdt_eval
    for key, reason in KNOWN_FAIL.items():
        if test.name == key:
            pytest.xfail(reason)
    qtext = open(test.query, encoding="utf-8").read()

    cols: dict[str, list] = {n: [] for n in TRIPLE_SCHEMA.names}
    from jena_ray.model import KIND_LITERAL, XSD_STRING

    for d in test.data:
        lang = lang_for_path(d) or "turtle"
        for (sk, sl, p, ok, ol, od, olang, _g) in parse_rdf_text(
                open(d, encoding="utf-8").read(), lang, base="file://" + d):
            if ok == KIND_LITERAL and not od and not olang:
                od = XSD_STRING
            for name, val in zip(TRIPLE_SCHEMA.names,
                                 (sk, sl, p, ok, ol, od, olang, "",
                                  os.path.basename(d))):
                cols[name].append(val)
    store = rd.from_arrow(pa.Table.from_arrays(
        [pa.array(cols[f.name], f.type) for f in TRIPLE_SCHEMA],
        schema=TRIPLE_SCHEMA))

    form = "select"
    m = re.search(r"\b(SELECT|ASK)\b", qtext, re.I)
    if m:
        form = m.group(1).lower()
    qbase = "file://" + test.query
    try:
        if form == "ask":
            got = sparql_ask(store, qtext, base=qbase)
            kind_exp = read_expected(test.result)
            assert kind_exp[0] == "ask"
            assert got == kind_exp[1], f"ASK: got {got}, want {kind_exp[1]}"
            return
        rows = sparql_select(store, qtext, base=qbase).take_all()
        got_solutions = []
        for r in rows:
            got_solutions.append({k: v for k, v in r.items()
                                  if v is not None and k != "__exists"})
        kind_exp = read_expected(test.result)
        assert kind_exp[0] == "rows"
        _, vars_, expected = kind_exp
        ok = solutions_match(expected, got_solutions, vars_)
        assert ok, (f"result mismatch: {len(expected)} expected vs "
                    f"{len(got_solutions)} got\nexpected={expected[:6]}\n"
                    f"got={got_solutions[:6]}")
    except RDFParseError as ex:
        pytest.skip(f"out of subset: {ex}")
    except NotImplementedError as ex:
        pytest.skip(f"out of subset: {ex}")
