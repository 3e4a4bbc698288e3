"""TriX reader + PageRank tests."""

import os

import pytest

from jena_ray.model import KIND_BNODE, KIND_LITERAL, RDFParseError
from jena_ray.rdf.trix import parse_trix

TRIX = """<?xml version="1.0"?>
<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/">
  <graph>
    <triple>
      <uri>http://e/s</uri>
      <uri>http://e/p</uri>
      <plainLiteral xml:lang="en">hello</plainLiteral>
    </triple>
    <triple>
      <id>b0</id>
      <uri>http://e/p</uri>
      <typedLiteral datatype="http://www.w3.org/2001/XMLSchema#int">5</typedLiteral>
    </triple>
  </graph>
  <graph>
    <uri>http://e/g</uri>
    <triple>
      <uri>http://e/s2</uri><uri>http://e/p</uri><uri>http://e/o</uri>
    </triple>
  </graph>
</TriX>
"""


def test_parse_trix():
    out = parse_trix(TRIX)
    assert len(out) == 3
    assert out[0][4:7] == ("hello", "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString", "en")
    assert out[1][0] == KIND_BNODE
    assert out[2][7] == "http://e/g"


def test_trix_errors():
    with pytest.raises(RDFParseError):
        parse_trix("<TriX xmlns='http://www.w3.org/2004/03/trix/trix-1/'><graph><triple><uri>http://p</uri></triple></graph></TriX>")
    with pytest.raises(RDFParseError):
        parse_trix("not xml")
    assert parse_trix("not xml", on_error="skip") == []


_TRIX_REF = "/root/reference/jena-arq/testing/RIOT/Lang/TriX"
# TestTriXBad.java runs bad-01..09 (bad-00/bad-10 are stray files
# byte-identical to GOOD fixtures); TestTriXReader comments out ex-2
# (contains the unsupported <integer> element)
_TRIX_BAD = sorted(
    [f"trix-bad-{i:02d}.trix" for i in range(1, 10)]
    + [f"trix-star-bad-triple-term-{i}.trix" for i in range(1, 5)])
_TRIX_GOOD = sorted(
    os.path.basename(f)
    for f in __import__("glob").glob(_TRIX_REF + "/*.trix")
    if os.path.basename(f) not in set(_TRIX_BAD)
    and os.path.basename(f) not in (
        "trix-bad-00.trix", "trix-bad-10.trix", "trix-ex-2.trix")
) if os.path.isdir(_TRIX_REF) else []


@pytest.mark.parametrize("name", _TRIX_GOOD)
def test_trix_reference_corpus_good(name):
    """Reference RIOT/Lang/TriX corpus: parse + graph-iso against the
    golden .nq when one exists (qnames, namespaces, id-named graphs,
    raw XMLLiteral lexicals, RDF 1.2 nested triple terms)."""
    from jena_ray.rdf.iso import graph_iso
    from jena_ray.rdf.ntriples import parse_ntriples

    got = parse_trix(open(f"{_TRIX_REF}/{name}").read())
    nq = f"{_TRIX_REF}/{name[:-5]}.nq"
    if os.path.exists(nq):
        want = list(parse_ntriples(open(nq).read(), quads=True))
        assert graph_iso(got, want), name


@pytest.mark.parametrize("name", _TRIX_BAD)
def test_trix_reference_corpus_bad(name):
    with pytest.raises(RDFParseError):
        parse_trix(open(f"{_TRIX_REF}/{name}").read())


@pytest.mark.usefixtures("ray_session")
def test_pagerank_star_graph():
    import ray.data as rd

    from jena_ray.ops.graphalgo import pagerank

    # star: a,b,c,d all point to hub; hub points to a
    edges = rd.from_items(
        [{"src": s, "dst": "hub"} for s in ["a", "b", "c", "d"]]
        + [{"src": "hub", "dst": "a"}]
    )
    ranks = {r["node"]: r["rank"] for r in pagerank(edges, iterations=30).take_all()}
    assert set(ranks) == {"a", "b", "c", "d", "hub"}
    # analytic fixpoint of this graph (a<->hub two-cycle, b/c/d leaves):
    # hub = 0.132/0.2775 = 0.47568, a = 0.03 + 0.85*hub = 0.43433
    assert ranks["hub"] == pytest.approx(0.47568, abs=0.01)
    assert ranks["a"] == pytest.approx(0.43433, abs=0.01)
    assert ranks["b"] == pytest.approx(0.03, abs=1e-6)
    assert ranks["b"] == pytest.approx(ranks["c"])


@pytest.mark.usefixtures("ray_session")
def test_pagerank_over_kg_edges():
    from jena_ray.ops.graphalgo import entity_edges, pagerank
    from jena_ray.pipelines.kg import kg_triples

    edges = entity_edges(kg_triples("/root/testdata/sf0.001", linker_concurrency=2))
    ranks = pagerank(edges, iterations=2, num_partitions=4)
    rows = ranks.take(5)
    assert rows and all(r["rank"] > 0 for r in rows)


@pytest.mark.usefixtures("ray_session")
def test_kcore_peels_to_the_core():
    import ray.data as rd

    from jena_ray.ops.graphalgo import kcore

    # K4 core {a,b,c,d} + a pendant chain e-f hanging off a
    edges = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
             ("b", "d"), ("c", "d"), ("a", "e"), ("e", "f")]
    ds = rd.from_items([{"src": s, "dst": d} for s, d in edges])
    out = {r["node"]: r["degree"] for r in kcore(ds, k=3).take_all()}
    assert set(out) == {"a", "b", "c", "d"}
    assert all(v == 3 for v in out.values())
    # k=4: the K4 has degree 3 each → empty core
    assert kcore(ds, k=4).count() == 0


@pytest.mark.usefixtures("ray_session")
def test_label_propagation_two_communities():
    import ray.data as rd

    from jena_ray.ops.graphalgo import label_propagation

    # two triangles joined by one weak bridge
    edges = [("a", "b"), ("b", "c"), ("c", "a"),
             ("x", "y"), ("y", "z"), ("z", "x"),
             ("c", "x")]
    ds = rd.from_items([{"src": s, "dst": d} for s, d in edges])
    out = {r["node"]: r["label"] for r in
           label_propagation(ds, iterations=5).take_all()}
    assert len(out) == 6
    left = {out[n] for n in "abc"}
    right = {out[n] for n in "xyz"}
    # each triangle converges to one label
    assert len(left) == 1 and len(right) == 1
