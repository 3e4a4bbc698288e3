"""TriX reader + PageRank tests."""

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
