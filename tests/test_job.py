"""The ``python -m jena_ray`` job entrypoint (the ``ray job submit``
front door — jena-cmds analog): kg subcommand (resumable flagship +
metrics), query subcommand (SELECT/ASK/CONSTRUCT in every result
format), and the new string result writers."""

import json
import os
import subprocess
import sys

import pytest

from jena_ray.__main__ import main

SF = "/root/testdata/sf0.001"

NT = """\
<http://ex.org/a> <http://ex.org/p> "x" .
<http://ex.org/a> <http://ex.org/p> "has,comma" .
<http://ex.org/b> <http://ex.org/p> "y"@en .
<http://ex.org/b> <http://ex.org/q> "3"^^<http://www.w3.org/2001/XMLSchema#integer> .
"""


@pytest.fixture()
def nt_file(tmp_path):
    p = tmp_path / "data.nt"
    p.write_text(NT)
    return str(p)


@pytest.mark.usefixtures("ray_session")
def test_job_kg_runs_and_resumes(tmp_path):
    out = str(tmp_path / "kg")
    m = main(["kg", "--sf-dir", SF, "--out", out, "--shards", "2",
              "--metrics", str(tmp_path / "metrics.json")])
    assert m["triples"] > 0
    assert m["shards_computed"] == 2 and m["shards_skipped"] == 0
    assert os.path.isdir(os.path.join(out, "triples"))
    saved = json.load(open(tmp_path / "metrics.json"))
    assert saved["triples"] == m["triples"]
    # resubmit: phase-1 shards all skip via lineage manifests
    m2 = main(["kg", "--sf-dir", SF, "--out", out, "--shards", "2"])
    assert m2["shards_skipped"] == 2 and m2["shards_computed"] == 0
    assert m2["triples"] == m["triples"]


@pytest.mark.usefixtures("ray_session")
def test_job_query_select_csv(nt_file, tmp_path):
    out = str(tmp_path / "res.csv")
    m = main(["query", "--data", nt_file, "--out", out,
              "--query",
              "SELECT ?s ?o WHERE { ?s <http://ex.org/p> ?o } ORDER BY ?s ?o"])
    assert m["rows"] == 3 and m["format"] == "csv"
    # newline='' keeps the W3C-required CRLF visible to the assertions
    lines = open(out, newline="").read().split("\r\n")
    assert lines[0] == "s,o"
    assert lines[1] == 'http://ex.org/a,"has,comma"'
    assert lines[2] == "http://ex.org/a,x"
    assert lines[3] == "http://ex.org/b,y"


@pytest.mark.usefixtures("ray_session")
def test_job_query_select_json(nt_file, tmp_path):
    out = str(tmp_path / "res.json")
    main(["query", "--data", nt_file, "--out", out, "--format", "json",
          "--query",
          "SELECT ?o WHERE { <http://ex.org/b> ?p ?o } ORDER BY ?o"])
    doc = json.load(open(out))
    assert doc["head"]["vars"] == ["o"]
    terms = doc["results"]["bindings"]
    assert {"type": "literal", "value": "3",
            "datatype": "http://www.w3.org/2001/XMLSchema#integer"} in terms[0].values() or \
           {"type": "literal", "value": "3",
            "datatype": "http://www.w3.org/2001/XMLSchema#integer"} in terms[1].values()
    assert any(t["o"].get("xml:lang") == "en" for t in terms)


@pytest.mark.usefixtures("ray_session")
def test_job_query_ask_and_construct(nt_file, tmp_path, capsys):
    m = main(["query", "--data", nt_file,
              "--query", "ASK { <http://ex.org/a> ?p ?o }"])
    assert m["rows"] is None
    assert json.loads(capsys.readouterr().out)["boolean"] is True

    out = str(tmp_path / "out.nt")
    m = main(["query", "--data", nt_file, "--out", out,
              "--query",
              "CONSTRUCT { ?s <http://ex.org/r> ?o } "
              "WHERE { ?s <http://ex.org/q> ?o }"])
    assert m["format"] == "nt" and m["rows"] == 1
    text = open(out).read()
    assert "<http://ex.org/r>" in text and "XMLSchema#integer" in text

    # multi-triple CONSTRUCT: one N-Triples line per triple (the 1-triple
    # case can't see a missing line separator)
    out2 = str(tmp_path / "out2.nt")
    m = main(["query", "--data", nt_file, "--out", out2,
              "--query",
              "CONSTRUCT { ?s <http://ex.org/r> ?o } "
              "WHERE { ?s <http://ex.org/p> ?o }"])
    assert m["rows"] == 3
    from jena_ray.rdf.ntriples import parse_ntriples

    body = open(out2).read()
    assert body.endswith(" .\n") and len(body.rstrip("\n").split("\n")) == 3
    assert len(parse_ntriples(body)) == 3


@pytest.mark.usefixtures("ray_session")
def test_results_json_roundtrip(nt_file):
    """results_json output re-reads through the repo's own SRJ reader
    with identical terms."""
    import jena_ray
    from jena_ray.rdf.w3c_sparql import read_srj
    from jena_ray.stages.serialize import results_json

    res = jena_ray.query(
        nt_file, "SELECT ?s ?o WHERE { ?s <http://ex.org/p> ?o }")
    kind, vars_, sols = read_srj(results_json(res))
    assert kind == "rows" and vars_ == ["s", "o"]
    assert len(sols) == 3


def test_job_subprocess_owns_session(nt_file, tmp_path):
    """python -m jena_ray in a fresh process (the actual ray job submit
    shape) initialises and tears down its own Ray session."""
    out = str(tmp_path / "res.csv")
    env = dict(os.environ, RAY_ADDRESS="local")
    proc = subprocess.run(
        [sys.executable, "-m", "jena_ray", "query", "--data", nt_file,
         "--out", out,
         "--query", "SELECT ?s WHERE { ?s <http://ex.org/q> ?o }"],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    metrics = json.loads(proc.stdout.strip().splitlines()[-1])
    assert metrics["rows"] == 1
    assert open(out, newline="").read().startswith("s\r\n")


@pytest.mark.usefixtures("ray_session")
def test_job_riot_convert(nt_file, tmp_path):
    """riot subcommand: NT in → Turtle out (re-parses to the same
    graph) and NT round-trip."""
    out = str(tmp_path / "out.ttl")
    m = main(["riot", "--data", nt_file, "--out", out,
              "--syntax", "turtle"])
    assert m["triples"] == 4
    from jena_ray.rdf.turtle import parse_turtle

    assert len(parse_turtle(open(out).read())) == 4

    out_nt = str(tmp_path / "out.nt")
    m = main(["riot", "--data", nt_file, "--out", out_nt])
    from jena_ray.rdf.ntriples import parse_ntriples

    assert len(parse_ntriples(open(out_nt).read())) == 4


@pytest.mark.usefixtures("ray_session")
def test_job_validate_shacl(nt_file, tmp_path):
    shapes = tmp_path / "shapes.ttl"
    shapes.write_text("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
<http://ex.org/Shape> a sh:NodeShape ;
  sh:targetNode <http://ex.org/a>, <http://ex.org/b> ;
  sh:property [ sh:path <http://ex.org/q> ; sh:minCount 1 ] .
""")
    out = str(tmp_path / "report.json")
    m = main(["validate", "--data", nt_file, "--shacl", str(shapes),
              "--out", out])
    # <a> has no ex:q → one minCount violation; <b> conforms
    assert m["conforms"] is False and m["rows"] == 1
    doc = json.load(open(out))
    assert doc["violations"][0]["focus"] == "http://ex.org/a"


@pytest.mark.usefixtures("ray_session")
def test_job_load_builds_triple_table(nt_file, tmp_path):
    import ray.data as rd

    out = str(tmp_path / "table")
    m = main(["load", "--data", nt_file, "--out", out, "--buckets", "4"])
    assert m["triples"] == 4
    ds = rd.read_parquet(out)
    assert ds.count() == 4
    assert "bucket" in ds.schema().names
