"""RDF-Patch application + full-text query surface."""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_apply_patch_add_delete():
    import ray.data as rd

    from jena_ray.model import TRIPLE_SCHEMA
    from jena_ray.state.patch import apply_patch, parse_patch
    import pyarrow as pa

    base = pa.Table.from_arrays(
        [pa.array([0, 0], pa.int8()),
         pa.array(["http://e/s1", "http://e/s2"], pa.large_string()),
         pa.array(["http://e/p", "http://e/p"], pa.large_string()),
         pa.array([0, 0], pa.int8()),
         pa.array(["http://e/o1", "http://e/o2"], pa.large_string()),
         pa.array(["", ""], pa.large_string()),
         pa.array(["", ""], pa.large_string()),
         pa.array(["", ""], pa.large_string()),
         pa.array(["d0", "d0"], pa.large_string())],
        schema=TRIPLE_SCHEMA,
    )
    patch = """
TX .
A <http://e/s3> <http://e/p> "new" .
A <http://e/s1> <http://e/p> <http://e/o1> .
D <http://e/s2> <http://e/p> <http://e/o2> .
TC .
"""
    adds, deletes = parse_patch(patch)
    assert len(adds) == 2 and len(deletes) == 1

    out = apply_patch(rd.from_arrow(base), patch).take_all()
    triples = {(r["s_lex"], r["o_lex"]) for r in out}
    assert ("http://e/s3", "new") in triples          # added
    assert ("http://e/s2", "http://e/o2") not in triples  # deleted
    assert ("http://e/s1", "http://e/o1") in triples  # kept, not duplicated
    assert len(out) == 2


@pytest.mark.usefixtures("ray_session")
def test_text_query_over_kg():
    from jena_ray.ops.textsearch import text_query
    from jena_ray.pipelines.kg import kg_triples
    from jena_ray.sources.docs import PRED

    import pyarrow.compute as pc

    triples = kg_triples(SF, linker_concurrency=2).materialize()
    # derive a query from the corpus itself (template draws shift as the
    # corpus evolves): grab one actual name literal and search for it
    name_rows = triples.map_batches(
        lambda b: b.filter(pc.equal(b["p"], PRED + "name")),
        batch_format="pyarrow",
    ).take(1)
    target = name_rows[0]["o_lex"]  # e.g. "Name 1234"
    hits = text_query(triples, target, property_iri=PRED + "name", limit=5)
    rows = hits.take_all()
    assert rows, "expected at least one hit"
    assert rows[0]["score"] >= rows[-1]["score"]
    num = target.split()[-1]
    assert any(num in r["literal"] for r in rows)


@pytest.mark.usefixtures("ray_session")
def test_patch_ops_apply_in_file_order():
    """'D t' then 'A t' leaves t PRESENT (sequential RDFChanges semantics);
    'A t' then 'D t' leaves it absent."""
    import ray.data as rd

    from jena_ray.state.patch import apply_patch, parse_patch

    t = '<http://ex/s> <http://ex/p> "v" .'
    adds, dels = parse_patch(f"D {t}\nA {t}\n")
    assert len(adds) == 1 and not dels
    adds2, dels2 = parse_patch(f"A {t}\nD {t}\n")
    assert len(dels2) == 1 and not adds2

    from jena_ray.model import TRIPLE_SCHEMA
    import pyarrow as pa

    empty = rd.from_arrow(
        pa.Table.from_arrays(
            [pa.array([], f.type) for f in TRIPLE_SCHEMA], schema=TRIPLE_SCHEMA
        )
    )
    out = apply_patch(empty, f"D {t}\nA {t}\n")
    assert out.count() == 1
    out2 = apply_patch(empty, f"A {t}\nD {t}\n")
    assert out2.count() == 0
