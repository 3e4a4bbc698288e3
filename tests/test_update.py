"""SPARQL 1.1 Update subset (ops/sparql.sparql_update; reference:
jena-arq modify/UpdateEngineWorker.java, UpdateAction.java)."""

import pyarrow as pa
import pytest

from jena_ray.model import KIND_IRI, KIND_LITERAL, TRIPLE_SCHEMA
from jena_ray.ops.sparql import sparql_update
from jena_ray.model import RDFParseError

EX = "http://ex/"


def _store(rows):
    import ray.data as rd

    cols = {n: [] for n in TRIPLE_SCHEMA.names}
    for (s, p, o, g) in rows:
        o_is_iri = o.startswith("http://")
        cols["s_kind"].append(KIND_IRI)
        cols["s_lex"].append(s)
        cols["p"].append(p)
        cols["o_kind"].append(KIND_IRI if o_is_iri else KIND_LITERAL)
        cols["o_lex"].append(o)
        cols["o_datatype"].append(
            "" if o_is_iri
            else "http://www.w3.org/2001/XMLSchema#integer" if o.isdigit()
            else "http://www.w3.org/2001/XMLSchema#string")
        cols["o_lang"].append("")
        cols["g"].append(g)
        cols["doc_id"].append("d0")
    return rd.from_arrow(pa.Table.from_arrays(
        [pa.array(cols[f.name], f.type) for f in TRIPLE_SCHEMA],
        schema=TRIPLE_SCHEMA,
    ))


def _spo(ds):
    return {(r["s_lex"], r["p"], r["o_lex"]) for r in ds.take_all()}


BASE = [
    (EX + "a", EX + "knows", EX + "b", ""),
    (EX + "b", EX + "knows", EX + "c", ""),
    (EX + "a", EX + "age", "42", ""),
    (EX + "n", EX + "p", "v", EX + "g1"),
]


@pytest.mark.usefixtures("ray_session")
def test_insert_data_is_set_union():
    out = sparql_update(_store(BASE), """
    PREFIX ex: <http://ex/>
    INSERT DATA { ex:c ex:knows ex:a . ex:a ex:knows ex:b }
    """)
    spo = _spo(out)
    assert (EX + "c", EX + "knows", EX + "a") in spo
    # re-inserting an existing triple keeps ONE copy (set semantics)
    assert out.count() == len(BASE) + 1


@pytest.mark.usefixtures("ray_session")
def test_delete_data_removes_all_copies():
    dup = BASE + [(EX + "a", EX + "knows", EX + "b", "")]
    out = sparql_update(_store(dup), """
    PREFIX ex: <http://ex/>
    DELETE DATA { ex:a ex:knows ex:b }
    """)
    spo = _spo(out)
    assert (EX + "a", EX + "knows", EX + "b") not in spo
    assert out.count() == len(BASE) - 1


@pytest.mark.usefixtures("ray_session")
def test_delete_insert_where():
    out = sparql_update(_store(BASE), """
    PREFIX ex: <http://ex/>
    DELETE { ?x ex:knows ?y } INSERT { ?y ex:knownBy ?x }
    WHERE { ?x ex:knows ?y }
    """)
    spo = _spo(out)
    assert (EX + "b", EX + "knownBy", EX + "a") in spo
    assert (EX + "c", EX + "knownBy", EX + "b") in spo
    assert not any(p == EX + "knows" for _, p, _ in spo)
    assert (EX + "a", EX + "age", "42") in spo


@pytest.mark.usefixtures("ray_session")
def test_delete_where_shorthand_and_sequence():
    out = sparql_update(_store(BASE), """
    PREFIX ex: <http://ex/>
    DELETE WHERE { ?x ex:age ?v } ;
    INSERT DATA { ex:a ex:age "43" }
    """)
    spo = _spo(out)
    assert (EX + "a", EX + "age", "42") not in spo
    assert (EX + "a", EX + "age", "43") in spo


@pytest.mark.usefixtures("ray_session")
def test_clear_variants():
    assert sparql_update(_store(BASE), "CLEAR ALL").count() == 0
    named_only = sparql_update(_store(BASE), "CLEAR DEFAULT")
    assert _spo(named_only) == {(EX + "n", EX + "p", "v")}
    no_g1 = sparql_update(_store(BASE), "CLEAR GRAPH <http://ex/g1>")
    assert no_g1.count() == len(BASE) - 1


@pytest.mark.usefixtures("ray_session")
def test_insert_where_filter():
    out = sparql_update(_store(BASE), """
    PREFIX ex: <http://ex/>
    INSERT { ?x ex:adult "true" } WHERE { ?x ex:age ?v . FILTER(?v > 18) }
    """)
    assert (EX + "a", EX + "adult", "true") in _spo(out)


def test_data_rejects_variables():
    with pytest.raises(RDFParseError, match="ground"):
        from jena_ray.ops.sparql import _Parser
        _Parser("INSERT DATA { ?x <http://ex/p> <http://ex/o> }").parse_update()
