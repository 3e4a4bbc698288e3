"""RDFS streaming inference tests (rules rdfs2/3/5/7/9/11)."""

import pytest

from jena_ray.model import KIND_IRI, RDF_TYPE, TRIPLE_SCHEMA
from jena_ray.stages.rdfs import RDFS_DOMAIN, RDFS_RANGE, RDFS_SUBCLASSOF, RDFS_SUBPROPERTYOF, TBox, infer_batch

E = "http://e/"


def t(s, p, o):
    return (KIND_IRI, E + s, E + p if not p.startswith("http") else p,
            KIND_IRI, E + o, "", "", "")


def schema():
    return [
        t("Dog", RDFS_SUBCLASSOF.replace("http", "http"), "x")  # placeholder
    ]


def _mk(s, p, o):
    return (KIND_IRI, E + s, p, KIND_IRI, E + o, "", "", "")


def _schema_triples():
    return [
        _mk("Dog", RDFS_SUBCLASSOF, "Mammal"),
        _mk("Mammal", RDFS_SUBCLASSOF, "Animal"),
        _mk("hasPet", RDFS_SUBPROPERTYOF, "owns"),
        (KIND_IRI, E + "owns", RDFS_DOMAIN, KIND_IRI, E + "Person", "", "", ""),
        (KIND_IRI, E + "owns", RDFS_RANGE, KIND_IRI, E + "Thing", "", "", ""),
    ]


def _abox_table(rows):
    import pyarrow as pa

    cols = {name: [] for name in TRIPLE_SCHEMA.names}
    for (s_kind, s_lex, p, o_kind, o_lex, o_dt, o_lang, g) in rows:
        cols["s_kind"].append(s_kind)
        cols["s_lex"].append(s_lex)
        cols["p"].append(p)
        cols["o_kind"].append(o_kind)
        cols["o_lex"].append(o_lex)
        cols["o_datatype"].append(o_dt)
        cols["o_lang"].append(o_lang)
        cols["g"].append(g)
        cols["doc_id"].append("d0")
    import pyarrow as pa

    return pa.Table.from_arrays(
        [pa.array(cols[f.name], f.type) for f in TRIPLE_SCHEMA], schema=TRIPLE_SCHEMA
    )


def _triples_of(tbl):
    return set(
        zip(*[tbl.column(c).to_pylist() for c in
              ["s_lex", "p", "o_lex"]])
    )


def test_subclass_closure():
    tbox = TBox(_schema_triples())
    assert tbox.sub_class[E + "Dog"] == {E + "Mammal", E + "Animal"}


def test_rdfs9_type_propagation():
    tbox = TBox(_schema_triples())
    abox = _abox_table([_mk("rex", RDF_TYPE, "Dog")])
    out = _triples_of(infer_batch(abox, tbox))
    assert (E + "rex", RDF_TYPE, E + "Mammal") in out
    assert (E + "rex", RDF_TYPE, E + "Animal") in out


def test_rdfs7_subproperty_and_domain_range():
    tbox = TBox(_schema_triples())
    abox = _abox_table([_mk("alice", E + "hasPet", "rex")])
    out = _triples_of(infer_batch(abox, tbox))
    assert (E + "alice", E + "owns", E + "rex") in out         # rdfs7
    assert (E + "alice", RDF_TYPE, E + "Person") in out        # rdfs2 via super-prop
    assert (E + "rex", RDF_TYPE, E + "Thing") in out           # rdfs3 via super-prop


def test_literal_object_gets_no_range_type():
    from jena_ray.model import KIND_LITERAL, XSD_STRING

    tbox = TBox(_schema_triples())
    abox = _abox_table(
        [(KIND_IRI, E + "alice", E + "owns", KIND_LITERAL, "rex", XSD_STRING, "", "")]
    )
    out = _triples_of(infer_batch(abox, tbox))
    assert ("rex", RDF_TYPE, E + "Thing") not in out


@pytest.mark.usefixtures("ray_session")
def test_rdfs_inference_distributed():
    import ray.data as rd

    from jena_ray.stages.dedup import exact_dedup
    from jena_ray.stages.rdfs import rdfs_inference

    abox = _abox_table(
        [_mk("rex", RDF_TYPE, "Dog"), _mk("alice", E + "hasPet", "rex")] * 3
    )
    ds = rdfs_inference(rd.from_arrow(abox), _schema_triples())
    out = exact_dedup(ds)
    rows = out.take_all()
    triples = {(r["s_lex"], r["p"], r["o_lex"]) for r in rows}
    assert (E + "rex", RDF_TYPE, E + "Animal") in triples
    assert len(rows) == len(triples)  # deduped
