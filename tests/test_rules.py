"""Generic forward-rule engine tests (reasoner/rulesys/Rule.java syntax
subset + BasicForwardRuleInfGraph forward closure)."""

import pyarrow as pa
import pytest

from jena_ray.model import KIND_IRI, KIND_LITERAL, TRIPLE_SCHEMA
from jena_ray.stages.rules import Const, Var, forward_chain, parse_rules

E = "http://e/"
XSD = "http://www.w3.org/2001/XMLSchema#"
TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _triples(rows):
    cols = {name: [] for name in TRIPLE_SCHEMA.names}
    for (s, p, o_kind, o_lex, o_dt) in rows:
        cols["s_kind"].append(KIND_IRI)
        cols["s_lex"].append(s)
        cols["p"].append(p)
        cols["o_kind"].append(o_kind)
        cols["o_lex"].append(o_lex)
        cols["o_datatype"].append(o_dt)
        cols["o_lang"].append("")
        cols["g"].append("")
        cols["doc_id"].append("d0")
    return pa.Table.from_arrays(
        [pa.array(cols[f.name], f.type) for f in TRIPLE_SCHEMA],
        schema=TRIPLE_SCHEMA,
    )


def test_parse_rules_syntax():
    rules = parse_rules(
        """
        @prefix ex: <http://e/> .
        # comment
        // another comment
        [trans: (?a ex:partOf ?b), (?b ex:partOf ?c) -> (?a ex:partOf ?c)]
        [ (?p ex:age ?a) ge(?a 18)
          -> (?p ex:isAdult 'true'^^<http://www.w3.org/2001/XMLSchema#boolean>) ] .
        """
    )
    assert len(rules) == 2
    assert rules[0].name == "trans"
    assert rules[0].body[0] == (
        Var("a"), Const("iri", E + "partOf"), Var("b")
    )
    assert rules[1].guards[0].name == "ge"
    assert rules[1].head[0][2].dt == XSD + "boolean"


def test_parse_rules_rejects():
    with pytest.raises(ValueError):
        parse_rules("[ (?a ex:p ?b) -> (?a ex:q ?b) ]")  # unknown prefix
    with pytest.raises(ValueError):
        parse_rules("@prefix ex: <http://e/> .\n[ (?a ex:p ?b) ]")  # no arrow
    with pytest.raises(ValueError):
        parse_rules("@include <other.rules>")


@pytest.mark.usefixtures("ray_session")
def test_forward_chain_transitive():
    import ray.data as rd

    data = _triples([
        (E + "a", E + "partOf", KIND_IRI, E + "b", ""),
        (E + "b", E + "partOf", KIND_IRI, E + "c", ""),
        (E + "c", E + "partOf", KIND_IRI, E + "d", ""),
    ])
    out = forward_chain(
        rd.from_arrow(data),
        "@prefix ex: <http://e/> .\n"
        "[trans: (?a ex:partOf ?b) (?b ex:partOf ?c) -> (?a ex:partOf ?c)]",
    )
    rows = out.take_all()
    pairs = {(r["s_lex"], r["o_lex"]) for r in rows}
    want = {
        (E + x, E + y)
        for i, x in enumerate("abcd")
        for y in "abcd"[i + 1:]
    }
    assert pairs == want
    # derived triples carry rule provenance; input rows keep theirs
    by_pair = {(r["s_lex"], r["o_lex"]): r["doc_id"] for r in rows}
    assert by_pair[(E + "a", E + "b")] == "d0"
    assert by_pair[(E + "a", E + "d")] == "rule:trans"


@pytest.mark.usefixtures("ray_session")
def test_forward_chain_guard_and_literal_head():
    import ray.data as rd

    data = _triples([
        (E + "p1", E + "age", KIND_LITERAL, "25", XSD + "integer"),
        (E + "p2", E + "age", KIND_LITERAL, "11", XSD + "integer"),
        (E + "p3", E + "age", KIND_LITERAL, "abc", XSD + "string"),
    ])
    out = forward_chain(
        rd.from_arrow(data),
        "@prefix ex: <http://e/> .\n"
        "[adult: (?p ex:age ?a) ge(?a 18) -> "
        "(?p ex:isAdult 'true'^^<http://www.w3.org/2001/XMLSchema#boolean>)]",
    )
    adults = [
        r for r in out.take_all() if r["p"] == E + "isAdult"
    ]
    assert {r["s_lex"] for r in adults} == {E + "p1"}
    assert adults[0]["o_kind"] == KIND_LITERAL
    assert adults[0]["o_datatype"] == XSD + "boolean"


@pytest.mark.usefixtures("ray_session")
def test_forward_chain_matches_rdfs_stage():
    """User-rule RDFS subclass closure == the built-in rdfs9/rdfs11
    kernel on the same input (cross-validation of the two engines)."""
    import ray.data as rd

    RDFS = "http://www.w3.org/2000/01/rdf-schema#"
    data = _triples([
        (E + "C1", RDFS + "subClassOf", KIND_IRI, E + "C2", ""),
        (E + "C2", RDFS + "subClassOf", KIND_IRI, E + "C3", ""),
        (E + "x", TYPE, KIND_IRI, E + "C1", ""),
    ])
    rules = (
        "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
        "@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .\n"
        "[rdfs11: (?a rdfs:subClassOf ?b) (?b rdfs:subClassOf ?c)"
        " -> (?a rdfs:subClassOf ?c)]\n"
        "[rdfs9: (?s rdfs:subClassOf ?c) (?x rdf:type ?s) -> (?x rdf:type ?c)]"
    )
    out = forward_chain(rd.from_arrow(data), rules)
    types = {
        r["o_lex"] for r in out.take_all()
        if r["p"] == TYPE and r["s_lex"] == E + "x"
    }
    assert types == {E + "C1", E + "C2", E + "C3"}


@pytest.mark.usefixtures("ray_session")
def test_forward_chain_round_cap_raises():
    import ray.data as rd

    data = _triples([
        (E + "a", E + "p", KIND_IRI, E + "b", ""),
        (E + "b", E + "p", KIND_IRI, E + "c", ""),
        (E + "c", E + "p", KIND_IRI, E + "d", ""),
        (E + "d", E + "p", KIND_IRI, E + "e", ""),
    ])
    with pytest.raises(RuntimeError, match="round cap"):
        forward_chain(
            rd.from_arrow(data),
            "@prefix ex: <http://e/> .\n"
            "[t: (?a ex:p ?b) (?b ex:p ?c) -> (?a ex:p ?c)]",
            max_rounds=1,
        )


@pytest.mark.usefixtures("ray_session")
def test_binder_builtins_numeric_and_string():
    """sum/product bind their last arg (integer-preserving); strConcat /
    uriConcat / makeSkolem produce derived terms (Sum.java family)."""
    import ray.data as rd

    data = _triples([
        (E + "a", E + "w", KIND_LITERAL, "3", XSD + "integer"),
        (E + "a", E + "h", KIND_LITERAL, "4", XSD + "integer"),
    ])
    rules = """
    @prefix ex: <http://e/> .
    [area: (?x ex:w ?w) (?x ex:h ?h) product(?w ?h ?a) -> (?x ex:area ?a)]
    [lbl: (?x ex:w ?w) strConcat("w=" ?w ?s) -> (?x ex:label ?s)]
    [sk: (?x ex:w ?w) makeSkolem(?n ?x ?w) -> (?x ex:node ?n)]
    """
    out = forward_chain(rd.from_arrow(data), rules)
    rows = {(r["p"], r["o_lex"]) for r in out.take_all()
            if r["s_lex"] == E + "a"}
    assert (E + "area", "12") in rows
    assert (E + "label", "w=3") in rows
    skolems = [o for p, o in rows if p == E + "node"]
    assert len(skolems) == 1 and skolems[0].startswith("urn:skolem:")
    # derived area is integer-typed (both operands integer lexicals)
    area = [r for r in out.take_all() if r["p"] == E + "area"]
    assert area[0]["o_datatype"] == XSD + "integer"


@pytest.mark.usefixtures("ray_session")
def test_kind_filters_and_regex():
    import ray.data as rd

    data = _triples([
        (E + "a", E + "v", KIND_LITERAL, "hello", ""),
        (E + "b", E + "v", KIND_IRI, E + "thing", ""),
    ])
    rules = """
    @prefix ex: <http://e/> .
    [l: (?x ex:v ?v) isLiteral(?v) regex(?v "^h") -> (?x ex:lit "y")]
    [u: (?x ex:v ?v) isURI(?v) -> (?x ex:uri "y")]
    """
    out = forward_chain(rd.from_arrow(data), rules)
    got = {(r["s_lex"], r["p"]) for r in out.take_all()
           if r["p"] in (E + "lit", E + "uri")}
    assert got == {(E + "a", E + "lit"), (E + "b", E + "uri")}


@pytest.mark.usefixtures("ray_session")
def test_novalue_negation_as_failure():
    """noValue guards derive defaults only where the graph lacks the
    triple (NoValue.java) — and the fixpoint stays stable because the
    derived triple satisfies the guard in the next round."""
    import ray.data as rd

    data = _triples([
        (E + "a", TYPE, KIND_IRI, E + "Person", ""),
        (E + "b", TYPE, KIND_IRI, E + "Person", ""),
        (E + "a", E + "status", KIND_LITERAL, "vip", ""),
    ])
    rules = """
    @prefix ex: <http://e/> .
    @prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
    [d: (?x rdf:type ex:Person) noValue(?x ex:status "vip")
        -> (?x ex:status "default")]
    """
    out = forward_chain(rd.from_arrow(data), rules)
    status = {(r["s_lex"], r["o_lex"]) for r in out.take_all()
              if r["p"] == E + "status"}
    assert status == {(E + "a", "vip"), (E + "b", "default")}


def test_backward_rule_forward_compiles():
    """`head <- body` parses and derives the same facts as its forward
    twin (pure-Datalog forward compilation; LPBackwardRuleReasoner)."""
    bwd = parse_rules(
        "[r: (?a <uncle> ?c) <- (?a <parent> ?b) (?b <brother> ?c)]")
    fwd = parse_rules(
        "[r: (?a <parent> ?b) (?b <brother> ?c) -> (?a <uncle> ?c)]")
    assert bwd == fwd


def test_backward_rule_with_guard():
    rules = parse_rules(
        "[r: (?a <big> 'y') <- (?a <size> ?s) ge(?s 10)]")
    (r,) = rules
    assert [g.name for g in r.guards] == ["ge"]
    assert len(r.body) == 1 and len(r.head) == 1


def test_backward_rule_head_builtin_rejected():
    import pytest

    with pytest.raises(ValueError, match="HEAD"):
        parse_rules("[r: (?a <p> ?b) ge(?b 1) <- (?a <q> ?b)]")


def test_parse_functor_terms():
    rules = parse_rules(
        "@prefix ex: <http://e/> .\n"
        "[r: (?c ex:equiv all(?p, ?d)) -> (?c ex:onProp ?p)]"
    )
    # body functor compiles to a fresh var + prepended destructure guard
    from jena_ray.stages.rules import Destructure, Functor

    r = rules[0]
    assert isinstance(r.body[0][2], Var)
    assert isinstance(r.guards[0], Destructure)
    assert r.guards[0].functor == Functor("all", (Var("p"), Var("d")))
    # head functors stay in place
    rules2 = parse_rules(
        "@prefix ex: <http://e/> .\n"
        "[r: (?c ex:p ?d) -> (?c ex:equiv all(ex:q, ?d))]"
    )
    assert isinstance(rules2[0].head[0][2], Functor)


def test_parse_functor_rejects():
    with pytest.raises(ValueError):  # nesting (Functor.java:38)
        parse_rules("@prefix ex: <http://e/> .\n"
                    "[r: (?c ex:p all(some(?x), ?d)) -> (?c ex:q ?d)]")
    with pytest.raises(ValueError):  # subject position
        parse_rules("@prefix ex: <http://e/> .\n"
                    "[r: (all(?p) ex:p ?d) -> (?d ex:q ?p)]")
    with pytest.raises(ValueError):  # functor arg to a builtin
        parse_rules("@prefix ex: <http://e/> .\n"
                    "[r: (?c ex:p ?d) equal(?d all(?x)) -> (?c ex:q ?d)]")


@pytest.mark.usefixtures("ray_session")
def test_functor_head_then_destructure():
    """Head functor built in round 1 is destructured by a second rule in
    round 2 (the owl-fb 'cache matched subgraphs' idiom,
    Functor.java:40-44) — exercises the semi-naive loop with functor
    values in the delta."""
    import ray.data as rd

    data = _triples([
        (E + "C", E + "restrict", KIND_IRI, E + "P", ""),
        (E + "C", E + "restrictTo", KIND_IRI, E + "D", ""),
        (E + "x", TYPE, KIND_IRI, E + "C", ""),
    ])
    out = forward_chain(
        rd.from_arrow(data),
        "@prefix ex: <http://e/> .\n"
        "@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .\n"
        "[mk: (?c ex:restrict ?p) (?c ex:restrictTo ?d)"
        "  -> (?c ex:all all(?p, ?d))]\n"
        "[use: (?c ex:all all(?p, ?d)) (?x rdf:type ?c)"
        "  -> (?x ?p ?d)]",
    )
    rows = out.take_all()
    derived = {(r["s_lex"], r["p"], r["o_lex"]) for r in rows}
    assert (E + "x", E + "P", E + "D") in derived
    # the intermediate functor literal exists with the sentinel datatype
    from jena_ray.stages.rules import FUNCTOR_DT

    fns = [r for r in rows if r["o_datatype"] == FUNCTOR_DT]
    assert len(fns) == 1 and fns[0]["s_lex"] == E + "C"
    assert fns[0]["o_kind"] == KIND_LITERAL


@pytest.mark.usefixtures("ray_session")
def test_functor_const_args_and_repeated_var():
    import ray.data as rd

    data = _triples([
        (E + "a", E + "p", KIND_IRI, E + "a", ""),
        (E + "b", E + "p", KIND_IRI, E + "c", ""),
    ])
    out = forward_chain(
        rd.from_arrow(data),
        "@prefix ex: <http://e/> .\n"
        "[mk: (?s ex:p ?o) -> (?s ex:f pair(?s, ?o, 'tag'))]\n"
        # repeated var ?x: only fires when both functor args are equal
        "[same: (?s ex:f pair(?x, ?x, 'tag')) -> (?x ex:selfLoop 'y')]\n"
        # constant mismatch: never fires
        "[no: (?s ex:f pair(?x, ?y, 'other')) -> (?x ex:never 'y')]",
    )
    rows = out.take_all()
    self_loops = {r["s_lex"] for r in rows if r["p"] == E + "selfLoop"}
    assert self_loops == {E + "a"}
    assert not any(r["p"] == E + "never" for r in rows)


@pytest.mark.usefixtures("ray_session")
def test_functor_literal_args_roundtrip():
    """Literal functor args keep their datatype through the
    encode/destructure round trip."""
    import ray.data as rd

    data = _triples([
        (E + "a", E + "age", KIND_LITERAL, "41", XSD + "integer"),
    ])
    out = forward_chain(
        rd.from_arrow(data),
        "@prefix ex: <http://e/> .\n"
        "[mk: (?s ex:age ?a) -> (?s ex:cache info(?a))]\n"
        "[use: (?s ex:cache info(?v)) ge(?v 18) -> (?s ex:adult ?v)]",
    )
    adults = [r for r in out.take_all() if r["p"] == E + "adult"]
    assert len(adults) == 1
    assert adults[0]["o_lex"] == "41"
    assert adults[0]["o_datatype"] == XSD + "integer"
    assert adults[0]["o_kind"] == KIND_LITERAL
