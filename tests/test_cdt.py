"""CDT composite literals (fork feature: cdt:List / cdt:Map)."""

import pytest

from jena_ray.functions.registry import DatatypeRegistry
from jena_ray.model import KIND_IRI, KIND_LITERAL, XSD_NS, RDFParseError
from jena_ray.rdf.cdt import (
    CDT_LIST,
    CDT_MAP,
    canonical_cdt,
    cdt_concat,
    cdt_get,
    cdt_size,
    format_cdt_list,
    parse_cdt_list,
    parse_cdt_map,
    register,
)


def test_parse_list():
    out = parse_cdt_list("[1, 'hello', <http://e/a>, [2, 3.5], true, null]")
    assert out[0] == (KIND_LITERAL, "1", XSD_NS + "integer", "")
    assert out[1] == (KIND_LITERAL, "hello", XSD_NS + "string", "")
    assert out[2] == (KIND_IRI, "http://e/a", "", "")
    assert out[3][0] == (KIND_LITERAL, "2", XSD_NS + "integer", "")
    assert out[4] == (KIND_LITERAL, "true", XSD_NS + "boolean", "")
    assert out[5] is None


def test_parse_map():
    out = parse_cdt_map("{'k': 1, <http://e/p>: 'v'}")
    assert out[(KIND_LITERAL, "k", XSD_NS + "string", "")] == (
        KIND_LITERAL, "1", XSD_NS + "integer", "")
    assert out[(KIND_IRI, "http://e/p", "", "")] == (
        KIND_LITERAL, "v", XSD_NS + "string", "")


def test_empty_and_errors():
    assert parse_cdt_list("[]") == []
    assert parse_cdt_map("{}") == {}
    for bad in ["[1", "[1,]", "{1}", "{[1]: 2}", "[1] x"]:
        with pytest.raises(RDFParseError):
            (parse_cdt_map if bad.startswith("{") else parse_cdt_list)(bad)


def test_canonical_roundtrip():
    lex = "[ 1 ,'a'@EN,  <http://e/x> ]"
    canon = canonical_cdt(lex, CDT_LIST)
    assert canon == '[1, "a"@EN, <http://e/x>]'
    assert canonical_cdt(canon, CDT_LIST) == canon  # idempotent
    # map entries get a stable order
    m1 = canonical_cdt("{'b': 2, 'a': 1}", CDT_MAP)
    m2 = canonical_cdt("{'a': 1, 'b': 2}", CDT_MAP)
    assert m1 == m2 == '{"a": 1, "b": 2}'


def test_concat_identity():
    # mirrors SPARQL-CDTs concat tests: concat(x, []) == x
    one = "[1]"
    assert cdt_concat(one, "[]") == canonical_cdt(one, CDT_LIST)
    assert cdt_concat("[]", "[]") == "[]"
    assert cdt_concat("[1]", "[2, 3]") == "[1, 2, 3]"


def test_size_get():
    assert cdt_size("[1, 2, 3]") == 3
    assert cdt_size("{'a': 1}", CDT_MAP) == 1
    assert cdt_get("[10, 20]", 1) == (KIND_LITERAL, "10", XSD_NS + "integer", "")
    with pytest.raises(RDFParseError):
        cdt_get("[10]", 2)
    key = (KIND_LITERAL, "a", XSD_NS + "string", "")
    assert cdt_get("{'a': 5}", key, CDT_MAP) == (
        KIND_LITERAL, "5", XSD_NS + "integer", "")


def test_registry_integration():
    reg = DatatypeRegistry()
    register(reg)
    assert CDT_LIST in reg and CDT_MAP in reg
    e = reg.get(CDT_LIST)
    assert e.value_key("[ 1 ]") == e.value_key("[1]")  # value-space equality


@pytest.mark.usefixtures("ray_session")
def test_cdt_canonicalized_in_pipeline():
    import pyarrow as pa
    import ray.data as rd

    from jena_ray.model import TRIPLE_SCHEMA
    from jena_ray.stages.canonicalize import canonicalize_batch

    batch = pa.Table.from_arrays(
        [pa.array([0], pa.int8()),
         pa.array(["http://e/s"], pa.large_string()),
         pa.array(["http://e/p"], pa.large_string()),
         pa.array([2], pa.int8()),
         pa.array(["[ 1 ,'a' ]"], pa.large_string()),
         pa.array([CDT_LIST], pa.large_string()),
         pa.array([""], pa.large_string()),
         pa.array([""], pa.large_string()),
         pa.array(["d"], pa.large_string())],
        schema=TRIPLE_SCHEMA,
    )
    out = rd.from_arrow(batch).map_batches(
        canonicalize_batch, batch_format="pyarrow"
    ).take_all()
    assert out[0]["o_lex"] == '[1, "a"]'
