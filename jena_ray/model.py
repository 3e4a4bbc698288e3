"""RDF term / triple data model on Arrow.

Mirrors the reference's ``Node`` hierarchy
(jena-core/src/main/java/org/apache/jena/graph/Node.java:38-47) flattened
to leaf columns per SURVEY.md §1.5: a triple row is

    s_kind:int8  s_lex:str        subject  (IRI | BNODE)
    p:str                         predicate (always IRI)
    o_kind:int8  o_lex:str  o_datatype:str  o_lang:str
    g:str                         graph name ("" = default graph)
    doc_id:str                    provenance (document of origin)

Positional constraints (ParserProfileStd.checkTriple,
jena-arq/.../riot/system/ParserProfileStd.java:150-177): subject in
{IRI, BNODE}; predicate IRI; object in {IRI, BNODE, LITERAL, TRIPLE_TERM}.

Literals: ``o_lex`` is the lexical form, ``o_datatype`` the datatype IRI
("" means xsd:string for plain literals / rdf:langString when o_lang != ""),
``o_lang`` the language tag ("" when none). This matches Jena's
``LiteralLabel`` (lexical form + datatype + lang,
jena-core/.../graph/impl/LiteralLabel.java).
"""

from __future__ import annotations

import pyarrow as pa

# Term kinds (Node subtypes, Node.java:38-47)
KIND_IRI = 0
KIND_BNODE = 1
KIND_LITERAL = 2
KIND_TRIPLE_TERM = 3

# Well-known IRIs
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"
OWL_NS = "http://www.w3.org/2002/07/owl#"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"

RDF_TYPE = RDF_NS + "type"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"
RDF_LANGSTRING = RDF_NS + "langString"
XSD_STRING = XSD_NS + "string"
XSD_INTEGER = XSD_NS + "integer"
XSD_DECIMAL = XSD_NS + "decimal"
XSD_DOUBLE = XSD_NS + "double"
XSD_BOOLEAN = XSD_NS + "boolean"
OWL_SAMEAS = OWL_NS + "sameAs"

# Reserved graph names (jena-arq/.../sparql/core/Quad.java:40-48)
DEFAULT_GRAPH = ""

TRIPLE_FIELDS = [
    ("s_kind", pa.int8()),
    ("s_lex", pa.large_string()),
    ("p", pa.large_string()),
    ("o_kind", pa.int8()),
    ("o_lex", pa.large_string()),
    ("o_datatype", pa.large_string()),
    ("o_lang", pa.large_string()),
    ("g", pa.large_string()),
    ("doc_id", pa.large_string()),
]

TRIPLE_SCHEMA = pa.schema(TRIPLE_FIELDS)
TRIPLE_COLUMNS = [name for name, _ in TRIPLE_FIELDS]


def empty_triple_table() -> pa.Table:
    return TRIPLE_SCHEMA.empty_table()


def triples_from_pylists(cols: dict[str, list]) -> pa.Table:
    """Build a triple-schema Arrow table from python column lists."""
    arrays = [pa.array(cols[name], type=typ) for name, typ in TRIPLE_FIELDS]
    return pa.Table.from_arrays(arrays, schema=TRIPLE_SCHEMA)


class RDFParseError(ValueError):
    """Raised on syntax errors / positional-constraint violations.

    The reference treats literal subjects/predicates as hard errors
    (ParserProfileStd.java:150-177); we do the same.
    """
