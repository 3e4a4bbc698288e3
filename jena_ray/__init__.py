"""jena_ray — a Ray-Data-native knowledge-graph construction engine.

Built from scratch on ray.data.Dataset pipelines of ``map_batches`` over
zero-copy Arrow batches. Reproduces the RDF 1.1 data model and triple
semantics of Apache Jena (reference at /root/reference — see SURVEY.md for
the file:line parity map) with a fundamentally different execution model:

- parsing / canonicalization / serialization are stateless batch transforms
- entity linking is an actor-pool stage (alias dictionary loaded once/actor)
- exact dedup is a salted-hash shuffle; owl:sameAs closure is iterative
  groupby-min label propagation (distributed union-find)
- materialization is a partitioned Parquet triple table with per-partition
  lineage manifests for checkpoint/resume

Nothing here calls ``ray.init``; sessions are owned by bench.py / tests.

Front door (the RDFDataMgr + QueryExecutionFactory analog):

    import jena_ray
    triples = jena_ray.read("data/*.ttl")            # triple Dataset
    rows = jena_ray.query(triples, "SELECT ?s WHERE { ?s a <C> }")
    ok = jena_ray.query("file.nt", "ASK { ?s ?p ?o }")
"""

__version__ = "0.2.0"


def read(paths, **kw):
    """RDF files (directory / glob / list; .nt .nq .ttl .trig .rdf
    .jsonld .trix .rj .n3) → distributed triple Dataset. See
    sources/readers.read_rdf."""
    from .sources.readers import read_rdf

    return read_rdf(paths, **kw)


def query(source, query_text: str, with_meta: bool = False):
    """Run a SPARQL query (SELECT / ASK / CONSTRUCT subset — see
    ops/sparql.py) over a triple Dataset or RDF file path(s).
    ``with_meta=True`` keeps SELECT results' hidden term-metadata
    columns for typed result-set serialization (CLI / writers)."""
    from .ops.sparql import sparql_query

    if isinstance(source, (str, list, tuple)):
        source = read(source)
    return sparql_query(source, query_text, with_meta=with_meta)


def update(source, update_text: str):
    """Apply a SPARQL 1.1 Update request (INSERT/DELETE DATA,
    DELETE/INSERT WHERE, CLEAR — see ops/sparql.sparql_update) to a
    triple Dataset or RDF file path(s) → the updated Dataset (the
    UpdateAction.execute analog; the input is never mutated)."""
    from .ops.sparql import sparql_update

    if isinstance(source, (str, list, tuple)):
        source = read(source)
    return sparql_update(source, update_text)
