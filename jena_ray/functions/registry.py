"""Extension registries — the Ray-Data analogs of the reference's hooks:

| reference hook                                   | here |
|--------------------------------------------------|------|
| FunctionRegistry (custom fn by IRI,              | FunctionRegistry —
|   sparql/function/FunctionRegistry.java)         |   named vectorized UDFs |
| AggregateRegistry (expr/aggregate/               | AggregateRegistry —
|   AggregateRegistry.java)                        |   ray AggregateFn factories |
| TypeMapper custom datatypes                      | DatatypeRegistry —
|   (jena-core/.../datatypes/TypeMapper.java)      |   parse/canon/value-key fns |
| RDFParserRegistry / RDFWriterRegistry            | FormatRegistry |
| StreamRDF interposition                          | PipelineSteps —
|   (riot/system/StreamRDFWrapper.java)            |   named map_batches chain |
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc


class FunctionRegistry:
    """Named vectorized scalar UDFs: fn(pa.Array...) -> pa.Array, keyed by
    IRI like the SPARQL custom-function registry."""

    def __init__(self):
        self._fns: dict[str, Callable] = {}

    def register(self, iri: str, fn: Callable) -> None:
        self._fns[iri] = fn

    def get(self, iri: str) -> Callable:
        if iri not in self._fns:
            raise KeyError(f"no function registered for <{iri}>")
        return self._fns[iri]

    def __contains__(self, iri: str) -> bool:
        return iri in self._fns

    def apply(self, iri: str, batch: pa.Table, *cols: str, out: str) -> pa.Table:
        fn = self.get(iri)
        result = fn(*[batch.column(c) for c in cols])
        return batch.append_column(out, result)


FUNCTIONS = FunctionRegistry()

# built-ins mirroring the reference's function library (§2.8)
FUNCTIONS.register("http://www.w3.org/2005/xpath-functions#upper-case", pc.utf8_upper)
FUNCTIONS.register("http://www.w3.org/2005/xpath-functions#lower-case", pc.utf8_lower)
FUNCTIONS.register(
    "http://www.w3.org/2005/xpath-functions#string-length",
    lambda a: pc.utf8_length(a).cast(pa.int64()),
)
FUNCTIONS.register("http://www.w3.org/2005/xpath-functions#abs", pc.abs)
FUNCTIONS.register("http://www.w3.org/2005/xpath-functions#ceiling", pc.ceil)
FUNCTIONS.register("http://www.w3.org/2005/xpath-functions#floor", pc.floor)


class AggregateRegistry:
    """Custom aggregate factories: name → () -> ray.data.aggregate.AggregateFn."""

    def __init__(self):
        self._aggs: dict[str, Callable] = {}

    def register(self, name: str, factory: Callable) -> None:
        self._aggs[name] = factory

    def make(self, name: str, *args, **kw):
        return self._aggs[name](*args, **kw)

    def __contains__(self, name):
        return name in self._aggs


@dataclass
class DatatypeEntry:
    iri: str
    parse: Callable[[str], object]
    canonical: Callable[[str], str]
    value_key: Callable[[str], str]


class DatatypeRegistry:
    """Custom literal datatypes (TypeMapper analog): per-datatype parser,
    canonicalizer and value-space key used by the canonicalize stage."""

    def __init__(self):
        self._types: dict[str, DatatypeEntry] = {}

    def register(self, entry: DatatypeEntry) -> None:
        self._types[entry.iri] = entry

    def get(self, iri: str) -> DatatypeEntry | None:
        return self._types.get(iri)

    def __contains__(self, iri):
        return iri in self._types


class FormatRegistry:
    """Reader/writer registration per syntax name (RDFParserRegistry /
    RDFWriterRegistry analog)."""

    def __init__(self):
        self.readers: dict[str, Callable] = {}
        self.writers: dict[str, Callable] = {}

    def register_reader(self, lang: str, fn: Callable) -> None:
        self.readers[lang.lower()] = fn

    def register_writer(self, lang: str, fn: Callable) -> None:
        self.writers[lang.lower()] = fn

    def reader(self, lang: str) -> Callable:
        return self.readers[lang.lower()]

    def writer(self, lang: str) -> Callable:
        return self.writers[lang.lower()]


def default_formats() -> FormatRegistry:
    from ..rdf.ntriples import parse_ntriples
    from ..rdf.turtle import parse_turtle
    from ..stages.serialize import format_nt_batch, format_turtle_flat_batch

    from ..rdf.rdfxml import parse_rdfxml
    from ..rdf.turtle import parse_trig

    reg = FormatRegistry()
    reg.register_reader("ntriples", lambda text, **kw: parse_ntriples(text, **kw))
    reg.register_reader(
        "nquads", lambda text, **kw: parse_ntriples(text, quads=True, **kw)
    )
    reg.register_reader("turtle", lambda text, **kw: parse_turtle(text, **kw))
    reg.register_reader("trig", lambda text, **kw: parse_trig(text, **kw))
    reg.register_reader("rdfxml", lambda text, **kw: parse_rdfxml(text, **kw))
    from ..rdf.jsonld import parse_jsonld

    reg.register_reader("jsonld", lambda text, **kw: parse_jsonld(text, **kw))
    from ..rdf.trix import parse_trix

    reg.register_reader("trix", lambda text, **kw: parse_trix(text, **kw))
    reg.register_writer("ntriples", format_nt_batch)
    reg.register_writer("turtle-flat", format_turtle_flat_batch)
    from ..stages.writers import jsonld_groups, rdfxml_groups, turtle_pretty_groups

    reg.register_writer("turtle-pretty", turtle_pretty_groups)
    reg.register_writer("jsonld", jsonld_groups)
    reg.register_writer("rdfxml", rdfxml_groups)
    return reg


class PipelineSteps:
    """StreamRDF-interposition analog: an ordered, named chain of
    map_batches kernels; steps can be inserted before/after named stages."""

    def __init__(self):
        self._steps: list[tuple[str, Callable]] = []

    def append(self, name: str, fn: Callable) -> "PipelineSteps":
        self._steps.append((name, fn))
        return self

    def insert_before(self, anchor: str, name: str, fn: Callable) -> "PipelineSteps":
        idx = self._index(anchor)
        self._steps.insert(idx, (name, fn))
        return self

    def insert_after(self, anchor: str, name: str, fn: Callable) -> "PipelineSteps":
        idx = self._index(anchor)
        self._steps.insert(idx + 1, (name, fn))
        return self

    def _index(self, name: str) -> int:
        for i, (n, _) in enumerate(self._steps):
            if n == name:
                return i
        raise KeyError(f"no pipeline step named {name!r}")

    def names(self) -> list[str]:
        return [n for n, _ in self._steps]

    def build(self, ds, batch_format: str = "pyarrow"):
        for _, fn in self._steps:
            ds = ds.map_batches(fn, batch_format=batch_format)
        return ds
