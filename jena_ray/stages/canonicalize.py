"""Canonicalization stage — Jena-style node canonicalization as a
stateless, vectorized ``map_batches`` kernel over the triple table.

Applies, column-wise (SURVEY.md §2.3):
- IRI normalization (RFC 3986 §6.2.2 — IRI3986.java:569-664) to s_lex
  (where IRI), p, o_lex (where IRI), o_datatype
- literal canonicalization (NormalizeRDFTerms "General" policy) to o_lex
- RFC 5646 lang-tag casing (LangTags.java:81-125) to o_lang

Vectorization strategy: IRI/lang columns are dictionary-encoded per batch
and the pure-Python rewriter runs once per UNIQUE value (predicates and
datatypes are heavily repeated — Zipf-skewed — so this is near-O(uniques));
literal rewriting fast-paths rows whose datatype needs no work via a
vectorized mask.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..model import KIND_IRI, KIND_LITERAL
from ..rdf.iri import normalize as iri_normalize
from ..rdf.langtags import format_langtag
from ..rdf.literals import (
    XSD_DATETIME_TYPES,
    XSD_BOOLEAN,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_FLOAT,
    XSD_INTEGER_TYPES,
    XSD_NS,
    canonical_lexical,
)

_CANON_DTS = (
    XSD_INTEGER_TYPES
    | XSD_DATETIME_TYPES
    | {XSD_DECIMAL, XSD_DOUBLE, XSD_FLOAT, XSD_BOOLEAN, XSD_NS + "date"}
)

# Custom datatypes (TypeMapper analog): registered at import time so every
# worker process sees the same table. CDT list/map literals ship by default.
from ..functions.registry import DatatypeRegistry as _DTReg  # noqa: E402

CUSTOM_DATATYPES = _DTReg()
from ..rdf import cdt as _cdt  # noqa: E402

_cdt.register(CUSTOM_DATATYPES)


def _custom_iris() -> set:
    return set(CUSTOM_DATATYPES._types)


def _canon_one(lex: str, dt: str) -> str:
    entry = CUSTOM_DATATYPES.get(dt)
    if entry is not None:
        try:
            return entry.canonical(lex)
        except Exception:
            return lex
    return canonical_lexical(lex, dt)


def _map_unique(arr: pa.ChunkedArray | pa.Array, fn) -> pa.Array:
    """Apply a python fn once per unique value via dictionary encoding."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    darr = arr.dictionary_encode()
    vals = darr.dictionary.to_pylist()
    new = pa.array([fn(v) if v is not None else None for v in vals], type=arr.type)
    return new.take(darr.indices)


def _masked_unique(arr, mask: pa.Array, fn) -> pa.Array:
    mapped = _map_unique(arr, fn)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pc.if_else(mask, mapped, arr)


def canonicalize_batch(batch: pa.Table) -> pa.Table:
    s_kind = batch.column("s_kind")
    o_kind = batch.column("o_kind")
    s_is_iri = pc.equal(s_kind, pa.scalar(KIND_IRI, pa.int8())).combine_chunks()
    o_is_iri = pc.equal(o_kind, pa.scalar(KIND_IRI, pa.int8())).combine_chunks()

    s_lex = _masked_unique(batch.column("s_lex"), s_is_iri, _safe_norm)
    p = _map_unique(batch.column("p"), _safe_norm)
    o_dt = _map_unique(batch.column("o_datatype"), _safe_norm)
    o_lang = _map_unique(batch.column("o_lang"), _canon_lang)

    # literals: rewrite only rows whose datatype is in the canonicalizable set
    o_lex = batch.column("o_lex").combine_chunks()
    o_is_lit = pc.equal(o_kind, pa.scalar(KIND_LITERAL, pa.int8())).combine_chunks()
    all_canon_dts = _CANON_DTS | _custom_iris()
    dt_needs = pc.is_in(o_dt, value_set=pa.array(sorted(all_canon_dts), o_dt.type))
    needs = pc.and_(o_is_lit, dt_needs)
    if pc.any(needs).as_py():
        # dictionary-encode the (datatype, lexical) PAIR so the Python
        # canonicalizer runs once per unique pair (literals repeat
        # Zipf-like just as IRIs do); dt leads the key — an IRI can never
        # contain NUL, so the partition is unambiguous
        combined = pc.binary_join_element_wise(
            pc.cast(o_dt, o_lex.type), o_lex, pa.scalar("\x00", o_lex.type)
        )

        def _canon_pair(v: str) -> str:
            dt, _, lex = v.partition("\x00")
            return _canon_one(lex, dt)

        canon_all = _map_unique(combined, _canon_pair)
        o_lex = pc.if_else(needs, canon_all, o_lex)
        if isinstance(o_lex, pa.ChunkedArray):
            o_lex = o_lex.combine_chunks()
    o_lex = pc.if_else(o_is_iri, _map_unique(o_lex, _safe_norm), o_lex)

    return pa.Table.from_arrays(
        [
            s_kind.combine_chunks(),
            s_lex,
            p,
            o_kind.combine_chunks(),
            o_lex,
            o_dt,
            o_lang,
            batch.column("g").combine_chunks(),
            batch.column("doc_id").combine_chunks(),
        ],
        schema=batch.schema,
    )


def _safe_norm(v: str) -> str:
    if not v:
        return v
    try:
        return iri_normalize(v)
    except Exception:
        return v


def _canon_lang(v: str) -> str:
    return format_langtag(v) if v else v
