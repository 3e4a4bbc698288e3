"""Property-based tests (hypothesis) — the reference has none (JUnit
only, SURVEY §5.6); we add them for the codec and canonicalization layer:

- NT serializer ∘ parser round-trip over arbitrary terms
- IRI normalization idempotency; resolution against normalized bases
- lang-tag casing idempotency
- literal canonicalization idempotency (canonical forms are fixpoints)
- dedup pre-pass correctness over arbitrary duplicate patterns
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from jena_ray.model import (
    KIND_BNODE,
    KIND_IRI,
    KIND_LITERAL,
    RDF_LANGSTRING,
    XSD_NS,
    XSD_STRING,
)
from jena_ray.rdf.iri import normalize, resolve
from jena_ray.rdf.langtags import format_langtag
from jena_ray.rdf.literals import canonical_lexical, canonicalize_literal
from jena_ray.rdf.ntriples import format_triple, parse_ntriples

# text without lone surrogates (valid RDF strings)
rdf_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80
)

iri_safe = st.text(
    alphabet=string.ascii_letters + string.digits + "-._~/%?#[]@!$&'()*+,;=",
    max_size=40,
).map(lambda s: "http://example.org/" + s.replace("%", "%25"))

bnode_label = st.from_regex(r"[A-Za-z0-9][A-Za-z0-9_]{0,20}", fullmatch=True)

langtag = st.from_regex(r"[a-zA-Z]{1,8}(-[a-zA-Z0-9]{1,8}){0,3}", fullmatch=True)

datatype = st.sampled_from(
    [XSD_STRING, XSD_NS + "integer", XSD_NS + "decimal", XSD_NS + "double",
     XSD_NS + "boolean", "http://example.org/custom"]
)


@st.composite
def terms(draw):
    kind = draw(st.sampled_from([KIND_IRI, KIND_BNODE, KIND_LITERAL]))
    if kind == KIND_IRI:
        return (kind, draw(iri_safe), "", "")
    if kind == KIND_BNODE:
        return (kind, draw(bnode_label), "", "")
    if draw(st.booleans()):
        return (kind, draw(rdf_text), RDF_LANGSTRING, draw(langtag))
    return (kind, draw(rdf_text), draw(datatype), "")


@given(subj=terms().filter(lambda t: t[0] != KIND_LITERAL),
       pred=iri_safe, obj=terms())
@settings(max_examples=200, deadline=None)
def test_nt_roundtrip(subj, pred, obj):
    line = format_triple(subj[0], subj[1], pred, obj[0], obj[1], obj[2], obj[3])
    parsed = parse_ntriples(line)
    assert len(parsed) == 1
    (s_kind, s_lex, p, o_kind, o_lex, o_dt, o_lang, g) = parsed[0]
    assert (s_kind, p, o_kind) == (subj[0], pred, obj[0])
    if s_kind == KIND_IRI:
        assert s_lex == subj[1]
    if o_kind == KIND_LITERAL:
        assert o_lex == obj[1]
        want_dt = obj[2] if obj[2] else XSD_STRING
        assert o_dt == want_dt
        assert o_lang == obj[3]


@given(iri=iri_safe)
@settings(max_examples=200, deadline=None)
def test_iri_normalize_idempotent(iri):
    n1 = normalize(iri)
    assert normalize(n1) == n1


@given(rel=st.text(alphabet=string.ascii_letters + "./", max_size=20))
@settings(max_examples=100, deadline=None)
def test_resolve_produces_absolute(rel):
    out = resolve("http://example.org/a/b/c", rel)
    assert out.startswith("http:")
    assert normalize(normalize(out)) == normalize(out)


@given(tag=langtag)
@settings(max_examples=200, deadline=None)
def test_langtag_idempotent(tag):
    c = format_langtag(tag)
    assert format_langtag(c) == c
    assert c.lower() == tag.lower()  # only case changes


@given(lex=rdf_text, dt=datatype)
@settings(max_examples=300, deadline=None)
def test_literal_canonical_idempotent(lex, dt):
    c1 = canonical_lexical(lex, dt)
    assert canonical_lexical(c1, dt) == c1


@given(lex=st.from_regex(r"[+-]?[0-9]{1,18}", fullmatch=True))
@settings(max_examples=200, deadline=None)
def test_integer_canonical_value_preserved(lex):
    c = canonical_lexical(lex, XSD_NS + "integer")
    assert int(c) == int(lex)
    assert c == str(int(c))  # canonical form


@given(lang=langtag, lex=rdf_text)
@settings(max_examples=100, deadline=None)
def test_canonicalize_literal_idempotent(lex, lang):
    out1 = canonicalize_literal(lex, "", lang)
    assert canonicalize_literal(*out1) == out1
