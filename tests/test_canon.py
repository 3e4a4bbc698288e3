"""Canonicalization unit tests: IRI, lang tags, literals, bnodes."""

from jena_ray.rdf.bnodes import BNodeScope
from jena_ray.rdf.iri import normalize, remove_dot_segments, resolve
from jena_ray.rdf.langtags import format_langtag
from jena_ray.rdf.literals import canonical_lexical, canonicalize_literal, value_key
from jena_ray.model import XSD_NS


class TestIRI:
    def test_resolve_rfc3986_examples(self):
        # RFC 3986 §5.4.1 normal examples
        base = "http://a/b/c/d;p?q"
        cases = {
            "g": "http://a/b/c/g",
            "./g": "http://a/b/c/g",
            "g/": "http://a/b/c/g/",
            "/g": "http://a/g",
            "//g": "http://g",
            "?y": "http://a/b/c/d;p?y",
            "g?y": "http://a/b/c/g?y",
            "#s": "http://a/b/c/d;p?q#s",
            "g#s": "http://a/b/c/g#s",
            ";x": "http://a/b/c/;x",
            "": "http://a/b/c/d;p?q",
            ".": "http://a/b/c/",
            "..": "http://a/b/",
            "../g": "http://a/b/g",
            "../..": "http://a/",
            "../../g": "http://a/g",
            # abnormal
            "../../../g": "http://a/g",
            "/./g": "http://a/g",
            "/../g": "http://a/g",
            "g.": "http://a/b/c/g.",
            "g..": "http://a/b/c/g..",
            "./../g": "http://a/b/g",
            "g;x=1/./y": "http://a/b/c/g;x=1/y",
            "http:g": "http:g",
        }
        for ref, want in cases.items():
            assert resolve(base, ref) == want, ref

    def test_remove_dot_segments(self):
        assert remove_dot_segments("/a/b/c/./../../g") == "/a/g"
        assert remove_dot_segments("mid/content=5/../6") == "mid/6"

    def test_normalize(self):
        assert normalize("HTTP://Ex.org:80/a/../b/%7e") == "http://ex.org/b/~"
        assert normalize("https://ex.org:443/") == "https://ex.org/"
        assert normalize("http://ex.org") == "http://ex.org/"
        assert normalize("http://ex.org/%2fx%2F") == "http://ex.org/%2Fx%2F"
        assert normalize("urn:abc:Def") == "urn:abc:Def"  # no authority casing outside host
        assert normalize("http://ex.org:8080/x") == "http://ex.org:8080/x"


class TestLangTags:
    def test_cases(self):
        assert format_langtag("EN") == "en"
        assert format_langtag("en-gb") == "en-GB"
        assert format_langtag("zh-hant-tw") == "zh-Hant-TW"
        assert format_langtag("az-latn") == "az-Latn"
        assert format_langtag("en-a-bbb-x-a-ccc") == "en-a-bbb-x-a-ccc"
        assert format_langtag("DE-CH-1996") == "de-CH-1996"


class TestLiterals:
    def test_boolean(self):
        assert canonical_lexical("1", XSD_NS + "boolean") == "true"
        assert canonical_lexical("0", XSD_NS + "boolean") == "false"
        assert canonical_lexical("true", XSD_NS + "boolean") == "true"

    def test_integer(self):
        assert canonical_lexical("+007", XSD_NS + "integer") == "7"
        assert canonical_lexical("-0", XSD_NS + "int") == "0"
        assert canonical_lexical("12345678901234567890", XSD_NS + "integer") == "12345678901234567890"

    def test_decimal(self):
        assert canonical_lexical("1.500", XSD_NS + "decimal") == "1.5"
        assert canonical_lexical("3", XSD_NS + "decimal") == "3.0"
        assert canonical_lexical("-0.0", XSD_NS + "decimal") == "0.0"
        assert canonical_lexical("+4.20", XSD_NS + "decimal") == "4.2"

    def test_double(self):
        # Java Double.toString emulation + 'e0' suffix (XSDNumUtils:111-116)
        assert canonical_lexical("0", XSD_NS + "double") == "0.0e0"
        assert canonical_lexical("1", XSD_NS + "double") == "1.0e0"
        assert canonical_lexical("1.5", XSD_NS + "double") == "1.5e0"
        assert canonical_lexical("1E4", XSD_NS + "double") == "10000.0e0"
        assert canonical_lexical("1E7", XSD_NS + "double") == "1.0E7"
        assert canonical_lexical("0.001", XSD_NS + "double") == "0.001e0"
        assert canonical_lexical("1e-4", XSD_NS + "double") == "1.0E-4"
        assert canonical_lexical("-2.5e2", XSD_NS + "double") == "-250.0e0"
        assert canonical_lexical("INF", XSD_NS + "double") == "INF"
        assert canonical_lexical("-inf", XSD_NS + "double") == "-INF"
        assert canonical_lexical("NaN", XSD_NS + "double") == "NaN"

    def test_datetime_fracsec(self):
        dt = XSD_NS + "dateTime"
        assert canonical_lexical("2020-01-01T00:00:01.500Z", dt) == "2020-01-01T00:00:01.5Z"
        assert canonical_lexical("2020-01-01T00:00:01.000Z", dt) == "2020-01-01T00:00:01Z"
        assert canonical_lexical("2020-01-01T00:00:01Z", dt) == "2020-01-01T00:00:01Z"
        assert canonical_lexical("2020-01-01T00:00:01.25+05:00", dt) == "2020-01-01T00:00:01.25+05:00"

    def test_lang_literal_canon(self):
        lex, dt, lang = canonicalize_literal("chat", "", "FR")
        assert (lex, lang) == ("chat", "fr")

    def test_value_key(self):
        assert value_key("01", XSD_NS + "int", "") == value_key("1", XSD_NS + "integer", "")
        assert value_key("1.0", XSD_NS + "decimal", "") == value_key("1", XSD_NS + "integer", "")
        assert value_key("a", "", "") != value_key("a", "", "en")


class TestBNodes:
    def test_document_scoping(self):
        a = BNodeScope("seed", "doc1")
        b = BNodeScope("seed", "doc2")
        assert a.get("b0") != b.get("b0")          # cross-doc distinct
        assert a.get("b0") == a.get("b0")          # stable within doc
        a2 = BNodeScope("seed", "doc1")
        assert a.get("b0") == a2.get("b0")         # deterministic
        assert len(a.get("b0")) == 32
        assert a.fresh() != a.fresh()
