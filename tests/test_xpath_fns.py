"""XPath fn: / math: / Leviathan lfn: function libraries through the
SPARQL front door (StandardFunctions.java loadStdDefs/loadOtherDefs,
function/library/leviathan/*.java via MappedLoader.java:52).

Each family is exercised as BIND expressions over a tiny in-memory
triple table; values are checked against hand-computed results (the
XPath F&O spec's own examples where it gives them)."""

import math

import pyarrow as pa
import pytest

from jena_ray.model import RDFParseError
from jena_ray.ops.sparql import sparql_select

PRE = """
PREFIX fn: <http://www.w3.org/2005/xpath-functions#>
PREFIX math: <http://www.w3.org/2005/xpath-functions/math#>
PREFIX lfn: <http://www.dotnetrdf.org/leviathan#>
PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
"""


def _store(vals):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "s_lex": pa.array([f"http://ex/s{i}" for i in range(len(vals))],
                          pa.large_string()),
        "p": pa.array(["http://ex/v"] * len(vals), pa.large_string()),
        "o_lex": pa.array([str(v) for v in vals], pa.large_string()),
    }))


def _one(q, vals=(4,)):
    rows = sparql_select(_store(list(vals)), PRE + q).take_all()
    assert len(rows) == len(vals)
    return rows[0]


@pytest.mark.usefixtures("ray_session")
class TestMathNamespace:
    def test_unary_kernels(self):
        r = _one("""SELECT ?e ?l ?lg ?sq ?sn WHERE {
            ?s <http://ex/v> ?o .
            BIND(math:exp(?o) AS ?e) BIND(math:log(?o) AS ?l)
            BIND(math:log10(?o) AS ?lg) BIND(math:sqrt(?o) AS ?sq)
            BIND(math:sin(?o) AS ?sn) }""")
        assert float(r["e"]) == pytest.approx(math.exp(4))
        assert float(r["l"]) == pytest.approx(math.log(4))
        assert float(r["lg"]) == pytest.approx(math.log10(4))
        assert r["sq"] == "2"
        assert float(r["sn"]) == pytest.approx(math.sin(4))

    def test_binary_and_pi(self):
        r = _one("""SELECT ?p ?a ?c WHERE {
            ?s <http://ex/v> ?o .
            BIND(math:pow(?o, 3) AS ?p) BIND(math:atan2(?o, 2) AS ?a)
            BIND(math:pi() AS ?c) }""")
        assert r["p"] == "64"
        assert float(r["a"]) == pytest.approx(math.atan2(4, 2))
        assert float(r["c"]) == pytest.approx(math.pi)

    def test_non_numeric_arg_is_error(self):
        rows = sparql_select(_store(["abc"]), PRE + """
            SELECT ?r WHERE { ?s <http://ex/v> ?o .
                              BIND(math:sqrt(?o) AS ?r) }""").take_all()
        assert rows[0]["r"] is None

    def test_datatype_is_double(self):
        r = _one("""SELECT ?dt WHERE { ?s <http://ex/v> ?o .
            BIND(DATATYPE(math:sqrt(?o)) AS ?dt) }""")
        assert r["dt"].endswith("#double")


@pytest.mark.usefixtures("ray_session")
class TestFnNumericOps:
    def test_mod_idiv(self):
        # F&O op:numeric-mod / op:numeric-integer-divide examples
        r = _one("""SELECT ?m ?d ?mz WHERE { ?s <http://ex/v> ?o .
            BIND(fn:numeric-mod(10, 3) AS ?m)
            BIND(fn:numeric-integer-divide(10, 3) AS ?d)
            BIND(fn:numeric-mod(?o, 0) AS ?mz) }""")
        assert (r["m"], r["d"]) == ("1", "3")
        assert r["mz"] is None  # zero divisor = expression error

    def test_mod_sign_follows_dividend(self):
        r = _one("""SELECT ?m ?d WHERE { ?s <http://ex/v> ?o .
            BIND(fn:numeric-mod(-7, 2) AS ?m)
            BIND(fn:numeric-integer-divide(-7, 2) AS ?d) }""")
        assert (r["m"], r["d"]) == ("-1", "-3")  # trunc, not floor

    def test_round_half_to_even(self):
        r = _one("""SELECT ?a ?b ?c WHERE { ?s <http://ex/v> ?o .
            BIND(fn:round-half-to-even(2.5) AS ?a)
            BIND(fn:round-half-to-even(3.5) AS ?b)
            BIND(fn:round-half-to-even(3.567812e0, 2) AS ?c) }""")
        assert (r["a"], r["b"]) == ("2", "4")
        assert float(r["c"]) == pytest.approx(3.57)


@pytest.mark.usefixtures("ray_session")
class TestFnStrings:
    def test_desugared_string_family(self):
        rows = sparql_select(_store(["x"]), PRE + """
            SELECT ?u ?l ?n ?cat ?sl ?sb ?sa WHERE {
              ?s <http://ex/v> ?o .
              BIND(fn:upper-case("abC") AS ?u)
              BIND(fn:lower-case("abC") AS ?l)
              BIND(fn:normalize-space("  a   b  ") AS ?n)
              BIND(fn:concat("a", "b", "c") AS ?cat)
              BIND(fn:string-length("abcd") AS ?sl)
              BIND(fn:substring-before("tattoo", "tto") AS ?sb)
              BIND(fn:substring-after("tattoo", "tat") AS ?sa) }
        """).take_all()
        r = rows[0]
        assert (r["u"], r["l"], r["n"], r["cat"]) == ("ABC", "abc",
                                                      "a b", "abc")
        assert r["sl"] == "4"
        assert (r["sb"], r["sa"]) == ("ta", "too")  # F&O §5.5.4/5.5.5

    def test_normalize_unicode(self):
        # e + COMBINING ACUTE (NFD) normalizes to the composed form
        rows = sparql_select(_store(["x"]), PRE + """
            SELECT ?n WHERE { ?s <http://ex/v> ?o .
              BIND(fn:normalize-unicode("e\\u0301") AS ?n) }""").take_all()
        assert rows[0]["n"] == "é"

    def test_matches_and_replace(self):
        rows = sparql_select(_store(["abracadabra"]), PRE + """
            SELECT ?r WHERE { ?s <http://ex/v> ?o .
              FILTER(fn:matches(?o, "BRA", "i"))
              BIND(fn:replace(?o, "a.*?a", "*") AS ?r) }""").take_all()
        assert rows[0]["r"] == "*c*bra"  # F&O §5.6.5 example

    def test_boolean_not(self):
        rows = sparql_select(_store(["x"]), PRE + """
            SELECT ?b ?nb WHERE { ?s <http://ex/v> ?o .
              BIND(fn:boolean("text") AS ?b)
              BIND(fn:not("") AS ?nb) }""").take_all()
        assert (rows[0]["b"], rows[0]["nb"]) == ("true", "true")


@pytest.mark.usefixtures("ray_session")
class TestFnDateTimeDuration:
    def test_duration_accessors_normalize(self):
        # F&O §8.5: components normalize — PT36H has 1 day / 12 hours
        rows = sparql_select(_store(["x"]), PRE + """
            SELECT ?y ?mo ?d ?h ?mi ?sec WHERE { ?s <http://ex/v> ?o .
              BIND(fn:years-from-duration("P20Y15M"^^xsd:duration) AS ?y)
              BIND(fn:months-from-duration("P20Y15M"^^xsd:duration) AS ?mo)
              BIND(fn:days-from-duration("P3DT36H"^^xsd:duration) AS ?d)
              BIND(fn:hours-from-duration("P3DT36H"^^xsd:duration) AS ?h)
              BIND(fn:minutes-from-duration("-P5DT12H30M"^^xsd:duration)
                   AS ?mi)
              BIND(fn:seconds-from-duration("PT90.5S"^^xsd:duration)
                   AS ?sec) }""").take_all()
        r = rows[0]
        assert (r["y"], r["mo"], r["d"], r["h"], r["mi"]) == (
            "21", "3", "4", "12", "-30")
        assert r["sec"] == "30.5"

    def test_datetime_accessors_and_combine(self):
        rows = sparql_select(_store(["x"]), PRE + """
            SELECT ?y ?ht ?dt WHERE { ?s <http://ex/v> ?o .
              BIND(fn:year-from-dateTime(
                "1999-05-31T13:20:00-05:00"^^xsd:dateTime) AS ?y)
              BIND(fn:hours-from-time("13:20:00"^^xsd:time) AS ?ht)
              BIND(fn:dateTime("1999-12-31"^^xsd:date,
                               "12:00:00"^^xsd:time) AS ?dt) }""").take_all()
        r = rows[0]
        assert (r["y"], r["ht"]) == ("1999", "13")
        assert r["dt"] == "1999-12-31T12:00:00"  # F&O §9.7.3 example

    def test_adjust_to_timezone(self):
        # F&O §9.6.1 examples (implicit timezone here is UTC)
        rows = sparql_select(_store(["x"]), PRE + """
            SELECT ?a ?b WHERE { ?s <http://ex/v> ?o .
              BIND(fn:adjust-dateTime-to-timezone(
                "2002-03-07T10:00:00-05:00"^^xsd:dateTime,
                "PT10H"^^xsd:dayTimeDuration) AS ?a)
              BIND(fn:adjust-dateTime-to-timezone(
                "2002-03-07T10:00:00"^^xsd:dateTime,
                "-PT10H"^^xsd:dayTimeDuration) AS ?b) }""").take_all()
        assert rows[0]["a"] == "2002-03-08T01:00:00+10:00"
        assert rows[0]["b"] == "2002-03-07T10:00:00-10:00"

    def test_implicit_timezone(self):
        rows = sparql_select(_store(["x"]), PRE + """
            SELECT ?z WHERE { ?s <http://ex/v> ?o .
              BIND(fn:implicit-timezone() AS ?z) }""").take_all()
        assert rows[0]["z"] == "PT0S"


@pytest.mark.usefixtures("ray_session")
class TestLeviathan:
    def test_algebra(self):
        r = _one("""SELECT ?sq ?cu ?rec ?ten ?rt ?fac WHERE {
            ?s <http://ex/v> ?o .
            BIND(lfn:sq(?o) AS ?sq) BIND(lfn:cube(?o) AS ?cu)
            BIND(lfn:reciprocal(?o) AS ?rec) BIND(lfn:ten(2) AS ?ten)
            BIND(lfn:root(64, 3) AS ?rt)
            BIND(lfn:factorial(?o) AS ?fac) }""")
        assert (r["sq"], r["cu"], r["rec"], r["ten"]) == (
            "16", "64", "0.25", "100")
        assert float(r["rt"]) == pytest.approx(4.0)
        assert r["fac"] == "24"

    def test_log_one_and_two_arg(self):
        r = _one("""SELECT ?l1 ?l2 ?ln ?e WHERE {
            ?s <http://ex/v> ?o .
            BIND(lfn:log(100) AS ?l1) BIND(lfn:log(8, 2) AS ?l2)
            BIND(lfn:ln(?o) AS ?ln) BIND(lfn:e(1) AS ?e) }""")
        assert r["l1"] == "2"
        assert float(r["l2"]) == pytest.approx(3.0)
        assert float(r["ln"]) == pytest.approx(math.log(4))
        assert float(r["e"]) == pytest.approx(math.e)

    def test_trig_and_distance(self):
        r = _one("""SELECT ?st ?ct ?py ?cart ?d2r WHERE {
            ?s <http://ex/v> ?o .
            BIND(lfn:sec(1) AS ?st) BIND(lfn:cot(1) AS ?ct)
            BIND(lfn:pythagoras(3, 4) AS ?py)
            BIND(lfn:cartesian(0, 0, 3, 4) AS ?cart)
            BIND(lfn:degreesToRadians(180) AS ?d2r) }""")
        assert float(r["st"]) == pytest.approx(1 / math.cos(1))
        assert float(r["ct"]) == pytest.approx(math.cos(1) / math.sin(1))
        assert (r["py"], r["cart"]) == ("5", "5")
        assert float(r["d2r"]) == pytest.approx(math.pi)

    def test_hashes(self):
        import hashlib

        r = _one("""SELECT ?m ?sh WHERE { ?s <http://ex/v> ?o .
            BIND(lfn:md5hash("abc") AS ?m)
            BIND(lfn:sha256hash("abc") AS ?sh) }""")
        assert r["m"] == hashlib.md5(b"abc").hexdigest()
        assert r["sh"] == hashlib.sha256(b"abc").hexdigest()

    def test_rnd_range(self):
        rows = sparql_select(_store([1, 2, 3]), PRE + """
            SELECT ?r WHERE { ?s <http://ex/v> ?o .
              BIND(lfn:rnd(5, 10) AS ?r) }""").take_all()
        for row in rows:
            assert 5.0 <= float(row["r"]) < 10.0


@pytest.mark.usefixtures("ray_session")
class TestFnApply:
    """fn:apply (FN_Apply.java): constant function IRI desugars to the
    call; literal/bnode ids are per-solution eval errors."""

    def test_apply_constant_iri(self):
        r = _one("""SELECT ?r ?m WHERE { ?s <http://ex/v> ?o .
            BIND(fn:apply(math:sqrt, ?o) AS ?r)
            BIND(fn:apply(fn:upper-case, "abc") AS ?m) }""")
        assert r["r"] == "2"
        assert r["m"] == "ABC"

    def test_apply_literal_id_is_eval_error(self):
        rows = sparql_select(_store([4]), PRE + """
            SELECT ?r WHERE { ?s <http://ex/v> ?o .
              BIND(fn:apply("nope", ?o) AS ?r) }""").take_all()
        assert rows[0]["r"] is None

    def test_apply_variable_id_rejects(self):
        with pytest.raises(RDFParseError):
            sparql_select(_store([4]), PRE + """
                SELECT ?r WHERE { ?s <http://ex/v> ?o .
                  BIND(fn:apply(?o, 1) AS ?r) }""")


@pytest.mark.usefixtures("ray_session")
def test_unknown_fn_rejects():
    with pytest.raises(RDFParseError):
        sparql_select(_store(["x"]), PRE + """
            SELECT ?r WHERE { ?s <http://ex/v> ?o .
              BIND(fn:collation-key("a") AS ?r) }""")


@pytest.mark.usefixtures("ray_session")
class TestFormatNumber:
    """fn:format-number — the reference's own golden cases
    (TestFnFunctionsFormat.java:53-67 formatNumber_01..15; Java
    DecimalFormat semantics via XSDFuncOp.java:1757 formatNumber)."""

    CASES = [
        ("fn:format-number(0, '#')", "0"),
        ("fn:format-number(1234, '#')", "1234"),
        ("fn:format-number(1234, '#,###')", "1,234"),
        ("fn:format-number(1e3, '#,###,###.#')", "1,000"),
        ("fn:format-number(10.5, '##.#')", "10.5"),
        ("fn:format-number(-10.5, '##.##')", "-10.5"),
        ("fn:format-number(123, 'NotAPattern')", "NotAPattern123"),
        ("fn:format-number(0, '#', 'fr')", "0"),
        ("fn:format-number(1234.5, '#,###.#', 'fr')", "1 234,5"),
        ("fn:format-number(1234.5, '#,###.#', 'de')", "1.234,5"),
        ("fn:format-number(12, '0,000.0', 'en')", "0,012.0"),
        ("fn:format-number(0, '00,000', 'fr')", "00 000"),
    ]

    @pytest.mark.parametrize("expr,want", CASES)
    def test_reference_goldens(self, expr, want):
        r = _one("SELECT ?r WHERE { ?s <http://ex/v> ?o . "
                 f"BIND({expr} AS ?r) }}")
        assert r["r"] == want

    def test_var_value_and_percent(self):
        rows = sparql_select(_store([0.07, 1234567]), PRE + """
            SELECT ?p ?g WHERE { ?s <http://ex/v> ?o .
              BIND(fn:format-number(?o, '0.0%') AS ?p)
              BIND(fn:format-number(?o, '#,##0') AS ?g) }""").take_all()
        by_g = sorted(rows, key=lambda r: r["g"])
        assert by_g[0]["p"] == "7.0%"
        assert by_g[1]["g"] == "1,234,567"

    def test_negative_subpattern(self):
        r = _one("""SELECT ?r WHERE { ?s <http://ex/v> ?o .
            BIND(fn:format-number(-3, '#;(#)') AS ?r) }""")
        assert r["r"] == "(3)"

    def test_non_number_is_eval_error(self):
        # formatNumber_20: a string value raises ExprEvalException per
        # solution → the BIND leaves ?r unbound
        rows = sparql_select(_store(["String"]), PRE + """
            SELECT ?r WHERE { ?s <http://ex/v> ?o .
              BIND(fn:format-number(?o, '#') AS ?r) }""").take_all()
        assert rows[0]["r"] is None

    def test_bad_picture_is_eval_error(self):
        # formatNumber_21: a non-string picture is a runtime error
        rows = sparql_select(_store([1]), PRE + """
            SELECT ?r WHERE { ?s <http://ex/v> ?o .
              BIND(fn:format-number(123, <http://ex/uri>) AS ?r) }
            """).take_all()
        assert rows[0]["r"] is None
