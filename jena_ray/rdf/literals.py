"""XSD literal canonicalization — the reference's "General"/TTL policy.

Parity map (see SURVEY.md §2.3):
- policy table: riot/process/normalize/NormalizeRDFTerms.java:56-130 (General)
- per-datatype rewriters: riot/process/normalize/NormalizeValue.java
    * boolean: "1"→"true", "0"→"false"
    * integer family: strip "+", leading zeros (BigInteger.toString)
    * decimal (TTL): stripTrailingZeros, plain string, ensure a "." (".0")
    * double (TTL): Java Double.toString + "e0" when no exponent
      (sparql/util/XSDNumUtils.java:101-117); INF/-INF/NaN preserved
    * float (TTL): Java Float.toString (no added exponent)
    * dateTime/time/date: strip trailing zeros of fractional seconds
- lang tags: see langtags.py (RFC 5646 case)

Also provides ``value_key`` — a canonical value-space string used for
value-equality grouping, the analog of ``LiteralLabel.getIndexingValue``
(jena-core/.../graph/impl/LiteralLabel.java:399-408).
"""

from __future__ import annotations

import re
from decimal import Decimal

import numpy as np

from ..model import RDF_LANGSTRING, XSD_NS, XSD_STRING
from .langtags import format_langtag

XSD_INTEGER_TYPES = frozenset(
    XSD_NS + t
    for t in (
        "integer", "int", "long", "short", "byte",
        "unsignedInt", "unsignedLong", "unsignedShort", "unsignedByte",
        "nonPositiveInteger", "nonNegativeInteger",
        "positiveInteger", "negativeInteger",
    )
)
XSD_DECIMAL = XSD_NS + "decimal"
XSD_DOUBLE = XSD_NS + "double"
XSD_FLOAT = XSD_NS + "float"
XSD_BOOLEAN = XSD_NS + "boolean"
XSD_DATETIME_TYPES = frozenset(
    XSD_NS + t for t in ("dateTime", "dateTimeStamp", "time")
)

_INT_RE = re.compile(r"^[+-]?[0-9]+$")
_DEC_RE = re.compile(r"^[+-]?(?:[0-9]+\.?[0-9]*|\.[0-9]+)$")
_DBL_RE = re.compile(
    r"^(?:[+-]?(?:[0-9]+(?:\.[0-9]*)?|\.[0-9]+)(?:[eE][+-]?[0-9]+)?|[+-]?INF|NaN)$"
)


def _digits_exp(m: float, *, float32: bool = False) -> tuple[str, int]:
    """Shortest round-trip digits of a positive finite value.

    Returns (digits, point) where plain form = digits with a decimal point
    after ``point`` digits (zero-padded as needed).
    """
    if float32:
        s = np.format_float_scientific(np.float32(m), unique=True, trim="-")
    else:
        s = np.format_float_scientific(m, unique=True, trim="-")
    mant, _, exp = s.partition("e")
    exp10 = int(exp) if exp else 0
    mant = mant.replace(".", "")
    mant = mant.rstrip("0") or "0"
    return mant, exp10 + 1


def _java_float_repr(m: float, *, float32: bool) -> str:
    """Emulates Java Double.toString / Float.toString for positive finite m."""
    if m == 0.0:
        return "0.0"
    digits, point = _digits_exp(m, float32=float32)
    if -3 < point <= 7:
        if point <= 0:
            return "0." + "0" * (-point) + digits
        if point >= len(digits):
            return digits + "0" * (point - len(digits)) + ".0"
        return digits[:point] + "." + digits[point:]
    frac = digits[1:] or "0"
    return digits[0] + "." + frac + "E" + str(point - 1)


def _canon_double(lex: str) -> str:
    if lex in ("INF", "+INF", "inf", "+inf"):
        return "INF"
    if lex in ("-INF", "-inf"):
        return "-INF"
    if lex == "NaN":
        return "NaN"
    try:
        d = float(lex)
    except ValueError:
        return lex  # invalid lexical form: leave untouched (reference behavior)
    sign = "-" if (d < 0 or (d == 0 and lex.lstrip("+").startswith("-"))) else ""
    body = _java_float_repr(abs(d), float32=False)
    out = sign + body
    if "E" not in out and "e" not in out:
        out += "e0"  # XSDNumUtils.stringForm(double):111-116
    return out


def _canon_float(lex: str) -> str:
    if lex in ("INF", "+INF", "inf", "+inf"):
        return "INF"
    if lex in ("-INF", "-inf"):
        return "-INF"
    if lex == "NaN":
        return "NaN"
    try:
        f = float(np.float32(lex))
    except ValueError:
        return lex
    sign = "-" if (f < 0 or (f == 0 and lex.lstrip("+").startswith("-"))) else ""
    return sign + _java_float_repr(abs(f), float32=True)


def _canon_integer(lex: str) -> str:
    if not _INT_RE.match(lex):
        return lex
    return str(int(lex))


def _canon_decimal(lex: str) -> str:
    if not _DEC_RE.match(lex):
        return lex
    d = Decimal(lex).normalize()  # stripTrailingZeros
    if d == 0:
        d = Decimal(0)  # BigDecimal has no negative zero
    s = format(d, "f")  # toPlainString (no exponent)
    if "." not in s:
        s += ".0"  # dtDecimalTTL: Turtle short form needs the "."
    return s


_FRACSEC_RE = re.compile(r"(:[0-9]{2})\.([0-9]*?)0*(?=[+\-Z]|$)")


def _canon_datetime(lex: str) -> str:
    # NormalizeValue.dtAnyDateTime: strip trailing zeros in fractional seconds;
    # drop the '.' entirely if all-zero fraction.
    if "." not in lex:
        return lex

    def sub(m: re.Match) -> str:
        frac = m.group(2)
        return m.group(1) + ("." + frac if frac else "")

    return _FRACSEC_RE.sub(sub, lex)


def canonical_lexical(lex: str, datatype: str) -> str:
    """Canonicalize one literal's lexical form per the General policy."""
    if datatype == XSD_BOOLEAN:
        if lex == "1":
            return "true"
        if lex == "0":
            return "false"
        return lex
    if datatype in XSD_INTEGER_TYPES:
        return _canon_integer(lex)
    if datatype == XSD_DECIMAL:
        return _canon_decimal(lex)
    if datatype == XSD_DOUBLE:
        return _canon_double(lex)
    if datatype == XSD_FLOAT:
        return _canon_float(lex)
    if datatype in XSD_DATETIME_TYPES or datatype == XSD_NS + "date":
        return _canon_datetime(lex)
    return lex


def canonicalize_literal(lex: str, datatype: str, lang: str) -> tuple[str, str, str]:
    """(lex, datatype, lang) → canonical (lex, datatype, lang)."""
    if lang:
        return lex, RDF_LANGSTRING, format_langtag(lang)
    if datatype in ("", XSD_STRING):
        return lex, XSD_STRING, ""
    return canonical_lexical(lex, datatype), datatype, ""


def value_key(lex: str, datatype: str, lang: str) -> str:
    """Canonical value-space key for value-equality grouping
    (LiteralLabel.getIndexingValue analog): numeric types collapse to one
    number space, e.g. "01"^^xsd:int and "1.0"^^xsd:decimal → 'num:1'."""
    if lang:
        return f"lang:{format_langtag(lang)}:{lex}"
    if datatype in ("", XSD_STRING):
        return f"str:{lex}"
    if datatype in XSD_INTEGER_TYPES or datatype == XSD_DECIMAL:
        try:
            d = Decimal(lex)
            return "num:" + format(d.normalize(), "f")
        except Exception:
            return f"lex:{datatype}:{lex}"
    if datatype in (XSD_DOUBLE, XSD_FLOAT):
        try:
            v = float(np.float32(lex)) if datatype == XSD_FLOAT else float(lex)
            if v != v or v in (float("inf"), float("-inf")):
                return f"num:{v}"
            d = Decimal(repr(v))
            return "num:" + format(d.normalize(), "f")
        except Exception:
            return f"lex:{datatype}:{lex}"
    if datatype == XSD_BOOLEAN:
        return "bool:" + ("true" if lex in ("true", "1") else "false")
    return f"lex:{datatype}:{canonical_lexical(lex, datatype)}"
