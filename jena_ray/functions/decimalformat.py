"""Java DecimalFormat subset for fn:format-number.

The reference evaluates fn:format-number with java.text.DecimalFormat
over a picture string, with symbols drawn from the BCP-47 locale given
as the optional third argument (FN_FormatNumber.java:37-55,
XSDFuncOp.java:1757-1790 formatNumber).  This module reimplements the
DecimalFormat pattern subset those semantics need:

- positive[;negative] subpatterns
- '#' optional digit, '0' required digit, '.' decimal separator,
  ',' grouping separator (size = distance from the LAST ',' to the
  decimal point), '%' (x100) and U+2030 per-mille (x1000) multipliers,
  quoted literal text, arbitrary literal prefix/suffix characters
- HALF_EVEN rounding to the pattern's max fraction digits (the Java
  default RoundingMode)
- negative values without a negative subpattern take minus + positive
  prefix

Locale symbols: a small table covering the root locale plus the
language tags the reference's own tests exercise (en, fr, de — Java 13+
CLDR symbols, TestFnFunctionsFormat.java:44-67); unknown tags fall back
to the root symbols, matching Locale.forLanguageTag's silent fallback.
"""

from __future__ import annotations

from decimal import ROUND_HALF_EVEN, Decimal

__all__ = ["format_number", "DecimalFormatError"]


class DecimalFormatError(ValueError):
    """Malformed picture string (Java: IllegalArgumentException →
    ExprEvalException per solution)."""


# language-subtag → (grouping, decimal, minus, percent, permille)
# Root/en per DecimalFormatSymbols(Locale.ROOT); fr uses the narrow
# no-break space U+202F (CLDR 35+, JDK-8225247); de groups with '.'.
_SYMBOLS = {
    "": (",", ".", "-", "%", "‰"),
    "en": (",", ".", "-", "%", "‰"),
    "fr": (" ", ",", "-", "%", "‰"),
    "de": (".", ",", "-", "%", "‰"),
    "it": (".", ",", "-", "%", "‰"),
    "es": (".", ",", "-", "%", "‰"),
}

_SPECIAL = set("0#.,%‰")


def _split_subpatterns(pattern: str) -> tuple[str, str | None]:
    """Split on the first ';' outside quoted text."""
    inq = False
    for i, ch in enumerate(pattern):
        if ch == "'":
            inq = not inq
        elif ch == ";" and not inq:
            return pattern[:i], pattern[i + 1:]
    return pattern, None


def _scan_affixes(sub: str):
    """Return (prefix_src, core, suffix_src): core is the maximal span
    from the first to the last unquoted pattern-special character."""
    spans = []
    inq = False
    for i, ch in enumerate(sub):
        if ch == "'":
            inq = not inq
        elif not inq and ch in "0#.,":
            spans.append(i)
    if not spans:
        return sub, "", ""
    return sub[:spans[0]], sub[spans[0]:spans[-1] + 1], sub[spans[-1] + 1:]


def _literal(affix: str, syms) -> tuple[str, int]:
    """Resolve an affix's quoted text and %/per-mille symbols.
    Returns (text, multiplier-contributed)."""
    out = []
    mult = 1
    i = 0
    while i < len(affix):
        ch = affix[i]
        if ch == "'":
            j = affix.find("'", i + 1)
            if j == i + 1:  # '' = literal quote
                out.append("'")
                i = j + 1
                continue
            if j < 0:
                raise DecimalFormatError(f"unterminated quote: {affix!r}")
            out.append(affix[i + 1:j])
            i = j + 1
            continue
        if ch == "%":
            out.append(syms[3])
            mult = 100
        elif ch == "‰":
            out.append(syms[4])
            mult = 1000
        else:
            out.append(ch)
        i += 1
    return "".join(out), mult


class _Pattern:
    __slots__ = ("pos_prefix", "pos_suffix", "neg_prefix", "neg_suffix",
                 "min_int", "min_frac", "max_frac", "group", "mult")

    def __init__(self, pattern: str, syms):
        pos, neg = _split_subpatterns(pattern)
        pre_src, core, suf_src = _scan_affixes(pos)
        self.pos_prefix, m1 = _literal(pre_src, syms)
        self.pos_suffix, m2 = _literal(suf_src, syms)
        self.mult = m1 if m1 != 1 else m2

        dot = core.find(".")
        int_part = core if dot < 0 else core[:dot]
        frac_part = "" if dot < 0 else core[dot + 1:]
        if "." in frac_part:
            raise DecimalFormatError(f"two decimal points: {pattern!r}")
        self.min_int = int_part.count("0")
        last_comma = int_part.rfind(",")
        digits_after = int_part[last_comma + 1:].replace(",", "")
        self.group = len(digits_after) if last_comma >= 0 else 0
        self.min_frac = frac_part.count("0")
        self.max_frac = self.min_frac + frac_part.count("#")
        # a bare literal pattern still formats the number (DecimalFormat
        # "NotAPattern".format(123) == "NotAPattern123")
        if not core:
            self.min_int = 1

        if neg is not None:
            npre, ncore, nsuf = _scan_affixes(neg)
            self.neg_prefix = _literal(npre, syms)[0]
            self.neg_suffix = _literal(nsuf, syms)[0]
        else:
            self.neg_prefix = syms[2] + self.pos_prefix
            self.neg_suffix = self.pos_suffix


def _format_with(pat: _Pattern, value, syms) -> str:
    if isinstance(value, float):
        dec = Decimal(repr(value))
    else:
        dec = Decimal(value)
    if pat.mult != 1:
        dec *= pat.mult
    neg = dec < 0
    dec = -dec if neg else dec
    q = dec.quantize(Decimal(1).scaleb(-pat.max_frac), rounding=ROUND_HALF_EVEN)
    sign, digits, exp = q.as_tuple()
    lex = "".join(map(str, digits))
    if exp > 0:
        lex += "0" * exp
        exp = 0
    if -exp > len(lex):  # 0.07 → digits (7,), exp -2: pad to "07"
        lex = "0" * (-exp - len(lex)) + lex
    frac = lex[len(lex) + exp:] if exp else ""
    ints = lex[:len(lex) + exp] if exp else lex
    ints = ints.lstrip("0")
    if len(ints) < pat.min_int:
        ints = "0" * (pat.min_int - len(ints)) + ints
    if pat.group > 0 and len(ints) > pat.group:
        parts = []
        i = len(ints)
        while i > pat.group:
            parts.append(ints[i - pat.group:i])
            i -= pat.group
        parts.append(ints[:i])
        ints = syms[0].join(reversed(parts))
    frac = frac.rstrip("0")
    if len(frac) < pat.min_frac:
        frac += "0" * (pat.min_frac - len(frac))
    # Java subformat: "If there is no fraction present, and we haven't
    # printed any integer digits, then print a zero" — '#' of 0 is "0"
    # while '#.#' of 0.5 stays ".5"
    if not ints and not frac:
        ints = "0"
    body = ints + (syms[1] + frac if frac else "")
    if neg:
        return pat.neg_prefix + body + pat.neg_suffix
    return pat.pos_prefix + body + pat.pos_suffix


def format_number(value, pattern: str, locale: str | None = None) -> str:
    """fn:format-number(value, picture[, locale]) — value is an int,
    float, or Decimal; the locale is a BCP-47 tag (language subtag
    selects the symbol set; unknown → root)."""
    lang = (locale or "").split("-")[0].split("_")[0].lower()
    syms = _SYMBOLS.get(lang, _SYMBOLS[""])
    return _format_with(_Pattern(pattern, syms), value, syms)
