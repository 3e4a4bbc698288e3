"""Shared terminal productions for the N-Triples / Turtle grammars.

Regex realizations of the W3C RDF 1.1 terminal rules, matching the
reference tokenizer's accept set (jena-arq/.../riot/tokens/TokenizerText.java,
token kinds tokens/TokenType.java:24-56). These are the building blocks for
both the line-oriented N-Triples parser and the recursive-descent Turtle
parser.
"""

from __future__ import annotations

import re

# --- character classes (Turtle spec production names) -----------------------

PN_CHARS_BASE = (
    "A-Za-z"
    "\u00C0-\u00D6\u00D8-\u00F6\u00F8-\u02FF"
    "\u0370-\u037D\u037F-\u1FFF\u200C-\u200D"
    "\u2070-\u218F\u2C00-\u2FEF\u3001-\uD7FF"
    "\uF900-\uFDCF\uFDF0-\uFFFD\U00010000-\U000EFFFF"
)
PN_CHARS_U = PN_CHARS_BASE + "_"
PN_CHARS = PN_CHARS_U + "0-9\u00B7\u0300-\u036F\u203F-\u2040-"

# --- terminal regex fragments (as strings, to be composed) ------------------

UCHAR = r"\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8}"

# IRIREF ::= '<' ([^#x00-#x20<>"{}|^`\] | UCHAR)* '>'
IRIREF = r'<(?:[^\x00-\x20<>"{}|^`\\]|' + UCHAR + r")*>"

# BLANK_NODE_LABEL ::= '_:' (PN_CHARS_U|[0-9]) ((PN_CHARS|'.')* PN_CHARS)?
BLANK_NODE_LABEL = (
    "_:[" + PN_CHARS_U + "0-9]" + "(?:[." + PN_CHARS + "]*[" + PN_CHARS + "])?"
)

# STRING_LITERAL_QUOTE ::= '"' ([^#x22#x5C#xA#xD] | ECHAR | UCHAR)* '"'
_ECHAR = r"\\[tbnrf\"'\\]"
STRING_LITERAL_QUOTE = r'"(?:[^"\\\n\r]|' + _ECHAR + "|" + UCHAR + r')*"'
STRING_LITERAL_SINGLE_QUOTE = r"'(?:[^'\\\n\r]|" + _ECHAR + "|" + UCHAR + r")*'"
STRING_LITERAL_LONG_QUOTE = r'"""(?:(?:"|"")?(?:[^"\\]|' + _ECHAR + "|" + UCHAR + r'))*"""'
STRING_LITERAL_LONG_SINGLE_QUOTE = (
    r"'''(?:(?:'|'')?(?:[^'\\]|" + _ECHAR + "|" + UCHAR + r"))*'''"
)

# LANGTAG ::= '@' [a-zA-Z]{1,8} ('-' [a-zA-Z0-9]{1,8})* ('--'('ltr'|'rtl'))?
# (RDF 1.2 well-formed BCP47 subtag lengths + base-direction suffix;
# Node_Literal.java:52-57)
LANGTAG = r"@[a-zA-Z]{1,8}(?:-[a-zA-Z0-9]{1,8})*(?:--(?:ltr|rtl))?"

# Turtle numeric shorthand
INTEGER = r"[+-]?[0-9]+"
DECIMAL = r"[+-]?[0-9]*\.[0-9]+"
DOUBLE = r"[+-]?(?:[0-9]+\.[0-9]*|\.?[0-9]+)[eE][+-]?[0-9]+"

# Prefixed names (Turtle)
PN_PREFIX = "[" + PN_CHARS_BASE + "](?:[." + PN_CHARS + "]*[" + PN_CHARS + "])?"
PERCENT = "%[0-9A-Fa-f]{2}"
PN_LOCAL_ESC = r"\\[_~.\-!$&'()*+,;=/?#@%]"
PLX = "(?:" + PERCENT + "|" + PN_LOCAL_ESC + ")"
PN_LOCAL = (
    "(?:[" + PN_CHARS_U + ":0-9]|" + PLX + ")"
    "(?:(?:[." + PN_CHARS + ":]|" + PLX + ")*"
    "(?:[" + PN_CHARS + ":]|" + PLX + "))?"
)
PNAME_NS = "(?:" + PN_PREFIX + ")?:"
PNAME_LN = PNAME_NS + PN_LOCAL

# --- compiled full-token patterns ------------------------------------------

RE_IRIREF = re.compile(IRIREF)
RE_BNODE = re.compile(BLANK_NODE_LABEL)
RE_LANGTAG = re.compile(LANGTAG)
RE_STRING = re.compile(STRING_LITERAL_QUOTE)
RE_INTEGER = re.compile(INTEGER + r"\Z")
RE_DECIMAL = re.compile(DECIMAL + r"\Z")
RE_DOUBLE = re.compile(DOUBLE + r"\Z")


def is_valid_lone_surrogate_free(s: str) -> bool:
    """True when the string contains no surrogate codepoints (D800-DFFF)."""
    return not any(0xD800 <= ord(c) <= 0xDFFF for c in s)
