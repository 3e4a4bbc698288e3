"""String / IRI escape handling for N-Triples and Turtle.

Semantics follow the reference's escape processing
(jena-arq/.../atlas/lib/EscapeStr.java, riot/out/quoted/QuotedStringOutputNT.java)
and the W3C N-Triples / Turtle grammars:

- ECHAR:    \\t \\b \\n \\r \\f \\" \\' \\\\
- UCHAR:    \\uXXXX and \\UXXXXXXXX (allowed in strings and IRIREFs)
"""

from __future__ import annotations

import re

from ..model import RDFParseError

_ECHAR = {
    "t": "\t",
    "b": "\b",
    "n": "\n",
    "r": "\r",
    "f": "\f",
    '"': '"',
    "'": "'",
    "\\": "\\",
}

_ESC_RE = re.compile(r"\\(?:u([0-9A-Fa-f]{4})|U([0-9A-Fa-f]{8})|(.))", re.S)


def _chr_checked(cp: int) -> str:
    if cp > 0x10FFFF:
        raise RDFParseError(f"codepoint out of range: {cp:#x}")
    if 0xD800 <= cp <= 0xDFFF:
        # lone surrogates are not RDF strings/IRIs
        # (W3C turtle-syntax-bad-numeric-escape-*)
        raise RDFParseError(f"surrogate codepoint escape: {cp:#x}")
    return chr(cp)


def unescape_string(s: str) -> str:
    """Resolve ECHAR + UCHAR escapes in a quoted string body."""
    if "\\" not in s:
        return s

    def sub(m: re.Match) -> str:
        if m.group(1) is not None:
            return _chr_checked(int(m.group(1), 16))
        if m.group(2) is not None:
            return _chr_checked(int(m.group(2), 16))
        c = m.group(3)
        if c not in _ECHAR:
            raise RDFParseError(f"illegal escape sequence \\{c}")
        return _ECHAR[c]

    # the token regex guarantees escape well-formedness; \u005c (an
    # escaped backslash) is a legal final character (RDF 1.2 c14n suite)
    return _ESC_RE.sub(sub, s)


def unescape_iri(s: str) -> str:
    """IRIREF bodies allow only UCHAR escapes (no ECHAR)."""
    if "\\" not in s:
        return s

    def sub(m: re.Match) -> str:
        if m.group(1) is not None:
            return _chr_checked(int(m.group(1), 16))
        if m.group(2) is not None:
            return _chr_checked(int(m.group(2), 16))
        raise RDFParseError(f"illegal escape in IRI: \\{m.group(3)}")

    return _ESC_RE.sub(sub, s)


# --- serialization ----------------------------------------------------------

# Canonical N-Triples string escaping (NodeFormatterNT → QuotedStringOutputNT:
# escape the quote, backslash, and \n \r \t; other control chars as \u00XX).
_STR_ESC = {
    "\\": "\\\\",
    '"': '\\"',
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
    "\b": "\\b",
    "\f": "\\f",
}
# noncharacters U+FFFE/U+FFFF are \u-escaped too (canonical NT, RDF 1.2 c14n)
_CTRL_RE = re.compile(r'[\x00-\x1f\x7f"\\￾￿]')


def escape_string(s: str) -> str:
    def sub(m: re.Match) -> str:
        c = m.group(0)
        mapped = _STR_ESC.get(c)
        if mapped is not None:
            return mapped
        return "\\u%04X" % ord(c)

    return _CTRL_RE.sub(sub, s)


_IRI_BAD_RE = re.compile(r'[\x00-\x20<>"{}|^`\\]')


def escape_iri(s: str) -> str:
    """Escape characters illegal inside <...> via UCHAR (writer-side safety)."""
    return _IRI_BAD_RE.sub(lambda m: "\\u%04X" % ord(m.group(0)), s)
