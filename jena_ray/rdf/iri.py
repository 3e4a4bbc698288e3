"""RFC 3986 IRI reference resolution and syntax-based normalization.

Implements, from the public RFC 3986 spec, the same operations the
reference performs:

- reference resolution (§5.2) — jena-iri3986/.../rfc3986/AlgResolveIRI.java,
  used by ParserProfileStd.internalMakeIRI
  (jena-arq/.../riot/system/ParserProfileStd.java:101-134)
- syntax-based normalization (§6.2.2) — jena-iri3986/.../rfc3986/IRI3986.java:569-664:
  lowercase scheme + host, uppercase %XX then decode unreserved octets,
  remove dot segments, drop default ports (http:80 / https:443), and for
  http(s) an empty path becomes "/".
"""

from __future__ import annotations

import re

_IRI_RE = re.compile(
    r"^(?:(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*):)?"
    r"(?://(?P<authority>[^/?#]*))?"
    r"(?P<path>[^?#]*)"
    r"(?:\?(?P<query>[^#]*))?"
    r"(?:#(?P<fragment>.*))?$",
    re.S,
)


def split_iri(iri: str) -> tuple[str | None, str | None, str, str | None, str | None]:
    m = _IRI_RE.match(iri)
    assert m is not None  # the regex cannot fail
    return (
        m.group("scheme"),
        m.group("authority"),
        m.group("path"),
        m.group("query"),
        m.group("fragment"),
    )


def _merge(base_auth: str | None, base_path: str, ref_path: str) -> str:
    if base_auth is not None and base_path == "":
        return "/" + ref_path
    i = base_path.rfind("/")
    if i < 0:
        return ref_path
    return base_path[: i + 1] + ref_path


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    out: list[str] = []
    while path:
        if path.startswith("../"):
            path = path[3:]
        elif path.startswith("./"):
            path = path[2:]
        elif path.startswith("/./"):
            path = "/" + path[3:]
        elif path == "/.":
            path = "/"
        elif path.startswith("/../"):
            path = "/" + path[4:]
            if out:
                out.pop()
        elif path == "/..":
            path = "/"
            if out:
                out.pop()
        elif path in (".", ".."):
            path = ""
        else:
            if path.startswith("/"):
                i = path.find("/", 1)
            else:
                i = path.find("/")
            if i < 0:
                out.append(path)
                path = ""
            else:
                out.append(path[:i])
                path = path[i:]
    return "".join(out)


def _recompose(scheme, authority, path, query, fragment) -> str:
    out = []
    if scheme is not None:
        out.append(scheme + ":")
    if authority is not None:
        out.append("//" + authority)
    out.append(path)
    if query is not None:
        out.append("?" + query)
    if fragment is not None:
        out.append("#" + fragment)
    return "".join(out)


def resolve(base: str, ref: str) -> str:
    """RFC 3986 §5.2.2 transform-references (strict)."""
    r_scheme, r_auth, r_path, r_query, r_frag = split_iri(ref)
    if r_scheme is not None:
        return _recompose(r_scheme, r_auth, remove_dot_segments(r_path), r_query, r_frag)
    b_scheme, b_auth, b_path, b_query, _ = split_iri(base)
    if r_auth is not None:
        return _recompose(b_scheme, r_auth, remove_dot_segments(r_path), r_query, r_frag)
    if r_path == "":
        return _recompose(b_scheme, b_auth, b_path, r_query if r_query is not None else b_query, r_frag)
    if r_path.startswith("/"):
        path = remove_dot_segments(r_path)
    else:
        path = remove_dot_segments(_merge(b_auth, b_path, r_path))
    return _recompose(b_scheme, b_auth, path, r_query, r_frag)


# --- §6.2.2 syntax-based normalization --------------------------------------

_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_PCT_RE = re.compile("%[0-9A-Fa-f]{2}")

_DEFAULT_PORTS = {"http": "80", "https": "443", "ws": "80", "wss": "443"}


def _norm_pct(s: str) -> str:
    """Uppercase %XX hex; decode percent-encoded unreserved characters."""

    def sub(m: re.Match) -> str:
        h = m.group(0)[1:]
        c = chr(int(h, 16))
        if c in _UNRESERVED:
            return c
        return "%" + h.upper()

    return _PCT_RE.sub(sub, s)


_AUTH_RE = re.compile(r"^(?:(?P<userinfo>[^@]*)@)?(?P<host>\[[^\]]*\]|[^:]*)(?::(?P<port>[0-9]*))?$")


def normalize(iri: str) -> str:
    """Syntax-based normalization (IRI3986.java:569-664 semantics)."""
    scheme, authority, path, query, fragment = split_iri(iri)
    if scheme is not None:
        scheme = scheme.lower()
    if authority is not None:
        m = _AUTH_RE.match(authority)
        if m:
            host = _norm_pct(m.group("host")).lower()
            port = m.group("port")
            userinfo = m.group("userinfo")
            if port is not None and (
                port == "" or (scheme and _DEFAULT_PORTS.get(scheme) == port)
            ):
                port = None
            authority = (
                (userinfo + "@" if userinfo is not None else "")
                + host
                + (":" + port if port is not None else "")
            )
        else:
            authority = _norm_pct(authority)
    path = _norm_pct(remove_dot_segments(path))
    if authority is not None and path == "" and scheme in ("http", "https"):
        path = "/"
    if query is not None:
        query = _norm_pct(query)
    if fragment is not None:
        fragment = _norm_pct(fragment)
    return _recompose(scheme, authority, path, query, fragment)


def resolve_and_normalize(base: str, ref: str) -> str:
    return normalize(resolve(base, ref))
