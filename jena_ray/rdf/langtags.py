"""RFC 5646 language-tag canonical casing.

Rules per the reference (jena-langtag/.../langtag/LangTags.java:44,81-125,
applied via riot/process/normalize/StreamCanonicalLangTag.java):

- primary language subtag: lowercase
- 4-letter (script) subtag: Titlecase
- 2-letter (region) subtag and 3-digit region: UPPERCASE
- everything after a singleton (1-char subtag, extensions/private use):
  lowercase verbatim
"""

from __future__ import annotations


def format_langtag(tag: str) -> str:
    if not tag:
        return tag
    # RDF 1.2 base direction suffix ("en--ltr"): normalize dir lowercase,
    # case-fold the language part per RFC 5646
    if "--" in tag:
        lang_part, _, direction = tag.partition("--")
        return format_langtag(lang_part) + "--" + direction.lower()
    subtags = tag.split("-")
    out: list[str] = []
    after_singleton = False
    for i, st in enumerate(subtags):
        if i == 0:
            out.append(st.lower())
            continue
        if after_singleton:
            out.append(st.lower())
            continue
        if len(st) == 1:
            after_singleton = True
            out.append(st.lower())
        elif len(st) == 2:
            out.append(st.upper())
        elif len(st) == 4 and st.isalpha():
            out.append(st[0].upper() + st[1:].lower())
        else:
            out.append(st.lower())
    return "-".join(out)
