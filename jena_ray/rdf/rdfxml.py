"""RDF/XML parser on xml.sax.

Parity target: the reference's RRX parsers (jena-arq/.../riot/lang/rdfxml/,
SURVEY §2.1 "RDF/XML parsers"). Implements the RDF/XML 1.1 syntax:

- node elements (rdf:Description + typed), rdf:about / rdf:ID / rdf:nodeID
- property elements: rdf:resource / rdf:nodeID / rdf:datatype / xml:lang,
  text literals, nested node elements
- parseType="Resource" / "Literal" (rdf:XMLLiteral) / "Collection"
- property attributes (on node and empty property elements)
- rdf:li container expansion (rdf:_1, rdf:_2, …)
- xml:base / xml:lang scoping, rdf:ID → base#id, reification via rdf:ID
  on property elements

Like the other parsers, one call parses one document; bnode labels are
local ("!aN" / given nodeIDs) and hashed by the caller's BNodeScope.
"""

from __future__ import annotations

import re
import xml.sax
import xml.sax.handler
from io import StringIO

from ..model import (
    KIND_BNODE,
    KIND_IRI,
    KIND_LITERAL,
    RDF_FIRST,
    RDF_NIL,
    RDF_NS,
    RDF_REST,
    RDF_TYPE,
    XSD_STRING,
    RDF_LANGSTRING,
    RDFParseError,
)
from .iri import resolve

RDF_XMLLITERAL = RDF_NS + "XMLLiteral"

_SYNTAX_ATTRS = {"about", "ID", "nodeID", "resource", "datatype", "parseType",
                 "version", "annotation", "annotationNodeID"}
ITS_NS = "http://www.w3.org/2005/11/its"
_BANNED_NODE_ELEMS = {"RDF", "ID", "about", "bagID", "parseType", "resource",
                      "nodeID", "li", "aboutEach", "aboutEachPrefix"}
_BANNED_PROP_ELEMS = {"RDF", "ID", "about", "bagID", "parseType", "resource",
                      "nodeID", "Description", "aboutEach", "aboutEachPrefix"}
_NCNAME_RE = re.compile(r"^[A-Za-z_À-￿][\w.\-·̀-ͯ]*$")

# attributes abolished in RDF 1.1 / never legal as attributes
_FORBIDDEN_ATTRS = {"aboutEach", "aboutEachPrefix", "bagID", "li",
                    "Description", "RDF"}


def _check_forbidden_attrs(adict):
    for (ns, local) in adict:
        if ns == RDF_NS and local in _FORBIDDEN_ATTRS:
            raise RDFParseError(f"rdf:{local} is not allowed as an attribute")


def _ncname_ok(v: str) -> bool:
    import unicodedata

    if not v:
        return False
    c0 = v[0]
    if not (c0 == "_" or unicodedata.category(c0).startswith("L")):
        return False
    return bool(_NCNAME_RE.match(v)) and ":" not in v


class _Frame:
    __slots__ = ("mode", "subject", "pred", "base", "lang", "li_counter",
                 "text", "xml_depth", "xml_buf", "collection", "reify",
                 "datatype", "obj_seen", "empty_prop_attrs", "dir",
                 "version12", "tt_capture", "tt_ignore", "annotate")

    def __init__(self, mode, base, lang, dir_="", version12=False):
        self.mode = mode  # "top" | "node" | "prop" | "xmllit"
        self.subject = None
        self.pred = None
        self.base = base
        self.lang = lang
        self.li_counter = 0
        self.text = []
        self.xml_depth = 0
        self.xml_buf = None
        self.collection = None  # list of object terms for parseType=Collection
        self.reify = None
        self.datatype = None
        self.obj_seen = False
        self.empty_prop_attrs = None
        self.dir = dir_
        self.version12 = version12
        self.tt_capture = None
        self.tt_ignore = False
        self.annotate = None


class _Handler(xml.sax.handler.ContentHandler):
    def __init__(self, base: str):
        super().__init__()
        self.out: list[tuple] = []
        self.stack: list[_Frame] = [_Frame("top", base, "")]
        self.anon = 0
        self.seen_ids: set[str] = set()
        self.ns_decls: list[tuple[str | None, str]] = []  # declaration order

    def startPrefixMapping(self, prefix, uri):
        self.ns_decls.append((prefix, uri))

    def endPrefixMapping(self, prefix):
        for i in range(len(self.ns_decls) - 1, -1, -1):
            if self.ns_decls[i][0] == prefix:
                del self.ns_decls[i]
                break

    def _qname(self, name, given):
        """Python's expat never supplies qnames in namespace mode —
        reconstruct from the in-scope declarations."""
        if given:
            return given
        ns, local = name
        if ns is None:
            return local
        for pfx, uri in reversed(self.ns_decls):
            if uri == ns:
                return f"{pfx}:{local}" if pfx else local
        return local

    # --- helpers ----------------------------------------------------------

    def _fresh(self) -> str:
        self.anon += 1
        return f"!a{self.anon}"

    def _emit(self, s, p, o):
        self.out.append((s[0], s[1], p, o[0], o[1], o[2], o[3], ""))

    def _resolve(self, base, ref):
        if ref == "":
            # same-document reference: base without fragment
            return base.split("#", 1)[0]
        return resolve(base, ref) if base else ref

    def _id_iri(self, base, id_val):
        if not _ncname_ok(id_val):
            raise RDFParseError(f"bad rdf:ID value: {id_val!r}")
        key = (base, id_val)
        if key in self.seen_ids:
            raise RDFParseError(f"duplicate rdf:ID: {id_val!r}")
        self.seen_ids.add(key)
        return self._resolve(base, "#" + id_val)

    def _node_subject(self, attrs, base):
        about = attrs.get((RDF_NS, "about"))
        rid = attrs.get((RDF_NS, "ID"))
        nodeid = attrs.get((RDF_NS, "nodeID"))
        given = sum(x is not None for x in (about, rid, nodeid))
        if given > 1:
            raise RDFParseError("more than one of rdf:about/ID/nodeID")
        if about is not None:
            return (KIND_IRI, self._resolve(base, about))
        if rid is not None:
            return (KIND_IRI, self._id_iri(base, rid))
        if nodeid is not None:
            if not _ncname_ok(nodeid):
                raise RDFParseError(f"bad rdf:nodeID: {nodeid!r}")
            return (KIND_BNODE, nodeid)
        return (KIND_BNODE, self._fresh())

    @staticmethod
    def _scoped(attrs, frame):
        base = frame.base
        lang = frame.lang
        dir_ = frame.dir
        version12 = frame.version12
        for (ns, local), v in attrs.items():
            if ns == "http://www.w3.org/XML/1998/namespace":
                if local == "base":
                    base = v.split("#", 1)[0]
                elif local == "lang":
                    lang = v
            elif ns == ITS_NS and local == "dir":
                dir_ = v
            elif ns == RDF_NS and local == "version":
                version12 = v.startswith("1.2")
            elif ns is None and local == "xml:base":
                base = v
            elif ns is None and local == "xml:lang":
                lang = v
        return base, lang, dir_, version12

    def _prop_attrs(self, attrs):
        """Non-syntax attributes → (property IRI, literal value) pairs,
        plus rdf:type attr → type triple."""
        out = []
        for (ns, local), v in attrs.items():
            if ns in (None, "http://www.w3.org/XML/1998/namespace", ITS_NS,
                      "http://www.w3.org/2000/xmlns/"):
                continue
            if ns == RDF_NS:
                if local in _SYNTAX_ATTRS or local in ("RDF", "Description",
                                                       "aboutEach", "aboutEachPrefix",
                                                       "bagID", "li"):
                    continue
                out.append((RDF_NS + local, v))
            else:
                out.append((ns + local, v))
        return out

    # --- SAX events -------------------------------------------------------

    def startElementNS(self, name, qname, attrs):
        ns, local = name
        top = self.stack[-1]

        if top.mode == "xmllit":
            parts = []
            if top.xml_depth == 0:
                # top-level literal elements carry the in-scope namespace
                # declarations, in document declaration order (Jena's
                # XML-literal canonical form; xml-canon-test001/002)
                for pfx, uri in self.ns_decls:
                    if pfx:
                        parts.append(f'xmlns:{pfx}="{uri}"')
                    elif uri:
                        parts.append(f'xmlns="{uri}"')
            top.xml_depth += 1
            def _attr_qname(k):
                try:
                    return attrs.getQNameByName(k)
                except Exception:
                    return self._qname(k, None)

            pairs = sorted((_attr_qname(k), attrs[k]) for k in attrs.getNames())
            parts.extend(f'{q}="{v}"' for q, v in pairs if not q.startswith("xmlns"))
            attl = " ".join(parts)
            tag = self._qname(name, qname)
            top.xml_buf.write(f"<{tag}{(' ' + attl) if attl else ''}>")
            return

        adict = {k: attrs[k] for k in attrs.getNames()}
        base, lang, dir_, v12 = self._scoped(adict, top)

        if top.mode == "top":
            if ns == RDF_NS and local == "RDF":
                self.stack.append(_Frame("rdfroot", base, lang, dir_, v12))
                return
            # rdf:RDF is optional: a bare node element is allowed
            self._start_node_element(ns, local, adict, base, lang, dir_, v12)
            return

        if top.mode in ("rdfroot",):
            self._start_node_element(ns, local, adict, base, lang, dir_, v12)
            return

        if top.mode == "node":
            self._start_property_element(ns, local, adict, base, lang, dir_, v12)
            return

        if top.mode == "prop":
            # nested node element = the object
            if top.tt_capture is not None:
                # parseType="Triple": the child node element is captured,
                # not linked (its triples become the triple term)
                self._start_node_element(ns, local, adict, base, lang, dir_, v12)
                return
            if top.collection is not None:
                f = self._start_node_element(ns, local, adict, base, lang, dir_, v12)
                top.collection.append((f.subject[0], f.subject[1], "", ""))
            else:
                if top.obj_seen:
                    raise RDFParseError("multiple node elements inside one property")
                f = self._start_node_element(ns, local, adict, base, lang, dir_, v12)
                top.obj_seen = True
                obj = (f.subject[0], f.subject[1], "", "")
                self._emit_prop(top, obj)
            return

        raise RDFParseError(f"unexpected element {local!r}")

    @staticmethod
    def _langtag(lang, dir_, v12):
        """Effective literal language tag: dir applies only with a lang
        and under rdf:version 1.2 (rdf12-xml-dir-01/02/06)."""
        if lang and dir_ and v12:
            return lang + "--" + dir_
        return lang

    def _start_node_element(self, ns, local, adict, base, lang, dir_="", v12=False):
        _check_forbidden_attrs(adict)
        if ns == RDF_NS and local in _BANNED_NODE_ELEMS:
            raise RDFParseError(f"rdf:{local} is not a node element")
        f = _Frame("node", base, lang, dir_, v12)
        f.subject = self._node_subject(adict, base)
        if not (ns == RDF_NS and local == "Description"):
            if ns is None:
                raise RDFParseError(f"unqualified node element {local!r}")
            self._emit(f.subject, RDF_TYPE, (KIND_IRI, ns + local, "", ""))
        eff = self._langtag(lang, dir_, v12)
        for p, v in self._prop_attrs(adict):
            if p == RDF_TYPE:
                self._emit(f.subject, RDF_TYPE, (KIND_IRI, self._resolve(base, v), "", ""))
            else:
                dt = RDF_LANGSTRING if eff else XSD_STRING
                self._emit(f.subject, p, (KIND_LITERAL, v, dt, eff))
        self.stack.append(f)
        return f

    def _start_property_element(self, ns, local, adict, base, lang, dir_="", v12=False):
        _check_forbidden_attrs(adict)
        top = self.stack[-1]
        if ns == RDF_NS:
            if local in _BANNED_PROP_ELEMS:
                raise RDFParseError(f"rdf:{local} is not a property element")
            if local == "li":
                top.li_counter += 1
                pred = f"{RDF_NS}_{top.li_counter}"
            else:
                pred = RDF_NS + local
        else:
            if ns is None:
                raise RDFParseError(f"unqualified property element {local!r}")
            pred = ns + local

        f = _Frame("prop", base, lang, dir_, v12)
        f.subject = top.subject
        f.pred = pred

        rid = adict.get((RDF_NS, "ID"))
        if rid is not None:
            f.reify = (KIND_IRI, self._id_iri(base, rid))
        ann = adict.get((RDF_NS, "annotation"))
        ann_nid = adict.get((RDF_NS, "annotationNodeID"))
        if ann is not None and ann_nid is not None:
            raise RDFParseError("both rdf:annotation and rdf:annotationNodeID")
        if ann is not None:
            f.annotate = (KIND_IRI, self._resolve(base, ann))
        elif ann_nid is not None:
            if not _ncname_ok(ann_nid):
                raise RDFParseError(f"bad rdf:annotationNodeID: {ann_nid!r}")
            f.annotate = (KIND_BNODE, ann_nid)

        ptype = adict.get((RDF_NS, "parseType"))
        resource = adict.get((RDF_NS, "resource"))
        nodeid = adict.get((RDF_NS, "nodeID"))
        dt = adict.get((RDF_NS, "datatype"))

        if ptype is not None and (resource is not None or nodeid is not None
                                  or dt is not None):
            raise RDFParseError("rdf:parseType conflicts with resource/nodeID/datatype")

        if ptype == "Triple":
            # RDF 1.2 triple terms — version-gated: without rdf:version
            # "1.2" in scope the whole property is IGNORED (rdf12-xml-tt-01)
            f.tt_capture = len(self.out)
            f.tt_ignore = not v12
            self.stack.append(f)
            return
        if ptype == "Resource":
            # the property element ITSELF becomes a node frame whose subject
            # is a fresh bnode; its children are property elements of it
            bn = (KIND_BNODE, self._fresh(), "", "")
            self._emit_prop(f, bn)
            nf = _Frame("node", base, lang)
            nf.subject = (KIND_BNODE, bn[1])
            self.stack.append(nf)
            return
        if ptype == "Literal":
            f.mode = "xmllit"
            f.xml_buf = StringIO()
            f.xml_depth = 0
            self.stack.append(f)
            return
        if ptype == "Collection":
            f.collection = []
            self.stack.append(f)
            return
        if ptype is not None:
            # unknown parseType treated as Literal per spec
            f.mode = "xmllit"
            f.xml_buf = StringIO()
            f.xml_depth = 0
            self.stack.append(f)
            return

        if resource is not None and nodeid is not None:
            raise RDFParseError("both rdf:resource and rdf:nodeID")
        if resource is not None:
            self._emit_prop_direct(f, (KIND_IRI, self._resolve(base, resource), "", ""))
            f.obj_seen = True
        elif nodeid is not None:
            if not _ncname_ok(nodeid):
                raise RDFParseError(f"bad rdf:nodeID: {nodeid!r}")
            self._emit_prop_direct(f, (KIND_BNODE, nodeid, "", ""))
            f.obj_seen = True

        prop_attrs = self._prop_attrs(adict)
        if prop_attrs and dt is None:
            # empty property element with property attributes → bnode object
            if f.obj_seen:
                bn = None  # attrs on resource'd property: apply to that node
                # (rare; the object was already emitted — attach to it)
                obj = self.out[-1][3:7]
                target = (obj[0], obj[1])
            else:
                bn = (KIND_BNODE, self._fresh())
                self._emit_prop_direct(f, (bn[0], bn[1], "", ""))
                f.obj_seen = True
                target = bn
            eff = self._langtag(lang, dir_, v12)
            for p, v in prop_attrs:
                if p == RDF_TYPE:
                    self._emit(target, RDF_TYPE, (KIND_IRI, self._resolve(base, v), "", ""))
                else:
                    adt = RDF_LANGSTRING if eff else XSD_STRING
                    self._emit(target, p, (KIND_LITERAL, v, adt, eff))
        f.datatype = dt
        self.stack.append(f)

    def _emit_prop(self, f: _Frame, obj):
        self._emit(f.subject, f.pred, obj)
        if f.reify is not None:
            st = f.reify
            self._emit(st, RDF_TYPE, (KIND_IRI, RDF_NS + "Statement", "", ""))
            self._emit(st, RDF_NS + "subject", (f.subject[0], f.subject[1], "", ""))
            self._emit(st, RDF_NS + "predicate", (KIND_IRI, f.pred, "", ""))
            self._emit(st, RDF_NS + "object", obj)
            f.reify = None
        if f.annotate is not None:
            from ..model import KIND_TRIPLE_TERM
            from .ntriples import format_term_raw

            inner = " ".join(
                [format_term_raw(f.subject[0], f.subject[1]),
                 format_term_raw(KIND_IRI, f.pred),
                 format_term_raw(*obj)]
            )
            self._emit(f.annotate, RDF_NS + "reifies",
                       (KIND_TRIPLE_TERM, inner, "", ""))
            f.annotate = None

    _emit_prop_direct = _emit_prop

    def characters(self, content):
        top = self.stack[-1]
        if top.mode == "xmllit":
            top.xml_buf.write(
                content.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
            )
        elif top.mode == "prop":
            top.text.append(content)
        elif top.mode in ("node", "rdfroot", "top"):
            if content.strip():
                raise RDFParseError(f"unexpected text content: {content.strip()[:30]!r}")

    def endElementNS(self, name, qname):
        top = self.stack[-1]
        if top.mode == "xmllit":
            if top.xml_depth > 0:
                top.xml_buf.write(f"</{self._qname(name, qname)}>")
                top.xml_depth -= 1
                return
            # property element itself closes: emit XML literal
            self.stack.pop()
            self._emit_prop(
                top, (KIND_LITERAL, top.xml_buf.getvalue(), RDF_XMLLITERAL, "")
            )
            return

        self.stack.pop()
        if top.mode == "node":
            return
        if top.mode == "prop":
            if top.tt_capture is not None:
                captured = self.out[top.tt_capture:]
                del self.out[top.tt_capture:]
                if top.tt_ignore:
                    return  # 1.1 mode: parseType=Triple subtree dropped
                if len(captured) != 1:
                    raise RDFParseError(
                        f"parseType='Triple' needs exactly one inner triple, got {len(captured)}"
                    )
                from ..model import KIND_TRIPLE_TERM
                from .ntriples import format_term_raw

                (s_k, s_l, p, o_k, o_l, o_d, o_g, _) = captured[0]
                inner = " ".join(
                    [format_term_raw(s_k, s_l), format_term_raw(KIND_IRI, p),
                     format_term_raw(o_k, o_l, o_d, o_g)]
                )
                self._emit_prop(top, (KIND_TRIPLE_TERM, inner, "", ""))
                return
            if top.collection is not None:
                # build the rdf list
                cells = [self._fresh() for _ in top.collection]
                if not cells:
                    self._emit_prop(top, (KIND_IRI, RDF_NIL, "", ""))
                else:
                    self._emit_prop(top, (KIND_BNODE, cells[0], "", ""))
                    for i, obj in enumerate(top.collection):
                        cell = (KIND_BNODE, cells[i])
                        self._emit(cell, RDF_FIRST, obj)
                        nxt = (KIND_BNODE, cells[i + 1], "", "") if i + 1 < len(cells) \
                            else (KIND_IRI, RDF_NIL, "", "")
                        self._emit(cell, RDF_REST, nxt)
                return
            if not top.obj_seen:
                text = "".join(top.text)
                eff = self._langtag(top.lang, top.dir, top.version12)
                if top.datatype is not None:
                    self._emit_prop(top, (KIND_LITERAL, text, top.datatype, ""))
                elif eff:
                    self._emit_prop(top, (KIND_LITERAL, text, RDF_LANGSTRING, eff))
                else:
                    self._emit_prop(top, (KIND_LITERAL, text, XSD_STRING, ""))
            return


def parse_rdfxml(text: str, base: str = "", on_error: str = "raise") -> list[tuple]:
    """Parse one RDF/XML document → term 8-tuples (g always "")."""
    handler = _Handler(base)
    parser = xml.sax.make_parser()
    parser.setFeature(xml.sax.handler.feature_namespaces, True)
    try:
        parser.setFeature(xml.sax.handler.feature_namespace_prefixes, True)
    except Exception:
        pass  # qnames fall back to None; XML literals lose prefixes
    parser.setContentHandler(handler)
    parser.setErrorHandler(xml.sax.handler.ErrorHandler())
    try:
        parser.parse(_Source(text))
    except (xml.sax.SAXException, RDFParseError, ValueError) as e:
        if on_error == "skip":
            return []
        if isinstance(e, RDFParseError):
            raise
        raise RDFParseError(f"RDF/XML parse error: {e}") from None
    return handler.out


def _Source(text: str):
    import io

    return io.BytesIO(text.encode("utf-8"))
