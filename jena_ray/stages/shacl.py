"""SHACL-core validation as a post-materialize stage.

Parity: jena-shacl (ShaclValidator.java:66-72); SURVEY §2.11 maps it to a
"per-focus-node map_groups" validation stage. Implemented subset of SHACL
core, enough for schema-shaped KG QA at scale:

- sh:NodeShape with sh:targetClass / sh:targetNode
- sh:property blocks: sh:path (IRI), sh:minCount, sh:maxCount,
  sh:datatype, sh:nodeKind (sh:IRI / sh:BlankNode / sh:Literal),
  sh:pattern, sh:minInclusive / sh:maxInclusive

Execution shape: the (small) shapes graph is parsed with our own Turtle
parser and broadcast; data triples are hash-grouped by subject so each
focus node's triples are co-located, then validated vectorized-per-group.
Partitioning assumption: constraints are evaluable from the focus node's
OWN triples (no cross-node joins — sh:class would need the object's types
and is not in this subset).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pandas as pd

from ..model import KIND_BNODE, KIND_IRI, KIND_LITERAL, RDF_TYPE
from ..rdf.turtle import parse_turtle

SH = "http://www.w3.org/ns/shacl#"


@dataclass
class PropertyShape:
    path: str
    min_count: int | None = None
    max_count: int | None = None
    datatype: str | None = None
    node_kind: str | None = None
    pattern: str | None = None
    min_inclusive: float | None = None
    max_inclusive: float | None = None


@dataclass
class NodeShape:
    name: str
    target_classes: list[str] = field(default_factory=list)
    target_nodes: list[str] = field(default_factory=list)
    properties: list[PropertyShape] = field(default_factory=list)


def parse_shapes(shapes_ttl: str, base: str = "") -> list[NodeShape]:
    triples = parse_turtle(shapes_ttl, base=base)
    spo: dict[tuple, dict[str, list]] = {}
    for t in triples:
        spo.setdefault((t[0], t[1]), {}).setdefault(t[2], []).append(
            (t[3], t[4])
        )

    def vals(node, p):
        return spo.get(node, {}).get(p, [])

    shapes = []
    for node, props in spo.items():
        if not any(v == SH + "NodeShape" for _, v in props.get(RDF_TYPE, [])):
            continue
        ns = NodeShape(name=node[1])
        ns.target_classes = [v for _, v in vals(node, SH + "targetClass")]
        ns.target_nodes = [v for _, v in vals(node, SH + "targetNode")]
        for pk, pv in vals(node, SH + "property"):
            pnode = (pk, pv)
            paths = vals(pnode, SH + "path")
            if not paths:
                continue
            ps = PropertyShape(path=paths[0][1])
            for key, attr, conv in [
                ("minCount", "min_count", int),
                ("maxCount", "max_count", int),
                ("minInclusive", "min_inclusive", float),
                ("maxInclusive", "max_inclusive", float),
            ]:
                v = vals(pnode, SH + key)
                if v:
                    setattr(ps, attr, conv(v[0][1]))
            v = vals(pnode, SH + "datatype")
            if v:
                ps.datatype = v[0][1]
            v = vals(pnode, SH + "nodeKind")
            if v:
                ps.node_kind = v[0][1]
            v = vals(pnode, SH + "pattern")
            if v:
                ps.pattern = v[0][1]
            ns.properties.append(ps)
        shapes.append(ns)
    return shapes


def _validate_focus(group: pd.DataFrame, shapes: list[NodeShape]):
    """All triples of ONE subject → violation rows."""
    focus = group["s_lex"].iloc[0]
    types = set(group.loc[group["p"] == RDF_TYPE, "o_lex"])
    out = []
    for shape in shapes:
        applies = focus in shape.target_nodes or bool(
            types.intersection(shape.target_classes)
        )
        if not applies:
            continue
        for ps in shape.properties:
            vals = group[group["p"] == ps.path]
            n = len(vals)
            if ps.min_count is not None and n < ps.min_count:
                out.append((focus, ps.path, "minCount",
                            f"{n} < {ps.min_count}"))
            if ps.max_count is not None and n > ps.max_count:
                out.append((focus, ps.path, "maxCount",
                            f"{n} > {ps.max_count}"))
            for _, row in vals.iterrows():
                if ps.node_kind == SH + "IRI" and row["o_kind"] != KIND_IRI:
                    out.append((focus, ps.path, "nodeKind", "not an IRI"))
                if ps.node_kind == SH + "Literal" and row["o_kind"] != KIND_LITERAL:
                    out.append((focus, ps.path, "nodeKind", "not a literal"))
                if ps.node_kind == SH + "BlankNode" and row["o_kind"] != KIND_BNODE:
                    out.append((focus, ps.path, "nodeKind", "not a bnode"))
                if ps.datatype is not None and (
                    row["o_kind"] != KIND_LITERAL or row["o_datatype"] != ps.datatype
                ):
                    out.append((focus, ps.path, "datatype",
                                f"expected {ps.datatype}"))
                if ps.pattern is not None and not re.search(
                    ps.pattern, str(row["o_lex"])
                ):
                    out.append((focus, ps.path, "pattern",
                                f"!~ /{ps.pattern}/"))
                if ps.min_inclusive is not None or ps.max_inclusive is not None:
                    try:
                        x = float(row["o_lex"])
                    except (TypeError, ValueError):
                        out.append((focus, ps.path, "range", "not numeric"))
                        continue
                    if ps.min_inclusive is not None and x < ps.min_inclusive:
                        out.append((focus, ps.path, "minInclusive",
                                    f"{x} < {ps.min_inclusive}"))
                    if ps.max_inclusive is not None and x > ps.max_inclusive:
                        out.append((focus, ps.path, "maxInclusive",
                                    f"{x} > {ps.max_inclusive}"))
    return out


def validate(triples_ds, shapes_ttl: str):
    """Violations Dataset (focus, path, constraint, detail)."""
    import ray

    shapes = parse_shapes(shapes_ttl)
    shapes_ref = ray.put(shapes)

    def check(group: pd.DataFrame) -> pd.DataFrame:
        sh = ray.get(shapes_ref)
        rows = _validate_focus(group, sh)
        return pd.DataFrame(
            rows, columns=["focus", "path", "constraint", "detail"]
        )

    return triples_ds.groupby("s_lex").map_groups(check, batch_format="pandas")
