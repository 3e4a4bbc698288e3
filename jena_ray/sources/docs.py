"""Deterministic interleaved text+media document corpus + analytic golden.

Realizes BASELINE.json's ``input_hint`` shape over the driver-provided
``documents.parquet`` seed table:

    doc_id: string
    spans:  list<struct<kind:string, text:string, media_ref:string, offset:int32>>

Text spans hold Turtle/N-Triples snippets exercising the feature matrix of
FIXTURES.md §F1 (typed/lang literals, prefixes, bnode property lists,
collections, relative + un-normalized IRIs, document-scoped bnode label
reuse, owl:sameAs chains, cross-document duplicate triples, Zipf-skewed
predicates with celebrity subjects). Media spans carry captions with entity
mentions for the linking stage.

Every template also emits its *expected canonical triples* analytically
(hand-written canonical forms — not produced by running our parser), giving
an independent differential oracle for the P/R harness (golden_triples()).

Scaling: ``reps`` replicates each seed row with varied content; generation
itself runs inside ``map_batches`` so the corpus is produced distributed,
never on the driver.
"""

from __future__ import annotations

import hashlib
import random

import pyarrow as pa

from ..model import (
    KIND_BNODE,
    KIND_IRI,
    KIND_LITERAL,
    OWL_SAMEAS,
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    XSD_NS,
    XSD_STRING,
)
from ..rdf.bnodes import BNodeScope

EX = "http://example.org/"
ENT = EX + "e/"
EQ = EX + "eq/"
CLS = EX + "c/"
PRED = EX + "p/"
DOC = EX + "doc/"
SHARED = EX + "shared/"

RUN_SEED = "jena-ray-run-42"

N_ENTITIES = 2000
N_EQ_COMPONENTS = 50

SPAN_SCHEMA = pa.list_(
    pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
)
DOCS_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", SPAN_SCHEMA)])

_ADJ = (
    "amber bold calm deft eager fond grand hazy iron jolly keen lucid merry "
    "noble opal prime quiet rustic solar tidal urban vivid wry young zesty"
).split()
_NOUN = (
    "falcon harbor meadow circuit lantern summit willow canyon beacon orchard "
    "glacier prairie quarry reef savanna tundra valley wharf zephyr atlas"
).split()


def entity_iri(n: int) -> str:
    return f"{ENT}{n:05d}"


def alias_text(n: int) -> str:
    return f"{_ADJ[n % 25]} {_NOUN[n % 20]} {n}"


def build_aliases() -> list[tuple[str, str, float]]:
    """(alias, entity_iri, prior) rows — FIXTURES.md §F2. ~10% ambiguous."""
    rows: list[tuple[str, str, float]] = []
    for n in range(N_ENTITIES):
        rows.append((alias_text(n), entity_iri(n), 1.0))
        if n % 10 == 7:  # ambiguous, clear winner (0.6 >= threshold)
            rows.append((f"pair {n}", entity_iri(n), 0.6))
            rows.append((f"pair {n}", entity_iri((n + 1) % N_ENTITIES), 0.4))
        if n % 25 == 3:  # ambiguous, no winner (all < threshold) → no link
            for j, pr in ((0, 0.4), (1, 0.3), (2, 0.3)):
                rows.append((f"fuzzy {n}", entity_iri((n + j) % N_ENTITIES), pr))
    return rows


def eq_member(c: int, k: int) -> str:
    return f"{EQ}{c}/{k}"


def eq_chain_len(c: int) -> int:
    return 2 + (c * 7) % 15


# --------------------------------------------------------------------------
# Templates. Each returns (turtle_text, expected_triples, sameas_edges,
# mention_aliases). Expected triples are written in canonical form by hand
# (normalized IRIs, canonical literal lexicals, canonical lang case); bnode
# labels come from the shared BNodeScope policy. `anon` is a callable
# replicating the parser's anonymous-label allocation order.
# --------------------------------------------------------------------------


def _t_typed_entity(rng: random.Random, scope: BNodeScope, anon):
    # Zipf-ish skew: rdf:type ~30% of triples, celebrity subjects 20%
    if rng.random() < 0.20:
        n = rng.randrange(10)  # celebrity
    else:
        n = rng.randrange(N_ENTITIES)
    if rng.random() < 0.15:
        c = rng.randrange(N_EQ_COMPONENTS)
        s = eq_member(c, rng.randrange(eq_chain_len(c)))
    else:
        s = entity_iri(n)
    cls = f"{CLS}{min(rng.randrange(1, 20), rng.randrange(1, 20))}"
    p = f"{PRED}p{min(rng.randrange(30), rng.randrange(30))}"
    v = rng.randrange(500)
    text = (
        f"<{s}> <{RDF_TYPE}> <{cls}> .\n"
        f'<{s}> <{p}> "+{v:03d}"^^<{XSD_NS}integer> .\n'
    )
    expected = [
        (KIND_IRI, s, RDF_TYPE, KIND_IRI, cls, "", ""),
        (KIND_IRI, s, p, KIND_LITERAL, str(v), XSD_NS + "integer", ""),
    ]
    return text, expected, [], []


def _t_person_card(rng: random.Random, scope: BNodeScope, anon):
    n = rng.randrange(N_ENTITIES)
    score_i = rng.randrange(100)
    # un-normalized prefix IRI (uppercase host) → normalization folds it
    text = (
        "@prefix e: <http://Example.ORG/e/> .\n"
        f"@prefix p: <{PRED}> .\n"
        f'e:{n:05d} p:name "Name {n}"@EN-us ; p:score {score_i}.50 .\n'
    )
    expected = [
        (KIND_IRI, entity_iri(n), PRED + "name",
         KIND_LITERAL, f"Name {n}", "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString", "en-US"),
        (KIND_IRI, entity_iri(n), PRED + "score",
         KIND_LITERAL, f"{score_i}.5", XSD_NS + "decimal", ""),
    ]
    return text, expected, [], []


def _t_bnode_props(rng: random.Random, scope: BNodeScope, anon):
    name = f"{_ADJ[rng.randrange(25)]} {rng.randrange(1000)}"
    age = rng.randrange(99)
    text = (
        f'_:b0 <{PRED}knows> [ <{PRED}name> "{name}" ] .\n'
        f"_:b0 <{PRED}age> 0{age} .\n"
    )
    b0 = scope.get("b0")
    a1 = anon()
    expected = [
        (KIND_BNODE, b0, PRED + "knows", KIND_BNODE, a1, "", ""),
        (KIND_BNODE, a1, PRED + "name", KIND_LITERAL, name, XSD_STRING, ""),
        (KIND_BNODE, b0, PRED + "age", KIND_LITERAL, str(age), XSD_NS + "integer", ""),
    ]
    return text, expected, [], []


def _t_collection(rng: random.Random, scope: BNodeScope, anon):
    n = rng.randrange(N_ENTITIES)
    s = entity_iri(n)
    x = rng.randrange(50)
    text = f'<{s}> <{PRED}list> ("a{x}" {x} {x}.0e0) .\n'
    # parser allocates the three cells after parsing items (turtle.py _collection)
    c1, c2, c3 = anon(), anon(), anon()
    expected = [
        (KIND_IRI, s, PRED + "list", KIND_BNODE, c1, "", ""),
        (KIND_BNODE, c1, RDF_FIRST, KIND_LITERAL, f"a{x}", XSD_STRING, ""),
        (KIND_BNODE, c1, RDF_REST, KIND_BNODE, c2, "", ""),
        (KIND_BNODE, c2, RDF_FIRST, KIND_LITERAL, str(x), XSD_NS + "integer", ""),
        (KIND_BNODE, c2, RDF_REST, KIND_BNODE, c3, "", ""),
        (KIND_BNODE, c3, RDF_FIRST, KIND_LITERAL, f"{x}.0e0", XSD_NS + "double", ""),
        (KIND_BNODE, c3, RDF_REST, KIND_IRI, RDF_NIL, "", ""),
    ]
    return text, expected, [], []


def _t_sameas(rng: random.Random, scope: BNodeScope, anon):
    c = rng.randrange(N_EQ_COMPONENTS)
    m = eq_chain_len(c)
    start = rng.randrange(m - 1)
    count = min(1 + rng.randrange(3), m - 1 - start)
    text_lines = []
    edges = []
    for k in range(start, start + count):
        text_lines.append(f"<{eq_member(c, k)}> <{OWL_SAMEAS}> <{eq_member(c, k + 1)}> .")
        edges.append((eq_member(c, k), eq_member(c, k + 1)))
    # expected sameAs triples are rewritten post-closure (see golden_triples)
    return "\n".join(text_lines) + "\n", [], edges, []


def _t_messy_iris(rng: random.Random, scope: BNodeScope, anon):
    n = rng.randrange(1000)
    text = f"<rel/x{n}> <{PRED}ref> <HTTP://Ex.org:80/a/../b/%7e{n}> .\n"
    # relative subject resolves against the per-document base (set by caller);
    # the expected value is patched in by make_doc which knows the base.
    expected = [
        (KIND_IRI, f"__BASE__rel/x{n}", PRED + "ref",
         KIND_IRI, f"http://ex.org/b/~{n}", "", ""),
    ]
    return text, expected, [], []


def _t_duplicates(rng: random.Random, scope: BNodeScope, anon):
    j = rng.randrange(10)
    text = f'<{SHARED}s{j}> <{PRED}dup> "{j}" .\n'
    expected = [
        (KIND_IRI, f"{SHARED}s{j}", PRED + "dup", KIND_LITERAL, str(j), XSD_STRING, ""),
    ]
    return text, expected, [], []


def _t_annotation12(rng: random.Random, scope: BNodeScope, anon):
    """RDF 1.2 annotation syntax: provenance/confidence on an assertion."""
    from ..model import KIND_TRIPLE_TERM, RDF_NS

    n = rng.randrange(N_ENTITIES)
    m = rng.randrange(N_ENTITIES)
    conf = rng.randrange(50, 100)
    if conf % 10 == 0:
        conf += 1  # keep "0.NN" its own canonical decimal form
    s, o = entity_iri(n), entity_iri(m)
    p = f"{PRED}linkedTo"
    text = (
        f'<{s}> <{p}> <{o}> '
        f'{{| <{PRED}confidence> 0.{conf} |}} .\n'
    )
    r = anon()  # the annotation reifier (parser's fresh-bnode order)
    tt = f"<{s}> <{p}> <{o}>"
    expected = [
        (KIND_IRI, s, p, KIND_IRI, o, "", ""),
        (KIND_BNODE, r, RDF_NS + "reifies", KIND_TRIPLE_TERM, tt, "", ""),
        (KIND_BNODE, r, PRED + "confidence",
         KIND_LITERAL, f"0.{conf}", XSD_NS + "decimal", ""),
    ]
    return text, expected, [], []


_TEXT_TEMPLATES = [
    (_t_typed_entity, 0.28),
    (_t_person_card, 0.19),
    (_t_bnode_props, 0.12),
    (_t_collection, 0.08),
    (_t_sameas, 0.12),
    (_t_messy_iris, 0.08),
    (_t_duplicates, 0.08),
    (_t_annotation12, 0.05),
]
_T_FNS = [t for t, _ in _TEXT_TEMPLATES]
_T_W = [w for _, w in _TEXT_TEMPLATES]


def _media_span(rng: random.Random, doc_key: str, span_idx: int):
    """Caption with 1-3 alias mentions + a media ref."""
    n_mentions = 1 + rng.randrange(3)
    aliases = []
    for _ in range(n_mentions):
        r = rng.random()
        n = rng.randrange(N_ENTITIES)
        if r < 0.80:
            aliases.append((alias_text(n), entity_iri(n)))
        elif r < 0.95:
            n = (n // 10) * 10 + 7
            aliases.append((f"pair {n}", entity_iri(n)))  # 0.6 winner
        else:
            n = (n // 25) * 25 + 3
            aliases.append((f"fuzzy {n}", None))  # no winner → no link
    caption = "media caption featuring " + "; also ".join(a for a, _ in aliases) + "."
    h = hashlib.blake2b(f"{doc_key}:{span_idx}".encode(), digest_size=8).hexdigest()
    media_ref = f"media://{h}"
    mentions = [(a, e) for a, e in aliases if e is not None]
    return caption, media_ref, mentions


def doc_base(doc_key: str) -> str:
    return f"{DOC}{doc_key}/"


def doc_iri(doc_key: str) -> str:
    return f"{DOC}{doc_key}"


def make_doc(doc_key: str):
    """Generate one interleaved document.

    Returns (spans, expected_triples, sameas_edges) where spans is a list of
    dicts (kind, text, media_ref, offset), expected_triples are canonical
    7-tuples still mentioning raw eq/ members (rewritten by golden_triples),
    and sameas_edges the (a, b) pairs this doc asserts.
    """
    seed = int.from_bytes(
        hashlib.blake2b(doc_key.encode(), digest_size=8).digest(), "big"
    )
    rng = random.Random(seed)
    scope = BNodeScope(RUN_SEED, doc_key)
    anon_state = {"n": 0}

    def anon() -> str:
        anon_state["n"] += 1
        return scope.get(f"!a{anon_state['n']}")

    n_spans = 1 + rng.randrange(8)
    spans: list[dict] = []
    expected: list[tuple] = []
    edges: list[tuple[str, str]] = []
    offset = 0
    base = doc_base(doc_key)
    d_iri = doc_iri(doc_key)
    has_text = False
    for j in range(n_spans):
        if rng.random() < 0.25 and (has_text or j < n_spans - 1):
            caption, media_ref, mentions = _media_span(rng, doc_key, j)
            spans.append(
                {"kind": "media", "text": caption, "media_ref": media_ref, "offset": offset}
            )
            offset += len(caption) + 1
            expected.append(
                (KIND_IRI, d_iri, PRED + "hasMedia", KIND_IRI, media_ref, "", "")
            )
            for _, ent in mentions:
                expected.append(
                    (KIND_IRI, d_iri, PRED + "mentions", KIND_IRI, ent, "", "")
                )
        else:
            has_text = True
            (fn,) = rng.choices(_T_FNS, weights=_T_W)
            text, exp, ed, _ = fn(rng, scope, anon)
            spans.append({"kind": "text", "text": text, "media_ref": "", "offset": offset})
            offset += len(text) + 1
            for t in exp:
                if t[1].startswith("__BASE__"):
                    t = (t[0], base + t[1][len("__BASE__"):],) + t[2:]
                expected.append(t)
            edges.extend(ed)
    return spans, expected, edges


# --------------------------------------------------------------------------
# Ray Data corpus construction (runs distributed inside map_batches)
# --------------------------------------------------------------------------


def doc_keys_for_batch(doc_ids, reps: int) -> list[str]:
    return [f"doc-{did}-{r}" for did in doc_ids for r in range(reps)]


def synth_spans_batch(batch: pa.Table, reps: int = 1) -> pa.Table:
    """map_batches kernel: seed rows (doc_id) → interleaved docs (doc_id, spans)."""
    keys = doc_keys_for_batch(batch.column("doc_id").to_pylist(), reps)
    all_spans = [make_doc(k)[0] for k in keys]
    return pa.Table.from_arrays(
        [pa.array(keys, pa.string()), pa.array(all_spans, SPAN_SCHEMA)],
        schema=DOCS_SCHEMA,
    )


def interleaved_docs(
    sf_dir: str,
    reps: int = 1,
    *,
    parallelism: int | None = None,
    id_range: tuple[int, int] | None = None,
):
    """The corpus as a Ray Dataset — input_hint shape (doc_id, spans).

    ``id_range=(lo, hi)``: restrict to seed doc_ids in [lo, hi) — the
    shard predicate for resumable runs (pushed into the parquet read)."""
    import ray.data as rd

    # Lance-first (BASELINE.json input shape): use the documents.lance
    # dataset when present, else its Parquet twin (sources/lance_io.py)
    import os as _os

    from .lance_io import read_table

    src = f"{sf_dir}/documents.lance"
    is_lance = _os.path.isdir(src)
    if not is_lance:
        src = f"{sf_dir}/documents.parquet"
    kw = {}
    if id_range is not None:
        if is_lance:
            # lance filters are SQL-expression strings
            kw["filter"] = (f"doc_id >= {id_range[0]} "
                            f"and doc_id < {id_range[1]}")
        else:
            import pyarrow.dataset as _pds

            kw["filter"] = (_pds.field("doc_id") >= id_range[0]) & (
                _pds.field("doc_id") < id_range[1]
            )
    ds = read_table(src, columns=["doc_id"], **kw)
    # one parquet file → one read block; spread the synth/extract work
    # across the cluster (a single block would serialize the pipeline)
    ds = ds.repartition(parallelism or 64)
    return ds.map_batches(
        lambda b: synth_spans_batch(b, reps), batch_format="pyarrow", batch_size=64
    )


# --------------------------------------------------------------------------
# Analytic golden (driver-side; used at test scales only)
# --------------------------------------------------------------------------


class _UnionFind:
    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        if p != x:
            p = self.parent[x] = self.find(p)
        return p

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # representative = lexicographic min (matches the pipeline rule)
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.parent[hi] = lo


def golden_triples(sf_dir: str, reps: int = 1) -> set[tuple]:
    """The expected canonical triple SET for the corpus at sf_dir.

    Computed analytically: per-doc template replay + driver-side union-find
    closure + set dedup. Independent of the Ray pipeline implementation.
    """
    import pyarrow.parquet as pq

    doc_ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_pylist()
    keys = doc_keys_for_batch(doc_ids, reps)
    uf = _UnionFind()
    raw: list[tuple] = []
    for k in keys:
        _, expected, edges = make_doc(k)
        raw.extend(expected)
        for a, b in edges:
            uf.union(a, b)
    rep = {x: uf.find(x) for x in uf.parent}
    out: set[tuple] = set()
    for t in raw:
        s_lex = rep.get(t[1], t[1]) if t[0] == KIND_IRI else t[1]
        o_lex = rep.get(t[4], t[4]) if t[3] == KIND_IRI else t[4]
        out.add((t[0], s_lex, t[2], t[3], o_lex, t[5], t[6]))
    # post-closure sameAs assertions: (member, sameAs, rep) for member != rep
    for member, r in rep.items():
        if member != r:
            out.add((KIND_IRI, member, OWL_SAMEAS, KIND_IRI, r, "", ""))
    return out
