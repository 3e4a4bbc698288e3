"""General SPARQL property-path evaluator over the triple table.

Reference semantics: jena-arq sparql/path/eval/PathEval.java,
PathEngine.java (P_Link, P_Inverse, P_Alt, P_Seq, P_NegPropSet,
P_ZeroOrMore1, P_OneOrMore1, P_ZeroOrOne) and path/P_*.java AST. The
reference walks iterator graphs per binding; this rebuild evaluates each
path operator as Dataset algebra over an (s, p, o) edge table:

    Link       filter on p                  (one map_batches)
    Inv        swap columns                 (map)
    Alt        union + distinct             (one shuffle)
    Seq        hash join end==start         (one shuffle)
    NegSet     filter p NOT IN set; inverse names swap before filtering
    Star/Plus  seeded semi-naive BFS: per round the NEW frontier is
               joined one step forward, accumulated pairs deduped by a
               min-tag groupby — O(diameter) rounds, each one join + one
               groupby. Zero-length (Star/Opt) adds (seed, seed) per the
               spec's zero-length-path rule.

Partitioning assumption (documented per SURVEY custom-operator rule):
closures are SEEDED — the result is reachability from the seed set, the
shape SPARQL evaluation actually needs (`?x path* ?y` with ?x bound by
the rest of the query). An unseeded full transitive closure is O(V²)
output and should be expressed as connected-components (stages/sameas)
when the path is symmetric.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc

from ..util import compact_blocks


# --- path AST ---------------------------------------------------------------


class Path:
    pass


@dataclass(frozen=True)
class Link(Path):
    p: str


@dataclass(frozen=True)
class Inv(Path):
    path: Path


@dataclass(frozen=True)
class Alt(Path):
    paths: tuple

    def __init__(self, *paths: Path):
        object.__setattr__(self, "paths", tuple(paths))


@dataclass(frozen=True)
class Seq(Path):
    paths: tuple

    def __init__(self, *paths: Path):
        object.__setattr__(self, "paths", tuple(paths))


@dataclass(frozen=True)
class NegSet(Path):
    """!(p1|p2|^q1|...) — forward predicates to exclude in `fwd`, inverse
    predicates (the ^-prefixed members) in `inv` (P_NegPropSet)."""

    fwd: tuple = field(default=())
    inv: tuple = field(default=())


@dataclass(frozen=True)
class Star(Path):
    path: Path


@dataclass(frozen=True)
class Plus(Path):
    path: Path


@dataclass(frozen=True)
class Opt(Path):
    path: Path


@dataclass(frozen=True)
class Zero(Path):
    """The zero-length relation only — ``p{0}`` (PathCompiler's
    fixed-length 0): binds start = end, never a one-step pair."""


# --- evaluation -------------------------------------------------------------


def _pairs_schema():
    return pa.schema([("start", pa.large_string()), ("end", pa.large_string())])


def _empty_pairs():
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {"start": pa.array([], pa.large_string()),
             "end": pa.array([], pa.large_string())}
        )
    )


def _as_pairs(t: pa.Table, a: str, b: str) -> pa.Table:
    if t.num_columns == 0:
        return pa.table(
            {"start": pa.array([], pa.large_string()),
             "end": pa.array([], pa.large_string())}
        )
    return pa.table(
        {
            "start": t[a].combine_chunks().cast(pa.large_string()),
            "end": t[b].combine_chunks().cast(pa.large_string()),
        }
    )


def _distinct(pairs_ds):
    out = pairs_ds.groupby(["start", "end"]).count().map_batches(
        lambda t: _as_pairs(t, "start", "end"), batch_format="pyarrow"
    )
    return compact_blocks(out)


def _n_parts(ds) -> int:
    return max(1, min(64, ds.count() // 2_000_000))


def _join_seq(left_ds, right_ds, distinct: bool = True):
    """(start, end) ⋈ (start', end') on end == start' → (start, end');
    ``distinct=False`` keeps multiplicities (bag-semantics Seq)."""
    mid_l = left_ds.map_batches(
        lambda t: t.rename_columns(["start", "mid"]) if t.num_columns else t,
        batch_format="pyarrow",
    )
    mid_r = right_ds.map_batches(
        lambda t: t.rename_columns(["mid", "end"]) if t.num_columns else t,
        batch_format="pyarrow",
    )
    left_c = compact_blocks(mid_l)
    right_c = compact_blocks(mid_r)
    if left_c.count() == 0 or right_c.count() == 0:
        return _empty_pairs()
    joined = left_c.join(
        right_c, join_type="inner", num_partitions=_n_parts(left_c), on=("mid",)
    )
    pairs = joined.map_batches(lambda t: _as_pairs(t, "start", "end"),
                               batch_format="pyarrow")
    return compact_blocks(pairs) if not distinct else _distinct(pairs)


def _is_ds(x) -> bool:
    return hasattr(x, "map_batches")


def _seeds_ds(seeds):
    """Identity (seed, seed) pairs. ``seeds`` is either a small iterable
    of node strings (broadcast path) or a distinct single-column 'node'
    Dataset (distributed path — seed propagation through Seq)."""
    import ray.data as rd

    if _is_ds(seeds):
        return seeds.map_batches(
            lambda t: pa.table(
                {
                    "start": t["node"].combine_chunks().cast(pa.large_string()),
                    "end": t["node"].combine_chunks().cast(pa.large_string()),
                }
            )
            if t.num_columns
            else _as_pairs(t, "start", "end"),
            batch_format="pyarrow",
        )
    vals = sorted(set(seeds))
    return rd.from_arrow(
        pa.table(
            {"start": pa.array(vals, pa.large_string()),
             "end": pa.array(vals, pa.large_string())}
        )
    )


def _ends_as_seeds(pairs_ds):
    """Distinct 'end' values of a pair Dataset as a seed Dataset — the
    frontier a later Seq element continues from (never on the driver)."""
    return compact_blocks(
        pairs_ds.groupby("end")
        .count()
        .map_batches(
            lambda t: pa.table(
                {"node": t["end"].combine_chunks().cast(pa.large_string())}
            )
            if t.num_columns
            else pa.table({"node": pa.array([], pa.large_string())}),
            batch_format="pyarrow",
        )
    )


def _restrict_to_starts(pairs_ds, seeds):
    import ray

    if _is_ds(seeds):
        key = compact_blocks(
            seeds.map_batches(
                lambda t: pa.table(
                    {"start": t["node"].combine_chunks().cast(pa.large_string())}
                )
                if t.num_columns
                else pa.table({"start": pa.array([], pa.large_string())}),
                batch_format="pyarrow",
            )
        )
        left = compact_blocks(pairs_ds)
        if key.count() == 0 or left.count() == 0:
            return _empty_pairs()
        joined = left.join(
            key, join_type="inner", num_partitions=_n_parts(left), on=("start",)
        )
        return joined.map_batches(
            lambda t: _as_pairs(t, "start", "end"), batch_format="pyarrow"
        )

    seed_ref = ray.put(frozenset(seeds))

    def f(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return _as_pairs(t, "start", "end")
        sset = ray.get(seed_ref)
        mask = pa.array([s in sset for s in t["start"].to_pylist()])
        return t.filter(mask)

    return pairs_ds.map_batches(f, batch_format="pyarrow")


def _check_rounds(rounds: int, max_rounds, what: str) -> None:
    """Closures run to fixpoint by default (rounds are bounded by graph
    diameter); an explicit ``max_rounds`` cap RAISES when hit with a
    non-empty frontier instead of silently returning a truncated result
    (the reference evaluates * / + / TransitiveProperty to fixpoint)."""
    if max_rounds is not None and rounds >= max_rounds:
        raise RuntimeError(
            f"{what}: round cap {max_rounds} hit with a non-empty frontier "
            "— result would be truncated; raise max_rounds or pass None"
        )


def _step_needs_seeding(p: Path) -> bool:
    """True when a closure step must be RE-EVALUATED seeded by the
    current frontier each round instead of being materialized once as a
    pair relation: it contains a Seq (unseeded p∘q joins can explode
    quadratically) or a nested closure (Star/Plus/Opt refuse to
    evaluate unseeded at all), e.g. (p/q)*, (p*|q)+, ((p*)/q)+."""
    if isinstance(p, (Seq, Star, Plus, Opt)):
        return True
    if isinstance(p, Inv):
        return _step_needs_seeding(p.path)
    if isinstance(p, Alt):
        return any(_step_needs_seeding(x) for x in p.paths)
    return False


def _inv_push(p: Path) -> Path:
    """Push an inversion through a compound path (P_Inverse algebra:
    (p*)⁻¹=(p⁻¹)*, (p/q)⁻¹=q⁻¹/p⁻¹, (p|q)⁻¹=p⁻¹|q⁻¹, (p⁻¹)⁻¹=p,
    !(F|^I)⁻¹=!(I|^F)). Lets ^(p*) evaluate as the seeded closure
    (^p)* instead of demanding an unseeded inner closure."""
    if isinstance(p, Link):
        return Inv(p)
    if isinstance(p, Inv):
        return p.path
    if isinstance(p, Alt):
        return Alt(*[_inv_push(x) for x in p.paths])
    if isinstance(p, Seq):
        return Seq(*[_inv_push(x) for x in reversed(p.paths)])
    if isinstance(p, Star):
        return Star(_inv_push(p.path))
    if isinstance(p, Plus):
        return Plus(_inv_push(p.path))
    if isinstance(p, Opt):
        return Opt(_inv_push(p.path))
    if isinstance(p, NegSet):
        return NegSet(fwd=p.inv, inv=p.fwd)
    if isinstance(p, Zero):
        return p  # the identity relation is its own inverse
    raise TypeError(f"unknown path node {p!r}")


# Below this many step pairs, a SEEDED closure runs in-memory on the
# driver (same constant as transitive_pairs.driver_threshold)
CLOSURE_DRIVER_THRESHOLD = 1_000_000


def _small_seed_list(seeds):
    """Seeds as a list of node strings when driver-sized, else None."""
    if not _is_ds(seeds):
        return sorted(set(seeds))
    from ..util import fast_count

    n, seeds = fast_count(seeds)
    if n > CLOSURE_DRIVER_THRESHOLD:
        return None
    out = []
    for b in seeds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        col = "node" if "node" in b.schema.names else b.schema.names[0]
        out.extend(b[col].to_pylist())
    return sorted(set(out))


def _closure_driver(step_pairs, seed_list, include_zero: bool):
    """Driver BFS over a materialized (start, end) step relation from a
    seed list → (start, end) reachability pairs (deterministic order)."""
    import ray.data as rd

    succ: dict[str, list] = {}
    for b in step_pairs.iter_batches(batch_size=65536,
                                     batch_format="pyarrow"):
        for s, e in zip(b["start"].to_pylist(), b["end"].to_pylist()):
            succ.setdefault(s, []).append(e)
    starts, ends = [], []
    for seed in seed_list:
        seen: set = set()
        stack = list(succ.get(seed, ()))
        while stack:
            y = stack.pop()
            if y in seen:
                continue
            seen.add(y)
            stack.extend(succ.get(y, ()))
        if include_zero:
            seen.add(seed)
        for y in sorted(seen):
            starts.append(seed)
            ends.append(y)
    return rd.from_arrow(pa.table({
        "start": pa.array(starts, pa.large_string()),
        "end": pa.array(ends, pa.large_string()),
    }))


def _closure(edges_ds, step: Path, seeds, include_zero: bool,
             max_rounds: int | None = None):
    """Seeded semi-naive reachability over one path step (to fixpoint).

    Plain steps (Link/Inv/NegSet/Alt-of-links) are materialized ONCE as a
    pair relation and joined per round. A step containing a Seq (e.g.
    (p/q)*) is instead RE-EVALUATED seeded by the current frontier each
    round: materializing p∘q unseeded is a join whose size is unrelated
    to the reachable set and can explode quadratically."""
    seeded_step = _step_needs_seeding(step)
    # bag=True: the step relation needs no up-front distinct — the BFS
    # visits once regardless, and the iterative loop's min-tag merge
    # dedups every round (one groupby of pure overhead saved)
    step_pairs = None if seeded_step else eval_path(edges_ds, step, bag=True)
    if step_pairs is not None:
        from ..util import fast_count

        n_step, step_pairs = fast_count(step_pairs)
        # max_rounds is a ROUND-count contract (raise, never truncate)
        # that only the iterative realization can honor
        seed_list = None if max_rounds is not None else _small_seed_list(seeds)
        if n_step <= CLOSURE_DRIVER_THRESHOLD and seed_list is not None:
            # strategy switch (same shape as transitive_pairs /
            # sameas.components_driver, and the same documented
            # threshold): below it, each DISTRIBUTED round costs
            # several fixed-overhead executions that dwarf the data —
            # run the BFS on the driver over the materialized step
            # relation instead. The distributed semi-naive loop below
            # remains the 100×-scale path.
            return _closure_driver(step_pairs, seed_list, include_zero)

    def apply_step(frontier_pairs):
        if seeded_step:
            stepped = eval_path(
                edges_ds, step, seeds=_ends_as_seeds(frontier_pairs),
                max_rounds=max_rounds,
            )
        else:
            stepped = step_pairs
        # distinct=False: the min-tag merge dedups every round anyway —
        # a per-step _distinct is one full groupby of pure overhead
        return _join_seq(frontier_pairs, stepped, distinct=False)

    zero = compact_blocks(_distinct(_seeds_ds(seeds)))
    # first application restricted to the seeds (identity ⋈ step)
    frontier = compact_blocks(apply_step(zero))
    acc = _distinct(zero.union(frontier)) if include_zero else _distinct(frontier)

    rounds = 0
    while True:
        if frontier.count() == 0:
            break
        _check_rounds(rounds, max_rounds, "path closure")
        rounds += 1
        stepped = apply_step(frontier)
        if stepped.count() == 0:
            break
        # semi-naive: new frontier = stepped pairs not already accumulated
        tag_old = acc.map_batches(
            lambda t: t.append_column("tag", pa.array([0] * t.num_rows, pa.int8()))
            if t.num_columns
            else t,
            batch_format="pyarrow",
        )
        tag_new = stepped.map_batches(
            lambda t: t.append_column("tag", pa.array([1] * t.num_rows, pa.int8()))
            if t.num_columns
            else t,
            batch_format="pyarrow",
        )
        merged = compact_blocks(
            tag_old.union(tag_new).groupby(["start", "end"]).min("tag")
        )

        def only_new(t: pa.Table) -> pa.Table:
            if t.num_columns == 0:
                return _as_pairs(t, "start", "end")
            keep = t.filter(pc.equal(t["min(tag)"], pa.scalar(1, pa.int8())))
            return _as_pairs(keep, "start", "end")

        frontier = compact_blocks(merged.map_batches(only_new, batch_format="pyarrow"))
        if frontier.count() == 0:
            break
        # merged IS the distinct acc ∪ stepped (groupby keys) — reusing it
        # as the accumulator saves a second full shuffle per round
        acc = compact_blocks(
            merged.map_batches(
                lambda t: _as_pairs(t, "start", "end"), batch_format="pyarrow"
            )
        )
    return acc


def _all_nodes_pairs(edges_ds):
    """(x, x) for every node appearing in the graph (subject or object)
    — the zero-length-path relation of ZeroOrMorePath."""

    def f(t: pa.Table) -> pa.Table:
        chunks = (list(t["s"].cast(pa.large_string()).chunks)
                  + list(t["o"].cast(pa.large_string()).chunks))
        both = pa.chunked_array(chunks or [pa.array([], pa.large_string())])
        vals = pc.unique(both)
        return pa.table({"start": vals, "end": vals})

    return _distinct(edges_ds.map_batches(f, batch_format="pyarrow"))


def transitive_pairs(pairs_ds, max_rounds: int | None = None,
                     driver_threshold: int = 1_000_000):
    """Unseeded transitive closure of a (start, end) pair Dataset by
    semi-naive iteration: per round the NEW pairs only are advanced one
    step against the base relation (frontier ⋈ base), deduped against the
    accumulator by a min-tag groupby. O(longest chain) rounds. Output is
    O(V·reach) — callers own the judgment that the closed relation is
    hierarchy-shaped (partOf/ancestor), not clique-shaped.

    Strategy switch (same shape as sameas.components_driver vs
    components_distributed): below `driver_threshold` base pairs the
    closure runs in-memory on the driver — each distributed round costs
    several fixed-overhead executions, which dominates small relations —
    and the iterative Dataset algebra handles the large case."""
    from ..util import fast_count

    # count the RAW pairs first: the driver path dedups for free while
    # building its succ sets, so the _distinct shuffle is only paid on
    # the distributed path (raw count ≥ distinct count keeps the
    # threshold decision conservative)
    n_raw, pairs_ds = fast_count(pairs_ds)
    if n_raw <= driver_threshold:
        base = pairs_ds
    else:
        base = _distinct(pairs_ds)
    if n_raw <= driver_threshold:
        import ray.data as rd

        succ: dict[str, set] = {}
        for b in base.iter_batches(batch_size=65536, batch_format="pyarrow"):
            for s, e in zip(b["start"].to_pylist(), b["end"].to_pylist()):
                succ.setdefault(s, set()).add(e)
        closed: dict[str, set] = {}

        def reach(x: str) -> set:
            if x in closed:
                return closed[x]
            closed[x] = set()  # cycle guard: nodes on the stack see partial
            out: set = set()
            stack = list(succ.get(x, ()))
            seen: set = set()
            while stack:
                y = stack.pop()
                if y in seen:
                    continue
                seen.add(y)
                out.add(y)
                stack.extend(succ.get(y, ()))
            closed[x] = out
            return out

        starts, ends = [], []
        for x in sorted(succ):
            for y in sorted(reach(x)):
                starts.append(x)
                ends.append(y)
        return rd.from_arrow(
            pa.table(
                {"start": pa.array(starts, pa.large_string()),
                 "end": pa.array(ends, pa.large_string())}
            )
        )
    acc = base
    frontier = base
    rounds = 0
    while True:
        if frontier.count() == 0:
            break
        _check_rounds(rounds, max_rounds, "transitive_pairs")
        rounds += 1
        stepped = _join_seq(frontier, base)
        if stepped.count() == 0:
            break
        tag_old = acc.map_batches(
            lambda t: t.append_column("tag", pa.array([0] * t.num_rows, pa.int8()))
            if t.num_columns
            else t,
            batch_format="pyarrow",
        )
        tag_new = stepped.map_batches(
            lambda t: t.append_column("tag", pa.array([1] * t.num_rows, pa.int8()))
            if t.num_columns
            else t,
            batch_format="pyarrow",
        )
        merged = compact_blocks(
            tag_old.union(tag_new).groupby(["start", "end"]).min("tag")
        )

        def only_new(t: pa.Table) -> pa.Table:
            if t.num_columns == 0:
                return _as_pairs(t, "start", "end")
            keep = t.filter(pc.equal(t["min(tag)"], pa.scalar(1, pa.int8())))
            return _as_pairs(keep, "start", "end")

        frontier = compact_blocks(merged.map_batches(only_new, batch_format="pyarrow"))
        if frontier.count() == 0:
            break
        # merged IS the distinct acc ∪ stepped — reuse it as the
        # accumulator instead of paying another distinct shuffle
        acc = compact_blocks(
            merged.map_batches(
                lambda t: _as_pairs(t, "start", "end"), batch_format="pyarrow"
            )
        )
    return acc


def eval_path(edges_ds, path: Path, seeds=None, max_rounds: int | None = None,
              bag: bool = False):
    """Evaluate `path` over an (s, p, o) edge Dataset → (start, end)
    pairs. `seeds` (iterable of node strings) is REQUIRED for
    Star/Plus/Opt at the top level and restricts results to paths
    starting in the seed set.

    ``bag=False`` (default) returns DISTINCT pairs — the engine's
    operator form. ``bag=True`` preserves multiplicities for the
    non-closure operators (SPARQL §18.4 path semantics: Alt is multiset
    union, Seq multiplies multiplicities — W3C pp31); the closure forms
    * + ? are distinct by definition (ZeroOrMorePath etc.) either way.

    The edge Dataset is MATERIALIZED once per eval tree (a sentinel
    attribute marks it): every Link/NegSet arm scans it, and a lazy
    pipeline would re-execute the upstream read per arm and per
    closure round."""
    if not getattr(edges_ds, "_jr_materialized", False):
        edges_ds = compact_blocks(edges_ds)
        try:
            edges_ds._jr_materialized = True
        except AttributeError:  # exotic Dataset subclass with __slots__
            pass
    if isinstance(path, Link):
        lit = path.p

        def f(t: pa.Table) -> pa.Table:
            return _as_pairs(t.filter(pc.equal(t["p"], lit)), "s", "o")

        out = compact_blocks(edges_ds.map_batches(f, batch_format="pyarrow"))
    elif isinstance(path, Inv):
        if isinstance(path.path, Link):
            inner = eval_path(edges_ds, path.path, max_rounds=max_rounds,
                              bag=bag)
            out = compact_blocks(
                inner.map_batches(
                    lambda t: _as_pairs(t, "end", "start"),
                    batch_format="pyarrow",
                )
            )
        else:
            # compound inverse: push the ^ down so nested closures
            # evaluate seeded — ^(p*) becomes (^p)*, ^(p/q) becomes
            # ^q/^p (P_Inverse algebra, see _inv_push)
            return eval_path(
                edges_ds, _inv_push(path.path), seeds=seeds,
                max_rounds=max_rounds, bag=bag,
            )
    elif isinstance(path, Alt):
        # with seeds each arm evaluates SEEDED (closures inside Alt work)
        parts = [
            eval_path(edges_ds, p, seeds=seeds, max_rounds=max_rounds,
                      bag=bag)
            for p in path.paths
        ]
        ds = parts[0]
        for p in parts[1:]:
            ds = ds.union(p)
        return ds if bag else _distinct(ds)
    elif isinstance(path, Seq):
        if seeds is not None:
            # seed PROPAGATION through the sequence (PathEval.java shape):
            # evaluate left-to-right, each element seeded by the previous
            # frontier (distinct ends, kept as a Dataset — never driver-
            # sized), accumulate by mid-joins. Closures inside Seq
            # therefore evaluate seeded, e.g. p/q* or p*/q.
            acc = compact_blocks(_distinct(_seeds_ds(seeds)))
            for p in path.paths:
                sub_seeds = _ends_as_seeds(acc)
                step = eval_path(
                    edges_ds, p, seeds=sub_seeds, max_rounds=max_rounds,
                    bag=bag,
                )
                acc = _join_seq(acc, step, distinct=not bag)
            return acc
        parts = [
            eval_path(edges_ds, p, max_rounds=max_rounds, bag=bag)
            for p in path.paths
        ]
        ds = parts[0]
        for p in parts[1:]:
            ds = _join_seq(ds, p, distinct=not bag)
        out = ds
    elif isinstance(path, NegSet):
        fwd_excl = frozenset(path.fwd)
        inv_excl = frozenset(path.inv)

        def f(t: pa.Table) -> pa.Table:
            ps = t["p"].to_pylist()
            if not fwd_excl and inv_excl:
                # pure-inverse set !(^q...): reverse edges ONLY — no
                # forward half exists (P_NegPropSet partitions the set;
                # an empty forward half contributes nothing)
                inv_mask = pa.array([p not in inv_excl for p in ps])
                return _as_pairs(t.filter(inv_mask), "o", "s")
            fwd_mask = pa.array([p not in fwd_excl for p in ps])
            fwd = _as_pairs(t.filter(fwd_mask), "s", "o")
            if not inv_excl:
                return fwd
            inv_mask = pa.array([p not in inv_excl for p in ps])
            inv = _as_pairs(t.filter(inv_mask), "o", "s")
            return pa.concat_tables([fwd, inv])

        # !(...) with only forward members matches forward edges only;
        # ^-members additionally admit the inverse direction (spec: the
        # negated set partitions into forward and inverse halves)
        neg = edges_ds.map_batches(f, batch_format="pyarrow")
        out = compact_blocks(neg) if bag else _distinct(neg)
    elif isinstance(path, (Star, Plus, Opt)):
        if seeds is None:
            # UNSEEDED closure (?s p* ?o): transitive-close the step's
            # full pair relation by semi-naive iteration
            # (transitive_pairs); zero-length arms pair every graph
            # node with itself (ZeroOrMorePath over all terms).
            # O(V·reach) output — the caller owns the judgment that the
            # relation is hierarchy-shaped, as with owl:TransitiveProperty.
            base = eval_path(edges_ds, path.path, max_rounds=max_rounds)
            if isinstance(path, Opt):
                closed = _distinct(base)
            else:
                closed = transitive_pairs(base, max_rounds=max_rounds)
            if isinstance(path, (Star, Opt)):
                closed = _distinct(closed.union(_all_nodes_pairs(edges_ds)))
            return compact_blocks(closed)
        if isinstance(path, Opt):
            one = compact_blocks(
                _restrict_to_starts(
                    eval_path(edges_ds, path.path, max_rounds=max_rounds), seeds
                )
            )
            return _distinct(_seeds_ds(seeds).union(one))
        return _closure(
            edges_ds, path.path, seeds,
            include_zero=isinstance(path, Star), max_rounds=max_rounds,
        )
    elif isinstance(path, Zero):
        if seeds is None:
            return _all_nodes_pairs(edges_ds)
        return compact_blocks(_distinct(_seeds_ds(seeds)))
    else:
        raise TypeError(f"unknown path node {path!r}")

    if seeds is not None:
        out = compact_blocks(_restrict_to_starts(out, seeds))
    return out
