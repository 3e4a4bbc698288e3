"""Operator-coverage queries: each entry is a Ray-Data realization of one
operator family from SURVEY.md §2 (the reference's SPARQL algebra /
aggregate / function surface) paired with an ANSI-SQL oracle that DuckDB
runs on the same parquet tables. Column names match the oracle exactly.

Implementation policy (the whole point of the rebuild):
- vectorized pyarrow.compute kernels inside map_batches — no row loops in
  hot paths (hashing is per-row by nature and noted where used)
- column pruning at read_parquet
- small sides broadcast via ray.put, never shuffled
- pre-aggregation before groupby where it cuts shuffle volume
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..model import RDF_TYPE


def _rd():
    import ray.data as rd

    return rd


def _read(sf_dir: str, table: str, columns=None):
    return _rd().read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _round(col, digits):
    return pc.round(col, ndigits=digits)


# --------------------------------------------------------------------------
# §2.6 aggregations
# --------------------------------------------------------------------------


def q_agg_groupby(sf_dir: str):
    """SUM/AVG/COUNT grouped aggregate (AggSum/AggAvg/AggCount,
    expr/aggregate/Agg*.java) with a computed column (OpExtend)."""
    from ray.data.aggregate import Count, Mean, Sum

    ds = _read(
        sf_dir, "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    # Float sums are order-dependent at ulp level (distributed vs serial
    # summation), so the compared aggregates are EXACT integer sums of
    # per-row scaled values: identical per-row doubles → identical ints →
    # order-independent sums. avg = exact_int / exact_int in double is
    # then bit-identical on both sides.
    def revenue(b: pa.Table) -> pa.Table:
        rev = pc.multiply(b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"]))
        rev_c = pc.cast(pc.round(pc.multiply(rev, pa.scalar(100.0)), round_mode="half_towards_infinity"), pa.int64())
        disc_u = pc.cast(
            pc.round(pc.multiply(b["l_discount"], pa.scalar(1e6)), round_mode="half_towards_infinity"), pa.int64()
        )
        qty_c = pc.cast(
            pc.round(pc.multiply(b["l_quantity"], pa.scalar(100.0)), round_mode="half_towards_infinity"), pa.int64()
        )
        return (
            b.append_column("rev_cents", rev_c)
            .append_column("disc_micros", disc_u)
            .append_column("qty_centi", qty_c)
        )

    keys = ["l_returnflag", "l_linestatus"]

    def partial(b: pa.Table) -> pa.Table:
        # combiner: per-batch arrow group_by BEFORE the shuffle — the
        # group count is tiny (~6), so each 6M-row scan ships a
        # handful of rows into the global groupby instead of the
        # whole table (partial aggregation; SURVEY §7 "pre-aggregate
        # inside map_batches")
        g = b.group_by(keys).aggregate(
            [("qty_centi", "sum"), ("rev_cents", "sum"),
             ("disc_micros", "sum"), ("qty_centi", "count")]
        )
        return g.rename_columns(
            keys + ["sum_qty_centi", "revenue_cents", "disc_micros", "cnt"])

    out = (
        ds.map_batches(revenue, batch_format="pyarrow")
        .map_batches(partial, batch_format="pyarrow")
        .groupby(keys)
        .aggregate(
            Sum("sum_qty_centi", alias_name="sum_qty_centi"),
            Sum("revenue_cents", alias_name="revenue_cents"),
            Sum("disc_micros", alias_name="disc_micros"),
            Sum("cnt", alias_name="cnt"),
        )
    )

    def final(b: pa.Table) -> pa.Table:
        avg_disc = pc.divide(
            pc.cast(b["disc_micros"].combine_chunks(), pa.float64()),
            pc.multiply(pc.cast(b["cnt"].combine_chunks(), pa.float64()), pa.scalar(1e6)),
        )
        return pa.Table.from_arrays(
            [
                b["l_returnflag"].combine_chunks(),
                b["l_linestatus"].combine_chunks(),
                b["sum_qty_centi"].combine_chunks(),
                b["revenue_cents"].combine_chunks(),
                avg_disc.combine_chunks() if isinstance(avg_disc, pa.ChunkedArray) else avg_disc,
                b["cnt"].combine_chunks(),
            ],
            names=["l_returnflag", "l_linestatus", "sum_qty_centi", "revenue_cents", "avg_disc", "cnt"],
        )

    return out.map_batches(final, batch_format="pyarrow")


SQL_AGG_GROUPBY = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS sum_qty_centi,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(sum(CAST(round(l_discount * 1000000, 0) AS BIGINT)) AS BIGINT)::DOUBLE / (count(*) * 1000000.0) AS avg_disc,
       count(*) AS cnt
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_count_distinct(sf_dir: str):
    """COUNT(DISTINCT ?v) (AggCountVarDistinct) — two-level groupby, no
    per-group seen-sets: distinct pairs first, then count."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_custkey"])
    pairs = ds.groupby(["o_orderpriority", "o_custkey"]).count()
    return (
        pairs.groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_cust"))
        .select_columns(["o_orderpriority", "n_cust"])
    )


SQL_COUNT_DISTINCT = """
SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust
FROM orders GROUP BY o_orderpriority
"""


def q_median(sf_dir: str):
    """ARQ custom aggregate AggMedian (expr/aggregate/AggMedian.java) —
    exact per-group median via map_groups."""
    ds = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    def med(g: pd.DataFrame) -> pd.DataFrame:
        # no rounding: (a+b)/2 interpolation is bit-identical to the oracle
        return pd.DataFrame(
            {"c_nationkey": [g["c_nationkey"].iloc[0]],
             "med_bal": [float(np.median(g["c_acctbal"]))]}
        )

    return ds.groupby("c_nationkey").map_groups(med, batch_format="pandas")


SQL_MEDIAN = """
SELECT c_nationkey, median(c_acctbal) AS med_bal
FROM customer GROUP BY c_nationkey
"""


def q_group_concat(sf_dir: str):
    """GROUP_CONCAT with separator (AggGroupConcat) — order-sensitive:
    sort within group first (SURVEY §2.6)."""
    ds = _read(sf_dir, "supplier", ["s_nationkey", "s_name"])

    def concat(g: pd.DataFrame) -> pd.DataFrame:
        names = ",".join(sorted(g["s_name"]))
        return pd.DataFrame({"s_nationkey": [g["s_nationkey"].iloc[0]], "names": [names]})

    return ds.groupby("s_nationkey").map_groups(concat, batch_format="pandas")


SQL_GROUP_CONCAT = """
SELECT s_nationkey, string_agg(s_name, ',' ORDER BY s_name) AS names
FROM supplier GROUP BY s_nationkey
"""


def q_minmax_sample(sf_dir: str):
    """MIN/MAX aggregates + deterministic SAMPLE analog (AggMin/Max/Sample;
    sample realized as min for determinism)."""
    from ray.data.aggregate import Max, Min

    ds = _read(sf_dir, "part", ["p_brand", "p_retailprice", "p_name"])
    return ds.groupby("p_brand").aggregate(
        Min("p_retailprice", alias_name="min_price"),
        Max("p_retailprice", alias_name="max_price"),
        Min("p_name", alias_name="sample_name"),
    )


SQL_MINMAX_SAMPLE = """
SELECT p_brand, min(p_retailprice) AS min_price, max(p_retailprice) AS max_price,
       min(p_name) AS sample_name
FROM part GROUP BY p_brand
"""


# --------------------------------------------------------------------------
# §2.5 joins / lookups
# --------------------------------------------------------------------------


def q_join_broadcast(sf_dir: str):
    """Equi hash join with a small build side (QueryIterHashJoin,
    engine/join/AbstractIterHashJoin.java:38-75) — broadcast realization:
    customer dim is ray.put once, looked up per batch; orders stream."""
    import ray
    import pyarrow.parquet as pq
    from ray.data.aggregate import Count, Sum

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    lookup_ref = ray.put(
        dict(zip(cust["c_custkey"].to_pylist(), cust["c_mktsegment"].to_pylist()))
    )

    def attach_segment(b: pa.Table) -> pa.Table:
        import ray as _ray

        lookup = _ray.get(lookup_ref)
        keys = b["o_custkey"].combine_chunks().dictionary_encode()
        seg_by_key = pa.array(
            [lookup.get(k) for k in keys.dictionary.to_pylist()], pa.string()
        )
        cents = pc.cast(
            pc.round(pc.multiply(b["o_totalprice"], pa.scalar(100.0)), round_mode="half_towards_infinity"), pa.int64()
        )
        return b.append_column("c_mktsegment", seg_by_key.take(keys.indices)) \
                .append_column("price_cents", cents)

    return (
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(attach_segment, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(
            Count(alias_name="n_orders"),
            Sum("price_cents", alias_name="sum_total_cents"),
        )
    )


SQL_JOIN_BROADCAST = """
SELECT c_mktsegment, count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_total_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_left_join(sf_dir: str):
    """LEFT JOIN / OPTIONAL (QueryIterHashLeftJoin_*): every customer row
    survives; order count may be zero. Realized as a Dataset left_outer
    hash join — the per-customer count table stays distributed (a
    fact-sized build side must never land on the driver; the broadcast
    template lives in q_join_broadcast for genuinely dim-sized sides)."""
    from ..util import compact_blocks

    counts = compact_blocks(
        _read(sf_dir, "orders", ["o_custkey"])
        .groupby("o_custkey")
        .count()
        .map_batches(
            lambda t: pa.table(
                {
                    "c_custkey": t["o_custkey"].combine_chunks(),
                    "n_orders": t["count()"].combine_chunks().cast(pa.int64()),
                }
            )
            if t.num_columns
            else t,
            batch_format="pyarrow",
        )
    )
    cust = compact_blocks(_read(sf_dir, "customer", ["c_custkey"]))
    n_parts = max(1, min(64, cust.count() // 2_000_000))
    joined = cust.join(
        counts, join_type="left_outer", num_partitions=n_parts,
        on=("c_custkey",),
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.table(
                {"c_custkey": pa.array([], pa.int64()),
                 "n_orders": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "c_custkey": t["c_custkey"].combine_chunks(),
                "n_orders": pc.fill_null(
                    t["n_orders"].combine_chunks().cast(pa.int64()), 0
                ),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


SQL_LEFT_JOIN = """
SELECT c_custkey, count(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey
"""


def q_anti_join(sf_dir: str):
    """NOT EXISTS / MINUS half-join (OpAntiJoin, QueryIterMinus) —
    broadcast the key set, filter vectorized. (Customers who never placed
    a big-ticket order — plain "no orders" is empty at every sf.)"""
    import ray

    with_orders = (
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(
            lambda b: b.filter(pc.greater(b["o_totalprice"], 300000.0)),
            batch_format="pyarrow",
        )
        .unique("o_custkey")
    )
    ref = ray.put(set(with_orders))

    def keep_orderless(b: pa.Table) -> pa.Table:
        import ray as _ray

        keys = _ray.get(ref)
        mask = pa.array([k not in keys for k in b["c_custkey"].to_pylist()])
        return b.filter(mask)

    return _read(sf_dir, "customer", ["c_custkey", "c_name"]).map_batches(
        keep_orderless, batch_format="pyarrow"
    )


SQL_ANTI_JOIN = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
"""


def q_semi_join(sf_dir: str):
    """EXISTS half-join (QueryIterHalfJoin): suppliers in nations that have
    customers with negative balances."""
    import ray

    neg_nations = (
        _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
        .map_batches(
            lambda b: b.filter(pc.less(b["c_acctbal"], -800.0)), batch_format="pyarrow"
        )
        .unique("c_nationkey")
    )
    ref = ray.put(set(neg_nations))

    def keep(b: pa.Table) -> pa.Table:
        import ray as _ray

        keys = _ray.get(ref)
        return b.filter(pa.array([k in keys for k in b["s_nationkey"].to_pylist()]))

    return _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"]).map_batches(
        keep, batch_format="pyarrow"
    )


SQL_SEMI_JOIN = """
SELECT s_suppkey, s_name, s_nationkey FROM supplier
WHERE s_nationkey IN (SELECT c_nationkey FROM customer WHERE c_acctbal < -800)
"""


# --------------------------------------------------------------------------
# §2.7 sort / top-k / distinct / set ops
# --------------------------------------------------------------------------


def q_topk(sf_dir: str):
    """ORDER BY + LIMIT fused to top-k (OpTopN, QueryIterTopN): per-block
    heap pre-pass then final merge — realized as sort().limit() which Ray
    Data executes as a distributed range sort + take."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return ds.sort(
        ["o_totalprice", "o_orderkey"], descending=[True, False]
    ).limit(10)


SQL_TOPK = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def q_distinct(sf_dir: str):
    """DISTINCT over full rows (QueryIterDistinct:44-94): in-batch REDUCED
    pre-pass + one groupby shuffle."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"])
    pre = ds.map_batches(
        lambda b: b.group_by(["o_custkey", "o_orderstatus"]).aggregate([]),
        batch_format="pyarrow",
    )
    return (
        pre.groupby(["o_custkey", "o_orderstatus"])
        .count()
        .select_columns(["o_custkey", "o_orderstatus"])
    )


SQL_DISTINCT = "SELECT DISTINCT o_custkey, o_orderstatus FROM orders"


def q_union(sf_dir: str):
    """SPARQL UNION keeps duplicates (OpUnion/QueryIterConcat) —
    bag concatenation of two filtered branches."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    hi = ds.map_batches(
        lambda b: b.filter(pc.greater(b["o_totalprice"], 400000.0)),
        batch_format="pyarrow",
    )
    lo = ds.map_batches(
        lambda b: b.filter(pc.less(b["o_totalprice"], 10000.0)), batch_format="pyarrow"
    )
    return hi.union(lo)


SQL_UNION = """
SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 400000
UNION ALL
SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < 10000
"""


def q_except(sf_dir: str):
    """EXCEPT / MINUS set difference: nations with suppliers but no
    negative-balance customers."""
    import ray

    neg = (
        _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
        .map_batches(
            lambda b: b.filter(pc.less(b["c_acctbal"], -800.0)), batch_format="pyarrow"
        )
        .unique("c_nationkey")
    )
    ref = ray.put(set(neg))

    def diff(b: pa.Table) -> pa.Table:
        import ray as _ray

        drop = _ray.get(ref)
        return b.filter(pa.array([k not in drop for k in b["nationkey"].to_pylist()]))

    sup_nations = (
        _read(sf_dir, "supplier", ["s_nationkey"])
        .map_batches(
            lambda b: b.group_by(["s_nationkey"]).aggregate([]).rename_columns(["nationkey"]),
            batch_format="pyarrow",
        )
        .groupby("nationkey")
        .count()
        .select_columns(["nationkey"])
    )
    return sup_nations.map_batches(diff, batch_format="pyarrow")


SQL_EXCEPT = """
SELECT DISTINCT s_nationkey AS nationkey FROM supplier
EXCEPT
SELECT DISTINCT c_nationkey AS nationkey FROM customer WHERE c_acctbal < -800
"""


# --------------------------------------------------------------------------
# §2.8 scalar function library (FILTER / BIND analogs)
# --------------------------------------------------------------------------


def q_string_funcs(sf_dir: str):
    """E_StrUpperCase / E_StrLength / E_StrContains / E_StrSubstring —
    pyarrow.compute string kernels, filter pushed into the batch."""
    ds = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    def fn(b: pa.Table) -> pa.Table:
        mask = pc.match_substring(b["c_name"], "1")
        t = b.filter(mask)
        return pa.Table.from_arrays(
            [
                t["c_custkey"].combine_chunks(),
                pc.utf8_upper(t["c_name"]).combine_chunks(),
                pc.utf8_length(t["c_name"]).cast(pa.int64()).combine_chunks(),
                pc.utf8_slice_codeunits(t["c_name"], 0, 4).combine_chunks(),
            ],
            names=["c_custkey", "uname", "name_len", "prefix4"],
        )

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_STRING_FUNCS = """
SELECT c_custkey, upper(c_name) AS uname, length(c_name) AS name_len,
       substring(c_name, 1, 4) AS prefix4
FROM customer WHERE contains(c_name, '1')
"""


def q_numeric_funcs(sf_dir: str):
    """E_NumAbs/Ceiling/Floor/Round (expr/E_Num*.java) vectorized."""
    ds = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"],
    )

    def fn(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                b["l_orderkey"].combine_chunks(),
                b["l_linenumber"].combine_chunks(),
                pc.ceil(pc.multiply(b["l_quantity"], pa.scalar(1.1))).combine_chunks(),
                pc.floor(pc.multiply(b["l_discount"], pa.scalar(100.0))).combine_chunks(),
                _round(pc.multiply(b["l_tax"], pa.scalar(100.0)), 1).combine_chunks(),
                pc.abs(pc.subtract(b["l_quantity"], pa.scalar(25.0))).combine_chunks(),
            ],
            names=["l_orderkey", "l_linenumber", "q_ceil", "disc_pct", "tax_pct", "q_dev"],
        )

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_NUMERIC_FUNCS = """
SELECT l_orderkey, l_linenumber,
       ceil(l_quantity * 1.1) AS q_ceil,
       floor(l_discount * 100) AS disc_pct,
       round(l_tax * 100, 1) AS tax_pct,
       abs(l_quantity - 25) AS q_dev
FROM lineitem
"""


def q_hash_funcs(sf_dir: str):
    """E_MD5 / E_SHA256 (expr/E_MD5.java, E_SHA*.java) — IRI-minting
    hashes; per-row by nature (hashlib), batched."""
    ds = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    def fn(b: pa.Table) -> pa.Table:
        names = b["c_name"].to_pylist()
        md5 = pa.array([hashlib.md5(x.encode()).hexdigest() for x in names])
        sha = pa.array([hashlib.sha256(x.encode()).hexdigest() for x in names])
        return pa.Table.from_arrays(
            [b["c_custkey"].combine_chunks(), md5, sha],
            names=["c_custkey", "name_md5", "name_sha256"],
        )

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_HASH_FUNCS = """
SELECT c_custkey, md5(c_name) AS name_md5, sha256(c_name) AS name_sha256
FROM customer
"""


def q_datetime_funcs(sf_dir: str):
    """E_DateTimeYear/Month (expr/E_DateTime*.java) + grouped count."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "lineitem", ["l_shipdate"])

    def fn(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [pc.year(b["l_shipdate"]).combine_chunks(),
             pc.month(b["l_shipdate"]).combine_chunks()],
            names=["y", "m"],
        )

    return (
        ds.map_batches(fn, batch_format="pyarrow")
        .groupby(["y", "m"])
        .aggregate(Count(alias_name="cnt"))
    )


SQL_DATETIME_FUNCS = """
SELECT year(l_shipdate) AS y, month(l_shipdate) AS m, count(*) AS cnt
FROM lineitem GROUP BY y, m
"""


def q_datetime_tz_funcs(sf_dir: str):
    """fn:adjust-dateTime-to-timezone / TIMEZONE / TZ
    (expr/E_AdjustToTimezone.java, E_DateTimeTZ.java,
    function/library/FN_AdjustDatetimeToTimezone.java): naive timestamps
    are treated as UTC and shifted to a +05:30 zone; day/hour/minute are
    extracted AFTER the adjust, and the applied zone is carried as the TZ
    string (constant here because the adjust target is constant)."""
    ds = _read(sf_dir, "events", ["event_id", "ts"])
    offset_us = (5 * 3600 + 30 * 60) * 1_000_000

    def fn(b: pa.Table) -> pa.Table:
        adj = pc.add(b["ts"], pa.scalar(offset_us, pa.duration("us")))
        return pa.Table.from_arrays(
            [
                b["event_id"].combine_chunks(),
                pc.day(adj).cast(pa.int64()).combine_chunks(),
                pc.hour(adj).cast(pa.int64()).combine_chunks(),
                pc.minute(adj).cast(pa.int64()).combine_chunks(),
                pa.array(["+05:30"] * b.num_rows, pa.string()),
            ],
            names=["event_id", "adj_day", "adj_hour", "adj_minute", "tz"],
        )

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_DATETIME_TZ_FUNCS = """
SELECT event_id,
       CAST(day(ts + INTERVAL '5 hours 30 minutes') AS BIGINT) AS adj_day,
       CAST(hour(ts + INTERVAL '5 hours 30 minutes') AS BIGINT) AS adj_hour,
       CAST(minute(ts + INTERVAL '5 hours 30 minutes') AS BIGINT) AS adj_minute,
       '+05:30' AS tz
FROM events
"""


def q_duration_funcs(sf_dir: str):
    """xsd:dayTimeDuration arithmetic (expr/E_OpMinus on dateTimes →
    duration; NodeValueDuration, function/library/FN_*.java duration
    accessors): per-user event span max(ts)-min(ts), decomposed into
    total seconds / whole days / hours-component — the duration accessor
    surface over a genuinely computed duration."""
    from ray.data.aggregate import Max, Min

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    spans = ds.groupby("user_id").aggregate(
        Min("ts", alias_name="t0"), Max("ts", alias_name="t1")
    )

    def fn(b: pa.Table) -> pa.Table:
        if b.num_columns == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()),
                 "span_sec": pa.array([], pa.int64()),
                 "span_days": pa.array([], pa.int64()),
                 "span_hours_comp": pa.array([], pa.int64())}
            )
        dur = pc.subtract(b["t1"], b["t0"])  # duration[us]
        sec = pc.divide(pc.cast(dur, pa.int64()), pa.scalar(1_000_000))
        days = pc.divide(sec, pa.scalar(86400))
        hours_comp = pc.divide(
            pc.subtract(sec, pc.multiply(days, pa.scalar(86400))), pa.scalar(3600)
        )
        return pa.Table.from_arrays(
            [
                b["user_id"].combine_chunks(),
                sec.combine_chunks() if isinstance(sec, pa.ChunkedArray) else sec,
                days.combine_chunks() if isinstance(days, pa.ChunkedArray) else days,
                hours_comp.combine_chunks()
                if isinstance(hours_comp, pa.ChunkedArray)
                else hours_comp,
            ],
            names=["user_id", "span_sec", "span_days", "span_hours_comp"],
        )

    return spans.map_batches(fn, batch_format="pyarrow")


SQL_DURATION_FUNCS = """
SELECT user_id,
       CAST(floor(epoch(max(ts)) - epoch(min(ts))) AS BIGINT) AS span_sec,
       CAST(floor((epoch(max(ts)) - epoch(min(ts))) / 86400) AS BIGINT)
         AS span_days,
       CAST(floor(fmod(epoch(max(ts)) - epoch(min(ts)), 86400) / 3600) AS BIGINT)
         AS span_hours_comp
FROM events GROUP BY user_id
"""


def q_encode_uri_funcs(sf_dir: str):
    """ENCODE_FOR_URI (expr/E_StrEncodeForURI.java,
    function/library/FN_EncodeForURI.java): RFC 3986 percent-encoding of
    everything outside the unreserved set. The customer-name charset only
    exercises '#' and space, which the SQL oracle mirrors with replace()."""
    ds = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    _unreserved = frozenset(
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-_.~"
    )

    def encode(s: str) -> str:
        return "".join(
            c if c in _unreserved else "".join(f"%{b:02X}" for b in c.encode())
            for c in s
        )

    def fn(b: pa.Table) -> pa.Table:
        enc = pa.array([encode(x) for x in b["c_name"].to_pylist()], pa.string())
        return pa.Table.from_arrays(
            [b["c_custkey"].combine_chunks(), enc],
            names=["c_custkey", "name_uri"],
        )

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_ENCODE_URI_FUNCS = """
SELECT c_custkey, replace(replace(c_name, '#', '%23'), ' ', '%20') AS name_uri
FROM customer
"""


def q_hash_variants(sf_dir: str):
    """E_SHA1 / E_SHA384 / E_SHA512 (expr/E_SHA1.java, E_SHA384.java,
    E_SHA512.java). DuckDB has no sha1/384/512, so this query is
    rows-only for the driver; tests/test_queries.py pins the digests
    against hashlib on a fixed row."""
    ds = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    def fn(b: pa.Table) -> pa.Table:
        names = b["c_name"].to_pylist()
        return pa.Table.from_arrays(
            [
                b["c_custkey"].combine_chunks(),
                pa.array([hashlib.sha1(x.encode()).hexdigest() for x in names]),
                pa.array([hashlib.sha384(x.encode()).hexdigest() for x in names]),
                pa.array([hashlib.sha512(x.encode()).hexdigest() for x in names]),
            ],
            names=["c_custkey", "name_sha1", "name_sha384", "name_sha512"],
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Streaming-shaped: tumbling window over the events log (SURVEY §2.10 —
# no windows in the reference; ordering realized as groupby per window key)
# --------------------------------------------------------------------------


def q_window_tumbling(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def fn(b: pa.Table) -> pa.Table:
        win = pc.floor_temporal(b["ts"], unit="hour").cast(pa.timestamp("us"))
        val_scaled = pc.cast(
            pc.round(pc.multiply(b["value"], pa.scalar(10000.0)), round_mode="half_towards_infinity"), pa.int64()
        )
        return pa.Table.from_arrays(
            [b["event_type"].combine_chunks(), win.combine_chunks(), val_scaled.combine_chunks()],
            names=["event_type", "win", "val_scaled"],
        )

    return (
        ds.map_batches(fn, batch_format="pyarrow")
        .groupby(["event_type", "win"])
        .aggregate(Count(alias_name="cnt"), Sum("val_scaled", alias_name="sum_val_scaled"))
    )


SQL_WINDOW_TUMBLING = """
SELECT event_type, date_trunc('hour', ts) AS win, count(*) AS cnt,
       CAST(sum(CAST(round(value * 10000, 0) AS BIGINT)) AS BIGINT) AS sum_val_scaled
FROM events GROUP BY event_type, win
"""


def q_session_windows(sf_dir: str):
    """Session windowing over the events log (SURVEY §2.10): per user,
    events are grouped into sessions separated by gaps > 30 min. Ordering
    assumption: events sorted by ts WITHIN each user's group (done inside
    map_groups — the shuffle key is user_id, order within group is local).
    """
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    gap = pd.Timedelta(minutes=30)

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        new_session = (g["ts"].diff() > gap).cumsum()
        out = g.groupby(new_session).agg(
            session_start=("ts", "min"), n_events=("ts", "size")
        )
        out["user_id"] = g["user_id"].iloc[0]
        return out.reset_index(drop=True)[["user_id", "session_start", "n_events"]]

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")


SQL_SESSION_WINDOWS = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
sessioned AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events
FROM sessioned GROUP BY user_id, session_id
"""


# --------------------------------------------------------------------------
# Distributed connected components with a SQL oracle (the sameAs closure
# algorithm, §7.2.6, validated against a recursive-CTE reachability oracle)
# --------------------------------------------------------------------------


def q_connected_components(sf_dir: str):
    from ray.data.aggregate import Count

    from ..stages.sameas import components_distributed

    def to_edges(b: pa.Table) -> pa.Table:
        keys = b["o_orderkey"].to_numpy(zero_copy_only=False)
        t = b.filter(pa.array(keys % 97 == 0))
        a = pc.utf8_lpad(pc.cast(t["o_orderkey"], pa.string()), 8, "0")
        bb = pc.utf8_lpad(
            pc.cast(pc.add(t["o_custkey"], 1000000), pa.string()), 8, "0"
        )
        return pa.Table.from_arrays(
            [a.combine_chunks(), bb.combine_chunks()], names=["a", "b"]
        )

    edges = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        to_edges, batch_format="pyarrow"
    )
    comp = components_distributed(edges)
    return comp.groupby("rep").aggregate(Count(alias_name="size"))


SQL_CONNECTED_COMPONENTS = """
WITH RECURSIVE
edges AS (
  SELECT lpad(CAST(o_orderkey AS VARCHAR), 8, '0') AS a,
         lpad(CAST(o_custkey + 1000000 AS VARCHAR), 8, '0') AS b
  FROM orders WHERE o_orderkey % 97 = 0
),
sym AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
reach(node, r) AS (
  SELECT a AS node, a AS r FROM sym
  UNION
  SELECT s.b AS node, reach.r FROM reach JOIN sym s ON s.a = reach.node
),
comp AS (SELECT node, min(r) AS rep FROM reach GROUP BY node)
SELECT rep, count(*) AS size FROM comp GROUP BY rep
"""


# --------------------------------------------------------------------------
# Training-data operations over documents / embeddings (ops/ package)
# --------------------------------------------------------------------------


def q_doc_tokens(sf_dir: str):
    from ..ops.textstats import token_stats_batch

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        token_stats_batch, batch_format="pyarrow"
    )


SQL_DOC_TOKENS = r"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_ws_tokens,
       len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_re_tokens,
       length(text) AS n_chars
FROM documents
"""


def q_doc_quality(sf_dir: str):
    from ..ops.textstats import quality_batch

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        quality_batch, batch_format="pyarrow"
    )


def q_doc_repetition(sf_dir: str):
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1):
    duplicate-word fraction, top-word share, top-bigram share — the
    machine-text / boilerplate signals a pre-training quality pass
    thresholds on. Pure per-row kernel, no shuffle."""
    from ..ops.textstats import repetition_batch

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        repetition_batch, batch_format="pyarrow"
    )


SQL_DOC_REPETITION = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> x <> '') AS ts
  FROM documents
),
words AS (SELECT doc_id, unnest(ts) AS w FROM toks),
wc AS (
  SELECT doc_id, count(*) AS n, count(DISTINCT w) AS nd
  FROM words GROUP BY doc_id
),
topw AS (
  SELECT doc_id, max(c) AS mc FROM (
    SELECT doc_id, w, count(*) AS c FROM words GROUP BY doc_id, w
  ) GROUP BY doc_id
),
bi AS (
  SELECT doc_id, ts[i] || ' ' || ts[i+1] AS g
  FROM toks, UNNEST(range(1, len(ts))) AS t(i)
  WHERE len(ts) >= 2
),
topb AS (
  SELECT doc_id, max(c) AS mb FROM (
    SELECT doc_id, g, count(*) AS c FROM bi GROUP BY doc_id, g
  ) GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(coalesce(wc.n, 0) AS BIGINT) AS n_words,
       CAST(coalesce(wc.nd, 0) AS BIGINT) AS n_distinct,
       CASE WHEN coalesce(wc.n, 0) > 0
            THEN round(1.0 - wc.nd * 1.0 / wc.n, 6) ELSE 0.0
       END AS dup_word_frac,
       CASE WHEN coalesce(wc.n, 0) > 0
            THEN round(topw.mc * 1.0 / wc.n, 6) ELSE 0.0
       END AS top_word_frac,
       CASE WHEN coalesce(wc.n, 0) >= 2
            THEN round(topb.mb * 1.0 / (wc.n - 1), 6) ELSE 0.0
       END AS top_bigram_frac
FROM toks t
LEFT JOIN wc USING (doc_id)
LEFT JOIN topw USING (doc_id)
LEFT JOIN topb USING (doc_id)
"""


SQL_DOC_QUALITY = r"""
WITH toks AS (
  SELECT doc_id, text,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents
)
SELECT doc_id,
       round(len(list_filter(t, x -> list_contains(
           ['the','and','of','a','to','in','is','it','for','on'], x)))
           / greatest(1, len(t))::double, 6) AS stopword_ratio,
       round(list_sum(list_transform(t, x -> length(x)))
           / greatest(1, len(t))::double, 6) AS mean_token_len,
       length(text) - length(replace(text, '.', '')) AS n_dots
FROM toks
"""


def q_quality_score(sf_dir: str):
    """Batched quality-model inference (ops/textstats.QualityScorer):
    a stateful actor-pool stage — model built once per actor in
    __init__, one vectorized scoring pass per batch — over the
    quality_batch features with deterministic linear weights so the
    whole 'score and filter' pipeline is SQL-oracle-able."""
    from ..ops.textstats import QualityScorer

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        QualityScorer, batch_format="pyarrow", concurrency=2
    )


SQL_QUALITY_SCORE = r"""
WITH toks AS (
  SELECT doc_id, text,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents
),
feats AS (
  SELECT doc_id,
         round(len(list_filter(t, x -> list_contains(
             ['the','and','of','a','to','in','is','it','for','on'], x)))
             / greatest(1, len(t))::double, 6) AS stopword_ratio,
         round(list_sum(list_transform(t, x -> length(x)))
             / greatest(1, len(t))::double, 6) AS mean_token_len,
         length(text) - length(replace(text, '.', '')) AS n_dots
  FROM toks
),
scored AS (
  SELECT doc_id,
         round(2.0 * stopword_ratio + (-0.1) * mean_token_len
               + 0.01 * n_dots + 0.5, 6) AS score
  FROM feats
)
SELECT doc_id, score, score > 0.55 AS keep FROM scored
"""


def q_dedup_exact_docs(sf_dir: str):
    from ..ops.dedup_text import exact_dedup_docs

    return exact_dedup_docs(_read(sf_dir, "documents", ["doc_id", "text"]))


SQL_DEDUP_EXACT_DOCS = """
SELECT md5(text) AS h, min(doc_id) AS keep_doc, count(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


def q_dedup_normalized_docs(sf_dir: str):
    from ..ops.dedup_text import normalized_dedup_docs

    return normalized_dedup_docs(_read(sf_dir, "documents", ["doc_id", "text"]))


SQL_DEDUP_NORMALIZED_DOCS = r"""
SELECT md5(regexp_replace(lower(text), '\W', '', 'g')) AS h,
       min(doc_id) AS keep_doc, count(*) AS n_copies
FROM documents GROUP BY 1
"""


def q_dedup_paragraphs(sf_dir: str):
    """Corpus-wide paragraph-level exact dedup (RefinedWeb/FineWeb
    line-dedup at paragraph granularity): keep each paragraph only at
    its first corpus occurrence, reassemble documents from survivors."""
    from ..ops.dedup_text import paragraph_dedup

    return paragraph_dedup(_read(sf_dir, "documents", ["doc_id", "text"]))


SQL_DEDUP_PARAGRAPHS = r"""
WITH paras AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, E'\n\n'), 1) - 1 AS idx,
         unnest(string_split(text, E'\n\n')) AS para
  FROM documents
), winners AS (
  SELECT para, min(doc_id * (1 << 20) + idx) AS w
  FROM paras GROUP BY para
)
SELECT p.doc_id, string_agg(p.para, E'\n\n' ORDER BY p.idx) AS text
FROM paras p JOIN winners w
  ON p.para = w.para AND p.doc_id * (1 << 20) + p.idx = w.w
GROUP BY p.doc_id
"""


def q_embedding_near_dup(sf_dir: str):
    from ..ops.dedup_text import embedding_near_dup

    return embedding_near_dup(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]), threshold=0.4
    )


SQL_EMBEDDING_NEAR_DUP = """
SELECT a.vec_id AS a, b.vec_id AS b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
"""


def q_dedup_ngram_jaccard(sf_dir: str):
    """Exact n-gram Jaccard near-dup (the non-approximate member of the
    dedup family): shingle-explode → shared-shingle pairs → exact
    intersection/union counts. Projected to the integer (inter, uni)
    evidence so the oracle compare is float-free."""
    from ..ops.dedup_text import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]), threshold=0.5, k=3
    )
    return pairs.select_columns(["a", "b", "inter", "uni"])


SQL_DEDUP_NGRAM_JACCARD = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> x <> '') AS ts
  FROM documents
),
shingles AS (
  SELECT DISTINCT doc_id,
         ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
  FROM toks, UNNEST(range(1, len(ts) - 1)) AS g(i)
  WHERE len(ts) >= 3
  UNION
  SELECT DISTINCT doc_id, array_to_string(ts, ' ')
  FROM toks WHERE len(ts) > 0 AND len(ts) < 3
  UNION
  SELECT DISTINCT doc_id, '' FROM toks WHERE len(ts) = 0
),
kept AS (
  SELECT shingle FROM shingles GROUP BY shingle HAVING count(*) <= 256
),
sh AS (SELECT s.doc_id, s.shingle FROM shingles s JOIN kept USING (shingle)),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
  SELECT x.doc_id AS a, y.doc_id AS b, CAST(count(*) AS BIGINT) AS inter
  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT a, b, inter, CAST(sa.n + sb.n - inter AS BIGINT) AS uni
FROM pairs
JOIN sizes sa ON sa.doc_id = a
JOIN sizes sb ON sb.doc_id = b
WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5
"""


def q_dedup_fuzzy_clusters(sf_dir: str):
    """End-to-end fuzzy dedup — the standard web-corpus shape (e.g.
    SlimPajama / BigCode pipelines): near-dup pairs → connected
    components over the pair graph → one representative per cluster
    (min doc_id) → keep/drop verdict per document. The pair stage here
    is the exact n-gram Jaccard operator so the WHOLE pipeline is
    SQL-oracle-able; at 100 TB the pair stage swaps for
    minhash_lsh_pairs — the downstream CC + representative selection
    is identical. Returns (doc_id, rep, kept) for every document."""
    from ..stages.sameas import components_distributed
    from ..ops.dedup_text import ngram_jaccard_pairs
    from ..util import compact_blocks

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = ngram_jaccard_pairs(docs, threshold=0.5, k=3)

    # components_distributed labels over strings; zero-pad so string-min
    # == numeric-min for int64 doc ids
    def pad(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.table({"a": pa.array([], pa.large_string()),
                             "b": pa.array([], pa.large_string())})
        return pa.table({
            "a": pc.utf8_lpad(pc.cast(t["a"], pa.string()), 12, "0")
            .combine_chunks(),
            "b": pc.utf8_lpad(pc.cast(t["b"], pa.string()), 12, "0")
            .combine_chunks(),
        })

    edges = pairs.select_columns(["a", "b"]).map_batches(
        pad, batch_format="pyarrow")
    comp = components_distributed(edges)

    def unpad(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "__rep": pa.array([], pa.int64())})
        return pa.table({
            "doc_id": pc.cast(t["node"], pa.int64()).combine_chunks(),
            "__rep": pc.cast(t["rep"], pa.int64()).combine_chunks(),
        })

    comp_int = compact_blocks(comp.map_batches(unpad, batch_format="pyarrow"))
    ids = compact_blocks(docs.select_columns(["doc_id"]))
    n_parts = max(1, min(64, ids.count() // 2_000_000))
    joined = ids.join(comp_int, join_type="left_outer",
                      num_partitions=n_parts, on=("doc_id",))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "rep": pa.array([], pa.int64()),
                             "kept": pa.array([], pa.bool_())})
        doc = t["doc_id"].combine_chunks()
        rep = pc.coalesce(t["__rep"].combine_chunks(), doc)
        return pa.table({"doc_id": doc, "rep": rep,
                         "kept": pc.equal(rep, doc)})

    return joined.map_batches(finish, batch_format="pyarrow")


SQL_DEDUP_FUZZY_CLUSTERS = r"""
WITH RECURSIVE toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> x <> '') AS ts
  FROM documents
),
shingles AS (
  SELECT DISTINCT doc_id,
         ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
  FROM toks, UNNEST(range(1, len(ts) - 1)) AS g(i)
  WHERE len(ts) >= 3
  UNION
  SELECT DISTINCT doc_id, array_to_string(ts, ' ')
  FROM toks WHERE len(ts) > 0 AND len(ts) < 3
  UNION
  SELECT DISTINCT doc_id, '' FROM toks WHERE len(ts) = 0
),
kept_sh AS (
  SELECT shingle FROM shingles GROUP BY shingle HAVING count(*) <= 256
),
sh AS (SELECT s.doc_id, s.shingle FROM shingles s JOIN kept_sh USING (shingle)),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
pairs0 AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT a, b FROM pairs0
  JOIN sizes sa ON sa.doc_id = a
  JOIN sizes sb ON sb.doc_id = b
  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5
),
sym AS (SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs),
reach(node, r) AS (
  SELECT a AS node, a AS r FROM sym
  UNION
  SELECT s.b AS node, reach.r FROM reach JOIN sym s ON s.a = reach.node
),
comp AS (SELECT node, min(r) AS rep FROM reach GROUP BY node)
SELECT d.doc_id,
       coalesce(c.rep, d.doc_id) AS rep,
       coalesce(c.rep, d.doc_id) = d.doc_id AS kept
FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
"""


def q_graph_triangles(sf_dir: str):
    """Distributed triangle counting (ordered-wedge join, Suri &
    Vassilvitskii WWW'11) over a co-occurrence graph: users are
    connected when they share an event-props key; triangles close via
    two hash joins, ordering every edge low→high so wedge fan-out is
    bounded by the ordered degree (the standard hot-vertex
    mitigation)."""
    import pandas as pd

    from ..ops.graphalgo import distinct_int_pairs, triangle_count

    ev = _read(sf_dir, "events", ["user_id", "props"])

    def ku(t: pa.Table) -> pa.Table:
        k = pc.cast(
            pc.replace_substring_regex(t["props"], r"[^0-9]", ""),
            pa.int64(),
        )
        return pa.table({"k": k, "u": t["user_id"]}).group_by(
            ["k", "u"]).aggregate([])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        us = sorted(g["u"].unique())
        rows = [(a, b) for i, a in enumerate(us) for b in us[i + 1:]]
        return pd.DataFrame(rows, columns=["a", "b"]) if rows else \
            pd.DataFrame({"a": [], "b": []})

    edges = distinct_int_pairs(
        ev.map_batches(ku, batch_format="pyarrow")
        .groupby("k")
        .map_groups(pairs, batch_format="pandas")
    )
    return triangle_count(edges)


SQL_GRAPH_TRIANGLES = r"""
WITH ku AS (
  SELECT DISTINCT
         CAST(regexp_replace(props, '[^0-9]', '', 'g') AS BIGINT) AS k,
         user_id AS u
  FROM events
),
edges AS (
  SELECT DISTINCT x.u AS a, y.u AS b
  FROM ku x JOIN ku y ON x.k = y.k AND x.u < y.u
)
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM edges e1
JOIN edges e2 ON e1.b = e2.a
JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
"""


def q_dedup_substring(sf_dir: str):
    """Verbatim-span dedup (Lee et al. 2021 signal): doc pairs sharing
    an exact 24-char substring, with a document-frequency stop filter
    (grams in >256 docs are boilerplate) — the copy-paste detector
    word-level Jaccard misses. Integer evidence column keeps the
    oracle compare float-free."""
    from ..ops.dedup_text import substring_dup_pairs

    return substring_dup_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]), k=24)


SQL_DEDUP_SUBSTRING = r"""
WITH grams AS (
  SELECT DISTINCT doc_id, substr(text, i, 24) AS g
  FROM documents, UNNEST(range(1, len(text) - 24 + 2)) AS t(i)
  WHERE len(text) >= 24
),
kept AS (SELECT g FROM grams GROUP BY g HAVING count(*) <= 256),
gk AS (SELECT doc_id, g FROM grams JOIN kept USING (g))
SELECT x.doc_id AS a, y.doc_id AS b, CAST(count(*) AS BIGINT) AS shared
FROM gk x JOIN gk y ON x.g = y.g AND x.doc_id < y.doc_id
GROUP BY 1, 2
"""


def q_doc_tfidf(sf_dir: str):
    """Top-5 TF-IDF terms per doc (idf = ln(N/df)): in-batch term
    counting, ONE groupby(term) for document frequency, hash join back
    on term, per-doc top-k in map_groups. Deterministic ties on
    (rounded score desc, term asc) so the SQL window oracle matches
    exactly."""
    from ..ops.textstats import tfidf_topk

    return tfidf_topk(_read(sf_dir, "documents", ["doc_id", "text"]), k=5)


SQL_DOC_TFIDF = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> x <> '') AS ts
  FROM documents
),
tf AS (
  SELECT doc_id, w AS term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(ts) AS w FROM toks)
  GROUP BY doc_id, w
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT doc_id, term,
         round(tf * ln(n.n * 1.0 / df.df), 6) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
),
ranked AS (
  SELECT *, row_number()
      OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rn
  FROM scored
)
SELECT doc_id, term, tfidf FROM ranked WHERE rn <= 5
"""


def q_vocab_topk(sf_dir: str):
    """Corpus vocabulary: top-500 terms by global frequency — the first
    pass of a tokenizer/vocab build. Distributed word-count with a
    per-batch Counter combiner (the shuffle carries one row per
    (block, term)), one groupby(term) sum, per-block top-k pruning and
    a tiny global sort+limit. Deterministic cutoff on (count desc,
    term asc)."""
    from ..ops.textstats import vocab_topk

    return vocab_topk(_read(sf_dir, "documents", ["text"]), k=500)


SQL_VOCAB_TOPK = r"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
),
counts AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY term
)
SELECT term, cnt FROM counts ORDER BY cnt DESC, term LIMIT 500
"""


def q_chunk_windows(sf_dir: str):
    """Passage chunking (ops/chunking.py): whitespace-token windows of
    64 tokens every 48 (RAG-index / sequence-packing shape). Pure
    flat-map, no shuffle; empty docs produce no chunks. Chunk text is
    hashed to md5 for the compare so the oracle diff stays narrow."""
    from ..ops.chunking import chunk_windows

    chunks = chunk_windows(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        window=64, stride=48,
    )

    def digest(t: pa.Table) -> pa.Table:
        import hashlib

        if t.num_columns == 0:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "chunk_id": pa.array([], pa.int64()),
                "start_tok": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "chunk_md5": pa.array([], pa.string()),
            })
        md5 = [hashlib.md5(s.encode()).hexdigest()
               for s in t["chunk_text"].to_pylist()]
        return pa.table({
            "doc_id": t["doc_id"],
            "chunk_id": t["chunk_id"],
            "start_tok": t["start_tok"],
            "n_tokens": t["n_tokens"],
            "chunk_md5": pa.array(md5, pa.string()),
        })

    return chunks.map_batches(digest, batch_format="pyarrow")


SQL_CHUNK_WINDOWS = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'),
                     x -> x <> '') AS ts
  FROM documents
),
starts AS (
  SELECT doc_id, ts, CAST(i AS BIGINT) AS start_tok
  FROM toks, UNNEST(range(0, len(ts), 48)) AS g(i)
)
SELECT doc_id,
       start_tok // 48 AS chunk_id,
       start_tok,
       CAST(least(64, len(ts) - start_tok) AS BIGINT) AS n_tokens,
       md5(array_to_string(ts[start_tok + 1 : least(start_tok + 64, len(ts))],
                           ' ')) AS chunk_md5
FROM starts
"""


def q_sample_stratified(sf_dir: str):
    """Deterministic stratified sampling (ops/sampling.py): downsample
    English to 25%, everything else to 50%, keyed on md5(doc_id) — a
    reproducible, shuffle-free filter (re-running a failed shard keeps
    the same sample), exactly mirrored by the SQL oracle."""
    from ..ops.sampling import stratified_sample

    docs = _read(sf_dir, "documents", ["doc_id", "lang"])
    return stratified_sample(
        docs, {"en": 0.25}, default_rate=0.5
    ).select_columns(["doc_id", "lang"])


SQL_SAMPLE_STRATIFIED = """
SELECT doc_id, lang FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
      CASE WHEN lang = 'en' THEN '40000000' ELSE '80000000' END
"""


def q_sample_bottomk(sf_dir: str):
    """Uniform sample WITHOUT replacement of exactly k docs: the k
    globally smallest md5(doc_id) values (bottom-k / min-wise sampling,
    Cohen & Kaplan PODC'07). Per-batch k-smallest combiner, then one
    tiny sort+limit — at most k rows leave each block."""
    from ..ops.sampling import bottomk_sample

    docs = _read(sf_dir, "documents", ["doc_id"])
    return bottomk_sample(docs, k=100).select_columns(["doc_id"])


SQL_SAMPLE_BOTTOMK = """
SELECT doc_id FROM documents
ORDER BY md5(CAST(doc_id AS VARCHAR)) LIMIT 100
"""


def q_sample_per_key_cap(sf_dir: str):
    """Per-source quota cap (the per-host/domain cap every web pipeline
    applies so one crawl-heavy site can't dominate): keep at most 30
    docs per source, chosen deterministically as the md5(doc_id)
    bottom-30 of each group. Per-batch combiner bounds the shuffle to
    k rows per (block, group)."""
    from ..ops.sampling import per_key_cap

    docs = _read(sf_dir, "documents", ["doc_id", "source"])
    return per_key_cap(docs, k=30, group_col="source", key="doc_id")


SQL_SAMPLE_PER_KEY_CAP = """
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rn
  FROM documents)
WHERE rn <= 30
"""


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination (GPT-3 appendix-C style n-gram
    overlap): docs with doc_id % 10 == 7 act as the held-out eval set;
    every other doc reports how many of its distinct word 3-grams also
    occur in the benchmark, plus a 0/1 contamination verdict at 20%
    overlap. Integer evidence columns keep the oracle compare
    float-free except the threshold test (same IEEE division on both
    sides)."""
    from ..ops.dedup_text import decontaminate

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def part(keep_bench: bool):
        def fn(t: pa.Table) -> pa.Table:
            # doc_id % 10 (non-negative ids; pyarrow divide truncates)
            is_bench = pc.equal(
                pc.subtract(
                    t["doc_id"],
                    pc.multiply(pc.divide(t["doc_id"], 10), 10),
                ),
                7,
            )
            return t.filter(is_bench if keep_bench else pc.invert(is_bench))

        return fn

    bench = docs.map_batches(part(True), batch_format="pyarrow")
    train = docs.map_batches(part(False), batch_format="pyarrow")
    return decontaminate(train, bench, k=3, threshold=0.2)


SQL_DECONTAMINATE = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> x <> '') AS ts
  FROM documents
),
shingles AS (
  SELECT DISTINCT doc_id,
         ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
  FROM toks, UNNEST(range(1, len(ts) - 1)) AS g(i)
  WHERE len(ts) >= 3
  UNION
  SELECT DISTINCT doc_id, array_to_string(ts, ' ')
  FROM toks WHERE len(ts) > 0 AND len(ts) < 3
),
bench AS (SELECT DISTINCT shingle FROM shingles WHERE doc_id % 10 = 7),
train AS (SELECT * FROM shingles WHERE doc_id % 10 <> 7),
agg AS (
  SELECT t.doc_id,
         CAST(count(*) AS BIGINT) AS n_grams,
         CAST(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_hit
  FROM train t LEFT JOIN bench b USING (shingle)
  GROUP BY t.doc_id
)
SELECT doc_id, n_grams, n_hit,
       CAST(CASE WHEN n_hit * 1.0 / n_grams >= 0.2 THEN 1 ELSE 0 END
            AS BIGINT) AS contaminated
FROM agg
UNION ALL
SELECT doc_id, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
FROM toks WHERE len(ts) = 0 AND doc_id % 10 <> 7
"""


def q_embedding_near_dup_blocked(sf_dir: str):
    """Exact all-pairs near-dup with NO driver-side matrix: chunk-vs-chunk
    matmul tasks over object-store-resident normalized chunks."""
    from ..ops.dedup_text import embedding_near_dup_blocked

    return embedding_near_dup_blocked(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]), threshold=0.4
    )


SQL_EMBEDDING_NEAR_DUP_BLOCKED = """
SELECT a.vec_id AS a, b.vec_id AS b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
"""


def q_ann_bruteforce(sf_dir: str):
    from ..ops.similarity import brute_force_topk, query_vector

    q = query_vector(sf_dir, vec_id=0)
    return brute_force_topk(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]), q, k=5
    )


SQL_ANN_BRUTEFORCE = """
WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       round(list_cosine_similarity(embedding::DOUBLE[], (SELECT qe FROM q)), 6) AS cos
FROM embeddings
ORDER BY cos DESC, vec_id LIMIT 5
"""


def q_mode(sf_dir: str):
    """ARQ custom aggregate AggMode (expr/aggregate/AggMode.java): most
    frequent value per group, ties broken by value (deterministic)."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus"])

    def mode(g: pd.DataFrame) -> pd.DataFrame:
        counts = g.groupby("o_orderstatus").size()
        best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        return pd.DataFrame(
            {"o_orderpriority": [g["o_orderpriority"].iloc[0]], "mode_status": [best]}
        )

    return ds.groupby("o_orderpriority").map_groups(mode, batch_format="pandas")


SQL_MODE = """
SELECT o_orderpriority,
       (SELECT o_orderstatus FROM orders o2
        WHERE o2.o_orderpriority = o1.o_orderpriority
        GROUP BY o_orderstatus
        ORDER BY count(*) DESC, o_orderstatus LIMIT 1) AS mode_status
FROM orders o1 GROUP BY o_orderpriority
"""


def q_fold_collect(sf_dir: str):
    """CDT FOLD aggregate (AggFoldList.java): collect group values into an
    ordered list — realized as sorted list per group."""
    ds = _read(sf_dir, "nation", ["n_regionkey", "n_name"])

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        # list rendered canonically (drivers hash strings, not nested lists)
        return pd.DataFrame(
            {"n_regionkey": [g["n_regionkey"].iloc[0]],
             "names": ["[" + ",".join(sorted(g["n_name"])) + "]"]}
        )

    return ds.groupby("n_regionkey").map_groups(fold, batch_format="pandas")


SQL_FOLD_COLLECT = """
SELECT n_regionkey,
       '[' || array_to_string(list_sort(list(n_name)), ',') || ']' AS names
FROM nation GROUP BY n_regionkey
"""


def q_facet_counts(sf_dir: str):
    """The fork's Lucene faceting surface (TextIndexLucene.java:983,
    docs/FEAT_FACETS_SPEC.md) reduces to a grouped count over facet
    fields."""
    from ray.data.aggregate import Count

    return (
        _read(sf_dir, "documents", ["lang", "source"])
        .groupby(["lang", "source"])
        .aggregate(Count(alias_name="n"))
    )


SQL_FACET_COUNTS = """
SELECT lang, source, count(*) AS n FROM documents GROUP BY lang, source
"""


def q_control_flow(sf_dir: str):
    """E_If / E_Coalesce / E_EBV control functions (expr/E_*.java) —
    vectorized if_else / coalesce kernels."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderstatus"])

    def fn(b: pa.Table) -> pa.Table:
        big = pc.greater(b["o_totalprice"], 200000.0)
        size_class = pc.if_else(
            big, pa.scalar("big"),
            pc.if_else(pc.greater(b["o_totalprice"], 50000.0),
                       pa.scalar("mid"), pa.scalar("small")),
        )
        status_o = pc.if_else(
            pc.equal(b["o_orderstatus"], "O"),
            pa.scalar(None, pa.string()), b["o_orderstatus"],
        )
        effective = pc.coalesce(status_o, pa.scalar("OPEN"))
        return pa.Table.from_arrays(
            [b["o_orderkey"].combine_chunks(), size_class.combine_chunks(),
             effective.combine_chunks()],
            names=["o_orderkey", "size_class", "effective_status"],
        )

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_CONTROL_FLOW = """
SELECT o_orderkey,
       CASE WHEN o_totalprice > 200000 THEN 'big'
            WHEN o_totalprice > 50000 THEN 'mid'
            ELSE 'small' END AS size_class,
       coalesce(CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_orderstatus END,
                'OPEN') AS effective_status
FROM orders
"""


def q_unnest(sf_dir: str):
    """Property-function list unnesting (list:member,
    sparql/pfunction/library/) — flat_map a list column to rows."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def explode(b: pa.Table) -> pa.Table:
        import numpy as np

        ids = b["vec_id"].to_pylist()
        embs = b["embedding"].to_pylist()
        out_id, out_pos, out_val = [], [], []
        for vid, e in zip(ids, embs):
            if vid % 50 != 0:  # keep output size sane
                continue
            for pos, v in enumerate(e):
                out_id.append(vid)
                out_pos.append(pos + 1)
                out_val.append(np.float32(v))
        return pa.table(
            {"vec_id": pa.array(out_id, pa.int64()),
             "pos": pa.array(out_pos, pa.int64()),
             "val": pa.array(out_val, pa.float32())}
        )

    return ds.map_batches(explode, batch_format="pyarrow")


SQL_UNNEST = """
SELECT vec_id, generate_subscripts(embedding, 1) AS pos, unnest(embedding) AS val
FROM embeddings WHERE vec_id % 50 = 0
"""


# --------------------------------------------------------------------------
# §2.9 property paths — a fixed-length path (P_Seq composition): parts
# reachable from one customer via orders/lineitem, as broadcast semi-joins
# --------------------------------------------------------------------------


def q_path_2hop(sf_dir: str):
    import ray

    hop1 = (
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
        .map_batches(
            lambda b: b.filter(pc.equal(b["o_custkey"], 1)), batch_format="pyarrow"
        )
        .unique("o_orderkey")
    )
    ref = ray.put(set(hop1))

    def hop2(b: pa.Table) -> pa.Table:
        import ray as _ray

        keys = _ray.get(ref)
        t = b.filter(pa.array([k in keys for k in b["l_orderkey"].to_pylist()]))
        return pa.Table.from_arrays(
            [t["l_partkey"].combine_chunks()], names=["l_partkey"]
        )

    return (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
        .map_batches(hop2, batch_format="pyarrow")
        .groupby("l_partkey")
        .count()
        .select_columns(["l_partkey"])
    )


SQL_PATH_2HOP = """
SELECT DISTINCT l_partkey
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_custkey = 1
"""


# --------------------------------------------------------------------------
# §2.9 general property paths (sparql/path/eval/PathEval*.java) — the
# membership graph customer/supplier -in_nation-> nation -in_region-> region
# --------------------------------------------------------------------------


def _membership_edges(sf_dir: str):
    """(s, p, o) edge Dataset: c:<k> -in_nation-> n:<k> (customers),
    s:<k> -in_nation-> n:<k> (suppliers), n:<k> -in_region-> r:<k>."""

    def tag(prefix_s, key_s, pred, prefix_o, key_o):
        def f(t: pa.Table) -> pa.Table:
            s = pc.binary_join_element_wise(
                pa.scalar(prefix_s, pa.large_string()),
                pc.cast(t[key_s], pa.large_string()),
                pa.scalar("", pa.large_string()),
            )
            o = pc.binary_join_element_wise(
                pa.scalar(prefix_o, pa.large_string()),
                pc.cast(t[key_o], pa.large_string()),
                pa.scalar("", pa.large_string()),
            )
            return pa.table(
                {"s": s, "p": pa.array([pred] * t.num_rows, pa.large_string()), "o": o}
            )

        return f

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        tag("c:", "c_custkey", "in_nation", "n:", "c_nationkey"),
        batch_format="pyarrow",
    )
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
        tag("s:", "s_suppkey", "in_nation", "n:", "s_nationkey"),
        batch_format="pyarrow",
    )
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).map_batches(
        tag("n:", "n_nationkey", "in_region", "r:", "n_regionkey"),
        batch_format="pyarrow",
    )
    return cust.union(supp).union(nat)


def q_path_star_alt(sf_dir: str):
    """(in_nation|in_region)* from seed customers — P_ZeroOrMore1 over
    P_Alt (PathEval.java, P_Alt.java): seeded semi-naive closure,
    zero-length pairs included per the spec."""
    from ..ops.paths import Alt, Link, Star, eval_path

    seeds = [f"c:{k}" for k in range(20)]
    return eval_path(
        _membership_edges(sf_dir),
        Star(Alt(Link("in_nation"), Link("in_region"))),
        seeds=seeds,
    )


SQL_PATH_STAR_ALT = """
WITH RECURSIVE edges AS (
  SELECT 'c:' || c_custkey AS s, 'n:' || c_nationkey AS o FROM customer
  UNION ALL SELECT 's:' || s_suppkey, 'n:' || s_nationkey FROM supplier
  UNION ALL SELECT 'n:' || n_nationkey, 'r:' || n_regionkey FROM nation
),
seeds AS (
  SELECT 'c:' || c_custkey AS v FROM customer WHERE c_custkey < 20
),
reach(start, "end") AS (
  SELECT v, v FROM seeds
  UNION
  SELECT r.start, e.o FROM reach r JOIN edges e ON r."end" = e.s
)
SELECT DISTINCT start, "end" FROM reach
"""


def q_path_nested_closure(sf_dir: str):
    """(in_nation*/in_region)+ from seed customers — a closure whose
    step CONTAINS another closure (P_OneOrMore1 over P_Seq over
    P_ZeroOrMore1): the step is re-evaluated seeded by the frontier
    each round (_closure/_step_needs_seeding) instead of materializing
    the inner closure unseeded."""
    from ..ops.paths import Link, Plus, Seq, Star, eval_path

    seeds = [f"c:{k}" for k in range(20)]
    return eval_path(
        _membership_edges(sf_dir),
        Plus(Seq(Star(Link("in_nation")), Link("in_region"))),
        seeds=seeds,
    )


SQL_PATH_NESTED_CLOSURE = """
WITH RECURSIVE cn AS (
  SELECT 'c:' || c_custkey AS s, 'n:' || c_nationkey AS o FROM customer
  UNION ALL SELECT 's:' || s_suppkey, 'n:' || s_nationkey FROM supplier
),
nr AS (
  SELECT 'n:' || n_nationkey AS s, 'r:' || n_regionkey AS o FROM nation
),
-- the step relation in_nation*/in_region: zero in_nation hops (nr
-- directly) or one+ (the data is bipartite, so * collapses to 0-or-1)
step AS (
  SELECT s, o FROM nr
  UNION SELECT cn.s, nr.o FROM cn JOIN nr ON cn.o = nr.s
),
seeds AS (
  SELECT 'c:' || c_custkey AS v FROM customer WHERE c_custkey < 20
),
reach(start, "end") AS (
  SELECT seeds.v, step.o FROM seeds JOIN step ON step.s = seeds.v
  UNION
  SELECT r.start, step.o FROM reach r JOIN step ON step.s = r."end"
)
SELECT DISTINCT start, "end" FROM reach
"""


def q_path_inverse_seq(sf_dir: str):
    """^in_region/^in_nation from region seeds — P_Seq of two P_Inverse
    links (PathEval.java evalInverse): region → its nations → their
    members (customers AND suppliers)."""
    from ..ops.paths import Inv, Link, Seq, eval_path

    import pyarrow.parquet as pq

    rkeys = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey"])[
        "r_regionkey"
    ].to_pylist()
    seeds = [f"r:{k}" for k in rkeys]
    return eval_path(
        _membership_edges(sf_dir),
        Seq(Inv(Link("in_region")), Inv(Link("in_nation"))),
        seeds=seeds,
    )


SQL_PATH_INVERSE_SEQ = """
SELECT DISTINCT 'r:' || n_regionkey AS start, 'c:' || c_custkey AS "end"
FROM nation JOIN customer ON c_nationkey = n_nationkey
UNION
SELECT DISTINCT 'r:' || n_regionkey, 's:' || s_suppkey
FROM nation JOIN supplier ON s_nationkey = n_nationkey
"""


def q_path_star_seq(sf_dir: str):
    """(in_nation/in_region)* — P_ZeroOrMore1 over P_Seq: the closure's
    STEP is a sequence, so each round re-evaluates the Seq SEEDED by the
    current frontier (PathEval.java; materializing p∘q unseeded is a
    frontier-independent join). Zero-length pairs included."""
    from ..ops.paths import Link, Seq, Star, eval_path

    seeds = [f"c:{k}" for k in range(20)]
    return eval_path(
        _membership_edges(sf_dir),
        Star(Seq(Link("in_nation"), Link("in_region"))),
        seeds=seeds,
    )


SQL_PATH_STAR_SEQ = """
WITH RECURSIVE comp AS (
  -- one application of in_nation/in_region
  SELECT 'c:' || c_custkey AS s, 'r:' || n_regionkey AS o
  FROM customer JOIN nation ON n_nationkey = c_nationkey
  UNION ALL
  SELECT 's:' || s_suppkey, 'r:' || n_regionkey
  FROM supplier JOIN nation ON n_nationkey = s_nationkey
),
seeds AS (SELECT 'c:' || c_custkey AS v FROM customer WHERE c_custkey < 20),
reach(start, "end") AS (
  SELECT v, v FROM seeds
  UNION
  SELECT r.start, c.o FROM reach r JOIN comp c ON r."end" = c.s
)
SELECT DISTINCT start, "end" FROM reach
"""


def q_path_seq_star(sf_dir: str):
    """in_nation/in_region* — a closure ELEMENT inside P_Seq: seeds
    propagate through the sequence (each element seeded by the previous
    frontier, kept as a Dataset — the round-2 'closure-under-Seq' gap)."""
    from ..ops.paths import Link, Seq, Star, eval_path

    seeds = [f"c:{k}" for k in range(30)]
    return eval_path(
        _membership_edges(sf_dir),
        Seq(Link("in_nation"), Star(Link("in_region"))),
        seeds=seeds,
    )


SQL_PATH_SEQ_STAR = """
WITH RECURSIVE
hop1 AS (
  SELECT 'c:' || c_custkey AS start, 'n:' || c_nationkey AS "end"
  FROM customer WHERE c_custkey < 30
),
edges AS (
  SELECT 'n:' || n_nationkey AS s, 'r:' || n_regionkey AS o FROM nation
),
reach(start, "end") AS (
  SELECT start, "end" FROM hop1          -- zero-length of the star
  UNION
  SELECT r.start, e.o FROM reach r JOIN edges e ON r."end" = e.s
)
SELECT DISTINCT start, "end" FROM reach
"""


def _membership_triples(sf_dir: str):
    """The membership edge table shaped as triple columns for the BGP
    engine (s_lex, p, o_lex)."""
    return _membership_edges(sf_dir).map_batches(
        lambda t: t.rename_columns(["s_lex", "p", "o_lex"]) if t.num_columns else t,
        batch_format="pyarrow",
    )


def q_sparql_select(sf_dir: str):
    """SPARQL text front door (SPARQLParser → Algebra.compile →
    OpExecutor chain, rebuilt as ops/sparql.py → ops/bgp.py): a SELECT
    with a 2-pattern BGP and an inequality FILTER, executed as chained
    hash joins + a vectorized filter."""
    from ..ops.sparql import sparql_select

    return sparql_select(
        _membership_triples(sf_dir),
        """
        SELECT ?c ?n WHERE {
          ?c <in_nation> ?n .
          ?n <in_region> ?r .
          FILTER(?r != "r:0")
        }
        """,
    )


SQL_SPARQL_SELECT = """
WITH members AS (
  SELECT 'c:' || c_custkey AS m, 'n:' || c_nationkey AS n FROM customer
  UNION ALL SELECT 's:' || s_suppkey, 'n:' || s_nationkey FROM supplier
)
SELECT m AS c, members.n AS n
FROM members JOIN nation ON members.n = 'n:' || n_nationkey
WHERE n_regionkey <> 0
"""


def q_sparql_aggregate(sf_dir: str):
    """SPARQL GROUP BY + COUNT through the text front-end (the aggregate
    algebra OpGroup/AggCount compiled to Dataset.groupby().aggregate)."""
    from ..ops.sparql import sparql_select

    return sparql_select(
        _membership_triples(sf_dir),
        """
        SELECT ?n (COUNT(?c) AS ?members) WHERE {
          ?c <in_nation> ?n .
        } GROUP BY ?n
        """,
    )


SQL_SPARQL_AGGREGATE = """
WITH members AS (
  SELECT 'c:' || c_custkey AS m, 'n:' || c_nationkey AS n FROM customer
  UNION ALL SELECT 's:' || s_suppkey, 'n:' || s_nationkey FROM supplier
)
SELECT n, CAST(count(*) AS BIGINT) AS members FROM members GROUP BY n
"""


def _typed_price_triples(sf_dir: str):
    """part → typed-literal triple table (term metadata columns included):

    - <price_c>: integer-cent price, xsd:integer — the value-typed column
    - <price_c>: numeric-LOOKING decoys typed xsd:string (partkey+10M) —
      a term-typed FILTER must exclude them; a lexical-cast engine would
      wrongly admit every one
    - <price_d>: decoy-free integer-cent price for the ORDER BY query
    """
    import numpy as np

    from ..model import KIND_IRI, KIND_LITERAL, XSD_NS, XSD_STRING

    xsd_int = XSD_NS + "integer"

    def to_triples(b: pa.Table) -> pa.Table:
        keys = b["p_partkey"].to_numpy(zero_copy_only=False)
        cents = np.floor(
            b["p_retailprice"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        s = [f"p:{k}" for k in keys]
        price_lex = [str(c) for c in cents]
        decoy_lex = [str(int(k) + 10_000_000) for k in keys]
        n = len(s)
        return pa.table(
            {
                "s_kind": pa.array([KIND_IRI] * (3 * n), pa.int8()),
                "s_lex": pa.array(s * 3, pa.large_string()),
                "p": pa.array(
                    ["price_c"] * n + ["price_c"] * n + ["price_d"] * n,
                    pa.large_string(),
                ),
                "o_kind": pa.array([KIND_LITERAL] * (3 * n), pa.int8()),
                "o_lex": pa.array(
                    price_lex + decoy_lex + price_lex, pa.large_string()
                ),
                "o_datatype": pa.array(
                    [xsd_int] * n + [XSD_STRING] * n + [xsd_int] * n,
                    pa.large_string(),
                ),
                "o_lang": pa.array([""] * (3 * n), pa.large_string()),
            }
        )

    return _read(sf_dir, "part", ["p_partkey", "p_retailprice"]).map_batches(
        to_triples, batch_format="pyarrow"
    )


def q_sparql_filter_typed(sf_dir: str):
    """Term-typed FILTER semantics through the SPARQL front door
    (NodeValue.java value spaces): FILTER(?price > 90000) over literals
    typed xsd:integer admits only the numeric value space — the
    xsd:string decoys under the same predicate (numeric-looking lexical
    forms, all > the threshold as numbers) must be excluded."""
    from ..ops.sparql import sparql_select

    return sparql_select(
        _typed_price_triples(sf_dir),
        """
        SELECT ?s ?price WHERE {
          ?s <price_c> ?price .
          FILTER(?price > 90000)
        }
        """,
    )


SQL_SPARQL_FILTER_TYPED = """
SELECT 'p:' || CAST(p_partkey AS VARCHAR) AS s,
       CAST(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS VARCHAR)
         AS price
FROM part WHERE floor(p_retailprice * 100 + 0.5) > 90000
"""


def q_sparql_order_typed(sf_dir: str):
    """SPARQL term ordering (BindingComparator.java): ORDER BY DESC over
    xsd:integer literals sorts by numeric VALUE — lexical ordering would
    rank "99995" above "100000"."""
    from ..ops.sparql import sparql_select

    return sparql_select(
        _typed_price_triples(sf_dir),
        """
        SELECT ?s ?price WHERE { ?s <price_d> ?price }
        ORDER BY DESC(?price) ?s LIMIT 10
        """,
    )


SQL_SPARQL_ORDER_TYPED = """
SELECT 'p:' || CAST(p_partkey AS VARCHAR) AS s,
       CAST(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS VARCHAR)
         AS price
FROM part
ORDER BY floor(p_retailprice * 100 + 0.5) DESC,
         'p:' || CAST(p_partkey AS VARCHAR) LIMIT 10
"""


def q_sparql_having(sf_dir: str):
    """HAVING with an INLINE aggregate call (HAVING (COUNT(?c) > 6)),
    rewritten onto the projected alias (AggCount via OpGroup + the
    HAVING filter — sparql11/aggregates agg03's shape)."""
    from ..ops.sparql import sparql_select

    return sparql_select(
        _membership_triples(sf_dir),
        """
        SELECT ?n (COUNT(?c) AS ?members) WHERE {
          ?c <in_nation> ?n .
        } GROUP BY ?n HAVING (COUNT(?c) > 6)
        """,
    )


SQL_SPARQL_HAVING = """
WITH members AS (
  SELECT 'c:' || c_custkey AS m, 'n:' || c_nationkey AS n FROM customer
  UNION ALL SELECT 's:' || s_suppkey, 'n:' || s_nationkey FROM supplier
)
SELECT n, CAST(count(*) AS BIGINT) AS members FROM members GROUP BY n
HAVING count(*) > 6
"""


def q_sparql_values(sf_dir: str):
    """Inline VALUES data block joined against the BGP (§10.2 inline
    data; OpTable ⋈ OpBGP)."""
    from ..ops.sparql import sparql_select

    return sparql_select(
        _membership_triples(sf_dir),
        """
        SELECT ?c ?n WHERE {
          VALUES ?r { "r:0" "r:2" }
          ?n <in_region> ?r .
          ?c <in_nation> ?n .
        }
        """,
    )


SQL_SPARQL_VALUES = """
WITH members AS (
  SELECT 'c:' || c_custkey AS m, 'n:' || c_nationkey AS n FROM customer
  UNION ALL SELECT 's:' || s_suppkey, 'n:' || s_nationkey FROM supplier
)
SELECT m AS c, members.n AS n
FROM members JOIN nation ON members.n = 'n:' || n_nationkey
WHERE n_regionkey IN (0, 2)
"""


def q_sparql_offset(sf_dir: str):
    """OFFSET without LIMIT after a total ORDER BY (OpSlice over an
    ordered solution sequence)."""
    from ..ops.sparql import sparql_select

    return sparql_select(
        _membership_triples(sf_dir),
        """
        SELECT ?c ?n WHERE { ?c <in_nation> ?n }
        ORDER BY ?c ?n OFFSET 40
        """,
    )


SQL_SPARQL_OFFSET = """
WITH members AS (
  SELECT 'c:' || c_custkey AS m, 'n:' || c_nationkey AS n FROM customer
  UNION ALL SELECT 's:' || s_suppkey, 'n:' || s_nationkey FROM supplier
)
SELECT m AS c, n FROM members ORDER BY m, n OFFSET 40
"""


def _order_date_triples(sf_dir: str):
    """orders → (o:<key>, <odate>, ISO-date xsd:date literal) triples."""
    from ..model import KIND_IRI, KIND_LITERAL, XSD_NS

    xsd_date = XSD_NS + "date"

    def to_triples(b: pa.Table) -> pa.Table:
        keys = b["o_orderkey"].to_pylist()
        dates = [str(d) for d in b["o_orderdate"].to_pylist()]
        n = len(keys)
        return pa.table(
            {
                "s_kind": pa.array([KIND_IRI] * n, pa.int8()),
                "s_lex": pa.array([f"o:{k}" for k in keys],
                                  pa.large_string()),
                "p": pa.array(["odate"] * n, pa.large_string()),
                "o_kind": pa.array([KIND_LITERAL] * n, pa.int8()),
                "o_lex": pa.array(dates, pa.large_string()),
                "o_datatype": pa.array([xsd_date] * n, pa.large_string()),
                "o_lang": pa.array([""] * n, pa.large_string()),
            }
        )

    return _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
        to_triples, batch_format="pyarrow"
    )


def q_sparql_year(sf_dir: str):
    """YEAR()/MONTH() date accessors through the front door
    (E_DateTimeYear/Month) with a numeric FILTER on the bound result."""
    from ..ops.sparql import sparql_select

    return sparql_select(
        _order_date_triples(sf_dir),
        """
        SELECT ?o ?y ?m WHERE {
          ?o <odate> ?d .
          BIND(YEAR(?d) AS ?y)
          BIND(MONTH(?d) AS ?m)
          FILTER(?y >= 1996)
        }
        """,
    )


SQL_SPARQL_YEAR = """
SELECT 'o:' || CAST(o_orderkey AS VARCHAR) AS o,
       CAST(CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS VARCHAR) AS y,
       CAST(CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS VARCHAR) AS m
FROM orders WHERE EXTRACT(year FROM o_orderdate) >= 1996
"""


def q_sparql_construct_where(sf_dir: str):
    """CONSTRUCT WHERE shortform (§10.2.2): the pattern doubles as the
    template, emitting a TRIPLE_SCHEMA table."""
    from ..ops.sparql import sparql_construct

    return sparql_construct(
        _membership_triples(sf_dir),
        "CONSTRUCT WHERE { ?n <in_region> ?r }",
    )


SQL_SPARQL_CONSTRUCT_WHERE = """
SELECT CAST(0 AS TINYINT) AS s_kind,
       'n:' || CAST(n_nationkey AS VARCHAR) AS s_lex,
       'in_region' AS p,
       CAST(2 AS TINYINT) AS o_kind,
       'r:' || CAST(n_regionkey AS VARCHAR) AS o_lex,
       '' AS o_datatype,
       '' AS o_lang,
       '' AS g,
       'construct' AS doc_id
FROM nation
"""


def q_sparql_subquery(sf_dir: str):
    """Aggregate subquery joined into the outer group (OpGroup nested
    under OpJoin — the 'per-key aggregate then enrich' SPARQL idiom)."""
    from ..ops.sparql import sparql_select

    return sparql_select(
        _membership_triples(sf_dir),
        """
        SELECT ?n ?r ?members WHERE {
          ?n <in_region> ?r .
          { SELECT ?n (COUNT(?c) AS ?members) WHERE {
              ?c <in_nation> ?n .
            } GROUP BY ?n }
        }
        """,
    )


SQL_SPARQL_SUBQUERY = """
WITH members AS (
  SELECT 'c:' || c_custkey AS m, 'n:' || c_nationkey AS n FROM customer
  UNION ALL SELECT 's:' || s_suppkey, 'n:' || s_nationkey FROM supplier
),
counts AS (SELECT n, CAST(count(*) AS BIGINT) AS members FROM members GROUP BY n)
SELECT counts.n AS n, 'r:' || n_regionkey AS r, members
FROM counts JOIN nation ON counts.n = 'n:' || n_nationkey
"""


def q_sparql_graph(sf_dir: str):
    """GRAPH ?g pattern (OpGraph / engine/main/OpExecutor execute(OpGraph)):
    membership triples partitioned into per-region named graphs; the
    graph variable binds and projects alongside the pattern vars."""
    import pyarrow.parquet as pq

    from ..ops.sparql import sparql_select

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_regionkey"])
    region_of = dict(zip(nat["n_nationkey"].to_pylist(),
                         nat["n_regionkey"].to_pylist()))

    def with_graph(t: pa.Table) -> pa.Table:
        # graph name = the region of the edge's nation endpoint
        gs = []
        for p, o, s in zip(t["p"].to_pylist(), t["o"].to_pylist(),
                           t["s"].to_pylist()):
            nkey = int((o if p == "in_nation" else s)[2:])
            gs.append(f"g:{region_of[nkey]}")
        return pa.table(
            {
                "s_lex": t["s"].combine_chunks().cast(pa.large_string()),
                "p": t["p"].combine_chunks().cast(pa.large_string()),
                "o_lex": t["o"].combine_chunks().cast(pa.large_string()),
                "g": pa.array(gs, pa.large_string()),
            }
        )

    quads = _membership_edges(sf_dir).map_batches(with_graph, batch_format="pyarrow")
    return sparql_select(
        quads,
        """
        SELECT ?g ?c ?n WHERE { GRAPH ?g { ?c <in_nation> ?n } }
        """,
    )


SQL_SPARQL_GRAPH = """
WITH members AS (
  SELECT 'c:' || c_custkey AS m, c_nationkey AS nk FROM customer
  UNION ALL SELECT 's:' || s_suppkey, s_nationkey FROM supplier
)
SELECT 'g:' || n_regionkey AS g, m AS c, 'n:' || nk AS n
FROM members JOIN nation ON nk = n_nationkey
"""


def q_sparql_optional(sf_dir: str):
    """OPTIONAL through the text front-end (OpLeftJoin): every nation
    keeps its region edge; the member edge is optional, unmatched →
    null, rendered as an empty string for the float-free oracle compare
    (COALESCE in SQL)."""
    from ..ops.sparql import sparql_select

    out = sparql_select(
        _membership_triples(sf_dir),
        """
        SELECT ?n ?r ?c WHERE {
          ?n <in_region> ?r .
          OPTIONAL { ?c <in_nation> ?n . FILTER(STRSTARTS(?c, "s:")) }
        }
        """,
    )

    def null_to_empty(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return t
        return pa.table(
            {
                "n": t["n"].combine_chunks(),
                "r": t["r"].combine_chunks(),
                "c": pc.fill_null(t["c"].combine_chunks(), ""),
            }
        )

    return out.map_batches(null_to_empty, batch_format="pyarrow")


SQL_SPARQL_OPTIONAL = """
WITH suppliers AS (
  SELECT 's:' || s_suppkey AS m, s_nationkey AS nk FROM supplier
)
SELECT 'n:' || n_nationkey AS n, 'r:' || n_regionkey AS r,
       COALESCE(m, '') AS c
FROM nation LEFT JOIN suppliers ON nk = n_nationkey
"""


def q_sparql_exists(sf_dir: str):
    """FILTER EXISTS / NOT EXISTS through the text front-end (E_Exists /
    E_NotExists over OpFilter, ExprTransformSubstitute semantics):
    members of region-1 nations (semi join on ?n), excluding the nation
    customer 5 lives in (anti join on ?n)."""
    from ..ops.sparql import sparql_select

    return sparql_select(
        _membership_triples(sf_dir),
        """
        SELECT ?m ?n WHERE {
          ?m <in_nation> ?n .
          FILTER EXISTS { ?n <in_region> "r:1" }
          FILTER NOT EXISTS { <c:5> <in_nation> ?n }
        }
        """,
    )


SQL_SPARQL_EXISTS = """
WITH members AS (
  SELECT 'c:' || c_custkey AS m, 'n:' || c_nationkey AS n FROM customer
  UNION ALL SELECT 's:' || s_suppkey, 'n:' || s_nationkey FROM supplier
)
SELECT m, n FROM members
WHERE EXISTS (SELECT 1 FROM nation
              WHERE 'n:' || n_nationkey = members.n AND n_regionkey = 1)
  AND NOT EXISTS (SELECT 1 FROM customer
                  WHERE c_custkey = 5 AND 'n:' || c_nationkey = members.n)
"""


def _name_triples(sf_dir: str):
    """customer → (s_lex='c:<key>', p='name', o_lex=c_name) triple table
    for the string-builtin front-door queries."""

    def f(t: pa.Table) -> pa.Table:
        s = pc.binary_join_element_wise(
            pa.scalar("c:", pa.large_string()),
            pc.cast(t["c_custkey"], pa.large_string()),
            pa.scalar("", pa.large_string()),
        )
        return pa.table(
            {"s_lex": s,
             "p": pa.array(["name"] * t.num_rows, pa.large_string()),
             "o_lex": t["c_name"].combine_chunks().cast(pa.large_string())}
        )

    return _read(sf_dir, "customer", ["c_custkey", "c_name"]).map_batches(
        f, batch_format="pyarrow"
    )


def q_sparql_expr_funcs(sf_dir: str):
    """Scalar-function expressions through the text front-end (E_StrUpperCase,
    E_StrConcat, E_StrSubstring, E_StrAfter, E_Conditional, E_Multiply):
    SELECT (expr AS ?v) projections computed as vectorized BIND columns."""
    from ..ops.sparql import sparql_select

    return sparql_select(
        _name_triples(sf_dir),
        """
        SELECT ?c (UCASE(?n) AS ?u) (CONCAT(?n, "!") AS ?x)
               (SUBSTR(?n, 10) AS ?tail) (STRAFTER(?n, "#") AS ?num)
               (IF(CONTAINS(?n, "11"), "yes", "no") AS ?has11)
        WHERE { ?c <name> ?n . FILTER(STRENDS(?n, "1")) }
        """,
    )


SQL_SPARQL_EXPR_FUNCS = """
SELECT 'c:' || c_custkey AS c,
       upper(c_name) AS u,
       c_name || '!' AS x,
       substr(c_name, 10) AS tail,
       split_part(c_name, '#', 2) AS num,
       CASE WHEN position('11' IN c_name) > 0 THEN 'yes' ELSE 'no' END AS has11
FROM customer WHERE c_name LIKE '%1'
"""


def _size_triples(sf_dir: str):
    """part → (s_lex='p:<key>', p='size', o_lex=p_size) triple table for
    the math-function front-door queries (integer lexicals, exact)."""

    def f(t: pa.Table) -> pa.Table:
        s = pc.binary_join_element_wise(
            pa.scalar("p:", pa.large_string()),
            pc.cast(t["p_partkey"], pa.large_string()),
            pa.scalar("", pa.large_string()),
        )
        return pa.table(
            {"s_lex": s,
             "p": pa.array(["size"] * t.num_rows, pa.large_string()),
             "o_lex": pc.cast(t["p_size"], pa.large_string())}
        )

    return _read(sf_dir, "part", ["p_partkey", "p_size"]).map_batches(
        f, batch_format="pyarrow"
    )


def q_sparql_math_funcs(sf_dir: str):
    """The XPath math: library + fn: numeric operators through the front
    door (StandardFunctions.java loadStdDefs: Math_pow/Math_log10/
    Math_atan2/sqrt, Op_NumericMod, Op_NumericIntegerDivide,
    FN_Round_Half_Even) — all vectorized pyarrow.compute kernels.
    Irrational results are scaled+banker's-rounded to integers so the
    lexical forms compare exactly against the SQL oracle."""
    from ..ops.sparql import sparql_select

    return sparql_select(
        _size_triples(sf_dir),
        """
        PREFIX math: <http://www.w3.org/2005/xpath-functions/math#>
        PREFIX fn: <http://www.w3.org/2005/xpath-functions#>
        SELECT ?s (math:pow(?n, 2) AS ?sq)
               (fn:round-half-to-even(math:sqrt(?n) * 1000) AS ?rt)
               (fn:round-half-to-even(math:log10(?n) * 1000) AS ?lg)
               (fn:round-half-to-even(math:atan2(?n, 7) * 1000) AS ?at)
               (fn:numeric-mod(?n, 7) AS ?md)
               (fn:numeric-integer-divide(?n, 7) AS ?dv)
        WHERE { ?s <size> ?n . FILTER(?n > 0) }
        """,
    )


def q_sparql_format_number(sf_dir: str):
    """fn:format-number through the front door (FN_FormatNumber.java:37,
    XSDFuncOp.java:1757 formatNumber = java.text.DecimalFormat over a
    picture string; locale arg picks the DecimalFormatSymbols). Formats
    customer balances with grouping + fixed fraction in the root and
    'de' locales."""
    from ..ops.sparql import sparql_select

    def f(t: pa.Table) -> pa.Table:
        s = pc.binary_join_element_wise(
            pa.scalar("c:", pa.large_string()),
            pc.cast(t["c_custkey"], pa.large_string()),
            pa.scalar("", pa.large_string()),
        )
        return pa.table(
            {"s_lex": s,
             "p": pa.array(["bal"] * t.num_rows, pa.large_string()),
             "o_lex": pc.cast(t["c_acctbal"], pa.large_string())}
        )

    triples = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"]).map_batches(
        f, batch_format="pyarrow")
    return sparql_select(
        triples,
        """
        PREFIX fn: <http://www.w3.org/2005/xpath-functions#>
        SELECT ?s (fn:format-number(?b, '#,##0.00') AS ?en)
               (fn:format-number(?b, '#,##0.00', 'de') AS ?de)
        WHERE { ?s <bal> ?b }
        """,
    )


SQL_SPARQL_FORMAT_NUMBER = """
WITH fmt AS (
  SELECT 'c:' || CAST(c_custkey AS VARCHAR) AS s,
         CASE WHEN c_acctbal < 0 THEN '-' ELSE '' END
         || format('{:,}', CAST(trunc(abs(c_acctbal)) AS BIGINT))
         || '.'
         || lpad(CAST(CAST(round((abs(c_acctbal) - trunc(abs(c_acctbal)))
                                 * 100, 0) AS BIGINT) AS VARCHAR), 2, '0')
           AS en
  FROM customer
)
SELECT s, en,
       replace(replace(replace(en, ',', '#'), '.', ','), '#', '.') AS de
FROM fmt
"""


SQL_SPARQL_MATH_FUNCS = """
SELECT 'p:' || CAST(p_partkey AS VARCHAR) AS s,
       CAST(CAST(p_size AS BIGINT) * p_size AS VARCHAR) AS sq,
       CAST(CAST(round_even(sqrt(p_size) * 1000, 0) AS BIGINT) AS VARCHAR)
         AS rt,
       CAST(CAST(round_even(log10(p_size) * 1000, 0) AS BIGINT) AS VARCHAR)
         AS lg,
       CAST(CAST(round_even(atan2(p_size, 7) * 1000, 0) AS BIGINT)
            AS VARCHAR) AS at,
       CAST(p_size % 7 AS VARCHAR) AS md,
       CAST(p_size // 7 AS VARCHAR) AS dv
FROM part WHERE p_size > 0
"""


def q_sparql_group_concat(sf_dir: str):
    """GROUP_CONCAT + COUNT(DISTINCT) aggregates through the text
    front-end (AggGroupConcat / AggCountVarDistinct), both as distributed
    AggregateFn folds; within-group order pinned by sorting."""
    from ..ops.sparql import sparql_select

    return sparql_select(
        _membership_triples(sf_dir),
        """
        SELECT ?n (GROUP_CONCAT(?m ; SEPARATOR=",") AS ?members)
               (COUNT(DISTINCT ?m) AS ?k)
        WHERE { ?m <in_nation> ?n . FILTER(STRSTARTS(?m, "s:")) }
        GROUP BY ?n
        """,
    )


SQL_SPARQL_GROUP_CONCAT = """
WITH members AS (
  SELECT 's:' || s_suppkey AS m, 'n:' || s_nationkey AS n FROM supplier
)
SELECT n, string_agg(m, ',' ORDER BY m) AS members,
       CAST(count(DISTINCT m) AS BIGINT) AS k
FROM members GROUP BY n
"""


def q_sparql_update(sf_dir: str):
    """SPARQL 1.1 Update through the front door (UpdateEngineWorker
    analog): suppliers' in_nation edges are rewritten to moved_to via
    DELETE/INSERT WHERE — a distributed marker anti-join for the delete
    half and union + hash-partitioned exact dedup for the insert half."""
    from ..model import TRIPLE_SCHEMA
    from ..ops.sparql import sparql_update

    def widen(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ls = pa.large_string()
        return pa.Table.from_arrays(
            [
                pa.array([0] * n, pa.int8()),
                t["s"].combine_chunks().cast(ls),
                t["p"].combine_chunks().cast(ls),
                pa.array([2] * n, pa.int8()),
                t["o"].combine_chunks().cast(ls),
                pa.array([""] * n, ls),
                pa.array([""] * n, ls),
                pa.array([""] * n, ls),
                pa.array(["d0"] * n, ls),
            ],
            schema=TRIPLE_SCHEMA,
        )

    store = _membership_edges(sf_dir).map_batches(widen, batch_format="pyarrow")
    out = sparql_update(
        store,
        """
        DELETE { ?m <in_nation> ?n } INSERT { ?m <moved_to> ?n }
        WHERE { ?m <in_nation> ?n . FILTER(STRSTARTS(?m, "s:")) }
        """,
    )
    return out.map_batches(
        lambda t: t.select(["s_lex", "p", "o_lex"]) if t.num_columns else t,
        batch_format="pyarrow",
    )


SQL_SPARQL_UPDATE = """
WITH members AS (
  SELECT 'c:' || c_custkey AS m, 'n:' || c_nationkey AS n FROM customer
  UNION ALL SELECT 's:' || s_suppkey, 'n:' || s_nationkey FROM supplier
),
base AS (
  SELECT m AS s_lex, 'in_nation' AS p, n AS o_lex FROM members
  UNION ALL
  SELECT 'n:' || n_nationkey, 'in_region', 'r:' || n_regionkey FROM nation
)
SELECT s_lex, p, o_lex FROM base
WHERE NOT (p = 'in_nation' AND s_lex LIKE 's:%')
UNION ALL
SELECT m, 'moved_to', n FROM members WHERE m LIKE 's:%'
"""


def q_shacl_sparql(sf_dir: str):
    """SHACL SPARQL-based constraint (SHACL §5; jena-shacl
    engine/SparqlConstraints.java): customers become rdf:type-tagged
    focus nodes with an <acctbal> literal; the sh:sparql SELECT runs
    ONCE distributed through the ops/sparql front door and an inner
    hash join against the focus set yields one violation row per
    negative balance."""
    from ..stages.shacl import validate

    def f(t: pa.Table) -> pa.Table:
        n = t.num_rows
        s = pc.binary_join_element_wise(
            pa.scalar("c:", pa.large_string()),
            pc.cast(t["c_custkey"], pa.large_string()),
            pa.scalar("", pa.large_string()),
        )
        bal = pc.cast(t["c_acctbal"], pa.large_string())
        ls = pa.large_string()
        typ = pa.table({
            "s_kind": pa.array([0] * n, pa.int8()),
            "s_lex": s,
            "p": pa.array([RDF_TYPE] * n, ls),
            "o_kind": pa.array([0] * n, pa.int8()),
            "o_lex": pa.array(["http://x/Customer"] * n, ls),
            "o_datatype": pa.array([""] * n, ls),
            "o_lang": pa.array([""] * n, ls),
        })
        dat = pa.table({
            "s_kind": pa.array([0] * n, pa.int8()),
            "s_lex": s,
            "p": pa.array(["http://x/acctbal"] * n, ls),
            "o_kind": pa.array([2] * n, pa.int8()),
            "o_lex": bal,
            "o_datatype": pa.array(
                ["http://www.w3.org/2001/XMLSchema#decimal"] * n, ls),
            "o_lang": pa.array([""] * n, ls),
        })
        return pa.concat_tables([typ, dat])

    triples = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"]).map_batches(
        f, batch_format="pyarrow"
    )
    shapes = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    <http://x/S> a sh:NodeShape ;
      sh:targetClass <http://x/Customer> ;
      sh:sparql [
        sh:message "negative balance" ;
        sh:select "SELECT $this WHERE { $this <http://x/acctbal> ?v . FILTER(?v < 0) }" ;
      ] .
    """
    return validate(triples, shapes)


SQL_SHACL_SPARQL = """
SELECT 'c:' || c_custkey AS focus, '' AS path, 'sparql' AS "constraint",
       'negative balance' AS detail
FROM customer WHERE c_acctbal < 0
"""


def q_owl_transitive_in(sf_dir: str):
    """RDFS subPropertyOf + owl:TransitiveProperty combined (rulesys
    owl-fb.rules): in_nation ⊑ in, in_region ⊑ in, in transitive — the
    closure adds member-in-region triples. Output: distinct (s, o) of the
    derived 'in' relation."""
    from ray.data.aggregate import Count

    from ..model import KIND_IRI, RDF_TYPE, TRIPLE_SCHEMA
    from ..stages.owl import OWL_TRANSITIVE, owl_inference
    from ..stages.rdfs import RDFS_SUBPROPERTYOF, rdfs_inference

    def to_schema9(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_arrays(
            [
                pa.array([1] * n, pa.int8()),
                t["s"].combine_chunks().cast(pa.large_string()),
                t["p"].combine_chunks().cast(pa.large_string()),
                pa.array([1] * n, pa.int8()),
                t["o"].combine_chunks().cast(pa.large_string()),
                pa.array([""] * n, pa.large_string()),
                pa.array([""] * n, pa.large_string()),
                pa.array([""] * n, pa.large_string()),
                pa.array(["m"] * n, pa.large_string()),
            ],
            schema=TRIPLE_SCHEMA,
        )

    triples = _membership_edges(sf_dir).map_batches(to_schema9, batch_format="pyarrow")
    rdfs_schema = [
        (KIND_IRI, "in_nation", RDFS_SUBPROPERTYOF, KIND_IRI, "in", "", "", ""),
        (KIND_IRI, "in_region", RDFS_SUBPROPERTYOF, KIND_IRI, "in", "", "", ""),
    ]
    owl_schema = [(KIND_IRI, "in", RDF_TYPE, KIND_IRI, OWL_TRANSITIVE, "", "", "")]
    closed = owl_inference(rdfs_inference(triples, rdfs_schema), owl_schema)

    def project_in(t: pa.Table) -> pa.Table:
        x = t.filter(pc.equal(t["p"], "in"))
        return pa.table(
            {
                "s": x["s_lex"].combine_chunks().cast(pa.large_string()),
                "o": x["o_lex"].combine_chunks().cast(pa.large_string()),
            }
        )

    return (
        closed.map_batches(project_in, batch_format="pyarrow")
        .groupby(["s", "o"])
        .aggregate(Count(alias_name="cnt"))
        .select_columns(["s", "o"])
    )


SQL_OWL_TRANSITIVE_IN = """
WITH members AS (
  SELECT 'c:' || c_custkey AS m, 'n:' || c_nationkey AS n FROM customer
  UNION ALL SELECT 's:' || s_suppkey, 'n:' || s_nationkey FROM supplier
)
SELECT m AS s, n AS o FROM members
UNION
SELECT 'n:' || n_nationkey, 'r:' || n_regionkey FROM nation
UNION
SELECT members.m, 'r:' || n_regionkey
FROM members JOIN nation ON members.n = 'n:' || n_nationkey
"""


def q_rule_forward_chain(sf_dir: str):
    """User-supplied forward rules (jena-core reasoner/rulesys/Rule.java
    embedded syntax, BasicForwardRuleInfGraph closure) via
    stages/rules.forward_chain: two subPropertyOf-style lifting rules, a
    transitive rule, and a numeric-guard (``ge``) rule, over membership
    edges + customer account-balance literals. Output: the derived
    ('in' | 'rich') relation as (s, p, o)."""
    from ..model import KIND_IRI, KIND_LITERAL, TRIPLE_SCHEMA
    from ..stages.rules import forward_chain

    def to_schema9(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_arrays(
            [
                pa.array([KIND_IRI] * n, pa.int8()),
                t["s"].combine_chunks().cast(pa.large_string()),
                t["p"].combine_chunks().cast(pa.large_string()),
                pa.array([KIND_IRI] * n, pa.int8()),
                t["o"].combine_chunks().cast(pa.large_string()),
                pa.array([""] * n, pa.large_string()),
                pa.array([""] * n, pa.large_string()),
                pa.array([""] * n, pa.large_string()),
                pa.array(["m"] * n, pa.large_string()),
            ],
            schema=TRIPLE_SCHEMA,
        )

    def acct_triples(t: pa.Table) -> pa.Table:
        n = t.num_rows
        s = pc.binary_join_element_wise(
            pa.scalar("c:", pa.large_string()),
            pc.cast(t["c_custkey"], pa.large_string()),
            pa.scalar("", pa.large_string()),
        )
        return pa.Table.from_arrays(
            [
                pa.array([KIND_IRI] * n, pa.int8()),
                s,
                pa.array(["acct"] * n, pa.large_string()),
                pa.array([KIND_LITERAL] * n, pa.int8()),
                pc.cast(t["c_acctbal"], pa.large_string()),
                pa.array([""] * n, pa.large_string()),
                pa.array([""] * n, pa.large_string()),
                pa.array([""] * n, pa.large_string()),
                pa.array(["m"] * n, pa.large_string()),
            ],
            schema=TRIPLE_SCHEMA,
        )

    edges = _membership_edges(sf_dir).map_batches(
        to_schema9, batch_format="pyarrow"
    )
    acct = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"]).map_batches(
        acct_triples, batch_format="pyarrow"
    )
    rules = """
    [sub1: (?a <in_nation> ?b) -> (?a <in> ?b)]
    [sub2: (?a <in_region> ?b) -> (?a <in> ?b)]
    [trans: (?a <in> ?b) (?b <in> ?c) -> (?a <in> ?c)]
    [rich: (?c <acct> ?b) ge(?b 7500) -> (?c <rich> '1')]
    """
    out = forward_chain(edges.union(acct), rules)

    def project(t: pa.Table) -> pa.Table:
        x = t.filter(
            pc.is_in(t["p"], value_set=pa.array(["in", "rich"]))
        )
        return pa.table(
            {
                "s": x["s_lex"].combine_chunks().cast(pa.large_string()),
                "p": x["p"].combine_chunks().cast(pa.large_string()),
                "o": x["o_lex"].combine_chunks().cast(pa.large_string()),
            }
        )

    return out.map_batches(project, batch_format="pyarrow")


SQL_RULE_FORWARD_CHAIN = """
WITH RECURSIVE base AS (
  SELECT 'c:' || c_custkey AS s, 'n:' || c_nationkey AS o FROM customer
  UNION ALL SELECT 's:' || s_suppkey, 'n:' || s_nationkey FROM supplier
  UNION ALL SELECT 'n:' || n_nationkey, 'r:' || n_regionkey FROM nation
),
closure(s, o) AS (
  SELECT s, o FROM base
  UNION
  SELECT c.s, b.o FROM closure c JOIN base b ON c.o = b.s
)
SELECT DISTINCT s, 'in' AS p, o FROM closure
UNION ALL
SELECT DISTINCT 'c:' || c_custkey, 'rich', '1'
FROM customer WHERE c_acctbal >= 7500
"""


def q_rule_builtins(sf_dir: str):
    """Binder + noValue builtins in the forward-rule engine
    (reasoner/rulesys/builtins/ Sum.java, StrConcat.java, NoValue.java):
    per customer, sum the custkey and nationkey literals into a derived
    integer triple, tag nation-0 customers, and derive a default tag via
    negation-as-failure for everyone else."""
    from ..model import KIND_IRI, KIND_LITERAL, TRIPLE_SCHEMA
    from ..stages.rules import forward_chain

    def lit_triples(t: pa.Table) -> pa.Table:
        n = t.num_rows
        s = pc.binary_join_element_wise(
            pa.scalar("c:", pa.large_string()),
            pc.cast(t["c_custkey"], pa.large_string()),
            pa.scalar("", pa.large_string()),
        )
        ls = pa.large_string()

        def one(pred, col):
            return pa.Table.from_arrays(
                [
                    pa.array([KIND_IRI] * n, pa.int8()),
                    s,
                    pa.array([pred] * n, ls),
                    pa.array([KIND_LITERAL] * n, pa.int8()),
                    pc.cast(t[col], ls),
                    pa.array(
                        ["http://www.w3.org/2001/XMLSchema#integer"] * n, ls),
                    pa.array([""] * n, ls),
                    pa.array([""] * n, ls),
                    pa.array(["m"] * n, ls),
                ],
                schema=TRIPLE_SCHEMA,
            )

        return pa.concat_tables(
            [one("key", "c_custkey"), one("nk", "c_nationkey")]
        )

    triples = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        lit_triples, batch_format="pyarrow"
    )
    rules = """
    [tot: (?c <key> ?k) (?c <nk> ?n) sum(?k ?n ?t) -> (?c <tot> ?t)]
    [z: (?c <nk> '0'^^<http://www.w3.org/2001/XMLSchema#integer>)
        -> (?c <tag> 'zero')]
    [d: (?c <key> ?k) noValue(?c <nk> '0') -> (?c <tag> 'other')]
    """
    out = forward_chain(triples, rules)

    def project(t: pa.Table) -> pa.Table:
        x = t.filter(pc.is_in(t["p"], value_set=pa.array(["tot", "tag"])))
        return pa.table(
            {
                "s": x["s_lex"].combine_chunks().cast(pa.large_string()),
                "p": x["p"].combine_chunks().cast(pa.large_string()),
                "o": x["o_lex"].combine_chunks().cast(pa.large_string()),
            }
        )

    return out.map_batches(project, batch_format="pyarrow")


SQL_RULE_BUILTINS = """
SELECT 'c:' || c_custkey AS s, 'tot' AS p,
       CAST(c_custkey + c_nationkey AS VARCHAR) AS o
FROM customer
UNION ALL
SELECT 'c:' || c_custkey, 'tag',
       CASE WHEN c_nationkey = 0 THEN 'zero' ELSE 'other' END
FROM customer
"""


def q_rule_backward_query(sf_dir: str):
    """Goal-directed backward rules (LPBackwardRuleReasoner.java:39 /
    FBRuleReasoner hybrid) via the magic-set rewrite onto the
    distributed semi-naive engine (stages/magic.backward_query):
    ``in``-membership defined by three ``<-`` rules, queried with the
    REGION BOUND — only the goal-relevant closure is derived. The
    transitive rule's body is written object-first so the left-to-right
    sideways-information pass keeps the bound region flowing."""
    from ..model import KIND_IRI, TRIPLE_SCHEMA
    from ..stages.magic import backward_query

    def to_schema9(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_arrays(
            [
                pa.array([KIND_IRI] * n, pa.int8()),
                t["s"].combine_chunks().cast(pa.large_string()),
                t["p"].combine_chunks().cast(pa.large_string()),
                pa.array([KIND_IRI] * n, pa.int8()),
                t["o"].combine_chunks().cast(pa.large_string()),
                pa.array([""] * n, pa.large_string()),
                pa.array([""] * n, pa.large_string()),
                pa.array([""] * n, pa.large_string()),
                pa.array(["m"] * n, pa.large_string()),
            ],
            schema=TRIPLE_SCHEMA,
        )

    edges = _membership_edges(sf_dir).map_batches(
        to_schema9, batch_format="pyarrow"
    )
    rules = """
    [b1: (?a <in> ?b) <- (?a <in_nation> ?b)]
    [b2: (?a <in> ?b) <- (?a <in_region> ?b)]
    [tr: (?a <in> ?c) <- (?b <in> ?c) (?a <in> ?b)]
    """
    out = backward_query(edges, rules, "(?x <in> <r:0>)")

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {"s": t["x"].combine_chunks().cast(pa.large_string())}
        )

    return out.map_batches(project, batch_format="pyarrow")


SQL_RULE_BACKWARD_QUERY = """
WITH RECURSIVE base AS (
  SELECT 'c:' || c_custkey AS s, 'n:' || c_nationkey AS o FROM customer
  UNION ALL SELECT 's:' || s_suppkey, 'n:' || s_nationkey FROM supplier
  UNION ALL SELECT 'n:' || n_nationkey, 'r:' || n_regionkey FROM nation
),
closure(s, o) AS (
  SELECT s, o FROM base
  UNION
  SELECT c.s, b.o FROM closure c JOIN base b ON c.o = b.s
)
SELECT DISTINCT s FROM closure WHERE o = 'r:0'
"""


def q_bgp_match(sf_dir: str):
    """BGP solve (OpExecutor.java:127, StageMatchTriple.java):
    { ?c in_nation ?n . ?n in_region ?r } with a constant-object filter —
    two chained hash joins over the triple table + OpFilter tail."""
    from ..ops.bgp import Var, match_bgp, select

    b = match_bgp(
        _membership_triples(sf_dir),
        [
            (Var("c"), "in_nation", Var("n")),
            (Var("n"), "in_region", Var("r")),
        ],
    )
    return select(b, ["c", "n", "r"],
                  where=lambda t: pc.equal(t["r"], "r:0"))


SQL_BGP_MATCH = """
WITH members AS (
  SELECT 'c:' || c_custkey AS m, 'n:' || c_nationkey AS n FROM customer
  UNION ALL SELECT 's:' || s_suppkey, 'n:' || s_nationkey FROM supplier
)
SELECT m AS c, members.n AS n, 'r:' || n_regionkey AS r
FROM members JOIN nation ON members.n = 'n:' || n_nationkey
WHERE n_regionkey = 0
"""


def q_bgp_star_join(sf_dir: str):
    """Star-join BGP { ?a in_nation ?n . ?b in_nation ?n } + FILTER(?a<?b):
    self-join on the shared variable (QueryIterBlockTriples chaining),
    distinct co-national member pairs."""
    from ..ops.bgp import Var, match_bgp, select

    b = match_bgp(
        _membership_triples(sf_dir),
        [
            (Var("a"), "in_nation", Var("n")),
            (Var("b"), "in_nation", Var("n")),
        ],
    )
    return select(b, ["a", "b"], where=lambda t: pc.less(t["a"], t["b"]))


SQL_BGP_STAR_JOIN = """
WITH members AS (
  SELECT 'c:' || c_custkey AS m, 'n:' || c_nationkey AS n FROM customer
  UNION ALL SELECT 's:' || s_suppkey, 'n:' || s_nationkey FROM supplier
)
SELECT x.m AS a, y.m AS b
FROM members x JOIN members y ON x.n = y.n
WHERE x.m < y.m
"""


def q_path_negset(sf_dir: str):
    """!(in_nation) — P_NegPropSet (PathEval.java evalNegPropSet,
    P_NegPropSet.java): any forward edge whose predicate is NOT in the
    excluded set; only the in_region edges survive."""
    from ..ops.paths import NegSet, eval_path

    return eval_path(_membership_edges(sf_dir), NegSet(fwd=("in_nation",)))


SQL_PATH_NEGSET = """
SELECT DISTINCT 'n:' || n_nationkey AS start, 'r:' || n_regionkey AS "end"
FROM nation
"""


def q_cdt_list_funcs(sf_dir: str):
    """CDT function library through the SPARQL front door (the fork's
    cdt:List functions — jena-arq function/library/cdt/GetFct.java,
    SizeFct.java, TailFct.java): per customer a 2-element cdt:List
    literal "[custkey, nationkey]" is built, then cdt:size / cdt:get /
    cdt:tail are BIND-evaluated over it."""
    from ..ops.sparql import sparql_select

    def to_triples(t: pa.Table) -> pa.Table:
        ls = pa.large_string()
        key = pc.cast(t["c_custkey"], ls)
        nk = pc.cast(t["c_nationkey"], ls)
        s = pc.binary_join_element_wise(
            pa.scalar("c:", ls), key, pa.scalar("", ls))
        lst = pc.binary_join_element_wise(
            pa.scalar("[", ls), key, pa.scalar(", ", ls), nk,
            pa.scalar("]", ls), pa.scalar("", ls))
        return pa.table({
            "s_lex": s,
            "p": pa.array(["lst"] * t.num_rows, ls),
            "o_lex": lst,
            # data-graph CDT literals carry their datatype — the
            # function library type-checks its container arguments
            "o_datatype": pa.array(
                ["http://w3id.org/awslabs/neptune/SPARQL-CDTs/List"]
                * t.num_rows, ls),
        })

    triples = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]) \
        .map_batches(to_triples, batch_format="pyarrow")
    return sparql_select(
        triples,
        """
        PREFIX cdt: <http://w3id.org/awslabs/neptune/SPARQL-CDTs/>
        SELECT ?s ?size ?k ?nk ?tail WHERE {
          ?s <lst> ?l .
          BIND(cdt:size(?l) AS ?size)
          BIND(cdt:get(?l, 1) AS ?k)
          BIND(cdt:get(?l, 2) AS ?nk)
          BIND(cdt:tail(?l) AS ?tail)
        }
        """,
    )


SQL_CDT_LIST_FUNCS = """
SELECT 'c:' || c_custkey AS s,
       '2' AS size,
       CAST(c_custkey AS VARCHAR) AS k,
       CAST(c_nationkey AS VARCHAR) AS nk,
       '[' || c_nationkey || ']' AS tail
FROM customer
"""


def _balance_triples(sf_dir: str):
    """customer → triples: c:<k> <in_nation> n:<k> and c:<k> <bal>
    "<acctbal cents>"^^xsd:integer (term metadata columns included)."""
    from ..model import KIND_IRI, KIND_LITERAL, XSD_NS

    xsd_int = XSD_NS + "integer"

    def to_triples(b: pa.Table) -> pa.Table:
        import numpy as np

        keys = b["c_custkey"].to_numpy(zero_copy_only=False)
        nk = b["c_nationkey"].to_numpy(zero_copy_only=False)
        cents = np.floor(
            b["c_acctbal"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        s = [f"c:{k}" for k in keys]
        n = len(s)
        return pa.table({
            "s_kind": pa.array([KIND_IRI] * (2 * n), pa.int8()),
            "s_lex": pa.array(s * 2, pa.large_string()),
            "p": pa.array(["in_nation"] * n + ["bal"] * n,
                          pa.large_string()),
            "o_kind": pa.array(
                [KIND_IRI] * n + [KIND_LITERAL] * n, pa.int8()),
            "o_lex": pa.array(
                [f"n:{k}" for k in nk] + [str(c) for c in cents],
                pa.large_string()),
            "o_datatype": pa.array([""] * n + [xsd_int] * n,
                                   pa.large_string()),
            "o_lang": pa.array([""] * (2 * n), pa.large_string()),
        })

    return _read(
        sf_dir, "customer",
        ["c_custkey", "c_nationkey", "c_acctbal"],
    ).map_batches(to_triples, batch_format="pyarrow")


def q_sparql_agg_expr(sf_dir: str):
    """Aggregates INSIDE a projection expression (agg-err-01's shape,
    ExprAggregator rewrite): ((MIN(?b)+MAX(?b))/2 AS ?mid) compiles to
    hidden aggregates + a post-group bind over the aggregated
    relation."""
    from ..ops.sparql import sparql_select

    return sparql_select(
        _balance_triples(sf_dir),
        """
        SELECT ?n ((MIN(?b) + MAX(?b)) / 2 AS ?mid) WHERE {
          ?c <in_nation> ?n .
          ?c <bal> ?b .
        } GROUP BY ?n
        """,
    )


SQL_SPARQL_AGG_EXPR = """
WITH b AS (
  SELECT 'n:' || c_nationkey AS n,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS b
  FROM customer
)
SELECT n,
       CASE WHEN (MIN(b) + MAX(b)) % 2 = 0
            THEN CAST((MIN(b) + MAX(b)) // 2 AS VARCHAR)
            ELSE CAST(CAST(MIN(b) + MAX(b) AS DOUBLE) / 2 AS VARCHAR)
       END AS mid
FROM b GROUP BY n
"""


def q_sparql_order_expr(sf_dir: str):
    """ORDER BY over an EXPRESSION condition (query-sort-numbers's
    shape): the condition compiles to a hidden pre-projection BIND and
    the term sort runs on the computed column."""
    from ..ops.sparql import sparql_select

    return sparql_select(
        _typed_price_triples(sf_dir),
        """
        SELECT ?s ?price WHERE { ?s <price_d> ?price }
        ORDER BY DESC(?price * 2) ?s LIMIT 10
        """,
    )


SQL_SPARQL_ORDER_EXPR = SQL_SPARQL_ORDER_TYPED


def q_sparql_exists_expr(sf_dir: str):
    """EXISTS nested inside a filter EXPRESSION (subset-02's shape):
    FILTER(?n = ... || NOT EXISTS {...}) — each EXISTS occurrence
    becomes a per-row marker column via a distributed semi-join, read
    back as a boolean operand of the Kleene ||."""
    from ..ops.sparql import sparql_select

    return sparql_select(
        _membership_triples(sf_dir),
        """
        SELECT ?c ?n WHERE {
          ?c <in_nation> ?n .
          FILTER(?n = "n:3" || NOT EXISTS { ?n <in_region> "r:0" })
        }
        """,
    )


SQL_SPARQL_EXISTS_EXPR = """
WITH members AS (
  SELECT 'c:' || c_custkey AS m, 'n:' || c_nationkey AS n FROM customer
  UNION ALL SELECT 's:' || s_suppkey, 'n:' || s_nationkey FROM supplier
)
SELECT m AS c, n FROM members
WHERE n = 'n:3' OR NOT EXISTS (
  SELECT 1 FROM nation
  WHERE 'n:' || n_nationkey = members.n AND n_regionkey = 0)
"""


def q_sparql_in_expr(sf_dir: str):
    """IN over EXPRESSION members (§17.4.1.9 desugar to an = / ||
    chain; notin02's error semantics): a member that errors (1/0) is
    ignored when another member matches, and poisons only the
    non-matching rows (effective-false)."""
    from ..ops.sparql import sparql_select

    return sparql_select(
        _typed_price_triples(sf_dir),
        """
        SELECT ?s ?price WHERE {
          ?s <price_d> ?price .
          FILTER(?price IN (90000 + 10, 1/0, 90050))
        }
        """,
    )


SQL_SPARQL_IN_EXPR = """
SELECT 'p:' || CAST(p_partkey AS VARCHAR) AS s,
       CAST(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS VARCHAR)
         AS price
FROM part
WHERE CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) IN (90010, 90050)
"""


def q_sparql_agg_distinct(sf_dir: str):
    """DISTINCT inside aggregates beyond COUNT (AggGroupConcatDistinct
    / AggCountVarDistinct): per-group value SETS merged across blocks —
    state O(distinct values), not O(group size)."""
    from ..ops.sparql import sparql_select

    return sparql_select(
        _membership_triples(sf_dir),
        """
        SELECT ?r (GROUP_CONCAT(DISTINCT ?n; SEPARATOR=",") AS ?ns)
               (COUNT(DISTINCT ?n) AS ?nn)
        WHERE { ?c <in_nation> ?n . ?n <in_region> ?r }
        GROUP BY ?r
        """,
    )


SQL_SPARQL_AGG_DISTINCT = """
WITH members AS (
  SELECT 'c:' || c_custkey AS m, 'n:' || c_nationkey AS n FROM customer
  UNION ALL SELECT 's:' || s_suppkey, 'n:' || s_nationkey FROM supplier
), mem_nat AS (
  SELECT members.n AS n, 'r:' || n_regionkey AS r
  FROM members JOIN nation ON members.n = 'n:' || n_nationkey
)
SELECT r, string_agg(DISTINCT n, ',' ORDER BY n) AS ns,
       CAST(count(DISTINCT n) AS BIGINT) AS nn
FROM mem_nat GROUP BY r
"""


def q_sparql_lateral(sf_dir: str):
    """ARQ LATERAL with a windowed subquery (Jena 4.7 LATERAL join,
    arq Lateral suite): per-nation top-3 members by term order —
    compiled to ONE shuffle on the correlation key + per-group
    ORDER/LIMIT (ops/sparql._per_key_window), not per-row
    re-evaluation; the DuckDB oracle is the row_number() window."""
    from ..ops.sparql import sparql_select

    return sparql_select(
        _membership_triples(sf_dir),
        """
        SELECT ?n ?c WHERE {
          ?n <in_region> ?r .
          LATERAL { SELECT ?c ?n { ?c <in_nation> ?n } ORDER BY ?c LIMIT 3 }
        }
        """,
    )


SQL_SPARQL_LATERAL = """
WITH members AS (
  SELECT 'c:' || c_custkey AS m, 'n:' || c_nationkey AS n FROM customer
  UNION ALL SELECT 's:' || s_suppkey, 'n:' || s_nationkey FROM supplier
), ranked AS (
  SELECT n, m, row_number() OVER (PARTITION BY n ORDER BY m) AS rk
  FROM members
)
SELECT n, m AS c FROM ranked WHERE rk <= 3
"""


def q_sparql_propfunc(sf_dir: str):
    """ARQ property functions through the SPARQL front door
    (ops/propfunc.py; reference jena-arq .../pfunction/library/
    concat.java + arq/examples/propertyfunction/uppercase.java):
    apf:concat builds a key from an arg list, jext:uppercase derives
    its UCASE — both vectorized per-batch column transforms on the
    binding relation."""
    from ..ops.sparql import sparql_select

    return sparql_select(
        _membership_triples(sf_dir),
        """
        PREFIX apf: <http://jena.apache.org/ARQ/property#>
        PREFIX jext: <java:arq.examples.propertyfunction.>
        SELECT ?c ?key ?uc WHERE {
          ?c <in_nation> ?n .
          ?key apf:concat (?c "|" ?n) .
          ?key jext:uppercase ?uc .
        }
        """,
    )


SQL_SPARQL_PROPFUNC = """
WITH members AS (
  SELECT 'c:' || c_custkey AS m, 'n:' || c_nationkey AS n FROM customer
  UNION ALL SELECT 's:' || s_suppkey, 'n:' || s_nationkey FROM supplier
)
SELECT m AS c, m || '|' || n AS key, UPPER(m || '|' || n) AS uc
FROM members
"""


def q_seq_pack(sf_dir: str):
    """Pretraining sequence packing (concat-and-chunk): global token
    tape in doc_id order cut every 512 tokens — block-metadata prefix
    sums, no driver row data (ops/chunking.seq_pack)."""
    from ..ops.chunking import seq_pack

    return seq_pack(_read(sf_dir, "documents", ["doc_id", "text"]),
                    budget=512)


SQL_SEQ_PACK = r"""
WITH toks AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(text, '\s+'),
                         x -> x <> '')) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS tape_start
  FROM toks
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(tape_start AS BIGINT) AS tape_start,
       CAST(tape_start // 512 AS BIGINT) AS pack_id,
       CAST(tape_start % 512 AS BIGINT) AS pack_off
FROM c
"""


def q_doc_perplexity(sf_dir: str):
    """Per-doc cross-entropy under the corpus unigram LM (the CCNet LM
    quality signal reduced to its SQL-mirrorable unigram term —
    ops/textstats.unigram_xent)."""
    from ..ops.textstats import unigram_xent

    return unigram_xent(_read(sf_dir, "documents", ["doc_id", "text"]))


SQL_DOC_PERPLEXITY = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                            x -> x <> '')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
cf AS (SELECT term, sum(tf) AS cf FROM tf GROUP BY 1),
tot AS (SELECT sum(tf) AS T FROM tf)
SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
       round(-sum(tf * log2(cf / T)) / sum(tf), 6) AS xent
FROM tf JOIN cf USING (term), tot
GROUP BY doc_id
"""


def q_pii_scrub(sf_dir: str):
    """Rule-based PII redaction (ops/pii.pii_scrub): the corpus text is
    deterministically enriched with one synthetic email/phone/IP per doc
    (the synthetic tables hold no real PII), then scrubbed with the RE2
    kernels — identical enrichment on the oracle side makes the scrub
    itself the thing under test."""
    import pyarrow as pa

    from ..ops.pii import pii_scrub

    def enrich(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        texts = b["text"].to_pylist()
        out = [
            f"{t} contact u{d}@mail.example.org or "
            f"+1-555-{d % 10000:04d} at 10.0.{d % 256}.{d % 100}"
            for d, t in zip(ids, texts)
        ]
        return pa.table({"doc_id": b["doc_id"].combine_chunks(),
                         "text": pa.array(out, pa.large_string())})

    docs = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        enrich, batch_format="pyarrow")
    return pii_scrub(docs)


SQL_PII_SCRUB = r"""
WITH enriched AS (
  SELECT doc_id,
         text || ' contact u' || doc_id || '@mail.example.org or +1-555-'
           || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           || ' at 10.0.' || (doc_id % 256) || '.' || (doc_id % 100) AS t
  FROM documents
), pass1 AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(t,
           '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}')) AS BIGINT)
           AS n_email,
         regexp_replace(t,
           '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}',
           '[EMAIL]', 'g') AS t
  FROM enriched
), pass2 AS (
  SELECT doc_id, n_email,
         CAST(len(regexp_extract_all(t,
           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip,
         regexp_replace(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                        '[IP]', 'g') AS t
  FROM pass1
)
SELECT doc_id,
       regexp_replace(t, '\+\d{1,2}-\d{3}-\d{3,4}(-\d{3,4})?',
                      '[PHONE]', 'g') AS clean_text,
       n_email, n_ip,
       CAST(len(regexp_extract_all(t,
         '\+\d{1,2}-\d{3}-\d{3,4}(-\d{3,4})?')) AS BIGINT) AS n_phone
FROM pass2
"""


def q_corpus_filter(sf_dir: str):
    """End-to-end pre-training corpus filter — the composed
    RefinedWeb/CCNet shape (heuristic thresholds THEN exact normalized
    dedup): per-doc metrics in one vectorized-batch kernel, threshold
    filter in-batch (no shuffle), then ONE groupby on the normalized
    md5 keeps the lowest surviving doc_id per content class. The whole
    chain is a single streaming pipeline with one shuffle."""
    import hashlib
    import re as _re

    from ..ops.textstats import _STOPWORDS

    stop = frozenset(_STOPWORDS)
    nonword = _re.compile(r"\W")

    def metrics(b: pa.Table) -> pa.Table:
        ids, ns, sf, ml, hs = [], [], [], [], []
        for d, text in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            ts = (text or "").lower().split()
            n = len(ts)
            dn = max(1, n)
            ids.append(d)
            ns.append(n)
            sf.append(round(sum(1 for t in ts if t in stop) / dn, 6))
            ml.append(round(sum(len(t) for t in ts) / dn, 6))
            hs.append(hashlib.md5(
                nonword.sub("", (text or "").lower()).encode()).hexdigest())
        t = pa.table({
            "doc_id": pa.array(ids, b["doc_id"].type),
            "n_tokens": pa.array(ns, pa.int64()),
            "stop_frac": pa.array(sf, pa.float64()),
            "mean_wlen": pa.array(ml, pa.float64()),
            "h": pa.array(hs, pa.string()),
        })
        keep = pc.and_(
            pc.and_(pc.greater_equal(t["n_tokens"], 10),
                    pc.less_equal(t["n_tokens"], 5000)),
            pc.and_(pc.greater_equal(t["stop_frac"], 0.02),
                    pc.and_(pc.greater_equal(t["mean_wlen"], 2.0),
                            pc.less_equal(t["mean_wlen"], 12.0))),
        )
        return t.filter(keep)

    passed = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        metrics, batch_format="pyarrow")

    def keep_min(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[("doc_id", "ascending")])
        return g.take(idx[:1]).drop_columns(["h"])

    return passed.groupby("h").map_groups(keep_min, batch_format="pyarrow")


SQL_CORPUS_FILTER = r"""
WITH m AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> x <> '') AS ts,
         md5(regexp_replace(lower(text), '\W', '', 'g')) AS h
  FROM documents
), f AS (
  SELECT doc_id, h, len(ts) AS n_tokens,
         round(len(list_filter(ts, x -> list_contains(
             ['the','and','of','a','to','in','is','it','for','on'], x)))
           * 1.0 / greatest(len(ts), 1), 6) AS stop_frac,
         round(list_sum(list_transform(ts, x -> length(x)))
           * 1.0 / greatest(len(ts), 1), 6) AS mean_wlen
  FROM m
), p AS (
  SELECT * FROM f
  WHERE n_tokens BETWEEN 10 AND 5000 AND stop_frac >= 0.02
    AND mean_wlen BETWEEN 2.0 AND 12.0
), w AS (SELECT h, min(doc_id) AS keep FROM p GROUP BY h)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, stop_frac, mean_wlen
FROM p JOIN w ON p.h = w.h AND p.doc_id = w.keep
"""


def q_source_mix(sf_dir: str):
    """Per-source token-budget data mixing (ops/sampling.source_mix):
    sources over 6k tokens hash-downsample to an expected 6k, smaller
    sources keep everything — deterministic md5 rates, no data
    shuffle."""
    from ..ops.sampling import source_mix

    return source_mix(
        _read(sf_dir, "documents", ["doc_id", "source", "text"]),
        budget_tokens=6000)


SQL_SOURCE_MIX = r"""
WITH toks AS (
  SELECT doc_id, source,
         len(list_filter(regexp_split_to_array(text, '\s+'),
                         x -> x <> '')) AS n_tokens
  FROM documents
), st AS (
  SELECT source, sum(n_tokens) AS tot FROM toks GROUP BY source
), rates AS (
  SELECT source,
         CASE WHEN tot <= 6000 THEN 'g'
              ELSE lpad(to_hex(CAST(floor(
                  (6000 * 1.0 / tot) * 4294967296) AS BIGINT)), 8, '0')
         END AS bound
  FROM st
)
SELECT t.doc_id, t.source, CAST(t.n_tokens AS BIGINT) AS n_tokens
FROM toks t JOIN rates r USING (source)
WHERE substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 8) < r.bound
"""


def q_dedup_winnow(sf_dir: str):
    """Winnowing fingerprint near-dup pairs (MOSS; Schleimer et al.
    2003): window-minimum md5 k-gram hashes → shared-fingerprint pair
    counts (ops/dedup_text.winnow_pairs)."""
    from ..ops.dedup_text import winnow_pairs

    return winnow_pairs(_read(sf_dir, "documents", ["doc_id", "text"]),
                        k=16, w=8)


SQL_DEDUP_WINNOW = r"""
WITH pos AS (
  SELECT doc_id, i, md5(substr(text, CAST(i AS INT), 16)) AS h
  FROM documents, UNNEST(range(1, length(text) - 16 + 2)) AS g(i)
  WHERE length(text) >= 16
), counts AS (
  SELECT doc_id, count(*) AS n FROM pos GROUP BY doc_id
), wins AS (
  SELECT p.doc_id, p.i, c.n,
         min(h) OVER (PARTITION BY p.doc_id ORDER BY p.i
             ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS fp
  FROM pos p JOIN counts c USING (doc_id)
), sel AS (
  SELECT DISTINCT doc_id, fp FROM wins
  WHERE (n < 8 AND i = 1) OR i <= n - 7
), kept AS (
  SELECT fp FROM sel GROUP BY fp HAVING count(*) <= 256
), s2 AS (SELECT s.doc_id, s.fp FROM sel s JOIN kept USING (fp))
SELECT x.doc_id AS a, y.doc_id AS b, CAST(count(*) AS BIGINT) AS shared
FROM s2 x JOIN s2 y ON x.fp = y.fp AND x.doc_id < y.doc_id
GROUP BY 1, 2
"""


def q_bigram_pmi(sf_dir: str):
    """Corpus bigram collocations by PMI (Church & Hanks 1990 — the
    word2vec phrase-mining signal; ops/textstats.bigram_pmi): one
    groupby for pair counts, two unigram joins, vectorized log2
    kernel."""
    from ..ops.textstats import bigram_pmi

    return bigram_pmi(_read(sf_dir, "documents", ["doc_id", "text"]),
                      min_count=5)


SQL_BIGRAM_PMI = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> x <> '') AS ts
  FROM documents
), bi AS (
  SELECT ts[i] AS w1, ts[i+1] AS w2
  FROM toks, UNNEST(range(1, len(ts))) AS g(i)
  WHERE len(ts) >= 2
), pcnt AS (SELECT w1, w2, count(*) AS c_ab FROM bi GROUP BY 1, 2),
tot AS (SELECT count(*) AS N FROM bi),
ca AS (SELECT w1, count(*) AS c_a FROM bi GROUP BY 1),
cb AS (SELECT w2, count(*) AS c_b FROM bi GROUP BY 1)
SELECT p.w1, p.w2, CAST(p.c_ab AS BIGINT) AS c_ab,
       round(log2(p.c_ab * N * 1.0 / (ca.c_a * cb.c_b)), 6) AS pmi
FROM pcnt p JOIN ca USING (w1) JOIN cb USING (w2), tot
WHERE p.c_ab >= 5
"""


def q_window_sliding(sf_dir: str):
    """Sliding (hopping) windows over the event log — size 1 h, hop
    15 min: each event explodes to the 4 windows covering it (pure
    flat-map on epoch arithmetic, no per-event state), then ONE
    groupby(event_type, window). The overlap factor is size/hop — the
    explode is the standard distributed realization of hopping windows
    (same shape as Flink's window assigner)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])
    hop_us = 900 * 1_000_000
    k_covers = 4  # size / hop

    def explode(b: pa.Table) -> pa.Table:
        import numpy as np

        ts = b["ts"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        base = (ts // hop_us) * hop_us
        vs = pc.cast(pc.round(pc.multiply(b["value"], pa.scalar(10000.0)),
                              round_mode="half_towards_infinity"),
                     pa.int64()).to_numpy(zero_copy_only=False)
        et = b["event_type"].to_pylist()
        n = len(ts)
        starts = np.concatenate(
            [base - k * hop_us for k in range(k_covers)])
        return pa.table({
            "event_type": pa.array(et * k_covers, pa.string()),
            "win": pa.array(starts, pa.int64()),
            "v": pa.array(np.tile(vs, k_covers), pa.int64()),
        })

    agg = (ds.map_batches(explode, batch_format="pyarrow")
           .groupby(["event_type", "win"])
           .aggregate(Count(alias_name="cnt"),
                      Sum("v", alias_name="sum_val_scaled")))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return t
        return pa.table({
            "event_type": t["event_type"].combine_chunks().cast(
                pa.string()),
            "win": t["win"].combine_chunks().cast(pa.timestamp("us")),
            "cnt": t["cnt"].combine_chunks().cast(pa.int64()),
            "sum_val_scaled": t["sum_val_scaled"].combine_chunks().cast(
                pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_WINDOW_SLIDING = """
WITH e AS (
  SELECT event_type,
         (epoch_us(ts) // 900000000) * 900000000 AS base,
         CAST(round(value * 10000, 0) AS BIGINT) AS v
  FROM events
)
SELECT event_type,
       make_timestamp(base - k * 900000000) AS win,
       count(*) AS cnt,
       CAST(sum(v) AS BIGINT) AS sum_val_scaled
FROM e, UNNEST(range(0, 4)) AS g(k)
GROUP BY 1, 2
"""


def q_value_histogram(sf_dir: str):
    """Fixed-width numeric histogram of the event value column — one
    vectorized binning pass + one groupby(bin); the telemetry /
    feature-distribution shape."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "events", ["value"])

    def binit(b: pa.Table) -> pa.Table:
        bins = pc.cast(pc.floor(pc.divide(b["value"], pa.scalar(0.5))),
                       pa.int64())
        return pa.table({"bin": bins})

    agg = (ds.map_batches(binit, batch_format="pyarrow")
           .groupby("bin").aggregate(Count(alias_name="n")))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return t
        b = t["bin"].combine_chunks().cast(pa.int64())
        lo = pc.multiply(pc.cast(b, pa.float64()), pa.scalar(0.5))
        return pa.table({"bin": b, "lo": lo,
                         "n": t["n"].combine_chunks().cast(pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_VALUE_HISTOGRAM = """
SELECT CAST(floor(value / 0.5) AS BIGINT) AS bin,
       CAST(floor(value / 0.5) AS BIGINT) * 0.5 AS lo,
       count(*) AS n
FROM events GROUP BY 1, 2
"""


REGISTRY: dict[str, tuple] = {
    "window_sliding": (q_window_sliding, SQL_WINDOW_SLIDING),
    "value_histogram": (q_value_histogram, SQL_VALUE_HISTOGRAM),
    "bigram_pmi": (q_bigram_pmi, SQL_BIGRAM_PMI),
    "dedup_winnow": (q_dedup_winnow, SQL_DEDUP_WINNOW),
    "source_mix": (q_source_mix, SQL_SOURCE_MIX),
    "corpus_filter": (q_corpus_filter, SQL_CORPUS_FILTER),
    "seq_pack": (q_seq_pack, SQL_SEQ_PACK),
    "doc_perplexity": (q_doc_perplexity, SQL_DOC_PERPLEXITY),
    "pii_scrub": (q_pii_scrub, SQL_PII_SCRUB),
    "agg_groupby": (q_agg_groupby, SQL_AGG_GROUPBY),
    "count_distinct": (q_count_distinct, SQL_COUNT_DISTINCT),
    "median": (q_median, SQL_MEDIAN),
    "group_concat": (q_group_concat, SQL_GROUP_CONCAT),
    "minmax_sample": (q_minmax_sample, SQL_MINMAX_SAMPLE),
    "join_broadcast": (q_join_broadcast, SQL_JOIN_BROADCAST),
    "left_join": (q_left_join, SQL_LEFT_JOIN),
    "anti_join": (q_anti_join, SQL_ANTI_JOIN),
    "semi_join": (q_semi_join, SQL_SEMI_JOIN),
    "topk": (q_topk, SQL_TOPK),
    "distinct": (q_distinct, SQL_DISTINCT),
    "union_bag": (q_union, SQL_UNION),
    "except_minus": (q_except, SQL_EXCEPT),
    "string_funcs": (q_string_funcs, SQL_STRING_FUNCS),
    "numeric_funcs": (q_numeric_funcs, SQL_NUMERIC_FUNCS),
    "hash_funcs": (q_hash_funcs, SQL_HASH_FUNCS),
    "datetime_funcs": (q_datetime_funcs, SQL_DATETIME_FUNCS),
    "datetime_tz_funcs": (q_datetime_tz_funcs, SQL_DATETIME_TZ_FUNCS),
    "duration_funcs": (q_duration_funcs, SQL_DURATION_FUNCS),
    "encode_uri_funcs": (q_encode_uri_funcs, SQL_ENCODE_URI_FUNCS),
    "window_tumbling": (q_window_tumbling, SQL_WINDOW_TUMBLING),
    "connected_components": (q_connected_components, SQL_CONNECTED_COMPONENTS),
    "doc_tokens": (q_doc_tokens, SQL_DOC_TOKENS),
    "doc_quality": (q_doc_quality, SQL_DOC_QUALITY),
    "quality_score": (q_quality_score, SQL_QUALITY_SCORE),
    "doc_repetition": (q_doc_repetition, SQL_DOC_REPETITION),
    "dedup_exact_docs": (q_dedup_exact_docs, SQL_DEDUP_EXACT_DOCS),
    "dedup_normalized_docs": (q_dedup_normalized_docs, SQL_DEDUP_NORMALIZED_DOCS),
    "dedup_ngram_jaccard": (q_dedup_ngram_jaccard, SQL_DEDUP_NGRAM_JACCARD),
    "decontaminate": (q_decontaminate, SQL_DECONTAMINATE),
    "doc_tfidf": (q_doc_tfidf, SQL_DOC_TFIDF),
    "vocab_topk": (q_vocab_topk, SQL_VOCAB_TOPK),
    "chunk_windows": (q_chunk_windows, SQL_CHUNK_WINDOWS),
    "dedup_substring": (q_dedup_substring, SQL_DEDUP_SUBSTRING),
    "graph_triangles": (q_graph_triangles, SQL_GRAPH_TRIANGLES),
    "dedup_fuzzy_clusters": (q_dedup_fuzzy_clusters, SQL_DEDUP_FUZZY_CLUSTERS),
    "sample_stratified": (q_sample_stratified, SQL_SAMPLE_STRATIFIED),
    "sample_bottomk": (q_sample_bottomk, SQL_SAMPLE_BOTTOMK),
    "sample_per_key_cap": (q_sample_per_key_cap, SQL_SAMPLE_PER_KEY_CAP),
    "dedup_paragraphs": (q_dedup_paragraphs, SQL_DEDUP_PARAGRAPHS),
    "embedding_near_dup": (q_embedding_near_dup, SQL_EMBEDDING_NEAR_DUP),
    "embedding_near_dup_blocked": (
        q_embedding_near_dup_blocked,
        SQL_EMBEDDING_NEAR_DUP_BLOCKED,
    ),
    "ann_bruteforce": (q_ann_bruteforce, SQL_ANN_BRUTEFORCE),
    "path_2hop": (q_path_2hop, SQL_PATH_2HOP),
    "path_star_alt": (q_path_star_alt, SQL_PATH_STAR_ALT),
    "path_nested_closure": (q_path_nested_closure, SQL_PATH_NESTED_CLOSURE),
    "path_star_seq": (q_path_star_seq, SQL_PATH_STAR_SEQ),
    "path_seq_star": (q_path_seq_star, SQL_PATH_SEQ_STAR),
    "path_inverse_seq": (q_path_inverse_seq, SQL_PATH_INVERSE_SEQ),
    "path_negset": (q_path_negset, SQL_PATH_NEGSET),
    "bgp_match": (q_bgp_match, SQL_BGP_MATCH),
    "bgp_star_join": (q_bgp_star_join, SQL_BGP_STAR_JOIN),
    "owl_transitive_in": (q_owl_transitive_in, SQL_OWL_TRANSITIVE_IN),
    "rule_forward_chain": (q_rule_forward_chain, SQL_RULE_FORWARD_CHAIN),
    "rule_builtins": (q_rule_builtins, SQL_RULE_BUILTINS),
    "rule_backward_query": (q_rule_backward_query, SQL_RULE_BACKWARD_QUERY),
    "sparql_select": (q_sparql_select, SQL_SPARQL_SELECT),
    "sparql_aggregate": (q_sparql_aggregate, SQL_SPARQL_AGGREGATE),
    "sparql_having": (q_sparql_having, SQL_SPARQL_HAVING),
    "sparql_values": (q_sparql_values, SQL_SPARQL_VALUES),
    "sparql_offset": (q_sparql_offset, SQL_SPARQL_OFFSET),
    "sparql_year": (q_sparql_year, SQL_SPARQL_YEAR),
    "sparql_construct_where": (
        q_sparql_construct_where, SQL_SPARQL_CONSTRUCT_WHERE),
    "sparql_filter_typed": (q_sparql_filter_typed, SQL_SPARQL_FILTER_TYPED),
    "sparql_order_typed": (q_sparql_order_typed, SQL_SPARQL_ORDER_TYPED),
    "sparql_subquery": (q_sparql_subquery, SQL_SPARQL_SUBQUERY),
    "sparql_graph": (q_sparql_graph, SQL_SPARQL_GRAPH),
    "sparql_optional": (q_sparql_optional, SQL_SPARQL_OPTIONAL),
    "sparql_exists": (q_sparql_exists, SQL_SPARQL_EXISTS),
    "sparql_expr_funcs": (q_sparql_expr_funcs, SQL_SPARQL_EXPR_FUNCS),
    "sparql_math_funcs": (q_sparql_math_funcs, SQL_SPARQL_MATH_FUNCS),
    "sparql_format_number": (q_sparql_format_number,
                             SQL_SPARQL_FORMAT_NUMBER),
    "sparql_group_concat": (q_sparql_group_concat, SQL_SPARQL_GROUP_CONCAT),
    "shacl_sparql": (q_shacl_sparql, SQL_SHACL_SPARQL),
    "sparql_update": (q_sparql_update, SQL_SPARQL_UPDATE),
    "sparql_agg_expr": (q_sparql_agg_expr, SQL_SPARQL_AGG_EXPR),
    "sparql_order_expr": (q_sparql_order_expr, SQL_SPARQL_ORDER_EXPR),
    "sparql_exists_expr": (q_sparql_exists_expr, SQL_SPARQL_EXISTS_EXPR),
    "sparql_in_expr": (q_sparql_in_expr, SQL_SPARQL_IN_EXPR),
    "sparql_propfunc": (q_sparql_propfunc, SQL_SPARQL_PROPFUNC),
    "sparql_lateral": (q_sparql_lateral, SQL_SPARQL_LATERAL),
    "sparql_agg_distinct": (q_sparql_agg_distinct, SQL_SPARQL_AGG_DISTINCT),
    "cdt_list_funcs": (q_cdt_list_funcs, SQL_CDT_LIST_FUNCS),
    "mode": (q_mode, SQL_MODE),
    "fold_collect": (q_fold_collect, SQL_FOLD_COLLECT),
    "facet_counts": (q_facet_counts, SQL_FACET_COUNTS),
    "control_flow": (q_control_flow, SQL_CONTROL_FLOW),
    "unnest": (q_unnest, SQL_UNNEST),
    "session_windows": (q_session_windows, SQL_SESSION_WINDOWS),
}

# Driver-sample rotation (VERDICT r3 item 9): the driver's correctness
# gate caps at 50 sampled queries per round — order = (1) queries new
# this round, (2) queries whose last driver-green row predates round 4
# (every registry query has at least one driver-green row across
# CORRECTNESS_r01–r04). The full registry stays green in the local
# oracle mirror (tests/test_queries.py) either way.
_SAMPLE_FIRST = [
    # new in round 5
    "seq_pack", "doc_perplexity", "pii_scrub", "corpus_filter", "source_mix", "dedup_winnow", "bigram_pmi", "window_sliding", "value_histogram",
    # last driver-sampled before round 4
    "union_bag", "except_minus", "string_funcs", "numeric_funcs",
    "hash_funcs", "datetime_funcs", "datetime_tz_funcs", "duration_funcs",
    "encode_uri_funcs", "window_tumbling", "connected_components",
    "doc_tokens", "doc_quality", "dedup_exact_docs",
    "dedup_normalized_docs", "dedup_ngram_jaccard", "embedding_near_dup",
    "embedding_near_dup_blocked", "ann_bruteforce", "path_2hop",
    "path_star_alt", "path_nested_closure", "path_star_seq",
    "path_seq_star", "path_inverse_seq", "path_negset", "bgp_match",
    "bgp_star_join", "owl_transitive_in", "rule_forward_chain",
    "rule_builtins", "sparql_select", "sparql_aggregate", "sparql_having",
    "sparql_values", "sparql_offset", "sparql_year",
    "sparql_construct_where", "sparql_filter_typed",
]
REGISTRY = {
    **{k: REGISTRY[k] for k in _SAMPLE_FIRST},
    **{k: v for k, v in REGISTRY.items() if k not in _SAMPLE_FIRST},
}
