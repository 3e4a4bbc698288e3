"""Document deduplication family.

- exact:        content hash → groupby → keep min doc_id
- normalized:   exact after lowercasing + stripping non-word chars
- MinHash+LSH:  word-shingle minhash signatures (numpy-vectorized per doc)
                → banded bucket explode → groupby(band, bucket) → candidate
                pairs → exact-Jaccard verification
- SimHash:      64-bit simhash over token crc32s; near-dup = hamming ≤ r
                via 4-segment pigeonhole bucketing (any r≤3 match shares
                one exact 16-bit segment)
- embedding:    cosine near-dup over the embeddings table (blocked matmul
                against a broadcast matrix — brute force baseline)

The shuffle shape of every variant is the canonical "explode to
(bucket_key, id) → groupby(bucket_key) → pairs within group" pattern:
group sizes are bounded by bucket design, not by corpus size.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# --- exact / normalized -----------------------------------------------------


def md5_batch(b: pa.Table, col: str = "text") -> pa.Table:
    hashes = pa.array(
        [hashlib.md5(t.encode()).hexdigest() for t in b[col].to_pylist()]
    )
    return pa.Table.from_arrays(
        [hashes, b["doc_id"].combine_chunks()], names=["h", "doc_id"]
    )


def exact_dedup_docs(docs_ds):
    """One survivor (min doc_id) per distinct content hash + group size."""
    from ray.data.aggregate import Count, Min

    return (
        docs_ds.map_batches(md5_batch, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min("doc_id", alias_name="keep_doc"), Count(alias_name="n_copies"))
    )


def normalized_md5_batch(b: pa.Table) -> pa.Table:
    norm = pc.replace_substring_regex(pc.utf8_lower(b["text"]), r"\W", "")
    hashes = pa.array([hashlib.md5(t.encode()).hexdigest() for t in norm.to_pylist()])
    return pa.Table.from_arrays(
        [hashes, b["doc_id"].combine_chunks()], names=["h", "doc_id"]
    )


def normalized_dedup_docs(docs_ds):
    from ray.data.aggregate import Count, Min

    return (
        docs_ds.map_batches(normalized_md5_batch, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min("doc_id", alias_name="keep_doc"), Count(alias_name="n_copies"))
    )


# --- paragraph-level exact dedup --------------------------------------------

# At most 2^20 (1M) paragraphs per document: lets (doc_id, idx) pack
# into one int64 so the corpus-wide first occurrence is a single Min
# aggregate per paragraph hash (one shuffle, no two-key argmin).
_PARA_IDX_BITS = 20


def _explode_paragraphs(b: pa.Table, sep: str) -> pa.Table:
    """doc rows → paragraph rows (doc_id, idx, para, h, pack), fully
    vectorized: split_pattern + list_flatten, parent ids via np.repeat."""
    parts = pc.split_pattern(b["text"].combine_chunks(), sep)
    flat = pc.cast(pc.list_flatten(parts), pa.large_string())
    lens = pc.list_value_length(parts).to_numpy().astype(np.int64)
    doc = np.repeat(b["doc_id"].to_numpy(), lens)
    # per-document positions: 0..len-1 within each list
    total = int(lens.sum())
    starts = np.repeat(np.cumsum(lens) - lens, lens)
    idx = np.arange(total, dtype=np.int64) - starts
    hashes = pa.array(
        [hashlib.md5(p.encode()).hexdigest() for p in flat.to_pylist()])
    return pa.table(
        {"doc_id": pa.array(doc), "idx": pa.array(idx), "para": flat,
         "h": hashes,
         "pack": pa.array((doc << _PARA_IDX_BITS) | idx)})


def paragraph_dedup(docs_ds, sep: str = "\n\n"):
    """Corpus-wide paragraph-level exact dedup (the RefinedWeb /
    FineWeb line-dedup shape at paragraph granularity): a paragraph
    survives only at its FIRST corpus occurrence (min (doc_id, idx));
    each document is reassembled from its surviving paragraphs in
    original order. Documents whose every paragraph is a duplicate
    drop out.

    Plan: explode → groupby(h).Min(pack) [shuffle 1] → hash-join back
    on h [shuffle 2] → winners only → groupby(doc_id) reassemble
    [shuffle 3]. The winners side carries (h, pack) only — paragraph
    text never ships twice."""
    from ray.data.aggregate import Min

    from ..util import compact_blocks

    paras = compact_blocks(
        docs_ds.select_columns(["doc_id", "text"]).map_batches(
            lambda b: _explode_paragraphs(b, sep), batch_format="pyarrow"))
    winners = paras.select_columns(["h", "pack"]).groupby("h").aggregate(
        Min("pack", alias_name="w"))
    surv = paras.join(winners, join_type="inner", num_partitions=16,
                      on=("h",))

    def keep_first(b: pa.Table) -> pa.Table:
        if b.num_columns == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "idx": pa.array([], pa.int64()),
                             "para": pa.array([], pa.large_string())})
        m = pc.equal(b["pack"], b["w"])
        return b.filter(m).select(["doc_id", "idx", "para"])

    def reassemble(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[("idx", "ascending")])
        paras_sorted = pc.take(g["para"], order)
        return pa.table(
            {"doc_id": pa.array([g["doc_id"][0].as_py()], pa.int64()),
             "text": pa.array([sep.join(paras_sorted.to_pylist())],
                              pa.large_string())})

    return (surv.map_batches(keep_first, batch_format="pyarrow")
            .groupby("doc_id")
            .map_groups(reassemble, batch_format="pyarrow"))


# --- MinHash + LSH ----------------------------------------------------------

N_PERM = 64
N_BANDS = 16
ROWS_PER_BAND = N_PERM // N_BANDS
_MERSENNE = (1 << 61) - 1
_rng = np.random.RandomState(42)
_A = _rng.randint(1, _MERSENNE, size=N_PERM, dtype=np.int64)
_B = _rng.randint(0, _MERSENNE, size=N_PERM, dtype=np.int64)


def _shingles(text: str, k: int = 3) -> np.ndarray:
    toks = text.lower().split()
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else [""]
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    return np.unique(
        np.array([zlib.crc32(g.encode()) for g in grams], dtype=np.int64)
    )


def minhash_signature(text: str) -> np.ndarray:
    sh = _shingles(text)
    # (n_shingles, 1) * (1, N_PERM) — vectorized universal hashing
    vals = (sh[:, None] * _A[None, :] + _B[None, :]) % _MERSENNE
    return vals.min(axis=0)


def minhash_bands_batch(b: pa.Table) -> pa.Table:
    """Explode each doc to N_BANDS (band_id, band_hash, doc_id) rows."""
    doc_ids, band_ids, band_hashes = [], [], []
    for doc_id, text in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
        sig = minhash_signature(text)
        for band in range(N_BANDS):
            seg = sig[band * ROWS_PER_BAND : (band + 1) * ROWS_PER_BAND]
            h = hashlib.blake2b(seg.tobytes(), digest_size=8).hexdigest()
            doc_ids.append(doc_id)
            band_ids.append(band)
            band_hashes.append(h)
    id_type = b["doc_id"].type
    return pa.Table.from_arrays(
        [
            pa.array(band_ids, pa.int32()),
            pa.array(band_hashes),
            pa.array(doc_ids, id_type),
        ],
        names=["band_id", "band_hash", "doc_id"],
    )


# Above this many docs in one LSH bucket, all-pairs is O(n²) in a single
# group — degrade to CHAIN pairing (each doc paired with its sorted
# successor): O(n) pairs that keep the duplicate cluster CONNECTED for
# union-find-style dedup, at the cost of not scoring every cross pair.
MAX_BUCKET_ALLPAIRS = 512

# n-gram Jaccard: shingles appearing in more docs than this are dropped
# before pairing (keep below MAX_BUCKET_ALLPAIRS so the pair kernel never
# chain-degrades — exactness is the point of this variant)
NGRAM_DF_CAP = 256


def _pairs_in_group(g: pd.DataFrame) -> pd.DataFrame:
    dtype = g["doc_id"].dtype
    docs = sorted(set(g["doc_id"]))
    a, bb = [], []
    if len(docs) > MAX_BUCKET_ALLPAIRS:
        a = docs[:-1]
        bb = docs[1:]
    else:
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                a.append(docs[i])
                bb.append(docs[j])
    return pd.DataFrame(
        {"a": pd.Series(a, dtype=dtype), "b": pd.Series(bb, dtype=dtype)}
    )


def jaccard(t1: str, t2: str) -> float:
    s1, s2 = set(_shingles(t1).tolist()), set(_shingles(t2).tolist())
    if not s1 and not s2:
        return 1.0
    return len(s1 & s2) / len(s1 | s2)


def minhash_lsh_pairs(docs_ds, threshold: float = 0.7):
    """Candidate pairs from LSH banding, verified by exact Jaccard.

    Fully distributed 'explode → bucket groupby → verify' shape: candidate
    texts are attached by TWO hash joins (pairs ⋈ docs on a, then on b) and
    verified inside map_batches — no candidate list or text dict ever
    lands on the driver, so a duplicate-heavy corpus can't blow driver
    memory. Hot buckets degrade to chain pairing (MAX_BUCKET_ALLPAIRS).
    """
    import ray.data as rd

    from ..util import compact_blocks

    id_type = docs_ds.schema().base_schema.field("doc_id").type

    bands = docs_ds.map_batches(
        lambda b: minhash_bands_batch(b), batch_format="pyarrow"
    )
    cand = (
        bands.groupby(["band_id", "band_hash"])
        .map_groups(_pairs_in_group, batch_format="pandas")
    )
    # distinct candidate pairs (a<b by construction); compact — Ray
    # groupby emits empty partition blocks that crash downstream joins
    cand = compact_blocks(cand.groupby(["a", "b"]).count().select_columns(["a", "b"]))
    n_cand = cand.count()
    if n_cand == 0:
        return rd.from_arrow(
            pa.table({"a": pa.array([], id_type), "b": pa.array([], id_type),
                      "jaccard": pa.array([], pa.float64())})
        )
    n_parts = max(1, min(64, n_cand // 2_000_000))

    def _rename(col_from: str, col_to: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.rename_columns(
                [col_to if n == col_from else n for n in t.schema.names]
            )

        return fn

    docs = compact_blocks(docs_ds.select_columns(["doc_id", "text"]))
    docs_a = docs.map_batches(_rename("doc_id", "a"), batch_format="pyarrow").map_batches(
        _rename("text", "text_a"), batch_format="pyarrow"
    )
    docs_b = docs.map_batches(_rename("doc_id", "b"), batch_format="pyarrow").map_batches(
        _rename("text", "text_b"), batch_format="pyarrow"
    )
    with_texts = compact_blocks(
        cand.join(docs_a, join_type="inner", num_partitions=n_parts, on=("a",))
    ).join(docs_b, join_type="inner", num_partitions=n_parts, on=("b",))

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return pa.table(
                {"a": pa.array([], id_type), "b": pa.array([], id_type),
                 "jaccard": pa.array([], pa.float64())}
            )
        rows_a, rows_b, js = [], [], []
        for a, b2, ta, tb in zip(
            batch["a"].to_pylist(), batch["b"].to_pylist(),
            batch["text_a"].to_pylist(), batch["text_b"].to_pylist(),
        ):
            j = jaccard(ta, tb)
            if j >= threshold:
                rows_a.append(a)
                rows_b.append(b2)
                js.append(round(j, 6))
        return pa.table(
            {"a": pa.array(rows_a, id_type), "b": pa.array(rows_b, id_type),
             "jaccard": pa.array(js, pa.float64())}
        )

    return with_texts.map_batches(verify, batch_format="pyarrow")


def ngram_jaccard_pairs(docs_ds, threshold: float = 0.5, k: int = 3):
    """EXACT n-gram Jaccard near-dup pairs, fully distributed and fully
    SQL-oracle-able (unlike MinHash, no approximation):

        explode each doc to its DISTINCT word k-grams
        candidate pairs = docs sharing ≥1 shingle  (groupby shingle)
        |A∩B| = number of shared shingles           (groupby pair count)
        |A∪B| = |A| + |B| − |A∩B|                   (sizes attached by two
                                                     hash joins on the
                                                     per-doc size table)
        keep pairs with ∩/∪ ≥ threshold

    The shuffle shape is explode → one groupby(shingle) → one
    groupby(pair); no driver-side text. Group sizes are bounded by a
    DOCUMENT-FREQUENCY stop filter: shingles appearing in more than
    NGRAM_DF_CAP docs are dropped BEFORE pairing (standard stop-shingle
    practice) — deterministic, so the SQL oracle mirrors it with a
    HAVING clause and results stay exactly comparable."""
    import ray

    from ray.data.aggregate import Count

    id_type = docs_ds.schema().base_schema.field("doc_id").type

    def explode(b: pa.Table) -> pa.Table:
        ids, grams, hashes = [], [], []
        for d, text in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            toks = text.lower().split()
            if len(toks) < k:
                sh = {" ".join(toks)} if toks else set()
            else:
                sh = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
            for g in sorted(sh):
                ids.append(d)
                grams.append(g)
                # composite shuffle key: int hash FIRST so the sort/join
                # compares 8 bytes and falls back to the string only on
                # hash-equal runs — exact string equality preserved
                hashes.append(zlib.crc32(g.encode()))
        return pa.table(
            {"doc_id": pa.array(ids, id_type), "shingle": pa.array(grams),
             "h": pa.array(hashes, pa.int64())}
        )

    from ..util import compact_blocks

    shingles = compact_blocks(docs_ds.map_batches(explode, batch_format="pyarrow"))

    # stop-shingle list: shingles in more than NGRAM_DF_CAP docs. The
    # over-cap rows are filtered DISTRIBUTED and only that tiny tail is
    # collected (never the full distinct-shingle table).
    stop_rows = (
        shingles.groupby(["h", "shingle"])
        .count()
        .map_batches(
            lambda t: t.filter(pc.greater(t["count()"], NGRAM_DF_CAP))
            if t.num_columns
            else t,
            batch_format="pyarrow",
        )
        .take_all()
    )
    stop_ref = ray.put(frozenset(r["shingle"] for r in stop_rows))

    def drop_stop(t: pa.Table) -> pa.Table:
        s = ray.get(stop_ref)
        if not s:
            return t
        mask = pa.array([g not in s for g in t["shingle"].to_pylist()])
        return t.filter(mask)

    shingles = compact_blocks(shingles.map_batches(drop_stop, batch_format="pyarrow"))

    # per-doc distinct (non-stop) shingle counts — kept as a DATASET and
    # attached to the pair table by two hash joins below (|A| on a, |B| on
    # b); nothing doc-count-sized ever lands on the driver
    sizes = shingles.groupby("doc_id").count()

    def _sizes_as(col: str, szcol: str):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_columns == 0:
                return pa.table(
                    {col: pa.array([], id_type),
                     szcol: pa.array([], pa.int64())}
                )
            return pa.table(
                {
                    col: t["doc_id"].combine_chunks().cast(id_type),
                    szcol: t["count()"].combine_chunks().cast(pa.int64()),
                }
            )

        return fn

    sizes_a = compact_blocks(
        sizes.map_batches(_sizes_as("a", "sz_a"), batch_format="pyarrow")
    )
    sizes_b = compact_blocks(
        sizes.map_batches(_sizes_as("b", "sz_b"), batch_format="pyarrow")
    )

    # pair generation as a SELF-JOIN on the shingle (one hash shuffle, no
    # per-group Python: a groupby(shingle).map_groups over millions of
    # tiny groups measured ~5x slower)
    def rename_to(col):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_columns == 0:
                return t
            return pa.table(
                {
                    "h": t["h"].combine_chunks(),
                    "shingle": t["shingle"].combine_chunks(),
                    col: t["doc_id"].combine_chunks(),
                }
            )

        return fn

    sh_a = shingles.map_batches(rename_to("a"), batch_format="pyarrow")
    sh_b = shingles.map_batches(rename_to("b"), batch_format="pyarrow")
    n_parts = max(1, min(64, shingles.count() // 2_000_000))
    joined = compact_blocks(sh_a).join(
        compact_blocks(sh_b), join_type="inner", num_partitions=n_parts,
        on=("h", "shingle"),
    )

    def ordered_pairs(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.table(
                {"a": pa.array([], id_type), "b": pa.array([], id_type)}
            )
        x = t.filter(pc.less(t["a"], t["b"]))
        return pa.table(
            {"a": x["a"].combine_chunks(), "b": x["b"].combine_chunks()}
        )

    def _cast_shared(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.table(
                {"a": pa.array([], id_type), "b": pa.array([], id_type),
                 "inter": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "a": t["a"].combine_chunks().cast(id_type),
                "b": t["b"].combine_chunks().cast(id_type),
                "inter": t["inter"].combine_chunks().cast(pa.int64()),
            }
        )

    shared = compact_blocks(
        joined.map_batches(ordered_pairs, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="inter"))
        .map_batches(_cast_shared, batch_format="pyarrow")
    )
    n_pairs = shared.count()
    n_parts2 = max(1, min(64, n_pairs // 2_000_000))
    with_sizes = compact_blocks(
        shared.join(sizes_a, join_type="inner", num_partitions=n_parts2,
                    on=("a",))
    ).join(sizes_b, join_type="inner", num_partitions=n_parts2, on=("b",))

    def verdict(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.table(
                {"a": pa.array([], id_type), "b": pa.array([], id_type),
                 "inter": pa.array([], pa.int64()),
                 "uni": pa.array([], pa.int64()),
                 "jaccard": pa.array([], pa.float64())}
            )
        inter = t["inter"].combine_chunks()
        uni = pc.subtract(
            pc.add(t["sz_a"].combine_chunks(), t["sz_b"].combine_chunks()),
            inter,
        )
        j = pc.if_else(
            pc.equal(uni, 0),
            pa.scalar(1.0, pa.float64()),
            pc.divide(
                pc.cast(inter, pa.float64()),
                pc.max_element_wise(pc.cast(uni, pa.float64()), 1.0),
            ),
        )
        mask = pc.greater_equal(j, threshold)
        x = pa.table(
            {
                "a": t["a"].combine_chunks().cast(id_type),
                "b": t["b"].combine_chunks().cast(id_type),
                "inter": inter,
                "uni": uni,
                "jaccard": j,
            }
        ).filter(mask)
        return x

    return with_sizes.map_batches(verdict, batch_format="pyarrow")


# --- SimHash ----------------------------------------------------------------


def simhash64(text: str) -> int:
    acc = np.zeros(64, dtype=np.int64)
    for tok in set(text.lower().split()):
        h = int.from_bytes(
            hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big"
        )
        bits = np.array([(h >> i) & 1 for i in range(64)], dtype=np.int64)
        acc += bits * 2 - 1
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_batch(b: pa.Table) -> pa.Table:
    hs = [simhash64(t) for t in b["text"].to_pylist()]
    doc_ids, segs, segvals, full = [], [], [], []
    for d, h in zip(b["doc_id"].to_pylist(), hs):
        for seg in range(4):  # pigeonhole: hamming<=3 ⇒ one 16-bit seg equal
            doc_ids.append(d)
            segs.append(seg)
            segvals.append((h >> (seg * 16)) & 0xFFFF)
            full.append(h)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, b["doc_id"].type),
            "seg": pa.array(segs, pa.int32()),
            "segval": pa.array(segvals, pa.int64()),
            "simhash": pa.array(full, pa.uint64()),
        }
    )


def simhash_pairs(docs_ds, max_hamming: int = 3):
    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(set(zip(g["doc_id"], g["simhash"])))
        a, b2, dist = [], [], []
        if len(rows) > MAX_BUCKET_ALLPAIRS:
            # hot segment bucket: all-pairs is O(n²) — chain-degrade like
            # the MinHash buckets (sorted successor pairs keep the
            # duplicate cluster connected; O(n) comparisons)
            for r1, r2 in zip(rows[:-1], rows[1:]):
                d = bin(int(r1[1]) ^ int(r2[1])).count("1")
                if d <= max_hamming:
                    a.append(r1[0])
                    b2.append(r2[0])
                    dist.append(d)
            return pd.DataFrame({"a": a, "b": b2, "hamming": dist})
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                d = bin(int(rows[i][1]) ^ int(rows[j][1])).count("1")
                if d <= max_hamming:
                    a.append(rows[i][0])
                    b2.append(rows[j][0])
                    dist.append(d)
        return pd.DataFrame({"a": a, "b": b2, "hamming": dist})

    cand = (
        docs_ds.map_batches(simhash_batch, batch_format="pyarrow")
        .groupby(["seg", "segval"])
        .map_groups(pairs, batch_format="pandas")
    )
    from ray.data.aggregate import Min

    return cand.groupby(["a", "b"]).aggregate(Min("hamming", alias_name="hamming"))


# --- embedding cosine near-dup ---------------------------------------------


def embedding_near_dup_blocked(emb_ds, threshold: float = 0.95):
    """All-pairs cosine ≥ threshold, EXACT and fully distributed.

    The corpus is normalized into object-store-resident chunks once; the
    C·(C+1)/2 chunk pairs become a Dataset of (i, j) work items, each
    compared by a matmul task that fetches its two chunks from the object
    store. The driver holds only the chunk ref list — never a matrix.
    Compute is inherently O(N²) for exact all-pairs at an arbitrary
    threshold; at corpus scale combine with the LSH bucketing below to
    prune chunk pairs first.
    """
    import ray
    import ray.data as rd

    from ..util import compact_blocks

    def normalize(b: pa.Table) -> pa.Table:
        mat = np.array(b["embedding"].to_pylist(), dtype=np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        return pa.table(
            {
                "vec_id": b["vec_id"].combine_chunks().cast(pa.int64()),
                "embedding": pa.array(list(mat), pa.list_(pa.float64())),
            }
        )

    chunks = compact_blocks(emb_ds.map_batches(normalize, batch_format="pyarrow"))
    refs = chunks.to_arrow_refs()
    n_chunks = len(refs)
    pair_items = [
        {"i": i, "j": j} for i in range(n_chunks) for j in range(i, n_chunks)
    ]

    def compare(batch: pa.Table) -> pa.Table:
        rows_a, rows_b, cos = [], [], []
        for i, j in zip(batch["i"].to_pylist(), batch["j"].to_pylist()):
            ti = ray.get(refs[i])
            tj = ray.get(refs[j]) if j != i else ti
            mi = np.array(ti["embedding"].to_pylist(), dtype=np.float64)
            mj = np.array(tj["embedding"].to_pylist(), dtype=np.float64)
            ids_i = np.asarray(ti["vec_id"].to_pylist(), dtype=np.int64)
            ids_j = np.asarray(tj["vec_id"].to_pylist(), dtype=np.int64)
            sims = mi @ mj.T
            r_idx, c_idx = np.where(sims >= threshold)
            for r, c in zip(r_idx, c_idx):
                va, vb = int(ids_i[r]), int(ids_j[c])
                if va < vb:  # each unordered pair once (also drops self)
                    rows_a.append(va)
                    rows_b.append(vb)
                    cos.append(round(float(sims[r, c]), 6))
        return pa.table(
            {"a": pa.array(rows_a, pa.int64()), "b": pa.array(rows_b, pa.int64()),
             "cos": pa.array(cos, pa.float64())}
        )

    return rd.from_items(pair_items).map_batches(
        compare, batch_format="pyarrow", batch_size=1
    )


_ND_PLANES_SEED = 11


def _nd_planes(dim: int, n_planes: int) -> np.ndarray:
    return np.random.RandomState(_ND_PLANES_SEED).randn(n_planes, dim)


def embedding_near_dup_lsh(emb_ds, threshold: float = 0.9, n_planes: int = 8):
    """Approximate near-dup pairs via random-hyperplane bucketing — the
    100 TB scale path. Each vector lands in its code bucket plus every
    1-bit-flip probe bucket (n_planes+1 rows per vector), so any pair
    within hamming distance 2 of each other's code meets in ≥1 bucket;
    within-bucket comparison is an exact cosine matmul. Group sizes are
    ~N·(n_planes+1)/2^n_planes. Recall depends on the angle at the
    threshold (hyperplane split prob θ/π per plane) — sized for true
    NEAR-DUP thresholds (≥0.9); see the planted-dup recall test."""
    from ray.data.aggregate import Max

    def to_buckets(b: pa.Table) -> pa.Table:
        mat = np.array(b["embedding"].to_pylist(), dtype=np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        planes = _nd_planes(mat.shape[1], n_planes)
        bits = (mat @ planes.T > 0).astype(np.int64)
        codes = (bits * (1 << np.arange(n_planes))).sum(axis=1)
        ids = np.asarray(b["vec_id"].to_pylist(), dtype=np.int64)
        out_code, out_id, out_emb = [], [], []
        embs = list(mat)
        for idx in range(len(ids)):
            c = int(codes[idx])
            for probe in [c] + [c ^ (1 << p) for p in range(n_planes)]:
                out_code.append(probe)
                out_id.append(int(ids[idx]))
                out_emb.append(embs[idx])
        return pa.table(
            {
                "bucket": pa.array(out_code, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "embedding": pa.array(out_emb, pa.list_(pa.float64())),
            }
        )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset="vec_id").sort_values("vec_id")
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "cos": []}).astype(
                {"a": np.int64, "b": np.int64, "cos": np.float64}
            )
        mat = np.array(list(g["embedding"]), dtype=np.float64)
        ids = g["vec_id"].to_numpy()
        sims = mat @ mat.T
        r_idx, c_idx = np.where(sims >= threshold)
        keep = r_idx < c_idx
        return pd.DataFrame(
            {
                "a": ids[r_idx[keep]].astype(np.int64),
                "b": ids[c_idx[keep]].astype(np.int64),
                "cos": np.round(sims[r_idx[keep], c_idx[keep]], 6),
            }
        )

    cand = (
        emb_ds.map_batches(to_buckets, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
    )
    # a pair can meet in several buckets — dedup (cos identical everywhere)
    return cand.groupby(["a", "b"]).aggregate(Max("cos", alias_name="cos"))


def embedding_near_dup(emb_ds, threshold: float = 0.95):
    """All-pairs cosine ≥ threshold over the embeddings table: brute-force
    blocked matmul against a broadcast matrix (the baseline; see
    embedding_near_dup_blocked for the no-driver-matrix exact variant and
    embedding_near_dup_lsh for the bucketed scale path)."""
    import ray

    mats, ids = [], []
    for b in emb_ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
        ids.extend(b["vec_id"].to_pylist())
        mats.append(np.array(b["embedding"].to_pylist(), dtype=np.float64))
    full = np.vstack(mats)
    full = full / np.maximum(np.linalg.norm(full, axis=1, keepdims=True), 1e-12)
    ref = ray.put((np.array(ids, dtype=np.int64), full))

    def block(b: pa.Table) -> pa.Table:
        all_ids, mat = ray.get(ref)
        q = np.array(b["embedding"].to_pylist(), dtype=np.float64)
        q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        sims = q @ mat.T  # (batch, N)
        rows_a, rows_b, cos = [], [], []
        qids = b["vec_id"].to_pylist()
        for r, qid in enumerate(qids):
            hits = np.where(sims[r] >= threshold)[0]
            for c in hits:
                if qid < all_ids[c]:  # each unordered pair once
                    rows_a.append(qid)
                    rows_b.append(int(all_ids[c]))
                    cos.append(round(float(sims[r, c]), 6))
        return pa.table(
            {"a": pa.array(rows_a, pa.int64()), "b": pa.array(rows_b, pa.int64()),
             "cos": pa.array(cos, pa.float64())}
        )

    return emb_ds.map_batches(block, batch_format="pyarrow", batch_size=2048)


def decontaminate(docs_ds, bench_ds, k: int = 3, threshold: float = 0.2):
    """Benchmark decontamination: per training doc, the share of its
    DISTINCT word k-grams that also occur in a held-out benchmark/eval
    corpus — the standard pre-training hygiene pass (public practice:
    GPT-3 appendix C n-gram overlap; Dodge et al. 2021 C4 analysis).

    Ray shape: the benchmark's distinct k-gram set is computed
    DISTRIBUTED (explode → groupby-distinct), then collected and
    broadcast ONCE via ray.put — eval suites are tiny next to a
    training corpus (documented assumption; if the benchmark outgrows
    worker heap, degrade to a semi-join on the shingle stream, the
    ngram_jaccard_pairs machinery). Each training doc then needs one
    vectorized membership pass over its shingle stream plus an in-batch
    combiner before a single groupby(doc_id) — no all-to-all on text.

    Shingle semantics match ngram_jaccard_pairs (lowercase, whitespace
    tokens, distinct k-grams; docs shorter than k tokens contribute
    their whole token string; empty docs have zero grams). Output:
    (doc_id, n_grams, n_hit, contaminated 0/1) for every training doc.
    """
    import ray
    from ray.data.aggregate import Sum

    id_type = docs_ds.schema().base_schema.field("doc_id").type

    def explode(b: pa.Table) -> pa.Table:
        ids, grams = [], []
        for d, text in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            toks = text.lower().split()
            if not toks:
                sh = {""}  # sentinel row so empty docs stay in the output
            elif len(toks) < k:
                sh = {" ".join(toks)}
            else:
                sh = {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}
            for g in sorted(sh):
                ids.append(d)
                grams.append(g)
        return pa.table(
            {"doc_id": pa.array(ids, id_type), "shingle": pa.array(grams)}
        )

    from ..util import compact_blocks

    bench_rows = (
        compact_blocks(bench_ds.map_batches(explode, batch_format="pyarrow"))
        .groupby("shingle")
        .count()
        .take_all()
    )
    bench_ref = ray.put(
        frozenset(r["shingle"] for r in bench_rows if r["shingle"])
    )

    def mark(t: pa.Table) -> pa.Table:
        s = ray.get(bench_ref)
        grams = t["shingle"].to_pylist()
        real = pa.array([g != "" for g in grams])
        hit = pa.array([g != "" and g in s for g in grams])
        out = pa.table(
            {
                "doc_id": t["doc_id"],
                "n_grams": pc.cast(real, pa.int64()),
                "n_hit": pc.cast(hit, pa.int64()),
            }
        )
        # in-batch combiner: one row per doc per batch before the shuffle
        agg = out.group_by("doc_id").aggregate(
            [("n_grams", "sum"), ("n_hit", "sum")]
        )
        return agg.rename_columns(["doc_id", "n_grams", "n_hit"])

    per_doc = (
        compact_blocks(docs_ds.map_batches(explode, batch_format="pyarrow"))
        .map_batches(mark, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("n_grams", alias_name="n_grams"),
                   Sum("n_hit", alias_name="n_hit"))
    )

    def verdict(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n_grams"], pa.float64())
        h = pc.cast(t["n_hit"], pa.float64())
        ratio = pc.if_else(pc.greater(n, 0.0), pc.divide(h, pc.max_element_wise(n, 1.0)), pa.scalar(0.0))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_grams": pc.cast(t["n_grams"], pa.int64()),
                "n_hit": pc.cast(t["n_hit"], pa.int64()),
                "contaminated": pc.cast(
                    pc.greater_equal(ratio, threshold), pa.int64()),
            }
        )

    return per_doc.map_batches(verdict, batch_format="pyarrow")


def substring_dup_pairs(docs_ds, k: int = 24, df_cap: int = NGRAM_DF_CAP):
    """Verbatim-span dedup: doc pairs sharing an EXACT k-character
    substring (the copy-paste/boilerplate signal word-level Jaccard
    misses — public practice: Lee et al. 2021, "Deduplicating training
    data makes language models better", which uses suffix arrays; the
    distributed realization here is the char-k-gram inversion of the
    same test — two docs share a ≥k-char span iff they share a char
    k-gram, so stride-1 k-grams give EXACT span detection).

    Shuffle shape mirrors ngram_jaccard_pairs: explode to DISTINCT
    char k-grams per doc → document-frequency stop filter (grams in
    more than ``df_cap`` docs are boilerplate; dropped on BOTH sides,
    so the SQL oracle mirrors it with HAVING) → one groupby(gram) for
    candidate pairs → one groupby(pair) for shared-gram counts.
    Scale note: stride-1 grams are ~len(text) rows per doc; at corpus
    scale run per-partition suffix arrays or a strided index + dense
    probe pass instead — the pair algebra downstream is unchanged."""
    id_type = docs_ds.schema().base_schema.field("doc_id").type

    def explode(b: pa.Table) -> pa.Table:
        ids, grams, hashes = [], [], []
        for d, text in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            if len(text) < k:
                continue
            sh = {text[i:i + k] for i in range(len(text) - k + 1)}
            for g in sorted(sh):
                ids.append(d)
                grams.append(g)
                hashes.append(zlib.crc32(g.encode()))
        return pa.table(
            {"doc_id": pa.array(ids, id_type), "g": pa.array(grams),
             "h": pa.array(hashes, pa.int64())}
        )

    from ..util import compact_blocks

    grams = compact_blocks(docs_ds.map_batches(explode,
                                               batch_format="pyarrow"))
    return _shared_gram_pairs(grams, id_type, df_cap)


def _shared_gram_pairs(grams, id_type, df_cap: int):
    """Shared pair algebra of the gram-inversion dedup family: a
    (doc_id, g, h) relation → df-capped stop filter (both sides) →
    one groupby(gram) for candidate pairs → one groupby(pair) for
    shared counts → (a, b, shared)."""
    import ray

    from ..util import compact_blocks

    stop_rows = (
        grams.groupby(["h", "g"])
        .count()
        .map_batches(
            lambda t: t.filter(pc.greater(t["count()"], df_cap))
            if t.num_columns else t,
            batch_format="pyarrow",
        )
        .take_all()
    )
    stop_ref = ray.put(frozenset(r["g"] for r in stop_rows))

    def drop_stop(t: pa.Table) -> pa.Table:
        s = ray.get(stop_ref)
        if not s:
            return t
        return t.filter(pa.array([g not in s for g in t["g"].to_pylist()]))

    grams = compact_blocks(grams.map_batches(drop_stop,
                                             batch_format="pyarrow"))

    def pairs_in_group(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].unique())
        rows = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]]
        if not rows:
            return pd.DataFrame({"a": [], "b": []})
        return pd.DataFrame(rows, columns=["a", "b"])

    pairs = (
        grams.groupby(["h", "g"])
        .map_groups(pairs_in_group, batch_format="pandas")
    )
    counted = pairs.groupby(["a", "b"]).count()

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.table({"a": pa.array([], id_type),
                             "b": pa.array([], id_type),
                             "shared": pa.array([], pa.int64())})
        return pa.table({
            "a": t["a"].combine_chunks().cast(id_type),
            "b": t["b"].combine_chunks().cast(id_type),
            "shared": t["count()"].combine_chunks().cast(pa.int64()),
        })

    return counted.map_batches(finish, batch_format="pyarrow")


def winnow_pairs(docs_ds, k: int = 12, w: int = 4,
                 df_cap: int = NGRAM_DF_CAP):
    """Winnowing-fingerprint near-dup pairs (Schleimer, Wilkerson &
    Aiken 2003 — the MOSS local document fingerprinting algorithm):
    md5 hashes of stride-1 char k-grams, one fingerprint per window of
    ``w`` consecutive hashes (the window MINIMUM — lexicographic over
    the hex digest, which is what makes the selection exactly
    SQL-mirrorable via MIN() OVER a rows window), docs pair on shared
    fingerprints. Winnowing guarantees any shared run of length
    ≥ k + w - 1 chars produces a shared fingerprint while storing only
    ~2/(w+1) of the grams — the cheap robust middle ground between
    exact substring dedup (every gram) and MinHash (global
    signatures). Docs shorter than k+w-1 chars contribute their single
    global-minimum hash (the algorithm's at-least-one guarantee).

    Same downstream pair algebra (df-cap stop filter + two groupbys)
    as substring_dup_pairs."""
    import hashlib

    from ..util import compact_blocks

    id_type = docs_ds.schema().base_schema.field("doc_id").type

    def explode(b: pa.Table) -> pa.Table:
        ids, fps, hh = [], [], []
        for d, text in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            text = text or ""
            if len(text) < k:
                continue
            hs = [hashlib.md5(text[i:i + k].encode()).hexdigest()
                  for i in range(len(text) - k + 1)]
            if len(hs) < w:
                sel = {min(hs)}
            else:
                sel = {min(hs[i:i + w]) for i in range(len(hs) - w + 1)}
            for fp in sorted(sel):
                ids.append(d)
                fps.append(fp)
                hh.append(zlib.crc32(fp.encode()))
        return pa.table(
            {"doc_id": pa.array(ids, id_type), "g": pa.array(fps),
             "h": pa.array(hh, pa.int64())}
        )

    grams = compact_blocks(docs_ds.map_batches(explode,
                                               batch_format="pyarrow"))
    return _shared_gram_pairs(grams, id_type, df_cap)
