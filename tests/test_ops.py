"""Training-data ops: dedup family, similarity search, text stats,
multimodal plumbing — including planted-duplicate recall tests for the
approximate (rows-only) variants."""

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _planted_docs():
    """20 base docs + near-duplicates of the first 5 (one word changed)."""
    import ray.data as rd

    base = [
        f"doc number {i} " + " ".join(f"word{i * 40 + j}" for j in range(40))
        for i in range(20)
    ]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(base)]
    for i in range(5):
        toks = base[i].split()
        toks[10] = "CHANGED"
        rows.append({"doc_id": 100 + i, "text": " ".join(toks)})
    return rd.from_items(rows)


@pytest.mark.usefixtures("ray_session")
def test_minhash_lsh_finds_planted_dups():
    from jena_ray.ops.dedup_text import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(_planted_docs(), threshold=0.7).take_all()
    found = {(r["a"], r["b"]) for r in pairs}
    for i in range(5):
        assert (i, 100 + i) in found, f"planted pair {i} not found: {found}"
    # no false positives among unrelated base docs
    for a, b in found:
        assert b == a + 100, f"false positive {a},{b}"


@pytest.mark.usefixtures("ray_session")
def test_simhash_finds_planted_dups():
    from jena_ray.ops.dedup_text import simhash_pairs

    pairs = simhash_pairs(_planted_docs(), max_hamming=6).take_all()
    found = {(r["a"], r["b"]) for r in pairs}
    hits = sum(1 for i in range(5) if (i, 100 + i) in found)
    assert hits >= 4, f"simhash recall too low: {found}"


@pytest.mark.usefixtures("ray_session")
def test_ann_lsh_vs_bruteforce():
    import ray.data as rd

    from jena_ray.ops.similarity import brute_force_topk, lsh_topk, query_vector

    emb = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    q = query_vector(SF, 0)
    brute = [r["vec_id"] for r in brute_force_topk(emb, q, k=10).take_all()]
    approx = [r["vec_id"] for r in lsh_topk(emb, q, k=10, probes=3).take_all()]
    assert brute[0] == 0  # the query vector itself is rank 1 (cos=1)
    assert 0 in approx  # LSH must find the query's own bucket
    recall = len(set(brute) & set(approx)) / 10
    # weakly-similar random corpus: multi-probe LSH recall is modest by
    # design; the contract is "finds the strong matches"
    assert recall >= 0.3, f"LSH recall@10 {recall}: {approx} vs {brute}"


@pytest.mark.usefixtures("ray_session")
def test_fingerprint_deterministic_and_order_sensitive():
    import ray.data as rd

    from jena_ray.ops.textstats import fingerprint_batch

    docs = rd.from_items(
        [
            {"doc_id": 1, "text": "alpha beta gamma"},
            {"doc_id": 2, "text": "alpha beta gamma"},
            {"doc_id": 3, "text": "gamma beta alpha"},
        ]
    )
    rows = {r["doc_id"]: r["fingerprint"]
            for r in docs.map_batches(fingerprint_batch, batch_format="pyarrow").take_all()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]  # rolling hash is order-sensitive


@pytest.mark.usefixtures("ray_session")
def test_langid_stateful_stage():
    import ray.data as rd

    from jena_ray.ops.textstats import LangId

    docs = rd.from_items(
        [{"doc_id": 1, "text": "the quick brown fox jumped over the lazy hen and then ran in"}]
    )
    out = docs.map_batches(LangId, batch_format="pyarrow", concurrency=1).take_all()
    assert out[0]["lang_pred"] in ("en", "de", "fr", "es", "und")


@pytest.mark.usefixtures("ray_session")
def test_media_features_plumbing():
    from jena_ray.ops.multimodal import MEDIA_FEATURES_SCHEMA, media_features
    from jena_ray.sources.docs import interleaved_docs

    out = media_features(interleaved_docs(SF), concurrency=2)
    rows = out.take(5)
    assert rows, "corpus should contain media spans"
    r = rows[0]
    assert r["media_ref"].startswith("media://")
    assert len(r["feature"]) == 8
    assert r["width"] >= 64 and r["n_frames"] >= 1
    # deterministic: same ref → same features
    from jena_ray.ops.multimodal import MediaFeatureExtractor

    fx = MediaFeatureExtractor()
    w1, h1, n1, f1 = fx._fake_decode(r["media_ref"])
    assert (w1, h1, n1) == (r["width"], r["height"], r["n_frames"])


@pytest.mark.usefixtures("ray_session")
def test_media_resize_plan():
    from jena_ray.ops.multimodal import (MediaResizer, media_features,
                                         media_resize)
    from jena_ray.sources.docs import interleaved_docs

    out = media_resize(media_features(interleaved_docs(SF), concurrency=2),
                       max_w=128, max_h=96, concurrency=2)
    rows = out.take(10)
    assert rows
    for r in rows:
        assert 1 <= r["out_width"] <= 128 and 1 <= r["out_height"] <= 96
        # aspect preserved within floor rounding: out_w/out_h ≈ w/h
        if r["width"] > 128 or r["height"] > 96:
            assert r["out_width"] == 128 or r["out_height"] == 96
    # unit geometry: landscape binds width, portrait binds height,
    # small images pass through
    rz = MediaResizer(max_w=128, max_h=96)
    assert rz._plan(100, 50) == (100, 50)
    assert rz._plan(1280, 480) == (128, 48)
    assert rz._plan(480, 960) == (48, 96)


@pytest.mark.usefixtures("ray_session")
def test_media_frame_sample():
    from jena_ray.ops.multimodal import (FrameSampler, media_features,
                                         media_frame_sample)
    from jena_ray.sources.docs import interleaved_docs

    feats = media_features(interleaved_docs(SF), concurrency=2)
    out = media_frame_sample(feats, k=4, concurrency=2)
    rows = out.take(20)
    assert rows
    for r in rows:
        assert r["frame_ref"] == f"{r['media_ref']}#{r['frame_idx']}"
    # per-item: k uniformly spaced distinct indices, fewer for short clips
    import pyarrow as pa

    fs = FrameSampler(k=4)
    t = pa.table({"doc_id": ["d"], "media_ref": ["m"], "n_frames": [10]})
    got = fs(t)
    assert got["frame_idx"].to_pylist() == [0, 2, 5, 7]
    t1 = pa.table({"doc_id": ["d"], "media_ref": ["m"], "n_frames": [2]})
    assert fs(t1)["frame_idx"].to_pylist() == [0, 1]


@pytest.mark.usefixtures("ray_session")
def test_media_decode_real_is_stubbed():
    from jena_ray.ops.multimodal import decode_real

    with pytest.raises(NotImplementedError):
        decode_real(b"\x89PNG")


def test_pairs_in_group_caps_hot_buckets():
    """All-pairs in one LSH bucket is O(n²); above MAX_BUCKET_ALLPAIRS the
    kernel must degrade to O(n) chain pairing that keeps the duplicate
    cluster connected."""
    import pandas as pd

    from jena_ray.ops.dedup_text import MAX_BUCKET_ALLPAIRS, _pairs_in_group

    n = MAX_BUCKET_ALLPAIRS + 100
    g = pd.DataFrame({"doc_id": list(range(n))})
    out = _pairs_in_group(g)
    assert len(out) == n - 1  # chain, not n*(n-1)/2
    # chain connectivity: union of pairs spans all n docs
    seen = set(out["a"]) | set(out["b"])
    assert len(seen) == n

    small = pd.DataFrame({"doc_id": [3, 1, 2]})
    out2 = _pairs_in_group(small)
    assert len(out2) == 3  # all pairs below the cap
    assert (out2["a"] < out2["b"]).all()


@pytest.mark.usefixtures("ray_session")
def test_minhash_lsh_hot_bucket_end_to_end():
    """A pile of identical docs (one hot bucket in every band) must still
    come out connected, with pair volume linear in cluster size."""
    import ray.data as rd

    from jena_ray.ops.dedup_text import minhash_lsh_pairs

    rows = [{"doc_id": i, "text": "the same exact document text " * 10}
            for i in range(40)]
    pairs = minhash_lsh_pairs(rd.from_items(rows), threshold=0.9).take_all()
    # connectivity: every doc appears in at least one verified pair
    seen = {r["a"] for r in pairs} | {r["b"] for r in pairs}
    assert seen == set(range(40))
    assert all(r["jaccard"] == 1.0 for r in pairs)


@pytest.mark.usefixtures("ray_session")
def test_embedding_near_dup_blocked_matches_bruteforce():
    """The chunked no-driver-matrix exact variant must produce the exact
    same pair set as the broadcast brute-force baseline."""
    import ray.data as rd

    from jena_ray.ops.dedup_text import embedding_near_dup, embedding_near_dup_blocked

    emb = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    base = {(r["a"], r["b"], r["cos"])
            for r in embedding_near_dup(emb, threshold=0.35).take_all()}
    blocked = {(r["a"], r["b"], r["cos"])
               for r in embedding_near_dup_blocked(emb, threshold=0.35).take_all()}
    assert base, "threshold chosen so the truth set is non-empty"
    assert blocked == base


@pytest.mark.usefixtures("ray_session")
def test_embedding_near_dup_lsh_recall_on_planted_dups():
    """Hyperplane-LSH near-dup: recall >= 0.95 against brute-force truth on
    a corpus with PLANTED near-duplicates (cos >= 0.9 — the regime the
    bucketing is sized for; the sf tables have no true near-dups)."""
    import ray.data as rd

    from jena_ray.ops.dedup_text import embedding_near_dup, embedding_near_dup_lsh

    rng = np.random.RandomState(3)
    base = rng.randn(200, 64)
    rows = [{"vec_id": i, "embedding": list(map(float, v))}
            for i, v in enumerate(base)]
    # plant 40 near-duplicates: tiny perturbation of the first 40 vectors
    for i in range(40):
        v = base[i] + 0.05 * rng.randn(64)
        rows.append({"vec_id": 1000 + i, "embedding": list(map(float, v))})
    ds = rd.from_items(rows)

    truth = {(r["a"], r["b"]) for r in embedding_near_dup(ds, threshold=0.9).take_all()}
    got = {(r["a"], r["b"]) for r in embedding_near_dup_lsh(ds, threshold=0.9).take_all()}
    assert len(truth) >= 40
    recall = len(got & truth) / len(truth)
    assert recall >= 0.95, f"recall {recall:.3f} over {len(truth)} true pairs"
    assert got <= truth  # within-bucket check is exact cosine: no false positives


@pytest.mark.usefixtures("ray_session")
def test_ivf_topk_recall_vs_bruteforce():
    """IVF with generous nprobe must recover the exact top-k on the
    embeddings table; tight nprobe still recovers most of it."""
    import ray.data as rd

    from jena_ray.ops.similarity import brute_force_topk, ivf_topk, query_vector

    emb = rd.read_parquet(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    q = query_vector(SF, vec_id=0)
    exact = [r["vec_id"] for r in brute_force_topk(emb, q, k=5).take_all()]
    # probing every cell == exhaustive: identical result incl. order
    full = [r["vec_id"] for r in
            ivf_topk(emb, q, k=5, n_centroids=8, nprobe=8).take_all()]
    assert full == exact
    # tight probe: the top hit must survive, recall >= 3/5
    tight = [r["vec_id"] for r in
             ivf_topk(emb, q, k=5, n_centroids=8, nprobe=3).take_all()]
    assert exact[0] in tight
    assert len(set(tight) & set(exact)) >= 3


@pytest.mark.usefixtures("ray_session")
def test_hll_approx_count_distinct():
    """HLL estimate within 3 standard errors of exact, and partition-
    independent (merge is commutative max)."""
    import ray.data as rd

    from jena_ray.ops.sketches import approx_count_distinct

    n = 20000
    ds = rd.from_items([{"v": f"val-{i % 7919}"} for i in range(n)])
    exact = 7919
    est = approx_count_distinct(ds, "v", p=12)
    se = 1.04 / (4096 ** 0.5)
    assert abs(est - exact) / exact < 3 * se, (est, exact)
    # partitioning independence
    est2 = approx_count_distinct(ds.repartition(13), "v", p=12)
    assert est == est2

    # small-range linear counting regime
    small = rd.from_items([{"v": i} for i in range(100)])
    est_small = approx_count_distinct(small, "v", p=12)
    assert abs(est_small - 100) < 5


@pytest.mark.usefixtures("ray_session")
def test_bloom_filter_no_false_negatives_bounded_fp():
    """Bloom membership: every built key probes True (no false
    negatives); non-members probe True at a bounded rate; the built
    filter is partition-independent (merge is bitwise OR)."""
    import ray.data as rd

    from jena_ray.ops.sketches import bloom_build, bloom_probe

    keys = rd.from_items([{"k": f"key-{i}"} for i in range(5000)])
    bits = bloom_build(keys, "k", m_bits=1 << 17, k=5)
    assert bits == bloom_build(keys.repartition(7), "k", m_bits=1 << 17, k=5)

    members = bloom_probe(keys, "k", bits, k=5).take_all()
    assert all(r["maybe_member"] for r in members)

    others = rd.from_items([{"k": f"other-{i}"} for i in range(5000)])
    fp = sum(r["maybe_member"] for r in bloom_probe(others, "k", bits,
                                                    k=5).take_all())
    # m/n = 26 bits/key, k=5 → theoretical FP ~0.1%; allow 1%
    assert fp < 50, fp


@pytest.mark.usefixtures("ray_session")
def test_countmin_heavy_hitters():
    """Count-Min: estimates never undercount, heavy hitters are exact
    within e·N/width, and the sketch is partition-independent (merge
    is elementwise sum)."""
    import numpy as np
    import ray.data as rd

    from jena_ray.ops.sketches import countmin_build, countmin_estimate

    rows = [{"k": "heavy-a"}] * 3000 + [{"k": "heavy-b"}] * 1500 + [
        {"k": f"tail-{i % 997}"} for i in range(10000)
    ]
    ds = rd.from_items(rows)
    sk = countmin_build(ds, "k", width=1 << 14)
    assert np.array_equal(sk, countmin_build(ds.repartition(11), "k",
                                             width=1 << 14))

    est = countmin_estimate(sk, ["heavy-a", "heavy-b", "absent"])
    n = len(rows)
    slack = np.e * n / (1 << 14)
    assert 3000 <= est[0] <= 3000 + slack
    assert 1500 <= est[1] <= 1500 + slack
    assert est[2] <= slack


@pytest.mark.usefixtures("ray_session")
def test_simhash_hot_bucket_chain_degrades():
    """A segment bucket beyond MAX_BUCKET_ALLPAIRS chain-degrades to O(n)
    sorted-successor pairs instead of O(n²) all-pairs (VERDICT r2 #3);
    identical docs stay connected through the chain."""
    import ray.data as rd

    from jena_ray.ops import dedup_text as dt

    old = dt.MAX_BUCKET_ALLPAIRS
    dt.MAX_BUCKET_ALLPAIRS = 8
    try:
        n = 24  # identical docs: every segment bucket holds all 24
        docs = rd.from_items(
            [{"doc_id": f"d{i:03d}", "text": "same text here"} for i in range(n)]
        )
        pairs = dt.simhash_pairs(docs, max_hamming=3).take_all()
        got = {(r["a"], r["b"]) for r in pairs}
        # chain pairs only: (d000,d001), (d001,d002), ... — NOT all-pairs
        want = {(f"d{i:03d}", f"d{i+1:03d}") for i in range(n - 1)}
        assert got == want
        assert all(r["hamming"] == 0 for r in pairs)
    finally:
        dt.MAX_BUCKET_ALLPAIRS = old


@pytest.mark.usefixtures("ray_session")
def test_paragraph_dedup_keeps_first_occurrence():
    import ray.data as rd

    from jena_ray.ops.dedup_text import paragraph_dedup

    docs = rd.from_items([
        {"doc_id": 3, "text": "unique-c\n\nshared-x\n\nunique-d"},
        {"doc_id": 1, "text": "shared-x\n\nunique-a\n\nshared-y"},
        {"doc_id": 2, "text": "shared-y\n\nunique-b\n\nshared-x"},
        {"doc_id": 4, "text": "shared-x\n\nshared-y"},  # fully duplicate
    ])
    out = {r["doc_id"]: r["text"] for r in paragraph_dedup(docs).take_all()}
    # doc 1 is the corpus-first occurrence of shared-x and shared-y
    assert out[1] == "shared-x\n\nunique-a\n\nshared-y"
    assert out[2] == "unique-b"
    assert out[3] == "unique-c\n\nunique-d"
    # every paragraph of doc 4 was seen earlier → the doc drops out
    assert 4 not in out


@pytest.mark.usefixtures("ray_session")
def test_paragraph_dedup_within_doc_repeat():
    import ray.data as rd

    from jena_ray.ops.dedup_text import paragraph_dedup

    docs = rd.from_items([{"doc_id": 7, "text": "p\n\np\n\nq"}])
    out = paragraph_dedup(docs).take_all()
    assert out == [{"doc_id": 7, "text": "p\n\nq"}]


@pytest.mark.usefixtures("ray_session")
def test_decontaminate_flags_overlapping_docs():
    import ray.data as rd

    from jena_ray.ops.dedup_text import decontaminate

    bench = rd.from_items([
        {"doc_id": 900, "text": "the quick brown fox jumps over the lazy dog"},
    ])
    train = rd.from_items([
        # verbatim benchmark leak → fully contaminated
        {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog"},
        # clean doc, zero overlap
        {"doc_id": 2, "text": "alpha beta gamma delta epsilon zeta eta"},
        # partial overlap: leading 5 benchmark tokens inside fresh text
        {"doc_id": 3, "text": "the quick brown fox jumps far away home now"},
        # shorter than k → whole-string shingle, not in benchmark
        {"doc_id": 4, "text": "quick brown"},
        # empty doc → zero grams, not contaminated
        {"doc_id": 5, "text": ""},
    ])
    out = {r["doc_id"]: r for r in
           decontaminate(train, bench, k=3, threshold=0.2).take_all()}
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[1]["n_hit"] == out[1]["n_grams"] == 7
    assert out[1]["contaminated"] == 1
    assert out[2]["n_hit"] == 0 and out[2]["contaminated"] == 0
    assert out[3]["n_grams"] == 7 and out[3]["n_hit"] == 3
    assert out[3]["contaminated"] == 1  # 3/7 ≥ 0.2
    assert out[4]["n_grams"] == 1 and out[4]["n_hit"] == 0
    assert out[5]["n_grams"] == 0 and out[5]["contaminated"] == 0


def test_repetition_batch_kernel():
    from jena_ray.ops.textstats import repetition_batch

    b = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": ["spam spam spam spam", "all words here differ", "one", ""],
    })
    out = repetition_batch(b).to_pylist()
    by = {r["doc_id"]: r for r in out}
    assert by[1]["dup_word_frac"] == 0.75
    assert by[1]["top_word_frac"] == 1.0
    assert by[1]["top_bigram_frac"] == 1.0
    assert by[2]["dup_word_frac"] == 0.0
    assert by[2]["top_word_frac"] == 0.25
    assert by[3]["n_words"] == 1 and by[3]["top_bigram_frac"] == 0.0
    assert by[4]["n_words"] == 0 and by[4]["dup_word_frac"] == 0.0


@pytest.mark.usefixtures("ray_session")
def test_sampling_deterministic_and_exact():
    import ray.data as rd

    from jena_ray.ops.sampling import (bottomk_sample, hash_sample,
                                       stratified_sample)

    rows = [{"doc_id": i, "lang": "en" if i % 3 else "de"}
            for i in range(400)]
    ds = rd.from_items(rows)
    a = sorted(r["doc_id"] for r in hash_sample(ds, 0.25).take_all())
    b = sorted(r["doc_id"] for r in hash_sample(ds, 0.25).take_all())
    assert a == b  # reproducible
    assert 0.15 < len(a) / 400 < 0.35  # near the rate
    sup = set(r["doc_id"] for r in hash_sample(ds, 0.5).take_all())
    assert set(a) <= sup  # nested: raising the rate only adds rows

    st = stratified_sample(ds, {"de": 1.0}, default_rate=0.0).take_all()
    assert {r["lang"] for r in st} == {"de"}
    assert len(st) == sum(1 for r in rows if r["lang"] == "de")

    bk = bottomk_sample(ds, k=7).take_all()
    assert len(bk) == 7
    import hashlib
    want = sorted(
        (hashlib.md5(str(i).encode()).hexdigest(), i) for i in range(400)
    )[:7]
    assert sorted(r["doc_id"] for r in bk) == sorted(i for _, i in want)


def test_rate_to_hex_bounds():
    from jena_ray.ops.sampling import _rate_to_hex

    assert _rate_to_hex(0.0) == "00000000"
    assert _rate_to_hex(0.25) == "40000000"
    assert _rate_to_hex(1.0) == "g"  # sorts after all hex → keep all


@pytest.mark.usefixtures("ray_session")
def test_tfidf_topk_ranks_distinctive_terms():
    import ray.data as rd

    from jena_ray.ops.textstats import tfidf_topk

    ds = rd.from_items([
        {"doc_id": 1, "text": "common common unicorn"},
        {"doc_id": 2, "text": "common common dragon dragon"},
        {"doc_id": 3, "text": "common phoenix"},
    ])
    out = tfidf_topk(ds, k=2).take_all()
    by = {}
    for r in out:
        by.setdefault(r["doc_id"], []).append(r)
    # the doc-unique term always outranks the corpus-wide one
    assert by[1][0]["term"] == "unicorn"
    assert by[2][0]["term"] == "dragon"
    assert by[3][0]["term"] == "phoenix"
    # 'common' appears in all 3 docs → idf = ln(3/3) = 0
    for rows in by.values():
        for r in rows:
            if r["term"] == "common":
                assert r["tfidf"] == 0.0


@pytest.mark.usefixtures("ray_session")
def test_substring_dup_pairs_detects_copied_span():
    import ray.data as rd

    from jena_ray.ops.dedup_text import substring_dup_pairs

    span = "THIS EXACT SPAN WAS COPIED VERBATIM INTO BOTH DOCS"
    # distinct chars ADJACENT to the span on both sides, so no window
    # crossing the span boundary is shared — shared count is exact
    ds = rd.from_items([
        {"doc_id": 1, "text": "opening wordsX" + span + "Ytrailing one"},
        {"doc_id": 2, "text": "different headQ" + span + "Zother tail"},
        {"doc_id": 3, "text": "completely unrelated text with no overlap"},
        {"doc_id": 4, "text": "short"},  # below k → no grams
    ])
    out = substring_dup_pairs(ds, k=24).take_all()
    pairs = {(r["a"], r["b"]): r["shared"] for r in out}
    assert set(pairs) == {(1, 2)}
    # a shared span of length L yields L-k+1 shared k-grams
    assert pairs[(1, 2)] == len(span) - 24 + 1


@pytest.mark.usefixtures("ray_session")
def test_seq_pack_prefix_sums_and_budget():
    import ray.data as rd

    from jena_ray.ops.chunking import seq_pack

    docs = [{"doc_id": i, "text": " ".join(["w"] * n)}
            for i, n in enumerate([3, 5, 0, 10, 4, 7])]
    out = sorted(seq_pack(rd.from_items(docs, override_num_blocks=3),
                          budget=8).take_all(),
                 key=lambda r: r["doc_id"])
    # tape order = doc_id order; starts are exact prefix sums
    assert [r["tape_start"] for r in out] == [0, 3, 8, 8, 18, 22]
    assert [r["pack_id"] for r in out] == [0, 0, 1, 1, 2, 2]
    assert [r["pack_off"] for r in out] == [0, 3, 0, 0, 2, 6]


@pytest.mark.usefixtures("ray_session")
def test_pii_scrub_redacts_and_counts():
    import ray.data as rd

    from jena_ray.ops.pii import pii_scrub

    ds = rd.from_items([
        {"doc_id": 1,
         "text": "mail a.b+c@x-corp.co.uk now, ping 192.168.0.1 "
                 "or call +1-555-0123"},
        {"doc_id": 2, "text": "no pii here 3.14 v1.2.3"},
    ])
    rows = {r["doc_id"]: r for r in pii_scrub(ds).take_all()}
    r1 = rows[1]
    assert r1["clean_text"] == "mail [EMAIL] now, ping [IP] or call [PHONE]"
    assert (r1["n_email"], r1["n_ip"], r1["n_phone"]) == (1, 1, 1)
    r2 = rows[2]
    # version strings / floats are NOT IPv4 (needs 4 octets)
    assert r2["clean_text"] == "no pii here 3.14 v1.2.3"
    assert (r2["n_email"], r2["n_ip"], r2["n_phone"]) == (0, 0, 0)


@pytest.mark.usefixtures("ray_session")
def test_unigram_xent_orders_common_vs_rare():
    import ray.data as rd

    from jena_ray.ops.textstats import unigram_xent

    # doc 1 = all corpus-common words, doc 2 = half rare words
    docs = [{"doc_id": 1, "text": "the the the cat"},
            {"doc_id": 2, "text": "the zyx qwv cat"},
            {"doc_id": 3, "text": "the cat the the"}]
    rows = {r["doc_id"]: r for r in unigram_xent(
        rd.from_items(docs)).take_all()}
    assert rows[1]["n_tokens"] == 4
    assert rows[2]["xent"] > rows[1]["xent"]
    # same bag of words → identical cross-entropy
    assert rows[3]["xent"] == rows[1]["xent"]


@pytest.mark.usefixtures("ray_session")
def test_semdedup_drops_planted_near_duplicates():
    import numpy as np
    import ray.data as rd

    from jena_ray.ops.similarity import semdedup

    rng = np.random.RandomState(3)
    base = rng.randn(40, 16)
    items = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(40)]
    # plant exact duplicates of vectors 5 and 11
    items.append({"vec_id": 100, "embedding": base[5].tolist()})
    items.append({"vec_id": 101, "embedding": base[11].tolist()})
    out = {r["vec_id"]: r for r in semdedup(
        rd.from_items(items), n_clusters=4, threshold=0.99).take_all()}
    assert len(out) == 42
    # identical vectors share a cluster; the higher id is dropped
    assert out[100]["cluster"] == out[5]["cluster"]
    assert out[5]["keep"] and not out[100]["keep"]
    assert out[11]["keep"] and not out[101]["keep"]
    # non-duplicates all survive
    assert sum(1 for r in out.values() if not r["keep"]) == 2


@pytest.mark.usefixtures("ray_session")
def test_kmeans_fit_recovers_planted_blobs():
    import numpy as np
    import ray.data as rd

    from jena_ray.ops.similarity import kmeans_fit

    rng = np.random.RandomState(5)
    blobs = np.array([[10.0, 0.0], [-10.0, 0.0], [0.0, 10.0]])
    items = []
    for i in range(90):
        c = i % 3
        v = blobs[c] + rng.randn(2) * 0.3
        items.append({"vec_id": i, "embedding": v.tolist()})
    cents, assign = kmeans_fit(rd.from_items(items, override_num_blocks=4),
                               k=3, iters=8)
    rows = assign.take_all()
    assert len(rows) == 90
    # every planted blob maps to exactly one k-means cluster
    by_blob = {}
    for r in rows:
        by_blob.setdefault(r["vec_id"] % 3, set()).add(r["cluster"])
    assert all(len(s) == 1 for s in by_blob.values())
    assert len(set.union(*by_blob.values())) == 3
    # centroids land on the blob centers
    got = sorted(np.round(c).tolist() for c in cents)
    assert got == [[-10.0, 0.0], [0.0, 10.0], [10.0, 0.0]]


@pytest.mark.usefixtures("ray_session")
def test_source_mix_budgets_per_source():
    import ray.data as rd

    from jena_ray.ops.sampling import source_mix

    docs = []
    # big: 200 docs x 100 tokens = 20k tokens; small: 5 x 10 = 50
    for i in range(200):
        docs.append({"doc_id": i, "source": "big",
                     "text": " ".join(["w"] * 100)})
    for i in range(200, 205):
        docs.append({"doc_id": i, "source": "small",
                     "text": " ".join(["w"] * 10)})
    out = source_mix(rd.from_items(docs), budget_tokens=5000).take_all()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    # the small source fits the budget → kept whole
    assert len(by_src["small"]) == 5
    # the big source downsamples to ~budget expected tokens (rate 0.25)
    kept_tokens = sum(r["n_tokens"] for r in by_src["big"])
    assert 2000 <= kept_tokens <= 9000
    # deterministic: a second run keeps the identical doc set
    out2 = source_mix(rd.from_items(docs), budget_tokens=5000).take_all()
    assert sorted(r["doc_id"] for r in out2) == \
        sorted(r["doc_id"] for r in out)


@pytest.mark.usefixtures("ray_session")
def test_winnow_pairs_guarantee_and_selectivity():
    """Winnowing guarantee: any shared run of >= k+w-1 chars yields a
    shared fingerprint; unrelated docs share none."""
    import ray.data as rd

    from jena_ray.ops.dedup_text import winnow_pairs

    span = "COMMON RUN OF CHARACTERS LONG ENOUGH TO GUARANTEE A PRINT"
    ds = rd.from_items([
        {"doc_id": 1, "text": "aqzx one lead " + span + " tail bqzx"},
        {"doc_id": 2, "text": "cwvu other head " + span + " end dwvu"},
        {"doc_id": 3, "text": "entirely disjoint characters xyzzy plugh"},
    ])
    out = winnow_pairs(ds, k=12, w=4).take_all()
    pairs = {(r["a"], r["b"]): r["shared"] for r in out}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert all(3 not in p for p in pairs)


def _interleaved(doc_id, spans):
    return {"doc_id": doc_id,
            "spans": [{"kind": k, "text": t, "media_ref": m, "offset": i}
                      for i, (k, t, m) in enumerate(spans)]}


@pytest.mark.usefixtures("ray_session")
def test_media_caption_pairs_neighbors():
    import ray.data as rd

    from jena_ray.ops.multimodal import media_caption_pairs

    docs = [
        _interleaved("d1", [("text", "intro words", ""),
                            ("media", "", "img://a"),
                            ("text", "caption after", "")]),
        _interleaved("d2", [("media", "", "img://b"),
                            ("media", "", "img://c")]),
    ]
    out = {r["media_ref"]: r for r in
           media_caption_pairs(rd.from_items(docs)).take_all()}
    assert out["img://a"]["caption_before"] == "intro words"
    assert out["img://a"]["caption_after"] == "caption after"
    # adjacent MEDIA spans are not captions
    assert out["img://b"]["caption_before"] == ""
    assert out["img://b"]["caption_after"] == ""
    assert out["img://c"]["span_idx"] == 1


@pytest.mark.usefixtures("ray_session")
def test_media_dedup_collapses_reuse():
    import ray.data as rd

    from jena_ray.ops.multimodal import media_dedup

    docs = [
        _interleaved("a", [("media", "", "img://x"),
                           ("text", "t", "")]),
        _interleaved("b", [("text", "t", ""),
                           ("media", "", "img://x"),
                           ("media", "", "img://y")]),
    ]
    out = {r["media_ref"]: r for r in
           media_dedup(rd.from_items(docs)).take_all()}
    assert out["img://x"]["n_uses"] == 2
    assert out["img://x"]["keep_doc"] == "a"
    assert out["img://x"]["keep_span"] == 0
    assert out["img://y"]["keep_doc"] == "b" and out["img://y"]["n_uses"] == 1


@pytest.mark.usefixtures("ray_session")
def test_bigram_pmi_ranks_true_collocation():
    import ray.data as rd

    from jena_ray.ops.textstats import bigram_pmi

    # "hong kong" always co-occurs; "the cat"/"the dog" split "the"
    docs = [{"doc_id": i, "text": "hong kong the cat and the dog"}
            for i in range(5)]
    out = {(r["w1"], r["w2"]): r for r in
           bigram_pmi(rd.from_items(docs), min_count=5).take_all()}
    assert ("hong", "kong") in out and out[("hong", "kong")]["c_ab"] == 5
    # exclusive pair scores strictly above the shared-"the" pairs
    assert (out[("hong", "kong")]["pmi"] >
            out[("the", "cat")]["pmi"])
