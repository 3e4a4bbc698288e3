"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting. All stateless vectorized map_batches kernels over
the `documents` table (doc_id, text, lang, source, n_chars).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_STOPWORDS = ["the", "and", "of", "a", "to", "in", "is", "it", "for", "on"]

# BPE-ish word/punct tokenizer (compiled once at module import — shipped to
# workers in the serialized closure, compiled once per process)
_TOKEN_RE = re.compile(r"\w+|[^\w\s]")


def token_stats_batch(b: pa.Table) -> pa.Table:
    """Whitespace token count + regex (BPE-ish) token count + char count."""
    text = b["text"]
    ws_tokens = pc.list_value_length(pc.split_pattern(text, " ")).cast(pa.int64())
    texts = text.to_pylist()
    re_tokens = pa.array([len(_TOKEN_RE.findall(t)) for t in texts], pa.int64())
    return pa.Table.from_arrays(
        [
            b["doc_id"].combine_chunks(),
            ws_tokens.combine_chunks(),
            re_tokens,
            pc.utf8_length(text).cast(pa.int64()).combine_chunks(),
        ],
        names=["doc_id", "n_ws_tokens", "n_re_tokens", "n_chars"],
    )


def quality_batch(b: pa.Table) -> pa.Table:
    """Quality heuristics: stopword ratio, mean token length, punct count."""
    toks_list = pc.split_pattern(pc.utf8_lower(b["text"]), " ")
    out_stop, out_meanlen = [], []
    for toks in toks_list.to_pylist():
        toks = [t for t in toks if t]
        n = max(1, len(toks))
        out_stop.append(round(sum(1 for t in toks if t in _STOPWORDS) / n, 6))
        out_meanlen.append(round(sum(len(t) for t in toks) / n, 6))
    return pa.Table.from_arrays(
        [
            b["doc_id"].combine_chunks(),
            pa.array(out_stop, pa.float64()),
            pa.array(out_meanlen, pa.float64()),
            pc.count_substring(b["text"], ".").cast(pa.int64()).combine_chunks(),
        ],
        names=["doc_id", "stopword_ratio", "mean_token_len", "n_dots"],
    )


# crude character-bigram profiles for a few languages (public-knowledge
# heuristic, not a trained model): score = matched-bigram fraction
_LANG_BIGRAMS = {
    "en": ["th", "he", "in", "er", "an", "re", "on", "at", "en", "nd"],
    "de": ["er", "en", "ch", "de", "ei", "nd", "te", "in", "ie", "ge"],
    "fr": ["es", "le", "de", "en", "re", "nt", "on", "er", "te", "ou"],
    "es": ["de", "es", "en", "el", "la", "os", "ar", "ue", "ra", "as"],
}


class LangId:
    """Stateful stage pattern: profile tables built once per actor."""

    def __init__(self):
        self.profiles = {
            lang: set(bigrams) for lang, bigrams in _LANG_BIGRAMS.items()
        }

    def _score(self, text: str) -> str:
        text = text.lower()
        bigrams = [text[i : i + 2] for i in range(0, min(len(text), 400) - 1)]
        if not bigrams:
            return "und"
        best_lang, best = "und", -1.0
        for lang, prof in self.profiles.items():
            score = sum(1 for bg in bigrams if bg in prof) / len(bigrams)
            if score > best:
                best_lang, best = lang, score
        return best_lang

    def __call__(self, b: pa.Table) -> pa.Table:
        langs = pa.array([self._score(t) for t in b["text"].to_pylist()])
        return pa.Table.from_arrays(
            [b["doc_id"].combine_chunks(), langs],
            names=["doc_id", "lang_pred"],
        )


_FP_BASE = 1000003
_FP_MOD = (1 << 61) - 1


def fingerprint_batch(b: pa.Table) -> pa.Table:
    """Rolling polynomial hash over tokens (Rabin-Karp document
    fingerprint) — order-sensitive, unlike a bag-of-words hash."""
    import zlib

    fps = []
    for text in b["text"].to_pylist():
        h = 0
        for tok in text.split():
            # crc32, NOT builtin hash(): workers must agree across processes
            th = zlib.crc32(tok.encode())
            h = (h * _FP_BASE + th) % _FP_MOD
        fps.append(h)
    return pa.Table.from_arrays(
        [b["doc_id"].combine_chunks(), pa.array(fps, pa.int64())],
        names=["doc_id", "fingerprint"],
    )


def repetition_batch(b: pa.Table) -> pa.Table:
    """Repetition quality signals (Gopher data-quality filters, Rae et
    al. 2021 §A1.1 — public practice): excessive word / n-gram
    repetition marks low-quality machine-generated or boilerplate text.
    Per doc: word counts, duplicate-word fraction, the most frequent
    word's share, and the most frequent word-bigram's share. Pure
    per-row kernel — embarrassingly parallel, no shuffle."""
    from collections import Counter

    ids = b["doc_id"].combine_chunks()
    n_words, n_distinct = [], []
    dup_frac, top_word, top_bigram = [], [], []
    for text in b["text"].to_pylist():
        toks = text.lower().split()
        n = len(toks)
        nd = len(set(toks))
        n_words.append(n)
        n_distinct.append(nd)
        dup_frac.append(round(1.0 - nd / n, 6) if n else 0.0)
        top_word.append(
            round(Counter(toks).most_common(1)[0][1] / n, 6) if n else 0.0)
        if n >= 2:
            bigrams = Counter(zip(toks, toks[1:]))
            top_bigram.append(
                round(bigrams.most_common(1)[0][1] / (n - 1), 6))
        else:
            top_bigram.append(0.0)
    return pa.Table.from_arrays(
        [
            ids,
            pa.array(n_words, pa.int64()),
            pa.array(n_distinct, pa.int64()),
            pa.array(dup_frac, pa.float64()),
            pa.array(top_word, pa.float64()),
            pa.array(top_bigram, pa.float64()),
        ],
        names=["doc_id", "n_words", "n_distinct", "dup_word_frac",
               "top_word_frac", "top_bigram_frac"],
    )


class QualityScorer:
    """Batched quality-model inference — the actor-pool 'model scoring'
    stage shape: the model (here a deterministic linear scorer over the
    quality_batch features, so the pipeline is SQL-oracle-able; at
    scale swap in a real classifier) is built ONCE per actor in
    __init__, scoring is one vectorized pass per batch in __call__.
    Emits (doc_id, score, keep) with score = w·x + bias rounded to 6
    and keep = score > threshold."""

    def __init__(self, weights: dict | None = None, bias: float = 0.5,
                 threshold: float = 0.55):
        self.w = weights or {
            "stopword_ratio": 2.0, "mean_token_len": -0.1, "n_dots": 0.01,
        }
        self.bias = bias
        self.threshold = threshold

    def __call__(self, b: pa.Table) -> pa.Table:
        feats = quality_batch(b)
        # fixed evaluation order (left-assoc sum) so the oracle's SQL
        # expression produces bit-identical doubles
        score = pc.multiply(feats["stopword_ratio"],
                            pa.scalar(self.w["stopword_ratio"]))
        score = pc.add(score, pc.multiply(feats["mean_token_len"],
                                          pa.scalar(self.w["mean_token_len"])))
        score = pc.add(score, pc.multiply(
            pc.cast(feats["n_dots"], pa.float64()),
            pa.scalar(self.w["n_dots"])))
        # DuckDB round() is half-away-from-zero; pyarrow defaults to
        # half-to-even — ties at the 7th digit would diverge
        score = pc.round(pc.add(score, pa.scalar(self.bias)), ndigits=6,
                         round_mode="half_towards_infinity")
        return pa.table({
            "doc_id": feats["doc_id"],
            "score": score,
            "keep": pc.greater(score, pa.scalar(self.threshold)),
        })


def vocab_topk(docs_ds, k: int = 1000, pattern: str = r"[a-z0-9]+"):
    """Global vocabulary: the corpus's top-k terms by frequency — the
    first pass of any tokenizer/vocab build (BPE/WordPiece corpus
    statistics). The classic distributed word-count shape: per-batch
    Counter partial aggregation (combiner — the shuffle carries one row
    per (block, term), not per occurrence), ONE groupby(term) sum,
    per-block top-k pruning, then a tiny global sort+limit. Ties break
    (count desc, term asc) so the cutoff is deterministic and
    SQL-mirrorable."""
    from collections import Counter

    from ray.data.aggregate import Sum

    tok = re.compile(pattern)

    def partial(b: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in b["text"].to_pylist():
            c.update(tok.findall(text.lower()))
        return pa.table({
            "term": pa.array(list(c.keys()), pa.string()),
            "cnt": pa.array(list(c.values()), pa.int64()),
        })

    counts = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def prune(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        idx = pc.select_k_unstable(
            t, k=min(k, t.num_rows),
            sort_keys=[("cnt", "descending"), ("term", "ascending")])
        return t.take(idx)

    return (
        counts.map_batches(prune, batch_format="pyarrow")
        .sort(key=["cnt", "term"], descending=[True, False])
        .limit(k)
    )


def tfidf_topk(docs_ds, k: int = 5, num_docs: int | None = None):
    """Per-doc top-k terms by TF-IDF — the classic relevance/quality
    feature (public: Sparck Jones 1972; idf = ln(N/df)). Distributed
    two-pass shape: in-batch term counting (Counter per doc, one row
    per (doc, term)), document frequency as ONE groupby(term), scores
    attached by a hash join on term, then a per-doc top-k inside
    groupby(doc_id).map_groups. Ties break on (score desc, term asc)
    over the ROUNDED score so results are deterministic and exactly
    SQL-mirrorable."""
    import math
    from collections import Counter

    id_type = docs_ds.schema().base_schema.field("doc_id").type

    def explode(b: pa.Table) -> pa.Table:
        ids, terms, tfs = [], [], []
        for d, text in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            for term, n in Counter(text.lower().split()).items():
                ids.append(d)
                terms.append(term)
                tfs.append(n)
        return pa.table({
            "doc_id": pa.array(ids, id_type),
            "term": pa.array(terms, pa.string()),
            "tf": pa.array(tfs, pa.int64()),
        })

    from ..util import compact_blocks

    terms = compact_blocks(docs_ds.map_batches(explode,
                                               batch_format="pyarrow"))
    n_docs = num_docs if num_docs is not None else docs_ds.count()
    # one row per (doc, term) → groupby(term) count IS the document
    # frequency; joined back by a hash join keyed on term
    df = terms.groupby("term").count()
    parts = max(2, min(256, n_docs // 10_000 or 2))
    joined = terms.join(df, join_type="inner", num_partitions=parts,
                        on=("term",))

    def score(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.table({"doc_id": pa.array([], id_type),
                             "term": pa.array([], pa.string()),
                             "tfidf": pa.array([], pa.float64())})
        tf = t["tf"].to_pylist()
        dfs = t["count()"].to_pylist()
        s = [round(a * math.log(n_docs / b), 6) for a, b in zip(tf, dfs)]
        return pa.table({"doc_id": t["doc_id"], "term": t["term"],
                         "tfidf": pa.array(s, pa.float64())})

    def topk(g: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            g, k=min(k, g.num_rows),
            sort_keys=[("tfidf", "descending"), ("term", "ascending")])
        return g.take(idx)

    return (
        joined.map_batches(score, batch_format="pyarrow")
        .groupby("doc_id")
        .map_groups(topk, batch_format="pyarrow")
    )


def unigram_xent(docs_ds, total_tokens: int | None = None):
    """Per-document cross-entropy under the corpus's own unigram LM —
    the classic CCNet-style LM quality signal (Wenzek et al. 2020, with
    the n-gram LM reduced to its unigram term so the score is exactly
    SQL-mirrorable): xent = -(1/n) Σ_w tf_w · log2(cf_w / T), where
    cf_w is the corpus frequency of word w and T the corpus token
    count. Low = boilerplate-ish/common words, high = rare-word soup.

    Distributed shape: in-batch (doc, term, tf) explode (same kernel
    family as tfidf_topk), corpus frequencies as ONE groupby(term) sum
    joined back by term hash join, per-doc aggregation as ONE
    groupby(doc_id) — all relations stay Datasets; the only driver
    scalar is T."""
    import math
    from collections import Counter

    from ..util import compact_blocks

    id_type = docs_ds.schema().base_schema.field("doc_id").type

    def explode(b: pa.Table) -> pa.Table:
        ids, terms, tfs = [], [], []
        for d, text in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            for term, n in Counter((text or "").lower().split()).items():
                ids.append(d)
                terms.append(term)
                tfs.append(n)
        return pa.table({
            "doc_id": pa.array(ids, id_type),
            "term": pa.array(terms, pa.string()),
            "tf": pa.array(tfs, pa.int64()),
        })

    terms = compact_blocks(docs_ds.map_batches(explode,
                                               batch_format="pyarrow"))
    from ray.data.aggregate import Sum

    T = total_tokens if total_tokens is not None else \
        int(terms.sum("tf") or 0)
    cf = terms.groupby("term").aggregate(Sum("tf", alias_name="cf"))
    joined = terms.join(cf, join_type="inner", num_partitions=8,
                        on=("term",))

    def contrib(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.table({"doc_id": pa.array([], id_type),
                             "n": pa.array([], pa.int64()),
                             "bits": pa.array([], pa.float64())})
        tf = t["tf"].to_pylist()
        cfs = t["cf"].to_pylist()
        bits = [-a * math.log2(c / T) for a, c in zip(tf, cfs)]
        return pa.table({"doc_id": t["doc_id"],
                         "n": t["tf"],
                         "bits": pa.array(bits, pa.float64())})

    per_doc = (joined.map_batches(contrib, batch_format="pyarrow")
               .groupby("doc_id")
               .aggregate(Sum("n", alias_name="n_tokens"),
                          Sum("bits", alias_name="bits")))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.table({"doc_id": pa.array([], id_type),
                             "n_tokens": pa.array([], pa.int64()),
                             "xent": pa.array([], pa.float64())})
        n = t["n_tokens"].to_pylist()
        b = t["bits"].to_pylist()
        x = [round(bb / nn, 6) if nn else None for bb, nn in zip(b, n)]
        return pa.table({"doc_id": t["doc_id"], "n_tokens": t["n_tokens"],
                         "xent": pa.array(x, pa.float64())})

    return per_doc.map_batches(finish, batch_format="pyarrow")


def bigram_pmi(docs_ds, *, min_count: int = 5, top_k: int | None = None):
    """Corpus-level bigram collocation scoring by pointwise mutual
    information (Church & Hanks 1990) — the classic phrase-mining /
    tokenizer-merge signal (e.g. word2vec's phrase pass). PMI =
    log2(c_ab · N / (c_a · c_b)) over adjacent lowercase token pairs.

    Distributed shape: in-batch Counter explode to (w1, w2, c) partial
    rows, ONE groupby(w1, w2) sum for pair counts, unigram counts as
    ONE groupby(w) sum, two hash joins to attach c_a / c_b, vectorized
    PMI kernel. N (total bigrams) is the only driver scalar. Pairs
    below ``min_count`` are dropped (PMI is noise at tiny counts —
    standard practice), keeping the joined relation sparse."""
    import math
    from collections import Counter

    from ray.data.aggregate import Sum

    from ..util import compact_blocks

    def explode(b: pa.Table) -> pa.Table:
        w1s, w2s, cs = [], [], []
        for text in b["text"].to_pylist():
            ts = (text or "").lower().split()
            for (a, bb), n in Counter(zip(ts, ts[1:])).items():
                w1s.append(a)
                w2s.append(bb)
                cs.append(n)
        return pa.table({"w1": pa.array(w1s, pa.string()),
                         "w2": pa.array(w2s, pa.string()),
                         "c": pa.array(cs, pa.int64())})

    parts = compact_blocks(docs_ds.map_batches(explode,
                                               batch_format="pyarrow"))
    pairs = parts.groupby(["w1", "w2"]).aggregate(
        Sum("c", alias_name="c_ab"))
    N = int(parts.sum("c") or 0)

    def left_counts(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return t
        return pa.table({"w1": t["w1"].combine_chunks().cast(pa.string()),
                         "c": t["c"].combine_chunks()})

    uni_l = compact_blocks(parts.map_batches(left_counts,
                                             batch_format="pyarrow")) \
        .groupby("w1").aggregate(Sum("c", alias_name="c_a"))

    def right_counts(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return t
        return pa.table({"w2": t["w2"].combine_chunks().cast(pa.string()),
                         "c": t["c"].combine_chunks()})

    uni_r = compact_blocks(parts.map_batches(right_counts,
                                             batch_format="pyarrow")) \
        .groupby("w2").aggregate(Sum("c", alias_name="c_b"))

    kept = pairs.map_batches(
        lambda t: t.filter(pc.greater_equal(t["c_ab"], min_count))
        if t.num_columns else t,
        batch_format="pyarrow")
    kept = compact_blocks(kept)
    j1 = compact_blocks(kept.join(uni_l, join_type="inner",
                                  num_partitions=8, on=("w1",)))
    j2 = compact_blocks(j1.join(uni_r, join_type="inner",
                                num_partitions=8, on=("w2",)))

    def score(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "c_ab": pa.array([], pa.int64()),
                             "pmi": pa.array([], pa.float64())})
        cab = t["c_ab"].to_pylist()
        ca = t["c_a"].to_pylist()
        cb = t["c_b"].to_pylist()
        pmi = [round(math.log2(x * N / (a * b)), 6)
               for x, a, b in zip(cab, ca, cb)]
        return pa.table({
            "w1": t["w1"].combine_chunks().cast(pa.string()),
            "w2": t["w2"].combine_chunks().cast(pa.string()),
            "c_ab": t["c_ab"].combine_chunks().cast(pa.int64()),
            "pmi": pa.array(pmi, pa.float64()),
        })

    out = j2.map_batches(score, batch_format="pyarrow")
    if top_k is not None:
        out = out.sort(["pmi", "w1", "w2"],
                       descending=[True, False, False]).limit(top_k)
    return out
