"""Driver contract for the jena_ray engine (Ray Data target).

The driver initialises Ray itself before importing this module: nothing
here (nor in jena_ray) calls ray.init()/ray.shutdown().

- entry(): flagship KG-construction pipeline at sf0.001 → canonical
  triple Dataset.
- queries(): one callable per implemented operator/pipeline from
  SURVEY.md §2 (sf_dir → Dataset/DataFrame/Table).
- oracle_sql(): DuckDB-equivalent SQL for every SQL-expressible query;
  KG pipelines (Turtle parsing, bnode hashing, entity linking, sameAs
  closure over parsed triples) are non-SQL-expressible and are instead
  validated by the analytic golden harness in tests/test_pipeline.py and
  the W3C conformance suites in tests/test_w3c.py.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from jena_ray.pipelines.kg import kg_triples

    return kg_triples("/root/testdata/sf0.001", linker_concurrency=2)


def _kg_queries() -> dict[str, Callable[[str], Any]]:
    """Rows-only checked pipelines (non-SQL-expressible)."""

    def kg_canonical_triples(sf_dir: str):
        from jena_ray.pipelines.kg import kg_triples

        return kg_triples(sf_dir, linker_concurrency=2)

    def kg_extract_raw(sf_dir: str):
        from jena_ray.sources.docs import interleaved_docs
        from jena_ray.stages.extract import extract_batch

        return interleaved_docs(sf_dir).map_batches(
            extract_batch, batch_format="pyarrow"
        )

    def kg_serialize_ntriples(sf_dir: str):
        import pyarrow as pa

        from jena_ray.pipelines.kg import kg_triples
        from jena_ray.rdf.ntriples import format_triple

        def fmt(b: pa.Table) -> pa.Table:
            cols = [b[c].to_pylist() for c in
                    ["s_kind", "s_lex", "p", "o_kind", "o_lex", "o_datatype", "o_lang", "g"]]
            lines = [format_triple(*t) for t in zip(*cols)]
            return pa.Table.from_arrays([pa.array(lines)], names=["line"])

        return kg_triples(sf_dir, linker_concurrency=2).map_batches(
            fmt, batch_format="pyarrow"
        )

    def docs_corpus(sf_dir: str):
        from jena_ray.sources.docs import interleaved_docs

        import pyarrow as pa

        def span_stats(b: pa.Table) -> pa.Table:
            spans = b["spans"].to_pylist()
            return pa.Table.from_arrays(
                [
                    b["doc_id"].combine_chunks(),
                    pa.array([len(s) for s in spans], pa.int64()),
                    pa.array(
                        [sum(1 for x in s if x["kind"] == "media") for s in spans],
                        pa.int64(),
                    ),
                ],
                names=["doc_id", "n_spans", "n_media"],
            )

        return interleaved_docs(sf_dir).map_batches(span_stats, batch_format="pyarrow")

    def _docs(sf_dir):
        import ray.data as rd

        return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def dedup_minhash_lsh(sf_dir: str):
        from jena_ray.ops.dedup_text import minhash_lsh_pairs

        return minhash_lsh_pairs(_docs(sf_dir), threshold=0.7)

    def dedup_simhash(sf_dir: str):
        from jena_ray.ops.dedup_text import simhash_pairs

        return simhash_pairs(_docs(sf_dir), max_hamming=3)

    def text_langid(sf_dir: str):
        from jena_ray.ops.textstats import LangId

        return _docs(sf_dir).map_batches(
            LangId, batch_format="pyarrow", concurrency=2
        )

    def text_fingerprint(sf_dir: str):
        from jena_ray.ops.textstats import fingerprint_batch

        return _docs(sf_dir).map_batches(fingerprint_batch, batch_format="pyarrow")

    def semdedup(sf_dir: str):
        # rows-only: the k-means quantizer is not SQL-expressible; the
        # planted-duplicate recall test is tests/test_ops.py
        import ray.data as rd

        from jena_ray.ops.similarity import semdedup as sd

        emb = rd.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        return sd(emb, n_clusters=16, threshold=0.95)

    def embedding_kmeans(sf_dir: str):
        # rows-only: distributed Lloyd refinement (per-batch partial
        # sums, k-row shuffle per round); blob-recovery test in
        # tests/test_ops.py
        import ray.data as rd

        from jena_ray.ops.similarity import kmeans_fit

        emb = rd.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        _cents, assign = kmeans_fit(emb, k=8, iters=3)
        return assign

    def embedding_near_dup_lsh(sf_dir: str):
        import ray.data as rd

        from jena_ray.ops.dedup_text import embedding_near_dup_lsh as nd_lsh

        emb = rd.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        return nd_lsh(emb, threshold=0.9)

    def approx_count_distinct(sf_dir: str):
        # HLL sketch vs exact on the same column (rows-only: the sketch
        # is approximate by design; the test bounds the error at 3 SE)
        import ray.data as rd

        from jena_ray.ops.sketches import approx_count_distinct as acd

        ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
        est = acd(ds, "o_custkey", p=12)
        exact = ds.unique("o_custkey")
        import pyarrow as pa

        return pa.table(
            {"estimate": pa.array([est], pa.float64()),
             "exact": pa.array([float(len(exact))], pa.float64()),
             "rel_err": pa.array([abs(est - len(exact)) / len(exact)],
                                  pa.float64())}
        )

    def bloom_filter_probe(sf_dir: str):
        # rows-only: Bloom membership is FP-approximate by design; the
        # test bounds the FP rate and asserts zero false negatives
        import ray.data as rd

        from jena_ray.ops.sketches import bloom_build, bloom_probe

        import pyarrow as pa
        import pyarrow.compute as pc

        docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

        def every_third(t: pa.Table) -> pa.Table:
            ids = t["doc_id"]
            return t.filter(pc.equal(
                pc.subtract(ids, pc.multiply(pc.divide(ids, 3), 3)), 0))

        third = docs.map_batches(every_third, batch_format="pyarrow")
        bits = bloom_build(third, "doc_id", m_bits=1 << 17, k=5)
        return bloom_probe(docs, "doc_id", bits, k=5)

    def countmin_heavy_hitters(sf_dir: str):
        # rows-only: Count-Min overcounts by design; the test bounds
        # the error at e·N/width
        import pyarrow as pa
        import ray.data as rd

        from jena_ray.ops.sketches import countmin_build, countmin_estimate

        ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["user_id"])
        sk = countmin_build(ev, "user_id", width=1 << 14)
        probes = [r["user_id"] for r in ev.limit(64).take_all()]
        est = countmin_estimate(sk, probes)
        return pa.table({
            "user_id": pa.array(probes, pa.int64()),
            "est_count": pa.array(est.tolist(), pa.int64()),
        })

    def ann_ivf(sf_dir: str):
        import ray.data as rd

        from jena_ray.ops.similarity import ivf_topk, query_vector

        emb = rd.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        return ivf_topk(emb, query_vector(sf_dir, 0), k=5,
                        n_centroids=16, nprobe=4)

    def ann_lsh(sf_dir: str):
        import ray.data as rd

        from jena_ray.ops.similarity import lsh_topk, query_vector

        emb = rd.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        return lsh_topk(emb, query_vector(sf_dir, 0), k=5)

    def media_caption_pairs(sf_dir: str):
        from jena_ray.ops.multimodal import media_caption_pairs as mcp
        from jena_ray.sources.docs import interleaved_docs

        return mcp(interleaved_docs(sf_dir))

    def media_dedup(sf_dir: str):
        from jena_ray.ops.multimodal import media_dedup as md
        from jena_ray.sources.docs import interleaved_docs

        return md(interleaved_docs(sf_dir))

    def media_features(sf_dir: str):
        from jena_ray.ops.multimodal import media_features as mf
        from jena_ray.sources.docs import interleaved_docs

        return mf(interleaved_docs(sf_dir), concurrency=2)

    def media_resize(sf_dir: str):
        from jena_ray.ops.multimodal import media_features as mf
        from jena_ray.ops.multimodal import media_resize as rz
        from jena_ray.sources.docs import interleaved_docs

        return rz(mf(interleaved_docs(sf_dir), concurrency=2),
                  max_w=128, max_h=96, concurrency=2)

    def media_frame_sample(sf_dir: str):
        from jena_ray.ops.multimodal import media_features as mf
        from jena_ray.ops.multimodal import media_frame_sample as fs
        from jena_ray.sources.docs import interleaved_docs

        return fs(mf(interleaved_docs(sf_dir), concurrency=2),
                  k=4, concurrency=2)

    def kg_skolemized(sf_dir: str):
        import pyarrow as pa
        import pyarrow.compute as pc

        from jena_ray.model import KIND_BNODE, KIND_IRI
        from jena_ray.pipelines.kg import kg_triples
        from jena_ray.rdf.bnodes import skolemize_iri

        def skolemize(b: pa.Table) -> pa.Table:
            def conv(kind_col, lex_col):
                kinds = kind_col.to_pylist()
                lex = lex_col.to_pylist()
                new_kind = [KIND_IRI if k == KIND_BNODE else k for k in kinds]
                new_lex = [
                    skolemize_iri(l) if k == KIND_BNODE else l
                    for k, l in zip(kinds, lex)
                ]
                return (
                    pa.array(new_kind, pa.int8()),
                    pa.array(new_lex, pa.large_string()),
                )

            s_kind, s_lex = conv(b["s_kind"], b["s_lex"])
            o_kind, o_lex = conv(b["o_kind"], b["o_lex"])
            b = b.set_column(0, "s_kind", s_kind).set_column(1, "s_lex", s_lex)
            return b.set_column(3, "o_kind", o_kind).set_column(4, "o_lex", o_lex)

        return kg_triples(sf_dir, linker_concurrency=2).map_batches(
            skolemize, batch_format="pyarrow"
        )

    def kg_rdfs_inference(sf_dir: str):
        from jena_ray.model import KIND_IRI, RDF_TYPE
        from jena_ray.pipelines.kg import kg_triples
        from jena_ray.stages.dedup import exact_dedup
        from jena_ray.stages.rdfs import RDFS_SUBCLASSOF, rdfs_inference

        # small demo T-box over the corpus's class namespace
        schema = [
            (KIND_IRI, f"http://example.org/c/{k}", RDFS_SUBCLASSOF,
             KIND_IRI, "http://example.org/c/root", "", "", "")
            for k in range(1, 20)
        ]
        return exact_dedup(
            rdfs_inference(kg_triples(sf_dir, linker_concurrency=2), schema)
        )

    def kg_text_query(sf_dir: str):
        from jena_ray.ops.textsearch import text_query
        from jena_ray.pipelines.kg import kg_triples
        from jena_ray.sources.docs import PRED

        return text_query(
            kg_triples(sf_dir, linker_concurrency=2),
            "Name 42", property_iri=PRED + "name", limit=10,
        )

    def kg_shacl_report(sf_dir: str):
        from jena_ray.pipelines.kg import kg_triples
        from jena_ray.stages.shacl import validate

        shapes = """
        @prefix sh: <http://www.w3.org/ns/shacl#> .
        <http://example.org/EntityShape> a sh:NodeShape ;
          sh:targetClass <http://example.org/c/1> ;
          sh:property [ sh:path <http://example.org/p/name> ; sh:minCount 1 ] .
        """
        return validate(kg_triples(sf_dir, linker_concurrency=2), shapes)

    def kg_shex_report(sf_dir: str):
        from jena_ray.pipelines.kg import kg_triples
        from jena_ray.stages.shex import validate_shex

        schema = """
        PREFIX ex: <http://example.org/p/>
        <http://example.org/EntityShape> {
          a IRI + ;
          ex:name LITERAL
        }
        """
        shape_map = "{FOCUS a <http://example.org/c/1>}@<http://example.org/EntityShape>"
        return validate_shex(
            kg_triples(sf_dir, linker_concurrency=2), schema, shape_map
        )

    def kg_apply_patch(sf_dir: str):
        from jena_ray.pipelines.kg import kg_triples
        from jena_ray.state.patch import apply_patch

        patch = (
            'A <http://example.org/patched/s> <http://example.org/p/added> "v" .\n'
            "D <http://example.org/shared/s0> <http://example.org/p/dup> \"0\" .\n"
        )
        return apply_patch(kg_triples(sf_dir, linker_concurrency=2), patch)

    def _hash_variants(sf_dir: str):
        # rows-only: DuckDB has no sha1/384/512 (digests pinned vs hashlib
        # in tests/test_queries.py instead)
        from jena_ray.pipelines.queries import q_hash_variants

        return q_hash_variants(sf_dir)

    def kg_sparql_construct(sf_dir: str):
        # SPARQL text front door over the KG triple table: CONSTRUCT the
        # inverse of every linkedTo edge
        from jena_ray.ops.sparql import sparql_construct
        from jena_ray.pipelines.kg import kg_triples

        q = """
        PREFIX ex: <http://example.org/p/>
        CONSTRUCT { ?o ex:linkedFrom ?s } WHERE { ?s ex:linkedTo ?o }
        """
        return sparql_construct(kg_triples(sf_dir, linker_concurrency=2), q)

    def kg_pagerank(sf_dir: str):
        from jena_ray.ops.graphalgo import entity_edges, pagerank
        from jena_ray.pipelines.kg import kg_triples

        return pagerank(
            entity_edges(kg_triples(sf_dir, linker_concurrency=2)),
            iterations=3, num_partitions=4,
        )

    def kg_kcore(sf_dir: str):
        # rows-only: iterative peeling (no SQL fixpoint); planted-graph
        # contract in tests/test_trix_graphalgo.py
        from jena_ray.ops.graphalgo import entity_edges, kcore
        from jena_ray.pipelines.kg import kg_triples

        return kcore(entity_edges(kg_triples(sf_dir, linker_concurrency=2)),
                     k=2)

    def kg_communities(sf_dir: str):
        # rows-only: deterministic label propagation
        from jena_ray.ops.graphalgo import entity_edges, label_propagation
        from jena_ray.pipelines.kg import kg_triples

        return label_propagation(
            entity_edges(kg_triples(sf_dir, linker_concurrency=2)),
            iterations=3)

    return {
        "kg_canonical_triples": kg_canonical_triples,
        "kg_pagerank": kg_pagerank,
        "kg_kcore": kg_kcore,
        "kg_communities": kg_communities,
        "kg_skolemized": kg_skolemized,
        "kg_rdfs_inference": kg_rdfs_inference,
        "kg_text_query": kg_text_query,
        "kg_shacl_report": kg_shacl_report,
        "kg_shex_report": kg_shex_report,
        "kg_sparql_construct": kg_sparql_construct,
        "kg_apply_patch": kg_apply_patch,
        "kg_extract_raw": kg_extract_raw,
        "kg_serialize_ntriples": kg_serialize_ntriples,
        "docs_corpus": docs_corpus,
        "dedup_minhash_lsh": dedup_minhash_lsh,
        "dedup_simhash": dedup_simhash,
        "text_langid": text_langid,
        "text_fingerprint": text_fingerprint,
        "ann_lsh": ann_lsh,
        "ann_ivf": ann_ivf,
        "approx_count_distinct": approx_count_distinct,
        "bloom_filter_probe": bloom_filter_probe,
        "countmin_heavy_hitters": countmin_heavy_hitters,
        "embedding_near_dup_lsh": embedding_near_dup_lsh,
        "semdedup": semdedup,
        "embedding_kmeans": embedding_kmeans,
        "media_features": media_features,
        "media_caption_pairs": media_caption_pairs,
        "media_dedup": media_dedup,
        "media_resize": media_resize,
        "media_frame_sample": media_frame_sample,
        "hash_variants": _hash_variants,
    }


def queries() -> dict[str, Callable[[str], Any]]:
    from jena_ray.pipelines.queries import REGISTRY

    out: dict[str, Callable[[str], Any]] = {
        name: fn for name, (fn, _sql) in REGISTRY.items()
    }
    out.update(_kg_queries())
    return out


def oracle_sql() -> dict[str, str]:
    from jena_ray.pipelines.queries import REGISTRY

    return {name: sql for name, (_fn, sql) in REGISTRY.items()}
