"""jena_ray — a Ray-Data-native knowledge-graph construction engine.

Built from scratch on ray.data.Dataset pipelines of ``map_batches`` over
zero-copy Arrow batches. Reproduces the RDF 1.1 data model and triple
semantics of Apache Jena (reference at /root/reference — see SURVEY.md for
the file:line parity map) with a fundamentally different execution model:

- parsing / canonicalization / serialization are stateless batch transforms
- entity linking is an actor-pool stage (alias dictionary loaded once/actor)
- exact dedup is a salted-hash shuffle; owl:sameAs closure is iterative
  groupby-min label propagation (distributed union-find)
- materialization is a partitioned Parquet triple table with per-partition
  lineage manifests for checkpoint/resume

Nothing here calls ``ray.init``; sessions are owned by bench.py / tests.
"""

__version__ = "0.1.0"
