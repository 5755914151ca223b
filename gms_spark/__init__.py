"""gms_spark — a from-scratch PySpark-native link-graph analytics engine.

Re-expresses the query semantics of spcl/gms (GraphMineSuite, PVLDB'21)
Spark-first: DataFrame/SQL plans optimized by Catalyst + AQE, with
vectorized Arrow/pandas UDFs only where built-in operators cannot express
the semantics (sorted-neighborhood set intersection, per-partition CSR
kernels). No RDDs, no per-row Python UDFs, no GraphX/graphframes.

Layout:
  session    — SparkSession builders tuned for the engine
  extract    — reference href/text extractor + Arrow-batched Spark wrapper
  synth      — deterministic Common-Crawl-style ``pages`` synthesis
  io         — TableIO (atomic parquet snapshots; Iceberg-shaped seam),
               edge-list readers (.el/.wel/.gr/.mtx/METIS)
  graph      — build (symmetrize/squish/degrees/adjacency/orderings/DAG),
               kernels: pagerank, components, labelprop, triangles,
               similarity, kclique, generators (uniform/R-MAT)
  runtime    — superstep loop w/ checkpoint + per-partition lineage + resume
  text       — dedup (exact / ngram-Jaccard / MinHash-LSH / SimHash),
               analysis (lang-id, quality, tokens, fingerprints)
  sim        — embedding similarity search (brute-force + LSH-bucketed)
  multimodal — opaque binary media columns + decode plumbing (stubbed codecs)
  streaming  — event-time windowed aggregation (batch + Structured Streaming)
"""

__version__ = "0.1.0"
