"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference ETL system (alexwoolford/neo4j-blue-green-arrow-etl).

Brand-new Spark-first design: DataFrame/SQL logical plans optimized by
Catalyst, Structured-Streaming-shaped orchestration, Arrow-batched Python
only where built-ins can't express the semantics.

Layout:
  session     SparkSession factory tuned for local[N] and cluster scale
  config      YAML config loader with ${ENV}/${ENV:default} interpolation
  fixtures    deterministic derived tables (graph + control-plane) shared
              by the Spark queries and the DuckDB oracles
  sources/    snapshot reader (positional property-graph contract),
              snapshot discovery
  operators/  relational query surface, dedup, similarity, text analysis,
              multimodal plumbing
  functions/  scalar helpers mirroring the reference's function surface
  plans/      deployment catalog + blue/green alias manager
  streaming/  continuous orchestrator (micro-batch loop + streaming file source)
  sinks/      graph sink interface (parquet default; Flight/Neo4j adapter stub)
"""

__version__ = "0.1.0"
