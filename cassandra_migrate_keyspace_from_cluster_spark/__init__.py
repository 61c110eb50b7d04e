"""PySpark-native analytics engine with the capabilities of
``hochgi/cassandra-migrate-keyspace-from-cluster`` (a Cassandra
keyspace-to-keyspace migration tool), rebuilt Spark-first.

NOTE ON PROVENANCE: the reference checkout at ``/root/reference`` is an
empty tree (see SURVEY.md §0), so no code could be, or was, ported from
it. The capability surface implemented here is the declared inventory in
SURVEY.md §2: the reconstructed migration surface (Part A) plus the
relational / window / scalar / streaming-semantics / LLM-pipeline /
UDF operator families (Parts B-G).

Layout:
    session.py    SparkSession builder (UTC, AQE, Arrow)
    registry.py   query registry consumed by __spark_entry__.py
    sources/      parquet "keyspace" access + Cassandra connector design
    operators/    custom composites (as-of join, sessionize, dedup, ANN)
    functions/    reusable column expressions (vector math, hashing, text)
    plans/        plan-inspection helpers (pushdown / broadcast asserts)
    streaming/    Structured Streaming twins of the batch event queries
    queries/      the declared SURVEY §2 inventory, one module per part
"""

__version__ = "0.1.0"
