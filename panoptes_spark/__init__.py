"""panoptes_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of yahoo/panoptes (network-telemetry dataflow),
re-expressed Spark-first: DataFrame/SQL plans compiled by Catalyst, Structured
Streaming for the streaming half, Pandas UDFs only where built-ins can't
express the semantics.

Subpackages
-----------
- ``schemas``   wire-format StructTypes (resource / metrics group / enrichment)
- ``dsl``       the two declarative frontends: resource filter DSL and the
                generic metric-computation DSL compiler
- ``operators`` relational + telemetry operators (rate, reconcile, enrichment
                join, dedup, similarity, text analysis, ...)
- ``sources``   batch/stream source adapters (JSON resources, OID tables,
                Kafka — guarded)
- ``streaming`` stateful streaming twins of the batch operators
- ``functions`` scalar function library (net codecs, unit conversions,
                line-protocol escaping)
"""

__version__ = "0.1.0"
