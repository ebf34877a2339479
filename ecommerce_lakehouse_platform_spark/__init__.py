"""ecommerce_lakehouse_platform_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference lakehouse workload (Parthiv7/ecommerce-lakehouse-platform):
medallion-style cleansing (typed projections, ID normalization,
keep-latest dedupe), gold aggregate models (product metrics, funnel,
session metrics, customer 360), parameterized dashboard queries, a
fail-fast data-quality gate — plus large-scale training-data-pipeline
operators (exact/fuzzy dedup, ANN similarity search, text analysis,
streaming sessionization, multimodal column plumbing).

Design rules (see SURVEY.md §4):
- DataFrame/SQL only; no RDDs; zero Python UDFs on the reference's hot
  path (everything stays in Catalyst / whole-stage codegen).
- Declarative plans: predicate pushdown, column pruning, partition
  pruning, broadcast joins and AQE do the physical work.
- Extensions that need Python use Arrow-batched pandas / mapInPandas,
  isolated in dedicated modules.
"""

__version__ = "0.1.0"
