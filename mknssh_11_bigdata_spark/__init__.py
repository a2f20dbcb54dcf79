"""mknssh_11_bigdata_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference repo MykhailoMamchur/MKNSSH-11-BIGDATA
(an IMDb movie-success analytics pipeline), extended with the operators a
large-scale LLM training-data pipeline needs (dedup, similarity search,
multimodal columns, text analysis).

Design stance (SURVEY.md §7): a library-style engine over PySpark
DataFrames — every operator is a pure ``DataFrame -> DataFrame`` (or
``Column -> Column``) function so Catalyst sees one fused, optimizable
plan. Zero row-level Python UDFs in the relational core; Arrow-batched
``pandas_udf`` / ``mapInPandas`` only where built-ins genuinely cannot
express the semantics (multimodal decode).
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
