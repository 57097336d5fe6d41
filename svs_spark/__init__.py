"""svs_spark — a PySpark-native analytics engine with the query surface of
Rhobota/svs (vector store: top-k dense retrieval, pairwise similarity,
hierarchical documents, property graph, key/value store) extended with
LLM-data-pipeline operators (dedup, similarity join, text analysis,
multimodal plumbing) designed for 100 TB scale.

Everything is expressed Spark-first: DataFrame/SQL plans that Catalyst can
optimize (predicate pushdown, column pruning, broadcast joins, AQE), with
Arrow-batched pandas UDFs only where built-ins cannot express the kernel.

Reference parity citations use ``/root/reference`` file:line in docstrings.
"""

from svs_spark.session import get_session, configure_builder
from svs_spark.kb import KnowledgeBase

__version__ = "0.1.0"

__all__ = ["get_session", "configure_builder", "KnowledgeBase", "__version__"]
