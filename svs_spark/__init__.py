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

def _register_pickle_by_value() -> None:
    """Ship svs_spark code inside task closures (pickle-by-value).

    Executor Python workers don't necessarily have this repo on their
    PYTHONPATH (the driver may sys.path-hack it in from any cwd), and
    cloudpickle serializes module-level functions by reference by
    default. Registering the package makes every mapInPandas/UDF closure
    self-contained, so tasks run anywhere without deploying the package.
    """
    import pkgutil
    import importlib

    from pyspark import cloudpickle

    pkg = importlib.import_module("svs_spark")
    cloudpickle.register_pickle_by_value(pkg)
    for info in pkgutil.walk_packages(pkg.__path__, prefix="svs_spark."):
        try:
            cloudpickle.register_pickle_by_value(
                importlib.import_module(info.name)
            )
        except ImportError:  # pragma: no cover - optional deps
            pass


from svs_spark.session import get_session, configure_builder
from svs_spark.kb import KnowledgeBase

_register_pickle_by_value()

__version__ = "0.1.0"

__all__ = ["get_session", "configure_builder", "KnowledgeBase", "__version__"]
