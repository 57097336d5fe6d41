from svs_spark.functions.vector import (
    dot,
    cosine,
    l2_norm,
    normalize,
    check_unit_norm,
    dot_literal,
)
from svs_spark.functions import text as text_functions

__all__ = [
    "dot",
    "cosine",
    "l2_norm",
    "normalize",
    "check_unit_norm",
    "dot_literal",
    "text_functions",
]
