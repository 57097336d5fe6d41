"""Operator library. Import the modules directly for the full surface:

- similarity: retrieve_topk, retrieve_docs, pairwise_topk,
  block_pairwise_topk, knn_join_batch, with_scores(_batch)
- dedup: minhash_lsh_pairs, simhash_pairs, embedding_near_dup_pairs,
  connected_components
- ann: knn_join, lsh_topk, ivf_topk, hyperplane_bucket
- index_build: build_lsh_index, search_lsh_index
- temporal: asof_join_backward
- skew: salted_agg, salted_join, top_frequent_keys
- multimodal: extract_features, frame_sample, with_media_metadata
"""

from svs_spark.operators.similarity import (  # noqa: F401
    block_pairwise_topk,
    knn_join_batch,
    pairwise_topk,
    retrieve_docs,
    retrieve_topk,
)
from svs_spark.operators.dedup import (  # noqa: F401
    connected_components,
    embedding_near_dup_pairs,
    minhash_lsh_pairs,
    simhash_pairs,
)
from svs_spark.operators.ann import ivf_topk, knn_join, lsh_topk  # noqa: F401
from svs_spark.operators.temporal import asof_join_backward  # noqa: F401
from svs_spark.operators.skew import (  # noqa: F401
    salted_agg,
    salted_join,
    top_frequent_keys,
)
