"""Quickstart — the svs_spark twin of the reference's
examples/quickstart.py: open a knowledge base, retrieve, close.

Where the reference opens a remote SQLite file, a svs_spark KB is a
warehouse directory of parquet tables; a real svs .sqlite/.sqlite.gz
file (local path or http(s) URL) can be converted once with
``import_svs_sqlite`` and then opened here unchanged (see
migrate_from_svs.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from svs_spark import get_session
from svs_spark.kb import KnowledgeBase
from svs_spark.functions.embeddings import make_mock_embeddings_func


def demo() -> None:
    spark = get_session("quickstart")
    kb = KnowledgeBase(
        spark,
        "/tmp/quickstart_kb",
        embedding_func=make_mock_embeddings_func(),
        embedding_params={"provider": "mock"},
        force_fresh_db=True,
    )
    with kb.bulk_add_docs() as add:
        root = add("why did the chicken cross the road")
        add("to get to the other side", parent_id=root)
        add("a completely unrelated document", meta={"topic": "other"})

    for record in kb.retrieve("chicken", n=3):
        print(f" score={record['score']:.4f}: {record['doc']['text']}")

    kb.close()


if __name__ == "__main__":
    demo()
