"""AsyncKnowledgeBase tour: the reference-AsyncKB-shaped surface over
the Spark engine — concurrent coroutines stage work while every Spark
job runs in a worker thread, so an asyncio service (FastAPI handler,
agent loop) can drive the KB without blocking its event loop.

Run: python examples/async_kb.py
"""

from __future__ import annotations

import asyncio
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from svs_spark.functions.embeddings import make_mock_embeddings_func
from svs_spark.kb_async import AsyncKnowledgeBase
from svs_spark.session import get_session


async def main() -> None:
    spark = get_session("async_kb_example")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="akb_")

    kb = AsyncKnowledgeBase(
        spark,
        root,
        embedding_func=make_mock_embeddings_func(),
        embedding_params={"provider": "mock"},
        force_fresh_db=True,
    )

    # concurrent staged adds inside one transactional bulk
    async with kb.bulk_add_docs() as adder:
        root_id = await adder.add_doc("animals overview")
        ids = await asyncio.gather(
            adder.add_doc("the spark flies", parent_id=root_id),
            adder.add_doc("the duck swims", parent_id=root_id),
            adder.add_doc("the goose honks", parent_id=root_id),
        )
    print("added docs:", [root_id, *ids])
    print("count:", await kb.count())

    async with kb.bulk_query_docs() as q:
        kids = await q.query_children(root_id)
        print("children:", [(d["id"], d["text"]) for d in kids])

    hits = await kb.retrieve("duck", 2)
    print("retrieve('duck'):", [
        (round(h["score"], 3), h["doc"]["text"]) for h in hits
    ])

    async with kb.bulk_graph_update() as g:
        await g.add_edge(ids[0], ids[1], root_id)
    print("edges:", await kb.count_edges())

    async with kb.bulk_keyval_update() as kv:
        await kv.set("build", 7)
        async for k, v in kv.items():
            print("kv:", k, v)

    await kb.close()
    spark.stop()


if __name__ == "__main__":
    asyncio.run(main())
