"""Import-path test: build a real svs-schema SQLite file (schema per
SURVEY.md §1.1, reference kb.py:66-113), import it, and run the full
KnowledgeBase surface against the result."""

from __future__ import annotations

import gzip
import json
import shutil
import sqlite3
import struct

import pytest

from svs_spark.kb import KnowledgeBase
from svs_spark.sources.svs_import import import_svs_sqlite


def _pack(vec):
    return struct.pack(f"<{len(vec)}f", *vec)


@pytest.fixture()
def svs_db(tmp_path):
    """A reference-layout SQLite KB with the FIXTURES.md F1/F2 rows."""
    path = tmp_path / "ref.db"
    con = sqlite3.connect(path)
    con.executescript(
        """
        CREATE TABLE keyval (id INTEGER PRIMARY KEY, key TEXT UNIQUE, val ANY);
        CREATE TABLE keyval_user (id INTEGER PRIMARY KEY, key TEXT UNIQUE, val ANY);
        CREATE TABLE embeddings (id INTEGER PRIMARY KEY, embedding BLOB NOT NULL);
        CREATE TABLE docs (
          id INTEGER PRIMARY KEY, parent_id INTEGER, level INTEGER,
          text TEXT, embedding INTEGER, meta TEXT);
        CREATE TABLE edges (
          id INTEGER PRIMARY KEY, a INTEGER, b INTEGER, r INTEGER,
          w REAL, d INTEGER);
        """
    )
    con.execute(
        "INSERT INTO keyval (key, val) VALUES ('schema_version', 1),"
        " ('created_datetime', '2024-01-01T00:00:00+00:00'),"
        " ('embedding_func_params', '{\"provider\": \"mock\"}')"
    )
    con.execute(
        "INSERT INTO keyval_user (key, val) VALUES ('answer', 42),"
        " ('reason', 'because')"
    )
    vecs = {1: [1.0, 0.0, 0.0], 2: [0.0, 1.0, 0.0], 3: [0.0, 0.0, 1.0]}
    for eid, v in vecs.items():
        con.execute(
            "INSERT INTO embeddings (id, embedding) VALUES (?, ?)",
            (eid, _pack(v)),
        )
    docs = [
        (1, None, 0, "first doc", 1, None),
        (2, 1, 1, "second doc", 2, None),
        (3, None, 0, "third doc", 3, json.dumps({"test": "stuff"})),
        (4, 2, 2, "forth doc", None, json.dumps({"test": 5})),
    ]
    con.executemany("INSERT INTO docs VALUES (?,?,?,?,?,?)", docs)
    con.execute("INSERT INTO edges VALUES (1, 1, 2, 3, 0.5, 0)")
    con.execute("INSERT INTO edges VALUES (2, 2, 3, 1, NULL, 1)")
    con.commit()
    con.close()
    return str(path)


def test_import_and_query(spark, svs_db, tmp_path):
    wh_path = str(tmp_path / "imported")
    import_svs_sqlite(spark, svs_db, wh_path)
    kb = KnowledgeBase(spark, wh_path)  # embedding config from stored params
    assert len(kb) == 4
    # FK-resolved vectors with tri-state projection
    assert kb.query_doc(1, include_embedding=True)["embedding"] == [1.0, 0.0, 0.0]
    assert kb.query_doc(4)["embedding"] is False
    assert kb.query_doc(3)["meta"] == {"test": "stuff"}
    # hierarchy
    assert [r["id"] for r in kb.query_children(1)] == [2]
    assert [r["id"] for r in kb.dfs_traversal()] == [1, 2, 4, 3]
    # edges
    assert kb.count_edges() == 2
    g = kb.build_networkx_graph()
    assert g.is_directed() and g.has_edge(1, 2) and g.has_edge(2, 1)
    # user KV with preserved types
    with kb.bulk_keyval_update() as kv:
        assert kv.get("answer") == 42 and kv.get("reason") == "because"
    # retrieval over imported vectors (mock func embeds query as [1,0,0])
    top = kb.retrieve("anything", 1)[0]
    assert top["doc"]["id"] == 1


def test_import_gz(spark, svs_db, tmp_path):
    gz = str(tmp_path / "ref.db.gz")
    with open(svs_db, "rb") as fin, gzip.open(gz, "wb") as fout:
        shutil.copyfileobj(fin, fout)
    wh_path = str(tmp_path / "imported_gz")
    import_svs_sqlite(spark, gz, wh_path)
    kb = KnowledgeBase(spark, wh_path)
    assert len(kb) == 4
