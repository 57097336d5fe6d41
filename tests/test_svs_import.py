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


def test_roundtrip_export_import(spark, tmp_path):
    """warehouse → SQLite → warehouse preserves every record."""
    from svs_spark.functions.embeddings import make_mock_embeddings_func
    from svs_spark.sources.svs_import import export_svs_sqlite

    src_path = str(tmp_path / "src_kb")
    kb = KnowledgeBase(
        spark, src_path, embedding_func=make_mock_embeddings_func(),
        embedding_params={"provider": "mock"}, force_fresh_db=True,
    )
    with kb.bulk_add_docs() as add:
        a = add("first doc", meta={"x": 1})
        b = add("second doc", parent_id=a)
        add("third doc", no_embedding=True)
    kb.add_edge(a, b, 3, weight=0.5)
    with kb.bulk_keyval_update() as kv:
        kv.set("answer", 42)

    db = str(tmp_path / "export.db")
    export_svs_sqlite(spark, src_path, db)

    # reference-layout sanity: FK and uniqueness constraints exist
    con = sqlite3.connect(db)
    assert con.execute("SELECT count(*) FROM docs").fetchone()[0] == 3
    assert con.execute("SELECT count(*) FROM embeddings").fetchone()[0] == 2
    dup = con.execute("SELECT a, b, r FROM edges").fetchall()
    assert dup == [(1, 2, 3)]
    con.close()

    back = str(tmp_path / "back_kb")
    import_svs_sqlite(spark, db, back)
    kb2 = KnowledgeBase(spark, back)
    assert len(kb2) == 3
    assert kb2.query_doc(a, include_embedding=True)["embedding"] == [1.0, 0.0, 0.0]
    assert kb2.query_doc(3)["embedding"] is False
    assert kb2.query_doc(a)["meta"] == {"x": 1}
    assert kb2.count_edges() == 1
    with kb2.bulk_keyval_update() as kv:
        assert kv.get("answer") == 42


def test_numeric_looking_string_keyval_roundtrip(spark, tmp_path):
    """STRICT regression (ADVICE r1): without STRICT, `val ANY` gets
    NUMERIC affinity and SQLite silently coerces the STRING '123' to
    integer 123 on insert — the re-imported KB would change the value's
    type. The exported schema must preserve str/int/float/bytes exactly."""
    from svs_spark.functions.embeddings import make_mock_embeddings_func
    from svs_spark.sources.svs_import import (
        export_svs_sqlite, import_svs_sqlite,
    )

    src_path = str(tmp_path / "src_kb")
    kb = KnowledgeBase(
        spark, src_path, embedding_func=make_mock_embeddings_func(),
        embedding_params={"provider": "mock"}, force_fresh_db=True,
    )
    with kb.bulk_keyval_update() as kv:
        kv.set("numeric_string", "123")
        kv.set("float_string", "1.5")
        kv.set("true_int", 123)
        kv.set("true_float", 1.5)
        kv.set("bin", b"\x00123")

    db = str(tmp_path / "export.db")
    export_svs_sqlite(spark, src_path, db)

    con = sqlite3.connect(db)
    vals = dict(con.execute("SELECT key, val FROM keyval_user").fetchall())
    con.close()
    assert vals["numeric_string"] == "123" and isinstance(
        vals["numeric_string"], str
    )
    assert vals["float_string"] == "1.5" and isinstance(
        vals["float_string"], str
    )
    assert vals["true_int"] == 123 and isinstance(vals["true_int"], int)
    assert vals["true_float"] == 1.5 and isinstance(vals["true_float"], float)
    assert vals["bin"] == b"\x00123"

    back = str(tmp_path / "back_kb")
    import_svs_sqlite(spark, db, back)
    kb2 = KnowledgeBase(spark, back)
    with kb2.bulk_keyval_update() as kv:
        assert kv.get("numeric_string") == "123"
        assert isinstance(kv.get("numeric_string"), str)
        assert kv.get("true_int") == 123
        assert kv.get("true_float") == 1.5
        assert kv.get("bin") == b"\x00123"
