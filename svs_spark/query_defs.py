"""Registered driver queries + DuckDB oracles.

Organized to mirror SURVEY.md §2: reference-parity operators first
(similarity V1-V4, doc-store Q1-Q6, graph G, KV/meta K), then the
beyond-reference LLM-pipeline + OLAP extension operators.

Every query follows the hash-match conventions in svs_spark.queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from svs_spark.queries import (
    fixed_query_vec,
    load,
    register,
    vec_sql_literal,
)
from svs_spark.operators import similarity as sim
from svs_spark.functions import vector as V

QVEC = fixed_query_vec(64)
QVEC_SQL = vec_sql_literal(QVEC)


# ---------------------------------------------------------------------------
# V1: retrieve — exact brute-force cosine top-k (kb.py:1608-1640)
# ---------------------------------------------------------------------------

@register(
    "retrieve_topk",
    oracle=f"""
    SELECT vec_id, round(list_dot_product(embedding::DOUBLE[], {QVEC_SQL}), 6) AS score
    FROM embeddings
    ORDER BY round(list_dot_product(embedding::DOUBLE[], {QVEC_SQL}), 6) DESC, vec_id DESC
    LIMIT 100
    """,
)
def q_retrieve_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    scored = emb.select(
        "vec_id", F.round(V.dot_literal("embedding", QVEC), 6).alias("score")
    )
    return scored.orderBy(F.desc("score"), F.desc("vec_id")).limit(100)


# ---------------------------------------------------------------------------
# V1 full: retrieve + join winners back to documents (kb.py:1630-1640)
# ---------------------------------------------------------------------------

@register(
    "retrieve_docs",
    oracle=f"""
    WITH winners AS (
      SELECT vec_id, round(list_dot_product(embedding::DOUBLE[], {QVEC_SQL}), 6) AS score
      FROM embeddings
      ORDER BY round(list_dot_product(embedding::DOUBLE[], {QVEC_SQL}), 6) DESC, vec_id DESC
      LIMIT 10
    )
    SELECT d.doc_id, d.text, d.lang, w.score
    FROM documents d JOIN winners w ON d.doc_id = w.vec_id
    """,
)
def q_retrieve_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    docs = load(spark, sf_dir, "documents")
    winners = (
        emb.select(
            "vec_id",
            F.round(V.dot_literal("embedding", QVEC), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.desc("vec_id"))
        .limit(10)
    )
    # winners is k rows — broadcast so the (100 TB) docs side never shuffles
    return docs.join(
        F.broadcast(winners), on=docs["doc_id"] == winners["vec_id"]
    ).select("doc_id", "text", "lang", "score")


# ---------------------------------------------------------------------------
# V2: all-pairs cosine top-k over strict upper triangle (kb.py:1642-1671)
# ---------------------------------------------------------------------------

@register(
    "pairwise_topk",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS score
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    ORDER BY score DESC, id_a DESC, id_b DESC
    LIMIT 50
    """,
)
def q_pairwise_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return sim.block_pairwise_topk(emb, 50, block_size=512)


# ---------------------------------------------------------------------------
# Doc store Q1/Q2: count + point lookup with has-embedding tri-state
# (kb.py:271-283, kb.py:416-473)
# ---------------------------------------------------------------------------

@register(
    "doc_count",
    oracle="SELECT count(*) AS n_docs FROM documents",
)
def q_doc_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "documents").agg(F.count("*").alias("n_docs"))


@register(
    "doc_point_lookup",
    oracle="""
    SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars,
           (e.vec_id IS NOT NULL) AS has_embedding
    FROM documents d LEFT JOIN embeddings e ON d.doc_id = e.vec_id
    WHERE d.doc_id IN (0, 42, 123, 456)
    """,
)
def q_doc_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings").select("vec_id")
    hit = docs.filter(F.col("doc_id").isin(0, 42, 123, 456))
    joined = hit.join(F.broadcast(emb), hit["doc_id"] == emb["vec_id"], "left")
    return joined.select(
        "doc_id", "text", "lang", "source", "n_chars",
        F.col("vec_id").isNotNull().alias("has_embedding"),
    )


# ---------------------------------------------------------------------------
# Doc hierarchy (Q3/Q4/Q6): the testdata documents table is flat, so a
# deterministic 3-level forest is derived from doc_id (same rule in both
# engines): roots are doc_id%100==0; mid level doc_id%10==0; else leaf.
# Parity targets: query_children (kb.py:475-491), query_level
# (kb.py:493-509), dfs_traversal (kb.py:1580-1593).
# ---------------------------------------------------------------------------

_HIER_SQL = """
      SELECT doc_id,
             CASE WHEN doc_id % 100 = 0 THEN NULL
                  WHEN doc_id % 10 = 0 THEN (doc_id // 100) * 100
                  ELSE (doc_id // 10) * 10 END AS parent_id,
             CASE WHEN doc_id % 100 = 0 THEN 0
                  WHEN doc_id % 10 = 0 THEN 1
                  ELSE 2 END AS level,
             text
      FROM documents
"""


def _hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    parent = (
        F.when(F.col("doc_id") % 100 == 0, F.lit(None).cast("long"))
        .when(F.col("doc_id") % 10 == 0, (F.col("doc_id") / 100).cast("long") * 100)
        .otherwise((F.col("doc_id") / 10).cast("long") * 10)
    )
    level = (
        F.when(F.col("doc_id") % 100 == 0, 0)
        .when(F.col("doc_id") % 10 == 0, 1)
        .otherwise(2)
    )
    return docs.select(
        "doc_id", parent.alias("parent_id"), level.alias("level"), "text"
    )


@register(
    "doc_children",
    oracle=f"""
    WITH h AS ({_HIER_SQL})
    SELECT doc_id, parent_id, level FROM h WHERE parent_id = 100
    """,
)
def q_doc_children(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _hierarchy(spark, sf_dir)
        .filter(F.col("parent_id") == 100)
        .select("doc_id", "parent_id", "level")
    )


@register(
    "doc_level",
    oracle=f"""
    WITH h AS ({_HIER_SQL})
    SELECT doc_id, parent_id, level FROM h WHERE level = 1
    """,
)
def q_doc_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _hierarchy(spark, sf_dir)
        .filter(F.col("level") == 1)
        .select("doc_id", "parent_id", "level")
    )


@register(
    "dfs_traversal",
    oracle=f"""
    WITH h AS ({_HIER_SQL}),
    p AS (
      SELECT doc_id, parent_id, level,
             CASE level
               WHEN 0 THEN lpad(doc_id::VARCHAR, 8, '0')
               WHEN 1 THEN lpad(parent_id::VARCHAR, 8, '0') || '/' || lpad(doc_id::VARCHAR, 8, '0')
               ELSE lpad(((doc_id // 100) * 100)::VARCHAR, 8, '0') || '/' ||
                    lpad(parent_id::VARCHAR, 8, '0') || '/' || lpad(doc_id::VARCHAR, 8, '0')
             END AS path
      FROM h
    )
    SELECT doc_id, parent_id, level,
           row_number() OVER (ORDER BY path) AS dfs_rank
    FROM p
    """,
)
def q_dfs_traversal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DFS order = lexicographic order of the zero-padded root→node path
    (roots ascending, then children ascending, depth-first) — parity with
    the reference's recursive generator (kb.py:1580-1593, golden order
    tests/test_kb.py:1117-1153). The rank is materialized so the driver's
    order-insensitive hash still verifies the DFS *order*.
    """
    h = _hierarchy(spark, sf_dir)
    pad = lambda c: F.lpad(c.cast("string"), 8, "0")  # noqa: E731
    path = (
        F.when(F.col("level") == 0, pad(F.col("doc_id")))
        .when(
            F.col("level") == 1,
            F.concat_ws("/", pad(F.col("parent_id")), pad(F.col("doc_id"))),
        )
        .otherwise(
            F.concat_ws(
                "/",
                pad((F.col("doc_id") / 100).cast("long") * 100),
                pad(F.col("parent_id")),
                pad(F.col("doc_id")),
            )
        )
    )
    w = Window.orderBy("path")
    return (
        h.select("doc_id", "parent_id", "level", path.alias("path"))
        .select(
            "doc_id", "parent_id", "level",
            F.row_number().over(w).alias("dfs_rank"),
        )
    )


# ---------------------------------------------------------------------------
# Q5: reverse FK lookup embedding→doc (kb.py:511-524)
# ---------------------------------------------------------------------------

@register(
    "reverse_emb_lookup",
    oracle="""
    SELECT e.vec_id, e.label, d.doc_id, d.source
    FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
    WHERE e.label = 3
    """,
)
def q_reverse_emb_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").filter(F.col("label") == 3)
    docs = load(spark, sf_dir, "documents")
    return emb.join(docs, emb["vec_id"] == docs["doc_id"]).select(
        "vec_id", "label", "doc_id", "source"
    )
