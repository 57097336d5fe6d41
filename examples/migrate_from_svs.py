"""Migrate from the reference svs library: open a real svs SQLite KB
(.sqlite / .sqlite.gz, local path or http(s) URL), run the same queries
through the Spark engine, and export back to a reference-layout SQLite
file the original library can open.

Usage:
    python examples/migrate_from_svs.py /path/to/kb.sqlite[.gz]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys

from svs_spark import get_session
from svs_spark.kb import KnowledgeBase
from svs_spark.sources.svs_import import export_svs_sqlite, import_svs_sqlite


def main(sqlite_path_or_url: str) -> None:
    spark = get_session("migrate")

    # 1. one-time conversion: SQLite KB -> parquet warehouse
    import_svs_sqlite(spark, sqlite_path_or_url, "/tmp/migrated_kb")

    # 2. the full svs API now runs distributed (embedding params were
    #    persisted in the KB's _meta, exactly like the reference)
    kb = KnowledgeBase(spark, "/tmp/migrated_kb")
    print(f"docs: {len(kb)}  edges: {kb.count_edges()}")
    for rec in kb.dfs_traversal()[:5]:
        print(f"  level={rec['level']} id={rec['id']}: {rec['text'][:60]}")

    # 3. optional: hand the KB back to the reference library
    export_svs_sqlite(spark, "/tmp/migrated_kb", "/tmp/roundtrip.sqlite")
    print("exported reference-layout KB to /tmp/roundtrip.sqlite")

    kb.close()


if __name__ == "__main__":
    main(sys.argv[1])
