"""Structured Streaming twins of the batch operators."""

from __future__ import annotations

import os
import tempfile


def stage_single_file_dir(src: str, fname: str) -> str:
    """Spark's file streaming source requires a *directory*; the
    testdata ships single parquet files, so stage one into a stable
    temp dir via symlink (production landing zones are already
    directories/topics). Idempotent per source path; repairs a
    dangling symlink left by a deleted source."""
    if not os.path.isfile(src):
        return src
    stage = os.path.join(
        tempfile.gettempdir(), "svs_stream_" + src.replace("/", "_")
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, fname)
    if os.path.islink(link) and not os.path.exists(link):
        os.unlink(link)  # dangling: source was re-created elsewhere
    if not os.path.exists(link):
        try:
            os.symlink(src, link)
        except FileExistsError:
            pass  # concurrent stager won the race; target is identical
    return stage
