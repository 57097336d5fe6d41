"""Z-order layout: curve correctness against a Python Morton
reference, and the actual data-skipping property — a 2-D box predicate
must touch far fewer files under the z-ordered layout than under a
1-D (time-sorted) layout of the same file count."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from svs_spark.operators import layout as LAY
from svs_spark.queries import load
from tests.conftest import SF_DIR_ORACLE


def morton2(x: int, y: int, bits: int = 16) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_matches_python_reference(spark):
    rows = [(x, y) for x in (0, 1, 5, 149, 65535) for y in (0, 2, 719, 40000)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn(
            "z", LAY.zorder_key(["x", "y"], bits=16)
        ).collect()
    }
    for (x, y), z in got.items():
        assert z == morton2(x, y), (x, y)


def test_zorder_key_is_monotone_in_box_containment(spark):
    # a z-range [z(x0,y0), z(x1,y1)] for an aligned box contains only
    # points whose coords lie in the box's power-of-two envelope —
    # spot-check the envelope property that makes min-max stats usable
    assert morton2(3, 3) < morton2(4, 0) < morton2(7, 7)
    assert morton2(0, 0) == 0
    assert morton2(65535, 65535) == (1 << 32) - 1


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("layout")
    # sf0.01: 150 users x 720 hour buckets — enough 2-D spread
    ev = load(spark, SF_DIR_ORACLE, "events").select(
        "user_id", F.expr("ts div 1000 div 3600000000").alias("b"), "value"
    )
    mnb = ev.agg(F.min("b")).collect()[0][0]
    norm = ev.select(
        "user_id", (F.col("b") - F.lit(mnb)).alias("y"), "value"
    )
    zdir, tdir = str(base / "z"), str(base / "t")
    # normalize the wider dimension onto the narrower one's extent
    # before interleaving (the rank step of OPTIMIZE ZORDER): raw
    # interleave of a 150-wide x 720-wide space wastes the y's high
    # bits and produces full-width boxes at quadrant boundaries
    LAY.write_zordered(
        norm, zdir,
        [F.col("user_id"), F.expr("y * 149 div 719")],
        n_files=32,
    )
    # 1-D control: same file count, clustered by time only
    (
        norm.repartitionByRange(32, "y")
        .sortWithinPartitions("y")
        .write.mode("overwrite")
        .parquet(tdir)
    )
    return zdir, tdir


def test_zorder_touches_fewer_files_for_2d_box(spark, layouts):
    zdir, tdir = layouts
    box = (
        (F.col("user_id") >= 40)
        & (F.col("user_id") <= 47)
        & (F.col("y") >= 100)
        & (F.col("y") <= 163)
    )
    zq = spark.read.parquet(zdir).filter(box)
    tq = spark.read.parquet(tdir).filter(box)
    assert zq.count() == tq.count() > 0, "both layouts hold the same rows"
    zf, tf = LAY.files_touched(zq), LAY.files_touched(tq)
    # time-sorted files each span ALL users: every file overlapping the
    # time range matches; z-ordered files are boxes, so only the few
    # covering the user range do
    assert zf < tf, (zf, tf)
    assert zf <= tf // 2, f"expected >=2x locality win, got {zf} vs {tf}"


def hilbert_ref(x: int, y: int, bits: int) -> int:
    """Classic top-down xy->d (the branch-y textbook form the
    branchless Column algebra must reproduce bit-for-bit)."""
    n = 1 << bits
    d = 0
    for i in range(bits - 1, -1, -1):
        rx = (x >> i) & 1
        ry = (y >> i) & 1
        d += ((3 * rx) ^ ry) << (2 * i)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
    return d


@pytest.fixture(scope="module")
def hilbert_grid(spark):
    """Full 32x32 grid pushed through the SPARK kernel (bits=5)."""
    rows = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, "x long, y long").select(
        F.col("x").alias("ox"), F.col("y").alias("oy"), "x", "y"
    )
    out = LAY.with_hilbert_key(df, bits=5)
    return {(r["ox"], r["oy"]): r["hkey"] for r in out.collect()}


def test_hilbert_key_matches_python_reference(hilbert_grid):
    for (x, y), d in hilbert_grid.items():
        assert d == hilbert_ref(x, y, 5), (x, y)


def test_hilbert_curve_bijective_and_adjacent(hilbert_grid):
    """The property Morton lacks: consecutive curve positions are
    ALWAYS Manhattan-adjacent cells, and the key is a bijection onto
    [0, 4^bits) — together these are what make a contiguous key range
    a tight connected region (better file boxes than z-order)."""
    inv = {d: xy for xy, d in hilbert_grid.items()}
    assert sorted(inv) == list(range(1024))
    for d in range(1023):
        (x0, y0), (x1, y1) = inv[d], inv[d + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1, d


def test_hilbert_sql_mirror_matches_kernel(spark, duck):
    """The oracle-side CTE chain IS the kernel, level for level."""
    ctes, final = LAY.hilbert_ctes(5, ["ox", "oy"])
    sql = f"""
    WITH norm AS (
      SELECT x AS ox, y AS oy, x, y FROM grid
    ),
    {ctes}
    SELECT ox, oy, d FROM {final}
    """
    duck.execute(
        "CREATE OR REPLACE TABLE grid AS "
        "SELECT x, y FROM range(32) t1(x), range(32) t2(y)"
    )
    got = {(r[0], r[1]): r[2] for r in duck.execute(sql).fetchall()}
    for (x, y), d in got.items():
        assert d == hilbert_ref(x, y, 5), (x, y)


def test_hilbert_layout_touches_fewer_files_for_2d_box(
    spark, layouts, tmp_path
):
    """Same data-skipping experiment as the z-order gate, driven by
    the Hilbert key through the generic keyed-layout writer."""
    _, tdir = layouts
    ev = load(spark, SF_DIR_ORACLE, "events").select(
        "user_id", F.expr("ts div 1000 div 3600000000").alias("b"), "value"
    )
    mnb = ev.agg(F.min("b")).collect()[0][0]
    norm = ev.select(
        "user_id", (F.col("b") - F.lit(mnb)).alias("y"), "value"
    )
    # normalize both dims onto [0, 255] before the curve (rank step)
    hsrc = norm.select(
        "user_id",
        "y",
        "value",
        (F.col("user_id") * 255 / 149).cast("long").alias("x"),
        F.expr("y * 255 div 719").alias("ycurve"),
    ).withColumnRenamed("ycurve", "ynorm")
    keyed = LAY.with_hilbert_key(hsrc, x="x", y="ynorm", bits=8)
    hdir = str(tmp_path / "h")
    LAY.write_keyed_layout(keyed, hdir, "hkey", n_files=32)
    box = (
        (F.col("user_id") >= 40)
        & (F.col("user_id") <= 47)
        & (F.col("y") >= 100)
        & (F.col("y") <= 163)
    )
    hq = spark.read.parquet(hdir).filter(box)
    tq = spark.read.parquet(tdir).filter(box)
    assert hq.count() == tq.count() > 0
    hf, tf = LAY.files_touched(hq), LAY.files_touched(tq)
    assert hf <= tf // 2, f"expected >=2x locality win, got {hf} vs {tf}"


def test_zorder_files_bound_both_dimensions(spark, layouts):
    """Per-file min-max spans: the 1-D layout bounds only time (every
    file spans ALL users), while z-files bound BOTH dimensions. Note
    1-D slabs always achieve minimal per-file *area* on uniform data —
    z-order's win is never total area, it is that no single predicate
    dimension is unbounded."""
    zdir, tdir = layouts

    def avg_user_span(path: str) -> float:
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name())
            .agg((F.max("user_id") - F.min("user_id") + 1).alias("du"))
        )
        return per_file.agg(F.avg("du")).collect()[0][0]

    t_span = avg_user_span(tdir)
    z_span = avg_user_span(zdir)
    assert t_span >= 149, "1-D control must span all users per file"
    assert z_span <= t_span / 2, (z_span, t_span)
