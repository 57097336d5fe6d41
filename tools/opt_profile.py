"""Per-query time breakdown for the optimization rounds: split each
registered query's wall time into DataFrame construction (Python),
analysis+optimization+physical planning (Catalyst, driver-side), and
execution (noop sink — guide §1.4), plus the bench's collect() form.

Usage: python tools/opt_profile.py [query ...]   (default: bench HEADLINE)
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)

Prints one JSON line per query:
  {"q": name, "build": s, "plan": s, "exec_noop": s, "collect": s}
each the best of 2 runs after one warm-up, mirroring bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from svs_spark.session import get_session

    total_bytes = sum(
        os.path.getsize(os.path.join(sf_dir, f))
        for f in os.listdir(sf_dir)
        if f.endswith(".parquet")
    )
    shuffle_parts = max(8, min(1024, total_bytes // (64 * 1024 * 1024)))
    spark = get_session(
        "svs_opt_profile",
        shuffle_partitions=int(shuffle_parts),
        extra_conf={
            "spark.driver.extraJavaOptions":
            "-Xlog:disable -XX:CICompilerCount=4"
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    from svs_spark.queries import queries

    registry = queries()
    names = sys.argv[1:]
    if not names:
        import bench

        names = [n for n in bench.HEADLINE if n in registry]

    from pyspark import StorageLevel

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb.persist(StorageLevel.MEMORY_AND_DISK).count()

    out = []
    for n in names:
        try:
            registry[n](spark, sf_dir).count()  # warm-up (plan + JIT)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"q": n, "err": str(e)[:200]}))
            continue
        best = {"build": 9e9, "plan": 9e9, "exec_noop": 9e9, "collect": 9e9}
        for _ in range(2):
            spark.sparkContext.setJobDescription(f"profile:{n}")
            t0 = time.perf_counter()
            df = registry[n](spark, sf_dir)
            t1 = time.perf_counter()
            # force full analysis + optimization + physical planning
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            best["build"] = min(best["build"], t1 - t0)
            best["plan"] = min(best["plan"], t2 - t1)
            best["exec_noop"] = min(best["exec_noop"], t3 - t2)
            # the bench's timed action, for comparability
            t4 = time.perf_counter()
            df2 = registry[n](spark, sf_dir)
            rows = df2.collect()
            assert rows is not None
            best["collect"] = min(best["collect"], time.perf_counter() - t4)
        rec = {"q": n}
        rec.update({k: round(v, 4) for k, v in best.items()})
        out.append(rec)
        print(json.dumps(rec), flush=True)

    from svs_spark.queries import release_caches

    release_caches()
    tot = {
        k: round(sum(r[k] for r in out), 2)
        for k in ("build", "plan", "exec_noop", "collect")
    }
    print(json.dumps({"q": "_TOTAL", **tot, "n": len(out)}))
    spark.stop()


if __name__ == "__main__":
    main()
