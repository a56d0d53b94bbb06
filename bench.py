"""Benchmark runner.

Prints ONE JSON line:
  {"metric": "triples_per_hour", "value": N, "unit": "triples/hour",
   "queries": {name: sec, ...}, "sf": 0.1, "scaling": {...}}

- headline: flagship cascade extraction (pages parquet -> triples),
  reported as triples/hour;
- per-query wall times for a representative operator subset at
  $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
  local[$SPARK_GRAFT_CPUS];
- scaling: the same flagship job at local[8] vs local[32] on identical
  materialized input (the sandbox proxy for N vs 4N executors;
  BASELINE.json north_rule), sized to >=60s at 32 cores so fixed costs
  are <3%; efficiency = throughput(32) / (4 * throughput(8)), with a
  Spark-free busy-loop probe bracketing each level to separate engine
  overhead from shared-host throttling.

Run modes:
  python bench.py                  # full bench + scaling, one JSON line
  python bench.py --flagship 8     # internal: flagship only at local[8]
  python bench.py --no-scaling     # skip the two-parallelism runs
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_TMP = Path(os.environ.get("DEEPIE_BENCH_TMP", "/tmp/deepie_bench"))

BENCH_QUERIES = [
    "minhash", "minhash_fast", "lsh_pairs_fast", "simhash", "token_counts",
    "quality", "lang_id", "doc_fingerprint", "pricing_summary",
    "revenue_by_nation", "top_orders_per_customer", "event_sessions",
    "connected_components", "etl_stl_triples", "mentions_trie",
]


def _sf_of(sf_dir: str) -> float:
    try:
        return float(Path(sf_dir).name.replace("sf", ""))
    except ValueError:
        return -1.0


def _pages_parquet(spark, sf_dir: str, replicate: int = 1) -> str:
    """Deterministic pages input, materialized once per sf as parquet
    (so the timed job scans parquet like production, not a python
    generator).  ``replicate`` tiles the corpus with distinct urls —
    used by the scaling runs to make the job large enough that task
    overhead is amortized (strong-scaling measurement)."""
    import __spark_entry__ as em
    from pyspark.sql import functions as F

    n = em._pages_count(sf_dir)
    out = BENCH_TMP / f"pages_n{n}_x{replicate}"
    if not (out / "_SUCCESS").exists():
        from deepie_spark.sources.synth import corpus_dataframes

        pages_df, _, _ = corpus_dataframes(spark, n)
        if replicate > 1:
            copies = spark.range(replicate).select(
                F.col("id").alias("_copy")
            )
            pages_df = pages_df.crossJoin(copies).withColumn(
                "url", F.concat_ws("#", "url", "_copy")
            ).drop("_copy")
        parts = 32 if replicate == 1 else 128
        pages_df.repartition(parts).write.mode("overwrite").parquet(str(out))
    return str(out)


def _make_spark(cpus: int):
    from deepie_spark.session import get_spark

    return get_spark(
        app_name=f"deepie_bench_{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )


def run_flagship(spark, sf_dir: str, replicate: int = 1) -> tuple[float, int]:
    """Returns (seconds, n_triples) for pages parquet -> triples."""
    from deepie_spark.config.schema import SYNTH_SCHEMA
    from deepie_spark.operators.extract import PageExtractor, extract_triples_fused
    from deepie_spark.sources.synth import gen_world

    path = _pages_parquet(spark, sf_dir, replicate)
    world = gen_world()
    bc = spark.sparkContext.broadcast(
        PageExtractor(SYNTH_SCHEMA, world.alias_rows)
    )
    pages = spark.read.parquet(path)
    # warm python workers + broadcast before timing (cold-start JVM/
    # worker spin-up is a fixed cost, not throughput); the sample keeps
    # every partition non-empty so ALL workers start now
    extract_triples_fused(pages.sample(False, 0.02, seed=1), bc).count()
    t0 = time.time()
    n = extract_triples_fused(pages, bc).count()
    return time.time() - t0, n


# sized so the 32-core flagship run lasts >=60s: long enough that
# python-worker spin-up and stage scheduling are noise (<3%), i.e. the
# measured number is engine throughput, not fixed cost
SCALING_REPLICATE = int(os.environ.get("DEEPIE_SCALING_REPLICATE", "384"))
SCALING_LEVELS = (8, 32)  # the north rule's N -> 4N pair


def _probe_at(n: int, secs: float = 2.0) -> float:
    """Busy-loop throughput (Mcounts) of THIS host at concurrency n,
    measured with plain multiprocessing (no Spark): the upper bound any
    engine can reach right now.  Run adjacent to each timed level so
    engine scaling can be separated from shared-host throttling."""
    import multiprocessing as mp

    def burn(q):
        t0 = time.time()
        c = 0
        while time.time() - t0 < secs:
            for _ in range(10000):
                c += 1
        q.put(c)

    q = mp.Queue()
    ps = [mp.Process(target=burn, args=(q,)) for _ in range(n)]
    [p.start() for p in ps]
    total = sum(q.get() for _ in ps)
    [p.join() for p in ps]
    return round(total / 1e6 / secs, 1)


def flagship_only(cpus: int) -> None:
    """Best-of-3 timed runs: the sandbox host is shared and noisy
    (probe-measured throughput varies ~3x between moments); the minimum
    is the least-contended estimate of engine throughput.  The host
    probe brackets the trials (max of before/after = the least-throttled
    view of what the host allowed at this concurrency).

    CPU affinity pins this process tree (JVM task threads, GC, python
    workers, the probe) to exactly ``cpus`` cores: local[8] on an
    otherwise-idle 32-core box would silently use extra cores for JVM
    scan/GC threads while 8 python workers burn 8 more — a fake
    16-core "8-core" run that inflates the small-N baseline and makes
    N->4N efficiency unmeasurable.  A real 8-executor cluster has 8
    cores TOTAL; the pin reproduces that."""
    try:
        os.sched_setaffinity(0, set(range(cpus)))
    except (AttributeError, OSError):
        pass  # non-linux: fall back to unpinned
    probe0 = _probe_at(cpus)
    spark = _make_spark(cpus)
    best, n, trials = None, 0, []
    for _ in range(3):
        sec, n = run_flagship(spark, SF_DIR, replicate=SCALING_REPLICATE)
        trials.append(round(sec, 2))
        best = sec if best is None else min(best, sec)
    spark.stop()
    probe1 = _probe_at(cpus)
    print(json.dumps({
        "cpus": cpus, "sec": best, "trials": trials, "triples": n,
        "probe_mcounts": max(probe0, probe1),
    }))


def main() -> None:
    import __spark_entry__ as em

    spark = _make_spark(CPUS)
    sf = _sf_of(SF_DIR)

    queries: dict[str, float] = {}
    fsec, n_triples = run_flagship(spark, SF_DIR)
    queries["flagship_triples"] = round(fsec, 3)
    tph = n_triples / fsec * 3600.0
    if "--no-scaling" not in sys.argv:
        # materialize the replicated scaling corpus at full parallelism
        # so neither timed subprocess pays the one-time write
        _pages_parquet(spark, SF_DIR, SCALING_REPLICATE)

    print(f"flagship: {fsec:.1f}s", file=sys.stderr, flush=True)
    qmap = em.queries()
    for name in BENCH_QUERIES:
        t0 = time.time()
        qmap[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        queries[name] = round(time.time() - t0, 3)
        print(f"{name}: {queries[name]}s", file=sys.stderr, flush=True)
    spark.stop()

    result = {
        "metric": "triples_per_hour",
        "value": round(tph),
        "unit": "triples/hour",
        "queries": queries,
        "sf": sf,
        "n_triples": n_triples,
        "flagship_sec": round(fsec, 3),
    }

    if "--no-scaling" not in sys.argv:
        # the north rule's N vs 4N evidence: the SAME job on the SAME
        # materialized input at local[8] vs local[32], each best-of-3
        # with the job sized to >=60s at 32 cores (fixed costs <3%)
        scal = {}
        for c in SCALING_LEVELS:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--flagship", str(c)],
                capture_output=True, text=True, timeout=1800,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
            scal[c] = json.loads(line)
        lo, hi = SCALING_LEVELS
        thr = {c: scal[c]["triples"] / scal[c]["sec"] for c in scal}
        eff = thr[hi] / (hi // lo) / thr[lo]
        probe = {str(c): scal[c]["probe_mcounts"] for c in scal}
        probe_eff = (
            scal[hi]["probe_mcounts"] / (hi // lo) / scal[lo]["probe_mcounts"]
        )
        result["scaling"] = {
            "job": f"flagship extraction, {scal[hi]['triples']} triples "
                   f"({SCALING_REPLICATE}x replicated corpus, same input "
                   f"both levels)",
            "sec": {c: round(scal[c]["sec"], 2) for c in scal},
            "trials": {c: scal[c]["trials"] for c in scal},
            "triples_per_sec": {c: round(thr[c], 1) for c in thr},
            f"efficiency_{lo}_to_{hi}": round(eff, 3),
            # busy-loop probes bracketing each timed level: what the
            # shared host itself allowed at that concurrency
            "host_cpu_probe": {
                **probe,
                f"probe_efficiency_{lo}_to_{hi}": round(probe_eff, 3),
            },
        }
        # engine efficiency / probe efficiency isolates engine overhead
        # from noisy-neighbor throttling (the probe is Spark-free)
        if probe_eff > 0:
            result["scaling"][f"efficiency_{lo}_to_{hi}_host_normalized"] = round(
                min(eff / probe_eff, 1.0), 3
            )

    print(json.dumps(result))


if __name__ == "__main__":
    if "--flagship" in sys.argv:
        flagship_only(int(sys.argv[sys.argv.index("--flagship") + 1]))
    else:
        main()
