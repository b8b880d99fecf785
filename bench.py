"""Benchmark harness.

Measures end-to-end pipeline throughput (parse -> enrich -> route -> assemble
-> aggregate, all sinks materialized via the noop writer) over a synthesized
transcripts table, at two parallelism levels on identical input:
``local[N_SMALL]`` vs ``local[N_BIG]`` (N and 4N cores — the sandbox stand-in
for the north rule's N vs 4N executors). Prints ONE JSON line:

  {"metric": ..., "value": <wall sec at local[BIG]>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...,
   "turns": ..., "turns_per_sec_local8": ..., "turns_per_sec_local32": ...,
   "scaling_efficiency": ...}

Scaling-measurement design: the input must be large enough that parallel
work dominates the fixed per-job driver/scheduling cost (~15 s across the 9
actions), exactly as a 100 TB run amortizes fixed costs on a real cluster —
hence the 20M-turn default (REPLICATE=200 over sf0.1). JIT/codegen warmup
runs on a small replica of the same shape so the measured runs pay no
first-compile cost but warmup stays cheap. The 8 sink writes are issued
from concurrent threads after the shared parse cache is materialized (the
standard multi-sink pattern: overlap job scheduling, keep the cluster full
through small-stage tails).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
(default 32), GCLP_BENCH_REPLICATE (default 200 -> ~20M turns at sf0.1),
GCLP_BENCH_SKIP_SCALING=1 to skip the local[8] pass (faster iteration).
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_SMALL = 8
WARMUP_REPLICATE = 2

SINKS = (
    "pause_events", "tool_calls", "dead_letter", "assembled",
    "conv_state", "bucket_turns", "bucket_pauses", "dur_histogram",
)


def _noop_write(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _materialize_transcripts(sf_dir: str, replicate: int, path: str) -> int:
    """Pre-generate a transcripts parquet once (shared by both sessions)."""
    from java9_gc_log_parser_spark.session import get_spark
    from java9_gc_log_parser_spark.sources.transcripts import synth_transcripts

    spark = get_spark(app_name="gclp-bench-datagen", master="local[32]")
    if not os.path.exists(path):
        df = synth_transcripts(spark, sf_dir, replicate=replicate).repartition(64)
        df.write.mode("overwrite").parquet(path)
    n = spark.read.parquet(path).count()
    spark.stop()
    return n


def run_pipeline_once(spark, transcripts_path: str) -> float:
    """Full pipeline, every sink + aggregate materialized. Returns wall sec.

    The parse cache is materialized by one action, then all sinks are
    written from concurrent threads (cache-hit fan-out).
    """
    from java9_gc_log_parser_spark.plans.pipeline import build

    transcripts = spark.read.parquet(transcripts_path)
    t0 = time.perf_counter()
    dfs = build(transcripts, persist=True)
    dfs["parsed"].count()
    with ThreadPoolExecutor(len(SINKS)) as ex:
        list(ex.map(lambda s: _noop_write(dfs[s]), SINKS))
    elapsed = time.perf_counter() - t0
    dfs["parsed"].unpersist()
    return elapsed


def _timed_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod

    out = {}
    for name, fn in entrymod.queries().items():
        t0 = time.perf_counter()
        _noop_write(fn(spark, sf_dir))
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_big = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    replicate = int(os.environ.get("GCLP_BENCH_REPLICATE", "200"))
    skip_scaling = os.environ.get("GCLP_BENCH_SKIP_SCALING") == "1"
    sf_tag = sf_dir.rstrip("/").split("/")[-1]
    tpath = f"/tmp/gclp_bench_transcripts_{sf_tag}_x{replicate}.parquet"
    wpath = f"/tmp/gclp_bench_transcripts_{sf_tag}_x{WARMUP_REPLICATE}.parquet"

    n_turns = _materialize_transcripts(sf_dir, replicate, tpath)
    _materialize_transcripts(sf_dir, WARMUP_REPLICATE, wpath)

    from java9_gc_log_parser_spark.session import get_spark

    results = {}
    for cores in ([n_big] if skip_scaling else [N_SMALL, n_big]):
        spark = get_spark(
            app_name=f"gclp-bench-{cores}",
            master=f"local[{cores}]",
            shuffle_partitions=max(cores, 32),
        )
        run_pipeline_once(spark, wpath)  # JIT/codegen warmup, small input
        results[cores] = run_pipeline_once(spark, tpath)
        if cores == n_big:
            queries = _timed_queries(spark, sf_dir)
        spark.stop()

    thr_big = n_turns / results[n_big]
    payload = {
        "metric": "end_to_end_pipeline_wall_sec",
        "value": round(results[n_big], 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_tag,
        "turns": n_turns,
        f"turns_per_sec_local{n_big}": round(thr_big, 1),
    }
    if not skip_scaling:
        thr_small = n_turns / results[N_SMALL]
        payload[f"turns_per_sec_local{N_SMALL}"] = round(thr_small, 1)
        payload["scaling_efficiency"] = round(
            (thr_big / thr_small) / (n_big / N_SMALL), 3
        )
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
