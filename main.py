"""spark-submit entrypoint.

Packaging (north rule: "packaged for spark-submit --py-files"):

    bash scripts/package.sh                      # builds dist/pipeline.zip
    spark-submit --py-files dist/pipeline.zip main.py \
        --input /path/transcripts.parquet --output /path/out \
        --mode checkpoint --n-batches 64

Modes:
  batch      one-shot pipeline, all sinks written once
  checkpoint resumable micro-batches with manifest/lineage/metrics (default);
             --prepare-source first rewrites the input partitioned by
             batch_bucket so every micro-batch is a pruned 1/n scan
  synth      generate a transcripts parquet from an events parquet dir
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="transcript log pipeline")
    p.add_argument("--mode", choices=["batch", "checkpoint", "synth"],
                   default="checkpoint")
    p.add_argument("--input", help="transcripts parquet path (batch/checkpoint)")
    p.add_argument("--output", required=True, help="output root dir")
    p.add_argument("--n-batches", type=int, default=16)
    p.add_argument("--prepare-source", action="store_true",
                   help="checkpoint mode: rewrite input bucketed by "
                        "batch_bucket under <output>/source first, then run "
                        "partition-pruned micro-batches from it")
    p.add_argument("--sf-dir", help="events parquet dir (synth mode)")
    p.add_argument("--replicate", type=int, default=1, help="synth scale-up")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from java9_gc_log_parser_spark.session import get_spark

    spark = get_spark(app_name=f"gclp-{args.mode}", master=args.master)

    if args.mode == "synth":
        from java9_gc_log_parser_spark.sources.transcripts import synth_transcripts

        df = synth_transcripts(spark, args.sf_dir, replicate=args.replicate)
        df.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"mode": "synth", "rows": spark.read.parquet(args.output).count()}))
        return

    if args.mode == "batch":
        from java9_gc_log_parser_spark.plans.pipeline import build

        dfs = build(spark.read.parquet(args.input))
        counts = {}
        for sink in ("pause_events", "tool_calls", "dead_letter", "assembled",
                     "conv_state"):
            dfs[sink].write.mode("overwrite").parquet(f"{args.output}/{sink}")
            counts[sink] = spark.read.parquet(f"{args.output}/{sink}").count()
        print(json.dumps({"mode": "batch", "sink_rows": counts}))
        return

    from java9_gc_log_parser_spark.plans import checkpoint as cp

    source = args.input
    if args.prepare_source:
        source = cp.prepare_source(
            spark, spark.read.parquet(args.input),
            f"{args.output}/source", args.n_batches,
        )
    results = cp.run(spark, source, args.output, n_batches=args.n_batches)
    print(json.dumps({
        "mode": "checkpoint",
        "batches_run": [r.batch_id for r in results],
        "rows_in": sum(r.rows_in for r in results),
        "manifest": f"{args.output}/manifest.jsonl",
    }))


if __name__ == "__main__":
    main()
