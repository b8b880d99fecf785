"""PySpark-native log pipeline with the capabilities of chbatey/java9-gc-log-parser.

A from-scratch, DataFrame-first reimplementation (NOT a port) of the reference's
parse -> classify -> assemble -> aggregate dataflow, re-targeted onto multi-turn
conversation transcripts ``(conv_id, turn_idx, role, text, tool, ts)``.

Layout:
  functions/  -- line grammar (regex cascade) + vectorized parse stage
  sources/    -- transcripts synthesis (deterministic), dims, raw-log reader, storage
  operators/  -- route, assemble, enrich, aggregate + training-data ops
  plans/      -- end-to-end pipeline composition, checkpointed micro-batch runner
  streaming/  -- Structured Streaming variants (stateful assembler)
"""

__version__ = "0.1.0"
