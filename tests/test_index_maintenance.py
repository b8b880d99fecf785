"""Crash/resume contract of the streaming IVF×PQ index maintenance
(q141's engine, `streaming/index_maintenance.py`).

The generation + atomic-pointer discipline is the same as q67/q51's, but
here it is exercised under a REAL injected failure: the first run dies
between micro-batches, the second resumes from the Structured Streaming
checkpoint, replayed batch ids are drained without re-applying, and the
final maintained index must equal the one-shot batch build — the ST3
resumability evidence (GcService.scala:35-38 has none; the north rule
requires it).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from java9_gc_log_parser_spark.operators.similarity import (
    ivfpq_encode,
    ivfpq_train,
)
from java9_gc_log_parser_spark.streaming import index_maintenance as im


@pytest.fixture(scope="module")
def trained(spark, sf_dir):
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = embs.filter(F.col("vec_id") % 3 != 2)
    cells, books = ivfpq_train(base)
    return embs, base, cells, books


def _index_rows(df):
    return sorted((r.vec_id, r.cell, r.s, r.code) for r in df.collect())


def test_crash_between_batches_then_resume(spark, sf_dir, trained, tmp_path):
    embs, base, cells, books = trained
    src = str(tmp_path / "src")
    out_root = str(tmp_path / "gens")
    embs.filter(F.col("vec_id") % 3 == 2).repartition(8).write.parquet(src)
    im.write_base_generation(base, cells, books, out_root)
    cells_rows, books_rows = cells.collect(), books.collect()

    # run 1: dies after ONE applied generation (injected between batches)
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="injected crash"):
        im.maintain_index(
            spark, src, embs.schema, out_root,
            cells_rows, cells.schema, books_rows, books.schema,
            max_files_per_trigger=2, fail_after=1,
        )
    after_crash = im.current_generation(out_root)
    assert after_crash == 0  # exactly one generation committed pre-crash

    # run 2: resume from the checkpoint; batch 0 is replayed and must be
    # DRAINED, not re-applied — then the backlog finishes
    im.maintain_index(
        spark, src, embs.schema, out_root,
        cells_rows, cells.schema, books_rows, books.schema,
        max_files_per_trigger=2,
    )
    final = im.current_generation(out_root)
    assert final is not None and final > after_crash

    idx = im.read_index(spark, out_root)
    # no vector appears twice (a re-applied replay would duplicate all of
    # batch 0's rows)
    assert (
        idx.groupBy("vec_id", "s").count().filter(F.col("count") > 1).count()
        == 0
    )
    # and the maintained index equals the one-shot batch build
    assert _index_rows(idx) == _index_rows(ivfpq_encode(embs, cells, books))


def test_replay_of_committed_batch_is_skipped(spark, sf_dir, trained,
                                              tmp_path):
    """Deleting the checkpoint (but not the store) forces EVERY batch to
    replay with fresh ids from 0: all of them collide with _CURRENT or
    rewrite identical content — the store must come out unchanged."""
    import shutil

    embs, base, cells, books = trained
    src = str(tmp_path / "src")
    out_root = str(tmp_path / "gens")
    embs.filter(F.col("vec_id") % 3 == 2).repartition(4).write.parquet(src)
    im.write_base_generation(base, cells, books, out_root)
    cells_rows, books_rows = cells.collect(), books.collect()
    args = (spark, src, embs.schema, out_root,
            cells_rows, cells.schema, books_rows, books.schema)
    im.maintain_index(*args, max_files_per_trigger=2)
    before = _index_rows(im.read_index(spark, out_root))
    shutil.rmtree(f"{out_root}/ckpt")  # lose the stream's own progress
    im.maintain_index(*args, max_files_per_trigger=2)
    after = _index_rows(im.read_index(spark, out_root))
    assert after == before


def test_encode_empty_batch_yields_empty_generation(spark, sf_dir, trained):
    """availableNow can hand foreachBatch an empty final micro-batch; the
    encode of zero vectors must be an empty frame with the index schema,
    not an error."""
    embs, base, cells, books = trained
    empty = embs.filter(F.lit(False))
    out = ivfpq_encode(empty, cells, books)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "vec_id", "cell", "s", "code",
    ]


def test_train_rejects_indivisible_dim(spark, sf_dir, trained):
    embs, base, _, _ = trained
    with pytest.raises(ValueError, match="not divisible"):
        ivfpq_train(base, m=5, dim=64)
    with pytest.raises(ValueError, match="not divisible"):
        ivfpq_encode(embs, None, None, m=7, dim=64)
