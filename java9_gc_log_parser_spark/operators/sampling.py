"""Deterministic corpus splitting / sampling for training pipelines.

A training-data pipeline needs train/val/test assignment that is (a) stable
across runs, re-shards, and engine versions — `rand()`-based splits change
membership whenever partitioning changes; (b) derivable from the record
itself so any system (Spark, DuckDB, a Python loader) reproduces it; and
(c) cheap at 10^12 rows — a map-only expression, no shuffle, no state.

The mechanism: bucket = the first 4 hex chars of md5(id || ":" || salt).
md5 of an identical string is identical everywhere, and comparing the
lowercase-hex *string* against precomputed hex boundaries avoids any
hex->int conversion portability trap (the oracle does the same string
comparison). 4 hex chars = 65,536 buckets, so requested fractions are
honored to ~1.5e-5. Salting the hash decouples this split from any other
md5-derived artifact (e.g. the q17 fingerprint) and lets a pipeline keep
several independent splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SPLITS = (("train", 0.8), ("val", 0.1), ("test", 0.1))


def split_boundaries(
    splits: tuple[tuple[str, float], ...] = DEFAULT_SPLITS,
) -> list[tuple[str, str]]:
    """[(name, exclusive upper hex bound), ...] with the last bound 'ffff'+.

    Cumulative fractions are mapped to floor(f * 65536) and rendered as
    4-char lowercase hex, the exact strings the oracle SQL compares against.
    """
    total = sum(f for _, f in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    out, acc = [], 0.0
    for name, frac in splits:
        acc += frac
        out.append((name, format(min(65536, int(acc * 65536)), "04x")))
    # make the last bucket inclusive of every hash value
    out[-1] = (out[-1][0], "g")  # 'g' > 'f' in ASCII: catches 'ffff'
    return out


def _bucket(id_col: Column, salt: str) -> Column:
    return F.substring(
        F.md5(F.concat(id_col.cast("string"), F.lit(":" + salt))), 1, 4
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "v1",
    splits: tuple[tuple[str, float], ...] = DEFAULT_SPLITS,
) -> DataFrame:
    """Append a deterministic ``split`` column (train/val/test by default).

    Pure map-side expression — no shuffle, survives repartitioning and
    re-ingestion unchanged, reproducible outside Spark from (id, salt).
    """
    b = _bucket(F.col(id_col), salt)
    expr = None
    for name, bound in split_boundaries(splits):
        cond = b < F.lit(bound)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    group_col: str = "source",
    n_per_group: int = 10,
    id_col: str = "doc_id",
    salt: str = "v1",
) -> DataFrame:
    """Deterministic exact-quota sample: the ``n_per_group`` records of each
    group with the smallest (hash bucket, id) — stable across runs and
    re-shards like :func:`hash_split`, but with an exact per-stratum count
    (corpus-mixing quotas need exact counts, not expected fractions).

    Implemented as a per-group top-N window: Spark's WindowGroupLimit
    pushes the rank filter below the sort, so each map task keeps only its
    local top-N per group before the shuffle — the shuffle carries
    O(groups x N x tasks), not the corpus.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        _bucket(F.col(id_col), salt), F.col(id_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_group)
        .drop("_rk")
    )


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "v1",
) -> DataFrame:
    """Deterministic ``fraction`` subsample by the same stable hash.

    Unlike ``DataFrame.sample`` the kept set is a pure function of
    (id, salt): stable across runs/partitionings, and nested samples with
    the same salt are subsets of each other (fraction 0.1 ⊂ fraction 0.2).
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    bound = "g" if fraction >= 1.0 else format(int(fraction * 65536), "04x")
    return df.filter(_bucket(F.col(id_col), salt) < F.lit(bound))
