"""BPE merge learning (operators/tokenizer.py) — hand-computed contracts."""

from __future__ import annotations

import pytest

from java9_gc_log_parser_spark.operators.tokenizer import bpe_learn


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def test_bpe_first_merge_is_most_frequent_pair(spark):
    # "ab" pair appears in every word of both docs; 5 occurrences total
    docs = _docs(spark, ["abc abd", "abe abc abc"])
    merges = bpe_learn(spark, docs, n_merges=1).collect()
    assert len(merges) == 1
    m = merges[0]
    assert (m["left"], m["right"], m["merged"]) == ("a", "b", "ab")
    assert m["pair_count"] == 5
    assert m["step"] == 1


def test_bpe_second_merge_uses_first_merge_symbol(spark):
    # after (a,b)->ab, the dominant pair becomes (ab, c)
    docs = _docs(spark, ["abc abc abc abd"])
    merges = bpe_learn(spark, docs, n_merges=2).collect()
    assert [(m["left"], m["right"]) for m in merges] == [
        ("a", "b"),
        ("ab", "c"),
    ]
    assert merges[1]["pair_count"] == 3


def test_bpe_tie_break_is_pair_ascending(spark):
    # "xy" and "pq" each occur twice; lexicographically 'p q' < 'x y'
    docs = _docs(spark, ["xy pq", "xy pq"])
    merges = bpe_learn(spark, docs, n_merges=1).collect()
    assert (merges[0]["left"], merges[0]["right"]) == ("p", "q")
    assert merges[0]["pair_count"] == 2


def test_bpe_repeated_symbol_run_follows_double_replace_rule(spark):
    # 'aaaa' = a a a a: pair (a,a) counts 3 (adjacent positions)
    docs = _docs(spark, ["aaaa"])
    merges = bpe_learn(spark, docs, n_merges=2).collect()
    assert (merges[0]["left"], merges[0]["right"]) == ("a", "a")
    assert merges[0]["pair_count"] == 3
    # after the double replace 'a a a a' -> 'aa aa', next pair is (aa, aa)
    assert (merges[1]["left"], merges[1]["right"]) == ("aa", "aa")
    assert merges[1]["pair_count"] == 1


def test_bpe_stops_when_no_pairs_remain(spark):
    docs = _docs(spark, ["x y", "x"])  # single-char words only
    merges = bpe_learn(spark, docs, n_merges=5).collect()
    assert merges == []


def test_bpe_rejects_bad_n_merges(spark):
    with pytest.raises(ValueError):
        bpe_learn(spark, _docs(spark, ["ab"]), n_merges=0)


def test_bpe_encode_fertility_hand_computed(spark):
    from java9_gc_log_parser_spark.operators.tokenizer import (
        bpe_encode_fertility,
    )

    docs = spark.createDataFrame(
        [(1, "abc ab", "s1"), (2, "abc x", "s2")],
        ["doc_id", "text", "source"],
    )
    # merges (a,b) then (ab,c): abc -> 1 piece, ab -> 1 piece, x -> 1 piece
    rows = {
        r["source"]: r
        for r in bpe_encode_fertility(docs, [("a", "b"), ("ab", "c")]).collect()
    }
    assert rows["s1"]["n_words"] == 2
    assert rows["s1"]["n_pieces"] == 2  # 'abc'=1, 'ab'=1
    assert rows["s1"]["pieces_per_word"] == 1.0
    assert rows["s2"]["n_words"] == 2
    assert rows["s2"]["n_pieces"] == 2  # 'abc'=1, 'x'=1
    # no merges: every word splits to characters
    rows0 = {
        r["source"]: r for r in bpe_encode_fertility(docs, []).collect()
    }
    assert rows0["s1"]["n_pieces"] == 5  # 3 + 2 chars
    assert rows0["s2"]["n_pieces"] == 4  # 3 + 1 chars


def test_apply_merge_matches_python_double_replace_on_random_runs(spark):
    """Property check (seeded): the Spark double-replace merge rule equals
    the python double str.replace on adversarial symbol runs — including
    repeated-symbol runs and adjacent-occurrence chains."""
    import random

    from pyspark.sql import functions as F

    from java9_gc_log_parser_spark.operators.tokenizer import _apply_merge

    rng = random.Random(1787)
    syms = ["a", "b", "ab", "c"]
    cases = []
    for _ in range(300):
        seq = [rng.choice(syms) for _ in range(rng.randint(1, 12))]
        left, right = rng.choice(syms), rng.choice(syms)
        cases.append((" " + " ".join(seq) + " ", left, right))
    df = spark.createDataFrame(
        [(i, s, l, r) for i, (s, l, r) in enumerate(cases)],
        ["i", "s", "l", "r"],
    )
    got = {}
    for (l, r) in {(l, r) for _, l, r in cases}:
        sub = df.filter((F.col("l") == l) & (F.col("r") == r))
        for row in sub.select(
            "i", _apply_merge(F.col("s"), l, r).alias("m")
        ).collect():
            got[row["i"]] = row["m"]
    for i, (s, l, r) in enumerate(cases):
        pat, rep = f" {l} {r} ", f" {l}{r} "
        exp = s.replace(pat, rep).replace(pat, rep)
        assert got[i] == exp, (s, l, r)
