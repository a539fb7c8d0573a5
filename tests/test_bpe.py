"""BPE training rounds (operators/bpe.py): the Catalyst fold merge
must implement greedy leftmost non-overlapping pair replacement, and
the full multi-round program must reproduce a plain-Python reference
BPE trainer on the driver corpus."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from flink_s3_read_write_spark.operators import bpe as B
from tests.conftest import SF0001


def py_greedy_merge(syms: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


# Adversarial shapes: overlapping runs (odd/even lengths), merges at
# both ends, no-ops, identical left/right symbols, single symbols.
MERGE_CASES = [
    ("aaaa", "a", "a"),
    ("aaa", "a", "a"),
    ("aaaaa", "a", "a"),
    ("ababab", "a", "b"),
    ("abcabc", "b", "c"),
    ("xyx", "x", "y"),
    ("aabaa", "a", "a"),
    ("baaab", "a", "a"),
    ("ab", "a", "b"),
    ("b", "a", "a"),
    ("abba", "b", "a"),
]


def test_fold_merge_matches_greedy_reference(spark):
    rows = [(w, list(w), a, b) for w, a, b in MERGE_CASES]
    df = spark.createDataFrame(rows, "w string, sy array<string>, a string, b string")
    got = {
        r["w"]: r["m"]
        for r in df.select(
            "w", B.merge_symbols(F.col("sy"), F.col("a"), F.col("b")).alias("m")
        ).collect()
    }
    for w, a, b in MERGE_CASES:
        assert got[w] == py_greedy_merge(list(w), a, b), (w, a, b)


def py_bpe(texts: list[str], rounds: int) -> list[tuple]:
    import re

    wf = Counter()
    for t in texts:
        norm = re.sub(r" +", " ", re.sub(r"[^a-z0-9 ]", " ", t.lower())).strip()
        for tok in norm.split(" ")[:10000]:
            if tok:
                wf[tok] += 1
    vocab = {w: list(w) for w in wf}
    out = []
    for r in range(1, rounds + 1):
        pc = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wf[w]
        if not pc:
            break
        (a, b), cnt = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        out.append((r, a, b, cnt))
        vocab = {w: py_greedy_merge(s, a, b) for w, s in vocab.items()}
    return out


def test_three_rounds_match_reference_trainer(spark):
    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    got = sorted(
        tuple(r) for r in B.bpe_train_rounds(docs, rounds=3).collect()
    )
    texts = [r["text"] for r in docs.select("text").collect()]
    assert got == sorted(py_bpe(texts, 3))


def test_merge_statistics_count_overlaps(spark):
    # Pair COUNTING keeps overlapping occurrences: 'aaa' (freq 1)
    # contributes (a,a) twice even though only one merge can apply.
    df = spark.createDataFrame(
        [("aaa", 1, ["a", "a", "a"])], "w string, n long, sy array<string>"
    )
    pc = {(r["l"], r["r_"]): r["cnt"] for r in B.pair_counts(df).collect()}
    assert pc == {("a", "a"): 2}


def test_plan_is_single_lazy_program(spark):
    # The argmax winner is broadcast back (BroadcastNestedLoopJoin /
    # BroadcastExchange on a 1-row side) rather than collected: the
    # whole 3-round program must build without any job having run.
    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    plan = B.bpe_train_rounds(docs, rounds=2)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_fold_merge_randomized_batch(spark):
    # 300 seeded random (word, pair) cases in ONE job: the fold must
    # equal the greedy reference on arbitrary symbol runs.
    import random

    rng = random.Random(42)
    rows = []
    for i in range(300):
        syms = [rng.choice("ab c")[0] for _ in range(rng.randint(0, 12))]
        syms = [s if s != " " else "c" for s in syms]
        a, b = rng.choice("abc"), rng.choice("abc")
        rows.append((i, syms, a, b))
    df = spark.createDataFrame(rows, "i int, sy array<string>, a string, b string")
    got = {
        r["i"]: r["m"]
        for r in df.select(
            "i", B.merge_symbols(F.col("sy"), F.col("a"), F.col("b")).alias("m")
        ).collect()
    }
    for i, syms, a, b in rows:
        assert got[i] == py_greedy_merge(syms, a, b), (i, syms, a, b)
