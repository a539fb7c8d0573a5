"""BPE tokenizer training rounds as a distributed relational program.

Byte-pair-encoding training (Sennrich et al. 2016, public algorithm)
is usually written as a driver-side loop over an in-memory vocabulary.
Here each round is a *relational* job over the distinct-word frequency
table, so the same code runs when the vocabulary itself is too large
for one machine (100 TB corpus → tens of millions of distinct words):

- the corpus is tokenized ONCE into a (word, freq) table — the only
  corpus-sized shuffle; every later round works on vocabulary-sized
  data (the classic BPE trick: merge statistics only need distinct
  words weighted by frequency, never the corpus again);
- per round, adjacent symbol pairs are counted with a map-side
  partial aggregate; the argmax pair is a TakeOrderedAndProject
  (no driver collect — the 1-row winner is broadcast back via
  crossJoin, keeping the whole multi-round program ONE lazy plan);
- the greedy leftmost non-overlapping merge is a sequential fold per
  word, expressed with ``F.aggregate`` (Catalyst higher-order
  function, no Python UDF): state = (emitted symbols, pending
  symbol); a pending/next pair equal to the winner emits the merged
  symbol and clears the pending slot, which is exactly the
  no-overlap restart rule ("aaa" + (a,a) → ["aa", "a"]).

Determinism/oracle notes: the winner is (count DESC, left ASC,
right ASC) — total order, so both engines pick the same pair; counts
are integer-exact.  The DuckDB oracle cannot fold, so it replays the
merge relationally: positions where the pair matches form runs of
consecutive indices, and greedy-no-overlap keeps exactly the
odd-offset members of each run (kept(i) = match(i) AND NOT kept(i-1)
⇔ odd position within its run) — verified equivalent to the fold on
adversarial inputs in tests/test_bpe.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_s3_read_write_spark.operators.dedup import tokens

_EMPTY_INT_ARR = "cast(array() as array<int>)"


def word_freq_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n, sy): distinct normalized words, corpus frequency, and
    the word split into single-character symbols."""
    wf = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return wf.select(
        "w",
        "n",
        F.transform(
            F.sequence(F.lit(1), F.length("w")), lambda i: F.col("w").substr(i, F.lit(1))
        ).alias("sy"),
    )


def pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency.

    Overlapping occurrences all count ("aaa" contributes (a,a) twice)
    — the standard BPE statistic; only the MERGE is non-overlapping.
    """
    pos = vocab.select(
        "n",
        "sy",
        F.explode(
            F.when(F.size("sy") > 1, F.sequence(F.lit(1), F.size("sy") - 1)).otherwise(
                F.expr(_EMPTY_INT_ARR)
            )
        ).alias("pos"),
    )
    return (
        pos.select(
            F.element_at("sy", F.col("pos")).alias("l"),
            F.element_at("sy", F.col("pos") + 1).alias("r_"),
            "n",
        )
        .groupBy("l", "r_")
        .agg(F.sum("n").alias("cnt"))
    )


def best_pair(pairs: DataFrame) -> DataFrame:
    """1-row argmax: (count DESC, left ASC, right ASC) — a total order,
    so the winner is engine-independent. Plans as TakeOrderedAndProject."""
    return pairs.orderBy(F.desc("cnt"), "l", "r_").limit(1)


def merge_symbols(sy: Column, left: Column, right: Column) -> Column:
    """Greedy leftmost non-overlapping merge of (left, right) in ``sy``
    as a Catalyst fold — state (out, pend); merging clears pend so a
    just-merged symbol can never re-merge within the same round."""
    init = F.struct(
        F.expr("cast(array() as array<string>)").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(st, x):
        return (
            F.when(st.pend.isNull(), F.struct(st.out.alias("out"), x.alias("pend")))
            .when(
                (st.pend == left) & (x == right),
                F.struct(
                    F.concat(st.out, F.array(F.concat(st.pend, x))).alias("out"),
                    F.lit(None).cast("string").alias("pend"),
                ),
            )
            .otherwise(
                F.struct(F.concat(st.out, F.array(st.pend)).alias("out"), x.alias("pend"))
            )
        )

    def fin(st):
        return F.when(st.pend.isNull(), st.out).otherwise(F.concat(st.out, F.array(st.pend)))

    return F.aggregate(sy, init, step, fin)


def merge_round(vocab: DataFrame, best: DataFrame) -> DataFrame:
    """Apply one merge round: broadcast the 1-row winner into every
    word's fold. Stays lazy — no driver round-trip between rounds."""
    b = F.broadcast(best.select(F.col("l").alias("_bl"), F.col("r_").alias("_br")))
    return vocab.crossJoin(b).select(
        "w",
        "n",
        merge_symbols(F.col("sy"), F.col("_bl"), F.col("_br")).alias("sy"),
    )


def bpe_train_rounds(docs: DataFrame, rounds: int = 3, text_col: str = "text") -> DataFrame:
    """Run ``rounds`` BPE merge rounds; returns one row per round:
    (round, left_sym, right_sym, pair_count).

    The vocabulary table is cached (vocabulary-sized, ≪ corpus) so
    the corpus-wide tokenize+count shuffle happens exactly once; each
    round re-derives only vocabulary-sized intermediates from it.
    """
    outs = []
    cur = word_freq_vocab(docs, text_col).cache()
    for r in range(1, rounds + 1):
        best = best_pair(pair_counts(cur))
        outs.append(
            best.select(
                F.lit(r).cast("int").alias("round"),
                F.col("l").alias("left_sym"),
                F.col("r_").alias("right_sym"),
                F.col("cnt").alias("pair_count"),
            )
        )
        # Each round's merged vocabulary feeds BOTH the next round's
        # pair count and the next merge; uncached, round k's merge
        # re-executes every earlier fold O(2^k) times through the
        # shared lineage.  The tables are vocabulary-sized, so cache
        # them all (the bench/check harness clearCache()s per query).
        cur = merge_round(cur, best).cache()
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


# ---------------------------------------------------------------------------
# DuckDB oracle builder: one CTE chain per unrolled round.  The merge
# is replayed relationally (runs-of-matches + odd-offset keep rule)
# because SQL has no sequential fold; equivalence with merge_symbols
# is property-tested in tests/test_bpe.py.
# ---------------------------------------------------------------------------

_ORACLE_ROUND = """
pairs{r} AS (
  SELECT sy[pos] AS l, sy[pos+1] AS r_, CAST(SUM(n) AS BIGINT) AS cnt
  FROM (SELECT n, sy, unnest(range(1, len(sy))) AS pos FROM w{r})
  GROUP BY 1, 2),
best{r} AS (SELECT l, r_, cnt FROM pairs{r} ORDER BY cnt DESC, l, r_ LIMIT 1),
syms{r} AS (
  SELECT w, n, sy[pos] AS s, pos
  FROM (SELECT w, n, sy, unnest(range(1, len(sy)+1)) AS pos FROM w{r})),
m{r} AS (
  SELECT s.w, s.pos, (s.s = b.l AND s2.s = b.r_) AS is_match
  FROM syms{r} s CROSS JOIN best{r} b
  LEFT JOIN syms{r} s2 ON s2.w = s.w AND s2.pos = s.pos + 1),
runs{r} AS (
  SELECT w, pos, pos - ROW_NUMBER() OVER (PARTITION BY w ORDER BY pos) AS grp
  FROM m{r} WHERE is_match),
kept{r} AS (
  SELECT w, pos
  FROM (SELECT w, pos, ROW_NUMBER() OVER (PARTITION BY w, grp ORDER BY pos) AS rn
        FROM runs{r})
  WHERE rn % 2 = 1),
w{r2} AS (
  SELECT t.w, MAX(t.n) AS n, list(t.s2 ORDER BY t.pos) AS sy
  FROM (
    SELECT s.w, s.n, s.pos,
           CASE WHEN k.pos IS NOT NULL THEN s.s || b.r_ ELSE s.s END AS s2
    FROM syms{r} s CROSS JOIN best{r} b
    LEFT JOIN kept{r} k ON k.w = s.w AND k.pos = s.pos
    LEFT JOIN kept{r} k2 ON k2.w = s.w AND k2.pos = s.pos - 1
    WHERE k2.pos IS NULL) t
  GROUP BY t.w)"""


def bpe_oracle_sql(norm_sql_text: str, rounds: int = 3) -> str:
    """Unrolled-round DuckDB twin of ``bpe_train_rounds``.

    ``norm_sql_text`` is the normalization expression applied to the
    ``text`` column (the caller's _NORM_SQL twin of dedup.tokens)."""
    parts = [
        f"""
WITH tok AS (
  SELECT t AS w FROM (
    SELECT unnest(list_slice(string_split({norm_sql_text}, ' '), 1, 10000)) AS t
    FROM documents) u
  WHERE t <> ''),
wf AS (SELECT w, COUNT(*) AS n FROM tok GROUP BY w),
w1 AS (SELECT w, n, list_transform(range(1, length(w)+1), i -> substring(w, i, 1)) AS sy
       FROM wf)"""
    ]
    for r in range(1, rounds + 1):
        parts.append("," + _ORACLE_ROUND.format(r=r, r2=r + 1))
    sel = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS INTEGER) AS round, l AS left_sym, r_ AS right_sym,"
        f" cnt AS pair_count FROM best{r}"
        for r in range(1, rounds + 1)
    )
    return "".join(parts) + "\n" + sel
