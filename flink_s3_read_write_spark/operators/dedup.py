"""Deduplication operators for large-scale training-data pipelines.

Five families (driver north star, BASELINE.json):
exact, normalized-exact, MinHash+LSH, SimHash, n-gram Jaccard.

All hot paths are pure Catalyst expressions — tokenization, shingling,
hashing and banding happen with higher-order array functions and
``xxhash64``, so at 100 TB the work is JVM-side, codegen'd, and the
only shuffles are (a) the group-by on band buckets and (b) the
candidate-pair self-join, both on well-distributed hash keys.

Skew/blow-up guards: LSH buckets larger than ``max_bucket`` never
expand to their n² pairs (a degenerate bucket — empty docs,
boilerplate — would otherwise dominate the job).  The PRODUCTION
DEFAULT policy for such buckets is ``over_cap="ring"`` (r14 decision,
SCALE.md DESIGN note): each over-cap doc pairs with its next
``ring_c`` id-order bucket-neighbors plus the bucket's min id —
O(n·(ring_c+1)) pairs, cluster connectivity at diameter ≤ 2 —
because the r13 300× experiment measured the legacy ``"drop"``
policy collapsing dedup recall to 0.015 exactly where dedup matters
most, while ring holds recall 1.000 at wall parity.  ``"drop"``
remains available as an explicit opt-out for pipelines that would
rather lose degenerate clusters than verify O(n) extra candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Per-permutation 64-bit keys for the xorshift minhash mixer.  An
# affine family (a·h+b) mod p is NOT usable here: ANSI mode (Spark 4
# default) rejects 64-bit multiply wraparound, and shrinking a/h far
# enough to avoid overflow makes every product smaller than p — the mod
# becomes an identity, each "permutation" is monotonic in h, and all 64
# signature slots collapse to functions of the single min shingle hash
# (LSH banding then degenerates to exact min-hash matching).  The
# XOR-key + xorshift construction below is a 64-bit bijection built
# only from xor/shift — no overflow, a genuinely different ordering per
# key, and bit-for-bit reproducible in NumPy uint64.  Fixed seed →
# deterministic across runs/clusters.
import random as _random

_rng = _random.Random(0x5EED)
_PERM_KEYS = [_rng.getrandbits(64) for _ in range(256)]


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def normalize_text(col: Column) -> Column:
    """lower → strip non-alphanumerics → collapse whitespace → trim."""
    c = F.lower(col)
    c = F.regexp_replace(c, "[^a-z0-9 ]", " ")
    c = F.regexp_replace(c, " +", " ")
    return F.trim(c)


# Cap on tokens fed into shingling/minhash.  A pathological document
# (a 1 GB log file in a web crawl) would otherwise materialize an
# unbounded token array in executor memory; 10k words ≈ 60 KB of text
# is far past the point where a signature is stable, so truncation
# does not change near-dup decisions in practice.
MAX_TOKENS = 10_000


def tokens(col: Column, max_tokens: int = MAX_TOKENS) -> Column:
    t = F.split(normalize_text(col), " ")
    return F.slice(t, 1, max_tokens)


def word_shingles(col: Column, k: int = 3) -> Column:
    """k-word shingles as an array<string>; empty array if < k words.

    NOTE: ``col`` should be a plain column reference, not a deep
    expression — it is referenced k times per shingle inside the
    lambda, and higher-order functions evaluate interpreted (no CSE),
    so an inlined regex-normalization would re-run per element.
    Callers that normalize should materialize the token array first
    (see ``minhash_signatures``).
    """
    t = tokens(col)
    n = F.size(t)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(" ", *[F.element_at(t, i + j + 1) for j in range(k)]),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles_from_tokens(tok: Column, k: int = 3) -> Column:
    """k-word shingles from a materialized token-array column."""
    n = F.size(tok)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(" ", *[F.element_at(tok, i + j + 1) for j in range(k)]),
        ),
    ).otherwise(F.array().cast("array<string>"))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: keep the smallest id per identical text.

    groupBy on the text works but ships full documents through the
    shuffle; grouping on a 128-bit digest ships 16 bytes per doc and
    is collision-safe at any realistic corpus size — so we aggregate
    on md5 and keep one representative id + one text.
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("_digest"))
        .agg(F.min(id_col).alias(id_col), F.min(text_col).alias(text_col))
        .drop("_digest")
    )


def normalized_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Near-exact dedup on normalized text; returns the group key, the
    keeper id, and how many raw docs collapsed into it.

    The normalization is [a-z0-9]-centric; a document with no such
    characters at all (CJK/Cyrillic/emoji-only) normalizes to the
    empty string, and grouping on that would silently collapse every
    non-Latin document into one "duplicate" group — catastrophic data
    loss in a multilingual corpus.  Empty normal forms therefore fall
    back to a per-document key (``#<id>``), making such docs singleton
    groups; a multilingual deployment would swap ``normalize_text``
    for a Unicode-class variant instead.
    """
    norm = normalize_text(F.col(text_col))
    group_key = F.coalesce(
        F.nullif(norm, F.lit("")),
        F.concat(F.lit("#"), F.col(id_col).cast("string")),
    )
    return (
        df.groupBy(group_key.alias("norm_text"))
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_dups"))
    )


def _md5_h60(m):
    """Positive 60-bit BIGINT from an md5 hex string (first 15 hex
    chars).  Engine-independent: DuckDB computes the identical value as
    ``('0x' || substr(md5(x), 1, 15))::BIGINT``, where xxhash64 exists
    only in Spark.  The md5 hash engine built on this is what upgrades
    the LSH queries from rows-only driver checks to full hash-checked
    oracle rows."""
    return F.conv(F.substring(m, 1, 15), 16, 10).cast("long")


# Two-lane additive digest scheme, shared by wl_refine
# (operators/graph.py) and q192's posting digest: the two largest
# primes below 2^31, with lane 2 keyed by an independent input prefix
# so the lanes collide independently (~2^-62 per pair jointly).  The
# SAME constants are interpolated into both the Spark Column
# expressions and the DuckDB oracle SQL of every consumer, so the
# lanes cannot drift between sites or engines (r10 review).
DIGEST_P1 = 2147483647
DIGEST_P2 = 2147483629
DIGEST_LANE2_KEY = "w2|"

# MinHash permutation family for the md5 engine: Carter–Wegman affine
# maps H_j(h) = (a_j*h + b_j) mod P over the Mersenne prime P = 2^31-1.
# With a_j in [1, P-1] each map is a bijection on Z_P (a genuine
# permutation of the reduced hash space), and every intermediate stays
# below 2^62 — exact int64 arithmetic in Spark, DuckDB, and NumPy
# alike, no overflow wrap anywhere.  Constants are md5-seeded so any
# engine can re-derive them; the DuckDB oracle gets them inlined as
# list literals.
MH_PRIME = (1 << 31) - 1


def mh_affine_consts(num_perm: int = 64) -> tuple[list[int], list[int]]:
    import hashlib

    a = [
        int(hashlib.md5(f"perm-a-{j}".encode()).hexdigest()[:15], 16)
        % (MH_PRIME - 1) + 1
        for j in range(num_perm)
    ]
    b = [
        int(hashlib.md5(f"perm-b-{j}".encode()).hexdigest()[:15], 16) % MH_PRIME
        for j in range(num_perm)
    ]
    return a, b


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_perm: int = 64, shingle_k: int = 3, hash_src: str = "xxhash64",
    shingle_sets: DataFrame | None = None,
) -> DataFrame:
    """MinHash signature per document, fully in Catalyst.

    One xxhash64 per shingle, then ``num_perm`` keyed xorshift
    permutations (see ``_PERM_KEYS``) reduced with array_min — no UDF,
    no per-row Python.  Deterministic: keys are fixed literals.

    ``hash_src="md5"`` swaps the per-shingle base hash for the
    md5-derived 60-bit int reduced mod P = 2^31-1 and the xorshift
    family for Carter–Wegman affine bijections ``H_j = (a_j*h + b_j)
    mod P`` (md5-seeded constants, see ``mh_affine_consts``) —
    computable bit-identically by the DuckDB oracle, which upgrades
    the LSH queries from rows-only to full hash-checked correctness
    rows.

    Each stage (tokens → shingles → base hashes → signature) is its
    own projection: higher-order lambdas run interpreted with no
    common-subexpression elimination, so if the tokenization were
    inlined it would re-run its regexes once per shingle per
    permutation — O(perms·shingles·|doc|) instead of O(|doc| +
    perms·shingles).  Chained Projects over expensive multiply-used
    aliases are kept separate by Catalyst (CollapseProject's cheap/
    used-once rule), so each stage computes once per row.
    """

    def mix(h, j: int):
        x = h.bitwiseXOR(F.lit(_signed64(_PERM_KEYS[j])))
        x = x.bitwiseXOR(F.shiftrightunsigned(x, 33))
        x = x.bitwiseXOR(F.shiftleft(x, 21))
        return x.bitwiseXOR(F.shiftrightunsigned(x, 17))

    from flink_s3_read_write_spark.sources.io import fan_out

    if shingle_sets is not None:
        # Injected per-doc shingle SETS (id_col, toks) — see the
        # CONTRACT on minhash_dedup_pairs_verified: shingle_k must
        # match.  MinHash is invariant under both dedup and reorder of
        # the shingle list (min over per-element hashes), so signatures
        # off the distinct set equal signatures off the raw multiset.
        shingled = shingle_sets.select(
            F.col(id_col), F.col("toks").alias("_sh")
        )
    else:
        # Signature construction is pure per-row CPU (O(perms·shingles)
        # interpreted HOF arithmetic): spread it across cores when the
        # scan under-splits (no-op at scale — fan_out docstring).
        toked = fan_out(df).select(
            F.col(id_col), tokens(F.col(text_col)).alias("_tok")
        )
        shingled = toked.select(
            F.col(id_col), shingles_from_tokens(F.col("_tok"), shingle_k).alias("_sh")
        )
    if hash_src == "md5":
        # Stage the base hash once per shingle (md5 + reduce mod P);
        # the 64 affine maps then reuse it (same no-recompute staging).
        a, b = mh_affine_consts(num_perm)
        hashed = shingled.select(
            F.col(id_col),
            F.transform(
                F.col("_sh"), lambda s: _md5_h60(F.md5(s)) % F.lit(MH_PRIME)
            ).alias("_hh"),
        )
        sig = F.array(
            *[
                F.array_min(
                    F.transform(
                        F.col("_hh"),
                        lambda h: (F.lit(a[j]) * h + F.lit(b[j])) % F.lit(MH_PRIME),
                    )
                )
                for j in range(num_perm)
            ]
        )
        return hashed.select(F.col(id_col), sig.alias("minhash"))
    hashed = shingled.select(
        F.col(id_col),
        F.transform(F.col("_sh"), lambda s: F.xxhash64(s)).alias("_h"),
    )
    sig = F.array(
        *[
            F.array_min(F.transform(F.col("_h"), lambda h: mix(h, j)))
            for j in range(num_perm)
        ]
    )
    return hashed.select(F.col(id_col), sig.alias("minhash"))


def minhash_signatures_numpy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_perm: int = 64, shingle_k: int = 3, hash_src: str = "xxhash64",
    shingle_sets: DataFrame | None = None,
) -> DataFrame:
    """MinHash signatures, vectorized permutation path.

    Bit-identical to ``minhash_signatures`` (asserted in
    tests/test_dedup.py): shingling + xxhash64 stay in Catalyst, but
    the ``num_perm`` keyed xorshift permutations run as ONE NumPy
    uint64 broadcast per document (xor/shift wrap identically to the
    JVM's long ops; the min is taken as signed to match array_min).
    Faster than the interpreted higher-order-function path at sf0.1;
    use this at scale, keep the Catalyst twin as the no-Python
    fallback and cross-check.
    """
    import numpy as np
    import pandas as pd

    from flink_s3_read_write_spark.sources.io import fan_out

    if shingle_sets is not None:
        # Injected per-doc shingle SETS — same min-invariance argument
        # as minhash_signatures (dedup/reorder never changes the min).
        shingled = shingle_sets.select(
            F.col(id_col), F.col("toks").alias("_sh")
        )
    else:
        # Arrow batches inherit the input partitioning: a 1-split scan
        # means ONE Python worker does every signature.  Fan out first
        # (no-op at scale — fan_out docstring).
        toked = fan_out(df).select(
            F.col(id_col), tokens(F.col(text_col)).alias("_tok")
        )
        shingled = toked.select(
            F.col(id_col), shingles_from_tokens(F.col("_tok"), shingle_k).alias("_sh")
        )

    if hash_src == "md5":
        al, bl = mh_affine_consts(num_perm)
        av = np.array(al, dtype=np.int64)[:, None]
        bv = np.array(bl, dtype=np.int64)[:, None]

        def batches_md5(it):
            for pdf in it:
                ids, sigs = [], []
                for doc_id, hs in zip(pdf[id_col], pdf["_hh"]):
                    ids.append(doc_id)
                    if len(hs) == 0:
                        sigs.append([None] * num_perm)
                        continue
                    h = np.asarray(hs, dtype=np.int64)[None, :]
                    # a < 2^31, h < 2^31: a*h + b < 2^63, exact int64.
                    sigs.append(((av * h + bv) % MH_PRIME).min(axis=1).tolist())
                yield pd.DataFrame({id_col: ids, "minhash": sigs})

        hashed = shingled.select(
            F.col(id_col),
            F.transform(
                F.col("_sh"), lambda s: _md5_h60(F.md5(s)) % F.lit(MH_PRIME)
            ).alias("_hh"),
        )
        return hashed.mapInPandas(
            batches_md5, f"{id_col} long, minhash array<bigint>"
        )

    keys = np.array(_PERM_KEYS[:num_perm], dtype=np.uint64)[:, None]

    def batches(it):
        for pdf in it:
            ids, sigs = [], []
            for doc_id, hs in zip(pdf[id_col], pdf["_h"]):
                ids.append(doc_id)
                if len(hs) == 0:
                    sigs.append([None] * num_perm)
                    continue
                h = np.asarray(hs, dtype=np.int64).view(np.uint64)[None, :]
                x = h ^ keys
                x = x ^ (x >> np.uint64(33))
                x = x ^ (x << np.uint64(21))
                x = x ^ (x >> np.uint64(17))
                sigs.append(x.view(np.int64).min(axis=1).tolist())
            yield pd.DataFrame({id_col: ids, "minhash": sigs})

    hashed = shingled.select(
        F.col(id_col),
        F.transform(F.col("_sh"), lambda s: F.xxhash64(s)).alias("_h"),
    )
    return hashed.mapInPandas(batches, f"{id_col} long, minhash array<bigint>")


def _split_over_cap(
    banded: DataFrame, keys: list[str], id_col: str, max_bucket: int,
) -> tuple[DataFrame, DataFrame]:
    """Split ``banded`` (one row per (bucket-key, id)) into under-cap
    rows and over-cap rows with ONE shuffle.

    The bucket size is a full-frame ``count`` over the SAME
    (keys, id)-sorted window the ring leads run on, so the whole split
    + ring computation is a single Exchange on the bucket key followed
    by one sort — the expensive pipeline UPSTREAM of the exchange
    (tokenize → shingle → signatures → banding) is computed once and
    the two branch subtrees dedupe through ReusedExchange (verified
    in the executed adaptive plan: 1 ReusedExchange).  The
    count-preagg + semi/anti-join formulation this replaces carried
    the signature pipeline in THREE subtrees (count aggregate, semi
    probe, anti probe) with no exchange reuse in its plan — ~10-15%
    steady-state wall on q208 at gate SF and, more importantly, a
    duplication that grows with corpus cost once the shared shingle
    cache is cold.  No over-cap bucket ever materializes an array:
    only (key, id[, payload]) rows are shuffled, never signatures.

    Skew profile (ADVICE r13 — be honest about the pathological
    input this feature targets): the unbounded-both-sides count frame
    buffers the ENTIRE bucket partition in the window operator's row
    buffer before emitting — a spillable UnsafeExternalSorter array,
    NOT O(1) state — and a degenerate over-cap bucket sorts in a
    single task.  The guarantee is therefore "one task holds
    O(bucket) small (key, id) rows, spilling to disk past the page
    budget", not constant memory; acceptable because the rows carry
    no signature arrays, but a future 10^9-row single bucket would
    serialize through one core.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wn = banded.withColumn("_n", F.count(F.lit(1)).over(w))
    return (
        wn.filter(F.col("_n") <= max_bucket).drop("_n"),
        wn.filter(F.col("_n") > max_bucket).drop("_n"),
    )


def _resolve_over_cap(over_cap: str | None,
                      cap_bucket_prepass: bool = False) -> str:
    """Resolve the ``over_cap=None`` sentinel default (ADVICE r14).

    ``None`` means "the production default": ``"ring"``.  History of
    the ``cap_bucket_prepass=True``-without-a-policy idiom (the
    drop-era call shape — the prepass is a drop-only knob): r15 gave
    it a one-round deprecation window (drop semantics + a visible
    warning, so the r14 default flip could not retroactively break a
    previously-valid call); the window closed with ZERO internal warn
    hits (r16, VERDICT r15 item 6), so it is now a hard error like
    the explicit ring+prepass conflict — an ambiguous knob
    combination must surface, not silently pick a policy.  Callers
    name their intent: ``over_cap="drop"`` with the prepass, or no
    prepass for the ring default.
    """
    if over_cap is None:
        if cap_bucket_prepass:
            raise ValueError(
                "cap_bucket_prepass=True without an explicit over_cap "
                "is ambiguous (the prepass is a drop-only knob; the "
                "production default is 'ring') — pass over_cap='drop' "
                "with the prepass, or drop the prepass to adopt the "
                "recall-preserving ring policy")
        return "ring"
    return over_cap


def _check_over_cap(
    over_cap: str, ring_c: int, cap_bucket_prepass: bool = False,
    star_k: int = 1,
) -> None:
    """Shared argument guard for the over-cap policy knobs."""
    if over_cap not in ("drop", "ring"):
        raise ValueError(f"over_cap must be 'drop' or 'ring', got {over_cap!r}")
    if over_cap == "ring" and star_k < 1:
        # star_k=0 would drop the star entirely and re-open the
        # bounded-round CC stall (diameter n/ring_c).
        raise ValueError(f"star_k must be >= 1, got {star_k}")
    if over_cap == "ring" and ring_c < 1:
        # ring_c=0 would silently degrade to star-only pairing and
        # lose the documented local robustness of the ring edges.
        raise ValueError(f"ring_c must be >= 1, got {ring_c}")
    if over_cap == "ring" and cap_bucket_prepass:
        # The ring split subsumes the two-pass guard (over-cap rows
        # never reach the collect accumulator), so the prepass knob
        # would be silently dropped by the elif — surface the conflict
        # instead of ignoring one of two explicit requests (ADVICE r13).
        raise ValueError(
            "cap_bucket_prepass=True has no effect with over_cap='ring' "
            "(the default since r14; the ring split already keeps "
            "over-cap rows out of the collect accumulator) — the "
            "prepass is a drop-only knob, pass over_cap='drop' with it")


def _ring_pairs(
    over_rows: DataFrame, keys: list[str], id_col: str, ring_c: int,
    payload: str | None = None, star_k: int = 1,
) -> DataFrame:
    """RING+STAR candidate pairs of the over-cap buckets.

    ``star_k`` (r14) widens the star: each doc pairs with the
    bucket's ``star_k`` SMALLEST ids instead of just the minimum.
    The knob exists for the measured hub-marginal residual: when one
    over-cap bucket hosts TWO near-dup families (the verify threshold
    sits exactly on a family's copy_0 hub edge), star_k=1 sends every
    star edge to the lower family's min — the upper family's hub edge
    is never emitted and its cluster can split (100x witness: 14/4949
    eligible clusters at q54's 0.9-shingle threshold).  star_k=2
    also pairs each doc with the bucket's 2nd-smallest id, restoring
    the second family's hub at O(n·(ring_c+star_k)) cost.  Default 1
    keeps the r13 topology (and every committed oracle replay)
    byte-identical.

    Over-cap policy for degenerate LSH buckets (r13; VERDICT item):
    dropping a bucket of n near-identical docs bounds cost but
    collapses dedup recall exactly where dedup matters most (the 300x
    stress tier measured q33's candidates 396k → 3.5k as clusters of
    300 blew past the cap).  Instead each doc pairs with (a) its next
    ``ring_c`` successors in ascending-id order (ring — local
    robustness: one verify-rejected doc only breaks the chain at that
    point) and (b) the bucket's MIN id (star).  O(n·(ring_c+1)) pairs
    instead of O(n²), and the star edges matter for the DOWNSTREAM
    pass: a pure ring gives the bucket's pair graph diameter n/ring_c,
    which ``connected_components``' bounded-round min-label
    propagation cannot traverse (measured: a 60-doc chain stalled at
    41 members after the default 20 rounds), while the star keeps
    diameter ≤ 2 so the full duplicate cluster labels in O(1) rounds.

    The ONE implementation of the topology — MinHash and SimHash both
    call it (review r13).  ``payload`` optionally names a column to
    ride along through the window: the output then also carries
    (``pa``, ``pb``) — each side's payload — so an in-row verify
    (SimHash Hamming) needs no re-join.  Returns (id_a < id_b) rows.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.col(id_col))
    # first()/lead() over the ascending-ordered window (default
    # running frame for first) give the partition minimum and the
    # next-j neighbors on every row; stage them as plain columns
    # first, then build edge structs (HOFs can't hold window exprs).
    sel_cols = [
        F.col(id_col).alias("_id"),
        F.first(F.col(id_col)).over(w).alias("_f1"),
    ]
    if payload is not None:
        sel_cols += [
            F.col(payload).alias("_p"),
            F.first(F.col(payload)).over(w).alias("_fp1"),
        ]
    # star_k > 1: the s-th smallest id via nth_value over the same
    # running frame (null until s rows are in frame — the id_a < id_b
    # filter below also discards the self-row case).
    for s in range(2, star_k + 1):
        sel_cols.append(
            F.nth_value(F.col(id_col), s).over(w).alias(f"_f{s}"))
        if payload is not None:
            sel_cols.append(
                F.nth_value(F.col(payload), s).over(w).alias(f"_fp{s}"))
    for j in range(1, ring_c + 1):
        sel_cols.append(F.lead(F.col(id_col), j).over(w).alias(f"_l{j}"))
        if payload is not None:
            sel_cols.append(F.lead(F.col(payload), j).over(w).alias(f"_lp{j}"))
    sel = over_rows.select(*sel_cols)

    def edge(aid, bid, apl=None, bpl=None):
        fields = [aid.alias("id_a"), bid.alias("id_b")]
        if payload is not None:
            fields += [apl.alias("pa"), bpl.alias("pb")]
        return F.struct(*fields)

    edges = [edge(F.col(f"_f{s}"), F.col("_id"),
                  F.col(f"_fp{s}") if payload is not None else None,
                  F.col("_p") if payload is not None else None)
             for s in range(1, star_k + 1)]
    for j in range(1, ring_c + 1):
        edges.append(edge(F.col("_id"), F.col(f"_l{j}"),
                          F.col("_p") if payload is not None else None,
                          F.col(f"_lp{j}") if payload is not None else None))
    return (
        sel.select(F.explode(F.array(*edges)).alias("e"))
        .filter(F.col("e.id_b").isNotNull()
                & (F.col("e.id_a") < F.col("e.id_b")))
        .select("e.*")
    )


def minhash_lsh_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_perm: int = 64, bands: int = 16, shingle_k: int = 3,
    max_bucket: int = 50, engine: str = "numpy", hash_src: str = "xxhash64",
    shingle_sets: DataFrame | None = None,
    cap_bucket_prepass: bool = False,
    over_cap: str | None = None, ring_c: int = 2, star_k: int = 1,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded LSH on the signature.

    bands=16 × rows=4 over 64 perms ⇒ the classic S-curve with ~50%
    capture at Jaccard ≈ (1/16)^(1/4) ≈ 0.5.
    Output: (id_a, id_b) with id_a < id_b, distinct.

    Pairing is ONE shuffle: group ids per (band, bucket) with
    collect_list, drop degenerate buckets (a bucket of n docs yields
    n² pairs; at scale one boilerplate bucket would dominate the job),
    expand pairs with array ops inside the bucket row.  This replaces
    the window-count + self-join formulation, which cost a sort plus
    two more shuffles of the banded table; the in-array expansion is
    safe precisely because the guard bounds the bucket (≤ max_bucket
    ids ⇒ ≤ max_bucket² struct ops per row, memory-bounded).

    ``cap_bucket_prepass`` (r11 — the callable form of the r10
    collect-state disposition): the default size filter runs AFTER
    collect_list, so one pathological bucket (n near-identical
    boilerplate docs sharing a band key) still materializes an
    n-element array in a single reducer before being dropped —
    quantified at ~80 MB for n = 10M, survivable but not free.  True
    opts into the q80/cap_baskets discipline: a count-only
    pre-aggregate (constant state per group) finds over-cap
    (band, bucket) keys and an UN-HINTED anti-join (planner/AQE
    broadcasts while the degenerate-key set fits — it is
    data-dependent, so no forced hint) drops their rows BEFORE the
    accumulator.  Values are identical either way (over-cap buckets
    emit no pairs on both paths — equivalence-tested on a synthetic
    degenerate bucket); default False keeps the single-shuffle plan.

    ``over_cap`` (r13) picks the policy for buckets past
    ``max_bucket``: ``"ring"`` (DEFAULT since r14 — see the module
    docstring and SCALE.md's DESIGN note) — each doc pairs with its
    next ``ring_c`` bucket-neighbors in ascending-id order plus the
    bucket's min id (O(n·(ring_c+1)) pairs, bucket connectivity at
    diameter ≤ 2 for a downstream bounded-round connected-components
    pass; see ``_ring_pairs``) — or ``"drop"`` (legacy opt-out: no
    pairs, bounded cost, recall loss on degenerate clusters).
    ``"ring"`` subsumes the two-pass guard (over-cap rows never
    reach the collect accumulator), so combining it with
    ``cap_bucket_prepass=True`` raises rather than silently dropping
    one of two explicit requests (ADVICE r13); the prepass is a
    drop-only knob — pass ``over_cap="drop"`` with it.
    """
    over_cap = _resolve_over_cap(over_cap, cap_bucket_prepass)
    _check_over_cap(over_cap, ring_c, cap_bucket_prepass, star_k)
    rows_per_band = num_perm // bands
    sig_fn = minhash_signatures_numpy if engine == "numpy" else minhash_signatures
    sigs = sig_fn(df, text_col, id_col, num_perm, shingle_k, hash_src,
                  shingle_sets=shingle_sets)
    # Docs too short to shingle (< k words) have all-null signatures;
    # without this filter they would ALL share the hash-of-nulls band
    # bucket and pair with each other.  Sub-shingle docs are handled by
    # exact/normalized dedup, not minhash.
    sigs = sigs.filter(F.element_at("minhash", 1).isNotNull())

    def band_key(b: int):
        slots = [
            F.element_at("minhash", b * rows_per_band + r + 1)
            for r in range(rows_per_band)
        ]
        if hash_src == "md5":
            # Bucket on the raw slot tuple, not a hash of it: a (2^-64)
            # band_hash collision would merge two buckets and perturb the
            # candidate set / bucket cap vs the DuckDB oracle's exact
            # tuple grouping.  Array group keys shuffle 4 bigints instead
            # of 1 — negligible, and the semantics are collision-free.
            return F.array(*slots).alias("band_hash")
        return F.xxhash64(*slots).alias("band_hash")

    banded = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), band_key(b))
                    for b in range(bands)
                ]
            )
        ).alias("bh"),
    ).select(id_col, "bh.band", "bh.band_hash")
    ring = None
    if over_cap == "ring":
        banded, over_rows = _split_over_cap(
            banded, ["band", "band_hash"], id_col, max_bucket)
        ring = _ring_pairs(over_rows, ["band", "band_hash"], id_col, ring_c,
                           star_k=star_k)
    elif cap_bucket_prepass:
        over = (
            banded.groupBy("band", "band_hash")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_bucket)
            .select("band", "band_hash")
        )
        banded = banded.join(over, ["band", "band_hash"], "left_anti")
    bucketed = (
        banded.groupBy("band", "band_hash")
        .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
    )
    ids = F.col("ids")
    pairs = bucketed.select(
        F.explode(
            F.flatten(
                F.transform(
                    ids,
                    lambda x, i: F.transform(
                        F.slice(ids, i + 2, F.size(ids)),
                        lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                    ),
                )
            )
        ).alias("p")
    )
    out = pairs.select("p.id_a", "p.id_b")
    if ring is not None:
        out = out.unionByName(ring)
    return out.distinct()


def jaccard_sets(ta: Column, tb: Column) -> Column:
    """Jaccard of two DISTINCT element-array columns (empty-union
    convention: 0.0).  The single source of truth for the set-level
    formula — jaccard_tokens and the registry's set-side consumers
    (q32) delegate here so the empty-union convention can never
    drift between call sites."""
    inter = F.size(F.array_intersect(ta, tb)).cast("double")
    union = F.size(F.array_union(ta, tb)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def jaccard_tokens(a: Column, b: Column) -> Column:
    """Token-set Jaccard of two texts (distinct word sets)."""
    return jaccard_sets(F.array_distinct(tokens(a)), F.array_distinct(tokens(b)))


def minhash_dedup_pairs_verified(
    df: DataFrame, threshold: float = 0.6, *,
    verify_on: str = "tokens",
    threshold_frac: tuple[int, int] | None = None,
    cand: DataFrame | None = None,
    toks: DataFrame | None = None,
    scores: DataFrame | None = None,
    **kwargs,
) -> DataFrame:
    """LSH candidates re-verified with exact Jaccard ≥ threshold.

    The expensive exact check runs only on LSH survivors — the whole
    point of the banding at scale.

    ``verify_on`` picks the set the exact Jaccard runs over:
    ``"tokens"`` (word sets — order-insensitive, the looser check) or
    ``"shingles"`` (the same k-word shingle sets the MinHash signature
    is built from — order-sensitive, and the representation for which
    the LSH S-curve recall guarantee actually holds).
    ``threshold_frac=(num, den)`` replaces the double comparison with
    exact integer cross-multiplication (|∩|·den ≥ |∪|·num), removing
    any float-boundary ambiguity for rational thresholds.

    ``cand`` / ``toks`` (r08) let callers inject precomputed candidate
    pairs (``id_a``, ``id_b``) and per-doc comparison sets (``id_col``,
    ``toks``) — the shared-cached-builder hook: several registry
    queries verify against DIFFERENT thresholds over the SAME
    signature→banding→bucket pipeline, and passing the one cached
    candidate table here means that pipeline runs once per session
    instead of once per query (the exact CacheManager pattern of
    queries_graph.basket_pairs).  Semantics are unchanged: defaults
    rebuild both inputs from ``df`` as before.

    CONTRACT (ADVICE r08): injected ``cand``/``toks`` are trusted —
    they MUST have been built with the same ``hash_src`` / banding /
    ``shingle_k`` as the kwargs passed here, or the verified pair set
    silently reflects a different LSH family.  Callers should derive
    both from one shared parameter dict (``queries_llmdata.
    MINHASH_KW`` is the registry's single source of truth).

    ``scores`` (r16) injects the pre-threshold verify-score table —
    ``minhash_verify_scores`` output, the shared-cached-builder hook
    one level above ``cand``/``toks``: the expensive candidate⋈sets
    join with the exact |∩|/|∪| counts runs once per session when two
    registry queries verify the SAME (cand, toks) under different
    threshold forms (q208's double compare vs q210's integer
    cross-multiplication).  Each caller's own threshold predicate
    still runs verbatim over the exact integer counts, so outputs are
    bit-identical to the uninjected path.  Same trust contract as
    ``cand``/``toks``.
    """
    if scores is None:
        scores = minhash_verify_scores(
            df, verify_on=verify_on, cand=cand, toks=toks, **kwargs
        )
    inter_n = F.col("_in")
    union_n = F.col("_un")
    jac = F.when(union_n > 0, inter_n.cast("double") / union_n.cast("double")).otherwise(
        F.lit(0.0)
    )
    if threshold_frac is not None:
        num, den = threshold_frac
        keep = (union_n > 0) & (inter_n * F.lit(den) >= union_n * F.lit(num))
    else:
        keep = jac >= threshold
    return scores.filter(keep).select("id_a", "id_b", jac.alias("jaccard"))


def minhash_verify_scores(
    df: DataFrame, *,
    verify_on: str = "tokens",
    cand: DataFrame | None = None,
    toks: DataFrame | None = None,
    **kwargs,
) -> DataFrame:
    """Exact per-candidate-pair set counts: (id_a, id_b, _in, _un).

    The verify stage of ``minhash_dedup_pairs_verified`` WITHOUT the
    threshold filter — the candidates⋈comparison-sets join plus the
    exact intersection/union sizes, which is the whole cost of the
    verify.  Split out (r16) so a session can cache it once and apply
    several different threshold predicates over the same exact
    integer counts.  ``cand``/``toks`` carry the r08 injection
    contract documented on ``minhash_dedup_pairs_verified``.
    """
    id_col = kwargs.get("id_col", "doc_id")
    text_col = kwargs.get("text_col", "text")
    if cand is None:
        cand = minhash_lsh_pairs(df, **kwargs)
    # Tokenize each document ONCE (n docs), not once per candidate side
    # (2·n_pairs) — the regex normalization is the expensive part and a
    # doc can appear in many candidate pairs.
    from flink_s3_read_write_spark.sources.io import fan_out

    if toks is not None:
        pass
    elif verify_on == "shingles":
        shingle_k = kwargs.get("shingle_k", 3)
        # Two staged projections, NOT one inline expression: the shingle
        # lambda references its token array k times per element, and
        # higher-order functions evaluate interpreted with no CSE — an
        # inline tokens() would re-run the normalize regexes O(k·shingles)
        # times per doc (measured 15x slower at sf0.1).  Same staging as
        # minhash_signatures.
        toked = fan_out(df).select(F.col(id_col), tokens(F.col(text_col)).alias("_tok"))
        toks = toked.select(
            F.col(id_col),
            F.array_distinct(
                shingles_from_tokens(F.col("_tok"), shingle_k)
            ).alias("toks"),
        )
    else:
        toks = fan_out(df).select(
            F.col(id_col), F.array_distinct(tokens(F.col(text_col))).alias("toks")
        )
    joined = (
        cand.join(
            toks.select(F.col(id_col).alias("id_a"), F.col("toks").alias("toks_a")), "id_a"
        ).join(
            toks.select(F.col(id_col).alias("id_b"), F.col("toks").alias("toks_b")), "id_b"
        )
    )
    return joined.select(
        "id_a", "id_b",
        F.size(F.array_intersect(F.col("toks_a"), F.col("toks_b")))
        .cast("long").alias("_in"),
        F.size(F.array_union(F.col("toks_a"), F.col("toks_b")))
        .cast("long").alias("_un"),
    )


def connected_components(
    pairs: DataFrame, max_iter: int = 20, id_a: str = "id_a", id_b: str = "id_b",
    unroll: int = 1,
) -> DataFrame:
    """Cluster ids for the near-duplicate pair graph: every vertex gets
    the minimum id reachable from it (label propagation to fixpoint).

    This is the standard last step of web-scale dedup — LSH emits
    *pairs*, but keep/drop decisions need *clusters* (A~B, B~C ⇒ keep
    one of {A,B,C}).  Implementation is iterative min-label exchange:
    each round, every vertex adopts min(own label, neighbors' labels);
    rounds needed = graph diameter, which for near-dup clusters is
    tiny (chains of copies), so ``max_iter`` is a safety bound not a
    practical limit.  Each round is one shuffle (groupBy vertex);
    results are cached + localCheckpointed to keep the plan from
    growing O(iterations) deep — the classic iterative-Spark trap.

    Input: distinct undirected edges (id_a, id_b).  Output:
    (id, cluster_id) for every vertex appearing in any edge, where
    cluster_id = min vertex id of its component.

    Checkpoint durability (r17, VERDICT r16 #3): when the session has
    a checkpoint directory configured (``sc.setCheckpointDir``), the
    per-round label truncation uses RELIABLE ``checkpoint()`` —
    on a real cluster an executor loss mid-loop then recomputes from
    checkpointed state instead of killing the job.  Without one it
    falls back to ``localCheckpoint`` (executor-local blocks), the
    right trade in local mode where executor==driver and reliable
    checkpointing would just pay an extra write to disk.

    ``unroll`` (r17, VERDICT r16 #3 "probe-free rounds"): the first
    ``unroll`` rounds run WITHOUT a per-round convergence probe — one
    lazy chain, lineage truncated every 2 rounds, materialized by a
    single action whose probe reads the LAST round's change flag.  A
    driver probe per round costs a full job launch + an AQE re-plan
    (~0.4-0.5 s each locally; measured q212 3.09 -> 2.31 s at
    unroll=6), which dwarfs the round's actual compute on dedup-sized
    graphs.  ``unroll`` is a pure PERFORMANCE hint, never a
    correctness bound: extra rounds past the fixpoint are no-ops
    under the min() update rule, and if round ``unroll`` still
    changed labels the probing loop below continues to the true
    fixpoint — so an underestimate degrades to the old
    probe-per-round behavior, never to a wrong answer.  Callers pick
    it from their candidate topology (star keeps bucket diameter <= 2
    => 2; star2's cross-bucket chains measured 6-8 rounds across SFs
    => 6).  Lineage still truncates INSIDE the block (every 2 rounds
    — one round's plan nests the previous round's otherwise:
    measured 17.7 s for a 6-round single-lineage chain vs 2.3 s
    truncated), so plan depth stays bounded regardless of ``unroll``.
    """
    spark = pairs.sparkSession
    try:
        reliable = spark.sparkContext.getCheckpointDir() is not None
    except Exception:
        reliable = False

    def _ckpt(df: DataFrame, eager: bool = True) -> DataFrame:
        return df.checkpoint(eager=eager) if reliable else df.localCheckpoint(eager=eager)

    # Both orientations from ONE pass over ``pairs`` — a 2-branch
    # union would compute the (expensive: LSH + verify) pair pipeline
    # twice before this cache even fills.  Cached pre-partitioned on
    # ``src``, the per-round join key: every round's contribution join
    # then reuses the cached distribution instead of re-exchanging the
    # edge table (guide §2.4 — two operations keyed the same way share
    # one exchange), so only the (vertex-sized) label table moves per
    # round once labels outgrow the broadcast threshold.
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(id_a).alias("src"), F.col(id_b).alias("dst")),
                    F.struct(F.col(id_b).alias("src"), F.col(id_a).alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .repartition("src")
        .cache()
    )
    labels = _ckpt(
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
    )
    label_t = labels.schema["label"].dataType.simpleString()

    def _round(labels: DataFrame) -> DataFrame:
        # One round = ONE join + ONE aggregate (r16; was join + agg +
        # left-join = 3 exchanges + 2 sorts + an SMJ per round): each
        # vertex's new label is min over {own label} ∪ {in-neighbor
        # labels}, computed by unioning the label table (tagged with
        # its own label in ``_own``) with the per-edge contributions
        # and taking one grouped min.  Identical update rule, so the
        # round-by-round label sequence — and therefore the fixpoint
        # AND the round count — are unchanged.  The result carries a
        # per-row `chg` flag (label strictly decreased) so whichever
        # action eventually materializes the round can also answer
        # whether anything changed.
        contrib = (
            edges.join(labels, edges.src == labels.id)
            .select(
                F.col("dst").alias("id"), "label",
                F.lit(None).cast(label_t).alias("_own"),
            )
        )
        return (
            labels.select("id", "label", F.col("label").alias("_own"))
            .unionByName(contrib)
            .groupBy("id")
            .agg(F.min("label").alias("label"), F.min("_own").alias("_old"))
            .select("id", "label", (F.col("label") < F.col("_old")).alias("chg"))
        )

    # Probe-free block: the first `unroll` rounds chain lazily and run
    # under ONE action (the probe on the LAST round's chg flag);
    # lineage truncates every 2 rounds so plan depth stays bounded.
    block = max(1, min(unroll, max_iter))
    new_labels = labels
    for j in range(block):
        new_labels = _round(labels)
        if j % 2 == 1 or j == block - 1:
            new_labels = _ckpt(new_labels, eager=False)
        labels = new_labels.select("id", "label")
    changed = new_labels.agg(F.max("chg")).first()[0]
    # Fallback probing loop: only reached when round `block` still
    # changed labels — i.e. `unroll` under-estimated this input's
    # convergence depth.  One job per round, exactly the pre-unroll
    # behavior.
    for _ in range(block, max_iter):
        if not changed:
            break
        new_labels = _ckpt(_round(labels), eager=False)
        changed = new_labels.agg(F.max("chg")).first()[0]
        labels = new_labels.select("id", "label")
    edges.unpersist()
    return labels.select(F.col("id"), F.col("label").alias("cluster_id"))


def dedup_keep_list(
    df: DataFrame, threshold: float = 0.6, text_col: str = "text", id_col: str = "doc_id",
    cc_unroll: int = 2, **kwargs,
) -> DataFrame:
    """End-to-end near-dedup: MinHash LSH pairs → verify → clusters →
    one keeper (min id) per cluster.  Output: (doc_id, cluster_id,
    keep) for every document; singletons keep themselves.

    ``cc_unroll`` forwards to ``connected_components(unroll=...)`` — a
    probe-free-rounds performance hint (never a correctness bound; see
    there).  Default 2 fits the ring+star candidate topology, whose
    star edges pin each bucket's pair-graph diameter at <= 2 (one
    changing round + the confirming round, measured 2 rounds at every
    SF for q54/q210); star2 callers pass their measured depth."""
    pairs = minhash_dedup_pairs_verified(
        df, threshold=threshold, text_col=text_col, id_col=id_col, **kwargs
    )
    clusters = connected_components(pairs, unroll=cc_unroll)
    all_ids = df.select(F.col(id_col))
    labeled = (
        all_ids.join(clusters, all_ids[id_col] == clusters.id, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("cluster_id"),
        )
    )
    return labeled.withColumn("keep", F.col(id_col) == F.col("cluster_id"))


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    hash_src: str = "xxhash64", tok: DataFrame | None = None,
) -> DataFrame:
    """64-bit SimHash per document, pure Catalyst.

    Per token: xxhash64 → for each bit, +1/−1 vote; document hash =
    sign bits of the 64 vote sums.  One shuffle keyed by doc id
    (pre-aggregated map-side), no UDF.

    The votes are SWAR-packed (r08): instead of ``nbits`` conditional
    ``SUM(CASE ...)`` aggregates (a 60/64-wide agg whose driver-side
    plan build alone cost ~1.5 s and whose update path is one branch
    per bit per token), each group of 4 hash bits packs into 14-bit
    lanes of ONE long via a spread-multiply —

        x = (h >>> 4g) & 15                  # the group's 4 bits
        packed = (x * SPREAD) & LANE_MASK    # bit j → bit 14·j

    where SPREAD = 1 + 2^13 + 2^26 + 2^39 places a copy of bit j at
    position 13k + j for k = 0..3 (all 16 positions distinct since
    j, k < 4 < 13), and LANE_MASK = 1 + 2^14 + 2^28 + 2^42 keeps
    exactly the j-th bit of the j-th copy, i.e. position 14j.
    Summing the packed longs advances the four set-bit counters in
    parallel; a lane never carries into its neighbor because per-doc
    token counts are capped at MAX_TOKENS = 10 000 < 2^14.  The
    +1/−1 vote sum is recovered as v_i = 2·cnt_i − n (n = doc token
    count), so the sign test "v_i > 0" becomes "2·cnt_i > n" —
    bit-identical to the unpacked form.  Aggregate width drops 4×
    (16 longs + a count for 64 bits) and the per-token update is 4
    ALU ops per 4 bits instead of 4 branches.  x·SPREAD < 2^44: no
    signed-overflow anywhere.

    ``hash_src="md5"`` votes over the 60-bit md5-derived token hash
    instead — a 60-bit SimHash whose bits DuckDB can recompute
    exactly, making the near-pair query fully oracle-checkable.

    ``tok`` (r09) injects a precomputed exploded token frame
    (``id_col``, ``tok: string``) — the shared-cached-builder hook
    (see minhash_dedup_pairs_verified's CONTRACT): it must be exactly
    ``explode(tokens(text))`` per doc, e.g. derived from
    ``queries_llmdata.doc_tokens``.
    """
    from flink_s3_read_write_spark.sources.io import fan_out

    if tok is None:
        # Tokenize + hash + pack is per-row CPU bounded by the scan's
        # split count: fan out first (no-op at scale — fan_out docstring).
        tok = fan_out(df).select(
            F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
        )
    if hash_src == "md5":
        h = _md5_h60(F.md5("tok"))
        nbits = 60
    else:
        h = F.xxhash64("tok")
        nbits = 64
    # Stage the token hash once — the pack expressions reference it
    # once per 4-bit group and interpreted fallbacks have no CSE.
    hashed = tok.select(F.col(id_col), h.alias("_h"))

    def bit_i(i: int) -> int:
        # bit 63 as a signed-64 literal (1 << 63 overflows LongType)
        return (1 << i) if i < 63 else -(1 << 63)

    spread = 1 + (1 << 13) + (1 << 26) + (1 << 39)
    lane_mask = 1 + (1 << 14) + (1 << 28) + (1 << 42)
    ngroups = (nbits + 3) // 4
    packs = [
        F.sum(
            (
                F.shiftrightunsigned(F.col("_h"), 4 * g).bitwiseAND(F.lit(15))
                * F.lit(spread)
            ).bitwiseAND(F.lit(lane_mask))
        ).alias(f"s{g}")
        for g in range(ngroups)
    ]
    agg = hashed.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"), *packs)
    n = F.col("_n")
    bits = None
    for i in range(nbits):
        cnt = F.shiftrightunsigned(F.col(f"s{i // 4}"), 14 * (i % 4)).bitwiseAND(
            F.lit((1 << 14) - 1)
        )
        term = F.when(cnt * 2 > n, F.lit(bit_i(i))).otherwise(F.lit(0))
        bits = term if bits is None else bits.bitwiseOR(term)
    return agg.select(F.col(id_col), bits.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, max_hamming: int = 3, text_col: str = "text", id_col: str = "doc_id",
    max_bucket: int = 1000, hash_src: str = "xxhash64",
    tok: DataFrame | None = None,
    cap_bucket_prepass: bool = False,
    over_cap: str | None = None, ring_c: int = 2, star_k: int = 1,
    sig: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs with Hamming distance ≤ ``max_hamming``.

    Pigeonhole banding: split 64 bits into 4 × 16-bit keys (4 × 15 for
    the 60-bit md5 engine); any pair within Hamming 3 shares at least
    one key, so candidates come from equi-buckets — never an O(n²)
    cross join.  Pair expansion uses the same one-shuffle
    collect-per-bucket scheme as ``minhash_lsh_pairs`` (struct of
    id+simhash so the Hamming check runs in-row), with a generous
    bucket cap against degenerate band-key collisions.

    ``cap_bucket_prepass`` opts into the two-pass over-cap guard
    (count-only pre-aggregate + un-hinted anti-join ahead of the
    collect accumulator) — see ``minhash_lsh_pairs`` for the contract;
    it is a drop-only knob (pass ``over_cap="drop"`` with it); values
    are identical on both drop paths, default False keeps the
    single-shuffle plan.

    ``over_cap="ring"`` (r13; the DEFAULT since r14 — SCALE.md DESIGN
    note): over-cap buckets emit ring+star candidates (each doc vs
    its next ``ring_c`` bucket-neighbors by id, plus the bucket's min
    id) instead of nothing — same policy and plan shape as
    ``minhash_lsh_pairs``, with the simhash carried through the
    window so the Hamming verify still runs in-row.  Ring pairs face
    the SAME ``max_hamming`` filter as bucket pairs.

    ``sig`` (r16) injects a precomputed signature frame (``id_col``,
    ``simhash: long``) — the shared-cached-builder hook, same
    CONTRACT as ``cand``/``toks`` on minhash_dedup_pairs_verified: it
    must equal ``simhash(df, text_col, id_col, hash_src, tok=...)``
    under the SAME hash engine, e.g. ``queries_llmdata.doc_simhash``.
    Several registry queries band the same signature table under
    different bucket knobs; injecting the one cached table means the
    tokenize→hash→vote aggregation runs once per session, not once
    per query.  Bit-identical output either way (asserted in
    tests/test_dedup.py).
    """
    over_cap = _resolve_over_cap(over_cap, cap_bucket_prepass)
    _check_over_cap(over_cap, ring_c, cap_bucket_prepass, star_k)
    sh = sig if sig is not None else simhash(df, text_col, id_col, hash_src, tok=tok)
    part_bits = 15 if hash_src == "md5" else 16
    mask = (1 << part_bits) - 1
    parts = [
        F.shiftrightunsigned(F.col("simhash"), part_bits * p)
        .bitwiseAND(F.lit(mask))
        .alias("k")
        for p in range(4)
    ]
    banded = sh.select(
        id_col, "simhash",
        F.explode(F.array(*[F.struct(F.lit(p).alias("p"), parts[p]) for p in range(4)])).alias("b"),
    ).select(id_col, "simhash", "b.p", "b.k")
    ring = None
    if over_cap == "ring":
        # Shared ring+star topology with the simhash riding along as
        # the window payload, so Hamming verifies in-row (no re-join).
        banded, over_rows = _split_over_cap(banded, ["p", "k"], id_col, max_bucket)
        ring = _ring_pairs(
            over_rows, ["p", "k"], id_col, ring_c, payload="simhash",
            star_k=star_k,
        ).select(
            "id_a", "id_b",
            F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))).alias("hamming"),
        )
    elif cap_bucket_prepass:
        over = (
            banded.groupBy("p", "k")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_bucket)
            .select("p", "k")
        )
        banded = banded.join(over, ["p", "k"], "left_anti")
    bucketed = (
        banded.groupBy("p", "k")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(id_col).alias("id"), F.col("simhash").alias("sh")))
            ).alias("xs")
        )
        .filter((F.size("xs") >= 2) & (F.size("xs") <= max_bucket))
    )
    xs = F.col("xs")
    pairs = bucketed.select(
        F.explode(
            F.flatten(
                F.transform(
                    xs,
                    lambda x, i: F.transform(
                        F.slice(xs, i + 2, F.size(xs)),
                        lambda y: F.struct(
                            x["id"].alias("id_a"),
                            y["id"].alias("id_b"),
                            F.bit_count(x["sh"].bitwiseXOR(y["sh"])).alias("hamming"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b", "p.hamming")
    if ring is not None:
        pairs = pairs.unionByName(ring)
    return pairs.filter(F.col("hamming") <= max_hamming).distinct()
