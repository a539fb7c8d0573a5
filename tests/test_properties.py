"""Property-based tests (hypothesis) for the text/dedup kernels —
invariants that must hold on arbitrary input, not just fixtures."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

# Pure-python twins of the Catalyst expressions, asserted equivalent on
# a Spark sample in test_cross_checks below.


def py_normalize(s: str) -> str:
    s = s.lower()
    s = re.sub(r"[^a-z0-9 ]", " ", s)
    s = re.sub(r" +", " ", s)
    return s.strip()


def py_jaccard(a: str, b: str) -> float:
    # NOTE: split(" ") on an empty normal form yields {""} — the empty
    # token participates, so two empty documents are Jaccard-1 (exact
    # duplicates).  This matches Spark's F.split AND DuckDB's
    # string_split (the q32 oracle), so it is the engine's contract.
    ta, tb = set(py_normalize(a).split(" ")), set(py_normalize(b).split(" "))
    u = ta | tb
    return len(ta & tb) / len(u) if u else 0.0


texts = st.text(
    alphabet=st.characters(codec="utf-8", exclude_characters="\x00"), max_size=200
)


@settings(max_examples=300, deadline=None)
@given(texts)
def test_normalize_idempotent(s):
    once = py_normalize(s)
    assert py_normalize(once) == once
    assert not once.startswith(" ") and not once.endswith(" ")
    assert "  " not in once


@settings(max_examples=300, deadline=None)
@given(texts, texts)
def test_jaccard_bounds_and_symmetry(a, b):
    j = py_jaccard(a, b)
    assert 0.0 <= j <= 1.0
    assert py_jaccard(b, a) == j
    assert py_jaccard(a, a) == 1.0  # reflexive (empty docs included)


@settings(max_examples=50, deadline=None)
@given(st.lists(texts, min_size=1, max_size=8))
def test_python_twin_tracks_examples(xs):
    # sanity on the twin itself: normalization never invents non-empty
    # tokens outside [a-z0-9]+
    for s in xs:
        toks = [t for t in py_normalize(s).split(" ") if t]
        assert all(re.fullmatch(r"[a-z0-9]+", t) for t in toks)


def test_cross_check_python_twin_vs_catalyst(spark):
    """The python twin used by the property tests must agree with the
    Catalyst normalize/jaccard on a diverse Spark-evaluated sample."""
    from pyspark.sql import functions as F

    from flink_s3_read_write_spark.operators import dedup as D

    samples = [
        "", " ", "Hello,   World!", "ÜBER strasse", "a-b_c.d", "123  456",
        "tabs\tand\nnewlines", "!!!", "mixedCASE Text 42", "ünïcode tøkens",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    got = df.select(
        "t", D.normalize_text(F.col("t")).alias("n")
    ).collect()
    for r in got:
        assert r["n"] == py_normalize(r["t"]), r["t"]
    pairs = [(a, b) for a in samples[:5] for b in samples[:5]]
    pdf = spark.createDataFrame(pairs, "a string, b string")
    jac = pdf.select("a", "b", D.jaccard_tokens(F.col("a"), F.col("b")).alias("j")).collect()
    for r in jac:
        assert abs(r["j"] - py_jaccard(r["a"], r["b"])) < 1e-12


# --- CDC chunking python twin (operators/chunking.cdc_chunks) -----------

def py_cdc_chunks(tokens: list[str], modulus: int = 16) -> list[list[str]]:
    """Pure-python twin of the md5 token-hash boundary rule."""
    import hashlib

    chunks: list[list[str]] = []
    cur: list[str] = []
    for t in tokens:
        h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        boundary = h % modulus == 0
        # Spark counts the running sum of boundary flags INCLUSIVE of
        # the current row, so a boundary token STARTS a new chunk.
        if boundary and cur:
            chunks.append(cur)
            cur = []
        cur.append(t)
    if cur:
        chunks.append(cur)
    return chunks


word = st.text(alphabet="abcdefgh", min_size=1, max_size=6)


@settings(max_examples=300, deadline=None)
@given(st.lists(word, max_size=80))
def test_cdc_partition_properties(tokens):
    """Chunks partition the token stream (order-preserving, lossless),
    and a chunk boundary exists exactly before every boundary token
    that is not stream-initial."""
    import hashlib

    chunks = py_cdc_chunks(tokens)
    flat = [t for c in chunks for t in c]
    assert flat == tokens
    assert all(c for c in chunks)
    for ci, c in enumerate(chunks[1:], start=1):
        h = int(hashlib.md5(c[0].encode()).hexdigest()[:15], 16)
        assert h % 16 == 0, "every non-initial chunk starts at a boundary token"


@settings(max_examples=200, deadline=None)
@given(st.lists(word, min_size=1, max_size=60), st.lists(word, max_size=8))
def test_cdc_suffix_stability(tokens, prefix):
    """The CDC property: prepending tokens only perturbs chunks up to
    the first boundary AFTER the insertion point — every chunk of the
    original that starts at a boundary token reappears verbatim."""
    a = py_cdc_chunks(tokens)
    b = py_cdc_chunks(prefix + tokens)
    b_set = {tuple(c) for c in b}
    import hashlib

    for c in a:
        h = int(hashlib.md5(c[0].encode()).hexdigest()[:15], 16)
        if h % 16 == 0:  # boundary-started chunks re-sync by construction
            assert tuple(c) in b_set


def test_order_sensitive_queries_invariant_under_partitioning(spark, sf_dir):
    """The determinism-sensitive operators (global-window PPS sample,
    hash-rank sample, argmax mode, global top-k PMI) must return
    IDENTICAL values under different shuffle-partition counts — the
    property that makes them reproducible on a 1000-executor cluster.
    Runs each query at 2 and 17 shuffle partitions and compares the
    full canonicalized result."""
    from flink_s3_read_write_spark.queries import registry

    names = [
        "q198_pps_systematic_sample",
        "q193_deterministic_sample",
        "q194_mode_per_group",
        "q200_pmi_collocations",
    ]
    reg = registry()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for parts in ("2", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            for name in names:
                spark.catalog.clearCache()
                rows = reg[name].fn(spark, sf_dir).collect()
                canon = sorted(tuple(r) for r in rows)
                if name in results:
                    assert results[name] == canon, (name, parts)
                else:
                    results[name] = canon
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.catalog.clearCache()


# ---------------------------------------------------------------------------
# r09 properties: the claims behind this round's shared-builder rewires.
# ---------------------------------------------------------------------------


def py_h60(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def py_minhash_md5(shingles, num_perm: int = 8):
    """Pure-python twin of the md5-engine MinHash signature
    (dedup._md5_h60 % MH_PRIME, then Carter-Wegman affine mins)."""
    from flink_s3_read_write_spark.operators.dedup import MH_PRIME, mh_affine_consts

    a, b = mh_affine_consts(num_perm)
    hs = [py_h60(s) % MH_PRIME for s in shingles]
    if not hs:
        return [None] * num_perm
    return [min((a[j] * h + b[j]) % MH_PRIME for h in hs) for j in range(num_perm)]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(alphabet="abc ", min_size=1, max_size=12), max_size=30))
def test_minhash_invariant_under_set_dedup_and_reorder(shingles):
    """The r09 claim that lets minhash_candidates build signatures off
    the shared doc_shingle_sets SET table: MinHash over the raw shingle
    MULTISET equals MinHash over its distinct set, in any order (min of
    per-element hashes ignores duplicates and order)."""
    base = py_minhash_md5(shingles)
    assert py_minhash_md5(sorted(set(shingles))) == base
    assert py_minhash_md5(list(reversed(shingles))) == base


def py_prefix(tokens_by_doc):
    """Prefix sets per q195's rule: order each doc's distinct tokens by
    global (frequency, token) ascending, keep the first
    n - (4n+4)//5 + 1."""
    from collections import Counter

    freq = Counter(t for toks in tokens_by_doc.values() for t in toks)
    out = {}
    for d, toks in tokens_by_doc.items():
        n = len(toks)
        keep = n - (4 * n + 4) // 5 + 1
        ranked = sorted(toks, key=lambda t: (freq[t], t))
        out[d] = set(ranked[:keep])
    return out


@settings(max_examples=300, deadline=None)
@given(
    st.dictionaries(
        st.integers(0, 9),
        st.frozensets(st.integers(0, 25).map(lambda i: f"t{i}"), min_size=1, max_size=20),
        min_size=2,
        max_size=8,
    )
)
def test_prefix_filter_has_no_false_negatives(docs):
    """q195's correctness hinges on the prefix-filter theorem: any two
    sets with Jaccard >= 0.8 MUST share a token within their
    (f, tok)-ordered prefixes of length n - ceil(0.8 n) + 1 — the
    integer (4n+4)//5 arithmetic implements ceil(0.8 n) exactly.  A
    bound off by one would silently drop true pairs (zero-false-
    negative is the operator's whole contract vs MinHash)."""
    docs = {d: set(toks) for d, toks in docs.items()}
    pref = py_prefix(docs)
    ids = sorted(docs)
    for i, da in enumerate(ids):
        for db in ids[i + 1:]:
            a, b = docs[da], docs[db]
            inter, union = len(a & b), len(a | b)
            if union and 9 * inter >= 4 * (len(a) + len(b)):  # Jaccard >= 0.8
                assert pref[da] & pref[db], (sorted(a), sorted(b))
    # and ceil-correctness of the integer form itself
    for n in range(1, 200):
        import math

        assert (4 * n + 4) // 5 == math.ceil(0.8 * n)
