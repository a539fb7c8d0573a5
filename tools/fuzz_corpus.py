"""Seeded randomized differential corpus — the "fuzz tier" of the
oracle gate.

The driver's sf corpora are deterministic and benign: no duplicate
order totals, microsecond-unique event timestamps, no exact-duplicate
documents outside the planted sets.  Queries can pass on such data
while carrying latent tie-break or boundary bugs (a top-k whose
ordering is only total BECAUSE revenues never collide, a window
ordered by a timestamp that never repeats).  This tool generates a
schema- and domain-faithful corpus whose randomness is ADVERSARIAL on
exactly those axes:

  * ties by construction — order totals snapped to whole hundreds,
    event timestamps drawn partly from a coarse 1-second grid,
    duplicate embedding vectors, exact- and near-duplicate documents;
  * boundary values — zero discounts, negative account balances and
    event values, 1-line and 6-line orders, whale users;
  * valid FKs and the exact categorical domains of the driver data
    (every o_custkey resolves, event_type/lang/priority/... drawn
    from the same value sets), so query PRECONDITIONS hold and any
    mismatch is a real engine/oracle divergence, not corpus abuse.

The output dir is a drop-in --sf for tools/check.py, so one seed is a
full 207-query differential run:

    python tools/fuzz_corpus.py --seed 7 --out /tmp/spark_graft_fuzz7
    python tools/check.py --sf /tmp/spark_graft_fuzz7

Pure Python + pyarrow (no JVM): schemas are pinned to the driver
parquet types (INT32 region/nation keys, FLOAT[] embeddings,
TIMESTAMP micros).
"""

from __future__ import annotations

import argparse
import datetime as dt
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

MKTSEG = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITY = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPE = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ETYPE = ["view", "click", "purchase", "signup", "error"]
LANG = ["en", "de", "fr", "es", "zh"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
ADJ = ["small", "red", "blue", "green", "large", "shiny", "plain", "odd"]
NOUN = ["ring", "widget", "bolt", "gear", "plate", "cog", "pin", "rod"]
WORDS = ("key agg row scan slow fast table value part hash merge batch "
         "spark order data column join small line customer query big the "
         "a sort window group stream filter").split()

SIZES = {"customer": 200, "supplier": 20, "part": 250, "orders": 1600,
         "events": 1500, "documents": 120, "embeddings": 120}

# Numerators u (odd, coprime to 5) for which u/5120 is a
# 10-digit-terminating decimal ending in 5 AND the engines' round
# paths were probed to DISAGREE (Spark shortest-repr HALF_UP rounds
# up, DuckDB's binary-double round lands below) — the non-dyadic
# 9-dp half-boundary family the --snap-groups knob plants.
_DIVERGENT_U = (163841, 163851, 163861, 163871, 163881)


def _write(out: str, name: str, cols: dict, schema: pa.Schema) -> None:
    pq.write_table(pa.table(cols, schema=schema),
                   os.path.join(out, f"{name}.parquet"))


def build(out: str, seed: int, scale: int = 1,
          degen_cluster: int = 0, degen_scatter: bool = False,
          two_family: bool = False, snap_groups: int = 0,
          tie_grid: int = 0) -> None:
    """``scale`` multiplies every fact-table row count (dims and the
    planted-duplicate counts stay fixed) — the same fact-grows-
    faster-than-dim shape as the scale_stress replica, here with
    fresh random rows rather than replication, so groups get DEEPER
    tie structure instead of exact copies.

    ``degen_cluster`` (r14) appends that many EXTRA documents all
    sharing one fixed text — a degenerate duplicate cluster whose LSH
    band buckets blow past the production caps (50 for MinHash, 1000
    for SimHash when > 1000), so the over-cap ring+star policy and
    its window-lead oracle replay EXECUTE at the production knobs
    instead of only under the forced max_bucket=2 gate entries.

    ``degen_scatter`` (r14, VERDICT item 6) makes the ID AXIS of the
    cluster adversarial instead of a contiguous tail block:
    - doc_ids become gappy (random 1..996 increments, so lead/star
      arithmetic can never lean on id adjacency), and
    - the clone docs interleave with normal docs — one clustered run
      of positions plus scattered singles — so inside each over-cap
      bucket the ring's id-ordered window walks a mix of clone and
      stray rows, stressing the lead/first_value frame logic the
      contiguous corpora only brush (plus SimHash payload ties: every
      clone shares the identical simhash payload through the window).

    ``two_family`` (r15, VERDICT r14 item 2) appends TWO interleaved
    clone families that deterministically share an LSH band bucket
    under q211/q212's 16x1 banding: family A = 7 clones of a 12-word
    text, family B = 4 clones of a text sharing A's first 4 words
    (shared shingles "key agg row" / "agg row scan" co-min on bands 5
    and 13 of the md5 affine family — fixed texts, so this is
    hash-deterministic, not seed luck).  Ids interleave A B A A B A A
    B A A B, so in the shared over-cap bucket the global min is an A
    clone, the 2nd-smallest id is B's first clone, and every B sits
    >= 3 positions from the next B — star_k=1 emits no (B_first, B_j)
    or far (B_first, A_j) edges from THIS bucket (its star goes to
    A's min; B-B connectivity still exists via B-only buckets), while
    star_k=2's nth_value branch emits the second family's hub edges.
    Token Jaccard across families is 4/20 = 0.2 < 1/2, so the verify
    stage keeps the two clusters separate in the keep-list composite.

    ``snap_groups`` (r16, VERDICT r15 item 3) probes the documented
    cross-engine round(double, 9) half-boundary bound AT its own
    boundary (SCALE.md r15: "a 9-dp half boundary needs ... a group of
    >= 4096 rows with specific numerator parity — impossible on the
    gate and fuzz corpora").  With snap_groups = N (a power of two,
    >= 1024; the documented regime is 4096), the two reachable
    mean-of-exact-sums sites get groups engineered to land EXACTLY on
    the boundary:
    - lineitem: returnflag 'A' padded to N rows whose integer
      quantities sum to N*u/1024 with u ODD, so q88's
      mean_qty = u/1024 — a binary-exact double whose decimal
      expansion terminates at digit 10 with a 5, i.e. the exact 9-dp
      half boundary (Spark HALF_UP on the shortest repr vs DuckDB on
      the binary double — the q183 divergence class);
    - events: the 'purchase' / even-user stratum (q166's variant A)
      padded to N rows of 3-dp values summing to an integer-dollar
      total with mean u'/1024, u' odd — same boundary through the
      DECIMAL(20,6) cast path.
    The count-FRACTION sites (q179/q181-class, n_obs/n_total) stay
    un-planted here, but NOT because they are unreachable — a probe
    found 1092 divergent boundaries in the u/(2^10*5^k) fraction
    family (any group count divisible by 5120 with the right
    numerator residue reaches them), which is why the r16 second
    wave moved every such site to exact integer HALF_UP
    (functions/numeric.round9_exact); the helper's property test
    covers the divergent family directly, so a corpus plant per site
    would be redundant.  Padded rows keep valid FKs (existing
    orderkeys / user domain) and in-domain values.

    ``tie_grid`` (r16, VERDICT r15 item 2 — fuzz attention for the
    rank/weight-boundary tail family: rank-exact percentiles q185/
    q175, weighted-median crossings q186, mode ties q194, KS steps
    q188, RFM quintiles q196, PPS pointer algebra q198): when K > 0,
    the corpus floods exact-tie plateaus across every rank boundary —
    events.value drawn from a K-value grid (vs ~continuous), order
    totals snapped to whole hundreds at 80% (vs 30%), and event
    timestamps on the 1-second grid at 70% (vs 30%), so duplicate
    latencies, duplicate weights and duplicate prices sit ON the
    crossing/percentile boundaries where lower-median selection,
    2*cw >= tw cross-multiplication and rank-vs-interpolation
    semantics actually diverge between naive engines.
    """
    rng = random.Random(seed)
    os.makedirs(out, exist_ok=True)

    _write(out, "region",
           {"r_regionkey": list(range(5)), "r_name": REGIONS},
           pa.schema([("r_regionkey", pa.int32()), ("r_name", pa.string())]))
    _write(out, "nation",
           {"n_nationkey": list(range(25)),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": [i % 5 for i in range(25)]},
           pa.schema([("n_nationkey", pa.int32()), ("n_name", pa.string()),
                      ("n_regionkey", pa.int32())]))

    sizes = {k: v * (scale if k in ("orders", "events", "documents", "embeddings") else 1) for k, v in SIZES.items()}
    nc = sizes["customer"]
    _write(out, "customer",
           {"c_custkey": list(range(nc)),
            "c_name": [f"Customer#{i:09d}" for i in range(nc)],
            "c_nationkey": [rng.randrange(25) for _ in range(nc)],
            # negative balances by design (boundary axis)
            "c_acctbal": [round(rng.uniform(-999.99, 9999.99), 2)
                          for _ in range(nc)],
            "c_mktsegment": [rng.choice(MKTSEG) for _ in range(nc)]},
           pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string()),
                      ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
                      ("c_mktsegment", pa.string())]))

    ns = sizes["supplier"]
    _write(out, "supplier",
           {"s_suppkey": list(range(ns)),
            "s_name": [f"Supplier#{i:09d}" for i in range(ns)],
            "s_nationkey": [rng.randrange(25) for _ in range(ns)],
            "s_acctbal": [round(rng.uniform(-999.99, 9999.99), 2)
                          for _ in range(ns)]},
           pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string()),
                      ("s_nationkey", pa.int32()),
                      ("s_acctbal", pa.float64())]))

    np_ = sizes["part"]
    _write(out, "part",
           {"p_partkey": list(range(np_)),
            "p_name": [f"{rng.choice(ADJ)} {rng.choice(NOUN)}"
                       for _ in range(np_)],
            "p_brand": [f"Brand#{rng.randrange(1, 26)}" for _ in range(np_)],
            "p_type": [rng.choice(PTYPE) for _ in range(np_)],
            "p_size": [rng.randrange(1, 51) for _ in range(np_)],
            "p_retailprice": [round(rng.uniform(100, 2000), 2)
                              for _ in range(np_)]},
           pa.schema([("p_partkey", pa.int64()), ("p_name", pa.string()),
                      ("p_brand", pa.string()), ("p_type", pa.string()),
                      ("p_size", pa.int32()),
                      ("p_retailprice", pa.float64())]))

    # orders: tie-rich totals (30% snapped to whole hundreds) and
    # tie-rich dates (a ~370-distinct-day pool over the real range,
    # sampled with replacement).
    no = sizes["orders"]
    day0 = dt.datetime(1995, 1, 1)
    days = [day0 + dt.timedelta(days=rng.randrange(0, 2400))
            for _ in range(400)]
    o_date = [rng.choice(days) for _ in range(no)]
    snap_p = 0.8 if tie_grid else 0.3
    o_total = [float(rng.randrange(1, 500) * 100) if rng.random() < snap_p
               else round(rng.uniform(100.0, 50000.0), 2)
               for _ in range(no)]
    _write(out, "orders",
           {"o_orderkey": list(range(no)),
            "o_custkey": [rng.randrange(nc) for _ in range(no)],
            "o_orderstatus": [rng.choice("FFOOP") for _ in range(no)],
            "o_totalprice": o_total,
            "o_orderdate": o_date,
            "o_orderpriority": [rng.choice(PRIORITY) for _ in range(no)]},
           pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
                      ("o_orderstatus", pa.string()),
                      ("o_totalprice", pa.float64()),
                      ("o_orderdate", pa.timestamp("us")),
                      ("o_orderpriority", pa.string())]))

    li = {k: [] for k in ("l_orderkey", "l_partkey", "l_suppkey",
                          "l_linenumber", "l_quantity", "l_extendedprice",
                          "l_discount", "l_tax", "l_returnflag",
                          "l_linestatus", "l_shipdate")}
    for ok in range(no):
        for ln in range(1, rng.randrange(1, 7) + 1):
            qty = float(rng.randrange(1, 51))
            li["l_orderkey"].append(ok)
            li["l_partkey"].append(rng.randrange(np_))
            li["l_suppkey"].append(rng.randrange(ns))
            li["l_linenumber"].append(ln)
            li["l_quantity"].append(qty)
            li["l_extendedprice"].append(round(qty * rng.uniform(9, 99), 2))
            li["l_discount"].append(rng.randrange(0, 11) / 100.0)  # incl 0
            li["l_tax"].append(rng.randrange(0, 9) / 100.0)
            li["l_returnflag"].append(rng.choice("ANR"))
            li["l_linestatus"].append(rng.choice("OF"))
            li["l_shipdate"].append(
                o_date[ok] + dt.timedelta(days=rng.randrange(1, 121)))
    if snap_groups:
        N = snap_groups
        if N < 1024 or (N & (N - 1)):
            raise ValueError("snap_groups must be a power of two >= 1024")
        # q88 regime: pad returnflag 'A' to exactly n_tgt (a multiple
        # of N) rows whose INTEGER quantity sum is (n_tgt/1024)*u with
        # u odd -> mean_qty == u/1024, a binary-exact double on the
        # exact 9-dp half boundary.
        n_a = sum(1 for f in li["l_returnflag"] if f == "A")
        s_a = int(sum(q for q, f in zip(li["l_quantity"],
                                        li["l_returnflag"]) if f == "A"))
        n_tgt = ((n_a + 128) // N + 1) * N
        d_n = n_tgt - n_a
        # u odd, padded-row mean (d_s/d_n) inside the [1, 50] domain
        u = (round((s_a + 25 * d_n) * 1024 / n_tgt)) | 1
        while True:
            d_s = (n_tgt // 1024) * u - s_a
            if d_n <= d_s <= 49 * d_n:
                break
            u += 2 if d_s < d_n else -2
        base, rem = divmod(d_s, d_n)
        # per-order next linenumber for the FK-valid pad targets
        pad_keys = list(range(min(no, 200)))
        next_ln = {ok: 1 + sum(1 for k in li["l_orderkey"] if k == ok)
                   for ok in pad_keys}
        for i in range(d_n):
            ok = pad_keys[i % len(pad_keys)]
            qty = float(base + (1 if i < rem else 0))
            li["l_orderkey"].append(ok)
            li["l_partkey"].append(rng.randrange(np_))
            li["l_suppkey"].append(rng.randrange(ns))
            li["l_linenumber"].append(next_ln[ok])
            next_ln[ok] += 1
            li["l_quantity"].append(qty)
            li["l_extendedprice"].append(round(qty * rng.uniform(9, 99), 2))
            li["l_discount"].append(rng.randrange(0, 11) / 100.0)
            li["l_tax"].append(rng.randrange(0, 9) / 100.0)
            li["l_returnflag"].append("A")
            li["l_linestatus"].append(rng.choice("OF"))
            li["l_shipdate"].append(
                o_date[ok] + dt.timedelta(days=rng.randrange(1, 121)))
        assert sum(1 for f in li["l_returnflag"] if f == "A") == n_tgt
        assert int(sum(q for q, f in zip(li["l_quantity"],
                                         li["l_returnflag"])
                       if f == "A")) == (n_tgt // 1024) * u and u % 2 == 1
        # NON-DYADIC regime (the one that actually diverges): pad
        # returnflag 'R' to a multiple of 5*1024 rows with quantity
        # sum (n/5120)*u', u' from the VERIFIED-divergent family —
        # u'/5120 is a 10-digit-terminating decimal ending in 5 whose
        # value is NOT a dyadic rational, so the double sits off the
        # true boundary and Spark's shortest-repr HALF_UP disagrees
        # with DuckDB's binary-double round (probed: 163841/5120 ->
        # .000195313 vs .000195312).  This is the regime the r15
        # SCALE.md bound declared unreachable; planting it forced the
        # q88/q166 exact-integer mean fix.
        u_nd = _DIVERGENT_U[rng.randrange(len(_DIVERGENT_U))]
        n_r = sum(1 for f in li["l_returnflag"] if f == "R")
        s_r = int(sum(q for q, f in zip(li["l_quantity"],
                                        li["l_returnflag"]) if f == "R"))
        nd = 5 * 1024
        # headroom so the padded rows' mean (d_s/d_n) stays <= 50
        lo = max(n_r + 128, (50 * n_r - s_r) // 18 + 1)
        n_tgt = ((lo + nd - 1) // nd) * nd
        d_n = n_tgt - n_r
        d_s = (n_tgt // nd) * u_nd - s_r
        assert d_n <= d_s <= 50 * d_n, (n_r, s_r, n_tgt, d_s)
        base, rem = divmod(d_s, d_n)
        for i in range(d_n):
            ok = pad_keys[i % len(pad_keys)]
            qty = float(base + (1 if i < rem else 0))
            li["l_orderkey"].append(ok)
            li["l_partkey"].append(rng.randrange(np_))
            li["l_suppkey"].append(rng.randrange(ns))
            li["l_linenumber"].append(next_ln[ok])
            next_ln[ok] += 1
            li["l_quantity"].append(qty)
            li["l_extendedprice"].append(round(qty * rng.uniform(9, 99), 2))
            li["l_discount"].append(rng.randrange(0, 11) / 100.0)
            li["l_tax"].append(rng.randrange(0, 9) / 100.0)
            li["l_returnflag"].append("R")
            li["l_linestatus"].append(rng.choice("OF"))
            li["l_shipdate"].append(
                o_date[ok] + dt.timedelta(days=rng.randrange(1, 121)))
        assert sum(1 for f in li["l_returnflag"] if f == "R") == n_tgt
    _write(out, "lineitem", li,
           pa.schema([("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
                      ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
                      ("l_quantity", pa.float64()),
                      ("l_extendedprice", pa.float64()),
                      ("l_discount", pa.float64()), ("l_tax", pa.float64()),
                      ("l_returnflag", pa.string()),
                      ("l_linestatus", pa.string()),
                      ("l_shipdate", pa.timestamp("us"))]))

    # events: whale users (zipf-ish pick over 40 users) and timestamp
    # TIES (30% drawn from a coarse 1-second grid).
    ne = sizes["events"]
    t0 = dt.datetime(2024, 1, 1)
    users = [rng.randrange(1 + min(39, int(rng.expovariate(0.12))))
             for _ in range(ne)]
    grid_p = 0.7 if tie_grid else 0.3
    ts = [t0 + (dt.timedelta(seconds=rng.randrange(0, 5000))
                if rng.random() < grid_p else
                dt.timedelta(seconds=rng.uniform(0, 2_592_000)))
          for _ in range(ne)]
    etypes = [rng.choice(ETYPE) for _ in range(ne)]
    if tie_grid:
        # K-value grid spanning the same [-10, 100] domain: plateaus
        # of duplicate values cross every rank boundary.
        values = [round(-10 + rng.randrange(tie_grid) * 110.0
                        / max(1, tie_grid - 1), 3)
                  for _ in range(ne)]
    else:
        values = [round(rng.uniform(-10, 100), 3) for _ in range(ne)]
    if snap_groups:
        N = snap_groups
        # q166 regime: pad the 'purchase' / even-user stratum
        # (variant A) to n_tgt rows whose 3-dp values sum to the
        # integer-dollar total (n_tgt/1024)*u', u' odd ->
        # mean_a == u'/1024, the same exact 9-dp half boundary
        # through the DECIMAL(20,6) cast path.
        n_a = sum(1 for uid, et in zip(users, etypes)
                  if et == "purchase" and uid % 2 == 0)
        s_a = sum(round(v * 1000) for uid, et, v in zip(users, etypes, values)
                  if et == "purchase" and uid % 2 == 0)  # exact millis
        n_tgt = ((n_a + 128) // N + 1) * N
        d_n = n_tgt - n_a
        # u' odd, padded-row milli mean inside the [-10000, 100000]
        # value domain
        u = (round((s_a / 1000 + 45 * d_n) * 1024 / n_tgt)) | 1
        while True:
            d_s = 1000 * (n_tgt // 1024) * u - s_a
            if -9999 * d_n <= d_s <= 99999 * d_n:
                break
            u += 2 if d_s < -9999 * d_n else -2
        base, rem = divmod(d_s, d_n)
        for i in range(d_n):
            milli = base + (1 if i < rem else 0)
            users.append(2 * rng.randrange(20))  # even: variant A
            ts.append(t0 + dt.timedelta(seconds=rng.uniform(0, 2_592_000)))
            etypes.append("purchase")
            values.append(milli / 1000.0)
        ne += d_n
        assert sum(1 for uid, et in zip(users, etypes)
                   if et == "purchase" and uid % 2 == 0) == n_tgt
        assert sum(round(v * 1000) for uid, et, v in
                   zip(users, etypes, values)
                   if et == "purchase" and uid % 2 == 0) \
            == 1000 * (n_tgt // 1024) * u and u % 2 == 1
        # NON-DYADIC regime for the ODD-user stratum (q166's
        # variant B): pad to a multiple of 5120 rows of 3-dp values
        # whose milli sum is 1000*(n/5120)*u' — the dollar sum is the
        # exact integer (n/5120)*u', so mean_b computes the same
        # divergent double u'/5120 the lineitem plant exercises.
        u_nd = _DIVERGENT_U[rng.randrange(len(_DIVERGENT_U))]
        n_b = sum(1 for uid, et in zip(users, etypes)
                  if et == "purchase" and uid % 2 == 1)
        s_b = sum(round(v * 1000) for uid, et, v in
                  zip(users, etypes, values)
                  if et == "purchase" and uid % 2 == 1)
        nd = 5 * 1024
        n_tgt = ((n_b + 128 + nd - 1) // nd) * nd
        d_n = n_tgt - n_b
        d_s = 1000 * (n_tgt // nd) * u_nd - s_b
        assert -9999 * d_n <= d_s <= 99999 * d_n, (n_b, s_b, n_tgt, d_s)
        base, rem = divmod(d_s, d_n)
        for i in range(d_n):
            milli = base + (1 if i < rem else 0)
            users.append(2 * rng.randrange(19) + 1)  # odd: variant B
            ts.append(t0 + dt.timedelta(seconds=rng.uniform(0, 2_592_000)))
            etypes.append("purchase")
            values.append(milli / 1000.0)
        ne += d_n
        assert sum(1 for uid, et in zip(users, etypes)
                   if et == "purchase" and uid % 2 == 1) == n_tgt
    _write(out, "events",
           {"event_id": list(range(ne)),
            "ts": ts,
            "user_id": users,
            "event_type": etypes,
            "value": values,
            "props": ['{"k": %d}' % rng.randrange(100) for _ in range(ne)]},
           pa.schema([("event_id", pa.int64()), ("ts", pa.timestamp("us")),
                      ("user_id", pa.int64()), ("event_type", pa.string()),
                      ("value", pa.float64()), ("props", pa.string())]))

    # documents: planted exact duplicates (6 pairs) and near-duplicates
    # (6 pairs, one word substituted) atop random texts.
    nd = sizes["documents"]
    texts = [" ".join(rng.choice(WORDS)
                      for _ in range(rng.randrange(20, 81)))
             for _ in range(nd)]
    for i in range(6):
        texts[nd - 1 - i] = texts[i]                    # exact dup
    for i in range(6, 12):
        w = texts[i].split()
        j = rng.randrange(len(w))
        # substitute with a DIFFERENT word, else ~1/26 of the "near"
        # pairs would silently be byte-identical and blur the
        # exact-dedup vs near-dedup family distinction
        w[j] = rng.choice([x for x in WORDS if x != w[j]])
        texts[nd - 1 - i] = " ".join(w)                 # near dup
    doc_ids = None
    if degen_cluster:
        # One fixed 12-word text (shingleable: >= 3 words), repeated —
        # every band bucket of the cluster has degen_cluster members.
        clone_text = " ".join(WORDS[i % len(WORDS)] for i in range(12))
        if degen_scatter:
            total = nd + degen_cluster
            # clone positions: one clustered run + scattered singles
            positions = set(range(5, 5 + max(1, degen_cluster // 3)))
            while len(positions) < degen_cluster:
                positions.add(rng.randrange(total))
            normal = iter(texts)
            texts = [clone_text if p in positions else next(normal)
                     for p in range(total)]
            # gappy non-contiguous ids: random 1..996 increments
            doc_ids, cur = [], 0
            for _ in range(total):
                cur += rng.randrange(1, 997)
                doc_ids.append(cur)
            nd = total
        else:
            texts += [clone_text] * degen_cluster
            nd += degen_cluster
    if two_family:
        fam_a = " ".join(WORDS[:12])
        fam_b = " ".join(WORDS[:4] + WORDS[12:20])
        # positions 1, 4, 7, 10 of the 11-doc tail block are family B
        texts += [fam_b if p in (1, 4, 7, 10) else fam_a
                  for p in range(11)]
        nd += 11
        if doc_ids is not None:
            # composing with degen_scatter: ids are already gappy —
            # keep the planted tail on the same gappy axis (still
            # strictly increasing, so the A-B interleave order holds)
            cur = doc_ids[-1]
            for _ in range(11):
                cur += rng.randrange(1, 997)
                doc_ids.append(cur)
    if doc_ids is None:
        doc_ids = list(range(nd))
    _write(out, "documents",
           {"doc_id": doc_ids,
            "text": texts,
            "lang": [rng.choice(LANG) for _ in range(nd)],
            "source": [f"src{rng.randrange(20)}" for _ in range(nd)],
            "n_chars": [len(t) for t in texts]},
           pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                      ("lang", pa.string()), ("source", pa.string()),
                      ("n_chars", pa.int64())]))

    # embeddings: 64-dim, 4 planted exact-duplicate vectors.
    nv = sizes["embeddings"]
    vecs = [[round(rng.uniform(-1, 1), 4) for _ in range(64)]
            for _ in range(nv)]
    for i in range(4):
        vecs[nv - 1 - i] = list(vecs[8 + i])
    _write(out, "embeddings",
           {"vec_id": list(range(nv)),
            "embedding": vecs,
            "label": [rng.randrange(10) for _ in range(nv)]},
           pa.schema([("vec_id", pa.int64()),
                      ("embedding", pa.list_(pa.float32())),
                      ("label", pa.int32())]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--scale", type=int, default=1,
                    help="multiply fact-table sizes (dims fixed) for "
                         "deeper per-group tie structure")
    ap.add_argument("--degen-cluster", type=int, default=0,
                    help="append N identical documents (one degenerate "
                         "LSH cluster) so production over-cap ring "
                         "policies execute (see build())")
    ap.add_argument("--degen-scatter", action="store_true",
                    help="adversarial id axis for the degenerate "
                         "cluster: gappy doc_ids, clones interleaved "
                         "with normal docs (see build())")
    ap.add_argument("--two-family", action="store_true",
                    help="append two interleaved clone families that "
                         "share one LSH bucket under 16x1 banding "
                         "(the star_k=2 scenario; see build())")
    ap.add_argument("--snap-groups", type=int, default=0,
                    help="plant N-row groups (N a power of two >= "
                         "1024; the documented regime is 4096) whose "
                         "exact means land on the 9-dp half boundary "
                         "u/1024 — probes the round(double, 9) "
                         "cross-engine class at its own boundary "
                         "(see build())")
    ap.add_argument("--tie-grid", type=int, default=0,
                    help="draw events.value from a K-value grid and "
                         "raise the snapped-total/gridded-timestamp "
                         "rates so exact-tie plateaus cross every "
                         "rank/weight boundary (the percentile/"
                         "weighted-median/PPS tail regime; see "
                         "build())")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or f"/tmp/spark_graft_fuzz{args.seed}"
    build(out, args.seed, scale=args.scale, degen_cluster=args.degen_cluster,
          degen_scatter=args.degen_scatter, two_family=args.two_family,
          snap_groups=args.snap_groups, tie_grid=args.tie_grid)
    print(f"fuzz_corpus: seed={args.seed} scale={args.scale} "
          f"degen_cluster={args.degen_cluster} "
          f"degen_scatter={args.degen_scatter} "
          f"two_family={args.two_family} "
          f"snap_groups={args.snap_groups} "
          f"tie_grid={args.tie_grid} written to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
