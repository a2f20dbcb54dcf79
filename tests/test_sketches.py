"""Bounded-memory sketch operators (operators/sketches.py): the
guarantees the registered queries build on but the sf-gate data is too
benign to exercise — Misra-Gries truncation under adversarial skew,
Bloom one-sidedness with planted members, bitmap boundedness."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mknssh_11_bigdata_spark.operators.sketches import (
    bloom_bit_positions,
    bloom_build,
    bloom_probe,
    heavy_hitters_exact,
    misra_gries_candidates,
)


def _skewed_items(n: int, seed: int) -> list[str]:
    """Zipf-ish skew over a domain much larger than any MG capacity
    used below, interleaved so heavy items span every partition."""
    rng = random.Random(seed)
    items = []
    for _ in range(n):
        r = rng.random()
        if r < 0.30:
            items.append("hh0")
        elif r < 0.45:
            items.append("hh1")
        elif r < 0.55:
            items.append("hh2")
        else:
            items.append(f"tail{rng.randrange(5000)}")
    return items


@pytest.mark.parametrize("capacity", [4, 8, 16])
def test_mg_candidates_bounded_and_retain_heavy(spark, capacity):
    items = _skewed_items(20000, seed=7)
    df = spark.createDataFrame(
        [(x,) for x in items], "item string"
    ).repartition(8)
    cand = misra_gries_candidates(df, "item", capacity)
    rows = cand.collect()
    # per-partition summaries are capacity-bounded
    per_part = (
        cand.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .count()
        .collect()
    )
    assert all(r["count"] <= capacity for r in per_part)
    # retention: every item with global count > n/(capacity+1) present
    n = len(items)
    exact: dict[str, int] = {}
    for x in items:
        exact[x] = exact.get(x, 0) + 1
    heavy = {x for x, c in exact.items() if c > n / (capacity + 1)}
    got = {r["item"] for r in rows}
    assert heavy <= got, heavy - got


def test_heavy_hitters_exact_matches_groundtruth(spark):
    items = _skewed_items(15000, seed=13)
    df = spark.createDataFrame([(x,) for x in items], "item string")
    capacity = 6
    out = {
        r["item"]: (r["n_occurrences"], r["share_ppm"])
        for r in heavy_hitters_exact(df, "item", capacity).collect()
    }
    n = len(items)
    thresh = n // capacity + 1
    exact: dict[str, int] = {}
    for x in items:
        exact[x] = exact.get(x, 0) + 1
    want = {
        x: (c, c * 1_000_000 // n)
        for x, c in exact.items()
        if c >= thresh
    }
    assert out == want
    assert want, "skew fixture must actually produce heavy hitters"


def test_mg_single_partition_worst_case_stream(spark):
    """Adversarial order: the heavy item arrives AFTER a flood of
    distinct tail items has saturated the summary — retention must
    still hold (the decrement budget, not luck, is the guarantee)."""
    tail = [f"t{i}" for i in range(3000)]
    items = tail + ["HH"] * 1200 + tail  # n=7200, HH share ~1/6
    df = spark.createDataFrame([(x,) for x in items], "item string").coalesce(1)
    cand = {r["item"] for r in misra_gries_candidates(df, "item", 5).collect()}
    # 1200 > 7200/6 = n/(capacity+1) => must be retained
    assert "HH" in cand


def test_bloom_no_false_negatives_with_planted_members(spark):
    known = [f"k{i}" for i in range(200)]
    probes = known + [f"other{i}" for i in range(2000)]
    m_bits, k = 16 * len(known) + 64, 2
    kdf = spark.createDataFrame([(x,) for x in known], "item string")
    bloom = bloom_build(kdf, "item", m_bits, k)
    pdf = spark.createDataFrame([(x,) for x in probes], "item string")
    flagged = {
        r["item"]: r["bloom_hit"]
        for r in bloom_probe(pdf, "item", bloom, m_bits, k).collect()
    }
    assert all(flagged[x] for x in known)  # one-sided: no false negatives
    fp = sum(1 for x in probes[len(known):] if flagged[x])
    # loose geometry (~1.4% design point): nonzero but small
    assert 0 < fp < 200


def test_bloom_bitmap_dense_positional_and_positions_in_range(spark):
    known = [f"k{i}" for i in range(500)]
    m_bits, k = 1024, 4
    kdf = spark.createDataFrame([(x,) for x in known], "item string")
    row = bloom_build(kdf, "item", m_bits, k).collect()[0]
    # dense POSITIONAL array (VERDICT r6 defect #1): exactly one slot
    # per 64-bit word, zero-filled, so the probe is O(1) element_at —
    # never a linear map-key scan
    arr = row["bloom_arr"]
    assert len(arr) == m_bits // 64
    assert all(isinstance(w, int) for w in arr)
    # word w of the dense array == bit_or of the sparse word frame
    from mknssh_11_bigdata_spark.operators.sketches import (
        bloom_word_frame,
    )

    sparse = {
        r["__word"]: r["__bits"]
        for r in bloom_word_frame(kdf, "item", m_bits, k).collect()
    }
    assert arr == [sparse.get(w, 0) for w in range(m_bits // 64)]
    pos = kdf.select(
        F.array(*bloom_bit_positions(F.col("item"), m_bits, k)).alias("p")
    ).collect()
    assert all(0 <= p < m_bits for r in pos for p in r["p"])


def test_kcenter_coreset_matches_numpy_greedy(spark):
    import numpy as np

    from mknssh_11_bigdata_spark.operators.similarity import (
        kcenter_coreset,
    )

    rng = np.random.default_rng(42)
    vecs = rng.normal(size=(120, 16)).round(3)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = [
        (r["round"], r["vec_id"], r["dist_micro"])
        for r in kcenter_coreset(df, "vec_id", "embedding", k=6)
        .orderBy("round")
        .collect()
    ]
    # numpy replay of the same contract (quantize before min/argmax)
    centers = [0]
    picked = [(0, 0, 0)]
    dq = None
    for rnd in range(1, 6):
        d2 = ((vecs - vecs[centers[-1]]) ** 2).sum(axis=1)
        q = np.round(d2 * 1_000_000).astype(np.int64)
        dq = q if dq is None else np.minimum(dq, q)
        cand = np.where(dq > 0)[0]
        best = cand[np.lexsort((cand, -dq[cand]))][0]
        picked.append((rnd, int(best), int(dq[best])))
        centers.append(int(best))
    assert got == picked
    # radius ladder non-increasing after the seed
    radii = [d for _, _, d in got[1:]]
    assert radii == sorted(radii, reverse=True)
    # selections distinct
    assert len({v for _, v, _ in got}) == len(got)


def test_kcenter_skips_exact_duplicates_and_stops_early(spark):
    from mknssh_11_bigdata_spark.operators.similarity import (
        kcenter_coreset,
    )

    # 3 distinct points, each duplicated: k=5 must stop at 3 picks and
    # never select a verbatim copy of an existing center
    pts = [[0.0, 0.0], [1.0, 0.0], [0.0, 2.0]]
    rows = [(i, pts[i % 3]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = kcenter_coreset(df, "vec_id", "embedding", k=5).collect()
    assert len(got) == 3
    ids = [r["vec_id"] for r in got]
    assert len(set(pts[i % 3][0] * 10 + pts[i % 3][1] for i in ids)) == 3


def test_weighted_sample_matches_numpy_replay(spark):
    import hashlib

    from mknssh_11_bigdata_spark.queries_curation import (
        weighted_sample_topk,
    )

    rows = [(i, 10.0 if i % 7 == 0 else 1.0) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = [
        (r["rank"], r["id"], r["key_nano"])
        for r in weighted_sample_topk(df, "id", "w", 25, salt="t1")
        .orderBy("rank")
        .collect()
    ]

    def key(i, w):
        h = int(hashlib.md5(f"t1|{i}".encode()).hexdigest()[:15], 16)
        import math

        return round(math.log((h + 1) / float(1 << 60)) / w * 1e9)

    keyed = sorted(
        ((key(i, w), i) for i, w in rows), key=lambda t: (-t[0], t[1])
    )
    want = [(r + 1, i, k) for r, (k, i) in enumerate(keyed[:25])]
    assert got == want


def test_weighted_sample_inclusion_proportional_to_weight():
    """E-S property, k=1: P(i wins) = w_i / sum(w). Two weight classes
    (10:1), replayed in pure python over 400 salts — the winner should
    come from the heavy class ~10x/(10x+y) of the time."""
    import hashlib
    import math

    heavy = [(i, 10.0) for i in range(20)]
    light = [(i, 1.0) for i in range(20, 220)]
    rows = heavy + light
    wins_heavy = 0
    for s in range(400):
        best = None
        for i, w in rows:
            h = int(hashlib.md5(f"s{s}|{i}".encode()).hexdigest()[:15], 16)
            k = math.log((h + 1) / float(1 << 60)) / w
            if best is None or k > best[0] or (k == best[0] and i < best[1]):
                best = (k, i, w)
        if best[2] == 10.0:
            wins_heavy += 1
    # expected share 200/(200+200) = 0.5; 400 trials => sd ~ 0.025
    assert 0.40 <= wins_heavy / 400 <= 0.60


def test_weighted_sample_fractional_weights_not_clamped(spark):
    """ADVICE r6 (low): fractional quality scores in (0,1] — the
    typical weighting input — must be used AS IS. The former silent
    GREATEST(w, 1.0) clamp collapsed every weight <= 1 to 1, degrading
    the draw to uniform sampling while the docstring claimed
    inclusion ∝ w. With honest fractional weights the 0.9-class must
    dominate the 0.09-class in the sample ~10:1 stochastically."""
    from mknssh_11_bigdata_spark.queries_curation import (
        weighted_sample_topk,
    )

    rows = [(i, 0.9 if i % 2 == 0 else 0.09) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = weighted_sample_topk(df, "id", "w", 100, salt="frac1").collect()
    n_heavy = sum(1 for r in got if r["id"] % 2 == 0)
    # clamped draw => both classes uniform => n_heavy ~ 50; honest
    # weights => ~ 2000/(0.9+0.09)*0.9... E-S gives heavy >> light
    assert n_heavy > 75, n_heavy


def test_weighted_sample_rejects_nonpositive_weights(spark):
    """Weights <= 0 (or NULL) are a contract violation, not a silent
    clamp: the draw must raise at execution time (ADVICE r6)."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from mknssh_11_bigdata_spark.queries_curation import (
        weighted_sample_topk,
    )

    for bad in (0.0, -1.0, None):
        rows = [(0, 1.0), (1, bad), (2, 2.0)]
        df = spark.createDataFrame(rows, "id long, w double")
        with pytest.raises((Py4JJavaError, Exception)) as ei:
            weighted_sample_topk(df, "id", "w", 3).collect()
        assert "weight must be > 0" in str(ei.value)


def test_bottom_k_values_merge_invariant_hypothesis(spark):
    """The KMV monitor's core claim, property-tested: bottom-k over
    distinct hashes is an associative, commutative set merge — for ANY
    multiset of (key, hash) rows and ANY partition of it into batches,
    re-reducing per-batch bottom-k states equals the bottom-k of the
    whole, and both equal the python model (sorted distinct, first k)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from mknssh_11_bigdata_spark.operators.sketches import (
        bottom_k_values,
    )

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        rows=st.lists(
            st.tuples(
                st.sampled_from(["a", "b"]),
                st.integers(min_value=-100, max_value=100),
            ),
            min_size=1,
            max_size=60,
        ),
        cut=st.integers(min_value=0, max_value=60),
        k=st.integers(min_value=1, max_value=7),
    )
    def run(rows, cut, k):
        cut = min(cut, len(rows))
        df_all = spark.createDataFrame(rows, "k string, h long")
        whole = bottom_k_values(df_all, "k", "h", k)
        got_whole = {}
        for r in whole.collect():
            got_whole.setdefault(r["k"], []).append(r["h"])
        # split into two batches, reduce each, merge, re-reduce
        parts = [rows[:cut], rows[cut:]]
        states = [
            bottom_k_values(
                spark.createDataFrame(p, "k string, h long"), "k", "h", k
            )
            for p in parts
            if p
        ]
        merged = states[0]
        for s in states[1:]:
            merged = merged.unionByName(s)
        rered = bottom_k_values(merged, "k", "h", k)
        got_merged = {}
        for r in rered.collect():
            got_merged.setdefault(r["k"], []).append(r["h"])
        # python model
        want = {}
        for key in {k0 for k0, _ in rows}:
            hs = sorted({h for k0, h in rows if k0 == key})[:k]
            want[key] = hs
        assert {k0: sorted(v) for k0, v in got_whole.items()} == want
        assert {k0: sorted(v) for k0, v in got_merged.items()} == want

    run()


# ---------------------------------------------------------------------------
# Count-Min sketch (round 8)
# ---------------------------------------------------------------------------


def test_cms_one_sided_and_geometry_bounded(spark):
    """Count-Min guarantees under adversarial skew: (1) the counter
    matrix never exceeds depth x width rows no matter the item domain;
    (2) every estimate >= the exact count (collisions only ADD — the
    one-sided error the query's overestimate audit column rests on);
    (3) the deliberately tight geometry actually collides (a vacuously
    exact run would certify nothing)."""
    from mknssh_11_bigdata_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    items = _skewed_items(20000, seed=11)
    df = spark.createDataFrame(
        [(x,) for x in items], "item string"
    ).repartition(8)
    depth, width = 4, 32
    sk = cms_build(df, "item", depth, width, "cms-test")
    assert sk.count() <= depth * width
    exact: dict[str, int] = {}
    for x in items:
        exact[x] = exact.get(x, 0) + 1
    uni = spark.createDataFrame(
        [(x,) for x in exact], "item string"
    )
    est = {
        r["item"]: r["cms_estimate"]
        for r in cms_estimate(
            uni, "item", sk, depth, width, "cms-test"
        ).collect()
    }
    assert set(est) == set(exact)
    assert all(est[x] >= exact[x] for x in exact)
    # 5000-item tail into 32 buckets MUST collide somewhere
    assert any(est[x] > exact[x] for x in exact)


def test_cms_sketches_merge_additively(spark):
    """The mergeable-summaries property the streaming twin rides:
    the sketch of A ++ B equals the CELL-WISE SUM of the sketches of A
    and B, bit-for-bit — counters are plain counts, so disjoint-batch
    sketches merge by aligned addition with no error growth beyond the
    union sketch's own."""
    from mknssh_11_bigdata_spark.operators.sketches import cms_build

    a = _skewed_items(3000, seed=3)
    b = _skewed_items(4000, seed=4)
    depth, width = 4, 16
    fa = spark.createDataFrame([(x,) for x in a], "item string")
    fb = spark.createDataFrame([(x,) for x in b], "item string")
    fu = spark.createDataFrame([(x,) for x in a + b], "item string")
    sa = cms_build(fa, "item", depth, width, "cms-merge")
    sb = cms_build(fb, "item", depth, width, "cms-merge")
    su = cms_build(fu, "item", depth, width, "cms-merge")
    merged = (
        sa.unionByName(sb)
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    as_rows = lambda df: sorted(  # noqa: E731
        (r["d"], r["bucket"], r["cnt"]) for r in df.collect()
    )
    assert as_rows(merged) == as_rows(su)


def test_cms_unseen_item_estimate_is_bucket_noise(spark):
    """Probing an item that was never inserted returns the collision
    mass of its buckets (>= 0, possibly 0 on a sparse sketch) — the
    coalesce-to-0 path for empty cells must not NULL out the min."""
    from mknssh_11_bigdata_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    df = spark.createDataFrame([("only",)], "item string")
    sk = cms_build(df, "item", 4, 1024, "cms-sparse")
    probe = spark.createDataFrame(
        [("never-seen-item",)], "item string"
    )
    rows = cms_estimate(
        probe, "item", sk, 4, 1024, "cms-sparse"
    ).collect()
    assert len(rows) == 1
    assert rows[0]["cms_estimate"] is not None
    assert rows[0]["cms_estimate"] >= 0


# ---------------------------------------------------------------------------
# Portable HyperLogLog (round 8)
# ---------------------------------------------------------------------------


def test_portable_hll_matches_pure_python_replay(spark):
    """The Spark expression chain (register slice, BIN-length rank,
    per-register MAX, integer harmonic fold, one-division estimate,
    linear-counting table) must implement the INTENDED algorithm — a
    pure-Python replay of the same spec on the same hashes, so a bug
    shared with the SQL oracle (both derived from the same expressions)
    cannot hide behind cross-engine agreement."""
    import hashlib

    from mknssh_11_bigdata_spark.queries_events import (
        HLL_M,
        HLL_SALT,
        _HLL_LC,
        _HLL_NUM,
        _HLL_RANK_CAP,
    )
    from mknssh_11_bigdata_spark.queries import QUERIES

    # python replay on the sf0.001 events table
    import duckdb

    con = duckdb.connect()
    uids = [
        r[0]
        for r in con.execute(
            "SELECT user_id FROM read_parquet("
            "'/root/testdata/sf0.001/events.parquet') "
            "WHERE event_type = 'click'"
        ).fetchall()
    ]
    regs: dict[int, int] = {}
    for u in uids:
        h = int(
            hashlib.md5(f"{HLL_SALT}|{u}".encode()).hexdigest()[:15], 16
        )
        reg = h % HLL_M
        rem = h // HLL_M
        rank = min(55 - len(bin(rem)[2:]) if rem else 50, _HLL_RANK_CAP)
        regs[reg] = max(regs.get(reg, 0), rank)
    s = sum(1 << (_HLL_RANK_CAP - m) for m in regs.values())
    v = HLL_M - len(regs)
    s_total = s + v * (1 << _HLL_RANK_CAP)
    raw = int(round(_HLL_NUM / s_total))
    expect = (
        _HLL_LC[v - 1] if (raw <= 5 * HLL_M // 2 and v > 0) else raw
    )
    row = [
        r
        for r in QUERIES["event_hll_distinct"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect()
        if r["event_type"] == "click"
    ][0]
    assert row["hll_estimate"] == expect
    assert row["n_empty_registers"] == v


def test_portable_hll_error_within_bound_on_synthetic_cardinalities(
    spark,
):
    """At cardinalities well past the linear-counting arm, the raw
    estimator must land within ~5 standard errors (5 * 1.04/sqrt(64) =
    65%) of truth — loose on purpose: this pins 'the estimator is
    wired correctly', not its statistical luck."""
    from mknssh_11_bigdata_spark.queries_events import (
        HLL_M,
        HLL_SALT,
        _HLL_NUM,
        _HLL_RANK_CAP,
    )
    import hashlib

    for n in (2000, 20000):
        regs: dict[int, int] = {}
        for i in range(n):
            h = int(
                hashlib.md5(f"{HLL_SALT}|u{i}".encode()).hexdigest()[
                    :15
                ],
                16,
            )
            reg, rem = h % HLL_M, h // HLL_M
            rank = min(
                55 - len(bin(rem)[2:]) if rem else 50, _HLL_RANK_CAP
            )
            regs[reg] = max(regs.get(reg, 0), rank)
        v = HLL_M - len(regs)
        s_total = sum(
            1 << (_HLL_RANK_CAP - m) for m in regs.values()
        ) + v * (1 << _HLL_RANK_CAP)
        raw = int(round(_HLL_NUM / s_total))
        assert abs(raw - n) / n < 0.65, (n, raw)


# ---------------------------------------------------------------------------
# Bottom-k uniform row sample / quantile sketch (round 8)
# ---------------------------------------------------------------------------


def test_bottom_k_sample_merge_invariant_and_exact_when_small(spark):
    """Bottom-k over rows is an associative multiset merge: sampling
    the whole stream equals merging per-slice samples, bit-for-bit —
    the property a streaming twin would ride. And a group with n <= k
    rows reports its ENTIRE value multiset (the sample is the group)."""
    from mknssh_11_bigdata_spark.operators.sketches import (
        bottom_k_sample,
        kmv_hash,
    )

    rng = random.Random(5)
    rows = [(f"k{i % 3}", i, rng.gauss(0, 1)) for i in range(9000)]
    df = spark.createDataFrame(
        rows, "key string, rid long, value double"
    ).repartition(8)
    base = df.select(
        "key", kmv_hash(F.col("rid"), "t").alias("h"), "value"
    )
    whole = bottom_k_sample(base, "key", "h", "value", 64)

    parts = [
        bottom_k_sample(
            base.filter(F.col("h") % 2 == i), "key", "h", "value", 64
        )
        for i in range(2)
    ]
    remerged = (
        parts[0]
        .unionByName(parts[1])
        .select("key", F.explode("sample").alias("value"))
        .join(base, ["key", "value"])  # recover hashes for re-reduce
        .select("key", "h", "value")
    )
    remerged = bottom_k_sample(remerged, "key", "h", "value", 64)

    def as_map(df_):
        return {
            r["key"]: (r["n_exact"], sorted(r["sample"]))
            for r in df_.collect()
        }

    wm, rm = as_map(whole), as_map(remerged)
    assert set(wm) == set(rm)
    for k in wm:
        assert wm[k][1] == rm[k][1], k  # identical sample multisets

    # n <= k: the sample IS the group
    tiny = spark.createDataFrame(
        [("a", i, float(i)) for i in range(10)],
        "key string, rid long, value double",
    )
    tb = tiny.select(
        "key", kmv_hash(F.col("rid"), "t").alias("h"), "value"
    )
    out = bottom_k_sample(tb, "key", "h", "value", 64).collect()[0]
    assert out["n_exact"] == 10
    assert sorted(out["sample"]) == [float(i) for i in range(10)]


def test_quantile_sketch_rank_error_within_bound(spark):
    """On a skewed (lognormal-ish) distribution the sample p-quantile's
    RANK in the full data must sit within ~5 standard errors of the
    target rank (5*sqrt(p(1-p)/k)) — pins that the sample is genuinely
    uniform under the portable hash and the order-statistic indexing
    is wired right, loose enough to not gamble on sampling luck."""
    import math

    from mknssh_11_bigdata_spark.operators.sketches import (
        bottom_k_sample,
        kmv_hash,
    )

    rng = random.Random(17)
    vals = [math.exp(rng.gauss(0, 2)) for _ in range(50000)]
    df = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate(vals)],
        "key string, rid long, value double",
    ).repartition(16)
    base = df.select(
        "key", kmv_hash(F.col("rid"), "q").alias("h"), "value"
    )
    k = 256
    sample = sorted(
        bottom_k_sample(base, "key", "h", "value", k).collect()[0][
            "sample"
        ]
    )
    svals = sorted(vals)
    n = len(svals)
    for p in (0.5, 0.9, 0.99):
        est = sample[math.ceil(p * k) - 1]
        # rank of est within the full data
        import bisect

        rank = bisect.bisect_right(svals, est) / n
        tol = 5 * math.sqrt(p * (1 - p) / k)
        assert abs(rank - p) <= tol, (p, rank, tol)


def test_bottom_k_rows_merge_invariant_and_matches_sample(spark):
    """Round 8: the ROW (state) form of the bottom-k sample — per-slice
    ``bottom_k_rows`` outputs union and re-reduce to the whole
    multiset's bottom-k WITHOUT the hash-recovery join the value form
    needs (that is its reason to exist), and projecting its values
    reproduces ``bottom_k_sample``'s sample exactly."""
    from mknssh_11_bigdata_spark.operators.sketches import (
        bottom_k_rows,
        bottom_k_sample,
        kmv_hash,
    )

    rng = random.Random(11)
    rows = [(f"k{i % 3}", i, rng.gauss(0, 1)) for i in range(9000)]
    df = spark.createDataFrame(
        rows, "key string, rid long, value double"
    ).repartition(8)
    base = df.select(
        "key", kmv_hash(F.col("rid"), "t").alias("h"), "value"
    )
    whole = bottom_k_rows(base, "key", "h", "value", 64)

    parts = [
        bottom_k_rows(
            base.filter(F.col("h") % 2 == i), "key", "h", "value", 64
        )
        for i in range(2)
    ]
    remerged = bottom_k_rows(
        parts[0].unionByName(parts[1]), "key", "h", "value", 64
    )

    def as_map(df_):
        out = {}
        for r in df_.collect():
            out.setdefault(r["key"], []).append((r["h"], r["value"]))
        return {k: sorted(v) for k, v in out.items()}

    wm, rm = as_map(whole), as_map(remerged)
    assert wm == rm
    assert all(len(v) == 64 for v in wm.values())

    # values projection == bottom_k_sample's sample multiset
    samp = {
        r["key"]: sorted(r["sample"])
        for r in bottom_k_sample(
            base, "key", "h", "value", 64
        ).collect()
    }
    assert {k: sorted(x[1] for x in v) for k, v in wm.items()} == samp


def test_kmv_overlap_planted_jaccard_within_bound(spark, tmp_path):
    """Round 8: KMV set-operation algebra on a PLANTED overlap — types
    A/B share exactly 5000 of 15000-user union (J = 1/3): the sketch
    Jaccard must land within 5 standard errors (5 * sqrt(J(1-J)/k))
    of truth, the union estimate within the usual KMV band, and the
    exact columns must be exact — pins that the estimator is genuinely
    informative, which the fixture parity rows (near-total overlap)
    cannot."""
    import math

    from mknssh_11_bigdata_spark.queries_events import (
        KMV_K,
        event_kmv_type_overlap,
    )

    rows = [("A", u, i) for i, u in enumerate(range(10000))] + [
        ("B", u, i + 10**6) for i, u in enumerate(range(5000, 15000))
    ]
    d = spark.createDataFrame(
        [
            (eid, f"2024-01-01 00:00:0{eid % 10 % 6}", u, t, 1.0, "{}")
            for t, u, eid in rows
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    d.coalesce(2).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = event_kmv_type_overlap(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["type_a"], r["type_b"]) == ("A", "B")
    assert r["n_exact_overlap"] == 5000
    assert r["n_exact_union"] == 15000
    assert abs(r["jaccard_exact"] - 1 / 3) < 1e-6
    se = math.sqrt((1 / 3) * (2 / 3) / KMV_K)
    assert abs(r["jaccard_est"] - 1 / 3) <= 5 * se, r["jaccard_est"]
    # union estimator: ~1/sqrt(k-1) relative error, 5-sigma slack
    assert abs(r["kmv_union_estimate"] - 15000) / 15000 <= 5 / math.sqrt(
        KMV_K - 1
    )
    # intersection estimate composes the two: give it the summed slack
    assert abs(r["kmv_overlap_estimate"] - 5000) / 5000 <= 0.75
