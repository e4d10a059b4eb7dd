"""Distributed, mergeable sketches — engine-portable by construction.

At 100 TB, exact `countDistinct`/heavy-hitter queries shuffle the full key
relation; sketches answer them in one pass with fixed memory per group and
counters that MERGE across partitions/days (map-side combine does the
merging for free). The reference has no sketch support (its stats are
pandas exacts, e.g. `/root/reference/src/lakehouse/quality/metrics/
distribution.py`); these fill the gap the 100 TB setting creates.

Unlike Spark's built-in `approx_count_distinct`/`approx_percentile`
(engine-private algorithms a DuckDB oracle cannot reproduce), both
sketches here derive every hash from md5 and keep all accumulation in
exact integer arithmetic, so the full sketch state — and the estimates
computed from it — are reproducible cross-engine and sit behind the same
value-hash correctness gate as every exact operator:

- **Count-min sketch** (Cormode & Muthukrishnan 2005): d independent
  md5-derived hash rows × w counters; count estimate = min over rows.
  Overestimates only; additive error ≤ e/w · N with prob 1-e^-d.
- **HyperLogLog** (Flajolet et al. 2007): m=2^b registers indexed by the
  top b bits of a 32-bit md5 prefix; register = max leading-zero rank of
  the remaining bits. The harmonic sum Σ2^-M[j] is carried as the exact
  integer Σ2^(R_MAX-M[j]) (a long — order-free, no float accumulation),
  with the standard small-range linear-counting correction.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

__all__ = [
    "cms_sketch",
    "cms_estimate",
    "cms_topk",
    "hll_registers",
    "hll_cardinality",
    "hll_estimate_from_registers",
    "histogram_sketch",
    "histogram_quantiles",
    "bloom_build",
    "bloom_probe",
    "bloom_fpr",
    "kmv_sketch",
    "kmv_intersection",
    "HIST_BINS",
    "CMS_DEPTH",
    "CMS_WIDTH",
    "HLL_B",
    "BLOOM_BITS",
    "BLOOM_K",
    "KMV_K",
]

CMS_DEPTH = 4  # hash rows (failure prob e^-4 ≈ 1.8%)
CMS_WIDTH = 512  # counters per row (additive error ≤ e/512 · N ≈ 0.53% N)

HLL_B = 8  # 2^8 = 256 registers → rel. std error 1.04/√256 = 6.5%
_HLL_M = 1 << HLL_B
_HLL_RANK_BITS = 32 - HLL_B  # rank lives in the remaining 24 bits
_HLL_ALPHA = 0.7213 / (1 + 1.079 / _HLL_M)  # bias constant for m >= 128


def _md5_long(col: Column) -> Column:
    """First 32 bits of md5 as a non-negative long (the portable hash
    primitive shared with minhash/simhash — identical in DuckDB via
    CAST(('0x' || substr(md5(x), 1, 8)) AS BIGINT))."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


_CW_PRIME = 2147483647  # 2^31 - 1


def _with_cw_words(df: DataFrame, key: Column, keep: list[Column]) -> DataFrame:
    """Project the Carter-Wegman words a/b (first/second 32-bit md5 words)
    as MATERIALIZED columns before any fan-out. Embedding the md5/conv
    inside each of the d bucket expressions defeats common-subexpression
    elimination across array elements and costs d× the hashing (measured:
    the d-inline variant was 1.6× slower than even d separate md5 calls);
    one projection makes the per-bucket work pure integer arithmetic —
    the `minhash_signature` trick."""
    md5 = F.md5(key)
    return df.select(
        *keep,
        F.conv(F.substring(md5, 1, 8), 16, 10).cast("long").alias("_cw_a"),
        F.conv(F.substring(md5, 9, 8), 16, 10).cast("long").alias("_cw_b"),
    )


def _cw_bucket(i: int, w: int) -> Column:
    """h_i = ((a + i·b) mod p) mod w over the materialized _cw_a/_cw_b."""
    return ((F.col("_cw_a") + F.lit(i) * F.col("_cw_b")) % _CW_PRIME) % w


def cms_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    d: int = CMS_DEPTH,
    w: int = CMS_WIDTH,
) -> DataFrame:
    """(group..., row, bucket, cnt): the count-min counter matrix, one
    record per NON-ZERO counter. One explode (d rows/record) + one
    map-side-combined groupBy — the sketch relation is ≤ d·w rows per
    group regardless of input size, and sketches for different
    partitions/windows merge by summing cnt."""
    group_cols = group_cols or []
    pre = _with_cw_words(
        df, F.col(key_col).cast("string"), [F.col(c) for c in group_cols]
    )
    rows = pre.select(
        *group_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"), _cw_bucket(i, w).alias("bucket")
                    )
                    for i in range(d)
                ]
            )
        ).alias("rb"),
    )
    return rows.groupBy(
        *group_cols, F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    d: int = CMS_DEPTH,
    w: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query the sketch for every key in ``keys`` (small relation —
    candidate heavy hitters): estimate = min over the d probed counters.
    Pure equi-joins; the sketch side is ≤ d·w rows per group so Spark
    broadcasts it."""
    group_cols = group_cols or []
    pre = _with_cw_words(
        keys,
        F.col(key_col).cast("string"),
        [F.col(c) for c in group_cols] + [F.col(key_col)],
    )
    probes = pre.select(
        *group_cols,
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"), _cw_bucket(i, w).alias("bucket")
                    )
                    for i in range(d)
                ]
            )
        ).alias("rb"),
    ).select(
        *group_cols,
        key_col,
        F.col("rb.row").alias("row"),
        F.col("rb.bucket").alias("bucket"),
    )
    joined = probes.join(sketch, [*group_cols, "row", "bucket"], "left").fillna(
        0, ["cnt"]
    )
    return joined.groupBy(*group_cols, key_col).agg(
        F.min("cnt").alias("cms_count")
    )


def cms_topk(
    df: DataFrame,
    key_col: str,
    k: int = 20,
    group_cols: list[str] | None = None,
    d: int = CMS_DEPTH,
    w: int = CMS_WIDTH,
) -> DataFrame:
    """Heavy hitters via sketch + candidate probe: sketch the stream, probe
    it for the distinct keys, rank by (estimate, key). At scale the
    candidate set comes from a cheap pre-filter (here: all distinct keys,
    which the testdata affords); the sketch is what replaces the exact
    per-key count shuffle."""
    sketch = cms_sketch(df, key_col, group_cols, d, w)
    keys = df.select(*(group_cols or []), key_col).distinct()
    est = cms_estimate(sketch, keys, key_col, group_cols, d, w)
    order = [F.desc("cms_count"), F.asc(key_col)]
    if not group_cols:
        # global top-k: TakeOrdered (per-partition heads + driver merge),
        # never a single-partition row_number funnel
        return est.orderBy(*order).limit(k)
    from pyspark.sql import Window

    win = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        est.withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """(group..., register, max_rank): the HLL register relation — ≤ 2^b
    rows per group, mergeable by max. Register index = top b bits of the
    32-bit md5 prefix; rank = leading zeros of the remaining bits + 1
    (capped: an all-zero suffix ranks RANK_BITS + 1)."""
    group_cols = group_cols or []
    h = _md5_long(F.col(key_col).cast("string"))
    reg = F.shiftrightunsigned(h, _HLL_RANK_BITS).alias("register")
    suffix = h % F.lit(1 << _HLL_RANK_BITS)
    # rank = leading zeros + 1 = RANK_BITS - bit_length(suffix) + 1, with
    # bit_length computed from exact integer comparisons (Σ suffix >= 2^j).
    # NEVER floor(log2(x)): libm log2 at exact powers of two can land an
    # ulp below the integer in one engine and exactly on it in the other,
    # flipping the floor and the register rank cross-engine.
    bit_length = sum(
        (suffix >= F.lit(1 << j)).cast("int") for j in range(_HLL_RANK_BITS)
    )
    rank = F.when(suffix == 0, F.lit(_HLL_RANK_BITS + 1)).otherwise(
        F.lit(_HLL_RANK_BITS) - bit_length + 1
    ).cast("int")
    return (
        df.select(*group_cols, reg, rank.alias("rank"))
        .groupBy(*group_cols, "register")
        .agg(F.max("rank").alias("max_rank"))
    )


def hll_cardinality(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group HLL distinct-count estimate with EXACT integer register
    aggregation: harmonic_sum_scaled = Σ over all m registers of
    2^(RANK_BITS+1 - M[j]) (absent registers contribute M=0),
    a long ≤ m·2^RANK_BITS — no float accumulation, so the value (and the
    one double division after it) is identical cross-engine. Emits the
    register-state scalars alongside the estimate so the oracle gates the
    sketch state itself, not just the rounded estimate."""
    return hll_estimate_from_registers(
        hll_registers(df, key_col, group_cols), group_cols
    )


def hll_estimate_from_registers(
    regs: DataFrame,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """The estimator half of `hll_cardinality`, reusable over any register
    relation — in particular a PERSISTED one that a streaming maintainer
    merges by max per micro-batch (the registers, not raw keys, are the
    state a live distinct-count dashboard stores)."""
    group_cols = group_cols or []
    # scale factor 2^(RANK_BITS+1), NOT 2^RANK_BITS: ranks run 1..RANK_BITS+1
    # (the +1 is the all-zero-suffix cap), and the smallest term
    # 2^-(RANK_BITS+1) must stay a positive integer after scaling — at the
    # 2^RANK_BITS scale it is 0.5, which Spark's long cast truncates to 0
    # while SQL CAST rounds to 1, silently diverging cross-engine
    scale_pow = _HLL_RANK_BITS + 1
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_nonzero"),
        F.sum(
            F.pow(F.lit(2.0), F.lit(scale_pow) - F.col("max_rank")).cast(
                "long"
            )
        ).alias("_present_sum"),
    )
    m = F.lit(_HLL_M)
    zeros = (m - F.col("_nonzero")).alias("zero_registers")
    s = (
        F.col("_present_sum")
        + (m - F.col("_nonzero")) * F.lit(1 << scale_pow)
    ).alias("harmonic_sum_scaled")
    raw = (
        F.lit(_HLL_ALPHA * _HLL_M * _HLL_M * float(1 << scale_pow))
        / F.col("harmonic_sum_scaled")
    )
    # small-range correction (linear counting) below the standard 2.5m cut
    est = F.when(
        (raw <= F.lit(2.5 * _HLL_M)) & (F.col("zero_registers") > 0),
        F.lit(float(_HLL_M)) * F.log(m.cast("double") / F.col("zero_registers")),
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        zeros,
        s,
    ).select(
        *group_cols,
        "zero_registers",
        "harmonic_sum_scaled",
        F.round(est, 4).alias("hll_estimate"),
    )


def hll_error_bound(confidence_sigmas: float = 3.0) -> float:
    """Relative error bound for the configured register count."""
    return confidence_sigmas * 1.04 / math.sqrt(_HLL_M)


BLOOM_BITS = 1 << 16  # 65536 bits = 2048 32-bit words (8 KiB broadcast)
BLOOM_K = 5  # hash probes per key


def _bit_word_mask(bit: Column) -> tuple[Column, Column]:
    """(word index, in-word mask) for a bit position, packed 32 bits/word.
    32-bit words in BIGINT keep every shift/or in safe positive range on
    BOTH engines (bit 63 of a signed 64-bit word would overflow DuckDB's
    BIGINT shift). The mask is pow(2, bit%32) cast to long — exact for
    exponents <= 31 and identical to DuckDB's CAST(power(2, ...) AS
    BIGINT)."""
    word = F.shiftrightunsigned(bit, 5)
    mask = F.pow(F.lit(2.0), (bit % 32).cast("int")).cast("long")
    return word, mask


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """(word, bits): a Bloom filter over the distinct keys of ``df`` as
    <= m/32 rows of 32-bit words (packed in longs), mergeable by bit_or
    across partitions/days — map-side combine assembles it in one pass.

    The 100 TB use: a membership summary of a side too big to broadcast
    exactly. Broadcasting raw benchmark n-grams (the `ngram_contamination`
    recipe) stops working when the denylist has billions of entries; the
    Bloom filter pins the broadcast at m/8 bytes regardless of denylist
    size, with one-sided error (false positives only — safe for
    decontamination, where a false positive merely over-removes, and
    correct as a pre-filter before an exact confirm join).

    Bit positions come from the same Carter-Wegman md5 family as the CMS
    (h_i = (a + i·b) mod p mod m), so the filter state is exact integer
    arithmetic that replays bit-for-bit in the DuckDB oracle.
    """
    pre = _with_cw_words(df, F.col(key_col).cast("string"), [])
    bits = pre.select(
        F.explode(
            F.array(*[_cw_bucket(i, m_bits) for i in range(k)])
        ).alias("bit")
    )
    word, mask = _bit_word_mask(F.col("bit"))
    return (
        bits.select(word.alias("word"), mask.alias("mask"))
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    keep: list[str],
    m_bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Membership test for EVERY row of ``df``: (keep..., key_col,
    bloom_member). A key is a member iff ALL k probed bits are set.

    Plan shape: k-way probe explode → broadcast equi-join on the word index
    (the filter relation is <= m/32 rows) → per-ROW count of matched
    probes, re-grouped on a row id carried through the explode so duplicate
    (keep..., key) input rows each come back as their own output row
    (cardinality in == cardinality out). The big side is never shuffled on
    the key; NULL keys probe NULL words and come back non-member.
    """
    pre = _with_cw_words(
        df.withColumn("_row_id", F.monotonically_increasing_id()),
        F.col(key_col).cast("string"),
        [F.col("_row_id")] + [F.col(c) for c in keep] + [F.col(key_col)],
    )
    probes = pre.select(
        "_row_id",
        *keep,
        key_col,
        F.explode(
            F.array(*[_cw_bucket(i, m_bits) for i in range(k)])
        ).alias("bit"),
    )
    word, mask = _bit_word_mask(F.col("bit"))
    probed = probes.select(
        "_row_id", *keep, key_col, word.alias("word"), mask.alias("mask")
    ).join(F.broadcast(bloom), "word", "left")
    hit = (
        F.col("bits").isNotNull()
        & (F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask"))
    ).cast("int")
    return (
        probed.groupBy("_row_id", *keep, key_col)
        .agg((F.sum(hit) == F.lit(k)).alias("bloom_member"))
        .drop("_row_id")
    )


def bloom_fpr(n_keys: int, m_bits: int = BLOOM_BITS, k: int = BLOOM_K) -> float:
    """Expected false-positive rate (1 - e^(-kn/m))^k for n inserted keys."""
    return (1.0 - math.exp(-k * n_keys / m_bits)) ** k


KMV_K = 256  # retained minima → relative std error ~ 1/sqrt(k) = 6.25%


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    k: int = KMV_K,
) -> DataFrame:
    """(group..., h): the K-minimum-values / theta sketch (Bar-Yossef et
    al. 2002; Beyer et al. 2007) — the k smallest distinct 32-bit md5
    hashes per group. Fixed k longs of state per group; sketches merge by
    keeping the k smallest of the union.

    This is the sketch family that answers what HLL cannot: SET-EXPRESSION
    cardinalities. Two groups' sketches intersect/union directly (see
    `kmv_intersection`), so "how many users did both A and B" needs one
    pass and k longs per group instead of a full distinct-key shuffle.

    Distinctness is taken on the HASH (not the raw key), so the retained
    set is a pure function of the data — identical under any partitioning
    and replayed exactly by a DuckDB ROW_NUMBER twin.
    """
    from pyspark.sql import Window

    group_cols = group_cols or []
    h = (
        df.select(*group_cols, _md5_long(F.col(key_col).cast("string")).alias("h"))
        .distinct()
    )
    win = (
        Window.partitionBy(*group_cols) if group_cols else Window.partitionBy(F.lit(1))
    ).orderBy("h")
    return (
        h.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_intersection(
    sketch: DataFrame,
    group_col: str,
    k: int = KMV_K,
) -> DataFrame:
    """Pairwise intersection-cardinality estimates between every two groups
    of a KMV sketch relation: (g_a, g_b, theta_scaled, n_common,
    est_common) with g_a < g_b.

    theta = min over both groups of the sketch threshold — the k-th
    smallest hash when the group retained k values, else 2^32 (the sketch
    holds the whole group and is exact below that). Every retained hash
    < theta is a uniform sample of the group's hash space scaled by
    theta/2^32, so |common hashes < theta| · 2^32 / theta estimates the
    intersection size (the standard multi-KMV estimator). All integer
    arithmetic plus ONE double division (rounded) — hash-gated
    cross-engine like the other sketches.

    The estimator's domain is COMPLETE: every group pair gets a row, and a
    pair with no common retained hash comes back as n_common=0 /
    est_common=0.0 (disjoint-at-sketch-resolution, not absent) — the pair
    universe is a bounded broadcast cross of the per-group theta relation
    (#groups rows), never of the sketch rows.
    """
    hspace = float(1 << 32)
    per = sketch.groupBy(group_col).agg(
        F.max("h").alias("_hk"), F.count(F.lit(1)).alias("_sz")
    )
    theta_g = F.when(F.col("_sz") < k, F.lit(1 << 32)).otherwise(F.col("_hk"))
    per = per.select(group_col, theta_g.alias("_theta"))
    ta = per.select(F.col(group_col).alias("g_a"), F.col("_theta").alias("_ta"))
    tb = per.select(F.col(group_col).alias("g_b"), F.col("_theta").alias("_tb"))
    pairs = ta.crossJoin(F.broadcast(tb)).filter(F.col("g_a") < F.col("g_b"))
    a = sketch.select(F.col(group_col).alias("g_a"), F.col("h"))
    b = sketch.select(F.col(group_col).alias("g_b"), F.col("h"))
    common = a.join(b, "h").filter(F.col("g_a") < F.col("g_b"))
    counts = (
        common.join(F.broadcast(ta), "g_a")
        .join(F.broadcast(tb), "g_b")
        .select(
            "g_a", "g_b",
            F.least(F.col("_ta"), F.col("_tb")).alias("_theta"), "h",
        )
        .groupBy("g_a", "g_b")
        .agg(F.sum((F.col("h") < F.col("_theta")).cast("int")).alias("_nc"))
    )
    theta = F.least(F.col("_ta"), F.col("_tb"))
    n_common = F.coalesce(F.col("_nc"), F.lit(0))
    return pairs.join(counts, ["g_a", "g_b"], "left").select(
        "g_a",
        "g_b",
        theta.alias("theta_scaled"),
        n_common.cast("long").alias("n_common"),
        F.round(n_common * F.lit(hspace) / theta, 4).alias("est_common"),
    )


HIST_BINS = 64  # quantile error <= 1 bin width = (max-min)/64


def histogram_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    n_bins: int = HIST_BINS,
) -> DataFrame:
    """(group..., lo, hi, bin, cnt): equi-width histogram sketch — the
    mergeable quantile state (bins sum across partitions/windows given the
    same (lo, hi) frame). Two passes: per-group (min, max) bounds, then one
    map-side-combined bin count; state is ≤ n_bins rows per group
    regardless of input size. Deterministic float binning — the same
    expression replays identically in SQL."""
    group_cols = group_cols or []
    v = F.col(value_col).cast("double")
    bounds = df.groupBy(*group_cols).agg(
        F.min(v).alias("lo"), F.max(v).alias("hi")
    )
    joined = (
        df.join(F.broadcast(bounds), group_cols)
        if group_cols
        else df.crossJoin(F.broadcast(bounds))
    )
    span = F.col("hi") - F.col("lo")
    raw_bin = F.floor((v - F.col("lo")) / span * n_bins).cast("int")
    bin_col = F.when(span == 0, F.lit(0)).otherwise(
        F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), raw_bin))
    )
    return joined.groupBy(*group_cols, "lo", "hi", bin_col.alias("bin")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def histogram_quantiles(
    sketch: DataFrame,
    quantiles: list[float],
    group_cols: list[str] | None = None,
    n_bins: int = HIST_BINS,
) -> DataFrame:
    """Per-group quantile estimates from the histogram sketch by linear
    interpolation inside the covering bin: target = q·N; the first bin
    whose cumulative count reaches it contributes
    est = lo + width·(bin + (target - cum_before)/cnt). Error ≤ one bin
    width by construction. All arithmetic is fixed-order double ops over
    exact integer counts — cross-engine reproducible. Quantiles must lie in
    (0, 1]: q = 0 can never satisfy ``cum_before < target`` (the first bin
    has cum_before = 0) and would silently return no row, so it is rejected
    here — ask for the group's ``lo`` (the sketch carries it) instead."""
    from pyspark.sql import Window

    bad = [q for q in quantiles if not 0.0 < q <= 1.0]
    if bad:
        raise ValueError(f"quantiles must be in (0, 1], got {bad}")
    group_cols = group_cols or []
    totals = Window.partitionBy(*group_cols) if group_cols else Window.partitionBy(F.lit(1))
    cum_w = totals.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cur = (
        sketch.withColumn("n_total", F.sum("cnt").over(totals))
        .withColumn("cum", F.sum("cnt").over(cum_w))
        .withColumn("cum_before", F.col("cum") - F.col("cnt"))
    )
    q_rel = None
    out = []
    width = (F.col("hi") - F.col("lo")) / n_bins
    for q in quantiles:
        target = F.lit(q) * F.col("n_total")
        covering = cur.filter(
            (F.col("cum") >= target) & (F.col("cum_before") < target)
        )
        est = F.col("lo") + width * (
            F.col("bin")
            + (target - F.col("cum_before")) / F.col("cnt")
        )
        out.append(
            covering.select(
                *group_cols,
                F.lit(q).alias("q"),
                F.round(est, 6).alias("est"),
            )
        )
    from functools import reduce as _reduce

    q_rel = _reduce(lambda a, b: a.unionByName(b), out)
    return q_rel.orderBy(*group_cols, "q")
