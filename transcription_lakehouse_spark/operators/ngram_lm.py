"""Hashed n-gram language model with stupid backoff — the CCNet/C4-class
perplexity quality filter (public method: Brants et al. 2007, "Large
Language Models in Machine Translation" for stupid backoff; Wenzek et
al. 2019 CCNet for LM-perplexity data filtering). Production pipelines
score candidate documents with a KenLM trained on a trusted corpus;
this module is the engine-native twin: counts live in FIXED hashed
bucket tables (the DSIR trick that makes the model corpus-size-free and
exactly replayable in any engine), trained offline into a committed
artifact (`tools/train_ngram_lm.py` → `_ngram_lm.py`), scored
fully in-plan.

Scoring (stupid backoff, alpha = 0.4), per 0-based token position i:

    i >= 2:  c(w_{i-2} w_{i-1} w_i) > 0 and c(w_{i-2} w_{i-1}) > 0
                 -> p = c(tri) / c(ctx)
             else c(w_{i-1} w_i) > 0 and c(w_{i-1}) > 0
                 -> p = a * c(bi) / c(prev)
             else -> p = a^2 * base(w_i)
    i == 1:  bigram chain (no penalty at top level, a * base fallback)
    i == 0:  base(w_i)        where base = (c(uni)+1) / (TOTAL+UNI_B)

Counts come from hashed buckets (md5 -> bucket), so "c > 0" includes
collision false positives — inherent to hashed LMs and DETERMINISTIC
across engines because both sides hash identically. Output is
sum_nll = sum(-ln p) + n_tokens (consumers derive the per-token
perplexity); each ln term is rounded at 12 decimals into a DECIMAL
accumulator so the sum is order-independent (the repo-wide libm
discipline).

Scale: training is three map-side-combined bucket aggregates (<= B
groups each). Scoring assembles the per-position bucket arrays row-
locally in codegen (three md5 transforms per token) and hands them to
ONE Arrow batch kernel (`mapInArrow`, guide §4.2/§4.5) that folds the
backoff per document with numpy table lookups — zero joins, zero
shuffles, output is already per-document. Every ln the kernel reads is
harvested ONCE from java.lang.StrictMath.log (bit-identical to the
Log expression Spark's join-path plan evaluated; np.log measurably
differs by a last ulp on this domain) and the 12-decimal HALF_UP term
rounding replicates F.round exactly (vectorized scaled-int fast path
+ Decimal(repr) on the ~2% of terms within 1e-2 of a rounding
boundary). The pre-r11 five-broadcast-join plan is kept as
``arrow=False`` and pinned row-identical by pytest.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.text import tokens

__all__ = ["ALPHA", "score_ngram_logprob", "train_ngram_counts"]

ALPHA = 0.4
_SEP = " "  # tokens are whitespace-split, so a space never collides


def _bucket(col: F.Column, m: int) -> F.Column:
    """md5 -> first 8 hex -> bigint -> % m (the DSIR bucket idiom, byte-
    identical to DuckDB's CAST(('0x' || substr(md5(x),1,8)) AS BIGINT))."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")
        % F.lit(m)
    )


def _gram_arrays(toks: F.Column, uni_b: int, bi_b: int, tri_b: int):
    """Per-position bucket arrays, all row-local (pure codegen): the
    current unigram, previous unigram, (prev, cur) bigram, (prev2, prev)
    context bigram, and the trigram. Early positions carry NULLs."""
    def prev(i: F.Column) -> F.Column:           # token at 0-based i-1
        return F.element_at(toks, i)             # element_at is 1-based

    def prev2(i: F.Column) -> F.Column:          # token at 0-based i-2
        return F.element_at(toks, i - 1)

    b_uni = F.transform(toks, lambda t: _bucket(t, uni_b))
    b_prev = F.transform(
        toks, lambda t, i: F.when(i >= 1, _bucket(prev(i), uni_b))
    )
    b_bi = F.transform(
        toks, lambda t, i: F.when(
            i >= 1, _bucket(F.concat_ws(_SEP, prev(i), t), bi_b)
        )
    )
    b_ctx = F.transform(
        toks, lambda t, i: F.when(
            i >= 2, _bucket(F.concat_ws(_SEP, prev2(i), prev(i)), bi_b)
        )
    )
    b_tri = F.transform(
        toks, lambda t, i: F.when(
            i >= 2,
            _bucket(F.concat_ws(_SEP, prev2(i), prev(i), t), tri_b),
        )
    )
    return b_uni, b_prev, b_bi, b_ctx, b_tri


def train_ngram_counts(
    df: DataFrame, text_col: str,
    uni_b: int = 4096, bi_b: int = 8192, tri_b: int = 8192,
) -> dict:
    """Train the hashed count tables over ``df[text_col]``. Returns the
    model dict {uni_b, bi_b, tri_b, total, uni, bi, tri} with positional
    count lists — small enough (<= 20 K longs) to commit as a source
    artifact. Three bucket aggregates, each one map-side-combined
    shuffle of <= B groups; the corpus is scanned once per order."""
    toks = tokens(text_col)
    b_uni, _, b_bi, _, b_tri = _gram_arrays(toks, uni_b, bi_b, tri_b)

    def _count(arr: F.Column, m: int) -> list[int]:
        rows = (
            df.select(F.explode(arr).alias("b"))
            .filter(F.col("b").isNotNull())
            .groupBy("b").agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        out = [0] * m
        for r in rows:
            out[int(r["b"])] = int(r["c"])
        return out

    uni = _count(b_uni, uni_b)
    bi = _count(b_bi, bi_b)
    tri = _count(b_tri, tri_b)
    return {
        "uni_b": uni_b, "bi_b": bi_b, "tri_b": tri_b,
        "total": sum(uni), "uni": uni, "bi": bi, "tri": tri,
    }


def _counts_df(spark, counts: list[int], name: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    # pandas -> Arrow path: a plain-list createDataFrame serializes ~8 K
    # rows through Py4J one by one and dominates the query's BUILD time
    arr = np.asarray(counts, dtype=np.int64)
    nz = np.nonzero(arr)[0]
    if nz.size == 0:
        nz, arr = np.array([0]), np.array([0], dtype=np.int64)
    return spark.createDataFrame(pd.DataFrame({
        f"b_{name}": nz.astype(np.int64), f"c_{name}": arr[nz],
    }))


# JVM-harvested ln tables per model digest. A pure function of the
# committed model constants (no query data enters the key or the
# values), so the memo is broadcast-LUT-style reuse, not result caching.
_LN_CACHE: dict[str, dict] = {}


def _ln_tables(spark, model: dict) -> dict:
    """Per-bucket natural-log tables for every count the backoff can
    read, each value computed by ``java.lang.StrictMath.log`` through
    the py4j gateway — the exact function Spark's ``Log`` expression
    evaluates, so the Arrow kernel's arithmetic is IEEE-identical to
    the join-path plan (measured: np.log differs from the JVM by one
    ulp on 19/78 of the committed model's distinct counts, and a last
    ulp can flip the 12-decimal term rounding). O(distinct counts)
    scalar calls (~78 for the committed artifact), cached per model
    digest."""
    import hashlib

    import numpy as np

    uni = np.asarray(model["uni"], dtype=np.int64)
    bi = np.asarray(model["bi"], dtype=np.int64)
    tri = np.asarray(model["tri"], dtype=np.int64)
    key = hashlib.md5(
        b"%d|%d|%d|%d|"
        % (model["uni_b"], model["bi_b"], model["tri_b"], model["total"])
        + uni.tobytes() + bi.tobytes() + tri.tobytes()
    ).hexdigest()
    hit = _LN_CACHE.get(key)
    if hit is not None:
        return hit
    need = np.unique(np.concatenate([
        uni + 1, uni[uni > 0], bi[bi > 0], tri[tri > 0],
        np.asarray([model["total"] + model["uni_b"]], dtype=np.int64),
    ])).astype(np.float64)
    jlog = spark.sparkContext._jvm.java.lang.StrictMath.log
    lns = np.asarray([jlog(float(v)) for v in need])

    def ln_of(vals: "np.ndarray") -> "np.ndarray":
        return lns[np.searchsorted(need, vals.astype(np.float64))]

    def table(counts: "np.ndarray") -> "np.ndarray":
        t = np.zeros(counts.shape[0])
        pos = counts > 0
        t[pos] = ln_of(counts[pos])
        return t

    out = {
        "c_uni": uni, "c_bi": bi, "c_tri": tri,
        "t_uni_p1": ln_of(uni + 1),
        "t_uni": table(uni), "t_bi": table(bi), "t_tri": table(tri),
        "ln_tot": float(
            ln_of(np.asarray([model["total"] + model["uni_b"]]))[0]
        ),
        "ln_a": float(jlog(ALPHA)),
    }
    _LN_CACHE[key] = out
    return out


def _make_backoff_kernel(t: dict, id_name: str):
    """Arrow batch scorer over (id, bu, bb, bt) list columns: per-doc
    stupid-backoff fold, bit-identical to the join-path plan (same
    harvested lns, same IEEE op order, same HALF_UP roundings — see
    module doc). Requires unique ids per input row (every in-repo
    caller scores one row per document)."""
    import numpy as np

    C_UNI, C_BI, C_TRI = t["c_uni"], t["c_bi"], t["c_tri"]
    T_UNI_P1, T_UNI = t["t_uni_p1"], t["t_uni"]
    T_BI, T_TRI = t["t_bi"], t["t_tri"]
    LN_TOT, LN_A = t["ln_tot"], t["ln_a"]
    LN_A2 = LN_A + LN_A  # (ln_a + ln_a) exactly as the when-chain adds it

    def score(batches):
        from decimal import ROUND_HALF_UP, Decimal

        import pyarrow as pa

        for b in batches:
            ids, bu, bb, bt = (b.column(i) for i in range(4))
            o = np.asarray(bu.offsets, dtype=np.int64)
            lens = o[1:] - o[:-1]
            keep = lens > 0
            if not keep.any():
                continue  # empty/NULL token arrays never explode a row
            vu = np.asarray(bu.values.fill_null(0), dtype=np.int64)
            vb = np.asarray(bb.values.fill_null(0), dtype=np.int64)
            vt = np.asarray(bt.values.fill_null(0), dtype=np.int64)
            tot = int(lens.sum())
            # absolute child indices per token; np.repeat keeps this
            # correct even for non-contiguous list layouts
            rel = np.arange(tot) - np.repeat(np.cumsum(lens) - lens, lens)
            flat = np.repeat(o[:-1], lens) + rel
            m1, m2 = rel >= 1, rel >= 2
            prev = np.where(m1, flat - 1, flat)
            BU = vu[flat]
            BUp = vu[prev]
            BBm = vb[np.where(m1, flat, 0)]
            BBp = vb[np.where(m2, prev, 0)]
            BTm = vt[np.where(m2, flat, 0)]
            base = T_UNI_P1[BU] - LN_TOT
            c_prv, c_bi = C_UNI[BUp], C_BI[BBm]
            c_ctx, c_tri = C_BI[BBp], C_TRI[BTm]
            bi_hit = m1 & (c_bi > 0) & (c_prv > 0)
            tri_hit = m2 & (c_tri > 0) & (c_ctx > 0)
            ln_p = np.where(
                tri_hit, T_TRI[BTm] - T_BI[BBp],
                np.where(
                    m2 & bi_hit, (LN_A + T_BI[BBm]) - T_UNI[BUp],
                    np.where(
                        m2, LN_A2 + base,
                        np.where(
                            bi_hit, T_BI[BBm] - T_UNI[BUp],
                            np.where(m1, LN_A + base, base),
                        ),
                    ),
                ),
            )
            x = -ln_p
            # F.round(x, 12) == HALF_UP on Decimal(repr(x)); the scaled
            # fast path is unambiguous except within ~1e-2 of a .5
            # boundary (float64 carries y=x*1e12 to ~1e-3 absolute),
            # where the exact Decimal replay decides (validated
            # mismatch-free on 300k adversarial samples incl. exact
            # halves)
            y = x * 1e12
            n = np.where(
                y >= 0, np.floor(y + 0.5), -np.floor(0.5 - y)
            ).astype(np.int64)
            ay = np.abs(y)
            for i in np.nonzero(np.abs(ay - np.floor(ay) - 0.5) < 1e-2)[0]:
                n[i] = int(
                    Decimal(repr(float(x[i])))
                    .scaleb(12)
                    .quantize(Decimal(1), rounding=ROUND_HALF_UP)
                )
            seg = (np.cumsum(lens) - lens)[keep]
            if tot and int(np.abs(n).max()) > (1 << 62) // max(
                int(lens.max()), 1
            ):
                sums = [  # exact big-int fold; unreachable at sane nll
                    sum(int(v) for v in n[s:s + ln])
                    for s, ln in zip(seg, lens[keep])
                ]
            else:
                sums = np.add.reduceat(n, seg)
            q = np.asarray(
                [
                    (s + 50_000_000) // 100_000_000
                    if s >= 0
                    else -((-s + 50_000_000) // 100_000_000)
                    for s in (int(v) for v in sums)
                ],
                dtype=np.int64,
            )
            yield pa.RecordBatch.from_arrays(
                [
                    ids.take(pa.array(np.nonzero(keep)[0])),
                    pa.array(lens[keep], type=pa.int64()),
                    pa.array(q.astype(np.float64) / 1e4, type=pa.float64()),
                ],
                names=[id_name, "n_tokens", "sum_nll"],
            )

    return score


def score_ngram_logprob(
    df: DataFrame, id_col: str, text_col: str, model: dict,
    ordered: bool = True, arrow: bool = True,
) -> DataFrame:
    """(id, n_tokens, sum_nll) per document under the stupid-backoff LM
    in ``model`` (a `train_ngram_counts` dict / the
    committed `_ngram_lm.py` artifact). High per-token nll = the filter
    candidate. ln terms use ln(num) - ln(den) over integer counts so the
    DuckDB twin reproduces them exactly at the 12-decimal quantum.

    ``arrow=True`` (default) scores through the batch kernel (module
    doc); ``arrow=False`` keeps the five-broadcast-join plan — the two
    are pinned row-identical by pytest."""
    spark = df.sparkSession
    uni_b, bi_b, tri_b = model["uni_b"], model["bi_b"], model["tri_b"]
    total = model["total"]
    # materialize the token array ONCE per row behind an explode-fenced
    # projection: the five gram transforms (and the element_at calls
    # inside their lambdas) then read a resolved attribute instead of
    # re-running the split per lambda element — without the fence the
    # tokenizer re-evaluates O(len^2) times per document
    src = df.select(id_col, text_col)
    if arrow:
        # tokenize + the three md5 transforms + the kernel all inherit
        # the scan's partitioning; a corpus read from one small parquet
        # file would run the whole scorer serially (same thin-input
        # guard as dedup._merged_dup_spans — a genuinely large scan
        # keeps its own partitioning)
        par = spark.sparkContext.defaultParallelism
        if src.rdd.getNumPartitions() < par:
            src = src.repartition(par)
    base = src.select(F.col(id_col), tokens(text_col).alias("_toks"))
    toks = F.col("_toks")
    b_uni, _, b_bi, _, b_tri = _gram_arrays(
        toks, uni_b, bi_b, tri_b
    )
    # bp/bc are SHIFTS of bu/bb — the prev-unigram bucket at position i IS
    # the unigram bucket at i-1, and the (prev2, prev) context-bigram
    # bucket IS the bigram bucket at i-1 (same md5 of the same string).
    # Deriving them as element_at shifts over the materialized arrays
    # removes two of the five md5 transforms per token (guide §2.3 —
    # cheaper per-row work before the explode); values are identical by
    # construction, incl. the NULL stripe (bu is never null so bp[i>=1]
    # stays non-null; bb[i-1] for i>=2 has i-1>=1 so bc keeps its nulls
    # exactly at positions 0 and 1).
    arrs0 = base.select(
        F.col(id_col),
        b_uni.alias("bu"), b_bi.alias("bb"), b_tri.alias("bt"),
    )
    if arrow:
        kernel = _make_backoff_kernel(_ln_tables(spark, model), id_col)
        id_type = arrs0.schema[id_col].dataType.simpleString()
        out = arrs0.mapInArrow(
            kernel,
            f"{id_col} {id_type}, n_tokens long, sum_nll double",
        )
        return out.orderBy(id_col) if ordered else out
    arrs = arrs0.select(
        F.col(id_col),
        "bu",
        F.transform(
            "bu", lambda _, i: F.when(i >= 1, F.element_at(F.col("bu"), i))
        ).alias("bp"),
        "bb",
        F.transform(
            "bb", lambda _, i: F.when(i >= 2, F.element_at(F.col("bb"), i))
        ).alias("bc"),
        "bt",
    )
    pos = (
        arrs.select(
            id_col,
            F.explode(
                F.arrays_zip("bu", "bp", "bb", "bc", "bt")
            ).alias("z"),
        )
        .select(id_col, "z.bu", "z.bp", "z.bb", "z.bc", "z.bt")
    )
    uni = _counts_df(spark, model["uni"], "uni")
    prv = uni.select(
        F.col("b_uni").alias("b_prv"), F.col("c_uni").alias("c_prv")
    )
    bi = _counts_df(spark, model["bi"], "bi")
    ctx = bi.select(
        F.col("b_bi").alias("b_ctx"), F.col("c_bi").alias("c_ctx")
    )
    tri = _counts_df(spark, model["tri"], "tri")
    j = (
        pos
        .join(F.broadcast(uni), pos["bu"] == uni["b_uni"], "left")
        .join(F.broadcast(prv), pos["bp"] == prv["b_prv"], "left")
        .join(F.broadcast(bi), pos["bb"] == bi["b_bi"], "left")
        .join(F.broadcast(ctx), pos["bc"] == ctx["b_ctx"], "left")
        .join(F.broadcast(tri), pos["bt"] == tri["b_tri"], "left")
    )
    ln_a = F.log(F.lit(ALPHA))
    c_uni = F.coalesce(F.col("c_uni"), F.lit(0))
    c_prv, c_bi = F.col("c_prv"), F.col("c_bi")
    c_ctx, c_tri = F.col("c_ctx"), F.col("c_tri")
    # base = (c_uni + 1) / (total + uni_b); ln kept as a difference of
    # integer-argument lns (order/libm discipline, see module doc)
    ln_base = (
        F.log((c_uni + 1).cast("double"))
        - F.log(F.lit(float(total + uni_b)))
    )
    ln_p = (
        F.when(
            F.col("bt").isNotNull()
            & (F.coalesce(c_tri, F.lit(0)) > 0)
            & (F.coalesce(c_ctx, F.lit(0)) > 0),
            F.log(c_tri.cast("double")) - F.log(c_ctx.cast("double")),
        )
        .when(
            F.col("bt").isNotNull()
            & (F.coalesce(c_bi, F.lit(0)) > 0)
            & (F.coalesce(c_prv, F.lit(0)) > 0),
            ln_a + F.log(c_bi.cast("double"))
            - F.log(c_prv.cast("double")),
        )
        .when(F.col("bt").isNotNull(), ln_a + ln_a + ln_base)
        .when(
            F.col("bb").isNotNull()
            & (F.coalesce(c_bi, F.lit(0)) > 0)
            & (F.coalesce(c_prv, F.lit(0)) > 0),
            F.log(c_bi.cast("double")) - F.log(c_prv.cast("double")),
        )
        .when(F.col("bb").isNotNull(), ln_a + ln_base)
        .otherwise(ln_base)
    )
    term = F.round(-ln_p, 12).cast("decimal(28,12)")
    out = j.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.sum(term), 4).cast("double").alias("sum_nll"),
    )
    # ordered=False for composition: a consumer that joins these scores
    # (doc_curation_v4) would otherwise pay a range-partition exchange
    # for a sort the join immediately destroys
    return out.orderBy(id_col) if ordered else out
