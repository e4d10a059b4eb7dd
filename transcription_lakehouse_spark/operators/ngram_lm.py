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
groups each); scoring is row-local gram/bucket assembly on the token
ARRAY (no array duplication through the explode — only the zipped
bucket structs explode), five broadcast joins against <= 8 K-row count
tables, and one shuffle to the per-doc sum. No Python rows anywhere.
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


def score_ngram_logprob(
    df: DataFrame, id_col: str, text_col: str, model: dict,
    ordered: bool = True,
) -> DataFrame:
    """(id, n_tokens, sum_nll) per document under the stupid-backoff LM
    in ``model`` (a `train_ngram_counts` dict / the
    committed `_ngram_lm.py` artifact). High per-token nll = the filter
    candidate. ln terms use ln(num) - ln(den) over integer counts so the
    DuckDB twin reproduces them exactly at the 12-decimal quantum."""
    spark = df.sparkSession
    uni_b, bi_b, tri_b = model["uni_b"], model["bi_b"], model["tri_b"]
    total = model["total"]
    # materialize the token array ONCE per row behind an explode-fenced
    # projection: the five gram transforms (and the element_at calls
    # inside their lambdas) then read a resolved attribute instead of
    # re-running the split per lambda element — without the fence the
    # tokenizer re-evaluates O(len^2) times per document
    base = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
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
