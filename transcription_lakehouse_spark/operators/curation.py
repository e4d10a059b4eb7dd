"""Training-data corpus curation — the composed per-document gate chain
(language → quality → exact dedup → near-dup removal) as ONE reusable
declarative transform.

This is the operator a 100 TB corpus job runs before training: every stage
is a filter, a window, or a banded LSH equi-join — no pairwise work outside
shared buckets — so Catalyst pipelines the whole chain into a handful of
shuffles. The workload queries `doc_curation_funnel` (per-language survivor
counts) and `doc_curated_ids` (the surviving row set) are two aggregations
over this one transform, both hash-gated against DuckDB twins that
recompute the full composition.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions.text import content_tokens, token_count
from .dedup import (
    fingerprint,
    jaccard_rescore,
    lsh_candidate_pairs,
    minhash_signature,
)
from .langid import predict_lang

__all__ = ["curation_flags"]


def curation_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_lang: str = "en",
    min_tokens: int = 20,
    max_tokens: int = 80,
    min_density: float = 0.25,
    near_dup_threshold: float = 0.6,
) -> DataFrame:
    """Annotate every document with its curation verdict.

    Added columns:
    - ``lang_ok``     — langid places the text in ``target_lang``;
    - ``q_ok``        — lang_ok AND token count in [min, max] AND lexical
                        density >= ``min_density``;
    - ``exact_keep``  — q_ok AND first (lowest id) of its normalized-text
                        fingerprint among quality survivors;
    - ``curated``     — exact_keep AND not dropped as the higher id of a
                        MinHash+LSH candidate pair whose exact n-gram
                        Jaccard >= ``near_dup_threshold``;
    - ``_n_tok``      — token count (for downstream volume accounting).

    Deterministic: ties break on ``id_col`` everywhere; the LSH family is
    md5-derived. Stage semantics match the DuckDB curation oracle.
    """
    n_tok = token_count(text_col)
    density = F.size(content_tokens(text_col)) / n_tok
    flags = (
        df.withColumn("lang_ok", predict_lang(text_col) == F.lit(target_lang))
        .withColumn(
            "_q_band",
            (n_tok >= min_tokens) & (n_tok <= max_tokens) & (density >= min_density),
        )
        .withColumn("_n_tok", n_tok)
        .withColumn("_fp", fingerprint(text_col))
        .withColumn("q_ok", F.col("lang_ok") & F.col("_q_band"))
    )
    rn = F.row_number().over(Window.partitionBy("_fp", "q_ok").orderBy(id_col))
    flags = flags.withColumn("exact_keep", F.col("q_ok") & (rn == 1))

    survivors = flags.filter("exact_keep").select(id_col, text_col)
    cands = lsh_candidate_pairs(
        minhash_signature(survivors, id_col, text_col), id_col
    )
    near = jaccard_rescore(cands, survivors, id_col, text_col, n=3).filter(
        F.col("jaccard") >= near_dup_threshold
    )
    drop = near.select(F.col(f"{id_col}_2").alias(id_col)).distinct()
    out = flags.join(drop.withColumn("_neardup", F.lit(True)), id_col, "left")
    return out.withColumn(
        "curated", F.col("exact_keep") & ~F.coalesce("_neardup", F.lit(False))
    ).drop("_q_band", "_fp", "_neardup")
