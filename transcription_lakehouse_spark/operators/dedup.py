"""Deduplication operators for large-scale training-data pipelines.

Replaces the reference's O(n²)-guarded near-dup check
(`/root/reference/src/lakehouse/quality/metrics/integrity.py:459-616`) with
strategies that scale instead of skipping:

- exact dedup: hash-groupBy on normalized text (A16) — one shuffle.
- n-gram Jaccard: shingle → explode → equi-self-join on shingle (inverted
  index) → count intersections. Never materializes the n² pair matrix; the
  join key is the shingle so only docs sharing at least one shingle meet.
- MinHash + LSH banding: portable string-min minhash (md5-keyed, identical
  in any engine) → band keys → bucket join → exact Jaccard on candidates.
  This is the 100 TB path: cost is O(n · shingles · hashes) + a groupBy on
  band keys; no pairwise work outside shared buckets.
- SimHash: 64-bit signature via md5 bit-vote (Hamming-distance near-dup).

All hashing is md5-based so the DuckDB oracle can reproduce results exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..functions.text import normalize_text, tokens

__all__ = [
    "fingerprint",
    "exact_dup_stats",
    "word_shingles",
    "shingles_from_tokens",
    "shingle_pair_jaccard",
    "jaccard_rescore",
    "minhash_signature",
    "signature_bands",
    "lsh_candidate_pairs",
    "edit_ratio_rescore",
    "positional_grams",
    "dup_span_stats",
    "cut_dup_spans",
    "token_hashes",
    "simhash32_from_hashes",
    "simhash32",
    "simhash_near_dup_pairs",
]

N_MINHASHES = 8
BAND_SIZE = 2  # 4 bands of 2 hashes


def fingerprint(col: Column | str) -> Column:
    """md5 content fingerprint of normalized text (exact-dup key)."""
    return F.md5(normalize_text(col))


def exact_dup_stats(df: DataFrame, text_col: str, group_cols: list[str]) -> DataFrame:
    """A16: per group, distinct-fingerprint vs row counts (dup rows = n - distinct)."""
    with_fp = df.withColumn("_fp", fingerprint(text_col))
    return with_fp.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("_fp").alias("n_distinct"),
        (F.count(F.lit(1)) - F.countDistinct("_fp")).alias("n_dup_rows"),
    )


def shingles_from_tokens(t: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a MATERIALIZED token-array column.

    Callers must pass a real column (``withColumn('_toks', tokens(text))``),
    not the tokens() expression inline: Catalyst re-evaluates a lambda-nested
    subexpression per element, turning the shingle build into O(len²) regex
    work per row.
    """
    idx = F.sequence(F.lit(0), F.size(t) - F.lit(n))
    gram = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(t, i + j + 1) for j in range(n)])
    )
    return F.when(F.size(t) >= n, F.array_distinct(gram)).otherwise(
        F.array().cast("array<string>")
    )


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Convenience wrapper over :func:`shingles_from_tokens` (fine for tests
    and small inputs; hot paths should materialize the token array first)."""
    return shingles_from_tokens(tokens(col), n)


def _exploded_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int, extra_cols: list[str]
) -> DataFrame:
    # materialize tokens before shingling (see shingles_from_tokens).
    # (r11 A/B: a _merged_dup_spans-style thin-input repartition here
    # measured WORSE — sigs 1.09 → 1.43 s, rescored pairs 1.74 → 2.17 s:
    # 3-gram distinct shingling is light enough that the round-robin
    # exchange costs more than the serial map stage it widens, unlike the
    # 13-gram positional explode which keeps its guard.)
    toked = df.select(id_col, *extra_cols, tokens(text_col).alias("_toks"))
    return toked.select(
        id_col,
        *extra_cols,
        F.explode(shingles_from_tokens(F.col("_toks"), n)).alias("shingle"),
    )


def shingle_pair_jaccard(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    block_cols: list[str] | None = None,
    max_df: int | None = None,
) -> DataFrame:
    """Pairwise n-gram Jaccard via inverted-index self-join.

    Returns (id_1, id_2, n_common, n_1, n_2, jaccard) for every pair sharing
    >= 1 shingle (and matching ``block_cols`` if given). Scale: the join is
    an equi-join on the shingle string — hot shingles are the skew risk.

    ``max_df`` is the skew guard: shingles occurring in more than ``max_df``
    documents are dropped from the INTERSECTION side before the self-join
    (each hot shingle alone generates O(df²) pairs — one stopword trigram in
    1M docs is 10¹² joined rows). This makes ``n_common`` (and therefore
    jaccard) a lower bound for pairs whose overlap is mostly hot shingles —
    the standard inverted-index trade (df-capped postings); exact-rescore
    callers are unaffected because candidates this misses share only
    ubiquitous text. Denominator sizes still count ALL shingles. Default
    ``None`` keeps the exact semantics (the oracle-gated queries use that).
    """
    block_cols = block_cols or []
    sh = _exploded_shingles(df, id_col, text_col, n, block_cols)
    if max_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.countDistinct(id_col).alias("_df"))
            .filter(F.col("_df") > max_df)
            .select("shingle")
        )
        sh = sh.join(hot, "shingle", "left_anti")
    sizes = df.select(F.col(id_col), tokens(text_col).alias("_toks")).select(
        F.col(id_col), F.size(shingles_from_tokens(F.col("_toks"), n)).alias("n_sh")
    )
    # alias BOTH sides' join keys distinctly — identical lineage columns in a
    # self-join condition otherwise resolve trivially-true
    left = sh.select(
        *[F.col(c).alias(f"{c}_1") for c in (id_col, *block_cols)],
        F.col("shingle").alias("_sh_l"),
    )
    right = sh.select(
        *[F.col(c).alias(f"{c}_2") for c in (id_col, *block_cols)],
        F.col("shingle").alias("_sh_r"),
    )
    cond = [F.col("_sh_l") == F.col("_sh_r")] + [
        F.col(f"{c}_1") == F.col(f"{c}_2") for c in block_cols
    ]
    pairs = (
        left.join(right, cond)
        .filter(F.col(f"{id_col}_1") < F.col(f"{id_col}_2"))
        .groupBy(f"{id_col}_1", f"{id_col}_2")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    s1 = sizes.select(F.col(id_col).alias(f"{id_col}_1"), F.col("n_sh").alias("n_1"))
    s2 = sizes.select(F.col(id_col).alias(f"{id_col}_2"), F.col("n_sh").alias("n_2"))
    return (
        pairs.join(s1, f"{id_col}_1")
        .join(s2, f"{id_col}_2")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_1") + F.col("n_2") - F.col("n_common")),
        )
    )


def jaccard_rescore(
    cands: DataFrame,
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for a CANDIDATE pair set: join each side's
    shingle array to the pairs and intersect per pair. Arithmetic-identical
    to the inverted-index join (`shingle_pair_jaccard`) on the same pairs,
    but cost is O(candidates · shingles-per-doc) instead of the full
    all-shared-shingle pair expansion — the right rescore shape when an LSH
    band join has already bounded the candidates."""
    sh = df.select(F.col(id_col), tokens(text_col).alias("_toks")).select(
        F.col(id_col), shingles_from_tokens(F.col("_toks"), n).alias("_sh")
    )
    a = sh.select(F.col(id_col).alias(f"{id_col}_1"), F.col("_sh").alias("_sh1"))
    b = sh.select(F.col(id_col).alias(f"{id_col}_2"), F.col("_sh").alias("_sh2"))
    return (
        cands.join(a, f"{id_col}_1")
        .join(b, f"{id_col}_2")
        .select(
            f"{id_col}_1",
            f"{id_col}_2",
            F.size(F.array_intersect("_sh1", "_sh2")).alias("n_common"),
            F.size("_sh1").alias("n_1"),
            F.size("_sh2").alias("n_2"),
        )
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_1") + F.col("n_2") - F.col("n_common")),
        )
    )


def minhash_signature(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, k: int = N_MINHASHES
) -> DataFrame:
    """Portable MinHash: signature_i = min over shingles of h_i(s), with the
    Carter-Wegman family h_i(s) = (a(s) + i*b(s)) mod 2^32 where a/b are the
    first/second 8-hex-char words of md5(s) — engine-portable (identical in
    DuckDB) and uniform enough for LSH.
    Returns (id, minhashes array<long> of length k).
    """
    # Carter-Wegman family from ONE md5 per shingle: a = first 8 hex chars,
    # b = next 8, h_i = (a + i*b) mod 2^32. The k mins ride a single
    # map-side-combined groupBy (shuffle ~#docs rows) — hashing k md5s per
    # shingle, or exploding k rows per shingle, costs k× for nothing.
    # (r11 measured: an array_min(transform(...)) projection variant with
    # no explode/groupBy ran 4-6x SLOWER — the per-element lambda chain is
    # interpreted and gets re-inlined per consumer, while this explode is
    # whole-stage-codegen'd and the post-partial-agg shuffle is tiny.)
    sh = _exploded_shingles(df, id_col, text_col, n, [])
    md5 = F.md5("shingle")
    a = F.conv(F.substring(md5, 1, 8), 16, 10).cast("long")
    b = F.conv(F.substring(md5, 9, 8), 16, 10).cast("long")
    hashed = sh.select(
        id_col,
        *[((a + F.lit(i) * b) % F.lit(1 << 32)).alias(f"_m{i}") for i in range(k)],
    )
    per_doc = hashed.groupBy(id_col).agg(
        *[F.min(f"_m{i}").alias(f"_m{i}") for i in range(k)]
    )
    return per_doc.select(
        id_col, F.array(*[F.col(f"_m{i}") for i in range(k)]).alias("minhashes")
    )


def signature_bands(
    signatures: DataFrame,
    id_col: str,
    band_size: int = BAND_SIZE,
    k: int | None = None,
) -> DataFrame:
    """Explode MinHash signatures into the LSH band inverted index:
    (id, band, key) with one row per band, key = the band's hash values
    joined. This is the persistable half of `lsh_candidate_pairs` — a
    streaming maintainer appends it per micro-batch so existing docs never
    re-shingle. ``k`` defaults to N_MINHASHES; an in-plan per-row guard
    raises on signatures of any other length (banding past the array's end
    would throw under ANSI; a LONGER signature would silently band only a
    prefix and lose recall — this makes both loud, with NO extra job)."""
    k = N_MINHASHES if k is None else k
    if k < band_size:
        raise ValueError(
            f"signature_bands: signature length {k} < band_size {band_size}"
        )
    n_bands = k // band_size
    guard = (
        F.when(
            F.size("minhashes") != F.lit(k),
            F.raise_error(
                F.concat(
                    F.lit(
                        f"signature_bands: expected signature length {k}, got "
                    ),
                    F.size("minhashes").cast("string"),
                    F.lit(" — pass k= matching minhash_signature(k=)"),
                )
            ).cast("int"),
        )
        .otherwise(F.lit(0))
    )
    return signatures.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.lit(b) + guard).alias("band"),
                        F.concat_ws(
                            "|",
                            *[
                                F.element_at("minhashes", b * band_size + j + 1)
                                for j in range(band_size)
                            ],
                        ).alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    band_size: int = BAND_SIZE,
    k: int | None = None,
) -> DataFrame:
    """Band the signature and bucket-join: docs sharing any full band are
    candidates. Returns distinct (id_1, id_2) with id_1 < id_2.

    ``k`` must match the signature length produced by minhash_signature
    (defaults to N_MINHASHES). A mismatch RAISES at runtime via an in-plan
    guard (`signature_bands`) — a caller who built longer signatures would
    otherwise silently band only the first N_MINHASHES entries and lose
    recall. The guard is a per-row comparison, not an extra job: inferring
    the length eagerly would re-execute the (often expensive) upstream
    shingle→minhash lineage once just to read one row."""
    bands = signature_bands(signatures, id_col, band_size, k)
    left = bands.select(F.col(id_col).alias(f"{id_col}_1"), "band", "key")
    right = bands.select(F.col(id_col).alias(f"{id_col}_2"), "band", "key")
    return (
        left.join(right, ["band", "key"])
        .filter(F.col(f"{id_col}_1") < F.col(f"{id_col}_2"))
        .select(f"{id_col}_1", f"{id_col}_2")
        .distinct()
    )


def edit_ratio_rescore(
    candidates: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_ratio: float = 0.0,
) -> DataFrame:
    """J8 fuzzy near-dup rescoring: normalized edit-similarity
    ratio = 1 - levenshtein(a, b) / max(len(a), len(b)) over candidate
    pairs (reference rescored with rapidfuzz.fuzz.ratio >= 0.95 but only
    below 10k rows, `integrity.py:551-616`; LSH candidates make the exact
    rescore affordable at any scale).

    candidates: (id_1, id_2) — e.g. from lsh_candidate_pairs.
    """
    norm = normalize_text(text_col)
    t1 = docs.select(F.col(id_col).alias(f"{id_col}_1"), norm.alias("_t1"))
    t2 = docs.select(F.col(id_col).alias(f"{id_col}_2"), norm.alias("_t2"))
    joined = candidates.join(t1, f"{id_col}_1").join(t2, f"{id_col}_2")
    maxlen = F.greatest(F.length("_t1"), F.length("_t2"))
    # guard /0 (two empty texts are identical → ratio 1); ANSI would throw
    ratio = F.round(
        F.when(maxlen > 0, 1 - F.levenshtein("_t1", "_t2") / maxlen).otherwise(
            F.lit(1.0)
        ),
        6,
    )
    return (
        joined.select(f"{id_col}_1", f"{id_col}_2", ratio.alias("edit_ratio"))
        .filter(F.col("edit_ratio") >= min_ratio)
    )


def positional_grams(t: Column, n: int) -> Column:
    """array<struct<p:int, gram:string>>: the word n-gram STARTING at every
    token position (0-based) of a materialized token array — positional,
    NOT distinct, unlike :func:`shingles_from_tokens` (span detection needs
    to know *where* a duplicated gram sits, and a gram repeated inside one
    document occupies several positions)."""
    idx = F.sequence(F.lit(0), F.size(t) - F.lit(n))
    pg = F.transform(
        idx,
        lambda i: F.struct(
            i.cast("int").alias("p"),
            F.concat_ws(
                " ", *[F.element_at(t, i + j + 1) for j in range(n)]
            ).alias("gram"),
        ),
    )
    return F.when(F.size(t) >= n, pg).otherwise(
        F.array().cast("array<struct<p:int,gram:string>>")
    )


def _merged_dup_spans(
    toked: DataFrame, id_col: str, n: int, min_df: int
) -> DataFrame:
    """Shared core of the Lee-et-al substring-dup derivation: from a
    (id, _toks) frame, the MERGED maximal duplicated spans per doc as
    (id, _s, _e, n_merged) — positional explode → gram df (count distinct
    doc) → rejoin dup grams → per-doc interval union. Both the reporting
    (`dup_span_stats`) and the rewrite (`cut_dup_spans`) consume this, so
    the span set cannot drift between them.

    The positional-gram explode is the expensive stage and inherits the
    input's partitioning; a corpus read from a few parquet files would run
    it near-serially, so the helper widens thin inputs to the default
    parallelism itself (callers need no repartition of their own)."""
    from .intervals import merged_intervals

    parallelism = toked.sparkSession.sparkContext.defaultParallelism
    if toked.rdd.getNumPartitions() < parallelism:
        toked = toked.repartition(parallelism)
    ex = toked.select(
        id_col,
        F.explode(positional_grams(F.col("_toks"), n)).alias("_pg"),
    ).select(id_col, F.col("_pg.p").alias("_p"), F.col("_pg.gram").alias("_g"))
    if min_df == 2:
        # "in >= 2 distinct docs" ⟺ min(id) != max(id): a plain
        # map-side-combinable min/max instead of countDistinct's two-phase
        # distinct aggregate (guide §2.3 — aggregate before you shuffle);
        # exactly equivalent for the min_df every declared query uses
        gram_df = (
            ex.groupBy("_g")
            .agg(F.min(id_col).alias("_lo"), F.max(id_col).alias("_hi"))
            .filter(F.col("_lo") != F.col("_hi"))
            .select("_g")
        )
    else:
        gram_df = (
            ex.groupBy("_g")
            .agg(F.countDistinct(id_col).alias("_df"))
            .filter(F.col("_df") >= min_df)
            .select("_g")
        )
    dup_pos = ex.join(gram_df, "_g").select(
        id_col,
        F.col("_p").cast("long").alias("_s"),
        (F.col("_p") + n).cast("long").alias("_e"),
    )
    return merged_intervals(dup_pos, [id_col], "_s", "_e")


def dup_span_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 13,
    min_df: int = 2,
) -> DataFrame:
    """Exact-substring duplication spans (Lee et al. 2022 "Deduplicating
    Training Data Makes Language Models Better", public recipe): token
    positions whose n-gram occurs in >= ``min_df`` distinct documents,
    merged into MAXIMAL duplicated spans per document — the regions a
    substring-level dedup pass would cut, not just a per-doc ratio.

    Returns one row per document: (id, n_tokens, n_dup_spans, dup_tokens,
    dup_fraction). Suffix arrays don't distribute; the equivalent
    n-gram-df formulation is three map-side-combinable shuffles (see
    :func:`_merged_dup_spans`). No doc×doc pairs; hot grams are plain
    equi-join skew (AQE-splittable).
    """
    from ..functions.text import tokens as _tokens

    toked = df.select(id_col, _tokens(text_col).alias("_toks"))
    base = toked.select(id_col, F.size("_toks").alias("n_tokens"), "_toks")
    spans = _merged_dup_spans(toked, id_col, n, min_df)
    per_doc = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum(F.col("_e") - F.col("_s")).alias("dup_tokens"),
    )
    out = base.select(id_col, "n_tokens").join(per_doc, id_col, "left")
    frac = F.when(
        F.col("n_tokens") > 0,
        F.coalesce("dup_tokens", F.lit(0)) / F.col("n_tokens").cast("double"),
    ).otherwise(F.lit(0.0))
    return out.select(
        id_col,
        "n_tokens",
        F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
        F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        F.round(frac, 6).alias("dup_fraction"),
    )


def cut_dup_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 13,
    min_df: int = 2,
) -> DataFrame:
    """The REMOVAL half of substring-level dedup: rewrite each document
    with its cross-document duplicated spans (see :func:`dup_span_stats`)
    cut out, keeping the surviving tokens space-joined in order.

    Returns (id, n_tokens, dup_tokens, cleaned_text). The span set rides
    back to the token array as one `collect_list` per doc (spans per doc
    are few — they are MERGED maximal intervals), and the cut is a pure
    JVM array filter: token i survives iff no span [s, e) contains i.
    Cost per row is O(n_tokens · n_spans) — no Python, no extra shuffle
    beyond dup_span_stats' own aggregates.
    """
    from ..functions.text import tokens as _tokens

    toked = df.select(id_col, _tokens(text_col).alias("_toks"))
    spans = (
        _merged_dup_spans(toked, id_col, n, min_df)
        .groupBy(id_col)
        .agg(
            F.collect_list(F.struct(F.col("_s").alias("s"), F.col("_e").alias("e"))).alias(
                "_spans"
            )
        )
    )
    j = toked.join(spans, id_col, "left").withColumn(
        "_spans", F.coalesce("_spans", F.array().cast("array<struct<s:long,e:long>>"))
    )
    idx = F.sequence(F.lit(0), F.size("_toks") - F.lit(1))
    surviving = F.filter(
        idx,
        lambda i: ~F.exists(
            F.col("_spans"), lambda sp: (i >= sp["s"]) & (i < sp["e"])
        ),
    )
    cleaned = F.concat_ws(
        " ", F.transform(surviving, lambda i: F.element_at(F.col("_toks"), i + 1))
    )
    dup_tokens = F.aggregate(
        F.col("_spans"),
        F.lit(0).cast("long"),
        lambda acc, sp: acc + (sp["e"] - sp["s"]),
    )
    return j.select(
        id_col,
        F.size("_toks").cast("long").alias("n_tokens"),
        dup_tokens.alias("dup_tokens"),
        F.when(F.size("_toks") > 0, cleaned).otherwise(F.lit("")).alias(
            "cleaned_text"
        ),
    )


def token_hashes(col: Column | str) -> Column:
    """array<long>: 32-bit md5-prefix hash per distinct token. Materialize
    this as a column before calling simhash32_from_hashes — the signature
    loop reads it 32 times."""
    toks = F.array_distinct(tokens(col))
    return F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
    )


def simhash32_from_hashes(hashes: Column) -> Column:
    """32-bit SimHash from a materialized token-hash array (exact long
    arithmetic, so the DuckDB oracle reproduces it bit-for-bit).

    bit j of the signature is 1 iff sum over tokens of
    (bit j of hash ? +1 : -1) is > 0.
    """
    return simhash_from_hashes(hashes, 32)


def simhash32(col: Column | str) -> Column:
    """Convenience wrapper: simhash straight from a text column (small
    inputs; hot paths should materialize token_hashes first)."""
    return simhash32_from_hashes(token_hashes(col))


def token_hashes60(col: Column | str) -> Column:
    """array<long>: 60-bit md5-prefix hash per distinct token (15 hex chars
    — stays inside signed-long range in both Spark and DuckDB; 16 would
    overflow on the high nibble)."""
    toks = F.array_distinct(tokens(col))
    return F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
    )


def simhash_from_hashes(hashes: Column, bits: int) -> Column:
    """``bits``-wide SimHash from a materialized token-hash array (exact
    long arithmetic — engine-portable). bit j is 1 iff the j-bit majority
    vote over token hashes is positive."""
    def _vote(j: int):
        mask = F.lit(1 << j)
        return lambda acc, h: acc + F.when(
            h.bitwiseAND(mask) != 0, F.lit(1)
        ).otherwise(F.lit(-1))

    sig = F.lit(0).cast("long")
    for j in range(bits):
        vote = F.aggregate(hashes, F.lit(0), _vote(j))
        sig = sig + F.when(vote > 0, F.lit(1 << j)).otherwise(F.lit(0)).cast("long")
    return sig


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs: a 60-BIT signature (32 bits saturate — on a
    shared-vocabulary corpus 32-bit majority votes collide for ~1% of ALL
    pairs at Hamming 0) banded into ``n_bands`` 15-bit keys (pigeonhole:
    any pair within Hamming distance ``n_bands - 1`` MUST collide in >= 1
    band — exact candidate recall, not probabilistic), bucket-join per
    band, exact Hamming rescore via xor bit-count.

    All integer arithmetic — the DuckDB oracle reproduces signatures,
    banding, and distances bit-for-bit. Scale shape matches minhash-LSH:
    equi-joins on (band, key), no pairwise work outside shared buckets.
    """
    band_bits = 60 // n_bands
    band_mask = (1 << band_bits) - 1
    sigs = df.select(
        F.col(id_col).alias("vid"),
        simhash_from_hashes(token_hashes60(text_col), 60).alias("sig"),
    )
    bands = sigs.select(
        "vid",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("sig", band_bits * b)
                        .bitwiseAND(F.lit(band_mask))
                        .alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("vid", "sig", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    left = bands.select(
        F.col("vid").alias("id_1"), F.col("sig").alias("sig_1"), "band", "key"
    )
    right = bands.select(
        F.col("vid").alias("id_2"), F.col("sig").alias("sig_2"), "band", "key"
    )
    cand = (
        left.join(right, ["band", "key"])
        .filter(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2", "sig_1", "sig_2")
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_1").bitwiseXOR(F.col("sig_2")))
    return (
        cand.select("id_1", "id_2", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("hamming", "id_1", "id_2")
    )
