"""Vector workload over the `embeddings` table: similarity search (J7/J9),
embedding sanity stats (A20), and embedding-cosine near-dup detection.

Cosine runs JVM-side via higher-order functions (functions/vector.py); the
DuckDB oracle recomputes it with list_transform/list_sum over the same
double-cast arrays so accumulation order matches and hashes agree after
6-digit rounding.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..ckpt import cut_lineage
from ..functions.vector import as_double_array, cosine, l2_norm
from ..operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_near_dup_pairs,
    lsh_topk,
)
from ..sources.tables import load_table

# DuckDB twins for dot/norm over the float[] column (cast to double first;
# both engines then accumulate left-to-right in double).
_DDOT = (
    "list_sum(list_transform(list_zip(CAST(a.embedding AS DOUBLE[]),"
    " CAST(b.embedding AS DOUBLE[])), p -> p[1] * p[2]))"
)
_DNORM_A = "sqrt(list_sum(list_transform(CAST(a.embedding AS DOUBLE[]), x -> x * x)))"
_DNORM_B = "sqrt(list_sum(list_transform(CAST(b.embedding AS DOUBLE[]), x -> x * x)))"


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


def vec_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A20: L2-norm distribution per label."""
    e = _emb(spark, sf_dir).select(
        "label", l2_norm(as_double_array("embedding")).alias("norm")
    )
    return e.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg("norm"), 6).alias("avg_norm"),
        F.round(F.min("norm"), 6).alias("min_norm"),
        F.round(F.max("norm"), 6).alias("max_norm"),
    )


VEC_NORM_STATS_SQL = """
WITH n AS (
  SELECT label,
         sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS norm
  FROM embeddings
)
SELECT label, count(*) AS n_vectors,
       round(avg(norm), 6) AS avg_norm,
       round(min(norm), 6) AS min_norm,
       round(max(norm), 6) AS max_norm
FROM n GROUP BY label
"""


def vec_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 exact top-k similarity join: every 25th vector queries the corpus."""
    e = _emb(spark, sf_dir)
    queries = e.filter(F.col("vec_id") % 25 == 0)
    return brute_force_topk(queries, e, "vec_id", "embedding", k=5)


VEC_KNN_SQL = f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 25 = 0),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         round(
           CASE WHEN {_DNORM_A} * {_DNORM_B} > 0
                THEN {_DDOT} / ({_DNORM_A} * {_DNORM_B})
                ELSE 0.0 END, 6) AS sim
  FROM q a CROSS JOIN embeddings b
  WHERE a.vec_id <> b.vec_id
)
SELECT query_id, neighbor_id, rank, sim
FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY sim DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
)
WHERE rank <= 5
"""


# The testdata embeddings are near-orthogonal (max within-label cosine at
# sf0.01 is 0.47), so a true 0.95 dedup threshold returns zero rows and the
# oracle would be trivially green. The declared query therefore runs the SAME
# banded-LSH machinery at threshold 0.35 so the candidate-generation + exact
# rescore path is exercised with real rows (136 at sf0.01); production dedup
# keeps the 0.95 default on `lsh_near_dup_pairs`.
_NEAR_DUP_THRESHOLD = 0.35
_NEAR_DUP_BANDS = 4
_NEAR_DUP_PPB = 4


def vec_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (training-data dedup) via
    banded hyperplane LSH: candidates collide in >= 1 of 4 bands (4 planes
    each), then exact cosine rescore + threshold. All equi-joins — no label
    all-pairs, no cross product (pinned by tests/test_plans)."""
    e = _emb(spark, sf_dir)
    return lsh_near_dup_pairs(
        e,
        "vec_id",
        "embedding",
        threshold=_NEAR_DUP_THRESHOLD,
        n_bands=_NEAR_DUP_BANDS,
        planes_per_band=_NEAR_DUP_PPB,
    )


def _sql_band_bucket(col: str, band: int, planes_per_band: int, dims: int) -> str:
    """DuckDB twin of operators.similarity.hyperplane_bucket for one band:
    the same md5-derived ±1 sign literals, the same left-to-right double
    accumulation (list_sum over list_zip mirrors zip_with + aggregate)."""
    from ..operators.similarity import _plane_signs

    terms = []
    for i in range(planes_per_band):
        p = band * planes_per_band + i
        arr = "[" + ",".join(repr(s) for s in _plane_signs(p, dims)) + "]"
        proj = (
            f"list_sum(list_transform(list_zip({col}, CAST({arr} AS DOUBLE[])),"
            " z -> z[1] * z[2]))"
        )
        terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << i} ELSE 0 END)")
    return " + ".join(terms)


# the guarded exact cosine over aliases x.e / y.e — ONE copy shared by
# every banded-LSH oracle (near-dup, semantic dedup, k-NN) so the twins
# cannot drift from each other
from .._sql_cos import _XY_COS  # noqa: F401  (shared with the hybrid oracle)


def _bucket_union_sql(
    src: str, n_bands: int, planes_per_band: int, dims: int = 64
) -> str:
    """One (vec_id, band, bucket) SELECT per band over relation ``src``
    (whose vector column is ``e``) — the shared banding half of every
    LSH oracle."""
    return " UNION ALL ".join(
        f"SELECT vec_id, {b} AS band,"
        f" {_sql_band_bucket('e', b, planes_per_band, dims)} AS bucket FROM {src}"
        for b in range(n_bands)
    )


def _near_dup_oracle_sql(
    threshold: float, n_bands: int, planes_per_band: int, dims: int = 64
) -> str:
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
bk AS ({_bucket_union_sql('v', n_bands, planes_per_band, dims)}),
cand AS (
  SELECT DISTINCT a.vec_id AS id_1, b2.vec_id AS id_2
  FROM bk a JOIN bk b2
    ON a.band = b2.band AND a.bucket = b2.bucket AND a.vec_id < b2.vec_id
)
SELECT id_1, id_2, round({_XY_COS}, 6) AS sim
FROM cand c JOIN v x ON c.id_1 = x.vec_id JOIN v y ON c.id_2 = y.vec_id
WHERE round({_XY_COS}, 6) >= {threshold}
ORDER BY sim DESC, id_1 ASC, id_2 ASC
"""


VEC_NEAR_DUP_SQL = _near_dup_oracle_sql(
    _NEAR_DUP_THRESHOLD, _NEAR_DUP_BANDS, _NEAR_DUP_PPB
)


def vec_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 approximate ANN via deterministic banded hyperplane-LSH buckets
    (OR-of-8-bands × AND-of-4-planes; recall@5 vs brute force gated in
    tests/test_operators.py).

    FULLY oracle-gated despite being approximate: the plane family is
    md5-derived, so the DuckDB twin replays the banding, candidate join,
    and exact rescore bit-for-bit — the hash gate certifies the
    approximation's exact candidate structure, not just row counts."""
    e = _emb(spark, sf_dir)
    queries = e.filter(F.col("vec_id") % 25 == 0)
    return lsh_topk(queries, e, "vec_id", "embedding", k=5)


def _knn_lsh_oracle_sql(
    n_bands: int, planes_per_band: int, k: int, dims: int = 64
) -> str:
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
q AS (SELECT * FROM v WHERE vec_id % 25 = 0),
qb AS ({_bucket_union_sql('q', n_bands, planes_per_band, dims)}),
cb AS ({_bucket_union_sql('v', n_bands, planes_per_band, dims)}),
cand AS (
  SELECT DISTINCT a.vec_id AS query_id, b2.vec_id AS neighbor_id
  FROM qb a JOIN cb b2 ON a.band = b2.band AND a.bucket = b2.bucket
  WHERE a.vec_id <> b2.vec_id
),
scored AS (
  SELECT c.query_id, c.neighbor_id, round({_XY_COS}, 6) AS sim
  FROM cand c JOIN v x ON c.query_id = x.vec_id
              JOIN v y ON c.neighbor_id = y.vec_id
)
SELECT query_id, neighbor_id, rank, sim
FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY sim DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
)
WHERE rank <= {k}
"""


VEC_KNN_LSH_SQL = _knn_lsh_oracle_sql(8, 4, 5)


def vec_knn_ivf_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a FIXED coarse quantizer (cells = the 16 lowest-id
    vectors): same assignment/probe/rescore machinery as the k-means IVF
    (`vec_knn_ivf`), but with deterministic centroids the DuckDB twin can
    reconstruct — so the cell assignment (d² = |c|²−2·v·c, stable
    cell-index tie-break), the nprobe=4 probe, and the per-cell exact
    rescore are all value-hash gated. The trained variant stays rows-only
    (k-means is not standalone-SQL-expressible); this one certifies every
    moving part around the training."""
    from ..operators.similarity import ivf_topk

    e = _emb(spark, sf_dir)
    cents = [
        [float(x) for x in r["embedding"]]
        for r in e.select("vec_id", "embedding").orderBy("vec_id").limit(16).collect()
    ]
    queries = e.filter(F.col("vec_id") % 25 == 0)
    return ivf_topk(
        queries, e, "vec_id", "embedding", k=5, n_cells=16, nprobe=4,
        centroids=cents,
    )


def _knn_ivf_fixed_oracle_sql(n_cells: int, nprobe: int, k: int) -> str:
    # d² = |c|² − 2·v·c (the |v|² term is rank-invariant), tie-break on
    # cell index — mirrors operators.similarity._nearest_cells_udf
    d2 = (
        "list_sum(list_transform(ce, t -> t * t))"
        " - 2 * list_sum(list_transform(list_zip(e, ce), z -> z[1] * z[2]))"
    )
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
c AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell,
         e AS ce
  FROM (SELECT vec_id, e FROM v ORDER BY vec_id LIMIT {n_cells})
),
dist AS (
  SELECT v.vec_id, c.cell, {d2} AS d2 FROM v CROSS JOIN c
),
corpus_cell AS (
  SELECT vec_id, cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                ORDER BY d2 ASC, cell ASC) AS rn
    FROM dist
  ) WHERE rn = 1
),
q_probe AS (
  SELECT vec_id, cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                ORDER BY d2 ASC, cell ASC) AS rn
    FROM dist WHERE vec_id % 25 = 0
  ) WHERE rn <= {nprobe}
),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, m.vec_id AS neighbor_id
  FROM q_probe q JOIN corpus_cell m ON q.cell = m.cell
  WHERE q.vec_id <> m.vec_id
),
scored AS (
  SELECT c.query_id, c.neighbor_id, round({_XY_COS}, 6) AS sim
  FROM cand c JOIN v x ON c.query_id = x.vec_id
              JOIN v y ON c.neighbor_id = y.vec_id
)
SELECT query_id, neighbor_id, rank, sim
FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY sim DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
)
WHERE rank <= {k}
"""


VEC_KNN_IVF_FIXED_SQL = _knn_ivf_fixed_oracle_sql(16, 4, 5)


def vec_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 approximate ANN via IVF with the TRAINED k-means coarse quantizer
    — the second scale path next to LSH, mirroring FAISS IVF semantics:
    the quantizer is trained ONCE at index-build time (tools/train_ivf.py
    runs the deterministic `train_centroids` — hash-ordered sample,
    farthest-point seeding, fixed Lloyd iterations, no RNG — and commits
    the centroid matrix to `_ivf_quantizer.py`) and every search reuses it,
    exactly as FAISS separates `train()` from `search()` (reference builds
    its index once the same way,
    `/root/reference/src/lakehouse/indexing/faiss_builder.py:30-147`).

    FULLY value-hash gated: the DuckDB twin embeds the same centroid
    literals (repr round-trips float64 exactly), so cell assignment, the
    nprobe probe, and the per-cell exact rescore all replay in SQL.
    Training determinism itself is pinned by
    tests/test_operators.py::test_train_centroids_reproduces_committed_quantizer."""
    from ._ivf_quantizer import CENTROIDS

    e = _emb(spark, sf_dir)
    queries = e.filter(F.col("vec_id") % 25 == 0)
    return ivf_topk(
        queries, e, "vec_id", "embedding", k=5, n_cells=16, nprobe=4,
        centroids=CENTROIDS,
    )


def _knn_ivf_trained_oracle_sql(nprobe: int, k: int) -> str:
    """Same probe/rescore structure as the fixed-quantizer twin, with the
    cell CTE built from the committed trained-centroid literals."""
    from ._ivf_quantizer import CENTROIDS

    rows = ",\n    ".join(
        f"({i}, [{', '.join(repr(x) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(CENTROIDS)
    )
    d2 = (
        "list_sum(list_transform(ce, t -> t * t))"
        " - 2 * list_sum(list_transform(list_zip(e, ce), z -> z[1] * z[2]))"
    )
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
c(cell, ce) AS (
  VALUES
    {rows}
),
dist AS (
  SELECT v.vec_id, c.cell, {d2} AS d2 FROM v CROSS JOIN c
),
corpus_cell AS (
  SELECT vec_id, cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                ORDER BY d2 ASC, cell ASC) AS rn
    FROM dist
  ) WHERE rn = 1
),
q_probe AS (
  SELECT vec_id, cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                ORDER BY d2 ASC, cell ASC) AS rn
    FROM dist WHERE vec_id % 25 = 0
  ) WHERE rn <= {nprobe}
),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, m.vec_id AS neighbor_id
  FROM q_probe q JOIN corpus_cell m ON q.cell = m.cell
  WHERE q.vec_id <> m.vec_id
),
scored AS (
  SELECT c.query_id, c.neighbor_id, round({_XY_COS}, 6) AS sim
  FROM cand c JOIN v x ON c.query_id = x.vec_id
              JOIN v y ON c.neighbor_id = y.vec_id
)
SELECT query_id, neighbor_id, rank, sim
FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY sim DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
)
WHERE rank <= {k}
"""


VEC_KNN_IVF_SQL = _knn_ivf_trained_oracle_sql(4, 5)


def vec_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 approximate ANN via PRODUCT QUANTIZATION (Jégou et al. 2011 —
    the FAISS IndexPQ construction): offline-trained per-subvector
    codebooks (tools/train_pq.py → `_pq_codebooks.py`, same train/search
    split as the IVF quantizer), asymmetric-distance shortlist over the
    8-int compressed codes, exact cosine rescore of the shortlist only.
    The 100 TB point: the corpus-sized scan touches codes (~32× fewer
    bytes than raw float32 vectors) and does table-lookup sums JVM-side;
    full vectors are read only for shortlist survivors.

    FULLY value-hash gated: the DuckDB twin embeds the same codebook
    literals and replays encode → LUT → ADC → shortlist → rescore with
    identical operand ordering."""
    from ..operators.pq import pq_topk
    from ._pq_codebooks import CODEBOOKS

    e = _emb(spark, sf_dir)
    queries = e.filter(F.col("vec_id") % 25 == 0)
    return pq_topk(
        queries, e, "vec_id", "embedding", CODEBOOKS, k=5, shortlist=64
    )


def _knn_pq_oracle_sql(k: int, shortlist: int) -> str:
    from ._pq_codebooks import CODEBOOKS, K_CODES, M_SUBVECTORS

    sub = len(CODEBOOKS[0][0])
    rows = ",\n    ".join(
        f"({mi}, {j}, [{', '.join(repr(x) for x in c)}]::DOUBLE[])"
        for mi, book in enumerate(CODEBOOKS)
        for j, c in enumerate(book)
    )
    seg = f"e[(cb.mi*{sub}+1):(cb.mi*{sub}+{sub})]"
    mis = ", ".join(str(i) for i in range(M_SUBVECTORS))
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
cb(mi, j, ce) AS (
  VALUES
    {rows}
),
enc_d AS (
  SELECT v.vec_id, cb.mi, cb.j,
         list_sum(list_transform(cb.ce, t -> t * t))
           - 2 * list_sum(list_transform(list_zip({seg}, cb.ce),
                                         z -> z[1] * z[2])) AS d2
  FROM v CROSS JOIN cb
),
codes AS (
  SELECT vec_id, list(j ORDER BY mi) AS codes FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, mi
                ORDER BY d2 ASC, j ASC) AS rn
    FROM enc_d
  ) WHERE rn = 1 GROUP BY vec_id
),
lut_d AS (
  SELECT v.vec_id, cb.mi, cb.j,
         list_sum(list_transform(list_zip({seg}, cb.ce),
                                 z -> (z[1] - z[2]) * (z[1] - z[2]))) AS d2
  FROM v CROSS JOIN cb WHERE v.vec_id % 25 = 0
),
lut AS (
  SELECT vec_id, list(d2 ORDER BY mi, j) AS lut FROM lut_d GROUP BY vec_id
),
adc AS (
  SELECT l.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_sum(list_transform([{mis}],
           mi -> list_extract(l.lut,
                   mi * {K_CODES} + list_extract(c.codes, mi + 1) + 1))) AS adc_d2
  FROM lut l CROSS JOIN codes c WHERE l.vec_id <> c.vec_id
),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY adc_d2 ASC, neighbor_id ASC) AS srank
    FROM adc
  ) WHERE srank <= {shortlist}
),
scored AS (
  SELECT s.query_id, s.neighbor_id, round({_XY_COS}, 6) AS sim
  FROM short s JOIN v x ON s.query_id = x.vec_id
               JOIN v y ON s.neighbor_id = y.vec_id
)
SELECT query_id, neighbor_id, rank, sim
FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY sim DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
)
WHERE rank <= {k}
"""


VEC_KNN_PQ_SQL = _knn_pq_oracle_sql(5, 64)


def vec_knn_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 approximate ANN via IVF-PQ — the canonical 100 TB index (FAISS
    IndexIVFPQ; Jégou et al. 2011 §IV): the committed coarse quantizer
    prunes to nprobe/16 of the corpus, committed RESIDUAL codebooks
    (tools/train_ivfpq.py) compress what remains to 8-int codes, ADC runs
    as an equi-join on the cell id + JVM-side lookup sums, and only the
    shortlist reads full vectors.

    FULLY value-hash gated: the DuckDB twin replays cell assignment,
    residual encode, per-(query, cell) LUT, ADC join, shortlist, and
    rescore from the same two literal artifacts."""
    from ..operators.pq import ivfpq_topk
    from ._ivf_quantizer import CENTROIDS
    from ._ivfpq_codebooks import CODEBOOKS

    e = _emb(spark, sf_dir)
    queries = e.filter(F.col("vec_id") % 25 == 0)
    return ivfpq_topk(
        queries, e, "vec_id", "embedding", CENTROIDS, CODEBOOKS,
        k=5, nprobe=4, shortlist=64,
    )


def _knn_ivfpq_oracle_sql(nprobe: int, k: int, shortlist: int) -> str:
    from ._ivf_quantizer import CENTROIDS
    from ._ivfpq_codebooks import CODEBOOKS, K_CODES, M_SUBVECTORS

    sub = len(CODEBOOKS[0][0])
    cent_rows = ",\n    ".join(
        f"({i}, [{', '.join(repr(x) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(CENTROIDS)
    )
    book_rows = ",\n    ".join(
        f"({mi}, {j}, [{', '.join(repr(x) for x in c)}]::DOUBLE[])"
        for mi, book in enumerate(CODEBOOKS)
        for j, c in enumerate(book)
    )
    # cell distance: same |c|²−2·v·c form as the IVF twins
    dcell = (
        "list_sum(list_transform(ce, t -> t * t))"
        " - 2 * list_sum(list_transform(list_zip(e, ce), z -> z[1] * z[2]))"
    )
    res_seg = f"r[(rb.mi*{sub}+1):(rb.mi*{sub}+{sub})]"
    mis = ", ".join(str(i) for i in range(M_SUBVECTORS))
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
c(cell, ce) AS (
  VALUES
    {cent_rows}
),
rb(mi, j, ce) AS (
  VALUES
    {book_rows}
),
cell_d AS (
  SELECT v.vec_id, c.cell, {dcell} AS d2 FROM v CROSS JOIN c
),
vcell AS (
  SELECT vec_id, cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                ORDER BY d2 ASC, cell ASC) AS rn
    FROM cell_d
  ) WHERE rn = 1
),
-- residual = v − centroid(cell), exact elementwise
vres AS (
  SELECT v.vec_id, vc.cell,
         list_transform(list_zip(v.e, c.ce), z -> z[1] - z[2]) AS r
  FROM v JOIN vcell vc ON v.vec_id = vc.vec_id JOIN c ON vc.cell = c.cell
),
enc_d AS (
  SELECT vr.vec_id, rb.mi, rb.j,
         list_sum(list_transform(rb.ce, t -> t * t))
           - 2 * list_sum(list_transform(list_zip({res_seg}, rb.ce),
                                         z -> z[1] * z[2])) AS d2
  FROM vres vr CROSS JOIN rb
),
codes AS (
  SELECT vec_id, list(j ORDER BY mi) AS codes FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, mi
                ORDER BY d2 ASC, j ASC) AS rn
    FROM enc_d
  ) WHERE rn = 1 GROUP BY vec_id
),
q_probe AS (
  SELECT vec_id, cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                ORDER BY d2 ASC, cell ASC) AS rn
    FROM cell_d WHERE vec_id % 25 = 0
  ) WHERE rn <= {nprobe}
),
-- per-(query, probed cell) residual against THAT cell's centroid
qres AS (
  SELECT q.vec_id, q.cell,
         list_transform(list_zip(v.e, c.ce), z -> z[1] - z[2]) AS r
  FROM q_probe q JOIN v ON q.vec_id = v.vec_id JOIN c ON q.cell = c.cell
),
lut_d AS (
  SELECT qr.vec_id, qr.cell, rb.mi, rb.j,
         list_sum(list_transform(list_zip({res_seg}, rb.ce),
                                 z -> (z[1] - z[2]) * (z[1] - z[2]))) AS d2
  FROM qres qr CROSS JOIN rb
),
lut AS (
  SELECT vec_id, cell, list(d2 ORDER BY mi, j) AS lut
  FROM lut_d GROUP BY vec_id, cell
),
adc AS (
  SELECT l.vec_id AS query_id, m.vec_id AS neighbor_id,
         list_sum(list_transform([{mis}],
           mi -> list_extract(l.lut,
                   mi * {K_CODES} + list_extract(cd.codes, mi + 1) + 1))) AS adc_d2
  FROM lut l
  JOIN vcell m ON l.cell = m.cell
  JOIN codes cd ON m.vec_id = cd.vec_id
  WHERE l.vec_id <> m.vec_id
),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY adc_d2 ASC, neighbor_id ASC) AS srank
    FROM adc
  ) WHERE srank <= {shortlist}
),
scored AS (
  SELECT s.query_id, s.neighbor_id, round({_XY_COS}, 6) AS sim
  FROM short s JOIN v x ON s.query_id = x.vec_id
               JOIN v y ON s.neighbor_id = y.vec_id
)
SELECT query_id, neighbor_id, rank, sim
FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY sim DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
)
WHERE rank <= {k}
"""


VEC_KNN_IVFPQ_SQL = _knn_ivfpq_oracle_sql(4, 5, 64)


def vec_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid components (elementwise mean over the embedding
    column) — posexplode → groupBy(label, pos); at scale this is the partial-
    aggregated reduction a k-means/IVF coarse quantizer is built from."""
    e = _emb(spark, sf_dir)
    return (
        e.select("label", F.posexplode(as_double_array("embedding")).alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg("v"), 6).alias("avg_val"))
    )


VEC_LABEL_CENTROIDS_SQL = """
-- dimension-agnostic posexplode twin (indexed list_transform + unnest),
-- the VEC_EMBEDDING_DRIFT_SQL convention: explodes each row's ACTUAL
-- array so a corpus with a different dimensionality cannot silently
-- truncate/NULL-pad the twin
WITH exu AS (
  SELECT label,
         unnest(list_transform(embedding, (v, i) -> {'i': i, 'v': v})) AS u
  FROM embeddings
)
SELECT label, u.i - 1 AS pos,
       round(avg(CAST(u.v AS DOUBLE)), 6) AS avg_val
FROM exu
GROUP BY label, pos
"""


# Cap on sampled vectors per label for the similarity matrix: bounds the
# pairwise stage at (n_labels * cap)² rows no matter the corpus size.
_SIM_MATRIX_CAP = 20


def vec_label_similarity_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-quality matrix: mean pairwise cosine within and across
    labels (a sane encoder has a hot diagonal), computed over a
    DETERMINISTIC per-label sample (first `_SIM_MATRIX_CAP` rows per label
    ordered by md5(vec_id) — a seeded shuffle both engines reproduce
    bit-identically). The pairwise stage is then a bounded broadcast
    nested-loop over <= labels*cap rows — never an O(n²) cross join over
    the corpus; the per-label window shuffles once on the label key."""
    from ..functions.vector import dot, l2_norm
    from pyspark.sql import Window

    e = _emb(spark, sf_dir)
    w = Window.partitionBy("label").orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id"
    )
    s = (
        e.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= _SIM_MATRIX_CAP)
        .drop("_rk")
    )
    a = s.select(
        F.col("label").alias("label_1"),
        F.col("vec_id").alias("id_1"),
        as_double_array("embedding").alias("va"),
    ).withColumn("na", l2_norm(F.col("va")))
    b = s.select(
        F.col("label").alias("label_2"),
        F.col("vec_id").alias("id_2"),
        as_double_array("embedding").alias("vb"),
    ).withColumn("nb", l2_norm(F.col("vb")))
    den = F.col("na") * F.col("nb")
    pairs = (
        F.broadcast(a)
        .crossJoin(b)
        .filter(F.col("id_1") < F.col("id_2"))
        .select(
            "label_1",
            "label_2",
            F.when(den > 0, dot(F.col("va"), F.col("vb")) / den)
            .otherwise(F.lit(0.0))
            .alias("sim"),
        )
    )
    return pairs.groupBy("label_1", "label_2").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg("sim"), 6).alias("avg_sim"),
    )


_PAIR_COS = (
    "list_sum(list_transform(list_zip(CAST(a.embedding AS DOUBLE[]),"
    " CAST(b.embedding AS DOUBLE[])), p -> p[1] * p[2]))"
    " / (sqrt(list_sum(list_transform(CAST(a.embedding AS DOUBLE[]), x -> x * x)))"
    " * sqrt(list_sum(list_transform(CAST(b.embedding AS DOUBLE[]), x -> x * x))))"
)

VEC_LABEL_SIM_MATRIX_SQL = f"""
WITH s AS (
  SELECT vec_id, label, embedding FROM (
    SELECT vec_id, label, embedding,
           row_number() OVER (PARTITION BY label
                              ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
    FROM embeddings)
  WHERE rk <= {_SIM_MATRIX_CAP}
)
SELECT a.label AS label_1, b.label AS label_2,
       count(*) AS n_pairs,
       round(avg({_PAIR_COS}), 6) AS avg_sim
FROM s a JOIN s b ON a.vec_id < b.vec_id
GROUP BY 1, 2
"""


def vec_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped semantic deduplication, end-to-end: banded
    hyperplane-LSH cosine near-dup pairs (`vec_near_dup_pairs` machinery)
    folded into TRANSITIVE clusters via connected components, one keeper
    (min vec_id) per cluster. This is the full embedding-dedup pipeline a
    curation run executes — pair detection alone under-deletes chains
    (A~B, B~C must drop both B and C). The DuckDB twin replays the sign
    projections, banding, rescore, and the transitive closure (recursive
    CTE), so the oracle checks the cluster structure itself."""
    from ..operators.graph import dup_clusters

    e = _emb(spark, sf_dir)
    pairs = lsh_near_dup_pairs(
        e,
        "vec_id",
        "embedding",
        threshold=_NEAR_DUP_THRESHOLD,
        n_bands=_NEAR_DUP_BANDS,
        planes_per_band=_NEAR_DUP_PPB,
    )
    return (
        dup_clusters(pairs, "id_1", "id_2")
        .select(
            F.col("doc_id").alias("vec_id"), "component_id", "is_keeper"
        )
        .orderBy("component_id", "vec_id")
    )


def _semantic_dedup_oracle_sql(
    threshold: float, n_bands: int, planes_per_band: int, dims: int = 64
) -> str:
    return f"""
WITH RECURSIVE v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
bk AS ({_bucket_union_sql('v', n_bands, planes_per_band, dims)}),
cand AS (
  SELECT DISTINCT a.vec_id AS id_1, b2.vec_id AS id_2
  FROM bk a JOIN bk b2
    ON a.band = b2.band AND a.bucket = b2.bucket AND a.vec_id < b2.vec_id
),
pairs AS (
  SELECT id_1, id_2
  FROM cand c JOIN v x ON c.id_1 = x.vec_id JOIN v y ON c.id_2 = y.vec_id
  WHERE round({_XY_COS}, 6) >= {threshold}
),
sym AS MATERIALIZED (
  SELECT id_1 AS s, id_2 AS d FROM pairs
  UNION
  SELECT id_2, id_1 FROM pairs
),
reach(n, r) AS (
  SELECT DISTINCT s, s FROM sym
  UNION
  SELECT sym.d, reach.r FROM reach JOIN sym ON reach.n = sym.s
)
SELECT n AS vec_id, min(r) AS component_id, n = min(r) AS is_keeper
FROM reach GROUP BY n
ORDER BY component_id, vec_id
"""


VEC_SEMANTIC_DEDUP_SQL = _semantic_dedup_oracle_sql(
    _NEAR_DUP_THRESHOLD, _NEAR_DUP_BANDS, _NEAR_DUP_PPB
)


# Production operating point (SemDeDup-style curation): 0.95 cosine with
# (8 bands x 12 planes) banding. Selectivity lives in the AND-width:
# p_plane(0.95) = 1 - arccos(.95)/pi = 0.899, so recall on true 0.95-pairs
# = 1-(1-.899^12)^8 = 0.93 while the random-pair candidate rate is
# 8*(1/2)^12 = 0.2% (few bands x MANY planes; the 0.35 stress variant's
# 4x4 shape would pass ~23% of all pairs, and widening bands without
# widening planes RAISES the rate — OR-construction). This is the cost
# profile a real curation run pays; the stress variant stays registered
# for oracle coverage of the low-threshold path.
_PROD_DEDUP_THRESHOLD = 0.95
_PROD_DEDUP_BANDS = 8
_PROD_DEDUP_PPB = 12


def vec_semantic_dedup_p95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`vec_semantic_dedup` at the production knobs (threshold 0.95,
    8 bands x 12 planes) — the operating point users actually run;
    headline-bench entry so the suite number reflects real usage, per
    SCALING.md."""
    from ..operators.graph import dup_clusters

    e = _emb(spark, sf_dir)
    pairs = lsh_near_dup_pairs(
        e,
        "vec_id",
        "embedding",
        threshold=_PROD_DEDUP_THRESHOLD,
        n_bands=_PROD_DEDUP_BANDS,
        planes_per_band=_PROD_DEDUP_PPB,
    )
    return (
        dup_clusters(pairs, "id_1", "id_2")
        .select(
            F.col("doc_id").alias("vec_id"), "component_id", "is_keeper"
        )
        .orderBy("component_id", "vec_id")
    )


VEC_SEMANTIC_DEDUP_P95_SQL = _semantic_dedup_oracle_sql(
    _PROD_DEDUP_THRESHOLD, _PROD_DEDUP_BANDS, _PROD_DEDUP_PPB
)


def vec_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (contrastive-training data prep): for every
    40th vector, the 5 most-similar vectors with a DIFFERENT label —
    broadcast queries, corpus streams, label predicate applied before the
    rank so the top-k is over the negative pool."""
    from ..operators.similarity import hard_negatives

    e = _emb(spark, sf_dir)
    queries = e.filter(F.col("vec_id") % 40 == 0)
    return hard_negatives(queries, e, "vec_id", "embedding", "label", k=5)


VEC_HARD_NEGATIVES_SQL = f"""
WITH q AS (SELECT vec_id, label, embedding FROM embeddings WHERE vec_id % 40 = 0),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         round(
           CASE WHEN {_DNORM_A} * {_DNORM_B} > 0
                THEN {_DDOT} / ({_DNORM_A} * {_DNORM_B})
                ELSE 0.0 END, 6) AS sim
  FROM q a CROSS JOIN embeddings b
  WHERE a.vec_id <> b.vec_id AND a.label <> b.label
)
SELECT query_id, neighbor_id, rank, sim
FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY sim DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
)
WHERE rank <= 5
"""


def vec_contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive triplet dataset (anchor / best same-label positive /
    top-2 hard negatives) for every 40th vector — the composed
    training-data artifact built from one scored pass (see
    `operators/similarity.py:contrastive_triplets`)."""
    from ..operators.similarity import contrastive_triplets

    e = _emb(spark, sf_dir)
    anchors = e.filter(F.col("vec_id") % 40 == 0)
    return contrastive_triplets(
        anchors, e, "vec_id", "embedding", "label", n_negatives=2
    )


VEC_CONTRASTIVE_SQL = f"""
WITH q AS (SELECT vec_id, label, embedding FROM embeddings WHERE vec_id % 40 = 0),
scored AS (
  SELECT a.vec_id AS query_id,
         CASE WHEN a.label = b.label THEN 'pos' ELSE 'neg' END AS role,
         b.vec_id AS other_id,
         round(
           CASE WHEN {_DNORM_A} * {_DNORM_B} > 0
                THEN {_DDOT} / ({_DNORM_A} * {_DNORM_B})
                ELSE 0.0 END, 6) AS sim
  FROM q a CROSS JOIN embeddings b
  WHERE a.vec_id <> b.vec_id
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id, role
                   ORDER BY sim DESC, other_id ASC) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, role, rank, other_id, sim
FROM ranked
WHERE (role = 'pos' AND rank = 1) OR (role = 'neg' AND rank <= 2)
"""


def vec_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-dimension health: per dimension — mean, variance
    (E[x²]−E[x]² in one pass), and the zero fraction. Dead or collapsed
    dimensions (≈0 variance) are the classic sign of a broken encoder or a
    truncated export; this is the per-dimension companion to the per-vector
    norm battery (A20). posexplode fans each vector into (dim, value) rows
    — n·d rows but fully map-side-combinable into d output groups."""
    e = _emb(spark, sf_dir).select(
        F.posexplode(as_double_array("embedding")).alias("dim", "x")
    )
    s1 = F.sum(F.col("x").cast("decimal(28,12)"))
    s2 = F.sum((F.col("x") * F.col("x")).cast("decimal(28,12)"))
    n = F.count(F.lit(1))
    mean = (s1.cast("double") / n)
    return (
        e.groupBy("dim")
        .agg(
            n.alias("n"),
            F.round(mean, 6).alias("mean"),
            F.round(s2.cast("double") / n - mean * mean, 6).alias("variance"),
            F.round(
                F.sum((F.col("x") == 0.0).cast("long")) / n.cast("double"), 6
            ).alias("zero_frac"),
        )
        .orderBy("dim")
    )


VEC_DIM_STATS_SQL = """
WITH exu AS (
  -- dimension-agnostic posexplode twin (VEC_EMBEDDING_DRIFT_SQL convention)
  SELECT unnest(list_transform(embedding, (v, i) -> {'i': i, 'v': v})) AS u
  FROM embeddings
), ex AS (
  SELECT u.i - 1 AS dim, CAST(u.v AS DOUBLE) AS x FROM exu
)
SELECT dim, count(*) AS n,
       round(CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / count(*), 6) AS mean,
       round(CAST(sum(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE) / count(*)
             - (CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / count(*))
               * (CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / count(*)), 6) AS variance,
       round(sum(CASE WHEN x = 0.0 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6) AS zero_frac
FROM ex GROUP BY dim ORDER BY dim
"""


def vec_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift — the vector twin of `doc_drift_psi`: compare
    a reference slice (even vec_ids) against a current slice (odd) per
    dimension — mean shift, pooled variance, and a standardized drift
    score |Δmean|/σ_pooled. The production use: yesterday's embedding
    batch vs today's, catching encoder regressions / silent model swaps
    before they poison an index. One posexplode pass with conditional
    aggregation — both populations reduce in the SAME map-side-combined
    groupBy (no second scan, no join); d output rows regardless of corpus
    size. DECIMAL(28,12) sums keep the accumulation exact cross-engine
    (the vec_dim_stats convention)."""
    e = _emb(spark, sf_dir)
    ex = e.select(
        (F.col("vec_id") % 2).alias("grp"),
        F.posexplode(as_double_array("embedding")).alias("dim", "x"),
    )
    ref, cur = F.col("grp") == 0, F.col("grp") == 1

    def _s(cond, expr):
        return F.sum(F.when(cond, expr).cast("decimal(28,12)"))

    agg = ex.groupBy("dim").agg(
        F.sum(ref.cast("long")).alias("n_ref"),
        F.sum(cur.cast("long")).alias("n_cur"),
        _s(ref, F.col("x")).alias("_s1r"),
        _s(ref, F.col("x") * F.col("x")).alias("_s2r"),
        _s(cur, F.col("x")).alias("_s1c"),
        _s(cur, F.col("x") * F.col("x")).alias("_s2c"),
    )
    mr = F.col("_s1r").cast("double") / F.col("n_ref")
    mc = F.col("_s1c").cast("double") / F.col("n_cur")
    vr = F.col("_s2r").cast("double") / F.col("n_ref") - mr * mr
    vc = F.col("_s2c").cast("double") / F.col("n_cur") - mc * mc
    pooled = (vr + vc) / 2
    score = F.abs(mc - mr) / F.sqrt(pooled + F.lit(1e-12))
    return agg.select(
        "dim",
        "n_ref",
        "n_cur",
        F.round(mr, 6).alias("mean_ref"),
        F.round(mc, 6).alias("mean_cur"),
        F.round(mc - mr, 6).alias("mean_shift"),
        F.round(pooled, 6).alias("var_pooled"),
        F.round(score, 4).alias("drift_score"),
    ).orderBy("dim")


VEC_EMBEDDING_DRIFT_SQL = """
WITH exu AS (
  -- a true posexplode (indexed list_transform + unnest) over the row's
  -- ACTUAL array — the Spark side posexplodes whatever is there, so a
  -- corpus with a different embedding dimensionality must not silently
  -- truncate/NULL-pad the twin (a fixed generate_series(1, 64) would)
  SELECT vec_id % 2 AS grp,
         unnest(list_transform(embedding, (v, i) -> {'i': i, 'v': v})) AS u
  FROM embeddings
), ex AS (
  SELECT grp, u.i - 1 AS dim, CAST(u.v AS DOUBLE) AS x FROM exu
), agg AS (
  SELECT dim,
         count(*) FILTER (grp = 0) AS n_ref,
         count(*) FILTER (grp = 1) AS n_cur,
         CAST(sum(CAST(x AS DECIMAL(28,12))) FILTER (grp = 0) AS DOUBLE) AS s1r,
         CAST(sum(CAST(x * x AS DECIMAL(28,12))) FILTER (grp = 0) AS DOUBLE) AS s2r,
         CAST(sum(CAST(x AS DECIMAL(28,12))) FILTER (grp = 1) AS DOUBLE) AS s1c,
         CAST(sum(CAST(x * x AS DECIMAL(28,12))) FILTER (grp = 1) AS DOUBLE) AS s2c
  FROM ex GROUP BY dim
)
SELECT dim, n_ref, n_cur,
       round(s1r / n_ref, 6) AS mean_ref,
       round(s1c / n_cur, 6) AS mean_cur,
       round(s1c / n_cur - s1r / n_ref, 6) AS mean_shift,
       round(((s2r / n_ref - (s1r / n_ref) * (s1r / n_ref))
              + (s2c / n_cur - (s1c / n_cur) * (s1c / n_cur))) / 2, 6)
         AS var_pooled,
       round(abs(s1c / n_cur - s1r / n_ref)
             / sqrt(((s2r / n_ref - (s1r / n_ref) * (s1r / n_ref))
                     + (s2c / n_cur - (s1c / n_cur) * (s1c / n_cur))) / 2
                    + 1e-12), 4) AS drift_score
FROM agg ORDER BY dim
"""


# ---------------------------------------------------------------------------
# PCA pre-transform + canonical SemDeDup (committed-artifact discipline:
# tools/train_pca.py -> _pca_basis.py; the k-means cells reuse the IVF
# quantizer from tools/train_ivf.py -> _ivf_quantizer.py)
# ---------------------------------------------------------------------------


def _dlist(vals) -> str:
    return "[" + ", ".join(repr(float(x)) for x in vals) + "]::DOUBLE[]"


def vec_pca_coords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA projection of every 10th vector onto the offline-trained basis
    (`operators/pca.py`, FAISS-PCAMatrix-style train/apply split) — the
    dimensionality-reduction pre-step a 100 TB embedding pipeline runs
    before clustering/semantic dedup. Pure JVM-side map (zip_with +
    aggregate; no Python, no shuffle); row-level value-hash gated: the
    DuckDB twin centers and projects with the SAME float64 literals and
    the same left-to-right accumulation."""
    from ..operators.pca import pca_project
    from ._pca_basis import COMPONENTS, MEAN

    e = _emb(spark, sf_dir).filter(F.col("vec_id") % 10 == 0)
    p = pca_project(e, "embedding", MEAN, COMPONENTS)
    return p.select(
        "vec_id", F.posexplode("pca").alias("component", "c")
    ).select(
        "vec_id",
        "component",
        F.round("c", 6).alias("coord"),
    )


def _pca_coords_oracle_sql() -> str:
    from ._pca_basis import COMPONENTS, MEAN

    rows = ",\n    ".join(
        f"({j}, {_dlist(c)})" for j, c in enumerate(COMPONENTS)
    )
    return f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
  FROM embeddings WHERE vec_id % 10 = 0
),
cent AS (
  SELECT vec_id,
         list_transform(list_zip(e, {_dlist(MEAN)}), p -> p[1] - p[2]) AS ce
  FROM v
),
c(component, carr) AS (
  VALUES
    {rows}
)
SELECT vec_id, component,
       round(list_sum(list_transform(list_zip(ce, carr),
                                     p -> p[1] * p[2])), 6) AS coord
FROM cent CROSS JOIN c
"""


VEC_PCA_COORDS_SQL = _pca_coords_oracle_sql()


def vec_pca_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-component variance audit of the PCA projection over the FULL
    corpus: sample-trained eigenvalues vs corpus-projected variance (a
    drifted corpus shows up as var_coord pulling away from the trained
    eigenvalue — the monitoring twin of `vec_embedding_drift` in the
    reduced space). Eigenvalue/ratio columns are artifact literals shared
    verbatim with the twin; mean/var are cross-engine aggregations."""
    from ..operators.pca import pca_project
    from ._pca_basis import COMPONENTS, EIGENVALUES, MEAN

    total = sum(EIGENVALUES)
    lits = [
        (j, round(EIGENVALUES[j], 6), round(EIGENVALUES[j] / total, 6))
        for j in range(len(COMPONENTS))
    ]
    e = pca_project(_emb(spark, sf_dir), "embedding", MEAN, COMPONENTS)
    coords = e.select(F.posexplode("pca").alias("component", "c"))
    # DECIMAL(28,12) sums keep the accumulation exact, so Spark's partial
    # aggregation (partition-order reassociation) and DuckDB's sequential
    # sum cannot diverge at a round-6 boundary — the vec_dim_stats
    # convention (ADVICE r5: plain avg() here was layout-sensitive)
    s1 = F.sum(F.col("c").cast("decimal(28,12)"))
    s2 = F.sum((F.col("c") * F.col("c")).cast("decimal(28,12)"))
    n = F.count(F.lit(1))
    mean = s1.cast("double") / n
    stats = coords.groupBy("component").agg(
        n.alias("n_vectors"),
        # + 0.0 collapses IEEE -0.0 (a 6-dp round of a tiny negative
        # mean) to +0.0 on both engines so the value hash can't split
        (F.round(mean, 6) + F.lit(0.0)).alias("mean_coord"),
        (F.round(
            s2.cast("double") / n - mean * mean, 6
        ) + F.lit(0.0)).alias("var_coord"),
    )
    ev = spark.createDataFrame(
        lits, "component INT, eigenvalue DOUBLE, explained_ratio DOUBLE"
    )
    return stats.join(F.broadcast(ev), "component").select(
        "component", "n_vectors", "mean_coord", "var_coord",
        "eigenvalue", "explained_ratio",
    )


def _pca_variance_oracle_sql() -> str:
    from ._pca_basis import COMPONENTS, EIGENVALUES, MEAN

    total = sum(EIGENVALUES)
    crows = ",\n    ".join(
        f"({j}, {_dlist(c)})" for j, c in enumerate(COMPONENTS)
    )
    erows = ",\n    ".join(
        f"({j}, {round(EIGENVALUES[j], 6)!r}, "
        f"{round(EIGENVALUES[j] / total, 6)!r})"
        for j in range(len(COMPONENTS))
    )
    return f"""
WITH v AS (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
cent AS (
  SELECT list_transform(list_zip(e, {_dlist(MEAN)}), p -> p[1] - p[2]) AS ce
  FROM v
),
c(component, carr) AS (
  VALUES
    {crows}
),
proj AS (
  SELECT component,
         list_sum(list_transform(list_zip(ce, carr), p -> p[1] * p[2])) AS coord
  FROM cent CROSS JOIN c
),
ev(component, eigenvalue, explained_ratio) AS (
  VALUES
    {erows}
)
SELECT p.component, count(*) AS n_vectors,
       round(CAST(sum(CAST(coord AS DECIMAL(28,12))) AS DOUBLE) / count(*), 6)
         + 0.0 AS mean_coord,
       round(CAST(sum(CAST(coord * coord AS DECIMAL(28,12))) AS DOUBLE) / count(*)
             - (CAST(sum(CAST(coord AS DECIMAL(28,12))) AS DOUBLE) / count(*))
               * (CAST(sum(CAST(coord AS DECIMAL(28,12))) AS DOUBLE) / count(*)),
             6) + 0.0 AS var_coord,
       ev.eigenvalue, ev.explained_ratio
FROM proj p JOIN ev ON p.component = ev.component
GROUP BY p.component, ev.eigenvalue, ev.explained_ratio
"""


VEC_PCA_VARIANCE_SQL = _pca_variance_oracle_sql()


def vec_semdedup_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-form SemDeDup (Abbas et al. 2023): k-means-cell-confined
    pairwise cosine >= the corpus-calibrated near-dup threshold (the same
    0.35 point `vec_semantic_dedup` gates at — the synthetic corpus plants
    its near-dups there; production would run 0.95), transitive duplicate
    groups, keeper = member
    LEAST similar to its cluster centroid (the paper's
    diversity-preserving rule). Reuses the TRAINED committed IVF quantizer
    — no training job in the query path. The DuckDB twin replays cell
    assignment, within-cell pairing, the recursive-CTE closure, and the
    centroid-cosine keeper ranking from the same centroid literals."""
    from ..operators.similarity import semdedup_kmeans
    from ._ivf_quantizer import CENTROIDS

    return semdedup_kmeans(
        _emb(spark, sf_dir), "vec_id", "embedding", CENTROIDS,
        threshold=_NEAR_DUP_THRESHOLD,
    ).orderBy("component_id", "vec_id")


def _semdedup_kmeans_oracle_sql(threshold: float) -> str:
    from ._ivf_quantizer import CENTROIDS

    rows = ",\n    ".join(
        f"({i}, {_dlist(c)})" for i, c in enumerate(CENTROIDS)
    )
    d2 = (
        "list_sum(list_transform(ce, t -> t * t))"
        " - 2 * list_sum(list_transform(list_zip(e, ce), z -> z[1] * z[2]))"
    )
    cent_cos = (
        "CASE WHEN sqrt(list_sum(list_transform(m.e, t -> t * t)))"
        " * sqrt(list_sum(list_transform(c.ce, t -> t * t))) > 0"
        " THEN list_sum(list_transform(list_zip(m.e, c.ce), z -> z[1] * z[2]))"
        " / (sqrt(list_sum(list_transform(m.e, t -> t * t)))"
        " * sqrt(list_sum(list_transform(c.ce, t -> t * t))))"
        " ELSE 0.0 END"
    )
    return f"""
WITH RECURSIVE v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
),
c(cell, ce) AS (
  VALUES
    {rows}
),
dist AS (
  SELECT v.vec_id, c.cell, {d2} AS d2 FROM v CROSS JOIN c
),
m AS (
  SELECT d.vec_id, d.cell, v.e
  FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                ORDER BY d2 ASC, cell ASC) AS rn
    FROM dist
  ) d JOIN v ON d.vec_id = v.vec_id
  WHERE d.rn = 1
),
pairs AS (
  SELECT x.vec_id AS id_1, y.vec_id AS id_2
  FROM m x JOIN m y ON x.cell = y.cell AND x.vec_id < y.vec_id
  WHERE round({_XY_COS}, 6) >= {threshold}
),
sym AS MATERIALIZED (
  SELECT id_1 AS s, id_2 AS d FROM pairs
  UNION
  SELECT id_2, id_1 FROM pairs
),
reach(n, r) AS (
  SELECT DISTINCT s, s FROM sym
  UNION
  SELECT sym.d, reach.r FROM reach JOIN sym ON reach.n = sym.s
),
comp AS (
  SELECT n AS vec_id, min(r) AS component_id FROM reach GROUP BY n
),
scored AS (
  SELECT comp.vec_id, m.cell, comp.component_id,
         round({cent_cos}, 6) AS cent_cos
  FROM comp JOIN m ON comp.vec_id = m.vec_id
            JOIN c ON m.cell = c.cell
)
SELECT vec_id, cell, component_id, (rn = 1) AS is_keeper
FROM (
  SELECT *, row_number() OVER (PARTITION BY component_id
              ORDER BY cent_cos ASC, vec_id ASC) AS rn
  FROM scored
)
ORDER BY component_id, vec_id
"""


VEC_SEMDEDUP_KMEANS_SQL = _semdedup_kmeans_oracle_sql(_NEAR_DUP_THRESHOLD)


def vec_knn_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 approximate ANN via PCA coarse ranking (`operators/pca.py:
    pca_topk` — FAISS's ``PCAMatrix,Flat``): rank in the 8-dim reduced
    space (an 8x narrower corpus scan than the 64-float exact path), then
    exact-rescore the per-query shortlist. FULLY value-hash gated: every
    arithmetic step is strict left-to-right double accumulation, so the
    DuckDB twin replays projection, reduced d², and the rescore
    bit-identically from the same committed basis literals."""
    from ..operators.pca import pca_topk
    from ._pca_basis import COMPONENTS, MEAN

    e = _emb(spark, sf_dir)
    queries = e.filter(F.col("vec_id") % 25 == 0)
    return pca_topk(
        queries, e, "vec_id", "embedding", MEAN, COMPONENTS,
        k=5, shortlist=64,
    )


def _knn_pca_oracle_sql(k: int, shortlist: int) -> str:
    from ._pca_basis import COMPONENTS, MEAN

    coord_exprs = ",\n      ".join(
        "list_sum(list_transform(list_zip(ce, "
        + _dlist(c)
        + "), p -> p[1] * p[2]))"
        for c in COMPONENTS
    )
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
cent AS (
  SELECT vec_id, e,
         list_transform(list_zip(e, {_dlist(MEAN)}), p -> p[1] - p[2]) AS ce
  FROM v
),
proj AS (
  SELECT vec_id, e,
    [{coord_exprs}] AS p
  FROM cent
),
red AS (
  SELECT q.vec_id AS query_id, m.vec_id AS neighbor_id,
         list_sum(list_transform(list_zip(q.p, m.p),
                  z -> (z[1] - z[2]) * (z[1] - z[2]))) AS red_d2
  FROM proj q JOIN proj m ON q.vec_id <> m.vec_id
  WHERE q.vec_id % 25 = 0
),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY red_d2 ASC, neighbor_id ASC) AS srank
    FROM red
  ) WHERE srank <= {shortlist}
),
scored AS (
  SELECT s.query_id, s.neighbor_id, round({_XY_COS}, 6) AS sim
  FROM short s JOIN v x ON s.query_id = x.vec_id
               JOIN v y ON s.neighbor_id = y.vec_id
)
SELECT query_id, neighbor_id, rank, sim
FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY sim DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
)
WHERE rank <= {k}
"""


VEC_KNN_PCA_SQL = _knn_pca_oracle_sql(5, 64)


_GRAPH_K = 5
_GRAPH_KG = 16
_GRAPH_BEAM = 16
_GRAPH_HOPS = 2
_GRAPH_SEED_BANDS = 2
_GRAPH_BANDS = 8
_GRAPH_PPB = 4


def vec_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 graph-class ANN (the reference's HNSW slot,
    `indexing/faiss_builder.py:30-147`): k-NN graph built from banded-LSH
    candidates, then fixed-round greedy beam search seeded from a NARROW
    2-of-8-band slice of the same plane family. The graph hops recover the
    recall the cheap seed misses: measured recall@5 on sf0.01 is 0.16
    seed-only vs 0.82 after 2 hops (k_graph=16, beam=16) — above the
    8-band LSH path's 0.66 (floor pinned in tests/test_operators.py).

    FULLY oracle-gated despite being an approximate graph index: build
    and search are both deterministic (md5 planes, rounded cosines, id
    tiebreaks), so the DuckDB twin replays graph construction AND the
    beam walk CTE-for-CTE — the hash gate certifies the traversal itself."""
    from ..operators.graph_ann import build_knn_graph, graph_topk

    e = _emb(spark, sf_dir)
    graph = build_knn_graph(
        e,
        "vec_id",
        "embedding",
        k_graph=_GRAPH_KG,
        n_bands=_GRAPH_BANDS,
        planes_per_band=_GRAPH_PPB,
    )
    graph = cut_lineage(graph, eager=False)
    # ^ materialize the inline-built edge list ONCE (guide §2.4 / §3.3 —
    # truncate repeated subtrees): every beam hop references `graph`, so
    # without the pin the whole LSH-GEMM build subtree is compiled and
    # EXECUTED once per reference (measured: 3,318-line plan, 52 Python
    # nodes, 84 exchanges → the build ran ~5x). A stored deployment reads
    # the edge list from parquet (bench graph_search); the declared query
    # builds inline, so the checkpoint is its materialization equivalent.
    # Values are unchanged — the edge list is deterministic and the
    # checkpoint only cuts lineage.
    queries = e.filter(F.col("vec_id") % 25 == 0)
    return graph_topk(
        queries,
        e,
        graph,
        "vec_id",
        "embedding",
        k=_GRAPH_K,
        beam=_GRAPH_BEAM,
        hops=_GRAPH_HOPS,
        seed_bands=_GRAPH_SEED_BANDS,
        planes_per_band=_GRAPH_PPB,
    )


def _knn_graph_oracle_sql(
    k: int,
    k_graph: int,
    beam: int,
    hops: int,
    seed_bands: int,
    n_bands: int,
    planes_per_band: int,
    dims: int = 64,
) -> str:
    """DuckDB twin of operators.graph_ann with the narrow LSH seed slice
    (graph_topk). Build + walk CTEs shared with the coarse variant via
    `_graph_walk_sql`."""
    seed_ctes = [
        f"sb AS ({_bucket_union_sql('q', seed_bands, planes_per_band, dims)})",
        f"vb AS ({_bucket_union_sql('v', seed_bands, planes_per_band, dims)})",
        "seeds AS (SELECT DISTINCT a.vec_id AS query_id, b2.vec_id AS node_id"
        " FROM sb a JOIN vb b2 ON a.band = b2.band AND a.bucket = b2.bucket"
        " WHERE a.vec_id <> b2.vec_id)",
    ]
    return _graph_walk_sql(
        k, k_graph, beam, hops, n_bands, planes_per_band, seed_ctes, dims
    )


def _graph_walk_sql(
    k: int,
    k_graph: int,
    beam: int,
    hops: int,
    n_bands: int,
    planes_per_band: int,
    seed_ctes: list[str],
    dims: int = 64,
) -> str:
    """Graph build (LSH candidates → per-src top-k_graph) plus the
    unrolled beam-search rounds, seeded by the caller-supplied CTE chain
    (must define ``seeds(query_id, node_id)``). Each sN CTE mirrors
    graph_ann._top_beam(_score(...)); each vN CTE mirrors the beam ∪
    one-hop-frontier visited set."""

    def scored(pairs: str) -> str:
        return (
            f"SELECT p.query_id, p.node_id, round({_XY_COS}, 6) AS sim"
            f" FROM {pairs} p JOIN v x ON p.query_id = x.vec_id"
            f" JOIN v y ON p.node_id = y.vec_id"
        )

    def top_beam(scored_sql: str) -> str:
        return (
            "SELECT query_id, node_id, sim FROM ("
            "SELECT *, row_number() OVER (PARTITION BY query_id"
            " ORDER BY sim DESC, node_id ASC) AS rk"
            f" FROM ({scored_sql})) WHERE rk <= {beam}"
        )

    ctes = [
        "v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)",
        "q AS (SELECT * FROM v WHERE vec_id % 25 = 0)",
        f"gb AS ({_bucket_union_sql('v', n_bands, planes_per_band, dims)})",
        "gcand AS (SELECT DISTINCT a.vec_id AS src, b2.vec_id AS dst"
        " FROM gb a JOIN gb b2 ON a.band = b2.band AND a.bucket = b2.bucket"
        " WHERE a.vec_id <> b2.vec_id)",
        f"gscored AS (SELECT c.src, c.dst, round({_XY_COS}, 6) AS sim"
        " FROM gcand c JOIN v x ON c.src = x.vec_id"
        " JOIN v y ON c.dst = y.vec_id)",
        "graph AS (SELECT src, dst FROM (SELECT *, row_number() OVER"
        " (PARTITION BY src ORDER BY sim DESC, dst ASC) AS rk FROM gscored)"
        f" WHERE rk <= {k_graph})",
        *seed_ctes,
        f"s0 AS ({top_beam(scored('seeds'))})",
    ]
    for h in range(1, hops + 1):
        prev = f"s{h - 1}"
        ctes.append(
            f"v{h} AS (SELECT query_id, node_id FROM {prev}"
            f" UNION SELECT s.query_id, g.dst AS node_id FROM {prev} s"
            " JOIN graph g ON s.node_id = g.src WHERE g.dst <> s.query_id)"
        )
        ctes.append(f"s{h} AS ({top_beam(scored(f'v{h}'))})")
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT query_id, node_id AS neighbor_id, rank, sim FROM ("
        "SELECT *, CAST(row_number() OVER (PARTITION BY query_id"
        " ORDER BY sim DESC, node_id ASC) AS INTEGER) AS rank"
        f" FROM s{hops}) WHERE rank <= {k}"
    )


VEC_KNN_GRAPH_SQL = _knn_graph_oracle_sql(
    _GRAPH_K,
    _GRAPH_KG,
    _GRAPH_BEAM,
    _GRAPH_HOPS,
    _GRAPH_SEED_BANDS,
    _GRAPH_BANDS,
    _GRAPH_PPB,
)


_GRAPH_COARSE_NPROBE = 4
_GRAPH_COARSE_BEAM = 24


def vec_knn_graph_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 incremental maintenance for the graph index (reference shape:
    `indexing/incremental.py:200-276` — its FAISS index re-adds new
    vectors without retraining): build the k-NN edge list on 2/3 of the
    corpus, then fold the remaining 1/3 in via `append_knn_graph` —
    untouched srcs pass through unrescored, bucket-touched srcs re-rank
    stored edges against just the new candidates, batch srcs score once
    against the full corpus. The result is EXACTLY the full rebuild
    (top-k(old ∪ new) = top-k(top-k(old) ∪ new) per src), so the DuckDB
    twin is the plain full-corpus build — the hash gate certifies the
    incremental path reproduces the rebuild bit-for-bit."""
    from ..operators.graph_ann import append_knn_graph, build_knn_graph

    e = _emb(spark, sf_dir)
    old = e.filter(F.col("vec_id") % 3 != 0)
    batch = e.filter(F.col("vec_id") % 3 == 0)
    g0 = build_knn_graph(
        old, "vec_id", "embedding",
        k_graph=_GRAPH_KG, n_bands=_GRAPH_BANDS, planes_per_band=_GRAPH_PPB,
    )
    g0 = cut_lineage(g0, eager=False)
    # `_fold_edges` reads the stored edge list twice (untouched pass-through
    # anti-join + touched re-rank join); the pin makes the inline build
    # compute once, exactly like a stored index would read
    return append_knn_graph(
        g0, old, batch, "vec_id", "embedding",
        k_graph=_GRAPH_KG, n_bands=_GRAPH_BANDS, planes_per_band=_GRAPH_PPB,
    )


def _graph_append_oracle_sql(
    k_graph: int, n_bands: int, planes_per_band: int, dims: int = 64
) -> str:
    """Full-corpus graph build — the append path's contract is exact
    equality with the rebuild, so the rebuild IS the twin."""
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
gb AS ({_bucket_union_sql('v', n_bands, planes_per_band, dims)}),
gcand AS (
  SELECT DISTINCT a.vec_id AS src, b2.vec_id AS dst
  FROM gb a JOIN gb b2 ON a.band = b2.band AND a.bucket = b2.bucket
  WHERE a.vec_id <> b2.vec_id
),
gscored AS (
  SELECT c.src, c.dst, round({_XY_COS}, 6) AS sim
  FROM gcand c JOIN v x ON c.src = x.vec_id JOIN v y ON c.dst = y.vec_id
)
SELECT src, dst, sim FROM (
  SELECT *, row_number() OVER (PARTITION BY src
              ORDER BY sim DESC, dst ASC) AS rk
  FROM gscored
) WHERE rk <= {k_graph}
"""


VEC_KNN_GRAPH_APPEND_SQL = _graph_append_oracle_sql(
    _GRAPH_KG, _GRAPH_BANDS, _GRAPH_PPB
)


def vec_knn_graph_coarse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 graph ANN with the COARSE layer the reference's HNSW actually
    has (`indexing/faiss_builder.py:30-147`, the layered descent): seeds
    come from the committed IVF quantizer's nprobe=4 nearest cells
    (reusing the already-hash-gated centroid artifact — no new trained
    state), then the same k-NN-graph beam walk (beam 24) refines.
    Measured recall@5 on the sf0.1 frontier corpus: 0.865 at 5.1 s vs
    0.705 at 6.6 s for the narrow LSH seed — higher recall at LOWER wall,
    the two-layer descent the round-5 verdict asked for (and 0.90+ on
    sf0.01). Fully hash-gated: the twin replays assignment, seed beam,
    AND walk."""
    from ..operators.graph_ann import build_knn_graph, graph_topk_coarse
    from ._ivf_quantizer import CENTROIDS

    e = _emb(spark, sf_dir)
    graph = build_knn_graph(
        e,
        "vec_id",
        "embedding",
        k_graph=_GRAPH_KG,
        n_bands=_GRAPH_BANDS,
        planes_per_band=_GRAPH_PPB,
    )
    graph = cut_lineage(graph, eager=False)
    # same repeated-subtree pin as vec_knn_graph: the walk references the
    # inline-built edge list once per hop
    queries = e.filter(F.col("vec_id") % 25 == 0)
    return graph_topk_coarse(
        queries,
        e,
        graph,
        "vec_id",
        "embedding",
        CENTROIDS,
        k=_GRAPH_K,
        beam=_GRAPH_COARSE_BEAM,
        hops=_GRAPH_HOPS,
        nprobe=_GRAPH_COARSE_NPROBE,
    )


def _knn_graph_coarse_oracle_sql(
    k: int,
    k_graph: int,
    beam: int,
    hops: int,
    nprobe: int,
    n_bands: int,
    planes_per_band: int,
    dims: int = 64,
) -> str:
    """Coarse-seeded twin: the committed IVF centroid literals assign the
    corpus (rn = 1) and probe the queries (rn <= nprobe) exactly as
    `_knn_ivf_trained_oracle_sql` does; the seed set is the cell members
    of the probed cells, and the walk is shared via `_graph_walk_sql`."""
    from ._ivf_quantizer import CENTROIDS

    rows = ",\n    ".join(
        f"({i}, [{', '.join(repr(x) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(CENTROIDS)
    )
    d2 = (
        "list_sum(list_transform(ce, t -> t * t))"
        " - 2 * list_sum(list_transform(list_zip(e, ce), z -> z[1] * z[2]))"
    )
    seed_ctes = [
        f"cent(cell, ce) AS (VALUES\n    {rows})",
        f"dist AS (SELECT v.vec_id, cent.cell, {d2} AS d2"
        " FROM v CROSS JOIN cent)",
        "corpus_cell AS (SELECT vec_id, cell FROM ("
        "SELECT *, row_number() OVER (PARTITION BY vec_id"
        " ORDER BY d2 ASC, cell ASC) AS rn FROM dist) WHERE rn = 1)",
        "q_probe AS (SELECT vec_id, cell FROM ("
        "SELECT *, row_number() OVER (PARTITION BY vec_id"
        " ORDER BY d2 ASC, cell ASC) AS rn FROM dist"
        f" WHERE vec_id % 25 = 0) WHERE rn <= {nprobe})",
        "seeds AS (SELECT DISTINCT p.vec_id AS query_id, m.vec_id AS node_id"
        " FROM q_probe p JOIN corpus_cell m ON p.cell = m.cell"
        " WHERE p.vec_id <> m.vec_id)",
    ]
    return _graph_walk_sql(
        k, k_graph, beam, hops, n_bands, planes_per_band, seed_ctes, dims
    )


VEC_KNN_GRAPH_COARSE_SQL = _knn_graph_coarse_oracle_sql(
    _GRAPH_K,
    _GRAPH_KG,
    _GRAPH_COARSE_BEAM,
    _GRAPH_HOPS,
    _GRAPH_COARSE_NPROBE,
    _GRAPH_BANDS,
    _GRAPH_PPB,
)


_DECON_THRESHOLD = 0.35
_DECON_BANDS = 8
_DECON_PPB = 4
_DECON_EVAL_MOD = 20


def vec_semantic_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-level benchmark decontamination (the paraphrase-robust
    complement of `doc_decontamination`'s verbatim 13-gram screen): corpus
    vectors whose cosine to any held-out eval vector (vec_id % 20 == 0,
    the eval-suite stand-in) reaches 0.35. Asymmetric banded-LSH shape —
    eval buckets broadcast, corpus streams through one bucket equi-join +
    exact rescore; no all-pairs. Deterministic end-to-end, so the DuckDB
    twin replays banding, rescore, and the per-corpus argmax/hit-count."""
    from ..operators.decontam import semantic_decontam

    e = _emb(spark, sf_dir)
    evalset = e.filter(F.col("vec_id") % _DECON_EVAL_MOD == 0)
    corpus = e.filter(F.col("vec_id") % _DECON_EVAL_MOD != 0)
    return semantic_decontam(
        corpus,
        evalset,
        "vec_id",
        "embedding",
        threshold=_DECON_THRESHOLD,
        n_bands=_DECON_BANDS,
        planes_per_band=_DECON_PPB,
    )


VEC_SEMANTIC_DECONTAM_SQL = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
ev AS (SELECT * FROM v WHERE vec_id % {_DECON_EVAL_MOD} = 0),
co AS (SELECT * FROM v WHERE vec_id % {_DECON_EVAL_MOD} <> 0),
cb AS ({_bucket_union_sql('co', _DECON_BANDS, _DECON_PPB)}),
eb AS ({_bucket_union_sql('ev', _DECON_BANDS, _DECON_PPB)}),
cand AS (
  SELECT DISTINCT c.vec_id AS corpus_id, b2.vec_id AS eval_id
  FROM cb c JOIN eb b2 ON c.band = b2.band AND c.bucket = b2.bucket
),
scored AS (
  SELECT cand.corpus_id, cand.eval_id, round({_XY_COS}, 6) AS sim
  FROM cand JOIN v x ON cand.corpus_id = x.vec_id
            JOIN v y ON cand.eval_id = y.vec_id
),
hits AS (SELECT * FROM scored WHERE sim >= {_DECON_THRESHOLD})
SELECT corpus_id, eval_id AS matched_eval_id, sim AS max_sim, n_eval_hits
FROM (
  SELECT *,
         count(*) OVER (PARTITION BY corpus_id) AS n_eval_hits,
         row_number() OVER (PARTITION BY corpus_id
                            ORDER BY sim DESC, eval_id ASC) AS rk
  FROM hits
) WHERE rk = 1
"""


_KCENTER_K = 12


_KCENTER_DRIVER_MAX_ROWS = 200_000  # ~13 MB of float64 at dim 8; bounded


def _kcenter_driver(spark: SparkSession, emb: DataFrame) -> DataFrame:
    """Driver twin of the distributed k-center loop below — used only
    under `_KCENTER_DRIVER_MAX_ROWS`. Arithmetic is replicated exactly:
    norms come from the SAME JVM-computed `_n` column, dots accumulate in
    strict left-to-right float64 order (the F.aggregate fold), and
    rounding uses Decimal(repr(x)) ROUND_HALF_UP — bit-for-bit
    F.round(x, 6) (BigDecimal.valueOf == repr shortest form)."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    q6 = Decimal("0.000001")

    def jround6(x: float) -> float:
        return float(
            Decimal(repr(float(x))).quantize(q6, rounding=ROUND_HALF_UP)
        )

    pdf = emb.orderBy("vec_id").toPandas()
    ids = pdf["vec_id"].to_numpy()
    V = np.array([list(e) for e in pdf["e"]], dtype=np.float64)
    N = pdf["_n"].to_numpy(dtype=np.float64)
    n_rows, dim = V.shape

    def fold_dot(w: list[float]) -> np.ndarray:
        acc = np.zeros(n_rows)
        for j in range(dim):
            acc = acc + V[:, j] * w[j]
        return acc

    sel = np.zeros(n_rows, dtype=bool)
    sel[0] = True  # seed = min vec_id (pdf is vec_id-sorted)
    out_rows = [(1, int(ids[0]), None)]
    new_vec = [float(x) for x in V[0]]
    mind = None
    for step in range(2, _KCENTER_K + 1):
        new_norm = math.sqrt(sum(x * x for x in new_vec))
        den = N * new_norm
        raw = np.where(den > 0, fold_dot(new_vec) / np.where(den > 0, den, 1.0), 0.0)
        cos6 = np.array([jround6(x) for x in raw])
        d_new = 1.0 - cos6
        mind = d_new if mind is None else np.minimum(mind, d_new)
        key = np.array([jround6(x) for x in mind])
        key_m = np.where(sel, -np.inf, key)
        best = key_m.max()
        pick = int(np.flatnonzero(key_m == best)[0])  # ids ASC tiebreak
        sel[pick] = True
        new_vec = [float(x) for x in V[pick]]
        out_rows.append((step, int(ids[pick]), float(key[pick])))
    return spark.createDataFrame(
        out_rows, "step int, vec_id bigint, min_dist double"
    ).orderBy("step")


def vec_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-center greedy coreset (farthest-point traversal) — DIVERSITY
    selection for training data: pick k examples that maximally spread
    over the embedding space (each pick = the point farthest, in cosine
    distance, from everything already picked; the classic 2-approximation
    to the k-center objective, the standard coreset/diversity-sampling
    recipe). Seed = min vec_id; ties broken by smallest id.

    Shape: inherently k SEQUENTIAL rounds (each pick depends on all
    prior), so this is a bounded driver loop — k(={_KCENTER_K}) scans,
    each a full-parallel min-over-selected + top-1 (TakeOrdered), the
    same iterative-driver pattern as the graph walk's hops. Selected
    vectors ride into the next round as broadcast literals; the corpus
    never shuffles. Distances reuse THE shared `guarded_cosine`
    (round-6), so the DuckDB twin (recursive CTE + LATERAL argmax over
    the accumulated pick list) replays every round exactly."""
    import math

    from ..functions.vector import guarded_cosine

    emb = (
        _emb(spark, sf_dir).select(
            "vec_id", as_double_array("embedding").alias("e")
        )
        .withColumn("_n", l2_norm(F.col("e")))
        # each of the k sequential picks re-reads this subtree; pin it so
        # the parquet scan + norm run ONCE, not k times (lazy: materialized
        # by the first action, reused by the remaining k-1 — the same
        # shared-subtree pin as the semantic catalogs)
    )
    emb = cut_lineage(emb, eager=False)
    # bounded driver fast path (guide §1.2 — the k sequential rounds are
    # pure job-scheduling overhead at bench scale): below the cap, run the
    # same greedy loop over a collected numpy matrix with BIT-IDENTICAL
    # arithmetic — dot/norm as strict left-to-right float64 folds (the
    # F.aggregate order) and F.round's exact semantics via
    # Decimal(repr(x)) ROUND_HALF_UP (repr == Double.toString shortest
    # form). Past the cap the distributed loop below runs unchanged — the
    # corpus never collects at scale.
    if emb.count() <= _KCENTER_DRIVER_MAX_ROWS:
        return _kcenter_driver(spark, emb)
    seed = emb.orderBy("vec_id").head(1)[0]
    selected_ids = [int(seed["vec_id"])]
    new_vec = list(seed["e"])
    out_rows = [(1, selected_ids[0], None)]
    state = emb
    for step in range(2, _KCENTER_K + 1):
        # incremental farthest-point: fold ONLY the newest pick into the
        # running min-distance column (least() is associative, so values
        # are bit-identical to recomputing against every pick) — each
        # round's plan carries ONE vector literal instead of step-1, and
        # the folded column is pinned so round r never recomputes rounds
        # 1..r-1's distances
        lit_vec = F.array(*[F.lit(float(x)) for x in new_vec])
        lit_norm = F.lit(math.sqrt(sum(x * x for x in new_vec)))
        d_new = F.lit(1.0) - guarded_cosine(
            F.col("e"), lit_vec, F.col("_n"), lit_norm
        )
        nd = (
            F.least(F.col("_mind"), d_new)
            if "_mind" in state.columns else d_new
        )
        state = cut_lineage(state.withColumn("_mind", nd), eager=False)
        pick = (
            state.filter(~F.col("vec_id").isin(selected_ids))
            .select("vec_id", F.round("_mind", 6).alias("min_dist"), "e")
            .orderBy(F.desc("min_dist"), F.asc("vec_id"))
            .head(1)[0]
        )
        selected_ids.append(int(pick["vec_id"]))
        new_vec = list(pick["e"])
        out_rows.append((step, int(pick["vec_id"]),
                         float(pick["min_dist"])))
    return spark.createDataFrame(
        out_rows, "step int, vec_id bigint, min_dist double"
    ).orderBy("step")


VEC_KCENTER_CORESET_SQL = f"""
WITH RECURSIVE e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
),
sel AS (
  SELECT 1 AS step,
         (SELECT min(vec_id) FROM e) AS vec_id,
         CAST(NULL AS DOUBLE) AS min_dist,
         [(SELECT min(vec_id) FROM e)] AS picked
  UNION ALL
  SELECT sel.step + 1, c.vec_id, c.mind, list_append(sel.picked, c.vec_id)
  FROM sel, LATERAL (
    SELECT x.vec_id,
           round(min(1.0 - round({_XY_COS}, 6)), 6) AS mind
    FROM e x JOIN e y ON list_contains(sel.picked, y.vec_id)
    WHERE NOT list_contains(sel.picked, x.vec_id)
    GROUP BY x.vec_id
    ORDER BY mind DESC, x.vec_id
    LIMIT 1
  ) c
  WHERE sel.step < {_KCENTER_K}
)
SELECT step, vec_id, min_dist FROM sel ORDER BY step
"""


_SQ8_Q_MOD = 25
_SQ8_K = 5


def vec_knn_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN over INT8 scalar-quantized embeddings (SQ8 — the standard
    FAISS/ScaNN memory trick, public): per-dimension symmetric scale
    ``s_d = max|x_d| / 127``, codes ``q_d = clamp(floor(x_d/s_d + 0.5))``,
    search runs entirely in the quantized space (scored here on the
    dequantized values ``q_d * s_d`` so the oracle is exactly
    reproducible). At 100 TB this is 4x less index memory than float32 —
    the difference between an in-RAM corpus and a spilling one.

    Determinism: quantization is floor(x + 0.5) (identical in both
    engines — engine `round()` half-rule differences never enter), scales
    come from one single-pass per-dimension max aggregate, cosine reuses
    the brute-force scorer (round 6). Scale shape: scales are D max
    aggregates folded in ONE corpus scan (no explode — a 64x row blowup
    plus a regroup shuffle at 100 TB), collected as D doubles of driver
    metadata; quantization is then a row-local zip_with (pure codegen,
    corpus never shuffles); the search is the same broadcast-queries/
    streaming-corpus pass as vec_knn_bruteforce. In production the
    quantized arrays persist as the index — this query charges the build
    too so the oracle covers it."""
    from ..operators.similarity import sq8_dequantize

    e = _emb(spark, sf_dir).select("vec_id", "embedding")
    arrs, _scales = sq8_dequantize(e, "embedding")
    queries = arrs.filter(F.col("vec_id") % _SQ8_Q_MOD == 0)
    return brute_force_topk(queries, arrs, "vec_id", "embedding", k=_SQ8_K)


# shared SQ8 CTE chain: dequantized arrays + the ranked search in
# quantized space — reused by the pure-int8 twin and the rerank twin so
# the two oracles cannot drift on the quantization arithmetic
_SQ8_CTES = f"""ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings
),
scales AS (SELECT pos, max(abs(val)) / 127.0 AS scale FROM ex GROUP BY pos),
deq AS (
  SELECT vec_id, ex.pos,
         CASE WHEN scale > 0
              THEN greatest(-127.0,
                            least(127.0, floor(val / scale + 0.5))) * scale
              ELSE 0.0 END AS dq
  FROM ex JOIN scales ON ex.pos = scales.pos
),
arrs AS (SELECT vec_id, list(dq ORDER BY pos) AS e FROM deq GROUP BY vec_id),
qq AS (SELECT * FROM arrs WHERE vec_id % {_SQ8_Q_MOD} = 0),
q8scored AS (
  SELECT x.vec_id AS query_id, y.vec_id AS neighbor_id,
         round({_XY_COS}, 6) AS sim
  FROM qq x CROSS JOIN arrs y
  WHERE x.vec_id <> y.vec_id
),
q8ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY sim DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM q8scored
)"""


VEC_KNN_INT8_SQL = f"""
WITH {_SQ8_CTES}
SELECT query_id, neighbor_id, rank, sim
FROM q8ranked
WHERE rank <= {_SQ8_K}
"""


_SQ8_SHORTLIST = 50


def vec_knn_int8_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 shortlist -> exact float rerank — the production composition
    of scalar quantization (the scan runs over the 4x-smaller quantized
    index, recall@5 0.975 measured in SCALING.md) with a float32 rescore
    of only the top-50 candidates per query, which buys the lost
    recall back at a per-query cost of 50 exact cosines. Output is the
    exact-space top-5 WITHIN the quantized shortlist.

    Cross-engine: the shortlist ranks over round-6 quantized sims with
    neighbor-id tie-breaks (identical candidate sets), the rerank over
    round-6 float sims — both stages oracle-pinned end to end."""
    from ..operators.similarity import brute_force_topk, sq8_dequantize

    e = _emb(spark, sf_dir).select("vec_id", "embedding")
    arrs, _scales = sq8_dequantize(e, "embedding")
    queries_q = arrs.filter(F.col("vec_id") % _SQ8_Q_MOD == 0)
    shortlist = brute_force_topk(
        queries_q, arrs, "vec_id", "embedding", k=_SQ8_SHORTLIST
    ).select("query_id", "neighbor_id")

    qv = e.select(
        F.col("vec_id").alias("query_id"),
        as_double_array("embedding").alias("qv"),
    ).withColumn("qn", l2_norm(F.col("qv")))
    cv = e.select(
        F.col("vec_id").alias("neighbor_id"),
        as_double_array("embedding").alias("cv"),
    ).withColumn("cn", l2_norm(F.col("cv")))
    from ..functions.vector import guarded_cosine

    rescored = (
        shortlist.join(qv, "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id", "neighbor_id",
            F.round(
                guarded_cosine(F.col("qv"), F.col("cv"),
                               F.col("qn"), F.col("cn")), 6
            ).alias("sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _SQ8_K)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


VEC_KNN_INT8_RERANK_SQL = f"""
WITH {_SQ8_CTES},
short AS (SELECT query_id, neighbor_id FROM q8ranked
          WHERE rank <= {_SQ8_SHORTLIST}),
v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
rescored AS (
  SELECT s.query_id, s.neighbor_id, round({_XY_COS}, 6) AS sim
  FROM short s JOIN v x ON s.query_id = x.vec_id
               JOIN v y ON s.neighbor_id = y.vec_id
)
SELECT query_id, neighbor_id, rank, sim
FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY sim DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM rescored
)
WHERE rank <= {_SQ8_K}
"""

_MMR_LAMBDA = 0.7
_MMR_CANDS = 20
_MMR_K = 8


def vec_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance rerank (Carbonell & Goldstein 1998,
    the classic diversity-aware retrieval rule): greedily pick k results
    maximizing ``λ·sim(q,d) − (1−λ)·max_{s∈selected} sim(d,s)`` — high
    relevance AND low redundancy, the standard fix for near-duplicate
    hits in RAG context windows. Query = doc 0's embedding, candidates =
    its dense top-20, λ=0.7, k=8.

    Shape: candidate generation and BOTH similarity matrices (query-
    relevance + candidate-pairwise) are distributed Spark jobs with the
    shared guarded cosine rounded at 6; only the greedy selection runs
    on the driver, over the BOUNDED 20-candidate set MMR is defined on
    (MMR is a rerank of a top-N list by construction — the corpus-sized
    work is the candidate search, which stays distributed). The DuckDB
    twin replays the greedy loop as a recursive CTE over the same
    rounded similarities, so every pick and score is value-hash gated."""
    from ..functions.vector import guarded_cosine

    emb = _emb(spark, sf_dir).select(
        "vec_id", as_double_array("embedding").alias("e")
    ).withColumn("_n", l2_norm(F.col("e")))
    qrow = emb.filter(F.col("vec_id") == 0).head()
    qv = F.array(*[F.lit(float(x)) for x in qrow["e"]])
    qn = F.lit(sum(float(x) * float(x) for x in qrow["e"]) ** 0.5)
    cands = (
        emb.filter(F.col("vec_id") != 0)
        .select(
            "vec_id", "e", "_n",
            F.round(
                guarded_cosine(F.col("e"), qv, F.col("_n"), qn), 6
            ).alias("rel"),
        )
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(_MMR_CANDS)
    )
    cands = cut_lineage(cands, eager=False)
    a = cands.select(
        F.col("vec_id").alias("i"), F.col("e").alias("ei"),
        F.col("_n").alias("ni"),
    )
    b = cands.select(
        F.col("vec_id").alias("j"), F.col("e").alias("ej"),
        F.col("_n").alias("nj"),
    )
    pair_rows = (
        a.join(b, F.col("i") < F.col("j"))
        .select(
            "i", "j",
            F.round(
                guarded_cosine(F.col("ei"), F.col("ej"),
                               F.col("ni"), F.col("nj")), 6
            ).alias("s"),
        )
        .collect()
    )
    sims = {}
    for r in pair_rows:
        sims[(r["i"], r["j"])] = r["s"]
        sims[(r["j"], r["i"])] = r["s"]
    rel = {r["vec_id"]: r["rel"] for r in cands.select("vec_id", "rel").collect()}

    selected: list[int] = []
    out = []
    for step in range(1, _MMR_K + 1):
        best = None
        for d in sorted(rel):
            if d in [s for s in selected]:
                continue
            redundancy = max(
                (sims[(d, s)] for s in selected), default=0.0
            )
            score = _MMR_LAMBDA * rel[d] - (1.0 - _MMR_LAMBDA) * redundancy
            if best is None or score > best[0] or                     (score == best[0] and d < best[1]):
                best = (score, d)
        selected.append(best[1])
        # HALF-AWAY-FROM-ZERO, the F.round/DuckDB mode — Python's
        # built-in round() is banker's and flips the last digit on
        # exact-half scores (seen live at sf0.001)
        import math

        score6 = math.copysign(
            math.floor(abs(best[0]) * 1e6 + 0.5), best[0]
        ) / 1e6
        out.append((step, best[1], score6))
    return spark.createDataFrame(
        out, "step int, vec_id bigint, mmr_score double"
    ).orderBy("step")


VEC_MMR_RERANK_SQL = f"""
WITH RECURSIVE v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
),
cand AS (
  SELECT x.vec_id, round({_XY_COS}, 6) AS rel
  FROM v x CROSS JOIN (SELECT e FROM v WHERE vec_id = 0) y
  WHERE x.vec_id <> 0
  ORDER BY rel DESC, x.vec_id
  LIMIT {_MMR_CANDS}
),
pair AS (
  SELECT a.vec_id AS i, b.vec_id AS j, round({_XY_COS.replace('x.e', 'a.e').replace('y.e', 'b.e')}, 6) AS s
  FROM (SELECT c.vec_id, v.e FROM cand c JOIN v ON c.vec_id = v.vec_id) a
  JOIN (SELECT c.vec_id, v.e FROM cand c JOIN v ON c.vec_id = v.vec_id) b
    ON a.vec_id <> b.vec_id
),
sel AS (
  SELECT 1 AS step,
         (SELECT vec_id FROM cand
          ORDER BY CAST(0.7 AS DOUBLE) * rel DESC, vec_id LIMIT 1)
           AS vec_id,
         (SELECT round(CAST(0.7 AS DOUBLE) * rel, 6) FROM cand
          ORDER BY CAST(0.7 AS DOUBLE) * rel DESC, vec_id LIMIT 1)
           AS mmr_score,
         [(SELECT vec_id FROM cand
           ORDER BY CAST(0.7 AS DOUBLE) * rel DESC, vec_id LIMIT 1)]
           AS picked
  UNION ALL
  SELECT sel.step + 1, nxt.vec_id, nxt.score,
         list_append(sel.picked, nxt.vec_id)
  FROM sel, LATERAL (
    SELECT c.vec_id,
           round(CAST(0.7 AS DOUBLE) * c.rel
                 - CAST(0.3 AS DOUBLE) * COALESCE((
                     SELECT max(p.s) FROM pair p
                     WHERE p.i = c.vec_id
                       AND list_contains(sel.picked, p.j)
                   ), 0.0), 6) AS score,
           CAST(0.7 AS DOUBLE) * c.rel
             - CAST(0.3 AS DOUBLE) * COALESCE((
                 SELECT max(p.s) FROM pair p
                 WHERE p.i = c.vec_id
                   AND list_contains(sel.picked, p.j)
               ), 0.0) AS rawscore
    FROM cand c
    WHERE NOT list_contains(sel.picked, c.vec_id)
    ORDER BY rawscore DESC, c.vec_id
    LIMIT 1
  ) nxt
  WHERE sel.step < {_MMR_K}
)
SELECT step, vec_id, mmr_score FROM sel ORDER BY step
"""

_MIX_N_CELLS = 16


def vec_cluster_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced data mixing: assign every vector to its nearest
    cell, then temperature-scale the per-cluster sampling shares
    (target ∝ share^τ with τ=0.5 — the public alpha/temperature-sampling
    recipe used for language/domain balancing, applied to SEMANTIC
    clusters so over-represented content modes are downweighted and the
    tail upweighted before training). Output per cluster: size, raw
    share, temperature-scaled target share, and the sampling factor a
    downstream sampler multiplies in.

    Cells are the deterministic fixed quantizer (the 16 lowest-id
    vectors — same assignment contract as `vec_knn_ivf_fixed`, d² with
    stable cell-index tie-break), so the DuckDB twin replays assignment
    exactly; in production the assignment is the stored IVF cell column.
    Cross-engine: per-cell sqrt(share) rounds at 12 decimals into a
    DECIMAL accumulator; the two one-row totals broadcast. Scale: one
    assignment pass (Arrow-batched GEMM), one ≤16-group aggregate —
    corpus never shuffles."""
    from ..operators.similarity import _nearest_cells_udf

    e = _emb(spark, sf_dir)
    cents = [
        [float(x) for x in r["embedding"]]
        for r in e.select("vec_id", "embedding")
        .orderBy("vec_id").limit(_MIX_N_CELLS).collect()
    ]
    assign1 = _nearest_cells_udf(cents, 1)
    assigned = e.select(
        as_double_array("embedding").alias("v")
    ).withColumn("cell", F.element_at(assign1(F.col("v")), 1))
    counts = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("n_vecs"))
    tot = counts.agg(F.sum("n_vecs").alias("_N"))
    w = (
        counts.join(F.broadcast(tot))
        .withColumn("share", F.col("n_vecs") / F.col("_N"))
        .withColumn(
            "w",
            F.round(F.sqrt(F.col("share")), 12).cast("decimal(28,12)"),
        )
    )
    wt = w.agg(F.sum("w").alias("_W"))
    target = F.col("w").cast("double") / F.col("_W").cast("double")
    return (
        w.join(F.broadcast(wt))
        .select(
            F.col("cell").cast("int").alias("cell"),
            "n_vecs",
            F.round("share", 6).alias("share"),
            F.round(target, 6).alias("target_share"),
            F.round(target / F.col("share"), 6).alias("sampling_factor"),
        )
        .orderBy("cell")
    )


def _cluster_mixture_sql(n_cells: int) -> str:
    d2 = (
        "list_sum(list_transform(ce, t -> t * t))"
        " - 2 * list_sum(list_transform(list_zip(e, ce), z -> z[1] * z[2]))"
    )
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
c AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell,
         e AS ce
  FROM (SELECT vec_id, e FROM v ORDER BY vec_id LIMIT {n_cells})
),
assigned AS (
  SELECT vec_id, cell FROM (
    SELECT v.vec_id, c.cell,
           row_number() OVER (PARTITION BY v.vec_id
             ORDER BY {d2} ASC, c.cell ASC) AS rn
    FROM v CROSS JOIN c
  ) WHERE rn = 1
),
counts AS (SELECT cell, count(*) AS n_vecs FROM assigned GROUP BY cell),
tot AS (SELECT sum(n_vecs) AS n FROM counts),
w AS (
  SELECT cell, n_vecs, n_vecs / tot.n AS share,
         CAST(round(sqrt(n_vecs / tot.n), 12) AS DECIMAL(28,12)) AS w
  FROM counts CROSS JOIN tot
),
wt AS (SELECT sum(w) AS wsum FROM w)
SELECT CAST(cell AS INTEGER) AS cell, n_vecs,
       round(share, 6) AS share,
       round(CAST(w AS DOUBLE) / CAST(wt.wsum AS DOUBLE), 6) AS target_share,
       round(CAST(w AS DOUBLE) / CAST(wt.wsum AS DOUBLE) / share, 6)
         AS sampling_factor
FROM w CROSS JOIN wt
ORDER BY cell
"""


VEC_CLUSTER_MIXTURE_SQL = _cluster_mixture_sql(_MIX_N_CELLS)


# RETIRED from the driver registry (r9 verdict #8, registry = 0 mod 50):
# - vec_knn_ivf: vec_knn_ivf_fixed is the maintained IVF oracle (same
#   cell-partitioned search path, deterministic coarse quantizer so the
#   DuckDB twin replays it exactly); the trained-centroid variant keeps
#   its function + recall/plan pytests below.
# - vec_knn_int8: vec_knn_int8_rerank's candidate stage IS the SQ8
#   quantized scan (shared helpers), so the rerank oracle value-gates
#   the same arithmetic; bench keeps sq8_build/sq8_search entries.
QUERIES = {
    "vec_kcenter_coreset": vec_kcenter_coreset,
    "vec_knn_int8_rerank": vec_knn_int8_rerank,
    "vec_mmr_rerank": vec_mmr_rerank,
    "vec_cluster_mixture": vec_cluster_mixture,
    "vec_dim_stats": vec_dim_stats,
    "vec_embedding_drift": vec_embedding_drift,
    "vec_hard_negatives": vec_hard_negatives,
    "vec_contrastive_triplets": vec_contrastive_triplets,
    "vec_semantic_dedup": vec_semantic_dedup,
    "vec_semantic_dedup_p95": vec_semantic_dedup_p95,
    "vec_label_centroids": vec_label_centroids,
    "vec_label_similarity_matrix": vec_label_similarity_matrix,
    "vec_norm_stats": vec_norm_stats,
    "vec_knn_bruteforce": vec_knn_bruteforce,
    "vec_knn_ivf_fixed": vec_knn_ivf_fixed,
    "vec_knn_pq": vec_knn_pq,
    "vec_knn_ivfpq": vec_knn_ivfpq,
    "vec_near_dup_pairs": vec_near_dup_pairs,
    "vec_knn_lsh": vec_knn_lsh,
    "vec_pca_coords": vec_pca_coords,
    "vec_pca_variance": vec_pca_variance,
    "vec_semdedup_kmeans": vec_semdedup_kmeans,
    "vec_knn_pca": vec_knn_pca,
    "vec_knn_graph": vec_knn_graph,
    "vec_knn_graph_coarse": vec_knn_graph_coarse,
    "vec_knn_graph_append": vec_knn_graph_append,
    "vec_semantic_decontam": vec_semantic_decontam,
}

ORACLES = {
    "vec_dim_stats": VEC_DIM_STATS_SQL,
    "vec_embedding_drift": VEC_EMBEDDING_DRIFT_SQL,
    "vec_hard_negatives": VEC_HARD_NEGATIVES_SQL,
    "vec_contrastive_triplets": VEC_CONTRASTIVE_SQL,
    "vec_semantic_dedup": VEC_SEMANTIC_DEDUP_SQL,
    "vec_semantic_dedup_p95": VEC_SEMANTIC_DEDUP_P95_SQL,
    "vec_label_centroids": VEC_LABEL_CENTROIDS_SQL,
    "vec_label_similarity_matrix": VEC_LABEL_SIM_MATRIX_SQL,
    "vec_norm_stats": VEC_NORM_STATS_SQL,
    "vec_kcenter_coreset": VEC_KCENTER_CORESET_SQL,
    "vec_knn_int8_rerank": VEC_KNN_INT8_RERANK_SQL,
    "vec_mmr_rerank": VEC_MMR_RERANK_SQL,
    "vec_cluster_mixture": VEC_CLUSTER_MIXTURE_SQL,
    "vec_knn_bruteforce": VEC_KNN_SQL,
    "vec_near_dup_pairs": VEC_NEAR_DUP_SQL,
    "vec_knn_lsh": VEC_KNN_LSH_SQL,
    "vec_knn_ivf_fixed": VEC_KNN_IVF_FIXED_SQL,
    "vec_knn_pq": VEC_KNN_PQ_SQL,
    "vec_knn_ivfpq": VEC_KNN_IVFPQ_SQL,
    "vec_pca_coords": VEC_PCA_COORDS_SQL,
    "vec_pca_variance": VEC_PCA_VARIANCE_SQL,
    "vec_semdedup_kmeans": VEC_SEMDEDUP_KMEANS_SQL,
    "vec_knn_pca": VEC_KNN_PCA_SQL,
    "vec_knn_graph": VEC_KNN_GRAPH_SQL,
    "vec_knn_graph_coarse": VEC_KNN_GRAPH_COARSE_SQL,
    "vec_knn_graph_append": VEC_KNN_GRAPH_APPEND_SQL,
    "vec_semantic_decontam": VEC_SEMANTIC_DECONTAM_SQL,
}
