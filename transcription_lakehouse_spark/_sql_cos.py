"""DuckDB-SQL cosine fragment shared by the vector oracles and the
hybrid-retrieval oracle — a top-level leaf module (NOT inside
workload/, whose __init__ imports every query module), so
workload.text's oracle builder can reuse it without a transitive
dependency on workload.vectors: the tools/check.py import graph maps
module edges to affected queries, and an oracle-string constant must
not couple every doc_* query to every vectors.py change."""

_XY_COS = (
    "CASE WHEN sqrt(list_sum(list_transform(x.e, t -> t * t)))"
    " * sqrt(list_sum(list_transform(y.e, t -> t * t))) > 0"
    " THEN list_sum(list_transform(list_zip(x.e, y.e), z -> z[1] * z[2]))"
    " / (sqrt(list_sum(list_transform(x.e, t -> t * t)))"
    " * sqrt(list_sum(list_transform(y.e, t -> t * t))))"
    " ELSE 0.0 END"
)
