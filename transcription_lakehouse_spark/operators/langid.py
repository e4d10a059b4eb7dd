"""Heuristic language identification (training-data-pipeline text operator).

Marker-token scoring: count hits against per-language stopword marker sets,
pick the language with the highest count (deterministic tie-break: language
code ascending; zero hits → 'und'). Pure array expressions — JVM-side,
portable to the DuckDB oracle verbatim.

A production version swaps the marker table for character-n-gram profiles
(same argmax shape); the operator contract is identical.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

from ..functions.text import tokens

__all__ = ["LANG_MARKERS", "predict_lang"]

# order matters for the deterministic tie-break (asc by code)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist"),
    "en": ("the", "a", "and", "is", "of"),
    "es": ("el", "la", "los", "es", "y"),
    "fr": ("le", "la", "les", "est", "et"),
    "zh": ("的", "是", "在", "了", "和"),
}


def predict_lang(col: Column | str) -> Column:
    """Predicted language code for a text column ('und' when no markers hit).

    argmax = first element of the (hit_count desc, code asc) sort, realized
    portably as array_sort over (-count, code) structs.
    """
    t = tokens(col)

    def _hit(markers: tuple[str, ...]):
        # closure factory: exact-arity lambda (a default arg would bind to
        # pyspark's optional index parameter)
        arr = F.array(*[F.lit(m) for m in markers])
        return lambda x: F.array_contains(arr, x)

    scored = F.array(
        *[
            F.struct(
                (-F.size(F.filter(t, _hit(markers)))).cast("long").alias("negc"),
                F.lit(code).alias("code"),
            )
            for code, markers in sorted(LANG_MARKERS.items())
        ]
    )
    best = F.element_at(F.array_sort(scored), 1)
    return F.when(best["negc"] < 0, best["code"]).otherwise(F.lit("und"))
