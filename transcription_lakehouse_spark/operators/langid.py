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

# scripts written without spaces can't be matched token-wise — their markers
# score by substring presence instead (count of distinct markers appearing)
SUBSTRING_LANGS = ("zh",)


def predict_lang(col: Column | str) -> Column:
    """Predicted language code for a text column ('und' when no markers hit).

    argmax = first element of the (hit_count desc, code asc) sort, realized
    portably as array_sort over (-count, code) structs. Token languages
    score marker-token occurrences; unsegmented scripts (SUBSTRING_LANGS)
    score distinct-marker substring presence.
    """
    c = F.col(col) if isinstance(col, str) else col
    t = tokens(col)

    def _hit(markers: tuple[str, ...]):
        # closure factory: exact-arity lambda (a default arg would bind to
        # pyspark's optional index parameter)
        arr = F.array(*[F.lit(m) for m in markers])
        return lambda x: F.array_contains(arr, x)

    def _score(code: str, markers: tuple[str, ...]) -> Column:
        if code in SUBSTRING_LANGS:
            score = None
            for m in markers:
                term = F.when(F.contains(c, F.lit(m)), F.lit(1)).otherwise(F.lit(0))
                score = term if score is None else score + term
            return score
        return F.size(F.filter(t, _hit(markers)))

    scored = F.array(
        *[
            F.struct(
                (-_score(code, markers)).cast("long").alias("negc"),
                F.lit(code).alias("code"),
            )
            for code, markers in sorted(LANG_MARKERS.items())
        ]
    )
    best = F.element_at(F.array_sort(scored), 1)
    return F.when(best["negc"] < 0, best["code"]).otherwise(F.lit("und"))
