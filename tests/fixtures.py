"""Synthetic transcript fixtures with labeled defects, per FIXTURES.md §1-§3
(modeled on the reference's `tests/fixtures/quality_test_data.py`: every
planted defect has a known expected value)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

EP1 = "LOS - #1 - 2024-01-01 - Pilot"
EP2 = "SW - #2 - 2024-02-01 - Return"
EP3 = "LOS - #3 - 2024-03-01 - Finale"


def raw_utterances(spark: SparkSession) -> DataFrame:
    """Clean utterances: speaker runs with intra-run gaps < 0.5s and
    deliberate > 0.5s gaps / speaker changes to force span breaks."""
    rows = []

    def run(ep, speaker, t0, n, dur=2.0, gap=0.2):
        t = t0
        for i in range(n):
            rows.append((ep, t, t + dur, speaker, f"{speaker} says thing {i} in {ep[:3]}"))
            t = t + dur + gap
        return t

    # EP1: A(3) -> B(2) -> big gap -> A(2)
    t = run(EP1, "Alice", 0.0, 3)
    t = run(EP1, "Bob", t, 2)
    t = run(EP1, "Alice", t + 5.0, 2)  # 5s gap => new span even same speaker? (speaker changed anyway)
    # EP2: C(4) with one big intra-speaker gap
    t = run(EP2, "Carol", 10.0, 4)
    run(EP2, "Carol", t + 3.0, 3)  # 3s gap > 0.5 => span break within same speaker
    # EP3: single speaker clean run
    run(EP3, "Alice", 0.0, 5)
    return spark.createDataFrame(
        rows, "episode_id string, start double, end double, speaker string, text string"
    )


def dirty_utterances(spark: SparkSession) -> DataFrame:
    """§1 dirty variants: each row violates exactly one predicate."""
    rows = [
        (None, 0.0, 1.0, "A", "missing episode"),
        (EP1, -1.0, 1.0, "A", "negative start"),
        (EP1, 5.0, 5.0, "A", "zero duration"),
        (EP1, 5.0, 4.0, "A", "end before start"),
        (EP1, 0.0, 1.0, "", "empty speaker"),
        (EP1, 0.0, 1.0, "A", "   "),
        (EP1, None, 1.0, "A", "missing start"),
    ]
    return spark.createDataFrame(
        rows, "episode_id string, start double, end double, speaker string, text string"
    )
