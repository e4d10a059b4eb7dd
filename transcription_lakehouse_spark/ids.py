"""Deterministic content-hash ID expressions (SURVEY §1.4).

The reference derives every artifact ID from content hashes so re-runs are
idempotent (`/root/reference/src/lakehouse/ids.py:56-207`):

    utt_{sha256(episode_id)[:12]}_{position:06d}_{sha256(content)[:8]}
    spn_/bet_/sec_ with content = sorted child IDs + text hash

We keep the same structure as pure Spark column expressions (JVM-side sha2).
Canonical content serialization is our own (`to_json(struct(...))` with
2-decimal rounded times) — self-deterministic, not bit-compatible with the
reference's Python ``json.dumps`` (SURVEY §1.4 caveat). Position comes from a
row_number window over (start, end, speaker, text) so ties break
deterministically under parallelism (SURVEY §7.4).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

__all__ = ["utterance_id", "child_agg_id", "ID_PATTERN"]

# format mirror of reference `ids.py:210-258`
ID_PATTERN = r"^(utt|spn|bet|sec)_[0-9a-f]{12}_\d{6}_[0-9a-f]{8}$"


def _h(col: Column, n: int) -> Column:
    return F.substring(F.sha2(col, 256), 1, n)


def utterance_id(
    episode_id: Column | str,
    position: Column,
    text: Column | str,
    speaker: Column | str,
    start: Column | str,
    end: Column | str,
) -> Column:
    """`ids.py:56-98`: utt_{ep hash 12}_{position 06d}_{content hash 8}."""
    ep = F.col(episode_id) if isinstance(episode_id, str) else episode_id
    content = F.to_json(
        F.struct(
            F.round(F.col(end) if isinstance(end, str) else end, 2).alias("end"),
            (F.col(speaker) if isinstance(speaker, str) else speaker).alias("speaker"),
            F.round(F.col(start) if isinstance(start, str) else start, 2).alias(
                "start"
            ),
            (F.col(text) if isinstance(text, str) else text).alias("text"),
        )
    )
    return F.concat(
        F.lit("utt_"),
        _h(ep, 12),
        F.lit("_"),
        F.lpad(position.cast("string"), 6, "0"),
        F.lit("_"),
        _h(content, 8),
    )


def child_agg_id(
    prefix: str,
    episode_id: Column | str,
    position: Column,
    child_ids: Column,
    text: Column | str,
) -> Column:
    """`ids.py:101-207`: {prefix}_{ep hash 12}_{position 06d}_{hash8 of
    sorted child ids + text hash16}. prefix ∈ {spn, bet, sec}."""
    assert prefix in ("spn", "bet", "sec")
    ep = F.col(episode_id) if isinstance(episode_id, str) else episode_id
    t = F.col(text) if isinstance(text, str) else text
    content = F.concat_ws(
        "|",
        F.concat_ws(",", F.array_sort(child_ids)),
        F.substring(F.sha2(t, 256), 1, 16),
    )
    return F.concat(
        F.lit(prefix + "_"),
        _h(ep, 12),
        F.lit("_"),
        F.lpad(position.cast("string"), 6, "0"),
        F.lit("_"),
        _h(content, 8),
    )
