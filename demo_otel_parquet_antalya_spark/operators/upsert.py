"""Batch MERGE/upsert: changes win, untouched base rows survive.

Spark without a table format (Iceberg/Delta — not in this image, see
sources/registry.py's gated hook) has no MERGE INTO, but the relational
core of MERGE is two operators:

    merged = changes  UNION ALL  (base ANTI JOIN changes ON keys)

- the anti join is the only wide operation, and it shuffles on the merge
  key — or avoids the shuffle entirely when the change set is broadcast-
  sized, which is the common CDC case (changes << snapshot). Pass
  ``broadcast_changes=True`` for that plan.
- no row is ever rewritten in place: the output is a NEW snapshot, which
  pairs with the registry's register-don't-rewrite catalog flip and the
  rollup sink's versioned-snapshot pattern for readers.

The reference's ingest path is append-only (SURVEY.md §2.A6/A10 — files
are registered, never merged); this extends the engine to keyed mutation
feeds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    broadcast_changes: bool = True,
) -> DataFrame:
    """Apply keyed changes over a base snapshot (changes take precedence).

    Both inputs must share a schema. Duplicate keys WITHIN ``changes`` are
    the caller's contract to avoid (CDC compaction: keep last change per
    key first — see ``latest_event_per_user`` for that pattern).
    """
    probe = F.broadcast(changes) if broadcast_changes else changes
    kept = base.join(probe.select(*keys), keys, "left_anti")
    return changes.unionByName(kept)
