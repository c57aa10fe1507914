"""Table maintenance: retention expiry + cascading delete + reset.

Re-expresses the reference's storage upkeep as snapshot/table operations:

- K5 retention cleanup (``cleanupOldBackups``, fetcher.ts:1440-1481;
  storage.ts:141-174): drop round snapshots older than a retention horizon —
  the Iceberg ``expire_snapshots`` analog (partition-drop, no row rewrites).
- K6 cascading site delete (``deleteSiteData``, site-data.ts:41-86): remove
  every row of one host across all engine tables.
- reset (``/api/backup/reset``, index.ts:337-345): clear all resume state.
"""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .checkpoint import RoundStore


def expire_rounds(store: RoundStore, keep_last: int) -> list[int]:
    """K5: drop the delta directories of all but the newest ``keep_last``
    committed rounds, keeping the latest frontier snapshot intact (whole-
    directory drops — the partition-drop fast path, no data rewritten).
    Returns the expired round numbers.

    Delta-commit safety: rounds newer than the newest full frontier snapshot
    are never expired — their fetch_log/frontier_inserts deltas are the only
    material from which the current frontier state can be reconstructed."""
    rounds = store.committed_rounds()
    expire = rounds[:-keep_last] if keep_last > 0 else rounds
    latest = rounds[-1] if rounds else None
    snapshots = [r for r in rounds if store.has_table(r, "frontier")]
    base = snapshots[-1] if snapshots else 0
    expired = []
    for r in expire:
        if r == latest or r == 0:
            continue  # never drop the resume point or the initial frontier
        if r >= base:
            # r > base: delta still needed to reconstruct the frontier view.
            # r == base: this round holds the newest full snapshot itself —
            # expiring it would silently re-base frontier_at() on an older
            # snapshot whose follow-up deltas may already be gone.
            continue
        d = store._dir(r)
        for name in ("fetch_log", "frontier_inserts", "frontier", "host_state"):
            p = os.path.join(d, name)
            if os.path.exists(p):
                shutil.rmtree(p)
        expired.append(r)
    return expired


def delete_host(
    spark: SparkSession, store: RoundStore, host: str
) -> dict[str, int]:
    """K6: cascade-delete one host from the latest frontier snapshot and
    all surviving deltas (DELETE WHERE host = x, rewritten per table)."""
    removed: dict[str, int] = {}
    latest = store.latest_round()
    if latest is None:
        return removed
    host_of = F.regexp_extract("url_canon", r"^https?://([^/:?#]+)", 1)
    for rnd in store.committed_rounds():
        d = store._dir(rnd)
        for name in sorted(os.listdir(d)):
            p = os.path.join(d, name)
            if not os.path.isdir(p):
                continue
            df = spark.read.parquet(p)
            if "url_canon" not in df.columns:
                continue
            # probe before rewriting: a targeted host delete touches few
            # rounds, and the unconditional rewrite was rewriting the WHOLE
            # store to discover n == 0 per table. The probe is a limit-1
            # scan over the one (pruned) url_canon column — only tables
            # that actually contain the host pay the rewrite job.
            if df.filter(host_of == host).isEmpty():
                continue
            # ONE rewrite job per affected table: total rows come from the
            # existing parquet footers (a metadata read, no scan) and the
            # kept count rides the rewrite job as an Observation — the old
            # df.count() - keep.count() pattern scanned the table twice
            # before writing it a third time.
            total = sum(
                pq.read_metadata(os.path.join(p, f)).num_rows
                for f in os.listdir(p)
                if f.endswith(".parquet")
            )
            obs = Observation()
            keep = df.filter(host_of != host).observe(
                obs, F.count(F.lit(1)).alias("kept")
            )
            tmp = p + "__rewrite"
            keep.write.mode("overwrite").parquet(tmp)
            # the probe above guarantees >= 1 matching row, so n > 0 here
            n = total - int(obs.get["kept"])
            shutil.rmtree(p)
            os.rename(tmp, p)
            removed[f"round_{rnd:04d}/{name}"] = n
    return removed


def reset(store: RoundStore) -> None:
    """Clear ALL resume state (fetcher.ts:729-745 analog)."""
    shutil.rmtree(store.root, ignore_errors=True)
    os.makedirs(store.root, exist_ok=True)
