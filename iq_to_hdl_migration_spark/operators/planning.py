"""Planning operators (SURVEY §2.5 O1-O4).

LPT bin-packing stays a driver-side greedy over collected size stats —
the input is the table inventory (thousands of rows, not data-scale),
exactly like the reference (migration.py:1661-1677). On Spark the
assignment then drives per-table read parallelism instead of per-node
connection fan-out; dynamic task scheduling makes it advisory (P3).
"""

from __future__ import annotations

import heapq


TARGET_PARTITION_BYTES = 128 * 1024 * 1024


def suggest_partitions(size_bytes: int,
                       target_bytes: int = TARGET_PARTITION_BYTES,
                       max_partitions: int = 10_000) -> int:
    """P3: per-table write parallelism from the A2 size estimate
    (width_sum x rowcount) — partitions sized to ~128 MB so staging
    files match spark.sql.files.maxPartitionBytes on re-read."""
    return max(1, min(max_partitions, -(-size_bytes // target_bytes)))


def lpt_assign(items: list[tuple], n_buckets: int) -> list[tuple]:
    """Longest-Processing-Time greedy: items (key, size) sorted by size
    desc (tie: key asc) land in the currently-smallest bucket.
    Returns (key, size, bucket, order_in_bucket). Deterministic."""
    heap = [(0, b) for b in range(n_buckets)]
    heapq.heapify(heap)
    counts = [0] * n_buckets
    out = []
    for key, size in sorted(items, key=lambda kv: (-kv[1], kv[0])):
        total, bucket = heapq.heappop(heap)
        out.append((key, size, bucket, counts[bucket]))
        counts[bucket] += 1
        heapq.heappush(heap, (total + size, bucket))
    return out
