"""Length-bucketed batching for variable-length sentences.

The reference sorts inputs by token length and then runs them one at a time
anyway (bert.cpp:1002-1003, n_batch_size forced to 1 at :961). The TPU engine
replaces this with bucketing: sequences are padded up to a small set of fixed
(B, T) shapes so XLA compiles each bucket once and every subsequent batch
reuses the compiled executable — bucket discipline prevents recompile storms
(SURVEY.md §7 hard-part #3).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Sequence, Tuple


def default_seq_buckets(n_max_tokens: int) -> List[int]:
    """Power-of-two sequence buckets: 16, 32, ... up to n_max_tokens."""
    buckets = []
    b = 16
    while b < n_max_tokens:
        buckets.append(b)
        b *= 2
    buckets.append(n_max_tokens)
    return buckets


def pick_bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


@dataclass
class BucketPlan:
    """Assignment of input indices to padded (batch, seq) buckets."""

    # (seq_bucket, batch_bucket) -> list of index-groups; each group has
    # ≤ batch_bucket entries and is executed as one padded batch.
    groups: List[Tuple[int, int, List[int]]] = field(default_factory=list)


def plan_buckets(
    lengths: Sequence[int],
    seq_buckets: Sequence[int],
    max_batch: int,
) -> BucketPlan:
    """Group inputs by sequence bucket, then chunk each group to ≤ max_batch.

    Batch sizes are also bucketed to powers of two (≤ max_batch) so the set
    of compiled (B, T) shapes stays small.
    """
    by_bucket: Dict[int, List[int]] = {}
    for idx, n in enumerate(lengths):
        sb = pick_bucket(n, seq_buckets)
        by_bucket.setdefault(sb, []).append(idx)

    plan = BucketPlan()
    for sb in sorted(by_bucket):
        idxs = by_bucket[sb]
        for start in range(0, len(idxs), max_batch):
            chunk = idxs[start : start + max_batch]
            bb = 1
            while bb < len(chunk):
                bb *= 2
            bb = min(bb, max_batch)
            plan.groups.append((sb, bb, chunk))
    return plan
