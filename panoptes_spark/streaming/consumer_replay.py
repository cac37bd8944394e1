"""Kafka consumer-protocol replay twins (no broker required).

The reference's consumer discipline is defined against live Kafka
(``framework/utilities/consumer.py:340-438``): manual commits
(``enable_auto_commit=False``), per-partition processing where key-filter
and validation failures SKIP a record without failing the batch, a
callback RETURNING False stops the partition WITHOUT committing it (the
whole partition batch is redelivered), a callback EXCEPTION stops the
partition but still commits past the batch (the reference's except
branch never clears ``callback_succeeded`` — see
:func:`process_polled_batch` for the record-level analysis), and a
fully-successful partition commits at ``consumer.position`` — i.e. PAST
the skipped records. Its producer side places records by Kafka's
default partitioner: murmur2 over the key bytes, masked positive, mod
partition count.

The sandbox has no broker, so this module replays the PROTOCOL instead:

- :func:`murmur2` / :func:`partition_for_key` — byte-exact
  reimplementation of Kafka's murmur2 + DefaultPartitioner (public
  algorithm, Apache Kafka ``Utils.murmur2``), verified against the five
  public test vectors from Kafka's own test suite — this pins WHERE a
  real broker would place every key ``prepare_fanout`` emits.
- :class:`PolledRecord` / :func:`process_polled_batch` — the consumer
  callback discipline as a pure function of a polled batch, returning
  the per-partition commits and skip/failure stats the reference's loop
  would produce. Deterministic, so tests can replay failure and
  redelivery scenarios exactly.
- :func:`redeliver` — the broker's view after a commit round: every
  record at or past the committed offset (or the poll start where
  nothing committed) is delivered again, which is how the reference
  achieves at-least-once; pairing the replay with an idempotent sink
  (``streaming/store_sink.ParquetStoreSink``) yields effectively-once,
  asserted in ``tests/test_consumer_replay.py``.

In the Spark engine itself this discipline is carried by Structured
Streaming (checkpointed offsets = the commit, epoch retry = partition
redelivery); this module exists to prove the SEMANTICS line up with the
reference's loop, record for record, without a broker in the sandbox.
"""

from __future__ import annotations

import json
from typing import Callable, NamedTuple

__all__ = [
    "murmur2",
    "partition_for_key",
    "PolledRecord",
    "process_polled_batch",
    "redeliver",
]

_M32 = 0xFFFFFFFF


def murmur2(data: bytes) -> int:
    """Kafka's 32-bit murmur2 (``Utils.murmur2``): seed 0x9747b28c ^ len,
    m = 0x5bd1e995, r = 24, little-endian 4-byte chunks, signed result."""
    length = len(data)
    m = 0x5BD1E995
    h = (0x9747B28C ^ length) & _M32

    n4 = length & ~3
    for i in range(0, n4, 4):
        k = (
            data[i]
            | (data[i + 1] << 8)
            | (data[i + 2] << 16)
            | (data[i + 3] << 24)
        )
        k = (k * m) & _M32
        k ^= k >> 24
        k = (k * m) & _M32
        h = (h * m) & _M32
        h ^= k

    rest = length & 3
    if rest == 3:
        h ^= (data[n4 + 2] & 0xFF) << 16
    if rest >= 2:
        h ^= (data[n4 + 1] & 0xFF) << 8
    if rest >= 1:
        h ^= data[n4] & 0xFF
        h = (h * m) & _M32

    h ^= h >> 13
    h = (h * m) & _M32
    h ^= h >> 15
    return h - (1 << 32) if h & 0x80000000 else h


def partition_for_key(key: bytes, num_partitions: int) -> int:
    """Kafka DefaultPartitioner for keyed records:
    ``toPositive(murmur2(key)) % numPartitions``."""
    if num_partitions <= 0:
        raise ValueError("num_partitions must be positive")
    return (murmur2(key) & 0x7FFFFFFF) % num_partitions


class PolledRecord(NamedTuple):
    topic: str
    partition: int
    offset: int
    key: bytes
    value: bytes


def process_polled_batch(
    polled: dict[tuple[str, int], list[PolledRecord]],
    callback: Callable[[str, dict], bool],
    keys: list[str] | None = None,
    validator: Callable[[dict], bool] | None = None,
    safe_exceptions: bool = False,
) -> tuple[dict[tuple[str, int], int], dict[tuple[str, int], dict]]:
    """One poll-loop iteration of the reference consumer
    (``consumer.py:367-438``), as a pure function.

    Returns ``(commits, stats)``: ``commits`` maps each committing
    topic-partition to the offset to commit (``consumer.position`` =
    one past the partition's LAST polled record — ``poll`` already
    advanced the fetch position past the whole batch, so skipped records
    are committed past); ``stats`` carries per-partition processed /
    skipped / validation_failed / excepted / succeeded.

    Commit discipline, replicated record-for-record from the reference:

    - a callback RETURNING False stops the partition and withholds the
      commit — the whole partition batch is redelivered ("if the
      callback fails even for one consumer record ... do not update the
      committed offset for the entire batch");
    - a callback RAISING stops the partition but STILL COMMITS past the
      batch: in the reference's loop the ``except`` branch only logs and
      breaks, so ``callback_succeeded`` keeps its prior ``True`` (a
      ``False`` return breaks immediately, so no earlier record can have
      set it) and the commit block runs with ``consumer.position``
      already past the poll — every record after the exception is LOST
      (at-most-once on the exception path). This is a faithful twin of
      the reference's behavior, not an endorsement; pass
      ``safe_exceptions=True`` to withhold the commit on exceptions too
      (the at-least-once discipline Structured Streaming's epoch retry
      gives the Spark engine itself).
    """
    commits: dict[tuple[str, int], int] = {}
    stats: dict[tuple[str, int], dict] = {}
    for tp, records in polled.items():
        ok = True
        excepted = False
        n_proc = n_skip = n_invalid = 0
        # consumer.position after poll: one past the batch's last record
        # regardless of where processing stops
        position = records[-1].offset + 1 if records else None
        for rec in records:
            key = rec.key.decode("utf-8")
            if keys and key not in keys:
                n_skip += 1
                continue
            try:
                obj = json.loads(rec.value)
            except Exception:
                n_invalid += 1
                continue
            if validator is not None and not validator(obj):
                n_invalid += 1
                continue
            try:
                if not callback(key, obj):
                    ok = False
                    break
            except Exception:
                excepted = True
                if safe_exceptions:
                    ok = False
                break
            n_proc += 1
        if ok and position is not None:
            commits[tp] = position
        stats[tp] = {
            "processed": n_proc,
            "skipped": n_skip,
            "validation_failed": n_invalid,
            "excepted": excepted,
            "succeeded": ok and not excepted,
        }
    return commits, stats


def redeliver(
    log: dict[tuple[str, int], list[PolledRecord]],
    committed: dict[tuple[str, int], int],
    start: dict[tuple[str, int], int] | None = None,
) -> dict[tuple[str, int], list[PolledRecord]]:
    """The broker's next poll after ``committed``: per partition, every
    record at or past the committed offset (falling back to ``start`` or
    0 where nothing was committed) — at-least-once redelivery."""
    out: dict[tuple[str, int], list[PolledRecord]] = {}
    for tp, records in log.items():
        frm = committed.get(tp, (start or {}).get(tp, 0))
        remaining = [r for r in records if r.offset >= frm]
        if remaining:
            out[tp] = remaining
    return out
