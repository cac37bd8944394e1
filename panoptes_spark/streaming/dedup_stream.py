"""Streaming twin of exact dedup (pipeline/dedup.py::exact_dedup).

An ingestion stream (crawl batches, log ships) wants "first copy wins,
drop later repeats". Spark-native: ``dropDuplicatesWithinWatermark`` keys
state by the normalized-text fingerprint and prunes it by the event-time
watermark, so state is bounded by the dedup horizon — not corpus size —
which is the property that survives an unbounded 100 TB/day stream.
(Plain streaming ``dropDuplicates`` would keep every fingerprint forever.)

The fingerprint is the SAME md5-of-normalized-text key the batch operator
uses, so a document deduped in the streaming tier hashes identically in
any later batch pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from panoptes_spark.pipeline.text import add_fingerprint


def dedup_exact_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts_ms",
    watermark: str = "24 hours",
) -> DataFrame:
    """Streaming DataFrame -> first-seen rows per fingerprint.

    ``ts_col`` is epoch milliseconds; duplicates arriving within
    ``watermark`` of the first copy's event time are dropped, and the
    fingerprint's state entry is freed once the watermark passes it.
    """
    with_fp = add_fingerprint(docs, text_col)
    df = with_fp.withColumn(
        "__ts", F.timestamp_millis(F.col(ts_col).cast("long"))
    ).withWatermark("__ts", watermark)
    return df.dropDuplicatesWithinWatermark(["fingerprint"]).drop("__ts")


# ---------------------------------------------------------------------------
# streaming NEAR-dup: incremental minhash index maintenance per micro-batch
# ---------------------------------------------------------------------------


class NearDedupIndexSink:
    """foreachBatch sink that maintains a persisted near-dup index
    (``pipeline/dedup_index``) over an unbounded document stream.

    Each micro-batch appends to the index via ``update_dedup_index`` —
    new docs are signed and banded, the existing corpus bands from the
    artifact's stored signatures, so per-batch work is proportional to
    the BATCH, never the accumulated corpus (the property an unbounded
    stream needs; the exactness-vs-full-rebuild proof is the batch
    operator's, reused unchanged).

    Exactly-once across restarts, same discipline as the reconcile /
    TTL store sinks:

    - replayed batch ids (``batch_id <= last_batch_id``) are skipped;
    - per-batch doc retention writes to ``docs/batch=<id>/`` with
      overwrite, so a torn write is replaced by the replay;
    - each commit builds index generation ``gen-<n+1>`` (overwrite —
      a torn generation is rebuilt by the replay) and then atomically
      swaps ``STATE.json`` (write-tmp + ``os.replace``);
    - generations older than the previous one are deleted AFTER the
      swap by diffing the directory against the state — a crash between
      swap and GC leaks nothing permanently (next commit re-diffs).

    Layout under ``base_path``::

        STATE.json            {last_batch_id, generation, batches}
        docs/batch=<id>/      retained (id, text) per committed batch
        index/gen-<n>/        dedup-index generations (MANIFEST + parquet)
    """

    def __init__(
        self,
        base_path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        k_shingle: int = 3,
        num_hashes: int = 32,
        bands: int = 8,
        threshold: float = 0.7,
    ):
        self.base = base_path
        self.id_col, self.text_col = id_col, text_col
        self.params = (k_shingle, num_hashes, bands, threshold)

    # -- state ------------------------------------------------------------
    def _state_path(self):
        import os

        return os.path.join(self.base, "STATE.json")

    def _read_state(self):
        import json
        import os

        try:
            with open(self._state_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"last_batch_id": -1, "generation": -1, "batches": []}
        except json.JSONDecodeError:
            # torn state write never happens (os.replace is atomic) but a
            # clear error beats silent reset if the file is hand-damaged
            raise ValueError(f"corrupt STATE.json at {self.base}")

    def _swap_state(self, state):
        import json
        import os

        tmp = self._state_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f, sort_keys=True)
        os.replace(tmp, self._state_path())

    def index_path(self):
        """Path of the current committed generation (None before the
        first commit) — read it back with ``DedupIndex``."""
        import os

        st = self._read_state()
        if st["generation"] < 0:
            return None
        return os.path.join(self.base, "index", f"gen-{st['generation']}")

    # -- sink -------------------------------------------------------------
    def __call__(self, batch_df, batch_id: int):
        import os
        import shutil

        from panoptes_spark.pipeline.dedup_index import (
            DedupIndex,
            build_dedup_index,
            update_dedup_index,
        )

        spark = batch_df.sparkSession
        st = self._read_state()
        if batch_id <= st["last_batch_id"]:
            return  # replay of a committed batch after restart
        batch = batch_df.select(self.id_col, self.text_col)
        if batch.isEmpty():
            st["last_batch_id"] = int(batch_id)
            self._swap_state(st)
            return

        doc_dir = os.path.join(self.base, "docs", f"batch={batch_id}")
        batch.write.mode("overwrite").parquet(doc_dir)

        k, nh, bands, thr = self.params
        gen = st["generation"] + 1
        new_idx_path = os.path.join(self.base, "index", f"gen-{gen}")
        if st["generation"] < 0:
            build_dedup_index(
                spark.read.parquet(doc_dir),
                new_idx_path,
                self.id_col,
                self.text_col,
                k,
                nh,
                bands,
                thr,
            )
        else:
            old_idx = DedupIndex(
                spark,
                os.path.join(self.base, "index", f"gen-{st['generation']}"),
            )
            old_docs = spark.read.parquet(
                *[
                    os.path.join(self.base, "docs", f"batch={b}")
                    for b in st["batches"]
                ]
            )
            update_dedup_index(
                old_idx,
                old_docs,
                spark.read.parquet(doc_dir),
                new_idx_path,
            )

        st = {
            "last_batch_id": int(batch_id),
            "generation": gen,
            "batches": st["batches"] + [int(batch_id)],
        }
        self._swap_state(st)

        # GC: delete every generation the state no longer references
        # except the immediately previous one (one-generation grace for
        # concurrent readers); directory-diff GC cannot leak on crash
        idx_root = os.path.join(self.base, "index")
        keep = {f"gen-{gen}", f"gen-{gen - 1}"}
        for name in os.listdir(idx_root):
            if name.startswith("gen-") and name not in keep:
                shutil.rmtree(os.path.join(idx_root, name), ignore_errors=True)


def near_dedup_index_stream(
    docs: DataFrame,
    base_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    **params,
):
    """Wire a streaming document source into a :class:`NearDedupIndexSink`
    and return (query, sink). ``sink.index_path()`` always points at the
    last COMMITTED generation; query the pairs/components through
    ``DedupIndex`` at any time."""
    sink = NearDedupIndexSink(base_path, id_col, text_col, **params)
    q = (
        docs.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    return q, sink
