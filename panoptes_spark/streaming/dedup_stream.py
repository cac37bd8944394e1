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

from pyspark.sql import DataFrame, SparkSession
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

#: every per-batch relation in the log layout (compaction GC walks these)
_RELATIONS = ("docs", "sigs", "buckets", "bcounts", "pairs", "tombs", "comps")

#: label-log size above which the sink resolves touched components by
#: PRUNED per-node aggregation (three broadcast-pruned scans) instead of
#: one full latest-wins shuffle of the log per commit. Below it the
#: shuffle is tiny and the extra scans cost more fixed job latency than
#: they save (measured at sf0.1: pruned = comps 9 -> 13-16 jobs,
#: 2 -> 5-9 s) — a data-derived policy, not a core-count constant.
_PRUNE_COMPS_MIN_BYTES = 256 << 20


class DedupIndexLog:
    """Read API over the append-only batch log :class:`NearDedupIndexSink`
    maintains. Every relation resolves through STATE.json's COMMITTED
    batch list — files a torn commit left behind are invisible until the
    replay overwrites them.

    - ``signatures()`` — union of the per-batch signature files
      (append-only; a doc signs exactly once, in its arrival batch);
    - ``bucket_membership()`` — union of the per-batch banded-LSH
      membership files (id, band, bucket): a doc bands exactly once, in
      its arrival batch — the inverted-index relation that makes
      per-commit compute batch-proportional (r10: the previous sink
      re-banded the ENTIRE accumulated signature set every commit);
    - ``bucket_counts()`` — union of the per-batch (band, bucket, n)
      count files, NOT pre-aggregated: callers join/filter to the
      buckets they care about first, so the merge shuffle is
      touched-bucket-sized, never bucket-vocabulary-sized;
    - ``pairs()`` — union of per-batch new-pair files, minus the
      tombstoned set. Tombstones are MONOTONE: a pair is retracted only
      when every generating LSH bucket crossed the size cap, bucket
      sizes only grow under appends, and retracted old-old pairs can
      never re-enter candidacy (candidates need a new-batch member) —
      so one anti-join resolves the live set exactly;
    - ``components()`` — per-node latest-batch-wins over the per-batch
      label files (``max_by`` partial agg, no window): a batch writes
      labels ONLY for nodes in components its pairs/tombstones touched,
      so untouched clusters keep their earlier labels.
    """

    def __init__(self, spark, base_path: str):
        import json
        import os

        self.spark = spark
        self.base = base_path
        with open(os.path.join(base_path, "STATE.json")) as f:
            self.state = json.load(f)
        if int(self.state.get("format", 1)) < 2:
            raise ValueError(
                f"dedup index log at {base_path} predates the v2 layout "
                "(per-batch bucket membership/count relations, r10) — "
                "rebuild it by re-folding the source batches through "
                "NearDedupIndexSink at a fresh base_path"
            )

    def _paths(self, rel: str) -> list[str]:
        import os

        return [
            os.path.join(self.base, rel, f"batch={b}")
            for b in self.state["batches"]
        ]

    def _read(self, rel: str, schema: str) -> DataFrame:
        # explicit schema: a batch with no new pairs/tombstones writes
        # zero part files, which schema inference cannot read back
        return self.spark.read.schema(schema).parquet(*self._paths(rel))

    @property
    def _idt(self) -> str:
        return self.state["id_type"]

    def signatures(self) -> DataFrame:
        idc = self.state["id_col"]
        return self._read("sigs", f"{idc} {self._idt}, minhash array<bigint>")

    def bucket_membership(self) -> DataFrame:
        idc = self.state["id_col"]
        return self._read(
            "buckets", f"{idc} {self._idt}, band int, bucket string"
        )

    def bucket_counts(self) -> DataFrame:
        """Per-batch (band, bucket, n) member counts, UN-merged — sum
        over ``n`` after filtering to the buckets of interest."""
        return self._read("bcounts", "band int, bucket string, n bigint")

    def docs(self) -> DataFrame:
        idc, txt = self.state["id_col"], self.state["text_col"]
        return self._read("docs", f"{idc} {self._idt}, {txt} string")

    def tombstones(self) -> DataFrame:
        return self._read("tombs", f"a {self._idt}, b {self._idt}")

    def pairs(self) -> DataFrame:
        raw = self._read(
            "pairs", f"a {self._idt}, b {self._idt}, jaccard double"
        )
        # n_tombs_total (r11): STATE carries the cumulative tombstone
        # count, so the overwhelmingly common all-empty case skips the
        # anti-join stage on every read (and in the sink's per-commit
        # live-edge union). Missing key (pre-r11 log) = unknown -> join.
        if self.state.get("n_tombs_total") == 0:
            return raw
        return raw.join(self.tombstones(), ["a", "b"], "left_anti")

    def components_raw(self) -> DataFrame:
        """The UN-resolved per-batch label rows (node, component, __b) —
        ``__b`` is the POSITION in the committed-batches list, not the
        id itself: commit order is what latest-wins means, and a
        compacted generation's id is a string tag (r10). Exposed so the
        sink can resolve latest-wins for a PRUNED node set (semi-join
        below the per-node max_by is exact — resolution is per-node
        independent) instead of shuffling the whole label log per
        commit (r12)."""
        import os

        parts = []
        for pos, b in enumerate(self.state["batches"]):
            parts.append(
                self.spark.read.schema(
                    f"node {self._idt}, component {self._idt}"
                )
                .parquet(os.path.join(self.base, "comps", f"batch={b}"))
                .withColumn("__b", F.lit(pos))
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def components(self) -> DataFrame:
        return (
            self.components_raw()
            .groupBy("node")
            .agg(F.max_by("component", "__b").alias("component"))
        )

    def rel_bytes(self, rel: str) -> int:
        """On-disk bytes of a relation's COMMITTED batch dirs — a
        zero-job, driver-side size signal (the sink keys its
        touched-component resolution strategy on it, r12)."""
        import os

        total = 0
        for b in self.state["batches"]:
            d = os.path.join(self.base, rel, f"batch={b}")
            if not os.path.isdir(d):
                continue
            for root, _dirs, files in os.walk(d):
                for f in files:
                    try:
                        total += os.path.getsize(os.path.join(root, f))
                    except OSError:
                        pass
        return total

    # -- compaction ---------------------------------------------------------
    def _gc_unreferenced(self) -> list[str]:
        """Delete ``batch=*`` dirs STATE.json does not reference — the
        leavings of compactions that crashed before the state swap, or
        the pre-compaction batch dirs after a successful swap. Safe by
        construction: every read resolves through the committed batch
        list, so unreferenced dirs are invisible already."""
        import os
        import shutil

        removed = []
        live = {str(b) for b in self.state["batches"]}
        for rel in _RELATIONS:
            rel_dir = os.path.join(self.base, rel)
            if not os.path.isdir(rel_dir):
                continue
            for name in sorted(os.listdir(rel_dir)):
                if name.startswith("batch=") and name[6:] not in live:
                    shutil.rmtree(
                        os.path.join(rel_dir, name), ignore_errors=True
                    )
                    removed.append(f"{rel}/{name}")
        return removed

    def compact(self) -> "DedupIndexLog":
        """Fold the whole batch log into ONE base generation — the
        in-engine LSM compaction a thousand-batch deployment needs
        instead of the offline-rebuild discipline (r9 verdict: read
        amplification is one parquet dir per batch per relation).

        The compacted generation is a single batch ``c<last_batch_id>``
        holding the RESOLVED relations: live pairs (tombstones applied,
        so the tombstone file empties), latest-wins component labels,
        and the unioned docs/signatures/membership plus sum-merged
        bucket counts. Query answers are identical by construction —
        ``pairs()``/``components()``/counts compute exactly these
        resolutions at read time (asserted by
        ``test_dedup_log_compaction_*``) — and later sink commits see
        the same monotone bucket sizes, so the append semantics are
        unchanged.

        Torn-write discipline, same as the sink: the new generation's
        dirs are staged UNREFERENCED (no read includes them), then
        STATE.json swaps atomically; ``last_batch_id`` and ``lineage``
        are preserved, so replay protection and the lineage guard carry
        over. A crash before the swap leaves invisible orphans that the
        next compact() GCs; after the swap, the old batch dirs are the
        orphans and are GC'd. Single-writer discipline: call between
        commits (e.g. from the foreachBatch maintenance path), never
        concurrently with one."""
        import json
        import os

        tag = f"c{self.state['last_batch_id']}"
        if [str(b) for b in self.state["batches"]] == [tag]:
            self._gc_unreferenced()
            return self  # already one compacted generation
        self._gc_unreferenced()  # clear torn earlier compactions

        def _w(rel, df):
            df.write.mode("overwrite").parquet(
                os.path.join(self.base, rel, f"batch={tag}")
            )

        _w("docs", self.docs())
        _w("sigs", self.signatures())
        _w("buckets", self.bucket_membership())
        _w(
            "bcounts",
            self.bucket_counts()
            .groupBy("band", "bucket")
            .agg(F.sum("n").alias("n")),
        )
        _w("pairs", self.pairs())  # tombstones applied: live set only
        _w(
            "tombs",
            self.tombstones().where(F.lit(False)),
        )
        _w("comps", self.components())
        new_state = dict(self.state)
        new_state["batches"] = [tag]
        new_state["n_tombs_total"] = 0  # compaction applied + emptied them
        tmp = os.path.join(self.base, "STATE.json.tmp")
        with open(tmp, "w") as f:
            json.dump(new_state, f, sort_keys=True)
        os.replace(tmp, os.path.join(self.base, "STATE.json"))
        self.state = new_state
        self._gc_unreferenced()
        return self


class _SinkSection:
    """Per-commit section profiler: wall seconds always; Spark job ids
    per section ONLY when the sink's ``profile`` flag is set (the job
    group it needs would shadow the group Structured Streaming uses to
    cancel a stopping query's jobs — opt-in from the spotbench, never
    in production streams)."""

    def __init__(self, sink, sc, group: str, name: str):
        self.sink, self.sc, self.group, self.name = sink, sc, group, name

    def __enter__(self):
        import time

        if self.sink.profile:
            self.sc.setJobGroup(self.group, self.name)
        self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        import time

        sec = time.time() - self.t0
        jobs = 0
        if self.sink.profile:
            jobs = len(self.sc.statusTracker().getJobIdsForGroup(self.group))
            self.sc.setJobGroup("", "")
        prof = self.sink.last_profile.setdefault(self.name, [0.0, 0])
        prof[0] += sec
        prof[1] += jobs
        return False


def _unionfind_pdf(npdf, epdf):
    """Exact (node, component=min id in cluster) labels by DRIVER-SIDE
    union-find over pandas frames — the small-subgraph fast path of the
    sink's component relabeling. The touched subgraph is churn-sized
    (touched components + the batch), so for typical micro-batches it is
    thousands of nodes: iterative min-label propagation pays 2 Spark
    jobs PER ROUND for a graph that fits in one list, and the
    propagation rounds were the single largest share of the sink's
    fixed per-commit job count (r10 verdict #2). Callers gate on a
    node/edge cap (via LIMIT probes) and fall back to
    ``connected_components(strict=True)`` above it, so a corpus-sized
    boilerplate component never lands on the driver."""
    import pandas as pd

    nodes = npdf[npdf.columns[0]].tolist()
    parent: dict = {n: n for n in nodes}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(epdf[epdf.columns[0]], epdf[epdf.columns[1]]):
        # closure argument says endpoints are already in the spine;
        # setdefault keeps the fold total regardless, matching the
        # distributed propagation (which labels spine ∪ endpoints)
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    all_nodes = list(parent)
    best: dict = {}
    for n in all_nodes:
        root = find(n)
        if root not in best or n < best[root]:
            best[root] = n
    return pd.DataFrame(
        {
            "node": all_nodes,
            "component": [best[find(n)] for n in all_nodes],
        }
    )


class NearDedupIndexSink:
    """foreachBatch sink that maintains a persisted near-dup index over
    an unbounded document stream as an APPEND-ONLY batch log.

    Per-batch work is proportional to the batch on BOTH axes that
    matter at 100 TB (r9 — the previous design rewrote pairs +
    signatures in full and re-propagated components over the whole pair
    graph every commit, index-sized I/O per micro-batch):

    - TEXT work: only new docs shingle/sign; old text is re-read only
      for the semi-join-pruned candidate members (``update_dedup_index``'s
      exactness argument, reused unchanged — bucket-cap eligibility is
      monotone under appends, so old pairs need revalidation, never
      re-verification);
    - BANDING work (r10): only the new batch bands; the accumulated
      corpus's banded membership and per-bucket counts are themselves
      append-only log relations (``buckets/``, ``bcounts/``), read back
      with batch-proportional joins — stored membership joins only the
      TOUCHED buckets (buckets with a new member are the only ones that
      can yield candidates or change size), and stored counts sum-merge
      only for touched / at-risk buckets. The r9 sink made WRITE volume
      O(batch) but still re-banded the entire signature corpus and
      recomputed all bucket sizes per commit — a full-corpus scan +
      (band,bucket) shuffle per micro-batch
      (``tools/spotbench_dedup_stream.py`` now measures per-commit
      seconds flat as the index grows; the membership relation is the
      standard inverted-index price, ~bands rows/doc, written once);
    - WRITE volume: each commit adds per-batch files only — the batch's
      signatures, its newly verified pairs, tombstones for pairs whose
      every generating bucket crossed the cap this batch, and new
      component labels for TOUCHED components only. Nothing already
      committed is ever rewritten (asserted by
      ``test_near_dedup_stream_appends_only``);
    - COMPONENT relabeling: new/tombstoned pairs mark their endpoints'
      components; the subgraph re-propagated is those components' nodes
      plus the batch (an edge with one endpoint inside a touched
      component has BOTH endpoints in the subgraph — components are
      closed under live edges, new docs' edges touch their old
      endpoint's component), so label writes are churn-sized. A
      tombstone can SPLIT a component; including the whole touched
      component makes the split exact.

    Exactly-once across restarts, same discipline as the reconcile /
    TTL store sinks: replayed batch ids (``batch_id <= last_batch_id``)
    are skipped; per-batch files write with overwrite, so a torn commit
    is replaced by the replay; ``STATE.json`` swaps atomically
    (write-tmp + ``os.replace``) and is the ONLY mutable file. A query
    lineage id (the streaming checkpoint's metadata id) is persisted in
    STATE: if the base_path is later driven from a DIFFERENT checkpoint
    lineage — whose batch ids restart at 0 and would silently be
    dropped as replays — the sink fails loudly instead.

    Read amplification grows with the number of committed batches (one
    parquet dir per batch per relation); ``compact_every`` folds the log
    back to one generation in-engine (``DedupIndexLog.compact``), the
    standard LSM discipline.

    Fixed per-commit LATENCY (r11, verdict #2 — the cost was job-count,
    not data): intermediate frames materialize once via eager
    ``localCheckpoint`` (truncated lineage, so downstream actions don't
    re-analyze deep plans — the r10 write+read-back round-trips are
    gone); the 7 relation writes overlap on a thread pool and ALL join
    before the state swap; the candidate join is asymmetric (tiny
    new-batch side, AQE broadcasts it); component relabeling runs in
    three tiers — no-churn singleton map, bounded driver-side
    union-find (``unionfind_max_nodes``), distributed strict
    propagation; STATE's ``n_tombs_total`` lets the all-empty common
    case skip every tombstone anti-join; per-batch files are
    right-sized (``_files``) so the log's file count tracks data, not
    partition width. Measured at sf0.1 seeded: 7.9-8.6 s / 81 jobs per
    small commit (r10) -> 4.2-4.8 s / 37 jobs, still flat as the index
    grows.

    Layout under ``base_path``::

        STATE.json           {last_batch_id, batches, lineage, format,
                              schema/params}
        docs/batch=<id>/     retained (id, text) per committed batch
        sigs/batch=<id>/     (id, minhash) — the batch's signatures
        buckets/batch=<id>/  (id, band, bucket) — the batch's banded
                             LSH membership (each doc bands ONCE)
        bcounts/batch=<id>/  (band, bucket, n) — the batch's per-bucket
                             member counts (sum-merged at read)
        pairs/batch=<id>/    (a, b, jaccard) new verified pairs
        tombs/batch=<id>/    (a, b) pairs cap-retracted at this batch
        comps/batch=<id>/    (node, component) labels for touched nodes
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
        max_bucket_size: int | None = None,
        max_iter: int = 10,
        checkpoint: str | None = None,
        compact_every: int | None = None,
        unionfind_max_nodes: int = 200_000,
    ):
        from panoptes_spark.pipeline import dedup as _dedup

        self.base = base_path
        self.id_col, self.text_col = id_col, text_col
        if max_bucket_size is None:
            max_bucket_size = _dedup.DEFAULT_MAX_BUCKET_SIZE
        self.params = (k_shingle, num_hashes, bands, threshold)
        self.max_bucket_size = max_bucket_size
        self.max_iter = max_iter
        self.checkpoint = checkpoint
        if compact_every is not None and compact_every < 1:
            raise ValueError(f"compact_every must be >= 1: {compact_every}")
        # fold the batch log into one generation once N uncompacted
        # batches accumulate (the AnnIndexSink discipline): compaction
        # is atomic and answer-preserving (DedupIndexLog.compact), so it
        # bounds read amplification in-engine instead of by offline
        # rebuild; the cadence is derived from the committed batch list
        # so restarts cannot reset it (r10 ADVICE)
        self.compact_every = compact_every
        # component relabeling fast path (r11): touched subgraphs at or
        # under this node count (and 4x it in edges) resolve by exact
        # driver-side union-find instead of per-round Spark jobs; larger
        # churn falls back to distributed strict propagation
        self.unionfind_max_nodes = int(unionfind_max_nodes)
        # per-commit observability: section -> [seconds, jobs]; jobs are
        # recorded only when profile=True (see _SinkSection)
        self.profile = False
        self.last_profile: dict[str, list] = {}

    # -- state ------------------------------------------------------------
    def _state_path(self):
        import os

        return os.path.join(self.base, "STATE.json")

    def _read_state(self):
        import json

        try:
            with open(self._state_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            # "format": 2 even in the FRESH default: an empty first
            # micro-batch swaps this dict in verbatim, and any
            # DedupIndexLog construction before the first non-empty
            # commit (compact_every on that same commit, sink.index())
            # would otherwise hit the v1-layout guard on a brand-new
            # log (r10 ADVICE). Safe: no batch dirs exist yet.
            return {
                "format": 2,
                "last_batch_id": -1,
                "batches": [],
                "lineage": None,
            }
        except json.JSONDecodeError:
            # torn state write never happens (os.replace is atomic) but a
            # clear error beats silent reset if the file is hand-damaged
            raise ValueError(f"corrupt STATE.json at {self.base}")

    def _swap_state(self, state):
        import json
        import os

        # an empty FIRST batch swaps state before any parquet write has
        # created the base dir
        os.makedirs(self.base, exist_ok=True)
        tmp = self._state_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f, sort_keys=True)
        os.replace(tmp, self._state_path())

    def _maybe_compact(self, spark, state):
        """Fold the log into one generation once ``compact_every``
        UNCOMPACTED batches have accumulated — called AFTER the state
        swap, so a crash during compaction leaves a fully committed
        (merely uncompacted) log; the staged generation dirs are
        invisible orphans the next compaction GCs.

        The cadence derives from DURABLE state (the committed batch
        list), not a process-local counter (r10 ADVICE): a deployment
        that restarts more often than every ``compact_every`` commits
        would reset an in-process counter and never compact, letting
        read amplification grow unbounded — the property this knob
        exists to bound. A compacted generation is the single
        ``c<id>`` string entry; everything else is an uncompacted
        batch id."""
        if not self.compact_every or not state["batches"]:
            return
        uncompacted = sum(
            1 for b in state["batches"] if not str(b).startswith("c")
        )
        if uncompacted >= self.compact_every:
            DedupIndexLog(spark, self.base).compact()

    def _lineage(self):
        """The driving streaming query's durable identity: the
        checkpoint metadata id (written by Spark at query start, stable
        across restarts on the SAME checkpoint, fresh when the
        checkpoint is recreated). None when the sink is driven directly
        (batch callers / tests) or before the metadata exists."""
        import json
        import os

        if not self.checkpoint:
            return None
        try:
            with open(os.path.join(self.checkpoint, "metadata")) as f:
                return json.load(f).get("id")
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def index(self, spark: SparkSession | None = None) -> DedupIndexLog | None:
        """Read handle over the committed log (None before the first
        commit) — ``pairs()`` / ``components()`` / ``signatures()``."""
        import os

        if not os.path.exists(self._state_path()):
            return None
        spark = spark or SparkSession.getActiveSession()
        log = DedupIndexLog(spark, self.base)
        return log if log.state["batches"] else None

    # -- sink -------------------------------------------------------------
    def __call__(self, batch_df, batch_id: int):
        import os

        from panoptes_spark.pipeline import dedup
        from panoptes_spark.pipeline.components import connected_components

        spark = batch_df.sparkSession
        st = self._read_state()
        lineage = self._lineage()
        if st.get("lineage") and lineage and st["lineage"] != lineage:
            raise ValueError(
                f"dedup index at {self.base} was committed by streaming "
                f"query lineage {st['lineage']}, but this query is "
                f"{lineage} (checkpoint deleted/recreated?). Its batch "
                "ids restart at 0 and would be dropped as replays - "
                "use a fresh base_path or restore the original checkpoint."
            )
        if batch_id <= st["last_batch_id"]:
            if lineage and not st.get("lineage") and st["batches"]:
                # base_path first populated by DIRECT batch calls (no
                # lineage recorded) now driven by a streaming query whose
                # fresh checkpoint restarts batch ids at 0: silently
                # treating 0..last_batch_id as replays would drop real
                # data — the same failure mode the lineage guard above
                # catches for checkpoint recreation
                raise ValueError(
                    f"dedup index at {self.base} holds "
                    f"{len(st['batches'])} batch-call commits with no "
                    f"recorded lineage, and streaming query {lineage} is "
                    f"presenting batch_id={batch_id} <= last_batch_id="
                    f"{st['last_batch_id']} — these are NOT replays and "
                    "would be dropped. Use a fresh base_path for the "
                    "streaming query (or continue with batch calls)."
                )
            return  # replay of a committed batch after restart

        sc = spark.sparkContext
        self.last_profile = {}

        def _sec(name):
            return _SinkSection(
                self, sc, f"neardedup/{batch_id}/{name}", name
            )

        k, nh, bands, thr = self.params
        idc = self.id_col
        first = not st["batches"]
        own_persists = []

        def _m(df):
            # localCheckpoint, not persist+count: both materialize once,
            # but a persisted frame keeps its FULL logical plan, and this
            # commit path fans each materialized frame into many
            # downstream actions — every one re-analyzes the deep tree
            # (membership scans, log unions, self-joins) on the driver,
            # seconds of pure planning per tiny job (measured: the r11
            # persist+count draft tripled small-commit seconds over the
            # r10 write+read-back layout it replaced). The checkpoint
            # truncates lineage the way the old parquet read-back did,
            # without the extra write+read round-trip per relation. A
            # lost-executor recompute gap mid-commit fails the commit;
            # the streaming replay overwrites the torn per-batch files —
            # the sink's normal crash story.
            own_persists.append(df.localCheckpoint(eager=True))
            return own_persists[-1]

        def _files(n_rows, rows_per_file=50_000):
            # right-size per-batch files: a small commit written from 32
            # shuffle partitions leaves 32 tiny files PER RELATION PER
            # BATCH, and the log's read/list cost grows with file COUNT,
            # not bytes (r11 — part of the sink's fixed per-commit
            # latency); scales back up for the seeded first build
            return max(1, min(int(n_rows) // int(rows_per_file) + 1, 256))

        def _w(rel, df, n_files=None):
            if n_files is not None:
                df = df.coalesce(n_files)
            df.write.mode("overwrite").parquet(
                os.path.join(self.base, rel, f"batch={batch_id}")
            )

        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=4)
        writes = []

        def _w_async(rel, df, n_files=None):
            # relation writes are mutually independent and their inputs
            # are checkpointed — overlap them instead of serializing 7
            # write jobs' fixed scheduling latency (r11; the commit cost
            # is job-count, not data). ALL futures join before the state
            # swap, so a failed write still fails the whole commit and
            # the replay overwrites the torn per-batch files.
            writes.append(pool.submit(_w, rel, df, n_files))

        try:
            # ingest: ONE materialization of the micro-batch serves the
            # emptiness check, the docs write, the signature pass, and
            # the node spine — the r10 path re-scanned the source for
            # each consumer (isEmpty + write + sign + ids)
            with _sec("ingest"):
                batch = _m(batch_df.select(idc, self.text_col))
                n_batch = batch.count()  # cache-served after _m
                if n_batch == 0:
                    st["last_batch_id"] = int(batch_id)
                    st["format"] = 2
                    self._swap_state(st)
                    self._maybe_compact(spark, st)
                    return
                nf = _files(n_batch)
                _w_async("docs", batch, nf)
            idt = batch.schema[idc].dataType.simpleString()

            with _sec("sign"):
                sig_new = _m(
                    dedup.minhash_signature(batch, self.text_col, k, nh)
                )
            # band ONLY the new batch; its membership and per-bucket
            # counts join the append-only log, so no later commit ever
            # re-bands it (r10 — the previous sink re-banded the ENTIRE
            # accumulated signature set per commit). The banded frame
            # materializes ONCE and serves both relation writes and
            # every downstream join — the r10 path wrote each relation
            # then read it back, a write+read round-trip per relation
            # that dominated the fixed per-commit job count (r10
            # verdict #2: the cost is job-count, not data).
            with _sec("band"):
                # coalesce BEFORE the checkpoint: banding is a cheap
                # array-slice map, and every downstream stage (counts,
                # member joins, candidate join) maps over this frame —
                # at 32 inherited partitions each of those tiny stages
                # pays 32 task launches for a handful of rows (r11; the
                # width scales back up with the batch via _files)
                nf_b = _files(n_batch * bands)
                b_new = _m(
                    dedup.banded_buckets(sig_new, idc, nh, bands).coalesce(
                        max(nf_b, min(8, n_batch))
                    )
                )
                _w_async("buckets", b_new)
                new_counts = b_new.groupBy("band", "bucket").agg(
                    F.count(F.lit(1)).alias("n")
                )
                _w_async("bcounts", new_counts, nf)

            log = None if first else DedupIndexLog(spark, self.base)
            old_pairs = None if first else log.pairs()

            # only buckets TOUCHED by this batch can yield new candidate
            # pairs (candidates need a new-batch member) or change any
            # bucket's size (sizes only grow, only via new members) —
            # merge stored counts for exactly those buckets: join the
            # un-aggregated per-batch count files against the
            # batch-proportional touched set FIRST, so the sum shuffle
            # is touched-sized, never bucket-vocabulary-sized
            with _sec("merge"):
                if first:
                    merged = _m(
                        new_counts.select(
                            "band",
                            "bucket",
                            F.lit(0).cast("bigint").alias("__old_n"),
                            F.col("n").alias("__new_n"),
                        )
                    )
                else:
                    # ONE aggregation instead of (old agg) LEFT JOIN
                    # (new agg): union the semi-pruned stored counts with
                    # the batch's banded rows (n=1 each — b_new is
                    # checkpointed, and duplicates are harmless in the
                    # semi probe) and fold both sides in a single
                    # conditional agg — two exchanges fewer per commit
                    # (r12; the commit cost is job-count, not data)
                    old_part = (
                        log.bucket_counts()
                        .join(
                            b_new.select("band", "bucket"),
                            ["band", "bucket"],
                            "left_semi",
                        )
                        .select(
                            "band", "bucket", "n",
                            F.lit(False).alias("__new"),
                        )
                    )
                    new_part = b_new.select(
                        "band",
                        "bucket",
                        F.lit(1).cast("bigint").alias("n"),
                        F.lit(True).alias("__new"),
                    )
                    merged = _m(
                        old_part.unionByName(new_part)
                        .groupBy("band", "bucket")
                        .agg(
                            F.coalesce(
                                F.sum(F.when(~F.col("__new"), F.col("n"))),
                                F.lit(0),
                            )
                            .cast("bigint")
                            .alias("__old_n"),
                            F.sum(F.when(F.col("__new"), F.col("n")))
                            .cast("bigint")
                            .alias("__new_n"),
                        )
                    )
            elig_b = merged.where(
                F.col("__old_n") + F.col("__new_n") <= self.max_bucket_size
            ).select("band", "bucket")

            # members of the eligible touched buckets: the new batch's
            # banded rows + stored membership joined on those buckets —
            # old docs are never re-banded, their membership is read
            with _sec("members"):
                new_mem = b_new.join(elig_b, ["band", "bucket"])
                old_mem = None
                if first:
                    members = new_mem
                else:
                    old_mem = log.bucket_membership().join(
                        elig_b, ["band", "bucket"]
                    )
                    members = new_mem.unionByName(old_mem)

            with _sec("verify"):
                # candidate pairs with >= 1 member from THIS batch
                # (old-old candidacy is settled by earlier commits + the
                # monotone cap revalidation below). ASYMMETRIC join
                # (r11): the left side is ONLY the batch's eligible
                # banded rows, canonicalized a<b afterwards — same pair
                # set as the previous members-self-join with an
                # (l.__new OR r.__new) filter, but the tiny left side
                # lets AQE broadcast it, dropping the self-join's
                # sort-merge shuffles; both member DAGs are map-only
                # over the cached banded frame + a broadcast bucket
                # filter, so nothing here needs a checkpoint.
                l, r = new_mem.alias("l"), members.alias("r")
                cand = (
                    l.join(
                        r,
                        (F.col("l.band") == F.col("r.band"))
                        & (F.col("l.bucket") == F.col("r.bucket"))
                        & (F.col(f"l.{idc}") != F.col(f"r.{idc}")),
                    )
                    .select(
                        F.least(
                            F.col(f"l.{idc}"), F.col(f"r.{idc}")
                        ).alias("a"),
                        F.greatest(
                            F.col(f"l.{idc}"), F.col(f"r.{idc}")
                        ).alias("b"),
                    )
                    .distinct()
                )
                # shingle sets for verification: new docs carry theirs in
                # sig_new; older docs re-shingle ON DEMAND. The old-side
                # id set is the stored members of the eligible TOUCHED
                # buckets (old_mem) — every touched bucket has a new
                # member by construction, so this is EXACTLY the set of
                # old candidate endpoints; probing with old_mem instead
                # of cand's endpoints keeps cand out of sh_all's lineage
                # (one fewer deep subtree to materialize per commit, r12)
                sh_all = sig_new.select(idc, "shingles")
                if not first:
                    # no distinct: only a left_semi probe side (r11)
                    old_cand_docs = log.docs().join(
                        old_mem.select(idc), idc, "left_semi"
                    )
                    sh_old = old_cand_docs.select(
                        F.col(idc),
                        F.expr(dedup.shingles_col(self.text_col, k)).alias(
                            "shingles"
                        ),
                    )
                    # sh_all streams through BOTH sides of the pair join
                    # below, and a broadcast pair join has no exchange
                    # ReusedExchange could dedup — unmaterialized, the
                    # retained-doc scan + re-shingle ran twice per
                    # commit (r12). Candidate-sized, so the checkpoint
                    # is tiny.
                    sh_all = _m(sh_all.unionByName(sh_old))
                # ONE materialization serves the relation write, the
                # tombstone diff, the touched-component marking, and the
                # live-edge union (r10 wrote then read back)
                new_pairs = _m(
                    dedup.jaccard_verify(cand, sh_all, idc, thr)
                )
                n_new_pairs = new_pairs.count()  # cache-served
                _w_async("pairs", new_pairs, nf)
                _w_async("sigs", sig_new.select(idc, "minhash"), nf)

            # tombstones: previously-live pairs whose EVERY generating
            # bucket crossed the cap once this batch joined (sizes only
            # grow, so retraction is monotone and final). Work is
            # CROSSED-bucket-sized, not corpus-sized: a live pair had a
            # witnessing shared bucket <= cap at the last commit; that
            # witness can die this commit only by crossing the cap NOW,
            # and only touched buckets change size — so every pair whose
            # liveness could change has both endpoints in some bucket
            # that crossed (old_n <= cap < old_n + new_n) this commit.
            # Crossed buckets held <= cap old members by definition, so
            # the at-risk pair set is O(#crossed * cap^2), batch-bounded.
            with _sec("tombs"):
                crossed_cond = (
                    F.col("__old_n") <= self.max_bucket_size
                ) & (
                    F.col("__old_n") + F.col("__new_n")
                    > self.max_bucket_size
                )
                crossed = merged.where(crossed_cond).select("band", "bucket")
                # EARLY EXIT (r11): no bucket crossed the cap this commit
                # — the common case for steady small batches — means the
                # at-risk set is empty by the monotonicity argument
                # above; skip the whole retraction cascade. `merged` is
                # cached, so the probe is one tiny job, not a recompute.
                if first or crossed.isEmpty():
                    n_tombs = 0
                    # JVM-side empty (range(0)), NOT createDataFrame([]):
                    # python-backed relations pay a ~6 s python-runner
                    # spin-up when written through coalesce (measured),
                    # and this write runs every commit
                    tombs = spark.range(0).select(
                        F.col("id").cast(idt).alias("a"),
                        F.col("id").cast(idt).alias("b"),
                    )
                    _w_async("tombs", tombs)
                else:
                    # old members of crossed buckets (pairs are old-old —
                    # committed pairs never include this batch's docs)
                    mem_x = log.bucket_membership().join(
                        crossed, ["band", "bucket"]
                    )
                    xl, xr = mem_x.alias("xl"), mem_x.alias("xr")
                    risk_cand = (
                        xl.join(
                            xr,
                            (F.col("xl.band") == F.col("xr.band"))
                            & (F.col("xl.bucket") == F.col("xr.bucket"))
                            & (F.col(f"xl.{idc}") < F.col(f"xr.{idc}")),
                        )
                        .select(
                            F.col(f"xl.{idc}").alias("a"),
                            F.col(f"xr.{idc}").alias("b"),
                        )
                        .distinct()
                    )
                    at_risk = _m(
                        old_pairs.select("a", "b").join(
                            risk_cand, ["a", "b"], "left_semi"
                        )
                    )
                    # an at-risk pair stays live iff SOME shared bucket's
                    # merged size (old batches + this batch) is still
                    # under the cap — membership and counts are read only
                    # for the at-risk ids' buckets, all at-risk-sized
                    risk_ids = (
                        at_risk.select(F.col("a").alias(idc))
                        .unionByName(at_risk.select(F.col("b").alias(idc)))
                        .distinct()
                    )
                    mem_risk = _m(
                        log.bucket_membership().join(
                            risk_ids, idc, "left_semi"
                        )
                    )
                    shared = (
                        at_risk.join(
                            mem_risk.withColumnsRenamed({idc: "a"}), "a"
                        )
                        .join(
                            mem_risk.withColumnsRenamed({idc: "b"}),
                            ["b", "band", "bucket"],
                        )
                        .select("a", "b", "band", "bucket")
                    )
                    shared_b = shared.select("band", "bucket").distinct()
                    totals = (
                        log.bucket_counts()
                        .unionByName(new_counts)
                        .join(shared_b, ["band", "bucket"], "left_semi")
                        .groupBy("band", "bucket")
                        .agg(F.sum("n").alias("__n"))
                    )
                    still = (
                        shared.join(
                            totals.where(
                                F.col("__n") <= self.max_bucket_size
                            ),
                            ["band", "bucket"],
                            "left_semi",
                        )
                        .select("a", "b")
                        .distinct()
                    )
                    tombs = _m(at_risk.join(still, ["a", "b"], "left_anti"))
                    n_tombs = tombs.count()  # cache-served
                    _w_async("tombs", tombs, nf)

            # component relabeling over TOUCHED components only: the
            # endpoints of new/tombstoned pairs mark components; those
            # components' nodes + the batch form the subgraph (closed
            # under live edges — see class docstring). r11: three tiers
            # by churn size instead of always-distributed propagation —
            # (1) NO churn (no new pairs, no tombstones): new docs are
            #     singletons, label map is batch-sized and map-only, the
            #     accumulated label log is never read;
            # (2) churn bounded by `unionfind_max_nodes`: exact
            #     driver-side union-find (the propagation loop's
            #     2-jobs-per-round fixed cost was the largest share of
            #     the sink's per-commit latency — r10 verdict #2);
            # (3) larger churn: distributed strict min-label rounds, as
            #     before. A tombstone can SPLIT a component; including
            #     the whole touched component keeps the split exact in
            #     every tier.
            with _sec("comps"):
                new_ids = batch.select(idc)
                cap = self.unionfind_max_nodes
                if n_new_pairs == 0 and n_tombs == 0:
                    relabeled = new_ids.select(
                        F.col(idc).alias("node"),
                        F.col(idc).alias("component"),
                    )
                    _w_async("comps", relabeled, nf)
                else:
                    # build the subgraph DAGs (NOT materialized: the
                    # union-find fast path evaluates each exactly once
                    # via toPandas, so checkpoints would only add jobs)
                    if first:
                        sub_nodes_df = new_ids.withColumnRenamed(
                            idc, "node"
                        )
                    else:
                        touched = new_pairs.select(
                            F.col("a").alias("node")
                        ).unionByName(new_pairs.select(F.col("b").alias("node")))
                        if n_tombs:  # skip empty legs (r11)
                            touched = touched.unionByName(
                                tombs.select(F.col("a").alias("node"))
                            ).unionByName(
                                tombs.select(F.col("b").alias("node"))
                            )
                        # no distinct: touched only feeds a left_semi
                        # probe side, where duplicates are harmless —
                        # the dedup shuffle was a whole stage wave (r11)
                        raw = log.components_raw()
                        if log.rel_bytes("comps") > _PRUNE_COMPS_MIN_BYTES:
                            # WIDE label log (real deployment): resolve
                            # latest-wins only for the nodes that
                            # matter. Resolution is PER-NODE independent
                            # (max_by over each node's own rows), so a
                            # semi join below the per-node aggregate is
                            # exact: (1) resolve the touched endpoints,
                            # (2) candidates = any node that EVER wore a
                            # touched component label (a node's latest
                            # row is one of its raw rows — complete
                            # superset), (3) re-resolve candidates and
                            # keep those whose LATEST label is touched —
                            # exactly the touched components'
                            # membership, so the closure argument in the
                            # class docstring is unchanged. Three
                            # broadcast-pruned scans of the log instead
                            # of ONE corpus-sized label shuffle per
                            # commit (r12). On a narrow (bench-layout)
                            # log the extra scans cost more jobs than
                            # the one tiny shuffle they avoid (measured:
                            # comps 9 -> 13-16 jobs, 2 -> 5-9 s), so
                            # the classic shape is kept there — the
                            # same data-derived policy as the Lloyd
                            # trainer persists.
                            touched_comps = (
                                raw.join(touched, "node", "left_semi")
                                .groupBy("node")
                                .agg(
                                    F.max_by("component", "__b").alias(
                                        "component"
                                    )
                                )
                                .select("component")
                                .distinct()
                            )
                            cand_nodes = raw.join(
                                touched_comps, "component", "left_semi"
                            ).select("node")
                            sub_old = (
                                raw.join(cand_nodes, "node", "left_semi")
                                .groupBy("node")
                                .agg(
                                    F.max_by("component", "__b").alias(
                                        "component"
                                    )
                                )
                                .join(
                                    touched_comps, "component", "left_semi"
                                )
                                .select("node")
                            )
                        else:
                            old_comps = log.components()
                            touched_comps = (
                                old_comps.join(touched, "node", "left_semi")
                                .select("component")
                                .distinct()
                            )
                            sub_old = old_comps.join(
                                touched_comps, "component", "left_semi"
                            ).select("node")
                        # no distinct: sub_old (resolved labels, one
                        # row per node) and the batch's ids are each
                        # unique, and the log assumes ids are unique
                        # ACROSS batches, so the union is duplicate-free
                        # by construction — saves a stage wave (r11)
                        sub_nodes_df = sub_old.unionByName(
                            new_ids.withColumnRenamed(idc, "node")
                        )

                    def _live_edges(nodes_rel):
                        if first:
                            return new_pairs.select("a", "b")
                        old_live = old_pairs.select("a", "b")
                        if n_tombs:  # skip the anti-join stage (r11)
                            old_live = old_live.join(
                                tombs, ["a", "b"], "left_anti"
                            )
                        return old_live.unionByName(
                            new_pairs.select("a", "b")
                        ).join(
                            nodes_rel.withColumnRenamed("node", "a"),
                            "a",
                            "left_semi",
                        )

                    # fast path: ONE action for the node spine, one for
                    # the edges — limit probes double as the size guard
                    # (len == cap+1 means truncated -> distributed). A
                    # single tagged-union action was tried (r12) and
                    # measured WORSE (comps 9 -> 10 jobs: the per-leg
                    # limits plan their own collect stages and nothing
                    # is actually shared), so the two-action shape
                    # stays.
                    npdf = sub_nodes_df.limit(cap + 1).toPandas()
                    epdf = None
                    if len(npdf) <= cap:
                        nodes_local = F.broadcast(
                            spark.createDataFrame(npdf, f"node {idt}")
                        )
                        epdf = (
                            _live_edges(nodes_local)
                            .select("a", "b")
                            .limit(4 * cap + 1)
                            .toPandas()
                        )
                    if epdf is not None and len(epdf) <= 4 * cap:
                        # exact driver-side union-find over the
                        # churn-sized subgraph: the propagation loop's
                        # 2-jobs-per-round fixed cost was the largest
                        # share of the sink's per-commit latency (r10
                        # verdict #2). Write WITHOUT coalesce: the
                        # labels frame is python-backed (createDataFrame
                        # from pandas) and already few-partition;
                        # coalescing it pays a python-runner spin-up per
                        # write (measured ~6 s).
                        out = _unionfind_pdf(npdf, epdf)
                        _w_async(
                            "comps",
                            spark.createDataFrame(
                                out, f"node {idt}, component {idt}"
                            ),
                        )
                    else:
                        # churn larger than the driver cap: distributed
                        # strict min-label propagation over materialized
                        # frames (a silently non-converged labeling here
                        # would be trusted as exact by every later
                        # commit's touched-component closure and persist
                        # in the log — see connected_components)
                        sub_nodes = _m(sub_nodes_df)
                        sub_edges = _m(_live_edges(sub_nodes))
                        n_sub = sub_nodes.count()  # cache-served
                        relabeled = connected_components(
                            sub_edges,
                            nodes=sub_nodes,
                            max_iter=self.max_iter,
                            strict=True,
                        )
                        _w_async(
                            "comps", relabeled, _files(max(n_sub, 1))
                        )
            with _sec("flush"):
                # every relation durable before the state swap commits it
                for f in writes:
                    f.result()
        finally:
            pool.shutdown(wait=True, cancel_futures=True)
            # release only THIS commit's persists (a global release could
            # drop frames a concurrent consumer registered)
            for df in own_persists:
                try:
                    df.unpersist()
                except Exception:
                    pass

        with _sec("commit"):
            # cumulative live-tombstone count: 0 lets every pairs() read
            # and the sink's live-edge union skip the anti-join (r11).
            # A pre-r11 state has no key -> stays unknown (None).
            prev_tombs = st.get("n_tombs_total", 0 if first else None)
            total_tombs = None if prev_tombs is None else prev_tombs + n_tombs
            st = {
                "format": 2,
                "last_batch_id": int(batch_id),
                "batches": st["batches"] + [int(batch_id)],
                "lineage": st.get("lineage") or lineage,
                "id_col": idc,
                "text_col": self.text_col,
                "id_type": idt,
                "k_shingle": k,
                "num_hashes": nh,
                "bands": bands,
                "threshold": thr,
                "max_bucket_size": self.max_bucket_size,
                "max_iter": self.max_iter,
                "n_tombs_total": total_tombs,
            }
            self._swap_state(st)
            self._maybe_compact(spark, st)


def near_dedup_index_stream(
    docs: DataFrame,
    base_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    trigger: dict | None = None,
    **params,
):
    """Wire a streaming document source into a :class:`NearDedupIndexSink`
    and return (query, sink). ``sink.index()`` reads the last COMMITTED
    state — query pairs/components through :class:`DedupIndexLog` at any
    time. ``trigger`` passes through to ``writeStream.trigger`` (default
    ``{"availableNow": True}`` — drain-and-stop; pass e.g.
    ``{"processingTime": "1 minute"}`` for continuous maintenance)."""
    sink = NearDedupIndexSink(
        base_path, id_col, text_col, checkpoint=checkpoint, **params
    )
    q = (
        docs.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
    return q, sink
