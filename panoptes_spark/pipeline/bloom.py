"""Incremental dedup against a historical corpus: bloom prefilter +
exact anti-join confirm.

The recurring production question at 100 TB: "which of today's crawled
documents are NEW relative to everything already ingested?" A plain
anti-join shuffles the entire new batch. A bloom filter over the seen
fingerprints answers "definitely novel" for the typical large majority
of rows with zero shuffle — bloom filters have no false negatives — and
only the might-contain candidates (true duplicates + the configured
false-positive rate) proceed to the exact anti-join, whose verdict makes
the final result EXACT regardless of ``fpp``.

Division of labor (no row-at-a-time Python anywhere):

- hashing is JVM-side: ``xxhash64`` of the normalized-text fingerprint,
  twice with different salts, combined per Kirsch–Mitzenmacher double
  hashing ``pos_j = h1 + j*h2 (mod m)`` — k independent-enough probes
  from two hash evaluations;
- bit work is Arrow-batched numpy: per-partition bitmap builds OR'd on
  the driver (|partitions| × m/8 bytes through the driver — coalesce the
  build input on very wide clusters, or raise fpp to shrink m), and a
  vectorized membership probe against the broadcast bitmap.

The seen side of the confirming anti-join carries 16-byte fingerprints,
never document text, so its shuffle is ~#seen × 16 B.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text_col

__all__ = ["bloom_params", "build_fp_bloom", "novel_docs"]

_H1 = "xxhash64(__fp)"
_H2 = "xxhash64(__fp, 77)"


def bloom_params(expected_items: int, fpp: float) -> tuple[int, int]:
    """(m_bits, k) for a bloom filter sized to ``fpp`` at
    ``expected_items``; m rounds up to a byte multiple."""
    n = max(1, int(expected_items))
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + 7) // 8) * 8
    k = max(1, int(round(m / n * math.log(2))))
    return m, k


def _with_fp(df: DataFrame, text_col: str) -> DataFrame:
    return df.withColumn("__fp", F.md5(normalize_text_col(text_col)))


def build_fp_bloom(seen_fp: DataFrame, m_bits: int, k: int) -> bytes:
    """Bitmap over the ``__fp`` column of ``seen_fp``: per-partition
    numpy builds, driver OR-merge."""
    import numpy as np

    mbytes = m_bits // 8
    hashes = seen_fp.select(
        F.expr(_H1).alias("__h1"), F.expr(_H2).alias("__h2")
    )

    def build(batches):
        import pandas as pd

        bits = np.zeros(mbytes, dtype=np.uint8)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            h1 = pdf["__h1"].to_numpy().astype(np.uint64)
            h2 = pdf["__h2"].to_numpy().astype(np.uint64)
            for j in range(k):
                pos = (h1 + np.uint64(j) * h2) % np.uint64(m_bits)
                np.bitwise_or.at(
                    bits,
                    (pos >> np.uint64(3)).astype(np.int64),
                    np.left_shift(
                        np.uint8(1), (pos % np.uint64(8)).astype(np.uint8)
                    ),
                )
        yield pd.DataFrame({"bm": [bits.tobytes()]})

    out = np.zeros(mbytes, dtype=np.uint8)
    for row in hashes.mapInPandas(build, "bm binary").collect():
        out |= np.frombuffer(row.bm, dtype=np.uint8)
    return out.tobytes()


def novel_docs(
    new: DataFrame,
    seen: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    fpp: float = 0.01,
    expected_items: int | None = None,
    use_bloom: bool = True,
) -> DataFrame:
    """Rows of ``new`` whose normalized-text fingerprint never occurs in
    ``seen``. Result is exact; ``fpp`` only tunes how much of ``new``
    reaches the confirming anti-join. ``expected_items`` sizes the bloom
    (defaults to ``seen.count()`` — one extra job; pass the known corpus
    size to skip it). ``use_bloom=False`` is the plain anti-join."""
    nfp = _with_fp(new, text_col)
    sfp = _with_fp(seen, text_col).select("__fp")
    if not use_bloom:
        return nfp.join(sfp, "__fp", "left_anti").drop("__fp")

    import numpy as np

    if expected_items is None:
        expected_items = sfp.count()
    m_bits, k = bloom_params(expected_items, fpp)
    bitmap = build_fp_bloom(sfp, m_bits, k)
    spark = new.sparkSession
    bc = spark.sparkContext.broadcast(bitmap)

    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("boolean")
    def might_contain(h1s, h2s):
        import pandas as pd

        bits = np.frombuffer(bc.value, dtype=np.uint8)
        h1 = h1s.to_numpy().astype(np.uint64)
        h2 = h2s.to_numpy().astype(np.uint64)
        hit = np.ones(len(h1), dtype=bool)
        for j in range(k):
            pos = (h1 + np.uint64(j) * h2) % np.uint64(m_bits)
            byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
            hit &= (
                np.right_shift(byte, (pos % np.uint64(8)).astype(np.uint8))
                & np.uint8(1)
            ).astype(bool)
        return pd.Series(hit)

    flagged = nfp.withColumn(
        "__mc", might_contain(F.expr(_H1), F.expr(_H2))
    ).persist()
    definite = flagged.where(~F.col("__mc"))
    survivors = flagged.where(F.col("__mc")).join(sfp, "__fp", "left_anti")
    return definite.unionByName(survivors).drop("__fp", "__mc")
