"""URL-seen membership — SURVEY §2.3 J1, §2.4 A5.

The reference's seen-set is a driver-local ``map[pid]title``
(/root/reference/plugin/public/tools.go:405-414) probed inline at
tools.go:339,380. At 10^10-URL scale the seen set is a distributed table, so
membership is:

1. an (optional) partition-local **bloom prefilter** — kills the shuffle for
   the overwhelmingly-common "already seen" rows before the exact join;
2. an exact **left-anti / changed-title join** on the survivors — removes
   bloom false positives (bloom has no false negatives, so correctness is
   exactly the reference's semantics);
3. in-generation dedupe (``dropDuplicates`` on the canonical hash) — the
   reference got this from map-key idempotence (tools.go:239,279).

Scale notes: the anti-join shuffles both sides on ``url_hash`` — with AQE on,
skewed buckets split automatically; the bloom prefilter typically drops >90%
of candidates map-side so the shuffle moves only the novel tail. The bloom
aggregate itself is a single ~N·10bit bitmap reduced tree-wise; for 10^10
seen URLs use ``num_partition_blooms`` host-bucket-sharded blooms joined
map-side instead of one giant one.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_anti_join(candidates: DataFrame, seen: DataFrame, key: str) -> DataFrame:
    """Rows of ``candidates`` whose ``key`` is not in ``seen`` (J1 not-seen half)."""
    return candidates.join(seen.select(key).distinct(), on=key, how="left_anti")


def due_or_changed(
    listing: DataFrame,
    seen: DataFrame,
    keys: list[str] | None = None,
    compare: str = "title",
    version: str | None = None,
) -> DataFrame:
    """J1 — the reference's due predicate (tools.go:339): a row is due iff
    its key is NOT in the seen set OR its ``compare`` column changed.

    Returns ``listing`` + boolean ``is_due``. The seen side is aggregated to
    one row per key first so the join can't fan out; Catalyst broadcasts it
    when small, sort-merge joins otherwise.

    True last-wins over a seen set that may carry duplicate keys needs an
    ordering column: pass ``version`` (e.g. generation / updated_at) and the
    highest-version row's ``compare`` wins via ``max_by`` over the TOTAL
    key ``struct(version, compare)`` — two rows tied on version resolve to
    the max ``compare``, so the result never depends on partition order
    (``max_by`` on version alone would still flap on a version tie, the
    failure mode this parameter exists to remove).  Without
    ``version`` the aggregate is ``max(compare)``: on a key-unique snapshot
    (the A5 upsert invariant, which every snapshot written by this engine
    satisfies) that IS the row's value, and on an unexpectedly duplicated key
    it stays deterministic run-to-run instead of flapping with scheduling.
    """
    keys = keys or ["judge", "pid"]
    chosen = (
        F.expr(f"max_by({compare}, struct({version}, {compare}))")
        if version is not None
        else F.max(compare)
    )
    seen_kv = seen.groupBy(*keys).agg(chosen.alias("__seen_cmp"))
    joined = listing.join(seen_kv, on=keys, how="left")
    is_due = F.col("__seen_cmp").isNull() | (F.col("__seen_cmp") != F.col(compare))
    return joined.withColumn("is_due", is_due).drop("__seen_cmp")


def in_generation_dedupe(df: DataFrame, key: str = "url_hash") -> DataFrame:
    """Within-batch dedupe (map-key idempotence of tools.go:239,279), made
    explicit. dropDuplicates = partial-agg per partition then shuffle, so
    duplicates collapse map-side before moving."""
    return df.dropDuplicates([key])


def build_bloom(
    seen: DataFrame,
    key: str,
    expected_items: int,
    fpp: float = 0.01,
    build_partitions: int = 16,
    fanout: int = 4,
) -> "NumpyBloom":
    """Distributed bloom build over ``seen[key]`` (int64 keys).

    Each of ``build_partitions`` partitions builds a local bitmap from its
    Arrow batches (numpy, no per-row Python) and ships it as ONE binary row;
    the bitmaps are then OR-reduced in a ``fanout``-ary tree of executor-side
    mapInArrow rounds, so the driver ever receives at most ``fanout`` blobs
    (≤ fanout·m/8 bytes) regardless of ``build_partitions`` — at 10^10 keys
    / 1 % fpp one blob is ~1.5 GB, so a flat collect of 16 of them through
    the driver would be the bottleneck this tree removes.  For frontier-scale
    seen sets, shard by host_bucket and build one bloom per shard instead of
    one global bitmap (same code, smaller ``m`` each) — the generation loop
    and arrow_frontier already use that partition-local path.
    """
    import math as _math

    import pyarrow as pa

    if fanout < 2:
        raise ValueError(
            f"fanout must be >= 2 (got {fanout}): the OR-reduce tree halves "
            "the row count by ceil(rows/fanout) per round, which never "
            "terminates at fanout <= 1"
        )
    bloom = NumpyBloom(expected_items, fpp)
    m, k = bloom.m, bloom.k
    nwords = len(bloom.bits)

    def build(batches):
        local = NumpyBloom.__new__(NumpyBloom)
        local.m, local.k = m, k
        local.bits = np.zeros(nwords, dtype=np.uint64)
        for batch in batches:
            keys = batch.column(0).to_numpy(zero_copy_only=False)
            if len(keys):
                local.add(keys)
        yield pa.RecordBatch.from_arrays(
            [pa.array([local.bits.tobytes()], type=pa.binary())], names=["bits"]
        )

    def or_bitmaps(batches):
        acc = None
        for batch in batches:
            for blob in batch.column(0).to_pylist():
                b = np.frombuffer(blob, dtype=np.uint64)
                acc = b.copy() if acc is None else acc | b
        if acc is not None:
            yield pa.RecordBatch.from_arrays(
                [pa.array([acc.tobytes()], type=pa.binary())], names=["bits"]
            )

    # repartition (not coalesce): coalesce would cap the upstream scan's
    # parallelism at build_partitions; the shuffle here moves only 8-byte
    # keys, so full-width compute + narrow exchange wins.
    bitmaps = (
        seen.select(F.col(key).cast("long").alias("k"))
        .repartition(build_partitions)
        .mapInArrow(build, "bits binary")
    )
    n_rows = build_partitions  # build() yields exactly one row per partition
    while n_rows > fanout:
        n_parts = _math.ceil(n_rows / fanout)
        bitmaps = bitmaps.repartition(n_parts).mapInArrow(
            or_bitmaps, "bits binary"
        )
        n_rows = n_parts  # or_bitmaps yields ≤1 row per partition
    for row in bitmaps.collect():
        bloom.bits |= np.frombuffer(row.bits, dtype=np.uint64)
    return bloom


def bloom_prefiltered_anti_join(
    candidates: DataFrame,
    seen: DataFrame,
    key: str,
    expected_items: int | None = None,
    fpp: float = 0.01,
) -> DataFrame:
    """Anti-join with a bloom prefilter (the 100-TB fast path).

    Builds the bitmap with :func:`build_bloom`, broadcasts it, and probes it
    map-side with an Arrow-batched pandas UDF.  Candidates whose probe is
    negative are definitively new (no false negatives) and skip the join
    shuffle entirely; only the bloom-positive minority (true seen + fpp
    false positives) pays the exact anti-join that removes false positives.
    Net effect: the shuffle moves ~|novel|·fpp + |seen∩batch| rows instead
    of the whole batch.
    """
    from pyspark.sql.functions import pandas_udf

    n = expected_items or seen.count() or 1
    bloom = build_bloom(seen, key, n, fpp)
    bc = candidates.sparkSession.sparkContext.broadcast(
        (bloom.m, bloom.k, bloom.bits.tobytes())
    )

    @pandas_udf("boolean")
    def might_contain(keys: pd.Series) -> pd.Series:
        m, k, bits = bc.value
        b = NumpyBloom.__new__(NumpyBloom)
        b.m, b.k = m, k
        b.bits = np.frombuffer(bits, dtype=np.uint64)
        return pd.Series(b.might_contain(keys.to_numpy(dtype=np.int64)))

    # The two output branches (fresh / maybe) would otherwise recompute the
    # candidates' whole upstream lineage twice — persist the flagged frame so
    # the probe and everything above it runs exactly once.
    from pyspark import StorageLevel

    flagged = candidates.withColumn(
        "__bloom_maybe", might_contain(F.col(key))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    fresh = flagged.filter(~F.col("__bloom_maybe")).drop("__bloom_maybe")
    maybe = flagged.filter(F.col("__bloom_maybe")).drop("__bloom_maybe")
    survived = exact_anti_join(maybe, seen, key)
    return fresh.unionByName(survived)


def _num_bits(n: int, fpp: float) -> int:
    return max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))


# ---------------------------------------------------------------------------
# numpy bloom + cuckoo — partition-local membership inside pandas UDF stages
# (the in-generation / per-bucket path where a DataFrame join is overkill).
# ---------------------------------------------------------------------------


class NumpyBloom:
    """Vectorized bloom filter over int64 keys (no per-row Python).

    k hash functions derived from the 64-bit key by splitting + affine
    remixing — standard double-hashing construction (h1 + i*h2 mod m).
    """

    def __init__(self, capacity: int, fpp: float = 0.01):
        self.m = _num_bits(max(capacity, 1), fpp)
        self.k = max(1, int(round(self.m / max(capacity, 1) * math.log(2))))
        self.bits = np.zeros((self.m + 63) // 64, dtype=np.uint64)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        k64 = keys.astype(np.uint64)
        h1 = (k64 ^ (k64 >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        h2 = (k64 >> np.uint64(13)) * np.uint64(0xC4CEB9FE1A85EC53) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.m)).astype(np.int64)

    def add(self, keys: np.ndarray) -> None:
        pos = self._positions(np.asarray(keys, dtype=np.int64)).ravel()
        np.bitwise_or.at(
            self.bits, pos // 64, (np.uint64(1) << (pos % 64).astype(np.uint64))
        )

    def might_contain(self, keys: np.ndarray) -> np.ndarray:
        pos = self._positions(np.asarray(keys, dtype=np.int64))
        hit = (
            self.bits[pos // 64] >> (pos % 64).astype(np.uint64) & np.uint64(1)
        ).astype(bool)
        return hit.all(axis=0)


class NumpyCuckoo:
    """Cuckoo filter over int64 keys — supports delete, used for the
    in-generation working set (insert on enqueue, delete on commit).

    Buckets of 4 × 16-bit fingerprints; partial-key cuckoo displacement.
    """

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, capacity: int):
        self.nbuckets = 1 << max(4, math.ceil(math.log2(max(capacity, 1) / self.SLOTS + 1)))
        self.table = np.zeros((self.nbuckets, self.SLOTS), dtype=np.uint16)

    def _fp_and_buckets(self, key: int) -> tuple[int, int, int]:
        k = key & 0xFFFFFFFFFFFFFFFF
        h = ((k ^ (k >> 33)) * 0xFF51AFD7ED558CCD) & 0xFFFFFFFFFFFFFFFF
        fp = (h & 0xFFFF) or 1
        b1 = (h >> 16) % self.nbuckets
        b2 = (b1 ^ (fp * 0x5BD1E995)) % self.nbuckets
        return fp, b1, b2

    def _alt(self, bucket: int, fp: int) -> int:
        return (bucket ^ (fp * 0x5BD1E995)) % self.nbuckets

    def insert(self, key: int) -> bool:
        fp, b1, b2 = self._fp_and_buckets(key)
        for b in (b1, b2):
            row = self.table[b]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        b = b1
        rng_state = fp
        for _ in range(self.MAX_KICKS):
            rng_state = (rng_state * 1103515245 + 12345) & 0x7FFFFFFF
            slot = rng_state % self.SLOTS
            fp, self.table[b][slot] = int(self.table[b][slot]), fp
            b = self._alt(b, fp)
            row = self.table[b]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        return False  # table full

    def contains(self, key: int) -> bool:
        fp, b1, b2 = self._fp_and_buckets(key)
        return bool((self.table[b1] == fp).any() or (self.table[b2] == fp).any())

    def delete(self, key: int) -> bool:
        fp, b1, b2 = self._fp_and_buckets(key)
        for b in (b1, b2):
            idx = np.where(self.table[b] == fp)[0]
            if len(idx):
                self.table[b][idx[0]] = 0
                return True
        return False


def might_contain_col(seen_hashes_bloom: NumpyBloom, key: Column) -> Column:
    raise NotImplementedError(
        "driver-side bloom cannot be referenced from a Column; use "
        "bloom_prefiltered_anti_join (JVM bloom) or probe inside a pandas UDF"
    )
