"""Arrow-native frontier dequeue — the 10^10-URL hot path.

The north-star architecture keeps *all* membership tests, canonicalization
and priority updates in Arrow batches with zero per-row Python.  The
DataFrame-native operators (membership.py / frontier.py) express the same
semantics relationally — windows, anti-joins, dropDuplicates — which costs
one shuffle per operator.  This module collapses the whole
dedupe → membership → priority → politeness-budget chain into:

    frontier ─┐
              ├─ cogroup by host_bucket ──>  ONE applyInArrow stage
    url_seen ─┘

i.e. exactly TWO shuffles total (one per input), with every per-row step as
a C++/numpy batch kernel:

- canonicalization             → pyarrow.compute RE2 kernels (no Python
                                 string objects — pandas ``.str`` would
                                 allocate millions of PyObjects per batch,
                                 which saturates the allocator when 32
                                 workers run concurrently)
- in-generation dedupe         → np.unique on the 64-bit hash
- seen-membership              → partition-local NumpyBloom prefilter
                                 (no false negatives) + exact sorted-array
                                 verify of the bloom-positives
- priority + crawl budget      → np.lexsort + group-boundary ranks
- politeness schedule          → rank·min_delay_ms offset per host
- row materialization          → one pa.Table.take (C++ gather)

Correctness is pinned to the relational path by tests
(tests/test_arrow_frontier.py): same inputs ⇒ identical dequeued set.

Scale notes: the cogroup key is ``host_bucket`` (host-hash mod B), so skew
is bounded by bucketing; partition state (the seen slice + bloom) lives only
for the duration of its batch.  Shuffle payload carries the canonical URL
string once — all other state is 8-byte hashes.  Python workers are separate
processes, so this stage scales with cores where a single shared JVM heap's
allocation bandwidth saturates.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.operators.membership import NumpyBloom

DEQUEUE_SCHEMA = (
    "host_bucket int, host string, canonical_url string, url_hash long, "
    "rank int, sched_offset_ms long"
)

# (?s)/\z everywhere an anchor or dot appears: RE2 (here) and Java regex
# (functions.urls.canonicalize) give `$`/`.` different newline semantics;
# with these flags both paths agree byte-for-byte on arbitrary garbage
# (fuzzed in tests/test_properties.py).
_URL_RE = (
    r"(?s)^(?P<scheme>[a-zA-Z][a-zA-Z0-9+.-]*)://"
    r"(?P<hostport>[^/?#]+)(?P<rest>.*)\z"
)


def canonicalize_arrays(urls: pa.Array) -> tuple[pa.Array, pa.Array]:
    """(canonical_url, host) from a URL array — all pyarrow C++ kernels.

    Mirrors functions.urls.canonicalize exactly — for well-formed URLs
    (lowercase scheme+host, strip fragment, strip default ports (:80 http,
    :443 https), empty path → '/') AND for malformed input: both paths
    return null for rows without a scheme://hostport shape, and the regex
    flags pin Java-vs-RE2 newline semantics (property-fuzzed in
    tests/test_properties.py).  The frontier filters invalid URLs before
    this stage either way — functions.urls.is_url.
    """
    no_frag = pc.replace_substring_regex(
        urls, pattern=r"(?s)#.*\z", replacement=""
    )
    m = pc.extract_regex(no_frag, _URL_RE)
    scheme = pc.utf8_lower(pc.struct_field(m, "scheme"))
    hostport_raw = pc.struct_field(m, "hostport")
    pm = pc.extract_regex(hostport_raw, r"(?s)^(?P<h>.*):(?P<port>\d+)\z")
    has_port = pc.is_valid(pm)
    host = pc.utf8_lower(
        pc.if_else(has_port, pc.struct_field(pm, "h"), hostport_raw)
    )
    port = pc.struct_field(pm, "port")
    default_port = pc.fill_null(
        pc.or_kleene(
            pc.and_kleene(pc.equal(scheme, "http"), pc.equal(port, "80")),
            pc.and_kleene(pc.equal(scheme, "https"), pc.equal(port, "443")),
        ),
        False,
    )
    keep_port = pc.and_(has_port, pc.invert(default_port))
    hostport = pc.if_else(
        keep_port,
        pc.binary_join_element_wise(host, pc.fill_null(port, ""), ":"),
        host,
    )
    rest = pc.struct_field(m, "rest")
    rest = pc.if_else(pc.equal(rest, ""), pa.scalar("/"), rest)
    canon = pc.binary_join_element_wise(scheme, "://", hostport, rest, "")
    return canon, hostport


def canonicalize_stage(urls_df: DataFrame, url_col: str = "url") -> DataFrame:
    """mapInArrow canonicalize: (url) → (canonical_url, host).

    The 64-bit membership key is added afterwards with the JVM ``xxhash64``
    — hashing an existing string allocates nothing and keeps the key
    identical to the one the relational path and the warehouse tables use.
    """

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            canon, host = canonicalize_arrays(batch.column(0))
            yield pa.RecordBatch.from_arrays(
                [canon, host], names=["canonical_url", "host"]
            )

    out = urls_df.select(F.col(url_col)).mapInArrow(
        run, "canonical_url string, host string"
    )
    return out.withColumn("url_hash", F.xxhash64("canonical_url"))


def _empty_out() -> pa.Table:
    return pa.table(
        {
            "host_bucket": pa.array([], type=pa.int32()),
            "host": pa.array([], type=pa.string()),
            "canonical_url": pa.array([], type=pa.string()),
            "url_hash": pa.array([], type=pa.int64()),
            "rank": pa.array([], type=pa.int32()),
            "sched_offset_ms": pa.array([], type=pa.int64()),
        }
    )


def dequeue_generation(
    frontier: DataFrame,
    seen: DataFrame,
    budget_per_host: int = 10_000,
    num_buckets: int = 64,
    min_delay_ms: int = 200,
    fpp: float = 0.01,
) -> DataFrame:
    """The cogrouped dequeue: frontier (canonical_url, host, url_hash) ×
    seen (url_hash, host) → per-host crawl batch, in TWO shuffles total.

    Bucket = pmod(xxhash64(host), B); both sides group on it, and the Arrow
    cogroup function applies dedupe/membership/priority/budget with numpy
    kernels.  Deterministic priority: url_hash ascending within host (the
    relational path uses the same ordering).  Hosts are ranked by their
    64-bit hash — a host-hash collision would merge two hosts' budgets,
    at probability ~B·2^-64 per bucket: ignored.
    """
    f = frontier.withColumn("host_hash", F.xxhash64("host")).withColumn(
        "host_bucket", F.pmod(F.col("host_hash"), F.lit(num_buckets)).cast("int")
    )
    # seen's payload column is RENAMED: if `seen` derives from `frontier`
    # (same attribute ids), Spark's cogroup deduplicates identically-named
    # attributes and the right-side table reaches Python with only the
    # grouping key — distinct names break the collision.
    s = seen.select(
        F.col("url_hash").alias("seen_url_hash"),
        F.pmod(F.xxhash64("host"), F.lit(num_buckets)).cast("int").alias(
            "host_bucket"
        ),
    )

    def fn(left: pa.Table, right: pa.Table) -> pa.Table:
        if left.num_rows == 0:
            return _empty_out()
        keys = left.column("url_hash").to_numpy(zero_copy_only=False)
        hh = left.column("host_hash").to_numpy(zero_copy_only=False)
        seen_arr = (
            right.column("seen_url_hash").to_numpy(zero_copy_only=False)
            if right.num_rows
            else None
        )
        sel, rank0 = _dequeue_numpy(keys, hh, seen_arr, budget_per_host, fpp)
        if not len(sel):
            return _empty_out()
        taken = left.take(pa.array(sel))
        return pa.table(
            {
                "host_bucket": taken.column("host_bucket"),
                "host": taken.column("host"),
                "canonical_url": taken.column("canonical_url"),
                "url_hash": taken.column("url_hash"),
                "rank": pa.array((rank0 + 1).astype(np.int32)),
                "sched_offset_ms": pa.array(rank0 * min_delay_ms),
            }
        )

    return (
        f.groupBy("host_bucket")
        .cogroup(s.groupBy("host_bucket"))
        .applyInArrow(fn, DEQUEUE_SCHEMA)
    )


DEQUEUE_KEYS_SCHEMA = (
    "host_hash long, url_hash long, rank int, sched_offset_ms long"
)


def _dequeue_numpy(
    keys: np.ndarray,
    host_hashes: np.ndarray,
    seen_keys_raw: np.ndarray | None,
    budget_per_host: int,
    fpp: float,
) -> tuple[np.ndarray, np.ndarray]:
    """The shared numpy core: dedupe → bloom+exact membership → per-host
    rank.  Returns (selected row indices, 0-based ranks)."""
    uniq, first_idx = np.unique(keys, return_index=True)
    if seen_keys_raw is not None and len(seen_keys_raw):
        seen_keys = np.unique(seen_keys_raw)
        bloom = NumpyBloom(len(seen_keys), fpp)
        bloom.add(seen_keys)
        maybe = bloom.might_contain(uniq)
        novel = ~maybe
        if maybe.any():
            mk = uniq[maybe]
            pos = np.searchsorted(seen_keys, mk).clip(0, len(seen_keys) - 1)
            false_pos = seen_keys[pos] != mk
            novel[np.flatnonzero(maybe)[false_pos]] = True
        sel, kk = first_idx[novel], uniq[novel]
    else:
        sel, kk = first_idx, uniq
    if not len(sel):
        return sel, np.zeros(0, dtype=np.int64)
    hh = host_hashes[sel]
    order = np.lexsort((kk, hh))
    sel, hh = sel[order], hh[order]
    starts = np.r_[0, np.flatnonzero(hh[1:] != hh[:-1]) + 1]
    group_of = np.zeros(len(hh), dtype=np.int64)
    group_of[starts[1:]] = 1
    group_of = np.cumsum(group_of)
    rank0 = np.arange(len(hh)) - starts[group_of]
    keep = rank0 < budget_per_host
    return sel[keep], rank0[keep]


def dequeue_keys(
    frontier_keys: DataFrame,
    seen_keys: DataFrame,
    budget_per_host: int = 10_000,
    num_buckets: int = 64,
    min_delay_ms: int = 200,
    fpp: float = 0.01,
) -> DataFrame:
    """Key-only dequeue — the 10^10-frontier shape of :func:`dequeue_generation`.

    Inputs carry ONLY (url_hash, host_hash): at frontier scale the state
    tables are hash-keyed (strings live in the bucketed frontier store and
    are joined back map-side for the bounded fetch batch, co-partitioned on
    host_bucket), so the exchange moves 16 bytes/row instead of ~90 — the
    shuffle stops being the memory-bandwidth ceiling and the stage scales
    with cores.  Same dedupe/membership/priority semantics as
    dequeue_generation (shared numpy core).
    """
    f = frontier_keys.withColumn(
        "host_bucket", F.pmod(F.col("host_hash"), F.lit(num_buckets)).cast("int")
    ).select("url_hash", "host_hash", "host_bucket")
    # renamed for the same attribute-dedup reason as dequeue_generation:
    # a seen side derived from the frontier would otherwise reach Python
    # with only the grouping key column
    s = seen_keys.select(
        F.col("url_hash").alias("seen_url_hash"),
        F.pmod(F.col("host_hash"), F.lit(num_buckets)).cast("int").alias(
            "host_bucket"
        ),
    )

    def fn(left: pa.Table, right: pa.Table) -> pa.Table:
        if left.num_rows == 0:
            return pa.table(
                {
                    "host_hash": pa.array([], type=pa.int64()),
                    "url_hash": pa.array([], type=pa.int64()),
                    "rank": pa.array([], type=pa.int32()),
                    "sched_offset_ms": pa.array([], type=pa.int64()),
                }
            )
        keys = left.column("url_hash").to_numpy(zero_copy_only=False)
        hh = left.column("host_hash").to_numpy(zero_copy_only=False)
        seen_arr = (
            right.column("seen_url_hash").to_numpy(zero_copy_only=False)
            if right.num_rows
            else None
        )
        sel, rank0 = _dequeue_numpy(keys, hh, seen_arr, budget_per_host, fpp)
        return pa.table(
            {
                "host_hash": pa.array(hh[sel]),
                "url_hash": pa.array(keys[sel]),
                "rank": pa.array((rank0 + 1).astype(np.int32)),
                "sched_offset_ms": pa.array(rank0 * min_delay_ms),
            }
        )

    return (
        f.groupBy("host_bucket")
        .cogroup(s.groupBy("host_bucket"))
        .applyInArrow(fn, DEQUEUE_KEYS_SCHEMA)
    )
