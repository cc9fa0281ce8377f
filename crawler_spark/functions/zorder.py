"""Z-order (Morton) interleaving for multi-dimensional data clustering.

Iceberg/Delta expose z-order as a `rewrite_data_files` sort strategy: sort
by the bit-interleave of several key columns so every output file covers a
small rectangle of the key space, and parquet footer min/max stats prune
scans filtered on ANY of the keys — not just a lexicographic prefix.  For a
crawl store the natural pair is (host_hash, url_hash): host-scoped reads
(politeness audits, per-host recrawl) and url-range reads (shard repair)
both prune the same compacted layout.

This implementation interleaves the LOW ``bits_per_col`` bits of integer
key columns with pure long arithmetic (whole-stage-codegen-friendly; no
Python, no interpreted higher-order functions).  It assumes the keys are
roughly UNIFORM integers — hashes, which is exactly what the crawl store
keys by (murmur3 of canonical url / host).  For skewed natural columns,
rank-bucket them first or use a plain lexicographic sort instead; raw-bit
interleave of a skewed column degenerates to sorting by its high bits.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_expr(cols: list[str], bits_per_col: int = 16) -> Column:
    """Morton z-value of ``cols`` (integer columns, low ``bits_per_col``
    bits each) as one BIGINT column.

    Bit j of column i lands at interleaved position ``j * n_cols + i``, so
    ``len(cols) * bits_per_col`` must fit in 63 bits.  Deterministic and
    engine-portable (shift/and/or on non-negative longs), so the same
    expression can run as an oracle check in ANSI SQL.
    """
    n = len(cols)
    if n < 2:
        raise ValueError("z-order needs >=2 columns; use sort_by for one")
    if n * bits_per_col > 63:
        raise ValueError(
            f"{n} cols x {bits_per_col} bits = {n * bits_per_col} "
            "interleaved bits; must fit in 63 (signed BIGINT)"
        )
    terms = []
    for i, c in enumerate(cols):
        for j in range(bits_per_col):
            # mask each source bit BEFORE shifting into place: inputs may
            # be negative (sign-extended hashes) and `>>` is arithmetic.
            terms.append(
                f"(((CAST({c} AS BIGINT) >> {j}) & 1) << {j * n + i})"
            )
    return F.expr(" + ".join(terms))


def zorder_py(vals: list[int], bits_per_col: int = 16) -> int:
    """Pure-Python reference of :func:`zorder_expr` (tests pin equality)."""
    n = len(vals)
    z = 0
    for i, v in enumerate(vals):
        for j in range(bits_per_col):
            z |= ((v >> j) & 1) << (j * n + i)
    return z
