"""Build the spark-submit artifact: engine.zip with the crawler_spark package.

Usage:
    python tools/package.py [out.zip]
    spark-submit --py-files engine.zip your_job.py

The zip contains only the library (no tests/tools), importable from
executors via --py-files on any cluster manager — the multi-executor run
path of the north rule.  A local smoke of the exact invocation:

    python tools/package.py /tmp/engine.zip
    spark-submit --master 'local[8]' --py-files /tmp/engine.zip \
        tools/submit_smoke.py
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def build(out: str) -> str:
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted((REPO / "crawler_spark").rglob("*.py")):
            z.write(p, p.relative_to(REPO))
    return out


if __name__ == "__main__":
    dest = sys.argv[1] if len(sys.argv) > 1 else str(REPO / "engine.zip")
    print(build(dest))
