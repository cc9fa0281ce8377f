"""Text/normalization column functions — SURVEY §2.5 T5-T10, §2.2 P5.

All pure Column expressions. These reproduce the reference's parse-stage
normalizations (section templating, heading rewrites, limit extraction from
prose, judge-type classification, NBSP split, markdown guard).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def strip_title(col: Column) -> Column:
    """P5 — strip newlines + trim (plugin/syzoj/main.go:109,113-114)."""
    return F.trim(F.regexp_replace(col, r"[\n\r]", ""))


def sections_markdown(pairs: list[tuple[str, Column]]) -> Column:
    """T5 — assemble description.md as '# <Section>\\n\\n<body>\\n\\n' blocks
    (syzoj shape, plugin/syzoj/main.go:191-213). Empty bodies are skipped
    like the reference's `if x != ""` guards."""
    parts = [
        F.when(
            body.isNotNull() & (F.trim(body) != ""),
            F.concat(F.lit(f"# {name}\n\n"), F.trim(body), F.lit("\n\n")),
        ).otherwise(F.lit(""))
        for name, body in pairs
    ]
    out = parts[0]
    for p in parts[1:]:
        out = F.concat(out, p)
    return out


def h3_to_heading(col: Column) -> Column:
    """T6 — uoj: '<h3>x</h3>' → '\\n# x\\n\\n' (plugin/uoj/uoj.go:117-120)."""
    return F.regexp_replace(col, r"<h3[^>]*>\s*(.*?)\s*</h3>", "\n# $1\n\n")


def bzoj_html_cleanup(col: Column) -> Column:
    """T6 — bzoj: '<p>\\s*'→'<p>', '<br>\\n'→'<br>' (bzoj.go:225-227)."""
    out = F.regexp_replace(col, r"<p>\s+", "<p>")
    return F.regexp_replace(out, r"<br>\n", "<br>")


def extract_time_ms(col: Column) -> Column:
    """T7 — time limit from prose: first number before an 's'/'sec' unit →
    ms (uoj.go:121-130 semantics: seconds ×1000)."""
    sec = F.regexp_extract(col, r"(\d+(?:\.\d+)?)\s*s", 1)
    return F.when(sec != "", (sec.cast("double") * 1000).cast("int")).otherwise(
        F.lit(None).cast("int")
    )


def extract_memory_mb(col: Column) -> Column:
    """T7 — memory limit from prose with GB→×1024 (uoj.go:131-144)."""
    num = F.regexp_extract(col, r"(\d+)\s*([MG])B", 1)
    unit = F.regexp_extract(col, r"\d+\s*([MG])B", 1)
    mb = F.when(unit == "G", num.cast("int") * 1024).otherwise(num.cast("int"))
    return F.when(num != "", mb).otherwise(F.lit(None).cast("int"))


def judge_type_uoj(time_ms: Column) -> Column:
    """T8 — uoj: Time==0 → submit-answer else traditional/interactive
    (uoj.go:153-157)."""
    return F.when(time_ms == 0, F.lit("提交答案")).otherwise(F.lit("传统或交互"))


def judge_type_syzoj(ptype: Column, tags: Column) -> Column:
    """T8 — syzoj mapping + Special Judge tag scan (syzoj/main.go:177-190)."""
    base = (
        F.when(ptype == "submit-answer", F.lit("提交答案"))
        .when(ptype == "interaction", F.lit("交互"))
        .otherwise(F.lit("传统"))
    )
    return F.when(
        F.array_contains(tags, "Special Judge"), F.concat(base, F.lit(" (Special Judge)"))
    ).otherwise(base)


def nbsp_split(col: Column) -> Column:
    """T9 — split on NBSP (rune 160, bzoj.go:114)."""
    return F.split(col, " ")


def markdown_guard(col: Column) -> Column:
    """T10 — prepend '# \\n' when body doesn't start with '#'
    (joyoi.go:142-144)."""
    return F.when(~col.startswith("#"), F.concat(F.lit("# \n"), col)).otherwise(col)
