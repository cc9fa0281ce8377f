"""Adapter parity: feeding the exact wire shapes from the reference's Go
structs must produce byte-identical normalized descriptions and correct
limits/classification (SURVEY §1.3, §2.8)."""

from __future__ import annotations

import json


def test_syzoj_export_normalization(spark):
    from crawler_spark.sources.adapters import SYZOJ_TEMPLATE, parse_syzoj_problem

    payload = {
        "success": True,
        "obj": {
            "title": "T",
            "description": "desc ![i](a.png)",
            "input_format": "in",
            "output_format": "out",
            "example": "ex",
            "limit_and_hint": "hint",
            "time_limit": 1000,
            "memory_limit": 256,
            "have_additional_file": False,
            "file_io": False,
            "type": "traditional",
            "tags": ["NOIP", "Special Judge"],
        },
    }
    df = spark.createDataFrame([("p1", json.dumps(payload))], "pid string, body string")
    row = parse_syzoj_problem(df, home_url="https://loj.ac").collect()[0]
    assert row.ok is True
    assert row.time_ms == 1000 and row.memory_mb == 256
    assert row.judge_type == "传统 Special Judge"  # syzoj/main.go:177-190
    assert row.url == "https://loj.ac/problem/p1"
    assert row.description == SYZOJ_TEMPLATE % ("desc ![i](a.png)", "in", "out",
                                                "ex", "hint")
    assert row.description_type == "markdown"


def test_syzoj_judge_type_variants(spark):
    from crawler_spark.sources.adapters import parse_syzoj_problem

    rows = []
    for typ, want in [("traditional", "传统"), ("submit-answer", "提交答案"),
                      ("interaction", "交互")]:
        payload = {"success": True, "obj": {"type": typ, "tags": []}}
        rows.append((typ, json.dumps(payload)))
    df = spark.createDataFrame(rows, "pid string, body string")
    got = {r.pid: r.judge_type for r in parse_syzoj_problem(df).collect()}
    assert got == {"traditional": "传统", "submit-answer": "提交答案",
                   "interaction": "交互"}


def test_lutece_listing_and_problem(spark):
    from crawler_spark.sources.adapters import (
        LUTECE_TABLE_HEAD,
        LUTECE_TEMPLATE,
        parse_lutece_listing,
        parse_lutece_problem,
    )

    listing = {
        "data": {
            "problemList": {
                "maxPage": 7,
                "problemList": [
                    {"title": "A", "slug": "a"},
                    {"title": "B", "slug": "b"},
                ],
            }
        }
    }
    ldf = spark.createDataFrame([(json.dumps(listing),)], "body string")
    got = {(r.pid, r.title, r.max_page) for r in parse_lutece_listing(ldf).collect()}
    assert got == {("a", "A", 7), ("b", "B", 7)}

    problem = {
        "data": {
            "problem": {
                "title": "A",
                "content": "C",
                "standardInput": "SI",
                "standardOutput": "SO",
                "constraints": "CT",
                "note": "N",
                "limitation": {"timeLimit": 2000, "memoryLimit": 512},
                "samples": {
                    "sampleList": [
                        {"inputContent": "1 2", "outputContent": "3"},
                        {"inputContent": "4", "outputContent": "5"},
                    ]
                },
                "source": "S",
            }
        }
    }
    pdf = spark.createDataFrame([("a", json.dumps(problem))], "pid string, body string")
    row = parse_lutece_problem(pdf).collect()[0]
    assert row.time_ms == 2000 and row.memory_mb == 512
    assert row.url == "https://acm.uestc.edu.cn/problem/a/description"
    # reproduce the Go loop (lutece.go:187-230) literally
    sample = (
        LUTECE_TABLE_HEAD
        + "<tr><td>1 2</td><td>3</td></tr>"
        + "<tr><td>4</td><td>5</td></tr>"
        + "</table>\n"
    )
    want = LUTECE_TEMPLATE % ("C", "SI", "SO", sample, "CT", "N", "S")
    assert row.description == want


def test_joyoi_listing_filter_and_problem(spark):
    from crawler_spark.sources.adapters import (
        JOYOI_TABLE_HEAD,
        parse_joyoi_listing,
        parse_joyoi_problem,
    )

    listing = {
        "code": 200,
        "msg": "",
        "data": {
            "result": [
                {"id": "1", "title": "A", "tags": "", "isVisible": True,
                 "source": "Local"},
                {"id": "2", "title": "B", "tags": "", "isVisible": False,
                 "source": "Local"},
                {"id": "3", "title": "C", "tags": "", "isVisible": True,
                 "source": "CodeVS"},
            ],
            "count": 3,
        },
    }
    ldf = spark.createDataFrame([(json.dumps(listing),)], "body string")
    got = {(r.pid, r.title) for r in parse_joyoi_listing(ldf, "Local").collect()}
    assert got == {("1", "A")}  # P3: source==src && isVisible

    problem = {
        "code": 200, "msg": "",
        "data": {
            "id": "1", "title": "A", "body": "no heading body", "tags": "",
            "isVisible": True, "source": "Local",
            "timeLimitationPerCaseInMs": 1000,
            "memoryLimitationPerCaseInByte": 268435456,
        },
    }
    samples = {"code": 200, "msg": "",
               "data": [{"input": "x", "output": "y"}]}
    pdf = spark.createDataFrame(
        [("1", json.dumps(problem), json.dumps(samples))],
        "pid string, body string, samples_body string",
    )
    row = parse_joyoi_problem(pdf, src="Local").collect()[0]
    assert row.time_ms == 1000
    assert row.memory_mb == 256  # bytes → MB (joyoi.go:136)
    # T10 markdown guard + sample table append (joyoi.go:142-167)
    want = ("# \nno heading body" + JOYOI_TABLE_HEAD
            + "<tr><td>x</td><td>y</td></tr>" + "</table>\n")
    assert row.description == want
    assert row.description_type == "markdown"

    # non-Local source: html_final passthrough, no guard, no table
    row2 = parse_joyoi_problem(
        pdf, src="CodeVS", samples_col=None
    ).collect()[0]
    assert row2.description == "no heading body"
    assert row2.description_type == "html_final"


def test_bzoj_listing_and_problem(spark):
    from crawler_spark.sources.adapters import (
        BZOJ_TEMPLATE,
        parse_bzoj_listing,
        parse_bzoj_problem,
    )

    # listing: NBSP-joined paginator (entity AND literal rune 160 forms,
    # bzoj.go:110-125), evenrow/oddrow rows (bzoj.go:135-155)
    page = (
        "<html><body><h3>1&nbsp;2\xa07</h3><table align=center>"
        "<tr align=center class='evenrow'><td><img src='ok.gif'></td>"
        "<td>1000</td><td><a href='problem.php?id=1000'>A+B Problem</a></td>"
        "<td>9237</td></tr>"
        "<tr align=center class='oddrow'><td></td>"
        "<td>1001</td><td><a href='problem.php?id=1001'>[BeiJing2006]狼抓兔子</a></td>"
        "<td>3000</td></tr>"
        "</table></body></html>"
    )
    ldf = spark.createDataFrame([(page,)], "body string")
    got = {(r.pid, r.title, r.max_page) for r in parse_bzoj_listing(ldf).collect()}
    assert got == {
        ("1000", "A+B Problem", 7),
        ("1001", "[BeiJing2006]狼抓兔子", 7),
    }

    def stmt(notice: bool, red: bool, nsec: int = 7) -> str:
        secs = ["<p>\n  d1</p>", "in", "out", "sin", "sout",
                "hint<br>\nmore", "src"][:nsec]
        return (
            "<html><body>"
            + ("<div class='notice'>x</div>" if notice else "")
            + "<center><h2>1000</h2>"
            "<span class=green>Time Limit: </span>10 Sec&nbsp;&nbsp;"
            "<span class=green>Memory Limit: </span>162 MB"
            + ("<span class=red>Special Judge</span>" if red else "")
            + "</center>"
            + "".join(f'<div class="content">{s}</div>' for s in secs)
            + "</body></html>"
        )

    pdf = spark.createDataFrame(
        [("1000", stmt(False, False)), ("1001", stmt(True, True)),
         ("1002", stmt(False, False, nsec=5))],
        "pid string, body string",
    )
    rows = {r.pid: r for r in parse_bzoj_problem(pdf).collect()}
    r = rows["1000"]
    assert r.time_ms == 10000 and r.memory_mb == 162  # bzoj.go:178-186
    assert r.judge_type == "传统"
    assert r.url == "https://lydsy.com/JudgeOnline/problem.php?id=1000"
    assert r.description_type == "html"
    # exact 7-section template + the two cleanup regexes (bzoj.go:195-227):
    # '<p>\s*'→'<p>' and '<br>\n'→'<br>'
    want = BZOJ_TEMPLATE % ("<p>d1</p>", "in", "out", "sin", "sout",
                            "hint<br>more", "src")
    assert r.description == want
    # notice banner (pos 3→4, bzoj.go:169-171) must not break limits;
    # span.red → Special Judge (bzoj.go:187-191)
    r2 = rows["1001"]
    assert r2.time_ms == 10000 and r2.memory_mb == 162
    assert r2.judge_type == "传统 Special Judge"
    # <7 content sections: the Go error path — description NULL
    assert rows["1002"].description is None


def test_uoj_listing_and_problem(spark):
    from crawler_spark.sources.adapters import parse_uoj_listing, parse_uoj_problem

    page = """
<html><body><div><div class="uoj-content">
<ul class="pagination"><li><a>1</a></li><li><a>2</a></li><li><a>13</a></li></ul>
<div class="table-responsive"><table><tbody>
<tr> <td>#101</td> <td><a href="/problem/101">A + B</a></td> <td>x</td> </tr>
<tr> <td>#102</td> <td><a href="/problem/102">Tree</a></td> <td>y</td> </tr>
</tbody></table></div>
</div></div></body></html>"""
    ldf = spark.createDataFrame([(page,)], "body string")
    rows = parse_uoj_listing(ldf).collect()
    got = {(r.pid, r.title, r.max_page) for r in rows}
    assert got == {("101", "A + B", 13), ("102", "Tree", 13)}  # '#' stripped (P5)

    stmt = (
        '<article class="top-buffer-md"><h3>题目背景</h3>'
        "<p>时间限制：$1\\texttt{s}$</p>"
        "<p>空间限制：$256\\texttt{MB}$</p>"
        "<p>body text</p></article>"
    )
    pdf = spark.createDataFrame([("101", stmt)], "pid string, body string")
    row = parse_uoj_problem(pdf).collect()[0]
    assert row.time_ms == 1000          # uoj.go:121-130 (s -> ms)
    assert row.memory_mb == 256         # uoj.go:131-144
    assert row.judge_type == "传统或交互"  # T8: Time != 0
    assert row.description.startswith("# 题目描述\n\n")
    assert "\n# 题目背景\n\n" in row.description   # T6 heading rewrite
    assert "<article" not in row.description
    assert row.description_type == "html"

    # GB unit and missing time: x1024, 提交答案 (uoj.go:141,153-157)
    stmt2 = '<article class="top-buffer-md"><p>内存限制：$2\\texttt{GB}$</p></article>'
    pdf2 = spark.createDataFrame([("102", stmt2)], "pid string, body string")
    row2 = parse_uoj_problem(pdf2).collect()[0]
    assert row2.memory_mb == 2048 and row2.time_ms == 0
    assert row2.judge_type == "提交答案"
