"""Deterministic synthetic web in the four REFERENCE wire formats.

`sources/synthweb.py` drives the golden crawl-loop parity tests with its own
page shapes; this module instead serves pages in the exact formats the real
judges speak — SYZOJ export JSON, Lutece GraphQL, JoyOI REST, UOJ HTML — so
the adapter registry (sources/adapters.py) can be exercised through the full
generation lifecycle (plans/run_adapters.py).  All content is a pure
function of (judge, pid, seed): re-running a generation reproduces every
byte.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import numpy as np

from crawler_spark.sources import codecs

JUDGES = {
    # judge → (kind, host)
    "syz": ("json", "syz.test"),
    "lut": ("graphql", "lut.test"),
    "joy": ("rest", "joy.test"),
    "uoj": ("html", "uoj.test"),
    "bzoj": ("bzoj", "bzoj.test"),
}

# S11 — judges whose pages sit behind a login exchange (bzoj.go:38-68).
# The AdapterWeb serves the session token at the login url and keys every
# protected page as url‖'␁'‖token — the SessionFetcher protocol.
LOGIN_URLS = {"bzoj": "http://bzoj.test/login.php"}
_TOKENS = {"bzoj": "sess-bzoj-7f3a"}


def listing_url(judge: str) -> str:
    host = JUDGES[judge][1]
    return {
        "syz": f"http://{host}/problems?page=1",
        "lut": f"http://{host}/graphql:list-1",
        "joy": f"http://{host}/api/problem/all?page=1",
        "uoj": f"http://{host}/problems?page=1",
        "bzoj": f"http://{host}/problemset.php?page=1",
    }[judge]


def problem_url(judge: str, pid: str) -> str:
    host = JUDGES[judge][1]
    return {
        "syz": f"http://{host}/problem/{pid}/export",
        "lut": f"http://{host}/graphql:p-{pid}",
        "joy": f"http://{host}/api/problem/{pid}",
        "uoj": f"http://{host}/problem/{pid}",
        "bzoj": f"http://{host}/problem.php?id={pid}",
    }[judge]


def image_url(judge: str, pid: str) -> str:
    return f"http://{JUDGES[judge][1]}/img/{pid}.png"


def _png(judge: str, pid: str) -> bytes:
    rng = np.random.default_rng(abs(hash((judge, pid))) % (2**32))
    return codecs.encode_png(
        rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    )


@dataclass
class AdapterWeb:
    """The page universe: n_pids problems per judge."""

    n_pids: int = 6
    pages: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        for judge, (kind, host) in JUDGES.items():
            key = self._page_key(judge)
            if judge in LOGIN_URLS:
                self.pages[LOGIN_URLS[judge]] = _TOKENS[judge]
            pids = [f"{judge}{i}" for i in range(1, self.n_pids + 1)]
            self.pages[key(listing_url(judge))] = self._listing_body(
                judge, pids
            )
            for pid in pids:
                self.pages[key(problem_url(judge, pid))] = self._problem_body(
                    judge, pid
                )
                self.pages[key(image_url(judge, pid))] = _png(judge, pid)

    @staticmethod
    def _page_key(judge: str):
        """Protected judges' pages are keyed url‖'␁'‖token (the
        SessionFetcher wire protocol); public judges' by plain url."""
        if judge in LOGIN_URLS:
            tok = _TOKENS[judge]
            return lambda u: f"{u}\x01{tok}"
        return lambda u: u

    # -- page bodies ---------------------------------------------------------

    def _listing_body(self, judge: str, pids: list[str]) -> str:
        kind = JUDGES[judge][0]
        if kind == "bzoj":
            # bzoj problemset.php: NBSP-joined page numbers in the <h3>
            # paginator (bzoj.go:110-125), alternating even/odd rows whose
            # 2nd td is the pid and 3rd holds the title <a> (bzoj.go:141-154)
            rows = "".join(
                f"<tr align=center class='{'evenrow' if i % 2 == 0 else 'oddrow'}'>"
                f"<td><img src='ok.gif'></td><td>{p}</td>"
                f"<td><a href='problem.php?id={p}'>T-{p}</a></td>"
                f"<td>0</td></tr>"
                for i, p in enumerate(pids)
            )
            return (
                "<html><body><h3>1&nbsp;1</h3>"
                f"<table align=center>{rows}</table></body></html>"
            )
        if kind == "graphql":
            return json.dumps(
                {
                    "data": {
                        "problemList": {
                            "maxPage": 1,
                            "problemList": [
                                {"title": f"T-{p}", "slug": p} for p in pids
                            ],
                        }
                    }
                }
            )
        if kind == "rest":
            return json.dumps(
                {
                    "code": 200,
                    "msg": "",
                    "data": {
                        "result": [
                            {
                                "id": p,
                                "title": f"T-{p}",
                                "tags": "",
                                "isVisible": True,
                                "source": "Local",
                            }
                            for p in pids
                        ],
                        "count": len(pids),
                    },
                }
            )
        # html family (uoj shape; syzoj's listing is also an HTML table)
        rows = "".join(
            f"<tr> <td>#{p}</td> <td><a href='/problem/{p}'>T-{p}</a></td> </tr>"
            for p in pids
        )
        return (
            "<html><body><ul class='pagination'><li><a>1</a></li></ul>"
            f"<table><tbody>{rows}</tbody></table></body></html>"
        )

    def _problem_body(self, judge: str, pid: str) -> str:
        kind = JUDGES[judge][0]
        img = image_url(judge, pid)
        if kind == "bzoj":
            # bzoj problem.php: limits as text nodes after the green label
            # spans, span.red marks Special Judge, 7 .content sections; the
            # '<p>\n' in the description exercises the bzoj.go:225-227
            # cleanup regexes.  Pids ending in an even digit get a notice
            # banner (shifts the Go's nth-child pos 3→4) + span.red.
            even = int(pid[-1]) % 2 == 0
            notice = "<div class='notice'>maintenance</div>" if even else ""
            red = "<span class=red>Special Judge</span>" if even else ""
            return (
                f"<html><body>{notice}<center><h2>{pid}</h2>"
                "<span class=green>Time Limit: </span>10 Sec&nbsp;&nbsp;"
                "<span class=green>Memory Limit: </span>162 MB"
                f"{red}</center>"
                f'<div class="content"><p>\n  desc <img src="{img}"></p></div>'
                '<div class="content">in</div>'
                '<div class="content">out</div>'
                '<div class="content">sin</div>'
                '<div class="content">sout</div>'
                '<div class="content">hint<br>\nmore</div>'
                '<div class="content">src</div>'
                "</body></html>"
            )
        if kind == "json":  # syzoj export
            return json.dumps(
                {
                    "success": True,
                    "obj": {
                        "title": f"T-{pid}",
                        "description": f"desc ![fig]({img})",
                        "input_format": "in",
                        "output_format": "out",
                        "example": "ex",
                        "limit_and_hint": "hint",
                        "time_limit": 1000,
                        "memory_limit": 256,
                        "have_additional_file": False,
                        "file_io": False,
                        "type": "traditional",
                        "tags": [],
                    },
                }
            )
        if kind == "graphql":
            return json.dumps(
                {
                    "data": {
                        "problem": {
                            "title": f"T-{pid}",
                            "content": "c",
                            "standardInput": "si",
                            "standardOutput": "so",
                            "constraints": "ct",
                            "note": "n",
                            "limitation": {"timeLimit": 2000, "memoryLimit": 512},
                            "samples": {
                                "sampleList": [
                                    {"inputContent": "1", "outputContent": "2"}
                                ]
                            },
                            "source": "s",
                        }
                    }
                }
            )
        if kind == "rest":
            return json.dumps(
                {
                    "code": 200,
                    "msg": "",
                    "data": {
                        "id": pid,
                        "title": f"T-{pid}",
                        "body": f"# {pid}\nbody",
                        "tags": "",
                        "isVisible": True,
                        "source": "Local",
                        "timeLimitationPerCaseInMs": 500,
                        "memoryLimitationPerCaseInByte": 268435456,
                    },
                }
            )
        # html (uoj statement)
        return (
            '<article class="top-buffer-md"><h3>Desc</h3>'
            "<p>时间限制：$3\\texttt{s}$</p>"
            "<p>内存限制：$1\\texttt{GB}$</p>"
            f'<img src="{img}"></article>'
        )
