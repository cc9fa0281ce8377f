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
}


def listing_url(judge: str) -> str:
    host = JUDGES[judge][1]
    return {
        "syz": f"http://{host}/problems?page=1",
        "lut": f"http://{host}/graphql:list-1",
        "joy": f"http://{host}/api/problem/all?page=1",
        "uoj": f"http://{host}/problems?page=1",
    }[judge]


def problem_url(judge: str, pid: str) -> str:
    host = JUDGES[judge][1]
    return {
        "syz": f"http://{host}/problem/{pid}/export",
        "lut": f"http://{host}/graphql:p-{pid}",
        "joy": f"http://{host}/api/problem/{pid}",
        "uoj": f"http://{host}/problem/{pid}",
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
            pids = [f"{judge}{i}" for i in range(1, self.n_pids + 1)]
            self.pages[listing_url(judge)] = self._listing_body(judge, pids)
            for pid in pids:
                self.pages[problem_url(judge, pid)] = self._problem_body(
                    judge, pid
                )
                self.pages[image_url(judge, pid)] = _png(judge, pid)

    # -- page bodies ---------------------------------------------------------

    def _listing_body(self, judge: str, pids: list[str]) -> str:
        kind = JUDGES[judge][0]
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
