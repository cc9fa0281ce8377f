"""Deterministic synthetic web — the fetcher's universe (FIXTURES.md §A7).

Replaces the network for tests/benchmarks: every document is a **pure
function of (url, seed, generation)**, so executors materialize content
locally with zero driver state and zero broadcast — the property that lets
the same code path scale to a 10^10-URL frontier (the fetch stage stays
embarrassingly parallel).

Shapes mirror the reference's sources:
- listing pages ``http://<judge>.test/problems?page=i`` with a paginator and
  (pid, title) anchors — the HTML shape parsed at
  /root/reference/plugin/uoj/uoj.go:49-99;
- problem pages with 5 templated sections (syzoj shape,
  /root/reference/plugin/syzoj/main.go:191-213) embedding 0-4 image links in
  both markdown and <img> forms, absolute/relative/root-relative, with an
  occasional broken link (failure isolation, tools.go:222-226) and an
  oversized >1000-char URL (skip rule, tools.go:210-212);
- per-URL image assets (PNG or LJPG "jpeg") with derivable captions;
- robots.txt per host with Disallow prefixes + Crawl-delay.

Churn: a title changes when (judge, pid, generation_epoch) hashes into the
churn bucket — the re-crawl trigger of tools.go:339.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np

from crawler_spark.sources import codecs

WORDS = (
    "fast key order sort table scan merge part window small hash join "
    "group query row data slow filter customer line batch value stream"
).split()


def _h(*parts: object) -> int:
    """Deterministic 64-bit hash of the parts (stable across processes)."""
    s = "\x1f".join(str(p) for p in parts)
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


@dataclass
class JudgeConfig:
    name: str
    n_pids: int = 40
    page_size: int = 10
    min_delay_ms: int = 200  # DefaultHttpConfig parity (tools.go:51)
    robots_disallow: tuple[str, ...] = ("/private",)
    crawl_delay_ms: int = 0


@dataclass
class SynthWeb:
    seed: str = "synthweb-42"
    judges: dict[str, JudgeConfig] = field(default_factory=dict)
    churn_pct: int = 10  # % of titles that change each generation epoch

    @classmethod
    def default(cls, n_judges: int = 4, n_pids: int = 40) -> SynthWeb:
        web = cls()
        # politeness budgets mirror the reference: 200 default, 100 bzoj-like,
        # 500 lutece-like (BASELINE.md implied-ceilings table)
        delays = [200, 100, 500, 200]
        for i in range(n_judges):
            name = f"judge{i}"
            web.judges[name] = JudgeConfig(
                name=name, n_pids=n_pids, min_delay_ms=delays[i % len(delays)],
                crawl_delay_ms=50 if i % 2 else 0,
            )
        return web

    # -- structure ---------------------------------------------------------

    def host(self, judge: str) -> str:
        return f"{judge}.test"

    def max_page(self, judge: str) -> int:
        cfg = self.judges[judge]
        return (cfg.n_pids + cfg.page_size - 1) // cfg.page_size

    def listing_url(self, judge: str, page: int) -> str:
        return f"http://{self.host(judge)}/problems?page={page}"

    def problem_url(self, judge: str, pid: str) -> str:
        return f"http://{self.host(judge)}/problem/{pid}"

    def pids(self, judge: str) -> list[str]:
        return [f"P{1000 + i}" for i in range(self.judges[judge].n_pids)]

    def title(self, judge: str, pid: str, generation: int = 0) -> str:
        """Title with churn: changes when this (judge,pid) falls in the churn
        bucket for the current epoch."""
        epoch = 0
        if generation > 0 and _h(self.seed, "churn", judge, pid) % 100 < self.churn_pct:
            epoch = generation
        k = _h(self.seed, "title", judge, pid, epoch)
        return f"{WORDS[k % len(WORDS)]} {WORDS[(k >> 8) % len(WORDS)]} {pid}"

    # -- image universe ------------------------------------------------------

    def image_links(self, judge: str, pid: str) -> list[tuple[str, str]]:
        """(markup_src, resolved_url) pairs embedded in the problem page."""
        k = _h(self.seed, "imgs", judge, pid)
        n = k % 5  # 0..4 images
        out: list[tuple[str, str]] = []
        host = self.host(judge)
        for i in range(n):
            fmt = "png" if _h(self.seed, "fmt", judge, pid, i) % 2 == 0 else "jpg"
            name = f"{pid}_{i}.{fmt}"
            style = _h(self.seed, "style", judge, pid, i) % 3
            if style == 0:  # absolute
                src = f"http://{host}/img/{name}"
            elif style == 1:  # root-relative
                src = f"/img/{name}"
            else:  # relative to /problem/<pid> page dir
                src = f"../img/{name}"
            out.append((src, f"http://{host}/img/{name}"))
        # deterministic edge cases per FIXTURES §A7
        if k % 7 == 0:
            out.append((f"/missing/{pid}.png", f"http://{host}/missing/{pid}.png"))
        if k % 11 == 0:
            big = f"/img/{'x' * 1100}.png"
            out.append((big, f"http://{host}{big}"))
        return out

    def image_rgb(self, url: str) -> np.ndarray:
        """Seeded gradient+noise image, 8-64 px per side."""
        k = _h(self.seed, "pix", url)
        rng = np.random.default_rng(k % (2**32))
        h = 8 + k % 57
        w = 8 + (k >> 16) % 57
        yy, xx = np.mgrid[0:h, 0:w]
        base = ((yy * 255 // max(h - 1, 1) + xx * 255 // max(w - 1, 1)) // 2).astype(
            np.uint8
        )
        noise = rng.integers(0, 32, size=(h, w, 3), dtype=np.uint8)
        rgb = (base[..., None].astype(np.int16) + noise).clip(0, 255).astype(np.uint8)
        return rgb

    def image_bytes(self, url: str) -> bytes:
        rgb = self.image_rgb(url)
        return codecs.encode_png(rgb) if url.endswith(".png") else codecs.encode_jpeg(rgb)

    def caption(self, url: str) -> str:
        """Caption = problem title + section name (FIXTURES §A1)."""
        tail = url.rsplit("/", 1)[-1]
        pid = tail.split("_")[0].split(".")[0]
        judge = url.split("://")[1].split(".test")[0]
        k = _h(self.seed, "cap", url)
        section = ["题目描述", "输入格式", "输出格式", "样例", "提示"][k % 5]
        return f"{self.title(judge, pid)} — {section}"

    # -- documents -----------------------------------------------------------

    def robots_txt(self, judge: str) -> str:
        cfg = self.judges[judge]
        lines = ["User-agent: *"]
        lines += [f"Disallow: {p}" for p in cfg.robots_disallow]
        if cfg.crawl_delay_ms:
            lines.append(f"Crawl-delay: {cfg.crawl_delay_ms / 1000:g}")
        return "\n".join(lines) + "\n"

    def listing_body(self, judge: str, page: int, generation: int = 0) -> str:
        cfg = self.judges[judge]
        pids = self.pids(judge)
        lo, hi = (page - 1) * cfg.page_size, min(page * cfg.page_size, len(pids))
        rows = "\n".join(
            f'<tr><td><a href="/problem/{p}">{p}</a></td>'
            f"<td>{self.title(judge, p, generation)}</td></tr>"
            for p in pids[lo:hi]
        )
        pager = " ".join(
            f'<a class="page-link">{i}</a>' for i in range(1, self.max_page(judge) + 1)
        )
        return (
            f"<html><body><table>{rows}</table>"
            f'<ul class="pagination">{pager}</ul></body></html>'
        )

    def problem_body(self, judge: str, pid: str, generation: int = 0) -> str:
        """5-section problem page w/ embedded image links (syzoj shape)."""
        k = _h(self.seed, "body", judge, pid)
        links = self.image_links(judge, pid)
        md_imgs = " ".join(f"![fig{i}]({s})" for i, (s, _) in enumerate(links[::2]))
        html_imgs = " ".join(f'<img src="{s}">' for s, _ in links[1::2])
        sec = [
            " ".join(WORDS[(k >> (4 * i + j)) % len(WORDS)] for j in range(6))
            for i in range(5)
        ]
        t = 1000 * (1 + k % 5)
        m = 128 * (1 + k % 4)
        return (
            f"<h1>{self.title(judge, pid, generation)}</h1>\n"
            f"<p>时间限制 {t // 1000} s 内存限制 {m} MB</p>\n"
            f"# 题目描述\n\n{sec[0]} {md_imgs}\n\n"
            f"# 输入格式\n\n{sec[1]}\n\n"
            f"# 输出格式\n\n{sec[2]} {html_imgs}\n\n"
            f"# 样例\n\n{sec[3]}\n\n"
            f"# 数据范围与提示\n\n{sec[4]}\n\n"
        )

    # -- the fetch function --------------------------------------------------

    def transient_failures(self, url: str) -> int:
        """How many attempts fail before success: 0 (90%), 1-2 (transient,
        ~9%), or 99 (permanent, ~1%) — exercises retry ×3 (tools.go:59-76)."""
        k = _h(self.seed, "fail", url)
        if "/missing/" in url:
            return 99
        r = k % 100
        if r < 90:
            return 0
        if r < 99 or "/problems?" in url or url.endswith("/robots.txt"):
            # listing/robots failures stay transient: a permanent listing
            # failure aborts the whole generation by design (C4), which is a
            # job-retry path, not something every seeded test run should hit
            return 1 + k % 2
        return 99

    def fetch(self, url: str, generation: int = 0) -> tuple[int, bytes | None]:
        """(http_code, body) for one attempt that gets through."""
        try:
            rest = url.split("://", 1)[1]
        except IndexError:
            return 400, None
        host, _, path = rest.partition("/")
        path = "/" + path
        judge = host.split(".test")[0] if host.endswith(".test") else None
        if judge not in self.judges:
            return 404, None
        if path == "/robots.txt":
            return 200, self.robots_txt(judge).encode()
        if path.startswith("/problems?page="):
            page = int(path.rsplit("=", 1)[1])
            if 1 <= page <= self.max_page(judge):
                return 200, self.listing_body(judge, page, generation).encode()
            return 404, None
        if path.startswith("/problem/"):
            pid = path.rsplit("/", 1)[1]
            if pid in set(self.pids(judge)):
                return 200, self.problem_body(judge, pid, generation).encode()
            return 404, None
        if path.startswith("/img/"):
            return 200, self.image_bytes(url)
        return 404, None
