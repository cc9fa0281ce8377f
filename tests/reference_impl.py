"""Pure-Python restatement of the reference crawl semantics (SURVEY §5.2).

~150 lines re-stating, independently of the Spark engine, what
oi-archive/crawler computes per run:

- selection: all new-or-changed pids in listing order, then a seeded random
  fill up to `limit` (ChooseUpdateProblem/DownloadProblems,
  /root/reference/plugin/public/tools.go:327-403) — with the wall-clock seed
  replaced by the documented md5(seed‖judge‖pid) order (SURVEY §2.9);
- fetch with retry ×3 and per-row failure isolation
  (tools.go:59-76,357-366);
- image link extraction (markdown + <img> regexes, tools.go:205,242-244),
  relative resolution (tools.go:216-221), >1000-char skip (tools.go:210-212),
  urlsafe-b64/md5 keying (tools.go:228-231), link rewrite to /source/...
  (tools.go:240,280), failures keep the original link (tools.go:222-226);
- seen-set refresh from the new listing regardless of fetch success
  (plugin/syzoj/main.go:127-130).

The golden test asserts the Spark engine's final url_seen set, crawl order,
problems and images tables equal this restatement's.
"""

from __future__ import annotations

import base64
import hashlib
import re

MD_IMG_RE = re.compile(r"!\[[^\]]*\]\(([^)]+)\)")
HTML_IMG_RE = re.compile(r'<img src="([^"]+)"')


def md5_order_key(seed: str, judge: str, pid: str) -> str:
    return hashlib.md5(f"{seed}{judge}|{pid}".encode()).hexdigest()


def image_key(url: str) -> str:
    b64 = base64.urlsafe_b64encode(url.encode()).decode()
    return hashlib.md5(url.encode()).hexdigest() if len(b64) > 200 else b64


def file_ext(url: str) -> str:
    base = url.split("?")[0]
    if "." not in base.rsplit("/", 1)[-1]:
        return ""
    ext = base.rsplit(".", 1)[-1]
    return ext if 0 < len(ext) <= 5 and "/" not in ext else ""


def resolve(src: str, page_url: str) -> str:
    if re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://", src):
        return src
    m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+)", page_url)
    scheme_host = m.group(1)
    if src.startswith("/"):
        return scheme_host + src
    page_dir = re.sub(r"/[^/]*$", "/", re.sub(r"[?#].*$", "", page_url))
    return page_dir + src


def fetch_ok(web, url: str, generation: int = 0) -> bytes | None:
    """Retry ×3 against the synthetic web; None = permanent failure."""
    fails = web.transient_failures(url)
    for attempt in range(1, 4):
        if attempt <= fails:
            continue
        code, body = web.fetch(url, generation)
        return body if code == 200 else None
    return None


def reference_crawl(web, generations: int, limit: int) -> dict:
    """Run the restated crawl; returns final state + per-gen records."""
    seen: dict[tuple[str, str], str] = {}
    crawl_order: list[tuple[int, str, str, int]] = []
    problems: dict[tuple[int, str, str], dict] = {}
    images: dict[tuple[int, str], dict] = {}

    for g in range(generations):
        new_seen: dict[tuple[str, str], str] = {}
        for judge in sorted(web.judges):
            # listing phase (S7): all pages, (pid, title) in listing order
            listing = [
                (pid, web.title(judge, pid, g)) for pid in web.pids(judge)
            ]
            # J1 + A1: due = new-or-changed in listing order; fill = seeded md5
            due = [p for p, t in listing if seen.get((judge, p)) != t]
            rest = [p for p, t in listing if seen.get((judge, p)) == t]
            fill = sorted(rest, key=lambda p: md5_order_key(f"g{g}", judge, p))
            # tools.go:336-352: due pass is UNBOUNDED; fill tops up to limit
            eff_limit = min(limit, len(listing))  # clamp, tools.go:329-331
            chosen = due + fill[: max(0, eff_limit - len(due))]

            for seq, pid in enumerate(chosen, 1):
                crawl_order.append((g, judge, pid, seq))
                url = web.problem_url(judge, pid)
                body = fetch_ok(web, url, g)
                if body is None:  # C3: keeps listing entry, no files
                    problems[(g, judge, pid)] = {"status": "error"}
                    continue
                text = body.decode()
                title = re.search(r"<h1>([^<]*)</h1>", text).group(1)
                desc = re.search(r"\n(# .*)$", text, re.S).group(1)
                # T1: extract → guard → resolve → fetch → key → rewrite
                srcs = MD_IMG_RE.findall(desc) + HTML_IMG_RE.findall(desc)
                for src in srcs:
                    if len(src) > 1000:  # P4
                        continue
                    asset_url = resolve(src, url)
                    asset_body = fetch_ok(web, asset_url, g)
                    if asset_body is None:  # failure keeps original link
                        continue
                    key = image_key(asset_url)
                    ext = file_ext(asset_url)
                    new_path = f"/source/{judge}/{pid}/img/{key}" + (
                        f".{ext}" if ext else ""
                    )
                    desc = desc.replace(f"]({src})", f"]({new_path})").replace(
                        f'src="{src}"', f'src="{new_path}"'
                    )
                    images[(g, key)] = {
                        "url": asset_url,
                        "bytes": asset_body,
                        "caption": web.caption(asset_url),
                        "fmt": "png" if ext == "png" else "jpeg",
                    }
                problems[(g, judge, pid)] = {
                    "status": "ok",
                    "title": title,
                    "description": desc,
                }
            # A5: refresh from the new listing regardless of fetch success
            for pid, t in listing:
                new_seen[(judge, pid)] = t
        seen.update(new_seen)

    return {
        "seen": seen,
        "crawl_order": crawl_order,
        "problems": problems,
        "images": images,
    }
