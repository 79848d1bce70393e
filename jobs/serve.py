"""HTTP service surface over the engine — the reference's API re-expressed.

Mirrors /root/reference/api/main.py:48-129 on the stdlib (no FastAPI in
this environment):

- ``POST /api/scrape`` {url, instructions, depth, follow_external_links,
  max_pages}: depth=0 is single-page mode (reference ``scrape_page``),
  depth>0 runs the BFS crawl; responds ``{"status": "success", "data":
  [page dicts]}`` in the reference's conditional-key record shape.
- ``POST /api/download`` {data, format, url, instructions, depth}: writes
  ``crawler_results_<ts>.<fmt>`` under a temp dir (json dump or the S4
  markdown report) and returns it as an attachment.

The reference fetches live URLs; this engine's fetch is a corpus join
(input_hint), so the server is constructed over a pages parquet. Spark
work per request is a normal crawl run — the session is shared, requests
serialize on it (ThreadingHTTPServer accepts concurrent connections; the
Spark scheduler interleaves their jobs).

Usage: spark-submit --py-files crawler_spark.zip jobs/serve.py \
    --corpus /data/pages.parquet --port 8000
"""

from __future__ import annotations

import json
import tempfile
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional

from crawler_spark.frontier.bfs import CrawlConfig, crawl
from crawler_spark.sinks.export import render_markdown_report

DEFAULT_INSTRUCTIONS = "Extract main content"  # api/main.py:56 default


def page_row_to_dict(row) -> Dict:
    """Committed page row -> the reference's conditional-key record
    (enhanced_crawler.py:215-241: error rows carry only url+error; gated
    rows lack markdown/ai_extracted_content; null map keys dropped)."""
    d = row.asDict(recursive=True)
    if d.get("error") is not None:
        return {"url": d["url"], "error": d["error"]}
    out = {
        "url": d["url"],
        "title": d["title"],
        "links": list(d.get("links") or []),
        "relevance": d.get("relevance"),
        "timestamp": d.get("timestamp"),
    }
    if d.get("markdown") is not None:
        out["markdown"] = d["markdown"]
        ex = d.get("extracted")
        if ex is not None:
            out["ai_extracted_content"] = {
                k: v for k, v in ex.items() if v is not None
            }
    return out


class CrawlerService:
    """The request-independent engine handle: session + corpus scan."""

    def __init__(self, spark, corpus, run_root: Optional[str] = None):
        self.spark = spark
        self.corpus = corpus
        self.run_root = run_root

    def scrape(
        self,
        url: str,
        instructions: Optional[str] = DEFAULT_INSTRUCTIONS,
        depth: int = 0,
        follow_external_links: bool = False,
        max_pages: int = 20,
    ) -> List[Dict]:
        if depth == 0:
            cfg = CrawlConfig(instructions=instructions, depth=0, max_pages=1)
        else:
            cfg = CrawlConfig(
                instructions=instructions,
                depth=depth,
                follow_external_links=follow_external_links,
                max_pages=max_pages,
            )
        run_dir = tempfile.mkdtemp(prefix="scrape_", dir=self.run_root)
        res = crawl(self.spark, self.corpus, [url], cfg, run_dir=run_dir)
        rows = res.pages(self.spark).orderBy("seq").collect()
        return [page_row_to_dict(r) for r in rows]


def _service_map() -> Dict:
    return {
        "service": "crawler_spark",
        "endpoints": [
            "POST /api/scrape",
            "POST /api/download",
            "GET /health",
            "GET /api/environment",
            "GET /",
        ],
    }


def _static_index() -> Optional[str]:
    """The single-file UI, looked up relative to the repo layout
    (web/static/index.html); None when not deployed."""
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(os.path.dirname(here), "web", "static", "index.html")
    if os.path.isfile(path):
        with open(path, encoding="utf-8") as f:
            return f.read()
    return None


def make_handler(service: CrawlerService, download_dir: str):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet test runs
            pass

        def _json(self, code: int, obj: Dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self) -> Optional[Dict]:
            n = int(self.headers.get("Content-Length") or 0)
            try:
                return json.loads(self.rfile.read(n) or b"{}")
            except Exception as e:
                self._json(400, {"detail": f"Invalid JSON: {e}"})
                return None

        def do_POST(self):  # noqa: N802 (stdlib contract)
            if self.path == "/api/scrape":
                return self._scrape()
            if self.path == "/api/download":
                return self._download()
            self._json(404, {"detail": "Not Found"})

        def do_GET(self):  # noqa: N802 (stdlib contract)
            # reference surface: api/main.py:131-136 serves /health and
            # /api/environment as GET probes
            if self.path == "/health":
                return self._json(200, {"status": "ok", "version": "0.1.0"})
            if self.path == "/api/environment":
                return self._json(200, self._environment())
            if self.path in ("/", "/static/index.html"):
                # reference root serves its web UI (api/main.py:124-129 +
                # web/static/); ours is the from-scratch single-file page
                # in web/static/index.html, driving the same /api/scrape
                # and /api/download contract. Falls back to the JSON
                # service map when the static dir isn't deployed (the
                # reference warns-and-continues the same way,
                # api/main.py:30-33).
                page = _static_index()
                if page is not None:
                    body = page.encode()
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "text/html; charset=utf-8")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                return self._json(200, _service_map())
            if self.path == "/api":
                # machine-readable "what does this server do" probe
                return self._json(200, _service_map())
            self._json(404, {"detail": "Not Found"})

        def _environment(self) -> Dict:
            """Deployment probe (api/main.py:136-153 analog): the engine's
            equivalents of the reference's has_openai_key / playwright
            checks are the structured-extractor seam and the Spark runtime."""
            import os
            import sys

            try:
                import pyspark

                spark_version = pyspark.__version__
            except Exception:  # pragma: no cover
                spark_version = None
            return {
                "has_openai_key": bool(os.getenv("OPENAI_API_KEY")),
                "spark_version": spark_version,
                "python_version": sys.version,
                "paths": {
                    "download_dir": download_dir,
                    "run_root": service.run_root,
                },
            }

        def _scrape(self):
            body = self._body()
            if body is None:
                return
            url = body.get("url")
            if not url:
                return self._json(400, {"detail": "URL is required"})
            try:
                data = service.scrape(
                    str(url),
                    body.get("instructions", DEFAULT_INSTRUCTIONS),
                    int(body.get("depth", 0)),
                    bool(body.get("follow_external_links", False)),
                    int(body.get("max_pages", 20)),
                )
                self._json(200, {"status": "success", "data": data})
            except Exception as e:  # api/main.py:75-78
                self._json(500, {"detail": f"An unexpected error occurred: {e}"})

        def _download(self):
            body = self._body()
            if body is None:
                return
            if "data" not in body:
                return self._json(400, {"detail": "Data is required"})
            fmt = body.get("format", "json")
            ts = time.strftime("%Y%m%d-%H%M%S")
            if fmt == "json":
                content = json.dumps(body["data"], indent=2)
            elif fmt in {"markdown", "md"}:
                content = render_markdown_report(
                    body["data"],
                    meta={
                        "url": body.get("url", "Unknown URL"),
                        "instructions": body.get("instructions", "No instructions"),
                        "depth": body.get("depth", 0),
                        "pages_crawled": len(body["data"]),
                        "timestamp": time.strftime(
                            "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
                        ),
                    },
                )
            else:
                return self._json(400, {"detail": f"Unsupported format: {fmt}"})
            filename = f"crawler_results_{ts}.{fmt}"
            path = f"{download_dir}/{filename}"
            with open(path, "w", encoding="utf-8") as f:
                f.write(content)
            raw = content.encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header(
                "Content-Disposition", f'attachment; filename="{filename}"'
            )
            self.send_header("Content-Length", str(len(raw)))
            self.end_headers()
            self.wfile.write(raw)

    return Handler


def serve(spark, corpus, port: int = 8000, download_dir: Optional[str] = None):
    """Build (but don't start) the server — tests drive it on port 0."""
    service = CrawlerService(spark, corpus)
    dl = download_dir or tempfile.mkdtemp(prefix="crawler_dl_")
    return ThreadingHTTPServer(("127.0.0.1", port), make_handler(service, dl))


def main():
    import argparse

    from crawler_spark.session import build_session

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--corpus", required=True, help="pages parquet path")
    ap.add_argument("--port", type=int, default=8000)
    args = ap.parse_args()

    spark = build_session()
    corpus = spark.read.parquet(args.corpus)
    httpd = serve(spark, corpus, port=args.port)
    print(f"crawler service on :{args.port} (corpus={args.corpus})")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
