"""HTTP service surface (jobs/serve.py) — parity with the reference's
/api/scrape (depth=0 single-page mode and BFS mode) and /api/download
(json + markdown), reference api/main.py:48-129."""

import json
import threading
import urllib.request

import pytest

from crawler_spark.core.page import build_page_record


def _post(port, path, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, r.read().decode(), dict(r.headers)
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode(), dict(e.headers)


@pytest.fixture(scope="module")
def server(spark, corpus_parquet):
    from jobs.serve import serve

    corpus = spark.read.parquet(corpus_parquet)
    httpd = serve(spark, corpus, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd.server_address[1]
    httpd.shutdown()


def test_scrape_single_page_mode(server, corpus_rows_mem):
    row = corpus_rows_mem[0]
    code, body, _ = _post(
        server, "/api/scrape", {"url": row["url"], "instructions": None, "depth": 0}
    )
    assert code == 200
    out = json.loads(body)
    assert out["status"] == "success" and len(out["data"]) == 1
    page = out["data"][0]
    oracle = build_page_record(
        row["html"], row["url"], None, timestamp=row["warc_ts"].isoformat()
    )
    assert page["url"] == oracle["url"]
    assert page["title"] == oracle["title"]
    assert page["markdown"] == oracle["markdown"]
    assert page["links"] == oracle["links"]
    assert page["relevance"]["score"] == oracle["relevance"]["score"]


def test_scrape_bfs_mode(server, corpus_rows_mem):
    url = corpus_rows_mem[0]["url"]
    code, body, _ = _post(
        server,
        "/api/scrape",
        {"url": url, "instructions": None, "depth": 2, "max_pages": 7},
    )
    assert code == 200
    data = json.loads(body)["data"]
    assert len(data) == 7  # max_pages honored
    assert data[0]["url"] == url  # visit order starts at the seed


def test_scrape_default_instructions_gate(server, corpus_rows_mem):
    # no instructions key -> reference default "Extract main content"
    # (api/main.py:56): keywords {main, content} activate the 0.3 gate
    url = corpus_rows_mem[0]["url"]
    code, body, _ = _post(server, "/api/scrape", {"url": url, "depth": 0})
    assert code == 200
    page = json.loads(body)["data"][0]
    assert page["relevance"]["reason"] != "No instructions"


def test_scrape_requires_url(server):
    code, body, _ = _post(server, "/api/scrape", {"depth": 0})
    assert code == 400 and "URL is required" in body


def test_download_json_and_markdown(server, corpus_rows_mem):
    row = corpus_rows_mem[0]
    _, body, _ = _post(
        server, "/api/scrape", {"url": row["url"], "instructions": None, "depth": 0}
    )
    data = json.loads(body)["data"]

    code, content, headers = _post(
        server, "/api/download", {"data": data, "format": "json"}
    )
    assert code == 200
    assert json.loads(content) == data
    assert "crawler_results_" in headers["Content-Disposition"]

    code, content, headers = _post(
        server,
        "/api/download",
        {"data": data, "format": "markdown", "url": row["url"], "depth": 0},
    )
    assert code == 200
    assert content.startswith(f"# Crawler Results: {row['url']}\n\n")
    assert f"## Page 1: {data[0]['title']}\n\n" in content
    assert "### Content\n\n" + data[0]["markdown"] in content
    assert headers["Content-Disposition"].endswith('.markdown"')

    code, content, _ = _post(server, "/api/download", {"data": [], "format": "xml"})
    assert code == 400 and "Unsupported format" in content

    code, content, _ = _post(server, "/api/download", {"format": "json"})
    assert code == 400 and "Data is required" in content


def test_unknown_route(server):
    code, _, _ = _post(server, "/api/nope", {})
    assert code == 404


def _get(port, path):
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
            return r.status, r.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


def test_health_endpoint(server):
    """GET /health mirrors the reference probe (api/main.py:131-133)."""
    code, content = _get(server, "/health")
    assert code == 200
    body = json.loads(content)
    assert body["status"] == "ok" and "version" in body


def test_environment_endpoint(server):
    """GET /api/environment mirrors the reference's deployment probe
    (api/main.py:135-153): key presence, runtime versions, paths."""
    code, content = _get(server, "/api/environment")
    assert code == 200
    body = json.loads(content)
    assert set(body) >= {"has_openai_key", "spark_version",
                         "python_version", "paths"}
    assert isinstance(body["has_openai_key"], bool)
    assert body["spark_version"], "engine runtime must be reported"


def test_unknown_get_route(server):
    code, _ = _get(server, "/api/nope")
    assert code == 404


def test_root_serves_ui_page(server):
    """GET / serves the single-file browser UI (reference root serves its
    web/static UI, api/main.py:124-129). The page must reference the two
    API endpoints it drives."""
    code, content = _get(server, "/")
    assert code == 200
    assert content.lstrip().startswith("<!DOCTYPE html>")
    assert "/api/scrape" in content
    assert "/api/download" in content


def test_api_root_serves_service_map(server):
    code, content = _get(server, "/api")
    assert code == 200
    body = json.loads(content)
    assert body["service"] == "crawler_spark"
    assert "POST /api/scrape" in body["endpoints"]


def test_ui_scripted_round_trip(server, corpus_rows_mem):
    """The exact request the UI form submits round-trips: scrape with the
    page's default payload shape, then download markdown of the result —
    the scripted equivalent of pressing Scrape + Download Markdown."""
    seed = corpus_rows_mem[0]["url"]
    payload = {
        "url": seed,
        "instructions": "Extract main content",
        "depth": 0,
        "max_pages": 20,
        "follow_external_links": False,
    }
    code, content, _ = _post(server, "/api/scrape", payload)
    assert code == 200
    data = json.loads(content)["data"]
    assert len(data) == 1 and data[0]["url"] == seed
    code, content, headers = _post(
        server, "/api/download",
        {"data": data, "format": "markdown", **payload},
    )
    assert code == 200
    assert "attachment" in headers.get("Content-Disposition", "")
    assert content.startswith("# Crawler Results:")
