"""Oracle transcriptions of create_rag_documents
(/root/reference/crawler/enhanced_crawler.py:338-408) and export_to_markdown
(:448-492) over oracle crawl results."""

from __future__ import annotations

from typing import Dict, List

from crawler_spark.core.text import chunk_content


def reference_rag_documents(crawl_result: Dict) -> List[Dict]:
    rag_documents = []
    for page in crawl_result.get("pages", []):
        if "error" in page:
            continue
        content = page.get("markdown", "")
        if "ai_extracted_content" in page:
            ai_content = page["ai_extracted_content"]
            if "summary" in ai_content:
                rag_documents.append(
                    {
                        "chunk_type": "summary",
                        "content": ai_content["summary"],
                        "metadata": {
                            "source_url": page["url"],
                            "source_title": page.get("title", ""),
                            "chunk_type": "summary",
                            "relevance_score": page.get("relevance", {}).get("score", 1.0),
                            "timestamp": page.get("timestamp", ""),
                        },
                    }
                )
            if "key_points" in ai_content and ai_content["key_points"]:
                for i, point in enumerate(ai_content["key_points"]):
                    rag_documents.append(
                        {
                            "chunk_type": "key_point",
                            "content": point,
                            "metadata": {
                                "source_url": page["url"],
                                "source_title": page.get("title", ""),
                                "chunk_type": "key_point",
                                "point_index": i,
                                "relevance_score": page.get("relevance", {}).get("score", 1.0),
                                "timestamp": page.get("timestamp", ""),
                            },
                        }
                    )
        if content:
            chunks = chunk_content(content)
            for i, chunk in enumerate(chunks):
                rag_documents.append(
                    {
                        "chunk_type": "content",
                        "content": chunk,
                        "metadata": {
                            "source_url": page["url"],
                            "source_title": page.get("title", ""),
                            "chunk_type": "content",
                            "chunk_index": i,
                            "relevance_score": page.get("relevance", {}).get("score", 1.0),
                            "timestamp": page.get("timestamp", ""),
                        },
                    }
                )
    return rag_documents


def reference_export_markdown(data: Dict) -> str:
    """String-returning transcription of export_to_markdown (:448-492)."""
    out = []
    out.append(f"# Crawler Results: {data['meta']['url']}\n\n")
    out.append(f"- **Instructions:** {data['meta']['instructions']}\n")
    out.append(f"- **Depth:** {data['meta']['depth']}\n")
    out.append(f"- **Pages Crawled:** {data['meta']['pages_crawled']}\n")
    out.append(f"- **Timestamp:** {data['meta'].get('timestamp', '')}\n\n")

    for i, page in enumerate(data["pages"]):
        out.append(f"## Page {i + 1}: {page.get('title', 'No Title')}\n\n")
        out.append(f"**URL:** {page['url']}\n\n")
        if "error" in page:
            out.append(f"**Error:** {page['error']}\n\n")
        else:
            if "ai_extracted_content" in page:
                ai_content = page["ai_extracted_content"]
                if "summary" in ai_content:
                    out.append(f"### Summary\n\n{ai_content['summary']}\n\n")
                if "key_points" in ai_content and ai_content["key_points"]:
                    out.append("### Key Points\n\n")
                    for point in ai_content["key_points"]:
                        out.append(f"- {point}\n")
                    out.append("\n")
                if "extracted_data" in ai_content and ai_content["extracted_data"]:
                    out.append("### Extracted Data\n\n")
                    for key, value in ai_content["extracted_data"].items():
                        out.append(f"- **{key}:** {value}\n")
                    out.append("\n")
            if "markdown" in page and page["markdown"]:
                out.append("### Content\n\n")
                out.append(page["markdown"] + "\n\n")
            if "links" in page and page["links"]:
                out.append("### Links\n\n")
                for link in page["links"][:10]:
                    out.append(f"- [{link}]({link})\n")
                out.append("\n")
        out.append("\n---\n\n")
    return "".join(out)
