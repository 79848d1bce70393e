from crawler_spark.sinks.rag import build_rag_documents
from crawler_spark.sinks.export import export_markdown_string, export_to_markdown

__all__ = ["build_rag_documents", "export_to_markdown", "export_markdown_string"]
