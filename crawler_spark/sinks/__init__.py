from crawler_spark.sinks.rag import build_rag_documents
from crawler_spark.sinks.export import export_markdown_string, export_to_markdown
from crawler_spark.sinks.shards import (
    shard_manifest,
    token_balanced_shards,
    write_shards,
)

__all__ = [
    "build_rag_documents",
    "export_to_markdown",
    "export_markdown_string",
    "token_balanced_shards",
    "shard_manifest",
    "write_shards",
]
