from crawler_spark.frontier.bfs import CrawlConfig, CrawlResult, crawl

__all__ = ["crawl", "CrawlConfig", "CrawlResult"]
