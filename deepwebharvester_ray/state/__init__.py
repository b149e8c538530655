"""Stateful pieces of the crawl engine: seen-set shards + scheduler."""
