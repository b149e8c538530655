"""Pipelines: the generation-loop crawl and the driver query surface."""
