"""Jobs: the crawl wave loop + derived batch jobs (reference DAG analogs)."""
