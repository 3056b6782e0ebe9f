"""End-to-end pipelines: crawl, report, wordlist, scan family, dedup."""
