"""Stateful crawl components: URL-seen filters, frontier shards, checkpoints."""
