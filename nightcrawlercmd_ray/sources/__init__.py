"""Sources: Parquet page stores, seed lists, file trees, synthetic corpora."""
