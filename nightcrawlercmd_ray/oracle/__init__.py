"""Serial single-threaded oracles producing golden outputs (SURVEY §5.2)."""
