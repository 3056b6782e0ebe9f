"""Reusable map_batches stages (stateless fns + stateful actor-pool classes)."""
