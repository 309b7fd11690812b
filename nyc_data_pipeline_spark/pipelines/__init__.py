"""Composed multi-operator pipelines (corpus curation funnels)."""
