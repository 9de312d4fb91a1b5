"""Incremental / streaming ingestion wrappers around the batch build."""
