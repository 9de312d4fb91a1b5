"""Synthetic corpora and loaders for the driver-provided test tables."""
