"""Data-level kernels: codecs, scoring math, text analysis.

These are the from-scratch replacements for what the reference
delegates to Lucene 8.1.0 (postings compression, BM25, analysis —
SURVEY.md section 0). All kernels are numpy/pandas vectorized: no
per-row Python anywhere (BASELINE.json input_hint).
"""
