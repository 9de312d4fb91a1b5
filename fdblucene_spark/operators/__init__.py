"""Engine operators: index build, merge, query, and the training-data
pipeline operators (dedup, similarity search, text analysis)."""
