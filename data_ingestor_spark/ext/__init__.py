"""Large-scale training-data pipeline extensions (BASELINE.json north
star): deduplication, similarity search, text analysis, multimodal
column plumbing. All designed shuffle-light for 100 TB: LSH banding
instead of O(n²) pairing, broadcast query vectors, built-in expressions
in the hot path, Pandas UDFs only where arrays must meet numpy.
"""
