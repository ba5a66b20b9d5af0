"""Training-data operators: dedup family, similarity search, text
analysis, windowed/sessionized aggregates, multimodal plumbing.

These are the large-scale-pipeline operations layered on the same Ray
Data substrate as the KG engine (SURVEY.md §2 + task brief). Each
operator has (a) a distributed Ray Data implementation designed for the
100 TB shape (blocking keys, partial aggregation, broadcast small
sides) and (b) where expressible, an exact DuckDB SQL oracle registered
in graphiti_ray.queries. Outputs stick to integer/string columns (or
empirically-separated float thresholds) so driver value-hash compares
are float-noise-free.
"""
