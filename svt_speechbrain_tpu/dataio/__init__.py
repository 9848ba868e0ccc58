"""Data layer: datasets, pipelines, padded batching, loaders, samplers."""
