"""Multi-chip scaling: mesh construction + image-tile data parallelism."""
