"""pdf_extractor_ray — a Ray-Data-native main-content extraction engine.

Rebuilt from scratch (not ported) with the query/data-processing
capabilities of the reference `itoyjakra/pdf-extractor`
(/root/reference): per-turn main-content extraction (HTML boilerplate
strip, PDF layout parse, tool-output markup parse) over a Parquet lake
of multi-turn agent transcripts, with conversation-level span
stitching, deterministic cross-reference resolution, normalization,
per-partition checkpoint manifests, and large-scale auxiliary
operators (dedup, similarity search, text analysis).

Architecture: `ray.data.Dataset` pipelines end-to-end —
`read_parquet → map_batches(TurnExtractor actor pool, pyarrow
batches) → groupby(conv_id).map_groups(stitch+resolve) →
sort → map_batches(normalize) → write_parquet(+manifests)`.
"""

__version__ = "0.1.0"
