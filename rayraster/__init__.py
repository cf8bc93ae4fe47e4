"""rayraster — a Ray-Data-native rasterization + spatial-join engine.

A from-scratch reimplementation of the capabilities of SEraster
(JEFworks-Lab/SEraster, reference at /root/reference) re-expressed as
streaming Ray Data pipelines over Arrow batches:

- point → grid-pixel binning (square / hex) with SEraster's border
  tie-break and bbox-padding semantics     (reference R/main.R:98-197)
- per-pixel feature aggregation sum/mean   (reference R/main.R:139-162)
- categorical (cell-type / lang) rasterization → counts / proportions
                                           (reference R/main.R:466-559)
- rotation permutations about the midrange (reference R/main.R:616-707)
- point-in-polygon tile clipping, kNN pixel neighborhoods,
  raster↔vector round-trip, checkpoint/resume — the scale extensions
  mandated by BASELINE.json north_rule.

Plus web-scale training-data operators over the same engine: exact and
near deduplication (MinHash-LSH, SimHash, n-gram Jaccard, embedding
cosine; distributed connected components; cross-snapshot Bloom dedup
with an exact finish), similarity search (brute-force + IVF with a
persisted partition-pruned index; exact slab-tiled all-pairs
self-join; hashed-trigram text embeddings), graph analysis
(fixed-point PageRank, triangle counting, k-core peeling), text
analysis (lang-id, quality score, token counts, BPE pre-tokens AND a
trained byte-pair merge table with closed-form merged-token counting,
fingerprints, PII redaction, context-window chunking, vocabulary
top-k), corpus curation (Gopher repetition metrics, per-domain caps,
benchmark decontamination, Lee-et-al cross-document duplicate
n-grams, CCNet-style corpus-frequency fluency scoring, token-budget
shard packing), exact/grouped/stratified/weighted-priority sampling
and quantiles, windowed
aggregation (tumbling/sliding/session/watermark), joins (broadcast,
bucketed, salted-skew, semi/anti, as-of, dense + bucket-indexed
range), sketches (HLL distinct counts, mergeable Bloom membership
for cross-snapshot dedup, Count-Min frequencies, Misra-Gries heavy
hitters, q-digest one-pass quantiles — plain and per-group), real
from-scratch multimodal kernels (BMP/PPM pixel decode, box-filter
resize, PPM-stream frame sampling, perceptual dHash/aHash image
near-dup via the generic banded Hamming engine), vector compression
and post-processing (product quantization with ADC search, int8
scalar quantization, PCA/whitening), raster analytics (region labeling, zonal sums and
perimeters, focal convolution, Sobel gradients, Horn hillshade,
Getis-Ord Gi*, local/global Moran), column profiling, per-key EWMA,
first-touch conversion funnels, PMI-ratio collocation mining,
CDC upsert merge + bucketed-layout small-file compaction,
CSV/JSONL sources and a spatiotemporal raster cube.  The final wave
completes the terrain/point-pattern family (IDW interpolation,
Epanechnikov KDE surfaces, D8 flow direction/accumulation, watershed
basins, least-cost distance, marching-squares contours, DBSCAN +
ST-DBSCAN with a dual label engine, the cross-table ε-radius join,
a directory-pruned time-partitioned event store) and the graph-text
crossover (TextRank corpus keywords over weighted integer PageRank;
per-document extractive summarization).  Round-4 closing additions:
point-pattern statistics on the ε-pair exchange (Ripley's K/L,
bivariate cross-K, censored Clark–Evans, Matheron semivariogram —
rayraster.pointpattern), Cliff–Ord join-count lattice
autocorrelation, and temporal n-gram novelty scoring (grams first
seen in an earlier document) folded into the cross-document
duplicate-gram exchanges.

None of the modules call ray.init(); the caller owns the Ray session.
"""

from rayraster.grid import GridSpec, derive_bbox
from rayraster.rasterize import (
    collect_cell_ids,
    pivot_categories,
    rasterize_categories,
    rasterize_features,
    rollup_quadtree,
)
from rayraster.rotate import permutate_by_rotation

# heavier operator families live in their modules (imported lazily by
# queries/pipelines): rayraster.clip, .knn, .agg, .dedup, .similarity,
# .textops, .windows, .join, .sketch, .multimodal, .checkpoint, .plot,
# .sources, .pipelines

__all__ = [
    "GridSpec",
    "derive_bbox",
    "rasterize_features",
    "rasterize_categories",
    "pivot_categories",
    "rollup_quadtree",
    "collect_cell_ids",
    "permutate_by_rotation",
]

__version__ = "0.1.0"
