"""gsearch_spark — a PySpark-native near-duplicate detection & clustering engine.

Re-imagines the computational skeleton of jean-pierreBoth/gsearch
(shingle -> MinHash-like signature -> candidate retrieval in signature
space -> verify -> rank/cluster; see /root/reference/src/dna/dnasketch.rs)
as idiomatic Spark DataFrame stages over tables of image+caption pairs:

    images -> signatures (Arrow UDF)            # sketch aggregate, per row
           -> bands (explode + salted LSH keys) # replaces the HNSW index
           -> candidate_pairs (equi self-join)  # replaces parallel_search
           -> verified_edges (pixel/caption)    # replaces distance threshold
           -> clusters (small-star/large-star)  # replaces coreset dispatch

Everything is deterministic and seeded; all heavy math is vectorized
numpy inside pandas/Arrow UDFs (no per-row Python UDFs).
"""

from gsearch_spark.config import PipelineConfig

__all__ = ["PipelineConfig"]
__version__ = "0.1.0"
