"""Spark DataFrame operators: the pipeline stages.

Stage map (reference analog in parentheses — gsearch file:line):

    signatures  — images -> per-row sketch columns
                  (sketch_compressedkmer, src/dna/dnasketch.rs:336)
    banding     — signatures -> salted LSH band keys
                  (hnsw.parallel_insert, src/dna/dnasketch.rs:435)
    candidates  — band bucket equi-join -> candidate pairs
                  (hnsw.parallel_search, src/dna/dnarequest.rs:349-364)
    suffix      — suffix-array caption-substring pass (north_rule J7)
    verify      — decoded-pixel PSNR/allclose + caption rule
                  (distance threshold, src/answer.rs:42-55)
    cc          — small-star/large-star connected components
                  (coreset point->facility dispatch, binaux hnswcore.rs:269-277)
    pipeline    — stage orchestration + checkpoints + lineage
                  (processing_state.json, src/utils/files.rs:52-110)
"""
