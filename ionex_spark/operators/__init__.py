"""Spark operators of the engine — each module is one SURVEY.md §2 family.

- spatial:    cell indexing, broadcast spatial join, bilinear + temporal
              interpolation (the reference's interpolation kernels as pure
              JVM column expressions — no Python in the hot path)
- knn:        k-nearest grid points via bounded candidate window + ranking
- pip:        point-in-polygon joins (edge-table crossing number, built-ins)
- tiles:      raster<->vector tile assignment + rollups
- dedup:      exact / minhash-LSH / simhash / n-gram near-dup
- text:       language-id, quality scoring, token counts, fingerprints
- similarity: embedding cosine top-k (brute force + LSH-bucketed ANN)
- multimodal: binary image decode/verify plumbing (pandas UDFs)
- merge:      keyed full-outer grid merge (reference qc semantics)
"""
