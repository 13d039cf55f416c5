"""Operator layer: thin, scale-aware wrappers over the DataFrame API.

Each module covers one band of the SURVEY §2 inventory:

- relational  — projection / filter / aggregation (P*, F*, A*)
- nulls       — na.drop / na.fill / statistical impute (N*)
- joins       — broadcast + shuffle equi-joins, semi/anti (§2.7 extension)
- windows     — ranking, running aggregates, sessionize (§2.8 extension)
- dedup       — exact, MinHash-LSH, SimHash, n-gram Jaccard (§2.14)
- similarity  — brute-force + LSH-bucketed ANN over embeddings (§2.14)
- text        — lang-id, quality, tokens, fingerprints (§2.14)
- multimodal  — binary columns + typed metadata, stubbed decoders (§2.14)
"""
