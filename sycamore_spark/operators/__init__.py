"""Operator modules (SURVEY.md §2): import the module you need —

- aggregation: custom partial+final Aggregation frame, Reduce
- clustering: kmeans, llm-assign clustering, rerank
- dedup: exact / jaccard / minhash-LSH / simhash / embedding near-dup
- derive: unit-group property fill (rounded + exact), formula solve
- elements: explode, marks, mergers, split, regex/markdown over elements
- embed: embedding stages (deterministic fake + pluggable real)
- graph: entity/relationship extraction → nodes/edges tables
- multimodal: binary media columns, decode/resize/frame-sample stubs
- partition: text/html partitioners → elements
- similarity: brute-force + IVF ANN top-k
- sketcher: shingles, minhash signatures
- standardize: US-state / datetime standardizers, augment_text, chunker
- textstats: token/quality/language/fingerprint columns
"""
