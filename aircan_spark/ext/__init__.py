"""Beyond-reference operators for large-scale training-data pipelines.

The reference (datopian/aircan) has no analog of these; they are the
LLM-data-pipeline surface the engine adds on top (SURVEY.md §7.2 step 9):

- ``dedup``       exact, MinHash+LSH, SimHash, n-gram Jaccard,
                  embedding-cosine near-dup
- ``similarity``  brute-force cosine top-k + LSH-bucketed ANN
- ``text``        language-ID, quality scoring, token counting,
                  fingerprinting
- ``multimodal``  binary-column plumbing: decode / feature-extract /
                  resize / frame-sample via mapInPandas (decode stubbed —
                  image/audio libs absent in this environment)

Every operator is built shuffle-conscious for the 100 TB target: candidate
generation by bucketing (LSH bands / hyperplane sketches) instead of
all-pairs joins, JVM-side built-ins in the hot path, Arrow-batched pandas
UDFs only where Spark lacks the primitive.
"""
