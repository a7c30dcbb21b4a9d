"""Beyond-parity LLM-data-pipeline operators (SURVEY.md §7 M5).

- ``text``      : token counting, quality scoring, language-ID, fingerprints.
- ``dedup``     : exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding near-dup.
- ``vector``    : cosine/dot similarity, brute-force + LSH/IVF ANN search.
- ``sampling``  : deterministic md5-bucket splits/samples (cross-engine,
                  RNG-free — reproducible at any scale and partitioning).
- ``multimodal``: opaque-binary columns with typed metadata + Pandas-UDF
                  decode/feature plumbing (decode itself stubbed — no image/
                  audio libs in this environment).

Design rule: hot paths are pure ``pyspark.sql.functions`` expressions (JVM,
codegen'd); Python appears only in Arrow-batched ``mapInPandas`` for the
multimodal stubs. Nothing here collects to the driver.
"""
