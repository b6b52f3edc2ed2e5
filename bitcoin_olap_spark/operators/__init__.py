"""Reusable composable operators.

- text.py     tokenization, shingling, language-ID, quality scoring,
              fingerprinting (all JVM-side expressions)
- dedup.py    exact, n-gram Jaccard, MinHash+LSH, SimHash near-dup
- vectors.py  cosine similarity / ANN search over embedding columns
- sampling.py stratified sampling (ntile + per-bucket cap)
"""
