"""Scalar/document-level function surface + training-data pipeline ops.

- ``textfn``     — tokenize/token-count/lang-id/quality/fingerprint
  (reference analog: analysis chain + function queries,
  /root/reference/solr/core/src/java/org/apache/solr/search/ValueSourceParser.java:163-1397)
- ``dedup``      — exact / n-gram-Jaccard / MinHash-LSH / SimHash dedup
  (reference analog: SignatureUpdateProcessorFactory + MinHashQParser,
  /root/reference/solr/core/src/java/org/apache/solr/update/processor/SignatureUpdateProcessorFactory.java,
  /root/reference/solr/core/src/java/org/apache/solr/search/MinHashQParser.java)
- ``similarity`` — embedding ANN: brute-force cosine top-k + IVF variant
  (reference analog: DenseVectorField + {!knn},
  /root/reference/solr/core/src/java/org/apache/solr/schema/DenseVectorField.java:1,
  /root/reference/solr/core/src/java/org/apache/solr/search/neural/KnnQParser.java:35-81)
- ``multimodal`` — binary-column decode/feature plumbing (stubbed decode)
"""

from . import dedup, multimodal, similarity, textfn  # noqa: F401
