"""solr_spark — a PySpark-native full-text indexing + BM25 query engine.

A from-scratch reimplementation of the query/data-processing capabilities
of Apache Solr (reference tree at /root/reference), re-expressed in
idiomatic Spark: DataFrame/SQL plans, Arrow-vectorized pandas UDFs for the
analysis/codec/scoring kernels, and ordinary parquet tables as the index.

Layout
------
- ``analysis``   — code-aware tokenizer + stop filtering (vectorized pandas)
  (reference: Solr ``text_general`` analyzer chain,
  solr/server/solr/configsets/_default/conf/managed-schema.xml:297-313)
- ``codec``      — posting-list block codec: docID-delta + LEB128 varint,
  per-block max-tf/min-doclen metadata for block-max pruning
  (reference: Lucene 9.8 postings format, configured via versions.props)
- ``corpus``     — deterministic synthetic source-code corpus generator
- ``indexer``    — distributed index build: docid assignment, doc_stats,
  bucketed posting lists, term_stats, lineage manifests + resume
  (reference lifecycle: solr/core/src/java/org/apache/solr/update/
  DirectUpdateHandler2.java:309-409)
- ``scoring``    — BM25 formula (k1=1.2, b=0.75, exact doclen)
  (reference: solr/core/src/java/org/apache/solr/search/similarities/
  BM25SimilarityFactory.java:47-50)
- ``kernel``     — distributed top-k query execution over the index
  (reference: solr/core/src/java/org/apache/solr/search/
  SolrIndexSearcher.java:1537-1795)
- ``qparser``    — lucene-lite / dismax query parsing
  (reference: solr/core/src/java/org/apache/solr/search/QParser.java:320)
- ``operators``  — streaming-expression-plane relational operators
  (reference: solr/solrj-streaming/.../io/stream/*, Lang.java:337-498)
- ``functions``  — text analysis / dedup / similarity / evaluator functions
- ``lets``       — let()-scope composition: bindings, memset, object cache
  (reference: solrj-streaming io/stream/LetStream.java, io/eval caches)
- ``segments``   — incremental delta segments + live-docs deletes + merge
- ``positions``  — positional postings + per-position payload stream
- ``sources``    — loaders/writers (json/csv/xml/cbor/javabin/smile), topic()
- ``streaming``  — daemon loop, micro-batch stream_index
"""

__version__ = "0.1.0"
