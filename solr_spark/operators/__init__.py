"""Relational operators — the streaming-expression plane of the reference.

The reference's dataflow algebra lives in
solr/solrj-streaming/src/java/org/apache/solr/client/solrj/io/stream/*
(registry Lang.java:337-498). Each module here re-expresses one family of
those operators as idiomatic Spark DataFrame plans (SURVEY.md §2.4-2.6):

- ``relational`` — search/select/sort/top/unique/cursor paging
- ``joins``      — inner/leftOuter/hash/semi/anti/fetch/cartesianProduct
- ``rollup``     — rollup/hashRollup/stats/facet/facet2D/timeseries
- ``windowed``   — collapse/expand/group-topN (window functions)
- ``graph``      — graph BFS expansion, significantTerms, more-like-this
"""

from . import graph, joins, relational, rollup, windowed  # noqa: F401
