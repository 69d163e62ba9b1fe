"""DuckDB oracle-SQL generation for the driver's correctness gate.

The driver (see __spark_entry__.py) runs each Spark query AND an ANSI-SQL
oracle side-by-side over the same parquet tables and compares row counts,
schemas and order-insensitive value hashes. This module generates the
oracle SQL for the full-text entries so that BOTH sides compute the exact
same float64 values:

- identical analysis chain (the ANALYSIS CONTRACT pinned in analysis.py:
  lowercase → [a-z0-9_]+ runs → 33 Lucene English stopwords);
- identical BM25 arithmetic with the same literal constants and the same
  parenthesization / accumulation order as the numpy kernel
  (scoring.py idf/tfnorm: term contributions added in sorted-term order,
  starting from 0.0 — IEEE: adding coalesce(…,0.0) terms left-to-right
  reproduces the kernel's fold bit-for-bit);
- scores rounded to 6 dp on both sides, and the top-k rank computed on the
  ROUNDED score (tie-break: source asc, doc_id asc — which equals the
  engine's internal-docid ascending tie-break, since docid is the ordinal
  of the (repo=source, path=doc_id) sort). Rounding-before-ranking makes
  the comparison immune to the ≤1-ulp ln() difference between numpy and
  DuckDB's libm.

Reference contract being checked: BM25 with k1=1.2, b=0.75, exact doclen
(/root/reference/solr/core/src/java/org/apache/solr/search/similarities/
BM25SimilarityFactory.java:47-50), tie-break by docid ascending
(handler/component/ShardFieldSortedHitQueue.java).
"""

from __future__ import annotations

from .analysis import SPLIT_REGEX_SQL, STOPWORDS_SQL
from .qparser import Query, parse

# token-list expression over a documents row (DuckDB list lambda syntax)
TOKS = (
    "list_filter(string_split_regex(lower({col}), '" + SPLIT_REGEX_SQL + "'), "
    "x -> x <> '' AND x NOT IN (" + STOPWORDS_SQL + "))"
)


def _toks(col: str = "text") -> str:
    return TOKS.format(col=col)


def synonym_toks_sql(rules: dict, col: str = "text") -> str:
    """Expanded token-list SQL for an index-time synonym table
    (analysis.SynonymGraph, expand=true): every LHS occurrence
    additionally emits its RHS tokens. Token-frequency semantics only —
    positions are irrelevant to term scoring, so a flat
    list_transform→flatten mirror is exact for tf/df. Single-token LHS
    only (a multi-token LHS needs positional windows; those paths are
    pinned by pytest against the engine instead)."""
    cases = []
    for lhs, rhss in sorted(rules.items()):
        if " " in lhs:
            raise ValueError(
                "synonym_toks_sql mirrors single-token LHS rules only"
            )
        if isinstance(rhss, str):
            rhss = [rhss]
        all_toks = [lhs] + [t for r in rhss for t in r.split()]
        arr = ", ".join(f"'{t}'" for t in all_toks)
        cases.append(f"WHEN x = '{lhs}' THEN [{arr}]")
    case = "CASE " + " ".join(cases) + " ELSE [x] END"
    return f"flatten(list_transform({_toks(col)}, x -> {case}))"


def bm25_oracle_sql(
    q: str,
    k: int = 10,
    table: str = "documents",
    toks_sql: str | None = None,
    term_transform=None,
    doclen_toks_sql: str | None = None,
) -> str:
    """Generate the DuckDB oracle for a lucene-lite query string over the
    ``documents`` view (doc_id, text, lang, source). Output columns:
    (doc_id bigint, score double) — score rounded to 6 dp; top-k by
    (rounded score desc, source asc, doc_id asc).

    ``toks_sql`` overrides the document token-list expression (e.g. a
    stemmed analyzer chain) and ``term_transform`` applies the matching
    per-term transform to the parsed query terms — the query/index
    analyzer symmetry mirrored from engine.gate_search.

    ``doclen_toks_sql`` overrides the token list used for doclen/avgdl
    separately from the tf/df list — index-time synonyms inject posInc-0
    tokens that count toward tf but NOT toward length normalization
    (Lucene discountOverlaps; see analysis.SynonymGraph)."""
    query: Query = parse(q)
    if query.phrases or query.multiterm or query.required_groups:
        raise ValueError(
            "bm25_oracle_sql handles plain term queries only — phrase/"
            "multiterm/grouped clauses need their dedicated oracle "
            "builders (silently dropping them would generate a wrong oracle)"
        )
    if term_transform is not None:
        from collections import Counter

        for attr in ("optional", "required"):
            c = Counter()
            for t, n in getattr(query, attr).items():
                c[term_transform(t)] += n
            setattr(query, attr, c)
        query.prohibited = {term_transform(t) for t in query.prohibited}
        query.boosts = {term_transform(t): b for t, b in query.boosts.items()}
    terms = sorted(query.scoring)  # kernel accumulates in sorted-term order
    weights = query.scoring
    prohibited = sorted(query.prohibited)
    required = sorted(query.required)
    tok_expr = toks_sql or _toks()
    dl_expr = doclen_toks_sql or tok_expr

    ctes = [
        f"tok AS (SELECT doc_id, unnest({tok_expr}) AS term FROM {table})",
        f"dl AS (SELECT doc_id, lang, source, len({dl_expr}) AS doclen FROM {table})",
        (
            "g AS (SELECT CAST(count(*) AS DOUBLE) AS n, "
            "CAST(sum(doclen) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM dl)"
        ),
    ]
    contribs = []
    join_clauses = []
    for i, t in enumerate(terms):
        ctes.append(
            f"m{i} AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS tf "
            f"FROM tok WHERE term = '{t}' GROUP BY doc_id)"
        )
        ctes.append(f"df{i} AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM m{i})")
        join_clauses.append(f"LEFT JOIN m{i} ON m{i}.doc_id = d.doc_id")
        eff_w = float(weights[t]) * float(query.boosts.get(t, 1.0))
        w = f"{eff_w} * " if eff_w != 1.0 else ""
        # EXACT numpy expression mirror (scoring.py idf & tfnorm):
        #   idf  = ln(1.0 + (N - df + 0.5) / (df + 0.5))
        #   tfn  = tf*(1.2+1.0) / (tf + 1.2*(1.0-0.75+0.75*dl/avgdl))
        contribs.append(
            f"CASE WHEN m{i}.doc_id IS NULL THEN 0.0 ELSE "
            f"{w}ln(1.0 + (g.n - (SELECT v FROM df{i}) + 0.5) / ((SELECT v FROM df{i}) + 0.5))"
            f" * (m{i}.tf * (1.2 + 1.0) / "
            f"(m{i}.tf + 1.2 * (1.0 - 0.75 + 0.75 * d.doclen / g.avgdl))) END"
        )
    for j, t in enumerate(prohibited):
        ctes.append(
            f"p{j} AS (SELECT DISTINCT doc_id FROM tok WHERE term = '{t}')"
        )
        join_clauses.append(f"LEFT JOIN p{j} ON p{j}.doc_id = d.doc_id")

    score_expr = " + ".join(contribs) if contribs else "0.0"
    conds = []
    if not terms:
        conds.append("FALSE")  # empty/stopword-only query matches nothing
    elif required and len(required) == len(terms):
        conds += [f"m{terms.index(t)}.doc_id IS NOT NULL" for t in terms]
    else:
        match = " OR ".join(f"m{i}.doc_id IS NOT NULL" for i in range(len(terms)))
        conds.append(f"({match})")
        conds += [f"m{terms.index(t)}.doc_id IS NOT NULL" for t in required]
    conds += [f"p{j}.doc_id IS NULL" for j in range(len(prohibited))]
    for fld, vals in sorted(query.filters.items()):
        col = {"repo": "source", "source": "source", "lang": "lang"}.get(fld, fld)
        in_list = ", ".join(f"'{v}'" for v in vals)
        conds.append(f"d.{col} IN ({in_list})")
    where = " AND ".join(conds) if conds else "TRUE"
    joins = "\n  ".join(join_clauses)
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        f"SELECT d.doc_id AS doc_id, round({score_expr}, 6) AS score\n"
        f"FROM dl d CROSS JOIN g\n  {joins}\n"
        f"WHERE {where}\n"
        f"ORDER BY round({score_expr}, 6) DESC, d.source ASC, d.doc_id ASC\n"
        f"LIMIT {k}"
    )


def analyzed_tokens_sql(col: str = "text") -> str:
    """The token-list SQL fragment (for text-function oracles)."""
    return _toks(col)


def mlt_oracle_sql(
    seed_doc_id: int,
    top_terms: int = 5,
    k: int = 10,
    min_df: int = 2,
    table: str = "documents",
) -> str:
    """Oracle for more-like-this (MoreLikeThisHandler.java:1): seed term
    vector from the seed doc's own tokens, interesting-term selection by
    tf·idf (df >= min_df, top ``top_terms``, tie-break term asc), then a
    BM25 OR query over the selected terms excluding the seed.

    Score contract shared with engine.gate_mlt: per-term contributions
    rounded to 6 dp BEFORE the sum, sum rounded to 6 dp — the double
    rounding makes the score independent of fp summation order, so the
    SQL's unordered SUM reproduces the engine bit-for-bit."""
    t = _toks()
    return f"""WITH tok AS (SELECT doc_id, unnest({t}) AS term FROM {table}),
dl AS (SELECT doc_id, source, len({t}) AS doclen FROM {table}),
g AS (SELECT CAST(count(*) AS DOUBLE) AS n,
      CAST(sum(doclen) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM dl),
stf AS (SELECT term, CAST(count(*) AS DOUBLE) AS tf FROM tok
        WHERE doc_id = {seed_doc_id} GROUP BY term),
dfs AS (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df FROM tok GROUP BY term),
sel AS (SELECT stf.term, dfs.df FROM stf JOIN dfs USING (term) CROSS JOIN g
        WHERE dfs.df >= {min_df}
        ORDER BY stf.tf * ln(1.0 + (g.n - dfs.df + 0.5) / (dfs.df + 0.5)) DESC, stf.term ASC
        LIMIT {top_terms}),
m AS (SELECT tok.doc_id, tok.term, CAST(count(*) AS DOUBLE) AS tf
      FROM tok JOIN sel USING (term) GROUP BY tok.doc_id, tok.term),
sc AS (SELECT m.doc_id, round(sum(round(
         ln(1.0 + (g.n - sel.df + 0.5) / (sel.df + 0.5))
         * (m.tf * (1.2 + 1.0) / (m.tf + 1.2 * (1.0 - 0.75 + 0.75 * d.doclen / g.avgdl))), 6)), 6) AS score
       FROM m JOIN sel ON m.term = sel.term JOIN dl d ON m.doc_id = d.doc_id CROSS JOIN g
       GROUP BY m.doc_id)
SELECT sc.doc_id, sc.score FROM sc JOIN dl d ON sc.doc_id = d.doc_id
WHERE sc.doc_id <> {seed_doc_id}
ORDER BY sc.score DESC, d.source ASC, sc.doc_id ASC
LIMIT {k}"""


def _phrase_ctes(j: int, toks: list[str]) -> list[str]:
    """CTEs computing phrase frequency, matches and df for one shingle."""
    L = len(toks)
    arr = ", ".join(f"'{t}'" for t in toks)
    return [
        (
            f"pt{j} AS (SELECT doc_id, CASE WHEN len(t) - {L} + 1 >= 1 THEN "
            f"len(list_filter(generate_series(1, len(t) - {L} + 1), "
            f"i -> t[i:i+{L - 1}] = [{arr}])) ELSE 0 END AS ptf FROM tk)"
        ),
        f"pm{j} AS (SELECT doc_id, ptf FROM pt{j} WHERE ptf > 0)",
        f"dfp{j} AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM pm{j})",
    ]


def _phrase_expr(j: int) -> str:
    """BM25 contribution of one matched shingle (tf = phrase frequency) —
    exact literal mirror of engine._phrase_component."""
    return (
        f"CASE WHEN pm{j}.doc_id IS NULL THEN 0.0 ELSE "
        f"ln(1.0 + (g.n - (SELECT v FROM dfp{j}) + 0.5) / ((SELECT v FROM dfp{j}) + 0.5))"
        f" * (CAST(pm{j}.ptf AS DOUBLE) * (1.2 + 1.0) / "
        f"(CAST(pm{j}.ptf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * d.doclen / g.avgdl))) END"
    )


def edismax_oracle_sql(
    clauses: list[str],
    qf_text: float = 1.0,
    qf_source: float = 0.0,
    mm_n: int = 1,
    tie: float = 0.0,
    pf2_weight: float = 0.0,
    pf3_weight: float = 0.0,
    k: int = 10,
    table: str = "documents",
) -> str:
    """Oracle for edismax (engine.gate_edismax): per-clause
    DisjunctionMax over (text, source) fields, mm clause-count filter,
    pf2/pf3 shingled phrase boosts — every expression mirrors the
    engine's literal shape and accumulation order (clauses in query
    order, then pf2 pairs, then pf3 trigrams). ``clauses`` must already
    be analyzed tokens; ``mm_n`` the resolved calculate_mm value."""
    uniq = sorted(set(clauses))
    idx = {t: i for i, t in enumerate(uniq)}
    use_source = qf_source != 0.0
    ctes = [
        f"tok AS (SELECT doc_id, unnest({_toks()}) AS term FROM {table})",
        f"dl AS (SELECT doc_id, lang, source, len({_toks()}) AS doclen FROM {table})",
        (
            "g AS (SELECT CAST(count(*) AS DOUBLE) AS n, "
            "CAST(sum(doclen) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM dl)"
        ),
    ]
    joins = []
    for i, t in enumerate(uniq):
        ctes.append(
            f"m{i} AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS tf "
            f"FROM tok WHERE term = '{t}' GROUP BY doc_id)"
        )
        ctes.append(f"df{i} AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM m{i})")
        joins.append(f"LEFT JOIN m{i} ON m{i}.doc_id = d.doc_id")
        if use_source:
            ctes.append(
                f"sdf{i} AS (SELECT CAST(count(*) AS DOUBLE) AS v "
                f"FROM dl WHERE source = '{t}')"
            )
    shingled: list[tuple[float, list[str]]] = []
    if pf2_weight:
        shingled += [(pf2_weight, clauses[i : i + 2]) for i in range(len(clauses) - 1)]
    if pf3_weight:
        shingled += [(pf3_weight, clauses[i : i + 3]) for i in range(len(clauses) - 2)]
    if shingled:
        ctes.append(f"tk AS (SELECT doc_id, {_toks()} AS t FROM {table})")
        for j, (_w, sh_toks) in enumerate(shingled):
            ctes.extend(_phrase_ctes(j, sh_toks))
            joins.append(f"LEFT JOIN pm{j} ON pm{j}.doc_id = d.doc_id")

    clause_exprs, match_exprs = [], []
    for t in clauses:
        i = idx[t]
        tcontrib = (
            f"CASE WHEN m{i}.doc_id IS NULL THEN 0.0 ELSE "
            f"ln(1.0 + (g.n - (SELECT v FROM df{i}) + 0.5) / ((SELECT v FROM df{i}) + 0.5))"
            f" * (m{i}.tf * (1.2 + 1.0) / "
            f"(m{i}.tf + 1.2 * (1.0 - 0.75 + 0.75 * d.doclen / g.avgdl))) END"
        )
        a = f"({qf_text!r} * ({tcontrib}))"
        if use_source:
            scontrib = (
                f"CASE WHEN d.source = '{t}' THEN "
                f"ln(1.0 + (g.n - (SELECT v FROM sdf{i}) + 0.5) / ((SELECT v FROM sdf{i}) + 0.5))"
                f" ELSE 0.0 END"
            )
            b = f"({qf_source!r} * ({scontrib}))"
            match_exprs.append(
                f"CASE WHEN m{i}.doc_id IS NOT NULL OR d.source = '{t}' THEN 1 ELSE 0 END"
            )
        else:
            b = f"({qf_source!r} * 0.0)"
            match_exprs.append(f"CASE WHEN m{i}.doc_id IS NOT NULL THEN 1 ELSE 0 END")
        clause_exprs.append(
            f"(greatest({a}, {b}) + {float(tie)!r} * (({a} + {b}) - greatest({a}, {b})))"
        )
    score = " + ".join(clause_exprs)
    for j, (w, _sh) in enumerate(shingled):
        score = f"{score} + {float(w)!r} * ({_phrase_expr(j)})"
    nm = " + ".join(match_exprs)
    j = "\n  ".join(joins)
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        f"SELECT d.doc_id AS doc_id, round({score}, 6) AS score\n"
        f"FROM dl d CROSS JOIN g\n  {j}\n"
        f"WHERE ({nm}) >= {mm_n}\n"
        f"ORDER BY round({score}, 6) DESC, d.source ASC, d.doc_id ASC\n"
        f"LIMIT {k}"
    )


def dismax_oracle_sql(terms: list[str], tie: float, k: int, table: str = "documents") -> str:
    """Oracle for DisMax ranking (max + tie·(sum−max), DisMaxQParser.java:1)
    under the same rounded-score contract as bm25_oracle_sql. Contribution
    expressions mirror kernel.term_contributions' Catalyst literals."""
    ts = sorted(set(terms))
    ctes = [
        f"tok AS (SELECT doc_id, unnest({_toks()}) AS term FROM {table})",
        f"dl AS (SELECT doc_id, lang, source, len({_toks()}) AS doclen FROM {table})",
        (
            "g AS (SELECT CAST(count(*) AS DOUBLE) AS n, "
            "CAST(sum(doclen) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM dl)"
        ),
    ]
    joins, cvals = [], []
    for i, t in enumerate(ts):
        ctes.append(
            f"m{i} AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS tf "
            f"FROM tok WHERE term = '{t}' GROUP BY doc_id)"
        )
        ctes.append(f"df{i} AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM m{i})")
        joins.append(f"LEFT JOIN m{i} ON m{i}.doc_id = d.doc_id")
        cvals.append(
            f"CASE WHEN m{i}.doc_id IS NULL THEN 0.0 ELSE "
            f"ln(1.0 + (g.n - (SELECT v FROM df{i}) + 0.5) / ((SELECT v FROM df{i}) + 0.5))"
            f" * (m{i}.tf * (1.2 + 1.0) / "
            f"(m{i}.tf + 1.2 * (1.0 - 0.75 + 0.75 * d.doclen / g.avgdl))) END"
        )
    total = " + ".join(cvals)
    mx = f"greatest({', '.join(cvals)})" if len(cvals) > 1 else cvals[0]
    score = f"{mx} + {float(tie)} * (({total}) - {mx})"
    match = " OR ".join(f"m{i}.doc_id IS NOT NULL" for i in range(len(ts)))
    j = "\n  ".join(joins)
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        f"SELECT d.doc_id AS doc_id, round({score}, 6) AS score\n"
        f"FROM dl d CROSS JOIN g\n  {j}\n"
        f"WHERE ({match})\n"
        f"ORDER BY round({score}, 6) DESC, d.source ASC, d.doc_id ASC\n"
        f"LIMIT {k}"
    )
