"""DuckDB oracle-SQL builders mirroring the engine's custom operators.

The driver's correctness gate runs each Spark query against an ANSI-SQL
equivalent in DuckDB. For plain relational operators the SQL is written
by hand; for the custom operators (BM25 FTS, MinHash, …) the SQL is
*generated here from the same parsed query / the same pinned formulas*,
so both engines execute provably identical semantics.

Everything emitted is plain SQL over the pre-registered views — no
DuckDB extensions beyond list/regexp functions.
"""

from __future__ import annotations

import re

from .functions.text import SEP_SQL
from .operators.fts import (
    And,
    K1,
    B,
    Node,
    Not,
    Or,
    Phrase,
    Term,
    _phrase_regex,
    parse_fts_query,
    query_terms,
)


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def fts_tokens_cte(table: str, id_col: str, text_col: str) -> str:
    """Tokenizer CTE identical to functions.text.tokens."""
    return f"""
      toks AS (
        SELECT {id_col} AS doc_id,
               unnest(list_filter(
                 regexp_split_to_array(lower({text_col}), '{SEP_SQL}'),
                 x -> x <> '')) AS term
        FROM {table}
      ),
      postings AS (
        SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY term, doc_id
      ),
      doc_stats AS (
        SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
      ),
      corpus AS (
        SELECT (SELECT count(*) FROM {table}) AS n,
               (SELECT avg(dl) FROM doc_stats) AS avg_dl
      )"""


def _match_sql(node: Node, table: str, id_col: str, text_col: str) -> str:
    """Node -> SQL set algebra (INTERSECT/UNION/EXCEPT) over postings."""
    if isinstance(node, Term):
        if node.prefix:
            return (
                f"SELECT DISTINCT doc_id FROM postings WHERE term LIKE "
                f"{_sql_quote(node.text + '%')}"
            )
        return f"SELECT DISTINCT doc_id FROM postings WHERE term = {_sql_quote(node.text)}"
    if isinstance(node, Phrase):
        rx = _phrase_regex(node.terms)
        return (
            f"SELECT DISTINCT {id_col} AS doc_id FROM {table} "
            f"WHERE regexp_matches(lower({text_col}), {_sql_quote(rx)})"
        )
    if isinstance(node, And):
        return (
            f"({_match_sql(node.left, table, id_col, text_col)})\nINTERSECT\n"
            f"({_match_sql(node.right, table, id_col, text_col)})"
        )
    if isinstance(node, Or):
        return (
            f"({_match_sql(node.left, table, id_col, text_col)})\nUNION\n"
            f"({_match_sql(node.right, table, id_col, text_col)})"
        )
    if isinstance(node, Not):
        return (
            f"({_match_sql(node.left, table, id_col, text_col)})\nEXCEPT\n"
            f"({_match_sql(node.right, table, id_col, text_col)})"
        )
    raise ValueError(f"bad node {node!r}")


def fts_oracle_sql(
    query: str,
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    limit: int = 15,
    payload_cols: tuple[str, ...] = (),
    where_sql: str | None = None,
    round_digits: int = 6,
) -> str:
    """SQL mirroring operators.fts.fts_search for the same query string."""
    node = parse_fts_query(query)
    literals = query_terms(node)
    words: list[str] = []
    prefixes: list[str] = []
    for lit in literals:
        if isinstance(lit, Phrase):
            words.extend(lit.terms)
        elif lit.prefix:
            prefixes.append(lit.text)
        else:
            words.append(lit.text)
    conds = []
    if words:
        conds.append("term IN (" + ", ".join(_sql_quote(w) for w in sorted(set(words))) + ")")
    for p in prefixes:
        conds.append(f"term LIKE {_sql_quote(p + '%')}")
    hit_cond = " OR ".join(conds)

    match_sql = _match_sql(node, table, id_col, text_col)
    payload = "".join(f", d.{c}" for c in payload_cols)
    where = f"WHERE {where_sql}" if where_sql else ""

    return f"""
    WITH {fts_tokens_cte(table, id_col, text_col)},
      hits AS (SELECT * FROM postings WHERE {hit_cond}),
      dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM hits GROUP BY term),
      scored AS (
        SELECT h.doc_id,
               sum(
                 ln(1.0 + ((SELECT n FROM corpus) - f.df + 0.5) / (f.df + 0.5))
                 * (h.tf * ({K1} + 1))
                 / (h.tf + {K1} * (1 - {B} + {B} * s.dl / (SELECT avg_dl FROM corpus)))
               ) AS score
        FROM hits h JOIN dfreq f USING (term) JOIN doc_stats s USING (doc_id)
        GROUP BY h.doc_id
      ),
      matches AS ({match_sql})
    SELECT m.doc_id, round(coalesce(sc.score, 0.0), {round_digits}) AS score{payload}
    FROM matches m
    LEFT JOIN scored sc USING (doc_id)
    JOIN (SELECT * FROM {table} {where}) d ON d.{id_col} = m.doc_id
    ORDER BY coalesce(sc.score, 0.0) DESC, m.doc_id
    LIMIT {limit}
    """


KNN_SCORE_SQL = (
    "(1.0 + list_dot_product(embedding, q)"
    " / (sqrt(list_dot_product(embedding, embedding))"
    " * sqrt(list_dot_product(q, q)))) / 2.0"
)


def knn_oracle_sql(
    *,
    query_vec_id: int = 0,
    k: int = 15,
    min_score: float | None = None,
    where_sql: str | None = None,
    payload_cols: tuple[str, ...] = (),
    round_digits: int = 6,
) -> str:
    """SQL mirroring operators.knn.knn_topk with the query vector taken
    from the embeddings table itself (deterministic parameter)."""
    conds = []
    if where_sql:
        conds.append(where_sql)
    if min_score is not None:
        conds.append(f"{KNN_SCORE_SQL} >= {min_score}")
    where = ("WHERE " + " AND ".join(conds)) if conds else ""
    payload = "".join(f", {c}" for c in payload_cols)
    return f"""
    WITH q AS (SELECT embedding AS q FROM embeddings WHERE vec_id = {query_vec_id})
    SELECT vec_id, round({KNN_SCORE_SQL}, {round_digits}) AS score{payload}
    FROM embeddings, q
    {where}
    ORDER BY {KNN_SCORE_SQL} DESC, vec_id
    LIMIT {k}
    """
