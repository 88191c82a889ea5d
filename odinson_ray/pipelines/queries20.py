"""Round-5 batch 1: the removal-side statistic of exact-substring
training-data dedup.

- ``dup_passage_coverage``: per document, the token positions covered
  by 8-token spans that also occur in ANOTHER document (Lee et al.
  2022's substring-dedup step quantified per doc; the pairing side is
  ``shared_passages``). Only docs with >= 1 shared span appear.

Registered by ``pipelines/queries.py``; each ``q_*`` takes ``sf_dir``;
oracle column names match exactly.
"""

from __future__ import annotations

_WINDOW = 8


def q_dup_passage_coverage(sf_dir: str):
    """Per-doc duplicated-passage coverage at window=8 (_WINDOW): docs
    owning a span shared with another doc, with covered-token count and
    fraction. Two single-key shuffles (window hash, then doc_id), both
    resolved by segmented coarse-partition kernels; a k-hot boilerplate
    window contributes k rows (linear), so no hot-window cap is
    needed on this path."""
    from odinson_ray.stages.dedup import dup_passage_coverage

    return dup_passage_coverage(sf_dir, window=_WINDOW)


ORACLE_DUP_PASSAGE_COVERAGE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
wins AS (
  SELECT doc_id, len(t) AS n, s, array_to_string(t[s:s+7], ' ') AS w
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS s
        FROM toks)
),
shared AS (SELECT w FROM wins GROUP BY w HAVING count(DISTINCT doc_id) >= 2),
flagged AS (SELECT doc_id, n, s FROM wins WHERE w IN (SELECT w FROM shared)),
cov AS (
  SELECT doc_id, any_value(n) AS n_tokens, count(DISTINCT p) AS dup_tokens
  FROM (SELECT doc_id, n, unnest(generate_series(s, s + 7)) AS p FROM flagged)
  GROUP BY doc_id
)
SELECT doc_id, n_tokens, dup_tokens,
       round(dup_tokens * 1.0 / n_tokens, 6) AS dup_frac
FROM cov
"""


def register(queries: dict, oracles: dict) -> None:
    queries["dup_passage_coverage"] = q_dup_passage_coverage
    oracles["dup_passage_coverage"] = ORACLE_DUP_PASSAGE_COVERAGE
