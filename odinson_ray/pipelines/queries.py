"""Driver-checkable query suite: Ray Data pipelines + DuckDB oracles.

Each ``q_*`` function takes ``sf_dir`` and returns a Dataset / DataFrame /
Arrow table; ``ORACLES[name]`` is ANSI SQL DuckDB runs over the same
parquet tables (views: region nation customer supplier part orders
lineitem events documents embeddings). Column names match exactly; floats
are rounded identically on both sides.

Sections: relational ops (TPC-H-ish), stream-shaped ops (events),
text-analysis + dedup ops (documents), similarity search (embeddings),
Odinson pattern queries (documents -> interleaved -> matcher), and the
KG flagship (triples). Pattern-query oracles are exact because the
deterministic annotator's layers are pure SQL-expressible functions of the
token stream (see stages/annotate.py).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from odinson_ray.stages.shuffle import rename_agg


def _rd():
    # ray.data stand-in whose read_parquet strips pandas schema metadata
    # at the read (sources/io.py) — keeps every schema hashable so Ray
    # Data's schema dedup never falls to the slow unify path
    from ..sources.io import clean_rd

    return clean_rd


STOPWORDS = ("the", "a")
VERBS = ("scan", "join", "sort", "merge", "filter", "group")


# ===================================================================== relational

def q_lineitem_agg(sf_dir: str):
    """TPC-H Q1-style aggregate with a per-batch computed column.

    Map-side combine: Ray's groupby().aggregate() sort-shuffles EVERY
    row; the per-batch Arrow groupby collapses each batch to <= |keys|
    partial rows first (Mean decomposes into Sum+Count), so the global
    exchange moves ~6 rows per batch instead of the whole table."""
    rd = _rd()
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )
    keys = ["l_returnflag", "l_linestatus"]

    def partial(t: pa.Table) -> pa.Table:
        disc = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        base = pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "q": t["l_quantity"],
            "p": t["l_extendedprice"],
            "d": disc,
        })
        agg = pa.TableGroupBy(base, keys).aggregate(
            [("q", "sum"), ("p", "sum"), ("d", "sum"), ([], "count_all")])
        return rename_agg(agg, keys, keys + ["_q", "_p", "_d", "_n"])

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(keys)
        .aggregate(
            Sum("_q", alias_name="sum_qty"),
            Sum("_p", alias_name="sum_base_price"),
            Sum("_d", alias_name="sum_disc_price"),
            Sum("_n", alias_name="n"),
        )
        .to_pandas()
    )
    out["avg_qty"] = (out["sum_qty"] / out["n"]).round(6)
    for col in ("sum_base_price", "sum_disc_price"):
        out[col] = out[col].round(2)
    out["sum_qty"] = out["sum_qty"].round(2)
    return out[["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
                "sum_disc_price", "avg_qty", "n"]]


ORACLE_LINEITEM_AGG = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       count(*) AS n
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def q_top_orders(sf_dir: str):
    """Broadcast join orders->customer + deterministic top-k.

    The build side is FILTERED as a Dataset before collection (only
    BUILDING customers ever reach the driver — at a 100x dimension the
    collected side stays proportional to the selected segment, VERDICT
    r02 "What's wrong" #6), and the top-10 prunes per batch before the
    distributed sort (global_topk), so the sort input is <= 10 rows per
    batch rather than the whole orders table."""
    import ray

    rd = _rd()
    cust_ds = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_mktsegment"]
    ).map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING")),
        batch_format="pyarrow",
    )
    cust = cust_ds.to_pandas()  # small: post-filter dimension rows only
    lookup = ray.put(dict(zip(cust.c_custkey, cust.c_name)))

    from odinson_ray.stages.link import get_broadcast
    from odinson_ray.stages.shuffle import global_topk

    def join_batch(t: pa.Table) -> pa.Table:
        names = get_broadcast(lookup)
        keys = t["o_custkey"].to_numpy(zero_copy_only=False)
        cname = [names.get(k) for k in keys]
        mask = [c is not None for c in cname]
        t = t.append_column("c_name", pa.array(cname, pa.string()))
        return t.filter(pa.array(mask))

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    ).map_batches(join_batch, batch_format="pyarrow")
    out = global_topk(ds, ["o_totalprice", "o_orderkey"], [True, False], 10).to_pandas()
    return out[["o_orderkey", "o_totalprice", "c_name"]]


ORACLE_TOP_ORDERS = """
SELECT o_orderkey, o_totalprice, c_name
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


def q_revenue_by_nation(sf_dir: str):
    """lineitem -> supplier -> nation via broadcast dims + grouped sum."""
    import ray

    rd = _rd()
    from ray.data.aggregate import Sum

    supp = pd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    s2n = dict(zip(supp.s_suppkey, supp.s_nationkey))
    n2name = dict(zip(nation.n_nationkey, nation.n_name))
    lookup = ray.put({k: n2name[v] for k, v in s2n.items()})

    from odinson_ray.stages.link import get_broadcast

    def enrich(t: pa.Table) -> pa.Table:
        # broadcast dim lookup + MAP-SIDE COMBINE: collapse each batch to
        # one row per nation before the global groupby (Ray's aggregate
        # sort-shuffles every input row otherwise)
        names = get_broadcast(lookup)
        keys = t["l_suppkey"].to_numpy(zero_copy_only=False)
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        base = pa.table({
            "n_name": pa.array([names[k] for k in keys], pa.string()),
            "revenue": rev,
        })
        agg = pa.TableGroupBy(base, ["n_name"]).aggregate([("revenue", "sum")])
        return rename_agg(agg, ["n_name"], ["n_name", "revenue"])

    out = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_suppkey", "l_extendedprice", "l_discount"]
        )
        .map_batches(enrich, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("revenue", alias_name="revenue"))
        .to_pandas()
    )
    out["revenue"] = out["revenue"].round(2)
    return out


ORACLE_REVENUE_BY_NATION = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


def q_distinct_flags(sf_dir: str):
    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_linestatus"])
    from ray.data.aggregate import Count

    return ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(Count(alias_name="n"))


ORACLE_DISTINCT_FLAGS = """
SELECT l_returnflag, l_linestatus, count(*) AS n
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_union_nation_keys(sf_dir: str):
    rd = _rd()
    c = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_nationkey"]).map_batches(
        lambda t: t.rename_columns(["nationkey"]), batch_format="pyarrow"
    )
    s = rd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_nationkey"]).map_batches(
        lambda t: t.rename_columns(["nationkey"]), batch_format="pyarrow"
    )
    u = c.union(s)
    return pd.DataFrame({"nationkey": sorted(u.unique("nationkey"))})


ORACLE_UNION_NATION_KEYS = """
SELECT DISTINCT nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT s_nationkey AS nationkey FROM supplier
)
"""


def q_filter_revenue(sf_dir: str):
    """Row-filtered projection with a computed column (streaming, no agg)."""
    rd = _rd()

    def f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["l_discount"], pa.scalar(0.03)))
        raw = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        # floor(x*100+0.5)/100 on float64: bit-identical to the SQL oracle
        rev = pc.divide(pc.floor(pc.add(pc.multiply(raw, pa.scalar(100.0)), pa.scalar(0.5))), pa.scalar(100.0))
        return pa.Table.from_pydict(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": t["l_linenumber"],
                "revenue": rev,
            }
        )

    return rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"],
    ).map_batches(f, batch_format="pyarrow")


ORACLE_FILTER_REVENUE = """
SELECT l_orderkey, l_linenumber,
       floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100 AS revenue
FROM lineitem WHERE l_discount < 0.03
"""


# ===================================================================== events

def q_events_by_type(sf_dir: str):
    rd = _rd()
    from ray.data.aggregate import Count, Sum

    out = (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
        .groupby("event_type")
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="total_value"))
        .to_pandas()
    )
    out["total_value"] = out["total_value"].round(2)
    return out


ORACLE_EVENTS_BY_TYPE = """
SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
FROM events GROUP BY event_type
"""


def q_sessionize(sf_dir: str):
    """Session counts per user with a 30-minute inactivity gap — the
    skew-safe two-stage (key, time-bucket) decomposition from
    stages/window.py, so one hot user cannot pin a whole task."""
    rd = _rd()
    from ..stages.window import sessionize

    return sessionize(
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]),
        key="user_id", ts="ts", gap_s=1800,
    )


ORACLE_SESSIONIZE = """
SELECT user_id, count(*) AS n_sessions FROM (
  SELECT user_id,
         CASE WHEN prev_ts IS NULL OR epoch(ts - prev_ts) > 1800 THEN 1 ELSE 0 END AS is_new
  FROM (SELECT user_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events) t
) WHERE is_new = 1 GROUP BY user_id
"""


def q_running_total(sf_dir: str):
    """Per-user running sum ordered by (ts, event_id) — skew-safe
    two-stage windowed aggregate (stages/window.py): within-bucket seeded
    cumsums + per-key prefix-summed bucket offsets, so no task ever holds
    more than one time bucket of one key."""
    rd = _rd()
    from ..stages.window import running_total

    return running_total(
        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["user_id", "ts", "event_id", "value"]),
        key="user_id", ts="ts", order="event_id", value="value",
        out="running_value", ndigits=4,
    )


ORACLE_RUNNING_TOTAL = """
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 4) AS running_value
FROM events
"""


# ===================================================================== text / dedup

def q_token_count(sf_dir: str):
    rd = _rd()

    def f(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        return pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "n_tokens": pc.list_value_length(toks)}
        )

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


ORACLE_TOKEN_COUNT = """
SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
"""


def q_quality_score(sf_dir: str):
    """Quality scoring: token count, stopword ratio, mean token length."""
    rd = _rd()

    def f(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n_tokens, stop_ratio, avg_len = [], [], []
        for txt in texts:
            toks = txt.split(" ") if txt else []
            n = len(toks)
            n_tokens.append(n)
            stop_ratio.append(round(sum(tk in STOPWORDS for tk in toks) / n, 6) if n else 0.0)
            avg_len.append(round(sum(len(tk) for tk in toks) / n, 6) if n else 0.0)
        return pa.Table.from_pydict(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "stop_ratio": pa.array(stop_ratio, pa.float64()),
                "avg_token_len": pa.array(avg_len, pa.float64()),
            }
        )

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


ORACLE_QUALITY_SCORE = """
SELECT doc_id,
       len(toks) AS n_tokens,
       round(len(list_filter(toks, x -> x IN ('the', 'a'))) * 1.0 / len(toks), 6) AS stop_ratio,
       round(list_sum(list_transform(toks, x -> len(x))) * 1.0 / len(toks), 6) AS avg_token_len
FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
"""


def q_lang_counts(sf_dir: str):
    rd = _rd()
    from ray.data.aggregate import Count

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang"])
        .groupby("lang")
        .aggregate(Count(alias_name="n"))
    )


ORACLE_LANG_COUNTS = "SELECT lang, count(*) AS n FROM documents GROUP BY lang"


def q_fingerprint(sf_dir: str):
    """Content fingerprinting (md5 of the exact text)."""
    rd = _rd()

    def f(t: pa.Table) -> pa.Table:
        fps = [hashlib.md5(x.encode("utf-8")).hexdigest() for x in t["text"].to_pylist()]
        return pa.Table.from_pydict({"doc_id": t["doc_id"], "fp": pa.array(fps, pa.string())})

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


ORACLE_FINGERPRINT = "SELECT doc_id, md5(text) AS fp FROM documents"


def q_dedup_exact(sf_dir: str):
    """Exact dedup: first doc per distinct content hash. Pure-aggregate
    decomposition (r4 continuation — the per-fp ``map_groups`` this
    replaced dispatched ONE TASK PER DISTINCT DOCUMENT, the tiny-group
    pathology at its worst): a per-batch (fp, min doc, count) combiner,
    then one groupby with Min/Sum aggregates — no group task ever
    forms."""
    from ray.data.aggregate import Min, Sum

    rd = _rd()

    def keyed_partial(t: pa.Table) -> pa.Table:
        from odinson_ray.stages.text import content_fingerprints

        base = pa.table({"fp": content_fingerprints(t["text"]),
                         "doc_id": t["doc_id"]})
        g = pa.TableGroupBy(base, ["fp"]).aggregate(
            [("doc_id", "min"), ([], "count_all")])
        return pa.table({"fp": g["fp"], "pd": g["doc_id_min"],
                         "pn": g["count_all"]})

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])
        .map_batches(keyed_partial, batch_format="pyarrow")
        .groupby("fp")
        .aggregate(Min("pd", alias_name="doc_id"),
                   Sum("pn", alias_name="n_copies"))
    )


ORACLE_DEDUP_EXACT = """
SELECT md5(text) AS fp, min(doc_id) AS doc_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


# ===================================================================== embeddings

def _query_vec(sf_dir: str) -> np.ndarray:
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    row = emb[emb.vec_id == 0].iloc[0]
    return np.asarray(row.embedding, dtype=np.float64)


def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-10 vs a broadcast query vector (the ANN
    baseline: numpy matmul per batch against the broadcast query)."""
    import ray

    rd = _rd()
    qv = _query_vec(sf_dir)
    qref = ray.put(qv / np.linalg.norm(qv))

    from odinson_ray.stages.link import get_broadcast

    def score(t: pa.Table) -> pa.Table:
        q = get_broadcast(qref)
        mat = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        cos = (mat @ q) / np.where(norms == 0, 1.0, norms)
        return pa.Table.from_pydict(
            {"vec_id": t["vec_id"], "score": pa.array(np.round(cos, 6), pa.float64())}
        )

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    from odinson_ray.stages.shuffle import global_topk

    return global_topk(
        ds.map_batches(score, batch_format="pyarrow"),
        ["score", "vec_id"], [True, False], 10,
    )


ORACLE_ANN_TOPK = """
SELECT e.vec_id,
       round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])), 6) AS score
FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
ORDER BY score DESC, e.vec_id
LIMIT 10
"""


def q_embedding_neardup(sf_dir: str):
    """Near-duplicate pairs by cosine >= 0.4 within label blocks.

    Exact (hash-exact oracle) but skew-bounded: rows are hashed into
    per-label chunks and every chunk pair is one bounded task
    (``blocked_cosine_pairs``, stages/ann.py) — a hot label distributes
    over its chunk pairs instead of becoming one unbounded matmul."""
    rd = _rd()
    from odinson_ray.stages.ann import blocked_cosine_pairs

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "label", "embedding"])
    pairs = blocked_cosine_pairs(ds, key_col="label", id_col="vec_id",
                                 vec_col="embedding", threshold=0.4)
    return pairs.map_batches(
        lambda t: t.set_column(t.column_names.index("label"), "label",
                               pc.cast(t["label"], pa.int64())),
        batch_format="pyarrow",
    )


ORACLE_EMBEDDING_NEARDUP = """
SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.label AS label
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.4
"""


# ===================================================================== odinson patterns

def _mention_rows(sf_dir: str, rules_yaml: str, label: str):
    from .kg import mentions_dataset

    ds = mentions_dataset(sf_dir, rules_yaml)
    return ds.map_batches(
        lambda t: t.filter(pc.equal(t["label"], label)).select(
            ["doc_id", "sent_id", "start", "end", "text"]
        ),
        batch_format="pyarrow",
    )


BIGRAM_RULES = """
rules:
  - name: bigram
    label: Bigram
    type: basic
    pattern: "[raw=spark] [raw=join]"
"""


def q_odinson_bigram(sf_dir: str):
    """Token-sequence pattern over the interleaved corpus: exact positional
    oracle via a tokens-with-ordinality self-join."""
    return _mention_rows(sf_dir, BIGRAM_RULES, "Bigram")


ORACLE_ODINSON_BIGRAM = """
WITH toks AS (
  SELECT printf('doc-%06d', doc_id) AS doc_id, doc_id AS did,
         unnest(string_split(text, ' ')) AS tok,
         unnest(generate_series(1, len(string_split(text, ' ')))) AS p
  FROM documents
),
postoks AS (
  SELECT doc_id, did, tok, p,
         CAST(((p - 1) // 20) AS INT) AS sent_id,
         CAST(((p - 1) % 20) AS INT) AS l
  FROM toks
)
SELECT a.doc_id, a.sent_id, a.l AS "start", a.l + 2 AS "end",
       a.tok || ' ' || b.tok AS text
FROM postoks a JOIN postoks b
  ON a.did = b.did AND b.p = a.p + 1 AND b.sent_id = a.sent_id
WHERE a.tok = 'spark' AND b.tok = 'join'
"""


TECH_RUN_RULES = """
rules:
  - name: tech-entity
    label: Tech
    type: basic
    pattern: "[entity=B-TECH]+"
"""


def q_odinson_tech_runs(sf_dir: str):
    """Greedy entity-run extraction == maximal islands of B-TECH tokens."""
    ds = _mention_rows(sf_dir, TECH_RUN_RULES, "Tech")
    return ds.map_batches(
        lambda t: t.select(["doc_id", "sent_id", "start", "end"]), batch_format="pyarrow"
    )


ORACLE_ODINSON_TECH_RUNS = """
WITH toks AS (
  SELECT printf('doc-%06d', doc_id) AS doc_id, doc_id AS did,
         unnest(string_split(text, ' ')) AS tok,
         unnest(generate_series(1, len(string_split(text, ' ')))) AS p
  FROM documents
),
postoks AS (
  SELECT doc_id, did, tok, p,
         CAST(((p - 1) // 20) AS INT) AS sent_id,
         CAST(((p - 1) % 20) AS INT) AS l
  FROM toks
)
, tech AS (
  SELECT doc_id, sent_id, l,
         l - row_number() OVER (PARTITION BY doc_id, sent_id ORDER BY l) AS island
  FROM postoks WHERE tok = 'spark'
)
SELECT doc_id, sent_id, CAST(min(l) AS INT) AS "start", CAST(max(l) + 1 AS INT) AS "end"
FROM tech GROUP BY doc_id, sent_id, island
"""


SVO_RULES = """
rules:
  - name: svo
    label: SVO
    type: event
    pattern: |
      trigger = [tag=VB]
      subject = >nsubj []
      object = >dobj []
"""


def _svo_project(t: pa.Table) -> pa.Table:
    t = t.filter(pc.equal(t["label"], "SVO"))
    args_col = t["args"].to_pylist()
    subj, obj = [], []
    for args in args_col:
        subj.append(next(a["text"] for a in args if a["name"] == "subject"))
        obj.append(next(a["text"] for a in args if a["name"] == "object"))
    return pa.Table.from_pydict(
        {
            "doc_id": t["doc_id"],
            "sent_id": t["sent_id"],
            "start": t["start"],
            "subj": pa.array(subj, pa.string()),
            "pred": t["text"],
            "obj": pa.array(obj, pa.string()),
        }
    )


def q_odinson_svo(sf_dir: str):
    """Event extraction over the deterministic dependency groups: the
    oracle recomputes (head, nsubj-child, dobj-child) by position."""
    from .kg import mentions_dataset

    ds = mentions_dataset(sf_dir, SVO_RULES)
    return ds.map_batches(_svo_project, batch_format="pyarrow")


ORACLE_ODINSON_SVO = """
WITH toks AS (
  SELECT printf('doc-%06d', doc_id) AS doc_id, doc_id AS did,
         unnest(string_split(text, ' ')) AS tok,
         unnest(generate_series(1, len(string_split(text, ' ')))) AS p
  FROM documents
),
postoks AS (
  SELECT doc_id, did, tok, p,
         CAST(((p - 1) // 20) AS INT) AS sent_id,
         CAST(((p - 1) % 20) AS INT) AS l
  FROM toks
)
SELECT a.doc_id, a.sent_id, a.l AS "start",
       b.tok AS subj, a.tok AS pred, c.tok AS obj
FROM postoks a JOIN postoks b ON b.did = a.did AND b.p = a.p + 1
               JOIN postoks c ON c.did = a.did AND c.p = a.p + 2
WHERE a.l % 5 = 0 AND a.tok IN ('scan', 'join', 'sort', 'merge', 'filter', 'group')
"""


def q_odinson_svo_two_stage(sf_dir: str):
    """The two-stage (annotate-pool -> matcher-pool) topology with a
    model-backed annotator stand-in: a large lexicon loads once per
    annotator actor (__init__), the annotated sentences column ships
    through the object store, and the matcher pool consumes it without
    re-annotating. Oracle identical to odinson_svo — the topology change
    must not change one row."""
    import ray

    from odinson_ray.sources.interleaved import read_interleaved
    from odinson_ray.stages.annotate import HeavyLexiconAnnotator, annotate_stage
    from odinson_ray.stages.match import match_stage

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    pool = max(1, cpus // 4)  # two pools + read/consume headroom
    docs = read_interleaved(sf_dir)
    annotated = annotate_stage(docs, HeavyLexiconAnnotator, concurrency=pool)
    mentions = match_stage(annotated, SVO_RULES, concurrency=pool)
    return mentions.map_batches(_svo_project, batch_format="pyarrow")


def q_kg_triples(sf_dir: str):
    """Flagship: aggregated canonical triples."""
    from .kg import triples_dataset

    return triples_dataset(sf_dir)


_CANON_SQL = (
    "CASE WHEN len({c}) > 3 AND {c} LIKE '%s' AND {c} NOT LIKE '%ss' "
    "THEN substr({c}, 1, len({c}) - 1) ELSE {c} END"
)

ORACLE_KG_TRIPLES = f"""
WITH toks AS (
  SELECT printf('doc-%06d', doc_id) AS doc_id, doc_id AS did,
         unnest(string_split(text, ' ')) AS tok,
         unnest(generate_series(1, len(string_split(text, ' ')))) AS p
  FROM documents
),
postoks AS (
  SELECT doc_id, did, tok, p,
         CAST(((p - 1) // 20) AS INT) AS sent_id,
         CAST(((p - 1) % 20) AS INT) AS l
  FROM toks
)
, raw AS (
  SELECT b.tok AS subj, a.tok AS pred, c.tok AS obj
  FROM postoks a JOIN postoks b ON b.did = a.did AND b.p = a.p + 1
                 JOIN postoks c ON c.did = a.did AND c.p = a.p + 2
  WHERE a.l % 5 = 0 AND a.tok IN ('scan', 'join', 'sort', 'merge', 'filter', 'group')
)
SELECT 'ent:' || {_CANON_SQL.format(c='subj')} AS subj_canon,
       pred,
       'ent:' || {_CANON_SQL.format(c='obj')} AS obj_canon,
       subj, obj, count(*) AS n
FROM raw GROUP BY 1, 2, 3, 4, 5
"""


def q_spans_roundtrip(sf_dir: str):
    """The per-row span-sequence invariant, surfaced as a query: the
    interleaved table exploded to (doc_id, offset, kind, text, media_ref);
    the oracle re-derives the exact interleaving from documents."""
    rd = _rd()
    from odinson_ray.sources.interleaved import read_interleaved

    def explode(t: pa.Table) -> pa.Table:
        spans = t["spans"]
        flat = pc.list_flatten(spans).combine_chunks()
        parents = pc.list_parent_indices(spans)
        doc_ids = pc.take(t["doc_id"], parents)
        return pa.Table.from_pydict(
            {
                "doc_id": doc_ids,
                "offset": flat.field("offset"),
                "kind": flat.field("kind"),
                "text": flat.field("text"),
                "media_ref": flat.field("media_ref"),
            }
        )

    return read_interleaved(sf_dir).map_batches(explode, batch_format="pyarrow")


ORACLE_SPANS_ROUNDTRIP = """
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         CAST(ceil(len(string_split(text, ' ')) / 20.0) AS INT) AS n_sent
  FROM documents
),
sent_idx AS (
  SELECT doc_id, t, n_sent, unnest(generate_series(1, n_sent)) AS i FROM base
),
text_spans AS (
  SELECT printf('doc-%06d', doc_id) AS doc_id,
         CAST(i - 1 + (CASE WHEN doc_id % 5 = 0 AND i > 1 THEN 1 ELSE 0 END) AS INT) AS "offset",
         'text' AS kind,
         array_to_string(t[(20 * (i - 1) + 1):(20 * i)], ' ') AS text,
         '' AS media_ref
  FROM sent_idx
),
image_spans AS (
  SELECT printf('doc-%06d', doc_id) AS doc_id, CAST(1 AS INT) AS "offset",
         'image' AS kind, '' AS text, 'media://img/' || doc_id AS media_ref
  FROM base WHERE doc_id % 5 = 0
),
audio_spans AS (
  SELECT printf('doc-%06d', doc_id) AS doc_id,
         CAST(n_sent + (CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) AS INT) AS "offset",
         'audio' AS kind, '' AS text, 'media://aud/' || doc_id AS media_ref
  FROM base WHERE doc_id % 11 = 0
)
SELECT * FROM text_spans
UNION ALL SELECT * FROM image_spans
UNION ALL SELECT * FROM audio_spans
"""


def q_media_manifest(sf_dir: str):
    """Media spans only (multimodal passthrough manifest)."""
    rd = _rd()
    from odinson_ray.sources.interleaved import read_interleaved

    def explode_media(t: pa.Table) -> pa.Table:
        spans = t["spans"]
        flat = pc.list_flatten(spans).combine_chunks()
        parents = pc.list_parent_indices(spans)
        doc_ids = pc.take(t["doc_id"], parents)
        tbl = pa.Table.from_pydict(
            {
                "doc_id": doc_ids,
                "kind": flat.field("kind"),
                "media_ref": flat.field("media_ref"),
            }
        )
        return tbl.filter(pc.not_equal(tbl["kind"], "text"))

    return read_interleaved(sf_dir).map_batches(explode_media, batch_format="pyarrow")


ORACLE_MEDIA_MANIFEST = """
SELECT printf('doc-%06d', doc_id) AS doc_id, 'image' AS kind,
       'media://img/' || doc_id AS media_ref
FROM documents WHERE doc_id % 5 = 0
UNION ALL
SELECT printf('doc-%06d', doc_id) AS doc_id, 'audio' AS kind,
       'media://aud/' || doc_id AS media_ref
FROM documents WHERE doc_id % 11 = 0
"""


# ===================================================================== registry

QUERIES = {
    "lineitem_agg": q_lineitem_agg,
    "top_orders": q_top_orders,
    "revenue_by_nation": q_revenue_by_nation,
    "distinct_flags": q_distinct_flags,
    "union_nation_keys": q_union_nation_keys,
    "filter_revenue": q_filter_revenue,
    "events_by_type": q_events_by_type,
    "sessionize": q_sessionize,
    "running_total": q_running_total,
    "token_count": q_token_count,
    "quality_score": q_quality_score,
    "lang_counts": q_lang_counts,
    "fingerprint": q_fingerprint,
    "dedup_exact": q_dedup_exact,
    "ann_topk": q_ann_topk,
    "embedding_neardup": q_embedding_neardup,
    "odinson_bigram": q_odinson_bigram,
    "odinson_tech_runs": q_odinson_tech_runs,
    "odinson_svo": q_odinson_svo,
    "odinson_svo_two_stage": q_odinson_svo_two_stage,
    "kg_triples": q_kg_triples,
    "spans_roundtrip": q_spans_roundtrip,
    "media_manifest": q_media_manifest,
}

ORACLES = {
    "lineitem_agg": ORACLE_LINEITEM_AGG,
    "top_orders": ORACLE_TOP_ORDERS,
    "revenue_by_nation": ORACLE_REVENUE_BY_NATION,
    "distinct_flags": ORACLE_DISTINCT_FLAGS,
    "union_nation_keys": ORACLE_UNION_NATION_KEYS,
    "filter_revenue": ORACLE_FILTER_REVENUE,
    "events_by_type": ORACLE_EVENTS_BY_TYPE,
    "sessionize": ORACLE_SESSIONIZE,
    "running_total": ORACLE_RUNNING_TOTAL,
    "token_count": ORACLE_TOKEN_COUNT,
    "quality_score": ORACLE_QUALITY_SCORE,
    "lang_counts": ORACLE_LANG_COUNTS,
    "fingerprint": ORACLE_FINGERPRINT,
    "dedup_exact": ORACLE_DEDUP_EXACT,
    "ann_topk": ORACLE_ANN_TOPK,
    "embedding_neardup": ORACLE_EMBEDDING_NEARDUP,
    "odinson_bigram": ORACLE_ODINSON_BIGRAM,
    "odinson_tech_runs": ORACLE_ODINSON_TECH_RUNS,
    "odinson_svo": ORACLE_ODINSON_SVO,
    "odinson_svo_two_stage": ORACLE_ODINSON_SVO,
    "kg_triples": ORACLE_KG_TRIPLES,
    "spans_roundtrip": ORACLE_SPANS_ROUNDTRIP,
    "media_manifest": ORACLE_MEDIA_MANIFEST,
}


# ===================================================================== dedup suite

def q_minhash_neardup(sf_dir: str):
    """MinHash+LSH near-dup pairs, exact-jaccard verified at >= 0.9.
    The banding parameters make a miss at j>=0.9 practically impossible,
    so the oracle is the exact all-pairs jaccard >= 0.9 set."""
    from odinson_ray.stages.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(sf_dir, threshold=0.9)


ORACLE_MINHASH_NEARDUP = """
WITH sh AS (
  SELECT doc_id, list_distinct(list_transform(generate_series(1, greatest(len(t) - 2, 1)),
         i -> t[i] || CASE WHEN t[i+1] IS NULL THEN '' ELSE ' ' || t[i+1] END
                   || CASE WHEN t[i+2] IS NULL THEN '' ELSE ' ' || t[i+2] END)) AS shingles
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       round(len(list_intersect(a.shingles, b.shingles)) * 1.0 /
             len(list_distinct(list_concat(a.shingles, b.shingles))), 6) AS j
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.shingles, b.shingles)) * 1.0 /
      len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.9
"""


def q_ngram_jaccard(sf_dir: str):
    """Exact 3-gram jaccard pairs within source blocks at >= 0.3."""
    from odinson_ray.stages.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(sf_dir, threshold=0.3, block_col="source")


ORACLE_NGRAM_JACCARD = """
WITH sh AS (
  SELECT doc_id, source,
         list_distinct(list_transform(generate_series(1, greatest(len(t) - 2, 1)),
         i -> t[i] || CASE WHEN t[i+1] IS NULL THEN '' ELSE ' ' || t[i+1] END
                   || CASE WHEN t[i+2] IS NULL THEN '' ELSE ' ' || t[i+2] END)) AS shingles
  FROM (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents)
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       round(len(list_intersect(a.shingles, b.shingles)) * 1.0 /
             len(list_distinct(list_concat(a.shingles, b.shingles))), 6) AS j
FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE len(list_intersect(a.shingles, b.shingles)) * 1.0 /
      len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.3
"""


def q_simhash_neardup(sf_dir: str):
    """SimHash near-dup pairs (Hamming <= 6), fully distributed (block-row
    groupby + pairwise verify + Min-dedup). The oracle re-derives the exact
    64-bit simhash in SQL (DuckDB md5_number_upper == the little-endian
    first 8 digest bytes the Python side uses) and cross-joins on
    bit_count(xor) <= 6 — exact because 8x8-bit blocking has perfect
    recall for Hamming <= 7."""
    from odinson_ray.stages.dedup import simhash_pairs

    return simhash_pairs(sf_dir, max_hamming=6)


ORACLE_SIMHASH_NEARDUP = """
WITH toks AS (
  SELECT doc_id, tok, count(*) AS cnt
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE text IS NOT NULL AND text <> '')
  GROUP BY doc_id, tok
),
bits AS (
  SELECT t.doc_id, i.i,
         SUM(t.cnt * (CASE WHEN (md5_number_upper(t.tok) >> (8*(i.i//8) + 7 - (i.i%8))) & 1 = 1
                           THEN 1 ELSE -1 END)) AS acc
  FROM toks t CROSS JOIN (SELECT unnest(generate_series(0,63)) AS i) i
  GROUP BY t.doc_id, i.i
),
sig AS (
  SELECT doc_id, CAST(SUM(CASE WHEN acc > 0 THEN (1::HUGEINT << i) ELSE 0 END) AS UBIGINT) AS h
  FROM bits GROUP BY doc_id
),
allsig AS (
  SELECT d.doc_id, COALESCE(s.h, 0) AS h
  FROM documents d LEFT JOIN sig s ON d.doc_id = s.doc_id
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming
FROM allsig a JOIN allsig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.h, b.h)) <= 6
"""


def q_langid(sf_dir: str):
    """Heuristic language ID by function-word profiles. Over this corpus
    the decision reduces to: any en function word -> 'en', else the first
    profile in sorted order ('de') — which is what the oracle encodes."""
    rd = _rd()

    from odinson_ray.stages.text import langid_batch

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).map_batches(
        langid_batch, batch_format="pyarrow"
    )


ORACLE_LANGID = """
SELECT doc_id,
       CASE WHEN len(list_filter(string_split(text, ' '),
                                 x -> x IN ('the', 'a', 'of', 'and', 'to', 'in', 'is'))) > 0
            THEN 'en' ELSE 'de' END AS lang_pred
FROM documents
"""


def q_media_features(sf_dir: str):
    """Media decode stub features via the actor-pool stage; the oracle
    re-derives the deterministic stub formula."""
    from odinson_ray.stages.media import media_features

    return media_features(sf_dir)


ORACLE_MEDIA_FEATURES = """
WITH media AS (
  SELECT printf('doc-%06d', doc_id) AS doc_id,
         'media://img/' || doc_id AS media_ref, 'image' AS kind
  FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT printf('doc-%06d', doc_id), 'media://aud/' || doc_id, 'audio'
  FROM documents WHERE doc_id % 11 = 0
),
scored AS (
  SELECT *, list_sum(list_transform(string_split(media_ref, ''), x -> ascii(x))) AS n
  FROM media
)
SELECT doc_id, media_ref, kind,
       CAST(CASE WHEN kind = 'image' THEN 64 + (n % 64) * 16 ELSE 0 END AS INT) AS width,
       CAST(CASE WHEN kind = 'image' THEN 64 + (n % 48) * 16 ELSE 0 END AS INT) AS height,
       CAST(CASE WHEN kind = 'image' THEN 0 ELSE 1 + n % 300 END AS DOUBLE) AS duration_s
FROM scored
"""


def q_ann_lsh_topk(sf_dir: str):
    """LSH-bucketed approximate top-k (scale path): reads only the probe
    partitions of the persisted bucket-partitioned parquet layout, so
    query cost is independent of corpus size. No SQL oracle — rows-only
    driver check; recall vs brute force asserted in pytest."""
    from odinson_ray.stages.ann import lsh_topk

    return lsh_topk(sf_dir, _query_vec(sf_dir), k=10)


def q_ann_ivf_topk(sf_dir: str):
    """IVF-bucketed approximate top-k: lists are Voronoi cells of
    distributed-k-means centroids (stages/ann.py build_ivf_layout);
    queries probe only the nprobe nearest lists. No SQL oracle —
    rows-only driver check; recall vs brute force asserted in pytest."""
    from odinson_ray.stages.ann import ivf_topk

    return ivf_topk(sf_dir, _query_vec(sf_dir), k=10)


def q_odinson_svo_filtered(sf_dir: str):
    """SVO events gated by a metadata filter (lang == 'en'): the reference's
    parent-document metadata filtering as a vectorized per-doc predicate."""
    from .kg import mentions_dataset

    rules = """
metadataFilters: "lang == 'en'"
rules:
  - name: svo
    label: SVO
    type: event
    pattern: |
      trigger = [tag=VB]
      subject = >nsubj []
      object = >dobj []
"""
    ds = mentions_dataset(sf_dir, rules)

    def project(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["label"], "SVO"))
        args_col = t["args"].to_pylist()
        subj, obj = [], []
        for args in args_col:
            subj.append(next(a["text"] for a in args if a["name"] == "subject"))
            obj.append(next(a["text"] for a in args if a["name"] == "object"))
        return pa.Table.from_pydict(
            {
                "doc_id": t["doc_id"],
                "sent_id": t["sent_id"],
                "start": t["start"],
                "subj": pa.array(subj, pa.string()),
                "pred": t["text"],
                "obj": pa.array(obj, pa.string()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


ORACLE_ODINSON_SVO_FILTERED = """
WITH toks AS (
  SELECT printf('doc-%06d', doc_id) AS doc_id, doc_id AS did,
         unnest(string_split(text, ' ')) AS tok,
         unnest(generate_series(1, len(string_split(text, ' ')))) AS p
  FROM documents WHERE lang = 'en'
),
postoks AS (
  SELECT doc_id, did, tok, p,
         CAST(((p - 1) // 20) AS INT) AS sent_id,
         CAST(((p - 1) % 20) AS INT) AS l
  FROM toks
)
SELECT a.doc_id, a.sent_id, a.l AS "start",
       b.tok AS subj, a.tok AS pred, c.tok AS obj
FROM postoks a JOIN postoks b ON b.did = a.did AND b.p = a.p + 1
               JOIN postoks c ON c.did = a.did AND c.p = a.p + 2
WHERE a.l % 5 = 0 AND a.tok IN ('scan', 'join', 'sort', 'merge', 'filter', 'group')
"""


QUERIES.update(
    {
        "minhash_neardup": q_minhash_neardup,
        "ngram_jaccard": q_ngram_jaccard,
        "simhash_neardup": q_simhash_neardup,
        "langid": q_langid,
        "media_features": q_media_features,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "odinson_svo_filtered": q_odinson_svo_filtered,
    }
)

ORACLES.update(
    {
        "minhash_neardup": ORACLE_MINHASH_NEARDUP,
        "ngram_jaccard": ORACLE_NGRAM_JACCARD,
        "simhash_neardup": ORACLE_SIMHASH_NEARDUP,
        "langid": ORACLE_LANGID,
        "media_features": ORACLE_MEDIA_FEATURES,
        "odinson_svo_filtered": ORACLE_ODINSON_SVO_FILTERED,
    }
)


# ===================================================================== more relational ops

def q_tumbling_window(sf_dir: str):
    """Tumbling 1-hour windows per user over the event stream."""
    rd = _rd()
    from ray.data.aggregate import Count, Sum

    def add_window(t: pa.Table) -> pa.Table:
        win = pc.floor_temporal(t["ts"], unit="hour")
        return pa.Table.from_pydict(
            {"user_id": t["user_id"], "window_start": win, "value": t["value"]}
        )

    out = (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])
        .map_batches(add_window, batch_format="pyarrow")
        .groupby(["user_id", "window_start"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="total_value"))
        .to_pandas()
    )
    out["total_value"] = out["total_value"].round(2)
    return out


ORACLE_TUMBLING_WINDOW = """
SELECT user_id, date_trunc('hour', ts) AS window_start,
       count(*) AS n, round(sum(value), 2) AS total_value
FROM events GROUP BY user_id, date_trunc('hour', ts)
"""


def q_window_value_salted(sf_dir: str):
    """Total value per 1-hour tumbling window across ALL users — the
    window key is genuinely hot (every user's events land in the same
    handful of hourly keys), so this routes through salted_aggregate:
    stage 1 spreads each window over 8 sub-keys, stage 2 merges <= 8
    partials per window (VERDICT r02 "What's wrong" #7)."""
    rd = _rd()
    from ..stages.shuffle import salted_aggregate

    def add_window(t: pa.Table) -> pa.Table:
        win = pc.floor_temporal(t["ts"], unit="hour")
        return pa.Table.from_pydict({"window_start": win, "value": t["value"]})

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"]).map_batches(
        add_window, batch_format="pyarrow"
    )
    out = salted_aggregate(ds, "window_start", "value", salt=8).to_pandas()
    out["total_value"] = out.pop("total").round(2)
    return out


ORACLE_WINDOW_VALUE_SALTED = """
SELECT date_trunc('hour', ts) AS window_start, round(sum(value), 2) AS total_value
FROM events GROUP BY date_trunc('hour', ts)
"""


def q_topk_per_group(sf_dir: str):
    """Top-2 orders per customer by total price (per-group top-k), with a
    per-batch combiner: each batch keeps <= 2 rows per customer before
    the shuffle, so a hot customer contributes at most 2 x num_batches
    rows to its reducer (never its full order history)."""
    rd = _rd()
    from odinson_ray.stages.shuffle import grouped_topk

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_orderkey", "o_totalprice"])
    out = grouped_topk(ds, "o_custkey", ["o_totalprice", "o_orderkey"],
                       [True, False], 2)
    return out.map_batches(
        lambda t: t.select(["o_custkey", "o_orderkey", "o_totalprice"]),
        batch_format="pyarrow",
    )


ORACLE_TOPK_PER_GROUP = """
SELECT o_custkey, o_orderkey, o_totalprice
FROM orders
QUALIFY row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey) <= 2
"""


def q_distinct_users_per_type(sf_dir: str):
    """count(distinct key) per group via distinct-pairs combiner then a
    small groupby (two-stage exact distinct count)."""
    rd = _rd()
    from ray.data.aggregate import Count

    def distinct_pairs(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
        .map_batches(distinct_pairs, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .aggregate(Count(alias_name="_n"))
    )
    return (
        pairs.map_batches(lambda t: t.select(["event_type"]), batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Count(alias_name="n_users"))
    )


ORACLE_DISTINCT_USERS_PER_TYPE = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


def q_asof_join(sf_dir: str):
    """As-of join: each event matched to the latest order of the same
    customer placed at or before the event time.

    Skew-safe two-stage (key, time-bucket) decomposition + vectorized
    per-bucket searchsorted — stages/window.asof_join_latest (VERDICT
    r03 #4 closed; previously a single-stage groupby(user_id) put a hot
    user's entire event+order history in one task with a per-event
    Python loop). Week buckets: o_orderdate is day-granular and spans
    years, so day buckets would make per-bucket groups needlessly tiny."""
    from odinson_ray.stages.window import asof_join_latest

    rd = _rd()

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderkey", "o_orderdate"]
    ).map_batches(
        lambda t: pa.table({
            "user_id": pc.cast(t["o_custkey"], pa.int64()),
            "ts": pc.cast(t["o_orderdate"], pa.timestamp("us")),
            "id": pc.cast(t["o_orderkey"], pa.int64()),
        }),
        batch_format="pyarrow")
    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    ).map_batches(
        lambda t: pa.table({
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "ts": pc.cast(t["ts"], pa.timestamp("us")),
        }),
        batch_format="pyarrow")
    return asof_join_latest(events, orders, key="user_id", ts="ts",
                            ev_id="event_id", ord_id="id",
                            out="last_orderkey", bucket_s=30 * 86400)


ORACLE_ASOF_JOIN = """
SELECT event_id, user_id, o_orderkey AS last_orderkey FROM (
  SELECT e.event_id, e.user_id, o.o_orderkey,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e JOIN orders o
    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
) WHERE rn = 1
"""


QUERIES.update(
    {
        "tumbling_window": q_tumbling_window,
        "window_value_salted": q_window_value_salted,
        "topk_per_group": q_topk_per_group,
        "distinct_users_per_type": q_distinct_users_per_type,
        "asof_join": q_asof_join,
    }
)

ORACLES.update(
    {
        "tumbling_window": ORACLE_TUMBLING_WINDOW,
        "window_value_salted": ORACLE_WINDOW_VALUE_SALTED,
        "topk_per_group": ORACLE_TOPK_PER_GROUP,
        "distinct_users_per_type": ORACLE_DISTINCT_USERS_PER_TYPE,
        "asof_join": ORACLE_ASOF_JOIN,
    }
)


def q_odinson_svo_dated(sf_dir: str):
    """SVO events gated by date + numeric metadata filters (DateField /
    NumberField semantics: chained comparisons, date() literals)."""
    from .kg import mentions_dataset

    rules = """
metadataFilters: "pub_date >= date(2021) && 20 < citations <= 90"
rules:
  - name: svo
    label: SVO
    type: event
    pattern: |
      trigger = [tag=VB]
      subject = >nsubj []
      object = >dobj []
"""
    ds = mentions_dataset(sf_dir, rules)

    def project(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["label"], "SVO"))
        return t.select(["doc_id", "sent_id", "start", "text"])

    return ds.map_batches(project, batch_format="pyarrow")


ORACLE_ODINSON_SVO_DATED = """
WITH eligible AS (
  SELECT doc_id, text FROM documents
  WHERE (DATE '2020-01-01' + INTERVAL ((doc_id % 1000)) DAY) >= DATE '2021-01-01'
    AND ((doc_id * 7) % 100) > 20 AND ((doc_id * 7) % 100) <= 90
),
toks AS (
  SELECT printf('doc-%06d', doc_id) AS doc_id, doc_id AS did,
         unnest(string_split(text, ' ')) AS tok,
         unnest(generate_series(1, len(string_split(text, ' ')))) AS p
  FROM eligible
),
postoks AS (
  SELECT doc_id, did, tok, p,
         CAST(((p - 1) // 20) AS INT) AS sent_id,
         CAST(((p - 1) % 20) AS INT) AS l
  FROM toks
)
SELECT a.doc_id, a.sent_id, a.l AS "start", a.tok AS text
FROM postoks a JOIN postoks b ON b.did = a.did AND b.p = a.p + 1
               JOIN postoks c ON c.did = a.did AND c.p = a.p + 2
WHERE a.l % 5 = 0 AND a.tok IN ('scan', 'join', 'sort', 'merge', 'filter', 'group')
"""

QUERIES["odinson_svo_dated"] = q_odinson_svo_dated
ORACLES["odinson_svo_dated"] = ORACLE_ODINSON_SVO_DATED


# ===================================================================== curation ops (round 2)

def q_stratified_sample(sf_dir: str):
    """Deterministic hash-based per-language sampling (no RNG, no shuffle:
    membership is a pure function of doc_id, so the sample is reproducible
    and resumable at any cluster size)."""
    from odinson_ray.stages.sample import stratified_sample

    return stratified_sample(sf_dir, rates={"en": 5}, default_tenths=2)


ORACLE_STRATIFIED_SAMPLE = """
SELECT doc_id, lang, text
FROM documents
WHERE (doc_id * 2654435761) % 4294967296 % 10
      < CASE WHEN lang = 'en' THEN 5 ELSE 2 END
"""


def q_scrub_pii(sf_dir: str):
    """PII redaction via Arrow RE2 kernels; oracle applies the identical
    patterns with DuckDB's RE2 regexp_replace."""
    from odinson_ray.stages.text import scrub_pii

    return scrub_pii(sf_dir)


ORACLE_SCRUB_PII = r"""
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
         '\b\d{6,}\b', '[NUM]', 'g') AS clean_text,
       regexp_replace(
         regexp_replace(
           regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
         '\b\d{6,}\b', '[NUM]', 'g') <> text AS redacted
FROM documents
"""


def q_kmeans_clusters(sf_dir: str):
    """Distributed Lloyd k-means over embeddings (k=8, one refinement):
    broadcast centroids, vectorized per-batch assignment, k-sized partial
    sums — the oracle unrolls the same two assignment rounds in SQL."""
    from odinson_ray.stages.sample import kmeans_assign

    return kmeans_assign(sf_dir, k=8, refinements=1)


ORACLE_KMEANS_CLUSTERS = """
WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
),
c0 AS (
  SELECT vec_id AS cluster, e AS c FROM emb WHERE vec_id < 8
),
a1 AS (
  SELECT vec_id, cluster FROM (
    SELECT emb.vec_id, c0.cluster,
           row_number() OVER (PARTITION BY emb.vec_id
                              ORDER BY list_distance(emb.e, c0.c), c0.cluster) AS rn
    FROM emb CROSS JOIN c0
  ) WHERE rn = 1
),
means AS (
  SELECT cluster, i, avg(v) AS m FROM (
    SELECT a1.cluster,
           unnest(emb.e) AS v,
           unnest(generate_series(1, len(emb.e))) AS i
    FROM a1 JOIN emb USING (vec_id)
  ) GROUP BY cluster, i
),
c1 AS (
  SELECT cluster, list(m ORDER BY i) AS c FROM means GROUP BY cluster
)
SELECT vec_id, cluster FROM (
  SELECT emb.vec_id, c1.cluster,
         row_number() OVER (PARTITION BY emb.vec_id
                            ORDER BY list_distance(emb.e, c1.c), c1.cluster) AS rn
  FROM emb CROSS JOIN c1
) WHERE rn = 1
"""


QUERIES.update(
    {
        "stratified_sample": q_stratified_sample,
        "scrub_pii": q_scrub_pii,
        "kmeans_clusters": q_kmeans_clusters,
    }
)

ORACLES.update(
    {
        "stratified_sample": ORACLE_STRATIFIED_SAMPLE,
        "scrub_pii": ORACLE_SCRUB_PII,
        "kmeans_clusters": ORACLE_KMEANS_CLUSTERS,
    }
)


def q_neardup_groups(sf_dir: str):
    """Near-dup grouping: MinHash pairs -> distributed connected
    components -> (doc_id, group_id = min doc_id of the cluster); the
    keep-one-per-cluster dedup primitive. Oracle: transitive closure via
    recursive CTE over the exact-jaccard pair set."""
    from odinson_ray.stages.dedup import neardup_groups

    return neardup_groups(sf_dir, threshold=0.9)


ORACLE_NEARDUP_GROUPS = """
WITH RECURSIVE sh AS (
  SELECT doc_id, list_distinct(list_transform(generate_series(1, greatest(len(t) - 2, 1)),
         i -> t[i] || CASE WHEN t[i+1] IS NULL THEN '' ELSE ' ' || t[i+1] END
                   || CASE WHEN t[i+2] IS NULL THEN '' ELSE ' ' || t[i+2] END)) AS shingles
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
),
pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.shingles, b.shingles)) * 1.0 /
        len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.9
),
edges AS (
  SELECT a_id AS u, b_id AS v FROM pairs
  UNION
  SELECT b_id AS u, a_id AS v FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
comp AS (
  SELECT u AS doc_id, least(u, min(v)) AS grp FROM reach GROUP BY u
)
SELECT d.doc_id, CAST(COALESCE(c.grp, d.doc_id) AS BIGINT) AS group_id
FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
"""


QUERIES["neardup_groups"] = q_neardup_groups
ORACLES["neardup_groups"] = ORACLE_NEARDUP_GROUPS


def q_video_frames(sf_dir: str):
    """Video frame sampling (multimodal stub): deterministic manifest ->
    actor-pool frame expansion (1 fps, max 8 frames); the oracle re-derives
    the stub duration formula and unrolls the frame series in SQL."""
    from odinson_ray.stages.media import video_frames

    return video_frames(sf_dir)


ORACLE_VIDEO_FRAMES = """
WITH vids AS (
  SELECT printf('doc-%06d', doc_id) AS doc_id,
         'media://vid/' || doc_id AS media_ref
  FROM documents WHERE doc_id % 7 = 0
),
scored AS (
  SELECT *, list_sum(list_transform(string_split(media_ref, ''), x -> ascii(x))) AS n
  FROM vids
),
framed AS (
  SELECT doc_id, media_ref,
         least(8, CAST(floor(1 + n % 300) AS INT)) AS n_frames
  FROM scored
)
SELECT doc_id, media_ref,
       CAST(i - 1 AS INT) AS frame_idx,
       round((i - 1) * 1.0, 6) AS t_s
FROM framed, unnest(generate_series(1, n_frames)) AS t(i)
"""


QUERIES["video_frames"] = q_video_frames
ORACLES["video_frames"] = ORACLE_VIDEO_FRAMES


def q_sliding_window(sf_dir: str):
    """Sliding 2-hour windows hopping hourly per event type: each event
    expands to its two covering windows inside map_batches (vectorized),
    then one groupby — the flat-map + aggregate shape for hop < width."""
    rd = _rd()
    from ray.data.aggregate import Count, Sum

    def expand(t: pa.Table) -> pa.Table:
        base = pc.floor_temporal(t["ts"], unit="hour")
        hour = pa.scalar(3600_000_000, pa.duration("us"))
        parts = []
        for k in (0, 1):
            win = base if k == 0 else pc.subtract(base, hour)
            parts.append(pa.table({
                "event_type": t["event_type"],
                "window_start": win.cast(pa.timestamp("us")),
                "value": t["value"],
            }))
        return pa.concat_tables(parts)

    out = (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"])
        .map_batches(expand, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="total_value"))
        .to_pandas()
    )
    out["total_value"] = out["total_value"].round(2)
    return out


ORACLE_SLIDING_WINDOW = """
SELECT event_type, window_start, count(*) AS n, round(sum(value), 2) AS total_value
FROM (
  SELECT event_type, value,
         date_trunc('hour', ts) - k * INTERVAL 1 HOUR AS window_start
  FROM events, unnest([0, 1]) AS t(k)
)
GROUP BY event_type, window_start
"""


QUERIES["sliding_window"] = q_sliding_window
ORACLES["sliding_window"] = ORACLE_SLIDING_WINDOW


def q_customers_no_orders(sf_dir: str):
    """Customers with no order above 300k — distributed ANTI join
    (stages/shuffle.hash_join how='anti': left rows whose key group has
    no right rows; NOT EXISTS semantics). The right side is filtered and
    projected to its key column only before the shuffle."""
    rd = _rd()
    from odinson_ray.stages.shuffle import hash_join

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"])
    big = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], 300000.0)).select(["o_custkey"]),
        batch_format="pyarrow",
    )
    return hash_join(
        cust, big, on="c_custkey", right_on="o_custkey", how="anti",
        left_schema=pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string())]),
        right_schema=pa.schema([("o_custkey", pa.int64())]),
    )


ORACLE_CUSTOMERS_NO_ORDERS = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
"""


def q_customers_with_orders(sf_dir: str):
    """Customers with >= 1 order — distributed SEMI join (each left row
    emitted once, no cross product, left columns only)."""
    rd = _rd()
    from odinson_ray.stages.shuffle import hash_join

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    return hash_join(
        cust, orders, on="c_custkey", right_on="o_custkey", how="semi",
        left_schema=pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string())]),
        right_schema=pa.schema([("o_custkey", pa.int64())]),
    )


ORACLE_CUSTOMERS_WITH_ORDERS = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


QUERIES["customers_no_orders"] = q_customers_no_orders
ORACLES["customers_no_orders"] = ORACLE_CUSTOMERS_NO_ORDERS
QUERIES["customers_with_orders"] = q_customers_with_orders
ORACLES["customers_with_orders"] = ORACLE_CUSTOMERS_WITH_ORDERS


# ============================================================= graph analytics

def q_kg_entity_degrees(sf_dir: str):
    """Graph-materialize analytics over the flagship triple table: per
    canonical entity, weighted out-degree (as subject) and in-degree (as
    object). Combiner discipline: the triple table is already aggregated;
    the degree expansion emits two rows per triple and one groupby sums."""
    from ray.data.aggregate import Sum

    from .kg import triples_dataset

    ds = triples_dataset(sf_dir)

    def expand(t: pa.Table) -> pa.Table:
        zeros = pa.array(np.zeros(len(t), dtype=np.int64))
        a = pa.table({"entity": t["subj_canon"], "out_n": t["n"], "in_n": zeros})
        b = pa.table({"entity": t["obj_canon"], "out_n": zeros, "in_n": t["n"]})
        return pa.concat_tables([a, b])

    return (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby("entity")
        .aggregate(Sum("out_n", alias_name="out_n"), Sum("in_n", alias_name="in_n"))
    )


_KG_TRIPLES_BODY = ORACLE_KG_TRIPLES.strip().rstrip(";")

ORACLE_KG_ENTITY_DEGREES = f"""
WITH trip AS ({_KG_TRIPLES_BODY})
SELECT entity, CAST(SUM(out_n) AS BIGINT) AS out_n,
       CAST(SUM(in_n) AS BIGINT) AS in_n
FROM (
  SELECT subj_canon AS entity, n AS out_n, 0 AS in_n FROM trip
  UNION ALL
  SELECT obj_canon AS entity, 0 AS out_n, n AS in_n FROM trip
)
GROUP BY entity
"""


# ============================================================ quality filtering

def q_quality_filter(sf_dir: str):
    """Gopher-style rule-based document filter: keep docs with
    20 <= n_tokens <= 90, 4 <= mean token length <= 12 and a
    symbol-character ratio < 0.1 (bounds chosen to genuinely split the
    synthetic corpus; ~20% of docs fail); returns the kept docs with their
    metrics. Pure vectorized Arrow kernels (RE2 char class == DuckDB's)."""
    rd = _rd()

    def f(t: pa.Table) -> pa.Table:
        from odinson_ray.stages.text import gopher_quality_mask

        toks = pc.split_pattern(t["text"], " ")
        n = pc.list_value_length(toks).cast(pa.int64())
        chars = pc.utf8_length(t["text"]).cast(pa.int64())
        sym = pc.count_substring_regex(t["text"], "[^a-z0-9 ]").cast(pa.int64())
        nf = n.cast(pa.float64())
        mean_len = pc.divide(
            pc.subtract(chars, pc.subtract(n, pa.scalar(1, pa.int64()))).cast(pa.float64()),
            nf,
        )
        sym_ratio = pc.divide(sym.cast(pa.float64()), chars.cast(pa.float64()))
        keep = gopher_quality_mask(t)  # the SHARED rule mask (funnel twin)
        out = pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": n,
            "mean_tok_len": pc.round(mean_len, 6),
            "symbol_ratio": pc.round(sym_ratio, 6),
        })
        return out.filter(keep)

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(f, batch_format="pyarrow")


ORACLE_QUALITY_FILTER = """
WITH m AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
         length(text) AS chars,
         length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS sym
  FROM documents
)
SELECT doc_id, n_tokens,
       round((chars - (n_tokens - 1)) * 1.0 / n_tokens, 6) AS mean_tok_len,
       round(sym * 1.0 / chars, 6) AS symbol_ratio
FROM m
WHERE n_tokens BETWEEN 20 AND 90
  AND (chars - (n_tokens - 1)) * 1.0 / n_tokens BETWEEN 4 AND 12
  AND sym * 1.0 / chars < 0.1 AND chars > 0
"""


# =============================================================== n-gram counts

def q_top_bigrams(sf_dir: str):
    """Corpus-wide bigram counts, top 50 by (count desc, bigram asc).
    Combiner discipline: per-batch value_counts shrink the shuffle to one
    row per distinct bigram per batch; global_topk prunes per batch before
    the final distributed sort."""
    rd = _rd()
    from ray.data.aggregate import Sum

    from odinson_ray.stages.shuffle import global_topk

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = np.asarray(toks.flatten(), dtype=object)
        lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        empty = pa.table({
            "bigram": pa.array([], pa.string()),
            "partial_n": pa.array([], pa.int64()),
        })
        if len(flat) == 0:
            return empty
        ends = np.cumsum(lens)
        mask = np.ones(len(flat), dtype=bool)
        mask[ends - 1] = False  # a doc's last token starts no bigram
        li = np.flatnonzero(mask)
        if len(li) == 0:
            return empty
        big = np.frompyfunc(lambda a, b: a + " " + b, 2, 1)(flat[li], flat[li + 1])
        vc = pd.Series(big).value_counts()
        return pa.table({
            "bigram": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
            "partial_n": pa.array(vc.to_numpy(dtype=np.int64)),
        })

    counts = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("partial_n", alias_name="n"))
    )
    return global_topk(counts, ["n", "bigram"], [True, False], 50)


ORACLE_TOP_BIGRAMS = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         unnest(generate_series(1, len(string_split(text, ' ')))) AS p
  FROM documents
)
SELECT a.tok || ' ' || b.tok AS bigram, CAST(count(*) AS BIGINT) AS n
FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.p = a.p + 1
GROUP BY 1 ORDER BY n DESC, bigram LIMIT 50
"""


QUERIES["kg_entity_degrees"] = q_kg_entity_degrees
ORACLES["kg_entity_degrees"] = ORACLE_KG_ENTITY_DEGREES
QUERIES["quality_filter"] = q_quality_filter
ORACLES["quality_filter"] = ORACLE_QUALITY_FILTER
QUERIES["top_bigrams"] = q_top_bigrams
ORACLES["top_bigrams"] = ORACLE_TOP_BIGRAMS


# ================================================================= range join

def q_range_join_clicks(sf_dir: str):
    """Bucketed RANGE JOIN (a non-equi join Ray Data lacks natively): for
    each 'error' event, the number of 'click' events in the preceding 5
    minutes (exclusive lower bound, inclusive upper).

    Partitioning assumption (documented per the custom-operator rule):
    bucket width == the window Δ. Each error lives in exactly ONE bucket;
    each click replicates to its own and the NEXT bucket (factor 2 — the
    standard range-join bucketing), so every qualifying (error, click)
    pair co-locates exactly once, in the error's bucket. One shuffle, no
    all-pairs blowup; within a group the count is two vectorized
    searchsorted calls against the sorted click timestamps."""
    rd = _rd()
    DELTA_US = 5 * 60 * 1_000_000

    def prep(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        base = pa.table({
            "ts": ts,
            "event_id": t["event_id"],
            "event_type": t["event_type"],
        })
        errs = base.filter(pc.equal(base["event_type"], "error"))
        clks = base.filter(pc.equal(base["event_type"], "click"))
        e_bkt = pc.divide(errs["ts"], DELTA_US)
        c_bkt = pc.divide(clks["ts"], DELTA_US)
        null_ids = pa.nulls(len(clks), pa.int64())
        out = [
            pa.table({"bucket": e_bkt, "role": pa.array(["e"] * len(errs)),
                      "event_id": errs["event_id"], "ts": errs["ts"]}),
            pa.table({"bucket": c_bkt, "role": pa.array(["c"] * len(clks)),
                      "event_id": null_ids, "ts": clks["ts"]}),
            pa.table({"bucket": pc.add(c_bkt, 1),
                      "role": pa.array(["c"] * len(clks)),
                      "event_id": null_ids, "ts": clks["ts"]}),
        ]
        return pa.concat_tables(out)

    def count_group(g: pa.Table) -> pa.Table:
        errs = g.filter(pc.equal(g["role"], "e"))
        if len(errs) == 0:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "n_clicks_5m": pa.array([], pa.int64())})
        clks = g.filter(pc.equal(g["role"], "c"))
        cs = np.sort(np.asarray(clks["ts"].to_pylist(), dtype=np.int64))
        ets = np.asarray(errs["ts"].to_pylist(), dtype=np.int64)
        lo = np.searchsorted(cs, ets - DELTA_US, side="right")
        hi = np.searchsorted(cs, ets, side="right")
        return pa.table({
            "event_id": pa.array(np.asarray(errs["event_id"].to_pylist(),
                                            dtype=np.int64)),
            "n_clicks_5m": pa.array((hi - lo).astype(np.int64)),
        })

    return (
        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["event_id", "ts", "event_type"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(count_group, batch_format="pyarrow")
    )


ORACLE_RANGE_JOIN_CLICKS = """
WITH err AS (SELECT event_id, ts FROM events WHERE event_type = 'error'),
     clk AS (SELECT ts FROM events WHERE event_type = 'click')
SELECT e.event_id, CAST(count(c.ts) AS BIGINT) AS n_clicks_5m
FROM err e LEFT JOIN clk c
  ON c.ts > e.ts - INTERVAL 5 MINUTE AND c.ts <= e.ts
GROUP BY e.event_id
"""

QUERIES["range_join_clicks"] = q_range_join_clicks
ORACLES["range_join_clicks"] = ORACLE_RANGE_JOIN_CLICKS


# ================================================================== k-NN join

def q_knn_join(sf_dir: str):
    """Batched k-NN JOIN: for each of the 5 query embeddings (vec_id < 5),
    the top-5 corpus neighbors by cosine. The query matrix is the small
    side: filtered AS A DATASET, collected (5 rows), broadcast once; each
    batch computes one matmul against all queries and keeps its per-query
    top-5 BEFORE the shuffle (exact: rounded-score desc + vec_id asc is a
    total order), so the final per-query groupby sorts <= 5 x num_batches
    rows. Ranking uses the ROUNDED score on both sides (tie-safe vs the
    SQL row_number oracle)."""
    import ray

    rd = _rd()
    K = 5

    qdf = (
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .map_batches(lambda t: t.filter(pc.less(t["vec_id"], 5)),
                     batch_format="pyarrow")
        .to_pandas()
        .sort_values("vec_id")
    )
    Q = np.array([np.asarray(v, dtype=np.float64) for v in qdf.embedding])
    Q = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    qids = qdf.vec_id.to_numpy(dtype=np.int64)
    qref = ray.put((qids, Q))

    from odinson_ray.stages.link import get_broadcast

    def score(t: pa.Table) -> pa.Table:
        qids_, Q_ = get_broadcast(qref)
        mat = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        S = np.round((mat / np.where(norms == 0, 1.0, norms)) @ Q_.T, 6)
        vids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        out_q, out_v, out_s = [], [], []
        for j, qid in enumerate(qids_):
            order = np.lexsort((vids, -S[:, j]))[:K]
            out_q.extend([qid] * len(order))
            out_v.extend(vids[order])
            out_s.extend(S[order, j])
        return pa.table({
            "query_id": pa.array(np.asarray(out_q, dtype=np.int64)),
            "vec_id": pa.array(np.asarray(out_v, dtype=np.int64)),
            "score": pa.array(np.asarray(out_s, dtype=np.float64)),
        })

    def final_topk(g: pa.Table) -> pa.Table:
        vids = np.asarray(g["vec_id"].to_pylist(), dtype=np.int64)
        scores = np.asarray(g["score"].to_pylist(), dtype=np.float64)
        order = np.lexsort((vids, -scores))[:K]
        return pa.table({
            "query_id": pc.take(g["query_id"], pa.array(order)),
            "vec_id": pa.array(vids[order]),
            "score": pa.array(scores[order]),
        })

    return (
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .map_batches(score, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pyarrow")
    )


ORACLE_KNN_JOIN = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < 5
),
s AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe), 6) AS score
  FROM embeddings e, q
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rn
  FROM s
)
SELECT query_id, vec_id, score FROM r WHERE rn <= 5
"""

QUERIES["knn_join"] = q_knn_join
ORACLES["knn_join"] = ORACLE_KNN_JOIN


# ============================================================== full-outer join

def q_user_stats_full_outer(sf_dir: str):
    """FULL OUTER hash join of two aggregated sides with guaranteed
    unmatched rows on BOTH sides (left: users with id % 3 != 0 and their
    event counts; right: users with id % 2 == 0 and their summed value).
    Nulls from the unmatched sides are coalesced to sentinel values so the
    comparison is dtype-stable (n_events -> 0, total_value -> -1)."""
    rd = _rd()
    from ray.data.aggregate import Count, Sum

    from odinson_ray.stages.shuffle import hash_join

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "value"])
    left = (
        ev.map_batches(
            lambda t: t.filter(pc.not_equal(
                pc.subtract(t["user_id"],
                            pc.multiply(pc.divide(t["user_id"], 3), 3)), 0)),
            batch_format="pyarrow",
        )
        .groupby("user_id")
        .aggregate(Count(alias_name="n_events"))
    )
    right = (
        ev.map_batches(
            lambda t: t.filter(pc.equal(
                pc.subtract(t["user_id"],
                            pc.multiply(pc.divide(t["user_id"], 2), 2)), 0)),
            batch_format="pyarrow",
        )
        .groupby("user_id")
        .aggregate(Sum("value", alias_name="_sv"))
        .map_batches(
            lambda t: pa.table({
                "user_id": t["user_id"],
                "total_value": pc.round(t["_sv"], 6),
            }),
            batch_format="pyarrow",
        )
    )
    joined = hash_join(
        left, right, on="user_id", how="full_outer",
        left_schema=pa.schema([("user_id", pa.int64()), ("n_events", pa.int64())]),
        right_schema=pa.schema([("user_id", pa.int64()), ("total_value", pa.float64())]),
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "n_events": pc.fill_null(t["n_events"], 0),
            "total_value": pc.fill_null(t["total_value"], -1.0),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


ORACLE_USER_STATS_FULL_OUTER = """
WITH l AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
  FROM events WHERE user_id % 3 != 0 GROUP BY user_id
),
r AS (
  SELECT user_id, round(sum(value), 6) AS total_value
  FROM events WHERE user_id % 2 = 0 GROUP BY user_id
)
SELECT COALESCE(l.user_id, r.user_id) AS user_id,
       COALESCE(l.n_events, 0) AS n_events,
       COALESCE(r.total_value, -1.0) AS total_value
FROM l FULL OUTER JOIN r ON l.user_id = r.user_id
"""


# ======================================================================= pivot

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_events_pivot(sf_dir: str):
    """PIVOT: per-user event counts spread into one column per event type.
    Combiner discipline: each batch emits one row per user with per-type
    partial counts (a pandas crosstab), the groupby sums the fixed column
    set — the shuffle moves one row per (user, batch), never raw events."""
    rd = _rd()
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(["user_id", "event_type"]).to_pandas()
        ct = pd.crosstab(df["user_id"], df["event_type"])
        for et in _EVENT_TYPES:
            if et not in ct.columns:
                ct[et] = 0
        ct = ct[list(_EVENT_TYPES)].reset_index()
        ct.columns = ["user_id"] + [f"n_{et}" for et in _EVENT_TYPES]
        return pa.Table.from_pandas(
            ct.astype("int64"), preserve_index=False
        ).replace_schema_metadata(None)

    aggs = [Sum(f"n_{et}", alias_name=f"n_{et}") for et in _EVENT_TYPES]
    return (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(*aggs)
    )


ORACLE_EVENTS_PIVOT = """
SELECT user_id,
       CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
       CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup,
       CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view
FROM events GROUP BY user_id
"""

QUERIES["user_stats_full_outer"] = q_user_stats_full_outer
ORACLES["user_stats_full_outer"] = ORACLE_USER_STATS_FULL_OUTER
QUERIES["events_pivot"] = q_events_pivot
ORACLES["events_pivot"] = ORACLE_EVENTS_PIVOT


# ===================================================================== curation (round 3)

def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: flag training docs sharing a token
    3-gram with the held-out eval slice (doc_id % 97 == 0). Eval gram set
    broadcasts (benchmark-sized by construction); the corpus streams
    through one zero-shuffle map_batches. See stages/curate.py."""
    from odinson_ray.stages.curate import decontaminate

    return decontaminate(sf_dir, n=3, eval_mod=97)


ORACLE_DECONTAMINATE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
grams AS (
  SELECT doc_id, array_to_string(list_slice(t, i, i+2), ' ') AS g
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i FROM toks)
),
ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0)
SELECT g.doc_id, count(DISTINCT g.g) AS n_shared
FROM grams g JOIN ev e USING (g)
WHERE g.doc_id % 97 <> 0
GROUP BY g.doc_id
"""


def q_semdedup(sf_dir: str):
    """SemDeDup-style semantic dedup: k-means clusters (k=8, 1 Lloyd
    refinement, shared with kmeans_clusters) + within-cluster cosine
    prune at tau=0.3; returns kept (vec_id, cluster). The oracle unrolls
    both k-means rounds in SQL then applies the same NOT EXISTS prune."""
    from odinson_ray.stages.curate import semdedup

    return semdedup(sf_dir, k=8, refinements=1, tau=0.3)


ORACLE_SEMDEDUP = """
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
c0 AS (SELECT vec_id AS cluster, e AS c FROM emb WHERE vec_id < 8),
a1 AS (
  SELECT vec_id, cluster FROM (
    SELECT emb.vec_id, c0.cluster,
           row_number() OVER (PARTITION BY emb.vec_id
                              ORDER BY list_distance(emb.e, c0.c), c0.cluster) AS rn
    FROM emb CROSS JOIN c0
  ) WHERE rn = 1
),
means AS (
  SELECT cluster, i, avg(v) AS m FROM (
    SELECT a1.cluster, unnest(emb.e) AS v,
           unnest(generate_series(1, len(emb.e))) AS i
    FROM a1 JOIN emb USING (vec_id)
  ) GROUP BY cluster, i
),
c1 AS (SELECT cluster, list(m ORDER BY i) AS c FROM means GROUP BY cluster),
a2 AS (
  SELECT vec_id, cluster FROM (
    SELECT emb.vec_id, c1.cluster,
           row_number() OVER (PARTITION BY emb.vec_id
                              ORDER BY list_distance(emb.e, c1.c), c1.cluster) AS rn
    FROM emb CROSS JOIN c1
  ) WHERE rn = 1
)
SELECT a.vec_id, a.cluster
FROM a2 a JOIN emb ea USING (vec_id)
WHERE NOT EXISTS (
  SELECT 1 FROM a2 b JOIN emb eb ON b.vec_id = eb.vec_id
  WHERE b.cluster = a.cluster AND b.vec_id < a.vec_id
    AND list_cosine_similarity(ea.e, eb.e) >= 0.3
)
"""


def q_repetition_signals(sf_dir: str):
    """Gopher-style repetition metrics per doc: duplicate-token fraction
    and top-bigram fraction, fully vectorized per batch (no shuffle)."""
    from odinson_ray.stages.curate import repetition_signals

    return repetition_signals(sf_dir)


ORACLE_REPETITION_SIGNALS = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
flat AS (SELECT doc_id, unnest(t) AS tok,
         unnest(generate_series(1, len(t))) AS p, len(t) AS n FROM toks),
dist AS (SELECT doc_id, count(DISTINCT tok) AS nd, any_value(n) AS n
         FROM flat GROUP BY doc_id),
big AS (SELECT a.doc_id, a.tok || ' ' || b.tok AS bg
        FROM flat a JOIN flat b ON a.doc_id = b.doc_id AND b.p = a.p + 1),
bgtop AS (SELECT doc_id, max(c) AS mc FROM
            (SELECT doc_id, bg, count(*) AS c FROM big GROUP BY doc_id, bg)
          GROUP BY doc_id)
SELECT d.doc_id, d.n AS n_tokens,
       round(1.0 - d.nd / d.n, 6) AS dup_tok_frac,
       round(2.0 * coalesce(b.mc, 0) / d.n, 6) AS top_bigram_frac
FROM dist d LEFT JOIN bgtop b USING (doc_id)
"""


def q_pack_chunks(sf_dir: str):
    """Training-sequence preparation: fixed 32-token windows at stride 24
    over each doc's token stream (pure per-batch index arithmetic)."""
    from odinson_ray.stages.curate import pack_chunks

    return pack_chunks(sf_dir, width=32, stride=24)


ORACLE_PACK_CHUNKS = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
SELECT doc_id, CAST((s - 1) / 24 AS BIGINT) AS chunk_id,
       CAST(least(32, len(t) - s + 1) AS BIGINT) AS n_tokens,
       t[s] AS head
FROM (SELECT doc_id, t, unnest(generate_series(1, len(t), 24)) AS s FROM toks)
"""

QUERIES["decontaminate"] = q_decontaminate
ORACLES["decontaminate"] = ORACLE_DECONTAMINATE
QUERIES["semdedup"] = q_semdedup
ORACLES["semdedup"] = ORACLE_SEMDEDUP
QUERIES["repetition_signals"] = q_repetition_signals
ORACLES["repetition_signals"] = ORACLE_REPETITION_SIGNALS
QUERIES["pack_chunks"] = q_pack_chunks
ORACLES["pack_chunks"] = ORACLE_PACK_CHUNKS


# ===================================== corpus term statistics / domain mixing

def q_doc_frequency(sf_dir: str):
    from ..stages.text import doc_frequency

    return doc_frequency(sf_dir)


ORACLE_DOC_FREQUENCY = """
SELECT tok, count(DISTINCT doc_id) AS df
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
GROUP BY tok
"""


def q_tfidf_top_term(sf_dir: str):
    from ..stages.text import tfidf_top_term

    return tfidf_top_term(sf_dir)


ORACLE_TFIDF_TOP_TERM = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
tf AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY doc_id, tok
),
df AS (
  SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY tok
),
scored AS (
  SELECT doc_id, tok,
         round(tf * ln(CAST((SELECT count(*) FROM documents) AS DOUBLE) / df), 6) AS score
  FROM tf JOIN df USING (tok)
)
SELECT doc_id, tok AS top_term, score
FROM scored
QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) = 1
"""


def q_domain_mix(sf_dir: str):
    from ..stages.sample import domain_mix

    return domain_mix(sf_dir)


ORACLE_DOMAIN_MIX = """
WITH w AS (
  SELECT doc_id, source,
         CASE WHEN source = 'src0' THEN 25
              WHEN source = 'src1' THEN 3
              ELSE 10 END AS tw,
         (doc_id * 2654435761) % 4294967296 % 10 AS b
  FROM documents
)
SELECT doc_id, source,
       unnest(range(0, tw // 10 + CASE WHEN b < tw % 10 THEN 1 ELSE 0 END)) AS copy
FROM w
"""

QUERIES["doc_frequency"] = q_doc_frequency
ORACLES["doc_frequency"] = ORACLE_DOC_FREQUENCY
QUERIES["tfidf_top_term"] = q_tfidf_top_term
ORACLES["tfidf_top_term"] = ORACLE_TFIDF_TOP_TERM
QUERIES["domain_mix"] = q_domain_mix
ORACLES["domain_mix"] = ORACLE_DOMAIN_MIX


# ===================================== exact shared-passage detection

def q_shared_passages(sf_dir: str):
    from ..stages.dedup import shared_passage_pairs

    return shared_passage_pairs(sf_dir, window=8)


ORACLE_SHARED_PASSAGES = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
win AS (
  SELECT DISTINCT doc_id, md5(array_to_string(ts[i:i+7], ' ')) AS w
  FROM toks, UNNEST(range(1, len(ts) - 7 + 2)) AS t(i)
  WHERE len(ts) >= 8
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM win a JOIN win b ON a.w = b.w AND a.doc_id < b.doc_id
"""

QUERIES["shared_passages"] = q_shared_passages
ORACLES["shared_passages"] = ORACLE_SHARED_PASSAGES


# ===================================== poison-row containment (error stream)

def q_error_stream(sf_dir: str):
    """Poison-row containment through the REAL distributed path: every doc
    with doc_id %% 97 == 0 gets malformed metadata JSON injected in-stream;
    the matcher (on_error='skip', the default) must convert exactly those
    documents into __error__ rows and keep the task alive (reference
    behavior: per-file Try + continue, IndexDocuments.scala:85-98)."""
    rd = _rd()
    from ..stages.match import GrammarMatcher

    def poison(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        bad = pa.array(ids % 97 == 0)
        md = pc.if_else(bad, "{not valid json", None)
        return t.append_column("metadata_json", md.cast(pa.string()))

    rules = "rules:\n  - {name: any, label: Tok, type: basic, pattern: 'the'}\n"
    mentions = (
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text", "lang", "source"])
        .map_batches(poison, batch_format="pyarrow")
        .map_batches(
            GrammarMatcher,
            fn_constructor_args=(rules,),
            batch_format="pyarrow",
            concurrency=2,
            batch_size=256,
            num_cpus=1,
        )
    )
    return mentions.map_batches(
        lambda t: t.filter(pc.equal(t["label"], GrammarMatcher.ERROR_LABEL))
                   .select(["doc_id", "label"]),
        batch_format="pyarrow",
    )


ORACLE_ERROR_STREAM = """
SELECT 'doc-' || lpad(CAST(doc_id AS VARCHAR), 6, '0') AS doc_id,
       '__error__' AS label
FROM documents WHERE doc_id % 97 = 0
"""

QUERIES["error_stream"] = q_error_stream
ORACLES["error_stream"] = ORACLE_ERROR_STREAM


# ============================================== rollup (grouping sets)

def q_rollup_lineitem(sf_dir: str):
    """GROUP BY ROLLUP (l_returnflag, l_linestatus) on sum(l_quantity):
    every grouping level is pre-aggregated INSIDE each batch (the
    combiner emits <= |flag x status| + |flag| + 1 rows per batch), so
    one global groupby serves all three levels — no per-level pass over
    the data, no extra shuffle. Rolled-up keys use the '__ALL__'
    sentinel (Ray groupby keys stay non-null)."""
    rd = _rd()
    from ray.data.aggregate import Sum

    ALL = "__ALL__"

    def partial(t: pa.Table) -> pa.Table:
        base = pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "q": t["l_quantity"],
        })
        lvl2 = pa.TableGroupBy(base, ["l_returnflag", "l_linestatus"]).aggregate(
            [("q", "sum")])
        lvl1 = pa.TableGroupBy(base.drop_columns(["l_linestatus"]),
                               ["l_returnflag"]).aggregate([("q", "sum")])
        n1 = lvl1.num_rows
        lvl1 = lvl1.add_column(1, "l_linestatus",
                               pa.array([ALL] * n1, pa.string()))
        lvl0 = pa.table({
            "l_returnflag": pa.array([ALL], pa.string()),
            "l_linestatus": pa.array([ALL], pa.string()),
            "q_sum": pa.array([pc.sum(base["q"]).as_py() or 0.0], pa.float64()),
        })
        out = pa.concat_tables([lvl2, lvl1, lvl0], promote_options="default")
        return out.rename_columns(["l_returnflag", "l_linestatus", "partial_q"])

    agg = (
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_returnflag", "l_linestatus", "l_quantity"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("partial_q", alias_name="sum_qty"))
    )
    return agg.map_batches(
        lambda t: t.set_column(t.column_names.index("sum_qty"), "sum_qty",
                               pc.round(t["sum_qty"], 2)),
        batch_format="pyarrow",
    )


ORACLE_ROLLUP_LINEITEM = """
SELECT COALESCE(l_returnflag, '__ALL__') AS l_returnflag,
       COALESCE(l_linestatus, '__ALL__') AS l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""

QUERIES["rollup_lineitem"] = q_rollup_lineitem
ORACLES["rollup_lineitem"] = ORACLE_ROLLUP_LINEITEM


# ===================================== exact per-group quantiles (discrete)

def q_value_quantiles(sf_dir: str):
    """Exact discrete quantiles (p50/p90 of value per event_type):
    quantile_disc semantics — sorted[ceil(q*n)-1] — pick an actual
    element, so no float interpolation can diverge between engines.

    Scale shape (r4 — replaced a one-group-per-key map_groups that held a
    key's RAW rows): per-batch (key, value, count) combiner -> groupby
    over DISTINCT (key, value) rows -> per-key selection from cumulative
    counts. A key's reducer input is bounded by its distinct-value count
    (the column is 2dp-quantized here; at true continuous cardinality
    this degrades to the raw shape and an approximate sketch is the
    right tool instead)."""
    import math

    from ray.data.aggregate import Sum

    from odinson_ray.stages.shuffle import rename_agg

    rd = _rd()

    def hist_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["event_type", "value"]),
                            ["event_type", "value"]).aggregate([([], "count_all")])
        return rename_agg(g, ["event_type", "value"],
                          ["event_type", "value", "partial_n"])

    hist = (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
        .map_batches(hist_partial, batch_format="pyarrow")
        .groupby(["event_type", "value"]).aggregate(Sum("partial_n", alias_name="c"))
    )

    def quantiles(g: pa.Table) -> pa.Table:
        o = pc.sort_indices(g["value"])
        v = g["value"].take(o).to_numpy(zero_copy_only=False)
        c = np.cumsum(g["c"].take(o).to_numpy(zero_copy_only=False))
        n = int(c[-1])
        pick = lambda q: float(v[np.searchsorted(c, max(1, math.ceil(q * n)))])
        return pa.table({
            "event_type": pa.array([g["event_type"][0].as_py()], pa.string()),
            "p50": pa.array([pick(0.5)], pa.float64()),
            "p90": pa.array([pick(0.9)], pa.float64()),
        })

    return hist.groupby("event_type").map_groups(quantiles, batch_format="pyarrow")


ORACLE_VALUE_QUANTILES = """
SELECT event_type, quantile_disc(value, 0.5) AS p50,
       quantile_disc(value, 0.9) AS p90
FROM events GROUP BY event_type
"""

QUERIES["value_quantiles"] = q_value_quantiles
ORACLES["value_quantiles"] = ORACLE_VALUE_QUANTILES


# ===================================== PageRank over the KG (iterative)

def q_pagerank_entities(sf_dir: str, iters: int = 3, damping: float = 0.85,
                        checkpoint_dir: str | None = None):
    """PageRank power iteration over the canonical triple graph (no
    dangling-mass redistribution; rank(v) = (1-d)/N + d * sum over
    in-edges of rank(u)/outdeg(u), synchronized updates).

    Scale shape: ranks and edges stay Datasets end to end — each
    iteration is one hash_join (edge src x rank) + a map-side-combined
    groupby(dst) + one left-outer join back onto the node set. Nothing
    node- or edge-sized ever lands on the driver; N is a count().

    ``checkpoint_dir`` (VERDICT r03 #7): when set, the per-run pins
    (edges, degree-joined edges, and each iteration's ranks) spill to
    partitioned parquet instead of living in the object store — the same
    option connected_components has — so graphs near object-store
    capacity trade memory residency for re-read bandwidth, and a killed
    run can restart from the last written iteration."""
    from ray.data.aggregate import Count, Sum

    from odinson_ray.stages.shuffle import hash_join

    from .kg import triples_dataset

    def pin(lazy_ds, name):
        if checkpoint_dir is None:
            return lazy_ds.materialize()
        import os
        import shutil

        from odinson_ray.sources.io import clean_rd

        path = os.path.join(checkpoint_dir, name)
        shutil.rmtree(path, ignore_errors=True)
        os.makedirs(path, exist_ok=True)
        lazy_ds.write_parquet(path)
        return clean_rd.read_parquet(path)

    ds = triples_dataset(sf_dir)

    def to_edges(t: pa.Table) -> pa.Table:
        e = pa.table({"src": t["subj_canon"], "dst": t["obj_canon"]})
        return pa.TableGroupBy(e, ["src", "dst"]).aggregate([])

    edges = (
        ds.map_batches(to_edges, batch_format="pyarrow")
        .groupby(["src", "dst"]).aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
    )
    edges = pin(edges, "edges")  # consumed K+2 times below
    deg = edges.groupby("src").aggregate(Count(alias_name="d"))

    def endpoints(t: pa.Table) -> pa.Table:
        v = pa.concat_arrays([t["src"].combine_chunks(), t["dst"].combine_chunks()])
        return pa.TableGroupBy(pa.table({"v": v}), ["v"]).aggregate([])

    nodes = (
        edges.map_batches(endpoints, batch_format="pyarrow")
        .groupby("v").aggregate(Count(alias_name="_c")).drop_columns(["_c"])
    ).materialize()
    n_nodes = nodes.count()
    base = (1.0 - damping) / n_nodes

    str_t, f64 = pa.string(), pa.float64()
    edge_schema = pa.schema([("src", str_t), ("dst", str_t)])
    deg_schema = pa.schema([("src", str_t), ("d", pa.int64())])
    rank_schema = pa.schema([("v", str_t), ("r", f64)])
    edges_d = hash_join(edges, deg, on="src",
                        left_schema=edge_schema, right_schema=deg_schema)
    edges_d = pin(edges_d, "edges_d")  # (src, dst, d): reused every iteration
    ed_schema = pa.schema([("src", str_t), ("dst", str_t), ("d", pa.int64())])

    r0 = 1.0 / n_nodes
    ranks = nodes.map_batches(
        lambda t, r0=r0: t.append_column("r", pa.array([r0] * len(t), f64)),
        batch_format="pyarrow",
    )
    for it in range(iters):
        contrib = hash_join(edges_d, ranks, on="src", right_on="v",
                            left_schema=ed_schema, right_schema=rank_schema)

        def partial_c(t: pa.Table) -> pa.Table:
            c = pc.divide(t["r"], pc.cast(t["d"], f64))
            g = pa.TableGroupBy(pa.table({"dst": t["dst"], "c": c}),
                                ["dst"]).aggregate([("c", "sum")])
            return rename_agg(g, ["dst"], ["dst", "c"])

        sums = (
            contrib.map_batches(partial_c, batch_format="pyarrow")
            .groupby("dst").aggregate(Sum("c", alias_name="c"))
        )
        joined = hash_join(nodes, sums, on="v", right_on="dst", how="left_outer",
                           left_schema=pa.schema([("v", str_t)]),
                           right_schema=pa.schema([("dst", str_t), ("c", f64)]))

        def new_rank(t: pa.Table) -> pa.Table:
            c = pc.fill_null(t["c"], 0.0)
            r = pc.add(pa.scalar(base), pc.multiply(pa.scalar(damping), c))
            return pa.table({"v": t["v"], "r": r})

        ranks = joined.map_batches(new_rank, batch_format="pyarrow")
        if checkpoint_dir is not None:
            ranks = pin(ranks, f"ranks_{it}")
    return ranks.map_batches(
        lambda t: pa.table({"entity": t["v"], "rank": pc.round(t["r"], 6)}),
        batch_format="pyarrow",
    )


def _pagerank_oracle(iters: int = 3) -> str:
    head = f"""
WITH trip AS ({_KG_TRIPLES_BODY}),
edges AS (SELECT DISTINCT subj_canon AS src, obj_canon AS dst FROM trip),
nodes AS (SELECT src AS v FROM edges UNION SELECT dst FROM edges),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS d FROM edges GROUP BY src),
r0 AS (SELECT v, 1.0 / (SELECT n FROM nn) AS r FROM nodes)"""
    body = ""
    prev = "r0"
    for i in range(1, iters + 1):
        body += f""",
s{i} AS (SELECT e.dst AS v, sum({prev}.r / deg.d) AS c
         FROM edges e JOIN {prev} ON {prev}.v = e.src
                      JOIN deg ON deg.src = e.src
         GROUP BY e.dst),
r{i} AS (SELECT nodes.v,
                0.15 / (SELECT n FROM nn) + 0.85 * COALESCE(s{i}.c, 0) AS r
         FROM nodes LEFT JOIN s{i} ON s{i}.v = nodes.v)"""
        prev = f"r{i}"
    return head + body + f"""
SELECT v AS entity, round(r, 6) AS rank FROM {prev}"""


ORACLE_PAGERANK_ENTITIES = _pagerank_oracle(3)

QUERIES["pagerank_entities"] = q_pagerank_entities
ORACLES["pagerank_entities"] = ORACLE_PAGERANK_ENTITIES


# ===================================== triangle counting (graph self-join)

def q_kg_triangles(sf_dir: str):
    """Triangle count over the undirected canonical triple graph: edges
    canonicalized to (lo, hi) with lo < hi, then degree-oriented wedge
    enumeration (stages/graph.py) — each edge directed low-rank ->
    high-rank by (degree, id), wedges enumerated over OUT-neighbors only,
    so a degree-d hub costs O(sqrt(m)) amortized out-degree instead of
    d^2 wedge rows in one join group."""
    from ray.data.aggregate import Count

    from odinson_ray.stages.graph import triangle_count

    from .kg import triples_dataset

    ds = triples_dataset(sf_dir)

    def to_undirected(t: pa.Table) -> pa.Table:
        lo = pc.min_element_wise(t["subj_canon"], t["obj_canon"])
        hi = pc.max_element_wise(t["subj_canon"], t["obj_canon"])
        e = pa.table({"lo": lo, "hi": hi})
        e = e.filter(pc.not_equal(e["lo"], e["hi"]))  # drop self-loops
        return pa.TableGroupBy(e, ["lo", "hi"]).aggregate([])

    edges = (
        ds.map_batches(to_undirected, batch_format="pyarrow")
        .groupby(["lo", "hi"]).aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
    )
    import pandas as _pd

    return _pd.DataFrame({"n_triangles": [triangle_count(edges)]})


ORACLE_KG_TRIANGLES = f"""
WITH trip AS ({{body}}),
dedges AS (
  SELECT DISTINCT least(subj_canon, obj_canon) AS lo,
                  greatest(subj_canon, obj_canon) AS hi
  FROM trip WHERE subj_canon != obj_canon
)
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM dedges ab JOIN dedges bc ON bc.lo = ab.hi
               JOIN dedges ac ON ac.lo = ab.lo AND ac.hi = bc.hi
""".format(body=_KG_TRIPLES_BODY)

QUERIES["kg_triangles"] = q_kg_triangles
ORACLES["kg_triangles"] = ORACLE_KG_TRIANGLES


# ===================================== fuzzy string join (edit distance <= 1)

def _lev_le1(a: str, b: str) -> bool:
    """Exact edit-distance<=1 test (cheap two-pointer; verify step only)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = j = diff = 0
    while i < la and j < lb:
        if a[i] == b[j]:
            i += 1
            j += 1
            continue
        diff += 1
        if diff > 1:
            return False
        if la == lb:
            i += 1
        j += 1
    return True


def q_fuzzy_word_pairs(sf_dir: str):
    """Fuzzy self-join of the part-name vocabulary at edit distance <= 1,
    SymSpell-shaped: each word blocks on itself plus every
    single-character deletion (exact recall for d<=1 — a substitution
    shares a deletion key, an insertion's longer word deletes down to
    the shorter), fingerprint-blocked candidates pair inside coarse
    hash(key) partitions (tiny-group rule, r4 sweep — one group per
    fingerprint would dispatch one task per vocabulary variant), and an
    exact verify filters. The shuffle key is the deletion fingerprint —
    the full vocabulary never cross-products."""
    rd = _rd()
    from ray.data.aggregate import Count
    from odinson_ray.stages.sketch import _splitmix64

    PARTS = 256

    def vocab(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["p_name"], " ")
        return pa.TableGroupBy(pa.table({"w": pc.list_flatten(toks)}),
                               ["w"]).aggregate([])

    words = (
        rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_name"])
        .map_batches(vocab, batch_format="pyarrow")
        .groupby("w").aggregate(Count(alias_name="_c")).drop_columns(["_c"])
    )

    def expand(t: pa.Table) -> pa.Table:
        keys: list = []
        ws: list = []
        for w in t["w"].to_pylist():
            keys.append(w)
            ws.append(w)
            for i in range(len(w)):
                keys.append(w[:i] + w[i + 1:])
                ws.append(w)
        return pa.table({"k": pa.array(keys, pa.string()),
                         "w": pa.array(ws, pa.string())})

    def add_part(t: pa.Table) -> pa.Table:
        import zlib
        h = np.array([zlib.crc32(x.encode()) for x in t["k"].to_pylist()],
                     dtype=np.uint64)
        p = (_splitmix64(h) % np.uint64(PARTS)).astype(np.int64)
        return t.append_column("_p", pa.array(p, pa.int64()))

    def pairs_partition(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        o = pc.sort_indices(g, sort_keys=[("k", "ascending"),
                                          ("w", "ascending")])
        g = g.take(o)
        nrow = g.num_rows
        empty = pa.table({"a": pa.array([], pa.string()),
                          "b": pa.array([], pa.string())})
        if nrow == 0:
            return empty
        ks = np.asarray(g["k"].to_pylist(), dtype=object)
        ws = np.asarray(g["w"].to_pylist(), dtype=object)
        # drop (k, w) duplicates, find fingerprint runs
        newr = np.ones(nrow, dtype=bool)
        newr[1:] = (ks[1:] != ks[:-1]) | (ws[1:] != ws[:-1])
        ks, ws = ks[newr], ws[newr]
        newk = np.ones(len(ks), dtype=bool)
        newk[1:] = ks[1:] != ks[:-1]
        bounds = np.append(np.flatnonzero(newk), len(ks))
        a: list = []
        b: list = []
        for i in range(len(bounds) - 1):
            s_, e_ = bounds[i], bounds[i + 1]
            run = ws[s_:e_]
            for x_i in range(len(run)):
                x = run[x_i]
                for y in run[x_i + 1:]:
                    if _lev_le1(x, y):
                        a.append(x)
                        b.append(y)
        return pa.table({"a": pa.array(a, pa.string()),
                         "b": pa.array(b, pa.string())})

    cand = (
        words.map_batches(expand, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("_p")
        .map_groups(lambda g: pairs_partition(g.drop_columns(["_p"])),
                    batch_format="pyarrow")
    )
    # a pair can collide under several deletion keys: dedup
    return (
        cand.groupby(["a", "b"]).aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
    )


ORACLE_FUZZY_WORD_PAIRS = """
WITH v AS (
  SELECT DISTINCT w FROM (
    SELECT unnest(string_split(p_name, ' ')) AS w FROM part)
)
SELECT a.w AS a, b.w AS b
FROM v a JOIN v b ON a.w < b.w AND levenshtein(a.w, b.w) <= 1
"""

QUERIES["fuzzy_word_pairs"] = q_fuzzy_word_pairs
ORACLES["fuzzy_word_pairs"] = ORACLE_FUZZY_WORD_PAIRS


# ===================================== ordered collect / string_agg

def q_user_event_history(sf_dir: str):
    """Per-user ordered event history (collect_list/string_agg class):
    event ids concatenated in (ts, event_id) order. Segmented over coarse
    hash(user) partitions (tiny-group rule, r4 sweep): ONE sort per
    partition, one pandas run-grouped join per partition — per-user
    map_groups would dispatch one task per user."""
    from odinson_ray.stages.sketch import _splitmix64

    rd = _rd()
    PARTS = 512

    def add_part(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        p = (_splitmix64(u) % np.uint64(PARTS)).astype(np.int64)
        return t.append_column("_p", pa.array(p, pa.int64()))

    def history_partition(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        idx = pc.sort_indices(g, sort_keys=[("user_id", "ascending"),
                                            ("ts", "ascending"),
                                            ("event_id", "ascending")])
        g = g.take(idx)
        if g.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "history": pa.array([], pa.string())})
        u = g["user_id"].to_numpy(zero_copy_only=False)
        ev = pc.cast(g["event_id"], pa.string()).to_pandas()
        joined = ev.groupby(u, sort=True).agg(",".join)
        return pa.table({
            "user_id": pa.array(joined.index.to_numpy(), pa.int64()),
            "history": pa.array(joined.to_numpy(), pa.string()),
        })

    return (
        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["user_id", "ts", "event_id"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("_p")
        .map_groups(lambda g: history_partition(g.drop_columns(["_p"])),
                    batch_format="pyarrow")
    )


ORACLE_USER_EVENT_HISTORY = """
SELECT user_id,
       string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY ts, event_id) AS history
FROM events GROUP BY user_id
"""

QUERIES["user_event_history"] = q_user_event_history
ORACLES["user_event_history"] = ORACLE_USER_EVENT_HISTORY


# ===================================== lead/lag window (per-event gap)

def q_event_gaps(sf_dir: str):
    """LAG window class: per event, microseconds since the user's
    previous event ((ts, event_id) order; first event = -1). Segmented
    over coarse hash(user) partitions (tiny-group rule): ONE sort per
    partition, one vectorized diff with a reset mask at user changes —
    per-user map_groups would pay ~2 ms dispatch per user."""
    from odinson_ray.stages.sketch import _splitmix64

    rd = _rd()
    PARTS = 512

    def add_part(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        p = (_splitmix64(u) % np.uint64(PARTS)).astype(np.int64)
        return t.append_column("_p", pa.array(p, pa.int64()))

    def gaps_partition(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        idx = pc.sort_indices(g, sort_keys=[("user_id", "ascending"),
                                            ("ts", "ascending"),
                                            ("event_id", "ascending")])
        g = g.take(idx)
        n = g.num_rows
        if n == 0:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "user_id": pa.array([], pa.int64()),
                             "gap_us": pa.array([], pa.int64())})
        u = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        gap = np.empty(n, dtype=np.int64)
        gap[0] = -1
        gap[1:] = np.where(u[1:] == u[:-1], ts[1:] - ts[:-1], -1)
        return pa.table({
            "event_id": g["event_id"],
            "user_id": g["user_id"],
            "gap_us": pa.array(gap, pa.int64()),
        })

    return (
        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["user_id", "ts", "event_id"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("_p")
        .map_groups(lambda g: gaps_partition(g.drop_columns(["_p"])),
                    batch_format="pyarrow")
    )


ORACLE_EVENT_GAPS = """
SELECT event_id, user_id,
       COALESCE(CAST(epoch_us(ts - lag(ts) OVER w) AS BIGINT), -1) AS gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""

QUERIES["event_gaps"] = q_event_gaps
ORACLES["event_gaps"] = ORACLE_EVENT_GAPS


# ===================================== BM25 retrieval top-k

BM25_QUERY = ("scan", "window", "merge")
_BM25_K1, _BM25_B = 1.2, 0.75


def q_bm25_topk(sf_dir: str, k: int = 10):
    """BM25 top-k documents for a fixed term query (Okapi BM25,
    idf = ln((N - df + 0.5)/(df + 0.5) + 1), k1=1.2, b=0.75; score
    rounded to 6dp, doc_id ascending tie-break).

    Distributed shape: the df aggregation is FILTERED TO THE QUERY TERMS
    inside the per-batch combiner (per-batch rows <= |query|), so the
    driver broadcast is |query|-sized regardless of corpus vocabulary;
    avg doc length comes from one Sum/Count aggregate; scoring is one
    vectorized map over the document stream feeding global_topk (per-
    batch prune, the final sort sees <= k x batches rows)."""
    import ray
    from ray.data.aggregate import Count, Sum

    from odinson_ray.sources.io import clean_rd as rd
    from odinson_ray.stages.link import get_broadcast
    from odinson_ray.stages.shuffle import global_topk, rename_agg
    from odinson_ray.stages.text import df_partial_batch

    terms = sorted(BM25_QUERY)
    term_set = pa.array(terms, pa.string())

    def df_query_terms(t: pa.Table) -> pa.Table:
        part = df_partial_batch(t)
        return part.filter(pc.is_in(part["tok"], value_set=term_set))

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    dfs = {r["tok"]: r["df"] for r in (
        docs.map_batches(df_query_terms, batch_format="pyarrow")
        .groupby("tok").aggregate(Sum("partial_df", alias_name="df"))
        .take_all()  # <= |query| rows by construction
    )}

    def len_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        n = pc.sum(pc.list_value_length(toks)).as_py() or 0
        return pa.table({"_n_tok": pa.array([n], pa.int64()),
                         "_n_doc": pa.array([len(t)], pa.int64())})

    totals = (
        docs.map_batches(len_partial, batch_format="pyarrow")
        .map_batches(
            lambda t: pa.table({
                "_n_tok": pa.array([pc.sum(t["_n_tok"]).as_py() or 0], pa.int64()),
                "_n_doc": pa.array([pc.sum(t["_n_doc"]).as_py() or 0], pa.int64()),
            }),
            batch_size=1 << 20, batch_format="pyarrow")
        .take_all()
    )
    n_docs = sum(r["_n_doc"] for r in totals)
    avg_len = sum(r["_n_tok"] for r in totals) / n_docs
    idf = {t: float(np.log((n_docs - dfs.get(t, 0) + 0.5)
                           / (dfs.get(t, 0) + 0.5) + 1.0)) for t in terms}
    ref = ray.put((terms, idf, avg_len))

    def score(batch: pa.Table) -> pa.Table:
        q_terms, q_idf, avg = get_broadcast(ref)
        toks = pc.split_pattern(batch["text"], " ")
        dl = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.float64)
        norm = _BM25_K1 * (1.0 - _BM25_B + _BM25_B * dl / avg)
        total = np.zeros(len(batch), dtype=np.float64)
        flat = pa.table({"_row": pc.list_parent_indices(toks),
                         "tok": pc.list_flatten(toks)})
        for t in q_terms:
            hit = flat.filter(pc.equal(flat["tok"], t))
            tf = np.zeros(len(batch), dtype=np.float64)
            rows = hit["_row"].to_numpy(zero_copy_only=False)
            np.add.at(tf, rows, 1.0)
            total += q_idf[t] * (tf * (_BM25_K1 + 1.0)) / (tf + norm)
        out = pa.table({
            "doc_id": batch["doc_id"],
            "score": pa.array(np.round(total, 6), pa.float64()),
        })
        return out.filter(pc.greater(out["score"], 0.0))

    scored = docs.map_batches(score, batch_format="pyarrow")
    return global_topk(scored, ["score", "doc_id"], [True, False], k)


ORACLE_BM25_TOPK = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
dl AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY doc_id),
stats AS (SELECT count(*) AS n, avg(len) AS avg_len FROM dl),
q(tok) AS (VALUES ('scan'), ('window'), ('merge')),
df AS (
  SELECT tok, count(DISTINCT doc_id) AS df FROM toks
  WHERE tok IN (SELECT tok FROM q) GROUP BY tok
),
tf AS (
  SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf FROM toks
  WHERE tok IN (SELECT tok FROM q) GROUP BY doc_id, tok
),
scored AS (
  SELECT tf.doc_id,
         sum(ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
             * (tf.tf * 2.2)
             / (tf.tf + 1.2 * (0.25 + 0.75 * dl.len / stats.avg_len))) AS s
  FROM tf JOIN df USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, round(s, 6) AS score FROM scored
WHERE round(s, 6) > 0
ORDER BY score DESC, doc_id ASC LIMIT 10
"""

QUERIES["bm25_topk"] = q_bm25_topk
ORACLES["bm25_topk"] = ORACLE_BM25_TOPK


# ===================================== deterministic train/val/test split

def q_doc_split_counts(sf_dir: str):
    """Deterministic hash split (train/val/test 80/10/10): bucket =
    first-8-hex-chars of md5(doc_id as string) mod 100 — a pure function
    of the key, so assignment is reproducible at any parallelism, any
    retry, any shard order (the property a 100-TB split must have; no
    RNG state, no coordination). Returns per-split doc counts."""
    from ray.data.aggregate import Sum

    from odinson_ray.stages.shuffle import rename_agg

    rd = _rd()

    def assign(t: pa.Table) -> pa.Table:
        import hashlib

        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        buckets = np.fromiter(
            (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
             for i in ids), dtype=np.int64, count=len(ids))
        split = np.where(buckets < 80, "train",
                         np.where(buckets < 90, "val", "test"))
        g = pa.TableGroupBy(
            pa.table({"split": pa.array(split.tolist(), pa.string())}),
            ["split"]).aggregate([([], "count_all")])
        return rename_agg(g, ["split"], ["split", "partial_n"])

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        .map_batches(assign, batch_format="pyarrow")
        .groupby("split").aggregate(Sum("partial_n", alias_name="n_docs"))
    )


ORACLE_DOC_SPLIT_COUNTS = """
WITH b AS (
  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
         % 100 AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
       count(*) AS n_docs
FROM b GROUP BY 1
"""

QUERIES["doc_split_counts"] = q_doc_split_counts
ORACLES["doc_split_counts"] = ORACLE_DOC_SPLIT_COUNTS


# ===================================== corpus top-k tokens (heavy hitters)

def q_top_tokens(sf_dir: str, k: int = 20):
    """Exact corpus-wide top-k tokens by total occurrence count: per-batch
    token-count combiner (one row per distinct token per batch) ->
    groupby sum -> global top-k (count desc, token asc)."""
    from ray.data.aggregate import Sum

    from odinson_ray.stages.shuffle import global_topk, rename_agg

    rd = _rd()

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        g = pa.TableGroupBy(pa.table({"tok": pc.list_flatten(toks)}),
                            ["tok"]).aggregate([([], "count_all")])
        return rename_agg(g, ["tok"], ["tok", "partial_n"])

    counts = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("tok").aggregate(Sum("partial_n", alias_name="n"))
    )
    return global_topk(counts, ["n", "tok"], [True, False], k)


ORACLE_TOP_TOKENS = """
WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
SELECT tok, CAST(count(*) AS BIGINT) AS n FROM t
GROUP BY tok ORDER BY n DESC, tok ASC LIMIT 20
"""

QUERIES["top_tokens"] = q_top_tokens
ORACLES["top_tokens"] = ORACLE_TOP_TOKENS


# ===================================== bigram successor model

def q_bigram_next(sf_dir: str):
    """For every token, its most frequent successor (count desc, successor
    asc tie-break) with the bigram count — the unsmoothed argmax of a
    bigram LM's conditional. Per-batch bigram-count combiner -> groupby
    sum over (tok, next) -> per-key argmax via the grouped-topk pattern
    (per-batch prune keeps <= 1 row per tok, so no hot head-word floods
    one reducer)."""
    from ray.data.aggregate import Sum

    from odinson_ray.stages.shuffle import grouped_topk, rename_agg

    rd = _rd()

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        rows = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        if len(flat) < 2:
            return pa.table({"tok": pa.array([], pa.string()),
                             "next": pa.array([], pa.string()),
                             "partial_n": pa.array([], pa.int64())})
        same_doc = rows[1:] == rows[:-1]
        g = pa.TableGroupBy(pa.table({
            "tok": pa.array(flat[:-1][same_doc].tolist(), pa.string()),
            "next": pa.array(flat[1:][same_doc].tolist(), pa.string()),
        }), ["tok", "next"]).aggregate([([], "count_all")])
        return rename_agg(g, ["tok", "next"], ["tok", "next", "partial_n"])

    counts = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["tok", "next"]).aggregate(Sum("partial_n", alias_name="n"))
    )
    return grouped_topk(counts, "tok", ["n", "next"], [True, False], 1)


ORACLE_BIGRAM_NEXT = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents WHERE len(string_split(text, ' ')) >= 2
),
bi AS (
  SELECT unnest(ts[1:len(ts)-1]) AS tok, unnest(ts[2:len(ts)]) AS next FROM toks
),
c AS (SELECT tok, next, CAST(count(*) AS BIGINT) AS n FROM bi GROUP BY tok, next)
SELECT tok, next, n FROM c
QUALIFY row_number() OVER (PARTITION BY tok ORDER BY n DESC, next ASC) = 1
"""

QUERIES["bigram_next"] = q_bigram_next
ORACLES["bigram_next"] = ORACLE_BIGRAM_NEXT


# ===================================== event-type affinity (PMI)

def q_event_type_pmi(sf_dir: str, min_pair: int = 5):
    """PMI between users and event types: ln(N * c_ut / (c_u * c_t)) for
    (user, type) pairs with count >= min_pair, rounded to 6dp. Three
    combiner-first aggregates (pair, user, type marginals) + two
    distributed hash joins attach the marginals — association mining
    shaped exactly like the co-occurrence scoring a KG linker uses."""
    from ray.data.aggregate import Sum

    from odinson_ray.stages.shuffle import hash_join, rename_agg

    rd = _rd()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    def pair_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["user_id", "event_type"]),
                            ["user_id", "event_type"]).aggregate([([], "count_all")])
        return rename_agg(g, ["user_id", "event_type"],
                          ["user_id", "event_type", "partial_n"])

    pairs = (
        ev.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["user_id", "event_type"]).aggregate(Sum("partial_n", alias_name="c_ut"))
    )
    pairs = pairs.map_batches(
        lambda t: t.filter(pc.greater_equal(t["c_ut"], min_pair)),
        batch_format="pyarrow")

    def u_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["user_id"]), ["user_id"]).aggregate(
            [([], "count_all")])
        return rename_agg(g, ["user_id"], ["user_id", "partial_n"])

    def t_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["event_type"]), ["event_type"]).aggregate(
            [([], "count_all")])
        return rename_agg(g, ["event_type"], ["event_type", "partial_n"])

    users = (ev.map_batches(u_partial, batch_format="pyarrow")
             .groupby("user_id").aggregate(Sum("partial_n", alias_name="c_u")))
    types = (ev.map_batches(t_partial, batch_format="pyarrow")
             .groupby("event_type").aggregate(Sum("partial_n", alias_name="c_t")))
    n_events = ev.count()

    i64, s = pa.int64(), pa.string()
    j1 = hash_join(
        pairs, users, on="user_id",
        left_schema=pa.schema([("user_id", i64), ("event_type", s), ("c_ut", i64)]),
        right_schema=pa.schema([("user_id", i64), ("c_u", i64)]))
    j2 = hash_join(
        j1, types, on="event_type",
        left_schema=pa.schema([("user_id", i64), ("event_type", s),
                               ("c_ut", i64), ("c_u", i64)]),
        right_schema=pa.schema([("event_type", s), ("c_t", i64)]))

    def pmi(t: pa.Table) -> pa.Table:
        c_ut = t["c_ut"].to_numpy(zero_copy_only=False).astype(np.float64)
        c_u = t["c_u"].to_numpy(zero_copy_only=False).astype(np.float64)
        c_t = t["c_t"].to_numpy(zero_copy_only=False).astype(np.float64)
        v = np.round(np.log(float(n_events) * c_ut / (c_u * c_t)), 6)
        return pa.table({"user_id": t["user_id"], "event_type": t["event_type"],
                         "pmi": pa.array(v, pa.float64())})

    return j2.map_batches(pmi, batch_format="pyarrow")


ORACLE_EVENT_TYPE_PMI = """
WITH p AS (
  SELECT user_id, event_type, count(*) AS c_ut FROM events
  GROUP BY user_id, event_type HAVING count(*) >= 5
),
u AS (SELECT user_id, count(*) AS c_u FROM events GROUP BY user_id),
t AS (SELECT event_type, count(*) AS c_t FROM events GROUP BY event_type),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM events)
SELECT p.user_id, p.event_type,
       round(ln(n.n * p.c_ut / (u.c_u * t.c_t)), 6) AS pmi
FROM p JOIN u USING (user_id) JOIN t USING (event_type) CROSS JOIN n
"""

QUERIES["event_type_pmi"] = q_event_type_pmi
ORACLES["event_type_pmi"] = ORACLE_EVENT_TYPE_PMI


# ===================================== per-group z-score normalization

def q_value_zscore(sf_dir: str):
    """Per-event z-score of value within its event_type (population
    stddev), rounded to 4dp. Combiner computes per-batch (sum, sumsq,
    count) per group — three numbers per (group, batch) — the small
    groupby merges them into mean/std, and the per-event normalize is a
    broadcast-join of the tiny group-stats table inside map_batches
    (groups are event TYPES: bounded cardinality, so broadcast is the
    right side)."""
    import ray
    from ray.data.aggregate import Sum

    from odinson_ray.stages.link import get_broadcast
    from odinson_ray.stages.shuffle import rename_agg

    rd = _rd()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])

    def moments(t: pa.Table) -> pa.Table:
        v = t["value"]
        base = pa.table({
            "event_type": t["event_type"],
            "_s": v,
            "_s2": pc.multiply(v, v),
        })
        g = pa.TableGroupBy(base, ["event_type"]).aggregate(
            [("_s", "sum"), ("_s2", "sum"), ([], "count_all")])
        return rename_agg(g, ["event_type"], ["event_type", "_s", "_s2", "_n"])

    stats = {}
    for r in (
        ev.map_batches(moments, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("_s", alias_name="s"), Sum("_s2", alias_name="s2"),
                   Sum("_n", alias_name="n"))
        .take_all()  # one row per event TYPE (bounded small)
    ):
        mean = r["s"] / r["n"]
        var = max(r["s2"] / r["n"] - mean * mean, 0.0)
        stats[r["event_type"]] = (mean, float(np.sqrt(var)))
    ref = ray.put(stats)

    def zscore(t: pa.Table) -> pa.Table:
        st = get_broadcast(ref)
        types = t["event_type"].to_pylist()
        v = t["value"].to_numpy(zero_copy_only=False)
        mean = np.array([st[x][0] for x in types])
        std = np.array([st[x][1] for x in types])
        z = np.round((v - mean) / std, 4)
        return pa.table({"event_id": t["event_id"],
                         "z": pa.array(z, pa.float64())})

    return ev.map_batches(zscore, batch_format="pyarrow")


ORACLE_VALUE_ZSCORE = """
SELECT event_id,
       round((value - avg(value) OVER (PARTITION BY event_type))
             / stddev_pop(value) OVER (PARTITION BY event_type), 4) AS z
FROM events
"""

QUERIES["value_zscore"] = q_value_zscore
ORACLES["value_zscore"] = ORACLE_VALUE_ZSCORE


# ===================================== HLL approximate distinct (sketch)

def q_approx_users_per_type(sf_dir: str):
    """Approximate distinct users per event type via a mergeable
    HyperLogLog sketch (stages/sketch.py, p=12 -> ~1.6% rse). No SQL
    oracle (approximate by design — the exact twin is
    distinct_users_per_type); accuracy pinned by pytest against the
    exact counts."""
    from odinson_ray.stages.sketch import hll_distinct

    rd = _rd()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])
    return hll_distinct(ev, group="event_type", value="user_id",
                        out="approx_users")


QUERIES["approx_users_per_type"] = q_approx_users_per_type
# no ORACLES entry: approximate result, rows-only driver check by design


# ===================================== media near-dup groups (pHash stub)

def q_media_phash_groups(sf_dir: str):
    """Media near-duplicate groups: perceptual-hash each media span
    (actor pool; the hash itself is an honestly-STUBBED deterministic
    fake — no codecs in this environment — with the real pHash slotting
    into the same actor), then group by (kind, phash) keeping groups
    with >= 2 assets: (kind, phash, n_assets, canonical_ref = min ref).
    The shuffle key is the 16-char hash, never payload bytes."""
    from ray.data.aggregate import Count, Min

    from odinson_ray.sources.interleaved import read_interleaved
    from odinson_ray.stages.media import MediaPerceptualHasher

    def explode_media(t: pa.Table) -> pa.Table:
        spans = t["spans"].combine_chunks()
        flat = pc.list_flatten(spans)
        parents = pc.list_parent_indices(spans)
        ids = t["doc_id"].combine_chunks().take(parents)
        out = pa.table({
            "doc_id": ids,
            "kind": flat.field("kind"),
            "media_ref": flat.field("media_ref"),
        })
        return out.filter(pc.not_equal(out["kind"], "text"))

    manifest = read_interleaved(sf_dir).map_batches(
        explode_media, batch_format="pyarrow")
    hashed = manifest.map_batches(
        MediaPerceptualHasher, concurrency=2, batch_format="pyarrow")
    groups = (
        hashed.groupby(["kind", "phash"])
        .aggregate(Count(alias_name="n_assets"),
                   Min("media_ref", alias_name="canonical_ref"))
    )
    return groups.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_assets"], 2)),
        batch_format="pyarrow")


ORACLE_MEDIA_PHASH_GROUPS = """
WITH media AS (
  SELECT 'image' AS kind, 'media://img/' || doc_id AS media_ref, doc_id
  FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT 'audio' AS kind, 'media://aud/' || doc_id AS media_ref, doc_id
  FROM documents WHERE doc_id % 11 = 0
),
hashed AS (
  SELECT kind, media_ref,
         substr(md5(kind || ':' || CAST(doc_id % 97 AS VARCHAR)), 1, 16) AS phash
  FROM media
)
SELECT kind, phash, CAST(count(*) AS BIGINT) AS n_assets,
       min(media_ref) AS canonical_ref
FROM hashed GROUP BY kind, phash HAVING count(*) >= 2
"""

QUERIES["media_phash_groups"] = q_media_phash_groups
ORACLES["media_phash_groups"] = ORACLE_MEDIA_PHASH_GROUPS


# ===================================== embedding norms (vector kernel)

def q_embedding_norm_topk(sf_dir: str, k: int = 10):
    """Top-k embedding vectors by L2 norm (round 6, vec_id asc tie-break):
    per-batch zero-copy reshape of the fixed-width list column into an
    (n, d) numpy matrix, one vectorized norm, then the pruned global
    top-k."""
    from odinson_ray.stages.shuffle import global_topk

    rd = _rd()

    def norms(t: pa.Table) -> pa.Table:
        col = t["embedding"].combine_chunks()
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
        mat = flat.reshape(len(t), -1)
        return pa.table({
            "vec_id": t["vec_id"],
            "norm": pa.array(np.round(np.sqrt((mat * mat).sum(axis=1)), 6),
                             pa.float64()),
        })

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return global_topk(ds.map_batches(norms, batch_format="pyarrow"),
                       ["norm", "vec_id"], [True, False], k)


ORACLE_EMBEDDING_NORM_TOPK = """
SELECT vec_id,
       round(sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS norm
FROM embeddings
ORDER BY norm DESC, vec_id ASC LIMIT 10
"""

QUERIES["embedding_norm_topk"] = q_embedding_norm_topk
ORACLES["embedding_norm_topk"] = ORACLE_EMBEDDING_NORM_TOPK


# ===================================== bigram-LM document perplexity

def q_doc_perplexity(sf_dir: str):
    """Per-document cross-entropy under the corpus's own unsmoothed bigram
    model: mean over a doc's bigram positions of -ln(c(tok,next)/c(tok,*)),
    rounded to 6dp (docs with < 2 tokens drop out).

    Fully distributed, NO model on the driver (the tfidf join-path shape):
    bigram-count partials shuffle on coarse hash(head) partitions (the
    tiny-group rule, r4 sweep — one group per head would dispatch one
    task per vocabulary word); every head's rows land whole in one
    partition, where two in-task Arrow groupbys + one in-task join
    produce (bg, c_bg, c_head) with no cross-partition traffic. Per-doc
    distinct-bigram rows then hash-join the (bg, c_bg, c_head) model
    Dataset on the composite key; per-group (doc_id, sum_nll, n)
    partials come out of the join reducer and one groupby(doc_id)
    finishes the mean. At web scale the bigram model (|V|^2-bounded) is
    exactly the table one must NOT broadcast. A head's group is bounded
    by its distinct-successor count (vocabulary-, not corpus-sized), and
    the per-batch combiner keeps its fan-in to one row per batch."""
    from ray.data.aggregate import Sum

    from odinson_ray.stages.shuffle import hash_join, rename_agg

    rd = _rd()
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    SEP = "\x1f"

    def _bigram_tbl(t: pa.Table):
        """(row_idx, head, next) arrays as an Arrow table — bigrams never
        cross documents; all string work stays in Arrow kernels."""
        toks = pc.split_pattern(t["text"], " ")
        flat = pc.list_flatten(toks).combine_chunks()
        rows = pc.list_parent_indices(toks).combine_chunks()
        n = len(flat)
        if n < 2:
            return None
        head = flat.slice(0, n - 1)
        nxt = flat.slice(1, n - 1)
        same = pc.equal(rows.slice(0, n - 1), rows.slice(1, n - 1))
        return pa.table({"_row": rows.slice(0, n - 1), "head": head,
                         "next": nxt}).filter(same)

    def model_partial(t: pa.Table) -> pa.Table:
        bi = _bigram_tbl(t)
        if bi is None:
            return pa.table({"head": pa.array([], pa.string()),
                             "next": pa.array([], pa.string()),
                             "partial_n": pa.array([], pa.int64())})
        g = pa.TableGroupBy(bi.select(["head", "next"]),
                            ["head", "next"]).aggregate([([], "count_all")])
        return rename_agg(g, ["head", "next"], ["head", "next", "partial_n"])

    MODEL_PARTS = 512

    def add_head_part(t: pa.Table) -> pa.Table:
        import zlib
        h = np.array([zlib.crc32(x.encode()) for x in t["head"].to_pylist()],
                     dtype=np.int64)
        return t.append_column("_p", pa.array(h % MODEL_PARTS, pa.int64()))

    def model_partition(g: pa.Table) -> pa.Table:
        """One coarse partition of heads -> (bg, c_bg, c_head) rows."""
        g = g.combine_chunks()
        if g.num_rows == 0:
            return pa.table({"bg": pa.array([], pa.string()),
                             "c_bg": pa.array([], pa.int64()),
                             "c_head": pa.array([], pa.int64())})
        agg = pa.TableGroupBy(g.select(["head", "next", "partial_n"]),
                              ["head", "next"]).aggregate([("partial_n", "sum")])
        agg = rename_agg(agg, ["head", "next"], ["head", "next", "c_bg"])
        hd = pa.TableGroupBy(agg.select(["head", "c_bg"]),
                             ["head"]).aggregate([("c_bg", "sum")])
        hd = rename_agg(hd, ["head"], ["head", "c_head"])
        j = agg.join(hd, keys="head").combine_chunks()
        return pa.table({
            "bg": pc.binary_join_element_wise(j["head"].combine_chunks(),
                                              j["next"].combine_chunks(), SEP),
            "c_bg": j["c_bg"],
            "c_head": j["c_head"],
        })

    model_full = (
        docs.map_batches(model_partial, batch_format="pyarrow")
        .map_batches(add_head_part, batch_format="pyarrow")
        .groupby("_p")
        .map_groups(lambda g: model_partition(g.drop_columns(["_p"])),
                    batch_format="pyarrow")
    )

    def doc_rows(t: pa.Table) -> pa.Table:
        bi = _bigram_tbl(t)
        if bi is None:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "bg": pa.array([], pa.string()),
                             "n_pos": pa.array([], pa.int64())})
        ids = t["doc_id"].combine_chunks().cast(pa.int64()).take(bi["_row"])
        pairs = pa.table({
            "doc_id": ids,
            "bg": pc.binary_join_element_wise(bi["head"].combine_chunks(),
                                              bi["next"].combine_chunks(), SEP),
        })
        g = pa.TableGroupBy(pairs, ["doc_id", "bg"]).aggregate([([], "count_all")])
        return rename_agg(g, ["doc_id", "bg"], ["doc_id", "bg", "n_pos"])

    doc_bg = docs.map_batches(doc_rows, batch_format="pyarrow")
    i64, s = pa.int64(), pa.string()

    def score_group(g: pa.Table) -> pa.Table:
        """One bigram's group: every doc row gets the same -ln(c_bg/c_head);
        emit per-doc partial (sum_nll, n) rows."""
        nll = -np.log(g["c_bg"].to_numpy(zero_copy_only=False).astype(np.float64)
                      / g["c_head"].to_numpy(zero_copy_only=False).astype(np.float64))
        n_pos = g["n_pos"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "doc_id": g["doc_id"],
            "_nll": pa.array(nll * n_pos, pa.float64()),
            "_n": pa.array(n_pos, pa.float64()),
        })

    joined = hash_join(
        doc_bg, model_full, on="bg",
        left_schema=pa.schema([("doc_id", i64), ("bg", s), ("n_pos", i64)]),
        right_schema=pa.schema([("bg", s), ("c_bg", i64), ("c_head", i64)]),
        merge_post=score_group, merge_post_coarse=True)

    def partial_sums(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["doc_id", "_nll", "_n"]),
                            ["doc_id"]).aggregate([("_nll", "sum"), ("_n", "sum")])
        return rename_agg(g, ["doc_id"], ["doc_id", "_nll", "_n"])

    sums = (
        joined.map_batches(partial_sums, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("_nll", alias_name="nll"), Sum("_n", alias_name="n"))
    )
    return sums.map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "avg_nll": pa.array(
                np.round(t["nll"].to_numpy(zero_copy_only=False)
                         / t["n"].to_numpy(zero_copy_only=False), 6),
                pa.float64()),
        }),
        batch_format="pyarrow")


ORACLE_DOC_PERPLEXITY = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
  WHERE len(string_split(text, ' ')) >= 2
),
bi AS (
  SELECT doc_id, unnest(ts[1:len(ts)-1]) AS tok, unnest(ts[2:len(ts)]) AS next
  FROM toks
),
m AS (SELECT tok, next, CAST(count(*) AS DOUBLE) AS c_bg FROM bi GROUP BY tok, next),
h AS (SELECT tok, CAST(count(*) AS DOUBLE) AS c_head FROM bi GROUP BY tok)
SELECT bi.doc_id, round(avg(-ln(m.c_bg / h.c_head)), 6) AS avg_nll
FROM bi JOIN m USING (tok, next) JOIN h USING (tok)
GROUP BY bi.doc_id
"""

QUERIES["doc_perplexity"] = q_doc_perplexity
ORACLES["doc_perplexity"] = ORACLE_DOC_PERPLEXITY


# ===================================== event transition matrix (Markov counts)

def q_event_transitions(sf_dir: str):
    """(from_type, to_type, n) transition counts over each user's
    (ts, event_id)-ordered stream — skew-safe two-stage decomposition
    (stages/window.event_transitions): within-bucket pairs + one boundary
    row per (user, bucket); no task ever holds more than one bucket of
    one user. Week buckets (A/B at sf0.1: 1d 8.1 s, 7d 3.4 s, identical
    output — daily buckets made most groups 1-2 rows, pure task
    overhead)."""
    from odinson_ray.stages.window import event_transitions

    rd = _rd()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id", "event_type"])
    return event_transitions(ev, bucket_s=7 * 86400)


ORACLE_EVENT_TRANSITIONS = """
WITH s AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
)
SELECT event_type AS from_type, next_type AS to_type,
       CAST(count(*) AS BIGINT) AS n
FROM s WHERE next_type IS NOT NULL
GROUP BY from_type, to_type
"""

QUERIES["event_transitions"] = q_event_transitions
ORACLES["event_transitions"] = ORACLE_EVENT_TRANSITIONS


# ===================================== funnel (A strictly before B)

def q_funnel_users(sf_dir: str, a: str = "view", b: str = "purchase"):
    """Number of users with at least one '{a}' event strictly before a
    '{b}' event (min ts(a) < max ts(b)): per-batch min/max combiner per
    user, one groupby, one filtered count — three numbers per (user,
    batch) cross the shuffle, never events."""
    from ray.data.aggregate import Max, Min

    from odinson_ray.stages.shuffle import rename_agg

    rd = _rd()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        tsv = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        base = pa.table({
            "user_id": t["user_id"],
            "_a": pc.if_else(pc.equal(t["event_type"], a), tsv,
                             pa.nulls(len(t), pa.int64())),
            "_b": pc.if_else(pc.equal(t["event_type"], b), tsv,
                             pa.nulls(len(t), pa.int64())),
        })
        g = pa.TableGroupBy(base, ["user_id"]).aggregate(
            [("_a", "min"), ("_b", "max")])
        return rename_agg(g, ["user_id"], ["user_id", "_a", "_b"])

    stats = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("_a", alias_name="first_a"),
                   Max("_b", alias_name="last_b"))
    )
    hits = stats.map_batches(
        lambda t: t.filter(pc.and_kleene(
            pc.and_kleene(pc.is_valid(t["first_a"]), pc.is_valid(t["last_b"])),
            pc.less(t["first_a"], t["last_b"]))),
        batch_format="pyarrow")
    return pd.DataFrame({"n_users": [int(hits.count())]})


ORACLE_FUNNEL_USERS = """
WITH s AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS first_a,
         max(CASE WHEN event_type = 'purchase' THEN ts END) AS last_b
  FROM events GROUP BY user_id
)
SELECT CAST(count(*) AS BIGINT) AS n_users
FROM s WHERE first_a IS NOT NULL AND last_b IS NOT NULL AND first_a < last_b
"""

QUERIES["funnel_users"] = q_funnel_users
ORACLES["funnel_users"] = ORACLE_FUNNEL_USERS


# ===================================== per-label embedding centroids

def q_embedding_centroids(sf_dir: str):
    """Per-label per-dimension centroid of the embedding column in long
    format (label, dim, centroid round 6): per-batch (n, d) matrix
    reshape + one np.add.at per label -> (label, dim, psum, pn) partial
    rows (|labels| x d per batch), one groupby finishes the mean. The
    vector column itself never shuffles."""
    from ray.data.aggregate import Sum

    rd = _rd()

    def partial(t: pa.Table) -> pa.Table:
        col = t["embedding"].combine_chunks()
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(np.float64)
        mat = flat.reshape(len(t), -1)
        d = mat.shape[1]
        labels = t["label"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), d))
        np.add.at(sums, inv, mat)
        counts = np.bincount(inv, minlength=len(uniq))
        return pa.table({
            "label": pa.array(np.repeat(uniq, d), pa.int32()),
            "dim": pa.array(np.tile(np.arange(1, d + 1), len(uniq)), pa.int32()),
            "_s": pa.array(sums.ravel(), pa.float64()),
            "_n": pa.array(np.repeat(counts, d).astype(np.int64)),
        })

    sums = (
        rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                        columns=["embedding", "label"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("_s", alias_name="s"), Sum("_n", alias_name="n"))
    )
    return sums.map_batches(
        lambda t: pa.table({
            "label": t["label"],
            "dim": t["dim"],
            "centroid": pa.array(
                np.round(t["s"].to_numpy(zero_copy_only=False)
                         / t["n"].to_numpy(zero_copy_only=False), 6),
                pa.float64()),
        }),
        batch_format="pyarrow")


ORACLE_EMBEDDING_CENTROIDS = """
WITH flat AS (
  SELECT label, unnest(embedding) AS v,
         generate_subscripts(embedding, 1) AS dim
  FROM embeddings
)
SELECT CAST(label AS INTEGER) AS label, CAST(dim AS INTEGER) AS dim,
       round(avg(CAST(v AS DOUBLE)), 6) AS centroid
FROM flat GROUP BY label, dim
"""

QUERIES["embedding_centroids"] = q_embedding_centroids
ORACLES["embedding_centroids"] = ORACLE_EMBEDDING_CENTROIDS


# ===================================== fuzzy decontamination (MinHash)

def q_fuzzy_decontaminate(sf_dir: str):
    """Training docs near-duplicating an eval doc (LSH candidates +
    exact-jaccard >= 0.9 verify; eval set = doc_id % 10 == 0, broadcast
    once). stages/curate.fuzzy_decontaminate."""
    from odinson_ray.stages.curate import fuzzy_decontaminate

    return fuzzy_decontaminate(sf_dir, threshold=0.9, eval_mod=10)


ORACLE_FUZZY_DECONTAMINATE = """
WITH sh AS (
  SELECT doc_id, list_distinct(list_transform(generate_series(1, greatest(len(t) - 2, 1)),
         i -> t[i] || CASE WHEN t[i+1] IS NULL THEN '' ELSE ' ' || t[i+1] END
                   || CASE WHEN t[i+2] IS NULL THEN '' ELSE ' ' || t[i+2] END)) AS shingles
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
)
SELECT a.doc_id, b.doc_id AS eval_id,
       round(len(list_intersect(a.shingles, b.shingles)) * 1.0 /
             len(list_distinct(list_concat(a.shingles, b.shingles))), 6) AS j
FROM sh a JOIN sh b ON b.doc_id % 10 = 0 AND a.doc_id % 10 != 0
WHERE len(list_intersect(a.shingles, b.shingles)) * 1.0 /
      len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.9
"""

QUERIES["fuzzy_decontaminate"] = q_fuzzy_decontaminate
ORACLES["fuzzy_decontaminate"] = ORACLE_FUZZY_DECONTAMINATE


# ===================================== per-source length-percentile filter

def q_per_source_long_docs(sf_dir: str):
    """Docs longer than their source's p90 token count (quantile_disc
    semantics: sorted[ceil(0.9 n)-1], strictly greater). The SCALABLE
    exact-quantile shape: per-batch (source, n_tokens, count) combiner ->
    one groupby over DISTINCT (source, length) rows -> per-source
    threshold from cumulative counts (distinct lengths per source is
    bounded, never row count) -> thresholds broadcast -> one filtered
    map over the doc stream. Contrast value_quantiles' one-group-per-key
    form, which holds a key's raw rows."""
    import math

    import ray
    from ray.data.aggregate import Sum

    from odinson_ray.stages.link import get_broadcast
    from odinson_ray.stages.shuffle import rename_agg

    rd = _rd()
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source", "text"])

    def len_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        base = pa.table({
            "source": t["source"],
            "n_tokens": pc.cast(pc.list_value_length(toks), pa.int64()),
        })
        g = pa.TableGroupBy(base, ["source", "n_tokens"]).aggregate(
            [([], "count_all")])
        return rename_agg(g, ["source", "n_tokens"],
                          ["source", "n_tokens", "partial_n"])

    hist = (
        docs.map_batches(len_partial, batch_format="pyarrow")
        .groupby(["source", "n_tokens"]).aggregate(Sum("partial_n", alias_name="c"))
    )

    def threshold(g: pa.Table) -> pa.Table:
        o = pc.sort_indices(g["n_tokens"])
        lens = g["n_tokens"].take(o).to_numpy(zero_copy_only=False)
        counts = g["c"].take(o).to_numpy(zero_copy_only=False)
        n = int(counts.sum())
        rank = max(0, math.ceil(0.9 * n) - 1)
        p90 = int(lens[np.searchsorted(np.cumsum(counts), rank + 1)])
        return pa.table({"source": g["source"].slice(0, 1),
                         "p90": pa.array([p90], pa.int64())})

    thresholds = {r["source"]: r["p90"] for r in
                  hist.groupby("source").map_groups(
                      threshold, batch_format="pyarrow").take_all()}
    ref = ray.put(thresholds)

    def long_docs(t: pa.Table) -> pa.Table:
        th = get_broadcast(ref)
        toks = pc.split_pattern(t["text"], " ")
        n_tok = pc.cast(pc.list_value_length(toks), pa.int64())
        cut = pa.array([th[s] for s in t["source"].to_pylist()], pa.int64())
        out = pa.table({"doc_id": t["doc_id"], "source": t["source"],
                        "n_tokens": n_tok})
        return out.filter(pc.greater(n_tok, cut))

    return docs.map_batches(long_docs, batch_format="pyarrow")


ORACLE_PER_SOURCE_LONG_DOCS = """
WITH d AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
q AS (SELECT source, quantile_disc(n_tokens, 0.9) AS p90 FROM d GROUP BY source)
SELECT d.doc_id, d.source, CAST(d.n_tokens AS BIGINT) AS n_tokens
FROM d JOIN q USING (source) WHERE d.n_tokens > q.p90
"""

QUERIES["per_source_long_docs"] = q_per_source_long_docs
ORACLES["per_source_long_docs"] = ORACLE_PER_SOURCE_LONG_DOCS


# ===================================== C4-style exact line-level dedup

def q_line_dedup(sf_dir: str):
    """Exact line-level deduplication (C4 / RefinedWeb-style: keep only
    the globally FIRST occurrence of every duplicated line, reassemble
    each document from its surviving lines). The corpus has no newlines,
    so a "line" is each consecutive 10-token segment — the operator is
    delimiter-agnostic; swap the segmentation for a newline split on
    real corpora. Reference analogue: corpus-level text hygiene ahead of
    indexing (/root/reference/extra/.../AnnotateText.scala prepares docs
    wholesale; line hygiene is the LLM-curation extension).

    Shape: one flat-map (doc -> line rows), ONE groupby(line) that keeps
    the (doc_id, line_no)-min occurrence per distinct line (hot
    boilerplate lines are k rows in, 1 row out — linear, never
    quadratic), one groupby(doc_id) reassembly. Two shuffles total, both
    over line-granular rows; nothing touches the driver.
    """
    LINE_TOKS = 10

    rd = _rd()
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def to_lines(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        flat = pc.list_flatten(toks).to_pandas()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        parent = np.repeat(np.arange(len(t)), lens)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        pos = np.arange(len(flat)) - np.repeat(starts, lens)
        line_no = pos // LINE_TOKS
        gid = parent.astype(np.int64) * (1 << 20) + line_no
        # one ' '.join per LINE (<= LINE_TOKS strings each), not per token
        joined = pd.Series(flat).groupby(gid, sort=True).agg(" ".join)
        g = joined.index.to_numpy()
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids[g >> 20], pa.int64()),
            "line_no": pa.array((g & ((1 << 20) - 1)).astype(np.int64)),
            "line": pa.array(joined.to_numpy(), pa.string()),
        })

    # keep-first per distinct line is argmin over (doc_id, line_no): a
    # PURE aggregate on one packed order key (tiny-group rule, r4 sweep —
    # one group per distinct line would dispatch one task per line).
    # LN_CAP bounds lines/doc at 4M (40M space-split tokens); doc_id must
    # stay under 2^41 for the pack to fit int64.
    LN_CAP = 1 << 22
    from ray.data.aggregate import Min
    from odinson_ray.stages.sketch import _splitmix64
    PARTS = 512

    def pack(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        ln = t["line_no"].to_numpy(zero_copy_only=False)
        if len(ln) and int(ln.max()) >= LN_CAP:
            raise ValueError("line_no exceeds LN_CAP pack bound")
        return pa.table({"line": t["line"],
                         "okey": pa.array(d * LN_CAP + ln, pa.int64())})

    def unpack(t: pa.Table) -> pa.Table:
        ok = t["okey"].to_numpy(zero_copy_only=False)
        d = ok // LN_CAP
        p = (_splitmix64(d.astype(np.uint64)) % np.uint64(PARTS)).astype(np.int64)
        return pa.table({"doc_id": pa.array(d, pa.int64()),
                         "line_no": pa.array(ok % LN_CAP, pa.int64()),
                         "line": t["line"],
                         "_p": pa.array(p, pa.int64())})

    def reassemble_partition(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        idx = pc.sort_indices(g, sort_keys=[("doc_id", "ascending"),
                                            ("line_no", "ascending")])
        g = g.take(idx)
        if g.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "text": pa.array([], pa.string())})
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        joined = g["line"].to_pandas().groupby(d, sort=True).agg(" ".join)
        return pa.table({
            "doc_id": pa.array(joined.index.to_numpy(), pa.int64()),
            "text": pa.array(joined.to_numpy(), pa.string()),
        })

    lines = docs.map_batches(to_lines, batch_format="pyarrow")
    kept = (lines.map_batches(pack, batch_format="pyarrow")
            .groupby("line").aggregate(Min("okey", alias_name="okey"))
            .map_batches(unpack, batch_format="pyarrow"))
    return (kept.groupby("_p")
            .map_groups(lambda g: reassemble_partition(g.drop_columns(["_p"])),
                        batch_format="pyarrow"))


ORACLE_LINE_DEDUP = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
lines AS (
  SELECT doc_id,
         unnest(generate_series(0, CAST(ceil(len(t)/10.0) AS INT) - 1)) AS line_no,
         unnest(list_transform(generate_series(0, CAST(ceil(len(t)/10.0) AS INT) - 1),
                i -> array_to_string(t[i*10+1 : i*10+10], ' '))) AS line
  FROM toks
),
kept AS (
  SELECT doc_id, line_no, line,
         row_number() OVER (PARTITION BY line ORDER BY doc_id, line_no) AS rn
  FROM lines
)
SELECT doc_id, string_agg(line, ' ' ORDER BY line_no) AS text
FROM kept WHERE rn = 1 GROUP BY doc_id
"""

QUERIES["line_dedup"] = q_line_dedup
ORACLES["line_dedup"] = ORACLE_LINE_DEDUP


# ===================================== deterministic per-group sample

def q_group_sample_k(sf_dir: str):
    """Uniform k-per-group sample WITHOUT an RNG: keep the k events whose
    md5(event_id) hex digest sorts smallest within each event_type
    (bottom-k-by-hash == reservoir sampling made deterministic — same
    sample at any parallelism, any retry, any shard order; mergeable:
    bottom-k of a union is the bottom-k of per-part bottom-ks). Runs on
    grouped_topk's per-batch combiner, so the shuffle moves <= k rows per
    key per batch."""
    from odinson_ray.stages.shuffle import grouped_topk

    rd = _rd()
    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "event_type"])

    def with_hash(t: pa.Table) -> pa.Table:
        import hashlib

        ids = t["event_id"].to_numpy(zero_copy_only=False)
        h = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        return t.append_column("h", pa.array(h, pa.string()))

    sampled = grouped_topk(
        events.map_batches(with_hash, batch_format="pyarrow"),
        by="event_type", cols=["h", "event_id"],
        descending=[False, False], k=5)
    return sampled.select_columns(["event_type", "event_id"])


ORACLE_GROUP_SAMPLE_K = """
SELECT event_type, event_id FROM (
  SELECT event_type, event_id,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
  FROM events) WHERE rn <= 5
"""

QUERIES["group_sample_k"] = q_group_sample_k
ORACLES["group_sample_k"] = ORACLE_GROUP_SAMPLE_K


# ===================================== Bloom-filter semi join

def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return x ^ (x >> np.uint64(31))


_BLOOM_BITS = 1 << 17  # 16 KiB bitmap, fixed regardless of key count
_BLOOM_K = 4


def _bloom_positions(keys: np.ndarray) -> np.ndarray:
    """(n, k) bit positions via double hashing of splitmix64."""
    k64 = keys.astype(np.uint64)
    h1 = _splitmix64(k64)
    h2 = _splitmix64(k64 ^ np.uint64(0xDEADBEEFCAFEF00D)) | np.uint64(1)
    i = np.arange(_BLOOM_K, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None])
            % np.uint64(_BLOOM_BITS)).astype(np.int64)


def q_bloom_semi_join(sf_dir: str):
    """orders SEMI JOIN high-balance customers via a broadcast Bloom
    filter + exact verify — the shuffle-free semi-join shape for a big
    probe side vs a selective build side. The build side never ships its
    keys to the driver: each build batch emits one FIXED-SIZE (16 KiB)
    bitmap row, the driver ORs those tiny blobs and ray.puts the result
    (driver memory is #blocks x 16 KiB, independent of key count). The
    probe is a vectorized bit test inside map_batches that drops the vast
    majority of rows BEFORE the only shuffle: the exact semi hash_join
    that removes Bloom false positives, so the result is exact, not
    approximate."""
    import ray

    from odinson_ray.stages.link import get_broadcast
    from odinson_ray.stages.shuffle import hash_join

    rd = _rd()
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_acctbal"]) \
        .filter(expr="c_acctbal > 9000.0") \
        .select_columns(["c_custkey"])

    def build(t: pa.Table) -> pa.Table:
        bits = np.zeros(_BLOOM_BITS, dtype=bool)
        keys = t["c_custkey"].to_numpy(zero_copy_only=False)
        if len(keys):
            bits[_bloom_positions(keys).ravel()] = True
        return pa.table({"bits": pa.array([np.packbits(bits).tobytes()],
                                          pa.binary())})

    partials = cust.map_batches(build, batch_format="pyarrow").take_all()
    bitmap = np.zeros(_BLOOM_BITS // 8, dtype=np.uint8)
    for row in partials:
        bitmap |= np.frombuffer(row["bits"], dtype=np.uint8)
    ref = ray.put(np.unpackbits(bitmap).astype(bool))

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])

    def probe(t: pa.Table) -> pa.Table:
        bits = get_broadcast(ref)
        keys = t["o_custkey"].to_numpy(zero_copy_only=False)
        if not len(keys):
            return t
        hit = bits[_bloom_positions(keys)].all(axis=1)
        return t.filter(pa.array(hit))

    candidates = orders.map_batches(probe, batch_format="pyarrow")
    out = hash_join(
        candidates, cust, on="o_custkey", right_on="c_custkey", how="semi",
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("o_custkey", pa.int64())]),
        right_schema=pa.schema([("c_custkey", pa.int64())]))
    return out.select_columns(["o_orderkey", "o_custkey"])


ORACLE_BLOOM_SEMI_JOIN = """
SELECT o_orderkey, o_custkey FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0)
"""

QUERIES["bloom_semi_join"] = q_bloom_semi_join
ORACLES["bloom_semi_join"] = ORACLE_BLOOM_SEMI_JOIN


# ===================================== CUBE grouping sets from one combiner

def q_cube_lineitem(sf_dir: str):
    """GROUP BY CUBE (l_returnflag, l_linestatus): all FOUR grouping sets
    derived inside the per-batch combiner (<= |fxs| + |f| + |s| + 1 rows
    per batch), one global groupby serves every set — same shape as
    rollup_lineitem with the status-only set added."""
    rd = _rd()
    from ray.data.aggregate import Sum

    ALL = "__ALL__"

    def partial(t: pa.Table) -> pa.Table:
        base = pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "q": t["l_quantity"],
        })
        both = pa.TableGroupBy(base, ["l_returnflag", "l_linestatus"]).aggregate(
            [("q", "sum")])
        flag = pa.TableGroupBy(base.drop_columns(["l_linestatus"]),
                               ["l_returnflag"]).aggregate([("q", "sum")])
        flag = flag.add_column(1, "l_linestatus",
                               pa.array([ALL] * flag.num_rows, pa.string()))
        stat = pa.TableGroupBy(base.drop_columns(["l_returnflag"]),
                               ["l_linestatus"]).aggregate([("q", "sum")])
        stat = stat.add_column(0, "l_returnflag",
                               pa.array([ALL] * stat.num_rows, pa.string()))
        tot = pa.table({
            "l_returnflag": pa.array([ALL], pa.string()),
            "l_linestatus": pa.array([ALL], pa.string()),
            "q_sum": pa.array([pc.sum(base["q"]).as_py() or 0.0], pa.float64()),
        })
        out = pa.concat_tables([both, flag, stat, tot], promote_options="default")
        return out.rename_columns(["l_returnflag", "l_linestatus", "partial_q"])

    agg = (
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_returnflag", "l_linestatus", "l_quantity"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("partial_q", alias_name="sum_qty"))
    )
    return agg.map_batches(
        lambda t: t.set_column(t.column_names.index("sum_qty"), "sum_qty",
                               pc.round(t["sum_qty"], 2)),
        batch_format="pyarrow",
    )


ORACLE_CUBE_LINEITEM = """
SELECT COALESCE(l_returnflag, '__ALL__') AS l_returnflag,
       COALESCE(l_linestatus, '__ALL__') AS l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""

QUERIES["cube_lineitem"] = q_cube_lineitem
ORACLES["cube_lineitem"] = ORACLE_CUBE_LINEITEM


# ===================================== distributed exact percent_rank

def q_value_percent_rank(sf_dir: str):
    """PERCENT_RANK() OVER (PARTITION BY event_type ORDER BY value) for
    every event — exact, WITHOUT a per-key sort of the raw rows. The
    distinct-value histogram (value is 2dp-quantized, so per-key distinct
    count is bounded — value_quantiles documents the same precondition)
    yields rank(v) = 1 + #smaller from cumulative counts; the per-value
    rank table then joins BACK to the event stream on a composite
    (event_type, value) key — a distributed hash_join, never a broadcast
    of the value dictionary."""
    from ray.data.aggregate import Sum

    from odinson_ray.stages.shuffle import hash_join, rename_agg

    rd = _rd()
    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "event_type", "value"])

    def hist_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["event_type", "value"]),
                            ["event_type", "value"]).aggregate([([], "count_all")])
        return rename_agg(g, ["event_type", "value"],
                          ["event_type", "value", "partial_n"])

    hist = (
        events.map_batches(hist_partial, batch_format="pyarrow")
        .groupby(["event_type", "value"]).aggregate(Sum("partial_n", alias_name="c"))
    )

    def ranks(g: pa.Table) -> pa.Table:
        o = pc.sort_indices(g["value"])
        v = g["value"].take(o)
        c = g["c"].take(o).to_numpy(zero_copy_only=False)
        n = int(c.sum())
        smaller = np.concatenate([[0], np.cumsum(c)[:-1]])
        prk = np.round(smaller / max(n - 1, 1), 6)
        key = pc.binary_join_element_wise(
            g["event_type"].take(o).cast(pa.string()),
            pc.cast(v, pa.string()), "|")
        return pa.table({"_ck": key, "prk": pa.array(prk, pa.float64())})

    rank_table = hist.groupby("event_type").map_groups(
        ranks, batch_format="pyarrow")

    def with_key(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            t["event_type"].cast(pa.string()),
            pc.cast(t["value"], pa.string()), "|")
        return t.append_column("_ck", key)

    joined = hash_join(
        events.map_batches(with_key, batch_format="pyarrow"),
        rank_table, on="_ck",
        left_schema=pa.schema([("event_id", pa.int64()),
                               ("event_type", pa.string()),
                               ("value", pa.float64()),
                               ("_ck", pa.string())]),
        right_schema=pa.schema([("_ck", pa.string()),
                                ("prk", pa.float64())]))
    return joined.select_columns(["event_id", "event_type", "value", "prk"])


ORACLE_VALUE_PERCENT_RANK = """
SELECT event_id, event_type, value,
       round(percent_rank() OVER (PARTITION BY event_type ORDER BY value), 6) AS prk
FROM events
"""

QUERIES["value_percent_rank"] = q_value_percent_rank
ORACLES["value_percent_rank"] = ORACLE_VALUE_PERCENT_RANK


# ===================================== CountMin heavy hitters (approximate)

def q_cms_token_counts(sf_dir: str):
    """Approximate corpus heavy hitters from a 128-KiB linear sketch
    (stages/sketch.cms_token_counts): per-batch CMS partials + local
    candidates, tree-merged; the token stream itself never shuffles
    (contrast exact top_tokens, which groups distinct tokens).
    Approximate BY DESIGN -> no SQL oracle; the pytest pins CMS's
    one-sided error bound against exact counts."""
    from odinson_ray.stages.sketch import cms_token_counts

    rd = _rd()
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return cms_token_counts(docs, top_k=20)


QUERIES["cms_token_counts"] = q_cms_token_counts


# ===================================== star join (pre-agg + broadcast dims)

def q_star_join_revenue(sf_dir: str):
    """Revenue by REGION over the orders->customer->nation->region star —
    the two star-schema scale patterns composed: (1) orders PRE-AGGREGATE
    to (custkey, partial revenue) inside each batch BEFORE the fact-fact
    join, so the join shuffles one row per customer per batch instead of
    one per order; (2) the nation/region dimension chain is a broadcast
    dict (ray.put once, read per actor) — dimension tables never shuffle.
    One hash_join + one tiny final groupby."""
    import ray
    from ray.data.aggregate import Sum

    from odinson_ray.stages.link import get_broadcast
    from odinson_ray.stages.shuffle import hash_join, rename_agg

    rd = _rd()

    nation = pd.read_parquet(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_regionkey"])
    region = pd.read_parquet(f"{sf_dir}/region.parquet",
                             columns=["r_regionkey", "r_name"])
    rname = dict(zip(region.r_regionkey, region.r_name))
    nat_to_region = {int(n): rname[int(r)] for n, r in
                     zip(nation.n_nationkey, nation.n_regionkey)}
    dims = ray.put(nat_to_region)

    def order_partial(t: pa.Table) -> pa.Table:
        # money sums in exact integer cents: float partial sums of ~1e9
        # totals differ by summation order at the ULP, which breaks
        # hash-exact comparison; int64 cents are associative
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                        pa.int64())
        g = pa.TableGroupBy(
            pa.table({"o_custkey": t["o_custkey"], "cents": cents}),
            ["o_custkey"]).aggregate([("cents", "sum")])
        return rename_agg(g, ["o_custkey"], ["o_custkey", "rev"])

    pre = (
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_totalprice"])
        .map_batches(order_partial, batch_format="pyarrow")
        .groupby("o_custkey").aggregate(Sum("rev", alias_name="rev"))
    )

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    joined = hash_join(
        pre, cust, on="o_custkey", right_on="c_custkey",
        left_schema=pa.schema([("o_custkey", pa.int64()),
                               ("rev", pa.int64())]),
        right_schema=pa.schema([("c_custkey", pa.int64()),
                                ("c_nationkey", pa.int64())]))

    def by_region(t: pa.Table) -> pa.Table:
        lut = get_broadcast(dims)
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False)
        base = pa.table({
            "r_name": pa.array([lut[int(k)] for k in nk], pa.string()),
            "rev": t["rev"],
        })
        g = pa.TableGroupBy(base, ["r_name"]).aggregate([("rev", "sum")])
        return rename_agg(g, ["r_name"], ["r_name", "rev"])

    agg = (joined.map_batches(by_region, batch_format="pyarrow")
           .groupby("r_name").aggregate(Sum("rev", alias_name="revenue")))
    return agg.map_batches(
        lambda t: t.set_column(
            t.column_names.index("revenue"), "revenue",
            pc.round(pc.divide(pc.cast(t["revenue"], pa.float64()), 100.0), 2)),
        batch_format="pyarrow")


ORACLE_STAR_JOIN_REVENUE = """
SELECT r_name,
       round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""

QUERIES["star_join_revenue"] = q_star_join_revenue
ORACLES["star_join_revenue"] = ORACLE_STAR_JOIN_REVENUE


# ===================================== column profiling

def q_profile_columns(sf_dir: str):
    """Per-column data profile (count / nulls / exact distinct / min /
    max) over lineitem's numeric measures — the schema-validation pass a
    100-TB ingest runs first. Counts come from a per-batch combiner;
    distinct/min/max run over DISTINCT (column, value) rows (2dp-
    quantized measures, the value_quantiles precondition), so the
    shuffle is bounded by distinct values, never row count. Only
    #columns rows ever reach the driver."""
    from ray.data.aggregate import Max, Min, Sum

    from odinson_ray.stages.shuffle import rename_agg

    COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    rd = _rd()
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=COLS)

    def count_partial(t: pa.Table) -> pa.Table:
        names, n, n_null = [], [], []
        for c in COLS:
            names.append(c)
            n.append(len(t))
            n_null.append(t[c].null_count)
        return pa.table({"col_name": pa.array(names, pa.string()),
                         "pn": pa.array(n, pa.int64()),
                         "pnull": pa.array(n_null, pa.int64())})

    counts = (li.map_batches(count_partial, batch_format="pyarrow")
              .groupby("col_name")
              .aggregate(Sum("pn", alias_name="n"),
                         Sum("pnull", alias_name="n_null"))
              ).take_all()

    def distinct_partial(t: pa.Table) -> pa.Table:
        parts = []
        for c in COLS:
            v = pc.unique(pc.drop_null(t[c].combine_chunks()))
            parts.append(pa.table({
                "col_name": pa.array([c] * len(v), pa.string()),
                "value": v.cast(pa.float64()),
            }))
        return pa.concat_tables(parts)

    from ray.data.aggregate import Count

    stats = (li.map_batches(distinct_partial, batch_format="pyarrow")
             .groupby(["col_name", "value"])
             .aggregate(Count(alias_name="_dup"))
             .groupby("col_name")
             .aggregate(Min("value", alias_name="min_v"),
                        Max("value", alias_name="max_v"),
                        Count(alias_name="n_distinct"))
             ).take_all()

    by_col = {r["col_name"]: dict(r) for r in counts}
    for r in stats:
        by_col[r["col_name"]].update(r)
    rows = [by_col[c] for c in COLS]
    return pa.table({
        "col_name": pa.array([r["col_name"] for r in rows], pa.string()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
        "n_null": pa.array([r["n_null"] for r in rows], pa.int64()),
        "n_distinct": pa.array([r["n_distinct"] for r in rows], pa.int64()),
        "min_v": pa.array([round(r["min_v"], 6) for r in rows], pa.float64()),
        "max_v": pa.array([round(r["max_v"], 6) for r in rows], pa.float64()),
    })


ORACLE_PROFILE_COLUMNS = """
SELECT 'l_quantity' AS col_name, count(*) AS n,
       count(*) - count(l_quantity) AS n_null,
       count(DISTINCT l_quantity) AS n_distinct,
       round(min(l_quantity), 6) AS min_v, round(max(l_quantity), 6) AS max_v
FROM lineitem
UNION ALL
SELECT 'l_extendedprice', count(*), count(*) - count(l_extendedprice),
       count(DISTINCT l_extendedprice),
       round(min(l_extendedprice), 6), round(max(l_extendedprice), 6)
FROM lineitem
UNION ALL
SELECT 'l_discount', count(*), count(*) - count(l_discount),
       count(DISTINCT l_discount),
       round(min(l_discount), 6), round(max(l_discount), 6)
FROM lineitem
UNION ALL
SELECT 'l_tax', count(*), count(*) - count(l_tax),
       count(DISTINCT l_tax),
       round(min(l_tax), 6), round(max(l_tax), 6)
FROM lineitem
"""

QUERIES["profile_columns"] = q_profile_columns
ORACLES["profile_columns"] = ORACLE_PROFILE_COLUMNS


# ===================================== per-group winsorization

def q_winsorize_values(sf_dir: str):
    """Per-group outlier clipping (winsorize at [p05, p95], quantile_disc
    semantics) — the robust-stats cousin of value_zscore. Thresholds come
    from the distinct-value histogram (one bounded groupby), broadcast as
    a per-group pair, applied in one vectorized map over the stream."""
    import math

    import ray
    from ray.data.aggregate import Sum

    from odinson_ray.stages.link import get_broadcast
    from odinson_ray.stages.shuffle import rename_agg

    rd = _rd()
    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "event_type", "value"])

    def hist_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["event_type", "value"]),
                            ["event_type", "value"]).aggregate([([], "count_all")])
        return rename_agg(g, ["event_type", "value"],
                          ["event_type", "value", "partial_n"])

    hist = (events.map_batches(hist_partial, batch_format="pyarrow")
            .groupby(["event_type", "value"])
            .aggregate(Sum("partial_n", alias_name="c")))

    def bounds(g: pa.Table) -> pa.Table:
        o = pc.sort_indices(g["value"])
        v = g["value"].take(o).to_numpy(zero_copy_only=False)
        c = np.cumsum(g["c"].take(o).to_numpy(zero_copy_only=False))
        n = int(c[-1])
        pick = lambda q: float(v[np.searchsorted(c, max(1, math.ceil(q * n)))])
        return pa.table({
            "event_type": pa.array([g["event_type"][0].as_py()], pa.string()),
            "lo": pa.array([pick(0.05)], pa.float64()),
            "hi": pa.array([pick(0.95)], pa.float64()),
        })

    limits = {r["event_type"]: (r["lo"], r["hi"]) for r in
              hist.groupby("event_type").map_groups(
                  bounds, batch_format="pyarrow").take_all()}
    ref = ray.put(limits)

    def clip(t: pa.Table) -> pa.Table:
        lut = get_broadcast(ref)
        et = t["event_type"].to_pylist()
        lo = pa.array([lut[e][0] for e in et], pa.float64())
        hi = pa.array([lut[e][1] for e in et], pa.float64())
        w = pc.min_element_wise(pc.max_element_wise(t["value"], lo), hi)
        return pa.table({"event_id": t["event_id"],
                         "w_value": pc.round(w, 6)})

    return events.map_batches(clip, batch_format="pyarrow")


ORACLE_WINSORIZE_VALUES = """
WITH q AS (
  SELECT event_type, quantile_disc(value, 0.05) AS lo,
         quantile_disc(value, 0.95) AS hi
  FROM events GROUP BY event_type
)
SELECT event_id, round(least(greatest(value, lo), hi), 6) AS w_value
FROM events JOIN q USING (event_type)
"""

QUERIES["winsorize_values"] = q_winsorize_values
ORACLES["winsorize_values"] = ORACLE_WINSORIZE_VALUES


# ===================================== PQ ANN (compressed scan + rerank)

def q_ann_pq_topk(sf_dir: str):
    """Approximate cosine top-10 via product quantization: 8-byte/vector
    ADC code scan + exact rerank of a 100-candidate shortlist
    (stages/ann.pq_topk). Approximate BY DESIGN -> no SQL oracle; the
    pytest pins recall@10 against the brute-force baseline. Scores are
    EXACT cosine (rerank), so overlapping rows hash-match ann_topk's."""
    from odinson_ray.stages.ann import pq_topk

    return pq_topk(sf_dir, _query_vec(sf_dir), k=10)


QUERIES["ann_pq_topk"] = q_ann_pq_topk


# ===================================== distributed enumeration (row_number)

def _enumerated_orders(sf_dir: str, n_buckets: int = 256):
    """Order-preserving global enumeration (zipWithIndex over a total
    order) WITHOUT a global sort landing on the driver: rn for
    (o_totalprice DESC, o_orderkey ASC).

    Scale shape: (1) one column-pruned pass computes SAMPLED range
    boundaries via the mergeable quantile sketch
    (stages/sketch.approx_quantile_values) — buckets stay ~n/n_buckets
    rows at ANY key distribution, where the fixed-width variant this
    replaced degenerated on skew; boundary accuracy only affects
    BALANCE, never correctness, because the bucket map is monotone and
    tie-consistent (equal keys share a bucket); (2) a per-batch bincount
    combiner reduces to an n_buckets-row table whose prefix sums give
    each bucket's global offset (O(n_buckets) on the driver —
    parallelism-sized, not data-sized); (3) one groupby(bucket) shuffle
    sorts WITHIN each bucket and adds the broadcast offset. Equivalent
    to a range-partitioned sort (what ds.sort does internally) but the
    enumeration needs no second pass because offsets are known before
    the shuffle."""
    import ray
    from ray.data.aggregate import Sum

    from odinson_ray.stages.link import get_broadcast
    from odinson_ray.stages.sketch import approx_quantile_values

    rd = _rd()
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_totalprice"])
    boundaries = np.unique(approx_quantile_values(
        orders, "o_totalprice", np.arange(1, n_buckets) / n_buckets))

    def bucket_of(v: np.ndarray) -> np.ndarray:
        return np.searchsorted(boundaries, v, side="left")

    def count_partial(t: pa.Table) -> pa.Table:
        b = bucket_of(t["o_totalprice"].to_numpy(zero_copy_only=False))
        cnt = np.bincount(b, minlength=n_buckets)
        nz = np.nonzero(cnt)[0]
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "partial_n": pa.array(cnt[nz], pa.int64())})

    counts = {r["bucket"]: r["n"] for r in
              orders.map_batches(count_partial, batch_format="pyarrow")
              .groupby("bucket").aggregate(Sum("partial_n", alias_name="n"))
              .take_all()}
    # descending price order => buckets consumed from high id to low id
    offsets, acc = {}, 0
    for b in range(n_buckets - 1, -1, -1):
        offsets[b] = acc
        acc += counts.get(b, 0)
    ref = ray.put(offsets)

    def tag(t: pa.Table) -> pa.Table:
        b = bucket_of(t["o_totalprice"].to_numpy(zero_copy_only=False))
        return t.append_column("bucket", pa.array(b, pa.int64()))

    def enumerate_bucket(g: pa.Table) -> pa.Table:
        off = get_broadcast(ref)[g["bucket"][0].as_py()]
        price = g["o_totalprice"].to_numpy(zero_copy_only=False)
        key = g["o_orderkey"].to_numpy(zero_copy_only=False)
        o = np.lexsort((key, -price))
        rn = np.empty(len(o), dtype=np.int64)
        rn[o] = off + 1 + np.arange(len(o))
        return pa.table({"o_orderkey": g["o_orderkey"],
                         "o_totalprice": g["o_totalprice"],
                         "rn": pa.array(rn, pa.int64())})

    total = acc
    ds = (orders.map_batches(tag, batch_format="pyarrow")
          .groupby("bucket").map_groups(enumerate_bucket, batch_format="pyarrow"))
    return ds, total


def q_global_row_number(sf_dir: str):
    """ROW_NUMBER() over a global total order, distributed (see
    _enumerated_orders for the offset-before-shuffle shape)."""
    ds, _ = _enumerated_orders(sf_dir)
    return ds.select_columns(["o_orderkey", "rn"])


ORACLE_GLOBAL_ROW_NUMBER = """
SELECT o_orderkey,
       ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
FROM orders
"""

QUERIES["global_row_number"] = q_global_row_number
ORACLES["global_row_number"] = ORACLE_GLOBAL_ROW_NUMBER


# ===================================== NTILE equi-depth bucketing

def q_ntile_orders(sf_dir: str, tiles: int = 4):
    """NTILE(4) over the same total order, then a per-tile rollup.
    SQL NTILE gives the first (n mod k) tiles one extra row; that is a
    pure function of rn and n, applied vectorized after the distributed
    enumeration — no extra shuffle beyond _enumerated_orders' one."""
    from ray.data.aggregate import Count, Max, Min, Sum

    ds, n = _enumerated_orders(sf_dir)
    q, r = divmod(n, tiles)

    def tile_of(t: pa.Table) -> pa.Table:
        rn = t["rn"].to_numpy(zero_copy_only=False)
        big = r * (q + 1)  # rows living in the (q+1)-sized tiles
        tile = np.where(rn <= big,
                        (rn - 1) // (q + 1) + 1 if q + 1 else 1,
                        r + (rn - big - 1) // max(q, 1) + 1)
        return pa.table({"tile": pa.array(tile, pa.int64()),
                         "o_totalprice": t["o_totalprice"],
                         "rn": t["rn"]})

    out = (ds.map_batches(tile_of, batch_format="pyarrow")
           .groupby("tile")
           .aggregate(Count(alias_name="n_orders"),
                      Sum("o_totalprice", alias_name="sum_price"),
                      Min("rn", alias_name="min_rn"),
                      Max("rn", alias_name="max_rn")))

    def fin(t: pa.Table) -> pa.Table:
        # integer cents via floor(x*100 + 0.5): a ~1e9 sum rounded to 2dp
        # still sits on a double whose ulp (>1e-7) exceeds the gate's
        # absolute 1e-9 tolerance; both sides computing the identical
        # floor expression lands on the same int regardless of ulp drift
        s = t["sum_price"].to_numpy(zero_copy_only=False)
        ct = np.floor(s * 100.0 + 0.5).astype(np.int64)
        return t.set_column(t.schema.get_field_index("sum_price"),
                            "sum_price_ct", pa.array(ct, pa.int64()))

    return out.map_batches(fin, batch_format="pyarrow")


ORACLE_NTILE_ORDERS = """
WITH ranked AS (
  SELECT o_totalprice,
         ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn,
         NTILE(4) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS tile
  FROM orders
)
SELECT tile, count(*) AS n_orders,
       CAST(FLOOR(sum(o_totalprice) * 100 + 0.5) AS BIGINT) AS sum_price_ct,
       min(rn) AS min_rn, max(rn) AS max_rn
FROM ranked GROUP BY tile
"""

QUERIES["ntile_orders"] = q_ntile_orders
ORACLES["ntile_orders"] = ORACLE_NTILE_ORDERS


# ===================================== distributed Pearson correlation

def q_corr_lineitem(sf_dir: str):
    """Per-group Pearson correlation of quantity vs extendedprice via
    map-side sufficient statistics: each batch collapses to one
    (n, sx, sy, sxx, syy, sxy) row per key, the global groupby sums
    six numbers per key, and corr falls out algebraically — one tiny
    shuffle, nothing data-sized anywhere. (n-1) cancels in the ratio,
    so sample corr == this formula exactly."""
    from ray.data.aggregate import Sum

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        x, y = t["l_quantity"], t["l_extendedprice"]
        s = pa.table({
            "l_returnflag": t["l_returnflag"],
            "x": x, "y": y,
            "xx": pc.multiply(x, x), "yy": pc.multiply(y, y),
            "xy": pc.multiply(x, y),
        })
        g = pa.TableGroupBy(s, ["l_returnflag"]).aggregate(
            [([], "count_all"), ("x", "sum"), ("y", "sum"),
             ("xx", "sum"), ("yy", "sum"), ("xy", "sum")])
        return rename_agg(g, ["l_returnflag"],
                          ["l_returnflag", "pn", "px", "py", "pxx", "pyy", "pxy"])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("l_returnflag")
           .aggregate(Sum("pn", alias_name="n"), Sum("px", alias_name="sx"),
                      Sum("py", alias_name="sy"), Sum("pxx", alias_name="sxx"),
                      Sum("pyy", alias_name="syy"), Sum("pxy", alias_name="sxy")))

    def fin(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx = t["sx"].to_numpy(zero_copy_only=False)
        sy = t["sy"].to_numpy(zero_copy_only=False)
        cov = t["sxy"].to_numpy(zero_copy_only=False) - sx * sy / n
        vx = t["sxx"].to_numpy(zero_copy_only=False) - sx * sx / n
        vy = t["syy"].to_numpy(zero_copy_only=False) - sy * sy / n
        corr = cov / np.sqrt(vx * vy)
        return pa.table({"l_returnflag": t["l_returnflag"],
                         "n": t["n"],
                         "corr_qty_price": pa.array(np.round(corr, 6),
                                                    pa.float64())})

    return agg.map_batches(fin, batch_format="pyarrow")


ORACLE_CORR_LINEITEM = """
SELECT l_returnflag, count(*) AS n,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price
FROM lineitem GROUP BY l_returnflag
"""

QUERIES["corr_lineitem"] = q_corr_lineitem
ORACLES["corr_lineitem"] = ORACLE_CORR_LINEITEM


# ===================================== fixed-width histogram

def q_value_histogram(sf_dir: str, bins: int = 20):
    """Equi-width histogram of events.value: pass 1 is a column-pruned
    O(1)-to-driver range scan, pass 2 a per-batch bincount combiner so
    the global groupby moves <= bins rows per batch. Bin ids use the
    exact expression the oracle uses — (v - lo) * bins / (hi - lo),
    floored, clamped to bins-1 — so IEEE doubles agree bit-for-bit."""
    from ray.data.aggregate import Max, Min, Sum

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    mm = ds.aggregate(Min("value"), Max("value"))
    lo, hi = float(mm["min(value)"]), float(mm["max(value)"])
    span = (hi - lo) or 1.0

    def partial(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        b = np.minimum(np.floor((v - lo) * float(bins) / span).astype(np.int64),
                       bins - 1)
        n = np.bincount(b, minlength=bins)
        s = np.bincount(b, weights=v, minlength=bins)
        nz = np.nonzero(n)[0]
        return pa.table({"bin": pa.array(nz, pa.int64()),
                         "pn": pa.array(n[nz], pa.int64()),
                         "ps": pa.array(s[nz], pa.float64())})

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("bin")
           .aggregate(Sum("pn", alias_name="n"), Sum("ps", alias_name="total")))

    def fin(t: pa.Table) -> pa.Table:
        # integer cents (same ulp-robust floor as ntile_orders)
        s = t["total"].to_numpy(zero_copy_only=False)
        ct = np.floor(s * 100.0 + 0.5).astype(np.int64)
        return t.set_column(t.schema.get_field_index("total"),
                            "total_ct", pa.array(ct, pa.int64()))

    return out.map_batches(fin, batch_format="pyarrow")


ORACLE_VALUE_HISTOGRAM = """
WITH mm AS (SELECT min(value) AS lo, max(value) AS hi FROM events)
SELECT LEAST(CAST(FLOOR((value - lo) * 20.0 / (hi - lo)) AS BIGINT), 19) AS bin,
       count(*) AS n,
       CAST(FLOOR(sum(value) * 100 + 0.5) AS BIGINT) AS total_ct
FROM events, mm GROUP BY 1
"""

QUERIES["value_histogram"] = q_value_histogram
ORACLES["value_histogram"] = ORACLE_VALUE_HISTOGRAM


# ===================================== ROWS-frame moving average

def q_moving_avg(sf_dir: str, frame: int = 3):
    """Per-user moving average over the last ``frame`` events (SQL ROWS
    BETWEEN 2 PRECEDING AND CURRENT ROW) — the ROWS-frame cousin of
    event_gaps' LAG. Per-group sliding sums via one cumsum + shifted
    difference (no Python loop). Segmented over coarse hash(user)
    partitions (tiny-group rule, r4 sweep): ONE sort per partition, the
    frame clamp folds the per-user reset in as max(i-frame+1, run_start)."""
    from odinson_ray.stages.sketch import _splitmix64

    rd = _rd()
    PARTS = 512

    def add_part(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        p = (_splitmix64(u) % np.uint64(PARTS)).astype(np.int64)
        return t.append_column("_p", pa.array(p, pa.int64()))

    def mavg_partition(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        idx = pc.sort_indices(g, sort_keys=[("user_id", "ascending"),
                                            ("ts", "ascending"),
                                            ("event_id", "ascending")])
        g = g.take(idx)
        n = g.num_rows
        if n == 0:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "mavg3": pa.array([], pa.float64())})
        u = g["user_id"].to_numpy(zero_copy_only=False)
        v = g["value"].to_numpy(zero_copy_only=False)
        i = np.arange(n)
        # first row index of each user run, broadcast to every row
        new_run = np.empty(n, dtype=bool)
        new_run[0] = True
        new_run[1:] = u[1:] != u[:-1]
        run_start = np.maximum.accumulate(np.where(new_run, i, 0))
        c = np.concatenate(([0.0], np.cumsum(v)))
        lo = np.maximum(i - (frame - 1), run_start)
        s = c[i + 1] - c[lo]
        k = i - lo + 1
        return pa.table({
            "event_id": g["event_id"],
            "mavg3": pa.array(np.round(s / k, 6), pa.float64()),
        })

    return (
        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["user_id", "ts", "event_id", "value"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("_p")
        .map_groups(lambda g: mavg_partition(g.drop_columns(["_p"])),
                    batch_format="pyarrow")
    )


ORACLE_MOVING_AVG = """
SELECT event_id,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
             6) AS mavg3
FROM events
"""

QUERIES["moving_avg"] = q_moving_avg
ORACLES["moving_avg"] = ORACLE_MOVING_AVG


# ===================================== per-document token entropy

def q_token_entropy(sf_dir: str):
    """Unigram (Shannon) entropy per document in nats — a vocabulary-
    diversity quality signal (low entropy = repetitive/template text).
    Fully vectorized per batch: list-flatten + parent indices, one Arrow
    groupby over (row, token), two bincounts; H = ln(n) - sum(c ln c)/n.
    Embarrassingly parallel — a document never leaves its batch."""
    rd = _rd()

    def ent(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        parent = pc.list_parent_indices(toks)
        tb = pa.table({"p": parent, "tok": pc.list_flatten(toks)})
        g = pa.TableGroupBy(tb, ["p", "tok"]).aggregate([([], "count_all")])
        p = g["p"].to_numpy(zero_copy_only=False)
        c = g["count_all"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = np.bincount(p, weights=c, minlength=len(t))
        s = np.bincount(p, weights=c * np.log(c), minlength=len(t))
        with np.errstate(divide="ignore", invalid="ignore"):
            h = np.where(n > 0, np.log(n) - s / np.maximum(n, 1.0), 0.0)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(n.astype(np.int64), pa.int64()),
            "entropy": pa.array(np.round(h, 6), pa.float64()),
        })

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])
        .map_batches(ent, batch_format="pyarrow")
    )


ORACLE_TOKEN_ENTROPY = """
WITH cnt AS (
  SELECT doc_id, tok, count(*) AS c
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY doc_id, tok
), tot AS (SELECT doc_id, sum(c) AS n FROM cnt GROUP BY doc_id)
SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
       round(ln(n) - sum(c * ln(c)) / n, 6) AS entropy
FROM cnt JOIN tot USING (doc_id) GROUP BY doc_id, n
"""

QUERIES["token_entropy"] = q_token_entropy
ORACLES["token_entropy"] = ORACLE_TOKEN_ENTROPY


# ===================================== Adamic-Adar link prediction

def q_adamic_adar(sf_dir: str, k: int = 10):
    """Top-k Adamic–Adar link-prediction scores over the undirected
    canonical triple graph (stages/graph.adamic_adar_pairs): pairs
    sharing common neighbors, scored sum(1/ln(deg(z))). Deterministic
    top-k via (aa DESC, n1, n2). Centers above the degree cap are
    excluded on BOTH sides (mirrored in the oracle's HAVING clause) —
    the standard guard against hub pair-matrix blowup."""
    from odinson_ray.stages.graph import adamic_adar_pairs

    from ray.data.aggregate import Count

    from .kg import triples_dataset

    ds = triples_dataset(sf_dir)

    def to_undirected(t: pa.Table) -> pa.Table:
        lo = pc.min_element_wise(t["subj_canon"], t["obj_canon"])
        hi = pc.max_element_wise(t["subj_canon"], t["obj_canon"])
        e = pa.table({"lo": lo, "hi": hi})
        e = e.filter(pc.not_equal(e["lo"], e["hi"]))
        return pa.TableGroupBy(e, ["lo", "hi"]).aggregate([])

    edges = (
        ds.map_batches(to_undirected, batch_format="pyarrow")
        .groupby(["lo", "hi"]).aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
    )
    # PIN before fan-out: adamic_adar_pairs consumes edges on both sides
    # of its self-join; left lazy, the plan would embed TWO copies of the
    # upstream annotate+match ACTOR POOL in one executing pipeline, and
    # two pools without headroom deadlock the streaming executor on small
    # clusters (the clamp_pool lesson). Entity-pair scale, so cheap.
    edges = edges.materialize()
    aa = adamic_adar_pairs(edges)

    def rounded(t: pa.Table) -> pa.Table:
        return t.set_column(t.schema.get_field_index("aa"), "aa",
                            pc.round(t["aa"], 6))

    from odinson_ray.stages.shuffle import global_topk

    return global_topk(aa.map_batches(rounded, batch_format="pyarrow"),
                       ["aa", "n1", "n2"], [True, False, False], k)


ORACLE_ADAMIC_ADAR = """
WITH trip AS ({body}),
dedges AS (
  SELECT DISTINCT least(subj_canon, obj_canon) AS lo,
                  greatest(subj_canon, obj_canon) AS hi
  FROM trip WHERE subj_canon != obj_canon
),
adj AS (
  SELECT lo AS v, hi AS n FROM dedges
  UNION ALL SELECT hi, lo FROM dedges
),
deg AS (SELECT v, count(*) AS d FROM adj GROUP BY v),
wadj AS (
  SELECT adj.v, adj.n, 1.0 / ln(d) AS w
  FROM adj JOIN deg USING (v) WHERE d BETWEEN 2 AND 1000
)
SELECT a.n AS n1, b.n AS n2, round(sum(a.w), 6) AS aa
FROM wadj a JOIN wadj b ON a.v = b.v AND a.n < b.n
GROUP BY 1, 2
ORDER BY aa DESC, n1, n2 LIMIT 10
""".format(body=_KG_TRIPLES_BODY)

QUERIES["adamic_adar"] = q_adamic_adar
ORACLES["adamic_adar"] = ORACLE_ADAMIC_ADAR


# ===================================== prefix-filtered similarity join

def q_prefix_jaccard(sf_dir: str):
    """Exact all-pairs token-Jaccard join (>= 0.95) via prefix filtering
    (AllPairs/PPJoin family, stages/dedup.prefix_jaccard_pairs): docs
    emit only their globally-rarest-token prefixes, candidates bucket on
    those, the in-bucket length filter prunes, and the shared adaptive
    verify computes exact scores. EXACT (the complete >= t pair set),
    unlike MinHash-LSH's probabilistic recall — the oracle is the full
    quadratic join."""
    from odinson_ray.stages.dedup import prefix_jaccard_pairs

    return prefix_jaccard_pairs(sf_dir, threshold=0.95)


ORACLE_PREFIX_JACCARD = """
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), sizes AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS o
  FROM toks a JOIN toks b USING (tok) WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id, round(o * 1.0 / (sa.n + sb.n - o), 6) AS j
FROM inter JOIN sizes sa ON sa.doc_id = a_id
           JOIN sizes sb ON sb.doc_id = b_id
WHERE round(o * 1.0 / (sa.n + sb.n - o), 6) >= 0.95
"""

QUERIES["prefix_jaccard"] = q_prefix_jaccard
ORACLES["prefix_jaccard"] = ORACLE_PREFIX_JACCARD


# ===================================== per-group mode (argmax of counts)

def q_user_top_type(sf_dir: str):
    """MODE per group: each user's most frequent event_type (ties ->
    lexicographically smallest). Two-stage: per-batch (user, type)
    count combiner -> groupby Sum (the only all-to-all moves per-batch
    distinct key pairs) -> grouped_topk k=1, whose per-batch prune keeps
    one row per user before the final shuffle."""
    from ray.data.aggregate import Sum

    from odinson_ray.stages.shuffle import grouped_topk

    rd = _rd()

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["user_id", "event_type"]).aggregate(
            [([], "count_all")])
        return rename_agg(g, ["user_id", "event_type"],
                          ["user_id", "event_type", "partial_n"])

    counts = (
        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .aggregate(Sum("partial_n", alias_name="n"))
    )
    return grouped_topk(counts, by="user_id",
                        cols=["n", "event_type"], descending=[True, False],
                        k=1)


ORACLE_USER_TOP_TYPE = """
SELECT user_id, event_type, n FROM (
  SELECT user_id, event_type, count(*) AS n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY count(*) DESC, event_type) AS rk
  FROM events GROUP BY user_id, event_type
) WHERE rk = 1
"""

QUERIES["user_top_type"] = q_user_top_type
ORACLES["user_top_type"] = ORACLE_USER_TOP_TYPE


# ===================================== near-dup cluster representative

def q_neardup_keep_best(sf_dir: str):
    """The dedup pipeline's END STEP: within each near-dup cluster
    (MinHash pairs -> connected components, stages/dedup.neardup_groups)
    keep ONE representative — the longest document, doc_id tie-break —
    and report the cluster size. Composition: the group assignment is
    joined to doc lengths (one hash join), then a per-batch best-row
    combiner feeds a groupby whose reducer sees at most one row per
    group per batch, never the cluster's raw rows."""
    from odinson_ray.stages.dedup import neardup_groups
    from odinson_ray.stages.shuffle import hash_join

    rd = _rd()
    groups = neardup_groups(sf_dir, threshold=0.9)
    lens = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "n_chars"])
    joined = hash_join(
        groups, lens, on="doc_id",
        left_schema=pa.schema([("doc_id", pa.int64()),
                               ("group_id", pa.int64())]),
        right_schema=pa.schema([("doc_id", pa.int64()),
                                ("n_chars", pa.int64())]))

    def best_partial(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[
            ("group_id", "ascending"), ("n_chars", "descending"),
            ("doc_id", "ascending")])
        t = t.take(idx)
        g = t["group_id"].to_numpy(zero_copy_only=False)
        first = np.concatenate(([True], g[1:] != g[:-1]))
        runs = np.diff(np.append(np.flatnonzero(first), len(g)))
        kept = t.filter(pa.array(first))
        return pa.table({
            "group_id": kept["group_id"],
            "kept_doc_id": kept["doc_id"],
            "kept_n_chars": kept["n_chars"],
            "partial_n": pa.array(runs, pa.int64()),
        })

    # final per-group argmax + size over coarse hash(group) partitions
    # (tiny-group rule, r4 sweep — one group per cluster would dispatch
    # one task per cluster): ONE sort per partition, run-first pick and
    # reduceat size sum
    from odinson_ray.stages.sketch import _splitmix64
    PARTS = 512

    def add_part(t: pa.Table) -> pa.Table:
        gid = t["group_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        p = (_splitmix64(gid) % np.uint64(PARTS)).astype(np.int64)
        return t.append_column("_p", pa.array(p, pa.int64()))

    def best_final_partition(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        idx = pc.sort_indices(g, sort_keys=[
            ("group_id", "ascending"), ("kept_n_chars", "descending"),
            ("kept_doc_id", "ascending")])
        g = g.take(idx)
        if g.num_rows == 0:
            return pa.table({"group_id": pa.array([], pa.int64()),
                             "kept_doc_id": pa.array([], pa.int64()),
                             "group_size": pa.array([], pa.int64())})
        gid = g["group_id"].to_numpy(zero_copy_only=False)
        first = np.concatenate(([True], gid[1:] != gid[:-1]))
        starts = np.flatnonzero(first)
        sizes = np.add.reduceat(
            g["partial_n"].to_numpy(zero_copy_only=False), starts)
        top = g.filter(pa.array(first))
        return pa.table({
            "group_id": top["group_id"],
            "kept_doc_id": top["kept_doc_id"],
            "group_size": pa.array(sizes.astype(np.int64), pa.int64()),
        })

    return (joined.map_batches(best_partial, batch_format="pyarrow")
            .map_batches(add_part, batch_format="pyarrow")
            .groupby("_p")
            .map_groups(lambda g: best_final_partition(g.drop_columns(["_p"])),
                        batch_format="pyarrow"))


ORACLE_NEARDUP_KEEP_BEST = """
WITH nd AS ({body}),
sized AS (
  SELECT nd.group_id, d.doc_id, d.n_chars
  FROM nd JOIN documents d ON d.doc_id = nd.doc_id
)
SELECT group_id, doc_id AS kept_doc_id, group_size FROM (
  SELECT group_id, doc_id, n_chars,
         row_number() OVER (PARTITION BY group_id
                            ORDER BY n_chars DESC, doc_id) AS rk,
         count(*) OVER (PARTITION BY group_id) AS group_size
  FROM sized
) WHERE rk = 1
""".format(body=ORACLE_NEARDUP_GROUPS.strip().rstrip(";"))

QUERIES["neardup_keep_best"] = q_neardup_keep_best
ORACLES["neardup_keep_best"] = ORACLE_NEARDUP_KEEP_BEST


# ===================================== approximate quantile sketch

def q_approx_value_quantiles(sf_dir: str):
    """Mergeable quantile sketch over events.value
    (stages/sketch.approx_quantiles): per-batch weighted compaction +
    tree merge, root reads O(fanin * summary) points. Approximate BY
    DESIGN -> no SQL oracle; the pytest pins rank error against the
    exact quantiles. The exact cousin (discrete columns) is
    value_quantiles."""
    from odinson_ray.stages.sketch import approx_quantiles

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    est = approx_quantiles(ds, "value", qs=(0.5, 0.9, 0.99))
    return pd.DataFrame([est])


QUERIES["approx_value_quantiles"] = q_approx_value_quantiles


# ===================================== per-source token budget prefix

def q_token_budget(sf_dir: str, budget: int = 3000):
    """Per-source token-budget curriculum prefix: walk each source's
    docs in doc_id order and keep rows while the cumulative token count
    stays within ``budget`` — the deterministic "take the first N
    tokens per domain" mixing primitive. Rides running_total's skew-safe
    two-stage (key, bucket) cumulative machinery (doc_id recast as a
    fake microsecond timestamp so 1000-doc ranges form the buckets); a
    hot source never lands in one task."""
    from odinson_ray.stages.window import running_total

    rd = _rd()

    def prep(t: pa.Table) -> pa.Table:
        ntok = pc.list_value_length(pc.split_pattern(t["text"], " "))
        return pa.table({
            "doc_id": t["doc_id"],
            "source": t["source"],
            "ts": pc.multiply(t["doc_id"], 1_000_000).cast(pa.timestamp("us")),
            "n_tok": pc.cast(ntok, pa.float64()),
        })

    ds = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "source", "text"])
          .map_batches(prep, batch_format="pyarrow"))
    rt = running_total(ds, key="source", ts="ts", order="doc_id",
                       value="n_tok", out="cum", ndigits=0, bucket_s=1000)

    def fin(t: pa.Table) -> pa.Table:
        cum = t["cum"].to_numpy(zero_copy_only=False)
        keep = cum <= budget
        return pa.table({
            "doc_id": t["doc_id"].filter(pa.array(keep)),
            "source": t["source"].filter(pa.array(keep)),
            "cum_tokens": pa.array(cum[keep].astype(np.int64), pa.int64()),
        })

    return rt.map_batches(fin, batch_format="pyarrow")


ORACLE_TOKEN_BUDGET = """
SELECT doc_id, source, CAST(cum AS BIGINT) AS cum_tokens FROM (
  SELECT doc_id, source,
         sum(len(string_split(text, ' ')))
           OVER (PARTITION BY source ORDER BY doc_id) AS cum
  FROM documents
) WHERE cum <= 3000
"""

QUERIES["token_budget"] = q_token_budget
ORACLES["token_budget"] = ORACLE_TOKEN_BUDGET


# ===================================== bucketed layout co-located join

def q_bucketed_join_revenue(sf_dir: str):
    """Hive-style bucketing (stages/layout.py): orders and customer are
    each written ONCE as parquet partitioned by hash(custkey) % 32 (the
    build's single shuffle, amortized across every later join on that
    key), then the join AND the per-customer aggregate run inside one
    task per bucket with ZERO runtime shuffle — keys are co-located by
    construction, so grouping within a bucket is globally exact."""
    from odinson_ray.stages.layout import bucket_layout, bucketed_join

    root_o = bucket_layout(
        f"{sf_dir}/orders.parquet", "custkey",
        {"o_custkey": "custkey", "o_totalprice": "o_totalprice"})
    root_c = bucket_layout(
        f"{sf_dir}/customer.parquet", "custkey",
        {"c_custkey": "custkey", "c_name": "c_name"})

    def per_bucket_agg(j: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(j, ["custkey", "c_name"]).aggregate(
            [([], "count_all"), ("o_totalprice", "sum")])
        g = rename_agg(g, ["custkey", "c_name"],
                       ["custkey", "c_name", "n_orders", "_sum"])
        s = g["_sum"].to_numpy(zero_copy_only=False)
        ct = np.floor(s * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            "custkey": g["custkey"], "c_name": g["c_name"],
            "n_orders": g["n_orders"],
            "total_ct": pa.array(ct, pa.int64()),
        })

    return bucketed_join(
        root_o, root_c, "custkey",
        schema_a=pa.schema([("custkey", pa.int64()),
                            ("o_totalprice", pa.float64())]),
        schema_b=pa.schema([("custkey", pa.int64()),
                            ("c_name", pa.string())]),
        post=per_bucket_agg)


ORACLE_BUCKETED_JOIN_REVENUE = """
SELECT c_custkey AS custkey, c_name, count(*) AS n_orders,
       CAST(FLOOR(sum(o_totalprice) * 100 + 0.5) AS BIGINT) AS total_ct
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1, 2
"""

QUERIES["bucketed_join_revenue"] = q_bucketed_join_revenue
ORACLES["bucketed_join_revenue"] = ORACLE_BUCKETED_JOIN_REVENUE


# ===================================== k-core decomposition

def q_kg_kcore(sf_dir: str, k: int = 2, rounds: int = 3):
    """Vertices of the KG graph surviving ``rounds`` peels of k-core
    decomposition (stages/graph.kcore_edges, bounded mode — the SQL
    oracle unrolls the same three peels; the fixpoint mode is
    pytest-verified against a local peel). Output: surviving vertices
    with their in-subgraph degree."""
    from ray.data.aggregate import Count

    from odinson_ray.stages.graph import kcore_edges, vertex_degrees

    from .kg import triples_dataset

    ds = triples_dataset(sf_dir)

    def to_undirected(t: pa.Table) -> pa.Table:
        lo = pc.min_element_wise(t["subj_canon"], t["obj_canon"])
        hi = pc.max_element_wise(t["subj_canon"], t["obj_canon"])
        e = pa.table({"lo": lo, "hi": hi})
        e = e.filter(pc.not_equal(e["lo"], e["hi"]))
        return pa.TableGroupBy(e, ["lo", "hi"]).aggregate([])

    edges = (
        ds.map_batches(to_undirected, batch_format="pyarrow")
        .groupby(["lo", "hi"]).aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
    ).materialize()  # pinned: consumed once per peel round
    core = kcore_edges(edges, k=k, rounds=rounds)
    return vertex_degrees(core)


ORACLE_KG_KCORE = """
WITH trip AS ({body}),
e0 AS (
  SELECT DISTINCT least(subj_canon, obj_canon) AS lo,
                  greatest(subj_canon, obj_canon) AS hi
  FROM trip WHERE subj_canon != obj_canon
),
d0 AS (SELECT v, count(*) AS d FROM
       (SELECT lo AS v FROM e0 UNION ALL SELECT hi FROM e0) GROUP BY v),
l0 AS (SELECT v FROM d0 WHERE d < 2),
e1 AS (SELECT * FROM e0 WHERE lo NOT IN (SELECT v FROM l0)
                          AND hi NOT IN (SELECT v FROM l0)),
d1 AS (SELECT v, count(*) AS d FROM
       (SELECT lo AS v FROM e1 UNION ALL SELECT hi FROM e1) GROUP BY v),
l1 AS (SELECT v FROM d1 WHERE d < 2),
e2 AS (SELECT * FROM e1 WHERE lo NOT IN (SELECT v FROM l1)
                          AND hi NOT IN (SELECT v FROM l1)),
d2 AS (SELECT v, count(*) AS d FROM
       (SELECT lo AS v FROM e2 UNION ALL SELECT hi FROM e2) GROUP BY v),
l2 AS (SELECT v FROM d2 WHERE d < 2),
e3 AS (SELECT * FROM e2 WHERE lo NOT IN (SELECT v FROM l2)
                          AND hi NOT IN (SELECT v FROM l2))
SELECT v, count(*) AS deg FROM
  (SELECT lo AS v FROM e3 UNION ALL SELECT hi FROM e3) GROUP BY v
""".format(body=_KG_TRIPLES_BODY)

QUERIES["kg_kcore"] = q_kg_kcore
ORACLES["kg_kcore"] = ORACLE_KG_KCORE


# ===================================== time-decayed aggregate

def q_decayed_value(sf_dir: str):
    """Exponentially time-decayed sum per event_type (half-life 7 days,
    reference 2024-02-01): the streaming-popularity primitive. A decayed
    sum with a FIXED reference is just a weighted sum, so it map-side
    combines like any other aggregate — per-batch exp + partial sums,
    one tiny shuffle. Age and weight are computed with the identical
    IEEE expression the oracle uses; the rounded output magnitudes keep
    double ulp far below the gate's tolerance."""
    from ray.data.aggregate import Sum

    rd = _rd()
    ref_us = pd.Timestamp("2024-02-01").value // 1000  # epoch micros
    lam = np.log(2.0) / 7.0  # per-day decay, 7-day half-life

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        age_days = (ref_us - ts) / 86400000000.0
        w = t["value"].to_numpy(zero_copy_only=False) * np.exp(-lam * age_days)
        s = pa.table({"event_type": t["event_type"],
                      "w": pa.array(w, pa.float64())})
        g = pa.TableGroupBy(s, ["event_type"]).aggregate(
            [([], "count_all"), ("w", "sum")])
        return rename_agg(g, ["event_type"], ["event_type", "pn", "pw"])

    agg = (
        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["event_type", "ts", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("pn", alias_name="n"), Sum("pw", alias_name="dsum"))
    )

    def fin(t: pa.Table) -> pa.Table:
        return t.set_column(t.schema.get_field_index("dsum"), "decayed_sum",
                            pc.round(t["dsum"], 4))

    return agg.map_batches(fin, batch_format="pyarrow")


ORACLE_DECAYED_VALUE = """
SELECT event_type, count(*) AS n,
       round(sum(value * exp(-(ln(2.0) / 7.0) *
             ((epoch_us(TIMESTAMP '2024-02-01') - epoch_us(ts))
              / 86400000000.0))), 4) AS decayed_sum
FROM events GROUP BY event_type
"""

QUERIES["decayed_value"] = q_decayed_value
ORACLES["decayed_value"] = ORACLE_DECAYED_VALUE


# ===================================== grouped linear regression

def q_regress_lineitem(sf_dir: str):
    """Per-group OLS of extendedprice on quantity (slope / intercept /
    R^2) from the SAME six sufficient statistics as corr_lineitem — the
    map-side-combine family covers every closed-form regression
    aggregate for free; only six numbers per key ever shuffle."""
    from ray.data.aggregate import Sum

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        x, y = t["l_quantity"], t["l_extendedprice"]
        s = pa.table({
            "l_returnflag": t["l_returnflag"],
            "x": x, "y": y,
            "xx": pc.multiply(x, x), "yy": pc.multiply(y, y),
            "xy": pc.multiply(x, y),
        })
        g = pa.TableGroupBy(s, ["l_returnflag"]).aggregate(
            [([], "count_all"), ("x", "sum"), ("y", "sum"),
             ("xx", "sum"), ("yy", "sum"), ("xy", "sum")])
        return rename_agg(g, ["l_returnflag"],
                          ["l_returnflag", "pn", "px", "py", "pxx", "pyy", "pxy"])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("l_returnflag")
           .aggregate(Sum("pn", alias_name="n"), Sum("px", alias_name="sx"),
                      Sum("py", alias_name="sy"), Sum("pxx", alias_name="sxx"),
                      Sum("pyy", alias_name="syy"), Sum("pxy", alias_name="sxy")))

    def fin(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx = t["sx"].to_numpy(zero_copy_only=False)
        sy = t["sy"].to_numpy(zero_copy_only=False)
        sxx = t["sxx"].to_numpy(zero_copy_only=False)
        syy = t["syy"].to_numpy(zero_copy_only=False)
        sxy = t["sxy"].to_numpy(zero_copy_only=False)
        cov = sxy - sx * sy / n
        vx = sxx - sx * sx / n
        vy = syy - sy * sy / n
        slope = cov / vx
        intercept = sy / n - slope * (sx / n)
        r2 = (cov * cov) / (vx * vy)
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "slope": pa.array(np.round(slope, 6), pa.float64()),
            "intercept": pa.array(np.round(intercept, 4), pa.float64()),
            "r2": pa.array(np.round(r2, 6), pa.float64()),
        })

    return agg.map_batches(fin, batch_format="pyarrow")


ORACLE_REGRESS_LINEITEM = """
SELECT l_returnflag,
       round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2
FROM lineitem GROUP BY l_returnflag
"""

QUERIES["regress_lineitem"] = q_regress_lineitem
ORACLES["regress_lineitem"] = ORACLE_REGRESS_LINEITEM


# ===================================== per-key EWMA (recursive smoothing)

def q_user_ewma(sf_dir: str, alpha: float = 0.3):
    """Per-user exponentially weighted moving average of value over
    (ts, event_id) order, reporting each user's final smoothed level —
    the classic online-feature recurrence s_t = a*v_t + (1-a)*s_{t-1}.
    Inherently sequential per key; segmented over coarse hash(user)
    partitions (tiny-group rule, r4 sweep): ONE sort per partition, then
    pandas' grouped C ewm kernel over the whole partition (per-user reset
    is native to groupby().ewm()) — no Python loop, no per-user dispatch.
    RECURSIVE -> no SQL oracle (DuckDB has no ewm); the pytest checks
    against pandas groupby().ewm() directly."""
    from odinson_ray.stages.sketch import _splitmix64

    rd = _rd()
    PARTS = 512

    def add_part(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        p = (_splitmix64(u) % np.uint64(PARTS)).astype(np.int64)
        return t.append_column("_p", pa.array(p, pa.int64()))

    def ewma_partition(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        idx = pc.sort_indices(g, sort_keys=[("user_id", "ascending"),
                                            ("ts", "ascending"),
                                            ("event_id", "ascending")])
        g = g.take(idx)
        if g.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "ewma": pa.array([], pa.float64())})
        df = pd.DataFrame({
            "u": g["user_id"].to_numpy(zero_copy_only=False),
            "v": g["value"].to_numpy(zero_copy_only=False),
        })
        gb = df.groupby("u", sort=True)
        sm = gb["v"].ewm(alpha=alpha, adjust=False).mean()
        # rows are user-sorted, so each group's last smoothed value sits
        # at the run end; tail(1) preserves group order
        last = sm.groupby(level=0).tail(1).to_numpy()
        users = np.asarray(sorted(gb.groups), dtype=np.int64)
        n = gb.size().to_numpy()
        return pa.table({
            "user_id": pa.array(users, pa.int64()),
            "n": pa.array(n.astype(np.int64), pa.int64()),
            "ewma": pa.array(np.round(last, 6), pa.float64()),
        })

    return (
        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["user_id", "ts", "event_id", "value"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("_p")
        .map_groups(lambda g: ewma_partition(g.drop_columns(["_p"])),
                    batch_format="pyarrow")
    )


QUERIES["user_ewma"] = q_user_ewma


# ===================================== media resize (multimodal stub)

def q_media_resize(sf_dir: str):
    """Fit-in-256 image resize over the media span table
    (stages/media.MediaResizer): aspect-preserving dimension math +
    binary payload output through a small-batch actor pool. The byte
    transform is the documented deterministic stub (md5 of ref:dims), so
    the oracle recomputes payload hex exactly; a real resizer swaps one
    method."""
    from odinson_ray.stages.media import media_resize

    def proj(t: pa.Table) -> pa.Table:
        hexes = [p.hex() for p in t["payload"].to_pylist()]
        return pa.table({
            "doc_id": t["doc_id"], "media_ref": t["media_ref"],
            "out_width": t["out_width"], "out_height": t["out_height"],
            "payload_hex": pa.array(hexes, pa.string()),
        })

    return media_resize(sf_dir).map_batches(proj, batch_format="pyarrow")


ORACLE_MEDIA_RESIZE = """
WITH media AS (
  SELECT printf('doc-%06d', doc_id) AS doc_id,
         'media://img/' || doc_id AS media_ref
  FROM documents WHERE doc_id % 5 = 0
),
feat AS (
  SELECT *, list_sum(list_transform(string_split(media_ref, ''),
                                    x -> ascii(x))) AS n
  FROM media
),
dims AS (
  SELECT doc_id, media_ref,
         CAST(64 + (n % 64) * 16 AS INT) AS w,
         CAST(64 + (n % 48) * 16 AS INT) AS h
  FROM feat
),
sized AS (
  SELECT *, LEAST(256.0 / w, 256.0 / h, 1.0) AS s FROM dims
),
outs AS (
  SELECT doc_id, media_ref,
         GREATEST(1, CAST(FLOOR(w * s) AS INT)) AS out_width,
         GREATEST(1, CAST(FLOOR(h * s) AS INT)) AS out_height
  FROM sized
)
SELECT doc_id, media_ref, out_width, out_height,
       md5(media_ref || ':' || out_width || 'x' || out_height) AS payload_hex
FROM outs
"""

QUERIES["media_resize"] = q_media_resize
ORACLES["media_resize"] = ORACLE_MEDIA_RESIZE


# ===================================== weighted sample (Efraimidis-Spirakis)

def q_weighted_sample(sf_dir: str, k: int = 100):
    """Deterministic weighted sample without replacement (Efraimidis-
    Spirakis A-ES): every doc draws a hash-uniform u(doc_id) and scores
    skey = u^(1/weight); the global top-k by skey is an exact weighted
    sample — P(doc in sample) follows its weight share, here n_chars.

    Distributed shape: score + per-batch top-k prune inside map_batches,
    then one tiny final sort (global_topk) — no full-data shuffle, no RNG
    state. Membership is a pure function of doc_id (same Knuth-hash
    uniform as stratified_sample), so the sample is reproducible and
    resumable at any parallelism and the SQL oracle expresses the
    identical draw. skey is emitted as floor(skey * 1e6) — an integer —
    so the compared values carry no float-representation hazard."""
    from odinson_ray.stages.shuffle import global_topk

    rd = _rd()

    def score(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        u = (((ids * np.uint64(2654435761)) % np.uint64(1 << 32))
             .astype(np.float64) + 0.5) / float(1 << 32)
        w = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = np.power(u, 1.0 / w)
        return pa.table({
            "doc_id": t["doc_id"], "n_chars": t["n_chars"],
            "skey_e6": pa.array(np.floor(s * 1e6).astype(np.int64),
                                pa.int64()),
            "_s": pa.array(s, pa.float64()),
        })

    ds = (
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "n_chars"])
        .map_batches(score, batch_format="pyarrow")
    )
    top = global_topk(ds, ["_s", "doc_id"], [True, False], k)
    return top.map_batches(
        lambda t: t.select(["doc_id", "n_chars", "skey_e6"]),
        batch_format="pyarrow")


ORACLE_WEIGHTED_SAMPLE = """
WITH scored AS (
  SELECT doc_id, n_chars,
         POW(((doc_id * 2654435761) % 4294967296 + 0.5) / 4294967296.0,
             1.0 / n_chars) AS s
  FROM documents
)
SELECT doc_id, n_chars, CAST(FLOOR(s * 1000000) AS BIGINT) AS skey_e6
FROM scored ORDER BY s DESC, doc_id LIMIT 100
"""

QUERIES["weighted_sample"] = q_weighted_sample
ORACLES["weighted_sample"] = ORACLE_WEIGHTED_SAMPLE


# ===================================== weekly cohort retention

def q_cohort_retention(sf_dir: str):
    """Weekly cohort retention over the event stream: users are cohorted
    by their first active week; each (cohort_week, week_offset) cell
    counts the distinct users of that cohort active offset weeks later —
    the standard growth/retention matrix.

    Shape (tiny-group rule): per-batch (user, week) dedup packed into one
    int64, ONE shuffle on hash(user) % 256 coarse partitions (all rows of
    a user co-located, so per-partition counts are exact distinct counts
    and disjoint across partitions), segmented numpy resolve (global
    (user, week) dedup, per-user min via run boundaries, LOCAL
    (cohort, offset) cells), then a small global groupby sum over cells.
    The wide stream is shuffled once; the second shuffle moves only
    per-partition cells. Packing bound: week index < 2^20 (year ~21800),
    collision-free for user_id < 2^43."""
    rd = _rd()
    P, W = 256, 1 << 20

    def proj(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        week = us // 1_000_000 // 86_400 // 7
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        comp = np.unique(uid * W + week)
        part = ((comp // W).astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(1 << 32) % np.uint64(P)
        return pa.table({"_c": pa.array(comp, pa.int64()),
                         "_p": pa.array(part.astype(np.int64), pa.int64())})

    def resolve(g: pa.Table) -> pa.Table:
        comp = np.unique(g["_c"].to_numpy(zero_copy_only=False))
        uid, week = comp // W, comp % W
        starts = np.concatenate(
            ([0], np.flatnonzero(uid[1:] != uid[:-1]) + 1))
        lens = np.diff(np.append(starts, len(uid)))
        cohort = np.repeat(week[starts], lens)  # runs sorted -> min first
        cell = cohort * W + (week - cohort)
        uc, counts = np.unique(cell, return_counts=True)
        return pa.table({
            "cohort_week": pa.array(uc // W, pa.int64()),
            "week_offset": pa.array(uc % W, pa.int64()),
            "_n": pa.array(counts.astype(np.int64), pa.int64()),
        })

    cells = (
        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["user_id", "ts"])
        .map_batches(proj, batch_format="pyarrow")
        .groupby("_p")
        .map_groups(resolve, batch_format="pyarrow")
        .groupby(["cohort_week", "week_offset"])
        .sum("_n")
    )
    return cells.map_batches(
        lambda t: pa.table({"cohort_week": t["cohort_week"],
                            "week_offset": t["week_offset"],
                            "n_users": t["sum(_n)"]}),
        batch_format="pyarrow")


ORACLE_COHORT_RETENTION = """
WITH uw AS (
  SELECT DISTINCT user_id,
         epoch_us(ts) // 1000000 // 86400 // 7 AS week
  FROM events
),
c AS (SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY user_id)
SELECT c.cohort_week, uw.week - c.cohort_week AS week_offset,
       COUNT(*) AS n_users
FROM uw JOIN c USING (user_id)
GROUP BY 1, 2
"""

QUERIES["cohort_retention"] = q_cohort_retention
ORACLES["cohort_retention"] = ORACLE_COHORT_RETENTION


# ===================================== per-key high-water-mark drawdown

def q_value_drawdown(sf_dir: str):
    """Per-user running high-water mark of value (ordered by ts,
    event_id) minus the current value — the peak-to-current drawdown
    used in monitoring/fraud features. Skew-safe prefix-MAX two-stage
    decomposition (stages/window.running_drawdown): bucket maxima merge
    exactly because max is associative and idempotent; the exclusive
    prefix-max carry joins back on the fine (key, bucket) key and the
    within-bucket cummax runs in the join reducer."""
    from odinson_ray.stages.window import running_drawdown

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    return running_drawdown(ds)


ORACLE_VALUE_DRAWDOWN = """
SELECT event_id, user_id,
       round(MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - value, 4) AS drawdown
FROM events
"""

QUERIES["value_drawdown"] = q_value_drawdown
ORACLES["value_drawdown"] = ORACLE_VALUE_DRAWDOWN


# ===================================== skyline (Pareto frontier) over orders

def q_skyline_orders(sf_dir: str):
    """2-D skyline: orders not dominated by any other order (a dominator
    has an earlier-or-equal date AND a greater-or-equal price, strictly
    better in at least one dimension).

    Scale shape: the per-date MAX is a plain combiner + small groupby
    (the date domain is bounded — ~2.4k values per decade — regardless
    of row count), the exclusive prefix-cummax over sorted dates runs on
    that tiny table, and the surviving (date, max_cents) pairs are
    broadcast once (ray.put) into a second streaming pass that filters
    full rows. Two passes over the input, zero all-to-all on row data.
    Prices compare as integer cents (floor(x*100+0.5)) so both sides
    agree bit-exactly."""
    import ray
    from ray.data.aggregate import Max

    rd = _rd()
    cols = ["o_orderkey", "o_orderdate", "o_totalprice"]

    def with_cents(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.add(pc.multiply(t["o_totalprice"], 100.0), 0.5)),
                        pa.int64())
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_orderdate": t["o_orderdate"],
                         "cents": cents})

    def date_max(t: pa.Table) -> pa.Table:
        agg = pa.TableGroupBy(t, ["o_orderdate"]).aggregate([("cents", "max")])
        return rename_agg(agg, ["o_orderdate"], ["o_orderdate", "cents"])

    per_date = (
        rd.read_parquet(f"{sf_dir}/orders.parquet", columns=cols)
        .map_batches(with_cents, batch_format="pyarrow")
        .map_batches(date_max, batch_format="pyarrow")
        .groupby("o_orderdate")
        .aggregate(Max("cents", alias_name="max_cents"))
        .to_pandas()
        .sort_values("o_orderdate")
        .reset_index(drop=True)
    )
    m = per_date["max_cents"].to_numpy()
    prefix = np.concatenate([[np.iinfo(np.int64).min],
                             np.maximum.accumulate(m)[:-1]])
    keep = m > prefix
    # keys normalized to int64 epoch-us: datetime64 hashes are unit-
    # sensitive (a [ns] driver-side key never matches a [us] batch key)
    survivors = {
        int(d): int(c)
        for d, c in zip(per_date["o_orderdate"][keep]
                        .astype("datetime64[us]").astype(np.int64).to_numpy(),
                        per_date["max_cents"][keep].to_numpy())
    }
    ref = ray.put(survivors)

    def pick(t: pa.Table) -> pa.Table:
        sv = ray.get(ref)
        t = with_cents(t)
        dates = t["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        want = np.fromiter(
            (sv.get(int(d), -1) == c for d, c in zip(dates, cents)),
            dtype=bool, count=len(cents))
        return t.filter(pa.array(want))

    return rd.read_parquet(f"{sf_dir}/orders.parquet", columns=cols).map_batches(
        pick, batch_format="pyarrow")


ORACLE_SKYLINE_ORDERS = """
WITH o AS (
  SELECT o_orderkey, o_orderdate,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
)
SELECT o_orderkey, o_orderdate, cents FROM o r
WHERE NOT EXISTS (
  SELECT 1 FROM o s
  WHERE s.o_orderdate <= r.o_orderdate AND s.cents >= r.cents
    AND (s.o_orderdate < r.o_orderdate OR s.cents > r.cents)
)
"""

QUERIES["skyline_orders"] = q_skyline_orders
ORACLES["skyline_orders"] = ORACLE_SKYLINE_ORDERS


# ===================================== unpivot (melt) lineitem measures

def q_unpivot_measures(sf_dir: str):
    """Wide-to-long unpivot of the four lineitem measures folded directly
    into a per-batch partial sum — the long table (4x rows) never
    materializes; the global exchange moves 4 rows per batch."""
    from ray.data.aggregate import Sum

    rd = _rd()
    measures = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]

    def partial(t: pa.Table) -> pa.Table:
        names, sums, ns = [], [], []
        for m in measures:
            names.append(m)
            sums.append(pc.sum(t[m]).as_py() or 0.0)
            ns.append(t.num_rows)
        return pa.table({"measure": names,
                         "_s": pa.array(sums, pa.float64()),
                         "_n": pa.array(ns, pa.int64())})

    out = (
        rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=measures)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("measure")
        .aggregate(Sum("_s", alias_name="_s"), Sum("_n", alias_name="n"))
        .to_pandas()
    )
    out["total_cents"] = np.floor(out["_s"] * 100 + 0.5).astype(np.int64)
    return out[["measure", "total_cents", "n"]]


ORACLE_UNPIVOT_MEASURES = """
SELECT 'l_quantity' AS measure,
       CAST(FLOOR(sum(l_quantity) * 100 + 0.5) AS BIGINT) AS total_cents,
       count(*) AS n FROM lineitem
UNION ALL
SELECT 'l_extendedprice',
       CAST(FLOOR(sum(l_extendedprice) * 100 + 0.5) AS BIGINT), count(*)
FROM lineitem
UNION ALL
SELECT 'l_discount',
       CAST(FLOOR(sum(l_discount) * 100 + 0.5) AS BIGINT), count(*)
FROM lineitem
UNION ALL
SELECT 'l_tax',
       CAST(FLOOR(sum(l_tax) * 100 + 0.5) AS BIGINT), count(*)
FROM lineitem
"""

QUERIES["unpivot_measures"] = q_unpivot_measures
ORACLES["unpivot_measures"] = ORACLE_UNPIVOT_MEASURES


# ===================================== changelog compaction (latest per key)

def q_latest_events(sf_dir: str):
    """Upsert/changelog compaction: the latest event row per user
    (ts desc, event_id desc tie-break) — grouped_topk k=1, whose
    per-batch combiner keeps one row per key per batch, so the shuffle
    moves <= num_batches rows per key no matter how hot the key."""
    from odinson_ray.stages.shuffle import grouped_topk

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "event_type"])
    out = grouped_topk(ds, by="user_id", cols=["ts", "event_id"],
                       descending=[True, True], k=1)
    return out.map_batches(
        lambda t: t.select(["user_id", "event_id", "ts", "event_type"]),
        batch_format="pyarrow")


ORACLE_LATEST_EVENTS = """
SELECT user_id, event_id, ts, event_type FROM (
  SELECT user_id, event_id, ts, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""

QUERIES["latest_events"] = q_latest_events
ORACLES["latest_events"] = ORACLE_LATEST_EVENTS


# ===================================== snapshot diff (table change capture)

def q_snapshot_diff(sf_dir: str):
    """Diff of two table snapshots -> (key, added|removed|changed).

    Snapshot B is derived deterministically from orders (keys % 97
    deleted, % 11 repriced +1.00, % 101 mirrored in as adds with a
    sentinel price) so the oracle can build the identical pair. Both
    snapshots stream through ONE pass that emits presence/price partial
    rows; a single groupby(key) sums the four partials and classifies —
    the only all-to-all is the unavoidable key exchange, and per-row
    integer cents avoid float-sum-order ambiguity entirely."""
    from ray.data.aggregate import Sum

    rd = _rd()

    def partials(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        cents = np.floor(t["o_totalprice"].to_numpy(zero_copy_only=False)
                         * 100 + 0.5).astype(np.int64)
        zeros = np.zeros(len(k), dtype=np.int64)
        ones = np.ones(len(k), dtype=np.int64)
        a = {"k": k, "a_n": ones, "a_c": cents, "b_n": zeros, "b_c": zeros}
        keep = k % 97 != 0
        b_c = cents + np.where(k % 11 == 0, 100, 0)
        b = {"k": k[keep], "a_n": zeros[keep], "a_c": zeros[keep],
             "b_n": ones[keep], "b_c": b_c[keep]}
        addm = k % 101 == 0
        add = {"k": -k[addm], "a_n": zeros[addm], "a_c": zeros[addm],
               "b_n": ones[addm], "b_c": np.full(int(addm.sum()), 99, np.int64)}
        return pa.table({c: np.concatenate([a[c], b[c], add[c]])
                         for c in ("k", "a_n", "a_c", "b_n", "b_c")})

    def classify(t: pa.Table) -> pa.Table:
        a_n = t["a_n"].to_numpy(zero_copy_only=False)
        b_n = t["b_n"].to_numpy(zero_copy_only=False)
        a_c = t["a_c"].to_numpy(zero_copy_only=False)
        b_c = t["b_c"].to_numpy(zero_copy_only=False)
        change = np.where(a_n == 0, "added",
                          np.where(b_n == 0, "removed", "changed"))
        keep = (a_n == 0) | (b_n == 0) | (a_c != b_c)
        return pa.table({"o_orderkey": t["k"], "change": pa.array(change)}
                        ).filter(pa.array(keep))

    return (
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_totalprice"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("a_n", alias_name="a_n"), Sum("a_c", alias_name="a_c"),
                   Sum("b_n", alias_name="b_n"), Sum("b_c", alias_name="b_c"))
        .map_batches(classify, batch_format="pyarrow")
    )


ORACLE_SNAPSHOT_DIFF = """
WITH a AS (
  SELECT o_orderkey AS k,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS c
  FROM orders
), b AS (
  SELECT o_orderkey AS k,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
           + CASE WHEN o_orderkey % 11 = 0 THEN 100 ELSE 0 END AS c
  FROM orders WHERE o_orderkey % 97 <> 0
  UNION ALL
  SELECT -o_orderkey, 99 FROM orders WHERE o_orderkey % 101 = 0
)
SELECT COALESCE(a.k, b.k) AS o_orderkey,
       CASE WHEN a.k IS NULL THEN 'added'
            WHEN b.k IS NULL THEN 'removed'
            ELSE 'changed' END AS change
FROM a FULL OUTER JOIN b ON a.k = b.k
WHERE a.k IS NULL OR b.k IS NULL OR a.c <> b.c
"""

QUERIES["snapshot_diff"] = q_snapshot_diff
ORACLES["snapshot_diff"] = ORACLE_SNAPSHOT_DIFF


# ===================================== tumbling-window distinct users

def q_window_distinct_users(sf_dir: str):
    """Exact count(distinct user) per (day, event_type): per-batch
    distinct-triples combiner, one groupby over the (day, type, user)
    triple space, then a per-batch count fold — the same two-stage exact
    distinct as distinct_users_per_type with the window key added, so
    the shuffle moves distinct triples (bounded by users x days x types),
    not event rows."""
    from ray.data.aggregate import Count, Sum

    rd = _rd()
    day_us = 86400 * 1_000_000

    def triples(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        day = pc.multiply(pc.floor(pc.divide(us, day_us)), day_us)
        base = pa.table({
            "day": pc.cast(pc.cast(day, pa.int64()), pa.timestamp("us")),
            "event_type": t["event_type"],
            "user_id": t["user_id"],
        })
        agg = pa.TableGroupBy(base, ["day", "event_type", "user_id"]).aggregate([])
        return agg

    def fold(t: pa.Table) -> pa.Table:
        base = pa.table({"day": t["day"], "event_type": t["event_type"]})
        agg = pa.TableGroupBy(base, ["day", "event_type"]).aggregate(
            [([], "count_all")])
        return rename_agg(agg, ["day", "event_type"],
                          ["day", "event_type", "_n"])

    return (
        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["ts", "event_type", "user_id"])
        .map_batches(triples, batch_format="pyarrow")
        .groupby(["day", "event_type", "user_id"])
        .aggregate(Count(alias_name="_c"))
        .map_batches(fold, batch_format="pyarrow")
        .groupby(["day", "event_type"])
        .aggregate(Sum("_n", alias_name="n_users"))
    )


ORACLE_WINDOW_DISTINCT_USERS = """
SELECT date_trunc('day', ts) AS day, event_type,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1, 2
"""

QUERIES["window_distinct_users"] = q_window_distinct_users
ORACLES["window_distinct_users"] = ORACLE_WINDOW_DISTINCT_USERS


# ===================================== dense rank over a bounded domain

def q_dense_rank_dates(sf_dir: str):
    """DENSE_RANK over o_orderdate for every order: the rank domain is
    the distinct-date set (bounded — ~365/year — regardless of row
    count), so ranks are computed once from a per-batch distinct
    combiner + small groupby, broadcast via ray.put, and applied in a
    second streaming pass. No row-level sort or enumeration shuffle —
    dense_rank over a bounded key domain never needs one."""
    import ray
    from ray.data.aggregate import Count

    rd = _rd()

    def distinct_dates(t: pa.Table) -> pa.Table:
        return pa.TableGroupBy(t.select(["o_orderdate"]),
                               ["o_orderdate"]).aggregate([])

    dates = (
        rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderdate"])
        .map_batches(distinct_dates, batch_format="pyarrow")
        .groupby("o_orderdate")
        .aggregate(Count(alias_name="_c"))
        .to_pandas()["o_orderdate"]
        .astype("datetime64[us]")
        .astype(np.int64)
        .sort_values()
        .to_numpy()
    )
    rank_of = {int(d): i + 1 for i, d in enumerate(dates)}
    ref = ray.put(rank_of)

    def apply_rank(t: pa.Table) -> pa.Table:
        ranks = ray.get(ref)
        d = pc.cast(pc.cast(t["o_orderdate"], pa.timestamp("us")),
                    pa.int64()).to_numpy(zero_copy_only=False)
        r = np.fromiter((ranks[int(x)] for x in d), dtype=np.int64,
                        count=len(d))
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "date_rank": pa.array(r, pa.int64())})

    return rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).map_batches(apply_rank, batch_format="pyarrow")


ORACLE_DENSE_RANK_DATES = """
SELECT o_orderkey,
       DENSE_RANK() OVER (ORDER BY o_orderdate) AS date_rank
FROM orders
"""

QUERIES["dense_rank_dates"] = q_dense_rank_dates
ORACLES["dense_rank_dates"] = ORACLE_DENSE_RANK_DATES


# ===================================== ratio-to-report (share of total)

def q_revenue_share(sf_dir: str):
    """Per-priority share of total revenue: one combined aggregate pass
    (the group domain is 5 values), then the normalize runs driver-side
    on the 5-row result — the total is derived from the same partials
    rather than a second scan."""
    from ray.data.aggregate import Sum

    rd = _rd()

    def partial(t: pa.Table) -> pa.Table:
        agg = pa.TableGroupBy(t, ["o_orderpriority"]).aggregate(
            [("o_totalprice", "sum")])
        return rename_agg(agg, ["o_orderpriority"], ["o_orderpriority", "_s"])

    out = (
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderpriority", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("_s", alias_name="_s"))
        .to_pandas()
    )
    out["revenue_cents"] = np.floor(out["_s"] * 100 + 0.5).astype(np.int64)
    out["share"] = (out["_s"] / out["_s"].sum()).round(6)
    return out[["o_orderpriority", "revenue_cents", "share"]]


ORACLE_REVENUE_SHARE = """
SELECT o_orderpriority,
       CAST(FLOOR(sum(o_totalprice) * 100 + 0.5) AS BIGINT) AS revenue_cents,
       round(sum(o_totalprice) / sum(sum(o_totalprice)) OVER (), 6) AS share
FROM orders GROUP BY o_orderpriority
"""

QUERIES["revenue_share"] = q_revenue_share
ORACLES["revenue_share"] = ORACLE_REVENUE_SHARE


# ===================================== geometric mean per group

def q_geo_mean_value(sf_dir: str):
    """Grouped geometric mean via the log-sum decomposition: exp(avg(ln x))
    — a plain (sum, count) combiner in log space; two doubles per
    (batch, key) cross the shuffle."""
    from ray.data.aggregate import Sum

    rd = _rd()

    def partial(t: pa.Table) -> pa.Table:
        base = pa.table({"event_type": t["event_type"],
                         "_ln": pc.ln(t["value"])})
        agg = pa.TableGroupBy(base, ["event_type"]).aggregate(
            [("_ln", "sum"), ([], "count_all")])
        return rename_agg(agg, ["event_type"], ["event_type", "_s", "_n"])

    out = (
        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("_s", alias_name="_s"), Sum("_n", alias_name="_n"))
        .to_pandas()
    )
    out["geo_mean"] = np.round(np.exp(out["_s"] / out["_n"]), 6)
    return out[["event_type", "geo_mean"]]


ORACLE_GEO_MEAN_VALUE = """
SELECT event_type, round(exp(avg(ln(value))), 6) AS geo_mean
FROM events GROUP BY event_type
"""

QUERIES["geo_mean_value"] = q_geo_mean_value
ORACLES["geo_mean_value"] = ORACLE_GEO_MEAN_VALUE


# ===================================== semi-structured props extraction

def q_props_stats(sf_dir: str):
    """JSON-ish field extraction from the props column with Arrow's RE2
    extract (no Python-level JSON parse per row), folded into a grouped
    (sum, count, max) combiner."""
    from ray.data.aggregate import Max, Sum

    rd = _rd()

    def partial(t: pa.Table) -> pa.Table:
        st = pc.extract_regex(t["props"], r'"k": (?P<k>\d+)')
        k = pc.cast(pc.struct_field(st, "k"), pa.int64())
        base = pa.table({"event_type": t["event_type"], "_k": k})
        agg = pa.TableGroupBy(base, ["event_type"]).aggregate(
            [("_k", "sum"), ("_k", "max"), ([], "count_all")])
        return rename_agg(agg, ["event_type"],
                          ["event_type", "_s", "_m", "_n"])

    out = (
        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["event_type", "props"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("_s", alias_name="k_sum"),
                   Max("_m", alias_name="k_max"),
                   Sum("_n", alias_name="n"))
        .to_pandas()
    )
    out["k_avg"] = (out["k_sum"] / out["n"]).round(6)
    return out[["event_type", "k_sum", "k_max", "k_avg", "n"]]


ORACLE_PROPS_STATS = """
SELECT event_type,
       sum(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)) AS k_sum,
       max(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)) AS k_max,
       round(avg(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)), 6)
         AS k_avg,
       count(*) AS n
FROM events GROUP BY event_type
"""

QUERIES["props_stats"] = q_props_stats
ORACLES["props_stats"] = ORACLE_PROPS_STATS


# ===================================== as-of attribution pipeline

def q_attribution_value(sf_dir: str):
    """Attribution composition: each event's value is attributed to the
    user's latest order at-or-before the event (the skew-safe as-of
    join), the attributed order's priority is pulled in with ONE
    distributed hash join, and value rolls up per priority. as-of +
    enrichment join + grouped fold — three shuffles total, each on a
    single key."""
    from ray.data.aggregate import Sum

    from odinson_ray.stages.shuffle import hash_join
    from odinson_ray.stages.window import asof_join_latest

    rd = _rd()

    # decorate-join: the 5-value priority rides the as-of order id's low
    # 3 bits (id = o_orderkey*8 + digit), so the priority "join" costs
    # nothing — o_orderkey ordering is preserved, so the as-of tie-break
    # (larger id wins) is unchanged
    PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]

    def enc_orders(t: pa.Table) -> pa.Table:
        digit = pc.cast(pc.utf8_slice_codeunits(t["o_orderpriority"], 0, 1),
                        pa.int64())
        oid = pc.add(pc.multiply(pc.cast(t["o_orderkey"], pa.int64()),
                                 pa.scalar(8, pa.int64())), digit)
        return pa.table({
            "user_id": pc.cast(t["o_custkey"], pa.int64()),
            "ts": pc.cast(t["o_orderdate"], pa.timestamp("us")),
            "id": oid,
        })

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(enc_orders, batch_format="pyarrow")
    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"])
    att = asof_join_latest(
        events.map_batches(lambda t: t.select(["event_id", "user_id", "ts"]),
                           batch_format="pyarrow"),
        orders, key="user_id", ts="ts", ev_id="event_id", ord_id="id",
        out="attr_orderkey", bucket_s=30 * 86400)
    # pin before the next shuffle: the as-of plan already stacks two
    # sorts; fusing two more all-to-alls into ONE streaming plan measured
    # >2x the stepwise wall at sf0.1 (barriers starve each other)
    att = att.materialize()
    att = hash_join(
        att,
        events.map_batches(lambda t: t.select(["event_id", "value"]),
                           batch_format="pyarrow"),
        on="event_id")

    def partial(t: pa.Table) -> pa.Table:
        digit = pc.bit_wise_and(t["attr_orderkey"], pa.scalar(7, pa.int64()))
        prio = pc.take(pa.array([None] + PRIOS, pa.string()),
                       pc.cast(digit, pa.int32()))
        base = pa.table({"o_orderpriority": prio, "value": t["value"]})
        agg = pa.TableGroupBy(base, ["o_orderpriority"]).aggregate(
            [("value", "sum"), ([], "count_all")])
        return rename_agg(agg, ["o_orderpriority"],
                          ["o_orderpriority", "_s", "_n"])

    out = (
        att.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("_s", alias_name="_s"), Sum("_n", alias_name="n_events"))
        .to_pandas()
    )
    out["value_cents"] = np.floor(out["_s"] * 100 + 0.5).astype(np.int64)
    return out[["o_orderpriority", "value_cents", "n_events"]]


ORACLE_ATTRIBUTION_VALUE = """
WITH att AS (
  SELECT event_id, value, o_orderkey FROM (
    SELECT e.event_id, e.value, o.o_orderkey,
           row_number() OVER (PARTITION BY e.event_id
                              ORDER BY o.o_orderdate DESC, o.o_orderkey DESC)
             AS rn
    FROM events e JOIN orders o
      ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
  ) WHERE rn = 1
)
SELECT o.o_orderpriority,
       CAST(FLOOR(sum(att.value) * 100 + 0.5) AS BIGINT) AS value_cents,
       count(*) AS n_events
FROM att JOIN orders o ON o.o_orderkey = att.o_orderkey
GROUP BY o.o_orderpriority
"""

QUERIES["attribution_value"] = q_attribution_value
ORACLES["attribution_value"] = ORACLE_ATTRIBUTION_VALUE


# ===================================== grouped median absolute deviation

def q_value_mad(sf_dir: str):
    """Per-group median absolute deviation — the two-pass broadcast
    pattern: pass 1 computes the exact per-group discrete median from a
    distinct-value histogram (value_quantiles machinery), the tiny
    {group: median} map is broadcast once, and pass 2 histograms the
    absolute deviations the same way. Both passes move distinct
    (group, value) rows, never raw rows; medians are actual elements
    (quantile_disc semantics) so doubles compare bit-exactly."""
    import math

    import ray
    from ray.data.aggregate import Sum

    rd = _rd()

    def hist_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["event_type", "value"]),
                            ["event_type", "value"]).aggregate([([], "count_all")])
        return rename_agg(g, ["event_type", "value"],
                          ["event_type", "value", "_p"])

    def disc_median(g: pa.Table, out_col: str) -> pa.Table:
        o = pc.sort_indices(g["value"])
        v = g["value"].take(o).to_numpy(zero_copy_only=False)
        c = np.cumsum(g["c"].take(o).to_numpy(zero_copy_only=False))
        n = int(c[-1])
        m = float(v[np.searchsorted(c, max(1, math.ceil(0.5 * n)))])
        return pa.table({"event_type": pa.array([g["event_type"][0].as_py()]),
                         out_col: pa.array([m], pa.float64())})

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    med = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby(["event_type", "value"]).aggregate(Sum("_p", alias_name="c"))
        .groupby("event_type")
        .map_groups(lambda g: disc_median(g, "m"), batch_format="pyarrow")
        .to_pandas()
    )
    ref = ray.put(dict(zip(med["event_type"], med["m"])))

    def dev_partial(t: pa.Table) -> pa.Table:
        meds = ray.get(ref)
        keys = t["event_type"].to_numpy(zero_copy_only=False)
        m = np.fromiter((meds[k] for k in keys), dtype=np.float64,
                        count=len(keys))
        dev = np.abs(t["value"].to_numpy(zero_copy_only=False) - m)
        g = pa.TableGroupBy(
            pa.table({"event_type": t["event_type"],
                      "value": pa.array(dev, pa.float64())}),
            ["event_type", "value"]).aggregate([([], "count_all")])
        return rename_agg(g, ["event_type", "value"],
                          ["event_type", "value", "_p"])

    return (
        ds.map_batches(dev_partial, batch_format="pyarrow")
        .groupby(["event_type", "value"]).aggregate(Sum("_p", alias_name="c"))
        .groupby("event_type")
        .map_groups(lambda g: disc_median(g, "mad"), batch_format="pyarrow")
    )


ORACLE_VALUE_MAD = """
WITH med AS (
  SELECT event_type, quantile_disc(value, 0.5) AS m
  FROM events GROUP BY event_type
)
SELECT e.event_type, quantile_disc(abs(e.value - med.m), 0.5) AS mad
FROM events e JOIN med USING (event_type)
GROUP BY e.event_type
"""

QUERIES["value_mad"] = q_value_mad
ORACLES["value_mad"] = ORACLE_VALUE_MAD


# ===================================== EXCEPT via presence flags

def q_urgent_not_low_custs(sf_dir: str):
    """Set difference (customers with an URGENT order EXCEPT customers
    with a LOW one) without running two pipelines: per-batch per-key
    presence flags, one groupby(key).max over the flag pair, filter.
    One shuffle whose rows are bounded by distinct keys per batch."""
    from ray.data.aggregate import Max

    rd = _rd()

    def flags(t: pa.Table) -> pa.Table:
        base = pa.table({
            "o_custkey": t["o_custkey"],
            "_u": pc.cast(pc.equal(t["o_orderpriority"], "1-URGENT"), pa.int8()),
            "_l": pc.cast(pc.equal(t["o_orderpriority"], "5-LOW"), pa.int8()),
        })
        agg = pa.TableGroupBy(base, ["o_custkey"]).aggregate(
            [("_u", "max"), ("_l", "max")])
        return rename_agg(agg, ["o_custkey"], ["o_custkey", "_u", "_l"])

    return (
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_orderpriority"])
        .map_batches(flags, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Max("_u", alias_name="_a"), Max("_l", alias_name="_b"))
        .map_batches(
            lambda t: t.filter(pc.and_(pc.equal(t["_a"], 1),
                                       pc.equal(t["_b"], 0))).select(["o_custkey"]),
            batch_format="pyarrow")
    )


ORACLE_URGENT_NOT_LOW_CUSTS = """
SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
EXCEPT
SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
"""


QUERIES["urgent_not_low_custs"] = q_urgent_not_low_custs
ORACLES["urgent_not_low_custs"] = ORACLE_URGENT_NOT_LOW_CUSTS


# ===================================== JSONL source/sink round trip

def q_jsonl_roundtrip_langs(sf_dir: str):
    """JSONL sink + source path: stream documents out as partitioned
    JSONL (one file per block — Ray's write_json), read them back with
    the JSONL reader, and aggregate. Exercises the non-parquet IO path
    end-to-end; the aggregate proves no rows were lost or mangled in
    serialization."""
    import tempfile

    import ray.data as rd_native

    from ray.data.aggregate import Sum

    rd = _rd()
    out_dir = tempfile.mkdtemp(prefix="odinson_jsonl_", dir="/tmp")
    (rd.read_parquet(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "lang", "n_chars"])
     .write_json(out_dir))

    def partial(t: pa.Table) -> pa.Table:
        agg = pa.TableGroupBy(t, ["lang"]).aggregate(
            [("n_chars", "sum"), ([], "count_all")])
        return rename_agg(agg, ["lang"], ["lang", "_s", "_n"])

    return (
        rd_native.read_json(out_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("_s", alias_name="sum_chars"), Sum("_n", alias_name="n"))
    )


ORACLE_JSONL_ROUNDTRIP_LANGS = """
SELECT lang, sum(n_chars) AS sum_chars, count(*) AS n
FROM documents GROUP BY lang
"""

QUERIES["jsonl_roundtrip_langs"] = q_jsonl_roundtrip_langs
ORACLES["jsonl_roundtrip_langs"] = ORACLE_JSONL_ROUNDTRIP_LANGS


# ===================================== distributed covariance matrix

def q_embedding_cov(sf_dir: str):
    """Full d x d covariance matrix of the embedding column from
    sufficient statistics: each batch contributes ONE partial row
    (n, sum-vector, sum-of-outer-products matrix) computed with a single
    einsum — vectors never shuffle, and the reduce tree merges
    fixed-size (d^2 + d + 1)-float rows (two levels: content-salted
    groupby, then a <=64-row driver fold), so the reduce cost is
    independent of corpus size. Output is the upper triangle in long
    (i, j, cov) form, 1-based to match SQL generate_subscripts."""
    import hashlib as _hl

    rd = _rd()

    def partial(t: pa.Table) -> pa.Table:
        x = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        n = x.shape[0]
        s = x.sum(axis=0)
        ss = np.einsum("ni,nj->ij", x, x)
        salt = int.from_bytes(_hl.md5(s.tobytes()).digest()[:4], "little") % 64
        return pa.table({
            "_g": pa.array([salt], pa.int32()),
            "n": pa.array([n], pa.int64()),
            "s": pa.array([s.tolist()], pa.list_(pa.float64())),
            "ss": pa.array([ss.ravel().tolist()], pa.list_(pa.float64())),
        })

    def merge(g: pa.Table) -> pa.Table:
        n = int(pc.sum(g["n"]).as_py())
        s = np.asarray(g["s"].to_pylist(), dtype=np.float64).sum(axis=0)
        ss = np.asarray(g["ss"].to_pylist(), dtype=np.float64).sum(axis=0)
        return pa.table({
            "_g": pa.array([0], pa.int32()),
            "n": pa.array([n], pa.int64()),
            "s": pa.array([s.tolist()], pa.list_(pa.float64())),
            "ss": pa.array([ss.tolist()], pa.list_(pa.float64())),
        })

    parts = (
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_g")
        .map_groups(merge, batch_format="pyarrow")
        .to_pandas()
    )
    n = int(parts["n"].sum())
    s = np.asarray(parts["s"].tolist(), dtype=np.float64).sum(axis=0)
    ss = np.asarray(parts["ss"].tolist(), dtype=np.float64).sum(axis=0)
    d = s.shape[0]
    mean = s / n
    cov = ss.reshape(d, d) / n - np.outer(mean, mean)
    iu, ju = np.triu_indices(d)
    return pd.DataFrame({
        "i": (iu + 1).astype(np.int64),
        "j": (ju + 1).astype(np.int64),
        "cov": np.round(cov[iu, ju], 8),
    })


ORACLE_EMBEDDING_COV = """
WITH e AS (
  SELECT vec_id, unnest(embedding) AS v,
         generate_subscripts(embedding, 1) AS idx
  FROM embeddings
)
SELECT a.idx AS i, b.idx AS j, round(covar_pop(a.v, b.v), 8) AS cov
FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.idx <= b.idx
GROUP BY a.idx, b.idx
"""

QUERIES["embedding_cov"] = q_embedding_cov
ORACLES["embedding_cov"] = ORACLE_EMBEDDING_COV


# ===================================== BFS levels over the KG graph

def q_kg_bfs_levels(sf_dir: str, rounds: int = 3):
    """Multi-source-free BFS: levels 0..3 from a deterministic seed (the
    max-out-degree entity, ties to the lexicographically smallest) over
    the canonical triple graph. Each round is one distributed hash join
    (frontier x edges) + an anti join against the visited set — the
    textbook frontier-expansion decomposition; frontiers and the visited
    set stay Datasets (pinned per round: each is consumed by the next
    join AND the union, the fan-out rule). Rounds are bounded, so the
    oracle unrolls as a depth-capped recursive CTE."""
    from ray.data.aggregate import Count

    from odinson_ray.stages.shuffle import global_topk, hash_join

    from .kg import triples_dataset

    rd = _rd()

    def to_edges(t: pa.Table) -> pa.Table:
        e = pa.table({"src": t["subj_canon"], "dst": t["obj_canon"]})
        return pa.TableGroupBy(e, ["src", "dst"]).aggregate([])

    edges = (
        triples_dataset(sf_dir)
        .map_batches(to_edges, batch_format="pyarrow")
        .groupby(["src", "dst"]).aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
    ).materialize()

    deg = edges.groupby("src").aggregate(Count(alias_name="d"))
    seed = global_topk(deg, ["d", "src"], [True, False], 1).to_pandas()
    seed_v = seed["src"].iloc[0]

    import ray.data as rdn

    visited = rdn.from_arrow(pa.table({
        "entity": pa.array([seed_v], pa.string()),
        "level": pa.array([0], pa.int64()),
    })).materialize()
    frontier = visited

    for r in range(1, rounds + 1):
        nxt = hash_join(
            frontier.map_batches(lambda t: t.select(["entity"]),
                                 batch_format="pyarrow"),
            edges, on="entity", right_on="src")

        def distinct_dst(t: pa.Table) -> pa.Table:
            return pa.TableGroupBy(pa.table({"entity": t["dst"]}),
                                   ["entity"]).aggregate([])

        nxt = (nxt.map_batches(distinct_dst, batch_format="pyarrow")
               .groupby("entity").aggregate(Count(alias_name="_c"))
               .drop_columns(["_c"]))
        new = hash_join(nxt, visited, on="entity", how="anti",
                        right_on="entity")
        lvl = r
        new = new.map_batches(
            lambda t, lvl=lvl: t.append_column(
                "level", pa.array(np.full(t.num_rows, lvl), pa.int64())),
            batch_format="pyarrow").materialize()
        if new.count() == 0:
            # frontier exhausted before the round cap: an empty Dataset
            # loses its schema, and a further join would both crash and
            # be pointless
            break
        visited = visited.union(new).materialize()
        frontier = new

    return visited


def _bfs_oracle(rounds: int = 3) -> str:
    return f"""
WITH RECURSIVE trip AS ({_KG_TRIPLES_BODY}),
edges AS (SELECT DISTINCT subj_canon AS src, obj_canon AS dst FROM trip),
deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
seed AS (SELECT src FROM deg ORDER BY d DESC, src LIMIT 1),
bfs(v, lvl) AS (
  SELECT src, 0 FROM seed
  UNION ALL
  SELECT e.dst, b.lvl + 1 FROM bfs b JOIN edges e ON e.src = b.v
  WHERE b.lvl < {rounds}
)
SELECT v AS entity, CAST(MIN(lvl) AS BIGINT) AS level FROM bfs GROUP BY v
"""


ORACLE_KG_BFS_LEVELS = _bfs_oracle(3)

QUERIES["kg_bfs_levels"] = q_kg_bfs_levels
ORACLES["kg_bfs_levels"] = ORACLE_KG_BFS_LEVELS


# ===================================== sliding-window distinct (7-day)

def q_rolling_distinct_users(sf_dir: str):
    """Rolling 7-day distinct users per day via interval expansion: the
    distinct (day, user) pair set (bounded by users x active days, one
    groupby) fans each pair out to the <=7 windows it contributes to,
    dedups again, and folds to a per-window count. Overlapping windows
    never rescan events — the expansion factor is the window length, and
    it applies to the DISTINCT pair set, not the raw stream."""
    from ray.data.aggregate import Count, Sum

    rd = _rd()
    day_us = 86400 * 1_000_000

    def pairs(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        day = pc.multiply(pc.floor(pc.divide(us, day_us)), day_us)
        base = pa.table({"day": pc.cast(day, pa.int64()),
                         "user_id": t["user_id"]})
        return pa.TableGroupBy(base, ["day", "user_id"]).aggregate([])

    def expand(t: pa.Table) -> pa.Table:
        d = t["day"].to_numpy(zero_copy_only=False)
        u = t["user_id"].to_numpy(zero_copy_only=False)
        k = np.arange(7, dtype=np.int64) * day_us
        wday = (d[:, None] + k[None, :]).ravel()
        base = pa.table({"wday": pa.array(wday, pa.int64()),
                         "user_id": pa.array(np.repeat(u, 7), pa.int64())})
        return pa.TableGroupBy(base, ["wday", "user_id"]).aggregate([])

    def fold(t: pa.Table) -> pa.Table:
        agg = pa.TableGroupBy(t.select(["wday"]), ["wday"]).aggregate(
            [([], "count_all")])
        return rename_agg(agg, ["wday"], ["wday", "_n"])

    out = (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby(["day", "user_id"]).aggregate(Count(alias_name="_c"))
        .map_batches(expand, batch_format="pyarrow")
        .groupby(["wday", "user_id"]).aggregate(Count(alias_name="_c"))
        .map_batches(fold, batch_format="pyarrow")
        .groupby("wday").aggregate(Sum("_n", alias_name="n7"))
    )
    return out.map_batches(
        lambda t: pa.table({"day": pc.cast(t["wday"], pa.timestamp("us")),
                            "n7": t["sum(n7)"] if "sum(n7)" in t.column_names
                            else t["n7"]}),
        batch_format="pyarrow")


ORACLE_ROLLING_DISTINCT_USERS = """
WITH du AS (
  SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
)
SELECT du.day + g.i * INTERVAL 1 DAY AS day,
       count(DISTINCT du.user_id) AS n7
FROM du, generate_series(0, 6) AS g(i)
GROUP BY 1
"""

QUERIES["rolling_distinct_users"] = q_rolling_distinct_users
ORACLES["rolling_distinct_users"] = ORACLE_ROLLING_DISTINCT_USERS


# ===================================== trending tokens per day

def q_trending_tokens(sf_dir: str):
    """Windowed top-k: the 3 most frequent tokens per day over documents
    (doc day derived from doc_id so the synthetic corpus gets a stable
    time axis). Per-batch (day, token) count combiner, one groupby for
    exact counts, then grouped_topk per day — ties broken (count DESC,
    token ASC) identically in SQL."""
    from ray.data.aggregate import Sum

    from odinson_ray.stages.shuffle import grouped_topk

    rd = _rd()

    def counts(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        day = t["doc_id"].to_numpy(zero_copy_only=False) % 7
        n = pc.list_value_length(toks).cast(pa.int64())
        flat = pc.list_flatten(toks)
        days = pa.array(np.repeat(day, n.to_numpy(zero_copy_only=False)))
        base = pa.table({"day": days, "token": flat})
        agg = pa.TableGroupBy(base, ["day", "token"]).aggregate(
            [([], "count_all")])
        return rename_agg(agg, ["day", "token"], ["day", "token", "_n"])

    counts_ds = (
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])
        .map_batches(counts, batch_format="pyarrow")
        .groupby(["day", "token"]).aggregate(Sum("_n", alias_name="n"))
    )
    return grouped_topk(counts_ds, by="day", cols=["n", "token"],
                        descending=[True, False], k=3)


ORACLE_TRENDING_TOKENS = """
WITH tok AS (
  SELECT doc_id % 7 AS day, unnest(string_split(text, ' ')) AS token
  FROM documents
), cnt AS (
  SELECT day, token, count(*) AS n FROM tok GROUP BY day, token
)
SELECT day, token, n FROM (
  SELECT day, token, n,
         row_number() OVER (PARTITION BY day
                            ORDER BY n DESC, token ASC) AS rn
  FROM cnt
) WHERE rn <= 3
"""

QUERIES["trending_tokens"] = q_trending_tokens
ORACLES["trending_tokens"] = ORACLE_TRENDING_TOKENS


# ===================================== market-basket pairs (user, day)

def q_basket_pairs(sf_dir: str):
    """Co-occurrence counts of event-type pairs within a (user, day)
    basket. Baskets are ~5 rows — per-basket map_groups would pay the
    tiny-group dispatch tax (the round-4 lesson) — so baskets are
    co-located with ONE shuffle on hash(user, day) %% 256 coarse
    partitions and paired with segmented numpy per partition: lexsort,
    run boundaries, per-run upper-triangle index arithmetic. Pair counts
    then fold through a small groupby."""
    from ray.data.aggregate import Count, Sum

    from odinson_ray.stages.sketch import _splitmix64

    rd = _rd()
    day_us = 86400 * 1_000_000
    PARTS = 256

    def distinct_triples(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        day = pc.cast(pc.floor(pc.divide(us, day_us)), pa.int64())
        base = pa.table({"user_id": t["user_id"], "day": day,
                         "event_type": t["event_type"]})
        return pa.TableGroupBy(
            base, ["user_id", "day", "event_type"]).aggregate([])

    def add_part(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        d = t["day"].to_numpy(zero_copy_only=False).astype(np.uint64)
        p = (_splitmix64(u * np.uint64(1_000_003) + d)
             % np.uint64(PARTS)).astype(np.int64)
        return t.append_column("_p", pa.array(p, pa.int64()))

    def pair_partition(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        u = g["user_id"].to_numpy(zero_copy_only=False)
        d = g["day"].to_numpy(zero_copy_only=False)
        ty = np.asarray(g["event_type"].to_pylist(), dtype=object)
        order = np.lexsort((ty, d, u))
        u, d, ty = u[order], d[order], ty[order]
        starts = np.concatenate(
            ([0], np.flatnonzero((u[1:] != u[:-1]) | (d[1:] != d[:-1])) + 1,
             [len(u)]))
        lens = np.diff(starts)
        # per-run upper-triangle pairs via index arithmetic (no per-run loop
        # over pairs; runs are capped at the distinct-type count)
        a_idx, b_idx = [], []
        for s, L in zip(starts[:-1], lens):
            if L < 2:
                continue
            iu, ju = np.triu_indices(L, k=1)
            a_idx.append(s + iu)
            b_idx.append(s + ju)
        if not a_idx:
            return pa.table({"ta": pa.array([], pa.string()),
                             "tb": pa.array([], pa.string()),
                             "_n": pa.array([], pa.int64())})
        a = np.concatenate(a_idx)
        b = np.concatenate(b_idx)
        base = pa.table({"ta": pa.array(ty[a].tolist(), pa.string()),
                         "tb": pa.array(ty[b].tolist(), pa.string())})
        agg = pa.TableGroupBy(base, ["ta", "tb"]).aggregate([([], "count_all")])
        return rename_agg(agg, ["ta", "tb"], ["ta", "tb", "_n"])

    return (
        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["user_id", "ts", "event_type"])
        .map_batches(distinct_triples, batch_format="pyarrow")
        .groupby(["user_id", "day", "event_type"])
        .aggregate(Count(alias_name="_c"))
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("_p")
        .map_groups(pair_partition, batch_format="pyarrow")
        .groupby(["ta", "tb"])
        .aggregate(Sum("_n", alias_name="n"))
    )


ORACLE_BASKET_PAIRS = """
WITH du AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day, event_type
  FROM events
)
SELECT a.event_type AS ta, b.event_type AS tb, count(*) AS n
FROM du a JOIN du b
  ON a.user_id = b.user_id AND a.day = b.day
 AND a.event_type < b.event_type
GROUP BY 1, 2
"""

QUERIES["basket_pairs"] = q_basket_pairs
ORACLES["basket_pairs"] = ORACLE_BASKET_PAIRS


# ===================================== ordered string aggregation

def q_user_top3_types(sf_dir: str):
    """Per-user ordered string_agg of the top-3 event types by count
    (count DESC, type ASC). Counts come from the distinct-pairs
    combiner; grouped_topk bounds each user to 3 rows; the concat runs
    segmented-numpy inside coarse hash partitions (3-row groups are the
    tiny-group case, never one task each)."""
    from ray.data.aggregate import Sum

    from odinson_ray.stages.shuffle import grouped_topk
    from odinson_ray.stages.sketch import _splitmix64

    rd = _rd()
    PARTS = 256

    def counts(t: pa.Table) -> pa.Table:
        agg = pa.TableGroupBy(t.select(["user_id", "event_type"]),
                              ["user_id", "event_type"]).aggregate(
            [([], "count_all")])
        return rename_agg(agg, ["user_id", "event_type"],
                          ["user_id", "event_type", "_n"])

    per_type = (
        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["user_id", "event_type"])
        .map_batches(counts, batch_format="pyarrow")
        .groupby(["user_id", "event_type"]).aggregate(Sum("_n", alias_name="n"))
    )
    top3 = grouped_topk(per_type, by="user_id", cols=["n", "event_type"],
                        descending=[True, False], k=3)

    def add_part(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        p = (_splitmix64(u) % np.uint64(PARTS)).astype(np.int64)
        return t.append_column("_p", pa.array(p, pa.int64()))

    def concat_partition(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        u = g["user_id"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        ty = np.asarray(g["event_type"].to_pylist(), dtype=object)
        order = np.lexsort((ty, -n, u))
        u, ty = u[order], ty[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(u[1:] != u[:-1]) + 1, [len(u)]))
        users, tops = [], []
        for s, e in zip(starts[:-1], starts[1:]):
            users.append(int(u[s]))
            tops.append(",".join(ty[s:e]))
        return pa.table({"user_id": pa.array(users, pa.int64()),
                         "top_types": pa.array(tops, pa.string())})

    return (top3.map_batches(add_part, batch_format="pyarrow")
            .groupby("_p")
            .map_groups(concat_partition, batch_format="pyarrow"))


ORACLE_USER_TOP3_TYPES = """
WITH cnt AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events GROUP BY user_id, event_type
), ranked AS (
  SELECT user_id, event_type, n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY n DESC, event_type ASC) AS rn
  FROM cnt
)
SELECT user_id,
       string_agg(event_type, ',' ORDER BY n DESC, event_type ASC)
         AS top_types
FROM ranked WHERE rn <= 3
GROUP BY user_id
"""

QUERIES["user_top3_types"] = q_user_top3_types
ORACLES["user_top3_types"] = ORACLE_USER_TOP3_TYPES


# ===================================== round-4 batch k (queries2.py)

from . import queries2 as _q2  # noqa: E402

_q2.register(QUERIES, ORACLES, _KG_TRIPLES_BODY)

from . import queries3 as _q3  # noqa: E402

_q3.register(QUERIES, ORACLES, _KG_TRIPLES_BODY)

_q3._register_batch_m(QUERIES, ORACLES)

_q3._register_batch_n(QUERIES, ORACLES)

_q3._register_batch_o(QUERIES, ORACLES, _KG_TRIPLES_BODY)

_q3._register_batch_p(QUERIES, ORACLES)

_q3._register_batch_q(QUERIES, ORACLES)

_q3._register_batch_r(QUERIES, ORACLES)

_q3._register_batch_s(QUERIES, ORACLES)

_q3._register_batch_t(QUERIES, ORACLES)

_q3._register_batch_u(QUERIES, ORACLES, _KG_TRIPLES_BODY)

from . import queries4 as _q4  # noqa: E402

_q4.register(QUERIES, ORACLES, _KG_TRIPLES_BODY)


# ===================================== triple provenance (audit layer)

def q_kg_provenance(sf_dir: str, k_docs: int = 5):
    """Provenance for every canonical triple: how many distinct documents
    support it and the first 5 supporting doc ids — the audit layer a KG
    construction pipeline ships alongside the graph (reference parity:
    Odinson mentions carry their docId/sentenceId provenance,
    core/src/main/scala/ai/lum/odinson/Mention.scala). Shape: doc-granular
    triples from the unfused mention chain, per-batch distinct
    (triple, doc) combiner, one count groupby, grouped_topk k=5 +
    segmented concat for the doc list (the inverted_postings shape — a
    boilerplate triple's full doc set never lands in one task)."""
    from ray.data.aggregate import Sum

    from odinson_ray.stages.canon import canonicalize_dataset
    from odinson_ray.stages.shuffle import grouped_topk, hash_join
    from odinson_ray.stages.sketch import _splitmix64
    from odinson_ray.stages.triples import mentions_to_triples

    from .kg import mentions_dataset

    SEP = "\x1f"
    PARTS = 256

    mentions = mentions_dataset(sf_dir).map_batches(
        lambda t: t.filter(pc.equal(t["label"], "SVO")),
        batch_format="pyarrow")
    trips, _roots = canonicalize_dataset(
        mentions.map_batches(mentions_to_triples, batch_format="pyarrow"))

    def keyed_distinct(t: pa.Table) -> pa.Table:
        tk = pc.binary_join_element_wise(
            t["subj_canon"], t["pred"], t["obj_canon"], SEP)
        base = pa.table({"tk": tk, "doc_id": t["doc_id"]})
        return pa.TableGroupBy(base, ["tk", "doc_id"]).aggregate([])

    from ray.data.aggregate import Count

    td = (trips.map_batches(keyed_distinct, batch_format="pyarrow")
          .groupby(["tk", "doc_id"]).aggregate(Count(alias_name="_c"))
          .drop_columns(["_c"])).materialize()

    def cnt_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["tk"]), ["tk"]).aggregate(
            [([], "count_all")])
        return pa.table({"tk": g["tk"], "pn": g["count_all"]})

    ndocs = (td.map_batches(cnt_partial, batch_format="pyarrow")
             .groupby("tk").aggregate(Sum("pn", alias_name="n_docs")))

    top = grouped_topk(td, by="tk", cols=["doc_id"], descending=[False],
                       k=k_docs)

    def add_part(t: pa.Table) -> pa.Table:
        import zlib

        h = np.array([zlib.crc32(x.encode())
                      for x in t["tk"].to_pylist()], dtype=np.uint64)
        p = (_splitmix64(h) % np.uint64(PARTS)).astype(np.int64)
        return t.append_column("_p", pa.array(p, pa.int64()))

    def concat_partition(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        tk = np.asarray(g["tk"].to_pylist(), dtype=object)
        d = np.asarray(g["doc_id"].to_pylist(), dtype=object)
        order = np.lexsort((d, tk))
        tk, d = tk[order], d[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(tk[1:] != tk[:-1]) + 1, [len(tk)]))
        keys, docs = [], []
        for s, e in zip(starts[:-1], starts[1:]):
            keys.append(tk[s])
            docs.append(",".join(d[s:e]))
        return pa.table({"tk": pa.array(keys, pa.string()),
                         "docs": pa.array(docs, pa.string())})

    posts = (top.map_batches(add_part, batch_format="pyarrow")
             .groupby("_p").map_groups(concat_partition,
                                       batch_format="pyarrow"))

    joined = hash_join(
        ndocs, posts, on="tk",
        left_schema=pa.schema([("tk", pa.string()), ("n_docs", pa.int64())]),
        right_schema=pa.schema([("tk", pa.string()), ("docs", pa.string())]))

    def finish(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t["tk"].combine_chunks(), SEP)
        return pa.table({
            "subj_canon": pc.list_element(parts, 0),
            "pred": pc.list_element(parts, 1),
            "obj_canon": pc.list_element(parts, 2),
            "n_docs": t["n_docs"],
            "docs": t["docs"],
        })

    return joined.map_batches(finish, batch_format="pyarrow")


ORACLE_KG_PROVENANCE = f"""
WITH toks AS (
  SELECT printf('doc-%06d', doc_id) AS doc_id, doc_id AS did,
         unnest(string_split(text, ' ')) AS tok,
         unnest(generate_series(1, len(string_split(text, ' ')))) AS p
  FROM documents
),
postoks AS (
  SELECT doc_id, did, tok, p, CAST(((p - 1) % 20) AS INT) AS l
  FROM toks
),
raw AS (
  SELECT a.doc_id, b.tok AS subj, a.tok AS pred, c.tok AS obj
  FROM postoks a JOIN postoks b ON b.did = a.did AND b.p = a.p + 1
                 JOIN postoks c ON c.did = a.did AND c.p = a.p + 2
  WHERE a.l % 5 = 0
    AND a.tok IN ('scan', 'join', 'sort', 'merge', 'filter', 'group')
),
canon AS (
  SELECT DISTINCT doc_id,
         'ent:' || {_CANON_SQL.format(c='subj')} AS subj_canon,
         pred,
         'ent:' || {_CANON_SQL.format(c='obj')} AS obj_canon
  FROM raw
),
agg AS (
  SELECT subj_canon, pred, obj_canon, CAST(count(*) AS BIGINT) AS n_docs
  FROM canon GROUP BY 1, 2, 3
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY subj_canon, pred, obj_canon
                               ORDER BY doc_id) AS rn
  FROM canon
),
posts AS (
  SELECT subj_canon, pred, obj_canon,
         string_agg(doc_id, ',' ORDER BY doc_id) AS docs
  FROM ranked WHERE rn <= 5 GROUP BY 1, 2, 3
)
SELECT agg.subj_canon, agg.pred, agg.obj_canon, agg.n_docs, posts.docs
FROM agg JOIN posts USING (subj_canon, pred, obj_canon)
"""

QUERIES["kg_provenance"] = q_kg_provenance
ORACLES["kg_provenance"] = ORACLE_KG_PROVENANCE


# ===================================== KWIC concordance (shell highlight)

KWIC_RULES = """
rules:
  - name: kwic
    label: Kwic
    type: basic
    pattern: "scan"
"""


def q_odinson_kwic(sf_dir: str):
    """Keyword-in-context concordance for a pattern's matches — the
    queryable twin of the shell's highlight output (shell.py renders the
    same +-2-token window; reference: extra/.../Shell.scala highlights).
    Matches come from the REAL matcher pipeline; contexts come from one
    hash join back to the documents table (mentions deliberately do not
    carry their neighborhood — context attachment is a join, not a wider
    mention row). The per-match window slice is a small Python pass over
    join output, bounded by match count, not corpus size."""
    from odinson_ray.stages.shuffle import hash_join

    rd = _rd()

    m = _mention_rows(sf_dir, KWIC_RULES, "Kwic").map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "sent_id": t["sent_id"],
                            "start": t["start"]}),
        batch_format="pyarrow")

    def keyed_docs(t: pa.Table) -> pa.Table:
        ids = [f"doc-{i:06d}" for i in t["doc_id"].to_pylist()]
        return pa.table({"doc_id": pa.array(ids, pa.string()),
                         "text": t["text"]})

    docs = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
            .map_batches(keyed_docs, batch_format="pyarrow"))

    j = hash_join(
        m, docs, on="doc_id",
        left_schema=pa.schema([("doc_id", pa.string()),
                               ("sent_id", pa.int32()),
                               ("start", pa.int32())]),
        right_schema=pa.schema([("doc_id", pa.string()),
                                ("text", pa.string())]))

    def ctx(t: pa.Table) -> pa.Table:
        sid = t["sent_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        st = t["start"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = sid * 20 + st  # 0-based global token position
        lefts, terms, rights = [], [], []
        for gi, txt in zip(g, t["text"].to_pylist()):
            toks = txt.split(" ")
            lefts.append(" ".join(toks[max(0, gi - 2):gi]))
            terms.append(toks[gi])
            rights.append(" ".join(toks[gi + 1:gi + 3]))
        return pa.table({
            "doc_id": t["doc_id"],
            "p": pa.array(g + 1, pa.int64()),
            "left_ctx": pa.array(lefts, pa.string()),
            "term": pa.array(terms, pa.string()),
            "right_ctx": pa.array(rights, pa.string()),
        })

    return j.map_batches(ctx, batch_format="pyarrow")


ORACLE_ODINSON_KWIC = """
WITH d AS (
  SELECT printf('doc-%06d', doc_id) AS doc_id,
         string_split(text, ' ') AS ts
  FROM documents
),
pos AS (
  SELECT doc_id, ts, unnest(generate_series(1, len(ts))) AS p FROM d
)
SELECT doc_id, CAST(p AS BIGINT) AS p,
       COALESCE(array_to_string(ts[greatest(1, p - 2):p - 1], ' '), '')
         AS left_ctx,
       ts[p] AS term,
       COALESCE(array_to_string(ts[p + 1:least(len(ts), p + 2)], ' '), '')
         AS right_ctx
FROM pos WHERE ts[p] = 'scan'
"""

QUERIES["odinson_kwic"] = q_odinson_kwic
ORACLES["odinson_kwic"] = ORACLE_ODINSON_KWIC

_q3._register_batch_v(QUERIES, ORACLES, _KG_TRIPLES_BODY)

_q3._register_batch_w(QUERIES, ORACLES)

_q3._register_batch_x(QUERIES, ORACLES)

_q3._register_batch_y(QUERIES, ORACLES, _KG_TRIPLES_BODY)

_q3._register_batch_z(QUERIES, ORACLES)

from . import queries5 as _q5  # noqa: E402

_q5.register(QUERIES, ORACLES, _KG_TRIPLES_BODY)

from . import queries6 as _q6  # noqa: E402

_q6.register(QUERIES, ORACLES, _KG_TRIPLES_BODY)

# doc-granular canonical triples (doc_id + numeric did kept) — the
# provenance/temporal front end; nested WITH is legal as a CTE body
_KG_DOC_TRIPLES_BODY = f"""
WITH toks7 AS (
  SELECT printf('doc-%06d', doc_id) AS doc_id, doc_id AS did,
         unnest(string_split(text, ' ')) AS tok,
         unnest(generate_series(1, len(string_split(text, ' ')))) AS p
  FROM documents
),
postoks7 AS (
  SELECT doc_id, did, tok, p, CAST(((p - 1) % 20) AS INT) AS l
  FROM toks7
),
raw7 AS (
  SELECT a.doc_id, a.did, b.tok AS subj, a.tok AS pred, c.tok AS obj
  FROM postoks7 a JOIN postoks7 b ON b.did = a.did AND b.p = a.p + 1
                  JOIN postoks7 c ON c.did = a.did AND c.p = a.p + 2
  WHERE a.l % 5 = 0
    AND a.tok IN ('scan', 'join', 'sort', 'merge', 'filter', 'group')
)
SELECT DISTINCT doc_id, did,
       'ent:' || {_CANON_SQL.format(c='subj')} AS subj_canon,
       pred,
       'ent:' || {_CANON_SQL.format(c='obj')} AS obj_canon
FROM raw7
"""

from . import queries7 as _q7  # noqa: E402

_q7.register(QUERIES, ORACLES, _KG_TRIPLES_BODY, _KG_DOC_TRIPLES_BODY)

from . import queries8 as _q8  # noqa: E402

_q8.register(QUERIES, ORACLES)

from . import queries9 as _q9  # noqa: E402

_q9.register(QUERIES, ORACLES)

from . import queries10 as _q10  # noqa: E402

_q10.register(QUERIES, ORACLES)

from . import queries11 as _q11  # noqa: E402

_q11.register(QUERIES, ORACLES)

from . import queries12 as _q12  # noqa: E402

_q12.register(QUERIES, ORACLES)

from . import queries13 as _q13  # noqa: E402

_q13.register(QUERIES, ORACLES)

from . import queries14 as _q14  # noqa: E402

_q14.register(QUERIES, ORACLES)

from . import queries15 as _q15  # noqa: E402

_q15.register(QUERIES, ORACLES, _KG_TRIPLES_BODY)

from . import queries16 as _q16  # noqa: E402

_q16.register(QUERIES, ORACLES)

from . import queries17 as _q17  # noqa: E402

_q17.register(QUERIES, ORACLES)

from . import queries18 as _q18  # noqa: E402

_q18.register(QUERIES, ORACLES, _KG_TRIPLES_BODY)

from . import queries19 as _q19  # noqa: E402

_q19.register(QUERIES, ORACLES)

from . import queries20 as _q20  # noqa: E402

_q20.register(QUERIES, ORACLES, _KG_TRIPLES_BODY)
