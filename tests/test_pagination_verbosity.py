"""searchAfter pagination + mention verbosity tiers
(VERDICT r01 missing items #5 and #6)."""

import pandas as pd

from odinson_ray.api import OdinsonEngine


def _engine():
    e1 = OdinsonEngine.from_fixture("becky-gummy-bears")
    e2 = OdinsonEngine.from_fixture("alien-species")
    return OdinsonEngine(e1.docs + e2.docs)


def test_search_after_pagination():
    engine = _engine()
    full = engine.query("[]")  # every token of every sentence
    assert len(full) > 10
    # page through with n=7 using the last mention as the cursor;
    # sentence-granular resume (one Lucene doc == one sentence)
    pages = []
    after = None
    while True:
        page = engine.query("[]", n=7, after=after)
        if not page:
            break
        pages.append(page)
        after = page[-1]
    paged = [m for p in pages for m in p]
    # mention-granular cursor: lossless, duplicate-free, order-preserving
    ids = lambda ms: [(m.doc_id, m.sent_idx, m.start, m.end) for m in ms]
    assert ids(paged) == ids(full)
    assert all(len(p) == 7 for p in pages[:-1])
    # a bare (doc_id, sent_idx) cursor resumes from the NEXT sentence
    # (the reference's doc-granular searchAfter)
    first = full[0]
    rest = engine.query("[]", after=(first.doc_id, first.sent_idx))
    assert all(
        (m.doc_id != first.doc_id) or (m.sent_idx > first.sent_idx) for m in rest
    )


def test_mention_fields_verbosity_levels():
    engine = OdinsonEngine.from_fixture("becky-gummy-bears")
    m = engine.query("[lemma=eat]")[0]
    assert engine.mention_fields(m, OdinsonEngine.MINIMAL) == {}
    disp = engine.mention_fields(m, OdinsonEngine.DISPLAY)
    assert list(disp) == ["raw"] and disp["raw"] == ["ate"]
    full = engine.mention_fields(m, OdinsonEngine.ALL)
    assert set(full) >= {"raw", "word", "lemma", "tag"}
    assert full["lemma"] == ["eat"]


def test_matcher_verbosity_column(ray_session, sf_dir):
    from odinson_ray.pipelines.kg import FLAGSHIP_RULES
    from odinson_ray.sources.interleaved import read_interleaved
    from odinson_ray.stages.match import GrammarMatcher

    docs = read_interleaved(sf_dir)

    def run(verbosity):
        return docs.map_batches(
            GrammarMatcher,
            fn_constructor_args=(FLAGSHIP_RULES,),
            fn_constructor_kwargs={"verbosity": verbosity},
            batch_format="pyarrow", concurrency=1, batch_size=256, num_cpus=1,
        ).to_pandas()

    display = run("display")
    minimal = run("minimal")
    allv = run("all")
    # same mentions at every tier
    key = ["doc_id", "sent_id", "label", "start", "end"]
    for df in (minimal, allv):
        pd.testing.assert_frame_equal(
            display[key].sort_values(key).reset_index(drop=True),
            df[key].sort_values(key).reset_index(drop=True),
        )
    assert minimal["text"].isna().all()
    assert "mention_fields" not in display.columns
    assert "mention_fields" in allv.columns
    row = allv.iloc[0]
    names = {f["name"] for f in row["mention_fields"]}
    assert {"raw", "tag", "lemma"} <= names
