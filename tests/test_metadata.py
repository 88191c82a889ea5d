"""Metadata query language semantics (mirrors metadata/TestMetadataFilter
expectations from the reference: comparisons, chaining, contains, nested
blocks, date functions, boolean combinators)."""

import datetime

import pytest

from odinson_ray.lang.metadata import compile_filter

MD = {
    "lang": "en",
    "source": "src3",
    "citations": 12.0,
    "pub_date": datetime.date(2020, 5, 4),
    "venue": ["Journal", "of", "Tests"],
    "authors": [{"first": "Ada", "last": "L"}, {"first": "Bo", "last": "K"}],
}

CASES = [
    ("lang == 'en'", True),
    ("lang == 'EN'", True),  # aggressive normalization casefolds
    ("lang == 'de'", False),
    ("lang != 'de'", True),
    ("citations > 5", True),
    ("citations >= 12", True),
    ("5 < citations < 13", True),
    ("5 < citations < 10", False),
    ("pub_date > date(2019)", True),
    ("pub_date < date(2020, 6)", True),
    ("pub_date == date(2020, 5, 4)", True),
    ("pub_date.year == 2020", True),
    ("pub_date.year >= 2021", False),
    ("venue == 'journal of tests'", True),  # exact-span equality
    ("venue == 'journal of'", False),
    ("venue contains 'journal of'", True),
    ("venue contains 'of tests'", True),
    ("venue contains 'tests journal'", False),
    ("venue not contains 'nope'", True),
    ("authors{first == 'Ada' && last == 'L'}", True),
    ("authors{first == 'Ada' && last == 'K'}", False),
    ("authors{first == 'Bo'}", True),
    ("lang == 'en' && citations > 100 || source == 'src3'", True),
    ("!(lang == 'en')", False),
    ("missing == 'x'", False),
]


@pytest.mark.parametrize("query,expected", CASES)
def test_metadata_filter(query, expected):
    assert compile_filter(query)(MD) is expected


def test_metadata_filter_in_cascade():
    from odinson_ray.core.engine import DocumentEngine
    from odinson_ray.core.sentence import AnnotatedDocument, SentenceIndex
    from odinson_ray.lang.rules import RuleReader

    doc_en = AnnotatedDocument("d1", [SentenceIndex({"raw": ["hello"]})], {"lang": "en"})
    doc_de = AnnotatedDocument("d2", [SentenceIndex({"raw": ["hello"]})], {"lang": "de"})
    rules = """
metadataFilters: "lang == 'en'"
rules:
  - {name: hi, label: Hi, type: basic, pattern: "hello"}
"""
    extractors = RuleReader().compile_rule_string(rules)
    assert len(DocumentEngine(doc_en).extract_mentions(extractors)) == 1
    assert len(DocumentEngine(doc_de).extract_mentions(extractors)) == 0
