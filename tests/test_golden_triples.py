"""North-rule gate: triple extraction P/R >= 0.95 vs the golden triple set
derived from the reference's fixture corpus (ExampleDocs annotations +
reference extraction semantics, verified against the reference test suites).
The golden set is hard-coded: any regression in the traversal/event/
packaging/cascade layers breaks precision or recall here.
"""

from odinson_ray.core.engine import DocumentEngine
from odinson_ray.core.sentence import AnnotatedDocument, SentenceIndex
from odinson_ray.lang.rules import RuleReader
from odinson_ray.sources.example_docs import DOCS
from odinson_ray.stages.link import canon_key

RULES = """
rules:
  - name: svo
    label: SVO
    type: event
    pattern: |
      trigger = [tag=/V.*/]
      subject = >nsubj []
      object = >/dobj|nsubjpass/ []
"""

GOLDEN = {
    ("becky-gummy-bears", "Becky", "ate", "bears"),
    ("becky-gummy-bears-v2", "Becky", "ate", "bears"),
    ("chopsticks-spoon", "John", "ate", "ramen"),
    ("chopsticks-spoon", "Daisy", "ate", "macaroni"),
    ("chopsticks-spoon", "pets", "include", "cats"),
    ("hedgehogs-coypy", "animals", "contract", "it"),
    ("hedgehogs-coypy-2", "animals", "contract", "it"),
    ("ninja-turtles", "Donatello", "does", "machines"),
    ("bad-character", "CBL1", "phosphorylate", "AKT1"),
    ("bad-character", "CBL9", "phosphorylate", "AKT1"),
    ("bad-character", "complex", "phosphorylate", "AKT1"),
    ("bad-character", "dephosphorylation", "regulate", "deactivation"),
    ("tp-briggs", "mind", "revealing", "itself"),
    ("tp-briggs", "I", "known", "place"),
    ("tp-briggs", "one", "added", "number"),
    ("tp-briggs", "one", "detect", "difference"),
    ("tp-briggs", "We", "embraced", "embrace"),
    ("tp-briggs", "I", "had", "opportunity"),
    ("tp-briggs", "I", "wish", "nothing"),
}


def extracted_triples():
    extractors = RuleReader().compile_rule_string(RULES)
    out = set()
    for key, d in DOCS.items():
        doc = AnnotatedDocument(
            key, [SentenceIndex(s["fields"], s["edges"], s["roots"]) for s in d["sentences"]]
        )
        for m in DocumentEngine(doc).extract_mentions(extractors):
            if m.label != "SVO":
                continue
            toks = doc.sentences[m.sent_idx].tokens()
            args = m.arguments()
            for sa in args.get("subject", []):
                for oa in args.get("object", []):
                    out.add(
                        (
                            key,
                            " ".join(toks[sa.start : sa.end]),
                            " ".join(toks[m.start : m.end]),
                            " ".join(toks[oa.start : oa.end]),
                        )
                    )
    return out


def test_triple_precision_recall():
    got = extracted_triples()
    tp = len(got & GOLDEN)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(GOLDEN)
    assert precision >= 0.95, f"precision {precision} ({sorted(got - GOLDEN)})"
    assert recall >= 0.95, f"recall {recall} ({sorted(GOLDEN - got)})"


def test_canonical_triples_distinct():
    """Canonicalization merges the two becky variants into one canonical
    triple (normalized surface forms)."""
    canon = {
        (canon_key(s), p, canon_key(o)) for _, s, p, o in extracted_triples()
    }
    assert ("becky", "ate", "bear") in canon
    # both becky docs collapse onto the same canonical triple
    assert sum(1 for t in canon if t == ("becky", "ate", "bear")) == 1
