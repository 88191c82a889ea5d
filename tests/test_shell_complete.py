"""Shell autocomplete parity (reference Shell.scala:59-68: dependency
vocabulary as >label/<label options plus the command list)."""

from __future__ import annotations


def test_dep_completions_shape():
    from odinson_ray.shell import COMMANDS, dep_completions

    opts = dep_completions(["nsubj", "dobj", "nsubj"])
    assert ">nsubj" in opts and "<nsubj" in opts
    assert ">dobj" in opts and "<dobj" in opts
    # dedup + both directions + commands, nothing else
    assert len(opts) == 4 + len(COMMANDS)
    for c in COMMANDS:
        assert c in opts


def test_fixture_labels_from_graph():
    from odinson_ray.api import OdinsonEngine
    from odinson_ray.shell import fixture_dep_labels

    engine = OdinsonEngine.from_fixture("becky-gummy-bears")
    labels = fixture_dep_labels(engine)
    assert "nsubj" in labels and "dobj" in labels


def test_completer_prefix_matching():
    """The SHIPPED completer closure proposes exactly the prefix
    matches, in option order, then None."""
    from odinson_ray.shell import dep_completions, make_completer

    complete = make_completer(dep_completions(["nsubj", "nmod", "dobj"]))

    assert complete(">n", 0) == ">nmod"
    assert complete(">n", 1) == ">nsubj"
    assert complete(">n", 2) is None
    assert complete(":l", 0) == ":limit"
