"""Rule-file imports, variable overrides and priorities
(mirrors events/TestRuleFile and the testGrammar fixture chain)."""

import os

from odinson_ray.core.engine import DocumentEngine
from odinson_ray.core.sentence import AnnotatedDocument, SentenceIndex
from odinson_ray.lang.rules import RuleReader, UndefinedVariableError, substitute


def mk_doc():
    return AnnotatedDocument(
        "d", [SentenceIndex({"raw": ["Becky", "ate", "gummy", "bears"]})]
    )


def test_variable_substitution_nested():
    variables = {"a": "x${b}", "b": "y"}
    assert substitute("${a}", variables) == "xy"


def test_variable_list_joined_with_or():
    rules = """
vars:
  foods: [bears, chips]
rules:
  - {name: r, label: Food, type: basic, pattern: "${foods}"}
"""
    extractors = RuleReader().compile_rule_string(rules)
    mentions = DocumentEngine(mk_doc()).extract_mentions(extractors)
    assert [(m.start, m.end) for m in mentions] == [(3, 4)]


def test_rule_imports_with_var_override(tmp_path):
    imported = tmp_path / "imported.yml"
    imported.write_text(
        """
vars:
  target: chips
rules:
  - {name: imp, label: Imp, type: basic, pattern: "${target}"}
"""
    )
    varfile = tmp_path / "vars.yml"
    varfile.write_text("extra: Becky\n")
    master = tmp_path / "master.yml"
    master.write_text(
        """
vars: vars.yml
rules:
  - import: imported.yml
    vars:
      target: bears
  - {name: loc, label: Who, type: basic, pattern: "${extra}"}
"""
    )
    extractors = RuleReader().compile_rule_file(str(master))
    assert [e.name for e in extractors] == ["imp", "loc"]
    mentions = DocumentEngine(mk_doc()).extract_mentions(extractors)
    by_label = {m.label: (m.start, m.end) for m in mentions}
    # the import-level var override wins over the imported file's default
    assert by_label == {"Imp": (3, 4), "Who": (0, 1)}


def test_undefined_variable_raises():
    try:
        RuleReader().compile_rule_string(
            "rules:\n  - {name: r, type: basic, pattern: '${nope}'}"
        )
        assert False, "should have raised"
    except UndefinedVariableError:
        pass


def test_priorities_drive_epochs():
    rules = """
rules:
  - {name: first, label: A, type: basic, priority: "1", pattern: "Becky"}
  - {name: second, label: B, type: basic, priority: "2", pattern: "@A"}
"""
    extractors = RuleReader().compile_rule_string(rules)
    mentions = DocumentEngine(mk_doc()).extract_mentions(extractors)
    labels = sorted(m.label for m in mentions)
    assert labels == ["A", "B"]


def test_imports_forbidden_in_string_rules():
    try:
        RuleReader().compile_rule_string("rules:\n  - import: something.yml\n")
        assert False, "should have raised"
    except ValueError as e:
        assert "string-only" in str(e)
