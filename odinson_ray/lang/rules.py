"""YAML rule reader: vars, imports, priorities, metadata filters.

Port of the reference's RuleReader + VariableSubstitutor semantics
(reference: RuleReader.scala:223-468, utils/VariableSubstitutor.scala):

- ``vars``: mapping (string | int | list joined with OR) or a string import
  path to a vars YAML file
- ``rules``: list of rule mappings, or ``{import: path, vars: {...},
  metadataFilters: ...}`` entries; imported files may import recursively;
  variables are overridden down the import tree; metadataFilters combine
  with AND down the tree
- every rule field may contain ``${var}`` substitutions (nested allowed)
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import yaml

from ..core.engine import Extractor, Priority
from ..core.matcher import Compiler

_VAR_RE = re.compile(r"\$\{([^${}]+)\}")


class UndefinedVariableError(Exception):
    pass


def substitute(text: str, variables: Dict[str, str]) -> str:
    """${var} substitution with substitution-in-variables enabled and
    error-on-undefined, like commons-text StringSubstitutor configured by
    the reference (VariableSubstitutor.scala:40-46)."""
    s = str(text)
    for _ in range(64):
        def repl(m):
            name = m.group(1)
            if name not in variables:
                raise UndefinedVariableError(f"undefined variable '{name}'")
            return str(variables[name])

        new = _VAR_RE.sub(repl, s)
        if new == s:
            return new
        s = new
    raise UndefinedVariableError("variable substitution did not converge")


@dataclass
class Rule:
    name: str
    label: Optional[str]
    ruletype: str
    priority: str
    pattern: str


@dataclass
class RuleFile:
    rules: List[Rule]
    variables: Dict[str, str]
    metadata_filter: Optional[str]  # metadata query string (AND-joined)


def _process_var(value) -> str:
    if isinstance(value, list):
        return "|".join(str(v).strip() for v in value)
    return str(value)


def _join_filters(*filters: Optional[str]) -> Optional[str]:
    present = [f for f in filters if f]
    if not present:
        return None
    if len(present) == 1:
        return present[0]
    return " && ".join(f"({f})" for f in present)


def _parse_filter(data) -> Optional[str]:
    if data is None:
        return None
    if isinstance(data, str):
        return data
    if isinstance(data, list):
        return _join_filters(*[_parse_filter(d) for d in data])
    raise ValueError(f"invalid metadataFilters: {data!r}")


class RuleReader:
    def __init__(self, compiler: Optional[Compiler] = None):
        self.compiler = compiler or Compiler()

    # ------------------------------------------------------------ public API

    def compile_rule_string(self, rules: str, variables: Optional[Dict[str, str]] = None,
                            metadata_filter: Optional[str] = None) -> List[Extractor]:
        rule_files = self._parse(yaml.safe_load(rules), base_dir=None,
                                 parent_vars=dict(variables or {}),
                                 metadata_filter=metadata_filter)
        return self._mk_extractors(rule_files, dict(variables or {}))

    def compile_rule_file(self, path: str, variables: Optional[Dict[str, str]] = None,
                          metadata_filter: Optional[str] = None) -> List[Extractor]:
        with open(path) as f:
            data = yaml.safe_load(f)
        rule_files = self._parse(data, base_dir=os.path.dirname(os.path.abspath(path)),
                                 parent_vars=dict(variables or {}),
                                 metadata_filter=metadata_filter)
        return self._mk_extractors(rule_files, dict(variables or {}))

    # ------------------------------------------------------------ parsing

    def _parse(self, data: dict, base_dir: Optional[str], parent_vars: Dict[str, str],
               metadata_filter: Optional[str]) -> List[RuleFile]:
        data = data or {}
        local_vars = self._mk_variables(data, base_dir, parent_vars)
        # parent vars override local ones (RuleReader.scala:234)
        variables = {**local_vars, **parent_vars}
        md_filter = _join_filters(_parse_filter(data.get("metadataFilters")), metadata_filter)
        out: List[RuleFile] = []
        for entry in data.get("rules") or []:
            if not isinstance(entry, dict):
                raise ValueError(f"invalid rule entry: {entry!r}")
            if "import" in entry:
                if base_dir is None:
                    raise ValueError("Imports are not supported for string-only rules")
                import_vars = self._mk_variables(entry, base_dir, variables)
                merged_vars = {**variables, **import_vars}
                import_filter = _join_filters(_parse_filter(entry.get("metadataFilters")), md_filter)
                rel = substitute(str(entry["import"]), merged_vars)
                path = os.path.join(base_dir, rel)
                with open(path) as f:
                    imported = yaml.safe_load(f)
                out.extend(self._parse(imported, os.path.dirname(os.path.abspath(path)),
                                       merged_vars, import_filter))
            else:
                out.append(RuleFile([self._mk_rule(entry)], variables, md_filter))
        return out

    def _mk_variables(self, data: dict, base_dir: Optional[str],
                      parent_vars: Dict[str, str]) -> Dict[str, str]:
        raw = data.get("vars")
        if raw is None:
            return {}
        if isinstance(raw, str):
            if base_dir is None:
                raise ValueError("Imports are not supported for string-only rules")
            rel = substitute(raw, parent_vars)
            with open(os.path.join(base_dir, rel)) as f:
                imported = yaml.safe_load(f) or {}
            return {str(k): _process_var(v) for k, v in imported.items()}
        if isinstance(raw, dict):
            return {str(k): _process_var(v) for k, v in raw.items()}
        raise ValueError(f"invalid variables data: {raw!r}")

    @staticmethod
    def _mk_rule(fields: dict) -> Rule:
        def required(name):
            if name not in fields:
                raise ValueError(f"'{name}' is required")
            return str(fields[name])

        return Rule(
            name=required("name"),
            label=str(fields["label"]) if "label" in fields else None,
            ruletype=required("type"),
            priority=str(fields.get("priority", "1")),
            pattern=required("pattern"),
        )

    # ------------------------------------------------------------ compiling

    def _mk_extractors(self, rule_files: List[RuleFile], variables: Dict[str, str]) -> List[Extractor]:
        out = []
        for rf in rule_files:
            merged = {**rf.variables, **variables}
            for rule in rf.rules:
                out.append(self._mk_extractor(rule, merged, rf.metadata_filter))
        return out

    def _mk_extractor(self, rule: Rule, variables: Dict[str, str],
                      metadata_filter: Optional[str]) -> Extractor:
        name = substitute(rule.name, variables)
        label = substitute(rule.label, variables) if rule.label is not None else None
        ruletype = substitute(rule.ruletype, variables)
        priority = Priority.parse(substitute(rule.priority, variables))
        pattern = substitute(rule.pattern, variables)
        if ruletype == "basic":
            query = self.compiler.compile(pattern)
        elif ruletype == "event":
            query = self.compiler.compile_event_query(pattern)
        else:
            raise ValueError(f"invalid rule type '{ruletype}'")
        # metadata filters are applied at the document level by the matcher
        # stage (vectorized predicate over metadata columns), not inside the
        # span query; the filter string rides on the extractor
        return Extractor(name, label, priority, query, metadata_filter)
