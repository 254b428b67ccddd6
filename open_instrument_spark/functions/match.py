"""Variable/label matchers (SURVEY.md §2.2 F1-F6) as Catalyst predicates.

The reference matches a search pattern against a concrete variable in
``Variable::Matches`` (lib/variable.cc:106-130) and Go ``Match``
(variable/variable.go:119-160). Pattern syntax:

  /exact/name                         F1 exact string equality
  /prefix*                            F2 trailing-star prefix glob (only form)
  {label=value}                       F3 exact label equality
  {label=*}                           F4 label presence (non-empty value)
  {label=}                            F5 label absence (Go-only feature)
  {label=/regex/}                     F6 anchored regex (C++-only feature)

We support the UNION of C++ and Go features (declared in SURVEY.md §7.0).
Matchers compile to pure Column predicates so Catalyst can push the name
conditions into the Parquet scan (exact/prefix matches become
``PushedFilters: [EqualTo(name,..)] / [StringStartsWith(name,..)]``) —
the Spark equivalent of the reference's index/bloom-filter lookups
(store_manager/indexed_store_file.go:110-146).

A Python-side ``matches()`` twin exists for driver-side config matching
(retention policies) and for the golden-vector tests ported from
lib/variable_test.cc:43-63.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import Column
from pyspark.sql import functions as F

from open_instrument_spark.canonical import parse_label_body


class LabelOp(Enum):
    EQ = "eq"          # {k=v}
    PRESENT = "present"  # {k=*}
    ABSENT = "absent"    # {k=}
    REGEX = "regex"      # {k=/re/}


@dataclass(frozen=True)
class LabelSpec:
    op: LabelOp
    value: str = ""


@dataclass(frozen=True)
class VariableMatcher:
    name: str
    labels: dict[str, LabelSpec] = field(default_factory=dict)

    # ---- parsing (reference: lib/variable.cc:21-105, variable.go:21-110) ----

    @classmethod
    def from_string(cls, pattern: str) -> "VariableMatcher":
        pattern = pattern.strip()
        name, labels = pattern, {}
        if "{" in pattern:
            if not pattern.endswith("}"):
                raise ValueError(f"unterminated label block: {pattern!r}")
            brace = pattern.index("{")
            name = pattern[:brace]
            labels = cls._parse_labels(pattern[brace + 1 : -1])
        return cls(name=name, labels=labels)

    @staticmethod
    def _parse_labels(body: str) -> dict[str, LabelSpec]:
        """Label-block parse via THE shared grammar kernel
        (canonical.parse_label_body — the same scanner the /export
        parser uses, mirroring lib/variable.cc:21-105), then the
        matcher-grammar interpretation of the raw values: bare ``*`` →
        presence, empty → absence, ``/re/`` → regex, else equality
        (variable.go:136-150)."""
        labels: dict[str, LabelSpec] = {}
        for key, value in parse_label_body(body).items():
            if value == "*":
                labels[key] = LabelSpec(LabelOp.PRESENT)
            elif value == "":
                labels[key] = LabelSpec(LabelOp.ABSENT)
            elif len(value) >= 2 and value.startswith("/") and value.endswith("/"):
                labels[key] = LabelSpec(LabelOp.REGEX, value[1:-1])
            else:
                labels[key] = LabelSpec(LabelOp.EQ, value)
        return labels

    # ---- Spark predicate ----

    def name_predicate(self, name_col: Column | str = "name") -> Column:
        c = F.col(name_col) if isinstance(name_col, str) else name_col
        if self.name.endswith("*"):
            # F2: trailing-star prefix glob (lib/variable.cc:108-111; the
            # Go len-2 slice at variable.go:127 is an off-by-one we don't copy)
            return c.startswith(self.name[:-1])
        return c == F.lit(self.name)  # F1

    def label_predicate(self, labels_col: Column | str = "labels",
                        staged_cols: dict[str, str] | None = None) -> Column:
        """``staged_cols`` (r15): {label key → column name} of staged
        per-label scalar columns (``model.STAGED_LABEL_PREFIX``) carried
        by the frame being filtered. When a matched key is staged, the
        predicate references the plain attribute instead of the map
        lookup — pinned bit-identical by construction (the staged column
        IS ``labels[key]``), and crucially the pushed-down filter then
        compiles to a scan-level column test instead of re-inlining the
        whole map-construction expression (guide §1.2; measured on the
        label-presence selects at sf0.1)."""
        pred = F.lit(True)
        for key, spec in self.labels.items():
            if staged_cols and key in staged_cols:
                v = F.col(staged_cols[key])
            else:
                lc = F.col(labels_col) if isinstance(labels_col, str) else labels_col
                v = lc.getItem(key)
            if spec.op is LabelOp.EQ:  # F3, lib/variable.cc:125-127
                p = v == F.lit(spec.value)
            elif spec.op is LabelOp.PRESENT:  # F4, non-empty per variable.go:142-150
                p = v.isNotNull() & (v != "")
            elif spec.op is LabelOp.ABSENT:  # F5, variable.go:136-141
                p = v.isNull() | (v == "")
            else:  # F6 anchored regex (boost::regex_match), lib/variable.cc:120-124
                p = v.isNotNull() & v.rlike(f"^(?:{spec.value})$")
            pred = pred & p
        return pred

    def predicate(
        self, name_col: Column | str = "name", labels_col: Column | str = "labels",
        staged_cols: dict[str, str] | None = None,
    ) -> Column:
        return self.name_predicate(name_col) & self.label_predicate(
            labels_col, staged_cols)

    # ---- Python twin (driver-side policy matching & golden tests) ----

    def matches(self, name: str, labels: dict[str, str] | None = None) -> bool:
        labels = labels or {}
        if self.name.endswith("*"):
            if not name.startswith(self.name[:-1]):
                return False
        elif name != self.name:
            return False
        for key, spec in self.labels.items():
            v = labels.get(key)
            if spec.op is LabelOp.EQ:
                if v != spec.value:
                    return False
            elif spec.op is LabelOp.PRESENT:
                if not v:
                    return False
            elif spec.op is LabelOp.ABSENT:
                if v:
                    return False
            else:
                if v is None or not re.fullmatch(spec.value, v):
                    return False
        return True


def variable_predicate(
    pattern: str, name_col: Column | str = "name", labels_col: Column | str = "labels"
) -> Column:
    """One-shot: pattern string → Column predicate."""
    return VariableMatcher.from_string(pattern).predicate(name_col, labels_col)
