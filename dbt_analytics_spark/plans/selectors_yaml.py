"""Named YAML selectors: reusable selection definitions loaded from a
``selectors.yml`` file.

Reference surface: dbt's selector files (``SP/dbt/graph/cli.py:80-260``
``parse_from_selectors_definition`` + ``SP/dbt/graph/selector_spec.py``
``selection_criteria_from_dict``). A selector file is

.. code-block:: yaml

    selectors:
      - name: nightly
        default: true
        definition:
          union:
            - tag:spend
            - method: path
              value: models/marts
              children: true
            - exclude:
                - deprecated_model

Supported definition forms, mirroring the reference grammar:

- a plain string — parsed with the same grammar as the CLI ``--select``
  DSL (:mod:`.selection`), so graph operators / ``method:value`` /
  comma-intersections all work;
- a single-key dict ``{tag: nightly}`` → ``{"method": "tag", "value":
  "nightly"}`` (``cli.py:parse_dict_definition`` single-key arm);
- a full criteria dict with ``method``/``value`` plus the graph-operator
  keys ``childrens_parents`` (``@``), ``parents`` (+ prefix),
  ``parents_depth``, ``children`` (+ suffix), ``children_depth``, and an
  optional nested ``exclude`` (``selector_spec.py:110-133``);
- ``{"method": "selector", "value": <name>}`` — a reference to an
  earlier selector in the same file (``cli.py:parse_dict_definition``
  selector arm: later definitions see a copy of earlier results);
- ``{"union": [...]}`` / ``{"intersection": [...]}`` with at most one
  ``{"exclude": [...]}`` entry per level (``cli.py:parse_union_definition``
  / ``parse_intersection_definition``).

Evaluation composes the existing DSL primitives (each criteria is
compiled to a spec string and matched by :func:`.selection._match_one`),
so every selection method — ``tag:`` ``path:`` ``config.*`` ``state:``
``result:`` wildcards, depth-limited graph walks — is available inside
YAML selectors with identical semantics to the CLI strings.
"""

from __future__ import annotations

import os
from typing import TYPE_CHECKING, Any

if TYPE_CHECKING:
    from .registry import Project


class SelectorError(ValueError):
    """Malformed selector file or definition."""


def parse_selectors(source: str | dict) -> dict[str, dict[str, Any]]:
    """Parse a selectors.yml path, YAML text, or pre-parsed dict into
    ``{name: {"default": bool, "definition": <raw definition>}}``.

    Validation mirrors the reference: a top-level ``selectors`` list,
    one ``name`` per entry, at most one ``default: true``.
    """
    if isinstance(source, str):
        import yaml

        if os.path.exists(source):
            with open(source) as f:
                data = yaml.safe_load(f)
        else:
            data = yaml.safe_load(source)
    else:
        data = source
    if not isinstance(data, dict) or "selectors" not in data:
        raise SelectorError("selector file must have a top-level 'selectors' list")
    entries = data["selectors"]
    if not isinstance(entries, list):
        raise SelectorError("'selectors' must be a list")
    out: dict[str, dict[str, Any]] = {}
    n_default = 0
    for entry in entries:
        if not isinstance(entry, dict) or "name" not in entry or "definition" not in entry:
            raise SelectorError(f"each selector needs 'name' and 'definition': {entry!r}")
        name = entry["name"]
        if name in out:
            raise SelectorError(f"duplicate selector name: {name}")
        default = bool(entry.get("default", False))
        n_default += default
        out[name] = {"default": default, "definition": entry["definition"]}
    if n_default > 1:
        raise SelectorError("at most one selector may set 'default: true'")
    return out


def default_selector(selectors: dict[str, dict[str, Any]]) -> str | None:
    """Name of the ``default: true`` selector, if any (dbt applies it when
    no --select/--exclude flags are given)."""
    for name, sel in selectors.items():
        if sel["default"]:
            return name
    return None


# ---------------------------------------------------------------------------
# Evaluation
# ---------------------------------------------------------------------------


def _criteria_to_spec(dct: dict[str, Any]) -> str:
    """Compile a criteria dict to the equivalent CLI spec string — the
    inverse of ``selector_spec.py:RAW_SELECTOR_PATTERN``."""
    if "value" not in dct:
        raise SelectorError(f"criteria dict needs a 'value': {dct!r}")
    method = dct.get("method")
    value = str(dct["value"])
    body = value if method in (None, "fqn") else f"{method}:{value}"
    if dct.get("parents"):
        depth = dct.get("parents_depth")
        body = f"{depth if depth is not None else ''}+{body}"
    if dct.get("children"):
        depth = dct.get("children_depth")
        body = f"{body}+{depth if depth is not None else ''}"
    if dct.get("childrens_parents"):
        body = f"@{body}"
    return body


_CRITERIA_KEYS = {
    "method",
    "value",
    "childrens_parents",
    "parents",
    "parents_depth",
    "children",
    "children_depth",
    "exclude",
    # accepted-and-ignored reference keys (test-edge selection refinement
    # has no analog here: generic tests are config, not graph nodes)
    "indirect_selection",
}


def _eval_exclusions(
    project: "Project", defs: list, named: dict[str, set[str]]
) -> set[str]:
    out: set[str] = set()
    for d in defs:
        out |= _eval_definition(project, d, named)
    return out


def _eval_list(
    project: "Project",
    parts: list,
    named: dict[str, set[str]],
    intersect: bool,
) -> set[str]:
    """Shared body of union/intersection: combine include entries, then
    subtract the (single) exclude entry (``cli.py:104-137``)."""
    include: set[str] | None = None
    exclude: set[str] | None = None
    for part in parts:
        if isinstance(part, dict) and "exclude" in part and "method" not in part:
            if exclude is not None:
                raise SelectorError(
                    "only one 'exclude' is allowed per union/intersection level"
                )
            excl = part["exclude"]
            exclude = _eval_exclusions(
                project, excl if isinstance(excl, list) else [excl], named
            )
            continue
        s = _eval_definition(project, part, named)
        if include is None:
            include = s
        elif intersect:
            include &= s
        else:
            include |= s
    include = include if include is not None else set()
    return include - (exclude or set())


def _eval_definition(
    project: "Project", definition: Any, named: dict[str, set[str]]
) -> set[str]:
    from .selection import _match_intersection

    if isinstance(definition, str):
        out: set[str] = set()
        for token in definition.split():
            out |= _match_intersection(project, token)
        return out
    if not isinstance(definition, dict):
        raise SelectorError(f"expected str or dict definition, got {definition!r}")
    if "union" in definition:
        return _eval_list(project, definition["union"], named, intersect=False)
    if "intersection" in definition:
        return _eval_list(project, definition["intersection"], named, intersect=True)
    if definition.get("method") == "selector":
        ref = definition.get("value")
        if ref not in named:
            raise SelectorError(f"selector '{ref}' not defined earlier in the file")
        return set(named[ref])
    if "method" in definition or "value" in definition:
        unknown = set(definition) - _CRITERIA_KEYS
        if unknown:
            raise SelectorError(f"unknown criteria keys: {sorted(unknown)}")
        base = _match_intersection(project, _criteria_to_spec(definition))
        if "exclude" in definition:
            excl = definition["exclude"]
            base = base - _eval_exclusions(
                project, excl if isinstance(excl, list) else [excl], named
            )
        return base
    if len(definition) == 1:
        ((key, value),) = definition.items()
        return _eval_definition(project, {"method": key, "value": value}, named)
    raise SelectorError(
        f"expected 'union', 'intersection', 'method'+'value', or a single "
        f"method key, got {sorted(definition)}"
    )


def evaluate_selectors(
    project: "Project", selectors: dict[str, dict[str, Any]]
) -> dict[str, set[str]]:
    """Evaluate every selector in file order; earlier results are visible
    to later ``method: selector`` references (reference passes a deepcopy
    of the accumulated result dict — set() copies give the same isolation)."""
    named: dict[str, set[str]] = {}
    for name, sel in selectors.items():
        named[name] = _eval_definition(project, sel["definition"], named)
    return named


def select_by_name(
    project: "Project", selectors: dict[str, dict[str, Any]], name: str
) -> set[str]:
    """Resolve one selector. Evaluates in file order but stops once the
    requested name is computed, and tolerates errors in *other* selectors:
    a broken definition only raises if the requested selector is (or
    transitively references) the broken one — matching dbt, which resolves
    the requested selector plus its back-references, not the whole file."""
    if name not in selectors:
        raise SelectorError(
            f"selector '{name}' not found; defined: {sorted(selectors)}"
        )
    named: dict[str, set[str]] = {}
    for sel_name, sel in selectors.items():
        try:
            named[sel_name] = _eval_definition(project, sel["definition"], named)
        except SelectorError:
            if sel_name == name:
                raise
            # A later `method: selector` reference to this name will raise
            # "not defined earlier" — which is accurate: it failed.
        if sel_name == name:
            return named[name]
    raise AssertionError("unreachable: name checked against selectors above")
