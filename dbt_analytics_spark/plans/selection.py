"""Node selection DSL: the useful core of dbt's --select grammar.

Reference: SP/dbt/graph/selector_methods.py:244-586 + spec parsing in
SP/dbt/graph/cli.py:27-166. Supported here: names, ``tag:x``, fnmatch
wildcards, graph operators ``+name`` (ancestors), ``name+`` (descendants),
``+name+``, ``@name`` (descendants + their ancestors), space-separated
union, and ``--exclude`` semantics via a leading ``!``.
"""

from __future__ import annotations

import fnmatch
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from .registry import Project


def _ancestors(project: "Project", name: str, acc: set[str]) -> None:
    for dep in project.nodes[name].depends_on:
        if dep not in acc:
            acc.add(dep)
            _ancestors(project, dep, acc)


def _descendants(project: "Project", name: str, acc: set[str]) -> None:
    for other, node in project.nodes.items():
        if name in node.depends_on and other not in acc:
            acc.add(other)
            _descendants(project, other, acc)


def _match_one(project: "Project", spec: str) -> set[str]:
    plus_left = spec.startswith("+")
    at_op = spec.startswith("@")
    spec = spec.lstrip("+@")
    plus_right = spec.endswith("+")
    spec = spec.rstrip("+")

    if spec.startswith("tag:"):
        base = {n for n, node in project.nodes.items() if spec[4:] in node.tags}
    else:
        base = {n for n in project.nodes if fnmatch.fnmatch(n, spec)}

    out = set(base)
    for n in base:
        if plus_left or at_op:
            _ancestors(project, n, out)
        if plus_right or at_op:
            _descendants(project, n, out)
    if at_op:
        # @model: descendants plus ALL ancestors of those descendants
        # (reference: selector_spec '@' semantics).
        desc = set(base)
        for n in base:
            _descendants(project, n, desc)
        for n in list(desc):
            _ancestors(project, n, out)
        out |= desc
    return out


def select_nodes(project: "Project", select: str | None) -> set[str]:
    if not select:
        return set(project.nodes)
    included: set[str] = set()
    excluded: set[str] = set()
    saw_include = False
    for token in select.split():
        if token.startswith("!"):
            excluded |= _match_one(project, token[1:])
        else:
            saw_include = True
            included |= _match_one(project, token)
    # Exclude-only spec filters the full graph; a non-matching include
    # selects NOTHING (dbt behavior: empty selection warns, runs nothing).
    if not saw_include:
        included = set(project.nodes)
    return included - excluded
