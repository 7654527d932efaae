"""Node selection DSL: the useful core of dbt's --select grammar.

Reference: SP/dbt/graph/selector_methods.py:244-586 + spec parsing in
SP/dbt/graph/cli.py:27-166 and SP/dbt/graph/selector_spec.py. Supported
here: names, fnmatch wildcards, graph operators ``+name`` (ancestors),
``name+`` (descendants), depth-limited forms ``2+name`` / ``name+2``,
``+name+``, ``@name`` (descendants + their ancestors), space-separated
union, comma-separated intersection (``tag:a,+m``), ``--exclude``
semantics via a leading ``!``, and the method prefixes:

- ``tag:x`` — nodes carrying the tag
- ``path:GLOB`` — nodes whose registered source path matches the glob
  (a bare directory selects everything under it, dbt-style)
- ``config.KEY:VALUE`` — nodes whose config matches (materialized,
  incremental_strategy, unique_key, partition_by, kind)
- ``state:modified`` / ``state:new`` — vs a previous manifest loaded with
  ``Project.load_state`` (modified ⊇ new, matching dbt)
- ``result:STATUS`` — nodes whose last run status was STATUS, from the
  loaded run_results or the project's in-memory last run
- ``group:x`` / ``access:public|protected|private`` — governance metadata
  (reference selector_methods.py GroupSelectorMethod / AccessSelectorMethod)
- ``version:latest|old|prerelease|none`` — versioned-model state relative
  to the base's latest pin (VersionSelectorMethod semantics)
- ``file:GLOB`` — basename of the node's registered source path
- ``package:NAME`` — the owning project's name (single-package projects:
  matches everything when the name matches, dbt root-package style)
- ``semantic_model:NAME`` / ``saved_query:NAME`` — the MODEL nodes a
  matching semantic-layer object is defined over (saved queries resolve
  transitively through their metrics' measures), so
  ``--select semantic_model:x+`` rebuilds what the semantic object
  reads, dbt's practical use of these methods
- ``test_name:PAT`` / ``test_type:generic|singular|unit|data|schema`` —
  the models owning matching generic-test attachments or YAML unit
  tests (the engine attaches tests to models instead of registering
  test nodes; TestNameSelectorMethod / TestTypeSelectorMethod)
- ``source_status:fresher`` — sources whose current freshness
  max_loaded_at advanced past the previous state's (requires both
  sources.json artifacts via ``Project.load_state``;
  SourceStatusSelectorMethod)
"""

from __future__ import annotations

import fnmatch
import re
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from .registry import Project

_GRAPH_RE = re.compile(r"^(?P<at>@)?(?:(?P<ldepth>\d+)?(?P<lplus>\+))?(?P<body>.*?)(?:(?P<rplus>\+)(?P<rdepth>\d+)?)?$")


def _walk(project: "Project", start: str, depth: int | None, up: bool) -> set[str]:
    """BFS over the DAG (up = ancestors, down = descendants) to ``depth``
    levels (None = unbounded). BFS guarantees each node is reached at its
    minimum distance, so a depth budget is exact on diamond graphs."""
    acc: set[str] = set()
    frontier = {start}
    level = 0
    while frontier and (depth is None or level < depth):
        level += 1
        nxt: set[str] = set()
        for name in frontier:
            if up:
                nxt |= set(project.nodes[name].depends_on)
            else:
                nxt |= {
                    other
                    for other, node in project.nodes.items()
                    if name in node.depends_on
                }
        frontier = nxt - acc
        acc |= frontier
    return acc


def _ancestors(project: "Project", name: str, acc: set[str], depth: int | None) -> None:
    acc |= _walk(project, name, depth, up=True)


def _descendants(project: "Project", name: str, acc: set[str], depth: int | None) -> None:
    acc |= _walk(project, name, depth, up=False)


def _state_modified(project: "Project", new_only: bool) -> set[str]:
    """state:new — nodes absent from the previous manifest; state:modified —
    new nodes plus nodes whose checksum, config, or dependency edges
    changed (dbt's modified includes new, selector_methods.py
    StateSelectorMethod)."""
    if project.state_nodes is None:
        raise ValueError(
            "state: selector requires a previous manifest — call "
            "Project.load_state(manifest_path) first"
        )
    out: set[str] = set()
    for name, node in project.nodes.items():
        old = project.state_nodes.get(name)
        if old is None:
            out.add(name)
            continue
        if new_only:
            continue
        changed = (
            old.get("checksum") != node.checksum
            or old.get("config") != node.config_fingerprint()
            or old.get("depends_on") != sorted(node.depends_on)
        )
        if changed:
            out.add(name)
    return out


def _match_method(project: "Project", body: str) -> set[str]:
    """Resolve one selector body (no graph operators) to a node set."""
    if body.startswith("tag:"):
        return {n for n, node in project.nodes.items() if body[4:] in node.tags}
    if body.startswith("path:"):
        pat = body[5:]
        globby = pat if any(ch in pat for ch in "*?[") else f"*{pat}*"
        return {
            n
            for n, node in project.nodes.items()
            if node.path
            and (fnmatch.fnmatch(node.path, pat) or fnmatch.fnmatch(node.path, globby))
        }
    if body.startswith("config."):
        key, _, want = body[7:].partition(":")
        out: set[str] = set()
        for n, node in project.nodes.items():
            if key == "kind":
                have: object = node.kind
            else:
                have = getattr(node, key, None)
            if isinstance(have, (tuple, list)):
                if want in [str(v) for v in have]:
                    out.add(n)
            elif have is not None and str(have) == want:
                out.add(n)
        return out
    if body.startswith("group:"):
        return {
            n for n, node in project.nodes.items() if node.group == body[6:]
        }
    if body.startswith("access:"):
        return {
            n for n, node in project.nodes.items() if node.access == body[7:]
        }
    if body.startswith("version:"):
        mode = body[8:]
        if mode not in ("latest", "old", "prerelease", "none"):
            raise ValueError(f"unsupported version selector {mode!r}")
        if mode == "none":
            return {
                n
                for n, node in project.nodes.items()
                if node.version is None
            }
        out = set()
        for base, versions in project._versions.items():
            latest = project._latest_pin.get(base, max(versions))
            for v, node_name in versions.items():
                if (
                    (mode == "latest" and v == latest)
                    or (mode == "old" and v < latest)
                    or (mode == "prerelease" and v > latest)
                ):
                    out.add(node_name)
        return out
    if body.startswith("file:"):
        import os as _os

        pat = body[5:]
        return {
            n
            for n, node in project.nodes.items()
            if node.path and fnmatch.fnmatch(_os.path.basename(node.path), pat)
        }
    if body.startswith("semantic_model:"):
        pat = body[len("semantic_model:"):]
        sl = getattr(project, "semantic_layer", None)
        if sl is None:
            return set()
        return {
            sm.model
            for name, sm in sl.models.items()
            if fnmatch.fnmatch(name, pat) and sm.model in project.nodes
        }
    if body.startswith("saved_query:"):
        pat = body[len("saved_query:"):]
        sl = getattr(project, "semantic_layer", None)
        if sl is None:
            return set()

        def _measures(metric_name: str, seen: set[str]) -> set[str]:
            if metric_name in seen:
                return set()
            seen.add(metric_name)
            m = sl.metrics.get(metric_name)
            if m is None:
                return set()
            out = {
                x
                for x in (m.measure, m.base_measure, m.conversion_measure)
                if x
            }
            for ref in (m.numerator, m.denominator):
                if ref:
                    out |= _measures(ref, seen)
            for inp in m.inputs:
                out |= _measures(inp.name, seen)
            return out

        wanted: set[str] = set()
        for name, sq in sl.saved_queries.items():
            if not fnmatch.fnmatch(name, pat):
                continue
            measures: set[str] = set()
            for metric in sq.metrics:
                measures |= _measures(metric, set())
            for sm in sl.models.values():
                if measures & set(sm.measures) and sm.model in project.nodes:
                    wanted.add(sm.model)
        return wanted
    if body.startswith("package:"):
        # single-package engine: the project IS the package (dbt's root
        # package). A matching name selects every node, else nothing.
        if fnmatch.fnmatch(project.name, body[8:]):
            return set(project.nodes)
        return set()
    if body.startswith("test_name:"):
        # dbt yields the TEST nodes themselves (TestNameSelectorMethod);
        # the engine attaches tests to models rather than registering
        # them as nodes, so the selection resolves to the OWNING models —
        # build/--with-tests over that set runs exactly those tests.
        # YAML unit tests match on the unit test's own name, dbt-style.
        pat = body[len("test_name:"):]
        out = {
            model
            for model, tname, _fn, _cfg in project.tests
            if fnmatch.fnmatch(tname, pat) and model in project.nodes
        }
        for spec in getattr(project, "yaml_unit_tests", None) or []:
            if (
                fnmatch.fnmatch(spec["name"], pat)
                and spec["model"] in project.nodes
            ):
                out.add(spec["model"])
        return out
    if body.startswith("test_type:"):
        kind = body[len("test_type:"):]
        # 'schema' and 'data' are dbt's backwards-compat aliases
        # (TestTypeSelectorMethod). The engine has no singular test
        # files — generic attachments and YAML unit tests only — so
        # 'singular' is valid-but-empty and 'data' == 'generic'.
        if kind in ("generic", "schema", "data"):
            return {
                model
                for model, _t, _fn, _cfg in project.tests
                if model in project.nodes
            }
        if kind == "unit":
            return {
                spec["model"]
                for spec in getattr(project, "yaml_unit_tests", None) or []
                if spec["model"] in project.nodes
            }
        if kind == "singular":
            return set()
        raise ValueError(
            f"unsupported test_type selector {kind!r}: expected "
            "'generic', 'singular', 'unit', or 'data'"
        )
    if body.startswith("source_status:"):
        mode = body[len("source_status:"):]
        if mode != "fresher":
            raise ValueError(
                f"unsupported source_status selector {mode!r}: "
                "expected 'fresher'"
            )
        prev, cur = project.state_sources, project.sources_current
        if prev is None or cur is None:
            raise ValueError(
                "source_status: selector requires previous AND current "
                "freshness artifacts — call Project.load_state(..., "
                "sources_path=..., sources_current_path=...) first"
            )
        fresher: set[str] = set()
        for uid, loaded in cur.items():
            if loaded is None:
                continue  # runtime-error analogue: no max_loaded_at
            if uid not in prev:
                fresher.add(uid)
            elif prev[uid] is not None and loaded > prev[uid]:
                fresher.add(uid)
        return {n for n in fresher if n in project.nodes}
    if body.startswith("state:"):
        mode = body[6:]
        if mode not in ("modified", "new"):
            raise ValueError(f"unsupported state selector {mode!r}")
        return _state_modified(project, new_only=(mode == "new"))
    if body.startswith("result:"):
        want = body[7:]
        statuses = project.state_results
        if statuses is None:
            statuses = {r.node: r.status for r in project.results}
        return {
            n for n in project.nodes if statuses.get(n) == want
        }
    return {n for n in project.nodes if fnmatch.fnmatch(n, body)}


def _match_one(project: "Project", spec: str) -> set[str]:
    m = _GRAPH_RE.match(spec)
    assert m is not None
    at_op = bool(m.group("at"))
    plus_left = bool(m.group("lplus"))
    ldepth = int(m.group("ldepth")) if m.group("ldepth") else None
    plus_right = bool(m.group("rplus"))
    rdepth = int(m.group("rdepth")) if m.group("rdepth") else None
    body = m.group("body")

    base = _match_method(project, body)

    out = set(base)
    for n in base:
        if plus_left or at_op:
            _ancestors(project, n, out, ldepth)
        if plus_right or at_op:
            _descendants(project, n, out, rdepth)
    if at_op:
        # @model: descendants plus ALL ancestors of those descendants
        # (reference: selector_spec '@' semantics).
        desc = set(base)
        for n in base:
            _descendants(project, n, desc, None)
        for n in list(desc):
            _ancestors(project, n, out, None)
        out |= desc
    return out


def _match_intersection(project: "Project", token: str) -> set[str]:
    parts = [p for p in token.split(",") if p]
    out: set[str] | None = None
    for p in parts:
        s = _match_one(project, p)
        out = s if out is None else out & s
    return out or set()


def select_nodes(project: "Project", select: str | None) -> set[str]:
    if not select:
        return set(project.nodes)
    included: set[str] = set()
    excluded: set[str] = set()
    saw_include = False
    for token in select.split():
        if token.startswith("!"):
            excluded |= _match_intersection(project, token[1:])
        else:
            saw_include = True
            included |= _match_intersection(project, token)
    # Exclude-only spec filters the full graph; a non-matching include
    # selects NOTHING (dbt behavior: empty selection warns, runs nothing).
    if not saw_include:
        included = set(project.nodes)
    return included - excluded
