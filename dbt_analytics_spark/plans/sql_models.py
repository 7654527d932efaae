"""SQL-string models: dbt's primary authoring surface, run natively.

A reference user writes models as Jinja-SQL files — ``{{ config(...) }}``
header, ``{{ ref('x') }}`` / ``{{ source('s', 't') }}`` relation
references, ``{{ this }}`` and ``{% if is_incremental() %}`` for
incremental models (reference: any model under models/, e.g.
models/spend_monthly.sql:1-27; SP/dbt/context/providers.py:573-640
ref resolution; SP/.../incremental/is_incremental.sql). This module runs
that authoring surface on Spark without dbt's Jinja machinery:

- the ``config()`` header is parsed with ``ast`` (literal kwargs only —
  the same constraint dbt's static parser imposes for fast parsing),
- each ``ref()``/``source()`` renders to a per-node temp view REGISTERED
  FROM ``ctx.ref(...)`` at execution time, so DAG edges, version pins,
  group/access governance, and ephemeral upstreams all behave exactly as
  they do for Python models (an ephemeral ref is a temp view over an
  unmaterialized DataFrame — Catalyst inlines it, the engine-native
  analogue of dbt's CTE splicing),
- ``{% if is_incremental() %}…{% endif %}`` blocks are kept or dropped
  per run from ``ctx.is_incremental()``, and ``{{ this }}`` renders to
  the qualified target relation,
- the rendered text is ONE ``spark.sql`` statement — Catalyst compiles
  it into the same plans the DataFrame API produces, so every
  plan-quality property (pushdown, broadcast dims, AQE) applies
  unchanged.
"""

from __future__ import annotations

import ast
import hashlib
import re
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame

if TYPE_CHECKING:  # pragma: no cover
    from .registry import ModelContext, Project

_CONFIG_RE = re.compile(r"\{\{\s*config\s*\((.*?)\)\s*\}\}", re.S)
_REF_RE = re.compile(
    r"\{\{\s*ref\(\s*['\"]([^'\"]+)['\"]\s*(?:,\s*v\s*=\s*(\d+)\s*)?\)\s*\}\}"
)
_SOURCE_RE = re.compile(
    r"\{\{\s*source\(\s*['\"]([^'\"]+)['\"]\s*(?:,\s*['\"]([^'\"]+)['\"]\s*)?\)\s*\}\}"
)
_THIS_RE = re.compile(r"\{\{\s*this\s*\}\}")
_VAR_RE = re.compile(
    r"\{\{\s*var\(\s*['\"]([^'\"]+)['\"]\s*(?:,\s*(.+?)\s*)?\)\s*\}\}"
)
_IF_INC_RE = re.compile(
    r"\{%\s*if\s+is_incremental\(\)\s*%\}(.*?)\{%\s*endif\s*%\}", re.S
)


def parse_config(sql: str) -> tuple[dict[str, Any], str]:
    """Extract ``{{ config(...) }}`` kwargs (literals only) and return
    (config_dict, sql_without_header)."""
    m = _CONFIG_RE.search(sql)
    if not m:
        return {}, sql
    call = ast.parse(f"f({m.group(1)})", mode="eval").body
    if not isinstance(call, ast.Call) or call.args:
        raise ValueError("config() takes keyword arguments only")
    cfg: dict[str, Any] = {}
    for kw in call.keywords:
        if kw.arg is None:
            raise ValueError("config() does not accept **kwargs")
        cfg[kw.arg] = ast.literal_eval(kw.value)
    return cfg, sql[: m.start()] + sql[m.end() :]


def _view_name(node_name: str, ref_name: str) -> str:
    return f"__sqlref_{node_name}_{ref_name}".replace(".", "_")


_MACRO_RE = re.compile(r"\{\{\s*([A-Za-z_][A-Za-z0-9_]*)\(\s*(.*?)\s*\)\s*\}\}")
_BUILTIN_CALLS = frozenset({"config", "ref", "source", "var"})


def _expand_macros(ctx: "ModelContext", body: str) -> str:
    """Expand user-registered SQL macros (``Project.sql_macro``): a macro
    is a Python function returning a SQL fragment string; call-site args
    are literals (dbt's static-parse constraint). Macros expand BEFORE
    ref/source/var rendering, so a macro may emit ``{{ ref('x') }}`` —
    the dbt_utils idiom of macros that reference relations. Expansion
    repeats until fixpoint (macros emitting macros), bounded to keep a
    cyclic definition from looping forever."""
    macros = ctx._project.sql_macros
    if not macros:
        return body

    def sub(m: re.Match) -> str:
        name, raw_args = m.group(1), m.group(2)
        if name in _BUILTIN_CALLS or name not in macros:
            return m.group(0)
        args = (
            [ast.literal_eval(a) for a in ast.parse(f"f({raw_args})", mode="eval").body.args]
            if raw_args.strip()
            else []
        )
        return str(macros[name](*args))

    for _ in range(10):
        expanded = _MACRO_RE.sub(sub, body)
        if expanded == body:
            return expanded
        body = expanded
    raise ValueError("sql macro expansion did not converge (cyclic macros?)")


def render(ctx: "ModelContext", node_name: str, body: str) -> str:
    """Render a SQL model body against the runtime context. Every ref /
    source resolves through ``ctx.ref`` (recording the DAG edge) into a
    temp view; is_incremental blocks and ``this`` render from the node's
    actual state."""
    body = _expand_macros(ctx, body)
    inc = ctx.is_incremental()
    body = _IF_INC_RE.sub(lambda m: m.group(1) if inc else "", body)
    body = _THIS_RE.sub(ctx._project.qualified(ctx._node.name), body)

    def sub_var(m: re.Match) -> str:
        # var('name') / var('name', <literal default>) — the default is a
        # Python literal (dbt's static-parse constraint, same as config()).
        # No default written in the SQL → call var() with no default so an
        # unknown var still raises (a None default is a VALID default now
        # that ctx.var uses a missing-sentinel, dbt's var('x', none)).
        if m.group(2):
            return str(ctx.var(m.group(1), ast.literal_eval(m.group(2))))
        return str(ctx.var(m.group(1)))

    body = _VAR_RE.sub(sub_var, body)

    def sub_ref(m: re.Match) -> str:
        name, v = m.group(1), m.group(2)
        df = ctx.ref(name, v=int(v)) if v else ctx.ref(name)
        view = _view_name(node_name, name if not v else f"{name}_v{v}")
        df.createOrReplaceTempView(view)
        return view

    def sub_source(m: re.Match) -> str:
        # dbt's source('schema', 'table') identifies the relation by its
        # second argument; the 1-arg form maps directly to a registered
        # source node.
        name = m.group(2) or m.group(1)
        df = ctx.source(name)
        view = _view_name(node_name, name)
        df.createOrReplaceTempView(view)
        return view

    body = _REF_RE.sub(sub_ref, body)
    body = _SOURCE_RE.sub(sub_source, body)
    return body


def register_sql_model(
    project: "Project",
    sql: str,
    name: str,
    config_defaults: dict | None = None,
    **config_overrides,
) -> str:
    """Register a Jinja-SQL model string as a node. Returns the node name.

    Config precedence (dbt's hierarchy — SP/dbt/config/project.py model
    configs): ``config_defaults`` (the dbt_project.yml ``models:`` tree,
    e.g. the reference's ``+materialized: table`` at
    dbt_project.yml:14-16) < the file's ``{{ config(...) }}`` header <
    ``config_overrides`` (caller). The model function renders
    refs/sources/this/is_incremental at execution time and runs ONE
    ``spark.sql`` statement.
    """
    cfg, body = parse_config(sql)
    cfg = {**(config_defaults or {}), **cfg}
    cfg.update(config_overrides)
    body = body.strip().rstrip(";")
    if not body:
        raise ValueError(f"sql model {name!r}: empty body")
    tags = cfg.pop("tags", ())
    if isinstance(tags, str):
        tags = (tags,)

    def fn(ctx: "ModelContext") -> DataFrame:
        return ctx.spark.sql(render(ctx, name, body))

    fn.__name__ = name
    fn.__doc__ = cfg.pop("description", None)
    project.model(name=name, tags=tuple(tags), **cfg)(fn)
    # The registered checksum must track the SQL TEXT, not the (identical
    # for every SQL model) inner closure source — otherwise state:modified
    # can never see a SQL edit (dbt checksums the raw file:
    # SP/dbt/parser/read_files.py FileHash). Config changes are detected
    # separately via config_fingerprint, so the body alone is right here.
    project.nodes[name].checksum = hashlib.md5(body.encode()).hexdigest()
    project.nodes[name].raw_sql = body
    return name


def render_compiled(project: "Project", node) -> str:
    """Render a SQL-surface node's body for DISPLAY — the dbt
    ``target/compiled/*.sql`` artifact (reference: dbt compile writes the
    Jinja-rendered SQL per node; SP/dbt/task/compile.py). Unlike
    :func:`render`, refs and sources resolve to their QUALIFIED RELATION
    NAMES (what a user would paste into a SQL console), not per-node
    temp views; is_incremental blocks reflect the node's actual state."""

    class _Shim:
        _project = project

    body = _expand_macros(_Shim(), node.raw_sql)
    inc = (
        node.materialized == "incremental"
        and not project.full_refresh
        and project.relation_exists(node.name)
    )
    body = _IF_INC_RE.sub(lambda m: m.group(1) if inc else "", body)
    body = _THIS_RE.sub(project.qualified(node.name), body)

    def sub_var(m: re.Match) -> str:
        name = m.group(1)
        if name in project.vars:
            return str(project.vars[name])
        if m.group(2):
            return str(ast.literal_eval(m.group(2)))
        return m.group(0)  # unresolvable: leave visible in the artifact

    body = _VAR_RE.sub(sub_var, body)
    body = _REF_RE.sub(
        lambda m: project.qualified(
            project._resolve_version(m.group(1), int(m.group(2)) if m.group(2) else None)
        ),
        body,
    )
    body = _SOURCE_RE.sub(lambda m: m.group(2) or m.group(1), body)
    return body.strip() + "\n"


def register_sql_snapshot(
    project: "Project", sql: str, name: str, **config_overrides
) -> str:
    """Register a Jinja-SQL SNAPSHOT (dbt's ``snapshots/*.sql`` blocks —
    snapshot.sql:1-109): the config header carries ``unique_key`` +
    ``strategy`` (timestamp/check) with ``updated_at`` / ``check_cols`` /
    ``hard_deletes``; the body is the source SELECT, rendered like any
    SQL model. Each run applies one SCD-2 pass via plans/snapshot.py."""
    cfg, body = parse_config(sql)
    cfg.update(config_overrides)
    body = body.strip().rstrip(";")
    if not body:
        raise ValueError(f"sql snapshot {name!r}: empty body")
    tags = cfg.pop("tags", ())
    if isinstance(tags, str):
        tags = (tags,)
    cfg.pop("materialized", None)  # snapshots own their write path

    def fn(ctx: "ModelContext") -> DataFrame:
        return ctx.spark.sql(render(ctx, name, body))

    fn.__name__ = name
    project.snapshot_model(
        name=name,
        unique_key=cfg.pop("unique_key"),
        strategy=cfg.pop("strategy", "timestamp"),
        updated_at=cfg.pop("updated_at", None),
        check_cols=cfg.pop("check_cols", "all"),
        hard_deletes=cfg.pop("hard_deletes", "ignore"),
        tags=tuple(tags),
    )(fn)
    project.nodes[name].checksum = hashlib.md5(body.encode()).hexdigest()
    project.nodes[name].raw_sql = body
    return name


_MACRO_DEF_RE = re.compile(
    r"\{%-?\s*macro\s+([A-Za-z_][A-Za-z0-9_]*)\s*\(([^)]*)\)\s*-?%\}"
    r"(.*?)\{%-?\s*endmacro\s*-?%\}",
    re.S,
)


def load_macros_dir(project: "Project", path: str) -> list[str]:
    """Load dbt macro FILES (``macros/*.sql``, ``{% macro name(params)
    %} body {% endmacro %}`` blocks — reference: dbt macro-paths;
    SP/dbt/parser/macros.py) into ``Project.sql_macros``. Parameter
    references (``{{ param }}``) substitute the call-site value's string
    form (dbt Jinja semantics); everything ELSE in the body — ``ref()``,
    ``source()``, ``var()``, calls to other macros — is left intact for
    model-render time, so file macros compose exactly like
    programmatically registered ones (the dbt_utils idiom). Defaults use
    Python/Jinja literal syntax (``{% macro f(x, y=3) %}``); call sites
    bind positionally (model SQL) or by keyword (``run-operation``)."""
    import os

    names: list[str] = []
    for root, _dirs, files in sorted(os.walk(path)):
        for f in sorted(files):
            if not f.endswith(".sql"):
                continue
            with open(os.path.join(root, f)) as fh:
                text = fh.read()
            for m in _MACRO_DEF_RE.finditer(text):
                mname, params_src, body = (
                    m.group(1),
                    m.group(2),
                    m.group(3).strip(),
                )
                params: list[str] = []
                defaults: dict[str, object] = {}
                for p in params_src.split(","):
                    p = p.strip()
                    if not p:
                        continue
                    if "=" in p:
                        pname, dflt = p.split("=", 1)
                        pname = pname.strip()
                        raw = dflt.strip()
                        # Jinja's none/true/false spellings beside Python
                        # literals.
                        defaults[pname] = {
                            "none": None, "true": True, "false": False
                        }.get(raw, ...)
                        if defaults[pname] is ...:
                            defaults[pname] = ast.literal_eval(raw)
                    else:
                        pname = p
                    params.append(pname)

                def macro_fn(
                    *args,
                    _name=mname,
                    _params=tuple(params),
                    _defaults=dict(defaults),
                    _body=body,
                    **kwargs,
                ):
                    if len(args) > len(_params):
                        raise TypeError(
                            f"macro {_name}: takes {len(_params)} args, "
                            f"got {len(args)}"
                        )
                    bound = dict(_defaults)
                    bound.update(zip(_params, args))
                    for k, v in kwargs.items():
                        if k not in _params:
                            raise TypeError(
                                f"macro {_name}: unknown argument {k!r}"
                            )
                        bound[k] = v
                    missing = [p for p in _params if p not in bound]
                    if missing:
                        raise TypeError(
                            f"macro {_name}: missing arguments {missing}"
                        )
                    out = _body
                    for pname, val in bound.items():
                        # Callable replacement: the argument value is
                        # substituted LITERALLY. A plain-string repl would
                        # re-interpret backslashes (a regex-pattern arg
                        # like '\\d+' raises "bad escape"; '\\1' silently
                        # injects group refs into the rendered SQL).
                        out = re.sub(
                            r"\{\{\s*" + re.escape(pname) + r"\s*\}\}",
                            lambda _m, _v=str(val): _v,
                            out,
                        )
                    return out

                project.sql_macros[mname] = macro_fn
                names.append(mname)
    return names


def load_sql_snapshots_dir(project: "Project", path: str) -> list[str]:
    """Register every ``*.sql`` under ``path`` as a snapshot — the dbt
    ``snapshots/`` directory layout."""
    import os

    names: list[str] = []
    for root, _dirs, files in sorted(os.walk(path)):
        for f in sorted(files):
            if not f.endswith(".sql"):
                continue
            name = f[: -len(".sql")]
            fpath = os.path.join(root, f)
            with open(fpath) as fh:
                sql = fh.read()
            names.append(register_sql_snapshot(project, sql, name))
            project.nodes[name].path = fpath
    return names


def load_sql_models_dir(
    project: "Project",
    path: str,
    config_defaults_fn=None,
) -> list[str]:
    """Register every ``*.sql`` file under ``path`` (recursively) as a SQL
    model named after its filename — the dbt ``models/`` directory layout,
    so a reference user can point their existing model tree at the engine.
    Subdirectory names become tags (dbt's folder-scoped config selection:
    ``tag:staging`` ~ ``staging/**``). ``config_defaults_fn(folder_parts)
    -> dict`` supplies folder-scoped config defaults (the dbt_project.yml
    ``models:`` ``+key`` tree — the reference's own surface,
    dbt_project.yml:14-16 ``+materialized: table``); the file's config
    header wins over them. Returns registered node names in path order.
    """
    import os

    names: list[str] = []
    for root, _dirs, files in sorted(os.walk(path)):
        rel = os.path.relpath(root, path)
        folder_tags = () if rel == "." else tuple(rel.split(os.sep))
        for f in sorted(files):
            if not f.endswith(".sql"):
                continue
            name = f[: -len(".sql")]
            fpath = os.path.join(root, f)
            with open(fpath) as fh:
                sql = fh.read()
            cfg, _ = parse_config(sql)
            tags = cfg.get("tags", ())
            if isinstance(tags, str):
                tags = (tags,)
            defaults = (
                dict(config_defaults_fn(folder_tags))
                if config_defaults_fn
                else {}
            )
            default_tags = defaults.pop("tags", ())
            names.append(
                register_sql_model(
                    project,
                    sql,
                    name,
                    config_defaults=defaults,
                    tags=tuple(tags) + folder_tags + tuple(default_tags),
                )
            )
            # path: selection should match the MODEL FILE (dbt's
            # PathSelectorMethod), not plans/sql_models.py where the
            # wrapper closure happens to be defined.
            project.nodes[name].path = fpath
    return names
