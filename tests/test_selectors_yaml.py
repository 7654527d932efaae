"""Named YAML selectors (selectors.yml) — reference surface
SP/dbt/graph/cli.py:80-260 parse_from_selectors_definition.

Reuses the engine fixture graph from test_engine:
  orders_raw ─ orders_clean(ephemeral) ─ cust_spend[spend] ─
  big_spenders ─ spend_with_names[spend] (+ customer_raw)
"""

from __future__ import annotations

import pytest

from dbt_analytics_spark.plans.selectors_yaml import (
    SelectorError,
    parse_selectors,
)

from .test_engine import project  # noqa: F401 (fixture)

YAML = """
selectors:
  - name: spendy
    definition: tag:spend
  - name: spendy_no_names
    definition:
      union:
        - tag:spend
        - exclude:
            - spend_with_names
  - name: upstream_of_big
    definition:
      method: fqn
      value: big_spenders
      parents: true
      parents_depth: 1
  - name: shorthand
    definition:
      tag: spend
  - name: combo
    default: true
    definition:
      intersection:
        - method: selector
          value: spendy
        - cust_spend+
"""


def test_parse_and_evaluate(project):  # noqa: F811
    project.compile()
    project.load_selectors(YAML)

    assert project.select_by_selector("spendy") == {
        "cust_spend",
        "spend_with_names",
    }
    # union with nested exclude
    assert project.select_by_selector("spendy_no_names") == {"cust_spend"}
    # criteria dict with graph-operator keys: 1-depth parents of big_spenders
    assert project.select_by_selector("upstream_of_big") == {
        "big_spenders",
        "cust_spend",
    }
    # single-key shorthand {tag: spend}
    assert project.select_by_selector("shorthand") == {
        "cust_spend",
        "spend_with_names",
    }
    # intersection + method:selector back-reference:
    # tag:spend ∩ descendants-of-cust_spend
    assert project.select_by_selector("combo") == {
        "cust_spend",
        "spend_with_names",
    }


def test_default_selector_applies_to_run(project):  # noqa: F811
    project.load_selectors(YAML)
    results = project.run()  # no select/selector → 'combo' (default: true)
    assert {r.node for r in results} == {"cust_spend", "spend_with_names"}
    # An explicit select string overrides the default selector.
    results = project.run(select="big_spenders")
    assert {r.node for r in results} == {"big_spenders"}
    # And the named selector path matches the string DSL equivalent.
    results = project.run(selector="spendy_no_names")
    assert {r.node for r in results} == {"cust_spend"}


def test_run_rejects_select_plus_selector(project):  # noqa: F811
    project.load_selectors(YAML)
    with pytest.raises(ValueError, match="not both"):
        project.run(select="cust_spend", selector="spendy")


def test_validation_errors():
    with pytest.raises(SelectorError, match="top-level 'selectors'"):
        parse_selectors({"wrong": []})
    with pytest.raises(SelectorError, match="duplicate"):
        parse_selectors(
            {"selectors": [
                {"name": "a", "definition": "x"},
                {"name": "a", "definition": "y"},
            ]}
        )
    with pytest.raises(SelectorError, match="at most one"):
        parse_selectors(
            {"selectors": [
                {"name": "a", "default": True, "definition": "x"},
                {"name": "b", "default": True, "definition": "y"},
            ]}
        )


def test_bad_definitions(project):  # noqa: F811
    project.compile()
    project.load_selectors(
        {"selectors": [{"name": "fwd", "definition": {"method": "selector", "value": "later"}}]}
    )
    with pytest.raises(SelectorError, match="not defined earlier"):
        project.select_by_selector("fwd")

    project.load_selectors(
        {"selectors": [{"name": "bad", "definition": {"method": "tag"}}]}
    )
    with pytest.raises(SelectorError, match="'value'"):
        project.select_by_selector("bad")

    with pytest.raises(SelectorError, match="not found"):
        project.load_selectors({"selectors": [{"name": "x", "definition": "y"}]})
        project.select_by_selector("nope")


def test_broken_selector_does_not_poison_others(project):  # noqa: F811
    """dbt resolves the requested selector plus its back-references only:
    a malformed definition elsewhere in the file must not break selection
    of unrelated selectors (it raises only when requested or referenced)."""
    project.compile()
    project.load_selectors(
        {"selectors": [
            # Malformed: criteria dict without a 'value'.
            {"name": "broken", "definition": {"method": "tag"}},
            {"name": "fine", "definition": "tag:spend"},
            {"name": "refs_broken", "definition": {"method": "selector", "value": "broken"}},
        ]}
    )
    # Unrelated selector works despite the earlier broken one.
    assert project.select_by_selector("fine") == {"cust_spend", "spend_with_names"}
    # Requesting the broken one raises its own error.
    with pytest.raises(SelectorError, match="'value'"):
        project.select_by_selector("broken")
    # Referencing the broken one also raises (it never evaluated).
    with pytest.raises(SelectorError, match="not defined earlier"):
        project.select_by_selector("refs_broken")
