"""Registry structural integrity: the decorator-insertion hazard
(round 7) made permanent — inserting a new @query block between an
existing decorator and its def silently re-binds the old decorator.
This test walks every query module with ast and pins: each @query
decorator sits directly on a function with EXACTLY one decorator, the
decorator's literal name is unique, and every name found in source is
actually registered (and vice versa)."""

from __future__ import annotations

import ast
from pathlib import Path

from reflex_spark.queries import all_oracle_sql, all_queries

QUERY_DIR = Path(__file__).resolve().parent.parent / "reflex_spark" / "queries"


def _source_query_names() -> dict[str, int]:
    names: dict[str, int] = {}
    for path in sorted(QUERY_DIR.glob("*.py")):
        tree = ast.parse(path.read_text())
        for node in ast.walk(tree):
            if not isinstance(node, ast.FunctionDef):
                continue
            q_decos = [
                d
                for d in node.decorator_list
                if isinstance(d, ast.Call)
                and isinstance(d.func, ast.Name)
                and d.func.id == "query"
            ]
            if not q_decos:
                continue
            assert len(node.decorator_list) == 1, (
                f"{path.name}:{node.lineno} {node.name} has "
                f"{len(node.decorator_list)} decorators — the insertion "
                "hazard: a @query block was likely inserted between "
                "another decorator and its def"
            )
            arg = q_decos[0].args[0]
            assert isinstance(arg, ast.Constant) and isinstance(arg.value, str), (
                f"{path.name}:{node.lineno} query name must be a string literal"
            )
            names[arg.value] = names.get(arg.value, 0) + 1
        # call-style registration: name = query("...", oracle=...)(fn)
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Call)
                and isinstance(node.func.func, ast.Name)
                and node.func.func.id == "query"
                and node.func.args
                and isinstance(node.func.args[0], ast.Constant)
            ):
                nm = node.func.args[0].value
                names[nm] = names.get(nm, 0) + 1
    return names


def test_every_source_decorator_registers_exactly_once():
    src = _source_query_names()
    dupes = {n: c for n, c in src.items() if c > 1}
    assert not dupes, f"duplicate @query names in source: {dupes}"
    registered = set(all_queries())
    assert set(src) == registered, (
        f"source/registry drift: only-in-source={set(src) - registered}, "
        f"only-registered={registered - set(src)}"
    )


def test_oracle_names_are_registered_queries():
    assert set(all_oracle_sql()) <= set(all_queries())
