"""AST free-variable lint over __spark_entry__ (VERDICT r5 next #2).

Round 5 shipped three broken queries because a textual refactor left
``d_num``/``d_den`` as unbound free variables inside inlined PageRank
step bodies — statically detectable, but nothing checked. This test
walks every top-level function of the entry module and asserts every
Name load resolves to *something* bound within that function's subtree
(params of the function, any nested def/lambda, any assignment or
import anywhere inside), a module global, or a builtin. Deliberately
over-approximate — it cannot flag a name bound in a sibling branch —
but it catches the r5 class exactly: a name whose only binding lives in
a different top-level function.
"""

from __future__ import annotations

import ast
import builtins

ENTRY = "__spark_entry__.py"


def _stored_and_params(subtree: ast.AST) -> set[str]:
    """Every name bound anywhere inside ``subtree``: assignments (incl.
    walrus, for/with/except targets, comprehension vars), imports,
    nested def/class names, and the params of every def/lambda."""
    bound: set[str] = set()
    for node in ast.walk(subtree):
        if isinstance(node, ast.Name) and isinstance(node.ctx, (ast.Store, ast.Del)):
            bound.add(node.id)
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            bound.add(node.name)
        elif isinstance(node, (ast.Import, ast.ImportFrom)):
            for alias in node.names:
                bound.add((alias.asname or alias.name).split(".")[0])
        elif isinstance(node, ast.ExceptHandler) and node.name:
            bound.add(node.name)
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.Lambda)):
            a = node.args
            for arg in (
                list(a.posonlyargs) + list(a.args) + list(a.kwonlyargs)
                + ([a.vararg] if a.vararg else [])
                + ([a.kwarg] if a.kwarg else [])
            ):
                bound.add(arg.arg)
    return bound


def test_entry_has_no_unbound_free_variables():
    tree = ast.parse(open(ENTRY).read(), ENTRY)
    module_names = _stored_and_params(tree) | set(dir(builtins))
    # module-level _stored_and_params already includes every name bound
    # anywhere in the file, which would hide cross-function leaks — so
    # restrict the global set to names bound at module STATEMENT level.
    module_names = set()
    for stmt in tree.body:
        if isinstance(stmt, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            module_names.add(stmt.name)
        elif isinstance(stmt, (ast.Import, ast.ImportFrom)):
            for alias in stmt.names:
                module_names.add((alias.asname or alias.name).split(".")[0])
        else:
            for node in ast.walk(stmt):
                if isinstance(node, ast.Name) and isinstance(node.ctx, ast.Store):
                    module_names.add(node.id)
    module_names |= set(dir(builtins))

    failures = []
    for stmt in tree.body:
        if not isinstance(stmt, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        bound = _stored_and_params(stmt) | module_names
        for node in ast.walk(stmt):
            if (
                isinstance(node, ast.Name)
                and isinstance(node.ctx, ast.Load)
                and node.id not in bound
            ):
                failures.append(
                    f"{stmt.name}: '{node.id}' at line {node.lineno}"
                )
    assert not failures, (
        "unbound free variables in __spark_entry__ (the r5 d_den class "
        "of break):\n" + "\n".join(sorted(set(failures)))
    )
