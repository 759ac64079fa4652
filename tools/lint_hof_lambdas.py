"""Lint: no tokenizer expressions inside higher-order-function lambdas.

The r11 engine-wide find (SCALE.md "HOF-lambda CSE"): Catalyst performs
NO common-subexpression elimination inside the lambda of
``F.transform`` / ``F.aggregate`` / ``F.filter`` / ``F.zip_with`` /
``F.exists`` / ``F.forall``.  An expression like ``F.split(text)``
referenced in the lambda body — directly or through a closure variable
— is re-evaluated for EVERY array element, turning each shingle / gram
/ chunk pass O(tokens²) per document (measured 34× on 5000-token docs).
The fix is always the same: materialize the expensive expression in its
own projection (``.select(expr.alias("__toks"))``) and reference the
COLUMN (``F.col("__toks")``) from the lambda.

This module statically enforces the rule over the engine source so the
class can't regress silently (VERDICT r11 #6).  Two patterns are
flagged inside any HOF lambda body:

1. a direct call to an expensive per-row function (``F.split``,
   ``F.regexp_extract_all``, ``F.sentences``) — re-evaluated per
   element by construction;
2. a reference to a closure variable whose assignment (in the same
   enclosing function) contains such a call — the same re-evaluation,
   laundered through a name.  ``F.col(...)``-rooted assignments are
   fine: a column reference is an attribute lookup, not a recompute.

Scope is deliberately narrow (tokenizers, the measured hazard) so the
lint stays zero-false-positive on legitimate lambda math.
"""

from __future__ import annotations

import ast
import glob
import os

# pyspark higher-order functions whose lambda bodies Catalyst
# re-evaluates per element
HOF_NAMES = {
    "transform",
    "aggregate",
    "filter",
    "zip_with",
    "exists",
    "forall",
    "map_filter",
    "map_zip_with",
    "transform_keys",
    "transform_values",
    "reduce",
}

# expensive per-row producers that must never re-run per element
BAD_CALLS = {"split", "regexp_extract_all", "sentences", "str_to_map"}


def _call_name(node: ast.Call) -> str | None:
    f = node.func
    if isinstance(f, ast.Attribute):
        return f.attr
    if isinstance(f, ast.Name):
        return f.id
    return None


def _contains_bad_call(node: ast.AST) -> bool:
    for sub in ast.walk(node):
        if isinstance(sub, ast.Call) and _call_name(sub) in BAD_CALLS:
            return True
    return False


def violations(source: str, filename: str = "<src>") -> list[str]:
    """Human-readable violation strings, empty when clean."""
    tree = ast.parse(source, filename=filename)
    out: list[str] = []

    class FuncVisitor(ast.NodeVisitor):
        """Per enclosing function: track tainted assignments, then
        inspect every HOF lambda in that scope."""

        def _scan_scope(self, fn: ast.AST) -> None:
            tainted: dict[str, int] = {}
            for sub in ast.walk(fn):
                if isinstance(sub, ast.Assign) and _contains_bad_call(sub.value):
                    for tgt in sub.targets:
                        if isinstance(tgt, ast.Name):
                            tainted[tgt.id] = sub.lineno
            for sub in ast.walk(fn):
                if not (isinstance(sub, ast.Call) and _call_name(sub) in HOF_NAMES):
                    continue
                for arg in list(sub.args) + [k.value for k in sub.keywords]:
                    if not isinstance(arg, ast.Lambda):
                        continue
                    params = {a.arg for a in arg.args.args}
                    for n in ast.walk(arg.body):
                        if isinstance(n, ast.Call) and _call_name(n) in BAD_CALLS:
                            # splitting the lambda's OWN element (e.g.
                            # per-word char split) is O(element) per
                            # element — the hazard is only re-splitting
                            # something independent of the element
                            arg_names = {
                                s.id
                                for a2 in n.args
                                for s in ast.walk(a2)
                                if isinstance(s, ast.Name)
                            }
                            if arg_names & params:
                                continue
                            out.append(
                                f"{filename}:{n.lineno}: {_call_name(n)}() called "
                                f"inside {_call_name(sub)}() lambda — re-evaluated "
                                "per array element (no CSE in HOF lambdas); "
                                "materialize it in its own projection first"
                            )
                        elif (
                            isinstance(n, ast.Name)
                            and n.id in tainted
                            and n.id not in params
                        ):
                            out.append(
                                f"{filename}:{n.lineno}: closure variable "
                                f"'{n.id}' (assigned from a tokenizer at line "
                                f"{tainted[n.id]}) referenced inside "
                                f"{_call_name(sub)}() lambda — same per-element "
                                "re-evaluation, laundered through a name"
                            )

        def visit_FunctionDef(self, node: ast.FunctionDef) -> None:
            self._scan_scope(node)
            # nested defs get their own scope scan via generic_visit

        visit_AsyncFunctionDef = visit_FunctionDef

        def visit_Module(self, node: ast.Module) -> None:
            self.generic_visit(node)

    v = FuncVisitor()
    v.visit(tree)
    for node in tree.body:  # module-level HOFs (rare but possible)
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            continue
    return out


def lint_tree(root: str) -> list[str]:
    out: list[str] = []
    for path in sorted(glob.glob(os.path.join(root, "**", "*.py"), recursive=True)):
        with open(path) as f:
            out += violations(f.read(), os.path.relpath(path, root))
    return out


if __name__ == "__main__":
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    probs = lint_tree(os.path.join(repo, "cdc_demo_spark"))
    print("\n".join(probs) if probs else "clean")
    sys.exit(1 if probs else 0)
