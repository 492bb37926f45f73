"""Re-check audit automation: which registered queries ride code changed
in a git range?

The rotation discipline (round-5 guard rule) is "re-check a query iff code
changed after its last driver row". Rounds 7-9 performed that audit by
hand (module -> symbol -> query mapping written into __spark_entry__.py).
This tool computes it at SYMBOL granularity:

1. `git diff -U0 RANGE` -> changed (new-file) line numbers per module;
2. ast over every imposm3_spark module -> top-level def/class spans
   (decorators included, so an oracle SQL string inside a @register(...)
   maps to its query function) + the bare names each function references;
3. changed lines map to changed defs (lines outside any def = module-level
   change, which flags every query DEFINED in that module — register-time
   constants feed oracle SQL);
4. fixpoint: a function is affected if it is changed or references an
   affected function BY BARE NAME anywhere in the package (deliberate
   over-approximation: bare-name aliasing across modules can only
   over-flag, never under-flag);
5. every registered query whose function is affected is printed with its
   newest driver-row round (CORRECTNESS_r*.json) — rows older than the
   change need slots; strike survivors only with a byte-identity argument
   documented in __spark_entry__.py, as the hand audits do.

Usage:
    python scripts/recheck_audit.py <git-range>     # e.g. fd631a7..HEAD
"""

from __future__ import annotations

import ast
import glob
import json
import os
import re
import subprocess
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "imposm3_spark")


def changed_lines(git_range: str) -> dict[str, set[int]]:
    """repo-relative .py path -> set of changed/added line numbers in the
    NEW file (deletions map to the hunk start line, which lands in the
    enclosing def — good enough for span attribution)."""
    out = subprocess.run(
        ["git", "diff", "-U0", git_range],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    lines: dict[str, set[int]] = defaultdict(set)
    path = None
    for ln in out.splitlines():
        if ln.startswith("+++ b/"):
            path = ln[6:]
        elif ln.startswith("@@") and path and path.endswith(".py"):
            m = re.match(r"@@ -\d+(?:,\d+)? \+(\d+)(?:,(\d+))? @@", ln)
            if m:
                start = int(m.group(1))
                n = int(m.group(2)) if m.group(2) is not None else 1
                lines[path].update(range(start, start + max(n, 1)))
    return dict(lines)


class _Refs(ast.NodeVisitor):
    def __init__(self) -> None:
        self.names: set[str] = set()

    def visit_Name(self, node: ast.Name) -> None:
        self.names.add(node.id)

    def visit_Attribute(self, node: ast.Attribute) -> None:
        self.names.add(node.attr)
        self.generic_visit(node)


def package_functions() -> tuple[dict, dict]:
    """Return (spans, refs):
    spans: module -> list of (qualname, start, end) for top-level defs
           (decorators included) and classes (methods collapsed into the
           class span — pipeline classes change as a unit);
    refs:  (module, qualname) -> set of bare names referenced inside."""
    spans: dict[str, list] = {}
    refs: dict[tuple, set] = {}
    for path in glob.glob(f"{PKG}/**/*.py", recursive=True):
        rel = os.path.relpath(path, REPO)
        mod = rel[: -len(".py")].replace("/", ".")
        tree = ast.parse(open(path, encoding="utf-8").read())
        mod_spans = []
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                start = min(
                    [node.lineno] + [d.lineno for d in node.decorator_list]
                )
                mod_spans.append((node.name, start, node.end_lineno))
                v = _Refs()
                v.visit(node)
                refs[(mod, node.name)] = v.names
        spans[mod] = mod_spans
    return spans, refs


def newest_driver_rows() -> dict[str, int]:
    newest: dict[str, int] = {}
    for f in sorted(glob.glob(f"{REPO}/CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r0?(\d+)", os.path.basename(f)).group(1))
        for q in json.load(open(f)):
            newest[q] = max(newest.get(q, 0), rnd)
    return newest


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__)
        return 2
    delta = changed_lines(sys.argv[1])
    spans, refs = package_functions()

    changed_defs: set[tuple] = set()
    module_level_changed: set[str] = set()
    for path, lns in delta.items():
        mod = path[: -len(".py")].replace("/", ".")
        if mod not in spans:
            continue
        covered: set[int] = set()
        for name, start, end in spans[mod]:
            hit = {x for x in lns if start <= x <= end}
            if hit:
                changed_defs.add((mod, name))
                covered |= hit
        if lns - covered:
            module_level_changed.add(mod)

    # fixpoint over bare-name references
    affected = set(changed_defs)
    changed_names = {name for _, name in affected}
    grew = True
    while grew:
        grew = False
        for key, names in refs.items():
            if key in affected:
                continue
            if names & changed_names:
                affected.add(key)
                changed_names.add(key[1])
                grew = True

    sys.path.insert(0, REPO)
    from imposm3_spark import benchqueries as bq

    newest = newest_driver_rows()
    flagged: dict[str, str] = {}
    for qname, fn in bq.QUERIES.items():
        mod, fname = fn.__module__, fn.__name__
        if (mod, fname) in affected:
            flagged[qname] = f"def {fname} affected"
        elif mod in module_level_changed:
            flagged[qname] = f"module-level change in {mod}"

    print(f"changed defs ({len(changed_defs)}):")
    for mod, name in sorted(changed_defs):
        print(f"  {mod}.{name}")
    if module_level_changed:
        print(f"module-level changes: {sorted(module_level_changed)}")
    print(f"\nflagged queries ({len(flagged)}), newest driver row first:")
    for qname in sorted(flagged, key=lambda q: (newest.get(q, 0), q)):
        rnd = newest.get(qname)
        tag = f"r{rnd:02d}" if rnd else "never"
        print(f"  {tag}  {qname}  ({flagged[qname]})")
    print(
        "\nNOTE: bare-name over-approximation — strike entries only with a "
        "byte-identity / dead-symbol argument documented in "
        "__spark_entry__.py."
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
