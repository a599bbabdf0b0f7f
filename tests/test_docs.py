"""Offline docs-site integrity checks.

mkdocs is not installable in this environment, so CI's ``mkdocs build
--strict`` job is backed up by these no-network invariants: every nav
entry in mkdocs.yml points at a real file under docs/, and every docs
page is reachable from the nav (a --strict build would warn on both).
Reference parity target: /root/reference/mkdocs.yml:1.
"""

from pathlib import Path

import yaml

ROOT = Path(__file__).resolve().parents[1]


def _nav_paths(node):
    if isinstance(node, str):
        yield node
    elif isinstance(node, list):
        for item in node:
            yield from _nav_paths(item)
    elif isinstance(node, dict):
        for value in node.values():
            yield from _nav_paths(value)


def test_nav_targets_exist():
    cfg = yaml.safe_load((ROOT / "mkdocs.yml").read_text())
    targets = list(_nav_paths(cfg["nav"]))
    assert targets, "empty nav"
    missing = [t for t in targets if not (ROOT / "docs" / t).is_file()]
    assert not missing, f"nav entries without files: {missing}"


def test_all_docs_pages_reachable():
    cfg = yaml.safe_load((ROOT / "mkdocs.yml").read_text())
    targets = {str(Path(t)) for t in _nav_paths(cfg["nav"])}
    pages = {
        str(p.relative_to(ROOT / "docs"))
        for p in (ROOT / "docs").rglob("*.md")
    }
    orphans = pages - targets
    assert not orphans, f"docs pages missing from mkdocs nav: {orphans}"
