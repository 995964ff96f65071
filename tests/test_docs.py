"""The API docs stay buildable and complete.

The sphinx tree (``docs/source``) needs sphinx, which is not bundled in
the TPU image; ``scripts/build_api_docs.py`` renders the same surface
with the stdlib only, so this test keeps both the module list and the
docstring coverage honest (reference analog: the sphinx docs build in
/root/reference/docs/source).
"""

import pathlib
import re
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]


def test_api_docs_generate_fully_documented(tmp_path):
    out = tmp_path / "api"
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "build_api_docs.py"),
         "--out", str(out)],
        capture_output=True, text=True, check=False, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr
    pages = sorted(out.glob("pywindow_tpu*.md"))
    assert len(pages) >= 24, [p.name for p in pages]
    undocumented = [
        p.name for p in pages if "*(undocumented)*" in p.read_text()
    ]
    assert undocumented == [], undocumented
    assert (out / "README.md").exists()


def test_lint_basic_clean():
    """The in-image lint (syntax + unused imports) stays clean.

    CI runs the real ruff/mypy jobs (.github/workflows/tests.yaml);
    this keeps the tree clean between CI runs in the tool-less image.
    """
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "lint_basic.py")],
        capture_output=True, text=True, check=False, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout


def test_sphinx_modules_rst_names_importable_modules():
    import importlib

    rst = (REPO / "docs" / "source" / "modules.rst").read_text()
    modules = re.findall(r"^\.\. automodule:: (\S+)$", rst, re.M)
    assert len(modules) >= 20, modules
    for name in modules:
        importlib.import_module(name)
