"""Sphinx configuration for the pywindow_tpu API docs.

Build (requires sphinx + a theme, not bundled in the TPU image):

    sphinx-build -b html docs/source docs/build/html

Where sphinx is unavailable, ``python scripts/build_api_docs.py``
generates the same module reference as markdown from the live
docstrings using only the standard library.

Reference analog: /root/reference/docs/source/conf.py (sphinx +
autodoc/autosummary over src/pywindow).
"""

import os
import sys

sys.path.insert(0, os.path.abspath("../.."))

project = "pywindow_tpu"
author = "pywindow_tpu developers"
release = "0.1.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.autosummary",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.intersphinx",
]

autosummary_generate = True
autodoc_member_order = "bysource"
autodoc_typehints = "description"
napoleon_google_docstring = True
napoleon_numpy_docstring = True

intersphinx_mapping = {
    "python": ("https://docs.python.org/3", None),
    "numpy": ("https://numpy.org/doc/stable/", None),
    "jax": ("https://docs.jax.dev/en/latest/", None),
}

# heavy/optional imports that must not break the docs build
autodoc_mock_imports = ["rdkit"]

templates_path = ["_templates"]
exclude_patterns = []

html_theme = os.environ.get("PYWINDOW_TPU_DOCS_THEME", "alabaster")
html_static_path = ["_static"]
