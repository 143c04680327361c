"""Import the reference's deterministic extractors without its heavy deps.

Used ONLY by offline fixture generation (tools/gen_fixtures.py) — never by
the library or tests at runtime. Stubs `loguru` and loads the `agraph`
package from /root/reference without executing its top-level __init__ (which
pulls in openai/lightrag/chromadb etc.).
"""

from __future__ import annotations

import importlib
import importlib.util
import sys
import types

REFERENCE = "/root/reference"


def load_reference_extractors():
    # stub loguru
    if "loguru" not in sys.modules:
        fake = types.ModuleType("loguru")

        class _L:
            def __getattr__(self, name):
                return lambda *a, **k: None

        fake.logger = _L()
        sys.modules["loguru"] = fake

    # register bare packages without running their __init__ side effects
    for pkg, path in [("agraph", f"{REFERENCE}/agraph"),
                      ("agraph.extractors", f"{REFERENCE}/agraph/extractors")]:
        if pkg in sys.modules:
            continue
        mod = types.ModuleType(pkg)
        mod.__path__ = [path]
        mod.__package__ = pkg
        sys.modules[pkg] = mod

    ee = importlib.import_module("agraph.extractors.entity_extractor")
    re_ = importlib.import_module("agraph.extractors.relation_extractor")
    return ee.TextEntityExtractor, re_.TextRelationExtractor
