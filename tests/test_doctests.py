"""Execute every docstring example in the public package.

ref: python/cugraph/cugraph/tests/test_doctests.py — the reference runs
doctest over all public modules so documented examples never rot. Same
sweep here: walk cugraph_tpu's importable modules, collect doctests, run
them (CPU backend; conftest forces the 8-device mesh)."""

import doctest
import importlib
import pkgutil

import pytest

import cugraph_tpu

SKIP_PREFIXES = (
    "cugraph_tpu.native",  # build tooling, not importable docs
)


def _iter_modules():
    seen = []
    for m in pkgutil.walk_packages(
        cugraph_tpu.__path__, prefix="cugraph_tpu."
    ):
        name = m.name
        if any(name.startswith(p) for p in SKIP_PREFIXES):
            continue
        seen.append(name)
    return seen


MODULES = _iter_modules()


@pytest.mark.parametrize("mod_name", MODULES)
def test_doctests(mod_name):
    try:
        mod = importlib.import_module(mod_name)
    except Exception as exc:  # optional deps (torch etc.) may be absent
        pytest.skip(f"import failed: {exc}")
    finder = doctest.DocTestFinder(exclude_empty=True)
    runner = doctest.DocTestRunner(optionflags=doctest.NORMALIZE_WHITESPACE)
    tests = finder.find(mod, mod.__name__)
    ran = 0
    for t in tests:
        if not t.examples:
            continue
        runner.run(t)
        ran += len(t.examples)
    assert runner.failures == 0, f"{runner.failures} doctest failures"


def test_doctest_examples_exist():
    """The sweep must be exercising something: the flagship API carries
    runnable examples."""
    total = 0
    finder = doctest.DocTestFinder(exclude_empty=True)
    for name in ("cugraph_tpu.api.algorithms", "cugraph_tpu.api.graph"):
        mod = importlib.import_module(name)
        for t in finder.find(mod, name):
            total += len(t.examples)
    assert total >= 4, "flagship API modules lost their doctest examples"
