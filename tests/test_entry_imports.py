"""Import gate: the tree must import cold, in a fresh interpreter.

Round-9 regression class (VERDICT r9 item 1): a module-level
``re.compile`` landed in ``plans/iceberg_writer.py`` without ``import
re``.  The tree still *collected* fine for any test run that imported
the module lazily inside a SparkSession fixture, but the driver's
correctness harness imports ``__spark_entry__`` first thing — 21/50
rotation queries, the bench, and 15 test files died on one missing
line.

This test runs the exact driver-side entry imports in a **subprocess**
(a fresh interpreter, no modules pre-imported by conftest or earlier
tests can mask a missing import) and must stay the first thing the
round routine runs before every commit.
"""

from __future__ import annotations

import subprocess
import sys

_GATE = """
import __spark_entry__
from dst_spark_k8_lakehouse_spark import registry
registry.load_all()
assert len(registry.QUERIES) >= 158, len(registry.QUERIES)
assert set(registry.PRIORITY) <= set(registry.QUERIES)
# every oracle id must be a registered query
assert set(registry.ORACLES) <= set(registry.QUERIES)
print("GATE_OK", len(registry.QUERIES))
"""


def test_entry_imports_in_fresh_interpreter() -> None:
    proc = subprocess.run(
        [sys.executable, "-c", _GATE],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=120,
    )
    assert proc.returncode == 0, f"stdout={proc.stdout}\nstderr={proc.stderr}"
    assert "GATE_OK" in proc.stdout


def test_every_plans_module_imports() -> None:
    """Import every module under the package individually.

    ``registry.load_all`` reaches most modules, but a module only
    imported lazily (inside a function) can still hide a top-level
    NameError; walk the package source tree so none escape.
    """
    import importlib
    import pkgutil

    import dst_spark_k8_lakehouse_spark as pkg

    failures: list[str] = []
    for mod in pkgutil.walk_packages(pkg.__path__, prefix=pkg.__name__ + "."):
        try:
            importlib.import_module(mod.name)
        except Exception as exc:  # noqa: BLE001 - collecting all failures
            failures.append(f"{mod.name}: {exc!r}")
    assert not failures, "\n".join(failures)
