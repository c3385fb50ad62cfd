"""Process-scoped scratch directories for queries whose ``build()``
stage publishes side-effect fixtures (snapshot lakes, streaming sink
directories) that the RETURNED DataFrame still reads lazily — so they
cannot be deleted inside ``build()`` itself without breaking the
deferred driver/bench ``collect()``.

Every directory handed out here is registered for interpreter-exit
cleanup, so repeated driver rounds and bench rebuilds stop leaking
``snaplake_*`` / ``snapdiff_*`` / ``quarantine_gate_*`` trees into
/tmp (they previously accumulated one per build). Queries that CAN
clean up eagerly (their fixture is fully drained inside ``build()``,
e.g. the scd2/cms streaming twins) keep their own try/finally and do
not need this module.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ROOTS: list[str] = []


def scratch_dir(prefix: str) -> str:
    """A mkdtemp directory that is removed at interpreter exit."""
    path = tempfile.mkdtemp(prefix=prefix)
    _ROOTS.append(path)
    return path


@atexit.register
def _cleanup() -> None:
    for path in _ROOTS:
        shutil.rmtree(path, ignore_errors=True)
    _ROOTS.clear()
