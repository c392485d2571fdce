"""Process-lifetime temp artifacts: pid-suffixed paths with exit cleanup.

Several operators write pid-suffixed sinks/tables under the system temp dir
(pid suffix: two engine processes on one machine — a driver contract run
concurrent with pytest — must not overwrite each other's in-flight files).
The suffix fixed the corruption race but turned the fixed self-overwriting
names into an unbounded leak: every process left behind a full bucketed
copy of customer+orders plus sink dirs and a package zip (ADVICE r3).

This module centralizes the pattern: ``pid_scoped(name)`` (or ``register``
for paths built elsewhere) records the artifact and an ``atexit`` hook
removes everything this pid created. Exit-time (not ``finally``) cleanup is
required because registered query functions return LAZY DataFrames that
still read these paths when the driver later collects them.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_REGISTERED: set[str] = set()


def pid_scoped(name: str) -> str:
    """Return ``<tmpdir>/<name>_<pid>``, removed at interpreter exit."""
    return register(os.path.join(tempfile.gettempdir(),
                                 f"{name}_{os.getpid()}"))


def register(path: str) -> str:
    """Record an artifact path for exit-time removal; returns it unchanged."""
    if not _REGISTERED:
        atexit.register(_cleanup)
    _REGISTERED.add(path)
    return path


def _cleanup() -> None:
    for path in _REGISTERED:
        try:
            if os.path.isdir(path):
                shutil.rmtree(path, ignore_errors=True)
            elif os.path.exists(path):
                os.remove(path)
        except OSError:
            pass  # exit-time best effort; never mask the real exit status
