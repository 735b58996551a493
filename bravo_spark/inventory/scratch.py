"""Process-lifetime scratch directories for self-contained queries.

The savepoint/checkpoint/format queries materialize real files and
return LAZY DataFrames over them, so cleanup cannot live in a
try/finally inside the query function — the driver collects the result
after the function returns. Instead every scratch path is pid-keyed
(concurrent sessions never collide), cleared at allocation (a crashed
previous run's leftovers), and registered once for removal at
interpreter exit — the r10 verdict's temp-dir hygiene note.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_REGISTERED: set[str] = set()


def _register(path: str) -> str:
    if path not in _REGISTERED:
        _REGISTERED.add(path)
        atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


def register_for_exit(path: str) -> str:
    """Register an externally created directory (e.g. ``mkdtemp`` output,
    where per-call uniqueness is wanted) for removal at process exit."""
    return _register(path)


def scratch_dir(tag: str) -> str:
    """A clean ``$TMPDIR/bravo_<tag>_<pid>`` path: any previous occupant
    is removed now, and the directory is removed again at process exit."""
    path = scratch_path(tag)
    shutil.rmtree(path, ignore_errors=True)
    return path


def scratch_path(tag: str) -> str:
    """``scratch_dir`` WITHOUT the pre-clear — for write-once-per-process
    caches that check their own completeness marker (for example the
    partitioned-layout fixture keyed by a ``_SUCCESS`` file). Still
    removed at process exit."""
    return _register(
        os.path.join(tempfile.gettempdir(), f"bravo_{tag}_{os.getpid()}")
    )
