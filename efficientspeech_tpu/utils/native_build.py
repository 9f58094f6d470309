"""On-demand build of the native helper libraries (native/*.so).

The prebuilt artifacts are intentionally not checked in; a fresh checkout
must not silently fall back to the (much slower) numpy decoders just
because nobody ran `make -C native` yet.  Loaders call
:func:`ensure_native` which builds the requested library once per process
if a compiler is available, and returns the path (or None).
"""

import os
import shutil
import subprocess

NATIVE_DIR = os.path.abspath(os.path.join(
    os.path.dirname(__file__), "..", "..", "native"))

_attempted = set()


def ensure_native(lib_name: str):
    """Return the absolute path of native/<lib_name>, running `make` once
    per process first (a no-op when the .so is newer than its source —
    but a REBUILD when the source changed, so a stale artifact from an
    older wire format can never be silently loaded), else None."""
    path = os.path.join(NATIVE_DIR, lib_name)
    if lib_name not in _attempted and os.path.isdir(NATIVE_DIR) \
            and shutil.which("make") is not None:
        _attempted.add(lib_name)
        try:
            subprocess.run(["make", "-C", NATIVE_DIR, lib_name],
                           stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL,
                           timeout=120, check=False)
        except (OSError, subprocess.TimeoutExpired):
            pass
    return path if os.path.isfile(path) else None
