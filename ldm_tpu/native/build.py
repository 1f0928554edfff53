"""Build the native batcher (.so) on demand — g++ only, no pybind11.

The shared library is rebuilt iff the source is newer than the cached .so
(mtime check), written atomically (tmp + rename) so concurrent imports can't
load a half-written file.  ``LDM_TPU_NO_NATIVE=1`` disables the native path
entirely (ldm_tpu/native/__init__.py falls back to numpy)."""

from __future__ import annotations

import os
import subprocess
import tempfile

_SRC = os.path.join(os.path.dirname(__file__), "batcher.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "_libldm_native.so")


def lib_path() -> str | None:
    """Path to the built library, building it if needed; None if the build
    toolchain is unavailable or the build fails (callers fall back)."""
    tmp = None
    try:
        if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(
            _SRC
        ):
            return _LIB
        fd, tmp = tempfile.mkstemp(
            suffix=".so", dir=os.path.dirname(_LIB)
        )
        os.close(fd)
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
            "-o", tmp, _SRC, "-lpthread",
        ]
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if r.returncode != 0:
            return None
        os.replace(tmp, _LIB)
        return _LIB
    except (OSError, subprocess.SubprocessError):
        return None
    finally:
        # a failed/raising build must not strand the mkstemp file (replace
        # moves it on success, so this is a no-op then)
        if tmp is not None and os.path.exists(tmp):
            try:
                os.unlink(tmp)
            except OSError:
                pass
