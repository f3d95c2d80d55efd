"""On-demand native build: compiles .cpp sources into shared libs with g++.

Serves the role of the reference's CMake build for its native libs
(reference: CMakeLists.txt, build.sh) in a form that works from a pure
checkout: first use compiles, later uses hit the cached .so (rebuilt when the
source mtime changes).
"""

import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()


def shared_lib(name, extra_flags=()):
    """Compile <name>.cpp -> _<name>.so if stale; return path or None."""
    src = os.path.join(_DIR, f"{name}.cpp")
    out = os.path.join(_DIR, f"_{name}.so")
    with _LOCK:
        try:
            if (not os.path.exists(out)
                    or os.path.getmtime(out) < os.path.getmtime(src)):
                cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                       "-fPIC", *extra_flags, src, "-o", out + ".tmp"]
                subprocess.run(cmd, check=True, capture_output=True)
                os.replace(out + ".tmp", out)
        except (subprocess.CalledProcessError, OSError):
            return None
    return out
