"""On-demand native build: compiles .cpp sources into shared libs with g++.

Serves the role of the reference's CMake build for its native libs
(reference: CMakeLists.txt, build.sh) in a form that works from a pure
checkout: first use compiles, later uses hit the cached .so (rebuilt when the
source mtime changes).
"""

import os
import subprocess
import threading

# OpenMP defaults for the native batch libs, applied before libgomp loads.
# Active spin-waiting after each short parallel region starves the XLA/host
# pipeline threads (measured 8x end-to-end slowdown on a 2-core host);
# passive waiting + half the cores leaves the other half for XLA and IO.
os.environ.setdefault("OMP_WAIT_POLICY", "PASSIVE")
os.environ.setdefault(
    "OMP_NUM_THREADS",
    os.environ.get("ROVACA_NATIVE_THREADS")
    or str(max(1, (os.cpu_count() or 2) // 2)))

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
